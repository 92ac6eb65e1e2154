"""HTTP transcription server with dynamic batching (beyond-reference: the
upstream has no serving surface; its tester decodes a preprocessed index
serially, reference src/trainer.py:587-591).

    python -m ss_asr_tpu.cli.serve result/exp/asr.npz --config conf/exp.yaml \
        --lm result/exp/char_lm.npz --port 8000 --max-batch 16 --max-wait-ms 5

    curl -s --data-binary @utt.wav http://127.0.0.1:8000/transcribe
    curl -s http://127.0.0.1:8000/stats

Concurrent requests are coalesced into one bucketed decode program per
batch window (ss_asr_tpu.serve.BatchingTranscriber) — the (B, T) executable
lattice stays small, so steady-state traffic never recompiles.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(prog="ss_asr_tpu.serve")
    parser.add_argument("checkpoint", help="ASR checkpoint (.npz or .orbax)")
    parser.add_argument("--config", default=None,
                        help="experiment yaml (asr.mdl sizes, decode params, "
                             "char_lm.mdl); omit for the flagship defaults")
    parser.add_argument("--lm", default=None,
                        help="char-LM checkpoint for shallow fusion")
    parser.add_argument("--beam", type=int, default=None,
                        help="beam size (default: config decode_beam_size, "
                             "else greedy early-exit)")
    parser.add_argument("--lm-weight", type=float, default=None)
    parser.add_argument("--max-steps", type=int, default=200)
    parser.add_argument("--sr", type=int, default=22050,
                        help="frontend sample rate (wavs are resampled)")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--max-batch", type=int, default=16)
    parser.add_argument("--max-wait-ms", type=float, default=5.0,
                        help="batching window: how long the first request "
                             "in a batch waits for company")
    parser.add_argument("--mode", choices=["signal", "fbank"],
                        default="signal",
                        help="signal: waveforms batch through the fused "
                             "frontend+decode program (zero per-request "
                             "device dispatches; beam runs frontend + beam "
                             "programs); fbank: per-request frontend, "
                             "decode-only batching")
    parser.add_argument("--pallas-kernel", nargs="?", const="on",
                        default="off", choices=["auto", "on", "off"],
                        help="route decodes through the fused whole-loop "
                             "Pallas kernels (greedy, greedy+LM, beam) — "
                             "TPU only; bare flag forces them on, 'auto' "
                             "follows the recorded A/B "
                             "(docs/BENCH_DETAILS.json decode_throughput, "
                             "api.Transcriber._auto_kernel_choice)")
    args = parser.parse_args(argv)

    config = {}
    if args.config:
        import yaml

        with open(args.config) as f:
            config = yaml.safe_load(f) or {}

    from ss_asr_tpu.api import Transcriber
    from ss_asr_tpu.serve import BatchingTranscriber, serve_http

    kw = {"max_steps": args.max_steps, "sr": args.sr,
          "use_pallas_kernel": {"auto": "auto", "on": True,
                                "off": False}[args.pallas_kernel]}
    if args.beam is not None:
        kw["beam_size"] = args.beam
    if args.lm_weight is not None:
        kw["lm_weight"] = args.lm_weight
    t = Transcriber.from_checkpoint(
        args.checkpoint, config=config, lm_path=args.lm, **kw
    )
    with BatchingTranscriber(
        t, max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        mode=args.mode, sr=args.sr
    ) as bt:
        print(f"serving on http://{args.host}:{args.port} "
              f"(max_batch={args.max_batch}, window={args.max_wait_ms}ms, "
              f"mode={args.mode})", flush=True)
        serve_http(bt, host=args.host, port=args.port, sr=args.sr,
                   reload_paths={"asr": args.checkpoint, "lm": args.lm})


if __name__ == "__main__":
    main()
