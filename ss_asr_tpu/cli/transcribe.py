"""Batch transcription CLI over the serving-path API (beyond-reference:
the upstream has no inference entry point at all — decoding a file
requires hand-assembling an ASRTester; reference src/trainer.py:547-592
only decodes a preprocessed test index).

    python -m ss_asr_tpu.cli.transcribe CKPT utt1.wav utt2.wav ...
    python -m ss_asr_tpu.cli.transcribe CKPT --config conf/exp.yaml \
        --lm result/exp/char_lm.npz --beam 8 --lm-weight 0.1 \
        --out hyps.tsv fbank1.npy utt2.wav

Inputs may be ``.wav`` files (any sample rate; resampled to --sr) or
precomputed ``[T, n_mels]`` ``.npy`` log-mel fbanks (as written by
``cli/preprocess.py``). Waveform inputs run through the in-program
frontend; all inputs are decoded in batches of ``--batch`` through one
jitted early-exit greedy (default) or beam-search program. Output is
``path<TAB>transcript`` per line, to stdout or ``--out``.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(prog="ss_asr_tpu.transcribe")
    parser.add_argument("checkpoint", help="ASR checkpoint (.npz or .orbax)")
    parser.add_argument("inputs", nargs="+", help=".wav or fbank .npy files")
    parser.add_argument("--config", default=None,
                        help="experiment yaml (asr.mdl sizes, decode params, "
                             "char_lm.mdl); omit for the flagship defaults")
    parser.add_argument("--lm", default=None,
                        help="char-LM checkpoint for shallow fusion")
    parser.add_argument("--beam", type=int, default=None,
                        help="beam size (default: config decode_beam_size, "
                             "else greedy)")
    parser.add_argument("--lm-weight", type=float, default=None,
                        help="fusion weight (default: config decode_lm_weight)")
    parser.add_argument("--max-steps", type=int, default=200)
    parser.add_argument("--sr", type=int, default=22050,
                        help="frontend sample rate (wavs are resampled)")
    parser.add_argument("--batch", type=int, default=8,
                        help="decode batch size")
    parser.add_argument("--out", default=None,
                        help="write path<TAB>transcript lines here "
                             "(default stdout)")
    parser.add_argument("--long", action="store_true", dest="long_form",
                        help="long-form mode for wav inputs: overlapping "
                             "windows decoded as one batch, transcripts "
                             "merged over the overlap (decode.longform)")
    parser.add_argument("--window-s", type=float, default=20.0,
                        help="--long window length in seconds")
    parser.add_argument("--overlap-s", type=float, default=2.0,
                        help="--long window overlap in seconds")
    parser.add_argument("--vad", choices=["energy"], default=None,
                        help="--long segmentation: cut at low-energy "
                             "points (pauses) instead of fixed windows")
    parser.add_argument("--detail", action="store_true",
                        help="emit one JSON line per input instead of TSV: "
                             "n-best hypotheses with score, avg_logprob "
                             "confidence, and per-char start times (s)")
    parser.add_argument("--nbest", type=int, default=1,
                        help="hypotheses per input; > 1 implies beam "
                             "decode and JSON-lines output (as if --detail "
                             "were given)")
    args = parser.parse_args(argv)

    config = {}
    if args.config:
        import yaml

        with open(args.config) as f:
            config = yaml.safe_load(f) or {}

    from ss_asr_tpu.api import Transcriber
    from ss_asr_tpu.ops.frontend import log_mel_fbank_ragged
    from ss_asr_tpu.data.audio import load_wav

    kw = {"max_steps": args.max_steps, "sr": args.sr}
    if args.beam is not None:
        kw["beam_size"] = args.beam
    if args.lm_weight is not None:
        kw["lm_weight"] = args.lm_weight
    t = Transcriber.from_checkpoint(
        args.checkpoint, config=config, lm_path=args.lm, **kw
    )

    def chunk_fbanks(chunk):
        """Per-chunk fbanks: .npy rows load directly; wav rows run ONE
        bucketed batched frontend call (real corpora have a distinct
        length per file, so the per-file jitted frontend would recompile
        for every wav — log_mel_fbank_ragged's frames are numerically
        identical to the per-row true-length signal, and padding the
        signal buffer to a half-second grid and the row count to --batch
        bounds the compile count by the bucket count)."""
        fbs = [None] * len(chunk)
        wav_rows, sigs = [], []
        for j, path in enumerate(chunk):
            if path.endswith(".npy"):
                fb = np.load(path)
                if fb.ndim != 2 or fb.shape[1] != t.cfg.feature_dim:
                    raise SystemExit(
                        f"{path}: expected [T, {t.cfg.feature_dim}] fbank, "
                        f"got shape {fb.shape}"
                    )
                fbs[j] = fb.astype(np.float32)
                continue
            _, y = load_wav(path, target_sr=args.sr)
            y = np.asarray(y, dtype=np.float32)
            if y.size == 0:
                # header-only / corrupt wav: empty transcript, like the
                # zero-frame fbank path in Transcriber.transcribe_fbank
                fbs[j] = np.zeros((0, t.cfg.feature_dim), np.float32)
                continue
            wav_rows.append(j)
            sigs.append(y)
        if sigs:
            fbanks = log_mel_fbank_ragged(
                sigs, args.sr, n_mels=t.cfg.feature_dim, min_rows=args.batch
            )
            for f, j in zip(fbanks, wav_rows):
                fbs[j] = f
        return fbs

    sink = open(args.out, "w") if args.out else sys.stdout
    try:
        if args.long_form:
            if args.detail or args.nbest > 1:
                raise SystemExit("--long and --detail/--nbest are exclusive "
                                 "(windowed merge has no single alignment)")
            for path in args.inputs:
                if path.endswith(".npy"):
                    raise SystemExit(f"{path}: --long takes wav inputs "
                                     "(windows are cut in signal time)")
                _, y = load_wav(path, target_sr=args.sr)
                hyp = t.transcribe_long(np.asarray(y, np.float32), args.sr,
                                        window_s=args.window_s,
                                        overlap_s=args.overlap_s,
                                        vad=args.vad)
                print(f"{path}\t{hyp}", file=sink, flush=True)
            return
        for i in range(0, len(args.inputs), args.batch):
            chunk = args.inputs[i : i + args.batch]
            if args.detail or args.nbest > 1:
                import json

                rows = t.transcribe_fbank_detailed(
                    chunk_fbanks(chunk), n_best=args.nbest)
                for path, hyps in zip(chunk, rows):
                    print(json.dumps({
                        "path": path,
                        "text": hyps[0].text,
                        "hypotheses": [
                            {"text": h.text, "score": round(h.score, 4),
                             "avg_logprob": round(h.avg_logprob, 4),
                             "char_starts": [round(float(s), 3)
                                             for s in h.char_starts],
                             "words": [
                                 {"word": w["word"],
                                  "start": round(w["start"], 3),
                                  "end": round(w["end"], 3),
                                  "avg_logprob": round(w["avg_logprob"], 4)}
                                 for w in h.words()]}
                            for h in hyps
                        ],
                    }, ensure_ascii=False), file=sink, flush=True)
                continue
            hyps = t.transcribe_fbank(chunk_fbanks(chunk))
            for path, hyp in zip(chunk, hyps):
                print(f"{path}\t{hyp}", file=sink, flush=True)
    finally:
        if args.out:
            sink.close()


if __name__ == "__main__":
    main()
