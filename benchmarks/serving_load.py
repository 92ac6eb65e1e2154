"""Closed-loop serving load benchmark for the dynamic-batching runtime.

C concurrent clients each push R back-to-back requests (fresh random fbanks
per request — the relay replays byte-identical invocations, see
docs/PERF.md methodology) through one BatchingTranscriber; reports per-level
latency percentiles, throughput, and the realized batch-size mix. This is
the serving story the reference cannot tell at all (serial tester loop,
reference src/trainer.py:587-591): batching turns concurrency into MXU row
occupancy instead of queueing delay.

    python benchmarks/serving_load.py               # flagship shapes
    python benchmarks/serving_load.py --quick       # tiny (CPU/CI)

Writes docs/SERVING_LOAD.json unless --no-record. Single-utterance decode
marginals measured by the replay-defended differencing protocol live in
docs/BENCH_DETAILS.json; the p50 at concurrency 1 here additionally pays
real (non-pipelined) per-dispatch overhead, so it is NOT comparable to the
marginal — the interesting signal is the SHAPE: how throughput scales and
p99 holds as concurrency rises.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT_PATH = os.path.join(REPO, "docs", "SERVING_LOAD.json")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_transcriber(quick: bool):
    import jax

    from ss_asr_tpu.api import Transcriber
    from ss_asr_tpu.models import las

    if quick:
        cfg = las.ASRConfig(encoder_state_size=8, decoder_state_size=8,
                            mlp_out_size=8, feature_dim=40)
        kw = {"max_steps": 8, "t_bucket": 16}
    else:
        cfg = las.ASRConfig()  # flagship
        kw = {"max_steps": 48, "t_bucket": 128}
    params = las.init_asr(jax.random.key(0), cfg)
    return Transcriber(params, cfg, sr=16000, **kw)


def run_level(t, concurrency: int, requests: int, lens, max_batch: int,
              max_wait_ms: float, rng, mode: str = "signal") -> dict:
    from ss_asr_tpu.serve import BatchingTranscriber, _lattice

    feat = t.cfg.feature_dim
    hop = t.sr // 100  # 10 ms stride: frames -> samples

    def make_item(r, L):
        if mode == "signal":
            return r.standard_normal(int(L) * hop).astype(np.float32)
        return r.standard_normal((int(L), feat)).astype(np.float32)

    with BatchingTranscriber(t, max_batch=max_batch,
                             max_wait_ms=max_wait_ms, mode=mode) as bt:
        # pre-warm EVERY lattice (B, T-bucket) executable outside the timed
        # region — exactly what a production server does at startup; the
        # measurement is steady-state serving, not cold compiles. Warm via
        # DIRECT transcriber calls (the batcher pads to the same lattice
        # shapes, so it hits these exact executables): warming through
        # submit() would race the batch window and can leave large-B
        # executables cold if the window splits the warmup batch.
        warm = (t.transcribe_signal_batch if mode == "signal"
                else t.transcribe_fbank)
        for B in _lattice(max_batch):
            for L in lens:
                warm([make_item(rng, L) for _ in range(B)])

        with bt._cv:  # steady-state stats only: drop the warmup batches
            bt.stats = type(bt.stats)()

        lat: list = []
        lock = threading.Lock()
        barrier = threading.Barrier(concurrency + 1)

        def client(ci):
            crng = np.random.default_rng(1000 + ci)
            mine = []
            barrier.wait()
            for _ in range(requests):
                item = make_item(crng, crng.choice(lens))
                t0 = time.perf_counter()
                bt.submit(item).result()
                mine.append(time.perf_counter() - t0)
            with lock:
                lat.extend(mine)

        threads = [threading.Thread(target=client, args=(ci,))
                   for ci in range(concurrency)]
        for th in threads:
            th.start()
        barrier.wait()
        t0 = time.perf_counter()
        for th in threads:
            th.join()
        wall = time.perf_counter() - t0
        stats = bt.stats.as_dict()

    lat.sort()
    n = len(lat)
    out = {
        "concurrency": concurrency,
        "requests": n,
        "throughput_utt_s": round(n / wall, 2),
        "p50_ms": round(lat[n // 2] * 1e3, 2),
        "p90_ms": round(lat[int(n * 0.90)] * 1e3, 2),
        "p99_ms": round(lat[min(n - 1, int(n * 0.99))] * 1e3, 2),
        "mean_batch": round(stats.get("mean_batch", 0.0), 2),
        "batches": stats["batches"],
        "padded_rows": stats["padded_rows"],
    }
    log(f"  C={concurrency:3d}: {out['throughput_utt_s']:8.1f} utt/s  "
        f"p50 {out['p50_ms']:7.2f} ms  p99 {out['p99_ms']:7.2f} ms  "
        f"mean batch {out['mean_batch']:.1f}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="tiny shapes (CPU/CI)")
    ap.add_argument("--concurrency", type=int, nargs="+", default=None)
    ap.add_argument("--requests", type=int, default=None,
                    help="requests per client")
    ap.add_argument("--max-batch", type=int, default=None)
    ap.add_argument("--max-wait-ms", type=float, default=5.0)
    ap.add_argument("--mode", choices=["signal", "fbank"], default="signal",
                    help="signal: fused frontend+decode per batch (the "
                         "serving default); fbank: decode-only batching")
    ap.add_argument("--no-record", action="store_true")
    args = ap.parse_args()

    if args.quick:
        levels = args.concurrency or [1, 4, 8]
        requests = args.requests or 6
        max_batch = args.max_batch or 8
        lens = [24, 40, 56]  # within two t_bucket=16 buckets
    else:
        levels = args.concurrency or [1, 2, 4, 8, 16, 32]
        requests = args.requests or 16
        max_batch = args.max_batch or 32
        lens = [192, 320, 448]  # Malromur-ish spread, t_bucket=128

    import jax

    rng = np.random.default_rng(0)
    t = build_transcriber(args.quick)
    dev = jax.devices()[0]
    log(f"serving load on {dev} (max_batch={max_batch}, "
        f"window={args.max_wait_ms}ms, lens={lens})")

    results = [
        run_level(t, c, requests, lens, max_batch, args.max_wait_ms, rng,
                  mode=args.mode)
        for c in levels
    ]

    artifact = {
        "device": str(dev),
        "platform": dev.platform,
        "quick": bool(args.quick),
        "max_batch": max_batch,
        "max_wait_ms": args.max_wait_ms,
        "mode": args.mode,
        "utterance_frames": lens,
        "levels": results,
        "note": "closed-loop; p50@C=1 includes real per-dispatch overhead "
                "(not comparable to the differenced marginals in "
                "BENCH_DETAILS.json); fresh random payloads per request",
    }
    if not args.no_record and not args.quick and dev.platform != "cpu":
        os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
        with open(OUT_PATH, "w") as f:
            json.dump(artifact, f, indent=1)
        log(f"recorded -> {OUT_PATH}")
    print(json.dumps({
        "metric": "serving_throughput_max",
        "value": max(r["throughput_utt_s"] for r in results),
        "unit": "utt/s",
        "best_level": max(results, key=lambda r: r["throughput_utt_s"]),
    }))


if __name__ == "__main__":
    main()
