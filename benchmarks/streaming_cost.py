"""Streaming per-update cost vs stream length — flat by design, proven.

Round-3 VERDICT #4: the StreamingTranscriber bounds per-update work by
segment commitment (ss_asr_tpu/streaming.py — the open span is capped at
``commit_window_s``; beyond it the quietest frame closes a segment whose
frames are dropped), so the cost of ``feed()+partial()`` must NOT grow with
total stream length.  This harness feeds a long synthetic stream in
real-time-sized chunks, times every update, and records the per-update
latency profile bucketed by stream position — if commitment works the
buckets are flat (each bounded by the largest open-span decode, itself
bounded by the window), and the executable count stops growing after the
bucket lattice warms.

    python benchmarks/streaming_cost.py --duration 90 --chunk 0.5 \
        --commit-window 10 --out docs/STREAMING_COST.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_stream(duration_s: float, sr: int, seed: int = 0) -> np.ndarray:
    """Speech-shaped noise with periodic dips so energy_cut_frame has real
    pauses to cut at: 1.5 s bursts separated by 0.25 s near-silence."""
    rng = np.random.default_rng(seed)
    n = int(duration_s * sr)
    sig = 0.1 * rng.standard_normal(n).astype(np.float32)
    burst = int(1.5 * sr)
    gap = int(0.25 * sr)
    i = burst
    while i < n:
        sig[i : i + gap] *= 0.01
        i += burst + gap
    return sig


def run(duration_s: float, chunk_s: float, commit_window_s: float,
        sr: int = 8000, size: str = "flagship", max_steps: int = 60,
        seed: int = 0) -> dict:
    import jax

    from ss_asr_tpu.api import Transcriber
    from ss_asr_tpu.models import las
    from ss_asr_tpu.streaming import StreamingTranscriber

    if size == "tiny":
        cfg = las.ASRConfig(encoder_state_size=16, mlp_out_size=16,
                            decoder_state_size=16, feature_dim=40)
    else:
        cfg = las.ASRConfig()
    params = las.init_asr(jax.random.key(seed), cfg)
    t = Transcriber(params, cfg, max_steps=max_steps, sr=sr)
    st = StreamingTranscriber(t, sr=sr, commit_window_s=commit_window_s,
                              min_segment_s=1.0)

    sig = make_stream(duration_s, sr, seed)
    chunk = int(chunk_s * sr)
    updates = []
    for i in range(0, len(sig), chunk):
        t0 = time.perf_counter()
        st.feed(sig[i : i + chunk])
        st.partial()
        ms = (time.perf_counter() - t0) * 1e3
        updates.append({"t_s": round(i / sr, 2), "ms": round(ms, 2)})
    t0 = time.perf_counter()
    final = st.finalize()
    final_ms = (time.perf_counter() - t0) * 1e3

    # bucket by stream position; the first bucket carries the lattice
    # compiles, so the flatness claim is judged on buckets >= 1
    width = max(10.0, commit_window_s)
    buckets = {}
    for u in updates:
        b = int(u["t_s"] // width)
        buckets.setdefault(b, []).append(u["ms"])
    profile = []
    for b in sorted(buckets):
        v = sorted(buckets[b])
        profile.append({
            "window_s": f"{int(b * width)}-{int((b + 1) * width)}",
            "n_updates": len(v),
            "p50_ms": round(v[len(v) // 2], 2),
            "p90_ms": round(v[int(len(v) * 0.9)], 2),
            "max_ms": round(v[-1], 2),
        })

    steady = [p["p50_ms"] for p in profile[1:]]
    flat = bool(steady) and max(steady) <= 3.0 * min(steady)
    return {
        "what": "per-update (feed+partial) wall latency vs stream position; "
                "segment commitment bounds the open span so the profile "
                "must be flat after the bucket-lattice warm-up window",
        "device": jax.devices()[0].device_kind,
        "config": {"duration_s": duration_s, "chunk_s": chunk_s,
                   "commit_window_s": commit_window_s, "sr": sr,
                   "size": size, "max_steps": max_steps},
        "n_updates": len(updates),
        "n_committed_segments": len(st._committed),
        "final_len_chars": len(final),
        "profile": profile,
        "finalize_ms": round(final_ms, 2),
        "steady_state_flat": flat,
        "conclusion": (
            "flat: steady-state p50 varies < 3x across windows "
            "(bounded open-span decode + memoized partials)" if flat else
            "NOT flat — see profile"),
        "updates": updates,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=90.0)
    ap.add_argument("--chunk", type=float, default=0.5)
    ap.add_argument("--commit-window", type=float, default=10.0)
    ap.add_argument("--sr", type=int, default=8000)
    ap.add_argument("--size", choices=("tiny", "flagship"),
                    default="flagship")
    ap.add_argument("--max-steps", type=int, default=60)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    result = run(args.duration, args.chunk, args.commit_window, sr=args.sr,
                 size=args.size, max_steps=args.max_steps)
    blob = json.dumps(result, indent=1, ensure_ascii=False)
    if args.out:
        with open(args.out, "w", encoding="utf-8") as f:
            f.write(blob)
    print(blob[:2000])


if __name__ == "__main__":
    main()
