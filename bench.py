"""Headline benchmark: LAS train-step throughput (utterances/sec/chip).

Prints exactly ONE JSON line:
    {"metric": ..., "value": N, "unit": "utt/s/chip", "vs_baseline": N}

* ``value`` — utterances/sec for the full jitted train step (forward with
  scheduled sampling, masked CE, backward, clip+Adadelta update) on the
  flagship model (listener 4x256 BiLSTM, speller 2x256) at B=32, T=512
  frames, L=48 chars — a typical length-sorted Málrómur batch.
* ``vs_baseline`` — speedup over a from-scratch PyTorch implementation of
  the same architecture/step running on this host's CPU
  (benchmarks/torch_reference.py; the reference repo publishes no
  throughput numbers, SURVEY.md §6). The torch number is cached in
  bench_baseline.json so later rounds compare against the same denominator.

Flags: --quick (small shapes, CPU-friendly), --no-baseline (reuse/skip torch).
Diagnostics go to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_train_step(B: int, T: int, L: int, iters: int = 10, warmup: int = 2) -> float:
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ss_asr_tpu.models import las
    from ss_asr_tpu.train import losses
    from ss_asr_tpu.train.optim import make_optimizer

    cfg = las.ASRConfig()
    params = las.init_asr(jax.random.key(0), cfg)
    optim = make_optimizer("Adadelta", 1.0)
    opt_state = optim.init(params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, cfg.feature_dim)).astype(np.float32))
    x_lens = jnp.asarray(np.full((B,), T, dtype=np.int32))
    y = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, L)).astype(np.int32))

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, x, x_lens, y, key):
        def loss_fn(p):
            _, logits, _ = las.asr_forward(
                p, cfg, x, x_lens, y.shape[1] - 1, teacher=y, key=key
            )
            return losses.masked_ce_per_utt(logits, y[:, 1:], y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optim.update(grads, opt_state, params)
        params = jax.tree.map(lambda a, u: a + u, params, updates)
        return params, opt_state, loss

    key = jax.random.key(1)
    log(f"compiling train step (B={B}, T={T}, L={L}) on {jax.devices()[0]} ...")
    t0 = time.perf_counter()
    for i in range(warmup):
        key, k = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, x, x_lens, y, k)
    jax.block_until_ready(loss)
    log(f"warmup done in {time.perf_counter() - t0:.1f}s; loss={float(loss):.4f}")

    t0 = time.perf_counter()
    for i in range(iters):
        key, k = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, x, x_lens, y, k)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / iters
    log(f"step time {dt * 1e3:.1f} ms -> {B / dt:.1f} utt/s")
    return B / dt


def get_torch_baseline(B: int, T: int, L: int, allow_measure: bool) -> float | None:
    key = f"torch_cpu_B{B}_T{T}_L{L}"
    cache = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cache = json.load(f)
    if key in cache:
        return cache[key]
    if not allow_measure:
        return None
    log("measuring torch-CPU reference baseline (one-time, cached) ...")
    from benchmarks.torch_reference import measure_train_step

    val = measure_train_step(B=B, T=T, L=L, iters=2, warmup=1)
    cache[key] = val
    with open(BASELINE_CACHE, "w") as f:
        json.dump(cache, f, indent=1)
    log(f"torch baseline: {val:.2f} utt/s")
    return val


def bench_decode_latency(T: int = 512, max_steps: int = 200, iters: int = 30) -> float:
    """p50 single-utterance greedy decode latency (early-exit path), ms."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ss_asr_tpu.decode.greedy import greedy_decode_early_exit
    from ss_asr_tpu.models import las

    cfg = las.ASRConfig()
    params = las.init_asr(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    dec = jax.jit(
        lambda x, xl: greedy_decode_early_exit(params, cfg, x, xl, max_steps=max_steps)
    )
    lat = []
    x = jnp.asarray(rng.standard_normal((1, T, cfg.feature_dim)).astype(np.float32))
    xl = jnp.asarray(np.array([T], dtype=np.int32))
    jax.block_until_ready(dec(x, xl))  # compile
    for i in range(iters):
        # fresh input each call (the relay caches identical invocations)
        x = jnp.asarray(rng.standard_normal((1, T, cfg.feature_dim)).astype(np.float32))
        t0 = time.perf_counter()
        jax.block_until_ready(dec(x, xl))
        lat.append((time.perf_counter() - t0) * 1e3)
    lat.sort()
    p50 = lat[len(lat) // 2]
    log(f"decode latency p50 {p50:.1f} ms (min {lat[0]:.1f}, max {lat[-1]:.1f})")
    return p50


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small shapes (CI/CPU)")
    ap.add_argument("--no-baseline", action="store_true", help="skip torch measurement")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument(
        "--metric",
        choices=["train_throughput", "decode_latency"],
        default="train_throughput",
    )
    args = ap.parse_args()

    if args.metric == "decode_latency":
        p50 = bench_decode_latency(iters=max(args.iters, 20))
        print(
            json.dumps(
                {
                    "metric": "greedy_decode_latency_p50",
                    "value": round(p50, 2),
                    "unit": "ms",
                    "vs_baseline": 0.0,
                }
            )
        )
        return

    if args.quick:
        B, T, L = 8, 64, 16
    else:
        B, T, L = 32, 512, 48

    value = bench_train_step(B, T, L, iters=args.iters)
    baseline = get_torch_baseline(B, T, L, allow_measure=not args.no_baseline)
    vs = (value / baseline) if baseline else 0.0

    print(
        json.dumps(
            {
                "metric": "las_train_step_throughput",
                "value": round(value, 2),
                "unit": "utt/s/chip",
                "vs_baseline": round(vs, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
