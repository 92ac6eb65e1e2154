"""Phase 3: measure the per-PROGRAM invocation overhead of this
environment's TPU path (axon relay round trip).

Phases 1-2 (profile_kernel.py / profile_step.py) showed every "per item"
number from the chained methodology contains a constant-per-invocation term
P divided by the chain length K: phase-1 (K=12) measured a flat ~2.14 ms
"kernel time" across ablations that should differ, phase-2 (K=8) measured
~3.2 ms for the same kernel, and the T-sweep intercept tracked P/K, not the
kernel. Fitting t_item = P/K + t_kernel across K makes both the overhead
and the TRUE kernel time observable.

Probes:
  * empty     — a trivial jitted program (x+1 on a tiny buffer), timed raw:
                a direct read of the round-trip floor.
  * kernelK   — the full fwd LSTM kernel chain at K in {2, 4, 8, 16, 32}:
                fit P and t_kernel by least squares on t_total(K) = P + K*t.

Writes docs/PROFILE_OVERHEAD.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT_PATH = os.path.join(REPO, "docs", "PROFILE_OVERHEAD.json")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_empty(reps: int = 7):
    eps = float((time.time_ns() % 997) * 1e-9)

    @jax.jit
    def f(x):
        return x * 1.000001 + eps

    x = jnp.ones((8, 128), jnp.float32)
    jax.block_until_ready(f(x))  # compile
    ts = []
    for i in range(reps):
        y = jnp.full((8, 128), float(i), jnp.float32)
        jax.block_until_ready(y)
        t0 = time.perf_counter()
        jax.block_until_ready(f(y))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    med = ts[len(ts) // 2]
    log(f"  [empty] median {med * 1e3:.3f} ms, all={[f'{t * 1e3:.2f}' for t in ts]}")
    return med


def time_chain_at_K(K: int, T: int = 512, B: int = 32, H: int = 256,
                    reps: int = 3):
    from benchmarks.profile_kernel import run_variant

    G = 4 * H
    eps = float((time.time_ns() % 997) * 1e-9)
    base = int(time.time_ns() % (2**31))
    lengths2d = jnp.full((B, 1), T, dtype=jnp.int32)

    @jax.jit
    def chain(whh0, salt):
        gx0 = 0.1 * jax.random.normal(
            jax.random.key(base), (T, B, G), jnp.float32
        ) + eps

        def body(carry, _):
            whh = whh0 + carry * 1e-18 + salt * 1e-15
            y = run_variant("full", lengths2d, gx0, whh)
            m = y.mean()
            return m, m

        _, ms = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return ms

    rng = np.random.default_rng(time.time_ns() % (2**31))

    def make_args(rep):
        whh = jnp.asarray(rng.standard_normal((H, G)).astype(np.float32) * 0.05)
        return whh, jnp.float32((time.time_ns() % 1009) + rep)

    args = make_args(0)
    jax.block_until_ready(args)
    t0 = time.perf_counter()
    jax.block_until_ready(chain(*args))
    log(f"  [K={K}] compile+first {time.perf_counter() - t0:.1f}s")
    ts = []
    for rep in range(1, reps + 1):
        args = make_args(rep)
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        jax.block_until_ready(chain(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    med = ts[len(ts) // 2]
    log(f"  [K={K}] total {med * 1e3:.2f} ms ({med / K * 1e3:.3f} ms/item) "
        f"reps={[f'{t * 1e3:.1f}' for t in ts]}")
    return med


def main():
    results = {"device": str(jax.devices()[0])}
    results["empty_program_ms"] = time_empty() * 1e3

    Ks = [2, 4, 8, 16, 32]
    totals = []
    for K in Ks:
        try:
            totals.append((K, time_chain_at_K(K)))
        except Exception as e:
            log(f"  [K={K}] FAILED: {e}")
        with open(OUT_PATH, "w") as f:
            json.dump({**results, "chain_totals_ms": [
                {"K": k, "total_ms": t * 1e3} for k, t in totals]}, f, indent=1)

    if len(totals) >= 2:
        Ks_a = np.array([k for k, _ in totals], float)
        ts_a = np.array([t for _, t in totals], float)
        slope, intercept = np.polyfit(Ks_a, ts_a, 1)
        results["fit"] = {
            "per_program_overhead_ms": intercept * 1e3,
            "true_kernel_ms": slope * 1e3,
            "comment": "t_total(K) = P + K * t_kernel; fwd LSTM kernel "
                       "T=512 B=32 H=256 f32",
        }
    results["chain_totals_ms"] = [
        {"K": k, "total_ms": t * 1e3} for k, t in totals]
    with open(OUT_PATH, "w") as f:
        json.dump(results, f, indent=1)
    log(f"written {OUT_PATH}")


if __name__ == "__main__":
    main()
