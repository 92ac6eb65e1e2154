"""Probe the B=64 superlinearity (round-3 open item).

PROFILE_STEP.json: the listener-only grad step scales 5.2 -> 12.6 ms from
B=32 to B=64 (2.4x) while its kernels are nearly B-flat. This isolates
forward vs backward: if the fwd-only listener scales ~linearly but grad
scales superlinearly, the excess lives in the backward (XLA rematerializes
or the bwd kernels' VMEM blocks spill at [64, 1024]); if fwd itself is
superlinear, it's an XLA fusion/layout regression at B=64.

Differencing protocol (bench.py round-3). Writes docs/PROFILE_B64.json.
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
OUT_PATH = os.path.join(REPO, "docs", "PROFILE_B64.json")
K_LO, K_HI = 6, 22


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_listener(B: int, mode: str, T: int = 512):
    from ss_asr_tpu.models import las

    cfg = las.ASRConfig()
    eps = float((time.time_ns() % 997) * 1e-12)
    base = int(time.time_ns() % (2**31))
    x_lens = jnp.full((B,), T, dtype=jnp.int32)

    def make_chain(K):
        @jax.jit
        def chain(params, key):
            x = jax.random.normal(
                jax.random.key(base), (B, T, cfg.feature_dim), jnp.float32
            ) + eps

            def one(carry, k):
                p = jax.tree.map(
                    lambda a: a * (1.0 + 1e-18 * carry), params
                )
                if mode == "fwd":
                    h, _ = las.listener_apply(p["encoder"], x, x_lens)
                    v = (h * h).mean()
                else:
                    v, g = jax.value_and_grad(
                        lambda q: (las.listener_apply(q["encoder"], x, x_lens)[0] ** 2).mean()
                    )(p)
                    # consume the grads or XLA dead-code-eliminates the
                    # entire backward pass (verified: an unused-grads probe
                    # measured exactly the fwd time)
                    v = v + sum(jnp.sum(l) for l in jax.tree.leaves(g)) * 1e-12
                return carry + v * 1e-9, v

            c, vs = jax.lax.scan(one, jnp.float32(0), jax.random.split(key, K))
            return vs

        return chain

    def make_args(rep):
        p = las.init_asr(jax.random.key(base + rep), cfg)
        return p, jax.random.fold_in(jax.random.key(base), rep)

    totals = {}
    for K in (K_LO, K_HI):
        chain = make_chain(K)
        args = make_args(0)
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        jax.block_until_ready(chain(*args))
        log(f"  [{mode} B={B} K={K}] compile+first {time.perf_counter() - t0:.1f}s")
        ts = []
        for rep in range(1, 4):
            a = make_args(rep)
            jax.block_until_ready(a)
            t0 = time.perf_counter()
            jax.block_until_ready(chain(*a))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        totals[K] = ts[len(ts) // 2]
    step_ms = (totals[K_HI] - totals[K_LO]) / (K_HI - K_LO) * 1e3
    log(f"  [{mode} B={B}] step {step_ms:.2f} ms")
    return step_ms


def main():
    results = {"device": str(jax.devices()[0]), "listener": []}
    for mode in ("fwd", "grad"):
        for B in (32, 64):
            try:
                ms = time_listener(B, mode)
                results["listener"].append({"mode": mode, "B": B, "step_ms": ms})
            except Exception as e:
                log(f"  [{mode} B={B}] FAILED: {e}")
                results["listener"].append({"mode": mode, "B": B, "error": str(e)[:300]})
            with open(OUT_PATH, "w") as f:
                json.dump(results, f, indent=1)
    log(f"written {OUT_PATH}")


if __name__ == "__main__":
    main()
