"""Phase 4: honest A/B of the kernel knobs on the FULL flagship train step.

Methodology fix over rounds 1-2: every host-timed chained measurement in this
environment contains a ~25 ms per-program dispatch overhead P (measured in
profile_overhead.py: chain totals are nearly flat in K; an empty program is
0.035 ms). All previous "ms/step" numbers are therefore inflated by P/K —
which DROWNED real effects like the bf16 kernel-stream win. This script uses
two-point differencing:

    t_step = (t_total(K_HI) - t_total(K_LO)) / (K_HI - K_LO)

which cancels P exactly and measures the true device step time (what a
production host loop with async dispatch pipelining would sustain).

A/B matrix over the fused-LSTM kernel knobs:
  * KERNEL_DTYPE: float32 vs bfloat16 (stream bytes + MXU pass width)
  * CHUNK: 8 vs 16 (DMA block size)
  * B: 32 vs 64 (batch scaling, now measurable honestly)

Writes docs/PROFILE_OPT.json incrementally.
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
OUT_PATH = os.path.join(REPO, "docs", "PROFILE_OPT.json")

K_LO, K_HI = 6, 22


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_train_chain(B: int, K: int, T: int = 512, L: int = 48, reps: int = 3):
    """Total seconds for one K-step chained flagship train program."""
    from ss_asr_tpu.models import las
    from ss_asr_tpu.train import losses
    from ss_asr_tpu.train.optim import make_optimizer

    cfg = las.ASRConfig()
    optim = make_optimizer("Adadelta", 1.0)
    eps = float((time.time_ns() % 997) * 1e-12)
    base = int(time.time_ns() % (2**31))
    x_lens = jnp.full((B,), T, dtype=jnp.int32)

    @jax.jit
    def chain(params, opt_state, key):
        kx, ky = jax.random.split(jax.random.key(base))
        x = jax.random.normal(kx, (B, T, cfg.feature_dim), jnp.float32) + eps
        y = jax.random.randint(ky, (B, L), 1, cfg.vocab_size, jnp.int32)

        def one(carry, k):
            params, opt_state = carry

            def loss_fn(p):
                _, logits, _ = las.asr_forward(
                    p, cfg, x, x_lens, L - 1, teacher=y, key=k
                )
                return losses.masked_ce_per_utt(logits, y[:, 1:], y)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optim.update(grads, opt_state, params)
            params = jax.tree.map(lambda a, u: a + u, params, updates)
            return (params, opt_state), loss

        (params, opt_state), ls = jax.lax.scan(
            one, (params, opt_state), jax.random.split(key, K)
        )
        return ls

    def make_args(rep):
        p = las.init_asr(jax.random.key(base + rep), cfg)
        return p, optim.init(p), jax.random.fold_in(jax.random.key(base), rep)

    args = make_args(0)
    jax.block_until_ready(args)
    t0 = time.perf_counter()
    out = chain(*args)
    jax.block_until_ready(out)
    log(f"    compile+first {time.perf_counter() - t0:.1f}s "
        f"(loss {float(out[-1]):.3f})")
    ts = []
    for rep in range(1, reps + 1):
        args = make_args(rep)
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        jax.block_until_ready(chain(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def measure_config(dtype: str, chunk: int, B: int, T: int = 512, L: int = 48):
    from ss_asr_tpu.ops.pallas import lstm as plstm

    plstm.KERNEL_DTYPE = dtype
    plstm.CHUNK = chunk
    label = f"dtype={dtype} chunk={chunk} B={B} T={T} L={L}"
    log(f"  [{label}] K={K_LO} ...")
    t_lo = time_train_chain(B, K_LO, T=T, L=L)
    log(f"  [{label}] K={K_HI} ...")
    t_hi = time_train_chain(B, K_HI, T=T, L=L)
    step_ms = (t_hi - t_lo) / (K_HI - K_LO) * 1e3
    overhead_ms = (t_lo - K_LO * (t_hi - t_lo) / (K_HI - K_LO)) * 1e3
    log(f"  [{label}] step {step_ms:.2f} ms -> {B / step_ms * 1e3:.0f} utt/s "
        f"(P~{overhead_ms:.1f} ms)")
    return {
        "dtype": dtype, "chunk": chunk,
        # _chunk_for may clamp the requested chunk for large batches —
        # record what the kernels actually ran with
        "effective_chunk": min(chunk, plstm._chunk_for(B)),
        "B": B, "T": T, "L": L,
        "t_total_lo_ms": t_lo * 1e3, "t_total_hi_ms": t_hi * 1e3,
        "K_lo": K_LO, "K_hi": K_HI,
        "step_ms": step_ms, "utt_per_s": B / step_ms * 1e3,
        "per_program_overhead_ms": overhead_ms,
    }


def main():
    results = {"device": str(jax.devices()[0]), "configs": []}
    import os
    plan_env = os.environ.get("PROFILE_OPT_PLAN")
    if plan_env:
        # dtype:chunk:B[:T[:L]] — T/L default to the flagship 512/48
        plan = []
        for p in plan_env.split(","):
            f = p.split(":")
            plan.append((f[0], int(f[1]), int(f[2]),
                         int(f[3]) if len(f) > 3 else 512,
                         int(f[4]) if len(f) > 4 else 48))
    else:
        plan = [
            ("float32", 8, 32, 512, 48),   # shipped config (baseline)
            ("bfloat16", 8, 32, 512, 48),
            ("float32", 8, 64, 512, 48),
            ("float32", 8, 128, 512, 48),
        ]
    for dtype, chunk, B, T, L in plan:
        try:
            results["configs"].append(measure_config(dtype, chunk, B, T, L))
        except Exception as e:
            log(f"  [dtype={dtype} chunk={chunk} B={B} T={T}] FAILED: {e}")
            results["configs"].append(
                {"dtype": dtype, "chunk": chunk, "B": B, "T": T,
                 "error": str(e)[:300]})
        with open(OUT_PATH, "w") as f:
            json.dump(results, f, indent=1)
    log(f"written {OUT_PATH}")


if __name__ == "__main__":
    main()
