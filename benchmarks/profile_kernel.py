"""Attribute the per-step cost of the fused Pallas LSTM kernel.

VERDICT round-2 weak #1: the flagship train step scales ~linearly in batch
(B=32 -> 8.5 ms, B=64 -> 17 ms) while docs/PERF.md claimed the recurrence is
"MXU-latency-bound" (which would make it nearly B-invariant up to 128 rows).
This script measures WHERE the per-step time actually goes by timing ablated
variants of the real forward kernel (ops/pallas/lstm.py:_lstm_fwd_kernel)
under the replay-defended chained protocol from bench.py:

  full      — the shipped kernel (matmul + transcendental gates + y/cs writes)
  notrans   — sigmoid/tanh replaced by cheap polynomials (same data movement,
              same matmul): full - notrans  = transcendental (VPU) share
  nomatmul  — the h @ W_hh MXU matmul removed (recurrence kept through c):
              full - nomatmul = recurrent-matmul (MXU) share
  nocs      — the cs residual stream not written: full - nocs = DMA-out share
  bf16      — full with bf16 gx/whh streams and MXU inputs

Each variant is swept over B to separate the fixed per-step cost (grid/loop
overhead + issue latency) from the per-row cost:  t(B) = a + b*B.

Writes docs/PROFILE_KERNEL.json incrementally (partial results survive a
timeout). Run on the TPU in the background; remote compiles are erratic
(14-160 s each, docs/PERF.md methodology caveats).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT_PATH = os.path.join(REPO, "docs", "PROFILE_KERNEL.json")

CHUNK = 8  # mirror ops/pallas/lstm.py


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _gate_math(gates, c, cheap):
    H = c.shape[-1]
    if cheap:
        # cheap polynomial stand-ins: same shapes/ops count minus transcendentals
        i = gates[:, :H] * 0.25 + 0.5
        f = gates[:, H : 2 * H] * 0.25 + 0.5
        g = gates[:, 2 * H : 3 * H] * 0.5
        o = gates[:, 3 * H :] * 0.25 + 0.5
        c2 = f * c + i * g
        h2 = o * (c2 * 0.5)
    else:
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H :])
        c2 = f * c + i * g
        h2 = o * jnp.tanh(c2)
    return h2, c2


def make_fwd_kernel(variant: str):
    """Build an ablated copy of _lstm_fwd_kernel (ops/pallas/lstm.py:103)."""
    matmul = variant != "nomatmul"
    cheap = variant == "notrans"
    write_cs = variant != "nocs"

    def kernel(len_ref, gx_ref, whh_ref, *out_and_scratch):
        if write_cs:
            y_ref, cs_ref, h_ref, c_ref = out_and_scratch
        else:
            y_ref, h_ref, c_ref = out_and_scratch
            cs_ref = None
        k = pl.program_id(0)
        C = gx_ref.shape[0]

        @pl.when(k == 0)
        def _():
            h_ref[:] = jnp.zeros_like(h_ref)
            c_ref[:] = jnp.zeros_like(c_ref)

        def step(i, _):
            t = k * C + i
            h = h_ref[:]
            c = c_ref[:]
            if matmul:
                gates = gx_ref[i].astype(jnp.float32) + jnp.dot(
                    h.astype(whh_ref.dtype), whh_ref[:],
                    preferred_element_type=jnp.float32,
                )
            else:
                gates = gx_ref[i].astype(jnp.float32)
            h2, c2 = _gate_math(gates, c, cheap)
            valid = (t < len_ref[:, 0])[:, None]
            h_new = jnp.where(valid, h2, h)
            c_new = jnp.where(valid, c2, c)
            h_ref[:] = h_new
            c_ref[:] = c_new
            y_ref[i] = jnp.where(valid, h2, 0.0)
            if cs_ref is not None:
                cs_ref[i] = c_new
            return 0

        jax.lax.fori_loop(0, C, step, 0)

    return kernel


def run_variant(variant: str, lengths2d, gates_x, whh):
    Tp, B, G = gates_x.shape
    H = G // 4
    n_out = 1 if variant == "nocs" else 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(Tp // CHUNK,),
        in_specs=[
            pl.BlockSpec((B, 1), lambda k: (0, 0)),
            pl.BlockSpec((CHUNK, B, G), lambda k: (k, 0, 0)),
            pl.BlockSpec((H, G), lambda k: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((CHUNK, B, H), lambda k: (k, 0, 0))] * n_out,
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
    )
    outs = pl.pallas_call(
        make_fwd_kernel(variant),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((Tp, B, H), jnp.float32)] * n_out,
    )(lengths2d, gates_x, whh)
    return outs[0]


#: hard physical floor per 512-step sequential kernel invocation: ~100 ns/step
#: cannot even cover the per-step DMA issue + one MXU pass. Anything faster
#: is a relay replay (docs/PERF.md round-2 methodology).
FLOOR_NS_PER_STEP = 150.0


def time_kernel(variant: str, B: int, T: int = 512, H: int = 256,
                K: int = 12, reps: int = 3):
    """Median per-invocation seconds for one T-step forward kernel pass.

    Replay defense (docs/PERF.md): the big tensors (gx) are CLOSED OVER as
    trace-time constants from time-seeded randomness (fresh executable per
    run — arg-passed variants of the same math got served replayed results
    by the relay), only the small whh buffer + a fold-in scalar are args and
    are fresh per rep; the chain returns every per-step mean. Results under
    the physical floor are retried and flagged.
    """
    dtype = jnp.bfloat16 if variant == "bf16" else jnp.float32
    core = "full" if variant == "bf16" else variant
    G = 4 * H

    for attempt in range(3):
        rng = np.random.default_rng(time.time_ns() % (2**31))
        gx0 = jnp.asarray(
            rng.standard_normal((T, B, G)).astype(np.float32) * 0.1
        ).astype(dtype)
        lengths2d = jnp.full((B, 1), T, dtype=jnp.int32)

        @jax.jit
        def chain(whh0, salt):
            def body(carry, _):
                whh = (whh0.astype(jnp.float32)
                       + carry * 1e-18 + salt * 1e-15).astype(dtype)
                y = run_variant(core, lengths2d, gx0, whh)
                m = y.mean().astype(jnp.float32)
                return m, m

            _, ms = jax.lax.scan(body, jnp.float32(0), None, length=K)
            return ms

        def make_args(rep):
            whh = jnp.asarray(
                rng.standard_normal((H, G)).astype(np.float32) * 0.05
            ).astype(dtype)
            return whh, jnp.float32((time.time_ns() % 1009) + rep)

        args = make_args(0)
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        out = chain(*args)
        jax.block_until_ready(out)
        log(f"  [{variant} B={B}] compile+first {time.perf_counter() - t0:.1f}s")
        times = []
        for rep in range(1, reps + 1):
            args = make_args(rep)
            jax.block_until_ready(args)
            t0 = time.perf_counter()
            out = chain(*args)
            jax.block_until_ready(out)
            times.append((time.perf_counter() - t0) / K)
        times.sort()
        med = times[len(times) // 2]
        log(f"  [{variant} B={B}] {med * 1e3:.3f} ms/kernel "
            f"({med / T * 1e9:.0f} ns/step) reps={[f'{t * 1e3:.3f}' for t in times]}")
        if med / T * 1e9 >= FLOOR_NS_PER_STEP:
            return med, False
        log(f"  [{variant} B={B}] below the physical floor — replay "
            f"suspected, retrying ({attempt + 1}/3)")
    return med, True


def save(results):
    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    with open(OUT_PATH, "w") as f:
        json.dump(results, f, indent=1)


def main():
    T, H = 512, 256
    results = {
        "shapes": {"T": T, "H": H, "chunk": CHUNK, "n_mxu_passes_per_step": 16,
                   "note": "t in seconds per T-step forward kernel invocation; "
                           "ns_per_step = t/T*1e9"},
        "device": str(jax.devices()[0]),
        "measurements": [],
    }
    plan = [
        ("full", 32), ("full", 64), ("full", 128), ("full", 16),
        ("notrans", 32), ("notrans", 128),
        ("nomatmul", 32), ("nomatmul", 128),
        ("nocs", 32), ("nocs", 128),
        ("bf16", 32), ("bf16", 128),
    ]
    for variant, B in plan:
        try:
            t, suspect = time_kernel(variant, B, T=T, H=H)
            results["measurements"].append(
                {"variant": variant, "B": B, "t_s": t,
                 "ns_per_step": t / T * 1e9, "replay_suspect": suspect}
            )
        except Exception as e:  # record and continue — partial data is useful
            log(f"  [{variant} B={B}] FAILED: {e}")
            results["measurements"].append(
                {"variant": variant, "B": B, "error": str(e)[:500]}
            )
        save(results)

    # linear fit t(B) = a + b*B for the full variant
    full = [(m["B"], m["t_s"]) for m in results["measurements"]
            if m["variant"] == "full" and "t_s" in m
            and not m.get("replay_suspect")]
    if len(full) >= 2:
        Bs = np.array([b for b, _ in full], dtype=np.float64)
        ts = np.array([t for _, t in full], dtype=np.float64)
        b, a = np.polyfit(Bs, ts, 1)
        results["fit_full"] = {
            "a_fixed_ns_per_step": a / T * 1e9,
            "b_per_row_ns_per_step": b / T * 1e9,
            "comment": "t(B) = a + b*B per kernel; divided by T for per-step",
        }
    save(results)
    log(f"written {OUT_PATH}")


if __name__ == "__main__":
    main()
