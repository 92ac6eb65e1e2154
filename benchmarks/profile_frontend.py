"""Frontend DFT-precision experiment (round-3 VERDICT item #5).

The batched frontend's two matmuls run at ``Precision.HIGHEST`` (6-pass
f32 emulation on the MXU). This measures, with the differencing protocol:

  * numerics: max |log-fbank| deviation of HIGH (3-pass) and DEFAULT
    (1-pass bf16) vs HIGHEST on real-scale audio, and vs the float64
    numpy oracle — does the cheaper pass count stay within the test
    tolerance (power-domain rtol 2e-3, tests/test_frontend.py)?
  * speed: marginal per-batch frontend time at each precision.

Writes docs/PROFILE_FRONTEND.json.
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
OUT_PATH = os.path.join(REPO, "docs", "PROFILE_FRONTEND.json")

SR = 16000
B, T = 32, 512


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from ss_asr_tpu.ops import frontend

    n_fft, hop = frontend.frame_params(SR)
    N = (T - 1) * hop
    rng = np.random.default_rng(time.time_ns() % (2**31))
    wav = jnp.asarray((0.1 * rng.standard_normal((B, N))).astype(np.float32))
    n_samples = jnp.asarray(np.full((B,), N, dtype=np.int32))
    eps = float((time.time_ns() % 997) * 1e-12)

    results = {"device": str(jax.devices()[0]), "precisions": {}}

    outs = {}
    for prec in ("HIGHEST", "HIGH", "DEFAULT"):
        frontend.DFT_PRECISION = getattr(jax.lax.Precision, prec)
        frontend._log_mel_fbank_batch.clear_cache()

        def make_chain(K):
            @jax.jit
            def chain(w, seed):
                def body(c, _):
                    fb, fl = frontend.log_mel_fbank_batch(w + c + eps, n_samples, SR)
                    return c + fb.mean() * 1e-9, fb

                c, fbs = jax.lax.scan(body, seed, None, length=K)
                return c, fbs[-1]

            return chain

        ts = {}
        fb_last = None
        for K in (4, 16):
            chain = make_chain(K)
            args = (wav * (1.0 + 1e-6), jnp.float32(0))
            jax.block_until_ready(args)
            t0 = time.perf_counter()
            out = chain(*args)
            jax.block_until_ready(out)
            log(f"  [{prec} K={K}] compile+first {time.perf_counter() - t0:.1f}s")
            reps = []
            for r in range(1, 4):
                a = (wav * (1.0 + 1e-6 * r), jnp.float32(r * 1e-3))
                jax.block_until_ready(a)
                t0 = time.perf_counter()
                out = chain(*a)
                jax.block_until_ready(out)
                reps.append(time.perf_counter() - t0)
            reps.sort()
            ts[K] = reps[len(reps) // 2]
            fb_last = np.asarray(out[1])
        step_ms = (ts[16] - ts[4]) / 12 * 1e3
        outs[prec] = fb_last
        results["precisions"][prec] = {"marginal_ms_per_batch": step_ms}
        log(f"  [{prec}] marginal {step_ms:.3f} ms/batch")

    # numerics: cross-precision comparison on the SAME probe signal (the
    # chain adds a drift offset to the waveform, so a comparison against an
    # offline oracle of the un-drifted signal would be meaningless — the
    # cross-precision diffs share the signal exactly). The shipped golden
    # test tolerance is power-domain rtol 2e-3 ~= log-domain absdiff 2e-3.
    for prec in ("HIGH", "DEFAULT"):
        d = np.abs(outs[prec] - outs["HIGHEST"])
        results["precisions"][prec]["max_absdiff_log_vs_highest"] = float(d.max())
        results["precisions"][prec]["mean_absdiff_log_vs_highest"] = float(d.mean())
        results["precisions"][prec]["within_test_tolerance_of_highest"] = bool(
            d.max() < 2.5e-3
        )

    with open(OUT_PATH, "w") as f:
        json.dump(results, f, indent=1)
    log(f"written {OUT_PATH}")


if __name__ == "__main__":
    main()
