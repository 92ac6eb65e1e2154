"""Width-scaling profile: does MFU climb as the recurrences widen?

The round-3 truth campaign (docs/PERF.md) attributed the flagship's ~21%
MFU to an architecture property, not an implementation gap: H=256
recurrent matmuls ([B,256]x[256,1024]) stream B rows through 32 of the
MXU's 128 rows per pass, so ~3 ms of every step is pinned at the MXU
row-streaming floor. The stated implication — "wider recurrences fill
the MXU" — was never measured. This script measures it: the full
flagship train step (fused Pallas kernels, Adadelta, scan-chained with
two-point chain-length differencing exactly as profile_opt.py) at
encoder/decoder widths 256 / 512 / 1024, with per-config FLOPs from an
analytic matmul count over the exact layer structure (XLA's
cost_analysis can't see inside Pallas custom calls, where the recurrent
matmuls live). Convention: 2 FLOPs per multiply-add (2mnk per matmul;
the same convention the 197 TFLOP/s v5e peak uses), backward = 2x
forward matmul FLOPs (dX pass + dW pass), elementwise/optimizer terms
dropped (<1% at these shapes).

Writes docs/PROFILE_WIDTH.json incrementally.

Reference context: the reference trains one fixed geometry
(/root/reference/conf/default.yaml:6-8, 256-wide listener/speller); the
TPU framework keeps width a config knob (asr.mdl.encoder_state_size),
and this artifact records what that knob buys on real hardware.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT_PATH = os.path.join(REPO, "docs", "PROFILE_WIDTH.json")

K_LO, K_HI = 6, 22
V5E_BF16_PEAK_TFLOPS = 197.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_chain(cfg, optim, B: int, K: int, T: int, L: int):
    from ss_asr_tpu.models import las
    from ss_asr_tpu.ops import rnn
    from ss_asr_tpu.train import losses

    copts = rnn.wide_h_compiler_options(cfg.encoder_state_size,
                                        spell_h=cfg.decoder_state_size)

    eps = float((time.time_ns() % 997) * 1e-12)
    base = int(time.time_ns() % (2**31))
    x_lens = jnp.full((B,), T, dtype=jnp.int32)

    @functools.partial(jax.jit, compiler_options=copts)
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

    return chain, make_args


def step_flops_analytic(cfg, B: int, T: int, L: int) -> float:
    """Matmul FLOPs of one train step (fwd + bwd), 2mnk convention.

    Mirrors models/las.py exactly: 4 bidirectional layers (bilstm then
    time-halving for the first three, so layer l runs at T/2^l with
    input dim 40 then 4H), cached psi precompute, then L-1 decode steps
    of phi/energy/context + 2 LSTM cells + char projection. Backward
    counted as 2x forward (dX + dW matmul passes).
    """
    H, D = cfg.encoder_state_size, cfg.decoder_state_size
    F, m, V = cfg.feature_dim, cfg.mlp_out_size, cfg.vocab_size
    enc_out = 2 * H
    fwd = 0.0
    t, i = T, F
    for layer in range(4):
        # per direction: input proj 2*t*B*i*4H + recurrent 2*t*B*H*4H
        fwd += 2 * (2 * t * B * (i + H) * 4 * H)
        if layer < 3:
            t //= 2
            i = 4 * H
    S = t  # encoder steps = T // 8
    fwd += 2 * B * S * enc_out * m  # psi(h) precompute
    steps = L - 1
    per_step = (
        2 * B * D * m            # phi(s)
        + 2 * B * S * m          # energies
        + 2 * B * S * enc_out    # context
        + 2 * B * (enc_out + 2 * D) * 4 * D  # cell1: I = embed D + ctx
        + 2 * B * (2 * D) * 4 * D            # cell2
        + 2 * B * D * V          # char_trans
    )
    fwd += steps * per_step
    return 3.0 * fwd  # fwd + 2x-fwd backward


def time_chain(chain, make_args, reps: int = 3) -> float:
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


def measure_width(H: int, B: int, T: int = 512, L: int = 48):
    from ss_asr_tpu.models import las
    from ss_asr_tpu.ops import rnn
    from ss_asr_tpu.train.optim import make_optimizer

    cfg = las.ASRConfig(encoder_state_size=H, decoder_state_size=H,
                        mlp_out_size=H // 2)
    # Round-3 late fixes: both wide-H "compiler crashes" were scoped-VMEM
    # exhaustion. The LSTM kernels now dispatch to H=1024 (bf16 W_hh past
    # WEIGHT_BF16_MIN_H + H-aware chunks) and the spell kernels to D=512;
    # build_chain attaches rnn.wide_h_compiler_options (raised scoped-vmem
    # limit) exactly as the ASR trainer does. The gates are set explicitly
    # here so the artifact records the impls measured.
    rnn.SPELL_IMPL = "auto" if H <= rnn.SPELL_KERNEL_MAX_H else "scan"
    rnn.LSTM_IMPL = "auto" if H <= rnn.LSTM_KERNEL_MAX_H else "scan"
    optim = make_optimizer("Adadelta", 1.0)
    label = (f"H={H} B={B} T={T} L={L} "
             f"spell={rnn.SPELL_IMPL} lstm={rnn.LSTM_IMPL}")

    log(f"  [{label}] K={K_LO} ...")
    chain_lo, margs_lo = build_chain(cfg, optim, B, K_LO, T, L)
    t_lo = time_chain(chain_lo, margs_lo)

    log(f"  [{label}] K={K_HI} ...")
    chain_hi, margs_hi = build_chain(cfg, optim, B, K_HI, T, L)
    t_hi = time_chain(chain_hi, margs_hi)

    step_ms = (t_hi - t_lo) / (K_HI - K_LO) * 1e3
    step_flops = step_flops_analytic(cfg, B, T, L)
    tflops_s = step_flops / (step_ms * 1e-3) / 1e12
    mfu = tflops_s / V5E_BF16_PEAK_TFLOPS
    log(f"  [{label}] step {step_ms:.2f} ms -> {B / step_ms * 1e3:.0f} utt/s, "
        f"{step_flops / 1e9:.0f} GFLOP/step, {tflops_s:.1f} TFLOP/s "
        f"= {mfu * 100:.1f}% MFU")
    return {
        "H": H, "B": B, "T": T, "L": L,
        "spell_impl": rnn.SPELL_IMPL, "lstm_impl": rnn.LSTM_IMPL,
        "t_total_lo_ms": t_lo * 1e3, "t_total_hi_ms": t_hi * 1e3,
        "K_lo": K_LO, "K_hi": K_HI,
        "step_ms": step_ms, "utt_per_s": B / step_ms * 1e3,
        "gflop_per_step": step_flops / 1e9,
        "tflop_per_s": tflops_s,
        "mfu_vs_v5e_bf16_peak": mfu,
    }


def main():
    # merge into an existing artifact so single-config reruns
    # (PROFILE_WIDTH_PLAN=1024:32) refresh one point, not the file
    results = {"device": str(jax.devices()[0]),
               "peak_tflops_assumed": V5E_BF16_PEAK_TFLOPS,
               "configs": []}
    if os.path.exists(OUT_PATH):
        try:
            with open(OUT_PATH) as f:
                results["configs"] = json.load(f).get("configs", [])
        except Exception:
            pass

    def put(entry):
        key = (entry.get("H"), entry.get("B"), entry.get("T"))
        results["configs"] = [
            c for c in results["configs"]
            if (c.get("H"), c.get("B"), c.get("T")) != key
        ] + [entry]
    plan_env = os.environ.get("PROFILE_WIDTH_PLAN")  # H:B[:T[:L]],...
    if plan_env:
        plan = []
        for p in plan_env.split(","):
            f = [int(x) for x in p.split(":")]
            plan.append((f[0], f[1],
                         f[2] if len(f) > 2 else 512,
                         f[3] if len(f) > 3 else 48))
    else:
        plan = [(256, 32, 512, 48), (512, 32, 512, 48), (1024, 32, 512, 48)]
    for H, B, T, L in plan:
        try:
            put(measure_width(H, B, T=T, L=L))
        except Exception as e:
            log(f"  [H={H} B={B}] FAILED: {e}")
            put({"H": H, "B": B, "T": T, "error": str(e)[:300]})
        with open(OUT_PATH, "w") as f:
            json.dump(results, f, indent=1)
    log(f"written {OUT_PATH}")


if __name__ == "__main__":
    main()
