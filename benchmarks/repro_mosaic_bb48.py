"""Minimized repro: the BB=48 spell-grid compile failure (tracked bug).

``ops/pallas/spell.py`` caps multi-block batch grids at BB=32
(``BATCH_BLOCK_MULTI``) because a 48-row block inside a 2-D
(batch-block x L-chunk) grid fails to compile at the STOCK 16 MB
scoped-VMEM limit — round-3 recorded it as a "Mosaic internal compile
error", and round-4's PROFILE_OPT phase 4 showed the same shape compiles
(and runs ~2% faster at B=96) once the scoped-VMEM jit option is raised.
This script pins that down as a reproducible artifact instead of folklore
(round-4 VERDICT next-round #9):

  arm A  B=96, BB=48, stock limit     -> expected: compile error (recorded)
  arm B  B=96, BB=32, stock limit     -> expected: compiles (the shipped cap)
  arm C  B=96, BB=48, raised limit    -> expected: compiles (the workaround)

All three arms AOT-compile the full forward+backward spell program
(``jax.value_and_grad`` through the custom-VJP kernel pair) — no timing, no
execution — so the artifact isolates the compiler behavior.  Run on a real
TPU:

    python benchmarks/repro_mosaic_bb48.py --out docs/MOSAIC_BB48_REPRO.json

The JSON records per-arm {compiled, error} plus the error text of arm A —
the upstream-reportable payload.  If arm A ever starts compiling (a
toolchain fix), the artifact says so and BATCH_BLOCK_MULTI can be raised.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _compile_arm(BB: int, raised: bool, B: int = 96, S: int = 64,
                 L: int = 48) -> dict:
    """AOT-compile fwd+bwd of the fused spell kernel at batch B with the
    multi-block cap patched to BB; returns {compiled, error?}."""
    import jax
    import jax.numpy as jnp

    from ss_asr_tpu.models import las
    from ss_asr_tpu.ops.pallas import spell

    cfg = las.ASRConfig()
    params = las.init_asr(jax.random.key(0), cfg)
    enc_h = jnp.zeros((B, S, 2 * cfg.encoder_state_size), jnp.float32)
    enc_lens = jnp.full((B,), S, jnp.int32)
    teacher = jnp.ones((B, L + 1), jnp.int32)

    def loss(p):
        logits, _ = spell.attend_and_spell_pallas(
            p, cfg, enc_h, enc_lens, L, teacher, jax.random.key(1))
        return logits.sum()

    opts = ({"xla_tpu_scoped_vmem_limit_kib": "32768"} if raised else None)
    fn = jax.jit(jax.value_and_grad(loss), compiler_options=opts)

    old_multi, old_max = spell.BATCH_BLOCK_MULTI, spell.BATCH_BLOCK_MAX
    spell.BATCH_BLOCK_MULTI = BB
    jax.clear_caches()
    try:
        fn.lower(params).compile()
        return {"compiled": True}
    except Exception as e:  # noqa: BLE001 — the error IS the payload
        msg = str(e)
        # keep head AND tail: the relay prepends ~2k chars of transport
        # warnings, while the actual compiler diagnostic (scoped-VMEM vs
        # Mosaic internal) sits at the end
        if len(msg) > 4000:
            msg = msg[:1000] + "\n...[truncated]...\n" + msg[-3000:]
        return {"compiled": False,
                "error_type": type(e).__name__,
                "error": msg}
    finally:
        spell.BATCH_BLOCK_MULTI, spell.BATCH_BLOCK_MAX = old_multi, old_max
        jax.clear_caches()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        REPO, "docs", "MOSAIC_BB48_REPRO.json"))
    args = ap.parse_args()

    import jax

    if jax.default_backend() != "tpu":
        raise SystemExit("repro needs a real TPU backend (Mosaic lowering); "
                         f"got {jax.default_backend()}")

    out = {
        "what": ("Minimized compile-only repro of the BB=48 multi-block "
                 "spell-grid failure that caps BATCH_BLOCK_MULTI at 32 "
                 "(ops/pallas/spell.py) — fwd+bwd AOT at B=96, S=64, L=48, "
                 "flagship H=256, v5e"),
        "jax_version": jax.__version__,
        "device": str(jax.devices()[0]),
        "arms": {},
    }
    for name, bb, raised in (("A_bb48_stock", 48, False),
                             ("B_bb32_stock", 32, False),
                             ("C_bb48_raised_vmem", 48, True)):
        print(f"compiling arm {name} ...", file=sys.stderr, flush=True)
        out["arms"][name] = _compile_arm(bb, raised)
        print(f"  -> {out['arms'][name].get('compiled')}", file=sys.stderr)

    a, b, c = (out["arms"][k] for k in
               ("A_bb48_stock", "B_bb32_stock", "C_bb48_raised_vmem"))
    if not a["compiled"] and b["compiled"] and c["compiled"]:
        out["verdict"] = (
            "reproduced: BB=48 inside a 2-D grid fails ONLY at the stock "
            "scoped-VMEM limit — a VMEM-budget rejection surfacing as a "
            "compiler error, not a kernel bug; the shipped BB=32 cap and "
            "the raised-limit escape are both sound")
    elif a["compiled"]:
        out["verdict"] = ("NOT reproduced: BB=48 now compiles at the stock "
                          "limit — toolchain fixed; BATCH_BLOCK_MULTI can "
                          "be re-benchmarked at 48")
    elif not b["compiled"] and c["compiled"]:
        out["verdict"] = (
            "stronger than round 3 recorded: at this toolchain the ENTIRE "
            "B=96 multi-block fwd+bwd regime exceeds the stock scoped-VMEM "
            "budget regardless of block size (BB=32 fails too); the "
            "raised-limit option — auto-attached in production via "
            "rnn.wide_h_compiler_options and bench._chain_jit — is "
            "load-bearing, and the BB=48-vs-32 distinction only exists "
            "under the raised limit (where round-4 PROFILE_OPT phase 4 "
            "measured BB=48 ~2% faster)")
    else:
        out["verdict"] = "unexpected arm pattern — see per-arm errors"

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v.get("compiled") for k, v in out["arms"].items()}))
    print(f"written to {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
