"""Phase 2 of the round-3 perf investigation (see profile_kernel.py):

1. T-sweep of the forward kernel — separates per-KERNEL launch overhead
   (intercept) from per-STEP loop cost (slope): t(T) = c + s*T.
2. Component-level B-scaling of the REAL flagship train step: time
   (a) the full train step, (b) a listener-only grad step, (c) a
   decoder-only grad step, at B=32 and B=64 — attributes the e2e
   "step time ~linear in B" observation (VERDICT round-2 weak #1) to the
   component that actually scales.

Replay defense (docs/PERF.md): all big tensors are generated ON DEVICE from
a time-baked key inside the jitted chain (never shipped — the remote compile
body has a 64 MB-ish limit), a trace-time epsilon makes every run a fresh
executable, small args are fresh per rep, median of >=3 reps, physical
floors. Writes docs/PROFILE_STEP.json incrementally.
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
OUT_PATH = os.path.join(REPO, "docs", "PROFILE_STEP.json")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _median_time(chain, make_args, K, label, floor_ms_per_item=0.0, reps=3):
    for attempt in range(3):
        args = make_args(0)
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        out = chain(*args)
        jax.block_until_ready(out)
        log(f"  [{label}] compile+first {time.perf_counter() - t0:.1f}s")
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
        log(f"  [{label}] {med * 1e3:.3f} ms/item "
            f"reps={[f'{t * 1e3:.3f}' for t in times]}")
        if med * 1e3 >= floor_ms_per_item:
            return med, False
        log(f"  [{label}] below physical floor ({floor_ms_per_item} ms) — "
            f"replay suspected, retry {attempt + 1}/3")
    return med, True


# ---------------------------------------------------------------------------
# 1. kernel T sweep (and B=128 on-device)
# ---------------------------------------------------------------------------

def time_kernel_T(T: int, B: int, H: int = 256, K: int = 8):
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

    # floor: T sequential steps cannot beat ~150 ns/step
    return _median_time(chain, make_args, K, f"kernel T={T} B={B}",
                        floor_ms_per_item=T * 150e-6)


# ---------------------------------------------------------------------------
# 2. component B-scaling of the real train step
# ---------------------------------------------------------------------------

def _flagship():
    from ss_asr_tpu.models import las

    cfg = las.ASRConfig()
    return cfg


def time_component(component: str, B: int, T: int = 512, L: int = 48, K: int = 8):
    from ss_asr_tpu.models import las
    from ss_asr_tpu.train import losses
    from ss_asr_tpu.train.optim import make_optimizer

    cfg = _flagship()
    optim = make_optimizer("Adadelta", 1.0)
    eps = float((time.time_ns() % 997) * 1e-12)
    base = int(time.time_ns() % (2**31))
    x_lens = jnp.full((B,), T, dtype=jnp.int32)

    @jax.jit
    def chain(params, opt_state, key):
        kx, ky = jax.random.split(jax.random.key(base))
        x = jax.random.normal(kx, (B, T, cfg.feature_dim), jnp.float32) + eps
        y = jax.random.randint(ky, (B, L), 1, cfg.vocab_size, jnp.int32)
        enc_const = enc_lens_const = None
        if component == "decoder":
            # encoder output precomputed ONCE outside the chain's scan: the
            # chain then measures only attend-and-spell fwd+bwd+update
            enc_const, enc_lens_const = las.listener_apply(params["encoder"], x, x_lens)
            enc_const = jax.lax.stop_gradient(enc_const)

        def one(carry, k):
            params, opt_state = carry

            if component == "full":
                def loss_fn(p):
                    _, logits, _ = las.asr_forward(
                        p, cfg, x, x_lens, L - 1, teacher=y, key=k
                    )
                    return losses.masked_ce_per_utt(logits, y[:, 1:], y)
            elif component == "listener":
                def loss_fn(p):
                    h, hl = las.listener_apply(p["encoder"], x, x_lens)
                    return (h * h).mean()
            elif component == "decoder":
                def loss_fn(p):
                    logits, _ = las.attend_and_spell(
                        p, cfg, enc_const, enc_lens_const, L - 1, teacher=y, key=k,
                    )
                    return losses.masked_ce_per_utt(logits, y[:, 1:], y)
            else:
                raise ValueError(component)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optim.update(grads, opt_state, params)
            params = jax.tree.map(lambda a, u: a + u, params, updates)
            return (params, opt_state), loss

        (params, opt_state), ls = jax.lax.scan(
            one, (params, opt_state), jax.random.split(key, K)
        )
        return ls

    from ss_asr_tpu.models import las as las_mod

    def make_args(rep):
        p = las_mod.init_asr(jax.random.key(base + rep), cfg)
        return p, optim.init(p), jax.random.fold_in(jax.random.key(base), rep)

    return _median_time(chain, make_args, K, f"{component} B={B}",
                        floor_ms_per_item=0.5)


def save(results):
    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    with open(OUT_PATH, "w") as f:
        json.dump(results, f, indent=1)


def main():
    results = {"device": str(jax.devices()[0]), "kernel_T_sweep": [],
               "component_B_scaling": []}

    for T, B in [(128, 32), (512, 32), (1024, 32), (512, 128)]:
        try:
            t, suspect = time_kernel_T(T, B)
            results["kernel_T_sweep"].append(
                {"T": T, "B": B, "t_s": t, "ns_per_step": t / T * 1e9,
                 "replay_suspect": suspect})
        except Exception as e:
            log(f"  [kernel T={T} B={B}] FAILED: {e}")
            results["kernel_T_sweep"].append({"T": T, "B": B, "error": str(e)[:300]})
        save(results)

    # intercept/slope from the B=32 T sweep
    pts = [(m["T"], m["t_s"]) for m in results["kernel_T_sweep"]
           if m.get("B") == 32 and "t_s" in m and not m.get("replay_suspect")]
    if len(pts) >= 2:
        Ts = np.array([a for a, _ in pts], float)
        ts = np.array([b for _, b in pts], float)
        s, c = np.polyfit(Ts, ts, 1)
        results["kernel_fit_T"] = {
            "per_kernel_overhead_ms": c * 1e3,
            "per_step_ns": s * 1e9,
            "comment": "t(T) = c + s*T at B=32, full fwd kernel",
        }
        save(results)

    for component in ("full", "listener", "decoder"):
        for B in (32, 64):
            try:
                t, suspect = time_component(component, B)
                results["component_B_scaling"].append(
                    {"component": component, "B": B, "t_ms": t * 1e3,
                     "utt_per_s": B / t, "replay_suspect": suspect})
            except Exception as e:
                log(f"  [{component} B={B}] FAILED: {e}")
                results["component_B_scaling"].append(
                    {"component": component, "B": B, "error": str(e)[:300]})
            save(results)
    log(f"written {OUT_PATH}")


if __name__ == "__main__":
    main()
