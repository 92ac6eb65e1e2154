"""Headline benchmark: the north-star metric from BASELINE.json —
utterances/sec/chip for the END-TO-END fbank + LAS train step.

Prints exactly ONE JSON line:
    {"metric": ..., "value": N, "unit": "utt/s/chip", "vs_baseline": N}

The default run measures, and records in docs/BENCH_DETAILS.json:

* ``e2e_train`` — raw 16 kHz waveform buffers -> batched log-mel frontend
  (ops/frontend.py, two MXU matmuls) -> full jitted train step (forward with
  scheduled sampling, masked CE, backward, Adadelta update), ONE XLA program.
  This is the headline value.
* ``train_only`` — the same step on pre-extracted features (round-1 metric,
  kept for comparability).
* ``frontend_only`` — the batched fbank alone, to show its share.
* ``decode_latency`` — p50 single-utterance latency for greedy (fixed-step
  scan), greedy early-exit, the beam-8 frontier scan, and the serving path
  (waveform -> frontend -> early-exit decode, the Transcriber shape).

Timing methodology (round 3 — supersedes the round-1/2 total/K protocol):
every program INVOCATION through this environment's relay carries a ~25 ms
dispatch overhead P, measured in benchmarks/profile_overhead.py (chain
totals are nearly flat in K; an empty program round-trips in 0.035 ms).
total/K therefore over-reports step time by P/K. All metrics here use
two-point differencing — run the same chained program at K_LO and K_HI
steps and report (t(K_HI) - t(K_LO)) / (K_HI - K_LO) — which cancels P
exactly and measures the true device step time, i.e. what a production
host loop (which pipelines dispatch) sustains. Replay defenses kept from
round 2: trace-time epsilon (fresh executable per run), fresh param
buffers per rep, median of >=3, physical floors.

``vs_baseline`` divides e2e throughput by a from-scratch PyTorch
implementation of the train step on this host's CPU
(benchmarks/torch_reference.py, cached in bench_baseline.json). The torch
number excludes fbank extraction, so the ratio is *conservative* — our
numerator does strictly more work. The reference repo publishes no throughput
numbers (SURVEY.md §6).

Flags: --quick (small shapes, CPU-friendly), --no-baseline, --metric.
Diagnostics go to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "bench_baseline.json")
DETAILS_PATH = os.path.join(REPO, "docs", "BENCH_DETAILS.json")

SR = 16000  # bench sample rate: 25ms/10ms -> n_fft 400, hop 160


def log(*a):
    print(*a, file=sys.stderr, flush=True)


#: first-invocation ("compile+first run") seconds of every chain built this
#: invocation — the artifact's proof that the persistent compile cache works:
#: a warm invocation's total collapses from hundreds of seconds to the pure
#: first-run device time (round-4 VERDICT weak #7: the r04 run paid a 202.7 s
#: cold compile and the cache commit's effect was never recorded)
_COMPILE_EVENTS: list = []


def _compile_summary() -> dict:
    if not _COMPILE_EVENTS:
        return {}
    return {
        "n_chains": len(_COMPILE_EVENTS),
        "total_s": round(sum(_COMPILE_EVENTS), 1),
        "max_s": round(max(_COMPILE_EVENTS), 1),
    }


def _enable_compile_cache():
    """Persistent executable cache shared across bench invocations (and the
    driver's end-of-round run). Remote relay compiles are erratic — 15 s to
    ~17 min observed for same-size programs (the supervisor docstring) —
    and the big x22 e2e chain can blow the stall window on a cold machine;
    with the cache, a killed-mid-compile retry or a later invocation reuses
    every executable that DID finish. No-op (with a logged note) when the
    backend doesn't support executable serialization."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache_bench"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover — config-API drift
        log(f"persistent compile cache unavailable: {e}")


def _chain_jit(fn):
    """jit for the outer decode-chain programs. On TPU, attach the raised
    scoped-VMEM limit: fused decode kernels composed INSIDE a chain must
    route to their plain (option-free) jits — jax rejects
    ``compiler_options`` on a nested jit — so the OUTER program supplies
    the headroom their top-level raised executables would have
    (ops/rnn.py ``top_level_call`` notes; measured neutral-to-better for
    legal shapes, docs/PERF.md round 3)."""
    import jax

    if jax.default_backend() == "tpu":
        return jax.jit(
            fn,
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": "32768"})
    return jax.jit(fn)


def _flagship():
    import jax

    from ss_asr_tpu.models import las

    cfg = las.ASRConfig()
    params = las.init_asr(jax.random.key(0), cfg)
    return cfg, params


#: chain lengths for two-point differencing (see module docstring): the
#: spread amortizes measurement noise; both chains share replay defenses
K_LO, K_HI = 6, 22



def _time_total(chain_fn, make_args, reps=3):
    """Median TOTAL seconds of one chained program on fresh buffers.

    ``make_args(rep)`` must build FRESH device buffers per rep (re-init the
    params — it runs outside the timed region). Relay behaviors forcing
    this (PERF.md): host-side step loops get pipelined/replayed, and
    re-invoking even a chained program on the same buffers is served from a
    cache. MEDIAN, not min: previously-seen executables occasionally get
    one replayed (near-zero) invocation even on fresh inputs.
    Returns (total seconds, last output).
    """
    import jax

    args = make_args(0)
    jax.block_until_ready(args)
    t0 = time.perf_counter()
    out = chain_fn(*args)
    jax.block_until_ready(out)
    first_s = time.perf_counter() - t0
    _COMPILE_EVENTS.append(first_s)
    log(f"  compile+first run in {first_s:.1f}s")
    times = []
    for rep in range(1, reps + 1):
        args = make_args(rep)
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        out = chain_fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
        log(f"  rep {rep}: {times[-1]:.3f}s")  # also the supervisor heartbeat
    times.sort()
    return times[len(times) // 2], out


def _time_chained_diff(make_chain, make_args, reps=3):
    """True per-step seconds by two-point differencing over chain length.

    ``make_chain(K)`` builds the jitted K-step chain; the per-program
    dispatch overhead P cancels in (t(K_HI) - t(K_LO)) / (K_HI - K_LO).
    Returns (per-step seconds, per-program overhead estimate, last output).
    """
    t_lo, _ = _time_total(make_chain(K_LO), make_args, reps)
    t_hi, out = _time_total(make_chain(K_HI), make_args, reps)
    dt = (t_hi - t_lo) / (K_HI - K_LO)
    overhead = t_lo - K_LO * dt
    return dt, overhead, out


def bench_train_step(B: int, T: int, L: int, iters: int = 10) -> float:
    """Train-step throughput on pre-extracted features (round-1 metric)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ss_asr_tpu.models import las
    from ss_asr_tpu.train import losses
    from ss_asr_tpu.train.optim import make_optimizer

    cfg, params = _flagship()
    optim = make_optimizer("Adadelta", 1.0)
    opt_state = optim.init(params)
    # time-derived DATA values: the relay has also served replays for runs
    # whose large input tensors matched an earlier run byte-for-byte
    rng = np.random.default_rng(time.time_ns() % (2**31))
    x = jnp.asarray(rng.standard_normal((B, T, cfg.feature_dim)).astype(np.float32))
    x_lens = jnp.asarray(np.full((B,), T, dtype=np.int32))
    y = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, L)).astype(np.int32))

    # trace-time epsilon -> a never-seen-before executable every bench run;
    # the relay replays programs it has seen before (PERF.md round 2)
    eps = float((time.time_ns() % 997) * 1e-12)

    # NOTE the construction: x/x_lens/y are CLOSED OVER (baked as program
    # constants), only params/opt_state/key are arguments, and the chain
    # returns every per-step loss. This exact shape has measured honestly in
    # independent sessions, while arg-passed variants of the same math kept
    # being served replayed results by the relay; main() cross-checks the
    # result against the e2e chain and flags it if it is implausibly fast.
    def make_chain(K):
        @jax.jit
        def train_chain(params, opt_state, key):
            def one(carry, k):
                params, opt_state = carry

                def loss_fn(p):
                    _, logits, _ = las.asr_forward(
                        p, cfg, x + eps, x_lens, y.shape[1] - 1, teacher=y, key=k
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

        return train_chain

    base = int(time.time_ns() % (2**31))

    def make_args(rep):
        p = las.init_asr(jax.random.key(base + rep), cfg)
        return p, optim.init(p), jax.random.fold_in(jax.random.key(base), rep)

    log(f"train_only: compiling x{K_LO}+x{K_HI} chained (B={B}, T={T}, L={L}) "
        f"on {jax.devices()[0]} ...")
    dt, overhead, out = _time_chained_diff(make_chain, make_args)
    log(f"  step {dt * 1e3:.2f} ms -> {B / dt:.1f} utt/s "
        f"(P~{overhead * 1e3:.1f} ms, loss {float(out[-1]):.3f})")
    return B / dt


def bench_e2e_step(B: int, T: int, L: int, iters: int = 10):
    """North-star: waveform -> fused-in fbank -> train step, one XLA program.

    T is the frame count; the waveform buffer is sized so the frontend
    produces exactly T frames ((T-1)*hop samples at 16 kHz).
    Returns (e2e utt/s, frontend-only ms)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ss_asr_tpu.models import las
    from ss_asr_tpu.ops import frontend
    from ss_asr_tpu.train import losses
    from ss_asr_tpu.train.optim import make_optimizer

    cfg, params = _flagship()
    optim = make_optimizer("Adadelta", 1.0)
    opt_state = optim.init(params)
    n_fft, hop = frontend.frame_params(SR)
    N = (T - 1) * hop
    rng = np.random.default_rng(time.time_ns() % (2**31))  # see bench_train_step
    wav = jnp.asarray((0.1 * rng.standard_normal((B, N))).astype(np.float32))
    n_samples = jnp.asarray(np.full((B,), N, dtype=np.int32))
    y = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, L)).astype(np.int32))

    eps = float((time.time_ns() % 997) * 1e-12)  # fresh executable per run

    def make_chain(K):
        @jax.jit
        def e2e_chain(params, opt_state, key):
            def one(carry, k):
                params, opt_state, prev = carry
                # tie the waveform to the carry so XLA cannot hoist the
                # frontend out of the scan as loop-invariant (each step must
                # re-run it, as a real input pipeline would)
                # pass n_samples even though every bench row fills the
                # buffer: a real input pipeline pays the per-row reflection
                # patch and frame masking, so the headline must include that
                # work (the n_samples=None fast path exists for callers that
                # can prove full buffers, but benchmarking it would
                # overstate throughput)
                x, x_lens = frontend.log_mel_fbank_batch(
                    wav * (1.0 + eps + 1e-12 * prev), n_samples, SR
                )

                def loss_fn(p):
                    _, logits, _ = las.asr_forward(
                        p, cfg, x, x_lens, y.shape[1] - 1, teacher=y, key=k
                    )
                    return losses.masked_ce_per_utt(logits, y[:, 1:], y)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = optim.update(grads, opt_state, params)
                params = jax.tree.map(lambda a, u: a + u, params, updates)
                return (params, opt_state, loss), loss

            (params, opt_state, _), ls = jax.lax.scan(
                one, (params, opt_state, jnp.float32(0)), jax.random.split(key, K)
            )
            return params, opt_state, ls[-1]

        return lambda p, o, k: e2e_chain(p, o, k)

    log(f"e2e (fbank+train): compiling x{K_LO}+x{K_HI} chained "
        f"(B={B}, N={N} samples -> T={T}, L={L}) ...")
    base = int(time.time_ns() % (2**31))  # see bench_train_step

    def make_args(rep):
        p = las.init_asr(jax.random.key(base + rep), cfg)
        return p, optim.init(p), jax.random.fold_in(jax.random.key(base), rep)

    dt, overhead, out = _time_chained_diff(make_chain, make_args)
    log(f"  step {dt * 1e3:.2f} ms -> {B / dt:.1f} utt/s "
        f"(P~{overhead * 1e3:.1f} ms, loss {float(out[2]):.3f})")

    # frontend share: differenced over chain length like everything else
    def make_fe_chain(K):
        @jax.jit
        def fe_chain(wav, seed):
            def body(c, _):
                fb, fl = frontend.log_mel_fbank_batch(wav + c + eps, n_samples, SR)
                return c + fb.mean(), None
            s, _ = jax.lax.scan(body, seed, None, length=K)
            return s

        return fe_chain

    fe_base = (time.time_ns() % 10**6) * 1e-9
    fe_s, _, _ = _time_chained_diff(
        make_fe_chain,
        lambda rep: (wav * (1.0 + 1e-6 * rep + fe_base), jnp.float32(rep)),
    )
    fe_ms = fe_s * 1e3
    log(f"  frontend alone: {fe_ms:.2f} ms/batch")
    return B / dt, fe_ms


def bench_decode_latency(T: int = 512, max_steps: int = 200, K: int = 8,
                         iters: int = 3, floor_ms: float | None = None):
    """Marginal single-utterance decode latency via differenced in-jit chains.

    K decodes of K distinct on-device-generated inputs run inside ONE jitted
    program; two chain lengths cancel the per-program dispatch overhead
    (module docstring). The ``serving_e2e`` variant is the Transcriber shape
    (ss_asr_tpu/api.py): raw waveform -> batched log-mel frontend ->
    early-exit greedy decode, i.e. the full serving path per utterance.
    Physical-floor retries flag replay suspects.
    Returns ({variant: marginal_ms}, [suspect variants]).
    (Reference decode loop: src/asr.py:112-173, serial python.)
    """
    import jax
    import jax.numpy as jnp

    from ss_asr_tpu.decode import beam as beam_mod
    from ss_asr_tpu.decode.greedy import greedy_decode, greedy_decode_early_exit
    from ss_asr_tpu.models import las
    from ss_asr_tpu.ops import frontend

    cfg, params = _flagship()
    xl = jnp.asarray([T], dtype=jnp.int32)
    n_fft, hop = frontend.frame_params(SR)
    N = (T - 1) * hop
    n_samples = jnp.asarray([N], dtype=jnp.int32)

    eps = float((time.time_ns() % 997) * 1e-12)  # fresh executable per run
    k_lo, k_hi = K, 3 * K

    def chain(decode_fn, k):
        @_chain_jit
        def run(key):
            xs = eps + jax.random.normal(key, (k, 1, T, cfg.feature_dim), jnp.float32)

            def body(c, x):
                toks, lens = decode_fn(x)
                return c + lens.sum(), None

            s, _ = jax.lax.scan(body, jnp.int32(0), xs)
            return s

        return run

    def serving_chain(k):
        @_chain_jit
        def run(key):
            wavs = 0.1 * jax.random.normal(key, (k, 1, N), jnp.float32) + eps

            def body(c, w):
                x, x_lens = frontend.log_mel_fbank_batch(w, n_samples, SR)
                toks, lens = greedy_decode_early_exit(
                    params, cfg, x, x_lens, max_steps
                )
                return c + lens.sum(), None

            s, _ = jax.lax.scan(body, jnp.int32(0), wavs)
            return s

        return run

    def beam_scan_only(x, early_exit=False):
        enc_h, enc_lens = las.listener_apply(params["encoder"], x, xl)
        toks, parents, scores, done, hyp_lens = beam_mod._beam_scan(
            params, cfg, enc_h, enc_lens, 8, max_steps, None, None, 0.0,
            early_exit=early_exit,
        )
        return toks, hyp_lens.reshape(-1)

    def align_chain(k):
        # the detailed-decode extra cost: forced alignment of 4 hypotheses
        # (48 chars) per utterance — one listener pass + a 4-row tiled
        # teacher-forced attend-and-spell (decode/align.py)
        from ss_asr_tpu.decode import align as align_mod

        ids = jax.random.randint(jax.random.PRNGKey(7), (4, 48), 3, 49)

        @_chain_jit
        def run(key):
            xs = eps + jax.random.normal(key, (k, 1, T, cfg.feature_dim), jnp.float32)

            def body(c, x):
                frames, logp = align_mod._align_tiled_device(
                    params, cfg, x, xl, ids, 48, 4, None, None, 0.0)
                return c + frames.sum() + logp.sum().astype(jnp.int32), None

            s, _ = jax.lax.scan(body, jnp.int32(0), xs)
            return s

        return run

    variants = {
        "greedy_scan": lambda k: chain(
            lambda x: greedy_decode(params, cfg, x, xl, max_steps), k),
        "align_nbest4": align_chain,
        "greedy_early_exit": lambda k: chain(
            lambda x: greedy_decode_early_exit(params, cfg, x, xl, max_steps), k),
        "beam8_scan": lambda k: chain(beam_scan_only, k),
        # NB random weights rarely emit EOS, so this measures the
        # while_loop machinery at full length — the exit win shows on
        # real checkpoints whose hypotheses finish early
        "beam8_early_exit": lambda k: chain(
            lambda x: beam_scan_only(x, early_exit=True), k),
        "serving_e2e": serving_chain,
    }
    if jax.default_backend() == "tpu":
        # the fused decode kernels (whole loop as one Pallas program)
        # only compile on real TPU; record them so the A/B vs the XLA
        # variants is on the record (ops/pallas/{decode,beam}.py)
        from ss_asr_tpu.ops.pallas.beam import beam_device_pallas
        from ss_asr_tpu.ops.pallas.decode import greedy_decode_pallas

        def beam8_pallas_single(x):
            toks, parents, scores, done, hyp = beam_device_pallas(
                params, cfg, x, xl, beam_size=8, max_steps=max_steps)
            return toks, hyp.reshape(-1)

        variants["greedy_pallas_kernel"] = lambda k: chain(
            lambda x: greedy_decode_pallas(params, cfg, x, xl, max_steps), k)
        variants["beam8_pallas_kernel"] = lambda k: chain(
            beam8_pallas_single, k)
    if floor_ms is None:
        floor_ms = 0.5 if max_steps >= 100 else 0.0
    out, suspects = {}, []
    base = int(time.time_ns() % (2**31))

    def run_variant_at(mk, k, key, iters):
        run = mk(k)
        t0 = time.perf_counter()
        jax.block_until_ready(run(key))  # compile
        _COMPILE_EVENTS.append(time.perf_counter() - t0)
        log(f"    compiled ({_COMPILE_EVENTS[-1]:.1f}s)")  # heartbeat
        lat = []
        for i in range(iters):
            kk = jax.random.fold_in(key, i)
            t0 = time.perf_counter()
            jax.block_until_ready(run(kk))
            lat.append(time.perf_counter() - t0)
        lat.sort()
        return lat[len(lat) // 2]

    for name, mk in variants.items():
        log(f"decode[{name}]: compiling ...")
        p50 = None
        for attempt in range(3):
            key = jax.random.key(base + 1000 * attempt)
            t_lo = run_variant_at(mk, k_lo, key, iters)
            t_hi = run_variant_at(mk, k_hi, jax.random.fold_in(key, 7), iters)
            p50 = (t_hi - t_lo) / (k_hi - k_lo) * 1e3
            if p50 >= floor_ms:
                break
            log(f"WARNING: decode[{name}] marginal {p50:.2f} ms below the "
                f"physical floor — replay suspected, retrying ({attempt + 1}/3)")
        out[name] = p50
        if p50 < floor_ms:
            suspects.append(name)
        log(f"  marginal {out[name]:.2f} ms/utterance "
            f"(K={k_lo} vs {k_hi} differenced, {iters} reps)")
    return out, suspects


def bench_decode_throughput(B_list=(32, 64), T: int = 512,
                            max_steps: int = 60, K: int = 4, iters: int = 3):
    """Batched decode THROUGHPUT (utt/s at a saturating batch), differenced.

    Round-3 VERDICT weak #3: BENCH_DETAILS carried only per-utterance decode
    marginals, so the decode-side chip ceiling was unquantified and the
    fused-LM kernel had no recorded A/B against the XLA early-exit path it
    should replace as the serving default. Variants per batch size:

      greedy_early_exit[_lm]  — the XLA while_loop path (current default),
                                with/without char-LM shallow fusion
      greedy_pallas[_lm]      — the fused whole-loop kernels
                                (ops/pallas/decode.py), TPU only
      beam8                   — the beam scan at batch
      signal_fused_greedy     — waveform -> in-program frontend -> fused
                                greedy (api._fused_signal_greedy's shape)

    max_steps=60 matches a realistic transcript length at the serving
    operating point (the latency bench's 200 measures the no-EOS worst
    case). Random weights rarely emit EOS, so all variants pay full
    max_steps — a conservative, internally-consistent A/B.
    Returns ({f"{variant}@B{B}": {"ms_per_batch", "utt_per_s"}}, suspects).
    """
    import jax
    import jax.numpy as jnp

    from ss_asr_tpu.decode import beam as beam_mod
    from ss_asr_tpu.decode.greedy import greedy_decode_early_exit
    from ss_asr_tpu.models import charlm as charlm_mod
    from ss_asr_tpu.models import las
    from ss_asr_tpu.ops import frontend

    cfg, params = _flagship()
    lm_cfg = charlm_mod.CharLMConfig()
    lm_params = charlm_mod.init_charlm(jax.random.key(1), lm_cfg)
    n_fft, hop = frame_params_cached()
    N = (T - 1) * hop

    eps = float((time.time_ns() % 997) * 1e-12)
    k_lo, k_hi = K, 3 * K

    def chain(decode_fn, B, k):
        xl = jnp.full((B,), T, dtype=jnp.int32)

        @_chain_jit
        def run(key):
            xs = eps + jax.random.normal(
                key, (k, B, T, cfg.feature_dim), jnp.float32)

            def body(c, x):
                toks, lens = decode_fn(x, xl)
                return c + lens.sum(), None

            s, _ = jax.lax.scan(body, jnp.int32(0), xs)
            return s

        return run

    def signal_chain(B, k, decode_fn):
        n_samples = jnp.full((B,), N, dtype=jnp.int32)

        @_chain_jit
        def run(key):
            wavs = 0.1 * jax.random.normal(key, (k, B, N), jnp.float32) + eps

            def body(c, w):
                x, x_lens = frontend.log_mel_fbank_batch(w, n_samples, SR)
                toks, lens = decode_fn(x, x_lens)
                return c + lens.sum(), None

            s, _ = jax.lax.scan(body, jnp.int32(0), wavs)
            return s

        return run

    def beam8(x, xl, with_lm=False):
        enc_h, enc_lens = las.listener_apply(params["encoder"], x, xl)
        toks, parents, scores, done, hyp_lens = beam_mod._beam_scan(
            params, cfg, enc_h, enc_lens, 8, max_steps,
            lm_params if with_lm else None, lm_cfg if with_lm else None,
            0.2 if with_lm else 0.0, early_exit=True,
        )
        return toks, hyp_lens.reshape(-1)

    variants = {
        "greedy_early_exit": lambda B, k: chain(
            lambda x, xl: greedy_decode_early_exit(
                params, cfg, x, xl, max_steps), B, k),
        "greedy_early_exit_lm": lambda B, k: chain(
            lambda x, xl: greedy_decode_early_exit(
                params, cfg, x, xl, max_steps, lm_params=lm_params,
                lm_cfg=lm_cfg, lm_weight=0.2), B, k),
        "beam8": lambda B, k: chain(beam8, B, k),
        "beam8_lm": lambda B, k: chain(
            lambda x, xl: beam8(x, xl, with_lm=True), B, k),
    }
    if jax.default_backend() == "tpu":
        from ss_asr_tpu.ops.pallas.beam import beam_device_pallas
        from ss_asr_tpu.ops.pallas.decode import (
            greedy_decode_lm_pallas, greedy_decode_pallas,
        )

        def beam8_pallas(x, xl, with_lm=True):
            toks, parents, scores, done, hyp = beam_device_pallas(
                params, cfg, x, xl, beam_size=8, max_steps=max_steps,
                lm_params=lm_params if with_lm else None,
                lm_cfg=lm_cfg if with_lm else None,
                lm_weight=0.2 if with_lm else 0.0)
            return toks, hyp.reshape(-1)

        variants["greedy_pallas"] = lambda B, k: chain(
            lambda x, xl: greedy_decode_pallas(
                params, cfg, x, xl, max_steps), B, k)
        variants["greedy_pallas_lm"] = lambda B, k: chain(
            lambda x, xl: greedy_decode_lm_pallas(
                params, cfg, x, xl, lm_params, 0.2, max_steps), B, k)
        variants["beam8_pallas"] = lambda B, k: chain(
            lambda x, xl: beam8_pallas(x, xl, with_lm=False), B, k)
        variants["beam8_pallas_lm"] = lambda B, k: chain(beam8_pallas, B, k)
        variants["signal_fused_greedy"] = lambda B, k: signal_chain(
            B, k, lambda x, xl: greedy_decode_pallas(
                params, cfg, x, xl, max_steps))
    else:
        variants["signal_fused_greedy"] = lambda B, k: signal_chain(
            B, k, lambda x, xl: greedy_decode_early_exit(
                params, cfg, x, xl, max_steps))

    out, suspects = {}, []
    base = int(time.time_ns() % (2**31))

    def timed(mk, B, k, key, iters):
        run = mk(B, k)
        t0 = time.perf_counter()
        jax.block_until_ready(run(key))
        _COMPILE_EVENTS.append(time.perf_counter() - t0)
        log(f"    compiled ({_COMPILE_EVENTS[-1]:.1f}s)")
        lat = []
        for i in range(iters):
            kk = jax.random.fold_in(key, i)
            t0 = time.perf_counter()
            jax.block_until_ready(run(kk))
            lat.append(time.perf_counter() - t0)
        lat.sort()
        return lat[len(lat) // 2]

    for B in B_list:
        # physical floor: B utterances of max_steps serialized decode steps
        # cannot beat ~2 us/step of pure MXU issue even fused
        floor_ms = 0.5 if max_steps >= 50 else 0.0
        for name, mk in variants.items():
            tag = f"{name}@B{B}"
            log(f"decode_tp[{tag}]: compiling ...")
            ms = None
            try:
                for attempt in range(3):
                    key = jax.random.key(base + 1000 * attempt + B)
                    t_lo = timed(mk, B, k_lo, key, iters)
                    t_hi = timed(mk, B, k_hi, jax.random.fold_in(key, 7),
                                 iters)
                    ms = (t_hi - t_lo) / (k_hi - k_lo) * 1e3
                    if ms >= floor_ms:
                        break
                    log(f"WARNING: decode_tp[{tag}] {ms:.2f} ms/batch below "
                        f"floor — replay suspected, retrying "
                        f"({attempt + 1}/3)")
            except Exception as e:  # noqa: BLE001 — one variant failing
                # (e.g. a kernel's first on-chip compile tripping a VMEM
                # ceiling) must not take down the whole table
                out[tag] = {"error": f"{type(e).__name__}: {e}"[:300]}
                log(f"  FAILED: {out[tag]['error']}")
                continue
            out[tag] = {"ms_per_batch": round(ms, 3),
                        "utt_per_s": round(B / ms * 1e3, 1)}
            if ms < floor_ms:
                suspects.append(tag)
            log(f"  {out[tag]['ms_per_batch']} ms/batch -> "
                f"{out[tag]['utt_per_s']} utt/s")
    return out, suspects


def frame_params_cached():
    from ss_asr_tpu.ops import frontend

    return frontend.frame_params(SR)


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


_FELL_BACK_ENV = "_SS_ASR_BENCH_PLATFORM_FALLBACK"
_CHILD_ENV = "_SS_ASR_BENCH_CHILD"


def _supervise() -> int:
    """Run the real bench in a child process; on hang, re-run it on CPU.

    The axon sitecustomize registers an external TPU platform whose PJRT
    bring-up — or any later compile/dispatch — blocks indefinitely when the
    relay tunnel drops, and the hung RPC does NOT release the GIL: no
    in-process watchdog thread can ever fire, so the hung process is
    unrecoverable from inside. Hence this supervisor: the parent never
    touches jax; it spawns the actual benchmark as a child (same argv,
    ``_SS_ASR_BENCH_CHILD=1``), forwards its stderr live, and treats
    "no stderr output for SS_ASR_BENCH_STALL_S seconds" (default 900;
    every compile and every timing rep logs a line, so healthy gaps are
    bounded by one compile — but remote compile latency through the relay
    is erratic, 15 s to ~17 min observed for same-size programs, so the
    window must be generous) as a relay hang: the child's process group
    is killed and the bench retries ONCE more on the relay (a transient
    tunnel drop or a one-off slow compile usually clears), then falls
    back to JAX_PLATFORMS=cpu, whose JSON carries
    ``platform_fallback: "cpu"`` so a CPU number can never masquerade as
    a TPU record. An explicit JAX_PLATFORMS env var is the caller's
    decision — supervision is skipped entirely then.
    """
    import selectors
    import signal
    import subprocess

    stall_s = float(os.environ.get("SS_ASR_BENCH_STALL_S", 900))
    poll_s = min(10.0, max(0.25, stall_s / 4))

    for attempt, platform in enumerate((None, None, "cpu")):
        env = dict(os.environ)
        env[_CHILD_ENV] = "1"
        argv = list(sys.argv[1:])
        if platform:
            env["JAX_PLATFORMS"] = platform
            env[_FELL_BACK_ENV] = "1"
            # the axon sitecustomize dials the relay at INTERPRETER startup
            # when this is set — the fallback child must never touch it
            env.pop("PALLAS_AXON_POOL_IPS", None)
            # full shapes take ~45 min on this host's CPU (measured: 158 s
            # compile + 50-106 s per K=6 rep); the fallback artifact is
            # already marked incomparable via platform_fallback, so run
            # the quick shapes and say so rather than burn the round
            if "--quick" not in argv:
                argv.append("--quick")
            log(f"supervisor: re-running bench on {platform} "
                f"(quick shapes)")
        elif attempt:
            log("supervisor: retrying once on the relay before any "
                "CPU fallback")
        proc = subprocess.Popen(
            [sys.executable, "-u", sys.argv[0], *argv],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            start_new_session=True,  # killpg must not reach the supervisor
        )
        sel = selectors.DefaultSelector()
        sel.register(proc.stderr, selectors.EVENT_READ)
        last = time.time()
        stalled = False
        while True:
            if sel.select(timeout=poll_s):
                data = os.read(proc.stderr.fileno(), 65536)
                if data:
                    sys.stderr.buffer.write(data)
                    sys.stderr.flush()
                    last = time.time()
                elif proc.poll() is not None:
                    break  # EOF + exited
            if proc.poll() is not None and sel.select(timeout=0) == []:
                break
            if platform is None and time.time() - last > stall_s:
                # CPU runs are local compute: slow is possible, hung is not
                stalled = True
                log(f"supervisor: no output from the bench child for "
                    f">{stall_s:.0f}s (TPU relay hung?); killing it")
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass
                break
        sel.close()
        try:
            rc = proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            rc = -9
        out = proc.stdout.read() or b""
        if rc == 0 and out.strip():
            sys.stdout.buffer.write(out)
            sys.stdout.flush()
            return 0
        if not stalled:
            log(f"supervisor: bench child exited rc={rc} with"
                f"{'out' if not out.strip() else ''} output")
        if platform == "cpu":
            # last resort: an explicit error artifact beats silence
            print(json.dumps({
                "metric": "e2e_fbank_train_step_throughput",
                "value": 0.0,
                "unit": "utt/s/chip",
                "vs_baseline": 0.0,
                "error": f"bench failed on relay and on cpu (rc={rc})",
            }))
            return 1
    return 1  # pragma: no cover


def _run_id() -> str:
    """Per-invocation provenance stamp for BENCH_DETAILS metric groups —
    a mixed artifact must say per group which run produced it (round-3
    VERDICT weak #5: one stale-but-flagged boolean is how the next replay
    incident hides)."""
    return time.strftime("%Y%m%dT%H%M%S") + f"-pid{os.getpid()}"


def _mark_fallback(out: dict, fallback: str, quick: bool) -> dict:
    """Annotate a CPU-fallback artifact so it can never read as a TPU
    record: the platform, the shapes it actually ran, and the last
    recorded on-chip headline for reference."""
    out["platform_fallback"] = fallback
    out["fallback_shapes"] = "quick" if quick else "full"
    try:
        with open(DETAILS_PATH) as f:
            out["last_recorded_tpu_e2e_utt_s"] = json.load(f)[
                "e2e_fbank_train_utt_per_s"]
    except Exception:
        pass
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small shapes (CI/CPU)")
    ap.add_argument("--no-baseline", action="store_true", help="skip torch measurement")
    ap.add_argument("--full", action="store_true",
                    help="also re-measure train-only + decode latency "
                         "(several extra remote compiles)")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument(
        "--metric",
        choices=["e2e", "train_throughput", "decode_latency",
                 "decode_throughput"],
        default="e2e",
    )
    args = ap.parse_args()

    # Supervise unless the caller explicitly forced a non-relay backend
    # (the driver env pre-sets JAX_PLATFORMS=axon — that still needs the
    # supervisor; an explicit =cpu means a local run that cannot hang).
    if (not os.environ.get(_CHILD_ENV)
            and os.environ.get("JAX_PLATFORMS", "axon") in ("", "axon")):
        sys.exit(_supervise())
    fallback = "cpu" if os.environ.get(_FELL_BACK_ENV) else None
    _enable_compile_cache()

    if args.quick:
        B, T, L = 8, 64, 16
    else:
        B, T, L = 32, 512, 48

    if args.metric == "decode_latency":
        lats, suspects = bench_decode_latency(
            T=T, max_steps=200 if not args.quick else 20,
            iters=max(args.iters // 3, 2),
        )
        out = {
            "metric": "greedy_decode_latency_p50",
            "value": round(lats["greedy_early_exit"], 2),
            "unit": "ms",
            "vs_baseline": 0.0,
        }
        if "greedy_early_exit" in suspects:
            out["replay_suspect"] = True
        if fallback:
            _mark_fallback(out, fallback, args.quick)
        print(json.dumps(out))
        return

    if args.metric == "decode_throughput":
        tp, suspects = bench_decode_throughput(
            B_list=(8,) if args.quick else (32, 64),
            T=64 if args.quick else T,
            max_steps=12 if args.quick else 60,
            K=2 if args.quick else 4,
            iters=max(args.iters // 3, 2),
        )
        # headline: the best greedy utt/s at the largest batch
        big = max((8,) if args.quick else (32, 64))
        cands = [v["utt_per_s"] for k, v in tp.items()
                 if k.endswith(f"@B{big}") and k.startswith("greedy")
                 and "utt_per_s" in v]
        out = {
            "metric": "batched_greedy_decode_throughput",
            "value": max(cands),
            "unit": "utt/s/chip",
            "vs_baseline": 0.0,
            "table": tp,
        }
        cs = _compile_summary()
        if cs:
            out["compile_total_s"] = cs["total_s"]
        if suspects:
            out["replay_suspect"] = sorted(suspects)
        if fallback:
            _mark_fallback(out, fallback, args.quick)
        if not args.quick and not fallback:
            details = {}
            if os.path.exists(DETAILS_PATH):
                with open(DETAILS_PATH) as f:
                    details = json.load(f)
            details["decode_throughput"] = tp
            details.setdefault("run_ids", {})["decode_throughput"] = _run_id()
            carried = details.get("full_metrics_carried_from")
            if isinstance(carried, dict):
                carried.pop("decode_throughput", None)
                if not carried:
                    del details["full_metrics_carried_from"]
            with open(DETAILS_PATH, "w") as f:
                json.dump(details, f, indent=1)
        print(json.dumps(out))
        return

    if args.metric == "train_throughput":
        floor_ms = 2.0 if not args.quick else 0.0
        for attempt in range(3):
            value = bench_train_step(B, T, L, iters=args.iters)
            if B / value * 1e3 >= floor_ms:
                break
            log(f"WARNING: train step below the physical floor — replay "
                f"suspected, retrying ({attempt + 1}/3)")
        baseline = get_torch_baseline(B, T, L, allow_measure=not args.no_baseline)
        out = {
            "metric": "las_train_step_throughput",
            "value": round(value, 2),
            "unit": "utt/s/chip",
            "vs_baseline": round(value / baseline, 2) if baseline else 0.0,
        }
        if B / value * 1e3 < floor_ms:
            out["replay_suspect"] = True
        if fallback:
            _mark_fallback(out, fallback, args.quick)
        print(json.dumps(out))
        return

    # default: the e2e headline (one compile, driver-timeout friendly);
    # --full additionally re-measures train-only and decode latency.
    # Physical floor: the flagship step cannot run under ~2 ms on one v5e
    # (round-1/2 measurements: 7.5-9 ms; speed-of-light >= 3 ms). A faster
    # reading means the relay replayed the run — retry with fresh values.
    floor_ms = 2.0 if not args.quick else 0.0
    for attempt in range(3):
        e2e, fe_ms = bench_e2e_step(B, T, L, iters=args.iters)
        if B / e2e * 1e3 >= floor_ms:
            break
        log(f"WARNING: e2e {B / e2e * 1e3:.2f} ms/step below the physical "
            f"floor — relay replay suspected, retrying ({attempt + 1}/3)")
    e2e_suspect = B / e2e * 1e3 < floor_ms  # all retries exhausted
    baseline = get_torch_baseline(B, T, L, allow_measure=not args.no_baseline)

    details = {}
    if os.path.exists(DETAILS_PATH):
        with open(DETAILS_PATH) as f:
            details = json.load(f)
    rid = _run_id()
    details.update({
        "shapes": {"B": B, "T_frames": T, "L": L, "sr": SR},
        "e2e_fbank_train_utt_per_s": round(e2e, 2),
        "e2e_replay_suspect": bool(e2e_suspect),
        "frontend_ms_per_batch": round(fe_ms, 3),
        "torch_cpu_baseline_utt_per_s": baseline,
        "note": "vs_baseline divides e2e (which includes fbank) by the torch "
                "train-only number — conservative. All metrics use two-point "
                "chain-length differencing, which cancels this environment's "
                "~25 ms per-program dispatch overhead (bench.py docstring, "
                "docs/PROFILE_OVERHEAD.json); decode values are marginal "
                "per-utterance device times. Each metric group's producing "
                "invocation is stamped in run_ids.",
    })
    details.setdefault("run_ids", {})["e2e"] = rid

    if args.full:
        train_only = bench_train_step(B, T, L, iters=args.iters)
        if not args.quick:
            # the recorded throughput optimum is B=96 (PROFILE_OPT phase 3:
            # 6,573 utt/s vs 6,046 at B=32) — headline BOTH shapes: B=32
            # stays the comparability row (claim-audit band M2), B=96 is
            # the best-shape claim
            e2e_best, _ = bench_e2e_step(96, T, L, iters=args.iters)
            details["e2e_best_shape"] = {
                "B": 96, "utt_per_s": round(e2e_best, 2),
                "note": "recorded optimum batch (docs/PROFILE_OPT.json); "
                        "e2e_fbank_train_utt_per_s stays the B=32 "
                        "comparability row",
            }
            details["run_ids"]["e2e_best_shape"] = rid
        if args.quick:
            decode, dec_suspects = bench_decode_latency(T=64, max_steps=20, K=4, iters=2)
        else:
            decode, dec_suspects = bench_decode_latency(T=T, max_steps=200, K=8, iters=3)
        # self-validation: a train step cannot be faster than the e2e step
        # minus the standalone frontend (it is a strict subset of the e2e
        # work). If it is, the relay served a replay — flag it.
        t_e2e_ms = B / e2e * 1e3
        t_train_ms = B / train_only * 1e3
        train_suspect = t_train_ms < 0.8 * (t_e2e_ms - fe_ms)
        if train_suspect:
            log(f"WARNING: train_only {t_train_ms:.2f} ms is implausible vs "
                f"e2e {t_e2e_ms:.2f} - frontend {fe_ms:.2f}; flagged as replayed")
        if args.quick:
            tp, tp_suspects = bench_decode_throughput(
                B_list=(8,), T=64, max_steps=12, K=2, iters=2)
        else:
            tp, tp_suspects = bench_decode_throughput(
                B_list=(32, 64), T=T, max_steps=60, K=4, iters=3)
        details.update({
            "train_only_utt_per_s": round(train_only, 2),
            "train_only_replay_suspect": bool(train_suspect),
            "decode_latency_p50_ms": {k: round(v, 3) for k, v in decode.items()},
            "decode_replay_suspect": sorted(dec_suspects),
            "decode_throughput": tp,
            "decode_throughput_replay_suspect": sorted(tp_suspects),
        })
        details["run_ids"].update({
            "train_only": rid, "decode_latency": rid,
            "decode_throughput": rid,
        })
        details.pop("full_metrics_from_previous_run", None)
        details.pop("full_metrics_carried_from", None)
    else:
        # default runs refresh only the e2e keys and MERGE into the existing
        # record; the carried groups are named explicitly with the run_id
        # each was produced by, and only when actually present (round-4
        # VERDICT weak #2: one stale boolean over a partial record read as
        # "all full metrics carried" when decode_throughput never existed)
        run_ids = details.get("run_ids", {})
        carried = {
            group: run_ids.get(group, "unstamped")
            for group, key in (
                ("train_only", "train_only_utt_per_s"),
                ("decode_latency", "decode_latency_p50_ms"),
                ("decode_throughput", "decode_throughput"),
            )
            if key in details
        }
        details.pop("full_metrics_from_previous_run", None)  # legacy flag
        if carried:
            details["full_metrics_carried_from"] = carried
        else:
            details.pop("full_metrics_carried_from", None)

    cs = _compile_summary()
    if cs:
        # proof-of-cache record: a warm invocation's totals collapse to the
        # pure first-run device time (compare across run_ids / rounds)
        details["first_invocation_s"] = cs
        details.setdefault("run_ids", {})["first_invocation_s"] = rid

    if not args.quick and not fallback:  # quick (CI) shapes / a CPU-fallback
        # run must not clobber the TPU record
        os.makedirs(os.path.dirname(DETAILS_PATH), exist_ok=True)
        with open(DETAILS_PATH, "w") as f:
            json.dump(details, f, indent=1)
        log(f"details written to {DETAILS_PATH}")

    headline = {
        "metric": "e2e_fbank_train_throughput",
        "value": round(e2e, 2),
        "unit": "utt/s/chip",
        "vs_baseline": round(e2e / baseline, 2) if baseline else 0.0,
    }
    if cs:
        headline["compile_total_s"] = cs["total_s"]
    if e2e_suspect:
        headline["replay_suspect"] = True
    if fallback:
        _mark_fallback(headline, fallback, args.quick)
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
