"""Recurrent cores as ``lax.scan`` programs with packed-sequence semantics.

XLA has no analogue of cuDNN packed sequences (reference: src/asr.py:410-418),
so variable length is handled with static shapes + masks:

* Forward scans freeze the carry and zero the outputs once ``t >= length``.
* Backward (reverse) scans: the lax.scan path gather-reverses each sample by
  its own length, runs a forward scan, and reverses back — bit-equivalent to
  packing; the Pallas kernel path instead streams time newest-first inside
  the kernel (``reverse=True``), which needs NO gathers (ops/pallas/lstm.py).

TPU-first performance notes:

* The input projection ``x @ W_ih`` for the *whole* sequence is hoisted out of
  the scan into one large MXU matmul; the scan body only does the small
  recurrent ``h @ W_hh`` matmul plus fused elementwise gate math.
* Scans are time-major; batch and feature dims stay contiguous for the VPU.

Gate order follows the torch convention (LSTM: i, f, g, o — GRU: r, z, n) so
the architecture constants in SURVEY.md §2.2 carry over unchanged.

``SCAN_REMAT`` (default on) wraps every scan body in ``jax.checkpoint``: the
backward pass recomputes the cheap gate math from the carries instead of
streaming per-step residuals through HBM — measured ~an-order-of-magnitude
faster LSTM backward on TPU v5e.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]

#: Rematerialize scan bodies in the backward pass (see module docstring).
SCAN_REMAT = True

#: LSTM sequence implementation: "auto" uses the fused Pallas kernels
#: (ops/pallas/lstm.py — measured ~2x faster fwd+bwd than lax.scan on v5e)
#: whenever the backend is TPU *and* GSPMD would not need to partition the
#: kernel (see ``_use_pallas_lstm``), and lax.scan elsewhere. Set to "scan"
#: to force the XLA path or "pallas" to force the kernel.
LSTM_IMPL = "auto"

#: Run the Pallas kernels in interpreter mode (CPU tests / dryruns). Threaded
#: into every kernel call site so multi-chip shard_map tests can exercise the
#: kernel path without TPU hardware.
PALLAS_INTERPRET = False

#: Fuse both BiLSTM directions into ONE Pallas kernel (ops/pallas/bilstm.py):
#: both recurrences advance per grid step, overlapping one direction's MXU
#: matmul with the other's VPU gate math. Grad-exact vs two scans
#: (tests/test_pallas_bilstm.py).
BILSTM_FUSED = False


def _gspmd_axes_live() -> bool:
    """True when tracing under a >1-device mesh whose axes GSPMD partitions.

    Inside ``shard_map`` all mesh axes are Manual — the kernel sees plain
    per-device arrays, so fused Pallas kernels compose fine.  Under
    ``jax.set_mesh`` + jit (GSPMD auto-sharding), Auto/Explicit axes would
    require a partitioning rule the kernels don't have; fall back to scan.
    """
    try:
        am = jax.sharding.get_abstract_mesh()
    except Exception:
        return False
    if am is None or am.empty:
        return False
    n = 1
    for size, kind in zip(am.shape.values(), am.axis_types):
        if "manual" not in str(kind).lower():
            n *= size
    return n > 1


#: Allow the fused kernels under jit+GSPMD auto sharding: both the LSTM and
#: the attend-and-spell kernels carry batch-parallel custom_partitioning
#: rules (ops/pallas/lstm.py, ops/pallas/spell.py), so sharded jit keeps
#: them fused. Set False to force the lax.scan fallback under live GSPMD
#: axes instead.
GSPMD_PARTITION = True

#: Attend-and-spell implementation, mirroring LSTM_IMPL: "auto" follows the
#: LSTM gate, "scan"/"pallas" force one path. Known limit (v5e, round 3):
#: at decoder widths H >= 512 a program containing BOTH the spell backward
#: kernel and any recurrent listener backward (kernel or lax.scan) crashes
#: the TPU compiler (isolated spell grad — incl. enc-h cotangents — and
#: listener grads each compile fine; a non-recurrent traced producer also
#: composes fine; docs/PROFILE_WIDTH.json). Wide-decoder training should
#: set SPELL_IMPL = "scan".
SPELL_IMPL = "auto"


#: Widest hidden size the fused LSTM kernels auto-dispatch at.  The round-3
#: ceiling was H=512: the [H, 4H] f32 W_hh block resident in VMEM is 9.4 MB
#: at H=768 and blew the 16 MB scoped-VMEM budget with the streams.  Fixed
#: by holding W_hh in bf16 past ``pallas.lstm.WEIGHT_BF16_MIN_H`` (matches
#: XLA's default bf16-input matmul precision — not a numerics downgrade)
#: plus H-aware DMA chunk shrink (``_chunk_for``): H=768 and H=1024 ship
#: at C=2 (probe-verified on v5e at the STOCK 16 MB scoped limit — compile,
#: run, and match scan grads to cosine 1-1e-7 / rel-L2 ~3e-4; C=4 at H=768
#: was verified only under the raised limit and A/B'd noise-level, so C=2
#: is the shipped rule, see ``_chunk_for``).  "auto" falls back to scan
#: above this; "pallas" still forces.
LSTM_KERNEL_MAX_H = 1024

#: Widest decoder the spell kernels auto-dispatch at.  The round-3 early
#: boundary was 256: past it, a program with BOTH the spell backward kernel
#: and any recurrent listener backward "crashed the TPU compiler" — later
#: diagnosed as scoped-VMEM exhaustion (17.88 MB vs the 16 MB default at
#: D=512), the same failure class as the LSTM wide-H ceiling.  With the
#: raised limit from ``wide_h_compiler_options`` (the trainers attach it
#: automatically when the spell kernels dispatch past D=256) the full
#: model compiles and trains on v5e at D=512 (16.52 ms, the best measured
#: MFU point, 36.5%) and D=768 (37.37 ms = 36.1% MFU vs 40.44 with the
#: scan decoder).  D=1024 demands 43.3 MB of scoped VMEM — past even the
#: raised limit — so "auto" falls back to scan there.
SPELL_KERNEL_MAX_H = 768


def wide_h_compiler_options(max_h: int, spell_h: int = 0):
    """XLA compiler options for programs containing wide-H fused kernels.

    The TPU compiler budgets kernel VMEM against a 16 MB *scoped* limit
    (a compiler default — v5e has 128 MB of physical VMEM).  Two cases need
    it raised, both measured on v5e:

    * LSTM kernels past H=512: at H=1024 the backward kernel's weight
      block + streams need ~20 MB; the full train step compiles and runs
      at 32 MB where the default rejects it (H=768 also compiles stock via
      a smaller DMA chunk, with bit-identical losses either way).
    * Spell kernels past D=256 co-resident with any listener backward:
      17.88 MB at D=512 (the boundary round-3 first recorded as a
      "compiler crash"); compiles and trains at the raised limit.

    Returns None when neither case applies or off-TPU; use as
    ``jax.jit(fn, compiler_options=...)``.  ``spell_h`` is the decoder
    width IF the spell kernels will dispatch for it (caller may pass it
    unconditionally; the gate is re-checked here).
    """
    if jax.default_backend() != "tpu":
        return None
    if max_h > 512 or (spell_h > 256 and _use_pallas_spell(spell_h)):
        return {"xla_tpu_scoped_vmem_limit_kib": "32768"}
    return None


def impl_salt() -> tuple:
    """Current impl-gate state, as a static jit-cache key component.

    The module-level jitted decode entry points (decode/greedy.py,
    decode/beam.py, ops/pallas/decode.py, api._fused_signal_greedy) bake
    these globals into their traces; without the salt, flipping
    ``LSTM_IMPL``/``SPELL_IMPL``/``PALLAS_INTERPRET`` after a shape has
    been traced would silently keep serving the old implementation for
    that shape. (Trainer jits are per-instance closures and don't need
    this.)"""
    return (LSTM_IMPL, SPELL_IMPL, PALLAS_INTERPRET, GSPMD_PARTITION)


def top_level_call() -> bool:
    """True when NOT under an active jax trace.

    The raised-scoped-VMEM decode executables carry ``compiler_options``
    on their ``jax.jit``; jax rejects those on a jit that gets inlined
    into an outer trace ("can only be passed to top-level jax.jit").
    Entry points that auto-route to a raised executable must therefore
    fall back to the plain jit when a caller composes them inside its own
    jitted program — the OUTER program owns the compile there, and the
    caller raises the limit on its own jit if its shapes need it (bench's
    decode chains do)."""
    try:
        from jax._src import core as _core

        return bool(_core.trace_state_clean())
    except Exception:  # pragma: no cover — private-API drift
        return True


def _use_pallas_lstm(hidden_size: Optional[int] = None) -> bool:
    if LSTM_IMPL == "pallas":
        return True
    if LSTM_IMPL == "scan":
        return False
    if jax.default_backend() != "tpu":
        return False
    if hidden_size is not None and hidden_size > LSTM_KERNEL_MAX_H:
        return False
    return GSPMD_PARTITION or not _gspmd_axes_live()


def _use_pallas_spell(hidden_size: Optional[int] = None) -> bool:
    """Gate for the fused attend-and-spell kernels — same dispatch rule as
    the LSTM kernels (both families carry GSPMD partition rules).  The old
    per-device batch cap (SPELL_MAX_BATCH=48, routing large batches to the
    XLA scan) is gone: the kernels now run a 2-D (batch-block, L-chunk)
    grid past ``spell.BATCH_BLOCK_MAX`` rows, so any batch keeps the proven
    VMEM footprint (docs/PROFILE_OPT.json phase 3)."""
    if SPELL_IMPL == "pallas":
        return True
    if SPELL_IMPL == "scan":
        return False
    if hidden_size is not None and hidden_size > SPELL_KERNEL_MAX_H:
        return False
    return _use_pallas_lstm()


# ---------------------------------------------------------------------------
# Initializers (reference: src/asr.py:175-212)
# ---------------------------------------------------------------------------

def lecun_normal(key: jax.Array, shape: Tuple[int, ...], fan_in: int | None = None) -> jax.Array:
    """N(0, 1/sqrt(fan_in)) — the reference's init for every >=2D tensor."""
    if fan_in is None:
        fan_in = shape[0]
    return (1.0 / jnp.sqrt(fan_in)) * jax.random.normal(key, shape, dtype=jnp.float32)


def init_linear(key: jax.Array, in_dim: int, out_dim: int, bias: bool = True) -> Params:
    p: Params = {"w": lecun_normal(key, (in_dim, out_dim), in_dim)}
    if bias:
        p["b"] = jnp.zeros((out_dim,), dtype=jnp.float32)
    return p


def linear(p: Params, x: jax.Array) -> jax.Array:
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def init_embedding(key: jax.Array, num: int, dim: int, std: float = 1.0) -> Params:
    """Embedding table N(0, std) — reference uses N(0,1) (src/asr.py:210)."""
    return {"table": std * jax.random.normal(key, (num, dim), dtype=jnp.float32)}


def embed(p: Params, ids: jax.Array) -> jax.Array:
    return jnp.take(p["table"], ids, axis=0)


def init_lstm(
    key: jax.Array, in_dim: int, hidden: int, forget_bias: float = 0.0
) -> Params:
    """LSTM cell params. ``b`` merges torch's two bias vectors.

    ``forget_bias=1.0`` reproduces the reference's speller forget-gate-bias=1
    (src/asr.py:204-212); encoder LSTMs use 0 (plain zero biases).
    """
    k1, k2 = jax.random.split(key)
    b = jnp.zeros((4 * hidden,), dtype=jnp.float32)
    if forget_bias:
        b = b.at[hidden : 2 * hidden].set(forget_bias)
    return {
        "w_ih": lecun_normal(k1, (in_dim, 4 * hidden), in_dim),
        "w_hh": lecun_normal(k2, (hidden, 4 * hidden), hidden),
        "b": b,
    }


def init_gru(key: jax.Array, in_dim: int, hidden: int) -> Params:
    """GRU cell params (torch GRUCell layout; separate biases for the n gate)."""
    k1, k2 = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(hidden)
    k3, k4 = jax.random.split(k1)
    return {
        "w_ih": jax.random.uniform(k3, (in_dim, 3 * hidden), jnp.float32, -bound, bound),
        "w_hh": jax.random.uniform(k4, (hidden, 3 * hidden), jnp.float32, -bound, bound),
        "b_ih": jax.random.uniform(k2, (3 * hidden,), jnp.float32, -bound, bound),
        "b_hh": jax.random.uniform(
            jax.random.fold_in(k2, 1), (3 * hidden,), jnp.float32, -bound, bound
        ),
    }


# ---------------------------------------------------------------------------
# Cells
# ---------------------------------------------------------------------------

def lstm_step(
    p: Params, x: jax.Array, state: Tuple[jax.Array, jax.Array]
) -> Tuple[jax.Array, jax.Array]:
    """One LSTM step: x [B, in], state ([B,H],[B,H]) -> new state."""
    h, c = state
    gates = x @ p["w_ih"] + h @ p["w_hh"] + p["b"]
    return _lstm_gates(gates, c)


def _lstm_gates(gates: jax.Array, c: jax.Array) -> Tuple[jax.Array, jax.Array]:
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def gru_step(p: Params, x: jax.Array, h: jax.Array) -> jax.Array:
    """One GRU step (torch GRUCell semantics): x [B,in], h [B,H] -> h'."""
    gi = x @ p["w_ih"] + p["b_ih"]
    gh = h @ p["w_hh"] + p["b_hh"]
    H = h.shape[-1]
    r = jax.nn.sigmoid(gi[..., :H] + gh[..., :H])
    z = jax.nn.sigmoid(gi[..., H : 2 * H] + gh[..., H : 2 * H])
    n = jnp.tanh(gi[..., 2 * H :] + r * gh[..., 2 * H :])
    return (1.0 - z) * n + z * h


# ---------------------------------------------------------------------------
# Sequence utilities
# ---------------------------------------------------------------------------

@jax.custom_vjp
def reverse_sequence(xs: jax.Array, lengths: jax.Array) -> jax.Array:
    """Reverse each row's first ``lengths[b]`` steps, keeping padding in place.

    xs: [B, T, ...]; lengths: [B] int. Equivalent to packing + reverse.

    The permutation is an involution, so the VJP is the same gather — the
    custom rule prevents XLA from emitting its default (slow on TPU)
    scatter for the transpose of take_along_axis.
    """
    B, T = xs.shape[0], xs.shape[1]
    t = jnp.arange(T)[None, :]
    lens = lengths[:, None]
    idx = jnp.where(t < lens, lens - 1 - t, t)  # [B, T]
    return jnp.take_along_axis(xs, idx.reshape(B, T, *([1] * (xs.ndim - 2))), axis=1)


def _reverse_sequence_fwd(xs, lengths):
    return reverse_sequence(xs, lengths), lengths


def _reverse_sequence_bwd(lengths, g):
    return reverse_sequence(g, lengths), None


reverse_sequence.defvjp(_reverse_sequence_fwd, _reverse_sequence_bwd)


# ---------------------------------------------------------------------------
# Scans
# ---------------------------------------------------------------------------

def lstm_scan(
    p: Params,
    xs: jax.Array,
    lengths: Optional[jax.Array] = None,
    reverse: bool = False,
    state: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Unidirectional LSTM over [B, T, in] -> ([B, T, H], final (h, c)).

    With ``lengths``: packed semantics — outputs at t >= len are zero, the
    carry freezes at each sample's last valid step.  ``reverse=True`` runs the
    backward direction (per-sample reversal, not naive flip).
    """
    B, T, _ = xs.shape
    H = p["w_hh"].shape[0]
    if state is None:
        state = (
            jnp.zeros((B, H), dtype=xs.dtype),
            jnp.zeros((B, H), dtype=xs.dtype),
        )
    if reverse:
        if lengths is None:
            xs = xs[:, ::-1]
        else:
            xs = reverse_sequence(xs, lengths)

    # Hoist the input projection: one big MXU matmul for the whole sequence.
    gates_x = xs @ p["w_ih"] + p["b"]  # [B, T, 4H]
    gates_x = jnp.swapaxes(gates_x, 0, 1)  # time-major [T, B, 4H]

    if lengths is None:
        def body(carry, gx):
            h, c = carry
            h2, c2 = _lstm_gates(gx + h @ p["w_hh"], c)
            return (h2, c2), h2

        if SCAN_REMAT:
            body = jax.checkpoint(body)
        (h, c), ys = jax.lax.scan(body, state, gates_x)
    else:
        tsteps = jnp.arange(T)

        def body(carry, inp):
            gx, t = inp
            h, c = carry
            h2, c2 = _lstm_gates(gx + h @ p["w_hh"], c)
            valid = (t < lengths)[:, None]
            h2 = jnp.where(valid, h2, h)
            c2 = jnp.where(valid, c2, c)
            y = jnp.where(valid, h2, 0.0)
            return (h2, c2), y

        if SCAN_REMAT:
            body = jax.checkpoint(body)
        (h, c), ys = jax.lax.scan(body, state, (gates_x, tsteps))

    ys = jnp.swapaxes(ys, 0, 1)  # [B, T, H]
    if reverse:
        if lengths is None:
            ys = ys[:, ::-1]
        else:
            ys = reverse_sequence(ys, lengths)
    return ys, (h, c)


def bilstm_scan(
    p: Dict[str, Params], xs: jax.Array, lengths: Optional[jax.Array] = None
) -> jax.Array:
    """Bidirectional LSTM: params {'fwd','bwd'}; [B,T,in] -> [B,T,2H].

    The two directions are independent scans; XLA overlaps them. (A fused
    vmap-over-directions variant was measured slower on TPU v5e — batched
    [2,B,H]x[2,H,4H] matmuls serialize on the MXU anyway and the combined
    program compiles far slower.)

    On TPU the per-direction sequence runs through the fused Pallas kernels
    (see ``LSTM_IMPL``).
    """
    if _use_pallas_lstm(int(p["fwd"]["w_hh"].shape[0])):
        itp = PALLAS_INTERPRET
        # the fused dual-direction kernel has NO GSPMD partition rule, so it
        # must not be dispatched under live GSPMD axes
        if BILSTM_FUSED and not _gspmd_axes_live():
            from ss_asr_tpu.ops.pallas.bilstm import bilstm_pallas_trainable

            return bilstm_pallas_trainable(p, xs, lengths, interpret=itp)
        from ss_asr_tpu.ops.pallas.lstm import lstm_scan_pallas_trainable as plstm

        fwd = plstm(p["fwd"], xs, lengths, interpret=itp)
        # native reversed-direction kernel: time is streamed newest-first by
        # the grid index_map, so there are NO reverse_sequence gathers (the
        # old path paid four [B, T, F] take_along_axis HBM round trips per
        # direction-layer: xs in, y out, and their custom-VJP twins)
        bwd = plstm(p["bwd"], xs, lengths, interpret=itp, reverse=True)
        return jnp.concatenate([fwd, bwd], axis=-1)
    fwd, _ = lstm_scan(p["fwd"], xs, lengths, reverse=False)
    bwd, _ = lstm_scan(p["bwd"], xs, lengths, reverse=True)
    return jnp.concatenate([fwd, bwd], axis=-1)


def init_bilstm(key: jax.Array, in_dim: int, hidden: int) -> Dict[str, Params]:
    k1, k2 = jax.random.split(key)
    return {"fwd": init_lstm(k1, in_dim, hidden), "bwd": init_lstm(k2, in_dim, hidden)}


def gru_scan(
    p: Params,
    xs: jax.Array,
    lengths: Optional[jax.Array] = None,
    h0: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Unidirectional GRU over [B, T, in] -> ([B, T, H], final h)."""
    B, T, _ = xs.shape
    H = p["w_hh"].shape[0]
    h = h0 if h0 is not None else jnp.zeros((B, H), dtype=xs.dtype)
    gi = xs @ p["w_ih"] + p["b_ih"]  # hoisted input projection
    gi = jnp.swapaxes(gi, 0, 1)
    tsteps = jnp.arange(T)

    def body(h, inp):
        g, t = inp
        gh = h @ p["w_hh"] + p["b_hh"]
        r = jax.nn.sigmoid(g[..., :H] + gh[..., :H])
        z = jax.nn.sigmoid(g[..., H : 2 * H] + gh[..., H : 2 * H])
        n = jnp.tanh(g[..., 2 * H :] + r * gh[..., 2 * H :])
        h2 = (1.0 - z) * n + z * h
        if lengths is not None:
            valid = (t < lengths)[:, None]
            # packed-sequence contract (module docstring): carry freezes AND
            # the emitted output is zero past each sample's length
            return jnp.where(valid, h2, h), jnp.where(valid, h2, 0.0)
        return h2, h2

    if SCAN_REMAT:
        body = jax.checkpoint(body)
    h, ys = jax.lax.scan(body, h, (gi, tsteps))
    return jnp.swapaxes(ys, 0, 1), h


def downsample_time(xs: jax.Array, lengths: Optional[jax.Array] = None):
    """Pyramidal 2x time reduction: concat consecutive frame pairs.

    [B, T, F] -> [B, T//2, 2F]; odd trailing frame dropped; lengths halve by
    integer division — exactly the reference's pBLSTM downsample
    (src/asr.py:429-450, :423-425).
    """
    B, T, F = xs.shape
    T2 = (T // 2) * 2
    xs = xs[:, :T2, :].reshape(B, T2 // 2, 2 * F)
    if lengths is None:
        return xs
    return xs, lengths // 2
