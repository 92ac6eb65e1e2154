"""Pallas TPU kernel: fused LSTM time loop.

The recurrence is the latency-bound core of this framework (pyramidal
listener = ~1000 sequential cell steps per utterance batch).  XLA's
``lax.scan`` emits one fused loop, but every step still round-trips the
[B, 4H] gate block through the generic fusion path.  This kernel keeps the
recurrent weights ``W_hh`` and the (h, c) carry resident in VMEM for the
whole sequence and streams the precomputed input projections
``Gx[t] = x_t @ W_ih + b`` through the grid pipeline (auto double-buffered
HBM->VMEM), so each step is exactly one MXU matmul plus VPU gate math.

Semantics match ``ops.rnn.lstm_scan``: packed-sequence masking (carry
freezes, outputs zero past each sample's length).  Forward-only — training
uses the differentiable scan; decode/eval paths can use this kernel.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lstm_kernel(len_ref, gx_ref, whh_ref, y_ref, h_ref, c_ref):
    """One grid step == one time step.  Carries (h, c) live in VMEM scratch."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    h = h_ref[:]
    c = c_ref[:]
    gates = gx_ref[0] + jnp.dot(h, whh_ref[:], preferred_element_type=jnp.float32)
    H = h.shape[-1]
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    c2 = f * c + i * g
    h2 = o * jnp.tanh(c2)

    valid = (t < len_ref[:, 0])[:, None]  # [B, 1]
    h_ref[:] = jnp.where(valid, h2, h)
    c_ref[:] = jnp.where(valid, c2, c)
    y_ref[0] = jnp.where(valid, h2, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def lstm_seq_pallas(
    gates_x: jax.Array,
    whh: jax.Array,
    lengths: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Run the fused LSTM loop.

    Args:
      gates_x: [T, B, 4H] precomputed ``x @ W_ih + b`` (time-major).
      whh: [H, 4H] recurrent weights.
      lengths: [B] int32 valid lengths.
      interpret: run in interpreter mode (for CPU tests).

    Returns y: [T, B, H] hidden states (zeros past each length).
    """
    T, B, G = gates_x.shape
    H = G // 4
    lengths2d = lengths.astype(jnp.int32).reshape(B, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(T,),
        in_specs=[
            # lengths as a [B, 1] VMEM vector (SMEM loads must be scalar)
            pl.BlockSpec((B, 1), lambda t: (0, 0)),
            pl.BlockSpec((1, B, G), lambda t: (t, 0, 0)),
            pl.BlockSpec((H, G), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, B, H), lambda t: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _lstm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        interpret=interpret,
    )(lengths2d, gates_x, whh)


#: time steps per grid block — amortizes DMA issue overhead across CHUNK
#: steps (per-step blocks spend more time launching copies than computing)
CHUNK = 8


def _lstm_fwd_kernel(len_ref, gx_ref, whh_ref, y_ref, cs_ref, h_ref, c_ref):
    """Forward over one CHUNK of time steps; streams out h and c states
    (backward residuals).

    ``gx``/``whh`` may arrive in bf16 (halved HBM/VMEM traffic, faster MXU
    pass); the recurrent matmul accumulates in f32 and the carries stay f32.
    """
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
        gates = gx_ref[i].astype(jnp.float32) + jnp.dot(
            h.astype(whh_ref.dtype), whh_ref[:], preferred_element_type=jnp.float32
        )
        H = h.shape[-1]
        ii = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H :])
        c2 = f * c + ii * g
        h2 = o * jnp.tanh(c2)
        valid = (t < len_ref[:, 0])[:, None]
        h_new = jnp.where(valid, h2, h)
        c_new = jnp.where(valid, c2, c)
        h_ref[:] = h_new
        c_ref[:] = c_new
        y_ref[i] = jnp.where(valid, h2, 0.0)
        cs_ref[i] = c_new
        return 0

    jax.lax.fori_loop(0, C, step, 0)


def _lstm_bwd_kernel(len_ref, gx_ref, res_ref, whh_ref, dgx_ref, dh_ref, dc_ref):
    """Reverse-time backward over one CHUNK (grid streams chunks newest-
    first); the (dh, dc) carries live in VMEM.  Residuals arrive packed as
    ``res = [h_prev | c_prev | c_t | dy]`` [C, B, 4H] — one stream instead of
    four.  dWhh is NOT accumulated here: the streamed dgates make it one big
    batched matmul outside (sum_t h_{t-1}^T dgates_t)."""
    k = pl.program_id(0)
    Tc = pl.num_programs(0)
    C = gx_ref.shape[0]

    @pl.when(k == 0)
    def _():
        dh_ref[:] = jnp.zeros_like(dh_ref)
        dc_ref[:] = jnp.zeros_like(dc_ref)

    def step(j, _):
        i = C - 1 - j  # walk the chunk backwards
        t = (Tc - 1 - k) * C + i
        res = res_ref[i]
        H = dh_ref.shape[-1]
        h_prev = res[:, :H]
        c_prev = res[:, H : 2 * H]
        c_t = res[:, 2 * H : 3 * H]
        dy = res[:, 3 * H :]
        # recompute the forward gates from streamed residuals
        gates = gx_ref[i].astype(jnp.float32) + jnp.dot(
            h_prev.astype(whh_ref.dtype), whh_ref[:],
            preferred_element_type=jnp.float32,
        )
        ii = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H :])
        tanh_c = jnp.tanh(c_t)

        dh_in = dh_ref[:]
        dh = dh_in + dy  # dy only contributes where the step was valid
        dc = dc_ref[:]
        do = dh * tanh_c
        dct = dh * o * (1.0 - tanh_c * tanh_c) + dc
        di = dct * g
        dg = dct * ii
        df = dct * c_prev
        dc_prev = dct * f
        dgates = jnp.concatenate(
            [
                di * ii * (1.0 - ii),
                df * f * (1.0 - f),
                dg * (1.0 - g * g),
                do * o * (1.0 - o),
            ],
            axis=-1,
        )  # [B, 4H]
        valid = (t < len_ref[:, 0])[:, None]
        dgates = jnp.where(valid, dgates, 0.0)
        # dh_{t-1} = dgates @ Whh^T  (contract the 4H axis)
        dh_prev = jax.lax.dot_general(
            dgates.astype(whh_ref.dtype), whh_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dh_ref[:] = jnp.where(valid, dh_prev, dh_in)
        dc_ref[:] = jnp.where(valid, dc_prev, dc)
        dgx_ref[i] = dgates
        return 0

    jax.lax.fori_loop(0, C, step, 0)


#: MXU input dtype for the kernels: "float32" (default) or "bfloat16"
#: (halved stream bytes + faster MXU pass; accumulation stays f32).
KERNEL_DTYPE = "float32"


def _kdt():
    import jax.numpy as _jnp

    return _jnp.bfloat16 if KERNEL_DTYPE == "bfloat16" else _jnp.float32


def _pad_time(a, Tp):
    T = a.shape[0]
    if T == Tp:
        return a
    return jnp.concatenate(
        [a, jnp.zeros((Tp - T,) + a.shape[1:], a.dtype)], axis=0
    )


# ---------------------------------------------------------------------------
# GSPMD partitioning: under jit + auto sharding (jax.set_mesh) the kernels
# declare themselves batch-parallel via custom_partitioning, so multi-chip
# data-parallel jit keeps the fused kernels instead of falling back to scan.
# The time axis stays unsharded (the recurrence is sequential); weights are
# replicated. shard_map paths never reach this (mesh axes are Manual there).
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=4)
def _cp_fwd(interpret: bool):
    from ss_asr_tpu.ops.pallas.partition import batch_partitioned

    return batch_partitioned(
        functools.partial(_fwd_core, interpret=interpret),
        in_batch_dims=[0, 1, None],
        out_batch_dims=[1, 1],
        rule="b u, t b g, h g -> t b h1, t b h1",
    )


@functools.lru_cache(maxsize=4)
def _cp_bwd(interpret: bool):
    from ss_asr_tpu.ops.pallas.partition import batch_partitioned

    def bwd(lengths2d, gates_x, res, whh):
        # 1-tuple: batch_partitioned infers shardings per output entry
        return (_bwd_core(lengths2d, gates_x, res, whh, interpret),)

    return batch_partitioned(
        bwd,
        in_batch_dims=[0, 1, 1, None],
        out_batch_dims=[1],
        rule="b u, t b g, t b r, h g -> t b g",
    )


def _fwd_core(lengths2d, gates_x, whh, interpret):
    """The raw forward pallas_call; shapes read from the (possibly local,
    under custom_partitioning) operands. gates_x must be CHUNK-padded."""
    Tp, B, G = gates_x.shape
    H = G // 4
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(Tp // CHUNK,),
        in_specs=[
            pl.BlockSpec((B, 1), lambda k: (0, 0)),
            pl.BlockSpec((CHUNK, B, G), lambda k: (k, 0, 0)),
            pl.BlockSpec((H, G), lambda k: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((CHUNK, B, H), lambda k: (k, 0, 0)),
            pl.BlockSpec((CHUNK, B, H), lambda k: (k, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _lstm_fwd_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Tp, B, H), jnp.float32),
            jax.ShapeDtypeStruct((Tp, B, H), jnp.float32),
        ],
        interpret=interpret,
    )(lengths2d, gates_x, whh)


def _fwd_pallas(gates_x, whh, lengths, interpret):
    gates_x = gates_x.astype(_kdt())
    whh = whh.astype(_kdt())
    T, B, G = gates_x.shape
    Tp = ((T + CHUNK - 1) // CHUNK) * CHUNK
    gates_x = _pad_time(gates_x, Tp)  # padded steps are masked by lengths
    lengths2d = lengths.astype(jnp.int32).reshape(B, 1)
    from ss_asr_tpu.ops import rnn as _rnn

    if _rnn._gspmd_axes_live():
        y, cs = _cp_fwd(interpret)(lengths2d, gates_x, whh)
    else:
        y, cs = _fwd_core(lengths2d, gates_x, whh, interpret)
    return y[:T], cs[:T]


def _bwd_core(lengths2d, gates_x, res, whh, interpret):
    """The raw backward pallas_call; gates_x/res must be CHUNK-padded."""
    Tp, B, G = gates_x.shape
    H = G // 4
    Tc = Tp // CHUNK
    rev = lambda k: (Tc - 1 - k, 0, 0)  # noqa: E731 — newest chunk first
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(Tc,),
        in_specs=[
            pl.BlockSpec((B, 1), lambda k: (0, 0)),
            pl.BlockSpec((CHUNK, B, G), rev),
            pl.BlockSpec((CHUNK, B, 4 * H), rev),
            pl.BlockSpec((H, G), lambda k: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((CHUNK, B, G), rev),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
    )
    (dgx,) = pl.pallas_call(
        _lstm_bwd_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Tp, B, G), jnp.float32),
        ],
        interpret=interpret,
    )(lengths2d, gates_x, res, whh)
    return dgx


def _bwd_pallas(gates_x, whh, lengths, y, cs, dy, interpret):
    gates_x = gates_x.astype(_kdt())
    whh = whh.astype(_kdt())
    T, B, G = gates_x.shape
    H = G // 4
    Tp = ((T + CHUNK - 1) // CHUNK) * CHUNK
    lengths2d = lengths.astype(jnp.int32).reshape(B, 1)
    # residual pack [T, B, 4H] = [h_prev | c_prev | c_t | dy]  (one stream)
    zrow = jnp.zeros((1, B, H), jnp.float32)
    res = jnp.concatenate(
        [
            jnp.concatenate([zrow, y[:-1]], axis=0),
            jnp.concatenate([zrow, cs[:-1]], axis=0),
            cs,
            dy.astype(jnp.float32),
        ],
        axis=-1,
    )
    gates_x = _pad_time(gates_x, Tp)
    res_p = _pad_time(res, Tp)
    from ss_asr_tpu.ops import rnn as _rnn

    if _rnn._gspmd_axes_live():
        (dgx,) = _cp_bwd(interpret)(lengths2d, gates_x, res_p, whh)
    else:
        dgx = _bwd_core(lengths2d, gates_x, res_p, whh, interpret)
    dgx = dgx[:T]
    # dWhh = sum_t h_{t-1}^T dgates_t as ONE batched MXU matmul (GSPMD
    # all-reduces the batch contraction when dgx is batch-sharded)
    h_prev = res[:T, :, :H]
    dwhh = jnp.einsum("tbh,tbg->hg", h_prev, dgx)
    return dgx, dwhh


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def lstm_seq_pallas_vjp(gates_x, whh, lengths, interpret=False):
    """Differentiable fused LSTM loop: both directions of the time loop run
    as Pallas kernels with VMEM-resident carries and dWhh accumulation."""
    y, _ = _fwd_pallas(gates_x, whh, lengths, interpret)
    return y


def _vjp_fwd(gates_x, whh, lengths, interpret):
    y, cs = _fwd_pallas(gates_x, whh, lengths, interpret)
    return y, (gates_x, whh, lengths, y, cs)


def _vjp_bwd(interpret, res, dy):
    gates_x, whh, lengths, y, cs = res
    dgx, dwhh = _bwd_pallas(gates_x, whh, lengths, y, cs, dy, interpret)
    return dgx, dwhh, None


lstm_seq_pallas_vjp.defvjp(_vjp_fwd, _vjp_bwd)


def lstm_scan_pallas_trainable(
    p, xs: jax.Array, lengths: Optional[jax.Array] = None, interpret: bool = False
) -> jax.Array:
    """Differentiable drop-in for ``rnn.lstm_scan(...)[0]`` with Pallas
    forward *and* backward kernels; the input/weight projections stay in XLA
    (their grads are plain matmuls)."""
    B, T, _ = xs.shape
    if lengths is None:
        lengths = jnp.full((B,), T, dtype=jnp.int32)
    gx = xs @ p["w_ih"] + p["b"]
    gx = jnp.swapaxes(gx, 0, 1)
    y = lstm_seq_pallas_vjp(gx, p["w_hh"], lengths, interpret)
    return jnp.swapaxes(y, 0, 1)


def lstm_scan_pallas(
    p,
    xs: jax.Array,
    lengths: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in (forward-only) equivalent of ``rnn.lstm_scan(...)[0]``.

    xs: [B, T, in] -> [B, T, H].  The input projection runs as one big MXU
    matmul in XLA; only the sequential part enters the kernel.
    """
    B, T, _ = xs.shape
    if lengths is None:
        lengths = jnp.full((B,), T, dtype=jnp.int32)
    gx = xs @ p["w_ih"] + p["b"]  # [B, T, 4H]
    gx = jnp.swapaxes(gx, 0, 1)  # [T, B, 4H]
    y = lstm_seq_pallas(gx, p["w_hh"], lengths, interpret=interpret)
    return jnp.swapaxes(y, 0, 1)
