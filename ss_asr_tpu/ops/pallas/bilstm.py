"""Pallas TPU kernel: BOTH BiLSTM directions fused into one time loop.

The v5e has a single TensorCore, so the two independent direction scans of a
BiLSTM serialize whether XLA overlaps them or not (docs/PERF.md round-1
ablation). Running them as two ``pallas_call``s also pays the sequential-grid
launch + DMA latency twice. This kernel advances BOTH directions inside one
grid step: direction 0 consumes forward-time gates, direction 1 consumes the
per-sample *reversed* sequence's gates (reversal happens outside, exactly as
``ops.rnn.bilstm_scan`` already does), so both recurrences walk the same
t=0..T grid. Per step the two small recurrent matmuls interleave with the
two VPU gate-math blocks, letting Mosaic overlap MXU and VPU work across
directions — measured faster than two single-direction kernels at the
listener's shapes.

Same packed-sequence semantics as ops/pallas/lstm.py (carry freezes, outputs
zero past each length); fwd + hand-written bwd, dWhh accumulated outside as
one batched matmul per direction.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ss_asr_tpu.ops.pallas.lstm import CHUNK, _kdt, _pad_time


def _bi_fwd_kernel(len_ref, gx_ref, whh_ref, y_ref, cs_ref, h_ref, c_ref):
    """Forward over one CHUNK; gx [C, 2, B, 4H], carries [2, B, H]."""
    k = pl.program_id(0)
    C = gx_ref.shape[0]

    @pl.when(k == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    def step(i, _):
        t = k * C + i
        valid = (t < len_ref[:, 0])[:, None]
        H = h_ref.shape[-1]
        # issue both recurrent matmuls first: the second dot's MXU pass
        # overlaps the first direction's VPU gate math
        h0 = h_ref[0]
        h1 = h_ref[1]
        g0 = gx_ref[i, 0].astype(jnp.float32) + jnp.dot(
            h0.astype(whh_ref.dtype), whh_ref[0], preferred_element_type=jnp.float32
        )
        g1 = gx_ref[i, 1].astype(jnp.float32) + jnp.dot(
            h1.astype(whh_ref.dtype), whh_ref[1], preferred_element_type=jnp.float32
        )
        for d, (g, h, c) in enumerate(((g0, h0, c_ref[0]), (g1, h1, c_ref[1]))):
            ii = jax.nn.sigmoid(g[:, :H])
            f = jax.nn.sigmoid(g[:, H : 2 * H])
            gg = jnp.tanh(g[:, 2 * H : 3 * H])
            o = jax.nn.sigmoid(g[:, 3 * H :])
            c2 = f * c + ii * gg
            h2 = o * jnp.tanh(c2)
            h_new = jnp.where(valid, h2, h)
            c_new = jnp.where(valid, c2, c)
            h_ref[d] = h_new
            c_ref[d] = c_new
            y_ref[i, d] = jnp.where(valid, h2, 0.0)
            cs_ref[i, d] = c_new
        return 0

    jax.lax.fori_loop(0, C, step, 0)


def _bi_bwd_kernel(len_ref, gx_ref, res_ref, whh_ref, dgx_ref, dh_ref, dc_ref):
    """Reverse-time backward over one CHUNK for both directions.

    res [C, 2, B, 4H] = [h_prev | c_prev | c_t | dy] per direction."""
    k = pl.program_id(0)
    Tc = pl.num_programs(0)
    C = gx_ref.shape[0]

    @pl.when(k == 0)
    def _():
        dh_ref[:] = jnp.zeros_like(dh_ref)
        dc_ref[:] = jnp.zeros_like(dc_ref)

    def step(j, _):
        i = C - 1 - j
        t = (Tc - 1 - k) * C + i
        valid = (t < len_ref[:, 0])[:, None]
        H = dh_ref.shape[-1]
        for d in range(2):
            res = res_ref[i, d]
            h_prev = res[:, :H]
            c_prev = res[:, H : 2 * H]
            c_t = res[:, 2 * H : 3 * H]
            dy = res[:, 3 * H :]
            gates = gx_ref[i, d].astype(jnp.float32) + jnp.dot(
                h_prev.astype(whh_ref.dtype), whh_ref[d],
                preferred_element_type=jnp.float32,
            )
            ii = jax.nn.sigmoid(gates[:, :H])
            f = jax.nn.sigmoid(gates[:, H : 2 * H])
            g = jnp.tanh(gates[:, 2 * H : 3 * H])
            o = jax.nn.sigmoid(gates[:, 3 * H :])
            tanh_c = jnp.tanh(c_t)

            dh_in = dh_ref[d]
            dh = dh_in + dy
            dc = dc_ref[d]
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
            )
            dgates = jnp.where(valid, dgates, 0.0)
            dh_prev = jax.lax.dot_general(
                dgates.astype(whh_ref.dtype), whh_ref[d], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dh_ref[d] = jnp.where(valid, dh_prev, dh_in)
            dc_ref[d] = jnp.where(valid, dc_prev, dc)
            dgx_ref[i, d] = dgates
        return 0

    jax.lax.fori_loop(0, C, step, 0)


def _bi_fwd(gx2, whh2, lengths, interpret):
    gx2 = gx2.astype(_kdt())
    whh2 = whh2.astype(_kdt())
    T, D, B, G = gx2.shape
    H = G // 4
    Tp = ((T + CHUNK - 1) // CHUNK) * CHUNK
    gx2 = _pad_time(gx2, Tp)
    lengths2d = lengths.astype(jnp.int32).reshape(B, 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(Tp // CHUNK,),
        in_specs=[
            pl.BlockSpec((B, 1), lambda k: (0, 0)),
            pl.BlockSpec((CHUNK, 2, B, G), lambda k: (k, 0, 0, 0)),
            pl.BlockSpec((2, H, G), lambda k: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((CHUNK, 2, B, H), lambda k: (k, 0, 0, 0)),
            pl.BlockSpec((CHUNK, 2, B, H), lambda k: (k, 0, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, B, H), jnp.float32),
            pltpu.VMEM((2, B, H), jnp.float32),
        ],
    )
    y, cs = pl.pallas_call(
        _bi_fwd_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Tp, 2, B, H), jnp.float32),
            jax.ShapeDtypeStruct((Tp, 2, B, H), jnp.float32),
        ],
        interpret=interpret,
    )(lengths2d, gx2, whh2)
    return y[:T], cs[:T]


def _bi_bwd(gx2, whh2, lengths, y, cs, dy, interpret):
    gx2 = gx2.astype(_kdt())
    whh2 = whh2.astype(_kdt())
    T, D, B, G = gx2.shape
    H = G // 4
    Tp = ((T + CHUNK - 1) // CHUNK) * CHUNK
    lengths2d = lengths.astype(jnp.int32).reshape(B, 1)
    zrow = jnp.zeros((1, 2, B, H), jnp.float32)
    res = jnp.concatenate(
        [
            jnp.concatenate([zrow, y[:-1]], axis=0),
            jnp.concatenate([zrow, cs[:-1]], axis=0),
            cs,
            dy.astype(jnp.float32),
        ],
        axis=-1,
    )
    gx2 = _pad_time(gx2, Tp)
    res = _pad_time(res, Tp)
    Tc = Tp // CHUNK
    rev = lambda k: (Tc - 1 - k, 0, 0, 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(Tc,),
        in_specs=[
            pl.BlockSpec((B, 1), lambda k: (0, 0)),
            pl.BlockSpec((CHUNK, 2, B, G), rev),
            pl.BlockSpec((CHUNK, 2, B, 4 * H), rev),
            pl.BlockSpec((2, H, G), lambda k: (0, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((CHUNK, 2, B, G), rev)],
        scratch_shapes=[
            pltpu.VMEM((2, B, H), jnp.float32),
            pltpu.VMEM((2, B, H), jnp.float32),
        ],
    )
    (dgx,) = pl.pallas_call(
        _bi_bwd_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((Tp, 2, B, G), jnp.float32)],
        interpret=interpret,
    )(lengths2d, gx2, res, whh2)
    dgx = dgx[:T]
    h_prev = res[:T, :, :, :H]
    dwhh = jnp.einsum("tdbh,tdbg->dhg", h_prev, dgx)
    return dgx, dwhh


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def bilstm_seq_pallas_vjp(gx2, whh2, lengths, interpret=False):
    """Differentiable fused dual-direction LSTM loop.

    gx2: [T, 2, B, 4H] precomputed input gates (direction 1 pre-reversed);
    whh2: [2, H, 4H]. Returns y [T, 2, B, H].
    """
    y, _ = _bi_fwd(gx2, whh2, lengths, interpret)
    return y


def _vjp_fwd(gx2, whh2, lengths, interpret):
    y, cs = _bi_fwd(gx2, whh2, lengths, interpret)
    return y, (gx2, whh2, lengths, y, cs)


def _vjp_bwd(interpret, resids, dy):
    gx2, whh2, lengths, y, cs = resids
    dgx, dwhh = _bi_bwd(gx2, whh2, lengths, y, cs, dy, interpret)
    return dgx, dwhh, None


bilstm_seq_pallas_vjp.defvjp(_vjp_fwd, _vjp_bwd)


def bilstm_pallas_trainable(
    p, xs: jax.Array, lengths: Optional[jax.Array] = None, interpret: bool = False
) -> jax.Array:
    """Drop-in for ``rnn.bilstm_scan``: [B, T, in] -> [B, T, 2H].

    Input projections for both directions run as XLA matmuls; the fused
    kernel advances both recurrences per grid step. The backward direction's
    inputs/outputs are per-sample reversed outside (rnn.reverse_sequence),
    keeping packed semantics identical to two independent scans.
    """
    from ss_asr_tpu.ops import rnn

    B, T, _ = xs.shape
    if lengths is None:
        lengths = jnp.full((B,), T, dtype=jnp.int32)
    xr = rnn.reverse_sequence(xs, lengths)
    gxf = xs @ p["fwd"]["w_ih"] + p["fwd"]["b"]
    gxb = xr @ p["bwd"]["w_ih"] + p["bwd"]["b"]
    gx2 = jnp.stack([gxf, gxb], axis=1)  # [B, 2, T, 4H] -> want [T, 2, B, 4H]
    gx2 = jnp.transpose(gx2, (2, 1, 0, 3))
    whh2 = jnp.stack([p["fwd"]["w_hh"], p["bwd"]["w_hh"]], axis=0)
    y = bilstm_seq_pallas_vjp(gx2, whh2, lengths, interpret)  # [T, 2, B, H]
    yf = jnp.transpose(y[:, 0], (1, 0, 2))  # [B, T, H]
    yb = rnn.reverse_sequence(jnp.transpose(y[:, 1], (1, 0, 2)), lengths)
    return jnp.concatenate([yf, yb], axis=-1)
