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
