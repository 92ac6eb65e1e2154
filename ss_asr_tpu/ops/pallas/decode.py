"""Pallas TPU kernel: fused greedy attend-and-spell decode loop.

One kernel runs the *entire* greedy decode: the attention read, both speller
LSTM cells, the output projection, argmax feedback and the embedding lookup
all stay in VMEM for every step — the XLA scan pays per-step fusion/dispatch
overhead ~50-100us on the serialized decode path; here a step is a handful of
small MXU matmuls plus VPU reductions on resident data.

Two kernels: plain greedy (``greedy_decode_pallas``) and greedy with char-LM
shallow fusion (``greedy_decode_lm_pallas`` — the 2xGRU LM stepped in-kernel,
fused log-softmax mixing; the reference's serving fusion rule,
src/asr.py:143-173). Numerically identical to ``decode.greedy.greedy_decode``
with/without ``lm_params`` (tested). Beam search stays on the XLA path.

VMEM budget at flagship size (B=32, S<=64): speller weights ~5 MB, encoder
memory ~4.5 MB, carries <1 MB — comfortably resident.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ss_asr_tpu.models import las
from ss_asr_tpu.vocab import EOS_ID, SOS_ID


def _decode_kernel(
    enc_ref, comp_ref, len_ref,
    phi_ref, wih1_ref, whh1_ref, b1_ref, wih2_ref, whh2_ref, b2_ref,
    ct_w_ref, ct_b_ref, emb_ref,
    out_ref,
    h1_ref, c1_ref, h2_ref, c2_ref, last_ref, done_ref,
):
    t = pl.program_id(0)
    B, S, F = enc_ref.shape
    H = h1_ref.shape[-1]
    V = ct_w_ref.shape[-1]

    @pl.when(t == 0)
    def _():
        h1_ref[:] = jnp.zeros_like(h1_ref)
        c1_ref[:] = jnp.zeros_like(c1_ref)
        h2_ref[:] = jnp.zeros_like(h2_ref)
        c2_ref[:] = jnp.zeros_like(c2_ref)
        # last char starts as SOS: one-hot row SOS_ID of the embedding
        last_ref[:] = jnp.broadcast_to(emb_ref[SOS_ID, :][None, :], last_ref.shape)
        done_ref[:] = jnp.zeros_like(done_ref)

    # predicated early exit: a Pallas grid cannot break, but once every
    # row has emitted EOS the remaining steps only need their pad row in
    # the output — the whole MXU/VPU body is branch-skipped, so a short
    # transcript costs ~zero per leftover step (the XLA early-exit
    # while_loop's advantage, kept inside the fused kernel). Done rows'
    # states stop evolving, which is unobservable: their emits are forced
    # to SOS either way.
    alive = jnp.min(done_ref[:]) == 0
    T_out = out_ref.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (T_out, B), 0)

    @pl.when(jnp.logical_not(alive))
    def _():
        out_ref[:] = jnp.where(row == t, jnp.int32(SOS_ID), out_ref[:])

    @pl.when(alive)
    def _():
        _decode_step_body(
            t, B, S, F, H, V, row,
            enc_ref, comp_ref, len_ref,
            phi_ref, wih1_ref, whh1_ref, b1_ref, wih2_ref, whh2_ref, b2_ref,
            ct_w_ref, ct_b_ref, emb_ref, out_ref,
            h1_ref, c1_ref, h2_ref, c2_ref, last_ref, done_ref,
        )


def _decode_step_body(
    t, B, S, F, H, V, row,
    enc_ref, comp_ref, len_ref,
    phi_ref, wih1_ref, whh1_ref, b1_ref, wih2_ref, whh2_ref, b2_ref,
    ct_w_ref, ct_b_ref, emb_ref, out_ref,
    h1_ref, c1_ref, h2_ref, c2_ref, last_ref, done_ref,
):
    h1 = h1_ref[:]
    # attention: q = tanh(h1 @ phi); energy/context as VPU reductions
    q = jnp.tanh(
        jnp.dot(h1, phi_ref[:], preferred_element_type=jnp.float32)
    )  # [B, m]
    energy = jnp.sum(comp_ref[:] * q[:, None, :], axis=-1)  # [B, S]
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    valid = pos < len_ref[:, 0][:, None]
    energy = jnp.where(valid, energy, -jnp.inf)
    energy = energy - jnp.max(energy, axis=-1, keepdims=True)
    w = jnp.exp(energy)
    score = w / jnp.sum(w, axis=-1, keepdims=True)  # [B, S]
    context = jnp.sum(enc_ref[:] * score[:, :, None], axis=1)  # [B, F]

    dec_in = jnp.concatenate([last_ref[:], context], axis=-1)  # [B, H+F]
    gates1 = (
        jnp.dot(dec_in, wih1_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(h1, whh1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[0]
    )
    i1 = jax.nn.sigmoid(gates1[:, :H])
    f1 = jax.nn.sigmoid(gates1[:, H : 2 * H])
    g1 = jnp.tanh(gates1[:, 2 * H : 3 * H])
    o1 = jax.nn.sigmoid(gates1[:, 3 * H :])
    c1 = f1 * c1_ref[:] + i1 * g1
    h1n = o1 * jnp.tanh(c1)

    gates2 = (
        jnp.dot(h1n, wih2_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(h2_ref[:], whh2_ref[:], preferred_element_type=jnp.float32)
        + b2_ref[0]
    )
    i2 = jax.nn.sigmoid(gates2[:, :H])
    f2 = jax.nn.sigmoid(gates2[:, H : 2 * H])
    g2 = jnp.tanh(gates2[:, 2 * H : 3 * H])
    o2 = jax.nn.sigmoid(gates2[:, 3 * H :])
    c2 = f2 * c2_ref[:] + i2 * g2
    h2n = o2 * jnp.tanh(c2)

    logits = jnp.dot(h2n, ct_w_ref[:], preferred_element_type=jnp.float32) + ct_b_ref[0]
    ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B]

    done = done_ref[:, 0] != 0
    emit = jnp.where(done, jnp.int32(SOS_ID), ids)
    done_new = jnp.logical_or(done, ids == EOS_ID)

    # the [max_steps, B] token buffer stays fully VMEM-resident (tiny);
    # write row t with a masked update (per-step (1, B) blocks violate the
    # sublane tiling rule)
    out_ref[:] = jnp.where(row == t, emit[None, :], out_ref[:])

    # feedback: embed via one-hot matmul (dynamic row gather lowers poorly)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (B, V), 1) == ids[:, None]).astype(
        jnp.float32
    )
    last_ref[:] = jnp.dot(onehot, emb_ref[:], preferred_element_type=jnp.float32)

    h1_ref[:] = h1n
    c1_ref[:] = c1
    h2_ref[:] = h2n
    c2_ref[:] = c2
    done_ref[:] = done_new[:, None].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("max_steps", "interpret"))
def _decode_pallas(enc_h, comp_h, enc_lens, weights, max_steps, interpret):
    B, S, F = enc_h.shape
    (phi, wih1, whh1, b1, wih2, whh2, b2, ct_w, ct_b, emb) = weights
    H = whh1.shape[0]
    V = ct_w.shape[1]
    # clamp: all-masked attention rows would NaN (see las.attention_mask)
    lengths2d = jnp.maximum(enc_lens.astype(jnp.int32), 1).reshape(B, 1)
    fixed = lambda t: tuple(0 for _ in range(2))  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(max_steps,),
        in_specs=[
            pl.BlockSpec((B, S, F), lambda t: (0, 0, 0)),
            pl.BlockSpec((B, S, phi.shape[1]), lambda t: (0, 0, 0)),
            pl.BlockSpec((B, 1), lambda t: (0, 0)),
            pl.BlockSpec(phi.shape, fixed),
            pl.BlockSpec(wih1.shape, fixed),
            pl.BlockSpec(whh1.shape, fixed),
            pl.BlockSpec((1, 4 * H), lambda t: (0, 0)),
            pl.BlockSpec(wih2.shape, fixed),
            pl.BlockSpec(whh2.shape, fixed),
            pl.BlockSpec((1, 4 * H), lambda t: (0, 0)),
            pl.BlockSpec(ct_w.shape, fixed),
            pl.BlockSpec((1, V), lambda t: (0, 0)),
            pl.BlockSpec(emb.shape, fixed),
        ],
        out_specs=pl.BlockSpec((max_steps, B), lambda t: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),  # h1
            pltpu.VMEM((B, H), jnp.float32),  # c1
            pltpu.VMEM((B, H), jnp.float32),  # h2
            pltpu.VMEM((B, H), jnp.float32),  # c2
            pltpu.VMEM((B, H), jnp.float32),  # last char embedding
            pltpu.VMEM((B, 1), jnp.int32),  # done flags
        ],
    )
    toks = pl.pallas_call(
        _decode_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((max_steps, B), jnp.int32),
        interpret=interpret,
    )(
        enc_h, comp_h, lengths2d,
        phi, wih1, whh1, b1.reshape(1, -1), wih2, whh2, b2.reshape(1, -1),
        ct_w, ct_b.reshape(1, -1), emb,
    )
    return jnp.swapaxes(toks, 0, 1)  # [B, max_steps]


def greedy_decode_pallas(
    params: Dict,
    cfg: las.ASRConfig,
    x: jax.Array,
    x_lens: jax.Array,
    max_steps: int = 200,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused-kernel greedy decode; same contract as ``greedy.greedy_decode``
    without LM fusion. Jitted whole (listener + precompute + kernel) so
    serving calls hit one cached executable — see decode/greedy.py."""
    from ss_asr_tpu.ops import rnn

    return _greedy_jit_for(x.shape[0])(
        params, cfg, x, x_lens, max_steps, interpret, _salt=rnn.impl_salt()
    )


def _greedy_jit_for(batch: int):
    """Large batches keep more encoder memory VMEM-resident; past ~B=32
    flagship that brushes the compiler's 16 MB scoped default, so route
    them through the raised-limit executable (ops/rnn.py scoped-VMEM
    notes). Only at top level: ``compiler_options`` is rejected on a jit
    inlined into an outer trace (rnn.top_level_call)."""
    from ss_asr_tpu.ops import rnn

    if (batch > 32 and jax.default_backend() == "tpu"
            and rnn.top_level_call()):
        return _greedy_decode_pallas_jit_raised
    return _greedy_decode_pallas_jit


def _greedy_decode_pallas_impl(
    params, cfg, x, x_lens, max_steps, interpret, *, _salt=None
):
    from ss_asr_tpu.decode.greedy import _finalize

    enc_h, enc_lens = las.listener_apply(params["encoder"], x, x_lens)
    comp_h = las.attention_precompute(params["attention"], enc_h)
    d = params["decoder"]
    weights = (
        params["attention"]["phi"]["w"],
        d["layer1"]["w_ih"], d["layer1"]["w_hh"], d["layer1"]["b"],
        d["layer2"]["w_ih"], d["layer2"]["w_hh"], d["layer2"]["b"],
        params["char_trans"]["w"], params["char_trans"]["b"],
        params["embed"]["table"],
    )
    toks = _decode_pallas(enc_h, comp_h, enc_lens, weights, max_steps, interpret)
    return _finalize(toks, max_steps)


_GREEDY_STATICS = ("cfg", "max_steps", "interpret", "_salt")
_greedy_decode_pallas_jit = jax.jit(
    _greedy_decode_pallas_impl, static_argnames=_GREEDY_STATICS)
_greedy_decode_pallas_jit_raised = jax.jit(
    _greedy_decode_pallas_impl, static_argnames=_GREEDY_STATICS,
    compiler_options={"xla_tpu_scoped_vmem_limit_kib": "32768"})


# ---------------------------------------------------------------------------
# LM-fused variant: char-LM (2x GRU) stepped in-kernel, shallow fusion
# ---------------------------------------------------------------------------

def _gru_step_ref(x, h, wih_ref, whh_ref, bih_ref, bhh_ref):
    H = h.shape[-1]
    gi = jnp.dot(x, wih_ref[:], preferred_element_type=jnp.float32) + bih_ref[0]
    gh = jnp.dot(h, whh_ref[:], preferred_element_type=jnp.float32) + bhh_ref[0]
    r = jax.nn.sigmoid(gi[:, :H] + gh[:, :H])
    z = jax.nn.sigmoid(gi[:, H : 2 * H] + gh[:, H : 2 * H])
    n = jnp.tanh(gi[:, 2 * H :] + r * gh[:, 2 * H :])
    return (1.0 - z) * n + z * h


def _log_softmax(v):
    m = jnp.max(v, axis=-1, keepdims=True)
    e = jnp.exp(v - m)
    return (v - m) - jnp.log(jnp.sum(e, axis=-1, keepdims=True))


def _decode_lm_kernel(
    enc_ref, comp_ref, len_ref, lmw_ref,
    phi_ref, wih1_ref, whh1_ref, b1_ref, wih2_ref, whh2_ref, b2_ref,
    ct_w_ref, ct_b_ref, emb_ref,
    lm_emb_ref, g1_wih_ref, g1_whh_ref, g1_bih_ref, g1_bhh_ref,
    g2_wih_ref, g2_whh_ref, g2_bih_ref, g2_bhh_ref, lm_w_ref, lm_b_ref,
    out_ref,
    h1_ref, c1_ref, h2_ref, c2_ref, last_ref, done_ref, lmh1_ref, lmh2_ref,
    lastoh_ref,
):
    t = pl.program_id(0)
    B, S, F = enc_ref.shape
    H = h1_ref.shape[-1]
    V = ct_w_ref.shape[-1]

    @pl.when(t == 0)
    def _():
        h1_ref[:] = jnp.zeros_like(h1_ref)
        c1_ref[:] = jnp.zeros_like(c1_ref)
        h2_ref[:] = jnp.zeros_like(h2_ref)
        c2_ref[:] = jnp.zeros_like(c2_ref)
        lmh1_ref[:] = jnp.zeros_like(lmh1_ref)
        lmh2_ref[:] = jnp.zeros_like(lmh2_ref)
        done_ref[:] = jnp.zeros_like(done_ref)  # scratch arrives uninitialized
        last_ref[:] = jnp.broadcast_to(emb_ref[SOS_ID, :][None, :], last_ref.shape)
        oh0 = (jax.lax.broadcasted_iota(jnp.int32, (B, V), 1) == SOS_ID).astype(
            jnp.float32
        )
        lastoh_ref[:] = oh0

    # predicated early exit (see _decode_kernel): all-done steps only pad
    alive = jnp.min(done_ref[:]) == 0
    T_out = out_ref.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (T_out, B), 0)

    @pl.when(jnp.logical_not(alive))
    def _():
        out_ref[:] = jnp.where(row == t, jnp.int32(SOS_ID), out_ref[:])

    @pl.when(alive)
    def _():
        _decode_lm_step_body(
            t, B, S, F, H, V, row,
            enc_ref, comp_ref, len_ref, lmw_ref,
            phi_ref, wih1_ref, whh1_ref, b1_ref, wih2_ref, whh2_ref, b2_ref,
            ct_w_ref, ct_b_ref, emb_ref,
            lm_emb_ref, g1_wih_ref, g1_whh_ref, g1_bih_ref, g1_bhh_ref,
            g2_wih_ref, g2_whh_ref, g2_bih_ref, g2_bhh_ref, lm_w_ref,
            lm_b_ref, out_ref,
            h1_ref, c1_ref, h2_ref, c2_ref, last_ref, done_ref, lmh1_ref,
            lmh2_ref, lastoh_ref,
        )


def _decode_lm_step_body(
    t, B, S, F, H, V, row,
    enc_ref, comp_ref, len_ref, lmw_ref,
    phi_ref, wih1_ref, whh1_ref, b1_ref, wih2_ref, whh2_ref, b2_ref,
    ct_w_ref, ct_b_ref, emb_ref,
    lm_emb_ref, g1_wih_ref, g1_whh_ref, g1_bih_ref, g1_bhh_ref,
    g2_wih_ref, g2_whh_ref, g2_bih_ref, g2_bhh_ref, lm_w_ref, lm_b_ref,
    out_ref,
    h1_ref, c1_ref, h2_ref, c2_ref, last_ref, done_ref, lmh1_ref, lmh2_ref,
    lastoh_ref,
):
    h1 = h1_ref[:]
    q = jnp.tanh(jnp.dot(h1, phi_ref[:], preferred_element_type=jnp.float32))
    energy = jnp.sum(comp_ref[:] * q[:, None, :], axis=-1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    energy = jnp.where(pos < len_ref[:, 0][:, None], energy, -jnp.inf)
    energy = energy - jnp.max(energy, axis=-1, keepdims=True)
    w = jnp.exp(energy)
    score = w / jnp.sum(w, axis=-1, keepdims=True)
    context = jnp.sum(enc_ref[:] * score[:, :, None], axis=1)

    dec_in = jnp.concatenate([last_ref[:], context], axis=-1)
    gates1 = (
        jnp.dot(dec_in, wih1_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(h1, whh1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[0]
    )
    i1 = jax.nn.sigmoid(gates1[:, :H])
    f1 = jax.nn.sigmoid(gates1[:, H : 2 * H])
    g1 = jnp.tanh(gates1[:, 2 * H : 3 * H])
    o1 = jax.nn.sigmoid(gates1[:, 3 * H :])
    c1 = f1 * c1_ref[:] + i1 * g1
    h1n = o1 * jnp.tanh(c1)
    gates2 = (
        jnp.dot(h1n, wih2_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(h2_ref[:], whh2_ref[:], preferred_element_type=jnp.float32)
        + b2_ref[0]
    )
    i2 = jax.nn.sigmoid(gates2[:, :H])
    f2 = jax.nn.sigmoid(gates2[:, H : 2 * H])
    g2 = jnp.tanh(gates2[:, 2 * H : 3 * H])
    o2 = jax.nn.sigmoid(gates2[:, 3 * H :])
    c2 = f2 * c2_ref[:] + i2 * g2
    h2n = o2 * jnp.tanh(c2)
    asr_logits = (
        jnp.dot(h2n, ct_w_ref[:], preferred_element_type=jnp.float32) + ct_b_ref[0]
    )

    # char-LM step on the previous fused ids (one-hot held in scratch)
    lm_x = jnp.dot(lastoh_ref[:], lm_emb_ref[:], preferred_element_type=jnp.float32)
    lmh1 = _gru_step_ref(lm_x, lmh1_ref[:], g1_wih_ref, g1_whh_ref, g1_bih_ref, g1_bhh_ref)
    lmh2 = _gru_step_ref(lmh1, lmh2_ref[:], g2_wih_ref, g2_whh_ref, g2_bih_ref, g2_bhh_ref)
    lm_logits = jnp.dot(lmh2, lm_w_ref[:], preferred_element_type=jnp.float32) + lm_b_ref[0]

    fused = _log_softmax(asr_logits) + lmw_ref[0, 0] * _log_softmax(lm_logits)
    ids = jnp.argmax(fused, axis=-1).astype(jnp.int32)

    done = done_ref[:, 0] != 0
    emit = jnp.where(done, jnp.int32(SOS_ID), ids)
    done_new = jnp.logical_or(done, ids == EOS_ID)

    out_ref[:] = jnp.where(row == t, emit[None, :], out_ref[:])

    onehot = (jax.lax.broadcasted_iota(jnp.int32, (B, V), 1) == ids[:, None]).astype(
        jnp.float32
    )
    last_ref[:] = jnp.dot(onehot, emb_ref[:], preferred_element_type=jnp.float32)
    lastoh_ref[:] = onehot
    h1_ref[:] = h1n
    c1_ref[:] = c1
    h2_ref[:] = h2n
    c2_ref[:] = c2
    lmh1_ref[:] = lmh1
    lmh2_ref[:] = lmh2
    done_ref[:] = done_new[:, None].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("max_steps", "interpret"))
def _decode_lm_pallas(enc_h, comp_h, enc_lens, weights, lm_weights, lm_weight,
                      max_steps, interpret):
    B, S, F = enc_h.shape
    (phi, wih1, whh1, b1, wih2, whh2, b2, ct_w, ct_b, emb) = weights
    (lm_emb, g1_wih, g1_whh, g1_bih, g1_bhh, g2_wih, g2_whh, g2_bih, g2_bhh,
     lm_w, lm_b) = lm_weights
    H = whh1.shape[0]
    Hl = g1_whh.shape[0]
    V = ct_w.shape[1]
    lengths2d = jnp.maximum(enc_lens.astype(jnp.int32), 1).reshape(B, 1)
    lmw2d = jnp.full((1, 1), lm_weight, dtype=jnp.float32)
    fixed = lambda t: (0, 0)  # noqa: E731
    specs = [
        pl.BlockSpec((B, S, F), lambda t: (0, 0, 0)),
        pl.BlockSpec((B, S, phi.shape[1]), lambda t: (0, 0, 0)),
        pl.BlockSpec((B, 1), fixed),
        pl.BlockSpec((1, 1), fixed),
        pl.BlockSpec(phi.shape, fixed),
        pl.BlockSpec(wih1.shape, fixed),
        pl.BlockSpec(whh1.shape, fixed),
        pl.BlockSpec((1, 4 * H), fixed),
        pl.BlockSpec(wih2.shape, fixed),
        pl.BlockSpec(whh2.shape, fixed),
        pl.BlockSpec((1, 4 * H), fixed),
        pl.BlockSpec(ct_w.shape, fixed),
        pl.BlockSpec((1, V), fixed),
        pl.BlockSpec(emb.shape, fixed),
        pl.BlockSpec(lm_emb.shape, fixed),
        pl.BlockSpec(g1_wih.shape, fixed),
        pl.BlockSpec(g1_whh.shape, fixed),
        pl.BlockSpec((1, 3 * Hl), fixed),
        pl.BlockSpec((1, 3 * Hl), fixed),
        pl.BlockSpec(g2_wih.shape, fixed),
        pl.BlockSpec(g2_whh.shape, fixed),
        pl.BlockSpec((1, 3 * Hl), fixed),
        pl.BlockSpec((1, 3 * Hl), fixed),
        pl.BlockSpec(lm_w.shape, fixed),
        pl.BlockSpec((1, V), fixed),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(max_steps,),
        in_specs=specs,
        out_specs=pl.BlockSpec((max_steps, B), lambda t: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, 1), jnp.int32),
            pltpu.VMEM((B, Hl), jnp.float32),
            pltpu.VMEM((B, Hl), jnp.float32),
            pltpu.VMEM((B, V), jnp.float32),
        ],
    )
    toks = pl.pallas_call(
        _decode_lm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((max_steps, B), jnp.int32),
        interpret=interpret,
    )(
        enc_h, comp_h, lengths2d, lmw2d,
        phi, wih1, whh1, b1.reshape(1, -1), wih2, whh2, b2.reshape(1, -1),
        ct_w, ct_b.reshape(1, -1), emb,
        lm_emb, g1_wih, g1_whh, g1_bih.reshape(1, -1), g1_bhh.reshape(1, -1),
        g2_wih, g2_whh, g2_bih.reshape(1, -1), g2_bhh.reshape(1, -1),
        lm_w, lm_b.reshape(1, -1),
    )
    return jnp.swapaxes(toks, 0, 1)


def greedy_decode_lm_pallas(
    params: Dict,
    cfg: las.ASRConfig,
    x: jax.Array,
    x_lens: jax.Array,
    lm_params: Dict,
    lm_weight: float,
    max_steps: int = 200,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused-kernel greedy decode WITH char-LM shallow fusion — the
    reference's default serving configuration, one kernel per utterance
    batch (parity: decode.greedy.greedy_decode with lm_params). Jitted
    whole (listener + precompute + kernel; lm_weight rides as a traced
    scalar) so serving calls hit one cached executable."""
    from ss_asr_tpu.ops import rnn

    fn = (_greedy_decode_lm_pallas_jit_raised
          if (x.shape[0] > 32 and jax.default_backend() == "tpu"
              and rnn.top_level_call())
          else _greedy_decode_lm_pallas_jit)
    return fn(
        params, cfg, x, x_lens, lm_params, lm_weight, max_steps, interpret,
        _salt=rnn.impl_salt(),
    )


def _greedy_decode_lm_pallas_impl(
    params, cfg, x, x_lens, lm_params, lm_weight, max_steps, interpret,
    *, _salt=None,
):
    from ss_asr_tpu.decode.greedy import _finalize

    enc_h, enc_lens = las.listener_apply(params["encoder"], x, x_lens)
    comp_h = las.attention_precompute(params["attention"], enc_h)
    d = params["decoder"]
    weights = (
        params["attention"]["phi"]["w"],
        d["layer1"]["w_ih"], d["layer1"]["w_hh"], d["layer1"]["b"],
        d["layer2"]["w_ih"], d["layer2"]["w_hh"], d["layer2"]["b"],
        params["char_trans"]["w"], params["char_trans"]["b"],
        params["embed"]["table"],
    )
    lm_weights = (
        lm_params["emb"]["table"],
        lm_params["gru1"]["w_ih"], lm_params["gru1"]["w_hh"],
        lm_params["gru1"]["b_ih"], lm_params["gru1"]["b_hh"],
        lm_params["gru2"]["w_ih"], lm_params["gru2"]["w_hh"],
        lm_params["gru2"]["b_ih"], lm_params["gru2"]["b_hh"],
        lm_params["out"]["w"], lm_params["out"]["b"],
    )
    toks = _decode_lm_pallas(
        enc_h, comp_h, enc_lens, weights, lm_weights, lm_weight, max_steps, interpret
    )
    return _finalize(toks, max_steps)


_greedy_decode_lm_pallas_jit = jax.jit(
    _greedy_decode_lm_pallas_impl, static_argnames=_GREEDY_STATICS)
_greedy_decode_lm_pallas_jit_raised = jax.jit(
    _greedy_decode_lm_pallas_impl, static_argnames=_GREEDY_STATICS,
    compiler_options={"xla_tpu_scoped_vmem_limit_kib": "32768"})
