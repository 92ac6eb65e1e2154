"""Pallas TPU kernels: fused attend-and-spell TRAINING loop (fwd + bwd).

The decode-side recurrence (attention read + two speller LSTM cells + output
projection + scheduled-sampling feedback) costs ~2.3 ms of the train step as
an XLA scan; these kernels keep the encoder memory and every decoder weight
VMEM-resident and run CHUNK steps per grid block.

Design:

* Forward streams out, per step: logits, attention weights ``a``, the state
  tuple (h1, c1, h2, c2) and the *actual* fed embedding — everything the
  backward needs; gate pre-activations are recomputed in the backward from
  those streams (2 extra MXU dots/step beats 2 extra [B,8H] streams).
* Scheduled sampling (shared-per-step Bernoulli + Gumbel-argmax) happens
  in-kernel; no gradient flows through argmax, so the feedback only routes
  cotangents out to the embedding table / teacher embeddings, never back
  into the recurrent chain.
* The backward kernel produces per-step ``dgates1/dgates2/de/dqpre/demb``
  streams and the (dh1, dc1, dh2, dc2) carries; ALL weight gradients reduce
  to batched einsums outside the kernel where the MXU is efficient.

Parity oracle: ``models.las.attend_and_spell`` under ``jax.grad``
(tests/test_pallas_spell.py, interpreter mode).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ss_asr_tpu.vocab import SOS_ID

CHUNK = 8

#: Max rows per kernel batch block: the backward keeps [CHUNK, BB, 4H]
#: residual blocks (plus the attention streams) double-buffered in VMEM,
#: which crosses the 16 MB scoped limit past BB~48.  Larger batches run on
#: a 2-D grid (batch blocks x L chunks) — the recurrence is independent
#: across rows, so the outer batch-block axis is embarrassingly parallel
#: and every VMEM-resident block stays at the proven footprint.
BATCH_BLOCK_MAX = 48

#: Block-row cap for multi-block grids: a 48-row block inside a 2-D grid
#: fails to compile at the STOCK 16 MB scoped-VMEM limit (round-3 early
#: recorded it as a "Mosaic internal compile error"); BB=32 compiles and
#: holds the linear-scaling throughput (B=96: 14.61 ms, 6573 utt/s).
#: With the raised limit (rnn.wide_h_compiler_options) BB=48 compiles and
#: measures ~2% faster at B=96 (14.56 vs 14.90 ms, PROFILE_OPT.json
#: phase 4) — inside the run-to-run band, so the stock-safe cap stays;
#: large-batch users can raise it together with the jit option.
BATCH_BLOCK_MULTI = 32

#: Block-row cap past two BATCH_BLOCK_MAX blocks: XLA's scoped-vmem
#: accounting for the backward call grows with the grid beyond the
#: per-block footprint — at B=128 a BB=32 grid overflows the 16 MB scoped
#: limit by 2.4 MB while BB=16 compiles and holds throughput (20.12 ms,
#: 6363 utt/s; B=256: 43.66 ms, 5864 utt/s; docs/PROFILE_OPT.json
#: phase 3).  Verified points: (B<=48, single block), (B=64, BB=32),
#: (B=96, BB=32), (B=128, BB=16), (B=256, BB=16).  Under the raised
#: scoped-vmem limit BB=32 at B=128 compiles and measures 19.90 vs
#: 20.29 ms (phase 4) — same band-edge story as BATCH_BLOCK_MULTI.
BATCH_BLOCK_LARGE = 16


def _batch_block(B: int, H: int = 256) -> Tuple[int, int]:
    """(block rows BB, padded batch Bp) for a per-shard batch of B rows.
    Single block up to BATCH_BLOCK_MAX rows; multi-block grids prefer a
    sublane-aligned (multiple-of-8) exact divisor of B capped at
    BATCH_BLOCK_MULTI (BATCH_BLOCK_LARGE past two max blocks); otherwise
    B pads up to a block multiple (padded rows carry zero cotangents and
    are sliced off).

    The three caps were VMEM-calibrated at the flagship H=256; the
    per-row residual footprint scales ~linearly in H, so wider decoders
    scale every cap down by ceil(H/256) (floor 8 = one sublane tile).
    Probe-verified at H=512 on v5e: B=32 with BB=16 multi-block compiles
    and runs; the unscaled BB=32 single block crashes the compiler."""
    scale = max(1, -(-H // 256))

    def scaled(cap: int) -> int:
        # floor at one sublane tile, but never raise a (possibly
        # test-patched) cap above its configured value
        return max(min(8, cap), cap // scale)

    bmax = scaled(BATCH_BLOCK_MAX)
    if B <= bmax:
        return B, B
    bbmax = min(scaled(BATCH_BLOCK_MULTI), bmax)
    if B > 2 * bmax:
        bbmax = min(bbmax, scaled(BATCH_BLOCK_LARGE))
    for bb in range(bbmax, bbmax // 2 - 1, -1):
        if B % bb == 0 and (bb % 8 == 0 or bbmax < 8):
            return bb, B
    return bbmax, ((B + bbmax - 1) // bbmax) * bbmax


def _pad_B(a, axis: int, Bp: int, fill=0.0):
    B = a.shape[axis]
    if B == Bp:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, Bp - B)
    return jnp.pad(a, widths, constant_values=fill)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(
    enc_ref, comp_ref, len_ref, tf_ref, gum_ref, temb_ref,
    phi_ref, wih1_ref, whh1_ref, b1_ref, wih2_ref, whh2_ref, b2_ref,
    ct_w_ref, ct_b_ref, emb_ref,
    logits_ref, a_ref, h1s_ref, c1s_ref, h2s_ref, c2s_ref, fed_ref,
    h1_ref, c1_ref, h2_ref, c2_ref, last_ref,
    lidx=0,
):
    k = pl.program_id(lidx)
    C = gum_ref.shape[0]
    B, S, F = enc_ref.shape
    H = h1_ref.shape[-1]
    V = ct_w_ref.shape[-1]

    @pl.when(k == 0)
    def _():
        h1_ref[:] = jnp.zeros_like(h1_ref)
        c1_ref[:] = jnp.zeros_like(c1_ref)
        h2_ref[:] = jnp.zeros_like(h2_ref)
        c2_ref[:] = jnp.zeros_like(c2_ref)
        last_ref[:] = jnp.broadcast_to(emb_ref[SOS_ID, :][None, :], last_ref.shape)

    def step(i, _):
        h1 = h1_ref[:]
        q = jnp.tanh(jnp.dot(h1, phi_ref[:], preferred_element_type=jnp.float32))
        energy = jnp.sum(comp_ref[:] * q[:, None, :], axis=-1)  # [B,S]
        pos = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
        energy = jnp.where(pos < len_ref[:, 0][:, None], energy, -jnp.inf)
        energy = energy - jnp.max(energy, axis=-1, keepdims=True)
        w = jnp.exp(energy)
        a = w / jnp.sum(w, axis=-1, keepdims=True)
        ctx = jnp.sum(enc_ref[:] * a[:, :, None], axis=1)  # [B,F]

        x = jnp.concatenate([last_ref[:], ctx], axis=-1)
        gates1 = (
            jnp.dot(x, wih1_ref[:], preferred_element_type=jnp.float32)
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

        logits = (
            jnp.dot(h2n, ct_w_ref[:], preferred_element_type=jnp.float32) + ct_b_ref[0]
        )

        # scheduled-sampling feedback (one Bernoulli per step, Gumbel-argmax)
        sampled = jnp.argmax(logits + gum_ref[i], axis=-1).astype(jnp.int32)
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (B, V), 1) == sampled[:, None]
        ).astype(jnp.float32)
        sampled_emb = jnp.dot(onehot, emb_ref[:], preferred_element_type=jnp.float32)
        use_tf = tf_ref[i, 0] > 0.5
        fed = jnp.where(use_tf, temb_ref[i], sampled_emb)

        logits_ref[i] = logits
        a_ref[i] = a
        h1s_ref[i] = h1n
        c1s_ref[i] = c1
        h2s_ref[i] = h2n
        c2s_ref[i] = c2
        fed_ref[i] = fed

        h1_ref[:] = h1n
        c1_ref[:] = c1
        h2_ref[:] = h2n
        c2_ref[:] = c2
        last_ref[:] = fed
        return 0

    jax.lax.fori_loop(0, C, step, 0)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(
    enc_ref, comp_ref, len_ref, dlogits_ref, daext_ref,
    a_ref, h1s_ref, c1s_ref, h2s_ref, c2s_ref,
    h1p_ref, c1p_ref, h2p_ref, c2p_ref, fedp_ref,
    phi_ref, wih1_ref, whh1_ref, b1_ref, wih2_ref, whh2_ref, b2_ref, ct_w_ref,
    dg1_ref, dg2_ref, de_ref, dqp_ref, demb_ref,
    dh1_ref, dc1_ref, dh2_ref, dc2_ref,
    lidx=0,
):
    """One reverse chunk.  Streams (suffix p = previous step, i.e. shifted):
    a, h1s..c2s = forward states at t; h1p..c2p = states at t-1; fedp = the
    embedding fed INTO step t; daext = the caller's cotangent on the returned
    attention maps (zeros for a plain CE loss).  Outputs per step: dgates1,
    dgates2, de (attention-energy grad), dqpre (pre-tanh attention-query
    grad), demb (grad wrt the embedding fed into step t)."""
    k = pl.program_id(lidx)
    C = a_ref.shape[0]
    B, S, F = enc_ref.shape
    H = dh1_ref.shape[-1]

    @pl.when(k == 0)
    def _():
        dh1_ref[:] = jnp.zeros_like(dh1_ref)
        dc1_ref[:] = jnp.zeros_like(dc1_ref)
        dh2_ref[:] = jnp.zeros_like(dh2_ref)
        dc2_ref[:] = jnp.zeros_like(dc2_ref)

    def step(j, _):
        i = C - 1 - j
        h1_prev = h1p_ref[i]
        c1_prev = c1p_ref[i]
        h2_prev = h2p_ref[i]
        c2_prev = c2p_ref[i]
        a = a_ref[i]
        h1 = h1s_ref[i]
        c1 = c1s_ref[i]
        h2 = h2s_ref[i]
        c2 = c2s_ref[i]
        fed_in = fedp_ref[i]

        # ---- recompute forward intermediates ----
        q = jnp.tanh(
            jnp.dot(h1_prev, phi_ref[:], preferred_element_type=jnp.float32)
        )
        ctx = jnp.sum(enc_ref[:] * a[:, :, None], axis=1)
        x = jnp.concatenate([fed_in, ctx], axis=-1)
        gates1 = (
            jnp.dot(x, wih1_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(h1_prev, whh1_ref[:], preferred_element_type=jnp.float32)
            + b1_ref[0]
        )
        i1 = jax.nn.sigmoid(gates1[:, :H])
        f1 = jax.nn.sigmoid(gates1[:, H : 2 * H])
        g1 = jnp.tanh(gates1[:, 2 * H : 3 * H])
        o1 = jax.nn.sigmoid(gates1[:, 3 * H :])
        gates2 = (
            jnp.dot(h1, wih2_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(h2_prev, whh2_ref[:], preferred_element_type=jnp.float32)
            + b2_ref[0]
        )
        i2 = jax.nn.sigmoid(gates2[:, :H])
        f2 = jax.nn.sigmoid(gates2[:, H : 2 * H])
        g2 = jnp.tanh(gates2[:, 2 * H : 3 * H])
        o2 = jax.nn.sigmoid(gates2[:, 3 * H :])

        # ---- backward chain ----
        dh2 = dh2_ref[:] + jax.lax.dot_general(
            dlogits_ref[i], ct_w_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        tanh_c2 = jnp.tanh(c2)
        do2 = dh2 * tanh_c2
        dct2 = dh2 * o2 * (1.0 - tanh_c2 * tanh_c2) + dc2_ref[:]
        di2 = dct2 * g2
        dg2 = dct2 * i2
        df2 = dct2 * c2_prev
        dc2_prev = dct2 * f2
        dgates2 = jnp.concatenate(
            [
                di2 * i2 * (1.0 - i2),
                df2 * f2 * (1.0 - f2),
                dg2 * (1.0 - g2 * g2),
                do2 * o2 * (1.0 - o2),
            ],
            axis=-1,
        )
        dh2_prev = jax.lax.dot_general(
            dgates2, whh2_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dh1 = dh1_ref[:] + jax.lax.dot_general(
            dgates2, wih2_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        tanh_c1 = jnp.tanh(c1)
        do1 = dh1 * tanh_c1
        dct1 = dh1 * o1 * (1.0 - tanh_c1 * tanh_c1) + dc1_ref[:]
        di1 = dct1 * g1
        dg1 = dct1 * i1
        df1 = dct1 * c1_prev
        dc1_prev = dct1 * f1
        dgates1 = jnp.concatenate(
            [
                di1 * i1 * (1.0 - i1),
                df1 * f1 * (1.0 - f1),
                dg1 * (1.0 - g1 * g1),
                do1 * o1 * (1.0 - o1),
            ],
            axis=-1,
        )
        dh1_prev = jax.lax.dot_general(
            dgates1, whh1_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dx = jax.lax.dot_general(
            dgates1, wih1_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [B, E+F]
        E = fed_in.shape[-1]
        demb = dx[:, :E]
        dctx = dx[:, E:]

        # attention backward: context path + the external cotangent on the
        # returned attention maps (e.g. an attention regularizer in the loss)
        da = jnp.sum(enc_ref[:] * dctx[:, None, :], axis=-1) + daext_ref[i]  # [B,S]
        ada = a * da
        de = ada - a * jnp.sum(ada, axis=-1, keepdims=True)  # softmax vjp
        dq = jnp.sum(comp_ref[:] * de[:, :, None], axis=1)  # [B,m]
        dqpre = dq * (1.0 - q * q)
        dh1_prev = dh1_prev + jax.lax.dot_general(
            dqpre, phi_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        dg1_ref[i] = dgates1
        dg2_ref[i] = dgates2
        de_ref[i] = de
        dqp_ref[i] = dqpre
        demb_ref[i] = demb

        dh1_ref[:] = dh1_prev
        dc1_ref[:] = dc1_prev
        dh2_ref[:] = dh2_prev
        dc2_ref[:] = dc2_prev
        return 0

    jax.lax.fori_loop(0, C, step, 0)


# ---------------------------------------------------------------------------
# host plumbing: pallas_call wrappers
# ---------------------------------------------------------------------------

def _pad_L(a, Lp):
    L = a.shape[0]
    if L == Lp:
        return a
    pad = jnp.zeros((Lp - L,) + a.shape[1:], a.dtype)
    return jnp.concatenate([a, pad], axis=0)


def _run_fwd_core(enc_h, comp_h, lens2d, tf2d, gumbel, teacher_emb,
                  phi, wih1, whh1, b1r, wih2, whh2, b2r, ct_w, ct_br, emb,
                  interpret):
    """Raw forward pallas_call on flat, Lp-padded operands (shapes may be
    per-shard under custom_partitioning).  Batches past BATCH_BLOCK_MAX run
    on a 2-D (batch-block, L-chunk) grid; padded rows are sliced off."""
    Lp, B, V = gumbel.shape
    S, F = enc_h.shape[1], enc_h.shape[2]
    H = whh1.shape[0]
    E = emb.shape[1]
    m = phi.shape[1]

    BB, Bp = _batch_block(B, H)
    if Bp != B:
        enc_h = _pad_B(enc_h, 0, Bp)
        comp_h = _pad_B(comp_h, 0, Bp)
        lens2d = _pad_B(lens2d, 0, Bp, fill=1)
        gumbel = _pad_B(gumbel, 1, Bp)
        teacher_emb = _pad_B(teacher_emb, 1, Bp)
    nb = Bp // BB

    if nb == 1:
        grid = (Lp // CHUNK,)
        lidx = 0
        full2 = lambda k: (0, 0)  # noqa: E731
        full3 = lambda k: (0, 0, 0)  # noqa: E731
        bfull3 = full3
        chunk3 = lambda k: (k, 0, 0)  # noqa: E731
        tfmap = lambda k: (k, 0)  # noqa: E731
    else:
        grid = (nb, Lp // CHUNK)  # L chunks innermost: carries walk L per block
        lidx = 1
        full2 = lambda b, k: (0, 0)  # noqa: E731
        bfull3 = lambda b, k: (b, 0, 0)  # noqa: E731
        chunk3 = lambda b, k: (k, b, 0)  # noqa: E731
        tfmap = lambda b, k: (k, 0)  # noqa: E731
    blen2 = full2 if nb == 1 else (lambda b, k: (b, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BB, S, F), bfull3),
            pl.BlockSpec((BB, S, m), bfull3),
            pl.BlockSpec((BB, 1), blen2),
            pl.BlockSpec((CHUNK, 1), tfmap),
            pl.BlockSpec((CHUNK, BB, V), chunk3),
            pl.BlockSpec((CHUNK, BB, E), chunk3),
            pl.BlockSpec(phi.shape, full2),
            pl.BlockSpec(wih1.shape, full2),
            pl.BlockSpec(whh1.shape, full2),
            pl.BlockSpec((1, 4 * H), full2),
            pl.BlockSpec(wih2.shape, full2),
            pl.BlockSpec(whh2.shape, full2),
            pl.BlockSpec((1, 4 * H), full2),
            pl.BlockSpec(ct_w.shape, full2),
            pl.BlockSpec((1, V), full2),
            pl.BlockSpec(emb.shape, full2),
        ],
        out_specs=[
            pl.BlockSpec((CHUNK, BB, V), chunk3),  # logits
            pl.BlockSpec((CHUNK, BB, S), chunk3),  # a
            pl.BlockSpec((CHUNK, BB, H), chunk3),  # h1
            pl.BlockSpec((CHUNK, BB, H), chunk3),  # c1
            pl.BlockSpec((CHUNK, BB, H), chunk3),  # h2
            pl.BlockSpec((CHUNK, BB, H), chunk3),  # c2
            pl.BlockSpec((CHUNK, BB, E), chunk3),  # fed
        ],
        scratch_shapes=[
            pltpu.VMEM((BB, H), jnp.float32),
            pltpu.VMEM((BB, H), jnp.float32),
            pltpu.VMEM((BB, H), jnp.float32),
            pltpu.VMEM((BB, H), jnp.float32),
            pltpu.VMEM((BB, E), jnp.float32),
        ],
    )
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, lidx=lidx),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Lp, Bp, V), jnp.float32),
            jax.ShapeDtypeStruct((Lp, Bp, S), jnp.float32),
            jax.ShapeDtypeStruct((Lp, Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((Lp, Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((Lp, Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((Lp, Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((Lp, Bp, E), jnp.float32),
        ],
        interpret=interpret,
    )(
        enc_h, comp_h, lens2d, tf2d, gumbel, teacher_emb,
        phi, wih1, whh1, b1r, wih2, whh2, b2r, ct_w, ct_br, emb,
    )
    if Bp != B:
        outs = [o[:, :B] for o in outs]
    return outs


def _run_fwd(enc_h, comp_h, lens2d, tf_draws, gumbel, teacher_emb, W, interpret):
    (phi, wih1, whh1, b1, wih2, whh2, b2, ct_w, ct_b, emb) = W
    L = gumbel.shape[0]
    Lp = ((L + CHUNK - 1) // CHUNK) * CHUNK
    flat = (
        enc_h, comp_h, lens2d,
        _pad_L(tf_draws, Lp).reshape(Lp, 1),
        _pad_L(gumbel, Lp), _pad_L(teacher_emb, Lp),
        phi, wih1, whh1, b1.reshape(1, -1), wih2, whh2, b2.reshape(1, -1),
        ct_w, ct_b.reshape(1, -1), emb,
    )
    from ss_asr_tpu.ops import rnn as _rnn

    if _rnn._gspmd_axes_live():
        outs = _spell_cp_fwd(interpret)(*flat)
    else:
        outs = _run_fwd_core(*flat, interpret)
    return tuple(o[:L] for o in outs)


def _run_bwd_core(enc_h, comp_h, lens2d, dlogits, daext,
                  a, h1s, c1s, h2s, c2s, h1p, c1p, h2p, c2p, fedp,
                  phi, wih1, whh1, b1r, wih2, whh2, b2r, ct_w, interpret):
    """Raw backward pallas_call on flat, Lp-padded operands.  Same 2-D
    (batch-block, L-chunk) grid policy as the forward: past BATCH_BLOCK_MAX
    rows the residual blocks are walked per batch block so the VMEM
    footprint never exceeds the proven BB<=48 budget."""
    Lp, B, S = a.shape
    F = enc_h.shape[2]
    H = h1s.shape[2]
    E = fedp.shape[2]
    m = phi.shape[1]
    V = ct_w.shape[1]
    Lc = Lp // CHUNK

    BB, Bp = _batch_block(B, H)
    if Bp != B:
        enc_h = _pad_B(enc_h, 0, Bp)
        comp_h = _pad_B(comp_h, 0, Bp)
        lens2d = _pad_B(lens2d, 0, Bp, fill=1)
        dlogits = _pad_B(dlogits, 1, Bp)
        daext = _pad_B(daext, 1, Bp)
        a, h1s, c1s, h2s, c2s, h1p, c1p, h2p, c2p, fedp = (
            _pad_B(x, 1, Bp)
            for x in (a, h1s, c1s, h2s, c2s, h1p, c1p, h2p, c2p, fedp)
        )
    nb = Bp // BB

    if nb == 1:
        grid = (Lc,)
        lidx = 0
        full2 = lambda k: (0, 0)  # noqa: E731
        bfull3 = lambda k: (0, 0, 0)  # noqa: E731
        blen2 = full2
        rev3 = lambda k: (Lc - 1 - k, 0, 0)  # noqa: E731
    else:
        grid = (nb, Lc)  # L chunks innermost: dh/dc carries walk L per block
        lidx = 1
        full2 = lambda b, k: (0, 0)  # noqa: E731
        bfull3 = lambda b, k: (b, 0, 0)  # noqa: E731
        blen2 = lambda b, k: (b, 0)  # noqa: E731
        rev3 = lambda b, k: (Lc - 1 - k, b, 0)  # noqa: E731

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BB, S, F), bfull3),
            pl.BlockSpec((BB, S, m), bfull3),
            pl.BlockSpec((BB, 1), blen2),
            pl.BlockSpec((CHUNK, BB, V), rev3),
            pl.BlockSpec((CHUNK, BB, S), rev3),  # daext
        ]
        + [pl.BlockSpec((CHUNK, BB, S), rev3)]
        + [pl.BlockSpec((CHUNK, BB, H), rev3)] * 8
        + [pl.BlockSpec((CHUNK, BB, E), rev3)]
        + [
            pl.BlockSpec(phi.shape, full2),
            pl.BlockSpec(wih1.shape, full2),
            pl.BlockSpec(whh1.shape, full2),
            pl.BlockSpec((1, 4 * H), full2),
            pl.BlockSpec(wih2.shape, full2),
            pl.BlockSpec(whh2.shape, full2),
            pl.BlockSpec((1, 4 * H), full2),
            pl.BlockSpec(ct_w.shape, full2),
        ],
        out_specs=[
            pl.BlockSpec((CHUNK, BB, 4 * H), rev3),  # dgates1
            pl.BlockSpec((CHUNK, BB, 4 * H), rev3),  # dgates2
            pl.BlockSpec((CHUNK, BB, S), rev3),  # de
            pl.BlockSpec((CHUNK, BB, m), rev3),  # dqpre
            pl.BlockSpec((CHUNK, BB, E), rev3),  # demb
        ],
        scratch_shapes=[
            pltpu.VMEM((BB, H), jnp.float32),
            pltpu.VMEM((BB, H), jnp.float32),
            pltpu.VMEM((BB, H), jnp.float32),
            pltpu.VMEM((BB, H), jnp.float32),
        ],
    )
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, lidx=lidx),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Lp, Bp, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((Lp, Bp, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((Lp, Bp, S), jnp.float32),
            jax.ShapeDtypeStruct((Lp, Bp, m), jnp.float32),
            jax.ShapeDtypeStruct((Lp, Bp, E), jnp.float32),
        ],
        interpret=interpret,
    )(
        enc_h, comp_h, lens2d, dlogits, daext,
        a, h1s, c1s, h2s, c2s, h1p, c1p, h2p, c2p, fedp,
        phi, wih1, whh1, b1r, wih2, whh2, b2r, ct_w,
    )
    if Bp != B:
        outs = [o[:, :B] for o in outs]
    return outs


def _run_bwd(enc_h, comp_h, lens2d, dlogits, daext, streams, W, interpret):
    (phi, wih1, whh1, b1, wih2, whh2, b2, ct_w, ct_b, emb) = W
    L = dlogits.shape[0]
    Lp = ((L + CHUNK - 1) // CHUNK) * CHUNK
    padded = tuple(_pad_L(x, Lp) for x in (dlogits, daext) + streams)
    flat = (enc_h, comp_h, lens2d) + padded + (
        phi, wih1, whh1, b1.reshape(1, -1), wih2, whh2, b2.reshape(1, -1), ct_w,
    )
    from ss_asr_tpu.ops import rnn as _rnn

    if _rnn._gspmd_axes_live():
        outs = _spell_cp_bwd(interpret)(*flat)
    else:
        outs = _run_bwd_core(*flat, interpret)
    return tuple(o[:L] for o in outs)


@functools.lru_cache(maxsize=4)
def _spell_cp_fwd(interpret: bool):
    from ss_asr_tpu.ops.pallas.partition import batch_partitioned

    return batch_partitioned(
        functools.partial(_run_fwd_core, interpret=interpret),
        in_batch_dims=[0, 0, 0, None, 1, 1] + [None] * 10,
        out_batch_dims=[1] * 7,
        rule="b s f, b s m, b u, l u, l b v, l b e, h m, x g, h g, u g, "
             "h g, h g, u g, h v, u v, v e -> "
             "l b v, l b s, l b h, l b h, l b h, l b h, l b e",
    )


@functools.lru_cache(maxsize=4)
def _spell_cp_bwd(interpret: bool):
    from ss_asr_tpu.ops.pallas.partition import batch_partitioned

    return batch_partitioned(
        functools.partial(_run_bwd_core, interpret=interpret),
        in_batch_dims=[0, 0, 0] + [1] * 12 + [None] * 8,
        out_batch_dims=[1] * 5,
        rule="b s f, b s m, b u, l b v, l b s, l b s, l b h, l b h, l b h, "
             "l b h, l b h, l b h, l b h, l b h, l b e, h m, x g, h g, u g, "
             "h g, h g, u g, h v -> l b g, l b g, l b s, l b m, l b e",
    )


# ---------------------------------------------------------------------------
# custom VJP glue + public API
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _spell_core(
    interpret, enc_h, comp_h, lens_f, tf_draws, gumbel, teacher_emb,
    phi, wih1, whh1, b1, wih2, whh2, b2, ct_w, ct_b, emb,
):
    W = (phi, wih1, whh1, b1, wih2, whh2, b2, ct_w, ct_b, emb)
    # clamp: all-masked attention rows would NaN (see las.attention_mask)
    lens2d = jnp.maximum(lens_f.astype(jnp.int32), 1).reshape(-1, 1)
    logits, a, *_ = _run_fwd(
        enc_h, comp_h, lens2d, tf_draws, gumbel, teacher_emb, W, interpret
    )
    return logits, a


def _spell_fwd(interpret, enc_h, comp_h, lens_f, tf_draws, gumbel, teacher_emb,
               phi, wih1, whh1, b1, wih2, whh2, b2, ct_w, ct_b, emb):
    W = (phi, wih1, whh1, b1, wih2, whh2, b2, ct_w, ct_b, emb)
    lens2d = jnp.maximum(lens_f.astype(jnp.int32), 1).reshape(-1, 1)
    logits, a, h1s, c1s, h2s, c2s, fed = _run_fwd(
        enc_h, comp_h, lens2d, tf_draws, gumbel, teacher_emb, W, interpret
    )
    res = (enc_h, comp_h, lens_f, tf_draws, gumbel, teacher_emb, W,
           logits, a, h1s, c1s, h2s, c2s, fed)
    return (logits, a), res


def _spell_bwd(interpret, res, cts):
    (enc_h, comp_h, lens_f, tf_draws, gumbel, teacher_emb, W,
     logits, a, h1s, c1s, h2s, c2s, fed) = res
    (phi, wih1, whh1, b1, wih2, whh2, b2, ct_w, ct_b, emb) = W
    dlogits, da_ext = cts  # da_ext: cotangent on the returned attention maps
    L, B, V = dlogits.shape
    H = whh1.shape[0]
    E = emb.shape[1]
    lens2d = jnp.maximum(lens_f.astype(jnp.int32), 1).reshape(-1, 1)

    z = lambda s: jnp.zeros((1,) + s, jnp.float32)  # noqa: E731
    h1p = jnp.concatenate([z((B, H)), h1s[:-1]], axis=0)
    c1p = jnp.concatenate([z((B, H)), c1s[:-1]], axis=0)
    h2p = jnp.concatenate([z((B, H)), h2s[:-1]], axis=0)
    c2p = jnp.concatenate([z((B, H)), c2s[:-1]], axis=0)
    sos_emb = jnp.broadcast_to(emb[SOS_ID][None, None, :], (1, B, E))
    fedp = jnp.concatenate([sos_emb, fed[:-1]], axis=0)

    streams = (a, h1s, c1s, h2s, c2s, h1p, c1p, h2p, c2p, fedp)
    dg1, dg2, de, dqp, demb = _run_bwd(
        enc_h, comp_h, lens2d, dlogits, da_ext.astype(jnp.float32), streams,
        W, interpret
    )

    # ---- weight grads as big batched einsums ----
    ctx = jnp.einsum("tbs,bsf->tbf", a, enc_h)
    x = jnp.concatenate([fedp, ctx], axis=-1)
    d_ct_w = jnp.einsum("tbh,tbv->hv", h2s, dlogits)
    d_ct_b = dlogits.sum((0, 1))
    d_wih2 = jnp.einsum("tbh,tbg->hg", h1s, dg2)
    d_whh2 = jnp.einsum("tbh,tbg->hg", h2p, dg2)
    d_b2 = dg2.sum((0, 1))
    d_wih1 = jnp.einsum("tbx,tbg->xg", x, dg1)
    d_whh1 = jnp.einsum("tbh,tbg->hg", h1p, dg1)
    d_b1 = dg1.sum((0, 1))
    d_phi = jnp.einsum("tbh,tbm->hm", h1p, dqp)

    q = jnp.tanh(jnp.einsum("tbh,hm->tbm", h1p, phi))
    d_comp = jnp.einsum("tbs,tbm->bsm", de, q)
    dx = jnp.einsum("tbg,xg->tbx", dg1, wih1)
    dctx = dx[:, :, E:]
    d_enc = jnp.einsum("tbs,tbf->bsf", a, dctx)

    # ---- feedback-embedding grads ----
    # the embedding fed into step t was: t=0 -> emb[SOS]; t>0 ->
    # teacher_emb[t-1] when tf_draws[t-1] else emb[sampled_ids[t-1]]
    sampled_ids = jnp.argmax(logits + gumbel, axis=-1)  # reproduce fwd draws
    ids_prev = jnp.concatenate(
        [jnp.full((1, B), SOS_ID, dtype=sampled_ids.dtype), sampled_ids[:-1]], axis=0
    )
    tf_prev = jnp.concatenate([jnp.zeros((1,)), tf_draws[:-1]], axis=0)  # [L]
    sampled_sel = (1.0 - tf_prev)[:, None]  # SOS row: tf_prev=0 -> routed to table
    onehot_prev = jax.nn.one_hot(ids_prev, V, dtype=jnp.float32)
    d_emb = jnp.einsum("tbv,tbe->ve", onehot_prev * sampled_sel[:, :, None], demb)
    d_teacher = jnp.concatenate(
        [demb[1:] * tf_draws[:-1, None, None], jnp.zeros((1, B, E))], axis=0
    )

    return (
        d_enc, d_comp, jnp.zeros_like(lens_f), jnp.zeros_like(tf_draws),
        jnp.zeros_like(gumbel), d_teacher,
        d_phi, d_wih1, d_whh1, d_b1, d_wih2, d_whh2, d_b2, d_ct_w, d_ct_b, d_emb,
    )


_spell_core.defvjp(_spell_fwd, _spell_bwd)


def attend_and_spell_pallas(
    params: Dict,
    cfg,
    enc_h: jax.Array,
    enc_lens: jax.Array,
    decode_step: int,
    teacher: jax.Array,
    key: jax.Array,
    tf_rate=None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused-kernel drop-in for ``las.attend_and_spell`` (teacher mode,
    tf_cutoff_last=False).  Identical RNG stream -> identical sampling."""
    from ss_asr_tpu.models import las

    B = enc_h.shape[0]
    tf = cfg.tf_rate if tf_rate is None else tf_rate
    comp_h = las.attention_precompute(params["attention"], enc_h)
    key0 = key if key is not None else jax.random.key(0)
    k_tf, k_g = jax.random.split(key0)
    tf_draws = (jax.random.uniform(k_tf, (decode_step,)) <= tf).astype(jnp.float32)
    gumbel = jax.random.gumbel(k_g, (decode_step, B, cfg.vocab_size))
    teacher_emb = jnp.swapaxes(
        jnp.take(params["embed"]["table"], teacher[:, 1 : decode_step + 1], axis=0),
        0, 1,
    )  # [L, B, E]
    return _spell_call(params, cfg, enc_h, comp_h, enc_lens, tf_draws, gumbel,
                       teacher_emb, interpret)


def attend_and_spell_pallas_greedy(
    params: Dict,
    cfg,
    enc_h: jax.Array,
    enc_lens: jax.Array,
    decode_step: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """No-teacher (free-running) forward through the fused kernel: with zero
    tf draws and zero Gumbel noise, the in-kernel sampler reduces to greedy
    argmax feedback — exactly ``las.attend_and_spell(teacher=None)``.  Used
    by the validation forward (logits + attention maps)."""
    from ss_asr_tpu.models import las

    B = enc_h.shape[0]
    comp_h = las.attention_precompute(params["attention"], enc_h)
    tf_draws = jnp.zeros((decode_step,), jnp.float32)
    gumbel = jnp.zeros((decode_step, B, cfg.vocab_size), jnp.float32)
    teacher_emb = jnp.zeros((decode_step, B, cfg.decoder_state_size), jnp.float32)
    return _spell_call(params, cfg, enc_h, comp_h, enc_lens, tf_draws, gumbel,
                       teacher_emb, interpret)


def _spell_call(params, cfg, enc_h, comp_h, enc_lens, tf_draws, gumbel,
                teacher_emb, interpret):
    d = params["decoder"]
    logits, a = _spell_core(
        interpret,
        enc_h,
        comp_h,
        enc_lens.astype(jnp.float32),
        tf_draws,
        gumbel,
        teacher_emb,
        params["attention"]["phi"]["w"],
        d["layer1"]["w_ih"], d["layer1"]["w_hh"], d["layer1"]["b"],
        d["layer2"]["w_ih"], d["layer2"]["w_hh"], d["layer2"]["b"],
        params["char_trans"]["w"], params["char_trans"]["b"],
        params["embed"]["table"],
    )
    return jnp.swapaxes(logits, 0, 1), jnp.swapaxes(a, 0, 1)
