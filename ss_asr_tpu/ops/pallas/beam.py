"""Pallas TPU kernel: fused beam-search attend-and-spell decode loop.

The whole beam frontier advances inside ONE kernel: per-beam attention
reads, both speller LSTM cells, the output projection, optional char-LM
shallow fusion, the K-way frontier top-k, and the parent-indexed state
regather all stay in VMEM for every step.  The XLA beam scan
(``decode/beam.py::_beam_scan``) pays per-step fusion/dispatch overhead on
the serialized decode path; here a step is K small MXU matmuls plus VPU
reductions on resident data — the same design that took greedy decode to
0.75 ms/utt (``ops/pallas/decode.py``), extended to the serving-quality
beam mode (thesis Table 6.12 decodes with beam-8 + LM fusion; reference
fusion rule src/asr.py:143-173).

Design notes (TPU-shaped):

* states live BEAM-MAJOR — ``(K, B, ·)`` scratch — so per-beam rows are
  static leading-index slices (``ref[k]``), never strided gathers;
* the frontier top-k over the ``K*V`` candidate set is K iterations of
  (per-beam argmax -> cross-beam argmax -> mask winner), which reproduces
  ``lax.top_k``'s flat-index tie-breaking exactly (lower k, then lower v);
* the parent regather is a K^2 select-accumulate over ``[B, ·]`` tiles
  (dynamic row gathers lower poorly on TPU; K=8 makes the dense form
  ~3 M VPU ops/step — noise);
* fixed trip count (``max_steps`` grid) — a Pallas grid cannot early-exit;
  serving callers pick ``max_steps`` by expected transcript length, the
  honest A/B vs the XLA early-exit path is in bench.py decode_throughput;
* the still-open beams' terminal EOS charge (``_beam_scan``'s post-loop
  force-terminate) runs in-kernel at the last grid step, so the returned
  scores are final and the host backtrack is shared with the XLA path.

Numerically identical to ``_beam_scan(early_exit=False)`` + its EOS charge
in interpret mode (tokens/parents/scores exact — tests/test_pallas_beam.py).
On real TPU the two paths order their matmuls differently under the
hardware's single-pass-bf16 f32 precision, so RANDOM-weight decodes can
flip near-tie frontier choices (measured: 3/1920 tokens at flagship, 0 at
tiny); trained checkpoints separate their decisions and agree at the
transcript level (docs/BEAM_KERNEL_PARITY.json: 32/32 identical
transcripts, with and without LM fusion).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ss_asr_tpu.models import charlm as charlm_mod
from ss_asr_tpu.models import las
from ss_asr_tpu.vocab import EOS_ID, SOS_ID

NEG_INF = -1e30


def _log_softmax(v):
    m = jnp.max(v, axis=-1, keepdims=True)
    e = jnp.exp(v - m)
    return (v - m) - jnp.log(jnp.sum(e, axis=-1, keepdims=True))


def _gru_step(x, h, wih_ref, whh_ref, bih_ref, bhh_ref):
    H = h.shape[-1]
    gi = jnp.dot(x, wih_ref[:], preferred_element_type=jnp.float32) + bih_ref[0]
    gh = jnp.dot(h, whh_ref[:], preferred_element_type=jnp.float32) + bhh_ref[0]
    r = jax.nn.sigmoid(gi[:, :H] + gh[:, :H])
    z = jax.nn.sigmoid(gi[:, H : 2 * H] + gh[:, H : 2 * H])
    n = jnp.tanh(gi[:, 2 * H :] + r * gh[:, 2 * H :])
    return (1.0 - z) * n + z * h


def _make_kernel(K: int, use_lm: bool):
    """Kernel body closure; the ref list depends statically on ``use_lm``."""

    def kernel(*refs):
        (enc_ref, comp_ref, len_ref, lmw_ref,
         phi_ref, wih1_ref, whh1_ref, b1_ref, wih2_ref, whh2_ref, b2_ref,
         ct_w_ref, ct_b_ref, emb_ref) = refs[:14]
        i = 14
        if use_lm:
            (lm_emb_ref, g1_wih_ref, g1_whh_ref, g1_bih_ref, g1_bhh_ref,
             g2_wih_ref, g2_whh_ref, g2_bih_ref, g2_bhh_ref,
             lm_w_ref, lm_b_ref) = refs[i : i + 11]
            i += 11
        (toks_ref, par_ref, scores_out_ref, done_out_ref, hyp_out_ref) = (
            refs[i : i + 5])
        i += 5
        (h1_ref, c1_ref, h2_ref, c2_ref, lastoh_ref,
         scores_ref, done_ref, hyp_ref) = refs[i : i + 8]
        i += 8
        if use_lm:
            lmh1_ref, lmh2_ref = refs[i : i + 2]

        t = pl.program_id(0)
        T_out = toks_ref.shape[0]
        B, S, F = enc_ref.shape
        H = h1_ref.shape[-1]
        V = ct_w_ref.shape[-1]

        @pl.when(t == 0)
        def _():
            h1_ref[:] = jnp.zeros_like(h1_ref)
            c1_ref[:] = jnp.zeros_like(c1_ref)
            h2_ref[:] = jnp.zeros_like(h2_ref)
            c2_ref[:] = jnp.zeros_like(c2_ref)
            if use_lm:
                lmh1_ref[:] = jnp.zeros_like(lmh1_ref)
                lmh2_ref[:] = jnp.zeros_like(lmh2_ref)
            oh0 = (jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
                   == SOS_ID).astype(jnp.float32)
            lastoh_ref[:] = jnp.broadcast_to(oh0[None], lastoh_ref.shape)
            # only beam 0 live at t=0 (XLA path's scores0)
            beam_col = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)
            scores_ref[:] = jnp.where(beam_col == 0, 0.0, NEG_INF)
            done_ref[:] = jnp.zeros_like(done_ref)
            hyp_ref[:] = jnp.zeros_like(hyp_ref)

        pos = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
        att_valid = pos < len_ref[:, 0][:, None]
        iota_v = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
        pad_row = jnp.where(iota_v == SOS_ID, 0.0, NEG_INF)  # frozen-beam row

        def beam_forward(k):
            """Attention + speller (+ LM) for beam k: returns the fused
            log-prob row [B, V] and the beam's updated states."""
            h1 = h1_ref[k]
            q = jnp.tanh(
                jnp.dot(h1, phi_ref[:], preferred_element_type=jnp.float32))
            energy = jnp.sum(comp_ref[:] * q[:, None, :], axis=-1)
            energy = jnp.where(att_valid, energy, -jnp.inf)
            energy = energy - jnp.max(energy, axis=-1, keepdims=True)
            w = jnp.exp(energy)
            att = w / jnp.sum(w, axis=-1, keepdims=True)
            context = jnp.sum(enc_ref[:] * att[:, :, None], axis=1)

            last_emb = jnp.dot(lastoh_ref[k], emb_ref[:],
                               preferred_element_type=jnp.float32)
            dec_in = jnp.concatenate([last_emb, context], axis=-1)
            gates1 = (
                jnp.dot(dec_in, wih1_ref[:],
                        preferred_element_type=jnp.float32)
                + jnp.dot(h1, whh1_ref[:],
                          preferred_element_type=jnp.float32)
                + b1_ref[0]
            )
            i1 = jax.nn.sigmoid(gates1[:, :H])
            f1 = jax.nn.sigmoid(gates1[:, H : 2 * H])
            g1 = jnp.tanh(gates1[:, 2 * H : 3 * H])
            o1 = jax.nn.sigmoid(gates1[:, 3 * H :])
            c1 = f1 * c1_ref[k] + i1 * g1
            h1n = o1 * jnp.tanh(c1)
            gates2 = (
                jnp.dot(h1n, wih2_ref[:],
                        preferred_element_type=jnp.float32)
                + jnp.dot(h2_ref[k], whh2_ref[:],
                          preferred_element_type=jnp.float32)
                + b2_ref[0]
            )
            i2 = jax.nn.sigmoid(gates2[:, :H])
            f2 = jax.nn.sigmoid(gates2[:, H : 2 * H])
            g2 = jnp.tanh(gates2[:, 2 * H : 3 * H])
            o2 = jax.nn.sigmoid(gates2[:, 3 * H :])
            c2 = f2 * c2_ref[k] + i2 * g2
            h2n = o2 * jnp.tanh(c2)
            logp = _log_softmax(
                jnp.dot(h2n, ct_w_ref[:], preferred_element_type=jnp.float32)
                + ct_b_ref[0])
            if use_lm:
                lm_x = jnp.dot(lastoh_ref[k], lm_emb_ref[:],
                               preferred_element_type=jnp.float32)
                lmh1 = _gru_step(lm_x, lmh1_ref[k], g1_wih_ref, g1_whh_ref,
                                 g1_bih_ref, g1_bhh_ref)
                lmh2 = _gru_step(lmh1, lmh2_ref[k], g2_wih_ref, g2_whh_ref,
                                 g2_bih_ref, g2_bhh_ref)
                lm_logits = (jnp.dot(lmh2, lm_w_ref[:],
                                     preferred_element_type=jnp.float32)
                             + lm_b_ref[0])
                logp = logp + lmw_ref[0, 0] * _log_softmax(lm_logits)
                return logp, (h1n, c1, h2n, c2, lmh1, lmh2)
            return logp, (h1n, c1, h2n, c2)

        # predicated early exit (see ops/pallas/decode.py): once every
        # (sample, beam) is frozen the XLA fixed-trip scan provably writes
        # token=pad / parent=identity rows and leaves scores/done/hyp
        # unchanged (pad extends at zero cost on an already-sorted
        # frontier), so all-done steps skip the whole frontier body
        row3 = jax.lax.broadcasted_iota(jnp.int32, (T_out, B, K), 0)
        alive = jnp.min(done_ref[:]) == 0
        iota_k = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)

        @pl.when(jnp.logical_not(alive))
        def _():
            beam_ids = jax.lax.broadcasted_iota(jnp.int32, (T_out, B, K), 2)
            toks_ref[:] = jnp.where(row3 == t, jnp.int32(SOS_ID),
                                    toks_ref[:])
            par_ref[:] = jnp.where(row3 == t, beam_ids, par_ref[:])

        @pl.when(alive)
        def full_step():
            done = done_ref[:]  # [B, K] int32
            scores = scores_ref[:]
            cand, new_states = [], []
            for k in range(K):
                logp_k, st_k = beam_forward(k)
                # frozen beams may only emit pad at no cost (XLA pad_onehot)
                logp_k = jnp.where(done[:, k : k + 1] != 0, pad_row, logp_k)
                cand.append(scores[:, k : k + 1] + logp_k)
                new_states.append(st_k)

            # --- frontier top-K: K iterations of masked global argmax ------
            par_cols, tok_cols, sc_cols = [], [], []
            for _ in range(K):
                vmax = jnp.concatenate(
                    [jnp.max(cand[k], axis=-1, keepdims=True) for k in range(K)],
                    axis=-1)  # [B, K]
                vidx = jnp.concatenate(
                    [jnp.argmax(cand[k], axis=-1).astype(jnp.int32)[:, None]
                     for k in range(K)], axis=-1)  # [B, K]
                kstar = jnp.argmax(vmax, axis=-1).astype(jnp.int32)  # [B]
                sstar = jnp.max(vmax, axis=-1)  # [B]
                vstar = jnp.sum(
                    jnp.where(iota_k == kstar[:, None], vidx, 0), axis=-1)  # [B]
                par_cols.append(kstar[:, None])
                tok_cols.append(vstar[:, None])
                sc_cols.append(sstar[:, None])
                for k in range(K):
                    hit = ((kstar[:, None] == k)
                           & (iota_v[:, : cand[k].shape[-1]] == vstar[:, None]))
                    cand[k] = jnp.where(hit, NEG_INF, cand[k])
            parent = jnp.concatenate(par_cols, axis=-1)  # [B, K]
            token = jnp.concatenate(tok_cols, axis=-1)  # [B, K]
            new_scores = jnp.concatenate(sc_cols, axis=-1)  # [B, K]

            # --- bookkeeping (matches frontier_step exactly) -------------------
            def sel_cols(mat, parent):
                """[B, K] gathered by parent: out[:, j] = mat[b, parent[b, j]]."""
                cols = []
                for j in range(K):
                    pj = parent[:, j : j + 1]
                    cols.append(jnp.sum(
                        jnp.where(iota_k == pj, mat, 0), axis=-1, keepdims=True))
                return jnp.concatenate(cols, axis=-1)

            parent_done = sel_cols(done, parent)
            done_new = jnp.where(
                (parent_done != 0) | (token == EOS_ID), 1, 0).astype(jnp.int32)
            grew = jnp.where((parent_done != 0) | (token == EOS_ID), 0, 1)
            hyp_new = sel_cols(hyp_ref[:], parent) + grew

            # --- state regather: dense K^2 select-accumulate --------------------
            n_state = 6 if use_lm else 4
            for j in range(K):
                pj = parent[:, j : j + 1]  # [B, 1]
                acc = [jnp.zeros_like(new_states[0][s]) for s in range(n_state)]
                for k in range(K):
                    m = (pj == k).astype(jnp.float32)
                    for s in range(n_state):
                        acc[s] = acc[s] + m * new_states[k][s]
                # feedback one-hot of the beam's new token
                tj = token[:, j][:, None]
                ohj = (iota_v == tj).astype(jnp.float32)
                # defer ref writes until all beams' gathers are computed? not
                # needed: acc reads new_states (locals), not the refs
                h1_ref[j], c1_ref[j] = acc[0], acc[1]
                h2_ref[j], c2_ref[j] = acc[2], acc[3]
                if use_lm:
                    lmh1_ref[j], lmh2_ref[j] = acc[4], acc[5]
                lastoh_ref[j] = ohj

            scores_ref[:] = new_scores
            done_ref[:] = done_new
            hyp_ref[:] = hyp_new

            # --- trace write ----------------------------------------------------
            toks_ref[:] = jnp.where(row3 == t, token[None], toks_ref[:])
            par_ref[:] = jnp.where(row3 == t, parent[None], par_ref[:])

        # --- final step: still-open beams pay their terminal EOS cost -------
        @pl.when(t == T_out - 1)
        def _():
            eos_cols = []
            for k in range(K):
                logp_k, _ = beam_forward(k)
                eos_cols.append(logp_k[:, EOS_ID][:, None])
            eos_lp = jnp.concatenate(eos_cols, axis=-1)  # [B, K]
            final_scores = jnp.where(
                done_ref[:] != 0, scores_ref[:], scores_ref[:] + eos_lp)
            scores_out_ref[:] = final_scores
            done_out_ref[:] = done_ref[:]
            hyp_out_ref[:] = hyp_ref[:]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("K", "max_steps", "use_lm", "interpret"))
def _beam_pallas(enc_h, comp_h, enc_lens, weights, lm_weights, lm_weight,
                 K, max_steps, use_lm, interpret):
    B, S, F = enc_h.shape
    (phi, wih1, whh1, b1, wih2, whh2, b2, ct_w, ct_b, emb) = weights
    H = whh1.shape[0]
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
    ]
    args = [enc_h, comp_h, lengths2d, lmw2d,
            phi, wih1, whh1, b1.reshape(1, -1), wih2, whh2, b2.reshape(1, -1),
            ct_w, ct_b.reshape(1, -1), emb]
    Hl = 0
    if use_lm:
        (lm_emb, g1_wih, g1_whh, g1_bih, g1_bhh,
         g2_wih, g2_whh, g2_bih, g2_bhh, lm_w, lm_b) = lm_weights
        Hl = g1_whh.shape[0]
        specs += [
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
        args += [lm_emb, g1_wih, g1_whh, g1_bih.reshape(1, -1),
                 g1_bhh.reshape(1, -1), g2_wih, g2_whh,
                 g2_bih.reshape(1, -1), g2_bhh.reshape(1, -1),
                 lm_w, lm_b.reshape(1, -1)]

    scratch = [
        pltpu.VMEM((K, B, H), jnp.float32),  # h1
        pltpu.VMEM((K, B, H), jnp.float32),  # c1
        pltpu.VMEM((K, B, H), jnp.float32),  # h2
        pltpu.VMEM((K, B, H), jnp.float32),  # c2
        pltpu.VMEM((K, B, V), jnp.float32),  # last-token one-hots
        pltpu.VMEM((B, K), jnp.float32),  # scores
        pltpu.VMEM((B, K), jnp.int32),  # done
        pltpu.VMEM((B, K), jnp.int32),  # hyp lengths
    ]
    if use_lm:
        scratch += [pltpu.VMEM((K, B, Hl), jnp.float32),
                    pltpu.VMEM((K, B, Hl), jnp.float32)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(max_steps,),
        in_specs=specs,
        out_specs=[
            pl.BlockSpec((max_steps, B, K), lambda t: (0, 0, 0)),
            pl.BlockSpec((max_steps, B, K), lambda t: (0, 0, 0)),
            pl.BlockSpec((B, K), fixed),
            pl.BlockSpec((B, K), fixed),
            pl.BlockSpec((B, K), fixed),
        ],
        scratch_shapes=scratch,
    )
    toks, parents, scores, done, hyp_len = pl.pallas_call(
        _make_kernel(K, use_lm),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((max_steps, B, K), jnp.int32),
            jax.ShapeDtypeStruct((max_steps, B, K), jnp.int32),
            jax.ShapeDtypeStruct((B, K), jnp.float32),
            jax.ShapeDtypeStruct((B, K), jnp.int32),
            jax.ShapeDtypeStruct((B, K), jnp.int32),
        ],
        interpret=interpret,
    )(*args)
    return toks, parents, scores, done != 0, hyp_len


def beam_device_pallas(
    params: Dict,
    cfg: las.ASRConfig,
    x: jax.Array,
    x_lens: jax.Array,
    beam_size: int = 8,
    max_steps: int = 200,
    lm_params: Optional[Dict] = None,
    lm_cfg: Optional[charlm_mod.CharLMConfig] = None,
    lm_weight: float = 0.0,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Fused-kernel analogue of ``decode.beam._beam_device`` (fixed trip):
    returns ``(toks [T,B,K], parents [T,B,K], final_scores, final_done,
    hyp_lens)`` for the shared host backtrack. Jitted whole (listener +
    precompute + kernel)."""
    from ss_asr_tpu.ops import rnn

    if lm_weight == 0.0:  # static here (python float); inside jit it traces
        lm_params = None
    # the K-beam frontier holds encoder memory + speller/LM weights + all
    # beam states VMEM-resident: past ~B=32 flagship that brushes the 16 MB
    # scoped default, so attach the raised limit on TPU (measured
    # neutral-to-better for legal shapes, docs/PERF.md round 3) — but only
    # at top level: compiler_options is rejected on a jit inlined into an
    # outer trace, so composed callers get the plain jit and raise the
    # limit on their own outer program when their shapes need it
    fn = (_beam_device_pallas_jit_raised
          if jax.default_backend() == "tpu" and rnn.top_level_call()
          else _beam_device_pallas_jit)
    return fn(
        params, cfg, x, x_lens, beam_size, max_steps, lm_params, lm_weight,
        interpret, _salt=rnn.impl_salt())


def _beam_device_impl(params, cfg, x, x_lens, K, max_steps, lm_params,
                      lm_weight, interpret, *, _salt=None):
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
    use_lm = lm_params is not None
    lm_weights = None
    if use_lm:
        lm_weights = (
            lm_params["emb"]["table"],
            lm_params["gru1"]["w_ih"], lm_params["gru1"]["w_hh"],
            lm_params["gru1"]["b_ih"], lm_params["gru1"]["b_hh"],
            lm_params["gru2"]["w_ih"], lm_params["gru2"]["w_hh"],
            lm_params["gru2"]["b_ih"], lm_params["gru2"]["b_hh"],
            lm_params["out"]["w"], lm_params["out"]["b"],
        )
    return _beam_pallas(enc_h, comp_h, enc_lens, weights, lm_weights,
                        lm_weight, K, max_steps, use_lm, interpret)


_BEAM_STATICS = ("cfg", "K", "max_steps", "interpret", "_salt")
_beam_device_pallas_jit = jax.jit(
    _beam_device_impl, static_argnames=_BEAM_STATICS)
_beam_device_pallas_jit_raised = jax.jit(
    _beam_device_impl, static_argnames=_BEAM_STATICS,
    compiler_options={"xla_tpu_scoped_vmem_limit_kib": "32768"})


def beam_decode_pallas(
    params: Dict,
    cfg: las.ASRConfig,
    x: jax.Array,
    x_lens: jax.Array,
    beam_size: int = 8,
    max_steps: int = 200,
    lm_params: Optional[Dict] = None,
    lm_cfg: Optional[charlm_mod.CharLMConfig] = None,
    lm_weight: float = 0.0,
    length_norm: bool = False,
    interpret: bool = False,
):
    """Drop-in fused-kernel counterpart of ``decode.beam.beam_decode``
    (fixed-trip; see module docstring). Same host backtrack."""
    import numpy as np

    from ss_asr_tpu.decode.beam import _backtrack

    toks, parents, scores, done, hyp_lens = beam_device_pallas(
        params, cfg, x, x_lens, beam_size, max_steps, lm_params, lm_cfg,
        lm_weight, interpret=interpret)
    scores = np.asarray(scores)
    if length_norm:
        scores = scores / np.maximum(np.asarray(hyp_lens), 1)
    return _backtrack(np.asarray(toks), np.asarray(parents), scores,
                      np.asarray(done), max_steps)
