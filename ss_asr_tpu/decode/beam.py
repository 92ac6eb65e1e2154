"""Batched beam-search decoding with char-LM shallow fusion.

The reference plumbs ``decode_beam_size`` / ``Hypothesis`` but ships only
greedy decoding (its defect #1 and the TODO at src/trainer.py:590); the
thesis' best results use beam-8 with LM fusion (Table 6.12).  This module
restores that capability, TPU-native:

* the whole (batch x beam) frontier advances in one ``lax.scan`` — states are
  laid out [B*K, ...] so the attention/speller matmuls stay batched on the
  MXU;
* per-step fused scores are ``log_softmax(ASR) + lm_weight*log_softmax(LM)``,
  exactly the greedy fusion rule (src/asr.py:153-156) generalized to K
  hypotheses;
* finished beams are frozen by forcing probability mass onto the pad symbol;
* the backtrack over (parent, token) pointers happens on host (tiny arrays).

No length normalization (pure sum of log-probs), matching the plain beam
semantics the reference intended.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ss_asr_tpu.models import charlm as charlm_mod
from ss_asr_tpu.models import las
from ss_asr_tpu.ops import rnn
from ss_asr_tpu.vocab import EOS_ID, SOS_ID

NEG_INF = -1e30


def beam_decode(
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
    early_exit: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (tokens [B, max_steps] int32 pad-filled, lengths [B]).

    ``length_norm`` selects the final hypothesis by score / length instead of
    raw log-prob sum — counters the short-hypothesis bias of un-normalized
    beam scores (the Google-NMT-style simple normalization).

    ``early_exit`` (default) stops the frontier as soon as every beam of
    every sample has emitted EOS instead of always running ``max_steps`` —
    identical results (frozen beams extend on zero-cost pads, so later
    steps cannot reorder the frontier; test_beam.py pins the parity), a
    fraction of the steps at serving time."""
    toks, parents, final_scores, final_done, hyp_lens = _beam_device(
        params, cfg, x, x_lens, beam_size, max_steps, lm_params, lm_cfg,
        lm_weight, early_exit=early_exit, _salt=rnn.impl_salt(),
    )
    scores = np.asarray(final_scores)
    if length_norm:
        scores = scores / np.maximum(np.asarray(hyp_lens), 1)
    return _backtrack(
        np.asarray(toks), np.asarray(parents), scores,
        np.asarray(final_done), max_steps,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "K", "max_steps", "lm_cfg", "lm_weight",
                     "early_exit", "_salt"),
)
def _beam_device(params, cfg, x, x_lens, K, max_steps, lm_params, lm_cfg,
                 lm_weight, *, early_exit=False, _salt=None):
    """Listener + beam frontier scan as ONE cached executable — an eager
    call here would re-trace and dispatch op-by-op per request (see
    decode/greedy.py on why the entry points jit at the source and why
    ``_salt`` carries the impl-gate state)."""
    enc_h, enc_lens = las.listener_apply(params["encoder"], x, x_lens)
    return _beam_scan(
        params, cfg, enc_h, enc_lens, K, max_steps, lm_params, lm_cfg,
        lm_weight, early_exit=early_exit, _salt=_salt,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "K", "max_steps", "lm_cfg", "lm_weight",
                     "early_exit", "_salt"),
)
def _beam_scan(
    params, cfg, enc_h, enc_lens, K, max_steps, lm_params, lm_cfg, lm_weight,
    *, early_exit=False, _salt=None,
):
    B, S, F = enc_h.shape
    use_lm = lm_params is not None and lm_weight != 0.0
    V = cfg.vocab_size

    comp_h = las.attention_precompute(params["attention"], enc_h)
    valid = las.attention_mask(enc_lens, S)
    # tile encoder memory across beams: [B*K, ...]
    rep = lambda a: jnp.repeat(a, K, axis=0)
    enc_hK, comp_hK, validK = rep(enc_h), rep(comp_h), rep(valid)

    spell0 = las.speller_init_state(B * K, cfg)
    lm0 = charlm_mod.init_state(B * K, lm_cfg) if use_lm else None
    last0 = jnp.full((B * K,), SOS_ID, dtype=jnp.int32)
    scores0 = jnp.tile(
        jnp.array([0.0] + [NEG_INF] * (K - 1), dtype=jnp.float32), (B, 1)
    )  # only beam 0 live at t=0
    done0 = jnp.zeros((B, K), dtype=bool)

    pad_onehot = jnp.full((V,), NEG_INF).at[SOS_ID].set(0.0)

    def gather_beams(tree, parent):
        """Reindex a [B*K, ...] state tree by parent beam ids [B, K]."""
        flat_idx = (jnp.arange(B)[:, None] * K + parent).reshape(-1)  # [B*K]
        return jax.tree.map(lambda a: a[flat_idx], tree)

    hyplen0 = jnp.zeros((B, K), dtype=jnp.int32)

    def frontier_step(state, lm_state, last_ids, scores, done, hyp_len):
        """One beam-frontier advance; shared by the fixed-length scan and
        the early-exit while_loop (they must stay step-identical)."""
        _, context = las.attention_step(
            params["attention"], comp_hK, enc_hK, state[0][0], validK
        )
        last_emb = rnn.embed(params["embed"], last_ids)
        dec_in = jnp.concatenate([last_emb, context], axis=-1)
        state_new, dec_out = las.speller_step(params["decoder"], dec_in, state)
        logp = jax.nn.log_softmax(rnn.linear(params["char_trans"], dec_out))
        if use_lm:
            lm_logits, lm_state_new = charlm_mod.step(lm_params, last_ids, lm_state)
            logp = logp + lm_weight * jax.nn.log_softmax(lm_logits)
        else:
            lm_state_new = lm_state
        logp = logp.reshape(B, K, V)
        # frozen beams may only emit pad at no cost
        logp = jnp.where(done[:, :, None], pad_onehot[None, None, :], logp)

        cand = scores[:, :, None] + logp  # [B, K, V]
        top_scores, top_idx = jax.lax.top_k(cand.reshape(B, K * V), K)
        parent = (top_idx // V).astype(jnp.int32)  # [B, K]
        token = (top_idx % V).astype(jnp.int32)  # [B, K]

        state_new = gather_beams(state_new, parent)
        lm_state_new = gather_beams(lm_state_new, parent) if use_lm else lm_state_new
        parent_done = jnp.take_along_axis(done, parent, axis=1)
        done_new = parent_done | (token == EOS_ID)
        # hypothesis length: emitted chars, EOS excluded (it terminates the
        # hypothesis, it isn't part of it) — keeps length normalization from
        # counting the stop symbol
        hyp_new = jnp.take_along_axis(hyp_len, parent, axis=1) + jnp.where(
            parent_done | (token == EOS_ID), 0, 1
        )
        last_new = token.reshape(-1)
        return (state_new, lm_state_new, last_new, top_scores, done_new,
                hyp_new, token, parent)

    init = (spell0, lm0, last0, scores0, done0, hyplen0)
    if early_exit:
        # stop as soon as every (sample, beam) is frozen: the trace buffers
        # are preallocated with IDENTITY parents (so the backtrack's pointer
        # chase through unwritten steps preserves each beam's lineage) and
        # pad tokens (trimmed after the first EOS, like frozen-beam pads)
        toks0 = jnp.full((max_steps, B, K), SOS_ID, dtype=jnp.int32)
        parents0 = jnp.broadcast_to(
            jnp.arange(K, dtype=jnp.int32)[None, None, :], (max_steps, B, K)
        )

        def cond(c):
            step, _, _, _, _, done, _, _, _ = c
            return jnp.logical_and(step < max_steps, ~jnp.all(done))

        def wbody(c):
            step, state, lm_state, last_ids, scores, done, hyp_len, tb, pb = c
            (state, lm_state, last_ids, scores, done, hyp_len, token,
             parent) = frontier_step(state, lm_state, last_ids, scores,
                                     done, hyp_len)
            tb = jax.lax.dynamic_update_slice(tb, token[None], (step, 0, 0))
            pb = jax.lax.dynamic_update_slice(pb, parent[None], (step, 0, 0))
            return (step + 1, state, lm_state, last_ids, scores, done,
                    hyp_len, tb, pb)

        (_, state, lm_state, last_ids, scores, done, hyp_len, toks,
         parents) = jax.lax.while_loop(
            cond, wbody, (jnp.int32(0), *init, toks0, parents0)
        )
    else:
        def body(carry, _):
            (state, lm_state, last_ids, scores, done, hyp_len, token,
             parent) = frontier_step(*carry)
            return (state, lm_state, last_ids, scores, done, hyp_len), (
                token, parent)

        (state, lm_state, last_ids, scores, done, hyp_len), (toks, parents) = \
            jax.lax.scan(body, init, None, length=max_steps)

    # Force-terminate still-open beams: charge them the real cost of emitting
    # EOS from their final state, so un-finished hypotheses compete fairly
    # with finished ones instead of dodging the stop penalty.
    _, context = las.attention_step(
        params["attention"], comp_hK, enc_hK, state[0][0], validK
    )
    dec_in = jnp.concatenate([rnn.embed(params["embed"], last_ids), context], axis=-1)
    _, dec_out = las.speller_step(params["decoder"], dec_in, state)
    logp = jax.nn.log_softmax(rnn.linear(params["char_trans"], dec_out))
    if use_lm:
        lm_logits, _ = charlm_mod.step(lm_params, last_ids, lm_state)
        logp = logp + lm_weight * jax.nn.log_softmax(lm_logits)
    eos_lp = logp.reshape(B, K, V)[:, :, EOS_ID]
    scores = jnp.where(done, scores, scores + eos_lp)

    return toks, parents, scores, done, hyp_len  # toks/parents: [T, B, K]


def beam_decode_nbest(
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
    early_exit: bool = True,
    n_best: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """The full frontier, not just the winner — for rescoring pipelines.

    Returns ``(tokens [B, n, max_steps], lengths [B, n], scores [B, n])``
    with ``n = min(n_best or beam_size, beam_size)`` hypotheses per sample
    sorted by descending (optionally length-normalized) score.  Same device
    program as ``beam_decode`` (one cached executable); only the host-side
    backtrack widens.
    """
    if n_best is not None and n_best < 1:
        raise ValueError(f"n_best must be >= 1, got {n_best}")
    n = beam_size if n_best is None else min(n_best, beam_size)
    toks, parents, final_scores, final_done, hyp_lens = _beam_device(
        params, cfg, x, x_lens, beam_size, max_steps, lm_params, lm_cfg,
        lm_weight, early_exit=early_exit, _salt=rnn.impl_salt(),
    )
    scores = np.asarray(final_scores)
    if length_norm:
        scores = scores / np.maximum(np.asarray(hyp_lens), 1)
    toks, parents = np.asarray(toks), np.asarray(parents)
    T, B, K = toks.shape
    out = np.zeros((B, n, max_steps), dtype=np.int32)
    lengths = np.zeros((B, n), dtype=np.int32)
    out_scores = np.zeros((B, n), dtype=np.float32)
    for b in range(B):
        order = np.argsort(-scores[b])[:n]
        for j, k0 in enumerate(order):
            k = int(k0)
            seq = []
            for t in range(T - 1, -1, -1):
                seq.append(int(toks[t, b, k]))
                k = int(parents[t, b, k])
            seq.reverse()
            clean = []
            for c in seq:
                if c == EOS_ID:
                    break
                clean.append(c)
            lengths[b, j] = len(clean)
            out[b, j, : len(clean)] = clean
            out_scores[b, j] = scores[b, k0]
    return out, lengths, out_scores


def _backtrack(toks, parents, final_scores, final_done, max_steps):
    """Host-side pointer chase: pick best beam per sample, rebuild tokens."""
    T, B, K = toks.shape
    out = np.zeros((B, max_steps), dtype=np.int32)
    lengths = np.zeros((B,), dtype=np.int32)
    for b in range(B):
        # pure max-logp selection (finished beams already paid their EOS cost
        # and extend for free on pad, so higher score == better hypothesis)
        k = int(np.argmax(final_scores[b]))
        seq = []
        for t in range(T - 1, -1, -1):
            seq.append(int(toks[t, b, k]))
            k = int(parents[t, b, k])
        seq.reverse()
        # trim at first EOS (frozen-beam pads only ever occur after it)
        clean = []
        for c in seq:
            if c == EOS_ID:
                break
            clean.append(c)
        lengths[b] = len(clean)
        out[b, : len(clean)] = clean
    return out, lengths
