"""Batched greedy decoding with optional char-LM shallow fusion.

Parity with reference ``ASR.decode`` (src/asr.py:112-173): at each step the
fused score is ``log_softmax(ASR logits) + lm_weight * log_softmax(LM
logits)``; the argmax of the fused score is emitted and fed back; decoding
stops at EOS or after ``max_steps``.

The reference decodes one utterance at a time in Python; here the whole batch
decodes in a single ``lax.scan`` with per-sample done flags, on device.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ss_asr_tpu.models import charlm as charlm_mod
from ss_asr_tpu.models import las
from ss_asr_tpu.ops import rnn
from ss_asr_tpu.vocab import EOS_ID, SOS_ID

#: the public entry points are jitted HERE so every caller (Transcriber,
#: tester, serving) gets the cached executable — an eager call re-traces
#: and dispatches op-by-op on every invocation, which costs ~seconds per
#: call and is what a serving path can least afford. Configs are frozen
#: dataclasses (hashable), so they ride as static args; one executable is
#: cached per (B, T, max_steps, lm on/off, lm_weight, impl-gate state)
#: combination — the ``_salt`` static arg carries ``rnn.impl_salt()`` so
#: flipping the module-level impl knobs (LSTM_IMPL etc.) invalidates the
#: cache instead of silently serving the old implementation.
_jit_decode = functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_steps", "lm_cfg", "lm_weight", "_salt"),
)


def greedy_decode(
    params: Dict,
    cfg: las.ASRConfig,
    x: jax.Array,
    x_lens: jax.Array,
    max_steps: int = 200,
    lm_params: Optional[Dict] = None,
    lm_cfg: Optional[charlm_mod.CharLMConfig] = None,
    lm_weight: float = 0.0,
) -> Tuple[jax.Array, jax.Array]:
    """Decode a batch of utterances.

    Returns ``(tokens [B, max_steps] int32, lengths [B] int32)`` where
    ``lengths`` counts emitted chars *before* EOS (EOS itself and anything
    after are padded with SOS=0, which ``Mapper.translate`` strips).
    """
    return _greedy_decode_jit(
        params, cfg, x, x_lens, max_steps, lm_params, lm_cfg, lm_weight,
        _salt=rnn.impl_salt(),
    )


@_jit_decode
def _greedy_decode_jit(
    params, cfg, x, x_lens, max_steps, lm_params, lm_cfg, lm_weight,
    *, _salt=None,
):
    enc_h, enc_lens = las.listener_apply(params["encoder"], x, x_lens)
    return _fused_decode_jit(
        params, cfg, enc_h, enc_lens, max_steps, lm_params, lm_cfg,
        lm_weight, _salt=_salt,
    )


def fused_decode_from_memory(
    params: Dict,
    cfg: las.ASRConfig,
    enc_h: jax.Array,
    enc_lens: jax.Array,
    max_steps: int,
    lm_params: Optional[Dict] = None,
    lm_cfg: Optional[charlm_mod.CharLMConfig] = None,
    lm_weight: float = 0.0,
) -> Tuple[jax.Array, jax.Array]:
    """Decode from precomputed listener memory (see :func:`greedy_decode`)."""
    return _fused_decode_jit(
        params, cfg, enc_h, enc_lens, max_steps, lm_params, lm_cfg,
        lm_weight, _salt=rnn.impl_salt(),
    )


@_jit_decode
def _fused_decode_jit(
    params: Dict,
    cfg: las.ASRConfig,
    enc_h: jax.Array,
    enc_lens: jax.Array,
    max_steps: int,
    lm_params: Optional[Dict] = None,
    lm_cfg: Optional[charlm_mod.CharLMConfig] = None,
    lm_weight: float = 0.0,
    *,
    _salt=None,
) -> Tuple[jax.Array, jax.Array]:
    B, S, _ = enc_h.shape
    comp_h = las.attention_precompute(params["attention"], enc_h)
    valid = las.attention_mask(enc_lens, S)
    use_lm = lm_params is not None and lm_weight != 0.0

    spell0 = las.speller_init_state(B, cfg)
    lm0 = charlm_mod.init_state(B, lm_cfg) if use_lm else None
    last0 = jnp.full((B,), SOS_ID, dtype=jnp.int32)
    done0 = jnp.zeros((B,), dtype=bool)

    def body(carry, _):
        state, lm_state, last_ids, done = carry
        _, context = las.attention_step(
            params["attention"], comp_h, enc_h, state[0][0], valid
        )
        last_emb = rnn.embed(params["embed"], last_ids)
        dec_in = jnp.concatenate([last_emb, context], axis=-1)
        state, dec_out = las.speller_step(params["decoder"], dec_in, state)
        asr_logp = jax.nn.log_softmax(rnn.linear(params["char_trans"], dec_out))
        if use_lm:
            lm_logits, lm_state = charlm_mod.step(lm_params, last_ids, lm_state)
            fused = asr_logp + lm_weight * jax.nn.log_softmax(lm_logits)
        else:
            fused = asr_logp
        ids = jnp.argmax(fused, axis=-1).astype(jnp.int32)
        emit = jnp.where(done, jnp.int32(SOS_ID), ids)  # pad after finish
        done_next = done | (ids == EOS_ID)
        return (state, lm_state, ids, done_next), emit

    (_, _, _, done), toks = jax.lax.scan(
        body, (spell0, lm0, last0, done0), None, length=max_steps
    )
    toks = jnp.swapaxes(toks, 0, 1)  # [B, max_steps]
    return _finalize(toks, max_steps)


def _finalize(toks: jax.Array, max_steps: int) -> Tuple[jax.Array, jax.Array]:
    # length = chars before the first EOS (EOS excluded, reference returns
    # the string without EOS, src/asr.py:167-173)
    is_eos = toks == EOS_ID
    any_eos = is_eos.any(axis=1)
    first_eos = jnp.argmax(is_eos, axis=1)
    lengths = jnp.where(any_eos, first_eos, max_steps).astype(jnp.int32)
    # replace EOS and everything after with pad(SOS) for clean translate()
    pos = jnp.arange(max_steps)[None, :]
    toks = jnp.where(pos < lengths[:, None], toks, SOS_ID)
    return toks, lengths


def greedy_decode_early_exit(
    params: Dict,
    cfg: las.ASRConfig,
    x: jax.Array,
    x_lens: jax.Array,
    max_steps: int = 200,
    lm_params: Optional[Dict] = None,
    lm_cfg: Optional[charlm_mod.CharLMConfig] = None,
    lm_weight: float = 0.0,
) -> Tuple[jax.Array, jax.Array]:
    """Latency-optimized greedy decode: ``lax.while_loop`` that stops as soon
    as every sample in the batch has emitted EOS (the scan variant always
    runs ``max_steps``).  Same outputs as :func:`greedy_decode`."""
    return _greedy_early_exit_jit(
        params, cfg, x, x_lens, max_steps, lm_params, lm_cfg, lm_weight,
        _salt=rnn.impl_salt(),
    )


@_jit_decode
def _greedy_early_exit_jit(
    params, cfg, x, x_lens, max_steps, lm_params, lm_cfg, lm_weight,
    *, _salt=None,
):
    enc_h, enc_lens = las.listener_apply(params["encoder"], x, x_lens)
    B, S, _ = enc_h.shape
    comp_h = las.attention_precompute(params["attention"], enc_h)
    valid = las.attention_mask(enc_lens, S)
    use_lm = lm_params is not None and lm_weight != 0.0

    spell0 = las.speller_init_state(B, cfg)
    lm0 = charlm_mod.init_state(B, lm_cfg) if use_lm else None
    last0 = jnp.full((B,), SOS_ID, dtype=jnp.int32)
    done0 = jnp.zeros((B,), dtype=bool)
    toks0 = jnp.full((B, max_steps), SOS_ID, dtype=jnp.int32)

    def cond(carry):
        step, _, _, _, done, _ = carry
        return jnp.logical_and(step < max_steps, ~jnp.all(done))

    def body(carry):
        step, state, lm_state, last_ids, done, toks = carry
        _, context = las.attention_step(
            params["attention"], comp_h, enc_h, state[0][0], valid
        )
        last_emb = rnn.embed(params["embed"], last_ids)
        dec_in = jnp.concatenate([last_emb, context], axis=-1)
        state, dec_out = las.speller_step(params["decoder"], dec_in, state)
        fused = jax.nn.log_softmax(rnn.linear(params["char_trans"], dec_out))
        if use_lm:
            lm_logits, lm_state = charlm_mod.step(lm_params, last_ids, lm_state)
            fused = fused + lm_weight * jax.nn.log_softmax(lm_logits)
        ids = jnp.argmax(fused, axis=-1).astype(jnp.int32)
        emit = jnp.where(done, jnp.int32(SOS_ID), ids)
        toks = jax.lax.dynamic_update_slice(toks, emit[:, None], (0, step))
        done = done | (ids == EOS_ID)
        return (step + 1, state, lm_state, ids, done, toks)

    _, _, _, _, _, toks = jax.lax.while_loop(
        cond, body, (jnp.int32(0), spell0, lm0, last0, done0, toks0)
    )
    return _finalize(toks, max_steps)
