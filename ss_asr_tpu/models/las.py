"""Listen-Attend-Spell as pure functions over one parameter pytree.

Architecture parity with the reference ASR (src/asr.py):

* Listener: 3x pyramidal BiLSTM (each halves time, doubles features by frame
  concat) + 1 plain BiLSTM -> [B, T/8, 2*state] (src/asr.py:214-264).
  NOTE: the reference's 4th LSTM omits ``batch_first`` and therefore runs its
  recurrence over the *batch* axis (src/asr.py:237) — an evident defect; we
  run it over time, mask-aware, as intended.
* Attention: softmax(tanh(phi(dec_state)) . tanh(psi(h))) with an additive
  -inf mask over padded encoder states; psi(h) computed once per utterance
  (src/asr.py:328-392).
* Speller: 2 stacked LSTM cells stepped per output char; attention queries the
  *first* layer's hidden state; output is the second layer's hidden state
  (src/asr.py:266-326).
* Per-step scheduled sampling: one Bernoulli(tf_rate) draw per decode step
  shared across the batch; the alternative branch samples from the model's own
  softmax (src/asr.py:92-100).

TPU-first design: the whole decode loop is a single ``lax.scan`` with static
step count; scheduled sampling and categorical sampling thread a PRNG key
through the carry, so the entire train step jits to one XLA program.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ss_asr_tpu.ops import rnn
from ss_asr_tpu.vocab import SOS_ID, VOCAB_SIZE

Params = Dict


@dataclasses.dataclass(frozen=True)
class ASRConfig:
    """Model hyperparameters (conf/default.yaml asr.mdl section)."""

    vocab_size: int = VOCAB_SIZE
    encoder_state_size: int = 256
    decoder_state_size: int = 256
    mlp_out_size: int = 128
    feature_dim: int = 40
    tf_rate: float = 0.9

    @property
    def enc_out_dim(self) -> int:
        return 2 * self.encoder_state_size

    @classmethod
    def from_dict(cls, d: dict) -> "ASRConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_listener(key: jax.Array, cfg: ASRConfig) -> Params:
    s = cfg.encoder_state_size
    ks = jax.random.split(key, 4)
    return {
        "pblstm1": rnn.init_bilstm(ks[0], cfg.feature_dim, s),
        "pblstm2": rnn.init_bilstm(ks[1], 4 * s, s),
        "pblstm3": rnn.init_bilstm(ks[2], 4 * s, s),
        "blstm4": rnn.init_bilstm(ks[3], 4 * s, s),
    }


def init_attention(key: jax.Array, cfg: ASRConfig) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "phi": rnn.init_linear(k1, cfg.decoder_state_size, cfg.mlp_out_size, bias=False),
        "psi": rnn.init_linear(k2, cfg.enc_out_dim, cfg.mlp_out_size, bias=True),
    }


def init_speller(key: jax.Array, cfg: ASRConfig) -> Params:
    k1, k2 = jax.random.split(key)
    d = cfg.decoder_state_size
    return {
        # input = [char_embed(d) | context(enc_out)]
        "layer1": rnn.init_lstm(k1, cfg.enc_out_dim + d, d, forget_bias=1.0),
        "layer2": rnn.init_lstm(k2, d, d, forget_bias=1.0),
    }


def init_asr(key: jax.Array, cfg: ASRConfig) -> Params:
    ks = jax.random.split(key, 5)
    return {
        "encoder": init_listener(ks[0], cfg),
        "attention": init_attention(ks[1], cfg),
        "decoder": init_speller(ks[2], cfg),
        "embed": rnn.init_embedding(ks[3], cfg.vocab_size, cfg.decoder_state_size, std=1.0),
        "char_trans": rnn.init_linear(ks[4], cfg.decoder_state_size, cfg.vocab_size),
    }


# ---------------------------------------------------------------------------
# Listener
# ---------------------------------------------------------------------------

def listener_apply(
    p: Params, x: jax.Array, lengths: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """[B, T, feat] -> ([B, T//8, 2*state], enc_lens)."""
    for name in ("pblstm1", "pblstm2", "pblstm3"):
        x = rnn.bilstm_scan(p[name], x, lengths)
        x, lengths = rnn.downsample_time(x, lengths)
    x = rnn.bilstm_scan(p["blstm4"], x, lengths)
    return x, lengths


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------

def attention_precompute(p: Params, h: jax.Array) -> jax.Array:
    """Cache tanh(psi(h)) once per utterance — [B, S, mlp]."""
    return jnp.tanh(rnn.linear(p["psi"], h))


def attention_mask(enc_lens: jax.Array, S: int) -> jax.Array:
    """[B, S] True at valid encoder positions.

    Lengths are clamped to >= 1: a sub-8-frame utterance floors to zero
    encoder steps through the pyramid, and an all-masked row would turn the
    attention softmax into NaNs (the reference would crash on packing such
    an utterance instead).
    """
    return jnp.arange(S)[None, :] < jnp.maximum(enc_lens, 1)[:, None]


def attention_step(
    p: Params,
    comp_h: jax.Array,
    h: jax.Array,
    dec_state: jax.Array,
    valid: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """One content-attention step.

    comp_h: cached tanh(psi(h)) [B,S,m]; h: encoder out [B,S,F];
    dec_state: [B,d]; valid: [B,S] bool. Returns (score [B,S], context [B,F]).
    """
    q = jnp.tanh(rnn.linear(p["phi"], dec_state))  # [B, m]
    energy = jnp.einsum("bsm,bm->bs", comp_h, q)
    energy = jnp.where(valid, energy, -jnp.inf)
    score = jax.nn.softmax(energy, axis=-1)
    context = jnp.einsum("bs,bsf->bf", score, h)
    return score, context


# ---------------------------------------------------------------------------
# Speller
# ---------------------------------------------------------------------------

def speller_init_state(batch: int, cfg: ASRConfig):
    z = jnp.zeros((batch, cfg.decoder_state_size), dtype=jnp.float32)
    return ((z, z), (z, z))  # ((h1, c1), (h2, c2))


def speller_step(p: Params, x: jax.Array, state):
    """x: [B, enc_out+d]; returns (new_state, out [B, d])."""
    (s1, s2) = state
    h1, c1 = rnn.lstm_step(p["layer1"], x, s1)
    h2, c2 = rnn.lstm_step(p["layer2"], h1, s2)
    return ((h1, c1), (h2, c2)), h2


# ---------------------------------------------------------------------------
# Attend-and-spell decode loop (shared by ASR and the text autoencoder)
# ---------------------------------------------------------------------------

def attend_and_spell(
    params: Params,
    cfg: ASRConfig,
    enc_h: jax.Array,
    enc_lens: jax.Array,
    decode_step: int,
    teacher: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
    tf_rate: Optional[float] = None,
    tf_cutoff_last: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Run the attention+speller loop for ``decode_step`` characters.

    Args:
      params: pytree holding ``attention``, ``decoder``, ``embed``,
        ``char_trans`` subtrees (an ASR param tree works directly — the text
        autoencoder passes the same subtrees, making parameter sharing literal).
      enc_h: [B, S, enc_out] encoder memory (listener or text encoder).
      enc_lens: [B] valid encoder steps.
      decode_step: static number of output steps.
      teacher: [B, >=decode_step+1] target ids for scheduled sampling, or
        None for pure greedy feedback.
      key: PRNG key (required when teacher is not None and tf_rate < 1).
      tf_rate: teacher-forcing probability; defaults to ``cfg.tf_rate``.
      tf_cutoff_last: if True, the last step always uses greedy feedback even
        with a teacher (the text autoencoder's ``t < decode_step - 1`` guard,
        reference src/text_autoencoder.py:81).

    Returns:
      (logits [B, decode_step, vocab], att_scores [B, decode_step, S])
    """
    B, S, _ = enc_h.shape
    tf = cfg.tf_rate if tf_rate is None else tf_rate

    # TPU fast path: the fused Pallas attend-and-spell kernels (fwd+bwd for
    # teacher mode, greedy-feedback fwd for eval); the TAE's tf_cutoff_last
    # quirk stays on the scan.
    if rnn._use_pallas_spell(cfg.decoder_state_size) and not tf_cutoff_last:
        if teacher is not None:
            from ss_asr_tpu.ops.pallas.spell import attend_and_spell_pallas

            return attend_and_spell_pallas(
                params, cfg, enc_h, enc_lens, decode_step, teacher, key,
                tf_rate=tf, interpret=rnn.PALLAS_INTERPRET,
            )
        from ss_asr_tpu.ops.pallas.spell import attend_and_spell_pallas_greedy

        return attend_and_spell_pallas_greedy(
            params, cfg, enc_h, enc_lens, decode_step, interpret=rnn.PALLAS_INTERPRET
        )

    comp_h = attention_precompute(params["attention"], enc_h)
    valid = attention_mask(enc_lens, S)

    if teacher is not None:
        # teacher char to feed *after* step t is teacher[:, t+1]
        teacher_next = rnn.embed(params["embed"], teacher[:, 1 : decode_step + 1])
        teacher_next = jnp.swapaxes(teacher_next, 0, 1)  # [L, B, d]
        # RNG hoist: all randomness is drawn *before* the scan so no threefry
        # hashing sits on the sequential path (measured ~100us/step on v5e).
        # One Bernoulli(tf) draw per step shared across the batch (reference
        # uses random.random() <= tf_rate per step, src/asr.py:94); sampling
        # from the softmax is Gumbel-argmax with precomputed noise.
        key0 = key if key is not None else jax.random.key(0)
        k_tf, k_g = jax.random.split(key0)
        tf_draws = jax.random.uniform(k_tf, (decode_step,)) <= tf  # [L]
        gumbel = jax.random.gumbel(k_g, (decode_step, B, cfg.vocab_size))
    else:
        teacher_next = jnp.zeros((decode_step, B, cfg.decoder_state_size), dtype=jnp.float32)
        tf_draws = jnp.zeros((decode_step,), dtype=bool)
        gumbel = jnp.zeros((decode_step, 1, 1), dtype=jnp.float32)

    last_char0 = rnn.embed(
        params["embed"], jnp.full((B,), SOS_ID, dtype=jnp.int32)
    )

    def body(carry, inp):
        state, last_char = carry
        t, teacher_t, use_tf, gumbel_t = inp
        score, context = attention_step(
            params["attention"], comp_h, enc_h, state[0][0], valid
        )
        dec_in = jnp.concatenate([last_char, context], axis=-1)
        state, dec_out = speller_step(params["decoder"], dec_in, state)
        cur_char = rnn.linear(params["char_trans"], dec_out)  # [B, V]

        greedy = rnn.embed(params["embed"], jnp.argmax(cur_char, axis=-1))
        if teacher is not None:
            sampled_ids = jnp.argmax(cur_char + gumbel_t, axis=-1)
            sampled = rnn.embed(params["embed"], sampled_ids)
            next_char = jnp.where(use_tf, teacher_t, sampled)
            if tf_cutoff_last:
                is_last = t == decode_step - 1
                next_char = jnp.where(is_last, greedy, next_char)
        else:
            next_char = greedy
        return (state, next_char), (cur_char, score)

    init = (speller_init_state(B, cfg), last_char0)
    ts = jnp.arange(decode_step)
    if rnn.SCAN_REMAT:
        body = jax.checkpoint(body)
    (_, _), (logits, scores) = jax.lax.scan(
        body, init, (ts, teacher_next, tf_draws, gumbel)
    )
    return jnp.swapaxes(logits, 0, 1), jnp.swapaxes(scores, 0, 1)


# ---------------------------------------------------------------------------
# Full forward (reference ASR.forward, src/asr.py:52-110)
# ---------------------------------------------------------------------------

def asr_forward(
    params: Params,
    cfg: ASRConfig,
    x: jax.Array,
    x_lens: jax.Array,
    decode_step: int,
    teacher: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
    tf_rate: Optional[float] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """[B,T,feat] -> (enc_lens, logits [B,L,V], att [B,L,S])."""
    enc_h, enc_lens = listener_apply(params["encoder"], x, x_lens)
    logits, scores = attend_and_spell(
        params, cfg, enc_h, enc_lens, decode_step, teacher, key, tf_rate
    )
    return enc_lens, logits, scores
