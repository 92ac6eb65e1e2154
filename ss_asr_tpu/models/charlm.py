"""Character-level RNN language model (2x GRU) for shallow fusion.

Architecture parity with the reference CharLM (src/charlm.py): embedding ->
GRUCell -> GRUCell -> linear, stepped one character at a time at decode time;
training unrolls a fixed chunk with scheduled sampling
(reference src/trainer.py:225-253).

TPU-native: the training unroll is a single ``lax.scan`` whose input
projection is hoisted into one sequence-level matmul; generation with
temperature is also a scan, fully on device.
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
class CharLMConfig:
    vocab_size: int = VOCAB_SIZE
    hidden_size: int = 128
    tf_rate: float = 0.9

    @classmethod
    def from_dict(cls, d: dict) -> "CharLMConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


def init_charlm(key: jax.Array, cfg: CharLMConfig) -> Params:
    ks = jax.random.split(key, 4)
    h = cfg.hidden_size
    return {
        "emb": rnn.init_embedding(ks[0], cfg.vocab_size, h, std=1.0),
        "gru1": rnn.init_gru(ks[1], h, h),
        "gru2": rnn.init_gru(ks[2], h, h),
        "out": rnn.init_linear(ks[3], h, cfg.vocab_size),
    }


def init_state(batch: int, cfg: CharLMConfig) -> Tuple[jax.Array, jax.Array]:
    z = jnp.zeros((batch, cfg.hidden_size), dtype=jnp.float32)
    return (z, z)


def step(
    p: Params, ids: jax.Array, state: Tuple[jax.Array, jax.Array]
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """One LM step: ids [B] int -> (logits [B, V], new state)."""
    h1, h2 = state
    x = rnn.embed(p["emb"], ids)
    h1 = rnn.gru_step(p["gru1"], x, h1)
    h2 = rnn.gru_step(p["gru2"], h1, h2)
    return rnn.linear(p["out"], h2), (h1, h2)


def teacher_forced_unroll(
    p: Params,
    cfg: CharLMConfig,
    labels: jax.Array,
    key: jax.Array,
    tf_rate: Optional[float] = None,
    first_input: Optional[jax.Array] = None,
) -> jax.Array:
    """Training unroll with scheduled sampling.

    labels: [B, L] — the target char at each step (input at step t is the
    label of step t-1 under teacher forcing, SOS-like zero id at t=0,
    matching the reference's 'last_char = zeros' start, trainer.py:231).
    Returns logits [B, L, V].
    """
    B, L = labels.shape
    tf = cfg.tf_rate if tf_rate is None else tf_rate
    start = (
        first_input
        if first_input is not None
        else jnp.full((B,), SOS_ID, dtype=jnp.int32)
    )

    # RNG hoisted out of the scan (no threefry on the sequential path):
    # per-step Bernoulli draws + Gumbel-argmax sampling noise.
    k_tf, k_g = jax.random.split(key)
    tf_draws = jax.random.uniform(k_tf, (L,)) <= tf
    gumbel = jax.random.gumbel(k_g, (L, B, cfg.vocab_size))

    def body(carry, inp):
        lbl_t, use_tf, gumbel_t = inp
        ids, state = carry
        logits, state = step(p, ids, state)
        sampled = jnp.argmax(logits + gumbel_t, axis=-1).astype(labels.dtype)
        next_ids = jnp.where(use_tf, lbl_t, sampled)
        return (next_ids, state), logits

    labels_t = jnp.swapaxes(labels, 0, 1)  # [L, B]
    (_, _), logits = jax.lax.scan(
        body, (start, init_state(B, cfg)), (labels_t, tf_draws, gumbel)
    )
    return jnp.swapaxes(logits, 0, 1)


def generate(
    p: Params,
    cfg: CharLMConfig,
    key: jax.Array,
    length: int,
    temp: float = 0.8,
    start_ids: Optional[jax.Array] = None,
) -> jax.Array:
    """Free-running generation with temperature sampling.

    start_ids: [S] prompt ids (defaults to [SOS]). Returns [length] sampled
    ids (prompt not included). Temperature semantics match the reference's
    p**(1/t) renormalization (src/trainer.py:319-364) — equivalent to
    dividing the logits by t.
    """
    if start_ids is None:
        start_ids = jnp.array([SOS_ID], dtype=jnp.int32)
    state = init_state(1, cfg)
    # consume the prompt
    for i in range(start_ids.shape[0] - 1):
        _, state = step(p, start_ids[i : i + 1], state)
    last = start_ids[-1:]

    def body(carry, _):
        ids, state, k = carry
        logits, state = step(p, ids, state)
        k, k_s = jax.random.split(k)
        nxt = jax.random.categorical(k_s, logits / temp, axis=-1).astype(jnp.int32)
        return (nxt, state, k), nxt[0]

    (_, _, _), out = jax.lax.scan(body, (last, state, key), None, length=length)
    return out
