"""Text (denoising) autoencoder sharing the LAS speller/attention/embedding.

Parity with reference src/text_autoencoder.py: a TextEncoder (char embedding +
2-layer BiLSTM -> [B, S, 2*state]) encodes the *noised* text; decoding then
runs the ASR's own attend-and-spell loop against that memory, so training the
autoencoder trains the ASR's embed / attention / speller / char_trans too.

Here the sharing is literal: ``tae_forward`` receives the ASR param tree and
calls the very same ``attend_and_spell`` function the ASR uses — no parameter
copies, no checkpoint relays (the reference shares via checkpoint files,
src/trainer.py:616-641).

One behavioral quirk preserved: the reference guards teacher forcing with
``t < decode_step - 1`` in the TAE loop only (src/text_autoencoder.py:81), so
the final step always feeds back the argmax; ``tf_cutoff_last=True``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax

from ss_asr_tpu.models import las
from ss_asr_tpu.ops import rnn
from ss_asr_tpu.vocab import VOCAB_SIZE

Params = Dict


@dataclasses.dataclass(frozen=True)
class TAEConfig:
    vocab_size: int = VOCAB_SIZE
    emb_dim: int = 128
    state_size: int = 256
    num_layers: int = 2

    @classmethod
    def from_dict(cls, d: dict) -> "TAEConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


def init_text_encoder(key: jax.Array, cfg: TAEConfig) -> Params:
    ks = jax.random.split(key, cfg.num_layers + 1)
    p: Params = {"emb": rnn.init_embedding(ks[0], cfg.vocab_size, cfg.emb_dim, std=1.0)}
    in_dim = cfg.emb_dim
    for i in range(cfg.num_layers):
        p[f"bilstm{i + 1}"] = rnn.init_bilstm(ks[i + 1], in_dim, cfg.state_size)
        in_dim = 2 * cfg.state_size
    return p


def init_tae(key: jax.Array, cfg: TAEConfig) -> Params:
    return {"encoder": init_text_encoder(key, cfg)}


def text_encode(
    p: Params, cfg: TAEConfig, y: jax.Array, lengths: Optional[jax.Array] = None
) -> jax.Array:
    """[B, S] char ids -> [B, S, 2*state] memory."""
    x = rnn.embed(p["emb"], y)
    for i in range(cfg.num_layers):
        x = rnn.bilstm_scan(p[f"bilstm{i + 1}"], x, lengths)
    return x


def tae_forward(
    asr_params: Params,
    tae_params: Params,
    asr_cfg: las.ASRConfig,
    tae_cfg: TAEConfig,
    y: jax.Array,
    y_noised: jax.Array,
    noise_lens: jax.Array,
    decode_step: int,
    key: jax.Array,
    tf_rate: Optional[float] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Reconstruct clean ``y`` from ``y_noised``.

    Returns (noise_lens, logits [B, decode_step, V]) — mirror of the reference
    forward's return (src/text_autoencoder.py:31-94).
    """
    memory = text_encode(tae_params["encoder"], tae_cfg, y_noised, noise_lens)
    logits, _ = las.attend_and_spell(
        asr_params,
        asr_cfg,
        memory,
        noise_lens,
        decode_step,
        teacher=y,
        key=key,
        tf_rate=tf_rate,
        tf_cutoff_last=True,
    )
    return noise_lens, logits
