"""Per-timestep MLP discriminator for adversarial listener training.

Parity with reference src/discriminator.py: Linear(in,256) -> ReLU ->
Linear(256,256) -> ReLU -> Linear(256,1) -> sigmoid, applied independently to
every time step of either the text-encoder output ("real") or the listener
output ("fake").
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax

from ss_asr_tpu.ops import rnn

Params = Dict


@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig:
    in_dim: int = 512
    hidden_dim: int = 256

    @classmethod
    def from_dict(cls, d: dict) -> "DiscriminatorConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


def init_discriminator(key: jax.Array, cfg: DiscriminatorConfig) -> Params:
    ks = jax.random.split(key, 3)
    return {
        "fc1": rnn.init_linear(ks[0], cfg.in_dim, cfg.hidden_dim),
        "fc2": rnn.init_linear(ks[1], cfg.hidden_dim, cfg.hidden_dim),
        "fc3": rnn.init_linear(ks[2], cfg.hidden_dim, 1),
    }


def discriminate(p: Params, x: jax.Array) -> jax.Array:
    """[B, S, in_dim] -> [B, S] sigmoid scores in (0, 1)."""
    h = jax.nn.relu(rnn.linear(p["fc1"], x))
    h = jax.nn.relu(rnn.linear(p["fc2"], h))
    return jax.nn.sigmoid(rnn.linear(p["fc3"], h))[..., 0]
