"""SpecAugment: on-device feature masking for ASR training.

Beyond-reference capability (the reference has no augmentation; SpecAugment
is the standard companion to LAS — Park et al. 2019, arXiv:1904.08779):
frequency and time masks applied to the log-mel features inside the jitted
train step, so augmentation costs no host round-trips and vectorizes over
the batch. Config-gated via the ``asr.augment`` section (absent = identity):

    asr:
      augment:
        n_freq_masks: 2
        freq_mask_width: 8     # F in the paper: mask width ~ U[0, F]
        n_time_masks: 2
        time_mask_width: 16    # T in the paper: mask width ~ U[0, T]

Masked regions are filled with each utterance's mean over its VALID frames
(the features are unnormalized log-mels, so zero-filling would inject a
wildly out-of-distribution value). Time-mask starts are sampled within each
utterance's true length, so padding frames never shift the distribution.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SpecAugmentConfig:
    n_freq_masks: int = 2
    freq_mask_width: int = 8
    n_time_masks: int = 2
    time_mask_width: int = 16

    @classmethod
    def from_dict(cls, d: Optional[dict]) -> "Optional[SpecAugmentConfig]":
        if not d:
            return None
        known = {f.name for f in dataclasses.fields(cls)}
        unknown = set(d) - known
        if unknown:
            # silently dropping a typo'd key would train with defaults the
            # user explicitly tried to change — fail at startup instead
            raise ValueError(
                f"unknown asr.augment key(s) {sorted(unknown)}; "
                f"valid keys: {sorted(known)}"
            )
        return cls(**d)


def _interval_mask(key, n_masks: int, max_width: int, size: int, limits):
    """[B, size] bool — True where any of n_masks random intervals covers the
    position. Widths ~ U[0, max_width]; starts ~ U[0, limit - width] per row
    (limits: [B] valid extents)."""
    B = limits.shape[0]
    kw, ks = jax.random.split(key)
    widths = jax.random.randint(kw, (B, n_masks), 0, max_width + 1)
    span = jnp.maximum(limits[:, None] - widths, 1)
    starts = (jax.random.uniform(ks, (B, n_masks)) * span).astype(jnp.int32)
    pos = jnp.arange(size)[None, :, None]  # [1, size, 1]
    covered = (pos >= starts[:, None, :]) & (pos < (starts + widths)[:, None, :])
    return covered.any(axis=-1)  # [B, size]


def spec_augment(
    key: jax.Array, x: jax.Array, x_lens: jax.Array, cfg: SpecAugmentConfig
) -> jax.Array:
    """Apply SpecAugment to ``x`` [B, T, F] (valid lengths ``x_lens``)."""
    B, T, F = x.shape
    kf, kt = jax.random.split(key)
    valid_t = (jnp.arange(T)[None, :] < x_lens[:, None])[:, :, None]  # [B,T,1]
    # fill value: per-utterance mean over valid frames
    denom = jnp.maximum(x_lens.astype(x.dtype), 1.0)[:, None]
    fill = (x * valid_t).sum(axis=1) / denom  # [B, F]

    fmask = _interval_mask(
        kf, cfg.n_freq_masks, cfg.freq_mask_width, F,
        jnp.full((B,), F, dtype=jnp.int32),
    )[:, None, :]  # [B, 1, F]
    tmask = _interval_mask(
        kt, cfg.n_time_masks, cfg.time_mask_width, T, x_lens.astype(jnp.int32)
    )[:, :, None]  # [B, T, 1]
    masked = fmask | tmask
    out = jnp.where(masked, fill[:, None, :], x)
    # padding frames stay exactly zero (length-recovery contract downstream)
    return jnp.where(valid_t, out, x)
