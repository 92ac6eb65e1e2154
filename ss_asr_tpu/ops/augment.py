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
        adaptive_size_ratio: 0.0    # p_S: per-utterance width cap = p_S*len
        adaptive_number_ratio: 0.0  # p_M: per-utterance mask count

Adaptive time masking (Park et al. 2020, arXiv:1912.05533 — "SpecAugment
on Large Scale Datasets") scales the time-mask policy to each utterance's
true length instead of a fixed width, which the paper found necessary once
utterance lengths vary widely: with ``adaptive_size_ratio`` p_S > 0 the
per-utterance max width becomes floor(p_S * len) (``time_mask_width`` is
ignored for the time axis); with ``adaptive_number_ratio`` p_M > 0 the
number of active time masks becomes min(n_time_masks,
floor(p_M * len)) — ``n_time_masks`` acts as the static cap so the jitted
program keeps fixed shapes while short utterances receive fewer (possibly
zero) masks.

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
    #: p_S — when > 0, per-utterance time-mask width cap = floor(p_S * len)
    adaptive_size_ratio: float = 0.0
    #: p_M — when > 0, active time masks = min(n_time_masks, floor(p_M*len))
    adaptive_number_ratio: float = 0.0

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
        cfg = cls(**d)
        for k in ("adaptive_size_ratio", "adaptive_number_ratio"):
            v = getattr(cfg, k)
            if not 0.0 <= v <= 1.0:
                raise ValueError(f"asr.augment.{k} must be in [0, 1], got {v}")
        return cfg


def _floor_ratio(p: float, lens) -> "jax.Array":
    """floor(p * lens) as int32. f32 products can land one ulp below an
    exact integer (e.g. f32(0.13)*900 = 116.99999...), truncating to
    floor-1; nudge before truncation to keep the documented floor(p*len)
    semantics."""
    return jnp.floor(p * lens.astype(jnp.float32) + 1e-3).astype(jnp.int32)


def _interval_mask(key, n_masks: int, max_widths, size: int, limits,
                   active=None):
    """[B, size] bool — True where any of n_masks random intervals covers the
    position. Widths ~ U[0, max_widths[b]] per row; starts ~
    U[0, limit - width] per row (limits: [B] valid extents). ``active``
    ([B] int, optional) keeps only each row's first ``active[b]`` intervals —
    the static n_masks stays the jit-shape cap while the effective
    multiplicity varies per utterance."""
    B = limits.shape[0]
    kw, ks = jax.random.split(key)
    # uniform * (cap+1) floored == randint(0, cap+1) but with per-row caps
    u = jax.random.uniform(kw, (B, n_masks))
    widths = (u * (max_widths[:, None] + 1).astype(u.dtype)).astype(jnp.int32)
    widths = jnp.minimum(widths, max_widths[:, None])  # guard u == 1.0
    if active is not None:
        widths = jnp.where(
            jnp.arange(n_masks)[None, :] < active[:, None], widths, 0
        )
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

    lens_i = x_lens.astype(jnp.int32)
    fmask = _interval_mask(
        kf, cfg.n_freq_masks, jnp.full((B,), cfg.freq_mask_width, jnp.int32),
        F, jnp.full((B,), F, dtype=jnp.int32),
    )[:, None, :]  # [B, 1, F]
    if cfg.adaptive_size_ratio > 0.0:
        t_widths = _floor_ratio(cfg.adaptive_size_ratio, lens_i)
    else:
        t_widths = jnp.full((B,), cfg.time_mask_width, jnp.int32)
    t_active = None
    if cfg.adaptive_number_ratio > 0.0:
        t_active = jnp.minimum(
            cfg.n_time_masks, _floor_ratio(cfg.adaptive_number_ratio, lens_i)
        )
    tmask = _interval_mask(
        kt, cfg.n_time_masks, t_widths, T, lens_i, active=t_active
    )[:, :, None]  # [B, T, 1]
    masked = fmask | tmask
    out = jnp.where(masked, fill[:, None, :], x)
    # padding frames stay exactly zero (length-recovery contract downstream)
    return jnp.where(valid_t, out, x)
