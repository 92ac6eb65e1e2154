"""Loss functions with the reference's exact normalization semantics."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_nll_per_utt(
    logits: jax.Array, labels: jax.Array, y: jax.Array
) -> jax.Array:
    """Per-utterance length-normalized NLL [B] — the reference's exact
    normalization (src/trainer.py:426-434): per-position CE with
    ignore_index=0 on ``labels``, summed per utterance and divided by
    ``sum(y != 0)`` (the FULL target's non-pad count). Shared by the train
    loss (batch mean) and validation's per-utterance accumulation.

    logits: [B, L, V]; labels: [B, L] (may contain pad=0); y: [B, >=L] the
    full target row used for the length normalizer.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]  # [B, L]
    mask = (labels != 0).astype(logits.dtype)
    per_utt = (nll * mask).sum(axis=-1)
    denom = jnp.maximum((y != 0).sum(axis=-1).astype(logits.dtype), 1.0)
    return per_utt / denom


def masked_ce_per_utt(
    logits: jax.Array, labels: jax.Array, y: jax.Array
) -> jax.Array:
    """Reference ASR/TAE loss: batch mean of ``masked_nll_per_utt``."""
    return jnp.mean(masked_nll_per_utt(logits, labels, y))


def chunk_ce(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Char-LM loss (src/trainer.py:235-249): CE summed over the chunk,
    meaned over the batch (no ignore index)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return jnp.mean(nll.sum(axis=-1))


def smooth_l1(pred: jax.Array, target: jax.Array, beta: float = 1.0) -> jax.Array:
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def masked_smooth_l1_mean(
    pred: jax.Array, target: jax.Array, t_valid: jax.Array
) -> jax.Array:
    """SAE loss (src/trainer.py:807-822): smooth-L1 mean over the first
    ``t_valid`` frames (the dynamic batch max) of every sample.

    pred/target: [B, T, F]; t_valid: scalar int (<= T).
    """
    B, T, F = pred.shape
    mask = (jnp.arange(T) < t_valid)[None, :, None].astype(pred.dtype)
    total = (smooth_l1(pred, target) * mask).sum()
    return total / (B * t_valid * F)


def bce(scores: jax.Array, targets: jax.Array) -> jax.Array:
    """Binary cross entropy on sigmoid *outputs* (torch nn.BCELoss mean)."""
    eps = 1e-7
    s = jnp.clip(scores, eps, 1.0 - eps)
    return -jnp.mean(targets * jnp.log(s) + (1.0 - targets) * jnp.log(1.0 - s))
