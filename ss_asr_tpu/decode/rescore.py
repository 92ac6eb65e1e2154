"""Two-pass n-best rescoring with the char LM.

First-pass decode-time fusion (src/asr.py:153-156) steers the beam search
itself; tuning its ``lm_weight`` requires one full decode per candidate
weight (the thesis' Table 6.12 sweep; our quality protocol does the same).
This module implements the standard cheaper second pass: decode the n-best
frontier ONCE (``beam_decode_nbest``, ideally with ``lm_weight=0`` so beam
scores are purely acoustic), score every hypothesis with the LM once, then
re-rank under any number of weights with host-side arithmetic.

Semantics match decode-time fusion's accounting: the LM term is the summed
log-probability of each hypothesis' characters PLUS its terminal EOS (the
fused decode pays the LM's EOS cost when a beam finishes), conditioned
SOS-first — so ``asr_score + w * lm_score`` ranks by the same quantity a
w-weighted fused decode maximizes, restricted to the n-best support.
"""

from __future__ import annotations

import functools
from typing import Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ss_asr_tpu.models import charlm as charlm_mod
from ss_asr_tpu.vocab import EOS_ID


def _round_up(n: int, k: int) -> int:
    return -(-n // k) * k


@functools.partial(jax.jit, static_argnames=("lm_cfg",))
def _lm_score_device(lm_params, lm_cfg, ids, id_lens):
    """ids [B, L] (pad-filled, EOS already appended); id_lens counts the
    scored positions (chars + 1 for EOS). Returns [B] summed log-probs."""
    B, L = ids.shape
    logits = charlm_mod.teacher_forced_unroll(
        lm_params, lm_cfg, ids, jax.random.PRNGKey(0), tf_rate=1.0
    )
    logp = jax.nn.log_softmax(logits, axis=-1)
    per_char = jnp.take_along_axis(logp, ids[:, :, None], axis=-1)[..., 0]
    mask = jnp.arange(L)[None, :] < id_lens[:, None]
    return jnp.sum(per_char * mask, axis=-1)


def lm_score(
    lm_params: Dict,
    lm_cfg: charlm_mod.CharLMConfig,
    toks: np.ndarray,
    lens: np.ndarray,
) -> np.ndarray:
    """LM log-probability of token rows (chars + terminal EOS).

    toks: [..., L] int tokens (pad-filled, no EOS); lens: [...] char counts.
    Returns [...] float32 scores. Rows with length 0 score the bare EOS.
    """
    shape = toks.shape[:-1]
    L = toks.shape[-1]
    flat = toks.reshape(-1, L).astype(np.int32)
    flat_lens = lens.reshape(-1).astype(np.int32)
    # append the terminal EOS at each row's length; bucket L for executable
    # reuse across sweeps
    Lb = _round_up(L + 1, 16)
    padded = np.zeros((flat.shape[0], Lb), dtype=np.int32)
    padded[:, :L] = flat
    padded[np.arange(flat.shape[0]), flat_lens] = EOS_ID
    out = _lm_score_device(
        lm_params, lm_cfg, jnp.asarray(padded), jnp.asarray(flat_lens + 1)
    )
    return np.asarray(out).reshape(shape)


def rescore_nbest(
    toks: np.ndarray,
    lens: np.ndarray,
    asr_scores: np.ndarray,
    lm_params: Dict,
    lm_cfg: charlm_mod.CharLMConfig,
    weights: Iterable[float],
) -> Dict[float, Tuple[np.ndarray, np.ndarray]]:
    """Re-rank an n-best list under several LM weights with ONE LM pass.

    toks/lens/asr_scores: ``beam_decode_nbest`` outputs
    ([B, n, L], [B, n], [B, n]).  Returns {weight: (best [B] index into the
    n axis, fused_scores [B, n])}.
    """
    lm = lm_score(lm_params, lm_cfg, toks, lens)  # [B, n]
    out = {}
    for w in weights:
        fused = asr_scores + float(w) * lm
        out[float(w)] = (np.argmax(fused, axis=-1), fused)
    return out
