"""Forced alignment, per-character timestamps, and hypothesis confidence.

The reference imports a ``Hypothesis`` class that its repo no longer contains
(src/asr.py:12 — defect #1, an excised beam search).  This module restores
the symbol with a production-shaped meaning: a decoded hypothesis carrying
its text, score, confidence, and attention-derived character timing.

Timing comes from a *forced-alignment* pass: re-run the attend-and-spell
loop teacher-forced (tf=1.0) on the decoded characters and take each step's
attention argmax as the character's encoder frame.  The listener reduces
time 8x (3 pyramidal stages, src/asr.py:227-238) at a 10 ms hop
(src/preprocess.py:30-32), so encoder frame f covers seconds
``f * 8 * 0.010`` of audio.  This works for ANY decode mode (greedy, beam,
fused-kernel) because it only needs the final character sequence — one extra
teacher-forced program per batch, fully batched and jit-cached.

Confidence is the same pass's per-character log-probability under the
decode-time distribution (ASR log-softmax, plus ``lm_weight * LM``
log-softmax when fusion was active — src/asr.py:153-156), summed (score)
and length-averaged (avg_logprob).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ss_asr_tpu.models import charlm as charlm_mod
from ss_asr_tpu.models import las
from ss_asr_tpu.ops import rnn
from ss_asr_tpu.vocab import SOS_ID

#: seconds of audio per encoder output frame: 8x pyramidal time reduction
#: at the 10 ms frontend hop.
SECONDS_PER_ENC_FRAME = 8 * 0.010


@dataclasses.dataclass
class Hypothesis:
    """One decoded hypothesis with alignment and confidence.

    char_starts[i] is the start time (seconds) of text[i]; char_frames the
    encoder frame each character attended to most.  score is the summed
    per-char log-prob under the decode-time (optionally LM-fused)
    distribution; avg_logprob = score / max(len, 1) is the comparable
    confidence across lengths (0.0 = certain, more negative = less).
    """

    text: str
    score: float
    avg_logprob: float
    char_starts: np.ndarray  # [n_chars] float32 seconds
    char_frames: np.ndarray  # [n_chars] int32 encoder frames
    #: per-character log-probs aligned with text (empty when the decode
    #: ran without the alignment pass — timestamps=False)
    char_logps: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0,), np.float32)
    )

    def words(self) -> List[dict]:
        """Word-level spans derived from the char alignment.

        Splits on the vocabulary's space character; each word's start is
        its first char's attended time, its end the last char's time plus
        one encoder frame, its avg_logprob the mean of its chars' aligned
        log-probs (falls back to the hypothesis confidence when the
        decode skipped the alignment pass).  Returns
        ``[{"word", "start", "end", "avg_logprob"}, ...]``.
        """
        have_t = self.char_starts.shape[0] == len(self.text)
        have_p = self.char_logps.shape[0] == len(self.text)
        out: List[dict] = []
        i = 0
        n = len(self.text)
        while i < n:
            if self.text[i] == " ":
                i += 1
                continue
            j = i
            while j < n and self.text[j] != " ":
                j += 1
            out.append({
                "word": self.text[i:j],
                "start": float(self.char_starts[i]) if have_t else 0.0,
                "end": (float(self.char_starts[j - 1])
                        + SECONDS_PER_ENC_FRAME) if have_t else 0.0,
                "avg_logprob": (float(self.char_logps[i:j].mean())
                                if have_p else self.avg_logprob),
            })
            i = j
        return out


@functools.partial(
    jax.jit, static_argnames=("cfg", "L", "lm_cfg", "lm_weight", "_salt")
)
def _align_device(params, cfg, x, x_lens, ids, L, lm_params, lm_cfg,
                  lm_weight, *, _salt=None):
    enc_h, enc_lens = las.listener_apply(params["encoder"], x, x_lens)
    return _align_from_memory_device(
        params, cfg, enc_h, enc_lens, ids, L, lm_params, lm_cfg, lm_weight,
        _salt=_salt,
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "L", "n", "lm_cfg", "lm_weight", "_salt")
)
def _align_tiled_device(params, cfg, x, x_lens, ids, L, n, lm_params,
                        lm_cfg, lm_weight, *, _salt=None):
    """Align n hypotheses per utterance: ONE listener pass over the [B]
    batch, memory rows repeated n-fold on device (a row-sharded x keeps
    its sharding — GSPMD propagates through the repeat), ids flat [B*n, L].
    """
    enc_h, enc_lens = las.listener_apply(params["encoder"], x, x_lens)
    enc_h = jnp.repeat(enc_h, n, axis=0)
    enc_lens = jnp.repeat(enc_lens, n, axis=0)
    return _align_from_memory_device(
        params, cfg, enc_h, enc_lens, ids, L, lm_params, lm_cfg, lm_weight,
        _salt=_salt,
    )


def force_align_nbest(
    params: Dict,
    cfg: las.ASRConfig,
    x: jax.Array,
    x_lens: jax.Array,
    ids: np.ndarray,
    lm_params: Optional[Dict] = None,
    lm_cfg: Optional[charlm_mod.CharLMConfig] = None,
    lm_weight: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Align an n-best list: x [B, T, feat], ids [B, n, L].

    Returns (char_frames [B, n, L], char_logp [B, n, L]).  The listener
    runs once per utterance (not per hypothesis)."""
    B, n, L = ids.shape
    flat = jnp.asarray(np.ascontiguousarray(ids.reshape(B * n, L)))
    frames, logp = _align_tiled_device(
        params, cfg, x, x_lens, flat, int(L), int(n),
        lm_params, lm_cfg, lm_weight, _salt=rnn.impl_salt(),
    )
    return (np.asarray(frames).reshape(B, n, L),
            np.asarray(logp).reshape(B, n, L))


@functools.partial(
    jax.jit, static_argnames=("cfg", "L", "lm_cfg", "lm_weight", "_salt")
)
def _align_from_memory_device(params, cfg, enc_h, enc_lens, ids, L,
                              lm_params, lm_cfg, lm_weight, *, _salt=None):
    B = ids.shape[0]
    sos = jnp.full((B, 1), SOS_ID, dtype=jnp.int32)
    teacher = jnp.concatenate([sos, ids[:, :L].astype(jnp.int32)], axis=1)
    logits, att = las.attend_and_spell(
        params, cfg, enc_h, enc_lens, L, teacher=teacher,
        key=jax.random.PRNGKey(0), tf_rate=1.0,
    )
    logp = jax.nn.log_softmax(logits, axis=-1)
    if lm_params is not None and lm_weight:
        # LM input at step t is the char emitted at t-1 (SOS at t=0) — the
        # unroll's labels-are-targets convention does exactly that at tf=1
        lm_logits = charlm_mod.teacher_forced_unroll(
            lm_params, lm_cfg, ids[:, :L].astype(jnp.int32),
            jax.random.PRNGKey(0), tf_rate=1.0,
        )
        logp = logp + lm_weight * jax.nn.log_softmax(lm_logits, axis=-1)
    char_logp = jnp.take_along_axis(
        logp, ids[:, :L, None].astype(jnp.int32), axis=-1
    )[..., 0]  # [B, L]
    char_frames = jnp.argmax(att, axis=-1).astype(jnp.int32)  # [B, L]
    return char_frames, char_logp


def force_align(
    params: Dict,
    cfg: las.ASRConfig,
    x: jax.Array,
    x_lens: jax.Array,
    ids: np.ndarray,
    id_lens: np.ndarray,
    lm_params: Optional[Dict] = None,
    lm_cfg: Optional[charlm_mod.CharLMConfig] = None,
    lm_weight: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Align decoded ids back onto the audio.

    x: [B, T, feat] fbank batch; ids: [B, L] decoded tokens (pad 0);
    id_lens: [B] valid counts.  Returns (char_frames [B, L] int32,
    char_logp [B, L] float32); positions >= id_lens[b] are meaningless.
    """
    L = int(ids.shape[1])
    frames, logp = _align_device(
        params, cfg, x, x_lens, jnp.asarray(ids), L,
        lm_params, lm_cfg, lm_weight, _salt=rnn.impl_salt(),
    )
    return np.asarray(frames), np.asarray(logp)


def force_align_from_memory(
    params: Dict,
    cfg: las.ASRConfig,
    enc_h: jax.Array,
    enc_lens: jax.Array,
    ids: np.ndarray,
    lm_params: Optional[Dict] = None,
    lm_cfg: Optional[charlm_mod.CharLMConfig] = None,
    lm_weight: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """As force_align but from a precomputed listener memory (reuse it when
    aligning several hypotheses of the same utterances — tile enc_h rows)."""
    L = int(ids.shape[1])
    frames, logp = _align_from_memory_device(
        params, cfg, enc_h, enc_lens, jnp.asarray(ids), L,
        lm_params, lm_cfg, lm_weight, _salt=rnn.impl_salt(),
    )
    return np.asarray(frames), np.asarray(logp)


def build_hypotheses(
    mapper,
    ids: np.ndarray,
    id_lens: np.ndarray,
    char_frames: np.ndarray,
    char_logp: np.ndarray,
) -> List[Hypothesis]:
    """Assemble per-row Hypothesis records from align outputs.

    Text is built id-by-id so char_starts[i] is EXACTLY text[i]'s time:
    SOS/EOS ids inside the decoded span contribute to the score (they were
    emitted by the model) but produce no character — ``Mapper.translate``
    drops them from its string the same way (vocab.py:94-99).
    """
    from ss_asr_tpu.vocab import EOS_ID

    out = []
    for b in range(ids.shape[0]):
        n = int(id_lens[b])
        chars: List[str] = []
        frames: List[int] = []
        logps: List[float] = []
        for i in range(n):
            c = int(ids[b, i])
            if c in (SOS_ID, EOS_ID):
                continue
            chars.append(mapper.r_mapping[c])
            frames.append(int(char_frames[b, i]))
            logps.append(float(char_logp[b, i]))
        fr = np.asarray(frames, dtype=np.int32)
        score = float(char_logp[b, :n].sum()) if n else 0.0
        out.append(Hypothesis(
            text="".join(chars),
            score=score,
            avg_logprob=score / max(n, 1),
            char_starts=(fr * SECONDS_PER_ENC_FRAME).astype(np.float32),
            char_frames=fr,
            char_logps=np.asarray(logps, dtype=np.float32),
        ))
    return out
