"""Two-pass LM rescoring of n-best lists."""

import numpy as np
import jax
import jax.numpy as jnp

from ss_asr_tpu.decode.beam import beam_decode_nbest
from ss_asr_tpu.decode.rescore import lm_score, rescore_nbest
from ss_asr_tpu.models import charlm as charlm_mod
from ss_asr_tpu.models import las
from ss_asr_tpu.vocab import EOS_ID

LM_CFG = charlm_mod.CharLMConfig(hidden_size=8)


def _lm(seed=0):
    return charlm_mod.init_charlm(jax.random.PRNGKey(seed), LM_CFG)


def test_lm_score_matches_manual_steps():
    lm = _lm()
    toks = np.array([[5, 6, 7, 0, 0], [8, 0, 0, 0, 0]], dtype=np.int32)
    lens = np.array([3, 1], dtype=np.int32)
    got = lm_score(lm, LM_CFG, toks, lens)

    for b in range(2):
        seq = list(toks[b, : lens[b]]) + [EOS_ID]
        state = charlm_mod.init_state(1, LM_CFG)
        inp = jnp.zeros((1,), jnp.int32)  # SOS-first conditioning
        want = 0.0
        for c in seq:
            logits, state = charlm_mod.step(lm, inp, state)
            lp = np.asarray(jax.nn.log_softmax(logits, -1))[0, c]
            want += lp
            inp = jnp.full((1,), c, jnp.int32)
        np.testing.assert_allclose(got[b], want, atol=1e-5)


def test_lm_score_zero_length_scores_bare_eos():
    lm = _lm(1)
    toks = np.zeros((1, 4), np.int32)
    got = lm_score(lm, LM_CFG, toks, np.array([0], np.int32))
    logits, _ = charlm_mod.step(lm, jnp.zeros((1,), jnp.int32),
                                charlm_mod.init_state(1, LM_CFG))
    want = np.asarray(jax.nn.log_softmax(logits, -1))[0, EOS_ID]
    np.testing.assert_allclose(got[0], want, atol=1e-5)


def test_rescore_nbest_sweep():
    cfg = las.ASRConfig(encoder_state_size=8, decoder_state_size=8,
                        mlp_out_size=8, feature_dim=8)
    params = las.init_asr(jax.random.PRNGKey(2), cfg)
    lm = _lm(2)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 24, 8).astype(np.float32))
    lens = jnp.array([24, 16], dtype=np.int32)

    toks, tlens, scores = beam_decode_nbest(params, cfg, x, lens,
                                            beam_size=4, max_steps=10)
    ranked = rescore_nbest(toks, tlens, scores, lm, LM_CFG,
                           weights=[0.0, 0.1, 0.5])
    # weight 0 reproduces the acoustic-only ordering (beam output is
    # already sorted best-first)
    best0, fused0 = ranked[0.0]
    np.testing.assert_array_equal(best0, np.zeros(2, np.int64))
    np.testing.assert_allclose(fused0, scores, atol=1e-6)
    # any weight: fused = asr + w * lm, argmax consistent
    lmsc = lm_score(lm, LM_CFG, toks, tlens)
    for w in (0.1, 0.5):
        best, fused = ranked[w]
        np.testing.assert_allclose(fused, scores + w * lmsc, atol=1e-5)
        np.testing.assert_array_equal(best, np.argmax(fused, axis=-1))
