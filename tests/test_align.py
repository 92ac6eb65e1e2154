"""Forced alignment, n-best beam output, and the detailed serving API."""

import numpy as np
import jax
import jax.numpy as jnp

from ss_asr_tpu.api import Transcriber
from ss_asr_tpu.decode import align as align_mod
from ss_asr_tpu.decode.beam import beam_decode, beam_decode_nbest
from ss_asr_tpu.models import charlm as charlm_mod
from ss_asr_tpu.models import las

CFG = las.ASRConfig(encoder_state_size=8, decoder_state_size=8, mlp_out_size=8,
                    feature_dim=8)
LM_CFG = charlm_mod.CharLMConfig(hidden_size=8)


def _params(seed=0):
    return las.init_asr(jax.random.PRNGKey(seed), CFG)


def _batch(B=3, T=32, seed=1):
    rng = np.random.RandomState(seed)
    x = rng.randn(B, T, CFG.feature_dim).astype(np.float32)
    lens = np.array([T, T - 8, T - 16], dtype=np.int32)[:B]
    return jnp.asarray(x), jnp.asarray(lens)


def test_force_align_shapes_and_ranges():
    params = _params()
    x, lens = _batch()
    ids = np.array([[5, 6, 7, 1, 0, 0], [8, 9, 1, 0, 0, 0], [4, 1, 0, 0, 0, 0]],
                   dtype=np.int32)
    id_lens = np.array([3, 2, 1], dtype=np.int32)
    frames, logp = align_mod.force_align(params, CFG, x, lens, ids, id_lens)
    assert frames.shape == ids.shape and logp.shape == ids.shape
    # attended frames lie inside each sample's valid encoder range
    enc_lens = np.maximum(np.asarray(lens) // 8, 1)
    for b in range(3):
        assert (frames[b, : id_lens[b]] < enc_lens[b]).all()
        assert (frames[b, : id_lens[b]] >= 0).all()
    assert (logp <= 0).all()  # log-probabilities


def test_force_align_matches_manual_forward():
    """char_logp is exactly the teacher-forced log-softmax at the char ids."""
    params = _params(2)
    x, lens = _batch(B=2)
    ids = np.array([[3, 4, 5, 1], [6, 7, 1, 0]], dtype=np.int32)
    id_lens = np.array([3, 2], dtype=np.int32)
    frames, logp = align_mod.force_align(params, CFG, x, lens, ids, id_lens)

    teacher = np.concatenate([np.zeros((2, 1), np.int32), ids], axis=1)
    _, logits, att = las.asr_forward(
        params, CFG, x, lens, decode_step=4, teacher=jnp.asarray(teacher),
        key=jax.random.PRNGKey(0), tf_rate=1.0)
    want = np.take_along_axis(
        np.asarray(jax.nn.log_softmax(logits, axis=-1)), ids[:, :, None], -1
    )[..., 0]
    np.testing.assert_allclose(logp, want, atol=1e-5)
    np.testing.assert_array_equal(frames, np.argmax(np.asarray(att), axis=-1))


def test_force_align_lm_fusion_adds_lm_term():
    params = _params(3)
    lm_params = charlm_mod.init_charlm(jax.random.PRNGKey(7), LM_CFG)
    x, lens = _batch(B=2)
    ids = np.array([[3, 4, 1], [5, 1, 0]], dtype=np.int32)
    id_lens = np.array([2, 1], dtype=np.int32)
    _, base = align_mod.force_align(params, CFG, x, lens, ids, id_lens)
    _, fused = align_mod.force_align(params, CFG, x, lens, ids, id_lens,
                                     lm_params=lm_params, lm_cfg=LM_CFG,
                                     lm_weight=0.3)
    # manual LM term: step t input is ids[t-1] (SOS at t=0)
    state = charlm_mod.init_state(2, LM_CFG)
    inp = np.zeros((2,), np.int32)
    lm_lp = np.zeros_like(base)
    for t in range(ids.shape[1]):
        logits, state = charlm_mod.step(lm_params, jnp.asarray(inp), state)
        lp = np.asarray(jax.nn.log_softmax(logits, -1))
        lm_lp[:, t] = np.take_along_axis(lp, ids[:, t : t + 1], -1)[:, 0]
        inp = ids[:, t]
    np.testing.assert_allclose(fused, base + 0.3 * lm_lp, atol=1e-5)


def test_beam_nbest_top1_matches_beam_decode():
    params = _params(4)
    x, lens = _batch()
    toks1, lens1 = beam_decode(params, CFG, x, lens, beam_size=4, max_steps=12)
    toksN, lensN, scores = beam_decode_nbest(params, CFG, x, lens,
                                             beam_size=4, max_steps=12)
    assert toksN.shape == (3, 4, 12) and scores.shape == (3, 4)
    np.testing.assert_array_equal(toksN[:, 0], toks1)
    np.testing.assert_array_equal(lensN[:, 0], lens1)
    # sorted descending
    assert (np.diff(scores, axis=1) <= 1e-6).all()
    # n_best truncation
    toks2, lens2, scores2 = beam_decode_nbest(params, CFG, x, lens,
                                              beam_size=4, max_steps=12,
                                              n_best=2)
    np.testing.assert_array_equal(toks2, toksN[:, :2])
    np.testing.assert_array_equal(scores2, scores[:, :2])


def test_transcribe_fbank_detailed_greedy():
    params = _params(5)
    tr = Transcriber(params, CFG, max_steps=12, t_bucket=16)
    rng = np.random.RandomState(0)
    fb = [rng.randn(20, 8).astype(np.float32),
          rng.randn(12, 8).astype(np.float32)]
    plain = tr.transcribe_fbank(fb)
    detailed = tr.transcribe_fbank_detailed(fb)
    assert len(detailed) == 2
    for hyps, text in zip(detailed, plain):
        assert len(hyps) == 1
        h = hyps[0]
        assert h.text == text
        assert len(h.char_starts) == len(h.char_frames) == len(h.text)
        assert h.avg_logprob <= 0.0
        # timestamps are frame-derived seconds, nondecreasing not required
        # (attention may jump) but must be within the utterance
        if len(h.char_starts):
            assert (h.char_starts >= 0).all()
            np.testing.assert_allclose(
                h.char_starts, h.char_frames * align_mod.SECONDS_PER_ENC_FRAME,
                atol=1e-6)


def test_transcribe_fbank_detailed_nbest_and_empty():
    params = _params(6)
    tr = Transcriber(params, CFG, max_steps=10, t_bucket=16)
    rng = np.random.RandomState(1)
    fb = [rng.randn(18, 8).astype(np.float32),
          np.zeros((0, 8), np.float32)]  # empty row mixed in
    detailed = tr.transcribe_fbank_detailed(fb, n_best=3)
    assert len(detailed) == 2
    assert len(detailed[0]) == 3
    # best-first by decoder score
    s = [h.score for h in detailed[0]]
    assert s == sorted(s, reverse=True)
    # empty audio -> one empty hypothesis
    assert detailed[1][0].text == "" and len(detailed[1]) == 1

    # n-best top-1 text agrees with the beam transcriber's plain output
    tr_beam = Transcriber(params, CFG, max_steps=10, t_bucket=16, beam_size=3)
    plain = tr_beam.transcribe_fbank([fb[0]])
    assert detailed[0][0].text == plain[0]


def test_detailed_without_timestamps():
    import pytest

    params = _params(7)
    tr = Transcriber(params, CFG, max_steps=10, t_bucket=16)
    fb = np.random.RandomState(2).randn(16, 8).astype(np.float32)
    (hyps,) = tr.transcribe_fbank_detailed(fb, timestamps=False)
    assert len(hyps) == 1 and len(hyps[0].char_starts) == 0
    # greedy computes no score: NaN ("not computed"), never a fabricated
    # certainty of 0.0
    assert np.isnan(hyps[0].score) and np.isnan(hyps[0].avg_logprob)

    # beam hypotheses DO carry their search score without timestamps
    trb = Transcriber(params, CFG, max_steps=10, t_bucket=16, beam_size=3)
    (bh,) = trb.transcribe_fbank_detailed(fb, timestamps=False)
    assert np.isfinite(bh[0].score)

    # nonsense n_best rejected everywhere
    with pytest.raises(ValueError):
        tr.transcribe_fbank_detailed(fb, n_best=0)
    from ss_asr_tpu.decode.beam import beam_decode_nbest
    import jax.numpy as jnp

    with pytest.raises(ValueError):
        beam_decode_nbest(params, CFG, jnp.zeros((1, 16, 8)),
                          jnp.array([16]), beam_size=4, n_best=0)


def test_hypothesis_words():
    """Word spans derive exactly from the char alignment: split on the
    vocab space, start/end from the chars' attended times, confidence
    the mean of the word's char log-probs."""
    h = align_mod.Hypothesis(
        text="ab cd  e",
        score=-4.0,
        avg_logprob=-0.5,
        char_starts=np.array([0.0, 0.08, 0.16, 0.24, 0.32, 0.40, 0.48,
                              0.56], np.float32),
        char_frames=np.arange(8, dtype=np.int32),
        char_logps=np.array([-1, -2, -9, -3, -4, -9, -9, -5], np.float32),
    )
    w = h.words()
    assert [x["word"] for x in w] == ["ab", "cd", "e"]
    assert w[0]["start"] == 0.0
    np.testing.assert_allclose(
        w[0]["end"], 0.08 + align_mod.SECONDS_PER_ENC_FRAME, atol=1e-6)
    np.testing.assert_allclose(w[0]["avg_logprob"], -1.5, atol=1e-6)
    np.testing.assert_allclose(w[1]["avg_logprob"], -3.5, atol=1e-6)
    np.testing.assert_allclose(w[2]["avg_logprob"], -5.0, atol=1e-6)
    # space chars (incl. doubles) produce no words; per-word times span
    # exactly the word's chars
    np.testing.assert_allclose(w[2]["start"], 0.56, atol=1e-6)

    # without alignment arrays (timestamps=False): words still split,
    # times zero, confidence falls back to the hypothesis avg_logprob
    h2 = align_mod.Hypothesis(
        text="xy z", score=-1.0, avg_logprob=-0.25,
        char_starts=np.zeros((0,), np.float32),
        char_frames=np.zeros((0,), np.int32),
    )
    w2 = h2.words()
    assert [x["word"] for x in w2] == ["xy", "z"]
    assert all(x["avg_logprob"] == -0.25 for x in w2)
    assert align_mod.Hypothesis(
        text="", score=0.0, avg_logprob=0.0,
        char_starts=np.zeros((0,), np.float32),
        char_frames=np.zeros((0,), np.int32)).words() == []


def test_detailed_decode_carries_words():
    params = _params(5)
    tr = Transcriber(params, CFG, max_steps=12, t_bucket=16)
    fb = np.random.RandomState(0).randn(20, 8).astype(np.float32)
    (hyps,) = tr.transcribe_fbank_detailed(fb)
    h = hyps[0]
    assert len(h.char_logps) == len(h.text)
    words = h.words()
    assert "".join(x["word"] for x in words) == h.text.replace(" ", "")
    if words:
        # per-word confidences are means of the aligned char log-probs
        assert all(x["avg_logprob"] <= 0.0 for x in words)
        assert all(x["end"] >= x["start"] for x in words)
