import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ss_asr_tpu.decode.beam import beam_decode
from ss_asr_tpu.decode.greedy import greedy_decode
from ss_asr_tpu.models import charlm, las
from ss_asr_tpu.vocab import EOS_ID, SOS_ID

CFG = las.ASRConfig(encoder_state_size=8, decoder_state_size=8, mlp_out_size=8, feature_dim=5)
LM_CFG = charlm.CharLMConfig(hidden_size=8)


def _inputs(rng, B=2, T=16):
    x = jnp.asarray(rng.standard_normal((B, T, CFG.feature_dim)).astype(np.float32))
    return x, jnp.asarray([T] * B)


def test_beam1_matches_greedy(rng):
    """Beam size 1 must reproduce greedy decoding exactly."""
    params = las.init_asr(jax.random.key(0), CFG)
    x, lens = _inputs(rng)
    g_toks, g_lens = greedy_decode(params, CFG, x, lens, max_steps=15)
    b_toks, b_lens = beam_decode(params, CFG, x, lens, beam_size=1, max_steps=15)
    np.testing.assert_array_equal(np.asarray(g_lens), b_lens)
    np.testing.assert_array_equal(np.asarray(g_toks), b_toks)


@pytest.mark.parametrize("eos_bias", [0.0, 3.0])
@pytest.mark.parametrize("use_lm", [False, True])
def test_beam_early_exit_matches_full_scan(rng, eos_bias, use_lm):
    """early_exit=True (while_loop, stop at all-frozen) must be
    token-identical to the fixed-length scan — frozen beams extend on
    zero-cost pads, so the post-exit steps it skips cannot reorder the
    frontier. eos_bias makes hypotheses actually finish early so the
    exit path is exercised, not just the max_steps fallback."""
    params = las.init_asr(jax.random.key(2), CFG)
    if eos_bias:
        b = params["char_trans"]["b"]
        params["char_trans"]["b"] = b.at[EOS_ID].add(eos_bias)
    lm_params = charlm.init_charlm(jax.random.key(3), LM_CFG) if use_lm else None
    x, lens = _inputs(rng, B=3)
    kw = dict(beam_size=4, max_steps=20, lm_params=lm_params,
              lm_cfg=LM_CFG if use_lm else None,
              lm_weight=0.2 if use_lm else 0.0)
    t_scan, l_scan = beam_decode(params, CFG, x, lens, early_exit=False, **kw)
    t_fast, l_fast = beam_decode(params, CFG, x, lens, early_exit=True, **kw)
    np.testing.assert_array_equal(l_scan, l_fast)
    np.testing.assert_array_equal(t_scan, t_fast)


@pytest.mark.parametrize("eos_bias", [0.0, 3.0])
def test_beam_matches_exhaustive_reference(rng, eos_bias):
    """The scan-based frontier must equal a brute-force python beam search.

    The oracle models the implementation's EOS-freeze semantics (a finished
    hypothesis emits pad at zero cost and keeps competing with its frozen
    score). With ``eos_bias`` the output bias is tilted toward EOS so
    finished beams actually enter the frontier mid-scan — without it the
    freeze branch would be untested dead weight under this random init."""
    from ss_asr_tpu.decode import beam as BM
    from ss_asr_tpu.ops import rnn as r

    params = las.init_asr(jax.random.key(1), CFG)
    if eos_bias:
        params["char_trans"]["b"] = (
            params["char_trans"]["b"].at[EOS_ID].add(eos_bias)
        )
    x, lens = _inputs(rng, B=1)
    enc_h, enc_lens = las.listener_apply(params["encoder"], x, lens)
    K, T = 3, 4
    toks, parents, fs, fd, _hl = BM._beam_scan(
        params, CFG, enc_h, enc_lens, K, T, None, None, 0.0
    )
    got_scores = np.sort(np.asarray(fs)[0])[::-1]

    comp = las.attention_precompute(params["attention"], enc_h)
    valid = las.attention_mask(enc_lens, enc_h.shape[1])

    def step(state, last):
        _, ctx = las.attention_step(params["attention"], comp, enc_h, state[0][0], valid)
        dec_in = jnp.concatenate(
            [r.embed(params["embed"], jnp.array([last], dtype=jnp.int32)), ctx], axis=-1
        )
        state, out = las.speller_step(params["decoder"], dec_in, state)
        return state, np.asarray(jax.nn.log_softmax(r.linear(params["char_trans"], out)))[0]

    # beam entry: (score, seq, state, last_id, done). A done hypothesis
    # emits pad (id 0) at zero cost and its state/score freeze — exactly
    # the implementation's frontier semantics (decode/beam.py).
    beams = [(0.0, [], las.speller_init_state(1, CFG), SOS_ID, False)]
    for _ in range(T):
        cands = []
        for sc, seq, st, last, done in beams:
            if done:
                cands.append((sc, seq + [0], st, 0, True))
                continue
            st2, logp = step(st, last)
            for v in range(CFG.vocab_size):
                cands.append(
                    (sc + float(logp[v]), seq + [v], st2, v, v == EOS_ID)
                )
        beams = sorted(cands, key=lambda c: -c[0])[:K]
    if eos_bias:
        # the freeze branch must actually be exercised in both impls
        assert any(b[4] for b in beams)
        assert bool(np.asarray(fd)[0].any())
    # force-termination semantics: every still-open hypothesis pays the cost
    # of emitting EOS from its final state; finished ones keep their score
    terminated = []
    for sc, seq, st, last, done in beams:
        if done:
            terminated.append((sc, seq, st, last, done))
        else:
            _, logp = step(st, last)
            terminated.append((sc + float(logp[EOS_ID]), seq, st, last, done))
    beams = sorted(terminated, key=lambda c: -c[0])
    want_scores = np.array([b[0] for b in beams])
    np.testing.assert_allclose(got_scores, want_scores, atol=1e-4)

    # best sequence must match too (via backtrack)
    out, L = BM._backtrack(np.asarray(toks), np.asarray(parents), np.asarray(fs), np.asarray(fd), T)
    want_best = beams[0][1]
    np.testing.assert_array_equal(out[0][: int(L[0])], want_best[: int(L[0])])


def test_beam_with_lm_runs(rng):
    params = las.init_asr(jax.random.key(2), CFG)
    lm_params = charlm.init_charlm(jax.random.key(3), LM_CFG)
    x, lens = _inputs(rng)
    toks, lengths = beam_decode(
        params, CFG, x, lens, beam_size=4, max_steps=10,
        lm_params=lm_params, lm_cfg=LM_CFG, lm_weight=0.5,
    )
    assert toks.shape == (2, 10)
    for b in range(2):
        assert np.all(toks[b, lengths[b]:] == SOS_ID)
        assert not np.any(toks[b, : lengths[b]] == EOS_ID)


def test_length_norm_beam_contract(rng):
    params = las.init_asr(jax.random.key(4), CFG)
    x, lens = _inputs(rng)
    t_raw, l_raw = beam_decode(params, CFG, x, lens, beam_size=4, max_steps=10)
    t_ln, l_ln = beam_decode(
        params, CFG, x, lens, beam_size=4, max_steps=10, length_norm=True
    )
    # same output contract; selection may differ
    assert t_ln.shape == t_raw.shape
    for b in range(2):
        assert np.all(t_ln[b, l_ln[b]:] == SOS_ID)


def test_length_norm_beam1_matches_greedy(rng):
    """K=1: normalization is monotonic on a single beam -> greedy unchanged."""
    from ss_asr_tpu.decode.greedy import greedy_decode

    params = las.init_asr(jax.random.key(5), CFG)
    x, lens = _inputs(rng)
    g_toks, g_lens = greedy_decode(params, CFG, x, lens, max_steps=12)
    b_toks, b_lens = beam_decode(
        params, CFG, x, lens, beam_size=1, max_steps=12, length_norm=True
    )
    np.testing.assert_array_equal(np.asarray(g_toks), b_toks)
