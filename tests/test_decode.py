import jax
import jax.numpy as jnp
import numpy as np

from ss_asr_tpu.decode import greedy
from ss_asr_tpu.models import charlm, las
from ss_asr_tpu.vocab import EOS_ID, SOS_ID, VOCAB_SIZE

CFG = las.ASRConfig(encoder_state_size=8, decoder_state_size=8, mlp_out_size=8, feature_dim=5)
LM_CFG = charlm.CharLMConfig(hidden_size=8)


def _inputs(rng, B=2, T=16):
    x = jnp.asarray(rng.standard_normal((B, T, CFG.feature_dim)).astype(np.float32))
    lens = jnp.asarray([T] * B)
    return x, lens


def test_greedy_decode_shapes(rng):
    params = las.init_asr(jax.random.key(0), CFG)
    x, lens = _inputs(rng)
    toks, out_lens = greedy.greedy_decode(params, CFG, x, lens, max_steps=12)
    assert toks.shape == (2, 12)
    assert out_lens.shape == (2,)
    toks = np.asarray(toks)
    out_lens = np.asarray(out_lens)
    # everything at/after the emitted length is the pad symbol
    for b in range(2):
        assert np.all(toks[b, out_lens[b] :] == SOS_ID)
        assert not np.any(toks[b, : out_lens[b]] == EOS_ID)


def test_greedy_decode_with_lm_changes_output_scores(rng):
    params = las.init_asr(jax.random.key(1), CFG)
    lm_params = charlm.init_charlm(jax.random.key(2), LM_CFG)
    x, lens = _inputs(rng)
    t0, _ = greedy.greedy_decode(params, CFG, x, lens, max_steps=12)
    t1, _ = greedy.greedy_decode(
        params, CFG, x, lens, max_steps=12, lm_params=lm_params, lm_cfg=LM_CFG, lm_weight=5.0
    )
    # a strong LM weight should perturb at least some of the decode
    assert t0.shape == t1.shape
    # not asserting inequality strictly (could coincide), but shapes+types hold
    assert t1.dtype == t0.dtype


def test_greedy_matches_manual_loop(rng):
    """Batched scan decode must equal a per-step python reimplementation."""
    params = las.init_asr(jax.random.key(3), CFG)
    x, lens = _inputs(rng, B=1, T=16)
    max_steps = 8
    toks, out_len = greedy.greedy_decode(params, CFG, x, lens, max_steps=max_steps)

    from ss_asr_tpu.ops import rnn as r

    enc_h, enc_lens = las.listener_apply(params["encoder"], x, lens)
    comp = las.attention_precompute(params["attention"], enc_h)
    valid = las.attention_mask(enc_lens, enc_h.shape[1])
    state = las.speller_init_state(1, CFG)
    last = jnp.array([SOS_ID], dtype=jnp.int32)
    got = []
    for t in range(max_steps):
        _, ctx = las.attention_step(params["attention"], comp, enc_h, state[0][0], valid)
        dec_in = jnp.concatenate([r.embed(params["embed"], last), ctx], axis=-1)
        state, out = las.speller_step(params["decoder"], dec_in, state)
        logp = jax.nn.log_softmax(r.linear(params["char_trans"], out))
        ids = jnp.argmax(logp, axis=-1).astype(jnp.int32)
        if int(ids[0]) == EOS_ID:
            break
        got.append(int(ids[0]))
        last = ids
    assert int(out_len[0]) == len(got) or int(out_len[0]) == max_steps
    np.testing.assert_array_equal(np.asarray(toks)[0, : len(got)], got)


def test_decode_respects_done_flag(rng):
    """After a sample finishes, its emitted tokens must all be pad."""
    params = las.init_asr(jax.random.key(4), CFG)
    x, lens = _inputs(rng, B=3, T=24)
    toks, out_lens = greedy.greedy_decode(params, CFG, x, lens, max_steps=30)
    toks, out_lens = np.asarray(toks), np.asarray(out_lens)
    for b in range(3):
        assert np.all(toks[b, out_lens[b] :] == SOS_ID)


def test_early_exit_matches_scan_decode(rng):
    from ss_asr_tpu.decode.greedy import greedy_decode_early_exit

    params = las.init_asr(jax.random.key(5), CFG)
    x, lens = _inputs(rng, B=3, T=24)
    t1, l1 = greedy.greedy_decode(params, CFG, x, lens, max_steps=20)
    t2, l2 = greedy_decode_early_exit(params, CFG, x, lens, max_steps=20)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_early_exit_with_lm(rng):
    from ss_asr_tpu.decode.greedy import greedy_decode_early_exit

    params = las.init_asr(jax.random.key(6), CFG)
    lm_params = charlm.init_charlm(jax.random.key(7), LM_CFG)
    x, lens = _inputs(rng, B=2)
    t1, l1 = greedy.greedy_decode(
        params, CFG, x, lens, max_steps=15, lm_params=lm_params, lm_cfg=LM_CFG, lm_weight=0.4
    )
    t2, l2 = greedy_decode_early_exit(
        params, CFG, x, lens, max_steps=15, lm_params=lm_params, lm_cfg=LM_CFG, lm_weight=0.4
    )
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_greedy_lm_fusion_matches_manual_oracle(rng):
    """LM shallow fusion must follow log_softmax(ASR) + w*log_softmax(LM)
    exactly — validated against a per-step python loop stepping the char LM
    alongside the speller (reference src/asr.py:143-156). The fused decode
    must also actually differ from the no-LM decode for this biased LM."""
    from ss_asr_tpu.ops import rnn as r

    params = las.init_asr(jax.random.key(3), CFG)
    lm_params = charlm.init_charlm(jax.random.key(9), LM_CFG)
    # bias the LM hard toward one character so fusion provably changes paths
    lm_params["out"]["b"] = lm_params["out"]["b"].at[7].add(4.0)
    w = 2.0
    x, lens = _inputs(rng, B=1, T=16)
    max_steps = 8
    toks, out_len = greedy.greedy_decode(
        params, CFG, x, lens, max_steps=max_steps,
        lm_params=lm_params, lm_cfg=LM_CFG, lm_weight=w,
    )
    toks_nolm, _ = greedy.greedy_decode(params, CFG, x, lens, max_steps=max_steps)
    assert not np.array_equal(np.asarray(toks), np.asarray(toks_nolm)), (
        "fusion with a strongly biased LM must change the decode"
    )

    enc_h, enc_lens = las.listener_apply(params["encoder"], x, lens)
    comp = las.attention_precompute(params["attention"], enc_h)
    valid = las.attention_mask(enc_lens, enc_h.shape[1])
    state = las.speller_init_state(1, CFG)
    lm_state = charlm.init_state(1, LM_CFG)
    last = jnp.array([SOS_ID], dtype=jnp.int32)
    got = []
    for t in range(max_steps):
        _, ctx = las.attention_step(params["attention"], comp, enc_h, state[0][0], valid)
        dec_in = jnp.concatenate([r.embed(params["embed"], last), ctx], axis=-1)
        state, out = las.speller_step(params["decoder"], dec_in, state)
        lm_logits, lm_state = charlm.step(lm_params, last, lm_state)
        fused = jax.nn.log_softmax(r.linear(params["char_trans"], out)) + w * jax.nn.log_softmax(lm_logits)
        ids = jnp.argmax(fused, axis=-1).astype(jnp.int32)
        if int(ids[0]) == EOS_ID:
            break
        got.append(int(ids[0]))
        last = ids
    assert int(out_len[0]) == len(got) or int(out_len[0]) == max_steps
    np.testing.assert_array_equal(np.asarray(toks)[0, : len(got)], got)
