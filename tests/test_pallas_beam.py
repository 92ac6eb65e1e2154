"""Fused beam-search kernel vs the XLA beam scan — exact parity.

The kernel is fixed-trip, so the honest XLA counterpart is
``beam_decode(early_exit=False)`` (identical results to early-exit by the
frozen-beam argument tested in test_beam.py). Tokens, lengths, and the
final backtracked transcripts must match exactly; scores to float tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ss_asr_tpu.decode.beam import _beam_device, beam_decode
from ss_asr_tpu.models import charlm, las
from ss_asr_tpu.ops.pallas.beam import beam_decode_pallas, beam_device_pallas

CFG = las.ASRConfig(encoder_state_size=8, decoder_state_size=8,
                    mlp_out_size=8, feature_dim=5)


@pytest.mark.parametrize("K", [2, 4])
def test_beam_kernel_matches_scan(rng, K):
    params = las.init_asr(jax.random.key(0), CFG)
    x = jnp.asarray(rng.standard_normal((2, 16, 5)).astype(np.float32))
    lens = jnp.asarray([16, 16])
    t1, l1 = beam_decode(params, CFG, x, lens, beam_size=K, max_steps=10,
                         early_exit=False)
    t2, l2 = beam_decode_pallas(params, CFG, x, lens, beam_size=K,
                                max_steps=10, interpret=True)
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_array_equal(t1, t2)


def test_beam_kernel_device_outputs_match(rng):
    """Full frontier parity: tokens/parents/done/hyp_len exact, scores to
    float tolerance (the kernel's EOS charge runs in-kernel)."""
    params = las.init_asr(jax.random.key(1), CFG)
    x = jnp.asarray(rng.standard_normal((2, 24, 5)).astype(np.float32))
    lens = jnp.asarray([24, 9])
    K, T = 4, 8
    toks1, par1, sc1, done1, hyp1 = _beam_device(
        params, CFG, x, lens, K, T, None, None, 0.0, early_exit=False)
    toks2, par2, sc2, done2, hyp2 = beam_device_pallas(
        params, CFG, x, lens, beam_size=K, max_steps=T, interpret=True)
    np.testing.assert_array_equal(np.asarray(toks1), np.asarray(toks2))
    np.testing.assert_array_equal(np.asarray(par1), np.asarray(par2))
    np.testing.assert_array_equal(np.asarray(done1), np.asarray(done2))
    np.testing.assert_array_equal(np.asarray(hyp1), np.asarray(hyp2))
    np.testing.assert_allclose(np.asarray(sc1), np.asarray(sc2),
                               rtol=1e-5, atol=1e-5)


def test_beam_kernel_lm_fusion_matches_scan(rng):
    lm_cfg = charlm.CharLMConfig(hidden_size=8)
    params = las.init_asr(jax.random.key(2), CFG)
    lm_params = charlm.init_charlm(jax.random.key(3), lm_cfg)
    x = jnp.asarray(rng.standard_normal((2, 16, 5)).astype(np.float32))
    lens = jnp.asarray([16, 10])
    t1, l1 = beam_decode(params, CFG, x, lens, beam_size=3, max_steps=10,
                         lm_params=lm_params, lm_cfg=lm_cfg, lm_weight=0.3,
                         early_exit=False)
    t2, l2 = beam_decode_pallas(params, CFG, x, lens, beam_size=3,
                                max_steps=10, lm_params=lm_params,
                                lm_cfg=lm_cfg, lm_weight=0.3, interpret=True)
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_array_equal(t1, t2)


def test_beam_kernel_length_norm_path(rng):
    params = las.init_asr(jax.random.key(4), CFG)
    x = jnp.asarray(rng.standard_normal((1, 16, 5)).astype(np.float32))
    lens = jnp.asarray([16])
    t1, l1 = beam_decode(params, CFG, x, lens, beam_size=2, max_steps=8,
                         length_norm=True, early_exit=False)
    t2, l2 = beam_decode_pallas(params, CFG, x, lens, beam_size=2,
                                max_steps=8, length_norm=True,
                                interpret=True)
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_array_equal(l1, l2)


def test_beam_kernel_early_done_pad_branch(rng):
    """EOS-biased params freeze the whole frontier at step 1; the
    predicated pad branch must reproduce the XLA fixed-trip trace
    (token=pad, parent=identity, scores/done/hyp unchanged) exactly."""
    from ss_asr_tpu.vocab import EOS_ID

    params = las.init_asr(jax.random.key(6), CFG)
    b = np.asarray(params["char_trans"]["b"]).copy()
    b[EOS_ID] = 50.0
    params = dict(params)
    params["char_trans"] = {"w": params["char_trans"]["w"],
                            "b": jnp.asarray(b)}
    x = jnp.asarray(rng.standard_normal((2, 16, 5)).astype(np.float32))
    lens = jnp.asarray([16, 16])
    K, T = 3, 10
    toks1, par1, sc1, done1, hyp1 = _beam_device(
        params, CFG, x, lens, K, T, None, None, 0.0, early_exit=False)
    toks2, par2, sc2, done2, hyp2 = beam_device_pallas(
        params, CFG, x, lens, beam_size=K, max_steps=T, interpret=True)
    assert bool(np.asarray(done1).all())  # the bias actually froze everything
    np.testing.assert_array_equal(np.asarray(toks1), np.asarray(toks2))
    np.testing.assert_array_equal(np.asarray(par1), np.asarray(par2))
    np.testing.assert_allclose(np.asarray(sc1), np.asarray(sc2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(hyp1), np.asarray(hyp2))


def test_beam_kernel_partial_done_mixed_frontier(rng):
    """A moderate EOS bias makes SOME beams finish mid-decode while others
    stay live — exercising the frozen-beam pad rows inside an active
    frontier (distinct from the all-done pad branch)."""
    from ss_asr_tpu.vocab import EOS_ID

    params = las.init_asr(jax.random.key(7), CFG)
    b = np.asarray(params["char_trans"]["b"]).copy()
    b[EOS_ID] = 1.5  # competitive, not dominant
    params = dict(params)
    params["char_trans"] = {"w": params["char_trans"]["w"],
                            "b": jnp.asarray(b)}
    x = jnp.asarray(rng.standard_normal((3, 16, 5)).astype(np.float32))
    lens = jnp.asarray([16, 12, 16])
    K, T = 4, 12
    toks1, par1, sc1, done1, hyp1 = _beam_device(
        params, CFG, x, lens, K, T, None, None, 0.0, early_exit=False)
    toks2, par2, sc2, done2, hyp2 = beam_device_pallas(
        params, CFG, x, lens, beam_size=K, max_steps=T, interpret=True)
    # mixed-frontier evidence: beams froze at DIFFERENT steps (varying
    # hypothesis lengths), so live and frozen beams coexisted mid-decode
    h = np.asarray(hyp1)
    assert np.asarray(done1).any() and h.min() < h.max(), h
    np.testing.assert_array_equal(np.asarray(toks1), np.asarray(toks2))
    np.testing.assert_array_equal(np.asarray(par1), np.asarray(par2))
    np.testing.assert_array_equal(np.asarray(hyp1), np.asarray(hyp2))
    np.testing.assert_allclose(np.asarray(sc1), np.asarray(sc2),
                               rtol=1e-5, atol=1e-5)
