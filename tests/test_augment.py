"""SpecAugment: on-device feature masking (beyond-reference capability)."""

import copy

import jax
import jax.numpy as jnp
import numpy as np

from ss_asr_tpu.ops.augment import SpecAugmentConfig, spec_augment


def _x(rng, B=3, T=20, F=10):
    x = rng.standard_normal((B, T, F)).astype(np.float32) + 5.0
    lens = np.array([20, 14, 8], dtype=np.int32)
    x = x * (np.arange(T)[None, :, None] < lens[:, None, None])
    return jnp.asarray(x), jnp.asarray(lens)


def test_from_dict_gating():
    import pytest

    assert SpecAugmentConfig.from_dict(None) is None
    assert SpecAugmentConfig.from_dict({}) is None
    c = SpecAugmentConfig.from_dict({"n_freq_masks": 1, "freq_mask_width": 3})
    assert c.n_freq_masks == 1 and c.n_time_masks == 2
    with pytest.raises(ValueError, match="n_freq_mask"):
        SpecAugmentConfig.from_dict({"n_freq_mask": 0})  # typo


def test_masks_fill_with_utterance_mean(rng):
    x, lens = _x(rng)
    cfg = SpecAugmentConfig(n_freq_masks=1, freq_mask_width=4,
                            n_time_masks=1, time_mask_width=6)
    out = np.asarray(spec_augment(jax.random.key(0), x, lens, cfg))
    xn = np.asarray(x)
    changed = out != xn
    assert changed.any(), "some region must be masked"
    # every changed value equals that utterance's valid-frame mean in that band
    for b in range(x.shape[0]):
        mean_b = xn[b, : int(lens[b])].mean(axis=0)
        tt, ff = np.nonzero(changed[b])
        np.testing.assert_allclose(out[b, tt, ff], mean_b[ff], rtol=1e-5)


def test_padding_frames_stay_zero(rng):
    x, lens = _x(rng)
    cfg = SpecAugmentConfig()
    out = np.asarray(spec_augment(jax.random.key(1), x, lens, cfg))
    for b, ln in enumerate(np.asarray(lens)):
        assert np.all(out[b, ln:] == 0.0)


def test_zero_width_masks_are_identity(rng):
    x, lens = _x(rng)
    cfg = SpecAugmentConfig(n_freq_masks=2, freq_mask_width=0,
                            n_time_masks=2, time_mask_width=0)
    out = np.asarray(spec_augment(jax.random.key(2), x, lens, cfg))
    np.testing.assert_array_equal(out, np.asarray(x))


def test_adaptive_ratio_validation():
    import pytest

    with pytest.raises(ValueError, match="adaptive_size_ratio"):
        SpecAugmentConfig.from_dict({"adaptive_size_ratio": 1.5})
    with pytest.raises(ValueError, match="adaptive_number_ratio"):
        SpecAugmentConfig.from_dict({"adaptive_number_ratio": -0.1})
    c = SpecAugmentConfig.from_dict(
        {"adaptive_size_ratio": 0.5, "adaptive_number_ratio": 0.1}
    )
    assert c.adaptive_size_ratio == 0.5 and c.adaptive_number_ratio == 0.1


def test_adaptive_size_caps_width_per_utterance(rng):
    """p_S > 0: each time mask's width is bounded by floor(p_S * len) for
    THAT utterance — short rows get proportionally narrow masks."""
    x, lens = _x(rng)  # lens = [20, 14, 8]
    cfg = SpecAugmentConfig(n_freq_masks=0, freq_mask_width=0,
                            n_time_masks=1, time_mask_width=1000,
                            adaptive_size_ratio=0.5)
    ln = np.asarray(lens)
    for seed in range(8):
        out = np.asarray(spec_augment(jax.random.key(seed), x, lens, cfg))
        changed_t = (out != np.asarray(x)).any(axis=-1)  # [B, T]
        for b in range(x.shape[0]):
            assert changed_t[b].sum() <= int(0.5 * ln[b])


def test_adaptive_number_skips_short_utterances(rng):
    """p_M > 0: rows with floor(p_M * len) == 0 receive NO time masks while
    longer rows still can; n_time_masks stays the static cap."""
    x, lens = _x(rng)  # lens = [20, 14, 8]
    cfg = SpecAugmentConfig(n_freq_masks=0, freq_mask_width=0,
                            n_time_masks=4, time_mask_width=6,
                            adaptive_number_ratio=0.1)
    # floor(0.1 * len) = [2, 1, 0] active masks
    long_rows_masked = False
    for seed in range(8):
        out = np.asarray(spec_augment(jax.random.key(seed), x, lens, cfg))
        changed = out != np.asarray(x)
        assert not changed[2].any(), "len-8 row must receive zero masks"
        long_rows_masked |= bool(changed[0].any())
    assert long_rows_masked, "len-20 rows must get masked across seeds"


def test_floor_ratio_exact_integer_products():
    """f32(p)*len can land one ulp below an exact integer (0.13*900 ->
    116.99999...); _floor_ratio must still return the true floor."""
    from ss_asr_tpu.ops.augment import _floor_ratio

    lens = jnp.asarray([900, 300, 100, 7], dtype=jnp.int32)
    got = np.asarray(_floor_ratio(0.13, lens))
    np.testing.assert_array_equal(got, [117, 39, 13, 0])
    got = np.asarray(_floor_ratio(0.21, lens))
    np.testing.assert_array_equal(got, [189, 63, 21, 1])


def test_trainer_runs_with_augment(tmp_path):
    from tests.conftest import write_asr_corpus
    from ss_asr_tpu.train import ASRTrainer, make_paras

    texts = ["já", "nei", "halló", "takk"]
    idx = write_asr_corpus(tmp_path, texts, feature_dim=8, scale=0.1)
    config = {
        "asr": {
            "opt": {"type": "Adadelta", "learning_rate": 1.0},
            "mdl": {"encoder_state_size": 8, "mlp_out_size": 8,
                     "decoder_state_size": 8, "tf_rate": 0.9, "feature_dim": 8},
            "augment": {"n_freq_masks": 1, "freq_mask_width": 2,
                         "n_time_masks": 1, "time_mask_width": 4},
            "train_index": idx, "valid_index": idx,
            "t_bucket": 8, "l_bucket": 16, "train_batch_size": 4,
            "valid_batch_size": 4, "n_epochs": 2, "valid_step": 10**9,
            "logging_step": 1, "save_step": 10**9, "wer_step": 10**9,
        },
    }
    t = ASRTrainer(config, make_paras("aug", str(tmp_path / "r"),
                                      str(tmp_path / "c"), 1, False))
    t.load_data()
    t.set_model()
    logs = []
    t.lg.scalar = lambda k, v, s: logs.append((k, v))
    t.exec()
    ls = [v for k, v in logs if k == "train_loss"]
    assert len(ls) == 2 and all(np.isfinite(ls))

    # augmentation is train-only: valid() forward sees clean features — same
    # eval loss as a no-augment trainer with identical params
    cfg2 = copy.deepcopy(config)
    del cfg2["asr"]["augment"]
    t2 = ASRTrainer(cfg2, make_paras("aug2", str(tmp_path / "r2"),
                                     str(tmp_path / "c2"), 1, False))
    t2.load_data()
    t2.set_model()
    t2.params = t.params
    ev1, ev2 = [], []
    t.lg.scalar = lambda k, v, s: ev1.append((k, v))
    t2.lg.scalar = lambda k, v, s: ev2.append((k, v))
    t.lg.image = t2.lg.image = lambda *a, **kw: None
    t.lg.text = t2.lg.text = lambda *a, **kw: None
    t.valid()
    t2.valid()
    np.testing.assert_allclose(dict(ev1)["eval_loss"], dict(ev2)["eval_loss"], rtol=1e-6)
