import jax
import jax.numpy as jnp
import numpy as np

from ss_asr_tpu.train.optim import make_optimizer, prefix_mask


def test_nan_grads_skip_step():
    """Non-finite grads must leave params AND optimizer state untouched
    (reference NaN-guard semantics, src/trainer.py:131-148)."""
    params = {"w": jnp.ones((3,)), "b": jnp.zeros((2,))}
    opt = make_optimizer("Adam", 0.1)
    st = opt.init(params)

    good = {"w": jnp.ones((3,)), "b": jnp.ones((2,))}
    up, st1 = opt.update(good, st, params)
    p1 = jax.tree.map(lambda a, u: a + u, params, up)
    assert not np.allclose(np.asarray(p1["w"]), np.asarray(params["w"]))

    bad = {"w": jnp.array([1.0, jnp.nan, 1.0]), "b": jnp.ones((2,))}
    up2, st2 = opt.update(bad, st1, p1)
    p2 = jax.tree.map(lambda a, u: a + u, p1, up2)
    np.testing.assert_array_equal(np.asarray(p2["w"]), np.asarray(p1["w"]))
    np.testing.assert_array_equal(np.asarray(p2["b"]), np.asarray(p1["b"]))
    # the INNER optimizer state (Adam mu/nu/count) must be untouched too —
    # a guard that zeroed updates but still ran the inner update would pass
    # the param check while corrupting the accumulators
    for a, b in zip(jax.tree.leaves(st1.inner_state), jax.tree.leaves(st2.inner_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(st2.total_notfinite) == int(st1.total_notfinite) + 1
    # and the good-path update still works afterwards
    up3, _ = opt.update(good, st2, p2)
    p3 = jax.tree.map(lambda a, u: a + u, p2, up3)
    assert not np.allclose(np.asarray(p3["w"]), np.asarray(p2["w"]))


def test_grad_clip_scales_large_grads():
    params = {"w": jnp.zeros((4,))}
    opt = make_optimizer("SGD", 1.0, grad_clip=5.0)
    st = opt.init(params)
    huge = {"w": jnp.full((4,), 100.0)}
    up, _ = opt.update(huge, st, params)
    # clipped global norm == 5
    np.testing.assert_allclose(
        float(jnp.linalg.norm(np.asarray(up["w"]))), 5.0, rtol=1e-5
    )


def test_masked_optimizer_freezes_complement():
    params = {"a": {"w": jnp.ones((2,))}, "b": {"w": jnp.ones((2,))}}
    mask = prefix_mask(params, (("a",),))
    opt = make_optimizer("SGD", 1.0, mask=mask)
    st = opt.init(params)
    grads = {"a": {"w": jnp.ones((2,))}, "b": {"w": jnp.ones((2,))}}
    up, _ = opt.update(grads, st, params)
    assert np.all(np.asarray(up["b"]["w"]) == 0.0)
    assert not np.all(np.asarray(up["a"]["w"]) == 0.0)


def test_grad_accumulation_matches_full_batch():
    """accum_steps=2 over two half-batches == one full-batch step: MultiSteps
    AVERAGES the micro-grads, then clip + inner update run once."""
    params = {"w": jnp.ones((4,))}
    g1 = {"w": jnp.array([1.0, 2.0, 3.0, 4.0])}
    g2 = {"w": jnp.array([3.0, 2.0, 1.0, 0.0])}
    g_full = jax.tree.map(lambda a, b: (a + b) / 2, g1, g2)

    ref = make_optimizer("Adadelta", 1.0)
    st = ref.init(params)
    up_ref, _ = ref.update(g_full, st, params)

    acc = make_optimizer("Adadelta", 1.0, accum_steps=2)
    st = acc.init(params)
    up1, st = acc.update(g1, st, params)
    np.testing.assert_array_equal(np.asarray(up1["w"]), 0.0)  # mid-accumulation
    up2, st = acc.update(g2, st, params)
    np.testing.assert_allclose(np.asarray(up2["w"]), np.asarray(up_ref["w"]), rtol=1e-6)


def test_grad_accumulation_in_asr_trainer(tmp_path):
    """opt.accum_steps=2 with half batches == accum_steps=1 with full batches
    through the REAL trainer loop (tf_rate=1.0 -> RNG-free math)."""
    from tests.conftest import write_asr_corpus
    from ss_asr_tpu.train import ASRTrainer, make_paras

    texts = ["já", "nei", "halló", "takk", "gott", "daginn", "kvöld", "morgunn"]
    idx = write_asr_corpus(tmp_path, texts, feature_dim=8, t0=24, dt=0, scale=0.1)

    def run(name, batch, accum):
        config = {
            "asr": {
                "opt": {"type": "Adadelta", "learning_rate": 1.0,
                         "accum_steps": accum},
                "mdl": {"encoder_state_size": 8, "mlp_out_size": 8,
                         "decoder_state_size": 8, "tf_rate": 1.0,
                         "feature_dim": 8},
                "train_index": idx, "valid_index": idx,
                "t_bucket": 8, "l_bucket": 16, "train_batch_size": batch,
                "valid_batch_size": batch, "n_epochs": 2,
                "valid_step": 10**9, "logging_step": 1, "save_step": 10**9,
                "wer_step": 10**9,
            },
        }
        t = ASRTrainer(config, make_paras(name, str(tmp_path / f"r_{name}"),
                                          str(tmp_path / f"c_{name}"), 1, False))
        t.load_data(); t.set_model(); t.exec()
        return t

    t_full = run("full", batch=8, accum=1)   # 1 step/epoch on all 8 rows
    t_acc = run("acc", batch=4, accum=2)     # 2 half-batches -> 1 update/epoch
    np.testing.assert_allclose(
        np.asarray(t_acc.params["char_trans"]["w"]),
        np.asarray(t_full.params["char_trans"]["w"]), rtol=1e-4, atol=1e-6,
    )


def test_warmup_schedule_ramps_and_decays():
    """opt.warmup_steps/decay_steps: SGD update magnitude ramps 0 -> lr over
    warmup and cosine-decays toward 0 afterwards."""
    from ss_asr_tpu.train.optim import make_schedule

    # constant when unset
    assert make_schedule(1.0) == 1.0
    sched = make_schedule(1.0, warmup_steps=10, decay_steps=100)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(10)), 1.0, rtol=1e-6)
    assert float(sched(100)) < 0.05  # cosine end
    # warmup-only: ramps then holds
    w = make_schedule(2.0, warmup_steps=4)
    np.testing.assert_allclose(float(w(4)), 2.0, rtol=1e-6)
    np.testing.assert_allclose(float(w(400)), 2.0, rtol=1e-6)

    # opt.end_scale sets the cosine floor as a fraction of the peak LR
    floor = make_schedule(2.0, warmup_steps=10, decay_steps=100, end_scale=0.25)
    np.testing.assert_allclose(float(floor(110)), 0.5, rtol=1e-5)
    via_opt = make_optimizer("SGD", 2.0, warmup_steps=10, decay_steps=100,
                             end_scale=0.25)
    params = {"w": jnp.zeros((2,))}
    st = via_opt.init(params)
    for _ in range(120):
        up, st = via_opt.update({"w": jnp.ones((2,))}, st, params)
    np.testing.assert_allclose(-float(up["w"][0]), 0.5, rtol=1e-5)

    opt = make_optimizer("SGD", 1.0, warmup_steps=2, decay_steps=10)
    params = {"w": jnp.zeros((2,))}
    st = opt.init(params)
    g = {"w": jnp.ones((2,))}
    up0, st = opt.update(g, st, params)
    np.testing.assert_array_equal(np.asarray(up0["w"]), 0.0)  # step 0 of warmup
    up1, st = opt.update(g, st, params)
    assert abs(float(up1["w"][0])) > 0.0


def test_update_scales_damps_masked_subtree():
    """update_scales=[(mask, f)] multiplies only the masked leaves' updates:
    factor 0.5 exactly halves them, 0.0 freezes them (the SAE
    listener_lr_scale mechanism)."""
    params = {"enc": jnp.zeros((3,)), "dec": jnp.zeros((3,))}
    g = {"enc": jnp.ones((3,)) * 0.1, "dec": jnp.ones((3,)) * 0.1}
    mask = {"enc": True, "dec": False}

    plain = make_optimizer("SGD", 1.0)
    st = plain.init(params)
    up_plain, _ = plain.update(g, st, params)

    for factor in (0.5, 0.0):
        damped = make_optimizer("SGD", 1.0, update_scales=[(mask, factor)])
        st = damped.init(params)
        up, _ = damped.update(g, st, params)
        np.testing.assert_allclose(
            np.asarray(up["enc"]), np.asarray(up_plain["enc"]) * factor, rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(up["dec"]), np.asarray(up_plain["dec"]), rtol=1e-6
        )
