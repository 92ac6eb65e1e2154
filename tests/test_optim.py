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
