import jax
import jax.numpy as jnp
import numpy as np

from ss_asr_tpu.models import charlm
from ss_asr_tpu.vocab import VOCAB_SIZE

CFG = charlm.CharLMConfig(hidden_size=16)


def test_step_shapes():
    p = charlm.init_charlm(jax.random.key(0), CFG)
    logits, st = charlm.step(p, jnp.zeros((3,), dtype=jnp.int32), charlm.init_state(3, CFG))
    assert logits.shape == (3, VOCAB_SIZE)
    assert st[0].shape == (3, 16)


def test_unroll_matches_stepping_under_full_tf(rng):
    p = charlm.init_charlm(jax.random.key(0), CFG)
    B, L = 2, 9
    labels = jnp.asarray(rng.integers(0, VOCAB_SIZE, (B, L)).astype(np.int32))
    logits = charlm.teacher_forced_unroll(p, CFG, labels, jax.random.key(1), tf_rate=1.0)
    # manual stepping with teacher forcing
    state = charlm.init_state(B, CFG)
    ids = jnp.zeros((B,), dtype=jnp.int32)
    for t in range(L):
        lg, state = charlm.step(p, ids, state)
        np.testing.assert_allclose(np.asarray(logits[:, t]), np.asarray(lg), atol=1e-6)
        ids = labels[:, t]


def test_unroll_trains_to_memorize():
    """A tiny LM must overfit a repeated sequence (loss decreases a lot)."""
    import optax

    p = charlm.init_charlm(jax.random.key(0), CFG)
    labels = jnp.asarray(np.tile(np.arange(3, 13, dtype=np.int32), (4, 1)))

    def loss_fn(p, key):
        logits = charlm.teacher_forced_unroll(p, CFG, labels, key, tf_rate=1.0)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, labels[..., None], axis=-1))

    opt = optax.adam(1e-2)
    st = opt.init(p)
    key = jax.random.key(0)

    @jax.jit
    def train_step(p, st, key):
        loss, g = jax.value_and_grad(loss_fn)(p, key)
        updates, st = opt.update(g, st)
        return optax.apply_updates(p, updates), st, loss

    losses = []
    for i in range(60):
        key, k = jax.random.split(key)
        p, st, loss = train_step(p, st, k)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.2


def test_generate_shapes_and_determinism():
    p = charlm.init_charlm(jax.random.key(0), CFG)
    out1 = charlm.generate(p, CFG, jax.random.key(7), length=20, temp=0.8)
    out2 = charlm.generate(p, CFG, jax.random.key(7), length=20, temp=0.8)
    assert out1.shape == (20,)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert np.all(np.asarray(out1) >= 0) and np.all(np.asarray(out1) < VOCAB_SIZE)


def test_generate_with_prompt():
    p = charlm.init_charlm(jax.random.key(0), CFG)
    prompt = jnp.asarray([0, 5, 6], dtype=jnp.int32)
    out = charlm.generate(p, CFG, jax.random.key(3), length=10, start_ids=prompt)
    assert out.shape == (10,)
