import jax
import jax.numpy as jnp
import numpy as np

from ss_asr_tpu.decode.greedy import greedy_decode
from ss_asr_tpu.models import las
from ss_asr_tpu.ops.pallas.decode import greedy_decode_pallas

CFG = las.ASRConfig(encoder_state_size=8, decoder_state_size=8, mlp_out_size=8, feature_dim=5)


def test_pallas_decode_matches_scan(rng):
    params = las.init_asr(jax.random.key(0), CFG)
    x = jnp.asarray(rng.standard_normal((2, 16, 5)).astype(np.float32))
    lens = jnp.asarray([16, 16])
    t1, l1 = greedy_decode(params, CFG, x, lens, max_steps=12)
    t2, l2 = greedy_decode_pallas(params, CFG, x, lens, max_steps=12, interpret=True)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_pallas_decode_masked_lengths(rng):
    params = las.init_asr(jax.random.key(1), CFG)
    x = jnp.asarray(rng.standard_normal((2, 24, 5)).astype(np.float32))
    lens = jnp.asarray([24, 9])
    t1, l1 = greedy_decode(params, CFG, x, lens, max_steps=10)
    t2, l2 = greedy_decode_pallas(params, CFG, x, lens, max_steps=10, interpret=True)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_pallas_decode_with_lm_matches_scan(rng):
    from ss_asr_tpu.models import charlm
    from ss_asr_tpu.ops.pallas.decode import greedy_decode_lm_pallas

    lm_cfg = charlm.CharLMConfig(hidden_size=8)
    params = las.init_asr(jax.random.key(2), CFG)
    lm_params = charlm.init_charlm(jax.random.key(3), lm_cfg)
    x = jnp.asarray(rng.standard_normal((2, 16, 5)).astype(np.float32))
    lens = jnp.asarray([16, 10])
    t1, l1 = greedy_decode(
        params, CFG, x, lens, max_steps=10,
        lm_params=lm_params, lm_cfg=lm_cfg, lm_weight=0.7,
    )
    t2, l2 = greedy_decode_lm_pallas(
        params, CFG, x, lens, lm_params, 0.7, max_steps=10, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_pallas_decode_early_done_pad_branch(rng):
    """Params biased to emit EOS at step 1: all rows finish immediately, so
    steps 2..max_steps take the kernel's predicated all-done pad branch —
    outputs must still match the XLA scan exactly."""
    params = las.init_asr(jax.random.key(5), CFG)
    from ss_asr_tpu.vocab import EOS_ID

    b = np.asarray(params["char_trans"]["b"]).copy()
    b[EOS_ID] = 50.0
    params = dict(params)
    params["char_trans"] = {"w": params["char_trans"]["w"],
                            "b": jnp.asarray(b)}
    x = jnp.asarray(rng.standard_normal((2, 16, 5)).astype(np.float32))
    lens = jnp.asarray([16, 16])
    t1, l1 = greedy_decode(params, CFG, x, lens, max_steps=12)
    t2, l2 = greedy_decode_pallas(params, CFG, x, lens, max_steps=12,
                                  interpret=True)
    assert int(np.asarray(l1).max()) <= 1  # the bias actually fired
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_raised_vmem_routing_is_top_level_only(monkeypatch):
    """The raised-scoped-VMEM executables carry ``compiler_options``, which
    jax rejects on a jit inlined into an outer trace — composed callers
    (bench's decode chains, any user jit wrapping a decode entry point)
    must get the plain jit. Regression for the round-4 bench crash:
    ``beam_device_pallas`` inside an outer jit raised ValueError on TPU."""
    import jax

    from ss_asr_tpu.ops import rnn
    from ss_asr_tpu.ops.pallas import decode as pd

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # top level: big batches route to the raised executable
    assert rnn.top_level_call()
    assert pd._greedy_jit_for(64) is pd._greedy_decode_pallas_jit_raised
    assert pd._greedy_jit_for(8) is pd._greedy_decode_pallas_jit

    seen = {}

    @jax.jit
    def probe(x):
        seen["top_level"] = rnn.top_level_call()
        seen["routed"] = pd._greedy_jit_for(64)
        return x

    probe(jnp.zeros(()))
    assert seen["top_level"] is False
    assert seen["routed"] is pd._greedy_decode_pallas_jit
