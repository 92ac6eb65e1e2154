"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from ss_asr_tpu.models import las
from ss_asr_tpu.parallel import mesh as pmesh
from ss_asr_tpu.train import losses
from ss_asr_tpu.vocab import VOCAB_SIZE

CFG = las.ASRConfig(encoder_state_size=16, decoder_state_size=16, mlp_out_size=16, feature_dim=8)


def _batch(rng, B=8, T=16, L=9):
    x = rng.standard_normal((B, T, CFG.feature_dim)).astype(np.float32)
    x_lens = np.full((B,), T, dtype=np.int32)
    y = rng.integers(1, VOCAB_SIZE, (B, L)).astype(np.int32)
    return x, x_lens, y


def _loss_fn(params, x, x_lens, y, key):
    _, logits, _ = las.asr_forward(params, CFG, x, x_lens, y.shape[1] - 1, teacher=y, key=key)
    return losses.masked_ce_per_utt(logits, y[:, 1:], y)


def test_eight_devices_present():
    assert len(jax.devices()) == 8


def test_mesh_shapes():
    m = pmesh.make_mesh()
    assert m.shape == {"data": 8, "model": 1}
    m2 = pmesh.make_mesh(n_data=4, n_model=2)
    assert m2.shape == {"data": 4, "model": 2}


def test_param_pspec_rules():
    assert pmesh.param_pspec((128, 64), 2) == P(None, "model")
    assert pmesh.param_pspec((64,), 2) == P()  # 1D replicated
    assert pmesh.param_pspec((50, 7), 2) == P("model", None)  # only dim0 divisible
    assert pmesh.param_pspec((51, 7), 2) == P()  # nothing divisible
    assert pmesh.param_pspec((128, 64), 1) == P()


def test_dp_loss_matches_single_device(rng):
    """Data-parallel sharded loss must equal the unsharded loss exactly."""
    params = las.init_asr(jax.random.key(0), CFG)
    x, x_lens, y = _batch(rng)
    key = jax.random.key(1)

    ref = float(jax.jit(_loss_fn)(params, x, x_lens, y, key))

    m = pmesh.make_mesh(n_data=8, n_model=1)
    batch = pmesh.shard_batch({"x": x, "x_lens": x_lens, "y": y}, m)
    p_sh = pmesh.shard_params(params, m)
    with jax.set_mesh(m):
        got = float(jax.jit(_loss_fn)(p_sh, batch["x"], batch["x_lens"], batch["y"], key))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_tp_loss_matches_single_device(rng):
    """Tensor-parallel (model axis) sharding must not change the math."""
    params = las.init_asr(jax.random.key(0), CFG)
    x, x_lens, y = _batch(rng)
    key = jax.random.key(1)
    ref = float(jax.jit(_loss_fn)(params, x, x_lens, y, key))

    m = pmesh.make_mesh(n_data=4, n_model=2)
    batch = pmesh.shard_batch({"x": x, "x_lens": x_lens, "y": y}, m)
    p_sh = pmesh.shard_params(params, m)
    with jax.set_mesh(m):
        got = float(jax.jit(_loss_fn)(p_sh, batch["x"], batch["x_lens"], batch["y"], key))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_dp_grads_match_single_device(rng):
    params = las.init_asr(jax.random.key(0), CFG)
    x, x_lens, y = _batch(rng)
    key = jax.random.key(1)
    g_ref = jax.jit(jax.grad(_loss_fn))(params, x, x_lens, y, key)

    m = pmesh.make_mesh(n_data=8, n_model=1)
    batch = pmesh.shard_batch({"x": x, "x_lens": x_lens, "y": y}, m)
    p_sh = pmesh.shard_params(params, m)
    with jax.set_mesh(m):
        g = jax.jit(jax.grad(_loss_fn))(p_sh, batch["x"], batch["x_lens"], batch["y"], key)
    a = np.asarray(g["char_trans"]["w"])
    b = np.asarray(g_ref["char_trans"]["w"])
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_pad_batch_to():
    tree = {"x": np.ones((3, 4)), "y": np.arange(3)}
    padded, n_valid = pmesh.pad_batch_to(tree, 8)
    assert padded["x"].shape == (8, 4)
    assert n_valid == 3
    np.testing.assert_array_equal(padded["y"][3:], [2] * 5)


@pytest.mark.slow  # compiles the full graft entry (driver re-checks it)
def test_graft_entry_contract():
    import __graft_entry__ as g

    fn, args = g.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))
    g.dryrun_multichip(8)


def test_shard_map_grads_matches_single_device(rng):
    """Explicit-SPMD DP (shard_map) must equal single-device loss and grads."""
    params = las.init_asr(jax.random.key(0), CFG)
    x, x_lens, y = _batch(rng)
    key = jax.random.key(1)

    def loss_tf(p, x, xl, yy):
        # tf_rate=1: no sampling, so per-device RNG shapes cannot diverge
        _, logits, _ = las.asr_forward(
            p, CFG, x, xl, yy.shape[1] - 1, teacher=yy, key=key, tf_rate=1.0
        )
        return losses.masked_ce_per_utt(logits, yy[:, 1:], yy)

    def grads_fn(p, x, xl, yy):
        return jax.value_and_grad(loss_tf)(p, x, xl, yy)

    ref_loss, ref_grads = jax.jit(grads_fn)(params, x, x_lens, y)

    m = pmesh.make_mesh(n_data=8, n_model=1)
    wrapped = jax.jit(pmesh.shard_map_grads(grads_fn, m, n_batch_args=3))
    with jax.set_mesh(m):
        loss, grads = wrapped(params, x, x_lens, y)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(grads["char_trans"]["w"]),
        np.asarray(ref_grads["char_trans"]["w"]),
        rtol=1e-4, atol=1e-6,
    )


def test_pallas_lstm_partitions_under_gspmd_jit(rng):
    """The fused LSTM kernels carry a custom_partitioning rule: under
    jit+GSPMD auto sharding (jax.set_mesh) with a batch-sharded input, the
    kernel runs per shard instead of crashing or forcing a scan fallback.
    Values and grads must match the unsharded run."""
    from ss_asr_tpu.ops import rnn

    prev_impl, prev_itp = rnn.LSTM_IMPL, rnn.PALLAS_INTERPRET
    rnn.LSTM_IMPL, rnn.PALLAS_INTERPRET = "pallas", True
    try:
        p = rnn.init_bilstm(jax.random.key(0), 8, 16)
        xs = jnp.asarray(rng.standard_normal((16, 24, 8)).astype(np.float32))
        lens = jnp.asarray((rng.integers(8, 25, (16,))).astype(np.int32))

        def loss(p, xs, lens):
            return (rnn.bilstm_scan(p, xs, lens) ** 2).mean()

        ref_l, ref_g = jax.jit(jax.value_and_grad(loss))(p, xs, lens)

        m = pmesh.make_mesh(n_data=8, n_model=1)
        xs_sh = jax.device_put(xs, pmesh.batch_sharding(m, xs.ndim))
        lens_sh = jax.device_put(lens, pmesh.batch_sharding(m, 1))
        p_sh = jax.device_put(p, pmesh.replicated(m))
        with jax.set_mesh(m):
            got_l, got_g = jax.jit(jax.value_and_grad(loss))(p_sh, xs_sh, lens_sh)
        np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(got_g["fwd"]["w_hh"]), np.asarray(ref_g["fwd"]["w_hh"]),
            rtol=1e-4, atol=1e-6,
        )
    finally:
        rnn.LSTM_IMPL, rnn.PALLAS_INTERPRET = prev_impl, prev_itp


def test_full_model_kernels_partition_under_gspmd_jit(rng):
    """The WHOLE flagship forward+backward — Pallas LSTM listener AND fused
    attend-and-spell — runs under jit+GSPMD auto sharding with batch-sharded
    inputs, matching the unsharded run (both kernel families carry
    custom_partitioning rules)."""
    from ss_asr_tpu.ops import rnn
    from ss_asr_tpu.train import losses as L

    prev_impl, prev_itp = rnn.LSTM_IMPL, rnn.PALLAS_INTERPRET
    rnn.LSTM_IMPL, rnn.PALLAS_INTERPRET = "pallas", True
    try:
        params = las.init_asr(jax.random.key(0), CFG)
        x, x_lens, y = _batch(rng)
        key = jax.random.key(1)

        def loss_fn(p, x, xl, yy):
            # tf_rate=1: deterministic regardless of key handling
            _, logits, _ = las.asr_forward(
                p, CFG, x, xl, yy.shape[1] - 1, teacher=yy, key=key, tf_rate=1.0
            )
            return L.masked_ce_per_utt(logits, yy[:, 1:], yy)

        ref_l, ref_g = jax.jit(jax.value_and_grad(loss_fn))(params, x, x_lens, y)

        m = pmesh.make_mesh(n_data=8, n_model=1)
        batch = pmesh.shard_batch({"x": x, "xl": x_lens, "y": y}, m)
        p_rep = jax.device_put(params, pmesh.replicated(m))
        with jax.set_mesh(m):
            got_l, got_g = jax.jit(jax.value_and_grad(loss_fn))(
                p_rep, batch["x"], batch["xl"], batch["y"]
            )
        np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-5)
        for path in (("char_trans", "w"), ("decoder", "layer1", "w_hh"),
                     ("encoder", "pblstm1", "fwd", "w_hh")):
            a, b = ref_g, got_g
            for k in path:
                a, b = a[k], b[k]
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-6,
                err_msg="/".join(path),
            )
    finally:
        rnn.LSTM_IMPL, rnn.PALLAS_INTERPRET = prev_impl, prev_itp
