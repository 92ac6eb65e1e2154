"""Pallas LSTM kernel parity vs the lax.scan reference (interpreter mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ss_asr_tpu.ops import rnn
from ss_asr_tpu.ops.pallas.lstm import lstm_scan_pallas


@pytest.mark.parametrize("B,T,I,H", [(8, 12, 16, 32), (4, 7, 8, 16)])
def test_pallas_matches_scan_full_length(rng, B, T, I, H):
    p = rnn.init_lstm(jax.random.key(0), I, H)
    xs = jnp.asarray(rng.standard_normal((B, T, I)).astype(np.float32))
    want, _ = rnn.lstm_scan(p, xs)
    got = lstm_scan_pallas(p, xs, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pallas_masks_lengths(rng):
    B, T, I, H = 4, 10, 8, 16
    p = rnn.init_lstm(jax.random.key(1), I, H)
    xs = jnp.asarray(rng.standard_normal((B, T, I)).astype(np.float32))
    lens = jnp.asarray([10, 6, 3, 1], dtype=jnp.int32)
    want, _ = rnn.lstm_scan(p, xs, lengths=lens)
    got = lstm_scan_pallas(p, xs, lengths=lens, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    assert np.all(np.asarray(got)[1, 6:] == 0)


def test_pallas_vjp_forward_matches(rng):
    from ss_asr_tpu.ops.pallas.lstm import lstm_scan_pallas_trainable

    B, T, I, H = 4, 9, 8, 16
    p = rnn.init_lstm(jax.random.key(2), I, H)
    xs = jnp.asarray(rng.standard_normal((B, T, I)).astype(np.float32))
    lens = jnp.asarray([9, 7, 4, 2], dtype=jnp.int32)
    want, _ = rnn.lstm_scan(p, xs, lengths=lens)
    got = lstm_scan_pallas_trainable(p, xs, lengths=lens, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_chunk_for_large_batches():
    """_chunk_for shrinks the DMA block so double-buffered streams fit the
    16 MB scoped-VMEM budget (B=128 with CHUNK=8 failed compilation)."""
    from ss_asr_tpu.ops.pallas.lstm import _chunk_for

    assert _chunk_for(8) == 8
    assert _chunk_for(32) == 8
    assert _chunk_for(64) == 8
    assert _chunk_for(128) == 4
    assert _chunk_for(256) == 2
    assert _chunk_for(1024) == 2  # floor


def test_pallas_large_batch_small_chunk_parity(rng):
    """Kernel parity at a batch where the adaptive chunk kicks in (B=80 ->
    chunk 4), including grads and the reverse direction."""
    from ss_asr_tpu.ops.pallas.lstm import _chunk_for, lstm_scan_pallas_trainable

    B, T, I, H = 80, 10, 8, 16
    assert _chunk_for(B) == 4
    p = rnn.init_lstm(jax.random.key(11), I, H)
    xs = jnp.asarray(rng.standard_normal((B, T, I)).astype(np.float32))
    lens = jnp.asarray(
        np.clip(rng.integers(1, T + 1, size=B), 1, T).astype(np.int32)
    )
    w = jnp.asarray(rng.standard_normal((B, T, H)).astype(np.float32))
    for reverse in (False, True):
        want, _ = rnn.lstm_scan(p, xs, lengths=lens, reverse=reverse)
        got = lstm_scan_pallas_trainable(
            p, xs, lengths=lens, interpret=True, reverse=reverse
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, err_msg=f"reverse={reverse}")

        def loss_scan(p):
            y, _ = rnn.lstm_scan(p, xs, lengths=lens, reverse=reverse)
            return jnp.sum(y * w)

        def loss_pallas(p):
            y = lstm_scan_pallas_trainable(
                p, xs, lengths=lens, interpret=True, reverse=reverse
            )
            return jnp.sum(y * w)

        gs = jax.grad(loss_scan)(p)
        gp = jax.grad(loss_pallas)(p)
        for k in ("w_ih", "w_hh", "b"):
            np.testing.assert_allclose(
                np.asarray(gp[k]), np.asarray(gs[k]), atol=2e-4,
                err_msg=f"{k} reverse={reverse}",
            )


def test_pallas_reverse_direction_matches_scan(rng):
    """reverse=True == the packed backward direction (rnn.lstm_scan
    reverse=True), with NO reverse_sequence gathers on either side."""
    from ss_asr_tpu.ops.pallas.lstm import lstm_scan_pallas_trainable

    B, T, I, H = 4, 11, 8, 16
    p = rnn.init_lstm(jax.random.key(7), I, H)
    xs = jnp.asarray(rng.standard_normal((B, T, I)).astype(np.float32))
    for lens in (jnp.asarray([11, 8, 5, 1], dtype=jnp.int32), None):
        want, _ = rnn.lstm_scan(p, xs, lengths=lens, reverse=True)
        got = lstm_scan_pallas_trainable(
            p, xs, lengths=lens, interpret=True, reverse=True
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    # padding positions are exactly zero
    got = lstm_scan_pallas_trainable(
        p, xs, lengths=jnp.asarray([11, 8, 5, 1], jnp.int32),
        interpret=True, reverse=True,
    )
    assert np.all(np.asarray(got)[1, 8:] == 0)


def test_pallas_reverse_grads_match_scan(rng):
    from ss_asr_tpu.ops.pallas.lstm import lstm_scan_pallas_trainable

    B, T, I, H = 4, 9, 8, 16
    p = rnn.init_lstm(jax.random.key(8), I, H)
    xs = jnp.asarray(rng.standard_normal((B, T, I)).astype(np.float32))
    lens = jnp.asarray([9, 7, 4, 2], dtype=jnp.int32)
    w = jnp.asarray(rng.standard_normal((B, T, H)).astype(np.float32))

    def loss_scan(p, xs):
        y, _ = rnn.lstm_scan(p, xs, lengths=lens, reverse=True)
        return jnp.sum(y * w)

    def loss_pallas(p, xs):
        y = lstm_scan_pallas_trainable(
            p, xs, lengths=lens, interpret=True, reverse=True
        )
        return jnp.sum(y * w)

    (gp_s, gx_s) = jax.grad(loss_scan, argnums=(0, 1))(p, xs)
    (gp_p, gx_p) = jax.grad(loss_pallas, argnums=(0, 1))(p, xs)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_s), atol=1e-4)
    for k in ("w_ih", "w_hh", "b"):
        np.testing.assert_allclose(
            np.asarray(gp_p[k]), np.asarray(gp_s[k]), atol=1e-4, err_msg=k
        )


def test_pallas_vjp_grads_match_scan(rng):
    from ss_asr_tpu.ops.pallas.lstm import lstm_scan_pallas_trainable

    B, T, I, H = 4, 9, 8, 16
    p = rnn.init_lstm(jax.random.key(3), I, H)
    xs = jnp.asarray(rng.standard_normal((B, T, I)).astype(np.float32))
    lens = jnp.asarray([9, 7, 4, 2], dtype=jnp.int32)
    w = jnp.asarray(rng.standard_normal((B, T, H)).astype(np.float32))

    def loss_scan(p, xs):
        y, _ = rnn.lstm_scan(p, xs, lengths=lens)
        return jnp.sum(y * w)

    def loss_pallas(p, xs):
        y = lstm_scan_pallas_trainable(p, xs, lengths=lens, interpret=True)
        return jnp.sum(y * w)

    (gp_s, gx_s) = jax.grad(loss_scan, argnums=(0, 1))(p, xs)
    (gp_p, gx_p) = jax.grad(loss_pallas, argnums=(0, 1))(p, xs)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_s), atol=1e-4)
    for k in ("w_ih", "w_hh", "b"):
        np.testing.assert_allclose(
            np.asarray(gp_p[k]), np.asarray(gp_s[k]), atol=1e-4, err_msg=k
        )
