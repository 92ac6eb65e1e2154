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


def test_pallas_seq_wide_h_bf16_weights_parity(rng):
    """The forward-only seq path (lstm_seq_pallas via lstm_scan_pallas) has
    its own copy of the wide-H DMA-load logic (whh_stream branch,
    pallas/lstm.py) — exercise it at H >= WEIGHT_BF16_MIN_H against the f32
    lax.scan reference, mirroring test_pallas_wide_h_bf16_weights_parity
    for the trainable path.  bf16 W_hh costs ~bf16 rounding of |y| <= 1."""
    from ss_asr_tpu.ops.pallas.lstm import WEIGHT_BF16_MIN_H

    B, T, I, H = 3, 7, 16, WEIGHT_BF16_MIN_H
    p = rnn.init_lstm(jax.random.key(11), I, H)
    xs = jnp.asarray(rng.standard_normal((B, T, I)).astype(np.float32))
    lens = jnp.asarray([7, 4, 2], dtype=jnp.int32)
    want, _ = rnn.lstm_scan(p, xs, lengths=lens)
    got = lstm_scan_pallas(p, xs, lengths=lens, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2)
    # masked rows stay exactly zero regardless of weight dtype
    assert np.all(np.asarray(got)[1, 4:] == 0)
    assert np.all(np.asarray(got)[2, 2:] == 0)


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


def test_chunk_for_wide_h():
    """Wide recurrences shrink the DMA chunk from the WEIGHT side of the
    VMEM budget (the resident [H, 4H] block): the probe-verified v5e
    configurations are C=4 at H=768 and C=2 at H=1024 (B=32).  H <= 512
    keeps the legacy on-chip-verified batch rule exactly."""
    from ss_asr_tpu.ops.pallas.lstm import _chunk_for, _wdt

    assert _chunk_for(32, 256) == 8
    assert _chunk_for(32, 512) == 8
    assert _chunk_for(32, 768) == 2
    assert _chunk_for(32, 1024) == 2
    assert _chunk_for(128, 256) == 4  # legacy batch rule unchanged

    # wide-H programs past the stock scoped-vmem fit get the raised limit
    # (the trainers attach this automatically); None off-TPU / narrow H
    from ss_asr_tpu.ops import rnn as _rnn

    assert _rnn.wide_h_compiler_options(512) is None
    assert _rnn.wide_h_compiler_options(1024) is None  # CPU backend here
    import jax as _jax
    import unittest.mock as _mock

    with _mock.patch.object(_jax, "default_backend", lambda: "tpu"):
        assert _rnn.wide_h_compiler_options(256) is None
        opts = _rnn.wide_h_compiler_options(768)
        assert opts == {"xla_tpu_scoped_vmem_limit_kib": "32768"}
        # spell-kernel co-residency case: D in (256, 512] also needs the
        # raised limit when the spell kernels dispatch (D=512 measured)
        assert _rnn.wide_h_compiler_options(512, spell_h=512) == opts
        assert _rnn.wide_h_compiler_options(256, spell_h=256) is None
    # weight dtype gate: bf16 only at wide H (or explicit KERNEL_DTYPE)
    assert _wdt(256) == jnp.float32
    assert _wdt(512) == jnp.float32
    assert _wdt(768) == jnp.bfloat16
    assert _wdt(1024) == jnp.bfloat16


@pytest.mark.parametrize("reverse", [False, True])
def test_pallas_wide_h_bf16_weights_parity(rng, reverse):
    """H >= WEIGHT_BF16_MIN_H holds W_hh (and the per-step h operand) in
    bf16 — XLA's default TPU matmul precision, f32 accumulation.  Against
    the f32 lax.scan reference that costs ~bf16-rounding of |y| <= 1
    activations; grads must stay directionally exact (the on-chip probe
    measured rel-L2 ~3e-4 at H=768/1024)."""
    from ss_asr_tpu.ops.pallas.lstm import lstm_scan_pallas_trainable

    B, T, I, H = 3, 9, 16, 768
    p = rnn.init_lstm(jax.random.key(7), I, H)
    xs = jnp.asarray(rng.standard_normal((B, T, I)).astype(np.float32))
    lens = jnp.asarray([9, 5, 2], dtype=jnp.int32)
    w = jnp.asarray(rng.standard_normal((B, T, H)).astype(np.float32))

    def loss_scan(p):
        y, _ = rnn.lstm_scan(p, xs, lengths=lens, reverse=reverse)
        return jnp.sum(y * w), y

    def loss_pallas(p):
        y = lstm_scan_pallas_trainable(
            p, xs, lengths=lens, interpret=True, reverse=reverse
        )
        return jnp.sum(y * w), y

    gs, ys = jax.grad(loss_scan, has_aux=True)(p)
    gp, yp = jax.grad(loss_pallas, has_aux=True)(p)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(ys), atol=2e-2)
    # masked rows stay exactly zero regardless of weight dtype
    assert np.all(np.asarray(yp)[1, 5:] == 0)
    for k in ("w_ih", "w_hh", "b"):
        a = np.asarray(gp[k], np.float64).ravel()
        b = np.asarray(gs[k], np.float64).ravel()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)
        assert cos > 0.999, (k, cos)
        rel = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-30)
        assert rel < 2e-2, (k, rel)
