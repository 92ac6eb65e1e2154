"""Fused dual-direction BiLSTM kernel parity vs two independent scans."""

import jax
import jax.numpy as jnp
import numpy as np

from ss_asr_tpu.ops import rnn
from ss_asr_tpu.ops.pallas.bilstm import bilstm_pallas_trainable


def _setup(rng, B=4, T=12, In=6, H=8):
    p = rnn.init_bilstm(jax.random.key(0), In, H)
    xs = jnp.asarray(rng.standard_normal((B, T, In)).astype(np.float32))
    lens = jnp.asarray(np.array([12, 9, 5, 1], dtype=np.int32))
    return p, xs, lens


def _ref(p, xs, lens):
    fwd, _ = rnn.lstm_scan(p["fwd"], xs, lens, reverse=False)
    bwd, _ = rnn.lstm_scan(p["bwd"], xs, lens, reverse=True)
    return jnp.concatenate([fwd, bwd], axis=-1)


def test_forward_matches_scan(rng):
    p, xs, lens = _setup(rng)
    want = _ref(p, xs, lens)
    got = bilstm_pallas_trainable(p, xs, lens, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_grads_match_scan(rng):
    p, xs, lens = _setup(rng)

    def loss_ref(p, xs):
        return (_ref(p, xs, lens) ** 2).sum()

    def loss_got(p, xs):
        return (bilstm_pallas_trainable(p, xs, lens, interpret=True) ** 2).sum()

    gp_ref, gx_ref = jax.grad(loss_ref, argnums=(0, 1))(p, xs)
    gp_got, gx_got = jax.grad(loss_got, argnums=(0, 1))(p, xs)
    np.testing.assert_allclose(np.asarray(gx_got), np.asarray(gx_ref), rtol=1e-4, atol=1e-4)
    for d in ("fwd", "bwd"):
        for k in ("w_ih", "w_hh", "b"):
            np.testing.assert_allclose(
                np.asarray(gp_got[d][k]), np.asarray(gp_ref[d][k]),
                rtol=1e-4, atol=1e-4, err_msg=f"{d}/{k}",
            )


def test_full_length_no_mask(rng):
    p, xs, _ = _setup(rng)
    B, T = xs.shape[:2]
    lens = jnp.full((B,), T, dtype=jnp.int32)
    want = _ref(p, xs, lens)
    got = bilstm_pallas_trainable(p, xs, None, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
