"""RNN scan parity tests against torch (CPU) as an independent oracle."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ss_asr_tpu.ops import rnn


def _np(x):
    return np.asarray(x)


def make_lstm_params(tl, reverse=False):
    sfx = "_reverse" if reverse else ""
    return {
        "w_ih": jnp.asarray(getattr(tl, f"weight_ih_l0{sfx}").detach().numpy().T),
        "w_hh": jnp.asarray(getattr(tl, f"weight_hh_l0{sfx}").detach().numpy().T),
        "b": jnp.asarray(
            (getattr(tl, f"bias_ih_l0{sfx}") + getattr(tl, f"bias_hh_l0{sfx}")).detach().numpy()
        ),
    }


def test_lstm_scan_matches_torch_full_length(rng):
    B, T, I, H = 3, 7, 5, 4
    x = rng.standard_normal((B, T, I)).astype(np.float32)
    tl = torch.nn.LSTM(I, H, batch_first=True)
    ys_t, (h_t, c_t) = tl(torch.from_numpy(x))
    p = make_lstm_params(tl)
    ys, (h, c) = rnn.lstm_scan(p, jnp.asarray(x))
    np.testing.assert_allclose(_np(ys), ys_t.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(_np(h), h_t[0].detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(_np(c), c_t[0].detach().numpy(), atol=1e-5)


def test_lstm_scan_packed_semantics(rng):
    """Masked scan must equal torch pack_padded_sequence processing."""
    B, T, I, H = 3, 8, 5, 4
    lens = [8, 5, 2]
    x = rng.standard_normal((B, T, I)).astype(np.float32)
    tl = torch.nn.LSTM(I, H, batch_first=True)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.from_numpy(x), lens, batch_first=True
    )
    out_p, (h_t, _) = tl(packed)
    ys_t, _ = torch.nn.utils.rnn.pad_packed_sequence(out_p, batch_first=True)
    p = make_lstm_params(tl)
    ys, (h, c) = rnn.lstm_scan(p, jnp.asarray(x), lengths=jnp.asarray(lens))
    np.testing.assert_allclose(_np(ys), ys_t.detach().numpy(), atol=1e-5)
    # final state freezes at each sample's true last step
    np.testing.assert_allclose(_np(h), h_t[0].detach().numpy(), atol=1e-5)
    # outputs past length are exactly zero
    assert np.all(_np(ys)[1, 5:] == 0)
    assert np.all(_np(ys)[2, 2:] == 0)


def test_bilstm_matches_torch_packed(rng):
    B, T, I, H = 3, 8, 5, 4
    lens = [8, 6, 3]
    x = rng.standard_normal((B, T, I)).astype(np.float32)
    tl = torch.nn.LSTM(I, H, batch_first=True, bidirectional=True)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.from_numpy(x), lens, batch_first=True
    )
    out_p, _ = tl(packed)
    ys_t, _ = torch.nn.utils.rnn.pad_packed_sequence(out_p, batch_first=True)
    p = {"fwd": make_lstm_params(tl), "bwd": make_lstm_params(tl, reverse=True)}
    ys = rnn.bilstm_scan(p, jnp.asarray(x), lengths=jnp.asarray(lens))
    np.testing.assert_allclose(_np(ys), ys_t.detach().numpy(), atol=1e-5)


def test_gru_step_matches_torch(rng):
    B, I, H = 4, 6, 5
    x = rng.standard_normal((B, I)).astype(np.float32)
    h = rng.standard_normal((B, H)).astype(np.float32)
    tc = torch.nn.GRUCell(I, H)
    h_t = tc(torch.from_numpy(x), torch.from_numpy(h))
    p = {
        "w_ih": jnp.asarray(tc.weight_ih.detach().numpy().T),
        "w_hh": jnp.asarray(tc.weight_hh.detach().numpy().T),
        "b_ih": jnp.asarray(tc.bias_ih.detach().numpy()),
        "b_hh": jnp.asarray(tc.bias_hh.detach().numpy()),
    }
    ours = rnn.gru_step(p, jnp.asarray(x), jnp.asarray(h))
    np.testing.assert_allclose(_np(ours), h_t.detach().numpy(), atol=1e-5)


def test_gru_scan_matches_stepping(rng):
    B, T, I, H = 2, 6, 4, 3
    x = rng.standard_normal((B, T, I)).astype(np.float32)
    import jax

    p = rnn.init_gru(jax.random.key(0), I, H)
    ys, h_last = rnn.gru_scan(p, jnp.asarray(x))
    h = jnp.zeros((B, H))
    for t in range(T):
        h = rnn.gru_step(p, jnp.asarray(x[:, t]), h)
        np.testing.assert_allclose(_np(ys[:, t]), _np(h), atol=1e-6)
    np.testing.assert_allclose(_np(h_last), _np(h), atol=1e-6)


def test_lstm_step_matches_torch_cell(rng):
    B, I, H = 4, 6, 5
    x = rng.standard_normal((B, I)).astype(np.float32)
    h = rng.standard_normal((B, H)).astype(np.float32)
    c = rng.standard_normal((B, H)).astype(np.float32)
    tc = torch.nn.LSTMCell(I, H)
    h_t, c_t = tc(torch.from_numpy(x), (torch.from_numpy(h), torch.from_numpy(c)))
    p = {
        "w_ih": jnp.asarray(tc.weight_ih.detach().numpy().T),
        "w_hh": jnp.asarray(tc.weight_hh.detach().numpy().T),
        "b": jnp.asarray((tc.bias_ih + tc.bias_hh).detach().numpy()),
    }
    h2, c2 = rnn.lstm_step(p, jnp.asarray(x), (jnp.asarray(h), jnp.asarray(c)))
    np.testing.assert_allclose(_np(h2), h_t.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(_np(c2), c_t.detach().numpy(), atol=1e-5)


def test_reverse_sequence():
    xs = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 12, 1))
    lens = jnp.asarray([5])
    rev = rnn.reverse_sequence(xs, lens)
    got = _np(rev)[0, :, 0]
    np.testing.assert_array_equal(got[:5], [4, 3, 2, 1, 0])
    np.testing.assert_array_equal(got[5:], np.arange(5, 12))


def test_downsample_time():
    xs = jnp.asarray(np.arange(2 * 7 * 3, dtype=np.float32).reshape(2, 7, 3))
    out, lens = rnn.downsample_time(xs, jnp.asarray([7, 4]))
    assert out.shape == (2, 3, 6)
    np.testing.assert_array_equal(_np(lens), [3, 2])
    # frame pair concat: out[:, 0] == concat(xs[:,0], xs[:,1])
    np.testing.assert_array_equal(_np(out)[0, 0], _np(xs)[0, :2].reshape(-1))


def test_forget_bias_init():
    import jax

    p = rnn.init_lstm(jax.random.key(0), 4, 8, forget_bias=1.0)
    b = _np(p["b"])
    assert np.all(b[8:16] == 1.0)
    assert np.all(b[:8] == 0.0)
    assert np.all(b[16:] == 0.0)


def test_gru_scan_zeroes_outputs_past_length(rng):
    """Packed-sequence contract: carry freezes AND outputs zero at t >= len."""
    import jax

    B, T, I, H = 2, 6, 4, 3
    x = rng.standard_normal((B, T, I)).astype(np.float32)
    p = rnn.init_gru(jax.random.key(0), I, H)
    lens = jnp.asarray([6, 3])
    ys, h_last = rnn.gru_scan(p, jnp.asarray(x), lengths=lens)
    assert np.all(_np(ys[1, 3:]) == 0.0)
    assert not np.all(_np(ys[1, :3]) == 0.0)
    # the carry froze at the last valid step
    ys_full, _ = rnn.gru_scan(p, jnp.asarray(x))
    np.testing.assert_allclose(_np(h_last[1]), _np(ys_full[1, 2]), atol=1e-6)
