"""Fused attend-and-spell training kernel: parity vs the XLA scan (grads too)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ss_asr_tpu.models import las
from ss_asr_tpu.ops.pallas.spell import attend_and_spell_pallas
from ss_asr_tpu.train import losses
from ss_asr_tpu.vocab import VOCAB_SIZE

CFG = las.ASRConfig(encoder_state_size=8, decoder_state_size=8, mlp_out_size=8, feature_dim=5)


def _setup(rng, B=3, S=12, L=9):
    params = las.init_asr(jax.random.key(0), CFG)
    enc_h = jnp.asarray(rng.standard_normal((B, S, CFG.enc_out_dim)).astype(np.float32))
    enc_lens = jnp.asarray([S, S - 3, S - 7])
    y = jnp.asarray(rng.integers(1, VOCAB_SIZE, (B, L + 1)).astype(np.int32))
    return params, enc_h, enc_lens, y


def test_forward_matches_scan(rng):
    params, enc_h, enc_lens, y = _setup(rng)
    L = y.shape[1] - 1
    key = jax.random.key(7)
    want_logits, want_a = las.attend_and_spell(
        params, CFG, enc_h, enc_lens, L, teacher=y, key=key
    )
    got_logits, got_a = attend_and_spell_pallas(
        params, CFG, enc_h, enc_lens, L, teacher=y, key=key, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(want_logits), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(want_a), atol=2e-5)


@pytest.mark.parametrize("tf_rate", [1.0, 0.5])
def test_grads_match_scan(rng, tf_rate):
    params, enc_h, enc_lens, y = _setup(rng)
    L = y.shape[1] - 1
    key = jax.random.key(3)

    def loss_scan(p, eh):
        logits, _ = las.attend_and_spell(
            p, CFG, eh, enc_lens, L, teacher=y, key=key, tf_rate=tf_rate
        )
        return losses.masked_ce_per_utt(logits, y[:, 1:], y)

    def loss_pallas(p, eh):
        logits, _ = attend_and_spell_pallas(
            p, CFG, eh, enc_lens, L, teacher=y, key=key, tf_rate=tf_rate,
            interpret=True,
        )
        return losses.masked_ce_per_utt(logits, y[:, 1:], y)

    l1 = float(loss_scan(params, enc_h))
    l2 = float(loss_pallas(params, enc_h))
    np.testing.assert_allclose(l2, l1, rtol=1e-5)

    (gp_s, ge_s) = jax.grad(loss_scan, argnums=(0, 1))(params, enc_h)
    (gp_p, ge_p) = jax.grad(loss_pallas, argnums=(0, 1))(params, enc_h)
    np.testing.assert_allclose(np.asarray(ge_p), np.asarray(ge_s), atol=2e-5)
    for path in (
        ("attention", "phi", "w"), ("attention", "psi", "w"), ("attention", "psi", "b"),
        ("decoder", "layer1", "w_ih"), ("decoder", "layer1", "w_hh"), ("decoder", "layer1", "b"),
        ("decoder", "layer2", "w_ih"), ("decoder", "layer2", "w_hh"), ("decoder", "layer2", "b"),
        ("char_trans", "w"), ("char_trans", "b"), ("embed", "table"),
    ):
        a, b = gp_p, gp_s
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, err_msg="/".join(path)
        )
    # encoder subtree gets no grad from the decoder loop in either impl
    assert float(jnp.abs(gp_p["encoder"]["pblstm1"]["fwd"]["w_ih"]).sum()) == 0.0


def test_greedy_forward_matches_scan(rng):
    """No-teacher eval forward: kernel with zero draws == scan greedy path."""
    from ss_asr_tpu.ops.pallas.spell import attend_and_spell_pallas_greedy

    params, enc_h, enc_lens, y = _setup(rng)
    L = 8
    want_logits, want_a = las.attend_and_spell(params, CFG, enc_h, enc_lens, L)
    got_logits, got_a = attend_and_spell_pallas_greedy(
        params, CFG, enc_h, enc_lens, L, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(want_logits), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(want_a), atol=2e-5)


def test_attention_map_cotangent_matches_scan(rng):
    """A loss term on the returned attention maps must differentiate
    identically through the fused kernel and the scan (the kernel's backward
    streams the external da cotangent into the recurrence)."""
    params, enc_h, enc_lens, y = _setup(rng)
    L = y.shape[1] - 1
    key = jax.random.key(11)

    def make_loss(spell_fn, **kw):
        def loss(p, eh):
            logits, att = spell_fn(
                p, CFG, eh, enc_lens, L, teacher=y, key=key, tf_rate=1.0, **kw
            )
            ce = losses.masked_ce_per_utt(logits, y[:, 1:], y)
            # attention-entropy style regularizer: nonzero cotangent on att
            reg = jnp.mean(jnp.sum(att**2, axis=-1))
            return ce + 0.5 * reg
        return loss

    loss_scan = make_loss(las.attend_and_spell)
    loss_pallas = make_loss(attend_and_spell_pallas, interpret=True)

    np.testing.assert_allclose(
        float(loss_pallas(params, enc_h)), float(loss_scan(params, enc_h)), rtol=1e-5
    )
    (gp_s, ge_s) = jax.grad(loss_scan, argnums=(0, 1))(params, enc_h)
    (gp_p, ge_p) = jax.grad(loss_pallas, argnums=(0, 1))(params, enc_h)
    np.testing.assert_allclose(np.asarray(ge_p), np.asarray(ge_s), atol=2e-5)
    for path in (
        ("attention", "phi", "w"), ("attention", "psi", "w"),
        ("decoder", "layer1", "w_ih"), ("decoder", "layer1", "w_hh"),
        ("decoder", "layer2", "w_ih"), ("char_trans", "w"), ("embed", "table"),
    ):
        a, b = gp_p, gp_s
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, err_msg="/".join(path)
        )


@pytest.mark.parametrize("B", [6, 5])  # 6: exact-divisor blocks; 5: padded
def test_batch_blocked_grid_matches_scan(rng, monkeypatch, B):
    """Past BATCH_BLOCK_MAX rows the kernels run a 2-D (batch-block, L-chunk)
    grid; values AND grads must match the scan through both the exact-divisor
    and the padded-batch routes."""
    from ss_asr_tpu.ops.pallas import spell as spell_mod

    monkeypatch.setattr(spell_mod, "BATCH_BLOCK_MAX", 4)
    S, L = 12, 9
    params = las.init_asr(jax.random.key(0), CFG)
    enc_h = jnp.asarray(rng.standard_normal((B, S, CFG.enc_out_dim)).astype(np.float32))
    enc_lens = jnp.asarray([S - (i % 4) for i in range(B)])
    y = jnp.asarray(rng.integers(1, VOCAB_SIZE, (B, L + 1)).astype(np.int32))
    key = jax.random.key(5)

    bb, bp = spell_mod._batch_block(B)
    assert bb <= 4 and (bp > B) == (B == 5)

    want_logits, want_a = las.attend_and_spell(
        params, CFG, enc_h, enc_lens, L, teacher=y, key=key
    )
    got_logits, got_a = attend_and_spell_pallas(
        params, CFG, enc_h, enc_lens, L, teacher=y, key=key, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(want_logits), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(want_a), atol=2e-5)

    def make_loss(spell_fn, **kw):
        def loss(p, eh):
            logits, _ = spell_fn(
                p, CFG, eh, enc_lens, L, teacher=y, key=key, tf_rate=0.5, **kw
            )
            return losses.masked_ce_per_utt(logits, y[:, 1:], y)
        return loss

    (gp_s, ge_s) = jax.grad(make_loss(las.attend_and_spell), argnums=(0, 1))(params, enc_h)
    (gp_p, ge_p) = jax.grad(
        make_loss(attend_and_spell_pallas, interpret=True), argnums=(0, 1)
    )(params, enc_h)
    np.testing.assert_allclose(np.asarray(ge_p), np.asarray(ge_s), atol=2e-5)
    for path in (
        ("attention", "phi", "w"), ("attention", "psi", "w"),
        ("decoder", "layer1", "w_ih"), ("decoder", "layer1", "w_hh"),
        ("decoder", "layer2", "w_ih"), ("decoder", "layer2", "w_hh"),
        ("char_trans", "w"), ("embed", "table"),
    ):
        a, b = gp_p, gp_s
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, err_msg="/".join(path)
        )


def test_batch_block_policy():
    """Block-size policy pins the on-chip verified points: whole-batch
    blocks to 48 rows, 32-row blocks to two max blocks (48-row blocks in
    a multi-block grid trip a Mosaic internal error on real TPU — B=96
    probe), 16-row blocks beyond (B=128 @ BB=32 overflows scoped vmem;
    see spell.py)."""
    from ss_asr_tpu.ops.pallas import spell as spell_mod

    assert spell_mod._batch_block(32) == (32, 32)
    assert spell_mod._batch_block(48) == (48, 48)
    assert spell_mod._batch_block(64) == (32, 64)
    assert spell_mod._batch_block(96) == (32, 96)
    assert spell_mod._batch_block(128) == (16, 128)
    assert spell_mod._batch_block(256) == (16, 256)
    bb, bp = spell_mod._batch_block(101)  # prime: no divisor, padded route
    assert bb == 16 and bp == 112 and bp % bb == 0
    bb, bp = spell_mod._batch_block(100)  # 10 divides but is unaligned: pad
    assert bb == 16 and bp == 112


def test_spell_impl_knob(monkeypatch):
    """SPELL_IMPL mirrors LSTM_IMPL: "scan"/"pallas" force a path, "auto"
    follows the LSTM gate. Escape hatch for the wide-decoder (H>=512)
    compiler crash documented on the knob (ops/rnn.py)."""
    from ss_asr_tpu.ops import rnn

    monkeypatch.setattr(rnn, "SPELL_IMPL", "pallas")
    assert rnn._use_pallas_spell()
    monkeypatch.setattr(rnn, "SPELL_IMPL", "scan")
    assert not rnn._use_pallas_spell()
    monkeypatch.setattr(rnn, "SPELL_IMPL", "auto")
    assert rnn._use_pallas_spell() == rnn._use_pallas_lstm()
    # H-aware auto gating: wide decoders fall back to scan (compiler
    # crash boundary), wide LSTMs past the VMEM weight limit likewise;
    # explicit "pallas" still forces the kernel
    assert not rnn._use_pallas_spell(rnn.SPELL_KERNEL_MAX_H + 1)
    assert not rnn._use_pallas_lstm(rnn.LSTM_KERNEL_MAX_H + 1)
    monkeypatch.setattr(rnn, "SPELL_IMPL", "pallas")
    assert rnn._use_pallas_spell(rnn.SPELL_KERNEL_MAX_H + 1)
    monkeypatch.setattr(rnn, "LSTM_IMPL", "pallas")
    assert rnn._use_pallas_lstm(rnn.LSTM_KERNEL_MAX_H + 1)
