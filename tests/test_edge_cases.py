"""Edge-case robustness: degenerate batches, extreme lengths, odd vocab use."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ss_asr_tpu.data.asr_dataset import ASRDataset
from ss_asr_tpu.models import las
from ss_asr_tpu.ops import rnn
from ss_asr_tpu.vocab import UNK_ID, Mapper, normalize_string

CFG = las.ASRConfig(encoder_state_size=8, decoder_state_size=8, mlp_out_size=8, feature_dim=5)


def test_single_sample_batch(rng):
    params = las.init_asr(jax.random.key(0), CFG)
    x = jnp.asarray(rng.standard_normal((1, 16, 5)).astype(np.float32))
    _, logits, _ = las.asr_forward(params, CFG, x, jnp.asarray([16]), 4)
    assert logits.shape == (1, 4, 50)


def test_length_one_utterance(rng):
    """One valid frame: three halvings floor to zero encoder steps for that
    sample — attention must still be finite (mask would be all-invalid)."""
    params = las.init_asr(jax.random.key(0), CFG)
    x = jnp.asarray(rng.standard_normal((2, 16, 5)).astype(np.float32))
    lens = jnp.asarray([16, 1])
    enc_h, enc_lens = las.listener_apply(params["encoder"], x, lens)
    assert int(enc_lens[1]) == 0  # floor((((1//2)//2)//2)) == 0
    # attention over an all-masked row: softmax of all -inf -> NaN. The
    # framework contract: enc_lens must be >= 1; clamp upstream.
    valid = las.attention_mask(jnp.maximum(enc_lens, 1), enc_h.shape[1])
    comp = las.attention_precompute(params["attention"], enc_h)
    dec = jnp.zeros((2, CFG.decoder_state_size))
    score, ctx = las.attention_step(params["attention"], comp, enc_h, dec, valid)
    assert np.all(np.isfinite(np.asarray(score)))


def test_lstm_scan_zero_length_row(rng):
    p = rnn.init_lstm(jax.random.key(0), 4, 8)
    xs = jnp.asarray(rng.standard_normal((2, 6, 4)).astype(np.float32))
    ys, (h, c) = rnn.lstm_scan(p, xs, lengths=jnp.asarray([6, 0]))
    assert np.all(np.asarray(ys)[1] == 0)
    assert np.all(np.asarray(h)[1] == 0)


def test_empty_index(tmp_path):
    idx = tmp_path / "empty.tsv"
    idx.write_text("")
    ds = ASRDataset(str(idx), batch_size=4, text_only=True)
    assert len(ds) == 0
    assert list(ds.iter_batches(prefetch=0)) == []


def test_all_unk_text():
    m = Mapper()
    s, _ = normalize_string("@@@@")
    ids = m.encode(s)
    assert (ids[1:-1] == UNK_ID).all()
    assert m.translate(ids) == "$$$$"


def test_decode_max_steps_one(rng):
    from ss_asr_tpu.decode.greedy import greedy_decode

    params = las.init_asr(jax.random.key(0), CFG)
    x = jnp.asarray(rng.standard_normal((1, 16, 5)).astype(np.float32))
    toks, lens = greedy_decode(params, CFG, x, jnp.asarray([16]), max_steps=1)
    assert toks.shape == (1, 1)
    assert int(lens[0]) in (0, 1)


def test_beam_larger_than_vocab_paths(rng):
    """Beam of 8 on a 2-step decode: more beams than can stay distinct."""
    from ss_asr_tpu.decode.beam import beam_decode

    params = las.init_asr(jax.random.key(1), CFG)
    x = jnp.asarray(rng.standard_normal((1, 16, 5)).astype(np.float32))
    toks, lens = beam_decode(params, CFG, x, jnp.asarray([16]), beam_size=8, max_steps=2)
    assert toks.shape == (1, 2)
