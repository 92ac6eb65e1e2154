"""Hard synthetic-speech corpus generator (mkdata.render_hard).

The round-3 quality corpus (pure tones) saturated — held-out WER hit a
floor, so robustness features had nothing to pay for (docs/GAIN_SUMMARY
boundary).  These tests pin the nuisance axes the hard renderer must
actually vary: per-char duration jitter, per-utterance speaker pitch
shift, swept-SNR noise, crowded (overlapping) formant grid, and the
homophone composition used by the LM-fusion experiments.
"""

import os
import wave

import numpy as np
import pytest

from ss_asr_tpu.cli.mkdata import (HARD_ALPHABET, HARD_CHAR_MS, SR,
                                   _hard_formants, hard_speaker, make_corpus,
                                   render_hard)


def _spectrum_peak_hz(y: np.ndarray) -> float:
    f = np.fft.rfft(y * np.hanning(len(y)))
    return float(np.argmax(np.abs(f)) * SR / len(y))


def _flat_speaker(snr_db: float = 60.0) -> dict:
    return {"pitch": 1.0, "f2_shift": 1.0, "vib_hz": 5.0,
            "vib_depth": 0.0, "snr_db": snr_db}


def test_deterministic_given_seed():
    a = render_hard("abc", np.random.default_rng(3))
    b = render_hard("abc", np.random.default_rng(3))
    np.testing.assert_array_equal(a, b)


def test_duration_jitter_varies_per_char_and_utterance():
    rng = np.random.default_rng(0)
    lens = [len(render_hard("a", rng, speaker=_flat_speaker()))
            for _ in range(16)]
    assert len(set(lens)) > 4, "per-char duration must jitter"
    base = SR * HARD_CHAR_MS / 1000.0
    assert min(lens) >= 0.55 * base and max(lens) <= 1.5 * base


def test_snr_is_applied():
    """Noise power tracks the requested per-utterance SNR."""
    rng = np.random.default_rng(1)
    clean = render_hard("aaaa", rng, speaker=_flat_speaker(snr_db=100.0))
    rng = np.random.default_rng(1)
    noisy = render_hard("aaaa", rng, speaker=_flat_speaker(snr_db=10.0))
    # identical rng stream + speaker, only snr differs -> same tone part
    n = min(len(clean), len(noisy))
    noise = noisy[:n] - clean[:n]
    p_sig = np.mean(np.square(clean[:n]))
    snr_meas = 10 * np.log10(p_sig / np.mean(np.square(noise)))
    assert 8.0 < snr_meas < 12.0, snr_meas


def test_speaker_pitch_shifts_the_formants():
    rng = np.random.default_rng(2)
    lo = dict(_flat_speaker(), pitch=0.85)
    hi = dict(_flat_speaker(), pitch=1.18)
    f_lo = _spectrum_peak_hz(render_hard("b", np.random.default_rng(2),
                                         speaker=lo))
    f_hi = _spectrum_peak_hz(render_hard("b", np.random.default_rng(2),
                                         speaker=hi))
    assert f_hi > f_lo * 1.2, (f_lo, f_hi)


def test_formant_grid_overlaps_across_speakers():
    """Adjacent characters' F1 ranges overlap once speakers shift them —
    the acoustic-ambiguity property the pure-tone corpus lacked."""
    for i in range(len(HARD_ALPHABET) - 1):
        f1_hi = _hard_formants(HARD_ALPHABET[i])[0] * 1.18
        f1_next_lo = _hard_formants(HARD_ALPHABET[i + 1])[0] * 0.85
        assert f1_hi > f1_next_lo, (i, f1_hi, f1_next_lo)


def test_homophones_borrow_target_formants():
    spk = _flat_speaker()
    a = render_hard("i", np.random.default_rng(7), homophones=True,
                    speaker=spk)
    b = render_hard("e", np.random.default_rng(7), homophones=False,
                    speaker=spk)
    np.testing.assert_array_equal(a, b)


def test_space_is_silence_plus_noise():
    rng = np.random.default_rng(4)
    y = render_hard(" ", rng, speaker=_flat_speaker(snr_db=20.0))
    # silence segment -> signal power ~0, only the additive noise remains
    assert np.mean(np.square(y)) < 1e-4


def test_every_frame_nonstationary_vs_tone_mode():
    """Vibrato + envelopes: the hard rendering of a char is NOT a pure
    stationary sinusoid (spectral mass spreads beyond two bins)."""
    spk = dict(_flat_speaker(), vib_depth=0.03)
    y = render_hard("c", np.random.default_rng(5), speaker=spk)
    mag = np.abs(np.fft.rfft(y))
    top2 = np.sort(mag)[-2:].sum()
    assert top2 / mag.sum() < 0.5, "spectral mass too concentrated"


def test_make_corpus_hard_writes_playable_wavs(tmp_path):
    out = str(tmp_path / "hard")
    make_corpus(out, n=3, seed=0, hard=True)
    wavs = sorted(os.listdir(os.path.join(out, "wav")))
    assert len(wavs) == 3
    with wave.open(os.path.join(out, "wav", wavs[0])) as w:
        assert w.getframerate() == SR
        assert w.getnframes() > 0


def test_build_gain_corpus_hard(tmp_path):
    from benchmarks.malromur_parity import build_gain_corpus

    csv_path, wav_dir, lm_corpus, n_correct = build_gain_corpus(
        str(tmp_path), n=10, seed=0, hard=True)
    assert os.path.exists(csv_path) and os.path.exists(lm_corpus)
    assert n_correct > 0
    # hard and tone corpora differ for the same seed (different renderer)
    tone_dir = tmp_path / "tone"
    os.makedirs(tone_dir)
    _, wav_dir2, _, _ = build_gain_corpus(str(tone_dir), n=10, seed=0,
                                          hard=False)
    w = sorted(os.listdir(wav_dir))[0]
    a = open(os.path.join(wav_dir, w), "rb").read()
    b = open(os.path.join(wav_dir2, w), "rb").read()
    assert a != b
