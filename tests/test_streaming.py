"""Streaming recognition (ss_asr_tpu/streaming.py).

The load-bearing claims: (a) for a short stream the streamed result is
IDENTICAL to the one-shot transcribe path (StreamingFrontend exactness +
same decode program), (b) committed text is never revised, (c) per-update
cost is bounded — segments commit once the open span exceeds the window,
(d) partials memoize when no new audio arrived.
"""

import jax
import numpy as np
import pytest

from ss_asr_tpu.api import Transcriber
from ss_asr_tpu.models import las


def _tiny_transcriber(**kw):
    cfg = las.ASRConfig(encoder_state_size=8, decoder_state_size=8,
                        mlp_out_size=8, feature_dim=40)
    params = las.init_asr(jax.random.PRNGKey(0), cfg)
    kw.setdefault("sr", 8000)
    kw.setdefault("max_steps", 8)
    kw.setdefault("t_bucket", 16)
    return Transcriber(params, cfg, **kw)


def test_energy_cut_frame():
    from ss_asr_tpu.decode.longform import energy_cut_frame

    level = np.ones(100, np.float32)
    level[40:45] = -5.0  # a pause
    assert 39 <= energy_cut_frame(level, 10, 90) <= 46
    # search range clamps to the dip's side
    assert energy_cut_frame(level, 50, 90) >= 50
    # degenerate ranges behave
    assert energy_cut_frame(level, 95, 200) == 95
    assert energy_cut_frame(level, 0, 1) == 0


def test_stream_nondefault_feature_dim():
    """The session frontend must emit cfg.feature_dim mel bands, not the
    global default — a 48-dim model fed 40-dim frames fails at the first
    partial() with a broadcast error."""
    from ss_asr_tpu.streaming import StreamingTranscriber

    cfg = las.ASRConfig(encoder_state_size=8, decoder_state_size=8,
                        mlp_out_size=8, feature_dim=48)
    params = las.init_asr(jax.random.PRNGKey(0), cfg)
    t = Transcriber(params, cfg, sr=8000, max_steps=8, t_bucket=16)

    st = StreamingTranscriber(t)
    assert st._fe.n_mels == 48
    y = 0.3 * np.random.RandomState(4).randn(8000).astype(np.float32)
    st.feed(y)
    st.partial()  # would raise before the n_mels plumbing fix
    assert st._frames.shape[1] == 48
    out = st.finalize()
    assert out == t.transcribe_signal(y, sr=8000)


def test_stream_matches_oneshot_short():
    from ss_asr_tpu.streaming import StreamingTranscriber

    t = _tiny_transcriber()
    rng = np.random.RandomState(0)
    y = 0.3 * rng.randn(8000).astype(np.float32)  # 1 s, no commits

    st = StreamingTranscriber(t, commit_window_s=20.0)
    for i in range(0, len(y), 1000):
        st.feed(y[i : i + 1000])
    out = st.finalize()
    assert out == t.transcribe_signal(y, sr=8000)
    assert st.finalize() == out  # idempotent
    with pytest.raises(RuntimeError):
        st.feed(y[:10])


def test_stream_commits_and_never_revises(monkeypatch):
    from ss_asr_tpu.streaming import StreamingTranscriber

    t = _tiny_transcriber()
    sr = 8000
    rng = np.random.RandomState(1)
    burst = 0.5 * rng.randn(sr).astype(np.float32)
    gap = 0.001 * rng.randn(sr // 2).astype(np.float32)
    y = np.concatenate([burst, gap, burst, gap, burst])

    # label decodes by their frame count so segment structure is visible
    calls = []

    def fake_decode(rows):
        calls.append(rows[0].shape[0])
        return [f"seg{rows[0].shape[0]}"]

    st = StreamingTranscriber(t, commit_window_s=1.5, min_segment_s=0.5)
    monkeypatch.setattr(st._t, "transcribe_fbank", fake_decode)

    committed_seen = []
    for i in range(0, len(y), sr // 4):
        st.feed(y[i : i + sr // 4])
        committed_seen.append(st.committed_text)
    # commitment happened before the stream ended (4 s audio, 1.5 s cap)
    assert any(committed_seen), committed_seen
    # committed text only ever grows by extension (never revised)
    for a, b in zip(committed_seen, committed_seen[1:]):
        assert b.startswith(a)
    final = st.finalize()
    assert final.startswith(committed_seen[-1])
    # every committed segment was decoded at most window-sized spans
    assert all(c <= st._max_frames for c in calls)


def test_partial_memoizes(monkeypatch):
    from ss_asr_tpu.streaming import StreamingTranscriber

    t = _tiny_transcriber()
    st = StreamingTranscriber(t)
    n = [0]
    real = t.transcribe_fbank

    def counting(rows):
        n[0] += 1
        return real(rows)

    monkeypatch.setattr(st._t, "transcribe_fbank", counting)
    rng = np.random.RandomState(2)
    st.feed(0.3 * rng.randn(4000).astype(np.float32))
    p1 = st.partial()
    c = n[0]
    assert st.partial() == p1 and n[0] == c  # no new audio -> no decode
    st.feed(0.3 * rng.randn(4000).astype(np.float32))
    st.partial()
    assert n[0] == c + 1

    with pytest.raises(ValueError):
        StreamingTranscriber(t, commit_window_s=1.0, min_segment_s=1.0)
