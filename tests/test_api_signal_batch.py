"""Fused signal->text path (Transcriber.transcribe_signal_batch).

Greedy configurations must run frontend + decode as one program with
transcripts identical to the per-utterance path; the beam fallback and the
signal-mode batching server ride the same surface.
"""

import json
import threading
import urllib.request

import jax
import numpy as np

from ss_asr_tpu.api import Transcriber
from ss_asr_tpu.models import las
from ss_asr_tpu.serve import BatchingTranscriber, serve_http


def _tiny(seed=0, **kw):
    cfg = las.ASRConfig(encoder_state_size=8, decoder_state_size=8,
                        mlp_out_size=8, feature_dim=40)
    params = las.init_asr(jax.random.key(seed), cfg)
    kw.setdefault("max_steps", 8)
    kw.setdefault("t_bucket", 16)
    return Transcriber(params, cfg, sr=8000, **kw)


def _signals(rng, lens=(3000, 4500, 6000)):
    return [0.1 * rng.standard_normal(n).astype(np.float32) for n in lens]


def test_signal_batch_matches_per_utterance_greedy(rng):
    t = _tiny()
    sigs = _signals(rng)
    batched = t.transcribe_signal_batch(sigs, sr=8000)
    single = [t.transcribe_signal_batch([s], sr=8000)[0] for s in sigs]
    assert batched == single
    assert all(isinstance(s, str) for s in batched)


def test_signal_batch_beam_path(rng):
    t = _tiny(beam_size=3)
    sigs = _signals(rng, lens=(3000, 5200))
    batched = t.transcribe_signal_batch(sigs, sr=8000)
    # beam decodes from the batched frontend's fbanks; must equal the
    # fbank-level beam path on the same frames
    from ss_asr_tpu.ops.frontend import log_mel_fbank_batch
    import jax.numpy as jnp

    step = 8000 // 2  # the API's 500 ms sample grid at sr=8000
    S = -(-5200 // step) * step
    buf = np.zeros((2, S), np.float32)
    lens = np.array([len(s) for s in sigs], np.int32)
    for i, s in enumerate(sigs):
        buf[i, : len(s)] = s
    fb, fl = log_mel_fbank_batch(jnp.asarray(buf), jnp.asarray(lens), 8000,
                                 n_mels=40)
    fb, fl = np.asarray(fb), np.asarray(fl)
    direct = t.transcribe_fbank([fb[i, : fl[i]] for i in range(2)])
    assert batched == direct


def test_signal_batch_empty_and_zero_rows(rng):
    t = _tiny()
    sigs = [np.zeros((0,), np.float32),
            0.1 * rng.standard_normal(3000).astype(np.float32)]
    out = t.transcribe_signal_batch(sigs, sr=8000)
    assert out[0] == ""
    assert isinstance(out[1], str)
    assert t.transcribe_signal_batch([], sr=8000) == []
    assert t.transcribe_signal_batch(
        [np.zeros((0,), np.float32)], sr=8000) == [""]


def test_signal_mode_batching_server(rng):
    t = _tiny()
    sigs = _signals(rng, lens=(3000, 3000, 4400))
    direct = t.transcribe_signal_batch(list(sigs), sr=8000)
    with BatchingTranscriber(t, max_batch=4, max_wait_ms=100,
                             mode="signal") as bt:
        futs = [bt.submit(s) for s in sigs]
        got = [f.result(timeout=120) for f in futs]
        stats = bt.stats
    assert got == direct
    assert stats.rows_sum == stats.requests + stats.padded_rows


def test_signal_mode_rejects_fbank_shape(rng):
    t = _tiny()
    with BatchingTranscriber(t, max_batch=2, max_wait_ms=5,
                             mode="signal") as bt:
        import pytest

        with pytest.raises(ValueError, match="1-D waveform"):
            bt.submit(rng.standard_normal((10, 40)).astype(np.float32))


def test_http_signal_mode(rng):
    import io
    import wave

    t = _tiny()
    buf = io.BytesIO()
    y = (0.1 * rng.standard_normal(4000) * 32767).astype(np.int16)
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(y.tobytes())
    ready = threading.Event()
    with BatchingTranscriber(t, max_batch=4, max_wait_ms=5,
                             mode="signal") as bt:
        server = serve_http(bt, host="127.0.0.1", port=0, sr=8000,
                            ready_event=ready)
        port = server.server_address[1]
        th = threading.Thread(target=server.serve_forever, daemon=True)
        th.start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/transcribe", data=buf.getvalue())
            with urllib.request.urlopen(req, timeout=300) as r:
                text = json.load(r)["text"]
            assert text == t.transcribe_signal(
                y.astype(np.float32) / 32768.0, sr=8000)
        finally:
            server.shutdown()
            server.server_close()
