"""Dynamic-batching serving runtime (ss_asr_tpu/serve.py).

The batcher must (a) return exactly what the underlying Transcriber would,
in submission order, (b) actually coalesce concurrent requests into shared
program invocations on the power-of-two lattice, and (c) contain failures
to the affected batch. The HTTP layer is driven end-to-end over localhost.
"""

import json
import threading
import urllib.request
import wave
import io

import jax
import numpy as np
import pytest

from ss_asr_tpu.api import Transcriber
from ss_asr_tpu.models import las
from ss_asr_tpu.serve import BatchingTranscriber, _lattice, serve_http


def _tiny_transcriber(seed=0, **kw):
    cfg = las.ASRConfig(
        encoder_state_size=8, decoder_state_size=8, mlp_out_size=8,
        feature_dim=40,
    )
    params = las.init_asr(jax.random.key(seed), cfg)
    kw.setdefault("max_steps", 8)
    kw.setdefault("t_bucket", 16)
    return Transcriber(params, cfg, sr=8000, **kw)


def test_lattice():
    assert _lattice(16) == (1, 2, 4, 8, 16)
    assert _lattice(12) == (1, 2, 4, 8, 12)
    assert _lattice(1) == (1,)


def test_batched_matches_direct(rng):
    t = _tiny_transcriber()
    fbanks = [rng.standard_normal((10 + 3 * i, 40)).astype(np.float32)
              for i in range(6)]
    direct = t.transcribe_fbank(list(fbanks))
    with BatchingTranscriber(t, max_batch=8, max_wait_ms=100) as bt:
        futs = [bt.submit(f) for f in fbanks]
        got = [f.result(timeout=120) for f in futs]
        stats = bt.stats
    # NOTE direct runs B=6; the batcher pads to lattice B=8. The decode is
    # per-row independent (masked attention, per-row early exit), so the
    # transcripts must be identical anyway — this asserts pad-row isolation.
    assert got == direct
    assert stats.requests == 6
    assert stats.batches >= 1
    assert all(b in (1, 2, 4, 8) for b in stats.batch_sizes)


def test_concurrent_submits_coalesce(rng):
    t = _tiny_transcriber()
    fb = rng.standard_normal((12, 40)).astype(np.float32)
    with BatchingTranscriber(t, max_batch=8, max_wait_ms=500) as bt:
        # warm the executable cache so the live batch isn't serialized
        # behind a compile while the window expires
        bt.transcribe_fbank([fb] * 8)
        results = [None] * 8
        barrier = threading.Barrier(8)

        def client(i):
            barrier.wait()
            results[i] = bt.submit(fb).result(timeout=120)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(8)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        stats = bt.stats
    assert all(r == results[0] for r in results)
    # 16 requests total; the 8 concurrent ones must have shared batches —
    # a serial server would have run 16 singleton batches
    assert stats.batches <= 6
    assert max(stats.batch_sizes) >= 4


def test_lattice_padding_counted(rng):
    t = _tiny_transcriber()
    fbanks = [rng.standard_normal((9, 40)).astype(np.float32)
              for _ in range(3)]
    with BatchingTranscriber(t, max_batch=8, max_wait_ms=200) as bt:
        got = bt.transcribe_fbank(fbanks)
        stats = bt.stats
    assert len(got) == 3
    # 3 rows ride a 4-row lattice batch (or smaller batches if the window
    # split them; padding must account exactly for the difference)
    assert stats.rows_sum == stats.requests + stats.padded_rows
    assert stats.rows_sum == sum(stats.batch_sizes)  # window not yet full


def test_decode_failure_fails_batch_not_server(rng):
    t = _tiny_transcriber()

    class Boom:
        cfg = t.cfg
        sr = t.sr

        def transcribe_fbank(self, fbanks):
            raise RuntimeError("decode exploded")

    with BatchingTranscriber(Boom(), max_batch=4, max_wait_ms=20) as bt:
        fut = bt.submit(rng.standard_normal((5, 40)).astype(np.float32))
        with pytest.raises(RuntimeError, match="decode exploded"):
            fut.result(timeout=60)
        # the worker survived the failed batch
        fut2 = bt.submit(rng.standard_normal((5, 40)).astype(np.float32))
        with pytest.raises(RuntimeError, match="decode exploded"):
            fut2.result(timeout=60)


def test_lm_fused_serving_parity(rng):
    """Shallow-fusion configuration through the batcher == direct decode
    (the reference's default serving setup: greedy + char-LM fusion)."""
    import jax

    from ss_asr_tpu.models import charlm as charlm_mod

    t = _tiny_transcriber()
    lm_cfg = charlm_mod.CharLMConfig(hidden_size=8)
    t.lm_params = charlm_mod.init_charlm(jax.random.key(5), lm_cfg)
    t.lm_cfg = lm_cfg
    t.lm_weight = 0.1
    fbanks = [rng.standard_normal((12 + i, 40)).astype(np.float32)
              for i in range(3)]
    direct = t.transcribe_fbank(list(fbanks))
    with BatchingTranscriber(t, max_batch=4, max_wait_ms=100) as bt:
        got = bt.transcribe_fbank(fbanks)
    assert got == direct


def test_submit_validates_shape_and_close_rejects(rng):
    t = _tiny_transcriber()
    bt = BatchingTranscriber(t, max_batch=2, max_wait_ms=5)
    with pytest.raises(ValueError, match="expected"):
        bt.submit(rng.standard_normal((5, 13)).astype(np.float32))
    fut = bt.submit(rng.standard_normal((7, 40)).astype(np.float32))
    assert isinstance(fut.result(timeout=120), str)
    bt.close()
    with pytest.raises(RuntimeError, match="closed"):
        bt.submit(rng.standard_normal((7, 40)).astype(np.float32))
    bt.close()  # idempotent


def test_reload_params_hot_swap(rng):
    """After reload_params, later requests decode with the NEW weights
    (equal to a fresh transcriber on them); no recompile, no downtime."""
    t_old = _tiny_transcriber(seed=0)
    t_new = _tiny_transcriber(seed=9)
    fb = rng.standard_normal((20, 40)).astype(np.float32)
    want_old = t_old.transcribe_fbank([fb])
    want_new = t_new.transcribe_fbank([fb])
    with BatchingTranscriber(t_old, max_batch=2, max_wait_ms=5) as bt:
        assert bt.submit(fb).result(timeout=120) == want_old[0]
        bt.reload_params(t_new.params)
        assert bt.submit(fb).result(timeout=120) == want_new[0]


def test_reload_rejects_incompatible_checkpoint(rng):
    """A wrong-config checkpoint must be rejected BEFORE the swap — the
    server keeps serving the old weights instead of wedging."""
    import jax

    from ss_asr_tpu.models import las

    t = _tiny_transcriber(seed=0)
    fb = rng.standard_normal((20, 40)).astype(np.float32)
    want = t.transcribe_fbank([fb])
    big = las.ASRConfig(encoder_state_size=16, decoder_state_size=16,
                        mlp_out_size=16, feature_dim=40)
    wrong = las.init_asr(jax.random.key(1), big)
    with BatchingTranscriber(t, max_batch=2, max_wait_ms=5) as bt:
        with pytest.raises(ValueError, match="shape mismatch"):
            bt.reload_params(wrong)
        with pytest.raises(ValueError, match="without an LM"):
            bt.reload_params(t.params, lm_params={"not": np.zeros(3)})
        # still serving, still the old weights
        assert bt.submit(fb).result(timeout=120) == want[0]


def test_http_reload_endpoint(rng, tmp_path):
    import urllib.error

    from ss_asr_tpu.utils import checkpoint as ckpt

    t = _tiny_transcriber(seed=0)
    t_new = _tiny_transcriber(seed=9)
    p_new = str(tmp_path / "asr_new.npz")
    ckpt.save_pytree(p_new, t_new.params)
    fb = rng.standard_normal((20, 40)).astype(np.float32)
    want_new = t_new.transcribe_fbank([fb])

    ready = threading.Event()
    with BatchingTranscriber(t, max_batch=2, max_wait_ms=5) as bt:
        server = serve_http(bt, host="127.0.0.1", port=0, sr=8000,
                            ready_event=ready,
                            reload_paths={"asr": p_new, "lm": None})
        port = server.server_address[1]
        th = threading.Thread(target=server.serve_forever, daemon=True)
        th.start()
        try:
            base = f"http://127.0.0.1:{port}"
            req = urllib.request.Request(base + "/reload", data=b"")
            with urllib.request.urlopen(req, timeout=60) as r:
                assert json.load(r)["reloaded"] == p_new
            assert bt.submit(fb).result(timeout=120) == want_new[0]
        finally:
            server.shutdown()
            server.server_close()

    # a server without reload paths refuses
    with BatchingTranscriber(_tiny_transcriber(), max_batch=2,
                             max_wait_ms=5) as bt2:
        server = serve_http(bt2, host="127.0.0.1", port=0, sr=8000,
                            ready_event=threading.Event())
        port = server.server_address[1]
        th = threading.Thread(target=server.serve_forever, daemon=True)
        th.start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/reload", data=b"")
            try:
                urllib.request.urlopen(req, timeout=30)
                assert False, "expected HTTP 404"
            except urllib.error.HTTPError as e:
                assert e.code == 404
        finally:
            server.shutdown()
            server.server_close()


def _wav_bytes(rng, n=4000, sr=8000):
    buf = io.BytesIO()
    y = (0.1 * rng.standard_normal(n) * 32767).astype(np.int16)
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(y.tobytes())
    return buf.getvalue(), y.astype(np.float32) / 32768.0


def test_http_server_end_to_end(rng):
    t = _tiny_transcriber()
    ready = threading.Event()
    with BatchingTranscriber(t, max_batch=4, max_wait_ms=5) as bt:
        server = serve_http(bt, host="127.0.0.1", port=0, sr=8000,
                            ready_event=ready)
        port = server.server_address[1]
        th = threading.Thread(target=server.serve_forever, daemon=True)
        th.start()
        try:
            base = f"http://127.0.0.1:{port}"
            with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
                assert json.load(r)["ok"] is True

            wav, y = _wav_bytes(rng)
            req = urllib.request.Request(base + "/transcribe", data=wav)
            with urllib.request.urlopen(req, timeout=300) as r:
                text = json.load(r)["text"]
            assert text == t.transcribe_signal(y, sr=8000)

            with urllib.request.urlopen(base + "/stats", timeout=30) as r:
                stats = json.load(r)
            assert stats["requests"] >= 1 and stats["batches"] >= 1

            # detailed path: n-best + confidence + per-char timestamps
            req = urllib.request.Request(
                base + "/transcribe?detail=1&nbest=2", data=wav)
            with urllib.request.urlopen(req, timeout=300) as r:
                d = json.load(r)
            # top-1 mirrors hypotheses[0] (beam-2 may differ from greedy)
            assert len(d["hypotheses"]) == 2
            h0 = d["hypotheses"][0]
            assert d["text"] == h0["text"]
            assert h0["avg_logprob"] <= 0.0
            assert len(h0["char_starts"]) == len(h0["text"])
            # word spans ride along, consistent with the text
            assert "".join(w["word"] for w in h0["words"]) == \
                h0["text"].replace(" ", "")
            assert all(w["end"] >= w["start"] for w in h0["words"])
            scores = [h["score"] for h in d["hypotheses"]]
            assert scores == sorted(scores, reverse=True)

            # client-controlled nbest is bounded (it sizes the beam
            # program) -> 400, and detail traffic is visible in /stats
            from ss_asr_tpu.serve import MAX_NBEST

            big = urllib.request.Request(
                base + f"/transcribe?nbest={MAX_NBEST + 1}", data=wav)
            try:
                urllib.request.urlopen(big, timeout=30)
                assert False, "expected HTTP 400"
            except urllib.error.HTTPError as e:
                assert e.code == 400
            with urllib.request.urlopen(base + "/stats", timeout=30) as r:
                st = json.load(r)
            assert st["detail_requests"] >= 1

            # long-form mode: windowed decode + merge, one request
            req = urllib.request.Request(
                base + "/transcribe?long=1&window_s=0.4&overlap_s=0.1",
                data=wav)
            with urllib.request.urlopen(req, timeout=300) as r:
                assert isinstance(json.load(r)["text"], str)
            # energy-VAD segmentation variant of the same request
            req = urllib.request.Request(
                base + "/transcribe?long=1&window_s=0.4&overlap_s=0.1"
                       "&vad=energy",
                data=wav)
            with urllib.request.urlopen(req, timeout=300) as r:
                assert isinstance(json.load(r)["text"], str)
            for badq in ("long=1&window_s=0.1&overlap_s=0.2",  # ov >= win
                         "long=1&detail=1",                    # exclusive
                         "long=1&window_s=999",                # > cap
                         "long=1&vad=webrtc"):                 # bad vad
                badreq = urllib.request.Request(
                    base + f"/transcribe?{badq}", data=wav)
                try:
                    urllib.request.urlopen(badreq, timeout=30)
                    assert False, f"expected 400 for {badq}"
                except urllib.error.HTTPError as e:
                    assert e.code == 400, badq

            # malformed body -> 400, server stays up
            bad = urllib.request.Request(base + "/transcribe",
                                         data=b"not a wav")
            try:
                urllib.request.urlopen(bad, timeout=30)
                assert False, "expected HTTP 400"
            except urllib.error.HTTPError as e:
                assert e.code == 400
            with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
                assert json.load(r)["ok"] is True
        finally:
            server.shutdown()
            server.server_close()


def test_http_streaming_sessions(rng):
    t = _tiny_transcriber()
    ready = threading.Event()
    with BatchingTranscriber(t, max_batch=4, max_wait_ms=5) as bt:
        server = serve_http(bt, host="127.0.0.1", port=0, sr=8000,
                            ready_event=ready)
        port = server.server_address[1]
        th = threading.Thread(target=server.serve_forever, daemon=True)
        th.start()
        try:
            base = f"http://127.0.0.1:{port}"

            def post(path, data=b""):
                req = urllib.request.Request(base + path, data=data)
                with urllib.request.urlopen(req, timeout=300) as r:
                    return json.load(r)

            # create a session; stream 1 s of audio in 100 ms PCM16 chunks
            sid = post("/stream?sr=8000&window_s=2&min_segment_s=0.5")["id"]
            y = (0.3 * rng.standard_normal(8000) * 32767).astype(np.int16)
            partials = []
            for i in range(0, len(y), 800):
                d = post(f"/stream/{sid}", y[i:i + 800].tobytes())
                partials.append(d["partial"])
                assert d["partial"].startswith(d["committed"])
            final = post(f"/stream/{sid}/end")["text"]
            assert isinstance(final, str) and final
            # the streamed result matches the library surface on the
            # same audio (same model, same chunking-independent frontend)
            from ss_asr_tpu.streaming import StreamingTranscriber

            st = StreamingTranscriber(t, sr=8000, commit_window_s=2,
                                      min_segment_s=0.5)
            st.feed(y.astype(np.float32) / 32768.0)
            assert final == st.finalize()

            # the session is gone after /end
            try:
                post(f"/stream/{sid}", b"\x00\x00")
                assert False, "expected 404"
            except urllib.error.HTTPError as e:
                assert e.code == 404

            # error paths: odd byte count, unknown id, bad query
            sid2 = post("/stream")["id"]
            for path, data, code in (
                (f"/stream/{sid2}", b"\x00", 400),
                ("/stream/nope", b"", 404),
                ("/stream?sr=99", b"", 400),
                ("/stream?window_s=1&min_segment_s=2", b"", 400),
            ):
                try:
                    post(path, data)
                    assert False, f"expected {code} for {path}"
                except urllib.error.HTTPError as e:
                    assert e.code == code, path
            post(f"/stream/{sid2}/end")

            with urllib.request.urlopen(base + "/stats", timeout=30) as r:
                st_d = json.load(r)
            assert st_d["stream_requests"] >= 10
        finally:
            server.shutdown()
            server.server_close()
