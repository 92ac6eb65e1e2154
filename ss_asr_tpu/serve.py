"""Dynamic-batching serving runtime over the Transcriber API.

The reference decodes serially, one utterance at a time, in the tester loop
(reference src/trainer.py:587-591 — its ``decode_jobs`` knob is read but
never used); it has no serving surface at all. This module is the TPU-native
production-serving piece: concurrent requests are coalesced into ONE decode
program invocation, which is what actually matters on this hardware —

* every decode program is specialized on its padded (B, T) shape, so the
  batch-size axis is padded UP a small power-of-two lattice and the time
  axis rides Transcriber's ``t_bucket`` rounding: the number of distinct
  executables (compiles) is bounded by |B lattice| x |T buckets|, and every
  batch after warm-up hits the executable cache;
* one batched invocation amortizes the per-program dispatch overhead and
  fills MXU rows (a B=1 decode streams 1 of 128 MXU rows; B=16 streams 16
  at the same per-step cost — see docs/PERF.md on row-streaming).

Usage::

    t = Transcriber.from_checkpoint("asr.npz", config)
    with BatchingTranscriber(t, max_batch=16, max_wait_ms=5) as bt:
        futs = [bt.submit(fb) for fb in fbanks]   # from any thread
        texts = [f.result() for f in futs]

``serve_http`` wraps it in a stdlib threaded HTTP server (POST /transcribe
with a WAV body -> {"text": ...}); batching emerges from concurrent request
threads sharing one BatchingTranscriber. See cli/serve.py.
"""

from __future__ import annotations

import io
import json
import threading
import time
from collections import deque
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import numpy as np


#: recent-window length for the percentile/mix deques below — the exact
#: counters never truncate, so accounting invariants hold at any uptime
STATS_WINDOW = 4096

#: HTTP detail-path limits: nbest sizes the beam program (and each
#: distinct value compiles a new executable); concurrent detail requests
#: bypass the batcher's admission control, so they get their own gate
MAX_NBEST = 16
MAX_DETAIL_CONCURRENCY = 2

#: HTTP streaming-session limits: each open session buffers up to one
#: commit window of frames, so both knobs bound server memory; idle
#: sessions are reaped lazily on the next /stream request
MAX_STREAM_SESSIONS = 16
STREAM_IDLE_TTL_S = 300.0


@dataclass
class ServeStats:
    """Counters for observing batching behavior (guarded by the owner's
    lock; read them after close() or treat reads as approximate).

    ``requests``/``batches``/``padded_rows``/``rows_sum`` are exact over
    the server's lifetime (``rows_sum`` counts padded batch rows, so
    ``rows_sum == requests + padded_rows`` always); ``batch_sizes`` and
    ``wait_ms`` are bounded recent windows so a long-running server's
    memory stays flat."""

    requests: int = 0
    batches: int = 0
    padded_rows: int = 0  # lattice fill rows (wasted compute, bounded)
    rows_sum: int = 0  # sum of padded batch sizes (exact)
    detail_requests: int = 0  # HTTP ?detail= path (bypasses the batcher)
    detail_rejected: int = 0  # detail requests shed at the admission gate
    stream_requests: int = 0  # HTTP /stream feed/end calls
    stream_rejected: int = 0  # session-table-full rejections
    batch_sizes: deque = field(
        default_factory=lambda: deque(maxlen=STATS_WINDOW)
    )
    wait_ms: deque = field(default_factory=lambda: deque(maxlen=STATS_WINDOW))

    def as_dict(self) -> dict:
        d = {
            "requests": self.requests,
            "batches": self.batches,
            "padded_rows": self.padded_rows,
            "detail_requests": self.detail_requests,
            "detail_rejected": self.detail_rejected,
            "stream_requests": self.stream_requests,
            "stream_rejected": self.stream_rejected,
        }
        if self.batches:
            d["mean_batch"] = self.rows_sum / self.batches
        if self.wait_ms:
            w = sorted(self.wait_ms)
            d["queue_wait_p50_ms"] = round(w[len(w) // 2], 3)
            d["queue_wait_p99_ms"] = round(w[min(len(w) - 1,
                                                 int(len(w) * 0.99))], 3)
        return d


def _lattice(max_batch: int) -> tuple:
    out, b = [], 1
    while b < max_batch:
        out.append(b)
        b *= 2
    out.append(max_batch)
    return tuple(out)


class BatchingTranscriber:
    """Thread-safe dynamic batcher in front of a Transcriber.

    ``submit`` enqueues one ``[T, feature_dim]`` fbank and returns a Future
    resolving to its transcript. A worker thread drains the queue: it takes
    the oldest request, waits up to ``max_wait_ms`` for the batch to fill to
    ``max_batch`` (the wait is skipped when the queue already holds a full
    batch), pads the row count up the power-of-two lattice with zero-frame
    rows (decoded transcripts of pad rows are discarded; Transcriber maps
    zero-frame rows to ""), and resolves the futures in submission order.

    Exceptions from the underlying decode fail that batch's futures, not
    the server. ``close()`` drains the queue before stopping.
    """

    def __init__(
        self,
        transcriber,
        max_batch: int = 16,
        max_wait_ms: float = 5.0,
        mode: str = "fbank",
        sr: Optional[int] = None,
    ):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        if mode not in ("fbank", "signal"):
            raise ValueError(f"mode must be 'fbank' or 'signal', got {mode!r}")
        self._t = transcriber
        self.mode = mode
        #: sample rate of submitted waveforms (signal mode); defaults to the
        #: transcriber's — callers resampling to a different rate MUST pass
        #: it here or the frontend runs with the wrong window/hop/mels
        self.sr = sr or transcriber.sr
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1e3
        self._lattice = _lattice(self.max_batch)
        self._q: deque = deque()
        self._cv = threading.Condition()
        self._closed = False
        self.stats = ServeStats()
        self._worker = threading.Thread(
            target=self._run, name="ss-asr-serve-batcher", daemon=True
        )
        self._worker.start()

    # -- client side ---------------------------------------------------
    def submit(self, item: np.ndarray) -> Future:
        """Enqueue one request — a [T, feature_dim] fbank in 'fbank' mode,
        a 1-D waveform in 'signal' mode (decoded via the fused
        frontend+decode program). Returns Future[str]."""
        item = np.asarray(item, dtype=np.float32)
        if self.mode == "signal":
            if item.ndim != 1:
                raise ValueError(
                    f"expected 1-D waveform in signal mode, got shape "
                    f"{item.shape}"
                )
        elif item.ndim != 2 or item.shape[1] != self._t.cfg.feature_dim:
            raise ValueError(
                f"expected [T, {self._t.cfg.feature_dim}] fbank, "
                f"got shape {item.shape}"
            )
        fut: Future = Future()
        with self._cv:
            if self._closed:
                raise RuntimeError("BatchingTranscriber is closed")
            self._q.append((item, fut, time.perf_counter()))
            self.stats.requests += 1
            self._cv.notify()
        return fut

    def transcribe_fbank(self, fbanks: Sequence[np.ndarray]) -> List[str]:
        """Batched convenience with Transcriber's signature."""
        futs = [self.submit(f) for f in fbanks]
        return [f.result() for f in futs]

    @staticmethod
    def _check_like(new, old, what: str) -> None:
        import jax

        if jax.tree.structure(new) != jax.tree.structure(old):
            raise ValueError(f"reload {what}: tree structure mismatch "
                             "(different model config?)")
        for n, o in zip(jax.tree.leaves(new), jax.tree.leaves(old)):
            ns, os_ = getattr(n, "shape", None), getattr(o, "shape", None)
            if ns != os_:
                raise ValueError(
                    f"reload {what}: leaf shape mismatch {ns} vs {os_} "
                    "(different model size?)"
                )

    def reload_params(self, params, lm_params=None) -> None:
        """Hot-swap model weights without dropping requests.

        Decode calls snapshot the (ASR, LM) weight pair once per batch
        (Transcriber._w), and this method swaps that pair in ONE
        assignment — an in-flight batch finishes entirely on the old pair,
        every later batch uses the new; no torn ASR/LM combination, no
        downtime. The new trees must match the old structure and leaf
        shapes (validated here, so a wrong-config checkpoint is rejected
        BEFORE it can wedge the worker): the cached executables are
        reused, no recompile. With a mesh Transcriber the new weights are
        replicated the same way the constructor did."""
        t = self._t
        self._check_like(params, t.params, "params")
        if lm_params is not None:
            if t.lm_params is None:
                raise ValueError(
                    "reload lm_params: the server was built without an LM "
                    "(fusion weights/trace would change); restart to add one"
                )
            self._check_like(lm_params, t.lm_params, "lm_params")
        if t.mesh is not None:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(t.mesh, P())
            params = jax.device_put(params, repl)
            if lm_params is not None:
                lm_params = jax.device_put(lm_params, repl)
        t._w = (params,
                lm_params if lm_params is not None else t._w[1])

    def close(self, timeout: Optional[float] = None) -> None:
        """Stop accepting work, drain the queue, join the worker."""
        with self._cv:
            if self._closed:
                return
            self._closed = True
            self._cv.notify_all()
        self._worker.join(timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- worker side ----------------------------------------------------
    def _take_batch(self):
        """Block for the first request, then linger up to max_wait_s for a
        full batch. Returns a list of (fbank, future, t_submit) or None on
        shutdown with an empty queue."""
        with self._cv:
            while not self._q and not self._closed:
                self._cv.wait()
            if not self._q:
                return None  # closed and drained
            deadline = time.perf_counter() + self.max_wait_s
            while (len(self._q) < self.max_batch and not self._closed):
                left = deadline - time.perf_counter()
                if left <= 0:
                    break
                self._cv.wait(timeout=left)
            n = min(len(self._q), self.max_batch)
            return [self._q.popleft() for _ in range(n)]

    def _run(self):
        feat = self._t.cfg.feature_dim
        if self.mode == "signal":
            pad_row = np.zeros((0,), np.float32)

            def decode(items):
                return self._t.transcribe_signal_batch(items, sr=self.sr)
        else:
            pad_row = np.zeros((0, feat), np.float32)
            decode = self._t.transcribe_fbank
        while True:
            batch = self._take_batch()
            if batch is None:
                return
            # transition every future to RUNNING now: a client cancel()
            # after this point is a no-op, so set_result/set_exception below
            # can never race a cancellation into InvalidStateError (which
            # would kill this worker and silently hang all later requests);
            # futures cancelled while still queued drop out of the batch
            batch = [b for b in batch if b[1].set_running_or_notify_cancel()]
            if not batch:
                continue
            items = [b[0] for b in batch]
            futs = [b[1] for b in batch]
            now = time.perf_counter()
            waits = [(now - b[2]) * 1e3 for b in batch]
            padded = next(b for b in self._lattice if b >= len(items))
            n_pad = padded - len(items)
            items.extend(pad_row for _ in range(n_pad))
            try:
                texts = decode(items)
            except Exception as e:  # noqa: BLE001 — fail the batch, not the server
                for f in futs:
                    f.set_exception(e)
                continue
            with self._cv:
                self.stats.batches += 1
                self.stats.padded_rows += n_pad
                self.stats.rows_sum += padded
                self.stats.batch_sizes.append(padded)
                self.stats.wait_ms.extend(waits)
            for f, text in zip(futs, texts):
                f.set_result(text)


# ----------------------------------------------------------------------
def serve_http(
    batcher: BatchingTranscriber,
    host: str = "127.0.0.1",
    port: int = 8000,
    sr: Optional[int] = None,
    ready_event: Optional[threading.Event] = None,
    reload_paths: Optional[dict] = None,
):
    """Blocking threaded HTTP server over a BatchingTranscriber.

    POST /transcribe   body = WAV bytes -> {"text": "..."}
    GET  /healthz      -> {"ok": true}
    GET  /stats        -> batching counters (ServeStats.as_dict)
    POST /stream[...]  -> streaming sessions: create / feed raw PCM16
                          chunks for live partials / finalize (see
                          Handler._handle_stream and streaming.py)
    POST /reload       -> hot-swap weights from ``reload_paths`` (the
                          checkpoint paths the server was started with:
                          {"asr": path, "lm": path|None}); 404 when the
                          server was built without paths. In-flight
                          batches finish on the old weights; no downtime,
                          no recompile (see reload_params).

    In 'signal' mode (the default for cli/serve.py) the raw waveform goes
    straight into the batcher and the frontend rides the fused
    frontend+decode program with the batch — zero per-request device
    dispatches. In 'fbank' mode each request thread computes its own
    frontend first. Either way decode batching emerges from concurrent
    clients. Returns the server object if ``ready_event`` is given (caller
    drives serve_forever); otherwise serves until interrupted.
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from ss_asr_tpu.data.audio import read_wav, resample
    from ss_asr_tpu.ops.frontend import compute_fbank

    if batcher.mode == "signal":
        # the batcher's worker decodes at batcher.sr; resampling requests to
        # any other rate would silently run the frontend at the wrong rate
        if sr is not None and sr != batcher.sr:
            raise ValueError(
                f"serve_http sr={sr} != batcher sr={batcher.sr} (signal "
                "mode decodes at the batcher's rate; pass sr= to "
                "BatchingTranscriber instead)"
            )
        target_sr = batcher.sr
    else:
        target_sr = sr or batcher._t.sr
    feat = batcher._t.cfg.feature_dim
    # detail-path admission control: these requests bypass the batcher
    # (the server's only other throttle), so bound their concurrency and
    # their n-best width — both are client-controlled knobs that size
    # device programs
    detail_gate = threading.Semaphore(MAX_DETAIL_CONCURRENCY)

    # streaming sessions: id -> {st, lock, last}; the table lock guards the
    # dict, each session's lock serializes its feeds (clients stream one
    # connection at a time; decodes still pass the detail gate since they
    # bypass the batcher)
    stream_lock = threading.Lock()
    stream_sessions: dict = {}

    def _reap_streams() -> None:
        now = time.monotonic()
        with stream_lock:
            for sid in [s for s, v in stream_sessions.items()
                        if now - v["last"] > STREAM_IDLE_TTL_S]:
                del stream_sessions[sid]

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet; stats carry the signal
            pass

        def _reply(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"ok": True})
            elif self.path == "/stats":
                with batcher._cv:
                    d = batcher.stats.as_dict()
                self._reply(200, d)
            else:
                self._reply(404, {"error": "not found"})

        def _handle_stream(self, url):
            """Streaming sessions (ss_asr_tpu/streaming.py over HTTP):

            POST /stream?sr=S&window_s=W          -> {"id", "sr"}
            POST /stream/<id>   body=PCM16LE mono -> {"partial","committed"}
            POST /stream/<id>/end                 -> {"text"}

            Chunks are raw little-endian int16 mono at the session's sr
            (a live stream has no WAV container); partial text may be
            revised until its segment commits, committed text never is.
            """
            from urllib.parse import parse_qs

            _reap_streams()
            parts = url.path.strip("/").split("/")
            if parts == ["stream"]:  # create
                try:
                    q = parse_qs(url.query)
                    s_sr = int(q.get("sr", [str(target_sr)])[0])
                    window_s = float(q.get("window_s", ["20"])[0])
                    min_seg = float(q.get("min_segment_s", ["2"])[0])
                    if not 4000 <= s_sr <= 48000:
                        raise ValueError(f"sr {s_sr} outside [4000, 48000]")
                    if not 0 < min_seg < window_s <= 120:
                        raise ValueError(
                            "need 0 < min_segment_s < window_s <= 120")
                except Exception as e:  # noqa: BLE001 — bad query -> 400
                    self._reply(400, {"error": f"{type(e).__name__}: {e}"})
                    return
                import uuid

                from ss_asr_tpu.streaming import StreamingTranscriber

                with stream_lock:
                    if len(stream_sessions) >= MAX_STREAM_SESSIONS:
                        with batcher._cv:
                            batcher.stats.stream_rejected += 1
                        self._reply(503, {"error": "stream sessions full"})
                        return
                    sid = uuid.uuid4().hex[:16]
                    stream_sessions[sid] = {
                        "st": StreamingTranscriber(
                            batcher._t, sr=s_sr, commit_window_s=window_s,
                            min_segment_s=min_seg),
                        "lock": threading.Lock(),
                        "last": time.monotonic(),
                    }
                self._reply(200, {"id": sid, "sr": s_sr})
                return
            if len(parts) == 2 or (len(parts) == 3 and parts[2] == "end"):
                with stream_lock:
                    sess = stream_sessions.get(parts[1])
                if sess is None:
                    self._reply(404, {"error": "no such stream"})
                    return
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n) if n else b""
                if len(body) % 2:
                    self._reply(400, {"error": "odd PCM16 byte count"})
                    return
                if not detail_gate.acquire(timeout=30.0):
                    with batcher._cv:
                        batcher.stats.detail_rejected += 1
                    self._reply(503, {"error": "detail path saturated"})
                    return
                try:
                    with batcher._cv:
                        batcher.stats.stream_requests += 1
                    with sess["lock"]:
                        sess["last"] = time.monotonic()
                        st = sess["st"]
                        if len(parts) == 3:  # /end
                            text = st.finalize()
                            with stream_lock:
                                stream_sessions.pop(parts[1], None)
                            self._reply(200, {"text": text})
                            return
                        if body:
                            pcm = np.frombuffer(body, "<i2")
                            st.feed(pcm.astype(np.float32) / 32768.0)
                        self._reply(200, {
                            "partial": st.partial(),
                            "committed": st.committed_text,
                        })
                except Exception as e:  # noqa: BLE001 — one stream's failure is a 5xx
                    self._reply(500, {"error": f"{type(e).__name__}: {e}"})
                finally:
                    detail_gate.release()
                return
            self._reply(404, {"error": "not found"})

        def do_POST(self):
            if self.path == "/reload":
                if not reload_paths or not reload_paths.get("asr"):
                    self._reply(404, {"error": "server started without "
                                               "reloadable checkpoint paths"})
                    return
                try:
                    import jax
                    import jax.numpy as jnp

                    from ss_asr_tpu.utils import checkpoint as ckpt

                    params = jax.tree.map(
                        jnp.asarray, ckpt.load_auto(reload_paths["asr"]))
                    lm = None
                    if reload_paths.get("lm"):
                        lm = jax.tree.map(
                            jnp.asarray, ckpt.load_auto(reload_paths["lm"]))
                    batcher.reload_params(params, lm)
                    self._reply(200, {"reloaded": reload_paths["asr"]})
                except Exception as e:  # noqa: BLE001 — keep serving old weights
                    self._reply(500, {"error": f"{type(e).__name__}: {e}"})
                return
            from urllib.parse import parse_qs, urlparse

            url = urlparse(self.path)
            if url.path == "/stream" or url.path.startswith("/stream/"):
                self._handle_stream(url)
                return
            if url.path != "/transcribe":
                self._reply(404, {"error": "not found"})
                return
            try:  # client-side failures: unparseable body/query -> 400
                q = parse_qs(url.query)
                detail = q.get("detail", ["0"])[0] not in ("0", "", "false")
                long_form = q.get("long", ["0"])[0] not in ("0", "", "false")
                window_s = float(q.get("window_s", ["20"])[0])
                overlap_s = float(q.get("overlap_s", ["2"])[0])
                vad = q.get("vad", [None])[0]
                if vad not in (None, "energy"):
                    self._reply(400, {"error": "vad must be 'energy'"})
                    return
                if long_form and not (0 < overlap_s < window_s <= 120):
                    self._reply(400, {"error": "need 0 < overlap_s < "
                                               "window_s <= 120"})
                    return
                n_best = max(1, int(q.get("nbest", ["1"])[0]))
                if long_form and (detail or n_best > 1):
                    self._reply(400, {"error": "long and detail/nbest are "
                                               "exclusive"})
                    return
                if n_best > MAX_NBEST:
                    # nbest sizes the beam program (B*K decoder rows, a
                    # fresh compile per distinct K) — client-unbounded
                    # values are a denial-of-service knob, not an option
                    self._reply(400, {"error": f"nbest > {MAX_NBEST}"})
                    return
                n = int(self.headers.get("Content-Length", 0))
                wav_sr, y = read_wav(io.BytesIO(self.rfile.read(n)))
                if wav_sr != target_sr:
                    y = resample(y, wav_sr, target_sr)
            except Exception as e:  # noqa: BLE001 — bad input must not kill the server
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})
                return
            try:  # server-side failures: frontend/decode/shutdown -> 500
                if y.size == 0:
                    self._reply(200, {"text": ""})
                    return
                if long_form:
                    # windowed decode + overlap merge: one batched program
                    # for all windows, through the detail path's admission
                    # gate (it bypasses the batcher the same way)
                    if not detail_gate.acquire(timeout=30.0):
                        with batcher._cv:
                            batcher.stats.detail_rejected += 1
                        self._reply(503, {"error": "detail path saturated"})
                        return
                    try:
                        with batcher._cv:
                            batcher.stats.detail_requests += 1
                        text = batcher._t.transcribe_long(
                            np.asarray(y, np.float32), target_sr,
                            window_s=window_s, overlap_s=overlap_s, vad=vad)
                    finally:
                        detail_gate.release()
                    self._reply(200, {"text": text})
                    return
                fb = None
                if batcher.mode == "signal":
                    item = np.asarray(y, np.float32)
                else:
                    fb = item = np.asarray(
                        compute_fbank(np.asarray(y, np.float32), target_sr,
                                      n_mels=feat)
                    )
                if detail or n_best > 1:
                    # rich path: n-best + confidence + per-char timestamps.
                    # Goes straight to the Transcriber (its executables are
                    # cached like the batcher's); the dynamic batcher only
                    # coalesces the plain-text path, so admission control
                    # here is the semaphore: at capacity -> 503 (shed),
                    # like a closed batcher.
                    if not detail_gate.acquire(timeout=30.0):
                        with batcher._cv:
                            batcher.stats.detail_rejected += 1
                        self._reply(503, {"error": "detail path saturated"})
                        return
                    try:
                        with batcher._cv:
                            batcher.stats.detail_requests += 1
                        if fb is None:
                            fb = np.asarray(
                                compute_fbank(np.asarray(y, np.float32),
                                              target_sr, n_mels=feat))
                        (hyps,) = batcher._t.transcribe_fbank_detailed(
                            fb, n_best=n_best)
                    finally:
                        detail_gate.release()
                    self._reply(200, {
                        "text": hyps[0].text,
                        "hypotheses": [
                            {
                                "text": h.text,
                                "score": h.score,
                                "avg_logprob": h.avg_logprob,
                                "char_starts": [round(float(s), 3)
                                                for s in h.char_starts],
                                "words": [
                                    {"word": w["word"],
                                     "start": round(w["start"], 3),
                                     "end": round(w["end"], 3),
                                     "avg_logprob": round(
                                         w["avg_logprob"], 4)}
                                    for w in h.words()
                                ],
                            }
                            for h in hyps
                        ],
                    })
                    return
                text = batcher.submit(item).result()
                self._reply(200, {"text": text})
            except Exception as e:  # noqa: BLE001 — a failed batch is a 5xx, not a crash
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    server = ThreadingHTTPServer((host, port), Handler)
    server.daemon_threads = True
    if ready_event is not None:
        ready_event.set()
        return server
    try:
        server.serve_forever()
    finally:
        server.server_close()
