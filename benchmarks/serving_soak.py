"""Serving soak: sustained concurrent load against the real HTTP server.

Complements serving_load.py (which measures latency/throughput in-process):
this drives the FULL stack — HTTP threads, WAV parsing, the batcher, hot
reloads mid-traffic — for ``--seconds`` and verifies nothing degrades:

* every request returns 200 with a string transcript;
* the batcher worker survives (requests keep resolving at the end);
* process RSS stays flat after warmup (the stats windows are bounded;
  a leak in the batch path would compound at thousands of requests);
* periodic POST /reload (same checkpoint) never drops a request.

    python benchmarks/serving_soak.py --seconds 120 --clients 8

Exit code 0 = clean soak; prints one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.error
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=120.0)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--reload-every", type=float, default=10.0,
                    help="seconds between hot reloads (0 = never)")
    ap.add_argument("--detail-every", type=int, default=16,
                    help="every Nth request per client uses the detail "
                         "path (?detail=1&nbest=2); 0 = never")
    ap.add_argument("--stream-every", type=int, default=24,
                    help="every Nth iteration per client runs a whole "
                         "streaming session (/stream create, 3 PCM "
                         "chunks, /end); 0 = never")
    ap.add_argument("--quick", action="store_true",
                    help="tiny model (CPU-friendly); default flagship")
    args = ap.parse_args()

    import wave
    import io

    import jax
    import numpy as np

    from ss_asr_tpu.api import Transcriber
    from ss_asr_tpu.models import las
    from ss_asr_tpu.serve import BatchingTranscriber, serve_http
    from ss_asr_tpu.utils import checkpoint as ckpt

    sr = 8000
    if args.quick:
        cfg = las.ASRConfig(encoder_state_size=8, decoder_state_size=8,
                            mlp_out_size=8, feature_dim=40)
        kw = {"max_steps": 8, "t_bucket": 16}
    else:
        cfg = las.ASRConfig()
        kw = {"max_steps": 48, "t_bucket": 128}
    params = las.init_asr(jax.random.key(0), cfg)
    ckpt_path = "/tmp/ss_asr_soak_ckpt.npz"
    ckpt.save_pytree(ckpt_path, params)
    t = Transcriber(params, cfg, sr=sr, **kw)

    rng = np.random.default_rng(0)

    def wav_bytes(n):
        buf = io.BytesIO()
        y = (0.1 * rng.standard_normal(n) * 32767).astype(np.int16)
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(y.tobytes())
        return buf.getvalue()

    payloads = [wav_bytes(n) for n in (3000, 4500, 6000)]
    # raw PCM16 chunks for streaming sessions (~190 ms each)
    pcm_chunks = [
        (0.1 * rng.standard_normal(1500) * 32767).astype("<i2").tobytes()
        for _ in range(3)
    ]

    ready = threading.Event()
    ok = [0]
    detail_ok = [0]
    stream_ok = [0]
    shed = [0]  # 503s from the detail admission gate (correct shedding)
    errs: list = []
    reloads = [0]
    lock = threading.Lock()
    stop = threading.Event()

    with BatchingTranscriber(t, max_batch=args.clients,
                             max_wait_ms=5, mode="signal") as bt:
        server = serve_http(bt, host="127.0.0.1", port=0, sr=sr,
                            ready_event=ready,
                            reload_paths={"asr": ckpt_path, "lm": None})
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{port}"

        def client(ci):
            crng = np.random.default_rng(ci)
            k = 0
            while not stop.is_set():
                body = payloads[int(crng.integers(len(payloads)))]
                k += 1
                # every Nth iteration: a whole streaming session (create,
                # feed chunks, finalize) — the third serving path. 503s
                # (session table or detail gate full) are correct shedding.
                if args.stream_every and k % args.stream_every == 0:
                    try:
                        with urllib.request.urlopen(urllib.request.Request(
                                base + f"/stream?sr={sr}&window_s=2"
                                       "&min_segment_s=0.5", data=b""),
                                timeout=600) as r:
                            sid = json.load(r)["id"]
                        for chunk in pcm_chunks:
                            with urllib.request.urlopen(
                                    urllib.request.Request(
                                        base + f"/stream/{sid}", data=chunk),
                                    timeout=600) as r:
                                assert isinstance(
                                    json.load(r)["partial"], str)
                        with urllib.request.urlopen(urllib.request.Request(
                                base + f"/stream/{sid}/end", data=b""),
                                timeout=600) as r:
                            assert isinstance(json.load(r)["text"], str)
                        with lock:
                            stream_ok[0] += 1
                    except urllib.error.HTTPError as e:
                        with lock:
                            if e.code == 503:
                                shed[0] += 1
                            else:
                                errs.append(f"stream HTTP {e.code}: {e}")
                    except Exception as e:  # noqa: BLE001 — collect, report, fail at exit
                        with lock:
                            errs.append(f"stream {type(e).__name__}: {e}")
                    continue
                # every Nth request rides the detail path (n-best +
                # timestamps, bypasses the batcher through its admission
                # gate) so the soak exercises both serving paths together;
                # a 503 from the gate is correct shedding, not an error
                detail = args.detail_every and k % args.detail_every == 0
                url = base + ("/transcribe?detail=1&nbest=2" if detail
                              else "/transcribe")
                req = urllib.request.Request(url, data=body)
                try:
                    with urllib.request.urlopen(req, timeout=600) as r:
                        d = json.load(r)
                    assert isinstance(d["text"], str)
                    if detail:
                        assert len(d["hypotheses"]) == 2
                        with lock:
                            detail_ok[0] += 1
                    else:
                        with lock:
                            ok[0] += 1
                except urllib.error.HTTPError as e:
                    if detail and e.code == 503:
                        with lock:
                            shed[0] += 1
                    else:
                        with lock:
                            errs.append(f"HTTP {e.code}: {e}")
                except Exception as e:  # noqa: BLE001 — collect, report, fail at exit
                    with lock:
                        errs.append(f"{type(e).__name__}: {e}")

        def reloader():
            while not stop.is_set():
                stop.wait(args.reload_every)
                if stop.is_set():
                    return
                req = urllib.request.Request(base + "/reload", data=b"")
                try:
                    with urllib.request.urlopen(req, timeout=120):
                        reloads[0] += 1
                except Exception as e:  # noqa: BLE001
                    with lock:
                        errs.append(f"reload: {type(e).__name__}: {e}")

        # pre-warm every executable shape the storm will hit (each length
        # bucket, plain + detail) so rss_warm is a post-compile baseline
        # and growth measures the steady state, not late compiles
        for body in payloads:
            for url in ([base + "/transcribe"]
                        + ([base + "/transcribe?detail=1&nbest=2"]
                           if args.detail_every else [])):
                with urllib.request.urlopen(
                        urllib.request.Request(url, data=body),
                        timeout=600) as r:
                    json.load(r)
        if args.stream_every:  # warm the streaming decode shapes too
            with urllib.request.urlopen(urllib.request.Request(
                    base + f"/stream?sr={sr}&window_s=2&min_segment_s=0.5",
                    data=b""), timeout=600) as r:
                sid = json.load(r)["id"]
            for chunk in pcm_chunks:
                urllib.request.urlopen(urllib.request.Request(
                    base + f"/stream/{sid}", data=chunk), timeout=600).read()
            urllib.request.urlopen(urllib.request.Request(
                base + f"/stream/{sid}/end", data=b""), timeout=600).read()

        threads = [threading.Thread(target=client, args=(ci,))
                   for ci in range(args.clients)]
        for th in threads:
            th.start()
        if args.reload_every:
            threading.Thread(target=reloader, daemon=True).start()

        # RSS after a warmup slice, then at the end
        time.sleep(min(20.0, args.seconds / 4))
        rss_warm = _rss_mb()
        time.sleep(args.seconds - min(20.0, args.seconds / 4))
        stop.set()
        for th in threads:
            th.join()
        rss_end = _rss_mb()

        # the worker must still be alive after the storm
        final = bt.submit(np.zeros((4000,), np.float32)).result(timeout=600)
        assert isinstance(final, str)
        with bt._cv:
            stats = bt.stats.as_dict()
        server.shutdown()
        server.server_close()

    growth = rss_end - rss_warm
    summary = {
        "metric": "serving_soak",
        "seconds": args.seconds,
        "clients": args.clients,
        "requests_ok": ok[0],
        "detail_ok": detail_ok[0],
        "stream_ok": stream_ok[0],
        "detail_shed": shed[0],
        "errors": len(errs),
        "reloads": reloads[0],
        "rss_warm_mb": round(rss_warm, 1),
        "rss_end_mb": round(rss_end, 1),
        "rss_growth_mb": round(growth, 1),
        "mean_batch": round(stats.get("mean_batch", 0.0), 2),
        "ok": (not errs and ok[0] > 0 and growth < 256
               and (not args.detail_every or detail_ok[0] > 0)
               and (not args.stream_every or stream_ok[0] > 0)),
    }
    print(json.dumps(summary))
    if errs:
        print("\n".join(errs[:10]), file=sys.stderr)
    sys.exit(0 if summary["ok"] else 1)


if __name__ == "__main__":
    main()
