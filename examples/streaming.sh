#!/usr/bin/env bash
# Live streaming recognition, end to end and runnable anywhere:
# a "microphone" (a wav replayed in 200 ms chunks) feeds an HTTP streaming
# session; partial transcripts print as they firm up; the final transcript
# is checked against the one-shot long-form decode of the same audio.
# (Library surface: ss_asr_tpu.streaming.StreamingTranscriber; HTTP:
# POST /stream — see docs/SERVING.md "Streaming" section.)
set -euo pipefail

WORK="${1:-/tmp/ss_asr_streaming}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
# tiny shapes; CPU everywhere (matches multichip.sh — a serving deployment
# would drop this and let the TPU backend pick up the same code)
export JAX_PLATFORMS=cpu
mkdir -p "$WORK"; cd "$WORK"

echo "== 1. a model + 4 s of 'speech' (three bursts separated by pauses) =="
python - <<'EOF'
import numpy as np, jax, wave
from ss_asr_tpu.models import las
from ss_asr_tpu.utils.checkpoint import save_pytree

cfg = las.ASRConfig(encoder_state_size=8, decoder_state_size=8,
                    mlp_out_size=8, feature_dim=40)
save_pytree("asr.npz", las.init_asr(jax.random.PRNGKey(0), cfg))
sr, rng = 8000, np.random.RandomState(1)
burst = 0.5 * rng.randn(sr).astype(np.float32)
gap = 0.001 * rng.randn(sr // 2).astype(np.float32)
y = np.concatenate([burst, gap, burst, gap, burst])
pcm = (np.clip(y, -1, 1) * 32767).astype(np.int16)
with wave.open("mic.wav", "wb") as w:
    w.setnchannels(1); w.setsampwidth(2); w.setframerate(sr)
    w.writeframes(pcm.tobytes())
print(f"  {len(y)/sr:.1f} s at {sr} Hz")
EOF

echo "== 2. stream it through an HTTP session, printing live partials =="
python - <<'EOF'
import json, threading, urllib.request, wave
import numpy as np, jax
from ss_asr_tpu.api import Transcriber
from ss_asr_tpu.models import las
from ss_asr_tpu.serve import BatchingTranscriber, serve_http
from ss_asr_tpu.utils.checkpoint import load_pytree

cfg = las.ASRConfig(encoder_state_size=8, decoder_state_size=8,
                    mlp_out_size=8, feature_dim=40)
t = Transcriber(jax.tree.map(jax.numpy.asarray, load_pytree("asr.npz")),
                cfg, sr=8000, max_steps=8, t_bucket=16)
ready = threading.Event()
with wave.open("mic.wav", "rb") as w:
    sr, pcm = w.getframerate(), np.frombuffer(
        w.readframes(w.getnframes()), "<i2")

with BatchingTranscriber(t) as bt:
    server = serve_http(bt, host="127.0.0.1", port=0, sr=sr,
                        ready_event=ready)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    def post(path, data=b""):
        req = urllib.request.Request(base + path, data=data)
        with urllib.request.urlopen(req, timeout=300) as r:
            return json.loads(r.read())

    sid = post(f"/stream?sr={sr}&window_s=1.5&min_segment_s=0.5")["id"]
    chunk = sr // 5  # 200 ms
    for i in range(0, len(pcm), chunk):
        d = post(f"/stream/{sid}", pcm[i:i + chunk].tobytes())
        print(f"  t={min(i + chunk, len(pcm)) / sr:4.1f}s  "
              f"partial: {d['partial']!r}")
    final = post(f"/stream/{sid}/end")["text"]
    print("final  :", repr(final))
    # sanity: the streamed result == pause-cut long-form decode offline
    offline = t.transcribe_long(pcm.astype(np.float32) / 32768.0, sr,
                                window_s=1.5, overlap_s=0.5, vad="energy")
    print("offline:", repr(offline))
    assert final == offline, "streamed final != offline VAD long-form"
    server.shutdown()
print("OK — streamed final matches the offline decode")
EOF
