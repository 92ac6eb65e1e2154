#!/usr/bin/env bash
# Quickstart: synthetic corpus -> preprocess -> train -> decode, end to end.
# Runs anywhere (CPU or TPU); ~2 minutes on CPU.
set -euo pipefail

WORK="${1:-/tmp/ss_asr_quickstart}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
cd "$WORK" 2>/dev/null || { mkdir -p "$WORK"; cd "$WORK"; }

echo "== 1. synthesize a learnable tone corpus =="
python -m ss_asr_tpu.cli.mkdata corpus --n 32

echo "== 2. wav+txt -> fbanks + index =="
python -m ss_asr_tpu.cli.preprocess generic processed corpus/wav corpus/txt --sr 8000

echo "== 3. train/eval split =="
python -c "from ss_asr_tpu.data.index import make_split; make_split('processed/index.tsv', seed=0)"

echo "== 4. write a small config =="
python - <<'EOF'
import yaml
cfg = {
  "asr": {
    "opt": {"type": "Adam", "learning_rate": 0.002},
    "mdl": {"encoder_state_size": 32, "mlp_out_size": 16,
             "decoder_state_size": 32, "tf_rate": 0.9, "feature_dim": 40},
    "train_index": "processed/train.tsv", "valid_index": "processed/eval.tsv",
    "test_index": "processed/eval.tsv",
    "t_bucket": 32, "l_bucket": 16, "train_batch_size": 8, "valid_batch_size": 8,
    "n_epochs": 30, "valid_step": 50, "logging_step": 10, "save_step": 100,
    "wer_step": 1000000, "decode_beam_size": 3, "decode_lm_weight": 0.0,
  },
}
yaml.safe_dump(cfg, open("conf.yaml", "w"))
EOF

echo "== 5. train =="
python -m ss_asr_tpu.cli.train ASRTrainer quickstart conf.yaml runs result

echo "== 6. decode the eval set (beam-3) =="
python -m ss_asr_tpu.cli.train ASRTester quickstart conf.yaml runs result

echo "== 7. serve over HTTP with dynamic batching =="
python -m ss_asr_tpu.cli.serve result/quickstart/asr.npz --config conf.yaml \
    --sr 8000 --port 18765 --max-wait-ms 20 &
SERVE_PID=$!
trap 'kill $SERVE_PID 2>/dev/null || true' EXIT
for i in $(seq 1 60); do
  curl -sf http://127.0.0.1:18765/healthz >/dev/null 2>&1 && break
  sleep 1
done
WAV=$(ls corpus/wav/*.wav | head -1)
echo "transcribing $WAV over HTTP:"
curl -s --data-binary @"$WAV" http://127.0.0.1:18765/transcribe
echo
curl -s http://127.0.0.1:18765/stats
echo
kill $SERVE_PID 2>/dev/null || true

echo "== done; artifacts under $WORK/result/quickstart =="
ls result/quickstart/
