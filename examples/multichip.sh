#!/usr/bin/env bash
# Multi-chip data-parallel training, runnable ANYWHERE: the mesh is real
# (8 virtual CPU devices here; on a TPU slice drop the two env vars and the
# same config uses the chips). Demonstrates the round-2 parallel surface:
#   parallel: {n_data: auto}  ->  every trainer step is a shard_map program
set -euo pipefail

WORK="${1:-/tmp/ss_asr_multichip}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
# virtual 8-device CPU mesh (delete these two lines on real TPU hardware)
export JAX_PLATFORMS=cpu
export XLA_FLAGS="--xla_force_host_platform_device_count=8 ${XLA_FLAGS:-}"
cd "$WORK" 2>/dev/null || { mkdir -p "$WORK"; cd "$WORK"; }

echo "== 1. synthesize + preprocess a learnable tone corpus =="
python -m ss_asr_tpu.cli.mkdata corpus --n 32
python -m ss_asr_tpu.cli.preprocess generic processed corpus/wav corpus/txt --sr 8000
python -c "from ss_asr_tpu.data.index import make_split; make_split('processed/index.tsv', seed=0)"

echo "== 2. config with an 8-way data-parallel mesh =="
python - <<'EOF'
import yaml
cfg = {
  "asr": {
    "opt": {"type": "Adam", "learning_rate": 0.002},
    "mdl": {"encoder_state_size": 32, "mlp_out_size": 16,
             "decoder_state_size": 32, "tf_rate": 0.9, "feature_dim": 40},
    "train_index": "processed/train.tsv", "valid_index": "processed/eval.tsv",
    "test_index": "processed/eval.tsv",
    "t_bucket": 64, "l_bucket": 16, "train_batch_size": 8, "valid_batch_size": 8,
    "n_epochs": 10, "valid_step": 50, "logging_step": 5, "save_step": 100,
    "wer_step": 1000000,
  },
  "parallel": {"n_data": "auto"},   # <- the whole multi-chip story
}
yaml.safe_dump(cfg, open("conf.yaml", "w"))
EOF

echo "== 3. train data-parallel over the mesh =="
python -m ss_asr_tpu.cli.train ASRTrainer multichip conf.yaml runs result

echo "== done; checkpoints (params + optimizer state) under $WORK/result/multichip =="
ls result/multichip/
