#!/usr/bin/env bash
# Multi-HOST (multi-process) data-parallel training, runnable ANYWHERE:
# two local processes stand in for two hosts, each with 2 virtual CPU
# devices, connected by jax.distributed (Gloo collectives). On a real
# multi-host TPU slice, drop the env vars, set parallel: {distributed: true}
# in the config, and launch one process per host — jax.distributed then
# auto-discovers the coordinator and the Solver derives each host's input
# shard from jax.process_index/count.
set -euo pipefail

WORK="${1:-/tmp/ss_asr_multihost}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
rm -rf "$WORK"; mkdir -p "$WORK"; cd "$WORK"

echo "== 1. synthesize + preprocess a tone corpus =="
JAX_PLATFORMS=cpu python -m ss_asr_tpu.cli.mkdata corpus --n 32
JAX_PLATFORMS=cpu python -m ss_asr_tpu.cli.preprocess generic processed corpus/wav corpus/txt --sr 8000
JAX_PLATFORMS=cpu python -c "from ss_asr_tpu.data.index import make_split; make_split('processed/index.tsv', seed=0)"

echo "== 2. config: batch sizes are PER HOST =="
python - <<'EOF'
import yaml
cfg = {
  "asr": {
    "opt": {"type": "Adam", "learning_rate": 0.002},
    "mdl": {"encoder_state_size": 32, "mlp_out_size": 16,
             "decoder_state_size": 32, "tf_rate": 0.9, "feature_dim": 40},
    "train_index": "processed/train.tsv", "valid_index": "processed/eval.tsv",
    "test_index": "processed/eval.tsv",
    "t_bucket": 64, "l_bucket": 16, "train_batch_size": 4, "valid_batch_size": 4,
    "n_epochs": 6, "valid_step": 50, "logging_step": 5, "save_step": 100,
    "wer_step": 1000000,
  },
  # auto = all GLOBAL devices on the data axis (2 hosts x 2 devices = 4)
  "parallel": {"n_data": "auto"},
}
yaml.safe_dump(cfg, open("conf.yaml", "w"))
EOF

echo "== 3. launch one training process per 'host' =="
PORT=$(python -c "import socket; s=socket.socket(); s.bind(('localhost',0)); print(s.getsockname()[1]); s.close()")
for i in 0 1; do
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=2 \
  python - "$i" "$PORT" <<'EOF' &
import sys
proc_id, port = int(sys.argv[1]), sys.argv[2]
import jax
jax.config.update("jax_platforms", "cpu")
# on a real slice this is jax.distributed.initialize() with no arguments
# (parallel: {distributed: true} does it from cli.train)
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=proc_id)
import yaml
from ss_asr_tpu.train import ASRTrainer, make_paras
config = yaml.safe_load(open("conf.yaml"))
t = ASRTrainer(config, make_paras(name="multihost", logdir=f"runs{proc_id}",
                                  ckpdir=f"result{proc_id}", seed=1,
                                  verbose=proc_id == 0))
t.load_data(); t.set_model(); t.exec(); t.close()
EOF
done
wait

echo "== done; each 'host' holds the replicated checkpoints =="
ls result0/multihost/ result1/multihost/
