#!/usr/bin/env bash
# Migration: a (simulated) cadia-lvl/ss_asr checkpoint directory -> our
# format -> keep training -> decode with timestamps. Runs anywhere; the
# "reference run" is synthesized with torch so the example is self-contained
# — point SRC at a real reference ckpdir to migrate actual weights.
set -euo pipefail

WORK="${1:-/tmp/ss_asr_migrate}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
cd "$WORK" 2>/dev/null || { mkdir -p "$WORK"; cd "$WORK"; }

echo "== 0. a corpus to fine-tune/decode on (synthetic tones) =="
python -m ss_asr_tpu.cli.mkdata corpus --n 16
python -m ss_asr_tpu.cli.preprocess generic processed corpus/wav corpus/txt --sr 8000
python - <<'EOF'
import yaml
cfg = {
  "asr": {
    "opt": {"type": "Adam", "learning_rate": 0.001},
    "mdl": {"encoder_state_size": 256, "mlp_out_size": 128,
             "decoder_state_size": 256, "tf_rate": 0.9, "feature_dim": 40},
    "train_index": "processed/index.tsv", "valid_index": "processed/index.tsv",
    "test_index": "processed/index.tsv",
    "t_bucket": 32, "l_bucket": 16, "train_batch_size": 8,
    "valid_batch_size": 8, "n_epochs": 1, "valid_step": 10**6,
    "logging_step": 5, "save_step": 10**6, "wer_step": 10**6,
    "decode_beam_size": 1, "decode_lm_weight": 0.0,
  },
}
yaml.safe_dump(cfg, open("conf.yaml", "w"))
EOF

echo "== 1. simulate a trained reference run (torch .cpt state_dicts) =="
SRC="${SRC:-ref_result/old_exp}"
if [ ! -d "$SRC" ]; then
  python - <<'EOF'
import os, torch
os.makedirs("ref_result/old_exp", exist_ok=True)
# torch modules with the reference's exact state_dict key structure live
# in the parity test (PYTHONPATH has the repo root)
from tests.test_torch_import import _RefASR, _RefCharLM
torch.manual_seed(0)
torch.save(_RefASR(feat=40, enc=256, dec=256, mlp=128).state_dict(),
           "ref_result/old_exp/asr.cpt")
torch.save(_RefCharLM(vocab=50, h=128).state_dict(),
           "ref_result/old_exp/char_lm.cpt")
open("ref_result/old_exp/tracker.json", "w").write(
    '{"asr": {"best": 1.9, "step": 120000}}')
EOF
fi

echo "== 2. convert every .cpt (+tracker.json) to our .npz layout =="
python -m ss_asr_tpu.cli.import_ckpt "$SRC" result/migrated

echo "== 3. keep training FROM the migrated weights =="
python -m ss_asr_tpu.cli.train ASRTrainer migrated conf.yaml runs result

echo "== 4. decode ad-hoc audio with the migrated+tuned model =="
python -m ss_asr_tpu.cli.transcribe result/migrated/asr.npz \
    corpus/wav/u0000.wav --config conf.yaml --sr 8000 --max-steps 16 \
    --detail --nbest 2

echo "== migration complete =="
