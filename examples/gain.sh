#!/usr/bin/env bash
# Semi-supervised gain, end to end: the thesis' central claim (aux training
# on unlabeled audio/text lifts low-resource ASR, Tables 6.6-6.12) as one
# command on a synthetic homophone corpus — no download needed.
#
# The corpus renders some characters as ANOTHER character's tone (i->e,
# g->c), so only text knowledge can pick the right spelling; labeled audio
# is scarce (--labeled-utts) while un-paired audio + text are abundant —
# exactly the regime the aux seed chain targets.
#
# Tiny sizes so it finishes in minutes on CPU; m2 (+TAE) is the stage that
# carries the gain. For the recorded flagship artifact (m1 vs m2 vs m5,
# 250 epochs on-chip) see docs/GAIN_M1_VS_M5.json; for the controlled
# experiment isolating WHY the SAE stage can hurt (listener tanh
# saturation) and the sae.listener_lr_scale guardrail, docs/GAIN_AB.json.
set -euo pipefail

WORK="${1:-/tmp/ss_asr_gain}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

python "$REPO/benchmarks/malromur_parity.py" compare \
    --work "$WORK" --synthetic 48 --size tiny --models m1,m2 \
    --labeled-utts 24 --epochs 4 --lm-epochs 2 --seed-epochs 2 \
    --max-decode-steps 24 --out "$WORK/gain.json"

echo "== gain report =="
python - "$WORK/gain.json" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
print("gain (m2 - m1):", json.dumps(d["gain_m2_minus_m1"], indent=1))
print("semi_supervised_helps:", d["semi_supervised_helps"])
print("(tiny smoke of the one-command path; the recorded flagship "
      "artifact is docs/GAIN_M1_VS_M5.json)")
EOF
