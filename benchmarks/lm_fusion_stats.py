"""Pooled LM-fusion effect across the hard-corpus seeds (fixed λ=0.1).

Round-4 VERDICT weak #5: the λ-sweep's clean beam8+LM win was single-run;
the pooled menu had beam8_lm ≈ beam8 within one std.  With eight seeds on
record this script states the pooled claim: per (model arm, seed) the
paired delta ``beam8_lm_wer − beam8_wer`` at the shared λ=0.1 operating
point, pooled per arm and overall, with exact sign tests — a positive
fusion effect is ``delta < 0``.

    python benchmarks/lm_fusion_stats.py \
        --files <seed0.json,...,seed7.json> --out docs/LM_FUSION_POOLED.json

Reference anchor: the shallow-fusion rule /root/reference/src/asr.py:152-156
(λ·log_softmax(LM) added to the ASR log-probs), λ=0.1 per thesis
Table 6.12.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def pool(files: list) -> dict:
    from benchmarks.gain_stats import _mean_std, _sign_test_p

    per_arm: dict = {}
    n_seeds = 0
    for i, path in enumerate(files):
        with open(path) as f:
            d = json.load(f)
        arms = [k for k, v in d.items()
                if isinstance(v, dict) and "beam8_wer" in v
                and "beam8_lm_wer" in v and not k.startswith("gain_")]
        if not arms:
            continue
        n_seeds += 1
        for a in arms:
            per_arm.setdefault(a, []).append(
                (f"seed{i}", d[a]["beam8_lm_wer"] - d[a]["beam8_wer"]))

    def tally(deltas):
        hits = [s for s, x in deltas if x < 0]
        ties = [s for s, x in deltas if x == 0]
        return {
            "paired_delta_wer": _mean_std([x for _, x in deltas]),
            "lm_helps": f"{len(hits)}/{len(deltas)}",
            "hit_seeds": hits,
            **({"ties": ties} if ties else {}),
            "sign_test_p": _sign_test_p(len(hits), len(deltas) - len(ties)),
        }

    arms = {a: tally(ds) for a, ds in sorted(per_arm.items())}
    all_deltas = [d for ds in per_arm.values() for d in ds]
    overall = tally(all_deltas)
    hits, total = (int(x) for x in overall["lm_helps"].split("/"))
    n_ties = len(overall.get("ties", []))
    decided = total - n_ties
    if decided and hits * 2 > decided and overall["sign_test_p"] is not None \
            and overall["sign_test_p"] < 0.05:
        verdict = (f"LM shallow fusion at λ=0.1 helps: beam8_lm < beam8 in "
                   f"{overall['lm_helps']} (arm,seed) cells, "
                   f"p={overall['sign_test_p']}")
    elif decided and hits * 2 > decided:
        verdict = (f"LM fusion trends helpful ({overall['lm_helps']} cells) "
                   f"but does not clear p<0.05 "
                   f"(p={overall['sign_test_p']}) — not yet a pooled claim")
    else:
        verdict = (f"LM fusion does NOT help at this operating point "
                   f"({overall['lm_helps']} cells, "
                   f"p={overall['sign_test_p']}) — consistent with the "
                   f"probe-measured LM quality ceiling on the synthetic "
                   f"corpus (docs/LM_PROBE.json, docs/LM_SCALE.json)")
    return {
        "what": ("Paired beam8_lm − beam8 WER deltas at fixed λ=0.1 across "
                 "the recorded hard-corpus seeds, pooled per model arm and "
                 "overall (cells are (arm, seed) pairs; negative = fusion "
                 "helps). Exact two-sided sign tests."),
        "n_seeds": n_seeds,
        "per_arm": arms,
        "overall": overall,
        "conclusions": [verdict],
        "source_files": files,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", required=True)
    ap.add_argument("--out", default=os.path.join(
        REPO, "docs", "LM_FUSION_POOLED.json"))
    args = ap.parse_args(argv)
    files = [p.strip() for p in args.files.split(",") if p.strip()]
    out = pool(files)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    json.dump(out["conclusions"], sys.stdout, indent=1)
    print()
    print(f"written to {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
