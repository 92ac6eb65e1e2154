"""Pool the SpecAugment A/B: augmented vs unaugmented m1 on IDENTICAL
corpus + training seed (the augmented runs reuse the gain sweep's work dirs,
so the corpus draw, split, labeled subset, and eval set match row for row).

Round-3 boundary (VERDICT weak #2): SpecAugment had no regime where it could
win — on an exactly-learnable pure-tone corpus masking can only slow
convergence. The hard corpus (speaker shifts, duration jitter, swept-SNR
noise) is the regime where robustness augmentation is *supposed* to pay;
this artifact records whether it does, per seed, with data-driven wording.

    python benchmarks/pool_specaug.py \
        --aug '.campaign/hard_aug/seed{k}.json' \
        --plain '.campaign/hard_gain/seed{k}.json' \
        --seeds 0,1,2 --out docs/GAIN_SPECAUG.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MODES = ("greedy", "beam8", "beam8_lm")


def pool(aug_tpl: str, plain_tpl: str, seeds, model: str = "m1") -> dict:
    per_seed = {}
    for k in seeds:
        with open(aug_tpl.format(k=k)) as f:
            aug = json.load(f)[model]
        with open(plain_tpl.format(k=k)) as f:
            plain = json.load(f)[model]
        row = {}
        for mode in MODES:
            for met in ("wer", "cer", "acc"):
                key = f"{mode}_{met}"
                if key in aug and key in plain:
                    row[key] = {"aug": aug[key], "plain": plain[key],
                                "delta": round(aug[key] - plain[key], 6)}
        per_seed[f"seed{k}"] = row

    best = lambda r, side: min(
        r[f"{m}_wer"][side] for m in MODES if f"{m}_wer" in r)
    wins = [s for s, r in per_seed.items() if best(r, "aug") < best(r, "plain")]
    ties = [s for s, r in per_seed.items()
            if best(r, "aug") == best(r, "plain")]
    n = len(per_seed)
    if len(wins) == n:
        verdict = ("SpecAugment HELPS on the hard corpus: augmented m1 beats "
                   f"unaugmented at its best decode mode in {len(wins)}/{n} "
                   "seeds — the round-3 'no regime where it can win' "
                   "boundary is closed")
    elif len(wins) > n / 2:
        verdict = (f"SpecAugment helps in {len(wins)}/{n} seeds "
                   "(majority, not seed-robust) on the hard corpus")
    elif wins:
        verdict = (f"SpecAugment is seed-dependent here: {len(wins)}/{n} "
                   "seeds improve; not validated as a gain at this "
                   "operating point")
    else:
        verdict = (f"SpecAugment does NOT help at this operating point "
                   f"({len(wins)}/{n} seeds) — with 250 epochs over 128 "
                   "labeled utts the masking tax may still dominate; a "
                   "positive delta would need a larger budget or stronger "
                   "train/eval mismatch")
    return {
        "what": ("augmented-vs-unaugmented m1 at identical corpus/split/"
                 "seed on the hard synthetic-speech corpus; deltas are "
                 "aug - plain (negative = augmentation better)"),
        "augment_config": {"n_freq_masks": 1, "freq_mask_width": 6,
                           "n_time_masks": 1, "time_mask_width": 12},
        "n_seeds": n,
        "aug_wins_best_mode": {"seeds": wins, "count": f"{len(wins)}/{n}",
                               **({"ties": ties} if ties else {})},
        "per_seed": per_seed,
        "conclusion": verdict,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--aug", required=True,
                    help="template with {k}, e.g. '.campaign/hard_aug/seed{k}.json'")
    ap.add_argument("--plain", required=True)
    ap.add_argument("--seeds", default="0,1,2")
    ap.add_argument("--model", default="m1")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    seeds = [int(s) for s in args.seeds.split(",") if s.strip()]
    result = pool(args.aug, args.plain, seeds, model=args.model)
    blob = json.dumps(result, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(blob)
    print(blob)


if __name__ == "__main__":
    main()
