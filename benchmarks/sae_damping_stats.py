"""Assemble the hard-corpus SAE-damping sweep into one claim artifact.

Round-4 VERDICT weak #3: on the hard corpus, m5 (TAE->SAE) does not beat m2
(TAE-only), and the ``sae.listener_lr_scale`` damping guardrail that made
M5 win on the tone corpus (docs/GAIN_AB.json) was never swept here.  The
sweep runs m5 alone at damped scales on the SAME corpus/seed as recorded
full-menu seeds:

    malromur_parity.py compare --work .campaign/hard_sae/s4_sc0p1 \
        --synthetic 640 --hard --labeled-utts 128 --epochs 250 \
        --seed-epochs 6 --models m5 --seed 4 --sae-listener-lr-scale 0.1 \
        --out docs/gain_hard_seeds/sweep_s4_sc0p1.json

This script joins those single-arm artifacts with the per-seed menu files
(``docs/gain_hard_seeds/seed<K>.json``: m2 and the undamped m5) into
``docs/GAIN_SAE_DAMPING_HARD.json``: per-(seed, scale) greedy/best-mode
WER, pooled per-scale stats, and a data-gated verdict on whether damping
rescues the thesis' M5-best ordering (Table 6.12) at this operating point.

    python benchmarks/sae_damping_stats.py --out docs/GAIN_SAE_DAMPING_HARD.json
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MODES = ("greedy_wer", "beam8_wer", "beam8_lm_wer")


def _best(blk: dict) -> float:
    return min(blk.get(k, 1e9) for k in MODES)


def collect(seed_dir: str) -> dict:
    """{seed: {"m2": blk, "m5@1.0": blk, "m5@<scale>": blk, ...}} from the
    committed per-seed artifacts."""
    cells: dict = {}
    for path in glob.glob(os.path.join(seed_dir, "seed*.json")):
        m = re.fullmatch(r"seed(\d+)\.json", os.path.basename(path))
        if not m:
            continue
        with open(path) as f:
            d = json.load(f)
        k = int(m.group(1))
        if "m2" in d and "m5" in d:
            cells.setdefault(k, {})["m2"] = d["m2"]
            cells[k]["m5@1.0"] = d["m5"]
    for path in glob.glob(os.path.join(seed_dir, "sweep_s*_sc*.json")):
        m = re.fullmatch(r"sweep_s(\d+)_sc(\d+p\d+)\.json",
                         os.path.basename(path))
        if not m:
            continue
        with open(path) as f:
            d = json.load(f)
        if "m5" not in d:
            continue
        k, scale = int(m.group(1)), m.group(2).replace("p", ".")
        cells.setdefault(k, {})[f"m5@{scale}"] = d["m5"]
    return cells


def summarize(cells: dict) -> dict:
    from benchmarks.gain_stats import _mean_std, _sign_test_p

    arms = sorted({a for blk in cells.values() for a in blk})
    table = {
        str(seed): {a: {"greedy_wer": blk[a].get("greedy_wer"),
                        "best_mode_wer": round(_best(blk[a]), 4)}
                    for a in blk}
        for seed, blk in sorted(cells.items())
    }
    pooled = {
        a: {met: _mean_std([blk[a][f"{met}"] if met != "best_mode_wer"
                            else _best(blk[a])
                            for blk in cells.values() if a in blk])
            for met in ("greedy_wer", "best_mode_wer")}
        for a in arms
    }
    vs_m2 = {}
    for a in arms:
        if a == "m2":
            continue
        pairs = [(blk[a], blk["m2"]) for blk in cells.values()
                 if a in blk and "m2" in blk]
        if not pairs:
            continue
        hits = sum(1 for x, y in pairs
                   if x.get("greedy_wer", 1e9) < y.get("greedy_wer", 1e9))
        ties = sum(1 for x, y in pairs
                   if x.get("greedy_wer") == y.get("greedy_wer"))
        vs_m2[a] = {
            "beats_m2_greedy": f"{hits}/{len(pairs)}",
            "sign_test_p": _sign_test_p(hits, len(pairs) - ties),
            "paired_dwer_greedy": _mean_std(
                [x.get("greedy_wer", 1e9) - y.get("greedy_wer", 1e9)
                 for x, y in pairs]),
        }
    concl = []
    damped = {a: v for a, v in vs_m2.items()
              if a.startswith("m5@") and a != "m5@1.0"}
    und = vs_m2.get("m5@1.0")
    if und:
        concl.append(
            f"undamped m5 beats m2 (greedy) in {und['beats_m2_greedy']} "
            f"seeds (p={und['sign_test_p']})")
    for a, v in sorted(damped.items()):
        concl.append(
            f"{a} beats m2 (greedy) in {v['beats_m2_greedy']} seeds "
            f"(p={v['sign_test_p']}, paired dWER "
            f"{v['paired_dwer_greedy']['mean']})")
    if damped:
        best_scale = min(
            damped, key=lambda a: damped[a]["paired_dwer_greedy"]["mean"])
        d = damped[best_scale]["paired_dwer_greedy"]["mean"]
        u = (und or {}).get("paired_dwer_greedy", {}).get("mean")
        hits, total = (int(x) for x in
                       damped[best_scale]["beats_m2_greedy"].split("/"))
        p = damped[best_scale]["sign_test_p"]
        # an ordering-rescued claim needs a per-seed MAJORITY, not just a
        # negative mean (one strong seed can flip a small-n mean); the
        # quoted sign-test p carries the remaining uncertainty
        if u is not None and d < u and d < 0 and hits * 2 > total:
            concl.append(
                f"damping helps AND rescues the ordering at {best_scale}: "
                f"paired dWER vs m2 moves {u} -> {d} "
                f"({hits}/{total} seeds, p={p}) — the tone-corpus "
                f"guardrail story (docs/GAIN_AB.json) carries to the hard "
                f"corpus")
        elif u is not None and d < u and d <= 0:
            concl.append(
                f"damping at {best_scale} brings m5 to statistical parity "
                f"with m2 (paired dWER {u} -> {d}, {hits}/{total} seeds, "
                f"p={p}) — the collapse is fully prevented but an m5-beats-"
                f"m2 ordering is not established at this seed count")
        elif u is not None and d < u:
            concl.append(
                f"damping helps m5 (paired dWER vs m2 {u} -> {d} at "
                f"{best_scale}) but does NOT flip the m2-leads ordering "
                f"at this regime — the SAE stage adds nothing over "
                f"TAE-only here even damped")
        elif u is not None:
            concl.append(
                f"damping does NOT help on the hard corpus (best damped "
                f"paired dWER {d} vs undamped {u}) — the m2-leads result "
                f"is not a saturation artifact; SAE's failure to add over "
                f"TAE here is a real property of this operating point")
    return {
        "what": ("SAE listener-lr damping sweep on the hard corpus, joined "
                 "against the recorded per-seed menu runs (thesis Table "
                 "6.12 M5-best question; round-4 VERDICT weak #3)"),
        "arms": arms,
        "per_seed": table,
        "pooled": pooled,
        "vs_m2": vs_m2,
        "conclusions": concl,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed-dir",
                    default=os.path.join(REPO, "docs", "gain_hard_seeds"))
    ap.add_argument("--out", default=os.path.join(
        REPO, "docs", "GAIN_SAE_DAMPING_HARD.json"))
    args = ap.parse_args(argv)
    cells = collect(args.seed_dir)
    if not cells:
        raise SystemExit(f"no per-seed artifacts under {args.seed_dir}")
    out = summarize(cells)
    out["source_dir"] = args.seed_dir
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    json.dump(out["conclusions"], sys.stdout, indent=1)
    print()
    print(f"written to {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
