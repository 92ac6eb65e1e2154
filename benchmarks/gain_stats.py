"""Pooled statistics over the recorded semi-supervised gain artifacts.

The gain story is spread over two kinds of on-chip experiments:

* the HEAD-TO-HEAD model-menu runs (``docs/GAIN_M1_VS_M5.json``,
  ``benchmarks/malromur_parity.py compare``) — m1 (supervised baseline)
  vs m2 (+TAE) vs m5 (TAE->SAE), full pipeline per seed, thesis
  Table 6.5/6.12 protocol (/root/reference thesis §6.4-6.5);
* the CONTROLLED fine-tune-initialization A/B (``docs/GAIN_AB.json``,
  ``benchmarks/sae_poisoning_ab.py``) — scratch vs post-TAE vs post-SAE
  (parity and damped) initializations at equal budget, 3 seeds.

Each artifact records per-seed numbers; the claims that matter (the
semi-supervised GAIN is seed-robust; the M5-best MARGIN is not, at this
synthetic scale) live in the distribution over seeds.  This script pools
every recorded seed into one summary — per-arm mean/std and per-seed
ordering consistency counts — so the claim boundary is a computed
artifact (``docs/GAIN_SUMMARY.json``) instead of prose.

Usage:  python benchmarks/gain_stats.py [--out docs/GAIN_SUMMARY.json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODES = ("greedy", "beam8", "beam8_lm")
MODELS = ("m1", "m2", "m5")


def _sign_test_p(hits: int, decided: int) -> float | None:
    """Exact two-sided sign-test p-value: probability, under H0 p=0.5, of a
    split at least as extreme as hits/decided (ties already excluded).
    The seed-count gate for ordering claims (round-4 VERDICT weak #3: 4
    seeds cannot resolve a small margin — the p-value says so numerically)."""
    if decided <= 0:
        return None
    lo, hi = min(hits, decided - hits), max(hits, decided - hits)
    p = sum(math.comb(decided, k) for k in range(0, lo + 1))
    p += sum(math.comb(decided, k) for k in range(hi, decided + 1))
    return round(min(p / 2.0 ** decided, 1.0), 4)


def _mean_std(xs):
    xs = [float(x) for x in xs]
    n = len(xs)
    if n == 0:
        return {"mean": None, "std": None, "n": 0}
    m = sum(xs) / n
    var = sum((x - m) ** 2 for x in xs) / n  # population: seeds ARE the set
    return {"mean": round(m, 4), "std": round(math.sqrt(var), 4), "n": n}


def head_to_head_seed_blocks(gain: dict, budget: str = "labeled_64"):
    """[(seed_label, {m1:{...}, m2:{...}, ...}), ...] for one budget.

    The first run at a budget is stored under the bare budget key (that run's
    seed is the harness default, 0); re-runs append ``_seed<k>`` suffixes.
    A block must carry at least two model arms to be poolable (partial menus
    are allowed — pool_seed_blocks intersects and records drops). A bare-key
    block coexisting with an explicit ``_seed0`` re-run is ambiguous (same
    seed recorded twice) and raises rather than double-counting.
    """
    rerun = gain.get("round3d_rerun", {})
    out = []
    for key, block in rerun.items():
        if not isinstance(block, dict) or len(_models_in(block)) < 2:
            continue
        if key == budget:
            out.append(("seed0", block))
        else:
            m = re.fullmatch(re.escape(budget) + r"_seed(\d+)", key)
            if m:
                out.append((f"seed{m.group(1)}", block))
    labels = [s for s, _ in out]
    if len(labels) != len(set(labels)):
        dup = sorted({s for s in labels if labels.count(s) > 1})
        raise ValueError(
            f"duplicate seed labels {dup} under budget {budget!r}: the bare "
            f"'{budget}' block IS seed 0 — record a seed-0 re-run by "
            "replacing it, not by adding a _seed0 sibling"
        )
    out.sort(key=lambda kv: int(kv[0][4:]))
    return out


def _models_in(block: dict):
    """Model-menu entries inside one seed block, in insertion order.

    A compare() result also carries derived ``gain_<m>_minus_<base>``
    sub-dicts whose keys look like model metrics — those are differences,
    not arms, and must not be pooled as models.
    """
    return [k for k, v in block.items()
            if isinstance(v, dict) and "greedy_wer" in v
            and not k.startswith("gain_")]


def pool_seed_blocks(seeds, base: str | None = None) -> dict:
    """Pool [(seed_label, {model: {mode_metric: x}})] into per-model
    mean/std, per-seed ordering-consistency counts, and paired gains.

    The two claims under test (thesis Tables 6.5-6.12):
      (a) GAIN — the baseline (first model, usually m1) is STRICTLY the
          worst arm;
      (b) MARGIN — each later menu entry STRICTLY beats each earlier aux
          entry (for m1,m2,m5 this is the thesis' M5-best ordering).
    Exact WER ties count for neither direction — they are recorded in a
    ``ties`` list so the x/N conclusion strings can never overstate.

    Only models present in EVERY seed block are pooled (apples-to-apples);
    anything dropped is recorded under ``dropped_models`` rather than
    silently vanishing.
    """
    if not seeds:
        return {"n_seeds": 0}
    models = _models_in(seeds[0][1])
    in_all = set(models)
    seen = set(models)
    for _, blk in seeds[1:]:
        ms = set(_models_in(blk))
        in_all &= ms
        seen |= ms
    dropped = sorted(seen - in_all)
    models = [m for m in models if m in in_all]
    if base is not None and base not in in_all:
        raise ValueError(f"base model {base!r} missing from some seed "
                         f"blocks (pooled models: {models})")
    base = base or (models[0] if models else None)
    aux = [m for m in models if m != base]

    def tally(hit_seeds, tie_seeds):
        row = {"seeds": hit_seeds, "count": f"{len(hit_seeds)}/{len(seeds)}"}
        if tie_seeds:
            row["ties"] = tie_seeds
        p = _sign_test_p(len(hit_seeds), len(seeds) - len(tie_seeds))
        if p is not None:
            row["sign_test_p"] = p
        return row

    pooled = {
        model: {
            f"{mode}_{met}": _mean_std(
                [blk[model][f"{mode}_{met}"] for _, blk in seeds]
            )
            for mode in MODES
            for met in ("wer", "acc", "cer")
            if all(f"{mode}_{met}" in blk[model] for _, blk in seeds)
        }
        for model in models
    }
    consistency = {}
    for mode in MODES:
        k = f"{mode}_wer"
        if not all(k in blk[m] for _, blk in seeds for m in models):
            continue
        row = {}
        if aux:
            row[f"{base}_worst_wer"] = tally(
                [s for s, blk in seeds
                 if blk[base][k] > max(blk[m][k] for m in aux)],
                [s for s, blk in seeds
                 if blk[base][k] == max(blk[m][k] for m in aux)],
            )
        for i, a in enumerate(aux):
            for b in aux[i + 1:]:
                row[f"{b}_beats_{a}_wer"] = tally(
                    [s for s, blk in seeds if blk[b][k] < blk[a][k]],
                    [s for s, blk in seeds if blk[b][k] == blk[a][k]],
                )
        consistency[mode] = row
    gains = {
        f"{arm}_minus_{base}": {
            f"{mode}_wer": _mean_std(
                [blk[arm][f"{mode}_wer"] - blk[base][f"{mode}_wer"]
                 for _, blk in seeds]
            )
            for mode in MODES
            if all(f"{mode}_wer" in blk[m] for _, blk in seeds
                   for m in (arm, base))
        }
        for arm in aux
    }
    out = {
        "n_seeds": len(seeds),
        "seeds": [s for s, _ in seeds],
        "base": base,
        "pooled": pooled,
        "ordering_consistency": consistency,
        f"paired_gain_vs_{base}": gains,
    }
    if dropped:
        out["dropped_models"] = dropped
    return out


def summarize_head_to_head(gain: dict, budget: str = "labeled_64") -> dict:
    seeds = head_to_head_seed_blocks(gain, budget)
    out = pool_seed_blocks(seeds, base="m1" if seeds else None)
    out["budget"] = budget
    return out


def _seed_id(key: str):
    """Fine-tune seed id from a per_seed key like 'scratch_s0' / 's2'."""
    m = re.search(r"(?:^|_)s(\d+)$", key)
    return int(m.group(1)) if m else None


def summarize_ab(ab: dict) -> dict:
    arms = ab.get("arms", {})
    pooled = {}
    per_seed_wer = {}  # arm -> {seed_id: wer}
    skipped = []
    for arm, rec in arms.items():
        if not rec.get("per_seed"):
            skipped.append(arm)  # recorded-then-pruned arm: visible, not fatal
            continue
        wers = {}
        skipped_keys = []
        for key, v in rec["per_seed"].items():
            sid = _seed_id(key)
            if sid is None:
                # unparsable key: pool its WER but keep it OUT of the
                # by-seed alignment under its raw key — a positional id
                # could collide with a parsed seed id and silently
                # overwrite that seed's WER in the pooled mean
                skipped_keys.append(key)
                sid = f"unaligned:{key}"
            wers[sid] = v["greedy_wer"]
        pooled[arm] = {"greedy_wer": _mean_std(list(wers.values()))}
        if skipped_keys:
            pooled[arm]["unaligned_keys"] = skipped_keys
        per_seed_wer[arm] = {k: w for k, w in wers.items()
                             if isinstance(k, int)}
    ranking = sorted(pooled, key=lambda a: pooled[a]["greedy_wer"]["mean"])
    # per-seed best arm, matched BY SEED ID across arms (dict/key order is
    # not alignment) over the ids every arm ran
    common = (sorted(set.intersection(*(set(v) for v in per_seed_wer.values())))
              if per_seed_wer else [])
    best_by_seed = [
        min(per_seed_wer, key=lambda a: per_seed_wer[a][i]) for i in common
    ]
    out = {
        "pooled": pooled,
        "arm_ranking_by_mean_wer": ranking,
        "best_arm_by_seed": best_by_seed,
        "aligned_seed_ids": common,
    }
    if skipped:
        out["skipped_empty_arms"] = skipped
    return out


def conclusions(h2h: dict, ab: dict) -> list:
    out = []
    if h2h.get("n_seeds", 0) >= 2:
        g = h2h["ordering_consistency"]["greedy"]
        n = h2h["n_seeds"]
        base = h2h.get("base", "m1")
        margin_keys = [k for k in g if k.endswith("_wer")
                       and k != f"{base}_worst_wer"]
        n_gain = len(g[f"{base}_worst_wer"]["seeds"])

        def qual(k):  # data-driven wording — never overstate
            if k == n:
                return "seed-robust"
            if k > n / 2:
                return "majority-of-seeds"
            return "seed-dependent"

        msg = (f"Semi-supervised GAIN ({base} strictly worst greedy WER): "
               f"{g[f'{base}_worst_wer']['count']} seeds ({qual(n_gain)})")
        for mk in margin_keys:  # every aux pair, none silently dropped
            b, a = mk[:-len("_wer")].split("_beats_")
            n_m = len(g[mk]["seeds"])
            msg += (f"; {b.upper()}-best MARGIN ({b} < {a} greedy WER): "
                    f"{g[mk]['count']} seeds ({qual(n_m)})")
        out.append(msg + " at this synthetic scale.")
    rank = ab.get("arm_ranking_by_mean_wer", [])
    if rank:
        msg = ("Controlled A/B mean-WER ranking (best first): "
               + " < ".join(rank))
        # data-driven wording — the thesis-ordering claim is only true when
        # the data shows it: a damped TAE->SAE arm must actually lead
        if rank[0].startswith("post_SAE_damped"):
            msg += (" — the damped TAE->SAE chain leads, reproducing the "
                    "thesis' M5-best ordering (Table 6.12) once the "
                    "saturation guardrail is on.")
        elif rank[0] == "post_TAE":
            msg += (" — the TAE-only chain leads; the thesis' M5-best "
                    "(TAE->SAE) ordering does NOT reproduce on this data.")
        elif rank[0] == "scratch":
            msg += (" — the supervised-only baseline leads; no aux arm "
                    "helps on this data.")
        out.append(msg)
    return out


def build_summary(gain: dict, ab: dict, ab64: dict | None = None) -> dict:
    h2h = summarize_head_to_head(gain)
    abs_ = summarize_ab(ab)
    out = {
        "what": (
            "Pooled per-seed statistics over the recorded gain artifacts "
            "(docs/GAIN_M1_VS_M5.json head-to-head runs, docs/GAIN_AB.json "
            "controlled fine-tune-init A/B, and docs/GAIN_AB_64.json — the "
            "same A/B at the 64-labeled mid-error regime — when present). "
            "Regenerate with benchmarks/gain_stats.py after adding seed runs."
        ),
        "head_to_head": h2h,
        "controlled_ab": abs_,
        "conclusions": conclusions(h2h, abs_),
    }
    if ab64:
        s64 = summarize_ab(ab64)
        out["controlled_ab_64"] = s64
        rank = s64.get("arm_ranking_by_mean_wer", [])
        if rank:
            out["conclusions"].append(
                "Controlled A/B at the 64-labeled mid-error regime, "
                "mean-WER ranking (best first): " + " < ".join(rank) + "."
            )
    return out


#: the thesis' ADV claim (Tables 6.6-6.10: M3 is the worst model; §6.5:
#: adversarial training does not help) tested as paired arms — each pair
#: differs ONLY by an ADV stage in the seed chain
ADV_PAIRS = (("m3", "m2"), ("m4", "m5"), ("m6", "m5"))


def summarize_menu(seeds, base: str = "m1") -> dict:
    """Pool full model-menu per-seed compare blocks (m1..m6) and judge the
    thesis' two menu-level claims on them:

    (a) semi-supervised GAIN — some ADV-free aux arm (m2/m5) beats the
        supervised baseline (the thesis' central claim; note ``base
        strictly worst`` is NOT the thesis prediction once ADV arms are in
        the menu — Tables 6.6-6.10 have M3 *below* M1);
    (b) ADV HURTS — each (with-ADV, without-ADV) pair that differs only by
        an ADV stage orders with-ADV worse (M3 is the thesis' worst model).
    Per-seed counts, exact ties excluded from both directions.
    """
    out = pool_seed_blocks(seeds, base=base)
    models = set(out.get("pooled", {}))
    n = out.get("n_seeds", 0)

    def best_wer(blk, m):
        return min(blk[m][f"{mode}_wer"] for mode in MODES
                   if f"{mode}_wer" in blk[m])

    concl = []
    free = [m for m in ("m2", "m5") if m in models]
    if free and base in models:
        hits = [s for s, blk in seeds
                if min(best_wer(blk, m) for m in free)
                < best_wer(blk, base)]
        out["gain_adv_free"] = {
            "what": f"best({'/'.join(free)}) best-mode WER < {base}'s",
            "arms": free,
            "seeds": hits, "count": f"{len(hits)}/{n}",
        }
    adv = {}
    for w, wo in ADV_PAIRS:
        if w in models and wo in models:
            worse = [s for s, blk in seeds
                     if best_wer(blk, w) > best_wer(blk, wo)]
            ties = [s for s, blk in seeds
                    if best_wer(blk, w) == best_wer(blk, wo)]
            adv[f"{w}_worse_than_{wo}"] = {
                "seeds": worse, "count": f"{len(worse)}/{n}",
                **({"ties": ties} if ties else {}),
            }
    if adv:
        out["adv_effect"] = adv
    if base in models and len(models) > 1 and n:
        hits_sw = [s for s, blk in seeds
                   if best_wer(blk, base)
                   > max(best_wer(blk, m) for m in models if m != base)]
        out["base_strictly_worst"] = {
            "what": f"{base} best-mode WER > every other arm's",
            "seeds": hits_sw, "count": f"{len(hits_sw)}/{n}",
        }
    out["conclusions"] = concl + _menu_conclusions(out)
    return out


def _menu_conclusions(out: dict) -> list:
    """Conclusion strings derived purely from the structured tally fields —
    shared by summarize_menu and merge_menu_summaries so merged artifacts
    re-state their claims from the merged counts, never stale prose."""
    concl = []
    n = out.get("n_seeds", 0)
    gaf = out.get("gain_adv_free")
    if gaf:
        base = out.get("base", "m1")
        arms = "/".join(gaf.get("arms", ["m2", "m5"]))
        concl.append(
            f"semi-supervised gain (ADV-free arms {arms} vs "
            f"{base}, best decode mode): {gaf['count']} seeds")
    adv = out.get("adv_effect")
    if adv:
        total = sum(int(v["count"].split("/")[0]) for v in adv.values())
        cells = len(adv) * n
        direction = ("reproduces the thesis' ADV-hurts finding"
                     if total > cells / 2 else
                     "does NOT reproduce the thesis' ADV-hurts finding")
        concl.append(
            f"ADV-in-chain arms worse than their ADV-free counterparts in "
            f"{total}/{cells} (pair,seed) cells — {direction} "
            "(Tables 6.6-6.10: M3 worst)")
    sw = out.get("base_strictly_worst")
    if sw:
        base = out.get("base", "m1")
        concl.append(
            f"{base} strictly-worst (the tone-corpus framing): {sw['count']} "
            "seeds — expected to fail when ADV arms underperform the "
            "baseline, as the thesis itself records")
    # the thesis' M5-best margin (Table 6.12), stated from the data — the
    # round-3 advisor contract: never emit an ordering claim the counts
    # don't carry
    t = out.get("ordering_consistency", {}).get("greedy", {}).get(
        "m5_beats_m2_wer")
    if t:
        hits, total = (int(x) for x in t["count"].split("/"))
        n_ties = len(t.get("ties", []))
        decided = total - n_ties  # ties carry no direction either way
        if decided == 0 or hits * 2 == decided:
            verdict = "a coin flip — the M5-vs-M2 margin carries no signal"
        elif hits * 2 > decided:
            verdict = "the thesis' M5-best margin reproduces"
        else:
            verdict = ("m2 (TAE-only) leads at this regime — the thesis' "
                       "M5-best margin does not reproduce here (its own "
                       "low-resource margins are small, Tables 6.6-6.10)")
        tie_note = f" ({n_ties} tie{'s' * (n_ties != 1)})" if n_ties else ""
        p = t.get("sign_test_p")
        p_note = f", sign test p={p}" if p is not None else ""
        concl.append(
            f"m5-vs-m2 (greedy WER): m5 better in {t['count']} seeds"
            f"{tie_note}{p_note} — " + verdict)
    return concl


def _merge_moments(x: dict, y: dict) -> dict:
    """Exact pool of two {mean, std, n} summaries via sufficient statistics
    (population std, matching _mean_std). Rounding of the inputs to 4
    decimals bounds the merged error at ~1e-4 — below every claim margin."""
    if not x or not x.get("n"):
        return dict(y)
    if not y or not y.get("n"):
        return dict(x)
    na, nb = x["n"], y["n"]
    n = na + nb
    s = x["mean"] * na + y["mean"] * nb
    ss = ((x["std"] ** 2 + x["mean"] ** 2) * na
          + (y["std"] ** 2 + y["mean"] ** 2) * nb)
    m = s / n
    var = max(ss / n - m * m, 0.0)
    return {"mean": round(m, 4), "std": round(math.sqrt(var), 4), "n": n}


def _merge_tally(x: dict, y: dict, n_total: int) -> dict:
    """Union of two per-seed hit tallies ({seeds, count[, ties]});
    the sign-test p is recomputed from the merged counts."""
    seeds = list(x.get("seeds", [])) + list(y.get("seeds", []))
    hits = (int(x["count"].split("/")[0]) + int(y["count"].split("/")[0]))
    row = {"seeds": seeds, "count": f"{hits}/{n_total}"}
    ties = list(x.get("ties", [])) + list(y.get("ties", []))
    if ties:
        row["ties"] = ties
    p = _sign_test_p(hits, n_total - len(ties))
    if p is not None:
        row["sign_test_p"] = p
    return row


def _relabel_seeds(obj, mapping: dict):
    """Recursively rewrite seed labels inside ``seeds``/``ties`` lists (and
    the top-level ``seeds`` list) of a summarize_menu output."""
    if isinstance(obj, dict):
        out = {}
        for k, v in obj.items():
            if k in ("seeds", "ties") and isinstance(v, list):
                out[k] = [mapping.get(s, s) for s in v]
            else:
                out[k] = _relabel_seeds(v, mapping)
        return out
    if isinstance(obj, list):
        return [_relabel_seeds(v, mapping) for v in obj]
    return obj


def merge_menu_summaries(a: dict, b: dict) -> dict:
    """Pool two summarize_menu outputs into one as if every underlying seed
    had been pooled together: moment-merge the {mean,std,n} cells, union the
    per-seed tallies, and regenerate the conclusion strings from the merged
    counts. Exists because per-seed raw compare files live in the
    (gitignored) campaign dir — once only the pooled artifact survives, new
    seeds merge through this instead of being unpoolable. ``b``'s seed
    labels are renumbered to follow ``a``'s (seed0.. collisions)."""
    if a.get("base") != b.get("base"):
        raise ValueError(f"base mismatch: {a.get('base')} vs {b.get('base')}")
    base = a["base"]
    na, nb = a["n_seeds"], b["n_seeds"]
    n = na + nb
    mapping = {s: f"seed{na + i}" for i, s in enumerate(b["seeds"])}
    overlap = set(mapping.values()) & set(a["seeds"])
    if overlap:
        # a's labels need not be contiguous seed0..seed{na-1} (partial
        # sweeps, suffix-labeled blocks) — a collision would silently
        # conflate per-seed hit lists in the merged tallies
        raise ValueError(
            f"renumbered seed labels {sorted(overlap)} collide with the "
            f"first artifact's labels {a['seeds']}; relabel one side first")
    b = _relabel_seeds(b, mapping)

    models = [m for m in a["pooled"] if m in b["pooled"]]
    dropped = sorted((set(a["pooled"]) | set(b["pooled"])) - set(models))
    out = {
        "n_seeds": n,
        "seeds": list(a["seeds"]) + list(b["seeds"]),
        "base": base,
        "pooled": {
            m: {
                k: _merge_moments(a["pooled"][m][k], b["pooled"][m][k])
                for k in a["pooled"][m] if k in b["pooled"][m]
            }
            for m in models
        },
    }
    if dropped:
        out["dropped_models"] = dropped
    oc = {}
    for mode in MODES:
        ra, rb = (x.get("ordering_consistency", {}).get(mode) for x in (a, b))
        if ra and rb:
            oc[mode] = {k: _merge_tally(ra[k], rb[k], n)
                        for k in ra if k in rb}
    if oc:
        out["ordering_consistency"] = oc
    gk = f"paired_gain_vs_{base}"
    if gk in a and gk in b:
        out[gk] = {
            arm: {k: _merge_moments(a[gk][arm][k], b[gk][arm][k])
                  for k in a[gk][arm] if k in b[gk][arm]}
            for arm in a[gk] if arm in b[gk]
        }
    if "gain_adv_free" in a and "gain_adv_free" in b:
        arms_a = a["gain_adv_free"].get("arms")
        arms_b = b["gain_adv_free"].get("arms")
        if arms_a is not None and arms_b is not None and arms_a != arms_b:
            # differently-defined hits must not pool under one description
            raise ValueError(
                f"gain_adv_free arm sets differ: {arms_a} vs {arms_b}")
        out["gain_adv_free"] = {
            "what": a["gain_adv_free"]["what"],
            "arms": arms_a if arms_a is not None else (arms_b or ["m2", "m5"]),
            **_merge_tally(a["gain_adv_free"], b["gain_adv_free"], n),
        }
    if "adv_effect" in a and "adv_effect" in b:
        out["adv_effect"] = {
            k: _merge_tally(a["adv_effect"][k], b["adv_effect"][k], n)
            for k in a["adv_effect"] if k in b["adv_effect"]
        }
    sw_a, sw_b = a.get("base_strictly_worst"), b.get("base_strictly_worst")
    if sw_a is None:
        # pre-merge artifacts only recorded this count in prose — recover it
        for line in a.get("conclusions", []):
            mobj = re.search(r"strictly-worst.*?:\s*(\d+)/(\d+)\s+seeds", line)
            if mobj:
                sw_a = {"seeds": [], "count": f"{mobj.group(1)}/{na}",
                        "seeds_unrecorded": True}
                break
    if sw_a and sw_b:
        merged_sw = _merge_tally(sw_a, sw_b, n)
        merged_sw["what"] = sw_b.get(
            "what", f"{base} best-mode WER > every other arm's")
        if sw_a.get("seeds_unrecorded"):
            merged_sw["note"] = (
                "hit-seed labels from the pre-merge artifact were not "
                "recorded; its count is folded in exactly")
        out["base_strictly_worst"] = merged_sw
    out["conclusions"] = _menu_conclusions(out)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--gain", default=os.path.join(REPO, "docs", "GAIN_M1_VS_M5.json"))
    ap.add_argument("--ab", default=os.path.join(REPO, "docs", "GAIN_AB.json"))
    ap.add_argument("--ab64", default=os.path.join(REPO, "docs", "GAIN_AB_64.json"))
    ap.add_argument("--out", default=os.path.join(REPO, "docs", "GAIN_SUMMARY.json"))
    ap.add_argument("--compare-files", default=None,
                    help="comma-separated per-seed compare JSONs (e.g. the "
                         "hard-corpus sweep's seed*.json); pools the full "
                         "model menu into --out instead of the legacy "
                         "summary (seed label = file order: seed0,seed1,...)")
    ap.add_argument("--merge", default=None, metavar="A.json,B.json",
                    help="merge two summarize_menu artifacts (e.g. the "
                         "recorded GAIN_HARD.json + a new-seed pooling) "
                         "into --out; B's seed labels are renumbered after "
                         "A's and every count/moment is pooled exactly")
    args = ap.parse_args(argv)
    if args.merge:
        pa, pb = args.merge.split(",")
        with open(pa) as f:
            a = json.load(f)
        with open(pb) as f:
            b = json.load(f)
        merged = merge_menu_summaries(a, b)
        summary = {
            "what": a.get("what", "Pooled full-model-menu per-seed "
                                  "statistics (merged)."),
            "source_files": (a.get("source_files", [pa])
                             + b.get("source_files", [pb])),
            "merged_from": [pa, pb],
            **merged,
        }
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
        json.dump(summary["conclusions"], sys.stdout, indent=1)
        print()
        print(f"written to {args.out}", file=sys.stderr)
        return
    if args.compare_files:
        seeds = []
        for i, path in enumerate(args.compare_files.split(",")):
            with open(path) as f:
                seeds.append((f"seed{i}", json.load(f)))
        summary = {
            "what": ("Pooled full-model-menu (thesis Table 6.5) per-seed "
                     "statistics; sources listed in source_files."),
            "source_files": args.compare_files.split(","),
            **summarize_menu(seeds),
        }
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
        json.dump(summary["conclusions"], sys.stdout, indent=1)
        print()
        print(f"written to {args.out}", file=sys.stderr)
        return
    with open(args.gain) as f:
        gain = json.load(f)
    with open(args.ab) as f:
        ab = json.load(f)
    ab64 = None
    if os.path.exists(args.ab64):
        with open(args.ab64) as f:
            ab64 = json.load(f)
    summary = build_summary(gain, ab, ab64)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    json.dump(summary["conclusions"], sys.stdout, indent=1)
    print()
    print(f"written to {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
