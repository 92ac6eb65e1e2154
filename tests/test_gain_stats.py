"""Unit tests for the gain-artifact statistics aggregator
(benchmarks/gain_stats.py): pooled means, ordering-consistency counts, and
seed-block discovery over synthetic artifacts shaped like
docs/GAIN_M1_VS_M5.json / docs/GAIN_AB.json."""

import json
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from benchmarks.gain_stats import (  # noqa: E402
    build_summary,
    head_to_head_seed_blocks,
    summarize_ab,
    summarize_head_to_head,
)


def _block(m1, m2, m5):
    """Head-to-head seed block with the given greedy WERs (other metrics
    derived deterministically so pooling is checkable)."""
    out = {}
    for name, wer in (("m1", m1), ("m2", m2), ("m5", m5)):
        out[name] = {}
        for mode in ("greedy", "beam8", "beam8_lm"):
            out[name][f"{mode}_wer"] = wer
            out[name][f"{mode}_acc"] = 1.0 - wer
            out[name][f"{mode}_cer"] = wer / 2
    return out


def _gain_doc():
    return {
        "round3d_rerun": {
            "note": "x",
            # seed 0: full thesis ordering m1 > m2 > m5
            "labeled_64": _block(0.5, 0.44, 0.42),
            # seed 1: gain holds, margin flips
            "labeled_64_seed1": _block(0.6, 0.50, 0.53),
            # an unrelated budget block must NOT be pooled
            "labeled_128": _block(0.05, 0.09, 0.07),
        }
    }


def _ab_doc():
    return {
        "arms": {
            "scratch": {"per_seed": {f"s{i}": {"greedy_wer": w}
                                     for i, w in enumerate([0.10, 0.15, 0.05])}},
            "post_TAE": {"per_seed": {f"s{i}": {"greedy_wer": w}
                                      for i, w in enumerate([0.07, 0.10, 0.07])}},
            "post_SAE_damped_0.1": {"per_seed": {f"s{i}": {"greedy_wer": w}
                                                 for i, w in enumerate([0.06, 0.08, 0.07])}},
        }
    }


def test_seed_block_discovery_orders_and_filters():
    blocks = head_to_head_seed_blocks(_gain_doc(), "labeled_64")
    assert [s for s, _ in blocks] == ["seed0", "seed1"]
    # labeled_128 is a different budget, not a seed of labeled_64
    assert all(b["m1"]["greedy_wer"] >= 0.5 for _, b in blocks)


def test_head_to_head_pooling_and_consistency():
    h = summarize_head_to_head(_gain_doc())
    assert h["n_seeds"] == 2
    m1 = h["pooled"]["m1"]["greedy_wer"]
    assert math.isclose(m1["mean"], 0.55, abs_tol=1e-9)
    assert math.isclose(m1["std"], 0.05, abs_tol=1e-9)
    cons = h["ordering_consistency"]["greedy"]
    assert cons["m1_worst_wer"]["count"] == "2/2"
    assert cons["m5_beats_m2_wer"]["count"] == "1/2"
    assert cons["m5_beats_m2_wer"]["seeds"] == ["seed0"]
    # paired gains are negative (aux arms beat the baseline) in the mean
    assert h["paired_gain_vs_m1"]["m2_minus_m1"]["greedy_wer"]["mean"] < 0
    assert h["paired_gain_vs_m1"]["m5_minus_m1"]["greedy_wer"]["mean"] < 0


def test_ab_ranking_and_per_seed_best():
    a = summarize_ab(_ab_doc())
    assert a["arm_ranking_by_mean_wer"][0] == "post_SAE_damped_0.1"
    assert a["arm_ranking_by_mean_wer"][-1] == "scratch"
    # seed 0: damped 0.06 best; seed 1: damped 0.08 best; seed 2: scratch 0.05
    assert a["best_arm_by_seed"] == [
        "post_SAE_damped_0.1", "post_SAE_damped_0.1", "scratch"
    ]


def test_build_summary_on_real_artifacts():
    """The shipped artifacts parse and pool without error, and the summary
    states both conclusions."""
    repo = os.path.join(os.path.dirname(__file__), "..")
    with open(os.path.join(repo, "docs", "GAIN_M1_VS_M5.json")) as f:
        gain = json.load(f)
    with open(os.path.join(repo, "docs", "GAIN_AB.json")) as f:
        ab = json.load(f)
    s = build_summary(gain, ab)
    assert s["head_to_head"]["n_seeds"] >= 2
    # derived gain_* diff blocks must not be pooled as model arms
    assert sorted(s["head_to_head"]["pooled"]) == ["m1", "m2", "m5"]
    assert sorted(s["head_to_head"]["ordering_consistency"]["greedy"]) == [
        "m1_worst_wer", "m5_beats_m2_wer"]
    assert s["controlled_ab"]["arm_ranking_by_mean_wer"][0] == "post_SAE_damped_0.1"
    assert len(s["conclusions"]) == 2


def test_build_summary_with_ab64():
    """An optional 64-labeled A/B artifact adds a pooled section and a
    conclusion line; absence changes nothing."""
    gain, ab = _gain_doc(), _ab_doc()
    ab64 = {"arms": {
        "scratch": {"per_seed": {"s0": {"greedy_wer": 0.5}}},
        "postSAEdamped": {"per_seed": {"s0": {"greedy_wer": 0.4}}},
    }}
    s = build_summary(gain, ab, ab64)
    assert s["controlled_ab_64"]["arm_ranking_by_mean_wer"] == [
        "postSAEdamped", "scratch"]
    assert len(s["conclusions"]) == 3
    assert "64-labeled" in s["conclusions"][-1]
    assert "controlled_ab_64" not in build_summary(gain, ab, None)


def test_pool_intersects_partial_menus_and_records_drops():
    """A seed block recorded with a smaller model menu pools over the
    intersection; the dropped arm is visible, not silent."""
    from benchmarks.gain_stats import pool_seed_blocks

    full = _block(0.5, 0.44, 0.42)
    partial = {k: v for k, v in _block(0.6, 0.5, 0.53).items() if k != "m2"}
    p = pool_seed_blocks([("seed0", full), ("seed1", partial)], base="m1")
    assert sorted(p["pooled"]) == ["m1", "m5"]
    assert p["dropped_models"] == ["m2"]
    # and a base missing from some block is an error, not a KeyError deep in
    import pytest
    no_base = {k: v for k, v in full.items() if k != "m1"}
    with pytest.raises(ValueError):
        pool_seed_blocks([("seed0", full), ("seed1", no_base)], base="m1")


def test_ties_count_for_neither_claim():
    from benchmarks.gain_stats import pool_seed_blocks

    tied = _block(0.5, 0.5, 0.5)  # three-way tie
    p = pool_seed_blocks([("seed0", tied)], base="m1")
    g = p["ordering_consistency"]["greedy"]
    assert g["m1_worst_wer"]["count"] == "0/1"
    assert g["m1_worst_wer"]["ties"] == ["seed0"]
    assert g["m5_beats_m2_wer"]["count"] == "0/1"
    assert g["m5_beats_m2_wer"]["ties"] == ["seed0"]


def test_duplicate_seed0_blocks_raise():
    import pytest

    doc = _gain_doc()
    doc["round3d_rerun"]["labeled_64_seed0"] = _block(0.1, 0.2, 0.3)
    with pytest.raises(ValueError, match="duplicate seed labels"):
        head_to_head_seed_blocks(doc, "labeled_64")


def test_ab_aligns_by_seed_id_not_key_order():
    """Arms whose per_seed dicts are serialized in different orders (or with
    different key prefixes) still pair the SAME fine-tune seed."""
    ab = {"arms": {
        "A": {"per_seed": {"A_s0": {"greedy_wer": 0.1},
                           "A_s1": {"greedy_wer": 0.9}}},
        # B serialized s1-first: positional pairing would swap the winners
        "B": {"per_seed": {"B_s1": {"greedy_wer": 0.05},
                           "B_s0": {"greedy_wer": 0.95}}},
    }}
    a = summarize_ab(ab)
    assert a["aligned_seed_ids"] == [0, 1]
    assert a["best_arm_by_seed"] == ["A", "B"]


def test_ab_unparsable_key_cannot_collide_with_seed_id():
    """A per_seed key without a seed suffix pools into the mean but stays
    OUT of the by-seed alignment — a positional fallback id could collide
    with a parsed seed id and silently overwrite that seed's WER."""
    ab = {"arms": {
        "A": {"per_seed": {"odd": {"greedy_wer": 0.5},
                           "s0": {"greedy_wer": 0.1}}},
        "B": {"per_seed": {"s0": {"greedy_wer": 0.2}}},
    }}
    a = summarize_ab(ab)
    # both WERs pool (n=2 mean 0.3), but only s0 aligns
    assert a["pooled"]["A"]["greedy_wer"]["n"] == 2
    assert abs(a["pooled"]["A"]["greedy_wer"]["mean"] - 0.3) < 1e-9
    assert a["pooled"]["A"]["unaligned_keys"] == ["odd"]
    assert a["aligned_seed_ids"] == [0]
    assert a["best_arm_by_seed"] == ["A"]  # 0.1 < 0.2 at seed 0, not 0.5


def test_conclusions_thesis_ordering_claim_is_gated_on_data():
    """The 'reproduces the thesis M5-best ordering' sentence must only be
    emitted when a damped TAE->SAE arm actually ranks first."""
    from benchmarks.gain_stats import conclusions, summarize_ab

    # damped arm leads (the _ab_doc fixture) -> claim present
    lead = conclusions({}, summarize_ab(_ab_doc()))
    assert any("M5-best ordering" in c and "NOT" not in c for c in lead)

    # scratch leads -> the claim must flip, not repeat
    flipped = {"arms": {
        "scratch": {"per_seed": {"s0": {"greedy_wer": 0.05}}},
        "post_SAE_damped_0.1": {"per_seed": {"s0": {"greedy_wer": 0.5}}},
    }}
    out = conclusions({}, summarize_ab(flipped))
    assert len(out) == 1
    assert "supervised-only baseline leads" in out[0]
    assert "reproducing the thesis" not in out[0]

    # TAE-only leads -> explicit non-reproduction wording
    tae = {"arms": {
        "post_TAE": {"per_seed": {"s0": {"greedy_wer": 0.05}}},
        "post_SAE_damped_0.1": {"per_seed": {"s0": {"greedy_wer": 0.5}}},
    }}
    out = conclusions({}, summarize_ab(tae))
    assert "does NOT reproduce" in out[0]


def test_ab_skips_empty_arm():
    ab = _ab_doc()
    ab["arms"]["pruned"] = {"per_seed": {}}
    a = summarize_ab(ab)
    assert a["skipped_empty_arms"] == ["pruned"]
    assert "pruned" not in a["pooled"]


def test_summarize_menu_adv_effect_and_gain():
    from benchmarks.gain_stats import summarize_menu

    def arm(w):
        return {"greedy_wer": w, "beam8_wer": w, "beam8_lm_wer": w,
                "greedy_acc": 1 - w, "greedy_cer": w,
                "beam8_acc": 1 - w, "beam8_cer": w,
                "beam8_lm_acc": 1 - w, "beam8_lm_cer": w}

    # thesis-shaped draw: m2/m5 beat m1; every ADV arm worse than its
    # ADV-free counterpart
    blk = {"m1": arm(0.5), "m2": arm(0.4), "m3": arm(0.6),
           "m4": arm(0.65), "m5": arm(0.42), "m6": arm(0.55)}
    out = summarize_menu([("seed0", blk), ("seed1", blk)])
    assert out["gain_adv_free"]["count"] == "2/2"
    assert out["adv_effect"]["m3_worse_than_m2"]["count"] == "2/2"
    assert out["adv_effect"]["m4_worse_than_m5"]["count"] == "2/2"
    assert out["adv_effect"]["m6_worse_than_m5"]["count"] == "2/2"
    assert any("reproduces the thesis' ADV-hurts" in c
               for c in out["conclusions"])

    # anti-thesis draw: ADV helps everywhere -> wording must flip
    blk2 = {"m1": arm(0.5), "m2": arm(0.4), "m3": arm(0.3),
            "m4": arm(0.3), "m5": arm(0.42), "m6": arm(0.3)}
    out2 = summarize_menu([("seed0", blk2)])
    assert any("does NOT reproduce" in c for c in out2["conclusions"])

    # exact ties count for neither direction but are recorded
    blk3 = {"m1": arm(0.5), "m2": arm(0.4), "m3": arm(0.4), "m5": arm(0.42)}
    out3 = summarize_menu([("seed0", blk3)])
    eff = out3["adv_effect"]["m3_worse_than_m2"]
    assert eff["count"] == "0/1" and eff["ties"] == ["seed0"]


def test_merge_menu_summaries_equals_direct_pool():
    """Merging a 3-seed and a 2-seed summary must equal pooling all 5 raw
    seeds directly — moments to rounding error, tallies exactly."""
    import random

    from benchmarks.gain_stats import merge_menu_summaries, summarize_menu

    rng = random.Random(7)

    def arm(w):
        return {"greedy_wer": w, "beam8_wer": round(w * 0.95, 4),
                "beam8_lm_wer": round(w * 0.9, 4),
                "greedy_acc": 1 - w, "greedy_cer": w,
                "beam8_acc": 1 - w, "beam8_cer": w,
                "beam8_lm_acc": 1 - w, "beam8_lm_cer": w}

    def blk():
        return {m: arm(round(rng.uniform(0.3, 0.9), 4))
                for m in ("m1", "m2", "m3", "m4", "m5", "m6")}

    blocks = [(f"seed{i}", blk()) for i in range(5)]
    direct = summarize_menu(blocks)
    first = summarize_menu(blocks[:3])
    # the second pool arrives labeled seed0/seed1 (fresh --compare-files
    # file order), exactly the collision the merge renumbers
    second = summarize_menu([("seed0", blocks[3][1]),
                             ("seed1", blocks[4][1])])
    merged = merge_menu_summaries(first, second)

    assert merged["n_seeds"] == 5
    assert merged["seeds"] == [f"seed{i}" for i in range(5)]
    for m, cells in direct["pooled"].items():
        for k, v in cells.items():
            got = merged["pooled"][m][k]
            assert got["n"] == v["n"] == 5
            assert abs(got["mean"] - v["mean"]) < 2e-4, (m, k)
            assert abs(got["std"] - v["std"]) < 2e-3, (m, k)
    for mode, row in direct["ordering_consistency"].items():
        for k, v in row.items():
            got = merged["ordering_consistency"][mode][k]
            assert got["count"] == v["count"], (mode, k)
            assert sorted(got["seeds"]) == sorted(v["seeds"]), (mode, k)
    assert merged["gain_adv_free"]["count"] == direct["gain_adv_free"]["count"]
    for k, v in direct["adv_effect"].items():
        assert merged["adv_effect"][k]["count"] == v["count"], k
    assert (merged["base_strictly_worst"]["count"]
            == direct["base_strictly_worst"]["count"])
    assert merged["conclusions"] == direct["conclusions"]


def test_merge_recovers_strictly_worst_count_from_prose():
    """Pre-merge artifacts carried the strictly-worst count only in the
    conclusion string — the merge must fold it in from there."""
    from benchmarks.gain_stats import merge_menu_summaries, summarize_menu

    def arm(w):
        return {"greedy_wer": w, "beam8_wer": w, "beam8_lm_wer": w,
                "greedy_acc": 1 - w, "greedy_cer": w,
                "beam8_acc": 1 - w, "beam8_cer": w,
                "beam8_lm_acc": 1 - w, "beam8_lm_cer": w}

    blk = {"m1": arm(0.7), "m2": arm(0.4), "m5": arm(0.45)}
    old = summarize_menu([("seed0", blk), ("seed1", blk)])
    del old["base_strictly_worst"]  # the round-4a artifact's shape
    new = summarize_menu([("seed0", blk)])
    merged = merge_menu_summaries(old, new)
    sw = merged["base_strictly_worst"]
    assert sw["count"] == "3/3"
    assert sw.get("note")  # provenance of the unlabeled hits
    assert any("strictly-worst" in c and "3/3" in c
               for c in merged["conclusions"])


def test_menu_conclusions_m5_vs_m2_margin_is_data_driven():
    from benchmarks.gain_stats import summarize_menu

    def arm(w):
        return {"greedy_wer": w, "beam8_wer": w, "beam8_lm_wer": w,
                "greedy_acc": 1 - w, "greedy_cer": w,
                "beam8_acc": 1 - w, "beam8_cer": w,
                "beam8_lm_acc": 1 - w, "beam8_lm_cer": w}

    m5_wins = {"m1": arm(0.6), "m2": arm(0.5), "m5": arm(0.4)}
    m2_wins = {"m1": arm(0.6), "m2": arm(0.4), "m5": arm(0.5)}

    out = summarize_menu([("s0", m5_wins), ("s1", m5_wins)])
    assert any("M5-best margin reproduces" in c for c in out["conclusions"])

    out = summarize_menu([("s0", m2_wins), ("s1", m2_wins)])
    assert any("does not reproduce here" in c for c in out["conclusions"])

    out = summarize_menu([("s0", m5_wins), ("s1", m2_wins)])
    assert any("coin flip" in c for c in out["conclusions"])


def test_lm_probe_verdict_wording_is_data_driven():
    from benchmarks.lm_probe import _verdict

    def rows(vals):
        return [{"mean_acc_pct": v} for v in vals]

    d, v = _verdict(rows([10, 12, 14, 20]))
    assert v == "accuracy rises with tf_rate" and d == 10

    d, v = _verdict(rows([13.8, 24.2, 20.8, 26.2]))  # dip > slack, rises e2e
    assert "rises end-to-end" in v and d == 12.4

    d, v = _verdict(rows([20, 26, 19, 21]))  # non-monotone, flat
    assert "flat end-to-end" in v


def test_lm_probe_declining_sweep_is_not_a_rise():
    """Round-4 advisor (medium): a gently monotone-DECLINING sweep passed
    the step-wise rise check (2-pt slack per step) and was labeled rising."""
    from benchmarks.lm_probe import _verdict

    rows = [{"mean_acc_pct": v} for v in
            [30, 28.5, 27.2, 26.0, 24.9, 23.9, 23.0, 22.2, 21.5, 20.9, 20.4]]
    d, v = _verdict(rows)
    assert d < 0 and "rises" not in v


def test_sign_test_p_values_and_tally_plumbing():
    from benchmarks.gain_stats import (_sign_test_p, pool_seed_blocks,
                                       merge_menu_summaries, summarize_menu)

    assert _sign_test_p(0, 0) is None
    assert _sign_test_p(4, 8) == 1.0        # perfectly split
    assert _sign_test_p(8, 8) == 0.0078     # clean sweep, n=8
    assert _sign_test_p(0, 8) == 0.0078     # symmetric
    assert _sign_test_p(1, 4) == 0.625

    def arm(w):
        return {"greedy_wer": w, "greedy_acc": 1 - w, "greedy_cer": w,
                "beam8_wer": w, "beam8_acc": 1 - w, "beam8_cer": w,
                "beam8_lm_wer": w, "beam8_lm_acc": 1 - w, "beam8_lm_cer": w}

    m5w = {"m1": arm(0.6), "m2": arm(0.5), "m5": arm(0.4)}
    seeds = [(f"seed{i}", m5w) for i in range(4)]
    out = pool_seed_blocks(seeds, base="m1")
    t = out["ordering_consistency"]["greedy"]["m5_beats_m2_wer"]
    assert t["count"] == "4/4" and t["sign_test_p"] == 0.125

    # merged tallies recompute p from the union (4+4 clean -> p=0.0078)
    a = summarize_menu(seeds)
    b = summarize_menu([(f"seed{i}", m5w) for i in range(4, 8)])
    m = merge_menu_summaries(a, b)
    t = m["ordering_consistency"]["greedy"]["m5_beats_m2_wer"]
    assert t["count"] == "8/8" and t["sign_test_p"] == 0.0078
    assert any("p=0.0078" in c for c in m["conclusions"])


def test_merge_rejects_seed_label_collision_and_arm_mismatch():
    """Round-4 advisor (low x2): renumbered labels must not collide with
    a's, and differently-defined gain_adv_free arms must not pool."""
    import pytest

    from benchmarks.gain_stats import merge_menu_summaries, summarize_menu

    def arm(w):
        return {"greedy_wer": w, "greedy_acc": 1 - w, "greedy_cer": w,
                "beam8_wer": w, "beam8_acc": 1 - w, "beam8_cer": w,
                "beam8_lm_wer": w, "beam8_lm_acc": 1 - w, "beam8_lm_cer": w}

    blk = {"m1": arm(0.6), "m2": arm(0.5), "m5": arm(0.4)}
    a = summarize_menu([("seed0", blk), ("seed3", blk)])  # non-contiguous
    b = summarize_menu([("seed0", blk), ("seed1", blk)])
    with pytest.raises(ValueError, match="collide"):
        merge_menu_summaries(a, b)  # b renumbers to seed2, seed3 -> clash

    a2 = summarize_menu([("seed0", blk), ("seed1", blk)])
    b2 = summarize_menu([("seed0", {"m1": arm(0.6), "m2": arm(0.5)}),
                         ("seed1", {"m1": arm(0.6), "m2": arm(0.5)})])
    assert a2["gain_adv_free"]["arms"] != b2["gain_adv_free"]["arms"]
    with pytest.raises(ValueError, match="arm sets differ"):
        merge_menu_summaries(a2, b2)


def test_pseudolabel_pool_runs_seed_gated():
    """pool_runs: the fixed-percentile rule is the claim-bearer; the
    per-seed best arm is labeled selection-biased; counts/sign-p gate
    the wording (round-4 VERDICT weak #4)."""
    from benchmarks.pseudolabel_ab import pool_runs

    def arm(w):
        return {"greedy_wer": w, "beam8_wer": w + 0.02, "beam8_lm_wer": w}

    def run(seed, ctrl, pseudo_by_pct, oracle=0.2):
        # thresholds_resolved order is p90,p75,p50,p25
        th = [-0.6 - 0.1 * i for i in range(4)]
        return {
            "seed": seed,
            "control": arm(ctrl),
            "oracle": arm(oracle),
            "config": {"thresholds_resolved": th},
            "pseudo": {str(t): arm(w)
                       for t, w in zip(th, pseudo_by_pct)},
        }

    # 3 seeds, p25 wins everywhere, p90 loses everywhere
    runs = [run(s, 0.47, [0.50, 0.48, 0.46, 0.44]) for s in range(3)]
    out = pool_runs(runs)
    assert out["n_seeds"] == 3
    assert out["by_percentile"]["p25"]["beats_control"] == "3/3"
    assert out["by_percentile"]["p90"]["beats_control"] == "0/3"
    assert out["by_percentile"]["p25"]["sign_test_p"] == 0.25
    assert any("pseudo@p25: beats control in 3/3" in c
               for c in out["conclusions"])
    assert any("selection-biased" in c for c in out["conclusions"])

    # mixed: p25 wins 1/3 -> does NOT beat
    runs = [run(0, 0.47, [0.50, 0.48, 0.46, 0.44]),
            run(1, 0.43, [0.50, 0.48, 0.46, 0.44]),
            run(2, 0.43, [0.50, 0.48, 0.46, 0.45])]
    out = pool_runs(runs)
    assert any("does NOT beat" in c for c in out["conclusions"])


def test_sae_damping_summary_verdicts():
    from benchmarks.sae_damping_stats import summarize

    def blk(w):
        return {"greedy_wer": w, "beam8_wer": w, "beam8_lm_wer": w}

    # damping rescues: m5@0.1 < m2 < m5@1.0 in both seeds
    cells = {k: {"m2": blk(0.50), "m5@1.0": blk(0.55), "m5@0.1": blk(0.45)}
             for k in (4, 5)}
    out = summarize(cells)
    assert out["vs_m2"]["m5@0.1"]["beats_m2_greedy"] == "2/2"
    assert any("rescues the ordering" in c for c in out["conclusions"])

    # damping helps but does not flip
    cells = {k: {"m2": blk(0.50), "m5@1.0": blk(0.58), "m5@0.1": blk(0.53)}
             for k in (4, 5)}
    out = summarize(cells)
    assert any("does NOT flip" in c for c in out["conclusions"])

    # damping does not help
    cells = {k: {"m2": blk(0.50), "m5@1.0": blk(0.52), "m5@0.1": blk(0.56)}
             for k in (4, 5)}
    out = summarize(cells)
    assert any("damping does NOT help" in c for c in out["conclusions"])


def test_lm_fusion_pool_counts_and_verdict(tmp_path):
    from benchmarks.lm_fusion_stats import pool

    def seedfile(i, blocks):
        p = tmp_path / f"s{i}.json"
        p.write_text(json.dumps(blocks))
        return str(p)

    def arm(b8, b8lm):
        return {"greedy_wer": 0.6, "beam8_wer": b8, "beam8_lm_wer": b8lm}

    # fusion helps every cell -> significant at 6 cells (p=2/64*... )
    files = [seedfile(i, {"m1": arm(0.5, 0.45), "m2": arm(0.5, 0.44)})
             for i in range(3)]
    out = pool(files)
    assert out["overall"]["lm_helps"] == "6/6"
    assert out["overall"]["sign_test_p"] == 0.0312
    assert any("helps" in c and "NOT" not in c for c in out["conclusions"])

    # all ties -> no claim either way
    files = [seedfile(10 + i, {"m1": arm(0.5, 0.5)}) for i in range(3)]
    out = pool(files)
    assert out["overall"]["sign_test_p"] is None
    assert any("does NOT help" in c for c in out["conclusions"])
