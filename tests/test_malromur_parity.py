"""Málrómur-layout corpus path: CSV filtering + preprocess + harness pieces.

The full train->decode smoke is `python benchmarks/malromur_parity.py smoke`
(run standalone — minutes of XLA compiles); this covers the pieces that can
regress silently: the classification-column filter, the unreadable-wav skip,
and the thesis-target table lookup.
"""

import os

from benchmarks.malromur_parity import (
    THESIS_TARGETS,
    build_smoke_corpus,
)
from ss_asr_tpu.cli.preprocess import preprocess_malromur
from ss_asr_tpu.data.index import load_index


def test_malromur_csv_filter_and_preprocess(tmp_path):
    work = str(tmp_path)
    csv_path, wav_dir, n_expected = build_smoke_corpus(work, n=20)
    # 20 rows: every 5th is 'incorrect' (4), row 7 is correct but waveless
    assert n_expected == 20 - 4 - 1
    idx = preprocess_malromur(csv_path, wav_dir,
                              os.path.join(work, "processed"), sr=8000)
    df = load_index(idx)
    assert len(df) == n_expected
    # length-sorted, real frame counts, fbank files exist
    frames = list(df["unpadded_num_frames"])
    assert frames == sorted(frames)
    assert all(os.path.exists(p) for p in df["path_to_fbank"])
    # texts were normalized into the 50-char vocabulary (SOS/EOS wrapped)
    assert all(t.startswith("<") and t.endswith(">")
               for t in df["normalized_text"])


def test_thesis_targets_cover_all_conditions():
    for cond in ("full", "2.5", "5", "10"):
        assert cond in THESIS_TARGETS
    for cond in ("2.5", "5", "10"):
        t = THESIS_TARGETS[cond]["m5_test_acc"]
        assert set(t) == {"greedy", "beam8", "beam8_lm"}


def test_build_gain_corpus_layout(tmp_path):
    """The M1-vs-M5 gain corpus: large homophone vocabulary + abundant
    LM text over the SAME words (scarce-labels/abundant-text regime)."""
    from benchmarks.malromur_parity import build_gain_corpus
    from ss_asr_tpu.cli.mkdata import WORDS_LARGE

    csv_path, wav_dir, lm_corpus, n_correct = build_gain_corpus(
        str(tmp_path), n=15, seed=1)
    assert os.path.isdir(wav_dir) and os.path.exists(csv_path)
    assert n_correct == 15 - 3 - 1  # every 5th incorrect, row 7 waveless
    with open(lm_corpus, encoding="utf-8") as fh:
        lm_words = set(fh.read().split())
    # the LM corpus spans the full large inventory, incl. homophone spellings
    assert lm_words == set(WORDS_LARGE)


def test_compare_gain_math():
    """compare()'s gain table + thesis-claim boolean over stubbed runs."""
    from benchmarks import malromur_parity as mp

    fake = {
        "m1": {"greedy_acc": 0.5, "beam8_lm_wer": 0.4, "beam8_lm_acc": 0.6},
        "m5": {"greedy_acc": 0.7, "beam8_lm_wer": 0.3, "beam8_lm_acc": 0.7},
    }
    orig = mp.run
    mp.run = lambda *a, **k: dict(fake[k["model"]])
    try:
        out = mp.compare("i", "w", "work", None, None, 1, 1, 8)
    finally:
        mp.run = orig
    assert out["gain_m5_minus_m1"]["beam8_lm_wer"] == -0.1
    assert out["gain_m5_minus_m1"]["greedy_acc"] == 0.2
    assert out["semi_supervised_helps"] is True


def test_compare_helps_uses_best_operating_point():
    """A tie in one decode mode doesn't mask a win in another: the claim
    boolean compares each model's min WER over modes (the gain3 regime —
    m2 tied m1 on beam8_lm but won greedy and beam8)."""
    from benchmarks import malromur_parity as mp

    fake = {
        "m1": {"greedy_wer": 0.106, "beam8_wer": 0.087, "beam8_lm_wer": 0.087},
        "m2": {"greedy_wer": 0.077, "beam8_wer": 0.067, "beam8_lm_wer": 0.087},
    }
    orig = mp.run
    mp.run = lambda *a, **k: dict(fake[k["model"]])
    try:
        out = mp.compare("i", "w", "work", None, None, 1, 1, 8,
                         models=("m1", "m2"))
    finally:
        mp.run = orig
    assert out["semi_supervised_helps"] is True
    # and a seeded model that is worse everywhere reads False
    fake["m2"] = {k: v + 0.5 for k, v in fake["m1"].items()}
    mp.run = lambda *a, **k: dict(fake[k["model"]])
    try:
        out = mp.compare("i", "w", "work", None, None, 1, 1, 8,
                         models=("m1", "m2"))
    finally:
        mp.run = orig
    assert out["semi_supervised_helps"] is False


def test_make_config_m5_sections():
    """model=m5 plumbing: the unlabeled pool feeds TAE/SAE, the labeled
    subset feeds the fine-tune, and the seed chain is the thesis' M5
    (TAE -> SAE, Table 6.5). The full train->decode m5 path is
    `python benchmarks/malromur_parity.py smoke --model m5` (standalone)."""
    from benchmarks.malromur_parity import make_config

    paths = {"train_index": "sub.tsv", "eval_index": "eval.tsv",
             "lm_corpus": "lm.txt", "unlabeled_index": "full.tsv"}
    mdl = {"encoder_state_size": 256, "mlp_out_size": 128,
           "decoder_state_size": 256, "feature_dim": 40}
    cfg = make_config(paths, mdl, epochs=30, batch=32, lm_epochs=5,
                      lm_chunk=200, lm_batch=128, seed_epochs=3, seed_its=2)
    assert cfg["seed_train"] == {"super_its": 2, "stages": ["tae", "sae"]}
    for section in ("tae", "sae"):
        assert cfg[section]["train_index"] == "full.tsv"  # unlabeled pool
        assert cfg[section]["n_epochs"] == 3
    assert cfg["asr"]["train_index"] == "sub.tsv"  # labeled subset
    # thesis Table 5.3 conv stack at feature_dim 40
    assert cfg["sae"]["mdl"]["kernel_sizes"][0] == [1, 36]
    assert cfg["sae"]["mdl"]["num_filters"] == [32, 64, 256]
    # m1 config stays free of seed sections
    m1 = make_config({k: v for k, v in paths.items()
                      if k != "unlabeled_index"}, mdl, 30, 32, 5, 200, 128)
    assert "seed_train" not in m1 and "tae" not in m1


def test_model_menu_stage_configs():
    """MODEL_STAGES spans the thesis Table 6.5 menu and make_config emits
    exactly the sections each chain needs (ADV: Adadelta G/D + the TAE
    section its TextEncoder 'real' data requires)."""
    from benchmarks.malromur_parity import MODEL_STAGES, make_config

    assert MODEL_STAGES == {"m1": None, "m2": ["tae"],
                            "m3": ["tae", "adv"], "m4": ["tae", "adv", "sae"],
                            "m5": ["tae", "sae"], "m6": ["tae", "sae", "adv"]}
    paths = {"train_index": "sub.tsv", "eval_index": "eval.tsv",
             "lm_corpus": "lm.txt", "unlabeled_index": "full.tsv"}
    mdl = {"encoder_state_size": 256, "mlp_out_size": 128,
           "decoder_state_size": 256, "feature_dim": 40}
    for model, stages in MODEL_STAGES.items():
        if stages is None:
            continue
        cfg = make_config(paths, mdl, 30, 32, 5, 200, 128, stages=stages)
        assert cfg["seed_train"]["stages"] == stages
        assert "tae" in cfg  # every chain starts with TAE
        assert ("sae" in cfg) == ("sae" in stages)
        assert ("adv" in cfg) == ("adv" in stages)
        if "adv" in stages:
            assert cfg["adv"]["G_opt"]["type"] == "Adadelta"
            assert cfg["adv"]["train_index"] == "full.tsv"  # unlabeled pool
            assert cfg["adv"]["mdl"] == {"hidden_dim": 256}


def test_sae_ab_infer_mdl_roundtrip(tmp_path):
    """sae_poisoning_ab.infer_mdl recovers the exact ASRConfig sizes from a
    saved checkpoint's shapes."""
    import jax

    from benchmarks.sae_poisoning_ab import infer_mdl
    from ss_asr_tpu.models.las import ASRConfig, init_asr
    from ss_asr_tpu.utils.checkpoint import save_pytree

    mdl = {"encoder_state_size": 12, "mlp_out_size": 6,
           "decoder_state_size": 10, "feature_dim": 8}
    params = init_asr(jax.random.PRNGKey(0), ASRConfig.from_dict(mdl))
    p = str(tmp_path / "asr.npz")
    save_pytree(p, params)
    assert infer_mdl(p) == mdl


def test_compare_seeds_sweep(tmp_path, monkeypatch, capsys):
    """--seeds K0,K1 runs one full compare per seed in work/seed<k> subdirs
    (fresh corpus draw per seed) and pools per-seed ordering stats."""
    import json
    import sys

    from benchmarks import malromur_parity as mp

    wer = {  # seed 0: m5 wins; seed 1: m5 loses — consistency must read 1/2
        0: {"m1": 0.5, "m5": 0.4},
        1: {"m1": 0.6, "m5": 0.65},
    }
    calls = []

    def fake_run(index, wav_dir, work, *a, **k):
        calls.append((k["model"], k["seed"], work))
        w = wer[k["seed"]][k["model"]]
        return {f"{mode}_{met}": (w if met != "acc" else 1 - w)
                for mode in ("greedy", "beam8", "beam8_lm")
                for met in ("wer", "acc", "cer")}

    corpus_seeds = []

    def fake_corpus(work, n, seed=0, hard=False):
        corpus_seeds.append(seed)
        os.makedirs(work, exist_ok=True)
        return "idx", "wavs", "lm", None

    monkeypatch.setattr(mp, "run", fake_run)
    monkeypatch.setattr(mp, "build_gain_corpus", fake_corpus)
    monkeypatch.setattr(sys, "argv", [
        "malromur_parity.py", "compare", "--work", str(tmp_path),
        "--synthetic", "8", "--seeds", "0,1", "--models", "m1,m5"])
    mp.main()
    out = json.loads(capsys.readouterr().out)
    assert sorted(out["per_seed"]) == ["seed0", "seed1"]
    assert out["pooled"]["n_seeds"] == 2
    cons = out["pooled"]["ordering_consistency"]["greedy"]
    assert cons["m1_worst_wer"]["count"] == "1/2"
    assert corpus_seeds == [0, 1]
    # each seed ran in its own namespaced work dir
    works = {w for _, s, w in calls}
    assert {os.path.basename(w) for w in works} == {"seed0", "seed1"}


def test_compare_single_seed_backcompat(tmp_path, monkeypatch, capsys):
    """Without --seeds the compare output shape is unchanged (no per_seed
    wrapper) and the work dir is used directly."""
    import json
    import sys

    from benchmarks import malromur_parity as mp

    def fake_run(index, wav_dir, work, *a, **k):
        assert os.path.basename(work) != "seed0"
        return {"greedy_wer": 0.5 if k["model"] == "m1" else 0.4,
                "greedy_acc": 0.5, "greedy_cer": 0.2}

    monkeypatch.setattr(mp, "run", fake_run)
    monkeypatch.setattr(mp, "build_gain_corpus",
                        lambda work, n, seed=0, hard=False: ("idx", "wavs", "lm", None))
    monkeypatch.setattr(sys, "argv", [
        "malromur_parity.py", "compare", "--work", str(tmp_path),
        "--synthetic", "8", "--models", "m1,m5"])
    mp.main()
    out = json.loads(capsys.readouterr().out)
    assert "per_seed" not in out
    assert out["semi_supervised_helps"] is True


def test_compare_seeds_single_entry_keeps_wrapper(tmp_path, monkeypatch, capsys):
    """--seeds with ONE entry still produces the {per_seed, pooled} schema
    and the seed<k> subdir — scripts reading result['pooled'] never break."""
    import json
    import sys

    from benchmarks import malromur_parity as mp

    def fake_run(index, wav_dir, work, *a, **k):
        assert os.path.basename(work) == "seed3"
        return {"greedy_wer": 0.5 if k["model"] == "m1" else 0.4,
                "greedy_acc": 0.5, "greedy_cer": 0.2}

    monkeypatch.setattr(mp, "run", fake_run)
    monkeypatch.setattr(mp, "build_gain_corpus",
                        lambda work, n, seed=0, hard=False: ("idx", "wavs", "lm", None))
    monkeypatch.setattr(sys, "argv", [
        "malromur_parity.py", "compare", "--work", str(tmp_path),
        "--synthetic", "8", "--seeds", "3", "--models", "m1,m5"])
    mp.main()
    out = json.loads(capsys.readouterr().out)
    assert sorted(out["per_seed"]) == ["seed3"]
    assert out["pooled"]["n_seeds"] == 1


def test_sae_ab_shape_for_record():
    """Raw run_ab output reshapes into the GAIN_AB artifact layout and is
    poolable by gain_stats.summarize_ab."""
    from benchmarks.gain_stats import summarize_ab
    from benchmarks.sae_poisoning_ab import shape_for_record

    raw = {
        "init_saturation": {"postTAE": {"frac_gt_099": 0.0},
                            "postSAE": {"frac_gt_099": 0.02},
                            "postSAEdamped": {"frac_gt_099": 0.0}},
        "scratch_s0": {"metrics": {"greedy_wer": 0.10, "greedy_acc": 0.9},
                       "final_saturation": {"frac_gt_099": 0.001}},
        "scratch_s1": {"metrics": {"greedy_wer": 0.20, "greedy_acc": 0.8},
                       "final_saturation": {"frac_gt_099": 0.0}},
        "postSAEdamped_s0": {"metrics": {"greedy_wer": 0.05},
                             "final_saturation": {"frac_gt_099": 0.0}},
        "postSAEdamped_s1": {"metrics": {"greedy_wer": 0.07},
                             "final_saturation": {"frac_gt_099": 0.0}},
    }
    doc = shape_for_record(raw, damped_scale=0.1, what="w", regime={"r": 1})
    assert sorted(doc["arms"]) == ["post_SAE_damped_0.1", "scratch"]
    assert doc["arms"]["scratch"]["greedy_wer_mean"] == 0.15
    assert doc["arms"]["scratch"]["greedy_wer_range"] == [0.10, 0.20]
    assert doc["init_saturation"]["post_SAE_parity"]["frac_gt_099"] == 0.02
    assert doc["init_saturation"]["post_SAE_damped_0.1"]["frac_gt_099"] == 0.0
    s = summarize_ab(doc)
    assert s["arm_ranking_by_mean_wer"][0] == "post_SAE_damped_0.1"
    assert s["best_arm_by_seed"] == ["post_SAE_damped_0.1"] * 2


def test_sae_ab_shape_labels_override():
    """When the producing run was itself damped, its asr_2 is not parity —
    the labels override records the honest arm name."""
    from benchmarks.sae_poisoning_ab import shape_for_record

    raw = {"postSAE_s0": {"metrics": {"greedy_wer": 0.3}}}
    doc = shape_for_record(
        raw, labels={"postSAE": "post_SAE_damped_0.1_from_run"})
    assert list(doc["arms"]) == ["post_SAE_damped_0.1_from_run"]
