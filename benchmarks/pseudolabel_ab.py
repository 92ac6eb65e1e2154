"""Pseudolabel self-training A/B: does `cli.pseudolabel` actually help?

The repo ships a confidence-filtered self-training loop
(`ss_asr_tpu/cli/pseudolabel.py`) with no recorded experiment showing it
improves anything (round-3 VERDICT weak #2).  This harness measures it at a
low-resource operating point on the HARD synthetic-speech corpus, where the
true transcripts of the "unlabeled" pool are known — so the sweep records
not only the downstream eval WER per confidence threshold but the actual
label quality (WER of the kept pseudolabels against truth) that produced it.

Protocol (one command, all arms share corpus/split/LM/seed):

1. base       m1 supervised fine-tune on K labeled utts (malromur_parity.run)
2. control    continue training base on the SAME labeled set for E epochs
              (isolates "more steps" from "more data")
3. pseudo@t   decode the unlabeled pool with base (beam-8 + LM fusion),
              keep hypotheses with avg_logprob >= t, continue training on
              labeled + kept for E epochs   — the self-training claim
4. oracle     continue training on labeled + TRUE pool labels for E epochs
              — the data-quality upper bound the thresholds interpolate to

    python benchmarks/pseudolabel_ab.py --work .campaign/hard_pl \
        --labeled-utts 64 --epochs 250 --extra-epochs 120 \
        --thresholds auto --out docs/GAIN_PSEUDO.json

The pool is decoded once with the confidence filter open; each threshold is
a post-filter over that master decode (``thresholds auto`` sweeps P25/P50/
P75 of the observed confidence distribution, which the artifact records).

Match: the reference's whole program is leveraging unlabeled data
(/root/reference/src/trainer.py:909-1124 aux chain); self-training is the
complementary technique its tester stops short of (src/trainer.py:587-591).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _finetune_arm(work: str, arm: str, train_index: str, eval_index: str,
                  lm_corpus: str, base_ckpt: str, lm_ckpt: str,
                  epochs: int, batch: int, lm_weight: float,
                  max_decode_steps: int, seed: int, mdl: dict) -> dict:
    """Continue ASR training from ``base_ckpt`` on ``train_index`` for
    ``epochs`` epochs in a fresh checkpoint namespace, then decode the eval
    set three ways. Mirrors malromur_parity.run step 4's seeded-checkpoint
    hand-off (copy to <ckpdir>/asr.npz; the trainer resumes params from it
    with a fresh optimizer/tracker)."""
    from benchmarks.malromur_parity import make_config
    from benchmarks.quality_protocol import eval_decode_modes
    from ss_asr_tpu.train import ASRTrainer, make_paras

    paths = {"train_index": train_index, "eval_index": eval_index,
             "lm_corpus": lm_corpus}
    config = make_config(paths, mdl, epochs, batch, lm_epochs=1,
                         lm_chunk=200, lm_batch=1)
    paras = make_paras(name=arm, logdir=os.path.join(work, "runs"),
                       ckpdir=os.path.join(work, "result"), seed=seed)
    ckpdir = os.path.join(paras.ckpdir, paras.name)
    shutil.rmtree(ckpdir, ignore_errors=True)
    os.makedirs(ckpdir, exist_ok=True)
    shutil.copyfile(base_ckpt, os.path.join(ckpdir, "asr.npz"))
    shutil.copyfile(lm_ckpt, os.path.join(ckpdir, "char_lm.npz"))

    t = ASRTrainer(config, paras)
    t.load_data(); t.set_model(); t.exec(); t.close()
    out = eval_decode_modes(config, paras, lm_weight,
                            max_steps=max_decode_steps)
    from ss_asr_tpu.data.index import load_index
    out["n_train_utts"] = int(len(load_index(train_index)))
    out["extra_epochs"] = epochs
    return out


def _pool_truth(processed_index: str, labeled_index: str):
    """The unlabeled pool = preprocessed train rows minus the labeled
    subset; returns (wav_paths, truth_by_stem). Truth texts strip the
    index's SOS/EOS guards (<...>) back to plain words."""
    from ss_asr_tpu.data.index import load_index

    full = load_index(processed_index)
    labeled = set(load_index(labeled_index)["wav_fname"])
    pool = full[~full["wav_fname"].isin(labeled)]
    wavs = list(pool["wav_fname"])
    truth = {
        os.path.splitext(os.path.basename(w))[0]:
            t.lstrip("<").rstrip(">")
        for w, t in zip(pool["wav_fname"], pool["normalized_text"])
    }
    return wavs, truth


def _decode_pool(outdir: str, wavs, ckpt: str, lm_ckpt: str, mdl: dict,
                 lm_weight: float, max_steps: int):
    """Run the real CLI in-process ONCE over the whole pool with the
    confidence filter open (``--min-avg-logprob -1e9``), producing a master
    index whose ``text_fname`` column carries each row's decode confidence
    (``pseudo:<avg_logprob>``, written by the CLI).  Threshold arms are then
    pure post-filters over this one decode — the sweep never re-decodes.
    Returns (master DataFrame, index path)."""
    from ss_asr_tpu.cli.pseudolabel import main as pl_main
    from ss_asr_tpu.data.index import load_index

    shutil.rmtree(outdir, ignore_errors=True)
    # the CLI reads asr.mdl sizes from a config file; write one
    os.makedirs(outdir, exist_ok=True)
    cfg_path = os.path.join(outdir, "cfg.yaml")
    with open(cfg_path, "w", encoding="utf-8") as f:
        json.dump({"asr": {"mdl": mdl}}, f)  # YAML superset: JSON is valid
    argv = [ckpt, outdir, *wavs,
            "--config", cfg_path, "--lm", lm_ckpt, "--beam", "8",
            "--lm-weight", str(lm_weight), "--sr", "8000",
            "--max-steps", str(max_steps), "--batch", "32",
            "--min-avg-logprob=-1e9"]  # =-form: argparse's negative-number
    # matcher doesn't recognize exponent literals as values
    pl_main(argv)
    index_path = os.path.join(outdir, "index.tsv")
    if not (os.path.exists(index_path) and os.path.getsize(index_path)):
        return None, index_path
    return load_index(index_path), index_path


def _row_conf(df):
    """Per-row avg_logprob confidences from the CLI's text_fname field."""
    return [float(str(s).split(":", 1)[1]) for s in df["text_fname"]]


def _conf_stats(confs) -> dict:
    import numpy as np

    a = np.asarray(confs, dtype=np.float64)
    pct = {f"p{q}": round(float(np.percentile(a, q)), 4)
           for q in (10, 25, 50, 75, 90)}
    return {"n": int(a.size), "min": round(float(a.min()), 4),
            "mean": round(float(a.mean()), 4),
            "max": round(float(a.max()), 4), **pct}


def _threshold_arm(outdir: str, master, threshold: float,
                   truth: dict) -> dict:
    """Post-filter the master pool decode at ``threshold``; score the kept
    pseudolabels against the (known, synthetic-corpus) truth."""
    from ss_asr_tpu.data.index import save_index
    from ss_asr_tpu.utils.metrics import err_rate

    confs = _row_conf(master)
    keep = [c >= threshold for c in confs]
    df = master[keep]
    stats = {"threshold": threshold, "n_kept": int(len(df)),
             "rejected_low_conf": int(len(master) - len(df)),
             "pseudo_wer": None, "pseudo_cer": None}
    if not len(df):
        return stats
    wers, cers = [], []
    for _, row in df.iterrows():
        stem = os.path.splitext(os.path.basename(row["wav_fname"]))[0]
        ref = truth.get(stem)
        if ref is None:
            continue
        hyp = str(row["normalized_text"]).lstrip("<").rstrip(">")
        wers.append(err_rate(hyp, ref, unit="word"))
        cers.append(err_rate(hyp, ref, unit="char"))
    if wers:
        stats["pseudo_wer"] = round(sum(wers) / len(wers), 4)
        stats["pseudo_cer"] = round(sum(cers) / len(cers), 4)
    os.makedirs(outdir, exist_ok=True)
    index_path = os.path.join(outdir, "index.tsv")
    save_index(df, index_path)
    stats["index"] = index_path
    return stats


def _merge_indices(a: str, b: str, out: str) -> str:
    import pandas as pd

    from ss_asr_tpu.data.index import load_index, save_index

    df = pd.concat([load_index(a), load_index(b)], ignore_index=True)
    df = df.sort_values("unpadded_num_frames")
    save_index(df, out)
    return out


def run_ab(work: str, n_corpus: int, labeled_utts: int, epochs: int,
           extra_epochs: int, thresholds, batch: int = 32,
           lm_weight: float = 0.2, max_decode_steps: int = 60,
           seed: int = 0, lm_epochs: int = 6, size: str = "flagship",
           reuse: str | None = None) -> dict:
    """``thresholds`` is a list of floats or the string ``"auto"`` — auto
    picks P90/P75/P50/P25 of the pool's decoded confidence distribution, so
    the sweep brackets the teacher's actual operating range instead of
    assuming one (the first run of this harness rejected 386/386 pool
    utterances at every preset threshold because the hard-corpus teacher's
    avg_logprob lives in [-1.1, -0.8]).  ``reuse`` points at a previous
    artifact JSON;
    base/control/oracle arm results are copied from it when the base arm's
    checkpoints still exist on disk, so a threshold re-sweep costs only the
    pool decode + the pseudo fine-tunes."""
    from benchmarks.malromur_parity import build_gain_corpus, run

    os.makedirs(work, exist_ok=True)
    prior = None
    if reuse and os.path.exists(reuse):
        with open(reuse, encoding="utf-8") as f:
            prior = json.load(f)
        needed = [os.path.join(work, "result", "pl_base", n)
                  for n in ("asr.npz", "char_lm.npz")]
        needed += [os.path.join(work, "processed", p)
                   for p in (f"train_{labeled_utts}u.tsv", "train.tsv",
                             "eval.tsv")]
        if not all(os.path.exists(p) for p in needed):
            prior = None  # arms without their checkpoints can't be reused
    csv_path, wav_dir, lm_corpus, _ = build_gain_corpus(
        work, n_corpus, seed=seed, hard=True)
    if size == "tiny":
        mdl = {"encoder_state_size": 16, "mlp_out_size": 16,
               "decoder_state_size": 16, "feature_dim": 40}
    else:
        mdl = {"encoder_state_size": 256, "mlp_out_size": 128,
               "decoder_state_size": 256, "feature_dim": 40}

    # 1. base: supervised-only m1 at the low-resource budget
    if prior is not None:
        base = prior["base"]
    else:
        base = run(csv_path, wav_dir, work, hours=None, lm_corpus=lm_corpus,
                   epochs=epochs, lm_epochs=lm_epochs, batch=batch, mdl=mdl,
                   lm_weight=lm_weight, seed=seed, sr=8000,
                   max_decode_steps=max_decode_steps, model="m1",
                   name="pl_base", labeled_utts=labeled_utts)
    processed = os.path.join(work, "processed")
    labeled_index = os.path.join(processed, f"train_{labeled_utts}u.tsv")
    eval_index = os.path.join(processed, "eval.tsv")
    base_ckpt = os.path.join(work, "result", "pl_base", "asr.npz")
    lm_ckpt = os.path.join(work, "result", "pl_base", "char_lm.npz")

    wavs, truth = _pool_truth(os.path.join(processed, "train.tsv"),
                              labeled_index)
    common = dict(work=work, eval_index=eval_index, lm_corpus=lm_corpus,
                  base_ckpt=base_ckpt, lm_ckpt=lm_ckpt, epochs=extra_epochs,
                  batch=batch, lm_weight=lm_weight,
                  max_decode_steps=max_decode_steps, seed=seed, mdl=mdl)
    out = {"base": base, "pool_size": len(wavs),
           "labeled_utts": labeled_utts, "seed": seed,
           "config": {"n_corpus": n_corpus, "epochs": epochs,
                      "extra_epochs": extra_epochs, "batch": batch,
                      "lm_weight": lm_weight,
                      "thresholds": ("auto" if thresholds == "auto"
                                     else list(thresholds))}}

    # 2. control: same continuation budget, labeled data only
    if prior is not None and "control" in prior:
        out["control"] = prior["control"]
    else:
        out["control"] = _finetune_arm(arm="pl_control",
                                       train_index=labeled_index, **common)

    # 3. decode the pool ONCE, then one post-filter + fine-tune per threshold
    master, master_index = _decode_pool(
        os.path.join(work, "pool_decode"), wavs, base_ckpt, lm_ckpt, mdl,
        lm_weight, max_decode_steps)
    out["pseudo"] = {}
    if master is None:
        out["pool_confidence"] = None
    else:
        confs = _row_conf(master)
        out["pool_confidence"] = _conf_stats(confs)
        out["pool_confidence"]["index"] = master_index
        if thresholds == "auto":
            thresholds = [out["pool_confidence"][p]
                          for p in ("p90", "p75", "p50", "p25")]
            out["config"]["thresholds_resolved"] = thresholds
        for t in thresholds:
            tag = f"t{t}".replace("-", "m").replace(".", "p")
            pdir = os.path.join(work, f"pseudo_{tag}")
            stats = _threshold_arm(pdir, master, t, truth)
            arm = dict(stats)
            if stats["n_kept"]:
                merged = _merge_indices(labeled_index, stats["index"],
                                        os.path.join(pdir, "merged.tsv"))
                arm.update(_finetune_arm(arm=f"pl_{tag}", train_index=merged,
                                         **common))
            out["pseudo"][str(t)] = arm

    # 4. oracle: the pool with its TRUE labels (data-quality upper bound)
    if prior is not None and "oracle" in prior:
        out["oracle"] = prior["oracle"]
    else:
        from ss_asr_tpu.data.index import load_index, save_index

        full = load_index(os.path.join(processed, "train.tsv"))
        labeled = set(load_index(labeled_index)["wav_fname"])
        pool_df = full[~full["wav_fname"].isin(labeled)]
        pool_index = os.path.join(work, "pool_true.tsv")
        save_index(pool_df, pool_index)
        merged = _merge_indices(labeled_index, pool_index,
                                os.path.join(work, "oracle_merged.tsv"))
        out["oracle"] = _finetune_arm(arm="pl_oracle", train_index=merged,
                                      **common)

    # conclusion strings are data-driven — never overstate
    # (benchmarks/gain_stats.py contract)
    best_mode = lambda r: min(r.get(k, 1e9) for k in
                              ("greedy_wer", "beam8_wer", "beam8_lm_wer"))
    ctrl = best_mode(out["control"])
    wins = {t: best_mode(a) for t, a in out["pseudo"].items()
            if "greedy_wer" in a}
    concl = []
    if wins:
        t_best = min(wins, key=wins.get)
        lq = out["pseudo"][t_best].get("pseudo_wer")
        lq_s = f" (kept-label WER vs truth {lq:.4f})" if lq is not None \
            else ""
        if wins[t_best] < ctrl:
            concl.append(
                f"self-training helps at this operating point: best pseudo "
                f"arm (threshold {t_best}) best-mode WER {wins[t_best]:.4f} "
                f"vs control {ctrl:.4f} at equal continuation epochs{lq_s}")
        else:
            concl.append(
                f"self-training did NOT beat the labeled-only control here "
                f"(best pseudo {wins[t_best]:.4f} vs control {ctrl:.4f})"
                f"{lq_s}")
    elif out["pseudo"]:
        concl.append(
            "every threshold kept 0 pool utterances — no pseudo arm was "
            "trainable; the thresholds sit above the teacher's confidence "
            "range (see pool_confidence)")
    else:
        concl.append("pool decode produced no index — no pseudo arms ran")
    concl.append(
        f"oracle (true pool labels) best-mode WER "
        f"{best_mode(out['oracle']):.4f} bounds what perfect labels buy")
    out["conclusions"] = concl
    return out


#: auto-threshold percentile labels in thresholds_resolved order (run_ab)
_PCT_ORDER = ("p90", "p75", "p50", "p25")


def _best_mode(r: dict) -> float:
    return min(r.get(k, 1e9) for k in
               ("greedy_wer", "beam8_wer", "beam8_lm_wer"))


def pool_runs(runs: list) -> dict:
    """Pool several seeded run_ab artifacts into one seed-gated summary
    (round-4 VERDICT weak #4: the strong-teacher win was single-seed).

    Two pooled readings, kept apart because they answer different
    questions:

    * per-PERCENTILE (the honest rule): auto-threshold runs resolve the
      same percentile of each seed's own confidence distribution, so
      "pseudo@p25 beats control" is a fixed decision rule applied across
      seeds — no post-hoc selection;
    * per-seed BEST threshold (the optimistic bound): max over ~4 arms per
      seed, explicitly labeled as selection-biased.

    Sign-test p-values come from gain_stats (exact, two-sided).
    """
    from benchmarks.gain_stats import _mean_std, _sign_test_p

    per_seed = []
    for r in runs:
        ctrl = _best_mode(r["control"])
        resolved = r.get("config", {}).get("thresholds_resolved")
        arms = {t: _best_mode(a) for t, a in r.get("pseudo", {}).items()
                if "greedy_wer" in a}
        row = {"seed": r.get("seed"), "control_wer": round(ctrl, 4),
               "oracle_wer": round(_best_mode(r["oracle"]), 4)}
        if resolved:
            row["by_percentile"] = {
                pct: (round(arms[str(t)], 4) if str(t) in arms else None)
                for pct, t in zip(_PCT_ORDER, resolved)
            }
        if arms:
            t_best = min(arms, key=arms.get)
            row["best_pseudo_wer"] = round(arms[t_best], 4)
            row["best_threshold"] = t_best
            row["best_delta_vs_control"] = round(arms[t_best] - ctrl, 4)
        per_seed.append(row)

    n = len(per_seed)
    out = {"n_seeds": n, "per_seed": per_seed,
           "control_wer": _mean_std([r["control_wer"] for r in per_seed]),
           "oracle_wer": _mean_std([r["oracle_wer"] for r in per_seed])}
    concl = []
    by_pct = {}
    for pct in _PCT_ORDER:
        vals = [(r["by_percentile"][pct], r["control_wer"])
                for r in per_seed
                if r.get("by_percentile", {}).get(pct) is not None]
        if not vals:
            continue
        hits = sum(1 for w, c in vals if w < c)
        ties = sum(1 for w, c in vals if w == c)
        by_pct[pct] = {
            "pooled_wer": _mean_std([w for w, _ in vals]),
            "beats_control": f"{hits}/{len(vals)}",
            "sign_test_p": _sign_test_p(hits, len(vals) - ties),
            "paired_delta_vs_control": _mean_std(
                [w - c for w, c in vals]),
        }
    out["by_percentile"] = by_pct
    best = [r for r in per_seed if "best_pseudo_wer" in r]
    if best:
        hits = sum(1 for r in best
                   if r["best_pseudo_wer"] < r["control_wer"])
        ties = sum(1 for r in best
                   if r["best_pseudo_wer"] == r["control_wer"])
        out["best_arm_selection_biased"] = {
            "note": "per-seed max over ~4 thresholds — an optimistic bound, "
                    "not a decision rule; read by_percentile for the claim",
            "beats_control": f"{hits}/{len(best)}",
            "sign_test_p": _sign_test_p(hits, len(best) - ties),
            "paired_delta_vs_control": _mean_std(
                [r["best_delta_vs_control"] for r in best]),
        }
        qual = ("seed-robust" if hits == len(best) and len(best) >= 3
                else "majority-of-seeds" if hits * 2 > len(best)
                else "seed-dependent")
        concl.append(
            f"best-threshold pseudo beats control in {hits}/{len(best)} "
            f"seeds ({qual}; selection-biased bound)")
    # the claim-bearing rule: the single percentile that pools best
    if by_pct:
        rule = min(by_pct, key=lambda p: by_pct[p]["pooled_wer"]["mean"])
        row = by_pct[rule]
        direction = ("beats" if int(row["beats_control"].split("/")[0]) * 2
                     > int(row["beats_control"].split("/")[1]) else
                     "does NOT beat")
        concl.append(
            f"fixed rule pseudo@{rule}: {direction} control in "
            f"{row['beats_control']} seeds (sign test p="
            f"{row['sign_test_p']}, paired dWER "
            f"{row['paired_delta_vs_control']['mean']})")
    concl.append(
        f"oracle bound: true pool labels reach WER "
        f"{out['oracle_wer']['mean']} (n={n})")
    out["conclusions"] = concl
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pool", default=None, metavar="A.json,B.json,...",
                    help="pool several seeded artifacts into one summary "
                         "(skips running anything); --out writes it")
    ap.add_argument("--work", default=None)
    ap.add_argument("--synthetic", type=int, default=640)
    ap.add_argument("--labeled-utts", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=250,
                    help="base supervised epochs")
    ap.add_argument("--extra-epochs", type=int, default=120,
                    help="continuation budget per arm (control/pseudo/oracle)")
    ap.add_argument("--thresholds", default="auto",
                    help="comma-separated avg_logprob floors, or 'auto' to "
                         "sweep P25/P50/P75 of the pool confidence "
                         "distribution")
    ap.add_argument("--reuse", default=None,
                    help="previous artifact JSON; base/control/oracle arms "
                         "are copied from it when their checkpoints exist")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lm-weight", type=float, default=0.2)
    ap.add_argument("--max-decode-steps", type=int, default=60)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--size", choices=("tiny", "flagship"),
                    default="flagship")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    if args.pool:
        runs = []
        for path in args.pool.split(","):
            with open(path.strip(), encoding="utf-8") as f:
                runs.append(json.load(f))
        result = pool_runs(runs)
        result["source_files"] = [p.strip() for p in args.pool.split(",")]
        blob = json.dumps(result, indent=1, ensure_ascii=False)
        if args.out:
            os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
            with open(args.out, "w", encoding="utf-8") as f:
                f.write(blob)
        print(blob)
        return
    if not args.work:
        ap.error("--work is required (unless --pool)")

    thresholds = ("auto" if args.thresholds.strip() == "auto" else
                  [float(t) for t in args.thresholds.split(",") if t.strip()])
    result = run_ab(args.work, args.synthetic, args.labeled_utts, args.epochs,
                    args.extra_epochs, thresholds, batch=args.batch,
                    lm_weight=args.lm_weight,
                    max_decode_steps=args.max_decode_steps, seed=args.seed,
                    size=args.size, reuse=args.reuse)
    blob = json.dumps(result, indent=1, ensure_ascii=False)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w", encoding="utf-8") as f:
            f.write(blob)
    print(blob)


if __name__ == "__main__":
    main()
