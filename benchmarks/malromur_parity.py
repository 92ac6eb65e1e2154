"""Turnkey Málrómur parity harness: corpus download -> thesis-table numbers.

One command takes a Málrómur download (the corpus CSV index + wav directory,
reference layout src/preprocess.py:105-184) through the full pipeline —
preprocess -> split (optionally a low-resource subset) -> char-LM train ->
ASR train -> three-mode decode (greedy / beam-8 / beam-8 + LM fusion) — and
emits one JSON comparing the measured {acc, wer, cer} per decode mode
against the thesis' published numbers for that condition (Tables 6.1/6.12,
thesis pp. 70/88; see SURVEY.md §6).

    # real corpus (the only missing ingredient in this environment):
    python benchmarks/malromur_parity.py run \
        --index malromur_metadata.csv --wav-dir wav/ --work /data/parity \
        --hours 10 --lm-corpus risamalheild_news.txt --epochs 30 \
        --out docs/MALROMUR_PARITY.json

    # synthetic smoke (Málrómur's exact layout, incl. the classification
    # column filter), CPU-friendly — proves the path end to end:
    python benchmarks/malromur_parity.py smoke --work /tmp/malromur_smoke

``--model`` selects from the thesis Table 6.5 menu (MODEL_STAGES,
m1 supervised-only .. m6 TAE->SAE->ADV); ``compare`` runs several menu
entries head-to-head on ONE corpus/split/LM/seed and reports the
semi-supervised gain (``--synthetic N`` builds a homophone tone corpus
with abundant LM text, so the experiment runs without a download).

The smoke corpus is written in Málrómur's CSV layout (>=8 comma-separated
columns, utterance id in col 0, text in col 5, classification in col 7) with
deliberately 'incorrect'-classified rows that MUST be filtered out, matching
/root/reference/src/preprocess.py:152-158.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: thesis targets to compare against (SURVEY.md §6; thesis pp. 70, 83-88).
#: Table 6.12: best model (M5) TEST accuracy per decode mode; Table 6.6-6.10:
#: M1 (supervised-only) validation acc/err, greedy. "err" is the thesis'
#: word-level error (can exceed 1).
THESIS_TARGETS = {
    "full": {"val_acc_greedy": 0.68, "val_wer_greedy": 0.45,
             "source": "thesis §6.1 p.70 (full Málrómur, ~30 epochs, bs 32)"},
    "2.5": {"m1_val": {"acc": 0.13, "wer": 1.27},
            "m5_test_acc": {"greedy": 0.17, "beam8": 0.20, "beam8_lm": 0.23},
            "source": "thesis Tables 6.6/6.12"},
    "5": {"m1_val": {"acc": 0.19, "wer": 1.35},
          "m5_test_acc": {"greedy": 0.26, "beam8": 0.34, "beam8_lm": 0.35},
          "source": "thesis Tables 6.8/6.12"},
    "10": {"m1_val": {"acc": 0.29, "wer": 1.11},
           "m5_test_acc": {"greedy": 0.35, "beam8": 0.41, "beam8_lm": 0.40},
           "source": "thesis Tables 6.10/6.12"},
}


#: thesis Table 6.5 model menu -> seed_train.stages (M5 best, §6.5 p.87).
#: Each stage trains on the UNLABELED pool and relays the mutated ASR
#: checkpoint to the next (train/seed.py); the supervised fine-tune follows.
MODEL_STAGES = {
    "m1": None,                    # supervised-only baseline
    "m2": ["tae"],
    "m3": ["tae", "adv"],
    "m4": ["tae", "adv", "sae"],
    "m5": ["tae", "sae"],          # thesis best (Table 6.12)
    "m6": ["tae", "sae", "adv"],
}


def make_config(paths: dict, mdl: dict, epochs: int, batch: int,
                lm_epochs: int, lm_chunk: int, lm_batch: int,
                seed_epochs: int = 2, seed_its: int = 1,
                stages=("tae", "sae"),
                sae_listener_lr_scale: float = 1.0,
                augment: dict | None = None) -> dict:
    """Reference-default config (conf/default.yaml schema): Adadelta 1.0 for
    the ASR, Adam 1e-4 for the char LM (SURVEY.md §2.2). When
    ``paths["unlabeled_index"]`` is present, the sections for the seed
    chain ``stages`` (MODEL_STAGES menu; default M5's tae->sae) are emitted
    too (thesis Table 5.3 sizes scaled to ``mdl``): the aux stages train on
    the UNLABELED pool — the thesis' semi-supervised setup uses all
    audio/text, the fine-tune only the labeled subset."""
    cfg = {
        "asr": {
            "opt": {"type": "Adadelta", "learning_rate": 1.0},
            "mdl": {**mdl, "tf_rate": 0.9},
            "train_index": paths["train_index"],
            "valid_index": paths["eval_index"],
            "test_index": paths["eval_index"],
            "t_bucket": 128, "l_bucket": 16,
            "train_batch_size": batch, "valid_batch_size": batch,
            "n_epochs": epochs, "valid_step": 2000, "logging_step": 250,
            "save_step": 2000, "wer_step": 1000,
            # SpecAugment on the supervised fine-tune only (ops/augment.py;
            # absent = identity, the reference has no augmentation)
            **({"augment": augment} if augment else {}),
        },
        "char_lm": {
            "opt": {"type": "Adam", "learning_rate": 1e-4},
            "mdl": {"hidden_size": 128, "tf_rate": 0.9},
            "train_index": paths["lm_corpus"],
            "chunk_size": lm_chunk, "train_batch_size": lm_batch,
            "n_epochs": lm_epochs, "valid_step": 10**9,
            "logging_step": 250, "save_step": 10**9,
        },
    }
    if "unlabeled_index" in paths:
        u = paths["unlabeled_index"]
        H = mdl.get("encoder_state_size", 256)
        shared = {
            "train_index": u, "valid_index": paths["eval_index"],
            "train_batch_size": batch, "n_epochs": seed_epochs,
            "valid_step": 10**9, "save_step": 10**9, "logging_step": 250,
        }
        cfg["tae"] = {
            "opt": {"type": "Adam", "learning_rate": 1e-4},
            "mdl": {"state_size": H, "emb_dim": 128, "num_layers": 2},
            "drop_rate": 0.1, "l_bucket": 16, **shared,
        }
        if "sae" in stages:
            # thesis Table 5.3 conv stack at feature_dim 40; smaller feature
            # dims (smoke) shrink the frequency kernel to fit
            fk = min(36, mdl.get("feature_dim", 40) - 2)
            cfg["sae"] = {
                "opt": {"type": "Adam", "learning_rate": 1e-4},
                "mdl": {
                    "kernel_sizes": [[1, fk], [5, 1], [3, 1]],
                    "num_filters": [32, 64, 256] if H >= 64 else [4, 8, 16],
                    "pool_kernel_sizes": [[3, 1], [5, 1], [2000, 40]],
                },
                "t_bucket": 128, **shared,
            }
            if sae_listener_lr_scale != 1.0:
                # damp the listener co-update — reconstruction pressure can
                # tanh-saturate the shared encoder and poison the downstream
                # fine-tune (docs/GAIN_AB.json controlled experiment)
                cfg["sae"]["listener_lr_scale"] = sae_listener_lr_scale
        if "adv" in stages:
            # reference conf/default.yaml adv section: Adadelta both sides,
            # 256-d per-timestep MLP discriminator, label smoothing 0.1
            cfg["adv"] = {
                "G_opt": {"type": "Adadelta", "learning_rate": 1.0},
                "D_opt": {"type": "Adadelta", "learning_rate": 1.0},
                "mdl": {"hidden_dim": 256 if H >= 64 else 16},
                "label_smoothing": 0.1, "t_bucket": 128, "l_bucket": 16,
                **shared,
            }
        cfg["seed_train"] = {"super_its": seed_its, "stages": list(stages)}
    return cfg


def run(index: str, wav_dir: str, work: str, hours: float | None,
        lm_corpus: str | None, epochs: int, lm_epochs: int, batch: int,
        mdl: dict | None = None, lm_chunk: int = 200, lm_batch: int = 128,
        lm_weight: float = 0.1, seed: int = 0, sr: int = 16000,
        max_decode_steps: int = 200, model: str = "m1",
        seed_epochs: int = 2, seed_its: int = 1, name: str = "malromur",
        labeled_utts: int | None = None,
        sae_listener_lr_scale: float = 1.0,
        reuse_lm: str | None = None,
        augment: dict | None = None,
        lm_target_steps: int | None = None) -> dict:
    """``model``: any of the thesis Table 6.5 menu (MODEL_STAGES) — "m1" =
    supervised-only baseline (Tables 6.6-6.10); "m2".."m6" = the aux seed
    chain named by the thesis (TAE / ADV / SAE in the listed order) on the
    unlabeled pool, then supervised fine-tune on the labeled subset.
    "m5" (TAE -> SAE) is the thesis' best (Table 6.12).

    ``name`` namespaces checkpoints/logs (``compare`` runs m1 and m5 over
    the same preprocessed corpus). ``labeled_utts`` is a count-based
    low-resource subset — the synthetic gain experiment's analogue of the
    thesis' ``hours`` budget (tone utterances are seconds long).
    ``reuse_lm`` copies an already-trained char-LM checkpoint in instead of
    retraining (``compare`` trains it once — same corpus/config/seed)."""
    from ss_asr_tpu.cli.preprocess import preprocess_malromur
    from ss_asr_tpu.data.index import load_index, make_split, subset_by_t
    from ss_asr_tpu.train import ASRTrainer, CHARLMTrainer, make_paras
    from benchmarks.quality_protocol import eval_decode_modes

    if model not in MODEL_STAGES:
        raise ValueError(
            f"model must be one of {sorted(MODEL_STAGES)}, got {model!r}")
    stages = MODEL_STAGES[model]

    os.makedirs(work, exist_ok=True)
    processed = os.path.join(work, "processed")

    # 1. preprocess (filters classification == 'correct', computes fbanks on
    #    device, writes the length-sorted index.tsv). The cache is keyed on
    #    the SOURCE corpus (path, sr, index mtime/size), not bare existence —
    #    reusing a --work dir with a different corpus must re-preprocess,
    #    not silently train on stale features.
    idx_path = os.path.join(processed, "index.tsv")
    marker_path = os.path.join(processed, ".source.json")
    source = {"index": os.path.abspath(index),
              "wav_dir": os.path.abspath(wav_dir), "sr": sr,
              "index_mtime": os.path.getmtime(index),
              "index_size": os.path.getsize(index)}
    cached = None
    if os.path.exists(marker_path):
        with open(marker_path, encoding="utf-8") as f:
            cached = json.load(f)
    if not (os.path.exists(idx_path) and cached == source):
        idx_path = preprocess_malromur(index, wav_dir, processed, sr=sr)
        with open(marker_path, "w", encoding="utf-8") as f:
            json.dump(source, f)
    n_total = len(load_index(idx_path))

    # 2. split; optional low-resource subset of the TRAIN side only (the
    #    thesis subsets labeled audio, the eval set stays fixed)
    make_split(idx_path, seed=seed)
    train_index = os.path.join(processed, "train.tsv")
    eval_index = os.path.join(processed, "eval.tsv")
    if hours:
        sub = os.path.join(processed, f"train_{hours}h.tsv")
        subset_by_t(hours * 3600.0, train_index, sub, seed=seed)
        # keep the low-resource subset length-sorted for bucketing
        from ss_asr_tpu.data.index import sort_index

        sort_index(sub, "unpadded_num_frames")
        train_index = sub
    elif labeled_utts:
        from ss_asr_tpu.data.index import save_index

        sub = os.path.join(processed, f"train_{labeled_utts}u.tsv")
        df = load_index(train_index)
        rng = __import__("numpy").random.default_rng(seed)
        take = sorted(rng.choice(len(df), size=min(labeled_utts, len(df)),
                                 replace=False))
        df = df.iloc[take].sort_values("unpadded_num_frames")
        save_index(df, sub)
        train_index = sub

    # 3. LM corpus: Risamálheild-style plain text, or train transcripts
    if lm_corpus is None:
        lm_corpus = os.path.join(work, "lm_train_transcripts.txt")
        df = load_index(train_index)
        with open(lm_corpus, "w", encoding="utf-8") as f:
            f.write(" ".join(
                t.lstrip("<").rstrip(">") for t in df["normalized_text"]))

    # clamp the LM batch to what the corpus can actually fill — the loader
    # drops partial batches, so a corpus with fewer than lm_batch chunks
    # would "train" the LM for 0 steps and silently poison the fusion arm
    # (this happened: round-3 GAIN artifacts' beam8_lm columns)
    with open(lm_corpus, encoding="utf-8") as f:
        n_chunks = max(0, (len(f.read()) - 1) // lm_chunk)
    if 0 < n_chunks < lm_batch:
        print(f"[malromur_parity] LM corpus has only {n_chunks} chunks; "
              f"clamping lm_batch {lm_batch} -> {n_chunks}")
        lm_batch = n_chunks

    paths = {"train_index": train_index, "eval_index": eval_index,
             "lm_corpus": lm_corpus}
    if stages:
        # the aux stages see the FULL training audio/text as the
        # unlabeled pool (the pre-subset index); fine-tune stays labeled
        paths["unlabeled_index"] = os.path.join(processed, "train.tsv")
    mdl = mdl or {"encoder_state_size": 256, "mlp_out_size": 128,
                  "decoder_state_size": 256, "feature_dim": 40}
    if lm_target_steps is not None:
        # matched-step fusion-LM budget: the reference-scale lm_epochs=5
        # default trains ~55 steps on the synthetic corpora, which caps the
        # LM at ~25% probe accuracy and washes out fusion entirely —
        # docs/LM_SCALE.json + docs/LM_SWEEP_RETRAINED.json measured the
        # mechanism and the fix. Derive epochs so total steps ~= target.
        n_chars = os.path.getsize(paths["lm_corpus"])
        spe = max(int(0.9 * n_chars / lm_chunk) // lm_batch, 1)
        lm_epochs = max(round(lm_target_steps / spe), 1)
    config = make_config(paths, mdl, epochs, batch, lm_epochs, lm_chunk,
                         lm_batch, seed_epochs=seed_epochs, seed_its=seed_its,
                         stages=stages or ("tae", "sae"),
                         sae_listener_lr_scale=sae_listener_lr_scale,
                         augment=augment)
    paras = make_paras(name=name, logdir=os.path.join(work, "runs"),
                      ckpdir=os.path.join(work, "result"), seed=seed)

    # 4. train — from a CLEAN checkpoint dir: a reused --work must not
    #    silently resume from a previous run's fine-tuned asr.npz/optimizer
    #    state (that would, e.g., give a rerun m1 twice the supervised
    #    budget of its freshly-seeded m5 rival and bias the comparison)
    import shutil

    ckpdir = os.path.join(paras.ckpdir, paras.name)
    shutil.rmtree(ckpdir, ignore_errors=True)

    if reuse_lm is not None:
        os.makedirs(ckpdir, exist_ok=True)
        shutil.copyfile(reuse_lm, os.path.join(ckpdir, "char_lm.npz"))
    else:
        lm = CHARLMTrainer(config, paras)
        lm.load_data(); lm.set_model(); lm.exec(); lm.close()
    if stages:
        # aux seed chain (thesis Table 6.5 recipe for this model), then
        # hand the seeded ASR to the supervised fine-tune as its
        # pretrained checkpoint
        from ss_asr_tpu.train import asr_seed_train

        asr_seed_train(config, paras)
        n_outs = sum(1 for s in config["seed_train"]["stages"] if s != "tae")
        seeded = os.path.join(ckpdir, f"asr_{1 + n_outs}.npz")
        shutil.copyfile(seeded, os.path.join(ckpdir, "asr.npz"))
    t = ASRTrainer(config, paras)
    t.load_data(); t.set_model(); t.exec(); t.close()

    # 5. decode eval set three ways (greedy / beam-8 / beam-8+LM), with
    #    acc/wer/cer per mode — the thesis-table protocol
    result = eval_decode_modes(config, paras, lm_weight,
                               max_steps=max_decode_steps)

    # 6. attach the thesis row this run should be compared against; a
    #    condition the thesis never ran (e.g. --hours 7.5, or a count-based
    #    --labeled-utts budget) gets NO target rather than a mislabeled one
    if hours:
        cond = {"2.5": "2.5", "5.0": "5", "5": "5",
                "10.0": "10", "10": "10"}.get(str(hours), str(hours))
    elif labeled_utts:
        cond = f"{labeled_utts}u"
    else:
        cond = "full"
    result["thesis_target"] = THESIS_TARGETS.get(cond)
    result["condition"] = cond
    result["n_corpus_utts"] = n_total
    result["config"] = {"hours": hours, "labeled_utts": labeled_utts,
                        "epochs": epochs, "batch": batch,
                        "lm_weight": lm_weight, "seed": seed, "mdl": mdl,
                        "model": model, "seed_epochs": seed_epochs,
                        "seed_its": seed_its, "augment": augment}
    return result


# ---------------------------------------------------------------------------
# compare: the model menu head-to-head on one corpus — the thesis' claim
# ---------------------------------------------------------------------------

def compare(index: str, wav_dir: str, work: str, hours: float | None,
            lm_corpus: str | None, epochs: int, lm_epochs: int, batch: int,
            mdl: dict | None = None, lm_chunk: int = 200, lm_batch: int = 128,
            lm_weight: float = 0.1, seed: int = 0, sr: int = 16000,
            max_decode_steps: int = 200, seed_epochs: int = 2,
            seed_its: int = 1, labeled_utts: int | None = None,
            models=("m1", "m5"),
            sae_listener_lr_scale: float = 1.0,
            augment: dict | None = None,
            lm_target_steps: int | None = None) -> dict:
    """Head-to-head model-menu runs (MODEL_STAGES; default M1 supervised-only
    vs M5 TAE -> SAE seed + fine-tune) on the SAME corpus, split, labeled
    budget, LM, and seed — the thesis' central semi-supervised claim
    (Tables 6.6-6.12: aux training on unlabeled audio/text lifts
    low-resource ASR) as one command. All runs share the preprocessed
    corpus AND the char LM (trained once — identical corpus/config/seed);
    checkpoints/logs are namespaced per model."""
    if len(set(models)) != len(models):
        raise ValueError(f"duplicate model entries in {models!r}: each menu "
                         "entry owns one checkpoint namespace")
    out = {}
    reuse_lm = None
    for model in models:
        out[model] = run(index, wav_dir, work, hours, lm_corpus, epochs,
                         lm_epochs, batch, mdl=mdl, lm_chunk=lm_chunk,
                         lm_batch=lm_batch, lm_weight=lm_weight, seed=seed,
                         sr=sr, max_decode_steps=max_decode_steps,
                         model=model, seed_epochs=seed_epochs,
                         seed_its=seed_its, name=model,
                         labeled_utts=labeled_utts,
                         sae_listener_lr_scale=sae_listener_lr_scale,
                         reuse_lm=reuse_lm, augment=augment,
                         lm_target_steps=lm_target_steps)
        reuse_lm = os.path.join(work, "result", model, "char_lm.npz")
    base = models[0]
    for model in models[1:]:
        gain = {}
        for mode in ("greedy", "beam8", "beam8_lm"):
            for met in ("acc", "wer", "cer"):
                k = f"{mode}_{met}"
                if k in out[base] and k in out[model]:
                    gain[k] = round(out[model][k] - out[base][k], 6)
        out[f"gain_{model}_minus_{base}"] = gain
    # the thesis' claim, stated as a boolean on its own primary metric
    # (word error): the best seeded model's best operating point (min WER
    # over decode modes) beats the baseline's best operating point —
    # mode-vs-mode alone can read false on a tie in one mode even when the
    # seeded model wins the others (docs/GAIN_M1_VS_M5.json)
    seeded = [m for m in models[1:] if m in out]
    modes = ("greedy_wer", "beam8_wer", "beam8_lm_wer")
    if seeded:
        best = lambda m: min(out[m].get(k, 1e9) for k in modes)
        out["semi_supervised_helps"] = bool(
            min(best(m) for m in seeded) < best(base)
        )
    return out


def build_gain_corpus(work: str, n: int, seed: int = 0, hard: bool = False):
    """Synthetic corpus + abundant text for the M1-vs-M5 gain experiment:
    Málrómur-layout tone speech over the LARGE word inventory with
    homophone characters (i->e, g->c render identically — only text
    knowledge can pick the spelling, the lever TAE/LM training pulls), plus
    a plain-text LM corpus over the full vocabulary (the thesis' analogue:
    Risamálheild text is abundant while labeled audio is scarce).

    ``hard=True`` renders with mkdata.render_hard (speaker pitch/formant
    shifts, duration jitter, swept-SNR noise, crowded formant grid) so
    held-out WER has headroom and robustness features can pay — the
    pure-tone corpus saturates (docs/GAIN_SUMMARY.json round-3 boundary)."""
    from benchmarks.quality_protocol import _lm_text
    from ss_asr_tpu.cli.mkdata import WORDS_LARGE

    csv_path, wav_dir, n_correct = build_smoke_corpus(
        work, n=n, seed=seed, words=WORDS_LARGE, homophones=True,
        max_words=2, hard=hard)
    lm_corpus = os.path.join(work, "lm_corpus.txt")
    # abundant text is the experiment's premise (Risamálheild analogue) AND
    # a batching requirement: run()'s reference-scale LM config consumes
    # chunk 200 x batch 128 = 25,600 chars per step, and the loader drops
    # partial batches — reps=400 (~1.9 KB) yielded 0 batches, i.e. an
    # UNTRAINED LM silently feeding every beam8_lm number. 60k tokens
    # (~290 KB) gives ~11 full reference-scale batches per epoch.
    with open(lm_corpus, "w", encoding="utf-8") as f:
        f.write(_lm_text(WORDS_LARGE, reps=60_000, seed=seed))
    return csv_path, wav_dir, lm_corpus, n_correct


# ---------------------------------------------------------------------------
# synthetic smoke: Málrómur CSV layout end to end
# ---------------------------------------------------------------------------

def build_smoke_corpus(work: str, n: int = 24, seed: int = 0,
                       words=None, homophones: bool = False,
                       max_words: int = 2, hard: bool = False):
    """Synthetic tone corpus written in Málrómur's exact layout: one CSV
    (utt id col 0, text col 5, classification col 7) + a wav directory.
    Every 5th row is classified != 'correct' and must be filtered out;
    one 'correct' row points at a missing wav (unreadable-wav skip,
    reference src/preprocess.py:169-173).

    ``words``/``homophones``/``max_words`` parameterize the lexicon so the
    same layout serves both the tiny smoke and the larger semi-supervised
    gain experiment (``compare --synthetic``)."""
    import numpy as np

    from ss_asr_tpu.cli.mkdata import SR, WORDS, render, render_hard, write_wav

    renderer = render_hard if hard else render
    vocab = list(words) if words is not None else WORDS
    rng = np.random.default_rng(seed)
    wav_dir = os.path.join(work, "wav")
    os.makedirs(wav_dir, exist_ok=True)
    csv_path = os.path.join(work, "malromur_metadata.csv")
    n_correct = 0
    with open(csv_path, "w", encoding="utf-8") as f:
        for i in range(n):
            utt = f"is_is-malromur_smoke-{i:04d}"
            k = int(rng.integers(1, max_words + 1))
            text = " ".join(rng.choice(vocab) for _ in range(k))
            cls = "correct" if i % 5 else "incorrect"
            if i != 7:  # row 7: correct but its wav is missing
                write_wav(os.path.join(wav_dir, utt + ".wav"),
                          renderer(text, rng, homophones=homophones), sr=SR)
            # cols: id, env, age, gender, device, TEXT, duration, CLASS
            f.write(f"{utt},indoor,20-30,m,phone,{text},2.0,{cls}\n")
            n_correct += int(cls == "correct" and i != 7)
    return csv_path, wav_dir, n_correct


def smoke(work: str, epochs: int = 2, model: str = "m1") -> dict:
    os.makedirs(work, exist_ok=True)
    csv_path, wav_dir, n_expected = build_smoke_corpus(work)
    mdl = {"encoder_state_size": 8, "mlp_out_size": 8,
           "decoder_state_size": 8, "feature_dim": 40}
    result = run(csv_path, wav_dir, work, hours=None, lm_corpus=None,
                 epochs=epochs, lm_epochs=2, batch=4, mdl=mdl,
                 lm_chunk=20, lm_batch=4, sr=8000, max_decode_steps=24,
                 model=model, seed_epochs=1)
    assert result["n_corpus_utts"] == n_expected, (
        f"classification filter broke: processed {result['n_corpus_utts']} "
        f"rows, expected {n_expected} ('correct' rows with readable wavs)")
    for key in ("greedy_cer", "beam8_wer", "beam8_lm_acc"):
        assert key in result, key
    result["smoke"] = {"expected_correct_rows": n_expected}
    return result


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("run", help="full parity run on a real Málrómur download")
    r.add_argument("--index", required=True, help="Málrómur metadata CSV")
    r.add_argument("--wav-dir", required=True)
    r.add_argument("--work", required=True)
    r.add_argument("--hours", type=float, default=None,
                   help="low-resource subset (2.5 / 5 / 10, thesis Table 6.12)")
    r.add_argument("--labeled-utts", type=int, default=None,
                   help="count-based labeled budget (synthetic regimes)")
    r.add_argument("--lm-corpus", default=None,
                   help="plain-text LM corpus (Risamálheild); default: train transcripts")
    r.add_argument("--epochs", type=int, default=30)
    r.add_argument("--lm-epochs", type=int, default=5)
    r.add_argument("--lm-target-steps", type=int, default=None,
                   help="train the fusion LM to ~N total steps (epochs "
                        "derived from corpus size) instead of --lm-epochs; "
                        "the reference-scale epoch default undertrains the "
                        "LM on small corpora (docs/LM_SCALE.json)")
    r.add_argument("--batch", type=int, default=32)
    r.add_argument("--lm-weight", type=float, default=0.1)
    r.add_argument("--seed", type=int, default=0)
    r.add_argument("--sr", type=int, default=16000)
    r.add_argument("--model", choices=sorted(MODEL_STAGES), default="m1",
                   help="thesis Table 6.5 menu — m1: supervised baseline; "
                        "m2..m6: aux seed chain + fine-tune (m5 = TAE->SAE, "
                        "thesis best, Table 6.12)")
    r.add_argument("--seed-epochs", type=int, default=2,
                   help="epochs per aux seed stage (m2..m6)")
    r.add_argument("--seed-its", type=int, default=1,
                   help="seed super-iterations (m2..m6)")
    r.add_argument("--sae-listener-lr-scale", type=float, default=1.0,
                   help="damp the SAE stage's listener co-update (1.0 = "
                        "reference parity; <1 guards against tanh "
                        "saturation, see docs/GAIN_AB.json)")
    r.add_argument("--out", default=None)

    s = sub.add_parser("smoke", help="synthetic Málrómur-layout end-to-end smoke")
    s.add_argument("--work", required=True)
    s.add_argument("--epochs", type=int, default=2)
    s.add_argument("--model", choices=sorted(MODEL_STAGES), default="m1")
    s.add_argument("--out", default=None)

    c = sub.add_parser(
        "compare",
        help="M1 vs M5 head-to-head on one corpus: the thesis' "
             "semi-supervised gain as a single command")
    c.add_argument("--index", default=None, help="Málrómur metadata CSV "
                   "(omit with --synthetic)")
    c.add_argument("--wav-dir", default=None)
    c.add_argument("--work", required=True)
    c.add_argument("--synthetic", type=int, default=None, metavar="N",
                   help="generate an N-utterance homophone tone corpus + "
                        "abundant LM text instead of a real download")
    c.add_argument("--hard", action="store_true",
                   help="with --synthetic: render hard synthetic speech "
                        "(speaker shifts, duration jitter, swept-SNR noise, "
                        "crowded formant grid — mkdata.render_hard) instead "
                        "of saturating pure tones")
    c.add_argument("--augment", default=None,
                   help="JSON SpecAugment config for the supervised "
                        "fine-tune's asr.augment section, e.g. "
                        '\'{"n_freq_masks":1,"freq_mask_width":6,'
                        '"n_time_masks":1,"time_mask_width":12}\'')
    c.add_argument("--hours", type=float, default=None)
    c.add_argument("--labeled-utts", type=int, default=None,
                   help="count-based labeled budget (synthetic regimes)")
    c.add_argument("--lm-corpus", default=None)
    c.add_argument("--epochs", type=int, default=30)
    c.add_argument("--lm-epochs", type=int, default=5)
    c.add_argument("--lm-target-steps", type=int, default=None,
                   help="see run --lm-target-steps")
    c.add_argument("--batch", type=int, default=32)
    c.add_argument("--lm-weight", type=float, default=0.1)
    c.add_argument("--seed", type=int, default=0)
    c.add_argument("--seeds", default=None, metavar="K0,K1,...",
                   help="run the full compare once per seed (fresh corpus "
                        "draw + training RNG, work/seed<k> subdirs) and pool "
                        "per-seed ordering statistics "
                        "(benchmarks/gain_stats.pool_seed_blocks); "
                        "overrides --seed. Output is always the "
                        "{per_seed, pooled} wrapper, even for one entry. "
                        "NB real (--index) corpora re-preprocess per seed "
                        "(each subdir is self-contained); for big corpora "
                        "preprocess once and sweep --seed in separate runs")
    c.add_argument("--sr", type=int, default=16000)
    c.add_argument("--seed-epochs", type=int, default=2)
    c.add_argument("--seed-its", type=int, default=1)
    c.add_argument("--sae-listener-lr-scale", type=float, default=1.0,
                   help="damp the SAE stage's listener co-update (1.0 = "
                        "reference parity)")
    c.add_argument("--models", default="m1,m5",
                   help="comma-separated MODEL_STAGES menu entries; the "
                        "first is the gain baseline (default m1,m5)")
    c.add_argument("--size", choices=["tiny", "flagship"], default="flagship",
                   help="model size for --synthetic runs")
    c.add_argument("--max-decode-steps", type=int, default=200)
    c.add_argument("--out", default=None)

    e = sub.add_parser(
        "evalsweep",
        help="decode-only re-evaluation of an already-trained run with an "
             "LM-fusion weight sweep (and optional n-best rescoring) — the "
             "thesis Table 6.12 lambda curve on any recorded checkpoint")
    e.add_argument("--work", required=True,
                   help="a run/compare work dir (result/<model>/ checkpoints "
                        "+ processed/eval.tsv present)")
    e.add_argument("--model", default="m1",
                   help="checkpoint namespace under result/ (menu entry or "
                        "run --name)")
    e.add_argument("--labeled-utts", type=int, default=None,
                   help="the producing run's labeled budget (locates "
                        "processed/train_<N>u.tsv; optional — only paths "
                        "matter for decode)")
    e.add_argument("--lm-weight", type=float, default=0.1)
    e.add_argument("--lm-sweep", default="0.05,0.1,0.2,0.5")
    e.add_argument("--rescore", action="store_true")
    e.add_argument("--batch", type=int, default=32)
    e.add_argument("--size", choices=["tiny", "flagship"], default="flagship")
    e.add_argument("--max-decode-steps", type=int, default=60)
    e.add_argument("--out", default=None)

    args = ap.parse_args()
    # trainer/preprocess chatter goes to stderr; stdout carries only the
    # JSON table (same contract as quality_protocol.py)
    import contextlib

    stdout = sys.stdout
    with contextlib.redirect_stdout(sys.stderr):
        result = _dispatch(ap, args)
    line = json.dumps(result, indent=1)
    print(line, file=stdout)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            f.write(line + "\n")


def evalsweep(work: str, model: str, lm_weight: float, lm_sweep,
              batch: int = 32, size: str = "flagship",
              max_decode_steps: int = 60, rescore: bool = False,
              labeled_utts: int | None = None) -> dict:
    """Decode-only LM-weight sweep over an existing trained run — re-uses
    the run's checkpoints and eval split, no training. One command turns any
    recorded arm into a thesis-Table-6.12-style lambda curve
    (quality_protocol.eval_decode_modes does the decoding/metrics)."""
    from benchmarks.quality_protocol import eval_decode_modes
    from ss_asr_tpu.train import make_paras

    processed = os.path.join(work, "processed")
    eval_index = os.path.join(processed, "eval.tsv")
    ckpdir = os.path.join(work, "result", model)
    for need in (eval_index, os.path.join(ckpdir, "asr.npz"),
                 os.path.join(ckpdir, "char_lm.npz")):
        if not os.path.exists(need):
            raise SystemExit(f"evalsweep: missing {need}")
    train_index = os.path.join(
        processed,
        f"train_{labeled_utts}u.tsv" if labeled_utts else "train.tsv")
    if size == "tiny":
        mdl = {"encoder_state_size": 8, "mlp_out_size": 8,
               "decoder_state_size": 8, "feature_dim": 40}
    else:
        mdl = {"encoder_state_size": 256, "mlp_out_size": 128,
               "decoder_state_size": 256, "feature_dim": 40}
    paths = {"train_index": train_index, "eval_index": eval_index,
             "lm_corpus": os.path.join(work, "lm_corpus.txt")}
    config = make_config(paths, mdl, epochs=0, batch=batch, lm_epochs=0,
                         lm_chunk=200, lm_batch=1)
    paras = make_paras(name=model, logdir=os.path.join(work, "runs"),
                       ckpdir=os.path.join(work, "result"))
    out = eval_decode_modes(config, paras, lm_weight,
                            max_steps=max_decode_steps,
                            lm_sweep=list(lm_sweep), rescore=rescore)
    out["checkpoint"] = os.path.join(ckpdir, "asr.npz")
    out["lm_weights"] = [lm_weight] + [w for w in lm_sweep
                                       if w != lm_weight]
    return out


def _dispatch(ap, args):
    if args.cmd == "evalsweep":
        sweep = [float(w) for w in args.lm_sweep.split(",") if w.strip()]
        return evalsweep(args.work, args.model, args.lm_weight, sweep,
                         batch=args.batch, size=args.size,
                         max_decode_steps=args.max_decode_steps,
                         rescore=args.rescore,
                         labeled_utts=args.labeled_utts)
    if args.cmd == "run":
        return run(args.index, args.wav_dir, args.work, args.hours,
                   args.lm_corpus, args.epochs, args.lm_epochs, args.batch,
                   lm_weight=args.lm_weight, seed=args.seed, sr=args.sr,
                   model=args.model, seed_epochs=args.seed_epochs,
                   seed_its=args.seed_its, labeled_utts=args.labeled_utts,
                   sae_listener_lr_scale=args.sae_listener_lr_scale,
                   lm_target_steps=args.lm_target_steps)
    if args.cmd == "compare":
        if not args.synthetic and not (args.index and args.wav_dir):
            ap.error("compare needs --index/--wav-dir or --synthetic N")
        # --size applies to real corpora too (quick pipeline checks);
        # flagship = run()'s default thesis-scale model
        mdl = None
        if args.size == "tiny":
            mdl = {"encoder_state_size": 8, "mlp_out_size": 8,
                   "decoder_state_size": 8, "feature_dim": 40}
        models = tuple(m.strip() for m in args.models.split(",") if m.strip())
        bad = [m for m in models if m not in MODEL_STAGES]
        if bad or not models:
            ap.error(f"--models: unknown entries {bad or args.models!r}; "
                     f"choose from {sorted(MODEL_STAGES)}")
        if len(set(models)) != len(models):
            ap.error(f"--models: duplicate entries in {args.models!r}")
        sweep = args.seeds is not None
        try:
            seed_list = ([int(s) for s in args.seeds.split(",") if s.strip()]
                         if sweep else [args.seed])
        except ValueError:
            ap.error(f"--seeds: expected comma-separated ints, got "
                     f"{args.seeds!r}")
        if sweep and not seed_list:
            # an empty $SEEDS expansion must not read as a successful sweep
            ap.error(f"--seeds: no seeds in {args.seeds!r}")
        if len(seed_list) != len(set(seed_list)):
            ap.error(f"--seeds: duplicate entries in {args.seeds!r}")

        try:
            augment = json.loads(args.augment) if args.augment else None
        except json.JSONDecodeError as e:
            ap.error(f"--augment: invalid JSON ({e})")

        def one_compare(seed: int, work: str) -> dict:
            index, wav_dir, lm_corpus, sr = (
                args.index, args.wav_dir, args.lm_corpus, args.sr)
            if args.synthetic:
                os.makedirs(work, exist_ok=True)
                # each seed draws its own corpus — the sweep varies corpus
                # AND training RNG together, like independent replications
                index, wav_dir, lm_corpus, _ = build_gain_corpus(
                    work, args.synthetic, seed=seed, hard=args.hard)
                sr = 8000
            return compare(index, wav_dir, work, args.hours, lm_corpus,
                           args.epochs, args.lm_epochs, args.batch, mdl=mdl,
                           lm_weight=args.lm_weight, seed=seed, sr=sr,
                           max_decode_steps=args.max_decode_steps,
                           seed_epochs=args.seed_epochs,
                           seed_its=args.seed_its,
                           labeled_utts=args.labeled_utts, models=models,
                           sae_listener_lr_scale=args.sae_listener_lr_scale,
                           augment=augment,
                           lm_target_steps=args.lm_target_steps)

        if not sweep:
            return one_compare(seed_list[0], args.work)
        from benchmarks.gain_stats import pool_seed_blocks

        per_seed = {}
        for k in seed_list:
            per_seed[f"seed{k}"] = one_compare(
                k, os.path.join(args.work, f"seed{k}"))
            print(f"--seeds: seed {k} done", file=sys.stderr, flush=True)
        pooled = pool_seed_blocks(sorted(per_seed.items(),
                                         key=lambda kv: int(kv[0][4:])),
                                  base=models[0])
        return {"per_seed": per_seed, "pooled": pooled}
    return smoke(args.work, args.epochs, model=args.model)


if __name__ == "__main__":
    main()
