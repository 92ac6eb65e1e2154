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


def make_config(paths: dict, mdl: dict, epochs: int, batch: int,
                lm_epochs: int, lm_chunk: int, lm_batch: int,
                seed_epochs: int = 2, seed_its: int = 1) -> dict:
    """Reference-default config (conf/default.yaml schema): Adadelta 1.0 for
    the ASR, Adam 1e-4 for the char LM (SURVEY.md §2.2). When
    ``paths["unlabeled_index"]`` is present, the TAE/SAE sections for the M5
    seed chain are emitted too (thesis Table 5.3 sizes scaled to ``mdl``):
    the autoencoders train on the UNLABELED pool — the thesis'
    semi-supervised setup uses all audio/text, the fine-tune only the
    labeled subset."""
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
        },
        "char_lm": {
            "opt": {"type": "Adam", "learning_rate": 1e-4},
            "mdl": {"hidden_size": 128, "embedding_size": 128, "tf_rate": 0.9},
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
        cfg["seed_train"] = {"super_its": seed_its, "stages": ["tae", "sae"]}
    return cfg


def run(index: str, wav_dir: str, work: str, hours: float | None,
        lm_corpus: str | None, epochs: int, lm_epochs: int, batch: int,
        mdl: dict | None = None, lm_chunk: int = 200, lm_batch: int = 128,
        lm_weight: float = 0.1, seed: int = 0, sr: int = 16000,
        max_decode_steps: int = 200, model: str = "m1",
        seed_epochs: int = 2, seed_its: int = 1) -> dict:
    """``model``: "m1" = supervised-only baseline (thesis Tables 6.6-6.10);
    "m5" = the thesis' best model — TAE -> SAE seed chain on the unlabeled
    pool, then supervised fine-tune on the labeled subset (Table 6.12)."""
    from ss_asr_tpu.cli.preprocess import preprocess_malromur
    from ss_asr_tpu.data.index import load_index, make_split, subset_by_t
    from ss_asr_tpu.train import ASRTrainer, CHARLMTrainer, make_paras
    from benchmarks.quality_protocol import eval_decode_modes

    if model not in ("m1", "m5"):
        raise ValueError(f"model must be 'm1' or 'm5', got {model!r}")

    os.makedirs(work, exist_ok=True)
    processed = os.path.join(work, "processed")

    # 1. preprocess (filters classification == 'correct', computes fbanks on
    #    device, writes the length-sorted index.tsv)
    idx_path = os.path.join(processed, "index.tsv")
    if not os.path.exists(idx_path):
        idx_path = preprocess_malromur(index, wav_dir, processed, sr=sr)
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

    # 3. LM corpus: Risamálheild-style plain text, or train transcripts
    if lm_corpus is None:
        lm_corpus = os.path.join(work, "lm_train_transcripts.txt")
        df = load_index(train_index)
        with open(lm_corpus, "w", encoding="utf-8") as f:
            f.write(" ".join(
                t.lstrip("<").rstrip(">") for t in df["normalized_text"]))

    paths = {"train_index": train_index, "eval_index": eval_index,
             "lm_corpus": lm_corpus}
    if model == "m5":
        # the autoencoders see the FULL training audio/text as the
        # unlabeled pool (the pre-subset index); fine-tune stays labeled
        paths["unlabeled_index"] = os.path.join(processed, "train.tsv")
    mdl = mdl or {"encoder_state_size": 256, "mlp_out_size": 128,
                  "decoder_state_size": 256, "feature_dim": 40}
    config = make_config(paths, mdl, epochs, batch, lm_epochs, lm_chunk,
                         lm_batch, seed_epochs=seed_epochs, seed_its=seed_its)
    paras = make_paras(name="malromur", logdir=os.path.join(work, "runs"),
                      ckpdir=os.path.join(work, "result"), seed=seed)

    # 4. train
    lm = CHARLMTrainer(config, paras)
    lm.load_data(); lm.set_model(); lm.exec(); lm.close()
    if model == "m5":
        # TAE -> SAE seed chain, then hand the seeded ASR to the
        # supervised fine-tune as its pretrained checkpoint
        import shutil

        from ss_asr_tpu.train import asr_seed_train

        asr_seed_train(config, paras)
        ckpdir = os.path.join(paras.ckpdir, paras.name)
        n_outs = sum(1 for s in config["seed_train"]["stages"] if s != "tae")
        seeded = os.path.join(ckpdir, f"asr_{1 + n_outs}.npz")
        shutil.copyfile(seeded, os.path.join(ckpdir, "asr.npz"))
    t = ASRTrainer(config, paras)
    t.load_data(); t.set_model(); t.exec(); t.close()

    # 5. decode eval set three ways (greedy / beam-8 / beam-8+LM), with
    #    acc/wer/cer per mode — the thesis-table protocol
    result = eval_decode_modes(config, paras, lm_weight,
                               max_steps=max_decode_steps)

    # 6. attach the thesis row this run should be compared against
    cond = str(hours) if hours else "full"
    cond = {"2.5": "2.5", "5.0": "5", "5": "5", "10.0": "10", "10": "10"}.get(cond, cond)
    result["thesis_target"] = THESIS_TARGETS.get(cond, THESIS_TARGETS["full"])
    result["condition"] = cond
    result["n_corpus_utts"] = n_total
    result["config"] = {"hours": hours, "epochs": epochs, "batch": batch,
                        "lm_weight": lm_weight, "seed": seed, "mdl": mdl,
                        "model": model}
    return result


# ---------------------------------------------------------------------------
# synthetic smoke: Málrómur CSV layout end to end
# ---------------------------------------------------------------------------

def build_smoke_corpus(work: str, n: int = 24, seed: int = 0):
    """Synthetic tone corpus written in Málrómur's exact layout: one CSV
    (utt id col 0, text col 5, classification col 7) + a wav directory.
    Every 5th row is classified != 'correct' and must be filtered out;
    one 'correct' row points at a missing wav (unreadable-wav skip,
    reference src/preprocess.py:169-173)."""
    import numpy as np

    from ss_asr_tpu.cli.mkdata import SR, WORDS, render, write_wav

    rng = np.random.default_rng(seed)
    wav_dir = os.path.join(work, "wav")
    os.makedirs(wav_dir, exist_ok=True)
    csv_path = os.path.join(work, "malromur_metadata.csv")
    n_correct = 0
    with open(csv_path, "w", encoding="utf-8") as f:
        for i in range(n):
            utt = f"is_is-malromur_smoke-{i:04d}"
            k = int(rng.integers(1, 3))
            text = " ".join(rng.choice(WORDS) for _ in range(k))
            cls = "correct" if i % 5 else "incorrect"
            if i != 7:  # row 7: correct but its wav is missing
                write_wav(os.path.join(wav_dir, utt + ".wav"),
                          render(text, rng), sr=SR)
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
    r.add_argument("--lm-corpus", default=None,
                   help="plain-text LM corpus (Risamálheild); default: train transcripts")
    r.add_argument("--epochs", type=int, default=30)
    r.add_argument("--lm-epochs", type=int, default=5)
    r.add_argument("--batch", type=int, default=32)
    r.add_argument("--lm-weight", type=float, default=0.1)
    r.add_argument("--seed", type=int, default=0)
    r.add_argument("--sr", type=int, default=16000)
    r.add_argument("--model", choices=["m1", "m5"], default="m1",
                   help="m1: supervised baseline; m5: TAE->SAE seed + "
                        "fine-tune (thesis best, Table 6.12)")
    r.add_argument("--seed-epochs", type=int, default=2,
                   help="epochs per TAE/SAE seed stage (m5)")
    r.add_argument("--seed-its", type=int, default=1,
                   help="seed super-iterations (m5)")
    r.add_argument("--out", default=None)

    s = sub.add_parser("smoke", help="synthetic Málrómur-layout end-to-end smoke")
    s.add_argument("--work", required=True)
    s.add_argument("--epochs", type=int, default=2)
    s.add_argument("--model", choices=["m1", "m5"], default="m1")
    s.add_argument("--out", default=None)

    args = ap.parse_args()
    if args.cmd == "run":
        result = run(args.index, args.wav_dir, args.work, args.hours,
                     args.lm_corpus, args.epochs, args.lm_epochs, args.batch,
                     lm_weight=args.lm_weight, seed=args.seed, sr=args.sr,
                     model=args.model, seed_epochs=args.seed_epochs,
                     seed_its=args.seed_its)
    else:
        result = smoke(args.work, args.epochs, model=args.model)
    line = json.dumps(result, indent=1)
    print(line)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
