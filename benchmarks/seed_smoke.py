"""Flagship-scale Seed pipeline smoke on real hardware.

Runs the full semi-supervised stack at production model size on a synthetic
tone corpus: char-LM is not needed; the pipeline is
TAE -> ADV -> SAE (asr_1 -> asr_2 -> asr_3 checkpoint relays,
src/trainer.py:1126-1177 semantics) followed by an ASRTrainer fine-tune of
the seeded ASR, asserting the relays exist, the optimizer states persist,
and the fine-tune loss decreases. Round-2 ran this by hand; this script
makes it a one-command artifact:

    python benchmarks/seed_smoke.py --work /tmp/seed_smoke \
        --out docs/SEED_SMOKE.json

CPU-sized variant (CI): --size tiny --n-utts 16 --epochs 1.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from benchmarks.quality_protocol import SIZES  # noqa: E402


def run(work: str, size: str, n_utts: int, epochs: int, seed: int,
        batch: int = 8) -> dict:
    from ss_asr_tpu.cli.mkdata import make_corpus
    from ss_asr_tpu.cli.preprocess import preprocess_generic
    from ss_asr_tpu.data.index import make_split
    from ss_asr_tpu.train import ASRTrainer, asr_seed_train, make_paras
    from ss_asr_tpu.utils import checkpoint as ckpt

    os.makedirs(work, exist_ok=True)
    corpus = os.path.join(work, "corpus")
    processed = os.path.join(work, "processed")
    make_corpus(corpus, n=n_utts, seed=seed)
    preprocess_generic(os.path.join(corpus, "txt"), os.path.join(corpus, "wav"),
                       processed_dir=processed, sr=8000)
    make_split(os.path.join(processed, "index.tsv"), seed=seed)
    train_index = os.path.join(processed, "train.tsv")
    eval_index = os.path.join(processed, "eval.tsv")

    mdl = {**SIZES[size], "tf_rate": 0.9, "feature_dim": 40}
    steps = {"n_epochs": epochs, "valid_step": 10**9, "logging_step": 20,
             "save_step": 10**9, "train_batch_size": batch,
             "valid_batch_size": batch, "t_bucket": 128, "l_bucket": 16,
             "train_index": train_index, "valid_index": eval_index}
    config = {
        "asr": {"opt": {"type": "Adadelta", "learning_rate": 1.0},
                "mdl": mdl, "test_index": eval_index, "wer_step": 10**9,
                **steps},
        "tae": {"opt": {"type": "Adam", "learning_rate": 1e-4},
                "mdl": {"state_size": mdl["encoder_state_size"],
                        "emb_dim": 128, "num_layers": 2},
                "drop_rate": 0.1, **steps},
        "sae": {"opt": {"type": "Adam", "learning_rate": 1e-4},
                "mdl": {"kernel_sizes": [[1, 36], [5, 1], [3, 1]],
                        "num_filters": [32, 64, 256],
                        "pool_kernel_sizes": [[3, 1], [5, 1], [2000, 40]]},
                **steps},
        "adv": {"G_opt": {"type": "Adadelta", "learning_rate": 1.0},
                "D_opt": {"type": "Adadelta", "learning_rate": 1.0},
                "mdl": {"hidden_dim": 256}, "label_smoothing": 0.1,
                "eval_index": eval_index, **steps},
        "seed_train": {"super_its": 1},
    }
    paras = make_paras(name="seed", logdir=os.path.join(work, "runs"),
                       ckpdir=os.path.join(work, "result"), seed=seed,
                       verbose=False)
    ckpdir = os.path.join(work, "result", "seed")

    # stage 0: a short supervised run creates asr_1 (the seed input)
    t0 = ASRTrainer(config, paras)
    t0.load_data(); t0.set_model(); t0.exec(); t0.close()
    import shutil

    shutil.copy(os.path.join(ckpdir, "asr.npz"), os.path.join(ckpdir, "asr_1.npz"))

    asr_seed_train(config, paras)

    out = {"relays": {}}
    for name in ("asr_1", "asr_2", "asr_3", "tae", "sae", "adv"):
        out["relays"][name] = os.path.exists(os.path.join(ckpdir, name + ".npz"))

    # fine-tune the seeded ASR: point the ASR trainer at asr_3
    shutil.copy(os.path.join(ckpdir, "asr_3.npz"), os.path.join(ckpdir, "asr.npz"))
    for f in ("asr_opt.npz",):  # seeded params -> fresh optimizer
        p = os.path.join(ckpdir, f)
        if os.path.exists(p):
            os.remove(p)
    losses = []
    import copy

    ft_config = copy.deepcopy(config)
    ft_config["asr"]["logging_step"] = 1  # the shared tracker's step has
    # advanced through the seed stages; log every step so losses register
    t1 = ASRTrainer(ft_config, paras)
    t1.load_data(); t1.set_model()
    orig_scalar = t1.lg.scalar
    t1.lg.scalar = lambda k, v, s: (losses.append(v) if k == "train_loss" else None)
    t1.lg.image = lambda *a, **kw: None
    t1.lg.text = lambda *a, **kw: None
    t1.exec(); t1.close()
    out["finetune_first_loss"] = losses[0] if losses else None
    out["finetune_last_loss"] = losses[-1] if losses else None
    out["finetune_decreased"] = bool(losses and losses[-1] < losses[0])
    out["config"] = {"size": size, "n_utts": n_utts, "epochs": epochs,
                     "seed": seed}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/ss_asr_seed_smoke")
    ap.add_argument("--size", choices=sorted(SIZES), default="flagship")
    ap.add_argument("--n-utts", type=int, default=160)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    result = run(args.work, args.size, args.n_utts, args.epochs, args.seed)
    line = json.dumps(result, indent=1)
    print(line)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
