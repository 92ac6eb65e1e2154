"""Char-LM teacher-forcing sweep CLI (reference src/lm_predict.py, with its
broken ``solver`` import — defect #8 — fixed by construction):

    python -m ss_asr_tpu.cli.lm_predict --config C --text "some sentence"

Sweeps tf_rate 0.0 .. 1.0 and prints per-rate next-char accuracy on the
probe text (thesis Table 6.3's methodology).
"""

from __future__ import annotations

import argparse

import yaml

from ss_asr_tpu.train import CHARLMTrainer
from ss_asr_tpu.train.solver import make_paras
from ss_asr_tpu.vocab import normalize_string


def _parse_bool(s: str) -> bool:
    """argparse type=bool is a trap: bool("False") is True."""
    return s.lower() not in ("false", "0", "no", "")


def main(argv=None):
    parser = argparse.ArgumentParser(prog="ss_asr_tpu.lm_predict")
    parser.add_argument("--name", type=str, default="newtest")
    parser.add_argument("--config", type=str, default="./conf/default.yaml")
    parser.add_argument("--logdir", type=str, default="runs/")
    parser.add_argument("--ckpdir", type=str, default="result/")
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--verbose", type=_parse_bool, default=True)
    parser.add_argument("--text", type=str, required=True)
    args = parser.parse_args(argv)

    with open(args.config, "r") as f:
        config = yaml.safe_load(f)
    paras = make_paras(args.name, args.logdir, args.ckpdir, args.seed, args.verbose)

    trainer = CHARLMTrainer(config, paras)
    trainer.load_data()
    trainer.set_model()

    text, _ = normalize_string(args.text, append_tokens=False)
    x, y = text[:-1], text[1:]
    print(y)
    for t in [0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1]:
        acc = trainer.predict(x, y, t)
        print(f"tf_rate={t}: {acc:.1f}%")


if __name__ == "__main__":
    main()
