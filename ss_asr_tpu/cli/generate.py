"""Char-LM text generation CLI (reference src/generate.py, with its broken
``solver`` import — defect #8 — fixed by construction):

    python -m ss_asr_tpu.cli.generate --name N --config C \
        [--start STR] [--length N] [--temp F]
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
    parser = argparse.ArgumentParser(prog="ss_asr_tpu.generate")
    parser.add_argument("--name", type=str, default="newtest")
    parser.add_argument("--config", type=str, default="./conf/default.yaml")
    parser.add_argument("--start", type=str, default="pétur helgi hefur aldrei ")
    parser.add_argument("--length", type=int, default=300)
    parser.add_argument("--temp", type=float, default=0.6)
    parser.add_argument("--logdir", type=str, default="runs/")
    parser.add_argument("--ckpdir", type=str, default="result/")
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--verbose", type=_parse_bool, default=True)
    args = parser.parse_args(argv)

    with open(args.config, "r") as f:
        config = yaml.safe_load(f)
    paras = make_paras(args.name, args.logdir, args.ckpdir, args.seed, args.verbose)

    trainer = CHARLMTrainer(config, paras)
    trainer.load_data()
    trainer.set_model()
    start, _ = normalize_string(args.start, append_tokens=False)
    print(trainer.generate(length=args.length, temp=args.temp, start=start))


if __name__ == "__main__":
    main()
