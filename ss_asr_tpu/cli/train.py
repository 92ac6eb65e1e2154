"""Training CLI with reference surface parity (src/train.py:13-71):

    python -m ss_asr_tpu.cli.train <type> <name> <config> [logdir] [ckpdir] \
        [--seed N] [--verbose]

``type`` accepts both the reference CLI's advertised names (LMTrainer,
AdvTrainer — its defect #2) and the actual class names, plus ``Seed``.
"""

from __future__ import annotations

import argparse
import random

import numpy as np
import yaml


def _parse_bool(s: str) -> bool:
    """argparse type=bool is a trap: bool("False") is True."""
    return s.lower() not in ("false", "0", "no", "")


def main(argv=None):
    parser = argparse.ArgumentParser(prog="ss_asr_tpu.train")
    parser.add_argument(
        "type",
        metavar="t",
        type=str,
        nargs="?",
        choices=[
            "ASRTrainer", "ASRTester", "LMTrainer", "CHARLMTrainer",
            "TAETrainer", "SAETrainer", "AdvTrainer", "ADVTrainer", "Seed",
        ],
        default="ASRTrainer",
        help="The type of training/testing to perform",
    )
    parser.add_argument("name", metavar="n", type=str, nargs="?", default="experiment_1")
    parser.add_argument("config", metavar="c", type=str, nargs="?", default="./conf/default.yaml")
    parser.add_argument("logdir", type=str, nargs="?", default="runs/")
    parser.add_argument("ckpdir", type=str, nargs="?", default="result/")
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--verbose", type=_parse_bool, default=True)
    paras = parser.parse_args(argv)

    with open(paras.config, "r") as f:
        config = yaml.safe_load(f)

    # Host-side RNG seeding; device-side randomness threads explicit PRNG keys
    random.seed(paras.seed)
    np.random.seed(paras.seed)

    # multi-host (DCN) runs: parallel: {distributed: true} brings up
    # jax.distributed before any backend query, so process_index/count drive
    # the per-host input shards and the global device mesh
    if (config.get("parallel") or {}).get("distributed"):
        import jax

        jax.distributed.initialize()

    from ss_asr_tpu.train import TRAINERS, asr_seed_train

    if paras.type == "Seed":
        asr_seed_train(config, paras)
    else:
        solver = TRAINERS[paras.type](config, paras)
        solver.load_data()
        solver.set_model()
        solver.exec()
        solver.close()


if __name__ == "__main__":
    main()
