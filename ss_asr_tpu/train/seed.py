"""The semi-supervised Seed pipeline: TAE -> ADV -> SAE super-iterations.

Reference ``asr_seed_train`` (src/trainer.py:1126-1177): each stage loads the
previous stage's mutated ASR checkpoint and writes its own
(asr_1 -> asr_2 -> asr_3), after which a normal ASRTrainer run fine-tunes the
seeded ASR.  The file-relay artifact layout is preserved so runs are
inspectable/resumable per stage; within a stage, sharing is in-memory subtree
sharing.

Defect #3 fix: the reference reads ``seed_train.its`` while its own config
ships ``super_its``; both keys are accepted.
"""

from __future__ import annotations

import os

from ss_asr_tpu.train.adv_trainer import ADVTrainer
from ss_asr_tpu.train.sae_trainer import SAETrainer
from ss_asr_tpu.train.tae_trainer import TAETrainer


def asr_seed_train(config, paras):
    ckpdir = os.path.join(paras.ckpdir, paras.name)
    seed_cfg = config.get("seed_train", {})
    its = seed_cfg.get("its", seed_cfg.get("super_its", 1))
    asr_1 = os.path.join(ckpdir, "asr_1.npz")
    asr_2 = os.path.join(ckpdir, "asr_2.npz")
    asr_3 = os.path.join(ckpdir, "asr_3.npz")

    for i in range(its):
        print(f"Starting Super Iteration {i + 1}")

        print("Starting TAE training")
        tae_solver = TAETrainer(config, paras)
        tae_solver.load_data()
        tae_solver.set_model(asrpath=(asr_1, asr_1))
        tae_solver.exec()
        tae_solver.close()
        tae_path = tae_solver.ckppath
        del tae_solver

        print("Starting ADV training")
        adv_solver = ADVTrainer(config, paras)
        adv_solver.load_data()
        adv_solver.set_model(taepath=tae_path, asrpath=(asr_1, asr_2))
        adv_solver.exec()
        adv_solver.close()
        del adv_solver

        print("Starting SAE training")
        sae_solver = SAETrainer(config, paras)
        sae_solver.load_data()
        sae_solver.set_model(asrpath=(asr_2, asr_3))
        sae_solver.exec()
        sae_solver.close()
        del sae_solver
