"""The semi-supervised Seed pipeline: configurable stage chains.

Reference ``asr_seed_train`` (src/trainer.py:1126-1177) hardcodes
TAE -> ADV -> SAE super-iterations: each stage loads the previous stage's
mutated ASR checkpoint and writes its own (asr_1 -> asr_2 -> asr_3), after
which a normal ASRTrainer run fine-tunes the seeded ASR. That chain is the
default here and produces the identical file-relay layout, so runs stay
inspectable/resumable per stage; within a stage, sharing is in-memory
subtree sharing.

Beyond-reference: ``seed_train.stages`` selects the chain, enabling the
thesis' full model menu (Table 6.5, p. 82) turnkey — the reference repo
only ships the M4-shaped chain even though the thesis' best model is M5:

    M2 +TAE            stages: [tae]
    M3 +TAE+ADV        stages: [tae, adv]
    M4 +TAE+ADV+SAE    stages: [tae, adv, sae]   (the default)
    M5 +TAE+SAE        stages: [tae, sae]        (thesis best, Table 6.12)
    M6 +TAE+SAE+ADV    stages: [tae, sae, adv]

Defect #3 fix: the reference reads ``seed_train.its`` while its own config
ships ``super_its``; both keys are accepted.
"""

from __future__ import annotations

import os

from ss_asr_tpu.train.adv_trainer import ADVTrainer
from ss_asr_tpu.train.sae_trainer import SAETrainer
from ss_asr_tpu.train.tae_trainer import TAETrainer

_STAGES = ("tae", "adv", "sae")


def asr_seed_train(config, paras):
    ckpdir = os.path.join(paras.ckpdir, paras.name)
    seed_cfg = config.get("seed_train", {})
    its = seed_cfg.get("its", seed_cfg.get("super_its", 1))
    stages = [str(s).lower() for s in seed_cfg.get("stages", list(_STAGES))]
    unknown = [s for s in stages if s not in _STAGES]
    if unknown:
        raise ValueError(
            f"seed_train.stages: unknown stage(s) {unknown}; "
            f"valid: {list(_STAGES)}"
        )
    if "adv" in stages and "tae" not in stages[: stages.index("adv")]:
        raise ValueError(
            "seed_train.stages: 'adv' needs a 'tae' stage earlier in the "
            "chain — the discriminator's real data is the TAE text "
            "encoder's output (reference src/trainer.py:953-959)"
        )

    def relay(k):
        return os.path.join(ckpdir, f"asr_{k}.npz")

    for i in range(its):
        print(f"Starting Super Iteration {i + 1}")
        # the ASR relay: TAE mutates asr_1 in place; every later stage
        # reads the previous relay and writes the next (reference layout)
        cur, nxt = 1, 2
        tae_path = None
        for stage in stages:
            print(f"Starting {stage.upper()} training")
            if stage == "tae":
                solver = TAETrainer(config, paras)
                solver.load_data()
                solver.set_model(asrpath=(relay(cur), relay(cur)))
                solver.exec()
                solver.close()
                tae_path = solver.ckppath
            elif stage == "adv":
                solver = ADVTrainer(config, paras)
                solver.load_data()
                solver.set_model(taepath=tae_path,
                                 asrpath=(relay(cur), relay(nxt)))
                solver.exec()
                solver.close()
                cur, nxt = nxt, nxt + 1
            else:  # sae
                solver = SAETrainer(config, paras)
                solver.load_data()
                solver.set_model(asrpath=(relay(cur), relay(nxt)))
                solver.exec()
                solver.close()
                cur, nxt = nxt, nxt + 1
            del solver
