"""Trainer registry with reference-CLI name parity.

The reference CLI advertises ``LMTrainer`` / ``AdvTrainer`` but defines
``CHARLMTrainer`` / ``ADVTrainer`` (its defect #2); both spellings dispatch
here.
"""

from ss_asr_tpu.train.adv_trainer import ADVTrainer
from ss_asr_tpu.train.asr_trainer import ASRTrainer
from ss_asr_tpu.train.lm_trainer import CHARLMTrainer
from ss_asr_tpu.train.sae_trainer import SAETrainer
from ss_asr_tpu.train.seed import asr_seed_train
from ss_asr_tpu.train.solver import Solver, make_paras
from ss_asr_tpu.train.tae_trainer import TAETrainer
from ss_asr_tpu.train.tester import ASRTester

TRAINERS = {
    "ASRTrainer": ASRTrainer,
    "ASRTester": ASRTester,
    "CHARLMTrainer": CHARLMTrainer,
    "LMTrainer": CHARLMTrainer,  # reference CLI spelling
    "TAETrainer": TAETrainer,
    "SAETrainer": SAETrainer,
    "ADVTrainer": ADVTrainer,
    "AdvTrainer": ADVTrainer,  # reference CLI spelling
}

__all__ = [
    "ADVTrainer",
    "ASRTester",
    "ASRTrainer",
    "CHARLMTrainer",
    "SAETrainer",
    "Solver",
    "TAETrainer",
    "TRAINERS",
    "asr_seed_train",
    "make_paras",
]
