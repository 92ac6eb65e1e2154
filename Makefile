# Convenience entry points. The framework itself needs no build step
# (pure Python; the native C helpers compile on demand under
# ss_asr_tpu/native/build/).

.PHONY: test test-fast bench parity-when-available

# Two pytest processes, not one: compiling the TP trainer executable on
# the CPU backend after ~40 modules of accumulated in-process state
# segfaults inside jaxlib (three reproductions, three different native
# crash sites — cache serialize twice, backend_compile once); each tier
# is green standalone. tests/test_trainer_dp.py documents the analysis.
test:
	python -m pytest tests/ -x -q -m "not slow"
	python -m pytest tests/ -x -q -m slow

# fast tier: everything except the multi-process / TP trainer heavyweights
# (marked `slow`); keeps the edit loop under a few minutes
test-fast:
	python -m pytest tests/ -x -q -m "not slow"

bench:
	python bench.py --full

# The three environment-blocked parity measurements (round-3 VERDICT #7):
# each is one command, fails fast if the environment still lacks the
# ingredient, and lands the numbers with zero new code the moment it
# appears.
#   1. real Málrómur -> thesis-table numbers   (needs the corpus download;
#      set MALROMUR_INDEX / MALROMUR_WAVS / LM_CORPUS)
#   2. librosa-0.6 golden frontend fixture      (needs librosa in the env;
#      the test self-skips without it — see tests/test_frontend.py)
#   3. physical multi-chip weak scaling         (needs >1 real chip; writes
#      the on_chip section of docs/ICI_SCALING.json)
parity-when-available:
	python benchmarks/malromur_parity.py run \
	  --index $${MALROMUR_INDEX:?set MALROMUR_INDEX to the corpus CSV} \
	  --wav-dir $${MALROMUR_WAVS:?set MALROMUR_WAVS} \
	  --work /tmp/malromur_parity --hours 10 \
	  --lm-corpus $${LM_CORPUS:?set LM_CORPUS (Risamalheild-style text)} \
	  --epochs 30 --out docs/MALROMUR_PARITY.json
	python -m pytest tests/test_frontend.py::test_librosa_golden_fixture -q
	python benchmarks/ici_scaling.py
