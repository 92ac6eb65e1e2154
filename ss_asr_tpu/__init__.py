"""ss_asr_tpu — a TPU-native (JAX / XLA / Pallas / pjit) semi-supervised seq2seq ASR framework.

A from-scratch rebuild of the capabilities of cadia-lvl/ss_asr (Listen-Attend-Spell
for Icelandic with text-autoencoder / speech-autoencoder / adversarial auxiliary
training and char-LM shallow fusion), designed TPU-first:

* All recurrences (pyramidal BiLSTM listener, LSTM speller, GRU char-LM) run as
  ``lax.scan`` / ``lax.while_loop`` programs with static shapes, or as fused Pallas
  kernels on the hot paths.
* One parameter pytree per model family; cross-model parameter sharing (the text
  autoencoder borrowing the speller, the speech autoencoder borrowing the listener)
  is literal subtree sharing instead of the reference's checkpoint-file relays.
* Data parallelism is a first-class ``jax.sharding.Mesh`` axis with XLA collectives
  over ICI; single chip is the degenerate mesh of one.
* The frontend (wav -> log-mel filterbank) is a jitted JAX pipeline with a Pallas
  fused post-FFT kernel, replacing the reference's offline librosa pass
  (reference: src/preprocess.py:187-208).
"""

__version__ = "0.1.0"

from ss_asr_tpu import vocab  # noqa: F401
