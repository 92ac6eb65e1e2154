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
* A production serving stack the reference lacks entirely: jit-cached decode
  entry points, a dynamic-batching runtime on a bounded executable lattice
  (``ss_asr_tpu.serve``), fused waveform->text programs, mesh-sharded batch
  decoding, hot checkpoint reload, and an HTTP server (docs/SERVING.md).
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # Restore standard JAX env-var semantics: an external platform plugin's
    # boot hook (e.g. the axon TPU relay's sitecustomize) may have set the
    # jax_platforms *config* knob, which silently outranks the JAX_PLATFORMS
    # env var. When the plugin's backend hangs at init (relay down), that
    # override turns an explicit `JAX_PLATFORMS=cpu` run into a deadlock.
    # Re-assert the env var through the config knob; harmless no-op when the
    # two already agree or when backends are initialized.
    import jax as _jax

    try:
        if _jax.config.jax_platforms != _os.environ["JAX_PLATFORMS"]:
            _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

from ss_asr_tpu import vocab  # noqa: F401
