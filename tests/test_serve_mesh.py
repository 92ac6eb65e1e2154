"""Mesh-sharded serving: batch rows decode data-parallel across a device
mesh (Transcriber(mesh=...)) with transcripts identical to single-device.

Runs on the virtual 8-CPU mesh (conftest pins the device count); on real
hardware the same program shards over ICI. The reference has no serving,
let alone multi-device serving (src/trainer.py:587-591 is a serial loop).
"""

import jax
import numpy as np
import pytest

from ss_asr_tpu.api import Transcriber
from ss_asr_tpu.models import las
from ss_asr_tpu.serve import BatchingTranscriber

CFG = las.ASRConfig(encoder_state_size=8, decoder_state_size=8,
                    mlp_out_size=8, feature_dim=40)


def _mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device CPU mesh (conftest XLA_FLAGS)")
    return jax.sharding.Mesh(np.array(devs[:8]), ("data",))


def _pair(seed=0, **kw):
    params = las.init_asr(jax.random.key(seed), CFG)
    kw.setdefault("max_steps", 8)
    kw.setdefault("t_bucket", 16)
    single = Transcriber(params, CFG, sr=8000, **kw)
    sharded = Transcriber(params, CFG, sr=8000, mesh=_mesh(), **kw)
    return single, sharded


def test_mesh_greedy_matches_single(rng):
    single, sharded = _pair()
    fbanks = [rng.standard_normal((10 + 2 * i, 40)).astype(np.float32)
              for i in range(5)]  # 5 rows -> mesh pads to 8
    assert sharded.transcribe_fbank(list(fbanks)) == \
        single.transcribe_fbank(list(fbanks))


def test_mesh_signal_batch_matches_single(rng):
    single, sharded = _pair(seed=1)
    sigs = [0.1 * rng.standard_normal(n).astype(np.float32)
            for n in (3000, 4500, 6000)]
    assert sharded.transcribe_signal_batch(list(sigs), sr=8000) == \
        single.transcribe_signal_batch(list(sigs), sr=8000)


def test_mesh_beam_matches_single(rng):
    single, sharded = _pair(seed=2, beam_size=3)
    fbanks = [rng.standard_normal((12, 40)).astype(np.float32)
              for _ in range(3)]
    assert sharded.transcribe_fbank(list(fbanks)) == \
        single.transcribe_fbank(list(fbanks))


def test_mesh_batching_server(rng):
    single, sharded = _pair(seed=3)
    fb = rng.standard_normal((14, 40)).astype(np.float32)
    with BatchingTranscriber(sharded, max_batch=4, max_wait_ms=100) as bt:
        futs = [bt.submit(fb) for _ in range(4)]
        got = [f.result(timeout=300) for f in futs]
    assert got == single.transcribe_fbank([fb] * 4)


def test_mesh_requires_data_axis():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = jax.sharding.Mesh(np.array(devs[:8]), ("model",))
    with pytest.raises(ValueError, match="data"):
        Transcriber(las.init_asr(jax.random.key(0), CFG), CFG, mesh=mesh)
