"""Impl-gate salt on the jitted decode entry points.

The module-level decode jits bake the rnn impl knobs into their traces;
``rnn.impl_salt()`` rides as a static arg so flipping a knob after a shape
has been traced re-traces instead of silently serving the stale
implementation (the knobs are the repo's documented runtime escape
hatches). Cancel-safety of the batching worker is covered here too since
it shares the review round."""

import threading

import jax
import numpy as np
import pytest

from ss_asr_tpu.decode import greedy
from ss_asr_tpu.models import las
from ss_asr_tpu.ops import rnn

CFG = las.ASRConfig(encoder_state_size=8, decoder_state_size=8,
                    mlp_out_size=8, feature_dim=40)


def test_impl_salt_invalidates_decode_cache(rng, monkeypatch):
    params = las.init_asr(jax.random.key(0), CFG)
    x = np.asarray(rng.standard_normal((2, 16, 40)), np.float32)
    lens = np.asarray([16, 12], np.int32)

    t0, _ = greedy.greedy_decode(params, CFG, x, lens, max_steps=6)
    traces0 = greedy._greedy_decode_jit._cache_size()

    # same shapes + statics, same knobs -> cache hit, no new trace
    greedy.greedy_decode(params, CFG, x, lens, max_steps=6)
    assert greedy._greedy_decode_jit._cache_size() == traces0

    # flip a knob -> the salt changes -> a NEW trace must happen
    monkeypatch.setattr(rnn, "LSTM_IMPL", "scan")
    t1, _ = greedy.greedy_decode(params, CFG, x, lens, max_steps=6)
    assert greedy._greedy_decode_jit._cache_size() > traces0
    # on CPU both gates resolve to the scan impl, so outputs agree
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))


def test_cancelled_future_does_not_kill_worker(rng):
    """A client cancel() racing the worker must not raise InvalidStateError
    inside the batcher thread (which would silently hang every later
    request) — futures are moved to RUNNING at dequeue."""
    from ss_asr_tpu.api import Transcriber
    from ss_asr_tpu.serve import BatchingTranscriber

    t = Transcriber(las.init_asr(jax.random.key(0), CFG), CFG, sr=8000,
                    max_steps=6, t_bucket=16)
    fb = rng.standard_normal((10, 40)).astype(np.float32)
    with BatchingTranscriber(t, max_batch=4, max_wait_ms=50) as bt:
        # hammer the race: submit + immediate cancel, concurrently with
        # legitimate requests
        futs = []
        for _ in range(6):
            f = bt.submit(fb)
            threading.Thread(target=f.cancel).start()
            futs.append(f)
        live = bt.submit(fb)
        assert isinstance(live.result(timeout=120), str)
        # worker is still alive and serving after the cancel storm
        again = bt.submit(fb)
        assert isinstance(again.result(timeout=120), str)
        for f in futs:
            if not f.cancelled():
                # uncancelled stragglers must still resolve normally
                assert isinstance(f.result(timeout=120), str)
            else:
                with pytest.raises(Exception):
                    f.result(timeout=0)
