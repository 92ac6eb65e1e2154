"""Test harness config: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding is validated the TPU-native way — ``jax.sharding.Mesh``
over ``--xla_force_host_platform_device_count=8`` CPU devices — so the suite
never needs (or touches) real TPU hardware.  This must run before jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# A sitecustomize hook may force-register an external TPU platform and
# override JAX_PLATFORMS; the config knob takes precedence over both.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is dominated by XLA compiles of
# scan-heavy train steps; caching them makes re-runs fast.  Write thresholds
# deliberately HIGH: a round-4 full-suite run segfaulted at ~97% inside
# jax's cache write (put_executable_and_time) while serializing the TP
# trainer program on a cold cache — only the genuinely expensive compiles
# are worth that risk, and every cheap compile recompiles in under the
# former write cost anyway.  SS_ASR_TEST_NO_CACHE=1 disables it entirely.
if not os.environ.get("SS_ASR_TEST_NO_CACHE"):
    _cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-process / TP / campaign-scale tests — the heavy tier. "
        "Fast tier: pytest -m 'not slow' (make test-fast).",
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def write_asr_corpus(dirpath, texts, feature_dim, t0=24, dt=2, scale=1.0, seed=0):
    """Write a tiny synthetic ASR corpus (fake fbanks + index.tsv) and
    return the index path. Shared by the trainer/data test fixtures — the
    index schema lives in ONE place (reference schema: normalized_text,
    fbank_path, s_len, num_frames, text_fname, wav_fname)."""
    from ss_asr_tpu.vocab import normalize_string

    rng_ = np.random.default_rng(seed)
    fdir = dirpath / "fbanks"
    fdir.mkdir(exist_ok=True)
    rows = []
    for i, t in enumerate(texts):
        T = t0 + dt * i
        fb = (scale * rng_.standard_normal((T, feature_dim))).astype(np.float32)
        p = str(fdir / f"u{i}.npy")
        np.save(p, fb)
        norm, s_len = normalize_string(t)
        rows.append((norm, p, s_len, T, "na", f"u{i}.wav"))
    rows.sort(key=lambda r: r[3])
    idx = str(dirpath / "index.tsv")
    with open(idx, "w", encoding="utf-8") as f:
        for r in rows:
            f.write("\t".join(str(a) for a in r) + "\n")
    return idx
