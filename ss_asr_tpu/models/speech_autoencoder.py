"""Speech autoencoder: global conv encoder + per-listener-frame MLP decoder.

Parity with reference src/speech_autoencoder.py: a 3-stage Conv+BN+ReLU+MaxPool
"global" encoder squeezes a whole utterance's fbank into one 256-d vector; the
decoder MLP maps [global_vec | one listener frame] to 8 reconstructed fbank
frames; concatenating over listener steps yields [B, 8*(T/8), feat] which is
scored (smooth-L1) against the input fbank.  Training it also updates the
ASR's listener (src/trainer.py:790-794).

Deviations from the reference, both deliberate:

* The reference's final MaxPool uses a fixed (2000, 40) kernel that is larger
  than any real post-conv feature map and would crash torch
  (src/speech_autoencoder.py:108, conf/default.yaml:30); the evident intent is
  a *global* max pool, which is what we do.
* The per-listener-step Python loop (src/speech_autoencoder.py:63-87) is
  vectorized: broadcast-concat + one batched MLP over all steps — one MXU
  matmul instead of ~T/8 small ones.

BatchNorm runs on batch statistics during training; running averages are
carried in a separate ``state`` pytree for eval.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ss_asr_tpu.ops import rnn

Params = Dict


@dataclasses.dataclass(frozen=True)
class SAEConfig:
    feature_dim: int = 40
    listener_out_dim: int = 512
    kernel_sizes: Tuple[Tuple[int, int], ...] = ((1, 36), (5, 1), (3, 1))
    num_filters: Tuple[int, ...] = (32, 64, 256)
    pool_kernel_sizes: Tuple[Tuple[int, int], ...] = ((3, 1), (5, 1), (-1, -1))
    frames_per_step: int = 8  # listener time reduction

    @property
    def enc_out_dim(self) -> int:
        return self.num_filters[-1]

    @classmethod
    def from_dict(cls, d: dict) -> "SAEConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        d = {k: v for k, v in d.items() if k in known}
        for k in ("kernel_sizes", "pool_kernel_sizes"):
            if k in d:
                d[k] = tuple(tuple(v) for v in d[k])
        if "num_filters" in d:
            d["num_filters"] = tuple(d["num_filters"])
        # the reference's (2000, 40) final pool means "global pool"
        pks = list(d.get("pool_kernel_sizes", cls.pool_kernel_sizes))
        if pks and (pks[-1][0] >= 1000 or pks[-1] == (-1, -1)):
            pks[-1] = (-1, -1)
        d["pool_kernel_sizes"] = tuple(pks)
        return cls(**d)


def init_sae(key: jax.Array, cfg: SAEConfig) -> Tuple[Params, Params]:
    """Returns (params, bn_state)."""
    ks = jax.random.split(key, 7)
    params: Params = {"encoder": {}, "decoder": {}}
    state: Params = {}
    in_ch = 1
    for i, (ksz, nf) in enumerate(zip(cfg.kernel_sizes, cfg.num_filters)):
        kh, kw = ksz
        fan_in = in_ch * kh * kw
        params["encoder"][f"conv{i + 1}"] = {
            # HWIO kernel layout (NHWC convs are TPU-native)
            "w": rnn.lecun_normal(ks[i], (kh, kw, in_ch, nf), fan_in),
            "bn_scale": jnp.ones((nf,), jnp.float32),
            "bn_bias": jnp.zeros((nf,), jnp.float32),
        }
        state[f"conv{i + 1}"] = {
            "mean": jnp.zeros((nf,), jnp.float32),
            "var": jnp.ones((nf,), jnp.float32),
        }
        in_ch = nf
    d_in = cfg.enc_out_dim + cfg.listener_out_dim
    d_out = cfg.frames_per_step * cfg.feature_dim
    params["decoder"] = {
        "fc1": rnn.init_linear(ks[4], d_in, d_in),
        "fc2": rnn.init_linear(ks[5], d_in, d_in),
        "fc3": rnn.init_linear(ks[6], d_in, d_out),
    }
    return params, state


def _max_pool(x: jax.Array, kh: int, kw: int) -> jax.Array:
    """NHWC max pool, stride == kernel (torch MaxPool2d default)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, kh, kw, 1),
        padding="VALID",
    )


def _batchnorm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    stats: Dict,
    train: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
) -> Tuple[jax.Array, Dict]:
    if train:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
        new_stats = {
            "mean": (1 - momentum) * stats["mean"] + momentum * mean,
            "var": (1 - momentum) * stats["var"] + momentum * var,
        }
    else:
        mean, var = stats["mean"], stats["var"]
        new_stats = stats
    y = (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    return y, new_stats


def speech_encode(
    params: Params, state: Params, cfg: SAEConfig, x: jax.Array, train: bool
) -> Tuple[jax.Array, Params]:
    """[B, T, feat] fbank -> ([B, enc_out_dim] global vector, new bn state)."""
    h = x[:, :, :, None]  # NHWC: [B, T, F, 1]
    new_state: Params = {}
    n = len(cfg.kernel_sizes)
    for i in range(n):
        p = params["encoder"][f"conv{i + 1}"]
        h = jax.lax.conv_general_dilated(
            h,
            p["w"],
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        h, new_state[f"conv{i + 1}"] = _batchnorm(
            h, p["bn_scale"], p["bn_bias"], state[f"conv{i + 1}"], train
        )
        h = jax.nn.relu(h)
        kh, kw = cfg.pool_kernel_sizes[i]
        if kh == -1:  # global pool over all remaining spatial positions
            h = jnp.max(h, axis=(1, 2), keepdims=True)
        else:
            h = _max_pool(h, kh, kw)
    return h.reshape(h.shape[0], -1), new_state


def speech_decode(params: Params, cfg: SAEConfig, z: jax.Array) -> jax.Array:
    """[..., enc+listener] -> [..., frames_per_step * feature_dim] MLP."""
    h = jax.nn.leaky_relu(rnn.linear(params["decoder"]["fc1"], z), 0.01)
    h = jax.nn.leaky_relu(rnn.linear(params["decoder"]["fc2"], h), 0.01)
    return rnn.linear(params["decoder"]["fc3"], h)


def sae_forward(
    params: Params,
    state: Params,
    cfg: SAEConfig,
    x: jax.Array,
    listener_out: jax.Array,
    train: bool = True,
) -> Tuple[jax.Array, Params]:
    """Reconstruct fbank frames from [global encoding | listener steps].

    x: [B, T, feat]; listener_out: [B, S, listener_out_dim].
    Returns ([B, S * frames_per_step, feat] reconstruction, new bn state).
    """
    B, S, _ = listener_out.shape
    g, new_state = speech_encode(params, state, cfg, x, train)
    g_tiled = jnp.broadcast_to(g[:, None, :], (B, S, g.shape[-1]))
    z = jnp.concatenate([listener_out, g_tiled], axis=-1)  # [B, S, L+E]
    out = speech_decode(params, cfg, z)  # [B, S, 8*feat] — one batched MLP
    out = out.reshape(B, S * cfg.frames_per_step, cfg.feature_dim)
    return out, new_state
