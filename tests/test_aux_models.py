import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ss_asr_tpu.models import discriminator as disc
from ss_asr_tpu.models import las, speech_autoencoder as sae_mod, text_autoencoder as tae_mod
from ss_asr_tpu.vocab import VOCAB_SIZE

ASR_CFG = las.ASRConfig(encoder_state_size=8, decoder_state_size=8, mlp_out_size=8, feature_dim=40)
TAE_CFG = tae_mod.TAEConfig(emb_dim=6, state_size=8)  # 2*8 == asr enc_out_dim
SAE_CFG = sae_mod.SAEConfig(listener_out_dim=16)


def test_text_encoder_shape(rng):
    p = tae_mod.init_tae(jax.random.key(0), TAE_CFG)
    y = jnp.asarray(rng.integers(0, VOCAB_SIZE, (3, 11)).astype(np.int32))
    out = tae_mod.text_encode(p["encoder"], TAE_CFG, y, jnp.asarray([11, 7, 4]))
    assert out.shape == (3, 11, 2 * TAE_CFG.state_size)


def test_tae_forward_shares_asr_params(rng):
    asr_p = las.init_asr(jax.random.key(0), ASR_CFG)
    tae_p = tae_mod.init_tae(jax.random.key(1), TAE_CFG)
    B, L = 2, 9
    y = jnp.asarray(rng.integers(0, VOCAB_SIZE, (B, L + 1)).astype(np.int32))
    lens = jnp.asarray([L + 1, L - 2])
    noise_lens, logits = tae_mod.tae_forward(
        asr_p, tae_p, ASR_CFG, TAE_CFG, y, y, lens, L, jax.random.key(2), tf_rate=1.0
    )
    assert logits.shape == (B, L, VOCAB_SIZE)

    # gradient must flow into BOTH the TAE encoder and the shared ASR subtrees
    def loss_fn(asr_p, tae_p):
        _, lg = tae_mod.tae_forward(
            asr_p, tae_p, ASR_CFG, TAE_CFG, y, y, lens, L, jax.random.key(2), tf_rate=1.0
        )
        return jnp.mean(lg**2)

    g_asr, g_tae = jax.grad(loss_fn, argnums=(0, 1))(asr_p, tae_p)
    assert float(jnp.abs(g_tae["encoder"]["emb"]["table"]).sum()) > 0
    assert float(jnp.abs(g_asr["decoder"]["layer1"]["w_ih"]).sum()) > 0
    assert float(jnp.abs(g_asr["attention"]["psi"]["w"]).sum()) > 0
    # listener must receive NO gradient from TAE training
    assert float(jnp.abs(g_asr["encoder"]["pblstm1"]["fwd"]["w_ih"]).sum()) == 0


def test_sae_forward_shapes(rng):
    p, st = sae_mod.init_sae(jax.random.key(0), SAE_CFG)
    B, T, S = 2, 64, 8
    x = jnp.asarray(rng.standard_normal((B, T, 40)).astype(np.float32))
    lis = jnp.asarray(rng.standard_normal((B, S, 16)).astype(np.float32))
    out, new_st = sae_mod.sae_forward(p, st, SAE_CFG, x, lis, train=True)
    assert out.shape == (B, S * 8, 40)
    # bn state updated
    assert not np.allclose(
        np.asarray(new_st["conv1"]["mean"]), np.asarray(st["conv1"]["mean"])
    )


def test_sae_eval_uses_running_stats(rng):
    p, st = sae_mod.init_sae(jax.random.key(0), SAE_CFG)
    B, T, S = 2, 64, 8
    x = jnp.asarray(rng.standard_normal((B, T, 40)).astype(np.float32))
    lis = jnp.asarray(rng.standard_normal((B, S, 16)).astype(np.float32))
    out1, st1 = sae_mod.sae_forward(p, st, SAE_CFG, x, lis, train=False)
    assert jax.tree.all(jax.tree.map(lambda a, b: bool(jnp.all(a == b)), st, st1))


def test_sae_global_pool_from_reference_config():
    cfg = sae_mod.SAEConfig.from_dict(
        {
            "kernel_sizes": [[1, 36], [5, 1], [3, 1]],
            "num_filters": [32, 64, 256],
            "pool_kernel_sizes": [[3, 1], [5, 1], [2000, 40]],
            "listener_out_dim": 16,
        }
    )
    # the defective (2000, 40) pool is interpreted as a global pool
    assert cfg.pool_kernel_sizes[-1] == (-1, -1)
    assert cfg.enc_out_dim == 256


def test_discriminator_range(rng):
    cfg = disc.DiscriminatorConfig(in_dim=16, hidden_dim=8)
    p = disc.init_discriminator(jax.random.key(0), cfg)
    x = jnp.asarray(rng.standard_normal((3, 7, 16)).astype(np.float32))
    s = disc.discriminate(p, x)
    assert s.shape == (3, 7)
    assert np.all((np.asarray(s) > 0) & (np.asarray(s) < 1))
