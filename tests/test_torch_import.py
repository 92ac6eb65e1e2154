"""Numerical parity for the reference-checkpoint importer.

Each test builds a torch module whose ``state_dict()`` has EXACTLY the
reference's key structure (src/asr.py, src/charlm.py, src/text_autoencoder.py,
src/speech_autoencoder.py, src/discriminator.py — attribute names reproduced,
bodies written fresh with the intended semantics), runs the torch forward,
converts the state_dict with ``utils.torch_import``, runs our forward on the
same inputs, and compares.

The one conscious divergence: the reference's 4th listener LSTM omits
``batch_first`` and recurs over the batch axis (src/asr.py:237, an evident
defect we fixed — models/las.py:7-9); the torch replica here uses
``batch_first=True`` (the intended semantics), matching our build.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ss_asr_tpu.models import charlm as charlm_mod  # noqa: E402
from ss_asr_tpu.models import discriminator as disc_mod  # noqa: E402
from ss_asr_tpu.models import las  # noqa: E402
from ss_asr_tpu.models import speech_autoencoder as sae_mod  # noqa: E402
from ss_asr_tpu.models import text_autoencoder as tae_mod  # noqa: E402
from ss_asr_tpu.utils import torch_import as ti  # noqa: E402

ATOL = 2e-4


def _np(x):
    return np.asarray(x)


def _sd(module: nn.Module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


# ---------------------------------------------------------------------------
# Torch replicas with the reference's state_dict key structure
# ---------------------------------------------------------------------------

class _PBLSTM(nn.Module):  # pBLSTM wraps its LSTM in ``self.layer``
    def __init__(self, in_dim, h):
        super().__init__()
        self.layer = nn.LSTM(in_dim, h, bidirectional=True, batch_first=True)

    @staticmethod
    def down(x):
        b, t, f = x.shape
        t2 = (t // 2) * 2
        return x[:, :t2].reshape(b, t2 // 2, 2 * f)

    def forward(self, x):
        y, _ = self.layer(x)
        return self.down(y)


class _Listener(nn.Module):
    def __init__(self, feat, h):
        super().__init__()
        self.blstm_1 = _PBLSTM(feat, h)
        self.blstm_2 = _PBLSTM(4 * h, h)
        self.blstm_3 = _PBLSTM(4 * h, h)
        self.blstm_4 = nn.LSTM(4 * h, h, bidirectional=True, batch_first=True)

    def forward(self, x):
        x = self.blstm_3(self.blstm_2(self.blstm_1(x)))
        y, _ = self.blstm_4(x)
        return y


class _Attention(nn.Module):
    def __init__(self, mlp, enc_out, dec):
        super().__init__()
        self.phi = nn.Linear(dec, mlp, bias=False)
        self.psi = nn.Linear(enc_out, mlp)


class _Speller(nn.Module):
    def __init__(self, dec, enc_out):
        super().__init__()
        self.layer_1 = nn.LSTMCell(dec + enc_out, dec)
        self.layer_2 = nn.LSTMCell(dec, dec)


class _RefASR(nn.Module):
    def __init__(self, feat=40, enc=32, dec=32, mlp=16, vocab=50):
        super().__init__()
        self.encoder = _Listener(feat, enc)
        self.attention = _Attention(mlp, 2 * enc, dec)
        self.decoder = _Speller(dec, 2 * enc)
        self.embed = nn.Embedding(vocab, dec)
        self.char_trans = nn.Linear(dec, vocab)
        self.dec_size = dec

    def forward(self, x, teacher):
        """Teacher-forced (tf=1.0) forward; returns [B, L, V] logits."""
        h = self.encoder(x)
        comp_h = torch.tanh(self.attention.psi(h))
        B, Lp1 = teacher.shape
        L = Lp1 - 1
        s1 = (x.new_zeros(B, self.dec_size), x.new_zeros(B, self.dec_size))
        s2 = (x.new_zeros(B, self.dec_size), x.new_zeros(B, self.dec_size))
        last = self.embed(torch.zeros(B, dtype=torch.long))
        outs = []
        for t in range(L):
            q = torch.tanh(self.attention.phi(s1[0]))
            energy = torch.einsum("bsm,bm->bs", comp_h, q)
            score = torch.softmax(energy, dim=-1)
            ctx = torch.einsum("bs,bsf->bf", score, h)
            s1 = self.decoder.layer_1(torch.cat([last, ctx], dim=-1), s1)
            s2 = self.decoder.layer_2(s1[0], s2)
            logit = self.char_trans(s2[0])
            outs.append(logit)
            last = self.embed(teacher[:, t + 1])
        return torch.stack(outs, dim=1)


class _RefCharLM(nn.Module):
    def __init__(self, vocab=50, h=24):
        super().__init__()
        self.emb = nn.Embedding(vocab, h)
        self.layer_1 = nn.GRUCell(h, h)
        self.layer_2 = nn.GRUCell(h, h)
        self.out = nn.Linear(h, vocab)

    def forward(self, ids):
        B, L = ids.shape
        h1 = torch.zeros(B, self.out.in_features)
        h2 = torch.zeros(B, self.out.in_features)
        outs = []
        for t in range(L):
            x = self.emb(ids[:, t])
            h1 = self.layer_1(x, h1)
            h2 = self.layer_2(h1, h2)
            outs.append(self.out(h2))
        return torch.stack(outs, dim=1)


class _RefTextEncoder(nn.Module):
    def __init__(self, vocab=50, emb=16, h=24):
        super().__init__()
        self.emb = nn.Embedding(vocab, emb)
        self.blstm = nn.LSTM(emb, h, num_layers=2, bidirectional=True,
                             batch_first=True)

    def forward(self, ids):
        y, _ = self.blstm(self.emb(ids))
        return y


class _RefTAE(nn.Module):
    def __init__(self, **kw):
        super().__init__()
        self.encoder = _RefTextEncoder(**kw)


class _RefSpeechEncoder(nn.Module):
    def __init__(self, ks, nf, pool_ks):
        super().__init__()
        chans = [1] + nf
        for i in range(3):
            setattr(self, f"conv_{i + 1}", nn.Sequential(
                nn.Conv2d(chans[i], nf[i], kernel_size=tuple(ks[i]),
                          padding=0, bias=False),
                nn.BatchNorm2d(nf[i]),
                nn.ReLU(),
                nn.MaxPool2d(tuple(pool_ks[i])),
            ))

    def forward(self, x):
        return self.conv_3(self.conv_2(self.conv_1(x)))


class _RefSpeechDecoder(nn.Module):
    def __init__(self, in_dim, out_dim):
        super().__init__()
        self.core = nn.Sequential(
            nn.Linear(in_dim, in_dim), nn.LeakyReLU(),
            nn.Linear(in_dim, in_dim), nn.LeakyReLU(),
            nn.Linear(in_dim, out_dim))

    def forward(self, z):
        return self.core(z)


class _RefSAE(nn.Module):
    def __init__(self, ks, nf, pool_ks, dec_in, dec_out):
        super().__init__()
        self.encoder = _RefSpeechEncoder(ks, nf, pool_ks)
        self.decoder = _RefSpeechDecoder(dec_in, dec_out)


class _RefDiscriminator(nn.Module):
    def __init__(self, in_dim=64, hidden=32):
        super().__init__()
        self.core = nn.Sequential(
            nn.Linear(in_dim, hidden), nn.ReLU(),
            nn.Linear(hidden, hidden), nn.ReLU(),
            nn.Linear(hidden, 1))

    def forward(self, x):
        return torch.sigmoid(self.core(x))


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------

def test_asr_import_forward_parity():
    torch.manual_seed(0)
    ref = _RefASR().eval()
    cfg = las.ASRConfig(encoder_state_size=32, decoder_state_size=32,
                        mlp_out_size=16, tf_rate=1.0)
    params = ti.import_asr(_sd(ref))

    B, T, L = 3, 32, 7
    x = np.random.RandomState(1).randn(B, T, 40).astype(np.float32)
    teacher = np.random.RandomState(2).randint(0, 50, size=(B, L + 1))
    teacher[:, 0] = 0

    with torch.no_grad():
        want = _np(ref(torch.from_numpy(x), torch.from_numpy(teacher)))

    _, logits, _ = las.asr_forward(
        params, cfg, jnp.asarray(x), jnp.full((B,), T),
        decode_step=L, teacher=jnp.asarray(teacher),
        key=jax.random.PRNGKey(0), tf_rate=1.0,
    )
    np.testing.assert_allclose(_np(logits), want, atol=ATOL, rtol=1e-3)


def test_charlm_import_parity():
    torch.manual_seed(1)
    ref = _RefCharLM().eval()
    cfg = charlm_mod.CharLMConfig(hidden_size=24)
    params = ti.import_charlm(_sd(ref))

    B, L = 4, 11
    ids = np.random.RandomState(3).randint(0, 50, size=(B, L))
    with torch.no_grad():
        want = _np(ref(torch.from_numpy(ids)))

    state = charlm_mod.init_state(B, cfg)
    outs = []
    for t in range(L):
        logit, state = charlm_mod.step(params, jnp.asarray(ids[:, t]), state)
        outs.append(_np(logit))
    np.testing.assert_allclose(np.stack(outs, axis=1), want, atol=ATOL, rtol=1e-3)


def test_tae_import_parity():
    torch.manual_seed(2)
    ref = _RefTAE().eval()
    cfg = tae_mod.TAEConfig(emb_dim=16, state_size=24)
    params = ti.import_tae(_sd(ref))

    B, S = 3, 9
    ids = np.random.RandomState(4).randint(0, 50, size=(B, S))
    with torch.no_grad():
        want = _np(ref.encoder(torch.from_numpy(ids)))

    got = tae_mod.text_encode(params["encoder"], cfg, jnp.asarray(ids))
    np.testing.assert_allclose(_np(got), want, atol=ATOL, rtol=1e-3)


def test_sae_import_parity():
    torch.manual_seed(3)
    ks = [[1, 8], [5, 1], [3, 1]]
    nf = [8, 12, 16]
    pool_ks = [[3, 1], [5, 1], [4, 9]]  # sized so conv3 output is 1x1 spatial
    cfg = sae_mod.SAEConfig(kernel_sizes=tuple(map(tuple, ks)),
                            num_filters=tuple(nf),
                            pool_kernel_sizes=tuple(map(tuple, pool_ks)),
                            feature_dim=16, listener_out_dim=20,
                            frames_per_step=2)
    dec_in = 16 + 20
    dec_out = 2 * 16
    ref = _RefSAE(ks, nf, pool_ks, dec_in, dec_out).eval()
    # non-trivial running stats (fresh BN has mean 0 / var 1)
    with torch.no_grad():
        for i in (1, 2, 3):
            bn = getattr(ref.encoder, f"conv_{i}")[1]
            bn.running_mean.uniform_(-0.5, 0.5)
            bn.running_var.uniform_(0.5, 1.5)

    params, bn_state = ti.import_sae(_sd(ref))

    B, T, F = 2, 130, 16
    x = np.random.RandomState(5).randn(B, T, F).astype(np.float32)
    with torch.no_grad():
        want_enc = _np(ref.encoder(torch.from_numpy(x)[:, None, :, :]))
    want_enc = want_enc.reshape(B, -1)

    got_enc, _ = sae_mod.speech_encode(params, bn_state, cfg,
                                       jnp.asarray(x), train=False)
    np.testing.assert_allclose(_np(got_enc), want_enc, atol=ATOL, rtol=1e-3)

    z = np.random.RandomState(6).randn(B, 5, dec_in).astype(np.float32)
    with torch.no_grad():
        want_dec = _np(ref.decoder(torch.from_numpy(z)))
    got_dec = sae_mod.speech_decode(params, cfg, jnp.asarray(z))
    np.testing.assert_allclose(_np(got_dec), want_dec, atol=ATOL, rtol=1e-3)


def test_discriminator_import_parity():
    torch.manual_seed(4)
    ref = _RefDiscriminator().eval()
    params = ti.import_discriminator(_sd(ref))

    x = np.random.RandomState(7).randn(3, 6, 64).astype(np.float32)
    with torch.no_grad():
        want = _np(ref(torch.from_numpy(x)))
    got = disc_mod.discriminate(params, jnp.asarray(x))
    np.testing.assert_allclose(_np(got), want.squeeze(-1), atol=ATOL, rtol=1e-3)


def test_export_import_roundtrip():
    key = jax.random.PRNGKey(0)
    asr = las.init_asr(key, las.ASRConfig())
    back = ti.import_asr(ti.export_asr(asr))
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, _np(b), atol=1e-6),
                 jax.tree.map(_np, asr), back)

    lm = charlm_mod.init_charlm(key, charlm_mod.CharLMConfig())
    back = ti.import_charlm(ti.export_charlm(lm))
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, _np(b), atol=1e-6),
                 jax.tree.map(_np, lm), back)

    tae = tae_mod.init_tae(key, tae_mod.TAEConfig())
    back = ti.import_tae(ti.export_tae(tae))
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, _np(b), atol=1e-6),
                 jax.tree.map(_np, tae), back)

    sae_p, sae_s = sae_mod.init_sae(key, sae_mod.SAEConfig())
    back_p, back_s = ti.import_sae(ti.export_sae(sae_p, sae_s))
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, _np(b), atol=1e-6),
                 jax.tree.map(_np, sae_p), back_p)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, _np(b), atol=1e-6),
                 jax.tree.map(_np, sae_s), back_s)

    d = disc_mod.init_discriminator(key, disc_mod.DiscriminatorConfig())
    back = ti.import_discriminator(ti.export_discriminator(d))
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, _np(b), atol=1e-6),
                 jax.tree.map(_np, d), back)


def test_detect_module():
    torch.manual_seed(5)
    assert ti.detect_module(_sd(_RefASR())) == "asr"
    assert ti.detect_module(_sd(_RefCharLM())) == "char_lm"
    assert ti.detect_module(_sd(_RefTAE())) == "tae"
    assert ti.detect_module(
        _sd(_RefSAE([[1, 8], [5, 1], [3, 1]], [8, 12, 16],
                    [[3, 1], [5, 1], [4, 9]], 36, 32))) == "sae"
    assert ti.detect_module(_sd(_RefDiscriminator())) == "adv"


def test_import_checkpoint_file(tmp_path):
    torch.manual_seed(6)
    ref = _RefCharLM()
    p = tmp_path / "char_lm.cpt"
    torch.save(ref.state_dict(), p)
    mid, tree = ti.import_checkpoint(str(p))
    assert mid == "char_lm"
    assert set(tree) == {"emb", "gru1", "gru2", "out"}

    # relay names keep their stem; mismatched forced module raises
    ref_asr = _RefASR()
    p2 = tmp_path / "asr_1.cpt"
    torch.save(ref_asr.state_dict(), p2)
    mid2, _ = ti.import_checkpoint(str(p2))
    assert mid2 == "asr_1"
    # a filename that contradicts the state_dict's contents is caught
    p3 = tmp_path / "sae.cpt"
    torch.save(ref.state_dict(), p3)  # char_lm weights under an sae name
    with pytest.raises(ValueError):
        ti.import_checkpoint(str(p3))


def test_import_ckpt_cli_roundtrip(tmp_path):
    """Directory conversion + reverse export through the CLI."""
    from ss_asr_tpu.cli import import_ckpt as cli
    from ss_asr_tpu.utils import checkpoint as ckpt

    torch.manual_seed(7)
    src = tmp_path / "ref_run"
    src.mkdir()
    lm = _RefCharLM()
    torch.save(lm.state_dict(), src / "char_lm.cpt")
    torch.save(_RefASR().state_dict(), src / "asr_best.cpt")
    (src / "tracker.json").write_text('{"asr": {"best": 1.0, "step": 5}}')

    dest = tmp_path / "tpu_run"
    assert cli.main([str(src), str(dest)]) == 0
    assert (dest / "tracker.json").exists()
    tree = ckpt.load_pytree(str(dest / "char_lm.npz"))
    np.testing.assert_allclose(
        tree["emb"]["table"], lm.emb.weight.detach().numpy(), atol=1e-6
    )
    assert (dest / "asr_best.npz").exists()

    back = tmp_path / "back"
    assert cli.main([str(dest / "char_lm.npz"), str(back), "--export"]) == 0
    sd = {k: v.numpy() for k, v in torch.load(
        back / "char_lm.cpt", map_location="cpu", weights_only=True).items()}
    np.testing.assert_allclose(sd["emb.weight"], lm.emb.weight.detach().numpy(),
                               atol=1e-6)
    np.testing.assert_allclose(
        sd["layer_1.bias_ih"] + sd["layer_1.bias_hh"],
        lm.layer_1.bias_ih.detach().numpy() + lm.layer_1.bias_hh.detach().numpy(),
        atol=1e-6)


def test_import_ckpt_cli_edge_cases(tmp_path):
    from ss_asr_tpu.cli import import_ckpt as cli
    from ss_asr_tpu.utils import checkpoint as ckpt

    torch.manual_seed(9)
    # forced 'discriminator' alias converts (and renames to adv.npz)
    d = tmp_path / "whatever.cpt"
    torch.save(_RefDiscriminator().state_dict(), d)
    dest = tmp_path / "out"
    assert cli.main([str(d), str(dest), "--module", "discriminator"]) == 0
    assert (dest / "adv.npz").exists()

    # forced module names the output so trainers find it
    f = tmp_path / "final.cpt"
    torch.save(_RefCharLM().state_dict(), f)
    assert cli.main([str(f), str(dest), "--module", "char_lm"]) == 0
    assert (dest / "char_lm.npz").exists()

    # nonexistent src: clean error, no traceback
    assert cli.main([str(tmp_path / "nope"), str(dest)]) == 1

    # directory + --module: rejected (multi-module dirs)
    srcdir = tmp_path / "run"
    srcdir.mkdir()
    torch.save(_RefCharLM().state_dict(), srcdir / "char_lm.cpt")
    assert cli.main([str(srcdir), str(dest), "--module", "asr"]) == 1

    # filename/content mismatch is caught
    torch.save(_RefCharLM().state_dict(), srcdir / "sae.cpt")
    assert cli.main([str(srcdir), str(dest / "mismatch")]) == 1

    # --export directory mode skips optimizer-state archives
    exp = tmp_path / "ours"
    exp.mkdir()
    lm = charlm_mod.init_charlm(jax.random.PRNGKey(0), charlm_mod.CharLMConfig())
    ckpt.save_pytree(str(exp / "char_lm.npz"), lm)
    ckpt.save_pytree(str(exp / "char_lm_opt.npz"), {"leaf_00000": np.zeros(3)})
    back = tmp_path / "back2"
    assert cli.main([str(exp), str(back), "--export"]) == 0
    assert (back / "char_lm.cpt").exists()
    assert not (back / "char_lm_opt.cpt").exists()


def test_training_resumes_from_imported_reference_checkpoint(tmp_path):
    """The migration story end-to-end: a reference user's trained ASR weights
    keep training under our ASRTrainer after CLI conversion."""
    from ss_asr_tpu.cli import import_ckpt as cli
    from ss_asr_tpu.train import ASRTrainer, make_paras
    from ss_asr_tpu.vocab import normalize_string

    rng = np.random.RandomState(0)
    fdir = tmp_path / "fbanks"
    fdir.mkdir()
    rows = []
    for i, t in enumerate(["já", "nei", "takk", "gott"]):
        T = 16 + 2 * i
        p = str(fdir / f"u{i}.npy")
        np.save(p, (0.1 * rng.standard_normal((T, 8))).astype(np.float32))
        norm, s_len = normalize_string(t)
        rows.append((norm, p, s_len, T, "na", f"u{i}.wav"))
    rows.sort(key=lambda r: r[3])
    idx = str(tmp_path / "index.tsv")
    with open(idx, "w", encoding="utf-8") as f:
        for r in rows:
            f.write("\t".join(str(a) for a in r) + "\n")

    config = {
        "asr": {
            "opt": {"type": "Adadelta", "learning_rate": 1.0},
            "mdl": {"encoder_state_size": 8, "mlp_out_size": 8,
                    "decoder_state_size": 8, "tf_rate": 0.9, "feature_dim": 8},
            "train_index": idx, "valid_index": idx,
            "t_bucket": 8, "l_bucket": 8, "train_batch_size": 4,
            "valid_batch_size": 4, "n_epochs": 4, "valid_step": 1000,
            "logging_step": 1, "save_step": 1000, "wer_step": 1000,
        },
    }

    # a "trained" reference checkpoint, converted into our ckpdir layout
    torch.manual_seed(8)
    ref = _RefASR(feat=8, enc=8, dec=8, mlp=8, vocab=50)
    torch.save(ref.state_dict(), tmp_path / "asr.cpt")
    ckpdir = tmp_path / "result"
    assert cli.main([str(tmp_path / "asr.cpt"), str(ckpdir / "mig")]) == 0

    paras = make_paras(name="mig", logdir=str(tmp_path / "runs"),
                       ckpdir=str(ckpdir), seed=1, verbose=False)
    t = ASRTrainer(config, paras)
    t.load_data()
    t.set_model()
    # the trainer picked up the imported weights, not a fresh init
    np.testing.assert_allclose(
        np.asarray(t.params["char_trans"]["w"]),
        ref.char_trans.weight.detach().numpy().T, atol=1e-6)
    logged = []
    t.lg.scalar = lambda k, v, s: logged.append((k, v, s))
    t.exec()
    t.close()
    losses = [v for k, v, s in logged if k == "train_loss"]
    assert len(losses) >= 2 and np.isfinite(losses).all()
