"""End-to-end trainer tests on a tiny synthetic corpus (CPU, tiny models)."""

import json
import os

import numpy as np
import pytest

from ss_asr_tpu.train import (
    ADVTrainer,
    ASRTester,
    ASRTrainer,
    CHARLMTrainer,
    SAETrainer,
    TAETrainer,
    asr_seed_train,
    make_paras,
)
from ss_asr_tpu.utils import checkpoint as ckpt
from ss_asr_tpu.vocab import normalize_string


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """8 fake utterances + text corpus + config dict."""
    tmp = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    fdir = tmp / "fbanks"
    fdir.mkdir()
    texts = ["já", "nei", "halló", "takk", "gott", "daginn", "kvöld", "morgunn"]
    rows = []
    for i, t in enumerate(texts):
        T = 24 + 2 * i
        fb = (0.1 * rng.standard_normal((T, 8))).astype(np.float32)
        p = str(fdir / f"u{i}.npy")
        np.save(p, fb)
        norm, s_len = normalize_string(t)
        rows.append((norm, p, s_len, T, "na", f"u{i}.wav"))
    rows.sort(key=lambda r: r[3])
    idx = str(tmp / "index.tsv")
    with open(idx, "w", encoding="utf-8") as f:
        for r in rows:
            f.write("\t".join(str(a) for a in r) + "\n")

    lm_corpus = str(tmp / "lm.txt")
    with open(lm_corpus, "w", encoding="utf-8") as f:
        f.write("halló heimur þetta er texti " * 40)

    mdl = {
        "encoder_state_size": 8,
        "mlp_out_size": 8,
        "decoder_state_size": 8,
        "tf_rate": 0.9,
        "feature_dim": 8,
    }
    config = {
        "asr": {
            "opt": {"type": "Adadelta", "learning_rate": 1.0},
            "mdl": mdl,
            "train_index": idx,
            "valid_index": idx,
            "test_index": idx,
            "wer_step": 1000,
            "t_bucket": 8,
            "l_bucket": 8,
            "train_batch_size": 4,
            "valid_batch_size": 4,
            "n_epochs": 8,
            "valid_step": 1000,
            "logging_step": 4,
            "save_step": 1000,
            "decode_beam_size": 1,
            "decode_lm_weight": 0.0,
        },
        "tae": {
            "opt": {"type": "Adam", "learning_rate": 0.001},
            "mdl": {"state_size": 8, "emb_dim": 8, "num_layers": 2},
            "drop_rate": 0.1,
            "train_index": idx,
            "valid_index": idx,
            "l_bucket": 8,
            "train_batch_size": 4,
            "n_epochs": 2,
            "valid_step": 1000,
            "save_step": 1000,
            "logging_step": 4,
        },
        "sae": {
            "opt": {"type": "Adam", "learning_rate": 0.001},
            "mdl": {
                "kernel_sizes": [[1, 4], [2, 1], [2, 1]],
                "num_filters": [4, 8, 16],
                "pool_kernel_sizes": [[2, 1], [2, 1], [2000, 40]],
            },
            "train_index": idx,
            "valid_index": idx,
            "t_bucket": 8,
            "train_batch_size": 4,
            "n_epochs": 2,
            "valid_step": 1000,
            "save_step": 1000,
            "logging_step": 4,
        },
        "adv": {
            "G_opt": {"type": "Adadelta", "learning_rate": 1.0},
            "D_opt": {"type": "Adadelta", "learning_rate": 1.0},
            "mdl": {"hidden_dim": 8},
            "label_smoothing": 0.1,
            "train_index": idx,
            "valid_index": idx,
            "t_bucket": 8,
            "l_bucket": 8,
            "train_batch_size": 4,
            "n_epochs": 1,
            "valid_step": 1000,
            "save_step": 1000,
            "logging_step": 4,
        },
        "char_lm": {
            "opt": {"type": "Adam", "learning_rate": 0.001},
            "mdl": {"hidden_size": 8, "tf_rate": 0.9},
            "train_index": lm_corpus,
            "chunk_size": 20,
            "train_batch_size": 4,
            "n_epochs": 1,
            "valid_step": 1000,
            "logging_step": 10,
            "save_step": 1000,
        },
        "seed_train": {"super_its": 1},
    }
    return config


def _paras(tmp_path, name="exp"):
    return make_paras(
        name=name,
        logdir=str(tmp_path / "runs"),
        ckpdir=str(tmp_path / "result"),
        seed=1,
        verbose=False,
    )


def test_asr_trainer_overfits(corpus, tmp_path):
    paras = _paras(tmp_path)
    t = ASRTrainer(corpus, paras)
    t.load_data()
    t.set_model()
    # capture losses by monkey-recording scalar logs
    logged = []
    t.lg.scalar = lambda k, v, s: logged.append((k, v, s))
    t.exec()
    t.valid()
    t.close()
    losses = [v for k, v, s in logged if k == "train_loss"]
    assert len(losses) >= 2
    assert losses[-1] < losses[0]  # training reduces loss on a tiny corpus
    assert os.path.exists(t.ckppath)
    # tracker persisted the step
    with open(os.path.join(t.ckpdir, "tracker.json")) as f:
        tr = json.load(f)
    assert tr["asr"]["step"] == t.tr.step


def test_asr_trainer_resumes_from_checkpoint(corpus, tmp_path):
    paras = _paras(tmp_path, "resume")
    t = ASRTrainer(corpus, paras)
    t.load_data()
    t.set_model()
    t.exec()
    t.close()
    step1 = t.tr.step
    p1 = t.params

    t2 = ASRTrainer(corpus, paras)
    t2.load_data()
    t2.set_model()
    assert t2.tr.step == step1
    np.testing.assert_allclose(
        np.asarray(p1["char_trans"]["w"]), np.asarray(t2.params["char_trans"]["w"])
    )


def test_charlm_trainer(corpus, tmp_path):
    paras = _paras(tmp_path, "lm")
    t = CHARLMTrainer(corpus, paras)
    t.load_data()
    t.set_model()
    logged = []
    t.lg.scalar = lambda k, v, s: logged.append((k, v, s))
    t.exec()
    gen = t.generate(length=15)
    assert isinstance(gen, str) and len(gen) >= 15
    acc = t.predict("halló h", "alló he", tf_rate=1.0)
    assert 0 <= acc <= 100
    t.close()
    losses = [v for k, v, s in logged if k == "train_loss"]
    assert losses[-1] < losses[0]


def test_tae_trainer_updates_shared_subtrees_only(corpus, tmp_path):
    paras = _paras(tmp_path, "tae")
    t = TAETrainer(corpus, paras)
    t.load_data()
    t.set_model()
    enc_before = np.asarray(t.params["asr"]["encoder"]["pblstm1"]["fwd"]["w_ih"]).copy()
    dec_before = np.asarray(t.params["asr"]["decoder"]["layer1"]["w_ih"]).copy()
    t.exec()
    t.valid()
    t.close()
    enc_after = np.asarray(t.params["asr"]["encoder"]["pblstm1"]["fwd"]["w_ih"])
    dec_after = np.asarray(t.params["asr"]["decoder"]["layer1"]["w_ih"])
    np.testing.assert_array_equal(enc_before, enc_after)  # listener frozen
    assert not np.allclose(dec_before, dec_after)  # speller trained
    assert os.path.exists(t.asrpath_out)


def test_sae_trainer_updates_listener_only(corpus, tmp_path):
    paras = _paras(tmp_path, "sae")
    t = SAETrainer(corpus, paras)
    t.load_data()
    t.set_model()
    enc_before = np.asarray(t.params["asr"]["encoder"]["pblstm1"]["fwd"]["w_ih"]).copy()
    dec_before = np.asarray(t.params["asr"]["decoder"]["layer1"]["w_ih"]).copy()
    t.exec()
    t.valid()
    t.close()
    enc_after = np.asarray(t.params["asr"]["encoder"]["pblstm1"]["fwd"]["w_ih"])
    dec_after = np.asarray(t.params["asr"]["decoder"]["layer1"]["w_ih"])
    assert not np.allclose(enc_before, enc_after)  # listener trained
    np.testing.assert_array_equal(dec_before, dec_after)  # speller frozen


def test_sae_listener_lr_scale_zero_freezes_listener(corpus, tmp_path):
    """sae.listener_lr_scale: 0.0 trains the SAE but leaves the ASR listener
    untouched — the guardrail against reconstruction pressure tanh-saturating
    the shared encoder (docs/GAIN_AB.json)."""
    import copy

    import jax

    cfg = copy.deepcopy(corpus)
    cfg["sae"]["listener_lr_scale"] = 0.0
    paras = _paras(tmp_path, "sae_frozen_enc")
    t = SAETrainer(cfg, paras)
    t.load_data()
    t.set_model()
    enc_before = np.asarray(t.params["asr"]["encoder"]["pblstm1"]["fwd"]["w_ih"]).copy()
    sae_before = jax.tree.map(np.copy, t.params["sae"])
    t.exec()
    t.close()
    enc_after = np.asarray(t.params["asr"]["encoder"]["pblstm1"]["fwd"]["w_ih"])
    np.testing.assert_array_equal(enc_before, enc_after)  # listener frozen
    sae_after = t.params["sae"]
    changed = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(sae_before), jax.tree.leaves(sae_after))
    )
    assert changed  # the SAE itself still trains


def test_sae_saturation_warning_fires_on_threshold(corpus, tmp_path):
    """sae.saturation_warn: 0.0 (any saturation) fires the one-shot
    warning; the default threshold stays quiet on a fresh tiny model."""
    import copy

    cfg = copy.deepcopy(corpus)
    cfg["sae"]["saturation_warn"] = -1.0  # always fires
    paras = _paras(tmp_path, "sae_satwarn")
    t = SAETrainer(cfg, paras)
    t.load_data()
    t.set_model()
    t.exec()
    t.close()
    assert getattr(t, "saturation_warned", False)


def test_adv_trainer_runs_and_updates_G_D(corpus, tmp_path):
    paras = _paras(tmp_path, "adv")
    t = ADVTrainer(corpus, paras)
    t.load_data()
    t.set_model()
    enc_before = np.asarray(t.params["asr"]["encoder"]["pblstm1"]["fwd"]["w_ih"]).copy()
    disc_before = np.asarray(t.params["disc"]["fc1"]["w"]).copy()
    tae_before = np.asarray(t.params["tae"]["encoder"]["emb"]["table"]).copy()
    t.exec()
    t.valid()
    t.close()
    assert not np.allclose(enc_before, np.asarray(t.params["asr"]["encoder"]["pblstm1"]["fwd"]["w_ih"]))
    assert not np.allclose(disc_before, np.asarray(t.params["disc"]["fc1"]["w"]))
    # the text encoder (data distribution) must stay fixed
    np.testing.assert_array_equal(tae_before, np.asarray(t.params["tae"]["encoder"]["emb"]["table"]))


def test_seed_pipeline_relays_checkpoints(corpus, tmp_path):
    paras = _paras(tmp_path, "seed")
    asr_seed_train(corpus, paras)
    ckpdir = os.path.join(paras.ckpdir, paras.name)
    for f in ("asr_1.npz", "asr_2.npz", "asr_3.npz", "tae.npz", "sae.npz", "adv.npz"):
        assert os.path.exists(os.path.join(ckpdir, f)), f
    # the relay actually mutated the ASR between stages
    a1 = ckpt.load_pytree(os.path.join(ckpdir, "asr_1.npz"))
    a3 = ckpt.load_pytree(os.path.join(ckpdir, "asr_3.npz"))
    assert not np.allclose(
        a1["encoder"]["pblstm1"]["fwd"]["w_ih"], a3["encoder"]["pblstm1"]["fwd"]["w_ih"]
    )


def test_stale_checkpoint_shape_mismatch_is_caught_at_load(corpus, tmp_path):
    """A checkpoint from a different model size must fail AT LOAD with a
    clear message, not hundreds of frames deep as a dot_general error in
    the forward pass (the stale-workdir footgun)."""
    import copy

    import pytest

    paras = _paras(tmp_path, "stale")
    t = ASRTrainer(corpus, paras)
    t.load_data()
    t.set_model()
    t.save_tree(t.ckppath, t.params)

    bigger = copy.deepcopy(corpus)
    bigger["asr"]["mdl"] = dict(bigger["asr"]["mdl"],
                                encoder_state_size=16, decoder_state_size=16,
                                mlp_out_size=16)
    t2 = ASRTrainer(bigger, paras)
    t2.load_data()
    with pytest.raises(ValueError, match="does not match the model config"):
        t2.set_model()


def test_seed_pipeline_m5_stage_selection(corpus, tmp_path):
    """seed_train.stages: [tae, sae] is the thesis' best model M5 (Table
    6.5/6.12) — ADV must not run and the relay stops at asr_2."""
    import copy

    cfg = copy.deepcopy(corpus)
    cfg["seed_train"]["stages"] = ["tae", "sae"]
    paras = _paras(tmp_path, "seed_m5")
    asr_seed_train(cfg, paras)
    ckpdir = os.path.join(paras.ckpdir, paras.name)
    for f in ("asr_1.npz", "asr_2.npz", "tae.npz", "sae.npz"):
        assert os.path.exists(os.path.join(ckpdir, f)), f
    assert not os.path.exists(os.path.join(ckpdir, "asr_3.npz"))
    assert not os.path.exists(os.path.join(ckpdir, "adv.npz"))
    a1 = ckpt.load_pytree(os.path.join(ckpdir, "asr_1.npz"))
    a2 = ckpt.load_pytree(os.path.join(ckpdir, "asr_2.npz"))
    assert not np.allclose(
        a1["encoder"]["pblstm1"]["fwd"]["w_ih"],
        a2["encoder"]["pblstm1"]["fwd"]["w_ih"],
    )


def test_seed_pipeline_rejects_bad_stage_chains(corpus, tmp_path):
    import copy

    import pytest

    cfg = copy.deepcopy(corpus)
    cfg["seed_train"]["stages"] = ["adv", "tae"]  # adv before its data
    with pytest.raises(ValueError, match="tae"):
        asr_seed_train(cfg, _paras(tmp_path, "seed_bad1"))
    cfg["seed_train"]["stages"] = ["tae", "vae"]
    with pytest.raises(ValueError, match="unknown"):
        asr_seed_train(cfg, _paras(tmp_path, "seed_bad2"))


def test_tester_decodes(corpus, tmp_path):
    paras = _paras(tmp_path, "test")
    # train briefly first so a checkpoint exists
    t = ASRTrainer(corpus, paras)
    t.load_data()
    t.set_model()
    t.exec()
    t.close()

    tester = ASRTester(corpus, paras)
    tester.load_data()
    tester.set_model()
    results = tester.exec()
    assert len(results) == 8
    assert all(isinstance(r, str) for r in results)
    assert os.path.exists(os.path.join(tester.ckpdir, tester.decode_file + ".txt"))
    # the tester must aggregate the thesis-table metrics over the decoded set
    # (reference Table 6.12 protocol; src/trainer.py:547-592 computes none)
    m = tester.metrics
    assert m["n"] == 8
    assert 0.0 <= m["acc"] <= 1.0
    assert m["wer"] >= 0.0 and m["cer"] >= 0.0  # WER may exceed 1 by design
    with open(os.path.join(tester.ckpdir, tester.decode_file + "_metrics.json")) as f:
        assert json.load(f) == pytest.approx(m)


def test_sae_opt_state_gates_on_own_checkpoint(corpus, tmp_path):
    """Retraining the SAE from scratch (sae.npz deleted, stale sae_opt.npz
    present, ASR relay checkpoint still there) must NOT restore the stale
    optimizer accumulators — the restore keys on the SAE's own checkpoint."""
    paras = _paras(tmp_path, "sae_optgate")
    t = SAETrainer(corpus, paras)
    t.load_data(); t.set_model(); t.exec(); t.close()
    assert os.path.exists(t.opt_ckppath)
    os.remove(t.ckppath)  # retrain the SAE stage from scratch

    t2 = SAETrainer(corpus, paras)
    t2.load_data(); t2.set_model()
    assert t2.loaded_ckpt is False  # fresh params -> fresh optimizer


def test_asr_trainer_wide_h_cpu_plumbing(corpus, tmp_path):
    """The compiler-options plumbing must be a no-op off-TPU: a CPU
    backend cannot receive TPU-only xla flags, so wide_h_compiler_options
    resolves to None there and every trainer jit site accepts
    ``compiler_options=None`` (the path all these CPU tests run through,
    asserted explicitly here once)."""
    import copy

    import ss_asr_tpu.ops.rnn as rnn

    assert rnn.wide_h_compiler_options(768) is None  # CPU backend
    assert rnn.wide_h_compiler_options(1024, spell_h=1024) is None
    cfg = copy.deepcopy(corpus)
    cfg["asr"]["n_epochs"] = 1
    t = ASRTrainer(cfg, _paras(tmp_path))
    t.load_data()
    t.set_model()
    t.exec()
    t.close()
