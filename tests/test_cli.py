"""CLI surface tests: preprocess -> train -> generate, end to end."""

import json
import os
import wave

import numpy as np
import pytest
import yaml

from ss_asr_tpu.cli import preprocess as pp_cli
from ss_asr_tpu.cli import train as train_cli
from ss_asr_tpu.data.audio import load_wav, read_wav, resample
from ss_asr_tpu.data import xmlparser
from ss_asr_tpu.data.index import load_index


def _write_wav(path, sr=16000, seconds=0.3, freq=440.0):
    t = np.arange(int(sr * seconds)) / sr
    y = (0.3 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(y.tobytes())


def test_read_wav_and_resample(tmp_path):
    p = tmp_path / "a.wav"
    _write_wav(p, sr=16000, seconds=0.25)
    sr, y = read_wav(str(p))
    assert sr == 16000
    assert abs(len(y) - 4000) <= 1
    assert y.dtype == np.float32 and np.abs(y).max() <= 1.0
    y2 = resample(y, 16000, 8000)
    assert abs(len(y2) - 2000) <= 2
    sr3, y3 = load_wav(str(p), target_sr=22050)
    assert sr3 == 22050


def test_preprocess_generic_cli(tmp_path):
    wav_dir = tmp_path / "wav"
    txt_dir = tmp_path / "txt"
    wav_dir.mkdir(), txt_dir.mkdir()
    for i, text in enumerate(["halló heimur", "góðan daginn", "takk fyrir"]):
        _write_wav(wav_dir / f"u{i}.wav", seconds=0.2 + 0.1 * i)
        (txt_dir / f"u{i}.txt").write_text(text)
    out = tmp_path / "processed"
    pp_cli.main(["generic", str(out), str(wav_dir), str(txt_dir), "--sr", "16000"])
    df = load_index(str(out / "index.tsv"))
    assert len(df) == 3
    # sorted ascending by frame count
    assert df["unpadded_num_frames"].is_monotonic_increasing
    fb = np.load(df.iloc[0]["path_to_fbank"])
    assert fb.shape[1] == 40
    assert fb.shape[0] == df.iloc[0]["unpadded_num_frames"]
    assert df.iloc[0]["normalized_text"].startswith("<")


def test_preprocess_malromur_cli(tmp_path):
    wav_dir = tmp_path / "wav"
    wav_dir.mkdir()
    lines = []
    for i, (text, cls) in enumerate(
        [("halló", "correct"), ("slæmt", "bad"), ("daginn", "correct")]
    ):
        _write_wav(wav_dir / f"m{i}.wav")
        lines.append(f"m{i},env,0,f,30,{text},0.3,{cls}")
    idx = tmp_path / "malromur.csv"
    idx.write_text("\n".join(lines) + "\n")
    out = tmp_path / "processed"
    pp_cli.main(["malromur", str(out), str(idx), str(wav_dir), "--sr", "16000"])
    df = load_index(str(out / "index.tsv"))
    assert len(df) == 2  # only 'correct' rows


def test_train_cli_end_to_end(tmp_path):
    # 1. preprocess a tiny corpus
    wav_dir, txt_dir = tmp_path / "wav", tmp_path / "txt"
    wav_dir.mkdir(), txt_dir.mkdir()
    for i, text in enumerate(["já", "nei", "halló", "takk"]):
        _write_wav(wav_dir / f"u{i}.wav", seconds=0.15)
        (txt_dir / f"u{i}.txt").write_text(text)
    out = tmp_path / "processed"
    pp_cli.main(["generic", str(out), str(wav_dir), str(txt_dir), "--sr", "16000"])

    # 2. config
    config = {
        "asr": {
            "opt": {"type": "Adadelta", "learning_rate": 1.0},
            "mdl": {
                "encoder_state_size": 8,
                "mlp_out_size": 8,
                "decoder_state_size": 8,
                "tf_rate": 0.9,
                "feature_dim": 40,
            },
            "train_index": str(out / "index.tsv"),
            "valid_index": str(out / "index.tsv"),
            "test_index": str(out / "index.tsv"),
            "t_bucket": 16,
            "l_bucket": 8,
            "train_batch_size": 2,
            "valid_batch_size": 2,
            "n_epochs": 1,
            "valid_step": 10**6,
            "logging_step": 1,
            "save_step": 10**6,
            "wer_step": 10**6,
        },
        "char_lm": {
            "opt": {"type": "Adam", "learning_rate": 0.001},
            "mdl": {"hidden_size": 8, "tf_rate": 0.9},
            "train_index": str(tmp_path / "lm.txt"),
            "chunk_size": 10,
            "train_batch_size": 2,
            "n_epochs": 1,
            "valid_step": 10**6,
            "logging_step": 5,
            "save_step": 10**6,
        },
    }
    (tmp_path / "lm.txt").write_text("halló heimur " * 30)
    conf = tmp_path / "conf.yaml"
    conf.write_text(yaml.safe_dump(config))

    # 3. train via the CLI surface (positional args like the reference)
    train_cli.main(
        ["ASRTrainer", "cli_exp", str(conf), str(tmp_path / "runs"), str(tmp_path / "result")]
    )
    assert os.path.exists(tmp_path / "result" / "cli_exp" / "asr.npz")
    with open(tmp_path / "result" / "cli_exp" / "tracker.json") as f:
        assert json.load(f)["asr"]["step"] > 0

    # 4. LMTrainer under its reference (defective) CLI name
    train_cli.main(
        ["LMTrainer", "cli_exp", str(conf), str(tmp_path / "runs"), str(tmp_path / "result")]
    )
    assert os.path.exists(tmp_path / "result" / "cli_exp" / "char_lm.npz")


def test_xmlparser(tmp_path):
    xml = """<?xml version="1.0" encoding="UTF-8"?>
<TEI xmlns="http://www.tei-c.org/ns/1.0">
 <text><body>
  <s><w>halló</w><w>heimur</w><c>.</c></s>
  <s><w>góðan</w><w/><w>daginn</w></s>
 </body></text></TEI>"""
    d = tmp_path / "xml"
    d.mkdir()
    (d / "doc.xml").write_text(xml)
    out = tmp_path / "corpus.txt"
    n = xmlparser.parse(str(d), str(out), reset_file=True)
    assert n == 1
    line = out.read_text().strip()
    assert line == "halló heimur. góðan daginn"
    # a second document line: prepro_file must keep one record per line
    with open(out, "a", encoding="utf-8") as f:
        f.write("önnur lína\n")
    norm_out = tmp_path / "norm.txt"
    xmlparser.prepro_file(str(out), str(norm_out))
    lines = norm_out.read_text().splitlines()
    assert len(lines) == 2
    assert lines[0].strip() == "halló heimur. góðan daginn"


def test_cli_verbose_false_parses():
    from ss_asr_tpu.cli.train import _parse_bool

    assert _parse_bool("False") is False
    assert _parse_bool("true") is True
    assert _parse_bool("0") is False


def test_generate_and_lm_predict_clis(tmp_path):
    """Train a tiny char LM via the CLI surface, then drive the generate and
    lm_predict CLIs against its checkpoint (reference defect #8: both of the
    reference's entry points crash on a stale `solver` import)."""
    import yaml

    from ss_asr_tpu.cli import generate as gen_cli
    from ss_asr_tpu.cli import lm_predict as pred_cli
    from ss_asr_tpu.train import CHARLMTrainer, make_paras

    lm_file = tmp_path / "lm.txt"
    lm_file.write_text("halló heimur góðan daginn " * 50, encoding="utf-8")
    config = {
        "char_lm": {
            "opt": {"type": "Adam", "learning_rate": 0.002},
            "mdl": {"hidden_size": 8, "tf_rate": 0.9},
            "train_index": str(lm_file),
            "chunk_size": 20,
            "train_batch_size": 4,
            "n_epochs": 1,
            "valid_step": 1000,
            "logging_step": 10,
            "save_step": 1000,
        }
    }
    conf_path = tmp_path / "conf.yaml"
    conf_path.write_text(yaml.safe_dump(config), encoding="utf-8")
    paras = make_paras("lmcli", str(tmp_path / "runs"), str(tmp_path / "ckpt"),
                       seed=1, verbose=False)
    t = CHARLMTrainer(config, paras)
    t.load_data(); t.set_model(); t.exec(); t.close()

    args = ["--name", "lmcli", "--config", str(conf_path),
            "--logdir", str(tmp_path / "runs"), "--ckpdir", str(tmp_path / "ckpt"),
            "--verbose", "False"]
    gen_cli.main(args + ["--start", "hall", "--length", "12", "--temp", "0.8"])
    pred_cli.main(args + ["--text", "halló heimur"])


def test_transcribe_cli(tmp_path, rng, capsys):
    """Batch transcription CLI: mixed wav + precomputed-fbank inputs decode
    through one Transcriber; output is path<TAB>transcript per line (the
    reference has NO inference entry point — src/trainer.py:547-592 only
    decodes a preprocessed index)."""
    import wave

    import jax
    import yaml

    from ss_asr_tpu.cli import transcribe as tr_cli
    from ss_asr_tpu.models import las
    from ss_asr_tpu.utils import checkpoint as ckpt

    mdl = {"encoder_state_size": 8, "decoder_state_size": 8,
           "mlp_out_size": 8, "feature_dim": 40}
    params = las.init_asr(jax.random.key(0), las.ASRConfig.from_dict(mdl))
    ckp = str(tmp_path / "asr.npz")
    ckpt.save_pytree(ckp, params)
    conf_path = tmp_path / "conf.yaml"
    conf_path.write_text(yaml.safe_dump({"asr": {"mdl": mdl}}), encoding="utf-8")

    wav = tmp_path / "u.wav"
    y = (0.1 * rng.standard_normal(8000) * 32767).astype(np.int16)
    with wave.open(str(wav), "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(8000)
        w.writeframes(y.tobytes())
    fb = tmp_path / "f.npy"
    np.save(fb, rng.standard_normal((30, 40)).astype(np.float32))

    empty_wav = tmp_path / "empty.wav"
    with wave.open(str(empty_wav), "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(8000)

    out_path = tmp_path / "hyps.tsv"
    tr_cli.main([ckp, str(wav), str(fb), str(empty_wav),
                 "--config", str(conf_path),
                 "--sr", "8000", "--max-steps", "6", "--batch", "2",
                 "--out", str(out_path)])
    lines = out_path.read_text(encoding="utf-8").splitlines()
    assert len(lines) == 3
    assert lines[0].split("\t")[0] == str(wav)
    assert lines[1].split("\t")[0] == str(fb)
    # header-only wav: clean empty transcript, not a crash mid-batch
    assert lines[2].split("\t") == [str(empty_wav), ""]

    # stdout path + feature-dim validation
    tr_cli.main([ckp, str(fb), "--config", str(conf_path), "--max-steps", "4"])
    assert capsys.readouterr().out.startswith(str(fb) + "\t")
    bad = tmp_path / "bad.npy"
    np.save(bad, rng.standard_normal((10, 7)).astype(np.float32))
    with pytest.raises(SystemExit, match="expected"):
        tr_cli.main([ckp, str(bad), "--config", str(conf_path)])

    # --detail --nbest: one JSON line per input with timed hypotheses
    import json

    out_json = tmp_path / "hyps.jsonl"
    tr_cli.main([ckp, str(fb), str(empty_wav), "--config", str(conf_path),
                 "--sr", "8000", "--max-steps", "6", "--detail",
                 "--nbest", "2", "--out", str(out_json)])
    recs = [json.loads(l) for l in
            out_json.read_text(encoding="utf-8").splitlines()]
    assert len(recs) == 2
    assert recs[0]["path"] == str(fb) and len(recs[0]["hypotheses"]) == 2
    h0 = recs[0]["hypotheses"][0]
    assert recs[0]["text"] == h0["text"]
    assert len(h0["char_starts"]) == len(h0["text"])
    assert recs[1]["text"] == "" # empty wav: one empty hypothesis

    # --long: windowed wav decode, TSV output; rejects .npy and --detail
    out_long = tmp_path / "long.tsv"
    tr_cli.main([ckp, str(wav), "--config", str(conf_path), "--sr", "8000",
                 "--max-steps", "6", "--long", "--window-s", "0.4",
                 "--overlap-s", "0.1", "--out", str(out_long)])
    line = out_long.read_text(encoding="utf-8").splitlines()[0]
    assert line.split("\t")[0] == str(wav)
    with pytest.raises(SystemExit, match="wav inputs"):
        tr_cli.main([ckp, str(fb), "--config", str(conf_path), "--long"])
    with pytest.raises(SystemExit, match="exclusive"):
        tr_cli.main([ckp, str(wav), "--config", str(conf_path), "--long",
                     "--detail"])


def test_step_timer_rolling_stats():
    import time as _time

    from ss_asr_tpu.utils.profiling import StepTimer

    t = StepTimer(window=4)
    assert t.tick() is None  # first call only arms the timer
    assert t.steps_per_sec == 0.0
    for _ in range(3):
        _time.sleep(0.01)
        dur = t.tick()
        assert dur is not None and dur > 0
    assert t.steps_per_sec > 0
    assert t.utt_per_sec(32) == 32 * t.steps_per_sec
    t.reset()
    assert t.tick() is None and t.steps_per_sec == 0.0


def test_shipped_default_config_constructs_everything():
    """conf/default.yaml must parse and every section must build its model
    config and optimizer — a schema drift here would only surface deep in a
    user's first training run."""
    import yaml

    from ss_asr_tpu.models import charlm, discriminator, las, speech_autoencoder, text_autoencoder
    from ss_asr_tpu.ops.augment import SpecAugmentConfig
    from ss_asr_tpu.train.optim import make_optimizer

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "conf", "default.yaml"), encoding="utf-8") as f:
        cfg = yaml.safe_load(f)

    for section in ("asr", "tae", "sae", "adv", "char_lm", "seed_train"):
        assert section in cfg, section

    asr_cfg = las.ASRConfig.from_dict(cfg["asr"]["mdl"])
    assert asr_cfg.encoder_state_size == 256
    charlm.CharLMConfig.from_dict(cfg["char_lm"]["mdl"])
    text_autoencoder.TAEConfig.from_dict(cfg["tae"]["mdl"])
    speech_autoencoder.SAEConfig.from_dict(cfg["sae"]["mdl"])
    discriminator.DiscriminatorConfig.from_dict(
        {**cfg["adv"]["mdl"], "in_dim": asr_cfg.enc_out_dim}
    )
    SpecAugmentConfig.from_dict(cfg["asr"].get("augment"))

    for opt in (cfg["asr"]["opt"], cfg["tae"]["opt"], cfg["sae"]["opt"],
                cfg["adv"]["G_opt"], cfg["adv"]["D_opt"], cfg["char_lm"]["opt"]):
        make_optimizer(opt["type"], opt["learning_rate"],
                       accum_steps=opt.get("accum_steps", 1),
                       warmup_steps=opt.get("warmup_steps", 0),
                       decay_steps=opt.get("decay_steps", 0))
    assert cfg["seed_train"].get("super_its") or cfg["seed_train"].get("its")


def test_pseudolabel_cli(tmp_path, rng, capsys):
    """Self-training corpus generation: decode unlabeled wavs, keep
    confident hypotheses, and emit a TRAINABLE index (same schema as
    cli/preprocess) — the kept rows must load through the standard
    ASRDataset path."""
    import wave

    import jax
    import yaml

    from ss_asr_tpu.cli import pseudolabel as pl_cli
    from ss_asr_tpu.models import las
    from ss_asr_tpu.utils import checkpoint as ckpt

    mdl = {"encoder_state_size": 8, "decoder_state_size": 8,
           "mlp_out_size": 8, "feature_dim": 40}
    params = las.init_asr(jax.random.key(0), las.ASRConfig.from_dict(mdl))
    ckp = str(tmp_path / "asr.npz")
    ckpt.save_pytree(ckp, params)
    conf_path = tmp_path / "conf.yaml"
    conf_path.write_text(yaml.safe_dump({"asr": {"mdl": mdl}}),
                         encoding="utf-8")

    wavs = []
    for i in range(3):
        p = tmp_path / f"u{i}.wav"
        y = (0.2 * rng.standard_normal(6000 + 2000 * i)
             * 32767).astype(np.int16)
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1); w.setsampwidth(2); w.setframerate(8000)
            w.writeframes(y.tobytes())
        wavs.append(str(p))
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"not a wav at all")

    outdir = str(tmp_path / "pseudo")
    rc = pl_cli.main([ckp, outdir] + wavs + [str(bad),
                     "--config", str(conf_path), "--sr", "8000",
                     "--max-steps", "8", "--batch", "2",
                     "--min-avg-logprob=-1e9", "--min-chars", "1"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["n_in"] == 4
    assert summary["n_kept"] == 3
    assert summary["rejected_unreadable"] == 1
    assert summary["mean_avg_logprob"] <= 0.0

    # the index is the standard schema, frame-sorted, and TRAINS: load it
    # through the reference-parity dataset loader
    from ss_asr_tpu.data.asr_dataset import load_asr_dataset

    idx = summary["index"]
    rowlens = []
    with open(idx, encoding="utf-8") as f:
        for line in f:
            cols = line.rstrip("\n").split("\t")
            assert len(cols) == 6
            assert cols[0].startswith("<") and cols[0].endswith(">")
            assert os.path.exists(cols[1])
            assert cols[4].startswith("pseudo:")
            rowlens.append(int(cols[3]))
    assert rowlens == sorted(rowlens)
    mapper, ds = load_asr_dataset(idx, batch_size=2)
    batch = ds.get_batch(0)
    assert batch.x.ndim == 3 and batch.x.shape[-1] == 40

    # a certainty threshold above 0 rejects everything (avg_logprob <= 0)
    outdir2 = str(tmp_path / "pseudo2")
    rc2 = pl_cli.main([ckp, outdir2] + wavs +
                      ["--config", str(conf_path), "--sr", "8000",
                       "--max-steps", "8", "--min-avg-logprob=0.5"])
    assert rc2 == 1
    s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s2["n_kept"] == 0 and s2["rejected_low_conf"] >= 1

    # duplicate stems across directories (spk1/utt001.wav, spk2/utt001.wav)
    # must not overwrite each other's fbank files
    dup_wavs = []
    for spk in ("spk1", "spk2"):
        d = tmp_path / spk
        d.mkdir()
        p = d / "utt001.wav"
        y = (0.2 * rng.standard_normal(6000) * 32767).astype(np.int16)
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1); w.setsampwidth(2); w.setframerate(8000)
            w.writeframes(y.tobytes())
        dup_wavs.append(str(p))
    outdir3 = str(tmp_path / "pseudo3")
    rc3 = pl_cli.main([ckp, outdir3] + dup_wavs +
                      ["--config", str(conf_path), "--sr", "8000",
                       "--max-steps", "8", "--min-avg-logprob=-1e9",
                       "--min-chars", "0"])
    assert rc3 == 0
    s3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s3["n_kept"] == 2
    with open(s3["index"], encoding="utf-8") as f:
        fb_paths = [line.split("\t")[1] for line in f]
    assert len(set(fb_paths)) == 2
