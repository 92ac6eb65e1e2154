"""Snapshot history (keep_snapshots) + checkpoint averaging."""

import os

import numpy as np
import pytest

from ss_asr_tpu.utils import checkpoint as ckpt


def _tree(scale):
    return {
        "enc": {"w": np.full((3, 2), scale, np.float32), "b": np.arange(2.0) * scale},
        "dec": {"emb": np.full((4,), scale, np.float16)},
    }


def test_average_pytrees_is_elementwise_mean(tmp_path):
    paths = []
    for i, s in enumerate([1.0, 3.0]):
        p = str(tmp_path / f"c{i}.npz")
        ckpt.save_pytree(p, _tree(s))
        paths.append(p)
    avg = ckpt.average_pytrees(paths)
    np.testing.assert_allclose(avg["enc"]["w"], np.full((3, 2), 2.0))
    np.testing.assert_allclose(avg["enc"]["b"], np.arange(2.0) * 2.0)
    # dtype of each leaf is preserved
    assert avg["enc"]["w"].dtype == np.float32
    assert avg["dec"]["emb"].dtype == np.float16
    np.testing.assert_allclose(avg["dec"]["emb"], np.full((4,), 2.0))


def test_average_pytrees_rejects_mismatches(tmp_path):
    a = str(tmp_path / "a.npz")
    ckpt.save_pytree(a, _tree(1.0))
    b = str(tmp_path / "b.npz")
    ckpt.save_pytree(b, {"enc": {"w": np.zeros((3, 2), np.float32)}})
    with pytest.raises(ValueError, match="key set"):
        ckpt.average_pytrees([a, b])
    c = str(tmp_path / "c.npz")
    bad = _tree(1.0)
    bad["enc"]["w"] = np.zeros((5, 2), np.float32)
    ckpt.save_pytree(c, bad)
    with pytest.raises(ValueError, match="shape"):
        ckpt.average_pytrees([a, c])
    with pytest.raises(ValueError, match="no checkpoints"):
        ckpt.average_pytrees([])


def test_list_and_prune_snapshots(tmp_path):
    d = str(tmp_path)
    for step in (30, 10, 200):
        ckpt.save_pytree(ckpt.snapshot_path(d, "asr", step), _tree(float(step)))
    # an unrelated module's snapshot and a non-snapshot file stay untouched
    ckpt.save_pytree(ckpt.snapshot_path(d, "char_lm", 5), _tree(1.0))
    ckpt.save_pytree(os.path.join(d, "asr.npz"), _tree(1.0))

    snaps = ckpt.list_snapshots(d, "asr")
    assert [s for s, _ in snaps] == [10, 30, 200]  # step-sorted

    removed = ckpt.prune_snapshots(d, "asr", keep=2)
    assert [os.path.basename(p) for p in removed] == ["asr.snap-000000010.npz"]
    assert [s for s, _ in ckpt.list_snapshots(d, "asr")] == [30, 200]
    assert [s for s, _ in ckpt.list_snapshots(d, "char_lm")] == [5]
    assert os.path.exists(os.path.join(d, "asr.npz"))

    # pruning when under the cap removes nothing
    assert ckpt.prune_snapshots(d, "asr", keep=5) == []


def test_trainer_snapshot_history_and_averaged_decode(tmp_path):
    """keep_snapshots on a real (tiny) CHARLMTrainer run: exactly K
    step-stamped snapshots survive, and their average is a loadable
    checkpoint with the module's tree structure."""
    import jax

    from ss_asr_tpu.train import CHARLMTrainer, make_paras

    corpus = str(tmp_path / "lm.txt")
    with open(corpus, "w", encoding="utf-8") as f:
        f.write("halló heimur þetta er texti " * 30)
    config = {
        "char_lm": {
            "opt": {"type": "Adam", "learning_rate": 1e-3},
            "mdl": {"hidden_size": 8, "tf_rate": 1.0},
            "train_index": corpus,
            "chunk_size": 16,
            "train_batch_size": 2,
            "n_epochs": 2,
            "valid_step": 10**9,
            "logging_step": 10**9,
            "save_step": 2,
            "keep_snapshots": 2,
        }
    }
    paras = make_paras(name="snap", logdir=str(tmp_path / "runs"),
                       ckpdir=str(tmp_path / "result"), seed=0, verbose=False)
    t = CHARLMTrainer(config, paras)
    t.load_data(); t.set_model(); t.exec(); t.close()

    ckpdir = os.path.join(paras.ckpdir, paras.name)
    snaps = ckpt.list_snapshots(ckpdir, "char_lm")
    assert len(snaps) == 2, snaps
    assert snaps[0][0] < snaps[1][0] <= t.tr.step

    avg = ckpt.average_pytrees([p for _, p in snaps])
    latest = ckpt.load_pytree(os.path.join(ckpdir, "char_lm.npz"))
    assert jax.tree.structure(avg) == jax.tree.structure(latest)
    for a, l in zip(jax.tree.leaves(avg), jax.tree.leaves(latest)):
        assert a.shape == l.shape


def test_avg_ckpt_cli(tmp_path, capsys):
    from ss_asr_tpu.cli.avg_ckpt import main

    d = str(tmp_path)
    for step in (1, 2, 3):
        ckpt.save_pytree(ckpt.snapshot_path(d, "asr", step), _tree(float(step)))
    out = str(tmp_path / "avg.npz")
    main(["--out", out, "--ckpdir", d, "--module", "asr", "--last", "2"])
    avg = ckpt.load_pytree(out)
    np.testing.assert_allclose(avg["enc"]["w"], np.full((3, 2), 2.5))
    assert "averaged 2 checkpoint(s)" in capsys.readouterr().out

    # explicit paths mode
    out2 = str(tmp_path / "avg2.npz")
    main(["--out", out2,
          ckpt.snapshot_path(d, "asr", 1), ckpt.snapshot_path(d, "asr", 3)])
    np.testing.assert_allclose(
        ckpt.load_pytree(out2)["enc"]["w"], np.full((3, 2), 2.0))

    # both / neither modes are usage errors
    with pytest.raises(SystemExit):
        main(["--out", out])
    with pytest.raises(SystemExit):
        main(["--out", out, "--ckpdir", d, ckpt.snapshot_path(d, "asr", 1)])
