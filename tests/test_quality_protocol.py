"""The scripted quality protocol (benchmarks/quality_protocol.py).

The full protocol (train -> greedy/beam/beam+LM table, the thesis' Table
6.12 methodology) runs standalone — minutes of XLA compiles across four
recorded regimes.  These tests cover the cheap paths that can regress
silently: the greedy-only restriction (``decode_modes``) must skip both LM
training and the beam passes while still reporting the thesis metrics, and
the CLI must reject unknown mode names.
"""

import os
import subprocess
import sys

from benchmarks.quality_protocol import run

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_greedy_only_protocol_skips_lm_and_beam(tmp_path):
    result = run(str(tmp_path), size="tiny", n_utts=12, epochs=1, seed=0,
                 lm_weight=0.3, batch=4, decode_modes=("greedy",))

    # thesis metrics present for the one requested mode
    for met in ("cer", "wer", "acc"):
        assert f"greedy_{met}" in result
    assert result["n_eval_utts"] > 0

    # no beam/LM-fusion modes, no sweep tables
    assert not any(k.startswith("beam") or k.startswith("rescore")
                   for k in result)
    assert "lm_weight_sweep" not in result
    assert result["config"]["decode_modes"] == ["greedy"]

    # the char LM was never trained: greedy-only needs no LM checkpoint
    ckpdir = tmp_path / "result" / "qp"
    assert (ckpdir / "asr.npz").exists()
    assert not (ckpdir / "char_lm.npz").exists()


def test_cli_rejects_unknown_mode():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "quality_protocol.py"),
         "--modes", "greedy,bogus"],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 2
    assert "bogus" in proc.stderr


def test_avg_snapshots_adds_averaged_decode_modes(tmp_path):
    result = run(str(tmp_path), size="tiny", n_utts=12, epochs=2, seed=0,
                 lm_weight=0.3, batch=4, decode_modes=("greedy",),
                 avg_snapshots=2)

    # averaged-checkpoint columns sit beside the plain ones
    for met in ("cer", "wer", "acc"):
        assert f"greedy_{met}" in result
        assert f"greedy_avg_{met}" in result
    assert result["config"]["avg_snapshots"] == 2
    # the averaged window covers the run's LAST snapshots (close() stamps
    # the final step)
    steps = result["avg_snapshot_steps"]
    assert len(steps) == 2 and steps[0] < steps[1]

    from ss_asr_tpu.utils import checkpoint as ckpt

    ckpdir = str(tmp_path / "result" / "qp")
    snaps = ckpt.list_snapshots(ckpdir, "asr")
    assert [s for s, _ in snaps][-2:] == steps
