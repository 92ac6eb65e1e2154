"""Tracker persistence semantics (reference src/TrackerHandler.py parity +
the multi-host writer gate)."""

import json
import os

from ss_asr_tpu.utils.tracker import Tracker


def test_tracker_roundtrip(tmp_path):
    p = str(tmp_path / "tracker.json")
    tr = Tracker(p, "asr")
    tr.do_step(3)
    tr.set_best(1.25)
    tr2 = Tracker(p, "asr")
    assert tr2.step == 3
    assert tr2.get_best() == 1.25


def test_tracker_nonwriter_never_touches_disk(tmp_path):
    """writer=False (multi-host non-zero process) keeps full in-memory state
    but never creates or mutates tracker.json."""
    p = str(tmp_path / "tracker.json")
    tr = Tracker(p, "asr", writer=False)
    tr.do_step(5)
    tr.set_best(0.5)
    assert not os.path.exists(p)
    assert tr.step == 5 and tr.get_best() == 0.5

    # a non-writer still RESUMES from the file the writer left behind
    Tracker(p, "asr").do_step(7)
    tr3 = Tracker(p, "asr", writer=False)
    assert tr3.step == 7
    tr3.do_step()
    assert tr3.step == 8
    with open(p) as f:
        assert json.load(f)["asr"]["step"] == 7  # disk untouched by non-writer
