"""Native tfevents writer: CRC vectors, roundtrip, and cross-validation
against tensorboardX's writer (parse THEIR file with OUR reader)."""

import glob
import os

import numpy as np
import pytest

from ss_asr_tpu.utils import tfevents


def test_crc32c_standard_vector():
    # the ISCSI/Castagnoli check value
    assert tfevents.crc32c(b"123456789") == 0xE3069283
    assert tfevents.crc32c(b"") == 0


def test_writer_reader_roundtrip(tmp_path):
    d = str(tmp_path / "tb")
    w = tfevents.EventWriter(d)
    w.scalar("loss", 3.5, 1)
    w.scalar("loss", 2.25, 2)
    w.scalar("acc", 0.75, 2)
    w.close()
    (path,) = glob.glob(os.path.join(d, "events.out.tfevents.*"))
    got = tfevents.read_scalars(path)
    assert got == [("loss", 3.5, 1), ("loss", 2.25, 2), ("acc", 0.75, 2)]


def test_reader_parses_tensorboardx_output(tmp_path):
    """Cross-validation: our reader (framing + proto walk + CRC checks) must
    parse a file written by the reference implementation."""
    tbx = pytest.importorskip("tensorboardX")
    d = str(tmp_path / "tbx")
    w = tbx.SummaryWriter(d)
    w.add_scalar("x", 1.5, 7)
    w.add_scalar("x", 2.5, 8)
    w.close()
    (path,) = glob.glob(os.path.join(d, "events.out.tfevents.*"))
    got = [(t, v, s) for t, v, s in tfevents.read_scalars(path) if t == "x"]
    assert got == [("x", 1.5, 7), ("x", 2.5, 8)]


def test_metriclogger_native_fallback(tmp_path, monkeypatch):
    """MetricLogger writes native tfevents when tensorboardX is unavailable."""
    import ss_asr_tpu.utils.logging as L

    monkeypatch.setattr(L, "SummaryWriter", None)
    d = str(tmp_path / "logs")
    lg = L.MetricLogger(d, "asr")
    lg.scalar("train_loss", 1.25, 3)
    lg.close()
    (path,) = glob.glob(os.path.join(d, "events.out.tfevents.*"))
    assert tfevents.read_scalars(path) == [("asr_train_loss", 1.25, 3)]
