"""Málrómur-layout corpus path: CSV filtering + preprocess + harness pieces.

The full train->decode smoke is `python benchmarks/malromur_parity.py smoke`
(run standalone — minutes of XLA compiles); this covers the pieces that can
regress silently: the classification-column filter, the unreadable-wav skip,
and the thesis-target table lookup.
"""

import os

from benchmarks.malromur_parity import (
    THESIS_TARGETS,
    build_smoke_corpus,
)
from ss_asr_tpu.cli.preprocess import preprocess_malromur
from ss_asr_tpu.data.index import load_index


def test_malromur_csv_filter_and_preprocess(tmp_path):
    work = str(tmp_path)
    csv_path, wav_dir, n_expected = build_smoke_corpus(work, n=20)
    # 20 rows: every 5th is 'incorrect' (4), row 7 is correct but waveless
    assert n_expected == 20 - 4 - 1
    idx = preprocess_malromur(csv_path, wav_dir,
                              os.path.join(work, "processed"), sr=8000)
    df = load_index(idx)
    assert len(df) == n_expected
    # length-sorted, real frame counts, fbank files exist
    frames = list(df["unpadded_num_frames"])
    assert frames == sorted(frames)
    assert all(os.path.exists(p) for p in df["path_to_fbank"])
    # texts were normalized into the 50-char vocabulary (SOS/EOS wrapped)
    assert all(t.startswith("<") and t.endswith(">")
               for t in df["normalized_text"])


def test_thesis_targets_cover_all_conditions():
    for cond in ("full", "2.5", "5", "10"):
        assert cond in THESIS_TARGETS
    for cond in ("2.5", "5", "10"):
        t = THESIS_TARGETS[cond]["m5_test_acc"]
        assert set(t) == {"greedy", "beam8", "beam8_lm"}
