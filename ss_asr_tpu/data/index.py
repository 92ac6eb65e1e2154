"""Dataset index: the TSV schema shared with the preprocessing CLI.

Schema parity with the reference (src/preprocess.py:49-53, src/ASRDataset.py:
13-23): tab-separated rows of ``(normalized_text, path_to_fbank, s_len,
unpadded_num_frames, text_fname, wav_fname)``, no header, sorted by frame
length so sequential batches have near-uniform lengths (the TPU build relies
on this for shape bucketing instead of cuDNN packing).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pandas as pd

COLUMNS = [
    "normalized_text",
    "path_to_fbank",
    "s_len",
    "unpadded_num_frames",
    "text_fname",
    "wav_fname",
]


def load_index(path: str) -> pd.DataFrame:
    return pd.read_csv(
        path,
        sep="\t",
        names=COLUMNS,
        dtype={
            "normalized_text": str,
            "path_to_fbank": str,
            "s_len": int,
            "unpadded_num_frames": int,
            "text_fname": str,
            "wav_fname": str,
        },
    )


def save_index(frame: pd.DataFrame, path: str) -> None:
    frame.to_csv(path, sep="\t", index=False, header=False)


def make_split(
    index: str,
    train_r: float = 0.9,
    eval_r: float = 0.1,
    seed: Optional[int] = None,
) -> None:
    """Random row split into train.tsv / eval.tsv beside the index."""
    assert abs(train_r + eval_r - 1.0) < 1e-9, "Ratios must sum to 1.0"
    frame = load_index(index)
    rng = np.random.default_rng(seed)
    msk = rng.random(len(frame)) < train_r
    base = os.path.dirname(index)
    save_index(frame[msk], os.path.join(base, "train.tsv"))
    save_index(frame[~msk], os.path.join(base, "eval.tsv"))


def sort_index(
    index: str, sort_key: str, sort_ascending: bool = True, out_index: Optional[str] = None
) -> None:
    frame = load_index(index)
    frame = frame.sort_values(by=[sort_key], ascending=sort_ascending)
    save_index(frame, out_index if out_index is not None else index)


def subset_by_t(
    t: float, index: str, out_index: str, avg_utt_s: float = 4.5, seed: Optional[int] = None
) -> None:
    """Sample a subset totalling ~t seconds of speech (low-resource setups).

    The budget is realized as a COUNT, ``int(t / avg_utt_s)`` rows — the
    reference's approximation (src/preprocess.py subset_by_t); tune
    ``avg_utt_s`` to the corpus' post-filter mean duration if the realized
    hours must be exact."""
    df = load_index(index)
    num = int(t / avg_utt_s)
    if num >= len(df):
        raise ValueError(
            f"subset_by_t: {t:.0f}s at avg {avg_utt_s}s/utt needs {num} rows "
            f"but {index} holds only {len(df)} — the requested budget is the "
            "whole corpus or more; drop the subset or lower t")
    sampled = df.sample(n=num, random_state=seed)
    save_index(sampled, out_index)
