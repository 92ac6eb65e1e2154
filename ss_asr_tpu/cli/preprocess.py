"""Corpus preprocessing CLI: wav + text -> fbank .npy files + index.tsv.

Surface parity with the reference (src/preprocess.py:337-373):

    python -m ss_asr_tpu.cli.preprocess malromur <output_dir> <index> <wav_dir>
    python -m ss_asr_tpu.cli.preprocess generic  <output_dir> <wav_dir> <txt_dir>

(including its defect #7 fix: the reference CLI crashes on ``args.o``).

Differences from the reference pipeline, both deliberate and load-bearing for
the TPU build:

* Features are computed by the jitted on-device frontend
  (ss_asr_tpu.ops.frontend) in batches, not per-file librosa on a process
  pool — the accelerator does the FLOPs, the host threads only do IO.
* No global zero-padding pass over the corpus: the index stores true frame
  counts and the training loader pads per-batch to bucketed shapes.
  ``--pad-to-max`` restores the reference's artifact layout when exact
  artifact parity is wanted.
"""

from __future__ import annotations

import argparse
import os
import sys
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Tuple

import numpy as np

from ss_asr_tpu.data.audio import DEFAULT_SR, load_wav
from ss_asr_tpu.vocab import normalize_string

N_JOBS = 12  # IO threads (reference used 12 feature processes)


#: signal-length bucket, in samples (1.28 s @ 16 kHz): wav lengths round up
#: to a multiple of this before hitting the jitted frontend, so a whole
#: corpus compiles a handful of XLA programs instead of one per unique length
SIG_BUCKET = 20480


def _emit_fbanks(
    items: List[Tuple[str, str, str]],
    processed_dir: str,
    sr: int,
    batch_size: int = 64,
) -> List[Tuple]:
    """items: (text, wav_path, out_stem). Returns index rows.

    IO runs on a thread pool; features run on-device through the *batched*
    frontend over (batch_size, bucketed-length) buffers — static shapes, so
    XLA compiles once per signal bucket. Each row's valid frames are exact
    vs the one-shot per-signal path (per-row end reflection in
    ``log_mel_fbank_batch``).
    """
    from ss_asr_tpu.ops.frontend import log_mel_fbank_batch

    fbank_dir = os.path.join(processed_dir, "fbanks")
    os.makedirs(fbank_dir, exist_ok=True)

    def load(one):
        text, wav_path, stem = one
        try:
            _, y = load_wav(wav_path, target_sr=sr)
        except Exception as e:
            print(f"Error reading wav: {wav_path}. Sample is omitted. ({e})", file=sys.stderr)
            return None
        return (text, wav_path, stem, y)

    rows: List[Tuple] = []
    buckets: dict = {}  # n_pad -> list of (text, wav_path, stem, y)

    def flush(n_pad: int, group: list) -> None:
        buf = np.zeros((batch_size, n_pad), dtype=np.float32)
        ns = np.ones((batch_size,), dtype=np.int32)
        for i, (_, _, _, y) in enumerate(group):
            buf[i, : y.shape[0]] = y
            ns[i] = y.shape[0]
        fb, fl = log_mel_fbank_batch(buf, ns, sr)
        fb, fl = np.asarray(fb, dtype=np.float32), np.asarray(fl)
        for i, (text, wav_path, stem, _) in enumerate(group):
            clean_text, s_len = normalize_string(text)
            fbank = fb[i, : fl[i]]
            out_path = os.path.join(fbank_dir, stem + ".npy")
            np.save(out_path, fbank)
            rows.append((clean_text, out_path, s_len, fbank.shape[0], "na", wav_path))
            if len(rows) % 500 == 0:
                print(f"  processed {len(rows)} utterances", file=sys.stderr)

    with ThreadPoolExecutor(max_workers=N_JOBS) as ex:
        for loaded in ex.map(load, items):
            if loaded is None:
                continue
            n_pad = max(SIG_BUCKET, -(-loaded[3].shape[0] // SIG_BUCKET) * SIG_BUCKET)
            group = buckets.setdefault(n_pad, [])
            group.append(loaded)
            if len(group) == batch_size:
                flush(n_pad, buckets.pop(n_pad))
    for n_pad, group in sorted(buckets.items()):
        flush(n_pad, group)
    return rows


def _write_index(rows: List[Tuple], processed_dir: str, pad_to_max: bool) -> str:
    print("Sorting by frame length...")
    rows = sorted(rows, key=lambda r: r[3])
    index_path = os.path.join(processed_dir, "index.tsv")
    with open(index_path, "w", encoding="utf-8") as f:
        for r in rows:
            f.write("\t".join(str(a) for a in r) + "\n")
    if pad_to_max and rows:
        max_len = rows[-1][3]
        print(f"Zero-padding all fbanks to max_len={max_len} (reference layout)")
        for r in rows:
            fb = np.load(r[1])
            padded = np.zeros((max_len, fb.shape[1]), dtype=fb.dtype)
            padded[: fb.shape[0]] = fb
            np.save(r[1], padded)
    return index_path


def preprocess_malromur(
    index: str, wav_dir: str, processed_dir: Optional[str] = None,
    sr: int = DEFAULT_SR, pad_to_max: bool = False,
) -> str:
    """Málrómur corpus: CSV index with classification column == 'correct'
    (reference src/preprocess.py:135-162)."""
    processed_dir = processed_dir or os.path.join("data", "processed")
    os.makedirs(processed_dir, exist_ok=True)
    items: List[Tuple[str, str, str]] = []
    with open(index, "r", encoding="utf-8") as f:
        for line in f:
            d = line.rstrip().split(",")
            if len(d) > 7 and d[7] == "correct":
                items.append((d[5], os.path.join(wav_dir, d[0] + ".wav"), d[0]))
    print(f"Málrómur: {len(items)} verified utterances")
    rows = _emit_fbanks(items, processed_dir, sr)
    return _write_index(rows, processed_dir, pad_to_max)


def preprocess_generic(
    txt_dir: str, wav_dir: str, processed_dir: Optional[str] = None,
    sr: int = DEFAULT_SR, pad_to_max: bool = False,
) -> str:
    """Generic corpus: parallel <stem>.txt / <stem>.wav directories."""
    processed_dir = processed_dir or os.path.join("data", "processed")
    os.makedirs(processed_dir, exist_ok=True)
    items: List[Tuple[str, str, str]] = []
    for fname in sorted(os.listdir(txt_dir)):
        stem, ext = os.path.splitext(fname)
        if ext != ".txt":
            continue
        with open(os.path.join(txt_dir, fname), "r", encoding="utf-8") as f:
            text = "".join(s for s in f).strip()
        items.append((text, os.path.join(wav_dir, stem + ".wav"), stem))
    print(f"Generic corpus: {len(items)} utterances")
    rows = _emit_fbanks(items, processed_dir, sr)
    return _write_index(rows, processed_dir, pad_to_max)


def main(argv=None):
    parser = argparse.ArgumentParser(prog="ss_asr_tpu.preprocess")
    sub = parser.add_subparsers(dest="dataset", required=True)

    m = sub.add_parser("malromur")
    m.add_argument("output_dir", type=str)
    m.add_argument("index", type=str)
    m.add_argument("wav_dir", type=str)

    g = sub.add_parser("generic")
    g.add_argument("output_dir", type=str)
    g.add_argument("wav_dir", type=str)
    g.add_argument("txt_dir", type=str)

    for p in (m, g):
        p.add_argument("--sr", type=int, default=DEFAULT_SR,
                       help="target sample rate (reference/librosa default 22050)")
        p.add_argument("--pad-to-max", action="store_true",
                       help="zero-pad every fbank to the corpus max (reference layout)")

    args = parser.parse_args(argv)
    if args.dataset == "malromur":
        print("Preprocessing Malromur")
        preprocess_malromur(args.index, args.wav_dir, args.output_dir,
                            sr=args.sr, pad_to_max=args.pad_to_max)
    else:
        print("Preprocessing a generic dataset")
        preprocess_generic(args.txt_dir, args.wav_dir, args.output_dir,
                           sr=args.sr, pad_to_max=args.pad_to_max)


if __name__ == "__main__":
    main()
