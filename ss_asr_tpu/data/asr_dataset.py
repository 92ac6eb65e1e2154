"""ASR dataset: index-driven batches with bucketed static shapes.

Behavioral parity with the reference ASRDataset (src/ASRDataset.py): batches
are consecutive runs of the length-sorted index; text is encoded over the
fixed vocabulary and padded with SOS (= id 0); TAE mode returns
(clean, char-dropped) text pairs where SOS/EOS are never dropped; lengths
follow the reference conventions (x: true frame count, y: ``sum(!=0) + 1``).

TPU-native differences (deliberate):

* No global zero-padding of the corpus to one max length
  (src/preprocess.py:55-60) — each batch is padded to a *bucketed* frame /
  char length (rounded up to multiples of ``t_bucket`` / ``l_bucket``), so
  XLA sees a handful of static shapes instead of one giant one.
* Lengths ride the index metadata (``unpadded_num_frames``) rather than being
  recovered by counting nonzero frames — same values by the zero-pad
  contract, no wasted pass over the data.
* A background thread prefetches the next batches (replacing DataLoader
  workers, src/ASRDataset.py:294).
* For static batch shapes, a trailing partial batch is either dropped
  (training) or padded by repeating the last row with a validity mask (eval).
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import Iterator, List, Optional

import numpy as np

from ss_asr_tpu.data.index import load_index
from ss_asr_tpu.vocab import EOS_ID, SOS_ID, Mapper


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Optional native batch loader (C pthread pool reading .npy payloads straight
# into the padded batch buffer; replaces the reference's DataLoader workers).
def _get_batchloader():
    global _BATCHLOADER
    try:
        return _BATCHLOADER
    except NameError:
        pass
    import ctypes

    from ss_asr_tpu import native

    lib = native.load("batchloader.c", "libbatchloader.so")
    if lib is not None:
        lib.load_fbank_batch.restype = ctypes.c_int
        lib.load_fbank_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_long),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_long),
        ]
    _BATCHLOADER = lib
    return lib


def load_fbank_batch_native(
    paths, out: np.ndarray, lens: np.ndarray, n_threads: int = 8
) -> Optional[np.ndarray]:
    """Fill ``out[i, :lens[i]]`` from each .npy; returns per-row status array
    (0 = ok) or None when the native library is unavailable."""
    import ctypes

    lib = _get_batchloader()
    if lib is None:
        return None
    n, t_pad, feat = out.shape
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    lens64 = np.ascontiguousarray(lens, dtype=np.int64)
    status = np.zeros(n, dtype=np.int64)
    lib.load_fbank_batch(
        arr,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t_pad,
        feat,
        lens64.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        n_threads,
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
    )
    return status


@dataclass
class Batch:
    """One training batch with static (bucketed) shapes."""

    x: Optional[np.ndarray]  # [B, T, feat] float32 or None (text_only)
    x_lens: Optional[np.ndarray]  # [B] int32
    y: np.ndarray  # [B, L] int32 (SOS-padded)
    y_lens: np.ndarray  # [B] int32 (sum(!=0) + 1 convention)
    y_noised: Optional[np.ndarray] = None  # [B, Ln] int32 (TAE mode)
    y_noised_lens: Optional[np.ndarray] = None
    valid: Optional[np.ndarray] = None  # [B] bool, False for repeat-padding


class ASRDataset:
    def __init__(
        self,
        tsv_file: str,
        batch_size: int = 32,
        text_only: bool = False,
        drop_rate: float = 0.0,
        t_bucket: int = 128,
        l_bucket: int = 16,
        sort_key: str = "",
        sort_ascending: bool = True,
        seed: int = 0,
        host_shard: "tuple[int, int] | None" = None,
    ):
        self.frame = load_index(tsv_file)
        if sort_key:
            self.frame = self.frame.sort_values(by=[sort_key], ascending=sort_ascending)
        self.host_shard = host_shard
        self._full_frame = self.frame
        if host_shard is not None:
            # multi-host input pipeline: each process reads a strided shard
            self.frame = shard_index_rows(self.frame, *host_shard)
        self.batch_size = batch_size
        self.text_only = text_only
        self.drop_rate = drop_rate
        self.t_bucket = t_bucket
        self.l_bucket = l_bucket
        self.mapper = Mapper()
        self.rng = np.random.default_rng(seed)
        self._epoch = 0
        self.num_samples = len(self.frame)
        if not text_only and self.num_samples > 0:
            self.feature_dim = int(np.load(self.frame.iloc[0]["path_to_fbank"]).shape[1])
        else:
            self.feature_dim = 0

    def set_epoch(self, epoch: int) -> None:
        """Per-epoch fairness rotation (multi-host).

        The multi-host step cap (Solver.global_min_batches) makes every host
        dispatch the same number of batches; whatever a host's iteration
        order leaves past the cap is skipped that epoch. TWO rotations
        together guarantee no row is skipped forever:

        * the strided shard offset rotates (which rows live on which host),
          and
        * ``iter_batches`` rotates its batch dispatch ORDER by the same
          epoch index — so the batches dropped by the cap are different
          ones each epoch (rotating shards alone would be a global no-op:
          the cap always trims each shard's tail, and the union of trained
          rows would be epoch-invariant).

        No-op without a host shard.
        """
        self._epoch = int(epoch)
        if self.host_shard is None:
            return
        host_id, num_hosts = self.host_shard
        self.frame = shard_index_rows(
            self._full_frame, (host_id + epoch) % num_hosts, num_hosts
        )
        self.num_samples = len(self.frame)

    # -- reference API parity helpers ------------------------------------
    def get_char_dim(self) -> int:
        return self.mapper.get_dim()

    def get_feature_dim(self) -> int:
        return self.feature_dim

    def __len__(self) -> int:
        """Number of full batches."""
        return self.num_samples // self.batch_size

    def num_batches(self, drop_last: bool = True) -> int:
        """Batch count as iter_batches will actually yield it."""
        if drop_last:
            return self.num_samples // self.batch_size
        return (self.num_samples + self.batch_size - 1) // self.batch_size

    # -- internals --------------------------------------------------------
    def _drop_chars(self, ids: np.ndarray) -> np.ndarray:
        """Char-drop noise; SOS/EOS always kept (src/ASRDataset.py:111-129)."""
        if self.drop_rate <= 0:
            return ids
        keep = (ids == SOS_ID) | (ids == EOS_ID) | (
            self.rng.random(ids.shape[0]) > self.drop_rate
        )
        return ids[keep]

    def _encode_rows(self, rows, noised: bool) -> tuple[np.ndarray, np.ndarray]:
        enc: List[np.ndarray] = []
        for text in rows["normalized_text"]:
            ids = self.mapper.encode(text)
            if noised:
                ids = self._drop_chars(ids)
            enc.append(ids)
        lens = np.array([e.shape[0] for e in enc], dtype=np.int32)
        L = round_up(int(lens.max()), self.l_bucket)
        out = np.full((len(enc), L), SOS_ID, dtype=np.int32)
        for i, e in enumerate(enc):
            out[i, : e.shape[0]] = e
        return out, lens

    def _load_fbanks(self, rows) -> tuple[np.ndarray, np.ndarray]:
        paths = list(rows["path_to_fbank"])
        lens = rows["unpadded_num_frames"].to_numpy(dtype=np.int32)
        T = round_up(int(lens.max()), self.t_bucket)
        out = np.zeros((len(paths), T, self.feature_dim), dtype=np.float32)
        clipped = np.minimum(lens, T)
        status = load_fbank_batch_native(paths, out, clipped)
        if status is None:
            bad = range(len(paths))  # no native lib: load everything in python
        else:
            bad = np.nonzero(status != 0)[0]
        # python fallback rows; tolerates globally-padded (reference layout)
        # and exact-length fbanks alike
        for i in bad:
            fb = np.load(paths[i])
            ln = min(int(lens[i]), fb.shape[0], T)
            out[i, :ln] = fb[:ln]
        return out, lens

    def get_batch(self, start: int, pad_to_full: bool = False) -> Batch:
        stop = min(start + self.batch_size, self.num_samples)
        rows = self.frame.iloc[start:stop]
        n = len(rows)
        valid = None
        if pad_to_full and n < self.batch_size:
            reps = self.frame.iloc[[stop - 1] * (self.batch_size - n)]
            import pandas as pd

            rows = pd.concat([rows, reps])
            valid = np.arange(self.batch_size) < n

        y, y_raw_lens = self._encode_rows(rows, noised=False)
        y_lens = ((y != 0).sum(axis=-1) + 1).astype(np.int32)

        if self.text_only:
            if self.drop_rate > 0:
                yn, _ = self._encode_rows(rows, noised=True)
                yn_lens = ((yn != 0).sum(axis=-1) + 1).astype(np.int32)
                return Batch(None, None, y, y_lens, yn, yn_lens, valid)
            # drop_rate 0 = a plain noise-free autoencoder: the "noised"
            # input is the clean text (None here would crash the jitted
            # TAE train step)
            return Batch(None, None, y, y_lens, y.copy(), y_lens.copy(), valid)

        x, x_lens = self._load_fbanks(rows)
        return Batch(x, x_lens, y, y_lens, valid=valid)

    def iter_batches(
        self,
        shuffle: bool = False,
        drop_last: bool = True,
        prefetch: int = 2,
        seed: Optional[int] = None,
    ) -> Iterator[Batch]:
        """Iterate batches with background-thread prefetch."""
        starts = list(range(0, self.num_samples, self.batch_size))
        if drop_last:
            starts = [s for s in starts if s + self.batch_size <= self.num_samples]
        if shuffle:
            rng = np.random.default_rng(seed if seed is not None else self.rng.integers(2**31))
            rng.shuffle(starts)
        elif self.host_shard is not None and self._epoch and len(starts) > 1:
            # rotate the dispatch order so the multi-host step cap drops a
            # DIFFERENT tail each epoch (see set_epoch)
            r = self._epoch % len(starts)
            starts = starts[r:] + starts[:r]
        if prefetch <= 0:
            for s in starts:
                yield self.get_batch(s, pad_to_full=not drop_last)
            return

        q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        stop_token = object()
        cancelled = threading.Event()

        def producer():
            try:
                for s in starts:
                    batch = self.get_batch(s, pad_to_full=not drop_last)
                    # bounded put with a cancellation check: a consumer that
                    # abandons the generator (e.g. the multi-host step-count
                    # cap breaking out early) must not leave this thread
                    # blocked on a full queue forever
                    while not cancelled.is_set():
                        try:
                            q.put(batch, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if cancelled.is_set():
                        return
                q.put(stop_token)
            except BaseException as e:  # propagate into the consumer
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop_token:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            cancelled.set()
            while not q.empty():  # unblock a producer mid-put
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


def load_asr_dataset(
    path: str,
    batch_size: int = 32,
    text_only: bool = False,
    drop_rate: float = 0.0,
    **kw,
):
    """Reference-parity loader: returns (Mapper, ASRDataset)."""
    ds = ASRDataset(path, batch_size, text_only=text_only, drop_rate=drop_rate, **kw)
    return ds.mapper, ds


def prepare_x(x: np.ndarray):
    """Reference-API compat (src/ASRDataset.py:297-317): recover unpadded
    fbank lengths by counting frames with any nonzero value.

    Accepts [B, T, F] (or the reference's [1, B, T, F]); returns
    (x float32, x_lens int32 ndarray)."""
    x = np.asarray(x, dtype=np.float32)
    if x.ndim == 4:
        x = x[0]
    x_lens = (x.sum(axis=-1) != 0).sum(axis=-1).astype(np.int32)
    return x, x_lens


def prepare_y(y: np.ndarray):
    """Reference-API compat (src/ASRDataset.py:319-339): text lengths under
    the SOS-as-pad convention — ``sum(y != 0) + 1``."""
    y = np.asarray(y, dtype=np.int32)
    if y.ndim == 3:
        y = y[0]
    y_lens = ((y != 0).sum(axis=-1) + 1).astype(np.int32)
    return y, y_lens


def shard_index_rows(frame, host_id: int, num_hosts: int):
    """Per-host shard of a length-sorted index for multi-host input pipelines.

    Strided slicing keeps each host's shard length-sorted (so per-host
    bucketing still works) while balancing total audio across hosts.
    """
    return frame.iloc[host_id::num_hosts]
