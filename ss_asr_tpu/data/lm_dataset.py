"""Char-LM dataset: a text corpus sliced into fixed-size chunks.

Parity with the reference LMDataset (src/LMDataset.py) with one deliberate
fix: the reference indexes chunk ``i`` at character offset ``i`` instead of
``i * chunk_size`` (src/LMDataset.py:74), so only the first
``len(file)/chunk_size`` characters of the corpus are ever used as chunk
starts.  The evident intent — non-overlapping consecutive chunks covering the
corpus — is what we implement.

Batches are ``(x, y)`` int32 arrays of shape [B, chunk_size] with ``y``
shifted one character ahead of ``x``.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np

from ss_asr_tpu.vocab import Mapper, UNK_ID


class LMDataset:
    def __init__(
        self,
        filename: Optional[str] = None,
        chunk_size: int = 200,
        text: Optional[str] = None,
        host_shard: "Optional[Tuple[int, int]]" = None,
    ):
        self.mapper = Mapper()
        if text is None and filename is not None:
            with open(filename, "r", encoding="utf-8") as f:
                text = f.read()
        self.text = text or ""
        self.chunk_size = chunk_size
        # encode once; unknown chars (stray newlines etc.) -> UNK
        self.ids = np.array(
            [self.mapper.mapping.get(c, UNK_ID) for c in self.text], dtype=np.int32
        )
        self._n_total = max(0, (len(self.ids) - 1) // self.chunk_size)
        self.host_shard = host_shard
        self._shard(0)

    def _shard(self, epoch: int) -> None:
        if self.host_shard is not None:
            # multi-host input pipeline: strided per-process chunk shards,
            # TRUNCATED to equal size so every process dispatches the same
            # number of collective train steps (unequal counts would hang
            # the cross-process pmean). The strided list is ROLLED by the
            # epoch before truncation — truncating the same end every epoch
            # would strand the same chunks forever (rotating only the shard
            # offset cannot fix that: the over-long residue class keeps the
            # same tail chunk whichever host holds it).
            host_id, num_hosts = self.host_shard
            per = self._n_total // num_hosts
            offset = (host_id + epoch) % num_hosts
            strided = np.arange(self._n_total)[offset::num_hosts]
            self.chunk_ids = np.roll(strided, -epoch)[:per]
        else:
            self.chunk_ids = np.arange(self._n_total)

    def set_epoch(self, epoch: int) -> None:
        """Per-epoch fairness rotation (same contract as
        ASRDataset.set_epoch): both the shard offset and the truncation
        window rotate, so no chunk is dropped forever."""
        self._shard(epoch)

    def get_num_chars(self) -> int:
        return self.mapper.get_dim()

    def __len__(self) -> int:
        """Number of full chunks (a chunk consumes chunk_size + 1 chars)."""
        return len(self.chunk_ids)

    def get_chunk(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        s = i * self.chunk_size
        chunk = self.ids[s : s + self.chunk_size + 1]
        return chunk[:-1], chunk[1:]

    def iter_batches(
        self, batch_size: int, shuffle: bool = True, seed: int = 0
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Yields (x, y) [B, chunk_size] batches; drops the last partial."""
        n = len(self)
        order = self.chunk_ids.copy()
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        for b in range(n // batch_size):
            idx = order[b * batch_size : (b + 1) * batch_size]
            xs, ys = zip(*(self.get_chunk(int(i)) for i in idx))
            yield np.stack(xs), np.stack(ys)


def load_lm_dataset(filename: str, chunk_size: int, batch_size: int, **kw) -> LMDataset:
    return LMDataset(filename, chunk_size)


def make_split(filename: str, train_file: str, eval_file: str, split: float = 0.9) -> None:
    """90/10 character-level split of a corpus file (src/LMDataset.py:87-102)."""
    with open(filename, "r", encoding="utf-8") as f:
        text = f.read()
    train_len = int(split * len(text))
    with open(train_file, "w", encoding="utf-8") as t:
        t.write(text[:train_len])
    with open(eval_file, "w", encoding="utf-8") as e:
        e.write(text[train_len:])
