import os

import numpy as np
import pytest

from ss_asr_tpu.data.asr_dataset import ASRDataset, round_up
from ss_asr_tpu.data.index import load_index, make_split, save_index, sort_index
from ss_asr_tpu.data.lm_dataset import LMDataset, make_split as lm_split
from ss_asr_tpu.vocab import EOS_ID, SOS_ID, normalize_string


@pytest.fixture
def tiny_corpus(tmp_path):
    """Write a tiny synthetic corpus: 10 fake fbanks + index.tsv."""
    rng = np.random.default_rng(0)
    fdir = tmp_path / "fbanks"
    fdir.mkdir()
    rows = []
    texts = [
        "halló heimur", "góðan daginn", "já", "nei takk", "þetta er próf",
        "einn tveir þrír", "fjórir fimm", "sex sjö átta", "níu tíu", "ellefu",
    ]
    for i, t in enumerate(texts):
        T = 20 + 13 * i
        fb = rng.standard_normal((T, 40)).astype(np.float32)
        p = str(fdir / f"u{i}.npy")
        np.save(p, fb)
        norm, s_len = normalize_string(t)
        rows.append((norm, p, s_len, T, "na", f"u{i}.wav"))
    rows.sort(key=lambda r: r[3])
    idx = tmp_path / "index.tsv"
    with open(idx, "w", encoding="utf-8") as f:
        for r in rows:
            f.write("\t".join(str(a) for a in r) + "\n")
    return str(idx)


def test_index_roundtrip(tiny_corpus, tmp_path):
    df = load_index(tiny_corpus)
    assert len(df) == 10
    assert list(df.columns)[0] == "normalized_text"
    out = str(tmp_path / "re.tsv")
    save_index(df, out)
    df2 = load_index(out)
    assert (df2["unpadded_num_frames"] == df["unpadded_num_frames"]).all()


def test_sort_and_split(tiny_corpus, tmp_path):
    sort_index(tiny_corpus, "unpadded_num_frames", sort_ascending=False,
               out_index=str(tmp_path / "desc.tsv"))
    df = load_index(str(tmp_path / "desc.tsv"))
    assert df["unpadded_num_frames"].is_monotonic_decreasing
    make_split(tiny_corpus, seed=0)
    tr = load_index(str(tmp_path / "train.tsv"))
    ev = load_index(str(tmp_path / "eval.tsv"))
    assert len(tr) + len(ev) == 10


def test_subset_by_t(tiny_corpus, tmp_path):
    """Low-resource subsetting (the parity harness' 2.5/5/10-hour
    conditions): ~t seconds at avg_utt_s per row, deterministic by seed."""
    from ss_asr_tpu.data.index import subset_by_t

    out = str(tmp_path / "sub.tsv")
    subset_by_t(3 * 4.5, tiny_corpus, out, seed=0)
    sub = load_index(out)
    assert len(sub) == 3
    full_texts = set(load_index(tiny_corpus)["normalized_text"])
    assert set(sub["normalized_text"]) <= full_texts
    # deterministic: same seed -> same sample
    subset_by_t(3 * 4.5, tiny_corpus, out, seed=0)
    assert list(load_index(out)["normalized_text"]) == list(sub["normalized_text"])
    # asking for >= the whole corpus is a usage error, not silent truncation
    with pytest.raises(ValueError, match="whole corpus"):
        subset_by_t(100 * 4.5, tiny_corpus, out, seed=0)


def test_asr_batches_bucketed(tiny_corpus):
    ds = ASRDataset(tiny_corpus, batch_size=4, t_bucket=32, l_bucket=8)
    batches = list(ds.iter_batches(prefetch=0))
    assert len(batches) == 2  # 10 // 4, last partial dropped
    for b in batches:
        assert b.x.shape[0] == 4
        assert b.x.shape[1] % 32 == 0
        assert b.y.shape[1] % 8 == 0
        assert b.x.dtype == np.float32 and b.y.dtype == np.int32
        # frames past x_lens are zero
        for i in range(4):
            assert np.all(b.x[i, b.x_lens[i]:] == 0)
        # y_lens convention: sum(!=0) + 1
        np.testing.assert_array_equal(b.y_lens, (b.y != 0).sum(-1) + 1)
        # every row starts with SOS and contains EOS
        assert np.all(b.y[:, 0] == SOS_ID)
        assert np.all((b.y == EOS_ID).sum(-1) == 1)


def test_asr_eval_padding_with_valid_mask(tiny_corpus):
    ds = ASRDataset(tiny_corpus, batch_size=4)
    batches = list(ds.iter_batches(drop_last=False, prefetch=0))
    assert len(batches) == 3
    last = batches[-1]
    assert last.x.shape[0] == 4
    assert last.valid is not None
    np.testing.assert_array_equal(last.valid, [True, True, False, False])


def test_text_only_with_noise(tiny_corpus):
    ds = ASRDataset(tiny_corpus, batch_size=4, text_only=True, drop_rate=0.5, seed=1)
    b = next(ds.iter_batches(prefetch=0))
    assert b.x is None
    assert b.y_noised is not None
    # noise only drops: noised lengths <= clean lengths
    assert np.all(b.y_noised_lens <= b.y_lens)
    # SOS/EOS survive in every noised row
    assert np.all(b.y_noised[:, 0] == SOS_ID)
    assert np.all((b.y_noised == EOS_ID).sum(-1) == 1)


def test_prefetch_matches_sync(tiny_corpus):
    ds = ASRDataset(tiny_corpus, batch_size=4)
    sync = list(ds.iter_batches(prefetch=0))
    pre = list(ds.iter_batches(prefetch=2))
    assert len(sync) == len(pre)
    for a, b in zip(sync, pre):
        np.testing.assert_array_equal(a.x, b.x)
        np.testing.assert_array_equal(a.y, b.y)


def test_lm_dataset_chunks(tmp_path):
    text = "abcdefghij" * 30  # 300 chars
    f = tmp_path / "corpus.txt"
    f.write_text(text)
    ds = LMDataset(str(f), chunk_size=50)
    assert len(ds) == (300 - 1) // 50
    x, y = ds.get_chunk(0)
    assert x.shape == (50,) and y.shape == (50,)
    # y is x shifted by one
    np.testing.assert_array_equal(x[1:], y[:-1])
    # chunk 1 starts where chunk 0 ended (stride == chunk_size, defect fix)
    x1, _ = ds.get_chunk(1)
    ids_all = ds.ids
    np.testing.assert_array_equal(x1, ids_all[50:100])


def test_lm_batches(tmp_path):
    f = tmp_path / "c.txt"
    f.write_text("halló heimur " * 100)
    ds = LMDataset(str(f), chunk_size=20)
    batches = list(ds.iter_batches(batch_size=8, shuffle=True, seed=0))
    assert all(x.shape == (8, 20) for x, y in batches)
    assert len(batches) == len(ds) // 8


def test_lm_split(tmp_path):
    f = tmp_path / "c.txt"
    f.write_text("x" * 100)
    lm_split(str(f), str(tmp_path / "tr.txt"), str(tmp_path / "ev.txt"), split=0.9)
    assert len((tmp_path / "tr.txt").read_text()) == 90
    assert len((tmp_path / "ev.txt").read_text()) == 10


def test_round_up():
    assert round_up(1, 16) == 16
    assert round_up(16, 16) == 16
    assert round_up(17, 16) == 32


def test_prepare_x_y_compat(tiny_corpus):
    from ss_asr_tpu.data.asr_dataset import prepare_x, prepare_y

    ds = ASRDataset(tiny_corpus, batch_size=4)
    b = next(ds.iter_batches(prefetch=0))
    x, x_lens = prepare_x(b.x)
    np.testing.assert_array_equal(x_lens, b.x_lens)
    y, y_lens = prepare_y(b.y)
    np.testing.assert_array_equal(y_lens, b.y_lens)
    # reference shape convention: a leading unit axis is squeezed
    x2, _ = prepare_x(b.x[None])
    assert x2.shape == b.x.shape


def test_host_sharding(tiny_corpus):
    full = ASRDataset(tiny_corpus, batch_size=2)
    s0 = ASRDataset(tiny_corpus, batch_size=2, host_shard=(0, 2))
    s1 = ASRDataset(tiny_corpus, batch_size=2, host_shard=(1, 2))
    assert s0.num_samples + s1.num_samples == full.num_samples
    # shards are disjoint
    p0 = set(s0.frame["path_to_fbank"])
    p1 = set(s1.frame["path_to_fbank"])
    assert not (p0 & p1)
    # strided sharding keeps each shard length-sorted
    assert list(s0.frame["unpadded_num_frames"]) == sorted(s0.frame["unpadded_num_frames"])


def test_host_shard_epoch_rotation(tiny_corpus):
    """set_epoch rotates the strided offset: every epoch the host pair still
    partitions the corpus, and over num_hosts epochs each host sees ALL rows."""
    full = ASRDataset(tiny_corpus, batch_size=2)
    s0 = ASRDataset(tiny_corpus, batch_size=2, host_shard=(0, 2))
    s1 = ASRDataset(tiny_corpus, batch_size=2, host_shard=(1, 2))
    all_paths = set(full.frame["path_to_fbank"])
    seen0 = set()
    for epoch in range(2):
        s0.set_epoch(epoch)
        s1.set_epoch(epoch)
        p0 = set(s0.frame["path_to_fbank"])
        p1 = set(s1.frame["path_to_fbank"])
        assert not (p0 & p1)
        assert p0 | p1 == all_paths  # still a partition every epoch
        assert s0.num_samples == len(p0)
        seen0 |= p0
    assert seen0 == all_paths  # host 0 saw every row across the cycle
    # shard-less datasets: set_epoch is a no-op
    full.set_epoch(3)
    assert set(full.frame["path_to_fbank"]) == all_paths


def test_step_cap_strands_no_row_forever(tmp_path):
    """The GLOBAL fairness property under the multi-host step cap: with an
    uneven corpus (one shard packs more batches than the cap allows), the
    union of rows actually DISPATCHED by both hosts — batches 0..n_steps-1
    of each epoch's iteration order — must eventually cover the corpus.
    Rotating shards alone is a global no-op here (the cap always trims each
    shard's tail); the dispatch-order rotation in iter_batches is what
    cycles the dropped batches."""
    from tests.conftest import write_asr_corpus

    texts = [f"orð{i}" for i in range(11)]
    idx = write_asr_corpus(tmp_path, texts, feature_dim=8, t0=24, dt=0, scale=0.1)
    s0 = ASRDataset(idx, batch_size=1, host_shard=(0, 2))
    s1 = ASRDataset(idx, batch_size=1, host_shard=(1, 2))
    dispatched = set()
    for epoch in range(4):
        for ds in (s0, s1):
            ds.set_epoch(epoch)
        n_steps = min(len(s0), len(s1))  # global_min_batches
        assert n_steps == 5  # shards are 6/5 rows -> the cap really bites
        for ds in (s0, s1):
            for b_idx, b in enumerate(ds.iter_batches(prefetch=0)):
                if b_idx >= n_steps:  # the trainers' cap break
                    break
                # batch_size=1 + unique texts: the y row identifies the row
                dispatched.add(ds.mapper.translate(b.y[0]))
    full_ds = ASRDataset(idx, batch_size=11)
    all_texts = {full_ds.mapper.translate(r) for r in full_ds.get_batch(0).y}
    assert dispatched == all_texts  # no row stranded across epochs


def test_native_batchloader_matches_numpy(tiny_corpus):
    from ss_asr_tpu.data.asr_dataset import load_fbank_batch_native

    ds = ASRDataset(tiny_corpus, batch_size=4)
    rows = ds.frame.iloc[0:4]
    paths = list(rows["path_to_fbank"])
    lens = rows["unpadded_num_frames"].to_numpy(dtype=np.int32)
    T = int(lens.max())
    out = np.zeros((4, T, 40), dtype=np.float32)
    status = load_fbank_batch_native(paths, out, lens)
    if status is None:
        pytest.skip("native batchloader unavailable")
    assert np.all(status == 0)
    for i, p in enumerate(paths):
        ref = np.load(p)
        np.testing.assert_array_equal(out[i, : lens[i]], ref[: lens[i]])
        assert np.all(out[i, lens[i]:] == 0)


def test_native_batchloader_bad_file_falls_back(tmp_path, tiny_corpus):
    from ss_asr_tpu.data.asr_dataset import load_fbank_batch_native

    bogus = tmp_path / "bogus.npy"
    bogus.write_bytes(b"not a npy file")
    out = np.zeros((1, 8, 40), dtype=np.float32)
    status = load_fbank_batch_native([str(bogus)], out, np.array([8]))
    if status is None:
        pytest.skip("native batchloader unavailable")
    assert status[0] != 0  # flagged, python fallback path would handle it


def test_prefetch_propagates_producer_errors(tmp_path):
    """A corrupt row must raise in the consumer, not silently end the epoch."""
    fdir = tmp_path / "fb"
    fdir.mkdir()
    np.save(str(fdir / "ok.npy"), np.zeros((10, 40), np.float32))
    rows = [
        ("<ab>", str(fdir / "ok.npy"), 4, 10, "na", "a.wav"),
        ("<cd>", str(fdir / "missing.npy"), 4, 12, "na", "b.wav"),
    ]
    idx = tmp_path / "i.tsv"
    with open(idx, "w") as f:
        for r in rows:
            f.write("\t".join(map(str, r)) + "\n")
    ds = ASRDataset(str(idx), batch_size=2)
    with pytest.raises(FileNotFoundError):
        list(ds.iter_batches(prefetch=2))


def test_num_batches(tiny_corpus):
    ds = ASRDataset(tiny_corpus, batch_size=4)
    assert ds.num_batches(drop_last=True) == 2
    assert ds.num_batches(drop_last=False) == 3
    assert len(list(ds.iter_batches(drop_last=False, prefetch=0))) == 3


def test_lm_dataset_host_shards_disjoint_and_equal(tmp_path):
    """Multi-host LM shards: disjoint chunk sets, truncated to EQUAL sizes
    (unequal per-host step counts would hang the cross-process pmean)."""
    f = tmp_path / "lm.txt"
    f.write_text("abc def ghi " * 100, encoding="utf-8")
    full = LMDataset(str(f), chunk_size=20)
    s0 = LMDataset(str(f), chunk_size=20, host_shard=(0, 2))
    s1 = LMDataset(str(f), chunk_size=20, host_shard=(1, 2))
    ids0, ids1 = set(s0.chunk_ids.tolist()), set(s1.chunk_ids.tolist())
    assert len(s0) == len(s1) == len(full) // 2
    assert not (ids0 & ids1)
    assert (ids0 | ids1) <= set(range(len(full)))
    # chunks come from the shard only
    x0, y0 = next(s0.iter_batches(2, shuffle=False))
    assert x0.shape == (2, 20)


def test_lm_shard_epoch_rotation(tmp_path):
    """LMDataset.set_epoch rotates the strided chunk shard: shards stay
    disjoint and equal-size each epoch, and one host covers ALL chunks over
    num_hosts epochs (same fairness contract as ASRDataset.set_epoch)."""
    from ss_asr_tpu.data.lm_dataset import LMDataset

    text = "abcdefghij " * 30
    full = set(LMDataset(text=text, chunk_size=20).chunk_ids)
    s0 = LMDataset(text=text, chunk_size=20, host_shard=(0, 2))
    s1 = LMDataset(text=text, chunk_size=20, host_shard=(1, 2))
    seen0 = set()
    for epoch in range(2):
        s0.set_epoch(epoch)
        s1.set_epoch(epoch)
        c0, c1 = set(s0.chunk_ids), set(s1.chunk_ids)
        assert not (c0 & c1)
        assert len(c0) == len(c1)  # equal-size truncation preserved
        seen0 |= c0
    assert seen0 == full


def test_tae_batches_without_noise(tiny_corpus):
    """drop_rate=0 (a plain noise-free autoencoder) must yield the clean
    text as the 'noised' input, never None into the jitted TAE step."""
    ds = ASRDataset(tiny_corpus, batch_size=4, text_only=True, drop_rate=0.0)
    b = next(ds.iter_batches(prefetch=0))
    assert b.y_noised is not None and b.y_noised_lens is not None
    np.testing.assert_array_equal(b.y_noised, b.y)


def test_abandoned_prefetch_iterator_stops_producer(tiny_corpus):
    """Breaking out of iter_batches mid-iteration (the multi-host step cap
    does this every epoch) must not leave the prefetch thread blocked on
    the bounded queue forever."""
    import gc
    import threading
    import time

    before = threading.active_count()
    ds = ASRDataset(tiny_corpus, batch_size=2)
    it = ds.iter_batches(prefetch=2)
    next(it)
    it.close()  # what an abandoned for-loop break does via GC
    gc.collect()
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "prefetch producer leaked"
