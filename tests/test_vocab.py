import numpy as np
import pytest

from ss_asr_tpu.vocab import (
    ALL_CHARS,
    EOS_ID,
    EOS_TKN,
    SOS_ID,
    SOS_TKN,
    TOKENS,
    UNK_ID,
    UNK_TKN,
    VOCAB,
    VOCAB_SIZE,
    Mapper,
    encode_texts,
    normalize_string,
    trim_eos,
)


def test_vocab_layout():
    # 50-symbol inventory with fixed special token ids (reference contract)
    assert VOCAB_SIZE == 50
    assert VOCAB[SOS_ID] == SOS_TKN == "<"
    assert VOCAB[EOS_ID] == EOS_TKN == ">"
    assert VOCAB[UNK_ID] == UNK_TKN == "$"
    assert VOCAB == TOKENS + ALL_CHARS
    assert len(set(VOCAB)) == 50


def test_normalize_basic():
    s, s_len = normalize_string("Halló  Heimur")
    assert s == "<halló heimur>"
    # pre-normalization length ("halló heimur" = 12) + 2
    assert s_len == 14


def test_normalize_unk_substitution():
    s, _ = normalize_string("abc;def")
    assert s == "<abc$def>"


def test_normalize_no_tokens():
    s, _ = normalize_string("abc", append_tokens=False)
    assert s == "abc"


def test_normalize_whitespace_collapse():
    s, s_len = normalize_string("a \t\n b")
    assert s == "<a b>"
    assert s_len == 5


def test_normalize_icelandic_kept():
    s, _ = normalize_string("þór æðstur")
    assert "$" not in s


def test_mapper_roundtrip():
    m = Mapper()
    assert m.get_dim() == 50
    for ch in VOCAB:
        assert m.ind_to_char(m.char_to_ind(ch)) == ch
    ids = m.encode("<halló>")
    assert ids.dtype == np.int32
    assert m.decode(ids) == "<halló>"


def test_mapper_translate_trims():
    m = Mapper()
    ids = m.encode("<abc>")
    # append junk after EOS: translate must cut at EOS and strip SOS/EOS
    seq = list(ids) + [5, 6, 7]
    assert m.translate(seq) == "abc"


def test_trim_eos():
    assert trim_eos([4, 5, 1, 9, 9]) == [4, 5, 1]
    assert trim_eos([4, 5]) == [4, 5]


def test_encode_texts_padding():
    m = Mapper()
    ids, lens = encode_texts(["<ab>", "<a>"], m)
    assert ids.shape == (2, 4)
    # pad symbol is SOS id 0
    assert ids[1, 3] == 0
    # prepare_y convention: sum(y != 0) + 1
    np.testing.assert_array_equal((ids != 0).sum(-1) + 1, [4, 3])


def test_encode_texts_lengths_are_char_counts():
    m = Mapper()
    ids, lens = encode_texts(["<ab>", "<a>"], m)
    np.testing.assert_array_equal(lens, [4, 3])
