"""Character vocabulary, text normalization and index<->char mapping.

Behavioral contract (cf. reference src/preprocess.py:17-33,226-251 and
src/ASRDataset.py:228-262):

* The vocabulary is a fixed 50-symbol set: three special tokens followed by the
  latin+digit+Icelandic+punctuation character inventory.
* ``<`` is SOS and index 0.  It doubles as the text *padding* symbol; losses use
  an ignore-index of 0 to neutralize it.
* ``>`` is EOS and index 1; ``$`` is UNK and index 2.
* Normalization lowercases, collapses whitespace, substitutes out-of-inventory
  characters with UNK, and (optionally) wraps the string in SOS/EOS.  The
  returned length is the *pre-substitution* length plus two (SOS+EOS).
"""

from __future__ import annotations

import re
from typing import List, Sequence, Tuple

import numpy as np

CHARS = "abcdefghijklmnoprstuvxy0123456789"
ICE_CHARS = "áéíóúýæöþð"
SPECIAL_CHARS = " .,?"
ALL_CHARS = CHARS + ICE_CHARS + SPECIAL_CHARS

SOS_TKN = "<"
EOS_TKN = ">"
UNK_TKN = "$"
TOKENS = SOS_TKN + EOS_TKN + UNK_TKN

#: Full vocabulary string; position == integer id.
VOCAB = TOKENS + ALL_CHARS

SOS_ID = 0
EOS_ID = 1
UNK_ID = 2

#: Size of the character inventory (50 for the Icelandic setup).
VOCAB_SIZE = len(VOCAB)

_OOV_RE = re.compile(r"[^0-9{}]".format(re.escape(CHARS + ICE_CHARS + SPECIAL_CHARS)))
_WS_RE = re.compile(r"\s+")


def normalize_string(s: str, append_tokens: bool = True) -> Tuple[str, int]:
    """Normalize raw text into the closed character inventory.

    Returns ``(normalized, s_len)`` where ``s_len`` is the length of the
    whitespace-collapsed lowercase string plus 2 (accounting for SOS/EOS),
    measured *before* UNK substitution — matching the reference semantics
    (src/preprocess.py:226-251).
    """
    s = s.lower()
    s = _WS_RE.sub(" ", s)
    s_len = len(s) + 2
    s = _OOV_RE.sub(UNK_TKN, s)
    if append_tokens:
        s = SOS_TKN + s + EOS_TKN
    return s, s_len


class Mapper:
    """Bidirectional char<->index mapping over the fixed vocabulary.

    API parity with the reference's ``Mapper`` (src/ASRDataset.py:228-262):
    ``get_dim``, ``translate`` (trims at EOS, strips SOS/EOS), ``ind_to_char``,
    ``char_to_ind`` — plus vectorized ``encode``/``decode`` helpers.
    """

    def __init__(self, tokens: str = VOCAB):
        self.tokens = tokens
        self.mapping = {tokens[i]: i for i in range(len(tokens))}
        self.r_mapping = {v: k for k, v in self.mapping.items()}

    def get_dim(self) -> int:
        return len(self.mapping)

    def char_to_ind(self, char: str) -> int:
        return self.mapping[char]

    def ind_to_char(self, ind: int) -> str:
        return self.r_mapping[int(ind)]

    def encode(self, text: str) -> np.ndarray:
        """String -> int32 id array (no implicit SOS/EOS handling)."""
        return np.array([self.mapping[c] for c in text], dtype=np.int32)

    def decode(self, ids: Sequence[int]) -> str:
        """Id sequence -> string, verbatim (no EOS trimming)."""
        return "".join(self.r_mapping[int(i)] for i in ids)

    def translate(self, seq: Sequence[int]) -> str:
        """Id sequence -> human string: cut after first EOS, drop SOS/EOS."""
        out: List[str] = []
        for c in trim_eos(seq):
            out.append(self.r_mapping[c])
        return "".join(out).replace(SOS_TKN, "").replace(EOS_TKN, "")


def trim_eos(sequence: Sequence[int]) -> List[int]:
    """Keep ids up to and including the first EOS (id 1).

    Mirrors reference ``trim_eos`` (src/postprocess.py:66-73) including its
    include-the-EOS behavior.
    """
    out: List[int] = []
    for char in sequence:
        out.append(int(char))
        if int(char) == EOS_ID:
            break
    return out


def encode_texts(
    texts: Sequence[str], mapper: Mapper, pad_to: int | None = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Encode a batch of (already normalized, SOS/EOS-wrapped) strings.

    Pads with SOS (= id 0, the pad symbol) to ``pad_to`` or the batch max.
    Returns ``(ids [B, L] int32, lengths [B] int32)`` where lengths count the
    true characters *excluding* leading SOS but including EOS, plus one —
    i.e. the reference's ``prepare_y`` convention ``sum(y != 0) + 1``
    (src/ASRDataset.py:319-339).
    """
    encoded = [mapper.encode(t) for t in texts]
    lens = np.array([e.shape[0] for e in encoded], dtype=np.int32)
    max_len = int(pad_to) if pad_to is not None else int(lens.max())
    out = np.full((len(texts), max_len), SOS_ID, dtype=np.int32)
    for i, e in enumerate(encoded):
        out[i, : e.shape[0]] = e[:max_len]
    return out, np.minimum(lens, max_len)
