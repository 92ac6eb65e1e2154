"""Synthetic tone-speech corpus generator.

Creates wav+txt pairs where every character is rendered as a distinct pure
tone, so the audio->text mapping is exactly learnable.  Useful for smoke
tests, demos, and verifying an installation end-to-end without a real
corpus:

    python -m ss_asr_tpu.cli.mkdata out_dir --n 64 --seed 0
    python -m ss_asr_tpu.cli.preprocess generic out_dir/processed out_dir/wav out_dir/txt --sr 8000
"""

from __future__ import annotations

import argparse
import os
import wave

import numpy as np

SR = 8000
CHAR_MS = 160
#: distinct, well-separated tone frequencies per character
FREQS = {c: 300.0 + 150.0 * i for i, c in enumerate("abcdefghij ")}
WORDS = ["aba", "bead", "cafe", "dig", "echo", "fig", "gab", "hide", "ice", "jade"]

#: larger inventory over the same tone alphabet — the quality protocol's
#: mid-error mixed regime needs enough lexical variety that an LM-weight
#: sweep has gradient signal instead of collapsing onto a handful of flips
WORDS_LARGE = WORDS + [
    "bad", "cab", "dice", "edge", "face", "gag", "head", "idea", "jig",
    "ache", "badge", "cage", "dead", "ebb", "fade", "gibe", "hedge",
    "beef", "chid", "dab", "egad", "fib", "gad", "hag", "iced", "jab",
    "bide", "chafe", "deed", "fiche",
]

#: acoustic homophones: these characters render as ANOTHER character's tone,
#: making them indistinguishable from audio alone — only a language model can
#: pick the right spelling (the thesis' beam+LM selling point, Table 6.12,
#: reproduced synthetically)
HOMOPHONES = {"i": "e", "g": "c"}


def render(text: str, rng, homophones: bool = False) -> np.ndarray:
    n = int(SR * CHAR_MS / 1000)
    t = np.arange(n) / SR
    if homophones:
        text = "".join(HOMOPHONES.get(ch, ch) for ch in text)
    sig = [np.sin(2 * np.pi * FREQS.get(ch, 2000.0) * t) for ch in text]
    y = np.concatenate(sig).astype(np.float32)
    return y + 0.01 * rng.standard_normal(len(y)).astype(np.float32)


def write_wav(path: str, y: np.ndarray, sr: int = SR) -> None:
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(y, -1, 1) * 32767).astype(np.int16).tobytes())


def make_corpus(out_dir: str, n: int = 64, seed: int = 0, max_words: int = 3,
                homophones: bool = False, words=None) -> None:
    rng = np.random.default_rng(seed)
    vocab = list(words) if words is not None else WORDS
    wav_dir = os.path.join(out_dir, "wav")
    txt_dir = os.path.join(out_dir, "txt")
    os.makedirs(wav_dir, exist_ok=True)
    os.makedirs(txt_dir, exist_ok=True)
    for i in range(n):
        k = int(rng.integers(1, max_words + 1))
        text = " ".join(rng.choice(vocab) for _ in range(k))
        write_wav(
            os.path.join(wav_dir, f"u{i:04d}.wav"),
            render(text, rng, homophones=homophones),
        )
        with open(os.path.join(txt_dir, f"u{i:04d}.txt"), "w", encoding="utf-8") as f:
            f.write(text)
    print(f"wrote {n} synthetic utterances under {out_dir}/(wav|txt)")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="ss_asr_tpu.mkdata")
    ap.add_argument("out_dir")
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-words", type=int, default=3)
    ap.add_argument("--homophones", action="store_true",
                    help="render i/g as e/c tones (LM-only disambiguation)")
    args = ap.parse_args(argv)
    make_corpus(args.out_dir, args.n, args.seed, args.max_words, args.homophones)


if __name__ == "__main__":
    main()
