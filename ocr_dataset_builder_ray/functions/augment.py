"""Deterministic text-degradation registry (noise models for fixtures).

Re-expresses the reference's augmentation surface — 7 primitive
degradations (data/ocr_augmentations.py:36-290) composed into 10 named
profiles (data/ocr_augmentations.py:295-420) — with two deliberate
design fixes called out in SURVEY.md:

* every primitive takes an explicit ``random.Random`` instance; callers
  seed it from a stable url/doc hash (``hashing.stable_hash64``) so the
  registry is deterministic across processes and parallelism levels
  (the reference uses the unseeded module-level ``random`` and an
  unseeded ``random.choice`` applier, data/pytorch_dataset.py:596-601);
* lines are re-joined with a real newline (the reference joins with the
  two-character literal ``"\\n"`` — a bug SURVEY.md §2.2/K5 flags as
  do-not-replicate).

These degradations generate the `pages.text` column ("raw pre-extracted
noisy text", the analogue of raw Tesseract OCR per FIXTURES.md) and the
`noise_pairs` fixtures; they are exposed to users as a named-UDF
registry applied via ``map_batches`` (SURVEY.md §2.11).
"""

from __future__ import annotations

import random
import re
from collections.abc import Callable

from .hashing import stable_hash64

_SENT_SPLIT = re.compile(r"([.!?])")

# OCR-style character confusion table (reference: ocr_augmentations.py:228-233).
_CHAR_CONFUSIONS: dict[str, list[str]] = {
    "l": ["1", "|"],
    "1": ["l", "i"],
    "o": ["0"],
    "0": ["o"],
    "i": ["1", "l", "!"],
    "s": ["5", "$"],
    "5": ["s"],
    "a": ["@", "4"],
    "e": ["3"],
    "t": ["7", "+"],
    "g": ["9", "q"],
    "c": ["(", "["],
    "k": ["<"],
    "z": ["2"],
    "b": ["8"],
}


def split_sentences(text: str) -> list[str]:
    """Split into sentences, keeping terminal punctuation attached."""
    if not text:
        return []
    parts = _SENT_SPLIT.split(text)
    out = []
    for i in range(0, len(parts) - 1, 2):
        s = (parts[i] + parts[i + 1]).strip()
        if s:
            out.append(s)
    if len(parts) % 2 == 1 and parts[-1].strip():
        out.append(parts[-1].strip())
    if not out and text.strip():
        out = [text.strip()]
    return out


# --- primitives (each: (text, rng, params...) -> text) --------------------


def delete_sentences(text: str, rng: random.Random, p: float) -> str:
    if not text or p <= 0:
        return text
    sents = split_sentences(text)
    if not sents:
        return text
    kept = [s for s in sents if rng.random() > p]
    return " ".join(kept)


def delete_words(text: str, rng: random.Random, p: float) -> str:
    if not text or p <= 0:
        return text
    words = text.split()
    if not words:
        return text
    return " ".join(w for w in words if rng.random() > p)


def duplicate_lines(
    text: str, rng: random.Random, p: float, max_duplicates: int = 1
) -> str:
    if not text or p <= 0:
        return text
    out = []
    for line in text.splitlines():
        out.append(line)
        if rng.random() < p:
            out.extend([line] * rng.randint(1, max_duplicates))
    return "\n".join(out)


def duplicate_partial_lines(
    text: str,
    rng: random.Random,
    p: float,
    mode: str,  # "words_start" | "words_end" | "random_ratio"
    num_words: tuple[int, int] = (1, 2),
    ratio_range: tuple[float, float] = (0.2, 0.5),
    max_duplicates: int = 1,
) -> str:
    """Duplicate a word segment of a line in place (stutter/echo noise)."""
    if not text or p <= 0:
        return text
    out = []
    for line in text.splitlines():
        words = line.split()
        if not words or rng.random() >= p:
            out.append(line)
            continue
        for _ in range(rng.randint(1, max_duplicates)):
            if mode == "words_start":
                n = min(rng.randint(*num_words), len(words))
                words = words[:n] + words[:n] + words[n:]
            elif mode == "words_end":
                n = min(rng.randint(*num_words), len(words))
                words = words + words[-n:]
            else:  # random_ratio
                if len(words) == 1:
                    seg_start, seg_len = 0, 1
                else:
                    ratio = rng.uniform(*ratio_range)
                    seg_len = max(1, int(len(words) * ratio))
                    seg_start = rng.randint(0, len(words) - seg_len)
                seg_end = seg_start + seg_len
                words = words[:seg_end] + words[seg_start:seg_end] + words[seg_end:]
        out.append(" ".join(words))
    return "\n".join(out)


def merge_lines(text: str, rng: random.Random, p: float) -> str:
    if not text or p <= 0:
        return text
    lines = text.splitlines()
    if len(lines) < 2:
        return text
    out, i = [], 0
    while i < len(lines):
        if i + 1 < len(lines) and rng.random() < p:
            out.append(lines[i].strip() + " " + lines[i + 1].strip())
            i += 2
        else:
            out.append(lines[i])
            i += 1
    return "\n".join(out)


def split_lines(text: str, rng: random.Random, p: float) -> str:
    if not text or p <= 0:
        return text
    out = []
    for line in text.splitlines():
        words = line.split()
        if len(words) > 1 and rng.random() < p:
            cut = rng.randint(1, len(words) - 1)
            out.append(" ".join(words[:cut]))
            out.append(" ".join(words[cut:]))
        else:
            out.append(line)
    return "\n".join(out)


def character_noise(text: str, rng: random.Random, p: float) -> str:
    if not text or p <= 0:
        return text
    chars = []
    for ch in text:
        if rng.random() < p:
            repl = _CHAR_CONFUSIONS.get(ch.lower())
            chars.append(rng.choice(repl) if repl else ch)
        else:
            chars.append(ch)
    return "".join(chars)


def whitespace_noise(
    text: str, rng: random.Random, p_missing: float, p_extra: float
) -> str:
    if not text or (p_missing <= 0 and p_extra <= 0):
        return text
    out_lines = []
    for line in text.splitlines():
        words = line.split()
        if len(words) <= 1:
            out_lines.append(line)
            continue
        buf = [words[0]]
        for w in words[1:]:
            r = rng.random()
            if r < p_missing:
                buf[-1] = buf[-1] + w
            elif r < p_missing + p_extra:
                buf.append("  " + w)  # becomes a doubled space on join
            else:
                buf.append(" " + w)
        out_lines.append("".join(buf))
    return "\n".join(out_lines)


# --- named profiles (reference: ocr_augmentations.py:295-420) --------------


def _profile_slight_stutter(t: str, r: random.Random) -> str:
    t = delete_words(t, r, 0.01)
    t = duplicate_lines(t, r, 0.05, 1)
    t = duplicate_partial_lines(t, r, 0.10, "words_start", num_words=(2, 3))
    t = duplicate_partial_lines(t, r, 0.10, "words_end", num_words=(2, 3))
    t = whitespace_noise(t, r, 0.01, 0.02)
    return character_noise(t, r, 0.005)


def _profile_gappy_fragmented(t: str, r: random.Random) -> str:
    t = delete_sentences(t, r, 0.10)
    t = delete_words(t, r, 0.15)
    t = merge_lines(t, r, 0.02)
    t = split_lines(t, r, 0.02)
    return character_noise(t, r, 0.01)


def _profile_overly_eager_diff(t: str, r: random.Random) -> str:
    t = delete_words(t, r, 0.02)
    t = duplicate_lines(t, r, 0.20, 2)
    t = duplicate_partial_lines(t, r, 0.25, "random_ratio", ratio_range=(0.3, 0.5))
    return character_noise(t, r, 0.005)


def _profile_line_boundary_chaos(t: str, r: random.Random) -> str:
    t = delete_sentences(t, r, 0.02)
    t = delete_words(t, r, 0.05)
    t = merge_lines(t, r, 0.20)
    t = split_lines(t, r, 0.15)
    t = whitespace_noise(t, r, 0.025, 0.05)
    return character_noise(t, r, 0.01)


def _profile_classic_bad_ocr(t: str, r: random.Random) -> str:
    t = delete_sentences(t, r, 0.03)
    t = delete_words(t, r, 0.08)
    t = duplicate_lines(t, r, 0.01)
    t = duplicate_partial_lines(t, r, 0.01, "random_ratio", ratio_range=(0.1, 0.3))
    t = whitespace_noise(t, r, 0.015, 0.03)
    return character_noise(t, r, 0.05)


def _profile_echo_chamber(t: str, r: random.Random) -> str:
    t = delete_words(t, r, 0.005)
    t = delete_sentences(t, r, 0.005)
    t = duplicate_lines(t, r, 0.30, 3)
    t = duplicate_partial_lines(
        t, r, 0.30, "random_ratio", ratio_range=(0.2, 0.6), max_duplicates=2
    )
    t = whitespace_noise(t, r, 0.001, 0.001)
    return character_noise(t, r, 0.001)


def _profile_telegraphic(t: str, r: random.Random) -> str:
    t = delete_sentences(t, r, 0.15)
    t = delete_words(t, r, 0.25)
    t = merge_lines(t, r, 0.05)
    t = split_lines(t, r, 0.05)
    return character_noise(t, r, 0.01)


def _profile_jittery_capture(t: str, r: random.Random) -> str:
    t = delete_sentences(t, r, 0.02)
    t = delete_words(t, r, 0.07)
    t = duplicate_lines(t, r, 0.03)
    t = duplicate_partial_lines(t, r, 0.15, "words_start", num_words=(1, 2))
    t = duplicate_partial_lines(t, r, 0.15, "words_end", num_words=(1, 2))
    t = whitespace_noise(t, r, 0.01, 0.02)
    return character_noise(t, r, 0.02)


def _profile_max_omission(t: str, r: random.Random) -> str:
    t = delete_sentences(t, r, 0.25)
    t = delete_words(t, r, 0.30)
    t = duplicate_partial_lines(t, r, 0.02, "random_ratio", ratio_range=(0.05, 0.15))
    t = whitespace_noise(t, r, 0.005, 0.005)
    return character_noise(t, r, 0.005)


def _profile_comprehensive(t: str, r: random.Random) -> str:
    t = delete_sentences(t, r, 0.05)
    t = delete_words(t, r, 0.10)
    t = duplicate_lines(t, r, 0.10)
    t = duplicate_partial_lines(t, r, 0.10, "random_ratio", ratio_range=(0.20, 0.30))
    t = merge_lines(t, r, 0.05)
    t = split_lines(t, r, 0.05)
    t = whitespace_noise(t, r, 0.015, 0.03)
    return character_noise(t, r, 0.03)


PROFILES: dict[str, Callable[[str, random.Random], str]] = {
    "slight_stutter": _profile_slight_stutter,
    "gappy_fragmented": _profile_gappy_fragmented,
    "overly_eager_diff": _profile_overly_eager_diff,
    "line_boundary_chaos": _profile_line_boundary_chaos,
    "classic_bad_ocr": _profile_classic_bad_ocr,
    "echo_chamber": _profile_echo_chamber,
    "telegraphic": _profile_telegraphic,
    "jittery_capture": _profile_jittery_capture,
    "max_omission": _profile_max_omission,
    "comprehensive": _profile_comprehensive,
}

PROFILE_NAMES = sorted(PROFILES)


def apply_profile(name: str, text: str, seed_key: str) -> str:
    """Apply a named profile with RNG seeded on a stable key.

    Deterministic replacement for the reference's unseeded
    ``random.choice(funcs)(text)`` applier (data/pytorch_dataset.py:596-601).
    """
    rng = random.Random(stable_hash64(seed_key))
    return PROFILES[name](text, rng)


def profile_for_key(seed_key: str) -> str:
    """Deterministically pick a profile name from a stable key."""
    return PROFILE_NAMES[stable_hash64("profile:" + seed_key) % len(PROFILE_NAMES)]
