"""Text-analysis kernels: language-ID, quality scores, token counts.

Vectorized (pandas/numpy) per-batch implementations of the text
operations a large-scale training-data pipeline needs on top of the
reference's surface. All deterministic, closed-form — no models.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd

# --- language ID (character/stopword n-gram heuristic) ---------------------

# Tiny per-language marker sets: high-frequency function words plus a
# script check. Good enough for the synthetic corpora; scored as
# (matched marker tokens) / (tokens), argmax wins, "und" -> unknown.
_LANG_MARKERS: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the a of to and in is that it for on with as was at by this be are".split()
    ),
    "de": frozenset(
        "der die das und ist nicht mit den von ein eine zu im für über während".split()
    ),
    "fr": frozenset(
        "le la les de des et un une est pour dans que qui par sur pendant".split()
    ),
    "es": frozenset(
        "el la los las de y un una es en que los para con por sobre mientras".split()
    ),
}
_ARABIC_RE = re.compile(r"[؀-ۿ]")
_TOKEN_RE = re.compile(r"[^\W\d_]+", re.UNICODE)
# BPE-ish subword splitter: word pieces, numbers, or single non-space symbols
_BPE_RE = re.compile(r"[^\W\d_]+|\d+|[^\w\s]", re.UNICODE)
_SENT_END_RE = re.compile(r"[.!?]")

_STOPWORDS_ALL = frozenset().union(*_LANG_MARKERS.values())


def detect_language(text: str) -> str:
    """Heuristic language ID over the marker tables; 'und' if unsure."""
    if not text:
        return "und"
    if _ARABIC_RE.search(text):
        ar = len(_ARABIC_RE.findall(text))
        if ar / max(1, len(text)) > 0.2:
            return "ar"
    tokens = [t.lower() for t in _TOKEN_RE.findall(text)[:500]]
    if not tokens:
        return "und"
    best, best_score = "und", 0.0
    for lang, markers in _LANG_MARKERS.items():
        score = sum(1 for t in tokens if t in markers) / len(tokens)
        if score > best_score:
            best, best_score = lang, score
    return best if best_score >= 0.05 else "und"


def token_count_ws(text: str) -> int:
    """Whitespace token count."""
    return len(text.split()) if text else 0


def token_count_bpe(text: str) -> int:
    """BPE-ish token count (word pieces + digits + punctuation marks)."""
    return len(_BPE_RE.findall(text)) if text else 0


def quality_features(text: str) -> dict[str, float]:
    """Closed-form quality features (Gopher/C4-style heuristics)."""
    if not text:
        return {
            "q_n_chars": 0.0,
            "q_n_words": 0.0,
            "q_mean_word_len": 0.0,
            "q_alpha_ratio": 0.0,
            "q_punct_ratio": 0.0,
            "q_digit_ratio": 0.0,
            "q_upper_ratio": 0.0,
            "q_stopword_ratio": 0.0,
            "q_sentence_count": 0.0,
            "q_line_dup_ratio": 0.0,
            "quality_score": 0.0,
        }
    n = len(text)
    words = text.split()
    n_words = len(words)
    alpha = sum(c.isalpha() for c in text)
    digit = sum(c.isdigit() for c in text)
    upper = sum(c.isupper() for c in text)
    punct = sum(not c.isalnum() and not c.isspace() for c in text)
    lower_tokens = [w.lower().strip(".,;:!?") for w in words]
    stop = sum(1 for w in lower_tokens if w in _STOPWORDS_ALL)
    sents = len(_SENT_END_RE.findall(text))
    lines = [ln for ln in text.split("\n") if ln]
    dup_lines = len(lines) - len(set(lines))
    feats = {
        "q_n_chars": float(n),
        "q_n_words": float(n_words),
        "q_mean_word_len": float(np.mean([len(w) for w in words])) if words else 0.0,
        "q_alpha_ratio": alpha / n,
        "q_punct_ratio": punct / n,
        "q_digit_ratio": digit / n,
        "q_upper_ratio": upper / max(1, alpha),
        "q_stopword_ratio": stop / max(1, n_words),
        "q_sentence_count": float(sents),
        "q_line_dup_ratio": dup_lines / max(1, len(lines)),
    }
    # Composite score in [0,1]: length plateau x alpha x (1 - dup) x stopword floor
    length_term = min(1.0, n_words / 50.0)
    score = (
        length_term
        * feats["q_alpha_ratio"]
        * (1.0 - feats["q_line_dup_ratio"])
        * (0.5 + 0.5 * min(1.0, feats["q_stopword_ratio"] / 0.2))
    )
    feats["quality_score"] = float(round(score, 6))
    return feats


def add_textstats_columns(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Batch transform: append langid/token/quality columns (pandas)."""
    texts = df[text_col].fillna("")
    df = df.copy()
    df["lang_detected"] = [detect_language(t) for t in texts]
    df["n_tokens_ws"] = [token_count_ws(t) for t in texts]
    df["n_tokens_bpe"] = [token_count_bpe(t) for t in texts]
    quality = [quality_features(t) for t in texts]
    for key in quality[0] if quality else []:
        df[key] = [q[key] for q in quality]
    return df


def shannon_entropy(text: str) -> float:
    """Character-level Shannon entropy (bits/char) — gibberish detector."""
    if not text:
        return 0.0
    counts: dict[str, int] = {}
    for ch in text:
        counts[ch] = counts.get(ch, 0) + 1
    n = len(text)
    return -sum((c / n) * math.log2(c / n) for c in counts.values())


def compression_ratio(text: str, level: int = 6) -> float:
    """zlib-compressed size / raw utf-8 size — the repetitiveness
    signal Dolma-style pipelines gate on (a public heuristic: heavily
    templated or repeated text compresses far below natural prose,
    random/gibberish text compresses above it). Empty text reports
    1.0. The kernel is C-speed zlib; a per-row Python loop over a
    batch is not the hot path."""
    if not text:
        return 1.0
    import zlib

    raw = text.encode("utf-8")
    return round(len(zlib.compress(raw, level)) / len(raw), 6)
