"""Span-level dedup (stages/span_dedup.py): brute-force equivalence,
small/distributed path equality, interval-merge edge cases."""

import numpy as np
import pandas as pd
import pytest
import ray

from ocr_dataset_builder_ray.stages import span_dedup as S


def _brute_spans(texts: dict[int, str], w: int) -> pd.DataFrame:
    """Reference: dict of window-string -> first (doc, pos); merge by
    plain interval sweep."""
    first: dict[str, tuple[int, int]] = {}
    losers: list[tuple[int, int]] = []
    for doc in sorted(texts):
        toks = texts[doc].split()
        for pos in range(len(toks) - w + 1):
            win = " ".join(toks[pos : pos + w])
            if win in first:
                losers.append((doc, pos))
            else:
                first[win] = (doc, pos)
    rows = []
    for doc in sorted({d for d, _ in losers}):
        spans = sorted(p for d, p in losers if d == doc)
        cur_s, cur_e = spans[0], spans[0] + w
        for p in spans[1:]:
            if p > cur_e:
                rows.append((doc, cur_s, cur_e))
                cur_s, cur_e = p, p + w
            else:
                cur_e = max(cur_e, p + w)
        rows.append((doc, cur_s, cur_e))
    return pd.DataFrame(rows, columns=["doc_id", "span_start", "span_end"]).astype(
        np.int64
    ) if rows else pd.DataFrame(
        {
            "doc_id": np.empty(0, np.int64),
            "span_start": np.empty(0, np.int64),
            "span_end": np.empty(0, np.int64),
        }
    )


def _template_corpus(n_docs=60, seed=5) -> dict[int, str]:
    """Random docs with planted shared passages (the web-template
    scenario span dedup exists for)."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(300)]
    boiler = " ".join(rng.choice(vocab, 20))  # shared header
    texts = {}
    for d in range(n_docs):
        body = " ".join(rng.choice(vocab, int(rng.integers(5, 60))))
        if d % 3 == 0:
            texts[d] = f"{boiler} {body}"
        elif d % 7 == 0:
            texts[d] = f"{body} {boiler}"
        else:
            texts[d] = body
    texts[n_docs] = ""  # empty doc
    texts[n_docs + 1] = "a b c"  # shorter than the window
    return texts


def _ds(texts):
    return ray.data.from_pandas(
        pd.DataFrame(
            {"doc_id": list(texts), "text": list(texts.values())}
        ).astype({"doc_id": np.int64})
    )


def test_span_dedup_matches_brute(ray_session):
    texts = _template_corpus()
    got = S.span_dedup(_ds(texts), "text", "doc_id", w=8)
    assert got.reset_index(drop=True).equals(_brute_spans(texts, 8))


def test_span_dedup_distributed_path_identical(ray_session, monkeypatch):
    texts = _template_corpus(seed=9)
    small = S.span_dedup(_ds(texts), "text", "doc_id", w=8)
    monkeypatch.setattr(S, "SMALL_INPUT_WINDOW_ROWS", 0)
    big = S.span_dedup(_ds(texts), "text", "doc_id", w=8)
    assert small.equals(big)


def test_apply_span_dedup_cuts_exactly(ray_session):
    texts = {
        0: "a b c d e f g h i j k l",
        1: "x y a b c d e f g h i j z",
        3: "a b c d e f g h m n o p q r s t u v w x",
        2: "p q r s t u v w",
    }
    ds = _ds(texts)
    spans = S.span_dedup(ds, "text", "doc_id", w=8)
    cleaned = (
        S.apply_span_dedup(ds, spans, "text", "doc_id")
        .to_pandas()
        .set_index("doc_id")["text"]
        .to_dict()
    )
    assert cleaned[0] == texts[0]  # first occurrence untouched
    assert cleaned[1] == "x y z"
    assert cleaned[2] == texts[2]
    assert cleaned[3] == "m n o x"


def test_merge_spans_cross_key_no_bleed():
    # key 1 ends at a high position; key 2 restarts low — the islands
    # must not merge across the key boundary (absolute-coordinate trick)
    keys = np.array([1, 2, 2], dtype=np.int64)
    starts = np.array([100, 0, 20], dtype=np.int64)
    out = S._merge_spans(keys, starts, 8)
    assert out.values.tolist() == [[1, 100, 108], [2, 0, 8], [2, 20, 28]]


def test_window_hashes_no_false_splits():
    toks = ["a", "b", "a", "b", "a", "b"]
    h = S.window_hashes(toks, 2)
    # windows: ab ba ab ba ab -> alternating equal hashes
    assert h[0] == h[2] == h[4]
    assert h[1] == h[3]
    assert h[0] != h[1]
    assert S.window_hashes(["x"], 2).size == 0


def test_span_dedup_as_dataset_identical(ray_session, monkeypatch):
    texts = _template_corpus(seed=13)
    want = S.span_dedup(_ds(texts), "text", "doc_id", w=8)
    # dataset output, both the small (driver-losers) and distributed
    # loser paths
    got_small = (
        S.span_dedup(_ds(texts), "text", "doc_id", w=8, as_dataset=True)
        .to_pandas()
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    monkeypatch.setattr(S, "SMALL_INPUT_WINDOW_ROWS", 0)
    got_big = (
        S.span_dedup(_ds(texts), "text", "doc_id", w=8, as_dataset=True)
        .to_pandas()
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    assert got_small.equals(want)
    assert got_big.equals(want)
