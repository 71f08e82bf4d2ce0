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


# -- line_dedup (C4 rule) --------------------------------------------------


def _brute_line_losers(texts: dict[int, str], min_chars=1) -> set:
    seen = set()
    losers = set()
    for key in sorted(texts):
        for i, line in enumerate((texts[key] or "").split("\n")):
            if len(line) < min_chars:
                continue
            if line in seen:
                losers.add((key, i))
            else:
                seen.add(line)
    return losers


def _line_corpus(seed=7, n_docs=40) -> dict[int, str]:
    rng = np.random.default_rng(seed)
    boiler = ["© example site", "home | products | about", "follow us"]
    texts = {}
    for k in range(n_docs):
        lines = [f"unique content {k} row {j} {int(rng.integers(1e6))}"
                 for j in range(int(rng.integers(2, 6)))]
        for b in boiler:
            if rng.random() < 0.6:
                lines.insert(int(rng.integers(0, len(lines))), b)
        if rng.random() < 0.2:
            lines.append("")  # empty lines are exempt
        texts[k] = "\n".join(lines)
    return texts


def test_line_dedup_matches_brute(ray_session):
    texts = _line_corpus()
    got = S.line_dedup(_ds(texts), "text", "doc_id")
    got_set = set(zip(got["doc_id"], got["line_idx"]))
    assert got_set == _brute_line_losers(texts)
    assert len(got_set) > 0  # boilerplate repeats by construction


def test_line_dedup_paths_identical(ray_session, monkeypatch):
    texts = _line_corpus(seed=11)
    want = S.line_dedup(_ds(texts), "text", "doc_id")
    got_ds = (
        S.line_dedup(_ds(texts), "text", "doc_id", as_dataset=True)
        .to_pandas().sort_values(["doc_id", "line_idx"]).reset_index(drop=True)
    )
    monkeypatch.setattr(S, "SMALL_INPUT_WINDOW_ROWS", 0)
    got_big = S.line_dedup(_ds(texts), "text", "doc_id")
    got_big_ds = (
        S.line_dedup(_ds(texts), "text", "doc_id", as_dataset=True)
        .to_pandas().sort_values(["doc_id", "line_idx"]).reset_index(drop=True)
    )
    assert got_ds.equals(want)
    assert got_big.equals(want)
    assert got_big_ds.equals(want)


def test_line_dedup_min_chars(ray_session):
    texts = {0: "aa\n--\nbody one", 1: "aa\n--\nbody two", 2: "--\naa"}
    # min_chars=3 exempts both "aa" and "--"
    got = S.line_dedup(_ds(texts), "text", "doc_id", min_chars=3)
    assert len(got) == 0
    got1 = S.line_dedup(_ds(texts), "text", "doc_id", min_chars=1)
    assert set(zip(got1["doc_id"], got1["line_idx"])) == {(1, 0), (1, 1), (2, 0), (2, 1)}


def test_apply_line_dedup_first_occurrence_survives(ray_session):
    texts = _line_corpus(seed=3)
    losers = S.line_dedup(_ds(texts), "text", "doc_id")
    cleaned = S.apply_line_dedup(_ds(texts), losers, "text", "doc_id").to_pandas()
    out = dict(zip(cleaned["doc_id"], cleaned["text"]))
    # brute-force rewrite
    loser_set = _brute_line_losers(texts)
    for k, t in texts.items():
        keep = [l for i, l in enumerate(t.split("\n")) if (k, i) not in loser_set]
        assert out[k] == "\n".join(keep)
    # every dedup-eligible line occurs at most once corpus-wide after
    all_lines = [l for t in out.values() for l in t.split("\n") if len(l) >= 1]
    assert len(all_lines) == len(set(all_lines))


def test_line_dedup_parallelism_invariant(ray_session):
    texts = _line_corpus(seed=23)
    items = [{"doc_id": k, "text": v} for k, v in texts.items()]
    a = S.line_dedup(
        ray.data.from_items(items, override_num_blocks=1), "text", "doc_id")
    b = S.line_dedup(
        ray.data.from_items(items, override_num_blocks=8), "text", "doc_id")
    assert a.equals(b)


def test_span_dedup_all_docs_shorter_than_window(ray_session):
    """Zero window rows (every doc under w tokens): the small path must
    return the corpus unchanged, not crash on the schema-less empty
    aggregate."""
    import pandas as pd

    df = pd.DataFrame({"doc_id": [1, 2], "text": ["a b c", "d e"]})
    spans = S.span_dedup(ray.data.from_pandas(df), "text", "doc_id", w=8)
    assert len(spans) == 0
