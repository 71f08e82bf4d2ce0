"""Within-domain boilerplate removal (stages/boilerplate.py) vs a
literal-string pandas reference — plan equality, threshold semantics,
strip roundtrip, partition and path invariance."""

import numpy as np
import pandas as pd
import pytest
import ray
import ray.data

import ocr_dataset_builder_ray.stages.boilerplate as bp
from ocr_dataset_builder_ray.functions.hashing import stable_hash64
from ocr_dataset_builder_ray.stages.boilerplate import (
    boilerplate_lines,
    strip_boilerplate,
)


def _h(s: str) -> np.int64:
    return np.array([stable_hash64(s)], dtype=np.uint64).view(np.int64)[0]


def _corpus():
    """Two domains: a.com has nav/footer chrome in most docs, b.org has
    one hot line; plus unique body lines, dupes-within-one-doc, a short
    line, and a null text."""
    rows = []
    nav, foot = "Home | About | Contact", "(c) 2020 a.com all rights reserved"
    for i in range(10):
        lines = [f"unique body a{i}"]
        if i < 8:
            lines.insert(0, nav)
        if i < 5:
            lines.append(foot)
        if i == 3:
            lines.append(nav)  # repeat inside ONE doc: still counts once
        lines.append("x")  # short line, exempt at min_chars=2
        rows.append((i, "a.com", "\n".join(lines)))
    for i in range(6):
        lines = [f"unique body b{i}", "subscribe to our newsletter"]
        rows.append((100 + i, "b.org", "\n".join(lines)))
    rows.append((200, "b.org", None))  # null text
    return pd.DataFrame(rows, columns=["doc_id", "domain", "text"])


def _ref_plan(df, min_docs, min_frac=None, min_chars=1):
    """Brute force: distinct-doc counts per (domain, literal line)."""
    seen = {}
    totals = df.groupby("domain")["doc_id"].nunique().to_dict()
    for _, r in df.iterrows():
        if r["text"] is None:
            continue
        for line in set(r["text"].split("\n")):
            if len(line) < min_chars:
                continue
            seen.setdefault((r["domain"], line), set()).add(r["doc_id"])
    out = []
    for (dom, line), docs in seen.items():
        thr = min_docs
        if min_frac is not None:
            thr = max(thr, int(np.ceil(min_frac * totals[dom])))
        if len(docs) >= thr:
            out.append((dom, line, len(docs)))
    return out


def _ref_strip(df, plan, min_chars=1):
    hot = {(dom, line) for dom, line, _ in plan}
    out = {}
    for _, r in df.iterrows():
        if r["text"] is None:
            out[r["doc_id"]] = None
            continue
        kept = [
            ln
            for ln in r["text"].split("\n")
            if len(ln) < min_chars or (r["domain"], ln) not in hot
        ]
        out[r["doc_id"]] = "\n".join(kept)
    return out


def _plan_as_set(plan_df):
    return set(
        zip(plan_df["dhash"].tolist(), plan_df["lhash"].tolist(),
            plan_df["df"].tolist())
    )


def _ref_as_set(ref):
    return {(int(_h(dom)), int(_h(line)), n) for dom, line, n in ref}


@pytest.fixture(scope="module")
def corpus():
    return _corpus()


def test_plan_matches_reference(ray_session, corpus):
    ds = ray.data.from_pandas(corpus).repartition(5)
    got = boilerplate_lines(ds, min_docs=4)
    assert _plan_as_set(got) == _ref_as_set(_ref_plan(corpus, 4))
    # nav (8 docs), foot (5), newsletter (6), and "x" (10) are hot
    assert len(got) == 4


def test_min_docs_threshold(ray_session, corpus):
    ds = ray.data.from_pandas(corpus)
    got = boilerplate_lines(ds, min_docs=6)
    assert _plan_as_set(got) == _ref_as_set(_ref_plan(corpus, 6))
    assert len(got) == 3  # nav(8) + newsletter(6) + "x"(10); foot(5) survives


def test_min_frac(ray_session, corpus):
    # b.org has 7 docs (incl. null-text): newsletter df=6 -> 6/7 >= 0.8
    # passes; a.com foot df=5 of 10 -> fails at 0.8
    ds = ray.data.from_pandas(corpus)
    got = boilerplate_lines(ds, min_docs=2, min_frac=0.8)
    ref = _ref_plan(corpus, 2, min_frac=0.8)
    assert _plan_as_set(got) == _ref_as_set(ref)
    assert {
        int(_h("subscribe to our newsletter")),
        int(_h("Home | About | Contact")),
        int(_h("x")),
    } == set(got["lhash"].tolist())


def test_min_chars_exemption(ray_session, corpus):
    ds = ray.data.from_pandas(corpus)
    # "x" occurs in all 10 a.com docs but is exempt at min_chars=2
    got = boilerplate_lines(ds, min_docs=4, min_chars=2)
    assert int(_h("x")) not in set(got["lhash"].tolist())
    got1 = boilerplate_lines(ds, min_docs=4, min_chars=1)
    assert int(_h("x")) in set(got1["lhash"].tolist())


def test_strip_roundtrip(ray_session, corpus):
    ds = ray.data.from_pandas(corpus).repartition(4)
    plan = boilerplate_lines(ds, min_docs=4)
    got = (
        strip_boilerplate(ds, plan)
        .to_pandas()
        .set_index("doc_id")["text"]
        .to_dict()
    )
    ref = _ref_strip(corpus, _ref_plan(corpus, 4))
    assert got == ref
    # the same line in the OTHER domain is untouched
    assert "subscribe to our newsletter" not in got[100]
    assert "unique body b0" in got[100]


def test_strip_preserves_null_and_no_hot(ray_session, corpus):
    ds = ray.data.from_pandas(corpus)
    empty = boilerplate_lines(ds, min_docs=99)
    assert len(empty) == 0
    got = strip_boilerplate(ds, empty).to_pandas()
    merged = got.set_index("doc_id")["text"].to_dict()
    for _, r in corpus.iterrows():
        assert merged[r["doc_id"]] == (
            r["text"] if r["text"] is not None else None
        )


def test_partition_invariance(ray_session, corpus):
    a = boilerplate_lines(
        ray.data.from_pandas(corpus).repartition(1), min_docs=4
    )
    b = boilerplate_lines(
        ray.data.from_pandas(corpus).repartition(9), min_docs=4
    )
    pd.testing.assert_frame_equal(a, b)


def test_big_path_equality(ray_session, corpus, monkeypatch):
    monkeypatch.setattr(bp, "SMALL_INPUT_LINE_ROWS", 0)
    ds = ray.data.from_pandas(corpus).repartition(3)
    big = boilerplate_lines(ds, min_docs=4, n_buckets=7)
    assert _plan_as_set(big) == _ref_as_set(_ref_plan(corpus, 4))
    big_frac = boilerplate_lines(ds, min_docs=2, min_frac=0.8, n_buckets=5)
    assert _plan_as_set(big_frac) == _ref_as_set(
        _ref_plan(corpus, 2, min_frac=0.8)
    )


def test_strip_after_big_path(ray_session, corpus, monkeypatch):
    monkeypatch.setattr(bp, "SMALL_INPUT_LINE_ROWS", 0)
    ds = ray.data.from_pandas(corpus)
    plan = boilerplate_lines(ds, min_docs=4)
    got = (
        strip_boilerplate(ds, plan)
        .to_pandas()
        .set_index("doc_id")["text"]
        .to_dict()
    )
    assert got == _ref_strip(corpus, _ref_plan(corpus, 4))


def test_strip_large_string_columns(ray_session, corpus, tmp_path):
    """A parquet round-trip yields large_string text columns;
    strip_boilerplate's binary_join separator must match that value
    type (regression: no (list<large_string>, string) kernel)."""
    import pyarrow as pa

    tbl = pa.Table.from_pandas(corpus, preserve_index=False)
    tbl = tbl.set_column(
        tbl.schema.get_field_index("text"),
        "text",
        tbl["text"].cast(pa.large_string()),
    )
    tbl = tbl.set_column(
        tbl.schema.get_field_index("domain"),
        "domain",
        tbl["domain"].cast(pa.large_string()),
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    plan = boilerplate_lines(ds, min_docs=4)
    got = (
        strip_boilerplate(ds, plan)
        .to_pandas()
        .set_index("doc_id")["text"]
        .to_dict()
    )
    assert got == _ref_strip(corpus, _ref_plan(corpus, 4))
