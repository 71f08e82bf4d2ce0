"""JSONL / CSV / parquet on-ramps into the documents shape."""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from ocr_dataset_builder_ray.functions.urltools import hash_nodes_int64
from ocr_dataset_builder_ray.sources.ingest import normalize_documents, read_any

COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def _rows(n=25):
    return [
        {
            "url": f"http://d{i}.example/",
            "body": ("" if i == 3 else f"document {i} body text"),
            "language": "en" if i % 2 else "de",
        }
        for i in range(n)
    ]


def _check(df, n=25):
    assert list(df.columns) == COLS
    assert len(df) == n - 1  # the empty-body row dropped
    assert (df["n_chars"] == df["text"].str.len()).all()
    assert set(df["lang"]) == {"en", "de"}
    # ids are the stable url hashes; source defaults to the string key
    expect = {
        u: h
        for u, h in zip(
            [r["url"] for r in _rows(n)],
            hash_nodes_int64([r["url"] for r in _rows(n)]),
        )
    }
    for _, r in df.iterrows():
        assert r["doc_id"] == expect[r["source"]]


def test_ingest_jsonl(ray_session, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in _rows()))
    ds = read_any(str(p))
    out = normalize_documents(
        ds, text_col="body", key_col="url", lang_col="language"
    ).to_pandas()
    _check(out)


def test_ingest_csv(ray_session, tmp_path):
    import csv

    p = tmp_path / "docs.csv"
    with open(p, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=["url", "body", "language"])
        w.writeheader()
        w.writerows(_rows())
    out = normalize_documents(
        read_any(str(p)), text_col="body", key_col="url", lang_col="language"
    ).to_pandas()
    _check(out)


def test_ingest_parquet_int_key(ray_session, tmp_path):
    p = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "id": list(range(10)),
                "body": [f"text {i}" for i in range(10)],
            }
        ),
        p,
    )
    out = normalize_documents(
        read_any(p), text_col="body", key_col="id"
    ).to_pandas()
    assert list(out.columns) == COLS
    assert sorted(out["doc_id"]) == list(range(10))  # int key passes through
    assert (out["lang"] == "").all() and (out["source"] == "").all()


def test_ingest_requires_key(ray_session, tmp_path):
    p = str(tmp_path / "d.parquet")
    pq.write_table(pa.table({"body": ["x"]}), p)
    with pytest.raises(ValueError, match="key_col"):
        normalize_documents(read_any(p), text_col="body")


def test_read_any_format_dispatch(tmp_path):
    with pytest.raises(ValueError, match="unknown extension"):
        read_any(str(tmp_path / "x.xml"))


def test_cli_ingest_docs_feeds_curation(ray_session, tmp_path, capsys):
    from ocr_dataset_builder_ray.cli import main
    from ocr_dataset_builder_ray.stages.dedup import exact_dedup

    p = tmp_path / "in.jsonl"
    rows = _rows(30)
    for r in rows[5:10]:  # rows[3] stays empty and is dropped at ingest
        r["body"] = "identical shared body"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    out_dir = str(tmp_path / "docs")
    assert main([
        "ingest-docs", "--input", str(p), "--output", out_dir,
        "--text-col", "body", "--key-col", "url", "--lang-col", "language",
    ]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["documents"] == 29
    docs = ray.data.read_parquet(out_dir)
    kept = exact_dedup(docs, text_col="text", key_col="doc_id")
    assert kept.count() == 25  # 5 identical bodies collapse to 1
