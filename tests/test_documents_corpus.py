"""Synthetic documents corpus generator (the dedup bench input)."""

import os

import pyarrow.parquet as pq

from ocr_dataset_builder_ray.sources.documents import (
    gen_doc,
    generate_documents_corpus,
)


def test_deterministic_and_classes():
    n_base, n_near = 70, 20
    base = gen_doc(10, n_base, n_near, seed=7)
    assert gen_doc(10, n_base, n_near, seed=7) == base  # pure function
    near = gen_doc(75, n_base, n_near, seed=7)  # near-dup class
    src = gen_doc((75 * 2654435761) % n_base, n_base, n_near, seed=7)
    # mutated but mostly the same words
    a, b = set(near["text"].split()), set(src["text"].split())
    assert near["text"] != src["text"]
    assert len(a & b) / len(a | b) > 0.9
    exact = gen_doc(95, n_base, n_near, seed=7)  # exact-dup class
    src2 = gen_doc((95 * 2654435761) % n_base, n_base, n_near, seed=7)
    assert exact["text"] == src2["text"]


def test_generate_idempotent(tmp_path):
    out = str(tmp_path / "docs")
    p1 = generate_documents_corpus(out, 100, rows_per_file=40)
    files = sorted(os.listdir(p1))
    assert files == ["_SUCCESS", "documents-00000.parquet", "documents-00001.parquet", "documents-00002.parquet"]
    total = sum(
        pq.ParquetFile(os.path.join(p1, f)).metadata.num_rows
        for f in files
        if f.endswith(".parquet")
    )
    assert total == 100
    mtimes = {f: os.path.getmtime(os.path.join(p1, f)) for f in files}
    generate_documents_corpus(out, 100, rows_per_file=40)  # reused, no rewrite
    assert mtimes == {f: os.path.getmtime(os.path.join(p1, f)) for f in files}
