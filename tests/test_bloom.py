"""Bloom-filter broadcast semi-join tests."""

import numpy as np
import pyarrow as pa

import ray.data

from ocr_dataset_builder_ray.functions.bloom import BloomFilter, bloom_semi_join


def test_no_false_negatives():
    keys = [f"url-{i}" for i in range(5000)]
    bf = BloomFilter.build(keys, fpr=0.01)
    assert bf.contains_array(np.asarray(keys, dtype=object)).all()


def test_fpr_in_range():
    keys = [f"in-{i}" for i in range(5000)]
    bf = BloomFilter.build(keys, fpr=0.01)
    probes = np.asarray([f"out-{i}" for i in range(20000)], dtype=object)
    fpr = bf.contains_array(probes).mean()
    assert fpr < 0.05  # target 0.01 with slack


def test_deterministic_across_builds():
    keys = [f"k{i}" for i in range(100)]
    a, b = BloomFilter.build(keys), BloomFilter.build(keys)
    assert (a._words == b._words).all()


def test_contains_scalar():
    bf = BloomFilter.build(["alpha", "beta"])
    assert "alpha" in bf and "beta" in bf


def test_bloom_semi_join(ray_session):
    rows = [{"k": f"row-{i}", "v": i} for i in range(1000)]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    wanted = [f"row-{i}" for i in range(0, 1000, 10)]
    out = bloom_semi_join(ds, wanted, "k", fpr=0.001).to_pandas()
    got = set(out["k"])
    assert set(wanted) <= got  # no false negatives
    assert len(got) <= len(wanted) * 1.2  # few false positives
