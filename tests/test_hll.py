"""HyperLogLog sketch tests: accuracy, mergeability, determinism, and
the distributed per-group approximate count-distinct."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from ocr_dataset_builder_ray.functions.hll import HyperLogLog, approx_distinct


def test_accuracy_across_cardinalities():
    for n in (100, 5_000, 200_000):
        hll = HyperLogLog(p=14)
        hll.add_array(np.asarray([f"v{i}" for i in range(n)], dtype=object))
        est = hll.estimate()
        assert abs(est - n) / n < 0.03, (n, est)


def test_duplicates_do_not_inflate():
    hll = HyperLogLog(p=14)
    vals = np.asarray([f"v{i % 500}" for i in range(50_000)], dtype=object)
    hll.add_array(vals)
    assert abs(hll.estimate() - 500) / 500 < 0.05


def test_merge_equals_union():
    a, b = HyperLogLog(p=12), HyperLogLog(p=12)
    a.add_array(np.asarray([f"a{i}" for i in range(3000)], dtype=object))
    b.add_array(np.asarray([f"b{i}" for i in range(3000)], dtype=object))
    both = HyperLogLog(p=12)
    both.add_array(np.asarray([f"a{i}" for i in range(3000)], dtype=object))
    both.add_array(np.asarray([f"b{i}" for i in range(3000)], dtype=object))
    assert a.merge(b).estimate() == pytest.approx(both.estimate())


def test_serialization_roundtrip_and_precision_guard():
    h = HyperLogLog(p=10)
    h.add_array(np.asarray(["x", "y"], dtype=object))
    r = HyperLogLog.from_bytes(h.to_bytes())
    assert r.p == 10 and (r.registers == h.registers).all()
    with pytest.raises(ValueError):
        HyperLogLog(p=10).merge(HyperLogLog(p=12))
    with pytest.raises(ValueError):
        HyperLogLog(p=3)


def test_deterministic():
    vals = np.asarray([f"d{i}" for i in range(1000)], dtype=object)
    assert (
        HyperLogLog(p=12).add_array(vals).to_bytes()
        == HyperLogLog(p=12).add_array(vals).to_bytes()
    )


def test_distributed_approx_distinct(ray_session, sf_dir):
    import duckdb

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
    got = approx_distinct(ds, "user_id", "event_type")
    exact = duckdb.sql(
        f"SELECT event_type, count(DISTINCT user_id) AS n FROM "
        f"read_parquet('{sf_dir}/events.parquet') GROUP BY event_type ORDER BY event_type"
    ).fetchdf()
    merged = got.merge(exact, on="event_type")
    rel_err = (merged["approx_distinct"] - merged["n"]).abs() / merged["n"]
    assert (rel_err < 0.05).all(), merged
