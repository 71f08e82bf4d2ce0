"""Explicit url-hash repartitioning: co-location invariant (SURVEY §4:
pick one partitioning key and reuse it across stages)."""

import pyarrow as pa

import ray.data

from ocr_dataset_builder_ray.functions.hashing import stable_hash64
from ocr_dataset_builder_ray.pipelines.extraction import repartition_by_url_hash


def test_url_hash_colocation(ray_session):
    rows = [{"url": f"https://h{i % 7}.example.com/p/{i}", "v": i} for i in range(200)]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(8)
    out = repartition_by_url_hash(ds, n_buckets=16)

    # each bucket's rows are never split across output blocks (a block
    # may pack several whole buckets), and the bucket matches the hash
    bucket_blocks: dict[int, set[int]] = {}
    for bi, block in enumerate(out.iter_batches(batch_format="pyarrow", batch_size=None)):
        for url, b in zip(block["url"].to_pylist(), block["url_bucket"].to_pylist()):
            assert stable_hash64(url) % 16 == b
            bucket_blocks.setdefault(b, set()).add(bi)
    assert all(len(blocks) == 1 for blocks in bucket_blocks.values())

    # no rows lost or duplicated
    got = sorted(out.to_pandas()["v"])
    assert got == list(range(200))
