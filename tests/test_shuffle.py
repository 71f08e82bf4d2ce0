"""deterministic_shuffle / shuffled training export pins.

The contract under test: shuffle order is a pure function of
(key, seed) — byte-identical at any input partitioning and
parallelism, growth-stable per key, seed-independent between seeds —
and the exported ``_shuffle_ord`` column lets a consumer re-establish
the order with one ORDER BY.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data

from ocr_dataset_builder_ray.stages.curation import (
    add_shuffle_ticket,
    deterministic_shuffle,
    shuffle_ticket,
)


def _docs(n: int, seed: int = 7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "url": [f"https://ex.com/{i:05d}" for i in range(n)],
            "text": [f"doc {i} " + " ".join(map(str, rng.integers(0, 50, 8))) for i in range(n)],
        }
    )


def test_shuffle_ticket_pure_and_seeded():
    keys = np.arange(1000, dtype=np.int64)
    t0 = shuffle_ticket(keys, 0)
    assert np.array_equal(t0, shuffle_ticket(keys, 0))  # pure
    t1 = shuffle_ticket(keys, 1)
    assert (t0 != t1).mean() > 0.99  # seeds independent
    # growth-stable: a key's ticket is unchanged in a bigger corpus
    big = shuffle_ticket(np.arange(5000, dtype=np.int64), 0)
    assert np.array_equal(big[:1000], t0)
    # uniform-ish: order correlates with neither key order nor sample_ticket
    order = np.argsort(t0)
    assert abs(np.corrcoef(order, np.arange(1000))[0, 1]) < 0.1


def test_deterministic_shuffle_partition_invariant(ray_session):
    df = _docs(500)
    orders = []
    for nparts in (2, 16):
        ds = ray.data.from_pandas(
            df.sample(frac=1.0, random_state=nparts)
        ).repartition(nparts)
        out = deterministic_shuffle(ds, "doc_id", seed=42)
        got = out.to_pandas()
        orders.append(got["doc_id"].tolist())
        assert "_shuffle_ord" not in got.columns  # dropped by default
    assert orders[0] == orders[1]
    assert orders[0] != sorted(orders[0])  # actually shuffled
    # a different seed produces a different order over the same rows
    other = (
        deterministic_shuffle(
            ray.data.from_pandas(df), "doc_id", seed=43
        )
        .to_pandas()["doc_id"]
        .tolist()
    )
    assert other != orders[0]
    assert sorted(other) == sorted(orders[0])


def test_deterministic_shuffle_string_keys_keep_ord(ray_session):
    df = _docs(200)
    out = deterministic_shuffle(
        ray.data.from_pandas(df), "url", seed=5, keep_ord_col=True
    ).to_pandas()
    assert "_shuffle_ord" in out.columns
    assert out["_shuffle_ord"].is_monotonic_increasing
    assert out["url"].tolist() != sorted(out["url"].tolist())
    # ticket column alone (pure map) matches the sorted output's pairs
    tick = add_shuffle_ticket(
        ray.data.from_pandas(df), "url", 5
    ).to_pandas()
    want = dict(zip(tick["url"], tick["_shuffle_ord"]))
    assert all(want[u] == o for u, o in zip(out["url"], out["_shuffle_ord"]))


def test_export_shards_shuffle_seed(ray_session, tmp_path):
    import duckdb

    from ocr_dataset_builder_ray.pipelines.export import export_training_shards

    df = _docs(400)
    outs = []
    for i, nparts in enumerate((3, 11)):
        out = str(tmp_path / f"e{i}")
        m = export_training_shards(
            ray.data.from_pandas(
                df.sample(frac=1.0, random_state=i)
            ).repartition(nparts),
            out,
            4,
            key_col="doc_id",
            shuffle_seed=9,
        )
        assert m["shuffle_seed"] == 9
        got = duckdb.sql(
            f"SELECT * FROM read_parquet('{out}/shard=*/*.parquet', "
            "hive_partitioning=1) ORDER BY shard, _shuffle_ord"
        ).df()
        outs.append(got.reset_index(drop=True))
    pd.testing.assert_frame_equal(
        outs[0], outs[1].astype(outs[0].dtypes.to_dict())
    )
    # within-shard order is shuffled, not key order
    s0 = outs[0][outs[0]["shard"].astype(int) == int(outs[0]["shard"].iloc[0])]
    assert s0["doc_id"].tolist() != sorted(s0["doc_id"].tolist())
    # without a seed the manifest records None and no ord column is written
    out3 = str(tmp_path / "noseed")
    m3 = export_training_shards(
        ray.data.from_pandas(df), out3, 4, key_col="doc_id"
    )
    assert m3["shuffle_seed"] is None
    cols = duckdb.sql(
        f"SELECT * FROM read_parquet('{out3}/shard=*/*.parquet') LIMIT 0"
    ).df()
    assert "_shuffle_ord" not in cols.columns
