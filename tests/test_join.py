"""hash_join vs DuckDB on the real testdata tables (sf0.001)."""

import os

import duckdb
import pandas as pd
import pytest

import ray.data

from ocr_dataset_builder_ray.stages.join import hash_join

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="testdata sf0.001 not present"
)


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("customer", "orders", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _read(t: str, cols) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{SF}/{t}.parquet", columns=list(cols))


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return (
        df[cols]
        .sort_values(cols, kind="stable")
        .reset_index(drop=True)
        .astype({c: "float64" for c in cols if df[c].dtype.kind == "f"})
    )


def test_inner_join_matches_duckdb(ray_session):
    got = hash_join(
        _read("customer", ["c_custkey", "c_name", "c_nationkey"]),
        _read("orders", ["o_custkey", "o_orderkey", "o_totalprice"]),
        on="c_custkey",
        right_on="o_custkey",
        how="inner",
        num_partitions=8,
    ).to_pandas()
    # Ray's native join drops the right key column when right_on differs
    exp = _duck(
        """SELECT c_custkey, c_name, c_nationkey, o_orderkey, o_totalprice
           FROM customer JOIN orders ON c_custkey = o_custkey"""
    )
    pd.testing.assert_frame_equal(_norm(got), _norm(exp), check_dtype=False)


def test_left_join_matches_duckdb(ray_session):
    got = hash_join(
        _read("customer", ["c_custkey", "c_acctbal"]),
        _read("orders", ["o_custkey", "o_orderkey"]),
        on="c_custkey",
        right_on="o_custkey",
        how="left",
        num_partitions=4,
    ).to_pandas()
    exp = _duck(
        """SELECT c_custkey, c_acctbal, o_orderkey
           FROM customer LEFT JOIN orders ON c_custkey = o_custkey"""
    )
    pd.testing.assert_frame_equal(_norm(got), _norm(exp), check_dtype=False)


def test_outer_join_same_key_name(ray_session):
    # shared key name (nationkey) exercises the single-key-column path
    got = hash_join(
        _read("customer", ["c_nationkey", "c_custkey"]).map_batches(
            lambda df: df.rename(columns={"c_nationkey": "nationkey"}),
            batch_format="pandas",
        ),
        _read("nation", ["n_nationkey", "n_name"]).map_batches(
            lambda df: df.rename(columns={"n_nationkey": "nationkey"}),
            batch_format="pandas",
        ),
        on="nationkey",
        how="outer",
        num_partitions=4,
    ).to_pandas()
    exp = _duck(
        """SELECT COALESCE(c_nationkey, n_nationkey) AS nationkey, c_custkey,
                  n_name
           FROM customer FULL JOIN nation ON c_nationkey = n_nationkey"""
    )
    pd.testing.assert_frame_equal(_norm(got), _norm(exp), check_dtype=False)


def test_semi_and_anti_join(ray_session):
    # restrict the right side so BOTH outcomes are non-degenerate
    # (at sf0.001 every customer has at least one order)
    cust = _read("customer", ["c_custkey", "c_name", "c_mktsegment"])
    orders = _read("orders", ["o_custkey"]).filter(expr="o_custkey <= 70")
    semi = hash_join(
        cust, orders, on="c_custkey", right_on="o_custkey", how="semi",
        num_partitions=4,
    ).to_pandas()
    anti = hash_join(
        cust, orders, on="c_custkey", right_on="o_custkey", how="anti",
        num_partitions=4,
    ).to_pandas()
    exp_semi = _duck(
        """SELECT c_custkey, c_name, c_mktsegment FROM customer
           WHERE c_custkey IN (SELECT o_custkey FROM orders
                               WHERE o_custkey <= 70)"""
    )
    exp_anti = _duck(
        """SELECT c_custkey, c_name, c_mktsegment FROM customer
           WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                   WHERE o_custkey <= 70)"""
    )
    assert len(exp_semi) > 0 and len(exp_anti) > 0
    assert sorted(semi.columns) == sorted(exp_semi.columns)
    assert sorted(anti.columns) == sorted(exp_anti.columns)
    pd.testing.assert_frame_equal(_norm(semi), _norm(exp_semi), check_dtype=False)
    pd.testing.assert_frame_equal(_norm(anti), _norm(exp_anti), check_dtype=False)
    # semi never duplicates a left row, and the two partition customer
    assert len(semi) + len(anti) == cust.count()
    assert semi["c_custkey"].is_unique


def test_bad_how_raises(ray_session):
    with pytest.raises(ValueError, match="how="):
        hash_join(
            _read("nation", ["n_nationkey"]),
            _read("nation", ["n_nationkey"]),
            on="n_nationkey",
            how="cross",
        )
