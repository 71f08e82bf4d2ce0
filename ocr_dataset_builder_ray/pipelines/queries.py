"""Registered queries + DuckDB oracle SQL (the driver correctness gate).

Each entry pairs a Ray-Data-first implementation (streaming
``map_batches`` / ``groupby`` / ``aggregate`` — no driver-side loops
over row data) with the ANSI-SQL equivalent DuckDB runs on the same
parquet tables. Column names match exactly on both sides (the driver
hashes values under sorted column names). Float aggregate columns are
rounded to 3 decimals on BOTH sides so distributed summation order
cannot flip the value hash.

Operator coverage maps to SURVEY.md §2: filters/projections (M1-M7),
grouped aggregation with partial combine (G1-G2), broadcast hash /
semi / anti joins (J1-J4), sorts/top-k/limits (O1-O5), distinct &
dedup (D1-D2), window/session semantics (§2.10), plus the added
training-data operators (dedup family, similarity search, text
analysis) and the flagship extraction pipeline itself.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum


from functools import lru_cache


@lru_cache(maxsize=256)
def _clean_schema(path: str, columns: tuple[str, ...] | None) -> pa.Schema:
    """File schema with the pandas metadata stripped (and pruned to the
    selected columns). pyarrow's ``Schema.__hash__`` chokes on the
    ``b'pandas'`` metadata dict the testdata writer left behind, which
    makes Ray's block-schema dedup log "Failed to hash the schemas" in
    every read task — passing an explicit metadata-free schema keeps
    the bench/gate output clean (VERDICT r2 #7; the ACTUAL source was
    file metadata, not the model-call kwargs)."""
    schema = pq.read_schema(path).remove_metadata()
    if columns is None:
        return schema
    return pa.schema([schema.field(c) for c in columns])


def _t(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    path = f"{sf_dir}/{table}.parquet"
    return ray.data.read_parquet(
        path,
        columns=columns,
        schema=_clean_schema(path, tuple(columns) if columns else None),
    )


def _small_pdf(sf_dir: str, table: str, columns: list[str] | None = None) -> pd.DataFrame:
    """Driver-side read of a SMALL side table (broadcast pattern, J1)."""
    return pq.read_table(f"{sf_dir}/{table}.parquet", columns=columns).to_pandas()


# ---------------------------------------------------------------------------
# Relational operators over the TPC-H-ish tables
# ---------------------------------------------------------------------------


def _cents(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Fixed-point: floor(x*100 + 0.5) as int64 — identical on every
    engine, so distributed integer sums are order-independent and
    byte-equal to the DuckDB oracle (no float-sum rounding boundary)."""
    return pc.cast(pc.floor(pc.add(pc.multiply(arr, pa.scalar(100.0)), pa.scalar(0.5))), pa.int64())


def q01_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q1-shaped grouped aggregate (G2: partial+final is native).

    Money/quantity sums are exact fixed-point cents (int64); averages
    are a deterministic double division of those integers.
    """
    cutoff = _dt.datetime(1998, 9, 2)
    ds = _t(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def _prep(t: pa.Table) -> pa.Table:
        """Per-batch combiner: the shuffle moves #groups rows per block,
        not #input rows (G2 partial+final)."""
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(cutoff, pa.timestamp("us"))))
        disc_price = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        part = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_cents": _cents(t["l_quantity"]),
                "base_cents": _cents(t["l_extendedprice"]),
                "disc_cents": _cents(disc_price),
            }
        )
        return pa.TableGroupBy(part, ["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_cents", "sum"), ("base_cents", "sum"), ("disc_cents", "sum"), ([], "count_all")]
        )

    res = (
        ds.map_batches(_prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_cents_sum", alias_name="sum_qty"),
            Sum("base_cents_sum", alias_name="sum_base_price"),
            Sum("disc_cents_sum", alias_name="sum_disc_price"),
            Sum("count_all", alias_name="count_order"),
        )
        .to_pandas()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    for c in ("sum_qty", "sum_base_price", "sum_disc_price", "count_order"):
        res[c] = res[c].astype("int64")
    res["avg_qty"] = (res["sum_qty"] / res["count_order"]) / 100.0
    return res[
        ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price", "sum_disc_price", "avg_qty", "count_order"]
    ]


def q02_high_qty_items(sf_dir: str) -> ray.data.Dataset:
    """Vectorized filter + projection pushed to the read (M1 gate)."""
    ds = _t(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"])
    return ds.map_batches(
        lambda t: t.filter(pc.greater(t["l_quantity"], pa.scalar(45.0))),
        batch_format="pyarrow",
    )


def q03_segment_revenue(sf_dir: str) -> pd.DataFrame:
    """Broadcast hash join orders⋈customer (J1 small-side broadcast)."""
    cust = _small_pdf(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    cust_ref = ray.put(cust)

    def _join(df: pd.DataFrame) -> pd.DataFrame:
        # broadcast join + per-batch partial aggregate (combiner)
        side = ray.get(cust_ref)
        out = df.merge(side, left_on="o_custkey", right_on="c_custkey", how="inner")
        out["price_cents"] = np.floor(out["o_totalprice"] * 100.0 + 0.5).astype("int64")
        return out.groupby("c_mktsegment", as_index=False).agg(
            n_orders=("price_cents", "size"), total_price=("price_cents", "sum")
        )

    res = (
        _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(_join, batch_format="pandas")
        .groupby("c_mktsegment")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("total_price", alias_name="total_price"),
        )
        .to_pandas()
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    res["total_price"] = res["total_price"].astype("int64")
    res["n_orders"] = res["n_orders"].astype("int64")
    return res


def q04_region_customers(sf_dir: str) -> pd.DataFrame:
    """3-way broadcast join customer⋈nation⋈region → counts per region."""
    nation = _small_pdf(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    region = _small_pdf(sf_dir, "region", ["r_regionkey", "r_name"])
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    dim_ref = ray.put(dim[["n_nationkey", "r_name"]])

    def _join(df: pd.DataFrame) -> pd.DataFrame:
        side = ray.get(dim_ref)
        j = df.merge(side, left_on="c_nationkey", right_on="n_nationkey")
        return j.groupby("r_name", as_index=False).agg(n_customers=("r_name", "size"))

    res = (
        _t(sf_dir, "customer", ["c_custkey", "c_nationkey"])
        .map_batches(_join, batch_format="pandas")
        .groupby("r_name")
        .aggregate(Sum("n_customers", alias_name="n_customers"))
        .to_pandas()
        .sort_values("r_name")
        .reset_index(drop=True)
    )
    res["n_customers"] = res["n_customers"].astype("int64")
    return res


def q05_top_orders(sf_dir: str) -> pd.DataFrame:
    """Global top-k: sort + limit (O2/O3; deterministic tie-break)."""
    res = (
        _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(10)
        .to_pandas()
    )
    return res


def q06_distinct_flags(sf_dir: str) -> pd.DataFrame:
    """Distinct over two columns (D1 key-level dedup as groupby)."""
    return (
        _t(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
        .to_pandas()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )


def q07_event_type_stats(sf_dir: str) -> pd.DataFrame:
    """Grouped agg + count-distinct via two-level groupby (G2)."""
    ds = _t(sf_dir, "events", ["event_type", "user_id", "value"])

    def _base_partial(t: pa.Table) -> pa.Table:
        part = pa.table({"event_type": t["event_type"], "value_cents": _cents(t["value"])})
        return pa.TableGroupBy(part, "event_type").aggregate(
            [("value_cents", "sum"), ([], "count_all")]
        )

    def _pair_partial(t: pa.Table) -> pa.Table:
        # within-batch pair dedup cuts the distinct shuffle volume
        part = pa.table({"event_type": t["event_type"], "user_id": t["user_id"]})
        return pa.TableGroupBy(part, ["event_type", "user_id"]).aggregate([])

    base = (
        ds.map_batches(_base_partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("count_all", alias_name="n_events"),
            Sum("value_cents_sum", alias_name="sum_value"),
        )
        .to_pandas()
    )
    # distinct (event_type, user_id) pairs, then count per type — the
    # shuffle-native exact count-distinct (pre-deduped per batch)
    pairs = (
        ds.map_batches(_pair_partial, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .aggregate(Count(alias_name="_c"))
        .groupby("event_type")
        .aggregate(Count(alias_name="n_users"))
        .to_pandas()
    )
    res = base.merge(pairs, on="event_type").sort_values("event_type").reset_index(drop=True)
    res["sum_value"] = res["sum_value"].astype("int64")
    res["n_events"] = res["n_events"].astype("int64")
    return res[["event_type", "n_events", "n_users", "sum_value"]]


def q08_hourly_events(sf_dir: str) -> pd.DataFrame:
    """Tumbling window as grouped agg on a derived key (§2.10 windows)."""
    ds = _t(sf_dir, "events", ["event_type", "ts", "value"])

    def _bucket(df: pd.DataFrame) -> pd.DataFrame:
        hour = (df["ts"].dt.floor("h") - pd.Timestamp(0)) // pd.Timedelta(seconds=1)
        part = pd.DataFrame(
            {
                "event_type": df["event_type"],
                "hour_epoch": hour.astype("int64"),
                "value_cents": np.floor(df["value"] * 100.0 + 0.5).astype("int64"),
            }
        )
        return part.groupby(["event_type", "hour_epoch"], as_index=False).agg(
            n_events=("value_cents", "size"), sum_value=("value_cents", "sum")
        )

    res = (
        ds.map_batches(_bucket, batch_format="pandas")
        .groupby(["event_type", "hour_epoch"])
        .aggregate(Sum("n_events", alias_name="n_events"), Sum("sum_value", alias_name="sum_value"))
        .to_pandas()
        .sort_values(["event_type", "hour_epoch"])
        .reset_index(drop=True)
    )
    res["sum_value"] = res["sum_value"].astype("int64")
    res["n_events"] = res["n_events"].astype("int64")
    return res


def q09_union_extremes(sf_dir: str) -> pd.DataFrame:
    """Union of two filtered streams then grouped count (D3 union)."""
    ds = _t(sf_dir, "events", ["event_type", "value"])
    hi = ds.map_batches(
        lambda t: t.filter(pc.greater(t["value"], pa.scalar(90.0))), batch_format="pyarrow"
    )
    lo = ds.map_batches(
        lambda t: t.filter(pc.less(t["value"], pa.scalar(10.0))), batch_format="pyarrow"
    )
    return (
        hi.union(lo)
        .groupby("event_type")
        .aggregate(Count(alias_name="n_extreme"))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )


def q10_customers_without_orders(sf_dir: str) -> pd.DataFrame:
    """Anti join via broadcast key set (J3 checkpoint anti-join graft).

    The anti-joined side is orders above 300000 total price — at this
    data's order/customer ratio every customer has SOME order, so an
    unfiltered anti-join is empty at every sf and the oracle would
    pass vacuously (VERDICT r2 "What's wrong" #1); the high-value
    restriction leaves a real gap (3 customers at sf0.001, 30 at
    sf0.01) that the gate value-checks.
    """
    orders = _small_pdf(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    orders = orders[orders["o_totalprice"] > 300000.0]
    have = ray.put(pa.array(orders["o_custkey"].unique()))

    def _anti(t: pa.Table) -> pa.Table:
        keys = ray.get(have)
        return t.filter(pc.invert(pc.is_in(t["c_custkey"], value_set=keys)))

    res = (
        _t(sf_dir, "customer", ["c_custkey", "c_name"])
        .map_batches(_anti, batch_format="pyarrow")
        .to_pandas()
    )
    if res.empty:  # empty Dataset -> to_pandas loses the schema
        res = pd.DataFrame({"c_custkey": pd.Series(dtype="int64"), "c_name": pd.Series(dtype="object")})
    return res.sort_values("c_custkey").reset_index(drop=True)


def q11_parts_in_lineitem(sf_dir: str) -> pd.DataFrame:
    """Semi join via broadcast key set (J4 semi-join graft).

    The key set comes from a distributed distinct on lineitem (unique
    partkeys), which is small; it is then broadcast to filter part.
    """
    partkeys = (
        _t(sf_dir, "lineitem", ["l_partkey"])
        .groupby("l_partkey")
        .aggregate(Count(alias_name="_c"))
        .to_pandas()["l_partkey"]
    )
    have = ray.put(pa.array(partkeys))

    def _semi(t: pa.Table) -> pa.Table:
        keys = ray.get(have)
        return t.filter(pc.is_in(t["p_partkey"], value_set=keys))

    return (
        _t(sf_dir, "part", ["p_partkey", "p_name"])
        .map_batches(_semi, batch_format="pyarrow")
        .to_pandas()
        .sort_values("p_partkey")
        .reset_index(drop=True)
    )


def q12_nation_sort(sf_dir: str) -> pd.DataFrame:
    """Multi-key sort with mixed directions (O1/O2)."""
    return (
        _t(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
        .sort(["n_regionkey", "n_name"], descending=[True, False])
        .to_pandas()
    )


# ---------------------------------------------------------------------------
# Text / documents operators
# ---------------------------------------------------------------------------


def q13_doc_stats_by_lang(sf_dir: str) -> pd.DataFrame:
    """Per-lang doc stats with chars recomputed from text (M6 metrics)."""
    ds = _t(sf_dir, "documents", ["lang", "text"])

    def _chars(t: pa.Table) -> pa.Table:
        part = pa.table({"lang": t["lang"], "chars": pc.cast(pc.utf8_length(t["text"]), pa.int64())})
        return pa.TableGroupBy(part, "lang").aggregate([("chars", "sum"), ([], "count_all")])

    res = (
        ds.map_batches(_chars, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("count_all", alias_name="n_docs"),
            Sum("chars_sum", alias_name="sum_chars"),
        )
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    res["sum_chars"] = res["sum_chars"].astype("int64")
    res["n_docs"] = res["n_docs"].astype("int64")
    res["avg_chars"] = res["sum_chars"] / res["n_docs"]  # exact int inputs
    return res[["lang", "n_docs", "sum_chars", "avg_chars"]]


def q14_token_counts(sf_dir: str) -> pd.DataFrame:
    """Whitespace token counting per doc, aggregated per lang."""
    from ..functions.textstats import token_count_ws

    ds = _t(sf_dir, "documents", ["lang", "text"])

    def _tok(df: pd.DataFrame) -> pd.DataFrame:
        part = pd.DataFrame(
            {"lang": df["lang"], "toks": [token_count_ws(t) for t in df["text"].fillna("")]}
        )
        return part.groupby("lang", as_index=False).agg(
            sum_tokens=("toks", "sum"), max_tokens=("toks", "max"), min_tokens=("toks", "min")
        )

    res = (
        ds.map_batches(_tok, batch_format="pandas")
        .groupby("lang")
        .aggregate(
            Sum("sum_tokens", alias_name="sum_tokens"),
            Max("max_tokens", alias_name="max_tokens"),
            Min("min_tokens", alias_name="min_tokens"),
        )
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    res["sum_tokens"] = res["sum_tokens"].astype("int64")
    res["max_tokens"] = res["max_tokens"].astype("int64")
    res["min_tokens"] = res["min_tokens"].astype("int64")
    return res


def q15_dedup_docs(sf_dir: str) -> pd.DataFrame:
    """Exact content dedup: md5(text) hash-partition → min doc_id (D2)."""
    from ..stages.dedup import exact_dedup

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    kept = exact_dedup(ds, "text", "doc_id").select_columns(["doc_id"])
    return kept.to_pandas().sort_values("doc_id").reset_index(drop=True)


def q16_doc_fingerprints(sf_dir: str) -> pd.DataFrame:
    """Rolling-hash document fingerprint (non-SQL; rows-only check)."""
    from ..functions.hashing import rolling_fingerprint

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def _fp(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "fingerprint": [format(rolling_fingerprint(t or ""), "016x") for t in df["text"]],
            }
        )

    return ds.map_batches(_fp, batch_format="pandas").to_pandas().sort_values("doc_id").reset_index(drop=True)


def q17_langid(sf_dir: str) -> pd.DataFrame:
    """Heuristic language-ID column (non-SQL; rows-only check)."""
    from ..functions.textstats import detect_language

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def _lid(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "lang_detected": [detect_language(t or "") for t in df["text"]]}
        )

    return ds.map_batches(_lid, batch_format="pandas").to_pandas().sort_values("doc_id").reset_index(drop=True)


def q18_quality_scores(sf_dir: str) -> pd.DataFrame:
    """Quality scoring features per doc (non-SQL; rows-only check)."""
    from ..functions.textstats import quality_features

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def _q(df: pd.DataFrame) -> pd.DataFrame:
        feats = [quality_features(t or "") for t in df["text"]]
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "quality_score": [f["quality_score"] for f in feats],
                "stopword_ratio": [round(f["q_stopword_ratio"], 6) for f in feats],
                "alpha_ratio": [round(f["q_alpha_ratio"], 6) for f in feats],
            }
        )

    return ds.map_batches(_q, batch_format="pandas").to_pandas().sort_values("doc_id").reset_index(drop=True)


def q19_minhash_dedup(sf_dir: str) -> pd.DataFrame:
    """MinHash+LSH near-dedup survivors (non-SQL; rows-only check)."""
    from ..stages.dedup import minhash_lsh_dedup

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    kept = minhash_lsh_dedup(ds, "text", "doc_id", threshold=0.8)
    return (
        kept.select_columns(["doc_id"]).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )


def q20_simhash(sf_dir: str) -> pd.DataFrame:
    """64-bit SimHash per doc (non-SQL; rows-only check)."""
    from ..stages.dedup import add_simhash

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    res = add_simhash(ds, "text").select_columns(["doc_id", "simhash"])

    def _hex(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "simhash": pa.array([format(h, "016x") for h in t["simhash"].to_pylist()]),
            }
        )

    return res.map_batches(_hex, batch_format="pyarrow").to_pandas().sort_values("doc_id").reset_index(drop=True)


def q21_ngram_dedup(sf_dir: str) -> pd.DataFrame:
    """Word-3-gram Jaccard near-dedup survivors (non-SQL; rows-only)."""
    from ..stages.dedup import ngram_jaccard_dedup

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    kept = ngram_jaccard_dedup(ds, "text", "doc_id", threshold=0.8)
    return (
        kept.select_columns(["doc_id"]).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# Embeddings / similarity search
# ---------------------------------------------------------------------------


def q22_knn(sf_dir: str) -> pd.DataFrame:
    """Brute-force cosine top-5 for 3 query vectors (broadcast matmul)."""
    from ..stages.similarity import knn_bruteforce

    qdf = _small_pdf(sf_dir, "embeddings", ["vec_id", "embedding"])
    qdf = qdf[qdf["vec_id"].isin([0, 1, 2])].sort_values("vec_id")
    queries = np.stack([np.asarray(v, dtype=np.float64) for v in qdf["embedding"]])
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    res = knn_bruteforce(ds, queries, k=5)
    out = res[["query_id", "vec_id", "rank"]].copy()
    out["query_id"] = out["query_id"].astype("int64")
    out["vec_id"] = out["vec_id"].astype("int64")
    out["rank"] = out["rank"].astype("int64")
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


def q23_embedding_dedup(sf_dir: str) -> pd.DataFrame:
    """Embedding-cosine near-dup survivors (non-SQL; rows-only check)."""
    from ..stages.dedup import embedding_dedup

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    # n_buckets=1 is the exact form — the oracle is exact pairwise SQL,
    # and hyperplane bucketing (approximate by design) would make the
    # gate seed-dependent (ADVICE r2). The bucketed scale path is
    # exercised with recall accounting in bench --dedup and tests.
    kept = embedding_dedup(ds, "embedding", "vec_id", threshold=0.95, n_buckets=1)
    return (
        kept.select_columns(["vec_id"]).to_pandas().sort_values("vec_id").reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# Stream-shaped operators
# ---------------------------------------------------------------------------


def q24_user_sessions(sf_dir: str) -> pd.DataFrame:
    """Session windows (30-min gap) per user via ordered map_groups."""
    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id"])
    gap = pd.Timedelta(minutes=30)

    def _sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        new = (g["ts"].diff().isna()) | (g["ts"].diff() > gap)
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]], "n_sessions": [int(new.sum())]})

    return (
        ds.groupby("user_id")
        .map_groups(_sessions, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )


def q25_asof_join(sf_dir: str) -> pd.DataFrame:
    """As-of join: each event matched to the user's latest prior order.

    Broadcast the (deduped) orders side; per batch ``pd.merge_asof``
    (sorted within batch — correctness is per-row, so batching is
    irrelevant). SURVEY.md §4 'as-of join' custom-operator recipe.
    """
    od = _small_pdf(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_orderkey"])
    od = (
        od.groupby(["o_custkey", "o_orderdate"], as_index=False)["o_orderkey"]
        .max()
        .sort_values("o_orderdate")
    )
    od_ref = ray.put(od)

    def _asof(df: pd.DataFrame) -> pd.DataFrame:
        right = ray.get(od_ref)
        left = df.sort_values("ts")
        merged = pd.merge_asof(
            left,
            right,
            left_on="ts",
            right_on="o_orderdate",
            left_by="user_id",
            right_by="o_custkey",
            direction="backward",
        )
        merged = merged.dropna(subset=["o_orderkey"])
        return pd.DataFrame(
            {
                "event_id": merged["event_id"].astype("int64"),
                "o_orderkey": merged["o_orderkey"].astype("int64"),
            }
        )

    return (
        _t(sf_dir, "events", ["event_id", "user_id", "ts"])
        .map_batches(_asof, batch_format="pandas")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# Flagship extraction (rows-only: input is the synthetic pages corpus)
# ---------------------------------------------------------------------------

_SF_PAGE_ROWS = {"0.001": 500, "0.01": 2000, "0.1": 20000}


def _pages_rows_for(sf_dir: str) -> int:
    for tag, n in _SF_PAGE_ROWS.items():
        if sf_dir.rstrip("/").endswith(f"sf{tag}"):
            return n
    return 2000


def q26_extract_pages(sf_dir: str) -> pd.DataFrame:
    """Flagship extraction pipeline over the deterministic synthetic
    pages corpus sized for the scale factor (non-SQL; rows-only)."""
    from ..sources.pages import default_corpus_dir, generate_pages_corpus, pages_parquet_files
    from .extraction import extraction_pipeline

    n = _pages_rows_for(sf_dir)
    corpus = generate_pages_corpus(default_corpus_dir(n), n_rows=n)
    ds = extraction_pipeline(pages_parquet_files(corpus))
    res = ds.select_columns(["url", "status", "n_chars", "n_spans", "content_hash"])
    return res.to_pandas().sort_values("url").reset_index(drop=True)


def q27_top_orders_per_segment(sf_dir: str) -> pd.DataFrame:
    """Per-group top-k (window-rank analogue): top-3 orders per market
    segment, partial top-k per batch before the tiny final groupby."""
    cust = _small_pdf(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    cust_ref = ray.put(cust)

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        side = ray.get(cust_ref)
        j = df.merge(side, left_on="o_custkey", right_on="c_custkey")
        j = j.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
        return j.groupby("c_mktsegment", sort=False).head(3)[
            ["c_mktsegment", "o_orderkey", "o_totalprice"]
        ]

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True]).head(3)
        g = g.reset_index(drop=True)
        g["rank"] = (g.index + 1).astype("int64")
        return g

    res = (
        _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
        .map_batches(_partial, batch_format="pandas")
        .groupby("c_mktsegment")
        .map_groups(_final, batch_format="pandas")
        .to_pandas()
        .sort_values(["c_mktsegment", "rank"])
        .reset_index(drop=True)
    )
    res["rank"] = res["rank"].astype("int64")
    return res


def q28_price_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact discrete quantiles per group (sorted-scan map_groups)."""
    ds = _t(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def _prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"o_orderpriority": t["o_orderpriority"], "price_cents": _cents(t["o_totalprice"])}
        )

    def _quant(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["price_cents"].to_numpy())
        n = len(v)
        # discrete quantile, DuckDB quantile_disc convention:
        # v_sorted[ceil(n*q) - 1] (0-based)
        disc = lambda q: int(v[max(0, int(np.ceil(n * q)) - 1)])  # noqa: E731
        return pd.DataFrame(
            {
                "o_orderpriority": [g["o_orderpriority"].iloc[0]],
                "median_price": [disc(0.5)],
                "p90_price": [disc(0.9)],
                "n_orders": [n],
            }
        )

    res = (
        ds.map_batches(_prep, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .map_groups(_quant, batch_format="pandas")
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    for c in ("median_price", "p90_price", "n_orders"):
        res[c] = res[c].astype("int64")
    return res


def q29_nation_revenue(sf_dir: str) -> pd.DataFrame:
    """lineitem ⋈ supplier ⋈ nation via one composed broadcast dim."""
    supp = _small_pdf(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nation = _small_pdf(sf_dir, "nation", ["n_nationkey", "n_name"])
    dim = supp.merge(nation, left_on="s_nationkey", right_on="n_nationkey")
    dim_ref = ray.put(dim[["s_suppkey", "n_name"]])

    def _join(df: pd.DataFrame) -> pd.DataFrame:
        # broadcast join + per-batch partial aggregate (combiner)
        side = ray.get(dim_ref)
        j = df.merge(side, left_on="l_suppkey", right_on="s_suppkey")
        disc = j["l_extendedprice"] * (1.0 - j["l_discount"])
        j["rev_cents"] = np.floor(disc * 100.0 + 0.5).astype("int64")
        return j.groupby("n_name", as_index=False).agg(
            n_items=("rev_cents", "size"), revenue=("rev_cents", "sum")
        )

    res = (
        _t(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount"])
        .map_batches(_join, batch_format="pandas")
        .groupby("n_name")
        .aggregate(Sum("n_items", alias_name="n_items"), Sum("revenue", alias_name="revenue"))
        .to_pandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    res["revenue"] = res["revenue"].astype("int64")
    res["n_items"] = res["n_items"].astype("int64")
    return res


def q30_top_event_per_type(sf_dir: str) -> pd.DataFrame:
    """Distributed argmax per group: partial (max value, min id at max)
    per batch, same fold as the final combine."""
    ds = _t(sf_dir, "events", ["event_type", "event_id", "value"])

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if "max_value" not in df.columns:
            df["max_value"] = np.floor(df["value"] * 100.0 + 0.5).astype("int64")
        out = []
        for et, g in df.groupby("event_type", sort=False):
            mv = g["max_value"].max()
            out.append(
                {
                    "event_type": et,
                    "max_value": int(mv),
                    "event_id": int(g.loc[g["max_value"] == mv, "event_id"].min()),
                }
            )
        res = pd.DataFrame(out, columns=["event_type", "max_value", "event_id"])
        # schema-stable empties: map_groups packs multiple groups per
        # output block; an all-object empty frame next to typed frames
        # triggers Ray's RefBundle schema warnings
        return res.astype(
            {"event_type": df["event_type"].dtype, "max_value": "int64", "event_id": "int64"}
        )

    res = (
        ds.map_batches(_fold, batch_format="pandas")
        .groupby("event_type")
        .map_groups(_fold, batch_format="pandas")
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    res["max_value"] = res["max_value"].astype("int64")
    res["event_id"] = res["event_id"].astype("int64")
    return res


def q31_ivf_knn(sf_dir: str) -> pd.DataFrame:
    """IVF-bucketed approximate KNN (scale path; rows-only check)."""
    from ..stages.similarity import knn_ivf

    qdf = _small_pdf(sf_dir, "embeddings", ["vec_id", "embedding"])
    qdf = qdf[qdf["vec_id"].isin([0, 1, 2])].sort_values("vec_id")
    queries = np.stack([np.asarray(v, dtype=np.float64) for v in qdf["embedding"]])
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    res = knn_ivf(ds, queries, k=5, n_centroids=8, nprobe=4)
    out = res[["query_id", "vec_id", "rank"]].copy()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


def q32_simhash_dedup(sf_dir: str) -> pd.DataFrame:
    """SimHash banded near-dedup survivors (non-SQL; rows-only)."""
    from ..stages.dedup import simhash_dedup

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    kept = simhash_dedup(ds, "text", "doc_id", max_hamming=3)
    return (
        kept.select_columns(["doc_id"]).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )


def q33_media_decode(sf_dir: str) -> pd.DataFrame:
    """Multimodal decode/resize plumbing over binary payloads
    (deterministic fake codec; non-SQL; rows-only)."""
    from ..sources.pages import default_corpus_dir, generate_pages_corpus, pages_parquet_files
    from ..stages.multimodal import decode_pipeline

    n = _pages_rows_for(sf_dir)
    corpus = generate_pages_corpus(default_corpus_dir(n), n_rows=n)
    pages = ray.data.read_parquet(pages_parquet_files(corpus), columns=["url", "html"])

    def _as_media(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_id": t["url"],
                "media": t["html"],
                "media_type": pa.array(["image"] * t.num_rows),
            }
        )

    media = pages.map_batches(_as_media, batch_format="pyarrow")
    out = decode_pipeline(media, fake=True, batch_size=64)
    res = out.select_columns(["media_id", "width", "height", "checksum", "decoded_ok"])
    return res.to_pandas().sort_values("media_id").reset_index(drop=True)


def q34_cleaning_pairs(sf_dir: str) -> pd.DataFrame:
    """Export projection 'cleaning_pairs': raw noisy text vs extracted
    clean text per url (K6 exporter; non-SQL; rows-only)."""
    from ..pipelines.export import EXPORT_MODES
    from ..sources.pages import default_corpus_dir, generate_pages_corpus, pages_parquet_files
    from .extraction import extraction_pipeline

    n = _pages_rows_for(sf_dir)
    corpus = generate_pages_corpus(default_corpus_dir(n), n_rows=n)
    files = pages_parquet_files(corpus)
    raw = pq.read_table(files[0], columns=["url", "text"]).to_pandas()  # demo shard
    raw_ref = ray.put(dict(zip(raw["url"], raw["text"])))

    ds = extraction_pipeline(files[:1])

    def _attach_noisy(t: pa.Table) -> pa.Table:
        side = ray.get(raw_ref)
        noisy = [side.get(u, "") for u in t["url"].to_pylist()]
        return t.append_column("text", pa.array(noisy, type=pa.string()))

    joined = ds.map_batches(_attach_noisy, batch_format="pyarrow")
    pairs = EXPORT_MODES["cleaning_pairs"](joined)
    return pairs.to_pandas().sort_values("url").reset_index(drop=True)


def q35_augmented_docs(sf_dir: str) -> pd.DataFrame:
    """Deterministic noise-model stage: profile keyed on doc id hash
    (fixes the reference's unseeded random.choice; rows-only)."""
    from ..functions.augment import apply_profile, profile_for_key
    from ..functions.hashing import md5_hex

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def _aug(df: pd.DataFrame) -> pd.DataFrame:
        profiles, hashes, lens = [], [], []
        for did, text in zip(df["doc_id"], df["text"]):
            key = f"doc:{did}"
            prof = profile_for_key(key)
            noisy = apply_profile(prof, text or "", key)
            profiles.append(prof)
            hashes.append(md5_hex(noisy))
            lens.append(len(noisy))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "profile": profiles,
                "aug_hash": hashes,
                "aug_chars": lens,
            }
        )

    return (
        ds.map_batches(_aug, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def q38_native_hash_join(sf_dir: str) -> pd.DataFrame:
    """Ray Data native hash-shuffle join (both sides co-partitioned) —
    the large⋈large path where a broadcast side would not fit.

    NOTE: the selective filter runs above the join because Ray 2.49's
    hash-join aggregator fails on hash partitions that received zero
    blocks, which a selective pre-join filter readily produces; at real
    scale the filter would be pushed below the join once that is fixed.

    Threshold 400000 yields ~2% of orders at every sf (298 rows at
    sf0.001, ~3k at sf0.01) so the oracle compares real joined rows —
    the round-2 threshold of 500000 matched nothing and the gate
    passed vacuously (VERDICT r2 "What's wrong" #1).
    """
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _t(sf_dir, "customer", ["c_custkey", "c_name"])
    j = orders.join(
        cust,
        join_type="inner",
        num_partitions=8,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    res = (
        j.map_batches(
            lambda t: t.filter(pc.greater(t["o_totalprice"], pa.scalar(400000.0))),
            batch_format="pyarrow",
        )
        .select_columns(["o_orderkey", "c_name"])
        .to_pandas()
    )
    if res.empty:
        res = pd.DataFrame({"o_orderkey": pd.Series(dtype="int64"), "c_name": pd.Series(dtype="object")})
    return res.sort_values("o_orderkey").reset_index(drop=True)


def q39_user_event_seq(sf_dir: str) -> pd.DataFrame:
    """Ordered window function (ROW_NUMBER per partition): per-user
    event sequence numbers via a grouped ordered scan."""
    ds = _t(sf_dir, "events", ["user_id", "event_id", "ts"])

    def _seq(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].astype("int64"),
                "user_id": g["user_id"].astype("int64"),
                "seq": (g.index + 1).astype("int64"),
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(_seq, batch_format="pandas")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def q40_hopping_windows(sf_dir: str) -> pd.DataFrame:
    """Hopping windows (size 1h, hop 30min): each event lands in two
    overlapping windows — a vectorized 2-way fan-out then grouped count
    with per-batch combiner (§2.10 windows beyond tumbling)."""
    ds = _t(sf_dir, "events", ["event_type", "ts"])

    def _windows(df: pd.DataFrame) -> pd.DataFrame:
        epoch = ((df["ts"].astype("datetime64[us]") - pd.Timestamp(0)) // pd.Timedelta(seconds=1)).astype("int64")
        base = (epoch // 1800) * 1800
        parts = []
        for start in (base, base - 1800):
            keep = start >= 0
            parts.append(
                pd.DataFrame({"event_type": df["event_type"][keep], "window_start": start[keep]})
            )
        allw = pd.concat(parts, ignore_index=True)
        return allw.groupby(["event_type", "window_start"], as_index=False).agg(
            n_events=("window_start", "size")
        )

    res = (
        ds.map_batches(_windows, batch_format="pandas")
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("n_events", alias_name="n_events"))
        .to_pandas()
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )
    res["n_events"] = res["n_events"].astype("int64")
    res["window_start"] = res["window_start"].astype("int64")
    return res


def q41_hll_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Approximate count-distinct per group via mergeable HyperLogLog
    sketches: one 2^p-byte blob per group per batch crosses the
    shuffle instead of every distinct value. Error bound asserted
    in-query against the exact distributed count (non-SQL; rows-only —
    DuckDB's approx_count_distinct uses a different sketch)."""
    from ..functions.hll import approx_distinct

    ds = _t(sf_dir, "events", ["event_type", "user_id"])
    approx = approx_distinct(ds, "user_id", "event_type")
    exact = (
        ds.groupby(["event_type", "user_id"])
        .aggregate(Count(alias_name="_c"))
        .groupby("event_type")
        .aggregate(Count(alias_name="n_exact"))
        .to_pandas()
    )
    res = approx.merge(exact, on="event_type").sort_values("event_type").reset_index(drop=True)
    rel_err = (res["approx_distinct"] - res["n_exact"]).abs() / res["n_exact"]
    assert (rel_err < 0.05).all(), res
    res["approx_distinct"] = res["approx_distinct"].round(1)
    return res[["event_type", "approx_distinct", "n_exact"]]


def q36_training_view(sf_dir: str) -> pd.DataFrame:
    """Denormalized (noisy, clean, augmented) training triples — the J1
    join kept as one wide table (non-SQL; rows-only)."""
    from ..functions.hashing import md5_hex
    from ..sources.pages import default_corpus_dir, generate_pages_corpus, pages_parquet_files
    from .training_view import training_view

    n = _pages_rows_for(sf_dir)
    corpus = generate_pages_corpus(default_corpus_dir(n), n_rows=n)
    ds = training_view(pages_parquet_files(corpus))

    def _digest(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": t["url"],
                "aug_profile": t["aug_profile"],
                "n_tokens": t["n_tokens"],
                "pair_hash": pa.array(
                    [
                        md5_hex((c or "") + "\x00" + (a or ""))
                        for c, a in zip(
                            t["clean_text"].to_pylist(), t["augmented_text"].to_pylist()
                        )
                    ]
                ),
            }
        )

    return (
        ds.map_batches(_digest, batch_format="pyarrow")
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )


def q37_frameref_roundtrip(sf_dir: str) -> pd.DataFrame:
    """F:i delta codec over ordered per-lang groups: encode in a grouped
    scan, decode with the distributed reader, verify the roundtrip
    (M11 parity; non-SQL; rows-only)."""
    from ..functions.framerefs import decode_ref_column, encode_refs
    from ..functions.hashing import md5_hex

    ds = _t(sf_dir, "documents", ["doc_id", "lang", "text"])

    def _encode(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").reset_index(drop=True)
        g["cell"] = encode_refs(list(g["text"].fillna("")))
        return g[["doc_id", "lang", "text", "cell"]]

    encoded = ds.groupby("lang").map_groups(_encode, batch_format="pandas")
    decoded = decode_ref_column(
        encoded, group_col="lang", order_col="doc_id", value_col="cell", out_col="decoded"
    )

    def _check(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "roundtrip_ok": df["decoded"] == df["text"].fillna(""),
                "decoded_hash": [md5_hex(x) for x in df["decoded"]],
            }
        )

    out = (
        decoded.map_batches(_check, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["roundtrip_ok"].all()
    return out


def q42_model_call_costs(sf_dir: str) -> pd.DataFrame:
    """External-model call stage (bounded-concurrency actor pool, retry,
    token/cost accounting — reference llm/text_pipeline.py:57-162) over
    the documents table with the deterministic fake client; per-lang
    cost aggregation. Tiered pricing exercises the threshold branch
    (costing.py:101-144 semantics); cost is fixed-point micro-USD so
    the distributed sum is exact."""
    from ..stages.model_call import model_call

    pricing = {
        "threshold_k": 0.2,
        "<=0.2k": {"input": 1.25, "output": 5.0},
        ">0.2k": {"input": 2.5, "output": 10.0},
    }
    ds = _t(sf_dir, "documents", ["doc_id", "lang", "text"])
    called = model_call(
        ds,
        text_col="text",
        prompt="Clean the following OCR text please",
        pricing=pricing,
        concurrency=(1, 4),
    )

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("lang", as_index=False).agg(
            n_docs=("doc_id", "size"),
            n_failed=("call_status", lambda s: int((s != "ok").sum())),
            sum_input_tokens=("input_tokens", "sum"),
            sum_output_tokens=("output_tokens", "sum"),
            total_cost_microusd=("cost_microusd", "sum"),
        )
        return out

    res = (
        called.map_batches(_partial, batch_format="pandas")
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_failed", alias_name="n_failed"),
            Sum("sum_input_tokens", alias_name="sum_input_tokens"),
            Sum("sum_output_tokens", alias_name="sum_output_tokens"),
            Sum("total_cost_microusd", alias_name="total_cost_microusd"),
        )
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    for c in res.columns[1:]:
        res[c] = res[c].astype("int64")
    return res


SAMPLE_FRACTIONS = {"en": 0.5, "de": 0.3, "es": 0.3, "fr": 0.2, "zh": 0.1}


def q43_stratified_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic per-language quota sample (multiplicative-hash
    ticket < per-lang threshold — exact same integer arithmetic as the
    SQL oracle)."""
    from ..stages.curation import stratified_sample

    ds = _t(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    kept = stratified_sample(ds, "lang", "doc_id", SAMPLE_FRACTIONS)
    return kept.to_pandas().sort_values("doc_id").reset_index(drop=True)


def q44_quality_filter(sf_dir: str) -> pd.DataFrame:
    """Top 25% of each language by (n_chars DESC, doc_id ASC) — exact
    per-group order statistics via the histogram-selection operator (no
    corpus sort; equals SQL row_number <= ceil(0.25*n))."""
    from ..stages.curation import quality_percentile_filter

    ds = _t(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    kept = quality_percentile_filter(ds, "lang", "n_chars", "doc_id", 0.25)
    return kept.to_pandas().sort_values("doc_id").reset_index(drop=True)


def q45_pack_sequences(sf_dir: str) -> pd.DataFrame:
    """Greedy char-budget sequence packing per language (budget 2000):
    (lang, doc_id, n_chars, seq_id, seq_pos) in doc_id order."""
    from ..stages.curation import pack_sequences

    ds = _t(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    packed = pack_sequences(ds, "lang", "doc_id", "n_chars", 2000)
    return (
        packed.to_pandas()
        .sort_values(["lang", "doc_id"])
        .reset_index(drop=True)[["lang", "doc_id", "n_chars", "seq_id", "seq_pos"]]
    )


def q46_span_dedup(sf_dir: str) -> pd.DataFrame:
    """Repeated 8-token-window drop spans, first occurrence wins
    (exact-substring dedup recipe); the engine groups by 64-bit rolling
    hash, the oracle by the literal window string — equality also
    cross-checks the no-collision assumption."""
    from ..stages.span_dedup import span_dedup

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    spans = span_dedup(ds, "text", "doc_id", w=8)
    return spans.sort_values(["doc_id", "span_start"]).reset_index(drop=True)


def q47_fixed_sample(sf_dir: str) -> pd.DataFrame:
    """Exactly 25 docs per language — the 25 smallest hash tickets
    (deterministic reservoir-free fixed-size sample), selected by the
    same distributed order-statistics machinery as q44."""
    from ..stages.curation import fixed_size_sample

    ds = _t(sf_dir, "documents", ["doc_id", "lang"])
    kept = fixed_size_sample(ds, "lang", "doc_id", 25)
    return kept.to_pandas().sort_values("doc_id").reset_index(drop=True)


def q48_top_tokens(sf_dir: str) -> pd.DataFrame:
    """Exact corpus-wide top-50 whitespace tokens (count DESC, token
    ASC) via per-batch partial counts + native Sum."""
    from ..stages.curation import top_tokens

    ds = _t(sf_dir, "documents", ["text"])
    out = top_tokens(ds, "text", 50).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.reset_index(drop=True)


def q49_repetition_filter(sf_dir: str) -> pd.DataFrame:
    """Gopher-style repetition gate: keep documents with duplicate-word
    fraction <= 0.55 AND top-bigram fraction <= 0.05 (pure vectorized
    map — no shuffle). Returns the kept docs with both signals."""
    from ..stages.filters import repetition_filter

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    kept = repetition_filter(
        ds, max_dup_word_frac=0.55, max_top_bigram_frac=0.05
    )
    return kept.to_pandas().sort_values("doc_id").reset_index(drop=True)


def q50_decontaminate(sf_dir: str) -> pd.DataFrame:
    """Test-set decontamination report: the 'benchmark' is every doc
    with doc_id % 25 == 0; a corpus doc is contaminated if it shares
    any 4-token window with the benchmark. Benchmark window hashes
    collect once (driver-sized by contract) and broadcast; the corpus
    side is a pure map. n_hits counts matching window positions."""
    from ..stages.filters import benchmark_window_hashes, contamination_report

    def _mod25(batch, want: bool):
        ids = batch["doc_id"].to_numpy()
        return batch.filter(pa.array((ids % 25 == 0) == want))

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    bench = ds.map_batches(lambda b: _mod25(b, True), batch_format="pyarrow")
    corpus = ds.map_batches(lambda b: _mod25(b, False), batch_format="pyarrow")
    hashes = benchmark_window_hashes(bench, w=4)
    rep = contamination_report(corpus, hashes, w=4)
    out = rep.to_pandas().sort_values("doc_id").reset_index(drop=True)
    out["n_hits"] = out["n_hits"].astype("int64")
    return out


def q51_kmeans_assign(sf_dir: str) -> pd.DataFrame:
    """Nearest-centroid assignment with the 8 vectors vec_id < 8 as
    fixed centroids (broadcast once; chunked vectorized distance per
    batch; ties break to the lowest cluster id)."""
    from ..stages.similarity import _as_matrix, kmeans_assign

    cdf = _small_pdf(sf_dir, "embeddings", ["vec_id", "embedding"])
    cdf = cdf[cdf["vec_id"] < 8].sort_values("vec_id")
    cents = _as_matrix(cdf["embedding"])
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = kmeans_assign(ds, cents).to_pandas()
    out["cluster"] = out["cluster"].astype("int64")
    return out.sort_values("vec_id").reset_index(drop=True)


def q52_tfidf_top_terms(sf_dir: str) -> pd.DataFrame:
    """Top TF-IDF term per document: a vocabulary-bounded document-
    frequency exchange (hash-bucket partials, like q48) broadcast once,
    then a pure per-batch lexsort rank. Ranking is by
    round(tf * ln(n/df), 9) DESC, token ASC on both sides; only the
    integer tf/df and the token string leave the batch."""
    from ..stages.filters import tfidf_top_terms

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    out = tfidf_top_terms(ds, k=1).to_pandas()
    out["tf"] = out["tf"].astype("int64")
    out["df"] = out["df"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q53_quantiles_nosort(sf_dir: str) -> pd.DataFrame:
    """Exact per-group discrete quantiles of l_extendedprice WITHOUT a
    corpus sort or whole-group collect (contrast q28, whose map_groups
    holds a full group per actor): native histogram aggregates +
    boundary-bucket-only collect, the 100-TB-shaped path. The returned
    values are exact data elements, so they compare bit-exactly."""
    from ..stages.curation import group_quantiles

    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])
    out = group_quantiles(
        ds, "l_returnflag", "l_extendedprice", [0.25, 0.5, 0.75, 0.99]
    )
    return out.sort_values("l_returnflag").reset_index(drop=True)


MIX_PROPORTIONS = {"en": 0.4, "de": 0.2, "es": 0.2, "fr": 0.1, "zh": 0.1}


def q54_source_mix(sf_dir: str) -> pd.DataFrame:
    """Deterministic dataset mixing to target language proportions
    (40/20/20/10/10), no upsampling: the binding language is kept
    whole, every other keeps its floor(p*n_target) smallest hash
    tickets. One skinny Count pass + broadcast cutoffs; the payload
    never shuffles."""
    from ..stages.curation import mix_to_proportions

    ds = _t(sf_dir, "documents", ["doc_id", "lang"])
    out = mix_to_proportions(ds, "lang", "doc_id", MIX_PROPORTIONS)
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def q55_curation_pipeline(sf_dir: str) -> pd.DataFrame:
    """End-to-end curation chain (repetition gate -> decontamination ->
    exact dedup -> source mix) over the documents table, benchmark =
    doc_id % 25 == 0, verified against ONE composed SQL oracle. Every
    stage is a pure map, duplicate-bounded exchange, or broadcast
    cutoff — the payload never crosses an all-to-all."""
    from ..pipelines.curation import curation_pipeline

    def _mod25(batch, want: bool):
        ids = batch["doc_id"].to_numpy()
        return batch.filter(pa.array((ids % 25 == 0) == want))

    ds = _t(sf_dir, "documents", ["doc_id", "lang", "text"])
    bench = ds.map_batches(lambda b: _mod25(b, True), batch_format="pyarrow")
    corpus = ds.map_batches(lambda b: _mod25(b, False), batch_format="pyarrow")
    out = curation_pipeline(
        corpus,
        bench,
        max_dup_word_frac=0.55,
        max_top_bigram_frac=0.08,
        window=4,
        proportions=MIX_PROPORTIONS,
    )
    return (
        out.to_pandas()[["doc_id", "lang"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


BM25_TERMS = ["merge", "spark", "vector"]


def q56_bm25_topk(sf_dir: str) -> pd.DataFrame:
    """Okapi BM25 top-10 for a fixed bag of query terms: one
    driver-tiny corpus-stats pass (per-block partials, no shuffle),
    then a pure scoring map with per-batch partial top-k under the
    exact global ordering (rounded score DESC, key ASC)."""
    from ..stages.retrieval import bm25_topk

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return bm25_topk(ds, BM25_TERMS, k=10).sort_values("doc_id").reset_index(
        drop=True
    )


def q57_chunk_documents(sf_dir: str) -> pd.DataFrame:
    """Overlapping 32-token windows every 24 tokens per document — the
    context-window chunking step before embedding/packing. Pure flat
    map; string assembly is the kernel."""
    from ..stages.curation import chunk_documents

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    out = chunk_documents(ds, window=32, stride=24).to_pandas()
    return out.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)


def q58_unigram_logprob(sf_dir: str) -> pd.DataFrame:
    """Per-document mean unigram log-probability (corpus-as-model LM
    quality proxy): vocabulary-bounded token-count exchange broadcast
    once, then a pure searchsorted scoring map."""
    from ..stages.filters import unigram_logprob

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    out = unigram_logprob(ds).to_pandas()
    out["n_tokens"] = out["n_tokens"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q59_semantic_dedup(sf_dir: str) -> pd.DataFrame:
    """SemDeDup survivors: nearest-centroid clustering (the 8 fixed
    vec_id < 8 centroids, q51's assignment contract), within-cluster
    cosine pairs >= 0.35, min-key representative per connected
    component. The oracle recomputes assignment + exact pairwise
    cosine + recursive-CTE components in SQL."""
    from ..stages.dedup import semantic_dedup
    from ..stages.similarity import _as_matrix

    cdf = _small_pdf(sf_dir, "embeddings", ["vec_id", "embedding"])
    cdf = cdf[cdf["vec_id"] < 8].sort_values("vec_id")
    cents = _as_matrix(cdf["embedding"])
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = semantic_dedup(ds, cents, threshold=0.35)
    return (
        out.select_columns(["vec_id"])
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )


def q60_logprob_quality_gate(sf_dir: str) -> pd.DataFrame:
    """Composition: per-language top-50% by unigram logprob — the
    CCNet-shaped 'keep the most LM-natural half of every language'
    gate. Chains the vocabulary-bounded logprob scorer into the
    histogram-selection percentile filter; neither stage shuffles the
    payload."""
    from ..stages.curation import quality_percentile_filter
    from ..stages.filters import unigram_logprob

    ds = _t(sf_dir, "documents", ["doc_id", "lang", "text"])
    scored = unigram_logprob(ds, extra_cols=("lang",))
    kept = quality_percentile_filter(scored, "lang", "logprob", "doc_id", 0.5)
    out = kept.to_pandas()
    out["n_tokens"] = out["n_tokens"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q61_profile_columns(sf_dir: str) -> pd.DataFrame:
    """One-pass numeric column profile (describe()-style) of four
    lineitem measures: per-block partials (len(columns) rows each) +
    a tiny per-column reduce. Sums use the q01 fixed-point cents
    contract; min/max are exact data elements."""
    from ..pipelines.metrics import profile_columns

    cols = ["l_discount", "l_extendedprice", "l_quantity", "l_tax"]
    ds = _t(sf_dir, "lineitem", cols)
    return profile_columns(ds, cols)


def q62_inverted_index(sf_dir: str) -> pd.DataFrame:
    """Segmented inverted index over the documents table: one row per
    (token, key-range segment) with the segment's document frequency
    and comma-joined sorted posting list. key_span=100 splits the
    sf0.01 corpus (doc_id 0..499) into 5 segments so the gate
    exercises real segmentation, not a single degenerate segment.
    Distinct (token, doc) pairs per batch -> one skew-free
    (token-hash x segment) bucket exchange -> vectorized per-bucket
    run-length reduce; no output cell or reduce task is corpus-bounded
    (a hot token's segments land in different bucket tasks)."""
    from ..stages.retrieval import build_postings

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    out = build_postings(ds, key_span=100).to_pandas()
    out["df_seg"] = out["df_seg"].astype("int64")
    return out.sort_values(["token", "seg_id"]).reset_index(drop=True)


def q63_redact_pii(sf_dir: str) -> pd.DataFrame:
    """PII redaction over documents whose text is deterministically
    augmented (on BOTH sides) with a doc_id-derived contact line —
    the synthetic corpus contains no PII, so the augmentation makes
    every row a real redaction case instead of a degenerate identity
    oracle. Engine and oracle apply identical RE2 replacements."""
    from ..stages.filters import redact_pii

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def _augment(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        aug = [
            f"{t or ''} reach user{i}@example.com at 192.168.{i % 256}.7 "
            f"or +14155550{i % 100}"
            for i, t in zip(ids, texts)
        ]
        return pa.table(
            {"doc_id": batch["doc_id"], "text": pa.array(aug, pa.string())}
        )

    out = redact_pii(
        ds.map_batches(_augment, batch_format="pyarrow")
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q64_price_histogram(sf_dir: str) -> pd.DataFrame:
    """20-bin fixed-range histogram of l_extendedprice per return
    flag: per-batch (group, bin) partial counts + one bounded native
    Sum groupby — the distribution complement of the q61 profile."""
    from ..pipelines.metrics import group_histogram

    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])
    return group_histogram(
        ds, "l_returnflag", "l_extendedprice", lo=900.0, hi=105000.0, n_bins=20
    )


def q65_bloom_semijoin(sf_dir: str) -> pd.DataFrame:
    """The standard Bloom join pattern at exact semantics: orders of
    BUILDING-segment customers via a broadcast Bloom PRE-filter (a few
    bits/key — the shape used when the key set is too big to ship
    exactly) followed by an exact verify of the pruned survivors.
    False positives are removed by the verify, so the result — and the
    SQL oracle — is an exact semi join; the Bloom stage only bounds
    how many rows ever reach it."""
    from ..functions.bloom import bloom_semi_join

    cust = _small_pdf(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    keys = cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"].to_numpy()
    orders = _t(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]
    )
    pruned = bloom_semi_join(orders, keys, "o_custkey", fpr=0.01)
    exact_ref = ray.put(pa.array(np.sort(keys)))

    def _verify(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["o_custkey"], value_set=ray.get(exact_ref)))

    out = pruned.map_batches(_verify, batch_format="pyarrow").to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


def q66_nb_classify(sf_dir: str) -> pd.DataFrame:
    """Distributed multinomial Naive Bayes, trained and scored over the
    documents table with ``lang`` as the label. The oracle recomputes
    the full model in SQL — per-(label, token) counts, add-1 smoothing
    over ``V + 1`` events, document log-priors — and the per-document
    posterior argmax (ties to the smaller label). Scores/margins are
    rounded to 6 decimals on BOTH sides (q56 rule; min margin at the
    gate scale is 7.6e-3, four orders above the boundary)."""
    from ..stages.classify import nb_classify, train_nb_classifier

    ds = _t(sf_dir, "documents", ["doc_id", "lang", "text"])
    model = train_nb_classifier(ds, label_col="lang")
    out = nb_classify(ds, model, decimals=6).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _boilerplate_aug(batch: pa.Table) -> pa.Table:
    """Deterministic multi-line augmentation shared by the q67 engine
    side and (re-derived) its SQL oracle — the q63 pattern: the
    synthetic corpus is single-line, so both sides wrap each document
    in a nav/extra/copyright frame. NAV/COPYRIGHT repeat across the
    whole domain (always boilerplate at min_docs=3); EXTRA repeats in
    2-3 documents per domain, straddling the threshold."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    texts = batch["text"].to_pylist()
    dom = [f"site{i % 7}" for i in ids]
    aug = [
        f"NAV site{i % 7}\n{t or ''}\nEXTRA e{(i // 7) % 25}\nCOPYRIGHT site{i % 7}"
        for i, t in zip(ids, texts)
    ]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "domain": pa.array(dom, pa.string()),
            "text": pa.array(aug, pa.string()),
        }
    )


def q67_strip_boilerplate(sf_dir: str) -> pd.DataFrame:
    """Within-domain line-DF boilerplate removal (nav/footer strip):
    plan the >= min_docs lines per domain with one skinny exchange,
    then broadcast the hot set and rebuild survivors. The oracle
    recomputes the line document frequencies and the rebuild in SQL."""
    from ..stages.boilerplate import boilerplate_lines, strip_boilerplate

    ds = _t(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _boilerplate_aug, batch_format="pyarrow"
    )
    hot = boilerplate_lines(ds, min_docs=3)
    out = strip_boilerplate(ds, hot).to_pandas()[["doc_id", "text"]]
    return out.sort_values("doc_id").reset_index(drop=True)


def q68_line_dedup(sf_dir: str) -> pd.DataFrame:
    """C4 exact-line dedup (Raffel et al. 2020 §2.2): first occurrence
    of every exact line wins corpus-wide, ordered by (doc_id,
    line_idx). Documents are augmented with shared FOOTER/QUOTE lines
    on both sides so the rule is exercised non-degenerately; duplicate
    body texts in the synthetic corpus dedup too."""
    from ..stages.span_dedup import apply_line_dedup, line_dedup

    def _aug(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        aug = [
            f"{t or ''}\nFOOTER f{i % 11}\nQUOTE q{i % 3}"
            for i, t in zip(ids, texts)
        ]
        return pa.table(
            {"doc_id": batch["doc_id"], "text": pa.array(aug, pa.string())}
        )

    ds = _t(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _aug, batch_format="pyarrow"
    )
    plan = line_dedup(ds, "text", "doc_id")
    out = apply_line_dedup(ds, plan, "text", "doc_id").to_pandas()[
        ["doc_id", "text"]
    ]
    return out.sort_values("doc_id").reset_index(drop=True)


_PAGERANK_ITERS = 5


def _q69_pagerank(sf_dir: str):
    """Shared engine run for q69/q70: PageRank over the bipartite
    (l_orderkey -> l_partkey) int-node graph — node ids pass through
    ``_edge_id_projection`` unhashed, so the SQL oracle can name them.
    Parts have no out-edges, exercising dangling redistribution."""
    from ..stages.graph import pagerank

    edges = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    return pagerank(
        edges,
        src_col="l_orderkey",
        dst_col="l_partkey",
        damping=0.85,
        n_iter=_PAGERANK_ITERS,
    )


def q69_pagerank_topk(sf_dir: str) -> pd.DataFrame:
    """Top-20 PageRank nodes. The oracle unrolls the identical power
    iteration (uniform teleport + dangling-mass redistribution) as
    chained SQL CTEs; ranks round to 9 decimals BEFORE the cut on both
    sides (q56 rule), ties break by node id."""
    pr = _q69_pagerank(sf_dir)
    out = pr.top_k(20)
    out["rank"] = out["rank"].round(9)
    return out.reset_index(drop=True)


def q70_pagerank_attach(sf_dir: str) -> pd.DataFrame:
    """Broadcast rank attach onto the orders table (never a shuffle
    join): orders absent from the graph score the 0.0 default."""
    pr = _q69_pagerank(sf_dir)
    orders = _t(sf_dir, "orders", ["o_orderkey"])
    out = pr.attach(orders, "o_orderkey").to_pandas()
    out["pagerank"] = out["pagerank"].round(9)
    return out.sort_values("o_orderkey").reset_index(drop=True)


def q71_temperature_mix(sf_dir: str) -> pd.DataFrame:
    """Temperature-based source mixing (XLM-R/mT5 alpha-sampling,
    alpha=0.5): target proportions p_g ∝ sqrt(n_g), binding group kept
    whole, every other group keeps its floor(p_g * n_target) smallest
    hash tickets. sqrt is IEEE-exact so the SQL recomputation of the
    quotas is bit-identical; all floor arguments sit >= 0.02 from an
    integer at the gate scale (verified)."""
    from ..stages.curation import temperature_mix

    ds = _t(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    out = temperature_mix(ds, "lang", "doc_id", alpha=0.5).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q72_bpe_encode(sf_dir: str) -> pd.DataFrame:
    """BPE train (200 merges, one histogram exchange + driver merge
    loop) + broadcast encode of every document. Training is greedy
    iterative (not SQL-expressible) — committed-golden oracle; the
    independent checks are the Sennrich-example pins and the
    greedy-encode==training-segmentation property tests."""
    from ..stages.bpe import bpe_encode, train_bpe

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    model = train_bpe(ds, n_merges=200)
    enc = bpe_encode(ds, model).to_pandas()

    ids = [
        ",".join(str(int(i)) for i in row) if row is not None else ""
        for row in enc["bpe_ids"]
    ]
    return (
        pd.DataFrame(
            {
                "doc_id": enc["doc_id"].to_numpy(np.int64),
                "n_ids": np.array([len(r) if r is not None else 0 for r in enc["bpe_ids"]], np.int64),
                "ids": ids,
            }
        )
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def q73_anchor_texts(sf_dir: str) -> pd.DataFrame:
    """Inbound anchor-text aggregation over a deterministic synthetic
    link graph (each doc links its site page to one of 15 hubs with a
    cyclic anchor label; 7 distinct anchors per hub > k=5, so the
    ticket cut bites). Anchor selection ranks blake2b src tickets —
    not SQL-derivable — so the oracle is a committed golden; the
    independent checks are the batch-split fuzz tests in
    tests/test_graph.py."""
    from ..stages.graph import anchor_texts

    def _edges(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        src = [f"https://site{i % 20}.com/p/{i}" for i in ids]
        dst = [f"https://hub{i % 15}.com/" for i in ids]
        anchor = [
            "" if i % 10 == 0 else f"anchor {i % 7}" for i in ids
        ]
        return pa.table(
            {
                "src": pa.array(src, pa.string()),
                "dst": pa.array(dst, pa.string()),
                "anchor": pa.array(anchor, pa.string()),
            }
        )

    edges = _t(sf_dir, "documents", ["doc_id"]).map_batches(
        _edges, batch_format="pyarrow"
    )
    out = anchor_texts(edges, k=5).to_pandas()
    out["n_inlinks"] = out["n_inlinks"].astype("int64")
    return out.sort_values("dst").reset_index(drop=True)


def q74_url_filter(sf_dir: str) -> pd.DataFrame:
    """Crawl-policy URL gate: registrable-domain allow/deny lists plus
    an RE2 pattern block over the canonicalized url. URLs are
    synthesized deterministically (mixed-case host, default port,
    tracking param, unsorted query, fragment, trailing slash) so the
    oracle can re-derive the canonical form structurally and apply the
    same policy in SQL — an independent recomputation, not a pin."""
    from ..functions.urltools import url_filter

    def _with_url(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        urls = [
            f"https://WWW.Site{i % 20}.com:443/p/{i}/?b=2&utm_source=tw&a=1#frag"
            for i in ids
        ]
        return pa.table(
            {"doc_id": batch["doc_id"], "url": pa.array(urls, pa.string())}
        )

    ds = _t(sf_dir, "documents", ["doc_id"]).map_batches(
        _with_url, batch_format="pyarrow"
    )
    out = url_filter(
        ds,
        allow_domains=[f"site{k}.com" for k in range(10)],
        block_domains=["site3.com"],
        block_url_patterns=[r"/p/\d*7\?"],
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q75_charset_sniff(sf_dir: str) -> pd.DataFrame:
    """Charset sniff + transcode roundtrip: each document's text is
    encoded into one of six byte encodings (chosen by ``doc_id % 6``)
    inside an HTML wrapper carrying the matching declaration (meta,
    http-equiv, XML declaration, BOM, or nothing); the engine sniffs
    the encoding (WHATWG order) and must recover the original text
    byte-exactly. The oracle re-derives the expected encoding/source
    from ``doc_id % 6`` and the expected text from the table itself —
    a genuine independent check (documents text is pure ASCII at every
    scale factor, so all six codecs roundtrip losslessly)."""
    import codecs as _codecs

    from ..stages.transcode import transcode_to_utf8

    def _encode_pages(batch: pa.Table) -> pa.Table:
        payloads = []
        for i, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            body = f"<p>{text}</p>".encode("ascii")
            k = i % 6
            if k == 0:  # undeclared, valid utf-8
                payloads.append(body)
            elif k == 1:
                payloads.append(
                    b'<meta charset="windows-1252">' + body
                )
            elif k == 2:
                payloads.append(
                    b'<meta http-equiv="Content-Type" content="text/html;'
                    b' charset=Shift_JIS">' + body
                )
            elif k == 3:
                payloads.append(
                    _codecs.BOM_UTF16_LE
                    + body.decode("ascii").encode("utf-16-le")
                )
            elif k == 4:
                payloads.append(
                    b'<?xml version="1.0" encoding="ISO-8859-2"?>' + body
                )
            else:
                payloads.append(b"<meta charset=GB2312>" + body)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "html": pa.array(payloads, pa.large_binary()),
            }
        )

    def _recover(batch: pa.Table) -> pa.Table:
        texts = [
            v.decode("utf-8").split("<p>", 1)[1].rsplit("</p>", 1)[0]
            for v in batch["html"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "encoding": batch["encoding"],
                "encoding_source": batch["encoding_source"],
                "text": pa.array(texts, pa.string()),
            }
        )

    ds = _t(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _encode_pages, batch_format="pyarrow"
    )
    out = transcode_to_utf8(ds).map_batches(_recover, batch_format="pyarrow")
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def q76_blockword_audit(sf_dir: str) -> pd.DataFrame:
    """C4 banned-word rule in audit mode: per-document blocklist hit
    counts (whole-token, lowercased) over every document, plus the kept
    flag the filter form would apply at max_hits=0. The oracle
    recomputes hits with DuckDB list kernels over the same
    whitespace tokenization."""
    from ..stages.filters import blockword_filter

    out = blockword_filter(
        _t(sf_dir, "documents", ["doc_id", "text"]),
        ["merge", "join", "scan"],
        count_col="block_hits",
    ).to_pandas()
    out["kept"] = out["block_hits"] == 0
    return (
        out[["doc_id", "block_hits", "kept"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def q77_crawl_delta(sf_dir: str) -> pd.DataFrame:
    """Two-snapshot crawl delta: the old snapshot is every document,
    the new one drops ``doc_id % 10 == 0`` (-> removed), rewrites the
    body of ``doc_id % 7 == 0`` survivors (-> modified), and adds a
    ``/new/`` url per ``doc_id % 13 == 0`` (-> added). The oracle
    rebuilds both snapshots in SQL and classifies with a genuine FULL
    OUTER JOIN — an independent recomputation (DuckDB md5 == hashlib
    md5)."""
    import hashlib

    from ..stages.delta import crawl_delta

    def _old(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table(
            {
                "url": pa.array(
                    [f"https://ex.com/{i}" for i in ids], pa.string()
                ),
                "content_hash": pa.array(
                    [
                        hashlib.md5(t.encode()).hexdigest()
                        for t in batch["text"].to_pylist()
                    ],
                    pa.string(),
                ),
            }
        )

    def _new(batch: pa.Table) -> pa.Table:
        urls, hashes = [], []
        for i, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            if i % 10 != 0:
                urls.append(f"https://ex.com/{i}")
                body = t + ("-v2" if i % 7 == 0 else "")
                hashes.append(hashlib.md5(body.encode()).hexdigest())
            if i % 13 == 0:
                urls.append(f"https://ex.com/new/{i}")
                hashes.append(hashlib.md5(f"fresh-{i}".encode()).hexdigest())
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "content_hash": pa.array(hashes, pa.string()),
            }
        )

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    out = crawl_delta(
        docs.map_batches(_old, batch_format="pyarrow"),
        docs.map_batches(_new, batch_format="pyarrow"),
        num_partitions=8,
    ).to_pandas()
    return out.sort_values("url").reset_index(drop=True)


def _pagerank_sql_prefix(n_iter: int = _PAGERANK_ITERS, d: float = 0.85) -> str:
    """Unrolled power-iteration CTE chain ending in ``r{n_iter}`` —
    recursive CTEs cannot both aggregate contributions and read the
    dangling mass from one recursive reference, so the fixed iteration
    count is unrolled instead (exactly what the engine runs)."""
    head = """
WITH edges AS (
    SELECT l_orderkey AS s, l_partkey AS t FROM lineitem
), nodes AS (
    SELECT DISTINCT s AS id FROM edges UNION SELECT DISTINCT t FROM edges
), meta AS (
    SELECT count(*)::DOUBLE AS n FROM nodes
), deg AS (
    SELECT n.id, coalesce(e.c, 0)::DOUBLE AS outdeg
    FROM nodes n
    LEFT JOIN (SELECT s, count(*) AS c FROM edges GROUP BY s) e ON e.s = n.id
), r0 AS (
    SELECT id, 1.0 / (SELECT n FROM meta) AS r FROM nodes
)"""
    parts = [head]
    for i in range(1, n_iter + 1):
        p = i - 1
        parts.append(f""", c{i} AS (
    SELECT e.t AS id, sum(r.r / dg.outdeg) AS c
    FROM edges e JOIN r{p} r ON r.id = e.s JOIN deg dg ON dg.id = e.s
    GROUP BY e.t
), dang{i} AS (
    SELECT coalesce(sum(r.r), 0) AS dm
    FROM r{p} r JOIN deg dg ON dg.id = r.id WHERE dg.outdeg = 0
), r{i} AS (
    SELECT n.id,
           (1 - {d}) / m.n + {d} * (coalesce(c.c, 0) + (SELECT dm FROM dang{i}) / m.n) AS r
    FROM nodes n CROSS JOIN meta m LEFT JOIN c{i} c ON c.id = n.id
)""")
    return "".join(parts)


def q78_bigram_logprob(sf_dir: str) -> pd.DataFrame:
    """Per-document mean INTERPOLATED bigram log-probability (the
    CCNet-fidelity upgrade of q58: ln(0.9*c(w1,w2)/c(w1) +
    0.1*c(w2)/N) averaged over each doc's bigram positions, bigram
    counts pruned below 2). The oracle recomputes it in SQL with a
    positional self-join over unnested tokens."""
    from ..stages.filters import bigram_logprob

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    out = bigram_logprob(ds, lam=0.9, min_count=2).to_pandas()
    out["n_bigrams"] = out["n_bigrams"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Registry + oracle SQL
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[str], Any]] = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_high_qty_items": q02_high_qty_items,
    "q03_segment_revenue": q03_segment_revenue,
    "q04_region_customers": q04_region_customers,
    "q05_top_orders": q05_top_orders,
    "q06_distinct_flags": q06_distinct_flags,
    "q07_event_type_stats": q07_event_type_stats,
    "q08_hourly_events": q08_hourly_events,
    "q09_union_extremes": q09_union_extremes,
    "q10_customers_without_orders": q10_customers_without_orders,
    "q11_parts_in_lineitem": q11_parts_in_lineitem,
    "q12_nation_sort": q12_nation_sort,
    "q13_doc_stats_by_lang": q13_doc_stats_by_lang,
    "q14_token_counts": q14_token_counts,
    "q15_dedup_docs": q15_dedup_docs,
    "q16_doc_fingerprints": q16_doc_fingerprints,
    "q17_langid": q17_langid,
    "q18_quality_scores": q18_quality_scores,
    "q19_minhash_dedup": q19_minhash_dedup,
    "q20_simhash": q20_simhash,
    "q21_ngram_dedup": q21_ngram_dedup,
    "q22_knn": q22_knn,
    "q23_embedding_dedup": q23_embedding_dedup,
    "q24_user_sessions": q24_user_sessions,
    "q25_asof_join": q25_asof_join,
    "q26_extract_pages": q26_extract_pages,
    "q27_top_orders_per_segment": q27_top_orders_per_segment,
    "q28_price_quantiles": q28_price_quantiles,
    "q29_nation_revenue": q29_nation_revenue,
    "q30_top_event_per_type": q30_top_event_per_type,
    "q31_ivf_knn": q31_ivf_knn,
    "q32_simhash_dedup": q32_simhash_dedup,
    "q33_media_decode": q33_media_decode,
    "q34_cleaning_pairs": q34_cleaning_pairs,
    "q35_augmented_docs": q35_augmented_docs,
    "q36_training_view": q36_training_view,
    "q37_frameref_roundtrip": q37_frameref_roundtrip,
    "q38_native_hash_join": q38_native_hash_join,
    "q39_user_event_seq": q39_user_event_seq,
    "q40_hopping_windows": q40_hopping_windows,
    "q41_hll_distinct_users": q41_hll_distinct_users,
    "q42_model_call_costs": q42_model_call_costs,
    "q43_stratified_sample": q43_stratified_sample,
    "q44_quality_filter": q44_quality_filter,
    "q45_pack_sequences": q45_pack_sequences,
    "q46_span_dedup": q46_span_dedup,
    "q47_fixed_sample": q47_fixed_sample,
    "q48_top_tokens": q48_top_tokens,
    "q49_repetition_filter": q49_repetition_filter,
    "q50_decontaminate": q50_decontaminate,
    "q51_kmeans_assign": q51_kmeans_assign,
    "q52_tfidf_top_terms": q52_tfidf_top_terms,
    "q53_quantiles_nosort": q53_quantiles_nosort,
    "q54_source_mix": q54_source_mix,
    "q55_curation_pipeline": q55_curation_pipeline,
    "q56_bm25_topk": q56_bm25_topk,
    "q57_chunk_documents": q57_chunk_documents,
    "q58_unigram_logprob": q58_unigram_logprob,
    "q59_semantic_dedup": q59_semantic_dedup,
    "q60_logprob_quality_gate": q60_logprob_quality_gate,
    "q61_profile_columns": q61_profile_columns,
    "q62_inverted_index": q62_inverted_index,
    "q63_redact_pii": q63_redact_pii,
    "q64_price_histogram": q64_price_histogram,
    "q65_bloom_semijoin": q65_bloom_semijoin,
    "q66_nb_classify": q66_nb_classify,
    "q67_strip_boilerplate": q67_strip_boilerplate,
    "q68_line_dedup": q68_line_dedup,
    "q69_pagerank_topk": q69_pagerank_topk,
    "q70_pagerank_attach": q70_pagerank_attach,
    "q71_temperature_mix": q71_temperature_mix,
    "q72_bpe_encode": q72_bpe_encode,
    "q73_anchor_texts": q73_anchor_texts,
    "q74_url_filter": q74_url_filter,
    "q75_charset_sniff": q75_charset_sniff,
    "q76_blockword_audit": q76_blockword_audit,
    "q77_crawl_delta": q77_crawl_delta,
    "q78_bigram_logprob": q78_bigram_logprob,
}

ORACLE_SQL: dict[str, str] = {
    # Money/quantity sums are fixed-point cents: CAST(floor(x*100+0.5) AS
    # BIGINT) summed exactly — identical to the engine's int64 sums at
    # any parallelism (no float-summation-order rounding boundary).
    "q01_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)      AS sum_qty,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_price,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT)
                                                                       AS sum_disc_price,
               (sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) / count(*)) / 100.0
                                                                       AS avg_qty,
               count(*)                                                AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q02_high_qty_items": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem WHERE l_quantity > 45
    """,
    "q03_segment_revenue": """
        SELECT c_mktsegment,
               count(*)                                                AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "q04_region_customers": """
        SELECT r_name, count(*) AS n_customers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
    """,
    "q05_top_orders": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    "q06_distinct_flags": """
        SELECT DISTINCT l_returnflag, l_linestatus
        FROM lineitem ORDER BY l_returnflag, l_linestatus
    """,
    "q07_event_type_stats": """
        SELECT event_type,
               count(*)                                          AS n_events,
               count(DISTINCT user_id)                           AS n_users,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "q08_hourly_events": """
        SELECT event_type,
               CAST(epoch(date_trunc('hour', ts)) AS BIGINT)     AS hour_epoch,
               count(*)                                          AS n_events,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "q09_union_extremes": """
        SELECT event_type, count(*) AS n_extreme
        FROM (
            SELECT event_type FROM events WHERE value > 90
            UNION ALL
            SELECT event_type FROM events WHERE value < 10
        ) GROUP BY event_type ORDER BY event_type
    """,
    "q10_customers_without_orders": """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN (
            SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        )
        ORDER BY c_custkey
    """,
    "q11_parts_in_lineitem": """
        SELECT p_partkey, p_name FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
        ORDER BY p_partkey
    """,
    "q12_nation_sort": """
        SELECT n_nationkey, n_name, n_regionkey
        FROM nation ORDER BY n_regionkey DESC, n_name ASC
    """,
    "q13_doc_stats_by_lang": """
        SELECT lang,
               count(*)                                 AS n_docs,
               CAST(sum(length(text)) AS BIGINT)        AS sum_chars,
               sum(length(text)) / count(*)             AS avg_chars
        FROM documents GROUP BY lang ORDER BY lang
    """,
    "q14_token_counts": """
        SELECT lang,
               CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
               max(n_tok) AS max_tokens,
               min(n_tok) AS min_tokens
        FROM (
            SELECT lang,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                   END AS n_tok
            FROM documents
        ) GROUP BY lang ORDER BY lang
    """,
    "q15_dedup_docs": """
        SELECT min(doc_id) AS doc_id FROM documents
        GROUP BY md5(text) ORDER BY doc_id
    """,
    "q22_knn": """
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS qv
            FROM embeddings WHERE vec_id IN (0, 1, 2)
        ), s AS (
            SELECT q.query_id, e.vec_id,
                   round(list_cosine_similarity(e.embedding, q.qv), 9) AS cosine
            FROM embeddings e CROSS JOIN q
        ), r AS (
            SELECT query_id, vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
                   ) AS rank
            FROM s
        )
        SELECT query_id, vec_id, rank FROM r WHERE rank <= 5
        ORDER BY query_id, rank
    """,
    "q24_user_sessions": """
        WITH o AS (
            SELECT user_id, ts,
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
            FROM events
        )
        SELECT user_id,
               CAST(sum(CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
        FROM o GROUP BY user_id ORDER BY user_id
    """,
    "q25_asof_join": """
        WITH od AS (
            SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
            FROM orders GROUP BY o_custkey, o_orderdate
        )
        SELECT e.event_id, o.o_orderkey
        FROM events e ASOF JOIN od o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        ORDER BY e.event_id
    """,
    "q27_top_orders_per_segment": """
        SELECT c_mktsegment, o_orderkey, o_totalprice, rank FROM (
            SELECT c_mktsegment, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY o_totalprice DESC, o_orderkey ASC
                   ) AS rank
            FROM orders JOIN customer ON o_custkey = c_custkey
        ) WHERE rank <= 3
        ORDER BY c_mktsegment, rank
    """,
    "q28_price_quantiles": """
        SELECT o_orderpriority,
               CAST(quantile_disc(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), 0.5)
                    AS BIGINT)                                          AS median_price,
               CAST(quantile_disc(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), 0.9)
                    AS BIGINT)                                          AS p90_price,
               count(*)                                                 AS n_orders
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "q29_nation_revenue": """
        SELECT n_name,
               count(*) AS n_items,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                             AS BIGINT)) AS BIGINT) AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name
    """,
    "q38_native_hash_join": """
        SELECT o_orderkey, c_name
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_totalprice > 400000
        ORDER BY o_orderkey
    """,
    "q39_user_event_seq": """
        SELECT CAST(event_id AS BIGINT) AS event_id,
               CAST(user_id AS BIGINT)  AS user_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS BIGINT) AS seq
        FROM events ORDER BY event_id
    """,
    "q40_hopping_windows": """
        WITH w AS (
            SELECT event_type,
                   (CAST(floor(epoch(ts)) AS BIGINT) // 1800) * 1800 AS window_start
            FROM events
            UNION ALL
            SELECT event_type,
                   (CAST(floor(epoch(ts)) AS BIGINT) // 1800) * 1800 - 1800 AS window_start
            FROM events
            WHERE (CAST(floor(epoch(ts)) AS BIGINT) // 1800) * 1800 - 1800 >= 0
        )
        SELECT event_type, window_start, count(*) AS n_events
        FROM w GROUP BY event_type, window_start
        ORDER BY event_type, window_start
    """,
    "q30_top_event_per_type": """
        WITH v AS (
            SELECT event_type, event_id,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
            FROM events
        ), m AS (
            SELECT event_type, max(vc) AS max_value FROM v GROUP BY event_type
        )
        SELECT v.event_type, m.max_value,
               CAST(min(v.event_id) AS BIGINT) AS event_id
        FROM v JOIN m ON v.event_type = m.event_type AND v.vc = m.max_value
        GROUP BY v.event_type, m.max_value
        ORDER BY v.event_type
    """,
    # q21: the engine's whole near-dedup semantics in pure SQL — word
    # 3-grams (python str.split() replica), exact pairwise Jaccard,
    # edges at >= 0.8, connected components via recursive min-label
    # reachability (only labels smaller than the destination propagate —
    # the component min always survives the prune), keep min doc_id.
    # The engine's LSH candidate pass has P(miss) ~ 5e-8 per true pair
    # at j=0.8 (128 perms / 32 bands), so the exact SQL and the LSH
    # result agree on any realistic corpus — verified identical here.
    "q21_ngram_dedup": r"""
        WITH RECURSIVE toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(coalesce(text, ''), '\s+'),
                               x -> x <> '') AS ws
            FROM documents
        ),
        grams AS (
            SELECT doc_id,
                   CASE WHEN len(ws) = 0 THEN []
                        WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                        ELSE list_distinct([array_to_string(ws[i:i+2], ' ')
                                            for i in range(1, len(ws) - 1)])
                   END AS gs
            FROM toks
        ),
        pairs AS (
            SELECT a.doc_id AS a, b.doc_id AS b,
                   CASE WHEN len(a.gs) = 0 AND len(b.gs) = 0 THEN 1.0
                        WHEN len(a.gs) = 0 OR len(b.gs) = 0 THEN 0.0
                        ELSE len(list_intersect(a.gs, b.gs))::DOUBLE /
                             (len(a.gs) + len(b.gs) - len(list_intersect(a.gs, b.gs)))
                   END AS j
            FROM grams a JOIN grams b ON a.doc_id < b.doc_id
        ),
        edges AS (
            SELECT a AS src, b AS dst FROM pairs WHERE j >= 0.8
            UNION ALL
            SELECT b, a FROM pairs WHERE j >= 0.8
        ),
        reach AS (
            SELECT doc_id AS node, doc_id AS label FROM documents
            UNION
            SELECT e.dst, r.label FROM reach r
            JOIN edges e ON e.src = r.node WHERE r.label < e.dst
        )
        SELECT node AS doc_id FROM reach
        GROUP BY node HAVING node = min(label) ORDER BY doc_id
    """,
    # q23: exact cosine near-dup in SQL (same recursive-components
    # shape). The engine's hyperplane-LSH path only *verifies* true
    # cosine within buckets (no false positives), so exact SQL ⊇
    # engine; equality additionally certifies full recall on this input.
    "q23_embedding_dedup": """
        WITH RECURSIVE pairs AS (
            SELECT a.vec_id AS a, b.vec_id AS b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95
        ),
        edges AS (
            SELECT a AS src, b AS dst FROM pairs
            UNION ALL
            SELECT b, a FROM pairs
        ),
        reach AS (
            SELECT vec_id AS node, vec_id AS label FROM embeddings
            UNION
            SELECT e.dst, r.label FROM reach r
            JOIN edges e ON e.src = r.node WHERE r.label < e.dst
        )
        SELECT node AS vec_id FROM reach
        GROUP BY node HAVING node = min(label) ORDER BY vec_id
    """,
    # q31: the IVF path is *approximate* by design, but achieves full
    # recall on this input with nprobe=4 of 8 centroids (verified) —
    # the exact-KNN oracle therefore both checks the plumbing and
    # documents the recall contract.
    "q31_ivf_knn": """
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS qv
            FROM embeddings WHERE vec_id IN (0, 1, 2)
        ), s AS (
            SELECT q.query_id, e.vec_id,
                   round(list_cosine_similarity(e.embedding, q.qv), 9) AS cosine
            FROM embeddings e CROSS JOIN q
        ), r AS (
            SELECT query_id, vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
                   ) AS rank
            FROM s
        )
        SELECT query_id, vec_id, rank FROM r WHERE rank <= 5
        ORDER BY query_id, rank
    """,
    # q37: a correct F:i roundtrip means decoded == original text, so
    # the decoded hash IS md5(text) — fully SQL-expressible.
    "q37_frameref_roundtrip": """
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               TRUE AS roundtrip_ok,
               md5(coalesce(text, '')) AS decoded_hash
        FROM documents ORDER BY doc_id
    """,
    # q42: the fake model is response = 'CLEANED: ' || text with
    # whitespace token counts; prompt = 6 tokens; micro-USD = tokens ×
    # (USD per M tokens) with binary-exact rates, tier chosen on input
    # tokens <= 200 — every column reproduces exactly in SQL.
    "q42_model_call_costs": r"""
        WITH t AS (
            SELECT lang,
                   CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+'))
                   END AS ntok
            FROM documents
        ), c AS (
            SELECT lang, 6 + ntok AS tin, 1 + ntok AS tout FROM t
        ), p AS (
            SELECT lang, tin, tout,
                   CAST(floor(tin * CASE WHEN tin <= 200 THEN 1.25 ELSE 2.5 END
                            + tout * CASE WHEN tin <= 200 THEN 5.0 ELSE 10.0 END
                            + 0.5) AS BIGINT) AS cost
            FROM c
        )
        SELECT lang,
               count(*) AS n_docs,
               CAST(0 AS BIGINT) AS n_failed,
               CAST(sum(tin) AS BIGINT) AS sum_input_tokens,
               CAST(sum(tout) AS BIGINT) AS sum_output_tokens,
               CAST(sum(cost) AS BIGINT) AS total_cost_microusd
        FROM p GROUP BY lang ORDER BY lang
    """,
    # thresholds are floor(fraction * 2^32) — the exact integers the
    # engine computes (stages/curation.py KNUTH_32 ticket)
    "q43_stratified_sample": """
        SELECT doc_id, lang, n_chars FROM documents
        WHERE (doc_id * 2654435761) % 4294967296 <
              CASE lang
                  WHEN 'en' THEN 2147483648
                  WHEN 'de' THEN 1288490188
                  WHEN 'es' THEN 1288490188
                  WHEN 'fr' THEN 858993459
                  WHEN 'zh' THEN 429496729
                  ELSE 0
              END
        ORDER BY doc_id
    """,
    "q44_quality_filter": """
        SELECT doc_id, lang, n_chars FROM (
            SELECT doc_id, lang, n_chars,
                   row_number() OVER (
                       PARTITION BY lang ORDER BY n_chars DESC, doc_id
                   ) AS rn,
                   count(*) OVER (PARTITION BY lang) AS n
            FROM documents
        ) WHERE rn <= ceil(0.25 * n)
        ORDER BY doc_id
    """,
    "q45_pack_sequences": """
        WITH RECURSIVE ordered AS (
            SELECT lang, doc_id, n_chars,
                   row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
            FROM documents
        ), pack AS (
            SELECT lang, doc_id, n_chars, rn,
                   CAST(0 AS BIGINT) AS seq_id, CAST(0 AS BIGINT) AS seq_pos,
                   n_chars AS acc
            FROM ordered WHERE rn = 1
            UNION ALL
            SELECT o.lang, o.doc_id, o.n_chars, o.rn,
                   CASE WHEN p.acc + o.n_chars <= 2000
                        THEN p.seq_id ELSE p.seq_id + 1 END,
                   CASE WHEN p.acc + o.n_chars <= 2000
                        THEN p.seq_pos + 1 ELSE CAST(0 AS BIGINT) END,
                   CASE WHEN p.acc + o.n_chars <= 2000
                        THEN p.acc + o.n_chars ELSE o.n_chars END
            FROM ordered o JOIN pack p ON o.lang = p.lang AND o.rn = p.rn + 1
        )
        SELECT lang, doc_id, n_chars, seq_id, seq_pos
        FROM pack ORDER BY lang, doc_id
    """,
    # the engine groups windows by 64-bit rolling hash; this oracle
    # groups by the literal window string — agreement also certifies
    # the no-collision assumption at gate scale. 4194304 = 2^22 =
    # stages/span_dedup.py POS_MOD
    "q46_span_dedup": r"""
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
            FROM documents WHERE trim(coalesce(text, '')) <> ''
        ), positions AS (
            SELECT doc_id, t, unnest(range(len(t) - 7)) AS pos
            FROM toks WHERE len(t) >= 8
        ), wins AS (
            SELECT doc_id, pos,
                   array_to_string(t[pos + 1 : pos + 8], ' ') AS win
            FROM positions
        ), firsts AS (
            SELECT win, min(doc_id * 4194304 + pos) AS first_packed
            FROM wins GROUP BY win
        ), losers AS (
            SELECT w.doc_id, w.pos
            FROM wins w JOIN firsts f USING (win)
            WHERE w.doc_id * 4194304 + w.pos <> f.first_packed
        ), marked AS (
            SELECT doc_id, pos AS s, pos + 8 AS e,
                   CASE WHEN pos > coalesce(max(pos + 8) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), -1) THEN 1 ELSE 0 END AS new_isl
            FROM losers
        ), islands AS (
            SELECT doc_id, s, e,
                   sum(new_isl) OVER (
                       PARTITION BY doc_id ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS isl
            FROM marked
        )
        SELECT doc_id, min(s) AS span_start, max(e) AS span_end
        FROM islands GROUP BY doc_id, isl
        ORDER BY doc_id, span_start
    """,
    "q47_fixed_sample": """
        SELECT doc_id, lang FROM (
            SELECT doc_id, lang,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY (doc_id * 2654435761) % 4294967296, doc_id
                   ) AS rn
            FROM documents
        ) WHERE rn <= 25
        ORDER BY doc_id
    """,
    "q48_top_tokens": r"""
        SELECT token, count(*) AS n FROM (
            SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
            FROM documents WHERE trim(coalesce(text, '')) <> ''
        )
        GROUP BY token
        ORDER BY n DESC, token ASC
        LIMIT 50
    """,
    # Repetition signals are plain double arithmetic computed by the
    # same IEEE operations on both sides: dup = 1 - distinct/total,
    # topbi = max_count/total_bigrams (one division each).
    "q49_repetition_filter": r"""
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
            FROM documents WHERE trim(coalesce(text, '')) <> ''
        ), stats AS (
            SELECT doc_id,
                   1 - (len(list_distinct(t))::DOUBLE / len(t)) AS dup_word_frac
            FROM toks
        ), bi AS (
            SELECT doc_id,
                   unnest([t[i + 1] || ' ' || t[i + 2] for i in range(len(t) - 1)]) AS bg
            FROM toks WHERE len(t) >= 2
        ), bistats AS (
            SELECT doc_id, max(c)::DOUBLE / sum(c) AS top_bigram_frac
            FROM (SELECT doc_id, bg, count(*) AS c FROM bi GROUP BY 1, 2)
            GROUP BY doc_id
        )
        SELECT s.doc_id, s.dup_word_frac, b.top_bigram_frac
        FROM stats s JOIN bistats b USING (doc_id)
        WHERE s.dup_word_frac <= 0.55 AND b.top_bigram_frac <= 0.05
        ORDER BY doc_id
    """,
    # The engine matches 4-token windows by 64-bit rolling hash; the
    # oracle joins the literal window STRINGS, so the gate also
    # certifies the no-collision assumption at its scale (q46 pattern).
    "q50_decontaminate": r"""
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
            FROM documents WHERE trim(coalesce(text, '')) <> ''
        ), wins AS (
            SELECT doc_id, array_to_string(t[pos + 1 : pos + 4], ' ') AS win
            FROM (
                SELECT doc_id, t, unnest(range(len(t) - 3)) AS pos
                FROM toks WHERE len(t) >= 4
            )
        ), bench AS (
            SELECT DISTINCT win FROM wins WHERE doc_id % 25 = 0
        )
        SELECT w.doc_id, count(*)::BIGINT AS n_hits
        FROM wins w JOIN bench b USING (win)
        WHERE w.doc_id % 25 <> 0
        GROUP BY w.doc_id
        ORDER BY w.doc_id
    """,
    # Distances on both sides are double-precision Euclidean rounded to
    # 9 decimals before ranking (q22 precedent), ties to lowest cid;
    # only integer columns cross the hash.
    "q51_kmeans_assign": """
        WITH c AS (
            SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
            FROM embeddings WHERE vec_id < 8
        ), d AS (
            SELECT e.vec_id, c.cid,
                   round(list_distance(e.embedding::DOUBLE[], c.cv), 9) AS dist
            FROM embeddings e CROSS JOIN c
        ), r AS (
            SELECT vec_id, cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY vec_id ORDER BY dist, cid
                   ) AS rn
            FROM d
        )
        SELECT vec_id, cid AS cluster FROM r WHERE rn = 1
        ORDER BY vec_id
    """,
    # Both sides rank by round(tf * ln(n/df), 9) DESC then token ASC;
    # the rounded score keeps a last-ulp libm ln() difference from
    # flipping an ordering, and the score itself is not an output.
    "q52_tfidf_top_terms": r"""
        WITH toks AS (
            SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
            FROM documents WHERE trim(coalesce(text, '')) <> ''
        ), tf AS (
            SELECT doc_id, tok, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
        ), df AS (
            SELECT tok, count(DISTINCT doc_id)::BIGINT AS df FROM toks GROUP BY 1
        ), n AS (
            SELECT count(DISTINCT doc_id)::DOUBLE AS n FROM toks
        ), s AS (
            SELECT t.doc_id, t.tok, t.tf, d.df,
                   round(t.tf * ln(n.n / d.df), 9) AS score
            FROM tf t JOIN df d USING (tok) CROSS JOIN n
        ), r AS (
            SELECT doc_id, tok, tf, df,
                   ROW_NUMBER() OVER (
                       PARTITION BY doc_id ORDER BY score DESC, tok ASC
                   ) AS rn
            FROM s
        )
        SELECT doc_id, tok AS token, tf, df FROM r WHERE rn = 1
        ORDER BY doc_id
    """,
    # quantile_disc = the value at 1-indexed position ceil(q*n) of the
    # ascending order — an exact data element, bit-equal on both sides.
    "q53_quantiles_nosort": """
        SELECT l_returnflag,
               quantile_disc(l_extendedprice, 0.25) AS "q0.25",
               quantile_disc(l_extendedprice, 0.5)  AS "q0.5",
               quantile_disc(l_extendedprice, 0.75) AS "q0.75",
               quantile_disc(l_extendedprice, 0.99) AS "q0.99"
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    # n_target = min over groups of floor(n_g / p_g) (binding group
    # kept whole, no upsampling); each group keeps its floor(p*n_target)
    # smallest tickets — the q43/q47 ticket formula, SQL-exact integers.
    "q54_source_mix": """
        WITH c AS (
            SELECT lang, count(*) AS n FROM documents GROUP BY lang
        ), p AS (
            SELECT * FROM (VALUES
                ('en', 0.4), ('de', 0.2), ('es', 0.2),
                ('fr', 0.1), ('zh', 0.1)
            ) t(lang, p)
        ), tgt AS (
            SELECT min(CAST(floor(c.n / p.p::DOUBLE) AS BIGINT)) AS nt
            FROM c JOIN p USING (lang)
        ), k AS (
            SELECT p.lang, CAST(floor(p.p::DOUBLE * tgt.nt) AS BIGINT) AS k
            FROM p CROSS JOIN tgt
        ), t AS (
            SELECT doc_id, lang,
                   (doc_id * 2654435761) % 4294967296 AS ticket
            FROM documents
        )
        SELECT doc_id, lang FROM (
            SELECT t.doc_id, t.lang, k.k,
                   row_number() OVER (
                       PARTITION BY t.lang ORDER BY t.ticket, t.doc_id
                   ) AS rn
            FROM t JOIN k USING (lang)
        ) q WHERE rn <= k
        ORDER BY doc_id
    """,
    # One composed oracle for the whole curation chain: gate ->
    # decontaminate (literal window strings) -> md5 min-key dedup ->
    # ticket-quota mix. Stage cardinalities at sf0.01:
    # 480 -> 217 -> 210 -> 210 -> 140.
    "q55_curation_pipeline": r"""
        WITH corpus AS (
            SELECT doc_id, lang, text FROM documents
            WHERE doc_id % 25 <> 0 AND trim(coalesce(text, '')) <> ''
        ), toks AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
            FROM corpus
        ), stats AS (
            SELECT doc_id,
                   1 - (len(list_distinct(t))::DOUBLE / len(t)) AS dupf
            FROM toks
        ), bi AS (
            SELECT doc_id,
                   unnest([t[i + 1] || ' ' || t[i + 2] for i in range(len(t) - 1)]) AS bg
            FROM toks WHERE len(t) >= 2
        ), bistats AS (
            SELECT doc_id, max(c)::DOUBLE / sum(c) AS topbi
            FROM (SELECT doc_id, bg, count(*) AS c FROM bi GROUP BY 1, 2)
            GROUP BY doc_id
        ), gate AS (
            SELECT s.doc_id FROM stats s JOIN bistats b USING (doc_id)
            WHERE s.dupf <= 0.55 AND b.topbi <= 0.08
        ), btoks AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
            FROM documents
            WHERE doc_id % 25 = 0 AND trim(coalesce(text, '')) <> ''
        ), bwins AS (
            SELECT DISTINCT array_to_string(t[pos + 1 : pos + 4], ' ') AS win
            FROM (SELECT t, unnest(range(len(t) - 3)) AS pos
                  FROM btoks WHERE len(t) >= 4)
        ), gwins AS (
            SELECT w.doc_id, array_to_string(w.t[w.pos + 1 : w.pos + 4], ' ') AS win
            FROM (SELECT doc_id, t, unnest(range(len(t) - 3)) AS pos
                  FROM toks WHERE len(t) >= 4) w
            JOIN gate g USING (doc_id)
        ), contaminated AS (
            SELECT DISTINCT doc_id FROM gwins JOIN bwins USING (win)
        ), clean AS (
            SELECT c.doc_id, c.lang, c.text FROM corpus c JOIN gate USING (doc_id)
            WHERE c.doc_id NOT IN (SELECT doc_id FROM contaminated)
        ), dedup AS (
            SELECT doc_id, lang FROM (
                SELECT doc_id, lang,
                       row_number() OVER (
                           PARTITION BY md5(text) ORDER BY doc_id
                       ) AS rn
                FROM clean) WHERE rn = 1
        ), c2 AS (
            SELECT lang, count(*) AS n FROM dedup GROUP BY lang
        ), p AS (
            SELECT * FROM (VALUES
                ('en', 0.4), ('de', 0.2), ('es', 0.2),
                ('fr', 0.1), ('zh', 0.1)
            ) t(lang, p)
        ), tgt AS (
            SELECT min(CAST(floor(c2.n / p.p::DOUBLE) AS BIGINT)) AS nt
            FROM c2 JOIN p USING (lang)
        ), k AS (
            SELECT p.lang, CAST(floor(p.p::DOUBLE * tgt.nt) AS BIGINT) AS k
            FROM p CROSS JOIN tgt
        ), tick AS (
            SELECT doc_id, lang,
                   (doc_id * 2654435761) % 4294967296 AS ticket
            FROM dedup
        )
        SELECT doc_id, lang FROM (
            SELECT tick.doc_id, tick.lang, k.k,
                   row_number() OVER (
                       PARTITION BY tick.lang ORDER BY tick.ticket, tick.doc_id
                   ) AS rn
            FROM tick JOIN k USING (lang)
        ) q WHERE rn <= k
        ORDER BY doc_id
    """,
    # Okapi BM25 (k1=1.2, b=0.75, idf = ln(1 + (N-df+0.5)/(df+0.5)))
    # over literal token strings; both sides round the score to 9
    # decimals BEFORE the top-k cut and break ties by doc_id, so the
    # selection order is identical even for score-tied documents.
    "q56_bm25_topk": r"""
        WITH terms AS (
            SELECT unnest(['merge', 'spark', 'vector']) AS tok
        ), toks AS (
            SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
            FROM documents WHERE trim(coalesce(text, '')) <> ''
        ), dl AS (
            SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY 1
        ), stats AS (
            SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl
        ), tf AS (
            SELECT t.doc_id, t.tok, count(*)::DOUBLE AS tf
            FROM toks t JOIN terms USING (tok) GROUP BY 1, 2
        ), df AS (
            SELECT tok, count(DISTINCT doc_id)::DOUBLE AS df
            FROM toks JOIN terms USING (tok) GROUP BY 1
        ), scored AS (
            SELECT tf.doc_id,
                   sum(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                       * tf.tf * (1.2 + 1)
                       / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))
                   ) AS score,
                   count(*)::BIGINT AS matched_terms
            FROM tf JOIN df USING (tok) JOIN dl USING (doc_id)
            CROSS JOIN stats s
            GROUP BY tf.doc_id
        )
        SELECT s.doc_id, round(s.score, 9) AS score,
               dl.dl::BIGINT AS dl, s.matched_terms
        FROM scored s JOIN dl USING (doc_id)
        ORDER BY round(s.score, 9) DESC, s.doc_id LIMIT 10
    """,
    # chunk count = 1 + ceil(max(n - 32, 0) / 24); DuckDB list slices
    # are 1-based with an inclusive, clamped upper bound.
    "q57_chunk_documents": r"""
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
            FROM documents WHERE trim(coalesce(text, '')) <> ''
        ), ch AS (
            SELECT doc_id, t,
                   unnest(range(1 + CAST(
                       ceil(greatest(len(t) - 32, 0) / 24.0) AS BIGINT
                   ))) AS chunk_id
            FROM toks
        )
        SELECT doc_id, chunk_id,
               array_to_string(t[chunk_id * 24 + 1 : chunk_id * 24 + 32], ' ')
                   AS chunk_text,
               least(32, len(t) - chunk_id * 24)::BIGINT AS n_tokens
        FROM ch ORDER BY doc_id, chunk_id
    """,
    # corpus-as-model unigram logprob: avg over a doc's tokens of
    # ln(corpus_count(tok) / corpus_tokens), rounded to 9 decimals on
    # both sides (sum-order float jitter is ~1e-14 on ~60-token docs).
    "q58_unigram_logprob": r"""
        WITH toks AS (
            SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
            FROM documents WHERE trim(coalesce(text, '')) <> ''
        ), cnt AS (
            SELECT tok, count(*)::DOUBLE AS c FROM toks GROUP BY 1
        ), tot AS (
            SELECT count(*)::DOUBLE AS n FROM toks
        )
        SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
               round(avg(ln(c.c / tot.n)), 9) AS logprob
        FROM toks t JOIN cnt c USING (tok) CROSS JOIN tot
        GROUP BY t.doc_id ORDER BY t.doc_id
    """,
    # SemDeDup: q51's rounded-distance nearest-centroid assignment,
    # exact pairwise cosine WITHIN clusters at threshold 0.35
    # (non-degenerate: ~90 pairs at sf0.01), recursive-CTE min-label
    # components, min-key survivor per component.
    "q59_semantic_dedup": """
        WITH RECURSIVE c AS (
            SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
            FROM embeddings WHERE vec_id < 8
        ), d AS (
            SELECT e.vec_id, c.cid,
                   round(list_distance(e.embedding::DOUBLE[], c.cv), 9) AS dist
            FROM embeddings e CROSS JOIN c
        ), assign AS (
            SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       ROW_NUMBER() OVER (
                           PARTITION BY vec_id ORDER BY dist, cid
                       ) AS rn
                FROM d) WHERE rn = 1
        ), pairs AS (
            SELECT a.vec_id AS a, b.vec_id AS b
            FROM embeddings a
            JOIN assign aa ON aa.vec_id = a.vec_id
            JOIN assign ab ON TRUE
            JOIN embeddings b ON b.vec_id = ab.vec_id
            WHERE a.vec_id < b.vec_id AND aa.cid = ab.cid
              AND list_cosine_similarity(
                      a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.35
        ), edges AS (
            SELECT a AS src, b AS dst FROM pairs
            UNION ALL
            SELECT b, a FROM pairs
        ), reach AS (
            SELECT vec_id AS node, vec_id AS label FROM embeddings
            UNION
            SELECT e.dst, r.label FROM reach r
            JOIN edges e ON e.src = r.node WHERE r.label < e.dst
        )
        SELECT node AS vec_id FROM reach
        GROUP BY node HAVING node = min(label) ORDER BY vec_id
    """,
    # q58's logprob CTE feeding q44's percentile-rank rule: per-lang
    # top-ceil(0.5*n) under (round(logprob,9) DESC, doc_id ASC).
    "q60_logprob_quality_gate": r"""
        WITH toks AS (
            SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
            FROM documents WHERE trim(coalesce(text, '')) <> ''
        ), cnt AS (
            SELECT tok, count(*)::DOUBLE AS c FROM toks GROUP BY 1
        ), tot AS (
            SELECT count(*)::DOUBLE AS n FROM toks
        ), lp AS (
            SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
                   round(avg(ln(c.c / tot.n)), 9) AS logprob
            FROM toks t JOIN cnt c USING (tok) CROSS JOIN tot
            GROUP BY t.doc_id
        )
        SELECT doc_id, lang, n_tokens, logprob FROM (
            SELECT l.doc_id, d.lang, l.n_tokens, l.logprob,
                   row_number() OVER (
                       PARTITION BY d.lang
                       ORDER BY l.logprob DESC, l.doc_id
                   ) AS rn,
                   count(*) OVER (PARTITION BY d.lang) AS n
            FROM lp l JOIN documents d USING (doc_id)
        ) WHERE rn <= ceil(0.5 * n)
        ORDER BY doc_id
    """,
    # describe()-style profile; sums in exact fixed-point cents (q01
    # contract) so the distributed sum is order-independent.
    "q61_profile_columns": """
        SELECT 'l_discount' AS col, count(*)::BIGINT AS n_rows,
               (count(*) - count(l_discount))::BIGINT AS n_nulls,
               min(l_discount)::DOUBLE AS min_val,
               max(l_discount)::DOUBLE AS max_val,
               CAST(sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS sum_cents
        FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', count(*)::BIGINT,
               (count(*) - count(l_extendedprice))::BIGINT,
               min(l_extendedprice)::DOUBLE, max(l_extendedprice)::DOUBLE,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'l_quantity', count(*)::BIGINT,
               (count(*) - count(l_quantity))::BIGINT,
               min(l_quantity)::DOUBLE, max(l_quantity)::DOUBLE,
               CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'l_tax', count(*)::BIGINT,
               (count(*) - count(l_tax))::BIGINT,
               min(l_tax)::DOUBLE, max(l_tax)::DOUBLE,
               CAST(sum(CAST(floor(l_tax * 100 + 0.5) AS BIGINT)) AS BIGINT)
        FROM lineitem
        ORDER BY col
    """,
    # postings as a comma-joined sorted string so the artifact compares
    # exactly across engines (no list-rendering ambiguity); segmented
    # by key range (seg_id = doc_id // 100) matching the engine's
    # bounded hot-token output contract.
    "q62_inverted_index": r"""
        WITH toks AS (
            SELECT DISTINCT doc_id, doc_id // 100 AS seg_id,
                   unnest(regexp_split_to_array(trim(text), '\s+')) AS token
            FROM documents WHERE trim(coalesce(text, '')) <> ''
        )
        SELECT token, seg_id::BIGINT AS seg_id,
               count(*)::BIGINT AS df_seg,
               string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings
        FROM toks GROUP BY token, seg_id ORDER BY token, seg_id
    """,
    # the same deterministic augmentation + the same three RE2
    # replacements (email -> ip -> phone, global) as the engine.
    "q63_redact_pii": r"""
        WITH aug AS (
            SELECT doc_id,
                   coalesce(text, '') || ' reach user' || doc_id ||
                   '@example.com at 192.168.' || (doc_id % 256) ||
                   '.7 or +14155550' || (doc_id % 100) AS text
            FROM documents
        )
        SELECT doc_id,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(
                           text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                           '<EMAIL>', 'g'),
                       '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
                   '\+[0-9]{7,15}', '<PHONE>', 'g') AS text
        FROM aug ORDER BY doc_id
    """,
    # identical IEEE association order ((v-lo)/(hi-lo))*n on both
    # sides -> identical doubles -> identical floor/bin.
    "q64_price_histogram": """
        SELECT l_returnflag,
               least(greatest(CAST(floor(
                   (l_extendedprice - 900.0) / (105000.0 - 900.0) * 20
               ) AS BIGINT), 0), 19) AS bin,
               count(*)::BIGINT AS n
        FROM lineitem
        GROUP BY 1, 2
        ORDER BY l_returnflag, bin
    """,
    # Bloom prefilter + exact verify == an exact semi join.
    "q65_bloom_semijoin": """
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM orders o
        WHERE o.o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        )
        ORDER BY o.o_orderkey
    """,
    # full NB model recomputation: per-(label, token) counts, add-1
    # smoothing over V+1 events (V vocab tokens + the OOV event), doc
    # log-priors, posterior argmax with label-asc tie-break — scores
    # and margins rounded to 6dp on both sides (q56 rule)
    "q66_nb_classify": r"""
        WITH toks AS (
            SELECT doc_id, lang,
                   unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
            FROM documents WHERE trim(coalesce(text, '')) <> ''
        ), vb AS (
            SELECT count(DISTINCT tok)::DOUBLE AS v FROM toks
        ), cls AS (
            SELECT lang AS label, count(*)::DOUBLE AS docs
            FROM documents GROUP BY 1
        ), nd AS (
            SELECT sum(docs) AS n FROM cls
        ), cnt AS (
            SELECT lang AS label, tok, count(*)::DOUBLE AS c
            FROM toks GROUP BY 1, 2
        ), tot AS (
            SELECT label, sum(c) AS t FROM cnt GROUP BY 1
        ), dtok AS (
            SELECT doc_id, tok, count(*)::DOUBLE AS m FROM toks GROUP BY 1, 2
        ), scored AS (
            SELECT d.doc_id, c.label,
                   ln(c.docs / nd.n)
                   + coalesce(sum(dt.m * ln((coalesce(k.c, 0) + 1.0)
                                            / (coalesce(t.t, 0) + vb.v + 1.0))),
                              0.0) AS s
            FROM (SELECT doc_id FROM documents) d
            CROSS JOIN cls c
            CROSS JOIN nd CROSS JOIN vb
            LEFT JOIN tot t ON t.label = c.label
            LEFT JOIN dtok dt ON dt.doc_id = d.doc_id
            LEFT JOIN cnt k ON k.label = c.label AND k.tok = dt.tok
            GROUP BY d.doc_id, c.label, c.docs, nd.n, t.t, vb.v
        ), ranked AS (
            SELECT doc_id, label, s,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY s DESC, label ASC
                   ) AS rn,
                   lead(s) OVER (
                       PARTITION BY doc_id ORDER BY s DESC, label ASC
                   ) AS s2
            FROM scored
        )
        SELECT doc_id, label AS pred_label, round(s, 6) AS score,
               round(s - s2, 6) AS margin
        FROM ranked WHERE rn = 1 ORDER BY doc_id
    """,
    # the q67 engine augmentation re-derived structurally, then the
    # line-DF rule: a line is boilerplate when >= 3 distinct documents
    # of its domain contain it (empty lines exempt, min_chars=1)
    "q67_strip_boilerplate": """
        WITH base AS (
            SELECT doc_id, 'site' || (doc_id % 7) AS domain,
                   'NAV site' || (doc_id % 7) || chr(10) || coalesce(text, '')
                   || chr(10) || 'EXTRA e' || ((doc_id // 7) % 25)
                   || chr(10) || 'COPYRIGHT site' || (doc_id % 7) AS aug
            FROM documents
        ), lines AS (
            SELECT doc_id, domain,
                   unnest(string_split(aug, chr(10))) AS line,
                   unnest(generate_series(1, len(string_split(aug, chr(10))))) AS idx
            FROM base
        ), hot AS (
            SELECT domain, line FROM lines
            WHERE length(line) >= 1
            GROUP BY domain, line HAVING count(DISTINCT doc_id) >= 3
        )
        SELECT b.doc_id,
               coalesce(string_agg(l.line, chr(10) ORDER BY l.idx), '') AS text
        FROM base b
        LEFT JOIN (
            SELECT l.* FROM lines l
            ANTI JOIN hot h
              ON l.domain = h.domain AND l.line = h.line AND length(l.line) >= 1
        ) l ON l.doc_id = b.doc_id
        GROUP BY b.doc_id ORDER BY b.doc_id
    """,
    # C4 exact-line rule: first (doc_id, line_idx) occurrence of each
    # exact line wins corpus-wide; empty lines exempt (min_chars=1)
    "q68_line_dedup": """
        WITH base AS (
            SELECT doc_id,
                   coalesce(text, '') || chr(10) || 'FOOTER f' || (doc_id % 11)
                   || chr(10) || 'QUOTE q' || (doc_id % 3) AS aug
            FROM documents
        ), lines AS (
            SELECT doc_id,
                   unnest(string_split(aug, chr(10))) AS line,
                   unnest(generate_series(1, len(string_split(aug, chr(10))))) AS idx
            FROM base
        ), kept AS (
            SELECT doc_id, line, idx FROM (
                SELECT doc_id, line, idx,
                       row_number() OVER (
                           PARTITION BY line ORDER BY doc_id, idx
                       ) AS rn
                FROM lines WHERE length(line) >= 1
            ) WHERE rn = 1
            UNION ALL
            SELECT doc_id, line, idx FROM lines WHERE length(line) < 1
        )
        SELECT b.doc_id,
               coalesce(string_agg(k.line, chr(10) ORDER BY k.idx), '') AS text
        FROM base b LEFT JOIN kept k ON k.doc_id = b.doc_id
        GROUP BY b.doc_id ORDER BY b.doc_id
    """,
    "q69_pagerank_topk": _pagerank_sql_prefix() + """
        SELECT id AS node_id, round(r, 9) AS rank FROM r5
        ORDER BY round(r, 9) DESC, id LIMIT 20
    """,
    "q70_pagerank_attach": _pagerank_sql_prefix() + """
        SELECT o.o_orderkey, round(coalesce(r.r, 0.0), 9) AS pagerank
        FROM orders o LEFT JOIN r5 r ON r.id = o.o_orderkey
        ORDER BY o.o_orderkey
    """,
    # alpha-sampling quotas: p_g ∝ sqrt(n_g) (IEEE-exact), binding
    # group kept whole, k smallest Knuth tickets per group otherwise
    "q71_temperature_mix": """
        WITH c AS (
            SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY lang
        ), w AS (
            SELECT lang, n, sqrt(n::DOUBLE) AS w FROM c
        ), tot AS (
            SELECT sum(w) AS tw FROM w
        ), p AS (
            SELECT lang, n, w / tot.tw AS p FROM w CROSS JOIN tot
        ), tgt AS (
            SELECT min(CAST(floor(n / p) AS BIGINT)) AS nt FROM p
        ), k AS (
            SELECT lang, CAST(floor(p * tgt.nt) AS BIGINT) AS k
            FROM p CROSS JOIN tgt
        ), t AS (
            SELECT doc_id, lang, n_chars,
                   (doc_id * 2654435761) % 4294967296 AS ticket
            FROM documents
        )
        SELECT doc_id, lang, n_chars FROM (
            SELECT t.doc_id, t.lang, t.n_chars, k.k,
                   row_number() OVER (
                       PARTITION BY t.lang ORDER BY t.ticket, t.doc_id
                   ) AS rn
            FROM t JOIN k USING (lang)
        ) q WHERE rn <= k
        ORDER BY doc_id
    """,
    # q74: the synthetic url structure re-derived in SQL — canonical
    # form built from the same doc_id arithmetic, policy re-applied as
    # set membership + RE2 regexp_matches (DuckDB and Arrow both RE2)
    "q74_url_filter": r"""
        WITH u AS (
            SELECT doc_id,
                   'https://WWW.Site' || (doc_id % 20) || '.com:443/p/' || doc_id
                   || '/?b=2&utm_source=tw&a=1#frag' AS url,
                   'https://www.site' || (doc_id % 20) || '.com/p/' || doc_id
                   || '?a=1&b=2' AS canon,
                   'site' || (doc_id % 20) || '.com' AS dom
            FROM documents
        )
        SELECT doc_id, url FROM u
        WHERE dom IN ('site0.com','site1.com','site2.com','site3.com',
                      'site4.com','site5.com','site6.com','site7.com',
                      'site8.com','site9.com')
          AND dom <> 'site3.com'
          AND NOT regexp_matches(canon, '/p/\d*7\?')
        ORDER BY doc_id
    """,
    "q75_charset_sniff": """
        SELECT doc_id,
               CASE CAST(doc_id % 6 AS INT)
                   WHEN 0 THEN 'utf-8'
                   WHEN 1 THEN 'windows-1252'
                   WHEN 2 THEN 'shift_jis'
                   WHEN 3 THEN 'utf-16le'
                   WHEN 4 THEN 'iso-8859-2'
                   ELSE 'gbk'
               END AS encoding,
               CASE CAST(doc_id % 6 AS INT)
                   WHEN 0 THEN 'utf-8-valid'
                   WHEN 3 THEN 'bom'
                   WHEN 4 THEN 'xml-decl'
                   ELSE 'meta'
               END AS encoding_source,
               text
        FROM documents
        ORDER BY doc_id
    """,
    "q76_blockword_audit": r"""
        SELECT doc_id,
               len(list_filter(
                   regexp_split_to_array(lower(text), '\s+'),
                   tok -> tok IN ('merge', 'join', 'scan')
               )) AS block_hits,
               len(list_filter(
                   regexp_split_to_array(lower(text), '\s+'),
                   tok -> tok IN ('merge', 'join', 'scan')
               )) = 0 AS kept
        FROM documents
        ORDER BY doc_id
    """,
    "q77_crawl_delta": """
        WITH old_snap AS (
            SELECT 'https://ex.com/' || doc_id AS url,
                   md5(text) AS content_hash
            FROM documents
        ), new_snap AS (
            SELECT 'https://ex.com/' || doc_id AS url,
                   md5(text || CASE WHEN doc_id % 7 = 0 THEN '-v2' ELSE '' END)
                       AS content_hash
            FROM documents WHERE doc_id % 10 <> 0
            UNION ALL
            SELECT 'https://ex.com/new/' || doc_id AS url,
                   md5('fresh-' || doc_id) AS content_hash
            FROM documents WHERE doc_id % 13 = 0
        )
        SELECT coalesce(o.url, n.url) AS url,
               o.content_hash AS old_content_hash,
               n.content_hash AS new_content_hash,
               CASE
                   WHEN o.url IS NULL THEN 'added'
                   WHEN n.url IS NULL THEN 'removed'
                   WHEN o.content_hash = n.content_hash THEN 'unchanged'
                   ELSE 'modified'
               END AS change
        FROM old_snap o FULL OUTER JOIN new_snap n ON o.url = n.url
        ORDER BY url
    """,
    # Interpolated bigram LM (q58's template + a positional self-join;
    # the 0.1 backoff weight is written (1 - 0.9) so both engines
    # evaluate the identical float64 constant). Bigram counts below 2
    # are pruned to 0 exactly as the engine's min_count broadcast does.
    "q78_bigram_logprob": r"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\s+')) AS tok,
                   generate_subscripts(
                       regexp_split_to_array(trim(text), '\s+'), 1) AS pos
            FROM documents WHERE trim(coalesce(text, '')) <> ''
        ), uni AS (
            SELECT tok, count(*)::DOUBLE AS c FROM toks GROUP BY 1
        ), tot AS (
            SELECT count(*)::DOUBLE AS n FROM toks
        ), bi AS (
            SELECT t1.doc_id, t1.tok AS w1, t2.tok AS w2
            FROM toks t1
            JOIN toks t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
        ), bic AS (
            SELECT w1, w2, count(*)::DOUBLE AS c12
            FROM bi GROUP BY 1, 2 HAVING count(*) >= 2
        )
        SELECT b.doc_id, count(*)::BIGINT AS n_bigrams,
               round(avg(ln(
                   0.9 * coalesce(bc.c12, 0) / u1.c
                   + (1 - 0.9) * u2.c / tot.n)), 9) AS logprob
        FROM bi b
        JOIN uni u1 ON u1.tok = b.w1
        JOIN uni u2 ON u2.tok = b.w2
        LEFT JOIN bic bc ON bc.w1 = b.w1 AND bc.w2 = b.w2
        CROSS JOIN tot
        GROUP BY b.doc_id ORDER BY b.doc_id
    """,
}

# ---------------------------------------------------------------------------
# Committed-golden oracles (VERDICT r1 "close the oracle gap"): for the
# deterministic non-SQL-expressible queries, the oracle is a golden
# parquet generated by the engine, committed to the repo, and read back
# by DuckDB — a regression pin with full row/schema/value comparison,
# not an independent derivation (the genuinely independent checks for
# these operators live in tests/: driver-vs-distributed equivalence,
# property tests, in-query asserts). All goldens are generated at
# sf0.01 — the driver gate's scale (every testdata table differs per
# scale factor, including the 500-row documents/embeddings tables).
# ---------------------------------------------------------------------------

GOLDEN_DIR = "/root/repo/tests/golden"

GOLDEN_SF01_ORACLES = [
    "q16_doc_fingerprints",
    "q17_langid",
    "q18_quality_scores",
    "q19_minhash_dedup",
    "q20_simhash",
    "q26_extract_pages",
    "q32_simhash_dedup",
    "q33_media_decode",
    "q34_cleaning_pairs",
    "q35_augmented_docs",
    "q36_training_view",
    "q41_hll_distinct_users",
    # round-5 additions (registry deliberately unfrozen in session 1,
    # VERDICT r4 #2): BPE training is greedy-iterative, anchor-text
    # selection ranks blake2b tickets — neither is SQL-derivable
    "q72_bpe_encode",
    "q73_anchor_texts",
]

# genuine-SQL oracles whose equality contract is nevertheless
# input-specific: q31's IVF probe achieves full recall vs the exact-KNN
# oracle at sf0.01 (verified), but not necessarily at other scales
SF01_PINNED = set(GOLDEN_SF01_ORACLES) | {"q31_ivf_knn"}

for _name in GOLDEN_SF01_ORACLES:
    ORACLE_SQL[_name] = (
        f"SELECT * FROM read_parquet('{GOLDEN_DIR}/oracle_{_name}.parquet')"
    )
