"""Run metrics & lineage aggregations (G1-G4 graft).

The reference tallies pass/overall counters in driver locals
(video/frame_pipeline.py:336-392) and walks output JSONs for cost
stats (llm/utils/calculate_cost_stats.py:26-105). Here both are
Dataset aggregates over the extracted table's metric columns —
partial-per-block + final combine is native to ``Dataset.aggregate``.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Std, Sum


def extraction_metrics(ds: ray.data.Dataset) -> dict:
    """Overall counters (G2): rows, ok/failed, chars/tokens/bytes.

    One streaming pass: the status flag is vectorized into an int column
    so everything folds in a single ``aggregate`` (no per-row filter, no
    second DAG execution)."""

    def _flag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "failed",
            pc.cast(pc.not_equal(t["status"], pa.scalar("ok")), pa.int64()),
        )

    row = ds.map_batches(_flag, batch_format="pyarrow").aggregate(
        Count(alias_name="rows"),
        Sum("n_chars", alias_name="total_chars"),
        Sum("n_tokens", alias_name="total_tokens"),
        Sum("n_spans", alias_name="total_spans"),
        Sum("html_bytes", alias_name="total_html_bytes"),
        Mean("n_chars", alias_name="mean_chars"),
        Sum("failed", alias_name="failed_rows"),
    )
    out = dict(row)
    out["failed_rows"] = int(out["failed_rows"])
    out["ok_rows"] = out["rows"] - out["failed_rows"]
    return out


def per_lang_metrics(ds: ray.data.Dataset) -> pd.DataFrame:
    """Per-group fold (G1): per-lang doc counts and char stats."""
    res = (
        ds.groupby("lang")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_chars", alias_name="sum_chars"),
            Mean("n_chars", alias_name="mean_chars"),
            Min("n_chars", alias_name="min_chars"),
            Max("n_chars", alias_name="max_chars"),
        )
        .to_pandas()
    )
    return res.sort_values("lang").reset_index(drop=True)


def cost_stats(
    ds: ray.data.Dataset, cost_col: str = "html_bytes", unit_cost: float = 1e-9
) -> dict:
    """Cost statistics (G3 analogue of calculate_cost_stats.py:92-105):
    sum/mean/std/min/max of a per-row cost metric (bytes x unit rate)."""
    row = ds.aggregate(
        Sum(cost_col, alias_name="sum_"),
        Mean(cost_col, alias_name="mean_"),
        Std(cost_col, alias_name="std_"),
        Min(cost_col, alias_name="min_"),
        Max(cost_col, alias_name="max_"),
        Count(alias_name="n"),
    )
    return {
        "total_cost": row["sum_"] * unit_cost,
        "mean_cost": row["mean_"] * unit_cost,
        "std_cost": (row["std_"] or 0.0) * unit_cost,
        "min_cost": row["min_"] * unit_cost,
        "max_cost": row["max_"] * unit_cost,
        "n": row["n"],
    }


def profile_columns(
    ds: ray.data.Dataset, columns: list[str], *, cents_scale: int = 100
) -> pd.DataFrame:
    """Spark-describe()-style numeric column profile in ONE streaming
    pass: per column ``(col, n_rows, n_nulls, min_val, max_val,
    sum_cents)``. Sums use the q01 fixed-point contract
    (``floor(x * cents_scale + 0.5)`` as int64) so the distributed sum
    is order-independent and byte-equal to a SQL oracle; min/max are
    exact data elements.

    Scale shape: each block reduces to ``len(columns)`` partial rows
    (a pure map), then one tiny groupby over ``len(columns)`` groups —
    nothing corpus-shaped moves or materializes. Float NaN values
    (stored as values, not nulls — e.g. numpy->parquet without
    nan_as_null) count as nulls: min/max already skip them, and they
    must not reach the int64 cents cast (ArrowInvalid).
    """
    import numpy as np

    def _partial(batch: pa.Table) -> pa.Table:
        cols, ns, nulls, mins, maxs, sums = [], [], [], [], [], []
        for c in columns:
            arr = batch[c]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            n = len(arr)
            if pa.types.is_floating(arr.type):
                arr = arr.filter(
                    pc.invert(pc.is_nan(arr).fill_null(True))
                )
            else:
                arr = arr.drop_null()
            nn = n - len(arr)
            cols.append(c)
            ns.append(n)
            nulls.append(nn)
            if len(arr) > 0:
                mins.append(pc.min(arr).as_py())
                maxs.append(pc.max(arr).as_py())
                cents = pc.cast(
                    pc.floor(
                        pc.add(
                            pc.multiply(arr, pa.scalar(float(cents_scale))),
                            pa.scalar(0.5),
                        )
                    ),
                    pa.int64(),
                )
                sums.append(pc.sum(cents).as_py())
            else:
                mins.append(None)
                maxs.append(None)
                sums.append(0)
        return pa.table(
            {
                "col": pa.array(cols, pa.string()),
                "n_rows": pa.array(ns, pa.int64()),
                "n_nulls": pa.array(nulls, pa.int64()),
                "min_val": pa.array(mins, pa.float64()),
                "max_val": pa.array(maxs, pa.float64()),
                "sum_cents": pa.array(sums, pa.int64()),
            }
        )

    def _reduce(group: pa.Table) -> pa.Table:
        mn = group["min_val"].to_numpy(zero_copy_only=False)
        mx = group["max_val"].to_numpy(zero_copy_only=False)
        has = ~pd.isna(mn)
        return pa.table(
            {
                "col": pa.array([group["col"][0].as_py()], pa.string()),
                "n_rows": pa.array(
                    [int(pc.sum(group["n_rows"]).as_py())], pa.int64()
                ),
                "n_nulls": pa.array(
                    [int(pc.sum(group["n_nulls"]).as_py())], pa.int64()
                ),
                "min_val": pa.array(
                    [float(np.min(mn[has])) if has.any() else None],
                    pa.float64(),
                ),
                "max_val": pa.array(
                    [float(np.max(mx[has])) if has.any() else None],
                    pa.float64(),
                ),
                "sum_cents": pa.array(
                    [int(pc.sum(group["sum_cents"]).as_py())], pa.int64()
                ),
            }
        )

    out = (
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=None)
        .groupby("col")
        .map_groups(_reduce, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("col").reset_index(drop=True)


def group_histogram(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    *,
    lo: float,
    hi: float,
    n_bins: int = 20,
) -> pd.DataFrame:
    """Fixed-bin histogram per group: ``(group, bin, n)`` for the
    distribution dashboards/data-quality checks that complement
    ``profile_columns``. ``bin = clip(floor((v - lo) / (hi - lo)
    * n_bins), 0, n_bins - 1)`` — out-of-range values clamp into the
    edge bins; nulls are dropped. The bin arithmetic is plain IEEE
    double in a fixed association order, so a SQL oracle computes the
    identical bin for every value.

    Scale shape: per-batch (group, bin) partial counts (never a row
    per value), one native Sum groupby over <= n_groups x n_bins
    groups — bounded driver result, payload never shuffles.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    width = float(hi) - float(lo)
    if width <= 0 or n_bins <= 0:
        raise ValueError("group_histogram requires hi > lo and n_bins > 0")

    def _partial(batch: pa.Table) -> pa.Table:
        gcol = batch[group_col]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        vals = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        groups = np.asarray(gcol.to_pylist(), dtype=object)
        ok = ~pd.isna(vals)
        vals, groups = vals[ok], groups[ok]
        # clamp the SCALED value before floor so +-inf land in the
        # edge bins (floor(inf).astype(int64) is undefined), matching
        # the documented clamp contract; in-range bins are unchanged
        scaled = np.clip((vals - float(lo)) / width * n_bins, 0, n_bins - 1)
        b = np.floor(scaled).astype(np.int64)
        ug, gidx = np.unique(groups, return_inverse=True)
        pair = gidx * n_bins + b
        up, cnt = np.unique(pair, return_counts=True)
        if up.size == 0:
            # typed empty (slicing the real column) — a null-typed
            # group column would diverge the block schema
            return pa.table(
                {
                    group_col: gcol.slice(0, 0),
                    "bin": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                group_col: pa.array([ug[p // n_bins] for p in up]),
                "bin": pa.array((up % n_bins).astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    out = (
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=None)
        .groupby([group_col, "bin"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return out.sort_values([group_col, "bin"]).reset_index(drop=True)


def corpus_report(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    key_col: str = "doc_id",
    lang_col: str | None = None,
    domain_col: str | None = None,
    top_k: int = 20,
) -> dict:
    """One-call corpus card: document/char/token counts and ranges,
    an exact-duplicate-rate estimate (HyperLogLog over the content
    hash — 16 KiB of sketch, never the hashes), the per-language
    distribution, the top domains, and the top tokens. Everything is
    JSON-serializable.

    Scale shape: ONE skinny pass computes (lang, domain, n_chars,
    n_tokens, content-hash) per doc and materializes it; every
    aggregate below reads that projection, not the payload — the
    payload is read exactly twice (skinny pass + top_tokens). Driver
    state is language/top-k/sketch-bounded; the domain ranking is a
    distributed sort+limit, so a 10M-domain corpus never collects its
    domain table.
    """
    import numpy as np

    from ..functions.hashing import stable_hash64_array
    from ..functions.hll import HyperLogLog
    from ..stages.curation import top_tokens

    keep = [c for c in (lang_col, domain_col) if c]

    def _skinny(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        filled = pc.fill_null(col, "")
        toks = pc.utf8_split_whitespace(filled)
        n_tokens = pc.cast(pc.list_value_length(toks), pa.int64())
        h = stable_hash64_array(
            filled.to_numpy(zero_copy_only=False)
        ).view(np.int64)
        cols = {
            "n_chars": pc.cast(pc.utf8_length(filled), pa.int64()),
            "n_tokens": n_tokens,
            "content_hash64": pa.array(h),
        }
        for c in keep:
            cols[c] = batch[c]
        return pa.table(cols)

    skinny = ds.map_batches(_skinny, batch_format="pyarrow").materialize()
    n_docs = skinny.count()
    report: dict = {"n_docs": int(n_docs)}
    if n_docs == 0:
        return report

    prof = profile_columns(skinny, ["n_chars", "n_tokens"])
    for _, r in prof.iterrows():
        report[r["col"]] = {
            "min": int(r["min_val"]),
            "max": int(r["max_val"]),
            "mean": round(r["sum_cents"] / 100.0 / max(1, r["n_rows"]), 2),
            "total": int(round(r["sum_cents"] / 100.0)),
        }

    # duplicate-rate estimate: one mergeable sketch per block
    def _sketch(t: pa.Table) -> pa.Table:
        hll = HyperLogLog().add_array(
            t["content_hash64"].to_numpy(zero_copy_only=False)
        )
        return pa.table({"sketch": pa.array([hll.to_bytes()], pa.binary())})

    acc = None
    for row in skinny.map_batches(
        _sketch, batch_format="pyarrow"
    ).take_all():
        s = HyperLogLog.from_bytes(row["sketch"])
        acc = s if acc is None else acc.merge(s)
    distinct = min(float(n_docs), acc.estimate())
    report["approx_distinct_texts"] = int(round(distinct))
    report["approx_exact_dup_rate"] = round(1.0 - distinct / n_docs, 4)

    if lang_col:
        report["languages"] = {
            (r[lang_col] if r[lang_col] is not None else "<null>"): int(
                r["count()"]
            )
            for r in skinny.groupby(lang_col).count().take_all()
        }
    if domain_col:
        # tie-break by domain so the top-k cut is deterministic when
        # counts tie across it (ADVICE r4)
        top = (
            skinny.groupby(domain_col)
            .count()
            .sort(["count()", domain_col], descending=[True, False])
            .limit(top_k)
            .take_all()
        )
        report["top_domains"] = [
            {"domain": r[domain_col], "docs": int(r["count()"])} for r in top
        ]

    report["top_tokens"] = [
        {"token": r["token"], "n": int(r["n"])}
        for r in top_tokens(ds, text_col, k=top_k).take_all()
    ]
    return report
