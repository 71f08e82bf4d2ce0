"""Within-domain boilerplate line removal — strip lines whose exact
content repeats across many documents of the SAME site/domain
(navigation, footers, cookie banners, templated chrome).

Published anchors (public papers): C4 applies a corpus-global
repeated-line rule (Raffel et al. 2020 §2.2 — our
``stages.span_dedup.line_dedup`` keeps first occurrence); RefinedWeb's
line-wise corrections (Penedo et al. 2023 §G) and the OSCAR/Ungoliant
pipeline filter high-frequency short lines per document set. The
within-domain document-frequency rule implemented here is the
domain-scoped member of that family: a line is boilerplate when it
occurs in >= ``min_docs`` distinct documents of one registrable
domain (optionally >= ``min_frac`` of the domain's documents), and —
unlike first-wins line dedup — EVERY occurrence is removed.

Ray-Data shape (mirrors ``line_dedup``): documents emit skinny
distinct ``(dhash, lhash)`` int64 rows — one per (document, line
content) pair — so the per-pair row count IS the distinct-document
frequency; ONE coarse-bucket exchange (bucket keyed on the mixed hash,
so equal pairs always co-locate and skew cannot concentrate: distinct
lines spread uniformly) reduces them with a vectorized run-length
count and filters to the boilerplate threshold BEFORE anything reaches
the driver, so driver/broadcast state is boilerplate-bounded, never
corpus-bounded. When ``min_frac`` is set, per-domain document totals
(domain-bounded) are computed in a tiny side exchange and broadcast
into the reduce. Application is a pure broadcast map that rebuilds
each document with Arrow list offsets + ``binary_join`` — no per-line
Python in the hot path.

Line equality is by 64-bit content hash within a 64-bit domain hash
(mixed for membership tests); a false drop needs a same-domain
64+64-bit collision. Tests cross-check against a literal-string
pandas reference.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.hashing import stable_hash64_array

_MIX = np.uint64(1099511628211)  # FNV prime, odd => bijective mod 2^64

# same driver fast-path bound as the other line/window planners
SMALL_INPUT_LINE_ROWS = 2_000_000


def _mix(dh: np.ndarray, lh: np.ndarray) -> np.ndarray:
    """Combine (domain hash, line hash) into one uint64 membership key."""
    return dh.view(np.uint64) * _MIX ^ lh.view(np.uint64)


def _split_lines(batch: pa.Table, text_col: str):
    """(flat line values, per-doc counts) via ONE split_pattern call."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # null texts contribute zero lines (fill only for the split)
    lines = pc.split_pattern(pc.fill_null(col, ""), pattern="\n")
    if isinstance(lines, pa.ChunkedArray):  # pragma: no cover
        lines = lines.combine_chunks()
    offsets = lines.offsets.to_numpy()
    return lines.values, np.diff(offsets)


def _pair_rows(
    batch: pa.Table, text_col: str, domain_col: str, min_chars: int
) -> pa.Table:
    """Distinct (dhash, lhash) skinny rows, one per (doc, line content).

    Documents never split across batches, so per-batch distinctness is
    global distinctness and the downstream per-pair row count is the
    exact distinct-document frequency."""
    empty = pa.table(
        {"dhash": pa.array([], pa.int64()), "lhash": pa.array([], pa.int64())}
    )
    if batch.num_rows == 0:
        return empty
    flat, counts = _split_lines(batch, text_col)
    if not len(flat):
        return empty
    doc = np.repeat(np.arange(batch.num_rows, dtype=np.int64), counts)
    ln = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    keep = ln >= min_chars
    if not keep.any():
        return empty
    doc = doc[keep]
    lh = stable_hash64_array(
        flat.filter(pa.array(keep)).to_numpy(zero_copy_only=False)
    ).view(np.int64)
    dh_doc = stable_hash64_array(
        np.asarray(batch[domain_col].to_pylist(), dtype=object)
    ).view(np.int64)
    # distinct per (doc, line content): a line repeated inside one doc
    # still counts that doc once
    order = np.lexsort((lh, doc))
    doc_s, lh_s = doc[order], lh[order]
    first = np.empty(doc_s.size, dtype=bool)
    first[0] = True
    first[1:] = (doc_s[1:] != doc_s[:-1]) | (lh_s[1:] != lh_s[:-1])
    return pa.table(
        {
            "dhash": pa.array(dh_doc[doc_s[first]]),
            "lhash": pa.array(lh_s[first]),
        }
    )


def _domain_doc_counts(
    ds: ray.data.Dataset, domain_col: str
) -> tuple[np.ndarray, np.ndarray]:
    """Per-domain document totals: (sorted dhash, counts) — a tiny
    domain-bounded exchange (per-batch partials + one groupby sum)."""

    def _partial(batch: pa.Table) -> pa.Table:
        dh = stable_hash64_array(
            np.asarray(batch[domain_col].to_pylist(), dtype=object)
        ).view(np.int64)
        uh, cnt = np.unique(dh, return_counts=True)
        return pa.table(
            {"dhash": pa.array(uh), "n": pa.array(cnt.astype(np.int64))}
        )

    df = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("dhash")
        .sum("n")
        .to_pandas()
    )
    if len(df) == 0 or "dhash" not in df.columns:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    dh = df["dhash"].to_numpy(dtype=np.int64)
    n = df["sum(n)"].to_numpy(dtype=np.int64)
    order = np.argsort(dh)
    return dh[order], n[order]


def _reduce_hot(
    dh: np.ndarray,
    lh: np.ndarray,
    min_docs: int,
    dom_dh: np.ndarray | None,
    dom_n: np.ndarray | None,
    min_frac: float | None,
) -> pd.DataFrame:
    """Run-length count per (dhash, lhash); keep pairs at/over the
    domain's threshold. Pure numpy — shared by both paths."""
    if dh.size == 0:
        return pd.DataFrame(
            {
                "dhash": np.empty(0, np.int64),
                "lhash": np.empty(0, np.int64),
                "df": np.empty(0, np.int64),
            }
        )
    order = np.lexsort((lh, dh))
    dh_s, lh_s = dh[order], lh[order]
    new = np.empty(dh_s.size, dtype=bool)
    new[0] = True
    new[1:] = (dh_s[1:] != dh_s[:-1]) | (lh_s[1:] != lh_s[:-1])
    starts = np.flatnonzero(new)
    cnt = np.diff(np.append(starts, dh_s.size)).astype(np.int64)
    gdh, glh = dh_s[starts], lh_s[starts]
    thr = np.full(gdh.size, min_docs, dtype=np.int64)
    if min_frac is not None:
        pos = np.searchsorted(dom_dh, gdh)
        # every dhash here was emitted from the same dataset the totals
        # came from, so the lookup always hits
        ntot = dom_n[pos]
        thr = np.maximum(thr, np.ceil(min_frac * ntot).astype(np.int64))
    hot = cnt >= thr
    return pd.DataFrame({"dhash": gdh[hot], "lhash": glh[hot], "df": cnt[hot]})


def boilerplate_lines(
    ds: ray.data.Dataset,
    text_col: str = "text",
    key_col: str = "doc_id",  # unused: doc identity is positional; kept for signature compat
    domain_col: str = "domain",
    *,
    min_docs: int = 3,
    min_frac: float | None = None,
    min_chars: int = 1,
    n_buckets: int | None = None,
) -> pd.DataFrame:
    """Plan the boilerplate set: ``(dhash, lhash, df)`` — one row per
    (domain, line content) occurring in >= ``min_docs`` distinct
    documents of that domain (and >= ``min_frac`` of the domain's
    documents when set). Sorted (dhash, lhash) for determinism.

    Driver/broadcast state is bounded by the BOILERPLATE set, not the
    corpus: the distributed reduce filters below-threshold pairs inside
    the bucket tasks. Feed the result to :func:`strip_boilerplate`.
    """
    dom_dh = dom_n = None
    if min_frac is not None:
        dom_dh, dom_n = _domain_doc_counts(ds, domain_col)

    pair_rows = ds.map_batches(
        lambda t: _pair_rows(t, text_col, domain_col, min_chars),
        batch_format="pyarrow",
    ).materialize()

    n_rows = pair_rows.count()
    if n_rows <= SMALL_INPUT_LINE_ROWS:
        pdf = pair_rows.to_pandas()
        dh = (
            pdf["dhash"].to_numpy(dtype=np.int64)
            if "dhash" in pdf.columns
            else np.empty(0, np.int64)
        )
        lh = (
            pdf["lhash"].to_numpy(dtype=np.int64)
            if "lhash" in pdf.columns
            else np.empty(0, np.int64)
        )
        hot = _reduce_hot(dh, lh, min_docs, dom_dh, dom_n, min_frac)
    else:
        nb = n_buckets or max(32, int(n_rows // 2_000_000) + 1)
        dom_ref = ray.put((dom_dh, dom_n))

        def _bucket(t: pa.Table) -> pa.Table:
            m = _mix(
                t["dhash"].to_numpy(zero_copy_only=False),
                t["lhash"].to_numpy(zero_copy_only=False),
            )
            b = ((m >> np.uint64(32)) % np.uint64(nb)).astype(np.int32)
            return t.append_column("bucket", pa.array(b))

        def _bucket_hot(group: pa.Table) -> pa.Table:
            ddh, ddn = ray.get(dom_ref)
            out = _reduce_hot(
                group["dhash"].to_numpy(zero_copy_only=False),
                group["lhash"].to_numpy(zero_copy_only=False),
                min_docs,
                ddh,
                ddn,
                min_frac,
            )
            return pa.table(
                {
                    "dhash": pa.array(out["dhash"].to_numpy(), pa.int64()),
                    "lhash": pa.array(out["lhash"].to_numpy(), pa.int64()),
                    "df": pa.array(out["df"].to_numpy(), pa.int64()),
                }
            )

        hot = (
            pair_rows.map_batches(_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(_bucket_hot, batch_format="pyarrow")
            .to_pandas()
        )
        if "dhash" not in hot.columns:
            hot = pd.DataFrame(
                {
                    "dhash": np.empty(0, np.int64),
                    "lhash": np.empty(0, np.int64),
                    "df": np.empty(0, np.int64),
                }
            )
    return hot.sort_values(["dhash", "lhash"]).reset_index(drop=True)


def strip_boilerplate(
    ds: ray.data.Dataset,
    hot: pd.DataFrame,
    text_col: str = "text",
    domain_col: str = "domain",
    *,
    min_chars: int = 1,
) -> ray.data.Dataset:
    """Remove every occurrence of the planned boilerplate lines from
    documents of the matching domain; survivors re-join with newlines.

    Broadcast the mixed-hash membership array once; the rebuild is
    Arrow list offsets + ``binary_join`` — zero per-line Python.
    ``min_chars`` must match the planning call (shorter lines are
    exempt on both sides)."""
    chash = np.sort(
        _mix(
            hot["dhash"].to_numpy(dtype=np.int64),
            hot["lhash"].to_numpy(dtype=np.int64),
        )
    )
    hot_ref = ray.put(chash)

    def _strip(batch: pa.Table) -> pa.Table:
        hot_sorted = ray.get(hot_ref)
        if batch.num_rows == 0 or hot_sorted.size == 0:
            return batch
        flat, counts = _split_lines(batch, text_col)
        if not len(flat):
            return batch
        doc = np.repeat(np.arange(batch.num_rows, dtype=np.int64), counts)
        lh = stable_hash64_array(
            flat.to_numpy(zero_copy_only=False)
        ).view(np.int64)
        dh_doc = stable_hash64_array(
            np.asarray(batch[domain_col].to_pylist(), dtype=object)
        ).view(np.int64)
        m = _mix(dh_doc[doc], lh)
        pos = np.searchsorted(hot_sorted, m)
        pos_c = np.minimum(pos, hot_sorted.size - 1)
        drop = hot_sorted[pos_c] == m
        # planning exempted short lines — exempt them here too
        ln = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        drop &= ln >= min_chars
        keep = ~drop
        kept_counts = np.bincount(
            doc[keep], minlength=batch.num_rows
        ).astype(np.int64)
        new_offsets = np.zeros(batch.num_rows + 1, dtype=np.int64)
        np.cumsum(kept_counts, out=new_offsets[1:])
        kept_vals = flat.filter(pa.array(keep))
        lists = pa.ListArray.from_arrays(
            pa.array(new_offsets, pa.int32()).cast(pa.int32()), kept_vals
        )
        # separator type must match the list value type: a parquet
        # round-trip yields large_string columns, and binary_join has
        # no (list<large_string>, string) kernel
        sep = pa.scalar(
            "\n",
            pa.large_string()
            if pa.types.is_large_string(kept_vals.type)
            else pa.string(),
        )
        joined = pc.binary_join(lists, sep)
        # null texts stay null
        orig = batch[text_col]
        if isinstance(orig, pa.ChunkedArray):
            orig = orig.combine_chunks()
        joined = pc.if_else(pc.is_null(orig), orig, joined)
        return batch.set_column(
            batch.schema.get_field_index(text_col), text_col, joined
        )

    return ds.map_batches(_strip, batch_format="pyarrow")
