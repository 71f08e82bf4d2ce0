"""Span-level (substring) deduplication: remove repeated token windows
across the corpus, keeping only the globally-first occurrence.

Published recipe (exact-substring training-data dedup a la Lee et al.,
"Deduplicating Training Data Makes Language Models Better", 2022 —
public paper), re-expressed for Ray Data without the suffix array:

1. every document emits one skinny row per token WINDOW (``w``
   consecutive whitespace tokens, stride 1): ``(whash, packed)`` where
   ``whash`` is a vectorized polynomial rolling hash over per-token
   64-bit hashes and ``packed = key * 2^POS_BITS + pos`` totals the
   occurrence order — 16 bytes per token, the same asymptotic footprint
   as the corpus itself (any exact-substring method pays this);
2. the globally-first occurrence of each window content is the one
   with the minimum ``packed``; every other occurrence is a LOSER span
   ``[pos, pos + w)`` in its document;
3. loser spans are merged per document (overlaps collapse) into the
   final drop-span table; ``apply_span_dedup`` cuts them out of the
   text.

Scale shape mirrors stages/dedup.py: the only all-to-all moves the
16-byte window rows (native ``Min``/``Count`` aggregate per hash — no
per-group Python); everything that reaches the driver or a broadcast is
DUPLICATE-bounded (hashes with >= 2 occurrences, loser spans). Small
inputs (<= ``SMALL_INPUT_WINDOW_ROWS`` window rows) skip the
distributed plan for one driver numpy pass with the identical result.

Window equality is by 64-bit hash — two distinct windows colliding is
~n^2/2^64 and would only drop one extra span. The companion SQL oracle
(pipelines/queries.py q46) groups by the literal window STRING, so the
correctness gate also cross-checks the no-collision assumption at its
scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.hashing import stable_hash64_array

# pos fits 2^22 tokens per document (4M); keys then fit 2^41 — both
# asserted at emit time
POS_BITS = 22
POS_MOD = 1 << POS_BITS

SMALL_INPUT_WINDOW_ROWS = 2_000_000

_ROLL_B = np.uint64(1099511628211)  # FNV prime — odd, full-period mod 2^64


def window_hashes(tokens: list[str], w: int) -> np.ndarray:
    """uint64 rolling hash per w-token window (stride 1), vectorized:
    w vector ops over the position axis, no per-window Python."""
    n = len(tokens)
    if n < w:
        return np.empty(0, dtype=np.uint64)
    th = stable_hash64_array(tokens).astype(np.uint64)
    acc = np.zeros(n - w + 1, dtype=np.uint64)
    for j in range(w):
        acc = acc * _ROLL_B + th[j : n - w + 1 + j]
    return acc


def _window_rows(
    batch: pa.Table, text_col: str, key_col: str, w: int
) -> pa.Table:
    hashes: list[np.ndarray] = []
    packs: list[np.ndarray] = []
    for key, text in zip(batch[key_col].to_pylist(), batch[text_col].to_pylist()):
        toks = (text or "").split()
        wh = window_hashes(toks, w)
        if not wh.size:
            continue
        if len(toks) >= POS_MOD or key >= (1 << (63 - POS_BITS)):
            raise ValueError(
                f"span_dedup packing overflow: key={key} n_tokens={len(toks)}"
            )
        hashes.append(wh)
        packs.append(
            np.int64(key) * POS_MOD + np.arange(wh.size, dtype=np.int64)
        )
    if not hashes:
        return pa.table(
            {
                "whash": pa.array([], pa.int64()),
                "packed": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            # uint64 -> int64 bijective reinterpret: Ray's pandas-based
            # aggregates mangle uint64 > 2^63 into object columns
            "whash": pa.array(np.concatenate(hashes).view(np.int64)),
            "packed": pa.array(np.concatenate(packs)),
        }
    )


def _merge_spans(keys: np.ndarray, starts: np.ndarray, w: int) -> pd.DataFrame:
    """(key, start) loser occurrences -> merged (key, span_start,
    span_end) intervals, vectorized gaps-and-islands."""
    if not len(keys):
        return pd.DataFrame(
            {
                "key": np.empty(0, dtype=np.int64),
                "span_start": np.empty(0, dtype=np.int64),
                "span_end": np.empty(0, dtype=np.int64),
            }
        )
    order = np.lexsort((starts, keys))
    ks, ss = keys[order].astype(np.int64), starts[order].astype(np.int64)
    es = ss + w
    # islands over ABSOLUTE coordinates key*POS_MOD + pos: positions are
    # < POS_MOD, so key boundaries are unconditional gaps and one global
    # running-max-end pass merges correctly without per-key resets
    base = ks * POS_MOD
    abs_s, abs_e = base + ss, base + es
    run_end = np.maximum.accumulate(abs_e)
    new_isl = np.r_[True, abs_s[1:] > run_end[:-1]]
    island = np.cumsum(new_isl) - 1
    starts_idx = np.flatnonzero(new_isl)
    isl_end = np.zeros(island[-1] + 1, dtype=np.int64)
    np.maximum.at(isl_end, island, es)
    return pd.DataFrame(
        {"key": ks[starts_idx], "span_start": ss[starts_idx], "span_end": isl_end}
    )


def span_dedup(
    ds: ray.data.Dataset,
    text_col: str,
    key_col: str,
    *,
    w: int = 8,
    as_dataset: bool = False,
) -> pd.DataFrame | ray.data.Dataset:
    """Drop-span table for repeated ``w``-token windows: one row per
    merged span ``(key, span_start, span_end)`` (token indices, end
    exclusive) that duplicates content first seen at a smaller
    (key, pos). Deterministic; spans are duplicate-bounded.

    Returns a driver DataFrame by default (the span table is the
    duplicate-bounded artifact the drop-set pattern broadcasts); feed
    it to ``apply_span_dedup`` to produce cleaned text. For corpora
    whose duplicate volume itself outgrows the driver (boilerplate-
    heavy web text can repeat half its tokens), ``as_dataset=True``
    keeps the merge distributed too — loser occurrences shuffle by
    key-bucket and each bucket merges vectorized (``_merge_spans`` is
    key-aware, so a bucket of whole keys merges correctly) — and
    returns a Dataset with the identical rows.
    """
    window_rows = ds.map_batches(
        lambda t: _window_rows(t, text_col, key_col, w),
        batch_format="pyarrow",
    ).materialize()

    losers_ds: ray.data.Dataset | None = None
    if window_rows.count() <= SMALL_INPUT_WINDOW_ROWS:
        wdf = window_rows.to_pandas()
        wh = wdf["whash"].to_numpy()
        pk = wdf["packed"].to_numpy()
        order = np.lexsort((pk, wh))
        wh_s, pk_s = wh[order], pk[order]
        first = np.r_[True, wh_s[1:] != wh_s[:-1]]
        losers = pk_s[~first]
    else:
        # ONE exchange, then a vectorized per-bucket reduce that emits
        # losers directly. A per-hash native aggregate is the wrong
        # shape here: distinct windows ~ corpus tokens, so a
        # 25M-group aggregate spent minutes in the grouping machinery
        # (measured 154 s at 100k docs) where a coarse hash-bucket sort
        # + one lexsort per ~2M-row bucket takes seconds. Bucket count
        # scales with the row count so a bucket's occurrence list stays
        # task-sized regardless of corpus size; skew is impossible by
        # construction (buckets key on the top hash bits of a uniform
        # 64-bit hash, and no single window content can overflow a
        # bucket because equal windows share one hash -> one bucket,
        # counted once in the row total).
        n_rows = window_rows.count()
        n_buckets = max(32, int(n_rows // 2_000_000) + 1)

        def _bucket(t: pa.Table) -> pa.Table:
            wh = t["whash"].to_numpy(zero_copy_only=False)
            b = (wh.view(np.uint64) >> np.uint64(32)) % np.uint64(n_buckets)
            return t.append_column("bucket", pa.array(b.astype(np.int32)))

        def _bucket_losers(group: pa.Table) -> pa.Table:
            wh = group["whash"].to_numpy(zero_copy_only=False)
            pk = group["packed"].to_numpy(zero_copy_only=False)
            order = np.lexsort((pk, wh))
            wh_s, pk_s = wh[order], pk[order]
            first = np.r_[True, wh_s[1:] != wh_s[:-1]]
            return pa.table({"packed": pa.array(pk_s[~first], type=pa.int64())})

        losers_ds = (
            window_rows.map_batches(_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(_bucket_losers, batch_format="pyarrow")
        )
        if not as_dataset:
            losers = losers_ds.to_pandas()["packed"].to_numpy()

    if not as_dataset:
        keys = losers // POS_MOD
        starts = losers % POS_MOD
        return _merge_spans(keys, starts, w).rename(
            columns={"key": key_col}
        ).sort_values([key_col, "span_start"]).reset_index(drop=True)

    # distributed merge: shuffle loser occurrences by KEY bucket (all
    # of one document's spans land in one bucket) and run the same
    # vectorized key-aware island merge per bucket
    if losers_ds is None:
        losers_ds = ray.data.from_arrow(
            pa.table({"packed": pa.array(losers, type=pa.int64())})
        )
    n_key_buckets = 256

    def _key_bucket(t: pa.Table) -> pa.Table:
        pk = t["packed"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "kb", pa.array(((pk // POS_MOD) % n_key_buckets).astype(np.int32))
        )

    def _merge_bucket(group: pa.Table) -> pa.Table:
        pk = group["packed"].to_numpy(zero_copy_only=False)
        out = _merge_spans(pk // POS_MOD, pk % POS_MOD, w)
        return pa.table(
            {
                key_col: pa.array(out["key"].to_numpy()),
                "span_start": pa.array(out["span_start"].to_numpy()),
                "span_end": pa.array(out["span_end"].to_numpy()),
            }
        )

    return (
        losers_ds.map_batches(_key_bucket, batch_format="pyarrow")
        .groupby("kb")
        .map_groups(_merge_bucket, batch_format="pyarrow")
    )


def apply_span_dedup(
    ds: ray.data.Dataset,
    spans: pd.DataFrame,
    text_col: str,
    key_col: str,
) -> ray.data.Dataset:
    """Cut the drop spans out of each document (tokens outside spans,
    re-joined with single spaces) — broadcast span table (duplicate-
    bounded), pure map."""
    by_key: dict = {}
    for key, s, e in zip(
        spans[key_col].to_numpy(),
        spans["span_start"].to_numpy(),
        spans["span_end"].to_numpy(),
    ):
        by_key.setdefault(int(key), []).append((int(s), int(e)))
    spans_ref = ray.put(by_key)

    def _cut(batch: pa.Table) -> pa.Table:
        table = ray.get(spans_ref)
        out = []
        for key, text in zip(
            batch[key_col].to_pylist(), batch[text_col].to_pylist()
        ):
            cuts = table.get(key)
            if not cuts:
                out.append(text)
                continue
            toks = (text or "").split()
            drop = np.zeros(len(toks), dtype=bool)
            for s, e in cuts:
                drop[s:e] = True
            out.append(" ".join(t for t, d in zip(toks, drop) if not d))
        return batch.set_column(
            batch.schema.get_field_index(text_col), text_col, pa.array(out)
        )

    return ds.map_batches(_cut, batch_format="pyarrow")
