"""Corpus-curation operators for training-data pipelines.

Operators a 100-TB curation run needs between extraction and
training-set export (reference scope: the builder stops at extraction +
filtering — these extend the engine the same way the dedup family does;
semantic anchors are the reference's pass/fail record gating,
e.g. tesseract/processing.py's per-record skip logic, generalized to
corpus-level policies):

* ``stratified_sample`` — deterministic per-group quota sampling.
  Keep a row iff its key's multiplicative-hash ticket falls under the
  group's fraction. Embarrassingly parallel (no shuffle, no state), and
  the ticket is plain integer arithmetic, so the exact same sample is
  reproducible anywhere — including in SQL for the oracle.
* ``quality_percentile_filter`` — keep the top ``keep_frac`` of every
  group by ``(score DESC, key ASC)``, EXACT order statistics without
  sorting the corpus: per-group Count/Min/Max (native aggregate), a
  bucketed score histogram (native aggregate), then a driver collect of
  ONLY the boundary bucket (expected group_size/n_buckets rows;
  tie-heavy degenerate groups collapse to one bucket and are collected
  whole — documented tie-bounded). The kept set is defined by a
  broadcast per-group cutoff pair, so the payload never shuffles.
* ``pack_sequences`` — greedy fixed-budget sequence packing (the
  training-side step after curation: concatenate documents into
  ~constant-cost training sequences). Inherently sequential PER SHARD
  (the greedy fold is order-defined), parallel across shards: only the
  skinny (group, key, size) columns enter the per-group fold, never the
  payload.

Plus two selection utilities built on the same machinery:
``fixed_size_sample`` (exactly k per group — the k smallest hash
tickets, a reservoir sample without the reservoir) and ``top_tokens``
(exact corpus-wide top-k token frequencies via per-batch partial
counts + native Sum).

Scale notes: stratified_sample is a pure map. quality_percentile_filter
moves only (group, bucket) count rows through its aggregates — driver
state is n_groups x n_buckets integers. pack_sequences' map_groups
carries ~16 bytes/row; a 10^9-doc shard folds in seconds. top_tokens
shuffles per-batch vocabularies, not tokens.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Max, Min

# Knuth's multiplicative constant: floor(2^32 / golden ratio), coprime
# with 2^32 — the map key -> (key * K) mod 2^32 is a bijection on
# 32-bit ints, so tickets are uniform over any key set
KNUTH_32 = 2654435761
TICKET_MOD = 1 << 32


def sample_ticket(keys: np.ndarray) -> np.ndarray:
    """uint64 ticket in [0, 2^32) per integer key — the deterministic
    coin for quota sampling. Exactly ``(key * 2654435761) % 2^32``,
    reproducible in any engine with 64-bit integer arithmetic."""
    return (keys.astype(np.uint64) * np.uint64(KNUTH_32)) % np.uint64(TICKET_MOD)


def _check_no_null_groups(batch: pa.Table, group_col: str, op: str) -> None:
    """Loud error for null group values: ``np.unique`` over a mixed
    None/str object array raises an opaque TypeError deep inside a Ray
    task — a plausible state for web-crawl language/domain columns
    (same contract as ``train_nb_classifier``'s label check)."""
    col = batch[group_col]
    nulls = col.null_count if hasattr(col, "null_count") else 0
    if nulls:
        raise ValueError(
            f"{op}: {nulls} null values in group column {group_col!r}; "
            "filter or impute null-group rows first"
        )


def stratified_sample(
    ds: ray.data.Dataset,
    group_col: str,
    key_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> ray.data.Dataset:
    """Deterministic per-group quota sample: keep a row iff
    ``ticket(key) < floor(fraction[group] * 2^32)``.

    Stateless pure map — the fractions dict rides in the task closure
    (tiny); no shuffle, no driver state, identical output at any
    parallelism. ``key_col`` must be integral and unique (the engine's
    standard key precondition, see stages/dedup.py).
    """
    thresholds = {
        g: int(math.floor(f * TICKET_MOD)) for g, f in fractions.items()
    }
    default_thr = int(math.floor(default_fraction * TICKET_MOD))

    def _filter(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        tickets = sample_ticket(keys)
        _check_no_null_groups(batch, group_col, "stratified_sample")
        groups, inverse = np.unique(
            np.asarray(batch[group_col].to_pylist(), dtype=object),
            return_inverse=True,
        )
        thr_per_group = np.array(
            [thresholds.get(g, default_thr) for g in groups], dtype=np.uint64
        )
        keep = tickets < thr_per_group[inverse]
        return batch.filter(pa.array(keep))

    return ds.map_batches(_filter, batch_format="pyarrow")


def group_topk_cutoffs(
    ds: ray.data.Dataset,
    group_col: str,
    score_col: str,
    key_col: str,
    keep_frac: float | None,
    n_buckets: int = 4096,
    fixed_k: int | dict | None = None,
) -> dict:
    """Per-group cutoff pair ``(score_t, key_t)`` such that exactly
    ``k_g`` rows per group satisfy
    ``score > score_t OR (score == score_t AND key <= key_t)``
    under the total order (score DESC, key ASC), where ``k_g`` is
    ``ceil(keep_frac * n_g)`` or ``min(fixed_k, n_g)``.

    Exact selection without a corpus sort:
    1. native per-group Count/Min/Max of the score (driver gets
       n_groups rows);
    2. native per-(group, bucket) Count over a linear score bucketing
       (driver gets <= n_groups * n_buckets ints) — locates the bucket
       containing the k-th row;
    3. collect ONLY that boundary bucket's (score, key) rows per group
       (expected n_g / n_buckets; a group whose scores all tie
       collapses to one bucket and is collected whole) and cut exactly.
    Bucket assignment is a pure function of the score, so every row
    with the cutoff score lands in the boundary bucket — the cutoff
    pair is globally correct, not just within the bucket.

    The three passes run over a materialized SKINNY projection
    (group, score, key — ~tens of bytes/row, object-store-spillable):
    a lazy Dataset re-executes its whole upstream per consumer, so
    without this a computed score column (e.g. the q60 logprob chain)
    would be recomputed three times.
    """
    need = list(dict.fromkeys([group_col, score_col, key_col]))
    from ray.data.dataset import MaterializedDataset

    # a caller (mix_to_proportions) may hand us an already-materialized
    # skinny projection — don't hold a second copy in the object store
    if not (
        isinstance(ds, MaterializedDataset)
        and set(ds.schema().names) == set(need)
    ):
        ds = ds.select_columns(need).materialize()
    stats = {
        r[group_col]: (r["count()"], r[f"min({score_col})"], r[f"max({score_col})"])
        for r in ds.groupby(group_col)
        .aggregate(Count(), Min(score_col), Max(score_col))
        .take_all()
    }
    if isinstance(fixed_k, dict):
        # per-group quota (groups absent from the dict are dropped)
        k = {
            g: min(int(fixed_k.get(g, 0)), int(n))
            for g, (n, _, _) in stats.items()
        }
    elif fixed_k is not None:
        k = {g: min(int(fixed_k), int(n)) for g, (n, _, _) in stats.items()}
    else:
        k = {g: int(math.ceil(keep_frac * n)) for g, (n, _, _) in stats.items()}

    spans = {
        g: (float(lo), float(hi) - float(lo) or 1.0) for g, (_, lo, hi) in stats.items()
    }

    def _bucket_of(group_vals, score_vals) -> np.ndarray:
        lo = np.array([spans[g][0] for g in group_vals])
        width = np.array([spans[g][1] for g in group_vals])
        b = np.floor((score_vals - lo) / width * n_buckets).astype(np.int64)
        return np.clip(b, 0, n_buckets - 1)

    def _add_bucket(batch: pa.Table) -> pa.Table:
        gv = batch[group_col].to_pylist()
        sv = batch[score_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return batch.append_column("__bucket", pa.array(_bucket_of(gv, sv)))

    hist_rows = (
        ds.map_batches(_add_bucket, batch_format="pyarrow")
        .groupby([group_col, "__bucket"])
        .aggregate(Count())
        .take_all()
    )
    hist: dict = {}
    for r in hist_rows:
        hist.setdefault(r[group_col], {})[r["__bucket"]] = r["count()"]

    # walk buckets from the top score down; b* = first bucket where the
    # running count reaches k_g
    boundary: dict = {}
    above: dict = {}
    for g, counts in hist.items():
        need = k[g]
        if need <= 0:  # keep_frac rounds to nothing — group fully dropped
            continue
        run = 0
        for b in sorted(counts, reverse=True):
            if run + counts[b] >= need:
                boundary[g] = b
                above[g] = run
                break
            run += counts[b]

    bset = {(g, b) for g, b in boundary.items()}

    def _boundary_rows(batch: pa.Table) -> pa.Table:
        gv = batch[group_col].to_pylist()
        sv = batch[score_col].to_numpy(zero_copy_only=False).astype(np.float64)
        bv = _bucket_of(gv, sv)
        keep = np.array([(g, b) in bset for g, b in zip(gv, bv)])
        return batch.filter(pa.array(keep)).select([group_col, score_col, key_col])

    bdf = ds.map_batches(_boundary_rows, batch_format="pyarrow").to_pandas()

    cutoffs: dict = {}
    for g, sub in bdf.groupby(group_col, sort=False):
        m = k[g] - above[g]  # rows still needed from the boundary bucket
        sub = sub.sort_values(
            [score_col, key_col], ascending=[False, True], kind="mergesort"
        )
        row = sub.iloc[m - 1]
        cutoffs[g] = (row[score_col], row[key_col])
    return cutoffs


def cutoff_filter(
    ds: ray.data.Dataset,
    group_col: str,
    score_col: str,
    key_col: str,
    cutoffs: dict,
) -> ray.data.Dataset:
    """Broadcast-cutoff filter: keep rows with ``score > s_t OR
    (score == s_t AND key <= k_t)`` for their group's cutoff pair;
    groups absent from ``cutoffs`` are dropped entirely."""

    def _filter(batch: pa.Table) -> pa.Table:
        sv = batch[score_col].to_numpy(zero_copy_only=False)
        kv = batch[key_col].to_numpy(zero_copy_only=False)
        _check_no_null_groups(batch, group_col, "cutoff_filter")
        groups, inverse = np.unique(
            np.asarray(batch[group_col].to_pylist(), dtype=object),
            return_inverse=True,
        )
        # vectorized per-group cutoff compare; groups without a cutoff
        # (dropped entirely) get an impossible (inf, -inf) sentinel
        s_t = np.array(
            [cutoffs.get(g, (np.inf, None))[0] for g in groups], dtype=np.float64
        )[inverse]
        k_t_list = [cutoffs.get(g, (None, None))[1] for g in groups]
        has_cut = np.array([t is not None for t in k_t_list])[inverse]
        k_t = np.array(
            [t if t is not None else 0 for t in k_t_list], dtype=kv.dtype
        )[inverse]
        svf = sv.astype(np.float64)
        keep = has_cut & ((svf > s_t) | ((svf == s_t) & (kv <= k_t)))
        return batch.filter(pa.array(keep))

    return ds.map_batches(_filter, batch_format="pyarrow")


def quality_percentile_filter(
    ds: ray.data.Dataset,
    group_col: str,
    score_col: str,
    key_col: str,
    keep_frac: float,
    n_buckets: int = 4096,
) -> ray.data.Dataset:
    """Keep exactly the top ``ceil(keep_frac * n_g)`` rows of each group
    under (score DESC, key ASC) — equivalent to SQL's
    ``row_number() OVER (PARTITION BY g ORDER BY score DESC, key)
    <= ceil(frac * n_g)`` — via broadcast per-group cutoffs
    (``group_topk_cutoffs``); the payload never shuffles."""
    cutoffs = group_topk_cutoffs(
        ds, group_col, score_col, key_col, keep_frac, n_buckets
    )
    return cutoff_filter(ds, group_col, score_col, key_col, cutoffs)


def _with_neg_ticket(ds: ray.data.Dataset, key_col: str) -> ray.data.Dataset:
    """Append the negated multiplicative-hash ticket (a pure function
    of the key, so recomputable on any pass) as ``__neg_ticket``."""

    def _add_ticket(batch: pa.Table) -> pa.Table:
        tick = sample_ticket(batch[key_col].to_numpy(zero_copy_only=False))
        return batch.append_column(
            "__neg_ticket", pa.array(-(tick.astype(np.int64)))
        )

    return ds.map_batches(_add_ticket, batch_format="pyarrow")


def fixed_size_sample(
    ds: ray.data.Dataset,
    group_col: str,
    key_col: str,
    k: int | dict,
    n_buckets: int = 4096,
) -> ray.data.Dataset:
    """Deterministic fixed-size sample: exactly ``min(k, n_g)`` rows
    per group — the k SMALLEST multiplicative-hash tickets (ties by key
    ascending), i.e. SQL's ``row_number() OVER (PARTITION BY g ORDER BY
    ticket, key) <= k``. A seeded reservoir sample without the
    reservoir: the ticket order is a fixed random permutation of any
    key set, selection is the same exact order-statistics machinery as
    ``quality_percentile_filter`` (negated ticket as the score), and
    the result is independent of partitioning, parallelism, and row
    order."""

    with_ticket = _with_neg_ticket(ds, key_col)
    cutoffs = group_topk_cutoffs(
        with_ticket,
        group_col,
        "__neg_ticket",
        key_col,
        None,
        n_buckets,
        fixed_k=k,
    )
    return cutoff_filter(
        with_ticket, group_col, "__neg_ticket", key_col, cutoffs
    ).drop_columns(["__neg_ticket"])


def top_tokens(
    ds: ray.data.Dataset,
    text_col: str,
    k: int = 50,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Exact corpus-wide top-k most frequent whitespace tokens
    (count DESC, token ASC).

    Three stages, none token-shaped past the first map:
    1. per-batch partial counts (all-Arrow: utf8_split_whitespace +
       value_counts — one row per distinct token per batch, bounded by
       the batch's vocabulary, not its token count);
    2. ONE exchange by coarse token-hash bucket + a vectorized pandas
       sum/top-k per bucket. A per-token native aggregate makes one
       group per vocabulary entry and its grouping machinery dominated
       the run (80 s of an 86 s total at 100k docs / 253k vocab);
       ~n_buckets groups cost nothing. Equal tokens share a bucket, so
       each bucket's top-k is exact and globally sufficient;
    3. a driver merge of n_buckets * k candidate rows.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import stable_hash64_array

    def _partial(batch: pa.Table) -> pa.Table:
        # utf8_split_whitespace matches Python str.split() except for
        # the empty strings it emits at leading/trailing whitespace,
        # which the filter drops
        toks = pc.list_flatten(pc.utf8_split_whitespace(batch[text_col]))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = pc.value_counts(toks)
        tokens = vc.field("values")
        bucket = stable_hash64_array(tokens.to_pylist()) % np.uint64(n_buckets)
        return pa.table(
            {
                "token": tokens,
                "n": pc.cast(vc.field("counts"), pa.int64()),
                "bucket": pa.array(bucket.astype(np.int32)),
            }
        )

    def _bucket_topk(group: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "token": group["token"].to_pylist(),
                "n": group["n"].to_numpy(zero_copy_only=False),
            }
        )
        summed = df.groupby("token", sort=False, as_index=False)["n"].sum()
        summed = summed.sort_values(
            ["n", "token"], ascending=[False, True], kind="mergesort"
        ).head(k)
        return pa.table(
            {
                "token": pa.array(summed["token"].to_numpy(dtype=object), pa.string()),
                "n": pa.array(summed["n"].to_numpy(), pa.int64()),
            }
        )

    cand = (
        # batch_size=None: whole blocks. The partial-count row volume
        # (and the per-batch vocab hashing) scales with the NUMBER of
        # batches x vocabulary, so bigger batches shrink the exchange
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=None)
        .groupby("bucket")
        .map_groups(_bucket_topk, batch_format="pyarrow")
        .to_pandas()
    )
    top = cand.sort_values(
        ["n", "token"], ascending=[False, True], kind="mergesort"
    ).head(k)
    return ray.data.from_arrow(
        pa.table(
            {
                "token": pa.array(top["token"].to_numpy(dtype=object), pa.string()),
                "n": pa.array(top["n"].to_numpy(), pa.int64()),
            }
        )
    )


def pack_sequences(
    ds: ray.data.Dataset,
    group_col: str,
    key_col: str,
    size_col: str,
    max_size: int,
) -> ray.data.Dataset:
    """Greedy sequence packing: within each group, walk rows in
    ``key_col`` ascending order and append each row to the current
    sequence while the running size stays <= ``max_size``; otherwise
    start a new sequence. A row larger than ``max_size`` gets a
    sequence of its own (the fit test fails for it and for whatever
    follows it). Emits (group, key, size, seq_id, seq_pos).

    The greedy fold is order-DEFINED, hence sequential per group — but
    only the three skinny columns enter the fold (select before the
    groupby), groups pack in parallel, and the per-row work is two
    integer ops. Shard the corpus into as many groups as you want
    parallelism (the natural group is the output partition).
    """

    def _pack(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(key_col, kind="mergesort").reset_index(drop=True)
        sizes = group[size_col].to_numpy()
        seq_ids = np.empty(len(sizes), dtype=np.int64)
        seq_pos = np.empty(len(sizes), dtype=np.int64)
        sid, pos, acc = 0, 0, 0
        for i, n in enumerate(sizes):
            n = int(n)
            if i > 0 and acc + n > max_size:
                sid += 1
                pos = 0
                acc = 0
            seq_ids[i] = sid
            seq_pos[i] = pos
            acc += n
            pos += 1
        group["seq_id"] = seq_ids
        group["seq_pos"] = seq_pos
        return group

    return (
        ds.select_columns([group_col, key_col, size_col])
        .groupby(group_col)
        .map_groups(_pack, batch_format="pandas")
    )


def group_quantiles(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    qs: list[float],
    n_buckets: int = 4096,
) -> pd.DataFrame:
    """EXACT per-group discrete quantiles (SQL ``quantile_disc`` /
    ``percentile_disc`` semantics: the value at 1-indexed position
    ``ceil(q * n)`` of the ascending order, position 1 for q = 0) —
    without sorting the corpus.

    Same order-statistics plan as ``group_topk_cutoffs``: native
    Count/Min/Max, a native (group, bucket) histogram over a linear
    score bucketing, then a collect of ONLY the boundary buckets that
    contain a requested position (expected n_g / n_buckets rows each;
    an all-ties group collapses to one bucket and is collected whole —
    tie-bounded, as documented there). One histogram exchange serves
    every requested quantile. Returns a DataFrame with one row per
    group and one ``q{...}`` column per requested quantile; the values
    are exact elements of the data (no interpolation), so they compare
    bit-exactly against a SQL oracle.

    As in ``group_topk_cutoffs``, the passes run over a materialized
    skinny (group, value) projection so a computed upstream executes
    once, not once per pass.
    """
    need = list(dict.fromkeys([group_col, value_col]))
    from ray.data.dataset import MaterializedDataset

    if not (
        isinstance(ds, MaterializedDataset)
        and set(ds.schema().names) == set(need)
    ):
        ds = ds.select_columns(need).materialize()
    stats = {
        r[group_col]: (r["count()"], r[f"min({value_col})"], r[f"max({value_col})"])
        for r in ds.groupby(group_col)
        .aggregate(Count(), Min(value_col), Max(value_col))
        .take_all()
    }
    spans = {
        g: (float(lo), float(hi) - float(lo) or 1.0)
        for g, (_, lo, hi) in stats.items()
    }
    # 1-indexed target positions per group per quantile
    targets = {
        g: [max(1, int(math.ceil(q * n))) for q in qs]
        for g, (n, _, _) in stats.items()
    }

    def _bucket_of(group_vals, vals) -> np.ndarray:
        lo = np.array([spans[g][0] for g in group_vals])
        width = np.array([spans[g][1] for g in group_vals])
        b = np.floor((vals - lo) / width * n_buckets).astype(np.int64)
        return np.clip(b, 0, n_buckets - 1)

    def _add_bucket(batch: pa.Table) -> pa.Table:
        gv = batch[group_col].to_pylist()
        sv = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return batch.append_column("__bucket", pa.array(_bucket_of(gv, sv)))

    hist_rows = (
        ds.map_batches(_add_bucket, batch_format="pyarrow")
        .groupby([group_col, "__bucket"])
        .aggregate(Count())
        .take_all()
    )
    hist: dict = {}
    for r in hist_rows:
        hist.setdefault(r[group_col], {})[r["__bucket"]] = r["count()"]

    # ascending walk: for each target position, the bucket holding it
    # and the count strictly below that bucket
    boundary: dict = {}  # (g, qi) -> (bucket, below)
    bset: set = set()
    for g, counts in hist.items():
        run = 0
        remaining = sorted(counts)
        ti = sorted(range(len(qs)), key=lambda i: targets[g][i])
        pos_iter = iter(ti)
        cur = next(pos_iter, None)
        for b in remaining:
            c = counts[b]
            while cur is not None and targets[g][cur] <= run + c:
                boundary[(g, cur)] = (b, run)
                bset.add((g, b))
                cur = next(pos_iter, None)
            run += c
            if cur is None:
                break

    def _boundary_rows(batch: pa.Table) -> pa.Table:
        gv = batch[group_col].to_pylist()
        sv = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        bv = _bucket_of(gv, sv)
        keep = np.array(
            [(g, b) in bset for g, b in zip(gv, bv)], dtype=bool
        )
        return batch.filter(pa.array(keep)).select([group_col, value_col])

    bdf = ds.map_batches(_boundary_rows, batch_format="pyarrow").to_pandas()

    out_rows = []
    for g in sorted(stats):
        row = {group_col: g}
        sub = bdf[bdf[group_col] == g]
        vals = np.sort(sub[value_col].to_numpy())
        buckets = _bucket_of([g] * len(vals), vals.astype(np.float64))
        for qi, q in enumerate(qs):
            b, below = boundary[(g, qi)]
            in_b = vals[buckets == b]
            row[f"q{q}"] = in_b[targets[g][qi] - below - 1]
        out_rows.append(row)
    return pd.DataFrame(out_rows)


def mix_to_proportions(
    ds: ray.data.Dataset,
    group_col: str,
    key_col: str,
    proportions: dict,
    n_buckets: int = 4096,
) -> ray.data.Dataset:
    """Deterministic dataset mixing: down-sample groups toward the
    target ``proportions`` (a DoReMi/Pile-style source-mix recipe)
    with NO upsampling. The binding group (smallest ``n_g / p_g``)
    sizes the output: ``n_target = floor(n_bind / p_bind)``, and
    EVERY group — including the binding one — keeps its
    ``floor(p_g * n_target)`` smallest hash tickets (the same
    reservoir-free selection as ``fixed_size_sample``, so the mix is
    independent of partitioning and row order). The double floor can
    shave up to ``1/p_g`` rows off the binding group relative to
    "kept whole" (e.g. n={a:10,b:90}, p={a:.3,b:.7} keeps 9 of a's 10
    rows); each group's achieved share is within one row of
    ``p_g``/sum(floors). This exact quota rule is pinned by the
    q54/q71 oracles. Groups absent from ``proportions`` (or with
    p <= 0) are dropped.

    Scale shape: one skinny Count aggregate to size the mix, then the
    order-statistics cutoff machinery — the payload never shuffles.
    """
    # one materialized skinny (group, key, ticket) serves the count
    # aggregate AND the cutoff machinery, so the (possibly expensive)
    # upstream chain executes twice in total: skinny + final filter
    skinny = _with_neg_ticket(
        ds.select_columns(list(dict.fromkeys([group_col, key_col]))), key_col
    ).materialize()
    counts = {
        r[group_col]: int(r["count()"])
        for r in skinny.groupby(group_col).aggregate(Count()).take_all()
    }
    present = {
        g: float(p) for g, p in proportions.items() if g in counts and p > 0
    }
    if not present:
        return ds.filter(lambda _: False)
    n_target = min(int(math.floor(counts[g] / p)) for g, p in present.items())
    ks = {g: int(math.floor(p * n_target)) for g, p in present.items()}
    cutoffs = group_topk_cutoffs(
        skinny, group_col, "__neg_ticket", key_col, None, n_buckets, fixed_k=ks
    )
    return cutoff_filter(
        _with_neg_ticket(ds, key_col), group_col, "__neg_ticket", key_col, cutoffs
    ).drop_columns(["__neg_ticket"])


def hash_split(
    ds: ray.data.Dataset,
    key_col: str,
    fractions: dict[str, float],
    *,
    out_col: str = "split",
) -> ray.data.Dataset:
    """Deterministic train/val/test split: each row gets the label
    whose cumulative ticket range its key hashes into — pure map, no
    seed state, reproducible in any engine with 64-bit arithmetic
    (the ``sample_ticket`` coin shared by every sampler here).

    ``fractions`` must sum to <= 1; keys hashing past the last
    boundary get ``None`` (dropped by a downstream filter, or caught
    by making the fractions sum to 1). A document's split NEVER
    changes when the corpus grows — the property a by-position split
    lacks and the reason eval contamination survives repartitioning.
    """
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"hash_split: fractions sum to {total} > 1")
    neg = {n: f for n, f in fractions.items() if f < 0}
    if neg:
        # a negative fraction makes the cumsum bounds non-monotonic,
        # silently breaking searchsorted's sorted-input precondition
        raise ValueError(f"hash_split: negative fractions {neg}")
    names = list(fractions)
    bounds = np.floor(
        np.cumsum([fractions[n] for n in names]) * TICKET_MOD
    ).astype(np.uint64)
    if abs(total - 1.0) < 1e-9:
        # fractions meant to cover everything: float cumsum error
        # (0.7+0.1+0.2 = 0.9999999999999999) must not leave the top
        # ticket values split-less
        bounds[-1] = TICKET_MOD

    def _tag(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        tick = sample_ticket(keys)
        idx = np.searchsorted(bounds, tick, side="right")
        lab = np.where(
            idx < len(names),
            np.array(names + [""], dtype=object)[
                np.minimum(idx, len(names) - 1)
            ],
            None,
        )
        return t.append_column(out_col, pa.array(lab, type=pa.string()))

    return ds.map_batches(_tag, batch_format="pyarrow")


def temperature_mix(
    ds: ray.data.Dataset,
    group_col: str,
    key_col: str,
    *,
    alpha: float = 0.3,
    n_buckets: int = 4096,
) -> ray.data.Dataset:
    """Temperature-based source mixing: derive the target proportions
    ``p_g ∝ (n_g)^alpha`` from the observed group sizes and mix to them
    (the multilingual up/down-weighting rule of XLM-R / mT5, Conneau et
    al. 2020 §3.1, Xue et al. 2021 — public papers; here without
    upsampling, so flattening means the LARGE groups shrink toward the
    small ones).

    ``alpha=1`` reproduces the input proportions (no rows dropped);
    ``alpha=0`` is a uniform mix (every group cut to the smallest).
    One extra skinny Count pass derives the proportions; selection
    itself is :func:`mix_to_proportions` (deterministic hash-ticket
    order statistics, payload never shuffles).
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"temperature_mix: alpha must be in [0, 1], got {alpha}")
    if alpha == 1.0:
        # identity by definition — short-circuit rather than risk a
        # float-floor dropping a row through the proportions machinery
        return ds
    counts = {
        r[group_col]: int(r["count()"])
        for r in ds.select_columns([group_col])
        .groupby(group_col)
        .aggregate(Count())
        .take_all()
    }
    if not counts:
        return ds
    weights = {g: float(n) ** alpha for g, n in counts.items()}
    # sum in sorted-group order: take_all()'s row order is not
    # guaranteed, and the float total must not depend on it
    total = sum(weights[g] for g in sorted(weights, key=str))
    proportions = {g: w / total for g, w in weights.items()}
    return mix_to_proportions(
        ds, group_col, key_col, proportions, n_buckets=n_buckets
    )


def chunk_documents(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    key_col: str = "doc_id",
    window: int = 32,
    stride: int = 24,
) -> ray.data.Dataset:
    """Overlapping fixed-token-window chunking for training/embedding.

    Splits each document into token windows of ``window`` tokens
    starting every ``stride`` tokens (``stride <= window`` so the whole
    document is covered; the tail window is short). Emits
    ``(key, chunk_id, chunk_text, n_tokens)`` — the standard
    context-window chunking step before embedding or sequence packing.

    Chunk count for an n-token document is
    ``1 + ceil(max(n - window, 0) / stride)``; empty/whitespace-only
    documents emit nothing. A pure per-batch flat map — no shuffle, no
    state; output size is ~``window/stride`` x input. The per-row loop
    is the string-assembly kernel itself (the work IS the join), same
    contract as the extraction parser kernels.
    """
    if stride <= 0 or stride > window:
        raise ValueError("chunk_documents requires 0 < stride <= window")

    def _chunk(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        texts = batch[text_col].to_pylist()
        out_k: list[int] = []
        out_i: list[int] = []
        out_t: list[str] = []
        out_n: list[int] = []
        for key, txt in zip(keys, texts):
            toks = (txt or "").split()
            n = len(toks)
            if n == 0:
                continue
            n_chunks = 1 + max(0, -(-(n - window) // stride))
            for i in range(n_chunks):
                s = i * stride
                piece = toks[s : s + window]
                out_k.append(key)
                out_i.append(i)
                out_t.append(" ".join(piece))
                out_n.append(len(piece))
        return pa.table(
            {
                key_col: pa.array(out_k, pa.int64()),
                "chunk_id": pa.array(out_i, pa.int64()),
                "chunk_text": pa.array(out_t, pa.string()),
                "n_tokens": pa.array(out_n, pa.int64()),
            }
        )

    return ds.map_batches(_chunk, batch_format="pyarrow")


# -- url-keyed curation (web-corpus hygiene) -------------------------------


def add_domain_column(
    ds: ray.data.Dataset,
    *,
    url_col: str = "url",
    out_col: str = "domain",
) -> ray.data.Dataset:
    """Append the registrable domain (eTLD+1) of ``url_col`` — the
    per-site grouping key for caps / mixing / stats. Pure map; the
    per-row suffix walk is the string kernel (functions/urltools.py)."""
    from ..functions.urltools import registrable_domains

    def _add(batch: pa.Table) -> pa.Table:
        doms = registrable_domains(batch[url_col].to_pylist())
        return batch.append_column(out_col, pa.array(doms, pa.string()))

    return ds.map_batches(_add, batch_format="pyarrow")


def domain_cap(
    ds: ray.data.Dataset,
    k: int | dict,
    *,
    url_col: str = "url",
    key_col: str | None = None,
    n_buckets: int = 4096,
    keep_domain_col: bool = True,
) -> ray.data.Dataset:
    """Keep at most ``k`` documents per registrable domain — the
    standard anti-domination cap (no site may dominate the corpus).

    Selection is :func:`fixed_size_sample` grouped on the domain: the
    k smallest deterministic hash tickets per domain survive, so the
    result is a seeded uniform within-domain sample, independent of
    partitioning and row order, with the same exact order-statistics
    machinery (no corpus sort, driver state bounded by
    domains x buckets). ``k`` may be a dict ``{domain: k}`` for
    per-site quotas — un-listed domains get 0 and are dropped
    (``fixed_size_sample``'s dict contract, same as
    ``mix_to_proportions`` quota behavior).

    ``key_col`` defaults to the url itself; a string key is hashed to
    a stable int64 (blake2b-8) because the whole ticket/selection
    machinery runs on integer keys — ties then break by hash order,
    still fully deterministic.
    """
    key_col = key_col or url_col
    with_dom = add_domain_column(ds, url_col=url_col, out_col="__domain")
    drop_cols = []
    if not pa.types.is_integer(
        with_dom.schema().base_schema.field(key_col).type
    ):
        from ..functions.urltools import hash_nodes_int64

        str_key = key_col

        def _add_key(batch: pa.Table) -> pa.Table:
            ids = hash_nodes_int64(batch[str_key].to_pylist())
            return batch.append_column("__key_id", pa.array(ids, pa.int64()))

        with_dom = with_dom.map_batches(_add_key, batch_format="pyarrow")
        key_col = "__key_id"
        drop_cols = ["__key_id"]
    capped = fixed_size_sample(
        with_dom, "__domain", key_col, k, n_buckets=n_buckets
    )
    if drop_cols:
        capped = capped.drop_columns(drop_cols)
    if keep_domain_col:
        def _rename(batch: pa.Table) -> pa.Table:
            # an input that already carries a 'domain' column (e.g.
            # add_domain_column ran upstream) would otherwise yield a
            # duplicate-field schema that crashes the next by-name
            # access — drop the pre-existing one, ours is identical
            if "domain" in batch.schema.names:
                batch = batch.drop_columns(["domain"])
            i = batch.schema.get_field_index("__domain")
            return batch.rename_columns(
                [n if j != i else "domain" for j, n in enumerate(batch.schema.names)]
            )

        return capped.map_batches(_rename, batch_format="pyarrow")
    return capped.drop_columns(["__domain"])


def canonical_url_dedup(
    ds: ray.data.Dataset,
    *,
    url_col: str = "url",
    key_col: str,
) -> ray.data.Dataset:
    """Exact dedup on the CANONICAL url: tracking params, default
    ports, fragments and case differences collapse; per canonical
    form the row with the smallest ``key_col`` survives (``key_col``
    must be unique per row — the exact_dedup contract). The canonical
    string never leaves the skinny hash exchange; survivors are a
    broadcast key filter over the original stream."""
    from ..functions.urltools import canonicalize_urls
    from .dedup import exact_dedup

    def _add(batch: pa.Table) -> pa.Table:
        canon = canonicalize_urls(batch[url_col].to_pylist())
        return batch.append_column("__canon_url", pa.array(canon, pa.string()))

    with_canon = ds.map_batches(_add, batch_format="pyarrow")
    return exact_dedup(with_canon, "__canon_url", key_col).drop_columns(
        ["__canon_url"]
    )


# --- deterministic global shuffle ------------------------------------------


def shuffle_ticket(keys: np.ndarray, seed: int) -> np.ndarray:
    """uint64 shuffle ticket per integer key — a splitmix64-style mix
    of ``(key, seed)``. Pure integer arithmetic: the same (key, seed)
    gives the same ticket on any worker, any cluster size, any corpus
    partitioning — and a key's ticket never changes when the corpus
    grows (the growth-stable property ``hash_split`` relies on,
    extended to ORDER). Distinct from ``sample_ticket`` so sampling
    and shuffling don't correlate (a quota-sampled corpus would
    otherwise come out ticket-sorted-by-the-same-coin)."""
    # seed constant folded in Python ints (uint64 wraparound is intended;
    # numpy would warn on the overflowing scalar multiply)
    inc = np.uint64(((int(seed) + 1) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
    z = keys.astype(np.uint64) + inc
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def add_shuffle_ticket(
    ds: ray.data.Dataset,
    key_col: str,
    seed: int,
    *,
    out_col: str = "_shuffle_ord",
) -> ray.data.Dataset:
    """Append the deterministic shuffle ticket column (pure map).
    String keys hash through ``stable_hash64_array`` first; the ticket
    is stored as int64 (the uint64 bits reinterpreted) so downstream
    sorts and SQL oracles agree on one integer ordering."""
    from ..functions.hashing import stable_hash64_array

    def _add(t: pa.Table) -> pa.Table:
        col = t[key_col]
        if pa.types.is_integer(col.type):
            keys = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            keys = stable_hash64_array(
                [str(v) for v in col.to_pylist()]
            ).astype(np.uint64)
        tick = shuffle_ticket(keys, seed).view(np.int64)
        return t.append_column(out_col, pa.array(tick, type=pa.int64()))

    return ds.map_batches(_add, batch_format="pyarrow")


def deterministic_shuffle(
    ds: ray.data.Dataset,
    key_col: str,
    seed: int = 0,
    *,
    keep_ord_col: bool = False,
    ord_col: str = "_shuffle_ord",
) -> ray.data.Dataset:
    """Seeded global shuffle with a REPRODUCIBLE order: rows come out
    sorted by ``shuffle_ticket(key, seed)`` — uniform pseudo-random,
    but byte-identical at any parallelism, any cluster size, and any
    input partitioning, which ``Dataset.random_shuffle`` cannot
    promise. Changing ``seed`` gives an independent order; a training
    run that records its seed can replay its exact data order.

    The ticket is a pure function of the key, so ties happen only for
    duplicate keys (dedup upstream) or 64-bit collisions (~n^2/2^64);
    ``key_col`` is the secondary sort key so even those are ordered
    deterministically. Cost: one range-partition sort over the corpus
    — the same exchange ``Dataset.sort`` always costs; the payload
    moves once.

    ``keep_ord_col=True`` persists the ticket so a consumer reading
    multi-file output can re-establish the order with
    ``ORDER BY _shuffle_ord`` instead of trusting file enumeration.
    """
    out = add_shuffle_ticket(ds, key_col, seed, out_col=ord_col).sort(
        [ord_col, key_col]
    )
    if keep_ord_col:
        return out
    return out.drop_columns([ord_col])
