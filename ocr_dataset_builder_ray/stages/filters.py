"""Document-level repetition and contamination filters for webtext
curation.

Two operator families a training-data pipeline runs between extraction
and export (semantic anchor: the reference's per-record pass/fail
gating, e.g. tesseract/processing.py's skip logic, generalized to
published corpus-quality policies):

* ``repetition_signals`` / ``repetition_filter`` — Gopher-style
  (Rae et al. 2021, public paper) per-document repetition statistics:
  duplicate-word fraction (1 - distinct/total tokens) and top-bigram
  fraction (occurrences of the most frequent bigram / total bigrams).
  Fully vectorized per Arrow batch: whitespace split -> 64-bit token
  hashes -> lexsort run-length kernels. A pure map — no shuffle, no
  state; at 100 TB the cost is read bandwidth.
* ``benchmark_window_hashes`` / ``decontaminate`` — test-set
  decontamination: flag or drop corpus documents sharing any w-token
  window with a benchmark/eval set (the n-gram-overlap rule used for
  public LM training sets, e.g. the GPT-3 appendix-C dedup and The
  Pile's eval decontamination). The benchmark side is DRIVER-SIZED by
  contract (eval sets are MBs, not TBs): its distinct window hashes
  collect once and broadcast via ``ray.put``; the corpus side is a
  pure map doing one ``np.isin`` per batch against the sorted hash
  set. Window equality is by the same 64-bit rolling hash as
  stages/span_dedup.py — the q50 SQL oracle groups by the literal
  window STRING, cross-checking the no-collision assumption at gate
  scale.

Per-document metrics need >= 2 tokens (a bigram) — documents that are
empty/whitespace or single-token are dropped from the signal table,
mirroring the SQL oracle's inner join of word stats with bigram stats.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .span_dedup import doc_tokens as _doc_tokens
from .span_dedup import flat_window_hashes

# multiplier for combining adjacent token hashes into a bigram hash;
# odd -> full period mod 2^64 (same constant family as span_dedup)
_BIGRAM_B = np.uint64(1099511628211)


def _repetition_table(batch: pa.Table, text_col: str, key_col: str) -> pa.Table:
    doc, th = _doc_tokens(batch, text_col)
    n = batch.num_rows
    totals = np.bincount(doc, minlength=n)

    # distinct tokens per doc: sort (doc, hash), count group starts
    order = np.lexsort((th, doc))
    d_s, h_s = doc[order], th[order]
    if d_s.size:
        new = np.empty(d_s.size, dtype=bool)
        new[0] = True
        new[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
        distinct = np.bincount(d_s[new], minlength=n)
    else:
        distinct = np.zeros(n, dtype=np.int64)

    # bigrams: adjacent tokens within the same doc, original order
    adj = doc[1:] == doc[:-1] if doc.size else np.empty(0, dtype=bool)
    b_doc = doc[:-1][adj]
    bmix = (th[:-1] * _BIGRAM_B + th[1:])[adj]
    total_bi = np.bincount(b_doc, minlength=n)
    max_run = np.zeros(n, dtype=np.int64)
    if b_doc.size:
        order2 = np.lexsort((bmix, b_doc))
        bd_s, bm_s = b_doc[order2], bmix[order2]
        starts = np.empty(bd_s.size, dtype=bool)
        starts[0] = True
        starts[1:] = (bd_s[1:] != bd_s[:-1]) | (bm_s[1:] != bm_s[:-1])
        start_idx = np.flatnonzero(starts)
        run_len = np.diff(np.append(start_idx, bd_s.size))
        run_doc = bd_s[start_idx]
        udocs, first = np.unique(run_doc, return_index=True)
        max_run[udocs] = np.maximum.reduceat(run_len, first)

    keep = total_bi >= 1  # needs a bigram, implies non-empty text
    totals_k = totals[keep].astype(np.float64)
    dup = 1.0 - (distinct[keep].astype(np.float64) / totals_k)
    topbi = max_run[keep].astype(np.float64) / total_bi[keep].astype(np.float64)
    keys = batch[key_col]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    return pa.table(
        {
            key_col: keys.filter(pa.array(keep)),
            "dup_word_frac": pa.array(dup, pa.float64()),
            "top_bigram_frac": pa.array(topbi, pa.float64()),
        }
    )


def repetition_signals(
    ds: ray.data.Dataset, *, text_col: str = "text", key_col: str = "doc_id"
) -> ray.data.Dataset:
    """Per-document repetition statistics ``(key, dup_word_frac,
    top_bigram_frac)``. Documents with fewer than two tokens are
    dropped (no bigram to measure)."""
    return ds.map_batches(
        lambda b: _repetition_table(b, text_col, key_col),
        batch_format="pyarrow",
    )


def repetition_filter(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    key_col: str = "doc_id",
    max_dup_word_frac: float = 0.55,
    max_top_bigram_frac: float = 0.05,
    passthrough: bool = False,
) -> ray.data.Dataset:
    """Keep documents whose repetition signals fall at or under both
    thresholds (Gopher-style repetitive-document removal).

    ``passthrough=False`` returns the signal table (key + both
    fractions); ``passthrough=True`` filters the input batches in
    place, preserving every original column for pipeline composition.
    Either way documents with < 2 tokens are dropped."""

    def _sig_filter(batch: pa.Table) -> pa.Table:
        t = _repetition_table(batch, text_col, key_col)
        mask = pc.and_(
            pc.less_equal(t["dup_word_frac"], max_dup_word_frac),
            pc.less_equal(t["top_bigram_frac"], max_top_bigram_frac),
        )
        if not passthrough:
            return t.filter(mask)
        kept = t.filter(mask)[key_col]
        if isinstance(kept, pa.ChunkedArray):
            kept = kept.combine_chunks()
        return batch.filter(pc.is_in(batch[key_col], value_set=kept))

    return ds.map_batches(_sig_filter, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Decontamination
# ---------------------------------------------------------------------------


def _window_hash_rows(batch: pa.Table, text_col: str, w: int) -> pa.Table:
    doc, th = _doc_tokens(batch, text_col)
    _, _, wh = flat_window_hashes(doc, th, w)
    flat = (
        np.unique(wh).view(np.int64) if wh.size else np.empty(0, dtype=np.int64)
    )
    return pa.table({"whash": pa.array(flat, pa.int64())})


def benchmark_window_hashes(
    ds: ray.data.Dataset, *, text_col: str = "text", w: int = 4
) -> np.ndarray:
    """Distinct w-token window hashes of a benchmark/eval dataset,
    sorted, as int64 (bijective reinterpret of the uint64 rolling
    hash). DRIVER-SIZED by contract: eval sets are small; the collect
    moves only 8 bytes per distinct window."""
    rows = ds.map_batches(
        lambda b: _window_hash_rows(b, text_col, w), batch_format="pyarrow"
    ).take_all()
    if not rows:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.fromiter((r["whash"] for r in rows), dtype=np.int64))


def contamination_report(
    ds: ray.data.Dataset,
    bench_hashes: np.ndarray,
    *,
    text_col: str = "text",
    key_col: str = "doc_id",
    w: int = 4,
) -> ray.data.Dataset:
    """Per-document contamination hit counts against a broadcast
    benchmark window-hash set: ``(key, n_hits)`` for documents with at
    least one w-token window present in the benchmark (n_hits counts
    window POSITIONS, matching the SQL oracle's join cardinality)."""
    bench_ref = ray.put(np.sort(np.asarray(bench_hashes, dtype=np.int64)))

    def _hits(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        doc, th = _doc_tokens(batch, text_col)
        wdoc, _, wh = flat_window_hashes(doc, th, w)
        hits = np.zeros(batch.num_rows, dtype=np.int64)
        if wh.size and bench.size:
            whi = wh.view(np.int64)
            pos = np.minimum(np.searchsorted(bench, whi), bench.size - 1)
            hit = bench[pos] == whi
            np.add.at(hits, wdoc[hit], 1)
        keep = pa.array(hits > 0)
        keys = batch[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        return pa.table(
            {
                key_col: keys.filter(keep),
                "n_hits": pa.array(hits[hits > 0], pa.int64()),
            }
        )

    return ds.map_batches(_hits, batch_format="pyarrow")


def decontaminate(
    ds: ray.data.Dataset,
    bench_hashes: np.ndarray,
    *,
    text_col: str = "text",
    key_col: str = "doc_id",
    w: int = 4,
) -> ray.data.Dataset:
    """Drop documents sharing any w-token window with the benchmark
    set; passthrough columns are preserved (pure map, no shuffle)."""
    bench_ref = ray.put(np.sort(np.asarray(bench_hashes, dtype=np.int64)))

    def _clean(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        keep = np.ones(batch.num_rows, dtype=bool)
        if bench.size:
            doc, th = _doc_tokens(batch, text_col)
            wdoc, _, wh = flat_window_hashes(doc, th, w)
            if wh.size:
                whi = wh.view(np.int64)
                pos = np.minimum(np.searchsorted(bench, whi), bench.size - 1)
                keep[wdoc[bench[pos] == whi]] = False
        return batch.filter(pa.array(keep))

    return ds.map_batches(_clean, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# TF-IDF (vocabulary-bounded broadcast join)
# ---------------------------------------------------------------------------

# sentinel bucket carrying the per-batch document-count partials through
# the same exchange as the token rows (never a valid token bucket)
_NDOCS_BUCKET = -1


def _reduceat_sum(h: np.ndarray, v: np.ndarray):
    """Sort-and-segment sum: returns (unique keys, per-key sums) —
    the per-bucket reduce shared by the vocabulary exchanges."""
    if h.size == 0:
        return h, v[:0]
    order = np.argsort(h, kind="stable")
    h_s, v_s = h[order], v[order]
    starts = np.empty(h_s.size, dtype=bool)
    starts[0] = True
    starts[1:] = h_s[1:] != h_s[:-1]
    idx = np.flatnonzero(starts)
    return h_s[idx], np.add.reduceat(v_s, idx)


def document_frequencies(
    ds: ray.data.Dataset, *, text_col: str = "text", n_buckets: int = 64
):
    """Corpus document frequencies keyed by 64-bit token hash.

    Returns ``(hashes, dfs, n_docs)`` — sorted int64 hash array, the
    matching per-token document counts, and the number of documents
    with at least one token. Same exchange shape as
    curation.top_tokens: per-batch vocabulary partials (one row per
    distinct token per batch, never per token occurrence), ONE coarse
    hash-bucket exchange, a vectorized per-bucket sum. The collected
    result is VOCABULARY-bounded, not corpus-bounded (Zipf: a web-scale
    corpus has ~1e8 distinct tokens -> ~1.6 GB as two numpy arrays,
    held once per node in plasma when broadcast via ``ray.put``).
    """

    def _partial(batch: pa.Table) -> pa.Table:
        doc, th = _doc_tokens(batch, text_col)
        if doc.size:
            # distinct (doc, token) pairs -> per-batch df partials
            pair = np.unique(
                np.stack([doc.astype(np.uint64), th], axis=1), axis=0
            )
            uh, df = np.unique(pair[:, 1], return_counts=True)
            n_docs_batch = int(np.unique(pair[:, 0]).size)
        else:
            uh = np.empty(0, dtype=np.uint64)
            df = np.empty(0, dtype=np.int64)
            n_docs_batch = 0
        h64 = uh.view(np.int64)
        bucket = (uh % np.uint64(n_buckets)).astype(np.int32)
        return pa.table(
            {
                "thash": pa.array(np.append(h64, np.int64(0))),
                "df": pa.array(
                    np.append(df.astype(np.int64), np.int64(n_docs_batch))
                ),
                "bucket": pa.array(np.append(bucket, np.int32(_NDOCS_BUCKET))),
            }
        )

    def _bucket_sum(group: pa.Table) -> pa.Table:
        h = group["thash"].to_numpy(zero_copy_only=False)
        d = group["df"].to_numpy(zero_copy_only=False)
        b = group["bucket"][0].as_py()
        if b == _NDOCS_BUCKET:
            return pa.table(
                {
                    "thash": pa.array([np.int64(0)]),
                    "df": pa.array([np.int64(d.sum())]),
                    "bucket": pa.array([np.int32(_NDOCS_BUCKET)]),
                }
            )
        uh, sums = _reduceat_sum(h, d)
        return pa.table(
            {
                "thash": pa.array(uh),
                "df": pa.array(sums.astype(np.int64)),
                "bucket": pa.array(
                    np.full(uh.size, b, dtype=np.int32)
                ),
            }
        )

    rows = (
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=None)
        .groupby("bucket")
        .map_groups(_bucket_sum, batch_format="pyarrow")
        .to_pandas()
    )
    nd_mask = rows["bucket"] == _NDOCS_BUCKET
    n_docs = int(rows.loc[nd_mask, "df"].sum())
    tok = rows.loc[~nd_mask]
    hashes = tok["thash"].to_numpy()
    dfs = tok["df"].to_numpy()
    order = np.argsort(hashes, kind="stable")
    return hashes[order], dfs[order].astype(np.int64), n_docs


def token_counts(
    ds: ray.data.Dataset, *, text_col: str = "text", n_buckets: int = 64
):
    """Corpus term frequencies keyed by 64-bit token hash.

    Returns ``(hashes, counts, total_tokens)`` — sorted int64 hash
    array, matching total occurrence counts, and the corpus token
    count. Same vocabulary-bounded exchange as
    ``document_frequencies`` (per-batch distinct-token partials, ONE
    coarse hash-bucket exchange, vectorized per-bucket sum); the
    collected result scales with the VOCABULARY, not the corpus.
    """

    def _partial(batch: pa.Table) -> pa.Table:
        _, th = _doc_tokens(batch, text_col)
        if th.size:
            uh, cnt = np.unique(th, return_counts=True)
        else:
            uh = np.empty(0, dtype=np.uint64)
            cnt = np.empty(0, dtype=np.int64)
        return pa.table(
            {
                "thash": pa.array(uh.view(np.int64)),
                "cnt": pa.array(cnt.astype(np.int64)),
                "bucket": pa.array((uh % np.uint64(n_buckets)).astype(np.int32)),
            }
        )

    def _bucket_sum(group: pa.Table) -> pa.Table:
        h = group["thash"].to_numpy(zero_copy_only=False)
        c = group["cnt"].to_numpy(zero_copy_only=False)
        b = group["bucket"][0].as_py()
        uh, sums = _reduceat_sum(h, c)
        return pa.table(
            {
                "thash": pa.array(uh),
                "cnt": pa.array(sums.astype(np.int64)),
                "bucket": pa.array(np.full(uh.size, b, dtype=np.int32)),
            }
        )

    rows = (
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=None)
        .groupby("bucket")
        .map_groups(_bucket_sum, batch_format="pyarrow")
        .to_pandas()
    )
    if len(rows) == 0:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            0,
        )
    hashes = rows["thash"].to_numpy()
    counts = rows["cnt"].to_numpy().astype(np.int64)
    order = np.argsort(hashes, kind="stable")
    return hashes[order], counts[order], int(counts.sum())


def _mean_logprob(
    batch: pa.Table,
    text_col: str,
    h: np.ndarray,
    lp: np.ndarray,
    decimals: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-row (token count, mean token logprob) against the broadcast
    sorted (hash, logprob) vocabulary — THE single scoring kernel
    shared by ``unigram_logprob``/``perplexity_gate`` so the variants
    can't drift. Raises when a token is absent from the vocabulary
    (both passes read the same dataset; a miss means the upstream
    changed between passes and a silent neighbor-score would be
    wrong)."""
    doc, th = _doc_tokens(batch, text_col)
    n_rows = batch.num_rows
    ntok = np.zeros(n_rows, dtype=np.int64)
    sums = np.zeros(n_rows, dtype=np.float64)
    if th.size:
        np.add.at(ntok, doc, 1)
        pos = np.minimum(
            np.searchsorted(h, th.view(np.int64)), max(0, h.size - 1)
        )
        if h.size == 0 or not (h[pos] == th.view(np.int64)).all():
            raise ValueError(
                "unigram scoring: token absent from the vocabulary "
                "broadcast (input changed between passes?)"
            )
        np.add.at(sums, doc, lp[pos])
    avg = np.round(sums / np.maximum(1, ntok), decimals)
    return ntok, avg


def unigram_logprob(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    key_col: str = "doc_id",
    decimals: int = 9,
    n_buckets: int = 64,
    extra_cols: tuple = (),
) -> ray.data.Dataset:
    """Per-document mean unigram log-probability — the KenLM-free LM
    quality proxy (CCNet-style perplexity filtering, Wenzek et al.
    2020, public paper, with the corpus itself as the unigram model).

    ``logprob = avg over tokens of ln(count(tok) / total_tokens)`` —
    low (very negative) scores mean rare-token-heavy documents
    (boilerplate/garbled), high scores mean common-token text. Emits
    ``(key, n_tokens, logprob)`` rounded to ``decimals``; empty
    documents are dropped (no tokens to average).

    Two streaming passes: the vocabulary-bounded ``token_counts``
    exchange, then a pure scoring map against the broadcast
    (hash -> logprob) arrays via ``np.searchsorted``. No corpus-shaped
    shuffle; the broadcast is vocabulary-sized (Zipf-bounded).
    """
    hashes, counts, total = token_counts(
        ds, text_col=text_col, n_buckets=n_buckets
    )
    logp = np.log(counts.astype(np.float64) / max(1, total))
    bcast = ray.put((hashes, logp))

    def _score(batch: pa.Table) -> pa.Table:
        h, lp = ray.get(bcast)
        ntok, avg_all = _mean_logprob(batch, text_col, h, lp, decimals)
        keep = ntok > 0
        keys = np.asarray(batch[key_col].to_pylist(), dtype=np.int64)[keep]
        avg = avg_all[keep]
        mask = pa.array(keep)
        cols = {
            key_col: pa.array(keys),
            "n_tokens": pa.array(ntok[keep]),
            "logprob": pa.array(avg),
        }
        for c in extra_cols:
            cols[c] = batch[c].combine_chunks().filter(mask) if isinstance(
                batch[c], pa.ChunkedArray
            ) else batch[c].filter(mask)
        return pa.table(cols)

    return ds.map_batches(_score, batch_format="pyarrow")


def blockword_filter(
    ds: ray.data.Dataset,
    words: list[str] | tuple,
    *,
    text_col: str = "text",
    max_hits: int = 0,
    case_insensitive: bool = True,
    count_col: str | None = None,
) -> ray.data.Dataset:
    """C4's blocklist rule (Raffel et al. 2020 §2.2: drop any page
    containing a word from a banned-word list), vectorized: the word
    list is hashed once and broadcast (list-bounded), each batch
    tokenizes on whitespace, counts per-document blocklist hits with
    one ``searchsorted`` + ``bincount``, and keeps documents with at
    most ``max_hits`` hits (C4 uses 0). ``count_col`` appends the hit
    count instead of filtering — the audit/report form.

    Matching is whole-token (the C4 rule), lowercased when
    ``case_insensitive``; punctuation-attached occurrences don't match,
    exactly as in whitespace-token C4.
    """
    from ..functions.hashing import stable_hash64_array

    wl = np.asarray(
        [w.lower() for w in words] if case_insensitive else list(words),
        dtype=object,
    )
    if wl.size == 0:
        raise ValueError("blockword_filter: empty word list")
    wh = np.sort(stable_hash64_array(wl).view(np.int64))
    wh_ref = ray.put(wh)

    def _hits(batch: pa.Table) -> np.ndarray:
        bw = ray.get(wh_ref)
        if case_insensitive:
            batch = batch.set_column(
                batch.schema.get_field_index(text_col),
                text_col,
                pc.utf8_lower(batch[text_col]),
            )
        doc, th = _doc_tokens(batch, text_col)
        hits = np.zeros(batch.num_rows, dtype=np.int64)
        if th.size:
            h = th.view(np.int64)
            pos = np.minimum(np.searchsorted(bw, h), bw.size - 1)
            m = bw[pos] == h
            if m.any():
                np.add.at(hits, doc[m], 1)
        return hits

    if count_col is not None:

        def _count(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                count_col, pa.array(_hits(batch), pa.int64())
            )

        return ds.map_batches(_count, batch_format="pyarrow")

    def _gate(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(_hits(batch) <= max_hits))

    return ds.map_batches(_gate, batch_format="pyarrow")


def perplexity_gate(
    ds: ray.data.Dataset,
    *,
    lang_col: str = "lang",
    text_col: str = "text",
    key_col: str = "doc_id",
    keep: tuple = ("head", "middle"),
    n_buckets: int = 64,
    q_buckets: int = 4096,
    decimals: int = 9,
) -> ray.data.Dataset:
    """Keep only the documents whose CCNet perplexity bucket is in
    ``keep`` — the payload-filtering form of :func:`perplexity_buckets`
    (CCNet trains on head+middle and drops the tail).

    Scale shape: selecting by bucket through the skinny
    ``perplexity_buckets`` output would broadcast up to 2/3 of the
    corpus KEYS; instead the per-language score cutoff implied by
    ``keep`` is derived once (vocabulary-bounded ``token_counts``
    exchange + the exact no-sort quantiles) and the payload filter
    re-scores each document against the same broadcast vocabulary —
    all broadcast state is vocabulary/language-bounded. Empty
    documents have no score and never pass, matching
    ``perplexity_buckets`` (which drops them). Bucket membership is
    IDENTICAL to ``perplexity_buckets`` (tested as an equality).
    """
    keep_set = frozenset(keep)
    if keep_set not in (
        frozenset({"head"}),
        frozenset({"head", "middle"}),
        frozenset({"head", "middle", "tail"}),
    ):
        # a score threshold can only express contiguous-from-head sets
        raise ValueError(
            f"perplexity_gate: keep must be a contiguous-from-'head' "
            f"subset, got {sorted(keep_set)}"
        )

    hashes, counts, total = token_counts(
        ds, text_col=text_col, n_buckets=n_buckets
    )
    logp = np.log(counts.astype(np.float64) / max(1, total))
    bcast = ray.put((hashes, logp))

    def _skinny(batch: pa.Table) -> pa.Table:
        h, lp = ray.get(bcast)
        ntok, avg = _mean_logprob(batch, text_col, h, lp, decimals)
        lcol = batch[lang_col]
        if isinstance(lcol, pa.ChunkedArray):
            lcol = lcol.combine_chunks()
        # null-lang rows are 'tail' by fiat (see _gate) — their cutoffs
        # are never consulted, and a null group would break the
        # quantile pass
        m = (ntok > 0) & pc.is_valid(lcol).to_numpy(zero_copy_only=False)
        mask = pa.array(m)
        return pa.table(
            {lang_col: lcol.filter(mask), "logprob": pa.array(avg[m])}
        )

    skinny = ds.map_batches(_skinny, batch_format="pyarrow").materialize()
    from .curation import group_quantiles

    qlo, qhi = 1.0 / 3.0, 2.0 / 3.0
    cuts = group_quantiles(skinny, lang_col, "logprob", [qlo, qhi], q_buckets)
    # per-language minimum logprob implied by the keep set; None = no
    # lower bound (keep everything scored)
    thr_map = {}
    for r in cuts.to_dict("records"):
        if "tail" in keep_set:
            thr_map[r[lang_col]] = -np.inf
        elif "middle" in keep_set:
            thr_map[r[lang_col]] = float(r[f"q{qlo}"])
        else:  # head only
            thr_map[r[lang_col]] = float(r[f"q{qhi}"])
    thr_ref = ray.put(thr_map)

    def _gate(batch: pa.Table) -> pa.Table:
        h, lp = ray.get(bcast)
        tm = ray.get(thr_ref)
        ntok, avg = _mean_logprob(batch, text_col, h, lp, decimals)
        codes, uniq = pd.factorize(
            pd.Series(batch[lang_col].to_pylist(), dtype=object)
        )
        # factorize maps null lang to code -1; append a sentinel row
        # that numpy's -1 indexing hits, so null-lang docs behave
        # deterministically (they are 'tail' in perplexity_buckets:
        # kept only when tail is kept) instead of wrapping to whichever
        # language happens to be last in this batch
        null_thr = -np.inf if "tail" in keep_set else np.inf
        thr = np.array(
            [tm.get(u, np.inf) for u in uniq] + [null_thr],
            dtype=np.float64,
        )
        m = (ntok > 0) & (avg >= thr[codes])
        return batch.filter(pa.array(m))

    return ds.map_batches(_gate, batch_format="pyarrow")


def perplexity_buckets(
    ds: ray.data.Dataset,
    *,
    lang_col: str = "lang",
    text_col: str = "text",
    key_col: str = "doc_id",
    labels: tuple = ("head", "middle", "tail"),
    n_buckets: int = 64,
    q_buckets: int = 4096,
    extra_cols: tuple = (),
) -> ray.data.Dataset:
    """CCNet's head/middle/tail split (Wenzek et al. 2020 §4.3, public
    paper): per language, bucket documents into perplexity terciles —
    ``head`` = the most-fluent third (highest ``unigram_logprob``),
    ``tail`` = the least. Emits ``(key, lang, n_tokens, logprob,
    bucket)`` (+ ``extra_cols``).

    Composition of two existing exact plans: the vocabulary-bounded
    :func:`unigram_logprob` scoring pass (materialized once — the
    quantile and label passes both consume it) and
    ``curation.group_quantiles``'s no-sort exact order statistics for
    the per-language 1/3- and 2/3-cutoffs; labeling is then a pure map
    against the broadcast (language -> cutoffs) table. Boundary ties
    take the better bucket (``>=`` on the exact quantile_disc value),
    so bucket sizes are exact thirds only when scores are distinct —
    the CCNet semantics, deterministic at any parallelism.
    """
    if len(labels) != 3:
        raise ValueError("perplexity_buckets: need exactly 3 labels")
    from .curation import group_quantiles

    scored = unigram_logprob(
        ds,
        text_col=text_col,
        key_col=key_col,
        n_buckets=n_buckets,
        extra_cols=tuple(dict.fromkeys((lang_col, *extra_cols))),
    ).materialize()
    qlo, qhi = 1.0 / 3.0, 2.0 / 3.0
    # null-lang rows label 'tail' by fiat in _label; exclude them from
    # the quantile pass (a null group would break it and its cutoffs
    # are never read)
    nonnull = scored.map_batches(
        lambda t: t.filter(pc.is_valid(t[lang_col])),
        batch_format="pyarrow",
    )
    cuts = group_quantiles(nonnull, lang_col, "logprob", [qlo, qhi], q_buckets)
    cut_map = {
        r[lang_col]: (float(r[f"q{qlo}"]), float(r[f"q{qhi}"]))
        for r in cuts.to_dict("records")
    }
    cuts_ref = ray.put(cut_map)

    def _label(batch: pa.Table) -> pa.Table:
        cm = ray.get(cuts_ref)
        lp = batch["logprob"].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(
            pd.Series(batch[lang_col].to_pylist(), dtype=object)
        )
        # +inf sentinel rows so factorize's -1 (null lang) indexes the
        # appended element and deterministically labels 'tail' instead
        # of wrapping to an arbitrary language's cutoffs
        lo = np.array(
            [cm.get(u, (np.inf, np.inf))[0] for u in uniq] + [np.inf],
            dtype=np.float64,
        )
        hi = np.array(
            [cm.get(u, (np.inf, np.inf))[1] for u in uniq] + [np.inf],
            dtype=np.float64,
        )
        out = np.where(
            lp >= hi[codes],
            labels[0],
            np.where(lp >= lo[codes], labels[1], labels[2]),
        )
        return batch.append_column(
            "bucket", pa.array(out, type=pa.string())
        )

    return scored.map_batches(_label, batch_format="pyarrow")


# RE2-compatible patterns (Arrow's replace_substring_regex and
# DuckDB's regexp_replace are both RE2, so the q63 oracle replays the
# exact same replacements). Order matters: an email is redacted before
# its digit-bearing domain could half-match the IP pattern.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9]{7,15}", "<PHONE>"),
]


def redact_pii(
    ds: ray.data.Dataset, *, text_col: str = "text", out_col: str | None = None
) -> ray.data.Dataset:
    """Regex PII redaction (the Dolma/FineWeb-style pre-training
    scrub, public pipelines): masks emails, IPv4 addresses and
    international phone numbers with typed sentinels. A pure
    vectorized map — Arrow's RE2 kernel replaces all non-overlapping
    matches per pattern, in the fixed ``PII_PATTERNS`` order; no
    shuffle, no state, cost is read bandwidth at any scale."""
    dst = out_col or text_col

    def _redact(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        for _, pat, repl in PII_PATTERNS:
            col = pc.replace_substring_regex(col, pattern=pat, replacement=repl)
        if dst in batch.column_names:
            return batch.set_column(
                batch.column_names.index(dst), dst, col
            )
        return batch.append_column(dst, col)

    return ds.map_batches(_redact, batch_format="pyarrow")


def tfidf_top_terms(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    key_col: str = "doc_id",
    k: int = 1,
    decimals: int = 9,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Top-k TF-IDF terms per document: ``(key, token, tf, df)``.

    score = tf * ln(n_docs / df), ranked (score DESC, token ASC) —
    the score itself never leaves the batch (only integer tf/df and the
    token string do), and both engine and SQL oracle round it to
    ``decimals`` before ranking so a last-ulp libm difference cannot
    flip an ordering. Two streaming passes: the document-frequency
    exchange above (vocabulary-bounded broadcast), then a pure map
    doing a per-batch lexsort rank. No corpus-shaped shuffle.
    """
    hashes, dfs, n_docs = document_frequencies(
        ds, text_col=text_col, n_buckets=n_buckets
    )
    df_ref = ray.put((hashes, dfs, np.float64(n_docs)))

    def _topk(batch: pa.Table) -> pa.Table:
        h_sorted, df_sorted, n = ray.get(df_ref)
        doc, th = _doc_tokens(batch, text_col)
        keys = batch[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        key_np = keys.to_numpy(zero_copy_only=False)
        key_type = batch.schema.field(key_col).type
        empty = pa.table(
            {
                key_col: pa.array([], key_type),
                "token": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "df": pa.array([], pa.int64()),
            }
        )
        if not doc.size:
            return empty
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toklist = pc.utf8_split_whitespace(col)
        if isinstance(toklist, pa.ChunkedArray):
            toklist = toklist.combine_chunks()
        flat = toklist.values
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        tok_str = flat.to_numpy(zero_copy_only=False)
        if not keep.all():
            tok_str = tok_str[keep]
        # tf per (doc, token) run
        th_i = th.view(np.int64)
        order = np.lexsort((th_i, doc))
        d_s, h_s = doc[order], th_i[order]
        starts = np.empty(d_s.size, dtype=bool)
        starts[0] = True
        starts[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
        idx = np.flatnonzero(starts)
        tf = np.diff(np.append(idx, d_s.size)).astype(np.int64)
        run_doc = d_s[idx]
        run_hash = h_s[idx]  # int64, same order domain as h_sorted
        run_tok = tok_str[order[idx]]
        pos = np.minimum(
            np.searchsorted(h_sorted, run_hash), max(h_sorted.size - 1, 0)
        )
        if h_sorted.size:
            assert (h_sorted[pos] == run_hash).all(), "df table missing tokens"
        run_df = df_sorted[pos]
        score = np.round(tf.astype(np.float64) * np.log(n / run_df), decimals)
        sel = np.lexsort((run_tok, -score, run_doc))
        sd = run_doc[sel]
        first = np.empty(sd.size, dtype=bool)
        first[0] = True
        first[1:] = sd[1:] != sd[:-1]
        doc_start = np.maximum.accumulate(
            np.where(first, np.arange(sd.size), 0)
        )
        rank = np.arange(sd.size) - doc_start
        pick = sel[rank < k]
        return pa.table(
            {
                key_col: pa.array(key_np[run_doc[pick]], key_type),
                "token": pa.array(run_tok[pick].astype(object), pa.string()),
                "tf": pa.array(tf[pick]),
                "df": pa.array(run_df[pick].astype(np.int64)),
            }
        )

    return ds.map_batches(_topk, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Feature-hash embeddings (text -> vector bridge)
# ---------------------------------------------------------------------------


def hash_embed(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    key_col: str = "doc_id",
    dim: int = 64,
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Deterministic feature-hash document embeddings (the hashing
    trick, Weinberger et al. 2009 — public): each token adds ±1 to the
    bucket ``hash(token) % dim`` (sign from an independent hash bit);
    the vector is L2-normalized. Model-free and vocabulary-free, so it
    bridges the text tables into the vector operator family
    (``embedding_dedup``, ``knn_*``, ``kmeans_*``) with zero broadcast
    state. Pure map: one ``np.add.at`` scatter per batch. Documents
    with no tokens are dropped (no direction to normalize)."""

    def _embed(batch: pa.Table) -> pa.Table:
        doc, th = _doc_tokens(batch, text_col)
        n = batch.num_rows
        mat = np.zeros((n, dim), dtype=np.float64)
        if doc.size:
            bucket = (th % np.uint64(dim)).astype(np.int64)
            sign = 1.0 - 2.0 * ((th >> np.uint64(32)) & np.uint64(1)).astype(
                np.float64
            )
            np.add.at(mat, (doc, bucket), sign)
        norms = np.linalg.norm(mat, axis=1)
        keep = norms > 0
        mat = mat[keep] / norms[keep, None]
        keys = batch[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        return pa.table(
            {
                key_col: keys.filter(pa.array(keep)),
                vec_col: pa.array(list(mat), pa.list_(pa.float64())),
            }
        )

    return ds.map_batches(_embed, batch_format="pyarrow")


def compression_filter(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    min_ratio: float = 0.25,
    max_ratio: float | None = None,
    out_col: str | None = None,
) -> ray.data.Dataset:
    """Gate documents on their zlib compression ratio
    (``functions.textstats.compression_ratio``) — drop heavily
    templated/repeated text below ``min_ratio`` and (optionally)
    gibberish above ``max_ratio``; ``out_col`` persists the ratio.
    Pure map, no state, no shuffle."""
    from ..functions.textstats import compression_ratio

    def _gate(batch: pa.Table) -> pa.Table:
        ratios = np.array(
            [compression_ratio(t or "") for t in batch[text_col].to_pylist()]
        )
        keep = ratios >= min_ratio
        if max_ratio is not None:
            keep &= ratios <= max_ratio
        if out_col is not None:
            batch = batch.append_column(out_col, pa.array(ratios))
        return batch.filter(pa.array(keep))

    return ds.map_batches(_gate, batch_format="pyarrow")


def bigram_logprob(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    key_col: str = "doc_id",
    lam: float = 0.9,
    min_count: int = 2,
    decimals: int = 9,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-document mean INTERPOLATED bigram log-probability — the
    CCNet-fidelity upgrade of ``unigram_logprob`` (Wenzek et al. 2020
    score with an n-gram LM; here a corpus-as-model bigram with
    unigram backoff instead of an external KenLM):

        score(doc) = mean over positions i>=1 of
            ln( lam * c(w_{i-1}, w_i) / c(w_{i-1})
                + (1 - lam) * c(w_i) / N )

    Documents with fewer than 2 tokens are dropped (no bigram to
    score). Emits ``(key, n_bigrams, logprob)`` rounded to
    ``decimals``; deterministic at any parallelism (fixed-point
    rounding, order-free sums).

    Scale shape: TWO vocabulary-style bucket exchanges — the unigram
    ``token_counts`` pass and a structurally identical bigram-hash
    pass — then a pure scoring map against the broadcast tables.
    The bigram broadcast is pruned to pairs seen >= ``min_count``
    times (Zipf: the singleton tail is most of the distinct pairs but
    contributes only backoff-level mass, which the interpolation term
    supplies anyway), so the broadcast scales with FREQUENT bigram
    types, not corpus tokens. ``lam`` < 1 keeps every probability
    nonzero without explicit smoothing.
    """
    from ._bucketing import mix64

    hashes, counts, total = token_counts(
        ds, text_col=text_col, n_buckets=n_buckets
    )

    def _bigram_hashes(batch: pa.Table):
        """(bigram_hash, left_hash, right_hash, bigram_doc_idx) for a
        batch; ``_doc_tokens`` gives per-token doc indices (documents
        contiguous), so a position j is a real bigram only when tokens
        j and j+1 share a doc index."""
        doc, th = _doc_tokens(batch, text_col)
        if th.size < 2:
            e = np.empty(0, dtype=np.uint64)
            return e, e, e, np.empty(0, dtype=np.int64)
        valid = doc[:-1] == doc[1:]
        left, right = th[:-1][valid], th[1:][valid]
        bh = mix64(left.view(np.int64), right.view(np.int64))
        return bh, left, right, doc[:-1][valid]

    def _partial(batch: pa.Table) -> pa.Table:
        bh, _l, _r, _d = _bigram_hashes(batch)
        if bh.size:
            uh, cnt = np.unique(bh, return_counts=True)
        else:
            uh = np.empty(0, dtype=np.uint64)
            cnt = np.empty(0, dtype=np.int64)
        return pa.table(
            {
                "bhash": pa.array(uh.view(np.int64)),
                "cnt": pa.array(cnt.astype(np.int64)),
                "bucket": pa.array(
                    (uh % np.uint64(n_buckets)).astype(np.int32)
                ),
            }
        )

    def _bucket_sum(group: pa.Table) -> pa.Table:
        h = group["bhash"].to_numpy(zero_copy_only=False)
        c = group["cnt"].to_numpy(zero_copy_only=False)
        uh, sums = _reduceat_sum(h, c)
        keep = sums >= min_count
        return pa.table(
            {
                "bhash": pa.array(uh[keep]),
                "cnt": pa.array(sums[keep].astype(np.int64)),
            }
        )

    rows = (
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=None)
        .groupby("bucket")
        .map_groups(_bucket_sum, batch_format="pyarrow")
        .to_pandas()  # frequent-bigram-bounded (min_count prune)
    )
    if len(rows) and "bhash" in rows.columns:
        b_h = rows["bhash"].to_numpy(dtype=np.int64).view(np.uint64)
        b_c = rows["cnt"].to_numpy(dtype=np.int64)
    else:
        # every bigram fell below min_count: scoring degrades to pure
        # backoff (the empty-aggregate frame loses its schema, same as
        # token_counts' guard)
        b_h = np.empty(0, dtype=np.uint64)
        b_c = np.empty(0, dtype=np.int64)
    order = np.argsort(b_h)
    bcast = ray.put((hashes, counts, int(total), b_h[order], b_c[order]))

    def _score(batch: pa.Table) -> pa.Table:
        uh, uc, N, bh_tab, bc_tab = ray.get(bcast)
        bh, left, right, bigram_doc = _bigram_hashes(batch)
        keys = np.asarray(batch[key_col].to_pylist(), dtype=np.int64)
        if bh.size == 0:
            return pa.table(
                {
                    key_col: pa.array(np.empty(0, dtype=np.int64)),
                    "n_bigrams": pa.array(np.empty(0, dtype=np.int64)),
                    "logprob": pa.array(np.empty(0, dtype=np.float64)),
                }
            )
        # c(w1, w2) from the pruned table (0 when pruned/unseen); the
        # empty-table branch is separate because np.where evaluates
        # both branches eagerly (bh_tab[pos_c] on an empty table raises)
        if bh_tab.size:
            pos_c = np.minimum(np.searchsorted(bh_tab, bh), bh_tab.size - 1)
            c12 = np.where(bh_tab[pos_c] == bh, bc_tab[pos_c], 0).astype(
                np.float64
            )
        else:
            c12 = np.zeros(bh.size, dtype=np.float64)
        # c(w1) and c(w2): every observed token IS in the unigram
        # table; the table is SORTED AS int64 (token_counts contract),
        # so look up with the signed view, not the raw uint64 hashes
        c1 = uc[np.searchsorted(uh, left.view(np.int64))].astype(np.float64)
        c2 = uc[np.searchsorted(uh, right.view(np.int64))].astype(np.float64)
        p = lam * (c12 / c1) + (1.0 - lam) * (c2 / max(1, N))
        lp = np.log(p)
        # per-document mean over each doc's bigram positions
        n_docs = len(keys)
        sums = np.zeros(n_docs, dtype=np.float64)
        np.add.at(sums, bigram_doc, lp)
        cnts = np.bincount(bigram_doc, minlength=n_docs)
        keep = cnts > 0
        avg = np.round(sums[keep] / cnts[keep], decimals)
        return pa.table(
            {
                key_col: pa.array(keys[keep]),
                "n_bigrams": pa.array(cnts[keep].astype(np.int64)),
                "logprob": pa.array(avg),
            }
        )

    return ds.map_batches(_score, batch_format="pyarrow")
