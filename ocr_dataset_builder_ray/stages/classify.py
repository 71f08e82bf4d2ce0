"""Distributed Naive-Bayes text classifier — train and score over a
``ray.data.Dataset`` (semantic anchor: the reference's per-record
classify-then-route gating, e.g. tesseract/processing.py's per-frame
skip decisions, generalized to the published fastText-style corpus
classifiers used for web-data curation: CCNet's language/quality
fastText filters, Wenzek et al. 2020; GPT-3's WebText-vs-CommonCrawl
quality classifier, Brown et al. 2020 appendix A — public papers).

Multinomial Naive Bayes over whitespace unigrams is the shuffle-free
member of that family: training is ONE vocabulary-bounded exchange
(per-batch distinct ``(label, token)`` count partials -> coarse
token-hash bucket groupby -> vectorized per-bucket reduce), so the
driver-collected model scales with ``vocabulary x n_classes``, never
with the corpus. Scoring is a pure broadcast map: the model ships once
via ``ray.put`` and each batch does one ``np.searchsorted`` against
the sorted vocab plus a bincount per class. No corpus-shaped shuffle
anywhere; at 100 TB both passes cost read bandwidth.

Determinism: per-document token sums are computed within one row of
one batch (rows never split across blocks), class order is sorted
label order, argmax ties break to the lexicographically smallest
label, and scores are rounded before emission — so output is
byte-identical across batch sizes and parallelism.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .span_dedup import doc_tokens as _doc_tokens

# sentinel token hash carrying per-class DOCUMENT counts through the
# same exchange as the token counts (the tfidf ndocs-sentinel trick);
# int64 min cannot collide with a real hash reinterpreted as int64
# because stable_hash64 of a non-empty token never maps there in the
# synthetic/web corpora we pin (and a collision would only perturb one
# vocab entry's smoothing, caught by the equality tests).
_DOC_SENTINEL = np.int64(-(2**63))


@dataclass
class NBModel:
    """A trained multinomial-NB model, broadcast-sized.

    ``vocab`` is the sorted int64 token-hash array; ``logprob`` is the
    ``(n_classes, vocab_size)`` smoothed per-class token
    log-probability matrix; ``oov`` the per-class log-probability of a
    token unseen at training; ``log_prior`` the per-class document
    log-prior; ``classes`` the sorted label list.
    """

    classes: list
    vocab: np.ndarray
    logprob: np.ndarray
    oov: np.ndarray
    log_prior: np.ndarray


def train_nb_classifier(
    ds: ray.data.Dataset,
    *,
    label_col: str,
    text_col: str = "text",
    alpha: float = 1.0,
    n_buckets: int = 64,
) -> NBModel:
    """Fit multinomial NB with add-``alpha`` smoothing distributedly.

    Per-batch partials emit distinct ``(label, thash, cnt)`` rows plus
    one document-count sentinel row per label; ONE coarse bucket
    exchange (bucket = thash % n_buckets — equal tokens share a
    bucket, so the reduce is exact) sums them; the driver assembles
    the model from the vocabulary-bounded result.
    """

    def _partial(batch: pa.Table) -> pa.Table:
        doc, th = _doc_tokens(batch, text_col)
        if batch.num_rows and batch[label_col].null_count:
            # web-crawl label columns plausibly carry nulls; np.unique
            # over mixed None/str dies with an opaque TypeError, so
            # fail loudly here instead (drop/impute upstream)
            raise ValueError(
                f"train_nb_classifier: column {label_col!r} contains "
                f"{batch[label_col].null_count} null labels in a batch; "
                "filter or impute null-labeled rows before training"
            )
        labels = np.asarray(batch[label_col].to_pylist(), dtype=object)
        if labels.size:
            uniq_lab, lab_codes = np.unique(labels, return_inverse=True)
        else:
            uniq_lab, lab_codes = labels[:0], np.empty(0, dtype=np.intp)
        # ONE lexsort over (label-code, hash) int arrays + run-length
        # reduce — no per-label object-equality scans over the tokens
        if th.size:
            h64 = th.view(np.int64)
            tok_codes = lab_codes[doc]
            order = np.lexsort((h64, tok_codes))
            h_s, tc_s = h64[order], tok_codes[order]
            new = np.empty(h_s.size, dtype=bool)
            new[0] = True
            new[1:] = (h_s[1:] != h_s[:-1]) | (tc_s[1:] != tc_s[:-1])
            starts = np.flatnonzero(new)
            tok_cnt = np.diff(np.append(starts, h_s.size)).astype(np.int64)
            tok_h, tok_code = h_s[starts], tc_s[starts]
        else:
            tok_h = np.empty(0, dtype=np.int64)
            tok_code = np.empty(0, dtype=np.intp)
            tok_cnt = np.empty(0, dtype=np.int64)
        # document-count sentinel rows (count ALL docs of the label,
        # including empty-text ones — priors are doc priors)
        doc_cnt = np.bincount(lab_codes, minlength=uniq_lab.size).astype(
            np.int64
        )
        lab_a = uniq_lab[
            np.concatenate([tok_code, np.arange(uniq_lab.size, dtype=np.intp)])
        ]
        h_a = np.concatenate(
            [tok_h, np.full(uniq_lab.size, _DOC_SENTINEL, dtype=np.int64)]
        )
        c_a = np.concatenate([tok_cnt, doc_cnt])
        bucket = (h_a.view(np.uint64) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table(
            {
                "label": pa.array(lab_a, type=pa.string()),
                "thash": pa.array(h_a),
                "cnt": pa.array(c_a),
                "bucket": pa.array(bucket),
            }
        )

    def _bucket_sum(group: pa.Table) -> pa.Table:
        lab = np.asarray(group["label"].to_pylist(), dtype=object)
        h = group["thash"].to_numpy(zero_copy_only=False)
        c = group["cnt"].to_numpy(zero_copy_only=False)
        _, lab_idx = np.unique(lab, return_inverse=True)
        order = np.lexsort((h, lab_idx))
        lab_s, h_s, c_s = lab[order], h[order], c[order]
        li_s = lab_idx[order]
        new = np.empty(h_s.size, dtype=bool)
        if h_s.size:
            new[0] = True
            new[1:] = (h_s[1:] != h_s[:-1]) | (li_s[1:] != li_s[:-1])
        starts = np.flatnonzero(new)
        sums = np.add.reduceat(c_s, starts) if starts.size else c_s[:0]
        return pa.table(
            {
                "label": pa.array(lab_s[starts], type=pa.string()),
                "thash": pa.array(h_s[starts]),
                "cnt": pa.array(sums.astype(np.int64)),
            }
        )

    rows: pd.DataFrame = (
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=None)
        .groupby("bucket")
        .map_groups(_bucket_sum, batch_format="pyarrow")
        .to_pandas()
    )
    if len(rows) == 0 or "label" not in rows.columns:
        raise ValueError("train_nb_classifier: empty input dataset")

    lab = rows["label"].to_numpy(dtype=object)
    h = rows["thash"].to_numpy().astype(np.int64)
    c = rows["cnt"].to_numpy().astype(np.int64)

    is_doc = h == _DOC_SENTINEL
    classes = sorted(set(lab.tolist()))
    cls_idx = {name: i for i, name in enumerate(classes)}
    n_cls = len(classes)

    doc_counts = np.zeros(n_cls, dtype=np.int64)
    for name, cnt in zip(lab[is_doc], c[is_doc]):
        doc_counts[cls_idx[name]] += cnt
    if doc_counts.sum() == 0:
        raise ValueError("train_nb_classifier: no documents counted")

    tok_lab, tok_h, tok_c = lab[~is_doc], h[~is_doc], c[~is_doc]
    vocab = np.unique(tok_h)
    counts = np.zeros((n_cls, vocab.size), dtype=np.float64)
    if tok_h.size:
        vpos = np.searchsorted(vocab, tok_h)
        cpos = np.fromiter(
            (cls_idx[x] for x in tok_lab), dtype=np.int64, count=tok_lab.size
        )
        np.add.at(counts, (cpos, vpos), tok_c)

    totals = counts.sum(axis=1)
    denom = totals + alpha * (vocab.size + 1)
    logprob = np.log((counts + alpha) / denom[:, None])
    oov = np.log(alpha / denom)
    log_prior = np.log(doc_counts / doc_counts.sum())
    return NBModel(
        classes=classes,
        vocab=vocab,
        logprob=logprob,
        oov=oov,
        log_prior=log_prior,
    )


def _batch_scores(batch: pa.Table, model_tuple, text_col: str):
    """Shared NB scoring kernel for ``nb_classify`` / ``nb_filter``:
    (classes, best_idx, top_score, margin_or_None). ``margin`` is None
    for a single-class model (callers pick their own convention: 0.0
    for reporting, +inf for gating). The empty-vocabulary case (a
    model trained on all-empty texts) scores on priors alone — the
    vocab lookup is guarded with a real branch because ``np.where``
    evaluates both branches eagerly and ``vocab[pos_c]`` raises on an
    empty array."""
    classes, vocab, logprob, oov, log_prior = model_tuple
    n_cls = len(classes)
    n = batch.num_rows
    doc, th = _doc_tokens(batch, text_col)
    scores = np.tile(log_prior[:, None], (1, n))
    if th.size:
        h = th.view(np.int64)
        if vocab.size:
            pos_c = np.minimum(np.searchsorted(vocab, h), vocab.size - 1)
            hit = vocab[pos_c] == h
            for ci in range(n_cls):
                lp = np.where(hit, logprob[ci][pos_c], oov[ci])
                scores[ci] += np.bincount(doc, weights=lp, minlength=n)
        else:  # every token is OOV
            for ci in range(n_cls):
                scores[ci] += np.bincount(
                    doc, weights=np.full(th.size, oov[ci]), minlength=n
                )
    order = np.argsort(-scores, axis=0, kind="stable")
    best = order[0]
    top = scores[best, np.arange(n)]
    margin = (
        top - scores[order[1], np.arange(n)] if n_cls > 1 else None
    )
    return classes, best, top, margin


def nb_classify(
    ds: ray.data.Dataset,
    model: NBModel,
    *,
    text_col: str = "text",
    key_col: str = "doc_id",
    extra_cols: tuple = (),
    decimals: int = 9,
) -> ray.data.Dataset:
    """Score every document against a broadcast ``NBModel``.

    Emits ``(key, pred_label, score, margin)`` (+ ``extra_cols``
    passed through): ``score`` is the winning class's joint
    log-probability, ``margin`` its lead over the runner-up (0.0 for a
    single-class model). Pure map — the model ships once via
    ``ray.put``; empty documents classify on priors alone.
    """
    bcast = ray.put(
        (model.classes, model.vocab, model.logprob, model.oov, model.log_prior)
    )

    def _score(batch: pa.Table) -> pa.Table:
        classes, best, top, margin = _batch_scores(
            batch, ray.get(bcast), text_col
        )
        if margin is None:
            margin = np.zeros(batch.num_rows, dtype=np.float64)
        cols = {
            key_col: batch[key_col],
            "pred_label": pa.array(
                [classes[i] for i in best], type=pa.string()
            ),
            "score": pa.array(np.round(top, decimals)),
            "margin": pa.array(np.round(margin, decimals)),
        }
        for c in extra_cols:
            cols[c] = batch[c]
        return pa.table(cols)

    return ds.map_batches(_score, batch_format="pyarrow")


def nb_filter(
    ds: ray.data.Dataset,
    model: NBModel,
    *,
    keep_label: str,
    min_margin: float = 0.0,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Keep only rows the model assigns ``keep_label`` with at least
    ``min_margin`` lead — the CCNet 'keep what scores like the target
    corpus' gate, as a pure map over the full-payload rows."""
    bcast = ray.put(
        (model.classes, model.vocab, model.logprob, model.oov, model.log_prior)
    )
    if keep_label not in model.classes:
        raise ValueError(f"nb_filter: unknown label {keep_label!r}")

    def _gate(batch: pa.Table) -> pa.Table:
        classes, best, _top, margin = _batch_scores(
            batch, ray.get(bcast), text_col
        )
        if margin is None:
            margin = np.full(batch.num_rows, np.inf)
        want = classes.index(keep_label)
        keep = (best == want) & (margin >= min_margin)
        return batch.filter(pa.array(keep))

    return ds.map_batches(_gate, batch_format="pyarrow")
