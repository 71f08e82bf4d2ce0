"""Web-corpus curation pipeline — the RefinedWeb/C4/CCNet-shaped chain
from raw per-domain web documents to a training-ready, quality-gated,
temperature-mixed corpus, composed from the engine's web-ops stages
(semantic anchor: the reference's extract -> validate -> filter ->
export flow, widened to the published web-curation recipes: C4
repeated-line rules, Raffel et al. 2020; within-site boilerplate
removal; CCNet perplexity gating, Wenzek et al. 2020; fastText-style
quality classifiers, Brown et al. 2020 app. A; XLM-R temperature
mixing, Conneau et al. 2020).

    strip within-domain boilerplate   (text rewrite, broadcast hot set)
 -> corpus-level exact line dedup     (text rewrite, first wins)
 -> repetition gate                   (pure map, Gopher thresholds)
 -> near-dup removal                  (MinHash, drop-set broadcast)
 -> NB quality gate                   (broadcast model, optional)
 -> perplexity gate                   (CCNet head+middle, optional)
 -> temperature mix                   (order-statistics selection)

Scale shape: the two text-rewrite stages broadcast
boilerplate-/duplicate-bounded line sets; every selection stage is a
pure map against vocabulary-, model-, or cutoff-bounded broadcast
state; the only exchanges are the skinny dedup/boilerplate plans. The
payload never crosses an all-to-all, so the composition inherits each
stage's 100-TB shape and is deterministic at any parallelism.
"""

from __future__ import annotations

import pandas as pd
import ray.data

from ..stages.boilerplate import boilerplate_lines, strip_boilerplate
from ..stages.classify import NBModel, nb_filter
from ..stages.curation import temperature_mix
from ..stages.dedup import minhash_lsh_dedup
from ..stages.filters import perplexity_gate, repetition_filter
from ..stages.span_dedup import apply_line_dedup, line_dedup


def web_curation_pipeline(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    key_col: str = "doc_id",
    domain_col: str | None = "domain",
    lang_col: str | None = "lang",
    boilerplate_min_docs: int | None = 3,
    line_dedup_min_chars: int | None = 1,
    max_dup_word_frac: float | None = 0.55,
    max_top_bigram_frac: float | None = 0.08,
    minhash_threshold: float | None = 0.8,
    minhash_max_bucket_rows: int | None = None,
    quality_model: NBModel | None = None,
    keep_label: str | None = None,
    min_margin: float = 0.0,
    perplexity_keep: tuple | None = None,
    temperature_alpha: float | None = None,
    checkpoint: bool = True,
    report: dict | None = None,
) -> ray.data.Dataset:
    """Run the web-curation chain; any stage is skipped by passing its
    parameter as ``None`` (``quality_model`` and ``keep_label`` must
    come together). Pass ``report={}`` to collect per-stage surviving
    row counts — each count forces execution of the chain so far, so
    leave it ``None`` in production runs and read ``ds.stats()``
    instead.

    Stage order is the published-pipeline order: text rewrites first
    (so every later signal — repetition fractions, shingles, token
    stats — sees the cleaned text), cheap per-document gates next,
    the near-dup exchange after the corpus has shrunk, model/LM gates
    on the survivors, and the mix LAST so output proportions are
    exact over what remains.

    ``checkpoint=True`` (default) materializes after the text-rewrite
    block: the downstream multi-pass stages (the MinHash band pass,
    the perplexity gate's three passes, the mix's count) would
    otherwise RE-EXECUTE the whole rewrite chain on every pass — Ray
    datasets are lazy. The cost is object-store residency of the
    rewritten corpus (spills to disk past memory); disable only when
    the chain is consumed exactly once downstream."""

    def _mark(name: str) -> None:
        if report is not None:
            report[name] = ds.count()

    if boilerplate_min_docs is not None:
        if domain_col is None:
            raise ValueError("boilerplate stage needs domain_col")
        hot = boilerplate_lines(
            ds, text_col, key_col, domain_col, min_docs=boilerplate_min_docs
        )
        ds = strip_boilerplate(ds, hot, text_col, domain_col)
        if report is not None:
            report["boilerplate_hot_lines"] = int(len(hot))
        _mark("after_boilerplate")

    if line_dedup_min_chars is not None:
        losers = line_dedup(
            ds, text_col, key_col, min_chars=line_dedup_min_chars
        )
        ds = apply_line_dedup(ds, losers, text_col, key_col)
        if report is not None:
            report["line_dedup_loser_lines"] = int(len(losers))
        _mark("after_line_dedup")

    if checkpoint and (
        boilerplate_min_docs is not None or line_dedup_min_chars is not None
    ):
        ds = ds.materialize()

    if max_dup_word_frac is not None or max_top_bigram_frac is not None:
        ds = repetition_filter(
            ds,
            text_col=text_col,
            key_col=key_col,
            max_dup_word_frac=(
                1.0 if max_dup_word_frac is None else max_dup_word_frac
            ),
            max_top_bigram_frac=(
                1.0 if max_top_bigram_frac is None else max_top_bigram_frac
            ),
            passthrough=True,
        )
        _mark("after_repetition")

    if minhash_threshold is not None:
        ds = minhash_lsh_dedup(
            ds,
            text_col,
            key_col,
            threshold=minhash_threshold,
            max_bucket_rows=minhash_max_bucket_rows,
        )
        _mark("after_minhash")

    if (quality_model is None) != (keep_label is None):
        raise ValueError("quality_model and keep_label must come together")
    if quality_model is not None:
        ds = nb_filter(
            ds,
            quality_model,
            keep_label=keep_label,
            min_margin=min_margin,
            text_col=text_col,
        )
        _mark("after_quality_gate")

    if perplexity_keep is not None:
        if lang_col is None:
            raise ValueError("perplexity stage needs lang_col")
        ds = perplexity_gate(
            ds,
            lang_col=lang_col,
            text_col=text_col,
            key_col=key_col,
            keep=perplexity_keep,
        )
        _mark("after_perplexity")

    if temperature_alpha is not None:
        if lang_col is None:
            raise ValueError("temperature mix needs lang_col")
        ds = temperature_mix(
            ds, lang_col, key_col, alpha=temperature_alpha
        )
        _mark("after_mix")

    return ds
