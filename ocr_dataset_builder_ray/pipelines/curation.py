"""End-to-end corpus-curation pipeline: the chain a training-data run
executes between extraction and export, composed from the engine's
curation/filter/dedup stages (semantic anchor: the reference's
extract -> validate -> filter -> export flow, e.g.
data/extract_text_dataset.py, generalized to corpus-level policies).

    repetition gate  ->  decontamination  ->  exact dedup  ->  source mix

Every stage is either a pure map (repetition, decontamination), a
duplicate-bounded skinny exchange (exact dedup), or a broadcast-cutoff
selection (mix) — the document payload never crosses an all-to-all, so
the composition inherits each stage's 100-TB shape. The whole chain is
deterministic at any parallelism and has a single composed SQL oracle
(pipelines/queries.py q55).
"""

from __future__ import annotations

import ray.data

from ..stages.curation import mix_to_proportions
from ..stages.dedup import exact_dedup
from ..stages.filters import (
    benchmark_window_hashes,
    decontaminate,
    repetition_filter,
)


def curation_pipeline(
    ds: ray.data.Dataset,
    bench_ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    key_col: str = "doc_id",
    group_col: str = "lang",
    max_dup_word_frac: float = 0.55,
    max_top_bigram_frac: float = 0.08,
    window: int = 4,
    proportions: dict | None = None,
) -> ray.data.Dataset:
    """Run the full curation chain; returns the curated dataset with
    the input's columns (selection-only — no stage rewrites text).

    Stage order matters and is the published-pipeline order: cheap
    per-document gates first (repetition), then the benchmark
    decontamination map, then cross-document dedup (so the dedup
    exchange sees an already-shrunk corpus), and the mix LAST so the
    output proportions are exact over surviving documents.
    """
    gated = repetition_filter(
        ds,
        text_col=text_col,
        key_col=key_col,
        max_dup_word_frac=max_dup_word_frac,
        max_top_bigram_frac=max_top_bigram_frac,
        passthrough=True,
    )
    bench_hashes = benchmark_window_hashes(bench_ds, text_col=text_col, w=window)
    clean = decontaminate(
        gated, bench_hashes, text_col=text_col, key_col=key_col, w=window
    )
    deduped = exact_dedup(clean, text_col, key_col)
    if proportions:
        return mix_to_proportions(deduped, group_col, key_col, proportions)
    return deduped
