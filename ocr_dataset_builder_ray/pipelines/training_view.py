"""Denormalized training view — the J1 join graft.

The reference's ``OcrMultimodalDataset`` materializes a strict 4-way
inner join of frames × LLM batches × Tesseract JSON × original metadata
keyed on (video_id, frame) at ``__getitem__`` time
(data/pytorch_dataset.py:41-98,270-488), then optionally applies an
augmentation to the clean text (data/pytorch_dataset.py:596-601).

Ray-Data-first, the join is avoided entirely by keeping ONE wide table
through the pipeline (SURVEY.md §2.5 J1: "avoid joins by keeping one
wide table"): the raw ``text`` column (≙ Tesseract side) rides along
through the extraction stage by positional alignment within each batch
— ``ExtractPages`` preserves row order — so no key shuffle ever
happens. Augmentation is seeded on the url hash (fixing the
reference's unseeded ``random.choice``, M14) and produced as a THIRD
text column, giving (noisy, clean, augmented) triples per document:

    training(url, warc_ts, lang, clean_text, noisy_text,
             augmented_text, aug_profile, n_tokens, quality_score,
             status)
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..functions.augment import apply_profile, profile_for_key
from ..functions.textstats import quality_features
from ..stages.extract import ExtractPages
from .extraction import filter_to_winners, plan_dedup_winners


class TrainingRowStage:
    """Actor-pool stage: extraction + passthrough of the noisy column +
    seeded augmentation + quality scoring, one batch in/out."""

    def __init__(self) -> None:
        self._extract = ExtractPages()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = self._extract(batch)
        clean = out["extracted_text"].to_pylist()
        urls = out["url"].to_pylist()
        profiles: list[str] = []
        augmented: list[str] = []
        quality: list[float] = []
        for url, text in zip(urls, clean):
            prof = profile_for_key(url)
            profiles.append(prof)
            augmented.append(apply_profile(prof, text, url) if text else "")
            quality.append(quality_features(text)["quality_score"] if text else 0.0)
        return pa.table(
            {
                "url": out["url"],
                "warc_ts": out["warc_ts"],
                "lang": out["lang"],
                "clean_text": out["extracted_text"],
                "noisy_text": batch["text"],
                "augmented_text": pa.array(augmented, type=pa.large_string()),
                "aug_profile": pa.array(profiles, type=pa.string()),
                "n_tokens": out["n_tokens"],
                "quality_score": pa.array(quality, type=pa.float64()),
                "status": out["status"],
            }
        )


def training_view(
    paths: str | list[str],
    *,
    dedup: bool = True,
    concurrency: int | tuple[int, int] | None = (1, 8),
    batch_size: int | None = 128,
) -> ray.data.Dataset:
    """pages parquet → (noisy, clean, augmented) training triples."""
    ds = ray.data.read_parquet(paths)  # needs all five input columns
    if dedup:
        dup_urls, winner_keys, ambiguous = plan_dedup_winners(paths)
        ds = filter_to_winners(ds, dup_urls, winner_keys, ambiguous)
        # ambiguous same-url-same-ts ties are vanishingly rare; for the
        # training view (not the byte-exact flagship) keeping both
        # captures of a tie is acceptable and avoids a payload shuffle
    return ds.map_batches(
        TrainingRowStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def iter_training_batches(
    ds: ray.data.Dataset,
    *,
    batch_size: int = 32,
    epoch: int | None = None,
    shuffle_buffer_size: int | None = None,
    seed: int = 42,
):
    """Training-consumer adapter — the reference's PyTorch ``Dataset``
    (data/pytorch_dataset.py:41-98) re-expressed as a streaming batch
    iterator with on-the-fly augmentation (its ``transform`` hook,
    data/pytorch_dataset.py:596-601).

    Yields dict batches (column → list/ndarray) of the training-view
    triples. ``epoch=None`` keeps the precomputed ``augmented_text``
    column; ``epoch=k`` RE-augments on the fly with the profile and RNG
    seeded on ``url:k`` — a fresh deterministic noising per epoch, the
    fix for the reference's unseeded ``random.choice`` applied at
    consumption time. ``shuffle_buffer_size`` enables Ray's local
    shuffle (seeded). With torch installed the same Dataset feeds
    ``iter_torch_batches`` directly; this adapter holds the
    augmentation semantics either way and never materializes the view.
    """
    it = ds.iter_batches(
        batch_size=batch_size,
        batch_format="pandas",
        local_shuffle_buffer_size=shuffle_buffer_size,
        local_shuffle_seed=seed if shuffle_buffer_size else None,
    )
    for df in it:
        batch = {c: df[c].tolist() for c in df.columns}
        if epoch is not None:
            keys = [f"{u}:{epoch}" for u in batch["url"]]
            profs = [profile_for_key(k) for k in keys]
            batch["aug_profile"] = profs
            batch["augmented_text"] = [
                apply_profile(p, t, k) if t else ""
                for p, t, k in zip(profs, batch["clean_text"], keys)
            ]
        yield batch
