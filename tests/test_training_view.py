"""Training-view tests (J1 join graft: one wide table, no shuffle)."""

import pytest

from ocr_dataset_builder_ray.pipelines.training_view import training_view
from ocr_dataset_builder_ray.sources.pages import pages_parquet_files


@pytest.fixture(scope="module")
def view(ray_session, pages_corpus):
    return (
        training_view(pages_parquet_files(pages_corpus))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )


def test_schema_and_rowcount(view):
    assert list(view.columns) == [
        "url",
        "warc_ts",
        "lang",
        "clean_text",
        "noisy_text",
        "augmented_text",
        "aug_profile",
        "n_tokens",
        "quality_score",
        "status",
    ]
    assert len(view) == 198  # 200 rows minus the 2 losing recaptures


def test_triples_are_coherent(view):
    ok = view[view["status"] == "ok"]
    content = ok[ok["clean_text"].str.len() > 0]
    assert len(content) > 100
    # augmentation degrades but stays related: non-empty and deterministic profile
    assert (content["augmented_text"].str.len() > 0).all()
    assert content["aug_profile"].str.len().gt(0).all()
    # noisy column came through the wide table untouched for article rows
    assert (content["noisy_text"].str.len() > 0).sum() > 80


def test_deterministic_across_runs(ray_session, pages_corpus, view):
    again = (
        training_view(pages_parquet_files(pages_corpus), concurrency=(1, 2), batch_size=32)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    for col in ("clean_text", "augmented_text", "aug_profile"):
        assert list(view[col]) == list(again[col]), col
