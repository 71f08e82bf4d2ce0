"""Training-consumer adapter: streaming triple iteration with on-the-fly
per-epoch seeded augmentation (reference data/pytorch_dataset.py:41-98,
596-601 semantics, torch-free)."""

import pytest

from ocr_dataset_builder_ray.pipelines.training_view import (
    iter_training_batches,
    training_view,
)
from ocr_dataset_builder_ray.sources.pages import generate_pages_corpus


@pytest.fixture(scope="module")
def view(ray_session, tmp_path_factory):
    corpus = generate_pages_corpus(
        str(tmp_path_factory.mktemp("c") / "pages"), n_rows=60, rows_per_file=30
    )
    return training_view(corpus).materialize()


def _collect(view, **kw):
    rows = {}
    for batch in iter_training_batches(view, batch_size=16, **kw):
        assert {"url", "clean_text", "noisy_text", "augmented_text", "aug_profile"} <= set(batch)
        for i, u in enumerate(batch["url"]):
            rows[u] = (batch["clean_text"][i], batch["augmented_text"][i], batch["aug_profile"][i])
    return rows


def test_iterates_triples_stored_augmentation(view):
    rows = _collect(view)
    assert len(rows) == 58  # 60 minus the url-6/7/8 collapse
    some = [v for v in rows.values() if v[0]]
    assert some, "expected non-empty clean texts"


def test_epoch_reaugmentation_deterministic_and_fresh(view):
    e1a = _collect(view, epoch=1)
    e1b = _collect(view, epoch=1)
    assert e1a == e1b  # per-epoch determinism

    stored = _collect(view)
    e2 = _collect(view, epoch=2)
    # at least some documents get a different noising per epoch
    diff_vs_stored = sum(1 for u in stored if stored[u][1] != e1a[u][1] and stored[u][0])
    diff_vs_e1 = sum(1 for u in e1a if e1a[u][1] != e2[u][1] and e1a[u][0])
    assert diff_vs_stored > 0 and diff_vs_e1 > 0
    # clean text untouched by the consumer
    assert all(stored[u][0] == e1a[u][0] for u in stored)


def test_local_shuffle_smoke(view):
    rows = _collect(view, shuffle_buffer_size=32)
    assert len(rows) == 58
