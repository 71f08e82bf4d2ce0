"""crawl_delta / select_changed (stages/delta.py): two-snapshot
classification vs a literal dict reference, partition invariance,
and the changed-payload semi-join."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
import ray

from ocr_dataset_builder_ray.stages.delta import (
    CHANGES,
    crawl_delta,
    select_changed,
)


def _h(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


@pytest.fixture(scope="module")
def snapshots():
    """old = urls 0..99; new drops %10==0 (-> removed), rewrites the
    body of %7==0 survivors (-> modified), and adds 100..109
    (-> added); everything else is unchanged."""
    old = pd.DataFrame(
        {
            "url": [f"https://ex.com/{i}" for i in range(100)],
            "content_hash": [_h(f"body-{i}") for i in range(100)],
            "payload": [f"old-payload-{i}" for i in range(100)],
        }
    )
    new_ids = [i for i in range(100) if i % 10 != 0] + list(range(100, 110))
    new = pd.DataFrame(
        {
            "url": [f"https://ex.com/{i}" for i in new_ids],
            "content_hash": [
                _h(f"body-{i}" + ("-v2" if i % 7 == 0 and i < 100 else ""))
                for i in new_ids
            ],
            "payload": [f"new-payload-{i}" for i in new_ids],
        }
    )
    expect = {}
    for i in range(100):
        u = f"https://ex.com/{i}"
        if i % 10 == 0:
            expect[u] = "removed"  # present only in the old snapshot
        elif i % 7 == 0:
            expect[u] = "modified"
        else:
            expect[u] = "unchanged"
    for i in range(100, 110):
        expect[f"https://ex.com/{i}"] = "added"  # only in the new one
    return old, new, expect


@pytest.mark.parametrize("parts", [1, 7])
def test_crawl_delta_matches_reference(ray_session, snapshots, parts):
    old, new, expect = snapshots
    got = (
        crawl_delta(
            ray.data.from_pandas(old).repartition(parts),
            ray.data.from_pandas(new).repartition(parts),
            num_partitions=4,
        )
        .to_pandas()
        .set_index("url")["change"]
        .to_dict()
    )
    assert got == expect
    assert set(got.values()) == set(CHANGES)


def test_crawl_delta_hash_columns(ray_session, snapshots):
    old, new, _ = snapshots
    idx = (
        crawl_delta(ray.data.from_pandas(old), ray.data.from_pandas(new))
        .to_pandas()
        .set_index("url")
    )
    row = idx.loc["https://ex.com/7"]
    assert row["change"] == "modified"
    assert row["old_content_hash"] == _h("body-7")
    assert row["new_content_hash"] == _h("body-7-v2")
    # one-sided rows carry a null for the absent side
    assert pd.isna(idx.loc["https://ex.com/10", "new_content_hash"])
    assert pd.isna(idx.loc["https://ex.com/105", "old_content_hash"])


def test_select_changed_fetches_new_payload(ray_session, snapshots):
    old, new, expect = snapshots
    old_ds, new_ds = ray.data.from_pandas(old), ray.data.from_pandas(new)
    delta = crawl_delta(old_ds, new_ds)
    got = select_changed(new_ds, delta).to_pandas()
    want = {u for u, c in expect.items() if c in ("added", "modified")}
    assert set(got["url"]) == want
    # payload comes from the NEW snapshot
    assert all(p.startswith("new-payload-") for p in got["payload"])
    with pytest.raises(ValueError):
        select_changed(new_ds, delta, keep=("bogus",))


def test_select_changed_identical_snapshots(ray_session, snapshots):
    """No changes at all (identical snapshots) must yield an empty
    result, not a schema error from the empty key set."""
    _, new, _ = snapshots
    ds = ray.data.from_pandas(new)
    got = select_changed(ds, crawl_delta(ds, ds))
    assert got.count() == 0


def test_dup_keys_reduced_deterministically(ray_session):
    old = pd.DataFrame(
        {"url": ["u", "u"], "content_hash": ["b", "a"], "payload": ["x", "y"]}
    )
    new = pd.DataFrame({"url": ["u"], "content_hash": ["a"], "payload": ["z"]})
    got = crawl_delta(
        ray.data.from_pandas(old), ray.data.from_pandas(new)
    ).to_pandas()
    assert len(got) == 1 and got.loc[0, "change"] == "unchanged"
