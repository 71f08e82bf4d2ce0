"""domain_cap / canonical_url_dedup / add_domain_column — brute-force
pinned, partitioning-independent."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from ocr_dataset_builder_ray.functions.urltools import (
    canonicalize_url,
    registrable_domain,
)
from ocr_dataset_builder_ray.stages.curation import (
    add_domain_column,
    canonical_url_dedup,
    domain_cap,
    sample_ticket,
)


def _pages(n=120, parallelism=6):
    doms = ["alpha.example.com", "beta.co.uk", "news.beta.co.uk", "gamma.org"]
    rows = [
        {
            "url": f"http://{doms[i % 4]}/p{i}",
            "doc_id": i,
            "text": f"doc {i}",
        }
        for i in range(n)
    ]
    return rows, ray.data.from_items(rows, override_num_blocks=parallelism)


def test_add_domain_column(ray_session):
    rows, ds = _pages(8)
    df = add_domain_column(ds).to_pandas()
    assert (
        df["domain"] == df["url"].map(registrable_domain)
    ).all()
    # beta.co.uk and news.beta.co.uk group together
    assert set(df["domain"]) == {"example.com", "beta.co.uk", "gamma.org"}


def test_domain_cap_exact_and_partition_independent(ray_session):
    rows, ds = _pages(120, parallelism=6)
    capped = domain_cap(ds, 10, url_col="url", key_col="doc_id").to_pandas()
    # exact count per domain: min(k, n_g)
    got = capped.groupby("domain").size().to_dict()
    assert got == {"example.com": 10, "beta.co.uk": 10, "gamma.org": 10}

    # brute force: k smallest tickets per domain, tie by key ascending
    df = pd.DataFrame(rows)
    df["domain"] = df["url"].map(registrable_domain)
    df["ticket"] = sample_ticket(df["doc_id"].to_numpy(np.int64))
    expect = set(
        df.sort_values(["ticket", "doc_id"]).groupby("domain").head(10)["doc_id"]
    )
    assert set(capped["doc_id"]) == expect

    # partitioning independence
    _, ds1 = _pages(120, parallelism=1)
    capped1 = domain_cap(ds1, 10, url_col="url", key_col="doc_id").to_pandas()
    assert set(capped1["doc_id"]) == set(capped["doc_id"])


def test_domain_cap_dict_quotas(ray_session):
    rows, ds = _pages(120)
    capped = domain_cap(
        ds, {"example.com": 5, "beta.co.uk": 3}, url_col="url", key_col="doc_id"
    ).to_pandas()
    got = capped.groupby("domain").size().to_dict()
    assert got == {"example.com": 5, "beta.co.uk": 3}  # gamma dropped (quota 0)


def test_domain_cap_string_key_default(ray_session):
    # key_col defaults to the url (string) — hashed to int64 internally
    rows, ds = _pages(80, parallelism=4)
    capped = domain_cap(ds, 7, url_col="url").to_pandas()
    assert capped.groupby("domain").size().to_dict() == {
        "example.com": 7, "beta.co.uk": 7, "gamma.org": 7}
    assert "__key_id" not in capped.columns
    # deterministic across partitionings
    _, ds1 = _pages(80, parallelism=1)
    capped1 = domain_cap(ds1, 7, url_col="url").to_pandas()
    assert set(capped1["url"]) == set(capped["url"])


def test_domain_cap_drop_domain_col(ray_session):
    _, ds = _pages(16)
    out = domain_cap(ds, 2, url_col="url", key_col="doc_id", keep_domain_col=False)
    assert "domain" not in out.schema().names
    assert "__domain" not in out.schema().names


def test_canonical_url_dedup(ray_session):
    rows = [
        {"url": "http://A.example/x?utm_source=t", "doc_id": 3},
        {"url": "http://a.example/x", "doc_id": 1},  # same canonical, min key
        {"url": "http://a.example:80/x/", "doc_id": 2},  # same canonical
        {"url": "http://a.example/y", "doc_id": 4},
        {"url": "https://a.example/x", "doc_id": 5},  # different scheme
    ]
    ds = ray.data.from_items(rows, override_num_blocks=3)
    kept = canonical_url_dedup(ds, url_col="url", key_col="doc_id").to_pandas()
    assert sorted(kept["doc_id"]) == [1, 4, 5]
    assert "__canon_url" not in kept.columns
    # originals preserved verbatim (the winner's raw url survives)
    assert set(kept["url"]) == {
        "http://a.example/x",
        "http://a.example/y",
        "https://a.example/x",
    }
    # sanity: the three collapsed urls really canonicalize identically
    assert (
        canonicalize_url("http://A.example/x?utm_source=t")
        == canonicalize_url("http://a.example/x")
        == canonicalize_url("http://a.example:80/x/")
    )


def test_domain_cap_with_preexisting_domain_column(ray_session):
    """add_domain_column upstream of domain_cap(keep_domain_col=True)
    must not produce a duplicate 'domain' field (crashed the next
    by-name access)."""
    import pandas as pd

    from ocr_dataset_builder_ray.stages.curation import (
        add_domain_column,
        domain_cap,
    )

    df = pd.DataFrame(
        {
            "doc_id": list(range(6)),
            "url": [f"https://a.com/{i}" for i in range(4)]
            + [f"https://b.com/{i}" for i in range(2)],
        }
    )
    ds = add_domain_column(ray.data.from_pandas(df))
    out = domain_cap(ds, 2, key_col="doc_id").to_pandas()
    assert list(out.columns).count("domain") == 1
    assert out.groupby("domain")["doc_id"].count().max() <= 2
