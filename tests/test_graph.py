"""Link graph: url canonicalization, href extraction, PageRank.

PageRank correctness is pinned against a dense numpy power iteration
(same damping / dangling conventions) on seeded random graphs, plus
hand-checked tiny graphs; determinism across parallelism is pinned to
1e-12 relative (float addition order follows block boundaries — see
stages/graph.py module docstring) with exact top-k under the rounded
selection rule.
"""

import numpy as np
import pandas as pd
import pytest

import ray.data

from ocr_dataset_builder_ray.functions.urltools import (
    canonicalize_url,
    extract_hrefs,
    hash_nodes_int64,
    registrable_domain,
)
from ocr_dataset_builder_ray.stages.graph import extract_links, pagerank


# -- urltools ------------------------------------------------------------


@pytest.mark.parametrize(
    "raw,canon",
    [
        ("HTTP://Example.COM:80/A/b/", "http://example.com/A/b"),
        ("https://example.com:443/", "https://example.com/"),
        ("https://example.com:8443/x", "https://example.com:8443/x"),
        ("http://example.com", "http://example.com/"),
        ("http://example.com/p?utm_source=t&b=2&a=1#frag", "http://example.com/p?a=1&b=2"),
        ("http://example.com/p?fbclid=xyz", "http://example.com/p"),
        ("ftp://example.com/x", ""),
        ("mailto:a@b.c", ""),
        ("", ""),
        (None, ""),
        ("http://trailing.dot./x", "http://trailing.dot/x"),
        ("http:///nopath", ""),
    ],
)
def test_canonicalize_url(raw, canon):
    assert canonicalize_url(raw) == canon


def test_canonicalize_idempotent():
    urls = [
        "HTTP://A.example:80/x/?utm_medium=m&z=1&a=2#f",
        "https://b.example/path/sub/",
        "http://c.example/?gclid=1",
    ]
    once = [canonicalize_url(u) for u in urls]
    assert [canonicalize_url(u) for u in once] == once


@pytest.mark.parametrize(
    "host,dom",
    [
        ("news.bbc.co.uk", "bbc.co.uk"),
        ("bbc.co.uk", "bbc.co.uk"),
        ("a.b.example.com", "example.com"),
        ("example.com", "example.com"),
        ("localhost", "localhost"),
        ("www.shop.com.au", "shop.com.au"),
        ("http://Sub.Example.ORG/path", "example.org"),
        ("192.168.0.1", "192.168.0.1"),
        ("", ""),
        (None, ""),
    ],
)
def test_registrable_domain(host, dom):
    assert registrable_domain(host) == dom


def test_extract_hrefs():
    html = b"""
    <html><body>
      <a href="/rel/page">rel</a>
      <a href='http://Other.example/abs?utm_source=x'>abs</a>
      <a href=bare>bare</a>
      <a href="#frag">frag-only</a>
      <a href="mailto:x@y.z">mail</a>
      <a href="javascript:void(0)">js</a>
      <a href="/rel/page">dup</a>
      <a href="http://base.example/self">self</a>
    </body></html>
    """
    links = extract_hrefs(html, "http://base.example/self")
    assert links == [
        "http://base.example/rel/page",
        "http://other.example/abs",
        "http://base.example/bare",
    ]
    assert extract_hrefs(None, "http://x/") == []
    assert extract_hrefs(b"<p>no links</p>", "http://x/") == []
    # cap respected
    farm = b"".join(b'<a href="/l%d">x</a>' % i for i in range(50))
    assert len(extract_hrefs(farm, "http://f.example/", max_links=10)) == 10


# -- numpy reference PageRank --------------------------------------------


def _dense_pagerank(edges, damping=0.85, n_iter=20):
    """Dense reference: same conventions as stages/graph.pagerank
    (duplicate edges count with multiplicity, dangling mass spread
    uniformly, uniform teleport)."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    M = np.zeros((n, n))
    for s, d in edges:
        M[idx[d], idx[s]] += 1.0
    outdeg = M.sum(axis=0)
    col = np.divide(M, outdeg, out=np.zeros_like(M), where=outdeg > 0)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        dangling = r[outdeg == 0].sum()
        r = (1 - damping) / n + damping * (col @ r + dangling / n)
    return nodes, r


def _edges_ds(edges, parallelism=4):
    return ray.data.from_items(
        [{"src": s, "dst": d} for s, d in edges], override_num_blocks=parallelism
    )


def test_pagerank_matches_dense_reference(ray_session):
    rng = np.random.default_rng(7)
    n_nodes, n_edges = 60, 400
    edges = [
        (f"http://n{int(a)}.example/", f"http://n{int(b)}.example/")
        for a, b in rng.integers(0, n_nodes, size=(n_edges, 2))
        if a != b
    ]
    nodes_ref, r_ref = _dense_pagerank(edges, n_iter=25)
    pr = pagerank(_edges_ds(edges), n_iter=25)
    assert pr.n_nodes == len(nodes_ref)
    assert pr.n_edges == len(edges)
    got = pr.rank_of(nodes_ref)
    assert np.allclose(got, r_ref, rtol=1e-9, atol=1e-12)
    assert abs(pr.ranks.sum() - 1.0) < 1e-9


def test_pagerank_dangling_and_hub(ray_session):
    # star: a,b,c -> hub; hub dangles. Hub must outrank the leaves.
    edges = [("a", "hub"), ("b", "hub"), ("c", "hub")]
    pr = pagerank(_edges_ds(edges, parallelism=2), n_iter=30)
    nodes_ref, r_ref = _dense_pagerank(edges, n_iter=30)
    assert np.allclose(pr.rank_of(nodes_ref), r_ref, rtol=1e-9)
    ranks = dict(zip(nodes_ref, r_ref))
    assert pr.rank_of(["hub"])[0] == pytest.approx(ranks["hub"])
    assert pr.rank_of(["hub"])[0] > pr.rank_of(["a"])[0]
    # unknown node scores 0
    assert pr.rank_of(["zzz-not-a-node"])[0] == 0.0


def test_pagerank_parallelism_invariant(ray_session):
    rng = np.random.default_rng(11)
    edges = [
        (f"u{int(a)}", f"u{int(b)}")
        for a, b in rng.integers(0, 40, size=(300, 2))
    ]
    pr1 = pagerank(_edges_ds(edges, parallelism=1), n_iter=15)
    pr8 = pagerank(_edges_ds(edges, parallelism=8), n_iter=15)
    assert np.array_equal(pr1.node_ids, pr8.node_ids)
    assert np.allclose(pr1.ranks, pr8.ranks, rtol=1e-12, atol=1e-15)
    # selection-grade ordering identical under the rounded top-k rule
    pd.testing.assert_frame_equal(
        pr1.top_k(10).reset_index(drop=True).round({"rank": 9}),
        pr8.top_k(10).reset_index(drop=True).round({"rank": 9}),
    )


def test_pagerank_tol_early_stop(ray_session):
    edges = [("a", "b"), ("b", "a")]
    pr = pagerank(_edges_ds(edges, parallelism=1), n_iter=50, tol=1e-12)
    assert pr.iterations < 50
    assert pr.delta <= 1e-12
    assert np.allclose(pr.ranks, 0.5)


def test_pagerank_int_keys_and_empty(ray_session):
    edges_int = ray.data.from_items(
        [{"src": 1, "dst": 2}, {"src": 2, "dst": 3}, {"src": 3, "dst": 1}]
    )
    pr = pagerank(edges_int, n_iter=40)
    assert np.allclose(pr.ranks, 1 / 3, atol=1e-9)  # 3-cycle is uniform
    assert np.array_equal(np.sort(pr.node_ids), pr.node_ids)
    # empty edge set
    pr0 = pagerank(_edges_ds([("a", "b")]).filter(lambda r: False), n_iter=5)
    assert pr0.n_nodes == 0 and pr0.n_edges == 0


def test_extract_links_and_attach(ray_session):
    pages = ray.data.from_items(
        [
            {
                "url": "http://s1.example/",
                "html": b'<a href="/p1">a</a><a href="http://s2.example/">b</a>',
            },
            {
                "url": "http://s2.example/",
                "html": b'<a href="http://s1.example/p1?utm_source=x">c</a>',
            },
            {"url": "http://s3.example/", "html": None},
        ]
    )
    edges = extract_links(pages)
    df = edges.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert list(df.itertuples(index=False, name=None)) == [
        ("http://s1.example/", "http://s1.example/p1"),
        ("http://s1.example/", "http://s2.example/"),
        ("http://s2.example/", "http://s1.example/p1"),
    ]
    pr = pagerank(edges, n_iter=20)
    scored = pr.attach(pages, "url", out_col="pagerank").to_pandas()
    assert set(scored.columns) >= {"url", "pagerank"}
    # s3 has no edges at all -> default 0; s2 is linked -> positive
    by_url = dict(zip(scored["url"], scored["pagerank"]))
    assert by_url["http://s3.example/"] == 0.0
    assert by_url["http://s2.example/"] > 0.0
    # attach agrees with rank_of
    assert by_url["http://s2.example/"] == pytest.approx(
        pr.rank_of(["http://s2.example/"])[0]
    )


def test_extract_links_anchor_text(ray_session):
    pages = ray.data.from_items(
        [
            {
                "url": "http://s.example/",
                "html": b'<a href="/a"><b>Bold</b> label </a>'
                b'<a href="/b">plain</a><a href="/c"></a>',
            }
        ]
    )
    df = extract_links(pages, with_anchor_text=True).to_pandas()
    by_dst = dict(zip(df["dst"], df["anchor"]))
    assert by_dst["http://s.example/a"] == "Bold label"
    assert by_dst["http://s.example/b"] == "plain"
    assert by_dst["http://s.example/c"] == ""


def _brute_anchor_texts(rows, k=20, sep=" | "):
    from ocr_dataset_builder_ray.functions.urltools import hash_nodes_int64

    df = pd.DataFrame(rows)
    df["tick"] = hash_nodes_int64(df["src"].tolist())
    out = {}
    for dst, g in df.groupby("dst"):
        cand = g[g["anchor"] != ""].copy()
        # per-text representative tick = min tick, then k smallest
        # (tick, text) — mirrors the operator's order-independent rule
        cand = cand.sort_values(["tick", "anchor"], kind="stable")
        cand = cand.drop_duplicates(["anchor"])
        cand = cand.sort_values(["tick", "anchor"], kind="stable").head(k)
        out[dst] = (len(g), sep.join(cand["anchor"]))
    return out


def test_anchor_texts_matches_brute_force(ray_session):
    from ocr_dataset_builder_ray.stages.graph import anchor_texts

    rng = np.random.default_rng(3)
    rows = [
        {
            "src": f"http://s{int(i)}.example/",
            "dst": f"http://t{int(rng.integers(0, 12))}.example/",
            "anchor": ["click here", "more", "docs", ""][int(rng.integers(0, 4))],
        }
        for i in range(300)
    ]
    expect = _brute_anchor_texts(rows, k=2)
    for par in (1, 8):
        ds = ray.data.from_items(rows, override_num_blocks=par)
        got = anchor_texts(ds, k=2).to_pandas()
        assert len(got) == len(expect)
        for _, r in got.iterrows():
            n, anch = expect[r["dst"]]
            assert r["n_inlinks"] == n
            assert r["anchors"] == anch
        assert "__b" not in got.columns


def test_anchor_texts_hot_dst_bounded(ray_session):
    # one target with EVERY in-link: partials keep <= k rows per batch,
    # output anchors joins exactly k distinct texts
    from ocr_dataset_builder_ray.stages.graph import anchor_texts

    rows = [
        {"src": f"http://s{i}.example/", "dst": "http://hot.example/",
         "anchor": f"anchor {i}"}
        for i in range(500)
    ]
    ds = ray.data.from_items(rows, override_num_blocks=10)
    got = anchor_texts(ds, k=5).to_pandas()
    assert len(got) == 1
    assert got.iloc[0]["n_inlinks"] == 500
    assert len(got.iloc[0]["anchors"].split(" | ")) == 5
    expect = _brute_anchor_texts(rows, k=5)
    assert got.iloc[0]["anchors"] == expect["http://hot.example/"][1]


def test_cli_linkrank(ray_session, tmp_path, capsys):
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_dataset_builder_ray.cli import main

    rows = {
        "url": [f"http://h{i}.example/" for i in range(20)],
        "html": [
            f'<a href="http://h{(i + 1) % 20}.example/">next</a>'
            f'<a href="http://h0.example/">home</a>'.encode()
            for i in range(20)
        ],
    }
    src = str(tmp_path / "pages.parquet")
    pq.write_table(pa.table({"url": rows["url"],
                             "html": pa.array(rows["html"], pa.binary())}), src)
    out_dir = str(tmp_path / "ranks")
    assert main(["linkrank", "--input", src, "--output", out_dir,
                 "--iters", "15", "--top", "3"]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # h0 drops its self-link, h19's next==home dedups: 18*2 + 1 + 1
    assert res["nodes"] == 20 and res["edges"] == 38
    assert res["iterations"] == 15 and len(res["top_node_ids"]) == 3
    ranked = ray.data.read_parquet(out_dir).to_pandas()
    assert set(ranked.columns) == {"url", "pagerank"}
    # the universally-linked home page dominates
    assert ranked.loc[ranked["pagerank"].idxmax(), "url"] == "http://h0.example/"


def test_hash_nodes_roundtrip_determinism():
    a = hash_nodes_int64(["x", "y", "x"])
    assert a.dtype == np.int64
    assert a[0] == a[2] != a[1]


# --- url_filter (crawl-policy gate) ----------------------------------------


def test_url_filter(ray_session):
    import pandas as pd

    from ocr_dataset_builder_ray.functions.urltools import url_filter

    df = pd.DataFrame(
        {
            "doc_id": list(range(7)),
            "url": [
                "http://good.example.com/page",
                "https://spam.bad.net/x",
                "http://sub.good.example.com/other",
                "http://tracker.io/click?utm_source=a",
                "http://good.example.com/ads/banner",
                "http://neutral.org/fine",
                "http://GOOD.example.com/casing",
            ],
        }
    )
    ds = ray.data.from_pandas(df)
    # block a domain
    got = url_filter(ds, block_domains=["bad.net"]).to_pandas()
    assert 1 not in set(got["doc_id"]) and len(got) == 6
    # allow-list keeps only matching registrable domains (subdomains
    # and casing included)
    got2 = url_filter(ds, allow_domains=["example.com"]).to_pandas()
    assert set(got2["doc_id"]) == {0, 2, 4, 6}
    # RE2 pattern on the canonical form
    got3 = url_filter(
        ds, block_url_patterns=[r"/ads/", r"^https?://tracker\."]
    ).to_pandas()
    assert set(got3["doc_id"]) == {0, 1, 2, 5, 6}
    # composition: allow + pattern
    got4 = url_filter(
        ds, allow_domains=["example.com"], block_url_patterns=[r"/ads/"]
    ).to_pandas()
    assert set(got4["doc_id"]) == {0, 2, 6}


# -- rank-exchange (distributed) PageRank engine --------------------------


def _dist_ranks_aligned(dpr, nodes):
    """Rank array for `nodes` (canonical node order) from the
    distributed result's Dataset, via the same hash-id convention."""
    ids = hash_nodes_int64(list(nodes))
    df = dpr.ranks.to_pandas()
    lut = dict(zip(df["node_id"], df["rank"]))
    return np.array([lut.get(i, 0.0) for i in ids])


def test_pagerank_engine_equality(ray_session):
    # string urls -> hash ids exercise the negative-id half of the
    # int64 range through bucketing and the exchange schema
    rng = np.random.default_rng(23)
    edges = [
        (f"http://n{int(a)}.example/", f"http://n{int(b)}.example/")
        for a, b in rng.integers(0, 80, size=(500, 2))
        if a != b
    ]
    nodes_ref, r_ref = _dense_pagerank(edges, n_iter=12)
    pr_b = pagerank(_edges_ds(edges), n_iter=12, engine="driver")
    pr_d = pagerank(_edges_ds(edges), n_iter=12, engine="distributed")
    assert pr_d.n_nodes == pr_b.n_nodes == len(nodes_ref)
    assert pr_d.n_edges == pr_b.n_edges == len(edges)
    got_d = _dist_ranks_aligned(pr_d, nodes_ref)
    # both engines match the dense reference and each other
    assert np.allclose(got_d, r_ref, rtol=1e-9, atol=1e-12)
    assert np.allclose(got_d, pr_b.rank_of(nodes_ref), rtol=1e-9, atol=1e-12)
    assert abs(got_d.sum() - 1.0) < 1e-9
    # identical rounded top-k selection (node ids differ in type:
    # broadcast result keys by hash id too, so compare directly)
    tk_b = pr_b.top_k(12).reset_index(drop=True)
    tk_d = pr_d.top_k(12).reset_index(drop=True)
    assert list(tk_b["node_id"]) == list(tk_d["node_id"])
    assert np.allclose(tk_b["rank"], tk_d["rank"], rtol=1e-9)


def test_pagerank_distributed_parallelism_invariant(ray_session):
    rng = np.random.default_rng(29)
    edges = [
        (f"u{int(a)}", f"u{int(b)}")
        for a, b in rng.integers(0, 50, size=(400, 2))
    ]
    d1 = pagerank(_edges_ds(edges, parallelism=1), n_iter=7,
                  engine="distributed")
    d8 = pagerank(_edges_ds(edges, parallelism=8), n_iter=7,
                  engine="distributed")
    f1 = d1.ranks.to_pandas().sort_values("node_id").reset_index(drop=True)
    f8 = d8.ranks.to_pandas().sort_values("node_id").reset_index(drop=True)
    assert np.array_equal(f1["node_id"], f8["node_id"])
    # bit-identical: every reduce is a pure function of its multiset
    assert np.array_equal(f1["rank"].to_numpy(), f8["rank"].to_numpy())
    assert d1.delta == d8.delta


def test_pagerank_auto_escalation_and_driver_refusal(ray_session):
    from ocr_dataset_builder_ray.stages.graph import DistributedPageRankResult

    edges = [(f"a{i}", f"b{i % 7}") for i in range(40)]
    # auto with a tiny bound escalates to the exchange engine
    pr = pagerank(_edges_ds(edges), n_iter=8, engine="auto",
                  driver_node_limit=10)
    assert isinstance(pr, DistributedPageRankResult)
    # driver engine refuses loudly past the bound instead of collecting
    with pytest.raises(ValueError, match="driver broadcast bound"):
        pagerank(_edges_ds(edges), n_iter=8, engine="driver",
                 driver_node_limit=10)
    # under the bound, auto stays on the broadcast path
    pr_small = pagerank(_edges_ds(edges), n_iter=8, engine="auto")
    assert not isinstance(pr_small, DistributedPageRankResult)
    # equality auto-escalated vs broadcast
    nodes_ref, r_ref = _dense_pagerank(edges, n_iter=8)
    assert np.allclose(_dist_ranks_aligned(pr, nodes_ref), r_ref, rtol=1e-9)


def test_pagerank_distributed_attach_and_empty(ray_session):
    pages = ray.data.from_items(
        [
            {"url": "http://s1.example/",
             "html": b'<a href="http://s2.example/">x</a>'},
            {"url": "http://s2.example/",
             "html": b'<a href="http://s1.example/">y</a>'},
            {"url": "http://s3.example/", "html": None},
        ]
    )
    edges = extract_links(pages)
    pr_b = pagerank(edges, n_iter=10, engine="driver")
    pr_d = pagerank(edges, n_iter=10, engine="distributed")
    sb = pr_b.attach(pages, "url", out_col="pagerank").to_pandas()
    sd = pr_d.attach(pages, "url", out_col="pagerank").to_pandas()
    mb = dict(zip(sb["url"], sb["pagerank"]))
    md = dict(zip(sd["url"], sd["pagerank"]))
    assert set(mb) == set(md)
    for u in mb:
        assert md[u] == pytest.approx(mb[u], rel=1e-9, abs=1e-15)
    assert md["http://s3.example/"] == 0.0
    assert set(sd.columns) == set(sb.columns)
    # empty edge sets produce an empty but well-formed result
    pr0 = pagerank(_edges_ds([("a", "b")]).filter(lambda r: False),
                   n_iter=5, engine="distributed")
    assert pr0.n_nodes == 0 and pr0.n_edges == 0
    assert len(pr0.top_k(3)) == 0
