"""Link-graph operators: href extraction and distributed PageRank.

The web-corpus quality signal the reference (a filesystem OCR pipeline)
never needed but a crawl-scale curation engine does: build the
(src, dst) hyperlink graph from raw pages and score every url with
PageRank, then use the score as a curation feature (join back via a
broadcast map, feed ``quality_percentile_filter`` etc.).

Scale contract (stated, per the engine's bound-every-collect rule):

* **Edges stream** — the edge set is corpus-scaled and only ever
  crosses the cluster as a skinny ``(int64 src, int64 dst)``
  projection, materialized ONCE and re-read per iteration from the
  object store.
* **Two rank engines.** ``engine="driver"`` keeps the rank vector as
  node-bounded driver/broadcast state — sorted node-id, out-degree and
  rank arrays (24 B/node) broadcast per iteration via ``ray.put`` (the
  ``unigram_logprob`` broadcast-scoring pattern, filters.py:428); the
  standard "ranks fit in memory, edges don't" regime, refused loudly
  past ``_DRIVER_NODE_LIMIT`` nodes. Past the bound (at 10⁹ nodes the
  vectors are ~24 GB) ``engine="auto"`` escalates to the rank-exchange
  engine: the node table is sharded by id bucket and every iteration
  is two ``groupby(bucket)`` exchanges — (state ∪ edges-by-src-bucket)
  emits partial contributions keyed by dst bucket, (state ∪ messages)
  applies the update — with only per-bucket dangling/delta scalars on
  the driver.
* Per-iteration reduction collects per-BLOCK partial sums
  ``(dst, contrib)`` — at most ``unique_dst_per_block × n_blocks``
  rows, the same blocks-bounded collect as ``profile_columns``.

Determinism: node ids, degrees, edge sets and iteration count are
exactly deterministic at any parallelism. Rank VALUES are float64 sums
whose addition order follows block boundaries, so across different
parallelism levels they agree to ~1e-12 relative (tests pin allclose),
and selection-grade ordering uses ``top_k`` which rounds to 9 dp with
an id tie-break — the q56/bm25 rounding-before-cut rule.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.urltools import extract_hrefs_with_text, hash_nodes_int64

__all__ = [
    "extract_links",
    "pagerank",
    "PageRankResult",
    "DistributedPageRankResult",
    "anchor_texts",
]


def extract_links(
    pages: ray.data.Dataset,
    *,
    url_col: str = "url",
    html_col: str = "html",
    max_links_per_page: int = 1000,
    with_anchor_text: bool = False,
) -> ray.data.Dataset:
    """pages(url, html, ...) → edges(src, dst[, anchor]) —
    canonicalized, per-page-deduped outgoing http(s) hyperlinks.

    Pure flat map (one read task's pages → its edge rows; no shuffle).
    The per-row regex walk is the string kernel itself, same judgment
    as ``ExtractPages``. Self-links and in-page duplicate targets are
    dropped; one page emits at most ``max_links_per_page`` edges so a
    link farm cannot produce an unbounded row. With
    ``with_anchor_text`` each edge carries the (tag-stripped, capped)
    anchor text for :func:`anchor_texts` aggregation.
    """

    def _edges(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col).to_pylist()
        htmls = batch.column(html_col).to_pylist()
        src: list[str] = []
        dst: list[str] = []
        anchors: list[str] = []
        for u, h in zip(urls, htmls):
            if not u:
                continue
            pairs = extract_hrefs_with_text(
                h, u, max_links=max_links_per_page, with_text=with_anchor_text
            )
            src.extend([u] * len(pairs))
            dst.extend(p[0] for p in pairs)
            if with_anchor_text:
                anchors.extend(p[1] for p in pairs)
        cols = {
            "src": pa.array(src, type=pa.string()),
            "dst": pa.array(dst, type=pa.string()),
        }
        if with_anchor_text:
            cols["anchor"] = pa.array(anchors, type=pa.string())
        return pa.table(cols)

    return pages.select_columns([url_col, html_col]).map_batches(
        _edges, batch_format="pyarrow"
    )


@dataclass
class PageRankResult:
    """Broadcastable PageRank scores: sorted node ids + aligned ranks.

    ``attach`` is the join-free way to use the scores — a broadcast
    searchsorted map over any dataset with a node column, exactly how
    ``unigram_logprob`` scores documents against its vocabulary.
    """

    node_ids: np.ndarray  # int64, sorted ascending
    ranks: np.ndarray  # float64, aligned with node_ids, sums to 1.0
    n_edges: int
    iterations: int
    delta: float  # L1 rank change of the final iteration

    @property
    def n_nodes(self) -> int:
        return len(self.node_ids)

    def rank_of(self, nodes) -> np.ndarray:
        """Ranks for node strings / int64 ids (0.0 for unknown)."""
        ids = self._as_ids(nodes)
        pos = np.searchsorted(self.node_ids, ids)
        pos_c = np.minimum(pos, len(self.node_ids) - 1)
        hit = self.node_ids[pos_c] == ids
        out = np.where(hit, self.ranks[pos_c], 0.0)
        return out

    @staticmethod
    def _as_ids(nodes) -> np.ndarray:
        arr = np.asarray(nodes)
        if arr.dtype.kind in "iu":
            return arr.astype(np.int64, copy=False)
        return hash_nodes_int64(list(nodes))

    def attach(
        self,
        ds: ray.data.Dataset,
        node_col: str,
        out_col: str = "pagerank",
        default: float = 0.0,
    ) -> ray.data.Dataset:
        """Add a rank column to any dataset keyed by url/node — a
        broadcast map, never a shuffle join."""
        bcast = ray.put((self.node_ids, self.ranks))

        def _score(batch: pa.Table) -> pa.Table:
            ids_s, ranks_s = ray.get(bcast)
            col = batch.column(node_col)
            if pa.types.is_integer(col.type):
                ids = col.to_numpy(zero_copy_only=False).astype(np.int64)
            else:
                ids = hash_nodes_int64(col.to_pylist())
            if len(ids_s):
                pos = np.minimum(
                    np.searchsorted(ids_s, ids), len(ids_s) - 1
                )
                vals = np.where(
                    ids_s[pos] == ids, ranks_s[pos], np.float64(default)
                )
            else:
                vals = np.full(len(ids), np.float64(default))
            return batch.append_column(
                out_col, pa.array(vals, type=pa.float64())
            )

        return ds.map_batches(_score, batch_format="pyarrow")

    def top_k(self, k: int) -> pd.DataFrame:
        """Deterministic top-k (rounded rank DESC, node_id ASC) —
        rounding BEFORE the cut so float addition-order jitter cannot
        flip the selection (the q56 rule)."""
        r = np.round(self.ranks, 9)
        order = np.lexsort((self.node_ids, -r))[:k]
        return pd.DataFrame(
            {"node_id": self.node_ids[order], "rank": self.ranks[order]}
        )

    def to_pandas(self) -> pd.DataFrame:
        return pd.DataFrame({"node_id": self.node_ids, "rank": self.ranks})


def _edge_id_projection(
    edges: ray.data.Dataset, src_col: str, dst_col: str
) -> ray.data.Dataset:
    """Skinny (int64 s, int64 d) projection — string nodes are hashed
    (stable blake2b-8 → int64 bijective reinterpret), int columns pass
    through. Materialized by the caller; every iteration re-reads it."""

    def _ids(batch: pa.Table) -> pa.Table:
        out = {}
        for name, col in (("s", batch.column(src_col)), ("d", batch.column(dst_col))):
            if pa.types.is_integer(col.type):
                out[name] = col.to_numpy(zero_copy_only=False).astype(np.int64)
            else:
                out[name] = hash_nodes_int64(col.to_pylist())
        return pa.table({k: pa.array(v, type=pa.int64()) for k, v in out.items()})

    return edges.select_columns([src_col, dst_col]).map_batches(
        _ids, batch_format="pyarrow"
    )


def _reduce_by_id(ids: np.ndarray, vals: np.ndarray):
    """Sort-and-reduceat sum of vals per id — the driver-side reduce.
    Secondary sort on the value makes the float addition order a pure
    function of the multiset of partials."""
    if len(ids) == 0:
        return ids.astype(np.int64), vals.astype(np.float64)
    order = np.lexsort((vals, ids))
    ids_s, vals_s = ids[order], vals[order]
    boundary = np.empty(len(ids_s), dtype=bool)
    boundary[0] = True
    np.not_equal(ids_s[1:], ids_s[:-1], out=boundary[1:])
    starts = np.flatnonzero(boundary)
    return ids_s[starts], np.add.reduceat(vals_s, starts)


# broadcast-path driver arrays cost 24 B/node (ids + ranks + degrees);
# 20M nodes ≈ 480 MB of driver heap — past that the rank-exchange
# engine keeps everything node-sharded (VERDICT r4 #1)
_DRIVER_NODE_LIMIT = 20_000_000


def pagerank(
    edges: ray.data.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    n_iter: int = 20,
    tol: float = 0.0,
    engine: str = "auto",
    driver_node_limit: int | None = None,
) -> "PageRankResult | DistributedPageRankResult":
    """Distributed PageRank over an edge dataset.

    Power iteration with uniform teleport and dangling-mass
    redistribution::

        r' = (1-d)/n + d * (sum_{(s,v) in E} r[s]/outdeg[s]
                            + dangling_mass / n)

    Parallel duplicate edges count with multiplicity (a page linking
    twice votes twice — ``extract_links`` already dedups in-page, so
    feed its output for the once-per-page convention).

    Stops after ``n_iter`` iterations or when the L1 change ≤ ``tol``.

    ``engine``: ``"driver"`` keeps the rank/degree vectors as
    node-bounded broadcast arrays (the ranks-fit-in-memory regime;
    refuses loudly past ``driver_node_limit`` nodes instead of
    collecting); ``"distributed"`` runs the rank-exchange engine —
    node table sharded by id bucket, per-iteration contribution reduce
    as a ``groupby(bucket)`` exchange, no node-bounded array on the
    driver — and returns a :class:`DistributedPageRankResult` whose
    ranks stay a Dataset; ``"auto"`` (default) picks the broadcast
    path when the node count is provably/measured under the bound and
    escalates to the exchange engine otherwise (the
    ``incremental_minhash_dedup(engine="auto")`` contract). Both
    engines compute the same iteration; ranks agree to ~1e-9
    (allclose-pinned) and rounded ``top_k`` selection is identical.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    if engine not in ("auto", "driver", "distributed"):
        raise ValueError(f"pagerank: unknown engine {engine!r}")
    limit = _DRIVER_NODE_LIMIT if driver_node_limit is None else driver_node_limit
    edges_i = _edge_id_projection(edges, src_col, dst_col).materialize()
    n_edges = edges_i.count()

    if engine == "distributed":
        return _pagerank_exchange(
            edges_i, n_edges, damping=damping, n_iter=n_iter, tol=tol
        )
    if 2 * n_edges > limit:
        # the bound can't be proven from the edge count alone: count
        # nodes exactly with one skinny distributed exchange, never by
        # collecting ids
        n_nodes_probe = _count_distinct_nodes(edges_i, n_edges)
        if n_nodes_probe > limit:
            if engine == "driver":
                raise ValueError(
                    f"pagerank: {n_nodes_probe} nodes exceed the driver "
                    f"broadcast bound ({limit}); use engine='auto'/"
                    "'distributed'"
                )
            return _pagerank_exchange(
                edges_i, n_edges, damping=damping, n_iter=n_iter, tol=tol
            )

    # node ids + out-degree: per-block partials, node-bounded driver reduce
    def _deg_partial(batch: pa.Table) -> pa.Table:
        s = batch.column("s").to_numpy(zero_copy_only=False)
        d = batch.column("d").to_numpy(zero_copy_only=False)
        us, cs = np.unique(s, return_counts=True)
        ud = np.unique(d)
        return pa.table(
            {
                "id": pa.array(np.concatenate([us, ud]), type=pa.int64()),
                "deg": pa.array(
                    np.concatenate([cs.astype(np.float64), np.zeros(len(ud))]),
                    type=pa.float64(),
                ),
            }
        )

    parts = edges_i.map_batches(_deg_partial, batch_format="pyarrow").to_pandas()
    if "id" not in parts.columns:  # empty dataset loses its schema
        parts = pd.DataFrame({"id": pd.Series(dtype=np.int64), "deg": pd.Series(dtype=np.float64)})
    node_ids, outdeg = _reduce_by_id(
        parts["id"].to_numpy(), parts["deg"].to_numpy()
    )
    n = len(node_ids)
    if n == 0:
        return PageRankResult(
            node_ids=np.empty(0, np.int64),
            ranks=np.empty(0, np.float64),
            n_edges=0,
            iterations=0,
            delta=0.0,
        )

    ids_ref = ray.put(node_ids)
    rank = np.full(n, 1.0 / n)
    dangling_mask = outdeg == 0.0
    safe_deg = np.where(dangling_mask, 1.0, outdeg)
    delta = float("inf")
    it = 0
    for it in range(1, n_iter + 1):
        w_ref = ray.put(rank / safe_deg)

        def _contrib(batch: pa.Table) -> pa.Table:
            ids_s = ray.get(ids_ref)
            w = ray.get(w_ref)
            s = batch.column("s").to_numpy(zero_copy_only=False)
            d = batch.column("d").to_numpy(zero_copy_only=False)
            ws = w[np.searchsorted(ids_s, s)]  # every s is a known node
            uid, csum = _reduce_by_id(d, ws)
            return pa.table(
                {
                    "id": pa.array(uid, type=pa.int64()),
                    "c": pa.array(csum, type=pa.float64()),
                }
            )

        cparts = edges_i.map_batches(
            _contrib, batch_format="pyarrow"
        ).to_pandas()
        cid, cval = _reduce_by_id(
            cparts["id"].to_numpy(), cparts["c"].to_numpy()
        )
        contrib = np.zeros(n)
        contrib[np.searchsorted(node_ids, cid)] = cval
        dangling_mass = float(rank[dangling_mask].sum())
        new_rank = (1.0 - damping) / n + damping * (
            contrib + dangling_mass / n
        )
        delta = float(np.abs(new_rank - rank).sum())
        rank = new_rank
        if delta <= tol:
            break

    return PageRankResult(
        node_ids=node_ids,
        ranks=rank,
        n_edges=n_edges,
        iterations=it,
        delta=delta,
    )


def _bucket_of(ids: np.ndarray, nb: int) -> np.ndarray:
    """Node-id shard assignment (stable across every stage)."""
    return (ids.view(np.uint64) % np.uint64(nb)).astype(np.int32)


def _count_distinct_nodes(edges_i: ray.data.Dataset, n_edges: int) -> int:
    """Exact distinct node count via one skinny bucket exchange —
    per-batch unique partials, per-bucket distinct counts, and only
    ``n_buckets`` scalar rows ever reach the driver."""
    nb = max(16, int(n_edges // 2_000_000) + 1)

    def _ids(batch: pa.Table) -> pa.Table:
        u = np.unique(
            np.concatenate(
                [
                    batch["s"].to_numpy(zero_copy_only=False),
                    batch["d"].to_numpy(zero_copy_only=False),
                ]
            )
        )
        return pa.table(
            {
                "bucket": pa.array(_bucket_of(u, nb)),
                "id": pa.array(u, pa.int64()),
            }
        )

    def _cnt(g: pa.Table) -> pa.Table:
        n = len(np.unique(g["id"].to_numpy(zero_copy_only=False)))
        return pa.table({"n": pa.array([n], pa.int64())})

    parts = (
        edges_i.map_batches(_ids, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_cnt, batch_format="pyarrow")
        .to_pandas()
    )
    return int(parts["n"].sum()) if "n" in parts.columns else 0


# exchange-row kinds: one shared 6-column schema so state, edges and
# messages union cleanly (no nullable ints — int64-with-null round-trips
# through float64 and corrupts full-range hash ids)
_K_STATE = 0
_K_EDGE = 1
_K_MSG = 2
_K_SCALAR = 3  # per-bucket dangling / delta partials, bucket = -1


def _pr_rows(
    bucket: np.ndarray,
    k: int,
    ids: np.ndarray,
    outdeg: np.ndarray | float,
    r: np.ndarray | float,
    d: np.ndarray | int,
) -> pa.Table:
    n = len(ids)

    def _full(v, dtype):
        a = np.asarray(v, dtype=dtype)
        return a if a.ndim else np.full(n, a, dtype=dtype)

    return pa.table(
        {
            "bucket": pa.array(np.asarray(bucket, np.int32)),
            "k": pa.array(np.full(n, k, np.int8)),
            "id": pa.array(_full(ids, np.int64)),
            "outdeg": pa.array(_full(outdeg, np.float64)),
            "r": pa.array(_full(r, np.float64)),
            "d": pa.array(_full(d, np.int64)),
        }
    )


_PR_EMPTY = _pr_rows(
    np.empty(0, np.int32), 0, np.empty(0, np.int64), 0.0, 0.0, 0
)


@dataclass
class DistributedPageRankResult:
    """Rank-exchange PageRank output: ranks stay a node-sharded
    ``ray.data.Dataset`` ``(node_id, rank)`` — nothing node-bounded on
    the driver. ``top_k`` is a distributed rounded sort-limit (q56
    rule); ``attach`` is a distributed hash join (the broadcast map of
    :class:`PageRankResult` would require collecting the vector)."""

    ranks: ray.data.Dataset  # (node_id int64, rank float64)
    n_edges: int
    n_nodes: int
    iterations: int
    delta: float

    def top_k(self, k: int) -> pd.DataFrame:
        def _round(t: pa.Table) -> pa.Table:
            return t.append_column(
                "__rk",
                pa.array(
                    np.round(t["rank"].to_numpy(zero_copy_only=False), 9)
                ),
            )

        out = (
            self.ranks.map_batches(_round, batch_format="pyarrow")
            .sort(["__rk", "node_id"], descending=[True, False])
            .limit(k)
            .to_pandas()
        )
        if "node_id" not in out.columns:
            return pd.DataFrame(
                {
                    "node_id": pd.Series(dtype=np.int64),
                    "rank": pd.Series(dtype=np.float64),
                }
            )
        return out[["node_id", "rank"]].reset_index(drop=True)

    def attach(
        self,
        ds: ray.data.Dataset,
        node_col: str,
        out_col: str = "pagerank",
        default: float = 0.0,
    ) -> ray.data.Dataset:
        from .join import hash_join

        def _key(batch: pa.Table) -> pa.Table:
            col = batch.column(node_col)
            if pa.types.is_integer(col.type):
                ids = col.to_numpy(zero_copy_only=False).astype(np.int64)
            else:
                ids = hash_nodes_int64(col.to_pylist())
            return batch.append_column("__pr_id", pa.array(ids, pa.int64()))

        def _rename(t: pa.Table) -> pa.Table:
            return pa.table({"__pr_id": t["node_id"], out_col: t["rank"]})

        right = self.ranks.map_batches(_rename, batch_format="pyarrow")
        from .join import auto_partitions

        joined = hash_join(
            ds.map_batches(_key, batch_format="pyarrow"),
            right,
            "__pr_id",
            how="left_outer",
            num_partitions=auto_partitions(),
        )

        def _fill(t: pa.Table) -> pa.Table:
            filled = pc.fill_null(t[out_col], pa.scalar(float(default)))
            return t.set_column(
                t.schema.get_field_index(out_col), out_col, filled
            )

        return joined.map_batches(_fill, batch_format="pyarrow").drop_columns(
            ["__pr_id"]
        )


def _pagerank_exchange(
    edges_i: ray.data.Dataset,
    n_edges: int,
    *,
    damping: float,
    n_iter: int,
    tol: float,
) -> DistributedPageRankResult:
    """The rank-exchange engine (VERDICT r4 #1): node table sharded by
    id bucket; each iteration is two skew-tolerant ``groupby(bucket)``
    exchanges — (state ∪ edges-by-src-bucket) emits per-bucket partial
    contributions keyed by dst bucket, then (state ∪ messages) applies
    the update. Driver state per iteration is ``n_buckets`` scalar
    rows (dangling-mass and delta partials); the rank/degree vectors
    never leave the cluster.

    Determinism: per-bucket reduces sort ``(id, value)`` before
    ``reduceat`` (the `_reduce_by_id` rule), so partial sums are a pure
    function of the multiset at any parallelism. Cross-engine rank
    values agree with the broadcast path to ~1e-9 (different but
    deterministic addition orders; tests pin allclose + identical
    rounded top_k)."""
    nb = max(16, int(n_edges // 1_000_000) + 1)

    if n_edges == 0:
        return DistributedPageRankResult(
            ranks=ray.data.from_arrow(
                pa.table(
                    {
                        "node_id": pa.array([], pa.int64()),
                        "rank": pa.array([], pa.float64()),
                    }
                )
            ),
            n_edges=0,
            n_nodes=0,
            iterations=0,
            delta=0.0,
        )

    # node shards (bucket, id, outdeg): per-batch degree partials, one
    # bucket exchange, vectorized per-bucket reduce
    def _deg_rows(batch: pa.Table) -> pa.Table:
        s = batch.column("s").to_numpy(zero_copy_only=False)
        d = batch.column("d").to_numpy(zero_copy_only=False)
        us, cs = np.unique(s, return_counts=True)
        ud = np.unique(d)
        ids = np.concatenate([us, ud])
        deg = np.concatenate([cs.astype(np.float64), np.zeros(len(ud))])
        return _pr_rows(_bucket_of(ids, nb), _K_STATE, ids, deg, 0.0, 0)

    def _deg_reduce(g: pa.Table) -> pa.Table:
        ids = g["id"].to_numpy(zero_copy_only=False)
        deg = g["outdeg"].to_numpy(zero_copy_only=False)
        uid, dsum = _reduce_by_id(ids, deg)
        return _pr_rows(_bucket_of(uid, nb), _K_STATE, uid, dsum, 0.0, 0)

    state = (
        edges_i.map_batches(_deg_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_deg_reduce, batch_format="pyarrow")
        .materialize()
    )
    n = state.count()

    def _init_rank(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("r"),
            "r",
            pa.array(np.full(t.num_rows, 1.0 / n)),
        )

    state = state.map_batches(_init_rank, batch_format="pyarrow").materialize()

    # static edge rows, sharded by SOURCE bucket
    def _edge_rows(batch: pa.Table) -> pa.Table:
        s = batch.column("s").to_numpy(zero_copy_only=False)
        d = batch.column("d").to_numpy(zero_copy_only=False)
        return _pr_rows(_bucket_of(s, nb), _K_EDGE, s, 0.0, 0.0, d)

    eb = edges_i.map_batches(_edge_rows, batch_format="pyarrow").materialize()

    # Scalar rows (kind _K_SCALAR, bucket -1) RIDE ALONG in state and
    # message datasets instead of being stripped by dedicated filter
    # passes — both group functions are kind-exact, so the stray group
    # -1 just emits nothing. This keeps the loop at two shuffle
    # executions plus one small driver scan per iteration.
    def _emit(g: pa.Table) -> pa.Table:
        k = g["k"].to_numpy(zero_copy_only=False)
        is_state = k == _K_STATE
        if not is_state.any():  # stale-scalar group (bucket -1)
            return _PR_EMPTY
        is_edge = k == _K_EDGE
        ids = g["id"].to_numpy(zero_copy_only=False)
        sid = ids[is_state]
        r = g["r"].to_numpy(zero_copy_only=False)[is_state]
        od = g["outdeg"].to_numpy(zero_copy_only=False)[is_state]
        # deterministic dangling partial: sorted-id order
        order = np.argsort(sid)
        sid_s = sid[order]
        r_s, od_s = r[order], od[order]
        dang = float(r_s[od_s == 0.0].sum())
        w_node = r_s / np.where(od_s == 0.0, 1.0, od_s)
        out = [
            _pr_rows(
                np.full(1, -1, np.int32), _K_SCALAR,
                np.full(1, -1, np.int64), 0.0, dang, 0,
            )
        ]
        if is_edge.any():
            s_e = ids[is_edge]
            dst = g["d"].to_numpy(zero_copy_only=False)[is_edge]
            w = w_node[np.searchsorted(sid_s, s_e)]  # every src is known
            uid, wsum = _reduce_by_id(dst, w)
            out.append(
                _pr_rows(_bucket_of(uid, nb), _K_MSG, uid, 0.0, wsum, 0)
            )
        return pa.concat_tables(out)

    def _make_update(dm: float, it_damping: float):
        teleport = (1.0 - it_damping) / n
        dang_share = dm / n

        def _update(g: pa.Table) -> pa.Table:
            k = g["k"].to_numpy(zero_copy_only=False)
            is_state = k == _K_STATE
            if not is_state.any():  # dangling-scalar group (bucket -1)
                return _PR_EMPTY
            is_msg = k == _K_MSG
            ids = g["id"].to_numpy(zero_copy_only=False)
            sid = ids[is_state]
            od = g["outdeg"].to_numpy(zero_copy_only=False)[is_state]
            r_old = g["r"].to_numpy(zero_copy_only=False)[is_state]
            order = np.argsort(sid)
            sid_s, od_s, r_old_s = sid[order], od[order], r_old[order]
            contrib = np.zeros(len(sid_s))
            if is_msg.any():
                mid = ids[is_msg]
                mw = g["r"].to_numpy(zero_copy_only=False)[is_msg]
                uid, wsum = _reduce_by_id(mid, mw)
                contrib[np.searchsorted(sid_s, uid)] = wsum
            new_r = teleport + it_damping * (contrib + dang_share)
            delta_p = float(np.abs(new_r - r_old_s).sum())
            return pa.concat_tables(
                [
                    _pr_rows(
                        _bucket_of(sid_s, nb), _K_STATE, sid_s, od_s, new_r, 0
                    ),
                    _pr_rows(
                        np.full(1, -1, np.int32), _K_SCALAR,
                        np.full(1, -1, np.int64), 0.0, delta_p, 0,
                    ),
                ]
            )

        return _update

    def _scalar_sum(ds: ray.data.Dataset) -> float:
        """Sorted-value sum of the kind-scalar rows — block arrival
        order varies with parallelism, the multiset of per-bucket
        partials does not."""

        def _f(t: pa.Table) -> pa.Table:
            m = t["k"].to_numpy(zero_copy_only=False) == _K_SCALAR
            return t.filter(pa.array(m)).select(["r"])

        df = ds.map_batches(_f, batch_format="pyarrow").to_pandas()
        if "r" not in df.columns or not len(df):
            return 0.0
        return float(np.sort(df["r"].to_numpy()).sum())

    def _pin(ds: ray.data.Dataset) -> ray.data.Dataset:
        """Materialize and rebuild from block refs: severs the
        stats/plan chain (which otherwise grows per iteration and makes
        driver-side planning O(iterations²)) without copying blocks."""
        return ray.data.from_arrow_refs(ds.to_arrow_refs())

    delta = float("inf")
    it = 0
    for it in range(1, n_iter + 1):
        msgs = _pin(
            state.union(eb)
            .groupby("bucket")
            .map_groups(_emit, batch_format="pyarrow")
        )
        dm = _scalar_sum(msgs)
        # repartition caps the block count: union concatenates block
        # lists and the groupby sort preserves them, so without the cap
        # state's block count doubles every iteration
        state = _pin(
            state.union(msgs)
            .groupby("bucket")
            .map_groups(_make_update(dm, damping), batch_format="pyarrow")
            .repartition(nb)
        )
        if tol > 0.0:
            delta = _scalar_sum(state)
            if delta <= tol:
                break
    if tol <= 0.0 and it > 0:
        delta = _scalar_sum(state)

    def _ranks(t: pa.Table) -> pa.Table:
        m = t["k"].to_numpy(zero_copy_only=False) == _K_STATE
        t = t.filter(pa.array(m))
        return pa.table({"node_id": t["id"], "rank": t["r"]})

    return DistributedPageRankResult(
        ranks=state.map_batches(_ranks, batch_format="pyarrow"),
        n_edges=n_edges,
        n_nodes=n,
        iterations=it,
        delta=delta,
    )


def anchor_texts(
    edges: ray.data.Dataset,
    *,
    dst_col: str = "dst",
    src_col: str = "src",
    text_col: str = "anchor",
    k: int = 20,
    n_buckets: int = 4096,
    sep: str = " | ",
) -> ray.data.Dataset:
    """Inbound anchor-text collection: for every link TARGET, the
    anchor texts other pages use to link to it — the classic web
    search/quality signal (how the web describes a page).

    Output: ``(dst, n_inlinks, anchors)`` where ``anchors`` joins at
    most ``k`` distinct non-empty anchor texts, selected
    deterministically as the k smallest ``hash64(src)`` tickets (tie
    by src) so the result is independent of partitioning and row
    order, and ``n_inlinks`` is the exact inbound edge count.

    Scale shape (the build_postings lesson applied from the start): a
    hot target ("/" of a big site) has corpus-bounded in-links, so the
    whole group must never materialize. Per-batch partials keep at
    most ``k`` candidate rows per dst per batch plus one count row, so
    the exchange carries ≤ ``(k+1) × distinct_dst_per_batch`` rows per
    batch; the reduce is ONE skew-free bucket exchange (equal dst
    share a bucket; per-bucket work is a vectorized lexsort rank cut,
    never a per-dst group loop).
    """
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        dst = batch.column(dst_col).to_pylist()
        if n == 0:
            return pa.table(
                {
                    "dst": pa.array([], pa.string()),
                    "tick": pa.array([], pa.int64()),
                    "text": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        src = batch.column(src_col).to_pylist()
        txt = batch.column(text_col).to_pylist()
        did = hash_nodes_int64(dst)
        tick = hash_nodes_int64(src)
        # exact per-dst counts for this batch
        uid, first, counts = np.unique(did, return_index=True, return_counts=True)
        out_dst = [dst[i] for i in first]
        out_tick = np.zeros(len(uid), dtype=np.int64)
        out_text = [None] * len(uid)
        out_cnt = counts.astype(np.int64)
        # candidate anchors: k smallest PER-TEXT-MIN ticks per dst among
        # non-empty texts. Selecting the k smallest per-(dst,text) min
        # ticks per batch is an exact prefilter for the global
        # dedup-then-top-k (a text in the global top-k attains its
        # global min tick in SOME batch, where at most k-1 texts can
        # beat it — else it wouldn't be global top-k). Boundary ticks
        # keep their ties so an equal-tick text can't be cut wrongly.
        has_text = np.array([bool(t) for t in txt])
        if has_text.any():
            idx = np.flatnonzero(has_text)
            t_id = hash_nodes_int64([txt[i] for i in idx])
            # representative row per (dst, text): the min-tick row
            perm = np.lexsort((tick[idx], t_id, did[idx]))
            order = idx[perm]
            d_s, t_s = did[order], t_id[perm]
            rep = np.empty(len(order), dtype=bool)
            rep[0] = True
            rep[1:] = (d_s[1:] != d_s[:-1]) | (t_s[1:] != t_s[:-1])
            reps = order[rep]
            # k smallest representative ticks per dst (ties included)
            r_did, r_tick = did[reps], tick[reps]
            o2 = np.lexsort((r_tick, r_did))
            d2, t2 = r_did[o2], r_tick[o2]
            boundary = np.empty(len(o2), dtype=bool)
            boundary[0] = True
            np.not_equal(d2[1:], d2[:-1], out=boundary[1:])
            grp = np.cumsum(boundary) - 1
            starts = np.flatnonzero(boundary)
            rank = np.arange(len(o2)) - starts[grp]
            kth = np.minimum(starts[grp] + (k - 1), len(o2) - 1)
            keep = reps[o2[(rank < k) | (t2 == t2[kth])]]
            cand_dst = [dst[i] for i in keep]
            cand_tick = tick[keep]
            cand_text = [txt[i] for i in keep]
            return pa.table(
                {
                    "dst": pa.array(out_dst + cand_dst, pa.string()),
                    "tick": pa.array(
                        np.concatenate([out_tick, cand_tick]), pa.int64()
                    ),
                    "text": pa.array(out_text + cand_text, pa.string()),
                    "cnt": pa.array(
                        np.concatenate(
                            [out_cnt, np.zeros(len(keep), dtype=np.int64)]
                        ),
                        pa.int64(),
                    ),
                }
            )
        return pa.table(
            {
                "dst": pa.array(out_dst, pa.string()),
                "tick": pa.array(out_tick, pa.int64()),
                "text": pa.array(out_text, pa.string()),
                "cnt": pa.array(out_cnt, pa.int64()),
            }
        )

    def _add_bucket(batch: pa.Table) -> pa.Table:
        ids = hash_nodes_int64(batch.column("dst").to_pylist())
        b = (ids.view(np.uint64) % np.uint64(n_buckets)).astype(np.int32)
        return batch.append_column("__b", pa.array(b, pa.int32()))

    def _reduce(group: pd.DataFrame) -> pd.DataFrame:
        cnt = group.groupby("dst", sort=True)["cnt"].sum()
        cand = group[group["text"].notna()]
        anchors = {}
        if len(cand):
            # distinct texts per dst, keep the k smallest per-text min
            # ticks (tie by text ascending — fully order-independent)
            cand = cand.sort_values(["dst", "tick", "text"], kind="stable")
            cand = cand.drop_duplicates(["dst", "text"])
            topk = cand.groupby("dst", sort=False).head(k)
            anchors = topk.groupby("dst", sort=False)["text"].agg(sep.join).to_dict()
        return pd.DataFrame(
            {
                "dst": cnt.index,
                "n_inlinks": cnt.to_numpy(np.int64),
                "anchors": [anchors.get(d, "") for d in cnt.index],
            }
        )

    return (
        edges.select_columns([dst_col, src_col, text_col])
        .map_batches(_partial, batch_format="pyarrow")
        .map_batches(_add_bucket, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(_reduce, batch_format="pandas")
    )
