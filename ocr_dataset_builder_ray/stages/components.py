"""Distributed connected components by min-label propagation.

The near-dup dedup family resolves candidate pairs into clusters. The
driver-side union-find in ``stages/dedup.py`` is bounded by the
verified-pair count — fine until the duplicate rate × corpus size
outgrows driver memory. This module is the scale path: iterative
min-label propagation expressed purely as ``union`` + ``groupby`` (no
joins, so it is robust at any partition occupancy), converging in
O(cluster diameter) rounds — near-dup clusters are shallow (diameter
≤ ~3), so 5-10 rounds suffice in practice and convergence is checked
exactly each round.

Round structure (all distributed):
1. message stage: group ``union(labels, directed edges)`` by source
   node; each group knows the node's current label and emits it to
   every neighbor;
2. update stage: group ``union(labels, messages)`` by node; the new
   label is the min of the current label and incoming candidates; a
   per-group changed flag is aggregated to detect convergence.

Both groupings run as coarse-bucket exchanges when the node ids are
integers and the per-round row volume is large (the convention of
``stages/dedup.py``): a native group PER NODE per round at the
cardinalities this engine exists for (pair-touched nodes past the
driver bound) puts Ray's grouping machinery in charge of the wall
clock, twice per round. Inside a coarse group both stages are one
argsort + ``np.minimum.reduceat`` over node runs. Small or
string-keyed inputs keep the per-node native plan. Identical labels
on both plans (pinned).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum

from ._bucketing import coarse_buckets

# per-round union rows above which the coarse plan engages (int keys)
_COMPONENTS_NATIVE_LIMIT = 2_000_000
_COARSE_TARGET_ROWS = 2_000_000
# min-identity sentinel for null labels inside a coarse run; node ids
# of exactly int64 max would collide with it — unreachable for every
# producer in this repo (hashes are < 2^63, rank encodings < 2^63)
_LABEL_SENTINEL = np.iinfo(np.int64).max


def _empty_like(nodes: pd.Series) -> pd.DataFrame:
    return pd.DataFrame({"node": nodes[:0], "cand": nodes[:0], "is_self": []})


def min_label_components(
    edges_ds: ray.data.Dataset,
    nodes_ds: ray.data.Dataset,
    *,
    node_col: str = "key",
    src_col: str = "a",
    dst_col: str = "b",
    max_rounds: int | None = None,
) -> ray.data.Dataset:
    """→ Dataset ``(node, component)``; component = min node id of the
    connected component. Deterministic at any parallelism.

    ``max_rounds=None`` (default) iterates until no label changes —
    convergence is exact, bounded by the largest cluster diameter. A
    chain-shaped cluster deeper than a fixed cap would otherwise keep
    several representatives silently (ADVICE r2), breaking equality
    with the driver union-find. Pass an int cap only for bounded-round
    experiments; hitting it logs a warning and returns the partial
    labels.
    """

    def _as_labels(t: pa.Table) -> pa.Table:
        return pa.table({"node": t[node_col], "label": t[node_col]})

    labels = nodes_ds.map_batches(_as_labels, batch_format="pyarrow")

    def _as_edges(t: pa.Table) -> pa.Table:
        # both directions so propagation is symmetric
        return pa.table(
            {
                "src": pa.concat_arrays(
                    [t[src_col].combine_chunks(), t[dst_col].combine_chunks()]
                ),
                "dst": pa.concat_arrays(
                    [t[dst_col].combine_chunks(), t[src_col].combine_chunks()]
                ),
            }
        )

    edges = edges_ds.map_batches(
        _as_edges, batch_format="pyarrow"
    ).materialize()  # small relative to nodes; reused every round
    n_edge_rows = edges.count()  # already doubled (both directions)
    if n_edge_rows == 0:
        return labels.map_batches(
            lambda t: pa.table({"node": t["node"], "component": t["label"]}),
            batch_format="pyarrow",
        )
    # labels are consumed twice per round (message + self rows) —
    # materialize the skinny initial frame instead of re-running the
    # nodes map; every later round's labels come out materialized
    labels = labels.materialize()
    n_nodes = labels.count()
    if n_nodes == 0:
        # no nodes — nothing to label; an empty dataset has no schema
        # at all, so build the (node, component) frame explicitly with
        # the edge key type (edges are nonempty past the check above)
        esch = edges.schema()
        ntype = esch.types[esch.names.index("src")]
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], type=ntype),
                    "component": pa.array([], type=ntype),
                }
            )
        )
    schema = labels.schema()
    node_type = schema.types[schema.names.index("node")]
    union_rows = n_nodes + n_edge_rows
    use_coarse = (
        pa.types.is_integer(node_type)
        and not pa.types.is_uint64(node_type)  # int64 sentinel space
        and union_rows > _COMPONENTS_NATIVE_LIMIT
    )
    nb = max(32, int(union_rows // _COARSE_TARGET_ROWS) + 1)

    def _i64(col) -> np.ndarray:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return col.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)

    def _cb(t: pa.Table, col: str) -> pa.Table:
        return t.append_column(
            "__cb", pa.array(coarse_buckets(nb, _i64(t[col])))
        )

    def _messages_coarse(g: pa.Table) -> pa.Table:
        """One coarse bucket of (key, peer, label) rows — label rows
        carry the key's label, edge rows its peers. Per key-run: min
        label (sentinel where no label row reached this bucket — never
        happens, every key has one) broadcast to the run's peers."""
        k = _i64(g["key"])
        # cast to int64 BEFORE filling: the sentinel is int64-max, which
        # pc.fill_null cannot fit into a narrower label column (int32
        # node keys pass the use_coarse gate and crashed here)
        lab = _i64(pc.fill_null(pc.cast(g["label"], pa.int64()), _LABEL_SENTINEL))
        peer_valid = pc.is_valid(g["peer"]).to_numpy(zero_copy_only=False)
        peer = _i64(pc.fill_null(g["peer"], 0))
        order = np.argsort(k, kind="stable")
        ks = k[order]
        new = np.r_[True, ks[1:] != ks[:-1]]
        run_id = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        run_min = np.minimum.reduceat(lab[order], starts)
        emit = peer_valid[order] & (run_min[run_id] != _LABEL_SENTINEL)
        return pa.table(
            {
                "node": pa.array(peer[order][emit], type=node_type),
                "cand": pa.array(run_min[run_id][emit], type=node_type),
            }
        )

    def _update_coarse(g: pa.Table) -> pa.Table:
        """One coarse bucket of (node, cand, is_self) rows. Per node
        run: new label = min cand, old = min over self rows, one
        output row + changed flag."""
        nd = _i64(g["node"])
        cand = _i64(g["cand"])
        is_self = (
            g["is_self"].combine_chunks()
            if isinstance(g["is_self"], pa.ChunkedArray)
            else g["is_self"]
        ).to_numpy(zero_copy_only=False)
        order = np.argsort(nd, kind="stable")
        ns, cs, ss = nd[order], cand[order], is_self[order]
        new_run = np.r_[True, ns[1:] != ns[:-1]]
        starts = np.flatnonzero(new_run)
        new = np.minimum.reduceat(cs, starts)
        old = np.minimum.reduceat(np.where(ss, cs, _LABEL_SENTINEL), starts)
        return pa.table(
            {
                "node": pa.array(ns[starts], type=node_type),
                "label": pa.array(new, type=node_type),
                "changed": pa.array((new != old).astype(np.int64)),
            }
        )

    n_changed = 0
    rounds = 0
    while max_rounds is None or rounds < max_rounds:
        rounds += 1
        lab_rows = labels.map_batches(
            lambda t: pa.table(
                {"key": t["node"], "peer": pa.nulls(t.num_rows, t["node"].type), "label": t["label"]}
            ),
            batch_format="pyarrow",
        )
        edge_rows = edges.map_batches(
            lambda t: pa.table(
                {"key": t["src"], "peer": t["dst"], "label": pa.nulls(t.num_rows, t["src"].type)}
            ),
            batch_format="pyarrow",
        )

        def _messages(g: pa.Table) -> pa.Table:
            # pyarrow group fns keep int64-with-nulls intact (pandas
            # would coerce to float64 → schema-unstable RefBundles)
            lab = g["label"].drop_null()
            peers = g["peer"].drop_null()
            if len(lab) == 0 or len(peers) == 0:  # no label row / no edges
                return pa.table(
                    {"node": peers.slice(0, 0), "cand": lab.slice(0, 0)}
                )
            m = pc.min(lab).as_py()
            return pa.table(
                {
                    "node": peers,
                    "cand": pa.array([m] * len(peers), type=lab.type),
                }
            )

        if use_coarse:
            msgs = (
                lab_rows.union(edge_rows)
                .map_batches(lambda t: _cb(t, "key"), batch_format="pyarrow")
                .groupby("__cb")
                .map_groups(_messages_coarse, batch_format="pyarrow")
            )
        else:
            msgs = (
                lab_rows.union(edge_rows)
                .groupby("key")
                .map_groups(_messages, batch_format="pyarrow")
            )

        self_rows = labels.map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "cand": t["label"],
                    "is_self": pa.array([True] * t.num_rows),
                }
            ),
            batch_format="pyarrow",
        )
        msg_rows = msgs.map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "cand": t["cand"],
                    "is_self": pa.array([False] * t.num_rows),
                }
            ),
            batch_format="pyarrow",
        )

        def _update(g: pa.Table) -> pa.Table:
            old = pc.min(g["cand"].filter(g["is_self"])).as_py()
            new = pc.min(g["cand"]).as_py()
            return pa.table(
                {
                    "node": g["node"].slice(0, 1),
                    "label": pa.array([new], type=g["cand"].type),
                    "changed": pa.array([int(new != old)], type=pa.int64()),
                }
            )

        if use_coarse:
            updated = (
                self_rows.union(msg_rows)
                .map_batches(lambda t: _cb(t, "node"), batch_format="pyarrow")
                .groupby("__cb")
                .map_groups(_update_coarse, batch_format="pyarrow")
                .materialize()
            )
        else:
            updated = (
                self_rows.union(msg_rows)
                .groupby("node")
                .map_groups(_update, batch_format="pyarrow")
                .materialize()
            )
        n_changed = updated.aggregate(Sum("changed", alias_name="n"))["n"]
        labels = updated.drop_columns(["changed"])
        if not n_changed:
            break
    if n_changed:
        # Unconverged labels can split one cluster into several
        # representatives — surface it instead of silently returning.
        import logging

        logging.getLogger(__name__).warning(
            "min_label_components: not converged after %d rounds "
            "(%d labels still changing); raise max_rounds",
            max_rounds,
            n_changed,
        )

    return labels.map_batches(
        lambda t: pa.table({"node": t["node"], "component": t["label"]}),
        batch_format="pyarrow",
    )
