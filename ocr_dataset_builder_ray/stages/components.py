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
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum


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

    edges = edges_ds.map_batches(_as_edges, batch_format="pyarrow")
    if edges.count() == 0:
        return labels.map_batches(
            lambda t: pa.table({"node": t["node"], "component": t["label"]}),
            batch_format="pyarrow",
        )
    edges = edges.materialize()  # small relative to nodes; reused every round

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
