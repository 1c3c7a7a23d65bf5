"""Distributed transitive closure: iterative min-label propagation.

The reference has no clustering at all — its base table is already
entity-clustered by ``permno`` (stocknames.csv:2-4, SURVEY.md §1.1); the
north rule mandates a distributed union-find "expressed as iterative
groupby + min-label propagation until fixpoint".

Algorithm (per iteration, 2 shuffles):
  1. attach each node's current label to its adjacency rows — a hash-bucket
     join done as ``union + groupby(node).map_groups`` (Ray Data's portable
     partitioned-join pattern);
  2. every node takes the min of (own label, neighbours' labels) via
     ``groupby(node).aggregate(min)``.

Convergence is detected with a driver-side checksum: the Sum over nodes of a
64-bit hash of (node, label); two identical consecutive checksums ⇒ fixpoint
(collision probability ~n²/2⁶⁴ — negligible).  Iterations are bounded by
``max_iters`` (label propagation converges in O(cluster diameter) rounds;
name-variant clusters are shallow).  At 10^12-doc scale you would swap this
for the large-star/small-star variant to bound the number of rounds by
O(log n) — the stage boundary (edges in, labels out) is unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _hash64(node: pd.Series, label: pd.Series) -> np.ndarray:
    h = pd.util.hash_pandas_object(node.astype(str) + "\x00" + label.astype(str),
                                   index=False).to_numpy()
    return h.view(np.int64)


def connected_components(edges_ds, nodes_ds, *, max_iters: int = 25):
    """edges(left_doc_id, right_doc_id) + nodes(doc_id) -> (doc_id, cluster_id).

    ``cluster_id`` is the lexicographic min doc_id of the component.
    """
    import ray.data
    from ray.data.aggregate import Min, Sum

    def to_adj(batch: pa.Table) -> pa.Table:
        l = batch.column("left_doc_id")
        r = batch.column("right_doc_id")
        return pa.Table.from_arrays(
            [pa.concat_arrays([l.combine_chunks(), r.combine_chunks()]),
             pa.concat_arrays([r.combine_chunks(), l.combine_chunks()])],
            names=["node", "nbr"],
        )

    adj = edges_ds.map_batches(to_adj, batch_format="pyarrow").materialize()

    labels = nodes_ds.map_batches(
        lambda t: pa.Table.from_arrays(
            [t.column("doc_id"), t.column("doc_id")], names=["node", "label"]
        ),
        batch_format="pyarrow",
    ).materialize()

    def checksum(lbl_ds) -> int:
        def h(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"h": _hash64(batch["node"], batch["label"])})

        out = lbl_ds.map_batches(h, batch_format="pandas").aggregate(Sum("h"))
        return int(out["sum(h)"])

    prev = checksum(labels)
    for it in range(max_iters):
        # 1) join: label of node -> messages (nbr, label)
        tagged_adj = adj.map_batches(
            lambda t: t.append_column("label", pa.nulls(t.num_rows, pa.string())),
            batch_format="pyarrow",
        )
        tagged_lbl = labels.map_batches(
            lambda t: t.append_column("nbr", pa.nulls(t.num_rows, pa.string()))
                       .select(["node", "nbr", "label"]),
            batch_format="pyarrow",
        )

        def emit_msgs(g: pd.DataFrame) -> pd.DataFrame:
            lab = g["label"].dropna()
            nbrs = g["nbr"].dropna()
            if lab.empty or nbrs.empty:
                return pd.DataFrame({"node": pd.Series(dtype="object"),
                                     "label": pd.Series(dtype="object")})
            m = lab.min()
            return pd.DataFrame({"node": nbrs.to_numpy(), "label": m})

        msgs = (
            tagged_adj.union(tagged_lbl)
            .groupby("node")
            .map_groups(emit_msgs, batch_format="pandas")
        )
        # 2) min over (own label ∪ incoming labels)
        labels = (
            msgs.union(labels)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        cur = checksum(labels)
        if cur == prev:
            break
        prev = cur

    return labels.map_batches(
        lambda t: pa.Table.from_arrays(
            [t.column("node"), t.column("label")], names=["doc_id", "cluster_id"]
        ),
        batch_format="pyarrow",
    )
