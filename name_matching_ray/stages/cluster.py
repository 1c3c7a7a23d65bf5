"""Distributed transitive closure: iterative min-label propagation.

The reference has no clustering at all — its base table is already
entity-clustered by ``permno`` (stocknames.csv:2-4, SURVEY.md §1.1); the
north rule mandates a distributed union-find "expressed as iterative
groupby + min-label propagation until fixpoint".

Algorithm (per iteration, 2 shuffles):
  1. attach each node's current label to its adjacency rows — a hash-bucket
     join done as ``union + groupby(hash(node) % 256).map_groups`` with the
     per-node min/label-mapping vectorized in pandas INSIDE each coarse
     bucket (grouping by raw node built one tiny pandas group per node —
     the per-group block-construction overhead dominates at 100k+ nodes);
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

from ..util import bucket_hash, default_pool
import pandas as pd
import pyarrow as pa


def _closure_dict_reference(left: list, right: list) -> dict:
    """Scalar union-find over edge lists — kept ONLY as the executable
    reference for the equality test of the vectorized closure below
    (tests/test_ops.py).  Returns {node: component-min} for non-min nodes."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for l, r in zip(left, right):
        rl, rr = find(l), find(r)
        if rl != rr:
            # union by lexicographic min so labels are deterministic
            lo, hi = (rl, rr) if rl < rr else (rr, rl)
            parent[hi] = lo
    return {x: find(x) for x in list(parent)}


def _closure_numpy(left: np.ndarray, right: np.ndarray) -> dict:
    """Vectorized transitive closure over collected edges: factorize the
    endpoint ids to ranks of the SORTED unique array (so integer order ==
    id order, numeric for int64 ids / lexicographic for strings), then
    min-label propagation with pointer doubling — two ``np.minimum.at``
    edge relaxations + ``lab = lab[lab]`` jumps per round, O(log n) rounds.
    Labels equal the component-min id, identical to the scalar union-find
    (equality-tested).  Returns {node: component-min} for non-min nodes."""
    uniq, codes = np.unique(np.concatenate([left, right]),
                            return_inverse=True)
    le, re_ = codes[: len(left)], codes[len(left):]
    lab = np.arange(len(uniq), dtype=np.int64)
    while True:
        old = lab.copy()
        np.minimum.at(lab, le, lab[re_])
        np.minimum.at(lab, re_, lab[le])
        while True:  # pointer doubling to the current fixpoint
            nl = lab[lab]
            if np.array_equal(nl, lab):
                break
            lab = nl
        if np.array_equal(lab, old):
            break
    moved = np.flatnonzero(lab != np.arange(len(uniq), dtype=np.int64))
    src, dst = uniq[moved], uniq[lab[moved]]
    return {k: v for k, v in zip(src.tolist(), dst.tolist())}


def _driver_union_find(edges_ds, nodes_ds):
    """Small-edge-set path: collect edges, vectorized numpy closure,
    broadcast labels back onto the (possibly large) node set via a
    map_batches lookup."""
    import ray
    import ray.data

    batches = list(edges_ds.iter_batches(batch_format="pyarrow"))
    edges = pa.concat_tables(batches) if batches else None

    labels: dict = {}
    if edges is not None and edges.num_rows:
        labels = _closure_numpy(
            edges.column("left_doc_id").to_numpy(zero_copy_only=False),
            edges.column("right_doc_id").to_numpy(zero_copy_only=False),
        )
    lbl_ref = ray.put(labels)

    class Attach:
        """Vectorized label attach: the edge-derived relabel map is tiny,
        but the node set can be the whole corpus — no per-row Python loop
        here.  Integer ids take a numpy searchsorted lookup (exact at any
        id magnitude); other types fall back to a pandas object-dtype
        ``Series.map`` (object dtype on purpose: an int64→float64 NaN
        detour would corrupt ids above 2^53)."""

        def __init__(self):
            labels = ray.get(lbl_ref)
            self.labels = labels
            self.ks = self.vs = None
            if labels:
                ks = np.asarray(list(labels.keys()))
                if np.issubdtype(ks.dtype, np.integer):
                    order = np.argsort(ks, kind="stable")
                    self.ks = ks[order]
                    self.vs = np.asarray(list(labels.values()))[order]

        def __call__(self, t: pa.Table) -> pa.Table:
            col = t.column("doc_id")
            if not self.labels:
                return pa.table({"doc_id": col,
                                 "cluster_id": col.cast(col.type)})
            if self.ks is not None and pa.types.is_integer(col.type):
                ids = col.to_numpy(zero_copy_only=False)
                pos = np.searchsorted(self.ks, ids)
                pos[pos >= len(self.ks)] = 0
                hit = self.ks[pos] == ids
                out = ids.copy()
                out[hit] = self.vs[pos[hit]]
                cluster = pa.array(out).cast(col.type)
            else:
                s = col.to_pandas().astype(object)
                mapped = s.map(self.labels)
                cluster = pa.Array.from_pandas(
                    mapped.where(mapped.notna(), s), type=col.type)
            return pa.table({"doc_id": col, "cluster_id": cluster})

    return nodes_ds.map_batches(Attach, batch_format="pyarrow",
                                concurrency=default_pool())


def _hash64(node: pd.Series, label: pd.Series) -> np.ndarray:
    h = pd.util.hash_pandas_object(node.astype(str) + "\x00" + label.astype(str),
                                   index=False).to_numpy()
    return h.view(np.int64)


def connected_components(edges_ds, nodes_ds, *, max_iters: int = 25,
                         driver_threshold: int = 2_000_000,
                         label_blocks: int = 64):
    """edges(left_doc_id, right_doc_id) + nodes(doc_id) -> (doc_id, cluster_id).

    ``cluster_id`` is the lexicographic min doc_id of the component.

    Hybrid execution: when the edge set is small (< ``driver_threshold``
    rows — matched pairs are a tiny fraction of candidates), the transitive
    closure runs as driver-side union-find in one pass (the shuffle-per-round
    loop is pure overhead at that size).  Above the threshold it falls back to
    the distributed iterative min-label propagation below — the 10^12-doc
    path, whose per-round cost is 2 shuffles and whose round count is the
    cluster diameter.  Both paths produce identical labels (pytest-checked).
    """
    import ray.data
    from ray.data.aggregate import Min, Sum

    # one execution of the (upstream scoring) lineage; both paths reuse it
    edges_ds = edges_ds.select_columns(["left_doc_id", "right_doc_id"]).materialize()
    if edges_ds.count() < driver_threshold:
        return _driver_union_find(edges_ds, nodes_ds)

    _sch = edges_ds.schema()
    idt = _sch.types[_sch.names.index("left_doc_id")]  # id type (string
    # in the linkage flow, int64 for document ids) — all label columns
    # carry it so the hybrid paths stay type-faithful

    n_buckets = 256  # coarse shuffle key: hash(node) % n_buckets — one Ray
    # group per BUCKET, with the per-node logic vectorized in pandas inside
    # (a groupby("node") built one tiny pandas group per node per iteration,
    # the exact 100k+-tiny-groups pathology this repo hit elsewhere)


    def to_adj(batch: pd.DataFrame) -> pa.Table:
        node = pd.concat([batch["left_doc_id"], batch["right_doc_id"]],
                         ignore_index=True)
        nbr = pd.concat([batch["right_doc_id"], batch["left_doc_id"]],
                        ignore_index=True)
        return pa.table({
            "node": pa.array(node, idt),
            "nbr": pa.array(nbr, idt),
            "bucket": pa.array(bucket_hash(node, n_buckets), pa.int64()),
        })

    adj = edges_ds.map_batches(to_adj, batch_format="pandas").materialize()

    labels = nodes_ds.map_batches(
        lambda t: pa.Table.from_arrays(
            [t.column("doc_id"), t.column("doc_id")], names=["node", "label"]
        ),
        batch_format="pyarrow",
    ).materialize()

    def checksum(lbl_ds) -> int:
        def h(batch: pd.DataFrame) -> pa.Table:
            return pa.table({"h": _hash64(batch["node"], batch["label"])})

        out = lbl_ds.map_batches(h, batch_format="pandas").aggregate(Sum("h"))
        return int(out["sum(h)"])

    prev = checksum(labels)
    for it in range(max_iters):
        # 1) hash-bucket join: node's current min label -> messages (nbr, label)
        tagged_adj = adj.map_batches(
            lambda t: t.append_column("label", pa.nulls(t.num_rows, idt)),
            batch_format="pyarrow",
        )
        tagged_lbl = labels.map_batches(
            lambda g: pa.table({
                "node": pa.array(g["node"], idt),
                "nbr": pa.nulls(len(g), idt),
                "label": pa.array(g["label"], idt),
                "bucket": pa.array(bucket_hash(g["node"], n_buckets), pa.int64()),
            }),
            batch_format="pandas",
        )

        def emit_msgs(g: pd.DataFrame) -> pa.Table:
            # one coarse bucket = many whole node-groups; all vectorized:
            # min label per node via a pandas groupby, then mapped onto the
            # bucket's adjacency rows.  Arrow out (homogeneous block types).
            lab = g.loc[g["label"].notna(), ["node", "label"]]
            adj_rows = g.loc[g["nbr"].notna(), ["node", "nbr"]]
            if lab.empty or adj_rows.empty:
                return pa.table(
                    {"node": pa.array([], idt),
                     "label": pa.array([], idt)}
                )
            min_lbl = lab.groupby("node", sort=False)["label"].min()
            m = adj_rows["node"].map(min_lbl)
            ok = m.notna()
            return pa.table(
                {"node": pa.array(adj_rows["nbr"][ok], idt),
                 "label": pa.array(m[ok], idt)}
            )

        msgs = (
            tagged_adj.union(tagged_lbl)
            .groupby("bucket")
            .map_groups(emit_msgs, batch_format="pandas")
        )
        # 2) min over (own label ∪ incoming labels).  The union SUMS the two
        # inputs' block counts and groupby preserves it, so without the
        # repartition the label block count doubles every iteration
        # (exponential task explosion — measured: iter 7 already at 511
        # blocks / 31 s on a 2k-node graph).
        labels = (
            msgs.union(labels)
            .repartition(label_blocks)
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


# ---------------------------------------------------------------------------
# PageRank over the near-dup graph (iterative join + aggregate)
# ---------------------------------------------------------------------------

def pagerank_dupgraph(docs_ds, *, iters: int = 2, scale: int = 1_000_000,
                      tau100: int = 10, max_df: int = 100,
                      n_blocks: int = 32):
    """Integer PageRank over the undirected near-dup pair graph — the
    centrality audit that surfaces template/boilerplate hubs (a doc
    near-duplicating MANY others is a template, and its rank says so
    louder than its raw degree).  All-integer fixed-point law so the
    DuckDB oracle (unrolled iterations over the shared ngram-pair law)
    hash-compares:

        ``pr_0 = scale``;
        ``pr_{t+1}(v) = (15·scale)//100 +
                        (85 · Σ_{u∈N(v)} pr_t(u) // deg(u)) // 100``

    (floor at every step, damping 0.85).  Nodes = docs appearing in at
    least one pair.

    Scale shape per iteration (the iterative-Dataset-loop pattern label
    propagation established): one coarse-bucket hash join (edges ⋈ pr on
    the source) + per-batch partial sums into one groupby-Sum on the
    destination; the edge table is MATERIALIZED once and reused every
    round, and the rank table is repartitioned each round (an iterative
    union/groupby chain otherwise multiplies block counts — the
    documented exponential-task trap).
    """
    from ..pipelines.analytics import _grouped_sum
    from .dedup import ngram_jaccard_pairs
    from .joins import bucket_hash_join

    pairs = ngram_jaccard_pairs(docs_ds, n=3, tau100=tau100,
                                max_df=max_df)

    def undirect(t: pa.Table) -> pa.Table:
        l = t.column("left_id").to_numpy(zero_copy_only=False)
        r = t.column("right_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "u": pa.array(np.concatenate([l, r]), pa.int64()),
            "v": pa.array(np.concatenate([r, l]), pa.int64()),
        })

    edges = pairs.map_batches(undirect, batch_format="pyarrow") \
        .repartition(n_blocks).materialize()
    deg = _grouped_sum(
        edges,
        ["u"],
        lambda df: pa.Table.from_pandas(
            df.groupby("u", as_index=False).size()
            .rename(columns={"size": "d"}), preserve_index=False),
        ["d"],
    )
    # edges with the source degree attached (static across iterations);
    # explicit types — deg is an aggregate output and a schema probe on
    # an un-executed AllToAll runs it to limit 1
    _i64 = pa.int64()
    ed = bucket_hash_join(edges, deg, on="u", how="inner",
                          left_types={"u": _i64, "v": _i64},
                          right_types={"u": _i64, "d": _i64}) \
        .repartition(n_blocks).materialize()

    pr = deg.map_batches(
        lambda t: pa.table({
            "u": t.column("u").cast(pa.int64()),
            "pr": pa.array(np.full(t.num_rows, scale, np.int64)),
        }),
        batch_format="pyarrow",
    ).repartition(max(2, n_blocks // 4)).materialize()

    base = (15 * scale) // 100
    for _ in range(iters):
        j = bucket_hash_join(
            ed.map_batches(
                lambda t: pa.table({
                    "u": t.column("u").cast(pa.int64()),
                    "v": t.column("v").cast(pa.int64()),
                    "d": t.column("d").cast(pa.int64()),
                }), batch_format="pyarrow"),
            pr, on="u", how="inner",
            left_types={"u": _i64, "v": _i64, "d": _i64},
            right_types={"u": _i64, "pr": _i64})

        def contrib(df: pd.DataFrame) -> pa.Table:
            c = df["pr"].to_numpy(np.int64) // df["d"].to_numpy(np.int64)
            g = pd.DataFrame({"v": df["v"].to_numpy(np.int64), "c": c}) \
                .groupby("v", as_index=False)["c"].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        summed = _grouped_sum(j, ["v"], contrib, ["c"])
        pr = summed.map_batches(
            lambda t: pa.table({
                "u": t.column("v").cast(pa.int64()),
                "pr": pa.array(
                    base + 85 * t.column("c").to_numpy(
                        zero_copy_only=False).astype(np.int64) // 100,
                    pa.int64()),
            }),
            batch_format="pyarrow",
        ).repartition(max(2, n_blocks // 4)).materialize()

    return pr.map_batches(
        lambda t: pa.table({"doc_id": t.column("u"),
                            "pagerank": t.column("pr")}),
        batch_format="pyarrow")


def graph_triangles(docs_ds, *, tau100: int = 10, max_df: int = 100,
                    n_buckets: int = 256, text_col: str = "text",
                    id_col: str = "doc_id"):
    """Triangle census of the near-dup pair graph — the transitivity
    audit for a similarity relation (a high global clustering
    coefficient says near-dup is behaving like an equivalence relation
    → safe to close transitively; a low one says closure would chain
    unrelated docs).  One row out:

        ``(n_nodes, n_edges, n_wedges, n_triangles, transitivity_bp)``

    with ``n_wedges = Σ_v C(deg(v), 2)`` (connected triples, open +
    closed) and ``transitivity_bp = 3·triangles·10⁴ // wedges`` (floor
    basis points; 0 when the graph has no wedge).  Edge law ==
    :func:`~.dedup.ngram_jaccard_pairs` (identical CTE in the oracle).

    Scale shape: edges materialize ONCE (the near-dup pair set is
    output-sized, not corpus-sized); degrees/wedge-stats and wedge
    *candidates* both come from one node-hash groupby — a triangle
    ``x<y<z`` is generated exactly once, at its LOWEST vertex, as the
    neighbor pair ``(y, z)``; the closing-edge test fuses with the
    wedge count in ONE pair-hash reduce (direct edges ride a flag
    column, the two-hop lesson); only ≤ n_buckets scalar partial rows
    reach the driver.  Wedge fan-out at a vertex is C(deg, 2) — hubs in
    a near-dup graph mean un-deduped templates; at 100-TB scale run
    exact_dedup first or cap degrees the two_hop_pairs way.
    """
    import os

    from ..util import pair_bucket
    from .dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(docs_ds, n=3, tau100=tau100,
                                max_df=max_df, text_col=text_col,
                                id_col=id_col)

    edges = pairs.map_batches(
        lambda t: pa.table({
            "id_a": t.column("left_id").cast(pa.int64()),
            "id_b": t.column("right_id").cast(pa.int64())}),
        batch_format="pyarrow").materialize()

    def explode_e2(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = t.column("id_b").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = np.concatenate([a, b])
        return pa.table({
            "m": pa.array(m, pa.int64()),
            "nbr": pa.array(np.concatenate([b, a]), pa.int64()),
            "_mb": pa.array(bucket_hash(pd.Series(m), n_buckets),
                            pa.int64())})

    _part_schema = {
        "id_a": pa.int64(), "id_b": pa.int64(), "wcnt": pa.int64(),
        "direct": pa.int64(), "nodes_p": pa.int64(),
        "wedges_p": pa.int64(), "_pb": pa.int64()}
    _empty = pa.table({k: pa.array([], v) for k, v in
                       _part_schema.items()})

    def wedge_partial(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return _empty
        per = g.groupby("m").size()
        rows = {
            "id_a": [np.int64(-1)], "id_b": [np.int64(-1)],
            "wcnt": [np.int64(0)], "direct": [np.int64(0)],
            "nodes_p": [np.int64(len(per))],
            "wedges_p": [np.int64((per * (per - 1) // 2).sum())],
            "_pb": [np.int64(0)]}
        up = g[g["nbr"] > g["m"]]
        if len(up):
            x = up.merge(up, on="m")
            x = x[x["nbr_x"] < x["nbr_y"]]
            if len(x):
                agg = x.groupby(["nbr_x", "nbr_y"], as_index=False) \
                    .size()
                a = agg["nbr_x"].to_numpy(np.int64)
                b = agg["nbr_y"].to_numpy(np.int64)
                rows["id_a"].extend(a.tolist())
                rows["id_b"].extend(b.tolist())
                rows["wcnt"].extend(
                    agg["size"].to_numpy(np.int64).tolist())
                rows["direct"].extend([0] * len(a))
                rows["nodes_p"].extend([0] * len(a))
                rows["wedges_p"].extend([0] * len(a))
                rows["_pb"].extend(
                    pair_bucket(a, b, n_buckets).tolist())
        return pa.table({k: pa.array(v, _part_schema[k])
                         for k, v in rows.items()})

    wedges = edges.map_batches(explode_e2, batch_format="pyarrow") \
        .groupby("_mb").map_groups(wedge_partial, batch_format="pandas")

    def direct_rows(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = t.column("id_b").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = len(a)
        return pa.table({
            "id_a": pa.array(a, pa.int64()),
            "id_b": pa.array(b, pa.int64()),
            "wcnt": pa.array(np.zeros(n, np.int64)),
            "direct": pa.array(np.ones(n, np.int64)),
            "nodes_p": pa.array(np.zeros(n, np.int64)),
            "wedges_p": pa.array(np.zeros(n, np.int64)),
            "_pb": pa.array(pair_bucket(a, b, n_buckets), pa.int64())})

    direct = edges.map_batches(direct_rows, batch_format="pyarrow")

    def reduce_census(g: pd.DataFrame) -> pa.Table:
        stat = g[g["id_a"] < 0]
        rows = g[g["id_a"] >= 0]
        tri = np.int64(0)
        if len(rows):
            agg = rows.groupby(["id_a", "id_b"], as_index=False).agg(
                w=("wcnt", "sum"), d=("direct", "max"))
            tri = np.int64(agg.loc[agg["d"] == 1, "w"].sum())
        return pa.table({
            "tri_p": pa.array([tri], pa.int64()),
            "edges_p": pa.array([np.int64(rows["direct"].sum())
                                 if len(rows) else np.int64(0)],
                                pa.int64()),
            "nodes_p": pa.array([np.int64(stat["nodes_p"].sum())
                                 if len(stat) else np.int64(0)],
                                pa.int64()),
            "wedges_p": pa.array([np.int64(stat["wedges_p"].sum())
                                  if len(stat) else np.int64(0)],
                                 pa.int64())})

    # union sums block counts — repartition before the pair reduce
    nb = max(16, 2 * int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    parts = wedges.union(direct).repartition(nb) \
        .groupby("_pb").map_groups(reduce_census,
                                   batch_format="pandas") \
        .to_pandas()  # ≤ n_buckets scalar partial rows — bounded

    import ray.data as rd

    tri = int(parts["tri_p"].sum()) if len(parts) else 0
    n_edges = int(parts["edges_p"].sum()) if len(parts) else 0
    n_nodes = int(parts["nodes_p"].sum()) if len(parts) else 0
    n_wedges = int(parts["wedges_p"].sum()) if len(parts) else 0
    return rd.from_arrow(pa.table({
        "n_nodes": pa.array([n_nodes], pa.int64()),
        "n_edges": pa.array([n_edges], pa.int64()),
        "n_wedges": pa.array([n_wedges], pa.int64()),
        "n_triangles": pa.array([tri], pa.int64()),
        "transitivity_bp": pa.array(
            [3 * tri * 10_000 // n_wedges if n_wedges > 0 else 0],
            pa.int64())}))
