"""Similarity search over an embedding column (``list<float>``).

* :func:`cosine_threshold_pairs` / :func:`ann_topk` — brute-force baseline:
  the (small) query matrix is normalized once, broadcast via ``ray.put``, and
  every data batch does ONE float64 numpy matmul against it.  Set-shaped
  outputs (ids only) so the DuckDB ``list_cosine_similarity`` oracle matches
  value-hashes without float summation-order hazards.
* :func:`embedding_cosine_dups` — all-pairs near-dup at threshold: the full
  normalized matrix is broadcast (N×d floats; fine up to ~1e6×64 ≈ 256 MB —
  beyond that switch to :func:`ivf_partition` bucketing, same output
  contract), each batch multiplies against it and keeps ``i < j`` pairs.
* :func:`ivf_partition` + :func:`ivf_topk` — the scale path: driver-side
  k-means on a sample → broadcast centroids → partition assignment per row;
  queries probe only the ``nprobe`` nearest partitions.

The reference repo has no vector ops; these are graft additions for
training-data pipelines.
"""

from __future__ import annotations

import numpy as np

from ..util import default_pool
import pyarrow as pa


def _mat(batch_col) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix (vectorized flatten)."""
    arr = batch_col.combine_chunks() if isinstance(batch_col, pa.ChunkedArray) \
        else batch_col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _mat_from_rows(rows: list) -> np.ndarray:
    return np.stack(rows) if rows else np.empty((0, 0), np.float64)


def _unit(m: np.ndarray) -> np.ndarray:
    nrm = np.linalg.norm(m, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    return m / nrm


def _in_expr(col: str, values) -> str:
    return f"{col} in [{', '.join(str(int(v)) for v in values)}]"


def load_query_matrix(ds, query_ids: list[int], *, id_col: str = "vec_id",
                      vec_col: str = "embedding", normalize: bool = True):
    """Collect the (tiny) query rows to the driver, normalized by default
    (``normalize=False`` returns the raw float64 rows — the quantized path
    must quantize the RAW embedding, not the unit vector)."""
    tbl = pa.concat_tables(
        ds.filter(expr=_in_expr(id_col, query_ids))
        .iter_batches(batch_format="pyarrow")
    )
    ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
    mat = _mat(tbl.column(vec_col))
    if normalize:
        mat = _unit(mat)
    order = np.argsort(ids, kind="stable")
    return ids[order], mat[order]


def _quantize127(m: np.ndarray) -> np.ndarray:
    """Scalar quantization onto the int8 grid: ``floor(x·127 + 0.5)`` in
    float64 — bit-identical to DuckDB ``floor(CAST(x AS DOUBLE)*127+0.5)``
    (float32→float64 widening is exact, then identical IEEE double ops).
    Returned as float64 integers so the downstream matmul is BLAS dgemm,
    exact up to 2^53 (|q|≈127, so any realistic dim is far below)."""
    return np.floor(m * 127.0 + 0.5)


class _SimsVsQueries:
    """Actor: one matmul per batch against the broadcast query matrix."""

    def __init__(self, qids_ref, qmat_ref, threshold: float | None,
                 local_k: int | None, id_col: str, vec_col: str):
        import ray

        self.qids = ray.get(qids_ref)
        self.qmat = ray.get(qmat_ref)  # (q, d) unit rows
        self.threshold, self.local_k = threshold, local_k
        self.id_col, self.vec_col = id_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        m = _unit(_mat(batch.column(self.vec_col)))
        sims = m @ self.qmat.T  # (n, q)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(self.qids)):
            col = sims[:, qi]
            mask = ids != self.qids[qi]
            if self.threshold is not None:
                mask &= col >= self.threshold
            idx = np.nonzero(mask)[0]
            if self.local_k is not None and len(idx) > self.local_k:
                # local top-k (ties broken by id for determinism)
                sub = idx[np.lexsort((ids[idx], -col[idx]))[: self.local_k]]
                idx = sub
            out_q.extend([self.qids[qi]] * len(idx))
            out_n.extend(ids[idx])
            out_s.extend(col[idx])
        return pa.table({
            "query_id": pa.array(np.asarray(out_q, np.int64), pa.int64()),
            "neighbor_id": pa.array(np.asarray(out_n, np.int64), pa.int64()),
            "sim": pa.array(np.asarray(out_s, np.float64), pa.float64()),
        })


def cosine_threshold_pairs(ds, query_ids: list[int], *, threshold: float,
                           id_col: str = "vec_id", vec_col: str = "embedding",
                           concurrency=None):
    """All (query_id, neighbor_id) with cosine >= threshold — set-shaped."""
    import ray

    qids, qmat = load_query_matrix(ds, query_ids, id_col=id_col, vec_col=vec_col)
    hits = ds.map_batches(
        _SimsVsQueries,
        fn_constructor_kwargs={
            "qids_ref": ray.put(qids), "qmat_ref": ray.put(qmat),
            "threshold": threshold, "local_k": None,
            "id_col": id_col, "vec_col": vec_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency or default_pool(),
    )
    return hits.select_columns(["query_id", "neighbor_id"])


def ann_topk(ds, query_ids: list[int], k: int, *, id_col: str = "vec_id",
             vec_col: str = "embedding", concurrency=None, _queries=None):
    """Exact top-k (brute force): per-batch local top-k, then one groupby
    over ~q·k·num_blocks rows merges to the global top-k per query."""
    import ray

    qids, qmat = _queries if _queries is not None else load_query_matrix(
        ds, query_ids, id_col=id_col, vec_col=vec_col
    )
    local = ds.map_batches(
        _SimsVsQueries,
        fn_constructor_kwargs={
            "qids_ref": ray.put(qids), "qmat_ref": ray.put(qmat),
            "threshold": None, "local_k": k,
            "id_col": id_col, "vec_col": vec_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency or default_pool(),
    )

    def merge_topk(g):
        order = np.lexsort((g["neighbor_id"].to_numpy(), -g["sim"].to_numpy()))
        top = g.iloc[order[:k]]
        return pa.table({
            "query_id": pa.array(top["query_id"].to_numpy(), pa.int64()),
            "neighbor_id": pa.array(top["neighbor_id"].to_numpy(), pa.int64()),
            "rank": pa.array(np.arange(1, len(top) + 1), pa.int64()),
        })

    return local.groupby("query_id").map_groups(merge_topk, batch_format="pandas")


class _QDotsVsQueries:
    """Actor: quantize each batch onto the int8 grid and take ONE exact
    integer dot-product matmul against the broadcast quantized queries.
    The 100-TB rationale: int8 codes are 4× smaller than float32 (shuffle
    volume, object-store footprint, memory bandwidth — the measured
    single-VM ceiling), and the score is an exact int64 so the result is
    hash-comparable, not approximately-equal."""

    def __init__(self, qids_ref, qmat_ref, local_k: int,
                 id_col: str, vec_col: str):
        import ray

        self.qids = ray.get(qids_ref)
        self.qmat = _quantize127(ray.get(qmat_ref))  # (q, d) raw -> codes
        self.local_k = local_k
        self.id_col, self.vec_col = id_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        dots = _quantize127(_mat(batch.column(self.vec_col))) @ self.qmat.T
        out_q, out_n, out_d = [], [], []
        for qi in range(len(self.qids)):
            col = dots[:, qi]
            idx = np.nonzero(ids != self.qids[qi])[0]
            if len(idx) > self.local_k:
                idx = idx[np.lexsort((ids[idx], -col[idx]))[: self.local_k]]
            out_q.extend([self.qids[qi]] * len(idx))
            out_n.extend(ids[idx])
            out_d.extend(col[idx])
        return pa.table({
            "query_id": pa.array(np.asarray(out_q, np.int64), pa.int64()),
            "neighbor_id": pa.array(np.asarray(out_n, np.int64), pa.int64()),
            "dot": pa.array(np.asarray(out_d, np.float64).astype(np.int64),
                            pa.int64()),
        })


def quantized_topk(ds, query_ids: list[int], k: int, *,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   concurrency=None):
    """Exact top-k under int8 scalar quantization (the memory/bandwidth
    scale path for brute-force ANN): codes = ``floor(x·127+0.5)``, score =
    integer dot product of the codes.  Same local-top-k + one-merge shape
    as :func:`ann_topk`, but the score column itself is on the oracled
    surface (int64 — no float rank-only hedge)."""
    import ray

    qids, qmat = load_query_matrix(ds, query_ids, id_col=id_col,
                                   vec_col=vec_col, normalize=False)
    local = ds.map_batches(
        _QDotsVsQueries,
        fn_constructor_kwargs={
            "qids_ref": ray.put(qids), "qmat_ref": ray.put(qmat),
            "local_k": k, "id_col": id_col, "vec_col": vec_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency or default_pool(),
    )

    def merge_topk(g):
        order = np.lexsort((g["neighbor_id"].to_numpy(),
                            -g["dot"].to_numpy()))
        top = g.iloc[order[:k]]
        return pa.table({
            "query_id": pa.array(top["query_id"].to_numpy(), pa.int64()),
            "neighbor_id": pa.array(top["neighbor_id"].to_numpy(),
                                    pa.int64()),
            "rank": pa.array(np.arange(1, len(top) + 1), pa.int64()),
            "dot": pa.array(top["dot"].to_numpy(), pa.int64()),
        })

    return local.groupby("query_id").map_groups(merge_topk,
                                                batch_format="pandas")


class _ChunkPairSims:
    """Actor: one (chunk_i, chunk_j) matmul per work item.

    Chunks are pre-normalized Arrow blocks living in the object store; the
    actor fetches the two it needs per item and caches a few as matrices
    (plasma reads are zero-copy; the cache avoids repeated list<float> →
    ndarray conversion when a chunk recurs across this actor's items).
    """

    _CACHE_MAX = 8

    def __init__(self, refs_ref, threshold: float, id_col: str, vec_col: str):
        import ray

        self.refs = ray.get(refs_ref)  # list of ObjectRefs to Arrow blocks
        self.threshold = threshold
        self.id_col, self.vec_col = id_col, vec_col
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def _chunk(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        got = self._cache.get(idx)
        if got is None:
            import ray

            t = ray.get(self.refs[idx])
            got = (t.column(self.id_col).to_numpy(zero_copy_only=False),
                   _unit(_mat(t.column(self.vec_col))))
            if len(self._cache) >= self._CACHE_MAX:
                self._cache.pop(next(iter(self._cache)))
            self._cache[idx] = got
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_l, out_r = [], []
        for i, j in zip(batch.column("i").to_pylist(),
                        batch.column("j").to_pylist()):
            ids_a, mat_a = self._chunk(i)
            ids_b, mat_b = self._chunk(j)
            sims = mat_a @ mat_b.T
            rows, cols = np.nonzero(sims >= self.threshold)
            la, rb = ids_a[rows], ids_b[cols]
            keep = la != rb  # drop self-pairs (i == j diagonal)
            la, rb = la[keep], rb[keep]
            lo = np.minimum(la, rb)
            hi = np.maximum(la, rb)
            if i == j:  # triangle chunk: every unordered pair appears twice
                keep2 = la < rb
                lo, hi = lo[keep2], hi[keep2]
            out_l.append(lo)
            out_r.append(hi)
        l = np.concatenate(out_l) if out_l else np.empty(0, np.int64)
        r = np.concatenate(out_r) if out_r else np.empty(0, np.int64)
        return pa.table({
            "left_id": pa.array(l.astype(np.int64), pa.int64()),
            "right_id": pa.array(r.astype(np.int64), pa.int64()),
        })


def embedding_cosine_dups(ds, *, threshold: float = 0.35,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          concurrency=None, chunk_rows: int = 65536,
                          max_rows: int = 10_000_000):
    """All i<j pairs with cosine >= threshold — EXACT block-pair join.

    The input is normalized once and materialized as ~``chunk_rows``-row
    Arrow chunks in the OBJECT STORE; a work-item dataset of (i, j) chunk
    pairs (i <= j) fans out over an actor pool, each item one
    chunk×chunk matmul.  The driver holds only chunk refs — no driver-side
    concat and no full-matrix ``ray.put`` (the old broadcast baseline capped
    out around 1e6 rows).  Compute stays inherently O(N²): that is the price
    of EXACTNESS at a low threshold; for approximate near-dup at scale use
    :func:`ivf_partition` bucketing, simhash, or minhash instead.
    """
    import ray
    import ray.data

    norm = ds.select_columns([id_col, vec_col]).materialize()
    n = norm.count()
    if n > max_rows:
        # the quadratic is a deliberate choice at audit scale, never a
        # silent default at corpus scale: refuse loudly and name the
        # sub-quadratic alternatives instead of launching O(N²/chunk²) tasks
        raise ValueError(
            f"embedding_cosine_dups is an EXACT all-pairs join: {n:,} rows "
            f"exceeds max_rows={max_rows:,} (≈{(n / chunk_rows) ** 2 / 2:.0f} "
            "chunk-pair tasks). For near-dup detection at this scale use "
            "ivf_cosine_dups (IVF-partitioned exact-within-cell, the "
            "semantic_keep_list pipeline) or srp_lsh_pairs (SRP-LSH "
            "hamming banding); raise max_rows only for a deliberate "
            "exact audit."
        )
    n_chunks = max(1, -(-n // chunk_rows))
    if n_chunks > 1 or norm.num_blocks() > n_chunks:
        norm = norm.repartition(n_chunks).materialize()
    refs = norm.to_arrow_refs()
    refs_ref = ray.put(refs)
    c = len(refs)
    n_items = c * (c + 1) // 2  # unordered chunk pairs incl. the diagonal
    # the work-item set is a RANGE, not a driver-built list of dicts
    # (O(chunks²) dicts on the driver was the last materialization here);
    # each task decodes its flat indices into (i, j) chunk coordinates
    work = ray.data.range(
        n_items, override_num_blocks=min(n_items, max(64, 4 * int(
            ray.cluster_resources().get("CPU", 8))))
    ).map_batches(_decode_chunk_pairs(c), batch_format="pyarrow")
    return work.map_batches(
        _ChunkPairSims,
        fn_constructor_kwargs={
            "refs_ref": refs_ref, "threshold": threshold,
            "id_col": id_col, "vec_col": vec_col,
        },
        batch_format="pyarrow",
        batch_size=1,
        concurrency=concurrency or default_pool(),
    )


def _decode_chunk_pairs(c: int):
    """Vectorized flat-index -> upper-triangle (i, j) decode, i <= j < c.

    Row-major triangle: t(i, j) = i*c − i(i−1)/2 + (j − i).  The float sqrt
    inverse is corrected by ±1 against the exact integer row offsets.
    """
    def decode(b: pa.Table) -> pa.Table:
        t = b.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        i = np.floor((2 * c + 1 - np.sqrt((2 * c + 1.0) ** 2 - 8.0 * t)) / 2) \
            .astype(np.int64)
        i = np.clip(i, 0, c - 1)
        off = i * c - i * (i - 1) // 2
        i = np.where(t < off, i - 1, i)
        off = i * c - i * (i - 1) // 2
        nxt = (i + 1) * c - (i + 1) * i // 2
        i = np.where(t >= nxt, i + 1, i)
        off = i * c - i * (i - 1) // 2
        j = t - off + i
        return pa.table({"i": pa.array(i, pa.int64()),
                         "j": pa.array(j, pa.int64())})

    return decode


def srp_signatures(ds, hyperplanes: np.ndarray, *, id_col: str = "vec_id",
                   vec_col: str = "embedding"):
    """Signed-random-projection 64-bit signature per embedding row.

    Bit b = 1 iff ``v · h_b > 0`` — the classic SRP-LSH sketch (Charikar
    2002): the probability two vectors agree on a bit is 1 − θ/π, so small
    hamming distance ⟺ high cosine.  One (n × d) @ (d × 64) matmul per
    batch; the hyperplanes are broadcast once via ``ray.put``.
    """
    import ray

    assert hyperplanes.shape[0] == 64
    href = ray.put(hyperplanes.astype(np.float64))
    bit_vals = (np.uint64(1) << np.arange(64, dtype=np.uint64))

    class Sign:
        def __init__(self):
            self.h = ray.get(href)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _mat(batch.column(vec_col))
            bits = (m @ self.h.T) > 0 if len(m) else np.empty((0, 64), bool)
            sig = (bits.astype(np.uint64) * bit_vals[None, :]).sum(axis=1)
            return pa.table({
                id_col: batch.column(id_col),
                "srp": pa.array(sig.astype(np.uint64).view(np.int64),
                                pa.int64()),
            })

    return ds.map_batches(Sign, batch_format="pyarrow", concurrency=default_pool())


def srp_lsh_pairs(ds, *, max_hamming: int = 6, seed: int = 0,
                  id_col: str = "vec_id", vec_col: str = "embedding"):
    """Embedding near-dup candidate pairs via SRP-LSH banding.

    64-bit SRP signatures (fixed seeded hyperplanes → fully deterministic,
    DuckDB-oracle-able) fed through the same pigeonhole hamming banding as
    text simhash (:func:`..dedup.hamming_band_pairs`): full recall for
    signature distance <= max_hamming, candidate volume bounded by band
    agreement instead of O(N²).  The scale path for embedding near-dup
    alongside :func:`ivf_cosine_dups`.

    Pruning strength is ``64 // (max_hamming + 1)`` bits per band: at the
    near-dup settings this is built for (max_hamming <= 6, >= 9-bit bands)
    banding prunes aggressively; very loose thresholds (e.g. 16 → 3-bit
    bands) degrade toward all-pairs and belong only on small inputs.
    """
    from .dedup import hamming_band_pairs

    hp = srp_hyperplanes(seed)
    sigs = srp_signatures(ds, hp, id_col=id_col, vec_col=vec_col)
    return hamming_band_pairs(sigs, max_hamming=max_hamming, id_col=id_col,
                              sig_col="srp")


def srp_hyperplanes(seed: int = 0, dim: int = 64) -> np.ndarray:
    """The fixed (64, dim) seeded Gaussian hyperplane set shared by the Ray
    pipeline and the inlined-literal DuckDB oracle."""
    rng = np.random.default_rng(1_000_003 + seed)
    return rng.standard_normal((64, dim))


def ivf_cosine_dups(ds, centroids: np.ndarray, *, threshold: float = 0.9,
                    id_col: str = "vec_id", vec_col: str = "embedding"):
    """APPROXIMATE near-dup pairs: all-pairs only WITHIN each IVF partition.

    The bucketed alternative to :func:`embedding_cosine_dups` for
    high-threshold near-duplicate detection at scale — near-identical
    vectors share a nearest centroid, so recall at high thresholds is high
    (pytest-checked on planted duplicates) while compute drops from O(N²)
    to Σ|partition|².  Cross-partition pairs are missed by construction.
    """
    import pandas as pd

    parted = ivf_partition(ds, centroids, id_col=id_col, vec_col=vec_col)

    def pairs_in_partition(g: pd.DataFrame) -> pa.Table:
        ids = g[id_col].to_numpy()
        mat = _unit(np.stack(g[vec_col].to_numpy()).astype(np.float64))
        sims = mat @ mat.T
        rows, cols = np.nonzero(sims >= threshold)
        keep = ids[rows] < ids[cols]
        return pa.table({
            "left_id": pa.array(ids[rows][keep].astype(np.int64), pa.int64()),
            "right_id": pa.array(ids[cols][keep].astype(np.int64), pa.int64()),
        })

    return parted.groupby("partition").map_groups(
        pairs_in_partition, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# IVF (k-means bucketed) scale path
# ---------------------------------------------------------------------------

def fixed_centroids(n_clusters: int, dim: int, seed: int = 0) -> np.ndarray:
    """Deterministic data-INDEPENDENT unit centroids (seeded Gaussian).

    The oracle-able IVF configuration: the identical literals can be inlined
    into a DuckDB oracle (nearest-centroid assignment, nprobe probing and
    top-k are then plain SQL), which a data-dependent k-means — whose
    centroids differ per scale factor — cannot.  Random unit directions are
    a legitimate coarse quantizer (random-hyperplane partitioning); k-means
    quality is exercised separately (pytest recall on planted clusters).
    """
    rng = np.random.default_rng(seed)
    return _unit(rng.standard_normal((n_clusters, dim)))


def kmeans_centroids(ds, n_clusters: int, *, vec_col: str = "embedding",
                     sample: int = 4096, iters: int = 10, seed: int = 0):
    """Driver-side mini k-means on a deterministic UNIFORM sample.

    Sampling is order-independent: each row's rank is blake2b over its vector
    bytes, each batch pre-truncates to its ``sample`` smallest ranks inside
    ``map_batches``, and the driver merges to the global ``sample`` smallest
    (a ``limit(sample)`` took the first rows — biased centroids whenever the
    input is sorted or clustered; pytest-checked on cluster-sorted input).
    Driver memory is bounded by the heap of ``sample`` vectors.
    """
    import hashlib
    import heapq

    def rank_and_truncate(b: pa.Table) -> pa.Table:
        m = _mat(b.column(vec_col))
        if not len(m):
            return pa.table({"rank": pa.array([], pa.uint64()),
                             vec_col: b.column(vec_col)})
        ranks = np.fromiter(
            (int.from_bytes(
                hashlib.blake2b(v.tobytes(), digest_size=8).digest(), "big")
             for v in m),
            np.uint64, count=len(m),
        )
        keep = np.argsort(ranks, kind="stable")[:sample]
        return pa.table({
            "rank": pa.array(ranks[keep], pa.uint64()),
            vec_col: b.column(vec_col).take(pa.array(keep, pa.int64())),
        })

    ranked = ds.select_columns([vec_col]).map_batches(
        rank_and_truncate, batch_format="pyarrow"
    )
    heap: list = []  # max-heap via negated rank; (neg_rank, tiebreak, vector)
    n_seen = 0
    for b in ranked.iter_batches(batch_format="pyarrow"):
        m = _mat(b.column(vec_col))
        for r, v in zip(b.column("rank").to_pylist(), m):
            n_seen += 1
            if len(heap) < sample:
                heapq.heappush(heap, (-r, n_seen, v))
            elif -heap[0][0] > r:
                heapq.heapreplace(heap, (-r, n_seen, v))
    heap.sort(key=lambda t: -t[0])  # ascending rank → deterministic order
    x = _unit(_mat_from_rows([v for _, _, v in heap]))
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)]
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _unit(cent)
    return cent


def ivf_partition(ds, centroids: np.ndarray, *, id_col: str = "vec_id",
                  vec_col: str = "embedding"):
    """Adds a ``partition`` column = nearest-centroid id (the IVF list)."""
    import ray

    cref = ray.put(centroids)

    class Assign:
        def __init__(self):
            self.cent = ray.get(cref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _unit(_mat(batch.column(vec_col)))
            part = (m @ self.cent.T).argmax(axis=1).astype(np.int64) \
                if len(m) else np.empty(0, np.int64)
            return batch.append_column("partition", pa.array(part, pa.int64()))

    return ds.map_batches(Assign, batch_format="pyarrow", concurrency=default_pool())


def ivf_topk(ds, centroids: np.ndarray, query_ids: list[int], k: int, *,
             nprobe: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding"):
    """Approximate top-k: search only the ``nprobe`` nearest IVF lists.

    At scale the partitioned dataset is written once (resumable Parquet,
    partitioned by ``partition``) and reused across queries; here the
    assignment is fused inline.
    """
    parted = ivf_partition(ds, centroids, id_col=id_col, vec_col=vec_col)
    qids, qmat = load_query_matrix(ds, query_ids, id_col=id_col, vec_col=vec_col)
    # stable sort: tied cosines (duplicate/zero vectors or centroids)
    # must probe the LOWEST centroid id first, matching the oracle's
    # ORDER BY cos DESC, icid tie-break.
    probes = np.argsort(-(qmat @ centroids.T), axis=1,
                        kind='stable')[:, :nprobe]
    wanted = sorted({int(p) for row in probes for p in row})
    sub = parted.filter(expr=_in_expr("partition", wanted))
    return ann_topk(sub, query_ids, k, id_col=id_col, vec_col=vec_col,
                    _queries=(qids, qmat))


def cluster_stats(ds, centroids: np.ndarray, *, id_col: str = "vec_id",
                  vec_col: str = "embedding", label_col: str = "label",
                  buckets: int = 256):
    """Cluster-level corpus audit — the assignment + balance step of an
    embedding-curation pipeline (SemDeDup-style cluster pruning, mixture
    balancing): every vector is assigned to its nearest centroid (cosine
    argmax, ties -> lowest centroid id, the same kernel the IVF oracle
    verifies), and the output is one row per NON-EMPTY cluster:
    ``(cluster_id, n_vecs, majority_label, n_majority)``.

    Scale shape: assignment is one matmul per batch against the broadcast
    centroid matrix; counts pre-aggregate inside each batch into
    ``(cluster, label)`` partials, so the only shuffle carries at most
    K x L tiny rows regardless of input size; the majority pick runs per
    coarse hash bucket (``cluster % buckets``) — never one Ray group per
    cluster (see CLAUDE.md on the tiny-group pathology).
    Majority ties break to the LOWEST label (matches the SQL
    ``ORDER BY n DESC, lbl`` row_number tiebreak).
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    if centroids.shape[0] >= (1 << 31):
        raise ValueError("cluster id must fit 31 bits for the packed key")

    asg = ivf_partition(ds.select_columns([id_col, vec_col, label_col]),
                        centroids, id_col=id_col, vec_col=vec_col)

    def partial_counts(batch: pa.Table) -> pa.Table:
        if batch.column(label_col).null_count:
            # pandas groupby silently DROPS NaN keys — null labels would
            # undercount n_vecs and diverge from the SQL (which groups NULL)
            raise ValueError("cluster_stats: null labels are not supported")
        df = batch.select(["partition", label_col]).to_pandas()
        lbl = df[label_col].to_numpy()
        if len(lbl) and (lbl.min() < 0 or lbl.max() >= (1 << 31)):
            raise ValueError("label must be a non-negative 31-bit integer")
        cnt = df.groupby(["partition", label_col]).size()
        idx = cnt.index.to_frame(index=False)
        ck = (idx["partition"].to_numpy(np.int64) << np.int64(31)) \
            | idx[label_col].to_numpy(np.int64)
        return pa.table({"ck": pa.array(ck, pa.int64()),
                         "n": pa.array(cnt.to_numpy(np.int64), pa.int64())})

    agg = asg.map_batches(partial_counts, batch_format="pyarrow") \
        .groupby("ck").aggregate(Sum("n", alias_name="n"))

    def tag_bucket(batch: pa.Table) -> pa.Table:
        ck = batch.column("ck").to_numpy(zero_copy_only=False)
        cid = ck >> np.int64(31)
        return pa.table({
            "cluster_id": pa.array(cid, pa.int64()),
            "lbl": pa.array(ck & np.int64((1 << 31) - 1), pa.int64()),
            "n": batch.column("n"),
            "_ub": pa.array(cid % buckets, pa.int64()),
        })

    def majority(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["cluster_id", "n", "lbl"],
                          ascending=[True, False, True], kind="mergesort")
        top = g.groupby("cluster_id", sort=True).head(1)
        nv = g.groupby("cluster_id", sort=True)["n"].sum()
        return pa.table({
            "cluster_id": pa.array(top["cluster_id"].to_numpy(np.int64),
                                   pa.int64()),
            "n_vecs": pa.array(nv.to_numpy(np.int64), pa.int64()),
            "majority_label": pa.array(top["lbl"].to_numpy(np.int64),
                                       pa.int64()),
            "n_majority": pa.array(top["n"].to_numpy(np.int64), pa.int64()),
        })

    return agg.map_batches(tag_bucket, batch_format="pyarrow") \
        .groupby("_ub").map_groups(majority, batch_format="pandas")


def kmeans_update(ds, centroids: np.ndarray, *, id_col: str = "vec_id",
                  vec_col: str = "embedding"):
    """One exact Lloyd iteration (the k-means update step) on the int8
    quantization grid — the distributed-ML primitive behind IVF /
    SemDeDup codebook training, with a fully-integer oracled surface:

    * vectors AND centroids are quantized with :func:`_quantize127`
      (``floor(x·127+0.5)`` — the quantized_topk law, float64-exact),
    * each vector is assigned to the centroid minimizing the EXACT
      integer squared L2 distance (computed as ``c² − 2q·c`` per batch —
      one BLAS dgemm against the broadcast centroid codes; the per-row
      ``q²`` term can't change the argmin; ties → lowest cluster id,
      np.argmin's first-hit == the SQL ``ORDER BY d2, cid`` tiebreak),
    * the output is the update's SUFFICIENT STATISTICS, one row per
      (cluster, dim): ``dim_sum`` = Σ of member codes at that dim and
      ``n_vecs`` = member count (the new centroid is ``dim_sum/n_vecs``
      — the single float division is left to the caller so the oracled
      surface stays pure-integer).  Empty clusters emit no rows.

    Scale shape: per-batch partials pre-aggregate to ≤ K·D rows (the
    (K, D) sums matrix + K counts), so the only shuffle carries K·D tiny
    rows regardless of input size; centroid codes ship once via
    ``ray.put``.  Iterating = call again with the updated centroids.
    """
    import ray
    from ray.data.aggregate import Sum

    cq = _quantize127(centroids.astype(np.float64))
    c2 = (cq * cq).sum(axis=1)
    K, D = cq.shape
    cref = ray.put((cq, c2))

    class Part:
        def __init__(self):
            self.cq, self.c2 = ray.get(cref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            q = _quantize127(_mat(batch.column(vec_col)))
            if not len(q):
                return pa.table({
                    "cluster_id": pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "dim_sum": pa.array([], pa.int64()),
                    "n_vecs": pa.array([], pa.int64()),
                })
            # c² − 2q·c: exact integers in float64 (|q|,|c| ≤ 127)
            d = self.c2[None, :] - 2.0 * (q @ self.cq.T)
            cid = np.argmin(d, axis=1)
            sums = np.zeros((K, D), np.float64)
            np.add.at(sums, cid, q)
            cnt = np.bincount(cid, minlength=K).astype(np.int64)
            nz = np.flatnonzero(cnt)
            return pa.table({
                "cluster_id": pa.array(np.repeat(nz, D), pa.int64()),
                "dim": pa.array(np.tile(np.arange(D, dtype=np.int64),
                                        len(nz)), pa.int64()),
                "dim_sum": pa.array(sums[nz].ravel().astype(np.int64),
                                    pa.int64()),
                "n_vecs": pa.array(np.repeat(cnt[nz], D), pa.int64()),
            })

    return ds.select_columns([id_col, vec_col]).map_batches(
        Part, batch_format="pyarrow", concurrency=default_pool(),
    ).groupby(["cluster_id", "dim"]).aggregate(
        Sum("dim_sum", alias_name="dim_sum"),
        Sum("n_vecs", alias_name="n_vecs"))


# ---------------------------------------------------------------------------
# product quantization (PQ) encoding
# ---------------------------------------------------------------------------

def pq_encode(ds, codebook_ids: list[int], *, m: int = 4,
              id_col: str = "vec_id", vec_col: str = "embedding",
              concurrency=None):
    """Product-quantization encoding (Jégou et al. 2011) — THE footprint
    technique for billion-vector ANN: split each D-dim vector into ``m``
    subvectors and store one centroid id per subspace (D·4 bytes →
    m·1 byte).  Codebook = the int8-quantized subvectors of the rows named
    by ``codebook_ids`` (codebooks are trained offline and loaded — the
    explicit id list is that contract, and it makes the whole surface
    SQL-oracle-able; centroid cid = rank of its vec_id).  Assignment is
    exact integer argmin-L2 on the int8 grid via the kmeans_update law
    (``Σc² − 2q·c`` per subspace, ties → lowest cid), and the emitted
    ``cost`` adds back ``Σq²`` so it is the TRUE squared quantization
    error — the distortion audit comes free.

    Output (long form): ``(vec_id, subspace, code, cost)`` — m rows per
    vector.

    Scale shape: the codebook rows are a tiny driver fetch (k·D ints)
    broadcast once via ``ray.put``; encoding is map-only — one
    (n × sub_d)·(sub_d × k) integer dgemm per (batch, subspace).
    """
    import ray

    cids, cmat = load_query_matrix(ds, codebook_ids, id_col=id_col,
                                   vec_col=vec_col, normalize=False)
    ccodes = _quantize127(cmat).astype(np.int64)       # (k, D)
    k, D = ccodes.shape
    if D % m:
        raise ValueError(f"dim {D} not divisible by m={m}")
    sub_d = D // m
    # (m, k, sub_d): centroid cid is the RANK of its vec_id (sorted)
    cent = ccodes.reshape(k, m, sub_d).transpose(1, 0, 2)
    bc = ray.put(cent)

    class Encode:
        def __init__(self):
            self.cent = ray.get(bc)                     # (m, k, sub_d)
            self.c2 = (self.cent ** 2).sum(axis=2)      # (m, k)

        def __call__(self, batch: pa.Table) -> pa.Table:
            q = _quantize127(_mat(batch.column(vec_col))).astype(np.int64)
            n = q.shape[0]
            qs = q.reshape(n, m, sub_d)
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            out_id = np.repeat(ids, m)
            out_sub = np.tile(np.arange(m, dtype=np.int64), n)
            out_code = np.empty(n * m, np.int64)
            out_cost = np.empty(n * m, np.int64)
            for s in range(m):
                # (n, k) integer costs: c² − 2 q·c  (+ q² for the true L2)
                dots = qs[:, s, :] @ self.cent[s].T
                cost = self.c2[s][None, :] - 2 * dots
                code = np.argmin(cost, axis=1)          # first = lowest cid
                q2 = (qs[:, s, :] ** 2).sum(axis=1)
                out_code[s::m] = code
                out_cost[s::m] = cost[np.arange(n), code] + q2
            return pa.table({
                id_col: pa.array(out_id, pa.int64()),
                "subspace": pa.array(out_sub, pa.int64()),
                "code": pa.array(out_code, pa.int64()),
                "cost": pa.array(out_cost, pa.int64()),
            })

    return ds.map_batches(Encode, batch_format="pyarrow",
                          concurrency=concurrency or default_pool())


def pq_topk(ds, query_ids: list[int], codebook_ids: list[int], *,
            k: int = 10, m: int = 4, id_col: str = "vec_id",
            vec_col: str = "embedding", concurrency=None,
            search_ds=None):
    """PQ search by asymmetric distance computation (ADC, Jégou et al.
    2011): per query, precompute the ``m × |codebook|`` lookup table of
    exact integer grid distances ``Σ(q_d − c_d)²`` per subspace, then a
    document's approximate distance is ``Σ_s LUT[s][code(v, s)]`` — m
    table lookups instead of a D-dim dot product.  Exact-integer law end
    to end, ranked ``(adc ASC, vec_id)``, top-``k`` per query.

    Here codes are derived on the fly from the same :func:`pq_encode` law
    (at deployment scale the codes table is precomputed and this stage
    reads 1-byte codes, never raw vectors — that is the point of PQ);
    local per-batch top-k + one per-query merge, the ann_topk shape.

    ``search_ds`` (optional) scores a RESTRICTED dataset (e.g. the probed
    IVF cells) while queries and codebook still load from ``ds`` — the
    :func:`ivfpq_topk` composition hook.

    Output: ``(query_id, vec_id, adc, rank)``.
    """
    import pandas as pd

    import ray

    cids, cmat = load_query_matrix(ds, codebook_ids, id_col=id_col,
                                   vec_col=vec_col, normalize=False)
    ccodes = _quantize127(cmat).astype(np.int64)
    nk, D = ccodes.shape
    if D % m:
        raise ValueError(f"dim {D} not divisible by m={m}")
    sub_d = D // m
    cent = ccodes.reshape(nk, m, sub_d).transpose(1, 0, 2)  # (m, k, sub)

    qids, qmat = load_query_matrix(ds, query_ids, id_col=id_col,
                                   vec_col=vec_col, normalize=False)
    qcodes = _quantize127(qmat).astype(np.int64).reshape(len(qids), m, sub_d)
    # (nq, m, k) exact grid distances — the ADC lookup tables
    lut = ((qcodes[:, :, None, :] - cent[None, :, :, :]) ** 2).sum(axis=3)
    bc = ray.put((qids, cent, lut))

    class Score:
        def __init__(self):
            self.qids, self.cent, self.lut = ray.get(bc)

        def __call__(self, batch: pa.Table) -> pa.Table:
            v = _quantize127(_mat(batch.column(vec_col))).astype(np.int64)
            n = v.shape[0]
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            vs = v.reshape(n, m, sub_d)
            codes = np.empty((n, m), np.int64)
            for s in range(m):
                c2 = (self.cent[s] ** 2).sum(axis=1)
                codes[:, s] = np.argmin(
                    c2[None, :] - 2 * (vs[:, s, :] @ self.cent[s].T), axis=1)
            nq = len(self.qids)
            # (nq, n) ADC distances via fancy-indexed LUT sums
            adc = np.zeros((nq, n), np.int64)
            for s in range(m):
                adc += self.lut[:, s, :][:, codes[:, s]]
            rows = []
            for qi in range(nq):
                d = adc[qi]
                kk = min(k, n)
                part = np.argpartition(d, kk - 1)[:kk] if n > kk else \
                    np.arange(n)
                order = part[np.lexsort((ids[part], d[part]))]
                rows.append(pd.DataFrame({
                    "query_id": np.int64(self.qids[qi]),
                    id_col: ids[order], "adc": d[order]}))
            out = pd.concat(rows, ignore_index=True)
            return pa.Table.from_pandas(out, preserve_index=False)

    def merge(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["adc", id_col], ascending=[True, True],
                          kind="mergesort").head(k)
        return pa.table({
            "query_id": pa.array(g["query_id"].to_numpy(np.int64),
                                 pa.int64()),
            id_col: pa.array(g[id_col].to_numpy(np.int64), pa.int64()),
            "adc": pa.array(g["adc"].to_numpy(np.int64), pa.int64()),
            "rank": pa.array(np.arange(1, len(g) + 1, dtype=np.int64),
                             pa.int64()),
        })

    return (search_ds if search_ds is not None else ds) \
        .map_batches(Score, batch_format="pyarrow",
                     concurrency=concurrency or default_pool()) \
        .groupby("query_id").map_groups(merge, batch_format="pandas")


def grid_l2_topk(ds, query_ids: list[int], *, k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 concurrency=None):
    """Exact L2 top-k on the int8 grid — the FLAT-index baseline PQ is
    measured against (same quantization, no compression): ``dist =
    Σ_d (q_d − v_d)²`` in exact int64, ranked ``(dist ASC, vec_id)``.
    Local per-batch top-k + one per-query merge (ann_topk's shape).

    Output: ``(query_id, vec_id, dist, rank)``.
    """
    import pandas as pd

    import ray

    qids, qmat = load_query_matrix(ds, query_ids, id_col=id_col,
                                   vec_col=vec_col, normalize=False)
    qcodes = _quantize127(qmat).astype(np.int64)
    bc = ray.put((qids, qcodes))

    class Score:
        def __init__(self):
            self.qids, self.q = ray.get(bc)
            self.q2 = (self.q ** 2).sum(axis=1)        # (nq,)

        def __call__(self, batch: pa.Table) -> pa.Table:
            v = _quantize127(_mat(batch.column(vec_col))).astype(np.int64)
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            n = v.shape[0]
            if not n:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 id_col: pa.array([], pa.int64()),
                                 "dist": pa.array([], pa.int64())})
            v2 = (v ** 2).sum(axis=1)
            d = self.q2[:, None] + v2[None, :] - 2 * (self.q @ v.T)
            rows = []
            for qi in range(len(self.qids)):
                kk = min(k, n)
                part = np.argpartition(d[qi], kk - 1)[:kk] if n > kk else \
                    np.arange(n)
                order = part[np.lexsort((ids[part], d[qi][part]))]
                rows.append(pd.DataFrame({
                    "query_id": np.int64(self.qids[qi]),
                    id_col: ids[order], "dist": d[qi][order]}))
            return pa.Table.from_pandas(pd.concat(rows, ignore_index=True),
                                        preserve_index=False)

    def merge(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["dist", id_col], ascending=[True, True],
                          kind="mergesort").head(k)
        return pa.table({
            "query_id": pa.array(g["query_id"].to_numpy(np.int64),
                                 pa.int64()),
            id_col: pa.array(g[id_col].to_numpy(np.int64), pa.int64()),
            "dist": pa.array(g["dist"].to_numpy(np.int64), pa.int64()),
            "rank": pa.array(np.arange(1, len(g) + 1, dtype=np.int64),
                             pa.int64()),
        })

    return ds.map_batches(Score, batch_format="pyarrow",
                          concurrency=concurrency or default_pool()) \
        .groupby("query_id").map_groups(merge, batch_format="pandas")


def pq_recall(ds, query_ids: list[int], codebook_ids: list[int], *,
              k: int = 10, m: int = 4, id_col: str = "vec_id",
              vec_col: str = "embedding"):
    """Compression-loss audit: recall@k of :func:`pq_topk` (ADC over m
    1-byte codes) against :func:`grid_l2_topk` (the exact flat index on
    the same int8 grid) — the faiss-style IndexPQ-vs-IndexFlat check,
    measured per corpus, not assumed.  One row per query:
    ``(query_id, n_hit, recall_bp)``.

    Both component surfaces are individually oracled; the driver-side
    merge is bounded at |queries|·k rows (the ann_recall pattern).
    """
    import pandas as pd

    exact = grid_l2_topk(ds, query_ids, k=k, id_col=id_col,
                         vec_col=vec_col).to_pandas()
    approx = pq_topk(ds, query_ids, codebook_ids, k=k, m=m,
                     id_col=id_col, vec_col=vec_col).to_pandas()
    out = []
    for q in sorted(exact["query_id"].unique()):
        t = set(exact[exact["query_id"] == q][id_col])
        f = set(approx[approx["query_id"] == q][id_col])
        hit = len(t & f)
        out.append({"query_id": int(q), "n_hit": hit,
                    "recall_bp": hit * 10_000 // max(len(t), 1)})
    return pd.DataFrame(out)


def ivfpq_topk(ds, centroids: np.ndarray, query_ids: list[int],
               codebook_ids: list[int], *, k: int = 10, nprobe: int = 4,
               m: int = 4, id_col: str = "vec_id",
               vec_col: str = "embedding"):
    """IVF + PQ composite (faiss ``IVFPQ``) — the standard billion-vector
    index: a coarse quantizer restricts the search to the ``nprobe``
    nearest inverted lists, and the fine ranking inside them is PQ ADC
    (m 1-byte codes + per-query integer LUTs).  Probe semantics mirror
    :func:`ivf_topk` (the probed-cell UNION over all queries — one
    filtered scan serves the whole query batch); ranking and tie-break
    are :func:`pq_topk`'s ``(adc ASC, vec_id)``.

    Output: ``(query_id, vec_id, adc, rank)``, ≤ k rows per query.
    """
    import ray  # noqa: F401  (parity with siblings; ray.put via pq_topk)

    parted = ivf_partition(ds, centroids, id_col=id_col, vec_col=vec_col)
    _qids, qmat = load_query_matrix(ds, query_ids, id_col=id_col,
                                    vec_col=vec_col)
    # stable sort: tied cosines (duplicate/zero vectors or centroids)
    # must probe the LOWEST centroid id first, matching the oracle's
    # ORDER BY cos DESC, icid tie-break.
    probes = np.argsort(-(qmat @ centroids.T), axis=1,
                        kind='stable')[:, :nprobe]
    wanted = sorted({int(p) for row in probes for p in row})
    sub = parted.filter(expr=_in_expr("partition", wanted)) \
        .drop_columns(["partition"])
    return pq_topk(ds, query_ids, codebook_ids, k=k, m=m, id_col=id_col,
                   vec_col=vec_col, search_ds=sub)


def cluster_outliers(ds, centroids: np.ndarray, *, id_col: str = "vec_id",
                     vec_col: str = "embedding", concurrency=None):
    """Per-cluster outlier audit: for every IVF cell, the member FARTHEST
    from its centroid — the embedding-QA surface that flags mislabeled /
    garbage vectors cluster by cluster.  Assignment is the shared
    argmax-cosine law (ivf_partition / cluster_stats); the distance is
    the exact int8-grid L2 ``Σ(v_code − c_code)²`` (both sides quantized
    with the floor(x·127+0.5) law), so the reported distance itself is
    hash-comparable.  Ties → lowest vec_id.

    Output: ``(cluster, vec_id, dist)`` — one row per non-empty cell.

    Scale shape: map-only assign+distance with per-batch per-cluster
    argmax partials (≤ |cells| rows per batch), one tiny per-cluster
    merge.
    """
    import pandas as pd

    import ray

    ccodes = _quantize127(centroids.astype(np.float64)).astype(np.int64)
    bc = ray.put((centroids, ccodes))

    class Local:
        def __init__(self):
            self.cent, self.ccodes = ray.get(bc)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _mat(batch.column(vec_col))
            if not len(m):
                return pa.table({"cluster": pa.array([], pa.int64()),
                                 id_col: pa.array([], pa.int64()),
                                 "dist": pa.array([], pa.int64())})
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            part = (_unit(m) @ self.cent.T).argmax(axis=1)
            v = _quantize127(m).astype(np.int64)
            d = ((v - self.ccodes[part]) ** 2).sum(axis=1)
            g = pd.DataFrame({"cluster": part.astype(np.int64),
                              id_col: ids, "dist": d}) \
                .sort_values(["cluster", "dist", id_col],
                             ascending=[True, False, True],
                             kind="mergesort") \
                .groupby("cluster", sort=False).head(1)
            return pa.Table.from_pandas(g, preserve_index=False)

    def merge(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["dist", id_col], ascending=[False, True],
                          kind="mergesort").head(1)
        return pa.table({
            "cluster": pa.array(g["cluster"].to_numpy(np.int64),
                                pa.int64()),
            id_col: pa.array(g[id_col].to_numpy(np.int64), pa.int64()),
            "dist": pa.array(g["dist"].to_numpy(np.int64), pa.int64()),
        })

    return ds.map_batches(Local, batch_format="pyarrow",
                          concurrency=concurrency or default_pool()) \
        .groupby("cluster").map_groups(merge, batch_format="pandas")
