"""Entity-resolution blocking toolkit over the ``documents`` table —
sorted-neighborhood candidate generation, blocking-scheme quality metrics,
and an edit-distance similarity join within blocks.

These complete the ER blocking surface around the linkage engine (the
reference blocks only by first/last nosuffix token, matcher.py:381-396;
`token_blocking_budget` is the planning pass).  All three laws are exactly
DuckDB-oracled.

Scale design notes
------------------
* **snm_pairs** — the classic Sorted Neighborhood Method: global order by
  (sort key, id), candidate pairs are rows within ``window`` ranks of each
  other.  The global rank is computed WITHOUT a global sort-and-count
  materialization: a tiny per-PREFIX count aggregate (prefixes of the sort
  key partition the key space in lexicographic order) gives driver-side
  offsets, each prefix group ranks locally, and pair formation co-locates
  dense rank chunks with ``window``-row boundary replication — the same
  boundary-replication trick as the rolling windows (CLAUDE.md).  The
  per-prefix group is the skew unit: lengthen ``prefix_len`` to split hot
  prefixes (the count table stays driver-bounded at 37^prefix_len keys).
* **blocking_quality** — pairs completeness / candidate budget of a
  token-blocking scheme against the exact-duplicate truth, computed purely
  from GROUP SIZES (Σ C(n,2) over fingerprint / key / (fingerprint, key)
  groups) — no pair is ever materialized, so it runs at any corpus size.
* **edit_block_pairs** — Levenshtein-≤k join inside first-token blocks with
  a hard block-size cap (the stop-key law: both sides of the oracle drop
  blocks larger than ``max_block``).  Distance runs on the ASCII
  alnum-collapsed prefix so Python codepoint distance == DuckDB's
  byte-based ``levenshtein``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import bucket_hash, pair_bucket

# lowercase + strip non-alnum: the exact_dedup fingerprint collapse law
# (== DuckDB regexp_replace(lower(coalesce(text,'')),'[^a-z0-9]','','g'))
_COLLAPSE_RE = r"[^a-z0-9]"


def _collapse(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    t = pc.fill_null(pc.cast(text, pa.string()), "")
    out = pc.replace_substring_regex(pc.utf8_lower(t), _COLLAPSE_RE, "")
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def _first_token(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """First RE2 ``\\S+`` token of lower(text), '' when none/NULL — the
    token-blocking key (matches ``regexp_extract_all(lower(text),'\\S+')[1]``
    with a coalesce-to-'' on both the NULL-text and no-token cases)."""
    t = pc.fill_null(pc.cast(text, pa.string()), "")
    ft = pc.extract_regex(pc.utf8_lower(t), r"(?P<t>\S+)")
    out = pc.fill_null(pc.struct_field(ft, "t"), "")
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


# ---------------------------------------------------------------------------
# sorted-neighborhood blocking
# ---------------------------------------------------------------------------

def _prefix_offsets(counts) -> dict:
    """(pfx, c) count frame -> {prefix: cumulative offset} in
    lexicographic prefix order (pandas codepoint sort == SQL binary
    collation on the ASCII collapse alphabet).  Empty-safe: an empty
    aggregate loses its columns in to_pandas."""
    if counts.empty:
        return {}
    counts = counts.sort_values("pfx", kind="mergesort")
    offs = np.concatenate([[0], counts["c"].to_numpy(np.int64).cumsum()])
    return dict(zip(counts["pfx"], offs[:-1]))


def _multi_pass_offsets(docs_ds, *, key_len: int, prefix_len: int,
                        text_col: str):
    """One corpus scan → per-prefix count tables for BOTH the forward and
    the reversed collapse keys (tagged ``rev`` ∈ {0,1}), split into the
    two {prefix: offset} dicts — snm_multi_pairs pays one read for its
    two pass-1s instead of two.  Driver state stays ≤ 2·37^prefix_len."""
    from ray.data.aggregate import Sum

    def pfx_part(t: pa.Table) -> pa.Table:
        base = _collapse(t.column(text_col))
        out = []
        for rev in (0, 1):
            b = pc.utf8_reverse(base) if rev else base
            key = pc.utf8_slice_codeunits(b, 0, key_len)
            pfx = pc.utf8_slice_codeunits(key, 0, prefix_len)
            vc = pfx.value_counts()
            out.append(pa.table({
                "rev": pa.array(np.full(len(vc), rev, np.int64)),
                "pfx": vc.field("values"),
                "c": pc.cast(vc.field("counts"), pa.int64())}))
        return pa.concat_tables(out)

    counts = docs_ds.map_batches(pfx_part, batch_format="pyarrow") \
        .groupby(["rev", "pfx"]).aggregate(Sum("c", alias_name="c")) \
        .to_pandas()
    if counts.empty:
        return {}, {}
    return (_prefix_offsets(counts.loc[counts["rev"] == 0,
                                       ["pfx", "c"]]),
            _prefix_offsets(counts.loc[counts["rev"] == 1,
                                       ["pfx", "c"]]))


def _snm_ranked_chunks(docs_ds, *, window: int, key_len: int,
                       prefix_len: int, chunk: int, text_col: str,
                       id_col: str, payload_fn=None,
                       reverse_key: bool = False, offsets=None):
    """Shared SNM rank machinery (passes 1-3 of the snm_pairs docstring):
    global rank by (key, id) via per-prefix offsets, then dense rank
    chunks with each chunk's first ``window`` rows replicated into the
    PREVIOUS bucket (non-primary) so boundary pairs form locally.
    Returns a dataset with (doc_id, rn, _cb, _pri [, pl]); ``payload_fn``
    optionally attaches a per-row string payload column ``pl`` (e.g. the
    fingerprint, for snm_recall) that rides through rank and chunk.
    ``offsets`` (a {prefix: cumulative-offset} dict) skips pass 1 —
    snm_multi_pairs aggregates BOTH passes' count tables in one scan.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    if window >= chunk:
        raise ValueError("window must be < chunk")
    with_pl = payload_fn is not None

    def keyed(batch: pa.Table) -> pa.Table:
        base = _collapse(batch.column(text_col))
        if reverse_key:
            base = pc.utf8_reverse(base)
        key = pc.utf8_slice_codeunits(base, 0, key_len)
        cols = {
            "doc_id": batch.column(id_col),
            "key": key,
            "pfx": pc.utf8_slice_codeunits(key, 0, prefix_len),
        }
        if with_pl:
            cols["pl"] = payload_fn(batch)
        return pa.table(cols)

    keyed_ds = docs_ds.map_batches(keyed, batch_format="pyarrow")

    # pass 1: per-prefix counts -> lexicographic cumulative offsets.
    # |prefixes| <= 37^prefix_len (a CONSTANT), so the driver collect is
    # bounded regardless of corpus size.
    def pfx_part(t: pa.Table) -> pa.Table:
        vc = t.column("pfx").combine_chunks().value_counts()
        return pa.table({"pfx": vc.field("values"),
                         "c": pc.cast(vc.field("counts"), pa.int64())})

    if offsets is not None:
        offset_of = offsets
    else:
        counts = keyed_ds.map_batches(pfx_part, batch_format="pyarrow") \
            .groupby("pfx").aggregate(Sum("c", alias_name="c")).to_pandas()
        offset_of = _prefix_offsets(counts)

    # pass 2: rank within each prefix group (one task per prefix — the
    # documented skew unit), local order (key, id) + the prefix offset.
    def rank_group(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            cols = {"doc_id": pa.array([], pa.int64()),
                    "rn": pa.array([], pa.int64())}
            if with_pl:
                cols["pl"] = pa.array([], pa.string())
            return pa.table(cols)
        g = g.sort_values(["key", "doc_id"], kind="mergesort")
        base = offset_of[g["pfx"].iloc[0]]
        rn = np.arange(1, len(g) + 1, dtype=np.int64) + base
        cols = {
            "doc_id": pa.array(g["doc_id"].to_numpy(np.int64), pa.int64()),
            "rn": pa.array(rn, pa.int64()),
        }
        if with_pl:
            cols["pl"] = pa.array(g["pl"], pa.string())
        return pa.table(cols)

    ranked = keyed_ds.groupby("pfx").map_groups(
        rank_group, batch_format="pandas")

    # pass 3: dense rank chunks with backward boundary replication — a
    # primary near a chunk's END needs the next chunk's first ``window``
    # rows as right partners, so rows at a chunk START are REPLICATED
    # into the PREVIOUS bucket (non-primary).
    def to_chunks(t: pa.Table) -> pa.Table:
        rn = t.column("rn").to_numpy(zero_copy_only=False)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        cb = rn // chunk
        rep = ((rn % chunk) < window) & (rn >= chunk)
        is_primary = np.concatenate(
            [np.ones(len(rn), bool), np.zeros(int(rep.sum()), bool)])
        cols = {
            "doc_id": pa.array(np.concatenate([ids, ids[rep]]), pa.int64()),
            "rn": pa.array(np.concatenate([rn, rn[rep]]), pa.int64()),
            "_cb": pa.array(np.concatenate([cb, cb[rep] - 1]), pa.int64()),
            "_pri": pa.array(is_primary, pa.bool_()),
        }
        if with_pl:
            pl = t.column("pl").combine_chunks()
            cols["pl"] = pa.concat_arrays(
                [pl, pl.take(pa.array(np.flatnonzero(rep), pa.int64()))])
        return pa.table(cols)

    return ranked.map_batches(to_chunks, batch_format="pyarrow")


def snm_pairs(docs_ds, *, window: int = 3, key_len: int = 16,
              prefix_len: int = 2, chunk: int = 4096,
              text_col: str = "text", id_col: str = "doc_id",
              reverse_key: bool = False, offsets=None):
    """Sorted Neighborhood Method candidate pairs: rows ordered globally by
    ``(key, id)`` where ``key`` is the first ``key_len`` chars of the
    alnum-collapsed lowercase text; every pair within ``window`` ranks is a
    candidate.  Output ``(id_a, id_b, gap)`` with ``gap`` = rank distance
    (1..window); ``id_a`` is the lower-ranked row.

    Law shared with the SQL oracle: rank = ROW_NUMBER() OVER (ORDER BY key,
    id) — ties on key break by id, so the order (and the pair set) is
    deterministic.  NULL text collapses to ''.

    Scale shape: pass 1 aggregates per-PREFIX counts (≤ 37^prefix_len rows
    — driver-bounded constants, NOT data-bounded) into cumulative offsets;
    pass 2 ranks each prefix group locally (+offset) — prefix groups
    partition the sorted key space contiguously, so local rank + offset IS
    the global rank; pass 3 re-buckets by dense rank chunk (each chunk's
    first ``window`` rows replicated into the previous bucket so boundary
    pairs form locally), and pairs form positionally inside each chunk.
    The keyed projection is deliberately recomputed for pass 2 rather
    than materialized — re-reading a 3-column projection streams, while
    pinning a corpus-sized intermediate in the object store does not.
    No stage materializes the corpus on the driver; the skew unit is one
    prefix group (raise ``prefix_len`` to split hot prefixes).
    """
    import pandas as pd

    chunks = _snm_ranked_chunks(docs_ds, window=window, key_len=key_len,
                                prefix_len=prefix_len, chunk=chunk,
                                text_col=text_col, id_col=id_col,
                                reverse_key=reverse_key, offsets=offsets)

    def pair_chunk(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "gap": pa.array([], pa.int64())})
        g = g.sort_values("rn", kind="mergesort")
        rn = g["rn"].to_numpy(np.int64)
        ids = g["doc_id"].to_numpy(np.int64)
        pri = g["_pri"].to_numpy(bool)
        prn, pids = rn[pri], ids[pri]
        # ranks are unique and dense: the partner of rank r at gap d is
        # rank r+d — one searchsorted per gap, no row loop.
        ia, ib, gp = [], [], []
        for d in range(1, window + 1):
            j = np.searchsorted(rn, prn + d)
            ok = j < len(rn)
            ok[ok] = rn[j[ok]] == prn[ok] + d
            ia.append(pids[ok]); ib.append(ids[j[ok]])
            gp.append(np.full(int(ok.sum()), d, np.int64))
        return pa.table({
            "id_a": pa.array(np.concatenate(ia), pa.int64()),
            "id_b": pa.array(np.concatenate(ib), pa.int64()),
            "gap": pa.array(np.concatenate(gp), pa.int64())})

    return chunks.groupby("_cb").map_groups(pair_chunk,
                                            batch_format="pandas")


def snm_multi_pairs(docs_ds, *, window: int = 3, key_len: int = 16,
                    prefix_len: int = 2, chunk: int = 4096,
                    n_buckets: int = 128, text_col: str = "text",
                    id_col: str = "doc_id"):
    """Multi-pass SNM — the standard fix for single-key SNM's blind spot
    (an error in the key's first characters teleports a record across the
    sort order): one pass sorts on the collapse-prefix key, a second on
    the REVERSED collapse, and the candidate set is the union.  Output
    ``(id_a, id_b, n_passes)`` with ``id_a < id_b`` and ``n_passes`` ∈
    {1, 2} — pairs found by both passes are the strongest candidates.

    Scale shape: both passes' pass-1 prefix counts come from ONE corpus
    scan (_multi_pass_offsets; driver state still bounded by the prefix
    constant); pairs are normalized to
    unordered form per batch, the union is REPARTITIONED before grouping
    (union sums block counts — the iterative-loop lesson), and the
    per-pair combine runs in coarse hash buckets, never per-pair groups.
    """
    import pandas as pd

    common = dict(window=window, key_len=key_len, prefix_len=prefix_len,
                  chunk=chunk, text_col=text_col, id_col=id_col)
    off_fwd, off_rev = _multi_pass_offsets(
        docs_ds, key_len=key_len, prefix_len=prefix_len, text_col=text_col)
    p1 = snm_pairs(docs_ds, **common, offsets=off_fwd)
    p2 = snm_pairs(docs_ds, **common, reverse_key=True, offsets=off_rev)

    def norm(t: pa.Table) -> pa.Table:
        a, b = t.column("id_a"), t.column("id_b")
        lo = pc.min_element_wise(a, b)
        hi = pc.max_element_wise(a, b)
        la = lo.to_numpy(zero_copy_only=False)
        hb = hi.to_numpy(zero_copy_only=False)
        pb = pair_bucket(la, hb, n_buckets)
        return pa.table({"id_a": pc.cast(lo, pa.int64()),
                         "id_b": pc.cast(hi, pa.int64()),
                         "_pb": pa.array(pb, pa.int64())})

    def combine(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "n_passes": pa.array([], pa.int64())})
        agg = g.groupby(["id_a", "id_b"], as_index=False).size()
        return pa.table({
            "id_a": pa.array(agg["id_a"].to_numpy(np.int64), pa.int64()),
            "id_b": pa.array(agg["id_b"].to_numpy(np.int64), pa.int64()),
            "n_passes": pa.array(agg["size"].to_numpy(np.int64),
                                 pa.int64()),
        })

    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    u = p1.map_batches(norm, batch_format="pyarrow") \
        .union(p2.map_batches(norm, batch_format="pyarrow")) \
        .repartition(max(16, 2 * ncpu))
    return u.groupby("_pb").map_groups(combine, batch_format="pandas")


def snm_recall(docs_ds, *, window: int = 3, key_len: int = 16,
               prefix_len: int = 2, chunk: int = 4096,
               text_col: str = "text", id_col: str = "doc_id"):
    """SNM blocking evaluation against the exact-duplicate truth: one row
    ``(n_true_pairs, n_cand, n_hit, recall_bp)`` where ``n_cand`` is the
    number of SNM window candidates (snm_pairs' law, same parameters),
    ``n_hit`` counts candidates whose two docs share a fingerprint, and
    ``recall_bp = n_hit · 10⁴ // n_true_pairs`` (10000 when there are no
    true pairs) — the pairs-completeness of sorted-neighborhood blocking,
    the companion to blocking_quality's token-blocking metric.

    Scale shape: the fingerprint rides through the SNM rank machinery as
    a payload column, so hits are counted INSIDE the rank chunks (no pair
    table is ever joined back to fingerprints); the truth denominator is
    the blocking_quality group-size law; three scalars reach the driver.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    from .textstats import fingerprint_batch

    def fp_payload(batch: pa.Table) -> pa.Array:
        col = fingerprint_batch(batch, text_col=text_col, id_col=id_col) \
            .column("fingerprint")
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col

    chunks = _snm_ranked_chunks(docs_ds, window=window, key_len=key_len,
                                prefix_len=prefix_len, chunk=chunk,
                                text_col=text_col, id_col=id_col,
                                payload_fn=fp_payload)

    def hit_chunk(g: pd.DataFrame) -> pa.Table:
        cand = hit = 0
        if len(g):
            g = g.sort_values("rn", kind="mergesort")
            rn = g["rn"].to_numpy(np.int64)
            fp = g["pl"].to_numpy()
            pri = g["_pri"].to_numpy(bool)
            prn = rn[pri]
            pfp = fp[pri]
            for d in range(1, window + 1):
                j = np.searchsorted(rn, prn + d)
                ok = j < len(rn)
                ok[ok] = rn[j[ok]] == prn[ok] + d
                cand += int(ok.sum())
                hit += int((pfp[ok] == fp[j[ok]]).sum())
        return pa.table({"_one": pa.array([0], pa.int64()),
                         "n_cand": pa.array([cand], pa.int64()),
                         "n_hit": pa.array([hit], pa.int64())})

    cand_hits = chunks.groupby("_cb").map_groups(
        hit_chunk, batch_format="pandas") \
        .groupby("_one").aggregate(Sum("n_cand", alias_name="n_cand"),
                                   Sum("n_hit", alias_name="n_hit")) \
        .to_pandas()

    # truth denominator: sum C(n,2) over fingerprint groups (the
    # blocking_quality law — per-batch fp counts, one narrow shuffle)
    def fp_part(batch: pa.Table) -> pa.Table:
        fp = fingerprint_batch(batch, text_col=text_col, id_col=id_col) \
            .column("fingerprint").combine_chunks()
        vc = fp.value_counts()
        return pa.table({"fp": vc.field("values"),
                         "c": pc.cast(vc.field("counts"), pa.int64())})

    def pair_part(df: pd.DataFrame) -> pa.Table:
        c = df["c"].to_numpy(np.int64)
        return pa.table({"_one": pa.array([0], pa.int64()),
                         "n_true_pairs": pa.array(
                             [int((c * (c - 1) // 2).sum())], pa.int64())})

    truth = docs_ds.map_batches(fp_part, batch_format="pyarrow") \
        .groupby("fp").aggregate(Sum("c", alias_name="c")) \
        .map_batches(pair_part, batch_format="pandas") \
        .groupby("_one").aggregate(
            Sum("n_true_pairs", alias_name="n_true_pairs")).to_pandas()

    n_true = int(truth["n_true_pairs"].iloc[0]) if len(truth) else 0
    n_cand = int(cand_hits["n_cand"].iloc[0]) if len(cand_hits) else 0
    n_hit = int(cand_hits["n_hit"].iloc[0]) if len(cand_hits) else 0
    recall_bp = 10_000 if n_true == 0 else n_hit * 10_000 // n_true

    import ray.data as rd

    return rd.from_arrow(pa.table({
        "n_true_pairs": pa.array([n_true], pa.int64()),
        "n_cand": pa.array([n_cand], pa.int64()),
        "n_hit": pa.array([n_hit], pa.int64()),
        "recall_bp": pa.array([recall_bp], pa.int64()),
    }))


# ---------------------------------------------------------------------------
# blocking-scheme quality vs exact-duplicate truth
# ---------------------------------------------------------------------------

def _fp_key_part(batch: pa.Table, *, text_col: str,
                 id_col: str) -> pa.Table:
    """Per-batch (fingerprint, first-token key) count partial — the
    shared input of :func:`blocking_quality` and
    :func:`blocking_budget_sweep` (one definition so the truth and key
    laws can never drift between the metric and its sweep)."""
    import pandas as pd

    from .textstats import fingerprint_batch

    fp = fingerprint_batch(batch, text_col=text_col, id_col=id_col) \
        .column("fingerprint")
    key = _first_token(batch.column(text_col))
    df = pd.DataFrame({"fp": fp.to_numpy(zero_copy_only=False),
                       "key": key.to_numpy(zero_copy_only=False)})
    g = df.groupby(["fp", "key"], as_index=False).size()
    return pa.table({
        "fp": pa.array(g["fp"], pa.string()),
        "key": pa.array(g["key"], pa.string()),
        "c": pa.array(g["size"].to_numpy(np.int64), pa.int64()),
    })


def blocking_quality(docs_ds, *, text_col: str = "text",
                     id_col: str = "doc_id", n_buckets: int = 64):
    """Quality metrics of the first-token blocking scheme against the
    exact-duplicate truth (same fingerprint == true match): one row
    ``(n_docs, n_keyed, n_true_pairs, n_cand_pairs, n_true_cand, pc_bp)``
    where ``pc_bp`` is pairs completeness in basis points
    (floor(true∩cand · 10⁴ / true), 10000 when there are no true pairs).

    Law: fingerprint = exact_dedup's md5-of-collapse; block key = first
    ``\\S+`` token of lower(text) ('' when none — such docs join NO block,
    so their pairs never count as candidates).

    Scale shape: every metric is a sum of C(n,2) over GROUP SIZES — one
    (fingerprint, key) count shuffle (per-batch combiner first), the three
    marginals derive from that count table with two more tiny shuffles,
    and only six scalars ever reach the final single-row group.  No pair
    is materialized at any point.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    from .textstats import fingerprint_batch

    fk = docs_ds.map_batches(
        lambda b: _fp_key_part(b, text_col=text_col, id_col=id_col),
        batch_format="pyarrow") \
        .groupby(["fp", "key"]).aggregate(Sum("c", alias_name="c"))

    # scalar partials from the (fp, key, c) table: per-fp and per-key group
    # sizes need one more tiny shuffle each (the count table is O(distinct),
    # its per-batch partial combiners keep the shuffles narrow).
    def truecand_part(df: pd.DataFrame) -> pa.Table:
        c = df["c"].to_numpy(np.int64)
        keyed = df["key"].to_numpy() != ""
        return pa.table({
            "_one": pa.array([0], pa.int64()),
            "n_docs": pa.array([int(c.sum())], pa.int64()),
            "n_keyed": pa.array([int(c[keyed].sum())], pa.int64()),
            "n_true_cand": pa.array(
                [int((c[keyed] * (c[keyed] - 1) // 2).sum())], pa.int64()),
        })

    scal_tc = fk.map_batches(truecand_part, batch_format="pandas") \
        .groupby("_one").aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_keyed", alias_name="n_keyed"),
            Sum("n_true_cand", alias_name="n_true_cand"))

    def _pair_sum(ds, group_col: str, out: str, *, keyed_only: bool):
        def margin(df: pd.DataFrame) -> pa.Table:
            if keyed_only:
                df = df[df["key"] != ""]
            g = df.groupby(group_col, as_index=False)["c"].sum()
            return pa.table({
                group_col: pa.array(g[group_col], pa.string()),
                "c": pa.array(g["c"].to_numpy(np.int64), pa.int64()),
            })

        def pairs(df: pd.DataFrame) -> pa.Table:
            c = df["c"].to_numpy(np.int64)
            return pa.table({
                "_one": pa.array([0], pa.int64()),
                out: pa.array([int((c * (c - 1) // 2).sum())], pa.int64()),
            })

        return ds.map_batches(margin, batch_format="pandas") \
            .groupby(group_col).aggregate(Sum("c", alias_name="c")) \
            .map_batches(pairs, batch_format="pandas") \
            .groupby("_one").aggregate(Sum(out, alias_name=out))

    true_pairs = _pair_sum(fk, "fp", "n_true_pairs", keyed_only=False)
    cand_pairs = _pair_sum(fk, "key", "n_cand_pairs", keyed_only=True)

    def final(dfs: list[pd.DataFrame]) -> pa.Table:
        tc, tp, cp = dfs
        if not len(tc):
            # degenerate empty corpus: the oracle's scalar CTEs still emit
            # ONE row — zero counts, NULL n_true_pairs/pc_bp (SUM over an
            # empty group is NULL in SQL; conversion_time precedent).
            return pa.table({
                "n_docs": pa.array([0], pa.int64()),
                "n_keyed": pa.array([0], pa.int64()),
                "n_true_pairs": pa.array([None], pa.int64()),
                "n_cand_pairs": pa.array([0], pa.int64()),
                "n_true_cand": pa.array([0], pa.int64()),
                "pc_bp": pa.array([None], pa.int64()),
            })
        n_true = int(tp["n_true_pairs"].iloc[0]) if len(tp) else 0
        n_tc = int(tc["n_true_cand"].iloc[0])
        pc_bp = 10_000 if n_true == 0 else n_tc * 10_000 // n_true
        return pa.table({
            "n_docs": pa.array([int(tc["n_docs"].iloc[0])], pa.int64()),
            "n_keyed": pa.array([int(tc["n_keyed"].iloc[0])], pa.int64()),
            "n_true_pairs": pa.array([n_true], pa.int64()),
            "n_cand_pairs": pa.array(
                [int(cp["n_cand_pairs"].iloc[0]) if len(cp) else 0],
                pa.int64()),
            "n_true_cand": pa.array([n_tc], pa.int64()),
            "pc_bp": pa.array([pc_bp], pa.int64()),
        })

    # three single-row aggregates -> one output row (bounded driver work)
    import ray.data as rd

    dfs = [scal_tc.to_pandas(), true_pairs.to_pandas(),
           cand_pairs.to_pandas()]
    return rd.from_arrow(final(dfs))


# ---------------------------------------------------------------------------
# canopy clustering (cheap-distance pre-grouping)
# ---------------------------------------------------------------------------

def canopy_assign(docs_ds, *, n: int = 3, t1: int = 3, max_df: int = 100,
                  n_buckets: int = 128, text_col: str = "text",
                  id_col: str = "doc_id"):
    """Canopy clustering (McCallum, Nigam & Ungar 2000) with a
    DETERMINISTIC center law replacing the paper's arrival-order greedy
    pick: the cheap distance is shared word n-gram shingles (df-capped,
    the ngram_jaccard candidate law), ``ov(a,b) >= t1`` means "within
    the loose threshold", and

    * ``centers`` = docs with NO lower-id doc within t1 (so no two
      centers are within t1 of each other — the canopy invariant);
    * every doc is assigned ``canopy_id`` = the LOWEST center within
      t1 of it, or itself when none covers it (centers cover
      themselves; a non-center whose neighbors are all non-centers
      becomes its own degenerate canopy).

    Output: (doc_id, canopy_id) — the cheap pre-grouping that an
    expensive pairwise matcher then runs inside.

    Scale shape: overlap pairs reuse the full ngram_jaccard machinery
    (stop-shingle df cap bounds per-shingle fan-out; tau 0 keeps every
    co-occurring pair, then the t1 floor filters); centers come from
    ONE bucketed anti-join (docs minus distinct right-side ids — the
    "has a lower neighbor" set); cover assignment is a semi-join on
    the center set plus a bucketed min-combine; a final left join
    fills orphans with their own id.  Nothing reaches the driver.
    """
    import pandas as pd

    from .dedup import ngram_jaccard_pairs
    from .joins import bucket_hash_join
    from ..util import bucket_hash

    pairs = ngram_jaccard_pairs(docs_ds, n=n, tau100=0, max_df=max_df,
                                text_col=text_col, id_col=id_col)

    def floor_filter(t: pa.Table) -> pa.Table:
        keep = pc.greater_equal(t.column("inter"), t1)
        out = t.filter(keep)
        return pa.table({"left_id": out.column("left_id"),
                         "right_id": out.column("right_id")})

    p = pairs.map_batches(floor_filter, batch_format="pyarrow")

    ids = docs_ds.map_batches(
        lambda t: pa.table({id_col: pc.cast(t.column(id_col), pa.int64())}),
        batch_format="pyarrow")

    # centers: docs with no lower-id neighbor == docs never on the
    # RIGHT of an ordered pair (anti-join against distinct right ids).
    rights = p.map_batches(
        lambda t: pa.table({id_col: t.column("right_id")}),
        batch_format="pyarrow")
    centers = bucket_hash_join(
        ids, rights, on=id_col, how="anti", n_buckets=n_buckets,
        left_types={id_col: pa.int64()}, right_types={id_col: pa.int64()})

    # cover edges (d, c) in both orientations; keep only center c.
    def orient(t: pa.Table) -> pa.Table:
        l, r = t.column("left_id"), t.column("right_id")
        return pa.table({
            "d": pa.concat_arrays([r.combine_chunks(), l.combine_chunks()]),
            "c": pa.concat_arrays([l.combine_chunks(), r.combine_chunks()]),
        })

    cover = p.map_batches(orient, batch_format="pyarrow")         .map_batches(lambda t: t.rename_columns(["d", id_col]),
                     batch_format="pyarrow")
    cover = bucket_hash_join(
        cover, centers.map_batches(
            lambda t: pa.table({id_col: t.column(id_col)}),
            batch_format="pyarrow"),
        on=id_col, how="semi", n_buckets=n_buckets,
        left_types={"d": pa.int64(), id_col: pa.int64()},
        right_types={id_col: pa.int64()})

    # min covering center per doc, bucketed (never per-doc groups).
    def tag_d(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(_b=bucket_hash(df["d"], n_buckets))

    def min_center(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return pa.table({"d": pa.array([], pa.int64()),
                             "canopy_id": pa.array([], pa.int64())})
        m = g.groupby("d", as_index=False)[id_col].min()
        return pa.table({
            "d": pa.array(m["d"].to_numpy(np.int64), pa.int64()),
            "canopy_id": pa.array(m[id_col].to_numpy(np.int64), pa.int64()),
        })

    assigned = cover.map_batches(tag_d, batch_format="pandas")         .groupby("_b").map_groups(min_center, batch_format="pandas")         .map_batches(lambda t: t.rename_columns([id_col, "canopy_id"]),
                     batch_format="pyarrow")

    out = bucket_hash_join(
        ids, assigned, on=id_col, how="left", n_buckets=n_buckets,
        left_types={id_col: pa.int64()},
        right_types={id_col: pa.int64(), "canopy_id": pa.int64()})

    def fill_self(t: pa.Table) -> pa.Table:
        cid = pc.coalesce(pc.cast(t.column("canopy_id"), pa.int64()),
                          pc.cast(t.column(id_col), pa.int64()))
        return pa.table({id_col: t.column(id_col), "canopy_id": cid})

    return out.map_batches(fill_self, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# pairwise clustering evaluation (precision / recall / F1 vs exact truth)
# ---------------------------------------------------------------------------

def _cluster_fp_cells(cc_ds, docs_ds, *, id_col: str,
                      cluster_col: str, text_col: str, n_buckets: int,
                      cc_types: dict | None):
    """(cluster, fingerprint, count) cell table — the shared input of
    :func:`cluster_pair_eval` (pairwise P/R/F1) and
    :func:`cluster_bcubed` (B³): ONE bucket join attaches fingerprints
    to cluster labels, then per-batch cell partials aggregate in one
    narrow shuffle."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from .joins import bucket_hash_join
    from .textstats import fingerprint_batch

    fp_ds = docs_ds.map_batches(
        lambda b: fingerprint_batch(b, text_col=text_col, id_col=id_col),
        batch_format="pyarrow")

    if cc_types is None:
        cc_types = {id_col: pa.int64(), cluster_col: pa.int64()}
    j = bucket_hash_join(cc_ds, fp_ds, on=id_col, n_buckets=n_buckets,
                         left_types=cc_types,
                         right_types={id_col: pa.int64(),
                                      "fingerprint": pa.string()})

    def cf_part(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return pa.table({cluster_col: pa.array([], pa.int64()),
                             "fingerprint": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        g = df.groupby([cluster_col, "fingerprint"], as_index=False).size()
        return pa.table({
            cluster_col: pa.array(g[cluster_col].to_numpy(np.int64),
                                  pa.int64()),
            "fingerprint": pa.array(g["fingerprint"], pa.string()),
            "c": pa.array(g["size"].to_numpy(np.int64), pa.int64()),
        })

    return j.map_batches(cf_part, batch_format="pandas") \
        .groupby([cluster_col, "fingerprint"]) \
        .aggregate(Sum("c", alias_name="c"))


def _pair_count_scalars(cc_ds, docs_ds, *, id_col: str, cluster_col: str,
                        text_col: str, n_buckets: int,
                        cc_types: dict | None):
    """The pair-counting decomposition scalars shared by
    :func:`cluster_pair_eval` (P/R/F1) and :func:`cluster_ari`:
    ``(n_docs, n_tp, n_pred_pairs, n_true_pairs)`` from ONE
    (cluster, fp) cell table — or ``None`` on an empty corpus."""
    import pandas as pd
    from ray.data.aggregate import Sum

    cf = _cluster_fp_cells(cc_ds, docs_ds, id_col=id_col,
                           cluster_col=cluster_col, text_col=text_col,
                           n_buckets=n_buckets, cc_types=cc_types)

    # tp + doc count straight off the (cluster, fp) cells; the two
    # margins need one more narrow shuffle each over the count table.
    def tp_part(df: pd.DataFrame) -> pa.Table:
        c = df["c"].to_numpy(np.int64) if len(df) else np.array([], np.int64)
        return pa.table({
            "_one": pa.array([0], pa.int64()),
            "n_docs": pa.array([int(c.sum())], pa.int64()),
            "n_tp": pa.array([int((c * (c - 1) // 2).sum())], pa.int64()),
        })

    scal_tp = cf.map_batches(tp_part, batch_format="pandas") \
        .groupby("_one").aggregate(Sum("n_docs", alias_name="n_docs"),
                                   Sum("n_tp", alias_name="n_tp"))

    def _margin_pairs(group_col: str, out: str):
        def margin(df: pd.DataFrame) -> pa.Table:
            if not len(df):
                return pa.table({group_col: pa.array([], pa.int64()
                                 if group_col == cluster_col
                                 else pa.string()),
                                 "c": pa.array([], pa.int64())})
            g = df.groupby(group_col, as_index=False)["c"].sum()
            return pa.table({
                group_col: pa.array(g[group_col]),
                "c": pa.array(g["c"].to_numpy(np.int64), pa.int64()),
            })

        def pairs(df: pd.DataFrame) -> pa.Table:
            c = df["c"].to_numpy(np.int64) if len(df) \
                else np.array([], np.int64)
            return pa.table({
                "_one": pa.array([0], pa.int64()),
                out: pa.array([int((c * (c - 1) // 2).sum())], pa.int64()),
            })

        return cf.map_batches(margin, batch_format="pandas") \
            .groupby(group_col).aggregate(Sum("c", alias_name="c")) \
            .map_batches(pairs, batch_format="pandas") \
            .groupby("_one").aggregate(Sum(out, alias_name=out))

    pred = _margin_pairs(cluster_col, "n_pred_pairs")
    tru = _margin_pairs("fingerprint", "n_true_pairs")

    tp_df, pred_df, tru_df = (scal_tp.to_pandas(), pred.to_pandas(),
                              tru.to_pandas())
    if not len(tp_df):
        return None
    return (int(tp_df["n_docs"].iloc[0]), int(tp_df["n_tp"].iloc[0]),
            int(pred_df["n_pred_pairs"].iloc[0]) if len(pred_df) else 0,
            int(tru_df["n_true_pairs"].iloc[0]) if len(tru_df) else 0)


def cluster_ari(cc_ds, docs_ds, *, id_col: str = "doc_id",
                cluster_col: str = "cluster_id", text_col: str = "text",
                n_buckets: int = 128, cc_types: dict | None = None):
    """Adjusted Rand Index of an entity clustering against the exact-dup
    fingerprint truth (Hubert & Arabie 1985) — the chance-corrected
    third metric beside pairwise F1 and B³: with ``T = C(n,2)``,
    ``index = Σ C(n_ij,2)`` over (cluster, fp) cells, ``a/b`` the margin
    pair sums, ARI = (index − a·b/T) / ((a+b)/2 − a·b/T), emitted in
    truncated basis points (exact integer arithmetic, DuckDB ``//``
    truncation law — Python floor would differ on negative ARIs).
    Output one row ``(n_docs, n_tp, n_pred_pairs, n_true_pairs,
    total_pairs, ari_bp)``; ``ari_bp`` is NULL when the denominator is
    zero (single-cluster vs single-value degenerate) or the corpus is
    empty.

    Scale shape: identical to cluster_pair_eval — the shared
    ``_pair_count_scalars`` pass (one cell table, two narrow margin
    shuffles, four scalars to the driver); the ARI arithmetic is
    driver-side Python ints (a·b overflows int64 past ~10^9 pairs —
    the SQL twin computes in HUGEINT).
    """
    import ray.data as rd

    scal = _pair_count_scalars(cc_ds, docs_ds, id_col=id_col,
                               cluster_col=cluster_col,
                               text_col=text_col, n_buckets=n_buckets,
                               cc_types=cc_types)
    if scal is None:
        return rd.from_arrow(pa.table({
            "n_docs": pa.array([0], pa.int64()),
            "n_tp": pa.array([None], pa.int64()),
            "n_pred_pairs": pa.array([None], pa.int64()),
            "n_true_pairs": pa.array([None], pa.int64()),
            "total_pairs": pa.array([None], pa.int64()),
            "ari_bp": pa.array([None], pa.int64())}))
    n, tp, p, t = scal
    tt = n * (n - 1) // 2
    num = 2 * (tp * tt - p * t)
    den = tt * (p + t) - 2 * p * t  # = p(T-t) + t(T-p) >= 0 always
    if den == 0:
        ari = None
    else:
        # DuckDB // TRUNCATES toward zero (-7//2 = -3, not Python's -4)
        q = abs(10_000 * num) // den
        ari = int(q if num >= 0 else -q)
    return rd.from_arrow(pa.table({
        "n_docs": pa.array([n], pa.int64()),
        "n_tp": pa.array([tp], pa.int64()),
        "n_pred_pairs": pa.array([p], pa.int64()),
        "n_true_pairs": pa.array([t], pa.int64()),
        "total_pairs": pa.array([tt], pa.int64()),
        "ari_bp": pa.array([ari], pa.int64())}))


def cluster_pair_eval(cc_ds, docs_ds, *, id_col: str = "doc_id",
                      cluster_col: str = "cluster_id",
                      text_col: str = "text", n_buckets: int = 128,
                      cc_types: dict | None = None):
    """Pairwise evaluation of an entity clustering against the exact-dup
    fingerprint truth: ``n_pred_pairs`` = Σ C(n,2) over predicted
    clusters, ``n_true_pairs`` = Σ C(n,2) over fingerprint groups,
    ``n_tp`` = Σ C(n,2) over (cluster, fingerprint) cells — the standard
    pair-counting decomposition (every same-cell pair is a true
    positive).  ``precision_bp = n_tp·10⁴ // n_pred_pairs`` (10000 when
    nothing is predicted), ``recall_bp`` likewise over the truth, and
    ``f1_bp = 2·p·r // (p + r)`` (0 when both are 0).  One row out.
    Completes the eval family: blocking_quality / snm_recall measure
    candidate RECALL of a blocker; this scores the END clustering on
    both axes.

    Scale shape: cluster labels join fingerprints via ONE
    bucket_hash_join on the id (thread ``cc_types`` — the
    Dataset.schema()-executes-AllToAll trap); ONE (cluster, fp) count
    table then serves all three Σ C(n,2) sums (the blocking_quality
    group-size trick — no pair is ever materialized); the two margins
    are narrow count-table shuffles.  Three scalars reach the driver
    (the shared ``_pair_count_scalars`` pass — cluster_ari rides it
    too).
    """
    import ray.data as rd

    scal = _pair_count_scalars(cc_ds, docs_ds, id_col=id_col,
                               cluster_col=cluster_col,
                               text_col=text_col, n_buckets=n_buckets,
                               cc_types=cc_types)
    if scal is None:
        # empty corpus: the oracle's scalar CTEs still emit one row —
        # zero docs, NULL counts/metrics (SUM over empty is SQL NULL).
        return rd.from_arrow(pa.table({
            "n_docs": pa.array([0], pa.int64()),
            "n_pred_pairs": pa.array([None], pa.int64()),
            "n_true_pairs": pa.array([None], pa.int64()),
            "n_tp": pa.array([None], pa.int64()),
            "precision_bp": pa.array([None], pa.int64()),
            "recall_bp": pa.array([None], pa.int64()),
            "f1_bp": pa.array([None], pa.int64()),
        }))
    n_docs, n_tp, n_pred, n_true = scal
    p_bp = 10_000 if n_pred == 0 else n_tp * 10_000 // n_pred
    r_bp = 10_000 if n_true == 0 else n_tp * 10_000 // n_true
    f1_bp = 2 * p_bp * r_bp // (p_bp + r_bp) if p_bp + r_bp > 0 else 0
    return rd.from_arrow(pa.table({
        "n_docs": pa.array([n_docs], pa.int64()),
        "n_pred_pairs": pa.array([n_pred], pa.int64()),
        "n_true_pairs": pa.array([n_true], pa.int64()),
        "n_tp": pa.array([n_tp], pa.int64()),
        "precision_bp": pa.array([p_bp], pa.int64()),
        "recall_bp": pa.array([r_bp], pa.int64()),
        "f1_bp": pa.array([f1_bp], pa.int64()),
    }))



def cluster_split_merge(cc_ds, docs_ds, *, id_col: str = "doc_id",
                        cluster_col: str = "cluster_id",
                        text_col: str = "text", n_buckets: int = 128,
                        cc_types: dict | None = None):
    """Split/merge audit of an entity clustering against the exact-dup
    fingerprint truth — the repair-cost view of cluster quality: how
    many MERGE operations would fix over-splitting (a truth entity
    scattered over k predicted clusters needs k-1 merges) and how many
    SPLIT operations would fix over-merging (a predicted cluster mixing
    k truth entities needs k-1 splits).  Both collapse to cell-table
    identities: with ``n_cells`` distinct (cluster, fingerprint) cells,
    ``n_merges_needed = n_cells - n_fps`` and ``n_splits_needed =
    n_cells - n_clusters``.  Output one row ``(n_docs, n_clusters,
    n_fps, n_cells, n_splits_needed, n_merges_needed)`` — both zero iff
    the clustering equals the truth partition.  Complements the scoring
    evals (pairwise F1 / ARI / B-cubed) with an edit-distance reading.

    Scale shape: the shared ``_cluster_fp_cells`` pass builds the cell
    table (one bucket join + one narrow shuffle); it is materialized
    ONCE (<= n_docs narrow rows) because three consumers read it — the
    scalar partials (n_docs, n_cells) and the two margin distinct
    counts, each a narrow count-table shuffle whose row COUNT is the
    distinct count.  Six scalars reach the driver.
    """
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    cf = _cluster_fp_cells(cc_ds, docs_ds, id_col=id_col,
                           cluster_col=cluster_col, text_col=text_col,
                           n_buckets=n_buckets,
                           cc_types=cc_types).materialize()

    def scal(df: pd.DataFrame) -> pa.Table:
        c = df["c"].to_numpy(np.int64) if len(df) else \
            np.array([], np.int64)
        return pa.table({
            "n_docs": pa.array([int(c.sum())], pa.int64()),
            "n_cells": pa.array([int(len(df))], pa.int64())})

    base = cf.map_batches(scal, batch_format="pandas").to_pandas()
    n_docs = int(base["n_docs"].sum()) if len(base) else 0
    n_cells = int(base["n_cells"].sum()) if len(base) else 0

    # distinct margins: a groupby over the CELL table (narrow), whose
    # group count IS the distinct count — never touches the corpus
    n_clusters = cf.groupby(cluster_col) \
        .aggregate(Sum("c", alias_name="c")).count()
    n_fps = cf.groupby("fingerprint") \
        .aggregate(Sum("c", alias_name="c")).count()

    return rd.from_arrow(pa.table({
        "n_docs": pa.array([n_docs], pa.int64()),
        "n_clusters": pa.array([n_clusters], pa.int64()),
        "n_fps": pa.array([n_fps], pa.int64()),
        "n_cells": pa.array([n_cells], pa.int64()),
        "n_splits_needed": pa.array([n_cells - n_clusters], pa.int64()),
        "n_merges_needed": pa.array([n_cells - n_fps], pa.int64())}))


def cluster_homogeneity(cc_ds, docs_ds, *, id_col: str = "doc_id",
                        cluster_col: str = "cluster_id",
                        text_col: str = "text", n_buckets: int = 128,
                        cc_types: dict | None = None):
    """Homogeneity / completeness of an entity clustering against the
    exact-dup fingerprint truth — the V-measure pair (Rosenberg &
    Hirschberg 2007) under this engine's integer bit-entropy law
    (char_entropy's floored self-information, ``Σ c·(bitlen(n//c)−1)``,
    no float log): ``homogeneity_bp = (H(truth) − H(truth|pred))·10⁴ //
    H(truth)`` (10000 when H(truth)=0 — a single-entity corpus is
    vacuously homogeneous), ``completeness_bp`` symmetric.  One row:
    ``(n_docs, h_truth_bits, h_pred_bits, cond_truth_bits,
    cond_pred_bits, homogeneity_bp, completeness_bp)``.  Completes the
    eval family: pairwise F1 / ARI count pairs, B³ averages records,
    purity takes majorities — this one reads the information.

    Scale shape: the shared ``_cluster_fp_cells`` table is materialized
    once; TWO narrow bucket passes over the CELLS (by cluster hash, by
    fp hash) each fold the margin sizes and the conditional-entropy
    terms in the same in-bucket kernel — margins never leave their
    bucket, and only scalar partials reach the driver.
    """
    import pandas as pd
    import ray.data as rd

    from .textstats import _np_bitlen

    cf = _cluster_fp_cells(cc_ds, docs_ds, id_col=id_col,
                           cluster_col=cluster_col, text_col=text_col,
                           n_buckets=n_buckets,
                           cc_types=cc_types).materialize()

    def nd_part(df: pd.DataFrame) -> pa.Table:
        c = df["c"].to_numpy(np.int64) if len(df) else \
            np.array([], np.int64)
        return pa.table({"n": pa.array([int(c.sum())], pa.int64())})

    ndp = cf.map_batches(nd_part, batch_format="pandas").to_pandas()
    n_docs = int(ndp["n"].sum()) if len(ndp) else 0
    if n_docs == 0:
        return rd.from_arrow(pa.table({
            "n_docs": pa.array([0], pa.int64()),
            "h_truth_bits": pa.array([None], pa.int64()),
            "h_pred_bits": pa.array([None], pa.int64()),
            "cond_truth_bits": pa.array([None], pa.int64()),
            "cond_pred_bits": pa.array([None], pa.int64()),
            "homogeneity_bp": pa.array([None], pa.int64()),
            "completeness_bp": pa.array([None], pa.int64())}))

    def entropy_pass(margin_col: str):
        """(Σ margin·(bitlen(N//margin)−1), Σ c·(bitlen(margin//c)−1))
        folded inside hash(margin_col) buckets."""
        def tag(df: pd.DataFrame) -> pa.Table:
            df = df.assign(_eb=bucket_hash(df[margin_col], n_buckets))
            return pa.Table.from_pandas(df, preserve_index=False)

        def fold(g: pd.DataFrame) -> pa.Table:
            if not len(g):
                return pa.table({"h": pa.array([0], pa.int64()),
                                 "cond": pa.array([0], pa.int64())})
            c = g["c"].to_numpy(np.int64)
            m = g.groupby(margin_col)["c"].transform("sum") \
                .to_numpy(np.int64)
            cond = int((c * (_np_bitlen(m // c) - 1)).sum())
            mg = g.groupby(margin_col, as_index=False)["c"].sum()
            mv = mg["c"].to_numpy(np.int64)
            h = int((mv * (_np_bitlen(n_docs // mv) - 1)).sum())
            return pa.table({"h": pa.array([h], pa.int64()),
                             "cond": pa.array([cond], pa.int64())})

        parts = cf.map_batches(tag, batch_format="pandas") \
            .groupby("_eb").map_groups(fold, batch_format="pandas") \
            .to_pandas()
        return int(parts["h"].sum()), int(parts["cond"].sum())

    h_pred, cond_truth = entropy_pass(cluster_col)
    h_truth, cond_pred = entropy_pass("fingerprint")

    hom = 10_000 if h_truth == 0 else \
        (h_truth - cond_truth) * 10_000 // h_truth
    com = 10_000 if h_pred == 0 else \
        (h_pred - cond_pred) * 10_000 // h_pred
    return rd.from_arrow(pa.table({
        "n_docs": pa.array([n_docs], pa.int64()),
        "h_truth_bits": pa.array([h_truth], pa.int64()),
        "h_pred_bits": pa.array([h_pred], pa.int64()),
        "cond_truth_bits": pa.array([cond_truth], pa.int64()),
        "cond_pred_bits": pa.array([cond_pred], pa.int64()),
        "homogeneity_bp": pa.array([hom], pa.int64()),
        "completeness_bp": pa.array([com], pa.int64())}))


# ---------------------------------------------------------------------------
# cluster survivorship (golden record over ER clusters)
# ---------------------------------------------------------------------------

def cluster_survivorship(cc_ds, attr_ds, *, id_col: str = "doc_id",
                         cluster_col: str = "cluster_id",
                         n_buckets: int = 64, cc_types: dict | None = None):
    """Survivorship over ER clusters — the fusion step after transitive
    closure: one golden row per cluster with ``keep_id`` (longest text,
    ties → lowest id: the dedup_keep_longest rule), modal ``top_lang`` /
    ``top_source`` (count ties → lexicographically smallest, NULL sorting
    last — SQL NULLS LAST), ``keep_len`` and ``n_members``.  Compose with
    ``connected_components`` for the full chain: near-dup pairs →
    closure → golden record.

    Scale shape: labels attach to attributes via ONE bucket_hash_join on
    the id (thread ``cc_types`` so the closure pipeline isn't probed for
    its schema — the Dataset.schema()-executes-AllToAll trap); clusters
    then co-locate in coarse hash buckets where the keep row, both modal
    margins and the member count all derive vectorized from the same
    frame.  Nothing reaches the driver.
    """
    import pandas as pd

    from .joins import bucket_hash_join

    def prep(batch: pa.Table) -> pa.Table:
        ln = pc.utf8_length(pc.fill_null(
            pc.cast(batch.column("text"), pa.string()), ""))
        return pa.table({
            id_col: batch.column(id_col),
            "keep_len": pc.cast(ln, pa.int64()),
            "lang": batch.column("lang"),
            "source": batch.column("source"),
        })

    attrs = attr_ds.map_batches(prep, batch_format="pyarrow")
    joined = bucket_hash_join(
        cc_ds, attrs, on=id_col, how="inner",
        left_types=cc_types or {id_col: pa.int64(),
                                cluster_col: pa.int64()},
        right_types={id_col: pa.int64(), "keep_len": pa.int64(),
                     "lang": pa.string(), "source": pa.string()})

    def tag(df: pd.DataFrame) -> pa.Table:
        return pa.Table.from_pandas(
            df.assign(_cb=bucket_hash(df[cluster_col], n_buckets)),
            preserve_index=False)

    def _modal(g: pd.DataFrame, col: str, out: str) -> pd.DataFrame:
        m = g.groupby([cluster_col, col], dropna=False,
                      as_index=False).size()
        # count ties -> smallest value; NULL sorts last (SQL NULLS LAST)
        m = m.sort_values([cluster_col, "size", col],
                          ascending=[True, False, True],
                          na_position="last", kind="mergesort")
        m = m.drop_duplicates(cluster_col, keep="first")
        return m[[cluster_col, col]].rename(columns={col: out})

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return pa.table({
                "cluster_id": pa.array([], pa.int64()),
                "keep_id": pa.array([], pa.int64()),
                "keep_len": pa.array([], pa.int64()),
                "top_lang": pa.array([], pa.string()),
                "top_source": pa.array([], pa.string()),
                "n_members": pa.array([], pa.int64()),
            })
        k = g.sort_values([cluster_col, "keep_len", id_col],
                          ascending=[True, False, True], kind="mergesort") \
            .drop_duplicates(cluster_col, keep="first")
        n = g.groupby(cluster_col, as_index=False).size() \
            .rename(columns={"size": "n_members"})
        out = k[[cluster_col, id_col, "keep_len"]] \
            .merge(_modal(g, "lang", "top_lang"), on=cluster_col) \
            .merge(_modal(g, "source", "top_source"), on=cluster_col) \
            .merge(n, on=cluster_col)
        return pa.table({
            "cluster_id": pa.array(out[cluster_col].to_numpy(np.int64),
                                   pa.int64()),
            "keep_id": pa.array(out[id_col].to_numpy(np.int64), pa.int64()),
            "keep_len": pa.array(out["keep_len"].to_numpy(np.int64),
                                 pa.int64()),
            "top_lang": pa.array(out["top_lang"], pa.string()),
            "top_source": pa.array(out["top_source"], pa.string()),
            "n_members": pa.array(out["n_members"].to_numpy(np.int64),
                                  pa.int64()),
        })

    return joined.map_batches(tag, batch_format="pandas") \
        .groupby("_cb").map_groups(per_bucket, batch_format="pandas")


# ---------------------------------------------------------------------------
# meta-blocking (weighted edge pruning)
# ---------------------------------------------------------------------------

# shared CBS trigram-block graph build (meta_blocking_pairs /
# meta_blocking_ecbs): distinct (doc, word-trigram) rows -> df-filtered
# blocks -> pre-combined pair weights.  One definition so the block and
# weight laws cannot drift between the CBS and ECBS variants.
def _mb_tok_part(batch: pa.Table, *, text_col: str, id_col: str,
                 n_buckets: int) -> pa.Table:
    import pandas as pd

    from .textstats import _explode_tokens

    doc_idx, flat, _ = _explode_tokens(batch, text_col)
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    # '' drops FIRST so trigram adjacency runs over the real token
    # sequence (the skipgram_counts law)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    idx = np.flatnonzero(keep)
    flat = flat.take(pa.array(idx, pa.int64()))
    di = doc_idx[idx]
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "token": pa.array([], pa.string()),
                      "_tb": pa.array([], pa.int64())})
    if len(di) < 3:
        return empty
    j = np.flatnonzero((di[:-2] == di[1:-1]) & (di[:-2] == di[2:]))
    if not len(j):
        return empty
    g3 = pc.binary_join_element_wise(
        flat.take(pa.array(j, pa.int64())),
        flat.take(pa.array(j + 1, pa.int64())),
        flat.take(pa.array(j + 2, pa.int64())), " ")
    df = pd.DataFrame({"doc_id": ids[di[j]],
                       "token": g3.to_pandas().astype(object)})
    df = df.drop_duplicates()
    t = pa.table({
        "doc_id": pa.array(df["doc_id"].to_numpy(np.int64), pa.int64()),
        "token": pa.array(df["token"], pa.string()),
    })
    return t.append_column(
        "_tb", pa.array(bucket_hash(df["token"], n_buckets), pa.int64()))

def _mb_emit_pairs(g, *, max_df: int, n_buckets: int) -> pa.Table:
    # g arrives as a pandas DataFrame (map_groups batch_format="pandas")
    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "w": pa.array([], pa.int64()),
                      "_pb": pa.array([], pa.int64())})
    if not len(g):
        return empty
    # token groups are whole in this bucket -> in-bucket counts ARE
    # the global document frequencies
    vc = g["token"].value_counts()
    ok = vc[(vc >= 2) & (vc <= max_df)].index
    g = g[g["token"].isin(ok)][["doc_id", "token"]]
    if g.empty:
        return empty
    m = g.merge(g, on="token", suffixes=("_a", "_b"))
    m = m[m["doc_id_a"] < m["doc_id_b"]]
    if m.empty:
        return empty
    agg = m.groupby(["doc_id_a", "doc_id_b"], as_index=False) \
        .agg(w=("token", "size"))
    a = agg["doc_id_a"].to_numpy(np.int64)
    b = agg["doc_id_b"].to_numpy(np.int64)
    pb = pair_bucket(a, b, n_buckets)
    return pa.table({"id_a": pa.array(a, pa.int64()),
                     "id_b": pa.array(b, pa.int64()),
                     "w": pa.array(agg["w"].to_numpy(np.int64),
                                   pa.int64()),
                     "_pb": pa.array(pb, pa.int64())})

def _mb_combine(g) -> pa.Table:
    agg = g.groupby(["id_a", "id_b"], as_index=False)["w"].sum()
    return pa.table({
        "id_a": pa.array(agg["id_a"].to_numpy(np.int64), pa.int64()),
        "id_b": pa.array(agg["id_b"].to_numpy(np.int64), pa.int64()),
        "w": pa.array(agg["w"].to_numpy(np.int64), pa.int64()),
    })



def _cbs_pair_graph(docs_ds, *, max_df: int, n_buckets: int,
                    text_col: str, id_col: str, exploded=None):
    """Trigram-block CBS candidate graph ``(id_a, id_b, w)`` — the shared
    front half of the meta-blocking variants.  Pass ``exploded`` (a
    pre-built _mb_tok_part dataset) when the caller has a second
    consumer of the explode — ECBS materializes it once instead of
    tokenizing the corpus twice."""
    if exploded is None:
        exploded = docs_ds.map_batches(
            lambda b: _mb_tok_part(b, text_col=text_col, id_col=id_col,
                                   n_buckets=n_buckets),
            batch_format="pyarrow")
    return exploded \
        .groupby("_tb").map_groups(
            lambda g: _mb_emit_pairs(g, max_df=max_df,
                                     n_buckets=n_buckets),
            batch_format="pandas") \
        .groupby("_pb").map_groups(_mb_combine, batch_format="pandas")


def block_filtering_pairs(docs_ds, *, ratio_bp: int = 5000,
                          max_df: int = 100, n_buckets: int = 256,
                          text_col: str = "text", id_col: str = "doc_id"):
    """Block filtering (Papadakis et al.) over the trigram block
    collection — the standard meta-blocking PREPROCESSING step: each
    record keeps only its ``ceil(ratio_bp/10⁴ · n)`` most
    discriminative blocks (smallest document frequency, ties by block
    key), and a candidate pair survives only through a block BOTH
    records kept.  Output ``(id_a, id_b, w)`` with ``w`` = number of
    shared kept blocks — the filtered CBS graph the WEP/WNP/CNP pruners
    then weigh.  Blocks with df outside [2, ``max_df``] are purged
    first (the family's stop-block guard), and the keep quota counts
    only surviving blocks.  The quota is the exact integer ceil
    ``rn ≤ (n·ratio_bp + 9999) // 10⁴``.

    Scale shape: three narrow shuffles, none quadratic — (1) trigram
    explode co-locates by TOKEN hash so in-bucket counts are exact
    global df; (2) (doc, block, df) rows co-locate by DOC hash where
    the per-record rank/quota cut is one vectorized sort per bucket;
    (3) kept rows co-locate by TOKEN hash again, where the per-block
    self-merge emits pair partials straight into coarse pair-hash
    groups (the `_mb_combine` reduce).  Block sizes are df ≤ max_df by
    construction, so the stage-3 fan-out is bounded per block.
    """
    import pandas as pd

    exploded = docs_ds.map_batches(
        lambda b: _mb_tok_part(b, text_col=text_col, id_col=id_col,
                               n_buckets=n_buckets),
        batch_format="pyarrow")

    def df_filter(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "token": pa.array([], pa.string()),
                          "df": pa.array([], pa.int64()),
                          "_db": pa.array([], pa.int64())})
        if not len(g):
            return empty
        vc = g["token"].value_counts()
        ok = vc[(vc >= 2) & (vc <= max_df)]
        g = g[g["token"].isin(ok.index)][["doc_id", "token"]]
        if g.empty:
            return empty
        g = g.assign(df=g["token"].map(ok).astype(np.int64))
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy(np.int64), pa.int64()),
            "token": pa.array(g["token"], pa.string()),
            "df": pa.array(g["df"].to_numpy(np.int64), pa.int64()),
            "_db": pa.array(bucket_hash(g["doc_id"], n_buckets),
                            pa.int64())})

    def quota_cut(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "token": pa.array([], pa.string()),
                          "_tb": pa.array([], pa.int64())})
        if not len(g):
            return empty
        g = g.sort_values(["doc_id", "df", "token"], kind="mergesort")
        rn = g.groupby("doc_id", sort=False).cumcount().to_numpy() + 1
        n = g.groupby("doc_id", sort=False)["token"].transform("size")             .to_numpy(np.int64)
        keep = rn * 10_000 <= n * ratio_bp + 9_999
        g = g[keep]
        if g.empty:
            return empty
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy(np.int64), pa.int64()),
            "token": pa.array(g["token"], pa.string()),
            "_tb": pa.array(bucket_hash(g["token"], n_buckets),
                            pa.int64())})

    def emit(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "w": pa.array([], pa.int64()),
                          "_pb": pa.array([], pa.int64())})
        if not len(g):
            return empty
        m = g.merge(g, on="token", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        if m.empty:
            return empty
        agg = m.groupby(["doc_id_a", "doc_id_b"], as_index=False)             .agg(w=("token", "size"))
        a = agg["doc_id_a"].to_numpy(np.int64)
        b = agg["doc_id_b"].to_numpy(np.int64)
        return pa.table({"id_a": pa.array(a, pa.int64()),
                         "id_b": pa.array(b, pa.int64()),
                         "w": pa.array(agg["w"].to_numpy(np.int64),
                                       pa.int64()),
                         "_pb": pa.array(pair_bucket(a, b, n_buckets),
                                         pa.int64())})

    return exploded \
        .groupby("_tb").map_groups(df_filter, batch_format="pandas") \
        .groupby("_db").map_groups(quota_cut, batch_format="pandas") \
        .groupby("_tb").map_groups(emit, batch_format="pandas") \
        .groupby("_pb").map_groups(_mb_combine, batch_format="pandas")


def meta_blocking_pairs(docs_ds, *, max_df: int = 100, n_buckets: int = 256,
                        text_col: str = "text", id_col: str = "doc_id"):
    """Meta-blocking with CBS weights and global mean pruning: every
    distinct word TRIGRAM (three consecutive lowercase tokens) is a
    block; a candidate pair's weight is the number of blocks it co-occurs
    in (Common Blocks Scheme); pairs whose weight is below the mean over
    all candidate pairs are pruned (the standard Weighted Edge Pruning
    rule).  Blocks with document frequency outside [2, ``max_df``] are
    discarded first (singleton blocks pair nothing; stop-shingle blocks
    are the quadratic skew source).  Output ``(id_a, id_b, w)`` — the
    pruned candidate graph that a matcher then scores.  The mean test is
    integer cross-multiplied (``w · n_pairs >= Σw``) so the DuckDB oracle
    matches exactly.  Trigram blocks (not single tokens) because
    single-token blocks on a closed vocabulary are ALL stop blocks — the
    same reason ngram_jaccard shingles.

    Scale shape: trigrams form positionally on the flattened token array
    (one doc-boundary mask, no row loop); distinct (doc, trigram) rows
    are batch-local (docs whole in batch); trigram groups co-locate by
    ``bucket_hash`` so the df filter sees EXACT global frequencies
    in-bucket; per-bucket self-merge pre-combines pair counts before the
    one pair shuffle (coarse pbucket groups); the two pruning scalars
    come from per-batch partials over the weight table — only two numbers
    reach the driver, and the weight table is materialized ONCE for its
    two consumers (scalar pass + filter), the pmi_bigrams pattern.
    """
    weights = _cbs_pair_graph(docs_ds, max_df=max_df, n_buckets=n_buckets,
                              text_col=text_col, id_col=id_col) \
        .materialize()  # two consumers below — don't recompute the graph

    def scal_part(t: pa.Table) -> pa.Table:
        w = t.column("w").to_numpy(zero_copy_only=False)
        return pa.table({"_one": pa.array([0], pa.int64()),
                         "np_": pa.array([len(w)], pa.int64()),
                         "sw": pa.array([int(w.sum())], pa.int64())})

    from ray.data.aggregate import Sum

    sc = weights.map_batches(scal_part, batch_format="pyarrow") \
        .groupby("_one").aggregate(Sum("np_", alias_name="np_"),
                                   Sum("sw", alias_name="sw")).to_pandas()
    n_pairs = int(sc["np_"].iloc[0]) if len(sc) else 0
    sw = int(sc["sw"].iloc[0]) if len(sc) else 0

    def prune(t: pa.Table) -> pa.Table:
        keep = pc.greater_equal(
            pc.multiply(pc.cast(t.column("w"), pa.int64()), n_pairs), sw)
        return t.filter(keep)

    return weights.map_batches(prune, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# edit-distance join within blocks
# ---------------------------------------------------------------------------

def _levenshtein(a: str, b: str, k: int) -> int:
    """Banded Levenshtein with early exit; returns k+1 when distance > k.
    Unit costs == DuckDB ``levenshtein`` (ASCII inputs only — callers feed
    the alnum-collapsed prefix, where bytes == codepoints)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return k + 1
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev = list(range(lb + 1))
    big = k + 1
    for i in range(1, la + 1):
        lo = max(1, i - k)
        hi = min(lb, i + k)
        cur = [big] * (lb + 1)
        cur[0] = i if i <= k else big
        ca = a[i - 1]
        best = big
        for j in range(lo, hi + 1):
            v = min(prev[j] + 1, cur[j - 1] + 1,
                    prev[j - 1] + (ca != b[j - 1]))
            if v > big:
                v = big
            cur[j] = v
            if v < best:
                best = v
        if best >= big:
            return big
        prev = cur
    return min(prev[lb], big)


def _damerau_levenshtein(a: str, b: str, k: int) -> int:
    """TRUE Damerau–Levenshtein (Lowrance–Wagner — transpositions may
    bridge edits: ``CA``→``ABC`` is 2, where OSA says 3); returns k+1
    when the distance exceeds ``k``.  Matches DuckDB
    ``damerau_levenshtein`` on ASCII inputs (byte == codepoint there;
    callers feed the alnum-collapsed prefix).  Strings are short (the
    collapsed prefix), so the full O(|a|·|b|) matrix is fine — the
    banded trick is unsafe here because a transposition reaches back to
    the last occurrence row, which can sit outside the band."""
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return k + 1
    if la == 0:
        return lb
    if lb == 0:
        return la
    inf = la + lb
    h = [[inf] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        h[i + 1][1] = i
    for j in range(lb + 1):
        h[1][j + 1] = j
    da: dict[str, int] = {}
    for i in range(1, la + 1):
        db = 0
        ca = a[i - 1]
        hi, hi1 = h[i + 1], h[i]
        for j in range(1, lb + 1):
            cb = b[j - 1]
            i1 = da.get(cb, 0)
            j1 = db
            if ca == cb:
                cost = 0
                db = j
            else:
                cost = 1
            hi[j + 1] = min(hi1[j] + cost,        # substitute / match
                            hi[j] + 1,            # insert
                            hi1[j + 1] + 1,       # delete
                            h[i1][j1] + (i - i1 - 1) + 1 + (j - j1 - 1))
        da[ca] = i
    d = h[la + 1][lb + 1]
    return d if d <= k else k + 1


def _prefix_block_join(docs_ds, *, dist, out_col: str, k: int,
                       key_chars: int, pfx_chars: int, max_block: int,
                       n_buckets: int, text_col: str, id_col: str):
    """The shared prefix-block edit-join machinery (edit_block_pairs /
    dl_block_pairs): alnum-collapse, first-``key_chars`` exact blocking
    key, stop blocks above ``max_block`` dropped, all-pairs ``dist``
    within a block.  Fork the DISTANCE, never this enumeration."""
    import pandas as pd

    def keyed(batch: pa.Table) -> pa.Table:
        s = pc.utf8_slice_codeunits(_collapse(batch.column(text_col)),
                                    0, pfx_chars)
        key = pc.utf8_slice_codeunits(s, 0, key_chars)
        t = pa.table({"doc_id": batch.column(id_col), "key": key, "s": s})
        t = t.filter(pc.not_equal(t.column("key"), ""))
        return t.append_column(
            "_ub", pa.array(bucket_hash(t.column("key").to_pandas(),
                                        n_buckets), pa.int64()))

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        ia, ib, lv = [], [], []
        if len(g):
            for _, blk in g.groupby("key", sort=False):
                n = len(blk)
                if n < 2 or n > max_block:
                    continue
                blk = blk.sort_values("doc_id", kind="mergesort")
                ids = blk["doc_id"].to_numpy(np.int64)
                ss = blk["s"].tolist()
                for i in range(n - 1):
                    si = ss[i]
                    for j in range(i + 1, n):
                        d = dist(si, ss[j], k)
                        if d <= k:
                            ia.append(ids[i]); ib.append(ids[j])
                            lv.append(d)
        return pa.table({"id_a": pa.array(ia, pa.int64()),
                         "id_b": pa.array(ib, pa.int64()),
                         out_col: pa.array(lv, pa.int64())})

    return docs_ds.map_batches(keyed, batch_format="pyarrow") \
        .groupby("_ub").map_groups(per_bucket, batch_format="pandas")


def dl_block_pairs(docs_ds, *, k: int = 2, key_chars: int = 8,
                   pfx_chars: int = 24, max_block: int = 64,
                   n_buckets: int = 256, text_col: str = "text",
                   id_col: str = "doc_id"):
    """Transposition-aware edit join: same prefix blocking as
    :func:`edit_block_pairs`, but the pair predicate is TRUE
    Damerau–Levenshtein ≤ ``k`` — the typo model where ``hte``→``the``
    costs 1, not 2 (swaps are the most common keyboard error; Damerau
    1964 measured >80% of misspellings as single insert/delete/
    substitute/TRANSPOSE).  Output ``(id_a, id_b, dl)`` with
    ``id_a < id_b``.  ASCII-only law (DuckDB damerau_levenshtein is
    byte-based — same caveat as edit_block_pairs).

    Scale shape: identical to edit_block_pairs (shared builder) —
    coarse-bucketed blocks, C(max_block, 2) cap per block, full-matrix
    DL on ≤ pfx_chars-char strings (banding is UNSAFE for true DL: the
    transposition term reaches the last-occurrence row, outside any
    diagonal band).
    """
    return _prefix_block_join(docs_ds, dist=_damerau_levenshtein,
                              out_col="dl", k=k, key_chars=key_chars,
                              pfx_chars=pfx_chars, max_block=max_block,
                              n_buckets=n_buckets, text_col=text_col,
                              id_col=id_col)


def edit_block_pairs(docs_ds, *, k: int = 2, key_chars: int = 8,
                     pfx_chars: int = 24, max_block: int = 64,
                     n_buckets: int = 256, text_col: str = "text",
                     id_col: str = "doc_id"):
    """Edit-distance similarity join inside prefix blocks: candidate
    pairs share the first ``key_chars`` chars of the alnum-collapsed
    lowercase text (an exact-prefix blocking key — first-TOKEN keys on a
    closed vocabulary are all stop blocks), blocks larger than
    ``max_block`` are dropped entirely (the stop-key law — enforced in
    the SQL oracle too), and a pair survives iff
    ``levenshtein(s_a, s_b) <= k`` where ``s`` is the first ``pfx_chars``
    chars of the alnum-collapsed text (pure ASCII, so Python codepoint
    distance == DuckDB's byte distance).  Output ``(id_a, id_b, lev)``
    with ``id_a < id_b``.  Docs whose collapse is empty join no block.

    Scale shape: blocks co-locate via coarse ``bucket_hash`` groups (no
    per-key map_groups); work per block is capped at C(max_block, 2)
    banded-Levenshtein calls on ≤ ``pfx_chars``-char strings; the exact
    global block size is known in-bucket because the key is the bucket
    hash input (every row of a block lands in the same bucket).
    """
    return _prefix_block_join(docs_ds, dist=_levenshtein, out_col="lev",
                              k=k, key_chars=key_chars,
                              pfx_chars=pfx_chars, max_block=max_block,
                              n_buckets=n_buckets, text_col=text_col,
                              id_col=id_col)


# ---------------------------------------------------------------------------
# phonetic (Soundex) blocking
# ---------------------------------------------------------------------------

_SOUNDEX_MAP = str.maketrans(
    "abcdefghijklmnopqrstuvwxyz", "01230120022455012623010202")
_SOUNDEX_DEDUP = None  # compiled lazily (regex import at module scope is
# cheap but keeps the worker-import path lean like the other lazy bits)


def soundex_key(text: str | None) -> str:
    """American Soundex of the first 10 LETTERS of the text (the h/w-as-
    vowel simplified variant: h and w separate duplicate codes, like
    vowels — the common simplified implementation).  '' when the text
    has no ASCII letter.  The 10-letter cap bounds code runs so the SQL
    twin can dedup adjacent repeats with FOUR chained ``replace`` calls
    per digit (RE2 has no backreferences): ceil(10/2⁴) = 1."""
    import re

    global _SOUNDEX_DEDUP
    if _SOUNDEX_DEDUP is None:
        _SOUNDEX_DEDUP = re.compile(r"(.)\1+")
    s = re.sub(r"[^a-z]", "", (text or "").lower())[:10]
    if not s:
        return ""
    code = _SOUNDEX_DEDUP.sub(r"\1", s.translate(_SOUNDEX_MAP))
    return s[0].upper() + (code[1:].replace("0", "") + "000")[:3]


def phonetic_block_pairs(docs_ds, *, max_block: int = 64,
                         n_buckets: int = 256, text_col: str = "text",
                         id_col: str = "doc_id"):
    """Phonetic blocking — the classic typo-tolerant ER blocker: docs
    sharing a Soundex key (of the leading letters) are candidate pairs.
    Complements edit_block_pairs (exact-prefix blocks + Levenshtein):
    Soundex merges spelling variants the prefix key separates
    ('smith'/'smyth' → S530).  Blocks larger than ``max_block`` are
    dropped whole (the stop-key law, enforced in SQL too).  Output
    ``(id_a, id_b, key)`` with ``id_a < id_b``; empty keys block
    nothing.

    Scale shape: identical to edit_block_pairs — key computed per batch
    (tiny per-doc work: ≤10 translated chars), blocks co-locate via
    coarse bucket_hash groups (never per-key map_groups), per-block
    work capped at C(max_block, 2) pair emissions.
    """
    import pandas as pd

    def keyed(df: pd.DataFrame) -> pa.Table:
        key = df[text_col].map(soundex_key)
        t = pd.DataFrame({"doc_id": df[id_col].to_numpy(np.int64),
                          "key": key})
        t = t[t["key"] != ""]
        return pa.table({
            "doc_id": pa.array(t["doc_id"].to_numpy(np.int64), pa.int64()),
            "key": pa.array(t["key"], pa.string()),
            "_ub": pa.array(bucket_hash(t["key"], n_buckets), pa.int64()),
        })

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        ia, ib, ks = [], [], []
        if len(g):
            for key, blk in g.groupby("key", sort=False):
                n = len(blk)
                if n < 2 or n > max_block:
                    continue
                ids = np.sort(blk["doc_id"].to_numpy(np.int64))
                iu, ju = np.triu_indices(n, k=1)
                ia.append(ids[iu]); ib.append(ids[ju])
                ks.extend([key] * len(iu))
        if not ia:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "key": pa.array([], pa.string())})
        return pa.table({
            "id_a": pa.array(np.concatenate(ia), pa.int64()),
            "id_b": pa.array(np.concatenate(ib), pa.int64()),
            "key": pa.array(ks, pa.string())})

    return docs_ds.map_batches(keyed, batch_format="pandas") \
        .groupby("_ub").map_groups(per_bucket, batch_format="pandas")


# ---------------------------------------------------------------------------
# Fellegi–Sunter probabilistic match scores
# ---------------------------------------------------------------------------

_FS_FIELDS = ("seg", "ten", "bal")


def _fs_fields(cust_ds):
    """Project the Fellegi–Sunter comparison fields from the customer
    table: ``id`` / ``nat`` (blocking) plus ``seg`` = c_mktsegment,
    ``ten`` = the tens-digit char of c_name, ``bal`` = floor(cents/1e5)
    account-balance $1000 bucket.  Shared by every fs_* builder."""
    import pandas as pd

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(
            df["c_acctbal"].fillna(0.0).to_numpy(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        return pd.DataFrame({
            "id": df["c_custkey"].to_numpy(np.int64),
            "nat": df["c_nationkey"].to_numpy(np.int64),
            "seg": df["c_mktsegment"].fillna("").astype(str),
            "ten": df["c_name"].fillna("").astype(str).str[-2:-1],
            "bal": cents // np.int64(100_000),
        })

    return cust_ds.map_batches(prep, batch_format="pandas")


def _fs_value_counts(fields_ds):
    """Global (field, value, count) table of the FS comparison fields —
    per-batch value-count partials collect straight to the driver
    (cardinality-bounded: 5 segments, 10 digit chars, ~12 balance
    buckets — an AllToAll here would be pure fixed latency).  Values are
    stringified (``bal`` int → str) so one schema fits all fields.
    Returns an empty DataFrame on an empty corpus."""
    import pandas as pd

    def vc_part(df: pd.DataFrame) -> pa.Table:
        fs, vs, cs = [], [], []
        for f in _FS_FIELDS:
            vc = df[f].astype(str).value_counts()
            fs += [f] * len(vc)
            vs += [str(v) for v in vc.index]
            cs += [int(c) for c in vc.to_numpy()]
        return pa.table({"f": pa.array(fs, pa.string()),
                         "v": pa.array(vs, pa.string()),
                         "c": pa.array(cs, pa.int64())})

    counts = fields_ds.map_batches(vc_part, batch_format="pandas") \
        .to_pandas()
    if not counts.empty:
        counts = counts.groupby(["f", "v"], as_index=False)["c"].sum()
    return counts


def _fs_weight_pass(cust_ds):
    """Shared Fellegi–Sunter pass 1 (fs_match_scores / fs_mutual_best /
    fs_em_round): project the comparison fields and derive the per-field
    POOLED agreement weights ``w_f = bit_length(T // A_f)``.  Returns
    ``(fields_ds, (w_seg, w_ten, w_bal))`` — weights ``None`` on an
    empty corpus."""
    fields_ds = _fs_fields(cust_ds)
    counts = _fs_value_counts(fields_ds)
    if counts.empty:
        return fields_ds, None
    n_total = int(counts.loc[counts["f"] == "seg", "c"].sum())
    t_pairs = n_total * (n_total - 1) // 2
    weights = {}
    for f in _FS_FIELDS:
        c = counts.loc[counts["f"] == f, "c"].to_numpy(np.int64)
        a_f = int((c * (c - 1) // 2).sum())
        if a_f > 0:
            weights[f] = (t_pairs // a_f).bit_length()
        else:
            weights[f] = t_pairs.bit_length() if t_pairs > 0 else 0
    return fields_ds, tuple(weights[f] for f in _FS_FIELDS)


def _fs_tag_fn(*, gap: int, chunk: int):
    """The shared FS pair-pass bucketing law: bucket rows by (nat,
    id // chunk), replicating rows with ``id % chunk < gap`` into the
    PREVIOUS chunk as non-primary right-partners (SNM backward boundary
    replication in key-value space)."""
    import pandas as pd

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["id"].to_numpy(np.int64)
        cb = ids // chunk
        rep = ((ids % chunk) < gap) & (cb > 0)
        return pd.concat([df.assign(_cb=cb, _pri=True),
                          df.loc[rep].assign(_cb=cb[rep] - 1, _pri=False)],
                         ignore_index=True)

    return tag


def _fs_enum_pairs(g, *, gap: int):
    """Enumerate the candidate pairs of one (nat, chunk) kernel group:
    sort by id, then for each PRIMARY row pair it with every row whose
    id is in (id, id + gap].  Returns ``(g_sorted, li, ri)`` index
    arrays into the sorted frame, or ``None`` when the group yields no
    pairs.  Shared by every fs_* pair kernel — fork the scoring, never
    this enumeration."""
    if not len(g):
        return None
    g = g.sort_values("id", kind="mergesort")
    ids = g["id"].to_numpy(np.int64)
    pidx = np.flatnonzero(g["_pri"].to_numpy(bool))
    pid = ids[pidx]
    lo = np.searchsorted(ids, pid + 1, "left")
    hi = np.searchsorted(ids, pid + gap, "right")
    cnt = hi - lo
    tot = int(cnt.sum())
    if tot == 0:
        return None
    li = np.repeat(pidx, cnt)
    starts = cnt.cumsum() - cnt
    ri = np.repeat(lo, cnt) + (np.arange(tot) - np.repeat(starts, cnt))
    return g, li, ri


def fs_match_scores(cust_ds, *, gap: int = 5, chunk: int = 8192):
    """Fellegi–Sunter-style probabilistic linkage scores over the customer
    table: candidate pairs are same-nation rows within ``gap`` custkeys
    (a cheap deterministic blocker), and each pair's score is the sum of
    per-field agreement weights ``w_f = bit_length(T // A_f)`` — the
    integer log-odds proxy (the unigram_bits bit-length law) where ``T``
    is the total pair count C(N,2) and ``A_f = Σ_v C(n_v,2)`` the number
    of random pairs agreeing on field ``f`` (the u-probability numerator
    of Fellegi & Sunter 1969).  Rarer-to-agree fields earn higher
    weights.  Fields: ``seg`` = c_mktsegment (5 values), ``ten`` = the
    tens-digit char of c_name (last char after dropping the final one —
    10 values), ``bal`` = floor(cents/1e5) account-balance $1000 bucket
    (the repo cents law, ~12 values).
    Output: one row per distinct score — ``(score, n_pairs)``.

    Scale shape: the weight pass collects only (field, value, count)
    partials whose cardinality is value-range bounded (5 segments, 10
    digit chars, ~12 balance buckets — constants, not data-bounded);
    pair formation buckets rows by (nat, custkey // chunk) with rows
    whose ``custkey % chunk < gap`` replicated into the PREVIOUS bucket
    as non-primary right-partners (the SNM backward-replication law, in
    key-value space), so every kernel is O(chunk) and the shuffle ships
    histogram partials, never pairs.
    """
    import pandas as pd
    import ray.data as rd

    fields_ds, weights = _fs_weight_pass(cust_ds)
    if weights is None:
        return rd.from_arrow(pa.table({"score": pa.array([], pa.int64()),
                                       "n_pairs": pa.array([], pa.int64())}))
    w_seg, w_ten, w_bal = weights

    # pair pass: bucket by (nat, id // chunk); backward boundary
    # replication of rows with id % chunk < gap (right-partners only).
    tag = _fs_tag_fn(gap=gap, chunk=chunk)

    def score_kernel(g: pd.DataFrame) -> pa.Table:
        enum = _fs_enum_pairs(g, gap=gap)
        if enum is None:
            return pa.table({"score": pa.array([], pa.int64()),
                             "n_pairs": pa.array([], pa.int64())})
        g, li, ri = enum
        seg = pd.factorize(g["seg"])[0]
        ten = pd.factorize(g["ten"])[0]
        bal = g["bal"].to_numpy(np.int64)
        sc = (w_seg * (seg[li] == seg[ri]).astype(np.int64)
              + w_ten * (ten[li] == ten[ri]).astype(np.int64)
              + w_bal * (bal[li] == bal[ri]).astype(np.int64))
        v, c = np.unique(sc, return_counts=True)
        return pa.table({"score": pa.array(v, pa.int64()),
                         "n_pairs": pa.array(c.astype(np.int64), pa.int64())})

    # per-kernel histograms are <= n_kernels × Σw rows — merge on the
    # driver instead of paying a third AllToAll for a ~10-row output.
    hist = fields_ds.map_batches(tag, batch_format="pandas") \
        .groupby(["nat", "_cb"]).map_groups(score_kernel,
                                            batch_format="pandas") \
        .to_pandas()
    if hist.empty:
        return rd.from_arrow(pa.table({"score": pa.array([], pa.int64()),
                                       "n_pairs": pa.array([], pa.int64())}))
    hist = hist.groupby("score", as_index=False)["n_pairs"].sum()
    return rd.from_arrow(pa.table({
        "score": pa.array(hist["score"].to_numpy(np.int64), pa.int64()),
        "n_pairs": pa.array(hist["n_pairs"].to_numpy(np.int64), pa.int64()),
    }))


# ---------------------------------------------------------------------------
# multi-blocker cascade (union with provenance)
# ---------------------------------------------------------------------------

def blocking_cascade(docs_ds, *, n_buckets: int = 128,
                     text_col: str = "text", id_col: str = "doc_id"):
    """Multi-blocker union — how production ER systems actually block:
    no single blocker catches every duplicate shape, so the candidate
    set is the UNION of complementary blockers, with per-pair
    provenance.  Components (their exact standalone laws):

    * bit 1 — :func:`snm_pairs` (sorted neighborhood, window 3): catches
      shared-prefix variants;
    * bit 2 — :func:`edit_block_pairs` (Levenshtein≤2 in 8-char prefix
      blocks): catches small typos past the SNM window;
    * bit 4 — :func:`phonetic_block_pairs` (Soundex): catches spelling
      variants that break the prefix entirely ('smith'/'smyth').

    Output ``(id_a, id_b, src_mask)`` with ``id_a < id_b`` and
    ``src_mask`` the bitwise OR of the finding blockers (each component
    emits a pair at most once, so OR == SUM of the bits) — pairs with
    multiple bits are the strongest candidates, and the mask is the
    per-blocker audit trail.

    Scale shape: each component keeps its own documented shape; the
    union is REPARTITIONED before grouping (union sums block counts —
    the iterative-loop lesson) and combined in coarse pair buckets
    (util.pair_bucket), never per-pair groups.
    """
    import pandas as pd

    import ray
    from ..util import pair_bucket

    def norm_snm(t: pa.Table) -> pa.Table:
        a, b = t.column("id_a"), t.column("id_b")
        lo = pc.min_element_wise(a, b)
        hi = pc.max_element_wise(a, b)
        return pa.table({"id_a": pc.cast(lo, pa.int64()),
                         "id_b": pc.cast(hi, pa.int64()),
                         "bit": pa.array(np.full(t.num_rows, 1, np.int64))})

    def tag_bit(bit):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({
                "id_a": pc.cast(t.column("id_a"), pa.int64()),
                "id_b": pc.cast(t.column("id_b"), pa.int64()),
                "bit": pa.array(np.full(t.num_rows, bit, np.int64))})
        return f

    p1 = snm_pairs(docs_ds, text_col=text_col, id_col=id_col) \
        .map_batches(norm_snm, batch_format="pyarrow")
    p2 = edit_block_pairs(docs_ds, text_col=text_col, id_col=id_col) \
        .map_batches(tag_bit(2), batch_format="pyarrow")
    p3 = phonetic_block_pairs(docs_ds, text_col=text_col, id_col=id_col) \
        .map_batches(tag_bit(4), batch_format="pyarrow")

    ncpu = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8

    def add_pb(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy(zero_copy_only=False)
        b = t.column("id_b").to_numpy(zero_copy_only=False)
        return t.append_column(
            "_pb", pa.array(pair_bucket(a, b, n_buckets), pa.int64()))

    def combine(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "src_mask": pa.array([], pa.int64())})
        m = g.groupby(["id_a", "id_b"], as_index=False)["bit"].sum()
        return pa.table({
            "id_a": pa.array(m["id_a"].to_numpy(np.int64), pa.int64()),
            "id_b": pa.array(m["id_b"].to_numpy(np.int64), pa.int64()),
            "src_mask": pa.array(m["bit"].to_numpy(np.int64), pa.int64())})

    return p1.union(p2).union(p3) \
        .repartition(max(16, 2 * ncpu)) \
        .map_batches(add_pb, batch_format="pyarrow") \
        .groupby("_pb").map_groups(combine, batch_format="pandas")


# ---------------------------------------------------------------------------
# group linkage: best-match partner by set overlap of linked items
# ---------------------------------------------------------------------------

def group_linkage_best(ds, *, id_col: str = "l_suppkey",
                       item_col: str = "l_partkey", max_df: int = 35,
                       n_buckets: int = 256):
    """Group linkage (Kum et al., "On Group Linkage" 2009 family): each
    entity is the SET of distinct items linked to it (a supplier's
    distinct parts), similarity is set Jaccard, and the output is each
    entity's single best partner — ``(s_suppkey, best_suppkey, inter,
    n_self, n_best, jac_bp)`` with ``jac_bp = inter·10⁴ //
    (n_self + n_best − inter)``, ties broken by lowest partner id.
    A fixed similarity threshold is the wrong law here (random item
    assignment drives max Jaccard toward 0 as the catalog grows — at
    sf0.1 it is 3%), so the law is argmax, which stays discriminating
    at every scale.  Items with document frequency > ``max_df`` are
    stop items: they pair EVERYONE with everyone (the quadratic
    blow-up), so they are excluded from co-occurrence counting —
    identically in the SQL oracle; entity set sizes still count every
    item.  Entities whose items are all stopped (or unshared) emit no
    row.  NULL ids/items are dropped (SQL join semantics).

    Scale shape (4 bounded shuffles, nothing quadratic): (1) in-batch
    distinct (id, item) partials bucket by id; (2) id-buckets finish the
    global dedup and attach n_self (id co-located == global); (3)
    item-buckets compute df in-bucket (item co-located), drop stop
    items, self-merge per item and PRE-COMBINE (id_a, id_b) counts
    before (4) pair-buckets finalize inter and the symmetric per-id
    top-1 reduces in id-buckets (partial argmax is associative — each
    bucket holds every pair of its ids).
    """
    import pandas as pd

    def batch_distinct(t: pa.Table) -> pa.Table:
        df = t.select([id_col, item_col]).to_pandas()
        df = df.dropna().drop_duplicates()
        ids = df[id_col].to_numpy(np.int64)
        return pa.table({
            "s": pa.array(ids, pa.int64()),
            "p": pa.array(df[item_col].to_numpy(np.int64), pa.int64()),
            "_ib": pa.array(bucket_hash(pd.Series(ids), n_buckets),
                            pa.int64())})

    # plain function → task pool (a concurrency TUPLE is actor-only and
    # RAISES on plain fns, CLAUDE.md)
    parts = ds.map_batches(batch_distinct, batch_format="pyarrow")

    def attach_sizes(g: pd.DataFrame) -> pa.Table:
        g = g.drop_duplicates(["s", "p"])
        if not len(g):
            return pa.table({"s": pa.array([], pa.int64()),
                             "p": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "_pb": pa.array([], pa.int64())})
        n = g.groupby("s")["p"].transform("size").to_numpy(np.int64)
        return pa.table({
            "s": pa.array(g["s"].to_numpy(np.int64), pa.int64()),
            "p": pa.array(g["p"].to_numpy(np.int64), pa.int64()),
            "n": pa.array(n, pa.int64()),
            "_pb": pa.array(bucket_hash(g["p"], n_buckets), pa.int64())})

    sized = parts.groupby("_ib").map_groups(attach_sizes,
                                            batch_format="pandas")

    _pair_schema = {"s1": pa.int64(), "s2": pa.int64(),
                    "inter": pa.int64(), "n1": pa.int64(),
                    "n2": pa.int64(), "_qb": pa.int64()}

    def cooccur(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({k: pa.array([], t)
                          for k, t in _pair_schema.items()})
        if not len(g):
            return empty
        df = g.groupby("p")["s"].transform("size").to_numpy(np.int64)
        g = g[df <= max_df]
        if not len(g):
            return empty
        m = g.merge(g, on="p", suffixes=("_a", "_b"))
        m = m[m["s_a"] < m["s_b"]]
        if m.empty:
            return empty
        agg = (m.groupby(["s_a", "s_b"], as_index=False)
                .agg(inter=("p", "size"), n1=("n_a", "first"),
                     n2=("n_b", "first")))
        l = agg["s_a"].to_numpy(np.int64)
        r = agg["s_b"].to_numpy(np.int64)
        return pa.table({
            "s1": pa.array(l, pa.int64()),
            "s2": pa.array(r, pa.int64()),
            "inter": pa.array(agg["inter"].to_numpy(np.int64), pa.int64()),
            "n1": pa.array(agg["n1"].to_numpy(np.int64), pa.int64()),
            "n2": pa.array(agg["n2"].to_numpy(np.int64), pa.int64()),
            "_qb": pa.array(pair_bucket(l, r, n_buckets), pa.int64())})

    co = sized.groupby("_pb").map_groups(cooccur, batch_format="pandas")

    def combine_sym(g: pd.DataFrame) -> pa.Table:
        cols = ["s", "t", "inter", "n_self", "n_best", "_ib"]
        if not len(g):
            return pa.table({
                "s": pa.array([], pa.int64()), "t": pa.array([], pa.int64()),
                "inter": pa.array([], pa.int64()),
                "n_self": pa.array([], pa.int64()),
                "n_best": pa.array([], pa.int64()),
                "_ib": pa.array([], pa.int64())})
        agg = (g.groupby(["s1", "s2"], as_index=False)
                .agg(inter=("inter", "sum"), n1=("n1", "max"),
                     n2=("n2", "max")))
        sym = pd.DataFrame({
            "s": np.concatenate([agg["s1"].to_numpy(np.int64),
                                 agg["s2"].to_numpy(np.int64)]),
            "t": np.concatenate([agg["s2"].to_numpy(np.int64),
                                 agg["s1"].to_numpy(np.int64)]),
            "inter": np.tile(agg["inter"].to_numpy(np.int64), 2),
            "n_self": np.concatenate([agg["n1"].to_numpy(np.int64),
                                      agg["n2"].to_numpy(np.int64)]),
            "n_best": np.concatenate([agg["n2"].to_numpy(np.int64),
                                      agg["n1"].to_numpy(np.int64)]),
        })
        sym["_ib"] = bucket_hash(sym["s"], n_buckets)
        return pa.Table.from_pandas(sym[cols], preserve_index=False)

    sym = co.groupby("_qb").map_groups(combine_sym, batch_format="pandas")

    out_cols = ["s_suppkey", "best_suppkey", "inter", "n_self", "n_best",
                "jac_bp"]

    def best_per_id(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return pa.table({c: pa.array([], pa.int64())
                             for c in out_cols})
        union = (g["n_self"].to_numpy(np.int64)
                 + g["n_best"].to_numpy(np.int64)
                 - g["inter"].to_numpy(np.int64))
        g = g.assign(jac_bp=g["inter"].to_numpy(np.int64) * 10000 // union)
        g = g.sort_values(["s", "jac_bp", "t"],
                          ascending=[True, False, True], kind="mergesort")
        g = g.drop_duplicates("s")
        return pa.table({
            "s_suppkey": pa.array(g["s"].to_numpy(np.int64), pa.int64()),
            "best_suppkey": pa.array(g["t"].to_numpy(np.int64), pa.int64()),
            "inter": pa.array(g["inter"].to_numpy(np.int64), pa.int64()),
            "n_self": pa.array(g["n_self"].to_numpy(np.int64), pa.int64()),
            "n_best": pa.array(g["n_best"].to_numpy(np.int64), pa.int64()),
            "jac_bp": pa.array(g["jac_bp"].to_numpy(np.int64), pa.int64())})

    return sym.groupby("_ib").map_groups(best_per_id, batch_format="pandas")


def fs_mutual_best(cust_ds, *, gap: int = 5, chunk: int = 8192,
                   n_buckets: int = 128):
    """Symmetric-best one-to-one matching over the Fellegi–Sunter scores
    (the classic ER post-step restricting a many-to-many candidate set
    toward a 1-1 assignment): a pair (l, r) survives iff ``r`` is l's
    best-scoring right partner AND ``l`` is r's best-scoring left
    partner — mutual nearest neighbors under the
    :func:`fs_match_scores` score, ties broken by lowest partner id.
    Candidates, fields and weights are exactly fs_match_scores'
    (same-nation, 0 < id gap <= ``gap``).  Output ``(left_id,
    right_id, score)``.

    Scale shape: a LEFT id's partners all live in its own (nat, chunk)
    kernel (forward-looking pairs + backward boundary replication), so
    the per-left argmax is EXACT in-kernel and globally unique; a RIGHT
    id's partners can span its own kernel and the previous one, so
    kernels emit per-right argmax PARTIALS (≤ 2 per right id) and the
    combine is an associative (score desc, left asc) reduce inside
    hash(right) buckets — where the mutual join also happens, since
    both row kinds are bucketed by the right id (ONE AllToAll for
    combine + join).
    """
    import pandas as pd
    import ray.data as rd

    empty = pa.table({"left_id": pa.array([], pa.int64()),
                      "right_id": pa.array([], pa.int64()),
                      "score": pa.array([], pa.int64())})

    fields_ds, weights = _fs_weight_pass(cust_ds)
    if weights is None:
        return rd.from_arrow(empty)
    w_seg, w_ten, w_bal = weights

    tag = _fs_tag_fn(gap=gap, chunk=chunk)

    _part_schema = {"l": pa.int64(), "r": pa.int64(),
                    "score": pa.int64(), "side": pa.string(),
                    "_rb": pa.int64()}

    def best_kernel(g: pd.DataFrame) -> pa.Table:
        kempty = pa.table({k: pa.array([], t)
                           for k, t in _part_schema.items()})
        enum = _fs_enum_pairs(g, gap=gap)
        if enum is None:
            return kempty
        g, li, ri = enum
        ids = g["id"].to_numpy(np.int64)
        seg = pd.factorize(g["seg"])[0]
        ten = pd.factorize(g["ten"])[0]
        bal = g["bal"].to_numpy(np.int64)
        pairs = pd.DataFrame({
            "l": ids[li], "r": ids[ri],
            "score": (w_seg * (seg[li] == seg[ri]).astype(np.int64)
                      + w_ten * (ten[li] == ten[ri]).astype(np.int64)
                      + w_bal * (bal[li] == bal[ri]).astype(np.int64))})
        lb = pairs.sort_values(["l", "score", "r"],
                               ascending=[True, False, True],
                               kind="mergesort").drop_duplicates("l")
        rb = pairs.sort_values(["r", "score", "l"],
                               ascending=[True, False, True],
                               kind="mergesort").drop_duplicates("r")
        out = pd.concat([lb.assign(side="L"), rb.assign(side="R")],
                        ignore_index=True)
        out["_rb"] = bucket_hash(out["r"], n_buckets)
        return pa.Table.from_pandas(out[list(_part_schema)],
                                    preserve_index=False)

    parts = fields_ds.map_batches(tag, batch_format="pandas") \
        .groupby(["nat", "_cb"]).map_groups(best_kernel,
                                            batch_format="pandas")

    def mutual(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return empty
        rbest = g[g["side"] == "R"] \
            .sort_values(["r", "score", "l"],
                         ascending=[True, False, True],
                         kind="mergesort").drop_duplicates("r")
        lbest = g[g["side"] == "L"]
        m = lbest.merge(rbest[["l", "r"]], on=["l", "r"])
        m = m.sort_values(["l", "r"], kind="mergesort")
        return pa.table({
            "left_id": pa.array(m["l"].to_numpy(np.int64), pa.int64()),
            "right_id": pa.array(m["r"].to_numpy(np.int64), pa.int64()),
            "score": pa.array(m["score"].to_numpy(np.int64), pa.int64())})

    return parts.groupby("_rb").map_groups(mutual, batch_format="pandas")


def greedy_one_to_one(cust_ds, *, rounds: int = 3, gap: int = 5,
                      chunk: int = 8192, n_buckets: int = 128,
                      out_blocks: int = 32):
    """Greedy one-to-one matching by iterated mutual-best elimination —
    the distributed determinization of "process pairs best-first,
    match if both ends are free": each round matches every pair that is
    the best REMAINING partner of both its endpoints (score DESC, ties
    to the lowest partner id), removes the matched nodes, and repeats.
    Round 1 is exactly :func:`fs_mutual_best`; ``rounds`` bounds the
    iteration (greedy matching's sequential chain, cut after a fixed
    number of parallel sweeps — the pagerank_dups bounded-rounds
    contract).  Candidates and scores are fs_match_scores' law.  Output
    ``(round, left_id, right_id, score)``.

    Scale shape: the linear (n·gap) scored pair table is built once and
    materialized; each round is four narrow shuffles — hash(l) buckets
    give the EXACT per-left argmax plus per-right argmax PARTIALS, the
    hash(r) combine joins them into the round's matches, and two
    bucketed ANTI joins (on l, then r) subtract the matched nodes from
    the pair table, which is re-materialized per round (iterative-loop
    hygiene: lineage and block counts stay flat across rounds).  Early
    exit when a round matches nothing.
    """
    import pandas as pd
    import ray.data as rd

    from .joins import bucket_hash_join

    empty = pa.table({"round": pa.array([], pa.int64()),
                      "left_id": pa.array([], pa.int64()),
                      "right_id": pa.array([], pa.int64()),
                      "score": pa.array([], pa.int64())})

    from ..util import table_or_dataset

    fields_ds, weights = _fs_weight_pass(cust_ds)
    if weights is None:
        return table_or_dataset(empty)
    w_seg, w_ten, w_bal = weights
    tag = _fs_tag_fn(gap=gap, chunk=chunk)

    def pair_kernel(g: pd.DataFrame) -> pa.Table:
        kempty = pa.table({"l": pa.array([], pa.int64()),
                           "r": pa.array([], pa.int64()),
                           "score": pa.array([], pa.int64())})
        enum = _fs_enum_pairs(g, gap=gap)
        if enum is None:
            return kempty
        g, li, ri = enum
        ids = g["id"].to_numpy(np.int64)
        seg = pd.factorize(g["seg"])[0]
        ten = pd.factorize(g["ten"])[0]
        bal = g["bal"].to_numpy(np.int64)
        score = (w_seg * (seg[li] == seg[ri]).astype(np.int64)
                 + w_ten * (ten[li] == ten[ri]).astype(np.int64)
                 + w_bal * (bal[li] == bal[ri]).astype(np.int64))
        return pa.table({"l": pa.array(ids[li], pa.int64()),
                         "r": pa.array(ids[ri], pa.int64()),
                         "score": pa.array(score, pa.int64())})

    pairs = fields_ds.map_batches(tag, batch_format="pandas") \
        .groupby(["nat", "_cb"]).map_groups(pair_kernel,
                                            batch_format="pandas") \
        .materialize()

    _part_schema = {"l": pa.int64(), "r": pa.int64(),
                    "score": pa.int64(), "side": pa.string(),
                    "_rb": pa.int64()}
    pair_types = {"l": pa.int64(), "r": pa.int64(), "score": pa.int64()}

    def lbucket(df: pd.DataFrame) -> pa.Table:
        df = df.assign(_lb=bucket_hash(df["l"], n_buckets))
        return pa.Table.from_pandas(df, preserve_index=False)

    def best_kernel(g: pd.DataFrame) -> pa.Table:
        kempty = pa.table({k: pa.array([], t)
                           for k, t in _part_schema.items()})
        if not len(g):
            return kempty
        lb = g.sort_values(["l", "score", "r"],
                           ascending=[True, False, True],
                           kind="mergesort").drop_duplicates("l")
        rb = g.sort_values(["r", "score", "l"],
                           ascending=[True, False, True],
                           kind="mergesort").drop_duplicates("r")
        out = pd.concat([lb.assign(side="L"), rb.assign(side="R")],
                        ignore_index=True)
        out["_rb"] = bucket_hash(out["r"], n_buckets)
        return pa.Table.from_pandas(out[list(_part_schema)],
                                    preserve_index=False)

    def mutual(g: pd.DataFrame) -> pa.Table:
        mempty = pa.table({"l": pa.array([], pa.int64()),
                           "r": pa.array([], pa.int64()),
                           "score": pa.array([], pa.int64())})
        if not len(g):
            return mempty
        rbest = g[g["side"] == "R"] \
            .sort_values(["r", "score", "l"],
                         ascending=[True, False, True],
                         kind="mergesort").drop_duplicates("r")
        m = g[g["side"] == "L"].merge(rbest[["l", "r"]], on=["l", "r"])
        return pa.table({
            "l": pa.array(m["l"].to_numpy(np.int64), pa.int64()),
            "r": pa.array(m["r"].to_numpy(np.int64), pa.int64()),
            "score": pa.array(m["score"].to_numpy(np.int64), pa.int64())})

    matched_rounds = []
    for rnd in range(1, rounds + 1):
        matched = pairs.map_batches(lbucket, batch_format="pandas") \
            .groupby("_lb").map_groups(best_kernel,
                                       batch_format="pandas") \
            .groupby("_rb").map_groups(mutual, batch_format="pandas") \
            .materialize()   # 3 consumers: output + the two anti joins
        if matched.count() == 0:
            break
        matched_rounds.append((rnd, matched))
        if rnd == rounds:
            break
        # matched NODES leave the pair pool — both roles, both columns
        nodes_l = matched.map_batches(
            lambda t: pa.table({"l": pa.concat_arrays(
                [t.column("l").combine_chunks(),
                 t.column("r").combine_chunks()])}),
            batch_format="pyarrow")
        nodes_r = nodes_l.map_batches(
            lambda t: t.rename_columns(["r"]), batch_format="pyarrow")
        pairs = bucket_hash_join(
            pairs, nodes_l, on="l", how="anti", n_buckets=n_buckets,
            left_types=pair_types, right_types={"l": pa.int64()})
        pairs = bucket_hash_join(
            pairs, nodes_r, on="r", how="anti", n_buckets=n_buckets,
            left_types=pair_types, right_types={"r": pa.int64()})
        pairs = pairs.repartition(out_blocks).materialize()

    if not matched_rounds:
        return table_or_dataset(empty)

    outs = []
    for rnd, m in matched_rounds:
        outs.append(m.map_batches(
            lambda t, _r=rnd: pa.table({
                "round": pa.array(np.full(t.num_rows, _r, np.int64),
                                  pa.int64()),
                "left_id": t.column("l"),
                "right_id": t.column("r"),
                "score": t.column("score")}),
            batch_format="pyarrow"))
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


# ---------------------------------------------------------------------------
# suffix-array blocking
# ---------------------------------------------------------------------------

def suffix_blocking_pairs(docs_ds, *, key_len: int = 12, min_len: int = 6,
                          max_block: int = 50, n_buckets: int = 256,
                          text_col: str = "text", id_col: str = "doc_id"):
    """Suffix-array blocking (Aizawa & Oyama 2005): the blocking key is
    the first ``key_len`` chars of the alnum collapse, and a record
    enters one block per SUFFIX of that key with length ≥ ``min_len`` —
    so two records whose keys diverge only in a leading typo still
    co-block on the shared tail (the failure mode plain prefix/token
    blocking cannot catch).  Blocks of size 1 pair nothing; blocks
    larger than ``max_block`` are stop blocks (dropped — identical cap
    in the SQL oracle).  Output ``(left_id, right_id, n_blocks)`` with
    ``id_a < id_b`` and ``n_blocks`` = how many shared suffix blocks
    found the pair (the meta-blocking CBS evidence count).

    Scale shape: suffix explosion is ≤ ``key_len − min_len + 1`` rows
    per record (bounded fan-out, emitted with pyarrow slice kernels —
    one vectorized pass per offset, no per-row loop); block-size
    filtering happens IN the suffix hash-bucket (suffix co-located ⇒
    in-bucket count is the global block size); pair counts pre-combine
    in-bucket and finalize in coarse pair buckets.  Two AllToAlls.
    """
    import pandas as pd

    def explode(t: pa.Table) -> pa.Table:
        key = pc.utf8_slice_codeunits(_collapse(t.column(text_col)),
                                      0, key_len)
        ids = pc.cast(t.column(id_col), pa.int64())
        outs = []
        for i in range(key_len - min_len + 1):
            sfx = pc.utf8_slice_codeunits(key, i, key_len)
            keep = pc.greater_equal(pc.utf8_length(sfx), min_len)
            outs.append(pa.table({
                "id": ids.filter(keep) if isinstance(ids, pa.ChunkedArray)
                else pc.filter(ids, keep),
                "sfx": pc.filter(sfx, keep)}))
        out = pa.concat_tables(outs)
        sb = bucket_hash(out.column("sfx").to_pandas(), n_buckets)
        return out.append_column("_sb", pa.array(sb, pa.int64()))

    ex = docs_ds.map_batches(explode, batch_format="pyarrow")

    _pair_cols = {"left_id": pa.int64(), "right_id": pa.int64(),
                  "n_blocks": pa.int64(), "_pb": pa.int64()}

    def emit_pairs(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({k: pa.array([], t) for k, t in _pair_cols.items()})
        if not len(g):
            return empty
        size = g.groupby("sfx")["id"].transform("size").to_numpy(np.int64)
        g = g[(size >= 2) & (size <= max_block)]
        if not len(g):
            return empty
        m = g.merge(g, on="sfx", suffixes=("_a", "_b"))
        m = m[m["id_a"] < m["id_b"]]
        if m.empty:
            return empty
        agg = (m.groupby(["id_a", "id_b"], as_index=False)
                .agg(n_blocks=("sfx", "size")))
        l = agg["id_a"].to_numpy(np.int64)
        r = agg["id_b"].to_numpy(np.int64)
        return pa.table({
            "left_id": pa.array(l, pa.int64()),
            "right_id": pa.array(r, pa.int64()),
            "n_blocks": pa.array(agg["n_blocks"].to_numpy(np.int64),
                                 pa.int64()),
            "_pb": pa.array(pair_bucket(l, r, n_buckets), pa.int64())})

    pairs = ex.groupby("_sb").map_groups(emit_pairs, batch_format="pandas")

    def combine(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return pa.table({"left_id": pa.array([], pa.int64()),
                             "right_id": pa.array([], pa.int64()),
                             "n_blocks": pa.array([], pa.int64())})
        agg = (g.groupby(["left_id", "right_id"], as_index=False)
                ["n_blocks"].sum())
        return pa.table({
            "left_id": pa.array(agg["left_id"].to_numpy(np.int64),
                                pa.int64()),
            "right_id": pa.array(agg["right_id"].to_numpy(np.int64),
                                 pa.int64()),
            "n_blocks": pa.array(agg["n_blocks"].to_numpy(np.int64),
                                 pa.int64())})

    return pairs.groupby("_pb").map_groups(combine, batch_format="pandas")


def dedup_threshold_sweep(docs_ds, *, taus=(10, 30, 50, 70, 90),
                          n: int = 3, max_df: int = 100,
                          n_buckets: int = 256,
                          text_col: str = "text", id_col: str = "doc_id"):
    """Threshold sweep for the near-dup matcher: pairwise precision /
    recall / F1 (basis points) of :func:`~.dedup.ngram_jaccard_pairs`
    against the exact-duplicate fingerprint truth, at every ``tau`` in
    ``taus`` — the operating-point curve an ER practitioner reads
    before picking a dedup threshold.  One row per tau: ``(tau100,
    n_pred, n_tp, precision_bp, recall_bp, f1_bp)``; empty-corpus /
    zero-denominator conventions follow :func:`cluster_pair_eval`
    (0/0 → 10000).  Rows emit for EVERY tau even when nothing matches
    (fixed-shape output — the conversion_time degenerate-parity law).

    Scale shape: candidates are generated ONCE at ``min(taus)`` and
    re-thresholded arithmetically (jac_bp is monotone — no re-join per
    tau); fingerprints attach via two bucket joins (ids + 32-char fps
    move, never text); the per-tau counts collapse to per-block
    histogram partials merged on the driver (≤ |taus| rows per block),
    and the truth total Σ C(n_fp, 2) comes from fp-bucket group sizes
    (fp co-located ⇒ in-bucket counts are global) — no pair set is
    ever materialized for the truth side.
    """
    import pandas as pd
    import ray.data as rd

    from .dedup import ngram_jaccard_pairs
    from .joins import bucket_hash_join
    from .textstats import fingerprint_batch

    taus = sorted(int(t) for t in taus)
    pairs = ngram_jaccard_pairs(docs_ds, n=n, tau100=taus[0],
                                max_df=max_df, text_col=text_col,
                                id_col=id_col)

    fp_ds = docs_ds.map_batches(
        lambda b: fingerprint_batch(b, text_col=text_col, id_col=id_col),
        batch_format="pyarrow")
    fp_l = fp_ds.map_batches(
        lambda t: t.rename_columns(["left_id", "fp_l"]),
        batch_format="pyarrow")
    fp_r = fp_ds.map_batches(
        lambda t: t.rename_columns(["right_id", "fp_r"]),
        batch_format="pyarrow")

    pair_t = {"left_id": pa.int64(), "right_id": pa.int64(),
              "inter": pa.int64(), "n_left": pa.int64(),
              "n_right": pa.int64()}
    j1 = bucket_hash_join(pairs, fp_l, on="left_id",
                          n_buckets=n_buckets, left_types=pair_t,
                          right_types={"left_id": pa.int64(),
                                       "fp_l": pa.string()})
    j2 = bucket_hash_join(j1, fp_r, on="right_id", n_buckets=n_buckets,
                          left_types={**pair_t, "fp_l": pa.string()},
                          right_types={"right_id": pa.int64(),
                                       "fp_r": pa.string()})

    def hist_part(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return pa.table({"tau100": pa.array([], pa.int64()),
                             "n_pred": pa.array([], pa.int64()),
                             "n_tp": pa.array([], pa.int64())})
        inter = df["inter"].to_numpy(np.int64)
        union = (df["n_left"].to_numpy(np.int64)
                 + df["n_right"].to_numpy(np.int64) - inter)
        jb = inter * 10000 // union
        eq = (df["fp_l"].to_numpy() == df["fp_r"].to_numpy())
        rows = [(t, int((jb >= t * 100).sum()),
                 int((eq & (jb >= t * 100)).sum())) for t in taus]
        return pa.table({
            "tau100": pa.array([r[0] for r in rows], pa.int64()),
            "n_pred": pa.array([r[1] for r in rows], pa.int64()),
            "n_tp": pa.array([r[2] for r in rows], pa.int64())})

    hist = j2.map_batches(hist_part, batch_format="pandas").to_pandas()

    def fp_truth_part(t: pa.Table) -> pa.Table:
        fps = t.column("fingerprint").to_pandas()
        return pa.table({
            "fingerprint": pa.array(fps, pa.string()),
            "_fb": pa.array(bucket_hash(fps, n_buckets), pa.int64())})

    def truth_in_bucket(g: pd.DataFrame) -> pa.Table:
        c = (g["fingerprint"].value_counts().to_numpy(np.int64)
             if len(g) else np.array([], np.int64))
        return pa.table({"t": pa.array([int((c * (c - 1) // 2).sum())],
                                       pa.int64())})

    truth_parts = fp_ds.map_batches(fp_truth_part,
                                    batch_format="pyarrow") \
        .groupby("_fb").map_groups(truth_in_bucket,
                                   batch_format="pandas").to_pandas()
    n_true = int(truth_parts["t"].sum()) if len(truth_parts) else 0

    if hist.empty:
        agg = pd.DataFrame({"tau100": taus,
                            "n_pred": [0] * len(taus),
                            "n_tp": [0] * len(taus)})
    else:
        agg = hist.groupby("tau100", as_index=False)[["n_pred",
                                                      "n_tp"]].sum()
        agg = pd.DataFrame({"tau100": taus}).merge(
            agg, on="tau100", how="left").fillna(0)

    n_pred = agg["n_pred"].to_numpy(np.int64)
    n_tp = agg["n_tp"].to_numpy(np.int64)
    p_bp = np.where(n_pred == 0, 10000, n_tp * 10000 // np.maximum(n_pred, 1))
    r_bp = (np.full(len(taus), 10000, np.int64) if n_true == 0
            else n_tp * 10000 // n_true)
    denom = p_bp + r_bp
    f1_bp = np.where(denom > 0, 2 * p_bp * r_bp // np.maximum(denom, 1), 0)
    return rd.from_arrow(pa.table({
        "tau100": pa.array(agg["tau100"].to_numpy(np.int64), pa.int64()),
        "n_pred": pa.array(n_pred, pa.int64()),
        "n_tp": pa.array(n_tp, pa.int64()),
        "precision_bp": pa.array(p_bp.astype(np.int64), pa.int64()),
        "recall_bp": pa.array(r_bp.astype(np.int64), pa.int64()),
        "f1_bp": pa.array(f1_bp.astype(np.int64), pa.int64())}))


def blocking_budget_sweep(docs_ds, *, caps=(10, 30, 100, 300, 1000),
                          text_col: str = "text", id_col: str = "doc_id",
                          n_buckets: int = 64):
    """Stop-block cap sweep for the first-token blocking scheme: at each
    block-size cap ``h``, blocks sized ``2..h`` survive and the row
    reports ``(cap, n_blocks, n_cand_pairs, n_true_cand, pc_bp)`` —
    the pairs-completeness-vs-candidate-budget trade-off curve a
    blocking planner reads before picking the stop-key threshold
    (the sweep sibling of :func:`blocking_quality`, which scores one
    fixed scheme).  ``pc_bp``'s denominator is ALL true pairs (keyed
    or not); 0-truth → 10000.  Fixed ``len(caps)``-row output shape.

    Scale shape: everything derives from the (fingerprint, key) count
    table (the group-size trick — no pair materialized): one combined
    count shuffle, then ONE key-hash-bucket pass where each key's cells
    co-locate, so block size, per-cap candidate sums and per-cap
    true-candidate sums are all in-bucket partials (≤ |caps| rows per
    bucket) merged on the driver; the truth total comes from an
    fp-hash-bucket pass over the same table.
    """
    import pandas as pd
    import ray.data as rd

    from ray.data.aggregate import Sum

    caps = sorted(int(h) for h in caps)

    fk = docs_ds.map_batches(
        lambda b: _fp_key_part(b, text_col=text_col, id_col=id_col),
        batch_format="pyarrow") \
        .groupby(["fp", "key"]).aggregate(Sum("c", alias_name="c"))

    def tag_kb(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["key"] != ""]
        return df.assign(_kb=bucket_hash(df["key"], n_buckets))

    def sweep_in_bucket(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return pa.table({"cap": pa.array([], pa.int64()),
                             "n_blocks": pa.array([], pa.int64()),
                             "n_cand_pairs": pa.array([], pa.int64()),
                             "n_true_cand": pa.array([], pa.int64())})
        ks = g.groupby("key")["c"].sum()
        cell_tc = (g["c"].to_numpy(np.int64)
                   * (g["c"].to_numpy(np.int64) - 1) // 2)
        key_size = g["key"].map(ks).to_numpy(np.int64)
        s = ks.to_numpy(np.int64)
        rows = []
        for h in caps:
            live = (s >= 2) & (s <= h)
            live_cells = (key_size >= 2) & (key_size <= h)
            rows.append((h, int(live.sum()),
                         int((s[live] * (s[live] - 1) // 2).sum()),
                         int(cell_tc[live_cells].sum())))
        return pa.table({
            "cap": pa.array([r[0] for r in rows], pa.int64()),
            "n_blocks": pa.array([r[1] for r in rows], pa.int64()),
            "n_cand_pairs": pa.array([r[2] for r in rows], pa.int64()),
            "n_true_cand": pa.array([r[3] for r in rows], pa.int64())})

    sweep = fk.map_batches(tag_kb, batch_format="pandas") \
        .groupby("_kb").map_groups(sweep_in_bucket,
                                   batch_format="pandas").to_pandas()

    def tag_fb(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(_fb=bucket_hash(df["fp"], n_buckets))

    def truth_in_bucket(g: pd.DataFrame) -> pa.Table:
        c = (g.groupby("fp")["c"].sum().to_numpy(np.int64)
             if len(g) else np.array([], np.int64))
        return pa.table({"t": pa.array([int((c * (c - 1) // 2).sum())],
                                       pa.int64())})

    tparts = fk.map_batches(tag_fb, batch_format="pandas") \
        .groupby("_fb").map_groups(truth_in_bucket,
                                   batch_format="pandas").to_pandas()
    n_true = int(tparts["t"].sum()) if len(tparts) else 0

    if sweep.empty:
        agg = pd.DataFrame({"cap": caps, "n_blocks": 0,
                            "n_cand_pairs": 0, "n_true_cand": 0})
    else:
        agg = sweep.groupby("cap", as_index=False).sum()
        agg = pd.DataFrame({"cap": caps}).merge(agg, on="cap",
                                                how="left").fillna(0)
    tc = agg["n_true_cand"].to_numpy(np.int64)
    pc = (np.full(len(caps), 10000, np.int64) if n_true == 0
          else tc * 10000 // n_true)
    return rd.from_arrow(pa.table({
        "cap": pa.array(agg["cap"].to_numpy(np.int64), pa.int64()),
        "n_blocks": pa.array(agg["n_blocks"].to_numpy(np.int64),
                             pa.int64()),
        "n_cand_pairs": pa.array(agg["n_cand_pairs"].to_numpy(np.int64),
                                 pa.int64()),
        "n_true_cand": pa.array(tc, pa.int64()),
        "pc_bp": pa.array(pc.astype(np.int64), pa.int64())}))


def meta_blocking_ecbs(docs_ds, *, max_df: int = 100, n_buckets: int = 256,
                       text_col: str = "text", id_col: str = "doc_id"):
    """Meta-blocking with ECBS weights (Papadakis et al.'s
    Enhanced Common Blocks Scheme) and mean pruning: the CBS count is
    IDF-corrected by how block-prolific each endpoint is — ``w_ecbs =
    cbs · bl(B // nb_a) · bl(B // nb_b)`` where ``B`` is the number of
    surviving blocks, ``nb_x`` the number of surviving blocks containing
    doc ``x``, and ``bl`` the integer bit-length log proxy (the
    unigram_bits law: no float log near a hash-compared oracle).  Docs
    that sit in few blocks get their co-occurrences boosted; docs that
    sit in every block (near-stop docs) get damped.  Blocks and the CBS
    graph are EXACTLY :func:`meta_blocking_pairs`' (shared
    ``_cbs_pair_graph``).  Output ``(id_a, id_b, w)`` with the same
    integer cross-multiplied mean-pruning rule, over ECBS weights.

    Scale shape: the CBS graph is built once (materialized — three
    consumers: nb attach ×2 via bucket joins, scalar pass); ``nb`` comes
    from the SAME trigram explode via token-bucket partials (exact df
    in-bucket) reduced per doc in ONE narrow groupby; ``B`` is the sum
    of per-bucket distinct-survivor counts (token-partitioned ⇒
    disjoint).  Both joins ship only (id, nb) pairs.
    """
    import pandas as pd
    import ray.data as rd

    from ray.data.aggregate import Sum

    from .joins import bucket_hash_join

    exploded = docs_ds.map_batches(
        lambda b: _mb_tok_part(b, text_col=text_col, id_col=id_col,
                               n_buckets=n_buckets),
        batch_format="pyarrow").materialize()  # 2 consumers: graph + nb

    cbs = _cbs_pair_graph(docs_ds, max_df=max_df, n_buckets=n_buckets,
                          text_col=text_col, id_col=id_col,
                          exploded=exploded).materialize()

    # per-doc surviving-block counts + per-bucket distinct-block counts,
    # from one token-bucket pass over the same explode
    def nb_part(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "nb": pa.array([], pa.int64()),
                             "bb": pa.array([], pa.int64())})
        vc = g["token"].value_counts()
        ok = vc[(vc >= 2) & (vc <= max_df)].index
        g = g[g["token"].isin(ok)]
        if not len(g):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "nb": pa.array([], pa.int64()),
                             "bb": pa.array([], pa.int64())})
        per_doc = g.groupby("doc_id", as_index=False).size()
        n_blocks = int(g["token"].nunique())
        bb = np.zeros(len(per_doc), np.int64)
        bb[0] = n_blocks  # bucket-total rides row 0 (summed once below)
        return pa.table({
            "doc_id": pa.array(per_doc["doc_id"].to_numpy(np.int64),
                               pa.int64()),
            "nb": pa.array(per_doc["size"].to_numpy(np.int64), pa.int64()),
            "bb": pa.array(bb, pa.int64())})

    nb_parts = exploded \
        .groupby("_tb").map_groups(nb_part, batch_format="pandas") \
        .materialize()  # consumers: B scalar + nb table

    b_total = int(nb_parts.sum("bb") or 0)
    if b_total == 0:
        return rd.from_arrow(pa.table({"id_a": pa.array([], pa.int64()),
                                       "id_b": pa.array([], pa.int64()),
                                       "w": pa.array([], pa.int64())}))

    nb = nb_parts.groupby("doc_id").aggregate(Sum("nb", alias_name="nb"))
    nb_a = nb.map_batches(
        lambda t: pa.table({"id_a": t.column("doc_id"),
                            "nb_a": t.column("nb")}),
        batch_format="pyarrow")
    nb_b = nb.map_batches(
        lambda t: pa.table({"id_b": t.column("doc_id"),
                            "nb_b": t.column("nb")}),
        batch_format="pyarrow")

    cbs_t = {"id_a": pa.int64(), "id_b": pa.int64(), "w": pa.int64()}
    j1 = bucket_hash_join(cbs, nb_a, on="id_a", n_buckets=n_buckets,
                          left_types=cbs_t,
                          right_types={"id_a": pa.int64(),
                                       "nb_a": pa.int64()})
    j2 = bucket_hash_join(j1, nb_b, on="id_b", n_buckets=n_buckets,
                          left_types={**cbs_t, "nb_a": pa.int64()},
                          right_types={"id_b": pa.int64(),
                                       "nb_b": pa.int64()})

    def ecbs_w(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        bl_a = np.frompyfunc(lambda x: int(x).bit_length(), 1, 1)
        wa = bl_a(b_total // df["nb_a"].to_numpy(np.int64)).astype(np.int64)
        wb = bl_a(b_total // df["nb_b"].to_numpy(np.int64)).astype(np.int64)
        w = df["w"].to_numpy(np.int64) * wa * wb
        return pa.table({
            "id_a": pa.array(df["id_a"].to_numpy(np.int64), pa.int64()),
            "id_b": pa.array(df["id_b"].to_numpy(np.int64), pa.int64()),
            "w": pa.array(w, pa.int64())})

    weights = j2.map_batches(ecbs_w, batch_format="pandas").materialize()

    def scal_part(t: pa.Table) -> pa.Table:
        w = t.column("w").to_numpy(zero_copy_only=False)
        return pa.table({"_one": pa.array([0], pa.int64()),
                         "np_": pa.array([len(w)], pa.int64()),
                         "sw": pa.array([int(w.sum())], pa.int64())})

    sc = weights.map_batches(scal_part, batch_format="pyarrow") \
        .groupby("_one").aggregate(Sum("np_", alias_name="np_"),
                                   Sum("sw", alias_name="sw")).to_pandas()
    n_pairs = int(sc["np_"].iloc[0]) if len(sc) else 0
    sw = int(sc["sw"].iloc[0]) if len(sc) else 0

    def prune(t: pa.Table) -> pa.Table:
        keep = pc.greater_equal(
            pc.multiply(pc.cast(t.column("w"), pa.int64()), n_pairs), sw)
        return t.filter(keep)

    return weights.map_batches(prune, batch_format="pyarrow")


def fs_em_round(cust_ds, *, gap: int = 5, chunk: int = 8192):
    """One EM re-estimation round for the Fellegi–Sunter model (the
    Splink/fastLink expectation-maximization step, determinized): pairs
    scoring at least half the total weight ``thresh = (Σw + 1) // 2``
    under the CURRENT :func:`_fs_weight_pass` weights are taken as
    matches, and per field the round re-estimates the m-probability
    (P(agree | match) = match-agreements / matches) and u-probability
    (P(agree | non-match) = nonmatch-agreements / non-matches) in basis
    points.  One row per field: ``(field, n_pairs, n_agree, n_match,
    n_match_agree, m_bp, u_bp)``; 0-denominators → 10000 (the
    cluster_pair_eval convention).

    Scale shape: the same (nat, id//chunk) kernels as fs_match_scores
    with backward boundary replication; each kernel emits ONE 3-row
    partial (per-field candidate/agree/match/match-agree counts), so
    the driver merges ≤ 3·kernels bounded rows — the EM statistics are
    pure associative sums, no pair ever leaves its kernel.
    """
    import ray.data as rd

    out_schema = {"field": pa.string(), "n_pairs": pa.int64(),
                  "n_agree": pa.int64(), "n_match": pa.int64(),
                  "n_match_agree": pa.int64(), "m_bp": pa.int64(),
                  "u_bp": pa.int64()}
    empty = pa.table({k: pa.array([], t) for k, t in out_schema.items()})

    stats = _fs_em_stats(cust_ds, gap=gap, chunk=chunk)
    if stats is None:
        return rd.from_arrow(empty)
    agg, n_pairs, n_agree, n_match, n_ma, m_bp, u_bp = stats
    return rd.from_arrow(pa.table({
        "field": pa.array(agg["field"], pa.string()),
        "n_pairs": pa.array(n_pairs, pa.int64()),
        "n_agree": pa.array(n_agree, pa.int64()),
        "n_match": pa.array(n_match, pa.int64()),
        "n_match_agree": pa.array(n_ma, pa.int64()),
        "m_bp": pa.array(m_bp.astype(np.int64), pa.int64()),
        "u_bp": pa.array(u_bp.astype(np.int64), pa.int64())}))


def _fs_em_stats(cust_ds, *, gap: int, chunk: int):
    """The shared EM-round statistics pass (fs_em_round /
    fs_decision_zones): one pair pass under the current pooled weights,
    per-field (n_pairs, n_agree, n_match, n_match_agree) sums and the
    re-estimated m/u basis points.  Returns ``None`` on an empty
    corpus, else ``(agg_df, n_pairs, n_agree, n_match, n_match_agree,
    m_bp, u_bp)`` with arrays in field order seg/ten/bal."""
    import pandas as pd

    fields_ds, weights = _fs_weight_pass(cust_ds)
    if weights is None:
        return None
    w_seg, w_ten, w_bal = weights
    thresh = (w_seg + w_ten + w_bal + 1) // 2

    tag = _fs_tag_fn(gap=gap, chunk=chunk)

    part_schema = {"field": pa.string(), "n_pairs": pa.int64(),
                   "n_agree": pa.int64(), "n_match": pa.int64(),
                   "n_match_agree": pa.int64()}

    def em_kernel(g: pd.DataFrame) -> pa.Table:
        kempty = pa.table({k: pa.array([], t)
                           for k, t in part_schema.items()})
        enum = _fs_enum_pairs(g, gap=gap)
        if enum is None:
            return kempty
        g, li, ri = enum
        tot = len(li)
        seg = pd.factorize(g["seg"])[0]
        ten = pd.factorize(g["ten"])[0]
        bal = g["bal"].to_numpy(np.int64)
        eqs = {"seg": seg[li] == seg[ri], "ten": ten[li] == ten[ri],
               "bal": bal[li] == bal[ri]}
        sc = (w_seg * eqs["seg"].astype(np.int64)
              + w_ten * eqs["ten"].astype(np.int64)
              + w_bal * eqs["bal"].astype(np.int64))
        match = sc >= thresh
        return pa.table({
            "field": pa.array(list(eqs), pa.string()),
            "n_pairs": pa.array([tot] * 3, pa.int64()),
            "n_agree": pa.array([int(e.sum()) for e in eqs.values()],
                                pa.int64()),
            "n_match": pa.array([int(match.sum())] * 3, pa.int64()),
            "n_match_agree": pa.array(
                [int((e & match).sum()) for e in eqs.values()],
                pa.int64())})

    parts = fields_ds.map_batches(tag, batch_format="pandas") \
        .groupby(["nat", "_cb"]).map_groups(em_kernel,
                                            batch_format="pandas") \
        .to_pandas()
    if parts.empty:
        parts = pd.DataFrame({k: pd.Series(dtype="int64" if t == pa.int64()
                                           else "object")
                              for k, t in part_schema.items()})
    agg = pd.DataFrame({"field": ["seg", "ten", "bal"]}).merge(
        parts.groupby("field", as_index=False).sum(), on="field",
        how="left").fillna(0)
    n_pairs = agg["n_pairs"].to_numpy(np.int64)
    n_agree = agg["n_agree"].to_numpy(np.int64)
    n_match = agg["n_match"].to_numpy(np.int64)
    n_ma = agg["n_match_agree"].to_numpy(np.int64)
    n_non = n_pairs - n_match
    n_na = n_agree - n_ma
    m_bp = np.where(n_match == 0, 10000,
                    n_ma * 10000 // np.maximum(n_match, 1))
    u_bp = np.where(n_non == 0, 10000,
                    n_na * 10000 // np.maximum(n_non, 1))
    return agg, n_pairs, n_agree, n_match, n_ma, m_bp, u_bp


def fs_decision_zones(cust_ds, *, gap: int = 5, chunk: int = 8192,
                      mu_bp: int = 500, lambda_bp: int = 500):
    """The Fellegi–Sunter optimal decision rule (the 1969 paper's core
    theorem): gamma patterns ranked by the likelihood ratio m(γ)/u(γ)
    under the EM-round m/u estimates, then the MATCH zone is the
    largest ratio-descending prefix whose cumulative u-mass stays
    within the false-match budget ``mu_bp`` (of the total u-mass), the
    NON-MATCH zone the largest suffix whose cumulative m-mass stays
    within the false-non-match budget ``lambda_bp``, and the middle is
    the clerical-review POSSIBLE zone (match wins an overlap).  Output:
    8 rows ``(g_seg, g_ten, g_bal, m_num, u_num, rnk, zone)`` — m_num /
    u_num are the pattern's model masses at scale 10⁻¹² (products of
    three per-field basis-point probabilities; they sum to 10¹² over
    the 8 patterns), ``rnk`` the likelihood-ratio rank (exact
    cross-multiplied rational compare, ties → higher agreement code
    first).

    Scale shape: one _fs_em_stats pair pass (kernels emit 3-row
    partials); the zone computation is 8 driver-side rows of exact
    Python-int arithmetic — the SQL twin needs HUGEINT (the rank
    comparator multiplies two 10¹²-scale masses).
    """
    import ray.data as rd

    empty = pa.table({"g_seg": pa.array([], pa.int64()),
                      "g_ten": pa.array([], pa.int64()),
                      "g_bal": pa.array([], pa.int64()),
                      "m_num": pa.array([], pa.int64()),
                      "u_num": pa.array([], pa.int64()),
                      "rnk": pa.array([], pa.int64()),
                      "zone": pa.array([], pa.string())})
    stats = _fs_em_stats(cust_ds, gap=gap, chunk=chunk)
    if stats is None:
        return rd.from_arrow(empty)
    m_bp = [int(x) for x in stats[5]]  # field order seg/ten/bal
    u_bp = [int(x) for x in stats[6]]

    pats = []
    for code in range(8):
        bits = ((code >> 2) & 1, (code >> 1) & 1, code & 1)
        m_g = u_g = 1
        for f in range(3):
            m_g *= m_bp[f] if bits[f] else 10_000 - m_bp[f]
            u_g *= u_bp[f] if bits[f] else 10_000 - u_bp[f]
        pats.append({"bits": bits, "code": code, "m": m_g, "u": u_g})

    # exact likelihood-ratio rank: h outranks g iff m_h·u_g > m_g·u_h
    # (cross-multiplication — zero u means infinite ratio and wins),
    # ties broken by higher agreement code.
    for g in pats:
        g["rnk"] = 1 + sum(
            1 for h in pats if h is not g and (
                h["m"] * g["u"] > g["m"] * h["u"]
                or (h["m"] * g["u"] == g["m"] * h["u"]
                    and h["code"] > g["code"])))
    pats.sort(key=lambda p: p["rnk"])

    total = 10_000 ** 3  # Σ u = Σ m over the 8 patterns, exactly
    mu_budget = mu_bp * (total // 10_000)
    la_budget = lambda_bp * (total // 10_000)
    cum_u = 0
    for p in pats:
        cum_u += p["u"]
        p["match"] = cum_u <= mu_budget
    cum_m = 0
    for p in reversed(pats):
        cum_m += p["m"]
        p["nonmatch"] = cum_m <= la_budget
    for p in pats:
        p["zone"] = ("match" if p["match"]
                     else "nonmatch" if p["nonmatch"] else "possible")

    return rd.from_arrow(pa.table({
        "g_seg": pa.array([p["bits"][0] for p in pats], pa.int64()),
        "g_ten": pa.array([p["bits"][1] for p in pats], pa.int64()),
        "g_bal": pa.array([p["bits"][2] for p in pats], pa.int64()),
        "m_num": pa.array([p["m"] for p in pats], pa.int64()),
        "u_num": pa.array([p["u"] for p in pats], pa.int64()),
        "rnk": pa.array([p["rnk"] for p in pats], pa.int64()),
        "zone": pa.array([p["zone"] for p in pats], pa.string())}))


def fs_pattern_counts(cust_ds, *, gap: int = 5, chunk: int = 8192):
    """Agreement-pattern (gamma) frequency table over the FS candidate
    pairs — the sufficient statistic every Fellegi–Sunter EM fit starts
    from (Splink's ``comparison vector`` counts): one row per observed
    (agree_seg, agree_ten, agree_bal) pattern with its pair count.
    Candidates and fields are exactly :func:`fs_match_scores`'s
    (same-nation, 0 < id gap <= ``gap``); no weights are involved, so
    this is the one FS surface independent of the weight law.
    Output: ``(g_seg, g_ten, g_bal, n_pairs)``, flags 0/1.

    Scale shape: the shared (nat, id//chunk) kernels emit ≤ 8-row
    pattern histograms; the driver merges ≤ 8·kernels bounded rows —
    no pair leaves its kernel, no AllToAll beyond the kernel groupby.
    """
    import pandas as pd
    import ray.data as rd

    empty = pa.table({"g_seg": pa.array([], pa.int64()),
                      "g_ten": pa.array([], pa.int64()),
                      "g_bal": pa.array([], pa.int64()),
                      "n_pairs": pa.array([], pa.int64())})
    tag = _fs_tag_fn(gap=gap, chunk=chunk)

    def gamma_kernel(g: pd.DataFrame) -> pa.Table:
        enum = _fs_enum_pairs(g, gap=gap)
        if enum is None:
            return pa.table({"code": pa.array([], pa.int64()),
                             "n_pairs": pa.array([], pa.int64())})
        g, li, ri = enum
        seg = pd.factorize(g["seg"])[0]
        ten = pd.factorize(g["ten"])[0]
        bal = g["bal"].to_numpy(np.int64)
        code = (4 * (seg[li] == seg[ri]).astype(np.int64)
                + 2 * (ten[li] == ten[ri]).astype(np.int64)
                + (bal[li] == bal[ri]).astype(np.int64))
        v, c = np.unique(code, return_counts=True)
        return pa.table({"code": pa.array(v, pa.int64()),
                         "n_pairs": pa.array(c.astype(np.int64),
                                             pa.int64())})

    hist = _fs_fields(cust_ds).map_batches(tag, batch_format="pandas") \
        .groupby(["nat", "_cb"]).map_groups(gamma_kernel,
                                            batch_format="pandas") \
        .to_pandas()
    if hist.empty:
        return rd.from_arrow(empty)
    hist = hist.groupby("code", as_index=False)["n_pairs"].sum()
    code = hist["code"].to_numpy(np.int64)
    return rd.from_arrow(pa.table({
        "g_seg": pa.array(code // 4 % 2, pa.int64()),
        "g_ten": pa.array(code // 2 % 2, pa.int64()),
        "g_bal": pa.array(code % 2, pa.int64()),
        "n_pairs": pa.array(hist["n_pairs"].to_numpy(np.int64),
                            pa.int64())}))


def fs_tf_scores(cust_ds, *, gap: int = 5, chunk: int = 8192):
    """Term-frequency-ADJUSTED Fellegi–Sunter scores (Splink's ``tf
    adjustment``): agreement on a RARE value outweighs agreement on a
    common one, so instead of the pooled per-field weight the agreement
    weight is per VALUE — ``w_f(v) = bit_length(T // C(n_v, 2))`` where
    ``n_v`` is value v's global count (fallback ``bit_length(T)`` for
    singleton values, matching the pooled law's a_f=0 fallback).
    Candidates, fields and the bit-length law are exactly
    :func:`fs_match_scores`'s.  Output: ``(score, n_pairs)``.

    Scale shape: the per-value weight dicts are value-range bounded
    (5 + 10 + ~12 entries — constants), broadcast in the map closure;
    each row is annotated with ITS OWN values' weights before pairing
    (agreement means both sides share the value, so the left row's
    weight is the pair's weight), then the shared kernels emit bounded
    score histograms.
    """
    import pandas as pd
    import ray.data as rd

    empty = pa.table({"score": pa.array([], pa.int64()),
                      "n_pairs": pa.array([], pa.int64())})
    fields_ds = _fs_fields(cust_ds)
    counts = _fs_value_counts(fields_ds)
    if counts.empty:
        return rd.from_arrow(empty)
    n_total = int(counts.loc[counts["f"] == "seg", "c"].sum())
    t_pairs = n_total * (n_total - 1) // 2
    fallback = t_pairs.bit_length() if t_pairs > 0 else 0
    vw = {}
    for f in _FS_FIELDS:
        sub = counts.loc[counts["f"] == f]
        d = {}
        for v, c in zip(sub["v"], sub["c"]):
            a_v = int(c) * (int(c) - 1) // 2
            d[v] = (t_pairs // a_v).bit_length() if a_v > 0 else fallback
        vw[f] = d

    def annotate(df: pd.DataFrame) -> pd.DataFrame:
        for f in _FS_FIELDS:
            df[f"w_{f}"] = df[f].astype(str).map(vw[f]) \
                .fillna(fallback).astype(np.int64)
        return df

    tag = _fs_tag_fn(gap=gap, chunk=chunk)

    def tf_kernel(g: pd.DataFrame) -> pa.Table:
        enum = _fs_enum_pairs(g, gap=gap)
        if enum is None:
            return empty
        g, li, ri = enum
        seg = pd.factorize(g["seg"])[0]
        ten = pd.factorize(g["ten"])[0]
        bal = g["bal"].to_numpy(np.int64)
        sc = np.zeros(len(li), np.int64)
        for f, eq in (("seg", seg[li] == seg[ri]),
                      ("ten", ten[li] == ten[ri]),
                      ("bal", bal[li] == bal[ri])):
            sc += np.where(eq, g[f"w_{f}"].to_numpy(np.int64)[li], 0)
        v, c = np.unique(sc, return_counts=True)
        return pa.table({"score": pa.array(v, pa.int64()),
                         "n_pairs": pa.array(c.astype(np.int64),
                                             pa.int64())})

    hist = fields_ds.map_batches(annotate, batch_format="pandas") \
        .map_batches(tag, batch_format="pandas") \
        .groupby(["nat", "_cb"]).map_groups(tf_kernel,
                                            batch_format="pandas") \
        .to_pandas()
    if hist.empty:
        return rd.from_arrow(empty)
    hist = hist.groupby("score", as_index=False)["n_pairs"].sum()
    return rd.from_arrow(pa.table({
        "score": pa.array(hist["score"].to_numpy(np.int64), pa.int64()),
        "n_pairs": pa.array(hist["n_pairs"].to_numpy(np.int64),
                            pa.int64())}))


def cluster_bcubed(cc_ds, docs_ds, *, id_col: str = "doc_id",
                   cluster_col: str = "cluster_id",
                   text_col: str = "text", n_buckets: int = 128,
                   cc_types: dict | None = None):
    """B-cubed evaluation of an entity clustering against the exact-dup
    fingerprint truth (Bagga & Baldwin 1998) — the per-RECORD-averaged
    counterpart of :func:`cluster_pair_eval`'s pairwise metric (B³ does
    not let one giant cluster dominate the score the way pair counting
    does): for each record, precision = (same-cluster records sharing
    its fingerprint) / cluster size and recall = the same over its
    fingerprint group; scores are the record averages.  Integer law:
    per-record basis points floor FIRST (``k·10⁴ // size``), then the
    average floors the sum (``Σ // n``) — one row ``(n_docs,
    bcubed_p_bp, bcubed_r_bp, bcubed_f_bp)``; an empty corpus scores
    10000/10000 (the 0/0 convention).

    Scale shape: the shared ``_cluster_fp_cells`` table (one id join +
    one narrow aggregate); every record of a (cluster, fp) cell has the
    SAME per-record score, so B³ needs only cell counts × margins: two
    narrow bucket passes over the count table (cluster-hash, then
    fp-hash — in-bucket margin sums are global) each emit one scalar
    partial per bucket.  No record-level table is ever rebuilt.
    """
    import pandas as pd
    import ray.data as rd

    cf = _cluster_fp_cells(cc_ds, docs_ds, id_col=id_col,
                           cluster_col=cluster_col, text_col=text_col,
                           n_buckets=n_buckets, cc_types=cc_types)

    def _margin_sum(key: str):
        def tag(df: pd.DataFrame) -> pd.DataFrame:
            return df.assign(_mb=bucket_hash(df[key], n_buckets))

        def in_bucket(g: pd.DataFrame) -> pa.Table:
            if not len(g):
                return pa.table({"s": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            size = g.groupby(key)["c"].transform("sum") \
                .to_numpy(np.int64)
            k = g["c"].to_numpy(np.int64)
            return pa.table({
                "s": pa.array([int((k * (k * 10000 // size)).sum())],
                              pa.int64()),
                "n": pa.array([int(k.sum())], pa.int64())})

        return cf.map_batches(tag, batch_format="pandas") \
            .groupby("_mb").map_groups(in_bucket,
                                       batch_format="pandas").to_pandas()

    prec = _margin_sum(cluster_col)
    rec = _margin_sum("fingerprint")
    n = int(prec["n"].sum()) if len(prec) else 0
    if n == 0:
        p_bp = r_bp = f_bp = 10000
    else:
        p_bp = int(prec["s"].sum()) // n
        r_bp = int(rec["s"].sum()) // n
        f_bp = (2 * p_bp * r_bp // (p_bp + r_bp)
                if p_bp + r_bp > 0 else 0)
    return rd.from_arrow(pa.table({
        "n_docs": pa.array([n], pa.int64()),
        "bcubed_p_bp": pa.array([p_bp], pa.int64()),
        "bcubed_r_bp": pa.array([r_bp], pa.int64()),
        "bcubed_f_bp": pa.array([f_bp], pa.int64())}))


def cluster_purity(cc_ds, docs_ds, *, id_col: str = "doc_id",
                   cluster_col: str = "cluster_id",
                   text_col: str = "text", n_buckets: int = 128,
                   cc_types: dict | None = None):
    """Purity / inverse purity of an entity clustering against the
    exact-dup fingerprint truth (Zhao & Karypis 2001) — the
    majority-label metric beside pairwise F1, ARI and B³: purity
    assigns each predicted cluster its modal fingerprint and scores the
    fraction of records so explained (``Σ_c max_f n(c,f) / N``);
    inverse purity swaps the roles (how concentrated each truth group
    is in one cluster).  Exact integer law: the hit counts are emitted
    raw, basis points floor (``hits·10⁴ // n``), the harmonic F floors
    from the floored bps; an empty corpus scores 10000/10000 (the 0/0
    convention shared with :func:`cluster_bcubed`).  Output one row
    ``(n_docs, purity_hits, inverse_hits, purity_bp, inverse_bp,
    purity_f_bp)``.

    Scale shape: identical to B³ — the shared ``_cluster_fp_cells``
    table, then one narrow bucket pass per margin (cluster-hash /
    fp-hash) whose in-bucket groupby MAX is global because the margin
    key is co-located; each bucket emits one scalar partial.  No
    record-level table is rebuilt, and the majority label itself is
    never materialized (the metric needs only the max count).
    """
    import pandas as pd
    import ray.data as rd

    cf = _cluster_fp_cells(cc_ds, docs_ds, id_col=id_col,
                           cluster_col=cluster_col, text_col=text_col,
                           n_buckets=n_buckets, cc_types=cc_types)

    def _majority_sum(key: str):
        def tag(df: pd.DataFrame) -> pd.DataFrame:
            return df.assign(_mb=bucket_hash(df[key], n_buckets))

        def in_bucket(g: pd.DataFrame) -> pa.Table:
            if not len(g):
                return pa.table({"hits": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            mx = g.groupby(key)["c"].max().to_numpy(np.int64)
            return pa.table({
                "hits": pa.array([int(mx.sum())], pa.int64()),
                "n": pa.array([int(g["c"].to_numpy(np.int64).sum())],
                              pa.int64())})

        return cf.map_batches(tag, batch_format="pandas") \
            .groupby("_mb").map_groups(in_bucket,
                                       batch_format="pandas").to_pandas()

    pur = _majority_sum(cluster_col)
    inv = _majority_sum("fingerprint")
    n = int(pur["n"].sum()) if len(pur) else 0
    p_hits = int(pur["hits"].sum()) if len(pur) else 0
    i_hits = int(inv["hits"].sum()) if len(inv) else 0
    if n == 0:
        p_bp = i_bp = 10000
    else:
        p_bp = p_hits * 10000 // n
        i_bp = i_hits * 10000 // n
    f_bp = 2 * p_bp * i_bp // (p_bp + i_bp) if p_bp + i_bp > 0 else 0
    return rd.from_arrow(pa.table({
        "n_docs": pa.array([n], pa.int64()),
        "purity_hits": pa.array([p_hits], pa.int64()),
        "inverse_hits": pa.array([i_hits], pa.int64()),
        "purity_bp": pa.array([p_bp], pa.int64()),
        "inverse_bp": pa.array([i_bp], pa.int64()),
        "purity_f_bp": pa.array([f_bp], pa.int64())}))


def pair_review_sample(docs_ds, *, rate_bp: int = 500, n: int = 3,
                       tau100: int = 10, max_df: int = 100,
                       text_col: str = "text", id_col: str = "doc_id"):
    """Deterministic clerical-review sample of the candidate pair set
    (the ER practice of auditing a fixed fraction of matcher output by
    hand): keep a near-dup candidate pair iff ``md5_low64('l:r') mod
    10⁴ < rate_bp`` — a content-free, order-free, rerun-stable coin so
    the SAME pairs are sampled on every run, shard layout, and engine
    (the md5-low64 law shared with MinHash/_hash_shingles_u64).
    Candidates are :func:`~.dedup.ngram_jaccard_pairs` at ``tau100``;
    output is the pair schema plus ``jac_bp``.

    Scale shape: the sample test is a per-batch map (no shuffle beyond
    the candidate machinery); the coin depends only on the id pair, so
    resampling after a resume or repartition keeps the audit set
    byte-stable.
    """
    from .dedup import _hash_shingles_u64, ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(docs_ds, n=n, tau100=tau100,
                                max_df=max_df, text_col=text_col,
                                id_col=id_col)

    def sample(t: pa.Table) -> pa.Table:
        l = t.column("left_id").to_numpy(zero_copy_only=False)
        r = t.column("right_id").to_numpy(zero_copy_only=False)
        keys = [f"{a}:{b}" for a, b in zip(l, r)]
        h = _hash_shingles_u64(keys) % np.uint64(10000)
        keep = h < np.uint64(rate_bp)
        inter = t.column("inter").to_numpy(zero_copy_only=False)
        union = (t.column("n_left").to_numpy(zero_copy_only=False)
                 + t.column("n_right").to_numpy(zero_copy_only=False)
                 - inter)
        jb = inter * 10000 // union
        out = t.append_column("jac_bp", pa.array(jb, pa.int64()))
        return out.filter(pa.array(keep))

    return pairs.map_batches(sample, batch_format="pyarrow")


def _fp_truth_total(docs_ds, *, text_col: str, id_col: str) -> int:
    """Σ C(n,2) over exact-dup fingerprint groups — the shared truth
    denominator of the blocking evals (blocking_quality law): per-batch
    fp count partials, one narrow groupby, one scalar out."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from .textstats import fingerprint_batch

    def fp_part(batch: pa.Table) -> pa.Table:
        fp = fingerprint_batch(batch, text_col=text_col, id_col=id_col) \
            .column("fingerprint").combine_chunks()
        vc = fp.value_counts()
        return pa.table({"fp": vc.field("values"),
                         "c": pc.cast(vc.field("counts"), pa.int64())})

    def pair_part(df: pd.DataFrame) -> pa.Table:
        c = df["c"].to_numpy(np.int64)
        return pa.table({"_one": pa.array([0], pa.int64()),
                         "t": pa.array([int((c * (c - 1) // 2).sum())],
                                       pa.int64())})

    truth = docs_ds.map_batches(fp_part, batch_format="pyarrow") \
        .groupby("fp").aggregate(Sum("c", alias_name="c")) \
        .map_batches(pair_part, batch_format="pandas") \
        .groupby("_one").aggregate(Sum("t", alias_name="t")).to_pandas()
    return int(truth["t"].iloc[0]) if len(truth) else 0


def snm_window_sweep(docs_ds, *, windows=(1, 2, 3, 5, 10),
                     key_len: int = 16, prefix_len: int = 2,
                     chunk: int = 4096, text_col: str = "text",
                     id_col: str = "doc_id"):
    """Window-size sweep for sorted-neighborhood blocking: at each ``w``
    in ``windows``, report ``(window, n_cand, n_hit, recall_bp)`` — the
    SNM operating-point curve (candidates grow ~linearly with the
    window; recall saturates once the window spans each duplicate run),
    the SNM sibling of :func:`blocking_budget_sweep`.  Laws are exactly
    :func:`snm_recall`'s at each window; fixed ``len(windows)``-row
    shape; 0-truth → 10000.

    Scale shape: ONE rank pass with boundary replication sized to
    ``max(windows)`` serves every window (rank-gap candidates at
    distance d are counted once and cumulated per window on the
    driver); the fingerprint rides the chunks as payload, so hits
    count in-chunk; the truth total is the shared
    :func:`_fp_truth_total` scalar.
    """
    import pandas as pd
    import ray.data as rd

    windows = sorted(int(w) for w in windows)
    maxw = windows[-1]

    from .textstats import fingerprint_batch

    def fp_payload(batch: pa.Table) -> pa.Array:
        col = fingerprint_batch(batch, text_col=text_col, id_col=id_col) \
            .column("fingerprint")
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col

    chunks = _snm_ranked_chunks(docs_ds, window=maxw, key_len=key_len,
                                prefix_len=prefix_len, chunk=chunk,
                                text_col=text_col, id_col=id_col,
                                payload_fn=fp_payload)

    def gap_chunk(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return pa.table({"d": pa.array([], pa.int64()),
                             "n_cand": pa.array([], pa.int64()),
                             "n_hit": pa.array([], pa.int64())})
        g = g.sort_values("rn", kind="mergesort")
        rn = g["rn"].to_numpy(np.int64)
        fp = g["pl"].to_numpy()
        pri = g["_pri"].to_numpy(bool)
        prn = rn[pri]
        pfp = fp[pri]
        rows = []
        for d in range(1, maxw + 1):
            j = np.searchsorted(rn, prn + d)
            ok = j < len(rn)
            ok[ok] = rn[j[ok]] == prn[ok] + d
            rows.append((d, int(ok.sum()),
                         int((pfp[ok] == fp[j[ok]]).sum())))
        return pa.table({
            "d": pa.array([r[0] for r in rows], pa.int64()),
            "n_cand": pa.array([r[1] for r in rows], pa.int64()),
            "n_hit": pa.array([r[2] for r in rows], pa.int64())})

    gaps = chunks.groupby("_cb").map_groups(gap_chunk,
                                            batch_format="pandas") \
        .to_pandas()
    if gaps.empty:
        per_d = pd.DataFrame({"d": range(1, maxw + 1),
                              "n_cand": 0, "n_hit": 0})
    else:
        per_d = gaps.groupby("d", as_index=False)[["n_cand",
                                                   "n_hit"]].sum()
        per_d = pd.DataFrame({"d": range(1, maxw + 1)}).merge(
            per_d, on="d", how="left").fillna(0)

    n_true = _fp_truth_total(docs_ds, text_col=text_col, id_col=id_col)

    cum_c = per_d["n_cand"].to_numpy(np.int64).cumsum()
    cum_h = per_d["n_hit"].to_numpy(np.int64).cumsum()
    n_cand = np.array([cum_c[w - 1] for w in windows], np.int64)
    n_hit = np.array([cum_h[w - 1] for w in windows], np.int64)
    rec = (np.full(len(windows), 10000, np.int64) if n_true == 0
           else n_hit * 10000 // n_true)
    return rd.from_arrow(pa.table({
        "window": pa.array(windows, pa.int64()),
        "n_cand": pa.array(n_cand, pa.int64()),
        "n_hit": pa.array(n_hit, pa.int64()),
        "recall_bp": pa.array(rec.astype(np.int64), pa.int64())}))


# ---------------------------------------------------------------------------
# FastSS deletion-neighborhood edit-distance join (k = 1)
# ---------------------------------------------------------------------------

def _lev_le1(a: str, b: str) -> int:
    """Exact Levenshtein distance capped at 2 for the k=1 join: returns
    0 (equal), 1, or 2 (meaning > 1).  Closed-form for the three k<=1
    shapes — no DP table."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == lb:
        diff = 0
        for x, y in zip(a, b):
            if x != y:
                diff += 1
                if diff > 1:
                    return 2
        return 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if lb - la != 1:
        return 2
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return 1 if a[i:] == b[i + 1:] else 2


def deletion_join_pairs(ds, *, id_col: str = "c_custkey",
                        name_col: str = "c_name", n_buckets: int = 64,
                        pair_buckets: int = 256):
    """FastSS deletion-neighborhood similarity join (Bocek et al. 2007):
    ALL pairs of rows whose names are within Levenshtein distance 1 —
    the exact small-k edit join, by a fundamentally different route than
    :func:`edit_block_pairs`'s blocked DP: each name generates itself
    plus every 1-deletion variant as candidate keys, and two names are
    within distance 1 IFF they share a key (equal names share the self
    key; a substitution pair shares the deletion at the edited position;
    an indel pair's shorter name IS a 1-deletion of the longer).
    Verification is exact (:func:`_lev_le1`), so the key machinery is
    output-invariant: the result equals the full-cross-join law the
    DuckDB oracle runs.  NULL names drop (SQL comparison semantics).
    Output: ``(left_id, right_id, dist)``, left_id < right_id, dist 0/1.

    Scale shape: a record emits len+1 key rows (bounded by the name
    width, not the corpus); key groups are structurally bounded by
    alphabet × positions — EXCEPT the self-key group of an exact-dup
    name cluster, whose C(n,2) dist-0 pairs are genuinely part of the
    law (cap-free by design; run exact_dedup first when exact dups are
    not wanted).  Two narrow shuffles: key-hash buckets (verify inside),
    then pair-hash buckets (global distinct — the same pair can surface
    under every shared key).  ASCII caveat as edit_block_pairs: Python
    codepoint distance == DuckDB byte levenshtein only on ASCII names.
    """
    import pandas as pd

    out_schema = {"left_id": pa.int64(), "right_id": pa.int64(),
                  "dist": pa.int64()}
    empty = pa.table({k: pa.array([], t) for k, t in out_schema.items()})

    def expand(df: pd.DataFrame) -> pa.Table:
        ids_out, keys_out, names_out = [], [], []
        ids = df[id_col].to_numpy(np.int64)
        names = df[name_col]
        for i, name in zip(ids, names):
            if name is None or (isinstance(name, float) and np.isnan(name)):
                continue
            s = str(name)
            ks = {s}
            for p in range(len(s)):
                ks.add(s[:p] + s[p + 1:])
            ids_out += [int(i)] * len(ks)
            keys_out += list(ks)
            names_out += [s] * len(ks)
        t = pa.table({"id": pa.array(ids_out, pa.int64()),
                      "key": pa.array(keys_out, pa.string()),
                      "name": pa.array(names_out, pa.string())})
        b = bucket_hash(pd.Series(keys_out, dtype=object), n_buckets)
        return t.append_column("_b", pa.array(b, pa.int64()))

    vempty = pa.table({**{k: pa.array([], t)
                          for k, t in out_schema.items()},
                       "_pb": pa.array([], pa.int64())})

    def verify(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return vempty
        ls, rs, dist = [], [], []
        for _, kg in g.groupby("key", sort=False):
            if len(kg) < 2:
                continue
            kg = kg.sort_values("id", kind="mergesort") \
                .drop_duplicates("id")
            ids = kg["id"].to_numpy(np.int64)
            nms = list(kg["name"])
            for i in range(len(ids) - 1):
                for j in range(i + 1, len(ids)):
                    d = _lev_le1(nms[i], nms[j])
                    if d <= 1:
                        ls.append(int(ids[i]))
                        rs.append(int(ids[j]))
                        dist.append(d)
        if not ls:
            return vempty
        out = pd.DataFrame({"left_id": ls, "right_id": rs,
                            "dist": dist}).drop_duplicates(
            ["left_id", "right_id"])
        out["_pb"] = pair_bucket(out["left_id"], out["right_id"],
                                 pair_buckets)
        return pa.Table.from_pandas(out, preserve_index=False)

    def distinct(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return empty
        g = g.drop_duplicates(["left_id", "right_id"]) \
            .sort_values(["left_id", "right_id"], kind="mergesort")
        return pa.table({
            "left_id": pa.array(g["left_id"].to_numpy(np.int64),
                                pa.int64()),
            "right_id": pa.array(g["right_id"].to_numpy(np.int64),
                                 pa.int64()),
            "dist": pa.array(g["dist"].to_numpy(np.int64), pa.int64())})

    return ds.map_batches(expand, batch_format="pandas") \
        .groupby("_b").map_groups(verify, batch_format="pandas") \
        .groupby("_pb").map_groups(distinct, batch_format="pandas")


# ---------------------------------------------------------------------------
# cluster consistency audit (survivorship QA)
# ---------------------------------------------------------------------------

def cluster_conflicts(cc_ds, attr_ds, *, id_col: str = "doc_id",
                      cluster_col: str = "cluster_id",
                      attrs: tuple[str, ...] = ("lang", "source"),
                      n_buckets: int = 128, cc_types: dict | None = None):
    """Cluster attribute-consistency audit — the QA pass run before
    trusting a survivorship fusion: per attribute, a histogram of
    clusters by their number of DISTINCT non-null values (``n_values >
    1`` means the closure merged records that disagree — an over-merge
    signal; ``0`` means the attribute is entirely missing in the
    cluster).  Output: ``(attr, n_values, n_clusters)``.

    Scale shape: ONE bucket join attaches attributes to cluster labels;
    batches melt to per-batch-DISTINCT (cluster, attr, value) rows
    (nulls kept — they keep all-null groups alive for the 0 bin), the
    single shuffle buckets by hash(cluster, attr) so each group's
    distinct count is exact in-bucket, and kernels emit (attr,
    n_values) histogram partials — the driver merges ≤ buckets ×
    |attrs| × distinct-sizes bounded rows, never clusters.
    """
    import pandas as pd
    import ray.data as rd

    from .joins import bucket_hash_join

    empty = pa.table({"attr": pa.array([], pa.string()),
                      "n_values": pa.array([], pa.int64()),
                      "n_clusters": pa.array([], pa.int64())})

    if cc_types is None:
        cc_types = {id_col: pa.int64(), cluster_col: pa.int64()}
    right_types = {id_col: pa.int64()}
    right_types.update({a: pa.string() for a in attrs})
    j = bucket_hash_join(cc_ds, attr_ds, on=id_col, n_buckets=n_buckets,
                         left_types=cc_types, right_types=right_types)

    def melt(df: pd.DataFrame) -> pa.Table:
        parts = []
        for a in attrs:
            parts.append(pd.DataFrame({
                cluster_col: df[cluster_col].to_numpy(np.int64),
                "attr": a,
                "val": df[a].astype("string"),
            }))
        out = pd.concat(parts, ignore_index=True) \
            .drop_duplicates([cluster_col, "attr", "val"])
        out["_b"] = bucket_hash(out, n_buckets,
                                keys=[cluster_col, "attr"])
        return pa.table({
            cluster_col: pa.array(out[cluster_col].to_numpy(np.int64),
                                  pa.int64()),
            "attr": pa.array(out["attr"], pa.string()),
            "val": pa.array(out["val"], pa.string()),
            "_b": pa.array(out["_b"].to_numpy(np.int64), pa.int64())})

    def hist_kernel(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return empty
        nv = g.groupby([cluster_col, "attr"])["val"] \
            .nunique().reset_index(name="n_values")
        h = nv.groupby(["attr", "n_values"], as_index=False).size()
        return pa.table({
            "attr": pa.array(h["attr"], pa.string()),
            "n_values": pa.array(h["n_values"].to_numpy(np.int64),
                                 pa.int64()),
            "n_clusters": pa.array(h["size"].to_numpy(np.int64),
                                   pa.int64())})

    parts = j.map_batches(melt, batch_format="pandas") \
        .groupby("_b").map_groups(hist_kernel, batch_format="pandas") \
        .to_pandas()
    if parts.empty:
        return rd.from_arrow(empty)
    h = parts.groupby(["attr", "n_values"], as_index=False)[
        "n_clusters"].sum()
    return rd.from_arrow(pa.table({
        "attr": pa.array(h["attr"], pa.string()),
        "n_values": pa.array(h["n_values"].to_numpy(np.int64),
                             pa.int64()),
        "n_clusters": pa.array(h["n_clusters"].to_numpy(np.int64),
                               pa.int64())}))


# ---------------------------------------------------------------------------
# meta-blocking: weighted node pruning
# ---------------------------------------------------------------------------

def meta_blocking_wnp(docs_ds, *, max_df: int = 100, n_buckets: int = 256,
                      text_col: str = "text", id_col: str = "doc_id"):
    """Meta-blocking with CBS weights and Weighted NODE Pruning (the WNP
    rule of Papadakis et al., TKDE 2014 — the local counterpart of
    :func:`meta_blocking_pairs`' global mean edge pruning): each node
    keeps the incident edges whose weight reaches ITS OWN mean, and an
    edge survives if EITHER endpoint retains it.  Node-local thresholds
    adapt to skew — a hub with many weak edges prunes aggressively while
    a sparse node keeps its best edge even when it is globally weak,
    which is exactly what the global-mean rule gets wrong.  The mean
    tests are integer cross-multiplied (``w · deg_x >= Σw_x``) so the
    DuckDB oracle matches exactly.  Blocks, weights and the df guard are
    EXACTLY :func:`meta_blocking_pairs`' (shared ``_cbs_pair_graph``).
    Output ``(id_a, id_b, w)``.

    Scale shape: the CBS graph is built once (materialized — margin pass
    + two attach joins read it); node margins ``(deg, Σw)`` come from
    per-batch both-direction partials reduced in ONE narrow groupby over
    node ids (two int64 columns, never the pair table); the margins
    attach back through two bucket joins that ship only ``(id, deg,
    sw)`` triples; the OR-test runs vectorized inside the second join's
    buckets.  No stage materializes the corpus or the unpruned graph on
    the driver.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    from .joins import bucket_hash_join

    cbs = _cbs_pair_graph(docs_ds, max_df=max_df, n_buckets=n_buckets,
                          text_col=text_col, id_col=id_col).materialize()

    def margin_part(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy(zero_copy_only=False)
        b = t.column("id_b").to_numpy(zero_copy_only=False)
        w = t.column("w").to_numpy(zero_copy_only=False)
        g = pd.DataFrame({
            "node": np.concatenate([a, b]).astype(np.int64),
            "w": np.concatenate([w, w]).astype(np.int64),
        }).groupby("node", as_index=False).agg(deg=("w", "size"),
                                               sw=("w", "sum"))
        return pa.table({
            "node": pa.array(g["node"].to_numpy(np.int64), pa.int64()),
            "deg": pa.array(g["deg"].to_numpy(np.int64), pa.int64()),
            "sw": pa.array(g["sw"].to_numpy(np.int64), pa.int64())})

    margins = cbs.map_batches(margin_part, batch_format="pyarrow") \
        .groupby("node").aggregate(Sum("deg", alias_name="deg"),
                                   Sum("sw", alias_name="sw"))

    ma = margins.map_batches(
        lambda t: pa.table({"id_a": t.column("node"),
                            "deg_a": t.column("deg"),
                            "sw_a": t.column("sw")}),
        batch_format="pyarrow")
    mb = margins.map_batches(
        lambda t: pa.table({"id_b": t.column("node"),
                            "deg_b": t.column("deg"),
                            "sw_b": t.column("sw")}),
        batch_format="pyarrow")

    cbs_t = {"id_a": pa.int64(), "id_b": pa.int64(), "w": pa.int64()}
    j1 = bucket_hash_join(cbs, ma, on="id_a", n_buckets=n_buckets,
                          left_types=cbs_t,
                          right_types={"id_a": pa.int64(),
                                       "deg_a": pa.int64(),
                                       "sw_a": pa.int64()})
    j2 = bucket_hash_join(j1, mb, on="id_b", n_buckets=n_buckets,
                          left_types={**cbs_t, "deg_a": pa.int64(),
                                      "sw_a": pa.int64()},
                          right_types={"id_b": pa.int64(),
                                       "deg_b": pa.int64(),
                                       "sw_b": pa.int64()})

    def prune(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        w = df["w"].to_numpy(np.int64)
        keep = ((w * df["deg_a"].to_numpy(np.int64)
                 >= df["sw_a"].to_numpy(np.int64))
                | (w * df["deg_b"].to_numpy(np.int64)
                   >= df["sw_b"].to_numpy(np.int64)))
        out = df[keep]
        return pa.table({
            "id_a": pa.array(out["id_a"].to_numpy(np.int64), pa.int64()),
            "id_b": pa.array(out["id_b"].to_numpy(np.int64), pa.int64()),
            "w": pa.array(out["w"].to_numpy(np.int64), pa.int64())})

    return j2.map_batches(prune, batch_format="pandas")


# ---------------------------------------------------------------------------
# progressive (pay-as-you-go) resolution schedule
# ---------------------------------------------------------------------------

def progressive_pairs(docs_ds, *, k: int = 100, max_df: int = 100,
                      n_buckets: int = 256, text_col: str = "text",
                      id_col: str = "doc_id"):
    """Progressive-ER comparison schedule (Whang et al., ICDE 2013 /
    Papenbrock's progressive SNM): the top-``k`` candidate pairs by
    descending CBS weight, ranked — the order in which a budget-bound
    matcher should spend its comparisons, best-first.  Ties break on
    ``(id_a, id_b)`` so the schedule is deterministic.  Blocks, weights
    and the df guard are EXACTLY :func:`meta_blocking_pairs`'
    (shared ``_cbs_pair_graph``).  Output ``(rank, id_a, id_b, w)``
    with rank 1..k.

    Scale shape: per-batch top-``k`` partials over the combined pair
    graph (a global top-k is always contained in the union of per-batch
    top-k's), lexsorted on ``(-w, id_a, id_b)`` — REAL ids, not batch
    positions (blocks aren't id-monotone after the pair shuffle); the
    driver merge sees ≤ blocks·k rows (k is a review budget, ≤ a few
    thousand), the only driver-side table and bounded by construction.
    """
    import pandas as pd
    import ray.data as rd

    cbs = _cbs_pair_graph(docs_ds, max_df=max_df, n_buckets=n_buckets,
                          text_col=text_col, id_col=id_col)

    def topk_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select(["id_a", "id_b", "w"])
        a = t.column("id_a").to_numpy(zero_copy_only=False)
        b = t.column("id_b").to_numpy(zero_copy_only=False)
        w = t.column("w").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a, -w))[:k]
        return pa.table({"id_a": pa.array(a[order], pa.int64()),
                         "id_b": pa.array(b[order], pa.int64()),
                         "w": pa.array(w[order], pa.int64())})

    parts = cbs.map_batches(topk_part, batch_format="pyarrow").to_pandas()
    if len(parts):
        parts = parts.sort_values(
            ["w", "id_a", "id_b"], ascending=[False, True, True],
            kind="mergesort").head(k).reset_index(drop=True)
    return rd.from_arrow(pa.table({
        "rank": pa.array(np.arange(1, len(parts) + 1), pa.int64()),
        "id_a": pa.array(parts["id_a"].to_numpy(np.int64)
                         if len(parts) else [], pa.int64()),
        "id_b": pa.array(parts["id_b"].to_numpy(np.int64)
                         if len(parts) else [], pa.int64()),
        "w": pa.array(parts["w"].to_numpy(np.int64)
                      if len(parts) else [], pa.int64())}))


# ---------------------------------------------------------------------------
# multi-measure set-similarity join
# ---------------------------------------------------------------------------

def containment_keep(docs_ds, *, n: int = 3, tau100: int = 80,
                     max_df: int = 100, text_col: str = "text",
                     id_col: str = "doc_id", n_buckets: int = 128):
    """Near-superset dedup keep law — drop documents that are mostly
    CONTAINED in a bigger one (quote farms, partial mirrors, excerpt
    spam; the asymmetric case exact Jaccard under-scores): doc ``a`` is
    dropped iff some candidate partner ``b`` covers it,
    ``inter·100 ≥ tau100·n_a``, and ``b`` outranks it (more shingles,
    ties → lower id survives).  Candidates, ``inter`` and the df guard
    are EXACTLY :func:`~name_matching_ray.stages.dedup
    .ngram_jaccard_pairs`' (``tau100=0``).  Output ``(doc_id, keep)``
    over ALL docs — shingle-less docs trivially keep (the cross_dedup
    output contract).

    Scale shape: the candidate stream maps to dropped-id partials
    (two directional tests per pair, vectorized); the keep flags come
    from one bucketed SEMI + one ANTI join of the doc-id stream against
    the dropped ids (both ship distinct keys only) — no driver state.
    """
    import pyarrow.compute as _pc

    from .dedup import ngram_jaccard_pairs
    from .joins import bucket_hash_join

    cand = ngram_jaccard_pairs(docs_ds, n=n, tau100=0, max_df=max_df,
                               text_col=text_col, id_col=id_col)

    def dropped(t: pa.Table) -> pa.Table:
        inter = t.column("inter").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nl = t.column("n_left").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nr = t.column("n_right").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        li = t.column("left_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ri = t.column("right_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # left_id < right_id by construction: on equal sizes the LOWER
        # id survives, so a tie can only drop the right side
        drop_l = (inter * 100 >= tau100 * nl) & (nr > nl)
        drop_r = (inter * 100 >= tau100 * nr) & (nl >= nr)
        ids = np.concatenate([li[drop_l], ri[drop_r]])
        return pa.table({id_col: pa.array(np.unique(ids), pa.int64())})

    drp = cand.map_batches(dropped, batch_format="pyarrow")
    ids = docs_ds.map_batches(
        lambda t: t.select([id_col]), batch_format="pyarrow")

    kept = bucket_hash_join(
        ids, drp, on=id_col, how="anti", n_buckets=n_buckets,
        left_types={id_col: pa.int64()},
        right_types={id_col: pa.int64()}) \
        .map_batches(lambda t: t.append_column(
            "keep", pa.array(np.ones(t.num_rows, np.int64), pa.int64())),
            batch_format="pyarrow")
    gone = bucket_hash_join(
        ids, drp, on=id_col, how="semi", n_buckets=n_buckets,
        left_types={id_col: pa.int64()},
        right_types={id_col: pa.int64()}) \
        .map_batches(lambda t: t.append_column(
            "keep", pa.array(np.zeros(t.num_rows, np.int64), pa.int64())),
            batch_format="pyarrow")
    return kept.union(gone)


def setsim_measures(docs_ds, *, n: int = 3, tau_bp: int = 5000,
                    max_df: int = 100, text_col: str = "text",
                    id_col: str = "doc_id"):
    """Multi-measure set-similarity join over word ``n``-gram shingle
    sets: for every candidate pair, the three standard set coefficients
    side by side — Jaccard ``|∩|/|∪|``, Dice ``2|∩|/(|a|+|b|)`` and
    containment/overlap ``|∩|/min(|a|,|b|)`` — in floor basis points.
    Pairs are kept when the CONTAINMENT reaches ``tau_bp`` (containment
    ≥ dice ≥ jaccard pointwise, so the filter is the loosest of the
    three and every surviving pair carries all measures for the
    downstream threshold choice — the measure-comparison table every ER
    survey builds).  Candidates, ``inter`` and the df guard are EXACTLY
    :func:`~name_matching_ray.stages.dedup.ngram_jaccard_pairs`'
    (``tau100=0``: every co-occurring pair reaches the measure pass).

    Scale shape: inherits the inverted-index + stop-shingle-cap +
    pair-bucket pre-combine plan of ngram_jaccard_pairs; the measure
    arithmetic is one vectorized Arrow pass per block.  Integer law:
    bps floor via int64 ``//``; shingle counts are corpus-bounded so
    ``inter·10⁴`` cannot overflow.
    """
    from .dedup import ngram_jaccard_pairs

    cand = ngram_jaccard_pairs(docs_ds, n=n, tau100=0, max_df=max_df,
                               text_col=text_col, id_col=id_col)

    def measures(t: pa.Table) -> pa.Table:
        inter = t.column("inter").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nl = t.column("n_left").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nr = t.column("n_right").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        union = nl + nr - inter
        mn = np.minimum(nl, nr)
        jac = np.where(union > 0, inter * 10_000 // np.maximum(union, 1), 0)
        dice = np.where(nl + nr > 0,
                        2 * inter * 10_000 // np.maximum(nl + nr, 1), 0)
        cont = np.where(mn > 0, inter * 10_000 // np.maximum(mn, 1), 0)
        keep = cont >= tau_bp
        return pa.table({
            "left_id": pa.array(t.column("left_id").to_numpy(
                zero_copy_only=False)[keep], pa.int64()),
            "right_id": pa.array(t.column("right_id").to_numpy(
                zero_copy_only=False)[keep], pa.int64()),
            "inter": pa.array(inter[keep], pa.int64()),
            "n_left": pa.array(nl[keep], pa.int64()),
            "n_right": pa.array(nr[keep], pa.int64()),
            "jaccard_bp": pa.array(jac[keep], pa.int64()),
            "dice_bp": pa.array(dice[keep], pa.int64()),
            "containment_bp": pa.array(cont[keep], pa.int64())})

    return cand.map_batches(measures, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# meta-blocking: cardinality node pruning
# ---------------------------------------------------------------------------

def meta_blocking_cnp(docs_ds, *, k: int = 2, max_df: int = 100,
                      n_buckets: int = 256, text_col: str = "text",
                      id_col: str = "doc_id"):
    """Meta-blocking with Cardinality Node Pruning (the CNP rule of
    Papadakis et al., TKDE 2014 — the budget-bound member of the family
    beside :func:`meta_blocking_pairs`' global mean and
    :func:`meta_blocking_wnp`'s node mean): every node retains only its
    top-``k`` incident edges by weight, and an edge survives if EITHER
    endpoint retains it — so the output size is bounded by ``k·|nodes|``
    regardless of weight distribution, the property the weight-threshold
    rules can't give.  Edge order is total — ``(w DESC, id_a, id_b)`` —
    so retention is deterministic and the DuckDB ROW_NUMBER oracle
    matches exactly.  Blocks, weights and the df guard are EXACTLY
    :func:`meta_blocking_pairs`' (shared ``_cbs_pair_graph``).  Output
    ``(id_a, id_b, w)``.

    Scale shape: the CBS edges explode to both endpoints with a
    node-hash bucket tag; each bucket holds whole node groups, so the
    per-node top-k is one vectorized sort + cumcount over the bucket
    (never a per-key map_groups); the two-sided survivors dedup in
    pair-hash buckets.  Two narrow shuffles after the shared graph,
    both over (node/pair hash, 3 int64 columns).
    """
    import pandas as pd

    cbs = _cbs_pair_graph(docs_ds, max_df=max_df, n_buckets=n_buckets,
                          text_col=text_col, id_col=id_col)

    def explode(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = t.column("id_b").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        w = t.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
        node = np.concatenate([a, b])
        return pa.table({
            "node": pa.array(node, pa.int64()),
            "id_a": pa.array(np.concatenate([a, a]), pa.int64()),
            "id_b": pa.array(np.concatenate([b, b]), pa.int64()),
            "w": pa.array(np.concatenate([w, w]), pa.int64()),
            "_nb": pa.array(bucket_hash(pd.Series(node), n_buckets),
                            pa.int64())})

    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "w": pa.array([], pa.int64()),
                      "_pb": pa.array([], pa.int64())})

    def node_topk(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return empty
        g = g.sort_values(["node", "w", "id_a", "id_b"],
                          ascending=[True, False, True, True],
                          kind="mergesort")
        keep = g.groupby("node").cumcount() < k
        out = g[keep]
        a = out["id_a"].to_numpy(np.int64)
        b = out["id_b"].to_numpy(np.int64)
        return pa.table({
            "id_a": pa.array(a, pa.int64()),
            "id_b": pa.array(b, pa.int64()),
            "w": pa.array(out["w"].to_numpy(np.int64), pa.int64()),
            "_pb": pa.array(pair_bucket(a, b, n_buckets), pa.int64())})

    def pair_dedup(g: pd.DataFrame) -> pa.Table:
        out = g.drop_duplicates(["id_a", "id_b"])
        return pa.table({
            "id_a": pa.array(out["id_a"].to_numpy(np.int64), pa.int64()),
            "id_b": pa.array(out["id_b"].to_numpy(np.int64), pa.int64()),
            "w": pa.array(out["w"].to_numpy(np.int64), pa.int64())})

    return cbs.map_batches(explode, batch_format="pyarrow") \
        .groupby("_nb").map_groups(node_topk, batch_format="pandas") \
        .groupby("_pb").map_groups(pair_dedup, batch_format="pandas")


# ---------------------------------------------------------------------------
# Monge-Elkan hybrid token similarity over near-dup candidates
# ---------------------------------------------------------------------------

def _attach_candidate_texts(docs_ds, *, tau100: int, max_df: int,
                            n_buckets: int, text_col: str, id_col: str):
    """Shared ME / pair-features front half: ngram_jaccard candidates at
    ``tau100`` travel ids-only, then both texts attach via two bucket
    joins (the lean-MinHash pattern).  Returns a dataset with
    ``(left_id, right_id, _t_left_id, _t_right_id)``."""
    import pandas as pd

    from .dedup import ngram_jaccard_pairs
    from .joins import bucket_hash_join

    cand = ngram_jaccard_pairs(docs_ds, n=3, tau100=tau100, max_df=max_df,
                               text_col=text_col, id_col=id_col) \
        .map_batches(lambda t: t.select(["left_id", "right_id"]),
                     batch_format="pyarrow")

    def txt(col):
        def f(df: pd.DataFrame) -> pa.Table:
            return pa.table({
                col: pa.array(df[id_col].to_numpy(np.int64), pa.int64()),
                f"_t_{col}": pa.array(
                    df[text_col].fillna("").astype(str), pa.string())})
        return f

    ta = docs_ds.map_batches(txt("left_id"), batch_format="pandas")
    tb = docs_ds.map_batches(txt("right_id"), batch_format="pandas")

    j1 = bucket_hash_join(
        cand, ta, on="left_id", n_buckets=n_buckets,
        left_types={"left_id": pa.int64(), "right_id": pa.int64()},
        right_types={"left_id": pa.int64(), "_t_left_id": pa.string()})
    return bucket_hash_join(
        j1, tb, on="right_id", n_buckets=n_buckets,
        left_types={"left_id": pa.int64(), "right_id": pa.int64(),
                    "_t_left_id": pa.string()},
        right_types={"right_id": pa.int64(), "_t_right_id": pa.string()})


def _edit_ratio_fn():
    """Memoized integer token edit ratio ``100·(max_len − lev) //
    max_len`` — DuckDB's byte-law levenshtein on ASCII tokens.  One memo
    per batch; the corpus vocabulary is closed, so the memo collapses
    repeated alignments to dictionary hits."""
    memo: dict = {}

    def ratio(t1: str, t2: str) -> int:
        key = (t1, t2)
        r = memo.get(key)
        if r is None:
            mx = max(len(t1), len(t2))
            r = 100 * (mx - _levenshtein(t1, t2, mx)) // mx
            memo[key] = r
        return r

    return ratio


def _me_mean(toks_a, toks_b, ratio) -> int:
    """ME(A→B) in floor bp: mean over A's tokens of the best inner
    ratio against B (``Σbest·100 // |A|``)."""
    s = 0
    for t1 in toks_a:
        best = 0
        for t2 in toks_b:
            r = ratio(t1, t2)
            if r > best:
                best = r
                if best == 100:
                    break
        s += best
    return s * 100 // len(toks_a)


def monge_elkan_pairs(docs_ds, *, tau100: int = 50, max_df: int = 100,
                      n_buckets: int = 64, text_col: str = "text",
                      id_col: str = "doc_id"):
    """Monge–Elkan hybrid similarity (Monge & Elkan 1996) for near-dup
    candidate pairs: ``ME(A→B) = mean over A's DISTINCT tokens of the
    best inner similarity against B's tokens``, with the inner measure
    the integer edit ratio ``100·(max_len − lev) // max_len`` —
    token-level alignment instead of whole-string distance, the measure
    of record for multi-word names.  Both directions are reported (ME is
    asymmetric).  Integer law end to end: inner ratio floors at 100,
    the mean floors at bp (``Σbest·100 // |A|``), and the inner
    Levenshtein is DuckDB's byte law (the corpus is ASCII; same caveat
    as ``edit_block_pairs``).  Candidates are EXACTLY
    :func:`~name_matching_ray.stages.dedup.ngram_jaccard_pairs` at
    ``tau100`` — the already-near set, so the quadratic token alignment
    runs on a linear-in-dups pair count, never the corpus.  Output
    ``(left_id, right_id, me_lr_bp, me_rl_bp)``.

    Scale shape: candidates travel ids-only; the two texts attach via
    two bucket joins (the lean-MinHash pattern); scoring is in-bucket
    with a per-batch (t1, t2) inner-ratio memo — the corpus vocabulary
    is closed, so the memo collapses the alignment to dictionary hits.
    """
    import pandas as pd

    j2 = _attach_candidate_texts(docs_ds, tau100=tau100, max_df=max_df,
                                 n_buckets=n_buckets, text_col=text_col,
                                 id_col=id_col)

    def score(df: pd.DataFrame) -> pa.Table:
        ratio = _edit_ratio_fn()
        lr = np.empty(len(df), np.int64)
        rl = np.empty(len(df), np.int64)
        for i, (xa, xb) in enumerate(zip(df["_t_left_id"],
                                         df["_t_right_id"])):
            a = sorted(set(xa.split()))
            b = sorted(set(xb.split()))
            lr[i] = _me_mean(a, b, ratio)
            rl[i] = _me_mean(b, a, ratio)
        return pa.table({
            "left_id": pa.array(df["left_id"].to_numpy(np.int64),
                                pa.int64()),
            "right_id": pa.array(df["right_id"].to_numpy(np.int64),
                                 pa.int64()),
            "me_lr_bp": pa.array(lr, pa.int64()),
            "me_rl_bp": pa.array(rl, pa.int64())})

    return j2.map_batches(score, batch_format="pandas")


def pair_features(docs_ds, *, tau100: int = 50, max_df: int = 100,
                  n_buckets: int = 64, text_col: str = "text",
                  id_col: str = "doc_id"):
    """Per-pair feature-vector export for a learned matcher (the
    Magellan/dedupe.io feature table): for every tau-``tau100`` shingle
    candidate pair, the standard integer similarity features side by
    side — distinct-token Jaccard (bp), Monge–Elkan both directions
    (bp, the :func:`monge_elkan_pairs` law), Levenshtein of the FIRST
    tokens, and the distinct-token-count difference.  Output
    ``(left_id, right_id, tok_jaccard_bp, me_lr_bp, me_rl_bp,
    first_lev, len_diff)`` — the training/scoring input a downstream
    classifier consumes, one row per candidate.

    Scale shape: EXACTLY the ME plan — ids-only candidates, two bucket
    text-attach joins (shared ``_attach_candidate_texts``), all
    features computed in one in-bucket pass over the attached texts
    with the shared edit-ratio memo.  Adding a feature never adds a
    shuffle.
    """
    import pandas as pd

    j2 = _attach_candidate_texts(docs_ds, tau100=tau100, max_df=max_df,
                                 n_buckets=n_buckets, text_col=text_col,
                                 id_col=id_col)

    def score(df: pd.DataFrame) -> pa.Table:
        ratio = _edit_ratio_fn()
        n = len(df)
        tj = np.empty(n, np.int64)
        lr = np.empty(n, np.int64)
        rl = np.empty(n, np.int64)
        fl = np.empty(n, np.int64)
        ld = np.empty(n, np.int64)
        for i, (xa, xb) in enumerate(zip(df["_t_left_id"],
                                         df["_t_right_id"])):
            ta, tb = xa.split(), xb.split()
            a, b = set(ta), set(tb)
            inter = len(a & b)
            tj[i] = inter * 10_000 // (len(a) + len(b) - inter)
            sa, sb = sorted(a), sorted(b)
            lr[i] = _me_mean(sa, sb, ratio)
            rl[i] = _me_mean(sb, sa, ratio)
            fa, fb = ta[0], tb[0]
            fl[i] = _levenshtein(fa, fb, max(len(fa), len(fb)))
            ld[i] = abs(len(a) - len(b))
        return pa.table({
            "left_id": pa.array(df["left_id"].to_numpy(np.int64),
                                pa.int64()),
            "right_id": pa.array(df["right_id"].to_numpy(np.int64),
                                 pa.int64()),
            "tok_jaccard_bp": pa.array(tj, pa.int64()),
            "me_lr_bp": pa.array(lr, pa.int64()),
            "me_rl_bp": pa.array(rl, pa.int64()),
            "first_lev": pa.array(fl, pa.int64()),
            "len_diff": pa.array(ld, pa.int64())})

    return j2.map_batches(score, batch_format="pandas")


# ---------------------------------------------------------------------------
# two-hop candidate expansion over the blocking graph
# ---------------------------------------------------------------------------

def two_hop_pairs(docs_ds, *, max_deg: int = 30, max_df: int = 100,
                  n_buckets: int = 256, text_col: str = "text",
                  id_col: str = "doc_id"):
    """Two-hop candidate expansion (the iterative-blocking recall move):
    pairs NOT directly co-blocked but sharing a common CBS neighbor —
    ``(a, c)`` with edges ``(a, m)`` and ``(m, c)`` — weighted by the
    number of distinct witnesses ``m``.  Hub middles with degree >
    ``max_deg`` are excluded as witnesses entirely (the stop-key law:
    a hub witnesses quadratically many junk pairs; identical ``deg <=
    max_deg`` guard in the SQL twin).  Direct edges are subtracted —
    the output is exactly the NEW candidates a second matching round
    would add.  Blocks, weights and the df guard are
    :func:`meta_blocking_pairs`' (shared ``_cbs_pair_graph``).  Output
    ``(id_a, id_b, paths)``.

    Scale shape: the graph materializes once (witness explode + direct
    side); middles co-locate by node hash, so the in-bucket degree is
    exact and the neighbor-pair fan-out is capped at C(max_deg, 2) per
    node; witness counts and the direct-edge anti-join fuse in ONE
    pair-hash reduce (direct rows ride a flag column — no second
    shuffle for the subtraction).
    """
    import pandas as pd

    cbs = _cbs_pair_graph(docs_ds, max_df=max_df, n_buckets=n_buckets,
                          text_col=text_col, id_col=id_col).materialize()

    def explode_mid(t: pa.Table) -> pa.Table:
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

    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "paths": pa.array([], pa.int64()),
                      "direct": pa.array([], pa.int64()),
                      "_pb": pa.array([], pa.int64())})

    def witness_pairs(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return empty
        deg = g.groupby("m")["nbr"].transform("size")
        g = g[deg <= max_deg]
        if not len(g):
            return empty
        x = g.merge(g, on="m", suffixes=("_a", "_b"))
        x = x[x["nbr_a"] < x["nbr_b"]]
        if not len(x):
            return empty
        agg = x.groupby(["nbr_a", "nbr_b"], as_index=False).size()
        a = agg["nbr_a"].to_numpy(np.int64)
        b = agg["nbr_b"].to_numpy(np.int64)
        return pa.table({
            "id_a": pa.array(a, pa.int64()),
            "id_b": pa.array(b, pa.int64()),
            "paths": pa.array(agg["size"].to_numpy(np.int64), pa.int64()),
            "direct": pa.array(np.zeros(len(a), np.int64), pa.int64()),
            "_pb": pa.array(pair_bucket(a, b, n_buckets), pa.int64())})

    hops = cbs.map_batches(explode_mid, batch_format="pyarrow") \
        .groupby("_mb").map_groups(witness_pairs, batch_format="pandas")

    def direct_rows(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = t.column("id_b").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "id_a": pa.array(a, pa.int64()),
            "id_b": pa.array(b, pa.int64()),
            "paths": pa.array(np.zeros(len(a), np.int64), pa.int64()),
            "direct": pa.array(np.ones(len(a), np.int64), pa.int64()),
            "_pb": pa.array(pair_bucket(a, b, n_buckets), pa.int64())})

    direct = cbs.map_batches(direct_rows, batch_format="pyarrow")

    def reduce_anti(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby(["id_a", "id_b"], as_index=False).agg(
            paths=("paths", "sum"), direct=("direct", "max"))
        out = agg[(agg["direct"] == 0) & (agg["paths"] > 0)]
        return pa.table({
            "id_a": pa.array(out["id_a"].to_numpy(np.int64), pa.int64()),
            "id_b": pa.array(out["id_b"].to_numpy(np.int64), pa.int64()),
            "paths": pa.array(out["paths"].to_numpy(np.int64),
                              pa.int64())})

    # union sums block counts — repartition before the pair reduce
    # (the cross_near_dedup lesson)
    import os
    nb = max(16, 2 * int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    return hops.union(direct).repartition(nb) \
        .groupby("_pb").map_groups(reduce_anti, batch_format="pandas")


# ---------------------------------------------------------------------------
# blocking-rule marginal coverage (Splink-style planner)
# ---------------------------------------------------------------------------

def blocking_rule_coverage(docs_ds, *, max_df: int = 100,
                           n_buckets: int = 256, text_col: str = "text",
                           id_col: str = "doc_id"):
    """Marginal coverage of an ordered blocking-rule stack (the Splink
    ``count_comparisons`` planning table): rule 1 = exact fingerprint,
    rule 2 = shared 4-token shingle, rule 3 = shared 3-token shingle
    (both df ∈ [2, ``max_df``] — the stop-shingle guard).  For each rule:
    ``n_pairs`` (distinct candidate pairs that rule generates alone) and
    ``n_new`` (pairs no EARLIER rule already covers) — the marginal-gain
    curve that tells a linkage engineer when to stop adding rules.
    Fixed 3-row output, zeros on an empty corpus.

    Scale shape: the three pair streams are existing bounded plans
    (fingerprint groups are true-dup-sized; the shingle rules are
    ngram_jaccard_pairs at tau 0, df-capped); they union with a rule
    tag into ONE pair-hash reduce where both counts form as ≤3-row
    partials per bucket — totals and marginals in the same shuffle.
    The union is repartitioned first (block counts SUM under union).
    """
    import os

    import pandas as pd
    import ray.data as rd

    from .dedup import ngram_jaccard_pairs
    from .textstats import fingerprint_batch

    def fp_rows(batch: pa.Table) -> pa.Table:
        t = fingerprint_batch(batch, text_col=text_col, id_col=id_col)
        fp = t.column("fingerprint").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t.column(id_col),
            "fp": t.column("fingerprint"),
            "_fb": pa.array(bucket_hash(pd.Series(fp), n_buckets),
                            pa.int64())})

    def fp_pairs(g: pd.DataFrame) -> pa.Table:
        m = g.merge(g, on="fp", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        return pa.table({
            "left_id": pa.array(m["doc_id_a"].to_numpy(np.int64),
                                pa.int64()),
            "right_id": pa.array(m["doc_id_b"].to_numpy(np.int64),
                                 pa.int64()),
            "rule": pa.array(np.ones(len(m), np.int64), pa.int64())})

    r1 = docs_ds.map_batches(fp_rows, batch_format="pyarrow") \
        .groupby("_fb").map_groups(fp_pairs, batch_format="pandas")

    def tag_rule(r):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table({
                "left_id": t.column("left_id"),
                "right_id": t.column("right_id"),
                "rule": pa.array(np.full(n, r, np.int64), pa.int64())})
        return f

    r2 = ngram_jaccard_pairs(docs_ds, n=4, tau100=0, max_df=max_df,
                             text_col=text_col, id_col=id_col) \
        .map_batches(tag_rule(2), batch_format="pyarrow")
    r3 = ngram_jaccard_pairs(docs_ds, n=3, tau100=0, max_df=max_df,
                             text_col=text_col, id_col=id_col) \
        .map_batches(tag_rule(3), batch_format="pyarrow")

    def pb_tag(t: pa.Table) -> pa.Table:
        a = t.column("left_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = t.column("right_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return t.append_column(
            "_pb", pa.array(pair_bucket(a, b, n_buckets), pa.int64()))

    def reduce_cov(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return pa.table({"rule_id": pa.array([], pa.int64()),
                             "n_pairs": pa.array([], pa.int64()),
                             "n_new": pa.array([], pa.int64())})
        tot = g.groupby("rule")["left_id"].size()
        mn = g.groupby(["left_id", "right_id"])["rule"].min() \
            .value_counts()
        rules = sorted(set(tot.index) | set(mn.index))
        return pa.table({
            "rule_id": pa.array(rules, pa.int64()),
            "n_pairs": pa.array([int(tot.get(r, 0)) for r in rules],
                                pa.int64()),
            "n_new": pa.array([int(mn.get(r, 0)) for r in rules],
                              pa.int64())})

    nb = max(16, 2 * int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    parts = r1.union(r2).union(r3) \
        .map_batches(pb_tag, batch_format="pyarrow") \
        .repartition(nb) \
        .groupby("_pb").map_groups(reduce_cov, batch_format="pandas") \
        .to_pandas()
    agg = parts.groupby("rule_id")[["n_pairs", "n_new"]].sum() \
        if len(parts) else None
    rows = [1, 2, 3]
    return rd.from_arrow(pa.table({
        "rule_id": pa.array(rows, pa.int64()),
        "n_pairs": pa.array(
            [int(agg["n_pairs"].get(r, 0)) if agg is not None else 0
             for r in rows], pa.int64()),
        "n_new": pa.array(
            [int(agg["n_new"].get(r, 0)) if agg is not None else 0
             for r in rows], pa.int64())}))
