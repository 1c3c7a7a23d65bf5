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

from ..util import bucket_hash

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

def snm_pairs(docs_ds, *, window: int = 3, key_len: int = 16,
              prefix_len: int = 2, chunk: int = 4096,
              text_col: str = "text", id_col: str = "doc_id"):
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
    pairs form locally), and pairs form positionally inside each chunk.  No stage materializes the corpus on the driver; the skew
    unit is one prefix group (raise ``prefix_len`` to split hot prefixes).
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    if window >= chunk:
        raise ValueError("window must be < chunk")

    def keyed(batch: pa.Table) -> pa.Table:
        key = pc.utf8_slice_codeunits(_collapse(batch.column(text_col)),
                                      0, key_len)
        return pa.table({
            "doc_id": batch.column(id_col),
            "key": key,
            "pfx": pc.utf8_slice_codeunits(key, 0, prefix_len),
        })

    keyed_ds = docs_ds.map_batches(keyed, batch_format="pyarrow")

    # pass 1: per-prefix counts -> lexicographic cumulative offsets.
    # |prefixes| <= 37^prefix_len (a CONSTANT), so the driver collect is
    # bounded regardless of corpus size.
    def pfx_part(t: pa.Table) -> pa.Table:
        vc = t.column("pfx").combine_chunks().value_counts()
        return pa.table({"pfx": vc.field("values"),
                         "c": pc.cast(vc.field("counts"), pa.int64())})

    counts = keyed_ds.map_batches(pfx_part, batch_format="pyarrow") \
        .groupby("pfx").aggregate(Sum("c", alias_name="c")).to_pandas()
    counts = counts.sort_values("pfx", kind="mergesort")
    offs = np.concatenate([[0], counts["c"].to_numpy(np.int64).cumsum()])
    offset_of = dict(zip(counts["pfx"], offs[:-1]))
    n_total = int(offs[-1])

    # pass 2: rank within each prefix group (one task per prefix — the
    # documented skew unit), local order (key, id) + the prefix offset.
    def rank_group(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "rn": pa.array([], pa.int64())})
        g = g.sort_values(["key", "doc_id"], kind="mergesort")
        base = offset_of[g["pfx"].iloc[0]]
        rn = np.arange(1, len(g) + 1, dtype=np.int64) + base
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy(np.int64), pa.int64()),
            "rn": pa.array(rn, pa.int64()),
        })

    ranked = keyed_ds.groupby("pfx").map_groups(
        rank_group, batch_format="pandas")

    # pass 3: chunked pair formation with boundary replication — a row at
    # rank rn lives in chunk rn//chunk; a primary near a chunk's END needs
    # the next chunk's first ``window`` rows as right partners, so rows at
    # a chunk START are REPLICATED into the PREVIOUS bucket (non-primary).
    def to_chunks(t: pa.Table) -> pa.Table:
        rn = t.column("rn").to_numpy(zero_copy_only=False)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        cb = rn // chunk
        rep = ((rn % chunk) < window) & (rn >= chunk)
        out_rn = np.concatenate([rn, rn[rep]])
        out_id = np.concatenate([ids, ids[rep]])
        out_cb = np.concatenate([cb, cb[rep] - 1])
        # primary rows form pairs; replicas only serve as right partners
        is_primary = np.concatenate(
            [np.ones(len(rn), bool), np.zeros(int(rep.sum()), bool)])
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "rn": pa.array(out_rn, pa.int64()),
            "_cb": pa.array(out_cb, pa.int64()),
            "_pri": pa.array(is_primary, pa.bool_()),
        })

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

    _ = n_total  # (kept for clarity: ranks run 1..n_total)
    return ranked.map_batches(to_chunks, batch_format="pyarrow") \
        .groupby("_cb").map_groups(pair_chunk, batch_format="pandas")


# ---------------------------------------------------------------------------
# blocking-scheme quality vs exact-duplicate truth
# ---------------------------------------------------------------------------

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

    def fk_part(batch: pa.Table) -> pa.Table:
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

    fk = docs_ds.map_batches(fk_part, batch_format="pyarrow") \
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
        n_true = int(tp["n_true_pairs"].iloc[0]) if len(tp) else 0
        n_tc = int(tc["n_true_cand"].iloc[0]) if len(tc) else 0
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


def edit_block_pairs(docs_ds, *, k: int = 2, pfx_chars: int = 24,
                     max_block: int = 64, n_buckets: int = 256,
                     text_col: str = "text", id_col: str = "doc_id"):
    """Edit-distance similarity join inside first-token blocks: candidate
    pairs share the first lowercase ``\\S+`` token, blocks larger than
    ``max_block`` are dropped entirely (the stop-key law — enforced in the
    SQL oracle too), and a pair survives iff
    ``levenshtein(s_a, s_b) <= k`` where ``s`` is the first ``pfx_chars``
    chars of the alnum-collapsed text (pure ASCII, so Python codepoint
    distance == DuckDB's byte distance).  Output ``(id_a, id_b, lev)``
    with ``id_a < id_b``.

    Scale shape: blocks co-locate via coarse ``bucket_hash`` groups (no
    per-key map_groups); work per block is capped at C(max_block, 2)
    banded-Levenshtein calls on ≤ ``pfx_chars``-char strings; the exact
    global block size is known in-bucket because the key is the bucket
    hash input (every row of a block lands in the same bucket).
    """
    import pandas as pd

    def keyed(batch: pa.Table) -> pa.Table:
        key = _first_token(batch.column(text_col))
        s = pc.utf8_slice_codeunits(_collapse(batch.column(text_col)),
                                    0, pfx_chars)
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
                        d = _levenshtein(si, ss[j], k)
                        if d <= k:
                            ia.append(ids[i]); ib.append(ids[j])
                            lv.append(d)
        return pa.table({"id_a": pa.array(ia, pa.int64()),
                         "id_b": pa.array(ib, pa.int64()),
                         "lev": pa.array(lv, pa.int64())})

    return docs_ds.map_batches(keyed, batch_format="pyarrow") \
        .groupby("_ub").map_groups(per_bucket, batch_format="pandas")
