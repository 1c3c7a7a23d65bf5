"""Mergeable sketch operators — HyperLogLog registers and count-min.

The scalable-aggregation shape both operators share: every batch reduces
its tokens to a BOUNDED partial (register maxima / cell counts — size is a
function of the sketch parameters, never of the data), the shuffle moves
only those partials, and the merged sketch is small enough to broadcast.
That is how a 100-TB corpus answers "how many distinct tokens?" / "what
are the heaviest tokens?" without a corpus-wide distinct or a giant sort.

Both sketches are DETERMINISTIC given the hash law (md5-low64, the same
``md5_number_lower`` equivalence minhash_dedup and classifier_select
already rely on), so the full register/cell tables are EXACTLY
SQL-oracled — the approximation is in what the sketch estimates, not in
how it is computed.

No reference counterpart (leoliu0/name_matching has no sketch machinery);
these extend the engine for corpus-scale analytics per the build brief.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..util import default_pool
from .textstats import _explode_tokens

# HLL geometry: h = md5-low64; bucket = h % HLL_BUCKETS (12 bits), the
# remaining v = h // HLL_BUCKETS has 52 bits, so rho(v) = 53 - bit_length(v)
# leading-zeros-plus-one, with rho(0) = 53.  52-bit v is exact in float64,
# which makes the vectorized bit_length (np.frexp exponent) exact too.
HLL_BUCKETS = 4096
_HLL_VBITS = 52

# count-min rows: col_j(x) = (md5low64(x) >> 16*j) % width — four DISJOINT
# 16-bit windows of one md5 word (md5 bits are uniform, so disjoint slices
# are independent hashes).  NOT the seeded (a*x+b) mod 2^64 law minhash
# uses: that law's final "mod width" depends only on the LOW bits of x
# (all rows would collide together), and the 128-bit product overflows
# SQL HUGEINT.  Bit slices are exact integer ops on both sides:
# numpy ``(h >> 16j) % w`` == DuckDB ``hv // {65536^j} % w`` on UBIGINT.
CMS_DEPTH = 4
CMS_WIDTH = 1024


def _md5_low64(uniq) -> np.ndarray:
    """md5-low64 (little-endian low 8 bytes == DuckDB md5_number_lower)
    per DISTINCT token, returned as uint64."""
    md5 = hashlib.md5
    return np.fromiter(
        (int.from_bytes(md5(t.encode()).digest()[8:16], "little")
         for t in uniq),
        dtype=np.uint64, count=len(uniq))


def _batch_tokens(batch: pa.Table, text_col: str):
    """(doc_idx, token ndarray, non-empty mask) via the shared exploder."""
    doc_idx, flat, _ = _explode_tokens(batch, text_col)
    toks = flat.to_numpy(zero_copy_only=False)
    mask = toks != ""
    return doc_idx[mask], toks[mask]


def hll_registers(docs_ds, *, group_col: str = "lang",
                  text_col: str = "text"):
    """Grouped HyperLogLog registers: distinct-token cardinality sketch per
    ``group_col`` value.

    Output: ``(group_col, bucket, rho)`` — for every touched register, the
    max leading-zero rank observed in that group.  Registers are the
    sketch's mergeable state: per-batch partial = max per (group, bucket)
    (at most groups x 4096 rows regardless of batch size), merged by one
    tiny ``groupby().Max`` shuffle.  The cardinality estimate (pytest
    checks it lands within HLL error of the exact distinct count) is
    ``alpha_m * m^2 / sum(2^-rho)`` over the 4096 registers — driver state
    is the register table itself, bounded by construction.

    Exactly SQL-oracled: bucket/rho are integer functions of md5-low64 and
    ``rho = 53 - length(bin(v))`` (the unigram_bits bit_length identity).
    """
    import pandas as pd
    from ray.data.aggregate import Max

    def partial(batch: pa.Table) -> pa.Table:
        doc_idx, toks = _batch_tokens(batch, text_col)
        grp = batch.column(group_col).to_numpy(zero_copy_only=False)
        if len(toks) == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             "bucket": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64())})
        codes, uniq = pd.factorize(toks)
        h = _md5_low64(uniq)
        bucket = (h % HLL_BUCKETS).astype(np.int64)
        v = (h >> np.uint64(12)).astype(np.float64)  # < 2^52: exact
        _, blen = np.frexp(v)
        rho = np.where(v == 0, _HLL_VBITS + 1,
                       _HLL_VBITS + 1 - blen).astype(np.int64)
        df = pd.DataFrame({
            group_col: grp[doc_idx],
            "bucket": bucket[codes],
            "rho": rho[codes],
        })
        part = (df.groupby([group_col, "bucket"], dropna=False, sort=False)
                ["rho"].max().reset_index())
        return pa.table({
            group_col: pa.array(part[group_col], pa.string()),
            "bucket": pa.array(part["bucket"].to_numpy(), pa.int64()),
            "rho": pa.array(part["rho"].to_numpy(), pa.int64()),
        })

    parts = docs_ds.map_batches(partial, batch_format="pyarrow")
    merged = parts.groupby([group_col, "bucket"]) \
        .aggregate(Max("rho", alias_name="rho"))

    def as_int(t: pa.Table) -> pa.Table:
        return t.set_column(t.schema.get_field_index("rho"), "rho",
                            t.column("rho").cast(pa.int64()))

    return merged.map_batches(as_int, batch_format="pyarrow")


def hll_estimate(registers, *, m: int = HLL_BUCKETS) -> dict:
    """Cardinality estimates from an hll_registers result (small collect —
    the register table is <= groups x m rows by construction).  Classic
    HLL estimator with the small-range linear-counting correction."""
    df = registers.to_pandas()
    alpha = 0.7213 / (1 + 1.079 / m)
    out = {}
    for g, part in df.groupby(df.columns[0], dropna=False):
        regs = np.zeros(m)
        regs[part["bucket"].to_numpy()] = part["rho"].to_numpy()
        est = alpha * m * m / np.sum(np.exp2(-regs))
        zeros = m - len(part)
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)
        out[g] = float(est)
    return out


def _cms_cols(h: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(depth, n_distinct) column indices from disjoint 16-bit md5 slices."""
    shifts = (np.arange(depth, dtype=np.uint64) * np.uint64(16))[:, None]
    return ((h[None, :] >> shifts) % np.uint64(width)).astype(np.int64)


class _CmsPartial:
    """Per-batch count-min partial: factorize to distinct tokens, one md5
    per distinct token, then for each of the d rows a vectorized bincount
    of token OCCURRENCES into width columns.  Emits only touched cells as
    (cell, c) rows — at most d*width per batch."""

    def __init__(self, text_col: str = "text",
                 depth: int = CMS_DEPTH, width: int = CMS_WIDTH):
        self.text_col = text_col
        self.depth = depth
        self.width = width

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        _, toks = _batch_tokens(batch, self.text_col)
        if len(toks) == 0:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        codes, uniq = pd.factorize(toks)
        mult = np.bincount(codes, minlength=len(uniq))
        cols = _cms_cols(_md5_low64(uniq), self.depth, self.width)
        d = self.depth
        cells = (np.arange(d, dtype=np.int64)[:, None] * self.width
                 + cols).ravel()
        counts = np.broadcast_to(mult, (d, len(uniq))).ravel()
        agg = np.bincount(cells, weights=counts, minlength=d * self.width)
        nz = np.nonzero(agg)[0]
        return pa.table({"cell": pa.array(nz, pa.int64()),
                         "c": pa.array(agg[nz].astype(np.int64), pa.int64())})


def countmin_sketch(docs_ds, *, text_col: str = "text",
                    depth: int = CMS_DEPTH, width: int = CMS_WIDTH):
    """Count-min sketch over token occurrences: ``(row, col, count)`` for
    every touched cell.  Partials bound the shuffle at d*width rows per
    batch; the merge is one Sum over <= d*width keys."""
    from ray.data.aggregate import Sum

    merged = docs_ds.map_batches(
        _CmsPartial, fn_constructor_kwargs={"text_col": text_col,
                                            "depth": depth, "width": width},
        batch_format="pyarrow", concurrency=default_pool(),
    ).groupby("cell").aggregate(Sum("c", alias_name="count"))

    def unpack(t: pa.Table) -> pa.Table:
        cell = t.column("cell").to_numpy(zero_copy_only=False)
        return pa.table({
            "row": pa.array(cell // width, pa.int64()),
            "col": pa.array(cell % width, pa.int64()),
            "count": pa.array(
                t.column("count").to_numpy(zero_copy_only=False)
                .astype(np.int64), pa.int64()),
        })

    return merged.map_batches(unpack, batch_format="pyarrow")


def countmin_topk(docs_ds, *, k: int = 20, text_col: str = "text",
                  depth: int = CMS_DEPTH, width: int = CMS_WIDTH):
    """Heavy hitters by count-min estimate: top-k tokens where
    ``est(token) = min_j sketch[j][h_j(token)]``, ties broken by token.

    The sketch (d*width ints — KBs) is the broadcast model state; the
    probe pass re-reads the corpus, estimates each batch's DISTINCT tokens
    against it, and keeps a per-block top-k partial.  A global-top-k token
    present in any block always survives that block's local top-k (its
    estimate is global), so one tiny merge over <= k*blocks rows is exact.
    Duplicate tokens across blocks carry identical estimates and dedupe in
    the merge.
    """
    import ray

    sk = countmin_sketch(docs_ds, text_col=text_col,
                         depth=depth, width=width).to_pandas()
    table = np.zeros((depth, width), dtype=np.int64)
    table[sk["row"].to_numpy(), sk["col"].to_numpy()] = \
        sk["count"].to_numpy()
    table_ref = ray.put(table)

    def probe(batch: pa.Table) -> pa.Table:
        import pandas as pd

        tbl = ray.get(table_ref)
        _, toks = _batch_tokens(batch, text_col)
        if len(toks) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "est": pa.array([], pa.int64())})
        uniq = pd.unique(toks)
        cols = _cms_cols(_md5_low64(uniq), depth, width)
        est = tbl[np.arange(depth)[:, None], cols].min(axis=0)
        order = np.lexsort((uniq, -est))[:k]
        return pa.table({"token": pa.array(uniq[order], pa.string()),
                         "est": pa.array(est[order], pa.int64())})

    def merge(df):
        df = df.drop_duplicates("token") \
            .sort_values(["est", "token"], ascending=[False, True])
        return df.head(k).reset_index(drop=True)

    # batch_size=None: the merge must see the ONE repartitioned block whole
    # (default ~1k-row batches would make the global head(k) per-batch)
    return docs_ds.map_batches(probe, batch_format="pyarrow") \
        .repartition(1).map_batches(merge, batch_format="pandas",
                                    batch_size=None)


def kmv_sketch(docs_ds, *, k: int = 256, group_col: str = "lang",
               text_col: str = "text", n_buckets: int = 64):
    """KMV / theta distinct-count sketch per group: the ``k`` SMALLEST
    distinct md5-low64 token hashes of each group (Beyer et al. 2007).
    Mergeable by construction — the union sketch is the k smallest of the
    concatenated partials after dedup — and fully deterministic, so
    unlike most sketches it is EXACTLY SQL-oracled (``row_number() OVER
    (PARTITION BY g ORDER BY hash) <= k``).  The cardinality estimate is
    ``(k−1)·2⁶⁴ / h_(k)`` (pytest checks it lands within KMV error of
    the exact distinct count).

    Output ``(group, rank, h_top, h_low)`` — the uint64 hash split into
    two int64 halves (``h = h_top·2⁶³ + h_low``) because BIGINT can't
    carry a full uint64; ordering by (h_top, h_low) == uint64 order on
    both sides.

    Scale shape: per-batch partial = local k-smallest per (group, batch)
    (≤ groups·k rows regardless of batch size); the combine shuffles on
    ``hash(group) % n_buckets`` coarse buckets and dedups+re-heads each
    group inside — never one Ray group per key.
    """
    import pandas as pd

    HALF = np.uint64(1) << np.uint64(63)

    def _prune(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates([group_col, "h_top", "h_low"])
        df = df.sort_values([group_col, "h_top", "h_low"],
                            kind="mergesort")
        r = df.groupby(group_col, sort=False).cumcount()
        return df[r < k]

    def partial(batch: pa.Table) -> pa.Table:
        doc_idx, toks = _batch_tokens(batch, text_col)
        grp = batch.column(group_col).to_numpy(zero_copy_only=False)
        if len(toks) == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             "h_top": pa.array([], pa.int64()),
                             "h_low": pa.array([], pa.int64()),
                             "_kb": pa.array([], pa.int64())})
        codes, uniq = pd.factorize(toks)
        h = _md5_low64(uniq)
        df = pd.DataFrame({
            group_col: grp[doc_idx],
            "h_top": (h[codes] // HALF).astype(np.int64),
            "h_low": (h[codes] % HALF).astype(np.int64),
        })
        df = _prune(df)
        gb = np.fromiter(
            (int.from_bytes(hashlib.md5(str(g).encode()).digest()[:4],
                            "big") % n_buckets
             for g in df[group_col]),
            dtype=np.int64, count=len(df))
        return pa.table({
            group_col: pa.array(df[group_col].to_numpy(), pa.string()),
            "h_top": pa.array(df["h_top"].to_numpy(), pa.int64()),
            "h_low": pa.array(df["h_low"].to_numpy(), pa.int64()),
            "_kb": pa.array(gb, pa.int64()),
        })

    def combine(df: pd.DataFrame) -> pa.Table:
        df = _prune(df)
        r = (df.groupby(group_col, sort=False).cumcount() + 1) \
            .to_numpy(np.int64)
        return pa.table({
            group_col: pa.array(df[group_col].to_numpy(), pa.string()),
            "rank": pa.array(r, pa.int64()),
            "h_top": pa.array(df["h_top"].to_numpy(), pa.int64()),
            "h_low": pa.array(df["h_low"].to_numpy(), pa.int64()),
        })

    return docs_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("_kb").map_groups(combine, batch_format="pandas")
