"""Generic distributed joins — the reusable primitive behind the engine's
ad-hoc join shapes (segment_revenue's partitioned path, cross_dedup's
anti-join, the dedup bucket joins), exposed as a public API.

Ray Data has no native shuffle join; the engine's idiom is the
coarse-bucket hash join: tag BOTH sides with ``hash(key) % n_buckets``,
union (schemas aligned with null padding + a side marker), group by the
coarse bucket — every key's rows from both sides co-locate while the
shuffle produces ~``n_buckets`` Ray groups (never one per key) — and run
one vectorized pandas merge inside each bucket.

Skew note (the partitioning assumption every hash join carries): a single
join key hotter than ~1/n_buckets of a side concentrates in one group;
the linkage blocking stage shows the salting recipe when that matters.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import bucket_hash


def bucket_hash_join(left, right, *, on: str, how: str = "inner",
                     n_buckets: int = 128,
                     left_types: dict | None = None,
                     right_types: dict | None = None):
    """Distributed hash join of two Datasets on column ``on``.

    ``how`` ∈ {"inner", "left", "semi", "anti"}.  For inner/left,
    non-key column names must be disjoint (no suffixing — a rename
    before the join is explicit and cheap).  ``semi``/``anti`` return
    the LEFT rows with / without a key match — the right side then
    contributes only its key column, deduplicated per batch before the
    shuffle (an existence probe ships distinct keys, never payloads).
    Both sides are tagged with the same ``hash(on) % n_buckets``; the
    union is grouped by bucket and merged with pandas inside each group.
    The left/right role is carried by a ``_side`` marker column; null
    padding aligns the union schema.
    """
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"how must be inner|left|semi|anti, got {how!r}")

    # ``left_types``/``right_types`` ({col: pa.DataType}, in column
    # order) bypass the Dataset.schema() probes below.  That matters
    # when an input is itself a shuffle output (e.g. a join fed into a
    # join): .schema() on an un-executed AllToAll pipeline EXECUTES it
    # to limit 1 — a full sort just to read the column names.  Callers
    # chaining joins should thread the types they already know.
    existence = how in ("semi", "anti")

    def _types_of(ds, given):
        if given is not None:
            return dict(given)
        s = ds.schema()
        return {n: t for n, t in zip(s.names, s.types)}

    ltypes = _types_of(left, left_types)
    rtypes = _types_of(right, right_types)
    lcols = [c for c in ltypes if c != on]
    rcols = [] if existence else [c for c in rtypes if c != on]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"non-key columns must be disjoint: {overlap}")
    if existence:
        right = right.map_batches(
            lambda df: pa.Table.from_pandas(
                df[[on]].drop_duplicates(), preserve_index=False),
            batch_format="pandas")

    # peer-side columns are padded with TYPED Arrow nulls (pa.nulls with
    # the peer schema's type), not object-dtype pandas columns — the
    # tagged blocks stay Arrow-native and both union branches carry
    # identical per-column types.

    def tag(side: int, own: list[str], other: list[str],
            own_types: dict, other_types: dict):
        def fn(df: pd.DataFrame) -> pa.Table:
            n = len(df)
            out = {on: pa.Array.from_pandas(df[on], type=ltypes[on]),
                   "_jb": pa.array(bucket_hash(df[on], n_buckets)),
                   "_side": pa.array(np.full(n, side, np.int8))}
            for c in own:
                out[c] = pa.Array.from_pandas(df[c], type=own_types[c])
            for c in other:
                out[c] = pa.nulls(n, other_types[c])
            return pa.table(out)
        return fn

    both = left.map_batches(tag(0, lcols, rcols, ltypes, rtypes),
                            batch_format="pandas") \
        .union(right.map_batches(tag(1, rcols, lcols, rtypes, ltypes),
                                 batch_format="pandas"))

    # the group block reaches merge through pandas, where an int column
    # holding the peer side's typed nulls degrades to float64 — rebuild
    # the output with the KNOWN Arrow types (NaN→null under from_pandas).
    # Caveat shared by any pandas merge kernel: int64 keys above 2^53
    # would lose precision on that float detour; ids here are far below.
    out_types = {on: ltypes[on], **{c: ltypes[c] for c in lcols},
                 **{c: rtypes[c] for c in rcols}}

    def merge(g: pd.DataFrame) -> pa.Table:
        lf = g[g["_side"] == 0][[on] + lcols]
        rt = g[g["_side"] == 1][[on] + rcols]
        if existence:
            mask = lf[on].isin(set(rt[on]))
            out = lf[mask if how == "semi" else ~mask]
        else:
            out = lf.merge(rt, on=on, how=how)
        return pa.table({c: pa.Array.from_pandas(out[c], type=out_types[c])
                         for c in out.columns})

    # union SUMS block counts (CLAUDE.md) — repartition before the groupby
    return both.repartition(max(32, n_buckets // 2)) \
        .groupby("_jb").map_groups(merge, batch_format="pandas")


def broadcast_join(left, right, *, on: str, how: str = "inner",
                   max_rows: int = 5_000_000,
                   left_cols: list[str] | None = None):
    """Broadcast hash join — the small-side twin of
    :func:`bucket_hash_join`: the right side is collected once, shipped
    via ``ray.put``, and probed inside ``map_batches`` (no shuffle at
    all).  The guarded default (``max_rows``) refuses to broadcast a big
    side instead of silently melting the object store — callers with a
    big right side want the bucketed join.

    ``how`` ∈ {"inner", "left", "semi", "anti"}.  Same disjoint-column
    contract as the bucketed join; output equality with it is
    pytest-tested for every mode.
    """
    import pandas as pd

    import ray

    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"how must be inner|left|semi|anti, got {how!r}")
    existence = how in ("semi", "anti")
    # left_cols bypasses the left.schema() probe — on a shuffle-output
    # left it would execute the pipeline to limit 1 (see bucket_hash_join)
    lcols = [c for c in (left_cols if left_cols is not None
                         else left.schema().names) if c != on]
    rcols = [] if existence else \
        [c for c in right.schema().names if c != on]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"non-key columns must be disjoint: {overlap}")

    if existence:
        right = right.map_batches(
            lambda df: pa.Table.from_pandas(
                df[[on]].drop_duplicates(), preserve_index=False),
            batch_format="pandas")
    # one collect serves both the guard and the broadcast (a separate
    # count() would execute the right-side plan twice); Ray's own
    # to_pandas limit error is re-raised with the alternative named
    try:
        rdf = right.to_pandas(limit=max_rows + 1)
    except ValueError as e:
        raise ValueError(
            f"broadcast side exceeds max_rows={max_rows}; use "
            f"bucket_hash_join for a big right side") from e
    if len(rdf) > max_rows:
        raise ValueError(
            f"broadcast side exceeds max_rows={max_rows}; use "
            f"bucket_hash_join for a big right side")
    if on not in rdf.columns:
        # this Ray build's to_pandas() on a 0-row dataset drops the
        # schema entirely — rebuild a typed empty frame so the probe
        # merge still sees the key and payload columns
        rschema = right.schema()
        rtypes = dict(zip(rschema.names, rschema.types)) \
            if rschema is not None else {}
        cols = [on] + rcols
        rdf = pa.table({c: pa.nulls(0, rtypes.get(c, pa.int64()))
                        for c in cols}).to_pandas()
    bc = ray.put(rdf)

    class Probe:
        def __init__(self):
            self.r = ray.get(bc)
            self.keys = set(self.r[on]) if existence else None

        def __call__(self, df: pd.DataFrame) -> pa.Table:
            if existence:
                mask = df[on].isin(self.keys)
                out = df[mask if how == "semi" else ~mask]
            else:
                out = df.merge(self.r, on=on, how=how)
            return pa.Table.from_pandas(out, preserve_index=False)

    from ..util import default_pool

    return left.map_batches(Probe, batch_format="pandas",
                            concurrency=default_pool())
