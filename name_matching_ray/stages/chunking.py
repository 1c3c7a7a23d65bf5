"""Token-window chunking and segment-level dedup over the ``documents``
table — the pretraining-corpus operators between raw docs and the packer:

- :func:`chunk_docs` — overlapping fixed-size token windows (the standard
  LM pretraining chunker: window ``W``, stride ``S``).
- :func:`segment_dedup` — RefinedWeb-style segment-level exact dedup with
  reassembly: split every doc into non-overlapping ``W``-token segments,
  keep only the globally-first occurrence of each distinct segment
  (ordered by ``(doc_id, ord)``), and rebuild each doc from its surviving
  segments.  Near-verbatim boilerplate (headers, license blocks, templated
  spans) disappears corpus-wide while unique prose stays.

Both run on ONE shared vectorized kernel (:func:`explode_windows`): the
per-batch token ``ListArray`` is flattened once and every window is gathered
positionally with numpy ``repeat``/``cumsum`` index arithmetic — no Python
loop touches a row; the only per-element Python in ``segment_dedup`` is the
md5 digest (C speed), kept because it is the repo-standard oracle-exact
hash (== DuckDB ``md5_number_lower``; see dedup._hash_shingles_u64).

Scale notes (100 TB): ``chunk_docs`` is map-only — it streams.
``segment_dedup`` is two hash-partitioned shuffles, both on the coarse
256-bucket pattern (CLAUDE.md: per-key ``map_groups`` is banned): the
keep-decision groups by ``hash(segment) % 256`` (first occurrence = row 1
of a sort inside the bucket, vectorized ``duplicated()``), the reassembly
groups by ``doc_id % 256``.  Segment replication is 1× (non-overlapping
windows), so shuffle volume ≈ corpus size — the same cost class as the
exact-dedup groupby, with no driver materialization anywhere.

Reference linkage: the reference has no chunking ops; these extend the
engine for training-data pipelines (the window explode generalizes the
reference's token-split in matcher.py:122).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _token_lists(text_col: pa.ChunkedArray | pa.Array) -> pa.ListArray:
    """Lowercase whitespace tokens with empty strings dropped, offsets
    rebuilt (== DuckDB ``list_filter(string_split_regex(lower(text),
    '\\s+'), x -> x <> '')``)."""
    toks = pc.split_pattern_regex(pc.utf8_lower(text_col), r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    cum = np.concatenate([[0], np.cumsum(keep, dtype=np.int64)])
    return pa.ListArray.from_arrays(
        pa.array(cum[off], pa.int32()),
        flat.filter(pa.array(keep)),
    )


def explode_windows(batch: pa.Table, *, window: int, stride: int,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> pa.Table:
    """(id, text) -> one row per token window: ``(id, ord, chunk_text,
    n_tokens)``.  Windows start at ``0, stride, 2*stride, ...`` while the
    start is inside the doc; the last windows may be shorter than
    ``window``.  Docs with zero tokens emit no rows (same as the SQL
    oracle's ``len(toks) > 0`` guard).  Fully vectorized: gather indices
    for every window token come from repeat/cumsum arithmetic and one
    Arrow ``take`` + ``binary_join`` builds all chunk strings at once."""
    toks = _token_lists(batch.column(text_col))
    flat = toks.values
    off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n = np.diff(off)                                    # tokens per doc
    n_chunks = (n + stride - 1) // stride               # 0 when n == 0
    total = int(n_chunks.sum())
    if total == 0:
        return pa.table({
            id_col: pa.array([], batch.column(id_col).type),
            "ord": pa.array([], pa.int64()),
            "chunk_text": pa.array([], pa.string()),
            "n_tokens": pa.array([], pa.int64()),
        })
    doc_idx = np.repeat(np.arange(len(n), dtype=np.int64), n_chunks)
    chunk_base = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
    ord_ = np.arange(total, dtype=np.int64) - np.repeat(chunk_base, n_chunks)
    start = off[doc_idx] + ord_ * stride
    end = np.minimum(start + window, off[doc_idx] + n[doc_idx])
    cnt = end - start
    tok_base = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    gidx = np.repeat(start, cnt) + (
        np.arange(int(cnt.sum()), dtype=np.int64) - np.repeat(tok_base, cnt))
    gathered = flat.take(pa.array(gidx, pa.int64()))
    lst = pa.ListArray.from_arrays(
        pa.array(np.concatenate([[0], np.cumsum(cnt)]), pa.int32()), gathered)
    return pa.table({
        id_col: batch.column(id_col).take(pa.array(doc_idx, pa.int64())),
        "ord": pa.array(ord_, pa.int64()),
        "chunk_text": pc.binary_join(lst, " "),
        "n_tokens": pa.array(cnt, pa.int64()),
    })


def chunk_docs(docs_ds, *, window: int = 16, stride: int = 8,
               text_col: str = "text", id_col: str = "doc_id"):
    """Overlapping token-window chunks for LM pretraining — map-only, so
    the stage streams at any scale.  Output: ``(doc_id, chunk_id,
    chunk_text, n_tokens)`` with ``chunk_id`` the 0-based window ordinal."""
    def fn(batch: pa.Table) -> pa.Table:
        t = explode_windows(batch, window=window, stride=stride,
                            text_col=text_col, id_col=id_col)
        return t.rename_columns([id_col, "chunk_id", "chunk_text",
                                 "n_tokens"])

    return docs_ds.map_batches(fn, batch_format="pyarrow")


def segment_dedup(docs_ds, *, window: int = 8, buckets: int = 256,
                  text_col: str = "text", id_col: str = "doc_id"):
    """Corpus-wide segment-level exact dedup with per-doc reassembly.

    Plan (two coarse-bucket shuffles, no driver state):

    1. map: explode non-overlapping ``window``-token segments; hash each
       segment (md5-low64 == ``md5_number_lower``); tag ``hb = h % buckets``.
    2. ``groupby(hb)``: inside each of the 256 buckets, sort by
       ``(h, doc_id, ord)`` and keep the first row per hash — vectorized
       ``duplicated()``, equivalent to SQL
       ``row_number() OVER (PARTITION BY h ORDER BY doc_id, ord) = 1``.
       First-occurrence semantics need no cross-bucket coordination
       because a hash lives in exactly one bucket.
    3. ``groupby(doc_id % buckets)``: reassemble — surviving segments
       joined in ``ord`` order, plus kept/total tallies.

    Output: ``(doc_id, clean_text, n_segments, n_kept)``; docs whose every
    segment was seen earlier come back with ``clean_text = ''`` (their
    tally rows make the drop visible — no silent deletion).  Hash
    collisions merge segments identically on both sides of the oracle
    (the keep rule partitions by the hash, not the text).
    """
    import pandas as pd

    def explode(batch: pa.Table) -> pa.Table:
        t = explode_windows(batch, window=window, stride=window,
                            text_col=text_col, id_col=id_col)
        md5 = hashlib.md5
        segs = t.column("chunk_text").to_pylist()
        h = np.fromiter(
            (int.from_bytes(md5(s.encode()).digest()[8:16], "little")
             for s in segs),
            np.uint64, count=len(segs))
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: t.column(id_col),
            "ord": t.column("ord"),
            "seg": t.column("chunk_text"),
            "h": pa.array(h, pa.uint64()),
            "hb": pa.array((h % buckets).astype(np.int64), pa.int64()),
            "db": pa.array((np.asarray(ids, np.int64) % buckets)
                           .astype(np.int64), pa.int64()),
        })

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["h", id_col, "ord"], kind="mergesort")
        df["keep"] = ~df["h"].duplicated().to_numpy()
        return df[[id_col, "ord", "seg", "keep", "db"]]

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_col, "ord"], kind="mergesort")
        g = df.groupby(id_col, sort=True)
        out = pd.DataFrame({
            id_col: np.asarray(list(g.groups.keys())),
            "n_segments": g.size().to_numpy().astype(np.int64),
            "n_kept": g["keep"].sum().to_numpy().astype(np.int64),
        })
        kept = df[df["keep"]]
        txt = kept.groupby(id_col, sort=True)["seg"].agg(" ".join)
        out["clean_text"] = out[id_col].map(txt).fillna("")
        return out[[id_col, "clean_text", "n_segments", "n_kept"]]

    segs = docs_ds.map_batches(explode, batch_format="pyarrow")
    flagged = segs.groupby("hb").map_groups(keep_first,
                                            batch_format="pandas")
    return flagged.groupby("db").map_groups(reassemble,
                                            batch_format="pandas")


def substring_dedup(docs_ds, *, k: int = 8, buckets: int = 256,
                    text_col: str = "text", id_col: str = "doc_id"):
    """Exact repeated-substring removal at token granularity — the
    "ExactSubstr" dedup modality (Lee et al., *Deduplicating Training Data
    Makes Language Models Better*, ACL 2022), token-k-gram variant: any
    ``k``-token span that occurs more than once ANYWHERE in the corpus is
    removed from every occurrence except the globally first (ordered by
    ``(doc_id, pos)``); a token is dropped iff covered by at least one
    removed span (overlapping spans union).  Unlike :func:`segment_dedup`
    this catches duplicates at ANY offset, not just window-aligned ones.

    Plan (two coarse-bucket shuffles, no driver state):

    1. map: every k-gram position via the shared window kernel
       (stride 1, full windows only); ship ``(doc_id, pos, md5-low64)`` —
       the hash, never the k-gram text, so the exchange is ~24 B/position
       regardless of k.
    2. ``groupby(hash % buckets)``: sort by ``(h, doc_id, pos)``; a
       position is a duplicate iff its hash group has >= 2 members and it
       is not the group's first row (vectorized ``duplicated`` +
       ``transform('size')``).  Only duplicate positions leave the stage.
    3. ``groupby(doc_id % buckets)`` over docs UNION duplicate positions
       (the tag-and-union join idiom): per bucket, one interval-union
       coverage mask per doc via a difference array (+1 at ``pos``, -1 at
       ``pos+k``, prefix-sum > 0 = covered) — all numpy over the bucket's
       concatenated token stream, no per-token Python.

    Output: ``(doc_id, clean_text, n_tokens, n_removed)`` for every doc
    with >= 1 token; the removal tally keeps the cut visible per row.
    """
    import hashlib as _hl

    import pandas as pd

    def positions(batch: pa.Table) -> pa.Table:
        t = explode_windows(batch, window=k, stride=1,
                            text_col=text_col, id_col=id_col)
        full = pc.equal(t.column("n_tokens"), k)
        t = t.filter(full)
        md5 = _hl.md5
        grams = t.column("chunk_text").to_pylist()
        h = np.fromiter(
            (int.from_bytes(md5(s.encode()).digest()[8:16], "little")
             for s in grams),
            np.uint64, count=len(grams))
        return pa.table({
            id_col: t.column(id_col),
            "pos": t.column("ord"),
            "h": pa.array(h, pa.uint64()),
            "hb": pa.array((h % buckets).astype(np.int64), pa.int64()),
        })

    def find_dups(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["h", id_col, "pos"], kind="mergesort")
        sz = df.groupby("h", sort=False)["h"].transform("size").to_numpy()
        dup = (sz > 1) & df["h"].duplicated().to_numpy()
        out = df.loc[dup, [id_col, "pos"]].copy()
        out["db"] = (out[id_col].to_numpy().astype(np.int64) % buckets)
        return out

    dups = docs_ds.map_batches(positions, batch_format="pyarrow") \
        .groupby("hb").map_groups(find_dups, batch_format="pandas")

    def tag_docs(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: batch.column(id_col),
            "pos": pa.array(np.full(len(batch), -1, np.int64), pa.int64()),
            text_col: batch.column(text_col),
            "db": pa.array((np.asarray(ids, np.int64) % buckets),
                           pa.int64()),
        })

    def tag_dups(df: pd.DataFrame) -> pa.Table:
        return pa.table({
            id_col: pa.array(df[id_col].to_numpy(), pa.int64()),
            "pos": pa.array(df["pos"].to_numpy(), pa.int64()),
            text_col: pa.nulls(len(df), pa.string()),
            "db": pa.array(df["db"].to_numpy(), pa.int64()),
        })

    both = docs_ds.map_batches(tag_docs, batch_format="pyarrow").union(
        dups.map_batches(tag_dups, batch_format="pandas"))

    def rebuild(g: pd.DataFrame) -> pa.Table:
        docs = g[g["pos"] < 0].sort_values(id_col, kind="mergesort")
        toks = _token_lists(pa.array(docs[text_col].to_numpy(), pa.string()))
        off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.diff(off)
        ids = docs[id_col].to_numpy().astype(np.int64)
        nonempty = n > 0
        # difference array over the bucket's concatenated token stream
        delta = np.zeros(int(off[-1]) + 1, np.int64)
        dup = g[g["pos"] >= 0]
        if len(dup):
            order = np.searchsorted(ids, dup[id_col].to_numpy()
                                    .astype(np.int64))
            starts = off[order] + dup["pos"].to_numpy().astype(np.int64)
            np.add.at(delta, starts, 1)
            np.add.at(delta, np.minimum(starts + k, off[order + 1]), -1)
        covered = np.cumsum(delta[:-1]) > 0
        kept_idx = np.flatnonzero(~covered)
        kept_cnt = np.add.reduceat(
            (~covered).astype(np.int64), off[:-1][nonempty]) \
            if nonempty.any() else np.empty(0, np.int64)
        kept_vals = toks.values.take(pa.array(kept_idx, pa.int64()))
        lst = pa.ListArray.from_arrays(
            pa.array(np.concatenate([[0], np.cumsum(kept_cnt)]),
                     pa.int32()), kept_vals)
        n_removed = n[nonempty] - kept_cnt
        return pa.table({
            id_col: pa.array(ids[nonempty], pa.int64()),
            "clean_text": pc.binary_join(lst, " "),
            "n_tokens": pa.array(n[nonempty], pa.int64()),
            "n_removed": pa.array(n_removed, pa.int64()),
        })

    return both.groupby("db").map_groups(rebuild, batch_format="pandas")
