"""Extract name records from interleaved documents (SURVEY.md §3.4 "extract").

A vectorized, stateless ``map_batches`` stage: zero-copy Arrow in/out.  For
each doc, the FIRST ``kind == "text"`` span supplies the name; the full
``spans`` list is carried **verbatim** (the per-row span-sequence invariant,
BASELINE.json input_hint).  Docs with no text span are dropped.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def extract_names_batch(batch: pa.Table, max_name_tokens: int | None = None) -> pa.Table:
    """docs(doc_id, spans) -> (doc_id, name, spans); pure Arrow kernels.

    ``max_name_tokens`` truncates the extracted name to its first k
    whitespace tokens (name extraction from running text — the cascade's
    cost is O(tokens²) per pair, so unbounded names are pathological).  The
    ``spans`` column is ALWAYS carried verbatim regardless of truncation.
    """
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()  # struct array of all spans
    parents = pc.list_parent_indices(spans)
    is_text = pc.equal(flat.field("kind"), pa.scalar("text"))
    text_parents = pc.filter(parents, is_text).to_numpy(zero_copy_only=False)
    text_values = pc.filter(flat.field("text"), is_text)
    # first text span per doc (parents are non-decreasing after flatten)
    uniq, first_idx = np.unique(text_parents, return_index=True)
    names = text_values.take(pa.array(first_idx))
    if max_name_tokens is not None:
        # vectorized: keep the first k whitespace-separated tokens
        pat = rf"^\s*(?P<m>(?:\S+\s+){{0,{max_name_tokens - 1}}}\S+)"
        names = pc.fill_null(
            pc.struct_field(pc.extract_regex(names, pat), "m"), ""
        )
    sel = pa.array(uniq)
    return pa.Table.from_arrays(
        [
            batch.column("doc_id").take(sel),
            names,
            spans.take(sel),
        ],
        names=["doc_id", "name", "spans"],
    )


def extract_names(docs_ds, *, carry_spans: bool = True,
                  max_name_tokens: int | None = None):
    """Dataset[DOCS_SCHEMA] -> Dataset[(doc_id, name[, spans])]."""
    ds = docs_ds.map_batches(
        lambda b: extract_names_batch(b, max_name_tokens),
        batch_format="pyarrow",
    )
    if not carry_spans:
        ds = ds.select_columns(["doc_id", "name"])
    return ds


def explode_spans(docs_ds):
    """Dataset[DOCS_SCHEMA] -> one row per span: (doc_id, span_idx, kind,
    text_len, media_ref, offset).

    The oracled surface of the interleaved-docs axis: the adapter's span
    law (text span at offset 0, media span at offset len(text) with
    ``media://{source}/{doc_id}``) is reconstructed independently in SQL
    from the flat table, so span order, offsets and media refs are
    hash-compared end-to-end, not just pytest-asserted.  Pure Arrow:
    ``flatten()`` + ``list_parent_indices`` (slice-safe — the winnow
    sliced-ListArray lesson), span position from run starts.
    """
    import numpy as np

    def ex(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = spans.flatten()
        parents = pc.list_parent_indices(spans).to_numpy(
            zero_copy_only=False)
        n = len(flat)
        if n:
            run_start = np.flatnonzero(
                np.r_[True, parents[1:] != parents[:-1]])
            span_idx = (np.arange(n)
                        - np.repeat(run_start,
                                    np.diff(np.r_[run_start, n])))
        else:
            span_idx = np.empty(0, dtype=np.int64)
        return pa.table({
            "doc_id": batch.column("doc_id").take(pa.array(parents)),
            "span_idx": pa.array(span_idx.astype(np.int64), pa.int64()),
            "kind": flat.field("kind"),
            "text_len": pc.utf8_length(flat.field("text")).cast(pa.int64()),
            "media_ref": flat.field("media_ref"),
            "offset": flat.field("offset").cast(pa.int64()),
        })

    return docs_ds.map_batches(ex, batch_format="pyarrow")
