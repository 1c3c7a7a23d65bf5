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


def extract_names_batch(batch: pa.Table) -> pa.Table:
    """docs(doc_id, spans) -> (doc_id, name, spans); pure Arrow kernels."""
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
    sel = pa.array(uniq)
    return pa.Table.from_arrays(
        [
            batch.column("doc_id").take(sel),
            names,
            spans.take(sel),
        ],
        names=["doc_id", "name", "spans"],
    )


def extract_names(docs_ds, *, carry_spans: bool = True):
    """Dataset[DOCS_SCHEMA] -> Dataset[(doc_id, name[, spans])]."""
    ds = docs_ds.map_batches(extract_names_batch, batch_format="pyarrow")
    if not carry_spans:
        ds = ds.select_columns(["doc_id", "name"])
    return ds
