"""Sources: adapt external tables into the interleaved-docs schema.

The graft ingest is a Lance table of interleaved text+media documents
(BASELINE.json input_hint); Lance is unavailable offline, so the IO layer is
abstracted (SURVEY.md §7.4 risk 7): :func:`read_docs` reads parquet with the
identical schema, and :func:`documents_as_interleaved` wraps the driver's
flat ``documents`` test table (doc_id, text, lang, source, n_chars) into
interleaved docs — one text span plus one synthetic media span derived
deterministically from ``source`` (exercising the media path end-to-end).
"""

from __future__ import annotations

import pyarrow as pa

from ..schema import DOCS_SCHEMA


def read_docs(path: str, **kwargs):
    """Read an interleaved-docs table (parquet stand-in for Lance)."""
    import ray.data

    return ray.data.read_parquet(path, **kwargs)


def _wrap_batch(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    sources = batch.column("source").to_pylist()
    doc_ids, spans = [], []
    for i, t, s in zip(ids, texts, sources):
        did = f"d{int(i):09d}"
        t = t or ""
        doc_ids.append(did)
        spans.append([
            {"kind": "text", "text": t, "media_ref": "", "offset": 0},
            {"kind": "image", "text": "",
             "media_ref": f"media://{s}/{did}", "offset": len(t)},
        ])
    return pa.Table.from_pydict({"doc_id": doc_ids, "spans": spans},
                                schema=DOCS_SCHEMA)


def documents_as_interleaved(sf_dir: str):
    """documents.parquet -> Dataset[DOCS_SCHEMA] (columns pruned at read)."""
    import ray.data

    flat = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text", "source"])
    return flat.map_batches(_wrap_batch, batch_format="pyarrow")
