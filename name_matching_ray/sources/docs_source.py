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

import os

import pyarrow as pa

from ..schema import DOCS_SCHEMA

try:  # feature probe: the sandbox lacks lance; production installs have it
    import lance  # noqa: F401

    HAS_LANCE = True
except ImportError:
    HAS_LANCE = False


def _is_lance_path(path: str) -> bool:
    """A Lance dataset is a directory named *.lance or one carrying the
    Lance `_versions` manifest directory."""
    return path.endswith(".lance") or (
        os.path.isdir(path) and os.path.isdir(os.path.join(path, "_versions"))
    )


def read_docs(path: str, **kwargs):
    """Read an interleaved-docs table: native Lance when the ``lance``
    package is importable and the path IS a Lance dataset, JSONL for
    ``*.jsonl`` / ``*.json`` paths (``ray.data.read_json`` — the
    web-corpus interchange format), parquet otherwise (the offline
    stand-in — every branch yields the same schema,
    tests/test_ops.py::test_read_docs_branches)."""
    import ray.data

    if HAS_LANCE and _is_lance_path(path):
        return ray.data.read_lance(path, **kwargs)
    if path.endswith((".jsonl", ".json")):
        cols = kwargs.pop("columns", None)
        ds = ray.data.read_json(path, **kwargs)
        if cols:
            ds = ds.select_columns(cols)
        return ds
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
