"""Corpus-curation operators a training-data pipeline runs between dedup and
training: deterministic stratified sampling (dataset mixing) and benchmark
decontamination.  Both are map-only (no shuffle), so they stream at any
scale; both are deterministic pure functions of the row, so a resumed or
re-run job reproduces the identical sample/keep set.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _md5_low64(s: str) -> int:
    """Low 64 bits of md5, little-endian — == DuckDB ``md5_number_lower``
    (the repo-standard oracle-exact hash; see dedup._hash_shingles_u64)."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")


def stratified_sample(docs_ds, rates_bp: dict[str, int], *,
                      default_bp: int = 0, key_col: str = "source",
                      id_col: str = "doc_id"):
    """Deterministic per-stratum sampling for dataset mixing.

    A row is kept iff ``md5_low64(str(id)) % 10000 < rates_bp[stratum]``
    (rates in basis points).  Membership is a pure function of the id, so
    the mix is reproducible across runs and machines, composes with
    resumable jobs (a re-run keeps exactly the same rows), and needs no
    shuffle or global state — unlike ``Dataset.random_sample``, which is
    seed- and partitioning-dependent.
    """
    def keep_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        keys = batch.column(key_col).to_pylist()
        keep = [
            _md5_low64(str(i)) % 10000 < rates_bp.get(k, default_bp)
            for i, k in zip(ids, keys)
        ]
        return batch.filter(pa.array(keep, pa.bool_()))

    return docs_ds.map_batches(keep_batch, batch_format="pyarrow")


def _word_ngrams(text: str, n: int) -> list[str]:
    """Distinct word n-grams of ``lower(trim(text))`` split on whitespace —
    the same construction the ngram/minhash oracles use in SQL."""
    toks = (text or "").lower().split()
    if len(toks) < n:
        return []
    return list({" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)})


def build_probe_ngrams(probe_ds, *, n: int = 8, text_col: str = "text") -> set:
    """Distinct word n-grams of the probe (benchmark) corpus, collected to a
    driver set.  The probe side is SMALL by definition (eval benchmarks are
    a few thousand documents); the big side never leaves the cluster."""
    out: set = set()
    for b in probe_ds.select_columns([text_col]).iter_batches(
            batch_format="pyarrow"):
        for t in b.column(text_col).to_pylist():
            out.update(_word_ngrams(t, n))
    return out


def decontaminate(docs_ds, probe_ngrams: set, *, n: int = 8,
                  text_col: str = "text", id_col: str = "doc_id"):
    """Benchmark decontamination: flag every training document sharing any
    word ``n``-gram with the probe (benchmark) corpus.

    Returns one row per input doc: ``(doc_id, n_hits, keep)`` where
    ``n_hits`` counts distinct overlapping n-grams and ``keep = 1`` iff
    there is no overlap — the downstream trainer filters on ``keep``.  The
    probe n-gram set is broadcast once via ``ray.put`` and read per actor
    in ``__init__`` (string membership — exact semantics, no hash
    collisions to reason about; a hashed variant only becomes necessary
    when the probe side itself stops fitting in memory, which for eval
    benchmarks it does not).
    """
    import ray

    probe_ref = ray.put(probe_ngrams)

    class Decontaminate:
        def __init__(self):
            self.probe = ray.get(probe_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            probe = self.probe
            ids = batch.column(id_col).to_pylist()
            texts = batch.column(text_col).to_pylist()
            hits = np.empty(len(ids), np.int64)
            for i, t in enumerate(texts):
                hits[i] = sum(1 for g in _word_ngrams(t, n) if g in probe)
            return pa.table({
                id_col: batch.column(id_col),
                "n_hits": pa.array(hits, pa.int64()),
                "keep": pa.array((hits == 0).astype(np.int64), pa.int64()),
            })

    from ..util import default_pool

    return docs_ds.map_batches(Decontaminate, batch_format="pyarrow",
                               concurrency=default_pool())
