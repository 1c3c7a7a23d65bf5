"""Incremental (streaming) exact dedup against a shared mutable index.

Batch dedup (``stages.dedup.exact_dedup``) answers "which docs in THIS
dataset are duplicates of each other".  A streaming ingest pipeline needs a
different contract: "is this doc a duplicate of ANYTHING seen so far —
including previous runs" — i.e. a shared mutable seen-set that outlives any
one Dataset execution.  That is the one shape the Dataset API genuinely
cannot express (the brief's sanctioned use of raw actors: a shared mutable
index), so the index is a pool of ``num_cpus=0`` shard actors:

* the fingerprint space is hash-partitioned over ``n_shards`` actors
  (md5 keys are uniform — shards balance by construction), so index
  capacity and RPC throughput both scale horizontally, exactly like a
  multi-node membership service would;
* each ``map_batches`` task groups its fingerprints by shard and issues ONE
  batched RPC per (batch, shard) — RPC count is O(batches·shards), never
  O(rows);
* ``check_and_add`` is atomic per shard, so across any interleaving of
  concurrent batches EXACTLY ONE document per fingerprint group is kept.
  WHICH one is arrival-order (streaming first-wins semantics) — that is
  the documented contract, and why this op has no SQL oracle (DuckDB has
  no arrival order); the keep-COUNT law (one per distinct fingerprint,
  zero once a fingerprint is in the index) is pytest-verified instead.

Fingerprint law = exact_dedup's md5-of-normalized-text (NULL ⇒ ''), so a
corpus streamed through ``incremental_dedup`` keeps exactly one doc per
exact_dedup group.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..stages.textstats import fingerprint_batch
from ..util import default_pool


@ray.remote(num_cpus=0)
class _SeenShard:
    """One hash-shard of the seen-fingerprint set."""

    def __init__(self):
        self.seen: set[str] = set()

    def check_and_add(self, fps: list[str]) -> list[bool]:
        """For each fingerprint IN ORDER: True iff already seen (by a
        previous call or an earlier element of this call); adds all."""
        seen = self.seen
        out = []
        for f in fps:
            if f in seen:
                out.append(True)
            else:
                seen.add(f)
                out.append(False)
        return out

    def size(self) -> int:
        return len(self.seen)

    def save(self, path: str) -> int:
        """Persist this shard's set as parquet (atomic rename) — each
        shard writes its OWN file, so a checkpoint is shard-parallel and
        never funnels the index through the driver."""
        import os

        import pyarrow.parquet as pq

        t = pa.table({"fp": pa.array(sorted(self.seen), pa.string())})
        pq.write_table(t, path + ".tmp")
        os.replace(path + ".tmp", path)
        return len(self.seen)

    def load(self, path: str) -> int:
        import os

        import pyarrow.parquet as pq

        if os.path.exists(path):
            col = pq.read_table(path).column("fp")
            self.seen.update(col.to_pylist())
        return len(self.seen)


class IncrementalIndex:
    """Handle to a sharded seen-set.  Create once per ingest session and
    pass to any number of :func:`incremental_dedup` runs — state carries
    across runs (micro-batches) for the lifetime of the handle."""

    def __init__(self, n_shards: int = 8):
        self.n_shards = n_shards
        self.shards = [_SeenShard.remote() for _ in range(n_shards)]

    def sizes(self) -> list[int]:
        return ray.get([s.size.remote() for s in self.shards])

    def save(self, out_dir: str) -> list[int]:
        """Checkpoint the index: one parquet per shard, written by the
        shard actor itself (shard-parallel, atomic per file)."""
        import os

        os.makedirs(out_dir, exist_ok=True)
        return ray.get([
            s.save.remote(os.path.join(out_dir, f"shard-{i}.parquet"))
            for i, s in enumerate(self.shards)])

    @classmethod
    def load(cls, out_dir: str, n_shards: int = 8) -> "IncrementalIndex":
        """Restore a checkpointed index (shard count must match the
        save — the fp→shard hash law depends on it)."""
        import os

        idx = cls(n_shards=n_shards)
        ray.get([
            s.load.remote(os.path.join(out_dir, f"shard-{i}.parquet"))
            for i, s in enumerate(idx.shards)])
        return idx


def incremental_dedup(docs_ds, index: IncrementalIndex, *,
                      text_col: str = "text", id_col: str = "doc_id"):
    """Tag each doc with ``is_dup`` = 1 iff its fingerprint was already in
    ``index`` (or earlier in the stream); adds every fingerprint.  Output:
    ``(id, fingerprint, is_dup)``.

    The stage is an actor-pool ``map_batches`` holding the shard handles;
    each batch costs one fingerprint pass + ``n_shards`` batched RPCs.
    """
    shards = index.shards
    n_shards = index.n_shards

    class Tag:
        def __call__(self, batch: pa.Table) -> pa.Table:
            t = fingerprint_batch(batch, text_col=text_col, id_col=id_col)
            fps = t.column("fingerprint").to_pylist()
            shard_of = np.array([int(f[:4], 16) % n_shards for f in fps],
                                np.int64)
            dup = np.zeros(len(fps), bool)
            futs, idxs = [], []
            for s in range(n_shards):
                ix = np.nonzero(shard_of == s)[0]
                if len(ix):
                    futs.append(shards[s].check_and_add.remote(
                        [fps[i] for i in ix]))
                    idxs.append(ix)
            for ix, res in zip(idxs, ray.get(futs)):
                dup[ix] = res
            return t.append_column(
                "is_dup", pa.array(dup.astype(np.int64), pa.int64()))

    return docs_ds.map_batches(Tag, batch_format="pyarrow",
                               concurrency=default_pool())
