"""Small shared helpers."""

from __future__ import annotations


def key_hash(df, keys: list[str]):
    """Combined uint64 hash over key COLUMNS (FNV-style mix per column).

    Hashing each column separately and mixing avoids the ambiguity of a
    string join (keys containing the separator would collide group-wise —
    and Ray's groupby strips NUL bytes from string keys, so separator
    joins are doubly unsafe; see CLAUDE.md).  For a single key the mix is
    the identity, so this equals the plain per-series law.
    """
    import numpy as np
    import pandas as pd

    h = np.zeros(len(df), np.uint64)
    for k in keys:
        hk = pd.util.hash_pandas_object(df[k], index=False).to_numpy()
        with np.errstate(over="ignore"):
            h = h * np.uint64(1099511628211) + hk
    return h


def bucket_hash(data, n_buckets: int, keys: list[str] | None = None):
    """THE coarse-bucket law: ``hash(keys) % n_buckets`` as int64.

    One definition for every bucketed shuffle in the engine (joins, dedup,
    cluster, analytics, textstats) so a pipeline and its in-bucket kernel
    can never silently drift apart.  ``data`` is a Series/Index (keys
    omitted) or a DataFrame with ``keys`` naming the hash columns.  The
    hash is ``pd.util.hash_pandas_object`` — process-stable fixed-key
    siphash, identical across workers with no seed plumbing.
    """
    import numpy as np
    import pandas as pd

    if keys is not None:
        h = key_hash(data, keys)
    else:
        h = pd.util.hash_pandas_object(data, index=False).to_numpy()
    return (h % np.uint64(n_buckets)).astype(np.int64)


def pair_bucket(left, right=None, n_buckets: int = 256):
    """THE coarse pair-bucket law: ``(l·1_000_003 + r) % n_buckets`` as
    int64 (``r`` omitted → a left-keyed bucket).  One definition for every
    pair-combine shuffle (ngram/cross-near-dup/winnow pair counts,
    meta-blocking, multi-pass SNM) so two stages that must co-locate the
    same pair can never silently drift.  int64 overflow wraps (numpy C
    semantics) identically everywhere, and ``%`` of a positive divisor is
    non-negative, so the bucket id is always a valid group key.
    """
    import numpy as np

    l = np.asarray(left, np.int64)
    h = l * np.int64(1_000_003)
    if right is not None:
        h = h + np.asarray(right, np.int64)
    return (h % np.int64(n_buckets)).astype(np.int64)


def default_pool(lo: int = 1, floor: int = 8) -> tuple[int, int]:
    """Actor-pool ``concurrency`` that follows the cluster.

    ``(1, max(floor, CPUs))`` — the min stays 1 (a min >= 2 can deadlock a
    4-cpu test session; see CLAUDE.md), the max tracks the cluster so a
    32-core node isn't capped at 8 actors.  Falls back to ``floor`` when Ray
    isn't initialized (pure-library use).
    """
    try:
        import ray

        if ray.is_initialized():
            ncpu = int(ray.cluster_resources().get("CPU", floor))
            return (lo, max(floor, ncpu))
    except Exception:
        pass
    return (lo, floor)


def table_or_dataset(tbl):
    """Wrap a driver-side final result table as a Dataset — EXCEPT 0-row
    tables, which return the ``pyarrow.Table`` itself: this Ray build's
    ``Dataset.to_pandas()`` on a 0-row dataset drops the schema entirely
    (a bare ``pd.DataFrame()`` with no columns), which breaks
    empty-vs-empty oracle compares (the driver checks COLUMN names even
    on zero rows).  The registry contract allows Dataset | DataFrame |
    pyarrow.Table, so callers see a uniform ``.to_pandas()`` surface."""
    if tbl.num_rows == 0:
        return tbl
    import ray.data as rd

    return rd.from_arrow(tbl)
