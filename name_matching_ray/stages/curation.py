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
import pyarrow.compute as pc


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


def token_budget_select(docs_ds, *, budget: int, key_col: str = "source",
                        text_col: str = "text", id_col: str = "doc_id",
                        n_buckets: int = 256):
    """Per-source token budgeting — the mixing primitive that fills each
    domain's quota: within every ``key_col`` stratum, rank docs
    longest-first (``n_words`` DESC, ``doc_id`` ASC — deterministic) and
    keep a doc iff the running token total INCLUDING it stays within
    ``budget``.  Output per doc: ``(doc_id, source, n_words, cum_words,
    keep)``, all integers — ``cum_words`` is the SQL window sum
    ``SUM(n_words) OVER (PARTITION BY source ORDER BY n_words DESC,
    doc_id ROWS UNBOUNDED PRECEDING)``.

    ``n_words`` is the ``\\S+`` RE2 count (the gopher_rules law, == SQL
    ``length(regexp_extract_all(t, '\\S+'))``); NULL text coalesces to
    ``''`` (0 words — costs nothing, always kept if the budget isn't
    already blown by ties ahead of it).

    Scale shape: the shuffle key is ``hash(source) % n_buckets`` — each
    stratum lands whole in one bucket while the shuffle makes
    ~``n_buckets`` Ray groups (domains number 10²–10⁵ at web scale, and
    the per-key-group pathology is documented); in-bucket ranking is one
    vectorized sort + groupby-cumsum.  Per-stratum row counts are the
    only skew axis — the same one every PARTITION BY carries.
    """
    import hashlib

    import pandas as pd

    def measure(batch: pa.Table) -> pa.Table:
        text = pc.coalesce(batch.column(text_col),
                           pa.scalar("", pa.string()))
        nw = pc.count_substring_regex(text, r"\S+")
        keys = batch.column(key_col)
        kcodes, kuniq = pd.factorize(
            keys.to_numpy(zero_copy_only=False))
        bk = np.fromiter(
            (int.from_bytes(hashlib.md5(str(u).encode()).digest()[:4],
                            "big") % n_buckets for u in kuniq),
            dtype=np.int64, count=len(kuniq))
        return pa.table({
            id_col: batch.column(id_col),
            key_col: keys,
            "n_words": pc.cast(nw, pa.int64()),
            "_bk": pa.array(bk[kcodes], pa.int64()),
        })

    def rank_bucket(df) -> pa.Table:
        df = df.sort_values([key_col, "n_words", id_col],
                            ascending=[True, False, True],
                            kind="mergesort")
        cum = df.groupby(key_col, sort=False)["n_words"].cumsum() \
            .to_numpy(np.int64)
        return pa.table({
            id_col: pa.array(df[id_col].to_numpy(), pa.int64()),
            key_col: pa.array(df[key_col].to_numpy(), pa.string()),
            "n_words": pa.array(df["n_words"].to_numpy(np.int64),
                                pa.int64()),
            "cum_words": pa.array(cum, pa.int64()),
            "keep": pa.array((cum <= budget).astype(np.int64), pa.int64()),
        })

    return docs_ds.map_batches(measure, batch_format="pyarrow") \
        .groupby("_bk").map_groups(rank_bucket, batch_format="pandas")


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


def shuffle_shards(docs_ds, *, n_shards: int = 16, id_col: str = "doc_id"):
    """Deterministic global training-data shuffle: every doc gets a
    pseudo-random rank ``h = md5_low64(str(id))`` (the repo-standard
    oracle-exact hash), ``shard = h % n_shards``, and ``pos`` = the doc's
    0-based rank within its shard ordered by ``(h, id)``.  The (shard, pos)
    order is a uniform random permutation that is a pure function of the
    ids — reproducible across runs, machines and partitionings, unlike
    ``Dataset.random_shuffle``.

    One Ray group per shard is the intended partitioning: ``n_shards`` is
    the number of OUTPUT files (hundreds to thousands at 100 TB, sized so
    one shard fits a reduce task) — not a per-key groupby over millions of
    keys.  Returns ``(id, shard, pos)``; compose with
    :func:`export_shards` to land the shuffled corpus on disk.
    """
    import pandas as pd

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        hs = [_md5_low64(str(i)) for i in ids]
        return pa.table({
            id_col: batch.column(id_col),
            "_h": pa.array(hs, pa.uint64()),
            "shard": pa.array([h % n_shards for h in hs], pa.int64()),
        })

    def rank(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["_h", id_col], kind="mergesort")
        return pa.table({
            id_col: pa.array(g[id_col].to_numpy(), pa.int64()),
            "shard": pa.array(g["shard"].to_numpy(), pa.int64()),
            "pos": pa.array(np.arange(len(g), dtype=np.int64), pa.int64()),
        })

    return docs_ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("shard").map_groups(rank, batch_format="pandas")


def export_shards(docs_ds, out_dir: str, *, n_shards: int = 16,
                  id_col: str = "doc_id"):
    """Resumable training-corpus export: land the deterministic shuffle of
    :func:`shuffle_shards` as ``out_dir/shard=K/`` partitioned parquet plus
    a ``manifest.json`` of per-shard row counts.

    Shards already listed in an existing manifest are SKIPPED on re-run
    (the shard is the resume unit — a failed export redoes only unfinished
    shards), and because the shuffle is a pure function of the ids, the
    resumed output is identical to a single-shot run.
    """
    import json
    import os

    # underscore prefix: invisible to Arrow/Spark dataset discovery
    manifest_path = os.path.join(out_dir, "_manifest.json")
    done: dict[str, int] = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            done = json.load(f)

    tagged = shuffle_shards(docs_ds, n_shards=n_shards, id_col=id_col)
    todo = [s for s in range(n_shards) if str(s) not in done]
    if todo:
        import pyarrow.compute as pc

        todo_arr = pa.array(todo, pa.int64())

        def keep(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.is_in(batch.column("shard"), value_set=todo_arr))

        remaining = tagged.map_batches(keep, batch_format="pyarrow")
        remaining.write_parquet(out_dir, partition_cols=["shard"])
        import pyarrow.dataset as pads

        written = pads.dataset(out_dir, partitioning="hive")
        counts = {}
        for s in todo:
            counts[str(s)] = written.count_rows(
                filter=pads.field("shard") == s)
        done.update(counts)
    os.makedirs(out_dir, exist_ok=True)
    with open(manifest_path, "w") as f:
        json.dump(done, f, sort_keys=True)
    return done


# RE2 patterns shared verbatim with the DuckDB oracle (both engines ARE RE2,
# so replace/count semantics match byte-for-byte; verified in tests).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?\d{1,2}[ .-]?\(\d{3}\)[ .-]?\d{3}[ .-]?\d{4}", "<PHONE>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
)


def redact_pii(docs_ds, *, text_col: str = "text", id_col: str = "doc_id",
               patterns=PII_PATTERNS):
    """PII scrubbing for training corpora: count and redact emails / phone
    numbers / IPv4 addresses, applied in ``patterns`` order (each rewrite
    sees the previous one's output, so an email is never double-counted as
    a phone).  Map-only, fully vectorized (pyarrow RE2 kernels), streams at
    any scale.  Returns one row per doc:
    ``(doc_id, n_<kind>..., clean_len)`` where ``clean_len`` is the
    character length of the redacted text — all integers, exactly
    reproducible in SQL because DuckDB's regex engine is the same RE2.
    """
    import pyarrow.compute as pc

    def scrub(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        cols = [batch.column(id_col)]
        names = [id_col]
        for kind, pat, repl in patterns:
            cols.append(pc.cast(pc.count_substring_regex(text, pat),
                                pa.int64()))
            names.append(f"n_{kind}")
            text = pc.replace_substring_regex(text, pattern=pat,
                                              replacement=repl)
        cols.append(pc.cast(pc.utf8_length(text), pa.int64()))
        names.append("clean_len")
        return pa.Table.from_arrays(cols, names=names)

    return docs_ds.map_batches(scrub, batch_format="pyarrow")


def pack_sequences(docs_ds, *, cap: int, shard_size: int = 100,
                   text_col: str = "text", id_col: str = "doc_id",
                   n_buckets: int = 256):
    """Greedy sequence packing for pretraining: walk docs in ``doc_id``
    order and append each to the current bin while the bin's token total
    stays ≤ ``cap``; otherwise open a new bin (an oversize doc gets a bin
    of its own — no splitting).  Token count is whitespace tokens
    (``\\S+``), the repo-standard definition shared with text_stats.

    Greedy packing is inherently a sequential scan, so it is parallelized
    the way real pretraining pipelines shard it: packing restarts at every
    ``shard_size`` block of doc_ids (``shard = doc_id // shard_size``) and
    shards pack independently — each output file of a 100-TB run is one or
    more whole shards, so a resumed job repacks only unfinished shards.
    Shards are co-located via the hash%``n_buckets`` coarse-group pattern
    (never one Ray group per shard), and the per-row work inside a bucket
    is a few integer ops.

    Returns ``(doc_id, shard, bin, fill)``: 0-based bin within the shard
    and the bin's running token total after this doc.
    """
    import pandas as pd
    import pyarrow.compute as pc

    def tokens(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        shard = ids // shard_size
        tok = pc.count_substring_regex(batch.column(text_col), r"\S+")
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "shard": pa.array(shard, pa.int64()),
            "tok": pc.cast(tok, pa.int64()),
            "_ub": pa.array(shard % n_buckets, pa.int64()),
        })

    def pack_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["shard", id_col], kind="mergesort")
        shard = g["shard"].to_numpy()
        tok = g["tok"].to_numpy()
        n = len(g)
        bins = np.empty(n, np.int64)
        fill = np.empty(n, np.int64)
        b = f = 0
        prev_shard = None
        for i in range(n):
            if shard[i] != prev_shard:
                prev_shard, b, f = shard[i], 0, tok[i]
            elif f + tok[i] <= cap:
                f += tok[i]
            else:
                b, f = b + 1, tok[i]
            bins[i] = b
            fill[i] = f
        return pa.table({
            id_col: pa.array(g[id_col].to_numpy(), pa.int64()),
            "shard": pa.array(shard, pa.int64()),
            "bin": pa.array(bins, pa.int64()),
            "fill": pa.array(fill, pa.int64()),
        })

    return docs_ds.map_batches(tokens, batch_format="pyarrow") \
        .groupby("_ub").map_groups(pack_bucket, batch_format="pandas")


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


def cross_dedup(docs_ds, ref_ds, *, text_col: str = "text",
                id_col: str = "doc_id", broadcast: bool = True,
                buckets: int = 256):
    """Cross-corpus exact dedup (hash anti-join): flag every doc whose text
    hash (md5 low64 — the repo-standard oracle-exact hash) appears in a
    REFERENCE corpus (an already-ingested crawl, a held-out eval split).
    Returns ``(id, keep)`` for EVERY input doc — keep=1 iff the text is new.
    Keeping the flag (not filtering) keeps the row count stable for audits
    and lets the caller count removals before committing the filter.

    Two plans, equality-tested (tests/test_curation.py):

    - ``broadcast=True`` (default — the usual case: the ref side is an eval
      benchmark or a bounded ingest ledger): the ref hashes are collected
      ONCE into a sorted uint64 array (8 B/doc) placed in the object store,
      and every batch probes it with ``searchsorted`` — a map-only plan, the
      big side never shuffles.
    - ``broadcast=False`` (scale path for a web-scale ref corpus): both
      sides ship ONLY ``(hash, id, side)`` through a single groupby on
      ``hash % buckets``; membership is vectorized pandas ``isin`` inside
      each coarse bucket.  One shuffle, volume = 16 B/row.
    """
    import ray

    # NULL text follows SQL semantics: md5_number_lower(NULL) is NULL, which
    # never equi-joins — a null-text doc is always kept, a null-text ref row
    # is dropped.  (Empty string is a real value and matches empty string.)
    def _hashes(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        texts = batch.column(text_col).to_pylist()
        hs = np.array(
            [0 if t is None else _md5_low64(t) for t in texts],
            dtype=np.uint64,
        )
        valid = np.array([t is not None for t in texts], dtype=bool)
        return hs, valid

    if broadcast:
        chunks = []
        for b in ref_ds.select_columns([text_col]) \
                .iter_batches(batch_format="pyarrow"):
            hs, valid = _hashes(b)
            chunks.append(hs[valid])
        ref_arr = np.unique(np.concatenate(chunks)) if chunks \
            else np.empty(0, np.uint64)
        ref_ref = ray.put(ref_arr)

        class Probe:
            def __init__(self):
                self.h = ray.get(ref_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                hs, valid = _hashes(batch)
                if len(self.h) and len(hs):
                    idx = np.searchsorted(self.h, hs)
                    idx[idx == len(self.h)] = 0
                    found = (self.h[idx] == hs) & valid
                else:
                    found = np.zeros(len(hs), dtype=bool)
                return pa.table({
                    id_col: batch.column(id_col),
                    "keep": pa.array((~found).astype(np.int64), pa.int64()),
                })

        from ..util import default_pool

        return docs_ds.map_batches(Probe, batch_format="pyarrow",
                                   concurrency=default_pool())

    import pandas as pd

    _sch = docs_ds.schema()
    id_type = _sch.types[_sch.names.index(id_col)]

    def tag(side: int):
        def f(batch: pa.Table) -> pa.Table:
            hs, valid = _hashes(batch)
            if side:
                ids = batch.column(id_col).combine_chunks() \
                    if isinstance(batch.column(id_col), pa.ChunkedArray) \
                    else batch.column(id_col)
            else:
                # null-text ref rows drop here (SQL: NULL never joins)
                hs = hs[valid]
                ids = pa.nulls(len(hs), id_type)
                valid = np.ones(len(hs), dtype=bool)
            return pa.table({
                "_h": pa.array(hs, pa.uint64()),
                id_col: ids,
                "_side": pa.array(np.full(len(hs), side, np.int8), pa.int8()),
                "_valid": pa.array(valid, pa.bool_()),
                "_ub": pa.array((hs % np.uint64(buckets)).astype(np.int64),
                                pa.int64()),
            })
        return f

    both = docs_ds.map_batches(tag(1), batch_format="pyarrow").union(
        ref_ds.map_batches(tag(0), batch_format="pyarrow"))
    # union SUMS the two sides' block counts; right-size the shuffle width
    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    both = both.repartition(max(16, 2 * n_cpus))

    def anti(g: pd.DataFrame) -> pa.Table:
        ref_h = g.loc[g["_side"] == 0, "_h"]
        d = g[g["_side"] == 1]
        keep = (~d["_h"].isin(ref_h)) | (~d["_valid"])
        return pa.table({
            id_col: pa.Array.from_pandas(d[id_col], type=id_type),
            "keep": pa.array(keep.to_numpy().astype(np.int64), pa.int64()),
        })

    return both.groupby("_ub").map_groups(anti, batch_format="pandas")


def split_by_cluster(cc_ds, *, train_bp: int = 9000, id_col: str = "doc_id",
                     cluster_col: str = "cluster_id"):
    """Leakage-safe train/validation split: the SPLIT UNIT is the near-dup
    cluster, not the row.  A document's split is a pure deterministic
    function of its cluster label (``md5_low64(str(label)) % 10000 <
    train_bp``, the stratified_sample membership law), so two near-duplicate
    documents can NEVER straddle train/val — the contamination path a
    row-level random split leaves open.  Map-only over the labeled table
    (compose with connected_components / dedup_keep_list); reproducible
    across runs, machines and partitionings.  Output: ``(id, cluster,
    is_train)``.
    """
    def assign(batch: pa.Table) -> pa.Table:
        labs = batch.column(cluster_col).to_pylist()
        is_tr = [1 if _md5_low64(str(lb)) % 10000 < train_bp else 0
                 for lb in labs]
        return pa.table({
            id_col: batch.column(id_col),
            cluster_col: batch.column(cluster_col),
            "is_train": pa.array(is_tr, pa.int64()),
        })

    return cc_ds.map_batches(assign, batch_format="pyarrow")


def bloom_cross_dedup(docs_ds, ref_ds, *, m_bits: int = 1 << 20, k: int = 4,
                      text_col: str = "text", id_col: str = "doc_id"):
    """Bloom-filter cross-corpus dedup — the BFF idiom (Dolma's Bloom
    Filter deduper; Bloom 1970): membership of an arbitrarily large
    reference corpus compressed into a FIXED ``m_bits``-bit filter.  A doc
    is flagged ``keep=0`` iff ALL ``k`` of its probe bits are set —
    deterministic false positives at a rate ≈ (set_bits/m)^k, chosen via
    ``m_bits``/``k``, never false negatives.

    Why this exists next to :func:`cross_dedup`: the exact anti-join ships
    every reference hash (8 B/doc — 8 TB of filter state for a 10¹²-doc
    crawl); the Bloom filter's memory is ``m_bits/8`` bytes REGARDLESS of
    reference size, making it the configuration for "have we ever crawled
    this page" ledgers.  Probe bit ``i`` of a text is
    ``md5_low64(text + '#' + str(i)) % m_bits`` (== DuckDB
    ``md5_number_lower(text || '#' || i)``), so the whole operator —
    including its false positives — is exactly reproducible in the SQL
    oracle.

    Plan: the reference side emits per-batch DISTINCT positions, one lean
    groupby dedups them (≤ k·rows int64 through the exchange), and the
    driver materializes only the ≤ ``m_bits`` distinct positions into a
    packed bitmap (``m_bits/8`` bytes — bounded by the FILTER size, the
    Bloom property, not by the data) broadcast via ``ray.put``.  Probing
    is map-only.  NULL text: a ref NULL sets no bits, a doc NULL is kept
    (SQL join semantics, same as cross_dedup).
    """
    import ray
    from ray.data.aggregate import Count

    def _positions(texts: list) -> list:
        # k probe positions per non-null text, row-aligned
        return [None if t is None else
                [_md5_low64(f"{t}#{s}") % m_bits for s in range(k)]
                for t in texts]

    def ref_pos(batch: pa.Table) -> pa.Table:
        pos = [p for ps in _positions(batch.column(text_col).to_pylist())
               if ps is not None for p in ps]
        return pa.table({"pos": pa.array(np.unique(np.asarray(
            pos, dtype=np.int64)) if pos else [], pa.int64())})

    distinct = ref_ds.select_columns([text_col]) \
        .map_batches(ref_pos, batch_format="pyarrow") \
        .groupby("pos").aggregate(Count())
    bitmap = np.zeros(m_bits >> 3, np.uint8)
    pos_arr = distinct.select_columns(["pos"]).to_pandas()["pos"] \
        .to_numpy(dtype=np.int64)
    np.bitwise_or.at(bitmap, pos_arr >> 3,
                     np.left_shift(np.uint8(1), (pos_arr & 7).astype(np.uint8)))
    bm_ref = ray.put(bitmap)

    class Probe:
        def __init__(self):
            self.bm = ray.get(bm_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keep = []
            bm = self.bm
            for ps in _positions(batch.column(text_col).to_pylist()):
                if ps is None:
                    keep.append(1)
                else:
                    keep.append(0 if all(
                        (bm[p >> 3] >> (p & 7)) & 1 for p in ps) else 1)
            return pa.table({
                id_col: batch.column(id_col),
                "keep": pa.array(keep, pa.int64()),
            })

    from ..util import default_pool

    return docs_ds.map_batches(Probe, batch_format="pyarrow",
                               concurrency=default_pool())


def group_sample(docs_ds, *, k: int = 5, group_col: str = "lang",
                 id_col: str = "doc_id"):
    """Deterministic per-group k-sample — the eval-set / spot-check draw
    ("give me 5 random docs per language, the same 5 every run").  Rank =
    the repo-standard pseudo-random hash ``md5_low64(str(id))`` ordered
    ``(h, id)`` within each group; keep rank ≤ k.  A pure function of the
    ids: reproducible across runs, machines and partitionings.

    Scale shape: the per-batch per-group k-smallest partial is provably
    lossless (any global top-k row is a batch top-k row), so the final
    per-group merge sees ≤ k rows per (batch, group) — groups here are
    the handful of strata, never the corpus.

    Output: ``(group, id, rank)`` with rank 1-based.
    """
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        g = pd.DataFrame({
            group_col: batch.column(group_col).to_numpy(
                zero_copy_only=False),
            id_col: batch.column(id_col).to_numpy(zero_copy_only=False),
            "_h": np.array([_md5_low64(str(i)) for i in ids], np.uint64),
        })
        g = g.sort_values(["_h", id_col], kind="mergesort") \
            .groupby(group_col, sort=False).head(k)
        return pa.Table.from_pandas(g, preserve_index=False)

    def merge(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["_h", id_col], kind="mergesort").head(k)
        return pa.table({
            group_col: pa.array(g[group_col].to_numpy(), pa.string()),
            id_col: pa.array(g[id_col].to_numpy(np.int64), pa.int64()),
            "rank": pa.array(np.arange(1, len(g) + 1, dtype=np.int64),
                             pa.int64()),
        })

    return docs_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(group_col).map_groups(merge, batch_format="pandas")


def temperature_mix(docs_ds, *, budget: int, group_col: str = "source",
                    id_col: str = "doc_id"):
    """Temperature-based source rebalancing (the T=2 multilingual-sampling
    law: sample share ∝ √(source size), which upweights small sources
    relative to proportional sampling).  Per-source keep rate:

        ``w_s = floor(sqrt(n_s))``  (IEEE sqrt is correctly rounded, so
        numpy and DuckDB agree bit-for-bit; the floor makes it integer)
        ``target_s = budget · w_s // Σ w``
        ``rate_bp_s = min(10000, target_s · 10000 // n_s)``

    and a doc keeps iff ``md5_low64(str(id)) % 10000 < rate_bp_s`` —
    stratified_sample's deterministic membership law with computed rates.

    Output: one row per doc ``(id, group, rate_bp, keep)``.

    Scale shape: pass 1 is a per-batch count partial → Sum over
    ≤ |sources| keys, collected to a DRIVER DICT that is bounded by the
    source vocabulary (a curated corpus has 10²-10⁴ sources; this is the
    documented broadcast-small-side pattern, not an unbounded collect);
    pass 2 is map-only with the rate dict shipped once via ``ray.put``.
    """
    import pandas as pd

    import ray
    from ray.data.aggregate import Sum

    def count_partial(df: pd.DataFrame) -> pa.Table:
        c = df.groupby(group_col).size()
        return pa.table({group_col: pa.array(c.index.to_numpy(), pa.string()),
                         "n": pa.array(c.to_numpy(np.int64), pa.int64())})

    rows = docs_ds.map_batches(count_partial, batch_format="pandas") \
        .groupby(group_col).aggregate(Sum("n", alias_name="n")).take_all()
    n_by = {r[group_col]: int(r["n"]) for r in rows}
    w_by = {s: int(np.floor(np.sqrt(np.float64(n)))) for s, n in n_by.items()}
    w_sum = sum(w_by.values())
    rate_bp = {
        s: min(10_000, (budget * w_by[s] // max(w_sum, 1)) * 10_000
               // max(n_by[s], 1))
        for s in n_by
    }
    bc = ray.put(rate_bp)

    class Tag:
        def __init__(self):
            self.rates = ray.get(bc)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_pylist()
            src = batch.column(group_col).to_numpy(zero_copy_only=False)
            rb = np.array([self.rates.get(s, 0) for s in src], np.int64)
            h = np.array([_md5_low64(str(i)) % 10_000 for i in ids],
                         np.int64)
            return pa.table({
                id_col: batch.column(id_col),
                group_col: batch.column(group_col),
                "rate_bp": pa.array(rb, pa.int64()),
                "keep": pa.array((h < rb).astype(np.int64), pa.int64()),
            })

    from ..util import default_pool

    return docs_ds.map_batches(Tag, batch_format="pyarrow",
                               concurrency=default_pool())


def export_jsonl(docs_ds, out_dir: str, *, n_shards: int = 8,
                 id_col: str = "doc_id"):
    """Resumable JSONL export — the web-corpus interchange sink matching
    the JSONL reader (``sources.docs_source.read_docs``).  Rows are
    deterministically sharded by ``md5_low64(str(id)) % n_shards`` and
    each shard lands as ``out_dir/shard-K.jsonl`` via a Ray task; a
    ``_manifest.json`` of per-shard row counts makes the SHARD the
    resume unit — a re-run skips finished shards and (because the shard
    assignment is a pure function of the ids) reproduces the remaining
    files byte-for-byte.

    Returns the manifest dict.  At 100 TB, ``n_shards`` is sized so one
    shard fits one task's disk/bandwidth budget (hundreds to thousands);
    shard writes run in parallel as independent Ray tasks.
    """
    import json
    import os

    import ray

    manifest_path = os.path.join(out_dir, "_manifest.json")
    done: dict[str, int] = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            done = json.load(f)
    os.makedirs(out_dir, exist_ok=True)

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        sh = np.array([_md5_low64(str(i)) % n_shards for i in ids],
                      np.int64)
        return batch.append_column("shard", pa.array(sh, pa.int64()))

    tagged = docs_ds.map_batches(tag, batch_format="pyarrow")
    todo = set(s for s in range(n_shards) if str(s) not in done)

    def write_group(g) -> pa.Table:
        # runs INSIDE the reduce task — file bytes never touch the driver
        import pandas as pd  # noqa: F401

        if not len(g):
            return pa.table({"shard": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        s = int(g["shard"].iloc[0])
        if s not in todo:  # finished in a previous run — resume skip
            return pa.table({"shard": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        g = g.drop(columns=["shard"]).sort_values(id_col, kind="mergesort")
        path = os.path.join(out_dir, f"shard-{s}.jsonl")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            if len(g):
                f.write(g.to_json(orient="records", lines=True))
                f.write("\n")
        os.replace(tmp, path)
        return pa.table({"shard": pa.array([s], pa.int64()),
                         "n": pa.array([len(g)], pa.int64())})

    if todo:
        counts = tagged.groupby("shard").map_groups(
            write_group, batch_format="pandas").take_all()
        for r in counts:
            done[str(int(r["shard"]))] = int(r["n"])
        with open(manifest_path + ".tmp", "w") as f:
            json.dump(done, f)
        os.replace(manifest_path + ".tmp", manifest_path)
    return done


def curate_corpus(docs_ds, *, n_buckets: int = 128):
    """The one-call curation pass a corpus owner actually runs: Gopher ∧
    C4-line quality gate AND exact-dedup keep-first, fused into a single
    per-doc verdict ``(doc_id, quality_keep, dedup_keep, keep)`` —
    ``keep = quality_keep · dedup_keep``.  Both component laws are the
    already-oracled surfaces (``textstats.quality_gate``,
    ``dedup.frequency_cap(cap=1)``), composed here so the end-to-end
    keep decision itself is hash-compared, not just its parts.

    Scale shape: the quality side is map-only; the dedup side is one
    fingerprint-bucket shuffle; the two verdicts meet in one coarse
    doc-id hash join.
    """
    from .dedup import frequency_cap
    from .joins import bucket_hash_join
    from .textstats import quality_gate

    q = quality_gate(docs_ds).map_batches(
        lambda t: pa.table({
            "doc_id": t.column("doc_id"),
            "quality_keep": t.column("keep").cast(pa.int64()),
        }), batch_format="pyarrow")
    d = frequency_cap(docs_ds, cap=1).map_batches(
        lambda t: pa.table({
            "doc_id": t.column("doc_id"),
            "dedup_keep": t.column("keep").cast(pa.int64()),
        }), batch_format="pyarrow")
    j = bucket_hash_join(q, d, on="doc_id", how="inner",
                         n_buckets=n_buckets)

    def finish(t: pa.Table) -> pa.Table:
        qk = t.column("quality_keep").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        dk = t.column("dedup_keep").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "quality_keep": pa.array(qk, pa.int64()),
            "dedup_keep": pa.array(dk, pa.int64()),
            "keep": pa.array(qk * dk, pa.int64()),
        })

    return j.map_batches(finish, batch_format="pyarrow")
