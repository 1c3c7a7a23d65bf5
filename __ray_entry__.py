"""Driver contract: entry() smoke, queries() per operator, oracle_sql().

Ray is initialised by the driver BEFORE this module is imported — nothing
here (or in name_matching_ray) calls ray.init()/ray.shutdown().

Column-name contract: every computed column is named identically in the Ray
pipeline and the SQL (the driver sorts columns by name before value-hashing).
Money/metric aggregates are integer *cents* (floor(x*100+0.5)) on both sides
so float summation order never breaks the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from name_matching_ray.pipelines import analytics
from name_matching_ray.pipelines.linkage import (
    matched_pairs,
    build_names,
    score_prepaired,
    self_link_docs,
)
from name_matching_ray.sources.docs_source import documents_as_interleaved
from name_matching_ray.stages import (annsearch, blocking, chunking, cluster,
                                      curation, dedup, erblock, sketches,
                                      textstats)
from name_matching_ray.stages.multimodal import media_features

_ANN_QUERY_IDS = [0, 1, 2, 3, 4]


def entry() -> Any:
    """Flagship: interleaved docs (from sf0.001 documents) → extract →
    normalize → block → score → cluster; returns the cluster table."""
    docs = documents_as_interleaved("/root/testdata/sf0.001")
    _names, _pairs, clusters = self_link_docs(docs, cap=200, concurrency=(1, 4),
                                              max_name_tokens=8)
    return clusters


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _read_docs(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])


def _read_table(sf_dir: str, table: str, columns: list[str]):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet",
                                 columns=columns)


def _read_docs_lang(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text", "lang"])


def _read_docs_source(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text", "source"])


def _hll_registers(sf_dir: str):
    import ray.data

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text", "lang"])
    return sketches.hll_registers(docs, group_col="lang")


def _interleaved_spans(sf_dir: str):
    from name_matching_ray.stages.extract import explode_spans

    return explode_spans(documents_as_interleaved(sf_dir))


def _read_emb(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])


def _linkage_pairs(sf_dir: str):
    names = build_names(documents_as_interleaved(sf_dir), max_name_tokens=8)
    return matched_pairs(names, cap=200)


def _linkage_clusters(sf_dir: str):
    docs = documents_as_interleaved(sf_dir)
    _n, _p, clusters = self_link_docs(docs, cap=200, max_name_tokens=8)
    return clusters


def _pair_scoring(sf_dir: str):
    """match_pair.py semantics over planted entity-variant pairs.

    The pair table is synthesized deterministically at the sf's document
    scale (one positive same-entity pair + one negative cross-entity pair
    per entity) so the expected match set is non-empty — pairing adjacent
    document texts matched 0 rows, a vacuous correctness signal.
    """
    import ray.data

    from name_matching_ray.synth import synth_name_pairs

    n_docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet").count()
    pairs = ray.data.from_arrow(synth_name_pairs(max(50, n_docs // 2)))
    return score_prepaired(pairs)


def _lang_id(sf_dir: str):
    # lang_conf is a float ratio (hash-hazardous) — the oracle-compared
    # surface is the prediction itself
    return textstats.lang_id(_read_docs(sf_dir)).select_columns(
        ["doc_id", "lang_pred"])


def _winnow(sf_dir: str):
    """Winnowing fingerprints with the HASHES THEMSELVES on the compared
    surface: each selected k-gram min-hash becomes one (doc_id, pos,
    fp_hash) row (pos = 0-based index in the deduped fingerprint list).
    Docs shorter than k tokens have an empty fingerprint and contribute no
    rows — the SQL unnest does the same."""
    import numpy as np

    ds = _read_docs(sf_dir)
    fp = ds.map_batches(textstats.RollingFingerprint,
                        batch_format="pyarrow", concurrency=(1, 4))

    def explode(batch):
        import numpy as np
        import pyarrow as pa

        lst = batch.column("winnow_fp").combine_chunks()
        offsets = lst.offsets.to_numpy(zero_copy_only=False)
        lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        # rebase starts by offsets[0]: a sliced ListArray's offsets are
        # relative to the underlying buffer, the flattened arange is not
        pos = np.arange(int(lengths.sum()), dtype=np.int64) - \
            np.repeat((offsets[:-1] - offsets[0]).astype(np.int64), lengths)
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, lengths), pa.int64()),
            "pos": pa.array(pos, pa.int64()),
            # flatten() honors a sliced ListArray's offset; .values would
            # return the whole underlying buffer and misalign
            "fp_hash": lst.flatten(),
        })

    return fp.map_batches(explode, batch_format="pyarrow")


def _quality_filter(sf_dir: str):
    """Training-data quality gate as a composed pipeline: stats → filter →
    surviving docs (the keep-list a downstream trainer would consume)."""
    stats = textstats.text_stats(_read_docs(sf_dir))
    return stats.filter(expr="quality_ok == 1").select_columns(
        ["doc_id", "n_tokens", "n_stop"])


def _minhash(sf_dir: str):
    # lean (ids-only LSH shuffle) + hot-bucket drop counters: the 100-TB path
    return dedup.minhash_lsh_pairs(_read_docs(sf_dir), tau=0.5, lean=True,
                                   metrics=True)


def _simhash(sf_dir: str):
    return dedup.simhash_pairs(_read_docs(sf_dir), max_hamming=3)


def _media(sf_dir: str):
    feats = media_features(documents_as_interleaved(sf_dir), fake=True)
    return feats.select_columns(
        ["doc_id", "span_idx", "kind", "media_ref", "width", "height", "n_frames"]
    )


def _sample_mix(sf_dir: str):
    """Deterministic stratified sampling (dataset mixing): sources whose
    trailing digit is even keep 70% (7000 bp), odd keep 30%.  The rate rule
    and the md5-low64 row hash are shared verbatim with the SQL oracle."""
    import ray.data

    from name_matching_ray.stages.curation import stratified_sample

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "source"])
    # per-stratum rate table from the (tiny) distinct source list — the
    # operator's real interface is the dict; the parity rule generates it
    rates = {s: 7000 if int(s[-1]) % 2 == 0 else 3000
             for s in docs.unique("source")}
    return stratified_sample(docs, rates)


def _decontaminate(sf_dir: str):
    """Benchmark decontamination: docs sharing any word 8-gram with the
    probe slice (every 23rd doc — the stand-in benchmark corpus) are
    flagged; output is (doc_id, n_hits, keep) over ALL docs."""
    import ray.data

    from name_matching_ray.stages.curation import (
        build_probe_ngrams,
        decontaminate,
    )

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])

    def probe_filter(t):
        import numpy as np
        import pyarrow as pa

        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.asarray(ids) % 23 == 0))

    probe = docs.map_batches(probe_filter, batch_format="pyarrow")
    ngrams = build_probe_ngrams(probe, n=8)
    return decontaminate(docs, ngrams, n=8)


def _ref_slice(docs):
    """The stand-in 'already ingested / benchmark' reference corpus: every
    7th doc (deterministic slice, reconstructable in SQL as doc_id % 7 = 0).
    """
    def ref_filter(t):
        import numpy as np
        import pyarrow as pa

        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.asarray(ids) % 7 == 0))

    return docs.map_batches(ref_filter, batch_format="pyarrow")


def _near_dup_clusters(sf_dir: str):
    """Shared pairs -> transitive-closure recipe of _dedup_keep_list and
    _split_by_cluster (ngram n=3 tau 10% max_df 100 — the thresholds the
    recursive-CTE oracles hard-code; change here AND in both oracles)."""
    from name_matching_ray.stages.cluster import connected_components

    pairs = dedup.ngram_jaccard_pairs(_read_docs(sf_dir), n=3, tau100=10,
                                      max_df=100)
    edges = pairs.select_columns(["left_id", "right_id"]).rename_columns(
        {"left_id": "left_doc_id", "right_id": "right_doc_id"})
    nodes = _read_docs(sf_dir).select_columns(["doc_id"])
    return connected_components(edges, nodes)


def _cross_dedup(sf_dir: str):
    """Cross-corpus exact dedup: docs whose text hash appears in the
    stand-in 'already ingested' corpus (every 7th doc — same deterministic
    slice idiom as _decontaminate's probe) are flagged keep=0; output is
    (doc_id, keep) over ALL docs.  Graded on the BUCKETED anti-join plan
    (broadcast=False — the web-scale-ref configuration, one hash-bucket
    shuffle, nothing on the driver); bucketed == broadcast is
    equality-tested in tests/test_curation.py."""
    from name_matching_ray.stages.curation import cross_dedup

    docs = _read_docs(sf_dir)
    return cross_dedup(docs, _ref_slice(docs), broadcast=False)


def _bloom_dedup(sf_dir: str):
    """BFF-style Bloom-filter decontamination: the every-7th-doc reference
    slice is compressed into a 2^20-bit / 4-hash filter; keep=0 iff all
    probe bits hit.  Deterministic false positives included — the oracle
    reproduces the filter bit-for-bit in SQL."""
    from name_matching_ray.stages.curation import bloom_cross_dedup

    docs = _read_docs(sf_dir)
    return bloom_cross_dedup(docs, _ref_slice(docs), m_bits=1 << 20, k=4)


def _cross_near_dedup(sf_dir: str):
    """Fuzzy decontamination: best exact-Jaccard 3-gram match per doc
    against the every-7th-doc reference slice (tau 10%, stop-shingle
    df<=100 counted across both sides)."""
    docs = _read_docs(sf_dir)
    return dedup.cross_near_dedup(docs, _ref_slice(docs), n=3, tau100=10,
                                  max_df=100)


def _inject_pii(batch):
    """Deterministic PII planting (shared rule with the SQL oracle, like
    pair_scoring's planted variants): the synthetic documents carry no
    emails/phones/IPs, so the graded redaction query appends them as a pure
    function of doc_id — non-vacuous and SQL-reproducible."""
    import pyarrow as pa

    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    out = []
    for i, t in zip(ids, texts):
        t = t or ""
        if i % 7 == 0:
            t += f" contact user{i}@example.com"
        if i % 11 == 0:
            t += f" call +1 ({300 + i % 700}) 555-{1000 + i % 9000}"
        if i % 13 == 0:
            t += f" from 10.{i % 256}.0.{i % 250}"
        out.append(t)
    return pa.table({"doc_id": batch.column("doc_id"),
                     "text": pa.array(out, pa.string())})


def _redact_pii(sf_dir: str):
    from name_matching_ray.stages.curation import redact_pii

    return redact_pii(
        _read_docs(sf_dir).map_batches(_inject_pii, batch_format="pyarrow"))


def _pack_sequences(sf_dir: str):
    from name_matching_ray.stages.curation import pack_sequences

    return pack_sequences(_read_docs(sf_dir), cap=120, shard_size=100)


def _shuffle_shards(sf_dir: str):
    import ray.data

    from name_matching_ray.stages.curation import shuffle_shards

    ids = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                columns=["doc_id"])
    return shuffle_shards(ids, n_shards=16)


# 8 tokens exactly — a full segment_dedup window, so the planted header
# dedups cleanly to its first occurrence (shared rule with the SQL oracle)
_BOILER_HEADER = "terms of service apply to this document archive"
_BOILER_FOOTER = "copyright notice all rights reserved"


def _inject_boilerplate(batch):
    """Deterministic boilerplate planting (like _inject_pii): the synthetic
    docs are near-unique at the 8-token-segment level, so the graded
    segment-dedup query prepends a shared header to every 5th doc (and a
    footer to every 3rd) as a pure SQL-expressible function of doc_id —
    the dedup result is non-vacuous."""
    import pyarrow as pa

    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    out = []
    for i, t in zip(ids, texts):
        t = t or ""
        if i % 5 == 0:
            t = _BOILER_HEADER + " " + t
        if i % 3 == 0:
            t = t + " " + _BOILER_FOOTER
        out.append(t)
    return pa.table({"doc_id": batch.column("doc_id"),
                     "text": pa.array(out, pa.string())})


def _segment_dedup(sf_dir: str):
    return chunking.segment_dedup(
        _read_docs(sf_dir).map_batches(_inject_boilerplate,
                                       batch_format="pyarrow"),
        window=8)


def _substring_dedup(sf_dir: str):
    """ExactSubstr-style repeated-span removal over the boilerplate-planted
    corpus: every 5th doc's 8-token header duplicates doc 0's, so all but
    the first occurrence lose exactly that span (n_removed == 8)."""
    return chunking.substring_dedup(
        _read_docs(sf_dir).map_batches(_inject_boilerplate,
                                       batch_format="pyarrow"),
        k=8)


def _cluster_size_hist(sf_dir: str):
    """Near-dup cluster size histogram: one row per observed transitive-
    cluster size ``(cluster_size, n_clusters, n_docs)`` — dup_size_hist's
    fuzzy-family sibling, over the shared _near_dup_clusters closure.
    Per-batch partial counts per cluster label → one Sum shuffle (labels
    are hash-uniform doc ids) → per-batch size-histogram partials → a
    tiny Sum over ≤ |distinct sizes| keys."""
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    cc = _near_dup_clusters(sf_dir)

    def part(df: pd.DataFrame) -> pa.Table:
        c = df.groupby("cluster_id").size()
        return pa.table({
            "cluster_id": pa.array(c.index.to_numpy(), pa.int64()),
            "n": pa.array(c.to_numpy(), pa.int64())})

    sizes = cc.map_batches(part, batch_format="pandas") \
        .groupby("cluster_id").aggregate(Sum("n", alias_name="n"))

    def hist(df: pd.DataFrame) -> pa.Table:
        c = df.groupby("n").size()
        sz = c.index.to_numpy()
        return pa.table({
            "cluster_size": pa.array(sz, pa.int64()),
            "n_clusters": pa.array(c.to_numpy(), pa.int64()),
            "n_docs": pa.array(sz * c.to_numpy(), pa.int64())})

    return sizes.map_batches(hist, batch_format="pandas") \
        .groupby("cluster_size").aggregate(
            Sum("n_clusters", alias_name="n_clusters"),
            Sum("n_docs", alias_name="n_docs"))


def _cc_keep(cc, *, id_out: str = "doc_id"):
    """Shared canonical-representative rule over a (doc_id, cluster_id)
    closure table: ``keep = 1`` iff the node IS its cluster's min-id label
    (the rule both recursive-CTE oracles hard-code)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def add_keep(t: pa.Table) -> pa.Table:
        keep = pc.cast(pc.equal(t.column("doc_id"), t.column("cluster_id")),
                       pa.int64())
        return pa.table({
            id_out: t.column("doc_id"),
            "cluster_id": t.column("cluster_id"),
            "keep": keep,
        })

    return cc.map_batches(add_keep, batch_format="pyarrow")


def _dedup_keep_list(sf_dir: str):
    """Training-data dedup keep-list: n-gram Jaccard near-dup pairs →
    transitive clusters → canonical representative (min doc_id) per cluster,
    ``keep = 1`` on the representative.  This is the composition a corpus
    dedup actually ships (pairs alone aren't actionable), and it puts the
    transitive-closure stage under the exact DuckDB oracle for the first
    time (recursive-CTE min-label closure)."""
    return _cc_keep(_near_dup_clusters(sf_dir))


def _dedup_impact(sf_dir: str):
    """What the near-dup dedup BUYS: one scalar row over the shared
    closure keep-list — docs and raw \\S+ tokens kept vs dropped, with
    floor-bp drop rates.  The dashboard number a curation run reports;
    composes two already-oracled laws (closure min-id keep + the gopher
    token count).

    Scale shape: keep flags join per-doc token counts in id-hash
    buckets (types threaded — the schema()-executes-AllToAll trap) and
    every block collapses to ONE scalar partial row; the driver sums
    scalars."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from name_matching_ray.stages.joins import bucket_hash_join

    keep = _cc_keep(_near_dup_clusters(sf_dir))

    def tokc(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # RE2 \S+ run count (pyarrow == DuckDB's regex engine)
        txt = pc.fill_null(pc.cast(t.column("text"), pa.string()), "")
        n = pc.count_substring_regex(txt, r"\S+")
        return pa.table({"doc_id": t.column("doc_id"),
                         "nw": pc.cast(n, pa.int64())})

    toks = _read_docs(sf_dir).map_batches(tokc, batch_format="pyarrow")

    j = bucket_hash_join(
        keep, toks, on="doc_id", n_buckets=128,
        left_types={"doc_id": pa.int64(), "cluster_id": pa.int64(),
                    "keep": pa.int64()},
        right_types={"doc_id": pa.int64(), "nw": pa.int64()})

    def scal(df: pd.DataFrame) -> pa.Table:
        import numpy as np

        k = df["keep"].to_numpy("int64") if len(df) else \
            np.zeros(0, "int64")
        nw = df["nw"].to_numpy("int64") if len(df) else k
        return pa.table({
            "n_docs": pa.array([len(df)], pa.int64()),
            "n_docs_kept": pa.array([int(k.sum())], pa.int64()),
            "n_tokens": pa.array([int(nw.sum())], pa.int64()),
            "n_tokens_kept": pa.array([int((k * nw).sum())],
                                      pa.int64())})

    p = j.map_batches(scal, batch_format="pandas",
                      batch_size=None).to_pandas()
    nd = int(p["n_docs"].sum()) if len(p) else 0
    nk = int(p["n_docs_kept"].sum()) if len(p) else 0
    nt = int(p["n_tokens"].sum()) if len(p) else 0
    ntk = int(p["n_tokens_kept"].sum()) if len(p) else 0
    return rd.from_arrow(pa.table({
        "n_docs": pa.array([nd], pa.int64()),
        "n_docs_kept": pa.array([nk], pa.int64()),
        "n_tokens": pa.array([nt], pa.int64()),
        "n_tokens_kept": pa.array([ntk], pa.int64()),
        "doc_drop_bp": pa.array(
            [(nd - nk) * 10_000 // nd if nd else None], pa.int64()),
        "token_drop_bp": pa.array(
            [(nt - ntk) * 10_000 // nt if nt else None], pa.int64())}))


def _split_by_cluster(sf_dir: str):
    """Leakage-safe train/val split over the near-dup clusters of
    _dedup_keep_list: split decided per CLUSTER (md5 rule), so near-dups
    never straddle train/val."""
    from name_matching_ray.stages.curation import split_by_cluster

    return split_by_cluster(_near_dup_clusters(sf_dir), train_bp=9000)


def _cluster_golden_record(sf_dir: str):
    """The full ER chain as one pipeline: ngram near-dup pairs → the
    shared _near_dup_clusters transitive closure → cluster_survivorship
    fusion (keep-longest + modal lang/source golden record per cluster).
    The whole composition sits under ONE recursive-CTE oracle."""
    attrs = _read_table(sf_dir, "documents",
                        ["doc_id", "text", "lang", "source"])
    return erblock.cluster_survivorship(_near_dup_clusters(sf_dir), attrs)


def _cluster_pair_eval(sf_dir: str):
    """Pairwise precision/recall/F1 of the shared near-dup transitive
    closure (_near_dup_clusters: ngram n=3 tau 10% df<=100 -> connected
    components) against the exact-dup fingerprint truth — the end-to-end
    clustering scorecard next to the per-stage evals (blocking_quality,
    snm_recall, minhash_recall)."""
    return erblock.cluster_pair_eval(_near_dup_clusters(sf_dir),
                                     _read_docs(sf_dir))


def _cluster_ari(sf_dir: str):
    """Adjusted Rand Index of the shared near-dup closure vs the
    exact-dup fingerprint truth — the chance-corrected eval beside
    pairwise F1 (_cluster_pair_eval) and B³ (_cluster_bcubed); all
    three ride the same (cluster, fp) cell pass."""
    return erblock.cluster_ari(_near_dup_clusters(sf_dir),
                               _read_docs(sf_dir))


def _cluster_bcubed(sf_dir: str):
    """B³ precision/recall of the same closure vs the same truth — the
    per-record-averaged metric beside _cluster_pair_eval's pairwise one
    (a giant cluster can't dominate B³ the way it dominates C(n,2))."""
    return erblock.cluster_bcubed(_near_dup_clusters(sf_dir),
                                  _read_docs(sf_dir))


def _cluster_split_merge(sf_dir: str):
    """Split/merge repair-cost audit of the shared near-dup closure vs
    the exact-dup fingerprint truth — the edit-distance reading beside
    the scoring evals (F1/ARI/B³/purity); both counts are cell-table
    identities off the same (cluster, fp) pass."""
    return erblock.cluster_split_merge(_near_dup_clusters(sf_dir),
                                       _read_docs(sf_dir))


def _cluster_homogeneity(sf_dir: str):
    """Homogeneity/completeness (V-measure pair) of the shared near-dup
    closure vs the exact-dup fingerprint truth under the integer
    bit-entropy law — the information-theoretic eval beside pairwise
    F1, ARI, B³, purity and split/merge; same (cluster, fp) cells."""
    return erblock.cluster_homogeneity(_near_dup_clusters(sf_dir),
                                       _read_docs(sf_dir))


def _cluster_purity(sf_dir: str):
    """Purity / inverse purity of the shared near-dup closure vs the
    exact-dup fingerprint truth — the majority-label eval beside
    pairwise F1, ARI and B³; rides the same (cluster, fp) cell pass
    (the metric needs only per-margin MAX counts, never the labels)."""
    return erblock.cluster_purity(_near_dup_clusters(sf_dir),
                                  _read_docs(sf_dir))


def _cluster_conflicts(sf_dir: str):
    """Attribute-consistency audit of the shared near-dup closure: per
    attribute (lang/source), a histogram of clusters by their distinct
    non-null value count — n_values > 1 flags over-merges before any
    survivorship fusion trusts the clusters."""
    attrs = _read_table(sf_dir, "documents", ["doc_id", "lang", "source"])
    return erblock.cluster_conflicts(_near_dup_clusters(sf_dir), attrs)


def _coname_legacy(sf_dir: str):
    """Legacy coname matcher (reference coname.py) over planted synthetic
    name tables at the sf's document scale: corpus-word gates from the base
    side, char-set + token-set-ratio prefilters, glued-variant cascade.
    Non-SQL (fuzzy cascade) — parity-verified against the executable
    reference in tests/test_coname_legacy.py."""
    import ray.data

    from name_matching_ray.pipelines.coname import coname_match
    from name_matching_ray.synth import synth_coname_tables

    n_docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet").count()
    main_t, base_t = synth_coname_tables(max(50, n_docs // 4))
    return coname_match(
        ray.data.from_arrow(main_t), ray.data.from_arrow(base_t),
        main_index="index", main_name="name",
        base_index="gvkey", base_name="name",
    )


def _ivf_topk(sf_dir: str):
    """IVF top-k with the ORACLE-ABLE fixed (data-independent, seeded)
    centroids — the same literals are inlined into the DuckDB oracle so the
    whole IVF path (assign → probe → top-k) is hash-checked; data-dependent
    k-means centroids stay pytest-verified (recall on planted clusters)."""
    emb = _read_emb(sf_dir)
    cent = annsearch.fixed_centroids(8, 64)
    return annsearch.ivf_topk(emb, cent, _ANN_QUERY_IDS, k=10, nprobe=4)


def _ann_recall(sf_dir: str):
    """ANN quality evaluation: recall@k of the IVF approximate path
    against exact brute-force cosine top-k, per query — the harness every
    ANN deployment runs before trusting the index.  Both inputs are
    existing oracled surfaces (ann_topk / ivf_topk); the driver merge is
    provably bounded at |queries|·k rows per side (50 here)."""
    import numpy as np
    import pandas as pd

    k = 10
    exact = annsearch.ann_topk(_read_emb(sf_dir), _ANN_QUERY_IDS,
                               k=k).to_pandas()
    approx = _ivf_topk(sf_dir).to_pandas()
    hit = exact.merge(approx, on=["query_id", "neighbor_id"]) \
        .groupby("query_id").size()
    out = pd.DataFrame({"query_id": np.array(_ANN_QUERY_IDS, np.int64)})
    out["n_hit"] = out["query_id"].map(hit).fillna(0).astype(np.int64)
    out["recall_bp"] = out["n_hit"] * 10000 // k
    return out


def _ann_recall_oracle() -> str:
    """Composes the exact ann_topk CTE with the full ivf_topk oracle (as
    a nested-WITH subquery) and counts the per-query overlap."""
    ivf = _ivf_topk_oracle()
    qids = ",".join(str(q) for q in _ANN_QUERY_IDS)
    return f"""
        WITH ex AS (
            SELECT query_id, neighbor_id FROM (
                WITH s AS (
                    SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
                           list_cosine_similarity(q.embedding,
                                                  d.embedding) AS sim
                    FROM embeddings q
                    JOIN embeddings d ON d.vec_id <> q.vec_id
                    WHERE q.vec_id IN ({qids}))
                SELECT query_id, neighbor_id
                FROM (SELECT *, row_number() OVER (
                          PARTITION BY query_id
                          ORDER BY sim DESC, neighbor_id) AS rn
                      FROM s)
                WHERE rn <= 10)),
        ap AS (SELECT query_id, neighbor_id FROM ({ivf})),
        ov AS (SELECT ex.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
               FROM ex JOIN ap USING (query_id, neighbor_id)
               GROUP BY 1)
        SELECT CAST(v.query_id AS BIGINT) AS query_id,
               CAST(COALESCE(ov.n_hit, 0) AS BIGINT) AS n_hit,
               CAST(COALESCE(ov.n_hit, 0) * 10000 // 10 AS BIGINT)
                   AS recall_bp
        FROM (SELECT unnest([{qids}]) AS query_id) v
        LEFT JOIN ov ON ov.query_id = v.query_id
    """


_SEARCH_PROBE_IDS = [0, 7, 23, 41, 97]


def _probe_queries(sf_dir: str) -> dict[int, list[str]]:
    """Query set = first 4 whitespace tokens of the probe docs
    (deterministic, reconstructable in SQL via list slicing)."""
    import pyarrow.compute as pc
    import ray.data

    # prune at the read: the probe fetch pushes the id filter into the
    # parquet scan (row-group stats pruning) instead of scanning the corpus
    probes = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        filter=pc.field("doc_id").isin(_SEARCH_PROBE_IDS),
    ).take_all()

    def _first4(text: str) -> list[str]:
        # bit-faithful to the oracle's w[1:4] over regexp_split_to_array(
        # lower(trim(text)), '\s+'): trim strips ASCII spaces ONLY, the
        # split is RE2 \s (Python str.split() also splits on non-ASCII
        # whitespace — a silent query-term divergence), and '' drops AFTER
        # the 4-element slice, exactly like the qt CTE
        import pyarrow as pa

        toks = pc.split_pattern_regex(
            pc.utf8_lower(pa.array([(text or "").strip(" ")])), r"\s+")
        return [t for t in toks[0].as_py()[:4] if t]

    return {int(r["doc_id"]): _first4(r["text"]) for r in probes}


def _incremental_dedup(sf_dir: str):
    """Streaming exact dedup against a fresh sharded seen-set index (the
    shared-mutable-index actor pattern; one keeper per fingerprint)."""
    from name_matching_ray.state.incremental import (IncrementalIndex,
                                                     incremental_dedup)

    return incremental_dedup(_read_docs(sf_dir), IncrementalIndex(8))


def _incremental_dedup_counts(sf_dir: str):
    """The streaming dedup's keep-COUNT law under a real SQL oracle: WHICH
    doc survives is arrival-order (not SQL-expressible), but HOW MANY is
    exact — one keeper per distinct fingerprint against a fresh index, so
    n_keep == COUNT(DISTINCT md5(...)).  One row:
    ``(n_docs, n_keep, n_dup)``."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Sum

    from name_matching_ray.state.incremental import (IncrementalIndex,
                                                     incremental_dedup)

    tagged = incremental_dedup(_read_docs(sf_dir), IncrementalIndex(8))

    def part(t: pa.Table) -> pa.Table:
        dup = t.column("is_dup").to_numpy(zero_copy_only=False)
        return pa.table({"_one": pa.array([0], pa.int64()),
                         "n_docs": pa.array([len(dup)], pa.int64()),
                         "n_dup": pa.array([int(dup.sum())], pa.int64())})

    seed = rd.from_arrow(pa.table({"_one": pa.array([0], pa.int64()),
                                   "n_docs": pa.array([0], pa.int64()),
                                   "n_dup": pa.array([0], pa.int64())}))
    agg = tagged.map_batches(part, batch_format="pyarrow").union(seed) \
        .groupby("_one").aggregate(Sum("n_docs", alias_name="n_docs"),
                                   Sum("n_dup", alias_name="n_dup"))

    def final(t: pa.Table) -> pa.Table:
        nd = t.column("n_docs")
        dup = t.column("n_dup")
        import pyarrow.compute as pc
        return pa.table({"n_docs": nd,
                         "n_keep": pc.subtract(nd, dup),
                         "n_dup": dup})

    return agg.map_batches(final, batch_format="pyarrow")


def _search_topk(sf_dir: str):
    """Sparse retrieval: integer tf-idf proxy + per-query top-10."""
    return textstats.search_topk(_read_docs(sf_dir),
                                 _probe_queries(sf_dir), k=10)


def _bm25_topk(sf_dir: str):
    """BM25 retrieval over the same probe query set — the all-integer
    (avgdl-centitoken saturation × idf-bits) law, hash-compared."""
    return textstats.bm25_topk(_read_docs(sf_dir),
                               _probe_queries(sf_dir), k=10)


def _semantic_keep_list(sf_dir: str):
    """SemDeDup-style embedding dedup END-TO-END: IVF partition (the fixed
    oracle-able centroids) -> exact all-pairs cosine >= 0.35 within each
    partition -> transitive clusters -> canonical keep flag (min vec_id).
    The whole chain (assignment, in-partition pairs, closure) is one DuckDB
    oracle (argmax-cosine CTE + recursive-CTE closure)."""
    from name_matching_ray.stages.cluster import connected_components

    emb = _read_emb(sf_dir)
    cent = annsearch.fixed_centroids(8, 64)
    pairs = annsearch.ivf_cosine_dups(emb, cent, threshold=0.35)
    edges = pairs.rename_columns(
        {"left_id": "left_doc_id", "right_id": "right_doc_id"})
    nodes = emb.select_columns(["vec_id"]).rename_columns(
        {"vec_id": "doc_id"})
    cc = connected_components(edges, nodes)
    return _cc_keep(cc, id_out="vec_id")


def _cluster_stats(sf_dir: str):
    """Embedding-cluster audit with the ORACLE-ABLE fixed centroids (same
    literals inlined into the DuckDB oracle as _ivf_topk): nearest-centroid
    assignment + per-cluster size / majority label."""
    import ray.data

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding", "label"])
    cent = annsearch.fixed_centroids(8, 64)
    return annsearch.cluster_stats(emb, cent)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # relational core (SQL-oracled)
        "pricing_summary": analytics.pricing_summary,
        "segment_revenue": analytics.segment_revenue,
        "region_balance": analytics.region_balance,
        "topk_orders": analytics.topk_orders,
        "high_quantity_counts": analytics.high_quantity_counts,
        "events_daily": analytics.events_daily,
        "sessionize": analytics.sessionize,
        "asof_prior_event": analytics.asof_prior_event,
        "rolling_user_value": analytics.rolling_user_value,
        "windowed_watermark": analytics.windowed_counts_watermark,
        "topk_per_customer": analytics.topk_orders_per_customer,
        "range_join_windows": analytics.range_join_windows,
        # NOTE: the whale-key salted variants (sessionize/asof/rolling with
        # salt_span) share these oracles; salted == unsalted is asserted in
        # tests/test_ops.py::test_salted_event_ops_equal_unsalted, so they
        # are not registry duplicates — this keeps every oracled entry
        # inside the driver's 50-query correctness window.
        # text analysis (SQL-oracled)
        "text_stats": lambda sf: textstats.text_stats(_read_docs(sf)),
        "quality_filter": _quality_filter,
        "fingerprints": lambda sf: textstats.fingerprints(_read_docs(sf)),
        "word_counts": lambda sf: textstats.word_counts(_read_docs(sf)),
        # dedup
        "exact_dedup": lambda sf: dedup.exact_dedup(_read_docs(sf)),
        "ngram_jaccard_dedup": lambda sf: dedup.ngram_jaccard_pairs(
            _read_docs(sf), n=3, tau100=10, max_df=100),
        "dedup_keep_list": _dedup_keep_list,
        # corpus curation (deterministic, map-only, SQL-oracled)
        "sample_mix": _sample_mix,
        "decontaminate": _decontaminate,
        "cross_dedup": _cross_dedup,
        "bloom_dedup": _bloom_dedup,
        "cross_near_dedup": _cross_near_dedup,
        "split_by_cluster": _split_by_cluster,
        "redact_pii": _redact_pii,
        "pack_sequences": _pack_sequences,
        "shuffle_shards": _shuffle_shards,
        "length_quantiles": lambda sf: textstats.length_quantiles(
            _read_docs(sf)),
        # pmi/tfidf are GRADED on their open-vocabulary bucket-join plans
        # (broadcast=False — the 100-TB configuration, nothing on the
        # driver); join == broadcast is pytest equality-tested
        "pmi_bigrams": lambda sf: textstats.pmi_bigrams(
            _read_docs(sf), k=20, min_count=5, broadcast=False),
        "tfidf_topk": lambda sf: textstats.tfidf_topk(
            _read_docs(sf), k=3, min_df=2, broadcast=False),
        "inverted_index": lambda sf: textstats.inverted_index(
            _read_docs(sf), cap=32, min_df=2),
        "repetition_stats": lambda sf: textstats.repetition_stats(
            _read_docs(sf)),
        "unigram_bits": lambda sf: textstats.unigram_bits(
            _read_docs(sf), vocab=2048),
        "search_topk": _search_topk,
        "chunk_docs": lambda sf: chunking.chunk_docs(
            _read_docs(sf), window=16, stride=8),
        "segment_dedup": _segment_dedup,
        "substring_dedup": _substring_dedup,
        "minhash_dedup": _minhash,
        "simhash_dedup": _simhash,
        # embeddings / similarity search
        "embedding_dups": lambda sf: annsearch.embedding_cosine_dups(
            _read_emb(sf), threshold=0.35),
        # max_hamming=16 on the synthetic embeddings (their closest pairs
        # sit near cosine 0.35): non-vacuous result set; tight-hamming
        # configs are pytest-verified on planted near-duplicates
        "srp_dedup": lambda sf: annsearch.srp_lsh_pairs(
            _read_emb(sf), max_hamming=16),
        "ann_threshold": lambda sf: annsearch.cosine_threshold_pairs(
            _read_emb(sf), _ANN_QUERY_IDS, threshold=0.25),
        "ann_topk": lambda sf: annsearch.ann_topk(_read_emb(sf),
                                                  _ANN_QUERY_IDS, k=10),
        "ivf_topk": _ivf_topk,
        "cluster_stats": _cluster_stats,
        "semantic_keep_list": _semantic_keep_list,
        # heuristics / stubs (SQL-oracled)
        "lang_id": _lang_id,
        "winnow_fingerprint": _winnow,
        "media_features": _media,
        # quality-classifier corpus selection (hashed-linear inference +
        # exact binned-percentile cutoff).  Oracled, but past the driver's
        # 50-query window (positions 1-50 are already all oracled):
        # verified by tools/check_oracle.py + tests/test_ops.py instead.
        "classifier_select": lambda sf: textstats.classifier_select(
            _read_docs(sf), keep_bp=3000),
        # mergeable sketches (also oracled past the window — the register/
        # cell tables are deterministic integer functions of md5-low64)
        "hll_registers": _hll_registers,
        "countmin_sketch": lambda sf: sketches.countmin_sketch(
            _read_docs(sf)),
        "countmin_topk": lambda sf: sketches.countmin_topk(
            _read_docs(sf), k=20),
        # the interleaved-docs axis under the oracle: the adapter's span
        # law reconstructed independently in SQL from the flat table
        "interleaved_spans": _interleaved_spans,
        # C4-style line-level boilerplate filter (Raffel et al. 2020 §2.2)
        "line_filter": lambda sf: textstats.line_filter(_read_docs(sf)),
        # int8-grid scalar-quantized top-k: the exact-integer-score ANN
        # surface (codes = floor(x*127+0.5); score = int dot of codes)
        "quantized_topk": lambda sf: annsearch.quantized_topk(
            _read_emb(sf), _ANN_QUERY_IDS, k=10),
        # Gopher document-quality rules (Rae et al. 2021, Appendix A)
        "gopher_rules": lambda sf: textstats.gopher_rules(_read_docs(sf)),
        # Gopher repetition rules: dup line/paragraph fractions + top-ngram
        # char coverage (the half repetition_stats doesn't cover)
        "gopher_repetition": lambda sf: textstats.gopher_repetition(
            _read_docs(sf)),
        # DSIR importance resampling (Xie et al. 2023): hashed unigram+
        # bigram models of target (lang='en') vs raw corpus, integer
        # bit-length log-ratio scores, deterministic top-p% selection
        "dsir_select": lambda sf: textstats.dsir_select(
            _read_docs_lang(sf), keep_bp=2500, bin_width=1),
        # semi-structured: vectorized JSON property extraction (polars
        # json_path_match) + typed per-event_type aggregate
        "json_props": analytics.json_props,
        # one exact Lloyd iteration on the int8 grid: integer argmin-L2
        # assignment + per-(cluster, dim) integer sufficient statistics
        "kmeans_update": lambda sf: annsearch.kmeans_update(
            _read_emb(sf), annsearch.fixed_centroids(8, 64)),
        # soft dedup: keep at most `cap` copies per exact-duplicate group
        "frequency_cap": lambda sf: dedup.frequency_cap(
            _read_docs(sf), cap=2),
        # per-source token budgeting: longest-first quota fill (mixing)
        "token_budget": lambda sf: curation.token_budget_select(
            _read_docs_source(sf), budget=1000),
        # MOSS-style near-dup pairs on shared winnowing fingerprints (the
        # sparse ~2/(w+1)-density alternative to full-shingle Jaccard)
        "winnow_dedup": lambda sf: dedup.winnow_dedup(
            _read_docs(sf), min_shared=2, max_df=64),
        # BPE tokenizer-training statistics: first-iteration adjacent
        # char-pair counts over the word-frequency table
        "bpe_pairs": lambda sf: textstats.bpe_pair_counts(_read_docs(sf)),
        # streaming-style repeat-event suppression (same (user,type)
        # within the window → dup); sessionize's bucketed one-sort shape
        "event_dedup": lambda sf: analytics.event_dedup(
            sf, window_seconds=3600),
        # ANN evaluation harness: recall@k of the IVF path vs exact
        # brute-force top-k (both already-oracled surfaces composed)
        "ann_recall": _ann_recall,
        # per-group exact percentiles (PARTITION BY length_quantiles;
        # per-key cum scan inside map_groups — nothing on the driver)
        "lang_quantiles": lambda sf: textstats.grouped_length_quantiles(
            _read_docs_lang(sf)),
        # fused Gopher ∧ C4-line gate in ONE map pass (no second read,
        # no join — both kernels share the batch)
        "quality_gate": lambda sf: textstats.quality_gate(_read_docs(sf)),
        # per-source corpus health report (gopher verdicts + token/char
        # totals aggregated per domain in the same map pass)
        "source_quality": lambda sf: textstats.source_quality(
            _read_docs_source(sf)),
        # bigram-backoff corpus-LM surprisal (unigram_bits + one order of
        # context; integer conditional-surprisal law, backoff penalty bit)
        "bigram_bits": lambda sf: textstats.bigram_bits(
            _read_docs(sf), vocab=2048, bigram_vocab=4096),
        # KMV/theta distinct-count sketch per lang: k smallest distinct
        # token hashes — the deterministic, exactly-oracled sketch
        "kmv_sketch": lambda sf: sketches.kmv_sketch(
            _read_docs_lang(sf), k=256),
        # long→wide pivot: per-user count column per declared event type
        "pivot_events": analytics.pivot_events,
        # NFC + control-strip + whitespace-squeeze normalization (the
        # string column itself is hash-compared)
        "clean_text": lambda sf: textstats.clean_text(_read_docs(sf)),
        # code-vs-prose routing heuristic (brace/semicolon density,
        # indented-line fraction — integer cross-multiplied)
        "code_detect": lambda sf: textstats.code_detect(_read_docs(sf)),
        # generic coarse-bucket hash join (stages/joins.py) exercised as
        # a two-level dimension join with a pre-join combiner
        "nation_revenue": analytics.nation_revenue,
        # duplicate-cluster size histogram (corpus-health report built on
        # exact_dedup's fingerprint law — tiny Sum over distinct sizes)
        "dup_size_hist": lambda sf: dedup.dup_size_hist(_read_docs(sf)),
        # per-user time-decayed value sum (integer half-life shift law:
        # cents >> (age_days // halflife) — exactly hash-comparable)
        "decay_sum": lambda sf: analytics.decay_sum(sf, halflife_days=7),
        # strict ordered funnel by first occurrence (view→click→purchase;
        # per-(user,stage) min-ts partials, in-bucket depth, tiny Sum)
        "funnel_counts": analytics.funnel_counts,
        # week-over-week cohort retention (distinct (user,week) partials,
        # users colocated per bucket, week/week+1 self-match in-bucket)
        "user_retention": analytics.user_retention,
        # BM25 retrieval, all-integer law (centitoken avgdl saturation in
        # bp × idf-bits) — overflow-proof at any corpus size
        "bm25_topk": _bm25_topk,
        # phonetic blocking-key audit (Soundex, simplified h/w=vowel
        # variant) over part names — block sizes drive salting decisions
        "phonetic_block": lambda sf: blocking.phonetic_block_stats(
            _read_table(sf, "part", ["p_name"]), name_col="p_name"),
        # character-entropy gibberish filter (floored Shannon
        # self-information in integer bits; one utf-32 decode per batch)
        "char_entropy": lambda sf: textstats.char_entropy(_read_docs(sf)),
        # pairwise source vocabulary Jaccard (token-colocated buckets,
        # ≤|sources|² partial rows — the data-mixing affinity matrix)
        "source_overlap": lambda sf: textstats.source_overlap(
            _read_docs_source(sf)),
        # MinHash-LSH eval harness: recall/precision of the LSH candidate
        # pairs vs exact Jaccard ≥ 0.5 truth (both laws already oracled)
        "minhash_recall": lambda sf: dedup.minhash_recall(_read_docs(sf)),
        # deterministic per-language k-sample (md5 rank — same 5 docs
        # every run; lossless per-batch k-smallest partials)
        "group_sample": lambda sf: curation.group_sample(
            _read_table(sf, "documents", ["doc_id", "lang"]), k=5),
        # √-temperature source rebalancing (T=2 multilingual-sampling law;
        # tiny per-source count pass → broadcast rate dict → map-only tag)
        "temperature_mix": lambda sf: curation.temperature_mix(
            _read_table(sf, "documents", ["doc_id", "source"]), budget=250),
        # within-doc duplicate-line scrub (first occurrence kept, doc
        # rebuilt — the STRING is hash-compared); map-only pure Arrow
        "dedup_lines": lambda sf: textstats.dedup_lines(_read_docs(sf)),
        # per-source exact-dup rate (which crawl spams dupes; (source,fp)
        # buckets make the distinct exact, Sum over |sources| keys)
        "dup_by_source": lambda sf: dedup.dup_by_source(
            _read_docs_source(sf)),
        # per-language open-vocab top-5 words (lossless bucketed top-k —
        # the vocabulary never reaches the driver)
        "lang_top_words": lambda sf: textstats.grouped_top_words(
            _read_docs_lang(sf), k=5),
        # product-quantization codes (Jégou 2011): int8-grid codebooks
        # from fixed ids, exact integer argmin-L2 per subspace + true
        # distortion — m·1-byte codes, the billion-vector footprint path
        "pq_encode": lambda sf: annsearch.pq_encode(
            _read_emb(sf), codebook_ids=list(range(8)), m=4),
        # PQ ADC search: per-query distance LUTs, adc = Σ_s LUT[s][code] —
        # the 1-byte-per-subspace billion-vector query path
        "pq_topk": lambda sf: annsearch.pq_topk(
            _read_emb(sf), _ANN_QUERY_IDS, list(range(8)), k=10, m=4),
        # exact flat-index baseline on the same int8 grid (integer L2)
        "grid_l2_topk": lambda sf: annsearch.grid_l2_topk(
            _read_emb(sf), _ANN_QUERY_IDS, k=10),
        # PQ compression-loss audit: recall@10 of ADC vs the flat index
        "pq_recall": lambda sf: annsearch.pq_recall(
            _read_emb(sf), _ANN_QUERY_IDS, list(range(8)), k=10, m=4),
        # trailing 7-day distinct users (windowed COUNT DISTINCT via the
        # membership-explode rewrite — exact, no per-day sets shipped)
        "rolling_active": analytics.rolling_active,
        # integer PageRank (2 damped iterations) over the near-dup pair
        # graph — iterative bucket-join + Sum, edges materialized once,
        # rank repartitioned per round (template-hub centrality audit)
        "pagerank_dups": lambda sf: cluster.pagerank_dupgraph(
            _read_docs(sf), iters=2),
        # referential-integrity audit via distributed ANTI joins (the
        # right side ships distinct keys only)
        "fk_violations": analytics.fk_violations,
        # faiss-style IVFPQ composite: coarse probe (nprobe cells) + PQ
        # ADC fine ranking — the standard billion-vector index shape
        "ivfpq_topk": lambda sf: annsearch.ivfpq_topk(
            _read_emb(sf), annsearch.fixed_centroids(8, 64),
            _ANN_QUERY_IDS, list(range(8)), k=10, nprobe=4, m=4),
        # CCNet head/middle/tail perplexity tertiles (milli-bits/token,
        # peers-inclusive percentile cuts over distinct values only)
        "perplexity_buckets": lambda sf: textstats.perplexity_buckets(
            _read_docs(sf), vocab=2048),
        # generic column profiler (typed min/max partials, exact distinct
        # via (column,value) buckets — the warehouse-load QA report)
        "profile_table": analytics.profile_table,
        # funnel timing: exact view→purchase delay percentiles over
        # converting users (distinct-delay histogram, never the users)
        "conversion_time": analytics.conversion_time,
        # one-call curation pass: Gopher∧C4 quality gate AND exact-dedup
        # keep-first, fused to a per-doc verdict (composed oracles)
        "curate_corpus": lambda sf: curation.curate_corpus(_read_docs(sf)),
        # winnowing-dedup eval: same evaluator as minhash_recall, so the
        # two approximate-dedup families are measured on identical terms
        "winnow_recall": lambda sf: dedup.winnow_recall(_read_docs(sf)),
        # near-dup TRANSITIVE-cluster size distribution (the dup_size_hist
        # of the fuzzy family; closure shared with dedup_keep_list)
        "cluster_size_hist": _cluster_size_hist,
        # per-source corpus-LM fit (which crawl is OOD — unigram_bits
        # rolled up per source, integer bits/kilotoken)
        "source_surprisal": lambda sf: textstats.source_surprisal(
            _read_docs_source(sf), vocab=2048),
        # GROUPING-SETS rollup (nation × status + both margins + total in
        # one result; coarse levels derived from the finest tiny aggregate)
        "revenue_rollup": analytics.revenue_rollup,
        # first-order Markov event-type transitions (LAG law per user,
        # one sort per bucket, row-normalized on the tiny matrix)
        "event_transitions": analytics.event_transitions,
        # per-IVF-cell farthest member (embedding QA; int8-grid L2 to the
        # assigned centroid is itself hash-compared)
        "cluster_outliers": lambda sf: annsearch.cluster_outliers(
            _read_emb(sf), annsearch.fixed_centroids(8, 64)),
        # fixed-width order-value histogram (all-integer cents buckets)
        "value_histogram": analytics.value_histogram,
        # per-nation supplier balances (closes warehouse table coverage)
        "supplier_balance": analytics.supplier_balance,
        # streaming-dedup keep-COUNT law (one keeper per distinct
        # fingerprint) — the SQL-expressible half of incremental_dedup,
        # so the actor-index path gets a real DuckDB oracle row
        "incremental_dedup_counts": _incremental_dedup_counts,
        # TPC-H Q3 shape: customer(segment) semi⋈ orders(date<cut) ⋈
        # lineitem-partials(shipdate>cut), per-order revenue top-10 —
        # the 3-table-join + combiner + local-topk composition demo
        "shipping_priority": analytics.shipping_priority,
        # token-blocking budget (ER planning): block-size histogram +
        # s*(s-1)/2 pair budget per size — the pass run before choosing
        # a blocking key / stop-key cap
        "token_blocking_budget": lambda sf: textstats.token_blocking_budget(
            _read_docs(sf)),
        # windowed co-occurrence (skip-gram) counts — the word2vec/GloVe
        # preprocessing table (all lags formed positionally per batch;
        # only (pair, count) partials enter the one Sum shuffle)
        "skipgram_counts": lambda sf: textstats.skipgram_counts(
            _read_docs(sf), window=3, min_count=5),
        # keep-BEST exact dedup: longest copy wins (ties -> lowest id) —
        # the curation policy when copies differ by truncation; per-batch
        # argmax partials, coarse-bucket combine
        "dedup_keep_longest": lambda sf: dedup.dedup_keep_longest(
            _read_docs(sf)),
        # RFM customer segmentation (recency/frequency/monetary + the
        # composite 4..1 grid code) — global scalar ref date + per-batch
        # multi-aggregate partials, all-integer law
        "rfm_segments": analytics.rfm_segments,
        # sorted-neighborhood blocking (SNM): global (key, id) rank via
        # per-prefix offsets, window pairs via rank-chunk boundary
        # replication — the classic ER candidate generator
        "snm_pairs": lambda sf: erblock.snm_pairs(_read_docs(sf)),
        # blocking-scheme quality vs exact-dup truth — pairs completeness
        # and candidate budget from GROUP SIZES only (no pair materialized)
        "blocking_quality": lambda sf: erblock.blocking_quality(
            _read_docs(sf)),
        # edit-distance (Levenshtein<=k) similarity join inside first-token
        # blocks with a hard block-size cap (stop-key law in SQL too)
        "edit_block_pairs": lambda sf: erblock.edit_block_pairs(
            _read_docs(sf)),
        # ER survivorship: modal-attribute golden record per customer
        # (ties -> lexicographically smallest; deterministic fusion rule)
        "golden_record": analytics.golden_record,
        # meta-blocking: CBS-weighted candidate graph, mean-weight edge
        # pruning (integer cross-multiplied); df-capped token blocks
        "meta_blocking_pairs": lambda sf: erblock.meta_blocking_pairs(
            _read_docs(sf)),
        # SNM blocking evaluation: pairs completeness of the rank window
        # vs exact-dup truth (fingerprint rides the rank chunks — no pair
        # table is joined back)
        "snm_recall": lambda sf: erblock.snm_recall(_read_docs(sf)),
        # multi-pass SNM: forward + reversed-key passes, unordered union
        # with per-pair pass count (prefix-corrupted dups need pass 2)
        "snm_multi_pairs": lambda sf: erblock.snm_multi_pairs(
            _read_docs(sf)),
        # the FULL ER chain under one oracle: near-dup pairs -> transitive
        # closure -> survivorship fusion (golden record per cluster)
        "cluster_golden_record": _cluster_golden_record,
        # Fellegi-Sunter probabilistic linkage scores: per-field agreement
        # weights bit_length(T // sum C(n_v,2)) from the value-count pass,
        # same-nation gap-<=5 candidate pairs, score histogram out
        "fs_match_scores": lambda sf: erblock.fs_match_scores(
            _read_table(sf, "customer",
                        ["c_custkey", "c_name", "c_nationkey",
                         "c_mktsegment", "c_acctbal"])),
        # prefix-filter exact set-similarity join (AllPairs/PPJoin): the
        # cap-FREE tau-Jaccard join — docs index only their p rarest
        # shingles; every candidate verified on the full md5 sets
        "ppjoin_pairs": lambda sf: dedup.ppjoin_pairs(_read_docs(sf)),
        # pairwise P/R/F1 of the near-dup closure vs exact-dup truth —
        # all three pair sums from ONE (cluster, fp) count table
        "cluster_pair_eval": _cluster_pair_eval,
        # canopy clustering (deterministic lowest-id-center law): cheap
        # shingle-overlap distance, centers have no lower neighbor,
        # docs take the lowest covering center (orphans keep themselves)
        "canopy_assign": lambda sf: erblock.canopy_assign(_read_docs(sf)),
        # phonetic (Soundex) blocking: typo-tolerant candidate pairs
        # within shared Soundex keys of the leading letters, stop-key
        # cap on block size (enforced in SQL too)
        "phonetic_block_pairs": lambda sf: erblock.phonetic_block_pairs(
            _read_docs(sf)),
        # multi-blocker cascade: SNM(1) + edit-prefix(2) + Soundex(4)
        # union with per-pair provenance bitmask (OR == sum of bits)
        "blocking_cascade": lambda sf: erblock.blocking_cascade(
            _read_docs(sf)),
        # TPC-H Q16 shape: EXACT distributed COUNT(DISTINCT supplier) per
        # brand — dedup in hash(brand,supp) buckets, bounded driver merge
        "brand_supplier_counts": lambda sf:
            analytics.brand_supplier_counts(sf),
        # SNM window sweep: candidates/recall at 5 window sizes from ONE
        # rank pass (replication sized to max window, per-gap cumsum)
        "snm_window_sweep": lambda sf: erblock.snm_window_sweep(
            _read_docs(sf)),
        # deterministic clerical-review sample: md5('l:r') % 1e4 <
        # rate_bp over the near-dup candidates — rerun/shard-stable audit
        "pair_review_sample": lambda sf: erblock.pair_review_sample(
            _read_docs(sf)),
        # B-cubed clustering eval: per-record-averaged P/R over the same
        # closure + truth as cluster_pair_eval, from cell counts x margins
        "cluster_bcubed": _cluster_bcubed,
        # one EM re-estimation round (Splink/fastLink step): matches =
        # score >= (sum_w+1)//2 under the current weights; per-field
        # m/u probabilities re-estimated in basis points
        "fs_em_round": lambda sf: erblock.fs_em_round(
            _read_table(sf, "customer",
                        ["c_custkey", "c_name", "c_nationkey",
                         "c_mktsegment", "c_acctbal"])),
        # TPC-H Q13 shape: customers histogrammed by order count incl.
        # the zero-order customers a plain orders groupby can't see
        "customer_distribution": lambda sf:
            analytics.customer_distribution(sf),
        # ECBS meta-blocking: CBS co-occurrence counts IDF-corrected by
        # each endpoint's block count (bit-length log proxy), mean-pruned
        "meta_blocking_ecbs": lambda sf: erblock.meta_blocking_ecbs(
            _read_docs(sf)),
        # stop-block cap sweep: PC-vs-budget curve of first-token blocking
        # across 5 caps, all from (fp, key) group sizes — no pairs built
        "blocking_budget_sweep": lambda sf: erblock.blocking_budget_sweep(
            _read_docs(sf)),
        # exact cosine-tau similarity join over word-trigram TF vectors
        # (AllPairs family) — cross over df-capped shingles, full norms,
        # Python-int threshold (cross^2*1e4 overflows int64 on long docs)
        "cosine_pairs": lambda sf: dedup.cosine_pairs(_read_docs(sf)),
        # threshold operating-point curve: P/R/F1 of the ngram-Jaccard
        # near-dup law vs exact-dup truth at 5 taus — candidates generated
        # once at min(tau), re-thresholded arithmetically
        "dedup_threshold_sweep": lambda sf: erblock.dedup_threshold_sweep(
            _read_docs(sf)),
        # suffix-array blocking: one block per key suffix >= min_len —
        # leading-typo-tolerant candidate pairs with shared-block counts
        "suffix_blocking_pairs": lambda sf: erblock.suffix_blocking_pairs(
            _read_docs(sf)),
        # symmetric-best 1-1 matching over the FS scores: (l, r) kept iff
        # each is the other's rank-1 partner (score desc, id asc) — the
        # many-to-many -> 1-1 ER post-step
        "fs_mutual_best": lambda sf: erblock.fs_mutual_best(
            _read_table(sf, "customer",
                        ["c_custkey", "c_name", "c_nationkey",
                         "c_mktsegment", "c_acctbal"])),
        # group linkage: entity == its SET of linked items (supplier ->
        # distinct parts); per-entity argmax partner by Jaccard (a fixed
        # threshold degenerates as the catalog grows), stop-item df cap
        "group_linkage": lambda sf: erblock.group_linkage_best(
            _read_table(sf, "lineitem", ["l_suppkey", "l_partkey"])),
        # TPC-H Q10 shape: revenue lost to returned items per customer,
        # top-20 — per-orderkey combiner, custkey partials folded in the
        # join buckets, broadcast nation dim, local-topk merge
        "returned_revenue": lambda sf: analytics.returned_revenue(sf),
        # TPC-H Q4 shape: EXISTS(late lineitem) as a per-order MAX fold;
        # 5-row priority histogram driver-merged from block partials
        "order_priority_counts": lambda sf: analytics.order_priority_counts(
            sf),
        # FS agreement-pattern (gamma) frequency table — the comparison-
        # vector counts every EM fit starts from (weight-law independent)
        "fs_pattern_counts": lambda sf: erblock.fs_pattern_counts(
            _read_table(sf, "customer",
                        ["c_custkey", "c_name", "c_nationkey",
                         "c_mktsegment", "c_acctbal"])),
        # term-frequency-ADJUSTED FS scores (Splink tf adjustment): the
        # agreement weight is per VALUE — rare-value agreement counts more
        "fs_tf_scores": lambda sf: erblock.fs_tf_scores(
            _read_table(sf, "customer",
                        ["c_custkey", "c_name", "c_nationkey",
                         "c_mktsegment", "c_acctbal"])),
        # FastSS deletion-neighborhood edit join: ALL name pairs within
        # Levenshtein 1, blocking-free and cap-free (exact vs the full
        # cross-join oracle) — keys = the name + its 1-deletion variants
        "deletion_join_pairs": lambda sf: erblock.deletion_join_pairs(
            _read_table(sf, "customer", ["c_custkey", "c_name"])),
        # TPC-H Q14 shape: promo revenue share of a shipdate year —
        # per-partkey combiner, (partkey,flag)-only dim side, join
        # buckets fold to <=2-row partials, Python-int basis points
        "promo_revenue": lambda sf: analytics.promo_revenue(sf),
        # cluster consistency audit: per-attribute histogram of clusters
        # by distinct-value count over the near-dup closure (>1 flags
        # over-merges; the QA pass before survivorship fusion)
        "cluster_conflicts": _cluster_conflicts,
        # TPC-H Q18 shape (iceberg HAVING): global per-order quantity
        # sum folded inside the orderkey join buckets; only survivors
        # of the threshold leave the shuffle
        "large_orders": lambda sf: analytics.large_orders(sf),
        # TPC-H Q12 shape: conditional two-way counts after a join —
        # per-(order,flag) combiner, (orderkey,high-bit)-only dim side,
        # fold inside the join buckets, <=6-row partials to the driver
        "returnflag_priority": lambda sf: analytics.returnflag_priority(sf),
        # TPC-H Q17 shape: correlated per-part AVG subquery folded
        # inside the partkey join buckets (5*qty*cnt < sum integer law)
        "small_qty_revenue": lambda sf: analytics.small_qty_revenue(sf),
        # TPC-H Q22 shape: global positive-balance scalar (2 ints to
        # the driver) + anti-join vs recent-order custkeys, per-nation
        "idle_customers": lambda sf: analytics.idle_customers(sf),
        # TPC-H Q15 shape: global ARGMAX with ties — per-supplier
        # combiner fold, block-max partials merged on the driver, tiny
        # winner set broadcast into the supplier dim (no dim shuffle)
        "top_supplier": lambda sf: analytics.top_supplier(sf),
        # transposition-aware edit join: TRUE Damerau-Levenshtein <= 2
        # in the same capped prefix blocks as edit_block_pairs (shared
        # builder; DL kernel fuzz-matched to DuckDB's byte law)
        "dl_block_pairs": lambda sf: erblock.dl_block_pairs(
            _read_docs(sf)),
        # Adjusted Rand Index of the near-dup closure vs exact-dup
        # truth: chance-corrected eval from the SAME pair-count scalars
        # as cluster_pair_eval (exact ints, HUGEINT in SQL, // = trunc)
        "cluster_ari": _cluster_ari,
        # the FS optimal decision rule (Fellegi & Sunter 1969): gamma
        # patterns ranked by exact m/u likelihood ratio, match zone =
        # largest prefix within the mu false-match budget, nonmatch =
        # largest suffix within lambda; rides the shared EM-stats pass
        "fs_decision_zones": lambda sf: erblock.fs_decision_zones(
            _read_table(sf, "customer",
                        ["c_custkey", "c_name", "c_nationkey",
                         "c_mktsegment", "c_acctbal"])),
        # purity / inverse purity: majority-label clustering eval over
        # the shared near-dup closure — per-margin MAX of the same
        # (cluster, fp) cells as B³ (the label itself never built)
        "cluster_purity": _cluster_purity,
        # TPC-H Q19 shape (OR-of-ANDs bracket predicate): disjunction
        # pushed into the filtered part dim, (partkey, qty) combiner,
        # one bucket join, fixed 3-row output
        "bracket_revenue": lambda sf: analytics.bracket_revenue(sf),
        # meta-blocking with node-LOCAL pruning (WNP): an edge survives
        # if it reaches EITHER endpoint's own mean — margins from one
        # narrow node groupby, attached via two bucket joins
        "meta_blocking_wnp": lambda sf: erblock.meta_blocking_wnp(
            _read_docs(sf)),
        # progressive (pay-as-you-go) ER: the top-k candidate pairs by
        # CBS weight, ranked — per-batch top-k partials, bounded merge
        "progressive_pairs": lambda sf: erblock.progressive_pairs(
            _read_docs(sf)),
        # multi-measure set-similarity join: Jaccard / Dice /
        # containment bps side by side over the shared shingle
        # candidates (containment is the loosest filter of the three)
        "setsim_measures": lambda sf: erblock.setsim_measures(
            _read_docs(sf)),
        # TPC-H Q5 shape: same-nation customer/supplier revenue within
        # a region — driver dim keyset, per-side combiners, 3 bucket
        # joins (custkey/suppkey/orderkey), dim-bounded driver merge
        "local_supplier_volume": lambda sf:
            analytics.local_supplier_volume(sf),
        # TPC-H Q7 shape: bilateral shipping volume by year — shares the
        # Q5 orders-side builder; cross-nation mask in the final buckets
        "nation_trade_volume": lambda sf:
            analytics.nation_trade_volume(sf),
        # meta-blocking with cardinality node pruning (CNP): each node
        # keeps its top-k edges, OR-union — budget-bounded output;
        # node-hash buckets rank vectorized, pair-hash buckets dedup
        "meta_blocking_cnp": lambda sf: erblock.meta_blocking_cnp(
            _read_docs(sf)),
        # Monge-Elkan hybrid token similarity, both directions, over the
        # tau-50 shingle candidates — ids-only pair shuffle, texts via
        # two bucket joins, closed-vocab inner-ratio memo in-bucket
        "monge_elkan_pairs": lambda sf: erblock.monge_elkan_pairs(
            _read_docs(sf)),
        # TPC-H Q8 shape: one nation's supply share among a region's
        # type-filtered revenue, per year — two sums one bp ratio;
        # shared part-filter/supplier and orders-side builders
        "market_share": lambda sf: analytics.market_share(sf),
        # TPC-H Q9 shape (sans partsupp): profit by supplier nation ×
        # order year for substring-named parts — partkey semi-filter
        # bucket join, year attach folds in the orderkey buckets
        "product_profit": lambda sf: analytics.product_profit(sf),
        # blocking-rule marginal coverage (Splink count_comparisons):
        # fp / 4-gram / 3-gram rule stack, totals + marginal-new in ONE
        # pair-hash reduce, fixed 3-row output
        "blocking_rule_coverage": lambda sf:
            erblock.blocking_rule_coverage(_read_docs(sf)),
        # per-pair feature vectors for a learned matcher: token
        # Jaccard / ME both ways / first-token edit / length diff — one
        # in-bucket pass over the shared text-attach plan; a new
        # feature never adds a shuffle
        "pair_features": lambda sf: erblock.pair_features(_read_docs(sf)),
        # two-hop blocking-graph expansion: indirect pairs sharing a
        # (degree-capped) CBS witness, direct edges subtracted in the
        # SAME pair reduce via a flag column — no second shuffle
        "two_hop_pairs": lambda sf: erblock.two_hop_pairs(_read_docs(sf)),
        # market-basket: top-k co-purchased part pairs — the self-join
        # stays inside orderkey buckets (fan-out bounded by order
        # size), pair counts finalize in pair-hash groups
        "basket_pairs": lambda sf: analytics.basket_pairs(sf),
        # Pareto concentration: top-decile customer revenue share per
        # nation — custkey join folds exact totals, nation-hash groups
        # cut the decile vectorized, |nations| rows out
        "revenue_concentration": lambda sf:
            analytics.revenue_concentration(sf),
        # Q21: sole-late-supplier in finished multi-supplier orders —
        # the lineitem EXISTS/NOT-EXISTS self-join as per-order folds
        # inside the orderkey join buckets, nation-bounded top-k
        "waiting_suppliers": lambda sf: analytics.waiting_suppliers(sf),
        # triangle census / transitivity of the near-dup graph — wedges
        # generated once at each triangle's lowest vertex, closing-edge
        # test fused into one pair-hash reduce, scalar partials out
        "graph_triangles": lambda sf: cluster.graph_triangles(
            _read_docs(sf)),
        # Heaps-law growth curve under deterministic md5-slice
        # subsampling — vocab(k) = #tokens with min slice < k, a
        # groupby-min + 16-bin histogram (never ships a vocabulary)
        "vocab_growth": lambda sf: textstats.vocab_growth(
            _read_docs(sf)),
        # Q6: in-year discount-band revenue — the predicate-pushdown
        # demo (ship-date window pruned at the parquet read via row-
        # group statistics), map-only scalar partials, zero shuffles
        "forecast_revenue": lambda sf: analytics.forecast_revenue(sf),
        # Q11: parts above a GLOBAL-scalar value threshold — bucketed
        # semi join vs the nation's suppliers, per-part totals
        # materialized once to serve both the scalar and the filter
        "important_parts": lambda sf: analytics.important_parts(sf),
        # Q20: strict-majority suppliers of a part family — dominance
        # settles inside the semi join's partkey buckets (no extra
        # shuffle), nation name-attach via guarded broadcast
        "excess_shippers": lambda sf: analytics.excess_shippers(sf),
        # split/merge repair-cost clustering audit — cell-table
        # identities (cells−fps merges, cells−clusters splits) off the
        # shared (cluster, fp) pass; six scalars to the driver
        "cluster_split_merge": _cluster_split_merge,
        # block filtering (Papadakis): per-record top-⌈r·n⌉ rarest
        # blocks, pairs survive only through blocks BOTH kept — three
        # narrow shuffles (token df / doc quota / token pair-emit)
        "block_filtering_pairs": lambda sf: erblock.block_filtering_pairs(
            _read_docs(sf)),
        # greedy 1-1 matching by iterated mutual-best elimination —
        # bounded parallel sweeps over the linear FS pair table, four
        # narrow shuffles per round, matched nodes anti-joined out
        "greedy_one_to_one": lambda sf: erblock.greedy_one_to_one(
            _read_table(sf, "customer",
                        ["c_custkey", "c_name", "c_nationkey",
                         "c_mktsegment", "c_acctbal"])),
        # per-doc novelty audit (df==1 shingle fraction) — two narrow
        # shuffles (shingle df in-bucket, per-doc combine), no pairs,
        # vocabulary never ships
        "doc_novelty": lambda sf: dedup.doc_novelty(_read_docs(sf)),
        # Q2: correlated per-part MIN unit cost with ties — two honest
        # bucketed semi joins, argmin settles in the partkey buckets,
        # winners take the guarded broadcast for names
        "min_cost_supplier": lambda sf: analytics.min_cost_supplier(sf),
        # cross-source duplication matrix over the shared near-dup pair
        # law — two ids-only attach joins, |sources|² matrix partials,
        # pairs never reach the driver
        "source_dup_matrix": lambda sf: dedup.source_dup_matrix(
            _read_table(sf, "documents", ["doc_id", "text", "source"])),
        # shingle df histogram — the block-skew forecast behind every
        # max_df / salting-cap choice; buckets collapse to (df, count)
        # partials, the vocabulary never ships
        "shingle_df_hist": lambda sf: dedup.shingle_df_hist(
            _read_docs(sf)),
        # IDF-weighted Jaccard pairs — rare shingles outvote
        # boilerplate; weights/df in one bucket pass, ids-only
        # weight-attach joins, exact integer threshold
        "weighted_jaccard_pairs": lambda sf: dedup.weighted_jaccard_pairs(
            _read_docs(sf)),
        # V-measure pair (homogeneity/completeness) in integer
        # bit-entropy — two bucket passes over the shared cell table,
        # margins never leave their bucket, scalars to the driver
        "cluster_homogeneity": _cluster_homogeneity,
        # cohort retention matrix — first-week cohorts, user-bucket
        # kernels collapse to (cohort, offset) matrix partials, users
        # never leave their bucket
        "cohort_retention": lambda sf: analytics.cohort_retention(sf),
        # near-superset dedup: drop docs tau-80 contained in a bigger
        # partner — directional tests on the shared candidate stream,
        # keep flags via distinct-key semi/anti joins
        "containment_keep": lambda sf: erblock.containment_keep(
            _read_docs(sf)),
        # per-customer exact median inter-order gap — one customer-hash
        # shuffle, the whole per-key percentile kernel vectorized
        # in-bucket (sort/diff/rank), no per-key groups
        "order_gap_median": lambda sf: analytics.order_gap_median(sf),
        # association rules for the top-k co-purchase pairs — supports
        # ride the same order-bucket kernels (no extra fact shuffle),
        # lift in Python ints / SQL HUGEINT
        "basket_lift": lambda sf: analytics.basket_lift(sf),
        # exact join-key heavy hitters — the salting-decision audit;
        # lossless per-bucket top-k partials, <= buckets*k to driver
        "fact_key_skew": lambda sf: analytics.fact_key_skew(sf),
        # k-anonymity audit over (lang, source, length-bin) quasi-ids —
        # class sizes finalize in qid buckets, five scalars per bucket
        "k_anonymity": lambda sf: textstats.k_anonymity(
            _read_table(sf, "documents",
                        ["doc_id", "lang", "source", "n_chars"])),
        # weekly new-vs-returning split — the cohort machinery's other
        # classic reading; per-week partials out of the user buckets
        "new_vs_returning": lambda sf: analytics.new_vs_returning(sf),
        # dedup impact report — docs/tokens kept vs dropped under the
        # shared closure keep-list; one scalar partial per join block
        "dedup_impact": _dedup_impact,
        # record linkage (non-SQL: regex normalizer + 50-rule cascade) —
        # deliberately LAST: these four have no SQL oracle (parity-tested
        # against the executable reference instead), so every oracled entry
        # sits inside the driver's correctness window.
        # streaming dedup vs a shared mutable actor index (arrival-order
        # first-wins keep — no SQL oracle by nature: DuckDB has no arrival
        # order; the keep-COUNT law is pytest-verified)
        "incremental_dedup": _incremental_dedup,
        "linkage_pairs": _linkage_pairs,
        "linkage_clusters": _linkage_clusters,
        "pair_scoring": _pair_scoring,
        "coname_legacy": _coname_legacy,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB, same parquet tables pre-registered as views)
# ---------------------------------------------------------------------------

_STOP_ALT = "|".join(textstats.STOPWORDS)


def _fs_fields_cte() -> str:
    """The FS comparison-field projection + total-pair-count CTEs
    (erblock._fs_fields): spliced after WITH by every fs_* oracle."""
    return """c AS (
                SELECT c_custkey AS id, c_nationkey AS nat,
                       coalesce(c_mktsegment, '') AS seg,
                       right(left(coalesce(c_name, ''),
                                  length(coalesce(c_name, '')) - 1), 1) AS ten,
                       CAST(floor(CAST(floor(coalesce(c_acctbal, 0)*100 + 0.5)
                                       AS BIGINT) / 100000.0) AS BIGINT) AS bal
                FROM customer),
            t AS (SELECT COUNT(*)*(COUNT(*)-1)//2 AS t FROM c)"""


def _fs_scored_cte() -> str:
    """The shared Fellegi–Sunter CTE chain (erblock._fs_weight_pass +
    the gap-5 candidate blocker): fields → total/agreement pair counts →
    bit-length weights → scored candidate pairs (l, r, score).  Spliced
    after WITH by the fs_match_scores / fs_mutual_best / fs_em_round /
    fs_pattern_counts oracles."""
    return _fs_fields_cte() + """,
            a AS (
                SELECT 'seg' AS f, SUM(cnt*(cnt-1)//2) AS a
                FROM (SELECT COUNT(*) AS cnt FROM c GROUP BY seg)
                UNION ALL
                SELECT 'ten', SUM(cnt*(cnt-1)//2)
                FROM (SELECT COUNT(*) AS cnt FROM c GROUP BY ten)
                UNION ALL
                SELECT 'bal', SUM(cnt*(cnt-1)//2)
                FROM (SELECT COUNT(*) AS cnt FROM c GROUP BY bal)),
            w AS (
                SELECT f, CASE WHEN a > 0 THEN length(bin(t // a))
                               WHEN t > 0 THEN length(bin(t))
                               ELSE 0 END AS w
                FROM a, t),
            scored AS (
                SELECT x.id AS l, y.id AS r,
                       (x.seg = y.seg) AS eq_seg,
                       (x.ten = y.ten) AS eq_ten,
                       (x.bal = y.bal) AS eq_bal,
                       (CASE WHEN x.seg = y.seg
                             THEN (SELECT w FROM w WHERE f = 'seg')
                             ELSE 0 END
                      + CASE WHEN x.ten = y.ten
                             THEN (SELECT w FROM w WHERE f = 'ten')
                             ELSE 0 END
                      + CASE WHEN x.bal = y.bal
                             THEN (SELECT w FROM w WHERE f = 'bal')
                             ELSE 0 END) AS score
                FROM c x JOIN c y
                  ON x.nat = y.nat AND y.id > x.id AND y.id <= x.id + 5)"""


def _greedy_one_to_one_oracle(rounds: int = 3) -> str:
    """Unrolled greedy-matching oracle: each round's mutual-best CTE
    (ROW_NUMBER argmax per l and per r over the REMAINING pairs, ties
    to the lowest partner id) followed by node subtraction — the
    pagerank-style bounded-rounds unroll over the shared FS scored-pair
    law (_fs_scored_cte)."""
    parts = []
    prev = "scored"
    for i in range(1, rounds + 1):
        parts.append(f"""
            m{i} AS (
              SELECT lb.l, lb.r, lb.score FROM
                (SELECT l, r, score FROM (
                    SELECT l, r, score,
                           ROW_NUMBER() OVER (PARTITION BY l
                               ORDER BY score DESC, r) AS k
                    FROM {prev}) WHERE k = 1) lb
              JOIN (SELECT l, r FROM (
                    SELECT l, r,
                           ROW_NUMBER() OVER (PARTITION BY r
                               ORDER BY score DESC, l) AS k
                    FROM {prev}) WHERE k = 1) rb
              ON lb.l = rb.l AND lb.r = rb.r),
            n{i} AS (SELECT l AS v FROM m{i}
                     UNION SELECT r FROM m{i}),
            p{i} AS (SELECT l, r, score FROM {prev}
                     WHERE l NOT IN (SELECT v FROM n{i})
                       AND r NOT IN (SELECT v FROM n{i}))""")
        prev = f"p{i}"
    union = "\n            UNION ALL ".join(
        f"SELECT {i} AS round, l, r, score FROM m{i}"
        for i in range(1, rounds + 1))
    return f"""
            WITH {_fs_scored_cte()},{",".join(parts)}
            SELECT CAST(round AS BIGINT) AS round,
                   CAST(l AS BIGINT) AS left_id,
                   CAST(r AS BIGINT) AS right_id,
                   CAST(score AS BIGINT) AS score
            FROM ({union})
        """


def _pii_oracle() -> str:
    """DuckDB replica of :func:`_redact_pii`: the injection rule is plain
    SQL string concat, and the RE2 patterns are taken verbatim from
    ``curation.PII_PATTERNS`` (DuckDB's regex engine is the same RE2, so
    count/replace semantics match byte-for-byte)."""
    from name_matching_ray.stages.curation import PII_PATTERNS

    sql = """
        WITH t AS (
          SELECT doc_id, text
            || CASE WHEN doc_id % 7 = 0
               THEN ' contact user' || doc_id || '@example.com' ELSE '' END
            || CASE WHEN doc_id % 11 = 0
               THEN ' call +1 (' || (300 + doc_id % 700) || ') 555-'
                    || (1000 + doc_id % 9000) ELSE '' END
            || CASE WHEN doc_id % 13 = 0
               THEN ' from 10.' || (doc_id % 256) || '.0.' || (doc_id % 250)
               ELSE '' END AS txt
          FROM documents)"""
    prev, cols = "t", []
    for step, (kind, pat, repl) in enumerate(PII_PATTERNS):
        cur = f"r{step}"
        carried = ", ".join(cols)
        sql += f""",
        {cur} AS (SELECT doc_id{', ' + carried if carried else ''},
               CAST(len(regexp_extract_all(txt, '{pat}')) AS BIGINT)
                   AS n_{kind},
               regexp_replace(txt, '{pat}', '{repl}', 'g') AS txt
           FROM {prev})"""
        prev = cur
        cols.append(f"n_{kind}")
    sql += f"""
        SELECT doc_id, {', '.join(cols)},
               CAST(length(txt) AS BIGINT) AS clean_len FROM {prev}"""
    return sql


_PII_ORACLE = _pii_oracle()


def _ivf_topk_oracle() -> str:
    """DuckDB replica of :func:`_ivf_topk`: the SAME fixed centroids are
    inlined as literals; assignment (argmax cosine), the nprobe probe
    UNION over all queries, and the per-query top-k are plain SQL."""
    cent = annsearch.fixed_centroids(8, 64)
    rows = ",\n".join(
        f"({ci}, [{', '.join(repr(float(v)) for v in c)}]::DOUBLE[])"
        for ci, c in enumerate(cent)
    )
    qids = ",".join(str(q) for q in _ANN_QUERY_IDS)
    return f"""
        WITH cent(cid, cvec) AS (VALUES {rows}),
        asg AS (
            SELECT vec_id, cid AS part FROM (
                SELECT e.vec_id, c.cid, row_number() OVER (
                    PARTITION BY e.vec_id
                    ORDER BY list_cosine_similarity(e.embedding, c.cvec) DESC,
                             c.cid) AS rn
                FROM embeddings e CROSS JOIN cent c)
            WHERE rn = 1),
        probes AS (
            SELECT c.cid
            FROM embeddings q CROSS JOIN cent c
            WHERE q.vec_id IN ({qids})
            QUALIFY row_number() OVER (
                PARTITION BY q.vec_id
                ORDER BY list_cosine_similarity(q.embedding, c.cvec) DESC,
                         c.cid) <= 4),
        wanted AS (SELECT DISTINCT cid FROM probes),
        s AS (
            SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
                   list_cosine_similarity(q.embedding, d.embedding) AS sim
            FROM embeddings q
            JOIN asg a ON a.part IN (SELECT cid FROM wanted)
            JOIN embeddings d ON d.vec_id = a.vec_id AND d.vec_id <> q.vec_id
            WHERE q.vec_id IN ({qids}))
        SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
              FROM s)
        WHERE rn <= 10
    """


def _cluster_outliers_oracle() -> str:
    """DuckDB replica of :func:`annsearch.cluster_outliers`: the SAME fixed
    centroids inlined; assignment is the shared argmax-cosine CTE; the
    distance is the int8-grid L2 with BOTH sides quantized by the
    floor(x·127+0.5) law; ties → lowest vec_id."""
    cent = annsearch.fixed_centroids(8, 64)
    rows = ",\n".join(
        f"({ci}, [{', '.join(repr(float(v)) for v in c)}]::DOUBLE[])"
        for ci, c in enumerate(cent)
    )
    return f"""
        WITH cent(cid, cvec) AS (VALUES {rows}),
        asg AS (
            SELECT vec_id, cid FROM (
                SELECT e.vec_id, c.cid, row_number() OVER (
                    PARTITION BY e.vec_id
                    ORDER BY list_cosine_similarity(e.embedding, c.cvec)
                        DESC, c.cid) AS rn
                FROM embeddings e CROSS JOIN cent c)
            WHERE rn = 1),
        q AS (
            SELECT vec_id, g.i - 1 AS dim,
                   CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 127 + 0.5)
                        AS BIGINT) AS code
            FROM embeddings,
                 UNNEST(generate_series(1, len(embedding))) AS g(i)),
        ccode AS (
            SELECT c.cid, g.i - 1 AS dim,
                   CAST(floor(CAST(cvec[g.i] AS DOUBLE) * 127 + 0.5)
                        AS BIGINT) AS code
            FROM cent c, UNNEST(generate_series(1, len(cvec))) AS g(i)),
        d AS (
            SELECT a.vec_id, a.cid,
                   SUM((q.code - cc.code) * (q.code - cc.code)) AS dist
            FROM asg a
            JOIN q ON q.vec_id = a.vec_id
            JOIN ccode cc ON cc.cid = a.cid AND cc.dim = q.dim
            GROUP BY 1, 2)
        SELECT cid AS cluster, vec_id, CAST(dist AS BIGINT) AS dist
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY cid ORDER BY dist DESC, vec_id) AS rn
              FROM d)
        WHERE rn = 1
    """


def _cluster_stats_oracle() -> str:
    """DuckDB replica of :func:`_cluster_stats`: the SAME fixed centroids
    inlined as literals; assignment is the identical argmax-cosine
    row_number CTE the ivf_topk oracle uses; size + majority label (ties ->
    lowest label, matching the Ray kernel's sort) are plain SQL."""
    cent = annsearch.fixed_centroids(8, 64)
    rows = ",\n".join(
        f"({ci}, [{', '.join(repr(float(v)) for v in c)}]::DOUBLE[])"
        for ci, c in enumerate(cent)
    )
    return f"""
        WITH cent(cid, cvec) AS (VALUES {rows}),
        asg AS (
            SELECT vec_id, cid FROM (
                SELECT e.vec_id, c.cid, row_number() OVER (
                    PARTITION BY e.vec_id
                    ORDER BY list_cosine_similarity(e.embedding, c.cvec) DESC,
                             c.cid) AS rn
                FROM embeddings e CROSS JOIN cent c)
            WHERE rn = 1),
        cl AS (
            SELECT a.cid, CAST(e.label AS BIGINT) AS lbl, count(*) AS n
            FROM asg a JOIN embeddings e USING (vec_id)
            GROUP BY 1, 2),
        tot AS (SELECT cid, sum(n) AS nv FROM cl GROUP BY 1)
        SELECT t.cid AS cluster_id,
               CAST(t.nv AS BIGINT) AS n_vecs,
               m.lbl AS majority_label,
               CAST(m.n AS BIGINT) AS n_majority
        FROM tot t JOIN (
            SELECT cid, lbl, n, row_number() OVER (
                PARTITION BY cid ORDER BY n DESC, lbl) AS rn
            FROM cl) m ON m.cid = t.cid AND m.rn = 1
    """


def _kmeans_update_oracle() -> str:
    """DuckDB replica of :func:`annsearch.kmeans_update`: the SAME fixed
    centroids quantized with the quantized_topk law and inlined as DOUBLE
    literals; assignment = integer argmin of ``c² − 2q·c`` (the per-row
    ``q²`` term is constant per vec — dropped on both sides), ties →
    lowest cid; sums per (cluster, dim) via the range-index idiom."""
    import numpy as np

    cent = annsearch.fixed_centroids(8, 64)
    cq = np.floor(cent.astype(np.float64) * 127.0 + 0.5)
    rows = ",\n".join(
        f"({ci}, [{', '.join(repr(float(v)) for v in c)}]::DOUBLE[])"
        for ci, c in enumerate(cq)
    )
    return f"""
        WITH cent(cid, cq) AS (VALUES {rows}),
        q AS (SELECT vec_id, list_transform(embedding,
                   x -> floor(CAST(x AS DOUBLE) * 127 + 0.5)) AS qv
              FROM embeddings),
        dist AS (SELECT q.vec_id, c.cid,
                        CAST(list_dot_product(c.cq, c.cq)
                             - 2 * list_dot_product(q.qv, c.cq)
                             AS BIGINT) AS d2
                 FROM q CROSS JOIN cent c),
        asg AS (SELECT vec_id, cid FROM (
                    SELECT vec_id, cid, row_number() OVER (
                        PARTITION BY vec_id ORDER BY d2, cid) AS rn
                    FROM dist) WHERE rn = 1),
        n AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_vecs
              FROM asg GROUP BY cid),
        xv AS (SELECT a.cid, unnest(range(1, len(q.qv) + 1)) AS i, q.qv
               FROM asg a JOIN q USING (vec_id)),
        s AS (SELECT cid, CAST(i - 1 AS BIGINT) AS dim,
                     CAST(SUM(qv[i]) AS BIGINT) AS dim_sum
              FROM xv GROUP BY 1, 2)
        SELECT s.cid AS cluster_id, s.dim, s.dim_sum, n.n_vecs
        FROM s JOIN n USING (cid)
    """


def _semantic_keep_list_oracle() -> str:
    """DuckDB replica of :func:`_semantic_keep_list`: same fixed centroids,
    same argmax-cosine assignment CTE, in-partition pair join at the same
    float threshold (the embedding_dups-proven comparison), recursive-CTE
    min-label closure with min-id keep flag."""
    cent = annsearch.fixed_centroids(8, 64)
    rows = ",\n".join(
        f"({ci}, [{', '.join(repr(float(v)) for v in c)}]::DOUBLE[])"
        for ci, c in enumerate(cent)
    )
    return f"""
        WITH RECURSIVE cent(cid, cvec) AS (VALUES {rows}),
        asg AS (
            SELECT vec_id, cid FROM (
                SELECT e.vec_id, c.cid, row_number() OVER (
                    PARTITION BY e.vec_id
                    ORDER BY list_cosine_similarity(e.embedding, c.cvec) DESC,
                             c.cid) AS rn
                FROM embeddings e CROSS JOIN cent c)
            WHERE rn = 1),
        p AS (
            SELECT x.vec_id AS l, y.vec_id AS r
            FROM asg x JOIN asg y
                 ON x.cid = y.cid AND x.vec_id < y.vec_id
            JOIN embeddings a ON a.vec_id = x.vec_id
            JOIN embeddings b ON b.vec_id = y.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.35),
        edges AS (SELECT l AS a, r AS b FROM p
                  UNION ALL SELECT r, l FROM p),
        reach(node, lab) AS (
            SELECT vec_id, vec_id FROM embeddings
            UNION
            SELECT e.a, rch.lab FROM edges e JOIN reach rch ON rch.node = e.b)
        SELECT node AS vec_id, MIN(lab) AS cluster_id,
               CAST(CASE WHEN node = MIN(lab) THEN 1 ELSE 0 END AS BIGINT)
                   AS keep
        FROM reach GROUP BY node
    """


def _srp_oracle() -> str:
    """DuckDB replica of ``srp_lsh_pairs``: the same 64 seeded hyperplanes
    inlined as literals; sign bits, pairwise hamming and the <= max_hamming
    filter are plain SQL.  (The SQL compares all pairs directly — banding
    only prunes candidates, never changes the <= max_hamming result set.)"""
    hp = annsearch.srp_hyperplanes()
    rows = ",\n".join(
        f"({bi}, [{', '.join(repr(float(v)) for v in h)}]::DOUBLE[])"
        for bi, h in enumerate(hp)
    )
    return f"""
        WITH hp(bit, hvec) AS (VALUES {rows}),
        bits AS (
            SELECT e.vec_id, h.bit,
                   CASE WHEN list_dot_product(e.embedding, h.hvec) > 0
                        THEN 1 ELSE 0 END AS s
            FROM embeddings e CROSS JOIN hp h),
        ham AS (
            SELECT a.vec_id AS left_id, b.vec_id AS right_id,
                   SUM(CASE WHEN a.s <> b.s THEN 1 ELSE 0 END) AS hamming
            FROM bits a JOIN bits b ON a.bit = b.bit AND a.vec_id < b.vec_id
            GROUP BY a.vec_id, b.vec_id)
        SELECT left_id, right_id, CAST(hamming AS BIGINT) AS hamming
        FROM ham WHERE hamming <= 16
    """


# shared PQ CTE chain (int8 codes per dim, codebook from vec_ids 0..7,
# per-subspace integer argmin with lowest-cid ties) — used by the
# pq_encode and pq_topk oracles so the code law cannot drift.
_PQ_CODES_CTE = """q AS (
                SELECT vec_id, g.i - 1 AS dim,
                       CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 127
                                  + 0.5) AS BIGINT) AS code
                FROM embeddings,
                     UNNEST(generate_series(1, len(embedding))) AS g(i)),
            cent AS (
                SELECT dense_rank() OVER (ORDER BY vec_id) - 1 AS cid,
                       dim, code
                FROM q WHERE vec_id IN (0, 1, 2, 3, 4, 5, 6, 7)),
            costs AS (
                SELECT q.vec_id, q.dim // 16 AS subspace, c.cid,
                       SUM((q.code - c.code) * (q.code - c.code)) AS cost
                FROM q JOIN cent c ON c.dim = q.dim
                GROUP BY 1, 2, 3),
            best AS (
                SELECT vec_id, subspace, cid AS code, cost,
                       row_number() OVER (PARTITION BY vec_id, subspace
                                          ORDER BY cost, cid) AS rn
                FROM costs)"""


def _ngram_jaccard_oracle(tau100: int) -> str:
    """The exact 3-token-shingle Jaccard pair law at threshold
    ``tau100/100`` (df ∈ [2, 100] stop-shingle guard) — shared by the
    graded ngram_jaccard_dedup (tau 10) and the minhash_recall ground
    truth (tau 50) so the two laws can never drift."""
    return f"""
            WITH tok AS (
                SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w
                FROM documents),
            sh AS (
                SELECT DISTINCT doc_id,
                       w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
                FROM tok, UNNEST(generate_series(1, len(w) - 2)) AS g(i)),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
            ok_sh AS (
                SELECT shingle FROM sh GROUP BY shingle
                HAVING COUNT(*) BETWEEN 2 AND 100),
            pairs AS (
                SELECT a.doc_id AS left_id, b.doc_id AS right_id, COUNT(*) AS inter
                FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                WHERE a.shingle IN (SELECT shingle FROM ok_sh)
                GROUP BY a.doc_id, b.doc_id)
            SELECT p.left_id, p.right_id, p.inter,
                   sa.n_sh AS n_left, sb.n_sh AS n_right
            FROM pairs p
            JOIN sizes sa ON sa.doc_id = p.left_id
            JOIN sizes sb ON sb.doc_id = p.right_id
            WHERE p.inter*100 >= (sa.n_sh + sb.n_sh - p.inter)*{tau100}
    """


def _minhash_oracle() -> str:
    """DuckDB replica of :func:`dedup.minhash_lsh_pairs` — the pipeline is
    fully deterministic, so the oracle recomputes it exactly: the shingle
    hash is md5-low64 (== ``md5_number_lower``), the 128 seeded permutation
    constants are inlined as literals, signatures are per-permutation minima
    of ``(a*x + b) mod 2**64`` (the numpy uint64 wraparound family), LSH
    candidates are doc pairs sharing any 4-row band CHUNK (the Ray side
    buckets by a hash of the chunk; equality of chunks is the same relation
    up to negligible hash collisions), the per-band-bucket ``max_bucket``
    drop is the ``HAVING c <= max_bucket`` guard, and the emitted estimate
    is ``agree*100 // 128`` for pairs agreeing on >= ceil(tau*128) = 64
    components."""
    import numpy as np

    rng = np.random.default_rng(7)
    mersenne = (1 << 61) - 1
    a = rng.integers(1, mersenne, size=128, dtype=np.uint64)
    b = rng.integers(0, mersenne, size=128, dtype=np.uint64)
    perm_rows = ",".join(
        f"({i}, {int(a[i])}, {int(b[i])})" for i in range(128)
    )
    return f"""
        WITH perms(i, pa, pb) AS (VALUES {perm_rows}),
        t AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\\s+'),
                               x -> x <> '') AS toks
            FROM documents),
        sh AS (
            SELECT doc_id, unnest(list_distinct(
                       [array_to_string(toks[i:i+2], ' ')
                        FOR i IN range(1, len(toks) - 1)])) AS s
            FROM t WHERE len(toks) >= 3),
        xs AS (SELECT doc_id, CAST(md5_number_lower(s) AS HUGEINT) AS x
               FROM sh),
        hm AS (
            SELECT doc_id, p.i,
                   MIN((x * p.pa + p.pb) % 18446744073709551616) AS h
            FROM xs CROSS JOIN perms p GROUP BY doc_id, p.i),
        sig AS (SELECT doc_id, list(h ORDER BY i) AS sig
                FROM hm GROUP BY doc_id),
        bands AS (
            SELECT doc_id, b.b AS band,
                   list_slice(sig, b.b*4 + 1, b.b*4 + 4) AS chunk
            FROM sig CROSS JOIN (SELECT unnest(range(0, 32)) AS b) b),
        bsz AS (SELECT band, chunk, COUNT(*) AS c
                FROM bands GROUP BY band, chunk),
        cand AS (
            SELECT DISTINCT a.doc_id AS l, c.doc_id AS r
            FROM bands a
            JOIN bands c ON a.band = c.band AND a.chunk = c.chunk
                        AND a.doc_id < c.doc_id
            JOIN bsz z ON z.band = a.band AND z.chunk = a.chunk
                      AND z.c <= 200),
        ag AS (
            SELECT cand.l, cand.r,
                   len([i FOR i IN range(1, 129)
                        IF sa.sig[i] = sb.sig[i]]) AS agree
            FROM cand JOIN sig sa ON sa.doc_id = cand.l
                      JOIN sig sb ON sb.doc_id = cand.r)
        SELECT l AS left_id, r AS right_id,
               CAST(agree * 100 // 128 AS BIGINT) AS est_sim_pct
        FROM ag WHERE agree >= 64
    """



def _soundex_sql() -> str:
    """The phonetic_block_pairs key expression (chained-replace Soundex)
    — ONE builder so blocking_cascade's oracle can never drift from the
    standalone one."""
    rep = ("translate(substr(regexp_replace(lower(coalesce(text,'')),"
           "'[^a-z]','','g'),1,10), 'abcdefghijklmnopqrstuvwxyz',"
           " '01230120022455012623010202')")
    for d in "0123456":
        for _ in range(4):
            rep = f"replace({rep},'{d}{d}','{d}')"
    return rep


def oracle_sql() -> dict[str, str]:
    # (the salted whale-key plans were registry aliases of sessionize/asof/
    # rolling; they now live only as the pytest equality
    # test_salted_event_ops_equal_unsalted, so no alias oracles remain)
    base = _oracle_sql_base()
    # quality_gate = gopher_rules ∧ line_filter: composed from the two
    # component oracles so the three keep laws can never drift apart
    base["quality_gate"] = f"""
        WITH g AS (SELECT doc_id, keep AS gopher_keep
                   FROM ({base["gopher_rules"]})),
             l AS (SELECT doc_id, keep AS line_keep
                   FROM ({base["line_filter"]}))
        SELECT g.doc_id, g.gopher_keep, l.line_keep,
               CAST(g.gopher_keep * l.line_keep AS BIGINT) AS keep
        FROM g JOIN l USING (doc_id)
    """
    # minhash_recall: LSH candidates vs exact-Jaccard truth, both laws
    # nested verbatim from their own oracles (tau 50 truth via the shared
    # _ngram_jaccard_oracle helper)
    base["minhash_recall"] = f"""
        WITH truth AS (SELECT left_id, right_id
                       FROM ({_ngram_jaccard_oracle(50)})),
             found AS (SELECT left_id, right_id
                       FROM ({_minhash_oracle()})),
             h AS (SELECT COUNT(*) AS c
                   FROM truth t JOIN found f
                     ON f.left_id = t.left_id AND f.right_id = t.right_id)
        SELECT CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_true,
               CAST((SELECT COUNT(*) FROM found) AS BIGINT) AS n_found,
               CAST((SELECT c FROM h) AS BIGINT) AS n_hit,
               CAST((SELECT c FROM h) * 10000 //
                    greatest((SELECT COUNT(*) FROM truth), 1) AS BIGINT)
                   AS recall_bp,
               CAST((SELECT c FROM h) * 10000 //
                    greatest((SELECT COUNT(*) FROM found), 1) AS BIGINT)
                   AS precision_bp
    """
    # ivfpq_topk: the ivf_topk probe CTEs (fixed centroids inlined, probe
    # UNION over queries) restricting the pq_topk ADC law — all three
    # component recipes reused verbatim (i-prefixed CTEs avoid name clash
    # with the PQ chain's q/cent)
    _icent = annsearch.fixed_centroids(8, 64)
    _irows = ",\n".join(
        f"({ci}, [{', '.join(repr(float(v)) for v in c)}]::DOUBLE[])"
        for ci, c in enumerate(_icent))
    _iqids = ",".join(str(qd) for qd in _ANN_QUERY_IDS)
    base["ivfpq_topk"] = f"""
        WITH icent(icid, cvec) AS (VALUES {_irows}),
        iasg AS (
            SELECT vec_id, icid AS part FROM (
                SELECT e.vec_id, c.icid, row_number() OVER (
                    PARTITION BY e.vec_id
                    ORDER BY list_cosine_similarity(e.embedding, c.cvec)
                        DESC, c.icid) AS rn
                FROM embeddings e CROSS JOIN icent c)
            WHERE rn = 1),
        iprobes AS (
            SELECT c.icid
            FROM embeddings qv CROSS JOIN icent c
            WHERE qv.vec_id IN ({_iqids})
            QUALIFY row_number() OVER (
                PARTITION BY qv.vec_id
                ORDER BY list_cosine_similarity(qv.embedding, c.cvec)
                    DESC, c.icid) <= 4),
        iwanted AS (SELECT DISTINCT icid FROM iprobes),
        {_PQ_CODES_CTE},
        qrow AS (SELECT * FROM q WHERE vec_id IN ({_iqids})),
        lut AS (
            SELECT qr.vec_id AS query_id, qr.dim // 16 AS subspace, c.cid,
                   SUM((qr.code - c.code) * (qr.code - c.code)) AS d
            FROM qrow qr JOIN cent c ON c.dim = qr.dim
            GROUP BY 1, 2, 3),
        adc AS (
            SELECT l.query_id, b.vec_id, SUM(l.d) AS adc
            FROM best b
            JOIN iasg a ON a.vec_id = b.vec_id
                       AND a.part IN (SELECT icid FROM iwanted)
            JOIN lut l ON l.subspace = b.subspace AND l.cid = b.code
            WHERE b.rn = 1
            GROUP BY 1, 2)
        SELECT query_id, vec_id, CAST(adc AS BIGINT) AS adc,
               CAST(rn2 AS BIGINT) AS rank
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY query_id ORDER BY adc, vec_id) AS rn2
              FROM adc)
        WHERE rn2 <= 10
    """
    # perplexity_buckets: milli-bits/token over the unigram_bits oracle,
    # exact tertiles via the peers-inclusive cum·3 ≥ q·N rule
    base["perplexity_buckets"] = f"""
        WITH u AS (SELECT doc_id, n_tok, bits
                   FROM ({base["unigram_bits"]})),
        s AS (SELECT doc_id,
                     bits * 1000 // greatest(n_tok, 1) AS bpt FROM u),
        nn AS (SELECT count(*) AS n FROM s),
        cum AS (SELECT bpt, count(*) OVER (ORDER BY bpt) AS cum FROM s),
        cuts AS (
            SELECT (SELECT min(bpt) FROM cum, nn
                    WHERE cum * 3 >= nn.n) AS c1,
                   (SELECT min(bpt) FROM cum, nn
                    WHERE cum * 3 >= 2 * nn.n) AS c2)
        SELECT s.doc_id, s.bpt,
               CASE WHEN s.bpt <= cuts.c1 THEN 'head'
                    WHEN s.bpt <= cuts.c2 THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM s, cuts
    """
    # curate_corpus: quality_gate's composed keep ∧ dedup keep-first
    # (row_number over the frequency_cap fingerprint law at cap 1)
    base["curate_corpus"] = f"""
        WITH q AS (SELECT doc_id, keep AS quality_keep
                   FROM ({base["quality_gate"]})),
        f AS (SELECT doc_id,
                     CASE WHEN row_number() OVER (
                          PARTITION BY md5(regexp_replace(
                              lower(coalesce(text, '')),
                              '[^a-z0-9]', '', 'g'))
                          ORDER BY doc_id) = 1
                     THEN 1 ELSE 0 END AS dedup_keep
              FROM documents)
        SELECT q.doc_id, CAST(q.quality_keep AS BIGINT) AS quality_keep,
               CAST(f.dedup_keep AS BIGINT) AS dedup_keep,
               CAST(q.quality_keep * f.dedup_keep AS BIGINT) AS keep
        FROM q JOIN f ON f.doc_id = q.doc_id
    """
    # source_surprisal: the unigram_bits recipe rolled up per source
    base["source_surprisal"] = f"""
        WITH u AS (SELECT doc_id, n_tok, bits
                   FROM ({base["unigram_bits"]})),
             s AS (SELECT doc_id, source FROM documents)
        SELECT s.source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(u.n_tok) AS BIGINT) AS n_tok,
               CAST(sum(u.bits) AS BIGINT) AS bits,
               CAST(sum(u.bits) * 1000
                    // greatest(sum(u.n_tok), 1) AS BIGINT)
                   AS bits_per_kilotoken
        FROM u JOIN s ON s.doc_id = u.doc_id
        GROUP BY s.source
    """
    # cluster_size_hist: the keep-list recursive closure regrouped by size
    base["cluster_size_hist"] = f"""
        WITH cl AS (SELECT doc_id, cluster_id
                    FROM ({base["dedup_keep_list"]})),
             c AS (SELECT cluster_id, count(*) AS sz FROM cl GROUP BY 1)
        SELECT sz AS cluster_size,
               CAST(count(*) AS BIGINT) AS n_clusters,
               CAST(sz * count(*) AS BIGINT) AS n_docs
        FROM c GROUP BY sz
    """
    # winnow_recall: winnow_dedup candidates vs exact-Jaccard truth —
    # both component recipes nested verbatim (minhash_recall's shape)
    base["winnow_recall"] = f"""
        WITH truth AS (SELECT left_id, right_id
                       FROM ({_ngram_jaccard_oracle(50)})),
             found AS (SELECT left_id, right_id
                       FROM ({base["winnow_dedup"]})),
             h AS (SELECT COUNT(*) AS c
                   FROM truth t JOIN found f
                     ON f.left_id = t.left_id AND f.right_id = t.right_id)
        SELECT CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_true,
               CAST((SELECT COUNT(*) FROM found) AS BIGINT) AS n_found,
               CAST((SELECT c FROM h) AS BIGINT) AS n_hit,
               CAST((SELECT c FROM h) * 10000 //
                    greatest((SELECT COUNT(*) FROM truth), 1) AS BIGINT)
                   AS recall_bp,
               CAST((SELECT c FROM h) * 10000 //
                    greatest((SELECT COUNT(*) FROM found), 1) AS BIGINT)
                   AS precision_bp
    """
    # pq_recall: ADC top-k vs the flat grid index, composed from the two
    # component oracles (per-query hit counts; truth size from the oracle
    # itself, not an assumed k)
    base["pq_recall"] = f"""
        WITH e AS (SELECT query_id, vec_id FROM ({base["grid_l2_topk"]})),
             a AS (SELECT query_id, vec_id FROM ({base["pq_topk"]})),
             t AS (SELECT query_id, count(*) AS nt FROM e GROUP BY 1),
             h AS (SELECT e.query_id, count(*) AS n_hit
                   FROM e JOIN a ON a.query_id = e.query_id
                                AND a.vec_id = e.vec_id
                   GROUP BY 1)
        SELECT t.query_id,
               CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
               CAST(coalesce(h.n_hit, 0) * 10000
                    // greatest(t.nt, 1) AS BIGINT) AS recall_bp
        FROM t LEFT JOIN h ON h.query_id = t.query_id
    """
    # pagerank_dups: 2 damped integer iterations unrolled over the shared
    # ngram-pair law (floor at every step: pr//deg summed, ·85//100)
    base["pagerank_dups"] = f"""
        WITH pairs AS (SELECT left_id, right_id
                       FROM ({_ngram_jaccard_oracle(10)})),
        e AS (SELECT left_id AS u, right_id AS v FROM pairs
              UNION ALL
              SELECT right_id, left_id FROM pairs),
        deg AS (SELECT u, count(*) AS d FROM e GROUP BY 1),
        p0 AS (SELECT u, 1000000 AS pr FROM deg),
        p1 AS (SELECT e.v AS u,
                      150000 + (85 * SUM(p0.pr // deg.d)) // 100 AS pr
               FROM e JOIN p0 ON p0.u = e.u JOIN deg ON deg.u = e.u
               GROUP BY e.v),
        p2 AS (SELECT e.v AS u,
                      150000 + (85 * SUM(p1.pr // deg.d)) // 100 AS pr
               FROM e JOIN p1 ON p1.u = e.u JOIN deg ON deg.u = e.u
               GROUP BY e.v)
        SELECT u AS doc_id, CAST(pr AS BIGINT) AS pagerank FROM p2
    """
    # source_quality: the gopher oracle grouped by source
    base["source_quality"] = f"""
        WITH g AS (SELECT * FROM ({base["gopher_rules"]})),
             s AS (SELECT doc_id, source FROM documents)
        SELECT s.source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(g.keep) AS BIGINT) AS n_keep,
               CAST(SUM(g.keep) * 10000 // COUNT(*) AS BIGINT) AS keep_bp,
               CAST(SUM(g.n_words) AS BIGINT) AS n_words_total,
               CAST(SUM(g.nonws_chars) AS BIGINT) AS nonws_chars_total
        FROM g JOIN s USING (doc_id)
        GROUP BY s.source
    """
    return base


def _oracle_sql_base() -> dict[str, str]:
    return {
        "ivf_topk": _ivf_topk_oracle(),
        "cluster_stats": _cluster_stats_oracle(),
        "cluster_outliers": _cluster_outliers_oracle(),
        "semantic_keep_list": _semantic_keep_list_oracle(),
        "srp_dedup": _srp_oracle(),
        "minhash_dedup": _minhash_oracle(),
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c,
                   CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_c,
                   CAST(SUM(CAST(FLOOR(l_extendedprice*(1.0 - l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_c,
                   COUNT(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "segment_revenue": """
            SELECT c.c_mktsegment,
                   CAST(SUM(CAST(FLOOR(o.o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c,
                   COUNT(*) AS n_orders
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        """,
        "region_balance": """
            SELECT r.r_name,
                   CAST(SUM(CAST(FLOOR(c.c_acctbal*100 + 0.5) AS BIGINT)) AS BIGINT) AS acctbal_c,
                   COUNT(*) AS n_customers
            FROM customer c
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name
        """,
        "topk_orders": """
            SELECT o_orderkey,
                   CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS totalprice_c
            FROM orders
            ORDER BY totalprice_c DESC, o_orderkey ASC
            LIMIT 10
        """,
        "high_quantity_counts": """
            SELECT l_returnflag, COUNT(*) AS n_items
            FROM lineitem WHERE l_quantity > 45.0
            GROUP BY l_returnflag
        """,
        "events_daily": """
            SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS value_c,
                   COUNT(*) AS n_events
            FROM events GROUP BY user_id, day
        """,
        "sessionize": """
            WITH d AS (
                SELECT user_id,
                       CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                 > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
                FROM events)
            SELECT user_id,
                   CAST(1 + SUM(brk) AS BIGINT) AS n_sessions,
                   COUNT(*) AS n_events
            FROM d GROUP BY user_id
        """,
        "windowed_watermark": """
            WITH t AS (
                SELECT user_id, ts,
                       MAX(ts) OVER (
                           PARTITION BY user_id
                           ORDER BY ts + to_microseconds(CAST(
                               md5_number_lower(CAST(event_id AS VARCHAR))
                               % 3600000000 AS BIGINT)), event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ) AS seen_max
                FROM events)
            SELECT user_id,
                   strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS window_start,
                   CAST(SUM(CASE WHEN seen_max IS NOT NULL
                                  AND seen_max - INTERVAL 10 MINUTE > ts
                            THEN 0 ELSE 1 END) AS BIGINT) AS n_on_time,
                   CAST(SUM(CASE WHEN seen_max IS NOT NULL
                                  AND seen_max - INTERVAL 10 MINUTE > ts
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_late
            FROM t GROUP BY user_id, window_start
        """,
        "rolling_user_value": """
            SELECT event_id,
                   CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts
                       RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS roll_c
            FROM events
        """,
        "asof_prior_event": """
            SELECT p.event_id, v.event_id AS prior_id,
                   date_diff('microsecond', v.ts, p.ts) AS gap_us
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
              ON p.user_id = v.user_id AND p.ts > v.ts
        """,
        "topk_per_customer": """
            SELECT o_custkey, o_orderkey,
                   CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS totalprice_c,
                   CAST(rn AS BIGINT) AS rnk
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY o_custkey
                      ORDER BY FLOOR(o_totalprice*100 + 0.5) DESC, o_orderkey) AS rn
                  FROM orders)
            WHERE rn <= 3
        """,
        "text_stats": f"""
            WITH t AS (
                SELECT doc_id,
                       CAST(length(text) AS BIGINT) AS n_chars_m,
                       CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
                       CAST(length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_tokens_re,
                       CAST(length(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT) AS n_punct,
                       CAST(length(regexp_extract_all(lower(text), '\\b(?:{_STOP_ALT})\\b')) AS BIGINT) AS n_stop
                FROM documents)
            SELECT *, CAST(CASE WHEN n_tokens >= 5 AND n_stop*100 >= n_tokens*2
                                THEN 1 ELSE 0 END AS BIGINT) AS quality_ok
            FROM t
        """,
        "quality_filter": f"""
            WITH t AS (
                SELECT doc_id,
                       CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
                       CAST(length(regexp_extract_all(lower(text), '\\b(?:{_STOP_ALT})\\b')) AS BIGINT) AS n_stop
                FROM documents)
            SELECT doc_id, n_tokens, n_stop
            FROM t WHERE n_tokens >= 5 AND n_stop*100 >= n_tokens*2
        """,
        "word_counts": """
            SELECT word, COUNT(*) AS n FROM (
                SELECT UNNEST(regexp_split_to_array(lower(text), '\\s+')) AS word
                FROM documents) t
            WHERE word <> '' GROUP BY word
        """,
        "fingerprints": """
            SELECT doc_id,
                   md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fingerprint
            FROM documents
        """,
        "exact_dedup": """
            SELECT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fingerprint,
                   MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
            FROM documents GROUP BY fingerprint
        """,
        "ngram_jaccard_dedup": _ngram_jaccard_oracle(10),
        "sample_mix": """
            SELECT doc_id, source FROM documents
            WHERE CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) AS HUGEINT)
                      % 10000
                  < CASE WHEN CAST(substr(source, -1) AS INT) % 2 = 0
                         THEN 7000 ELSE 3000 END
        """,
        "decontaminate": """
            WITH tok AS (
                SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w
                FROM documents),
            sh AS (
                SELECT DISTINCT doc_id, array_to_string(w[i:i+7], ' ') AS s
                FROM tok, UNNEST(generate_series(1, len(w) - 7)) AS g(i)),
            probe AS (SELECT DISTINCT s FROM sh WHERE doc_id % 23 = 0),
            hits AS (
                SELECT doc_id, COUNT(*) AS n_hits FROM sh
                WHERE s IN (SELECT s FROM probe) GROUP BY doc_id)
            SELECT d.doc_id, COALESCE(h.n_hits, 0) AS n_hits,
                   CAST(h.doc_id IS NULL AS BIGINT) AS keep
            FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
        """,
        # range_join_windows: broadcast range join — events contained in
        # 8 two-day windows every 7 days from the corpus' first day
        "range_join_windows": """
            WITH m AS (SELECT date_trunc('day', min(ts)) AS t0 FROM events),
            w AS (SELECT i AS window_id,
                         t0 + i * INTERVAL 7 DAY AS ws,
                         t0 + i * INTERVAL 7 DAY + INTERVAL 2 DAY AS we
                  FROM m, UNNEST(generate_series(0, 7)) AS g(i)),
            j AS (SELECT w.window_id, e.event_type
                  FROM events e JOIN w ON e.ts >= w.ws AND e.ts < w.we)
            SELECT window_id, event_type,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM j GROUP BY 1, 2
        """,
        # unigram_bits: corpus-LM surprisal, integer-exact — bit_length ==
        # length(bin(x)); add-one smoothing over the top-2048 unigram model
        "unigram_bits": """
            WITH tok AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\\s+') AS w
                FROM documents),
            t AS (SELECT doc_id, u.t AS w
                  FROM tok, UNNEST(w) AS u(t) WHERE u.t <> ''),
            cnt AS (SELECT w, count(*) AS c FROM t GROUP BY 1),
            tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cnt),
            model AS (
                SELECT w, c FROM cnt
                QUALIFY row_number() OVER (ORDER BY c DESC, w) <= 2048),
            cost AS (
                SELECT t.doc_id,
                       length(bin(1 + (SELECT n FROM tot)
                                      // (COALESCE(m.c, 0) + 1))) AS b
                FROM t LEFT JOIN model m USING (w)),
            agg AS (SELECT doc_id, count(*) AS n_tok, sum(b) AS bits
                    FROM cost GROUP BY 1)
            SELECT d.doc_id,
                   CAST(COALESCE(a.n_tok, 0) AS BIGINT) AS n_tok,
                   CAST(COALESCE(a.bits, 0) AS BIGINT) AS bits
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        # search_topk: query terms = first 4 tokens of the probe docs;
        # integer tf-idf proxy (the tfidf_topk formula), top-10 per query
        "search_topk": f"""
            WITH tok AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\\s+') AS w
                FROM documents),
            qt AS (
                SELECT DISTINCT doc_id AS query_id, u.t AS term
                FROM tok, UNNEST(w[1:4]) AS u(t)
                WHERE doc_id IN ({', '.join(map(str, _SEARCH_PROBE_IDS))})
                  AND u.t <> ''),
            tf AS (
                SELECT t.doc_id, u.tk AS term, count(*) AS tf
                FROM tok t, UNNEST(t.w) AS u(tk)
                WHERE u.tk IN (SELECT term FROM qt)
                GROUP BY 1, 2),
            dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
            nd AS (SELECT count(*) AS n FROM documents),
            sc AS (
                SELECT q.query_id, f.doc_id,
                       sum(f.tf * (((SELECT n FROM nd) * 10000) // d.df))
                           AS score_bp
                FROM qt q
                JOIN tf f ON f.term = q.term
                JOIN dfx d ON d.term = q.term
                GROUP BY 1, 2)
            SELECT query_id, doc_id,
                   CAST(score_bp AS BIGINT) AS score_bp,
                   CAST(rn AS BIGINT) AS rank
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY query_id
                      ORDER BY score_bp DESC, doc_id) AS rn
                  FROM sc)
            WHERE rn <= 10
        """,
        # cross_near_dedup: best exact-Jaccard 3-gram cross match per doc
        # vs the every-7th-doc ref slice; the stop-shingle df counts BOTH
        # sides (ref rows drawn from the main corpus count twice)
        "cross_near_dedup": """
            WITH tok AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\\s+') AS w
                FROM documents),
            sh AS (
                SELECT DISTINCT doc_id,
                       w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
                FROM tok, UNNEST(generate_series(1, len(w) - 2)) AS g(i)),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
            refsh AS (SELECT doc_id AS ref_id, shingle FROM sh
                      WHERE doc_id % 7 = 0),
            ok_sh AS (
                SELECT shingle FROM (
                    SELECT shingle FROM sh
                    UNION ALL SELECT shingle FROM refsh)
                GROUP BY shingle HAVING COUNT(*) BETWEEN 2 AND 100),
            inter AS (
                SELECT m.doc_id, r.ref_id, COUNT(*) AS inter
                FROM sh m JOIN refsh r ON r.shingle = m.shingle
                WHERE m.shingle IN (SELECT shingle FROM ok_sh)
                  AND m.doc_id <> r.ref_id
                GROUP BY 1, 2),
            sc AS (
                SELECT i.doc_id, i.ref_id, i.inter,
                       nl.n_sh AS n_left, nr.n_sh AS n_right,
                       (i.inter * 1000000)
                           // (nl.n_sh + nr.n_sh - i.inter) AS score_ppm
                FROM inter i
                JOIN sizes nl ON nl.doc_id = i.doc_id
                JOIN sizes nr ON nr.doc_id = i.ref_id
                WHERE i.inter * 100 >= (nl.n_sh + nr.n_sh - i.inter) * 10)
            SELECT doc_id, ref_id, CAST(inter AS BIGINT) AS inter,
                   CAST(n_left AS BIGINT) AS n_left,
                   CAST(n_right AS BIGINT) AS n_right,
                   CAST(score_ppm AS BIGINT) AS score_ppm
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY doc_id
                      ORDER BY score_ppm DESC, ref_id) AS rn
                  FROM sc)
            WHERE rn = 1
        """,
        # cross_dedup: exact-hash anti-join against the 'already ingested'
        # slice (every 7th doc) — keep=1 iff the text hash is NOT in ref
        "cross_dedup": """
            WITH d AS (
                SELECT doc_id, md5_number_lower(text) AS h FROM documents),
            ref AS (SELECT DISTINCT h FROM d WHERE doc_id % 7 = 0)
            SELECT d.doc_id,
                   CAST(r.h IS NULL AS BIGINT) AS keep
            FROM d LEFT JOIN ref r ON r.h = d.h
        """,
        "bloom_dedup": """
            WITH seeds AS (SELECT unnest(range(0, 4)) AS s),
            rp AS (
                SELECT DISTINCT
                       CAST(md5_number_lower(r.text || '#' || s) % 1048576
                            AS BIGINT) AS pos
                FROM documents r CROSS JOIN seeds
                WHERE r.doc_id % 7 = 0 AND r.text IS NOT NULL),
            dp AS (
                SELECT d.doc_id,
                       CAST(md5_number_lower(d.text || '#' || s) % 1048576
                            AS BIGINT) AS pos
                FROM documents d CROSS JOIN seeds
                WHERE d.text IS NOT NULL),
            hits AS (
                SELECT doc_id,
                       SUM(CASE WHEN pos IN (SELECT pos FROM rp)
                           THEN 1 ELSE 0 END) AS nhit,
                       COUNT(*) AS ntot
                FROM dp GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(CASE WHEN h.nhit = h.ntot THEN 0 ELSE 1 END
                        AS BIGINT) AS keep
            FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
        """,
        "shuffle_shards": """
            WITH h AS (
              SELECT doc_id,
                     CAST(md5_number_lower(CAST(doc_id AS VARCHAR))
                          AS HUGEINT) AS hv
              FROM documents)
            SELECT doc_id, CAST(hv % 16 AS BIGINT) AS shard,
                   CAST(row_number() OVER (PARTITION BY hv % 16
                                           ORDER BY hv, doc_id) - 1
                        AS BIGINT) AS pos
            FROM h
        """,
        "redact_pii": _PII_ORACLE,
        "pack_sequences": """
            WITH RECURSIVE d AS (
              SELECT doc_id, doc_id // 100 AS shard,
                     CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS tok,
                     row_number() OVER (PARTITION BY doc_id // 100
                                        ORDER BY doc_id) AS rn
              FROM documents),
            p AS (
              SELECT doc_id, shard, rn, tok,
                     CAST(0 AS BIGINT) AS bin, tok AS fill
              FROM d WHERE rn = 1
              UNION ALL
              SELECT d.doc_id, d.shard, d.rn, d.tok,
                     CASE WHEN p.fill + d.tok <= 120 THEN p.bin
                          ELSE p.bin + 1 END,
                     CASE WHEN p.fill + d.tok <= 120 THEN p.fill + d.tok
                          ELSE d.tok END
              FROM p JOIN d ON d.shard = p.shard AND d.rn = p.rn + 1)
            SELECT doc_id, CAST(shard AS BIGINT) AS shard, bin, fill FROM p
        """,
        "length_quantiles": """
            WITH t AS (SELECT CAST(len(regexp_extract_all(text, '\\S+'))
                              AS BIGINT) v FROM documents),
            c AS (SELECT v, COUNT(*) c FROM t GROUP BY v),
            w AS (SELECT v, SUM(c) OVER (ORDER BY v) cum,
                         (SELECT COUNT(*) FROM t) n FROM c)
            SELECT CAST(q.q_bp AS BIGINT) AS q_bp,
                   CAST(MIN(w.v) AS BIGINT) AS value
            FROM (VALUES (2500),(5000),(7500),(9000),(9900)) AS q(q_bp)
            JOIN w ON w.cum * 10000 >= q.q_bp * w.n
            GROUP BY q.q_bp
        """,
        "pmi_bigrams": """
            WITH tok AS (SELECT doc_id,
                                regexp_extract_all(lower(text), '\\S+') AS t
                         FROM documents),
            w AS (SELECT unnest(t) AS word FROM tok),
            wc AS (SELECT word, COUNT(*) AS c FROM w
                   GROUP BY word HAVING COUNT(*) >= 5),
            pairs AS (SELECT t[i] AS w1, t[i+1] AS w2
                      FROM tok, unnest(range(1, len(t))) AS u(i)),
            bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_xy
                   FROM pairs GROUP BY w1, w2 HAVING COUNT(*) >= 5)
            SELECT b.w1, b.w2, b.c_xy,
                   CAST(x.c AS BIGINT) AS c_x, CAST(y.c AS BIGINT) AS c_y,
                   CAST((CAST(b.c_xy AS HUGEINT) * b.c_xy * 1000000)
                        // (x.c * y.c) AS BIGINT) AS score_ppm
            FROM bc b JOIN wc x ON x.word = b.w1 JOIN wc y ON y.word = b.w2
            ORDER BY score_ppm DESC, c_xy DESC, w1, w2 LIMIT 20
        """,
        # tfidf_topk: exact-integer tf·idf proxy, row_number tiebreak
        # (score DESC, token ASC) == the Ray side's mergesort + head(k)
        "tfidf_topk": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(list_filter(
                         string_split_regex(lower(text), '\s+'),
                         x -> x <> '')) AS token
              FROM documents),
            tf AS (SELECT doc_id, token, COUNT(*) AS tf
                   FROM toks GROUP BY doc_id, token),
            dfq AS (SELECT token, COUNT(DISTINCT doc_id) AS df
                    FROM toks GROUP BY token),
            n AS (SELECT COUNT(*) AS nd FROM documents),
            s AS (SELECT t.doc_id, t.token, t.tf, d.df,
                         t.tf * ((n.nd * 10000) // d.df) AS score_bp
                  FROM tf t JOIN dfq d USING (token) CROSS JOIN n
                  WHERE d.df >= 2)
            SELECT doc_id, token, CAST(tf AS BIGINT) AS tf,
                   CAST(df AS BIGINT) AS df,
                   CAST(score_bp AS BIGINT) AS score_bp
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY doc_id
                      ORDER BY score_bp DESC, token) AS rn
                  FROM s)
            WHERE rn <= 3
        """,
        # inverted_index: cap=32 postings by smallest doc_id; df is the
        # TRUE count (a capped token is visible as df > cap, never silent)
        "inverted_index": r"""
            WITH toks AS (
              SELECT DISTINCT doc_id,
                     unnest(list_filter(
                         string_split_regex(lower(text), '\s+'),
                         x -> x <> '')) AS token
              FROM documents),
            d AS (SELECT token, COUNT(*) AS df FROM toks GROUP BY token),
            r AS (SELECT token, doc_id, row_number() OVER (
                      PARTITION BY token ORDER BY doc_id) AS rnk
                  FROM toks)
            SELECT r.token, CAST(d.df AS BIGINT) AS df,
                   CAST(r.rnk - 1 AS BIGINT) AS pos, r.doc_id
            FROM r JOIN d USING (token)
            WHERE r.rnk <= 32 AND d.df >= 2
        """,
        # repetition_stats: Gopher-style intra-doc repetition signals in
        # exact basis points; max_run via gaps-and-islands
        "repetition_stats": r"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 x -> x <> '') AS toks
              FROM documents),
            d AS (SELECT doc_id, toks, len(toks) AS n
                  FROM t WHERE len(toks) > 0),
            tv AS (SELECT doc_id, unnest(range(0, n)) AS i, toks, n
                   FROM d),
            w AS (SELECT doc_id, i, toks[i + 1] AS w, n FROM tv),
            dist AS (SELECT doc_id, COUNT(DISTINCT w) AS nd
                     FROM w GROUP BY doc_id),
            bgc AS (SELECT doc_id, toks[i+1] || chr(31) || toks[i+2] AS b,
                           COUNT(*) AS c
                    FROM tv WHERE i < n - 1 GROUP BY 1, 2),
            dup AS (SELECT doc_id,
                           SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dupc,
                           MAX(c) AS topc
                    FROM bgc GROUP BY doc_id),
            runs AS (SELECT doc_id, MAX(cnt) AS max_run FROM (
                       SELECT doc_id, w, COUNT(*) AS cnt FROM (
                         SELECT doc_id, w,
                                i - row_number() OVER (
                                    PARTITION BY doc_id, w
                                    ORDER BY i) AS grp
                         FROM w)
                       GROUP BY doc_id, w, grp)
                     GROUP BY doc_id)
            SELECT d.doc_id, CAST(d.n AS BIGINT) AS n_tokens,
                   CAST(dist.nd * 10000 // d.n AS BIGINT)
                       AS distinct_ratio_bp,
                   CAST(COALESCE(dup.dupc, 0) * 10000
                        // GREATEST(d.n - 1, 1) AS BIGINT)
                       AS dup_bigram_frac_bp,
                   CAST(COALESCE(dup.topc, 0) * 10000
                        // GREATEST(d.n - 1, 1) AS BIGINT)
                       AS top_bigram_frac_bp,
                   CAST(runs.max_run AS BIGINT) AS max_run
            FROM d JOIN dist USING (doc_id)
                 LEFT JOIN dup USING (doc_id)
                 JOIN runs USING (doc_id)
        """,
        # chunk_docs: window=16 stride=8; ord ranges over ceil(n/stride)
        # window starts, the last windows may be short (least(...))
        "chunk_docs": r"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 x -> x <> '') AS toks
              FROM documents),
            d AS (SELECT doc_id, toks, len(toks) AS n
                  FROM t WHERE len(toks) > 0),
            s AS (SELECT doc_id, toks, n,
                         unnest(range(0, (n + 7) // 8)) AS ord
                  FROM d)
            SELECT doc_id, CAST(ord AS BIGINT) AS chunk_id,
                   array_to_string(
                       list_slice(toks, ord*8 + 1, ord*8 + 16), ' ')
                       AS chunk_text,
                   CAST(least(16, n - ord*8) AS BIGINT) AS n_tokens
            FROM s
        """,
        # segment_dedup: window=8 non-overlapping; keep = first global
        # occurrence per md5-low64 segment hash, ordered by (doc_id, ord);
        # boilerplate planting is the same doc_id rule as _inject_boilerplate
        "segment_dedup": rf"""
            WITH docs2 AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 5 = 0
                          THEN '{_BOILER_HEADER} ' || text ELSE text END
                     || CASE WHEN doc_id % 3 = 0
                             THEN ' {_BOILER_FOOTER}' ELSE '' END AS text
              FROM documents),
            t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 x -> x <> '') AS toks
              FROM docs2),
            d AS (SELECT doc_id, toks, len(toks) AS n
                  FROM t WHERE len(toks) > 0),
            s AS (SELECT doc_id, toks,
                         unnest(range(0, (n + 7) // 8)) AS ord
                  FROM d),
            seg AS (SELECT doc_id, ord,
                           array_to_string(
                               list_slice(toks, ord*8 + 1, ord*8 + 8), ' ')
                               AS seg
                    FROM s),
            k AS (SELECT doc_id, ord, seg,
                         row_number() OVER (
                             PARTITION BY md5_number_lower(seg)
                             ORDER BY doc_id, ord) = 1 AS keep
                  FROM seg)
            SELECT doc_id,
                   COALESCE(string_agg(seg, ' ' ORDER BY ord)
                                FILTER (WHERE keep), '') AS clean_text,
                   CAST(COUNT(*) AS BIGINT) AS n_segments,
                   CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_kept
            FROM k GROUP BY doc_id
        """,
        # substring_dedup: a k-gram (k=8) position is removed iff its hash
        # group has >=2 members and it is not the global first (doc_id,
        # pos); a token drops iff covered by any removed span (interval
        # union = the EXISTS range probe)
        "substring_dedup": rf"""
            WITH docs2 AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 5 = 0
                          THEN '{_BOILER_HEADER} ' || text ELSE text END
                     || CASE WHEN doc_id % 3 = 0
                             THEN ' {_BOILER_FOOTER}' ELSE '' END AS text
              FROM documents),
            t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 x -> x <> '') AS toks
              FROM docs2),
            d AS (SELECT doc_id, toks, len(toks) AS n
                  FROM t WHERE len(toks) > 0),
            p AS (SELECT doc_id, toks,
                         unnest(range(0, n - 7)) AS pos
                  FROM d WHERE n >= 8),
            g AS (SELECT doc_id, pos,
                         md5_number_lower(array_to_string(
                             list_slice(toks, pos + 1, pos + 8), ' ')) AS h
                  FROM p),
            dup AS (SELECT doc_id, pos FROM (
                      SELECT doc_id, pos,
                             COUNT(*) OVER (PARTITION BY h) AS c,
                             row_number() OVER (
                                 PARTITION BY h
                                 ORDER BY doc_id, pos) AS rn
                      FROM g)
                    WHERE c > 1 AND rn > 1),
            tok AS (SELECT doc_id, unnest(range(0, n)) AS ti, toks
                    FROM d),
            mark AS (SELECT tp.doc_id, tp.ti, tp.toks[tp.ti + 1] AS tok,
                            EXISTS(SELECT 1 FROM dup u
                                   WHERE u.doc_id = tp.doc_id
                                     AND tp.ti BETWEEN u.pos
                                                   AND u.pos + 7)
                                AS removed
                     FROM tok tp)
            SELECT doc_id,
                   COALESCE(string_agg(tok, ' ' ORDER BY ti)
                                FILTER (WHERE NOT removed), '')
                       AS clean_text,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(SUM(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_removed
            FROM mark GROUP BY doc_id
        """,
        "dedup_keep_list": """
            WITH RECURSIVE tok AS (
                SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w
                FROM documents),
            sh AS (
                SELECT DISTINCT doc_id,
                       w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
                FROM tok, UNNEST(generate_series(1, len(w) - 2)) AS g(i)),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
            ok_sh AS (
                SELECT shingle FROM sh GROUP BY shingle
                HAVING COUNT(*) BETWEEN 2 AND 100),
            cand AS (
                SELECT a.doc_id AS left_id, b.doc_id AS right_id, COUNT(*) AS inter
                FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                WHERE a.shingle IN (SELECT shingle FROM ok_sh)
                GROUP BY a.doc_id, b.doc_id),
            dup AS (
                SELECT c.left_id, c.right_id FROM cand c
                JOIN sizes sa ON sa.doc_id = c.left_id
                JOIN sizes sb ON sb.doc_id = c.right_id
                WHERE c.inter*100 >= (sa.n_sh + sb.n_sh - c.inter)*10),
            edges AS (
                SELECT left_id AS a, right_id AS b FROM dup
                UNION ALL SELECT right_id, left_id FROM dup),
            reach(node, lab) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT e.a, r.lab FROM edges e JOIN reach r ON r.node = e.b)
            SELECT node AS doc_id, MIN(lab) AS cluster_id,
                   CAST(CASE WHEN node = MIN(lab) THEN 1 ELSE 0 END AS BIGINT)
                       AS keep
            FROM reach GROUP BY node
        """,
        # split_by_cluster: same recursive-CTE closure as dedup_keep_list;
        # the split is a pure md5 function of the cluster label
        "split_by_cluster": """
            WITH RECURSIVE tok AS (
                SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w
                FROM documents),
            sh AS (
                SELECT DISTINCT doc_id,
                       w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
                FROM tok, UNNEST(generate_series(1, len(w) - 2)) AS g(i)),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
            ok_sh AS (
                SELECT shingle FROM sh GROUP BY shingle
                HAVING COUNT(*) BETWEEN 2 AND 100),
            cand AS (
                SELECT a.doc_id AS left_id, b.doc_id AS right_id, COUNT(*) AS inter
                FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                WHERE a.shingle IN (SELECT shingle FROM ok_sh)
                GROUP BY a.doc_id, b.doc_id),
            dup AS (
                SELECT c.left_id, c.right_id FROM cand c
                JOIN sizes sa ON sa.doc_id = c.left_id
                JOIN sizes sb ON sb.doc_id = c.right_id
                WHERE c.inter*100 >= (sa.n_sh + sb.n_sh - c.inter)*10),
            edges AS (
                SELECT left_id AS a, right_id AS b FROM dup
                UNION ALL SELECT right_id, left_id FROM dup),
            reach(node, lab) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT e.a, r.lab FROM edges e JOIN reach r ON r.node = e.b)
            SELECT node AS doc_id, MIN(lab) AS cluster_id,
                   CAST(CAST(md5_number_lower(CAST(MIN(lab) AS VARCHAR))
                                 AS HUGEINT) % 10000 < 9000 AS BIGINT)
                       AS is_train
            FROM reach GROUP BY node
        """,
        "media_features": """
            SELECT printf('d%09d', doc_id) AS doc_id,
                   CAST(1 AS INTEGER) AS span_idx,
                   'image' AS kind,
                   'media://' || source || '/' || printf('d%09d', doc_id) AS media_ref,
                   CAST(64 AS INTEGER) AS width,
                   CAST(64 AS INTEGER) AS height,
                   CAST(1 AS INTEGER) AS n_frames
            FROM documents
        """,
        "lang_id": r"""
            WITH t AS (SELECT doc_id, lower(text) AS t FROM documents),
            w AS (
                SELECT doc_id,
                       list_distinct(regexp_extract_all(t, '[a-zà-ÿ]+')) AS words,
                       CASE WHEN length(t) = 0 THEN 0.0
                            ELSE CAST(length(regexp_replace(
                                     t, '[^\x{4e00}-\x{9fff}]', '', 'g'))
                                 AS DOUBLE) / length(t) END AS cjk
                FROM t),
            s AS (
                SELECT doc_id, cjk,
                       len(list_intersect(words, ['the','and','of','is','with','for'])) AS s_en,
                       len(list_intersect(words, ['der','die','und','das','nicht','ist'])) AS s_de,
                       len(list_intersect(words, ['le','la','les','et','est','une'])) AS s_fr,
                       len(list_intersect(words, ['el','los','las','es','una','que'])) AS s_es
                FROM w)
            SELECT doc_id,
                   CASE WHEN cjk > 0.2 THEN 'zh'
                        WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'unknown'
                        WHEN s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr'
                        WHEN s_es >= s_en AND s_es >= s_de THEN 'es'
                        WHEN s_en >= s_de THEN 'en'
                        ELSE 'de' END AS lang_pred
            FROM s
        """,
        "simhash_dedup": r"""
            WITH t AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\s+'),
                                   x -> x <> '') AS toks
                FROM documents),
            tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
            th AS (SELECT doc_id, md5_number_lower(tk) AS h FROM tok),
            bits AS (
                SELECT doc_id, b.b AS bit,
                       SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
                FROM th CROSS JOIN (SELECT unnest(range(0, 64)) AS b) b
                GROUP BY doc_id, b.b),
            sb AS (SELECT doc_id, bit,
                          CASE WHEN v > 0 THEN 1 ELSE 0 END AS s FROM bits),
            ham AS (
                SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                       SUM(CASE WHEN a.s <> b.s THEN 1 ELSE 0 END) AS hamming
                FROM sb a JOIN sb b ON a.bit = b.bit AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id)
            SELECT left_id, right_id, CAST(hamming AS BIGINT) AS hamming
            FROM ham WHERE hamming <= 3
        """,
        "winnow_fingerprint": r"""
            WITH t AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\s+'),
                                   x -> x <> '') AS toks
                FROM documents),
            h AS (
                SELECT doc_id,
                       CASE WHEN len(toks) < 5 THEN CAST([] AS BIGINT[])
                       ELSE [CAST(md5_number_lower(
                                      array_to_string(toks[i:i+4], ' '))
                                  % 9223372036854775808 AS BIGINT)
                             FOR i IN range(1, len(toks) - 3)] END AS hs
                FROM t),
            m AS (
                SELECT doc_id,
                       CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[])
                       ELSE [list_min(hs[i:i+3])
                             FOR i IN range(1, greatest(1, len(hs) - 3) + 1)]
                       END AS mins
                FROM h),
            fp AS (
                SELECT doc_id,
                       [mins[i] FOR i IN range(1, len(mins) + 1)
                        IF i = 1 OR mins[i] <> mins[i-1]] AS fps
                FROM m)
            SELECT doc_id, CAST(u.i AS BIGINT) AS pos, fps[u.i + 1] AS fp_hash
            FROM fp, unnest(range(0, len(fps))) AS u(i)
        """,
        "embedding_dups": """
            SELECT a.vec_id AS left_id, b.vec_id AS right_id
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.35
        """,
        "ann_threshold": """
            SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id
            FROM embeddings q JOIN embeddings d ON d.vec_id <> q.vec_id
            WHERE q.vec_id IN (0,1,2,3,4)
              AND list_cosine_similarity(q.embedding, d.embedding) >= 0.25
        """,
        "ann_topk": """
            WITH s AS (
                SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
                       list_cosine_similarity(q.embedding, d.embedding) AS sim
                FROM embeddings q JOIN embeddings d ON d.vec_id <> q.vec_id
                WHERE q.vec_id IN (0,1,2,3,4))
            SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
                  FROM s)
            WHERE rn <= 10
        """,
        # classifier_select: hashed-linear quality classifier (weight law
        # w[i] = (i * 2654435761) % 1001 - 500 over md5-low64 % 65536 token
        # features) + exact binned-percentile cutoff (keep_bp=3000 ->
        # drop_bp=7000; bin = (score + 2^40) // 64 is non-negative, so //
        # floors identically in numpy and DuckDB).  UBIGINT care: subtract
        # the 500 AFTER casting to BIGINT or low weights underflow.
        "classifier_select": r"""
            WITH tok AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS w
                FROM documents),
            t AS (SELECT doc_id, u.t AS w
                  FROM tok, UNNEST(w) AS u(t) WHERE u.t <> ''),
            sc AS (
                SELECT doc_id,
                       sum(CAST(md5_number_lower(w) % 65536
                                * 2654435761 % 1001 AS BIGINT) - 500) AS s
                FROM t GROUP BY 1),
            scored AS (
                SELECT d.doc_id, CAST(COALESCE(sc.s, 0) AS BIGINT) AS score
                FROM documents d LEFT JOIN sc USING (doc_id)),
            bins AS (
                SELECT doc_id, score,
                       (score + (CAST(1 AS BIGINT) << 40)) // 64 AS b
                FROM scored),
            hist AS (SELECT b, count(*) AS c FROM bins GROUP BY 1),
            cum AS (SELECT b, sum(c) OVER (ORDER BY b) AS cc FROM hist),
            cut AS (SELECT min(b) AS cut FROM cum
                    WHERE cc * 10000 >=
                          7000 * (SELECT count(*) FROM documents))
            SELECT doc_id, score,
                   CAST(CASE WHEN b > (SELECT cut FROM cut)
                        THEN 1 ELSE 0 END AS BIGINT) AS keep
            FROM bins
        """,
        # hll_registers: grouped HyperLogLog — bucket = md5low64 % 4096,
        # rho = 53 - bit_length(h // 4096) (leading zeros of the 52
        # remaining bits, +1), rho(0) = 53.  bit_length == length(bin(x))
        # for x > 0 (the unigram_bits identity).
        "hll_registers": r"""
            WITH tok AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS w
                FROM documents),
            t AS (SELECT doc_id, u.t AS w
                  FROM tok, UNNEST(w) AS u(t) WHERE u.t <> ''),
            h AS (SELECT d.lang, md5_number_lower(t.w) AS hv
                  FROM t JOIN documents d USING (doc_id)),
            r AS (SELECT lang, CAST(hv % 4096 AS BIGINT) AS bucket,
                         CASE WHEN hv // 4096 = 0 THEN 53
                              ELSE 53 - length(bin(CAST(hv // 4096
                                                         AS BIGINT))) END
                             AS rho
                  FROM h)
            SELECT lang, bucket, CAST(max(rho) AS BIGINT) AS rho
            FROM r GROUP BY 1, 2
        """,
        # count-min: col_j = (md5low64 >> 16j) % 1024 — four disjoint
        # 16-bit windows, exact integer division on UBIGINT both sides.
        "countmin_sketch": r"""
            WITH sl(j, dv) AS (VALUES (0, 1), (1, 65536),
                               (2, 4294967296), (3, 281474976710656)),
            tok AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS w
                FROM documents),
            t AS (SELECT doc_id, u.t AS w
                  FROM tok, UNNEST(w) AS u(t) WHERE u.t <> ''),
            cnt AS (SELECT w, count(*) AS c FROM t GROUP BY 1),
            cell AS (SELECT s.j AS r,
                            CAST(md5_number_lower(cnt.w)
                                 // CAST(s.dv AS UBIGINT) % 1024
                                 AS BIGINT) AS col,
                            cnt.c AS c
                     FROM cnt CROSS JOIN sl s)
            SELECT CAST(r AS BIGINT) AS "row", col,
                   CAST(sum(c) AS BIGINT) AS "count"
            FROM cell GROUP BY 1, 2
        """,
        # countmin_topk: est(token) = min over the 4 rows of the cell the
        # token hashes to; top-20 with the (est DESC, token ASC) tie-break
        # shared by the Ray plan.
        "countmin_topk": r"""
            WITH sl(j, dv) AS (VALUES (0, 1), (1, 65536),
                               (2, 4294967296), (3, 281474976710656)),
            tok AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS w
                FROM documents),
            t AS (SELECT doc_id, u.t AS w
                  FROM tok, UNNEST(w) AS u(t) WHERE u.t <> ''),
            cnt AS (SELECT w, count(*) AS c FROM t GROUP BY 1),
            cell AS (SELECT s.j AS r,
                            CAST(md5_number_lower(cnt.w)
                                 // CAST(s.dv AS UBIGINT) % 1024
                                 AS BIGINT) AS col,
                            cnt.c AS c
                     FROM cnt CROSS JOIN sl s),
            sk AS (SELECT r, col, sum(c) AS n FROM cell GROUP BY 1, 2),
            est AS (SELECT cnt.w AS token, min(sk.n) AS est
                    FROM cnt CROSS JOIN sl s
                    JOIN sk ON sk.r = s.j
                           AND sk.col = CAST(md5_number_lower(cnt.w)
                                             // CAST(s.dv AS UBIGINT)
                                             % 1024 AS BIGINT)
                    GROUP BY 1)
            SELECT token, CAST(est AS BIGINT) AS est
            FROM est ORDER BY est DESC, token LIMIT 20
        """,
        # interleaved_spans: the adapter's span law (docs_source._wrap_batch)
        # rebuilt independently — text span at offset 0, image span at
        # offset len(text) with media://{source}/d{doc_id:09d}.  Python len
        # == DuckDB length (both count codepoints).
        "interleaved_spans": """
            WITH d AS (
                SELECT 'd' || lpad(CAST(doc_id AS VARCHAR), 9, '0') AS did,
                       COALESCE(text, '') AS t, source
                FROM documents)
            SELECT did AS doc_id, CAST(0 AS BIGINT) AS span_idx,
                   'text' AS kind, CAST(length(t) AS BIGINT) AS text_len,
                   '' AS media_ref, CAST(0 AS BIGINT) AS "offset"
            FROM d
            UNION ALL
            SELECT did, CAST(1 AS BIGINT), 'image', CAST(0 AS BIGINT),
                   'media://' || source || '/' || did,
                   CAST(length(t) AS BIGINT)
            FROM d
        """,
        # line_filter: C4-style line predicates rebuilt independently —
        # string_split on chr(10) == Arrow split_pattern('\n');
        # length(regexp_extract_all(line,'[^ ]+')) == count_substring_regex
        # (both RE2, non-overlapping maximal runs); RE2 '$' is end-of-text
        # on both sides; length() counts codepoints == pc.utf8_length.
        "line_filter": """
            WITH d AS (
                SELECT doc_id, COALESCE(text, '') AS t FROM documents),
            l AS (
                SELECT doc_id, unnest(string_split(t, chr(10))) AS line
                FROM d),
            f AS (
                SELECT doc_id,
                       CAST(length(regexp_extract_all(line, '[^ ]+'))
                            AS BIGINT) AS nw,
                       regexp_matches(line, '[.!?"]$') AS term,
                       (contains(line, 'javascript')
                        OR contains(line, '{')) AS bad,
                       CAST(length(line) AS BIGINT) AS len
                FROM l)
            SELECT doc_id,
                   COUNT(*) AS n_lines,
                   CAST(SUM(CASE WHEN nw >= 3 AND term AND NOT bad
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                   CAST(SUM(CASE WHEN nw >= 3 AND term AND NOT bad
                            THEN len ELSE 0 END) AS BIGINT) AS kept_chars,
                   CAST(SUM(CASE WHEN nw >= 3 AND term AND NOT bad
                                 THEN 1 ELSE 0 END) >= 1
                        AND SUM(CASE WHEN nw >= 3 AND term AND NOT bad
                                     THEN 1 ELSE 0 END) * 100
                            >= COUNT(*) * 50 AS BIGINT) AS keep
            FROM f GROUP BY doc_id
        """,
        # quantized_topk: the int8-grid quantization law floor(x*127+0.5)
        # is exact in float64 on both sides (float32 -> double widening is
        # exact, then identical IEEE ops); the dot product of codes stays
        # far below 2^53 so list_dot_product's double accumulation is
        # exact too.  Score itself is hash-compared (int64), not just rank.
        "quantized_topk": """
            WITH e AS (
                SELECT vec_id, list_transform(embedding,
                       x -> floor(CAST(x AS DOUBLE) * 127 + 0.5)) AS q
                FROM embeddings),
            s AS (
                SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                       CAST(list_dot_product(a.q, b.q) AS BIGINT) AS dot
                FROM e a JOIN e b ON b.vec_id <> a.vec_id
                WHERE a.vec_id IN (0, 1, 2, 3, 4))
            SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank, dot
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY query_id
                      ORDER BY dot DESC, neighbor_id) AS rn
                  FROM s)
            WHERE rn <= 10
        """,
        # gopher_rules: every predicate is the same RE2 pattern evaluated
        # by the same engine (DuckDB embeds RE2 like pyarrow — the greedy
        # \S*[A-Za-z]\S* alpha-word count agrees by construction);
        # nonws_chars = codepoints - whitespace codepoints = exact sum of
        # word lengths; thresholds are integer cross-multiplications.
        "gopher_rules": """
            WITH d AS (
                SELECT doc_id, COALESCE(text, '') AS t FROM documents),
            w AS (
                SELECT doc_id, t,
                       CAST(length(regexp_extract_all(t, '\\S+'))
                            AS BIGINT) AS n_words,
                       CAST(length(t)
                            - length(regexp_extract_all(t, '\\s'))
                            AS BIGINT) AS nonws_chars,
                       CAST(length(regexp_extract_all(t, '#|\\.\\.\\.'))
                            AS BIGINT) AS n_sym,
                       CAST(length(regexp_extract_all(
                                t, '\\S*[A-Za-z]\\S*'))
                            AS BIGINT) AS n_alpha_words,
                       CAST((CASE WHEN regexp_matches(lower(t), '\\bthe\\b')
                                  THEN 1 ELSE 0 END)
                          + (CASE WHEN regexp_matches(lower(t), '\\bbe\\b')
                                  THEN 1 ELSE 0 END)
                          + (CASE WHEN regexp_matches(lower(t), '\\bto\\b')
                                  THEN 1 ELSE 0 END)
                          + (CASE WHEN regexp_matches(lower(t), '\\bof\\b')
                                  THEN 1 ELSE 0 END)
                          + (CASE WHEN regexp_matches(lower(t), '\\band\\b')
                                  THEN 1 ELSE 0 END)
                          + (CASE WHEN regexp_matches(lower(t), '\\bthat\\b')
                                  THEN 1 ELSE 0 END)
                          + (CASE WHEN regexp_matches(lower(t), '\\bhave\\b')
                                  THEN 1 ELSE 0 END)
                          + (CASE WHEN regexp_matches(lower(t), '\\bwith\\b')
                                  THEN 1 ELSE 0 END) AS BIGINT)
                           AS n_stop_kinds
                FROM d),
            l AS (
                SELECT doc_id,
                       COUNT(*) AS n_lines,
                       CAST(SUM(CASE WHEN regexp_matches(line, '^[-•*]')
                                THEN 1 ELSE 0 END) AS BIGINT) AS n_bullet,
                       CAST(SUM(CASE WHEN regexp_matches(
                                         line, '(\\.\\.\\.|…)$')
                                THEN 1 ELSE 0 END) AS BIGINT) AS n_ellipsis
                FROM (SELECT doc_id,
                             unnest(string_split(t, chr(10))) AS line
                      FROM d)
                GROUP BY doc_id)
            SELECT w.doc_id, n_words, nonws_chars, n_sym, n_alpha_words,
                   n_stop_kinds, n_lines, n_bullet, n_ellipsis,
                   CAST(n_words >= 50 AND n_words <= 100000
                        AND 3 * n_words <= nonws_chars
                        AND nonws_chars <= 10 * n_words
                        AND n_sym * 10 <= n_words
                        AND n_bullet * 10 <= n_lines * 9
                        AND n_ellipsis * 10 <= n_lines * 3
                        AND n_alpha_words * 10 >= n_words * 8
                        AND n_stop_kinds >= 2 AS BIGINT) AS keep
            FROM w JOIN l ON w.doc_id = l.doc_id
        """,
        # gopher_repetition: chars(n-gram) = length(w1⊕chr(31)⊕…⊕wn) −
        # (n−1); top score = max_count · max-chars-at-max-count (ties broken
        # on chars — deterministic both sides); dup-5-gram chars count every
        # instance, capped at total token chars (documented divergence from
        # the paper's count-once interval union).
        "gopher_repetition": """
            WITH d AS (
                SELECT doc_id, COALESCE(text, '') AS t FROM documents),
            ls AS (SELECT doc_id, unnest(string_split(t, chr(10))) AS v
                   FROM d),
            lg AS (SELECT doc_id, v, COUNT(*) AS c, length(v) AS l
                   FROM ls GROUP BY 1, 2),
            lstat AS (
                SELECT doc_id,
                       CAST(SUM(c) AS BIGINT) AS n_lines,
                       CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END)
                            AS BIGINT) AS dupl,
                       CAST(SUM(CASE WHEN c > 1 THEN c * l ELSE 0 END)
                            AS BIGINT) AS duplc,
                       CAST(SUM(c * l) AS BIGINT) AS totlc
                FROM lg GROUP BY doc_id),
            ps AS (SELECT doc_id,
                          unnest(string_split(t, chr(10) || chr(10))) AS v
                   FROM d),
            pg AS (SELECT doc_id, v, COUNT(*) AS c, length(v) AS l
                   FROM ps GROUP BY 1, 2),
            pstat AS (
                SELECT doc_id,
                       CAST(SUM(c) AS BIGINT) AS n_paras,
                       CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END)
                            AS BIGINT) AS dupp,
                       CAST(SUM(CASE WHEN c > 1 THEN c * l ELSE 0 END)
                            AS BIGINT) AS duppc,
                       CAST(SUM(c * l) AS BIGINT) AS totpc
                FROM pg GROUP BY doc_id),
            tk AS (SELECT doc_id,
                          list_filter(string_split_regex(t, '\\s+'),
                                      x -> x <> '') AS toks
                   FROM d),
            tt AS (SELECT doc_id, toks, len(toks) AS n FROM tk),
            tv AS (SELECT doc_id, unnest(range(0, n)) AS i, toks, n
                   FROM tt WHERE n > 0),
            tstat AS (SELECT doc_id,
                             CAST(SUM(length(toks[i + 1])) AS BIGINT) AS tot
                      FROM tv GROUP BY doc_id),
            g2 AS (SELECT doc_id,
                          toks[i+1] || chr(31) || toks[i+2] AS k,
                          COUNT(*) AS c
                   FROM tv WHERE i < n - 1 GROUP BY 1, 2),
            s2 AS (SELECT doc_id,
                          CAST(MAX(c) * MAX(CASE WHEN c = mc
                               THEN length(k) - 1 END) AS BIGINT) AS score
                   FROM (SELECT doc_id, k, c,
                                MAX(c) OVER (PARTITION BY doc_id) AS mc
                         FROM g2)
                   WHERE c = mc GROUP BY doc_id),
            g3 AS (SELECT doc_id,
                          toks[i+1] || chr(31) || toks[i+2] || chr(31)
                              || toks[i+3] AS k,
                          COUNT(*) AS c
                   FROM tv WHERE i < n - 2 GROUP BY 1, 2),
            s3 AS (SELECT doc_id,
                          CAST(MAX(c) * MAX(CASE WHEN c = mc
                               THEN length(k) - 2 END) AS BIGINT) AS score
                   FROM (SELECT doc_id, k, c,
                                MAX(c) OVER (PARTITION BY doc_id) AS mc
                         FROM g3)
                   WHERE c = mc GROUP BY doc_id),
            g4 AS (SELECT doc_id,
                          toks[i+1] || chr(31) || toks[i+2] || chr(31)
                              || toks[i+3] || chr(31) || toks[i+4] AS k,
                          COUNT(*) AS c
                   FROM tv WHERE i < n - 3 GROUP BY 1, 2),
            s4 AS (SELECT doc_id,
                          CAST(MAX(c) * MAX(CASE WHEN c = mc
                               THEN length(k) - 3 END) AS BIGINT) AS score
                   FROM (SELECT doc_id, k, c,
                                MAX(c) OVER (PARTITION BY doc_id) AS mc
                         FROM g4)
                   WHERE c = mc GROUP BY doc_id),
            g5 AS (SELECT doc_id,
                          toks[i+1] || chr(31) || toks[i+2] || chr(31)
                              || toks[i+3] || chr(31) || toks[i+4]
                              || chr(31) || toks[i+5] AS k,
                          COUNT(*) AS c
                   FROM tv WHERE i < n - 4 GROUP BY 1, 2),
            d5 AS (SELECT doc_id,
                          CAST(SUM(CASE WHEN c > 1
                               THEN c * (length(k) - 4) ELSE 0 END)
                               AS BIGINT) AS dupc
                   FROM g5 GROUP BY doc_id)
            SELECT
                l.doc_id,
                l.n_lines,
                l.dupl * 10000 // l.n_lines AS dup_line_frac_bp,
                l.duplc * 10000 // GREATEST(l.totlc, 1)
                    AS dup_line_char_frac_bp,
                p.n_paras,
                p.dupp * 10000 // p.n_paras AS dup_para_frac_bp,
                p.duppc * 10000 // GREATEST(p.totpc, 1)
                    AS dup_para_char_frac_bp,
                COALESCE(tt.n, 0) AS n_tokens,
                COALESCE(s2.score, 0) * 10000
                    // GREATEST(COALESCE(ts.tot, 0), 1)
                    AS top2gram_char_frac_bp,
                COALESCE(s3.score, 0) * 10000
                    // GREATEST(COALESCE(ts.tot, 0), 1)
                    AS top3gram_char_frac_bp,
                COALESCE(s4.score, 0) * 10000
                    // GREATEST(COALESCE(ts.tot, 0), 1)
                    AS top4gram_char_frac_bp,
                LEAST(COALESCE(d5.dupc, 0), COALESCE(ts.tot, 0)) * 10000
                    // GREATEST(COALESCE(ts.tot, 0), 1)
                    AS dup5gram_char_frac_bp
            FROM lstat l
            JOIN pstat p USING (doc_id)
            LEFT JOIN tt USING (doc_id)
            LEFT JOIN tstat ts USING (doc_id)
            LEFT JOIN s2 USING (doc_id)
            LEFT JOIN s3 USING (doc_id)
            LEFT JOIN s4 USING (doc_id)
            LEFT JOIN d5 USING (doc_id)
        """,
        # dsir_select: features = unigrams + chr(31)-joined positional
        # bigrams, md5low64 % 4096; wgt[b] = bitlen(tgt+1) - bitlen(raw+1),
        # norm = bitlen(Nraw+4096) - bitlen(Ntgt+4096) (bitlen ==
        # length(bin(x)) for x > 0); score = Σ wgt + n_features·norm;
        # binned-percentile cutoff (classifier_select law, width 1 —
        # bit-length scores are small ints, so distinct bins stay bounded
        # and width-1 gives exact-score granularity; keep 2500 → drop 7500).
        "dsir_select": r"""
            WITH tok AS (
                SELECT doc_id, lang,
                       list_filter(regexp_split_to_array(
                                       lower(trim(text)), '\s+'),
                                   x -> x <> '') AS w
                FROM documents),
            tt AS (SELECT doc_id, lang, w, len(w) AS n FROM tok),
            tv AS (SELECT doc_id, lang, unnest(range(0, n)) AS i, w, n
                   FROM tt WHERE n > 0),
            feat AS (
                SELECT doc_id, lang, w[i + 1] AS f FROM tv
                UNION ALL
                SELECT doc_id, lang, w[i + 1] || chr(31) || w[i + 2] AS f
                FROM tv WHERE i < n - 1),
            fb AS (SELECT doc_id, lang,
                          CAST(md5_number_lower(f) % 4096 AS BIGINT) AS b
                   FROM feat),
            bc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS raw_c,
                          CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                               AS BIGINT) AS tgt_c
                   FROM fb GROUP BY b),
            tot AS (SELECT CAST(SUM(raw_c) AS BIGINT) AS nr,
                           CAST(SUM(tgt_c) AS BIGINT) AS nt FROM bc),
            wgt AS (SELECT b,
                           CAST(length(bin(tgt_c + 1))
                                - length(bin(raw_c + 1)) AS BIGINT) AS wv
                    FROM bc),
            nrm AS (SELECT CAST(length(bin(nr + 4096))
                                - length(bin(nt + 4096)) AS BIGINT) AS nv
                    FROM tot),
            sc AS (SELECT fb.doc_id,
                          CAST(SUM(wgt.wv)
                               + COUNT(*) * (SELECT nv FROM nrm)
                               AS BIGINT) AS score
                   FROM fb JOIN wgt USING (b) GROUP BY fb.doc_id),
            scored AS (SELECT d.doc_id,
                              CAST(COALESCE(sc.score, 0) AS BIGINT) AS score
                       FROM documents d LEFT JOIN sc USING (doc_id)),
            bins AS (SELECT doc_id, score,
                            (score + (CAST(1 AS BIGINT) << 40)) // 1 AS b
                     FROM scored),
            hist AS (SELECT b, count(*) AS c FROM bins GROUP BY 1),
            cum AS (SELECT b, sum(c) OVER (ORDER BY b) AS cc FROM hist),
            cut AS (SELECT min(b) AS cut FROM cum
                    WHERE cc * 10000 >=
                          7500 * (SELECT count(*) FROM documents))
            SELECT doc_id, score,
                   CAST(CASE WHEN b > (SELECT cut FROM cut)
                        THEN 1 ELSE 0 END AS BIGINT) AS keep
            FROM bins
        """,
        # json_props: TRY_CAST(json_extract_string(...) AS BIGINT) is the
        # shared extraction law (non-integer / missing-path → NULL);
        # all-NULL groups coalesce min/max to 0 on both sides.
        "json_props": """
            WITH e AS (
                SELECT event_type,
                       TRY_CAST(json_extract_string(props, '$.k')
                                AS BIGINT) AS k
                FROM events)
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(COALESCE(SUM(k), 0) AS BIGINT) AS k_sum,
                   CAST(COALESCE(MIN(k), 0) AS BIGINT) AS k_min,
                   CAST(COALESCE(MAX(k), 0) AS BIGINT) AS k_max,
                   CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS k_nulls
            FROM e GROUP BY event_type
        """,
        "kmeans_update": _kmeans_update_oracle(),
        # frequency_cap: exact_dedup's fingerprint law with NULL text
        # coalesced to '' on both sides; copy_rank = row_number within the
        # fingerprint group by ascending doc_id; keep = copy_rank <= cap.
        "frequency_cap": """
            WITH f AS (
                SELECT doc_id,
                       md5(regexp_replace(lower(COALESCE(text, '')),
                                          '[^a-z0-9]', '', 'g'))
                           AS fingerprint
                FROM documents)
            SELECT doc_id, fingerprint,
                   CAST(row_number() OVER (PARTITION BY fingerprint
                                           ORDER BY doc_id) AS BIGINT)
                       AS copy_rank,
                   CAST(CASE WHEN row_number() OVER (
                                  PARTITION BY fingerprint
                                  ORDER BY doc_id) <= 2
                        THEN 1 ELSE 0 END AS BIGINT) AS keep
            FROM f
        """,
        # token_budget: n_words = RE2 \S+ count (gopher law); cum_words =
        # window sum longest-first (n_words DESC, doc_id ASC); keep iff
        # the running total including self fits the budget.
        "token_budget": """
            WITH w AS (
                SELECT doc_id, source,
                       CAST(length(regexp_extract_all(
                                COALESCE(text, ''), '\\S+'))
                            AS BIGINT) AS n_words
                FROM documents),
            c AS (
                SELECT doc_id, source, n_words,
                       CAST(SUM(n_words) OVER (
                            PARTITION BY source
                            ORDER BY n_words DESC, doc_id
                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
                           AS cum_words
                FROM w)
            SELECT doc_id, source, n_words, cum_words,
                   CAST(CASE WHEN cum_words <= 1000 THEN 1 ELSE 0 END
                        AS BIGINT) AS keep
            FROM c
        """,
        # winnow_dedup: the winnow_fingerprint CTEs (same k=5/w=4 law) →
        # distinct (doc, fp) postings → df <= 64 stop-hash filter (same
        # guard as the engine; per-bucket df == global df there) →
        # self-join pair counts >= 2; n_left/n_right = each doc's distinct
        # fingerprint count BEFORE the df filter (the engine's n_fp).
        "winnow_dedup": r"""
            WITH t AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\s+'),
                                   x -> x <> '') AS toks
                FROM documents),
            h AS (
                SELECT doc_id,
                       CASE WHEN len(toks) < 5 THEN CAST([] AS BIGINT[])
                       ELSE [CAST(md5_number_lower(
                                      array_to_string(toks[i:i+4], ' '))
                                  % 9223372036854775808 AS BIGINT)
                             FOR i IN range(1, len(toks) - 3)] END AS hs
                FROM t),
            m AS (
                SELECT doc_id,
                       CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[])
                       ELSE [list_min(hs[i:i+3])
                             FOR i IN range(1, greatest(1, len(hs) - 3) + 1)]
                       END AS mins
                FROM h),
            fp AS (
                SELECT doc_id,
                       [mins[i] FOR i IN range(1, len(mins) + 1)
                        IF i = 1 OR mins[i] <> mins[i-1]] AS fps
                FROM m),
            df AS (
                SELECT DISTINCT doc_id, fps[u.i + 1] AS fp
                FROM fp, unnest(range(0, len(fps))) AS u(i)),
            nd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
                   FROM df GROUP BY doc_id),
            ok AS (SELECT fp FROM df GROUP BY fp
                   HAVING COUNT(*) BETWEEN 2 AND 64),
            pr AS (
                SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                       CAST(COUNT(*) AS BIGINT) AS n_shared
                FROM df a JOIN df b ON a.fp = b.fp
                                    AND a.doc_id < b.doc_id
                WHERE a.fp IN (SELECT fp FROM ok)
                GROUP BY 1, 2)
            SELECT pr.left_id, pr.right_id, pr.n_shared,
                   nl.n AS n_left, nr.n AS n_right
            FROM pr
            JOIN nd nl ON nl.doc_id = pr.left_id
            JOIN nd nr ON nr.doc_id = pr.right_id
            WHERE pr.n_shared >= 2
        """,
        # bpe_pairs: word_counts CTE → per-word adjacent char pairs
        # (1-based char indexing, unicode codepoints both sides) weighted
        # by corpus frequency.
        "bpe_pairs": """
            WITH wc AS (
                SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM (
                    SELECT UNNEST(regexp_split_to_array(lower(text),
                                                        '\\s+')) AS word
                    FROM documents) t
                WHERE word <> '' GROUP BY word),
            p AS (
                SELECT word[i] AS left_sym, word[i + 1] AS right_sym, n
                FROM wc, unnest(range(1, length(word))) AS u(i))
            SELECT left_sym, right_sym,
                   CAST(SUM(n) AS BIGINT) AS pair_count
            FROM p GROUP BY 1, 2
        """,
        # event_dedup: gap to the previous same-(user,type) event ordered
        # (ts, event_id); -1 sentinel for the first; dup iff gap within
        # the window.  epoch_us on timestamp[us] is the exact int64.
        "event_dedup": """
            WITH g AS (
                SELECT event_id, user_id, event_type,
                       COALESCE(epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                                    PARTITION BY user_id, event_type
                                    ORDER BY ts, event_id), -1) AS gap_us
                FROM events)
            SELECT event_id, user_id, event_type,
                   CAST(gap_us AS BIGINT) AS gap_us,
                   CAST(CASE WHEN gap_us >= 0 AND gap_us <= 3600000000
                        THEN 1 ELSE 0 END AS BIGINT) AS is_dup
            FROM g
        """,
        "ann_recall": _ann_recall_oracle(),
        # lang_quantiles: the length_quantiles percentile_disc law with
        # PARTITION BY lang window sums.
        "lang_quantiles": """
            WITH t AS (SELECT lang,
                              CAST(len(regexp_extract_all(text, '\\S+'))
                                   AS BIGINT) v
                       FROM documents),
            c AS (SELECT lang, v, COUNT(*) c FROM t GROUP BY 1, 2),
            w AS (SELECT lang, v,
                         SUM(c) OVER (PARTITION BY lang ORDER BY v) cum,
                         SUM(c) OVER (PARTITION BY lang) n
                  FROM c)
            SELECT w.lang, CAST(q.q_bp AS BIGINT) AS q_bp,
                   CAST(MIN(w.v) AS BIGINT) AS value
            FROM (VALUES (2500), (5000), (7500), (9000), (9900))
                 AS q(q_bp)
            JOIN w ON w.cum * 10000 >= q.q_bp * w.n
            GROUP BY 1, 2
        """,
        # bigram_bits: top-2048 unigram + top-4096 bigram models (ties →
        # lexicographic); in-model bigram with in-model prev charges
        # bitlen(1 + c_uni(prev) // c_bi); else backoff-penalty bit +
        # the unigram_bits law; doc-initial tokens pay plain unigram.
        "bigram_bits": """
            WITH tok AS (
                SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS w
                FROM documents),
            tt AS (SELECT doc_id, w, len(w) AS n FROM tok),
            tv AS (SELECT doc_id, unnest(range(0, n)) AS i, w, n
                   FROM tt WHERE n > 0),
            t AS (SELECT doc_id, i, w[i + 1] AS cur,
                         CASE WHEN i > 0 THEN w[i] END AS prev
                  FROM tv),
            cnt AS (SELECT cur AS wd, count(*) AS c FROM t GROUP BY 1),
            tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cnt),
            umodel AS (SELECT wd, c FROM cnt
                       QUALIFY row_number() OVER (ORDER BY c DESC, wd)
                               <= 2048),
            bg AS (SELECT prev || chr(31) || cur AS k, count(*) AS c
                   FROM t WHERE prev IS NOT NULL GROUP BY 1),
            bmodel AS (SELECT k, c FROM bg
                       QUALIFY row_number() OVER (ORDER BY c DESC, k)
                               <= 4096),
            cost AS (
                SELECT t.doc_id,
                       CASE WHEN t.prev IS NOT NULL
                                 AND bm.c IS NOT NULL
                                 AND up.c IS NOT NULL
                            THEN length(bin(1 + up.c // bm.c))
                            ELSE (CASE WHEN t.prev IS NOT NULL
                                  THEN 1 ELSE 0 END)
                                 + length(bin(1 + (SELECT n FROM tot)
                                              // (COALESCE(uc.c, 0) + 1)))
                       END AS b
                FROM t
                LEFT JOIN bmodel bm
                       ON bm.k = t.prev || chr(31) || t.cur
                LEFT JOIN umodel up ON up.wd = t.prev
                LEFT JOIN umodel uc ON uc.wd = t.cur),
            agg AS (SELECT doc_id, count(*) AS n_tok, sum(b) AS bits
                    FROM cost GROUP BY 1)
            SELECT d.doc_id,
                   CAST(COALESCE(a.n_tok, 0) AS BIGINT) AS n_tok,
                   CAST(COALESCE(a.bits, 0) AS BIGINT) AS bits
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        # kmv_sketch: k smallest DISTINCT md5-low64 hashes per lang; the
        # uint64 hash ships as (h_top, h_low) int64 halves — (top, low)
        # ordering == uint64 ordering on both sides.
        "kmv_sketch": r"""
            WITH tok AS (
                SELECT doc_id, lang,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS w
                FROM documents),
            t AS (SELECT lang, u.t AS w
                  FROM tok, UNNEST(w) AS u(t) WHERE u.t <> ''),
            hd AS (SELECT DISTINCT lang, md5_number_lower(w) AS hv FROM t),
            r AS (SELECT lang, hv, row_number() OVER (
                      PARTITION BY lang ORDER BY hv) AS rank
                  FROM hd)
            SELECT lang, CAST(rank AS BIGINT) AS rank,
                   CAST(hv // 9223372036854775808 AS BIGINT) AS h_top,
                   CAST(hv % 9223372036854775808 AS BIGINT) AS h_low
            FROM r WHERE rank <= 256
        """,
        # pivot_events: declared-column-set pivot via conditional sums.
        "pivot_events": """
            SELECT user_id,
                   CAST(SUM(CASE WHEN event_type = 'click'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
                   CAST(SUM(CASE WHEN event_type = 'view'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
                   CAST(SUM(CASE WHEN event_type = 'signup'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
                   CAST(SUM(CASE WHEN event_type = 'error'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_error
            FROM events GROUP BY user_id
        """,
        # clean_text: NFC == pc.utf8_normalize(form='NFC'); RE2 control
        # class covers \x0b (RE2 \s doesn't); trim after squeeze only
        # ever strips ASCII spaces — identical on both sides.
        "clean_text": r"""
            WITH d AS (SELECT doc_id, COALESCE(text, '') AS t
                       FROM documents),
            c AS (SELECT doc_id, t,
                         trim(regexp_replace(regexp_replace(
                                  nfc_normalize(t),
                                  '[\x00-\x08\x0b-\x1f\x7f]', '', 'g'),
                              '\s+', ' ', 'g'), ' ') AS ct
                  FROM d)
            SELECT doc_id, ct AS clean_text,
                   CAST(length(t) AS BIGINT) AS n_chars_before,
                   CAST(length(ct) AS BIGINT) AS n_chars_after,
                   CAST(CASE WHEN ct <> t THEN 1 ELSE 0 END AS BIGINT)
                       AS changed
            FROM c
        """,
        # code_detect: shared RE2 counts; GREATEST(n_words,1) so an
        # empty doc never satisfies the 0 >= 0 density test.
        "code_detect": r"""
            WITH d AS (SELECT doc_id, COALESCE(text, '') AS t
                       FROM documents),
            w AS (SELECT doc_id, t,
                         CAST(length(regexp_extract_all(t, '\S+'))
                              AS BIGINT) AS n_words,
                         CAST(length(regexp_extract_all(t, '[{}]'))
                              AS BIGINT) AS n_braces,
                         CAST(length(t) - length(replace(t, ';', ''))
                              AS BIGINT) AS n_semis
                  FROM d),
            l AS (SELECT doc_id, COUNT(*) AS n_lines,
                         CAST(SUM(CASE WHEN regexp_matches(
                                  line, '^(    |\t)') THEN 1 ELSE 0 END)
                              AS BIGINT) AS indent_lines
                  FROM (SELECT doc_id,
                               unnest(string_split(t, chr(10))) AS line
                        FROM d)
                  GROUP BY doc_id)
            SELECT w.doc_id, w.n_words, w.n_braces, w.n_semis,
                   l.n_lines, l.indent_lines,
                   CAST((w.n_braces + w.n_semis) * 10
                            >= GREATEST(w.n_words, 1)
                        OR l.indent_lines * 10 >= l.n_lines * 3
                        AS BIGINT) AS is_code
            FROM w JOIN l USING (doc_id)
        """,
        "nation_revenue": """
            SELECT n.n_name,
                   CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS revenue_c,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
        """,
        # dup_size_hist: exact_dedup's fingerprint law, regrouped by size.
        "dup_size_hist": """
            WITH g AS (
                SELECT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
                           AS fp,
                       COUNT(*) AS cnt
                FROM documents GROUP BY fp
            )
            SELECT cnt AS group_size,
                   CAST(COUNT(*) AS BIGINT) AS n_groups,
                   CAST(cnt * COUNT(*) AS BIGINT) AS n_docs
            FROM g GROUP BY cnt
        """,
        # decay_sum: integer half-life decay — cents >> min(halflives, 62),
        # reference point = global max ts.  cents are non-negative so >>
        # == floor-division by 2^s on both sides.
        "decay_sum": """
            WITH ref AS (SELECT max(epoch_us(ts)) AS m FROM events)
            SELECT user_id,
                   SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                       >> LEAST(((ref.m - epoch_us(ts)) // 86400000000) // 7,
                                62)) AS decay_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events, ref
            GROUP BY user_id
        """,
        # funnel_counts: strict ordered funnel by FIRST occurrence — stage k
        # requires first(stage_k) strictly after first(stage_{k-1}).
        "funnel_counts": """
            WITH m AS (
                SELECT user_id,
                       min(CASE WHEN event_type = 'view'
                                THEN epoch_us(ts) END) AS t0,
                       min(CASE WHEN event_type = 'click'
                                THEN epoch_us(ts) END) AS t1,
                       min(CASE WHEN event_type = 'purchase'
                                THEN epoch_us(ts) END) AS t2
                FROM events GROUP BY user_id
            ), d AS (
                SELECT CASE WHEN t0 IS NULL THEN 0
                            WHEN t1 IS NULL OR t1 <= t0 THEN 1
                            WHEN t2 IS NULL OR t2 <= t1 THEN 2
                            ELSE 3 END AS depth
                FROM m
            )
            SELECT s.stage_idx, s.stage,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM d
                    WHERE depth >= s.stage_idx + 1) AS n_users
            FROM (VALUES (CAST(0 AS BIGINT), 'view'),
                         (CAST(1 AS BIGINT), 'click'),
                         (CAST(2 AS BIGINT), 'purchase'))
                 AS s(stage_idx, stage)
        """,
        # user_retention: absolute epoch weeks; retained_next counts the
        # (at most one, uw is DISTINCT) week+1 match per active user.
        "user_retention": """
            WITH uw AS (
                SELECT DISTINCT user_id,
                       epoch_us(ts) // 604800000000 AS week
                FROM events
            )
            SELECT a.week,
                   CAST(COUNT(*) AS BIGINT) AS active_users,
                   CAST(COUNT(b.user_id) AS BIGINT) AS retained_next
            FROM uw a
            LEFT JOIN uw b ON b.user_id = a.user_id AND b.week = a.week + 1
            GROUP BY a.week
        """,
        # bm25_topk: the all-integer BM25 law — dl = \S+ run count,
        # avgdl_c centitokens, tf saturation in bp with K1=12 B=75
        # (22 = K1+10, 300 = K1·(100−B), 900 = K1·B), idf = bit-length
        # of 1 + N//df (length(bin(x)) == bit_length for x ≥ 1).
        "bm25_topk": f"""
            WITH tok AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\\s+') AS w
                FROM documents),
            dlen AS (
                SELECT doc_id,
                       len(regexp_extract_all(text, '\\S+')) AS dl
                FROM documents),
            consts AS (
                SELECT count(*) AS n,
                       (100 * sum(dl)) // count(*) AS avgdl_c
                FROM dlen),
            qt AS (
                SELECT DISTINCT doc_id AS query_id, u.t AS term
                FROM tok, UNNEST(w[1:4]) AS u(t)
                WHERE doc_id IN ({', '.join(map(str, _SEARCH_PROBE_IDS))})
                  AND u.t <> ''),
            tf AS (
                SELECT t.doc_id, u.tk AS term, count(*) AS tf
                FROM tok t, UNNEST(t.w) AS u(tk)
                WHERE u.tk IN (SELECT term FROM qt)
                GROUP BY 1, 2),
            idf AS (
                SELECT term,
                       length(bin(1 + (SELECT n FROM consts) // count(*)))
                           AS bits
                FROM tf GROUP BY term),
            sc AS (
                SELECT q.query_id, f.doc_id,
                       sum(i.bits *
                           ((f.tf * 22 * 100 * c.avgdl_c * 10000) //
                            (f.tf * 1000 * c.avgdl_c + 300 * c.avgdl_c
                             + 900 * d.dl * 100))) AS score_i
                FROM qt q
                JOIN tf f ON f.term = q.term
                JOIN idf i ON i.term = q.term
                JOIN dlen d ON d.doc_id = f.doc_id
                CROSS JOIN consts c
                GROUP BY 1, 2)
            SELECT query_id, doc_id,
                   CAST(score_i AS BIGINT) AS score_i,
                   CAST(rn AS BIGINT) AS rank
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY query_id
                      ORDER BY score_i DESC, doc_id) AS rn
                  FROM sc)
            WHERE rn <= 10
        """,
        # phonetic_block: the simplified-Soundex law — digit translate,
        # adjacent-run collapse (chained per digit: RE2 has no backrefs),
        # zero drop AFTER the collapse, first letter + 3 digits, 0-padded.
        "phonetic_block": """
            WITH tok0 AS (
                SELECT u.t AS t
                FROM (SELECT regexp_split_to_array(lower(p_name), '\\s+')
                          AS w FROM part),
                     UNNEST(w) AS u(t)),
            tok AS (
                SELECT regexp_replace(t, '[^a-z]', '', 'g') AS tok
                FROM tok0
                WHERE regexp_replace(t, '[^a-z]', '', 'g') <> ''),
            d AS (
                SELECT tok,
                       translate(tok, 'abcdefghijklmnopqrstuvwxyz',
                                 '01230120022455012623010202') AS dd
                FROM tok),
            c AS (
                SELECT tok,
                       regexp_replace(regexp_replace(regexp_replace(
                       regexp_replace(regexp_replace(regexp_replace(
                       regexp_replace(dd,
                           '00+', '0', 'g'), '11+', '1', 'g'),
                           '22+', '2', 'g'), '33+', '3', 'g'),
                           '44+', '4', 'g'), '55+', '5', 'g'),
                           '66+', '6', 'g') AS cc
                FROM d),
            k AS (
                SELECT tok,
                       substr(tok, 1, 1) ||
                       substr(replace(substr(cc, 2), '0', '') || '000',
                              1, 3) AS block_key
                FROM c)
            SELECT block_key,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct
            FROM k GROUP BY block_key
        """,
        # char_entropy: floored Shannon self-information, integer bits.
        # substr/length are codepoint-based in DuckDB (== Python str), and
        # length(bin(x)) == bit_length for x >= 1.
        "char_entropy": """
            WITH ch AS (
                SELECT doc_id, substr(text, g.i, 1) AS c
                FROM documents,
                     UNNEST(generate_series(1, length(coalesce(text, ''))))
                         AS g(i)),
            cc AS (
                SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY 1, 2),
            nn AS (
                SELECT doc_id, length(coalesce(text, '')) AS n
                FROM documents),
            e AS (
                SELECT cc.doc_id,
                       SUM(cnt * (length(bin(nn.n // cnt)) - 1)) AS eb
                FROM cc JOIN nn ON nn.doc_id = cc.doc_id
                GROUP BY cc.doc_id)
            SELECT nn.doc_id,
                   CAST(nn.n AS BIGINT) AS n_chars,
                   CAST(coalesce(e.eb, 0) AS BIGINT) AS entropy_bits
            FROM nn LEFT JOIN e ON e.doc_id = nn.doc_id
        """,
        # source_overlap: distinct (source, token) sets; pairs a < b with
        # nonempty intersection only (inner-join semantics both sides).
        "source_overlap": """
            WITH tok AS (
                SELECT source,
                       regexp_split_to_array(lower(trim(text)), '\\s+') AS w
                FROM documents),
            st AS (
                SELECT DISTINCT source, u.t AS tok
                FROM tok, UNNEST(w) AS u(t) WHERE u.t <> ''),
            v AS (SELECT source, count(*) AS nv FROM st GROUP BY 1),
            i AS (
                SELECT a.source AS source_a, b.source AS source_b,
                       count(*) AS inter
                FROM st a JOIN st b
                  ON a.tok = b.tok AND a.source < b.source
                GROUP BY 1, 2)
            SELECT i.source_a, i.source_b,
                   CAST(i.inter AS BIGINT) AS inter,
                   CAST(va.nv AS BIGINT) AS vocab_a,
                   CAST(vb.nv AS BIGINT) AS vocab_b,
                   CAST(i.inter * 10000 // (va.nv + vb.nv - i.inter)
                        AS BIGINT) AS jaccard_bp
            FROM i
            JOIN v va ON va.source = i.source_a
            JOIN v vb ON vb.source = i.source_b
        """,
        # group_sample: md5-rank per-group k-sample (rank law shared with
        # shuffle_shards: md5_number_lower == little-endian low 8 bytes)
        "group_sample": """
            SELECT lang, doc_id, CAST(rn AS BIGINT) AS rank
            FROM (SELECT lang, doc_id,
                         row_number() OVER (
                             PARTITION BY lang
                             ORDER BY CAST(md5_number_lower(
                                 CAST(doc_id AS VARCHAR)) AS HUGEINT),
                                 doc_id) AS rn
                  FROM documents)
            WHERE rn <= 5
        """,
        # temperature_mix: √-size source weights (IEEE sqrt identical both
        # sides), integer target/rate chain, md5 membership law (budget 250)
        "temperature_mix": """
            WITH c AS (
                SELECT source, count(*) AS n FROM documents GROUP BY 1),
            w AS (
                SELECT source, n,
                       CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS w
                FROM c),
            r AS (
                SELECT source, n, w,
                       least(10000,
                             (250 * w // greatest(
                                  (SELECT sum(w) FROM w), 1)) * 10000
                             // greatest(n, 1)) AS rate_bp
                FROM w)
            SELECT d.doc_id, d.source,
                   CAST(r.rate_bp AS BIGINT) AS rate_bp,
                   CAST(CASE WHEN CAST(md5_number_lower(
                                 CAST(d.doc_id AS VARCHAR)) AS HUGEINT)
                                 % 10000 < r.rate_bp
                             THEN 1 ELSE 0 END AS BIGINT) AS keep
            FROM documents d JOIN r ON r.source = d.source
        """,
        # dedup_lines: first occurrence per (doc, line), rebuilt in pos
        # order; '' docs have exactly one (empty) line.
        "dedup_lines": """
            WITH t AS (
                SELECT doc_id,
                       string_split(coalesce(text, ''), chr(10)) AS ls
                FROM documents),
            l AS (
                SELECT doc_id, ls[i] AS line, i AS pos, len(ls) AS n_lines
                FROM t, UNNEST(generate_series(1, len(ls))) AS g(i)),
            f AS (
                SELECT doc_id, line, min(pos) AS pos
                FROM l GROUP BY doc_id, line)
            SELECT f.doc_id,
                   CAST(any_value(l.n_lines) AS BIGINT) AS n_lines,
                   CAST(count(*) AS BIGINT) AS n_kept,
                   string_agg(f.line, chr(10) ORDER BY f.pos) AS text_dedup
            FROM f JOIN l ON l.doc_id = f.doc_id AND l.pos = f.pos
            GROUP BY f.doc_id
        """,
        # dup_by_source: exact_dedup's fingerprint law (NULL ⇒ '' both
        # sides), distinct counted per source.
        "dup_by_source": """
            WITH f AS (
                SELECT source,
                       md5(regexp_replace(lower(coalesce(text, '')),
                                          '[^a-z0-9]', '', 'g')) AS fp
                FROM documents)
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct,
                   CAST((count(*) - count(DISTINCT fp)) * 10000
                        // count(*) AS BIGINT) AS dup_bp
            FROM f GROUP BY source
        """,
        # lang_top_words: exact per-group heavy hitters, rank law
        # (count DESC, word ASC).
        "lang_top_words": """
            WITH tok AS (
                SELECT lang,
                       regexp_split_to_array(lower(trim(text)), '\\s+') AS w
                FROM documents),
            wc AS (
                SELECT lang, u.t AS word, count(*) AS n
                FROM tok, UNNEST(w) AS u(t)
                WHERE u.t <> '' GROUP BY 1, 2)
            SELECT lang, word, CAST(n AS BIGINT) AS n,
                   CAST(rn AS BIGINT) AS rank
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY lang ORDER BY n DESC, word) AS rn
                  FROM wc)
            WHERE rn <= 5
        """,
        # pq_encode: int8 grid (floor(x·127+0.5), exact in float64 both
        # sides), codebook = subvectors of vec_ids 0..7 (cid = vec_id
        # rank), Σ(q−c)² per 16-dim subspace, ties → lowest cid.
        "pq_encode": f"""
            WITH {_PQ_CODES_CTE}
            SELECT vec_id, subspace, CAST(code AS BIGINT) AS code,
                   CAST(cost AS BIGINT) AS cost
            FROM best WHERE rn = 1
        """,
        # pq_topk: ADC search — per-query LUT of grid distances to every
        # centroid per subspace, doc adc = Σ_s LUT[s][code(v,s)].
        "pq_topk": f"""
            WITH {_PQ_CODES_CTE},
            qrow AS (
                SELECT * FROM q WHERE vec_id IN (0, 1, 2, 3, 4)),
            lut AS (
                SELECT qr.vec_id AS query_id, qr.dim // 16 AS subspace,
                       c.cid,
                       SUM((qr.code - c.code) * (qr.code - c.code)) AS d
                FROM qrow qr JOIN cent c ON c.dim = qr.dim
                GROUP BY 1, 2, 3),
            adc AS (
                SELECT l.query_id, b.vec_id, SUM(l.d) AS adc
                FROM best b
                JOIN lut l ON l.subspace = b.subspace AND l.cid = b.code
                WHERE b.rn = 1
                GROUP BY 1, 2)
            SELECT query_id, vec_id, CAST(adc AS BIGINT) AS adc,
                   CAST(rn2 AS BIGINT) AS rank
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY query_id
                      ORDER BY adc, vec_id) AS rn2 FROM adc)
            WHERE rn2 <= 10
        """,
        # grid_l2_topk: exact int8-grid L2, (dist ASC, vec_id) rank law.
        "grid_l2_topk": """
            WITH q AS (
                SELECT vec_id, g.i - 1 AS dim,
                       CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 127
                                  + 0.5) AS BIGINT) AS code
                FROM embeddings,
                     UNNEST(generate_series(1, len(embedding))) AS g(i)),
            qq AS (SELECT * FROM q WHERE vec_id IN (0, 1, 2, 3, 4)),
            d AS (
                SELECT qq.vec_id AS query_id, q.vec_id,
                       SUM((qq.code - q.code) * (qq.code - q.code)) AS dist
                FROM qq JOIN q ON q.dim = qq.dim
                GROUP BY 1, 2)
            SELECT query_id, vec_id, CAST(dist AS BIGINT) AS dist,
                   CAST(rn AS BIGINT) AS rank
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY query_id
                      ORDER BY dist, vec_id) AS rn FROM d)
            WHERE rn <= 10
        """,
        # rolling_active: windowed COUNT DISTINCT as membership explode —
        # (user, day) contributes the user to days d..d+6; only observed
        # activity days are reported.
        "rolling_active": """
            WITH uw AS (
                SELECT DISTINCT user_id,
                       epoch_us(ts) // 86400000000 AS day
                FROM events),
            m AS (
                SELECT DISTINCT user_id, day + g.i AS wday
                FROM uw, UNNEST(generate_series(0, 6)) AS g(i)),
            dau AS (SELECT day, count(*) AS dau FROM uw GROUP BY 1),
            wau AS (SELECT wday AS day, count(*) AS wau FROM m GROUP BY 1)
            SELECT d.day, CAST(d.dau AS BIGINT) AS dau,
                   CAST(w.wau AS BIGINT) AS wau
            FROM dau d JOIN wau w ON w.day = d.day
        """,
        # profile_table: per-column QA stats; floats render through the
        # cents law (monotone, so min/max commute), ints/strings directly.
        "profile_table": """
            SELECT 'o_custkey' AS "column",
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count(*) - count(o_custkey) AS BIGINT) AS n_nulls,
                   CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
                   CAST(min(o_custkey) AS VARCHAR) AS min_v,
                   CAST(max(o_custkey) AS VARCHAR) AS max_v
            FROM orders
            UNION ALL
            SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
                   CAST(count(*) - count(o_orderstatus) AS BIGINT),
                   CAST(count(DISTINCT o_orderstatus) AS BIGINT),
                   min(o_orderstatus), max(o_orderstatus)
            FROM orders
            UNION ALL
            SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
                   CAST(count(*) - count(o_totalprice) AS BIGINT),
                   CAST(count(DISTINCT o_totalprice) AS BIGINT),
                   CAST(CAST(floor(min(o_totalprice) * 100 + 0.5)
                             AS BIGINT) AS VARCHAR),
                   CAST(CAST(floor(max(o_totalprice) * 100 + 0.5)
                             AS BIGINT) AS VARCHAR)
            FROM orders
        """,
        # conversion_time: strictly-ordered first-view→first-purchase
        # delays in whole seconds, peers-inclusive percentile rule.
        "conversion_time": """
            WITH m AS (
                SELECT user_id,
                       min(CASE WHEN event_type = 'view'
                                THEN epoch_us(ts) END) AS tv,
                       min(CASE WHEN event_type = 'purchase'
                                THEN epoch_us(ts) END) AS tp
                FROM events GROUP BY 1),
            d AS (
                SELECT (tp - tv) // 1000000 AS delay_s FROM m
                WHERE tv IS NOT NULL AND tp IS NOT NULL AND tp > tv),
            cum AS (
                SELECT delay_s, count(*) OVER (ORDER BY delay_s) AS cum,
                       (SELECT count(*) FROM d) AS n
                FROM d)
            SELECT q.q_bp,
                   (SELECT min(delay_s) FROM cum
                    WHERE cum * 10000 >= q.q_bp * n) AS delay_s
            FROM (VALUES (CAST(2500 AS BIGINT)), (CAST(5000 AS BIGINT)),
                         (CAST(7500 AS BIGINT)), (CAST(9000 AS BIGINT)))
                 AS q(q_bp)
        """,
        # revenue_rollup: GROUPING SETS with GROUPING()-driven 'ALL'
        # markers — the engine derives margins from the finest aggregate.
        "revenue_rollup": """
            SELECT CASE WHEN GROUPING(n.n_name) = 1
                        THEN 'ALL' ELSE n.n_name END AS nation,
                   CASE WHEN GROUPING(o.o_orderstatus) = 1
                        THEN 'ALL' ELSE o.o_orderstatus END AS status,
                   CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS revenue_c,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            GROUP BY GROUPING SETS ((n.n_name, o.o_orderstatus),
                                    (n.n_name), (o.o_orderstatus), ())
        """,
        # value_histogram: fixed-width integer-cents buckets.
        "value_histogram": """
            WITH c AS (
                SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                           AS cents
                FROM orders)
            SELECT cents // 100000 AS bucket,
                   CAST((cents // 100000) * 100000 AS BIGINT) AS lo_cents,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(cents) AS BIGINT) AS sum_cents
            FROM c GROUP BY cents // 100000
        """,
        # supplier_balance: integer cents incl. negatives (floor law is
        # identical for negative doubles on both sides).
        "supplier_balance": """
            SELECT n.n_name,
                   CAST(count(*) AS BIGINT) AS n_suppliers,
                   CAST(sum(CAST(floor(s.s_acctbal * 100 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS bal_cents,
                   CAST(sum(CASE WHEN CAST(floor(s.s_acctbal * 100 + 0.5)
                                      AS BIGINT) < 0
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_negative
            FROM supplier s
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            GROUP BY n.n_name
        """,
        # incremental_dedup_counts: the streaming dedup's keep-COUNT law —
        # exactly one keeper per distinct fingerprint (fresh index), so
        # n_keep = COUNT(DISTINCT md5(...)).  coalesce(text, '') matches
        # the Ray fingerprint law (NULL text ⇒ md5('')); bare NULLs would
        # silently vanish from COUNT(DISTINCT).
        "incremental_dedup_counts": """
            WITH fp AS (
                SELECT md5(regexp_replace(lower(coalesce(text, '')),
                                          '[^a-z0-9]', '', 'g')) AS f
                FROM documents)
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(DISTINCT f) AS BIGINT) AS n_keep,
                   CAST(count(*) - count(DISTINCT f) AS BIGINT) AS n_dup
            FROM fp
        """,
        # shipping_priority: Q3 shape; per-line cents law identical to
        # pricing_summary's sum_disc_c; top-10 tie-break on orderkey.
        "shipping_priority": """
            WITH li AS (
                SELECT l_orderkey AS o_orderkey,
                       CAST(SUM(CAST(FLOOR(l_extendedprice*(1.0 - l_discount)*100 + 0.5)
                                     AS BIGINT)) AS BIGINT) AS revenue_c
                FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-06-01'
                GROUP BY l_orderkey)
            SELECT o.o_orderkey,
                   strftime(o.o_orderdate, '%Y-%m-%d') AS order_day,
                   o.o_orderpriority, li.revenue_c
            FROM li
            JOIN orders o ON o.o_orderkey = li.o_orderkey
            WHERE o.o_orderdate < TIMESTAMP '1998-06-01'
              AND o.o_custkey IN (SELECT c_custkey FROM customer
                                  WHERE c_mktsegment = 'BUILDING')
            ORDER BY li.revenue_c DESC, o.o_orderkey LIMIT 10
        """,
        # token_blocking_budget: tokenizer law shared with word_counts;
        # distinct (doc, token) -> block sizes -> histogram + s*(s-1)//2
        # pair budget (DuckDB // = floor division, same as numpy).
        "token_blocking_budget": """
            WITH toks AS (
                SELECT DISTINCT doc_id, word FROM (
                    SELECT doc_id,
                           UNNEST(regexp_split_to_array(lower(text), '\\s+')) AS word
                    FROM documents) t
                WHERE word <> ''),
            blocks AS (
                SELECT word, CAST(COUNT(*) AS BIGINT) AS block_size
                FROM toks GROUP BY word)
            SELECT block_size, CAST(COUNT(*) AS BIGINT) AS n_blocks,
                   CAST(COUNT(*) * (block_size*(block_size-1)//2) AS BIGINT) AS pairs_c
            FROM blocks GROUP BY block_size
        """,
        # skipgram_counts: ordered pairs (t[i], t[i+d]), d in 1..3, inside
        # one document; tokens are the lowercase \S+ matches (never '').
        "skipgram_counts": r"""
            WITH tok AS (SELECT regexp_extract_all(lower(text), '\S+') AS t
                         FROM documents),
            pairs AS (SELECT t[i] AS w1, t[i+d] AS w2
                      FROM tok, unnest([1, 2, 3]) AS dd(d),
                           unnest(range(1, len(t) + 1 - d)) AS u(i))
            SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_sg
            FROM pairs GROUP BY w1, w2 HAVING COUNT(*) >= 5
        """,
        # dedup_keep_longest: keep-BEST per fingerprint — longest text,
        # ties -> lowest doc_id; NULL text reads as '' on both sides.
        "dedup_keep_longest": """
            WITH f AS (SELECT doc_id,
                   md5(regexp_replace(lower(coalesce(text, '')),
                                      '[^a-z0-9]', '', 'g')) AS fingerprint,
                   CAST(length(coalesce(text, '')) AS BIGINT) AS keep_len
                FROM documents),
            r AS (SELECT *,
                   row_number() OVER (PARTITION BY fingerprint
                                      ORDER BY keep_len DESC, doc_id) AS rn,
                   COUNT(*) OVER (PARTITION BY fingerprint) AS nd
                FROM f)
            SELECT fingerprint, doc_id AS keep_id, keep_len,
                   CAST(nd AS BIGINT) AS n_dups
            FROM r WHERE rn = 1
        """,
        # rfm_segments: global max order date scalar; cents/days laws and
        # the fixed 4..1 scoring grid match analytics._RFM_* exactly.
        "rfm_segments": """
            WITH o AS (SELECT o_custkey, epoch_us(o_orderdate) AS ts,
                              CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)
                                  AS cents
                       FROM orders),
            g AS (SELECT MAX(ts) AS gmax FROM o),
            c AS (SELECT o_custkey, MAX(ts) AS last_ts,
                         CAST(COUNT(*) AS BIGINT) AS frequency,
                         CAST(SUM(cents) AS BIGINT) AS monetary_cents
                  FROM o GROUP BY o_custkey)
            SELECT c.o_custkey,
                   CAST((g.gmax - c.last_ts) // 86400000000 AS BIGINT)
                       AS recency_days,
                   c.frequency, c.monetary_cents,
                   CAST(
                     (CASE WHEN (g.gmax - c.last_ts) // 86400000000 <= 180
                               THEN 4
                           WHEN (g.gmax - c.last_ts) // 86400000000 <= 365
                               THEN 3
                           WHEN (g.gmax - c.last_ts) // 86400000000 <= 730
                               THEN 2
                           ELSE 1 END) * 100
                     + (CASE WHEN c.frequency >= 12 THEN 4
                             WHEN c.frequency >= 8 THEN 3
                             WHEN c.frequency >= 4 THEN 2 ELSE 1 END) * 10
                     + (CASE WHEN c.monetary_cents >= 300000000 THEN 4
                             WHEN c.monetary_cents >= 200000000 THEN 3
                             WHEN c.monetary_cents >= 100000000 THEN 2
                             ELSE 1 END)
                   AS BIGINT) AS rfm
            FROM c CROSS JOIN g
        """,
        # snm_pairs: rank = ROW_NUMBER() OVER (ORDER BY key, doc_id) where
        # key = first 16 chars of the alnum-collapsed lowercase text
        # (NULL -> ''); pairs within 3 ranks, gap recorded.
        "snm_pairs": """
            WITH k AS (SELECT doc_id,
                    substr(regexp_replace(lower(coalesce(text, '')),
                                          '[^a-z0-9]', '', 'g'),
                           1, 16) AS key
                 FROM documents),
            r AS (SELECT doc_id,
                    row_number() OVER (ORDER BY key, doc_id) AS rn
                  FROM k)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(b.rn - a.rn AS BIGINT) AS gap
            FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 3
        """,
        # blocking_quality: every metric is sum over C(n,2) of group sizes;
        # block key = first \\S+ token of lower(text) ('' = no block);
        # truth = exact_dedup fingerprint equality.
        "blocking_quality": r"""
            WITH fk AS (SELECT
                    md5(regexp_replace(lower(coalesce(text, '')),
                                       '[^a-z0-9]', '', 'g')) AS fp,
                    coalesce(regexp_extract_all(lower(coalesce(text, '')),
                                                '\S+')[1], '') AS key
                 FROM documents),
            tp AS (SELECT SUM(c*(c-1)//2) AS v FROM
                   (SELECT COUNT(*) c FROM fk GROUP BY fp)),
            cp AS (SELECT coalesce(SUM(c*(c-1)//2), 0) AS v FROM
                   (SELECT COUNT(*) c FROM fk WHERE key != '' GROUP BY key)),
            tc AS (SELECT coalesce(SUM(c*(c-1)//2), 0) AS v FROM
                   (SELECT COUNT(*) c FROM fk WHERE key != ''
                    GROUP BY fp, key)),
            n AS (SELECT COUNT(*) AS docs,
                         COUNT(*) FILTER (key != '') AS keyed FROM fk)
            SELECT CAST(n.docs AS BIGINT) AS n_docs,
                   CAST(n.keyed AS BIGINT) AS n_keyed,
                   CAST(tp.v AS BIGINT) AS n_true_pairs,
                   CAST(cp.v AS BIGINT) AS n_cand_pairs,
                   CAST(tc.v AS BIGINT) AS n_true_cand,
                   CAST(CASE WHEN tp.v = 0 THEN 10000
                        ELSE tc.v * 10000 // tp.v END AS BIGINT) AS pc_bp
            FROM n, tp, cp, tc
        """,
        # edit_block_pairs: 8-char collapse-prefix blocks capped at 64
        # rows (stop-key law on BOTH sides), levenshtein <= 2 on the
        # 24-char collapsed prefix (ASCII: byte dist == codepoint dist).
        "edit_block_pairs": """
            WITH k AS (SELECT doc_id,
                    substr(regexp_replace(lower(coalesce(text, '')),
                                          '[^a-z0-9]', '', 'g'),
                           1, 8) AS key,
                    substr(regexp_replace(lower(coalesce(text, '')),
                                          '[^a-z0-9]', '', 'g'),
                           1, 24) AS s
                 FROM documents),
            b AS (SELECT *, COUNT(*) OVER (PARTITION BY key) AS bs
                  FROM k WHERE key != '')
            SELECT a.doc_id AS id_a, c.doc_id AS id_b,
                   CAST(levenshtein(a.s, c.s) AS BIGINT) AS lev
            FROM b a JOIN b c
              ON a.key = c.key AND a.doc_id < c.doc_id
            WHERE a.bs <= 64 AND levenshtein(a.s, c.s) <= 2
        """,
        # dl_block_pairs: same blocks/caps as edit_block_pairs, TRUE
        # Damerau-Levenshtein <= 2 (transpositions bridge edits — the
        # Lowrance-Wagner law DuckDB implements; ASCII => byte == char).
        "dl_block_pairs": """
            WITH k AS (SELECT doc_id,
                    substr(regexp_replace(lower(coalesce(text, '')),
                                          '[^a-z0-9]', '', 'g'),
                           1, 8) AS key,
                    substr(regexp_replace(lower(coalesce(text, '')),
                                          '[^a-z0-9]', '', 'g'),
                           1, 24) AS s
                 FROM documents),
            b AS (SELECT *, COUNT(*) OVER (PARTITION BY key) AS bs
                  FROM k WHERE key != '')
            SELECT a.doc_id AS id_a, c.doc_id AS id_b,
                   CAST(damerau_levenshtein(a.s, c.s) AS BIGINT) AS dl
            FROM b a JOIN b c
              ON a.key = c.key AND a.doc_id < c.doc_id
            WHERE a.bs <= 64 AND damerau_levenshtein(a.s, c.s) <= 2
        """,
        # golden_record: modal priority/status per customer, ties -> the
        # lexicographically smallest value; meta aggregates joined in.
        "golden_record": """
            WITH p AS (SELECT o_custkey, o_orderpriority AS v, COUNT(*) c
                       FROM orders GROUP BY 1, 2),
            pr AS (SELECT o_custkey, v,
                    row_number() OVER (PARTITION BY o_custkey
                                       ORDER BY c DESC, v) AS rn
                   FROM p),
            s AS (SELECT o_custkey, o_orderstatus AS v, COUNT(*) c
                  FROM orders GROUP BY 1, 2),
            sr AS (SELECT o_custkey, v,
                    row_number() OVER (PARTITION BY o_custkey
                                       ORDER BY c DESC, v) AS rn
                   FROM s),
            m AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
                         MAX(epoch_us(o_orderdate)) AS last_ts_us
                  FROM orders GROUP BY 1)
            SELECT m.o_custkey, pr.v AS top_priority, sr.v AS top_status,
                   m.n_orders, CAST(m.last_ts_us AS BIGINT) AS last_ts_us
            FROM m
            JOIN pr ON pr.o_custkey = m.o_custkey AND pr.rn = 1
            JOIN sr ON sr.o_custkey = m.o_custkey AND sr.rn = 1
        """,
        # meta_blocking_pairs: blocks = distinct word TRIGRAMS; CBS weight
        # = number of shared blocks with df in [2, 100]; prune w below the
        # mean over candidate pairs (w * n_pairs >= sum_w, integer
        # cross-multiply).
        "meta_blocking_pairs": r"""
            WITH tok AS (SELECT doc_id,
                    regexp_extract_all(lower(coalesce(text, '')),
                                       '\S+') AS tl
                 FROM documents),
            dt AS (SELECT DISTINCT doc_id,
                    tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2] AS t
                   FROM tok, unnest(range(1, len(tl) - 1)) AS u(i)),
            df AS (SELECT t, COUNT(*) c FROM dt GROUP BY t),
            keep AS (SELECT dt.doc_id, dt.t FROM dt JOIN df USING (t)
                     WHERE df.c BETWEEN 2 AND 100),
            p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                         CAST(COUNT(*) AS BIGINT) AS w
                  FROM keep a JOIN keep b
                    ON a.t = b.t AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
            s AS (SELECT COUNT(*) np, COALESCE(SUM(w), 0) sw FROM p)
            SELECT id_a, id_b, w FROM p, s WHERE w * s.np >= s.sw
        """,
        # snm_recall: SNM window hits vs the exact-dup truth; same rank
        # law as snm_pairs, same C(n,2) truth law as blocking_quality.
        "snm_recall": """
            WITH k AS (SELECT doc_id,
                    substr(regexp_replace(lower(coalesce(text, '')),
                                          '[^a-z0-9]', '', 'g'),
                           1, 16) AS key,
                    md5(regexp_replace(lower(coalesce(text, '')),
                                       '[^a-z0-9]', '', 'g')) AS fp
                 FROM documents),
            r AS (SELECT doc_id, fp,
                    row_number() OVER (ORDER BY key, doc_id) AS rn
                  FROM k),
            p AS (SELECT a.fp AS fa, b.fp AS fb
                  FROM r a JOIN r b
                    ON b.rn > a.rn AND b.rn <= a.rn + 3),
            ch AS (SELECT COUNT(*) AS cand,
                          COALESCE(SUM(CASE WHEN fa = fb THEN 1 ELSE 0
                                       END), 0) AS hit
                   FROM p),
            tp AS (SELECT COALESCE(SUM(c*(c-1)//2), 0) AS v FROM
                   (SELECT COUNT(*) c FROM k GROUP BY fp))
            SELECT CAST(tp.v AS BIGINT) AS n_true_pairs,
                   CAST(ch.cand AS BIGINT) AS n_cand,
                   CAST(ch.hit AS BIGINT) AS n_hit,
                   CAST(CASE WHEN tp.v = 0 THEN 10000
                        ELSE ch.hit * 10000 // tp.v END AS BIGINT)
                       AS recall_bp
            FROM tp, ch
        """,
        # snm_multi_pairs: two rank passes (key; reversed collapse),
        # LEAST/GREATEST-normalized union, COUNT(*) = pass count (a pair
        # appears at most once per pass).
        "snm_multi_pairs": """
            WITH k AS (SELECT doc_id,
                    regexp_replace(lower(coalesce(text, '')),
                                   '[^a-z0-9]', '', 'g') AS c
                 FROM documents),
            r1 AS (SELECT doc_id,
                    row_number() OVER (ORDER BY substr(c, 1, 16), doc_id)
                        AS rn
                   FROM k),
            r2 AS (SELECT doc_id,
                    row_number() OVER (ORDER BY substr(reverse(c), 1, 16),
                                       doc_id) AS rn
                   FROM k),
            p AS (
                SELECT LEAST(a.doc_id, b.doc_id) AS id_a,
                       GREATEST(a.doc_id, b.doc_id) AS id_b
                FROM r1 a JOIN r1 b ON b.rn > a.rn AND b.rn <= a.rn + 3
                UNION ALL
                SELECT LEAST(a.doc_id, b.doc_id),
                       GREATEST(a.doc_id, b.doc_id)
                FROM r2 a JOIN r2 b ON b.rn > a.rn AND b.rn <= a.rn + 3)
            SELECT id_a, id_b, CAST(COUNT(*) AS BIGINT) AS n_passes
            FROM p GROUP BY 1, 2
        """,
        # cluster_golden_record: the dedup_keep_list closure CTE + the
        # survivorship laws (keep = longest text then lowest id; modal
        # lang/source with count ties -> smallest value, NULLS LAST).
        "cluster_golden_record": """
            WITH RECURSIVE tok AS (
                SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w
                FROM documents),
            sh AS (
                SELECT DISTINCT doc_id,
                       w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
                FROM tok, UNNEST(generate_series(1, len(w) - 2)) AS g(i)),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
            ok_sh AS (
                SELECT shingle FROM sh GROUP BY shingle
                HAVING COUNT(*) BETWEEN 2 AND 100),
            cand AS (
                SELECT a.doc_id AS left_id, b.doc_id AS right_id, COUNT(*) AS inter
                FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                WHERE a.shingle IN (SELECT shingle FROM ok_sh)
                GROUP BY a.doc_id, b.doc_id),
            dup AS (
                SELECT c.left_id, c.right_id FROM cand c
                JOIN sizes sa ON sa.doc_id = c.left_id
                JOIN sizes sb ON sb.doc_id = c.right_id
                WHERE c.inter*100 >= (sa.n_sh + sb.n_sh - c.inter)*10),
            edges AS (
                SELECT left_id AS a, right_id AS b FROM dup
                UNION ALL SELECT right_id, left_id FROM dup),
            reach(node, lab) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT e.a, r.lab FROM edges e JOIN reach r ON r.node = e.b),
            cc AS (SELECT node AS doc_id, MIN(lab) AS cluster_id
                   FROM reach GROUP BY node),
            attr AS (SELECT cc.cluster_id, d.doc_id,
                        CAST(length(coalesce(d.text, '')) AS BIGINT) AS ln,
                        d.lang, d.source
                     FROM documents d JOIN cc ON cc.doc_id = d.doc_id),
            k AS (SELECT cluster_id, doc_id, ln,
                    row_number() OVER (PARTITION BY cluster_id
                                       ORDER BY ln DESC, doc_id) AS rn
                  FROM attr),
            lr AS (SELECT cluster_id, lang,
                    row_number() OVER (PARTITION BY cluster_id
                                       ORDER BY c DESC, lang) AS rn
                   FROM (SELECT cluster_id, lang, COUNT(*) c
                         FROM attr GROUP BY 1, 2)),
            sr AS (SELECT cluster_id, source,
                    row_number() OVER (PARTITION BY cluster_id
                                       ORDER BY c DESC, source) AS rn
                   FROM (SELECT cluster_id, source, COUNT(*) c
                         FROM attr GROUP BY 1, 2)),
            nm AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members
                   FROM attr GROUP BY 1)
            SELECT nm.cluster_id, k.doc_id AS keep_id, k.ln AS keep_len,
                   lr.lang AS top_lang, sr.source AS top_source,
                   nm.n_members
            FROM nm
            JOIN k ON k.cluster_id = nm.cluster_id AND k.rn = 1
            JOIN lr ON lr.cluster_id = nm.cluster_id AND lr.rn = 1
            JOIN sr ON sr.cluster_id = nm.cluster_id AND sr.rn = 1
        """,
        # fs_match_scores: Fellegi-Sunter agreement weights w_f =
        # bit_length(T // A_f) (length(bin(x)) == int.bit_length for
        # x >= 1); candidates = same nation, 0 < id gap <= 5; fields
        # seg / name-tens-char / $1000 cents bucket (floor via float div
        # is exact: |cents| < 2^50).  The c/t/a/w/scored CTE chain is
        # shared with fs_mutual_best (_fs_scored_cte).
        "fs_match_scores": f"""
            WITH {_fs_scored_cte()}
            SELECT CAST(score AS BIGINT) AS score,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM scored GROUP BY score
        """,
        # brand_supplier_counts: exact COUNT DISTINCT; NULL keys dropped
        # on the fact side (SQL join semantics), brand '' on NULL brand.
        "brand_supplier_counts": """
            SELECT coalesce(p.p_brand, '') AS p_brand,
                   CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT)
                       AS n_suppliers
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            WHERE l.l_suppkey IS NOT NULL
            GROUP BY 1
        """,
        # snm_window_sweep: snm_recall's rank law; per-window counts are
        # rank-gap <= w; fixed 5-row shape, 0-truth -> 10000.
        "snm_window_sweep": """
            WITH k AS (SELECT doc_id,
                    substr(regexp_replace(lower(coalesce(text, '')),
                                          '[^a-z0-9]', '', 'g'),
                           1, 16) AS key,
                    md5(regexp_replace(lower(coalesce(text, '')),
                                       '[^a-z0-9]', '', 'g')) AS fp
                 FROM documents),
            r AS (SELECT doc_id, fp,
                    row_number() OVER (ORDER BY key, doc_id) AS rn
                  FROM k),
            p AS (SELECT b.rn - a.rn AS d,
                         CASE WHEN a.fp = b.fp THEN 1 ELSE 0 END AS hit
                  FROM r a JOIN r b
                    ON b.rn > a.rn AND b.rn <= a.rn + 10),
            wins(w) AS (VALUES (1), (2), (3), (5), (10)),
            agg AS (SELECT wins.w,
                           COUNT(p.d) AS n_cand,
                           coalesce(SUM(p.hit), 0) AS n_hit
                    FROM wins LEFT JOIN p ON p.d <= wins.w
                    GROUP BY wins.w),
            tp AS (SELECT coalesce(SUM(c*(c-1)//2), 0) AS v FROM
                   (SELECT COUNT(*) c FROM k GROUP BY fp))
            SELECT CAST(w AS BIGINT) AS window,
                   CAST(n_cand AS BIGINT) AS n_cand,
                   CAST(n_hit AS BIGINT) AS n_hit,
                   CAST(CASE WHEN tp.v = 0 THEN 10000
                             ELSE n_hit*10000 // tp.v
                        END AS BIGINT) AS recall_bp
            FROM agg, tp
        """,
        # pair_review_sample: the ngram_jaccard tau-10 candidate law +
        # the md5-low64 pair coin (md5_number_lower == _hash_shingles_u64).
        "pair_review_sample": r"""
            WITH tok AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS w
                FROM documents),
            sh AS (
                SELECT DISTINCT doc_id,
                       w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
                FROM tok, UNNEST(generate_series(1, len(w) - 2)) AS g(i)),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
            ok_sh AS (
                SELECT shingle FROM sh GROUP BY shingle
                HAVING COUNT(*) BETWEEN 2 AND 100),
            cand AS (
                SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                       COUNT(*) AS inter
                FROM sh a JOIN sh b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                WHERE a.shingle IN (SELECT shingle FROM ok_sh)
                GROUP BY a.doc_id, b.doc_id),
            p AS (
                SELECT c.left_id, c.right_id,
                       CAST(c.inter AS BIGINT) AS inter,
                       CAST(sa.n_sh AS BIGINT) AS n_left,
                       CAST(sb.n_sh AS BIGINT) AS n_right,
                       CAST(c.inter*10000 //
                            (sa.n_sh + sb.n_sh - c.inter) AS BIGINT)
                           AS jac_bp
                FROM cand c
                JOIN sizes sa ON sa.doc_id = c.left_id
                JOIN sizes sb ON sb.doc_id = c.right_id
                WHERE c.inter*100 >= (sa.n_sh + sb.n_sh - c.inter)*10)
            SELECT * FROM p
            WHERE md5_number_lower(left_id || ':' || right_id)
                  % 10000 < 500
        """,
        # cluster_bcubed: the cluster_pair_eval closure chain; per-record
        # floors FIRST (k*1e4 // size), the average floors the sum.
        "cluster_bcubed": r"""
            WITH RECURSIVE tok AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS w
                FROM documents),
            sh AS (
                SELECT DISTINCT doc_id,
                       w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
                FROM tok, UNNEST(generate_series(1, len(w) - 2)) AS g(i)),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
            ok_sh AS (
                SELECT shingle FROM sh GROUP BY shingle
                HAVING COUNT(*) BETWEEN 2 AND 100),
            cand AS (
                SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                       COUNT(*) AS inter
                FROM sh a JOIN sh b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                WHERE a.shingle IN (SELECT shingle FROM ok_sh)
                GROUP BY a.doc_id, b.doc_id),
            dup AS (
                SELECT c.left_id, c.right_id FROM cand c
                JOIN sizes sa ON sa.doc_id = c.left_id
                JOIN sizes sb ON sb.doc_id = c.right_id
                WHERE c.inter*100 >= (sa.n_sh + sb.n_sh - c.inter)*10),
            edges AS (
                SELECT left_id AS a, right_id AS b FROM dup
                UNION ALL SELECT right_id, left_id FROM dup),
            reach(node, lab) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT e.a, r.lab FROM edges e JOIN reach r ON r.node = e.b),
            cc AS (SELECT node AS doc_id, MIN(lab) AS cluster_id
                   FROM reach GROUP BY node),
            fp AS (SELECT doc_id,
                          md5(regexp_replace(lower(coalesce(text, '')),
                                             '[^a-z0-9]', '', 'g')) AS f
                   FROM documents),
            m AS (SELECT cc.cluster_id, fp.f
                  FROM cc JOIN fp ON fp.doc_id = cc.doc_id),
            cs AS (SELECT cluster_id, COUNT(*) AS s FROM m GROUP BY 1),
            fs2 AS (SELECT f, COUNT(*) AS s FROM m GROUP BY 1),
            per AS (SELECT cluster_id, f, COUNT(*) AS k FROM m GROUP BY 1, 2),
            sums AS (
                SELECT SUM(per.k * (per.k*10000 // cs.s)) AS ps,
                       SUM(per.k * (per.k*10000 // fs2.s)) AS rs,
                       SUM(per.k) AS n
                FROM per
                JOIN cs USING (cluster_id)
                JOIN fs2 ON fs2.f = per.f),
            met AS (
                SELECT coalesce(n, 0) AS n,
                       CASE WHEN coalesce(n, 0) = 0 THEN 10000
                            ELSE ps // n END AS p_bp,
                       CASE WHEN coalesce(n, 0) = 0 THEN 10000
                            ELSE rs // n END AS r_bp
                FROM sums)
            SELECT CAST(n AS BIGINT) AS n_docs,
                   CAST(p_bp AS BIGINT) AS bcubed_p_bp,
                   CAST(r_bp AS BIGINT) AS bcubed_r_bp,
                   CAST(CASE WHEN p_bp + r_bp > 0
                             THEN 2*p_bp*r_bp // (p_bp + r_bp)
                             ELSE 0 END AS BIGINT) AS bcubed_f_bp
            FROM met
        """,
        # bracket_revenue: Q19 OR-of-ANDs — VALUES bracket dim LEFT
        # JOIN the qualified aggregate (fixed 3-row shape, zeros when
        # empty); per-line cents floor BEFORE the sum (_cents law).
        "bracket_revenue": """
            WITH br(bracket_id, brand, lo_s, hi_s, lo_q, hi_q) AS (
                VALUES (1, 'Brand#12', 1, 5, 1, 11),
                       (2, 'Brand#23', 1, 10, 10, 20),
                       (3, 'Brand#34', 1, 15, 20, 30)),
            j AS (
                SELECT br.bracket_id,
                       COUNT(*) AS n_lines,
                       SUM(CAST(floor(l.l_extendedprice
                                      * (1 - l.l_discount) * 100 + 0.5)
                                AS BIGINT)) AS revenue_c
                FROM lineitem l
                JOIN part p ON p.p_partkey = l.l_partkey
                JOIN br ON p.p_brand = br.brand
                       AND p.p_size BETWEEN br.lo_s AND br.hi_s
                       AND l.l_quantity BETWEEN br.lo_q AND br.hi_q
                GROUP BY br.bracket_id)
            SELECT br.bracket_id,
                   br.brand AS p_brand,
                   CAST(coalesce(j.n_lines, 0) AS BIGINT) AS n_lines,
                   CAST(coalesce(j.revenue_c, 0) AS BIGINT) AS revenue_c
            FROM br LEFT JOIN j USING (bracket_id)
            ORDER BY br.bracket_id
        """,
        # meta_blocking_wnp: same trigram-block CBS graph as
        # meta_blocking_pairs; node margins (deg, Σw) from the
        # both-direction edge explode; OR of the two integer
        # cross-multiplied node-mean tests.
        "meta_blocking_wnp": r"""
            WITH tok AS (SELECT doc_id,
                    regexp_extract_all(lower(coalesce(text, '')),
                                       '\S+') AS tl
                 FROM documents),
            dt AS (SELECT DISTINCT doc_id,
                    tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2] AS t
                   FROM tok, unnest(range(1, len(tl) - 1)) AS u(i)),
            df AS (SELECT t, COUNT(*) c FROM dt GROUP BY t),
            keep AS (SELECT dt.doc_id, dt.t FROM dt JOIN df USING (t)
                     WHERE df.c BETWEEN 2 AND 100),
            p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                         CAST(COUNT(*) AS BIGINT) AS w
                  FROM keep a JOIN keep b
                    ON a.t = b.t AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
            nm AS (SELECT node, COUNT(*) AS deg,
                          CAST(SUM(w) AS BIGINT) AS sw
                   FROM (SELECT id_a AS node, w FROM p
                         UNION ALL SELECT id_b, w FROM p)
                   GROUP BY node)
            SELECT p.id_a, p.id_b, p.w
            FROM p JOIN nm a ON a.node = p.id_a
                   JOIN nm b ON b.node = p.id_b
            WHERE p.w * a.deg >= a.sw OR p.w * b.deg >= b.sw
        """,
        # progressive_pairs: deterministic best-first schedule — top 100
        # CBS edges by (w DESC, id_a, id_b), 1-based rank.
        "progressive_pairs": r"""
            WITH tok AS (SELECT doc_id,
                    regexp_extract_all(lower(coalesce(text, '')),
                                       '\S+') AS tl
                 FROM documents),
            dt AS (SELECT DISTINCT doc_id,
                    tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2] AS t
                   FROM tok, unnest(range(1, len(tl) - 1)) AS u(i)),
            df AS (SELECT t, COUNT(*) c FROM dt GROUP BY t),
            keep AS (SELECT dt.doc_id, dt.t FROM dt JOIN df USING (t)
                     WHERE df.c BETWEEN 2 AND 100),
            p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                         CAST(COUNT(*) AS BIGINT) AS w
                  FROM keep a JOIN keep b
                    ON a.t = b.t AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
            r AS (SELECT id_a, id_b, w,
                         ROW_NUMBER() OVER
                             (ORDER BY w DESC, id_a, id_b) AS rnk
                  FROM p)
            SELECT CAST(rnk AS BIGINT) AS rank, id_a, id_b, w
            FROM r WHERE rnk <= 100
        """,
        # setsim_measures: ngram_jaccard candidate law (tau 0 — every
        # co-occurring pair), three coefficients in floor bps, kept when
        # containment (the pointwise max of the three) >= 5000.
        "setsim_measures": r"""
            WITH tok AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS w
                FROM documents),
            sh AS (
                SELECT DISTINCT doc_id,
                       w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
                FROM tok, UNNEST(generate_series(1, len(w) - 2)) AS g(i)),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh
                      GROUP BY doc_id),
            ok_sh AS (
                SELECT shingle FROM sh GROUP BY shingle
                HAVING COUNT(*) BETWEEN 2 AND 100),
            pairs AS (
                SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                       COUNT(*) AS inter
                FROM sh a JOIN sh b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                WHERE a.shingle IN (SELECT shingle FROM ok_sh)
                GROUP BY a.doc_id, b.doc_id),
            m AS (
                SELECT p.left_id, p.right_id,
                       CAST(p.inter AS BIGINT) AS inter,
                       CAST(sa.n_sh AS BIGINT) AS n_left,
                       CAST(sb.n_sh AS BIGINT) AS n_right
                FROM pairs p
                JOIN sizes sa ON sa.doc_id = p.left_id
                JOIN sizes sb ON sb.doc_id = p.right_id)
            SELECT left_id, right_id, inter, n_left, n_right,
                   inter*10000 // (n_left + n_right - inter) AS jaccard_bp,
                   2*inter*10000 // (n_left + n_right) AS dice_bp,
                   inter*10000 // least(n_left, n_right) AS containment_bp
            FROM m
            WHERE inter*10000 // least(n_left, n_right) >= 5000
        """,
        # local_supplier_volume: Q5 — per-line cents floor before the
        # sum (_cents law); customer and supplier share the nation.
        "local_supplier_volume": """
            SELECT n.n_name,
                   CAST(SUM(CAST(floor(l.l_extendedprice
                                       * (1 - l.l_discount) * 100 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS revenue_c
            FROM customer c, orders o, lineitem l, supplier s,
                 nation n, region r
            WHERE c.c_custkey = o.o_custkey
              AND l.l_orderkey = o.o_orderkey
              AND l.l_suppkey = s.s_suppkey
              AND c.c_nationkey = s.s_nationkey
              AND s.s_nationkey = n.n_nationkey
              AND n.n_regionkey = r.r_regionkey
              AND r.r_name = 'ASIA'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n.n_name
        """,
        # nation_trade_volume: Q7 — both directed nation pairs, year of
        # the SHIPDATE, per-line cents floor before the sum.
        "nation_trade_volume": """
            SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
                   CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
                   CAST(SUM(CAST(floor(l.l_extendedprice
                                       * (1 - l.l_discount) * 100 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS revenue_c
            FROM supplier s, lineitem l, orders o, customer c,
                 nation ns, nation nc
            WHERE s.s_suppkey = l.l_suppkey
              AND o.o_orderkey = l.l_orderkey
              AND c.c_custkey = o.o_custkey
              AND s.s_nationkey = ns.n_nationkey
              AND c.c_nationkey = nc.n_nationkey
              AND ((ns.n_name = 'NATION_3' AND nc.n_name = 'NATION_8')
                OR (ns.n_name = 'NATION_8' AND nc.n_name = 'NATION_3'))
              AND l.l_shipdate >= TIMESTAMP '1996-01-01'
              AND l.l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY 1, 2, 3
        """,
        # meta_blocking_cnp: same CBS graph; per-node ROW_NUMBER over
        # (w DESC, id_a, id_b), DISTINCT union of both endpoints' top-k.
        "meta_blocking_cnp": r"""
            WITH tok AS (SELECT doc_id,
                    regexp_extract_all(lower(coalesce(text, '')),
                                       '\S+') AS tl
                 FROM documents),
            dt AS (SELECT DISTINCT doc_id,
                    tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2] AS t
                   FROM tok, unnest(range(1, len(tl) - 1)) AS u(i)),
            df AS (SELECT t, COUNT(*) c FROM dt GROUP BY t),
            keep AS (SELECT dt.doc_id, dt.t FROM dt JOIN df USING (t)
                     WHERE df.c BETWEEN 2 AND 100),
            p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                         CAST(COUNT(*) AS BIGINT) AS w
                  FROM keep a JOIN keep b
                    ON a.t = b.t AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
            e AS (SELECT id_a AS node, id_a, id_b, w FROM p
                  UNION ALL SELECT id_b, id_a, id_b, w FROM p),
            r AS (SELECT node, id_a, id_b, w,
                         ROW_NUMBER() OVER (PARTITION BY node
                             ORDER BY w DESC, id_a, id_b) AS rn
                  FROM e)
            SELECT DISTINCT id_a, id_b, w FROM r WHERE rn <= 2
        """,
        # monge_elkan_pairs: tau-50 ngram candidates; ME over DISTINCT
        # tokens, inner ratio 100*(mx-lev)//mx (byte levenshtein, ASCII
        # corpus), directional means floored at bp.
        "monge_elkan_pairs": r"""
            WITH tok AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS w
                FROM documents),
            sh AS (
                SELECT DISTINCT doc_id,
                       w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
                FROM tok, UNNEST(generate_series(1, len(w) - 2)) AS g(i)),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh
                      GROUP BY doc_id),
            ok_sh AS (
                SELECT shingle FROM sh GROUP BY shingle
                HAVING COUNT(*) BETWEEN 2 AND 100),
            prs AS (
                SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                       COUNT(*) AS inter
                FROM sh a JOIN sh b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                WHERE a.shingle IN (SELECT shingle FROM ok_sh)
                GROUP BY a.doc_id, b.doc_id),
            cand AS (
                SELECT p.left_id, p.right_id FROM prs p
                JOIN sizes sa ON sa.doc_id = p.left_id
                JOIN sizes sb ON sb.doc_id = p.right_id
                WHERE p.inter*100 >= (sa.n_sh + sb.n_sh - p.inter)*50),
            tt AS (SELECT DISTINCT doc_id, UNNEST(w) AS t FROM tok),
            x AS (SELECT c.left_id, c.right_id, a.t AS t1, b.t AS t2
                  FROM cand c
                  JOIN tt a ON a.doc_id = c.left_id
                  JOIN tt b ON b.doc_id = c.right_id),
            s1 AS (SELECT left_id, right_id, t1,
                          MAX(100*(greatest(length(t1), length(t2))
                                   - levenshtein(t1, t2))
                              // greatest(length(t1), length(t2))) AS ms
                   FROM x GROUP BY 1, 2, 3),
            m1 AS (SELECT left_id, right_id,
                          SUM(ms)*100 // COUNT(*) AS me_lr
                   FROM s1 GROUP BY 1, 2),
            s2 AS (SELECT left_id, right_id, t2,
                          MAX(100*(greatest(length(t1), length(t2))
                                   - levenshtein(t1, t2))
                              // greatest(length(t1), length(t2))) AS ms
                   FROM x GROUP BY 1, 2, 3),
            m2 AS (SELECT left_id, right_id,
                          SUM(ms)*100 // COUNT(*) AS me_rl
                   FROM s2 GROUP BY 1, 2)
            SELECT m1.left_id, m1.right_id,
                   CAST(me_lr AS BIGINT) AS me_lr_bp,
                   CAST(me_rl AS BIGINT) AS me_rl_bp
            FROM m1 JOIN m2 USING (left_id, right_id)
        """,
        # blocking_rule_coverage: rule streams are each pair-distinct;
        # totals per rule, marginals per MIN rule; VALUES fixed shape.
        "blocking_rule_coverage": r"""
            WITH tok AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS w
                FROM documents),
            fp AS (SELECT doc_id,
                          md5(regexp_replace(lower(coalesce(text, '')),
                                             '[^a-z0-9]', '', 'g')) AS f
                   FROM documents),
            p1 AS (SELECT a.doc_id AS la, b.doc_id AS rb
                   FROM fp a JOIN fp b
                     ON a.f = b.f AND a.doc_id < b.doc_id),
            sh4 AS (SELECT DISTINCT doc_id,
                           w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                || ' ' || w[i+3] AS s
                    FROM tok,
                         UNNEST(generate_series(1, len(w) - 3)) AS g(i)),
            ok4 AS (SELECT s FROM sh4 GROUP BY s
                    HAVING COUNT(*) BETWEEN 2 AND 100),
            p2 AS (SELECT DISTINCT a.doc_id AS la, b.doc_id AS rb
                   FROM sh4 a JOIN sh4 b
                     ON a.s = b.s AND a.doc_id < b.doc_id
                   WHERE a.s IN (SELECT s FROM ok4)),
            sh3 AS (SELECT DISTINCT doc_id,
                           w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
                    FROM tok,
                         UNNEST(generate_series(1, len(w) - 2)) AS g(i)),
            ok3 AS (SELECT s FROM sh3 GROUP BY s
                    HAVING COUNT(*) BETWEEN 2 AND 100),
            p3 AS (SELECT DISTINCT a.doc_id AS la, b.doc_id AS rb
                   FROM sh3 a JOIN sh3 b
                     ON a.s = b.s AND a.doc_id < b.doc_id
                   WHERE a.s IN (SELECT s FROM ok3)),
            u AS (SELECT la, rb, 1 AS r FROM p1
                  UNION ALL SELECT la, rb, 2 FROM p2
                  UNION ALL SELECT la, rb, 3 FROM p3),
            tot AS (SELECT r, COUNT(*) AS c FROM u GROUP BY r),
            mn AS (SELECT la, rb, MIN(r) AS mr FROM u GROUP BY 1, 2),
            nw AS (SELECT mr, COUNT(*) AS c FROM mn GROUP BY mr),
            rules(rule_id) AS (VALUES (1), (2), (3))
            SELECT CAST(rule_id AS BIGINT) AS rule_id,
                   CAST(coalesce(tot.c, 0) AS BIGINT) AS n_pairs,
                   CAST(coalesce(nw.c, 0) AS BIGINT) AS n_new
            FROM rules LEFT JOIN tot ON tot.r = rules.rule_id
                       LEFT JOIN nw ON nw.mr = rules.rule_id
            ORDER BY rule_id
        """,
        # pair_features: the ME oracle's CTEs + distinct-token Jaccard,
        # first-token levenshtein and |n_a - n_b| over the same pairs.
        "pair_features": r"""
            WITH tok AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS w
                FROM documents),
            sh AS (
                SELECT DISTINCT doc_id,
                       w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
                FROM tok, UNNEST(generate_series(1, len(w) - 2)) AS g(i)),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh
                      GROUP BY doc_id),
            ok_sh AS (
                SELECT shingle FROM sh GROUP BY shingle
                HAVING COUNT(*) BETWEEN 2 AND 100),
            prs AS (
                SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                       COUNT(*) AS inter
                FROM sh a JOIN sh b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                WHERE a.shingle IN (SELECT shingle FROM ok_sh)
                GROUP BY a.doc_id, b.doc_id),
            cand AS (
                SELECT p.left_id, p.right_id FROM prs p
                JOIN sizes sa ON sa.doc_id = p.left_id
                JOIN sizes sb ON sb.doc_id = p.right_id
                WHERE p.inter*100 >= (sa.n_sh + sb.n_sh - p.inter)*50),
            tt AS (SELECT DISTINCT doc_id, UNNEST(w) AS t FROM tok),
            nt AS (SELECT doc_id, COUNT(*) AS n_t FROM tt
                   GROUP BY doc_id),
            ft AS (SELECT doc_id, w[1] AS f FROM tok),
            x AS (SELECT c.left_id, c.right_id, a.t AS t1, b.t AS t2
                  FROM cand c
                  JOIN tt a ON a.doc_id = c.left_id
                  JOIN tt b ON b.doc_id = c.right_id),
            it AS (SELECT left_id, right_id, COUNT(*) AS i
                   FROM x WHERE t1 = t2 GROUP BY 1, 2),
            s1 AS (SELECT left_id, right_id, t1,
                          MAX(100*(greatest(length(t1), length(t2))
                                   - levenshtein(t1, t2))
                              // greatest(length(t1), length(t2))) AS ms
                   FROM x GROUP BY 1, 2, 3),
            m1 AS (SELECT left_id, right_id,
                          SUM(ms)*100 // COUNT(*) AS me_lr
                   FROM s1 GROUP BY 1, 2),
            s2 AS (SELECT left_id, right_id, t2,
                          MAX(100*(greatest(length(t1), length(t2))
                                   - levenshtein(t1, t2))
                              // greatest(length(t1), length(t2))) AS ms
                   FROM x GROUP BY 1, 2, 3),
            m2 AS (SELECT left_id, right_id,
                          SUM(ms)*100 // COUNT(*) AS me_rl
                   FROM s2 GROUP BY 1, 2)
            SELECT c.left_id, c.right_id,
                   CAST(coalesce(it.i, 0)*10000
                        // (na.n_t + nb.n_t - coalesce(it.i, 0))
                        AS BIGINT) AS tok_jaccard_bp,
                   CAST(m1.me_lr AS BIGINT) AS me_lr_bp,
                   CAST(m2.me_rl AS BIGINT) AS me_rl_bp,
                   CAST(levenshtein(fa.f, fb.f) AS BIGINT) AS first_lev,
                   CAST(abs(na.n_t - nb.n_t) AS BIGINT) AS len_diff
            FROM cand c
            JOIN m1 ON m1.left_id = c.left_id
                   AND m1.right_id = c.right_id
            JOIN m2 ON m2.left_id = c.left_id
                   AND m2.right_id = c.right_id
            LEFT JOIN it ON it.left_id = c.left_id
                        AND it.right_id = c.right_id
            JOIN nt na ON na.doc_id = c.left_id
            JOIN nt nb ON nb.doc_id = c.right_id
            JOIN ft fa ON fa.doc_id = c.left_id
            JOIN ft fb ON fb.doc_id = c.right_id
        """,
        # two_hop_pairs: same CBS graph; witnesses capped at deg<=30,
        # paths = distinct middles, direct edges anti-joined out.
        "two_hop_pairs": r"""
            WITH tok AS (SELECT doc_id,
                    regexp_extract_all(lower(coalesce(text, '')),
                                       '\S+') AS tl
                 FROM documents),
            dt AS (SELECT DISTINCT doc_id,
                    tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2] AS t
                   FROM tok, unnest(range(1, len(tl) - 1)) AS u(i)),
            df AS (SELECT t, COUNT(*) c FROM dt GROUP BY t),
            keep AS (SELECT dt.doc_id, dt.t FROM dt JOIN df USING (t)
                     WHERE df.c BETWEEN 2 AND 100),
            p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                         CAST(COUNT(*) AS BIGINT) AS w
                  FROM keep a JOIN keep b
                    ON a.t = b.t AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
            e2 AS (SELECT id_a AS m, id_b AS nbr FROM p
                   UNION ALL SELECT id_b, id_a FROM p),
            d AS (SELECT m, COUNT(*) AS deg FROM e2 GROUP BY m),
            ok AS (SELECT e2.m, e2.nbr FROM e2 JOIN d USING (m)
                   WHERE d.deg <= 30),
            hop AS (SELECT a.nbr AS id_a, b.nbr AS id_b,
                           CAST(COUNT(*) AS BIGINT) AS paths
                    FROM ok a JOIN ok b
                      ON a.m = b.m AND a.nbr < b.nbr
                    GROUP BY 1, 2)
            SELECT h.id_a, h.id_b, h.paths
            FROM hop h
            WHERE NOT EXISTS (SELECT 1 FROM p
                              WHERE p.id_a = h.id_a
                                AND p.id_b = h.id_b)
        """,
        # revenue_concentration: order-level cents fold per customer,
        # decile = ceil(n/10) by (rev DESC, custkey), floor-bp share.
        "revenue_concentration": """
            WITH pc AS (
                SELECT o_custkey AS ck,
                       SUM(CAST(floor(o_totalprice * 100 + 0.5)
                                AS BIGINT)) AS rev
                FROM orders GROUP BY 1),
            j AS (SELECT c.c_nationkey AS nk, pc.ck, pc.rev
                  FROM pc JOIN customer c ON c.c_custkey = pc.ck),
            r AS (SELECT nk, ck, rev,
                         ROW_NUMBER() OVER (PARTITION BY nk
                             ORDER BY rev DESC, ck) AS rn,
                         COUNT(*) OVER (PARTITION BY nk) AS n
                  FROM j),
            t AS (SELECT nk, MAX(n) AS n_customers,
                         (MAX(n) + 9) // 10 AS top_k,
                         SUM(rev) AS total_c,
                         SUM(CASE WHEN rn <= (n + 9) // 10
                             THEN rev ELSE 0 END) AS top_c
                  FROM r GROUP BY nk)
            SELECT nn.n_name,
                   CAST(n_customers AS BIGINT) AS n_customers,
                   CAST(top_k AS BIGINT) AS top_k,
                   CAST(total_c AS BIGINT) AS total_c,
                   CAST(top_c AS BIGINT) AS top_c,
                   CAST(CASE WHEN total_c > 0
                        THEN top_c * 10000 // total_c
                        ELSE 0 END AS BIGINT) AS share_bp
            FROM t JOIN nation nn ON nn.n_nationkey = t.nk
        """,
        # vocab_growth: md5_number_lower(doc_id) % 16 slice coin; vocab
        # via per-token MIN slice; word_counts token law ('' dropped,
        # NULL text = 0 tokens but the doc counts); cumulative by k.
        "vocab_growth": r"""
            WITH d AS (
                SELECT doc_id,
                       md5_number_lower(CAST(doc_id AS VARCHAR))
                           % 16 AS db,
                       regexp_split_to_array(
                           lower(coalesce(text, '')), '\s+') AS w
                FROM documents),
            t AS (SELECT db, u.tok FROM d, UNNEST(w) AS u(tok)
                  WHERE u.tok <> ''),
            docb AS (SELECT db, COUNT(*) AS c FROM d GROUP BY db),
            tokb AS (SELECT db, COUNT(*) AS c FROM t GROUP BY db),
            vmin AS (SELECT tok, MIN(db) AS mdb FROM t GROUP BY tok),
            vb AS (SELECT mdb AS db, COUNT(*) AS c FROM vmin
                   GROUP BY mdb),
            ks AS (SELECT UNNEST(range(1, 17)) AS k)
            SELECT CAST(ks.k AS BIGINT) AS k,
                   CAST(coalesce((SELECT SUM(c) FROM docb
                                  WHERE db < ks.k), 0)
                        AS BIGINT) AS n_docs,
                   CAST(coalesce((SELECT SUM(c) FROM tokb
                                  WHERE db < ks.k), 0)
                        AS BIGINT) AS n_tokens,
                   CAST(coalesce((SELECT SUM(c) FROM vb
                                  WHERE db < ks.k), 0)
                        AS BIGINT) AS n_vocab
            FROM ks ORDER BY k
        """,
        # graph_triangles: shared ngram-pair edge law (tau 10); wedges =
        # sum C(deg,2); triangles via the a<b<c triple join; floor bps.
        "graph_triangles": r"""
            WITH tok AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)),
                                             '\s+') AS w
                FROM documents),
            sh AS (
                SELECT DISTINCT doc_id,
                       w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
                FROM tok,
                     UNNEST(generate_series(1, len(w) - 2)) AS g(i)),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh
                      GROUP BY doc_id),
            ok_sh AS (SELECT shingle FROM sh GROUP BY shingle
                      HAVING COUNT(*) BETWEEN 2 AND 100),
            pr AS (SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                          COUNT(*) AS inter
                   FROM sh a JOIN sh b ON a.shingle = b.shingle
                                      AND a.doc_id < b.doc_id
                   WHERE a.shingle IN (SELECT shingle FROM ok_sh)
                   GROUP BY a.doc_id, b.doc_id),
            p AS (SELECT pr.left_id AS id_a, pr.right_id AS id_b
                  FROM pr
                  JOIN sizes sa ON sa.doc_id = pr.left_id
                  JOIN sizes sb ON sb.doc_id = pr.right_id
                  WHERE pr.inter*100 >=
                        (sa.n_sh + sb.n_sh - pr.inter)*10),
            e2 AS (SELECT id_a AS m FROM p
                   UNION ALL SELECT id_b FROM p),
            d AS (SELECT m, COUNT(*) AS deg FROM e2 GROUP BY m),
            tri AS (SELECT COUNT(*) AS t
                    FROM p ab JOIN p bc ON ab.id_b = bc.id_a
                         JOIN p ac ON ac.id_a = ab.id_a
                                  AND ac.id_b = bc.id_b)
            SELECT CAST(coalesce((SELECT COUNT(*) FROM d), 0)
                        AS BIGINT) AS n_nodes,
                   CAST(coalesce((SELECT COUNT(*) FROM p), 0)
                        AS BIGINT) AS n_edges,
                   CAST(coalesce((SELECT SUM(deg*(deg-1)//2) FROM d), 0)
                        AS BIGINT) AS n_wedges,
                   CAST(coalesce((SELECT t FROM tri), 0)
                        AS BIGINT) AS n_triangles,
                   CAST(CASE WHEN coalesce((SELECT SUM(deg*(deg-1)//2)
                                            FROM d), 0) > 0
                        THEN 3 * (SELECT t FROM tri) * 10000
                             // (SELECT SUM(deg*(deg-1)//2) FROM d)
                        ELSE 0 END AS BIGINT) AS transitivity_bp
        """,
        # waiting_suppliers: Q21 — late = max ship per (order, supplier)
        # strictly past orderdate+60d; sole-late in >=2-supplier 'F'
        # orders; one nation; numwait DESC, s_name, top 100.
        "waiting_suppliers": """
            WITH ol AS (
                SELECT l_orderkey AS ok, l_suppkey AS sk,
                       MAX(CASE WHEN l_shipdate >
                                     o_orderdate + INTERVAL 60 DAY
                           THEN 1 ELSE 0 END) AS late
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                WHERE o_orderstatus = 'F'
                GROUP BY 1, 2),
            a AS (
                SELECT ok, sk, late,
                       COUNT(*) OVER (PARTITION BY ok) AS n_supp,
                       SUM(late) OVER (PARTITION BY ok) AS n_late
                FROM ol)
            SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
            FROM a JOIN supplier ON sk = s_suppkey
                   JOIN nation ON s_nationkey = n_nationkey
            WHERE late = 1 AND n_supp >= 2 AND n_late = 1
              AND n_name = 'NATION_3'
            GROUP BY s_name
            ORDER BY numwait DESC, s_name
            LIMIT 100
        """,
        # basket_pairs: DISTINCT (order, part) law, support = orders
        # containing both, rank (cnt DESC, p1, p2), top 20.
        "basket_pairs": """
            WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey
                        FROM lineitem),
            pp AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2,
                          COUNT(*) AS cnt
                   FROM lp a JOIN lp b
                     ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey < b.l_partkey
                   GROUP BY 1, 2),
            r AS (SELECT p1, p2, cnt,
                         ROW_NUMBER() OVER
                             (ORDER BY cnt DESC, p1, p2) AS rn
                  FROM pp)
            SELECT CAST(rn AS BIGINT) AS rank, p1, p2,
                   CAST(cnt AS BIGINT) AS cnt
            FROM r WHERE rn <= 20
        """,
        # market_share: Q8 — supplier nation unrestricted, customer in
        # the region, part type exact; share in floor bps of cents.
        "market_share": """
            WITH q AS (
                SELECT year(o.o_orderdate) AS o_year,
                       CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                                  * 100 + 0.5) AS BIGINT) AS rev_c,
                       s.s_nationkey
                FROM lineitem l, part p, supplier s, orders o,
                     customer c, nation n, region r
                WHERE p.p_partkey = l.l_partkey AND p.p_type = 'ECONOMY'
                  AND s.s_suppkey = l.l_suppkey
                  AND o.o_orderkey = l.l_orderkey
                  AND c.c_custkey = o.o_custkey
                  AND c.c_nationkey = n.n_nationkey
                  AND n.n_regionkey = r.r_regionkey
                  AND r.r_name = 'ASIA'
                  AND o.o_orderdate >= TIMESTAMP '1995-01-01'
                  AND o.o_orderdate < TIMESTAMP '1997-01-01'),
            t AS (
                SELECT o_year, SUM(rev_c) AS total_c,
                       SUM(CASE WHEN s_nationkey =
                               (SELECT n_nationkey FROM nation
                                WHERE n_name = 'NATION_1')
                           THEN rev_c ELSE 0 END) AS nation_c
                FROM q GROUP BY o_year)
            SELECT CAST(o_year AS BIGINT) AS o_year,
                   CAST(total_c AS BIGINT) AS total_c,
                   CAST(nation_c AS BIGINT) AS nation_c,
                   CAST(nation_c * 10000 // total_c AS BIGINT) AS share_bp
            FROM t
        """,
        # product_profit: Q9 sans partsupp — substring part-name filter
        # (LIKE with NULL name drops the row, matching the fillna('')
        # mask), order YEAR, per-line cents floor.
        "product_profit": """
            SELECT n.n_name,
                   CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                   CAST(SUM(CAST(floor(l.l_extendedprice
                                       * (1 - l.l_discount) * 100 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS profit_c
            FROM lineitem l, part p, supplier s, orders o, nation n
            WHERE p.p_partkey = l.l_partkey
              AND p.p_name LIKE '%red%'
              AND s.s_suppkey = l.l_suppkey
              AND o.o_orderkey = l.l_orderkey
              AND n.n_nationkey = s.s_nationkey
            GROUP BY 1, 2
        """,
        # cluster_purity: same closure + (cluster, fp) cells as
        # cluster_bcubed; purity = SUM of per-cluster MAX cell counts,
        # inverse = the fp margin; bps floor from raw hits, F from bps.
        "cluster_purity": r"""
            WITH RECURSIVE tok AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS w
                FROM documents),
            sh AS (
                SELECT DISTINCT doc_id,
                       w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
                FROM tok, UNNEST(generate_series(1, len(w) - 2)) AS g(i)),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
            ok_sh AS (
                SELECT shingle FROM sh GROUP BY shingle
                HAVING COUNT(*) BETWEEN 2 AND 100),
            cand AS (
                SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                       COUNT(*) AS inter
                FROM sh a JOIN sh b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                WHERE a.shingle IN (SELECT shingle FROM ok_sh)
                GROUP BY a.doc_id, b.doc_id),
            dup AS (
                SELECT c.left_id, c.right_id FROM cand c
                JOIN sizes sa ON sa.doc_id = c.left_id
                JOIN sizes sb ON sb.doc_id = c.right_id
                WHERE c.inter*100 >= (sa.n_sh + sb.n_sh - c.inter)*10),
            edges AS (
                SELECT left_id AS a, right_id AS b FROM dup
                UNION ALL SELECT right_id, left_id FROM dup),
            reach(node, lab) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT e.a, r.lab FROM edges e JOIN reach r ON r.node = e.b),
            cc AS (SELECT node AS doc_id, MIN(lab) AS cluster_id
                   FROM reach GROUP BY node),
            fp AS (SELECT doc_id,
                          md5(regexp_replace(lower(coalesce(text, '')),
                                             '[^a-z0-9]', '', 'g')) AS f
                   FROM documents),
            m AS (SELECT cc.cluster_id, fp.f
                  FROM cc JOIN fp ON fp.doc_id = cc.doc_id),
            per AS (SELECT cluster_id, f, COUNT(*) AS k FROM m GROUP BY 1, 2),
            pm AS (SELECT SUM(mx) AS hits FROM
                   (SELECT MAX(k) AS mx FROM per GROUP BY cluster_id)),
            fm AS (SELECT SUM(mx) AS hits FROM
                   (SELECT MAX(k) AS mx FROM per GROUP BY f)),
            tot AS (SELECT coalesce(SUM(k), 0) AS n FROM per),
            met AS (
                SELECT tot.n AS n,
                       coalesce(pm.hits, 0) AS ph,
                       coalesce(fm.hits, 0) AS ih,
                       CASE WHEN tot.n = 0 THEN 10000
                            ELSE coalesce(pm.hits, 0)*10000 // tot.n
                       END AS p_bp,
                       CASE WHEN tot.n = 0 THEN 10000
                            ELSE coalesce(fm.hits, 0)*10000 // tot.n
                       END AS i_bp
                FROM tot, pm, fm)
            SELECT CAST(n AS BIGINT) AS n_docs,
                   CAST(ph AS BIGINT) AS purity_hits,
                   CAST(ih AS BIGINT) AS inverse_hits,
                   CAST(p_bp AS BIGINT) AS purity_bp,
                   CAST(i_bp AS BIGINT) AS inverse_bp,
                   CAST(CASE WHEN p_bp + i_bp > 0
                             THEN 2*p_bp*i_bp // (p_bp + i_bp)
                             ELSE 0 END AS BIGINT) AS purity_f_bp
            FROM met
        """,
        # fs_em_round: the shared FS CTE's per-field eq flags; matches =
        # score >= (Sw+1)//2; m = match-agreements/matches, u =
        # nonmatch-agreements/non-matches, bp floors; 0/0 -> 10000.
        "fs_em_round": f"""
            WITH {_fs_scored_cte()},
            th AS (SELECT (SUM(w) + 1) // 2 AS t FROM w),
            st AS (
                SELECT f.field,
                       COUNT(*) AS n_pairs,
                       SUM(CASE f.field WHEN 'seg' THEN eq_seg::INT
                                        WHEN 'ten' THEN eq_ten::INT
                                        ELSE eq_bal::INT END) AS n_agree,
                       SUM(CASE WHEN s.score >= th.t THEN 1 ELSE 0 END)
                           AS n_match,
                       SUM(CASE WHEN s.score >= th.t THEN
                                CASE f.field WHEN 'seg' THEN eq_seg::INT
                                             WHEN 'ten' THEN eq_ten::INT
                                             ELSE eq_bal::INT END
                                ELSE 0 END) AS n_match_agree
                FROM scored s, th,
                     (VALUES ('seg'), ('ten'), ('bal')) AS f(field)
                GROUP BY f.field),
            base AS (SELECT field FROM
                     (VALUES ('seg'), ('ten'), ('bal')) AS f(field)),
            j AS (SELECT base.field,
                         coalesce(st.n_pairs, 0) AS n_pairs,
                         coalesce(st.n_agree, 0) AS n_agree,
                         coalesce(st.n_match, 0) AS n_match,
                         coalesce(st.n_match_agree, 0) AS n_match_agree
                  FROM base LEFT JOIN st ON st.field = base.field)
            SELECT field,
                   CAST(n_pairs AS BIGINT) AS n_pairs,
                   CAST(n_agree AS BIGINT) AS n_agree,
                   CAST(n_match AS BIGINT) AS n_match,
                   CAST(n_match_agree AS BIGINT) AS n_match_agree,
                   CAST(CASE WHEN n_match = 0 THEN 10000
                             ELSE n_match_agree*10000 // n_match
                        END AS BIGINT) AS m_bp,
                   CAST(CASE WHEN n_pairs - n_match = 0 THEN 10000
                             ELSE (n_agree - n_match_agree)*10000
                                  // (n_pairs - n_match)
                        END AS BIGINT) AS u_bp
            FROM j
        """,
        # fs_decision_zones: the fs_em_round m/u chain, then 8 VALUES
        # patterns, mass products in HUGEINT, rank via cross-multiplied
        # likelihood-ratio self-join (ties -> higher code), inclusive
        # window cumsums against the mu/lambda budgets (match wins).
        "fs_decision_zones": f"""
            WITH {_fs_scored_cte()},
            th AS (SELECT (SUM(w) + 1) // 2 AS t FROM w),
            st AS (
                SELECT f.field,
                       COUNT(*) AS n_pairs,
                       SUM(CASE f.field WHEN 'seg' THEN eq_seg::INT
                                        WHEN 'ten' THEN eq_ten::INT
                                        ELSE eq_bal::INT END) AS n_agree,
                       SUM(CASE WHEN s.score >= th.t THEN 1 ELSE 0 END)
                           AS n_match,
                       SUM(CASE WHEN s.score >= th.t THEN
                                CASE f.field WHEN 'seg' THEN eq_seg::INT
                                             WHEN 'ten' THEN eq_ten::INT
                                             ELSE eq_bal::INT END
                                ELSE 0 END) AS n_match_agree
                FROM scored s, th,
                     (VALUES ('seg'), ('ten'), ('bal')) AS f(field)
                GROUP BY f.field),
            base AS (SELECT field FROM
                     (VALUES ('seg'), ('ten'), ('bal')) AS f(field)),
            muv AS (SELECT base.field,
                           CASE WHEN coalesce(st.n_match, 0) = 0 THEN 10000
                                ELSE st.n_match_agree*10000 // st.n_match
                           END AS m,
                           CASE WHEN coalesce(st.n_pairs, 0)
                                     - coalesce(st.n_match, 0) = 0
                                THEN 10000
                                ELSE (st.n_agree - st.n_match_agree)*10000
                                     // (st.n_pairs - st.n_match)
                           END AS u
                    FROM base LEFT JOIN st ON st.field = base.field),
            pr AS (
                SELECT gs.v AS g_seg, gt.v AS g_ten, gb.v AS g_bal,
                       4*gs.v + 2*gt.v + gb.v AS code,
                       CAST(CASE WHEN gs.v = 1 THEN ms.m
                                 ELSE 10000 - ms.m END AS HUGEINT)
                     * CAST(CASE WHEN gt.v = 1 THEN mt.m
                                 ELSE 10000 - mt.m END AS HUGEINT)
                     * CAST(CASE WHEN gb.v = 1 THEN mb.m
                                 ELSE 10000 - mb.m END AS HUGEINT) AS m_num,
                       CAST(CASE WHEN gs.v = 1 THEN ms.u
                                 ELSE 10000 - ms.u END AS HUGEINT)
                     * CAST(CASE WHEN gt.v = 1 THEN mt.u
                                 ELSE 10000 - mt.u END AS HUGEINT)
                     * CAST(CASE WHEN gb.v = 1 THEN mb.u
                                 ELSE 10000 - mb.u END AS HUGEINT) AS u_num
                FROM (VALUES (0), (1)) AS gs(v),
                     (VALUES (0), (1)) AS gt(v),
                     (VALUES (0), (1)) AS gb(v),
                     (SELECT m, u FROM muv WHERE field = 'seg') ms,
                     (SELECT m, u FROM muv WHERE field = 'ten') mt,
                     (SELECT m, u FROM muv WHERE field = 'bal') mb),
            rk AS (
                SELECT a.*,
                       1 + (SELECT COUNT(*) FROM pr b
                            WHERE b.m_num*a.u_num > a.m_num*b.u_num
                               OR (b.m_num*a.u_num = a.m_num*b.u_num
                                   AND b.code > a.code)) AS rnk
                FROM pr a),
            cz AS (
                SELECT *,
                       SUM(u_num) OVER (ORDER BY rnk) AS cum_u,
                       SUM(m_num) OVER (ORDER BY rnk DESC) AS cum_m
                FROM rk)
            SELECT CAST(g_seg AS BIGINT) AS g_seg,
                   CAST(g_ten AS BIGINT) AS g_ten,
                   CAST(g_bal AS BIGINT) AS g_bal,
                   CAST(m_num AS BIGINT) AS m_num,
                   CAST(u_num AS BIGINT) AS u_num,
                   CAST(rnk AS BIGINT) AS rnk,
                   CASE WHEN cum_u <= 500 * CAST(100000000 AS HUGEINT)
                             THEN 'match'
                        WHEN cum_m <= 500 * CAST(100000000 AS HUGEINT)
                             THEN 'nonmatch'
                        ELSE 'possible' END AS zone
            FROM cz
            WHERE (SELECT COUNT(*) FROM c) > 0
        """,
        # fs_pattern_counts: the shared FS CTE's eq flags grouped as the
        # gamma comparison-vector histogram (weight-law independent).
        "fs_pattern_counts": f"""
            WITH {_fs_scored_cte()}
            SELECT CAST(eq_seg AS BIGINT) AS g_seg,
                   CAST(eq_ten AS BIGINT) AS g_ten,
                   CAST(eq_bal AS BIGINT) AS g_bal,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM scored GROUP BY 1, 2, 3
        """,
        # fs_tf_scores: per-VALUE agreement weights (Splink tf
        # adjustment) — w(v) = length(bin(t // C(n_v,2))), singleton
        # fallback length(bin(t)); same fields/candidates as
        # fs_match_scores.  Agreement implies the two sides share the
        # value, so joining the left row's value weight is exact.
        "fs_tf_scores": f"""
            WITH {_fs_fields_cte()},
            vw_seg AS (
                SELECT v, CASE WHEN a > 0 THEN length(bin(t // a))
                               WHEN t > 0 THEN length(bin(t))
                               ELSE 0 END AS w
                FROM (SELECT seg AS v, COUNT(*)*(COUNT(*)-1)//2 AS a
                      FROM c GROUP BY seg), t),
            vw_ten AS (
                SELECT v, CASE WHEN a > 0 THEN length(bin(t // a))
                               WHEN t > 0 THEN length(bin(t))
                               ELSE 0 END AS w
                FROM (SELECT ten AS v, COUNT(*)*(COUNT(*)-1)//2 AS a
                      FROM c GROUP BY ten), t),
            vw_bal AS (
                SELECT v, CASE WHEN a > 0 THEN length(bin(t // a))
                               WHEN t > 0 THEN length(bin(t))
                               ELSE 0 END AS w
                FROM (SELECT bal AS v, COUNT(*)*(COUNT(*)-1)//2 AS a
                      FROM c GROUP BY bal), t),
            tf_scored AS (
                SELECT (CASE WHEN x.seg = y.seg THEN ws.w ELSE 0 END
                      + CASE WHEN x.ten = y.ten THEN wt.w ELSE 0 END
                      + CASE WHEN x.bal = y.bal THEN wb.w ELSE 0 END)
                       AS score
                FROM c x JOIN c y
                  ON x.nat = y.nat AND y.id > x.id AND y.id <= x.id + 5
                JOIN vw_seg ws ON ws.v = x.seg
                JOIN vw_ten wt ON wt.v = x.ten
                JOIN vw_bal wb ON wb.v = x.bal)
            SELECT CAST(score AS BIGINT) AS score,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM tf_scored GROUP BY 1
        """,
        # deletion_join_pairs: the semantic law is the plain cross-join
        # edit-distance-<=1 predicate — the Ray side's deletion-key
        # machinery is output-invariant (FastSS completeness for k=1).
        # ASCII names make byte levenshtein == codepoint distance.
        "deletion_join_pairs": """
            SELECT a.c_custkey AS left_id, b.c_custkey AS right_id,
                   CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
            FROM customer a JOIN customer b ON b.c_custkey > a.c_custkey
            WHERE a.c_name IS NOT NULL AND b.c_name IS NOT NULL
              AND levenshtein(a.c_name, b.c_name) <= 1
        """,
        # promo_revenue: Q14 — per-line cents floor (identical IEEE op
        # order), PROMO share floored to basis points; zero-revenue
        # window degenerates to the fixed (0, 0, 0) row both sides.
        "promo_revenue": """
            WITH li AS (
                SELECT l_partkey,
                       CAST(FLOOR(l_extendedprice*(1.0 - l_discount)*100
                                  + 0.5) AS BIGINT) AS rev
                FROM lineitem
                WHERE l_shipdate >= DATE '1997-01-01'
                  AND l_shipdate <  DATE '1998-01-01'),
            j AS (
                SELECT li.rev, (p.p_type = 'PROMO') AS promo
                FROM li JOIN part p ON p.p_partkey = li.l_partkey)
            SELECT CAST(coalesce(SUM(CASE WHEN promo THEN rev ELSE 0 END),
                                 0) AS BIGINT) AS promo_revenue_c,
                   CAST(coalesce(SUM(rev), 0) AS BIGINT)
                       AS total_revenue_c,
                   CAST(CASE WHEN coalesce(SUM(rev), 0) > 0
                             THEN SUM(CASE WHEN promo THEN rev ELSE 0 END)
                                  * 10000 // SUM(rev)
                             ELSE 0 END AS BIGINT) AS promo_bp
            FROM j
        """,
        # large_orders: Q18 — HAVING on the global per-order quantity
        # sum (per-line cents floor, the pricing_summary sum_qty_c law).
        "large_orders": """
            WITH q AS (
                SELECT l_orderkey,
                       SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT))
                           AS sum_qty_c
                FROM lineitem GROUP BY 1
                HAVING SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT))
                       > 20000)
            SELECT o.o_orderkey, o.o_custkey,
                   strftime(o.o_orderdate, '%Y-%m-%d') AS order_day,
                   CAST(FLOOR(o.o_totalprice*100 + 0.5) AS BIGINT)
                       AS totalprice_c,
                   CAST(q.sum_qty_c AS BIGINT) AS sum_qty_c
            FROM q JOIN orders o ON o.o_orderkey = q.l_orderkey
        """,
        # returnflag_priority: Q12 — high = {1-URGENT, 2-HIGH}; NULL
        # priority falls to the low bucket both sides (CASE ELSE 0).
        "returnflag_priority": """
            WITH li AS (
                SELECT l_orderkey, coalesce(l_returnflag, '') AS rf
                FROM lineitem),
            j AS (
                SELECT li.rf,
                       CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END AS hi
                FROM li JOIN orders o ON o.o_orderkey = li.l_orderkey)
            SELECT rf AS l_returnflag,
                   CAST(SUM(hi) AS BIGINT) AS high_line_count,
                   CAST(SUM(1 - hi) AS BIGINT) AS low_line_count
            FROM j GROUP BY rf
        """,
        # small_qty_revenue: Q17 — the correlated AVG is integer
        # cross-multiplied (5*qty_c*cnt < sum_qty_c == qty < 0.2*avg),
        # so no float division leaks into the hash; // truncation ==
        # floor (total is non-negative).
        "small_qty_revenue": """
            WITH li AS (
                SELECT l_partkey,
                       CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT) AS qc,
                       CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)
                           AS pc
                FROM lineitem
                WHERE l_partkey IN (SELECT p_partkey FROM part
                                    WHERE coalesce(p_brand, '')
                                          = 'Brand#23')),
            ag AS (SELECT l_partkey, SUM(qc) AS s, COUNT(*) AS n
                   FROM li GROUP BY 1)
            SELECT CAST(coalesce(SUM(pc), 0) // 7 AS BIGINT)
                       AS avg_yearly_c
            FROM li JOIN ag USING (l_partkey)
            WHERE 5 * qc * n < s
        """,
        # idle_customers: Q22 — bal > avg(positive bal) is integer
        # cross-multiplied (bc*np > sp); "recent" = orders on/after the
        # cutoff; NULL orderdate never blocks (comparison NULL).
        "idle_customers": """
            WITH b AS (
                SELECT c_custkey, c_nationkey,
                       CAST(FLOOR(coalesce(c_acctbal, 0)*100 + 0.5)
                            AS BIGINT) AS bc
                FROM customer),
            s AS (SELECT coalesce(SUM(CASE WHEN bc > 0 THEN bc END), 0)
                             AS sp,
                         COUNT(CASE WHEN bc > 0 THEN 1 END) AS np
                  FROM b),
            k AS (SELECT c_nationkey, bc FROM b, s
                  WHERE s.np > 0 AND bc * s.np > s.sp
                    AND NOT EXISTS (
                        SELECT 1 FROM orders o
                        WHERE o.o_custkey = b.c_custkey
                          AND o.o_orderdate >= DATE '2000-01-01'))
            SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
                   CAST(COUNT(*) AS BIGINT) AS numcust,
                   CAST(SUM(bc) AS BIGINT) AS totacctbal_c
            FROM k GROUP BY 1
        """,
        # top_supplier: Q15 — per-line cents floor then per-supplier
        # sum; ALL suppliers tied at the max survive.
        "top_supplier": """
            WITH r AS (
                SELECT l_suppkey,
                       SUM(CAST(FLOOR(l_extendedprice*(1.0 - l_discount)
                                      *100 + 0.5) AS BIGINT)) AS rev
                FROM lineitem
                WHERE l_shipdate >= DATE '1997-01-01'
                  AND l_shipdate <  DATE '1997-04-01'
                GROUP BY 1)
            SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey, s.s_name,
                   CAST(r.rev AS BIGINT) AS total_revenue_c
            FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey
            WHERE r.rev = (SELECT MAX(rev) FROM r)
        """,
        # customer_distribution: LEFT join so zero-order customers land in
        # the n_orders = 0 bin (COUNT(o_orderkey) counts non-null only).
        "customer_distribution": """
            WITH pc AS (
                SELECT c.c_custkey, COUNT(o.o_custkey) AS n_orders
                FROM customer c
                LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                GROUP BY c.c_custkey)
            SELECT CAST(n_orders AS BIGINT) AS n_orders,
                   CAST(COUNT(*) AS BIGINT) AS n_custs
            FROM pc GROUP BY n_orders
        """,
        # meta_blocking_ecbs: same blocks/CBS graph as meta_blocking_pairs;
        # w = cbs * bl(B//nb_a) * bl(B//nb_b) with bl = length(bin(x))
        # (the unigram_bits integer-log law), then the same mean prune.
        "meta_blocking_ecbs": r"""
            WITH tok AS (SELECT doc_id,
                    regexp_extract_all(lower(coalesce(text, '')),
                                       '\S+') AS tl
                 FROM documents),
            dt AS (SELECT DISTINCT doc_id,
                    tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2] AS t
                   FROM tok, unnest(range(1, len(tl) - 1)) AS u(i)),
            df AS (SELECT t, COUNT(*) c FROM dt GROUP BY t),
            keep AS (SELECT dt.doc_id, dt.t FROM dt JOIN df USING (t)
                     WHERE df.c BETWEEN 2 AND 100),
            p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                         CAST(COUNT(*) AS BIGINT) AS cbs
                  FROM keep a JOIN keep b
                    ON a.t = b.t AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
            nb AS (SELECT doc_id, COUNT(*) AS nb FROM keep GROUP BY doc_id),
            bt AS (SELECT COUNT(DISTINCT t) AS b FROM keep),
            we AS (SELECT p.id_a, p.id_b,
                          p.cbs * length(bin(bt.b // na.nb))
                                * length(bin(bt.b // nbb.nb)) AS w
                   FROM p
                   JOIN nb na ON na.doc_id = p.id_a
                   JOIN nb nbb ON nbb.doc_id = p.id_b, bt),
            s AS (SELECT COUNT(*) np, COALESCE(SUM(w), 0) sw FROM we)
            SELECT id_a, id_b, CAST(w AS BIGINT) AS w
            FROM we, s WHERE w * s.np >= s.sw
        """,
        # blocking_budget_sweep: same fp/key laws as blocking_quality;
        # per cap h blocks sized 2..h survive; PC denominator = ALL true
        # pairs; fixed 5-row shape (degenerate-parity law).
        "blocking_budget_sweep": r"""
            WITH fk AS (SELECT
                    md5(regexp_replace(lower(coalesce(text, '')),
                                       '[^a-z0-9]', '', 'g')) AS fp,
                    coalesce(regexp_extract_all(lower(coalesce(text, '')),
                                                '\S+')[1], '') AS key
                 FROM documents),
            ks AS (SELECT key, COUNT(*) AS s FROM fk
                   WHERE key != '' GROUP BY key),
            cells AS (SELECT fp, key, COUNT(*) AS c FROM fk
                      WHERE key != '' GROUP BY fp, key),
            caps(cap) AS (VALUES (10), (30), (100), (300), (1000)),
            cand AS (
                SELECT cap,
                       coalesce(SUM(CASE WHEN s BETWEEN 2 AND cap
                                         THEN 1 END), 0) AS n_blocks,
                       coalesce(SUM(CASE WHEN s BETWEEN 2 AND cap
                                         THEN s*(s-1)//2 END), 0)
                           AS n_cand_pairs
                FROM caps LEFT JOIN ks ON TRUE GROUP BY cap),
            tcj AS (SELECT cells.c, ks.s FROM cells
                    JOIN ks ON ks.key = cells.key),
            tc AS (
                SELECT cap,
                       coalesce(SUM(CASE WHEN s BETWEEN 2 AND cap
                                         THEN c*(c-1)//2 END), 0)
                           AS n_true_cand
                FROM caps LEFT JOIN tcj ON TRUE GROUP BY cap),
            tru AS (SELECT coalesce(SUM(c*(c-1)//2), 0) AS t FROM
                    (SELECT COUNT(*) AS c FROM fk GROUP BY fp))
            SELECT CAST(cand.cap AS BIGINT) AS cap,
                   CAST(cand.n_blocks AS BIGINT) AS n_blocks,
                   CAST(cand.n_cand_pairs AS BIGINT) AS n_cand_pairs,
                   CAST(tc.n_true_cand AS BIGINT) AS n_true_cand,
                   CAST(CASE WHEN tru.t = 0 THEN 10000
                             ELSE tc.n_true_cand*10000 // tru.t
                        END AS BIGINT) AS pc_bp
            FROM cand JOIN tc ON tc.cap = cand.cap, tru
        """,
        # cosine_pairs: TF (multiset) trigram vectors; norms over ALL
        # shingles, cross over df<=100 survivors; HUGEINT casts make the
        # squared comparison exact where BIGINT would overflow.
        "cosine_pairs": r"""
            WITH tok AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS w
                FROM documents),
            sh AS (
                SELECT doc_id, w[i]||' '||w[i+1]||' '||w[i+2] AS s,
                       COUNT(*) AS c
                FROM tok, UNNEST(generate_series(1, len(w) - 2)) AS g(i)
                GROUP BY 1, 2),
            norms AS (SELECT doc_id, SUM(c*c) AS n FROM sh GROUP BY doc_id),
            ok AS (SELECT s FROM sh GROUP BY s
                   HAVING COUNT(*) BETWEEN 1 AND 100),
            cr AS (
                SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                       SUM(a.c*b.c) AS x
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                WHERE a.s IN (SELECT s FROM ok)
                GROUP BY 1, 2)
            SELECT cr.left_id, cr.right_id,
                   CAST(cr.x AS BIGINT) AS cross,
                   CAST(na.n AS BIGINT) AS n_left,
                   CAST(nb.n AS BIGINT) AS n_right
            FROM cr
            JOIN norms na ON na.doc_id = cr.left_id
            JOIN norms nb ON nb.doc_id = cr.right_id
            WHERE CAST(cr.x AS HUGEINT)*cr.x*10000
                  >= CAST(50 AS HUGEINT)*50*na.n*nb.n
        """,
        # dedup_threshold_sweep: candidate pairs = the ngram_jaccard law at
        # tau 10 (trigram shingles, df 2..100, inter over survivors); per
        # tau, predicted = jb >= tau*100, tp = predicted AND same exact-dup
        # fingerprint; truth = sum C(n_fp, 2).  Fixed 5-row shape; 0-denoms
        # follow cluster_pair_eval (-> 10000).
        "dedup_threshold_sweep": r"""
            WITH tok AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS w
                FROM documents),
            sh AS (
                SELECT DISTINCT doc_id,
                       w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
                FROM tok, UNNEST(generate_series(1, len(w) - 2)) AS g(i)),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
            ok_sh AS (
                SELECT shingle FROM sh GROUP BY shingle
                HAVING COUNT(*) BETWEEN 2 AND 100),
            cand AS (
                SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                       COUNT(*) AS inter
                FROM sh a JOIN sh b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                WHERE a.shingle IN (SELECT shingle FROM ok_sh)
                GROUP BY a.doc_id, b.doc_id),
            fp AS (SELECT doc_id,
                          md5(regexp_replace(lower(coalesce(text, '')),
                                             '[^a-z0-9]', '', 'g')) AS f
                   FROM documents),
            pe AS (
                SELECT c.inter*10000 // (sa.n_sh + sb.n_sh - c.inter) AS jb,
                       (fa.f = fb.f) AS eq
                FROM cand c
                JOIN sizes sa ON sa.doc_id = c.left_id
                JOIN sizes sb ON sb.doc_id = c.right_id
                JOIN fp fa ON fa.doc_id = c.left_id
                JOIN fp fb ON fb.doc_id = c.right_id
                WHERE c.inter*100 >= (sa.n_sh + sb.n_sh - c.inter)*10),
            taus(tau100) AS (VALUES (10), (30), (50), (70), (90)),
            tru AS (
                SELECT coalesce(SUM(c*(c-1)//2), 0) AS t
                FROM (SELECT COUNT(*) AS c FROM fp GROUP BY f)),
            agg AS (
                SELECT t.tau100,
                       COUNT(pe.jb) AS n_pred,
                       coalesce(SUM(CASE WHEN pe.eq THEN 1 ELSE 0 END), 0)
                           AS n_tp
                FROM taus t LEFT JOIN pe ON pe.jb >= t.tau100*100
                GROUP BY t.tau100),
            met AS (
                SELECT a.tau100, a.n_pred, a.n_tp,
                       CASE WHEN a.n_pred = 0 THEN 10000
                            ELSE a.n_tp*10000 // a.n_pred END AS p_bp,
                       CASE WHEN tru.t = 0 THEN 10000
                            ELSE a.n_tp*10000 // tru.t END AS r_bp
                FROM agg a, tru)
            SELECT CAST(tau100 AS BIGINT) AS tau100,
                   CAST(n_pred AS BIGINT) AS n_pred,
                   CAST(n_tp AS BIGINT) AS n_tp,
                   CAST(p_bp AS BIGINT) AS precision_bp,
                   CAST(r_bp AS BIGINT) AS recall_bp,
                   CAST(CASE WHEN p_bp + r_bp > 0
                             THEN 2*p_bp*r_bp // (p_bp + r_bp)
                             ELSE 0 END AS BIGINT) AS f1_bp
            FROM met
        """,
        # suffix_blocking_pairs: key = collapse[:12]; one block per suffix
        # with length >= 6; blocks sized 2..50 pair their members; n_blocks
        # counts the shared surviving blocks (suffix lengths are unique
        # within a key, so each doc hits a given suffix at most once).
        "suffix_blocking_pairs": r"""
            WITH k AS (
                SELECT doc_id,
                       left(regexp_replace(lower(coalesce(text, '')),
                                           '[^a-z0-9]', '', 'g'), 12) AS kk
                FROM documents),
            sfx AS (
                SELECT doc_id, substr(kk, i, length(kk) - i + 1) AS s
                FROM k, UNNEST(generate_series(1, length(kk) - 5)) AS g(i)
                WHERE length(kk) >= 6),
            ok AS (SELECT s FROM sfx GROUP BY s
                   HAVING COUNT(*) BETWEEN 2 AND 50)
            SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                   CAST(COUNT(*) AS BIGINT) AS n_blocks
            FROM sfx a JOIN sfx b ON a.s = b.s AND a.doc_id < b.doc_id
            WHERE a.s IN (SELECT s FROM ok)
            GROUP BY 1, 2
        """,
        # fs_mutual_best: mutual nearest neighbors under the FS score —
        # (l, r) kept iff r is l's (score desc, r asc) rank-1 partner AND
        # l is r's rank-1 partner, over the same candidate set.
        "fs_mutual_best": f"""
            WITH {_fs_scored_cte()},
            lb AS (SELECT l, r, score FROM scored
                   QUALIFY row_number() OVER (
                       PARTITION BY l ORDER BY score DESC, r) = 1),
            rb AS (SELECT l, r FROM scored
                   QUALIFY row_number() OVER (
                       PARTITION BY r ORDER BY score DESC, l) = 1)
            SELECT lb.l AS left_id, lb.r AS right_id,
                   CAST(lb.score AS BIGINT) AS score
            FROM lb JOIN rb ON rb.l = lb.l AND rb.r = lb.r
        """,
        # ppjoin_pairs: the exact no-cap tau-Jaccard join over word
        # 4-gram shingles (prefix filtering is a candidate-generation
        # strategy, invisible to the output law).
        "ppjoin_pairs": r"""
            WITH tok AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS w
                FROM documents),
            sh AS (
                SELECT DISTINCT doc_id,
                       w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3] AS s
                FROM tok, UNNEST(generate_series(1, len(w) - 3)) AS g(i)),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
            cand AS (
                SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                       COUNT(*) AS inter
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
            SELECT c.left_id, c.right_id, CAST(c.inter AS BIGINT) AS inter,
                   CAST(sa.n_sh AS BIGINT) AS n_left,
                   CAST(sb.n_sh AS BIGINT) AS n_right
            FROM cand c
            JOIN sizes sa ON sa.doc_id = c.left_id
            JOIN sizes sb ON sb.doc_id = c.right_id
            WHERE c.inter*100 >= (sa.n_sh + sb.n_sh - c.inter)*50
        """,
        # cluster_pair_eval: the cluster_golden_record closure CTE + the
        # pair-counting decomposition (tp / pred / true from group sizes).
        "cluster_pair_eval": r"""
            WITH RECURSIVE tok AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS w
                FROM documents),
            sh AS (
                SELECT DISTINCT doc_id,
                       w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
                FROM tok, UNNEST(generate_series(1, len(w) - 2)) AS g(i)),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
            ok_sh AS (
                SELECT shingle FROM sh GROUP BY shingle
                HAVING COUNT(*) BETWEEN 2 AND 100),
            cand AS (
                SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                       COUNT(*) AS inter
                FROM sh a JOIN sh b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                WHERE a.shingle IN (SELECT shingle FROM ok_sh)
                GROUP BY a.doc_id, b.doc_id),
            dup AS (
                SELECT c.left_id, c.right_id FROM cand c
                JOIN sizes sa ON sa.doc_id = c.left_id
                JOIN sizes sb ON sb.doc_id = c.right_id
                WHERE c.inter*100 >= (sa.n_sh + sb.n_sh - c.inter)*10),
            edges AS (
                SELECT left_id AS a, right_id AS b FROM dup
                UNION ALL SELECT right_id, left_id FROM dup),
            reach(node, lab) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT e.a, r.lab FROM edges e JOIN reach r ON r.node = e.b),
            cc AS (SELECT node AS doc_id, MIN(lab) AS cluster_id
                   FROM reach GROUP BY node),
            fp AS (SELECT doc_id,
                          md5(regexp_replace(lower(coalesce(text, '')),
                                             '[^a-z0-9]', '', 'g')) AS f
                   FROM documents),
            m AS (SELECT cc.cluster_id, fp.f
                  FROM cc JOIN fp ON fp.doc_id = cc.doc_id),
            pred AS (SELECT SUM(c*(c-1)//2) AS p
                     FROM (SELECT COUNT(*) AS c FROM m GROUP BY cluster_id)),
            tru AS (SELECT SUM(c*(c-1)//2) AS t
                    FROM (SELECT COUNT(*) AS c FROM fp GROUP BY f)),
            tpc AS (SELECT SUM(c*(c-1)//2) AS tp
                    FROM (SELECT COUNT(*) AS c FROM m
                          GROUP BY cluster_id, f)),
            nd AS (SELECT COUNT(*) AS n FROM documents),
            met AS (
                SELECT CASE WHEN p = 0 THEN 10000
                            ELSE tp*10000 // p END AS p_bp,
                       CASE WHEN t = 0 THEN 10000
                            ELSE tp*10000 // t END AS r_bp
                FROM pred, tru, tpc)
            SELECT CAST(n AS BIGINT) AS n_docs,
                   CAST(p AS BIGINT) AS n_pred_pairs,
                   CAST(t AS BIGINT) AS n_true_pairs,
                   CAST(tp AS BIGINT) AS n_tp,
                   CAST(p_bp AS BIGINT) AS precision_bp,
                   CAST(r_bp AS BIGINT) AS recall_bp,
                   CAST(CASE WHEN p_bp + r_bp > 0
                             THEN 2*p_bp*r_bp // (p_bp + r_bp)
                             ELSE 0 END AS BIGINT) AS f1_bp
            FROM nd, pred, tru, tpc, met
        """,
        # cluster_ari: the cluster_pair_eval closure chain; ARI in
        # truncated basis points via exact HUGEINT arithmetic —
        # num = 2(tp*T - p*t), den = T(p+t) - 2pt (>= 0), NULL at den=0.
        "cluster_ari": r"""
            WITH RECURSIVE tok AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS w
                FROM documents),
            sh AS (
                SELECT DISTINCT doc_id,
                       w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
                FROM tok, UNNEST(generate_series(1, len(w) - 2)) AS g(i)),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
            ok_sh AS (
                SELECT shingle FROM sh GROUP BY shingle
                HAVING COUNT(*) BETWEEN 2 AND 100),
            cand AS (
                SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                       COUNT(*) AS inter
                FROM sh a JOIN sh b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                WHERE a.shingle IN (SELECT shingle FROM ok_sh)
                GROUP BY a.doc_id, b.doc_id),
            dup AS (
                SELECT c.left_id, c.right_id FROM cand c
                JOIN sizes sa ON sa.doc_id = c.left_id
                JOIN sizes sb ON sb.doc_id = c.right_id
                WHERE c.inter*100 >= (sa.n_sh + sb.n_sh - c.inter)*10),
            edges AS (
                SELECT left_id AS a, right_id AS b FROM dup
                UNION ALL SELECT right_id, left_id FROM dup),
            reach(node, lab) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT e.a, r.lab FROM edges e JOIN reach r ON r.node = e.b),
            cc AS (SELECT node AS doc_id, MIN(lab) AS cluster_id
                   FROM reach GROUP BY node),
            fp AS (SELECT doc_id,
                          md5(regexp_replace(lower(coalesce(text, '')),
                                             '[^a-z0-9]', '', 'g')) AS f
                   FROM documents),
            m AS (SELECT cc.cluster_id, fp.f
                  FROM cc JOIN fp ON fp.doc_id = cc.doc_id),
            pred AS (SELECT SUM(c*(c-1)//2) AS p
                     FROM (SELECT COUNT(*) AS c FROM m GROUP BY cluster_id)),
            tru AS (SELECT SUM(c*(c-1)//2) AS t
                    FROM (SELECT COUNT(*) AS c FROM fp GROUP BY f)),
            tpc AS (SELECT SUM(c*(c-1)//2) AS tp
                    FROM (SELECT COUNT(*) AS c FROM m
                          GROUP BY cluster_id, f)),
            nd AS (SELECT COUNT(*) AS n,
                          CAST(COUNT(*) AS HUGEINT)
                          * (COUNT(*) - 1) // 2 AS tt
                   FROM documents),
            ari AS (
                SELECT 2*(CAST(tp AS HUGEINT)*tt
                          - CAST(p AS HUGEINT)*t) AS num,
                       tt*(CAST(p AS HUGEINT) + t)
                       - 2*CAST(p AS HUGEINT)*t AS den
                FROM pred, tru, tpc, nd)
            SELECT CAST(n AS BIGINT) AS n_docs,
                   CAST(tp AS BIGINT) AS n_tp,
                   CAST(p AS BIGINT) AS n_pred_pairs,
                   CAST(t AS BIGINT) AS n_true_pairs,
                   CAST(CASE WHEN n > 0 THEN tt END AS BIGINT)
                       AS total_pairs,
                   CAST(CASE WHEN den = 0 THEN NULL
                             ELSE 10000*num // den END AS BIGINT)
                       AS ari_bp
            FROM nd, pred, tru, tpc, ari
        """,
        # cluster_conflicts: the same closure CTE + per-cluster distinct
        # attribute counts (COUNT(DISTINCT) ignores NULLs — all-null
        # clusters land in the 0 bin both sides).
        "cluster_conflicts": r"""
            WITH RECURSIVE tok AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS w
                FROM documents),
            sh AS (
                SELECT DISTINCT doc_id,
                       w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
                FROM tok, UNNEST(generate_series(1, len(w) - 2)) AS g(i)),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
            ok_sh AS (
                SELECT shingle FROM sh GROUP BY shingle
                HAVING COUNT(*) BETWEEN 2 AND 100),
            cand AS (
                SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                       COUNT(*) AS inter
                FROM sh a JOIN sh b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                WHERE a.shingle IN (SELECT shingle FROM ok_sh)
                GROUP BY a.doc_id, b.doc_id),
            dup AS (
                SELECT c.left_id, c.right_id FROM cand c
                JOIN sizes sa ON sa.doc_id = c.left_id
                JOIN sizes sb ON sb.doc_id = c.right_id
                WHERE c.inter*100 >= (sa.n_sh + sb.n_sh - c.inter)*10),
            edges AS (
                SELECT left_id AS a, right_id AS b FROM dup
                UNION ALL SELECT right_id, left_id FROM dup),
            reach(node, lab) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT e.a, r.lab FROM edges e JOIN reach r ON r.node = e.b),
            cc AS (SELECT node AS doc_id, MIN(lab) AS cluster_id
                   FROM reach GROUP BY node),
            m AS (SELECT cc.cluster_id, d.lang, d.source
                  FROM cc JOIN documents d ON d.doc_id = cc.doc_id),
            per AS (
                SELECT cluster_id, 'lang' AS attr,
                       COUNT(DISTINCT lang) AS nv
                FROM m GROUP BY cluster_id
                UNION ALL
                SELECT cluster_id, 'source', COUNT(DISTINCT source)
                FROM m GROUP BY cluster_id)
            SELECT attr, CAST(nv AS BIGINT) AS n_values,
                   CAST(COUNT(*) AS BIGINT) AS n_clusters
            FROM per GROUP BY 1, 2
        """,
        # canopy_assign: ngram co-occurrence >= t1 pairs (df-capped),
        # centers = no lower neighbor, assignment = lowest covering
        # center, orphans self-assigned.
        "canopy_assign": r"""
            WITH tok AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS w
                FROM documents),
            sh AS (
                SELECT DISTINCT doc_id,
                       w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
                FROM tok, UNNEST(generate_series(1, len(w) - 2)) AS g(i)),
            ok_sh AS (
                SELECT shingle FROM sh GROUP BY shingle
                HAVING COUNT(*) BETWEEN 2 AND 100),
            cand AS (
                SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                       COUNT(*) AS inter
                FROM sh a JOIN sh b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                WHERE a.shingle IN (SELECT shingle FROM ok_sh)
                GROUP BY 1, 2),
            p AS (SELECT left_id, right_id FROM cand WHERE inter >= 3),
            centers AS (
                SELECT doc_id FROM documents
                WHERE doc_id NOT IN (SELECT right_id FROM p)),
            cover AS (
                SELECT right_id AS d, left_id AS c FROM p
                UNION ALL SELECT left_id, right_id FROM p),
            cc AS (
                SELECT d, MIN(c) AS canopy FROM cover
                WHERE c IN (SELECT doc_id FROM centers) GROUP BY d)
            SELECT doc.doc_id,
                   CAST(coalesce(cc.canopy, doc.doc_id) AS BIGINT)
                       AS canopy_id
            FROM documents doc LEFT JOIN cc ON cc.d = doc.doc_id
        """,
        # phonetic_block_pairs: Soundex (h/w-as-vowel variant) via
        # translate + 4 chained replaces per digit (RE2 lacks
        # backreferences; the 10-letter input cap bounds runs so
        # ceil(10/2^4)=1); stop-key blocks > 64 dropped whole.
        "phonetic_block_pairs": f"""
            WITH k AS (
                SELECT doc_id,
                       CASE WHEN s = '' THEN ''
                            ELSE upper(substr(s,1,1)) ||
                                 rpad(substr(replace(substr(code,2),'0',''),
                                             1,3),3,'0')
                       END AS key
                FROM (SELECT doc_id,
                             substr(regexp_replace(lower(coalesce(text,'')),
                                                   '[^a-z]','','g'),
                                    1,10) AS s,
                             {_soundex_sql()} AS code
                      FROM documents)),
            ok AS (
                SELECT key FROM k WHERE key <> ''
                GROUP BY key HAVING COUNT(*) BETWEEN 2 AND 64)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.key
            FROM k a JOIN k b ON a.key = b.key AND a.doc_id < b.doc_id
            WHERE a.key IN (SELECT key FROM ok)
        """,
        # blocking_cascade: the three component laws verbatim, UNION ALL
        # with bit constants, per-pair SUM (== bitwise OR: each blocker
        # emits a pair at most once).
        "blocking_cascade": f"""
            WITH sk AS (SELECT doc_id,
                    substr(regexp_replace(lower(coalesce(text, '')),
                                          '[^a-z0-9]', '', 'g'),
                           1, 16) AS key
                 FROM documents),
            sr AS (SELECT doc_id,
                    row_number() OVER (ORDER BY key, doc_id) AS rn
                   FROM sk),
            p1 AS (SELECT LEAST(a.doc_id, b.doc_id) AS id_a,
                          GREATEST(a.doc_id, b.doc_id) AS id_b
                   FROM sr a JOIN sr b
                     ON b.rn > a.rn AND b.rn <= a.rn + 3),
            ek AS (SELECT doc_id,
                    substr(regexp_replace(lower(coalesce(text, '')),
                                          '[^a-z0-9]', '', 'g'),
                           1, 8) AS key,
                    substr(regexp_replace(lower(coalesce(text, '')),
                                          '[^a-z0-9]', '', 'g'),
                           1, 24) AS s
                 FROM documents),
            eb AS (SELECT *, COUNT(*) OVER (PARTITION BY key) AS bs
                   FROM ek WHERE key != ''),
            p2 AS (SELECT a.doc_id AS id_a, c.doc_id AS id_b
                   FROM eb a JOIN eb c
                     ON a.key = c.key AND a.doc_id < c.doc_id
                   WHERE a.bs <= 64 AND levenshtein(a.s, c.s) <= 2),
            pk AS (SELECT doc_id,
                       CASE WHEN s = '' THEN ''
                            ELSE upper(substr(s,1,1)) ||
                                 rpad(substr(replace(substr(code,2),
                                                     '0',''),1,3),3,'0')
                       END AS key
                   FROM (SELECT doc_id,
                                substr(regexp_replace(
                                    lower(coalesce(text,'')),
                                    '[^a-z]','','g'),1,10) AS s,
                                {_soundex_sql()} AS code
                         FROM documents)),
            pok AS (SELECT key FROM pk WHERE key <> ''
                    GROUP BY key HAVING COUNT(*) BETWEEN 2 AND 64),
            p3 AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                   FROM pk a JOIN pk b
                     ON a.key = b.key AND a.doc_id < b.doc_id
                   WHERE a.key IN (SELECT key FROM pok)),
            u AS (SELECT id_a, id_b, 1 AS bit FROM p1
                  UNION ALL SELECT id_a, id_b, 2 FROM p2
                  UNION ALL SELECT id_a, id_b, 4 FROM p3)
            SELECT id_a, id_b, CAST(SUM(bit) AS BIGINT) AS src_mask
            FROM u GROUP BY 1, 2
        """,
        # group_linkage: distinct item sets per entity; co-occurrence only
        # over items with df <= 35 (stop-item law, both sides); argmax
        # partner by jac_bp = inter*1e4 // (n_self+n_best-inter), partner
        # id breaks ties.  Sizes count ALL items; inter counts survivors.
        "group_linkage": """
            WITH sp AS (
                SELECT DISTINCT l_suppkey AS s, l_partkey AS p
                FROM lineitem
                WHERE l_suppkey IS NOT NULL AND l_partkey IS NOT NULL),
            sizes AS (SELECT s, COUNT(*) AS n FROM sp GROUP BY s),
            ok_p AS (SELECT p FROM sp GROUP BY p HAVING COUNT(*) <= 35),
            cand AS (
                SELECT a.s AS s1, b.s AS s2, COUNT(*) AS inter
                FROM sp a JOIN sp b ON a.p = b.p AND a.s < b.s
                WHERE a.p IN (SELECT p FROM ok_p)
                GROUP BY 1, 2),
            sym AS (SELECT s1 AS s, s2 AS t, inter FROM cand
                    UNION ALL SELECT s2, s1, inter FROM cand),
            scored AS (
                SELECT sym.s, sym.t, sym.inter, x.n AS n_self,
                       y.n AS n_best,
                       sym.inter*10000 // (x.n + y.n - sym.inter) AS jac_bp
                FROM sym
                JOIN sizes x ON x.s = sym.s
                JOIN sizes y ON y.s = sym.t)
            SELECT s AS s_suppkey, t AS best_suppkey,
                   CAST(inter AS BIGINT) AS inter,
                   CAST(n_self AS BIGINT) AS n_self,
                   CAST(n_best AS BIGINT) AS n_best,
                   CAST(jac_bp AS BIGINT) AS jac_bp
            FROM scored
            QUALIFY row_number() OVER (
                PARTITION BY s ORDER BY jac_bp DESC, t) = 1
        """,
        # returned_revenue: TPC-H Q10 shape — per-LINE cents floor (the
        # _cents law, identical IEEE op order), summed per customer over
        # returned items, nation name via left-join coalesce (the Ray
        # side's broadcast-map miss -> '' fill).
        "returned_revenue": """
            WITH rev AS (
                SELECT o.o_custkey AS c_custkey,
                       SUM(CAST(FLOOR(l.l_extendedprice*(1.0 - l.l_discount)*100 + 0.5)
                                AS BIGINT)) AS revenue_c
                FROM lineitem l
                JOIN orders o ON o.o_orderkey = l.l_orderkey
                WHERE l.l_returnflag = 'R'
                GROUP BY o.o_custkey)
            SELECT c.c_custkey,
                   coalesce(c.c_name, '') AS c_name,
                   coalesce(n.n_name, '') AS n_name,
                   CAST(rev.revenue_c AS BIGINT) AS revenue_c
            FROM rev
            JOIN customer c ON c.c_custkey = rev.c_custkey
            LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
            ORDER BY rev.revenue_c DESC, c.c_custkey LIMIT 20
        """,
        # order_priority_counts: TPC-H Q4 shape — EXISTS(shipdate >
        # orderdate + 60 days) == max(shipdate) > cutoff (the Ray fold).
        "order_priority_counts": """
            SELECT coalesce(o_orderpriority, '') AS o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n_late
            FROM orders o
            WHERE EXISTS (
                SELECT 1 FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey
                  AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
            GROUP BY 1
        """,
        # event_transitions: LAG over (user; ts, event_id), row-normalized
        # in basis points over each from_type's outgoing total.
        "event_transitions": """
            WITH t AS (
                SELECT user_id, event_type,
                       lag(event_type) OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev
                FROM events),
            c AS (
                SELECT prev AS from_type, event_type AS to_type,
                       count(*) AS n
                FROM t WHERE prev IS NOT NULL
                GROUP BY 1, 2),
            tot AS (SELECT from_type, sum(n) AS tn FROM c GROUP BY 1)
            SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
                   CAST(c.n * 10000 // greatest(tot.tn, 1) AS BIGINT)
                       AS p_bp
            FROM c JOIN tot ON tot.from_type = c.from_type
        """,
        # fk_violations: three NOT EXISTS probes — the anti-join law.
        "fk_violations": """
            SELECT 'customers_without_orders' AS check_name,
                   CAST((SELECT count(*) FROM customer c
                         WHERE NOT EXISTS (SELECT 1 FROM orders o
                                           WHERE o.o_custkey = c.c_custkey))
                        AS BIGINT) AS n
            UNION ALL
            SELECT 'lineitem_missing_order',
                   CAST((SELECT count(*) FROM lineitem l
                         WHERE NOT EXISTS (SELECT 1 FROM orders o
                                           WHERE o.o_orderkey = l.l_orderkey))
                        AS BIGINT)
            UNION ALL
            SELECT 'orders_missing_customer',
                   CAST((SELECT count(*) FROM orders o
                         WHERE NOT EXISTS (SELECT 1 FROM customer c
                                           WHERE c.c_custkey = o.o_custkey))
                        AS BIGINT)
        """,
        # forecast_revenue (Q6): item cents law floor(ep*disc*100+0.5)
        # with SQL's left-to-right op order; empty selection -> (0, 0).
        "forecast_revenue": """
            SELECT CAST(coalesce(SUM(CAST(floor(
                           l_extendedprice * l_discount * 100 + 0.5)
                       AS BIGINT)), 0) AS BIGINT) AS revenue_c,
                   CAST(COUNT(*) AS BIGINT) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
              AND l_discount >= 0.02 AND l_discount <= 0.04
              AND l_quantity < 25
        """,
        # important_parts (Q11 shape): per-part supplied value for one
        # nation vs 1/frac_den of the global total — strict >, exact
        # integer cross-multiplication, line cents law floor(ep*100+.5).
        "important_parts": """
            WITH lv AS (
                SELECT l_partkey AS p_partkey,
                       SUM(CAST(floor(l_extendedprice * 100 + 0.5)
                                AS BIGINT)) AS value_c
                FROM lineitem l
                JOIN supplier s ON s.s_suppkey = l.l_suppkey
                JOIN nation n ON n.n_nationkey = s.s_nationkey
                WHERE n.n_name = 'NATION_3'
                GROUP BY 1)
            SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
                   CAST(value_c AS BIGINT) AS value_c
            FROM lv
            WHERE value_c * 1000 >
                  (SELECT coalesce(SUM(value_c), 0) FROM lv)
        """,
        # excess_shippers (Q20 shape): strict majority 2*qty > total
        # per part over the in-year, name-prefix family; quantities are
        # whole by construction -> CAST BIGINT both sides.
        "excess_shippers": """
            WITH pf AS (SELECT p_partkey FROM part
                        WHERE p_name LIKE 'blue%'),
            lq AS (SELECT l_partkey, l_suppkey,
                          SUM(CAST(l_quantity AS BIGINT)) AS qty
                   FROM lineitem
                   WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                     AND l_shipdate <  TIMESTAMP '1997-01-01'
                     AND l_partkey IN (SELECT p_partkey FROM pf)
                   GROUP BY 1, 2),
            tot AS (SELECT l_partkey, SUM(qty) AS t FROM lq GROUP BY 1),
            dom AS (SELECT lq.l_suppkey, lq.l_partkey
                    FROM lq JOIN tot ON tot.l_partkey = lq.l_partkey
                    WHERE 2 * lq.qty > tot.t),
            cnt AS (SELECT l_suppkey, COUNT(*) AS n_parts FROM dom
                    GROUP BY 1)
            SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey,
                   s.s_name,
                   CAST(cnt.n_parts AS BIGINT) AS n_parts
            FROM cnt JOIN supplier s ON s.s_suppkey = cnt.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            WHERE n.n_name = 'NATION_3'
        """,
        # cluster_split_merge: same closure + fingerprint recipe as
        # cluster_pair_eval; splits/merges are cell-table identities.
        "cluster_split_merge": r"""
            WITH RECURSIVE tok AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS w
                FROM documents),
            sh AS (
                SELECT DISTINCT doc_id,
                       w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
                FROM tok, UNNEST(generate_series(1, len(w) - 2)) AS g(i)),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh
                      GROUP BY doc_id),
            ok_sh AS (
                SELECT shingle FROM sh GROUP BY shingle
                HAVING COUNT(*) BETWEEN 2 AND 100),
            cand AS (
                SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                       COUNT(*) AS inter
                FROM sh a JOIN sh b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                WHERE a.shingle IN (SELECT shingle FROM ok_sh)
                GROUP BY a.doc_id, b.doc_id),
            dup AS (
                SELECT c.left_id, c.right_id FROM cand c
                JOIN sizes sa ON sa.doc_id = c.left_id
                JOIN sizes sb ON sb.doc_id = c.right_id
                WHERE c.inter*100 >= (sa.n_sh + sb.n_sh - c.inter)*10),
            edges AS (
                SELECT left_id AS a, right_id AS b FROM dup
                UNION ALL SELECT right_id, left_id FROM dup),
            reach(node, lab) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT e.a, r.lab FROM edges e JOIN reach r
                    ON r.node = e.b),
            cc AS (SELECT node AS doc_id, MIN(lab) AS cluster_id
                   FROM reach GROUP BY node),
            fp AS (SELECT doc_id,
                          md5(regexp_replace(lower(coalesce(text, '')),
                                             '[^a-z0-9]', '', 'g')) AS f
                   FROM documents),
            m AS (SELECT cc.cluster_id, fp.f
                  FROM cc JOIN fp ON fp.doc_id = cc.doc_id),
            s AS (SELECT COUNT(*) AS n_docs,
                         COUNT(DISTINCT cluster_id) AS n_clusters,
                         COUNT(DISTINCT f) AS n_fps
                  FROM m),
            ce AS (SELECT COUNT(*) AS n_cells
                   FROM (SELECT DISTINCT cluster_id, f FROM m))
            SELECT CAST(n_docs AS BIGINT) AS n_docs,
                   CAST(n_clusters AS BIGINT) AS n_clusters,
                   CAST(n_fps AS BIGINT) AS n_fps,
                   CAST(n_cells AS BIGINT) AS n_cells,
                   CAST(n_cells - n_clusters AS BIGINT)
                       AS n_splits_needed,
                   CAST(n_cells - n_fps AS BIGINT) AS n_merges_needed
            FROM s, ce
        """,
        # block_filtering_pairs: meta_blocking's trigram blocks + df
        # purge, per-record quota rn <= ceil(n*ratio) ranked (df ASC,
        # token ASC), pairs through blocks both sides kept.
        "block_filtering_pairs": r"""
            WITH tok AS (SELECT doc_id,
                    regexp_extract_all(lower(coalesce(text, '')),
                                       '\S+') AS tl
                 FROM documents),
            dt AS (SELECT DISTINCT doc_id,
                    tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2] AS t
                   FROM tok, unnest(range(1, len(tl) - 1)) AS u(i)),
            df AS (SELECT t, COUNT(*) c FROM dt GROUP BY t
                   HAVING c BETWEEN 2 AND 100),
            bd AS (SELECT dt.doc_id, dt.t, df.c
                   FROM dt JOIN df USING (t)),
            rk AS (SELECT doc_id, t,
                          ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY c, t) AS rn,
                          COUNT(*) OVER (PARTITION BY doc_id) AS n
                   FROM bd),
            keep AS (SELECT doc_id, t FROM rk
                     WHERE rn * 10000 <= n * 5000 + 9999)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(COUNT(*) AS BIGINT) AS w
            FROM keep a JOIN keep b
              ON a.t = b.t AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        """,
        # greedy_one_to_one: bounded-rounds unroll of mutual-best
        # elimination over the shared FS scored-pair law.
        "greedy_one_to_one": _greedy_one_to_one_oracle(3),
        # doc_novelty: the ngram_jaccard shingle law; df==1 fraction in
        # floor bp; docs with zero shingles emit nothing (inner join).
        "doc_novelty": r"""
            WITH tok AS (SELECT doc_id,
                    regexp_split_to_array(lower(trim(text)), '\s+') AS w
                 FROM documents),
            sh AS (SELECT DISTINCT doc_id,
                    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
                   FROM tok,
                        UNNEST(generate_series(1, len(w) - 2)) AS g(i)),
            df AS (SELECT s, COUNT(*) AS c FROM sh GROUP BY 1)
            SELECT CAST(sh.doc_id AS BIGINT) AS doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_grams,
                   CAST(SUM(CASE WHEN df.c = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_novel,
                   CAST(SUM(CASE WHEN df.c = 1 THEN 1 ELSE 0 END)
                        * 10000 // COUNT(*) AS BIGINT) AS novelty_bp
            FROM sh JOIN df USING (s)
            GROUP BY sh.doc_id
        """,
        # min_cost_supplier (Q2 shape): per-line unit-cost law
        # floor(ep/qty*100+0.5), MIN per (part,supp), correlated per-
        # part MIN with ALL ties kept, region suppliers only.
        "min_cost_supplier": """
            WITH pf AS (SELECT p_partkey FROM part
                        WHERE p_size <= 10 AND p_type = 'ECONOMY'),
            rs AS (SELECT s_suppkey, s_name FROM supplier s
                   JOIN nation n ON n.n_nationkey = s.s_nationkey
                   JOIN region r ON r.r_regionkey = n.n_regionkey
                   WHERE r.r_name = 'EUROPE'),
            lu AS (SELECT l_partkey, l_suppkey,
                          MIN(CAST(floor(l_extendedprice / l_quantity
                                         * 100 + 0.5) AS BIGINT))
                              AS ucost_c
                   FROM lineitem
                   WHERE l_partkey IN (SELECT p_partkey FROM pf)
                     AND l_suppkey IN (SELECT s_suppkey FROM rs)
                   GROUP BY 1, 2),
            mn AS (SELECT l_partkey, MIN(ucost_c) AS m FROM lu
                   GROUP BY 1)
            SELECT CAST(lu.l_partkey AS BIGINT) AS p_partkey,
                   CAST(lu.l_suppkey AS BIGINT) AS s_suppkey,
                   rs.s_name,
                   lu.ucost_c
            FROM lu JOIN mn ON mn.l_partkey = lu.l_partkey
                           AND lu.ucost_c = mn.m
            JOIN rs ON rs.s_suppkey = lu.l_suppkey
        """,
        # source_dup_matrix: the shared tau-10 near-dup pair law, both
        # sources attached, unordered (LEAST/GREATEST) matrix counts.
        "source_dup_matrix": f"""
            WITH p AS ({_ngram_jaccard_oracle(10)}),
            s AS (SELECT doc_id, coalesce(source, '') AS src
                  FROM documents),
            x AS (SELECT LEAST(sa.src, sb.src) AS src_a,
                         GREATEST(sa.src, sb.src) AS src_b
                  FROM p JOIN s sa ON sa.doc_id = p.left_id
                         JOIN s sb ON sb.doc_id = p.right_id)
            SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS n_dup_pairs
            FROM x GROUP BY 1, 2
        """,
        # shingle_df_hist: the ngram_jaccard shingle law; histogram of
        # per-shingle document frequencies.
        "shingle_df_hist": r"""
            WITH tok AS (SELECT doc_id,
                    regexp_split_to_array(lower(trim(text)), '\s+') AS w
                 FROM documents),
            sh AS (SELECT DISTINCT doc_id,
                    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
                   FROM tok,
                        UNNEST(generate_series(1, len(w) - 2)) AS g(i)),
            df AS (SELECT s, COUNT(*) AS c FROM sh GROUP BY 1)
            SELECT CAST(c AS BIGINT) AS df,
                   CAST(COUNT(*) AS BIGINT) AS n_shingles
            FROM df GROUP BY 1
        """,
        # weighted_jaccard_pairs: idf weight length(bin(N//df)), doc
        # weights over ALL shingles, pairing through df in [2,100]
        # only, integer cross-multiplied tau-30 threshold.
        "weighted_jaccard_pairs": r"""
            WITH tok AS (SELECT doc_id,
                    regexp_split_to_array(lower(trim(text)), '\s+') AS w
                 FROM documents),
            sh AS (SELECT DISTINCT doc_id,
                    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
                   FROM tok,
                        UNNEST(generate_series(1, len(w) - 2)) AS g(i)),
            dft AS (SELECT s, COUNT(*) AS c FROM sh GROUP BY 1),
            nd AS (SELECT COUNT(*) AS n FROM documents),
            wt AS (SELECT s, c, length(bin(n // c)) AS w FROM dft, nd),
            dw AS (SELECT sh.doc_id, SUM(wt.w) AS tw
                   FROM sh JOIN wt USING (s) GROUP BY 1),
            pr AS (SELECT a.doc_id AS la, b.doc_id AS rb,
                          SUM(wt.w) AS iw
                   FROM sh a JOIN sh b
                     ON a.s = b.s AND a.doc_id < b.doc_id
                   JOIN wt ON wt.s = a.s
                   WHERE wt.c BETWEEN 2 AND 100
                   GROUP BY 1, 2)
            SELECT CAST(la AS BIGINT) AS left_id,
                   CAST(rb AS BIGINT) AS right_id,
                   CAST(iw AS BIGINT) AS inter_w,
                   CAST(da.tw AS BIGINT) AS w_left,
                   CAST(db.tw AS BIGINT) AS w_right
            FROM pr JOIN dw da ON da.doc_id = la
                    JOIN dw db ON db.doc_id = rb
            WHERE iw * 100 >= 30 * (da.tw + db.tw - iw)
        """,
        # cluster_homogeneity: same closure + fingerprint recipe as
        # cluster_split_merge; bit-entropy law c*(length(bin(n//c))-1).
        "cluster_homogeneity": r"""
            WITH RECURSIVE tok AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS w
                FROM documents),
            sh AS (
                SELECT DISTINCT doc_id,
                       w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
                FROM tok, UNNEST(generate_series(1, len(w) - 2)) AS g(i)),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh
                      GROUP BY doc_id),
            ok_sh AS (
                SELECT shingle FROM sh GROUP BY shingle
                HAVING COUNT(*) BETWEEN 2 AND 100),
            cand AS (
                SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                       COUNT(*) AS inter
                FROM sh a JOIN sh b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                WHERE a.shingle IN (SELECT shingle FROM ok_sh)
                GROUP BY a.doc_id, b.doc_id),
            dup AS (
                SELECT c.left_id, c.right_id FROM cand c
                JOIN sizes sa ON sa.doc_id = c.left_id
                JOIN sizes sb ON sb.doc_id = c.right_id
                WHERE c.inter*100 >= (sa.n_sh + sb.n_sh - c.inter)*10),
            edges AS (
                SELECT left_id AS a, right_id AS b FROM dup
                UNION ALL SELECT right_id, left_id FROM dup),
            reach(node, lab) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT e.a, r.lab FROM edges e JOIN reach r
                    ON r.node = e.b),
            cc AS (SELECT node AS doc_id, MIN(lab) AS cluster_id
                   FROM reach GROUP BY node),
            fp AS (SELECT doc_id,
                          md5(regexp_replace(lower(coalesce(text, '')),
                                             '[^a-z0-9]', '', 'g')) AS f
                   FROM documents),
            cells AS (SELECT cc.cluster_id, fp.f, COUNT(*) AS c
                      FROM cc JOIN fp ON fp.doc_id = cc.doc_id
                      GROUP BY 1, 2),
            nd AS (SELECT SUM(c) AS n FROM cells),
            cl AS (SELECT cluster_id, SUM(c) AS nk FROM cells
                   GROUP BY 1),
            fm AS (SELECT f, SUM(c) AS nf FROM cells GROUP BY 1),
            ct AS (SELECT SUM(c * (length(bin(cl.nk // c)) - 1)) AS v
                   FROM cells JOIN cl USING (cluster_id)),
            cp AS (SELECT SUM(c * (length(bin(fm.nf // c)) - 1)) AS v
                   FROM cells JOIN fm USING (f)),
            ht AS (SELECT SUM(nf * (length(bin(nd.n // nf)) - 1)) AS v
                   FROM fm, nd),
            hp AS (SELECT SUM(nk * (length(bin(nd.n // nk)) - 1)) AS v
                   FROM cl, nd)
            SELECT CAST(coalesce(nd.n, 0) AS BIGINT) AS n_docs,
                   CAST(ht.v AS BIGINT) AS h_truth_bits,
                   CAST(hp.v AS BIGINT) AS h_pred_bits,
                   CAST(ct.v AS BIGINT) AS cond_truth_bits,
                   CAST(cp.v AS BIGINT) AS cond_pred_bits,
                   CAST(CASE WHEN ht.v IS NULL THEN NULL
                             WHEN ht.v = 0 THEN 10000
                             ELSE (ht.v - ct.v) * 10000 // ht.v
                        END AS BIGINT) AS homogeneity_bp,
                   CAST(CASE WHEN hp.v IS NULL THEN NULL
                             WHEN hp.v = 0 THEN 10000
                             ELSE (hp.v - cp.v) * 10000 // hp.v
                        END AS BIGINT) AS completeness_bp
            FROM nd, ct, cp, ht, hp
        """,
        # cohort_retention: user_retention's epoch-week law; cohort =
        # per-user MIN week; offsets capped at 8.
        "cohort_retention": """
            WITH uw AS (SELECT DISTINCT user_id,
                    CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS week
                 FROM events),
            f AS (SELECT user_id, MIN(week) AS cw FROM uw GROUP BY 1)
            SELECT f.cw AS cohort_week,
                   CAST(uw.week - f.cw AS BIGINT) AS "offset",
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM uw JOIN f USING (user_id)
            WHERE uw.week - f.cw <= 8
            GROUP BY 1, 2
        """,
        # containment_keep: ngram candidate law (tau 0); drop a side
        # when inter covers tau-80 of it and the partner outranks it
        # (more shingles; equal sizes -> lower id survives).
        "containment_keep": r"""
            WITH tok AS (SELECT doc_id,
                    regexp_split_to_array(lower(trim(text)), '\s+') AS w
                 FROM documents),
            sh AS (SELECT DISTINCT doc_id,
                    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
                   FROM tok,
                        UNNEST(generate_series(1, len(w) - 2)) AS g(i)),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh
                      GROUP BY 1),
            ok_sh AS (SELECT s FROM sh GROUP BY s
                      HAVING COUNT(*) BETWEEN 2 AND 100),
            cand AS (SELECT a.doc_id AS l, b.doc_id AS r,
                            COUNT(*) AS inter
                     FROM sh a JOIN sh b
                       ON a.s = b.s AND a.doc_id < b.doc_id
                     WHERE a.s IN (SELECT s FROM ok_sh)
                     GROUP BY 1, 2),
            drp AS (
              SELECT c.l AS d FROM cand c
              JOIN sizes sa ON sa.doc_id = c.l
              JOIN sizes sb ON sb.doc_id = c.r
              WHERE c.inter*100 >= 80*sa.n_sh AND sb.n_sh > sa.n_sh
              UNION
              SELECT c.r FROM cand c
              JOIN sizes sa ON sa.doc_id = c.l
              JOIN sizes sb ON sb.doc_id = c.r
              WHERE c.inter*100 >= 80*sb.n_sh AND sa.n_sh >= sb.n_sh)
            SELECT doc_id,
                   CAST(CASE WHEN doc_id IN (SELECT d FROM drp)
                        THEN 0 ELSE 1 END AS BIGINT) AS keep
            FROM documents
        """,
        # order_gap_median: LAG day gaps per customer; median = the
        # peers-inclusive rank*2 >= n law; same-day repeats give 0 gaps.
        "order_gap_median": """
            WITH o2 AS (SELECT o_custkey,
                    CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)
                        AS d
                 FROM orders),
            g AS (SELECT o_custkey,
                         d - LAG(d) OVER (PARTITION BY o_custkey
                                          ORDER BY d) AS gap
                  FROM o2),
            r AS (SELECT o_custkey, gap,
                         ROW_NUMBER() OVER (PARTITION BY o_custkey
                             ORDER BY gap) AS rn,
                         COUNT(*) OVER (PARTITION BY o_custkey) AS n
                  FROM g WHERE gap IS NOT NULL)
            SELECT o_custkey AS c_custkey,
                   CAST(MAX(n) + 1 AS BIGINT) AS n_orders,
                   CAST(MIN(CASE WHEN rn*2 >= n THEN gap END)
                        AS BIGINT) AS median_gap_days
            FROM r GROUP BY 1
        """,
        # basket_lift: basket_pairs' DISTINCT-per-order law; lift in
        # HUGEINT (cnt*N*1e6 overflows int64 at warehouse scale).
        "basket_lift": """
            WITH dp AS (SELECT DISTINCT l_orderkey, l_partkey
                        FROM lineitem),
            pc2 AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2,
                           COUNT(*) AS cnt
                    FROM dp a JOIN dp b
                      ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey < b.l_partkey
                    GROUP BY 1, 2),
            top AS (SELECT p1, p2, cnt,
                           ROW_NUMBER() OVER (ORDER BY cnt DESC, p1, p2)
                               AS rank
                    FROM pc2 QUALIFY rank <= 20),
            m AS (SELECT l_partkey, COUNT(*) AS c FROM dp GROUP BY 1),
            n AS (SELECT COUNT(DISTINCT l_orderkey) AS nn FROM dp)
            SELECT CAST(rank AS BIGINT) AS rank,
                   CAST(p1 AS BIGINT) AS p1,
                   CAST(p2 AS BIGINT) AS p2,
                   CAST(cnt AS BIGINT) AS cnt,
                   CAST(ma.c AS BIGINT) AS n_a,
                   CAST(mb.c AS BIGINT) AS n_b,
                   CAST(cnt * 10000 // ma.c AS BIGINT) AS conf_ab_bp,
                   CAST(cnt * 10000 // mb.c AS BIGINT) AS conf_ba_bp,
                   CAST(CAST(cnt AS HUGEINT) * nn * 1000000
                        // (CAST(ma.c AS HUGEINT) * mb.c)
                        AS BIGINT) AS lift_ppm
            FROM top JOIN m ma ON ma.l_partkey = top.p1
                     JOIN m mb ON mb.l_partkey = top.p2, n
        """,
        # fact_key_skew: exact top-k heaviest lineitem orderkeys,
        # (n_rows DESC, key) rank.
        "fact_key_skew": """
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_rows DESC,
                                           l_orderkey) AS BIGINT)
                       AS rank,
                   CAST(l_orderkey AS BIGINT) AS l_orderkey,
                   CAST(n_rows AS BIGINT) AS n_rows
            FROM (SELECT l_orderkey, COUNT(*) AS n_rows FROM lineitem
                  GROUP BY 1)
            QUALIFY rank <= 20
        """,
        # k_anonymity: quasi-id (lang, source, n_chars//256), NULLs
        # read as '' groups, risk = class size < 5.
        "k_anonymity": """
            WITH q AS (SELECT coalesce(lang, '') AS lang,
                              coalesce(source, '') AS src,
                              n_chars // 256 AS bin
                       FROM documents),
            g AS (SELECT lang, src, bin, COUNT(*) AS c FROM q
                  GROUP BY 1, 2, 3)
            SELECT CAST(coalesce(SUM(c), 0) AS BIGINT) AS n_records,
                   CAST(COUNT(*) AS BIGINT) AS n_groups,
                   CAST(coalesce(SUM(CASE WHEN c < 5 THEN 1 ELSE 0 END),
                                 0) AS BIGINT) AS n_risk_groups,
                   CAST(coalesce(SUM(CASE WHEN c < 5 THEN c ELSE 0 END),
                                 0) AS BIGINT) AS n_risk_records,
                   CAST(coalesce(MAX(c), 0) AS BIGINT) AS max_group
            FROM g
        """,
        # new_vs_returning: the cohort week law; new = week == per-user
        # MIN week.
        "new_vs_returning": """
            WITH uw AS (SELECT DISTINCT user_id,
                    CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS week
                 FROM events),
            f AS (SELECT user_id, MIN(week) AS fw FROM uw GROUP BY 1)
            SELECT uw.week,
                   CAST(SUM(CASE WHEN uw.week = f.fw THEN 1 ELSE 0 END)
                        AS BIGINT) AS new_users,
                   CAST(SUM(CASE WHEN uw.week <> f.fw THEN 1 ELSE 0 END)
                        AS BIGINT) AS returning_users
            FROM uw JOIN f USING (user_id)
            GROUP BY 1
        """,
        # dedup_impact: the dedup_keep_list closure + RE2 \S+ token
        # counts; floor-bp drop rates, NULL on an empty corpus.
        "dedup_impact": r"""
            WITH RECURSIVE tok AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS w
                FROM documents),
            sh AS (
                SELECT DISTINCT doc_id,
                       w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
                FROM tok, UNNEST(generate_series(1, len(w) - 2)) AS g(i)),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh
                      GROUP BY doc_id),
            ok_sh AS (
                SELECT shingle FROM sh GROUP BY shingle
                HAVING COUNT(*) BETWEEN 2 AND 100),
            cand AS (
                SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                       COUNT(*) AS inter
                FROM sh a JOIN sh b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                WHERE a.shingle IN (SELECT shingle FROM ok_sh)
                GROUP BY a.doc_id, b.doc_id),
            dup AS (
                SELECT c.left_id, c.right_id FROM cand c
                JOIN sizes sa ON sa.doc_id = c.left_id
                JOIN sizes sb ON sb.doc_id = c.right_id
                WHERE c.inter*100 >= (sa.n_sh + sb.n_sh - c.inter)*10),
            edges AS (
                SELECT left_id AS a, right_id AS b FROM dup
                UNION ALL SELECT right_id, left_id FROM dup),
            reach(node, lab) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT e.a, r.lab FROM edges e JOIN reach r
                    ON r.node = e.b),
            cc AS (SELECT node AS doc_id, MIN(lab) AS cluster_id
                   FROM reach GROUP BY node),
            tw AS (SELECT doc_id,
                          len(regexp_extract_all(coalesce(text, ''),
                                                 '\S+')) AS nw
                   FROM documents),
            s AS (SELECT COUNT(*) AS nd,
                         COALESCE(SUM(CASE WHEN cc.doc_id =
                                      cc.cluster_id THEN 1 ELSE 0 END),
                                  0) AS nk,
                         COALESCE(SUM(tw.nw), 0) AS nt,
                         COALESCE(SUM(CASE WHEN cc.doc_id =
                                      cc.cluster_id THEN tw.nw
                                      ELSE 0 END), 0) AS ntk
                  FROM cc JOIN tw USING (doc_id))
            SELECT CAST(nd AS BIGINT) AS n_docs,
                   CAST(nk AS BIGINT) AS n_docs_kept,
                   CAST(nt AS BIGINT) AS n_tokens,
                   CAST(ntk AS BIGINT) AS n_tokens_kept,
                   CAST(CASE WHEN nd = 0 THEN NULL
                        ELSE (nd - nk) * 10000 // nd END AS BIGINT)
                       AS doc_drop_bp,
                   CAST(CASE WHEN nt = 0 THEN NULL
                        ELSE (nt - ntk) * 10000 // nt END AS BIGINT)
                       AS token_drop_bp
            FROM s
        """,
    }
