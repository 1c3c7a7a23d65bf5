"""End-to-end linkage pipelines (SURVEY.md §3.4).

Two flows:

* :func:`self_link_docs` — the flagship: interleaved docs → extract →
  normalize (actor pool) → block (salted groupby shuffle) → score (actor
  pool) → cluster (iterative min-label propagation).  Wave-partitioned and
  resumable via :mod:`..state.checkpoint`.
* :func:`link_query_base` — the reference CLI semantics (matcher.py:399-409):
  an arbitrary query table vs a small base table; the base side is normalized
  once, block-indexed, broadcast through the object store (``ray.put``), and
  probed inside an actor-pool ``map_batches`` — no shuffle at all (the Ray
  translation of the reference's fork-shared global ``base_``).
"""

from __future__ import annotations

import time

import pyarrow as pa

from ..stages.blocking import ExplodeToPairBlocks, compute_hot_keys_multi
from ..stages.cluster import connected_components
from ..stages.extract import extract_names
from ..stages.normalize_stage import normalize_names
from ..stages.scoring import score_pairs
from ..state.checkpoint import Manifest, atomic_dir_write


_EMPTY_PAIRS = pa.table({
    "left_doc_id": pa.array([], pa.string()),
    "right_doc_id": pa.array([], pa.string()),
    "block_key": pa.array([], pa.string()),
    "rule_code": pa.array([], pa.int32()),
    "score": pa.array([], pa.float32()),
})


def build_names(docs_ds, *, remove_people: bool = False, concurrency=(1, 8),
                max_name_tokens: int | None = None):
    """docs -> normalized name records (spans carried verbatim)."""
    return normalize_names(
        extract_names(docs_ds, max_name_tokens=max_name_tokens),
        remove_people=remove_people, concurrency=concurrency,
    )


def matched_pairs(names_ds, *, cap: int = 200, max_shards: int = 16,
                  concurrency=(1, 8), fused: bool = True):
    """names -> matched pairs.

    ``fused=True`` (default): candidate emission + cascade scoring run
    inside the blocking groupby's reduce tasks — one shuffle, and the wide
    candidate table never enters the object store.  ``fused=False`` keeps
    the two-stage variant (emit → shuffle → actor-pool scoring), useful when
    the candidate table itself must be checkpointed.  Outputs are identical
    (pytest-checked).
    """
    from ..stages.blocking import candidate_pairs, fused_match_pairs

    if fused:
        return fused_match_pairs(names_ds, cap=cap, max_shards=max_shards)
    cands = candidate_pairs(names_ds, cap=cap, max_shards=max_shards)
    return score_pairs(cands, concurrency=concurrency)


def self_link_docs(docs_ds, *, cap: int = 200, concurrency=(1, 8),
                   max_iters: int = 25, max_name_tokens: int | None = None):
    """Full in-memory flagship flow; returns (names_ds, pairs_ds, clusters_ds)."""
    names = build_names(docs_ds, concurrency=concurrency,
                        max_name_tokens=max_name_tokens)
    pairs = matched_pairs(names, cap=cap, concurrency=concurrency)
    clusters = connected_components(
        pairs, names.select_columns(["doc_id"]), max_iters=max_iters
    )
    return names, pairs, clusters


# ---------------------------------------------------------------------------
# Checkpointed, wave-partitioned variant (resume mid-shuffle)
# ---------------------------------------------------------------------------

def run_linkage_checkpointed(docs_path: str, out_dir: str, *, n_waves: int = 8,
                             cap: int = 200, max_shards: int = 16,
                             concurrency=(1, 8)) -> dict:
    """Resumable flagship run: skips waves already recorded in the manifest.

    Layout under ``out_dir``:
      names/              normalized name records (stage checkpoint)
      exploded/wave={w}/  pair-block replicas, written ONCE partitioned by
                          wave = hash(block key) % n_waves (the old loop
                          re-ran explode+filter over all names per wave —
                          n_waves× redundant work)
      pairs/wave-{w}/     matched pairs of wave w
      clusters/           final (doc_id, cluster_id)
      manifest.json       per-partition lineage + metrics
    """
    import ray
    import ray.data

    man = Manifest(out_dir)
    t0 = time.time()

    # stage checkpoint: normalize once, reuse across waves/resumes
    names_dir = f"{out_dir}/names"
    if not man.is_complete("names"):
        docs = ray.data.read_parquet(docs_path)
        names = build_names(docs, concurrency=concurrency)
        atomic_dir_write(names_dir, lambda p: names.write_parquet(p))
        n_names = ray.data.read_parquet(names_dir).count()
        man.mark_complete(
            "names",
            lineage={"input": docs_path},
            metrics={"rows": n_names, "wall_sec": round(time.time() - t0, 3)},
        )

    names = ray.data.read_parquet(names_dir)
    hot_first, hot_last = compute_hot_keys_multi(
        names, ["block_key", "block_key_last"], cap
    )

    dropped_first = frozenset(k for k, s in hot_first.items() if s > max_shards)

    from ..stages.blocking import _score_bucket_groups
    from ..state.metrics import get_metrics_actor

    # explode ONCE, wave-partitioned parquet (stage checkpoint)
    exploded_dir = f"{out_dir}/exploded"
    explode_config = {"n_waves": n_waves, "cap": cap, "max_shards": max_shards}
    if man.is_complete("exploded"):
        # a completed explode built under DIFFERENT salt/wave parameters
        # would silently disagree with the hot-key decisions recomputed
        # above (duplicated or lost pairs in the secondary pass)
        lin = man.data["partitions"]["exploded"].get("lineage", {})
        got = {k: lin.get(k) for k in explode_config}
        if got != explode_config:
            raise ValueError(
                f"resume mismatch: exploded/ was built with {got} but this "
                f"run wants {explode_config}; delete {exploded_dir} (and the "
                "manifest entries) or rerun with the original parameters"
            )
    else:
        te = time.time()
        metrics_actor = get_metrics_actor()
        ray.get(metrics_actor.reset.remote())
        exploded = names.map_batches(
            ExplodeToPairBlocks,
            fn_constructor_kwargs={
                "hot_first": hot_first,
                "hot_last": hot_last,
                "max_shards": max_shards,
                "n_buckets": 1024,
                "n_waves": n_waves,
                "metrics": True,
            },
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        atomic_dir_write(
            exploded_dir,
            lambda p: exploded.write_parquet(p, partition_cols=["wave"]),
        )
        counters = ray.get(metrics_actor.get_all.remote())
        man.mark_complete(
            "exploded",
            lineage={"input": names_dir, **explode_config},
            metrics={"wall_sec": round(time.time() - te, 3),
                     "rows_dropped_stop_keys":
                         int(counters.get("rows_dropped_stop_keys", 0)),
                     # which waves hold rows — resume branches on this, not
                     # on a local-filesystem probe (URI-style storage would
                     # silently yield zero pairs for every wave)
                     "wave_rows": {
                         str(w): int(counters.get(f"wave_rows_{w}", 0))
                         for w in range(n_waves)
                     }},
        )

    wave_rows = man.data["partitions"]["exploded"]["metrics"].get("wave_rows")
    for w in range(n_waves):
        pid = f"pairs/wave-{w}"
        if man.is_complete(pid):
            continue
        tw = time.time()
        wave_dir = f"{exploded_dir}/wave={w}"
        import os

        metrics_actor = get_metrics_actor()
        ray.get(metrics_actor.reset.remote())
        wave_nonempty = (wave_rows[str(w)] > 0 if wave_rows is not None
                         else os.path.isdir(wave_dir))  # legacy manifests
        if wave_nonempty:
            in_wave = ray.data.read_parquet(wave_dir)
            # fused emit+score in the reduce (see blocking.fused_match_pairs).
            # Reduce-task parallelism follows the input block count; 128
            # blocks smooths the per-bucket pair skew inside a wave (one
            # hot bucket otherwise strands the wave on a few reduce tasks)
            pairs = in_wave.repartition(128).groupby("bucket").map_groups(
                lambda g: _score_bucket_groups(g, False, True, dropped_first),
                batch_format="pandas",
            )
        else:  # no block key hashed into this wave
            pairs = ray.data.from_arrow(_EMPTY_PAIRS)
        atomic_dir_write(f"{out_dir}/{pid}", lambda p: pairs.write_parquet(p))
        n_pairs = ray.data.read_parquet(f"{out_dir}/{pid}").count()
        counters = ray.get(metrics_actor.get_all.remote())
        man.mark_complete(
            pid,
            lineage={"input": f"exploded/wave={w}", "wave": w,
                     "n_waves": n_waves, "cap": cap, "max_shards": max_shards},
            metrics={"pairs_matched": n_pairs,
                     "pairs_scored": int(counters.get("pairs_scored", 0)),
                     "wall_sec": round(time.time() - tw, 3)},
        )

    # clustering over all waves
    if not man.is_complete("clusters"):
        tc = time.time()
        # parent dir (recursive): a list of directories is not a valid
        # read_parquet input (pyarrow dataset requires file paths in list form)
        pairs_all = ray.data.read_parquet(f"{out_dir}/pairs")
        nodes = ray.data.read_parquet(names_dir, columns=["doc_id"])
        clusters = connected_components(pairs_all, nodes)
        atomic_dir_write(f"{out_dir}/clusters", lambda p: clusters.write_parquet(p))
        n_rows = ray.data.read_parquet(f"{out_dir}/clusters").count()
        man.mark_complete(
            "clusters",
            lineage={"input": [f"pairs/wave-{w}" for w in range(n_waves)]},
            metrics={"rows": n_rows, "wall_sec": round(time.time() - tc, 3)},
        )
    return {p: man.data["partitions"][p]["metrics"] for p in man.completed_partitions()}


# ---------------------------------------------------------------------------
# Person-match post-filter (postproc-ppl.py:3-26 semantics)
# ---------------------------------------------------------------------------

class _PersonMatchFilter:
    """Actor: drop matched rows whose query name is person-shaped.

    Faithful to postproc-ppl.py: (1) regex ``^\\w{4,} \\w\\. \\w{4,}$`` on the
    RAW name drops 'First M. Last' shapes (postproc-ppl.py:4-5); (2) ``pp``:
    if every ``[\\w\\d]+`` token lowercases into surname∪firstname, drop
    (postproc-ppl.py:15-24).
    """

    def __init__(self, name_col: str = "query_name"):
        import re

        from ..functions.assets import load_assets

        a = load_assets()
        self.allname = a.person_names
        self.shape = re.compile(r"^\w{4,} \w\. \w{4,}$")
        self.tok = re.compile(r"[\w\d]+")
        self.name_col = name_col

    def _is_person(self, s: str) -> bool:
        if self.shape.match(s or ""):
            return True
        toks = self.tok.findall(s or "")
        # zero-token names: pp() returns 1 (drop) — postproc-ppl.py:16-24's
        # all() over an empty token list is vacuously True
        return all(t.lower() in self.allname for t in toks)

    def __call__(self, batch: pa.Table) -> pa.Table:
        names = batch.column(self.name_col).to_pylist()
        return batch.filter(pa.array([not self._is_person(n) for n in names]))


def filter_person_matches(pairs_ds, *, name_col: str = "query_name",
                          concurrency=(1, 4)):
    """Tail filter fused into the pipeline (no re-read of the output file,
    unlike the reference's read→filter→overwrite of __coname__.csv)."""
    return pairs_ds.map_batches(
        _PersonMatchFilter,
        fn_constructor_kwargs={"name_col": name_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# Pre-paired candidate scoring (match_pair.py semantics — no shuffle at all)
# ---------------------------------------------------------------------------

class _ScorePrepaired:
    """Actor: normalize + gate + cascade for already-paired raw names
    (match_pair.py:19-37: preprocess both sides, ``match() > 0`` emits)."""

    def __init__(self):
        from ..functions.normalize import Normalizer
        from ..functions.rules import Matcher

        self.norm = Normalizer()
        self.matcher = Matcher()

    def __call__(self, batch: pa.Table) -> pa.Table:
        names_a = batch.column("name_a").to_pylist()
        names_b = batch.column("name_b").to_pylist()
        cache: dict[str, str | None] = {}  # chunk-local dedup (match_pair.py:28-30)

        def pre(raw):
            if raw not in cache:
                cache[raw] = self.norm.preprocess(raw, remove_people=True)
            return cache[raw]

        import numpy as np

        from ..stages.blocking import _vector_precascade

        # no token-set gate here: match_pair.py:31-35's do() calls
        # match() directly with no cutoff (the >50 gate exists only in
        # the matcher.py unpacking path) — a low-overlap pair the
        # cascade accepts (rule 16 matchit, rule 21 location) must
        # still be emitted.  BECAUSE there is no gate, arbitrary pairs
        # hit the cheap Part-0/Part-1 early-outs constantly (-23 word
        # deltas, NA-empty) — the vectorized pre-pass settles those in
        # numpy and match() runs only on the remainder
        rows, pl, gi, gj = [], [], [], []
        for i in range(len(names_a)):
            a, b = pre(names_a[i]), pre(names_b[i])
            if not a or not b:
                continue
            gi.append(len(pl))
            pl.append(a)
            gj.append(len(pl))
            pl.append(b)
            rows.append(i)
        keep, codes = [], []
        if rows:
            gi = np.asarray(gi, np.int64)
            gj = np.asarray(gj, np.int64)
            fast, scalar = _vector_precascade(self.matcher, pl, gi, gj)
            for t, i in enumerate(rows):
                code = (self.matcher.match(pl[gi[t]], pl[gj[t]])
                        if scalar[t] else int(fast[t]))
                if code > 0:
                    keep.append(i)
                    codes.append(int(code))
        take = pa.array(keep, pa.int64())
        return pa.Table.from_arrays(
            [batch.column("name_a").take(take),
             batch.column("name_b").take(take),
             pa.array(codes, pa.int32())],
            names=["name_a", "name_b", "rule_code"],
        )


def score_prepaired(pairs_ds, *, concurrency=(1, 8), batch_size: int = 4096):
    """pairs(name_a, name_b) -> matched subset with rule codes."""
    return pairs_ds.map_batches(
        _ScorePrepaired,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


# ---------------------------------------------------------------------------
# Query-vs-base linkage (reference CLI semantics, broadcast small side)
# ---------------------------------------------------------------------------

class _ProbeBase:
    """Actor: probes the broadcast base block-index per query batch."""

    def __init__(self, index_ref):
        import ray

        self.index = ray.get(index_ref)  # dict key -> list of base rows
        from ..functions.rules import Matcher

        self.matcher = Matcher()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.similarity import token_sort_ratio

        out = {k: [] for k in ("query_id", "query_name", "base_id", "base_name", "rule_code", "score")}
        qids = batch.column("doc_id").to_pylist()
        qnames = batch.column("name").to_pylist()
        pres = batch.column("pre_proc").to_pylist()
        noss = batch.column("nosuffix").to_pylist()
        firsts = batch.column("block_key").to_pylist()
        lasts = batch.column("block_key_last").to_pylist()
        for i in range(len(qids)):
            seen = set()
            cands = self.index.get(firsts[i], ())
            extra = self.index.get(lasts[i], ()) if lasts[i] != firsts[i] else ()
            for bid, bname, bpre, bnos in list(cands) + list(extra):
                if bid in seen:
                    continue
                seen.add(bid)
                if self.matcher.gate(noss[i], bnos):
                    code = self.matcher.match(pres[i], bpre)
                    if code > 0:
                        out["query_id"].append(qids[i])
                        out["query_name"].append(qnames[i])
                        out["base_id"].append(bid)
                        out["base_name"].append(bname)
                        out["rule_code"].append(int(code))
                        out["score"].append(float(token_sort_ratio(noss[i], bnos)))
        return pa.Table.from_pydict(
            out,
            schema=pa.schema(
                [
                    ("query_id", pa.string()),
                    ("query_name", pa.string()),
                    ("base_id", pa.string()),
                    ("base_name", pa.string()),
                    ("rule_code", pa.int32()),
                    ("score", pa.float32()),
                ]
            ),
        )


def link_query_base(query_ds, base_ds, *, concurrency=(1, 8), batch_size=1024):
    """Reference CLI flow: query table vs (small) base table, no shuffle.

    Both inputs need columns (doc_id, name).  The base table is normalized,
    indexed by first AND last nosuffix token, and broadcast via ``ray.put``.
    """
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    # CSV reads land in 1-2 blocks; without splitting, both the base
    # normalization and the probe stage run as single tasks
    base_names = normalize_names(base_ds.repartition(max(8, ncpu)),
                                 remove_people=True, concurrency=(1, ncpu))
    index: dict[str, list] = {}
    for b in base_names.iter_batches(batch_format="pyarrow", batch_size=8192):
        ids = b.column("doc_id").to_pylist()
        nms = b.column("name").to_pylist()
        prs = b.column("pre_proc").to_pylist()
        nss = b.column("nosuffix").to_pylist()
        fks = b.column("block_key").to_pylist()
        lks = b.column("block_key_last").to_pylist()
        for i in range(len(ids)):
            row = (ids[i], nms[i], prs[i], nss[i])
            index.setdefault(fks[i], []).append(row)
            if lks[i] != fks[i]:
                index.setdefault(lks[i], []).append(row)
    index_ref = ray.put(index)

    query_names = normalize_names(query_ds.repartition(max(8, ncpu * 2)),
                                  remove_people=True, concurrency=concurrency)
    return query_names.map_batches(
        _ProbeBase,
        fn_constructor_kwargs={"index_ref": index_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(max(2, ncpu - 2), ncpu),
        num_cpus=1,
    )
