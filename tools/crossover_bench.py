"""Crossover evidence for the graded (scale) plans vs their small-data twins.

Round-4 verdict item 7: the graded plans — lean MinHash (ids-only LSH
shuffle), open-vocab bucket-join pmi/tfidf, bucketed cross_dedup — are
SLOWER at sf0.1 by design (fixed shuffle latency dominates tiny data) and
claimed faster at scale.  This tool measures both plans of each pair on
synthetic corpora at two sizes (the largest this box comfortably fits) and
records the wall-time ratio trend, i.e. which direction the crossover moves
as the corpus grows.

Run on a QUIET box (CLAUDE.md): python tools/crossover_bench.py
Writes BENCH/crossover_r5.json.

Owns its Ray session (tools are CLI entry points).
"""

from __future__ import annotations

import json
import os
import sys
import time

import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [int(s) for s in os.environ.get(
    "GRAFT_CROSSOVER_SIZES", "5000,50000,200000").split(",")]
REPS = int(os.environ.get("GRAFT_CROSSOVER_REPS", "2"))
# comma-list to restrict the op set (e.g. re-run one pair at a larger
# size without paying for the rest); empty = all
OPS = [s for s in os.environ.get("GRAFT_CROSSOVER_OPS", "").split(",") if s]
OUT = os.environ.get("GRAFT_CROSSOVER_OUT", "crossover_r5.json")


def _stat_ticks() -> tuple[int, int]:
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    return vals[7], sum(vals)


def _window_steal(s0: tuple[int, int], s1: tuple[int, int]) -> float:
    """steal% OVER THE WINDOW (delta ticks), not since-boot cumulative."""
    return 100.0 * (s1[0] - s0[0]) / max(1, s1[1] - s0[1])


def _consume(res) -> int:
    """Execute a Dataset / DataFrame result fully; return row count."""
    import pandas as pd

    if isinstance(res, pd.DataFrame):
        return len(res)
    return res.count()


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False)

    from name_matching_ray.stages.curation import cross_dedup
    from name_matching_ray.stages.dedup import minhash_lsh_pairs
    from name_matching_ray.stages.textstats import pmi_bigrams, tfidf_topk

    def write_tiled_docs(path: str, n_docs: int):
        """Tile the real sf0.1 documents table to n_docs rows.

        Every token in copy c gets a ``_c<c>`` suffix, so cross-copy
        similarity is ZERO: the near-dup cluster structure (and thus pair
        volume) scales LINEARLY with corpus size instead of quadratically
        in the copy count, and the token vocabulary grows linearly — the
        exact open-vocab dimension the graded bucket-join plans exist for.
        Deterministic (pure function of the committed testdata)."""
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        base = pq.read_table("/root/testdata/sf0.1/documents.parquet",
                             columns=["doc_id", "text"])
        nb = base.num_rows
        parts = []
        for c in range((n_docs + nb - 1) // nb):
            sfx = f"_c{c}"
            txt = pc.replace_substring(base.column("text"), " ", sfx + " ")
            txt = pc.binary_join_element_wise(txt, sfx, "")
            parts.append(pa.table({
                "doc_id": pc.add(base.column("doc_id"), c * nb),
                "text": txt,
            }))
        os.makedirs(path, exist_ok=True)
        pq.write_table(pa.concat_tables(parts).slice(0, n_docs),
                       os.path.join(path, "docs.parquet"))

    def read_docs(path):
        import ray.data

        return ray.data.read_parquet(path, columns=["doc_id", "text"]) \
            .repartition(64)

    def ref_slice(docs):
        # every 7th doc, same idiom as __ray_entry__._ref_slice
        def ref_filter(t):
            import numpy as np
            import pyarrow as pa

            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(np.asarray(ids) % 7 == 0))

        return docs.map_batches(ref_filter, batch_format="pyarrow")

    PLANS = {
        "minhash": {
            "graded": lambda ds: minhash_lsh_pairs(ds, lean=True),
            "twin": lambda ds: minhash_lsh_pairs(ds, lean=False),
            "twin_name": "sig-carrying",
        },
        "pmi_bigrams": {
            "graded": lambda ds: pmi_bigrams(ds, k=20, min_count=5,
                                             broadcast=False),
            "twin": lambda ds: pmi_bigrams(ds, k=20, min_count=5,
                                           broadcast=True),
            "twin_name": "broadcast",
        },
        "tfidf_topk": {
            "graded": lambda ds: tfidf_topk(ds, k=3, min_df=2,
                                            broadcast=False),
            "twin": lambda ds: tfidf_topk(ds, k=3, min_df=2,
                                          broadcast=True),
            "twin_name": "broadcast",
        },
        "cross_dedup": {
            "graded": lambda ds: cross_dedup(ds, ref_slice(ds),
                                             broadcast=False),
            "twin": lambda ds: cross_dedup(ds, ref_slice(ds),
                                           broadcast=True),
            "twin_name": "broadcast",
        },
    }
    if OPS:
        PLANS = {k: v for k, v in PLANS.items() if k in OPS}

    results = {"sizes": SIZES, "reps": REPS, "plans": {}}
    for n_docs in SIZES:
        path = f"/tmp/crossover_docs_{n_docs}"
        if not os.path.exists(path):
            write_tiled_docs(path, n_docs)
        for op, spec in PLANS.items():
            for plan in ("graded", "twin"):
                best, steals = None, []
                for _ in range(REPS):
                    s0 = _stat_ticks()
                    t0 = time.perf_counter()
                    rows = _consume(spec[plan](read_docs(path)))
                    dt = time.perf_counter() - t0
                    steals.append(round(_window_steal(s0, _stat_ticks()), 3))
                    best = dt if best is None else min(best, dt)
                key = f"{op}@{n_docs}"
                results["plans"].setdefault(key, {})[plan] = {
                    "sec": round(best, 3), "rows": int(rows),
                    "steal_deltas": steals,
                    "plan_name": ("graded" if plan == "graded"
                                  else spec["twin_name"]),
                }
                print(f"{key} {plan:6s} {best:8.2f}s rows={rows}",
                      flush=True)

    # ratio trend: graded/twin per op per size (crossover = ratio falling
    # below 1.0 as size grows, or monotonically approaching it)
    for op in PLANS:
        trend = []
        for n_docs in SIZES:
            d = results["plans"][f"{op}@{n_docs}"]
            trend.append(round(d["graded"]["sec"] / d["twin"]["sec"], 3))
        results["plans"][f"{op}_ratio_trend"] = trend
        print(f"{op}: graded/twin ratio by size {SIZES} -> {trend}")

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", OUT)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)
    ray.shutdown()


if __name__ == "__main__":
    main()
