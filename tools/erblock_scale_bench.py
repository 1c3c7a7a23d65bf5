"""Scale-trend evidence for the round-5 ER-blocking ops: run each op on
tiled corpora (the crossover_bench builder — per-copy token suffixes keep
cluster structure, vocabulary and block layout LINEAR in corpus size) and
report wall time + output rows per size.  The claim under test: wall time
grows ~linearly once clear of the fixed shuffle-latency floor — no hidden
quadratic (all-pairs) or driver-bound stage.

Usage: python tools/erblock_scale_bench.py [out.json]
Env: GRAFT_SCALE_SIZES (default "50000,200000"), GRAFT_SCALE_REPS (2),
RAY_GRAFT_CPUS (32).

NOTE: run on a quiet window, nothing else on the box (CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [int(s) for s in
         os.environ.get("GRAFT_SCALE_SIZES", "50000,200000").split(",")]
REPS = int(os.environ.get("GRAFT_SCALE_REPS", "2"))


def _stat_ticks() -> tuple[int, int]:
    with open("/proc/stat") as f:
        v = list(map(int, f.readline().split()[1:]))
    return v[7], sum(v)


def _window_steal(s0, s1) -> float:
    dt = s1[1] - s0[1]
    return 100.0 * (s1[0] - s0[0]) / dt if dt else 0.0


def _write_tiled_docs(path: str, n_docs: int):
    # same deterministic tiling law as tools/crossover_bench.py
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


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from name_matching_ray.stages.dedup import cosine_pairs
    from name_matching_ray.stages.erblock import (blocking_budget_sweep,
                                                  blocking_quality,
                                                  edit_block_pairs,
                                                  meta_blocking_ecbs,
                                                  meta_blocking_pairs,
                                                  snm_pairs,
                                                  suffix_blocking_pairs)

    def read_docs(path):
        return ray.data.read_parquet(path, columns=["doc_id", "text"]) \
            .repartition(64)

    OPS = {
        "snm_pairs": snm_pairs,
        "meta_blocking_pairs": meta_blocking_pairs,
        "edit_block_pairs": edit_block_pairs,
        "blocking_quality": blocking_quality,
        # session-5 families (same linear-or-bust claim)
        "suffix_blocking_pairs": suffix_blocking_pairs,
        "cosine_pairs": cosine_pairs,
        "meta_blocking_ecbs": meta_blocking_ecbs,
        "blocking_budget_sweep": blocking_budget_sweep,
    }

    results = {"sizes": SIZES, "reps": REPS, "ops": {}}
    for n_docs in SIZES:
        path = f"/tmp/erscale_docs_{n_docs}"
        if not os.path.exists(path):
            _write_tiled_docs(path, n_docs)
        for name, fn in OPS.items():
            best, rows, steals = None, 0, []
            for _ in range(REPS):
                s0 = _stat_ticks()
                t0 = time.perf_counter()
                rows = fn(read_docs(path)).count()
                dt = time.perf_counter() - t0
                steals.append(round(_window_steal(s0, _stat_ticks()), 3))
                best = dt if best is None else min(best, dt)
            results["ops"][f"{name}@{n_docs}"] = {
                "sec": round(best, 3), "rows": int(rows), "steal%": steals}
            print(f"{name}@{n_docs}: {best:.2f}s rows={rows} "
                  f"steal={steals}", flush=True)

    # wall ratios per op across consecutive sizes (size ratio alongside)
    results["ratios"] = {}
    for name in OPS:
        for a, b in zip(SIZES, SIZES[1:]):
            ra = results["ops"][f"{name}@{a}"]["sec"]
            rb = results["ops"][f"{name}@{b}"]["sec"]
            results["ratios"][f"{name}:{a}->{b}"] = round(rb / ra, 3)
            print(f"{name}: {a}->{b} wall x{rb / ra:.2f} "
                  f"(size x{b / a:.1f})", flush=True)

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/erblock_scale.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)
    ray.shutdown()


if __name__ == "__main__":
    main()
