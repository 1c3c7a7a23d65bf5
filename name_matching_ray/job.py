"""Batch-job entrypoint — the ``ray job submit`` target for the flagship
linkage run (BASELINE.json north_rule: "run via ray job submit on a
fixed-size multi-node Ray cluster").

On a cluster (the job attaches to the running cluster via RAY_ADDRESS,
which the job supervisor sets):

    ray job submit --working-dir . -- \
        python -m name_matching_ray.job \
            --docs  s3://bucket/interleaved-docs/ \
            --out   s3://bucket/linkage-run-001/  \
            --waves 64 --cap 200

Locally (same code path; the sandbox stand-in):

    python -m name_matching_ray.job \
        --docs /root/testdata/sf0.001/documents.parquet --out /tmp/run1

The run is RESUMABLE: re-submitting the identical command after a failure
skips every stage and wave already recorded in ``<out>/manifest.json``
(per-partition lineage + pairs_scored / drop metrics;
``pipelines/linkage.run_linkage_checkpointed``).  A parameter mismatch
against a half-built checkpoint is an error, not silent corruption.

Like ``cli.py``, this module owns a Ray session; library code never calls
``ray.init()``.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="checkpointed record-linkage batch job (Ray Data)")
    p.add_argument("--docs", required=True,
                   help="interleaved-documents parquet path (doc_id, spans)")
    p.add_argument("--out", required=True,
                   help="output/checkpoint directory (names/, exploded/, "
                        "pairs/wave-*/, clusters/, manifest.json)")
    p.add_argument("--waves", type=int, default=8,
                   help="resume granularity: block keys are hash-partitioned "
                        "into this many independently-scored waves")
    p.add_argument("--cap", type=int, default=200,
                   help="salt cap: max rows per salted block shard")
    p.add_argument("--max-shards", type=int, default=16,
                   help="stop-key threshold: keys needing more salt shards "
                        "are dropped and counted (no silent caps)")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="local mode only; ignored when attaching to a "
                        "cluster via RAY_ADDRESS")
    args = p.parse_args(argv)

    import ray

    owned = not ray.is_initialized()
    if owned:
        # under `ray job submit` RAY_ADDRESS points at the cluster and
        # num_cpus must not be passed; standalone it is local mode
        addr = os.environ.get("RAY_ADDRESS", "local")
        kwargs = {"address": addr, "include_dashboard": False}
        if args.num_cpus and addr == "local":
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)

    from .pipelines.linkage import run_linkage_checkpointed

    # {partition_id: metrics} for every completed stage/wave
    parts = run_linkage_checkpointed(
        args.docs, args.out, n_waves=args.waves, cap=args.cap,
        max_shards=args.max_shards,
    )
    summary = {
        "out": args.out,
        "stages_complete": sorted(parts),
        "pairs_matched": sum(
            int(m.get("pairs_matched", 0))
            for pid, m in parts.items() if pid.startswith("pairs/")),
        "pairs_scored": sum(
            int(m.get("pairs_scored", 0))
            for pid, m in parts.items() if pid.startswith("pairs/")),
        "rows_dropped_stop_keys": int(
            parts.get("exploded", {}).get("rows_dropped_stop_keys", 0)),
    }
    print(json.dumps(summary))
    if owned:  # never tear down a session someone else owns (e.g. pytest)
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
