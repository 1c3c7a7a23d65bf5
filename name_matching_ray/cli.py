"""CLI mirroring the reference's ``./matcher.py`` surface (matcher.py:412-455).

    python -m name_matching_ray.cli name.csv [-b base.csv] [-o out.csv]
        [--dont_rm_ppl] [--num-cpus N]

``name.csv``: positional columns (index, name) — README.md:17-27.
``base.csv``: (permno, comnam) — defaults to the reference's stocknames.csv
when available.  Output columns: your_index, your_name, base_index,
base_name, matching_score (README.md:36-43).

This is the one module that owns a Ray session (scripts only — library code
never calls ray.init).
"""

from __future__ import annotations

import argparse
import sys


def _csv_as_dataset(path: str, id_name: tuple[str, str]):
    import pyarrow as pa
    import ray.data

    ds = ray.data.read_csv(path)
    cols = ds.schema().names

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column(cols[0]).cast(pa.string()),
            "name": t.column(cols[1]).cast(pa.string()),
        })

    return ds.map_batches(rename, batch_format="pyarrow")


def main(argv=None):
    p = argparse.ArgumentParser(description="fuzzy name matcher (Ray Data)")
    p.add_argument("namefile", help="CSV with (index, name) columns — or, with "
                   "--pairs, a CSV of (name_a, name_b) pre-paired candidates")
    p.add_argument("-b", dest="basefile",
                   default="/root/reference/stocknames.csv",
                   help="base CSV (permno, comnam); same specs as stocknames")
    p.add_argument("-o", dest="outfile", default="__match__.csv")
    p.add_argument("--pairs", action="store_true",
                   help="match_pair.py mode: score pre-paired names "
                        "(match_pair.py:19-58 semantics, streaming)")
    p.add_argument("--dont_rm_ppl", action="store_true",
                   help="disable person-name removal in preprocessing")
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("-c", dest="cpu", type=float, default=None,
                   help="fraction of machine CPUs to use, (0, 1] — the "
                        "reference's -c flag (matcher.py:416-422; its own "
                        "handler reads args.cpu before parsing, a latent "
                        "AttributeError — here it simply works)")
    args = p.parse_args(argv)

    import ray

    if args.cpu and args.num_cpus is None:
        import os

        args.num_cpus = max(1, int((os.cpu_count() or 1) * min(args.cpu, 1.0)))
    if not ray.is_initialized():
        kw = {"num_cpus": args.num_cpus} if args.num_cpus else {}
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR", **kw)
    try:
        if args.pairs:
            _run_pairs(args)
            return
        from .pipelines.linkage import link_query_base

        query = _csv_as_dataset(args.namefile, ("index", "name"))
        base = _csv_as_dataset(args.basefile, ("permno", "comnam"))
        pairs = link_query_base(query, base)
        df = pairs.to_pandas()
        df = df.rename(columns={
            "query_id": "your_index", "query_name": "your_name",
            "base_id": "base_index",
        })
        df[["your_index", "your_name", "base_index", "base_name", "score"]] \
            .to_csv(args.outfile, index=False, header=False)
        print(f"{len(df)} matches -> {args.outfile}")
    finally:
        ray.shutdown()


def _run_pairs(args):
    """match_pair.py flow: stream a 2-column pairs CSV through the scorer;
    Ray's streaming executor replaces the reference's manual 10M-row
    chunking (match_pair.py:50-58)."""
    import pyarrow as pa
    import ray.data

    from .pipelines.linkage import score_prepaired

    ds = ray.data.read_csv(args.namefile)
    cols = ds.schema().names

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({
            "name_a": t.column(cols[0]).cast(pa.string()),
            "name_b": t.column(cols[1]).cast(pa.string()),
        })

    pairs = ds.map_batches(rename, batch_format="pyarrow")
    out = score_prepaired(pairs).to_pandas()
    out[["name_a", "name_b"]].to_csv(args.outfile, index=False, header=False)
    print(f"{len(out)} matched pairs -> {args.outfile}")


if __name__ == "__main__":
    sys.exit(main())
