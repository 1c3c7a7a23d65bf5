"""Driver-mimic: run each queries() entry and its oracle_sql() side-by-side,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as ent

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = ent.queries(), ent.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ours = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(ours)} rows)")
            continue
        try:
            theirs = canon(con.sql(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if list(ours.columns) != list(theirs.columns):
            print(f"FAIL {name}: columns {list(ours.columns)} vs {list(theirs.columns)}")
            failures += 1
            continue
        if len(ours) != len(theirs):
            print(f"FAIL {name}: rows {len(ours)} vs {len(theirs)}")
            failures += 1
            continue
        # dtype-insensitive value compare
        mismatch = False
        for c in ours.columns:
            a, b = ours[c], theirs[c]
            try:
                if pd.api.types.is_numeric_dtype(a) or pd.api.types.is_numeric_dtype(b):
                    eq = (pd.to_numeric(a).to_numpy() == pd.to_numeric(b).to_numpy()).all()
                else:
                    eq = (a.astype(str).to_numpy() == b.astype(str).to_numpy()).all()
            except Exception:
                eq = False
            if not eq:
                bad = (a.astype(str).to_numpy() != b.astype(str).to_numpy())
                print(f"FAIL {name}: column {c} differs "
                      f"({bad.sum() if hasattr(bad, 'sum') else '?'} rows); "
                      f"ours head={a.head(3).tolist()} oracle head={b.head(3).tolist()}")
                mismatch = True
                break
        if not mismatch:
            print(f"ok   {name}: {len(ours)} rows match oracle")
        else:
            failures += 1
    print(f"\n{failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
