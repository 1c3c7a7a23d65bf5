"""CLI / query-vs-base flow against the reference's real data files."""

import csv

import pytest


@pytest.mark.skipif(
    not __import__("os").path.exists("/root/reference/stocknames.csv"),
    reason="reference data not present",
)
def test_cli_query_vs_base(tmp_path, ray_session, monkeypatch):
    # 30 real query names from the reference's example corpus
    rows = list(csv.reader(open("/root/reference/comp_names.csv")))[1:31]
    q = tmp_path / "q.csv"
    with open(q, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["gvkey", "conm"])
        w.writerows(rows)
    out = tmp_path / "out.csv"

    import ray

    from name_matching_ray import cli

    # the session fixture owns Ray; keep cli from shutting it down
    monkeypatch.setattr(ray, "shutdown", lambda: None)
    cli.main([str(q), "-o", str(out), "-b", "/root/reference/stocknames.csv"])

    got = list(csv.reader(open(out)))
    assert len(got) >= 10  # most of these 30 names exist in CRSP
    exact = [r for r in got if r[1].strip().lower() == r[3].strip().lower()]
    assert exact and all(float(r[4]) == 100.0 for r in exact)
    # columns: your_index, your_name, base_index, base_name, score
    assert all(len(r) == 5 for r in got)


def test_person_match_postfilter(ray_session):
    import pyarrow as pa
    import ray.data

    from name_matching_ray.pipelines.linkage import filter_person_matches

    t = pa.table({
        "query_name": ["John A. Smith", "mary johnson", "ACME STEEL INC"],
        "base_name": ["b1", "b2", "b3"],
    })
    out = filter_person_matches(ray.data.from_arrow(t)).to_pandas()
    assert out.query_name.tolist() == ["ACME STEEL INC"]
