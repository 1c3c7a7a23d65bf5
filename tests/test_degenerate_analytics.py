"""Degenerate-input parity for the fixed-row analytics (ADVICE round 4).

``funnel_counts`` / ``conversion_time`` oracles emit FIXED rows (a VALUES
stage list / a percentile list) even when zero events qualify; the Ray
paths must do the same instead of collapsing to 0 rows.  These tests build
an events corpus with NO qualifying events and assert the fixed rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def degenerate_sf(tmp_path_factory):
    """events.parquet whose event_type never matches a funnel stage."""
    d = tmp_path_factory.mktemp("degenerate_sf")
    t = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([10, 10, 20], pa.int64()),
        "event_type": pa.array(["other", "other", "noise"], pa.string()),
        "ts": pa.array(pd.to_datetime(
            ["2024-01-01", "2024-01-02", "2024-01-03"]).astype(
            "datetime64[us]")),
    })
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


def test_funnel_counts_empty_corpus_emits_stage_rows(ray_session,
                                                     degenerate_sf):
    from name_matching_ray.pipelines.analytics import funnel_counts

    out = funnel_counts(degenerate_sf).to_pandas() \
        .sort_values("stage_idx").reset_index(drop=True)
    assert list(out["stage_idx"]) == [0, 1, 2]
    assert list(out["stage"]) == ["view", "click", "purchase"]
    assert list(out["n_users"]) == [0, 0, 0]


def test_conversion_time_empty_corpus_emits_null_percentiles(ray_session,
                                                             degenerate_sf):
    from name_matching_ray.pipelines.analytics import conversion_time

    out = conversion_time(degenerate_sf).to_pandas() \
        .sort_values("q_bp").reset_index(drop=True)
    assert list(out["q_bp"]) == [2500, 5000, 7500, 9000]
    assert out["delay_s"].isna().all()


def test_conversion_time_seed_does_not_perturb_real_percentiles(
        ray_session, degenerate_sf, tmp_path):
    """The zero-count seed row (delay 0) must not shift percentiles when
    real delay-0 rows are absent AND when they are present."""
    from name_matching_ray.pipelines.analytics import conversion_time

    def mk(rows, path):
        t = pa.table({
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "ts": pa.array(np.array([r[2] for r in rows],
                                    "datetime64[us]")),
        })
        path.mkdir(exist_ok=True)
        pq.write_table(t, str(path / "events.parquet"))
        return str(path)

    # user 1 converts in 10 s; user 2 converts in 0 s (same-μs ts fails
    # strict order, so give it 1 μs → delay_s floors to 0)
    rows = [
        (1, "view", "2024-01-01T00:00:00.000000"),
        (1, "purchase", "2024-01-01T00:00:10.000000"),
        (2, "view", "2024-01-01T00:00:00.000000"),
        (2, "purchase", "2024-01-01T00:00:00.000001"),
    ]
    sf = mk(rows, tmp_path / "sf")
    out = conversion_time(sf).to_pandas().sort_values("q_bp") \
        .reset_index(drop=True)
    # delays {0, 10}: 25th/50th pct -> 0, 75th/90th -> 10
    assert list(out["delay_s"]) == [0, 0, 10, 10]
