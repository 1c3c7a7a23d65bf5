"""Relational pipelines over the TPC-H-ish test tables — Ray-Data-first.

Patterns demonstrated (and relied on at scale):

* **partial aggregation**: every groupby here is preceded by a per-batch
  combiner inside ``map_batches`` so the all-to-all shuffle moves one row per
  (batch × key), not per input row;
* **broadcast joins**: dimension tables (customer/nation/region) are
  collected once, ``ray.put`` into the object store, and probed inside
  ``map_batches`` — no shuffle join for small sides;
* **top-k without global sort**: per-batch local top-k, then a single-group
  merge — ``sort().limit()`` would shuffle everything;
* **integer money**: all money aggregates are computed in *cents* with
  ``floor(x*100 + 0.5)`` so the DuckDB oracle matches value-hashes exactly
  (float64 summation order never leaks into results).

Column prune happens at the read (``read_parquet(columns=[...])``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _cents(x: np.ndarray) -> np.ndarray:
    # identical IEEE op order to SQL: FLOOR(x*100 + 0.5)
    return np.floor(x * 100.0 + 0.5).astype(np.int64)


def _read(sf_dir: str, table: str, columns: list[str]):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# the engine-wide bucket law lives in util.key_hash / util.bucket_hash —
# one definition so a pipeline and its in-bucket kernel can never drift
from ..util import bucket_hash as _bucket_hash
from ..util import key_hash as _key_hash


def _grouped_sum(ds, keys: list[str], partial_fn, value_cols: list[str],
                 n_buckets: int = 64):
    """map_batches partial combiner -> coarse-bucket pandas combine.

    ``value_cols`` is explicit: deriving it from ``.schema()`` would trigger
    an extra sample execution of the partial stage per query.  The global
    combine groups by ``hash(keys) % n_buckets`` and sums with a vectorized
    pandas groupby inside each bucket — Ray's sort-aggregate pays per-group
    overhead that dominates at 10k+ distinct keys.
    """
    def partial_with_bucket(df: pd.DataFrame) -> pa.Table:
        t = partial_fn(df)
        pdf = t.to_pandas()
        pdf["_pb"] = (_key_hash(pdf, keys) % n_buckets).astype(np.int64)
        return pa.Table.from_pandas(pdf, preserve_index=False)

    def combine(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby(keys, as_index=False)[value_cols].sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    partial = ds.map_batches(partial_with_bucket, batch_format="pandas")
    return partial.groupby("_pb").map_groups(combine, batch_format="pandas")


# ---------------------------------------------------------------------------
# pricing summary (TPC-H Q1 shape)
# ---------------------------------------------------------------------------

def pricing_summary(sf_dir: str):
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount"])

    def partial(df: pd.DataFrame) -> pa.Table:
        df = df.assign(
            sum_qty_c=_cents(df["l_quantity"].to_numpy()),
            sum_base_c=_cents(df["l_extendedprice"].to_numpy()),
            sum_disc_c=_cents(
                (df["l_extendedprice"] * (1.0 - df["l_discount"])).to_numpy()
            ),
            count_order=np.int64(1),
        )
        g = (df.groupby(["l_returnflag", "l_linestatus"], as_index=False)
               [["sum_qty_c", "sum_base_c", "sum_disc_c", "count_order"]].sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    return _grouped_sum(ds, ["l_returnflag", "l_linestatus"], partial,
                        ["sum_qty_c", "sum_base_c", "sum_disc_c", "count_order"])


# ---------------------------------------------------------------------------
# broadcast-join: revenue per market segment / per region
# ---------------------------------------------------------------------------

def segment_revenue(sf_dir: str, *, broadcast_threshold: int = 5_000_000):
    """Revenue per market segment (orders ⋈ customer).

    ``customer`` is NOT a fixed-size dim table — it scales with sf — so the
    driver-collect + ``ray.put`` broadcast map is used only while customer
    stays under ``broadcast_threshold`` rows; beyond that the join switches
    to :func:`_segment_revenue_partitioned` (hash-bucket partitioned join,
    nothing ever collected to the driver).  Both paths produce identical
    output (pytest-checked).
    """
    import ray

    cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    if cust_ds.count() > broadcast_threshold:
        return _segment_revenue_partitioned(cust_ds, orders)

    cust = cust_ds.to_pandas()
    seg_of = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    class Partial:
        def __init__(self):
            self.seg = ray.get(seg_of)

        def __call__(self, df: pd.DataFrame) -> pa.Table:
            df = df.assign(
                c_mktsegment=df["o_custkey"].map(self.seg),
                revenue_c=_cents(df["o_totalprice"].to_numpy()),
                n_orders=np.int64(1),
            )
            g = (df.groupby("c_mktsegment", as_index=False)
                   [["revenue_c", "n_orders"]].sum())
            return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    partial = orders.map_batches(Partial, batch_format="pandas",
                                 concurrency=(1, 8))
    return partial.groupby("c_mktsegment").aggregate(
        Sum("revenue_c", alias_name="revenue_c"),
        Sum("n_orders", alias_name="n_orders"),
    )


def _segment_revenue_partitioned(cust_ds, orders, *, n_buckets: int = 128):
    """Hash-bucket partitioned join: both sides tagged with
    ``hash(custkey) % n_buckets``, unioned, joined inside each coarse bucket
    (orders pre-aggregated per custkey in the map side first), then one tiny
    segment-level groupby.  The scale path — no driver-side customer map."""
    from ray.data.aggregate import Sum

    def _bucket(keys: np.ndarray) -> np.ndarray:
        return ((keys.astype(np.uint64) * np.uint64(2654435761))
                % np.uint64(n_buckets)).astype(np.int64)

    def cust_tag(df: pd.DataFrame) -> pa.Table:
        keys = df["c_custkey"].to_numpy(np.int64)
        return pa.table({
            "bucket": pa.array(_bucket(keys), pa.int64()),
            "key": pa.array(keys, pa.int64()),
            "seg": pa.array(df["c_mktsegment"], pa.string()),
            "revenue_c": pa.nulls(len(df), pa.int64()),
            "n_orders": pa.nulls(len(df), pa.int64()),
        })

    def order_partial(df: pd.DataFrame) -> pa.Table:
        g = (df.assign(revenue_c=_cents(df["o_totalprice"].to_numpy()),
                       n_orders=np.int64(1))
               .groupby("o_custkey", as_index=False)
               [["revenue_c", "n_orders"]].sum())
        keys = g["o_custkey"].to_numpy(np.int64)
        return pa.table({
            "bucket": pa.array(_bucket(keys), pa.int64()),
            "key": pa.array(keys, pa.int64()),
            "seg": pa.nulls(len(g), pa.string()),
            "revenue_c": pa.array(g["revenue_c"].to_numpy(np.int64), pa.int64()),
            "n_orders": pa.array(g["n_orders"].to_numpy(np.int64), pa.int64()),
        })

    both = cust_ds.map_batches(cust_tag, batch_format="pandas").union(
        orders.map_batches(order_partial, batch_format="pandas")
    )

    def join_bucket(g: pd.DataFrame) -> pa.Table:
        seg_map = g.loc[g["seg"].notna()].set_index("key")["seg"]
        fact = g.loc[g["seg"].isna()]
        if fact.empty or seg_map.empty:
            return pa.table({"c_mktsegment": pa.array([], pa.string()),
                             "revenue_c": pa.array([], pa.int64()),
                             "n_orders": pa.array([], pa.int64())})
        out = (fact.assign(c_mktsegment=fact["key"].map(seg_map))
                   .dropna(subset=["c_mktsegment"])
                   .groupby("c_mktsegment", as_index=False)
                   [["revenue_c", "n_orders"]].sum())
        return pa.table({
            "c_mktsegment": pa.array(out["c_mktsegment"], pa.string()),
            "revenue_c": pa.array(out["revenue_c"].to_numpy(np.int64), pa.int64()),
            "n_orders": pa.array(out["n_orders"].to_numpy(np.int64), pa.int64()),
        })

    return (both.groupby("bucket").map_groups(join_bucket, batch_format="pandas")
                .groupby("c_mktsegment")
                .aggregate(Sum("revenue_c", alias_name="revenue_c"),
                           Sum("n_orders", alias_name="n_orders")))


def region_balance(sf_dir: str):
    """customer ⋈ nation ⋈ region (two chained broadcast lookups)."""
    import ray

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    n2r = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    r2name = dict(zip(region["r_regionkey"], region["r_name"]))
    lookup = ray.put({n: r2name[r] for n, r in n2r.items()})

    cust = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    class Partial:
        def __init__(self):
            self.region_of = ray.get(lookup)

        def __call__(self, df: pd.DataFrame) -> pa.Table:
            df = df.assign(
                r_name=df["c_nationkey"].map(self.region_of),
                acctbal_c=_cents(df["c_acctbal"].to_numpy()),
                n_customers=np.int64(1),
            )
            g = (df.groupby("r_name", as_index=False)
                   [["acctbal_c", "n_customers"]].sum())
            return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    partial = cust.map_batches(Partial, batch_format="pandas",
                               concurrency=(1, 8))
    return partial.groupby("r_name").aggregate(
        Sum("acctbal_c", alias_name="acctbal_c"),
        Sum("n_customers", alias_name="n_customers"),
    )


# ---------------------------------------------------------------------------
# top-k without a global sort
# ---------------------------------------------------------------------------

def topk_orders(sf_dir: str, k: int = 10):
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def local_topk(df: pd.DataFrame) -> pa.Table:
        df = df.assign(totalprice_c=_cents(df["o_totalprice"].to_numpy()))
        top = df.sort_values(["totalprice_c", "o_orderkey"],
                             ascending=[False, True]).head(k)
        return pa.Table.from_pandas(top[["o_orderkey", "totalprice_c"]],
                                    preserve_index=False)

    local = orders.map_batches(local_topk, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pa.Table:
        top = df.sort_values(["totalprice_c", "o_orderkey"],
                             ascending=[False, True]).head(k)
        return pa.Table.from_pandas(top.reset_index(drop=True),
                                    preserve_index=False)

    # single-group merge: ~k rows per input block reach this point
    return local.map_batches(lambda d: d.assign(_g=0), batch_format="pandas") \
                .groupby("_g").map_groups(
                    lambda d: merge(d.drop(columns="_g")), batch_format="pandas")


# ---------------------------------------------------------------------------
# filters / projections
# ---------------------------------------------------------------------------

def high_quantity_counts(sf_dir: str, min_qty: float = 45.0):
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
    filt = ds.filter(expr=f"l_quantity > {min_qty}")

    def partial(df: pd.DataFrame) -> pa.Table:
        g = (df.assign(n_items=np.int64(1))
               .groupby("l_returnflag", as_index=False)[["n_items"]].sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    return _grouped_sum(filt, ["l_returnflag"], partial, ["n_items"])


# ---------------------------------------------------------------------------
# events: windowed daily aggregate + gap sessionization
# ---------------------------------------------------------------------------

def events_daily(sf_dir: str):
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pa.Table:
        df = df.assign(
            # numpy datetime64[D]→str is 'YYYY-MM-DD' (same as strftime) and
            # ~20x faster than pandas dt.strftime on large batches
            day=df["ts"].to_numpy().astype("datetime64[D]").astype(str),
            value_c=_cents(df["value"].to_numpy()),
            n_events=np.int64(1),
        )
        g = (df.groupby(["user_id", "day"], as_index=False)
               [["value_c", "n_events"]].sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    return _grouped_sum(ds, ["user_id", "day"], partial,
                        ["value_c", "n_events"])


def _bucket_tag(ds, keys: list[str], n_buckets: int, out_col: str = "_ub"):
    """Adds ``out_col = hash(keys) % n_buckets`` — the coarse-group key.

    Groupby on this column produces ~n_buckets Ray groups instead of one
    tiny group per distinct key (per-group block construction dominated at
    100k+ keys — measured on rolling_user_value / dedup / cluster)."""
    def tag(df: pd.DataFrame) -> pa.Table:
        return pa.Table.from_pandas(
            df.assign(**{out_col: _bucket_hash(df, n_buckets, keys=keys)}),
            preserve_index=False,
        )

    return ds.map_batches(tag, batch_format="pandas")


def _segment_starts(*cols: np.ndarray) -> np.ndarray:
    """Boolean mask: True where any key column changes (first row True)."""
    n = len(cols[0])
    new = np.zeros(n, bool)
    if n:
        new[0] = True
        for c in cols:
            new[1:] |= c[1:] != c[:-1]
    return new


def sessionize(sf_dir: str, gap_minutes: int = 30, n_buckets: int = 256,
               salt_span_hours: int | None = None):
    """Per-user session counts (session = ts gap > gap_minutes) — the
    windowed/stateful op Ray Data lacks natively.

    Users are hash-bucketed into ``n_buckets`` coarse groups; inside each
    bucket the session breaks for EVERY user come from one sort + one
    vectorized diff + ``reduceat`` (no per-user Python).  Partitioning
    assumption: one user's events fit one group — ``salt_span_hours``
    removes that assumption (the whale-key path): events are grouped by
    (user, time-span) instead, per-span session counts are computed the
    same way, and a tiny span-summary merge stitches sessions that cross
    span boundaries.  Outputs are identical (pytest-checked).
    """
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    gap = np.timedelta64(gap_minutes * 60, "s")
    if salt_span_hours is not None:
        return _sessionize_salted(ds, gap, salt_span_hours, n_buckets)

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        n = len(g)
        if not n:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_sessions": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64())})
        new_user = _segment_starts(uid)
        brk = np.zeros(n, np.int64)
        brk[1:] = (ts[1:] - ts[:-1]) > gap
        brk[new_user] = 0
        starts = np.nonzero(new_user)[0]
        return pa.table({
            "user_id": pa.array(uid[starts].astype(np.int64), pa.int64()),
            "n_sessions": pa.array(1 + np.add.reduceat(brk, starts), pa.int64()),
            "n_events": pa.array(np.diff(np.append(starts, n)).astype(np.int64),
                                 pa.int64()),
        })

    return _bucket_tag(ds, ["user_id"], n_buckets) \
        .groupby("_ub").map_groups(per_bucket, batch_format="pandas")


def _sessionize_salted(ds, gap: np.timedelta64, span_hours: int,
                       n_buckets: int):
    """Whale-safe sessionize: group by (user, time-span), merge span summaries."""
    span_us = np.int64(span_hours) * 3_600_000_000

    def tag(df: pd.DataFrame) -> pa.Table:
        span = (df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
                // span_us)
        df = df.assign(_span=span)
        return pa.Table.from_pandas(
            df.assign(_ub=(_key_hash(df, ["user_id", "_span"]) % n_buckets)
                      .astype(np.int64)),
            preserve_index=False,
        )

    def per_span_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        uid = g["user_id"].to_numpy()
        span = g["_span"].to_numpy()
        ts = g["ts"].to_numpy()
        n = len(g)
        new_seg = _segment_starts(uid, span)
        brk = np.zeros(n, np.int64)
        brk[1:] = (ts[1:] - ts[:-1]) > gap
        brk[new_seg] = 0
        starts = np.nonzero(new_seg)[0]
        ends = np.append(starts[1:], n) - 1
        return pa.table({
            "user_id": pa.array(uid[starts].astype(np.int64), pa.int64()),
            "first_ts": pa.array(ts[starts]),
            "last_ts": pa.array(ts[ends]),
            "n_sessions": pa.array(1 + np.add.reduceat(brk, starts), pa.int64()),
            "n_events": pa.array(np.diff(np.append(starts, n)).astype(np.int64),
                                 pa.int64()),
        })

    span_sum = ds.map_batches(tag, batch_format="pandas") \
        .groupby("_ub").map_groups(per_span_bucket, batch_format="pandas")

    def merge_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "first_ts"], kind="stable")
        uid = g["user_id"].to_numpy()
        first_ts = g["first_ts"].to_numpy()
        last_ts = g["last_ts"].to_numpy()
        ns = g["n_sessions"].to_numpy(np.int64)
        ne = g["n_events"].to_numpy(np.int64)
        n = len(g)
        if not n:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_sessions": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64())})
        new_user = _segment_starts(uid)
        # adjacent spans of one user whose boundary gap fits in a session
        stitched = np.zeros(n, np.int64)
        stitched[1:] = (first_ts[1:] - last_ts[:-1]) <= gap
        stitched[new_user] = 0
        starts = np.nonzero(new_user)[0]
        return pa.table({
            "user_id": pa.array(uid[starts].astype(np.int64), pa.int64()),
            "n_sessions": pa.array(np.add.reduceat(ns - stitched, starts),
                                   pa.int64()),
            "n_events": pa.array(np.add.reduceat(ne, starts), pa.int64()),
        })

    return _bucket_tag(span_sum, ["user_id"], n_buckets, out_col="_mb") \
        .groupby("_mb").map_groups(merge_bucket, batch_format="pandas")


def rolling_user_value(sf_dir: str, window_minutes: int = 30,
                       n_buckets: int = 256,
                       salt_span_minutes: int | None = None):
    """Per-event TRAILING-WINDOW aggregate: for each event, the sum of the
    same user's value-cents over [ts − window, ts], peers included — exact
    SQL ``RANGE BETWEEN INTERVAL w PRECEDING AND CURRENT ROW`` semantics.

    The sliding-window op Ray Data lacks natively: users are hash-bucketed
    into coarse groups (one Ray group per bucket, not per user), and inside
    each bucket every user's window sums come from one sorted cumsum + two
    vectorized ``searchsorted`` calls (no per-row Python).  Partitioning
    assumption: one user's events fit one group — ``salt_span_minutes``
    (must be >= window) removes it (whale-key path): events are grouped by
    (user, time-span) with boundary events REPLICATED into the next span so
    every trailing window is complete; replicas contribute sums but emit no
    rows.  Outputs are identical (pytest-checked).
    """
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    win = np.timedelta64(window_minutes * 60, "s")
    if salt_span_minutes is not None:
        if salt_span_minutes < window_minutes:
            raise ValueError("salt span must cover the trailing window")
        return _rolling_salted(ds, win, salt_span_minutes, n_buckets)

    def tag(df: pd.DataFrame) -> pa.Table:
        return pa.Table.from_pandas(
            df.assign(_ub=_bucket_hash(df["user_id"], n_buckets)),
            preserve_index=False,
        )

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        out_id, out_roll = [], []
        for _, u in g.groupby("user_id", sort=False):
            u = u.sort_values("ts", kind="stable")
            ts = u["ts"].to_numpy()
            cents = _cents(u["value"].to_numpy())
            cs = np.concatenate([[0], np.cumsum(cents)])
            start = np.searchsorted(ts, ts - win, side="left")
            end = np.searchsorted(ts, ts, side="right")  # include ts peers
            out_id.append(u["event_id"].to_numpy(np.int64))
            out_roll.append(cs[end] - cs[start])
        if not out_id:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "roll_c": pa.array([], pa.int64())})
        return pa.table({
            "event_id": pa.array(np.concatenate(out_id), pa.int64()),
            "roll_c": pa.array(np.concatenate(out_roll).astype(np.int64),
                               pa.int64()),
        })

    return (ds.map_batches(tag, batch_format="pandas")
              .groupby("_ub").map_groups(per_bucket, batch_format="pandas"))


def _rolling_salted(ds, win: np.timedelta64, span_minutes: int,
                    n_buckets: int):
    """Whale-safe trailing-window sums via span replication (see
    :func:`rolling_user_value`)."""
    span_us = np.int64(span_minutes) * 60_000_000
    win_us = np.int64(win.astype("timedelta64[us]").astype(np.int64))

    def tag(df: pd.DataFrame) -> pa.Table:
        ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        span = ts_us // span_us
        # replicate boundary events into the NEXT span (they fall inside
        # some next-span event's trailing window)
        rep = ts_us >= (span + 1) * span_us - win_us
        base = df.assign(_span=span, _rep=False)
        reps = df.loc[rep].assign(_span=span[rep] + 1, _rep=True)
        out = pd.concat([base, reps], ignore_index=True)
        return pa.Table.from_pandas(
            out.assign(_ub=(_key_hash(out, ["user_id", "_span"]) % n_buckets)
                       .astype(np.int64)),
            preserve_index=False,
        )

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        out_id, out_roll = [], []
        for _, u in g.groupby(["user_id", "_span"], sort=False):
            u = u.sort_values("ts", kind="stable")
            ts = u["ts"].to_numpy()
            cents = _cents(u["value"].to_numpy())
            cs = np.concatenate([[0], np.cumsum(cents)])
            own = ~u["_rep"].to_numpy()
            start = np.searchsorted(ts, ts[own] - win, side="left")
            end = np.searchsorted(ts, ts[own], side="right")
            out_id.append(u["event_id"].to_numpy(np.int64)[own])
            out_roll.append(cs[end] - cs[start])
        if not out_id:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "roll_c": pa.array([], pa.int64())})
        return pa.table({
            "event_id": pa.array(np.concatenate(out_id), pa.int64()),
            "roll_c": pa.array(np.concatenate(out_roll).astype(np.int64),
                               pa.int64()),
        })

    return (ds.map_batches(tag, batch_format="pandas")
              .groupby("_ub").map_groups(per_bucket, batch_format="pandas"))


def windowed_counts_watermark(sf_dir: str, *, window_minutes: int = 60,
                              watermark_minutes: int = 10,
                              n_buckets: int = 256):
    """Watermark-aware tumbling-window counts over an OUT-OF-ORDER stream —
    the streaming-window op Ray Data lacks natively.

    Arrival order is simulated deterministically (so the DuckDB oracle can
    replay it): ``arrival = ts + md5(event_id) % 1h`` — bounded disorder.
    An event is LATE under the standard streaming watermark rule: at its
    arrival, the user's running-max event time minus the watermark has
    already passed the event's own timestamp.  Late events are counted per
    (user, tumbling window) in a separate column instead of being silently
    merged — the batch replay of what a streaming engine would emit.

    Users are hash-bucketed into coarse groups; per-user work is one
    lexsort + running max (vectorized).  Partitioning assumption: one
    user's events fit one group.
    """
    import hashlib

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    wm = np.timedelta64(watermark_minutes * 60, "s")

    def tag(df: pd.DataFrame) -> pa.Table:
        return pa.Table.from_pandas(
            df.assign(_ub=_bucket_hash(df["user_id"], n_buckets)),
            preserve_index=False,
        )

    win_us = np.int64(window_minutes) * 60_000_000

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        n = len(g)
        if not n:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "window_start": pa.array([], pa.string()),
                             "n_on_time": pa.array([], pa.int64()),
                             "n_late": pa.array([], pa.int64())})
        eid = g["event_id"].to_numpy(np.int64)
        ts = g["ts"].to_numpy()
        uid = g["user_id"].to_numpy()
        # the per-row md5 IS the deterministic arrival replay (the oracle
        # recomputes it with md5_number_lower) — inherent scalar hash, same
        # C-md5 budget as the fingerprint op
        jit = np.fromiter(
            (int.from_bytes(
                hashlib.md5(str(e).encode()).digest()[8:16], "little")
             % 3_600_000_000 for e in eid),
            np.int64, n,
        )
        arrival = ts + jit.astype("timedelta64[us]")
        order = np.lexsort((eid, arrival, uid))
        uid, ts, eid = uid[order], ts[order], eid[order]
        new_user = _segment_starts(uid)
        seg_id = np.cumsum(new_user)
        # per-user running max of event time in arrival order (vectorized
        # cython cummax), lagged one row: the watermark comparison base
        run = pd.Series(ts).groupby(seg_id).cummax().to_numpy()
        late = np.zeros(n, bool)
        late[1:] = ~new_user[1:] & ((run[:-1] - wm) > ts[1:])
        win_lbl = np.char.replace(
            ((ts.astype("datetime64[us]").view(np.int64) // win_us * win_us)
             .astype("datetime64[us]").astype("datetime64[m]").astype(str)),
            "T", " ")
        agg = (pd.DataFrame({"user_id": uid, "window_start": win_lbl,
                             "late": late})
               .groupby(["user_id", "window_start"])["late"]
               .agg(["size", "sum"]).reset_index())
        return pa.table({
            "user_id": pa.array(agg["user_id"].to_numpy(np.int64), pa.int64()),
            "window_start": pa.array(agg["window_start"], pa.string()),
            "n_on_time": pa.array(
                (agg["size"] - agg["sum"]).to_numpy(np.int64), pa.int64()),
            "n_late": pa.array(agg["sum"].to_numpy(np.int64), pa.int64()),
        })

    return (ds.map_batches(tag, batch_format="pandas")
              .groupby("_ub").map_groups(per_bucket, batch_format="pandas"))


# ---------------------------------------------------------------------------
# as-of join (operator Ray Data lacks natively)
# ---------------------------------------------------------------------------

def _ffill_last_pos(flag: np.ndarray, seg_id: np.ndarray) -> np.ndarray:
    """Per-segment forward-filled position of the last True ``flag`` row.

    Returns, for every row, the largest earlier-or-equal position p in the
    same segment with flag[p]; −1 when none.  One pandas ``cummax`` per
    call (cython), no per-segment Python.
    """
    n = len(flag)
    pos = np.where(flag, np.arange(n), -1)
    return pd.Series(pos).groupby(seg_id).cummax().to_numpy()


_ASOF_EMPTY = pa.table({"event_id": pa.array([], pa.int64()),
                        "prior_id": pa.array([], pa.int64()),
                        "gap_us": pa.array([], pa.int64())})


def asof_prior_event(sf_dir: str, left_type: str = "purchase",
                     right_type: str = "view", n_buckets: int = 256,
                     salt_span_hours: int | None = None):
    """For each ``left_type`` event, the most recent earlier ``right_type``
    event of the same user (inner as-of join) — the as-of operator Ray Data
    lacks natively.

    Users are hash-bucketed into coarse groups; inside a bucket EVERY
    user's as-of priors come from one sort + one per-segment forward-fill
    (vectorized) — no per-user Python.  Partitioning assumption: one user's
    events fit one group.  ``salt_span_hours`` removes it (whale-key path):
    pass 1 groups by (user, time-span) and resolves in-span priors; the
    residue (purchases before their span's first view, plus each span's
    last view) is a tiny per-span summary stream that pass 2 resolves with
    the same forward-fill.  Outputs are identical (pytest-checked).
    """
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    filt = ds.filter(expr=f"event_type in ['{left_type}', '{right_type}']")
    if salt_span_hours is not None:
        return _asof_salted(filt, left_type, right_type, salt_span_hours,
                            n_buckets)

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        eid = g["event_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy()
        n = len(g)
        if not n:
            return _ASOF_EMPTY
        seg_id = np.cumsum(_segment_starts(uid))
        last_r = _ffill_last_pos(et == right_type, seg_id)
        sel = np.nonzero((et == left_type) & (last_r >= 0))[0]
        prior = last_r[sel]
        return pa.table({
            "event_id": pa.array(eid[sel], pa.int64()),
            "prior_id": pa.array(eid[prior], pa.int64()),
            "gap_us": pa.array((ts[sel] - ts[prior])
                               .astype("timedelta64[us]").astype(np.int64),
                               pa.int64()),
        })

    return _bucket_tag(filt, ["user_id"], n_buckets) \
        .groupby("_ub").map_groups(per_bucket, batch_format="pandas")


def _asof_salted(filt, left_type: str, right_type: str, span_hours: int,
                 n_buckets: int):
    """Two-pass whale-safe as-of join (see :func:`asof_prior_event`)."""
    span_us = np.int64(span_hours) * 3_600_000_000

    def tag(df: pd.DataFrame) -> pa.Table:
        span = (df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
                // span_us)
        df = df.assign(_span=span)
        return pa.Table.from_pandas(
            df.assign(_ub=(_key_hash(df, ["user_id", "_span"]) % n_buckets)
                      .astype(np.int64)),
            preserve_index=False,
        )

    def pass1(g: pd.DataFrame) -> pa.Table:
        # kind 0: resolved (event_id, prior_id, gap_us)
        # kind 1: unresolved left event   (event_id, ts, user_id)
        # kind 2: span's last right event (event_id, ts, user_id)
        g = g.sort_values(["user_id", "ts"], kind="stable")
        uid = g["user_id"].to_numpy()
        span = g["_span"].to_numpy()
        ts = g["ts"].to_numpy()
        eid = g["event_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy()
        n = len(g)
        seg_start = _segment_starts(uid, span)
        seg_id = np.cumsum(seg_start)
        is_r = et == right_type
        last_r = _ffill_last_pos(is_r, seg_id)
        is_l = et == left_type
        res = np.nonzero(is_l & (last_r >= 0))[0]
        unres = np.nonzero(is_l & (last_r < 0))[0]
        # last right per segment: max position among right rows
        starts = np.nonzero(seg_start)[0]
        seg_last_r = (np.maximum.reduceat(np.where(is_r, np.arange(n), -1),
                                          starts)
                      if n else np.empty(0, np.int64))
        lastv = seg_last_r[seg_last_r >= 0]
        prior = last_r[res]
        kind = np.concatenate([np.zeros(len(res), np.int8),
                               np.ones(len(unres), np.int8),
                               np.full(len(lastv), 2, np.int8)])
        idx = np.concatenate([res, unres, lastv]).astype(np.int64)
        gap = np.zeros(len(idx), np.int64)
        gap[:len(res)] = (ts[res] - ts[prior]).astype("timedelta64[us]") \
            .astype(np.int64)
        pid = np.zeros(len(idx), np.int64)
        pid[:len(res)] = eid[prior]
        return pa.table({
            "kind": pa.array(kind, pa.int8()),
            "event_id": pa.array(eid[idx], pa.int64()),
            "prior_id": pa.array(pid, pa.int64()),
            "gap_us": pa.array(gap, pa.int64()),
            "user_id": pa.array(uid[idx].astype(np.int64), pa.int64()),
            "ts": pa.array(ts[idx]),
        })

    mid = filt.map_batches(tag, batch_format="pandas") \
        .groupby("_ub").map_groups(pass1, batch_format="pandas")

    def pass2(g: pd.DataFrame) -> pa.Table:
        done = g.loc[g["kind"] == 0, ["event_id", "prior_id", "gap_us"]]
        rest = g.loc[g["kind"] != 0]
        out = [pa.table({
            "event_id": pa.array(done["event_id"].to_numpy(np.int64), pa.int64()),
            "prior_id": pa.array(done["prior_id"].to_numpy(np.int64), pa.int64()),
            "gap_us": pa.array(done["gap_us"].to_numpy(np.int64), pa.int64()),
        })]
        if len(rest):
            rest = rest.sort_values(["user_id", "ts"], kind="stable")
            uid = rest["user_id"].to_numpy()
            ts = rest["ts"].to_numpy()
            eid = rest["event_id"].to_numpy(np.int64)
            kind = rest["kind"].to_numpy()
            seg_id = np.cumsum(_segment_starts(uid))
            last_r = _ffill_last_pos(kind == 2, seg_id)
            sel = np.nonzero((kind == 1) & (last_r >= 0))[0]
            prior = last_r[sel]
            out.append(pa.table({
                "event_id": pa.array(eid[sel], pa.int64()),
                "prior_id": pa.array(eid[prior], pa.int64()),
                "gap_us": pa.array((ts[sel] - ts[prior])
                                   .astype("timedelta64[us]").astype(np.int64),
                                   pa.int64()),
            }))
        return pa.concat_tables(out)

    return _bucket_tag(mid, ["user_id"], n_buckets, out_col="_mb") \
        .groupby("_mb").map_groups(pass2, batch_format="pandas")


# ---------------------------------------------------------------------------
# per-group top-k (windowed ranking without a global sort)
# ---------------------------------------------------------------------------

def topk_orders_per_customer(sf_dir: str, k: int = 3, n_buckets: int = 256):
    """Top-k orders per customer by (totalprice desc, orderkey asc).

    Customers are hash-bucketed into coarse groups; inside each bucket the
    rank for EVERY customer comes from one sort + a vectorized
    position-minus-segment-start (no per-customer Python).  A per-batch
    local top-k prefilter inside the tag stage drops rows that cannot rank
    within their batch's own top-k before the shuffle.
    """
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def tag(df: pd.DataFrame) -> pa.Table:
        df = df.assign(totalprice_c=_cents(df["o_totalprice"].to_numpy()))
        # local prefilter: a row beyond its customer's in-batch top-k can
        # never make the global top-k — shrink the shuffle (combiner step)
        df = df.sort_values(["o_custkey", "totalprice_c", "o_orderkey"],
                            ascending=[True, False, True], kind="stable")
        ck = df["o_custkey"].to_numpy()
        pos = np.arange(len(df))
        seg_start = np.maximum.accumulate(
            np.where(_segment_starts(ck), pos, 0))
        df = df.loc[(pos - seg_start) < k,
                    ["o_custkey", "o_orderkey", "totalprice_c"]]
        return pa.Table.from_pandas(
            df.assign(_ub=(_key_hash(df, ["o_custkey"]) % n_buckets)
                      .astype(np.int64)),
            preserve_index=False,
        )

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["o_custkey", "totalprice_c", "o_orderkey"],
                          ascending=[True, False, True], kind="stable")
        ck = g["o_custkey"].to_numpy(np.int64)
        n = len(g)
        if not n:
            return pa.table({"o_custkey": pa.array([], pa.int64()),
                             "o_orderkey": pa.array([], pa.int64()),
                             "totalprice_c": pa.array([], pa.int64()),
                             "rnk": pa.array([], pa.int64())})
        pos = np.arange(n)
        seg_start = np.maximum.accumulate(
            np.where(_segment_starts(ck), pos, 0))
        rnk = pos - seg_start + 1
        keep = rnk <= k
        return pa.table({
            "o_custkey": pa.array(ck[keep], pa.int64()),
            "o_orderkey": pa.array(g["o_orderkey"].to_numpy(np.int64)[keep],
                                   pa.int64()),
            "totalprice_c": pa.array(g["totalprice_c"].to_numpy(np.int64)[keep],
                                     pa.int64()),
            "rnk": pa.array(rnk[keep], pa.int64()),
        })

    return ds.map_batches(tag, batch_format="pandas") \
        .groupby("_ub").map_groups(per_bucket, batch_format="pandas")


def range_join_windows(sf_dir: str, *, n_windows: int = 8,
                       period_days: int = 7, width_days: int = 2):
    """Range join (interval containment) — events joined to a SMALL interval
    set: ``n_windows`` maintenance/promo windows of ``width_days`` days,
    every ``period_days`` days from the corpus' first day (the window table
    is derived from ``min(ts)`` by a rule the SQL oracle reproduces
    exactly).  Output: ``(window_id, event_type, n_events)``.

    This is the broadcast range-join plan — the correct one when one side
    is small: the interval table ships to every task (here a closure over
    two tiny numpy arrays), each batch assigns events to windows with ONE
    ``searchsorted`` against the sorted window starts (the windows are
    non-overlapping by construction, so containment = "latest window
    starting at or before ts, if ts < its end"), and per-batch partial
    counts meet in one tiny Sum shuffle over <= windows x event_types keys.
    A shuffle join of events against the window table would move the whole
    event stream for an 8-row build side.
    """
    if width_days > period_days:
        # the searchsorted plan assigns each event to at most ONE window;
        # overlapping windows need an expand-per-containing-window variant
        raise ValueError("range_join_windows requires non-overlapping "
                         "windows (width_days <= period_days)")
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    # min(ts) is a tiny full-scan aggregate (column-pruned read)
    t0 = np.datetime64(ds.min("ts"), "us")
    day0 = t0.astype("datetime64[D]")
    starts = (day0 + np.arange(n_windows, dtype=np.int64)
              * np.timedelta64(period_days, "D")).astype("datetime64[us]")
    ends = starts + np.timedelta64(width_days * 24 * 3600 * 1_000_000, "us")

    def partial(df: pd.DataFrame) -> pa.Table:
        ts = df["ts"].to_numpy().astype("datetime64[us]")
        idx = np.searchsorted(starts, ts, side="right") - 1
        ok = idx >= 0
        inside = np.zeros(len(ts), dtype=bool)
        inside[ok] = ts[ok] < ends[idx[ok]]
        sub = pd.DataFrame({
            "window_id": idx[inside].astype(np.int64),
            "event_type": df["event_type"].to_numpy()[inside],
            "n_events": np.int64(1),
        })
        g = (sub.groupby(["window_id", "event_type"], as_index=False)
                [["n_events"]].sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    return _grouped_sum(ds, ["window_id", "event_type"], partial,
                        ["n_events"])


# ---------------------------------------------------------------------------
# semi-structured: JSON property extraction + typed aggregate
# ---------------------------------------------------------------------------

def json_props(sf_dir: str, *, path: str = "$.k"):
    """Semi-structured column handling: parse the ``events.props`` JSON
    string column, extract an integer property (JSONPath ``path``), and
    aggregate per event_type — ``(n_events, k_sum, k_min, k_max,
    k_nulls)``, all int64.

    The extraction kernel is polars' native ``str.json_path_match`` (a
    vectorized Rust JSON parser — no Python row loop), then a strict
    string→int64 cast where non-integers and missing paths become NULL —
    the same law as DuckDB ``TRY_CAST(json_extract_string(props, path) AS
    BIGINT)``, so the oracle hash-matches (NULL-k rows count in
    ``k_nulls`` and nowhere else; all-NULL groups coalesce min/max to 0).

    Scale shape: per-batch partials pre-aggregate to ≤ |event_type| rows
    (count/sum/min/max/nonnull are all mergeable), then one tiny
    hash-bucketed combine (~64 Ray groups however many event types
    exist) — the classic combiner pattern, no wide shuffle of raw rows.
    """
    import polars as pl

    ds = _read(sf_dir, "events", ["event_type", "props"])
    I64 = np.iinfo(np.int64)

    def partial(df: pd.DataFrame) -> pa.Table:
        k = pl.from_pandas(df["props"]).str.json_path_match(path) \
            .cast(pl.Int64, strict=False).to_pandas()
        g = pd.DataFrame({"event_type": df["event_type"], "k": k}) \
            .groupby("event_type", as_index=False) \
            .agg(n_events=("k", "size"), k_sum=("k", "sum"),
                 k_min=("k", "min"), k_max=("k", "max"),
                 k_nonnull=("k", "count"))
        # sentinel min/max so the merge is a plain min/max; resolved
        # against k_nonnull in the final combine.  NOT via fillna(I64.max):
        # that routes through float64, where float(2^63-1) rounds UP to
        # 2^63 and the int64 cast wraps to I64.min — fill in int space.
        def fill_int(col: pd.Series, sentinel: int) -> np.ndarray:
            v = col.to_numpy(np.float64, na_value=np.nan)
            out = np.full(len(v), sentinel, np.int64)
            m = ~np.isnan(v)
            out[m] = v[m].astype(np.int64)
            return out

        g["k_min"] = fill_int(g["k_min"], I64.max)
        g["k_max"] = fill_int(g["k_max"], I64.min)
        g["k_sum"] = g["k_sum"].fillna(0).astype(np.int64)
        g["n_events"] = g["n_events"].astype(np.int64)
        g["k_nonnull"] = g["k_nonnull"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def combine(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby("event_type", as_index=False).agg(
            n_events=("n_events", "sum"), k_sum=("k_sum", "sum"),
            k_min=("k_min", "min"), k_max=("k_max", "max"),
            k_nonnull=("k_nonnull", "sum"))
        none = agg["k_nonnull"] == 0
        agg.loc[none, ["k_min", "k_max"]] = 0
        agg["k_nulls"] = agg["n_events"] - agg["k_nonnull"]
        return pa.Table.from_pandas(
            agg[["event_type", "n_events", "k_sum", "k_min", "k_max",
                 "k_nulls"]], preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pandas")
    # coarse-bucket the combine (hash(event_type) % 64): each key's
    # partials co-locate in one bucket while the shuffle stays ~64 Ray
    # groups even with 10^4+ event types (the tiny-group pathology guard;
    # combine() already groups by event_type inside the bucket)
    return _bucket_tag(partials, ["event_type"], 64, out_col="_pb") \
        .groupby("_pb").map_groups(combine, batch_format="pandas")


# ---------------------------------------------------------------------------
# streaming-style event dedup (repeat suppression within a time window)
# ---------------------------------------------------------------------------

def event_dedup(sf_dir: str, *, window_seconds: int = 3600,
                n_buckets: int = 256):
    """Repeat-event suppression — the streaming-ETL dedup that drops an
    event when the same ``(user_id, event_type)`` fired within
    ``window_seconds`` before it.  Per event: ``(event_id, user_id,
    event_type, gap_us, is_dup)`` where ``gap_us`` is the microsecond gap
    to the previous same-key event ordered by ``(ts, event_id)``
    (−1 for the first of its key — the SQL ``COALESCE(lag-diff, −1)``)
    and ``is_dup = 1`` iff ``0 <= gap_us <= window_seconds·10⁶``.

    Scale shape: the sessionize machinery — users hash-bucketed into
    ``n_buckets`` coarse groups, then ONE vectorized sort + diff per
    bucket serves every key in it (no per-key Python, no per-key Ray
    group).  Partitioning assumption (documented, same as sessionize):
    one key's events fit one bucket group; whale keys would take the
    salt+stitch variant.
    """
    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type",
                                  "ts"])
    win_us = np.int64(window_seconds) * 1_000_000

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "event_type", "ts", "event_id"],
                          kind="mergesort")
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        n = len(g)
        if not n:
            return pa.table({
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "gap_us": pa.array([], pa.int64()),
                "is_dup": pa.array([], pa.int64()),
            })
        new_key = _segment_starts(g["user_id"].to_numpy(),
                                  g["event_type"].to_numpy())
        gap = np.empty(n, np.int64)
        gap[0] = -1
        gap[1:] = ts[1:] - ts[:-1]
        gap[new_key] = -1
        dup = ((gap >= 0) & (gap <= win_us)).astype(np.int64)
        return pa.table({
            "event_id": pa.array(g["event_id"].to_numpy(np.int64),
                                 pa.int64()),
            "user_id": pa.array(g["user_id"].to_numpy(np.int64),
                                pa.int64()),
            "event_type": pa.array(g["event_type"].to_numpy(),
                                   pa.string()),
            "gap_us": pa.array(gap, pa.int64()),
            "is_dup": pa.array(dup, pa.int64()),
        })

    return _bucket_tag(ds, ["user_id"], n_buckets) \
        .groupby("_ub").map_groups(per_bucket, batch_format="pandas")


# ---------------------------------------------------------------------------
# long→wide pivot (reshape)
# ---------------------------------------------------------------------------

PIVOT_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


def pivot_events(sf_dir: str, *,
                 types: tuple[str, ...] = PIVOT_EVENT_TYPES):
    """Long→wide pivot: one row per user with one count column per event
    type — the reshape every feature-engineering pipeline needs.  The
    pivoted column set is DECLARED (``types``), the standard engine
    contract for pivot: a data-dependent column set would make the
    output schema nondeterministic mid-stream.  Types outside the list
    are ignored (they'd be columns the caller didn't declare).

    Scale shape: the crosstab partial collapses each batch to
    ≤ |users-in-batch| rows before the grouped-sum combine
    (:func:`_grouped_sum` — coarse-bucketed, no per-user Ray groups).
    """
    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    cols = [f"n_{t}" for t in types]

    def partial(df: pd.DataFrame) -> pa.Table:
        d = pd.DataFrame({"user_id": df["user_id"]})
        et = df["event_type"].to_numpy()
        for t, c in zip(types, cols):
            d[c] = (et == t).astype(np.int64)
        g = d.groupby("user_id", as_index=False)[cols].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    return _grouped_sum(ds, ["user_id"], partial, cols)


# ---------------------------------------------------------------------------
# generic-join demo: two-level dimension join via stages.joins
# ---------------------------------------------------------------------------

def nation_revenue(sf_dir: str):
    """Revenue per nation (orders ⋈ customer ⋈ nation) built on the
    GENERIC join primitive (:func:`~..stages.joins.bucket_hash_join`)
    rather than an op-specific join — the reusable API surface.

    Scale plan: orders are pre-aggregated per custkey inside map_batches
    BEFORE the join (the combiner-before-shuffle rule: the join input is
    one row per (batch, custkey), not per order), joined to customer on
    the coarse-bucket hash join, re-aggregated per nation (tiny), and
    the 25-row nation dim joins last — via :func:`~..stages.joins.
    broadcast_join` (shuffling a 25-row table through a distributed sort
    is the documented small-sf latency trap; the broadcast twin is the
    right plan for a dim that size and cut ~5 s at sf0.1).  All money in
    integer cents.
    """
    from ray.data.aggregate import Sum

    from ..stages.joins import bucket_hash_join

    ords = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def part(df: pd.DataFrame) -> pa.Table:
        g = (df.assign(revenue_c=_cents(df["o_totalprice"].to_numpy()),
                       n_orders=np.int64(1))
               .groupby("o_custkey", as_index=False)
               [["revenue_c", "n_orders"]].sum())
        g = g.rename(columns={"o_custkey": "c_custkey"})
        return pa.Table.from_pandas(g, preserve_index=False)

    po = ords.map_batches(part, batch_format="pandas")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j = bucket_hash_join(po, cust, on="c_custkey", how="inner")

    def per_nation(df: pd.DataFrame) -> pa.Table:
        g = (df.groupby("c_nationkey", as_index=False)
               [["revenue_c", "n_orders"]].sum())
        g["n_nationkey"] = g.pop("c_nationkey").astype(np.int64)
        g["revenue_c"] = g["revenue_c"].astype(np.int64)
        g["n_orders"] = g["n_orders"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    per_nat = j.map_batches(per_nation, batch_format="pandas") \
        .groupby("n_nationkey").aggregate(
            Sum("revenue_c", alias_name="revenue_c"),
            Sum("n_orders", alias_name="n_orders"))
    from ..stages.joins import broadcast_join

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    # left_cols bypasses the schema probe on per_nat (an aggregate
    # output — probing it executes the whole join+aggregate to limit 1)
    out = broadcast_join(per_nat, nation, on="n_nationkey", how="inner",
                         left_cols=["n_nationkey", "revenue_c", "n_orders"])

    import pyarrow.compute as _pc

    def final(t: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": t.column("n_name"),
            "revenue_c": _pc.cast(t.column("revenue_c"), pa.int64()),
            "n_orders": _pc.cast(t.column("n_orders"), pa.int64()),
        })

    return out.map_batches(final, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# time-decayed aggregate (feature engineering over event streams)
# ---------------------------------------------------------------------------

def decay_sum(sf_dir: str, *, halflife_days: int = 7):
    """Per-user exponentially time-decayed value sum — the recency-weighted
    feature every behavioural model wants.  The decay is the INTEGER
    half-life law ``decayed = cents >> min(age_days // halflife_days, 62)``
    (each elapsed half-life halves the contribution, floor semantics), so
    every value is exact int64 and the DuckDB oracle hash-compares — a
    float ``exp(-age/tau)`` weight could never be summed order-independently.

    ``age_days`` is measured against the corpus max timestamp (one tiny
    ``max()`` aggregate = one extra streaming pass; the reference point
    must be global for the law to be deterministic).  Values are
    non-negative cents, so ``>>`` == floor-division by 2^s on both sides.

    Output: ``(user_id, decay_cents, n_events)``.

    Scale shape: map-only partial per (batch × user) then the coarse-bucket
    grouped-sum combine — shuffle carries one row per (batch, user).
    """
    import pandas as pd

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])
    ref_us = np.int64(pd.Timestamp(ds.max("ts")).value // 1000)
    us_per_day = np.int64(86_400_000_000)
    hl = np.int64(halflife_days)

    def partial(df: pd.DataFrame) -> pa.Table:
        ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        cents = _cents(df["value"].to_numpy())
        shift = np.minimum((ref_us - ts_us) // us_per_day // hl,
                           np.int64(62))
        out = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "decay_cents": cents >> shift,
            "n_events": np.int64(1),
        })
        g = out.groupby("user_id", as_index=False)[
            ["decay_cents", "n_events"]].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    return _grouped_sum(ds, ["user_id"], partial,
                        ["decay_cents", "n_events"])


# ---------------------------------------------------------------------------
# RFM customer segmentation
# ---------------------------------------------------------------------------

# fixed integer scoring grid (documented constants, shared with the SQL
# oracle): score 4..1 by recency/frequency/monetary thresholds
_RFM_R_DAYS = (180, 365, 730)          # <=180d -> 4, <=365 -> 3, <=730 -> 2
_RFM_F = (12, 8, 4)                    # >=12 orders -> 4, >=8 -> 3, >=4 -> 2
_RFM_M_CENTS = (300_000_000, 200_000_000, 100_000_000)


def _rfm_score(x: np.ndarray, cuts: tuple[int, int, int],
               ascending: bool) -> np.ndarray:
    """4/3/2/1 against three cut points; ``ascending=True`` means smaller
    is better (recency), else larger is better (frequency/monetary)."""
    a, b, c = (np.int64(v) for v in cuts)
    if ascending:
        return np.where(x <= a, 4, np.where(x <= b, 3,
                        np.where(x <= c, 2, 1))).astype(np.int64)
    return np.where(x >= a, 4, np.where(x >= b, 3,
                    np.where(x >= c, 2, 1))).astype(np.int64)


def rfm_segments(sf_dir: str, *, n_buckets: int = 64):
    """RFM customer segmentation — the classic CRM feature table: per
    customer ``recency_days`` (days since last order, against the corpus
    max order date), ``frequency`` (order count), ``monetary_cents``
    (total spend in integer cents) and the composite ``rfm`` code
    (r·100 + f·10 + m, each scored 4..1 on the fixed grid above).

    All-integer law: cents = floor(price·100 + 0.5) per order; days =
    floor microsecond diff / 86400e6 — both reproducible in SQL.

    Scale shape: the global reference date is ONE tiny ``max()``
    aggregate (a scalar, same as decay_sum); per-batch partials reduce to
    (customer, last_ts, n, cents) so the shuffle carries one row per
    (batch, customer); customers are combined in coarse hash buckets and
    scored vectorized in the same pass — nothing but the scalar ever
    reaches the driver.
    """
    import pandas as pd

    ds = _read(sf_dir, "orders",
               ["o_custkey", "o_orderdate", "o_totalprice"])
    gmax_us = np.int64(pd.Timestamp(ds.max("o_orderdate")).value // 1000)
    us_per_day = np.int64(86_400_000_000)

    def partial(df: pd.DataFrame) -> pa.Table:
        ts_us = df["o_orderdate"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        g = pd.DataFrame({
            "o_custkey": df["o_custkey"].to_numpy(np.int64),
            "last_ts": ts_us,
            "frequency": np.int64(1),
            "monetary_cents": _cents(df["o_totalprice"].to_numpy()),
        }).groupby("o_custkey", as_index=False).agg(
            last_ts=("last_ts", "max"), frequency=("frequency", "sum"),
            monetary_cents=("monetary_cents", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    def combine(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return pa.table({"o_custkey": pa.array([], pa.int64()),
                             "recency_days": pa.array([], pa.int64()),
                             "frequency": pa.array([], pa.int64()),
                             "monetary_cents": pa.array([], pa.int64()),
                             "rfm": pa.array([], pa.int64())})
        c = g.groupby("o_custkey", as_index=False).agg(
            last_ts=("last_ts", "max"), frequency=("frequency", "sum"),
            monetary_cents=("monetary_cents", "sum"))
        rec = (gmax_us - c["last_ts"].to_numpy(np.int64)) // us_per_day
        freq = c["frequency"].to_numpy(np.int64)
        mon = c["monetary_cents"].to_numpy(np.int64)
        rfm = (_rfm_score(rec, _RFM_R_DAYS, True) * 100
               + _rfm_score(freq, _RFM_F, False) * 10
               + _rfm_score(mon, _RFM_M_CENTS, False))
        return pa.table({
            "o_custkey": pa.array(c["o_custkey"].to_numpy(np.int64),
                                  pa.int64()),
            "recency_days": pa.array(rec, pa.int64()),
            "frequency": pa.array(freq, pa.int64()),
            "monetary_cents": pa.array(mon, pa.int64()),
            "rfm": pa.array(rfm, pa.int64()),
        })

    return _bucket_tag(ds.map_batches(partial, batch_format="pandas"),
                       ["o_custkey"], n_buckets) \
        .groupby("_ub").map_groups(combine, batch_format="pandas")


# ---------------------------------------------------------------------------
# golden record (ER survivorship)
# ---------------------------------------------------------------------------

def golden_record(sf_dir: str, *, n_buckets: int = 64):
    """ER survivorship: fuse each entity's records into one canonical
    ("golden") row — per customer the MODAL order priority and status
    (ties → lexicographically smallest value, the deterministic
    survivorship rule), plus ``n_orders`` and ``last_ts_us`` (latest order
    date in epoch µs).  The standard master-data step after clustering:
    many records per entity in, one authoritative record out.

    Scale shape: per-batch partials reduce to one row per (customer,
    priority, status) — priorities×statuses is a small constant, so the
    shuffle carries O(constant) rows per (batch, customer); customers are
    combined in coarse hash buckets where the two modal margins and the
    meta aggregates all derive vectorized from the SAME count table.
    """
    import pandas as pd

    ds = _read(sf_dir, "orders",
               ["o_custkey", "o_orderpriority", "o_orderstatus",
                "o_orderdate"])

    def partial(df: pd.DataFrame) -> pa.Table:
        ts_us = df["o_orderdate"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        g = pd.DataFrame({
            "o_custkey": df["o_custkey"].to_numpy(np.int64),
            "prio": df["o_orderpriority"],
            "status": df["o_orderstatus"],
            "c": np.int64(1),
            "last_ts_us": ts_us,
        }).groupby(["o_custkey", "prio", "status"], as_index=False).agg(
            c=("c", "sum"), last_ts_us=("last_ts_us", "max"))
        return pa.Table.from_pandas(g, preserve_index=False)

    def _modal(cc: pd.DataFrame, col: str, out: str) -> pd.DataFrame:
        m = cc.groupby(["o_custkey", col], as_index=False)["c"].sum() \
            .sort_values(["o_custkey", "c", col],
                         ascending=[True, False, True], kind="mergesort")
        m = m.drop_duplicates("o_custkey", keep="first")
        return m[["o_custkey", col]].rename(columns={col: out})

    def combine(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return pa.table({"o_custkey": pa.array([], pa.int64()),
                             "top_priority": pa.array([], pa.string()),
                             "top_status": pa.array([], pa.string()),
                             "n_orders": pa.array([], pa.int64()),
                             "last_ts_us": pa.array([], pa.int64())})
        cc = g.groupby(["o_custkey", "prio", "status"], as_index=False) \
            .agg(c=("c", "sum"), last_ts_us=("last_ts_us", "max"))
        meta = cc.groupby("o_custkey", as_index=False).agg(
            n_orders=("c", "sum"), last_ts_us=("last_ts_us", "max"))
        out = meta.merge(_modal(cc, "prio", "top_priority"),
                         on="o_custkey") \
            .merge(_modal(cc, "status", "top_status"), on="o_custkey")
        return pa.table({
            "o_custkey": pa.array(out["o_custkey"].to_numpy(np.int64),
                                  pa.int64()),
            "top_priority": pa.array(out["top_priority"], pa.string()),
            "top_status": pa.array(out["top_status"], pa.string()),
            "n_orders": pa.array(out["n_orders"].to_numpy(np.int64),
                                 pa.int64()),
            "last_ts_us": pa.array(out["last_ts_us"].to_numpy(np.int64),
                                   pa.int64()),
        })

    return _bucket_tag(ds.map_batches(partial, batch_format="pandas"),
                       ["o_custkey"], n_buckets) \
        .groupby("_ub").map_groups(combine, batch_format="pandas")


# ---------------------------------------------------------------------------
# ordered funnel (product analytics)
# ---------------------------------------------------------------------------

FUNNEL_STAGES = ("view", "click", "purchase")


def funnel_counts(sf_dir: str, *, stages: tuple[str, ...] = FUNNEL_STAGES,
                  n_buckets: int = 64):
    """Strict ordered funnel by first occurrence: a user completes stage k
    iff their first stage-k event happened strictly AFTER their first
    stage-(k-1) event (the classic product-analytics funnel law; ties
    fail strict order).  Output one row per stage:
    ``(stage_idx, stage, n_users)`` with ``n_users`` = users whose funnel
    depth reaches that stage.

    Scale shape: per-(batch × user × stage) min-timestamp partials → one
    coarse-bucket min-combine (users colocated by hash) where depth is
    computed vectorized per bucket → per-bucket depth-count partials
    (≤ |stages| rows each) → one tiny Sum shuffle over |stages| keys.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])
    stage_idx = {s: i for i, s in enumerate(stages)}
    k = len(stages)

    def partial(df: pd.DataFrame) -> pa.Table:
        m = df[df["event_type"].isin(stage_idx)].copy()
        if not len(m):
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "_si": pa.array([], pa.int64()),
                             "_t": pa.array([], pa.int64())})
        m["_si"] = m["event_type"].map(stage_idx).astype(np.int64)
        m["_t"] = m["ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        g = m.groupby(["user_id", "_si"], as_index=False)["_t"].min()
        return pa.Table.from_pandas(
            g.astype({"user_id": np.int64}), preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        # users are colocated: exact per-(user, stage) first-ts, then the
        # strict-order depth, all vectorized on a (n_users × k) pivot.
        m = g.groupby(["user_id", "_si"], as_index=False)["_t"].min()
        piv = m.pivot(index="user_id", columns="_si", values="_t")
        # NaN init, NOT a sentinel: a stage no user in this bucket hit is
        # a missing pivot COLUMN and must read as "absent" for every row.
        t = np.full((len(piv), k), np.nan, np.float64)
        for c in piv.columns:
            t[:, int(c)] = piv[c].to_numpy()
        depth = np.where(np.isnan(t[:, 0]), 0, 1).astype(np.int64)
        alive = depth == 1
        for i in range(1, k):
            alive = alive & ~np.isnan(t[:, i]) & (t[:, i] > t[:, i - 1])
            depth[alive] = i + 1
        counts = [(depth >= i + 1).sum() for i in range(k)]
        return pa.table({"stage_idx": pa.array(range(k), pa.int64()),
                         "n_users": pa.array(counts, pa.int64())})

    parts = _bucket_tag(ds.map_batches(partial, batch_format="pandas"),
                        ["user_id"], n_buckets) \
        .groupby("_ub").map_groups(per_bucket, batch_format="pandas")
    # degenerate-corpus parity: the oracle's VALUES list emits every
    # stage row even when no user qualifies — seed zero-count partials
    # so the Sum always yields the fixed |stages| rows.
    import ray.data as rd
    seed = rd.from_arrow(pa.table({
        "stage_idx": pa.array(range(k), pa.int64()),
        "n_users": pa.array([0] * k, pa.int64())}))
    agg = parts.union(seed).groupby("stage_idx").aggregate(
        Sum("n_users", alias_name="n_users"))

    names = list(stages)

    def add_name(t: pa.Table) -> pa.Table:
        si = t.column("stage_idx").to_numpy()
        return pa.table({
            "stage_idx": t.column("stage_idx"),
            "stage": pa.array([names[i] for i in si], pa.string()),
            "n_users": t.column("n_users"),
        })

    return agg.map_batches(add_name, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# week-over-week retention (cohort analytics)
# ---------------------------------------------------------------------------

def user_retention(sf_dir: str, *, n_buckets: int = 64):
    """Week-over-week retention: for each absolute epoch week ``w``
    (``epoch_us // (7·86400·10⁶)``), ``active_users`` = distinct users
    with any event in ``w`` and ``retained_next`` = those also active in
    ``w+1`` — the cohort-retention table.

    Scale shape: per-batch distinct-(user, week) partials cut the shuffle
    to one row per (batch, user, week); users are then hash-bucketed so
    each bucket holds ALL weeks of its users (global distinct + the
    week/week+1 self-match are exact in-bucket, one vectorized merge);
    per-bucket per-week partial counts → one tiny Sum shuffle over ≤
    |weeks| keys.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    us_per_week = np.int64(7 * 86_400_000_000)
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pa.Table:
        week = (df["ts"].to_numpy().astype("datetime64[us]")
                .astype(np.int64) // us_per_week)
        g = pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                          "week": week}).drop_duplicates()
        return pa.Table.from_pandas(g, preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        uw = g[["user_id", "week"]].drop_duplicates()
        act = uw.groupby("week").size()
        nxt = uw.assign(week=uw["week"] - 1)
        ret = uw.merge(nxt, on=["user_id", "week"]).groupby("week").size()
        out = pd.DataFrame({"week": act.index.to_numpy(np.int64),
                            "active_users": act.to_numpy(np.int64)})
        out["retained_next"] = ret.reindex(act.index, fill_value=0) \
            .to_numpy(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = _bucket_tag(ds.map_batches(partial, batch_format="pandas"),
                        ["user_id"], n_buckets) \
        .groupby("_ub").map_groups(per_bucket, batch_format="pandas")
    return parts.groupby("week").aggregate(
        Sum("active_users", alias_name="active_users"),
        Sum("retained_next", alias_name="retained_next"))


# ---------------------------------------------------------------------------
# trailing-window distinct users (windowed COUNT DISTINCT)
# ---------------------------------------------------------------------------

def rolling_active(sf_dir: str, *, window_days: int = 7,
                   n_buckets: int = 64):
    """Trailing-window active users: for each absolute epoch day ``d``
    with any activity, ``wau`` = distinct users active in
    ``[d − window+1, d]`` (the 7-day-active-users metric).  Windowed
    COUNT DISTINCT doesn't decompose like a sum, so the law is rewritten
    as membership: a (user, day) activity CONTRIBUTES the user to window
    days ``d .. d+window−1``; wau(d) = |distinct (user) over contributed
    days| — an explode + distinct + count, exact at any scale.

    Scale shape: per-batch distinct (user, day) partials → user-hash
    buckets where each user's cross-batch dedupe and ×window day explode
    are exact (dedupe (user, wday) per user needs only that user's rows)
    → per-bucket per-wday counts → one Sum shuffle over ≤ |days| keys.
    Only days with observed activity are reported (both sides).
    """
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    us_per_day = np.int64(86_400_000_000)
    w = int(window_days)
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pa.Table:
        day = (df["ts"].to_numpy().astype("datetime64[us]")
               .astype(np.int64) // us_per_day)
        g = pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                          "day": day}).drop_duplicates()
        return pa.Table.from_pandas(g, preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        uw = g[["user_id", "day"]].drop_duplicates()
        n = len(uw)
        days = np.repeat(uw["day"].to_numpy(np.int64), w) + \
            np.tile(np.arange(w, dtype=np.int64), n)
        users = np.repeat(uw["user_id"].to_numpy(np.int64), w)
        m = pd.DataFrame({"user_id": users, "wday": days}) \
            .drop_duplicates()
        c = m.groupby("wday").size()
        # same-day active markers ride along: dau for free, and the
        # phantom trailing window days (dau = 0) filter on it at the end
        o = uw.groupby("day").size()
        out = pd.DataFrame({"day": c.index.to_numpy(np.int64),
                            "wau": c.to_numpy(np.int64)})
        out["dau"] = o.reindex(c.index, fill_value=0).to_numpy(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = _bucket_tag(ds.map_batches(partial, batch_format="pandas"),
                        ["user_id"], n_buckets) \
        .groupby("_ub").map_groups(per_bucket, batch_format="pandas")
    agg = parts.groupby("day").aggregate(Sum("dau", alias_name="dau"),
                                         Sum("wau", alias_name="wau"))

    def finish(t: pa.Table) -> pa.Table:
        keep = pc.greater(t.column("dau"), 0)
        t = t.filter(keep)
        return pa.table({
            "day": t.column("day").cast(pa.int64()),
            "dau": t.column("dau").cast(pa.int64()),
            "wau": t.column("wau").cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# referential-integrity audit (semi/anti join demo)
# ---------------------------------------------------------------------------

def fk_violations(sf_dir: str):
    """Data-validation audit over the warehouse FKs: row counts for
    ``customers_without_orders`` (legitimate — inactive customers),
    ``orders_missing_customer`` and ``lineitem_missing_order`` (true
    referential violations, 0 on healthy data).  Each check is one
    distributed ANTI join (``stages.joins.bucket_hash_join(how="anti")``
    — the right side ships only distinct keys), counted; the three
    scalars land in one tiny summary table.
    """
    import pandas as pd

    from ..stages.joins import bucket_hash_join

    def rekey(ds, src: str, dst: str):
        return ds.map_batches(
            lambda t: pa.table({dst: t.column(src)}),
            batch_format="pyarrow")

    cust = _read(sf_dir, "customer", ["c_custkey"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    line = _read(sf_dir, "lineitem", ["l_orderkey"])

    checks = {
        "customers_without_orders": bucket_hash_join(
            cust, rekey(orders, "o_custkey", "c_custkey"),
            on="c_custkey", how="anti"),
        "lineitem_missing_order": bucket_hash_join(
            rekey(line, "l_orderkey", "o_orderkey"),
            rekey(orders, "o_orderkey", "o_orderkey"),
            on="o_orderkey", how="anti"),
        "orders_missing_customer": bucket_hash_join(
            rekey(orders, "o_custkey", "c_custkey"), cust,
            on="c_custkey", how="anti"),
    }
    return pd.DataFrame(
        [{"check_name": k, "n": int(ds.count())}
         for k, ds in checks.items()])


# ---------------------------------------------------------------------------
# generic column profiler (data-quality reporting)
# ---------------------------------------------------------------------------

def profile_table(sf_dir: str, *, table: str = "orders",
                  columns: tuple[str, ...] = ("o_custkey", "o_orderstatus",
                                              "o_totalprice"),
                  n_buckets: int = 64):
    """Generic column profiler — the data-quality report every warehouse
    load starts with.  Per declared column: ``(column, n_rows, n_nulls,
    n_distinct, min_v, max_v)``.  min/max render as strings in ONE
    uniform schema, but are computed TYPED first (ints as ints, floats in
    integer cents — the repo's money law — and strings in binary
    collation), so '10' < '9' string order is never consulted and float
    rendering can't drift from SQL.

    Scale shape: one pass computes per-batch typed (n_rows, n_nulls,
    min, max) partials per column (≤ |columns| rows per batch, merged in
    one tiny group); n_distinct ships per-batch DISTINCT (column, value)
    rows into (column, value) hash-buckets — exact, one row per distinct
    value per batch, never the table.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, table, list(columns))

    def typed_minmax(col: pd.Series):
        """-> (is_num, min_n, max_n, min_s, max_s) with numerics mapped to
        the integer law (floats -> cents; monotone, so min commutes)."""
        nonnull = col.dropna()
        if not len(nonnull):
            return 1, None, None, None, None
        if pd.api.types.is_float_dtype(col):
            v = np.floor(nonnull.to_numpy(np.float64) * 100.0 + 0.5) \
                .astype(np.int64)
            return 1, int(v.min()), int(v.max()), None, None
        if pd.api.types.is_integer_dtype(col):
            v = nonnull.to_numpy(np.int64)
            return 1, int(v.min()), int(v.max()), None, None
        return 0, None, None, str(nonnull.min()), str(nonnull.max())

    def scalar_partial(df: pd.DataFrame) -> pa.Table:
        rows = []
        for c in columns:
            is_num, mn, mx, ms, xs = typed_minmax(df[c])
            rows.append({"column": c, "n_rows": np.int64(len(df[c])),
                         "n_nulls": np.int64(int(df[c].isna().sum())),
                         "is_num": np.int64(is_num),
                         "min_n": mn, "max_n": mx,
                         "min_s": ms, "max_s": xs})
        out = pd.DataFrame(rows)
        return pa.table({
            "column": pa.array(out["column"], pa.string()),
            "n_rows": pa.array(out["n_rows"], pa.int64()),
            "n_nulls": pa.array(out["n_nulls"], pa.int64()),
            "is_num": pa.array(out["is_num"], pa.int64()),
            "min_n": pa.array(out["min_n"], pa.int64()),
            "max_n": pa.array(out["max_n"], pa.int64()),
            "min_s": pa.array(out["min_s"], pa.string()),
            "max_s": pa.array(out["max_s"], pa.string()),
        })

    def scalar_combine(g: pd.DataFrame) -> pa.Table:
        rows = []
        for c, sub in g.groupby("column"):
            num = bool(sub["is_num"].iloc[0])
            mn = sub["min_n"].dropna() if num else sub["min_s"].dropna()
            mx = sub["max_n"].dropna() if num else sub["max_s"].dropna()
            lo = None if not len(mn) else \
                (str(int(mn.min())) if num else str(mn.min()))
            hi = None if not len(mx) else \
                (str(int(mx.max())) if num else str(mx.max()))
            rows.append({"column": c,
                         "n_rows": int(sub["n_rows"].sum()),
                         "n_nulls": int(sub["n_nulls"].sum()),
                         "min_v": lo, "max_v": hi})
        out = pd.DataFrame(rows)
        return pa.table({
            "column": pa.array(out["column"], pa.string()),
            "n_rows": pa.array(out["n_rows"], pa.int64()),
            "n_nulls": pa.array(out["n_nulls"], pa.int64()),
            "min_v": pa.array(out["min_v"], pa.string()),
            "max_v": pa.array(out["max_v"], pa.string()),
        })

    scalars = ds.map_batches(scalar_partial, batch_format="pandas") \
        .map_batches(lambda df: pa.Table.from_pandas(
            df.assign(_one=np.int64(0)), preserve_index=False),
            batch_format="pandas") \
        .groupby("_one").map_groups(
            lambda g: scalar_combine(g.drop(columns=["_one"])),
            batch_format="pandas")

    def distinct_partial(df: pd.DataFrame) -> pa.Table:
        frames = []
        for c in columns:
            v = df[c].dropna().astype(str).drop_duplicates()
            frames.append(pd.DataFrame({"column": c, "v": v}))
        out = pd.concat(frames, ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        c = g[["column", "v"]].drop_duplicates().groupby("column").size()
        return pa.table({
            "column": pa.array(c.index.to_numpy(), pa.string()),
            "n_distinct": pa.array(c.to_numpy(np.int64), pa.int64()),
        })

    dist = _bucket_tag(ds.map_batches(distinct_partial,
                                      batch_format="pandas"),
                       ["column", "v"], n_buckets) \
        .groupby("_ub").map_groups(per_bucket, batch_format="pandas") \
        .groupby("column").aggregate(Sum("n_distinct",
                                         alias_name="n_distinct"))

    from ..stages.joins import bucket_hash_join

    # explicit types: both inputs are aggregate outputs, and a
    # Dataset.schema() probe on an un-executed AllToAll runs it to
    # limit 1 (a full shuffle just for column names)
    j = bucket_hash_join(
        scalars, dist, on="column", how="inner",
        left_types={"column": pa.string(), "n_rows": pa.int64(),
                    "n_nulls": pa.int64(), "min_v": pa.string(),
                    "max_v": pa.string()},
        right_types={"column": pa.string(), "n_distinct": pa.int64()})

    def finish(df: pd.DataFrame) -> pa.Table:
        return pa.table({
            "column": pa.array(df["column"].to_numpy(), pa.string()),
            "n_rows": pa.array(df["n_rows"].to_numpy(np.int64),
                               pa.int64()),
            "n_nulls": pa.array(df["n_nulls"].to_numpy(np.int64),
                                pa.int64()),
            "n_distinct": pa.array(df["n_distinct"].to_numpy(np.int64),
                                   pa.int64()),
            "min_v": pa.array(df["min_v"].to_numpy(), pa.string()),
            "max_v": pa.array(df["max_v"].to_numpy(), pa.string()),
        })

    return j.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# conversion-delay percentiles (funnel timing)
# ---------------------------------------------------------------------------

def conversion_time(sf_dir: str, *, from_type: str = "view",
                    to_type: str = "purchase", n_buckets: int = 64,
                    q_bps: tuple[int, ...] = (2500, 5000, 7500, 9000)):
    """Funnel timing: exact percentiles of the first-``from`` →
    first-``to`` delay over converting users (strictly ordered, the
    funnel_counts law), in whole seconds.  One row per requested
    percentile: ``(q_bp, delay_s)`` under the peers-inclusive rule
    ``delay = min v with cum·10⁴ ≥ q_bp·N`` (the length_quantiles law).

    Scale shape: per-(user, type) min-ts partials → user buckets compute
    each user's delay → per-batch (delay, count) histogram partials →
    one Sum shuffle over DISTINCT delays → the percentile scan runs in
    one tiny group over distinct values (never the users).
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])
    idx = {from_type: 0, to_type: 1}

    def partial(df: pd.DataFrame) -> pa.Table:
        m = df[df["event_type"].isin(idx)].copy()
        if not len(m):
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "_si": pa.array([], pa.int64()),
                             "_t": pa.array([], pa.int64())})
        m["_si"] = m["event_type"].map(idx).astype(np.int64)
        m["_t"] = m["ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        g = m.groupby(["user_id", "_si"], as_index=False)["_t"].min()
        return pa.Table.from_pandas(
            g.astype({"user_id": np.int64}), preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        m = g.groupby(["user_id", "_si"], as_index=False)["_t"].min()
        piv = m.pivot(index="user_id", columns="_si", values="_t")
        if 0 not in piv.columns or 1 not in piv.columns:
            return pa.table({"delay_s": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        ok = piv[0].notna() & piv[1].notna() & (piv[1] > piv[0])
        delay = ((piv[1][ok] - piv[0][ok]).to_numpy(np.int64)
                 // 1_000_000)
        v, c = np.unique(delay, return_counts=True)
        return pa.table({"delay_s": pa.array(v, pa.int64()),
                         "c": pa.array(c.astype(np.int64), pa.int64())})

    # degenerate-corpus parity: with zero converting users the oracle
    # still emits one row per percentile (NULL delay_s) — a zero-count
    # seed keeps the final group alive without perturbing the histogram
    # (c=0 merges into a real delay-0 row or adds a cum-neutral value).
    import ray.data as rd
    seed = rd.from_arrow(pa.table({"delay_s": pa.array([0], pa.int64()),
                                   "c": pa.array([0], pa.int64())}))
    hist = _bucket_tag(ds.map_batches(partial, batch_format="pandas"),
                       ["user_id"], n_buckets) \
        .groupby("_ub").map_groups(per_bucket, batch_format="pandas") \
        .union(seed) \
        .groupby("delay_s").aggregate(Sum("c", alias_name="c"))

    qlist = list(q_bps)

    def cuts(g: pd.DataFrame) -> pa.Table:
        if not len(g) or "c" not in g.columns:
            # an empty map_groups block must emit NOTHING (emitting the
            # q rows here would duplicate the real group's output)
            return pa.table({"q_bp": pa.array([], pa.int64()),
                             "delay_s": pa.array([], pa.int64())})
        g = g.sort_values("delay_s", kind="mergesort")
        cum = g["c"].to_numpy(np.int64).cumsum()
        n = int(cum[-1]) if len(cum) else 0
        vs = g["delay_s"].to_numpy(np.int64)
        out = []
        for q in qlist:
            if n:
                out.append(int(vs[int((cum * 10_000 >= q * n).argmax())]))
            else:
                # zero converting users: the oracle's scalar subquery
                # returns NULL per percentile — match it exactly.
                out.append(None)
        return pa.table({
            "q_bp": pa.array(qlist, pa.int64()),
            "delay_s": pa.array(out, pa.int64()),
        })

    return hist.map_batches(
        lambda df: pa.Table.from_pandas(df.assign(_one=np.int64(0)),
                                        preserve_index=False),
        batch_format="pandas") \
        .groupby("_one").map_groups(
            lambda g: cuts(g.drop(columns=["_one"])),
            batch_format="pandas")


# ---------------------------------------------------------------------------
# rollup / grouping-sets aggregate
# ---------------------------------------------------------------------------

def revenue_rollup(sf_dir: str):
    """GROUPING-SETS rollup: revenue by (nation, status), (nation),
    (status) and grand total in ONE result — the OLAP cube slice every BI
    layer asks an engine for.  Rolled-up dimensions render as ``'ALL'``
    (== SQL ``CASE WHEN GROUPING(col) = 1``).

    Scale shape: ONE pass computes the finest-grain partials (per-batch
    (nation, status) cents/orders after a broadcast customer→nation
    probe), one Sum shuffle over ≤ |nations|·|statuses| keys, and the
    three coarser levels are derived from that TINY aggregate in a single
    final group — a rollup never needs more than the finest shuffle.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    from ..stages.joins import broadcast_join

    # 25-row nation dim captured in the closure; the customer→nation
    # probe goes through the GUARDED broadcast_join (one collect serves
    # guard + broadcast) instead of an unguarded full to_pandas() —
    # above max_rows it refuses loudly and the caller switches to
    # bucket_hash_join, per the repo's broadcast pattern.
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nmap = dict(zip(nat["n_nationkey"], nat["n_name"]))

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .map_batches(
            lambda df: pa.table({
                "o_custkey": pa.Array.from_pandas(df["c_custkey"]),
                "nation": pa.Array.from_pandas(
                    df["c_nationkey"].map(nmap), type=pa.string()),
            }),
            batch_format="pandas")

    ords = _read(sf_dir, "orders",
                 ["o_custkey", "o_orderstatus", "o_totalprice"])
    joined = broadcast_join(ords, cust, on="o_custkey", how="inner")

    def partial(df: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame({
            "nation": df["nation"],
            "status": df["o_orderstatus"],
            "revenue_c": _cents(df["o_totalprice"].to_numpy()),
            "n_orders": np.int64(1),
        })
        g = out.groupby(["nation", "status"], as_index=False)[
            ["revenue_c", "n_orders"]].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    fine = joined.map_batches(partial, batch_format="pandas") \
        .groupby(["nation", "status"]).aggregate(
            Sum("revenue_c", alias_name="revenue_c"),
            Sum("n_orders", alias_name="n_orders"))

    def rollup(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return pa.table({"nation": pa.array([], pa.string()),
                             "status": pa.array([], pa.string()),
                             "revenue_c": pa.array([], pa.int64()),
                             "n_orders": pa.array([], pa.int64())})
        frames = [g[["nation", "status", "revenue_c", "n_orders"]]]
        by_n = g.groupby("nation", as_index=False)[
            ["revenue_c", "n_orders"]].sum().assign(status="ALL")
        by_s = g.groupby("status", as_index=False)[
            ["revenue_c", "n_orders"]].sum().assign(nation="ALL")
        tot = pd.DataFrame([{
            "nation": "ALL", "status": "ALL",
            "revenue_c": g["revenue_c"].sum(),
            "n_orders": g["n_orders"].sum()}])
        out = pd.concat(frames + [by_n, by_s, tot], ignore_index=True)
        return pa.table({
            "nation": pa.array(out["nation"].to_numpy(), pa.string()),
            "status": pa.array(out["status"].to_numpy(), pa.string()),
            "revenue_c": pa.array(out["revenue_c"].to_numpy(np.int64),
                                  pa.int64()),
            "n_orders": pa.array(out["n_orders"].to_numpy(np.int64),
                                 pa.int64()),
        })

    return fine.map_batches(
        lambda df: pa.Table.from_pandas(df.assign(_one=np.int64(0)),
                                        preserve_index=False),
        batch_format="pandas") \
        .groupby("_one").map_groups(
            lambda g: rollup(g.drop(columns=["_one"])),
            batch_format="pandas")


# ---------------------------------------------------------------------------
# event-type transition matrix (behavior modeling)
# ---------------------------------------------------------------------------

def event_transitions(sf_dir: str, *, n_buckets: int = 256):
    """First-order Markov transition matrix over event types: for every
    consecutive pair within a user's stream (ordered ``(ts, event_id)`` —
    event_dedup's law), count ``from_type → to_type`` and report
    ``(from_type, to_type, n, p_bp)`` with ``p_bp = n·10⁴ //
    Σ_to n(from)`` — the behavior-model input and the funnel's
    unordered cousin.  A user's first event has no predecessor.

    Scale shape: users hash-bucketed, ONE vectorized sort + shift per
    bucket (no per-key groups), per-bucket pair counts → one Sum shuffle
    over ≤ |types|² keys; the row-normalization runs on that tiny table
    in a single final group.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type",
                                  "ts"])

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        et = g["event_type"].to_numpy()
        uid = g["user_id"].to_numpy()
        if len(g) < 2:
            return pa.table({"from_type": pa.array([], pa.string()),
                             "to_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        same = uid[1:] == uid[:-1]
        c = pd.DataFrame({"from_type": et[:-1][same],
                          "to_type": et[1:][same]}) \
            .groupby(["from_type", "to_type"], as_index=False).size() \
            .rename(columns={"size": "n"})
        return pa.Table.from_pandas(c, preserve_index=False)

    agg = _bucket_tag(ds, ["user_id"], n_buckets) \
        .groupby("_ub").map_groups(per_bucket, batch_format="pandas") \
        .groupby(["from_type", "to_type"]).aggregate(
            Sum("n", alias_name="n"))

    def normalize(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return pa.table({"from_type": pa.array([], pa.string()),
                             "to_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "p_bp": pa.array([], pa.int64())})
        tot = g.groupby("from_type")["n"].transform("sum") \
            .to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        return pa.table({
            "from_type": pa.array(g["from_type"].to_numpy(), pa.string()),
            "to_type": pa.array(g["to_type"].to_numpy(), pa.string()),
            "n": pa.array(n, pa.int64()),
            "p_bp": pa.array(n * 10_000 // np.maximum(tot, 1), pa.int64()),
        })

    return agg.map_batches(
        lambda df: pa.Table.from_pandas(df.assign(_one=np.int64(0)),
                                        preserve_index=False),
        batch_format="pandas") \
        .groupby("_one").map_groups(
            lambda g: normalize(g.drop(columns=["_one"])),
            batch_format="pandas")


# ---------------------------------------------------------------------------
# fixed-width value histogram
# ---------------------------------------------------------------------------

def value_histogram(sf_dir: str, *, bucket_cents: int = 100_000):
    """Fixed-width histogram of order values (the distribution panel
    behind every dashboard): bucket = ``cents // bucket_cents``, one row
    per non-empty bucket ``(bucket, lo_cents, n_orders, sum_cents)``.
    All-integer law (cents = floor(x·100+0.5)).

    Scale shape: per-batch bucket partials (≤ |buckets-in-batch| rows) →
    one Sum shuffle over ≤ |distinct buckets| keys — the driver never
    sees a row, only the shuffle does, and bucket cardinality is bounded
    by the value range, not the row count.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_totalprice"])
    w = np.int64(bucket_cents)

    def partial(df: pd.DataFrame) -> pa.Table:
        cents = _cents(df["o_totalprice"].to_numpy())
        b = cents // w
        g = pd.DataFrame({"bucket": b, "n_orders": np.int64(1),
                          "sum_cents": cents}) \
            .groupby("bucket", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = ds.map_batches(partial, batch_format="pandas") \
        .groupby("bucket").aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("sum_cents", alias_name="sum_cents"))

    def finish(t: pa.Table) -> pa.Table:
        b = t.column("bucket").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "bucket": pa.array(b, pa.int64()),
            "lo_cents": pa.array(b * w, pa.int64()),
            "n_orders": t.column("n_orders").cast(pa.int64()),
            "sum_cents": t.column("sum_cents").cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# supplier account-balance report (closes table coverage)
# ---------------------------------------------------------------------------

def supplier_balance(sf_dir: str):
    """Per-nation supplier report ``(n_name, n_suppliers, bal_cents,
    n_negative)`` — the last unexercised warehouse table (supplier) under
    the oracle.  Integer cents; negative balances counted (TPC-H plants
    them).  Broadcast the 25-row nation dim; per-batch partials → one
    Sum shuffle over ≤ |nations| keys.
    """
    import pandas as pd

    import ray
    from ray.data.aggregate import Sum

    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    name_of = dict(zip(nat["n_nationkey"].astype(np.int64),
                       nat["n_name"]))
    bc = ray.put(name_of)

    ds = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])

    class Partial:
        def __init__(self):
            self.name_of = ray.get(bc)

        def __call__(self, df: pd.DataFrame) -> pa.Table:
            cents = _cents(df["s_acctbal"].to_numpy())
            g = pd.DataFrame({
                "n_name": df["s_nationkey"].astype(np.int64)
                .map(self.name_of),
                "n_suppliers": np.int64(1),
                "bal_cents": cents,
                "n_negative": (cents < 0).astype(np.int64),
            }).groupby("n_name", as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

    from ..util import default_pool

    return ds.map_batches(Partial, batch_format="pandas",
                          concurrency=default_pool()) \
        .groupby("n_name").aggregate(
            Sum("n_suppliers", alias_name="n_suppliers"),
            Sum("bal_cents", alias_name="bal_cents"),
            Sum("n_negative", alias_name="n_negative"))


# ---------------------------------------------------------------------------
# shipping priority (TPC-H Q3 shape): 3-table join + per-order revenue top-k
# ---------------------------------------------------------------------------

def shipping_priority(sf_dir: str, *, segment: str = "BUILDING",
                      cut_date: str = "1998-06-01", k: int = 10):
    """Top-k open orders of one market segment by outstanding lineitem
    revenue (TPC-H Q3 shape): customer(segment) ⋈ orders(date < cut) ⋈
    lineitem(shipdate > cut), grouped per order, top-k by revenue.

    Scale plan: both fact tables are filtered in the FIRST map over the
    pruned-column read; lineitem revenue is pre-aggregated per orderkey
    inside map_batches BEFORE any shuffle (combiner rule — the join input
    is one row per (batch, orderkey), not per lineitem); the customer
    side flows through the generic :func:`~..stages.joins.bucket_hash_join`
    as a SEMI join (only distinct custkeys of one segment move); the
    final top-k is local-topk partials + a single-group merge — no global
    sort.  Money in integer cents, per-line law identical to
    pricing_summary's sum_disc_c: floor(extprice*(1-disc)*100+0.5).
    """
    from ray.data.aggregate import Sum

    from ..stages.joins import bucket_hash_join

    cut = np.datetime64(cut_date)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def li_part(df: pd.DataFrame) -> pa.Table:
        df = df[df["l_shipdate"].to_numpy() > cut]
        g = (pd.DataFrame({
                "o_orderkey": df["l_orderkey"].to_numpy(),
                "revenue_c": _cents((df["l_extendedprice"] *
                                     (1.0 - df["l_discount"])).to_numpy()),
             }).groupby("o_orderkey", as_index=False)["revenue_c"].sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    li_po = li.map_batches(li_part, batch_format="pandas")

    ords = _read(sf_dir, "orders",
                 ["o_orderkey", "o_custkey", "o_orderdate",
                  "o_orderpriority"])

    def ord_filter(df: pd.DataFrame) -> pa.Table:
        df = df[df["o_orderdate"].to_numpy() < cut]
        out = pd.DataFrame({
            "o_orderkey": df["o_orderkey"].to_numpy(),
            "o_custkey": df["o_custkey"].to_numpy(),
            "order_day": df["o_orderdate"].dt.strftime("%Y-%m-%d"),
            "o_orderpriority": df["o_orderpriority"],
        })
        return pa.Table.from_pandas(out, preserve_index=False)

    ords_f = ords.map_batches(ord_filter, batch_format="pandas")

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]) \
        .filter(expr=f"c_mktsegment == '{segment}'") \
        .map_batches(
            lambda df: pa.table({
                "o_custkey": pa.Array.from_pandas(df["c_custkey"],
                                                  type=pa.int64())}),
            batch_format="pandas")

    # explicit types everywhere: ords_seg is a shuffle output, and
    # Dataset.schema() on an un-executed AllToAll EXECUTES it to limit 1
    # (a full sort to read column names — measured ~2 s here, unbounded
    # at scale).  The semi join preserves the left schema, so we know it.
    ords_t = {"o_orderkey": pa.int64(), "o_custkey": pa.int64(),
              "order_day": pa.string(), "o_orderpriority": pa.string()}
    ords_seg = bucket_hash_join(
        ords_f, cust, on="o_custkey", how="semi",
        left_types=ords_t, right_types={"o_custkey": pa.int64()})
    j = bucket_hash_join(
        li_po, ords_seg, on="o_orderkey", how="inner",
        left_types={"o_orderkey": pa.int64(), "revenue_c": pa.int64()},
        right_types=ords_t)

    # the per-order Sum needs NO shuffle: the aggregate key IS the join
    # key, so every orderkey's partial rows are already co-located in one
    # join-bucket block; batch_size=None keeps blocks whole (a split
    # batch would emit two partials for one order — wrong without a
    # groupby).  Saves one full AllToAll vs groupby().aggregate(Sum).
    def sum_per_order(df: pd.DataFrame) -> pa.Table:
        g = (df.groupby(["o_orderkey", "order_day", "o_orderpriority"],
                        as_index=False)["revenue_c"].sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    per_order = j.map_batches(sum_per_order, batch_format="pandas",
                              batch_size=None)

    cols = ["o_orderkey", "order_day", "o_orderpriority", "revenue_c"]

    def local_topk(df: pd.DataFrame) -> pa.Table:
        top = df.sort_values(["revenue_c", "o_orderkey"],
                             ascending=[False, True]).head(k)
        return pa.Table.from_pandas(top[cols].reset_index(drop=True),
                                    preserve_index=False)

    # single-group merge: ≤ k rows per block reach it (topk_orders idiom)
    return per_order.map_batches(local_topk, batch_format="pandas") \
        .map_batches(lambda d: d.assign(_g=0), batch_format="pandas") \
        .groupby("_g").map_groups(
            lambda d: local_topk(d.drop(columns="_g")),
            batch_format="pandas")


def returned_revenue(sf_dir: str, *, flag: str = "R", k: int = 20):
    """Top-k customers by revenue lost to returned items (TPC-H Q10
    shape): lineitem(returnflag) ⋈ orders ⋈ customer, revenue summed per
    customer, nation name attached from the broadcast 25-row dim.

    Scale plan: lineitem revenue is pre-aggregated per orderkey inside
    map_batches BEFORE the shuffle (combiner); the orders join folds to
    per-CUSTKEY partials inside the join-bucket blocks (join key ==
    orderkey co-locates each order's rows, so the custkey partial is one
    row per (bucket, custkey)); the customer join then finalizes the
    per-custkey sum in ITS buckets (aggregate key == join key — no extra
    AllToAll); nation is a broadcast probe; top-k is local partials + a
    single-group merge.  Money in integer cents (the _cents law).
    """
    from ..stages.joins import bucket_hash_join

    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nmap = dict(zip(nat["n_nationkey"], nat["n_name"]))

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount",
                "l_returnflag"])

    def li_part(df: pd.DataFrame) -> pa.Table:
        df = df[df["l_returnflag"].astype(str).to_numpy() == flag]
        g = (pd.DataFrame({
                "o_orderkey": df["l_orderkey"].to_numpy(np.int64),
                "revenue_c": _cents((df["l_extendedprice"] *
                                     (1.0 - df["l_discount"])).to_numpy()),
             }).groupby("o_orderkey", as_index=False)["revenue_c"].sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    li_po = li.map_batches(li_part, batch_format="pandas")

    ords = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    j1 = bucket_hash_join(
        li_po, ords, on="o_orderkey", how="inner",
        left_types={"o_orderkey": pa.int64(), "revenue_c": pa.int64()},
        right_types={"o_orderkey": pa.int64(), "o_custkey": pa.int64()})

    # per-custkey PARTIAL inside the orderkey-bucket blocks: custkey is
    # not the join key, so this is a combiner (≤ one row per bucket ×
    # custkey), finalized by the next join's custkey co-location.
    def cust_partial(df: pd.DataFrame) -> pa.Table:
        g = (df.groupby("o_custkey", as_index=False)["revenue_c"].sum()
               .rename(columns={"o_custkey": "c_custkey"}))
        return pa.Table.from_pandas(g, preserve_index=False)

    per_cust = j1.map_batches(cust_partial, batch_format="pandas",
                              batch_size=None)

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_name", "c_nationkey"]) \
        .map_batches(
            lambda df: pa.table({
                "c_custkey": pa.Array.from_pandas(df["c_custkey"],
                                                  type=pa.int64()),
                "c_name": pa.Array.from_pandas(
                    df["c_name"].fillna("").astype(str), type=pa.string()),
                "n_name": pa.Array.from_pandas(
                    df["c_nationkey"].map(nmap).fillna("").astype(str),
                    type=pa.string()),
            }),
            batch_format="pandas")

    j2 = bucket_hash_join(
        per_cust, cust, on="c_custkey", how="inner",
        left_types={"c_custkey": pa.int64(), "revenue_c": pa.int64()},
        right_types={"c_custkey": pa.int64(), "c_name": pa.string(),
                     "n_name": pa.string()})

    cols = ["c_custkey", "c_name", "n_name", "revenue_c"]

    # finalize per custkey (join key == aggregate key, rows co-located;
    # batch_size=None keeps the bucket block whole) then local top-k.
    def fold_topk(df: pd.DataFrame) -> pa.Table:
        g = df.groupby(["c_custkey", "c_name", "n_name"],
                       as_index=False)["revenue_c"].sum()
        top = g.sort_values(["revenue_c", "c_custkey"],
                            ascending=[False, True]).head(k)
        return pa.Table.from_pandas(top[cols].reset_index(drop=True),
                                    preserve_index=False)

    def merge_topk(df: pd.DataFrame) -> pa.Table:
        top = df.sort_values(["revenue_c", "c_custkey"],
                             ascending=[False, True]).head(k)
        return pa.Table.from_pandas(top[cols].reset_index(drop=True),
                                    preserve_index=False)

    return j2.map_batches(fold_topk, batch_format="pandas",
                          batch_size=None) \
        .map_batches(lambda d: d.assign(_g=0), batch_format="pandas") \
        .groupby("_g").map_groups(
            lambda d: merge_topk(d.drop(columns="_g")),
            batch_format="pandas")


def order_priority_counts(sf_dir: str, *, late_days: int = 60):
    """Orders with at least one LATE lineitem (shipdate > orderdate +
    ``late_days``), counted per order priority (TPC-H Q4 shape — the
    EXISTS semi-join expressed as a max-fold).

    Scale plan: ``EXISTS(shipdate > cutoff)`` ≡ ``max(shipdate) >
    cutoff``, so lineitem collapses to a per-orderkey MAX partial inside
    map_batches before the shuffle; the orders join folds the partials
    (join key == fold key, co-located) and tests the predicate in the
    bucket block; the 5-value priority histogram collects per-block
    partials straight to the driver (cardinality-bounded — no AllToAll
    for a 5-row output).
    """
    import ray.data as rd

    from ..stages.joins import bucket_hash_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def li_max(df: pd.DataFrame) -> pa.Table:
        g = (pd.DataFrame({
                "o_orderkey": df["l_orderkey"].to_numpy(np.int64),
                "max_ship": df["l_shipdate"].to_numpy("datetime64[us]"),
             }).groupby("o_orderkey", as_index=False)["max_ship"].max())
        return pa.Table.from_pandas(g, preserve_index=False)

    li_po = li.map_batches(li_max, batch_format="pandas")

    ords = _read(sf_dir, "orders",
                 ["o_orderkey", "o_orderdate", "o_orderpriority"])
    j = bucket_hash_join(
        ords, li_po, on="o_orderkey", how="inner",
        left_types={"o_orderkey": pa.int64(),
                    "o_orderdate": pa.timestamp("us"),
                    "o_orderpriority": pa.string()},
        right_types={"o_orderkey": pa.int64(),
                     "max_ship": pa.timestamp("us")})

    lag = np.timedelta64(late_days, "D").astype("timedelta64[us]")

    def late_hist(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("o_orderkey", as_index=False).agg(
            max_ship=("max_ship", "max"),
            o_orderdate=("o_orderdate", "first"),
            o_orderpriority=("o_orderpriority", "first"))
        late = g[g["max_ship"].to_numpy("datetime64[us]") >
                 (g["o_orderdate"].to_numpy("datetime64[us]") + lag)]
        vc = late["o_orderpriority"].fillna("").astype(str).value_counts()
        return pa.table({
            "o_orderpriority": pa.array([str(v) for v in vc.index],
                                        pa.string()),
            "n_late": pa.array(vc.to_numpy(np.int64), pa.int64())})

    hist = j.map_batches(late_hist, batch_format="pandas",
                         batch_size=None).to_pandas()
    if hist.empty:
        return rd.from_arrow(pa.table({
            "o_orderpriority": pa.array([], pa.string()),
            "n_late": pa.array([], pa.int64())}))
    hist = hist.groupby("o_orderpriority", as_index=False)["n_late"].sum() \
        .sort_values("o_orderpriority").reset_index(drop=True)
    return rd.from_arrow(pa.Table.from_pandas(hist, preserve_index=False))


def customer_distribution(sf_dir: str):
    """Distribution of customers by order count, INCLUDING zero-order
    customers (TPC-H Q13 shape — the LEFT-join-then-histogram law that a
    plain orders groupby cannot produce: customers with no orders only
    exist on the dimension side).

    Scale plan: orders collapse to per-batch (custkey, cnt) partials
    before the shuffle (combiner); the customer side ships only keys;
    the LEFT bucket join co-locates each custkey's partials with its
    customer row, so the per-custkey fold AND the histogram partial both
    happen inside the join-bucket block (fold key == join key), and only
    (n_orders, n_custs) partial rows — cardinality ≤ max order count —
    reach the driver.
    """
    import ray.data as rd

    from ..stages.joins import bucket_hash_join

    cust = _read(sf_dir, "customer", ["c_custkey"])

    def ord_part(df: pd.DataFrame) -> pa.Table:
        vc = df["o_custkey"].value_counts()
        return pa.table({
            "c_custkey": pa.array(vc.index.to_numpy(np.int64), pa.int64()),
            "cnt": pa.array(vc.to_numpy(np.int64), pa.int64())})

    ords = _read(sf_dir, "orders", ["o_custkey"]) \
        .map_batches(ord_part, batch_format="pandas")

    j = bucket_hash_join(
        cust, ords, on="c_custkey", how="left",
        left_types={"c_custkey": pa.int64()},
        right_types={"c_custkey": pa.int64(), "cnt": pa.int64()})

    def hist_part(df: pd.DataFrame) -> pa.Table:
        g = df.assign(cnt=df["cnt"].fillna(0)) \
            .groupby("c_custkey")["cnt"].sum()
        vc = g.astype(np.int64).value_counts()
        return pa.table({
            "n_orders": pa.array(vc.index.to_numpy(np.int64), pa.int64()),
            "n_custs": pa.array(vc.to_numpy(np.int64), pa.int64())})

    hist = j.map_batches(hist_part, batch_format="pandas",
                         batch_size=None).to_pandas()
    if hist.empty:
        return rd.from_arrow(pa.table({
            "n_orders": pa.array([], pa.int64()),
            "n_custs": pa.array([], pa.int64())}))
    hist = hist.groupby("n_orders", as_index=False)["n_custs"].sum() \
        .sort_values("n_orders").reset_index(drop=True)
    return rd.from_arrow(pa.Table.from_pandas(hist, preserve_index=False))


def brand_supplier_counts(sf_dir: str, *, n_buckets: int = 128):
    """Exact distinct-supplier counts per part brand (TPC-H Q16 shape) —
    the EXACT distributed COUNT(DISTINCT) demo beside the approximate
    sketches (hll_registers): lineitem ⋈ part, then per brand the number
    of distinct supplying suppliers.

    Scale plan: lineitem collapses to in-batch distinct (partkey,
    suppkey) partials before any shuffle; the part dimension joins
    bucketed on partkey (big at scale — no broadcast); the global
    distinct happens in hash(brand, suppkey) buckets where
    drop_duplicates is exact (pair co-located), and each bucket emits
    per-brand partial counts — the final brand aggregate is a
    cardinality-bounded driver merge.
    """
    import ray.data as rd

    from ..stages.joins import bucket_hash_join

    def li_part(df: pd.DataFrame) -> pa.Table:
        g = df[["l_partkey", "l_suppkey"]].dropna().drop_duplicates()
        return pa.table({
            "p_partkey": pa.array(g["l_partkey"].to_numpy(np.int64),
                                  pa.int64()),
            "suppkey": pa.array(g["l_suppkey"].to_numpy(np.int64),
                                pa.int64())})

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]) \
        .map_batches(li_part, batch_format="pandas")

    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]) \
        .map_batches(
            lambda df: pa.table({
                "p_partkey": pa.Array.from_pandas(df["p_partkey"],
                                                  type=pa.int64()),
                "p_brand": pa.Array.from_pandas(
                    df["p_brand"].fillna("").astype(str),
                    type=pa.string())}),
            batch_format="pandas")

    j = bucket_hash_join(
        li, part, on="p_partkey", n_buckets=n_buckets,
        left_types={"p_partkey": pa.int64(), "suppkey": pa.int64()},
        right_types={"p_partkey": pa.int64(), "p_brand": pa.string()})

    def tag(df: pd.DataFrame) -> pa.Table:
        g = df[["p_brand", "suppkey"]].drop_duplicates()
        return pa.table({
            "p_brand": pa.array(g["p_brand"], pa.string()),
            "suppkey": pa.array(g["suppkey"].to_numpy(np.int64),
                                pa.int64()),
            "_db": pa.array(_bucket_hash(g, n_buckets,
                                         ["p_brand", "suppkey"]),
                            pa.int64())})

    def count_in_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.drop_duplicates(["p_brand", "suppkey"])
        vc = g["p_brand"].value_counts()
        return pa.table({
            "p_brand": pa.array([str(v) for v in vc.index], pa.string()),
            "n": pa.array(vc.to_numpy(np.int64), pa.int64())})

    hist = j.map_batches(tag, batch_format="pandas") \
        .groupby("_db").map_groups(count_in_bucket,
                                   batch_format="pandas").to_pandas()
    if hist.empty:
        return rd.from_arrow(pa.table({
            "p_brand": pa.array([], pa.string()),
            "n_suppliers": pa.array([], pa.int64())}))
    out = hist.groupby("p_brand", as_index=False)["n"].sum() \
        .rename(columns={"n": "n_suppliers"}) \
        .sort_values("p_brand").reset_index(drop=True)
    return rd.from_arrow(pa.Table.from_pandas(out, preserve_index=False))


def promo_revenue(sf_dir: str, *, start: str = "1997-01-01",
                  end: str = "1998-01-01"):
    """Promotion revenue share (TPC-H Q14 shape): of the lineitem
    revenue shipped in ``[start, end)``, what fraction came from PROMO
    parts — one row ``(promo_revenue_c, total_revenue_c, promo_bp)``
    with the share floored to basis points.

    Scale plan: the shipdate filter runs in the FIRST map over the
    pruned 4-column read; revenue is pre-aggregated per partkey inside
    map_batches BEFORE any shuffle (combiner — the join input is one
    row per (batch, partkey), not per lineitem); the part side ships
    only (partkey, promo-flag); the join buckets fold straight to
    (promo, revenue) partials (aggregate key is a FUNCTION of the join
    key's payload — batch_size=None keeps join blocks whole), so the
    driver merges ≤ 2 rows per bucket.  The basis-point division is
    Python-int (cents × 10⁴ overflows int64 near corpus scale).
    """
    from ..stages.joins import bucket_hash_join

    lo, hi = np.datetime64(start), np.datetime64(end)

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_extendedprice", "l_discount",
                "l_shipdate"])

    def li_part(df: pd.DataFrame) -> pa.Table:
        sd = df["l_shipdate"].to_numpy()
        df = df[(sd >= lo) & (sd < hi)]
        g = (pd.DataFrame({
                "p_partkey": df["l_partkey"].to_numpy(np.int64),
                "rev_c": _cents((df["l_extendedprice"] *
                                 (1.0 - df["l_discount"])).to_numpy()),
             }).groupby("p_partkey", as_index=False)["rev_c"].sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
        lambda df: pa.table({
            "p_partkey": pa.Array.from_pandas(df["p_partkey"],
                                              type=pa.int64()),
            "promo": pa.array(
                (df["p_type"].fillna("") == "PROMO").to_numpy(np.int64),
                pa.int64())}),
        batch_format="pandas")

    j = bucket_hash_join(
        li.map_batches(li_part, batch_format="pandas"), part,
        on="p_partkey", how="inner",
        left_types={"p_partkey": pa.int64(), "rev_c": pa.int64()},
        right_types={"p_partkey": pa.int64(), "promo": pa.int64()})

    def fold(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return pa.table({"promo": pa.array([], pa.int64()),
                             "rev_c": pa.array([], pa.int64())})
        g = df.groupby("promo", as_index=False)["rev_c"].sum()
        return pa.Table.from_pandas(g[["promo", "rev_c"]],
                                    preserve_index=False)

    parts = j.map_batches(fold, batch_format="pandas",
                          batch_size=None).to_pandas()
    promo_c = int(parts.loc[parts["promo"] == 1, "rev_c"].sum()) \
        if len(parts) else 0
    total_c = int(parts["rev_c"].sum()) if len(parts) else 0
    bp = promo_c * 10000 // total_c if total_c > 0 else 0
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "promo_revenue_c": pa.array([promo_c], pa.int64()),
        "total_revenue_c": pa.array([total_c], pa.int64()),
        "promo_bp": pa.array([bp], pa.int64())}))


def large_orders(sf_dir: str, *, min_qty_c: int = 20_000):
    """Large-volume orders (TPC-H Q18 shape — the iceberg HAVING query):
    orders whose total lineitem quantity exceeds ``min_qty_c`` (cents,
    i.e. 200.00 units), with their customer, date and price.  Output:
    ``(o_orderkey, o_custkey, order_day, totalprice_c, sum_qty_c)``.

    Scale plan: lineitem quantity is pre-aggregated per orderkey inside
    map_batches BEFORE any shuffle (combiner); the HAVING needs the
    GLOBAL per-order sum, which the orderkey-bucket join co-locates for
    free (aggregate key == join key), so the filter runs inside whole
    join blocks (batch_size=None) — one AllToAll total, and only the
    iceberg survivors leave it.  Quantity in integer cents (the
    pricing_summary sum_qty_c law) so the oracle hash-matches.
    """
    from ..stages.joins import bucket_hash_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def li_part(df: pd.DataFrame) -> pa.Table:
        g = (pd.DataFrame({
                "o_orderkey": df["l_orderkey"].to_numpy(np.int64),
                "sum_qty_c": _cents(df["l_quantity"].to_numpy()),
             }).groupby("o_orderkey", as_index=False)["sum_qty_c"].sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    ords = _read(sf_dir, "orders",
                 ["o_orderkey", "o_custkey", "o_orderdate",
                  "o_totalprice"]).map_batches(
        lambda df: pa.table({
            "o_orderkey": pa.Array.from_pandas(df["o_orderkey"],
                                               type=pa.int64()),
            "o_custkey": pa.Array.from_pandas(df["o_custkey"],
                                              type=pa.int64()),
            "order_day": pa.array(df["o_orderdate"].dt.strftime(
                "%Y-%m-%d"), pa.string()),
            "totalprice_c": pa.array(_cents(
                df["o_totalprice"].to_numpy()), pa.int64())}),
        batch_format="pandas")

    j = bucket_hash_join(
        li.map_batches(li_part, batch_format="pandas"), ords,
        on="o_orderkey", how="inner",
        left_types={"o_orderkey": pa.int64(), "sum_qty_c": pa.int64()},
        right_types={"o_orderkey": pa.int64(), "o_custkey": pa.int64(),
                     "order_day": pa.string(),
                     "totalprice_c": pa.int64()})

    cols = ["o_orderkey", "o_custkey", "order_day", "totalprice_c",
            "sum_qty_c"]

    def iceberg(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return pa.table({
                "o_orderkey": pa.array([], pa.int64()),
                "o_custkey": pa.array([], pa.int64()),
                "order_day": pa.array([], pa.string()),
                "totalprice_c": pa.array([], pa.int64()),
                "sum_qty_c": pa.array([], pa.int64())})
        g = (df.groupby(["o_orderkey", "o_custkey", "order_day",
                         "totalprice_c"], as_index=False)
             ["sum_qty_c"].sum())
        g = g[g["sum_qty_c"] > min_qty_c]
        return pa.Table.from_pandas(g[cols].reset_index(drop=True),
                                    preserve_index=False)

    return j.map_batches(iceberg, batch_format="pandas",
                         batch_size=None)


def returnflag_priority(sf_dir: str):
    """Lineitem counts per return flag, split by order-priority class
    (TPC-H Q12 shape — the conditional two-way aggregation AFTER a
    join; reference has no relational ops, this is the Ray-Data-native
    warehouse surface).  ``high`` = o_orderpriority in {1-URGENT,
    2-HIGH}.  Output: ``(l_returnflag, high_line_count,
    low_line_count)`` sorted by flag.

    Scale plan: lineitem collapses to per-(orderkey, flag) COUNT
    partials inside map_batches before the shuffle (combiner — one row
    per batch×order×flag, not per line); orders ship only (orderkey,
    high-bit); the orderkey-bucket join co-locates each order's
    partials with its priority bit, so the two-way conditional fold
    runs inside whole join blocks and only (flag, high, cnt) partials
    — ≤ 6 rows per block — reach the driver.
    """
    import ray.data as rd

    from ..stages.joins import bucket_hash_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"])

    def li_part(df: pd.DataFrame) -> pa.Table:
        g = (pd.DataFrame({
                "o_orderkey": df["l_orderkey"].to_numpy(np.int64),
                "rf": df["l_returnflag"].fillna("").astype(str),
             }).groupby(["o_orderkey", "rf"], as_index=False)
             .size().rename(columns={"size": "cnt"}))
        return pa.Table.from_pandas(g, preserve_index=False)

    HIGH = ("1-URGENT", "2-HIGH")
    ords = _read(sf_dir, "orders",
                 ["o_orderkey", "o_orderpriority"]).map_batches(
        lambda df: pa.table({
            "o_orderkey": pa.Array.from_pandas(df["o_orderkey"],
                                               type=pa.int64()),
            "high": pa.array(df["o_orderpriority"].isin(HIGH)
                             .to_numpy(np.int64), pa.int64())}),
        batch_format="pandas")

    j = bucket_hash_join(
        li.map_batches(li_part, batch_format="pandas"), ords,
        on="o_orderkey", how="inner",
        left_types={"o_orderkey": pa.int64(), "rf": pa.string(),
                    "cnt": pa.int64()},
        right_types={"o_orderkey": pa.int64(), "high": pa.int64()})

    def fold(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return pa.table({"rf": pa.array([], pa.string()),
                             "hi": pa.array([], pa.int64()),
                             "lo": pa.array([], pa.int64())})
        cnt = df["cnt"].to_numpy(np.int64)
        hib = df["high"].to_numpy(np.int64)
        g = (pd.DataFrame({"rf": df["rf"], "hi": cnt * hib,
                           "lo": cnt * (1 - hib)})
             .groupby("rf", as_index=False)[["hi", "lo"]].sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = j.map_batches(fold, batch_format="pandas",
                          batch_size=None).to_pandas()
    if parts.empty:
        return rd.from_arrow(pa.table({
            "l_returnflag": pa.array([], pa.string()),
            "high_line_count": pa.array([], pa.int64()),
            "low_line_count": pa.array([], pa.int64())}))
    g = parts.groupby("rf", as_index=False)[["hi", "lo"]].sum() \
        .sort_values("rf").reset_index(drop=True)
    return rd.from_arrow(pa.table({
        "l_returnflag": pa.array(g["rf"].astype(str), pa.string()),
        "high_line_count": pa.array(g["hi"].to_numpy(np.int64), pa.int64()),
        "low_line_count": pa.array(g["lo"].to_numpy(np.int64), pa.int64())}))


def small_qty_revenue(sf_dir: str, *, brand: str = "Brand#23"):
    """Revenue that would move to a bulk channel (TPC-H Q17 shape — the
    per-key correlated AVG subquery): total extendedprice of ``brand``
    lineitems whose quantity is below 1/5 of that part's average
    quantity, divided by 7.  Output: one row ``(avg_yearly_c,)``.

    Scale plan: the correlated subquery ``qty < 0.2*avg(qty) per part``
    needs every line of a part next to that part's global (sum, count)
    — the partkey-bucket join co-locates them for free (aggregate key
    == join key), so the per-part fold AND the filter run inside whole
    join blocks: one AllToAll, no second shuffle for the subquery.  The
    brand filter ships as a semi-join side of (partkey) keys only.  The
    threshold is integer cross-multiplied — ``5·qty_c·cnt < sum_qty_c``
    ≡ ``qty < 0.2·avg`` — so the oracle hash-matches exactly (no float
    division on either side).
    """
    import ray.data as rd

    from ..stages.joins import bucket_hash_join

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice"]).map_batches(
        lambda df: pa.table({
            "p_partkey": pa.Array.from_pandas(df["l_partkey"],
                                              type=pa.int64()),
            "qty_c": pa.array(_cents(df["l_quantity"].to_numpy()),
                              pa.int64()),
            "price_c": pa.array(_cents(df["l_extendedprice"].to_numpy()),
                                pa.int64())}),
        batch_format="pandas")

    bparts = _read(sf_dir, "part", ["p_partkey", "p_brand"]).map_batches(
        lambda df: pa.table({
            "p_partkey": pa.Array.from_pandas(
                df.loc[df["p_brand"].fillna("") == brand, "p_partkey"],
                type=pa.int64())}),
        batch_format="pandas")

    li_b = bucket_hash_join(li, bparts, on="p_partkey", how="semi",
                            left_types={"p_partkey": pa.int64(),
                                        "qty_c": pa.int64(),
                                        "price_c": pa.int64()},
                            right_types={"p_partkey": pa.int64()})

    # semi-join output is already partkey-bucketed AND whole per block:
    # every line of a part sits in one block, so the per-part (sum, cnt)
    # fold and the 5*qty*cnt < sum filter are block-local.
    def fold(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return pa.table({"rev_c": pa.array([], pa.int64())})
        pk = df["p_partkey"].to_numpy(np.int64)
        qc = df["qty_c"].to_numpy(np.int64)
        g = (pd.DataFrame({"pk": pk, "s": qc, "n": np.int64(1)})
             .groupby("pk", as_index=False).agg(s=("s", "sum"),
                                                n=("n", "sum")))
        m = pd.Series(g["s"].to_numpy(np.int64), index=g["pk"]).reindex(pk)
        c = pd.Series(g["n"].to_numpy(np.int64), index=g["pk"]).reindex(pk)
        keep = 5 * qc * c.to_numpy(np.int64) < m.to_numpy(np.int64)
        return pa.table({"rev_c": pa.array(
            [int(df["price_c"].to_numpy(np.int64)[keep].sum())],
            pa.int64())})

    parts = li_b.map_batches(fold, batch_format="pandas",
                             batch_size=None).to_pandas()
    total = int(parts["rev_c"].sum()) if len(parts) else 0
    return rd.from_arrow(pa.table({
        "avg_yearly_c": pa.array([total // 7], pa.int64())}))


def idle_customers(sf_dir: str, *, cutoff: str = "2000-01-01"):
    """High-balance customers with no RECENT orders, per nation (TPC-H
    Q22 shape — a global-scalar filter composed with an anti-join):
    customers whose account balance exceeds the global average of
    positive balances AND who placed no order on/after ``cutoff``.
    Output: ``(c_nationkey, numcust, totacctbal_c)``.

    Scale plan: the global scalar ships as TWO integers — per-batch
    (sum_pos_c, n_pos) partials merge on the driver, no shuffle; the
    balance filter is integer cross-multiplied (``bal_c·n_pos >
    sum_pos_c`` ≡ ``bal > avg``) and runs in the first map over
    customer; the anti-join side ships only per-batch DISTINCT recent
    custkeys (combiner); the per-nation aggregate collects (nation,
    cnt, sum) partials — nation cardinality is fixed — straight to the
    driver.
    """
    import ray.data as rd

    from ..stages.joins import bucket_hash_join

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_acctbal"]).map_batches(
        lambda df: pa.table({
            "c_custkey": pa.Array.from_pandas(df["c_custkey"],
                                              type=pa.int64()),
            "c_nationkey": pa.Array.from_pandas(df["c_nationkey"],
                                                type=pa.int64()),
            "bal_c": pa.array(_cents(df["c_acctbal"].fillna(0.0)
                                     .to_numpy()), pa.int64())}),
        batch_format="pandas")

    # pass 1: the global positive-balance scalar (two ints to the driver)
    stats = cust.map_batches(
        lambda t: pa.table({
            "s": pa.array([int(np.where(t["bal_c"].to_numpy() > 0,
                                        t["bal_c"].to_numpy(), 0).sum())],
                          pa.int64()),
            "n": pa.array([int((t["bal_c"].to_numpy() > 0).sum())],
                          pa.int64())}),
        batch_format="pyarrow").to_pandas()
    sum_pos = int(stats["s"].sum()) if len(stats) else 0
    n_pos = int(stats["n"].sum()) if len(stats) else 0

    empty = pa.table({"c_nationkey": pa.array([], pa.int64()),
                      "numcust": pa.array([], pa.int64()),
                      "totacctbal_c": pa.array([], pa.int64())})
    if n_pos == 0:
        return rd.from_arrow(empty)

    rich = cust.map_batches(
        lambda df: pa.Table.from_pandas(
            df[df["bal_c"].to_numpy(np.int64) * n_pos > sum_pos],
            preserve_index=False),
        batch_format="pandas")

    lo = np.datetime64(cutoff)
    recent = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderdate"]).map_batches(
        lambda df: pa.table({"c_custkey": pa.array(np.unique(
            df.loc[df["o_orderdate"].to_numpy("datetime64[us]") >=
                   lo, "o_custkey"].to_numpy(np.int64)), pa.int64())}),
        batch_format="pandas")

    idle = bucket_hash_join(
        rich, recent, on="c_custkey", how="anti",
        left_types={"c_custkey": pa.int64(), "c_nationkey": pa.int64(),
                    "bal_c": pa.int64()},
        right_types={"c_custkey": pa.int64()})

    def nat_part(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return empty
        g = (df.groupby("c_nationkey", as_index=False)
             .agg(numcust=("c_custkey", "size"),
                  totacctbal_c=("bal_c", "sum")))
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = idle.map_batches(nat_part, batch_format="pandas",
                             batch_size=None).to_pandas()
    if parts.empty:
        return rd.from_arrow(empty)
    g = (parts.groupby("c_nationkey", as_index=False)
         [["numcust", "totacctbal_c"]].sum()
         .sort_values("c_nationkey").reset_index(drop=True))
    return rd.from_arrow(pa.table({
        "c_nationkey": pa.array(g["c_nationkey"].to_numpy(np.int64),
                                pa.int64()),
        "numcust": pa.array(g["numcust"].to_numpy(np.int64), pa.int64()),
        "totacctbal_c": pa.array(g["totacctbal_c"].to_numpy(np.int64),
                                 pa.int64())}))


def top_supplier(sf_dir: str, *, start: str = "1997-01-01",
                 end: str = "1997-04-01"):
    """Supplier(s) with the maximum revenue in a shipdate quarter
    (TPC-H Q15 shape — global ARGMAX with ties kept): per-supplier
    revenue, the global max broadcast back as a filter, supplier names
    attached.  Output: ``(s_suppkey, s_name, total_revenue_c)``.

    Scale plan: revenue collapses to per-(batch, suppkey) partials
    inside map_batches (combiner); the exact per-supplier fold is one
    bucketed groupby; the global max is a per-block MAX partial merged
    on the driver (one int — no second AllToAll); the ≤|ties| winners
    broadcast into a guarded broadcast_join against supplier, so the
    big dimension streams instead of shuffling.
    """
    from ..stages.joins import broadcast_join
    from ..util import bucket_hash

    lo, hi = np.datetime64(start), np.datetime64(end)

    def rev_part(df: pd.DataFrame) -> pa.Table:
        sd = df["l_shipdate"].to_numpy("datetime64[us]")
        df = df[(sd >= lo) & (sd < hi)]
        g = (pd.DataFrame({
                "s_suppkey": df["l_suppkey"].to_numpy(np.int64),
                "rev_c": _cents((df["l_extendedprice"] *
                                 (1.0 - df["l_discount"])).to_numpy()),
             }).groupby("s_suppkey", as_index=False)["rev_c"].sum())
        g["_b"] = bucket_hash(g["s_suppkey"], 64)
        return pa.Table.from_pandas(g, preserve_index=False)

    per_supp = _read(sf_dir, "lineitem",
                     ["l_suppkey", "l_extendedprice", "l_discount",
                      "l_shipdate"]) \
        .map_batches(rev_part, batch_format="pandas") \
        .groupby("_b").map_groups(
            lambda g: pa.Table.from_pandas(
                g.groupby("s_suppkey", as_index=False)["rev_c"].sum(),
                preserve_index=False),
            batch_format="pandas").materialize()

    mx = per_supp.map_batches(
        lambda t: pa.table({"m": pa.array(
            [int(t["rev_c"].to_numpy().max())] if t.num_rows else [],
            pa.int64())}),
        batch_format="pyarrow").to_pandas()
    if mx.empty:
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "s_suppkey": pa.array([], pa.int64()),
            "s_name": pa.array([], pa.string()),
            "total_revenue_c": pa.array([], pa.int64())}))
    best = int(mx["m"].max())

    winners = per_supp.map_batches(
        lambda df: pa.Table.from_pandas(
            df[df["rev_c"].to_numpy(np.int64) == best]
            .rename(columns={"rev_c": "total_revenue_c"}),
            preserve_index=False),
        batch_format="pandas").select_columns(
            ["s_suppkey", "total_revenue_c"])

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    out = broadcast_join(supp, winners, on="s_suppkey", how="inner",
                         left_cols=["s_suppkey", "s_name"])
    return out.map_batches(
        lambda df: pa.Table.from_pandas(
            df[["s_suppkey", "s_name", "total_revenue_c"]]
            .sort_values("s_suppkey").reset_index(drop=True),
            preserve_index=False),
        batch_format="pandas")


_BRACKETS = (
    # (bracket_id, brand, size lo..hi, qty lo..hi) — the Q19 disjunct rows
    (1, "Brand#12", 1, 5, 1, 11),
    (2, "Brand#23", 1, 10, 10, 20),
    (3, "Brand#34", 1, 15, 20, 30),
)


def bracket_revenue(sf_dir: str, *, brackets=_BRACKETS):
    """Revenue under an OR-of-ANDs bracket predicate (TPC-H Q19 shape):
    each bracket constrains part attributes (brand, size range) AND the
    line's quantity range; a line counts once per bracket it satisfies.
    Output is FIXED-shape — one row per bracket, zeros when nothing
    qualifies: ``(bracket_id, p_brand, n_lines, revenue_c)``.

    Scale plan: the part side collapses to the bracket-QUALIFYING dim
    (partkey, bracket_id, qty bounds) in one filtered pass — the
    disjunction is pushed into the dim build, so the join never sees a
    non-qualifying part; lineitem pre-filters to the brackets' overall
    quantity envelope and combines to per-(batch, partkey, qty) partials
    before the one partkey bucket join (quantity is integral in this
    schema, so (partkey, qty) is a true combiner key); the in-bucket
    test is a vectorized range check and the ≤|brackets| aggregate rows
    ride straight to the driver.  Money in integer cents (_cents law).
    """
    import ray.data as rd

    from ..stages.joins import bucket_hash_join

    qlo = min(b[4] for b in brackets)
    qhi = max(b[5] for b in brackets)
    bmap = {b[1]: b for b in brackets}

    def dim_part(df: pd.DataFrame) -> pa.Table:
        rows = {"l_partkey": [], "bracket_id": [], "lo_q": [], "hi_q": []}
        m = df[df["p_brand"].isin(bmap)]
        for bid, brand, lo_s, hi_s, lo_q, hi_q in brackets:
            ok = m[(m["p_brand"] == brand) & (m["p_size"] >= lo_s)
                   & (m["p_size"] <= hi_s)]
            rows["l_partkey"].extend(ok["p_partkey"].to_numpy(np.int64))
            rows["bracket_id"].extend([bid] * len(ok))
            rows["lo_q"].extend([lo_q] * len(ok))
            rows["hi_q"].extend([hi_q] * len(ok))
        return pa.table({k: pa.array(v, pa.int64())
                         for k, v in rows.items()})

    dim = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]) \
        .map_batches(dim_part, batch_format="pandas")

    def li_part(df: pd.DataFrame) -> pa.Table:
        q = df["l_quantity"].to_numpy()
        df = df[(q >= qlo) & (q <= qhi)]
        g = (pd.DataFrame({
                "l_partkey": df["l_partkey"].to_numpy(np.int64),
                "qty": df["l_quantity"].to_numpy().astype(np.int64),
                "rev_c": _cents((df["l_extendedprice"] *
                                 (1.0 - df["l_discount"])).to_numpy()),
                "n": np.int64(1),
             }).groupby(["l_partkey", "qty"], as_index=False)
              .agg(rev_c=("rev_c", "sum"), n=("n", "sum")))
        return pa.Table.from_pandas(g, preserve_index=False)

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice",
                "l_discount"]).map_batches(li_part, batch_format="pandas")

    j = bucket_hash_join(
        li, dim, on="l_partkey", how="inner",
        left_types={"l_partkey": pa.int64(), "qty": pa.int64(),
                    "rev_c": pa.int64(), "n": pa.int64()},
        right_types={"l_partkey": pa.int64(), "bracket_id": pa.int64(),
                     "lo_q": pa.int64(), "hi_q": pa.int64()})

    def fold(df: pd.DataFrame) -> pa.Table:
        q = df["qty"].to_numpy(np.int64)
        ok = df[(q >= df["lo_q"].to_numpy(np.int64))
                & (q <= df["hi_q"].to_numpy(np.int64))]
        g = ok.groupby("bracket_id", as_index=False).agg(
            n_lines=("n", "sum"), revenue_c=("rev_c", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = j.map_batches(fold, batch_format="pandas",
                        batch_size=None).to_pandas()
    if len(agg):
        agg = agg.groupby("bracket_id", as_index=False).sum()
    hit = {int(r["bracket_id"]): (int(r["n_lines"]), int(r["revenue_c"]))
           for _, r in agg.iterrows()}
    return rd.from_arrow(pa.table({
        "bracket_id": pa.array([b[0] for b in brackets], pa.int64()),
        "p_brand": pa.array([b[1] for b in brackets], pa.string()),
        "n_lines": pa.array([hit.get(b[0], (0, 0))[0] for b in brackets],
                            pa.int64()),
        "revenue_c": pa.array([hit.get(b[0], (0, 0))[1] for b in brackets],
                              pa.int64()),
    }))


# ---------------------------------------------------------------------------
# TPC-H Q5 / Q7 shapes: nation-keyed multi-join volume rollups
# ---------------------------------------------------------------------------

def _order_cust_nation(sf_dir: str, *, nation_keys, start=None, end=None,
                       with_year: bool = False, n_buckets: int = 64):
    """Shared Q5/Q7/Q8 orders-side builder: ``(o_orderkey,
    c_nationkey[, o_year])`` for orders whose customer sits in
    ``nation_keys`` (and, optionally, whose orderdate falls in
    ``[start, end)``).  One custkey bucket join; both inputs arrive
    pre-filtered and column-pruned, so the shuffle ships two or three
    int64 columns per side."""
    from ..stages.joins import bucket_hash_join

    keys = frozenset(int(k) for k in nation_keys)
    lo = np.datetime64(start) if start else None
    hi = np.datetime64(end) if end else None

    def ord_part(df: pd.DataFrame) -> pa.Table:
        if lo is not None:
            d = df["o_orderdate"].to_numpy()
            df = df[(d >= lo) & (d < hi)]
        cols = {
            "c_custkey": pa.array(df["o_custkey"].to_numpy(np.int64),
                                  pa.int64()),
            "o_orderkey": pa.array(df["o_orderkey"].to_numpy(np.int64),
                                   pa.int64())}
        if with_year:
            cols["o_year"] = pa.array(
                df["o_orderdate"].dt.year.to_numpy(np.int64), pa.int64())
        return pa.table(cols)

    cols = ["o_orderkey", "o_custkey"] + \
        (["o_orderdate"] if lo is not None or with_year else [])
    ords = _read(sf_dir, "orders", cols) \
        .map_batches(ord_part, batch_format="pandas")

    def cust_part(df: pd.DataFrame) -> pa.Table:
        df = df[df["c_nationkey"].isin(keys)]
        return pa.table({
            "c_custkey": pa.array(df["c_custkey"].to_numpy(np.int64),
                                  pa.int64()),
            "c_nationkey": pa.array(df["c_nationkey"].to_numpy(np.int64),
                                    pa.int64())})

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .map_batches(cust_part, batch_format="pandas")

    lt = {"c_custkey": pa.int64(), "o_orderkey": pa.int64()}
    if with_year:
        lt["o_year"] = pa.int64()
    return bucket_hash_join(
        ords, cust, on="c_custkey", how="inner", n_buckets=n_buckets,
        left_types=lt,
        right_types={"c_custkey": pa.int64(), "c_nationkey": pa.int64()})


def local_supplier_volume(sf_dir: str, *, region: str = "ASIA",
                          start: str = "1996-01-01",
                          end: str = "1997-01-01", n_buckets: int = 64):
    """Revenue served by LOCAL suppliers per nation of one region (TPC-H
    Q5 shape): lineitem ⋈ orders ⋈ customer ⋈ supplier where the
    customer's and the supplier's nation are the SAME nation of
    ``region`` and the order falls in ``[start, end)``.  Output
    ``(n_name, revenue_c)`` — integer cents (the ``_cents`` law).

    Scale plan: nation⋈region collapses to a driver-side key set (30
    rows — the classic broadcast dim); both fact sides arrive
    pre-filtered and pre-combined — lineitem folds to (orderkey,
    suppkey) revenue partials in map_batches, the supplier join
    re-folds to (orderkey, supplier-nation) INSIDE its buckets
    (batch_size=None keeps blocks whole), the orders⋈customer side
    ships (orderkey, cust-nation) pairs only — so the final orderkey
    join is partials-vs-pairs, the same-nation test is a vectorized
    in-bucket mask, and only ≤|nations| partial rows per block reach
    the driver.  Three bucket joins total (custkey, suppkey, orderkey),
    each on pruned int64 columns; no dim is ever shuffled.
    """
    import ray.data as rd

    from ..stages.joins import bucket_hash_join

    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    rks = set(reg[reg["r_name"] == region]["r_regionkey"])
    local = nat[nat["n_regionkey"].isin(rks)]
    keys = frozenset(int(k) for k in local["n_nationkey"])
    nmap = dict(zip(local["n_nationkey"].astype(int),
                    local["n_name"].astype(str)))

    oc = _order_cust_nation(sf_dir, nation_keys=keys, start=start, end=end,
                            n_buckets=n_buckets)

    def li_part(df: pd.DataFrame) -> pa.Table:
        g = (pd.DataFrame({
                "s_suppkey": df["l_suppkey"].to_numpy(np.int64),
                "o_orderkey": df["l_orderkey"].to_numpy(np.int64),
                "rev_c": _cents((df["l_extendedprice"] *
                                 (1.0 - df["l_discount"])).to_numpy()),
             }).groupby(["s_suppkey", "o_orderkey"], as_index=False)
              ["rev_c"].sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice",
                "l_discount"]).map_batches(li_part, batch_format="pandas")

    def supp_part(df: pd.DataFrame) -> pa.Table:
        df = df[df["s_nationkey"].isin(keys)]
        return pa.table({
            "s_suppkey": pa.array(df["s_suppkey"].to_numpy(np.int64),
                                  pa.int64()),
            "s_nationkey": pa.array(df["s_nationkey"].to_numpy(np.int64),
                                    pa.int64())})

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]) \
        .map_batches(supp_part, batch_format="pandas")

    ls = bucket_hash_join(
        li, supp, on="s_suppkey", how="inner", n_buckets=n_buckets,
        left_types={"s_suppkey": pa.int64(), "o_orderkey": pa.int64(),
                    "rev_c": pa.int64()},
        right_types={"s_suppkey": pa.int64(), "s_nationkey": pa.int64()})

    def fold_orderkey(df: pd.DataFrame) -> pa.Table:
        g = df.groupby(["o_orderkey", "s_nationkey"], as_index=False)[
            "rev_c"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    per_ord = ls.map_batches(fold_orderkey, batch_format="pandas",
                             batch_size=None)

    j = bucket_hash_join(
        per_ord, oc, on="o_orderkey", how="inner", n_buckets=n_buckets,
        left_types={"o_orderkey": pa.int64(), "s_nationkey": pa.int64(),
                    "rev_c": pa.int64()},
        right_types={"o_orderkey": pa.int64(), "c_custkey": pa.int64(),
                     "c_nationkey": pa.int64()})

    def nation_partial(df: pd.DataFrame) -> pa.Table:
        ok = df[df["s_nationkey"].to_numpy(np.int64)
                == df["c_nationkey"].to_numpy(np.int64)]
        g = ok.groupby("s_nationkey", as_index=False)["rev_c"].sum()
        return pa.table({
            "nk": pa.array(g["s_nationkey"].to_numpy(np.int64), pa.int64()),
            "rev_c": pa.array(g["rev_c"].to_numpy(np.int64), pa.int64())})

    # ≤ |nations| rows per block — the driver merge is dim-bounded
    parts = j.map_batches(nation_partial, batch_format="pandas",
                          batch_size=None).to_pandas()
    if len(parts):
        parts = parts.groupby("nk", as_index=False)["rev_c"].sum()
    return rd.from_arrow(pa.table({
        "n_name": pa.array([nmap[int(k)] for k in parts["nk"]]
                           if len(parts) else [], pa.string()),
        "revenue_c": pa.array(parts["rev_c"].to_numpy(np.int64)
                              if len(parts) else [], pa.int64())}))


def nation_trade_volume(sf_dir: str, *, nation_a: str = "NATION_3",
                        nation_b: str = "NATION_8",
                        start: str = "1996-01-01", end: str = "1998-01-01",
                        n_buckets: int = 64):
    """Bilateral shipping volume between two nations by year (TPC-H Q7
    shape): lines shipped in ``[start, end)`` where the supplier sits in
    one of the two nations and the ordering customer in the OTHER,
    summed per ``(supp_nation, cust_nation, year)`` — both directions
    reported.  Output ``(supp_nation, cust_nation, l_year, revenue_c)``.

    Scale plan: shares :func:`_order_cust_nation` with Q5 (orders ship
    (orderkey, cust-nation) pairs only, customers pre-filtered to the
    two nations); lineitem folds to (orderkey, suppkey, year) revenue
    partials after the shipdate filter, the supplier join re-folds to
    (orderkey, supp-nation, year) in-bucket, and the final orderkey
    join applies the cross-nation mask vectorized — ≤ 2·|years| partial
    rows per block reach the driver.
    """
    import ray.data as rd

    from ..stages.joins import bucket_hash_join

    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    kmap = dict(zip(nat["n_name"].astype(str),
                    nat["n_nationkey"].astype(int)))
    ka, kb = kmap[nation_a], kmap[nation_b]
    nmap = {ka: nation_a, kb: nation_b}
    keys = frozenset((ka, kb))

    oc = _order_cust_nation(sf_dir, nation_keys=keys, n_buckets=n_buckets)

    lo, hi = np.datetime64(start), np.datetime64(end)

    def li_part(df: pd.DataFrame) -> pa.Table:
        d = df["l_shipdate"].to_numpy()
        df = df[(d >= lo) & (d < hi)]
        g = (pd.DataFrame({
                "s_suppkey": df["l_suppkey"].to_numpy(np.int64),
                "o_orderkey": df["l_orderkey"].to_numpy(np.int64),
                "l_year": df["l_shipdate"].dt.year.to_numpy(np.int64),
                "rev_c": _cents((df["l_extendedprice"] *
                                 (1.0 - df["l_discount"])).to_numpy()),
             }).groupby(["s_suppkey", "o_orderkey", "l_year"],
                        as_index=False)["rev_c"].sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_shipdate",
                "l_extendedprice", "l_discount"]) \
        .map_batches(li_part, batch_format="pandas")

    def supp_part(df: pd.DataFrame) -> pa.Table:
        df = df[df["s_nationkey"].isin(keys)]
        return pa.table({
            "s_suppkey": pa.array(df["s_suppkey"].to_numpy(np.int64),
                                  pa.int64()),
            "s_nationkey": pa.array(df["s_nationkey"].to_numpy(np.int64),
                                    pa.int64())})

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]) \
        .map_batches(supp_part, batch_format="pandas")

    ls = bucket_hash_join(
        li, supp, on="s_suppkey", how="inner", n_buckets=n_buckets,
        left_types={"s_suppkey": pa.int64(), "o_orderkey": pa.int64(),
                    "l_year": pa.int64(), "rev_c": pa.int64()},
        right_types={"s_suppkey": pa.int64(), "s_nationkey": pa.int64()})

    def fold_orderkey(df: pd.DataFrame) -> pa.Table:
        g = df.groupby(["o_orderkey", "s_nationkey", "l_year"],
                       as_index=False)["rev_c"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    per_ord = ls.map_batches(fold_orderkey, batch_format="pandas",
                             batch_size=None)

    j = bucket_hash_join(
        per_ord, oc, on="o_orderkey", how="inner", n_buckets=n_buckets,
        left_types={"o_orderkey": pa.int64(), "s_nationkey": pa.int64(),
                    "l_year": pa.int64(), "rev_c": pa.int64()},
        right_types={"o_orderkey": pa.int64(), "c_custkey": pa.int64(),
                     "c_nationkey": pa.int64()})

    def trade_partial(df: pd.DataFrame) -> pa.Table:
        s = df["s_nationkey"].to_numpy(np.int64)
        c = df["c_nationkey"].to_numpy(np.int64)
        ok = df[((s == ka) & (c == kb)) | ((s == kb) & (c == ka))]
        g = ok.groupby(["s_nationkey", "c_nationkey", "l_year"],
                       as_index=False)["rev_c"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = j.map_batches(trade_partial, batch_format="pandas",
                          batch_size=None).to_pandas()
    if len(parts):
        parts = parts.groupby(["s_nationkey", "c_nationkey", "l_year"],
                              as_index=False)["rev_c"].sum()
    from ..util import table_or_dataset
    return table_or_dataset(pa.table({
        "supp_nation": pa.array([nmap[int(k)] for k in
                                 parts["s_nationkey"]]
                                if len(parts) else [], pa.string()),
        "cust_nation": pa.array([nmap[int(k)] for k in
                                 parts["c_nationkey"]]
                                if len(parts) else [], pa.string()),
        "l_year": pa.array(parts["l_year"].to_numpy(np.int64)
                           if len(parts) else [], pa.int64()),
        "revenue_c": pa.array(parts["rev_c"].to_numpy(np.int64)
                              if len(parts) else [], pa.int64())}))


def _line_part_supp_rev(sf_dir: str, *, part_mask_fn, part_cols,
                        n_buckets: int = 64):
    """Shared Q8/Q9 lineitem-side builder: lines restricted to parts
    passing ``part_mask_fn`` (a vectorized pandas predicate over
    ``part_cols``), folded to per-(orderkey, supplier-NATION[, extras])
    revenue partials.  Two bucket joins (partkey semi-filter, suppkey
    attach), each fed combiner-compacted int64 columns; the part dim is
    never broadcast — at warehouse scale the qualifying partkey set is
    itself large, so the semi-filter is an honest bucketed join."""
    from ..stages.joins import bucket_hash_join

    def part_dim(df: pd.DataFrame) -> pa.Table:
        ok = df[part_mask_fn(df)]
        return pa.table({"l_partkey": pa.array(
            ok["p_partkey"].to_numpy(np.int64), pa.int64())})

    part_f = _read(sf_dir, "part", ["p_partkey"] + list(part_cols)) \
        .map_batches(part_dim, batch_format="pandas")

    def li_part(df: pd.DataFrame) -> pa.Table:
        g = (pd.DataFrame({
                "l_partkey": df["l_partkey"].to_numpy(np.int64),
                "s_suppkey": df["l_suppkey"].to_numpy(np.int64),
                "o_orderkey": df["l_orderkey"].to_numpy(np.int64),
                "rev_c": _cents((df["l_extendedprice"] *
                                 (1.0 - df["l_discount"])).to_numpy()),
             }).groupby(["l_partkey", "s_suppkey", "o_orderkey"],
                        as_index=False)["rev_c"].sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
                "l_discount"]) \
        .map_batches(li_part, batch_format="pandas")

    lp = bucket_hash_join(
        li, part_f, on="l_partkey", how="inner", n_buckets=n_buckets,
        left_types={"l_partkey": pa.int64(), "s_suppkey": pa.int64(),
                    "o_orderkey": pa.int64(), "rev_c": pa.int64()},
        right_types={"l_partkey": pa.int64()})

    # re-fold inside the partkey buckets: partkey has served its filter
    # purpose, drop it so the suppkey join ships (suppkey, orderkey)
    def fold_supp(df: pd.DataFrame) -> pa.Table:
        g = df.groupby(["s_suppkey", "o_orderkey"], as_index=False)[
            "rev_c"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    lps = lp.map_batches(fold_supp, batch_format="pandas",
                         batch_size=None)

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]) \
        .map_batches(lambda df: pa.table({
            "s_suppkey": pa.array(df["s_suppkey"].to_numpy(np.int64),
                                  pa.int64()),
            "s_nationkey": pa.array(df["s_nationkey"].to_numpy(np.int64),
                                    pa.int64())}), batch_format="pandas")

    ls = bucket_hash_join(
        lps, supp, on="s_suppkey", how="inner", n_buckets=n_buckets,
        left_types={"s_suppkey": pa.int64(), "o_orderkey": pa.int64(),
                    "rev_c": pa.int64()},
        right_types={"s_suppkey": pa.int64(), "s_nationkey": pa.int64()})

    def fold_ord(df: pd.DataFrame) -> pa.Table:
        g = df.groupby(["o_orderkey", "s_nationkey"], as_index=False)[
            "rev_c"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    return ls.map_batches(fold_ord, batch_format="pandas",
                          batch_size=None)


def market_share(sf_dir: str, *, nation: str = "NATION_1",
                 region: str = "ASIA", p_type: str = "ECONOMY",
                 start: str = "1995-01-01", end: str = "1997-01-01",
                 n_buckets: int = 64):
    """Market share of one supplying nation (TPC-H Q8 shape): among
    lines of part type ``p_type`` ordered by ``region`` customers in
    ``[start, end)``, the share supplied by ``nation``, per order year.
    Output ``(o_year, total_c, nation_c, share_bp)`` — the share in
    floor basis points of integer cents (the two-sums-one-ratio law).

    Scale plan: lineitem folds through the shared partkey-filter +
    suppkey-attach builder (:func:`_line_part_supp_rev` — combiners
    before every shuffle); the orders side is the shared Q5 builder
    carrying the order YEAR; the final orderkey join reduces to
    per-year (total, nation) partial sums in-bucket, so the driver
    merge is |years| rows and the bp division happens once there.
    """
    import ray.data as rd

    from ..stages.joins import bucket_hash_join

    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    rks = set(reg[reg["r_name"] == region]["r_regionkey"])
    keys = frozenset(int(k) for k in
                     nat[nat["n_regionkey"].isin(rks)]["n_nationkey"])
    nk = int(nat[nat["n_name"] == nation]["n_nationkey"].iloc[0])

    per_ord = _line_part_supp_rev(
        sf_dir, part_mask_fn=lambda df: df["p_type"].astype(str) == p_type,
        part_cols=["p_type"], n_buckets=n_buckets)

    oc = _order_cust_nation(sf_dir, nation_keys=keys, start=start, end=end,
                            with_year=True, n_buckets=n_buckets)

    j = bucket_hash_join(
        per_ord, oc, on="o_orderkey", how="inner", n_buckets=n_buckets,
        left_types={"o_orderkey": pa.int64(), "s_nationkey": pa.int64(),
                    "rev_c": pa.int64()},
        right_types={"o_orderkey": pa.int64(), "c_custkey": pa.int64(),
                     "c_nationkey": pa.int64(), "o_year": pa.int64()})

    def year_partial(df: pd.DataFrame) -> pa.Table:
        rev = df["rev_c"].to_numpy(np.int64)
        g = pd.DataFrame({
            "o_year": df["o_year"].to_numpy(np.int64),
            "total_c": rev,
            "nation_c": np.where(
                df["s_nationkey"].to_numpy(np.int64) == nk, rev, 0),
        }).groupby("o_year", as_index=False)[["total_c", "nation_c"]].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = j.map_batches(year_partial, batch_format="pandas",
                          batch_size=None).to_pandas()
    if len(parts):
        parts = parts.groupby("o_year", as_index=False)[
            ["total_c", "nation_c"]].sum().sort_values("o_year")
    tot = parts["total_c"].to_numpy(np.int64) if len(parts) else \
        np.array([], np.int64)
    natc = parts["nation_c"].to_numpy(np.int64) if len(parts) else \
        np.array([], np.int64)
    return rd.from_arrow(pa.table({
        "o_year": pa.array(parts["o_year"].to_numpy(np.int64)
                           if len(parts) else [], pa.int64()),
        "total_c": pa.array(tot, pa.int64()),
        "nation_c": pa.array(natc, pa.int64()),
        "share_bp": pa.array(natc * 10_000 // np.maximum(tot, 1),
                             pa.int64())}))


def product_profit(sf_dir: str, *, name_substr: str = "red",
                   n_buckets: int = 64):
    """Profit contribution by supplier nation and order year for parts
    whose name contains ``name_substr`` (TPC-H Q9 shape, minus the
    partsupp cost leg this schema doesn't carry).  Output
    ``(n_name, o_year, profit_c)``.

    Scale plan: the shared partkey-filter + suppkey-attach builder
    compacts lineitem to (orderkey, supplier-nation) partials; the
    orders join only attaches the year (orderkey co-location folds the
    partials first); per-(nation, year) rows per block are dim-bounded,
    so the driver merge is |nations|·|years| and nation names come from
    the 25-row broadcast map.
    """
    import ray.data as rd

    from ..stages.joins import bucket_hash_join

    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nmap = dict(zip(nat["n_nationkey"].astype(int),
                    nat["n_name"].astype(str)))

    per_ord = _line_part_supp_rev(
        sf_dir,
        part_mask_fn=lambda df: df["p_name"].fillna("").astype(str)
            .str.contains(name_substr, regex=False),
        part_cols=["p_name"], n_buckets=n_buckets)

    ords = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]) \
        .map_batches(lambda df: pa.table({
            "o_orderkey": pa.array(df["o_orderkey"].to_numpy(np.int64),
                                   pa.int64()),
            "o_year": pa.array(df["o_orderdate"].dt.year
                               .to_numpy(np.int64), pa.int64())}),
            batch_format="pandas")

    j = bucket_hash_join(
        per_ord, ords, on="o_orderkey", how="inner", n_buckets=n_buckets,
        left_types={"o_orderkey": pa.int64(), "s_nationkey": pa.int64(),
                    "rev_c": pa.int64()},
        right_types={"o_orderkey": pa.int64(), "o_year": pa.int64()})

    def ny_partial(df: pd.DataFrame) -> pa.Table:
        g = df.groupby(["s_nationkey", "o_year"], as_index=False)[
            "rev_c"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = j.map_batches(ny_partial, batch_format="pandas",
                          batch_size=None).to_pandas()
    if len(parts):
        parts = parts.groupby(["s_nationkey", "o_year"],
                              as_index=False)["rev_c"].sum()
    return rd.from_arrow(pa.table({
        "n_name": pa.array([nmap[int(k)] for k in parts["s_nationkey"]]
                           if len(parts) else [], pa.string()),
        "o_year": pa.array(parts["o_year"].to_numpy(np.int64)
                           if len(parts) else [], pa.int64()),
        "profit_c": pa.array(parts["rev_c"].to_numpy(np.int64)
                             if len(parts) else [], pa.int64())}))


# ---------------------------------------------------------------------------
# market-basket co-purchase pairs
# ---------------------------------------------------------------------------

def basket_pairs(sf_dir: str, *, k: int = 20, n_buckets: int = 256):
    """Top-``k`` co-purchased part pairs (the market-basket support
    count): parts count once per order (DISTINCT law), a pair's count
    is the number of orders containing BOTH, ranked ``(cnt DESC, p1,
    p2)`` with 1-based rank.  Output ``(rank, p1, p2, cnt)``.

    Scale shape: the self-join never materializes globally — orders
    co-locate by orderkey hash, the within-order pair fan-out is
    bounded by order SIZE (single-digit lines per order; no stop-key
    skew by construction), pair counts pre-combine in the orderkey
    bucket and finalize in ≤``n_buckets`` pair-hash groups; top-k is
    per-block partials with real-id tie-breaks merged on the driver
    (≤ blocks·k rows).
    """
    import ray.data as rd

    from ..util import pair_bucket

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def tag(df: pd.DataFrame) -> pa.Table:
        g = df.drop_duplicates(["l_orderkey", "l_partkey"])
        return pa.table({
            "l_orderkey": pa.array(g["l_orderkey"].to_numpy(np.int64),
                                   pa.int64()),
            "l_partkey": pa.array(g["l_partkey"].to_numpy(np.int64),
                                  pa.int64()),
            "_ob": pa.array(_bucket_hash(g["l_orderkey"], n_buckets),
                            pa.int64())})

    empty = pa.table({"p1": pa.array([], pa.int64()),
                      "p2": pa.array([], pa.int64()),
                      "cnt": pa.array([], pa.int64()),
                      "_pb": pa.array([], pa.int64())})

    def order_pairs(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return empty
        g = g.drop_duplicates(["l_orderkey", "l_partkey"])
        m = g.merge(g, on="l_orderkey", suffixes=("_a", "_b"))
        m = m[m["l_partkey_a"] < m["l_partkey_b"]]
        if not len(m):
            return empty
        agg = m.groupby(["l_partkey_a", "l_partkey_b"], as_index=False) \
            .size()
        p1 = agg["l_partkey_a"].to_numpy(np.int64)
        p2 = agg["l_partkey_b"].to_numpy(np.int64)
        return pa.table({
            "p1": pa.array(p1, pa.int64()),
            "p2": pa.array(p2, pa.int64()),
            "cnt": pa.array(agg["size"].to_numpy(np.int64), pa.int64()),
            "_pb": pa.array(pair_bucket(p1, p2, n_buckets), pa.int64())})

    def combine_topk(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby(["p1", "p2"], as_index=False)["cnt"].sum()
        top = agg.sort_values(["cnt", "p1", "p2"],
                              ascending=[False, True, True],
                              kind="mergesort").head(k)
        return pa.table({
            "p1": pa.array(top["p1"].to_numpy(np.int64), pa.int64()),
            "p2": pa.array(top["p2"].to_numpy(np.int64), pa.int64()),
            "cnt": pa.array(top["cnt"].to_numpy(np.int64), pa.int64())})

    parts = ds.map_batches(tag, batch_format="pandas") \
        .groupby("_ob").map_groups(order_pairs, batch_format="pandas") \
        .groupby("_pb").map_groups(combine_topk, batch_format="pandas") \
        .to_pandas()
    if len(parts):
        parts = parts.sort_values(["cnt", "p1", "p2"],
                                  ascending=[False, True, True],
                                  kind="mergesort").head(k) \
            .reset_index(drop=True)
    return rd.from_arrow(pa.table({
        "rank": pa.array(np.arange(1, len(parts) + 1), pa.int64()),
        "p1": pa.array(parts["p1"].to_numpy(np.int64)
                       if len(parts) else [], pa.int64()),
        "p2": pa.array(parts["p2"].to_numpy(np.int64)
                       if len(parts) else [], pa.int64()),
        "cnt": pa.array(parts["cnt"].to_numpy(np.int64)
                        if len(parts) else [], pa.int64())}))


# ---------------------------------------------------------------------------
# Pareto revenue concentration per nation
# ---------------------------------------------------------------------------

def revenue_concentration(sf_dir: str, *, n_buckets: int = 64):
    """Pareto concentration per nation: the share of order revenue
    carried by the TOP DECILE of that nation's customers (by revenue,
    ties broken on custkey; decile size ``ceil(n/10)`` over customers
    WITH orders).  Output ``(n_name, n_customers, top_k, total_c,
    top_c, share_bp)`` — the 80/20 audit every revenue dashboard runs.

    Scale plan: orders collapse to per-batch (custkey, cents) partials
    (order-level ``_cents`` fold); the custkey bucket join co-locates
    each customer's partials, so the exact per-customer total forms
    in-bucket; the second shuffle keys on HASH(nation), whose groups
    are per-nation customer AGGREGATES (2 int64s per active customer,
    1/|nations| of the active-customer table per group — the same
    bounded-group assumption as lang_quantiles, stated here); the
    decile cut is one vectorized sort per nation and only |nations|
    result rows leave the stage.
    """
    import ray.data as rd

    from ..stages.joins import bucket_hash_join

    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nmap = dict(zip(nat["n_nationkey"].astype(int),
                    nat["n_name"].astype(str)))

    def ord_part(df: pd.DataFrame) -> pa.Table:
        g = (pd.DataFrame({
                "c_custkey": df["o_custkey"].to_numpy(np.int64),
                "rev_c": _cents(df["o_totalprice"].to_numpy()),
             }).groupby("c_custkey", as_index=False)["rev_c"].sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    ords = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]) \
        .map_batches(ord_part, batch_format="pandas")

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .map_batches(lambda df: pa.table({
            "c_custkey": pa.array(df["c_custkey"].to_numpy(np.int64),
                                  pa.int64()),
            "c_nationkey": pa.array(df["c_nationkey"].to_numpy(np.int64),
                                    pa.int64())}), batch_format="pandas")

    j = bucket_hash_join(
        ords, cust, on="c_custkey", how="inner", n_buckets=n_buckets,
        left_types={"c_custkey": pa.int64(), "rev_c": pa.int64()},
        right_types={"c_custkey": pa.int64(), "c_nationkey": pa.int64()})

    def per_cust(df: pd.DataFrame) -> pa.Table:
        g = df.groupby(["c_custkey", "c_nationkey"], as_index=False)[
            "rev_c"].sum()
        return pa.table({
            "ck": pa.array(g["c_custkey"].to_numpy(np.int64), pa.int64()),
            "nk": pa.array(g["c_nationkey"].to_numpy(np.int64),
                           pa.int64()),
            "rev_c": pa.array(g["rev_c"].to_numpy(np.int64), pa.int64()),
            "_nb": pa.array(_bucket_hash(g["c_nationkey"], n_buckets),
                            pa.int64())})

    empty = pa.table({"nk": pa.array([], pa.int64()),
                      "n_customers": pa.array([], pa.int64()),
                      "top_k": pa.array([], pa.int64()),
                      "total_c": pa.array([], pa.int64()),
                      "top_c": pa.array([], pa.int64()),
                      "share_bp": pa.array([], pa.int64())})

    def decile(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return empty
        out = {k: [] for k in ["nk", "n_customers", "top_k", "total_c",
                               "top_c", "share_bp"]}
        g = g.sort_values(["nk", "rev_c", "ck"],
                          ascending=[True, False, True], kind="mergesort")
        for nk, sub in g.groupby("nk", sort=False):
            n = len(sub)
            k = (n + 9) // 10
            rev = sub["rev_c"].to_numpy(np.int64)
            total = int(rev.sum())
            top = int(rev[:k].sum())
            out["nk"].append(int(nk))
            out["n_customers"].append(n)
            out["top_k"].append(k)
            out["total_c"].append(total)
            out["top_c"].append(top)
            out["share_bp"].append(top * 10_000 // total if total > 0
                                   else 0)
        return pa.table({k: pa.array(v, pa.int64())
                         for k, v in out.items()})

    parts = j.map_batches(per_cust, batch_format="pandas",
                          batch_size=None) \
        .groupby("_nb").map_groups(decile, batch_format="pandas") \
        .to_pandas()
    return rd.from_arrow(pa.table({
        "n_name": pa.array([nmap[int(k)] for k in parts["nk"]]
                           if len(parts) else [], pa.string()),
        "n_customers": pa.array(parts["n_customers"].to_numpy(np.int64)
                                if len(parts) else [], pa.int64()),
        "top_k": pa.array(parts["top_k"].to_numpy(np.int64)
                          if len(parts) else [], pa.int64()),
        "total_c": pa.array(parts["total_c"].to_numpy(np.int64)
                            if len(parts) else [], pa.int64()),
        "top_c": pa.array(parts["top_c"].to_numpy(np.int64)
                          if len(parts) else [], pa.int64()),
        "share_bp": pa.array(parts["share_bp"].to_numpy(np.int64)
                             if len(parts) else [], pa.int64())}))


def waiting_suppliers(sf_dir: str, *, nation: str = "NATION_3",
                      late_days: int = 60, k: int = 100):
    """Suppliers who were the SOLE late shipper in a finished
    multi-supplier order (TPC-H Q21 shape — the lineitem self-join
    EXISTS / NOT-EXISTS pair).  A line is late when ``l_shipdate >
    o_orderdate + late_days`` (strict, the order_priority_counts law);
    a supplier "waits" an order when (a) its own max ship is late, (b)
    the order has ≥ 2 distinct suppliers (EXISTS another supplier), and
    (c) NO other supplier was late (NOT EXISTS ≡ order-level late count
    == 1).  Output: ``(s_name, numwait)`` for one nation, top-``k`` by
    ``numwait DESC, s_name``.

    Scale plan: lineitem collapses to per-(orderkey, suppkey) MAX-ship
    partials inside map_batches BEFORE the shuffle (late is monotone in
    max ship, so the partial is a lossless combiner); the orders join
    folds the partials in the join-bucket block where BOTH EXISTS
    predicates are per-order transforms (join key == predicate key —
    the self-join never materializes); per-supplier counts leave each
    block as partials and fold in a suppkey groupby (cardinality ==
    |suppliers|); the supplier dim attaches via the GUARDED
    broadcast_join and the final top-k sorts a nation-bounded result on
    the driver.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.joins import broadcast_join, bucket_hash_join

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_shipdate"])

    def li_part(df: pd.DataFrame) -> pa.Table:
        g = (pd.DataFrame({
                "o_orderkey": df["l_orderkey"].to_numpy(np.int64),
                "s_suppkey": df["l_suppkey"].to_numpy(np.int64),
                "max_ship": df["l_shipdate"].to_numpy("datetime64[us]"),
             }).groupby(["o_orderkey", "s_suppkey"], as_index=False)
             ["max_ship"].max())
        return pa.Table.from_pandas(g, preserve_index=False)

    li_ps = li.map_batches(li_part, batch_format="pandas")

    ords = _read(sf_dir, "orders",
                 ["o_orderkey", "o_orderdate", "o_orderstatus"]) \
        .filter(expr="o_orderstatus == 'F'") \
        .map_batches(
            lambda df: pa.table({
                "o_orderkey": pa.array(
                    df["o_orderkey"].to_numpy(np.int64), pa.int64()),
                "o_orderdate": pa.array(
                    df["o_orderdate"].to_numpy("datetime64[us]"),
                    pa.timestamp("us"))}),
            batch_format="pandas")

    j = bucket_hash_join(
        li_ps, ords, on="o_orderkey", how="inner",
        left_types={"o_orderkey": pa.int64(), "s_suppkey": pa.int64(),
                    "max_ship": pa.timestamp("us")},
        right_types={"o_orderkey": pa.int64(),
                     "o_orderdate": pa.timestamp("us")})

    lag = np.timedelta64(late_days, "D").astype("timedelta64[us]")

    def waiting_partial(df: pd.DataFrame) -> pa.Table:
        # fold cross-batch partials to one row per (order, supplier);
        # the whole orderkey is co-located in this block (join key ==
        # predicate key), so both EXISTS tests are exact here.
        g = df.groupby(["o_orderkey", "s_suppkey"], as_index=False).agg(
            max_ship=("max_ship", "max"),
            o_orderdate=("o_orderdate", "first"))
        late = (g["max_ship"].to_numpy("datetime64[us]") >
                (g["o_orderdate"].to_numpy("datetime64[us]") + lag)) \
            .astype(np.int64)
        g = g.assign(late=late)
        by_ok = g.groupby("o_orderkey")
        n_supp = by_ok["s_suppkey"].transform("size").to_numpy(np.int64)
        n_late = by_ok["late"].transform("sum").to_numpy(np.int64)
        hit = g[(late == 1) & (n_supp >= 2) & (n_late == 1)]
        vc = hit.groupby("s_suppkey").size()
        return pa.table({
            "s_suppkey": pa.array(vc.index.to_numpy(np.int64),
                                  pa.int64()),
            "numwait": pa.array(vc.to_numpy(np.int64), pa.int64())})

    per_supp = j.map_batches(waiting_partial, batch_format="pandas",
                             batch_size=None) \
        .groupby("s_suppkey").aggregate(Sum("numwait",
                                            alias_name="numwait"))

    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nks = set(nat.loc[nat["n_name"] == nation, "n_nationkey"]
              .astype(int).tolist())
    supp = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_name", "s_nationkey"]) \
        .map_batches(
            lambda df: pa.Table.from_pandas(
                df[df["s_nationkey"].astype(int).isin(nks)]
                [["s_suppkey", "s_name"]],
                preserve_index=False),
            batch_format="pandas")

    named = broadcast_join(
        per_supp, supp, on="s_suppkey", how="inner",
        left_cols=["s_suppkey", "numwait"])

    # result bounded by the nation's supplier count (a dim slice) — the
    # driver sort is on a dimension-sized frame, never the facts.
    out = named.to_pandas()
    if out.empty:
        from ..util import table_or_dataset
        return table_or_dataset(pa.table({
            "s_name": pa.array([], pa.string()),
            "numwait": pa.array([], pa.int64())}))
    out = out.sort_values(["numwait", "s_name"],
                          ascending=[False, True]).head(k)
    return rd.from_arrow(pa.table({
        "s_name": pa.array(out["s_name"].astype(str), pa.string()),
        "numwait": pa.array(out["numwait"].to_numpy(np.int64),
                            pa.int64())}))


# ---------------------------------------------------------------------------
# Q6: forecasting revenue change — predicate pushdown at the read
# ---------------------------------------------------------------------------

def forecast_revenue(sf_dir: str, *, year: int = 1996,
                     disc_lo: float = 0.02, disc_hi: float = 0.04,
                     max_qty: float = 25.0):
    """TPC-H Q6 shape: total discount revenue that a promotion in
    ``year`` would have forfeited — ``SUM(extendedprice * discount)``
    over in-year lineitems with a discount in ``[disc_lo, disc_hi]``
    and quantity below ``max_qty``.  One row: ``(revenue_c, n_items)``.

    This is the suite's predicate-pushdown demo: the ship-date window
    is a ``pyarrow.dataset`` filter passed to ``read_parquet`` itself,
    so at scale only matching ROW GROUPS leave storage (min/max
    statistics prune whole files of off-year data before a byte moves)
    — the remaining predicates and the cents fold are one map-only
    pass emitting a single scalar partial per batch; no shuffle at all.
    The item cents law is ``floor(ep * disc * 100 + 0.5)`` with SQL's
    op order, so the float product never leaks into the compare.
    """
    import ray.data as rd

    lo = np.datetime64(f"{year}-01-01", "us")
    hi = np.datetime64(f"{year + 1}-01-01", "us")

    import pyarrow.dataset as pads

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=((pads.field("l_shipdate") >= pa.scalar(lo))
                & (pads.field("l_shipdate") < pa.scalar(hi))))

    def partial(df: pd.DataFrame) -> pa.Table:
        sd = df["l_shipdate"].to_numpy().astype("datetime64[us]")
        m = ((sd >= lo) & (sd < hi)
             & (df["l_discount"].to_numpy() >= disc_lo)
             & (df["l_discount"].to_numpy() <= disc_hi)
             & (df["l_quantity"].to_numpy() < max_qty))
        ep = df["l_extendedprice"].to_numpy()[m]
        dc = df["l_discount"].to_numpy()[m]
        rev = np.floor(ep * dc * 100.0 + 0.5).astype(np.int64)
        return pa.table({"revenue_c": pa.array([int(rev.sum())],
                                               pa.int64()),
                         "n_items": pa.array([int(m.sum())], pa.int64())})

    # scalar partials only — one (revenue, count) row per batch reaches
    # the driver regardless of corpus size
    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    return rd.from_arrow(pa.table({
        "revenue_c": pa.array([int(parts["revenue_c"].sum())
                               if len(parts) else 0], pa.int64()),
        "n_items": pa.array([int(parts["n_items"].sum())
                             if len(parts) else 0], pa.int64())}))


# ---------------------------------------------------------------------------
# Q11: important stock — per-part value vs a GLOBAL scalar threshold
# ---------------------------------------------------------------------------

def important_parts(sf_dir: str, *, nation: str = "NATION_3",
                    frac_den: int = 1000, n_buckets: int = 64):
    """TPC-H Q11 shape (partsupp re-based on lineitem): parts whose
    total line value supplied by ``nation``'s suppliers exceeds
    ``1/frac_den`` of that nation's GLOBAL supplied value.  Output one
    row per qualifying part: ``(p_partkey, value_c)``.

    The distinctive piece is the global-scalar HAVING: the threshold
    is an aggregate over the SAME derived table the filter runs on.
    Scale plan: lineitem folds to per-(suppkey, partkey) cents partials
    before a bucketed SEMI join against the nation's suppliers (the
    nation slice of a warehouse-scale supplier dim is itself large —
    no broadcast); per-part exact totals form in partkey buckets and
    that per-part table is materialized ONCE (|parts| rows, dimension-
    bounded) to serve both consumers — the scalar total (per-batch
    scalar partials, driver sees one row per batch) and the threshold
    filter (scalar broadcast into a map-only mask).  The integer law
    ``value_c * frac_den > total_c`` keeps the compare exact.
    """
    from ..stages.joins import bucket_hash_join

    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nks = set(nat.loc[nat["n_name"] == nation, "n_nationkey"]
              .astype(int).tolist())

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]) \
        .map_batches(
            lambda df: pa.table({"s_suppkey": pa.array(
                df.loc[df["s_nationkey"].astype(int).isin(nks),
                       "s_suppkey"].to_numpy(np.int64), pa.int64())}),
            batch_format="pandas")

    def li_part(df: pd.DataFrame) -> pa.Table:
        g = (pd.DataFrame({
                "s_suppkey": df["l_suppkey"].to_numpy(np.int64),
                "p_partkey": df["l_partkey"].to_numpy(np.int64),
                "value_c": _cents(df["l_extendedprice"].to_numpy()),
             }).groupby(["s_suppkey", "p_partkey"],
                        as_index=False)["value_c"].sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    li = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_partkey", "l_extendedprice"]) \
        .map_batches(li_part, batch_format="pandas")

    ls = bucket_hash_join(
        li, supp, on="s_suppkey", how="semi", n_buckets=n_buckets,
        left_types={"s_suppkey": pa.int64(), "p_partkey": pa.int64(),
                    "value_c": pa.int64()},
        right_types={"s_suppkey": pa.int64()})

    def part_partial(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("p_partkey", as_index=False)["value_c"].sum()
        g["_pb"] = _bucket_hash(g["p_partkey"], n_buckets)
        return pa.Table.from_pandas(g, preserve_index=False)

    def combine(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return pa.table({"p_partkey": pa.array([], pa.int64()),
                             "value_c": pa.array([], pa.int64())})
        c = g.groupby("p_partkey", as_index=False)["value_c"].sum()
        return pa.table({
            "p_partkey": pa.array(c["p_partkey"].to_numpy(np.int64),
                                  pa.int64()),
            "value_c": pa.array(c["value_c"].to_numpy(np.int64),
                                pa.int64())})

    per_part = ls.map_batches(part_partial, batch_format="pandas",
                              batch_size=None) \
        .groupby("_pb").map_groups(combine, batch_format="pandas") \
        .materialize()   # |parts| rows, read by BOTH consumers below

    tot_parts = per_part.map_batches(
        lambda df: pa.table({"t": pa.array(
            [int(df["value_c"].sum())], pa.int64())}),
        batch_format="pandas").to_pandas()
    total = int(tot_parts["t"].sum()) if len(tot_parts) else 0

    def cut(df: pd.DataFrame) -> pa.Table:
        keep = df[df["value_c"].to_numpy(np.int64) * frac_den > total]
        return pa.table({
            "p_partkey": pa.array(keep["p_partkey"].to_numpy(np.int64),
                                  pa.int64()),
            "value_c": pa.array(keep["value_c"].to_numpy(np.int64),
                                pa.int64())})

    out = per_part.map_batches(cut, batch_format="pandas").to_pandas()
    # < frac_den rows by LAW (each keeper holds > total/frac_den), so
    # the driver collect is arithmetic-bounded; table_or_dataset keeps
    # the schema visible when the result is legitimately empty
    from ..util import table_or_dataset
    return table_or_dataset(pa.table({
        "p_partkey": pa.array(out["p_partkey"].to_numpy(np.int64)
                              if len(out) else [], pa.int64()),
        "value_c": pa.array(out["value_c"].to_numpy(np.int64)
                            if len(out) else [], pa.int64())}))


# ---------------------------------------------------------------------------
# Q20: dominant suppliers of a part family — per-group scalar + semi chain
# ---------------------------------------------------------------------------

def excess_shippers(sf_dir: str, *, nation: str = "NATION_3",
                    name_prefix: str = "blue", year: int = 1996,
                    n_buckets: int = 64):
    """TPC-H Q20 shape: suppliers from ``nation`` who DOMINATED the
    in-``year`` supply of some ``name_prefix`` part — shipped a strict
    majority (``2*qty > part total``) of that part's year quantity.
    Output one row per such supplier: ``(s_suppkey, s_name, n_parts)``
    with the number of parts dominated.

    Scale plan: the part family is an honest bucketed SEMI join (a
    name-prefix slice of a warehouse part dim is itself large); the
    per-(part, supplier) quantities AND the per-part totals both key on
    partkey, so the dominance test runs inside the join's partkey
    buckets with no extra shuffle (the shipping_priority fold law);
    the surviving (supplier, part) set is dimension-bounded, so the
    per-supplier count is one coarse-bucket groupby and the nation
    name-attach is a guarded broadcast join.  Quantities are whole by
    TPC-H construction — both sides CAST to int64 so the majority test
    is exact integer arithmetic.
    """
    import ray.data as rd

    from ..stages.joins import broadcast_join, bucket_hash_join

    lo = np.datetime64(f"{year}-01-01", "us")
    hi = np.datetime64(f"{year + 1}-01-01", "us")

    part_f = _read(sf_dir, "part", ["p_partkey", "p_name"]) \
        .map_batches(
            lambda df: pa.table({"l_partkey": pa.array(
                df.loc[df["p_name"].astype(str).str.startswith(name_prefix),
                       "p_partkey"].to_numpy(np.int64), pa.int64())}),
            batch_format="pandas")

    def li_part(df: pd.DataFrame) -> pa.Table:
        sd = df["l_shipdate"].to_numpy().astype("datetime64[us]")
        m = (sd >= lo) & (sd < hi)
        g = (pd.DataFrame({
                "l_partkey": df["l_partkey"].to_numpy(np.int64)[m],
                "l_suppkey": df["l_suppkey"].to_numpy(np.int64)[m],
                "qty": df["l_quantity"].to_numpy()[m].astype(np.int64),
             }).groupby(["l_partkey", "l_suppkey"],
                        as_index=False)["qty"].sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"]) \
        .map_batches(li_part, batch_format="pandas")

    lp = bucket_hash_join(
        li, part_f, on="l_partkey", how="semi", n_buckets=n_buckets,
        left_types={"l_partkey": pa.int64(), "l_suppkey": pa.int64(),
                    "qty": pa.int64()},
        right_types={"l_partkey": pa.int64()})

    # the join co-located each partkey's partials: dominance settles
    # in-bucket (batch_size=None keeps the bucket block whole)
    def dominate(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return pa.table({"s_suppkey": pa.array([], pa.int64()),
                             "n_parts": pa.array([], pa.int64())})
        g = df.groupby(["l_partkey", "l_suppkey"], as_index=False)[
            "qty"].sum()
        tot = g.groupby("l_partkey")["qty"].transform("sum")
        dom = g[2 * g["qty"].to_numpy(np.int64)
                > tot.to_numpy(np.int64)]
        c = dom.groupby("l_suppkey", as_index=False).size() \
            .rename(columns={"size": "n_parts"})
        return pa.table({
            "s_suppkey": pa.array(c["l_suppkey"].to_numpy(np.int64),
                                  pa.int64()),
            "n_parts": pa.array(c["n_parts"].to_numpy(np.int64),
                                pa.int64())})

    per_supp_part = lp.map_batches(dominate, batch_format="pandas",
                                   batch_size=None)

    # a supplier's dominated parts may span partkey buckets — one tiny
    # coarse-bucket combine over the dimension-bounded (supp, count) rows
    def supp_partial(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("s_suppkey", as_index=False)["n_parts"].sum()
        g["_sb"] = _bucket_hash(g["s_suppkey"], n_buckets)
        return pa.Table.from_pandas(g, preserve_index=False)

    def supp_combine(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return pa.table({"s_suppkey": pa.array([], pa.int64()),
                             "n_parts": pa.array([], pa.int64())})
        c = g.groupby("s_suppkey", as_index=False)["n_parts"].sum()
        return pa.table({
            "s_suppkey": pa.array(c["s_suppkey"].to_numpy(np.int64),
                                  pa.int64()),
            "n_parts": pa.array(c["n_parts"].to_numpy(np.int64),
                                pa.int64())})

    counts = per_supp_part.map_batches(supp_partial,
                                       batch_format="pandas",
                                       batch_size=None) \
        .groupby("_sb").map_groups(supp_combine, batch_format="pandas")

    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nks = set(nat.loc[nat["n_name"] == nation, "n_nationkey"]
              .astype(int).tolist())
    def supp_filter(df: pd.DataFrame) -> pa.Table:
        # explicit types: an all-filtered batch must NOT emit a
        # null-typed s_name column (the pa.null() schema-mix trap)
        m = df.loc[df["s_nationkey"].astype(int).isin(nks)]
        return pa.table({
            "s_suppkey": pa.array(m["s_suppkey"].to_numpy(np.int64),
                                  pa.int64()),
            "s_name": pa.array(m["s_name"].astype(str).tolist(),
                               pa.string())})

    supp = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_name", "s_nationkey"]) \
        .map_batches(supp_filter, batch_format="pandas")

    out = broadcast_join(counts, supp, on="s_suppkey", how="inner",
                         left_cols=["s_suppkey", "n_parts"]).to_pandas()
    from ..util import table_or_dataset
    return table_or_dataset(pa.table({
        "s_suppkey": pa.array(out["s_suppkey"].to_numpy(np.int64)
                              if len(out) else [], pa.int64()),
        "s_name": pa.array(out["s_name"].astype(str).tolist()
                           if len(out) else [], pa.string()),
        "n_parts": pa.array(out["n_parts"].to_numpy(np.int64)
                            if len(out) else [], pa.int64())}))


# ---------------------------------------------------------------------------
# Q2: minimum-cost supplier — correlated per-group MIN with ties
# ---------------------------------------------------------------------------

def min_cost_supplier(sf_dir: str, *, region: str = "EUROPE",
                      max_size: int = 10, p_type: str = "ECONOMY",
                      n_buckets: int = 64):
    """TPC-H Q2 shape (partsupp re-based on lineitem): for every part
    of ``p_type`` with ``p_size <= max_size``, the ``region``
    supplier(s) achieving the
    MINIMUM unit cost ever shipped — the correlated-subquery MIN with
    ties kept.  Unit cost is the exact integer law
    ``floor(ep / qty * 100 + 0.5)`` per line, MIN-folded per
    (part, supplier).  Output ``(p_partkey, s_suppkey, s_name,
    ucost_c)`` — one row per tied winner.

    Scale plan: lineitem folds to per-(part, supplier) MIN partials
    per batch; TWO honest bucketed semi joins prune them (region
    suppliers — a region is 1/|regions| of a warehouse supplier dim,
    no broadcast; then the part family); the correlated MIN and the
    tie-keeping filter settle INSIDE the partkey join buckets (the
    argmin never shuffles again), and only the dimension-bounded
    winner set takes the guarded broadcast to attach names.
    """
    import ray.data as rd

    from ..stages.joins import broadcast_join, bucket_hash_join

    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    rks = set(reg.loc[reg["r_name"] == region, "r_regionkey"]
              .astype(int).tolist())
    nks = set(nat.loc[nat["n_regionkey"].isin(rks), "n_nationkey"]
              .astype(int).tolist())

    rsupp_keys = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]) \
        .map_batches(
            lambda df: pa.table({"l_suppkey": pa.array(
                df.loc[df["s_nationkey"].astype(int).isin(nks),
                       "s_suppkey"].to_numpy(np.int64), pa.int64())}),
            batch_format="pandas")

    part_f = _read(sf_dir, "part", ["p_partkey", "p_size", "p_type"]) \
        .map_batches(
            lambda df: pa.table({"l_partkey": pa.array(
                df.loc[(df["p_size"].astype(int) <= max_size)
                       & (df["p_type"].astype(str) == p_type),
                       "p_partkey"].to_numpy(np.int64), pa.int64())}),
            batch_format="pandas")

    def li_part(df: pd.DataFrame) -> pa.Table:
        ep = df["l_extendedprice"].to_numpy()
        qty = df["l_quantity"].to_numpy()
        g = (pd.DataFrame({
                "l_partkey": df["l_partkey"].to_numpy(np.int64),
                "l_suppkey": df["l_suppkey"].to_numpy(np.int64),
                "ucost_c": np.floor(ep / qty * 100.0 + 0.5)
                           .astype(np.int64),
             }).groupby(["l_partkey", "l_suppkey"],
                        as_index=False)["ucost_c"].min())
        return pa.Table.from_pandas(g, preserve_index=False)

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_extendedprice",
                "l_quantity"]) \
        .map_batches(li_part, batch_format="pandas")

    ls = bucket_hash_join(
        li, rsupp_keys, on="l_suppkey", how="semi", n_buckets=n_buckets,
        left_types={"l_partkey": pa.int64(), "l_suppkey": pa.int64(),
                    "ucost_c": pa.int64()},
        right_types={"l_suppkey": pa.int64()})

    lp = bucket_hash_join(
        ls, part_f, on="l_partkey", how="semi", n_buckets=n_buckets,
        left_types={"l_partkey": pa.int64(), "l_suppkey": pa.int64(),
                    "ucost_c": pa.int64()},
        right_types={"l_partkey": pa.int64()})

    def argmin_kernel(df: pd.DataFrame) -> pa.Table:
        empty = pa.table({"s_suppkey": pa.array([], pa.int64()),
                          "p_partkey": pa.array([], pa.int64()),
                          "ucost_c": pa.array([], pa.int64())})
        if not len(df):
            return empty
        g = df.groupby(["l_partkey", "l_suppkey"], as_index=False)[
            "ucost_c"].min()
        m = g.groupby("l_partkey")["ucost_c"].transform("min")
        win = g[g["ucost_c"].to_numpy(np.int64) == m.to_numpy(np.int64)]
        return pa.table({
            "s_suppkey": pa.array(win["l_suppkey"].to_numpy(np.int64),
                                  pa.int64()),
            "p_partkey": pa.array(win["l_partkey"].to_numpy(np.int64),
                                  pa.int64()),
            "ucost_c": pa.array(win["ucost_c"].to_numpy(np.int64),
                                pa.int64())})

    winners = lp.map_batches(argmin_kernel, batch_format="pandas",
                             batch_size=None)

    def supp_filter(df: pd.DataFrame) -> pa.Table:
        # explicit types: an all-filtered batch must NOT emit a
        # null-typed s_name column (the pa.null() schema-mix trap)
        m = df.loc[df["s_nationkey"].astype(int).isin(nks)]
        return pa.table({
            "s_suppkey": pa.array(m["s_suppkey"].to_numpy(np.int64),
                                  pa.int64()),
            "s_name": pa.array(m["s_name"].astype(str).tolist(),
                               pa.string())})

    supp = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_name", "s_nationkey"]) \
        .map_batches(supp_filter, batch_format="pandas")

    out = broadcast_join(
        winners, supp, on="s_suppkey", how="inner",
        left_cols=["s_suppkey", "p_partkey", "ucost_c"]).to_pandas()
    from ..util import table_or_dataset
    return table_or_dataset(pa.table({
        "p_partkey": pa.array(out["p_partkey"].to_numpy(np.int64)
                              if len(out) else [], pa.int64()),
        "s_suppkey": pa.array(out["s_suppkey"].to_numpy(np.int64)
                              if len(out) else [], pa.int64()),
        "s_name": pa.array(out["s_name"].astype(str).tolist()
                           if len(out) else [], pa.string()),
        "ucost_c": pa.array(out["ucost_c"].to_numpy(np.int64)
                            if len(out) else [], pa.int64())}))


# ---------------------------------------------------------------------------
# cohort retention matrix
# ---------------------------------------------------------------------------

def cohort_retention(sf_dir: str, *, max_offset: int = 8,
                     n_buckets: int = 64):
    """Cohort retention matrix — the classic growth table: users are
    cohorted by their FIRST active epoch week; for each (cohort week,
    week offset ``k``) the number of cohort users active in
    ``cohort + k`` (offset 0 = cohort size by construction).  Offsets
    above ``max_offset`` are dropped (fixed matrix width).  Output
    ``(cohort_week, offset, n_users)`` — same integer week law as
    :func:`user_retention` (``epoch_us // (7·86400·10⁶)``).

    Scale shape: per-batch distinct-(user, week) partials; user-hash
    buckets hold ALL weeks of their users, so the per-user first-week
    and the (cohort, offset) explode are exact in-bucket and collapse
    to matrix partials before the one tiny Sum shuffle
    (≤ |weeks|·max_offset keys).  Users never leave their bucket.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    us_per_week = np.int64(7 * 86_400_000_000)
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pa.Table:
        week = (df["ts"].to_numpy().astype("datetime64[us]")
                .astype(np.int64) // us_per_week)
        g = pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                          "week": week}).drop_duplicates()
        return pa.Table.from_pandas(g, preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"cohort_week": pa.array([], pa.int64()),
                          "offset": pa.array([], pa.int64()),
                          "n_users": pa.array([], pa.int64())})
        if not len(g):
            return empty
        uw = g[["user_id", "week"]].drop_duplicates()
        first = uw.groupby("user_id")["week"].transform("min")
        off = uw["week"].to_numpy(np.int64) - first.to_numpy(np.int64)
        m = pd.DataFrame({"cohort_week": first.to_numpy(np.int64),
                          "offset": off})
        m = m[m["offset"] <= max_offset]
        agg = m.groupby(["cohort_week", "offset"], as_index=False).size()
        return pa.table({
            "cohort_week": pa.array(agg["cohort_week"]
                                    .to_numpy(np.int64), pa.int64()),
            "offset": pa.array(agg["offset"].to_numpy(np.int64),
                               pa.int64()),
            "n_users": pa.array(agg["size"].to_numpy(np.int64),
                                pa.int64())})

    parts = _bucket_tag(ds.map_batches(partial, batch_format="pandas"),
                        ["user_id"], n_buckets) \
        .groupby("_ub").map_groups(per_bucket, batch_format="pandas")
    return parts.groupby(["cohort_week", "offset"]).aggregate(
        Sum("n_users", alias_name="n_users"))


# ---------------------------------------------------------------------------
# per-customer inter-order gap median (per-key exact percentile)
# ---------------------------------------------------------------------------

def order_gap_median(sf_dir: str, *, n_buckets: int = 64):
    """Per-customer purchase cadence: the exact MEDIAN gap in whole
    days between consecutive orders — the reorder-cycle input to churn
    models, for every customer with ≥ 2 orders.  The median is the
    engine's peers-inclusive percentile law per key (smallest gap with
    ``rank·2 ≥ n_gaps``); same-day repeat orders contribute exact zero
    gaps (the gap MULTISET is order-of-ties invariant, so sorting by
    day alone is deterministic).  Output ``(c_custkey, n_orders,
    median_gap_days)``.

    Scale shape: one shuffle — customers co-locate by hash, and the
    whole kernel (per-customer day sort, adjacent diff, rank/median
    cut) is three vectorized passes over the bucket frame; no per-key
    groups, nothing on the driver.
    """
    import pandas as pd

    us_per_day = np.int64(86_400_000_000)
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def partial(df: pd.DataFrame) -> pa.Table:
        return pa.table({
            "c_custkey": pa.array(df["o_custkey"].to_numpy(np.int64),
                                  pa.int64()),
            "d": pa.array(df["o_orderdate"].to_numpy()
                          .astype("datetime64[us]").astype(np.int64)
                          // us_per_day, pa.int64())})

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"c_custkey": pa.array([], pa.int64()),
                          "n_orders": pa.array([], pa.int64()),
                          "median_gap_days": pa.array([], pa.int64())})
        if not len(g):
            return empty
        g = g.sort_values(["c_custkey", "d"], kind="mergesort")
        ck = g["c_custkey"].to_numpy(np.int64)
        d = g["d"].to_numpy(np.int64)
        same = np.empty(len(g), bool)
        same[0] = False
        same[1:] = ck[1:] == ck[:-1]
        gap = np.empty(len(g), np.int64)
        gap[0] = 0
        gap[1:] = d[1:] - d[:-1]
        gp = pd.DataFrame({"ck": ck[same], "gap": gap[same]})
        if not len(gp):
            return empty
        gp = gp.sort_values(["ck", "gap"], kind="mergesort")
        rn = gp.groupby("ck", sort=False).cumcount().to_numpy() + 1
        n = gp.groupby("ck", sort=False)["gap"].transform("size") \
            .to_numpy(np.int64)
        med = gp[rn * 2 >= n].drop_duplicates("ck")
        nn = gp.drop_duplicates("ck").assign(
            n_orders=n[np.flatnonzero(rn == 1)] + 1)
        out = nn[["ck", "n_orders"]].merge(
            med.rename(columns={"gap": "median_gap_days"}), on="ck")
        return pa.table({
            "c_custkey": pa.array(out["ck"].to_numpy(np.int64),
                                  pa.int64()),
            "n_orders": pa.array(out["n_orders"].to_numpy(np.int64),
                                 pa.int64()),
            "median_gap_days": pa.array(
                out["median_gap_days"].to_numpy(np.int64), pa.int64())})

    return _bucket_tag(ds.map_batches(partial, batch_format="pandas"),
                       ["c_custkey"], n_buckets) \
        .groupby("_ub").map_groups(per_bucket, batch_format="pandas")


def basket_lift(sf_dir: str, *, k: int = 20, n_buckets: int = 256):
    """Association rules over the top-``k`` co-purchased part pairs:
    support count, both part supports, directional confidences in
    floor bp and the lift in floor ppm (``c_ab·N·10⁶ //
    (c_a·c_b)`` — Python-int on the driver, HUGEINT in SQL: the
    product overflows int64 at warehouse scale).  Pair/support laws
    are exactly :func:`basket_pairs`' (DISTINCT per order, pairs
    ranked ``cnt DESC, p1, p2``).  Output ``(rank, p1, p2, cnt, n_a,
    n_b, conf_ab_bp, conf_ba_bp, lift_ppm)``.

    Scale shape: basket_pairs' order-bucket pass gains two riders in
    the SAME kernels — per-part support partials and the per-bucket
    distinct-order count — so margins cost no extra shuffle over the
    facts; the support table finalizes in one partkey-bounded Sum, and
    only the ≤ 2k supports of the winning pairs reach the driver
    (semi-probed with a broadcast of the top-k part set).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..util import pair_bucket

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def tag(df: pd.DataFrame) -> pa.Table:
        g = df.drop_duplicates(["l_orderkey", "l_partkey"])
        return pa.table({
            "l_orderkey": pa.array(g["l_orderkey"].to_numpy(np.int64),
                                   pa.int64()),
            "l_partkey": pa.array(g["l_partkey"].to_numpy(np.int64),
                                  pa.int64()),
            "_ob": pa.array(_bucket_hash(g["l_orderkey"], n_buckets),
                            pa.int64())})

    pair_empty = pa.table({"p1": pa.array([], pa.int64()),
                           "p2": pa.array([], pa.int64()),
                           "cnt": pa.array([], pa.int64()),
                           "_pb": pa.array([], pa.int64())})

    def order_pairs(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return pair_empty
        g = g.drop_duplicates(["l_orderkey", "l_partkey"])
        m = g.merge(g, on="l_orderkey", suffixes=("_a", "_b"))
        m = m[m["l_partkey_a"] < m["l_partkey_b"]]
        if not len(m):
            return pair_empty
        agg = m.groupby(["l_partkey_a", "l_partkey_b"],
                        as_index=False).size()
        p1 = agg["l_partkey_a"].to_numpy(np.int64)
        p2 = agg["l_partkey_b"].to_numpy(np.int64)
        return pa.table({
            "p1": pa.array(p1, pa.int64()),
            "p2": pa.array(p2, pa.int64()),
            "cnt": pa.array(agg["size"].to_numpy(np.int64), pa.int64()),
            "_pb": pa.array(pair_bucket(p1, p2, n_buckets), pa.int64())})

    def support_part(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return pa.table({"l_partkey": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64()),
                             "n_ord": pa.array([], pa.int64())})
        g = g.drop_duplicates(["l_orderkey", "l_partkey"])
        s = g.groupby("l_partkey", as_index=False).size()
        return pa.table({
            "l_partkey": pa.array(s["l_partkey"].to_numpy(np.int64),
                                  pa.int64()),
            "c": pa.array(s["size"].to_numpy(np.int64), pa.int64()),
            # orders are co-located: in-bucket distinct IS exact, ride
            # it on the first row only (0 elsewhere) for the Sum
            "n_ord": pa.array(
                np.where(np.arange(len(s)) == 0,
                         g["l_orderkey"].nunique(), 0)
                .astype(np.int64), pa.int64())})

    tagged = ds.map_batches(tag, batch_format="pandas").materialize()

    def combine_topk(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby(["p1", "p2"], as_index=False)["cnt"].sum()
        top = agg.sort_values(["cnt", "p1", "p2"],
                              ascending=[False, True, True],
                              kind="mergesort").head(k)
        return pa.table({
            "p1": pa.array(top["p1"].to_numpy(np.int64), pa.int64()),
            "p2": pa.array(top["p2"].to_numpy(np.int64), pa.int64()),
            "cnt": pa.array(top["cnt"].to_numpy(np.int64), pa.int64())})

    pairs = tagged.groupby("_ob") \
        .map_groups(order_pairs, batch_format="pandas") \
        .groupby("_pb").map_groups(combine_topk, batch_format="pandas") \
        .to_pandas()
    if len(pairs):
        pairs = pairs.sort_values(["cnt", "p1", "p2"],
                                  ascending=[False, True, True],
                                  kind="mergesort").head(k) \
            .reset_index(drop=True)

    sup = tagged.groupby("_ob") \
        .map_groups(support_part, batch_format="pandas") \
        .groupby("l_partkey").aggregate(Sum("c", alias_name="c"),
                                        Sum("n_ord", alias_name="n_ord"))

    import pyarrow.compute as pc

    # the support table is consumed twice (winner probe + the total-
    # order scalar) — it is partkey-bounded, materialize once
    sup = sup.materialize()

    # only the winners' supports reach the driver (<= 2k parts)
    want = (set(pairs["p1"].tolist()) | set(pairs["p2"].tolist())) \
        if len(pairs) else set()
    want_arr = pa.array(sorted(want), pa.int64())

    def pick(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t.column("l_partkey"), value_set=want_arr)
        kept = t.filter(keep)
        return pa.table({"l_partkey": kept.column("l_partkey"),
                         "c": kept.column("c")})

    supd = sup.map_batches(pick, batch_format="pyarrow").to_pandas()
    marg = dict(zip(supd["l_partkey"].astype(int),
                    supd["c"].astype(int))) if len(supd) else {}

    tot = sup.map_batches(
        lambda t: pa.table({"n": pa.array(
            [int(pc.sum(t.column("n_ord")).as_py() or 0)], pa.int64())}),
        batch_format="pyarrow").to_pandas()
    n_orders = int(tot["n"].sum()) if len(tot) else 0

    out = {kx: [] for kx in ["rank", "p1", "p2", "cnt", "n_a", "n_b",
                             "conf_ab_bp", "conf_ba_bp", "lift_ppm"]}
    for i in range(len(pairs)):
        p1 = int(pairs["p1"].iloc[i]); p2 = int(pairs["p2"].iloc[i])
        c = int(pairs["cnt"].iloc[i])
        na, nb = marg[p1], marg[p2]
        out["rank"].append(i + 1)
        out["p1"].append(p1); out["p2"].append(p2); out["cnt"].append(c)
        out["n_a"].append(na); out["n_b"].append(nb)
        out["conf_ab_bp"].append(c * 10_000 // na)
        out["conf_ba_bp"].append(c * 10_000 // nb)
        out["lift_ppm"].append(c * n_orders * 1_000_000 // (na * nb))
    from ..util import table_or_dataset
    return table_or_dataset(pa.table(
        {kx: pa.array(v, pa.int64()) for kx, v in out.items()}))


def fact_key_skew(sf_dir: str, *, k: int = 20, n_buckets: int = 256):
    """Join-key skew audit — the measurement behind every salting
    decision in this engine: the exact top-``k`` heaviest join keys of
    the fact table (lineitem rows per ``l_orderkey``), ranked
    ``(n_rows DESC, key ASC)``.  The heavy tail of this table is the
    reduce-task straggler forecast (a key with m rows costs C(m,2) in
    any self-join and m·|match| in any join).  Output ``(rank,
    l_orderkey, n_rows)``.

    Scale shape: per-batch (key, count) partials; key-hash buckets
    finalize exact counts in-bucket, where per-bucket top-``k``
    partials are provably lossless (all rows of a key share its
    bucket); the driver merges ≤ n_buckets·k candidate rows.
    """
    import ray.data as rd

    ds = _read(sf_dir, "lineitem", ["l_orderkey"])

    def partial(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("l_orderkey", as_index=False).size()
        return pa.table({
            "l_orderkey": pa.array(g["l_orderkey"].to_numpy(np.int64),
                                   pa.int64()),
            "n_rows": pa.array(g["size"].to_numpy(np.int64), pa.int64()),
            "_kb": pa.array(_bucket_hash(g["l_orderkey"], n_buckets),
                            pa.int64())})

    def topk_bucket(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "n_rows": pa.array([], pa.int64())})
        c = g.groupby("l_orderkey", as_index=False)["n_rows"].sum()
        top = c.sort_values(["n_rows", "l_orderkey"],
                            ascending=[False, True],
                            kind="mergesort").head(k)
        return pa.table({
            "l_orderkey": pa.array(top["l_orderkey"].to_numpy(np.int64),
                                   pa.int64()),
            "n_rows": pa.array(top["n_rows"].to_numpy(np.int64),
                               pa.int64())})

    parts = ds.map_batches(partial, batch_format="pandas") \
        .groupby("_kb").map_groups(topk_bucket, batch_format="pandas") \
        .to_pandas()
    if len(parts):
        parts = parts.sort_values(["n_rows", "l_orderkey"],
                                  ascending=[False, True],
                                  kind="mergesort").head(k) \
            .reset_index(drop=True)
    from ..util import table_or_dataset
    return table_or_dataset(pa.table({
        "rank": pa.array(np.arange(1, len(parts) + 1), pa.int64()),
        "l_orderkey": pa.array(parts["l_orderkey"].to_numpy(np.int64)
                               if len(parts) else [], pa.int64()),
        "n_rows": pa.array(parts["n_rows"].to_numpy(np.int64)
                           if len(parts) else [], pa.int64())}))


def new_vs_returning(sf_dir: str, *, n_buckets: int = 64):
    """Weekly growth split — the other classic reading of the cohort
    data: per epoch week, how many active users are NEW (this is their
    first active week) vs RETURNING.  Output ``(week, new_users,
    returning_users)``; same integer week law as
    :func:`user_retention` / :func:`cohort_retention`.

    Scale shape: identical to cohort_retention — distinct (user, week)
    partials, user-hash buckets fold the per-user first week, and each
    bucket collapses to per-week (new, returning) partials before one
    tiny Sum shuffle over ≤ |weeks| keys.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    us_per_week = np.int64(7 * 86_400_000_000)
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pa.Table:
        week = (df["ts"].to_numpy().astype("datetime64[us]")
                .astype(np.int64) // us_per_week)
        g = pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                          "week": week}).drop_duplicates()
        return pa.Table.from_pandas(g, preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"week": pa.array([], pa.int64()),
                          "new_users": pa.array([], pa.int64()),
                          "returning_users": pa.array([], pa.int64())})
        if not len(g):
            return empty
        uw = g[["user_id", "week"]].drop_duplicates()
        first = uw.groupby("user_id")["week"].transform("min") \
            .to_numpy(np.int64)
        wk = uw["week"].to_numpy(np.int64)
        m = pd.DataFrame({"week": wk,
                          "new_users": (wk == first).astype(np.int64),
                          "returning_users": (wk != first)
                          .astype(np.int64)})
        agg = m.groupby("week", as_index=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    return _bucket_tag(ds.map_batches(partial, batch_format="pandas"),
                       ["user_id"], n_buckets) \
        .groupby("_ub").map_groups(per_bucket, batch_format="pandas") \
        .groupby("week").aggregate(
            Sum("new_users", alias_name="new_users"),
            Sum("returning_users", alias_name="returning_users"))
