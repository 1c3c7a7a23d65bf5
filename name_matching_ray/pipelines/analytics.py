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
        h = pd.util.hash_pandas_object(
            pdf[keys].astype(str).agg("|".join, axis=1), index=False
        ).to_numpy()
        pdf["_pb"] = (h % n_buckets).astype(np.int64)
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


def sessionize(sf_dir: str, gap_minutes: int = 30):
    """Per-user session counts (session = ts gap > gap_minutes) — the
    windowed/stateful op Ray Data lacks natively; partitioning assumption:
    all events of one user fit one group (holds for per-user event counts)."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    gap = np.timedelta64(gap_minutes * 60, "s")

    def per_user(g: pd.DataFrame) -> pa.Table:
        ts = np.sort(g["ts"].to_numpy())
        n_sessions = 1 + int((np.diff(ts) > gap).sum()) if len(ts) else 0
        return pa.table({
            "user_id": pa.array([int(g["user_id"].iat[0])], pa.int64()),
            "n_sessions": pa.array([n_sessions], pa.int64()),
            "n_events": pa.array([len(ts)], pa.int64()),
        })

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


def rolling_user_value(sf_dir: str, window_minutes: int = 30,
                       n_buckets: int = 256):
    """Per-event TRAILING-WINDOW aggregate: for each event, the sum of the
    same user's value-cents over [ts − window, ts], peers included — exact
    SQL ``RANGE BETWEEN INTERVAL w PRECEDING AND CURRENT ROW`` semantics.

    The sliding-window op Ray Data lacks natively: users are hash-bucketed
    into coarse groups (one Ray group per bucket, not per user), and inside
    each bucket every user's window sums come from one sorted cumsum + two
    vectorized ``searchsorted`` calls (no per-row Python).  Partitioning
    assumption: one user's events fit one group — salt by time range for
    pathological users.
    """
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    win = np.timedelta64(window_minutes * 60, "s")

    def tag(df: pd.DataFrame) -> pa.Table:
        h = pd.util.hash_pandas_object(df["user_id"], index=False).to_numpy()
        return pa.Table.from_pandas(
            df.assign(_ub=(h % n_buckets).astype(np.int64)),
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
        h = pd.util.hash_pandas_object(df["user_id"], index=False).to_numpy()
        return pa.Table.from_pandas(
            df.assign(_ub=(h % n_buckets).astype(np.int64)),
            preserve_index=False,
        )

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        out_u, out_w, out_on, out_late = [], [], [], []
        for uid, u in g.groupby("user_id", sort=False):
            eid = u["event_id"].to_numpy(np.int64)
            ts = u["ts"].to_numpy()
            jit = np.fromiter(
                (int.from_bytes(
                    hashlib.md5(str(e).encode()).digest()[8:16], "little")
                 % 3_600_000_000 for e in eid),
                np.int64, len(eid),
            )
            arrival = ts + jit.astype("timedelta64[us]")
            order = np.lexsort((eid, arrival))
            ts_o = ts[order]
            run = np.maximum.accumulate(ts_o)
            late = np.zeros(len(ts_o), bool)
            if len(ts_o) > 1:
                late[1:] = (run[:-1] - wm) > ts_o[1:]
            win = pd.Series(ts_o).dt.floor(f"{window_minutes}min") \
                .dt.strftime("%Y-%m-%d %H:%M")
            agg = pd.DataFrame({"w": win, "late": late}) \
                .groupby("w")["late"].agg(["size", "sum"])
            out_u.extend([int(uid)] * len(agg))
            out_w.extend(agg.index)
            out_on.extend((agg["size"] - agg["sum"]).astype(np.int64))
            out_late.extend(agg["sum"].astype(np.int64))
        return pa.table({
            "user_id": pa.array(out_u, pa.int64()),
            "window_start": pa.array(out_w, pa.string()),
            "n_on_time": pa.array(out_on, pa.int64()),
            "n_late": pa.array(out_late, pa.int64()),
        })

    return (ds.map_batches(tag, batch_format="pandas")
              .groupby("_ub").map_groups(per_bucket, batch_format="pandas"))


# ---------------------------------------------------------------------------
# as-of join (operator Ray Data lacks natively)
# ---------------------------------------------------------------------------

def asof_prior_event(sf_dir: str, left_type: str = "purchase",
                     right_type: str = "view"):
    """For each ``left_type`` event, the most recent strictly-earlier
    ``right_type`` event of the same user (inner as-of join).

    Partitioning assumption: one user's events fit one group (true for
    per-user activity streams; salt by time-range for pathological users).
    Implemented as groupby(user) + per-group sorted merge — the classic
    as-of decomposition when the engine has no native interval join.
    """
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    filt = ds.filter(expr=f"event_type in ['{left_type}', '{right_type}']")

    def per_user(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values("ts", kind="stable")
        lefts, priors, gaps = [], [], []
        last_right_id, last_right_ts = None, None
        for eid, ts, et in zip(g["event_id"], g["ts"], g["event_type"]):
            if et == right_type:
                last_right_id, last_right_ts = eid, ts
            elif last_right_id is not None:
                lefts.append(int(eid))
                priors.append(int(last_right_id))
                gaps.append(int((ts - last_right_ts).value // 1000))  # us
        return pa.table({
            "event_id": pa.array(lefts, pa.int64()),
            "prior_id": pa.array(priors, pa.int64()),
            "gap_us": pa.array(gaps, pa.int64()),
        })

    return filt.groupby("user_id").map_groups(per_user, batch_format="pandas")


# ---------------------------------------------------------------------------
# per-group top-k (windowed ranking without a global sort)
# ---------------------------------------------------------------------------

def topk_orders_per_customer(sf_dir: str, k: int = 3):
    """Top-k orders per customer by (totalprice desc, orderkey asc)."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def per_cust(g: pd.DataFrame) -> pa.Table:
        g = g.assign(totalprice_c=_cents(g["o_totalprice"].to_numpy()))
        top = g.sort_values(["totalprice_c", "o_orderkey"],
                            ascending=[False, True]).head(k)
        return pa.table({
            "o_custkey": pa.array(top["o_custkey"].to_numpy(), pa.int64()),
            "o_orderkey": pa.array(top["o_orderkey"].to_numpy(), pa.int64()),
            "totalprice_c": pa.array(top["totalprice_c"].to_numpy(), pa.int64()),
            "rnk": pa.array(np.arange(1, len(top) + 1), pa.int64()),
        })

    return ds.groupby("o_custkey").map_groups(per_cust, batch_format="pandas")
