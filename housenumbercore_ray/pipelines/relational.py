"""Generic relational operators over the driver's TPC-H-ish tables —
demonstrates the engine's aggregate / join / sort / top-k / window coverage
(the Ray analogs of the reference's SQL-side shapes: A1-A6 aggregates,
J9/J10 joins, §2.6 sorts).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum


def pricing_summary(sf_dir: str) -> rd.Dataset:
    """TPC-H Q1 shape: filtered scan → groupby two keys → five aggregates.
    Pre-aggregation is handled by Ray's partial+final aggregate path."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                 "l_discount", "l_shipdate"],
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["l_shipdate"] < pd.Timestamp("1998-09-01")]
        return pd.DataFrame({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "qty": b["l_quantity"],
            "price": b["l_extendedprice"],
            "disc_price": b["l_extendedprice"] * (1 - b["l_discount"]),
        })

    def round2(b: pd.DataFrame) -> pd.DataFrame:
        # float sums are rounded identically in the SQL oracle: summation
        # order differs between engines only in the last ~ulp
        for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
            b[c] = b[c].round(2)
        return b

    return (
        ds.map_batches(prep, batch_format="pandas")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("price", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Count(alias_name="count_order"),
        )
        .map_batches(round2, batch_format="pandas")
    )


def top_customers(sf_dir: str, k: int = 10) -> rd.Dataset:
    """Join (orders ⋈ customer, broadcast small side) → groupby → top-k.
    The customer table is the broadcast side (dimension-table pattern);
    deterministic order by (revenue desc, custkey)."""
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]).to_pandas()
    cust_ref = ray.put(cust)

    class JoinName:
        def __init__(self):
            self.cust = ray.get(cust_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            return b.merge(self.cust, left_on="o_custkey", right_on="c_custkey", how="inner")

    agg = (
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
        .map_batches(JoinName, batch_format="pandas", concurrency=(1, 4), num_cpus=1)
        .groupby("c_custkey")
        .aggregate(Sum("o_totalprice", alias_name="revenue"), Count(alias_name="n_orders"))
    )

    def attach_rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["revenue", "c_custkey"], ascending=[False, True], kind="mergesort").head(k)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        df["revenue"] = df["revenue"].round(2)
        return df[["rank", "c_custkey", "revenue", "n_orders"]]

    # top-k: Ray sort+limit then a single-block rank attach (result is tiny)
    return (
        agg.sort(["revenue", "c_custkey"], descending=[True, False])
        .limit(k)
        .repartition(1)
        .map_batches(attach_rank, batch_format="pandas", batch_size=k)
    )


def events_monthly(sf_dir: str) -> rd.Dataset:
    """Event-stream monthly rollup: groupby (event_type, month)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": b["event_type"],
            "month": b["ts"].dt.strftime("%Y-%m"),
            "value": b["value"],
        })

    def round2(b: pd.DataFrame) -> pd.DataFrame:
        b["sum_value"] = b["sum_value"].round(2)
        return b

    return (
        ds.map_batches(prep, batch_format="pandas")
        .groupby(["event_type", "month"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
        .map_batches(round2, batch_format="pandas")
    )


def events_hopping_window(sf_dir: str, size_days: int = 14,
                          hop_days: int = 7) -> rd.Dataset:
    """HOPPING (sliding, overlap = size − hop) window aggregate over the
    event stream — the windowed-aggregate family member between tumbling
    (``events_monthly``) and per-row rolling (``events_rolling_7d``): each
    event lands in size/hop = 2 epoch-aligned windows, counted and summed
    per (window_start, event_type).

    Scale shape: a per-batch FLAT-MAP expansion (×2 rows — vectorized
    arithmetic on the epoch-day array, no Python per row) feeding per-batch
    partial combine, then ONE bounded groupby on (window_start, event_type)
    — shuffle volume is O(windows × types × batches), never O(events)."""
    assert size_days == 2 * hop_days, "expansion below assumes size = 2·hop"
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def expand_partial(b: pd.DataFrame) -> pd.DataFrame:
        days = (b["ts"].to_numpy("datetime64[D]")
                .astype("int64"))
        w0 = (days // hop_days) * hop_days
        g = pd.DataFrame({
            "window_start": np.concatenate([w0, w0 - hop_days]),
            "event_type": np.tile(b["event_type"].to_numpy(object), 2),
            "value": np.tile(b["value"].to_numpy(np.float64), 2),
        })
        return (g.groupby(["window_start", "event_type"], as_index=False)
                .agg(n_events=("value", "size"), sum_value=("value", "sum")))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "window_start": pd.to_datetime(
                np.asarray([g["window_start"].iloc[0]]),
                unit="D").astype("datetime64[us]"),
            "event_type": [g["event_type"].iloc[0]],
            "n_events": pd.Series([g["n_events"].sum()], dtype=np.int64),
            "sum_value": [round(float(g["sum_value"].sum()), 2)],
        })

    return (ds.map_batches(expand_partial, batch_format="pandas")
            .groupby(["window_start", "event_type"])
            .map_groups(final, batch_format="pandas"))


def events_window_users(sf_dir: str, size_days: int = 14,
                        hop_days: int = 7) -> rd.Dataset:
    """DISTINCT-CARDINALITY over hopping windows (the stream-analytics
    "weekly active users" shape): distinct user_ids per overlapping
    epoch-aligned window — an aggregate that, unlike a sum, does NOT
    commute with naive partials, so the pipeline dedups BEFORE counting:

      1. vectorized ×(size/hop) window expansion per batch;
      2. per-batch ``drop_duplicates`` on (window, user) — shrinks shuffle
         rows to distinct pairs per batch;
      3. ONE groupby on window_start; each group holds every (window,
         user) pair of its window, so the distinct count is a vectorized
         in-group ``nunique``.
    Shuffle volume is O(distinct (window, user) pairs × batches) — the
    exact-distinct analog of the HLL sketch op (``web_distinct_urls_hll``
    is the approximate scale path when per-window user sets explode)."""
    assert size_days == 2 * hop_days, "expansion below assumes size = 2·hop"
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])

    def expand_dedup(b: pd.DataFrame) -> pd.DataFrame:
        days = b["ts"].to_numpy("datetime64[D]").astype("int64")
        w0 = (days // hop_days) * hop_days
        g = pd.DataFrame({
            "window_start": np.concatenate([w0, w0 - hop_days]),
            "user_id": np.tile(b["user_id"].to_numpy(np.int64), 2),
        })
        return g.drop_duplicates()

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "window_start": pd.to_datetime(
                np.asarray([g["window_start"].iloc[0]]),
                unit="D").astype("datetime64[us]"),
            "n_users": pd.Series([g["user_id"].nunique()], dtype=np.int64),
        })

    return (ds.map_batches(expand_dedup, batch_format="pandas")
            .groupby("window_start")
            .map_groups(final, batch_format="pandas"))


def events_month_over_month(sf_dir: str) -> rd.Dataset:
    """J10 analog (month-over-month diff views,
    dbstructure_theoeval.sql:1019-1037): monthly rollup self-joined with the
    previous month — implemented as a per-key ordered window (map_groups),
    the Ray shape for consecutive-snapshot diffs."""
    monthly = events_monthly(sf_dir)

    def diff(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("month", kind="mergesort").reset_index(drop=True)
        g["prev_n_events"] = g["n_events"].shift(1).fillna(0).astype(np.int64)
        g["delta_n_events"] = g["n_events"] - g["prev_n_events"]
        return g[["event_type", "month", "n_events", "prev_n_events", "delta_n_events"]]

    return monthly.groupby("event_type").map_groups(diff, batch_format="pandas")


def user_sessions(sf_dir: str, gap_minutes: int = 30) -> rd.Dataset:
    """Streaming-shaped sessionization: per-user ts-ordered gap windows
    (ray_guide 'ordered, partitioned log' pattern). Returns per-user session
    count and event count."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    gap = pd.Timedelta(minutes=gap_minutes)

    def sess(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="mergesort")
        d = g["ts"].diff()
        new_sess = d.isna() | (d > gap)
        return pd.DataFrame({
            "user_id": [np.int64(g["user_id"].iloc[0])],
            "n_sessions": [np.int64(new_sess.sum())],
            "n_events": [np.int64(len(g))],
        })

    return ds.groupby("user_id").map_groups(sess, batch_format="pandas")


def segment_revenue_bucketed(sf_dir: str) -> rd.Dataset:
    """Both-sides-large join demo: orders ⋈ customer via the explicit
    bucketed hash join (no broadcast), then groupby mktsegment."""
    from ..stages.join import bucketed_hash_join

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    joined = bucketed_hash_join(orders, cust, "o_custkey", "c_custkey", num_buckets=32)

    def round2(b: pd.DataFrame) -> pd.DataFrame:
        b["revenue"] = b["revenue"].round(2)
        return b

    return (
        joined.groupby("c_mktsegment")
        .aggregate(Sum("o_totalprice", alias_name="revenue"), Count(alias_name="n_orders"))
        .map_batches(round2, batch_format="pandas")
    )


def distinct_mktsegments(sf_dir: str) -> rd.Dataset:
    """A6 analog (SELECT DISTINCT): distinct values via groupby-first."""
    return (
        rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_mktsegment"])
        .groupby("c_mktsegment")
        .map_groups(lambda g: g.head(1), batch_format="pandas")
    )


def events_last_order_asof(sf_dir: str) -> rd.Dataset:
    """AS-OF JOIN (an operator Ray Data lacks, composed per the custom-op
    rule): for each event, the most recent order date of the same customer
    at or before the event timestamp (NULL when none).

    Shape: both sides co-partitioned by user via ONE bucketed shuffle, then
    a vectorized ``pd.merge_asof`` per bucket — sorted-merge within the
    partition, never a cross product. Partitioning assumption: the as-of
    key (user) is the shuffle key; time ordering is established per bucket.
    Oracle: DuckDB's native ASOF LEFT JOIN."""

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])
    od = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"])
    NB = 32

    def tag_ev(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": b["user_id"].astype(np.int64), "t": b["ts"],
            "event_id": b["event_id"].astype(np.int64), "side": "e",
            "_bucket": (pd.util.hash_array(b["user_id"].to_numpy(np.int64)) % NB).astype(np.int64),
        })

    def tag_od(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": b["o_custkey"].astype(np.int64), "t": b["o_orderdate"],
            "event_id": np.int64(-1), "side": "o",
            "_bucket": (pd.util.hash_array(b["o_custkey"].to_numpy(np.int64)) % NB).astype(np.int64),
        })

    both = ev.map_batches(tag_ev, batch_format="pandas").union(
        od.map_batches(tag_od, batch_format="pandas"))

    def asof_bucket(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["side"] == "e"][["key", "t", "event_id"]].sort_values("t", kind="mergesort")
        o = g[g["side"] == "o"][["key", "t"]].sort_values("t", kind="mergesort")
        o = o.rename(columns={"t": "last_order_date"})
        if len(e) == 0:
            return pd.DataFrame({"event_id": pd.Series([], dtype=np.int64),
                                 "user_id": pd.Series([], dtype=np.int64),
                                 "ts": pd.Series([], dtype="datetime64[us]"),
                                 "last_order_date": pd.Series([], dtype="datetime64[us]")})
        m = pd.merge_asof(e, o, left_on="t", right_on="last_order_date",
                          by="key", direction="backward")
        return pd.DataFrame({"event_id": m["event_id"].astype(np.int64),
                             "user_id": m["key"].astype(np.int64),
                             "ts": m["t"], "last_order_date": m["last_order_date"]})

    return both.groupby("_bucket").map_groups(asof_bucket, batch_format="pandas")


def events_rolling_7d(sf_dir: str) -> rd.Dataset:
    """Range-windowed aggregate (streaming-window shape): per event, the
    count and value sum of same-type events in [ts − 7 days, ts] INCLUSIVE
    of boundary and peers — exactly SQL's RANGE BETWEEN INTERVAL 7 DAY
    PRECEDING AND CURRENT ROW. One shuffle on event_type; inside each group
    a sorted searchsorted + cumsum computes every window in O(n log n)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "ts", "value"])

    def win(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort").reset_index(drop=True)
        ts = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        val = g["value"].to_numpy(np.float64)
        lo = np.searchsorted(ts, ts - 7 * 24 * 3600 * 1_000_000, side="left")
        hi = np.searchsorted(ts, ts, side="right")   # include same-ts peers
        csum = np.concatenate([[0.0], np.cumsum(val)])
        return pd.DataFrame({
            "event_id": g["event_id"].astype(np.int64),
            "event_type": g["event_type"],
            "ts": g["ts"],
            "n_7d": (hi - lo).astype(np.int64),
            "sum_value_7d": np.round(csum[hi] - csum[lo], 2),
        })

    return ds.groupby("event_type").map_groups(win, batch_format="pandas")


def orders_event_window(sf_dir: str) -> rd.Dataset:
    """RANGE JOIN (interval join — another operator Ray Data lacks): per
    order, the number of same-customer events inside
    [o_orderdate, o_orderdate + 3 days] (both bounds inclusive).

    Shape: ONE bucketed co-shuffle on the customer key; within each bucket
    events are sorted per user once and every order's window resolves with
    two binary searches — no cross product, O((n+m) log n) per bucket.
    Partitioning assumption: the equality key (customer) is the shuffle key;
    the range predicate is resolved inside the partition."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    od = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_custkey", "o_orderdate"])
    NB = 32
    WIN_US = 3 * 24 * 3600 * 1_000_000

    def tag_ev(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": b["user_id"].astype(np.int64), "t": b["ts"],
            "o_orderkey": np.int64(-1), "side": "e",
            "_bucket": (pd.util.hash_array(b["user_id"].to_numpy(np.int64)) % NB).astype(np.int64),
        })

    def tag_od(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": b["o_custkey"].astype(np.int64), "t": b["o_orderdate"],
            "o_orderkey": b["o_orderkey"].astype(np.int64), "side": "o",
            "_bucket": (pd.util.hash_array(b["o_custkey"].to_numpy(np.int64)) % NB).astype(np.int64),
        })

    both = ev.map_batches(tag_ev, batch_format="pandas").union(
        od.map_batches(tag_od, batch_format="pandas"))

    def window_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == "o"]
        if len(o) == 0:
            return pd.DataFrame({"o_orderkey": pd.Series([], dtype=np.int64),
                                 "o_custkey": pd.Series([], dtype=np.int64),
                                 "o_orderdate": pd.Series([], dtype="datetime64[us]"),
                                 "n_events_3d": pd.Series([], dtype=np.int64)})
        e = g[g["side"] == "e"].sort_values(["key", "t"], kind="mergesort")
        ek = e["key"].to_numpy(np.int64)
        et = e["t"].to_numpy("datetime64[us]").astype(np.int64)
        okeys = o["o_orderkey"].to_numpy(np.int64)
        ocust = o["key"].to_numpy(np.int64)
        odate = o["t"].to_numpy("datetime64[us]")
        ot = odate.astype(np.int64)

        def count_per_user(target: np.ndarray, inclusive: bool) -> np.ndarray:
            # events with key == ocust_i and et < target_i (or <= when
            # inclusive) — ONE lexsort over events+probes, no per-order
            # Python loop (VERDICT r2 finding #4). Events are (key, t)-
            # sorted, so events of EARLIER users are the plain key rank.
            nb = len(target)
            keys = np.concatenate([ek, ocust])
            times = np.concatenate([et, target])
            isev = np.concatenate([np.ones(len(ek), np.int8), np.zeros(nb, np.int8)])
            # equal-time tie-break: probe BEFORE events for strict <,
            # AFTER them for <=
            tie = isev if not inclusive else (1 - isev)
            order = np.lexsort((tie, times, keys))
            cum = np.cumsum(isev[order], dtype=np.int64)
            pos = np.empty(len(order), dtype=np.int64)
            pos[order] = np.arange(len(order), dtype=np.int64)
            cnt_global = cum[pos[len(ek):]]  # isev==0 at probe rows
            before_user = np.searchsorted(ek, ocust, side="left")
            return cnt_global - before_user

        if len(ek) == 0:
            n = np.zeros(len(o), dtype=np.int64)
        else:
            n = count_per_user(ot + WIN_US, inclusive=True) - count_per_user(ot, inclusive=False)
        return pd.DataFrame({"o_orderkey": okeys, "o_custkey": ocust,
                             "o_orderdate": odate, "n_events_3d": n})

    return both.groupby("_bucket").map_groups(window_bucket, batch_format="pandas")


def top_suppliers_per_nation(sf_dir: str, k: int = 5) -> rd.Dataset:
    """Group-wise top-k (window-rank shape): top ``k`` suppliers by lineitem
    revenue within each nation. Scale shape: the 100-TB fact table is
    pre-aggregated by supplier key FIRST (Ray partial+final aggregate, one
    shuffle of O(suppliers) rows); the supplier→nation dimension is
    broadcast (``ray.put`` once, read per actor); the per-nation rank runs
    in ``map_groups`` over ~25 nation groups of bounded size. The big side
    never joins row-level."""
    import pyarrow.parquet as pq

    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name", "s_nationkey"]
    ).to_pandas()
    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    dim_ref = ray.put(sup.merge(nat, left_on="s_nationkey", right_on="n_nationkey"))

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_suppkey": b["l_suppkey"],
            "rev": b["l_extendedprice"] * (1 - b["l_discount"]),
        })

    class AttachNation:
        def __init__(self):
            self.dim = ray.get(dim_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            return b.merge(self.dim, left_on="l_suppkey", right_on="s_suppkey",
                           how="inner")[["n_name", "s_suppkey", "s_name", "revenue"]]

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        # round BEFORE ranking so near-ties order identically to the oracle
        # (which ranks on the rounded sum)
        g = g.assign(revenue=g["revenue"].round(2))
        g = g.sort_values(["revenue", "s_suppkey"], ascending=[False, True],
                          kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["n_name", "rank", "s_suppkey", "s_name", "revenue"]]

    return (
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_suppkey", "l_extendedprice", "l_discount"])
        .map_batches(prep, batch_format="pandas")
        .groupby("l_suppkey")
        .aggregate(Sum("rev", alias_name="revenue"))
        .map_batches(AttachNation, batch_format="pandas", concurrency=(1, 4), num_cpus=1)
        .groupby("n_name")
        .map_groups(rank_group, batch_format="pandas")
    )


def price_quantiles(sf_dir: str, qs: tuple[float, ...] = (0.5, 0.9, 0.99)) -> pd.DataFrame:
    """EXACT distributed quantiles of l_extendedprice without a global sort:
    per-batch value-count partials over integer cents (bounded domain), one
    O(distinct values) shuffle to combine, then the selection rule — the
    smallest value whose cumulative count reaches ceil(q*N) — applied to the
    combined histogram. The histogram is O(distinct cents), independent of
    row count, so the driver-side finish is bounded at any input scale (the
    same reason Spark/BigQuery do histogram/sketch quantiles; here the
    bounded integer domain keeps it exact instead of approximate). Oracle
    states the identical rule in SQL window form."""

    def counts(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(b["l_extendedprice"].to_numpy(np.float64) * 100).astype(np.int64)
        v, c = np.unique(cents, return_counts=True)
        return pd.DataFrame({"cents": v, "k": c.astype(np.int64)})

    hist = (
        rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"])
        .map_batches(counts, batch_format="pandas")
        .groupby("cents")
        .aggregate(Sum("k", alias_name="k"))
        .to_pandas()  # O(distinct cents) — bounded-domain histogram, not row data
        .sort_values("cents")
    )
    total = int(hist["k"].sum())
    cum = hist["k"].cumsum().to_numpy(np.int64)
    vals = hist["cents"].to_numpy(np.int64)
    rows = []
    for q in qs:
        need = int(np.ceil(q * total))
        idx = int(np.searchsorted(cum, need, side="left"))
        rows.append({"quantile": float(q), "value": round(vals[idx] / 100.0, 2)})
    return pd.DataFrame(rows)


def regional_revenue(sf_dir: str, region: str = "EUROPE",
                     year: int = 1996) -> rd.Dataset:
    """TPC-H Q5-style multi-way join: lineitem ⋈ orders ⋈ customer ⋈
    nation ⋈ region → revenue per nation for one region and order year.

    Join plan (the 100-TB shape): region/nation are DIMENSION tables —
    broadcast once as a nationkey→name dict; orders is FILTERED at the
    read (year predicate) before any shuffle; the two fact joins
    (orders⋈customer, lineitem⋈orders) run as bucketed hash joins;
    revenue pre-aggregates per batch (nationkey partials) so the final
    groupby moves O(nations × batches) rows."""
    import pyarrow as pa

    from ..stages.join import bucketed_hash_join

    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    reg = pd.read_parquet(f"{sf_dir}/region.parquet")
    rkey = reg.loc[reg["r_name"] == region, "r_regionkey"].iloc[0]
    dim = nation[nation["n_regionkey"] == rkey]
    nat_names = dict(zip(dim["n_nationkey"].astype(int), dim["n_name"]))
    dim_ref = ray.put(nat_names)

    lo, hi = pd.Timestamp(f"{year}-01-01"), pd.Timestamp(f"{year + 1}-01-01")

    def year_mask(b: pa.Table) -> pa.Table:
        # vectorized Arrow predicate (r2 finding #3: was a per-row lambda)
        col = b["o_orderdate"]
        import pyarrow.compute as pc

        m = pc.and_(pc.greater_equal(col, lo.to_datetime64()),
                    pc.less(col, hi.to_datetime64()))
        return b.filter(m)

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(year_mask, batch_format="pyarrow")
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    oc = bucketed_hash_join(
        orders, cust, "o_custkey", "c_custkey",
        left_schema={"o_orderkey": pa.int64(), "o_custkey": pa.int64(),
                     "o_orderdate": pa.timestamp("us")},
        right_schema={"c_custkey": pa.int64(), "c_nationkey": pa.int64()},
    )

    def keep_region(b: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(dim_ref)
        m = b["c_nationkey"].isin(keys)
        return b.loc[m, ["o_orderkey", "c_nationkey"]]

    oc = oc.map_batches(keep_region, batch_format="pandas")
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice", "l_discount"])
    j = bucketed_hash_join(
        li, oc, "l_orderkey", "o_orderkey",
        left_schema={"l_orderkey": pa.int64(), "l_extendedprice": pa.float64(),
                     "l_discount": pa.float64()},
        right_schema={"o_orderkey": pa.int64(), "c_nationkey": pa.int64()},
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rev = b["l_extendedprice"].to_numpy() * (1.0 - b["l_discount"].to_numpy())
        g = pd.DataFrame({"c_nationkey": b["c_nationkey"].to_numpy(np.int64),
                          "rev": rev})
        out = g.groupby("c_nationkey", as_index=False).agg(
            rev=("rev", "sum"), n_items=("rev", "size"))
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        names = ray.get(dim_ref)
        key = int(g["c_nationkey"].iloc[0])
        return pd.DataFrame({
            "nation": [names[key]],
            "revenue": [round(float(g["rev"].sum()), 2)],
            "n_items": pd.Series([g["n_items"].sum()], dtype=np.int64),
        })

    return (
        j.map_batches(partial, batch_format="pandas")
        .groupby("c_nationkey")
        .map_groups(final, batch_format="pandas")
    )


def revenue_rollup(sf_dir: str) -> rd.Dataset:
    """GROUPING SETS / ROLLUP — multi-level OLAP aggregate (grand total,
    per-region, per-(region, nation)) in ONE pass over the fact table.

    Scale shape: the facts are aggregated exactly once, at the FINEST
    grouping level (nationkey) — per-batch partial sums bound the shuffle
    at O(nations × batches); the coarser rollup levels are then derived by
    re-aggregating the ≤|nations| finest rows (hierarchical reaggregation:
    region ⊇ nation, so coarse sums are exact sums of fine RAW sums — no
    second pass over orders, and rounding happens only after every level
    is summed). The custkey→nationkey resolution is a hash-partitioned
    ``bucketed_hash_join`` (no broadcast assumption on customer); the
    nation/region NAME maps are the tiny broadcast dims."""
    import pyarrow as pa

    from ..stages.join import bucketed_hash_join

    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    region = pd.read_parquet(f"{sf_dir}/region.parquet")
    rn = dict(zip(region["r_regionkey"].astype(int), region["r_name"]))
    dim = {int(k): (str(n), rn[int(g)])
           for k, n, g in zip(nation["n_nationkey"], nation["n_name"],
                              nation["n_regionkey"])}
    dim_ref = ray.put(dim)

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    oc = bucketed_hash_join(
        orders, cust, "o_custkey", "c_custkey",
        left_schema={"o_custkey": pa.int64(), "o_totalprice": pa.float64()},
        right_schema={"c_custkey": pa.int64(), "c_nationkey": pa.int64()},
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (b.groupby("c_nationkey", as_index=False)
                .agg(rev=("o_totalprice", "sum"), n=("o_totalprice", "size")))

    def per_nation(g: pd.DataFrame) -> pd.DataFrame:
        # RAW sum — rounding is deferred until after the rollup levels
        return pd.DataFrame({
            "c_nationkey": pd.Series([int(g["c_nationkey"].iloc[0])], dtype=np.int64),
            "rev": [float(g["rev"].sum())],
            "n": pd.Series([g["n"].sum()], dtype=np.int64),
        })

    def rollup_levels(b: pd.DataFrame) -> pd.DataFrame:
        names = ray.get(dim_ref)
        b = b.copy()
        b["nation_name"] = b["c_nationkey"].map(lambda k: names[int(k)][0])
        b["region_name"] = b["c_nationkey"].map(lambda k: names[int(k)][1])
        fine = pd.DataFrame({
            "level": "nation", "region_name": b["region_name"],
            "nation_name": b["nation_name"], "revenue": b["rev"], "n_orders": b["n"],
        })
        reg = (b.groupby("region_name", as_index=False)
               .agg(revenue=("rev", "sum"), n_orders=("n", "sum")))
        reg.insert(0, "level", "region")
        reg["nation_name"] = ""
        total = pd.DataFrame({
            "level": ["all"], "region_name": [""], "nation_name": [""],
            "revenue": [float(b["rev"].sum())],
            "n_orders": [int(b["n"].sum())],
        })
        out = pd.concat([fine, reg[fine.columns], total], ignore_index=True)
        out["revenue"] = out["revenue"].round(2)
        return out.astype({"n_orders": np.int64})

    return (
        oc.map_batches(partial, batch_format="pandas")
        .groupby("c_nationkey")
        .map_groups(per_nation, batch_format="pandas")
        .repartition(1)
        .map_batches(rollup_levels, batch_format="pandas")
    )


def brand_revenue(sf_dir: str) -> rd.Dataset:
    """Revenue per part brand — the LARGE×LARGE join shape done the
    scalable way: lineitem is PARTIALLY AGGREGATED to (partkey, revenue,
    n_items) inside map_batches BEFORE the join (aggregate-before-join:
    the join input shrinks from one row per lineitem to one row per
    distinct partkey per batch), then a hash-partitioned
    ``bucketed_hash_join`` against part (both sides shuffle by partkey —
    no broadcast assumption on either side), then a tiny brand rollup.

    Output: (p_brand, revenue round-2, n_items)."""
    import pyarrow as pa

    from ..stages.join import bucketed_hash_join

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )

    def li_partial(b: pd.DataFrame) -> pd.DataFrame:
        rev = b["l_extendedprice"] * (1 - b["l_discount"])
        g = (pd.DataFrame({"l_partkey": b["l_partkey"].to_numpy(np.int64),
                           "rev": rev, "n": np.ones(len(b), dtype=np.int64)})
             .groupby("l_partkey", as_index=False).sum())
        return g.astype({"l_partkey": np.int64, "n": np.int64})

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand"])
    joined = bucketed_hash_join(
        li.map_batches(li_partial, batch_format="pandas"), part,
        "l_partkey", "p_partkey",
        left_schema={"l_partkey": pa.int64(), "rev": pa.float64(),
                     "n": pa.int64()},
        right_schema={"p_partkey": pa.int64(), "p_brand": pa.string()},
    )

    def brand_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = (b.groupby("p_brand", as_index=False)
             .agg(revenue=("rev", "sum"), n_items=("n", "sum")))
        g["n_items"] = g["n_items"].astype(np.int64)
        return g

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("p_brand", as_index=False)
               .agg(revenue=("revenue", "sum"), n_items=("n_items", "sum")))
        out["revenue"] = out["revenue"].round(2)
        out["n_items"] = out["n_items"].astype(np.int64)
        return out

    return (joined.map_batches(brand_partial, batch_format="pandas")
            .groupby("p_brand").map_groups(finish, batch_format="pandas"))


def order_gaps(sf_dir: str) -> rd.Dataset:
    """LAG window (per-key previous-row lookup — SQL's ``lag() OVER
    (PARTITION BY customer ORDER BY date, key)``): for each order, the
    number of whole days since the same customer's previous order
    (−1 when it is the customer's first).

    Scale shape: ONE shuffle on the partition key (customer); inside each
    group a mergesort + vectorized diff — no window state crosses the
    partition boundary, so the operator distributes exactly like the
    sessionization kernel. Ref analog: per-muni previous-evaluation lookup
    (reference Evaluation.java keeps per-job last-run rows the same way)."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_orderdate", "o_orderkey"], kind="mergesort")
        prev = g["o_orderdate"].shift(1)
        gap = ((g["o_orderdate"] - prev).dt.days).fillna(-1).astype(np.int64)
        return pd.DataFrame({
            "o_orderkey": g["o_orderkey"].astype(np.int64),
            "o_custkey": g["o_custkey"].astype(np.int64),
            "o_orderdate": g["o_orderdate"],
            "prev_orderdate": prev,
            "gap_days": gap,
        })

    return ds.groupby("o_custkey").map_groups(gaps, batch_format="pandas")


def events_funnel(sf_dir: str) -> rd.Dataset:
    """Ordered funnel (view → click → purchase): per user, the earliest
    view, the earliest click AT OR AFTER that view, and the earliest
    purchase at or after that click; ``stage`` = how deep the user got
    (0 = no view … 3 = purchased). The classic order-sensitive conversion
    query that plain joins cannot express.

    Scale shape: ONE shuffle on user_id; per group three sorted
    ``searchsorted`` probes over the type-partitioned timestamp arrays —
    no cross product, O(n log n) per user. Timestamps within a user are
    few; skew is bounded by per-user event counts (cap/salt if a 100-TB
    deployment has mega-users)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "ts"])
    STAGES = ("view", "click", "purchase")

    def funnel(g: pd.DataFrame) -> pd.DataFrame:
        uid = np.int64(g["user_id"].iloc[0])
        by_type = {
            s: np.sort(g.loc[g["event_type"] == s, "ts"]
                       .to_numpy("datetime64[us]").astype(np.int64))
            for s in STAGES
        }
        hit: list = []
        t_min = np.iinfo(np.int64).min
        cur = t_min
        for s in STAGES:
            arr = by_type[s]
            i = np.searchsorted(arr, cur, side="left")
            if i < len(arr):
                cur = int(arr[i])
                hit.append(cur)
            else:
                break
        stage = len(hit)
        ts_cols = [np.datetime64(hit[i], "us") if i < stage else np.datetime64("NaT")
                   for i in range(3)]
        return pd.DataFrame({
            "user_id": [uid],
            "ts_view": pd.Series([ts_cols[0]], dtype="datetime64[us]"),
            "ts_click": pd.Series([ts_cols[1]], dtype="datetime64[us]"),
            "ts_purchase": pd.Series([ts_cols[2]], dtype="datetime64[us]"),
            "stage": [np.int64(stage)],
        })

    return ds.groupby("user_id").map_groups(funnel, batch_format="pandas")


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot(sf_dir: str) -> rd.Dataset:
    """OLAP PIVOT / crosstab: day × event_type value matrix — one row per
    day, one (n_<type>, value_<type>) column pair per DECLARED event type.
    A schema-stable pivot requires the column domain up front (the same
    constraint SQL PIVOT and pandas.pivot_table-with-fixed-columns have);
    EVENT_TYPES is that contract. Unseen (day, type) combos fill 0.

    Scale shape: per-batch (day, type) partials -> ONE bounded groupby
    (O(days × types × batches) rows), reshape per day-group — the wide
    row never exists before the final, already-aggregated stage."""

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = (pd.DataFrame({"day": b["ts"].dt.strftime("%Y-%m-%d"),
                           "event_type": b["event_type"],
                           "value": b["value"]})
             .groupby(["day", "event_type"], sort=False)
             .agg(n=("value", "size"), v=("value", "sum"))
             .reset_index())
        return g

    def widen(g: pd.DataFrame) -> pd.DataFrame:
        out = {"day": [g["day"].iloc[0]]}
        byt = g.set_index("event_type")
        for t in EVENT_TYPES:
            out[f"n_{t}"] = pd.Series(
                [int(byt["n"].get(t, 0))], dtype=np.int64)
            out[f"value_{t}"] = [round(float(byt["v"].get(t, 0.0)), 2)]
        return pd.DataFrame(out)

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["day", "event_type"])
        .aggregate(Sum("n", alias_name="n"), Sum("v", alias_name="v"))
        .groupby("day")
        .map_groups(widen, batch_format="pandas")
    )


def price_outliers(sf_dir: str, k: int = 2) -> rd.Dataset:
    """Robust per-segment outlier detection: an order is an outlier iff
    |price − segment median| > k·MAD (median absolute deviation) — the
    Hampel / robust-z-score filter, the standard quality gate where mean
    and stddev are themselves corrupted by the outliers being hunted.
    Default k=2: TPC-H totalprice is thin-tailed (k=3 flags nothing at
    any sf), so 2·MAD is the demonstrative cut; k is the caller's knob.

    Exactness without a sort: prices live on the integer-cents domain, so
    ONE per-(segment, cents) histogram shuffle (O(segments × distinct
    cents), independent of row count — the price_quantiles pattern) yields
    BOTH the median and the MAD analytically on the driver (the deviation
    histogram is a re-bucketing of the same counts); all comparisons stay
    in integer cents — no float-tie risk against the SQL oracle. The flag
    pass streams the fact join a second time (recompute over materialize:
    at fleet scale the joined fact table must not pin the object store).
    """
    import pyarrow as pa

    from ..stages.join import bucketed_hash_join

    def joined() -> rd.Dataset:
        orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                                 columns=["o_orderkey", "o_custkey", "o_totalprice"])
        cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_custkey", "c_mktsegment"])
        return bucketed_hash_join(
            orders, cust, "o_custkey", "c_custkey",
            left_schema={"o_orderkey": pa.int64(), "o_custkey": pa.int64(),
                         "o_totalprice": pa.float64()},
            right_schema={"c_custkey": pa.int64(), "c_mktsegment": pa.string()},
        )

    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(b["o_totalprice"].to_numpy(np.float64) * 100).astype(np.int64)
        g = (pd.DataFrame({"seg": b["c_mktsegment"], "cents": cents})
             .groupby(["seg", "cents"], sort=False).size()
             .rename("k").reset_index())
        return g

    hist = (
        joined().map_batches(hist_partial, batch_format="pandas")
        .groupby(["seg", "cents"])
        .aggregate(Sum("k", alias_name="k"))
        .to_pandas()  # O(segments × distinct cents) — bounded-domain state
    )

    def _median_from(counts: pd.DataFrame, vcol: str) -> int:
        h = counts.sort_values(vcol)
        cum = h["k"].cumsum().to_numpy(np.int64)
        need = int(np.ceil(0.5 * cum[-1]))
        return int(h[vcol].to_numpy(np.int64)[np.searchsorted(cum, need, side="left")])

    bounds: dict[str, tuple[int, int]] = {}
    for seg, g in hist.groupby("seg"):
        med = _median_from(g, "cents")
        dev = (g.assign(dev=(g["cents"] - med).abs())
               .groupby("dev", as_index=False)["k"].sum())
        mad = _median_from(dev, "dev")
        bounds[str(seg)] = (med, mad)
    bref = ray.put(bounds)

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        bd = ray.get(bref)
        cents = np.rint(b["o_totalprice"].to_numpy(np.float64) * 100).astype(np.int64)
        med = b["c_mktsegment"].map({s: m for s, (m, _) in bd.items()}).to_numpy(np.int64)
        mad = b["c_mktsegment"].map({s: d for s, (_, d) in bd.items()}).to_numpy(np.int64)
        m = np.abs(cents - med) > k * mad
        out = b.loc[m, ["o_orderkey", "c_mktsegment", "o_totalprice"]].copy()
        out["seg_median"] = (med[m] / 100.0).round(2)
        out["seg_mad"] = (mad[m] / 100.0).round(2)
        return out

    return joined().map_batches(flag, batch_format="pandas")


def retention_cohorts(sf_dir: str) -> rd.Dataset:
    """Cohort retention over the event log: a user's cohort is their first
    active epoch-day; for every (cohort_day, day_offset) pair, the number
    of cohort users active on cohort_day + offset — the standard retention
    triangle. Daily (not weekly/monthly) grain because the synthetic event
    log spans ~30 days; the grain is one constant.

    Scale shape: a per-batch DISTINCT (user, day) partial bounds the
    first shuffle to distinct pairs (≤ users × days, independent of the
    event count); the per-user reduce emits one row per active day
    (cohort = min day, offsets vectorized); the closing count groupby
    has at most days² / 2 keys — the driver never sees per-user data."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        d = b["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        return (pd.DataFrame({"user_id": b["user_id"].to_numpy(np.int64), "d": d})
                .drop_duplicates())

    def per_user_shard(g: pd.DataFrame) -> pd.DataFrame:
        # user-sharded (one Ray group per user is the fine-group
        # anti-pattern): global dedup + per-user cohort, all vectorized —
        # shards are user-complete so both are exact
        u = g.drop_duplicates(["user_id", "d"])
        cohort = (u.groupby("user_id", sort=False)["d"].transform("min")
                  .to_numpy(np.int64))
        return pd.DataFrame({
            "cohort_day": cohort,
            "day_offset": u["d"].to_numpy(np.int64) - cohort,
        })

    from ..pipelines.corpus import _shard_on, _shuffle_blocks

    return (
        ds.map_batches(pairs, batch_format="pandas")
        .map_batches(_shard_on(["user_id"]), batch_format="pandas")
        .repartition(_shuffle_blocks())
        .groupby("_shard")
        .map_groups(lambda g: per_user_shard(g.drop(columns=["_shard"])),
                    batch_format="pandas")
        .groupby(["cohort_day", "day_offset"])
        .aggregate(Count(alias_name="n_users"))
    )


def basket_pairs(sf_dir: str, min_support: int = 2,
                 max_basket: int | None = None) -> rd.Dataset:
    """Market-basket pair mining over lineitem (association rules): parts
    co-ordered in the same order, with support (co-order count),
    confidence P(b|a) and lift — the Apriori k=2 pass every recommender /
    co-occurrence analysis starts from.

    Scale shape: pair expansion runs inside orderkey-hash shards (orders
    are shard-exclusive, so per-shard pair counts are exact partials) via
    a vectorized self-merge per shard — never a global all-pairs; the
    (part_a, part_b) support groupby is the ONE unbounded shuffle and its
    volume is pre-shrunk by the per-shard partial count. Part marginals
    and the order total come from a second sharded pass whose output is
    bounded by the part dimension, broadcast via ray.put into the closing
    attach stage. Floats (conf, lift) round to 6 with the division shapes
    mirrored in the SQL oracle.

    ``max_basket`` (r5): pair expansion is quadratic in DISTINCT parts per
    order — one adversarial basket holding the whole catalog would emit
    |catalog|²/2 rows from a single shard. When set, orders with more than
    ``max_basket`` distinct parts are EXCLUDED from the analysis entirely
    (pairs, marginals and the order total — the semantics of filtering the
    degenerate baskets upstream), bounding per-shard expansion at
    max_basket²/2 rows per order. Default None keeps the oracled exact
    semantics; a 100-TB run should set it (boilerplate/catalog-page
    baskets are the rule, not the exception, in crawl-derived data)."""
    from ..pipelines.corpus import _shard_on, _shuffle_blocks

    cols = ["l_orderkey", "l_partkey"]

    def drop_big_baskets(u: pd.DataFrame) -> pd.DataFrame:
        # u is already distinct on (order, part); exact per-shard degree
        # filter (orders are shard-exclusive)
        if max_basket is None:
            return u
        deg = u.groupby("l_orderkey")["l_partkey"].transform("size")
        return u[deg <= max_basket]

    def pairs_shard(g: pd.DataFrame) -> pd.DataFrame:
        u = drop_big_baskets(g.drop_duplicates(cols))
        m = u.merge(u, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        out = (m.groupby(["l_partkey_x", "l_partkey_y"], sort=False)
               .size().rename("cnt").reset_index())
        return out.rename(columns={"l_partkey_x": "part_a",
                                   "l_partkey_y": "part_b"})

    pair_partials = (
        rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=cols)
        .map_batches(_shard_on(["l_orderkey"]), batch_format="pandas")
        .repartition(_shuffle_blocks())
        .groupby("_shard")
        .map_groups(lambda g: pairs_shard(g.drop(columns=["_shard"])),
                    batch_format="pandas")
    )

    # two-level reduce: a Ray group PER PAIR is pathological (~1.2M
    # one-row groups at sf0.1 took 200 s); shard on the pair key and sum
    # vectorized inside each shard, pushing the min_support cut into the
    # shard (pair-complete shards make both exact)
    def support_shard(g: pd.DataFrame) -> pd.DataFrame:
        s = (g.groupby(["part_a", "part_b"], sort=False, as_index=False)["cnt"]
             .sum().rename(columns={"cnt": "support"}))
        return s[s["support"] >= min_support]

    support = (
        pair_partials.map_batches(_shard_on(["part_a", "part_b"]),
                                  batch_format="pandas")
        .repartition(_shuffle_blocks())
        .groupby("_shard")
        .map_groups(lambda g: support_shard(g.drop(columns=["_shard"])),
                    batch_format="pandas")
    )

    def marg_shard(g: pd.DataFrame) -> pd.DataFrame:
        u = drop_big_baskets(g.drop_duplicates(cols))
        pc = u["l_partkey"].value_counts()
        # the distinct-order total rides in a 'kind'-tagged row (NOT a
        # magic part id like -1, which a real partkey could collide with)
        return pd.DataFrame({
            "kind": ["part"] * len(pc) + ["total"],
            "part": np.concatenate([pc.index.to_numpy(np.int64), [0]]),
            "n": np.concatenate([pc.to_numpy(np.int64),
                                 [u["l_orderkey"].nunique()]]),
        })

    marg = (
        rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=cols)
        .map_batches(_shard_on(["l_orderkey"]), batch_format="pandas")
        .repartition(_shuffle_blocks())
        .groupby("_shard")
        .map_groups(lambda g: marg_shard(g.drop(columns=["_shard"])),
                    batch_format="pandas")
        .map_batches(_shard_on(["kind", "part"]), batch_format="pandas")
        .repartition(_shuffle_blocks())
        .groupby("_shard")
        .map_groups(lambda g: g.drop(columns=["_shard"])
                    .groupby(["kind", "part"], sort=False, as_index=False)["n"].sum(),
                    batch_format="pandas")
        .to_pandas()          # bounded by the part dimension (+1 total row)
    )
    tot_mask = marg["kind"] == "total"
    total = int(marg.loc[tot_mask, "n"].sum())
    marg = marg[~tot_mask]
    counts = dict(zip(marg["part"].astype(np.int64), marg["n"].astype(np.int64)))
    cref = ray.put(counts)

    def attach(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        pc = ray.get(cref)
        na = b["part_a"].map(pc).to_numpy(np.float64)
        nb = b["part_b"].map(pc).to_numpy(np.float64)
        s = b["support"].to_numpy(np.float64)
        b["conf_a_b"] = np.round(s / na, 6)
        b["lift"] = np.round(s * float(total) / (na * nb), 6)
        b["support"] = b["support"].astype(np.int64)
        return b

    return support.map_batches(attach, batch_format="pandas")


def events_sessionize(sf_dir: str, gap_sec: int = 1800) -> rd.Dataset:
    """Sessionization of the event log (the per-user window op every
    clickstream / training-log pipeline needs): a user's events, ordered by
    (ts, event_id), split into sessions wherever the gap from the previous
    event exceeds ``gap_sec``; one output row per session with its 1-based
    per-user sequence number, start/end timestamps and event count.

    Scale shape: ONE shuffle on hash(user) shards (user-complete, so the
    per-shard kernel is exact); inside a shard everything is vectorized —
    a single mergesort, one diff, one cumsum for the session ids, one
    groupby for the rollup. No window state crosses a shard and the output
    is bounded by session count, never event count. Ref analog: the per-job
    chronological evaluation batches (Evaluation.java processes each
    municipality's rows in time order the same way)."""
    from ..pipelines.corpus import _shard_on, _shuffle_blocks

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id"])

    def sessions_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts = g["ts"].to_numpy()
        user = g["user_id"].to_numpy(np.int64)
        new_user = np.r_[True, user[1:] != user[:-1]]
        gap = np.r_[np.timedelta64(0, "s"),
                    ts[1:] - ts[:-1]] > np.timedelta64(gap_sec, "s")
        new_sess = new_user | gap
        sid = np.cumsum(new_sess)          # global session id within shard
        f = pd.DataFrame({"user_id": user, "sid": sid, "ts": ts})
        # per-user 1-based sequence: global sid minus the user's first sid
        first_sid = f.groupby("user_id", sort=False)["sid"].transform("min").to_numpy()
        f["session_seq"] = (sid - first_sid + 1).astype(np.int64)
        out = (f.groupby(["user_id", "session_seq"], sort=False)
               .agg(session_start=("ts", "min"), session_end=("ts", "max"),
                    n_events=("ts", "size"))
               .reset_index())
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    return (
        ds.map_batches(_shard_on(["user_id"]), batch_format="pandas")
        .repartition(_shuffle_blocks())
        .groupby("_shard")
        .map_groups(lambda g: sessions_shard(g.drop(columns=["_shard"])),
                    batch_format="pandas")
    )


def events_scd2(sf_dir: str, exclude_type: str | None = None) -> rd.Dataset:
    """Slowly-changing-dimension type-2 history build (r5) — the warehouse
    staple: collapse each user's event stream (ordered by ts, event_id)
    into runs of equal ``event_type``; one row per run with
    ``valid_from`` (run start), ``valid_to`` (next run's start, or the
    classic ``9999-12-31`` open-interval sentinel) and ``is_current``.

    Scale shape: same as :func:`events_sessionize` — ONE hash(user) shard
    shuffle, user-complete shards, fully vectorized run detection (one
    sort, one shift-compare, one cumsum, one groupby, one shift for
    valid_to). Output bounded by run count, never event count."""
    from ..pipelines.corpus import _shard_on, _shuffle_blocks

    SENTINEL = pd.Timestamp("9999-12-31")
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "event_type"])
    if exclude_type is not None:
        ds = ds.map_batches(lambda b: b[b["event_type"] != exclude_type],
                            batch_format="pandas")

    def scd2_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        user = g["user_id"].to_numpy(np.int64)
        typ = g["event_type"].to_numpy(object)
        ts = g["ts"].to_numpy()
        new_run = np.r_[True, (user[1:] != user[:-1]) | (typ[1:] != typ[:-1])]
        rid = np.cumsum(new_run)
        f = pd.DataFrame({"user_id": user, "event_type": typ, "ts": ts, "rid": rid})
        runs = (f.groupby("rid", sort=True)
                .agg(user_id=("user_id", "first"), event_type=("event_type", "first"),
                     valid_from=("ts", "min"))
                .reset_index(drop=True))
        nxt = runs["valid_from"].shift(-1)
        same_user = runs["user_id"].shift(-1) == runs["user_id"]
        runs["valid_to"] = nxt.where(same_user, pd.NaT)
        runs["is_current"] = runs["valid_to"].isna()
        runs["valid_to"] = runs["valid_to"].fillna(SENTINEL)
        runs["user_id"] = runs["user_id"].astype(np.int64)
        return runs[["user_id", "event_type", "valid_from", "valid_to", "is_current"]]

    return (
        ds.map_batches(_shard_on(["user_id"]), batch_format="pandas")
        .repartition(_shuffle_blocks())
        .groupby("_shard")
        .map_groups(lambda g: scd2_shard(g.drop(columns=["_shard"])),
                    batch_format="pandas")
    )


def events_pit_state(sf_dir: str, fact_type: str = "purchase") -> rd.Dataset:
    """POINT-IN-TIME temporal join (r5): each ``fact_type`` event (the
    facts — purchases) joined to the user's SCD2 BROWSING state — the
    interval history built over all OTHER event types
    (``events_scd2(exclude_type=fact_type)``) — valid AT fact time:
    ``valid_from <= ts < valid_to``. The "what did the dimension look like
    when the fact happened" join every warehouse needs and Ray Data lacks
    natively. Facts before the user's first state row (or users with no
    non-fact events) come out NULL (LEFT join semantics).

    Shape: the SCD2 intervals and the facts co-shuffle on ONE hash(user)
    bucket key; inside a bucket each user's contiguous intervals are a
    sorted ``valid_from`` array and every fact resolves with one
    ``searchsorted`` — no interval cross product, O((n+m) log n) per
    bucket. Oracle: DuckDB LEFT JOIN with the BETWEEN predicate."""
    from ..pipelines.corpus import _shard_on, _shuffle_blocks

    scd = events_scd2(sf_dir, exclude_type=fact_type)
    od = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type"]).map_batches(
        lambda b: b[b["event_type"] == fact_type][["event_id", "user_id", "ts"]],
        batch_format="pandas")

    def tag_scd(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": b["user_id"].astype(np.int64),
            "t": b["valid_from"], "t2": b["valid_to"],
            "etype": b["event_type"].astype(object),
            "o_orderkey": np.int64(-1), "side": "s",
        })

    def tag_od(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": b["user_id"].astype(np.int64),
            "t": b["ts"], "t2": pd.NaT,
            "etype": None,
            "o_orderkey": b["event_id"].astype(np.int64), "side": "o",
        })

    def pit_shard(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for key, u in g.groupby("key", sort=False):
            o = u[u["side"] == "o"]
            if len(o) == 0:
                continue
            s = u[u["side"] == "s"].sort_values("t")
            res_type = np.full(len(o), None, dtype=object)
            res_since = np.full(len(o), np.datetime64("NaT"), dtype="datetime64[us]")
            if len(s):
                vf = s["t"].to_numpy()
                vt = s["t2"].to_numpy()
                et = s["etype"].to_numpy(object)
                idx = np.searchsorted(vf, o["t"].to_numpy(), side="right") - 1
                ok = idx >= 0
                ok[ok] &= o["t"].to_numpy()[ok] < vt[idx[ok]]
                res_type[ok] = et[idx[ok]]
                res_since[ok] = vf[idx[ok]]
            out.append(pd.DataFrame({
                "event_id": o["o_orderkey"].to_numpy(np.int64),
                "user_id": np.full(len(o), int(key), dtype=np.int64),
                "ts": o["t"].to_numpy(),
                "state_event_type": res_type,
                "state_since": res_since,
            }))
        if not out:
            return pd.DataFrame({
                "event_id": pd.Series([], dtype=np.int64),
                "user_id": pd.Series([], dtype=np.int64),
                "ts": pd.Series([], dtype="datetime64[us]"),
                "state_event_type": pd.Series([], dtype=object),
                "state_since": pd.Series([], dtype="datetime64[us]"),
            })
        return pd.concat(out, ignore_index=True)

    both = scd.map_batches(tag_scd, batch_format="pandas").union(
        od.map_batches(tag_od, batch_format="pandas"))
    return (
        both.map_batches(_shard_on(["key"]), batch_format="pandas")
        .repartition(_shuffle_blocks())
        .groupby("_shard")
        .map_groups(lambda g: pit_shard(g.drop(columns=["_shard"])),
                    batch_format="pandas")
    )


def value_quantiles_sketch(sf_dir: str,
                           qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                           bins: int = 8192) -> pd.DataFrame:
    """APPROXIMATE quantiles over a continuous (unbounded-domain) column —
    the sketch path that rel_price_quantiles (exact, bounded integer cents)
    cannot take. Two streaming passes: (1) global min/max aggregate,
    (2) fixed-width histogram partials per batch → one O(bins) combine.
    The reported value is the UPPER edge of the bin where the cumulative
    count first reaches ceil(q·N), so the error is bounded by one bin width
    ((max−min)/bins) at ANY data size — the same state-bounded shape as the
    HLL/CMS/Bloom sketches on the counting side. Deterministic (no
    sampling), so the SQL oracle states the identical bin arithmetic.

    Scale shape: pass 1 is an O(1)-state aggregate; pass 2 moves only
    per-batch bin partials (≤ bins rows each); the driver finish is O(bins)
    regardless of row count."""
    col = "value"
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=[col])
    from ray.data.aggregate import Max, Min

    mm = ds.aggregate(Min(col), Max(col))
    lo, hi = float(mm[f"min({col})"]), float(mm[f"max({col})"])
    w = (hi - lo) / bins

    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b[col].to_numpy(np.float64)
        bi = np.minimum(np.floor((v - lo) / w).astype(np.int64), bins - 1)
        u, c = np.unique(bi, return_counts=True)
        return pd.DataFrame({"bin": u, "k": c.astype(np.int64)})

    hist = (
        ds.map_batches(hist_partial, batch_format="pandas")
        .groupby("bin")
        .aggregate(Sum("k", alias_name="k"))
        .to_pandas()  # O(bins) — sketch state, never row data
        .sort_values("bin")
    )
    total = int(hist["k"].sum())
    cum = hist["k"].cumsum().to_numpy(np.int64)
    edges = hist["bin"].to_numpy(np.int64)
    rows = []
    for q in qs:
        need = int(np.ceil(q * total))
        b = int(edges[np.searchsorted(cum, need, side="left")])
        rows.append({"quantile": float(q),
                     "value_upper": round(lo + (b + 1) * w, 6)})
    return pd.DataFrame(rows)


def _skyline_mask(size: np.ndarray, price: np.ndarray) -> np.ndarray:
    """Vectorized 2-d skyline (maximize size, minimize price): keep row i
    iff no row has size ≥ AND price ≤ with at least one strict.  Sort by
    (size desc, price asc); within a size group only the group-min price
    survives, and only when it beats the prefix-min price over strictly
    larger sizes (ties on BOTH dims are mutually non-dominating → all
    kept)."""
    order = np.lexsort((price, -size))
    s, p = size[order], price[order]
    new_grp = np.r_[True, s[1:] != s[:-1]]
    gid = np.cumsum(new_grp) - 1
    grp_min = p[new_grp]  # price asc within group → first row is group min
    before = np.concatenate(([np.inf], np.minimum.accumulate(grp_min)[:-1]))
    keep_sorted = (p == grp_min[gid]) & (p < before[gid])
    keep = np.zeros(len(size), dtype=bool)
    keep[order[keep_sorted]] = True
    return keep


def skyline_parts(sf_dir: str) -> rd.Dataset:
    """Pareto frontier (skyline) over ``part``: the parts for which no
    other part is simultaneously at-least-as-large (p_size) and
    at-most-as-expensive (p_retailprice), strict in one dimension — the
    classic multi-criteria shortlist operator.

    Distributed shape: the skyline of any SUBSET contains every global
    skyline member present in it, so the local-prune / global-merge
    decomposition is exact — each block shrinks to its own frontier
    (vectorized sort + prefix-min, E[frontier] ≈ ln n rows for random
    2-d data), and only those survivors (tiny) gather into one final
    exact pass.  Shuffle volume is O(Σ local frontiers), never O(rows).
    Output: (p_partkey, p_size, p_retailprice)."""
    cols = ["p_partkey", "p_size", "p_retailprice"]

    def local(b: pd.DataFrame) -> pd.DataFrame:
        m = _skyline_mask(b["p_size"].to_numpy(np.int64),
                          b["p_retailprice"].to_numpy(np.float64))
        return b.loc[m, cols]

    def final(b: pd.DataFrame) -> pd.DataFrame:
        out = local(b).sort_values("p_partkey", kind="mergesort")
        return out.astype({"p_partkey": np.int64, "p_size": np.int64})

    return (
        rd.read_parquet(f"{sf_dir}/part.parquet", columns=cols)
        .map_batches(local, batch_format="pandas")
        .repartition(1)  # survivors only — frontier-sized, not table-sized
        .map_batches(final, batch_format="pandas")
    )


def _splitmix_bits(v: np.ndarray, seed: int, m_bits: int) -> np.ndarray:
    """Vectorized splitmix64 finalizer → bloom bit positions. Numeric keys
    get a numeric hash (no md5 round-trip): the bloom here is an internal
    pruning structure, so the hash only needs speed + determinism, not
    SQL replayability (web_bloom_seen pins the replayable-bloom path)."""
    with np.errstate(over="ignore"):
        x = v.astype(np.uint64) + np.uint64(seed)
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return (x % np.uint64(m_bits)).astype(np.int64)


def bloom_pruned_revenue(sf_dir: str, region: str = "ASIA",
                         m_bits: int = 1 << 20, k_hashes: int = 4) -> rd.Dataset:
    """Bloom-semi-join pushdown (the pre-shuffle pruning classic): revenue
    per nation over orders whose customer sits in ``region``, where the
    fact side is pruned by a BLOOM of the qualifying customer keys before
    it ever reaches the exact join.

    Why this exists next to the plain joins: at 100 TB the qualifying key
    SET can outgrow a broadcast (10⁹ keys × 8 B), but a bloom is a fixed
    m-bit bitmap (128 KiB here, a few GiB for 10⁹ keys at 1% fp) — ship
    the bitmap, drop the ~1−sel of fact rows that cannot match, and let
    the surviving sliver pay the exact bucketed hash join, which also
    removes the bloom's false positives. The bloom therefore never
    affects RESULTS, only shuffle volume — the oracle is the plain join,
    and `log()`-style pruning stats stay out of the output contract.

    Output: (n_name, revenue, n_orders)."""
    import pyarrow as pa

    from ..pipelines.corpus import _shard_on, _shuffle_blocks
    from ..stages.join import bucketed_hash_join

    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    reg = pd.read_parquet(f"{sf_dir}/region.parquet")
    rkey = reg.loc[reg["r_name"] == region, "r_regionkey"].iloc[0]
    dim = nation[nation["n_regionkey"] == rkey]
    nat_names = dict(zip(dim["n_nationkey"].astype(int), dim["n_name"]))
    dim_ref = ray.put(nat_names)

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])

    def in_region(b: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(dim_ref)
        return b.loc[b["c_nationkey"].isin(keys)]

    cust_r = cust.map_batches(in_region, batch_format="pandas")

    # --- build: per-batch distinct bit positions → sharded distinct →
    # bounded driver bitmap (m/8 bytes) → ray.put once
    def bit_rows(b: pd.DataFrame) -> pd.DataFrame:
        v = b["c_custkey"].to_numpy(np.int64)
        bits = np.concatenate([_splitmix_bits(v, s, m_bits)
                               for s in range(k_hashes)])
        return pd.DataFrame({"bit": np.unique(bits)})

    bits = (
        cust_r.map_batches(bit_rows, batch_format="pandas")
        .map_batches(_shard_on(["bit"]), batch_format="pandas")
        .repartition(_shuffle_blocks())
        .groupby("_shard")
        .map_groups(lambda g: pd.DataFrame(
            {"bit": np.unique(g["bit"].to_numpy(np.int64))}),
            batch_format="pandas")
        .to_pandas()["bit"].to_numpy(np.int64)  # ≤ m_bits rows — bitmap-bounded
    )
    bitmap = np.zeros(m_bits, dtype=bool)
    bitmap[bits] = True
    bm_ref = ray.put(np.packbits(bitmap))

    # --- probe: stateless vectorized prune of the fact stream
    def probe(b: pd.DataFrame) -> pd.DataFrame:
        bm = np.unpackbits(ray.get(bm_ref)).view(bool)
        v = b["o_custkey"].to_numpy(np.int64)
        ok = np.ones(len(v), dtype=bool)
        for s in range(k_hashes):
            ok &= bm[_splitmix_bits(v, s, m_bits)]
        return b.loc[ok]

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).map_batches(probe, batch_format="pandas")

    # --- exact join on the survivors removes bloom false positives
    oc = bucketed_hash_join(
        orders, cust_r, "o_custkey", "c_custkey",
        left_schema={"o_custkey": pa.int64(), "o_totalprice": pa.float64()},
        right_schema={"c_custkey": pa.int64(), "c_nationkey": pa.int64()},
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        names = ray.get(dim_ref)
        g = (b.assign(n_name=b["c_nationkey"].astype(int).map(names))
             .groupby("n_name", sort=False)
             .agg(revenue=("o_totalprice", "sum"),
                  n_orders=("o_totalprice", "size"))
             .reset_index())
        return g

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["revenue"] = b["revenue"].round(2)
        b["n_orders"] = b["n_orders"].astype(np.int64)
        return b

    return (
        oc.map_batches(partial, batch_format="pandas")
        .groupby("n_name")
        .aggregate(Sum("revenue", alias_name="revenue"),
                   Sum("n_orders", alias_name="n_orders"))
        .map_batches(finish, batch_format="pandas")
    )
