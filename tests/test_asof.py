"""As-of join: exactness vs pandas merge_asof, tie/tolerance semantics,
and the no-pair-blowup plan shape (one window pass, no range join)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gridfour_spark.asof import asof_join

T0 = dt.datetime(2024, 1, 1)


def _ts(sec: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=sec)


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(10.0)), (2, 1, _ts(20.0)), (3, 2, _ts(5.0)), (4, 3, _ts(7.0))],
        "lid long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 1, _ts(9.0), 1.0), (101, 1, _ts(10.0), 2.0), (102, 1, _ts(15.0), 3.0),
         (103, 2, _ts(6.0), 4.0),          # after left ts 5 -> no match for lid 3
         (104, 1, _ts(10.0), 5.0)],        # duplicate (user, ts): greater rid wins
        "rid long, user_id long, ts timestamp, v double",
    )
    return left, right


def test_asof_backward_with_ties_and_no_match(spark, frames):
    left, right = frames
    out = {r.lid: (r.rid_r, r.v_r) for r in
           asof_join(left, right, key="user_id", ts="ts",
                     right_cols=["rid", "v"], order_col="rid").collect()}
    assert out[1] == (104, 5.0)   # exact-ts match; duplicate resolved to max rid
    assert out[2] == (102, 3.0)   # latest at-or-before 20
    assert out[3] == (None, None)  # only future right rows for user 2
    assert out[4] == (None, None)  # user 3 has no right rows


def test_asof_tolerance(spark, frames):
    left, right = frames
    out = {r.lid: r.rid_r for r in
           asof_join(left, right, key="user_id", ts="ts",
                     right_cols=["rid", "v"], order_col="rid",
                     tolerance_us=2_000_000).collect()}
    assert out[1] == 104           # gap 0 <= 2s
    assert out[2] is None          # gap 5s > 2s -> dropped


def test_asof_matches_pandas_merge_asof_on_events(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    l = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    r = ev.filter(F.col("event_type") == "signup").select("user_id", "ts", "event_id")
    got = {row.event_id: row.event_id_r for row in
           asof_join(l, r, key="user_id", ts="ts",
                     right_cols=["event_id"], order_col="event_id").collect()}
    lp = l.toPandas().sort_values("ts")
    rp = r.toPandas().sort_values("ts").rename(columns={"event_id": "event_id_r"})
    m = pd.merge_asof(lp, rp, on="ts", by="user_id", direction="backward")
    exp = {int(x.event_id): (int(x.event_id_r) if pd.notna(x.event_id_r) else None)
           for _, x in m.iterrows()}
    assert got == exp


def test_asof_plan_is_one_window_no_range_join(spark, frames):
    left, right = frames
    plan = (
        asof_join(left, right, key="user_id", ts="ts",
                  right_cols=["rid", "v"], order_col="rid")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Window") == 1          # exactly one carry pass
    assert "Join" not in plan.replace("Window", "")  # no join operator at all


def test_asof_tolerance_on_ntz_timestamps(spark):
    """tolerance_us must work on TIMESTAMP_NTZ columns too (parquet events
    load as NTZ; unix_micros requires TIMESTAMP — the operator casts,
    and the session-zone shift cancels in the difference)."""
    left = spark.createDataFrame(
        [(1, 1, _ts(10.0))], "lid long, user_id long, ts timestamp_ntz"
    )
    right = spark.createDataFrame(
        [(100, 1, _ts(2.0), 1.0)], "rid long, user_id long, ts timestamp_ntz, v double"
    )
    out = asof_join(left, right, key="user_id", ts="ts",
                    right_cols=["rid", "v"], order_col="rid",
                    tolerance_us=5_000_000).collect()
    assert out[0].rid_r is None   # gap 8s > 5s tolerance
    out2 = asof_join(left, right, key="user_id", ts="ts",
                     right_cols=["rid", "v"], order_col="rid",
                     tolerance_us=10_000_000).collect()
    assert out2[0].rid_r == 100


def test_interval_join_matches_naive_and_no_bnlj(spark):
    """Bucketized interval join must equal the naive range filter exactly —
    including intervals spanning multiple buckets, exclusive-end boundary
    points, and multi-match points — and plan as an equi-join (no BNLJ)."""
    points = spark.createDataFrame(
        [(1, 1, _ts(30.0)), (2, 1, _ts(3600.0)),       # exactly at an interval end
         (3, 1, _ts(5400.0)), (4, 2, _ts(100.0)), (5, 2, _ts(100.0))],
        "pid long, user_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(10, 1, _ts(0.0), _ts(3600.0)),                # pid 1 in; pid 2 OUT (exclusive end)
         (11, 1, _ts(1800.0), _ts(9000.0)),             # spans 3 buckets; pids 2,3 in
         (12, 2, _ts(0.0), _ts(200.0)),                 # two points match
         (13, 2, _ts(50.0), _ts(150.0))],               # overlapping: multi-match
        "iid long, user_id long, start timestamp, end timestamp",
    )
    from gridfour_spark.asof import interval_join

    out = interval_join(points, intervals, key="user_id", ts="ts")
    got = {(r.pid, r.iid) for r in out.collect()}
    naive = {
        (p.pid, i.iid)
        for p in points.collect() for i in intervals.collect()
        if p.user_id == i.user_id and i.start <= p.ts < i.end
    }
    assert got == naive
    assert (2, 10) not in got and (2, 11) in got   # exclusive end honored
    assert {(4, 12), (4, 13), (5, 12), (5, 13)} <= got

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_salted_equals_plain(spark, frames):
    """Range-salted as-of (round 6): row-identical to the plain operator on
    the unit fixture — including exact-ts ties, duplicate right timestamps,
    no-match lefts — and on real events, including matches that cross
    bucket boundaries (bucket_us small enough that most do)."""
    from gridfour_spark.asof import asof_join_salted

    left, right = frames
    kw = dict(key="user_id", ts="ts", right_cols=["rid", "v"], order_col="rid")
    plain = sorted(map(tuple, asof_join(left, right, **kw).collect()))
    # 5-second buckets: lid 2 (ts=20) must find rid 102 (ts=15) via the
    # bucket-grain seed carry, two buckets back
    salted = sorted(map(tuple, asof_join_salted(
        left, right, bucket_us=5_000_000, **kw).collect()))
    assert plain == salted

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    l = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    r = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    kw2 = dict(key="user_id", ts="ts", right_cols=["event_id"], order_col="event_id")
    p2 = sorted(map(tuple, asof_join(l, r, **kw2).collect()))
    s2 = sorted(map(tuple, asof_join_salted(l, r, **kw2).collect()))
    assert p2 == s2


def test_asof_salted_tolerance(spark, frames):
    from gridfour_spark.asof import asof_join_salted

    left, right = frames
    out = {r.lid: r.rid_r for r in
           asof_join_salted(left, right, key="user_id", ts="ts",
                            right_cols=["rid", "v"], order_col="rid",
                            tolerance_us=2_000_000, bucket_us=5_000_000).collect()}
    assert out[1] == 104           # gap 0 <= 2s
    assert out[2] is None          # gap 5s > 2s -> dropped


def test_asof_salted_plan_shards_hot_key(spark, frames):
    """The salted carry's MAIN window must partition by (key, bucket) —
    the property that shards a hot key across its time span (measured
    17.1x -> 2.4x hot/uniform ratio at 30M rows) — and still contain no
    range join. The bucket-grain seed window partitions by key alone but
    runs over per-bucket aggregates, not raw rows."""
    from gridfour_spark.asof import asof_join_salted

    left, right = frames
    plan = (
        asof_join_salted(left, right, key="user_id", ts="ts",
                         right_cols=["rid", "v"], order_col="rid")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Window") == 2  # seed carry + main carry, nothing else
    # main window keyed by (_k, _b): hot keys shard over buckets
    assert "windowspecdefinition(_k" in plan and "_b" in plan


def test_interval_agg_join_matches_pairs_and_duckdb(spark):
    """Aggregate-pushdown interval join (round 7): per-window counts/sums
    computed from bucket partials + edge filters must equal the pair join
    + GROUP BY exactly — including bucket-aligned windows, sub-bucket
    windows, multi-bucket interiors, and zero-match windows — and match
    the DuckDB BETWEEN-join oracle."""
    import duckdb

    from gridfour_spark.asof import interval_agg_join, interval_join

    # bucket_us = 1000s; windows engineered around the bucket geometry
    BUS = 1_000_000_000
    pts = [
        (i, 1, _ts(float(t)), float(v))
        for i, (t, v) in enumerate(
            [(0, 1), (500, 2), (999, 3), (1000, 4), (1500, 5), (2500, 6),
             (3500, 7), (4000, 8), (4999, 9), (5000, 10)]
        )
    ] + [(100, 2, _ts(250.0), 11.0), (101, 3, _ts(9999.0), 12.0)]
    points = spark.createDataFrame(
        pts, "pid long, user_id long, ts timestamp, value double")
    ivs = [
        (10, 1, 0.0, 5000.0),      # 5 buckets: 3 interior + 2 edges
        (11, 1, 0.0, 1000.0),      # exactly one bucket, aligned
        (12, 1, 250.0, 750.0),     # sub-bucket (b0 == b1)
        (13, 1, 999.0, 4001.0),    # unaligned, interior present
        (14, 1, 6000.0, 7000.0),   # zero matches
        (15, 2, 0.0, 500.0),       # other key
        (16, 9, 0.0, 9000.0),      # key with no points at all
    ]
    intervals = spark.createDataFrame(
        [(i, u, _ts(s), _ts(e)) for i, u, s, e in ivs],
        "iid long, user_id long, start timestamp, end timestamp",
    )
    out = interval_agg_join(
        points, intervals, key="user_id", ts="ts", value="value", bucket_us=BUS
    ).collect()
    got = {r["iid"]: (r["n_points"], r["sum_value"]) for r in out}
    assert len(out) == len(ivs)  # every interval exactly once

    # oracle 1: the pair join aggregated
    pair = (
        interval_join(points, intervals, key="user_id", ts="ts")
        .groupBy("iid")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    )
    want = {r["iid"]: (r["n"], r["s"]) for r in pair}
    for iid, *_ in ivs:
        w = want.get(iid, (0, None))
        assert got[iid] == w, (iid, got[iid], w)

    # oracle 2: DuckDB BETWEEN join (plans as IEJoin)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE p AS SELECT * FROM (VALUES "
        + ",".join(
            f"({i},{u},{(t - _ts(0.0)).total_seconds()},{v})" for i, u, t, v in pts
        )
        + ") v(pid, user_id, ts, value)"
    )
    con.execute(
        "CREATE TABLE iv AS SELECT * FROM (VALUES "
        + ",".join(f"({i},{u},{s},{e})" for i, u, s, e in ivs)
        + ") v(iid, user_id, s, e)"
    )
    duck = dict(
        (iid, (n, s))
        for iid, n, s in con.execute(
            "SELECT iid, COUNT(p.pid), SUM(p.value) FROM iv "
            "LEFT JOIN p ON p.user_id = iv.user_id AND p.ts >= iv.s AND p.ts < iv.e "
            "GROUP BY iid"
        ).fetchall()
    )
    for iid, *_ in ivs:
        assert got[iid] == duck[iid], (iid, got[iid], duck[iid])


def test_interval_agg_join_no_pair_blowup_plan(spark):
    """The agg-pushdown plan must contain no BNLJ/cartesian and must read
    interior buckets from the PARTIAL aggregate (two groupBys feeding the
    final combine), not from raw points."""
    from gridfour_spark.asof import interval_agg_join

    points = spark.createDataFrame(
        [(i, 1, _ts(float(i * 10)), 1.0) for i in range(100)],
        "pid long, user_id long, ts timestamp, value double",
    )
    intervals = spark.createDataFrame(
        [(1, 1, _ts(0.0), _ts(900.0))],
        "iid long, user_id long, start timestamp, end timestamp",
    )
    out = interval_agg_join(points, intervals, value="value", bucket_us=100_000_000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
