"""As-of and binned range join edge cases (operators/asof.py)."""

from pyspark.sql import functions as F

from gem_data_wrangle_spark.operators.asof import asof_join, range_join_binned


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, "a"),   # after right@5 and right@10 → tie: right@10 wins
            (1, 7, "b"),    # between right@5 and right@10 → right@5
            (1, 3, "c"),    # before any right row → NULL
            (2, 100, "d"),  # key with no right rows at all → NULL
        ],
        "k int, t int, payload string",
    )
    right = spark.createDataFrame(
        [(1, 5, 50.0), (1, 10, 100.0)], "k int, t int, v double"
    )
    return left, right


def test_asof_backward_inclusive_and_nulls(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="t", by=["k"], value_cols=["v"])
    got = {r["payload"]: r["v_asof"] for r in out.collect()}
    assert got == {"a": 100.0, "b": 50.0, "c": None, "d": None}
    # left columns survive untouched
    assert set(out.columns) == {"k", "t", "payload", "v_asof"}
    assert out.count() == left.count()


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="t", by=["k"], value_cols=["v"], tolerance=F.lit(2)
    )
    got = {r["payload"]: r["v_asof"] for r in out.collect()}
    # 'a' t=10 matches right@10 (gap 0 ≤ 2); 'b' t=7 matched right@5 but
    # gap 2 ≤ 2 keeps it; shrink tolerance below and it nulls
    assert got["a"] == 100.0 and got["b"] == 50.0
    tight = asof_join(
        left, right, on="t", by=["k"], value_cols=["v"], tolerance=F.lit(1)
    )
    got_t = {r["payload"]: r["v_asof"] for r in tight.collect()}
    assert got_t["b"] is None and got_t["a"] == 100.0


def test_asof_is_single_shuffle(spark):
    left, right = _frames(spark)
    plan = (
        asof_join(left, right, on="t", by=["k"], value_cols=["v"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan  # union + window, not a join


def test_range_join_binned_boundaries(spark):
    points = spark.createDataFrame(
        [(1, 0.0), (2, 999.9), (3, 1000.0), (4, 2499.9), (5, 2500.0), (6, -1.0)],
        "pid int, x double",
    )
    intervals = spark.createDataFrame(
        [(10, 0.0, 1000.0), (20, 500.0, 2500.0)], "iid int, lo double, hi double"
    )
    out = range_join_binned(points, intervals, "x", "lo", "hi", bin_width=1000.0)
    pairs = {(r["pid"], r["iid"]) for r in out.collect()}
    assert pairs == {
        (1, 10),            # start inclusive
        (2, 10), (2, 20),   # inside both
        (3, 20),            # hi of 10 is exclusive; inside 20
        (4, 20),            # just below exclusive end
        # 5 @2500.0 == hi of 20 → excluded; 6 below everything
    }


def test_range_join_binned_left_keeps_orphans(spark):
    """ADVICE r2: the exact predicate is part of the join condition, so
    a left join keeps uncontained points (exactly one NULL row each)
    instead of silently degenerating to inner."""
    import pytest

    points = spark.createDataFrame(
        [(1, 500.0), (2, 5000.0)], "pid int, x double"
    )
    intervals = spark.createDataFrame(
        [(10, 0.0, 1000.0)], "iid int, lo double, hi double"
    )
    out = range_join_binned(points, intervals, "x", "lo", "hi", 1000.0, how="left")
    rows = {r["pid"]: r for r in out.collect()}
    assert len(rows) == 2
    assert rows[1]["iid"] == 10
    assert rows[2]["iid"] is None and rows[2]["lo"] is None
    with pytest.raises(ValueError):
        range_join_binned(points, intervals, "x", "lo", "hi", 1000.0, how="full")


def test_range_join_spans_multiple_bins(spark):
    points = spark.createDataFrame([(1, 3.7)], "pid int, x double")
    intervals = spark.createDataFrame([(9, 0.0, 100.0)], "iid int, lo double, hi double")
    # tiny bins: the interval fans out to 100 bins, the match still lands
    out = range_join_binned(points, intervals, "x", "lo", "hi", bin_width=1.0)
    assert [(r["pid"], r["iid"]) for r in out.collect()] == [(1, 9)]


def test_resample_timeseries_carry_forward(spark):
    import datetime as dt

    from gem_data_wrangle_spark.operators.asof import resample_timeseries

    t = dt.datetime(2024, 1, 1, 0, 0, 0)
    df = spark.createDataFrame(
        [
            ("s1", t, 10.0),
            ("s1", t + dt.timedelta(minutes=90), 20.0),
            ("s1", t + dt.timedelta(hours=4), 30.0),
            ("s2", t + dt.timedelta(hours=1), 5.0),
        ],
        "key string, ts timestamp, v double",
    )
    out = resample_timeseries(df, "key", "ts", ["v"], step="1 hour")
    rows = {(r.key, r.ts.hour): r.v for r in out.collect()}
    # s1 grid: 00..04 — 01 carries 10.0 (obs at 01:30 is later), 02..03 carry 20.0
    assert rows[("s1", 0)] == 10.0
    assert rows[("s1", 1)] == 10.0
    assert rows[("s1", 2)] == 20.0
    assert rows[("s1", 3)] == 20.0
    assert rows[("s1", 4)] == 30.0
    # s2: single point -> single tick with its own value
    assert rows[("s2", 1)] == 5.0
    assert len(rows) == 6


def test_rolling_time_agg_frame_boundaries(spark):
    """Trailing 1h window: inclusive at exactly -3600s (RANGE
    semantics), exclusive beyond; same-timestamp peers aggregate
    together on BOTH rows; keys never mix."""
    import datetime as dt

    from gem_data_wrangle_spark.operators.asof import rolling_time_agg

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, 1, t0 - dt.timedelta(seconds=3601), 1.0),
        (2, 1, t0 - dt.timedelta(seconds=3600), 2.0),
        (3, 1, t0 - dt.timedelta(seconds=1800), 4.0),
        (4, 1, t0, 8.0),
        (5, 1, t0, 16.0),                               # peer of 4
        (6, 2, t0, 32.0),                               # other key
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp_ntz, value double"
    )
    out = {r["event_id"]: r for r in
           rolling_time_agg(df, "user_id", "ts", "value").collect()}
    # t0 rows: window [t0-3600, t0] holds rows 2..5 — row 1 is 1 s too
    # old (exclusive beyond the span), row 2 sits EXACTLY on the edge
    # (inclusive), and the t0 peers see each other on both rows
    assert out[4]["rolling_sum"] == 30.0 and out[4]["rolling_count"] == 4
    assert out[5]["rolling_sum"] == 30.0 and out[5]["rolling_count"] == 4
    # row 2's own window [t0-7200, t0-3600] reaches back to row 1
    assert out[2]["rolling_sum"] == 3.0 and out[2]["rolling_count"] == 2
    # row 3's window [t0-5400, t0-1800] holds rows 1, 2, 3
    assert out[3]["rolling_sum"] == 7.0 and out[3]["rolling_count"] == 3
    # keys never mix
    assert out[6]["rolling_sum"] == 32.0 and out[6]["rolling_count"] == 1
