"""Round-7 operator additions: character statistics, script mix,
n-gram decontamination, rolling z-scores, funnel analysis."""

import pytest

import datetime as dt
import math

from pyspark.sql import functions as F


def test_char_entropy_known_values(spark):
    from gem_data_wrangle_spark.operators.textops import char_entropy

    df = spark.createDataFrame(
        [(0, "aaaa"), (1, "abab"), (2, "abcd"), (3, ""), (4, None),
         (5, "aab")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in char_entropy(df, "text", "doc_id").collect()}
    assert got[0]["char_entropy"] == 0.0 and got[0]["sum_sq_counts"] == 16
    assert got[1]["char_entropy"] == 1.0 and got[1]["n_distinct_chars"] == 2
    assert got[2]["char_entropy"] == 2.0 and got[2]["sum_sq_counts"] == 4
    for d in (3, 4):
        assert got[d]["n_chars"] == 0 and got[d]["char_entropy"] is None
    # H("aab") = log2(3) - (2*log2(2) + 1*log2(1))/3
    want = round(math.log2(3) - 2.0 / 3.0, 4)
    assert got[5]["char_entropy"] == want
    assert got[5]["sum_sq_counts"] == 5  # 2² + 1²


def test_script_fractions_mixed_scripts(spark):
    from gem_data_wrangle_spark.operators.textops import script_fractions

    df = spark.createDataFrame(
        [(0, "ab 12"), (1, "Привет"), (2, "你好"), (3, "مرحبا"), (4, "")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in script_fractions(df, "text", "doc_id").collect()}
    assert got[0]["latin_letters_count"] == 2 and got[0]["digits_count"] == 2
    assert got[0]["whitespace_count"] == 1 and got[0]["other_count"] == 0
    assert got[0]["latin_letters_frac"] == 0.4
    assert got[1]["cyrillic_count"] == 6 and got[1]["cyrillic_frac"] == 1.0
    assert got[2]["cjk_count"] == 2
    assert got[3]["arabic_count"] == 5
    assert got[4]["n_chars"] == 0 and got[4]["latin_letters_frac"] is None
    # counts partition the text: n = known + other for every row
    for r in got.values():
        known = sum(r[f"{k}_count"] for k in
                    ("latin_letters", "digits", "whitespace",
                     "cyrillic", "cjk", "arabic"))
        assert known + r["other_count"] == r["n_chars"]


def test_ngram_decontaminate_flags_and_remove(spark):
    from gem_data_wrangle_spark.operators.dedup import ngram_decontaminate

    train = spark.createDataFrame(
        [(0, "a b c d e f"), (1, "x y z w q r"), (2, "c d e f g h"),
         (3, "a b"), (4, None)],
        "doc_id bigint, text string",
    )
    ev = spark.createDataFrame([(900, "b c d e")], "eid bigint, text string")
    out = {r["doc_id"]: r for r in
           ngram_decontaminate(train, ev, "text", "doc_id", n=3).collect()}
    # doc0 shares 3-grams "b c d" and "c d e"; doc2 shares "c d e"
    assert out[0]["n_collisions"] == 2 and out[0]["contaminated"]
    assert out[2]["n_collisions"] == 1 and out[2]["contaminated"]
    assert not out[1]["contaminated"]
    assert not out[3]["contaminated"]  # shorter than n tokens
    assert not out[4]["contaminated"]  # null text
    clean = ngram_decontaminate(train, ev, "text", "doc_id", n=3, remove=True)
    assert {r["doc_id"] for r in clean.collect()} == {1, 3, 4}
    assert clean.columns == train.columns  # remove drops the flags


def test_rolling_zscores_matches_numpy(spark):
    import numpy as np

    from gem_data_wrangle_spark.operators.asof import rolling_zscores

    t0 = dt.datetime(2024, 1, 1)
    vals = [1.25, 2.5, 2.5, 9.75, 0.25, 3.0, 3.0, 3.0]
    rows = [(i, t0 + dt.timedelta(minutes=i), 7, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, value double"
    )
    got = {r["event_id"]: r for r in
           rolling_zscores(df, "user_id", "ts", "value", window_rows=4,
                           order_tiebreak="event_id").collect()}
    cents = np.round(np.array(vals) * 100).astype(np.int64)
    for i in range(len(vals)):
        frame = cents[max(0, i - 3): i + 1]
        assert got[i]["frame_n"] == len(frame)
        mean = frame.sum() / len(frame)
        assert got[i]["rolling_mean"] == math.floor(mean / 100 * 10000) / 10000
        if len(frame) >= 2 and frame.std(ddof=1) > 0:
            z = (cents[i] - mean) / frame.std(ddof=1)
            assert abs(got[i]["zscore"] - z) < 1e-3, (i, got[i]["zscore"], z)
        else:
            assert got[i]["zscore"] is None  # first row / zero variance
    # constant tail: events 5..7 all 3.0 → frame 4..7? no: frame of 7 is
    # [0.25,3,3,3] (var > 0); verified above via the generic loop


def test_funnel_steps_ordering_and_breaks(spark):
    from gem_data_wrangle_spark.operators.aggregates import funnel_steps

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, minutes, user, typ):
        return (eid, t0 + dt.timedelta(minutes=minutes), user, typ)

    df = spark.createDataFrame(
        [
            # user 1: full funnel in order
            ev(0, 0, 1, "click"), ev(1, 5, 1, "view"), ev(2, 9, 1, "error"),
            # user 2: view BEFORE the first click → depth 1
            ev(3, 0, 2, "view"), ev(4, 5, 2, "click"),
            # user 3: click+view, error strictly BEFORE view → depth 2
            ev(5, 0, 3, "click"), ev(6, 2, 3, "error"), ev(7, 4, 3, "view"),
            # user 4: no click at all → depth 0
            ev(8, 0, 4, "view"), ev(9, 1, 4, "error"),
            # user 5: same-timestamp view as click → strict > excludes it
            ev(10, 0, 5, "click"), (11, t0, 5, "view"),
        ],
        "event_id bigint, ts timestamp, user_id bigint, event_type string",
    )
    got = {r["user_id"]: r for r in
           funnel_steps(df, "user_id", "ts", "event_type",
                        ["click", "view", "error"]).collect()}
    assert got[1]["funnel_depth"] == 3
    assert got[1]["step3_ts"] == t0 + dt.timedelta(minutes=9)
    assert got[2]["funnel_depth"] == 1  # click at :05, no view after
    assert got[2]["step2_ts"] is None
    assert got[3]["funnel_depth"] == 2  # error precedes view → broken
    assert got[4]["funnel_depth"] == 0 and got[4]["step1_ts"] is None
    assert got[5]["funnel_depth"] == 1  # same-ts view not strictly after


def test_rollup_aggregate_levels(spark):
    from gem_data_wrangle_spark.operators.aggregates import rollup_aggregate

    df = spark.createDataFrame(
        [("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 4.0), ("a", None, 8.0)],
        "k1 string, k2 string, v double",
    )
    out = rollup_aggregate(df, ["k1", "k2"], {"sv": "v"}).collect()
    rows = {(r["k1"], r["k2"], r["g_k1"], r["g_k2"]): (r["sv"], r["n_rows"])
            for r in out}
    assert rows[("a", "x", 0, 0)] == (1.0, 1)
    # genuine NULL group value vs subtotal: distinguished by the flag
    assert rows[("a", None, 0, 0)] == (8.0, 1)   # real NULL key
    assert rows[("a", None, 0, 1)] == (11.0, 3)  # k1=a subtotal
    assert rows[(None, None, 1, 1)] == (15.0, 4)  # grand total
    assert len(out) == 4 + 2 + 1  # leaves + per-k1 + grand


def test_pivot_aggregate_stated_domain(spark):
    from gem_data_wrangle_spark.operators.aggregates import pivot_aggregate

    df = spark.createDataFrame(
        [(1, "a", 1.5), (1, "a", 2.5), (1, "b", 3.0), (2, "b", 4.0),
         (2, "zzz", 9.0)],  # outside the stated domain -> dropped
        "k bigint, t string, v double",
    )
    out = {r["k"]: r for r in
           pivot_aggregate(df, ["k"], "t", ["a", "b", "c"], "v").collect()}
    assert out[1]["a"] == 4.0 and out[1]["b"] == 3.0 and out[1]["c"] is None
    assert out[2]["a"] is None and out[2]["b"] == 4.0
    assert list(out[1].asDict()) == ["k", "a", "b", "c"]


def test_group_quantiles_matches_numpy(spark):
    import numpy as np

    from gem_data_wrangle_spark.operators.aggregates import group_quantiles

    vals = [1.25, 9.5, 3.75, 2.0, 7.25, 0.5, 4.0]
    df = spark.createDataFrame(
        [(1, v) for v in vals] + [(2, 5.0)],  # single-value group
        "k bigint, v double",
    )
    got = {r["k"]: r for r in
           group_quantiles(df, ["k"], "v", percents=(50, 95)).collect()}
    for p in (50, 95):
        want = float(np.percentile(np.array(vals), p))  # linear interp
        assert abs(got[1][f"p{p}"] - want) < 1e-9, (p, got[1][f"p{p}"], want)
    assert got[2]["p50"] == 5.0 and got[2]["p95"] == 5.0
    assert got[1]["n_values"] == 7


def test_global_quantiles_matches_group_constant(spark):
    """global_quantiles (two-phase ranks, no global window) must agree
    with numpy's linear interpolation and report the population size;
    an all-NULL input degrades to the (0, NULL...) row."""
    import numpy as np

    from gem_data_wrangle_spark.operators.aggregates import global_quantiles

    vals = [1.25, 9.5, 3.75, 2.0, 7.25, 0.5, 4.0, 6.25, 8.0]
    df = spark.createDataFrame([(v,) for v in vals] + [(None,)], "v double")
    row = global_quantiles(df, "v", percents=(25, 50, 95)).collect()[0]
    assert row["n_values"] == 9
    for p in (25, 50, 95):
        want = float(np.percentile(np.array(vals), p))
        assert abs(row[f"p{p}"] - want) < 1e-9, (p, row[f"p{p}"], want)
    empty = global_quantiles(
        spark.createDataFrame([(None,)], "v double"), "v", percents=(50,)
    ).collect()[0]
    assert empty["n_values"] == 0 and empty["p50"] is None


def test_ranked_top_k_plans_without_exchange(spark):
    """ranked_top_k must rank via TakeOrderedAndProject — the window
    rides its single-partition k-row output with NO exchange at all."""
    from pyspark.sql import functions as F

    from gem_data_wrangle_spark.operators.aggregates import ranked_top_k

    df = spark.range(5000).select(
        F.col("id"), (F.col("id") % 97).alias("score")
    )
    out = ranked_top_k(df, [F.desc("score"), F.asc("id")], 10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    rows = out.orderBy("rank").collect()
    assert [r["rank"] for r in rows] == list(range(1, 11))
    assert all(r["score"] == 96 for r in rows)  # top score block
    assert [r["id"] for r in rows] == sorted(r["id"] for r in rows)


def test_cohort_retention_triangle(spark):
    import datetime as dt

    from gem_data_wrangle_spark.operators.aggregates import cohort_retention

    mon = dt.datetime(2024, 1, 1)  # a Monday

    def at(days, user):
        return (user, mon + dt.timedelta(days=days))

    df = spark.createDataFrame(
        # u1 first week0, active weeks 0,1,2; u2 first week0, week0 only
        # (twice in one week -> counted once); u3 first week1, weeks 1,3
        [at(0, 1), at(8, 1), at(15, 1), at(2, 2), at(3, 2), at(9, 3),
         at(22, 3)],
        "user_id bigint, ts timestamp",
    )
    got = {(str(r["cohort_week"]), r["week_offset"]): r["n_active"]
           for r in cohort_retention(df, "user_id", "ts").collect()}
    assert got[("2024-01-01", 0)] == 2
    assert got[("2024-01-01", 1)] == 1
    assert got[("2024-01-01", 2)] == 1
    assert got[("2024-01-08", 0)] == 1
    assert got[("2024-01-08", 2)] == 1  # u3: week1 -> week3 is offset 2
    assert len(got) == 5


def test_hll_distinct_accuracy_and_determinism(spark):
    from pyspark.sql import functions as F

    from gem_data_wrangle_spark.operators.sketches import hll_distinct

    df = spark.range(0, 5000).select(
        (F.col("id") % 2).alias("g"),
        # group 0: 2500 distinct values; group 1: 10 distinct values
        F.when(F.col("id") % 2 == 0, F.col("id"))
        .otherwise(F.col("id") % 20).alias("v"),
    )
    got = {r["g"]: r for r in hll_distinct(df, ["g"], "v").collect()}
    # raw-harmonic branch: within 3 sigma of 1.04/sqrt(64) = 13%
    assert abs(got[0]["hll_estimate"] - 2500) / 2500 < 0.39
    # linear-counting branch: small cardinalities are near-exact
    assert abs(got[1]["hll_estimate"] - 10) <= 2
    assert got[1]["hll_registers_hit"] <= 10
    # numerator is the exact integer harmonic state: re-run identical
    again = {r["g"]: r for r in hll_distinct(df, ["g"], "v").collect()}
    assert {k: v["hll_numerator"] for k, v in got.items()} == \
           {k: v["hll_numerator"] for k, v in again.items()}


def test_hll_merge_equals_direct_union_sketch(spark):
    from pyspark.sql import functions as F

    from gem_data_wrangle_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    df = spark.range(0, 3000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 700).alias("v")
    )
    regs = hll_registers(df, ["g"], "v")
    merged = hll_merge(regs.withColumn("g", F.lit(-1)), ["g"])
    via_merge = hll_estimate(merged, ["g"]).collect()[0]
    direct = hll_estimate(
        hll_registers(df.withColumn("g", F.lit(-1)), ["g"], "v"), ["g"]
    ).collect()[0]
    # merge(max per register) must equal sketching the union directly —
    # identical integer state, not merely a close estimate
    assert via_merge["hll_numerator"] == direct["hll_numerator"]
    assert via_merge["hll_estimate"] == direct["hll_estimate"]
    assert abs(via_merge["hll_estimate"] - 700) / 700 < 0.39


def test_mp4_probe_parses_built_containers(spark):
    from gem_data_wrangle_spark.operators.mp4 import (
        build_mp4,
        mp4_probe,
        probe_mp4_bytes,
    )

    full = build_mp4(640, 360, 5400, b"avc1", 30, b"mp4a", 43)
    got = probe_mp4_bytes(full)
    assert got == {
        "probe_status": "ok", "brand": "isom", "duration_s": 5.4,
        "n_tracks": 2, "video_codec": "avc1", "width": 640, "height": 360,
        "audio_codec": "mp4a", "n_samples": 73,
    }
    # video-only, odd codec
    solo = probe_mp4_bytes(build_mp4(1920, 1080, 99, b"hev1", 7, None))
    assert solo["video_codec"] == "hev1" and solo["audio_codec"] is None
    assert solo["n_tracks"] == 1 and solo["duration_s"] == 0.099
    # malformed rows degrade, never throw
    assert probe_mp4_bytes(full[: len(full) // 2])["probe_status"] == "truncated"
    assert probe_mp4_bytes(b"JUNK" * 4)["probe_status"] == "not_mp4"
    assert probe_mp4_bytes(b"")["probe_status"] == "not_mp4"
    # 64-bit largesize box header (size==1 + 8-byte size) parses
    ftyp = full[:24]
    inner = full[24:]
    large = (
        (1).to_bytes(4, "big") + b"moov"
        + (16 + len(inner) - 8).to_bytes(8, "big") + inner[8:]
    )
    assert probe_mp4_bytes(ftyp + large)["probe_status"] == "ok"
    # size==0 (extends to EOF) on the final box
    tail0 = ftyp + (0).to_bytes(4, "big") + inner[4:]
    assert probe_mp4_bytes(tail0)["probe_status"] == "ok"

    # the Spark path: schema + NULL media row survives
    df = spark.createDataFrame(
        [(1, bytearray(full)), (2, None)], "id bigint, media binary"
    )
    rows = {r["id"]: r for r in mp4_probe(df).collect()}
    assert rows[1]["video_codec"] == "avc1" and rows[1]["n_samples"] == 73
    assert rows[2]["probe_status"] == "not_mp4"


def test_mp4_probe_degrades_on_crafted_short_boxes():
    """ADVICE r7: an empty mvhd ending at EOF raised IndexError through
    the batch; a short tkhd read its own header bytes as dims. Both
    must degrade per the malformed-input contract, never throw."""
    from gem_data_wrangle_spark.operators.mp4 import build_mp4, probe_mp4_bytes

    def box(typ: bytes, payload: bytes) -> bytes:
        return (8 + len(payload)).to_bytes(4, "big") + typ + payload

    ftyp = box(b"ftyp", b"isom" + (0).to_bytes(4, "big") + b"isom")
    # moov whose only child is an EMPTY mvhd (payload ends at EOF)
    empty_mvhd = ftyp + box(b"moov", box(b"mvhd", b""))
    got = probe_mp4_bytes(empty_mvhd)
    assert got["probe_status"] == "ok" and got["duration_s"] is None
    # mvhd shorter than the v0 fixed fields
    short_mvhd = ftyp + box(b"moov", box(b"mvhd", b"\x00" * 6))
    assert probe_mp4_bytes(short_mvhd)["duration_s"] is None
    # trak with a 4-byte tkhd: too short for the trailing dims — the
    # track must surface with NULL width/height, not header garbage
    trk = box(b"trak", box(b"tkhd", b"\x00" * 4)
              + box(b"mdia", box(b"hdlr", (0).to_bytes(4, "big") * 2
                                 + b"vide" + b"\x00")))
    short_tkhd = ftyp + box(b"moov", trk)
    got = probe_mp4_bytes(short_tkhd)
    assert got["probe_status"] == "ok"
    assert got["width"] is None and got["height"] is None
    # control: a well-formed buffer still probes fully
    assert probe_mp4_bytes(build_mp4(64, 48, 1000))["width"] == 64


def test_event_transition_matrix(spark):
    import datetime as dt

    from gem_data_wrangle_spark.operators.aggregates import (
        event_transition_matrix,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: a -> b -> a -> c ; user 2: a -> b (sequences never
        # cross users: u2's first event contributes no transition)
        (0, t0, 1, "a"), (1, t0 + dt.timedelta(minutes=1), 1, "b"),
        (2, t0 + dt.timedelta(minutes=2), 1, "a"),
        (3, t0 + dt.timedelta(minutes=3), 1, "c"),
        (4, t0, 2, "a"), (5, t0 + dt.timedelta(minutes=1), 2, "b"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    got = {(r["prev_type"], r["next_type"]): r for r in
           event_transition_matrix(df, "user_id", "ts", "event_type",
                                   order_tiebreak="event_id").collect()}
    assert got[("a", "b")]["n_transitions"] == 2
    assert got[("a", "c")]["n_transitions"] == 1
    assert got[("b", "a")]["n_transitions"] == 1
    assert len(got) == 3
    # a -> {b: 2/3, c: 1/3} as exact integer ppm floors
    assert got[("a", "b")]["prob_ppm"] == 666666
    assert got[("a", "c")]["prob_ppm"] == 333333
    assert got[("b", "a")]["prob_ppm"] == 1000000


def test_zorder_write_tightens_rowgroup_stats(spark, tmp_path):
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from gem_data_wrangle_spark.sources.bucketing import zorder_write

    df = spark.range(0, 40000).select(
        (F.col("id") % 200).alias("x"),
        ((F.col("id") * 7919) % 200).alias("y"),
    )
    zp, pp = str(tmp_path / "zord"), str(tmp_path / "plain")
    zorder_write(df, zp, ["x", "y"], num_files=16)
    df.repartition(16).write.mode("overwrite").parquet(pp)

    def mean_width(path):
        import glob
        import os

        widths = []
        for f in glob.glob(os.path.join(path, "*.parquet")):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    if name in ("x", "y") and col.statistics is not None:
                        widths.append(
                            (col.statistics.max - col.statistics.min) / 199.0
                        )
        return sum(widths) / len(widths)

    zw, pw = mean_width(zp), mean_width(pp)
    # plain random-layout row groups span nearly the full domain on
    # both columns; z-ordered ones are tight rectangles
    assert pw > 0.8, pw
    assert zw < 0.5 * pw, (zw, pw)
    # and the data survives the round trip
    assert spark.read.parquet(zp).count() == 40000


def test_zorder_key_is_exact_bit_interleave(spark):
    from pyspark.sql import functions as F

    from gem_data_wrangle_spark.sources.bucketing import zorder_key

    df = spark.createDataFrame(
        [(0, 0, 0), (1, 3, 0), (2, 0, 3), (3, 3, 3)], "id bigint, x long, y long"
    )
    got = {r["id"]: r["_zorder"] for r in
           zorder_key(df, ["x", "y"], bits=2).collect()}
    # min=0 max=3 -> norm == value; interleave x:even bits, y:odd bits
    assert got[0] == 0b0000
    assert got[1] == 0b0101   # x=3 -> bits 0,2
    assert got[2] == 0b1010   # y=3 -> bits 1,3
    assert got[3] == 0b1111


def test_integer_pair_stats_matches_numpy(spark):
    import numpy as np

    from gem_data_wrangle_spark.operators.stats import integer_pair_stats

    xs = [1, 5, 3, 9, 7, 2]
    ys = [2, 11, 5, 17, 15, 3]
    df = spark.createDataFrame(
        [(1, x, y) for x, y in zip(xs, ys)] + [(2, 4, 4), (2, 6, 4)],
        "g bigint, x long, y long",
    )
    got = {r["g"]: r for r in integer_pair_stats(df, ["g"], "x", "y").collect()}
    assert got[1]["sum_xy"] == sum(a * b for a, b in zip(xs, ys))
    want_corr = float(np.corrcoef(xs, ys)[0, 1])
    assert abs(got[1]["corr"] - want_corr) < 1e-6
    want_cov = float(np.cov(xs, ys, ddof=1)[0, 1])
    assert abs(got[1]["covar_samp"] - want_cov) < 1e-6
    # zero variance on y -> corr NULL, covariance still defined
    assert got[2]["corr"] is None and got[2]["covar_samp"] == 0.0


def test_integer_pair_stats_survives_int64_overflow(spark):
    """ADVICE r7: sum(x*x) as a Spark long wraps silently past int64;
    the decimal(38,0) sums must carry the exact value (mirroring the
    DuckDB oracle's HUGEINT promotion)."""
    from gem_data_wrangle_spark.operators.stats import integer_pair_stats

    big = 10 ** 9  # x*x = 1e18 each; 20 rows -> 2e19 > int64 max
    df = spark.createDataFrame(
        [(1, big, 1)] * 20, "g bigint, x long, y long"
    )
    row = integer_pair_stats(df, ["g"], "x", "y").collect()[0]
    assert int(row["sum_xx"]) == 20 * big * big  # exact, not wrapped
    assert int(row["sum_x"]) == 20 * big
    assert row["corr"] is None  # zero variance both sides


def test_equal_width_histogram_quoted_column_name(spark):
    """ADVICE r7: a column name needing backticks (space/hyphen) must
    survive the expr fragment."""
    from gem_data_wrangle_spark.operators.stats import equal_width_histogram

    df = spark.createDataFrame([(1, 5), (1, 95)], ["g", "odd name"])
    got = {r["bin_idx"]: r["n_rows"] for r in
           equal_width_histogram(df, ["g"], "odd name",
                                 n_bins=10, lo=0, hi=100).collect()}
    assert got == {0: 1, 9: 1}


def test_salted_join_rejects_small_side_preserving_how(spark):
    """ADVICE r7: how='right'/'full' would emit one null-extended row
    per unmatched small-side REPLICA (num_salts duplicates)."""
    import pytest as _pytest

    from gem_data_wrangle_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, "x")], "k bigint, v string")
    small = spark.createDataFrame([(2, "y")], "k2 bigint, w string")
    for how in ("right", "full", "outer", "right_outer"):
        with _pytest.raises(ValueError, match="big-side-preserving"):
            salted_join(big, small, "k", "k2", num_salts=4, how=how)
    # left: the unmatched BIG row survives exactly once
    out = salted_join(big, small, "k", "k2", num_salts=4, how="left").collect()
    assert len(out) == 1 and out[0]["w"] is None


def test_rollup_cube_reject_colliding_output_names(spark):
    import pytest as _pytest

    from gem_data_wrangle_spark.operators.aggregates import (
        cube_aggregate,
        rollup_aggregate,
    )

    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    for fn in (rollup_aggregate, cube_aggregate):
        for bad in ("k", "g_k", "n_rows"):
            with _pytest.raises(ValueError, match="collide"):
                fn(df, ["k"], {bad: "v"})
    assert rollup_aggregate(df, ["k"], {"total_v": "v"}).count() == 2


def test_equal_width_histogram_edges_and_clamp(spark):
    import pytest as _pytest

    from gem_data_wrangle_spark.operators.stats import equal_width_histogram

    df = spark.createDataFrame(
        [(1, -5), (1, 0), (1, 9), (1, 10), (1, 99), (1, 100), (1, 250)],
        "g bigint, v long",
    )
    got = {r["bin_idx"]: r for r in
           equal_width_histogram(df, ["g"], "v", n_bins=10, lo=0, hi=100)
           .collect()}
    assert got[0]["n_rows"] == 3  # -5 clamps in, 0 and 9 land
    assert got[1]["n_rows"] == 1  # 10
    assert got[9]["n_rows"] == 3  # 99 lands, 100 and 250 clamp
    assert got[9]["bin_lo"] == 90
    with _pytest.raises(ValueError):
        equal_width_histogram(df, ["g"], "v", n_bins=7, lo=0, hi=100)


def test_impute_group_median_and_winsorize(spark):
    from gem_data_wrangle_spark.operators.aggregates import (
        impute_group_median,
        winsorize,
    )

    df = spark.createDataFrame(
        [(0, "a", 1.0), (1, "a", 3.0), (2, "a", None), (3, "a", 100.0),
         (4, "b", None), (5, "b", None)],  # group b: ALL NULL
        "id bigint, g string, v double",
    )
    imp = {r["id"]: r["v"] for r in
           impute_group_median(df, ["g"], "v").collect()}
    assert imp[2] == 3.0       # median of {1, 3, 100}
    assert imp[0] == 1.0 and imp[3] == 100.0  # untouched
    assert imp[4] is None and imp[5] is None  # all-NULL group stays NULL

    w = spark.createDataFrame(
        [(i, "a", float(i)) for i in range(1, 21)] + [(99, "a", None)],
        "id bigint, g string, v double",
    )
    got = {r["id"]: r["vw"] for r in
           winsorize(w, ["g"], "v", 5, 95, out_col="vw").collect()}
    # p5 of 1..20 = 1.95, p95 = 19.05 (linear interpolation)
    assert got[1] == 1.95 and got[20] == 19.05
    assert got[10] == 10.0     # interior values untouched
    assert got[99] is None     # NULL passes through


def test_rrf_fuse_fixed_order_and_absent_ids(spark):
    from gem_data_wrangle_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "id bigint, rank int")
    b = spark.createDataFrame([(3, 1), (4, 2)], "id bigint, rank int")
    got = {r["id"]: r for r in
           rrf_fuse({"a": a, "b": b}, "id", k=60).collect()}
    assert got[3]["rrf_score"] == round(1.0 / 63 + 1.0 / 61, 6)
    # id absent from a system contributes exactly 0, never NULL
    assert got[1]["rrf_score"] == round(1.0 / 61, 6)
    assert got[4]["rrf_score"] == round(1.0 / 62, 6)
    assert got[4]["rank_a"] is None and got[4]["rank_b"] == 2
    assert set(got) == {1, 2, 3, 4}  # full outer union of both lists
    # the shared id outranks every single-system id
    best = max(got.values(), key=lambda r: r["rrf_score"])
    assert best["id"] == 3


@pytest.mark.slow
def test_stream_hll_equals_batch_sketch(spark, tmp_path):
    """readStream → windowed HLL registers → memory sink across
    multiple micro-batches must yield the IDENTICAL register table (and
    therefore estimate) as batch-sketching the same rows — the
    max-merge streaming-state property."""
    import datetime as dt

    from pyspark.sql import functions as F

    from gem_data_wrangle_spark.operators.sketches import (
        hll_estimate,
        hll_window_registers,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows1 = [(t0 + dt.timedelta(seconds=i), "a", i % 37) for i in range(200)]
    rows2 = [(t0 + dt.timedelta(seconds=i), "a", i % 53) for i in range(200)]
    schema = "ts timestamp, g string, v bigint"
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "overwrite"
    ).json(str(src / "b1"))

    stream = spark.readStream.schema(schema).json(str(src / "*"))
    regs = hll_window_registers(
        stream, "ts", "10 minutes", ["g"], "v", watermark="1 minute"
    )
    q = (
        regs.writeStream.format("memory")
        .queryName("hllregs")
        .outputMode("complete")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
            "overwrite"
        ).json(str(src / "b2"))
        q.processAllAvailable()
        streamed = spark.sql("SELECT * FROM hllregs")
        batch = hll_window_registers(
            spark.createDataFrame(rows1 + rows2, schema),
            "ts", "10 minutes", ["g"], "v",
        )
        s_regs = {(r["_reg"]): r["_m"] for r in streamed.collect()}
        b_regs = {(r["_reg"]): r["_m"] for r in batch.collect()}
        assert s_regs == b_regs and len(s_regs) > 0
        est_s = hll_estimate(streamed, ["window_start", "g"]).collect()[0]
        est_b = hll_estimate(batch, ["window_start", "g"]).collect()[0]
        assert est_s["hll_numerator"] == est_b["hll_numerator"]
        # 53 distinct values; LC branch keeps small counts near-exact
        assert abs(est_s["hll_estimate"] - 53) / 53 < 0.30
    finally:
        q.stop()


def test_salted_join_equals_plain_join(spark):
    from pyspark.sql import functions as F

    from gem_data_wrangle_spark.operators.skew import salted_join

    # hot key: 90% of big-side rows share key 1
    big = spark.range(0, 2000).select(
        F.col("id").alias("rid"),
        F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id") % 50).alias("k"),
    )
    small = spark.range(0, 50).select(
        F.col("id").alias("sk"), (F.col("id") * 7).alias("payload")
    )
    salted = salted_join(big, small, "k", "sk", num_salts=8)
    plain = big.join(small, big["k"] == small["sk"]).drop("sk")
    assert sorted(salted.columns) == sorted(plain.columns)
    s = {tuple(r) for r in salted.collect()}
    p = {tuple(r) for r in plain.collect()}
    assert s == p and len(s) == 2000  # every big row matched exactly once
    # left-join variant keeps unmatched rows
    big2 = big.union(spark.createDataFrame([(9999, 999)], "rid bigint, k bigint"))
    lj = salted_join(big2, small, "k", "sk", num_salts=4, how="left")
    rows = {r["rid"]: r["payload"] for r in lj.collect()}
    assert rows[9999] is None and len(rows) == 2001


def test_cube_aggregate_cross_cuts(spark):
    from gem_data_wrangle_spark.operators.aggregates import cube_aggregate

    df = spark.createDataFrame(
        [("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 4.0)],
        "k1 string, k2 string, v double",
    )
    rows = {(r["k1"], r["k2"], r["g_k1"], r["g_k2"]): (r["sv"], r["n_rows"])
            for r in cube_aggregate(df, ["k1", "k2"], {"sv": "v"}).collect()}
    assert rows[(None, "x", 1, 0)] == (5.0, 2)   # per-k2 cut ROLLUP lacks
    assert rows[("a", None, 0, 1)] == (3.0, 2)
    assert rows[(None, None, 1, 1)] == (7.0, 3)
    assert len(rows) == 3 + 2 + 2 + 1  # leaves + k1 cuts + k2 cuts + total


def test_table_fingerprint_order_insensitive_and_injective(spark):
    from gem_data_wrangle_spark.operators.quality import table_fingerprint

    a = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, None)], "id bigint, s string"
    )
    b = spark.createDataFrame(
        [(3, None), (1, "x"), (2, "y")], "id bigint, s string"
    )
    fa = table_fingerprint(a).collect()[0]
    fb = table_fingerprint(b).collect()[0]
    assert fa["n_rows"] == 3 and (fa["n_rows"], fa["checksum"]) == \
           (fb["n_rows"], fb["checksum"])
    # a single changed cell changes the checksum
    c = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "")], "id bigint, s string"  # NULL -> ""
    )
    assert table_fingerprint(c).collect()[0]["checksum"] != fa["checksum"]
    # injectivity: shifting a character across the field boundary
    d1 = spark.createDataFrame([("ab", "c")], "x string, y string")
    d2 = spark.createDataFrame([("a", "bc")], "x string, y string")
    assert table_fingerprint(d1).collect()[0]["checksum"] != \
           table_fingerprint(d2).collect()[0]["checksum"]


def test_table_diff_statuses(spark):
    from gem_data_wrangle_spark.operators.quality import table_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "k bigint, s string, v long",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 99), (4, None, 40), (5, "e", 50)],
        "k bigint, s string, v long",
    )
    got = {r["k"]: r["diff_status"] for r in table_diff(old, new, ["k"]).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed",
                   4: "unchanged", 5: "added"}


def test_mean_pool_embeddings_ordered_fold(spark):
    from gem_data_wrangle_spark.operators.similarity import (
        mean_pool_embeddings,
    )

    df = spark.createDataFrame(
        [(1, 2, [1.0, 5.0]), (1, 1, [3.0, 1.0]), (1, 3, [2.0, 0.0]),
         (2, 1, [4.0, 4.0])],
        "doc bigint, o int, embedding array<float>",
    )
    got = {r["doc"]: r for r in
           mean_pool_embeddings(df, "doc", "o", "embedding").collect()}
    assert got[1]["n_chunks"] == 3
    assert got[1]["mean_embedding"] == [2.0, 2.0]
    assert got[2]["mean_embedding"] == [4.0, 4.0]
