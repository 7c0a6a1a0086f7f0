"""Round-9 batch 4: point-in-time SCD2 lookup, last-touch attribution."""

import pytest

import datetime as dt

from pyspark.sql import functions as F


def _hist(spark):
    from gem_data_wrangle_spark.operators.kernels import scd2_from_snapshots

    snaps = spark.createDataFrame(
        [
            (1, "2024-01-01", "GOLD"),
            (1, "2024-02-01", "GOLD"),      # unchanged -> same interval
            (1, "2024-03-01", "SILVER"),
            (2, "2024-02-01", "BASIC"),
        ],
        "cust long, snap string, tier string",
    ).select("cust", F.col("snap").cast("date").alias("snap"), "tier")
    return scd2_from_snapshots(snaps, ["cust"], "snap", ["tier"])


def test_scd2_lookup_point_in_time(spark):
    from gem_data_wrangle_spark.operators.asof import scd2_lookup

    facts = spark.createDataFrame(
        [
            (100, 1, "2024-01-15"),  # inside first GOLD interval
            (101, 1, "2024-03-20"),  # current SILVER interval (open end)
            (102, 1, "2023-12-01"),  # before any interval -> NULL
            (103, 1, "2024-03-01"),  # boundary: valid_from inclusive
            (104, 2, "2024-06-01"),
        ],
        "fid long, cust long, d string",
    ).select("fid", "cust", F.col("d").cast("date").alias("d"))
    got = {
        r["fid"]: r["tier"]
        for r in scd2_lookup(facts, _hist(spark), ["cust"], "d", ["tier"]).collect()
    }
    assert got == {100: "GOLD", 101: "SILVER", 102: None,
                   103: "SILVER", 104: "BASIC"}
    # non-overlap contract => exactly one output row per fact
    assert len(got) == 5


def test_scd2_lookup_no_future_leak(spark):
    """The whole point: a fact must NEVER see attributes from a later
    interval (joining today's dim would say SILVER for January)."""
    from gem_data_wrangle_spark.operators.asof import scd2_lookup

    facts = spark.createDataFrame(
        [(1, 1, "2024-01-15")], "fid long, cust long, d string"
    ).select("fid", "cust", F.col("d").cast("date").alias("d"))
    out = scd2_lookup(facts, _hist(spark), ["cust"], "d", ["tier"]).collect()
    assert out[0]["tier"] == "GOLD"


def test_last_touch_attribution_lookback(spark):
    from gem_data_wrangle_spark.operators.asof import last_touch_attribution

    conv = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 10, 12), "c1"),  # ad_A 2h before
            (2, dt.datetime(2024, 1, 10, 12), "c2"),  # only a 3-day-old touch
        ],
        "u long, ts timestamp, cid string",
    )
    touch = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 10, 10), "ad_A"),
            (1, dt.datetime(2024, 1, 9, 10), "ad_B"),
            (2, dt.datetime(2024, 1, 7, 12), "ad_C"),
        ],
        "u long, ts timestamp, campaign string",
    )
    got = {
        r["cid"]: r["campaign_touch"]
        for r in last_touch_attribution(
            conv, touch, ["u"], "ts", ["campaign"],
            lookback=F.expr("INTERVAL 24 HOURS"),
        ).collect()
    }
    assert got == {"c1": "ad_A", "c2": None}  # stale touch nulled


def test_windowed_distinct_stream_matches_batch(spark, tmp_path):
    """Real micro-batch run of the chained dedup->count: stream over a
    parquet source with availableNow must produce the batch answer for
    closed windows (append mode emits only watermark-expired state)."""
    import datetime as dt

    from gem_data_wrangle_spark.streaming.windows import (
        windowed_distinct_count,
    )

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i in range(40):
        rows.append((i, base + dt.timedelta(minutes=3 * i), i % 7))
    # late sentinel far ahead so every earlier window closes
    rows.append((99, base + dt.timedelta(hours=12), 0))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user long")
    batch = {
        str(r["window_start"]): r["n_distinct"]
        for r in windowed_distinct_count(df, "ts", "1 hour", "user").collect()
    }

    src = str(tmp_path / "wd_src")
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user long"
    ).parquet(src)
    out = windowed_distinct_count(
        stream, "ts", "1 hour", "user", watermark="0 seconds"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("t_wdc")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "wd_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        str(r["window_start"]): r["n_distinct"]
        for r in spark.sql("SELECT * FROM t_wdc").collect()
    }
    # every CLOSED window (all except the sentinel's own) must match
    closed = {k: v for k, v in batch.items() if not k.startswith("2024-01-01 12")}
    assert got == closed or got == batch  # sentinel window may also flush


def test_kmv_estimate_accuracy_and_exact_small_groups(spark):
    from gem_data_wrangle_spark.operators.sketches import (
        kmv_estimate,
        kmv_sketch,
    )

    rows = [("big", f"user{i}") for i in range(5000)]
    rows += [("small", f"user{i}") for i in range(40)]
    df = spark.createDataFrame(rows * 2, "g string, v string")  # dupes collapse
    est = {
        r["g"]: r
        for r in kmv_estimate(kmv_sketch(df, ["g"], "v", k=256), ["g"], k=256).collect()
    }
    # sub-threshold group is EXACT
    assert est["small"]["est_distinct"] == 40.0
    assert est["small"]["n_hashes"] == 40
    # k=256 -> ~6% standard error; allow 4 sigma
    assert abs(est["big"]["est_distinct"] - 5000) < 5000 * 0.25
    assert est["big"]["n_hashes"] == 256


def test_kmv_intersection_estimate(spark):
    from gem_data_wrangle_spark.operators.sketches import (
        kmv_intersect_estimate,
        kmv_sketch,
    )

    a = spark.createDataFrame([(f"user{i}",) for i in range(5000)], "v string")
    b = spark.createDataFrame(
        [(f"user{i}",) for i in range(2500, 7500)], "v string"
    )

    def sk(d):
        return kmv_sketch(d.selectExpr("1 as g", "v"), ["g"], "v", k=256).drop("g")

    r = kmv_intersect_estimate(sk(a), sk(b), k=256).collect()[0]
    assert abs(r["est_intersection"] - 2500) < 2500 * 0.3
    # exact tiny sides: theta stays at the full space, count is exact
    sa = sk(spark.createDataFrame([("x",), ("y",), ("z",)], "v string"))
    sb = sk(spark.createDataFrame([("y",), ("z",), ("w",)], "v string"))
    r2 = kmv_intersect_estimate(sa, sb, k=256).collect()[0]
    assert r2["est_intersection"] == 2.0
    assert r2["theta"] == 1 << 48
    # disjoint sides -> zero estimate, theta still reported
    sc_ = sk(spark.createDataFrame([("p",), ("q",)], "v string"))
    r3 = kmv_intersect_estimate(sa, sc_, k=256).collect()[0]
    assert r3["est_intersection"] == 0.0 and r3["theta"] == 1 << 48


def test_simhash_candidate_pairs_finds_neardups(spark):
    from gem_data_wrangle_spark.operators.dedup import (
        simhash_candidate_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (1, base),
        (2, base),  # identical -> hamming 0
        (3, base.replace("lazy", "sleepy")),  # one-shingle edit
        (4, "completely different text about spark shuffle partitions and joins"),
        (5, "short"),  # < ngram tokens: excluded from signatures
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_candidate_pairs(
            df, "text", "doc_id", bits=32, max_distance=2
        ).collect()
    }
    # identical docs must appear at distance 0 (banding has no false
    # negatives for d <= max_distance)
    assert got[(1, 2)] == 0
    # every reported pair respects the distance bound and ordering
    assert all(a < b and h <= 2 for (a, b), h in got.items())
    # the short doc never pairs
    assert all(5 not in p for p in got)


def test_simhash_candidate_pairs_validates_args(spark):
    import pytest as _pt

    from gem_data_wrangle_spark.operators.dedup import (
        simhash_candidate_pairs,
    )

    df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    with _pt.raises(ValueError):
        simhash_candidate_pairs(df, "text", "doc_id", bits=2, max_distance=3)


def test_mad_outliers_flags_and_mad_zero_fallback(spark):
    from gem_data_wrangle_spark.operators.stats import mad_outliers

    rows = [
        ("a", i, v)
        for i, v in enumerate([10.0, 10.2, 9.9, 10.1, 10.0, 10.3, 9.8, 50.0])
    ]
    # >= half identical values -> MAD = 0: rz undefined, any nonzero
    # deviation flags directly
    rows += [("b", 100 + i, 5.0) for i in range(4)] + [("b", 104, 7.0)]
    df = spark.createDataFrame(rows, "g string, id int, v double")
    out = {
        r["id"]: r
        for r in mad_outliers(df, ["g"], "id", "v").collect()
    }
    assert [i for i in out if out[i]["is_outlier"] == 1] == [7, 104]
    # group a: med=10.05, MAD (of devs in cents*100) is exact; the
    # inlier band carries finite rz_milli
    assert out[0]["rz_milli"] == 224 and out[5]["rz_milli"] == 1124
    assert out[104]["rz_milli"] is None and out[104]["abs_dev"] == 2.0
    # robustness: the 50.0 outlier did not drag the gate open for
    # ordinary inliers (mean/stddev z-score would have)
    assert all(out[i]["is_outlier"] == 0 for i in range(7))


def test_label_propagation_separates_two_cliques(spark):
    from gem_data_wrangle_spark.operators.graph import label_propagation

    # two 4-cliques bridged by one edge; self-loop and duplicate edge
    # must be ignored
    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = c1 + c2 + [(3, 10), (5, 5), (0, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["community"]
        for r in label_propagation(df, "src", "dst", iterations=3).collect()
    }
    # each clique converges to ONE label (min id in the clique wins the
    # tie-breaks), and the two communities stay distinct
    assert len({got[n] for n in range(4)}) == 1
    assert len({got[n] for n in range(10, 14)}) == 1
    assert got[0] != got[10]
    # the isolated self-loop node never enters the graph
    assert 5 not in got


def test_jl_project_int_deterministic_and_exact(spark):
    from gem_data_wrangle_spark.operators.similarity import (
        jl_project_int,
        jl_sign,
    )

    rows = [
        (1, [1.0, 0.0, -1.0, 0.5]),
        (2, [1.0, 0.0, -1.0, 0.5]),  # duplicate vector
        (3, [0.0, 0.0, 0.0, 0.0]),   # all-zero quantizes to zeros
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = jl_project_int(df, "embedding", "vec_id", in_dim=4, out_dim=3)
    got = {r["vec_id"]: [r[f"y{k}"] for k in range(3)] for r in out.collect()}
    # identical inputs -> identical sketches; zero vector -> zero sketch
    assert got[1] == got[2]
    assert got[3] == [0, 0, 0]
    # replay one coordinate by hand: q = round(x*127/max|x|) then the
    # literal sign chain
    q = [127, 0, -127, 64]
    expect = sum(jl_sign("jl", 0, j) * q[j] for j in range(4))
    assert got[1][0] == expect
    # the sign matrix is genuinely mixed (not all +1)
    signs = {jl_sign("jl", k, j) for k in range(3) for j in range(4)}
    assert signs == {1, -1}

    import pytest as _pt

    with _pt.raises(ValueError):
        jl_project_int(df, "embedding", "vec_id", in_dim=0)


def test_degree_assortativity_signs(spark):
    from gem_data_wrangle_spark.operators.graph import degree_assortativity

    # star graph: hub degree 5, leaves degree 1 -> strongly
    # disassortative (corr = -1 exactly for a star)
    star = [(0, i) for i in range(1, 6)]
    r = degree_assortativity(
        spark.createDataFrame(star, "src long, dst long"), "src", "dst"
    ).collect()[0]
    assert r["n"] == 10  # 5 undirected edges, both orientations
    assert float(r["corr"]) == -1.0
    # regular graph (cycle): every degree equal -> zero variance,
    # corr NULL by the integer_pair_stats guard
    cyc = [(i, (i + 1) % 6) for i in range(6)]
    r2 = degree_assortativity(
        spark.createDataFrame(cyc, "src long, dst long"), "src", "dst"
    ).collect()[0]
    assert r2["corr"] is None and r2["n"] == 12


def test_rank_normalize_ppm_and_buckets(spark):
    from gem_data_wrangle_spark.operators.stats import rank_normalize

    rows = [("g", i, float(v)) for i, v in enumerate([10, 20, 20, 30, 40])]
    rows += [("solo", 99, 7.0)]
    df = spark.createDataFrame(rows, "g string, id int, v double")
    got = {
        r["id"]: (r["pr_ppm"], r["bucket"])
        for r in rank_normalize(df, ["g"], "id", "v", n_buckets=4).collect()
    }
    # ranks: 10->1, 20->2 (BOTH ties share), 30->4, 40->5; n=5
    assert got[0] == (0, 0)
    assert got[1] == got[2] == (250000, 0)   # (2-1)/4 = 0.25; bucket 4*1//5
    assert got[3] == (750000, 2)
    assert got[4] == (1000000, 3)
    # single-row group normalizes to 0
    assert got[99] == (0, 0)


def test_minhash_containment_join_estimates(spark):
    from gem_data_wrangle_spark.operators.dedup import (
        minhash_containment_join,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta"
    ref = spark.createDataFrame([(100, base)], "doc_id int, text string")
    corpus = spark.createDataFrame(
        [
            (1, base),  # identical: J = C = 1 exactly (all slots match)
            (2, "alpha beta gamma delta epsilon plus extra words here"),
            (3, "totally unrelated content with no shared shingles"),
        ],
        "doc_id int, text string",
    )
    got = {
        r["corpus_id"]: r
        for r in minhash_containment_join(
            corpus, ref, "text", "doc_id", k=16
        ).collect()
    }
    assert got[1]["n_matches"] == 16
    assert got[1]["jaccard_ppm"] == 1_000_000
    assert got[1]["containment_ppm"] == 1_000_000  # clamped exact
    # partial overlap: some but not all slots match, estimates inside
    # (0, 1) and containment >= jaccard (|A∩B|/|A| >= |A∩B|/|A∪B|)
    assert 0 < got[2]["n_matches"] < 16
    assert got[2]["containment_ppm"] >= got[2]["jaccard_ppm"]
    # disjoint docs never pair
    assert 3 not in got

    import pytest as _pt

    with _pt.raises(ValueError):
        minhash_containment_join(corpus, ref, "text", "doc_id", k=0)


def test_ewma_values_exact_halving(spark):
    from gem_data_wrangle_spark.operators.asof import ewma_values

    rows = [("k", i, i, 10.0 if i < 5 else 20.0) for i in range(1, 9)]
    rows += [("k", 9, 9, None)]  # NULL excluded from the population
    df = spark.createDataFrame(rows, "k string, ts long, id long, v double")
    got = {
        r["id"]: r["ewma_milli"]
        for r in ewma_values(df, "k", "ts", "v", "id", window_rows=30).collect()
    }
    assert got[1] == 10000
    # s5 = (16*20000 + (8+4+2+1)*10000) // 31
    assert got[5] == (16 * 20000 + 15 * 10000) // 31
    assert 9 not in got
    # converging toward the new level from below, monotone
    assert 10000 < got[5] < got[6] < got[7] < got[8] < 20000

    import pytest as _pt

    with _pt.raises(ValueError):
        ewma_values(df, "k", "ts", "v", "id", window_rows=63)


def test_bmp_probe_roundtrip_and_quarantine(spark):
    from gem_data_wrangle_spark.operators.bmp_codec import (
        bmp_probe,
        bmp_stride,
        build_bmp,
    )

    b24 = build_bmp(5, 3, bpp=24)
    b8 = build_bmp(5, 3, bpp=8, top_down=True)
    assert len(b24) == 54 + bmp_stride(5, 24) * 3
    assert len(b8) == 54 + 1024 + bmp_stride(5, 8) * 3
    rows = [
        (1, b24),
        (2, b8),
        (3, b"JUNK"),        # wrong magic / too short
        (4, b24[:30]),       # header itself cut -> not_bmp
        (5, b24[:60]),       # pixels cut -> truncated, header fields live
    ]
    df = spark.createDataFrame(rows, "id long, media binary")
    got = {r["id"]: r for r in bmp_probe(df).collect()}
    assert got[1]["probe_status"] == "ok"
    assert (got[1]["width"], got[1]["height"], got[1]["bpp"]) == (5, 3, 24)
    assert got[1]["row_stride"] == 16 and got[1]["n_pixel_bytes"] == 48
    assert got[2]["data_offset"] == 1078 and got[2]["palette_colors"] == 256
    assert got[2]["top_down"] == 1
    assert got[3]["probe_status"] == "not_bmp"
    assert got[4]["probe_status"] == "not_bmp"
    assert got[5]["probe_status"] == "truncated"
    assert got[5]["width"] == 5 and got[5]["n_pixel_bytes"] is None

    import pytest as _pt

    with _pt.raises(ValueError):
        build_bmp(0, 3)
    with _pt.raises(ValueError):
        build_bmp(3, 3, bpp=4)


def test_benford_profile_constants_and_floors(spark):
    import math

    from gem_data_wrangle_spark.operators.quality import (
        BENFORD_PPM,
        benford_profile,
    )

    # the nine expectations are exactly floor(1e6*log10(1+1/d))
    assert BENFORD_PPM[1] == int(1_000_000 * math.log10(2))
    assert sum(BENFORD_PPM.values()) in range(999_990, 1_000_001)

    # 3 values lead with 1, 1 with 9; zero and negative are excluded
    rows = [("g", v) for v in [1.5, 12.0, 199.99, 9.0, 0.0, -5.0]]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["digit"]: r for r in benford_profile(df, ["g"], "v").collect()}
    assert set(got) == {1, 9}
    assert got[1]["n_rows"] == 3 and got[9]["n_rows"] == 1
    assert got[1]["obs_ppm"] == 750_000  # 3/4 exactly
    assert got[9]["obs_ppm"] == 250_000
    assert got[1]["benford_ppm"] == 301_029
    assert got[1]["dev_ppm"] == 750_000 - 301_029


def test_cm_sketch_bounds_and_merge(spark):
    from pyspark.sql import functions as F

    from gem_data_wrangle_spark.operators.sketches import (
        cm_estimate,
        cm_sketch,
    )

    rows = [("a",)] * 50 + [("b",)] * 10 + [("c",)]
    df = spark.createDataFrame(rows, "v string")
    sk = cm_sketch(df, "v", width=64, depth=4)
    probes = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("zzz",)], "v string"
    )
    est = {
        r["v"]: r["est_count"]
        for r in cm_estimate(sk, probes, "v", width=64, depth=4).collect()
    }
    # never-underestimate bound; unseen value -> exact zero
    assert est["a"] >= 50 and est["b"] >= 10 and est["c"] >= 1
    assert est["zzz"] == 0
    # mergeability: cell-sum of two shard sketches == one-shot sketch
    h1 = df.limit(30)
    h2 = df.exceptAll(h1)
    merged = (
        cm_sketch(h1, "v", 64, 4)
        .unionByName(cm_sketch(h2, "v", 64, 4))
        .groupBy("depth", "bucket")
        .agg(F.sum("count").alias("count"))
    )
    full = cm_sketch(df, "v", 64, 4)
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0

    import pytest as _pt

    with _pt.raises(ValueError):
        cm_sketch(df, "v", width=1)


def test_label_propagation_string_node_ids(spark):
    from gem_data_wrangle_spark.operators.graph import label_propagation

    # REAL host graphs key on strings; the vote's tie-break must not
    # negate the label (unary minus on a string is NULL/ANSI error)
    c1 = [(f"a{a}", f"a{b}") for a in range(4) for b in range(4) if a < b]
    c2 = [(f"b{a}", f"b{b}") for a in range(4) for b in range(4) if a < b]
    df = spark.createDataFrame(
        c1 + c2 + [("a3", "b0")], "src string, dst string"
    )
    got = {
        r["node"]: r["community"]
        for r in label_propagation(df, "src", "dst", iterations=3).collect()
    }
    assert len({got[f"a{i}"] for i in range(4)}) == 1
    assert len({got[f"b{i}"] for i in range(4)}) == 1
    assert got["a0"] != got["b1"]


@pytest.mark.slow
def test_weighted_pagerank_shifts_rank_toward_heavy_edges(spark):
    from gem_data_wrangle_spark.operators.graph import pagerank

    # star out of 0: edge 0->1 carries 9x the weight of 0->2; node 1
    # must outrank node 2, while the uniform run ties them
    edges = spark.createDataFrame(
        [(0, 1, 9.0), (0, 2, 1.0), (1, 0, 1.0), (2, 0, 1.0)],
        "src long, dst long, w double",
    )
    wr = {
        r["node"]: r["rank"]
        for r in pagerank(edges, "src", "dst", iterations=5,
                          weight_col="w").collect()
    }
    ur = {
        r["node"]: r["rank"]
        for r in pagerank(edges, "src", "dst", iterations=5).collect()
    }
    assert wr[1] > wr[2]
    assert abs(ur[1] - ur[2]) < 1e-12
    # rank mass conserved in both modes
    assert abs(sum(wr.values()) - 1.0) < 1e-9
    assert abs(sum(ur.values()) - 1.0) < 1e-9
    # non-positive weights are excluded (the surfer can't cross them)
    e2 = spark.createDataFrame(
        [(0, 1, 1.0), (0, 2, 0.0), (1, 0, 1.0), (2, 0, 1.0)],
        "src long, dst long, w double",
    )
    wr2 = {
        r["node"]: r["rank"]
        for r in pagerank(e2, "src", "dst", iterations=3,
                          weight_col="w").collect()
    }
    assert wr2[1] > wr2[2]
