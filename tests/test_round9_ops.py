"""Unit tests for the round-9 operators: triangle counting, mergeable
histogram quantiles, constraint validation, windowed distinct, item
co-occurrence lift."""

import itertools
import random

import pytest
from pyspark.sql import functions as F


def test_triangle_count_k4_and_random_vs_bruteforce(spark):
    from gem_data_wrangle_spark.operators.graph import triangle_count

    # K4: four triangles, every node in C(3,2)=3 of them
    e = spark.createDataFrame(
        [(a, b) for a, b in itertools.combinations(range(4), 2)],
        "src long, dst long",
    )
    got = sorted((r["node"], r["n_triangles"]) for r in triangle_count(e).collect())
    assert got == [(0, 3), (1, 3), (2, 3), (3, 3)]

    # random graph, fed with direction flips + self-loops + dupes:
    # canonicalization must absorb them all
    random.seed(7)
    edges = set()
    for _ in range(120):
        a, b = random.randrange(20), random.randrange(20)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    adj = {n: set() for n in range(20)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want = {}
    for x, y, z in itertools.combinations(range(20), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for n in (x, y, z):
                want[n] = want.get(n, 0) + 1
    rows = list(edges) + [(b, a) for a, b in list(edges)[:40]] + [(3, 3)]
    e2 = spark.createDataFrame(rows, "src long, dst long")
    got2 = {r["node"]: r["n_triangles"] for r in triangle_count(e2).collect()}
    assert got2 == want


def test_triangle_count_no_triangles(spark):
    from gem_data_wrangle_spark.operators.graph import triangle_count

    # a path graph has zero triangles -> empty result
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    assert triangle_count(e).count() == 0


def test_histogram_quantiles_bracket_contains_exact_value(spark):
    from gem_data_wrangle_spark.operators.sketches import histogram_quantiles

    random.seed(11)
    rows = [("g1", random.randrange(0, 1000)) for _ in range(500)]
    rows += [("g2", random.randrange(200, 400)) for _ in range(77)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {
        r["g"]: r
        for r in histogram_quantiles(
            df, ["g"], "v", n_bins=20, lo=0, hi=1000, percents=(50, 95)
        ).collect()
    }
    by_g = {"g1": sorted(v for g, v in rows if g == "g1"),
            "g2": sorted(v for g, v in rows if g == "g2")}
    for g, vals in by_g.items():
        n = len(vals)
        assert out[g]["n_values"] == n
        for p in (50, 95):
            exact = vals[(n - 1) * p // 100]  # rank r_p, 0-indexed
            lo, hi = out[g][f"p{p}_lo"], out[g][f"p{p}_hi"]
            assert lo <= exact < hi, (g, p, exact, lo, hi)
            assert hi - lo == 50  # one bin width


def test_histogram_quantiles_rejects_uneven_bins(spark):
    from gem_data_wrangle_spark.operators.sketches import histogram_quantiles

    df = spark.createDataFrame([("a", 1)], "g string, v long")
    with pytest.raises(ValueError):
        histogram_quantiles(df, ["g"], "v", n_bins=3, lo=0, hi=10)


def test_validate_constraints_all_rule_kinds(spark):
    from gem_data_wrangle_spark.operators.quality import validate_constraints

    df = spark.createDataFrame(
        [
            (1, "a@x.com", 10, "US", "k1"),
            (2, None, 700, "US", "k2"),       # null email, out-of-range v
            (3, "bad-email", 50, "ZZ", "k1"),  # regex fail, bad country, dup k1
            (4, "c@y.org", -5, "DE", None),    # out-of-range low, null fk (ok)
        ],
        "id long, email string, v long, country string, fk string",
    )
    ref = spark.createDataFrame([("k1",), ("k3",)], "key string")
    rules = [
        {"rule": "not_null", "column": "email"},
        {"rule": "in_range", "column": "v", "lo": 0, "hi": 500},
        {"rule": "regex", "column": "email", "pattern": r"^[^@]+@[^@]+\.[a-z]+$"},
        {"rule": "in_set", "column": "country", "values": ["US", "DE", "FR"]},
        {"rule": "unique", "columns": ["fk"]},
        {"rule": "foreign_key", "column": "fk", "ref": ref, "ref_column": "key"},
    ]
    out = {r["rule_id"]: r for r in validate_constraints(df, rules).collect()}
    assert out["r0"]["n_violations"] == 1          # one null email
    assert out["r1"]["n_violations"] == 2          # 700 and -5
    assert out["r2"]["n_violations"] == 1          # bad-email (nulls skipped)
    assert out["r3"]["n_violations"] == 1          # ZZ
    assert out["r4"]["n_violations"] == 1          # k1 twice -> 1 surplus
    assert out["r5"]["n_violations"] == 1          # k2 missing (null fk ok)
    assert all(r["n_rows"] == 4 for r in out.values())
    assert len(out) == 6


def test_validate_constraints_unknown_rule_raises(spark):
    from gem_data_wrangle_spark.operators.quality import validate_constraints

    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="unknown rule"):
        validate_constraints(df, [{"rule": "nope", "column": "id"}])


def test_windowed_distinct_count_batch(spark):
    from gem_data_wrangle_spark.streaming.windows import windowed_distinct_count

    rows = [
        ("2024-01-01 00:05:00", "u1", "web"),
        ("2024-01-01 00:20:00", "u1", "web"),   # same user+window -> 1
        ("2024-01-01 00:40:00", "u2", "web"),
        ("2024-01-01 01:10:00", "u1", "web"),   # next window
        ("2024-01-01 00:30:00", "u1", "app"),   # other group
    ]
    df = spark.createDataFrame(rows, "ts string, user string, src string").select(
        F.col("ts").cast("timestamp").alias("ts"), "user", "src"
    )
    out = {
        (str(r["window_start"]), r["src"]): r["n_distinct"]
        for r in windowed_distinct_count(
            df, "ts", "1 hour", "user", group_cols=["src"]
        ).collect()
    }
    assert out == {
        ("2024-01-01 00:00:00", "web"): 2,
        ("2024-01-01 01:00:00", "web"): 1,
        ("2024-01-01 00:00:00", "app"): 1,
    }


def test_windowed_distinct_count_streaming_plan_builds(spark, tmp_path):
    """The streaming form (watermark + chained stateful dedup->agg)
    must at least pass analysis in append mode."""
    from gem_data_wrangle_spark.streaming.windows import windowed_distinct_count

    src = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .select(
            F.col("timestamp").alias("ts"),
            (F.col("value") % 5).alias("user"),
        )
    )
    out = windowed_distinct_count(
        src, "ts", "10 seconds", "user", watermark="30 seconds"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("wdc_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        assert q.isActive
    finally:
        q.stop()


def test_cooccurrence_lift_exact_counts(spark):
    from gem_data_wrangle_spark.operators.stats import cooccurrence_lift

    rows = [
        ("u1", "a"), ("u1", "b"), ("u1", "a"),   # dup presence collapses
        ("u2", "a"), ("u2", "b"),
        ("u3", "a"),
        ("u4", "c"), ("u4", "b"),
    ]
    df = spark.createDataFrame(rows, "k string, item string")
    out = {
        (r["item_a"], r["item_b"]): r
    for r in cooccurrence_lift(df, "k", "item").collect()
    }
    ab = out[("a", "b")]
    assert (ab["n_both"], ab["n_a"], ab["n_b"]) == (2, 3, 3)
    # lift = n_keys*n_both/(n_a*n_b) = 4*2/9
    assert ab["lift"] == round(8 / 9, 6)
    bc = out[("b", "c")]
    assert (bc["n_both"], bc["n_a"], bc["n_b"]) == (1, 3, 1)
    assert bc["lift"] == round(4 / 3, 6)
    assert ("a", "c") not in out  # never co-occur
