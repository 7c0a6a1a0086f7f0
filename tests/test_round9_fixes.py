"""Differential tests for the round-9 ADVICE/VERDICT fixes."""

import pytest
from pyspark.sql import functions as F


def test_parse_json_lines_keeps_null_first_field_rows(spark):
    """ADVICE r8 (medium): a valid record whose FIRST schema column is
    null/absent must survive — only the all-NULL corrupt-record shape
    is quarantined."""
    from gem_data_wrangle_spark.streaming.sources import parse_json_lines

    lines = spark.createDataFrame(
        [
            ('{"a": 1, "b": "x"}',),        # fully valid
            ('{"b": "y"}',),                 # first field absent -> a null
            ('{"a": null, "b": "z"}',),      # first field explicitly null
            ("{not json",),                  # corrupt -> all-NULL -> dropped
            ('{"c": 9}',),                   # no schema fields -> all-NULL
        ],
        "value string",
    )
    out = parse_json_lines(lines, "a bigint, b string").collect()
    got = sorted(((r["a"] is None, r["a"]), r["b"]) for r in out)
    assert got == [((False, 1), "x"), ((True, None), "y"), ((True, None), "z")]


def test_bloom_prune_join_widens_mismatched_integral_keys(spark):
    """ADVICE r8 (low): int-vs-bigint keys must hash through a common
    type — results identical to the plain join (no silent drops)."""
    from gem_data_wrangle_spark.operators.joins import bloom_prune_join

    big = spark.createDataFrame([(i, f"r{i}") for i in range(100)], "k int, v string")
    small = spark.createDataFrame([(7, "A"), (42, "B")], "sk bigint, name string")
    got = sorted(
        (r["k"], r["name"])
        for r in bloom_prune_join(big, small, "k", "sk").collect()
    )
    assert got == [(7, "A"), (42, "B")]


def test_bloom_prune_join_rejects_non_integral_type_mismatch(spark):
    from gem_data_wrangle_spark.operators.joins import bloom_prune_join

    big = spark.createDataFrame([(1,)], "k int")
    small = spark.createDataFrame([("1",)], "sk string")
    with pytest.raises(ValueError, match="key types differ"):
        bloom_prune_join(big, small, "k", "sk")


def test_temperature_weights_exact_floor_at_decimal_boundary(spark):
    """ADVICE r8 (low): counts (7, 28) at budget 3 put the true
    quotient at 7937253/7937254 = 0.99999987 — above the decimal
    scale-6 HALF_UP boundary, so floor-of-rounded-quotient says 1
    while exact integer floor says 0."""
    from gem_data_wrangle_spark.operators.sampling import temperature_weights

    rows = [("a",)] * 7 + [("b",)] * 28
    df = spark.createDataFrame(rows, "d string")
    got = {r["d"]: r["target_docs"]
           for r in temperature_weights(df, "d", budget=3).collect()}
    # w_a = round(sqrt(7)*1e6) = 2645751, w_b = 5291503, tot = 7937254;
    # q_a = 0.99999987 (exact floor 0, rounded-then-floored 1),
    # q_b = 2.00000016 (floor 2 either way — b is the control)
    assert got == {"a": 0, "b": 2}


def test_temperature_weights_matches_exact_python_floor(spark):
    import math

    from gem_data_wrangle_spark.operators.sampling import temperature_weights

    counts = {"a": 3, "b": 17, "c": 400, "d": 1}
    rows = [(d,) for d, n in counts.items() for _ in range(n)]
    df = spark.createDataFrame(rows, "d string")
    for budget in (10, 97, 1000, 12345):
        w = {d: round(math.sqrt(n) * 1e6) for d, n in counts.items()}
        tot = sum(w.values())
        want = {d: (w[d] * budget) // tot for d in counts}
        got = {r["d"]: r["target_docs"]
               for r in temperature_weights(df, "d", budget=budget).collect()}
        assert got == want, budget


def test_neardup_keep_best_string_ids_tiebreak_deterministic(spark):
    """ADVICE r8 (low): with STRING ids, score ties must break on the
    LOWER id (the old -id struct yielded NULL -> nondeterministic)."""
    from gem_data_wrangle_spark.operators.dedup import neardup_keep_best

    base = "the quick brown fox jumps over the lazy dog " * 6
    rows = [
        ("doc_b", base, 5.0),          # same text, same score ->
        ("doc_a", base, 5.0),          #   doc_a must win the tie
        ("doc_c", base + "tail", 1.0),  # near-dup, lower score -> loses
        ("solo", "completely different text about spark engines", 9.0),
    ]
    df = spark.createDataFrame(rows, "id string, text string, score double")
    kept = sorted(
        r["id"]
        for r in neardup_keep_best(df, "text", "id", "score").collect()
    )
    assert "doc_a" in kept and "doc_b" not in kept
    assert "solo" in kept


def test_neardup_keep_best_plan_has_no_forced_winner_broadcast(spark):
    """VERDICT r8 item 5: the survivor stage must not broadcast a
    one-row-per-component frame (unbounded at crawl scale). The window
    -rank formulation removes the winners join entirely, so the only
    broadcasts left are the candidate stage's bounded ones — assert
    the keep_best plan adds NO broadcast over neardup_dedup's."""
    from gem_data_wrangle_spark.operators.dedup import (
        neardup_dedup,
        neardup_keep_best,
    )

    df = spark.createDataFrame(
        [(f"d{i}", f"text body number {i % 7} repeated tokens", float(i))
         for i in range(40)],
        "id string, text string, score double",
    )
    plain = neardup_dedup(df, "text", "id")._jdf.queryExecution().toString()
    best = neardup_keep_best(df, "text", "id", "score")._jdf.queryExecution().toString()
    assert best.count("BroadcastExchange") <= plain.count("BroadcastExchange")
