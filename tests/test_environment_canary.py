"""Environment-drift canary (round 5).

The deferred-tail grading strategy fingerprints QUERY CODE — it cannot
see the environment moving underneath byte-identical code, which is
exactly what broke ``sessionize`` in round 4 (a Spark upgrade changed
parquet µs timestamps to TIMESTAMP_NTZ under ANSI casting rules).
Each assertion here pins one environmental behavior that a green
oracle row or a SCALE.md claim depends on, so the NEXT shift fails
loudly with a named cause instead of as an opaque hash mismatch.
"""

from __future__ import annotations

import pytest


def test_pyspark_major_version():
    import pyspark

    assert pyspark.__version__.startswith("4."), (
        f"pyspark {pyspark.__version__}: every oracle row was validated "
        "on 4.x — re-grade the deferred tail after a major upgrade"
    )


def test_duckdb_oracle_dialect_features():
    """The oracles use DuckDB list comprehensions, md5(), QUALIFY, and
    naive epoch() — pin each so an oracle-side upgrade is named."""
    import duckdb

    assert duckdb.sql(
        "SELECT [x * 2 FOR x IN [1, 2, 3]] AS l"
    ).fetchone()[0] == [2, 4, 6]
    assert duckdb.sql("SELECT md5('a')").fetchone()[0].startswith("0cc175b9")
    assert duckdb.sql(
        "SELECT x FROM (VALUES (1), (2)) t(x) "
        "QUALIFY row_number() OVER (ORDER BY x) = 1"
    ).fetchone()[0] == 1
    # naive epoch(): no session-timezone shift on TIMESTAMP values
    assert duckdb.sql(
        "SELECT epoch(TIMESTAMP '1970-01-01 00:00:10')"
    ).fetchone()[0] == 10.0


def test_spark_ansi_mode_is_on(spark):
    """Oracle float/cast parity was validated under ANSI semantics."""
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"


def test_parquet_us_timestamps_arrive_as_ntz(spark, tmp_path):
    """The r4 sessionize break, pinned: parquet µs timestamps written
    without UTC adjustment read back as TIMESTAMP_NTZ. sessionize
    derives its epoch timezone-independently for exactly this type —
    if this flips back to TimestampType, revisit that branch."""
    from pyspark.sql.types import TimestampNTZType

    p = str(tmp_path / "ntz.parquet")
    spark.sql(
        "SELECT TIMESTAMP_NTZ '2024-01-01 00:00:01' AS ts"
    ).write.mode("overwrite").parquet(p)
    assert isinstance(
        spark.read.parquet(p).schema["ts"].dataType, TimestampNTZType
    )


def test_rank1_window_plans_as_partial_group_limit(spark):
    """SCALE.md's dedup skew story rests on Spark rewriting
    row_number()==1 filters into WindowGroupLimit with a Partial
    map-side stage. If this optimizer rule disappears, the window
    dedup paths lose their skew bound — flip those call sites to
    skew_safe=True."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.range(100).withColumn("k", F.col("id") % 5)
    w = Window.partitionBy("k").orderBy("id")
    plan = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_struct_max_breaks_ties_like_the_oracles(spark):
    """repetition_signals' oracle mirrors Spark's max(struct(c, s))
    with ORDER BY c DESC, s DESC — pin that struct comparison stays
    field-order lexicographic with binary string ordering."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 2, "aa"), (1, 2, "ab"), (1, 1, "zz")], "g int, c int, s string"
    )
    top = df.groupBy("g").agg(F.max(F.struct("c", "s")).alias("t")).first()["t"]
    assert (top["c"], top["s"]) == (2, "ab")
