"""Bucketed tables for shuffle-free co-located joins (SURVEY §4).

For a join both of whose sides are large (no broadcast) and reused
across many queries, bucketing pre-shuffles the data once at write
time: both sides stored bucketed by the join key → the join needs no
exchange at read time (verify: the plan shows SortMergeJoin with no
Exchange below it). At 100 TB this converts an every-query shuffle
into a one-time write cost — the standard pattern for fact-to-fact
joins on a stable key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed managed table (bucketing requires
    ``saveAsTable``; plain path writes can't record bucket metadata)."""
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on the same key with the same bucket
    count — planner elides both exchanges."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
