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


def zorder_key(
    df: DataFrame,
    int_cols: list[str],
    bits: int = 16,
    out_col: str = "_zorder",
) -> DataFrame:
    """Morton (Z-order) interleave key over INTEGER columns — the
    write-time clustering that makes MULTI-column predicates skippable:
    sorting by ``(a, b)`` gives perfect min/max pruning on ``a`` and
    none on ``b``; sorting by the interleaved key gives row groups
    that are tight RECTANGLES in (a, b) space, so parquet footer stats
    prune on either column (or both). This is what table formats call
    OPTIMIZE ZORDER BY; here it is plain column algebra + a sorted
    write.

    Each column is min/max-normalized to ``bits`` bits with EXACT
    integer arithmetic — ``((v - min) * (2^bits - 1)) div (max -
    min)`` — then bit-interleaved (column i owns every len(cols)-th
    bit starting at i). The global min/max pass is one bounded
    aggregate broadcast back as a 1-row frame; the interleave itself
    is a static unroll of shift/and/or — narrow, codegen'd, no
    shuffle. Total key width = bits * len(cols) <= 63.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    if bits * len(int_cols) > 63:
        raise ValueError("zorder key exceeds a signed long")
    stats = df.agg(
        *[F.min(c).cast("long").alias(f"_zmin_{c}") for c in int_cols],
        *[F.max(c).cast("long").alias(f"_zmax_{c}") for c in int_cols],
    )
    j = df.crossJoin(F.broadcast(stats))
    key = None
    top = (1 << bits) - 1
    for ci, c in enumerate(int_cols):
        rng = F.col(f"_zmax_{c}") - F.col(f"_zmin_{c}")
        # every identifier in the fragment is backtick-quoted so a
        # source column named with spaces/reserved words parses (the
        # derived _zmin/_zmax names inherit whatever c contains)
        bq = c.replace("`", "``")
        norm = F.when(rng > 0, F.expr(
            f"((`{bq}` - `_zmin_{bq}`) * {top})"
            f" div (`_zmax_{bq}` - `_zmin_{bq}`)"
        )).otherwise(F.lit(0).cast("long"))
        j = j.withColumn(f"_znorm_{ci}", norm)
        for b in range(bits):
            bit = F.shiftleft(
                F.shiftright(F.col(f"_znorm_{ci}"), b).bitwiseAND(F.lit(1)),
                b * len(int_cols) + ci,
            )
            key = bit if key is None else key.bitwiseOR(bit)
    return j.withColumn(out_col, key).drop(
        *[f"_zmin_{c}" for c in int_cols],
        *[f"_zmax_{c}" for c in int_cols],
        *[f"_znorm_{i}" for i in range(len(int_cols))],
    )


def zorder_write(
    df: DataFrame,
    path: str,
    int_cols: list[str],
    num_files: int = 32,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Cluster-and-write: range-partition on the z-key (so FILES are
    disjoint key ranges, not just row groups) and sort within each,
    then drop the key — readers see the original schema plus tight
    per-file/row-group footer stats on every z-ordered column."""
    keyed = zorder_key(df, int_cols, bits=bits)
    (
        keyed.repartitionByRange(num_files, "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
        .write.mode(mode)
        .parquet(path)
    )
