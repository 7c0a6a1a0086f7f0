"""Skew mitigation operators (SURVEY §4, 100 TB hardening).

AQE's skew-join handling covers joins; *aggregations* over a skewed
key still funnel each hot key through one reducer. ``salted_sum``
splits every group into ``num_salts`` subgroups (random-ish salt from
a hash of the full row), partially aggregates, then merges — the hot
key's traffic spreads over ``num_salts`` reducers at the cost of one
extra (tiny) shuffle. Semantics identical to a plain groupBy-sum for
algebraic aggregates; the differential harness proves it against a
plain SQL GROUP BY.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    sum_cols: dict[str, str],
    num_salts: int = 8,
    zero_fill: bool = True,
) -> DataFrame:
    """Two-phase skew-safe grouped sum.

    Phase 1 groups by (keys, salt) — map-side combine plus a shuffle
    whose hottest partition is 1/num_salts of the hot key. Phase 2
    groups the (already tiny) partials by the keys alone.

    The salt comes from ``spark_partition_id`` + a per-row monotonic
    id, so it is cheap, deterministic within a run, and needs no
    column scan.
    """
    salt = (F.monotonically_increasing_id() % num_salts).alias("_salt")
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*group_cols, "_salt")
        .agg(*[F.sum(src).alias(f"_p_{out}") for out, src in sum_cols.items()])
    )
    aggs = []
    for out in sum_cols:
        s = F.sum(f"_p_{out}")
        aggs.append((F.coalesce(s, F.lit(0.0)) if zero_fill else s).alias(out))
    return phase1.groupBy(*group_cols).agg(*aggs)


def salted_count_distinct_approx(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    rsd: float = 0.05,
) -> DataFrame:
    """Skew-tolerant distinct counting: HyperLogLog sketches merge
    associatively, so the hot key never concentrates raw values on one
    reducer — each partition holds one sketch per group."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col, rsd).alias(f"approx_distinct_{value_col}")
    )
