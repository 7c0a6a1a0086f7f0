"""Aggregation / window operators (SURVEY §2.5-§2.7)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def agg_sum_groups(
    df: DataFrame,
    group_cols: Sequence[str],
    sum_cols: dict[str, str],
    zero_fill: bool = True,
) -> DataFrame:
    """Grouped null-skipping sums (``GEM/Coalplants_GEM.R:165-171``).

    R parity: ``sum(x, na.rm=TRUE)`` over an all-NA group yields 0,
    Spark yields NULL → normalized with ``coalesce(sum, 0.0)`` when
    ``zero_fill``. Partial aggregation (map-side combine) is automatic
    for sum — the shuffle moves one row per (partition, group).
    """
    aggs = []
    for out_name, src in sum_cols.items():
        s = F.sum(src)
        aggs.append((F.coalesce(s, F.lit(0.0)) if zero_fill else s).alias(out_name))
    return df.groupBy(*group_cols).agg(*aggs)


def agg_mean_groups(df: DataFrame, group_cols: Sequence[str], mean_cols: dict[str, str]) -> DataFrame:
    """Grouped means (``GEM/TotalData_GEM.R:79-82``); Spark ``avg``
    skips NULLs like ``mean(na.rm=TRUE)``."""
    return df.groupBy(*group_cols).agg(
        *[F.avg(src).alias(out) for out, src in mean_cols.items()]
    )


def agg_global_mean(df: DataFrame, group_cols: Sequence[str], mean_cols: dict[str, str], constant_key: tuple[str, str]) -> DataFrame:
    """Global-fallback means keyed by a constant
    (``GEM/TotalData_GEM.R:89-93``)."""
    name, value = constant_key
    return agg_mean_groups(df, group_cols, mean_cols).withColumn(name, F.lit(value))


def distinct_rows(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """``distinct()`` (``GEM/TotalData_GEM.R:143-146``)."""
    return (df.select(*cols) if cols else df).distinct()


def dedup_first_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[Column | str],
    skew_safe: bool = False,
) -> DataFrame:
    """``group_by(k) %>% slice(1)`` (``GEM/TotalData_GEM.R:48-51``).

    R keeps file order; a distributed engine has no file order, so the
    caller supplies a deterministic ordering.

    Default path: one window shuffle on the key — and, plan-verified
    (round 5), ALREADY skew-bounded: Spark plans the
    ``row_number() == 1`` filter as ``WindowGroupLimit`` with a
    PARTIAL map-side stage, so each input partition ships at most one
    row per key into the exchange; a hot key contributes ≤ #partitions
    rows to its reducer, not its full row count. Measured at 30× with
    a 10%-of-rows key: 3.23 s window vs 3.53 s skew_safe (SCALE.md
    hot-key table) — the two formulations are equivalently bounded,
    which the stress numbers confirm.

    ``skew_safe=True``: two-phase ``min_by(struct(all cols),
    struct(order))`` aggregation — the same bound expressed as an
    aggregate (partial agg collapses each partition to one candidate
    per key before the exchange). Useful where an aggregate composes
    better than a window (inside other groupBys) or on Spark versions
    without the WindowGroupLimit rule. Requires plain ascending,
    non-null order column NAMES (struct lexicographic min ≡ first row
    of the ascending window order); the window path additionally
    supports desc/null-ordered Column expressions.
    """
    if skew_safe:
        if not all(isinstance(c, str) for c in order_cols):
            raise ValueError(
                "skew_safe dedup requires plain ascending column names"
            )
        first = F.min_by(F.struct(*df.columns), F.struct(*order_cols))
        return df.groupBy(*key_cols).agg(first.alias("_r")).select("_r.*")
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def window_count_share(
    df: DataFrame,
    partition_cols: Sequence[str],
    explicit_share: Column | None = None,
    out_col: str = "share",
    skew_safe: bool = False,
) -> DataFrame:
    """Equal-share fallback per group without collapsing
    (``GEM/Hydroplants_GEM.R:174-190``): ``coalesce(explicit, 1/n())``
    over a window partition.

    The count-only window carries no orderBy and — unlike the
    rank-filtered windows (``dedup_first_per_key``, top-n), which
    Spark rewrites into a map-side-partial ``WindowGroupLimit`` — has
    NO partial stage: WindowExec routes and buffers each key's rows
    through one task. Fine for GEM's bounded per-unit owner lists,
    linear in the hot key's row count on open-domain keys (measured
    at 30× with a 10%-of-rows hot key: 3.91 s window vs 5.93 s
    skew_safe — the window wins while the hot key fits one task;
    SCALE.md hot-key table). ``skew_safe=True`` swaps it for a
    two-phase
    count aggregate (map-side partial combine) joined back onto the
    rows — bounded per-task work under any skew; AQE broadcasts the
    per-key counts while they fit and skew-splits the probe join when
    they don't."""
    if skew_safe:
        counts = df.groupBy(*partition_cols).agg(F.count(F.lit(1)).alias("_wcs_n"))
        equal = F.lit(1.0) / F.col("_wcs_n")
        share = (
            F.coalesce(explicit_share, equal) if explicit_share is not None else equal
        )
        # Null-safe equi-join: groupBy keeps NULL keys as a group, and
        # the window path keeps NULL-key rows too, so the join-back must
        # match them (a plain equi-join would silently drop them). The
        # counts side's keys are renamed to break self-join lineage
        # ambiguity, then df's original column order is re-selected —
        # `on=list` would move the join keys first and diverge from the
        # window path's schema.
        keymap = {c: f"_wcs_k_{i}" for i, c in enumerate(partition_cols)}
        counts = counts.select(
            *[F.col(c).alias(a) for c, a in keymap.items()], "_wcs_n"
        )
        cond = None
        for c, a in keymap.items():
            clause = F.col(c).eqNullSafe(F.col(a))
            cond = clause if cond is None else (cond & clause)
        # exclude out_col from the passthrough list: if df already has
        # a column of that name, withColumn replaced it and listing it
        # twice would produce a duplicate/ambiguous column — the window
        # path replaces in place, and the two paths must agree.
        return (
            df.join(counts, on=cond)
            .withColumn(out_col, share)
            .select(*[c for c in df.columns if c != out_col], out_col)
        )
    w = Window.partitionBy(*partition_cols)
    equal = F.lit(1.0) / F.count(F.lit(1)).over(w)
    share = F.coalesce(explicit_share, equal) if explicit_share is not None else equal
    return df.withColumn(out_col, share)


def union_rows(dfs: Sequence[DataFrame], allow_missing: bool = False) -> DataFrame:
    """``rbind`` / ``bind_rows`` (``GEM/TotalData_GEM.R:16``,
    ``GEM/Hydroplants_GEM.R:53``): name-matching union; with
    ``allow_missing`` absent columns fill NULL."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=allow_missing)
    return out


def top_k(df: DataFrame, order_cols: Sequence[Column | str], k: int) -> DataFrame:
    """Global top-k. Spark plans this as TakeOrderedAndProject — each
    partition keeps k rows, the driver merges; no full sort shuffle."""
    return df.orderBy(*order_cols).limit(k)


def ranked_top_k(
    df: DataFrame,
    order_cols: Sequence[Column | str],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Global top-k WITH dense 1..k ranks, scale-safe: the naive
    ``row_number().over(Window.orderBy(...))`` is an ``Exchange
    SinglePartition`` over the WHOLE input (the scale-killer
    ``surrogate_ids`` was rewritten to avoid). Here the limit runs
    first — ``orderBy().limit(k)`` plans as ``TakeOrderedAndProject``
    (per-partition heaps of k, driver merge, no full-sort shuffle) —
    and the ranking window then sits on an already-single-partition
    k-row child, so planning inserts NO exchange at all (the window's
    required distribution is satisfied by ``TakeOrderedAndProject``'s
    ``SinglePartition`` output; asserted in ``tests/test_plans.py``).

    Use this to truncate a retrieval leg to its head before rank
    fusion (RRF needs only each system's top-K) or for any bounded
    leaderboard. ``order_cols`` must be a total order (include a
    tiebreak id) for deterministic ranks.
    """
    top = df.orderBy(*order_cols).limit(k)
    w = Window.orderBy(*order_cols)
    return top.withColumn(rank_col, F.row_number().over(w))


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    out_col: str = "session_idx",
) -> DataFrame:
    """Batch sessionization: number each row's session within its key,
    where a new session starts when the gap to the previous event
    exceeds ``gap_seconds`` (the batch equivalent of
    ``session_window``; classic lag + running-sum formulation).
    Sessions are 1-based in event-time order.

    Scale: one window shuffle on the key; both window functions share
    the same (key, ts) sort so Spark evaluates them in a single
    Window operator.
    """
    from pyspark.sql.types import TimestampNTZType  # noqa: PLC0415

    # Parquet µs timestamps without UTC adjustment arrive as
    # TIMESTAMP_NTZ, which ANSI mode refuses to cast straight to
    # double. Derive the naive wall-clock epoch timezone-independently
    # (date-days + time-of-day parts) — a timestamp_ltz round-trip
    # would silently shift gaps in any non-UTC session, especially
    # across DST transitions.
    ts = F.col(ts_col)
    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        epoch = (
            F.unix_date(ts.cast("date")).cast("double") * 86400.0
            + F.date_part(F.lit("HOUR"), ts).cast("double") * 3600.0
            + F.date_part(F.lit("MINUTE"), ts).cast("double") * 60.0
            + F.date_part(F.lit("SECOND"), ts).cast("double")
        )
    else:
        epoch = ts.cast("double")
    w = Window.partitionBy(key_col).orderBy(ts_col)
    prev = F.lag(epoch).over(w)
    gap = epoch - prev
    is_new = F.when(prev.isNull() | (gap > gap_seconds), 1).otherwise(0)
    running = Window.partitionBy(key_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # LONG, not int (round-11 width audit): sessions-per-key is
    # unbounded in principle (a hot synthetic key at 100 TB)
    return df.withColumn(out_col, F.sum(is_new).over(running).cast("long"))


def funnel_steps(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """K-step ordered funnel per key — the product-analytics primitive
    "did the user click, THEN view, THEN ...": step i counts only when
    it happens STRICTLY AFTER the key's completed step i−1; the result
    carries each step's first qualifying timestamp (NULL once the
    funnel breaks) and ``funnel_depth`` = number of completed steps.

    Plan/scale: one filtered min-aggregate per step (map-side partial
    combine, keyed by ``key_col``) chained by per-key equi-joins — the
    frames after step 1 are one-row-per-key and shrink monotonically,
    so AQE broadcasts them; the event table itself is scanned once per
    step with the step's type filter pushed to the scan. No window
    over an open key domain, no collect_list of whole histories into
    a single task (the pattern that melts on a hot key), exact
    timestamp comparisons only (hash-portable to any engine).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = df.select(F.col(key_col), F.col(ts_col), F.col(type_col))
    out = None
    prev_ts = None
    for i, step in enumerate(steps):
        col_ts = f"step{i + 1}_ts"
        stage = ev.filter(F.col(type_col) == step)
        if out is None:
            got = stage.groupBy(key_col).agg(F.min(ts_col).alias(col_ts))
            out = got
        else:
            got = (
                stage.join(
                    out.select(key_col, F.col(prev_ts).alias("_prev")),
                    on=key_col,
                )
                .filter(F.col("_prev").isNotNull() & (F.col(ts_col) > F.col("_prev")))
                .groupBy(key_col)
                .agg(F.min(ts_col).alias(col_ts))
            )
            out = out.join(got, on=key_col, how="left")
        prev_ts = col_ts
    depth = None
    for i in range(len(steps)):
        c = F.when(F.col(f"step{i + 1}_ts").isNotNull(), 1).otherwise(0)
        depth = c if depth is None else depth + c
    keys = df.select(F.col(key_col)).distinct()
    return (
        keys.join(out, on=key_col, how="left")
        .withColumn("funnel_depth", depth.cast("int"))
    )


def _check_grouping_set_names(
    group_cols: Sequence[str], sum_cols: dict[str, str]
) -> None:
    """Output-name collision guard for rollup/cube (ADVICE r7): a sum
    output named like a grouping column makes the finishing select
    resolve ambiguously (or silently pick the wrong one); the ``g_``
    flags and ``n_rows`` are likewise reserved."""
    reserved = set(group_cols) | {f"g_{c}" for c in group_cols} | {"n_rows"}
    clash = reserved & set(sum_cols)
    if clash:
        raise ValueError(
            f"sum_cols output names collide with reserved output "
            f"columns: {sorted(clash)} (grouping cols, their g_ flags, "
            "and n_rows are taken)"
        )


def rollup_aggregate(
    df: DataFrame,
    group_cols: Sequence[str],
    sum_cols: dict[str, str],
    decimals: int = 2,
) -> DataFrame:
    """ROLLUP grouping-sets aggregate — every prefix of ``group_cols``
    plus the grand total in ONE pass (the drill-down report the
    reference builds by re-aggregating the same frame per level,
    e.g. per-country then global capacity totals).

    Output carries one ``g_<col>`` flag per grouping column
    (``F.grouping``: 1 = the row aggregates OVER that column) so
    subtotal rows are distinguishable from genuine NULL group values —
    never disambiguate on the NULLed-out key itself.

    Plan/scale: Spark expands rollup as a single Expand + one
    hash-aggregate — each input row fans to len(group_cols)+1 grouping
    sets BEFORE the exchange, but partial aggregation collapses them
    map-side, so the shuffle carries ~(levels x groups) rows, not
    (levels x input). One shuffle total; same count as the plain
    groupBy it generalizes.
    """
    _check_grouping_set_names(group_cols, sum_cols)
    gets = [F.grouping(c).cast("int").alias(f"g_{c}") for c in group_cols]
    aggs = [
        F.round(F.sum(src), decimals).alias(out) for out, src in sum_cols.items()
    ]
    return (
        df.rollup(*group_cols)
        .agg(*gets, *aggs, F.count(F.lit(1)).alias("n_rows"))
        .select(*group_cols, *[f"g_{c}" for c in group_cols],
                *sum_cols.keys(), "n_rows")
    )


def pivot_aggregate(
    df: DataFrame,
    group_cols: Sequence[str],
    pivot_col: str,
    pivot_values: Sequence[str],
    value_col: str,
    decimals: int = 2,
) -> DataFrame:
    """Long-to-wide pivot with summed cells — one output column per
    entry of ``pivot_values`` (the reshape the reference does with R's
    spread/pivot_wider when building per-year capacity matrices).

    ``pivot_values`` is REQUIRED, not discovered: passing the value
    list bounds the output width by contract — at 100 TB an unbounded
    pivot column is a driver OOM, so the operator forces the caller to
    state the (necessarily small) domain. Cells with no rows stay
    NULL, matching SQL conditional aggregation.

    Plan/scale: compiled as one conditional ``sum(when(pivot=v))`` per
    value inside a SINGLE hash aggregate — one shuffle keyed on
    ``group_cols``, all map-side partial. Deliberately NOT
    ``RelationalGroupedDataset.pivot``, which Catalyst lowers to TWO
    aggregates (per-(group, pivot) sums, then a pivotfirst regroup) =
    two exchanges (verified on the physical plan); the conditional
    form halves the shuffles and mirrors the SQL oracle exactly.
    """
    aggs = [
        F.round(
            F.sum(F.when(F.col(pivot_col) == v, F.col(value_col))), decimals
        ).alias(v)
        for v in pivot_values
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def group_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    percents: Sequence[int] = (25, 50, 75, 95),
    decimals: int = 2,
) -> DataFrame:
    """Exact per-group percentiles (percentile_cont linear
    interpolation), computed with ENGINE-PORTABLE integer algebra.

    ``value_col`` holds ``decimals``-dp decimals, so every rank
    position and both interpolation endpoints are exact integers
    ("cents"): for percent p, position (n-1)*p splits into
    lo = (n-1)*p div 100 and frac = (n-1)*p mod 100, and the result is
    the exact integer lo_cents*100 + (hi_cents-lo_cents)*frac in
    "cents x 100" units — ONE IEEE division at the end converts to a
    value unit, bit-identical on any engine (contrast built-in
    ``percentile``/``quantile_cont``, whose (n-1)*p float rounding is
    engine-private).

    Plan/scale: one shuffle — the row_number/count window hash-
    partitions on ``group_cols`` and the finishing conditional-max
    groupBy reuses that partitioning (no second exchange). Ties in
    ``value_col`` are harmless: equal cents at adjacent ranks make the
    tie order unobservable. Never collects a group into one list.
    """
    scale = 10 ** decimals
    cents = F.round(F.col(value_col) * scale).cast("long")
    wo = Window.partitionBy(*group_cols).orderBy("_c")
    wn = Window.partitionBy(*group_cols)
    ranked = (
        # NULL values are excluded from the population (standard
        # percentile semantics); without this filter they'd rank first
        # and shift every index
        df.select(*group_cols, cents.alias("_c"))
        .filter(F.col("_c").isNotNull())
        .withColumn("_rn", F.row_number().over(wo))
        .withColumn("_n", F.count(F.lit(1)).over(wn))
    )
    aggs = [F.max("_n").alias("_n")]
    for p in percents:
        lo_rank = F.floor((F.col("_n") - 1) * p / 100) + 1
        aggs.append(F.max(F.when(F.col("_rn") == lo_rank, F.col("_c"))).alias(f"_lo{p}"))
        aggs.append(F.max(F.when(F.col("_rn") == lo_rank + 1, F.col("_c"))).alias(f"_hi{p}"))
    per = ranked.groupBy(*group_cols).agg(*aggs)
    outs: list[Column] = [F.col(c) for c in group_cols]
    outs.append(F.col("_n").cast("long").alias("n_values"))
    for p in percents:
        frac = ((F.col("_n") - 1) * p) % 100
        lo, hi = F.col(f"_lo{p}"), F.coalesce(F.col(f"_hi{p}"), F.col(f"_lo{p}"))
        exact = lo * 100 + (hi - lo) * frac
        outs.append((exact.cast("double") / (scale * 100)).alias(f"p{p}"))
    return per.select(*outs)


def global_quantiles(
    df: DataFrame,
    value_col: str,
    percents: Sequence[int] = (25, 50, 75, 95),
    decimals: int = 2,
) -> DataFrame:
    """Exact WHOLE-TABLE percentiles with :func:`group_quantiles`'
    integer algebra but none of its window: a constant group folds the
    per-group window spec to empty and plans an ``Exchange
    SinglePartition`` over every row (the r7-verdict funnel_latency
    finding), so the global case instead computes ranks with the
    ``surrogate_ids`` two-phase pattern — range-partition by value,
    number each partition locally, collect the per-partition counts
    (one bounded action over ``|shuffle partitions|`` rows, the
    module's documented driver-boundary contract) and add exclusive
    prefix-sum offsets. With the total known driver-side, only the
    ≤2·|percents| rows AT the needed ranks survive the filter, and the
    finishing aggregate's single-partition exchange moves one partial
    row per partition. Every shuffle is distributed.

    Returns ONE row ``(n_values, p<p>…)``; interpolation is the same
    exact ``lo·100 + (hi−lo)·frac`` cents×100 integer with one final
    IEEE division, so any engine replays it bit-identically.
    """
    scale = 10 ** decimals
    cents = F.round(F.col(value_col) * scale).cast("long")
    vals = df.select(cents.alias("_c")).filter(F.col("_c").isNotNull())
    spark = df.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = vals.repartitionByRange(n_parts, F.col("_c").asc()).withColumn(
        "_pid", F.spark_partition_id()
    )
    local = ranged.withColumn(
        "_rn", F.row_number().over(Window.partitionBy("_pid").orderBy("_c"))
    )
    # persist BEFORE any action (ADVICE r8): RangePartitioner samples
    # split points per-execution, so a second un-persisted pass could
    # place rows differently than the counted one — stale offsets,
    # silently wrong percentiles. Pinning the RDD makes the rank
    # filter below read the exact partitions the counts described;
    # both actions finish inside this call, so the cache is released
    # before returning.
    local = local.persist()
    try:
        counts = {
            r["_pid"]: r["_cnt"]
            for r in local.groupBy("_pid").agg(F.count("*").alias("_cnt")).collect()
        }
        total, offsets = 0, {}
        for pid in sorted(counts):
            offsets[pid] = total
            total += counts[pid]
        if total == 0:
            row = [F.lit(0).cast("long").alias("n_values")]
            row += [F.lit(None).cast("double").alias(f"p{p}") for p in percents]
            return spark.range(1).select(*row)
        # offsets widen to long EXPLICITLY: F.lit(python_int) is
        # int32 while it fits, and int32 offset + int32 row_number
        # wraps past 2^31 global rows (the rank_normalize width bug
        # class, caught by the 10x harness)
        off_map = F.create_map(
            *[
                lit
                for pid, off in offsets.items()
                for lit in (F.lit(pid), F.lit(off).cast("long"))
            ]
        )
        ranked = local.withColumn(
            "_grn",
            F.element_at(off_map, F.col("_pid")) + F.col("_rn").cast("long"),
        )
        needed: dict[int, int] = {}
        for p in percents:
            needed[p] = (total - 1) * p // 100 + 1
        want = sorted({r for lo in needed.values() for r in (lo, lo + 1)})
        aggs = []
        for p in percents:
            lo = needed[p]
            aggs.append(
                F.max(F.when(F.col("_grn") == lo, F.col("_c"))).alias(f"_lo{p}")
            )
            aggs.append(
                F.max(F.when(F.col("_grn") == lo + 1, F.col("_c"))).alias(f"_hi{p}")
            )
        # ≤ 2·|percents| rows survive the filter; finishing the one
        # output row driver-side keeps BOTH actions on the pinned
        # cache (the bounded driver-boundary contract, same as the
        # counts) and lets the cache be released before return.
        hit = ranked.filter(F.col("_grn").isin(want)).agg(*aggs).collect()[0]
    finally:
        local.unpersist()
    row = [F.lit(total).cast("long").alias("n_values")]
    for p in percents:
        frac = (total - 1) * p % 100
        lo = hit[f"_lo{p}"]
        hi = hit[f"_hi{p}"] if hit[f"_hi{p}"] is not None else lo
        # the same exact integer algebra + ONE final IEEE division the
        # distributed expression performed (Python float division IS
        # float64 division — bit-identical)
        exact = lo * 100 + (hi - lo) * frac
        row.append(F.lit(exact / (scale * 100.0)).alias(f"p{p}"))
    return spark.range(1).select(*row)


def cohort_retention(
    df: DataFrame,
    key_col: str,
    ts_col: str,
) -> DataFrame:
    """Weekly cohort-retention matrix — keys cohorted by the ISO week
    of their FIRST event; one row per (cohort_week, week_offset) with
    the count of cohort members active that week (offset 0 row = the
    cohort's size). The classic growth-analytics triangle.

    Plan/scale: first-event aggregate and the distinct (key, week)
    activity table both hash-partition on ``key_col``, so their join
    is co-partitioned (no third shuffle); the finishing count keys on
    (cohort, offset) — bounded by weeks^2 rows out. Distinct-per-week
    before counting means a key active 1000x in a week costs one row
    through the final exchange. datediff of Monday-truncated weeks is
    an exact multiple of 7 — integer offsets, no timezone exposure
    (caller pins the session tz; week truncation is date-level).
    """
    wk = F.date_trunc("week", F.col(ts_col))
    first = df.groupBy(key_col).agg(
        F.date_trunc("week", F.min(ts_col)).alias("_cohort")
    )
    active = df.select(F.col(key_col), wk.alias("_week")).distinct()
    return (
        active.join(first, on=key_col)
        .select(
            F.to_date("_cohort").alias("cohort_week"),
            (F.datediff(F.to_date("_week"), F.to_date("_cohort")) / 7)
            .cast("int")
            .alias("week_offset"),
            F.col(key_col),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


def event_transition_matrix(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences: for every observed (prev_type, next_type) pair, the
    global transition count and probability — the sequence-mining
    primitive behind "what do users do after X" and synthetic-session
    generators.

    Probability is emitted as ``prob_ppm`` = floor(count * 1e6 /
    row_total) — EXACT integer division on both engines, sidestepping
    the round-half hazard of emitting count/total as a double (exact
    rationals like 1/128 sit ON the 6-dp half boundary where rounding
    modes disagree; integer floor never does). Consumers wanting a
    float divide by 1e6.

    Plan/scale: one key-window (lag) shuffle, then a (prev, next)
    groupBy — |types|² rows — and a window over ``prev`` for row
    totals on that tiny frame. The per-key sequence is never
    collected; a hot key costs window state of ONE row (lag-1).
    """
    order = [F.col(ts_col)] + (
        [F.col(order_tiebreak)] if order_tiebreak else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    pairs = (
        df.select(
            F.lag(type_col).over(w).alias("prev_type"),
            F.col(type_col).alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    row_total = F.sum("n_transitions").over(Window.partitionBy("prev_type"))
    return (
        pairs.withColumn("_tot", row_total)
        # `div` keeps the whole computation in long arithmetic — a
        # double division could round up across an integer boundary
        # before the floor and disagree with exact integer division.
        .select(
            "prev_type",
            "next_type",
            "n_transitions",
            F.expr("(n_transitions * 1000000) div _tot").alias("prob_ppm"),
        )
    )


def impute_group_median(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    decimals: int = 2,
) -> DataFrame:
    """NULL imputation by the group's exact median — the
    :func:`group_quantiles` machinery applied to the reference's
    impute-by-group pattern (``case_when_impute_year`` imputes a
    constant; real numeric columns want the group's center instead).
    NULLs are excluded from the median population, then filled with
    it; a group that is ALL NULL stays NULL.

    Plan/scale: the median frame is one row per group — AQE broadcasts
    the join back; the quantile pass itself is the single-exchange
    window+groupBy shape documented on :func:`group_quantiles`.
    """
    med = group_quantiles(
        df, group_cols, value_col, percents=(50,), decimals=decimals
    ).select(*group_cols, F.col("p50").alias("_p50"))
    return (
        df.join(med, on=list(group_cols), how="left")
        .withColumn(value_col, F.coalesce(F.col(value_col), F.col("_p50")))
        .drop("_p50")
    )


def winsorize(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lower_pct: int = 5,
    upper_pct: int = 95,
    decimals: int = 2,
    out_col: str | None = None,
) -> DataFrame:
    """Winsorization: clamp each value into its group's
    [p_lower, p_upper] exact-percentile band — the standard outlier
    treatment that keeps row count (unlike filtering) and bounds
    influence (unlike leaving the tail in). Clamp bounds come from
    :func:`group_quantiles`' integer-exact interpolation, so the
    comparison is between bit-identical doubles on any engine.

    Plan/scale: quantile pass (one exchange) + broadcast-sized join
    back (one row per group) + narrow clamp. NULL values pass through
    untouched.
    """
    out_col = out_col or value_col
    q = group_quantiles(
        df, group_cols, value_col, percents=(lower_pct, upper_pct),
        decimals=decimals,
    ).select(
        *group_cols,
        F.col(f"p{lower_pct}").alias("_plo"),
        F.col(f"p{upper_pct}").alias("_phi"),
    )
    clamped = F.when(
        F.col(value_col).isNotNull(),
        F.least(F.greatest(F.col(value_col), F.col("_plo")), F.col("_phi")),
    )
    return (
        df.join(q, on=list(group_cols), how="left")
        .withColumn(out_col, clamped)
        .drop("_plo", "_phi")
    )


def cube_aggregate(
    df: DataFrame,
    group_cols: Sequence[str],
    sum_cols: dict[str, str],
    decimals: int = 2,
) -> DataFrame:
    """CUBE grouping sets — ALL 2^k groupings of ``group_cols`` in one
    pass (ROLLUP's prefixes plus the cross-cuts, e.g. per-linestatus
    totals regardless of returnflag). Same output contract as
    :func:`rollup_aggregate`: ``g_<col>`` flags disambiguate subtotal
    NULLs from genuine NULL keys.

    Plan/scale: one Expand (2^k fan-out) + ONE map-side-combined hash
    aggregate — keep k small (the fan-out is per input row before the
    partial agg collapses it); the shuffle carries ~2^k × |groups|
    rows.
    """
    _check_grouping_set_names(group_cols, sum_cols)
    gets = [F.grouping(c).cast("int").alias(f"g_{c}") for c in group_cols]
    aggs = [
        F.round(F.sum(src), decimals).alias(out) for out, src in sum_cols.items()
    ]
    return (
        df.cube(*group_cols)
        .agg(*gets, *aggs, F.count(F.lit(1)).alias("n_rows"))
        .select(*group_cols, *[f"g_{c}" for c in group_cols],
                *sum_cols.keys(), "n_rows")
    )
