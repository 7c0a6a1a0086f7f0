"""As-of (point-in-time) and range (interval) joins.

Spark has no native ASOF JOIN (DuckDB/Pandas/kdb do) and no interval
join; both are re-expressed here as compositions of built-in operators
that scale:

* ``asof_join`` — the union-and-carry-forward formulation: tag both
  sides, union them, and for every left row take the most recent right
  row's values via ``last(..., ignorenulls=True)`` over a window
  partitioned by the join key and ordered by time. ONE shuffle (on the
  key), windows evaluate within partitions, everything stays in
  whole-stage codegen — no Python, no nested-loop join, no
  per-key driver loop. This beats the naive
  ``l JOIN r ON l.k = r.k AND r.ts <= l.ts`` + row_number formulation,
  which materializes the full triangular product per key.
* ``range_join_binned`` — points-in-intervals via bucketing: each
  interval explodes to the fixed-width bins it covers (narrow), the
  point side computes its bin (narrow), candidates come from a plain
  equi-join on the bin, and an exact post-filter removes false
  positives. Turns what Spark would plan as a BroadcastNestedLoopJoin
  (or worse, a cartesian) into a shuffled hash join whose fan-out is
  ``interval_width / bin_width`` per interval.

Both appear in training-data pipelines: as-of joins align events to
the latest feature snapshot; range joins map timestamps/offsets into
session or document spans.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    value_cols: Sequence[str],
    tolerance: Column | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward inclusive as-of join: for each left row, attach the
    ``value_cols`` of the latest right row with ``right.on <= left.on``
    within the same ``by`` group (pandas ``merge_asof`` /  DuckDB
    ``ASOF JOIN`` semantics). Left rows with no prior right row get
    NULLs.

    ``tolerance``: optional max allowed ``left.on - right.on`` as a
    Column interval/number matching the ``on`` column's type — matches
    farther back than that are nulled (pandas ``tolerance=``).

    The right side must be unique per ``(by, on)``; pre-aggregate
    otherwise (ties would resolve arbitrarily in any engine).

    Scale: one hash-partition shuffle on ``by`` for the union, then a
    sorted window per partition — the same cost profile as a grouped
    aggregation. Skewed keys are AQE's problem, as with any window.
    """
    by = list(by)
    lcols = left.columns
    # tag 0 = right, 1 = left; at equal timestamps the right row sorts
    # first, so it is visible to the left row (backward INCLUSIVE)
    r = right.select(
        *by,
        F.col(on).alias(on),
        F.lit(0).alias("_side"),
        F.col(on).alias("_r_ts"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
            for c in lcols
            if c not in (*by, on)
        ],
    )
    l = left.select(  # noqa: E741
        *by,
        F.col(on).alias(on),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_r_ts"].dataType).alias("_r_ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in value_cols],
        *[F.col(c).alias(f"_l_{c}") for c in lcols if c not in (*by, on)],
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).withColumns(
        {
            **{
                f"{c}{suffix}": F.last(f"{c}{suffix}", ignorenulls=True).over(w)
                for c in value_cols
            },
            "_matched_ts": F.last("_r_ts", ignorenulls=True).over(w),
        }
    )
    out = carried.filter(F.col("_side") == 1)
    if tolerance is not None:
        stale = (F.col(on) - F.col("_matched_ts")) > tolerance
        out = out.withColumns(
            {
                f"{c}{suffix}": F.when(~F.coalesce(stale, F.lit(True)), F.col(f"{c}{suffix}"))
                for c in value_cols
            }
        )
    return out.select(
        *by,
        on,
        *[F.col(f"_l_{c}").alias(c) for c in lcols if c not in (*by, on)],
        *[f"{c}{suffix}" for c in value_cols],
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join points to half-open intervals ``[start, end)`` via
    fixed-width binning: intervals fan out to every bin they overlap
    (``explode(sequence(...))``, narrow), points compute one bin
    (narrow), candidates equi-join on the bin, then the exact predicate
    filters. Output = points columns + intervals columns, one row per
    (point, containing interval).

    Pick ``bin_width`` near the typical interval width: fan-out per
    interval is ``ceil(width / bin_width) + 1`` while a too-small width
    multiplies the interval side. The equi-join shuffles on the bin
    key, so dense regions spread over many bins instead of one hot
    nested-loop task — this is the standard interval-bucketing trick
    Spark itself lacks.

    ``how``: ``inner`` or ``left`` (uncontained points survive with
    NULL interval columns — each point maps to exactly one bin, so a
    left join emits exactly one NULL row per orphan). The exact range
    predicate is part of the JOIN CONDITION, not a post-filter: a
    post-filter evaluates NULL on unmatched rows and would silently
    turn ``left`` back into ``inner`` (ADVICE r2). Right/full are
    rejected — an unmatched interval would surface once per bin
    replica, which is not a meaningful row set.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join_binned supports inner/left, got {how!r}")
    b = float(bin_width)
    pt, lo, hi = F.col(point_col), F.col(start_col), F.col(end_col)
    binned_i = intervals.withColumn(
        "_ibin",
        F.explode(
            F.sequence(
                F.floor(lo / b).cast("long"),
                # end is exclusive: a zero-length or bin-aligned end
                # does not reach the next bin
                F.floor((hi - F.lit(1e-9)) / b).cast("long"),
            )
        ),
    )
    binned_p = points.withColumn("_pbin", F.floor(pt / b).cast("long"))
    cond = (F.col("_pbin") == F.col("_ibin")) & (pt >= lo) & (pt < hi)
    return binned_p.join(binned_i, on=cond, how=how).drop("_pbin", "_ibin")


def resample_timeseries(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    step: str = "1 hour",
) -> DataFrame:
    """Regularize an irregular time series: per key, generate the
    uniform ``step`` grid spanning that key's observed range, then
    carry each value forward from the latest observation at or before
    the grid tick (gap filling; the batch twin of a ticking stream).

    Plan: per-key min/max agg (one shuffle) → ``explode(sequence(...))``
    grid (narrow) → the union+carry-forward-window as-of mechanic (one
    more key shuffle, no self-join). Grid size is bounded per key by
    its own time range — nothing global, nothing driver-side.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    span = df.groupBy(key_col).agg(
        F.min(ts_col).alias("_t0"), F.max(ts_col).alias("_t1")
    )
    grid = span.select(
        F.col(key_col),
        F.explode(
            F.sequence(F.col("_t0"), F.col("_t1"), F.expr(f"INTERVAL {step}"))
        ).alias(ts_col),
    )
    obs = df.select(
        F.col(key_col), F.col(ts_col),
        F.lit(0).alias("_is_grid"),
        *[F.col(c) for c in value_cols],
    )
    ticks = grid.select(
        F.col(key_col), F.col(ts_col),
        F.lit(1).alias("_is_grid"),
        *[F.lit(None).cast(df.schema[c].dataType).alias(c) for c in value_cols],
    )
    merged = obs.unionByName(ticks)
    # observations sort before a same-timestamp grid tick, so the tick
    # picks up the value AT its own timestamp too
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, "_is_grid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.select(
        F.col(key_col), F.col(ts_col), F.col("_is_grid"),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    return filled.filter(F.col("_is_grid") == 1).drop("_is_grid")


def rolling_time_agg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_seconds: int = 3600,
    sum_col: str = "rolling_sum",
    count_col: str = "rolling_count",
) -> DataFrame:
    """Trailing time-window aggregates per key: for every row, the sum
    and count of ``value_col`` over that key's rows with timestamps in
    ``[ts - window_seconds, ts]`` (inclusive both ends — the ANSI
    ``RANGE BETWEEN ... PRECEDING AND CURRENT ROW`` frame, so DuckDB's
    interval-RANGE window replays it exactly; same-timestamp peers all
    aggregate together per RANGE semantics). The moving-average /
    rate-limiter / burst-detection primitive of event analytics.

    Plan/scale: ONE shuffle on the key; the frame is evaluated by
    Spark's native window operator ordered by INTEGER microseconds —
    exact long arithmetic, so the frame boundary agrees bit-for-bit
    with DuckDB's interval comparison (a seconds-as-double ordering
    could flip inclusion of a row sitting exactly ``window_seconds``
    away). Sliding-frame state is bounded by the window span, never a
    triangular self-join; per-key row counts bound task memory exactly
    as in :func:`asof_join`.

    TIMESTAMP_NTZ columns (parquet µs stamps without UTC adjustment —
    the events table) can't feed ``unix_micros`` and must NOT round-
    trip through timestamp_ltz (session-timezone/DST shifts — the
    ``sessionize_events`` precedent): the naive wall-clock epoch is
    derived timezone-independently from date-days + time-of-day parts,
    all in integer/decimal arithmetic (``date_part('SECOND')`` is
    DECIMAL(8,6); ×1e6 is exact).
    """
    from pyspark.sql.types import TimestampNTZType  # noqa: PLC0415

    ts = F.col(ts_col)
    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        micros = (
            F.unix_date(ts.cast("date")).cast("long") * F.lit(86_400_000_000)
            + F.date_part(F.lit("HOUR"), ts).cast("long") * F.lit(3_600_000_000)
            + F.date_part(F.lit("MINUTE"), ts).cast("long") * F.lit(60_000_000)
            + (F.date_part(F.lit("SECOND"), ts) * 1_000_000).cast("long")
        )
    else:
        micros = F.unix_micros(ts)
    w = (
        Window.partitionBy(key_col)
        .orderBy(micros)
        .rangeBetween(-int(window_seconds) * 1_000_000, 0)
    )
    return df.select(
        "*",
        F.sum(value_col).over(w).alias(sum_col),
        F.count(value_col).over(w).alias(count_col),
    )


def rolling_zscores(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_rows: int = 20,
    decimals: int = 2,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Per-key rolling z-score anomaly signal: each event scored
    against the mean/stddev of its key's previous ``window_rows``
    events (ROWS frame, current row included) — the burst/outlier
    detector of event-stream monitoring.

    Exactness contract: ``value_col`` holds ``decimals``-dp decimals
    (the events table's 2-dp values), so the frame's Σx and Σx² are
    computed over EXACT INTEGER cents — any engine produces identical
    sums — and mean/sample-variance/z derive from those integers with
    single IEEE divisions/sqrt (bit-identical everywhere, no
    summation-order drift). ``z`` is NULL when the frame has < 2 rows
    or zero variance. ``rolling_mean`` is TRUNCATED (floor) to 4dp,
    not rounded: the mean is an exact rational ``Σcents/n`` that can
    land exactly ON a .00005 rounding boundary (measured at sf0.01:
    n=8 frames put it at odd multiples of 1/20000), where engines'
    round-half rules legitimately disagree; floor of the identical
    double is identical everywhere. z keeps a 4-dp round — the sqrt
    makes boundary hits measure-zero.

    Plan: ONE shuffle on the key; the ROWS frame is bounded state
    inside Spark's window operator (never a self-join). Ordering ties
    break on ``order_tiebreak`` (default: the key's row identity is
    (ts, value) — pass an id column for full determinism on dup
    timestamps).
    """
    scale = 10 ** decimals
    cents = F.round(F.col(value_col) * scale).cast("long")
    order = [F.col(ts_col)] + (
        [F.col(order_tiebreak)] if order_tiebreak else [F.col(value_col)]
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(-(int(window_rows) - 1), 0)
    )
    s1 = F.sum(cents).over(w)
    s2 = F.sum(cents * cents).over(w)
    cnt = F.count(F.lit(1)).over(w)
    mean_c = s1.cast("double") / cnt.cast("double")
    # sample variance over cents: (Σx² − (Σx)²/n) / (n−1)
    var_c = (s2.cast("double") - s1.cast("double") * s1.cast("double")
             / cnt.cast("double")) / (cnt.cast("double") - 1.0)
    z = (cents.cast("double") - mean_c) / F.sqrt(var_c)
    mean_trunc = F.floor(mean_c / scale * 10000).cast("double") / 10000
    return df.select(
        "*",
        cnt.alias("frame_n"),
        mean_trunc.alias("rolling_mean"),
        F.when((cnt >= 2) & (var_c > 0), F.round(z, 4)).alias("zscore"),
    )


def scd2_lookup(
    facts: DataFrame,
    history: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    suffix: str | None = None,
) -> DataFrame:
    """Point-in-time dimension enrichment: attach to every fact row
    the SCD2 attribute values that were valid AT the fact's own
    timestamp — ``valid_from <= ts AND (valid_to IS NULL OR
    ts < valid_to)`` — the "what did we believe then" join that keeps
    backtests and training snapshots honest (joining today's dimension
    onto historical facts leaks the future). Facts before a key's
    first interval keep NULL attributes; ``history`` comes from
    :func:`kernels.scd2_from_snapshots` or any frame with the same
    interval contract (half-open, non-overlapping per key).

    Plan/scale: ONE key equi-join (hash-partitioned both sides, AQE
    broadcasts a small dimension) with the interval predicate as a
    post-join filter — per-fact fan-out is the key's VERSION COUNT
    (release cadence, typically a handful), never corpus-sized, and
    the non-overlap contract guarantees ≤1 survivor per fact so no
    dedup pass is needed. Contrast a naive time-theta join, which
    Spark would plan as a nested loop.

    An ``attr_cols`` name that already exists in ``facts`` would make
    the joined frame ambiguous (ADVICE r10): pass ``suffix`` to emit
    the colliding attributes as ``<name><suffix>``; with no suffix a
    collision raises instead of silently producing a frame whose
    duplicate column errors only on first reference.
    """
    collisions = [c for c in attr_cols if c in facts.columns]
    if collisions and suffix is None:
        raise ValueError(
            "scd2_lookup: attr_cols "
            f"{collisions} already exist in facts — pass suffix=... to "
            "disambiguate (emitted as <name><suffix>) or rename upstream"
        )
    out_name = {
        c: (c + suffix if suffix is not None and c in collisions else c)
        for c in attr_cols
    }
    h = history.select(
        *[F.col(c).alias(f"_k_{c}") for c in key_cols],
        *[F.col(c).alias(out_name[c]) for c in attr_cols],
        F.col(valid_from_col).alias("_vf"),
        F.col(valid_to_col).alias("_vt"),
    )
    key_eq = [facts[c] == h[f"_k_{c}"] for c in key_cols]
    cond = key_eq[0]
    for k in key_eq[1:]:
        cond = cond & k
    ts = facts[ts_col]
    cond = cond & (F.col("_vf") <= ts) & (
        F.col("_vt").isNull() | (ts < F.col("_vt"))
    )
    return facts.join(h, cond, "left").drop(
        *[f"_k_{c}" for c in key_cols], "_vf", "_vt"
    )


def last_touch_attribution(
    conversions: DataFrame,
    touches: DataFrame,
    by: Sequence[str],
    ts_col: str,
    touch_cols: Sequence[str],
    lookback: Column | None = None,
) -> DataFrame:
    """Last-touch marketing attribution: for every conversion, the
    most recent prior touch by the same key within the ``lookback``
    interval (NULL attribution outside it) — a thin, documented
    composition over :func:`asof_join`, which already implements the
    backward-inclusive carry-forward with ONE key shuffle and no
    triangular self-join. ``touches`` must be unique per (key, ts);
    pre-aggregate simultaneous touches first (the asof_join
    contract)."""
    return asof_join(
        conversions,
        touches,
        on=ts_col,
        by=by,
        value_cols=touch_cols,
        tolerance=lookback,
        suffix="_touch",
    )


def ewma_values(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    window_rows: int = 30,
    decimals: int = 2,
) -> DataFrame:
    """Exponentially-weighted moving average (α = 1/2) per key over
    event order — the drift/trend smoother that weights the present
    over the past, complementing :func:`rolling_time_agg`'s flat
    frame. The CONTRACT is the ``window_rows``-term truncated form
    (truncation error ≤ max|x|/2^{window_rows}, below any emitted
    precision at the default 30):

        ewma_t = Σ_{i=0..n−1} 2^i·x_{t−n+1+i} / (2^n − 1),
        n = min(t, window_rows)

    — newest term weighted 2^{n−1}, each step back halving, which is
    exactly the α=1/2 recursion ``s_t = (x_t + s_{t−1})/2`` restarted
    outside the frame. Numerator and denominator are EXACT integers
    (cents·2^i; n ≤ 62 keeps 2^n in int64 — enforced), and the output
    ``ewma_milli = ⌊10^{3−decimals}·scale·num/den⌋`` is one exact
    integer floor division, engine-portable with no float in sight.

    Ordering ties break by ``id_col`` so the frame content is total-
    ordered (the FIXTURES determinism rule for any windowed fold).

    Plan/scale: ONE hash exchange (the per-key window); the frame
    fold is a bounded ``window_rows``-element array per row inside
    codegen — no iteration, no state store, no driver work.
    """
    if not 1 <= window_rows <= 40:
        raise ValueError(
            "window_rows must be in [1, 40] so |cents|*2^(n+1) stays in"
            " int64 for |value| up to ~4*10^4 value units"
        )
    scale = 10 ** decimals
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(-(window_rows - 1), 0)
    )
    cents = F.round(F.col(value_col) * scale).cast("long")
    # NULL measurements are excluded from the population BEFORE the
    # window (the group_quantiles rule): otherwise a null row would
    # still consume a frame slot while collect_list skips its value —
    # engines disagree on exactly that shape
    out = (
        df.select(key_col, ts_col, F.col(id_col), cents.alias("_c"))
        .filter(F.col("_c").isNotNull())
        .withColumn("_lst", F.collect_list(F.col("_c")).over(w))
    )
    num = F.expr(
        "aggregate(zip_with(_lst, sequence(0, size(_lst) - 1),"
        " (x, i) -> x * shiftleft(1L, i)), 0L, (a, b) -> a + b)"
    )
    den = F.expr("shiftleft(1L, size(_lst)) - 1")
    # ewma_milli = floor(1000*num / (den*scale)): the x1000 step can
    # cross int64 (num alone may reach ~2e17 at the window cap), so
    # the final division rides decimal(38,0) exact arithmetic — the
    # key_skew_profile floor pattern
    a = num.cast("decimal(38,0)") * F.lit(1000).cast("decimal(38,0)")
    b = (den * scale).cast("decimal(38,0)")
    return out.select(
        key_col,
        F.col(id_col),
        ((a - a % b) / b).cast("decimal(38,0)").cast("long").alias(
            "ewma_milli"
        ),
    )
