"""Deterministic statistical profiling operators.

Spark's ``corr``/``covar_samp`` (and DuckDB's) accumulate float
moments in partition order — the result differs run to run and engine
to engine at the ulp level, which fails value-hash verification and,
worse, makes pipeline regressions undetectable. These operators carry
the SUFFICIENT STATISTICS as exact integers (the inputs are
integer-valued by contract — cents, counts, hours) and derive the
float moments at the END with a fixed, engine-portable sequence of
IEEE operations. Extension surface (the reference computes no second
moments anywhere); same discipline as ``asof.rolling_zscores``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def integer_pair_stats(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    decimals: int = 6,
) -> DataFrame:
    """Per-group Pearson correlation + sample covariance over two
    INTEGER-VALUED columns, via exact integer sums.

    Output: ``n``, the five integer sums (Σx Σy Σx² Σy² Σxy — exact
    ``decimal(38,0)``, hash-verifiable), and ``covar_samp``/``corr``
    derived as ``(nΣxy − ΣxΣy) / (n(n−1))`` and ``(nΣxy − ΣxΣy) /
    (sqrt(nΣx²−(Σx)²)·sqrt(nΣy²−(Σy)²))``, each a short fixed chain
    of IEEE ops on exact integers — deterministic across engines,
    rounded to ``decimals``. ``corr`` is NULL when either variance is
    zero or n < 2.

    Overflow discipline (ADVICE r7; the same rule as
    ``quality.table_fingerprint``): the squared/product terms
    accumulate as ``decimal(38,0)``, NOT long — Spark longs WRAP
    silently in non-ANSI mode and ~1e7 rows of 1e6-cent values already
    push Σx² past int64, exactly where the determinism pitch matters —
    while the DuckDB mirror promotes to HUGEINT. |x|,|y| < 1e19 keeps
    every product inside the 38-digit cap (Spark then NULLs, loudly
    failing parity, rather than wrapping).

    Plan/scale: ONE hash aggregate with map-side partial combine —
    the shuffle carries six fixed-width values per (partition, group).
    Contrast ``F.corr``, whose float accumulators are partition-order-
    sensitive (non-reproducible at the ulp level).
    """
    x = F.col(x_col).cast("decimal(38,0)")
    y = F.col(y_col).cast("decimal(38,0)")
    per = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("decimal(38,0)").alias("sum_x"),
        F.sum(y).cast("decimal(38,0)").alias("sum_y"),
        F.sum(x * x).cast("decimal(38,0)").alias("sum_xx"),
        F.sum(y * y).cast("decimal(38,0)").alias("sum_yy"),
        F.sum(x * y).cast("decimal(38,0)").alias("sum_xy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sum_x").cast("double"), F.col("sum_y").cast("double")
    sxx, syy = F.col("sum_xx").cast("double"), F.col("sum_yy").cast("double")
    sxy = F.col("sum_xy").cast("double")
    num = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    covar = F.when(F.col("n") >= 2, F.round(num / (n * (n - 1)), decimals))
    corr = F.when(
        (F.col("n") >= 2) & (vx > 0) & (vy > 0),
        F.round(num / (F.sqrt(vx) * F.sqrt(vy)), decimals),
    )
    return per.select(
        *group_cols,
        "n",
        "sum_x",
        "sum_y",
        "sum_xx",
        "sum_yy",
        "sum_xy",
        covar.alias("covar_samp"),
        corr.alias("corr"),
    )


def equal_width_histogram(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    n_bins: int,
    lo: int,
    hi: int,
) -> DataFrame:
    """Equal-width histogram over an INTEGER-VALUED column with a
    CALLER-STATED domain [lo, hi) — bin edges derived by exact integer
    arithmetic (``bin = ((v - lo) * n_bins) div (hi - lo)``, clamped
    into range), counts exact. Stating the domain keeps the operator
    one-pass (no min/max pre-scan) and the bin edges stable across
    partitions/engines/reruns — the profiling contract a drift monitor
    needs. ``hi - lo`` must divide evenly into ``n_bins`` so bin edges
    are integers (no float edge ever enters the output). One hash
    aggregate, map-side combined; output bounded by
    ``|groups| × n_bins``.
    """
    if (hi - lo) % n_bins != 0:
        raise ValueError("hi - lo must be a multiple of n_bins")
    width = (hi - lo) // n_bins
    v = F.col(value_col).cast("long")
    # backtick-quoted identifier: a column name with spaces/hyphens/
    # reserved words must survive the expr fragment (ADVICE r7); the
    # numeric operands are validated ints, `div` keeps the division in
    # long arithmetic (a double quotient can cross the floor boundary)
    raw = F.expr(
        f"((`{value_col.replace('`', '``')}` - {int(lo)}) * {int(n_bins)})"
        f" div {int(hi) - int(lo)}"
    )
    bin_idx = F.least(
        F.greatest(raw, F.lit(0).cast("long")), F.lit(n_bins - 1).cast("long")
    ).cast("int")
    return (
        df.filter(v.isNotNull())
        .groupBy(*group_cols, bin_idx.alias("bin_idx"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("bin_lo", (F.lit(lo) + F.col("bin_idx") * width).cast("long"))
    )


def cooccurrence_lift(
    df: DataFrame,
    key_col: str,
    item_col: str,
    min_both: int = 1,
    decimals: int = 6,
) -> DataFrame:
    """Item co-occurrence with lift — for every unordered item pair
    ``(a < b)`` that appears together under at least ``min_both``
    keys: the exact co-occurrence/marginal counts and
    ``lift = n_keys·n_both / (n_a·n_b)`` (> 1 ⇔ positive
    association). The association-mining primitive behind "users who
    X also Y" and token-collocation scoring.

    Determinism: all four counts are exact integers from hash
    aggregates; lift is ONE IEEE division of exact products, rounded
    to ``decimals`` — cross-engine stable (the integer-sufficient-
    statistics rule, same as ``integer_pair_stats``).

    Plan/scale: presence set = one distinct on (key, item); the pair
    self-join is per-key, so fan-out per key is C(items-per-key, 2) —
    bounded by the ITEM VOCABULARY per key, not the corpus (a key
    with 40 distinct items emits 780 pairs; a key seen 10⁶ times
    still emits 780). Marginals ride a broadcast-sized |items| frame;
    the 1-row key count broadcasts. For long-tailed item sets cap
    items-per-key upstream (top-k per key) — the standard
    market-basket guard.
    """
    present = df.select(key_col, item_col).distinct()
    n_keys = present.select(key_col).distinct().agg(
        F.count(F.lit(1)).alias("_nk")
    )
    marg = present.groupBy(item_col).agg(F.count(F.lit(1)).alias("_ni"))
    a = present.select(F.col(key_col).alias("_k"), F.col(item_col).alias("item_a"))
    b = present.select(F.col(key_col).alias("_k"), F.col(item_col).alias("item_b"))
    pairs = (
        a.join(b, "_k")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= min_both)
    )
    ma = marg.select(F.col(item_col).alias("item_a"), F.col("_ni").alias("n_a"))
    mb = marg.select(F.col(item_col).alias("item_b"), F.col("_ni").alias("n_b"))
    return (
        pairs.join(ma, "item_a")
        .join(mb, "item_b")
        .crossJoin(F.broadcast(n_keys))
        .select(
            "item_a",
            "item_b",
            "n_both",
            "n_a",
            "n_b",
            F.round(
                (F.col("_nk").cast("double") * F.col("n_both").cast("double"))
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
                decimals,
            ).alias("lift"),
        )
    )


def _group_median_x100(
    df: DataFrame, group_cols: Sequence[str], unit_col: str, out_col: str
) -> DataFrame:
    """Per-group exact median of an INTEGER unit column, returned in
    units ×100 (so the midpoint interpolation of an even-sized group
    stays an exact integer). Same rank algebra as
    ``aggregates.group_quantiles`` at p=50: one hash exchange for the
    rank window, and the finishing groupBy reuses that partitioning.
    """
    wo = Window.partitionBy(*group_cols).orderBy(unit_col)
    wn = Window.partitionBy(*group_cols)
    ranked = (
        df.select(*group_cols, unit_col)
        .filter(F.col(unit_col).isNotNull())
        .withColumn("_rn", F.row_number().over(wo))
        .withColumn("_n", F.count(F.lit(1)).over(wn))
    )
    lo_rank = F.floor((F.col("_n") - 1) * 50 / 100) + 1
    per = ranked.groupBy(*group_cols).agg(
        F.max("_n").alias("_n"),
        F.max(F.when(F.col("_rn") == lo_rank, F.col(unit_col))).alias("_lo"),
        F.max(F.when(F.col("_rn") == lo_rank + 1, F.col(unit_col))).alias("_hi"),
    )
    frac = ((F.col("_n") - 1) * 50) % 100
    lo, hi = F.col("_lo"), F.coalesce(F.col("_hi"), F.col("_lo"))
    return per.select(
        *group_cols, (lo * 100 + (hi - lo) * frac).cast("long").alias(out_col)
    )


def mad_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    id_col: str,
    value_col: str,
    threshold_milli: int = 3500,
    decimals: int = 2,
) -> DataFrame:
    """Robust per-group outlier flags via the median/MAD modified
    z-score (Iglewicz & Hoaglin 1993): ``z = 0.6745·|x − med| / MAD``
    with the conventional cut at 3.5. Unlike mean/stddev z-scores
    (``asof.rolling_zscores``) or Tukey fences
    (``quality.iqr_outlier_flags``), the flag itself is immune to the
    outliers it hunts — median and MAD have a 50% breakdown point, so
    a corrupted feed can't drag the gate open (the reason robust
    z-scores are the standard pre-training numeric-sanity cut).

    Engine-portable by the module's integer discipline:
    ``value_col`` holds ``decimals``-dp values, both medians ride the
    exact ×100 rank interpolation, and the threshold test is the pure
    integer comparison ``67450·dev > threshold_milli·MAD`` (0.6745
    and the cut carried as ×10⁴/×10³ integers) — no float ever
    decides the flag. ``rz_milli`` = floor(1000·z) is likewise exact
    integer floor division; NULL when MAD = 0, where any nonzero
    deviation is infinitely outlying and flags directly.

    Plan/scale: two rank-window passes (median of values, median of
    deviations), each ONE hash exchange on ``group_cols`` with the
    finishing aggregate reusing the partitioning, plus two joins back
    whose right side is one row per group — broadcast-sized for any
    realistic group count, left to AQE. No driver action, no global
    window.
    """
    scale = 10 ** decimals
    keys = list(group_cols)
    base = df.select(
        *keys,
        F.col(id_col),
        F.col(value_col),
        F.round(F.col(value_col) * scale).cast("long").alias("_c"),
    ).filter(F.col("_c").isNotNull())
    med = _group_median_x100(base, keys, "_c", "_m")
    dev = base.join(med, on=keys).withColumn(
        "_dev", F.abs(F.col("_c") * 100 - F.col("_m"))
    )
    mad = _group_median_x100(dev, keys, "_dev", "_mad")
    num = F.col("_dev") * 67450
    flagged = dev.join(mad, on=keys).select(
        *keys,
        F.col(id_col),
        F.col(value_col),
        (F.col("_dev").cast("double") / (100 * scale)).alias("abs_dev"),
        F.when(
            F.col("_mad") > 0,
            ((num - num % F.col("_mad")) / F.col("_mad")).cast("long"),
        ).alias("rz_milli"),
        F.when(
            F.col("_mad") > 0,
            (num > F.lit(int(threshold_milli)) * F.col("_mad")).cast("long"),
        )
        .otherwise((F.col("_dev") > 0).cast("long"))
        .alias("is_outlier"),
    )
    return flagged


def rank_normalize(
    df: DataFrame,
    group_cols: Sequence[str],
    id_col: str,
    value_col: str,
    n_buckets: int = 10,
    decimals: int = 2,
) -> DataFrame:
    """Per-group percentile-rank normalization — the distribution-free
    feature transform (rank-based scaling is step one of the inverse
    normal transform, and the standard cross-source calibration when
    raw scales disagree): each row gets its exact percentile rank and
    its quantile bucket within ``group_cols``.

    Ties share the MINIMUM rank (``RANK``, not ``row_number``), so
    equal values always map to equal outputs — deterministic without
    inventing a tie order. ``pr_ppm = ⌊10⁶·(rank−1)/(n−1)⌋`` and
    ``bucket = ⌊n_buckets·(rank−1)/n⌋`` are exact integer floor
    divisions (the (a − a mod b)/b form — no float boundary flips);
    a single-row group normalizes to 0.

    Plan/scale: ONE hash exchange — the rank/count windows partition
    on ``group_cols`` and everything after is row-local arithmetic.
    """
    scale = 10 ** decimals
    cents = F.round(F.col(value_col) * scale).cast("long")
    wo = Window.partitionBy(*group_cols).orderBy("_c")
    wn = Window.partitionBy(*group_cols)
    ranked = (
        df.select(*group_cols, F.col(id_col), cents.alias("_c"))
        .filter(F.col("_c").isNotNull())
        .withColumn("_rk", F.rank().over(wo))
        .withColumn("_n", F.count(F.lit(1)).over(wn))
    )
    # rank() yields INT: widen BEFORE the ppm product — (rk−1)·10⁶
    # crosses int32 at rank 2148, i.e. any group past ~2k rows (ANSI
    # mode raises; non-ANSI would silently wrap). Caught by the 10×
    # scale harness, invisible at the sf0.01 gate.
    rk = F.col("_rk").cast("long")
    a = (rk - 1) * 1_000_000
    b = F.col("_n") - 1
    pr = F.when(F.col("_n") > 1, ((a - a % b) / b).cast("long")).otherwise(
        F.lit(0).cast("long")
    )
    ab = (rk - 1) * n_buckets
    bucket = ((ab - ab % F.col("_n")) / F.col("_n")).cast("long")
    return ranked.select(
        *group_cols,
        F.col(id_col),
        pr.alias("pr_ppm"),
        bucket.alias("bucket"),
    )
