"""Data-quality / profiling operators — pipeline guardrails a 100 TB
ingest needs before training-data jobs consume a table.

All single-pass, fully aggregation-based (one shuffle), no driver-side
iteration; ``profile_table`` emits a long-form per-column stats table
so downstream checks are data, not code.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Per-column profile: row count, null count, distinct count.

    One aggregation computes every stat (single scan); the long-form
    reshape is a literal-array explode, not a second pass.
    """
    cols = list(cols or df.columns)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(c).alias(f"_nn_{c}"))
        aggs.append(F.count_distinct(c).alias(f"_nd_{c}"))
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                (F.col("_n") - F.col(f"_nn_{c}")).alias("n_nulls"),
                F.col(f"_nd_{c}").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(per_col).alias("_s")).select(
        "_s.column", "_s.n_rows", "_s.n_nulls", "_s.n_distinct"
    )


def expect_unique_key(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Violations of a uniqueness contract: keys appearing more than
    once, with their multiplicity. Empty result = contract holds."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def expect_nonnull_ratio(df: DataFrame, column: str, min_ratio: float) -> DataFrame:
    """One-row verdict on a completeness contract.

    An EMPTY table reports a NULL ratio and ``passes = False`` — the
    ratio is undefined, and a vanished upstream partition should fail
    a completeness contract loudly, not crash it (ANSI x/0 raises;
    found by the round-5 degenerate-input sweep)."""
    n = F.count(F.lit(1))
    ratio = F.when(n > 0, F.round(F.count(column) / n, 6))
    return df.agg(
        F.lit(column).alias("column"),
        ratio.alias("nonnull_ratio"),
        F.coalesce(ratio >= min_ratio, F.lit(False)).alias("passes"),
    )


def partition_stats(df: DataFrame) -> DataFrame:
    """Physical-layout diagnostic: row count per Spark partition
    (``spark_partition_id``) — the quick skew check before a big
    shuffle ("is one partition holding half the data?"). Narrow: one
    map + one small agg whose output is one row per partition."""
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumnRenamed("_pid", "partition_id")
    )


def iqr_outlier_flags(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] | None = None,
    k: float = 1.5,
) -> DataFrame:
    """Tukey IQR outlier flags: value outside [q1 − k·IQR, q3 + k·IQR],
    computed per group (or globally) — the standard numeric-sanity
    gate before a measure feeds an aggregate. One aggregation for the
    quartiles + a broadcast-friendly join back; exact ``percentile``
    (not approx) so the flag is deterministic.
    """
    keys = list(group_cols or [])
    q = F.expr(f"percentile({value_col}, array(0.25, 0.75))")
    if keys:
        bounds = df.groupBy(*keys).agg(q.alias("_q"))
    else:
        bounds = df.groupBy().agg(q.alias("_q"))
    bounds = bounds.select(
        *keys,
        (F.col("_q")[0] - k * (F.col("_q")[1] - F.col("_q")[0])).alias("_lo"),
        (F.col("_q")[1] + k * (F.col("_q")[1] - F.col("_q")[0])).alias("_hi"),
    )
    joined = df.join(F.broadcast(bounds), on=keys) if keys else df.crossJoin(F.broadcast(bounds))
    return joined.withColumn(
        "is_outlier",
        (F.col(value_col) < F.col("_lo")) | (F.col(value_col) > F.col("_hi")),
    ).drop("_lo", "_hi")


def pseudonymize(df: DataFrame, cols: Sequence[str], salt: str = "") -> DataFrame:
    """Deterministic pseudonymization of identifier columns (md5 of the
    salted value): referential integrity survives — the same input maps
    to the same token across tables and runs with the same salt — but
    the raw identifier leaves the dataset. The join-safe complement to
    ``textops.scrub_pii``'s free-text scrubbing."""
    out = df
    for c in cols:
        out = out.withColumn(c, F.md5(F.concat(F.lit(salt), F.col(c).cast("string"))))
    return out


def table_fingerprint(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Order-insensitive whole-table checksum: one row of
    ``(n_rows, checksum)`` where checksum = Σ over rows of the 48-bit
    integer prefix of ``md5(row)`` — the migration/anti-entropy
    primitive ("is the copied 100 TB table THE SAME table?") that
    needs no sort, no sampling, and no row pairing: sums are
    order-insensitive and distribute perfectly (map-side partial
    combine; the exchange carries one partial per partition).

    Row canonicalization is INJECTIVE: each field is length-prefixed
    (``len:value``) with a distinct NULL marker, so ``("a","")`` and
    ``("","a")`` — or a value containing the separator — cannot
    collide structurally (the ADVICE-r6 separator lesson). The sum is
    exact DECIMAL(38) (up to ~10^12 rows × 2^48 fits with >20 orders
    of margin); engines replaying the same md5 algebra produce the
    identical integer. Numeric columns should be cast to exact
    integers/strings by the caller — float formatting is
    engine-private.
    """
    cols = list(cols or df.columns)
    parts: list[Column] = []
    for c in cols:
        sc = F.col(c).cast("string")
        parts.append(
            F.when(F.col(c).isNull(), F.lit("N:")).otherwise(
                F.concat(F.length(sc).cast("string"), F.lit(":"), sc)
            )
        )
    row = F.concat(*parts)
    h48 = F.conv(F.substring(F.md5(row), 1, 12), 16, 10).cast("long")
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(h48.cast("decimal(38,0)")).alias("checksum"),
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Keyed diff of two table versions — the companion to
    :func:`table_fingerprint` when the checksums DISAGREE and you need
    to know why: one row per key present in either version, with
    ``diff_status`` in {added, removed, changed, unchanged} (changed =
    same key, different md5 over the injectively length-prefixed
    compare columns).

    Plan/scale: each side collapses to (key, row-digest) BEFORE the
    full-outer join — 16-byte digests through both exchanges instead
    of whole rows; the join is key-partitioned, AQE-sized. Keys are
    assumed unique per side (pre-aggregate with dedup_first_per_key
    otherwise).
    """
    def digest(df: DataFrame) -> Column:
        cols = list(compare_cols or [c for c in df.columns if c not in key_cols])
        parts: list[Column] = []
        for c in cols:
            sc = F.col(c).cast("string")
            parts.append(
                F.when(F.col(c).isNull(), F.lit("N:")).otherwise(
                    F.concat(F.length(sc).cast("string"), F.lit(":"), sc)
                )
            )
        return F.md5(F.concat(*parts))

    o = old.select(*key_cols, digest(old).alias("_oh"))
    n = new.select(*key_cols, digest(new).alias("_nh"))
    joined = o.join(n, on=list(key_cols), how="full")
    status = (
        F.when(F.col("_oh").isNull(), F.lit("added"))
        .when(F.col("_nh").isNull(), F.lit("removed"))
        .when(F.col("_oh") != F.col("_nh"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(*key_cols, status.alias("diff_status"))


def validate_constraints(
    df: DataFrame,
    rules: Sequence[dict],
) -> DataFrame:
    """Declarative constraint validation — the expectations engine
    (Deequ / Great-Expectations shape) a production table runs before
    anything trains on it. Each rule is a dict:

    - ``{"rule": "not_null", "column": c}``
    - ``{"rule": "in_range", "column": c, "lo": x, "hi": y}`` —
      violations are non-null values outside ``[lo, hi]``
    - ``{"rule": "in_set", "column": c, "values": [...]}``
    - ``{"rule": "regex", "column": c, "pattern": r"..."}`` — non-null
      values NOT fully matching
    - ``{"rule": "unique", "columns": [c, ...]}`` — violations =
      surplus copies (``n_rows − n_distinct_keys``)
    - ``{"rule": "foreign_key", "column": c, "ref": DataFrame,
      "ref_column": rc}`` — non-null values absent from the reference

    Returns one row per rule: ``(rule_id, rule, column, n_rows,
    n_violations)`` — data, not exceptions, so a scheduler can gate on
    thresholds and a dashboard can trend them.

    Plan/scale: ALL row-local rules (not_null / in_range / in_set /
    regex) fuse into a SINGLE scan + aggregate — one pass over the
    100 TB table no matter how many such rules. ``unique`` costs one
    hash aggregate per distinct key-set; ``foreign_key`` one
    anti-join counted (AQE broadcasts the reference while it fits).
    The result is a union of 1-row aggregates — bounded by |rules|.
    """
    row_local: list[tuple[str, str, str, Column]] = []
    frames: dict[str, DataFrame] = {}
    order: list[str] = []
    for i, r in enumerate(rules):
        kind = r["rule"]
        rid = f"r{i}"
        order.append(rid)
        if kind == "not_null":
            c = F.col(r["column"])
            row_local.append((rid, kind, r["column"], c.isNull()))
        elif kind == "in_range":
            c = F.col(r["column"])
            bad = c.isNotNull() & ((c < F.lit(r["lo"])) | (c > F.lit(r["hi"])))
            row_local.append((rid, kind, r["column"], bad))
        elif kind == "in_set":
            c = F.col(r["column"])
            bad = c.isNotNull() & ~c.isin(list(r["values"]))
            row_local.append((rid, kind, r["column"], bad))
        elif kind == "regex":
            c = F.col(r["column"])
            bad = c.isNotNull() & ~c.rlike(r["pattern"])
            row_local.append((rid, kind, r["column"], bad))
        elif kind == "unique":
            cols = list(r["columns"])
            per_key = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("_c"))
            frames[rid] = per_key.agg(
                F.lit(rid).alias("rule_id"),
                F.lit(kind).alias("rule"),
                F.lit(",".join(cols)).alias("column"),
                F.sum("_c").cast("long").alias("n_rows"),
                (F.sum("_c") - F.count(F.lit(1)))
                .cast("long")
                .alias("n_violations"),
            )
        elif kind == "foreign_key":
            c, ref, rc = r["column"], r["ref"], r["ref_column"]
            missing = (
                df.select(F.col(c).alias("_k"))
                .filter(F.col("_k").isNotNull())
                .join(
                    ref.select(F.col(rc).alias("_k")).distinct(),
                    on="_k",
                    how="left_anti",
                )
            )
            n_rows = df.agg(F.count(F.lit(1)).alias("_n"))
            frames[rid] = (
                missing.agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
                .crossJoin(F.broadcast(n_rows))
                .select(
                    F.lit(rid).alias("rule_id"),
                    F.lit(kind).alias("rule"),
                    F.lit(c).alias("column"),
                    F.col("_n").cast("long").alias("n_rows"),
                    "n_violations",
                )
            )
        else:
            raise ValueError(f"unknown rule kind: {kind!r}")
    if row_local:
        aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
        for rid, _, _, bad in row_local:
            aggs.append(
                F.sum(F.when(bad, 1).otherwise(0)).cast("long").alias(f"_v_{rid}")
            )
        one = df.agg(*aggs)
        for rid, kind, col, _ in row_local:
            frames[rid] = one.select(
                F.lit(rid).alias("rule_id"),
                F.lit(kind).alias("rule"),
                F.lit(col).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_v_{rid}").alias("n_violations"),
            )
    if not frames:
        raise ValueError("validate_constraints: no rules given")
    ordered = [frames[rid] for rid in order]
    out = ordered[0]
    for f in ordered[1:]:
        out = out.unionByName(f)
    return out


def k_anonymity(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination — the
    re-identification risk gate a training corpus carrying user
    attributes runs before release (Sweeney 2002). A row is AT RISK
    when its quasi-identifier tuple is shared by fewer than ``k``
    rows.

    Returns ONE summary row: ``(k, n_rows, n_groups,
    n_violating_groups, n_rows_at_risk, at_risk_ppm)`` — ppm as exact
    integer floor division (the engine's no-half-boundary rule).
    Suppressing the at-risk rows (an anti-join on the violating
    tuples) yields a k-anonymous table; this operator measures, the
    caller decides.

    Plan/scale: ONE hash aggregate to |quasi tuples| rows (map-side
    combined), one bounded finishing aggregate. The raw table is
    scanned once; nothing key-sized reaches the driver.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    per = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("_c"))
    return per.agg(
        F.lit(k).cast("int").alias("k"),
        F.sum("_c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(F.col("_c") < k, 1).otherwise(0))
        .cast("long")
        .alias("n_violating_groups"),
        F.sum(F.when(F.col("_c") < k, F.col("_c")).otherwise(0))
        .cast("long")
        .alias("n_rows_at_risk"),
    ).withColumn(
        "at_risk_ppm",
        F.expr("(n_rows_at_risk * 1000000) div n_rows").cast("long"),
    )


def golden_record(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_cols: Sequence[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Survivorship merge (the MDM "golden record"): one row per key
    where each field independently takes its MOST RECENT NON-NULL
    value by ``order_col`` — sparse updates coalesce into a complete
    profile instead of the newest row's nulls clobbering older facts
    (which is what ``dedup_first_per_key`` on recency gives you).

    Determinism: ``max_by(value, IF(value IS NOT NULL, order))`` —
    the ordering expression is NULL exactly where the value is, and
    max_by ignores null orderings, so each field picks its own latest
    non-null independently. Ties on ``order_col`` break on
    ``tiebreak_col`` (pass one whenever order values can repeat —
    max_by on tied orderings is otherwise engine-arbitrary).

    Plan/scale: ONE hash aggregate with map-side partial combine —
    per key and field, only the current (value, order) champion
    crosses the shuffle, never the row history. Contrast the window
    formulation (full history shuffled, then filtered).
    """
    order = F.col(order_col)
    if tiebreak_col is not None:
        order = F.struct(F.col(order_col), F.col(tiebreak_col))
    aggs = [
        F.max_by(
            F.col(c), F.when(F.col(c).isNotNull(), order)
        ).alias(c)
        for c in value_cols
    ]
    aggs.append(F.count(F.lit(1)).cast("long").alias("n_versions"))
    aggs.append(F.max(order_col).alias(f"last_{order_col}"))
    return df.groupBy(*key_cols).agg(*aggs)


BENFORD_PPM = {
    d: int(1_000_000 * math.log10(1 + 1 / d)) for d in range(1, 10)
}


def benford_profile(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    decimals: int = 2,
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic fabricated-/synthetic-feed detector for naturally-grown
    magnitudes (amounts, populations, file sizes): genuine data leads
    with 1 about 30.1% of the time; generated or clipped feeds flatten
    toward 11.1%. Complements :func:`validate_constraints` (rule
    violations) with a DISTRIBUTIONAL audit.

    Only POSITIVE values participate (Benford is undefined at zero and
    sign-symmetric magnitudes should be ``abs``'d by the caller — an
    implicit abs here would silently merge refunds into sales). The
    first digit comes from the decimal rendering of the exact
    ``decimals``-dp integer, so no float log/pow is in the path;
    observed shares are exact integer-ppm floors and the Benford
    expectations are nine PLAN-TIME constants (``BENFORD_PPM``) shared
    verbatim with any replaying oracle.

    Plan/scale: ONE partial-combined aggregate to ≤ 9·|groups| rows,
    plus a broadcast-sized group-total join — nothing else.
    """
    scale = 10 ** decimals
    keys = list(group_cols)
    c = F.round(F.col(value_col) * scale).cast("long")
    digits = (
        df.select(*keys, c.alias("_c"))
        .filter(F.col("_c") > 0)
        .withColumn(
            "digit", F.substring(F.col("_c").cast("string"), 1, 1).cast("int")
        )
        .groupBy(*keys, "digit")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    totals = digits.groupBy(*keys).agg(F.sum("n_rows").alias("_n"))
    obs = F.col("n_rows") * 1_000_000
    exp_ppm = F.element_at(
        F.create_map(
            *[
                lit
                for d, p in BENFORD_PPM.items()
                for lit in (F.lit(d), F.lit(p).cast("long"))
            ]
        ),
        F.col("digit"),
    )
    # Empty group_cols means ONE global profile: join(on=[]) raises at
    # runtime, but the totals frame is then a single row — a broadcast
    # crossJoin attaches it with no shuffle (ADVICE r10).
    joined = (
        digits.join(totals, on=keys)
        if keys
        else digits.crossJoin(F.broadcast(totals))
    )
    return (
        joined
        .select(
            *keys,
            "digit",
            "n_rows",
            ((obs - obs % F.col("_n")) / F.col("_n")).cast("long").alias(
                "obs_ppm"
            ),
            exp_ppm.alias("benford_ppm"),
        )
        .withColumn("dev_ppm", F.col("obs_ppm") - F.col("benford_ppm"))
    )
