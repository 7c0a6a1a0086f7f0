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


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    min_count: int | None = None,
    min_frac: float | None = None,
    candidate_pool: int = 1024,
    max_tracked: int = 10_000,
) -> DataFrame:
    """All values of ``key_col`` occurring at least ``min_count``
    times (or ``min_frac`` of the rows), with EXACT counts — the
    classic φ-heavy-hitter query, and the missing input to this
    module's own mitigations: run it first, then feed the hot keys
    into ``salted_sum`` sizing / ``window_count_share(skew_safe=…)``
    decisions instead of guessing.

    Two-pass shape built for open key domains:

    1. **Candidates** via Spark's ``approx_top_k`` sketch aggregate —
       one pass, partial-combined per partition, driver result bounded
       by ``candidate_pool``. The sketch is EXACT while the column's
       distinct count stays ≤ ``max_tracked``; beyond that it is a
       best-effort top-k (counts may be estimates), which is precisely
       the regime where pass 2 matters.
    2. **Exact verify** — the corpus filters to the candidate set (an
       ``isin`` literal list pushed into the scan; never a shuffle of
       the full domain) and counts ONLY those keys, so the expensive
       exact aggregation touches ``candidate_pool`` keys instead of
       the open domain.

    Completeness guard: if every candidate clears the floor AND the
    sketch returned a full pool, the pool may have been truncated
    below the floor — the threshold set is then not provably complete
    and the operator raises rather than silently under-reporting
    (widen ``candidate_pool`` or raise the floor).

    Exactly one of ``min_count`` / ``min_frac`` must be given.
    ``min_frac`` costs one extra count() action over the input.
    """
    if (min_count is None) == (min_frac is None):
        raise ValueError("give exactly one of min_count / min_frac")
    if min_count is None:
        min_count = max(int(df.count() * min_frac), 1)
    pool = max(candidate_pool, 1)
    sketch = df.agg(
        F.expr(
            f"approx_top_k(`{key_col}`, {pool}, {max(max_tracked, pool)})"
        ).alias("tk")
    ).collect()[0]["tk"]
    candidates = [r["item"] for r in sketch]
    if len(candidates) == pool and all(r["count"] >= min_count for r in sketch):
        raise ValueError(
            f"heavy_hitters: all {pool} sketch candidates clear the floor "
            f"({min_count}); the candidate pool is likely truncated — widen "
            "candidate_pool or raise the floor"
        )
    exact = (
        df.filter(F.col(key_col).isin(candidates))
        .groupBy(key_col)
        .agg(F.count("*").alias("count"))
        .filter(F.col("count") >= min_count)
    )
    return exact


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join for when a hot key would funnel through one
    reducer AND the small side is too big to broadcast: every big-side
    row gets a salt from a hash of its full row, the small side
    replicates ``num_salts``× via a narrow ``explode(sequence)``, and
    the join keys on (key, salt) — the hot key's probe rows spread
    over ``num_salts`` reducers.

    Semantics identical to the plain join (the salt is a pure routing
    artifact, dropped on output; replication multiplies no results
    because each big row carries exactly ONE salt) — for the
    big-side-preserving join types only, which is why ``how`` is
    validated: with ``right``/``full``/``right_semi`` each UNMATCHED
    small-side replica would emit its own null-extended (or semi) row,
    duplicating output ``num_salts``× vs the plain join (ADVICE r7).
    Salt the other side instead for a right-preserving variant.
    Prefer AQE's automatic skew-join split where it fires — this
    operator is for the cases it can't see (skew materializing after a
    transformation, or non-shuffle-file inputs) and as the explicit,
    plan-stable form. Cost: small side ships num_salts× through its
    exchange — bounded and chosen by the caller.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "cross",
               "semi", "left_semi", "leftsemi", "anti", "left_anti",
               "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is not big-side-preserving; "
            "unmatched small-side replicas would duplicate rows "
            f"num_salts x (allowed: {sorted(allowed)})"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(num_salts))
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    cond = (b[big_key] == s[small_key]) & (b["_salt"] == s["_salt"])
    out = b.join(s, cond, how)
    return out.drop(b["_salt"]).drop(s["_salt"]).drop(s[small_key])


def key_skew_profile(
    df: DataFrame,
    key_cols: Sequence[str],
    top_n: int = 20,
) -> DataFrame:
    """Skew diagnostic for shuffle planning: the ``top_n`` heaviest
    keys with exact count, dense 1..k rank, share of all rows in ppm
    (integer floor — hash-stable), and cumulative ppm. This is the
    evidence read before reaching for ``salted_join``/``salted_sum``
    or a broadcast: a top key at 300000 ppm says one reducer owns
    30 % of the shuffle.

    Exactness: the ppm numerators are ``decimal(38,0)`` products and
    the floor division is computed as ``(a - a % b) / b`` — both
    operands exact, the quotient an exactly-representable integer —
    so no float rounding can flip a boundary (the dsir_logweights
    lesson). Plan: one grouped count (map-side partial combine), a
    1-row total broadcast back, then :func:`ranked_top_k` for the
    head — ranking and the cumulative window run on an already-k-row
    single-partition child, so no unbounded single-partition exchange
    exists anywhere.
    """
    from pyspark.sql import Window

    from gem_data_wrangle_spark.operators.aggregates import ranked_top_k

    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    tot = counts.agg(F.sum("n_rows").cast("decimal(38,0)").alias("_tot"))
    top = ranked_top_k(
        counts,
        [F.col("n_rows").desc(), *[F.col(c) for c in key_cols]],
        top_n,
    )
    w = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)

    def ppm_floor(n):
        a = (n.cast("decimal(38,0)") * 1_000_000).cast("decimal(38,0)")
        b = F.col("_tot")
        return ((a - a % b) / b).cast("long")

    return top.crossJoin(F.broadcast(tot)).select(
        *key_cols,
        "n_rows",
        "rank",
        ppm_floor(F.col("n_rows")).alias("share_ppm"),
        ppm_floor(F.sum("n_rows").over(w)).alias("cum_ppm"),
    )
