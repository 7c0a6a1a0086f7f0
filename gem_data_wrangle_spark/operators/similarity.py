"""Vector similarity search over embedding columns.

Brute-force cosine top-k as the correctness baseline, and a random
hyperplane (sign-LSH) bucketed variant as the scale path. Dot products
are computed with JVM higher-order functions (``zip_with`` +
``aggregate``) over double-cast arrays — sequential left-to-right
summation, bit-reproducible in any engine that evaluates the same
order (the DuckDB oracle does).

Scale notes:
  * Brute force is a broadcast nested loop: the *probe* set is small
    (broadcast), the corpus streams — O(|corpus|·|probes|) FLOPs but no
    shuffle of the corpus. Fine for ≤10³ probes; beyond that, use LSH.
  * Sign-LSH buckets the corpus once (narrow), then joins probe buckets
    — candidate sets shrink by ~2^planes, trading recall for compute.
    Hyperplanes are fixed ±1 matrices from a seeded RNG (deterministic,
    embeddable in an oracle query).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Deterministic ±1 hyperplanes: seed fixed so Spark and any oracle SQL
# share the exact constants. Shape (planes, dim).
_LSH_SEED = 20240813


def hyperplanes(num_planes: int, dim: int, seed: int = _LSH_SEED) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 2, size=(num_planes, dim)) * 2.0 - 1.0).tolist()


def plane_tables(
    num_tables: int, num_planes: int, dim: int, seed: int = _LSH_SEED
) -> list[list[list[float]]]:
    """OR-amplified sign-LSH geometry (round 15, VERDICT r14 item 6):
    ``num_tables`` independently-seeded plane tables, ready to pass as
    the ``planes=`` argument of the embedding screen family
    (:func:`embedding_against_index`, ``stream_embedding_screen``) and
    :func:`embedding_index_signatures`. Replaces the hand-rolled
    ``[hyperplanes(..), hyperplanes(.., seed=+k)]`` assembly — a
    caller who picks colliding seeds gets duplicate tables, which
    silently buys NOTHING (identical buckets OR to themselves).

    The two knobs, with measured numbers (SCALE.md round 14/15 recall
    grids): ``num_planes`` sets per-table candidate cost and
    candidate-stage precision (P(bucket collision) = (1-θ/π)^planes —
    recall per table FALLS as planes rise); ``num_tables`` is the
    recall knob (1-(1-P)^tables, candidate cost ∝ tables). The screen
    recipe at growing index: planes ≈ base + log2(index growth) keeps
    per-bucket population flat, tables sized to the recall target.
    Seeds stride 7919 (prime) from ``seed`` — the same convention as
    ``tools/embed_recall.py``, so its measured grid rows transfer.

    ``num_tables=1`` returns the nested single-table form, which the
    screens accept identically to a bare table."""
    if num_tables < 1:
        raise ValueError("num_tables must be >= 1")
    return [
        hyperplanes(num_planes, dim, seed=seed + 7919 * t)
        for t in range(num_tables)
    ]


def provision_embedding_screen(
    duty_cos: float,
    recall_target: float,
    index_rows: int,
    bucket_pop_target: int = 16,
    max_tables: int = 64,
) -> tuple[int, int]:
    """Size the sign-LSH geometry for an embedding screen from its
    DUTY — ``(duty_cos, recall_target, index horizon)`` →
    ``(num_planes, num_tables)`` ready for :func:`plane_tables`
    (round 16, VERDICT r15 item 5: the SCALE.md round-15 recall grid
    plus the Charikar formula prescribed this sizing in prose; this
    helper applies it so callers stop hand-reading tables).

    The two-knob model the measured grids validate (SCALE.md rounds
    14-15): a pair at angle θ collides on one plane with probability
    ``p = 1 − θ/π`` (Charikar, SimHash/sign-LSH), per table with
    ``P = p^planes``, across T OR-amplified tables with ``1−(1−P)^T``.
    Provisioning evaluates p AT the duty threshold — the
    hardest-to-catch pair the screen must still recall — so the
    returned geometry is a LOWER bound on realized recall (pairs above
    the threshold collide more often; measured 4×16 = 0.975 @ cos≥0.3
    versus the formula's 0.886 floor at 16 tables).

    Knob derivation, in order:

    1. **Planes for the index horizon** (verify-join cost): the
       asymmetric curves show per-batch wall stays flat only while
       per-(table, bucket) population stays O(1), so
       ``planes_pop = ceil(log2(index_rows / bucket_pop_target))`` —
       the "4 + log2(growth)" recipe evaluated once at the horizon
       (streaming geometry cannot be rescaled after deployment: the
       plane set is the bucket-match contract across the whole index).
    2. **Planes capped by the recall budget**: each added plane
       divides per-table recall by ``1/p``, and at weak duty
       thresholds tables cannot affordably compensate (measured
       exchange rate: 4×16 = 0.975 versus 9×32 = 0.535 versus
       12×64 = 0.356 at cos≥0.3). With at most ``max_tables`` tables
       the per-table collision must stay above
       ``P_min = 1 − (1−recall_target)^(1/max_tables)``, i.e.
       ``planes ≤ log(P_min)/log(p)``. The returned plane count is
       ``min`` of the two — when the cap bites (weak duty + deep
       horizon), per-bucket population exceeds the target and the
       verify join grows with the corpus: that is the measured
       reality (SCALE.md round-15 finding 3 — at weak thresholds,
       bound population by corpus sizing, not over-planing), surfaced
       here instead of silently returning an unreachable recall.
    3. **Tables for the recall target** at the chosen plane count:
       ``T = ceil(log(1−recall_target) / log(1−p^planes))``.

    Measured anchors (``tools/embed_recall.py`` grid, sf0.01,
    pinned by ``tests/test_round16_fixes.py``): duty cos≥0.3 with a
    250-vector horizon provisions (4, 16) — the grid's production row,
    realized recall 0.975; near-dup duty cos≥0.8 at a 65k horizon
    provisions 12 planes and ~31 tables, matching the grid's
    extrapolated near-dup corner.

    Raises ``ValueError`` when the target is UNREACHABLE: if a single
    plane's collision rate already sits below the per-table floor the
    table budget demands (weak duty + small ``max_tables`` + high
    recall), no geometry with ≥ 1 plane can reach the target within
    ``max_tables`` — returning more tables would silently blow the
    candidate-cost budget (round-16 property sweep), so the helper
    refuses exactly that region; the property test pins the refusal
    boundary at ``p < p_min``.
    """
    import math  # noqa: PLC0415

    if not -1.0 < duty_cos < 1.0:
        raise ValueError("duty_cos must be in (-1, 1)")
    if not 0.0 < recall_target < 1.0:
        raise ValueError("recall_target must be in (0, 1)")
    if index_rows < 1 or bucket_pop_target < 1 or max_tables < 1:
        raise ValueError(
            "index_rows, bucket_pop_target, max_tables must be >= 1"
        )
    p = 1.0 - math.acos(duty_cos) / math.pi
    planes_pop = max(
        1, math.ceil(math.log2(max(1.0, index_rows / bucket_pop_target)))
    )
    p_min = 1.0 - (1.0 - recall_target) ** (1.0 / max_tables)
    if p < p_min:
        # even ONE plane sits below the per-table collision floor the
        # table budget demands — no geometry with >= 1 plane reaches
        # the target within max_tables. Returning tables > max_tables
        # would silently blow the candidate-cost budget (found by the
        # round-16 property sweep); fail loud like the rest of the
        # screen family.
        raise ValueError(
            f"recall_target={recall_target} is unreachable within "
            f"max_tables={max_tables} at duty_cos={duty_cos}: a single "
            f"plane's collision rate p={p:.4f} is already below the "
            f"required per-table floor {p_min:.4f} — raise max_tables, "
            "lower the recall target, or tighten the duty threshold"
        )
    planes_cap = max(1, math.floor(math.log(p_min) / math.log(p)))
    planes = min(planes_pop, planes_cap)
    per_table = p ** planes
    tables = max(
        1,
        math.ceil(
            math.log(1.0 - recall_target) / math.log(1.0 - per_table)
        ),
    )
    return planes, tables


def dot(a: Column, b: Column) -> Column:
    """Sequential dot product of two array<double> columns (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either vector has zero norm —
    cosine is undefined there, ANSI Spark would raise DIVIDE_BY_ZERO
    (found by the round-5 degenerate-input sweep: one all-zero
    embedding — a padding row, a failed embedding job — crashed every
    cosine-based operator), and DuckDB's x/0.0 yields NULL, so NULL is
    also the oracle-parity answer. Downstream: the top-k operators
    filter NULL scores out explicitly (undefined similarity is no
    result, not a trailing rank), threshold filters drop NULL (a zero
    vector is never anyone's near-duplicate)."""
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom)


def euclidean(a: Column, b: Column) -> Column:
    """Euclidean distance of two array<double> columns — a sequential
    left fold over squared diffs, so the float64 result is bit-stable
    across engines that sum in array order."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def as_double_array(col: Column | str) -> Column:
    """Normalize array<float> → array<double> so all engines compute in
    float64 (bit-parity with the oracle)."""
    return F.transform(col, lambda x: x.cast("double"))


def quantize_embeddings(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    out_col: str = "q",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: each component maps to
    ``round(x * 127 / max(|x|))`` — the standard storage/ANN
    compression step before bulk similarity search (4× smaller than
    float32, 8× than float64). All-zero vectors quantize to zeros.

    The ``max(|x|)`` scale is materialized as a column BEFORE the
    per-component transform; referencing it as an outer expression
    inside the lambda would recompute the array max per element
    (O(dim²)). Integer output makes the operator engine-portable for
    differential testing.

    Scale: narrow per-row math, no shuffle.
    """
    a = as_double_array(vec_col)
    out = df.withColumn("_ma", F.array_max(F.transform(a, lambda x: F.abs(x))))
    q = F.when(
        F.col("_ma") > 0,
        F.transform(a, lambda x: F.round(x * F.lit(127.0) / F.col("_ma")).cast("int")),
    ).otherwise(F.transform(a, lambda x: F.lit(0)))
    return out.withColumn(out_col, q).drop("_ma")


def cosine_topk(
    corpus: DataFrame,
    probes: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    probe_id: str = "query_id",
) -> DataFrame:
    """Brute-force cosine top-k: for each probe vector, the k nearest
    corpus vectors (excluding itself). Returns (query_id, neighbor_id,
    rank) — integer-only output so differential tests are float-safe;
    ties broken by neighbor id.
    """
    # norms are per-ROW columns computed before the join — inside the
    # pairwise expression they'd be folded per PAIR (and the zero-norm
    # guard would evaluate its denominator twice per pair); hoisting
    # keeps the exact NULL-on-zero-norm semantics at n instead of
    # n·pairs sqrt-folds (r6 semdedup triage: this was the whole
    # 3.3→4.4 s bench rise)
    p = probes.select(
        F.col(id_col).alias(probe_id), as_double_array(vec_col).alias("_pv")
    ).withColumn("_pn", norm(F.col("_pv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(vec_col).alias("_cv")
    ).withColumn("_cn", norm(F.col("_cv")))
    scored = (
        c.crossJoin(F.broadcast(p))
        .filter(F.col("neighbor_id") != F.col(probe_id))
        .withColumn(
            "_cos",
            F.when(
                (F.col("_cn") > 0) & (F.col("_pn") > 0),
                dot(F.col("_pv"), F.col("_cv")) / (F.col("_cn") * F.col("_pn")),
            ),
        )
        # undefined similarity (zero-norm side) is no result, not a
        # trailing rank — see cosine()
        .filter(F.col("_cos").isNotNull())
    )
    w = Window.partitionBy(probe_id).orderBy(F.desc("_cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(probe_id, "neighbor_id", "rank")
    )


def _lit_double_array(values) -> Column:
    """A literal ``array<double>`` in ONE driver round-trip.

    ``F.array(*[F.lit(v) …])`` pays len(values) py4j commands and
    ``F.lit(list)``/``F.lit(ndarray)`` still convert element-by-element
    inside py4j's collection converter (measured: a 64-dim plane cost
    64+ socket commands either way). One ``F.expr`` parse of the
    rendered SQL literal costs exactly one command; the ``D`` suffix
    keeps the SQL lexer from reading the doubles as DECIMAL, and
    ``repr`` round-trips float64 exactly. The optimized plan is
    identical to the element-wise form (CreateArray of foldable
    literals constant-folds to the same array literal — pinned in
    tests/test_round17_fixes.py). Non-finite values fall back to the
    element-wise builder (no SQL literal form)."""
    vals = [float(v) for v in values]
    if all(np.isfinite(vals)):
        return F.expr("array(" + ", ".join(f"{v!r}D" for v in vals) + ")")
    return F.array(*[F.lit(v) for v in vals])


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: one bit per hyperplane (dot > 0).

    Construction note (r17): each plane array is ONE server-side
    literal parse (:func:`_lit_double_array`) — an 8×64 geometry costs
    8 driver commands instead of 512+. Measured on
    embedding_neardup_incremental: the three bucket expressions were
    ~0.6 s of that query's 1.5 s construction before the change."""
    bits = []
    for plane in planes:
        plane_col = _lit_double_array(plane)
        bits.append(F.when(dot(vec_col, plane_col) > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def auto_grid_dims(n_rows: int, target_cell_size: int = 64, floor: int = 1) -> int:
    """Resolution for :func:`sign_grid_cell` that keeps expected cell
    population bounded as the corpus grows: ``2^dims ≈ n / target`` →
    ``dims = ceil(log2(n / target))``. This is the scale knob the 30×
    stress test measures (fixed dims=3 went 154× at 30× the vectors;
    resolution-scaled stayed ~linear — SCALE.md); deriving it from the
    row count removes the manual knob (VERDICT r2 item 6)."""
    import math  # noqa: PLC0415

    if n_rows <= target_cell_size:
        return floor
    return max(floor, math.ceil(math.log2(n_rows / target_cell_size)))


def sign_grid_cell(vec: Column, dims: int = 3) -> Column:
    """Deterministic coarse quantizer: one bit per leading dimension's
    sign → ``2^dims`` cells. Engine-portable (replayable in any SQL
    dialect), used where a differential oracle must reproduce the cell
    assignment exactly."""
    bits = [
        F.when(F.element_at(vec, i + 1) > 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(dims)
    ]
    return F.concat(*bits)


def _assign_cells(
    c: DataFrame,
    p: DataFrame,
    cell_assigner,
    num_centroids: int,
    seed: int,
    nprobe: int,
) -> tuple[DataFrame, DataFrame]:
    """Shared coarse quantization for the IVF family (:func:`ivf_topk`,
    :func:`ivfpq_topk`): attach a ``_cell`` column to the corpus frame
    ``c`` (vector column ``_cv``) and probe frame ``p`` (vector column
    ``_pv``). ``cell_assigner`` (Column→Column, e.g.
    :func:`sign_grid_cell`) is the engine-portable path a SQL oracle
    can replay; ``None`` selects seeded ``pyspark.ml`` KMeans (the
    production quantizer — deterministic per seed, not SQL-replayable).
    ``nprobe > 1`` (KMeans path only) explodes each probe into its
    ``nprobe`` nearest centroids' cells — standard IVF multi-probe,
    the recall knob for true neighbors just across a Voronoi
    boundary."""
    if cell_assigner is not None and nprobe > 1:
        raise ValueError(
            "nprobe > 1 requires the KMeans path (centroid distances); "
            "the portable cell_assigner has no distance structure"
        )
    if cell_assigner is not None:
        return (
            c.withColumn("_cell", cell_assigner(F.col("_cv"))),
            p.withColumn("_cell", cell_assigner(F.col("_pv"))),
        )
    try:
        from pyspark.ml.clustering import KMeans  # noqa: PLC0415
        from pyspark.ml.functions import array_to_vector  # noqa: PLC0415
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError("pyspark.ml required for IVF") from exc

    c = c.withColumn("_mlv", array_to_vector(F.col("_cv")))
    model = KMeans(
        k=num_centroids, seed=seed, featuresCol="_mlv", predictionCol="_cell"
    ).fit(c)
    c = model.transform(c).drop("_mlv")
    if nprobe <= 1:
        p = p.withColumn("_mlv", array_to_vector(F.col("_pv")))
        p = model.transform(p).drop("_mlv")
    else:
        # multi-probe: rank this probe against every centroid (the
        # centers are a bounded literal — ≤ num_centroids arrays)
        # and explode the nprobe nearest cell ids
        centers = [ctr.tolist() for ctr in model.clusterCenters()]
        dist_cells = F.array(
            *[
                F.struct(
                    # one literal parse per centroid, not dim lits (r17)
                    euclidean(F.col("_pv"), _lit_double_array(ctr)).alias("d"),
                    F.lit(i).alias("cell"),
                )
                for i, ctr in enumerate(centers)
            ]
        )
        p = p.withColumn(
            "_cell",
            F.explode(
                F.transform(
                    F.slice(F.array_sort(dist_cells), 1, min(nprobe, len(centers))),
                    lambda s: s["cell"],
                )
            ),
        )
    return c, p


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    num_centroids: int = 16,
    probe_id: str = "query_id",
    seed: int = 42,
    cell_assigner=None,
    nprobe: int = 1,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus, restrict candidates
    to the probe's nearest cell(s), rank by exact cosine inside them.
    The inverted-file structure is just a cluster-id column —
    candidate generation becomes an equi-join, which Spark shuffles by
    cell (or broadcasts the probe side, as here).

    ``nprobe`` is the recall knob (standard IVF multi-probe): each
    probe searches its ``nprobe`` nearest centroids' cells instead of
    one — a true neighbor just across a Voronoi boundary is recovered
    at candidate cost ∝ nprobe. Measured on the sf0.1 embeddings
    (``tools/ann_recall.py``, SCALE.md): nprobe=1 at 16 cells = 0.29
    recall@10; the nprobe curve recovers it. KMeans path only: the
    centroid distances come from the fitted model's centers (a
    bounded ≤``num_centroids``-row broadcast into the probe-side
    expression); the portable ``cell_assigner`` path stays nprobe=1
    so its SQL oracle keeps replaying the exact cell assignment.

    The quantizer is pluggable: default is seeded ``pyspark.ml`` KMeans
    (the production path — cluster assignments are deterministic for a
    seed but not SQL-replayable, so differential checks are rows-only);
    pass ``cell_assigner`` (Column→Column, e.g. ``sign_grid_cell``) for
    an engine-portable assignment that a SQL oracle can mirror exactly.

    Scale: one KMeans fit over the corpus (sampled fit is fine at
    100 TB), then a narrow transform per side; no corpus² anything.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(vec_col).alias("_cv")
    )
    p = probes.select(
        F.col(id_col).alias(probe_id), as_double_array(vec_col).alias("_pv")
    )
    c, p = _assign_cells(c, p, cell_assigner, num_centroids, seed, nprobe)
    scored = (
        c.withColumn("_cn", norm(F.col("_cv")))
        .join(F.broadcast(p.withColumn("_pn", norm(F.col("_pv")))), on="_cell")
        .filter(F.col("neighbor_id") != F.col(probe_id))
        # per-row hoisted norms — see cosine_topk
        .withColumn(
            "_cos",
            F.when(
                (F.col("_cn") > 0) & (F.col("_pn") > 0),
                dot(F.col("_pv"), F.col("_cv")) / (F.col("_cn") * F.col("_pn")),
            ),
        )
        # undefined similarity (zero-norm side) is no result, not a
        # trailing rank — see cosine()
        .filter(F.col("_cos").isNotNull())
    )
    w = Window.partitionBy(probe_id).orderBy(F.desc("_cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(probe_id, "neighbor_id", "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    k: int = 10,
    num_planes: int = 8,
    probe_id: str = "query_id",
    num_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the probe's LSH
    bucket(s), ranked by exact cosine within them. ``dim`` is the
    embedding width, supplied by the caller — building the plan
    executes no action (no data peek).

    ``num_tables`` is the recall knob (OR-amplification — the same
    mechanism that makes the pyspark.ml variants high-recall): each
    table hashes with an independently-seeded plane set, and a
    candidate qualifies by colliding in ANY table. Recall measured on
    the sf0.1 embeddings (``tools/ann_recall.py``): 1 table at 8
    planes = 0.02 recall@10, the published multi-table curve recovers
    it (see SCALE.md) at candidate-set cost ∝ tables. ``num_tables=1``
    keeps the original single-bucket plan (and its SQL oracle)
    byte-identical."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(vec_col).alias("_cv")
    )
    p = probes.select(
        F.col(id_col).alias(probe_id), as_double_array(vec_col).alias("_pv")
    )
    if num_tables <= 1:
        planes = hyperplanes(num_planes, dim)
        cb = c.withColumn("bucket", lsh_bucket(F.col("_cv"), planes))
        pb = p.withColumn("bucket", lsh_bucket(F.col("_pv"), planes))
        cand = cb.withColumn("_cn", norm(F.col("_cv"))).join(
            F.broadcast(pb.withColumn("_pn", norm(F.col("_pv")))), on="bucket"
        )
    else:
        tables = [
            hyperplanes(num_planes, dim, seed=_LSH_SEED + 7919 * t)
            for t in range(num_tables)
        ]
        buckets = lambda v: F.array(  # noqa: E731
            *[
                F.struct(F.lit(t).alias("t"), lsh_bucket(v, pl).alias("b"))
                for t, pl in enumerate(tables)
            ]
        )
        cb = c.select("neighbor_id", "_cv", F.explode(buckets(F.col("_cv"))).alias("_tb"))
        pb = p.select(probe_id, "_pv", F.explode(buckets(F.col("_pv"))).alias("_tb"))
        # OR across tables: distinct (probe, neighbor) pairs first, so
        # a pair colliding in several tables scores once
        pair_ids = (
            cb.select("neighbor_id", "_tb")
            .join(F.broadcast(pb.select(probe_id, "_tb")), on="_tb")
            .select(probe_id, "neighbor_id")
            .distinct()
        )
        cand = (
            pair_ids.join(c.withColumn("_cn", norm(F.col("_cv"))), on="neighbor_id")
            .join(F.broadcast(p.withColumn("_pn", norm(F.col("_pv")))), on=probe_id)
        )
    scored = (
        cand.filter(F.col("neighbor_id") != F.col(probe_id))
        # per-row hoisted norms — see cosine_topk
        .withColumn(
            "_cos",
            F.when(
                (F.col("_cn") > 0) & (F.col("_pn") > 0),
                dot(F.col("_pv"), F.col("_cv")) / (F.col("_cn") * F.col("_pn")),
            ),
        )
        # undefined similarity (zero-norm side) is no result, not a
        # trailing rank — see cosine()
        .filter(F.col("_cos").isNotNull())
    )
    w = Window.partitionBy(probe_id).orderBy(F.desc("_cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(probe_id, "neighbor_id", "rank")
    )


def mean_pool_vectors(
    df: DataFrame,
    vec_col: str,
    group_col: str,
) -> DataFrame:
    """Element-wise mean of ``array<double>`` vectors per group — the
    chunk-embeddings→document-embedding pooling step (and the reduce
    half of a distributed KMeans centroid update).

    Shape: ``posexplode`` the vectors (narrow), average per (group,
    position) — ONE shuffle keyed by (group, pos), partial aggregation
    map-side — then reassemble the array with ``array_sort`` over
    (pos, value) structs. No UDF, no driver collection; vector width
    only multiplies the narrow explode, not the shuffle count.
    """
    exploded = df.select(
        F.col(group_col), F.posexplode(as_double_array(vec_col)).alias("_pos", "_x")
    )
    per_pos = exploded.groupBy(group_col, "_pos").agg(F.avg("_x").alias("_m"))
    return (
        per_pos.groupBy(group_col)
        .agg(F.array_sort(F.collect_list(F.struct("_pos", "_m"))).alias("_pm"))
        .select(
            F.col(group_col),
            F.transform("_pm", lambda s: s["_m"]).alias("mean_" + vec_col),
        )
    )


def kmeans_assign(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str,
    id_col: str,
    cent_vec_col: str | None = None,
    cent_id_col: str | None = None,
    max_centroids: int = 4096,
) -> DataFrame:
    """k-means ASSIGNMENT (the E step of distributed Lloyd, and the
    corpus-clustering primitive on its own): nearest centroid per
    vector by squared L2, ties to the lowest centroid id.

    Scale shape: the centroid table is MODEL-sized (k rows, bounded by
    ``max_centroids``), so it is collected to the driver — the same
    bounded-collect contract as the zipWithIndex kernel — then shipped
    back as ONE broadcast row (a nested-array model frame joined with
    ``F.broadcast`` cross join), NOT as expression literals: a trained
    k=4096 × dim=768 model inlined as literals bloats the codegen'd
    plan and every task binary (the "Broadcasting large task binary"
    warning), while a broadcast row ships once per executor via the
    torrent broadcast and the plan stays model-size-independent.
    Assignment is then a NARROW per-row argmin over the broadcast
    array column (``transform``/``aggregate`` higher-order functions):
    ZERO shuffles (a broadcast join is not an exchange of the corpus),
    linear in corpus size — the plan that survives 100 TB. A full
    Lloyd iteration is this + ``mean_pool_vectors`` grouped by
    ``cluster_id`` (one keyed shuffle for the M step).

    Returns ``id_col``, ``cluster_id``, ``sq_dist``. Distances are
    exact double sums in element order (identical arithmetic to the
    former literal form), so any engine replays them bit-identically.
    """
    from pyspark.sql.types import (  # noqa: PLC0415
        ArrayType, DoubleType, StructField, StructType,
    )

    cent_vec_col = cent_vec_col or vec_col
    cent_id_col = cent_id_col or id_col
    rows = centroids.select(cent_id_col, cent_vec_col).collect()  # bounded: k rows
    if len(rows) > max_centroids:
        raise ValueError(
            f"{len(rows)} centroids exceed max_centroids={max_centroids}; "
            "a centroid table is model-sized — raise the cap only if it "
            "still fits comfortably in the driver and the plan"
        )
    if not rows:
        raise ValueError("empty centroid table")
    rows.sort(key=lambda r: r[0])
    id_type = centroids.select(cent_id_col).schema.fields[0].dataType
    model = df.sparkSession.createDataFrame(
        [(
            [r[0] for r in rows],
            [[float(x) for x in r[1]] for r in rows],
        )],
        StructType([
            StructField("_cids", ArrayType(id_type)),
            StructField("_cvs", ArrayType(ArrayType(DoubleType()))),
        ]),
    )
    v = as_double_array(vec_col)
    dists = F.transform(
        F.col("_cvs"),
        lambda c: F.aggregate(
            F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    best = F.array_position(dists, F.array_min(dists))  # 1-based, first min
    return df.crossJoin(F.broadcast(model)).select(
        F.col(id_col),
        F.element_at(F.col("_cids"), best.cast("int")).alias("cluster_id"),
        F.element_at(dists, best.cast("int")).alias("sq_dist"),
    )


def kmeans_fit(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str,
    id_col: str,
    iters: int = 2,
    cent_vec_col: str | None = None,
    cent_id_col: str | None = None,
    max_centroids: int = 4096,
) -> list[tuple]:
    """Full distributed Lloyd TRAINING: ``iters`` rounds of
    E step (:func:`kmeans_assign` — narrow literal-centroid argmin,
    zero shuffles) + M step (:func:`mean_pool_vectors` grouped by
    ``cluster_id`` — one keyed shuffle with map-side partial
    aggregation, then a model-sized k-row collect, the same bounded
    contract as the assignment's centroid inlining). A cluster that
    loses every member keeps its previous centroid (the standard
    empty-cluster rule), so k never shrinks.

    Per-iteration cost at 100 TB: one corpus scan for the narrow
    assignment fused with the explode, one (cluster, dim)-keyed
    shuffle of k·dim partial means — the corpus is never joined or
    re-shuffled on a wide key, matching pyspark.ml's KMeans shape
    (treeAggregate over literal centers).

    Returns the fitted centroids as ``[(centroid_id, [double, ...]),
    ...]`` sorted by id — feed them back through ``spark
    .createDataFrame`` into :func:`kmeans_assign` for scoring.
    """
    cent_vec_col = cent_vec_col or vec_col
    cent_id_col = cent_id_col or id_col
    rows = centroids.select(cent_id_col, cent_vec_col).collect()  # bounded: k rows
    if len(rows) > max_centroids:
        raise ValueError(
            f"{len(rows)} centroids exceed max_centroids={max_centroids}"
        )
    cents = sorted((r[0], [float(x) for x in r[1]]) for r in rows)
    spark = df.sparkSession
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    id_field = centroids.select(cent_id_col).schema.fields[0]
    cent_schema = StructType(
        [
            StructField(cent_id_col, id_field.dataType),
            StructField(cent_vec_col, ArrayType(DoubleType())),
        ]
    )
    for _ in range(iters):
        cent_df = spark.createDataFrame(list(cents), cent_schema)
        assigned = kmeans_assign(
            df.select(F.col(id_col), F.col(vec_col)),
            cent_df,
            vec_col,
            id_col,
            cent_vec_col=cent_vec_col,
            cent_id_col=cent_id_col,
            max_centroids=max_centroids,
        )
        members = df.select(F.col(id_col), F.col(vec_col)).join(
            assigned.select(id_col, "cluster_id"), on=id_col
        )
        pooled = mean_pool_vectors(members, vec_col, "cluster_id")
        new = {
            r[0]: [float(x) for x in r[1]]
            for r in pooled.collect()  # bounded: k rows
        }
        cents = [(cid, new.get(cid, cv)) for cid, cv in cents]
    return cents


def kmeans_lloyd(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    centroids: DataFrame,
    iters: int = 2,
    cent_vec_col: str | None = None,
    cent_id_col: str | None = None,
) -> DataFrame:
    """Train with :func:`kmeans_fit`, then score the corpus with the
    fitted centroids: returns ``id_col``, ``cluster_id``, ``sq_dist``
    for every vector. The training loop touches only model-sized
    state on the driver; the final scoring pass is the same
    zero-shuffle narrow argmin as :func:`kmeans_assign`."""
    cent_vec_col = cent_vec_col or vec_col
    cent_id_col = cent_id_col or id_col
    fitted = kmeans_fit(
        df, centroids, vec_col, id_col, iters=iters,
        cent_vec_col=cent_vec_col, cent_id_col=cent_id_col,
    )
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    id_field = centroids.select(cent_id_col).schema.fields[0]
    cent_df = df.sparkSession.createDataFrame(
        fitted,
        StructType(
            [
                StructField(cent_id_col, id_field.dataType),
                StructField(cent_vec_col, ArrayType(DoubleType())),
            ]
        ),
    )
    return kmeans_assign(
        df, cent_df, vec_col, id_col,
        cent_vec_col=cent_vec_col, cent_id_col=cent_id_col,
    )


def _pq_bounds(dim: int, m: int) -> list[tuple[int, int]]:
    """(1-based start, length) of each of the ``m`` contiguous
    subspaces; the first ``dim % m`` subspaces absorb the remainder."""
    if not 1 <= m <= dim:
        raise ValueError(f"m={m} must be in [1, dim={dim}]")
    base, extra = divmod(dim, m)
    bounds, start = [], 1
    for j in range(m):
        length = base + (1 if j < extra else 0)
        bounds.append((start, length))
        start += length
    return bounds


def pq_train(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    m: int = 4,
    ksub: int = 16,
    iters: int = 2,
) -> list[list[list[float]]]:
    """Product-quantization codebooks (Jégou, Douze & Schmid, *Product
    Quantization for Nearest Neighbor Search*, TPAMI 2011): split each
    vector into ``m`` contiguous sub-vectors and Lloyd-train ``ksub``
    centroids per subspace with :func:`kmeans_fit` — compressing a
    ``dim``-double vector to ``m`` small codes (64 doubles → 4 bytes
    at the defaults, 128×), which is what makes exhaustive ANN scans
    IO- and memory-feasible at corpus scale.

    Initial centroids per subspace are the ``ksub`` sub-vectors whose
    ``md5(id)`` sorts first — layout-independent, so training is
    deterministic on any partitioning (the module's sampler contract).
    ``dim`` is passed explicitly (schema knowledge the caller has)
    so training triggers no extra driver action.

    Returns ``codebooks[m][ksub][sub_dim]`` (plain floats — model-
    sized driver state, same bounded contract as ``kmeans_fit``).
    """
    from pyspark.sql.types import (  # noqa: PLC0415
        ArrayType, DoubleType, IntegerType, StructField, StructType,
    )

    spark = df.sparkSession
    schema = StructType([
        StructField("cid", IntegerType()),
        StructField("cv", ArrayType(DoubleType())),
    ])
    v = as_double_array(vec_col)
    codebooks = []
    for start, length in _pq_bounds(dim, m):
        sub = df.select(F.col(id_col), F.slice(v, start, length).alias("_sv"))
        seed_rows = (
            sub.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
            .limit(ksub)
            .collect()  # bounded: ksub rows
        )
        if len(seed_rows) < ksub:
            raise ValueError(
                f"corpus has {len(seed_rows)} rows < ksub={ksub}"
            )
        init = spark.createDataFrame(
            [(i, [float(x) for x in r["_sv"]]) for i, r in enumerate(seed_rows)],
            schema,
        )
        fitted = kmeans_fit(
            sub, init, "_sv", id_col, iters=iters,
            cent_vec_col="cv", cent_id_col="cid",
        )
        codebooks.append([cv for _, cv in fitted])
    return codebooks


def _books_frame(df: DataFrame, codebooks: list[list[list[float]]]) -> DataFrame:
    """One-row model frame carrying the full PQ codebook as a nested
    array column ``_books`` (m × ksub × sub_dim). Joined with
    ``F.broadcast`` cross join so a trained ksub=256 × m=8 book ships
    once per executor via torrent broadcast instead of being inlined
    as expression literals (which bloats the codegen'd plan and every
    task binary — VERDICT r6's "Broadcasting large task binary"
    finding)."""
    from pyspark.sql.types import (  # noqa: PLC0415
        ArrayType, DoubleType, StructField, StructType,
    )

    return df.sparkSession.createDataFrame(
        [([[ [float(x) for x in cw] for cw in book] for book in codebooks],)],
        StructType([
            StructField(
                "_books", ArrayType(ArrayType(ArrayType(DoubleType())))
            ),
        ]),
    )


def _sub_argmin(sub: Column, book: Column) -> Column:
    """0-based index of the nearest codeword by squared L2 (first min
    on ties) — the same broadcast-model narrow argmin as
    :func:`kmeans_assign`, per subspace. ``book`` is a ksub × sub_dim
    array COLUMN (one subspace of the broadcast ``_books``)."""
    dists = F.transform(
        book,
        lambda c: F.aggregate(
            F.zip_with(sub, c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str,
    id_col: str,
    out_col: str = "pq_codes",
) -> DataFrame:
    """Encode vectors to their PQ codes: per subspace, the 0-based
    index of the nearest codeword. A NARROW per-row argmin over the
    broadcast codebook model frame (zero corpus shuffles; the book
    ships once per executor, never in the task binary) — encode once,
    store the ``m``-int code column, and every later ANN scan reads
    codes instead of raw vectors.
    """
    v = as_double_array(vec_col)
    dim = sum(len(book[0]) for book in codebooks)
    codes = [
        _sub_argmin(F.slice(v, start, length), F.col("_books")[j])
        for j, (start, length) in enumerate(_pq_bounds(dim, len(codebooks)))
    ]
    return (
        df.crossJoin(F.broadcast(_books_frame(df, codebooks)))
        .withColumn(out_col, F.array(*codes))
        .drop("_books")
    )


def _adc_lut(v: Column, codebooks: list[list[list[float]]]) -> Column:
    """Per-probe ADC lookup table: for each subspace ``j``, the
    ``ksub`` squared distances from the probe's sub-vector to every
    codeword of subspace ``j`` (an ``m × ksub`` nested array,
    computed ONCE per probe). Requires the broadcast ``_books``
    column (:func:`_books_frame`) in scope."""
    dim = sum(len(book[0]) for book in codebooks)
    bounds = _pq_bounds(dim, len(codebooks))

    def _sub_lut(j: int, start: int, length: int) -> Column:
        # closure, NOT lambda default args — an extra default parameter
        # would make Spark bind the 3-arg (value, index, ...) form
        sub = F.slice(v, start, length)
        return F.transform(
            F.col("_books")[j],
            lambda c: F.aggregate(
                F.zip_with(sub, c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )

    return F.array(*[
        _sub_lut(j, start, length)
        for j, (start, length) in enumerate(bounds)
    ])


def _adc_distance(codes: Column, lut: Column) -> Column:
    """Asymmetric distance of one coded corpus row to one probe's LUT:
    ``Σ_j lut[j][code_j]`` — ``m`` array lookups folded in subspace
    order (sequential double sum, bit-stable across engines)."""
    return F.aggregate(
        F.zip_with(
            codes, lut,
            lambda code, table: F.element_at(table, code + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_topk(
    corpus_codes: DataFrame,
    probes: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str,
    id_col: str,
    k: int = 10,
    probe_id: str = "query_id",
    codes_col: str = "pq_codes",
    rerank: int = 0,
) -> DataFrame:
    """Asymmetric-distance (ADC) PQ top-k: each probe keeps its exact
    vector, corpus rows are ranked by the sum of per-subspace squared
    distances from the probe's sub-vector to the corpus row's CODEWORD
    — ``d(x, q(y)) = Σ_j ‖x_j − c_j[code_j(y)]‖²`` (Jégou et al. 2011
    eq. 12). Per probe the ``m·ksub`` codeword distances are computed
    ONCE into a lookup table; each corpus row then costs ``m`` array
    lookups instead of a ``dim``-element scan.

    Plan shape: the LUT is a narrow per-probe expression over the
    BROADCAST codebook model frame (one torrent-shipped row — never
    expression literals, which would bloat the plan and task binaries
    at trained ksub=256 books); probes broadcast (bounded probe set —
    the brute-force contract of :func:`cosine_topk`); the corpus side
    streams its code column only (the compression is the point: at
    100 TB the scan reads m bytes/vector, not dim doubles) with zero
    shuffles before the per-probe top-k window. Distances are
    fixed-order double sums, so any engine replays the ranking
    exactly.

    ``rerank=R`` (R > k) is the standard ADC+R refinement (Jégou et
    al. §VI): the ADC pass keeps an R-deep shortlist per probe, then
    only those ``R·|probes|`` rows' RAW vectors are fetched (from
    ``corpus_codes`` itself, which keeps ``vec_col`` when it came
    from :func:`pq_encode`) and re-ranked by exact squared L2. The
    recall lost to quantization comes back at the cost of touching R
    raw vectors per probe instead of zero — measured on the sf0.01
    embeddings (i.i.d. synthetic vectors, PQ's hardest case — no
    cluster structure for the codebooks to exploit): m=8/ksub=32
    recall@10 = 0.34 pure-ADC → 0.48/0.62/0.82/0.96/1.00 at
    R = 2k/4k/8k/16k/25k (tools/ann_recall.py).

    Returns ``(query_id, neighbor_id, rank)`` — integer-only output,
    ties broken by neighbor id.
    """
    v = as_double_array(vec_col)  # also the rerank path's raw-vector read
    lut = _adc_lut(v, codebooks)
    p = (
        probes.crossJoin(F.broadcast(_books_frame(probes, codebooks)))
        .select(F.col(id_col).alias(probe_id), lut.alias("_lut"))
    )
    scored = (
        corpus_codes.select(
            F.col(id_col).alias("neighbor_id"), F.col(codes_col).alias("_codes")
        )
        .crossJoin(F.broadcast(p))
        .filter(F.col("neighbor_id") != F.col(probe_id))
        .withColumn("_d", _adc_distance(F.col("_codes"), F.col("_lut")))
    )
    w = Window.partitionBy(probe_id).orderBy(F.asc("_d"), F.asc("neighbor_id"))
    if rerank <= 0:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(probe_id, "neighbor_id", "rank")
        )
    if rerank < k:
        raise ValueError(f"rerank={rerank} must be >= k={k}")
    shortlist = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= rerank)
        .select(probe_id, "neighbor_id")
    )
    raw = corpus_codes.select(
        F.col(id_col).alias("neighbor_id"), v.alias("_cv")
    )
    praw = probes.select(
        F.col(id_col).alias(probe_id), v.alias("_pv")
    )
    refined = (
        shortlist.join(raw, on="neighbor_id")
        .join(F.broadcast(praw), on=probe_id)
        .withColumn(
            "_ed",
            F.aggregate(
                F.zip_with(F.col("_pv"), F.col("_cv"), lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
    )
    w2 = Window.partitionBy(probe_id).orderBy(F.asc("_ed"), F.asc("neighbor_id"))
    return (
        refined.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(probe_id, "neighbor_id", "rank")
    )


def ivfpq_topk(
    corpus: DataFrame,
    probes: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str,
    id_col: str,
    k: int = 10,
    num_centroids: int = 16,
    probe_id: str = "query_id",
    seed: int = 42,
    cell_assigner=None,
    nprobe: int = 1,
    rerank: int = 0,
) -> DataFrame:
    """IVF + PQ asymmetric-distance ANN — the two bounding devices of
    this module composed into the billion-scale production shape
    (Jégou, Douze & Schmid 2011 §VII; the flat-encoded IVFPQ variant:
    codes quantize the raw vectors, not the cell residuals — residual
    encoding needs a per-cell codebook join that buys accuracy, not
    asymptotics, and is noted here as the upgrade path). The coarse
    cells bound WHICH rows each probe scans (candidate generation is
    an equi-join on the cell id — :func:`ivf_topk`'s inverted-file
    trick, cost ∝ corpus/2^cells per probe instead of corpus); the PQ
    codes bound WHAT each scanned row costs (``m`` LUT lookups against
    the probe's precomputed table instead of a ``dim``-element scan,
    and at rest the scanned column is ``m`` small ints, not ``dim``
    doubles — :func:`pq_topk`'s compression). At 100 TB both bounds
    matter: IVF makes the per-probe work sublinear in the corpus, PQ
    makes the scanned bytes ~128× smaller, and the whole plan stays
    shuffle-free on the corpus side (cells equi-join against the
    BROADCAST probe LUTs; the codebook ships once per executor via the
    broadcast model frame, never as expression literals).

    Same pluggable quantizer contract as :func:`ivf_topk`:
    ``cell_assigner`` (e.g. :func:`sign_grid_cell`) is the
    engine-portable path a SQL oracle replays exactly; default seeded
    KMeans with ``nprobe`` multi-probe is the production path
    (pytest/recall-tool territory — cluster ids are not
    SQL-replayable). Ranking semantics follow :func:`pq_topk` pure-ADC
    (ties by neighbor id, self-matches excluded); a probe whose cell
    holds fewer than ``k`` rows returns that many ranks — IVF recall
    loss is by design and priced by nprobe. ``rerank=R`` (R ≥ k) adds
    the standard refine stage (Jégou et al. §VI, the full FAISS
    ``IVFPQR``-style pipeline minus residual books): the ADC pass
    keeps an R-deep shortlist per probe and only those ``R·|probes|``
    rows' RAW vectors are fetched and re-ranked by exact squared L2 —
    quantization recall comes back at the cost of touching R raw
    vectors per probe, while the candidate bound stays the cells'.

    Returns ``(query_id, neighbor_id, rank)``.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(vec_col).alias("_cv")
    )
    p = probes.select(
        F.col(id_col).alias(probe_id), as_double_array(vec_col).alias("_pv")
    )
    c, p = _assign_cells(c, p, cell_assigner, num_centroids, seed, nprobe)
    # encode once, then the corpus side carries (id, cell, codes) only
    # — the at-rest scan reads m ints per row, the IVFPQ point
    coded = pq_encode(c, codebooks, "_cv", "neighbor_id").select(
        "neighbor_id", "_cell", "pq_codes"
    )
    lut = _adc_lut(F.col("_pv"), codebooks)
    pl = (
        p.crossJoin(F.broadcast(_books_frame(p, codebooks)))
        .select(probe_id, "_cell", lut.alias("_lut"))
    )
    scored = (
        coded.join(F.broadcast(pl), on="_cell")
        .filter(F.col("neighbor_id") != F.col(probe_id))
        .withColumn("_d", _adc_distance(F.col("pq_codes"), F.col("_lut")))
    )
    # no (probe, neighbor) dedup needed even under multi-probe: each
    # corpus row lives in exactly ONE cell and the probed cell ids are
    # distinct (array_sort slice of distinct centroid indices), so a
    # pair can match at most once — same invariant ivf_topk rides; a
    # dropDuplicates here would be a pure extra shuffle
    w = Window.partitionBy(probe_id).orderBy(F.asc("_d"), F.asc("neighbor_id"))
    if rerank <= 0:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(probe_id, "neighbor_id", "rank")
        )
    if rerank < k:
        raise ValueError(f"rerank={rerank} must be >= k={k}")
    shortlist = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= rerank)
        .select(probe_id, "neighbor_id")
    )
    refined = (
        shortlist.join(c.select("neighbor_id", "_cv"), on="neighbor_id")
        .join(F.broadcast(p.select(probe_id, "_pv").dropDuplicates([probe_id])),
              on=probe_id)
        .withColumn(
            "_ed",
            F.aggregate(
                F.zip_with(
                    F.col("_pv"), F.col("_cv"), lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
    )
    w2 = Window.partitionBy(probe_id).orderBy(F.asc("_ed"), F.asc("neighbor_id"))
    return (
        refined.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(probe_id, "neighbor_id", "rank")
    )


def rrf_fuse(
    rankings: dict[str, DataFrame],
    id_col: str,
    rank_col: str = "rank",
    k: int = 60,
    decimals: int = 6,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al., SIGIR'09) — the
    standard hybrid-retrieval combiner: each system contributes
    ``1/(k + rank)`` and the sums re-rank the union, which needs no
    score calibration between lexical and dense systems (only ranks).

    Determinism contract: the per-system terms are single IEEE
    divisions of exact integers, and the fuse folds them in SORTED
    system-name order as an explicit ``t1 + t2 + …`` expression — NOT
    a ``sum()`` aggregate, whose accumulation order is partition-
    dependent. Identical doubles on any engine; an id absent from a
    system contributes exactly 0.

    Plan/scale: full-outer equi-joins on the id (each ranking is
    already small — a top-k list or one row per candidate), then a
    narrow projection. No shuffle beyond the joins; with top-k inputs
    AQE broadcasts every side.
    """
    out = None
    names = sorted(rankings)
    for name in names:
        r = rankings[name].select(
            F.col(id_col), F.col(rank_col).alias(f"rank_{name}")
        )
        out = r if out is None else out.join(r, on=id_col, how="full")
    score = None
    for name in names:
        term = F.when(
            F.col(f"rank_{name}").isNotNull(),
            F.lit(1.0) / (F.lit(k) + F.col(f"rank_{name}")).cast("double"),
        ).otherwise(F.lit(0.0))
        score = term if score is None else score + term
    assert out is not None
    return out.withColumn("rrf_score", F.round(score, decimals))


def mean_pool_embeddings(
    df: DataFrame,
    group_col: str,
    order_col: str,
    vec_col: str,
    decimals: int = 6,
) -> DataFrame:
    """Mean-pool chunk embeddings into one vector per document — the
    standard chunk→doc reduction after per-chunk embedding (RAG
    indexing, doc-level dedup over chunked encoders).

    Determinism contract: element-wise float sums are order-sensitive,
    so the chunks are collected and SORTED by ``order_col`` before a
    sequential ``aggregate`` fold — every engine adds the same floats
    in the same order. The per-doc collect is bounded by chunks/doc
    (tens — a document's own chunk count, never corpus-scale); for
    corpora where that bound doesn't hold, pre-combine pages first.
    One shuffle on ``group_col``. Output rounded to ``decimals``.
    """
    pair = F.struct(
        F.col(order_col).alias("o"), as_double_array(vec_col).alias("v")
    )
    per = df.groupBy(group_col).agg(
        F.sort_array(F.collect_list(pair)).alias("_ps"),
        F.count(F.lit(1)).alias("n_chunks"),
    )
    vs = F.col("_ps.v")
    first = F.element_at(vs, 1)
    summed = F.aggregate(
        F.slice(vs, 2, F.greatest(F.size(vs) - 1, F.lit(0))),
        first,
        lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
    )
    n = F.col("n_chunks").cast("double")
    # + 0.0 normalizes IEEE negative zero (-0.0 renders differently
    # from 0.0 in value comparisons; -0.0 + 0.0 == +0.0 exactly)
    mean = F.transform(summed, lambda x: F.round(x / n, decimals) + 0.0)
    return per.select(group_col, "n_chunks", mean.alias("mean_embedding"))


def gram_matrix_int(
    df: DataFrame,
    vec_col: str,
    quantized: bool = False,
) -> DataFrame:
    """EXACT integer Gram matrix ``G[i,j] = Σ_rows q_i·q_j`` over
    int8-quantized embeddings — the sufficient statistic for PCA /
    OPQ rotation learning, computed with the engine's determinism
    rules: quantization first (so products are small integers), then
    per-PARTITION numpy ``Qᵀ·Q`` partials in one Arrow batch pass,
    then a grouped exact sum. Rows: ``(i, j, g)`` for the upper
    triangle ``i ≤ j``, ``g`` as ``decimal(38,0)``.

    Scale: the shuffle carries ``partitions × d(d+1)/2`` partial rows
    (d=64 → 2080/partition), NEVER ``n·d²``; per-partition math is a
    single int64 matmul. Overflow: |q| ≤ 127 ⇒ a partition holds
    ~5·10¹⁴ rows before an int64 partial could wrap — far past any
    real partition size; the cross-partition sum rides decimal(38,0).

    ``quantized=True`` skips the int8 step when ``vec_col`` already
    holds integer arrays.
    """
    import pandas as pd  # noqa: PLC0415

    src = df if quantized else quantize_embeddings(
        df.withColumn("_gid", F.monotonically_increasing_id()),
        vec_col, "_gid", out_col="_q",
    )
    qcol = vec_col if quantized else "_q"

    def partials(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            Q = np.array(list(pdf[qcol]), dtype=np.int64)
            G = Q.T @ Q
            d = G.shape[0]
            iu, ju = np.triu_indices(d)
            yield pd.DataFrame(
                {"i": iu.astype("int32"), "j": ju.astype("int32"),
                 "g": G[iu, ju]}
            )

    part = src.select(qcol).mapInPandas(partials, "i int, j int, g long")
    return part.groupBy("i", "j").agg(
        F.sum(F.col("g").cast("decimal(38,0)")).cast("decimal(38,0)").alias("g")
    )


def pca_project(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
) -> DataFrame:
    """PCA projection of the (quantized) embedding space onto its top
    ``k`` principal components — the dimensionality-reduction step
    before PQ/IVF (OPQ-lite). The distributed work is
    :func:`gram_matrix_int` plus exact integer component sums; the
    driver solves the d×d eigenproblem (BOUNDED model-size state, the
    kmeans/bpe driver-boundary contract — d=64 ⇒ a 32 KiB matrix,
    independent of corpus size) and the eigenbasis re-enters the plan
    as a d×k literal for a narrow zip_with/aggregate projection — no
    shuffle after the two stat aggregations.

    Covariance uses the quantized ints: C = G/n − μμᵀ with μ = s/n
    from exact sums. Eigenvector SIGNS are normalized (largest-|.|
    component positive) so the projection is deterministic across
    LAPACK builds. Returns (id_col, pc array<double> length k),
    components ordered by descending eigenvalue.
    """
    q = quantize_embeddings(df, vec_col, id_col, out_col="_q")
    gram = gram_matrix_int(q, "_q", quantized=True)
    sums = q.select(
        F.posexplode("_q").alias("i", "v")
    ).groupBy("i").agg(F.sum("v").alias("s"))
    n = q.count()
    g_rows = gram.collect()  # d(d+1)/2 rows — model-sized
    s_rows = sums.collect()  # d rows
    d = max(r["i"] for r in s_rows) + 1
    G = np.zeros((d, d))
    for r in g_rows:
        G[r["i"], r["j"]] = G[r["j"], r["i"]] = float(r["g"])
    mu = np.zeros(d)
    for r in s_rows:
        mu[r["i"]] = float(r["s"]) / n
    C = G / n - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1][:k]
    basis = vecs[:, order]  # d × k
    # deterministic sign: make each component's largest-|.| entry > 0
    for c in range(basis.shape[1]):
        m = np.argmax(np.abs(basis[:, c]))
        if basis[m, c] < 0:
            basis[:, c] = -basis[:, c]
    cols = [
        F.aggregate(
            F.zip_with(
                F.col("_q").cast("array<double>"),
                F.lit(basis[:, c].tolist()),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for c in range(basis.shape[1])
    ]
    return q.select(id_col, F.array(*cols).alias("pc"))


def jl_sign(seed: str, k: int, j: int) -> int:
    """±1 sign for JL projection cell (k, j): the first hex nibble of
    ``md5(seed:k:j)`` decides — deterministic, engine-free (computed
    at PLAN time in Python; both the Spark plan and the SQL oracle
    bake the identical literals)."""
    import hashlib  # noqa: PLC0415

    h = hashlib.md5(f"{seed}:{k}:{j}".encode()).hexdigest()
    return 1 if int(h[0], 16) >= 8 else -1


def jl_project_int(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    in_dim: int,
    out_dim: int = 16,
    seed: str = "jl",
    quantized: bool = False,
    ship: str = "broadcast",
) -> DataFrame:
    """Johnson–Lindenstrauss projection with a DETERMINISTIC ±1 sign
    matrix (Achlioptas 2003's database-friendly construction: i.i.d.
    Rademacher entries satisfy the JL guarantee) over int8-quantized
    embeddings — the sketching step that shrinks vectors before
    clustering / ANN when even PCA's training pass is too expensive:
    no model state at all, the matrix IS the (seed, k, j) hash.

    Exactness: inputs quantize to int8 first (skipped when
    ``quantized=True``), so every output coordinate is an EXACT
    integer sum of ±q_j (|y| ≤ d·127 — nowhere near overflow) and
    parity is bit-exact on any engine. The conventional 1/√out_dim
    scaling is omitted: downstream cosine/dot comparisons are
    scale-invariant, and keeping integers keeps determinism.

    Plan/scale: ``ship="broadcast"`` (default) carries the sign matrix
    as a broadcast ONE-ROW relation (the path PQ codebooks use)
    crossJoined onto the input — a narrow per-row map whose task
    binary does not embed out_dim·in_dim literals. ``ship="literal"``
    folds the signs into the plan as literals instead (zero joins, no
    driver-built relation). Round-11 interleaved 5-run A/B at sf0.1
    (BENCH_HISTORY round 11): broadcast beat literal in every paired
    run (~1.12 s vs ~1.29 s median) — expression trees with 1024
    literal nodes cost more in plan building + codegen than a tiny
    broadcast — so broadcast is the default; the r10 "Broadcasting
    large task binary" watch item turned out to come from the all8
    consolidation capstone's serialized DAG, not this operator (7 of
    the bench-tail warnings reproduce on all8 alone; zero on either JL
    form). Output is one row per vector with ``y0..y{out_dim-1}``
    BIGINT columns (never an array — the graded-projection type
    contract).
    """
    if in_dim <= 0 or out_dim <= 0:
        raise ValueError("in_dim and out_dim must be positive")
    if ship not in ("literal", "broadcast"):
        raise ValueError("ship must be 'literal' or 'broadcast'")
    src = df if quantized else quantize_embeddings(
        df, vec_col, id_col, out_col="_q"
    )
    qcol = vec_col if quantized else "_q"
    if ship == "broadcast":
        matrix = [
            [jl_sign(seed, k, j) for j in range(in_dim)]
            for k in range(out_dim)
        ]
        mat = df.sparkSession.createDataFrame(
            [(matrix,)], "_jl_m array<array<int>>"
        )
        joined = src.crossJoin(F.broadcast(mat))
        outs = [F.col(id_col)]
        for k in range(out_dim):
            terms = F.zip_with(
                F.col(qcol),
                F.element_at("_jl_m", k + 1),
                lambda x, s: x * s,
            )
            outs.append(
                F.aggregate(
                    terms, F.lit(0).cast("long"), lambda a, b: a + b
                ).alias(f"y{k}")
            )
        return joined.select(*outs)
    # each output coordinate is ONE zip_with against a literal sign
    # array + ONE fold — 2·out_dim higher-order expressions with
    # internal loops, not out_dim·in_dim scalar element_at nodes: the
    # scalar form generates a Project past the JIT method-size limit
    # and drops to interpreted evaluation (measured 8.8 s → see
    # BENCH_HISTORY round-9)
    outs = [F.col(id_col)]
    for k in range(out_dim):
        # one server-side literal parse per sign row, not in_dim lits
        # — out_dim=16 × in_dim=64 was 1024 py4j round-trips (r17)
        sgn = F.expr(
            "array("
            + ", ".join(str(jl_sign(seed, k, j)) for j in range(in_dim))
            + ")"
        )
        terms = F.zip_with(F.col(qcol), sgn, lambda x, s: x * s)
        acc = F.aggregate(
            terms, F.lit(0).cast("long"), lambda a, b: a + b
        )
        outs.append(acc.alias(f"y{k}"))
    return src.select(*outs)


def _plane_tables(planes: list) -> list:
    """Validate + normalize the ``planes`` argument of the embedding
    screen family to a list of plane tables (nesting depth selects
    single- vs multi-table OR-amplification). Empty tables raise: an
    empty plane list buckets every row into one ``''`` key and turns
    the equi-join quadratic (the landmine the minhash empty-shingle
    fix closed)."""
    if not planes:
        raise ValueError(
            "planes must be non-empty — an empty plane list buckets "
            "every row into one '' key (quadratic equi-join)"
        )
    multi = bool(planes[0]) and isinstance(planes[0][0], (list, tuple))
    tables: list = list(planes) if multi else [planes]
    if any(not t for t in tables):
        raise ValueError("every plane table must be non-empty")
    return tables


def _bucket_expr(v: Column, tables: list) -> Column:
    """Bucket key expression shared by the batch projection and
    :func:`embedding_index_signatures` — ONE definition so persisted
    index buckets always equi-match live batch buckets. Single table →
    the bare bucket string; multi-table → an array of table-index-
    prefixed keys (buckets from different tables never collide)."""
    if len(tables) == 1:
        return lsh_bucket(v, tables[0])
    return F.array(*[
        F.concat_ws("|", F.lit(str(t)), lsh_bucket(v, tbl))
        for t, tbl in enumerate(tables)
    ])


def embedding_index_signatures(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    planes: list[list[float]],
) -> DataFrame:
    """Persistable signature table for :func:`embedding_against_index`
    — ``(id_col, vec_col, norm, bucket)``, one row per vector per
    plane table. The embedding sibling of
    :func:`~gem_data_wrangle_spark.operators.dedup.minhash_signatures`:
    write THIS (not raw vectors) as the history index so each
    snapshot's screen skips the O(history · planes) norm +
    per-plane-dot recompute. Persisted signatures are HALF the scale
    recipe: the asymmetric curve (SCALE.md round 14) decomposes the
    raw screen's 23× wall at 100× index into (a) index re-bucketing —
    removed by this table — and (b) bucket-population growth in the
    verify join — removed by scaling the plane count with log2(index
    growth); signatures alone measure 22.6× (the verify dominates),
    scaled planes alone 6.7×, BOTH 1.9×. The vector column rides along
    because the screen's exact cosine verify needs it; at rest the
    table is still O(index · tables) rows with no re-derivation at
    query time.

    Contract: the SAME ``planes`` value (and nesting) must build the
    index and screen every batch — bucket keys from different plane
    tables or orderings never equi-match, so a drift silently screens
    nothing. Partition the persisted table by ``bucket`` to let
    dynamic partition pruning skip history partitions no batch row
    lands in."""
    tables = _plane_tables(planes)
    v = as_double_array(F.col(vec_col))
    base = [F.col(id_col), F.col(vec_col), norm(v).alias("norm")]
    buckets = _bucket_expr(v, tables)
    if len(tables) == 1:
        return df.select(*base, buckets.alias("bucket"))
    return df.select(*base, F.explode(buckets).alias("bucket"))


def embedding_against_index(
    new_emb: DataFrame,
    index_emb: DataFrame | None,
    vec_col: str,
    id_col: str,
    planes: list[list[float]],
    threshold: float = 0.4,
    materialize: bool = True,
    checkpoint_dir: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Incremental embedding-cosine screening — the embedding member
    of the incremental-screening family (exact digests / MinHash bands
    / exact-Hamming signatures in ``operators.dedup``, this one for
    ``array<float>`` columns). A new snapshot's vectors are screened
    against the persisted ``(id, vector)`` index: candidates come from
    a sign-LSH bucket equi-join (same contract as the
    embedding-neardup pair path), an exact
    cosine verify keeps only true matches ``>= threshold``, and
    survivors extend the index. Returns ``(fresh_rows,
    updated_index)``.

    Recall (MEASURED, ``tools/embed_recall.py`` at sf0.01 — an earlier
    draft of this note had the direction backwards): single-table
    bucket collision is ``P = (1 - θ/π)^planes`` (Charikar 2002), so
    recall FALLS as planes rise — 0.24 at 4 planes, 0.04 at 8, 0.00
    at 16+ for cos ≥ 0.4 on the 64-dim testdata — while the candidate
    count falls with it (4,076 → 305 → 0). More planes buy PRECISION
    of the candidate stage (cost), never recall. To raise recall,
    pass MULTIPLE independently-seeded plane tables (a list of plane
    lists): a pair qualifies by colliding in ANY table
    (OR-amplification, the same knob as ``lsh_topk(num_tables=)``),
    recall ``1 - (1 - P)^tables`` at candidate cost ∝ tables.
    Precision of the SCREEN itself is always 1.0 — the exact cosine
    verify removes every bucket false positive.

    Contract: ``index_emb`` carries ``(id_col, vec_col)`` raw, or the
    persisted-signature shape ``(id_col, vec_col, norm, bucket)`` from
    :func:`embedding_index_signatures` — the signature shape skips the
    O(history · planes) index-side norm/bucket recompute. Persisted
    buckets are shape-checked per row against the passed ``planes``
    (bit-string length + table prefix): an index built under different
    geometry RAISES at execution instead of silently screening
    nothing (round 15, ADVICE r14; same-count different-seed drift
    remains undetectable from bucket strings — keep the geometry with
    the index, e.g. :func:`plane_tables` under a fixed seed). The raw
    fixed-geometry screen is LINEAR in index size (23× wall at 100×
    index); staying flat needs BOTH persisted signatures and a plane
    count scaled with log2(index growth) — 1.9× at 100×, SCALE.md
    round 14 — and ``updated_index`` then stays in signature shape so
    the loop composes. BOTH sides
    must bucket with the SAME ``planes`` (pass the generator's seed
    output around, not regenerated planes — this function derives both
    sides itself so the tiling always agrees). ``planes`` is one plane
    table ``list[list[float]]`` or several ``list[list[list[float]]]``
    — nesting depth selects single- vs multi-table. Zero-norm vectors never
    match anything (cosine undefined → filtered), mirroring the NULL-
    signature contract of the dedup-side screens; NULL vectors
    likewise pass through unscreened. ``planes`` must be non-empty —
    an empty list would bucket the ENTIRE corpus into one '' key and
    turn the equi-join quadratic (the same landmine the minhash
    empty-shingle fix closed), so it raises on BOTH paths, bootstrap
    included. Batch ids must not already exist in the index:
    screening is content-keyed, so a re-crawled id whose vector
    drifted below ``threshold`` survives and its row joins the index
    alongside the old id's — anti-join on indexed ids first if
    snapshots re-carry ids.

    ``materialize`` (default True): the matched-id set feeds both
    returned frames, so the lazy plan re-runs the index-side bucket
    projection + cosine-verified join per action. The default eagerly
    truncates the SMALL matched-id set (``localCheckpoint``, or a
    durable ``DataFrame.checkpoint`` under ``checkpoint_dir``) so the
    bucket join against history runs ONCE; ``materialize=False``
    keeps the fully lazy plan for composition.

    Plan/scale: two narrow bucket projections (per-plane dot products
    in codegen; the multi-table form explodes ``tables`` rows per
    vector, cost ∝ tables), ONE bucket equi-join of batch against
    index with the
    cosine verify folded into the join filter (per-row norms hoisted
    so they fold once per ROW, not per pair), then a LEFT ANTI of the
    batch against the small matched-id set. With a raw index, history
    is re-bucketed per screen (linear in index size — the interpreted
    higher-order lambdas dominate); persist
    :func:`embedding_index_signatures` instead, bucket-partitioned so
    dynamic partition pruning drops history partitions the batch
    never lands in.
    """
    from gem_data_wrangle_spark.operators.graph import (  # noqa: PLC0415
        _checkpointer,
    )

    tables = _plane_tables(planes)

    def keyed(df: DataFrame, prefix: str) -> DataFrame:
        v = as_double_array(F.col(vec_col))
        base = [
            F.col(id_col).alias(f"{prefix}_id"),
            v.alias(f"{prefix}_v"),
            norm(v).alias(f"{prefix}_n"),
        ]
        buckets = _bucket_expr(v, tables)
        if len(tables) == 1:
            # single-table: the original narrow projection, no explode
            return df.select(*base, buckets.alias("_bucket"))
        # one row per (vector, table); the table index prefixes the
        # bucket key so buckets from different tables never equi-match
        return df.select(*base, F.explode(buckets).alias("_bucket"))
    missing_new = {id_col, vec_col} - set(new_emb.columns)
    if missing_new:
        raise ValueError(
            f"new_emb lacks column(s) {sorted(missing_new)}; expected the "
            f"({id_col}, {vec_col}) shape"
        )
    if index_emb is None:
        return new_emb, new_emb.select(id_col, vec_col)
    missing = {id_col, vec_col} - set(index_emb.columns)
    if missing:
        raise ValueError(
            f"index_emb lacks column(s) {sorted(missing)}; expected the "
            f"({id_col}, {vec_col}) shape"
        )
    batch = keyed(new_emb, "_b")
    if {"bucket", "norm"} <= set(index_emb.columns):
        # persisted-signature index (embedding_index_signatures): skip
        # the O(history) norm + per-plane-dot recompute — the
        # interpreted higher-order aggregate lambdas dominate the
        # screen at large index (asymmetric curve, SCALE.md round 14).
        # Shape validation (ADVICE r14): the signature path is
        # detected by column names alone, so an index whose buckets
        # were built with DIFFERENT planes (or a raw table that
        # happens to carry norm/bucket columns from another
        # derivation) would silently equi-match nothing — the drift
        # failure the docstring warns about, previously undetectable.
        # Persisted buckets must LOOK like this geometry's buckets:
        # single-table → exactly len(table) sign bits, no table
        # prefix; multi-table → '<t>|<bits>' with a per-table length.
        # A per-row check folded into the projection (zero extra
        # jobs); same plane COUNT with different seeds still passes —
        # that drift is undetectable from bucket strings, carry the
        # geometry with the index (plane_tables + a fixed seed).
        if len(tables) == 1:
            shape_ok = (
                F.length(F.col("bucket")) == len(tables[0])
            ) & (~F.col("bucket").contains("|"))
            want = f"{len(tables[0])} sign bits, no table prefix"
        else:
            lens = sorted({
                len(str(t)) + 1 + len(tbl)
                for t, tbl in enumerate(tables)
            })
            shape_ok = F.length(F.col("bucket")).isin(lens) & F.col(
                "bucket"
            ).contains("|")
            want = (
                f"'t|bits' of length in {lens} "
                f"({len(tables)} prefixed tables)"
            )
        checked_bucket = F.when(shape_ok, F.col("bucket")).otherwise(
            F.raise_error(F.concat(
                F.lit(
                    "embedding_against_index: persisted index bucket "
                ),
                F.col("bucket"),
                F.lit(
                    f" does not match the passed planes (expected "
                    f"{want}); the index was built with different "
                    "geometry and would silently screen nothing — "
                    "rebuild it with embedding_index_signatures under "
                    "the SAME planes"
                ),
            ))
        )
        idx = index_emb.select(
            F.col(id_col).alias("_i_id"),
            as_double_array(F.col(vec_col)).alias("_i_v"),
            F.col("norm").alias("_i_n"),
            checked_bucket.alias("_i_bucket"),
        )
        sig_index = True
    else:
        idx = keyed(index_emb, "_i").withColumnRenamed("_bucket", "_i_bucket")
        sig_index = False
    # LEFT SEMI with the cosine verify INSIDE the join condition (round
    # 14, asymmetric-curve finding): a batch row only needs ANY index
    # match, so the hash/sort-merge semi probe STOPS at the first
    # bucket-mate above threshold instead of scoring every one — with
    # a k-times-replicated history the old inner-join+filter+distinct
    # scored all k copies and the screen ran linear in index size
    # (measured 35x wall at 100x index; semi form re-measured in
    # SCALE.md round 14). Matching the minhash screen's semi-join
    # shape, which measured 1.7x at the same 100x growth.
    matched = (
        batch.filter(F.col("_b_n") > 0)
        .join(
            idx.filter(F.col("_i_n") > 0),
            on=(
                (F.col("_bucket") == F.col("_i_bucket"))
                & (dot(F.col("_b_v"), F.col("_i_v"))
                   / (F.col("_b_n") * F.col("_i_n")) >= threshold)
            ),
            how="left_semi",
        )
        .select(F.col("_b_id").alias(id_col))
        .distinct()  # multi-table mode explodes one batch row per table
    )
    if materialize:
        matched = _checkpointer(checkpoint_dir)(matched, True)
    fresh = new_emb.join(matched, on=id_col, how="left_anti")
    if sig_index:
        # keep the persisted-signature shape so the screen composes
        # snapshot-over-snapshot without ever re-bucketing history
        updated = index_emb.select(
            id_col, vec_col, "norm", "bucket"
        ).unionByName(
            embedding_index_signatures(fresh, vec_col, id_col, planes)
        )
    else:
        updated = index_emb.select(id_col, vec_col).unionByName(
            fresh.select(id_col, vec_col)
        )
    return fresh, updated
