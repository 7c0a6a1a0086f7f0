"""pyspark.ml-backed LSH — the library scale path (SURVEY §4).

The hand-rolled MinHash/sign-LSH in ``dedup``/``similarity`` is
oracle-differentiable; these wrap ``pyspark.ml.feature`` equivalents
(seeded, deterministic, but not SQL-replayable — the driver records a
rows-only check for them). At 100 TB both paths shuffle only
candidates, never the corpus²; the ml variants additionally AND/OR
amplify across hash tables inside the library.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:
    from pyspark.ml.feature import (
        BucketedRandomProjectionLSH,
        HashingTF,
        MinHashLSH,
    )
    from pyspark.ml.functions import array_to_vector

    ML_AVAILABLE = True
except ImportError:  # pragma: no cover
    ML_AVAILABLE = False


def ml_minhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    num_tables: int = 4,
    num_features: int = 1 << 14,
    seed: int = 42,
    ngram: int = 2,
) -> DataFrame:
    """Near-dup candidate pairs via ``pyspark.ml`` MinHashLSH over
    binary hashed shingle features. Deterministic for a fixed seed.
    Shingles (default bigrams), not unigram tokens — unigram sets on a
    small vocabulary make nearly every pair a candidate (measured:
    118k pairs over 500 docs vs a handful with bigrams)."""
    if not ML_AVAILABLE:
        raise NotImplementedError("pyspark.ml not available")
    from gem_data_wrangle_spark.operators.dedup import _shingles  # noqa: PLC0415

    toks = df.select(F.col(id_col), _shingles(F.col(text_col), ngram).alias("_toks"))
    hashed = HashingTF(
        inputCol="_toks", outputCol="_features", numFeatures=num_features, binary=True
    ).transform(toks)
    model = MinHashLSH(
        inputCol="_features", outputCol="_hashes", numHashTables=num_tables, seed=seed
    ).fit(hashed)
    joined = model.approxSimilarityJoin(hashed, hashed, threshold, distCol="jaccard_dist")
    return (
        joined.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.round("jaccard_dist", 4).alias("jaccard_dist"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )


def ml_brp_neighbors(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
    bucket_length: float = 2.0,
    num_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Euclidean near-neighbor pairs via BucketedRandomProjectionLSH
    over an ``array<float>`` embedding column."""
    if not ML_AVAILABLE:
        raise NotImplementedError("pyspark.ml not available")
    vecs = df.select(
        F.col(id_col), array_to_vector(F.col(vec_col).cast("array<double>")).alias("_v")
    )
    model = BucketedRandomProjectionLSH(
        inputCol="_v", outputCol="_hashes", bucketLength=bucket_length,
        numHashTables=num_tables, seed=seed,
    ).fit(vecs)
    joined = model.approxSimilarityJoin(vecs, vecs, threshold, distCol="euclidean_dist")
    return (
        joined.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.round("euclidean_dist", 4).alias("euclidean_dist"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )
