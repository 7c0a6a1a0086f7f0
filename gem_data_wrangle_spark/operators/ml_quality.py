"""pyspark.ml-backed quality classifier — the fastText-style learned
quality gate every production pretraining pipeline ends up with (the
published recipe behind GPT-3/LLaMA data filtering: a LINEAR model
over hashed bag-of-words, trained on weak labels, scored over the
whole corpus).

Where :mod:`.textops`' ``gopher_quality`` is a fixed heuristic gate,
this learns one: hashed term features (``HashingTF``) → IDF →
``LogisticRegression``. Everything is pyspark.ml, so training is a
distributed treeAggregate (L-BFGS) and scoring is a narrow map — no
shuffles, linear in corpus bytes, exactly the 100 TB shape.

The model is deterministic for a fixed seed and data, but its float
coefficients are iterative-solver output — NOT SQL-replayable, so
like the ml LSH wrappers this family is pytest-verified (separable
corpus accuracy + determinism + weak-label bootstrap) rather than
driver-oracled; the registry keeps only oracle-checkable queries.

No reference analogue (LLM-pipeline extension family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:
    from pyspark.ml import Pipeline, PipelineModel
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import IDF, HashingTF, Tokenizer

    ML_AVAILABLE = True
except ImportError:  # pragma: no cover
    ML_AVAILABLE = False


def train_quality_classifier(
    df: DataFrame,
    text_col: str,
    label_col: str,
    num_features: int = 1 << 12,
    max_iter: int = 30,
    reg_param: float = 1e-3,
) -> "PipelineModel":
    """Fit tokenize → hash → IDF → logistic regression on
    ``(text_col, label_col)`` where the label is 0/1 (1 = keep).

    Labels can be human, model-distilled, or weak (see
    :func:`weak_labels_from_gopher`); the classifier generalizes the
    heuristic beyond its hand-set thresholds. Training cost: L-BFGS
    over treeAggregated gradients — each iteration is one map +
    depth-2 reduce over the corpus, no wide shuffle.
    """
    if not ML_AVAILABLE:
        raise NotImplementedError("pyspark.ml not available")
    pipe = Pipeline(
        stages=[
            Tokenizer(inputCol=text_col, outputCol="_qc_toks"),
            HashingTF(
                inputCol="_qc_toks",
                outputCol="_qc_tf",
                numFeatures=num_features,
            ),
            IDF(inputCol="_qc_tf", outputCol="_qc_features"),
            LogisticRegression(
                featuresCol="_qc_features",
                labelCol=label_col,
                predictionCol="_qc_pred",
                probabilityCol="_qc_prob",
                rawPredictionCol="_qc_raw",
                maxIter=max_iter,
                regParam=reg_param,
            ),
        ]
    )
    return pipe.fit(df.withColumn(label_col, F.col(label_col).cast("double")))


def score_quality(
    model: "PipelineModel", df: DataFrame, keep_threshold: float = 0.5
) -> DataFrame:
    """Score a corpus: adds ``quality_prob`` (P(keep)) and
    ``quality_keep``. Narrow map over the fitted linear model —
    scoring 100 TB is one scan."""
    if not ML_AVAILABLE:
        raise NotImplementedError("pyspark.ml not available")
    try:
        from pyspark.ml.functions import vector_to_array  # noqa: PLC0415

        scored = model.transform(df).withColumn(
            "quality_prob", vector_to_array("_qc_prob")[1]
        )
    except ImportError:  # pragma: no cover - very old pyspark
        scored = model.transform(df).withColumn(
            "quality_prob", F.col("_qc_pred")
        )
    return scored.withColumn(
        "quality_keep", F.col("quality_prob") >= F.lit(keep_threshold)
    ).drop("_qc_toks", "_qc_tf", "_qc_features", "_qc_pred", "_qc_prob", "_qc_raw")


def weak_labels_from_gopher(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Bootstrap labels from the Gopher heuristic gate: label 1 where
    every gopher flag passes, 0 otherwise — the standard weak-label
    seeding step before a learned filter replaces the heuristic."""
    from gem_data_wrangle_spark.operators.textops import (  # noqa: PLC0415
        gopher_quality,
    )

    flagged = gopher_quality(df, text_col, id_col)
    return flagged.withColumn(
        "label", F.when(F.col("quality_pass"), F.lit(1)).otherwise(F.lit(0))
    ).select(id_col, text_col, "label")
