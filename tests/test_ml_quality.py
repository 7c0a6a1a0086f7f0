"""Tests for the learned (fastText-style) quality classifier.

Like tests/test_ml_lsh_crosscheck.py, this family is pytest-verified
rather than driver-oracled: L-BFGS coefficients aren't SQL-replayable,
so the evidence is (a) near-perfect accuracy on a cleanly separable
corpus, (b) run-to-run determinism on the same data, (c) the
weak-label bootstrap wiring against gopher_quality.
"""

from __future__ import annotations

import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gem_data_wrangle_spark.operators import ml_quality as Q  # noqa: E402

pytestmark = pytest.mark.skipif(
    not Q.ML_AVAILABLE, reason="pyspark.ml not available"
)

GOOD_VOCAB = ["analysis", "report", "method", "result", "measure", "clear",
              "detail", "study", "finding", "section"]
BAD_VOCAB = ["click", "buy", "free", "winner", "xxx", "offer", "now",
             "casino", "cheap", "deal"]


def _corpus(n: int, seed: int):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        good = i % 2 == 0
        vocab = GOOD_VOCAB if good else BAD_VOCAB
        text = " ".join(rng.choice(vocab) for _ in range(rng.randint(8, 20)))
        rows.append((i, text, 1 if good else 0))
    return rows


def test_classifier_separates_and_is_deterministic(spark):
    train = spark.createDataFrame(
        _corpus(200, 1), "doc_id bigint, text string, label int"
    )
    test = spark.createDataFrame(
        _corpus(80, 2), "doc_id bigint, text string, label int"
    )
    model = Q.train_quality_classifier(train, "text", "label")
    scored = Q.score_quality(model, test)
    rows = scored.collect()
    acc = sum(
        1 for r in rows if (r["quality_prob"] >= 0.5) == (r["label"] == 1)
    ) / len(rows)
    assert acc >= 0.95, f"separable-corpus accuracy only {acc}"
    # scoring output keeps input columns and adds prob + keep
    assert {"doc_id", "text", "label", "quality_prob", "quality_keep"} <= set(
        scored.columns
    )
    assert not any(c.startswith("_qc_") for c in scored.columns)
    # determinism: refit on identical data -> identical predictions
    model2 = Q.train_quality_classifier(train, "text", "label")
    p1 = {r["doc_id"]: r["quality_prob"] for r in rows}
    p2 = {
        r["doc_id"]: r["quality_prob"]
        for r in Q.score_quality(model2, test).collect()
    }
    assert p1 == p2


def test_weak_label_bootstrap_from_gopher(spark):
    rows = []
    for i in range(10):
        # long docs of DISTINCT words pass gopher (its dup-word gate
        # fails any small-vocabulary repetition); tiny/symbol docs fail
        if i % 2 == 0:
            rows.append((i, " ".join(f"t{i}w{j}" for j in range(80))))
        else:
            rows.append((i, "### $$$ !!!"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    labeled = Q.weak_labels_from_gopher(df, "text", "doc_id")
    got = {r["doc_id"]: r["label"] for r in labeled.collect()}
    assert all(got[i] == 1 for i in range(0, 10, 2))
    assert all(got[i] == 0 for i in range(1, 10, 2))
    # the bootstrap feeds straight into training
    model = Q.train_quality_classifier(labeled, "text", "label")
    scored = Q.score_quality(model, df)
    out = {r["doc_id"]: r["quality_keep"] for r in scored.collect()}
    assert sum(out[i] for i in range(0, 10, 2)) >= 4
