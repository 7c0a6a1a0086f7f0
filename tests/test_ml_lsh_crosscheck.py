"""Value-level evidence for the ``pyspark.ml`` LSH operators.

VERDICT r2 item 5: the driver records rows-only checks for
``ml_minhash_join`` / ``ml_brp_join`` (Spark-internal hash families are
not SQL-replayable). These tests close the evidence gap from the other
side — ``approxSimilarityJoin`` post-filters candidates with the EXACT
metric, so every reported distance can be verified independently:

- reported ``jaccard_dist`` ≡ exact shingle-set Jaccard distance
  (computed by the oracle-green ``jaccard_pairs``), modulo HashingTF
  collisions (measured ≤ 3e-4 at 16k features);
- reported ``euclidean_dist`` ≡ numpy exact distance;
- containment: every portable-md5-LSH pair verified at Jaccard ≥ 0.5 is
  also found by the ml path at the graded threshold (recall
  cross-check between the two independent hash families);
- BRP precision is exactly 1.0 (threshold is a hard post-filter) and
  recall ≥ 0.9 against the brute-force ground truth.

All seeded → deterministic, so the bounds are stable, not flaky.
"""

import numpy as np
from pyspark.sql import functions as F

from gem_data_wrangle_spark.operators.dedup import jaccard_pairs, lsh_candidate_pairs
from gem_data_wrangle_spark.operators.ml_lsh import ml_brp_neighbors, ml_minhash_pairs


def test_ml_minhash_distances_match_exact_jaccard(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ml = ml_minhash_pairs(docs, "text", "doc_id", threshold=0.8).cache()
    n_pairs = ml.count()
    assert n_pairs > 0
    exact = jaccard_pairs(docs, "text", "doc_id", ml.select("id_a", "id_b"), ngram=2)
    joined = ml.join(exact, ["id_a", "id_b"]).collect()
    assert len(joined) == n_pairs  # every ml pair has an exact score
    for r in joined:
        assert abs((1.0 - r["jaccard"]) - r["jaccard_dist"]) <= 0.01
    # threshold is a hard post-filter in approxSimilarityJoin
    assert all(r["jaccard_dist"] <= 0.8 for r in joined)


def test_ml_minhash_contains_portable_lsh_pairs(spark, sf_dir):
    """Recall cross-check between independent hash families: pairs the
    portable md5 MinHash+LSH path verifies at Jaccard ≥ 0.5 must all
    surface from the ml path at the graded dist ≤ 0.8 threshold."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cand = lsh_candidate_pairs(docs, "text", "doc_id")
    verified = jaccard_pairs(docs, "text", "doc_id", cand, threshold=0.5, ngram=2)
    vset = {(r["id_a"], r["id_b"]) for r in verified.collect()}
    mlset = {
        (r["id_a"], r["id_b"])
        for r in ml_minhash_pairs(docs, "text", "doc_id", threshold=0.8).collect()
    }
    assert vset and vset <= mlset


def test_ml_brp_distances_and_recall(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ml = ml_brp_neighbors(emb, "embedding", "vec_id", threshold=1.2)
    rows = ml.collect()
    assert rows
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    # reported distances are the exact metric (4-dp rounding + f32 noise)
    for r in rows:
        exact = float(np.linalg.norm(vecs[r["id_a"]] - vecs[r["id_b"]]))
        assert abs(exact - r["euclidean_dist"]) <= 1e-3
    ids = sorted(vecs)
    a = np.stack([vecs[i] for i in ids])
    dist = np.sqrt(((a[:, None, :] - a[None, :, :]) ** 2).sum(-1))
    true = {
        (ids[i], ids[j])
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if dist[i, j] < 1.2
    }
    found = {(r["id_a"], r["id_b"]) for r in rows}
    assert found <= true                        # precision exactly 1.0
    assert len(found & true) / len(true) >= 0.9  # seeded recall (meas. 0.939)
