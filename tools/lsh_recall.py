"""Measure MinHash-LSH candidate RECALL against exact bigram-shingle
Jaccard ground truth — the dedup mirror of tools/ann_recall.py.

The neardup operators document their knobs as "recall rises with
num_bands, precision (candidate-set size) with rows_per_band"
(collision probability of one band ≈ J^rows_per_band; across bands
P(candidate) = 1 - (1 - J^r)^b). This harness measures that claim
instead of asserting it: exact all-pairs bigram Jaccard on the small
graded corpus is the ground truth (harness-only — the N² truth join is
the thing LSH exists to avoid at scale), then each (bands, rows)
configuration reports its candidate count and recall at three
Jaccard thresholds.

    python tools/lsh_recall.py [sf_dir]     # default /root/testdata/sf0.01
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from gem_data_wrangle_spark import get_spark  # noqa: E402
from gem_data_wrangle_spark.operators.dedup import (  # noqa: E402
    _shingles,
    lsh_candidate_pairs,
)

CONFIGS = [(2, 8), (4, 4), (8, 2), (8, 4), (16, 2)]
THRESHOLDS = [0.5, 0.7, 0.9]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("lsh-recall")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sets = docs.select(
        F.col("doc_id"), _shingles(F.col("text"), 2).alias("s")
    ).filter(F.size("s") > 0)
    a = sets.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    b = sets.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    truth = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            (inter / (F.size("sa") + F.size("sb") - inter)).alias("j"),
        )
        .filter(F.col("j") > 0)
        .persist()
    )
    truth_counts = {t: truth.filter(F.col("j") >= t).count() for t in THRESHOLDS}
    print(json.dumps({"docs": docs.count(), "true_pairs": truth_counts}))

    for nb, rpb in CONFIGS:
        t0 = time.time()
        cand = lsh_candidate_pairs(
            docs, "text", "doc_id", num_bands=nb, rows_per_band=rpb
        ).persist()
        n_cand = cand.count()
        row: dict = {
            "num_bands": nb,
            "rows_per_band": rpb,
            "hashes": nb * rpb,
            "candidates": n_cand,
            "wall_s": round(time.time() - t0, 2),
        }
        hit = cand.join(truth, on=["id_a", "id_b"])
        for t in THRESHOLDS:
            found = hit.filter(F.col("j") >= t).count()
            row[f"recall@j>={t}"] = round(found / max(truth_counts[t], 1), 3)
        cand.unpersist()
        print(json.dumps(row))
    truth.unpersist()


if __name__ == "__main__":
    main()
