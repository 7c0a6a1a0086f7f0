"""Measure ANN recall@k of the bucketed similarity paths against the
exact brute-force baseline on the real testdata embeddings.

Recall@k here = |approx ∩ exact| / |exact| over (query, neighbor)
pairs, averaged across queries — the standard ANN quality metric. The
LSH and IVF paths trade recall for candidate-set size (that IS the
scale story), so the honest number belongs next to the wall-time
numbers in SCALE.md.

    python tools/ann_recall.py [sf_dir] [k]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from gem_data_wrangle_spark import get_spark  # noqa: E402
from gem_data_wrangle_spark.operators import similarity as V  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def pairs(df) -> set:
    return {(r[0], r[1]) for r in df.select("query_id", "neighbor_id").collect()}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("ann-recall")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    dim = len(emb.select("embedding").first()[0])
    probes = emb.orderBy("vec_id").limit(50)

    exact = pairs(V.cosine_topk(emb, probes, "embedding", "vec_id", k=k))
    out = {"sf_dir": sf_dir, "k": k, "n_vectors": n, "n_probes": 50}

    for planes in (4, 6, 8):
        approx = pairs(
            V.lsh_topk(emb, probes, "embedding", "vec_id", dim=dim, k=k,
                       num_planes=planes)
        )
        out[f"lsh_recall@{k} ({planes} planes, 1 table)"] = round(
            len(approx & exact) / len(exact), 4
        )
    for tables in (4, 8, 16):
        approx = pairs(
            V.lsh_topk(emb, probes, "embedding", "vec_id", dim=dim, k=k,
                       num_planes=8, num_tables=tables)
        )
        out[f"lsh_recall@{k} (8 planes, {tables} tables)"] = round(
            len(approx & exact) / len(exact), 4
        )
    for cells in (8, 16, 32):
        approx = pairs(
            V.ivf_topk(emb, probes, "embedding", "vec_id", k=k,
                       num_centroids=cells)
        )
        out[f"ivf_recall@{k} ({cells} cells, nprobe=1)"] = round(
            len(approx & exact) / len(exact), 4
        )
    for nprobe in (2, 4, 8):
        approx = pairs(
            V.ivf_topk(emb, probes, "embedding", "vec_id", k=k,
                       num_centroids=16, nprobe=nprobe)
        )
        out[f"ivf_recall@{k} (16 cells, nprobe={nprobe})"] = round(
            len(approx & exact) / len(exact), 4
        )
    # PQ ranks by squared L2 (ADC), the brute-force baseline by
    # cosine — on these near-isotropic synthetic embeddings the two
    # exact rankings agree (measured identical recall at sf0.01), so
    # one baseline serves both families.
    books = V.pq_train(emb, "embedding", "vec_id", dim=dim, m=8, ksub=32,
                       iters=3)
    codes = V.pq_encode(emb, books, "embedding", "vec_id")
    for rerank in (0, 2 * k, 4 * k, 8 * k, 16 * k):
        approx = pairs(
            V.pq_topk(codes, probes, books, "embedding", "vec_id", k=k,
                      rerank=rerank)
        )
        out[f"pq_recall@{k} (m=8, ksub=32, rerank={rerank})"] = round(
            len(approx & exact) / len(exact), 4
        )
    # composed IVFPQ (round 16): recall multiplies the two families'
    # losses — cells bound candidates, codes blur the in-cell ranking,
    # nprobe buys back the former and rerank the latter
    for nprobe in (1, 4, 8):
        for rerank in (0, 4 * k):
            approx = pairs(
                V.ivfpq_topk(emb, probes, books, "embedding", "vec_id",
                             k=k, num_centroids=16, nprobe=nprobe,
                             rerank=rerank)
            )
            out[
                f"ivfpq_recall@{k} (16 cells, nprobe={nprobe}, m=8, "
                f"ksub=32, rerank={rerank})"
            ] = round(len(approx & exact) / len(exact), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
