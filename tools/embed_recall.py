"""Measure sign-LSH bucket RECALL for the embedding screens against
exact cosine ground truth — the embedding mirror of tools/
lsh_recall.py (VERDICT r13 item 2: the embedding_against_index /
lsh_topk docstrings state how recall moves with the plane count; this
harness puts numbers on the sentence instead of asserting it).

Two surfaces share the sign-LSH geometry:

1. ``embedding_against_index`` (the incremental screen): a batch id is
   screened iff it lands in the SAME bucket as some index vector with
   exact cosine >= threshold. Precision is always 1.0 (the exact
   verify removes every false positive), so the only quality axis is
   recall of the truly-matchable batch ids — measured here per plane
   count against exact all-pairs batch x index cosine truth.
2. ``lsh_topk`` (single-table screen): recall@k vs cosine_topk over
   the same plane grid (extends tools/ann_recall.py's 4/6/8 grid).

Sign-LSH collision theory (Charikar 2002): P(same bucket) =
(1 - theta/pi)^planes — MONOTONE DECREASING in the plane count. More
planes = finer buckets = fewer candidates = LOWER single-table
recall; recall is raised by unioning independently-seeded tables
(OR-amplification, the lsh_topk num_tables knob), not by adding
planes to one table. The harness verifies this direction empirically.

    python tools/embed_recall.py [sf_dir]   # default /root/testdata/sf0.01
    python tools/embed_recall.py sf_dir 4x8 12x32   # only those
    # (planes x tables) multi-table rows — the full grid exceeds one
    # JVM's budget at the 32/64-table corner, so big combos run alone
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from gem_data_wrangle_spark import get_spark  # noqa: E402
from gem_data_wrangle_spark.operators import similarity as V  # noqa: E402

PLANE_GRID = [4, 8, 12, 16, 24]
# operator default 0.4 plus two looser bands — the testdata has no
# cross-split pairs above ~0.5, so tighter thresholds measure nothing
THRESHOLDS = [0.2, 0.3, 0.4]
# (planes, tables): the r14 grid stopped at 8x8 (recall 0.724 @
# cos>=0.2); round 15 (VERDICT r14 item 6) extends to the production
# corner — scaled plane counts (the per-bucket-population knob, 9-12
# ~ base + log2(index growth)) crossed with stacked tables (the
# recall knob) until a row clears >=0.9 recall at a graded threshold
TABLE_GRID = [
    (4, 2), (4, 4), (8, 4), (8, 8),
    (8, 16), (8, 32), (9, 8), (9, 16), (9, 32),
    (12, 16), (12, 32), (12, 64),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = [
        tuple(int(x) for x in a.split("x")) for a in sys.argv[2:]
    ]
    table_grid = only or TABLE_GRID
    spark = get_spark("embed-recall")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    index = emb.filter(F.col("vec_id") % 2 == 0)

    # exact all-pairs batch x index cosine truth (harness-only — the
    # N^2 join is the thing the bucket screen avoids at scale)
    v = V.as_double_array(F.col("embedding"))
    b = batch.select(F.col("vec_id").alias("bid"), v.alias("bv"),
                     V.norm(v).alias("bn"))
    i = index.select(F.col("vec_id").alias("iid"), v.alias("iv"),
                     V.norm(v).alias("in_"))
    truth = (
        b.crossJoin(i)
        .filter((F.col("bn") > 0) & (F.col("in_") > 0))
        .select(
            "bid", "iid",
            (V.dot(F.col("bv"), F.col("iv"))
             / (F.col("bn") * F.col("in_"))).alias("cos"),
        )
        .persist()
    )
    truth_ids = {
        t: {r["bid"] for r in
            truth.filter(F.col("cos") >= t).select("bid").distinct().collect()}
        for t in THRESHOLDS
    }
    print(json.dumps({
        "sf_dir": sf_dir, "dim": dim,
        "batch": batch.count(), "index": index.count(),
        "true_matched_ids": {str(t): len(s) for t, s in truth_ids.items()},
    }))

    # --- surface 1: the incremental screen, per plane count ---------
    batch_ids = {r["vec_id"] for r in batch.select("vec_id").collect()}
    for p in ([] if only else PLANE_GRID):
        planes = V.hyperplanes(p, dim)
        # candidate volume of the bucket equi-join (the cost axis)
        bb = batch.select(V.lsh_bucket(v, planes).alias("bk")).groupBy("bk").count()
        ib = index.select(V.lsh_bucket(v, planes).alias("bk")).groupBy("bk").count()
        n_cand = (
            bb.join(ib.withColumnRenamed("count", "ic"), on="bk")
            .select(F.sum(F.col("count") * F.col("ic")))
            .first()[0]
        ) or 0
        row: dict = {"planes": p, "bucket_candidates": int(n_cand)}
        for t in THRESHOLDS:
            t0 = time.time()
            fresh, _upd = V.embedding_against_index(
                batch, index, "embedding", "vec_id", planes, threshold=t
            )
            survived = {r["vec_id"] for r in fresh.select("vec_id").collect()}
            screened = batch_ids - survived
            assert screened <= truth_ids[t], "screen produced a false positive"
            row[f"recall@cos>={t}"] = round(
                len(screened) / max(len(truth_ids[t]), 1), 3
            )
            row.setdefault("wall_s", round(time.time() - t0, 2))
        print(json.dumps(row))

    # --- surface 1b: multi-table OR-amplification (the recall knob) -
    for p, nt in table_grid:
        tables = V.plane_tables(nt, p, dim)
        # per-bucket population of the INDEX side (the join-cost axis
        # the plane count controls): max + mean rows per (table,
        # bucket) key — "flat" means max stays O(1) as planes scale
        pop = (
            V.embedding_index_signatures(
                index, "embedding", "vec_id", tables
            )
            .groupBy("bucket").count()
            .agg(F.max("count").alias("mx"), F.avg("count").alias("av"))
            .first()
        )
        row = {"planes": p, "tables": nt,
               "bucket_pop_max": int(pop["mx"]),
               "bucket_pop_mean": round(float(pop["av"]), 1)}
        for t in THRESHOLDS:
            t0 = time.time()
            fresh, _upd = V.embedding_against_index(
                batch, index, "embedding", "vec_id", tables, threshold=t
            )
            survived = {r["vec_id"] for r in fresh.select("vec_id").collect()}
            screened = batch_ids - survived
            assert screened <= truth_ids[t], "screen produced a false positive"
            row[f"recall@cos>={t}"] = round(
                len(screened) / max(len(truth_ids[t]), 1), 3
            )
            row.setdefault("wall_s", round(time.time() - t0, 2))
        print(json.dumps(row))

    # --- surface 2: lsh_topk single-table screen over the same grid -
    if only:
        truth.unpersist()
        return
    k = 10
    probes = emb.orderBy("vec_id").limit(50)
    exact = {
        (r[0], r[1])
        for r in V.cosine_topk(emb, probes, "embedding", "vec_id", k=k)
        .select("query_id", "neighbor_id").collect()
    }
    for p in PLANE_GRID:
        approx = {
            (r[0], r[1])
            for r in V.lsh_topk(emb, probes, "embedding", "vec_id",
                                dim=dim, k=k, num_planes=p)
            .select("query_id", "neighbor_id").collect()
        }
        print(json.dumps({
            "planes": p, "lsh_topk_recall@10": round(
                len(approx & exact) / max(len(exact), 1), 4
            ),
        }))
    truth.unpersist()


if __name__ == "__main__":
    main()
