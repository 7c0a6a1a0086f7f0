"""Asymmetric scale curves for the *_against_index incremental
screens (VERDICT r13 item 3): hold the arriving BATCH at sf0.1 and
grow ONLY the INDEX 10x/100x — the production shape (ten years of
history, one new snapshot) that the symmetric 10x/30x harness cannot
isolate because it replicates both sides together.

What this verifies: the "history is touched only through its
signature table" claim where it matters — index-side bucket/band
populations (the candidate fan-out) and the LEFT ANTI build side (the
matched-id set, which must stay batch-bounded no matter how big the
index gets). Each index is WRITTEN to parquet and read back, so the
timed screen sees a persisted history table exactly as a snapshot job
would; timing sinks the `fresh` frame (the screen decision). The
updated_index union is deliberately not timed — it is a linear
scan-union whose cost is the caller's sink, not the screen.

    python tools/scale_asym.py [sf_dir] [out_dir] [screen ...]
    # defaults: /root/testdata/sf0.1  /tmp/asym_idx  all screens
    # name screens to isolate them in a fresh JVM: back-to-back heavy
    # variants contaminate each other's timings (accumulated
    # localCheckpoint blocks + GC pressure — observed 10x noise on the
    # last variant of a full in-process sweep)
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from gem_data_wrangle_spark import get_spark  # noqa: E402
from gem_data_wrangle_spark.operators import dedup as D  # noqa: E402
from gem_data_wrangle_spark.operators import multimodal as M  # noqa: E402
from gem_data_wrangle_spark.operators import similarity as V  # noqa: E402

FACTORS = [1, 10, 100]
ID_STRIDE = 100_000_000  # replica id offset: keeps index ids unique


def _replicate(df, id_col: str, k: int):
    """k copies of df with ids offset per replica — a k-times-longer
    history whose every signature value recurs k times (worst-case
    bucket-population growth for a fixed batch)."""
    if k == 1:
        return df
    r = df.sparkSession.range(k).select(F.col("id").alias("_rep"))
    return df.crossJoin(r).withColumn(
        id_col, F.col(id_col) + F.col("_rep") * ID_STRIDE
    ).drop("_rep")


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/asym_idx")
    # reuse previously-built indexes (same sf => same content): lets a
    # screen re-run in a fresh JVM without paying the 100x build again
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("scale-asym")

    docs = entrymod._spread(spark, entrymod._t(spark, sf_dir, "documents"))
    batch_docs = docs.filter(F.col("doc_id") % 2 == 1)
    index_docs = docs.filter(F.col("doc_id") % 2 == 0)

    emb = entrymod._t(spark, sf_dir, "embeddings")
    batch_emb = emb.filter(F.col("vec_id") % 2 == 1)
    index_emb = emb.filter(F.col("vec_id") % 2 == 0)
    planes = V.hyperplanes(entrymod._LSH_PLANES, entrymod._LSH_DIM)

    media = entrymod._synth_dhash_media(spark, sf_dir)
    hashes = M.image_dhash(media).select("id", "hash_hi", "hash_lo")
    in_index = (F.col("id") % 50 < 25) & (F.col("id") < 250)
    # persist the dHash pass once — it is batch prep, not the screen
    if not (out_dir / "dhash.parquet" / "_SUCCESS").exists():
        hashes.write.mode("overwrite").parquet(str(out_dir / "dhash.parquet"))
    hashes = spark.read.parquet(str(out_dir / "dhash.parquet"))
    batch_img = hashes.filter(~in_index)
    index_img = hashes.filter(in_index)

    # ---- build + persist each index at 1x/10x/100x -----------------
    base = {
        "digest": index_docs.select(F.md5("text").alias("digest")),
        "neardup": D.minhash_signatures(index_docs, "text", "doc_id"),
        "hamming": index_img,
        "embedding": index_emb.select("vec_id", "embedding"),
        # persisted-signature shape (round 14): norm + bucket computed
        # ONCE at index-build time, the screen never re-buckets history
        "embedding_sig": V.embedding_index_signatures(
            index_emb.select("vec_id", "embedding"),
            "embedding", "vec_id", planes,
        ),
    }
    id_cols = {"digest": None, "neardup": "doc_id",
               "hamming": "id", "embedding": "vec_id",
               "embedding_sig": "vec_id"}
    for name, df in base.items():
        for k in FACTORS:
            rep = _replicate(df, id_cols[name], k) if id_cols[name] else (
                df if k == 1
                else df.crossJoin(spark.range(k)).drop("id")
            )
            tgt = out_dir / f"{name}_{k}.parquet"
            if not (tgt / "_SUCCESS").exists():
                rep.write.mode("overwrite").parquet(str(tgt))

    def scaled_planes(k: int):
        # log2(index growth) extra planes holds per-bucket population
        # roughly constant (2^planes buckets); per-table recall falls —
        # compensate with num_tables (embed_recall.py's OR knob)
        return V.hyperplanes(
            entrymod._LSH_PLANES + max(0, (k - 1).bit_length() - 1),
            entrymod._LSH_DIM,
        )

    # signature index at the SCALED geometry per factor: the combined
    # production shape (persisted norm+bucket AND growth-matched planes)
    for k in FACTORS:
        tgt = out_dir / f"embedding_sigp_{k}.parquet"
        if not (tgt / "_SUCCESS").exists():
            V.embedding_index_signatures(
                _replicate(base["embedding"], "vec_id", k),
                "embedding", "vec_id", scaled_planes(k),
            ).write.mode("overwrite").parquet(str(tgt))

    def screens(k: int):
        read = lambda n: spark.read.parquet(  # noqa: E731
            str(out_dir / f"{n}_{k}.parquet")
        )
        return {
            "digest": lambda: _noop(D.dedup_against_index(
                batch_docs, read("digest"), "text", "doc_id")[0]),
            "neardup": lambda: _noop(D.neardup_against_index(
                batch_docs, read("neardup"), "text", "doc_id")[0]),
            "hamming": lambda: _noop(D.hamming_against_index(
                batch_img, read("hamming"), "id",
                ["hash_hi", "hash_lo"], max_distance=4)[0]),
            "embedding": lambda: _noop(V.embedding_against_index(
                batch_emb, read("embedding"), "embedding", "vec_id",
                planes, threshold=0.4)[0]),
            # persisted-signature index at FIXED geometry: isolates the
            # index-side recompute from the bucket-population growth
            "embedding_sig": lambda: _noop(V.embedding_against_index(
                batch_emb, read("embedding_sig"), "embedding", "vec_id",
                planes, threshold=0.4)[0]),
            "embedding_scaledp": lambda: _noop(V.embedding_against_index(
                batch_emb, read("embedding"), "embedding", "vec_id",
                scaled_planes(k), threshold=0.4)[0]),
            # the production combo: persisted signatures AT the scaled
            # geometry — no index-side recompute AND bounded buckets
            "embedding_sig_scaledp": lambda: _noop(V.embedding_against_index(
                batch_emb, read("embedding_sigp"), "embedding", "vec_id",
                scaled_planes(k), threshold=0.4)[0]),
        }

    only = set(sys.argv[3:])
    names = [n for n in screens(1) if not only or n in only]

    # warm codegen once at 1x
    for name in names:
        screens(1)[name]()

    for name in names:
        rows = []
        for k in FACTORS:
            runs = []
            for _ in range(3):
                t0 = time.time()
                screens(k)[name]()
                runs.append(round(time.time() - t0, 2))
            rows.append((k, statistics.median(runs), runs))
        base_wall = rows[0][1]
        print(json.dumps({
            "screen": name,
            "batch_fixed_sf": sf_dir,
            "curve": [
                {"index_x": k, "wall_s": w, "runs": r,
                 "wall_ratio": round(w / max(base_wall, 1e-9), 2)}
                for k, w, r in rows
            ],
        }))


if __name__ == "__main__":
    main()
