"""Streaming asymmetric scale curves for the stream_*_screen family
(VERDICT r14 item 2): hold the arriving MICRO-BATCH fixed and grow
ONLY the persisted index 10x/100x — the per-micro-batch cost model
that is the whole point of the foreachBatch screens. The batch
operators' asymmetric curves (tools/scale_asym.py, SCALE.md r14)
measure the screen JOIN; this harness measures the full streaming
composition: index probe + replay-guarded key-pruned read + screen +
both sorted partition writes + checkpoint commit, via a real
availableNow StreamingQuery.

History layout matches what the screens themselves write: one
``batch_id=N`` partition per historical micro-batch, each delta
sorted by the screen's join key — at factor k the index holds k
partitions of one fixed-size delta each (a k-batch-long history),
NOT one k-times-bigger partition. Historical partitions are written
at NEGATIVE batch_ids so a fresh checkpoint's batch 0 sees all of
them through the strictly-older replay guard (``batch_id < 0``)
without replaying k micro-batches per measurement.

Variants per screen:
  pruned    — the shipped path: batch key set pushed into the index
              read (isin / broadcast-semi)
  unpruned  — the round-14 behavior, reproduced by neutralizing
              _pruned_index in-process: every micro-batch scans and
              joins the ENTIRE history (the O(history) flaw this
              round fixed)

    python tools/scale_stream.py [sf_dir] [out_dir] [screen ...]
    # defaults: /root/testdata/sf0.1  /tmp/stream_asym  all screens
    # name screens to isolate them in a fresh JVM (same
    # cross-contamination caveat as tools/scale_asym.py)
"""

from __future__ import annotations

import json
import shutil
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
from gem_data_wrangle_spark.streaming import screening as S  # noqa: E402

FACTORS = [1, 10, 100]
ID_STRIDE = 100_000_000
# sf0.1's index half is only ~2.5k docs — far too small for an
# O(history) term to register against the ~1s fixed streaming
# overhead. Each historical partition therefore holds REP_PER_DELTA
# id-offset copies of the base (one "larger micro-batch"), so the
# top factor reaches millions of index rows and the unpruned
# scan+shuffle has something to choke on. Embeddings carry 64 doubles
# per row; a smaller multiplier keeps the 100x build under a GB while
# still reaching ~1M vectors.
REP_PER_DELTA = {"digest": 40, "neardup": 40, "hamming": 40,
                 "embedding": 10}


def _replicate(df, id_col, start_rep: int, n: int):
    """n id-offset copies of df (reps start_rep..start_rep+n-1) — or,
    for the id-less digest index, n verbatim copies (same distinct
    digest set, n-times the scan/shuffle input — exactly what the
    unpruned variant must pay per micro-batch)."""
    r = df.sparkSession.range(start_rep, start_rep + n).select(
        F.col("id").alias("_rep")
    )
    out = df.crossJoin(r)
    if id_col is not None:
        out = out.withColumn(
            id_col, F.col(id_col) + F.col("_rep") * ID_STRIDE
        )
    return out.drop("_rep")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/stream_asym")
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark("scale-stream")

    docs = entrymod._spread(spark, entrymod._t(spark, sf_dir, "documents"))
    batch_docs = docs.filter(F.col("doc_id") % 2 == 1)
    index_docs = docs.filter(F.col("doc_id") % 2 == 0)

    emb = entrymod._t(spark, sf_dir, "embeddings")
    batch_emb = emb.filter(F.col("vec_id") % 2 == 1)
    index_emb = emb.filter(F.col("vec_id") % 2 == 0)
    # STREAMING geometry provisioning: unlike a batch job, a deployed
    # screen cannot scale its plane count as history grows — planes
    # must be identical across every micro-batch and the whole index.
    # Production therefore provisions planes for the TARGET horizon:
    # base + log2(max index growth) (the r14 recipe applied once, up
    # front). Sized here for the 100x top factor; measuring the base
    # geometry instead just reproduces the known fixed-geometry
    # linearity (SCALE.md r14: 2^4 buckets -> per-bucket population,
    # and with it the verify join, grows with the index).
    planes = V.hyperplanes(
        entrymod._LSH_PLANES + max(0, (max(FACTORS) - 1).bit_length() - 1),
        entrymod._LSH_DIM,
    )

    media = entrymod._synth_dhash_media(spark, sf_dir)
    hashes = M.image_dhash(media).select("id", "hash_hi", "hash_lo")
    if not (out / "dhash.parquet" / "_SUCCESS").exists():
        hashes.write.mode("overwrite").parquet(str(out / "dhash.parquet"))
    hashes = spark.read.parquet(str(out / "dhash.parquet"))
    in_index = (F.col("id") % 50 < 25) & (F.col("id") < 250)
    batch_img = hashes.filter(~in_index)
    index_img = hashes.filter(in_index)

    def _hamming_delta(df):
        return D._packed_bands(
            df, "id", ["hash_hi", "hash_lo"], 32, 4
        ).select(
            "id", "hash_hi", "hash_lo",
            F.col("_bi").alias("band_idx"),
            F.col("_bv").alias("band_value"),
        )

    # index DELTA per historical micro-batch (REP_PER_DELTA base
    # copies), exactly the shape + sort each screen's own delta()
    # writes. Signatures/buckets are derived BEFORE replication so the
    # build pays the minhash/LSH pass once per base, not per copy.
    digest_base = index_docs.select(F.md5("text").alias("digest"))
    neardup_base = D.minhash_signatures(index_docs, "text", "doc_id")
    hamming_base = _hamming_delta(index_img)
    embedding_base = V.embedding_index_signatures(
        index_emb, "embedding", "vec_id", planes
    )
    deltas = {
        "digest": lambda p: _replicate(
            digest_base, None, p * 40, REP_PER_DELTA["digest"]
        ).sortWithinPartitions("digest"),
        "neardup": lambda p: _replicate(
            neardup_base, "doc_id", p * 40, REP_PER_DELTA["neardup"]
        ).sortWithinPartitions("signature"),
        "hamming": lambda p: _replicate(
            hamming_base, "id", p * 40, REP_PER_DELTA["hamming"]
        ).sortWithinPartitions("band_value"),
        "embedding": lambda p: _replicate(
            embedding_base, "vec_id", p * 10,
            REP_PER_DELTA["embedding"],
        ).sortWithinPartitions("bucket"),
    }

    # micro-batch SOURCE per screen (one availableNow batch)
    srcs = {
        "digest": batch_docs,
        "neardup": batch_docs,
        "hamming": batch_img,
        "embedding": batch_emb,
    }
    for name, df in srcs.items():
        tgt = out / f"src_{name}.parquet"
        if not (tgt / "_SUCCESS").exists():
            df.write.mode("overwrite").parquet(str(tgt))

    # ---- build each history at 1x/10x/100x micro-batches -----------
    for name, mk in deltas.items():
        for k in FACTORS:
            root = out / f"idx_{name}_{k}"
            done = root / "_BUILT"
            if done.exists():
                continue
            for p in range(k):
                mk(p).coalesce(1).write.mode("overwrite").parquet(
                    str(root / f"batch_id={-(p + 1)}")
                )
            done.touch()

    def start(name: str, index_dir: str, fresh_dir: str, ckpt: str):
        schema = {
            "digest": "doc_id bigint, text string",
            "neardup": "doc_id bigint, text string",
            "hamming": "id bigint, hash_hi bigint, hash_lo bigint",
            "embedding": "vec_id bigint, embedding array<double>",
        }[name]
        stream = spark.readStream.schema(schema).parquet(
            str(out / f"src_{name}.parquet")
        )
        if name == "digest":
            return S.stream_dedup_screen(
                stream, index_dir, fresh_dir, ckpt, "text", "doc_id"
            )
        if name == "neardup":
            return S.stream_neardup_screen(
                stream, index_dir, fresh_dir, ckpt, "text", "doc_id"
            )
        if name == "hamming":
            return S.stream_hamming_screen(
                stream, index_dir, fresh_dir, ckpt,
                "id", ["hash_hi", "hash_lo"], max_distance=4,
            )
        return S.stream_embedding_screen(
            stream, index_dir, fresh_dir, ckpt,
            "embedding", "vec_id", planes, threshold=0.4,
        )

    real_prune = S._pruned_index

    def run_once(name: str, k: int, pruned: bool) -> float:
        S._pruned_index = (
            real_prune if pruned else (lambda index, keys, cap: index)
        )
        try:
            idx = out / f"idx_{name}_{k}"
            scratch = out / "scratch"
            shutil.rmtree(scratch, ignore_errors=True)
            # batch 0 writes its own delta to batch_id=0 — drop any
            # previous run's partition so history stays k deltas
            shutil.rmtree(idx / "batch_id=0", ignore_errors=True)
            t0 = time.time()
            q = start(
                name, str(idx),
                str(scratch / "fresh"), str(scratch / "ckpt"),
            )
            q.awaitTermination(600)
            return round(time.time() - t0, 2)
        finally:
            S._pruned_index = real_prune
            shutil.rmtree(out / "scratch", ignore_errors=True)
            shutil.rmtree(out / f"idx_{name}_{k}" / "batch_id=0",
                          ignore_errors=True)

    only = set(sys.argv[3:])
    names = [n for n in deltas if not only or n in only]

    # warm codegen/streaming machinery once at 1x
    for name in names:
        run_once(name, 1, True)

    for name in names:
        for pruned in (True, False):
            rows = []
            for k in FACTORS:
                runs = [run_once(name, k, pruned) for _ in range(3)]
                rows.append((k, statistics.median(runs), runs))
            base = rows[0][1]
            print(json.dumps({
                "screen": name,
                "variant": "pruned" if pruned else "unpruned",
                "batch_fixed_sf": sf_dir,
                "curve": [
                    {"index_x": k, "wall_s": w, "runs": r,
                     "wall_ratio": round(w / max(base, 1e-9), 2)}
                    for k, w, r in rows
                ],
            }), flush=True)


if __name__ == "__main__":
    main()
