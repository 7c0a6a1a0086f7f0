"""Round-14 directed A/Bs (VERDICT r13 items 4 and 6).

Usage:
    python tools/bench_ab_r14.py screens   # materialize= A/B on the
                                           # three *_against_index
                                           # incremental screens
    python tools/bench_ab_r14.py quiet     # 5-run idle re-measure of
                                           # doc_readability +
                                           # vad_speech_segments

`screens` measures the PRODUCTION action shape: materialize both
returned frames (fresh -> noop sink, updated_index -> noop sink) —
the case where the lazy plan recomputes the batch signature pass /
index join per action and the materialize=True contract runs it once.
5 interleaved runs per arm, medians reported.

All timings run the bench harness's exact shape: noop sink, sf0.1
(override with SPARK_GRAFT_SF_DIR), fresh get_spark('bench') session,
load average recorded before/after.
"""

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from gem_data_wrangle_spark import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = "/root/testdata/sf0.001"


def loadavg() -> str:
    return "%.2f %.2f %.2f" % os.getloadavg()


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _screen_builders(spark, sf_dir, materialize):
    """(name, thunk) per screen; each thunk builds the screen and
    materializes BOTH returned frames — the double-action shape."""
    from gem_data_wrangle_spark.operators import dedup as D
    from gem_data_wrangle_spark.operators import multimodal as M
    from gem_data_wrangle_spark.operators import similarity as V

    def neardup():
        docs = entrymod._spread(spark, entrymod._t(spark, sf_dir, "documents"))
        index = D.minhash_signatures(
            docs.filter(F.col("doc_id") % 2 == 0), "text", "doc_id"
        )
        fresh, updated = D.neardup_against_index(
            docs.filter(F.col("doc_id") % 2 == 1), index, "text", "doc_id",
            materialize=materialize,
        )
        _noop(fresh)
        _noop(updated)

    def hamming():
        media = entrymod._synth_dhash_media(spark, sf_dir)
        hashes = M.image_dhash(media).select("id", "hash_hi", "hash_lo")
        in_index = (F.col("id") % 50 < 25) & (F.col("id") < 250)
        fresh, updated = D.hamming_against_index(
            hashes.filter(~in_index), hashes.filter(in_index),
            "id", ["hash_hi", "hash_lo"], max_distance=4,
            materialize=materialize,
        )
        _noop(fresh)
        _noop(updated)

    def embedding():
        emb = entrymod._t(spark, sf_dir, "embeddings")
        planes = V.hyperplanes(entrymod._LSH_PLANES, entrymod._LSH_DIM)
        fresh, updated = V.embedding_against_index(
            emb.filter(F.col("vec_id") % 2 == 1),
            emb.filter(F.col("vec_id") % 2 == 0),
            "embedding", "vec_id", planes, threshold=0.4,
            materialize=materialize,
        )
        _noop(fresh)
        _noop(updated)

    return [("neardup", neardup), ("hamming", hamming),
            ("embedding", embedding)]


def screens_ab() -> None:
    spark = get_spark("bench")
    print(f"# *_against_index materialize A/B  sf={SF_DIR}  "
          f"load_before=[{loadavg()}]  (both outputs sunk per run)")
    # warm codegen/readers once per screen at sf0.001
    for _, thunk in _screen_builders(spark, WARM_DIR, True):
        thunk()
    results: dict[str, dict[bool, list[float]]] = {}
    for _ in range(5):  # interleaved arms, 5 rounds
        for mat in (False, True):
            for name, thunk in _screen_builders(spark, SF_DIR, mat):
                t0 = time.time()
                thunk()
                results.setdefault(name, {}).setdefault(mat, []).append(
                    round(time.time() - t0, 3)
                )
    for name, arms in results.items():
        lazy = statistics.median(arms[False])
        mat = statistics.median(arms[True])
        print(f"{name}: lazy x5 {arms[False]} median={lazy}s | "
              f"materialize x5 {arms[True]} median={mat}s | "
              f"ratio={mat / lazy:.2f}x")
    print(f"# load_after=[{loadavg()}]")


def quiet_remeasure() -> None:
    qs = entrymod.queries()
    spark = get_spark("bench")
    print(f"# quiet 5-run re-measure  sf={SF_DIR}  load_before=[{loadavg()}]")
    for name in ("doc_readability", "vad_speech_segments"):
        q = qs[name]
        _noop(q(spark, WARM_DIR))  # bench.py shape: one warm-up
        runs = []
        for _ in range(5):
            t0 = time.time()
            _noop(q(spark, SF_DIR))
            runs.append(round(time.time() - t0, 3))
        print(f"{name}: x5 {runs}  median={statistics.median(runs)}s")
    print(f"# load_after=[{loadavg()}]")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "screens"
    if mode == "screens":
        screens_ab()
    elif mode == "quiet":
        quiet_remeasure()
    else:
        raise SystemExit(f"unknown mode {mode!r}")
