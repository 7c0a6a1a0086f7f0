"""Round-11 directed A/Bs (VERDICT r10 directives 2, 3, 7).

Usage:
    python tools/bench_ab_r11.py simhash   # cold-vs-warm 5-run A/B
    python tools/bench_ab_r11.py jl        # literal vs broadcast ship
    python tools/bench_ab_r11.py anchor    # comparable-14 + heavy-5 medians

All timings run the bench harness's exact shape: noop sink, sf0.1
(override with SPARK_GRAFT_SF_DIR), fresh get_spark('bench') session
per process invocation, load average recorded before/after.
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from gem_data_wrangle_spark import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = "/root/testdata/sf0.001"

COMPARABLE_14 = [
    "agg_sum_groups", "expand_years", "harmonize_coordinates",
    "split_ownership_equal", "window_count_share", "dedup_first_per_key",
    "join_fallback_chain", "top_k", "minhash_lsh_pairs",
    "similarity_bruteforce", "stream_tumbling_window",
    "stream_session_window", "tfidf_top_terms", "gem_coal_pipeline",
]
HEAVY_5 = [
    "gem_total_consolidation_all8", "neardup_dedup", "simhash_pairs",
    "kn_doc_scores", "exact_jaccard_pairs",
]


def loadavg() -> str:
    return "%.2f %.2f %.2f" % os.getloadavg()


def run_once(spark, fn, sf_dir) -> float:
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def simhash_ab() -> None:
    q = entrymod.queries()["simhash_pairs"]
    spark = get_spark("bench")
    print(f"# simhash_pairs A/B  sf={SF_DIR}  load_before=[{loadavg()}]")
    cold = run_once(spark, q, SF_DIR)  # first-ever run: codegen cold
    print(f"cold (no warm-up, first run in session): {cold}s")
    warm = [run_once(spark, q, SF_DIR) for _ in range(5)]
    print(f"warm x5: {warm}  median={statistics.median(warm)}s")
    # bench.py shape: one sf0.001 warm-up then the timed run
    q(spark, WARM_DIR).write.format("noop").mode("overwrite").save()
    shaped = run_once(spark, q, SF_DIR)
    print(f"bench-shaped (post small-sf warm-up): {shaped}s")
    print(f"load_after=[{loadavg()}]")


def jl_ab() -> None:
    from gem_data_wrangle_spark.operators.similarity import jl_project_int
    from gem_data_wrangle_spark.sources import scan_parquet  # noqa: F401

    spark = get_spark("bench")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    print(f"# jl ship A/B  sf={SF_DIR}  load_before=[{loadavg()}]")
    out = {}
    for ship in ("literal", "broadcast"):
        def fn(s, d, _ship=ship):
            return jl_project_int(
                spark.read.parquet(f"{d}/embeddings.parquet"),
                "embedding", "vec_id", 64, 16, ship=_ship,
            )
        fn(spark, WARM_DIR).write.format("noop").mode("overwrite").save()
        times = [run_once(spark, fn, SF_DIR) for _ in range(5)]
        out[ship] = times
        print(f"{ship}: {times}  median={statistics.median(times)}s")
    print(f"load_after=[{loadavg()}]")
    print(json.dumps(out))


def anchor() -> None:
    spark = get_spark("bench")
    names = COMPARABLE_14 + HEAVY_5
    q = entrymod.queries()
    print(f"# round-11 quiet anchor  sf={SF_DIR}  load_before=[{loadavg()}]")
    meds = {}
    for name in names:
        fn = q[name]
        fn(spark, WARM_DIR).write.format("noop").mode("overwrite").save()
        times = [run_once(spark, fn, SF_DIR) for _ in range(5)]
        meds[name] = statistics.median(times)
        print(f"{name}: {times}  median={meds[name]}s")
    print(f"comparable14_median_total={round(sum(meds[n] for n in COMPARABLE_14), 3)}")
    print(f"heavy5_median_total={round(sum(meds[n] for n in HEAVY_5), 3)}")
    print(f"load_after=[{loadavg()}]")
    print(json.dumps(meds))


if __name__ == "__main__":
    {"simhash": simhash_ab, "jl": jl_ab, "anchor": anchor}[sys.argv[1]]()
