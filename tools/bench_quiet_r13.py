"""Round-13 quiet measurements (VERDICT r12 items 3 + 8).

Usage:
    python tools/bench_quiet_r13.py remeasure   # window_count_share +
                                                # gem_total_consolidation
                                                # 5-run quiet discipline
    python tools/bench_quiet_r13.py anchor      # 5-run anchors for the
                                                # two new bench rows

Same shape as every prior anchor: noop sink, sf0.1 (override with
SPARK_GRAFT_SF_DIR), per-query sf0.001 codegen warm-up, fresh
get_spark('bench') session, load average recorded before/after.
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

REMEASURE = ["window_count_share", "gem_total_consolidation"]
NEW_ROWS = [
    "image_neardup_components",
    "rle_compression_bound",
    "neardup_incremental",
    "image_neardup_incremental",
    "embedding_neardup_incremental",
]


def loadavg() -> str:
    return "%.2f %.2f %.2f" % os.getloadavg()


def five_runs(names: list[str]) -> None:
    spark = get_spark("bench")
    qs = entrymod.queries()
    print(json.dumps({"load_before": loadavg()}))
    for name in names:
        fn = qs[name]
        fn(spark, WARM_DIR).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(5):
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        print(json.dumps({
            "query": name,
            "runs": runs,
            "median": round(statistics.median(runs), 3),
        }))
    print(json.dumps({"load_after": loadavg()}))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "remeasure"
    five_runs(REMEASURE if mode == "remeasure" else NEW_ROWS)
