"""Round-14 quiet re-measure (VERDICT r13 item 6): doc_readability
(0.74 s in BENCH_r13, 1.66x vs r12) and vad_speech_segments (3.00 s,
1.25x) — neither module changed in round 13 and both previewed lower
on the quiet box, so per the anchor discipline they get a 5-run idle
confirm before any anchor is re-recorded.

    python tools/bench_quiet_r14.py

Same protocol as every prior anchor: noop sink, sf0.1 (override with
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

REMEASURE = ["doc_readability", "vad_speech_segments"]


def loadavg() -> str:
    return "%.2f %.2f %.2f" % os.getloadavg()


def main() -> None:
    spark = get_spark("bench")
    qs = entrymod.queries()
    print(json.dumps({"load_before": loadavg()}))
    for name in REMEASURE:
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
    main()
