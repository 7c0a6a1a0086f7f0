"""VERDICT r16 item 6: do kn_doc_scores / vad_speech_segments (and the
other mapInPandas rows) carry a Python-worker-AGING penalty in the
full suite, and would disabling worker reuse reclaim it?

Replays bench.py's exact methodology (same HEADLINE list, same
per-query sf0.001 warm-up, same noop sink) in a FRESH process per
variant, with the only difference being spark.python.worker.reuse.
bench.py itself is untouched (the driver's bench stays comparable);
this is an A/B note for BENCH_HISTORY.

    python tools/bench_worker_reuse_r17.py reuse_on
    python tools/bench_worker_reuse_r17.py reuse_off
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402  — the HEADLINE list, not a re-declaration
import __spark_entry__ as entrymod  # noqa: E402
from gem_data_wrangle_spark import get_spark  # noqa: E402


def main() -> None:
    variant = sys.argv[1]
    reuse = "false" if variant == "reuse_off" else "true"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        f"bench-worker-{variant}",
        conf={"spark.python.worker.reuse": reuse},
    )
    queries = entrymod.queries()
    timings: dict[str, float] = {}
    for name in bench.HEADLINE:
        fn = queries[name]
        try:
            fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:  # noqa: BLE001
            pass
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
    print(json.dumps({
        "variant": variant,
        "worker_reuse": reuse,
        "value": round(sum(timings.values()), 3),
        "queries": timings,
    }))


if __name__ == "__main__":
    main()
