"""100× hot-key window stress (VERDICT r5 item 7).

Extends the round-5 30× table (SCALE.md): lineitem replicated 100×
(60M rows) with ONE key forced onto 10% of rows — a 6M-row hot key —
through window_count_share and dedup_first_per_key in both the window
and skew_safe formulations. Confirms (a) the count-only window path's
straggler curve (WindowExec buffers the hot key's rows in one task,
linear in hot-key row count), (b) the skew_safe agg+join-back's
bounded per-task line, and (c) that dedup_first_per_key's window path
stays flat (WindowGroupLimit Partial ships ≤1 row/key/partition).

    python tools/hotkey_stress_100x.py [N]     # default 100
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from gem_data_wrangle_spark import get_spark  # noqa: E402
from gem_data_wrangle_spark.operators import aggregates as Agg  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

BASE = "/root/testdata/sf0.1"


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark("hotkey-stress")
    hotkey_dir = f"/tmp/scale_sf{n}x/lineitem_hotkey.parquet"
    if not os.path.exists(hotkey_dir):
        li = spark.read.parquet(f"{BASE}/lineitem.parquet")
        big = (
            li.withColumn("_i", F.explode(F.sequence(F.lit(0), F.lit(n - 1))))
            .withColumn("l_orderkey", F.col("l_orderkey") + F.col("_i") * 10_000_000)
            .drop("_i")
            .withColumn(
                "l_orderkey",
                F.when(F.rand(7) < 0.10, F.lit(424242)).otherwise(F.col("l_orderkey")),
            )
        )
        big.repartition(max(8, 2 * n)).write.mode("overwrite").parquet(hotkey_dir)
    hk = spark.read.parquet(hotkey_dir)
    total = hk.count()
    hot = hk.filter(F.col("l_orderkey") == 424242).count()
    print(json.dumps({"rows": total, "hot_key_rows": hot}))

    order = [c for c in hk.columns if c != "l_orderkey"]
    cases = {
        "wcs window": Agg.window_count_share(hk, ["l_orderkey"]),
        "wcs skew_safe": Agg.window_count_share(hk, ["l_orderkey"], skew_safe=True),
        "dedup window": Agg.dedup_first_per_key(hk, ["l_orderkey"], order),
        "dedup skew_safe": Agg.dedup_first_per_key(
            hk, ["l_orderkey"], order, skew_safe=True
        ),
    }
    results = {}
    for label, df in cases.items():
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        results[label] = round(time.time() - t0, 2)
        print(json.dumps({label: results[label]}))
    print(json.dumps({"n": n, "results": results}))


if __name__ == "__main__":
    main()
