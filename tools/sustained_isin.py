"""Sustained streaming-screen session in the ISIN-prune regime
(round 16 follow-up): the 40-batch sustained sessions
(tools/sustained_stream.py) carried >100 distinct keys per batch, so
every index read took the broadcast-LEFT-SEMI prune — a full history
scan under either layout — and the compacted layout's row-group /
page-index pruning win was invisible end-to-end (SCALE.md round-16
finding 1 says exactly this). This harness measures the OTHER regime:
small micro-batches (<= max_isin_keys distinct digests, the pushed
``isin`` path) screened against a LARGE prebuilt history, sustained
for N batches so the session's own deltas accumulate on top.

Variants (digest screen — the cleanest scan signal; the banded
screens' layout A/B is tools/compact_ab_banded.py):

  delta     — the history as the stream writes it: 100 per-batch
              ``batch_id=-k`` partitions, each internally key-sorted
              but all spanning the full key range (stats can't skip
              files); no maintenance during the session, so footers
              grow 100 -> 100+N.
  compacted — the same rows pre-compacted by ``compact_screen_index``
              (one range-clustered partition); ``maybe_compact(
              min_delta_partitions=16, size_ratio=0.5)`` between
              batches keeps the session's own delta count bounded
              (the count backstop fires ~twice in 40 batches at this
              shape; the geometric trigger can't — session deltas are
              tiny against the base).

Batch content: 80 fresh salted docs + a 20-doc dup slice of the
previous batch = exactly 100 distinct digests, the ``isin`` boundary
(``_pruned_index`` collects 101, sees 100, pushes the predicate to
the parquet scan). The dup slice keeps the screen doing real drops.

    python tools/sustained_isin.py [sf_dir] [out_dir] [N] [variant ...]
    # defaults: /root/testdata/sf0.1  /tmp/sustained_isin  40  both
    # variant names: delta compacted
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from gem_data_wrangle_spark import get_spark  # noqa: E402
from gem_data_wrangle_spark.streaming import (  # noqa: E402
    compact_screen_index,
    maybe_compact,
    stream_dedup_screen,
)

ID_STRIDE = 100_000_000
HISTORY_DELTAS = 100
REP_PER_DELTA = 40  # x ~2.5k index docs -> ~10M history rows
FRESH_PER_BATCH = 80
DUP_PER_BATCH = 20  # 80 + 20 = 100 distinct keys = the isin boundary
CADENCE = {"min_delta_partitions": 16, "size_ratio": 0.5}


def _build_history(spark, docs, root: Path) -> None:
    """100 key-sorted deltas at negative batch_ids (the scale_stream
    convention: a fresh checkpoint's batch 0 sees all of them through
    the strictly-older replay guard without replaying 100 batches)."""
    if (root / "_BUILT").exists():
        return
    base = docs.select(F.md5("text").alias("digest"))
    for p in range(HISTORY_DELTAS):
        reps = spark.range(
            p * REP_PER_DELTA, (p + 1) * REP_PER_DELTA
        ).select(F.col("id").alias("_rep"))
        delta = (
            base.crossJoin(reps)
            .select(
                F.md5(F.concat("digest", F.lit("#"), "_rep")).alias(
                    "digest"
                )
            )
            .sortWithinPartitions("digest")
        )
        delta.coalesce(1).write.mode("overwrite").parquet(
            str(root / f"batch_id={-(p + 1)}")
        )
    (root / "_BUILT").touch()


def _batch(docs, i: int):
    """80 fresh salted docs + 20 dups of batch i-1's salt."""
    small = docs.filter(F.col("doc_id") < FRESH_PER_BATCH)
    fresh = small.select(
        (F.col("doc_id") + F.lit(i * ID_STRIDE)).alias("doc_id"),
        F.concat("text", F.lit(f"#b{i}")).alias("text"),
    )
    if i == 0:
        return fresh
    dup = small.filter(F.col("doc_id") < DUP_PER_BATCH).select(
        (F.col("doc_id") + F.lit(i * ID_STRIDE + ID_STRIDE // 2)).alias(
            "doc_id"
        ),
        F.concat("text", F.lit(f"#b{i - 1}")).alias("text"),
    )
    return fresh.unionByName(dup)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sustained_isin")
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    only = set(sys.argv[4:])
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark("sustained-isin")

    docs = entrymod._t(spark, sf_dir, "documents").select("doc_id", "text")
    hist = out / "history_delta"
    _build_history(spark, docs, hist)

    comp = out / "history_compacted"
    if not (comp / "_BUILT").exists():
        shutil.rmtree(comp, ignore_errors=True)
        shutil.copytree(hist, comp)
        (comp / "_BUILT").unlink()
        compact_screen_index(spark, str(comp), "digest")
        (comp / "_BUILT").touch()

    def run(tag: str, layout: Path, compact: bool, n: int) -> dict:
        base = out / f"run_{tag}"
        shutil.rmtree(base, ignore_errors=True)
        base.mkdir(parents=True)
        idx = base / "index"
        shutil.copytree(layout, idx)
        (idx / "_BUILT").unlink()
        src = str(base / "src")
        walls, compact_walls, stamps = [], [], []
        for i in range(n):
            _batch(docs, i).coalesce(1).write.mode("append").parquet(src)
            stream = spark.readStream.schema(
                "doc_id bigint, text string"
            ).parquet(src)
            t0 = time.time()
            q = stream_dedup_screen(
                stream, str(idx), str(base / "fresh"),
                str(base / "ckpt"), "text", "doc_id",
            )
            q.awaitTermination(600)
            walls.append(round(time.time() - t0, 2))
            if compact:
                t0 = time.time()
                stamp = maybe_compact(spark, str(idx), "digest", **CADENCE)
                if stamp != -(2 ** 31):
                    compact_walls.append(round(time.time() - t0, 2))
                    stamps.append(i)
        rec = {
            "variant": tag,
            "walls": walls,
            "compact_walls": compact_walls,
            "compact_at": stamps,
            "final_partitions": sum(
                1 for p in idx.iterdir()
                if p.name.startswith("batch_id=")
            ),
            "final_files": sum(1 for _ in idx.rglob("part-*.parquet")),
            "fresh_rows": spark.read.parquet(str(base / "fresh")).count(),
        }
        print(json.dumps(rec))
        (out / f"{tag}.json").write_text(json.dumps(rec, indent=1))
        return rec

    variants = [("delta", hist, False), ("compacted", comp, True)]
    picked = [v for v in variants if not only or v[0] in only]
    # throwaway warm-up (codegen + streaming machinery) so batch-0
    # walls don't carry JVM warm-up and fake a downward slope
    run("_warm", comp, False, 3)
    shutil.rmtree(out / "run__warm", ignore_errors=True)
    for tag, layout, compact in picked:
        run(tag, layout, compact, n_batches)


if __name__ == "__main__":
    main()
