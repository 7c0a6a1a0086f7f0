"""Compaction A/B for the BAND-KEYED screen indexes (round 16,
VERDICT r15 item 2): the r15 A/B measured ``compact_screen_index``
only on the digest index; the neardup/hamming indexes are keyed by
band values (``signature`` / ``band_value``) whose per-batch key sets
are what the pruned read pushes down — this harness measures whether
key-range clustering buys the same residual-scan win there.

Protocol: reuse the 100-delta histories the r15 streaming-curve
harness built (run ``tools/scale_stream.py`` first if
``/tmp/stream_asym`` is gone), copy each into two layouts — delta
(as-written, 100 per-batch partitions) and compacted
(``compact_screen_index`` over the copy) — then time one full
availableNow micro-batch per run, INTERLEAVED A,B,A,B,... so JVM
warm-up bias cancels instead of crediting whichever layout runs
last. Each run uses a fresh checkpoint (batch_id=0, replay guard
sees the negative-id history) and deletes its own batch_id=0 delta
afterwards so the history stays fixed.

    python tools/compact_ab_banded.py [asym_dir] [screen ...]
    # defaults: /tmp/stream_asym  neardup hamming
"""

from __future__ import annotations

import json
import shutil
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

from gem_data_wrangle_spark import get_spark  # noqa: E402
from gem_data_wrangle_spark.streaming import (  # noqa: E402
    compact_screen_index,
    stream_hamming_screen,
    stream_neardup_screen,
)

KEYS = {"neardup": "signature", "hamming": "band_value"}
RUNS = 3


def main() -> None:
    asym = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/stream_asym")
    screens = sys.argv[2:] or ["neardup", "hamming"]
    out = Path("/tmp/compact_ab_banded")
    spark = get_spark("compact-ab-banded")

    def start(name: str, index_dir: str, fresh: str, ckpt: str):
        schema = {
            "neardup": "doc_id bigint, text string",
            "hamming": "id bigint, hash_hi bigint, hash_lo bigint",
        }[name]
        stream = spark.readStream.schema(schema).parquet(
            str(asym / f"src_{name}.parquet")
        )
        if name == "neardup":
            return stream_neardup_screen(
                stream, index_dir, fresh, ckpt, "text", "doc_id"
            )
        return stream_hamming_screen(
            stream, index_dir, fresh, ckpt,
            "id", ["hash_hi", "hash_lo"], max_distance=4,
        )

    def run_once(name: str, idx: Path) -> float:
        scratch = out / "scratch"
        shutil.rmtree(scratch, ignore_errors=True)
        shutil.rmtree(idx / "batch_id=0", ignore_errors=True)
        t0 = time.time()
        q = start(
            name, str(idx), str(scratch / "fresh"), str(scratch / "ckpt")
        )
        q.awaitTermination(600)
        wall = round(time.time() - t0, 2)
        shutil.rmtree(scratch, ignore_errors=True)
        shutil.rmtree(idx / "batch_id=0", ignore_errors=True)
        return wall

    for name in screens:
        src = asym / f"idx_{name}_100"
        if not src.exists():
            raise SystemExit(
                f"{src} missing — run tools/scale_stream.py first"
            )
        layouts = {}
        for layout in ("delta", "compacted"):
            tgt = out / f"idx_{name}_{layout}"
            if not tgt.exists():
                shutil.copytree(src, tgt)
                # drop any stale batch_id=0 from a prior harness run
                shutil.rmtree(tgt / "batch_id=0", ignore_errors=True)
                if layout == "compacted":
                    compact_screen_index(spark, str(tgt), KEYS[name])
            layouts[layout] = tgt

        # warm both layouts once (discarded), then interleave
        for layout in layouts.values():
            run_once(name, layout)
        walls: dict[str, list[float]] = {k: [] for k in layouts}
        for _ in range(RUNS):
            for key, layout in layouts.items():
                walls[key].append(run_once(name, layout))
        files = {
            k: sum(1 for _ in p.rglob("part-*.parquet"))
            for k, p in layouts.items()
        }
        rec = {
            "screen": name,
            "walls": walls,
            "median": {
                k: round(statistics.median(v), 2)
                for k, v in walls.items()
            },
            "files": files,
        }
        print(json.dumps(rec))
        (out / f"{name}.json").write_text(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
