"""Round-16 hardening of the streaming-screen index maintenance
(VERDICT r15 item 2 + ADVICE r15):

* ``maybe_compact`` — the cadence hook deciding WHEN
  ``compact_screen_index`` pays (committed-delta count / bytes /
  geometric size-ratio), closing the round's one ``weak``.
* compaction finish order — only the colliding source partition is
  deleted before the rename; everything after the rename leaves
  visible DUPLICATES (tolerated), never invisible committed rows,
  and the one remaining invisible window makes a restarted stream
  FAIL LOUD (``_index_exists`` raises on a completed ``_compact``
  staging tree) instead of silently screening against partial
  history (ADVICE r15 medium).
* ``_geometry.json`` sidecar — the Hamming screen's banding
  parameterization is persisted with the index and compared on every
  restart (its drift is invisible in the stored values, ADVICE r15
  low); all four screens now carry the sidecar.
* first-batch deep drift probes — the neardup/embedding validators
  probe EVERY distinct signature width / bucket shape on the first
  micro-batch of a run, so a mixed-width index (old deployment's
  partitions alongside current ones) is caught deterministically
  instead of probabilistically (ADVICE r15 low).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

NOTHING = -(2 ** 31)


def _digest_partition(spark, idx, batch_id: int, texts: list[str]):
    spark.createDataFrame(
        [(t,) for t in texts], "text string"
    ).select(F.md5("text").alias("digest")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(idx / f"batch_id={batch_id}"))


# ------------------------------------------------------ maybe_compact
@pytest.mark.slow
def test_maybe_compact_count_threshold(spark, tmp_path):
    from gem_data_wrangle_spark.streaming import maybe_compact

    idx = tmp_path / "index"
    for b, texts in enumerate([["a", "b"], ["c"], ["d"], ["e"]]):
        _digest_partition(spark, idx, b, texts)
    before = sorted(
        r["digest"] for r in spark.read.parquet(str(idx)).collect()
    )

    # 3 committed partitions (newest excluded) < threshold 10: no-op,
    # layout untouched
    assert maybe_compact(
        spark, str(idx), "digest", min_delta_partitions=10
    ) == NOTHING
    vis = sorted(
        int(p.name.split("=")[1])
        for p in idx.iterdir() if p.name.startswith("batch_id=")
    )
    assert vis == [0, 1, 2, 3]

    # threshold reached: compacts all committed partitions into the
    # stamp, newest stays, no rows lost
    assert maybe_compact(
        spark, str(idx), "digest", min_delta_partitions=3
    ) == 2
    vis = sorted(
        int(p.name.split("=")[1])
        for p in idx.iterdir() if p.name.startswith("batch_id=")
    )
    assert vis == [2, 3]
    after = sorted(
        r["digest"] for r in spark.read.parquet(str(idx)).collect()
    )
    assert after == before

    # missing dir: no-op, not an error
    assert maybe_compact(
        spark, str(tmp_path / "nope"), "digest"
    ) == NOTHING


@pytest.mark.slow
def test_maybe_compact_size_ratio_geometric(spark, tmp_path):
    """The LSM-style cadence: deltas must reach ``size_ratio`` x the
    compacted base before a rewrite pays — tiny deltas on a big base
    never trigger (that rewrite would be O(history) for nothing),
    while delta bytes comparable to the base do."""
    from gem_data_wrangle_spark.streaming import maybe_compact

    idx = tmp_path / "index"
    _digest_partition(spark, idx, 0, [f"doc{i}" for i in range(500)])
    _digest_partition(spark, idx, 1, ["a"])
    _digest_partition(spark, idx, 2, ["b"])

    # one tiny committed delta vs the 500-digest base: far below
    # ratio 0.5 (count backstop disabled via a high threshold)
    assert maybe_compact(
        spark, str(idx), "digest",
        min_delta_partitions=100, size_ratio=0.5,
    ) == NOTHING

    # grow deltas to base-comparable bytes: triggers
    _digest_partition(spark, idx, 3, [f"x{i}" for i in range(500)])
    _digest_partition(spark, idx, 4, ["tail"])  # newest, uncommitted
    assert maybe_compact(
        spark, str(idx), "digest",
        min_delta_partitions=100, size_ratio=0.5,
    ) == 3
    vis = sorted(
        int(p.name.split("=")[1])
        for p in idx.iterdir() if p.name.startswith("batch_id=")
    )
    assert vis == [3, 4]
    assert spark.read.parquet(str(idx)).count() == 1003


@pytest.mark.slow
def test_maybe_compact_bytes_threshold(spark, tmp_path):
    from gem_data_wrangle_spark.streaming import maybe_compact

    idx = tmp_path / "index"
    for b in range(3):
        _digest_partition(spark, idx, b, [f"d{b}"])
    # bytes threshold far above two tiny parquet deltas: no-op
    assert maybe_compact(
        spark, str(idx), "digest",
        min_delta_partitions=100, min_delta_bytes=10 ** 9,
    ) == NOTHING
    # one byte: any committed delta triggers
    assert maybe_compact(
        spark, str(idx), "digest",
        min_delta_partitions=100, min_delta_bytes=1,
    ) == 1


# ------------------------------------- crash window: fail loud + repair
def _stage_completed_compact(spark, idx, stamp: int):
    """Reproduce the ADVICE r15 crash window: a clustered copy staged
    with _SUCCESS, the colliding source partition already deleted —
    the committed rows exist ONLY under the underscore-hidden tree."""
    import shutil

    spark.read.parquet(str(idx / f"batch_id={stamp}")).coalesce(
        1
    ).sortWithinPartitions("digest").write.mode("overwrite").parquet(
        str(idx / "_compact" / f"batch_id={stamp}")
    )
    shutil.rmtree(idx / f"batch_id={stamp}")


@pytest.mark.slow
def test_restarted_stream_fails_loud_on_unfinished_compaction(
    spark, tmp_path
):
    """The residual invisible window (colliding source deleted, staged
    copy not yet renamed): a restarted stream must FAIL the batch, not
    silently screen against partial history and permanently pass
    duplicates (ADVICE r15 medium)."""
    from gem_data_wrangle_spark.streaming import (
        maybe_compact,
        stream_dedup_screen,
    )
    from gem_data_wrangle_spark.streaming.screening import _index_exists

    schema = "doc_id bigint, text string"
    src = str(tmp_path / "src")
    idx = tmp_path / "index"
    spark.createDataFrame([(1, "a"), (2, "b")], schema).coalesce(
        1
    ).write.mode("append").parquet(src)
    q = stream_dedup_screen(
        spark.readStream.schema(schema).parquet(src),
        str(idx), str(tmp_path / "fresh"), str(tmp_path / "ckpt"),
        "text", "doc_id",
    )
    q.awaitTermination(120)

    _stage_completed_compact(spark, idx, 0)
    with pytest.raises(Exception, match="unfinished compaction"):
        _index_exists(spark, str(idx))

    # second snapshot against the partial index: the batch fails loud
    spark.createDataFrame([(3, "a")], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = stream_dedup_screen(
        spark.readStream.schema(schema).parquet(src),
        str(idx), str(tmp_path / "fresh"), str(tmp_path / "ckpt"),
        "text", "doc_id",
    )
    try:
        q.awaitTermination(120)
        exc = q.exception()
    except Exception as e:  # noqa: BLE001 — either surface is fine
        exc = e
    assert exc is not None and "unfinished compaction" in str(exc)

    # repair runs REGARDLESS of thresholds and restores visibility
    # (only one partition remains afterwards, so no NEW compaction
    # follows — the sentinel return; the repair is the side effect),
    # and the replayed batch then screens correctly (doc 3 dups
    # batch 0)
    maybe_compact(
        spark, str(idx), "digest",
        min_delta_partitions=10 ** 6, min_delta_bytes=10 ** 15,
    )
    assert _index_exists(spark, str(idx))
    assert sorted(
        int(p.name.split("=")[1])
        for p in idx.iterdir() if p.name.startswith("batch_id=")
    ) == [0]
    q = stream_dedup_screen(
        spark.readStream.schema(schema).parquet(src),
        str(idx), str(tmp_path / "fresh"), str(tmp_path / "ckpt"),
        "text", "doc_id",
    )
    q.awaitTermination(120)
    fresh = spark.read.parquet(str(tmp_path / "fresh"))
    assert sorted(r["doc_id"] for r in fresh.collect()) == [1, 2]


@pytest.mark.slow
def test_finish_order_duplicates_then_dedup(spark, tmp_path):
    """Crash AFTER the rename but before the old-source deletes leaves
    visible duplicates — the tolerated side of the window. The screens
    must still drop against them, and the next compaction's
    ``dropDuplicates`` keeps them from compounding."""
    from gem_data_wrangle_spark.streaming import (
        compact_screen_index,
        stream_dedup_screen,
    )

    idx = tmp_path / "index"
    # prebuilt history sits at NEGATIVE batch_ids so the stream's own
    # batch 0 sees it through the strictly-older replay guard (same
    # layout trick as tools/scale_stream.py). batch_id=-2 is a
    # compacted partition covering batches -3..-2; the pre-crash
    # source batch_id=-3 still sits beside it (duplicates)
    _digest_partition(spark, idx, -3, ["a", "b"])
    _digest_partition(spark, idx, -2, ["a", "b", "c"])
    _digest_partition(spark, idx, -1, ["d"])

    schema = "doc_id bigint, text string"
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(10, "a"), (11, "c"), (12, "e")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    q = stream_dedup_screen(
        spark.readStream.schema(schema).parquet(src),
        str(idx), str(tmp_path / "fresh"), str(tmp_path / "ckpt"),
        "text", "doc_id",
    )
    q.awaitTermination(120)
    fresh = spark.read.parquet(str(tmp_path / "fresh"))
    assert sorted(r["doc_id"] for r in fresh.collect()) == [12]

    # compaction collapses the leftover duplicates: exactly one row
    # per distinct digest in the compacted partition (a,b,c,d)
    stamp = compact_screen_index(spark, str(idx), "digest")
    assert stamp == -1
    compacted = spark.read.parquet(str(idx / f"batch_id={stamp}"))
    assert compacted.count() == 4
    assert compacted.count() == compacted.distinct().count()
    # and nothing was lost (a,b,c,d + e's delta from the newest batch
    # stay visible overall)
    assert spark.read.parquet(str(idx)).select(
        "digest"
    ).distinct().count() == 5


# ------------------------------------------------- geometry sidecar
@pytest.mark.slow
def test_hamming_geometry_sidecar_drift_fails_loud(spark, tmp_path):
    """The Hamming screen's banding drift is invisible in the stored
    values (plain-integer chunks, variable band widths), so the
    parameterization is persisted as ``_geometry.json`` and compared
    on restart (ADVICE r15): same params restart fine, a drifted
    ``max_distance`` fails the batch loud."""
    from gem_data_wrangle_spark.streaming import stream_hamming_screen

    schema = "img_id bigint, c0 bigint, c1 bigint"
    src = str(tmp_path / "src")
    idx = str(tmp_path / "index")
    fresh_dir = str(tmp_path / "fresh")

    def run(max_distance: int):
        q = stream_hamming_screen(
            spark.readStream.schema(schema).parquet(src),
            idx, fresh_dir, str(tmp_path / "ckpt"),
            "img_id", ["c0", "c1"], max_distance=max_distance,
        )
        try:
            q.awaitTermination(120)
            return q.exception()
        except Exception as e:  # noqa: BLE001
            return e

    spark.createDataFrame([(1, 5, 9)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    assert run(2) is None
    import json
    import pathlib

    geo = json.loads(
        pathlib.Path(tmp_path / "index" / "_geometry.json").read_text()
    )
    assert geo == {
        "screen": "hamming", "chunk_cols": ["c0", "c1"],
        "chunk_bits": 32, "max_distance": 2,
    }

    # same-parameter restart: screens normally (4 dups within d=2 of
    # (5,9): flip one low bit in each chunk)
    spark.createDataFrame([(2, 4, 8), (3, 1000, 9)], schema).coalesce(
        1
    ).write.mode("append").parquet(src)
    assert run(2) is None
    out = spark.read.parquet(fresh_dir)
    assert sorted(r["img_id"] for r in out.collect()) == [1, 3]

    # drifted banding: fail loud, nothing written
    spark.createDataFrame([(4, 7, 9)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    exc = run(1)
    assert exc is not None and "different parameterization" in str(exc)
    assert sorted(
        r["img_id"] for r in spark.read.parquet(fresh_dir).collect()
    ) == [1, 3]


# ------------------------------------- geometry provisioning helper
def test_provision_embedding_screen():
    """(duty_cos, recall_target, horizon) → (planes, tables), pinning
    the SCALE.md round-15 measured rows (VERDICT r15 item 5)."""
    from gem_data_wrangle_spark.operators.similarity import (
        plane_tables,
        provision_embedding_screen,
    )

    # the production grid row: duty cos≥0.3, 250-vector horizon,
    # Charikar floor 0.886 at 16 tables → (4, 16); measured realized
    # recall at that geometry is 0.975 (the helper's floor is
    # conservative by design — p is evaluated at the threshold)
    assert provision_embedding_screen(
        0.3, 0.88, 250, bucket_pop_target=16
    ) == (4, 16)

    # near-dup duty corner (SCALE.md finding 3): cos≥0.8 at a 65k
    # horizon → 12 planes (population-flat), ~31 tables
    assert provision_embedding_screen(
        0.8, 0.87, 65536, bucket_pop_target=16
    ) == (12, 31)

    # weak duty + deep horizon: the recall budget CAPS the planes
    # below the population-flat count (over-planing cannot be bought
    # back with affordable tables at cos≥0.3 — measured exchange
    # rate 4x16=0.975 vs 9x32=0.535 vs 12x64=0.356)
    planes, tables = provision_embedding_screen(
        0.3, 0.95, 10 ** 9, bucket_pop_target=16
    )
    assert planes == 5 and tables <= 64

    # output plugs straight into plane_tables
    tbls = plane_tables(tables, planes, 8)
    assert len(tbls) == tables and len(tbls[0]) == planes

    # Charikar floor really is a floor at the returned geometry
    import math

    p = 1 - math.acos(0.3) / math.pi
    assert 1 - (1 - p ** 4) ** 16 >= 0.88

    import pytest as _pytest

    with _pytest.raises(ValueError):
        provision_embedding_screen(1.5, 0.9, 100)
    with _pytest.raises(ValueError):
        provision_embedding_screen(0.3, 1.0, 100)


# ------------------------------------- first-batch deep drift probes
@pytest.mark.slow
def test_neardup_mixed_width_index_fails_first_batch(spark, tmp_path):
    """A mixed-width index (drifted partitions beside matching ones)
    must fail DETERMINISTICALLY on the first batch of a run: the old
    limit-1 probe could sample the matching row and let the drifted
    partitions silently contribute nothing (ADVICE r15)."""
    from gem_data_wrangle_spark.operators.dedup import minhash_signatures
    from gem_data_wrangle_spark.streaming import stream_neardup_screen

    schema = "doc_id bigint, text string"
    docs = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")], schema
    )
    idx = tmp_path / "index"
    # partition -1: matching geometry (width 32*4); -2: drifted (32*2)
    minhash_signatures(
        docs, "text", "doc_id", num_bands=4, rows_per_band=4
    ).coalesce(1).write.parquet(str(idx / "batch_id=-1"))
    minhash_signatures(
        docs, "text", "doc_id", num_bands=4, rows_per_band=2
    ).coalesce(1).write.parquet(str(idx / "batch_id=-2"))
    # sidecar matches the stream's params — only the width probe can
    # catch the foreign partition (e.g. written by a pre-sidecar
    # deployment or a job that overwrote the sidecar)
    (idx / "_geometry.json").write_text(
        '{"ngram": 2, "num_bands": 4, "rows_per_band": 4, '
        '"screen": "neardup"}'
    )

    src = str(tmp_path / "src")
    spark.createDataFrame([(1, "something new")], schema).coalesce(
        1
    ).write.mode("append").parquet(src)
    q = stream_neardup_screen(
        spark.readStream.schema(schema).parquet(src),
        str(idx), str(tmp_path / "fresh"), str(tmp_path / "ckpt"),
        "text", "doc_id", num_bands=4, rows_per_band=4,
    )
    try:
        q.awaitTermination(120)
        exc = q.exception()
    except Exception as e:  # noqa: BLE001
        exc = e
    assert exc is not None and "signature widths" in str(exc)


@pytest.mark.slow
def test_embedding_mixed_geometry_index_fails_first_batch(
    spark, tmp_path
):
    """Embedding sibling of the mixed-width probe: one partition
    bucketed under the stream's planes, one under a different table
    count — the first-batch distinct-shape probe must raise even
    though a limit-1 sample could land on the matching row."""
    from gem_data_wrangle_spark.operators import similarity as V
    from gem_data_wrangle_spark.streaming import stream_embedding_screen

    schema = "vec_id bigint, embedding array<double>"
    vecs = spark.createDataFrame([(100, [1.0, 0.0, 0.0])], schema)
    planes = V.hyperplanes(4, 3)
    idx = tmp_path / "index"
    V.embedding_index_signatures(
        vecs, "embedding", "vec_id", planes
    ).coalesce(1).write.parquet(str(idx / "batch_id=-1"))
    V.embedding_index_signatures(
        vecs, "embedding", "vec_id", V.plane_tables(2, 4, 3)
    ).coalesce(1).write.parquet(str(idx / "batch_id=-2"))
    # match the sidecar to the stream's planes so only the shape
    # probe can fire
    import hashlib
    import json

    tables = V._plane_tables(planes)
    digest = hashlib.sha256(
        json.dumps(
            [[[float(x) for x in p] for p in tbl] for tbl in tables]
        ).encode()
    ).hexdigest()
    (idx / "_geometry.json").write_text(
        json.dumps(
            {"planes_sha256": digest, "screen": "embedding"},
            sort_keys=True,
        )
    )

    src = str(tmp_path / "src")
    spark.createDataFrame([(1, [0.0, 0.0, 1.0])], schema).coalesce(
        1
    ).write.mode("append").parquet(src)
    q = stream_embedding_screen(
        spark.readStream.schema(schema).parquet(src),
        str(idx), str(tmp_path / "fresh"), str(tmp_path / "ckpt"),
        "embedding", "vec_id", planes,
    )
    try:
        q.awaitTermination(120)
        exc = q.exception()
    except Exception as e:  # noqa: BLE001
        exc = e
    assert exc is not None and "different geometry" in str(exc)


# ------------------- provisioning closed-form invariants (property)
def test_provision_recall_floor_and_table_budget_hold_everywhere():
    """Property over the whole input domain: the returned geometry's
    Charikar closed-form recall 1-(1-p^planes)^tables must reach the
    recall target, AND the table count must stay within max_tables —
    i.e. the plane cap really converts the table budget into a plane
    bound, for any (duty, recall, horizon) a caller can pass. Pure
    closed-form math, so hypothesis can sweep it densely."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from gem_data_wrangle_spark.operators.similarity import (
        provision_embedding_screen,
    )

    @settings(max_examples=300, deadline=None)
    @given(
        duty=st.floats(min_value=-0.95, max_value=0.99),
        recall=st.floats(min_value=0.01, max_value=0.999),
        rows=st.integers(min_value=1, max_value=10 ** 12),
        pop=st.integers(min_value=1, max_value=1024),
        max_tables=st.integers(min_value=1, max_value=256),
    )
    def prop(duty, recall, rows, pop, max_tables):
        p = 1.0 - math.acos(duty) / math.pi
        p_min = 1.0 - (1.0 - recall) ** (1.0 / max_tables)
        try:
            planes, tables = provision_embedding_screen(
                duty, recall, rows,
                bucket_pop_target=pop, max_tables=max_tables,
            )
        except ValueError:
            # must refuse EXACTLY the infeasible region: one plane
            # already below the per-table collision floor
            assert p < p_min
            return
        assert p >= p_min
        assert planes >= 1 and 1 <= tables <= max_tables
        formula = 1.0 - (1.0 - p ** planes) ** tables
        # tables = ceil(...) can only overshoot the target, and the
        # plane cap guarantees the needed table count is affordable
        assert formula >= recall - 1e-9
        # population-flat bound is never exceeded (the cap only ever
        # LOWERS the plane count)
        import math as _m
        planes_pop = max(1, _m.ceil(_m.log2(max(1.0, rows / pop))))
        assert planes <= planes_pop

    prop()


def test_corrupt_geometry_sidecar_fails_with_repair_path(spark, tmp_path):
    """A crash mid-sidecar-write leaves truncated JSON; the screen
    must fail the batch with the repair instruction, not a bare
    JSONDecodeError."""
    from gem_data_wrangle_spark.streaming import stream_dedup_screen

    schema = "doc_id bigint, text string"
    src = str(tmp_path / "src")
    idx = tmp_path / "index"
    idx.mkdir()
    (idx / "_geometry.json").write_text('{"screen": "ded')  # truncated

    spark.createDataFrame([(1, "a")], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = stream_dedup_screen(
        spark.readStream.schema(schema).parquet(src),
        str(idx), str(tmp_path / "fresh"), str(tmp_path / "ckpt"),
        "text", "doc_id",
    )
    try:
        q.awaitTermination(120)
        exc = q.exception()
    except Exception as e:  # noqa: BLE001
        exc = e
    assert exc is not None
    msg = str(exc)
    assert "corrupt _geometry.json" in msg and "delete the sidecar" in msg
