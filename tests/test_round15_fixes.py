"""Round-15 production hardening of the streaming screens (VERDICT
r14 items 1-3 / ADVICE r14 high): the index-existence probe goes
through the Hadoop FileSystem API (a driver-local ``os.path.isdir``
returned False forever on any non-local scheme and silently disabled
screening), the per-micro-batch index read is join-key-pruned
(isin pushdown with a broadcast LEFT SEMI fallback) instead of an
O(history) scan+shuffle, and the packed-Hamming screen completes the
four-member streaming family with the same batch-parity and
crash-replay contracts as its siblings."""

import pytest

import glob
import shutil

from pyspark.sql import functions as F

from gem_data_wrangle_spark.operators import dedup as D


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


# ------------------------------------------------- Hadoop FS probing
@pytest.mark.slow
def test_stream_screen_probes_non_local_scheme(spark, tmp_path):
    """The index probe must work for ANY Hadoop-readable scheme, not
    just local paths: mount a ``viewfs://`` table (Hadoop's built-in
    client-side federation FS — a real non-``file:`` scheme whose
    paths ``os.path`` can never resolve) over the test directory and
    run the digest screen end-to-end through it. Under the former
    os.path.isdir probe the scheme-prefixed index_dir is never a
    local directory name, so screening was silently DISABLED: the
    cross-batch duplicate below would pass as fresh and this test
    fails. Covers both the bootstrap branch (batch 0: missing dir →
    no screening) and the existing-index branch (batch 1: duplicate
    dropped)."""
    from gem_data_wrangle_spark.streaming import stream_dedup_screen

    spark.sparkContext._jsc.hadoopConfiguration().set(
        "fs.viewfs.mounttable.r15screen.link./data",
        tmp_path.as_uri(),
    )
    src = str(tmp_path / "src")
    index_dir = "viewfs://r15screen/data/index"
    fresh_dir = "viewfs://r15screen/data/fresh"
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id bigint, text string"

    snapshots = [
        [(1, "alpha"), (2, "beta")],
        [(3, "alpha"), (4, "gamma")],  # 3 duplicates batch 0's text
    ]
    for snap in snapshots:
        spark.createDataFrame(snap, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = stream_dedup_screen(
            spark.readStream.schema(schema).parquet(src),
            index_dir, fresh_dir, ckpt, "text", "doc_id",
        )
        q.awaitTermination(120)

    got = {
        (r["batch_id"], r["doc_id"])
        for r in spark.read.parquet(fresh_dir).collect()
    }
    # doc 3 screened against history THROUGH the non-local scheme
    assert got == {(0, 1), (0, 2), (1, 4)}
    # and the index (also scheme-prefixed) holds exactly the
    # survivors' digests
    assert spark.read.parquet(index_dir).count() == 3


def test_index_exists_missing_and_empty_non_local(spark, tmp_path):
    """Bootstrap contract through the Hadoop API: a missing dir and
    an empty dir (or one holding only hidden entries) both report
    'no index' — and do so for a scheme-prefixed path too."""
    from gem_data_wrangle_spark.streaming.screening import _index_exists

    spark.sparkContext._jsc.hadoopConfiguration().set(
        "fs.viewfs.mounttable.r15probe.link./data",
        tmp_path.as_uri(),
    )
    assert not _index_exists(spark, str(tmp_path / "nope"))
    assert not _index_exists(spark, "viewfs://r15probe/data/nope")
    empty = tmp_path / "empty"
    empty.mkdir()
    (empty / "_SUCCESS").touch()
    (empty / ".hidden").touch()
    assert not _index_exists(spark, str(empty))
    assert not _index_exists(spark, "viewfs://r15probe/data/empty")
    (empty / "part-00000.parquet").touch()
    assert _index_exists(spark, str(empty))
    assert _index_exists(spark, "viewfs://r15probe/data/empty")


# ------------------------------------------- join-key prune fallback
@pytest.mark.slow
def test_stream_screen_key_prune_fallback_parity(spark, tmp_path):
    """max_isin_keys=0 forces every batch down the broadcast LEFT
    SEMI prune path (the large-key-set fallback); the screened output
    must be identical to the isin path and to a sequential batch
    replay — the prune is a lossless optimization, never a semantics
    knob."""
    from gem_data_wrangle_spark.streaming import stream_dedup_screen

    schema = "doc_id bigint, text string"
    snapshots = [
        [(1, "t-a"), (2, "t-b"), (3, "t-c")],
        [(4, "t-b"), (5, "t-d")],          # 4 dups batch 0
        [(6, "t-d"), (7, "t-a"), (8, "t-e")],  # 6,7 dup earlier
    ]

    results = {}
    for mode, cap in (("isin", 10_000), ("fallback", 0)):
        src = str(tmp_path / mode / "src")
        index_dir = str(tmp_path / mode / "index")
        fresh_dir = str(tmp_path / mode / "fresh")
        ckpt = str(tmp_path / mode / "ckpt")
        for snap in snapshots:
            spark.createDataFrame(snap, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            q = stream_dedup_screen(
                spark.readStream.schema(schema).parquet(src),
                index_dir, fresh_dir, ckpt, "text", "doc_id",
                max_isin_keys=cap,
            )
            q.awaitTermination(120)
        results[mode] = {
            (r["batch_id"], r["doc_id"])
            for r in spark.read.parquet(fresh_dir).collect()
        }

    # sequential replay through the batch operator
    expect, index = set(), None
    for bid, snap in enumerate(snapshots):
        fresh, index = D.dedup_against_index(
            spark.createDataFrame(snap, schema), index, "text", "doc_id"
        )
        expect |= {(bid, r["doc_id"]) for r in fresh.collect()}

    assert results["isin"] == expect
    assert results["fallback"] == expect


# --------------------------------------------- packed-Hamming member
def _sig_snapshots():
    """Packed 2x32-bit signatures: batch-1 carries one row within
    Hamming distance 2 of batch-0 (id 3: one bit flipped from id 1)
    and one far row; batch-2 repeats a batch-0 signature exactly and
    adds a far row."""
    return [
        [(1, 0x0F0F0F0F, 0x33333333), (2, 0x55555555, 0x00FF00FF)],
        [(3, 0x0F0F0F0E, 0x33333333),   # dist 1 from id 1 -> screened
         (4, 0x7777AAAA, 0x11112222)],
        [(5, 0x55555555, 0x00FF00FF),   # dist 0 from id 2 -> screened
         (6, 0x12345678, 0x0BADF00D)],
    ]


@pytest.mark.slow
def test_stream_hamming_screen_matches_batch_replay(spark, tmp_path):
    """foreachBatch composition of hamming_against_index (VERDICT r14
    item 3): three signature snapshots arrive as three availableNow
    micro-batches with the banded parquet index as cross-batch state;
    the per-batch survivors must equal a sequential replay of the
    BATCH operator, and the index must hold exactly the survivors'
    banded rows (bands_per_sig rows per survivor, carrying the full
    chunks for the exact verify)."""
    from gem_data_wrangle_spark.streaming import stream_hamming_screen

    src = str(tmp_path / "src")
    index_dir = str(tmp_path / "index")
    fresh_dir = str(tmp_path / "fresh")
    ckpt = str(tmp_path / "ckpt")
    schema = "id bigint, hash_hi bigint, hash_lo bigint"
    snapshots = _sig_snapshots()

    for snap in snapshots:
        spark.createDataFrame(snap, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = stream_hamming_screen(
            spark.readStream.schema(schema).parquet(src),
            index_dir, fresh_dir, ckpt, "id", ["hash_hi", "hash_lo"],
            max_distance=2,
        )
        q.awaitTermination(120)

    got = {
        (r["batch_id"], r["id"])
        for r in spark.read.parquet(fresh_dir).collect()
    }

    expect, index = set(), None
    for bid, snap in enumerate(snapshots):
        fresh, index = D.hamming_against_index(
            spark.createDataFrame(snap, schema), index,
            "id", ["hash_hi", "hash_lo"], max_distance=2,
        )
        expect |= {(bid, r["id"]) for r in fresh.collect()}
    assert got == expect
    assert {d for _, d in got} == {1, 2, 4, 6}

    # index: bands_per_sig banded rows per survivor, full chunks along
    idx = spark.read.parquet(index_dir)
    survivors = {d for _, d in got}
    assert {r["id"] for r in idx.collect()} == survivors
    bands_per_sig = idx.select("band_idx").distinct().count()
    assert idx.count() == bands_per_sig * len(survivors)
    # collapsing the banded rows reproduces the batch replay's index
    assert _rows(
        idx.select("id", "hash_hi", "hash_lo").dropDuplicates(["id"]),
        "id", "hash_hi", "hash_lo",
    ) == _rows(index, "id", "hash_hi", "hash_lo")


def test_stream_hamming_screen_crash_replay_idempotent(spark, tmp_path):
    """Crash-replay semantics for the Hamming member, simulated
    exactly as for its siblings: run one batch, delete commits/0 (the
    index write happened, the checkpoint commit did not), restart, and
    require the final state to be byte-identical — without the
    strictly-older replay guard every survivor would Hamming-match
    itself (distance 0) and the replay would overwrite both
    partitions empty."""
    from gem_data_wrangle_spark.streaming import stream_hamming_screen

    src = str(tmp_path / "src")
    index_dir = str(tmp_path / "index")
    fresh_dir = str(tmp_path / "fresh")
    ckpt = str(tmp_path / "ckpt")
    schema = "id bigint, hash_hi bigint, hash_lo bigint"
    spark.createDataFrame(
        _sig_snapshots()[0], schema
    ).coalesce(1).write.mode("overwrite").parquet(src)

    def run():
        q = stream_hamming_screen(
            spark.readStream.schema(schema).parquet(src),
            index_dir, fresh_dir, ckpt, "id", ["hash_hi", "hash_lo"],
            max_distance=2,
        )
        q.awaitTermination(120)

    run()
    before_fresh = _rows(spark.read.parquet(fresh_dir), "batch_id", "id")
    before_index = _rows(
        spark.read.parquet(index_dir),
        "id", "hash_hi", "hash_lo", "band_idx", "band_value",
    )
    assert {d for _, d in before_fresh} == {1, 2}

    files_before = set(glob.glob(fresh_dir + "/batch_id=0/part-*"))
    shutil.rmtree(str(tmp_path / "ckpt" / "commits"))
    run()
    # the replay really re-executed (fresh part-file identities)
    assert set(glob.glob(fresh_dir + "/batch_id=0/part-*")) != files_before
    assert _rows(
        spark.read.parquet(fresh_dir), "batch_id", "id"
    ) == before_fresh
    assert _rows(
        spark.read.parquet(index_dir),
        "id", "hash_hi", "hash_lo", "band_idx", "band_value",
    ) == before_index


def test_index_delta_written_sorted_by_join_key(spark, tmp_path):
    """The index delta lands sorted by the screen's join key so the
    pushed isin predicate can prune parquet row groups against tight
    min/max stats — read a written digest partition back file-by-file
    and assert the physical row order is the key order."""
    from gem_data_wrangle_spark.streaming import stream_dedup_screen

    src = str(tmp_path / "src")
    index_dir = str(tmp_path / "index")
    schema = "doc_id bigint, text string"
    rows = [(i, f"text-{i * 37 % 101}") for i in range(101)]
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)
    q = stream_dedup_screen(
        spark.readStream.schema(schema).parquet(src),
        index_dir, str(tmp_path / "fresh"), str(tmp_path / "ckpt"),
        "text", "doc_id",
    )
    q.awaitTermination(120)

    for f in glob.glob(index_dir + "/batch_id=0/part-*.parquet"):
        got = [r["digest"] for r in spark.read.parquet(f).collect()]
        assert got == sorted(got)
        assert got  # non-empty: the assertion above actually bites


# ------------------------------ plane_tables + geometry validation
def test_plane_tables_helper():
    from gem_data_wrangle_spark.operators import similarity as V

    tables = V.plane_tables(3, 4, 8)
    assert len(tables) == 3
    assert all(len(t) == 4 and len(t[0]) == 8 for t in tables)
    # independently seeded: no duplicate tables (identical tables
    # OR-amplify to nothing)
    flat = [tuple(map(tuple, t)) for t in tables]
    assert len(set(flat)) == 3
    # documented stride convention: table t == hyperplanes(seed+7919t)
    assert tables[2] == V.hyperplanes(4, 8, seed=V._LSH_SEED + 7919 * 2)
    # num_tables=1 is the nested single-table form the screens accept
    assert V.plane_tables(1, 4, 8) == [V.hyperplanes(4, 8)]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        V.plane_tables(0, 4, 8)


def test_embedding_sig_index_geometry_mismatch_raises(spark):
    """ADVICE r14: the persisted-signature index is detected by
    column names alone, so buckets built under DIFFERENT planes used
    to silently screen nothing. The per-row shape check must raise on
    (a) a different plane count, (b) a single-table index screened
    with multi-table geometry, and (c) the reverse — while the
    matched geometry still screens normally."""
    import pytest as _pytest

    from gem_data_wrangle_spark.operators import similarity as V

    idx_raw = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0])],
        "vec_id bigint, embedding array<double>",
    )
    batch = spark.createDataFrame(
        [(1, [0.99, 0.01, 0.0])],
        "vec_id bigint, embedding array<double>",
    )
    sig6 = V.embedding_index_signatures(
        idx_raw, "embedding", "vec_id", V.hyperplanes(6, 3)
    )
    sig_multi = V.embedding_index_signatures(
        idx_raw, "embedding", "vec_id", V.plane_tables(2, 5, 3)
    )

    # matched geometry: screens normally (id 1 matches id 0)
    fresh, _ = V.embedding_against_index(
        batch, sig6, "embedding", "vec_id", V.hyperplanes(6, 3),
        threshold=0.4,
    )
    assert [r["vec_id"] for r in fresh.collect()] == []

    for sig, planes in [
        (sig6, V.hyperplanes(4, 3)),            # plane-count drift
        (sig6, V.plane_tables(2, 5, 3)),        # single idx, multi scr
        (sig_multi, V.hyperplanes(6, 3)),       # multi idx, single scr
    ]:
        # materialize=True executes eagerly, so the raise may surface
        # at the call itself; materialize=False defers it to the
        # action — both must raise, never silently screen nothing
        with _pytest.raises(Exception, match="different geometry"):
            fresh, _ = V.embedding_against_index(
                batch, sig, "embedding", "vec_id", planes, threshold=0.4
            )
            fresh.collect()
        with _pytest.raises(Exception, match="different geometry"):
            fresh, _ = V.embedding_against_index(
                batch, sig, "embedding", "vec_id", planes,
                threshold=0.4, materialize=False,
            )
            fresh.collect()


# -------------------------------------------------- index compaction
def _run_digest_batches(spark, base, snapshots, schema):
    from gem_data_wrangle_spark.streaming import stream_dedup_screen

    src = str(base / "src")
    for snap in snapshots:
        spark.createDataFrame(snap, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = stream_dedup_screen(
            spark.readStream.schema(schema).parquet(src),
            str(base / "index"), str(base / "fresh"), str(base / "ckpt"),
            "text", "doc_id",
        )
        q.awaitTermination(120)


@pytest.mark.slow
def test_compact_screen_index_preserves_screen_results(spark, tmp_path):
    """Compacting committed partitions into one key-range-clustered
    partition must not change what the screen drops: run three
    batches, compact, run a fourth; survivors must equal the
    uncompacted replica. Layout contract: only {stamp, newest}
    partitions remain, every compacted file is sorted by the key, and
    file key-ranges are disjoint (the row-group/file pruning the
    per-delta sort cannot deliver)."""
    from gem_data_wrangle_spark.streaming import compact_screen_index

    schema = "doc_id bigint, text string"
    first3 = [
        [(1, "a"), (2, "b")],
        [(3, "a"), (4, "c")],          # 3 dups batch 0
        [(5, "d"), (6, "b")],          # 6 dups batch 0
    ]
    batch4 = [(7, "c"), (8, "d"), (9, "e")]  # 7,8 dup history

    for mode in ("plain", "compacted"):
        base = tmp_path / mode
        _run_digest_batches(spark, base, first3, schema)
        if mode == "compacted":
            stamp = compact_screen_index(
                spark, str(base / "index"), "digest", num_files=2
            )
            assert stamp == 1  # all but the newest partition (2)
            idx = base / "index"
            vis = sorted(
                int(p.name.split("=")[1])
                for p in idx.iterdir()
                if p.name.startswith("batch_id=")
            )
            assert vis == [1, 2]
            assert not (idx / "_compact").exists()
            # clustered: per-file sorted, disjoint key ranges
            ranges = []
            for f in sorted((idx / "batch_id=1").glob("part-*.parquet")):
                vals = [r["digest"]
                        for r in spark.read.parquet(str(f)).collect()]
                if not vals:
                    continue
                assert vals == sorted(vals)
                ranges.append((vals[0], vals[-1]))
            ranges.sort()
            assert len(ranges) >= 2  # num_files=2 really ranged
            for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
                assert hi <= lo
        _run_digest_batches(spark, base, [batch4], schema)

    got = {
        mode: _rows(
            spark.read.parquet(str(tmp_path / mode / "fresh")),
            "batch_id", "doc_id",
        )
        for mode in ("plain", "compacted")
    }
    assert got["plain"] == got["compacted"]
    assert {d for _, d in got["plain"]} == {1, 2, 4, 5, 9}
    # the index holds one digest per unique surviving text either way
    assert (
        sorted(r["digest"] for r in
               spark.read.parquet(str(tmp_path / "compacted" / "index")).collect())
        == sorted(r["digest"] for r in
                  spark.read.parquet(str(tmp_path / "plain" / "index")).collect())
    )


@pytest.mark.slow
def test_compact_screen_index_crash_recovery_and_noop(spark, tmp_path):
    """A crash between the staged clustered copy and the source
    deletion leaves a completed ``_compact/batch_id=C`` tree; the next
    run must FINISH it (delete sources ≤ C, rename) before doing new
    work, and a single-partition index is a no-op."""
    from gem_data_wrangle_spark.streaming import compact_screen_index

    schema = "doc_id bigint, text string"
    base = tmp_path / "s"
    _run_digest_batches(
        spark, base, [[(1, "a"), (2, "b")], [(3, "c")]], schema
    )
    idx = base / "index"
    before = sorted(r["digest"]
                    for r in spark.read.parquet(str(idx)).collect())

    # simulate the crash window: stage the clustered copy of the
    # committed partition (batch_id=0) exactly as the function does,
    # but "crash" before deleting the source
    spark.read.parquet(str(idx / "batch_id=0")).repartitionByRange(
        1, F.col("digest")
    ).sortWithinPartitions("digest").write.mode("overwrite").parquet(
        str(idx / "_compact" / "batch_id=0")
    )

    stamp = compact_screen_index(spark, str(idx), "digest")
    # recovery finished the staged copy, then normal compaction ran
    # over the recovered layout; no hidden tree survives
    assert not (idx / "_compact").exists()
    vis = sorted(
        int(p.name.split("=")[1])
        for p in idx.iterdir() if p.name.startswith("batch_id=")
    )
    assert vis == [0, 1] and stamp == 0
    after = sorted(r["digest"]
                   for r in spark.read.parquet(str(idx)).collect())
    assert after == before

    # no-op guard: nothing strictly below the max partition
    import shutil as _sh

    _sh.rmtree(idx / "batch_id=0")
    assert compact_screen_index(spark, str(idx), "digest") == -(2 ** 31)


@pytest.mark.slow
def test_stream_embedding_screen_drifted_planes_fail_loud(spark, tmp_path):
    """Deployment-shape coverage for the geometry validation: a
    stream restarted with DIFFERENT planes than the ones that built
    the persisted signature index must FAIL the micro-batch (the
    drifted buckets would otherwise equi-match nothing and every
    duplicate would silently pass — the exact failure the batch-level
    check closes, here proven through the foreachBatch path)."""
    from gem_data_wrangle_spark.operators import similarity as V
    from gem_data_wrangle_spark.streaming import stream_embedding_screen

    src = str(tmp_path / "src")
    index_dir = str(tmp_path / "index")
    fresh_dir = str(tmp_path / "fresh")
    schema = "vec_id bigint, embedding array<double>"
    spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0])], schema
    ).coalesce(1).write.mode("append").parquet(src)

    q = stream_embedding_screen(
        spark.readStream.schema(schema).parquet(src),
        index_dir, fresh_dir, str(tmp_path / "ckpt"),
        "embedding", "vec_id", V.hyperplanes(4, 3),
    )
    q.awaitTermination(120)
    assert spark.read.parquet(fresh_dir).count() == 2

    # second snapshot, restarted under DRIFTED geometry (6 planes)
    spark.createDataFrame(
        [(3, [0.99, 0.01, 0.0])], schema
    ).coalesce(1).write.mode("append").parquet(src)
    q = stream_embedding_screen(
        spark.readStream.schema(schema).parquet(src),
        index_dir, fresh_dir, str(tmp_path / "ckpt"),
        "embedding", "vec_id", V.hyperplanes(6, 3),
    )
    try:
        q.awaitTermination(120)
        exc = q.exception()
    except Exception as e:  # noqa: BLE001 — either surface is fine
        exc = e
    assert exc is not None, (
        "micro-batch under drifted planes must fail, not pass "
        "duplicates silently"
    )
    # round 16: the _geometry.json sidecar (planes content hash) now
    # fires BEFORE the bucket-shape probe — it also catches same-shape
    # different-seed drift the value probe can't see
    assert ("different geometry" in str(exc)
            or "different parameterization" in str(exc))
    # the failed batch wrote nothing: survivors remain batch-0's two
    assert spark.read.parquet(fresh_dir).count() == 2


@pytest.mark.slow
def test_stream_neardup_screen_drifted_banding_fails_loud(spark, tmp_path):
    """Same deployment-shape drift guard for the MinHash member: a
    restart under different rows_per_band (signature width drifts)
    must fail the micro-batch via the pre-prune width probe."""
    from gem_data_wrangle_spark.streaming import stream_neardup_screen

    src = str(tmp_path / "src")
    schema = "doc_id bigint, text string"
    spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight")],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    q = stream_neardup_screen(
        spark.readStream.schema(schema).parquet(src),
        str(tmp_path / "index"), str(tmp_path / "fresh"),
        str(tmp_path / "ckpt"), "text", "doc_id", rows_per_band=4,
    )
    q.awaitTermination(120)

    spark.createDataFrame([(2, "a second snapshot doc")], schema)\
        .coalesce(1).write.mode("append").parquet(src)
    q = stream_neardup_screen(
        spark.readStream.schema(schema).parquet(src),
        str(tmp_path / "index"), str(tmp_path / "fresh"),
        str(tmp_path / "ckpt"), "text", "doc_id", rows_per_band=2,
    )
    try:
        q.awaitTermination(120)
        exc = q.exception()
    except Exception as e:  # noqa: BLE001
        exc = e
    # round 16: the _geometry.json sidecar now fires BEFORE the
    # signature-width probe (it also catches width-invisible drift
    # like num_bands/ngram changes)
    assert exc is not None and ("different banding" in str(exc)
                                or "different parameterization"
                                in str(exc))
