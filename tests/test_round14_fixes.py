"""Round-14 fixes: the materialize= persisted-signature contract on
the *_against_index incremental screens (VERDICT r13 item 4 — the
batch pass / index join fed both returned frames and recomputed per
action, the class the round-9 simhash fix retired), the
embedding-screen validation parity (ADVICE r13: empty planes would
bucket the whole corpus into one '' key), and the pinned rle
astral-text contract (VERDICT r13 item 7)."""

import pytest
from pyspark.sql import functions as F

from gem_data_wrangle_spark.operators import dedup as D
from gem_data_wrangle_spark.operators import similarity as V


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


# ------------------------------------------------------ materialize=
def test_neardup_against_index_materialize_parity(spark):
    """materialize=True (eager checkpoint) and materialize=False (lazy
    plan) return identical frames — the contract only changes how many
    times the batch signature pass evaluates, never its values."""
    hist = spark.createDataFrame(
        [(2, "the quick brown fox jumps over the lazy dog"),
         (4, "shared boilerplate footer text appears here")],
        "doc_id bigint, text string",
    )
    batch = spark.createDataFrame(
        [(3, "the quick brown fox jumps over the lazy dog"),
         (5, "completely unrelated novel content about spark engines"),
         (7, "shared boilerplate footer text appears here")],
        "doc_id bigint, text string",
    )
    index = D.minhash_signatures(hist, "text", "doc_id")
    fresh_l, upd_l = D.neardup_against_index(
        batch, index, "text", "doc_id", materialize=False
    )
    fresh_m, upd_m = D.neardup_against_index(
        batch, index, "text", "doc_id", materialize=True
    )
    assert _rows(fresh_l, "doc_id") == _rows(fresh_m, "doc_id") == [(5,)]
    assert (
        _rows(upd_l, "doc_id", "band", "signature")
        == _rows(upd_m, "doc_id", "band", "signature")
    )
    # acting on BOTH frames twice must be consistent (the recompute
    # class being retired: checkpointed frames cannot drift)
    assert upd_m.count() == upd_m.count() == 12  # 2 idx + 1 survivor, 4 bands


def test_neardup_against_index_bootstrap_materializes(spark):
    batch = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        "doc_id bigint, text string",
    )
    fresh, index = D.neardup_against_index(
        batch, None, "text", "doc_id", materialize=True
    )
    assert fresh.count() == 2
    assert index.count() == 8


def test_hamming_against_index_materialize_parity(spark):
    idx = spark.createDataFrame(
        [(2, 0b1111, 0b0000)], "id bigint, hi bigint, lo bigint"
    )
    batch = spark.createDataFrame(
        [(11, 0b1110, 0b0000),
         (13, 0b1111, 0b0111),
         (15, 0b0000, 0b1111)],
        "id bigint, hi bigint, lo bigint",
    )
    out = {}
    for mat in (False, True):
        fresh, upd = D.hamming_against_index(
            batch, idx, "id", ["hi", "lo"], max_distance=2, materialize=mat
        )
        out[mat] = (_rows(fresh, "id"), _rows(upd, "id", "hi", "lo"))
    assert out[False] == out[True]
    assert out[True][0] == [(13,), (15,)]


def test_embedding_against_index_materialize_parity(spark):
    planes = V.hyperplanes(4, 3)
    idx = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0])], "vec_id bigint, embedding array<double>"
    )
    batch = spark.createDataFrame(
        [(1, [0.99, 0.01, 0.0]),    # same bucket, cosine ~1 -> screened
         (3, [-1.0, 0.0, 0.0]),     # opposite bucket -> survives
         (5, [0.0, 0.0, 0.0])],     # zero norm -> never matches
        "vec_id bigint, embedding array<double>",
    )
    out = {}
    for mat in (False, True):
        fresh, upd = V.embedding_against_index(
            batch, idx, "embedding", "vec_id", planes,
            threshold=0.4, materialize=mat,
        )
        out[mat] = (_rows(fresh, "vec_id"), _rows(upd, "vec_id"))
    assert out[False] == out[True]
    assert out[True][0] == [(3,), (5,)]
    assert out[True][1] == [(0,), (3,), (5,)]


def test_dedup_against_index_materialize_parity(spark):
    day = spark.createDataFrame(
        [(10, "beta"), (11, "gamma"), (12, "gamma")],
        ["doc_id", "text"],
    )
    index = spark.createDataFrame([("beta",)], ["text"]).select(
        F.md5("text").alias("digest")
    )
    out = {}
    for mat in (False, True):
        fresh, upd = D.dedup_against_index(
            day, index, "text", "doc_id", materialize=mat
        )
        out[mat] = (_rows(fresh, "doc_id"), sorted(r.digest for r in upd.collect()))
    assert out[False] == out[True]
    assert out[True][0] == [(11,)]
    assert len(out[True][1]) == 2


# ------------------------------------------- validation parity (ADVICE)
def test_embedding_against_index_rejects_empty_planes(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id bigint, embedding array<double>"
    )
    with pytest.raises(ValueError, match="planes"):
        V.embedding_against_index(emb, emb, "embedding", "vec_id", [])
    # bootstrap path validates too (parity with hamming's packing check)
    with pytest.raises(ValueError, match="planes"):
        V.embedding_against_index(emb, None, "embedding", "vec_id", [])


def test_embedding_against_index_bootstrap_validates_columns(spark):
    bad = spark.createDataFrame([(1, 2.0)], "vec_id bigint, other double")
    planes = V.hyperplanes(4, 2)
    with pytest.raises(ValueError, match="embedding"):
        V.embedding_against_index(bad, None, "embedding", "vec_id", planes)


# ------------------------------------------------- rle astral contract
def test_rle_astral_text_contract(spark):
    """Pin the EMPIRICAL unicode contract of rle_run_signals (VERDICT
    r13 item 7: the docstring's codepoint claims went through two
    wrong drafts before measurement — assert them so a Spark upgrade
    cannot silently drift). Spark's length/split count CODEPOINTS, so
    astral (non-BMP) chars are one unit each, on BOTH engines."""
    from gem_data_wrangle_spark.operators.textops import rle_run_signals

    cases = {1: "\U0001d11ea", 2: "aa\U0001d11e\U0001d11e", 3: "\U0001d11e"}
    expect = {1: (2, 2), 2: (4, 2), 3: (1, 1)}
    df = spark.createDataFrame(
        [(i, t) for i, t in cases.items()], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (r["n_chars"], r["n_runs"])
        for r in rle_run_signals(df, "text", "doc_id").collect()
    }
    assert got == expect

    # the oracle engine agrees codepoint-for-codepoint (the registered
    # rle_compression_bound oracle's exact per-position replay)
    import duckdb

    for i, t in cases.items():
        n_chars, n_runs = duckdb.sql(
            """
            SELECT CAST(length(t) AS BIGINT),
                   CAST(len(list_filter(range(2, length(t) + 1),
                            i -> regexp_split_to_array(t, '')[i]
                                 != regexp_split_to_array(t, '')[i-1]))
                        + 1 AS BIGINT)
            FROM (SELECT ? AS t)
            """,
            params=[t],
        ).fetchone()
        assert (n_chars, n_runs) == expect[i], f"doc {i} oracle divergence"


def test_embedding_against_index_multi_table_or_amplification(spark):
    """planes may be a LIST of plane tables (round 14): a batch id is
    screened iff it collides with a true match in ANY table, so the
    multi-table matched set is exactly the union of the single-table
    matched sets — the OR-amplification recall knob measured in
    tools/embed_recall.py."""
    t0 = V.hyperplanes(4, 3, seed=V._LSH_SEED)
    t1 = V.hyperplanes(4, 3, seed=V._LSH_SEED + 7919)
    idx = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0])],
        "vec_id bigint, embedding array<double>",
    )
    batch = spark.createDataFrame(
        [(1, [0.9, 0.1, 0.0]), (3, [0.1, 0.9, 0.0]), (5, [-1.0, -1.0, 0.0])],
        "vec_id bigint, embedding array<double>",
    )

    def screened(planes):
        fresh, _ = V.embedding_against_index(
            batch, idx, "embedding", "vec_id", planes, threshold=0.4
        )
        batch_ids = {1, 3, 5}
        return batch_ids - {r["vec_id"] for r in fresh.collect()}

    s0, s1, s01 = screened(t0), screened(t1), screened([t0, t1])
    assert s01 == s0 | s1
    # single-table call is unchanged by the multi-table addition
    assert screened([t0]) == s0


@pytest.mark.slow
def test_stream_neardup_screen_matches_batch_replay(spark, tmp_path):
    """foreachBatch composition of neardup_against_index (VERDICT r13
    item 8): three snapshots arrive as three availableNow micro-batches
    with the parquet signature index as cross-batch state; the per-
    batch survivors must equal a sequential replay of the BATCH
    operator over the same snapshots, and the index must hold exactly
    the survivors' signatures."""
    from gem_data_wrangle_spark.streaming import stream_neardup_screen

    src = str(tmp_path / "src")
    index_dir = str(tmp_path / "index")
    fresh_dir = str(tmp_path / "fresh")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id bigint, text string"

    t1 = "the quick brown fox jumps over the lazy dog near the river"
    t2 = "pack my box with five dozen liquor jugs before the auction"
    t3 = "sphinx of black quartz judge my vow said the museum curator"
    t4 = "how vexingly quick daft zebras jump over fences at midnight"
    snapshots = [
        [(1, t1), (2, t2)],                              # bootstrap
        [(3, t1 + " today"), (4, t3)],                   # 3 near-dups 1
        [(5, t3), (6, t2), (7, t4)],                     # 5,6 dup earlier
    ]

    for snap in snapshots:
        spark.createDataFrame(snap, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = stream_neardup_screen(
            spark.readStream.schema(schema).parquet(src),
            index_dir, fresh_dir, ckpt, "text", "doc_id",
        )
        q.awaitTermination(120)

    got = {
        (r["batch_id"], r["doc_id"])
        for r in spark.read.parquet(fresh_dir).collect()
    }

    # sequential replay through the batch operator
    expect, index = set(), None
    for bid, snap in enumerate(snapshots):
        fresh, index = D.neardup_against_index(
            spark.createDataFrame(snap, schema), index, "text", "doc_id"
        )
        expect |= {(bid, r["doc_id"]) for r in fresh.collect()}
    assert got == expect

    # index holds exactly the survivors' signatures (num_bands=4 each)
    idx = spark.read.parquet(index_dir)
    survivors = {d for _, d in got}
    assert {r["doc_id"] for r in idx.collect()} == survivors
    assert idx.count() == 4 * len(survivors)
    # replay of the batch operator leaves the same signature set
    assert _rows(idx, "doc_id", "band", "signature") == _rows(
        index, "doc_id", "band", "signature"
    )


@pytest.mark.slow
def test_embedding_against_index_signature_index_parity(spark):
    """Persisted-signature index path (round 14, asymmetric-curve
    finding): screening against embedding_index_signatures(raw) must
    produce the SAME fresh set as screening against the raw index, and
    updated_index must stay in signature shape, equal to re-deriving
    signatures from the raw path's updated index — so the loop
    composes snapshot-over-snapshot without re-bucketing history."""
    for planes in (
        V.hyperplanes(4, 3),
        [V.hyperplanes(4, 3, seed=V._LSH_SEED),
         V.hyperplanes(4, 3, seed=V._LSH_SEED + 7919)],
    ):
        idx_raw = spark.createDataFrame(
            [(0, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0])],
            "vec_id bigint, embedding array<double>",
        )
        batch = spark.createDataFrame(
            [(1, [0.99, 0.01, 0.0]), (3, [-1.0, -1.0, 0.0]),
             (5, [0.0, 0.0, 0.0])],
            "vec_id bigint, embedding array<double>",
        )
        fresh_raw, upd_raw = V.embedding_against_index(
            batch, idx_raw, "embedding", "vec_id", planes, threshold=0.4
        )
        idx_sig = V.embedding_index_signatures(
            idx_raw, "embedding", "vec_id", planes
        )
        fresh_sig, upd_sig = V.embedding_against_index(
            batch, idx_sig, "embedding", "vec_id", planes, threshold=0.4
        )
        assert _rows(fresh_sig, "vec_id") == _rows(fresh_raw, "vec_id")
        assert set(upd_sig.columns) == {"vec_id", "embedding", "norm", "bucket"}
        assert _rows(upd_sig, "vec_id", "norm", "bucket") == _rows(
            V.embedding_index_signatures(upd_raw, "embedding", "vec_id", planes),
            "vec_id", "norm", "bucket",
        )
        # second snapshot through the signature-shaped updated index
        batch2 = spark.createDataFrame(
            [(7, [0.98, 0.02, 0.0]), (9, [0.0, 0.0, 1.0])],
            "vec_id bigint, embedding array<double>",
        )
        fresh2_sig, _ = V.embedding_against_index(
            batch2, upd_sig, "embedding", "vec_id", planes, threshold=0.4
        )
        fresh2_raw, _ = V.embedding_against_index(
            batch2, upd_raw, "embedding", "vec_id", planes, threshold=0.4
        )
        assert _rows(fresh2_sig, "vec_id") == _rows(fresh2_raw, "vec_id")


def test_stream_neardup_screen_crash_replay_idempotent(spark, tmp_path):
    """Crash-replay semantics: a failure BETWEEN the index write and
    the checkpoint commit replays the batch with its own signatures
    already persisted under batch_id=N. The screen must read state
    strictly OLDER than the current batch — otherwise every surviving
    doc matches itself by content and the replay overwrites both
    partitions empty (silent data loss). Simulated exactly: run one
    batch, delete commits/0 from the checkpoint (the write happened,
    the commit did not), restart, and require the final state to be
    byte-identical to the pre-crash state."""
    import shutil

    from gem_data_wrangle_spark.streaming import stream_neardup_screen

    src = str(tmp_path / "src")
    index_dir = str(tmp_path / "index")
    fresh_dir = str(tmp_path / "fresh")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id bigint, text string"
    spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog by the river"),
         (2, "pack my box with five dozen liquor jugs before the auction")],
        schema,
    ).coalesce(1).write.mode("overwrite").parquet(src)

    def run():
        q = stream_neardup_screen(
            spark.readStream.schema(schema).parquet(src),
            index_dir, fresh_dir, ckpt, "text", "doc_id",
        )
        q.awaitTermination(120)

    run()
    before_fresh = _rows(spark.read.parquet(fresh_dir), "batch_id", "doc_id")
    before_index = _rows(
        spark.read.parquet(index_dir), "doc_id", "band", "signature"
    )
    assert {d for _, d in before_fresh} == {1, 2}

    # crash window: index written, commit marker lost -> replay batch 0
    import glob

    files_before = set(glob.glob(fresh_dir + "/batch_id=0/part-*"))
    shutil.rmtree(str(tmp_path / "ckpt" / "commits"))
    run()
    # the replay really re-executed: dynamic overwrite rewrote the
    # partition with fresh part files (same rows, new file identities)
    assert set(glob.glob(fresh_dir + "/batch_id=0/part-*")) != files_before
    assert _rows(
        spark.read.parquet(fresh_dir), "batch_id", "doc_id"
    ) == before_fresh
    assert _rows(
        spark.read.parquet(index_dir), "doc_id", "band", "signature"
    ) == before_index


@pytest.mark.slow
def test_stream_dedup_screen_matches_batch_replay(spark, tmp_path):
    """Digest sibling of the streaming near-dup screen: per-batch
    survivors must equal a sequential replay of dedup_against_index,
    within-batch exact dups must collapse to the lowest id, and the
    index must hold exactly one digest per distinct surviving text."""
    from gem_data_wrangle_spark.streaming import stream_dedup_screen

    src = str(tmp_path / "src")
    index_dir = str(tmp_path / "index")
    fresh_dir = str(tmp_path / "fresh")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id bigint, text string"
    snapshots = [
        [(1, "alpha"), (2, "beta"), (3, "alpha")],   # 3 = in-batch dup
        [(4, "beta"), (5, "gamma")],                 # 4 = dup of batch 0
        [(6, "gamma"), (7, "delta"), (8, "delta")],  # 6 dup, 8 in-batch
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
    expect, index = set(), None
    for bid, snap in enumerate(snapshots):
        fresh, index = D.dedup_against_index(
            spark.createDataFrame(snap, schema), index, "text", "doc_id"
        )
        expect |= {(bid, r["doc_id"]) for r in fresh.collect()}
    assert got == expect == {(0, 1), (0, 2), (1, 5), (2, 7)}
    idx = spark.read.parquet(index_dir)
    assert sorted(r["digest"] for r in idx.collect()) == sorted(
        r["digest"] for r in index.collect()
    )
    assert idx.count() == 4  # one digest per distinct surviving text


@pytest.mark.slow
def test_stream_embedding_screen_matches_batch_replay(spark, tmp_path):
    """Embedding member of the streaming-screen family: survivors per
    micro-batch must equal a sequential embedding_against_index replay,
    and the state table must be the persisted-signature shape (one
    (id, vec, norm, bucket) row per survivor) so later batches never
    re-bucket history."""
    from gem_data_wrangle_spark.streaming import stream_embedding_screen

    planes = V.hyperplanes(4, 3)
    src = str(tmp_path / "src")
    index_dir = str(tmp_path / "index")
    fresh_dir = str(tmp_path / "fresh")
    ckpt = str(tmp_path / "ckpt")
    schema = "vec_id bigint, embedding array<double>"
    snapshots = [
        [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0])],
        [(3, [0.99, 0.01, 0.0]), (4, [0.0, 0.0, 1.0])],   # 3 ~ dup of 1
        [(5, [0.0, 0.0, 0.98]), (6, [-1.0, -1.0, -1.0])],  # 5 ~ dup of 4
    ]
    for snap in snapshots:
        spark.createDataFrame(snap, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = stream_embedding_screen(
            spark.readStream.schema(schema).parquet(src),
            index_dir, fresh_dir, ckpt, "embedding", "vec_id", planes,
            threshold=0.4,
        )
        q.awaitTermination(120)

    got = {
        (r["batch_id"], r["vec_id"])
        for r in spark.read.parquet(fresh_dir).collect()
    }
    expect, index = set(), None
    for bid, snap in enumerate(snapshots):
        fresh, _upd = V.embedding_against_index(
            spark.createDataFrame(snap, schema),
            index, "embedding", "vec_id", planes, threshold=0.4,
        )
        expect |= {(bid, r["vec_id"]) for r in fresh.collect()}
        # replay keeps its own signature-shaped running index, exactly
        # like the stream's state table
        base = index if index is not None else spark.createDataFrame(
            [], "vec_id bigint, embedding array<double>, "
                "norm double, bucket string"
        )
        index = base.unionByName(
            V.embedding_index_signatures(fresh, "embedding", "vec_id", planes)
        )
    assert got == expect
    idx = spark.read.parquet(index_dir)
    assert {"vec_id", "embedding", "norm", "bucket", "batch_id"} <= set(idx.columns)
    assert _rows(idx, "vec_id", "norm", "bucket") == _rows(
        index, "vec_id", "norm", "bucket"
    )
