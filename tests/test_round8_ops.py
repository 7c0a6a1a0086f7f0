"""Round-8 operators: MP4 sample-table demux + frame extraction."""

import pytest

from gem_data_wrangle_spark.operators.mp4 import (
    build_mp4,
    mp4_frame_samples,
    mp4_sample_offsets,
    mp4_video_sample_table,
    probe_mp4_bytes,
)


def _fixture_buf():
    sizes = [20 + (i % 13) for i in range(23)]
    return sizes, build_mp4(
        64, 48, 2000,
        video_sample_sizes=sizes, samples_per_chunk=5, chunk_gap=4,
        sample_delta=512, sync_every=3,
    )


def test_sample_table_round_trips_builder_layout():
    """Absolute offsets are proven by slicing each sample's payload
    back out of the buffer: builder writes byte (j % 251) repeated
    sizes[j] times, so a correct stco+stsc+stsz reconstruction is the
    only way to land on those spans (chunk gaps break prefix-sum-only
    guesses)."""
    sizes, buf = _fixture_buf()
    tbl = mp4_video_sample_table(buf)
    assert len(tbl) == 23
    for s in tbl:
        j = s["sample_idx"]
        assert s["size"] == sizes[j]
        assert s["dt_ticks"] == 512 * j
        assert s["chunk_idx"] == j // 5
        assert s["is_sync"] == (j % 3 == 0)
        frag = buf[s["file_offset"] : s["file_offset"] + s["size"]]
        assert frag == bytes([j % 251]) * sizes[j]


def test_sample_table_degrades_on_malformed():
    _, buf = _fixture_buf()
    assert mp4_video_sample_table(b"JUNK" * 16) == []
    assert mp4_video_sample_table(buf[: len(buf) // 3]) == []
    # legacy builder (no sample tables) parses but yields no samples;
    # probe still works on both shapes
    legacy = build_mp4(64, 48, 2000)
    assert mp4_video_sample_table(legacy) == []
    assert probe_mp4_bytes(legacy)["probe_status"] == "ok"
    assert probe_mp4_bytes(buf)["probe_status"] == "ok"


def test_sample_table_ragged_and_uniform_chunks():
    b2 = build_mp4(
        32, 32, 1000, video_sample_sizes=[10, 11, 12], samples_per_chunk=8
    )
    t2 = mp4_video_sample_table(b2)
    assert [s["chunk_idx"] for s in t2] == [0, 0, 0]
    assert [s["size"] for s in t2] == [10, 11, 12]
    # no stss box => every sample is sync
    assert all(s["is_sync"] for s in t2)


def test_mp4_sample_offsets_spark(spark):
    import pandas as pd

    sizes, buf = _fixture_buf()
    src = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2], "media": [buf, b"garbage"]}),
    )
    rows = mp4_sample_offsets(src).orderBy("id", "sample_idx").collect()
    assert len(rows) == 23  # junk row contributes nothing
    assert {r["id"] for r in rows} == {1}
    assert rows[7]["size"] == sizes[7] and rows[7]["dt_ticks"] == 512 * 7
    sync = mp4_sample_offsets(src, sync_only=True).collect()
    assert {r["sample_idx"] for r in sync} == set(range(0, 23, 3))


def test_mp4_frame_samples_extracts_real_payloads(spark):
    import pandas as pd

    sizes, buf = _fixture_buf()
    # truncate AFTER the header but inside mdat: samples whose span
    # escapes the shorter buffer must be skipped, not mis-sliced
    cut = buf[: len(buf) - sum(sizes[-4:])]
    src = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2], "media": [buf, cut]})
    )
    out = mp4_frame_samples(src, sync_only=True).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(r)
    assert [r["frame_idx"] for r in sorted(by_id[1], key=lambda r: r["frame_idx"])] == list(range(0, 23, 3))
    for r in by_id[1]:
        j = r["frame_idx"]
        assert bytes(r["frame"]) == bytes([j % 251]) * sizes[j]
        assert r["n_bytes"] == sizes[j]
    assert max(r["frame_idx"] for r in by_id[2]) < 19  # truncated tail skipped
    with pytest.raises(ValueError):
        mp4_frame_samples(src, every_n=0)


def test_mp4_frame_samples_every_n(spark):
    import pandas as pd

    sizes, buf = _fixture_buf()
    src = spark.createDataFrame(pd.DataFrame({"id": [9], "media": [buf]}))
    out = sorted(
        r["frame_idx"] for r in mp4_frame_samples(src, every_n=4).collect()
    )
    assert out == list(range(0, 23, 4))


# --------------------------------------------------------------------
# bloom_prune_join
# --------------------------------------------------------------------

def _bloom_frames(spark):
    import pyspark.sql.functions as F

    big = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    small = spark.range(0, 5000, 37).select(
        F.col("id").alias("k2"), F.lit("x").alias("w")
    )
    return big, small


def test_bloom_prune_join_matches_plain_join_all_modes(spark):
    from gem_data_wrangle_spark.operators.joins import bloom_prune_join

    big, small = _bloom_frames(spark)
    for how in ("inner", "left", "left_semi", "left_anti"):
        ours = sorted(
            tuple(r)
            for r in bloom_prune_join(
                big, small, "k", "k2", num_bits=1 << 14, how=how
            ).collect()
        )
        plain = sorted(
            tuple(r)
            for r in big.join(small, big["k"] == small["k2"], how).collect()
        )
        assert ours == plain, how


def test_bloom_prune_join_tiny_filter_still_exact(spark):
    """A deliberately undersized bitset (high fpp) must only cost
    wasted probe rows, never wrong results — no false negatives."""
    from gem_data_wrangle_spark.operators.joins import bloom_prune_join

    big, small = _bloom_frames(spark)
    ours = bloom_prune_join(
        big, small, "k", "k2", num_bits=64, num_hashes=1, how="inner"
    ).count()
    assert ours == big.join(small, big["k"] == small["k2"]).count()


def test_bloom_prune_join_rejects_right_preserving(spark):
    from gem_data_wrangle_spark.operators.joins import bloom_prune_join

    big, small = _bloom_frames(spark)
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="bloom_prune_join"):
            bloom_prune_join(big, small, "k", "k2", how=how)
    with pytest.raises(ValueError, match="num_hashes"):
        bloom_prune_join(big, small, "k", "k2", num_hashes=0)


def test_bloom_prune_probe_side_has_no_exchange_before_filter(spark):
    """The probe phase must be broadcast joins only: no Exchange on
    the fact side until the final shuffle join."""
    from gem_data_wrangle_spark.operators.joins import bloom_prune_join

    big, small = _bloom_frames(spark)
    plan = (
        bloom_prune_join(big, small, "k", "k2", how="left_semi")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


# --------------------------------------------------------------------
# key_skew_profile / temperature mixing
# --------------------------------------------------------------------

def test_key_skew_profile_exact_ppm(spark):
    import pyspark.sql.functions as F

    from gem_data_wrangle_spark.operators.skew import key_skew_profile

    # 600 rows of 'a', 300 of 'b', 100 of 'c'
    df = spark.range(0, 1000).select(
        F.when(F.col("id") < 600, "a")
        .when(F.col("id") < 900, "b")
        .otherwise("c").alias("k")
    )
    rows = {r["k"]: r for r in key_skew_profile(df, ["k"], top_n=2).collect()}
    assert set(rows) == {"a", "b"}  # top-2 only
    assert rows["a"]["rank"] == 1 and rows["a"]["share_ppm"] == 600_000
    assert rows["b"]["rank"] == 2 and rows["b"]["share_ppm"] == 300_000
    assert rows["b"]["cum_ppm"] == 900_000


def test_temperature_weights_flattens_distribution(spark):
    import math

    import pyspark.sql.functions as F

    from gem_data_wrangle_spark.operators.sampling import temperature_weights

    # 900 docs of 'big', 100 of 'small': raw shares 90/10, sqrt-
    # tempered shares 30:10 -> 75/25
    df = spark.range(0, 1000).select(
        F.col("id"),
        F.when(F.col("id") < 900, "big").otherwise("small").alias("d"),
    )
    got = {r["d"]: r for r in temperature_weights(df, "d", budget=1000).collect()}
    assert got["big"]["weight_u"] == round(math.sqrt(900) * 1e6)
    assert got["small"]["weight_u"] == round(math.sqrt(100) * 1e6)
    assert got["big"]["target_docs"] == 750
    assert got["small"]["target_docs"] == 250


def test_temperature_resample_respects_targets_and_is_deterministic(spark):
    import pyspark.sql.functions as F

    from gem_data_wrangle_spark.operators.sampling import temperature_resample

    df = spark.range(0, 1000).select(
        F.col("id"),
        F.when(F.col("id") < 900, "big").otherwise("small").alias("d"),
    )
    a = sorted(r["id"] for r in temperature_resample(df, "d", "id", 100).collect())
    b = sorted(r["id"] for r in temperature_resample(df, "d", "id", 100).collect())
    assert a == b  # seeded hash order, reproducible
    kept = temperature_resample(df, "d", "id", 100).groupBy("d").count()
    got = {r["d"]: r["count"] for r in kept.collect()}
    assert got == {"big": 75, "small": 25}


def test_temperature_weights_target_never_exceeds_domain(spark):
    """A tiny domain with a huge weight share must still be capped by
    the resampler at its own size (floor allocation can exceed n_docs
    only when budget > corpus; the resample takes min)."""
    import pyspark.sql.functions as F

    from gem_data_wrangle_spark.operators.sampling import temperature_resample

    df = spark.range(0, 20).select(
        F.col("id"),
        F.when(F.col("id") < 16, "x").otherwise("y").alias("d"),
    )
    kept = temperature_resample(df, "d", "id", budget=100)
    got = {r["d"]: r["count"] for r in kept.groupBy("d").count().collect()}
    assert got["x"] <= 16 and got["y"] <= 4


def test_orc_roundtrip_with_pruning_and_partitioning(spark, tmp_path):
    import pyspark.sql.functions as F

    from gem_data_wrangle_spark.sources.io import scan_orc, sink_orc

    df = spark.range(0, 100).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("part"),
        (F.col("id") * 2).alias("v"),
        F.lit("padpadpad").alias("w"),
    )
    path = str(tmp_path / "orc")
    sink_orc(df, path, partition_by=["part"])
    back = scan_orc(spark, path, columns=["id", "v"])
    assert back.columns == ["id", "v"]
    assert back.count() == 100
    assert sorted(r["v"] for r in back.filter("id < 3").collect()) == [0, 2, 4]
    # partition pruning: the filter on the partition column reaches
    # the scan (only one directory read)
    plan = (
        scan_orc(spark, path).filter("part = '1'")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "part" in plan


def test_longest_prefix_join_most_specific_wins(spark):
    from gem_data_wrangle_spark.operators.joins import longest_prefix_join

    facts = spark.createDataFrame(
        [(1, 0x0A000001), (2, 0x0A000101), (3, 0x0B000001), (4, 0x7F000001)],
        "fid bigint, ip long",
    )
    # 10.0.0.0/8 -> A ; 10.0.1.0/24 -> B (more specific); 11.0.0.0/8 -> C
    dims = spark.createDataFrame(
        [(0x0A000000, 8, "A"), (0x0A000100, 24, "B"), (0x0B000000, 8, "C")],
        "prefix long, prefix_len int, tag string",
    )
    inner = {r["fid"]: (r["matched_len"], r["tag"]) for r in
             longest_prefix_join(facts, dims, "fid", "ip").collect()}
    assert inner == {1: (8, "A"), 2: (24, "B"), 3: (8, "C")}
    left = longest_prefix_join(facts, dims, "fid", "ip", how="left").collect()
    assert len(left) == 4
    assert {r["fid"]: r["tag"] for r in left}[4] is None
    with pytest.raises(ValueError, match="longest_prefix_join"):
        longest_prefix_join(facts, dims, "fid", "ip", how="full")


def test_longest_prefix_join_dims_join_is_hash_not_theta(spark):
    """The DIMS lookup must be an equi hash join on (masked, len) —
    the failure mode this operator exists to avoid is a theta/range
    join planning as a nested loop over the ROUTING TABLE. The only
    nested loop allowed is the bounded cross fan-out against the
    ≤33-row distinct-lengths frame."""
    from gem_data_wrangle_spark.operators.joins import longest_prefix_join

    facts = spark.range(100).selectExpr("id AS fid", "id * 7 AS ip")
    dims = spark.createDataFrame(
        [(0, 8, "x")], "prefix long, prefix_len int, tag string"
    )
    plan = (
        longest_prefix_join(facts, dims, "fid", "ip")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin [_masked" in plan
    # any nested loop present must be the lens cross fan-out, never
    # a join carrying the dims' prefix column
    for line in plan.splitlines():
        if "NestedLoop" in line:
            assert "Cross" in line and "prefix" not in line


# --------------------------------------------------------------------
# gram matrix / PCA
# --------------------------------------------------------------------

def test_gram_matrix_exact_vs_numpy(spark):
    import numpy as np

    from gem_data_wrangle_spark.operators.similarity import (
        gram_matrix_int,
        quantize_embeddings,
    )

    rng = np.random.RandomState(7)
    X = rng.randn(120, 12) * 3
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(120)],
        "vid bigint, emb array<double>",
    ).repartition(5)
    Q = np.array(
        [r["q"] for r in quantize_embeddings(df, "emb", "vid", out_col="q")
         .orderBy("vid").select("q").collect()],
        dtype=np.int64,
    )
    G = Q.T @ Q
    got = {(r["i"], r["j"]): int(r["g"])
           for r in gram_matrix_int(df, "emb").collect()}
    assert all(got[(i, j)] == G[i, j] for i in range(12) for j in range(i, 12))
    assert len(got) == 12 * 13 // 2  # upper triangle only


def test_pca_project_matches_numpy_eigh(spark):
    import numpy as np

    from gem_data_wrangle_spark.operators.similarity import (
        pca_project,
        quantize_embeddings,
    )

    rng = np.random.RandomState(3)
    X = rng.randn(150, 10) * np.array([6, 5, 4] + [0.3] * 7)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(150)],
        "vid bigint, emb array<double>",
    ).repartition(4)
    pc = {r["vid"]: r["pc"] for r in pca_project(df, "emb", "vid", k=3).collect()}
    Q = np.array(
        [r["q"] for r in quantize_embeddings(df, "emb", "vid", out_col="q")
         .orderBy("vid").select("q").collect()],
        dtype=np.int64,
    )
    mu = Q.mean(axis=0)
    C = (Q.T @ Q) / len(Q) - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(C)
    B = vecs[:, np.argsort(vals)[::-1][:3]]
    for c in range(3):
        m = np.argmax(np.abs(B[:, c]))
        if B[m, c] < 0:
            B[:, c] = -B[:, c]
    P = Q @ B
    err = max(
        abs(pc[i][c] - P[i, c]) for i in range(150) for c in range(3)
    )
    assert err < 1e-9
    # energy ordering: first component carries the most variance
    var = [float(np.var(P[:, c])) for c in range(3)]
    assert var[0] >= var[1] >= var[2]
