"""Differential tests for the round-11 ADVICE/VERDICT fixes (the five
carried-forward ADVICE items + the width audit)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------- gif/tiff
def test_gif_probe_threads_custom_id_col(spark):
    """ADVICE r10: gif_probe hardcoded output column ``id`` despite
    accepting ``id_col`` — a custom caller's key was silently
    renamed."""
    from gem_data_wrangle_spark.operators.gif_codec import build_gif, gif_probe

    df = spark.createDataFrame(
        [(7, bytearray(build_gif(40, 30, n_frames=2)))],
        "asset_key bigint, media binary",
    )
    out = gif_probe(df, id_col="asset_key")
    assert out.columns[0] == "asset_key"
    row = out.collect()[0]
    assert (row["asset_key"], row["width"], row["height"], row["n_frames"]) == (
        7, 40, 30, 2,
    )


def test_tiff_probe_threads_custom_id_col(spark):
    from gem_data_wrangle_spark.operators.tiff_exif import build_tiff, tiff_probe

    df = spark.createDataFrame(
        [(3, bytearray(build_tiff(64, 48, orientation=6)))],
        "asset_key bigint, media binary",
    )
    out = tiff_probe(df, id_col="asset_key")
    assert out.columns[0] == "asset_key"
    row = out.collect()[0]
    assert (row["asset_key"], row["width"], row["height"], row["orientation"]) == (
        3, 64, 48, 6,
    )


def test_probes_default_id_col_unchanged(spark):
    """The default surface (id) is byte-identical to before the fix."""
    from gem_data_wrangle_spark.operators.gif_codec import build_gif, gif_probe

    df = spark.createDataFrame(
        [(1, bytearray(build_gif(8, 8)))], "id bigint, media binary"
    )
    assert gif_probe(df).columns[0] == "id"


# ---------------------------------------------------------------- benford
def test_benford_profile_empty_group_cols_is_global(spark):
    """ADVICE r10: group_cols=[] built join(on=[]) and raised at
    runtime; it now means ONE global profile."""
    from gem_data_wrangle_spark.operators.quality import benford_profile

    df = spark.createDataFrame(
        [(float(v),) for v in (1.23, 1.9, 2.5, 3.1, 19.0, 0.0, -4.0, 9.99)],
        "amount double",
    )
    rows = benford_profile(df, [], "amount").collect()
    # zero/negative excluded; digits observed: 1 (1.23, 1.9, 19.0), 2, 3, 9
    got = {r["digit"]: r["n_rows"] for r in rows}
    assert got == {1: 3, 2: 1, 3: 1, 9: 1}
    # global shares sum to ~1e6 ppm (integer floors may undershoot)
    total_ppm = sum(r["obs_ppm"] for r in rows)
    assert 999_990 <= total_ppm <= 1_000_000
    assert {r["benford_ppm"] for r in rows if r["digit"] == 1} == {301029}


def test_benford_profile_grouped_path_unchanged(spark):
    from gem_data_wrangle_spark.operators.quality import benford_profile

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 1.5), ("b", 2.0)], "g string, amount double"
    )
    rows = benford_profile(df, ["g"], "amount").collect()
    got = {(r["g"], r["digit"]): (r["n_rows"], r["obs_ppm"]) for r in rows}
    assert got == {
        ("a", 1): (2, 1_000_000),
        ("b", 2): (1, 1_000_000),
    }


# ---------------------------------------------------------------- simhash
def test_simhash_pairs_releases_signature_cache(spark):
    """ADVICE r10: the persisted corpus-sized signature frame was never
    unpersisted — repeated calls grew the block store for the session.
    The pair set is now materialized (localCheckpoint) and the
    signature cache released before return."""
    from gem_data_wrangle_spark.operators.dedup import simhash_candidate_pairs

    spark.catalog.clearCache()
    docs = [(i, "the quick brown fox jumps over the lazy dog " + str(i % 3))
            for i in range(30)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = simhash_candidate_pairs(df, "text", "doc_id", bits=32, max_distance=2)
    # near-identical docs (same i%3 suffix) must still pair up
    assert out.count() > 0
    assert out.schema["hamming"].dataType == T.LongType()
    # CacheManager must be empty again: localCheckpoint blocks do not
    # register there, so any survivor IS the leaked signature frame.
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


# ---------------------------------------------------------- width audit
def test_exact_jaccard_join_counts_are_long(spark):
    """VERDICT r10 directive 5: n_shared/n_a/n_b widen at the source
    (F.size is int32 and the counts flow into graded projections)."""
    from gem_data_wrangle_spark.operators.dedup import exact_jaccard_join

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "x y z w")],
        "doc_id bigint, text string",
    )
    out = exact_jaccard_join(df, "text", "doc_id", threshold=0.5)
    for c in ("n_shared", "n_a", "n_b"):
        assert out.schema[c].dataType == T.LongType(), c
    rows = {(r["id_a"], r["id_b"]): r["n_shared"] for r in out.collect()}
    assert rows == {(1, 2): 3}


def test_pack_id_and_session_idx_are_long(spark):
    """Round-11 width audit: pack_id (bucket_tokens/budget) and
    session_idx (sessions-per-key) are unbounded at corpus scale; the
    old cast-to-int was a silent 2^31 ceiling."""
    from gem_data_wrangle_spark.operators.aggregates import sessionize
    from gem_data_wrangle_spark.operators.sampling import pack_documents

    docs = spark.createDataFrame(
        [(i, 100) for i in range(20)], "doc_id bigint, n_tokens int"
    )
    packed = pack_documents(docs, "doc_id", "n_tokens", budget=250)
    assert packed.schema["pack_id"].dataType == T.LongType()

    ev = spark.createDataFrame(
        [(1, f"2024-01-01 00:{m:02d}:00") for m in (0, 1, 30, 31)],
        "user bigint, ts string",
    ).select("user", F.col("ts").cast("timestamp").alias("ts"))
    sess = sessionize(ev, "user", "ts", gap_seconds=600)
    assert sess.schema["session_idx"].dataType == T.LongType()
    got = sorted((r["ts"].minute, r["session_idx"]) for r in sess.collect())
    assert got == [(0, 1), (1, 1), (30, 2), (31, 2)]


# ---------------------------------------------------------------- kmv
def test_kmv_intersect_estimate_emits_exactly_contract_columns(spark):
    """ADVICE r10: _na/_nb were computed through three aggregates and
    never emitted — dead plan work. The output contract is exactly
    (n_common_below_theta, theta, est_intersection)."""
    from gem_data_wrangle_spark.operators.sketches import (
        kmv_intersect_estimate,
        kmv_sketch,
    )

    a = spark.createDataFrame([(f"u{i}",) for i in range(200)], "k string")
    b = spark.createDataFrame([(f"u{i}",) for i in range(100, 300)], "k string")
    sa = kmv_sketch(a, [], "k", k=64)
    sb = kmv_sketch(b, [], "k", k=64)
    out = kmv_intersect_estimate(sa, sb, k=64)
    assert out.columns == ["n_common_below_theta", "theta", "est_intersection"]
    row = out.collect()[0]
    # true intersection 100 of 300 distinct; theta-sketch noise at k=64
    assert 30 <= row["est_intersection"] <= 250


def test_kmv_intersect_estimate_empty_overlap_reports_theta(spark):
    from gem_data_wrangle_spark.operators.sketches import (
        kmv_intersect_estimate,
        kmv_sketch,
    )

    a = spark.createDataFrame([(f"a{i}",) for i in range(50)], "k string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(50)], "k string")
    out = kmv_intersect_estimate(
        kmv_sketch(a, [], "k", k=64), kmv_sketch(b, [], "k", k=64), k=64
    ).collect()[0]
    assert out["n_common_below_theta"] == 0
    assert out["theta"] is not None
    assert out["est_intersection"] == 0.0


# ---------------------------------------------------------------- scd2
def _scd2_frames(spark):
    history = spark.createDataFrame(
        [
            (1, "gold", "2024-01-01", "2024-06-01"),
            (1, "plat", "2024-06-01", None),
        ],
        "cust bigint, tier string, valid_from string, valid_to string",
    ).select(
        "cust", "tier",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )
    facts = spark.createDataFrame(
        [(1, "2024-03-01", "silver"), (1, "2024-07-01", "silver")],
        "cust bigint, ts string, tier string",
    ).select("cust", F.col("ts").cast("timestamp").alias("ts"), "tier")
    return facts, history


def test_scd2_lookup_rejects_colliding_attr_without_suffix(spark):
    """ADVICE r10: an attr_cols name already present in facts produced
    an ambiguous duplicate column that only erred on first reference —
    now it raises at call time with the remedy in the message."""
    from gem_data_wrangle_spark.operators.asof import scd2_lookup

    facts, history = _scd2_frames(spark)
    with pytest.raises(ValueError, match="suffix"):
        scd2_lookup(facts, history, ["cust"], "ts", ["tier"])


def test_scd2_lookup_suffix_disambiguates_collision(spark):
    from gem_data_wrangle_spark.operators.asof import scd2_lookup

    facts, history = _scd2_frames(spark)
    out = scd2_lookup(
        facts, history, ["cust"], "ts", ["tier"], suffix="_dim"
    )
    assert out.columns.count("tier") == 1  # the facts column, untouched
    got = sorted((r["ts"].month, r["tier"], r["tier_dim"]) for r in out.collect())
    assert got == [(3, "silver", "gold"), (7, "silver", "plat")]


def test_scd2_lookup_no_collision_path_unchanged(spark):
    from gem_data_wrangle_spark.operators.asof import scd2_lookup

    facts, history = _scd2_frames(spark)
    out = scd2_lookup(
        facts.drop("tier"), history, ["cust"], "ts", ["tier"]
    )
    got = sorted((r["ts"].month, r["tier"]) for r in out.collect())
    assert got == [(3, "gold"), (7, "plat")]


# ---------------------------------------------------------------- lang_id
def test_lang_id_script_router(spark):
    """VERDICT r10 directive 8: the dominant Unicode script routes to a
    candidate set before the stopword vote, so unsegmented
    CJK/Cyrillic/Arabic no longer lands in ``und``."""
    from gem_data_wrangle_spark.operators import textops as T

    cases = [
        (1, "the cat sat on the mat and the dog", "en"),
        (2, "el perro y el gato que corren en la casa", "es"),
        (3, "le chat et le chien dans les rues des villes", "fr"),
        (4, "der hund und die katze ist von einem haus", "de"),
        (5, "il gatto che corre per la strada della città nel parco", "it"),
        (6, "não sei do que falas em uma cidade os dias", "pt"),
        (7, "zzz qqq www", "und"),                       # latin, no hits
        (8, "这是一个很长的中文句子没有空格分词", "zh"),      # han, no kana
        (9, "これは日本語の文です漢字も含まれています", "ja"),  # han + kana
        (10, "カタカナダケノブンショウ", "ja"),               # pure kana
        (11, "한국어 문장입니다 안녕하세요", "ko"),            # hangul
        (12, "هذه جملة باللغة العربية بدون توقف", "ar"),     # arabic
        (13, "я не знаю что это как оно работает но хорошо", "ru"),
        (14, "я не знаю що це як воно працює але добре", "uk"),
        # round 12: cyrillic zero-hit ABSTAINS (und) instead of
        # guessing ru — symmetric with the latin arm
        (15, "слово без стопслов текст корпус", "und"),
        (16, "", "und"),
        (17, None, "und"),
        # mixed: han majority over latin letters
        (18, "spark 是一个分布式计算引擎用于大规模数据处理", "zh"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in cases], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: r["lang"]
        for r in df.select(
            "doc_id", T.lang_id(F.col("text")).alias("lang")
        ).collect()
    }
    want = {i: lang for i, _, lang in cases}
    assert got == want


def test_lang_id_oracle_replays_router_on_mixed_scripts(spark, tmp_path):
    """The DuckDB oracle and the Spark expression agree doc-for-doc on
    a mixed-script corpus (the driver's value-hash precondition)."""
    import duckdb

    import __spark_entry__ as entrymod
    from gem_data_wrangle_spark.operators import textops as T

    rows = [
        (1, "the quick brown fox and the dog"),
        (2, "el que quiere un perro y un gato en la casa"),
        (3, "这是中文文本没有分词"),
        (4, "これは日本語です"),
        (5, "한국어 텍스트"),
        (6, "نص عربي قصير"),
        (7, "я думаю что это хорошо"),
        (8, "zzz qqq"),
        (9, ""),
        (10, "il che di per strada della nel"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    parquet = str(tmp_path / "docs.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(parquet)
    spark_got = sorted(
        (r["doc_id"], r["lang_pred"])
        for r in df.select(
            "doc_id", T.lang_id(F.col("text")).alias("lang_pred")
        ).collect()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS FROM '{parquet}/*.parquet'")
    duck_got = sorted(
        (int(a), b)
        for a, b in con.sql(entrymod.oracle_sql()["lang_id"]).fetchall()
    )
    con.close()
    assert spark_got == duck_got


# ---------------------------------------------------------------- jl ship
def test_jl_project_ship_forms_agree(spark):
    """VERDICT r10 directive 7: the broadcast-data shipping form (now
    the default — measured faster, BENCH_HISTORY r11) is bit-identical
    to the plan-literal form."""
    from gem_data_wrangle_spark.operators.similarity import jl_project_int

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    lit_rows = sorted(
        tuple(r)
        for r in jl_project_int(
            emb, "embedding", "vec_id", 64, 8, ship="literal"
        ).collect()
    )
    bc_rows = sorted(
        tuple(r)
        for r in jl_project_int(
            emb, "embedding", "vec_id", 64, 8, ship="broadcast"
        ).collect()
    )
    assert lit_rows == bc_rows
    with pytest.raises(ValueError, match="ship"):
        jl_project_int(emb, "embedding", "vec_id", 64, 8, ship="nope")


def test_hash_bucket_rejects_int32_overflow_widths(spark):
    """Round-11 width audit: 16^8-1 exceeds int32; the overflow would
    be silent bucket corruption, so 8+ nibbles is an error."""
    from gem_data_wrangle_spark.operators.sampling import hash_bucket

    df = spark.createDataFrame([(1,)], "k bigint")
    assert df.select(hash_bucket(F.col("k"), 7).alias("b")).collect()[0]["b"] >= 0
    with pytest.raises(ValueError, match="nibbles"):
        hash_bucket(F.col("k"), 8)
    with pytest.raises(ValueError, match="nibbles"):
        hash_bucket(F.col("k"), 0)
