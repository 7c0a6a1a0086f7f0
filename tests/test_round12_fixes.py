"""Differential tests for the round-12 ADVICE fixes: scan_fwf quote/
blank-line agreement between header modes, the simhash materialize
opt-out, the country-dim uniqueness guard surviving ``python -O``, and
the programmatic (collision-guarded) probe schemas."""

import subprocess
import sys

import pytest


# ---------------------------------------------------------------- scan_fwf
def test_scan_fwf_leading_quote_not_dequoted(spark, tmp_path):
    """ADVICE r12 (medium): header=True routed through the CSV reader
    with DEFAULT quoting — a line whose first byte is '"' was dequoted,
    shifting every fixed-width offset. Both modes must see raw bytes."""
    from gem_data_wrangle_spark.sources.io import scan_fwf

    body = '"quoted" ADE2024\nPlain nameFR1999\n'
    fields = [("name", 10), ("iso2", 2), ("year", 4)]

    p_h = tmp_path / "with_header.fwf"
    p_h.write_text("HEADERLINE\n" + body)
    p_n = tmp_path / "no_header.fwf"
    p_n.write_text(body)

    got_h = sorted(
        tuple(r)
        for r in scan_fwf(
            spark, str(p_h), fields, types={"year": "int"}, header=True
        ).collect()
    )
    got_n = sorted(
        tuple(r)
        for r in scan_fwf(
            spark, str(p_n), fields, types={"year": "int"}, header=False
        ).collect()
    )
    expected = [
        ('"quoted" A', "DE", 2024),
        ("Plain name", "FR", 1999),
    ]
    assert got_h == expected
    assert got_n == expected


def test_scan_fwf_blank_lines_agree_between_header_modes(spark, tmp_path):
    """The CSV source drops blank (empty or whitespace-only) lines
    unconditionally; the text path now filters to match — readr's
    skip_empty_rows=TRUE. Previously header=False kept them as extra
    all-NULL rows, silently diverging from header=True."""
    from gem_data_wrangle_spark.sources.io import scan_fwf

    body = "Row one   \n\n      \nRow two   \n"
    fields = [("name", 10)]

    p_h = tmp_path / "h.fwf"
    p_h.write_text("HEAD\n" + body)
    p_n = tmp_path / "n.fwf"
    p_n.write_text(body)

    got_h = sorted(
        (r["name"] or "",)
        for r in scan_fwf(spark, str(p_h), fields, header=True).collect()
    )
    got_n = sorted(
        (r["name"] or "",)
        for r in scan_fwf(spark, str(p_n), fields, header=False).collect()
    )
    assert got_h == got_n == [("Row one",), ("Row two",)]


# ---------------------------------------------------------------- simhash
def test_simhash_pairs_materialize_false_is_lazy(spark):
    """ADVICE r12: materialize=False returns the composable plan (no
    eager job, no localCheckpoint RDD scan) with identical results."""
    from gem_data_wrangle_spark.operators.dedup import simhash_candidate_pairs

    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "the quick brown fox jumps over the lazy dog today"),
        (3, "completely unrelated text about spark query planning"),
    ]
    df = spark.createDataFrame(rows, "id bigint, text string")
    eager = simhash_candidate_pairs(df, "text", "id", max_distance=8)
    lazy = simhash_candidate_pairs(
        df, "text", "id", max_distance=8, materialize=False
    )
    # the lazy form keeps the logical plan: a join must still be visible
    plan = lazy._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" in plan, plan
    assert sorted(map(tuple, lazy.collect())) == sorted(
        map(tuple, eager.collect())
    )


def test_simhash_pairs_checkpoint_dir_durable(spark, tmp_path):
    """checkpoint_dir= routes through a reliable DataFrame.checkpoint
    (files under the dir) instead of executor-local blocks."""
    from gem_data_wrangle_spark.operators.dedup import simhash_candidate_pairs

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),
    ]
    df = spark.createDataFrame(rows, "id bigint, text string")
    ckpt = tmp_path / "ckpt"
    out = simhash_candidate_pairs(
        df, "text", "id", max_distance=8, checkpoint_dir=str(ckpt)
    )
    got = sorted(map(tuple, out.collect()))
    assert got and got[0][:2] == (1, 2)
    assert any(ckpt.rglob("*")), "no checkpoint files written"


# ------------------------------------------------------------- country dim
def test_country_dim_uniqueness_guard_survives_python_O(tmp_path):
    """ADVICE r12: the name-uniqueness invariant was a module-level bare
    assert, stripped under ``python -O``. Now an explicit raise: a
    duplicated name must fail import even with -O."""
    script = (
        "import gem_data_wrangle_spark.data.country_codes as cc\n"
        "cc.COUNTRY_CODES is not None\n"
    )
    ok = subprocess.run(
        [sys.executable, "-O", "-c", script],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert ok.returncode == 0, ok.stderr
    # inject a duplicate and re-run the guard logic under -O
    dup_script = (
        "import gem_data_wrangle_spark.data.country_codes as cc\n"
        "names = [n for n, _, _ in cc.COUNTRY_CODES] + ['Germany']\n"
        "pairs = [(n, 'XX', 'XXX') for n in names]\n"
        "dupes = sorted({n for n in names if names.count(n) > 1})\n"
        "assert dupes == ['Germany'], dupes\n"
    )
    ok2 = subprocess.run(
        [sys.executable, "-O", "-c", dup_script],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert ok2.returncode == 0, ok2.stderr
    # and the module source no longer relies on `assert` for the guard
    import inspect

    import gem_data_wrangle_spark.data.country_codes as cc

    src = inspect.getsource(cc)
    guard = src[src.index("COUNTRY_CODES: list"):]
    assert "raise ValueError" in guard
    assert "\nassert " not in guard


# ------------------------------------------------------------ probe schemas
def test_gif_probe_rejects_colliding_id_col(spark):
    """ADVICE r12: id_col colliding with a probe output column (e.g.
    'width') used to yield a duplicate/clobbered column; now raises."""
    from gem_data_wrangle_spark.operators.gif_codec import build_gif, gif_probe

    df = spark.createDataFrame(
        [(1, bytearray(build_gif(4, 3)))], "width bigint, media binary"
    )
    with pytest.raises(ValueError, match="collides"):
        gif_probe(df, id_col="width")


def test_tiff_probe_rejects_colliding_id_col(spark):
    from gem_data_wrangle_spark.operators.tiff_exif import build_tiff, tiff_probe

    df = spark.createDataFrame(
        [(1, bytearray(build_tiff(4, 3)))], "iso bigint, media binary"
    )
    with pytest.raises(ValueError, match="collides"):
        tiff_probe(df, id_col="iso")


def test_probe_schemas_built_from_field_lists(spark):
    """The DDL constants and the renamed output schema both derive from
    the single FIELDS list — no string surgery; custom id_col still
    threads through and the default schema is unchanged."""
    from gem_data_wrangle_spark.operators import gif_codec, tiff_exif

    assert gif_codec.GIF_PROBE_SCHEMA.startswith("id bigint, probe_status")
    assert tiff_exif.PROBE_SCHEMA.startswith("id bigint, probe_status")
    df = spark.createDataFrame(
        [(9, bytearray(gif_codec.build_gif(8, 5)))],
        "asset bigint, media binary",
    )
    out = gif_codec.gif_probe(df, id_col="asset")
    row = out.collect()[0]
    assert row["asset"] == 9 and row["width"] == 8 and row["height"] == 5


# --------------------------------------------------------------- lang router
def test_lang_id_round12_script_breadth(spark):
    """VERDICT r11 item 2: Devanagari/Thai/Greek/Hebrew/Bengali/Tamil
    no longer fall through to ``und``; bg/sr join the Cyrillic vote;
    zero-hit Cyrillic abstains (``und``) instead of guessing ru."""
    from pyspark.sql import functions as F

    from gem_data_wrangle_spark.operators import textops as T

    cases = [
        (1, "यह एक हिंदी वाक्य है और इसमें देवनागरी लिपि है", "hi"),
        (2, "นี่คือประโยคภาษาไทยที่ไม่มีการเว้นวรรค", "th"),
        (3, "αυτό είναι ένα ελληνικό κείμενο χωρίς στίξη", "el"),
        (4, "זהו משפט בעברית ללא ניקוד", "he"),
        (5, "এটি একটি বাংলা বাক্য এবং এতে বাংলা লিপি আছে", "bn"),
        (6, "இது ஒரு தமிழ் வாக்கியம் மற்றும் தமிழ் எழுத்து", "ta"),
        # bulgarian: hits че/това/във/този/които, zero ru hits now
        (7, "това е изречение че във този текст които четем", "bg"),
        # serbian: hits је/су/ће/као/него
        (8, "ово је реченица као што су ће него друге", "sr"),
        # russian still routes ru (же replaced the shared "и")
        (9, "я не знаю что это как оно работает но хорошо же", "ru"),
        (10, "я не знаю що це як воно працює але добре", "uk"),
        # cyrillic with no stopword hits → und (was ru pre-round-12)
        (11, "слово без стопслов текст корпус", "und"),
        # pre-existing routes unchanged
        (12, "the cat sat on the mat and the dog", "en"),
        (13, "これは日本語の文です漢字も含まれています", "ja"),
        (14, "这是一个很长的中文句子没有空格分词", "zh"),
        (15, "هذه جملة باللغة العربية بدون توقف", "ar"),
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
    assert got == {i: lang for i, _, lang in cases}


def test_lang_id_oracle_replays_round12_router(spark, tmp_path):
    """Spark expression and regenerated DuckDB oracle agree doc-for-doc
    across ALL router arms, including the six new scripts and the
    widened Cyrillic vote (the driver's value-hash precondition)."""
    import duckdb
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from gem_data_wrangle_spark.operators import textops as T

    rows = [
        (1, "यह एक हिंदी वाक्य है"),
        (2, "นี่คือประโยคภาษาไทย"),
        (3, "αυτό είναι ελληνικό κείμενο"),
        (4, "זהו משפט בעברית"),
        (5, "এটি একটি বাংলা বাক্য"),
        (6, "இது ஒரு தமிழ் வாக்கியம்"),
        (7, "това е изречение че във този текст"),
        (8, "ово је реченица као што су ће"),
        (9, "я не знаю что это как оно работает"),
        (10, "слово без стопслов текст корпус"),
        (11, "the quick brown fox and the dog"),
        (12, "这是中文文本没有分词"),
        (13, "これは日本語です"),
        (14, ""),
        (15, None),
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


# ------------------------------------------------------------ fwf positions
def test_scan_fwf_positions_gaps_and_overlap(spark, tmp_path):
    """readr::fwf_positions analogue: 1-based inclusive bounds, gaps
    skipped, overlapping spans re-readable under two names."""
    from gem_data_wrangle_spark.sources.io import scan_fwf_positions

    p = tmp_path / "pos.fwf"
    p.write_text(
        "AB12345CDE99\n"
        "XY67890ZZZ01\n"
    )
    out = sorted(
        tuple(r)
        for r in scan_fwf_positions(
            spark, str(p),
            positions=[
                ("prefix", 1, 2),        # AB
                ("num", 3, 7),           # 12345 (gap-free here)
                ("tail2", 11, 12),       # 99 (skips CDE start)
                ("composite", 1, 7),     # overlaps prefix+num
            ],
            types={"num": "int", "tail2": "int"},
        ).collect()
    )
    assert out == [
        ("AB", 12345, 99, "AB12345"),
        ("XY", 67890, 1, "XY67890"),
    ]


def test_scan_fwf_positions_validates(spark, tmp_path):
    import pytest as _pytest

    from gem_data_wrangle_spark.sources.io import scan_fwf_positions

    with _pytest.raises(ValueError, match="at least one"):
        scan_fwf_positions(spark, str(tmp_path), positions=[])
    with _pytest.raises(ValueError, match="start <= end"):
        scan_fwf_positions(spark, str(tmp_path), positions=[("a", 5, 3)])
    with _pytest.raises(ValueError, match="start <= end"):
        scan_fwf_positions(spark, str(tmp_path), positions=[("a", 0, 3)])


def test_scan_fwf_positions_header_mode_matches(spark, tmp_path):
    from gem_data_wrangle_spark.sources.io import scan_fwf_positions

    body = "AA111\nBB222\n"
    p_h = tmp_path / "h.fwf"
    p_h.write_text("HEAD\n" + body)
    p_n = tmp_path / "n.fwf"
    p_n.write_text(body)
    pos = [("k", 1, 2), ("v", 3, 5)]
    got_h = sorted(
        map(tuple, scan_fwf_positions(
            spark, str(p_h), pos, types={"v": "int"}, header=True
        ).collect())
    )
    got_n = sorted(
        map(tuple, scan_fwf_positions(
            spark, str(p_n), pos, types={"v": "int"}, header=False
        ).collect())
    )
    assert got_h == got_n == [("AA", 111), ("BB", 222)]


# ---------------------------------------------------- unicode normalization
def test_normalize_documents_nfc_composes(spark):
    from gem_data_wrangle_spark.operators.textops import normalize_documents

    rows = [
        (1, "café"),          # cafe + combining acute -> café
        (2, "café"),                # already composed
        (3, None),
        (4, "plain ascii"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r["doc_id"]: r["text"]
        for r in normalize_documents(df, "text", form="NFC").collect()
    }
    assert out[1] == out[2] == "caf\u00e9"
    assert out[3] is None and out[4] == "plain ascii"


def test_normalize_documents_nfkc_folds_compat(spark):
    from gem_data_wrangle_spark.operators.textops import normalize_documents

    df = spark.createDataFrame(
        [(1, "１２３ ﬁne")],  # full-width 123 + fi ligature
        "doc_id bigint, text string",
    )
    row = normalize_documents(df, "text", form="NFKC").collect()[0]
    assert row["text"] == "123 fine"


def test_normalize_documents_out_col_and_passthrough(spark):
    from gem_data_wrangle_spark.operators.textops import normalize_documents

    df = spark.createDataFrame(
        [(7, "é", "keepme")], "doc_id bigint, text string, extra string"
    )
    out = normalize_documents(df, "text", out_col="canon").collect()[0]
    assert out["text"] == "é"           # original untouched
    assert out["canon"] == "é"
    assert out["extra"] == "keepme"           # other columns pass through
    assert out["doc_id"] == 7


def test_normalize_documents_collapse_ws_and_validation(spark):
    import pytest as _pytest

    from gem_data_wrangle_spark.operators.textops import normalize_documents

    df = spark.createDataFrame([(1, "  á   b  ")], "id bigint, text string")
    row = normalize_documents(df, "text", collapse_ws=True).collect()[0]
    assert row["text"] == "á b"
    with _pytest.raises(ValueError, match="NFC/NFD/NFKC/NFKD"):
        normalize_documents(df, "text", form="nfc")


def test_normalize_documents_matches_duckdb_nfc(spark, tmp_path):
    """Cross-engine agreement: Python unicodedata NFC == DuckDB
    nfc_normalize (utf8proc) on mixed composed/decomposed text — the
    precondition for the nfc_canonical_hashes driver oracle."""
    import duckdb

    from gem_data_wrangle_spark.operators.textops import normalize_documents

    rows = [
        (1, "café au lait"),
        (2, "Å ring"),              # A + combining ring -> Å
        (3, "ascii only"),
        (4, "\u00e9\u0301 stacked"),  # composed é + another combining acute
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    parquet = str(tmp_path / "n.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(parquet)
    got = sorted(
        (r["doc_id"], r["text"])
        for r in normalize_documents(df, "text", form="NFC").collect()
    )
    con = duckdb.connect()
    want = sorted(
        (int(a), b)
        for a, b in con.sql(
            f"SELECT doc_id, nfc_normalize(text) FROM '{parquet}/*.parquet'"
        ).fetchall()
    )
    con.close()
    assert got == want


# --------------------------------------------------------- compression sig
def test_compression_signals_exact_integers(spark):
    import zlib

    from gem_data_wrangle_spark.operators.textops import compression_signals

    texts = {
        1: "spam spam spam spam spam spam spam spam",   # repetitive
        2: "the quick brown fox jumps over the lazy dog",
        3: "",
        4: None,
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (r["raw_len"], r["zlib_len"], r["ratio_ppm"])
        for r in compression_signals(df, "text", "doc_id").collect()
    }
    for k in (1, 2):
        b = texts[k].encode()
        c = zlib.compress(b, 6)
        assert got[k] == (len(b), len(c), len(c) * 1_000_000 // len(b))
    assert got[3] == (None, None, None)
    assert got[4] == (None, None, None)
    # the quality-band property the filter relies on
    assert got[1][2] < got[2][2], "repetitive text must compress harder"


def test_compression_signals_validates_level(spark):
    import pytest as _pytest

    from gem_data_wrangle_spark.operators.textops import compression_signals

    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with _pytest.raises(ValueError, match="level"):
        compression_signals(df, "text", "doc_id", level=0)


# ------------------------------------------------------------------ k-core
def test_k_core_peels_pendants_keeps_cycle(spark):
    """2-core of a triangle with a pendant chain: the chain peels over
    TWO cascading rounds (leaf first, then the newly-exposed node),
    the triangle survives with degree 2."""
    from gem_data_wrangle_spark.operators.graph import k_core

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 4), (4, 5)],
        "src bigint, dst bigint",
    )
    got = sorted(map(tuple, k_core(edges, "src", "dst", k=2).collect()))
    assert got == [(1, 2), (2, 2), (3, 2)]


def test_k_core_path_fully_peels(spark):
    from gem_data_wrangle_spark.operators.graph import k_core

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src bigint, dst bigint"
    )
    assert k_core(edges, "src", "dst", k=2).count() == 0


def test_k_core_truncated_iterations(spark):
    """max_iter=1 peels only the leaf; node 4 (now degree 1) is still
    present in the truncated core — the deterministic oracle contract."""
    from gem_data_wrangle_spark.operators.graph import k_core

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 4), (4, 5)],
        "src bigint, dst bigint",
    )
    got = sorted(map(tuple, k_core(edges, "src", "dst", k=2, max_iter=1).collect()))
    assert got == [(1, 3), (2, 2), (3, 2), (4, 1)]


def test_k_core_collapses_parallels_and_self_loops(spark):
    """Parallel edges collapse (a double edge is NOT degree 2) and
    self-loops never count toward survival."""
    from gem_data_wrangle_spark.operators.graph import k_core

    edges = spark.createDataFrame(
        [(1, 2), (1, 2), (2, 1), (3, 3), (1, 1)],
        "src bigint, dst bigint",
    )
    # the only real structure is the single undirected edge 1-2
    got = sorted(map(tuple, k_core(edges, "src", "dst", k=1).collect()))
    assert got == [(1, 1), (2, 1)]
    assert k_core(edges, "src", "dst", k=2).count() == 0


def test_k_core_validates_k(spark):
    import pytest as _pytest

    from gem_data_wrangle_spark.operators.graph import k_core

    edges = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    with _pytest.raises(ValueError, match="k must be"):
        k_core(edges, "src", "dst", k=0)


# ---------------------------------------------------- review-pass hardening
def test_simhash_lazy_mode_registers_no_cache_entry(spark):
    """Round-12 review: materialize=False must NOT leave a persisted
    signature frame behind (CacheManager holds strong refs the
    ContextCleaner can never collect — the ADVICE-r10 leak shape)."""
    from gem_data_wrangle_spark.operators.dedup import simhash_candidate_pairs

    sc = spark.sparkContext
    # compare RDD-id SETS, not counts: unrelated checkpoint blocks from
    # earlier tests may be ContextCleaner-collected mid-test, shrinking
    # the registry; only NEW entries indicate a leak
    before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma epsilon")],
        "id bigint, text string",
    )
    lazy = simhash_candidate_pairs(
        df, "text", "id", max_distance=8, materialize=False
    )
    lazy.collect()
    leaked = set(sc._jsc.getPersistentRDDs().keySet().toArray()) - before
    assert not leaked, f"lazy mode leaked cache entries: {leaked}"


def test_compression_signals_null_id_and_collision(spark):
    from gem_data_wrangle_spark.operators.textops import compression_signals

    df = spark.createDataFrame(
        [(None, "some text here"), (2, "more text")],
        "doc_id bigint, text string",
    )
    got = sorted(
        (
            (r["doc_id"], r["raw_len"] is not None)
            for r in compression_signals(df, "text", "doc_id").collect()
        ),
        key=lambda t: (t[0] is None, t[0] or 0),
    )
    assert got == [(2, True), (None, True)]
    with pytest.raises(ValueError, match="collides"):
        compression_signals(df, "text", "raw_len")


def test_compression_signals_string_ids_pass_through(spark):
    # the id keeps its INPUT type — string/uuid document keys must not
    # be coerced through a hardcoded bigint (crashed mid-job pre-fix)
    from gem_data_wrangle_spark.operators.textops import compression_signals

    df = spark.createDataFrame(
        [("doc-a", "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"), ("doc-b", None)],
        "doc_id string, text string",
    )
    out = compression_signals(df, "text", "doc_id")
    assert out.schema["doc_id"].dataType.simpleString() == "string"
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows["doc-a"]["raw_len"] == 30
    assert rows["doc-a"]["zlib_len"] is not None
    assert rows["doc-b"]["raw_len"] is None


def test_bmp_probe_rejects_colliding_id_col(spark):
    from gem_data_wrangle_spark.operators.bmp_codec import bmp_probe, build_bmp

    df = spark.createDataFrame(
        [(1, bytearray(build_bmp(4, 3)))], "width bigint, media binary"
    )
    with pytest.raises(ValueError, match="collides"):
        bmp_probe(df, id_col="width")


def test_normalize_documents_rejects_typed_out_col(spark):
    from gem_data_wrangle_spark.operators.textops import normalize_documents

    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="pick a new column name"):
        normalize_documents(df, "text", out_col="doc_id")


def test_bpe_encode_rejects_duplicate_output_names(spark):
    from gem_data_wrangle_spark.operators.bpe import bpe_encode

    df = spark.createDataFrame([(1, "ab ab")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="distinct"):
        bpe_encode(df, "text", [("a", "b")], "doc_id", tokens_col="doc_id")


def test_chunk_documents_rejects_colliding_id_col(spark):
    from gem_data_wrangle_spark.operators.textops import chunk_documents

    df = spark.createDataFrame(
        [(1, "a b c d e")], "chunk_idx bigint, text string"
    )
    with pytest.raises(ValueError, match="collides"):
        chunk_documents(df, "text", "chunk_idx")


def test_k_core_max_iter_early_exit_matches_fixpoint(spark):
    """max_iter far beyond convergence must give the fixpoint answer
    (the post-convergence rounds are no-ops and are skipped)."""
    from gem_data_wrangle_spark.operators.graph import k_core

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 4), (4, 5)],
        "src bigint, dst bigint",
    )
    fix = sorted(map(tuple, k_core(edges, "src", "dst", k=2).collect()))
    trunc = sorted(
        map(tuple, k_core(edges, "src", "dst", k=2, max_iter=50).collect())
    )
    assert fix == trunc == [(1, 2), (2, 2), (3, 2)]
