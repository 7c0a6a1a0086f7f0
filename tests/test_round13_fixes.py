"""Round-13 hardening tests.

Covers the four ADVICE-r12 fixes (fwf skip_blank_lines opt-out, k_core
max_iter validation, hits_scores overflow guard, fwf tmp-dir cleanup)
and the VERDICT-r12 item-7 fixpoint assertion: a truncated k_core peel
that HAS converged must equal max_iter=None, on a graph where 3 peels
are provably not enough.
"""

import pytest


# ------------------------------------------------------------ k-core
def test_k_core_fixpoint_equals_converged_truncation(spark):
    """Triangle + a 5-link pendant chain: the chain needs FIVE cascading
    peel rounds (8, then 7, 6, 5, 4), so max_iter=3 under-peels while
    max_iter=5 has converged and must equal the max_iter=None fixpoint.
    Guards the truncation contract: a graded fixed-iteration core is
    only the true core once the peel cascade has actually finished."""
    from gem_data_wrangle_spark.operators.graph import k_core

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 4), (4, 5), (5, 6), (6, 7), (7, 8)],
        "src bigint, dst bigint",
    )
    fixpoint = sorted(
        map(tuple, k_core(edges, "src", "dst", k=2, max_iter=None).collect())
    )
    assert fixpoint == [(1, 2), (2, 2), (3, 2)]
    converged = sorted(
        map(tuple, k_core(edges, "src", "dst", k=2, max_iter=5).collect())
    )
    assert converged == fixpoint
    # 3 peels are NOT enough on this graph: nodes 4 and 5 still stand
    truncated = sorted(
        map(tuple, k_core(edges, "src", "dst", k=2, max_iter=3).collect())
    )
    assert truncated == [(1, 3), (2, 2), (3, 2), (4, 2), (5, 1)]
    assert truncated != fixpoint


def test_k_core_validates_max_iter(spark):
    """max_iter=0 or negative used to silently return the UNPEELED
    degree table (ADVICE r12) — now it raises like k<1 does."""
    from gem_data_wrangle_spark.operators.graph import k_core

    edges = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    with pytest.raises(ValueError, match="max_iter"):
        k_core(edges, "src", "dst", k=2, max_iter=0)
    with pytest.raises(ValueError, match="max_iter"):
        k_core(edges, "src", "dst", k=2, max_iter=-3)


# -------------------------------------------------------------- HITS
def test_hits_guards_int64_overflow_iterations(spark):
    """Scores grow like (din*dout)^k and Spark's non-ANSI BIGINT sum
    wraps silently, so iterations > 4 must fail loudly unless the
    caller asserts a degree bound via allow_wide=True (ADVICE r12)."""
    from gem_data_wrangle_spark.operators.graph import hits_scores

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src bigint, dst bigint")
    with pytest.raises(ValueError, match="allow_wide"):
        hits_scores(edges, "src", "dst", iterations=5)
    # the escape hatch works, and the guard boundary (4) stays open
    wide = hits_scores(edges, "src", "dst", iterations=5, allow_wide=True)
    assert wide.count() == 3
    ok = hits_scores(edges, "src", "dst", iterations=4)
    assert ok.count() == 3


def test_hits_small_graph_values_unchanged(spark):
    """The guard must not change graded-path (iterations=2) values:
    path 1->2->3, h0=1 everywhere. Round 1: a=(0,1,1), h=(1,1,0).
    Round 2: a=(0,1,1), h=(1,1,0)."""
    from gem_data_wrangle_spark.operators.graph import hits_scores

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src bigint, dst bigint")
    got = sorted(map(tuple, hits_scores(edges, "src", "dst").collect()))
    assert got == [(1, 1, 0), (2, 1, 1), (3, 0, 1)]


# ------------------------------------------------- fixed-width blanks
def test_scan_fwf_skip_blank_lines_opt_out(spark, tmp_path):
    """A record whose every field is blank is all spaces; the default
    drops it (stricter than readr's truly-empty-only skip — documented)
    while skip_blank_lines=False keeps it as an all-NULL row. Truly
    empty lines are non-records in BOTH modes."""
    from gem_data_wrangle_spark.sources.io import scan_fwf

    p = tmp_path / "blanks.txt"
    p.write_text("AB12\n    \n\nCD34\n")
    fields = [("code", 2), ("num", 2)]

    default = scan_fwf(spark, str(p), fields=fields)
    assert sorted(r["code"] for r in default.collect()) == ["AB", "CD"]

    kept = scan_fwf(spark, str(p), fields=fields, skip_blank_lines=False)
    rows = sorted(kept.collect(), key=lambda r: (r["code"] is None, r["code"]))
    assert [(r["code"], r["num"]) for r in rows] == [
        ("AB", "12"), ("CD", "34"), (None, None),
    ]


def test_scan_fwf_positions_skip_blank_lines_opt_out(spark, tmp_path):
    from gem_data_wrangle_spark.sources.io import scan_fwf_positions

    p = tmp_path / "blanks_pos.txt"
    p.write_text("AB12\n    \nCD34\n")
    kept = scan_fwf_positions(
        spark, str(p),
        positions=[("code", 1, 2), ("num", 3, 4)],
        skip_blank_lines=False,
    )
    assert kept.count() == 3


def test_scan_fwf_header_mode_rejects_skip_blank_opt_out(spark, tmp_path):
    """The CSV source behind the distributed-safe header skip drops
    blank lines unconditionally, so the combination must raise rather
    than silently ignore the flag."""
    from gem_data_wrangle_spark.sources.io import scan_fwf

    p = tmp_path / "hdr.txt"
    p.write_text("HEADER\nAB12\n")
    with pytest.raises(ValueError, match="skip_blank_lines"):
        scan_fwf(
            spark, str(p), fields=[("code", 2), ("num", 2)],
            header=True, skip_blank_lines=False,
        )


# ------------------------------------------- RLE compression bound
def test_rle_run_signals_values(spark):
    """Exact run counts and the 2-bytes-per-run ppm floor; empty/NULL
    emit NULLs like compression_signals (never a divide-by-zero)."""
    from gem_data_wrangle_spark.operators.textops import rle_run_signals

    df = spark.createDataFrame(
        [(1, "aaabbc"), (2, "abab"), (3, "x"), (4, ""), (5, None),
         (6, "aaaaaaaaaa")],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (r["n_chars"], r["n_runs"], r["rle_ppm"])
        for r in rle_run_signals(df, "text", "doc_id").collect()
    }
    assert got[1] == (6, 3, 1_000_000)          # aaa|bb|c
    assert got[2] == (4, 4, 2_000_000)          # incompressible: every char a run
    assert got[3] == (1, 1, 2_000_000)
    assert got[4] == (None, None, None)
    assert got[5] == (None, None, None)
    assert got[6] == (10, 1, 200_000)           # boilerplate collapses


def test_rle_run_signals_validates_id_collision(spark):
    from gem_data_wrangle_spark.operators.textops import rle_run_signals

    df = spark.createDataFrame([(1, "x")], "n_runs bigint, text string")
    with pytest.raises(ValueError, match="collides"):
        rle_run_signals(df, "text", "n_runs")


# ------------------------------------- incremental near-dup screening
def test_neardup_against_index_screens_and_extends(spark):
    """A batch doc sharing a band signature with the index is dropped;
    a novel doc survives and its signatures extend the index."""
    from gem_data_wrangle_spark.operators.dedup import (
        minhash_signatures,
        neardup_against_index,
    )

    hist = spark.createDataFrame(
        [(2, "the quick brown fox jumps over the lazy dog")],
        "doc_id bigint, text string",
    )
    batch = spark.createDataFrame(
        [(3, "the quick brown fox jumps over the lazy dog"),   # exact copy
         (5, "completely unrelated novel content about spark engines")],
        "doc_id bigint, text string",
    )
    index = minhash_signatures(hist, "text", "doc_id")
    fresh, updated = neardup_against_index(batch, index, "text", "doc_id")
    assert [r["doc_id"] for r in fresh.collect()] == [5]
    # 1 historical + 1 surviving doc, 4 bands each
    assert updated.count() == 8
    assert sorted({r["doc_id"] for r in updated.collect()}) == [2, 5]


def test_neardup_against_index_none_bootstraps(spark):
    """index_sigs=None: everything survives and the returned index IS
    the batch's signature table (the snapshot-0 bootstrap)."""
    from gem_data_wrangle_spark.operators.dedup import neardup_against_index

    batch = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        "doc_id bigint, text string",
    )
    fresh, index = neardup_against_index(batch, None, "text", "doc_id")
    assert fresh.count() == 2
    assert index.count() == 8
    assert set(index.columns) == {"doc_id", "band", "signature"}


def test_neardup_against_index_validates_index_shape(spark):
    from gem_data_wrangle_spark.operators.dedup import neardup_against_index

    batch = spark.createDataFrame([(1, "x y z")], "doc_id bigint, text string")
    bad = spark.createDataFrame([(1, 0)], "doc_id bigint, band int")
    with pytest.raises(ValueError, match="signature"):
        neardup_against_index(batch, bad, "text", "doc_id")


# --------------------------------- incremental Hamming screening
def test_hamming_against_index_exact_screen(spark):
    """Band candidates + exact verify: a batch signature within the
    distance bound of ANY index row is dropped; near-misses (distance
    just above the bound) survive — the false-positive class the
    verify exists to remove."""
    from gem_data_wrangle_spark.operators.dedup import hamming_against_index

    idx = spark.createDataFrame(
        [(2, 0b1111, 0b0000)], "id bigint, hi bigint, lo bigint"
    )
    batch = spark.createDataFrame(
        [(11, 0b1110, 0b0000),   # distance 1 -> screened
         (13, 0b1111, 0b0111),   # distance 3 (> 2) but shares the hi
                                  # band -> candidate, verify kills it
         (15, 0b0000, 0b1111)],  # distance 8 -> survives
        "id bigint, hi bigint, lo bigint",
    )
    fresh, updated = hamming_against_index(
        batch, idx, "id", ["hi", "lo"], chunk_bits=4, max_distance=2
    )
    assert sorted(r["id"] for r in fresh.collect()) == [13, 15]
    assert sorted(r["id"] for r in updated.collect()) == [2, 13, 15]


def test_hamming_against_index_bootstrap_and_validation(spark):
    from gem_data_wrangle_spark.operators.dedup import hamming_against_index

    batch = spark.createDataFrame(
        [(1, 3, 0)], "id bigint, hi bigint, lo bigint"
    )
    fresh, index = hamming_against_index(batch, None, "id", ["hi", "lo"])
    assert fresh.count() == 1 and index.columns == ["id", "hi", "lo"]
    bad = spark.createDataFrame([(1, 0)], "id bigint, hi bigint")
    with pytest.raises(ValueError, match="lo"):
        hamming_against_index(batch, bad, "id", ["hi", "lo"])


def test_hamming_against_index_pigeonhole_no_false_negatives(spark):
    """Flipping exactly max_distance bits spread across bands must
    still screen (pigeonhole: one band stays untouched)."""
    from gem_data_wrangle_spark.operators.dedup import hamming_against_index

    idx = spark.createDataFrame(
        [(0, (1 << 32) - 1, 0)], "id bigint, hi bigint, lo bigint"
    )
    # flip the lowest bit of each chunk: distance 2 == max_distance
    batch = spark.createDataFrame(
        [(9, (1 << 32) - 2, 1)], "id bigint, hi bigint, lo bigint"
    )
    fresh, _ = hamming_against_index(
        batch, idx, "id", ["hi", "lo"], chunk_bits=32, max_distance=2
    )
    assert fresh.count() == 0


# ------------------------------------------------ fwf tmp-dir cleanup
def test_fwf_roundtrip_query_registers_atexit_cleanup(spark, tmp_path):
    """The graded fwf round-trip query keys its /tmp spill by (sf_dir,
    pid) and must register an atexit rmtree so repeated driver/bench
    invocations stop accumulating orphaned directories (ADVICE r12).
    Asserted structurally: the registered source names atexit.register
    with shutil.rmtree on the pid-keyed path."""
    import inspect

    import __spark_entry__ as entry

    src = inspect.getsource(entry._QUERIES["fwf_roundtrip_orders"])
    assert "atexit.register(shutil.rmtree" in src


# ------------------------------- incremental embedding screening
def test_embedding_against_index_screens_and_extends(spark):
    """Bucket candidates + exact cosine verify: a batch vector
    cosine-similar to an index vector drops; an anti-aligned one
    survives; zero vectors never match (cosine undefined)."""
    from gem_data_wrangle_spark.operators.similarity import (
        embedding_against_index,
    )

    planes = [[1.0, 0.0], [0.0, 1.0]]
    idx = spark.createDataFrame(
        [(2, [1.0, 1.0])], "vec_id bigint, embedding array<double>"
    )
    batch = spark.createDataFrame(
        [(11, [2.0, 2.0]),     # cosine 1.0 with index -> screened
         (13, [-1.0, -1.0]),   # different bucket -> survives
         (15, [0.0, 0.0])],    # zero norm -> never matches
        "vec_id bigint, embedding array<double>",
    )
    fresh, updated = embedding_against_index(
        batch, idx, "embedding", "vec_id", planes, threshold=0.4
    )
    assert sorted(r["vec_id"] for r in fresh.collect()) == [13, 15]
    assert sorted(r["vec_id"] for r in updated.collect()) == [2, 13, 15]


def test_embedding_against_index_bootstrap_and_validation(spark):
    from gem_data_wrangle_spark.operators.similarity import (
        embedding_against_index,
    )

    batch = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id bigint, embedding array<double>"
    )
    fresh, index = embedding_against_index(
        batch, None, "embedding", "vec_id", [[1.0, 0.0]]
    )
    assert fresh.count() == 1 and index.columns == ["vec_id", "embedding"]
    bad = spark.createDataFrame([(1,)], "vec_id bigint")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="embedding"):
        embedding_against_index(batch, bad, "embedding", "vec_id", [[1.0]])


def test_embedding_against_index_same_bucket_below_threshold_survives(spark):
    """The false-positive class the verify removes: same bucket (both
    positive quadrant) but cosine below threshold."""
    from gem_data_wrangle_spark.operators.similarity import (
        embedding_against_index,
    )

    planes = [[1.0, 0.0], [0.0, 1.0]]
    idx = spark.createDataFrame(
        [(2, [10.0, 0.1])], "vec_id bigint, embedding array<double>"
    )
    batch = spark.createDataFrame(
        [(11, [0.1, 10.0])], "vec_id bigint, embedding array<double>"
    )
    fresh, _ = embedding_against_index(
        batch, idx, "embedding", "vec_id", planes, threshold=0.4
    )
    assert fresh.count() == 1
