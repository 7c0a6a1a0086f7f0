"""Property tests on the kernels (SURVEY §5): ownership shares sum to
1 per row (equal-share variant), Σ allocated ≤ capacity, year
expansion always yields exactly 28 rows/unit, aggregation invariant
under repartitioning."""

import math

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# whole-file slow tier: ~176 s of property sweeps (r17 fast-tier split)
pytestmark = pytest.mark.slow

from gem_data_wrangle_spark.operators import kernels as K

_company = st.text(
    alphabet="abcdefghij XYZ", min_size=1, max_size=12
).map(str.strip).filter(lambda s: s and "[" not in s)

_owner_part = st.tuples(
    _company, st.one_of(st.none(), st.integers(min_value=1, max_value=100))
).map(lambda t: f"{t[0]} [{t[1]}%]" if t[1] is not None else t[0])

_owner_cell = st.lists(_owner_part, min_size=1, max_size=4).map("; ".join)

_rows = st.lists(
    st.tuples(_owner_cell, st.integers(min_value=1, max_value=2000)),
    min_size=1,
    max_size=8,
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(rows=_rows)
@_SETTINGS
def test_equal_share_rows_sum_to_one(spark, rows):
    df = spark.createDataFrame(
        [(i, o, float(c)) for i, (o, c) in enumerate(rows)],
        "unit int, Owner string, cap double",
    )
    out = K.split_ownership(df, "Owner", "cap", equal_share=True)
    # a row whose owners ALL lack percents must split to exactly 1.0;
    # rows with explicit percents keep whatever the data says
    all_defaulted = [
        i for i, (o, _) in enumerate(rows) if "[" not in o
    ]
    sums = dict(
        out.groupBy("unit").agg(F.sum("ownership_share").alias("s")).collect()
    )
    for i in all_defaulted:
        assert math.isclose(sums[i], 1.0, rel_tol=1e-9)


@given(rows=_rows)
@_SETTINGS
def test_strict_allocation_never_exceeds_capacity_when_shares_valid(spark, rows):
    df = spark.createDataFrame(
        [(i, o, float(c)) for i, (o, c) in enumerate(rows)],
        "unit int, Owner string, cap double",
    )
    out = K.split_ownership(df, "Owner", "cap", equal_share=False)
    got = (
        out.groupBy("unit")
        .agg(
            F.coalesce(F.sum("capacity_allocated"), F.lit(0.0)).alias("alloc"),
            F.coalesce(F.sum("ownership_share"), F.lit(0.0)).alias("shares"),
            F.first("cap").alias("cap"),
        )
        .collect()
    )
    for r in got:
        # whenever the data's shares sum to ≤ 1 (the well-formed case),
        # allocated capacity cannot exceed the unit capacity
        if r["shares"] <= 1.0 + 1e-9:
            assert r["alloc"] <= r["cap"] * (1.0 + 1e-9)


@given(
    start=st.integers(min_value=1950, max_value=2060),
    retire=st.one_of(st.none(), st.integers(min_value=1950, max_value=2060)),
)
@_SETTINGS
def test_expansion_always_28_rows_and_bounded(spark, start, retire):
    df = spark.createDataFrame(
        [("u", str(start), str(retire) if retire else None, 100.0)],
        "unit string, start string, ret string, capacity_allocated double",
    )
    rows = K.expand_years(df, "start", "ret").collect()
    assert len(rows) == 28
    years = sorted(r["production_year"] for r in rows)
    assert years == list(range(2023, 2051))
    for r in rows:
        assert r["capacity"] in (0.0, 100.0)
        if r["production_year"] < start:
            assert r["capacity"] == 0.0
        if retire is not None and retire <= 2050 and r["production_year"] >= retire:
            assert r["capacity"] == 0.0


@given(parts=st.integers(min_value=1, max_value=13))
@_SETTINGS
def test_aggregation_invariant_under_repartitioning(spark, parts, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").repartition(parts)
    got = {
        r["l_returnflag"]: (r["n"], round(r["s"], 2))
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s"))
        .collect()
    }
    expected = {"A": None, "N": None, "R": None}
    assert set(got) == set(expected)
    # stable across partitionings: rerun with a different layout
    li2 = spark.read.parquet(f"{sf_dir}/lineitem.parquet").repartition(parts + 3)
    got2 = {
        r["l_returnflag"]: (r["n"], round(r["s"], 2))
        for r in li2.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s"))
        .collect()
    }
    assert got == got2


def test_skew_safe_equals_window_across_partitionings(spark, sf_dir):
    """VERDICT r4 item 7: the skew_safe two-phase formulations must be
    layout-independent — window-vs-skew_safe equality holds under
    repartition(1|7|32), locking the partial-agg path against
    partition-layout sensitivity."""
    from gem_data_wrangle_spark.operators import aggregates as A

    base = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    order = [c for c in base.columns if c != "l_orderkey"]
    expect_w = None
    expect_d = None
    for parts in (1, 7, 32):
        li = base.repartition(parts)
        w = sorted(
            tuple(r) for r in A.window_count_share(li, ["l_orderkey"]).collect()
        )
        s = sorted(
            tuple(r)
            for r in A.window_count_share(
                li, ["l_orderkey"], skew_safe=True
            ).collect()
        )
        assert w == s
        dw = sorted(
            tuple(r)
            for r in A.dedup_first_per_key(li, ["l_orderkey"], order).collect()
        )
        ds = sorted(
            tuple(r)
            for r in A.dedup_first_per_key(
                li, ["l_orderkey"], order, skew_safe=True
            ).collect()
        )
        assert dw == ds
        if expect_w is None:
            expect_w, expect_d = w, dw
        else:
            assert w == expect_w and dw == expect_d


@given(
    name=_company,
    pct=st.one_of(
        st.integers(min_value=0, max_value=100),
        st.decimals(min_value=0, max_value=100, places=1),
    ),
)
@_SETTINGS
def test_owner_pct_roundtrip(spark, name, pct):
    """The owner-cell grammar round-trips: 'Name [P%]' parses back to
    (Name, P/100) for integer and one-decimal percents."""
    cell = f"{name} [{pct}%]"
    df = spark.createDataFrame([(cell,)], "Owner string")
    from gem_data_wrangle_spark.functions import strings as S

    row = df.select(
        S.owner_name(F.col("Owner")).alias("n"),
        S.owner_pct(F.col("Owner")).alias("p"),
        S.strip_pct_suffix(F.col("Owner")).alias("stripped"),
    ).collect()[0]
    assert row["n"] == name.strip()
    assert abs(row["p"] - float(pct) / 100) < 1e-12
    assert row["stripped"] == name


_doc_text = st.lists(
    st.text(alphabet="abcXYZ019,.!", min_size=1, max_size=6),
    min_size=1, max_size=60,
).map(" ".join)


@given(
    texts=st.lists(_doc_text, min_size=1, max_size=6),
    size=st.integers(min_value=2, max_value=12),
    overlap=st.integers(min_value=0, max_value=6),
)
@_SETTINGS
def test_chunking_reconstructs_documents(spark, texts, size, overlap):
    """Dropping each non-initial chunk's first `overlap` tokens and
    concatenating in chunk order must reproduce the document exactly —
    the lossless-coverage contract of overlapping windows."""
    from gem_data_wrangle_spark.operators.textops import chunk_documents

    if overlap >= size:
        overlap = size - 1
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id int, text string")
    chunks = chunk_documents(df, "text", "doc_id", size=size, overlap=overlap).collect()
    by_doc = {}
    for r in sorted(chunks, key=lambda r: (r.doc_id, r.chunk_id)):
        toks = r.chunk_text.split(" ") if r.chunk_text else []
        cur = by_doc.setdefault(r.doc_id, [])
        cur.extend(toks if r.chunk_id == 0 else toks[overlap:])
    for i, text in enumerate(texts):
        assert by_doc[i] == text.split(" ")


@given(texts=st.lists(st.text(alphabet="aB c,.!?9", max_size=30), min_size=1, max_size=8))
@_SETTINGS
def test_canonicalize_idempotent(spark, texts):
    from gem_data_wrangle_spark.operators.dedup import canonicalize_text

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, t string")
    out = df.select(
        canonicalize_text(F.col("t")).alias("once"),
        canonicalize_text(canonicalize_text(F.col("t"))).alias("twice"),
    ).collect()
    for r in out:
        assert r.once == r.twice


_doc_words = st.lists(
    st.sampled_from(["lorem", "ipsum", "dolor", "sit", "amet", "x1", "x2", "x3"]),
    min_size=0,
    max_size=40,
).map(" ".join)


@given(
    texts=st.lists(_doc_words, min_size=2, max_size=6),
    k=st.sampled_from([8, 12, 16]),
)
@_SETTINGS
def test_duplicate_spans_are_disjoint_sorted_in_bounds(spark, texts, k):
    """Structural invariants for ANY corpus: spans are 1-based,
    disjoint with at least one uncovered character between them
    (contiguous window coverage merges, so consecutive spans obey
    s2 > e1 + 1), at least k long, and end within the document."""
    from gem_data_wrangle_spark.operators.dedup import duplicate_spans

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    spans = duplicate_spans(
        df, "text", "doc_id", k=k, sample_prefix=""
    ).collect()
    lens = dict(enumerate(len(t) for t in texts))
    per_doc: dict = {}
    for r in spans:
        per_doc.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    for did, sp in per_doc.items():
        sp.sort()
        for s, e in sp:
            assert 1 <= s <= e <= lens[did]
            assert e - s + 1 >= k
        for (s1, e1), (s2, e2) in zip(sp, sp[1:]):
            assert s2 > e1 + 1  # disjoint, with a real gap between


@given(texts=st.lists(_doc_words, min_size=2, max_size=6))
@_SETTINGS
def test_iterated_span_cut_converges(spark, texts):
    """The honest convergence contract: a single pass is NOT always
    idempotent — cut seams can mint new shared k-grams (hypothesis
    found such corpora; documented in cut_duplicate_spans) — but each
    pass strictly shrinks total corpus text, so iterating detect→cut
    reaches a span-free fixpoint in finitely many passes.
    (sample_prefix='' = every k-gram fingerprinted, the strictest
    setting.)"""
    from gem_data_wrangle_spark.operators.dedup import (
        cut_duplicate_spans,
        duplicate_spans,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    prev_total = sum(len(t) for t in texts)
    for _ in range(8):  # generous bound; total length strictly decreases
        spans = duplicate_spans(df, "text", "doc_id", k=8, sample_prefix="")
        if spans.count() == 0:
            break
        df = cut_duplicate_spans(df, spans, "text", "doc_id").select(
            "doc_id", F.col("text_clean").alias("text")
        )
        total = sum(len(r["text"]) for r in df.collect())
        assert total < prev_total  # every pass removes >= k chars
        prev_total = total
    else:
        raise AssertionError("span cutting did not converge in 8 passes")


def test_weighted_sample_partition_layout_invariant(spark):
    from gem_data_wrangle_spark.operators.sampling import weighted_sample

    df = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).cast("int").alias("w")
    )
    a = {r.doc_id for r in weighted_sample(df, "doc_id", "w", 97).collect()}
    b = {r.doc_id for r in weighted_sample(df.repartition(13), "doc_id", "w", 97).collect()}
    assert a == b and a


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    urls=st.lists(
        st.from_regex(
            r"(https?|HTTPS?)://[A-Za-z0-9.]{1,12}(:(80|443|8080))?"
            r"(/[A-Za-z0-9/._-]{0,12})?"
            r"(\?([a-z]{1,6}=[A-Za-z0-9]{0,4}&?|utm_[a-z]{1,5}=[a-z]{0,3}&?){0,4})?"
            r"(#[A-Za-z0-9]{0,6})?",
            fullmatch=True,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_canonical_url_is_idempotent(spark, urls):
    """canonical(canonical(u)) == canonical(u): the canonical form is
    a fixpoint — re-canonicalizing an already-deduped URL table must
    never re-split groups."""
    from gem_data_wrangle_spark.operators.textops import canonical_url

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i int, url string"
    )
    once = df.select("i", canonical_url("url").alias("c1"))
    twice = once.select("i", "c1", canonical_url("c1").alias("c2")).collect()
    for r in twice:
        assert r["c1"] == r["c2"], (r["c1"], r["c2"])


def test_c4_filters_is_idempotent_on_its_own_output(spark):
    """Every line c4 keeps satisfies the line predicate, so running
    the filter on text_clean keeps everything: n_kept == n_lines and
    text_clean is unchanged (for non-empty outputs)."""
    from gem_data_wrangle_spark.operators.textops import c4_filters

    good = "This line is a perfectly fine sentence."
    docs = spark.createDataFrame(
        [
            (0, f"{good}\nshort.\n{good}\nEnable JavaScript now please."),
            (1, f"{good}\n{good}"),
            (2, "nothing survives here"),
        ],
        "doc_id bigint, text string",
    )
    once = c4_filters(docs, "text", "doc_id").select(
        "doc_id", F.col("text_clean").alias("text")
    )
    again = {
        r["doc_id"]: r
        for r in c4_filters(once, "text", "doc_id").collect()
    }
    first = {r["doc_id"]: r for r in c4_filters(docs, "text", "doc_id").collect()}
    for did, r in first.items():
        if r["text_clean"]:
            assert again[did]["text_clean"] == r["text_clean"]
            assert again[did]["n_kept"] == again[did]["n_lines"]


_rle_texts = st.lists(
    st.text(alphabet="abc XY\n.é", min_size=0, max_size=40),
    min_size=1,
    max_size=10,
)


@given(texts=_rle_texts)
@_SETTINGS
def test_rle_run_signals_match_groupby_reference(spark, texts):
    """Property (round 13): n_runs equals the itertools.groupby run
    count, rle_ppm equals the exact integer floor, and the NULL band
    (empty text) never divides by zero. BMP alphabet on purpose —
    the documented engine contract is code-unit == codepoint there."""
    import itertools

    from gem_data_wrangle_spark.operators.textops import rle_run_signals

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_chars"], r["n_runs"], r["rle_ppm"])
        for r in rle_run_signals(df, "text", "doc_id").collect()
    }
    for i, t in enumerate(texts):
        if t == "":
            assert got[i] == (None, None, None)
            continue
        runs = sum(1 for _ in itertools.groupby(t))
        assert got[i] == (len(t), runs, 2 * runs * 1_000_000 // len(t))


_sig_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=255),   # hi chunk (8 bits used)
        st.integers(min_value=0, max_value=255),   # lo chunk
    ),
    min_size=1,
    max_size=12,
)


@given(idx_rows=_sig_rows, batch_rows=_sig_rows,
       d=st.integers(min_value=0, max_value=5))
@_SETTINGS
def test_hamming_against_index_matches_bruteforce(spark, idx_rows, batch_rows, d):
    """Property (round 13): the banded screen equals the brute-force
    reference — every batch row within Hamming distance d of ANY index
    row is dropped, everything else survives, for random signatures
    and thresholds. Exercises pigeonhole banding (no false negatives)
    and the bit_count verify (no false positives) together."""
    from gem_data_wrangle_spark.operators.dedup import hamming_against_index

    idx = spark.createDataFrame(
        [(i, hi, lo) for i, (hi, lo) in enumerate(idx_rows)],
        "id long, hi long, lo long",
    )
    batch = spark.createDataFrame(
        [(100 + i, hi, lo) for i, (hi, lo) in enumerate(batch_rows)],
        "id long, hi long, lo long",
    )
    fresh, updated = hamming_against_index(
        batch, idx, "id", ["hi", "lo"], chunk_bits=8, max_distance=d
    )
    expect_survive = {
        100 + i
        for i, (bh, bl) in enumerate(batch_rows)
        if all(
            bin(bh ^ ih).count("1") + bin(bl ^ il).count("1") > d
            for ih, il in idx_rows
        )
    }
    assert {r["id"] for r in fresh.collect()} == expect_survive
    assert updated.count() == len(idx_rows) + len(expect_survive)


_doc_text = st.one_of(
    st.none(),
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
        min_size=0, max_size=8,
    ).map(" ".join),
)
_doc_lists = st.lists(_doc_text, min_size=1, max_size=8)


def _py_band_sigs(text):
    """Independent pure-Python replica of minhash_signatures' contract:
    distinct word bigrams, hash i = md5('{i}|'+shingle), band sig =
    concat of 4 min-hashes; empty/NULL shingle sets -> None."""
    import hashlib

    if text is None:
        return None
    toks = text.split(" ")
    sh = list(dict.fromkeys(
        toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)
    ))
    if not sh:
        return None
    return {
        (band, "".join(
            min(hashlib.md5((f"{band * 4 + r}|" + s).encode()).hexdigest()
                for s in sh)
            for r in range(4)
        ))
        for band in range(4)
    }


@given(idx_texts=_doc_lists, batch_texts=_doc_lists)
@_SETTINGS
def test_neardup_against_index_matches_bruteforce(spark, idx_texts, batch_texts):
    """Property (round 13): the incremental screen equals a pure-Python
    minhash reference — a batch doc drops iff it shares ANY band
    signature with the index, and shingle-less docs (empty, single
    token, NULL text) never match anything (NULL signatures)."""
    from gem_data_wrangle_spark.operators.dedup import (
        minhash_signatures,
        neardup_against_index,
    )

    idx_df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(idx_texts)], "doc_id long, text string"
    )
    batch_df = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(batch_texts)],
        "doc_id long, text string",
    )
    index = minhash_signatures(idx_df, "text", "doc_id")
    fresh, updated = neardup_against_index(batch_df, index, "text", "doc_id")

    idx_sigs = set()
    for t in idx_texts:
        idx_sigs |= (_py_band_sigs(t) or set())
    expect_survive = {
        100 + i
        for i, t in enumerate(batch_texts)
        if not ((_py_band_sigs(t) or set()) & idx_sigs)
    }
    assert {r["doc_id"] for r in fresh.collect()} == expect_survive
    assert updated.count() == 4 * len(idx_texts) + 4 * len(expect_survive)


# ---------------------------------------------------------------------------
# round 14: the embedding incremental screen vs a pure-Python sign-LSH
# reference — the embedding mirror of the round-13 minhash property
# test above. Integer-valued coordinates keep every dot product exact
# in float64, and the reference folds sums sequentially exactly like
# F.aggregate(zip_with(...)), so screen decisions are bit-comparable.
# ---------------------------------------------------------------------------
_vec3 = st.lists(
    st.integers(min_value=-3, max_value=3).map(float), min_size=3, max_size=3
)


def _py_bucket(v, table):
    return "".join(
        "1" if sum(a * b for a, b in zip(v, plane)) > 0 else "0"
        for plane in table
    )


def _py_screened(batch, index, tables, threshold):
    """ids of batch vectors that collide with a true cosine-match in
    ANY table; zero-norm vectors never match either side."""
    import math

    out = set()
    for bid, bv in batch:
        bn = math.sqrt(sum(x * x for x in bv))
        if bn == 0:
            continue
        for _iid, iv in index:
            inn = math.sqrt(sum(x * x for x in iv))
            if inn == 0:
                continue
            cos = sum(a * b for a, b in zip(bv, iv)) / (bn * inn)
            if cos >= threshold and any(
                _py_bucket(bv, t) == _py_bucket(iv, t) for t in tables
            ):
                out.add(bid)
                break
    return out


@given(
    idx_vecs=st.lists(_vec3, min_size=1, max_size=5),
    batch_vecs=st.lists(_vec3, min_size=1, max_size=5),
    n_tables=st.integers(min_value=1, max_value=3),
)
@_SETTINGS
def test_embedding_against_index_matches_bruteforce(
    spark, idx_vecs, batch_vecs, n_tables
):
    from gem_data_wrangle_spark.operators import similarity as V

    tables = [
        V.hyperplanes(4, 3, seed=V._LSH_SEED + 31 * t) for t in range(n_tables)
    ]
    planes = tables[0] if n_tables == 1 else tables
    idx_rows = [(i, v) for i, v in enumerate(idx_vecs)]
    batch_rows = [(100 + i, v) for i, v in enumerate(batch_vecs)]
    idx_df = spark.createDataFrame(
        idx_rows, "vec_id long, embedding array<double>"
    )
    batch_df = spark.createDataFrame(
        batch_rows, "vec_id long, embedding array<double>"
    )

    expect_gone = _py_screened(batch_rows, idx_rows, tables, 0.4)

    fresh_raw, _ = V.embedding_against_index(
        batch_df, idx_df, "embedding", "vec_id", planes, threshold=0.4
    )
    assert {100 + i for i in range(len(batch_vecs))} - {
        r["vec_id"] for r in fresh_raw.collect()
    } == expect_gone

    # the persisted-signature index path must decide identically
    sig = V.embedding_index_signatures(idx_df, "embedding", "vec_id", planes)
    fresh_sig, upd_sig = V.embedding_against_index(
        batch_df, sig, "embedding", "vec_id", planes, threshold=0.4
    )
    assert {r["vec_id"] for r in fresh_sig.collect()} == {
        r["vec_id"] for r in fresh_raw.collect()
    }
    # signature-shaped updated index: index rows + one row per
    # surviving batch vector per table
    n_survive = len(batch_vecs) - len(expect_gone)
    assert upd_sig.count() == n_tables * (len(idx_vecs) + n_survive)
