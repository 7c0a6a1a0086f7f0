"""Differential fuzz: Spark query vs DuckDB oracle on GENERATED
corpora (round 5).

The driver's correctness gate runs each oracle pair on one fixed
dataset — a rounding tie or dialect edge that the fixed data happens
to miss stays latent until an environment shift surfaces it as an
opaque hash mismatch. These tests replay the same fingerprint compare
(`tools/check_parity.py`) over seeded adversarial corpora for the
round-5 queries: newline-heavy texts with duplicated lines, cross-doc
copy-pasted spans, single-token/empty/unicode documents, and small
integer ratios that stress the 4-dp rounding agreement.
"""

from __future__ import annotations

import random
import sys

import duckdb
import pytest

# whole-file slow tier: ~825 s of fuzz sweeps (r17 fast-tier split)
pytestmark = pytest.mark.slow

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from check_parity import frame_fingerprint  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def _corpus(seed: int) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff", "gg"]
    span = " ".join(rng.choice(vocab) for _ in range(30))
    docs = []
    for i in range(40):
        n_lines = rng.randint(1, 6)
        lines = []
        for _ in range(n_lines):
            words = [rng.choice(vocab) for _ in range(rng.randint(1, 12))]
            lines.append(" ".join(words))
        # force duplicate lines and cross-doc shared spans on a subset
        if i % 3 == 0 and lines:
            lines.append(lines[0])
        text = "\n".join(lines)
        if i % 5 == 0:
            text = text + " " + span
        docs.append((i, text))
    docs.append((100, ""))            # empty text
    docs.append((101, "solo"))        # single token, no bigram
    docs.append((102, "é 日本語 é\né 日本語 é"))  # unicode, duplicated line
    return docs


def _compare(spark, tmp_path, docs, qname):
    p = str(tmp_path / "documents.parquet")
    spark.createDataFrame(docs, "doc_id bigint, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; DuckDB needs the part glob
    con.sql(f"CREATE VIEW documents AS FROM '{p}/*.parquet'")
    # driver-faithful compare (round 9): both engines through pandas
    # at full precision, same as tools/check_parity.py and the driver
    sdf = entrymod.queries()[qname](spark, str(tmp_path))
    sn, sc, sl, _sd = frame_fingerprint(sdf.toPandas())
    dn, dc, dl, _dd = frame_fingerprint(con.sql(entrymod.oracle_sql()[qname]).df())
    assert sn == dn, f"{qname}: row count {sn} vs {dn}"
    assert sc == dc, f"{qname}: columns {sc} vs {dc}"
    mism = [i for i, (a, b) in enumerate(zip(sl, dl)) if a != b]
    assert not mism, (
        f"{qname}: {len(mism)} value rows differ; first: "
        f"spark={sl[mism[0]]!r} duckdb={dl[mism[0]]!r}"
    )


@pytest.mark.parametrize("seed", [7, 19, 23])
def test_repetition_signals_matches_oracle_on_fuzzed_corpora(
    spark, tmp_path, seed
):
    _compare(spark, tmp_path, _corpus(seed), "repetition_signals")


@pytest.mark.parametrize("seed", [7, 19, 23])
def test_shared_substring_pairs_matches_oracle_on_fuzzed_corpora(
    spark, tmp_path, seed
):
    _compare(spark, tmp_path, _corpus(seed), "shared_substring_pairs")


@pytest.mark.parametrize("seed", [7, 19, 23])
def test_dedup_lines_matches_oracle_on_fuzzed_corpora(spark, tmp_path, seed):
    """Round 6: first-occurrence line dedup — the fuzz corpus's forced
    duplicate lines and cross-doc spans are exactly its hot path; the
    oracle's row_number-window formulation must agree with the
    operator's min-struct aggregate on every corpus."""
    _compare(spark, tmp_path, _corpus(seed), "dedup_lines")


@pytest.mark.parametrize("seed", [7, 19, 23])
@pytest.mark.parametrize("qname", ["duplicate_spans", "cut_duplicate_spans"])
def test_span_dedup_matches_oracle_on_fuzzed_corpora(
    spark, tmp_path, qname, seed
):
    """Round 6: the span-merge window algebra and the gap/segment cut
    reassembly replayed against DuckDB on corpora with cross-doc
    copy-pasted spans, duplicated lines, empty/unicode docs — the
    adversarial shapes for offset arithmetic (multi-byte chars stress
    the char-vs-byte substring agreement between engines)."""
    _compare(spark, tmp_path, _corpus(seed), qname)


def _c4_corpus(seed: int) -> list[tuple[int, str]]:
    """Corpus shaped for the C4 rules: line endings across every
    terminal/non-terminal punctuation case (incl. the unicode close
    quote), drop phrases in mixed case, braces, and 1-3-word lines
    that straddle the min-words boundary."""
    rng = random.Random(seed)
    enders = [".", "!", "?", '"', "”", "", " ", ":", ". "]
    tails = [
        "", "JavaScript required", "see our Cookie Policy",
        "Lorem Ipsum dolor", "x { y }", "Privacy Policy notice",
        "this site uses cookies",
    ]
    docs = []
    for i in range(40):
        lines = []
        for _ in range(rng.randint(1, 8)):
            words = " ".join(
                rng.choice(["alpha", "beta", "gamma", "é日本"])
                for _ in range(rng.randint(1, 5))
            )
            tail = rng.choice(tails)
            lines.append((words + (" " + tail if tail else "")) + rng.choice(enders))
        docs.append((i, "\n".join(lines)))
    docs.append((100, ""))
    docs.append((101, "One two three."))
    docs.append((102, "  leading spaces still count words.  "))
    return docs


@pytest.mark.parametrize("seed", [7, 19, 23])
def test_c4_filters_matches_oracle_on_fuzzed_corpora(spark, tmp_path, seed):
    """Round 6: the C4 line predicate (terminal punct + min words +
    drop phrases) and doc flags replayed against the DuckDB
    list_filter oracle on boundary-straddling corpora."""
    _compare(spark, tmp_path, _c4_corpus(seed), "c4_filters")


@pytest.mark.parametrize(
    "qname",
    [
        "gopher_quality_flags", "tfidf_top_terms", "token_counts",
        "text_quality", "corpus_shuffle", "warc_html_extract",
    ],
)
def test_text_queries_match_oracles_on_fuzzed_corpus(spark, tmp_path, qname):
    """One adversarial corpus across the other documents-table text
    queries. This run found the round-5 gopher empty-document ANSI
    division crash (x/0 raises in Spark, NULLs in DuckDB) — the empty
    doc stays in the corpus as the regression guard."""
    _compare(spark, tmp_path, _corpus(7), qname)

@pytest.mark.parametrize("seed", [7, 19, 23])
def test_unigram_logprob_matches_oracle_on_fuzzed_corpora(
    spark, tmp_path, seed
):
    """Round 6: the unigram-LM mean log-prob — empty docs (the ''
    token), single-token docs, and unicode stress the smoothing
    constant and the double-rounded 4-dp agreement between Spark's
    partial-agg avg and DuckDB's sequential avg."""
    _compare(spark, tmp_path, _corpus(seed), "unigram_logprob")


def _bm25_corpus(seed: int) -> list[tuple[int, str]]:
    """The fuzz corpus with the graded query's BM25 terms mixed into a
    random subset of documents (otherwise no posting survives the
    term filter and the test degenerates to 0-row agreement)."""
    rng = random.Random(seed + 1)
    out = []
    for i, t in _corpus(seed):
        extra = " ".join(
            rng.choice(["customer", "join", "vector", "zz"])
            for _ in range(rng.randint(0, 6))
        )
        out.append((i, (t + " " + extra).strip() if extra else t))
    return out


@pytest.mark.parametrize("seed", [7, 19, 23])
def test_bm25_matches_oracle_on_fuzzed_corpora(spark, tmp_path, seed):
    """Round 6: BM25's idf/saturation/length-normalization algebra —
    skewed doc lengths and term multiplicities from the fuzz corpus
    stress the 4-dp ln() agreement across engines."""
    _compare(spark, tmp_path, _bm25_corpus(seed), "bm25_rank")


@pytest.mark.parametrize("seed", [7, 19, 23])
def test_lm_quality_cut_matches_oracle_on_fuzzed_corpora(
    spark, tmp_path, seed
):
    """Round 6: the percentile-cut >= compare — the fuzz corpora put
    duplicated texts at the quantile boundary (tied order statistics,
    the integral-position interpolation case)."""
    _compare(spark, tmp_path, _corpus(seed), "lm_quality_cut")


def _compare_named(spark, tmp_path, tables, qname):
    """Generalized differential compare for queries over tables other
    than ``documents``: ``tables`` maps view name → (rows, schema)."""
    con = duckdb.connect()
    for name, (rows, schema) in tables.items():
        p = str(tmp_path / f"{name}.parquet")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(p)
        con.sql(f"CREATE VIEW {name} AS FROM '{p}/*.parquet'")
    # driver-faithful compare (round 9): both engines through pandas
    # at full precision, same as tools/check_parity.py and the driver
    sdf = entrymod.queries()[qname](spark, str(tmp_path))
    sn, sc, sl, _sd = frame_fingerprint(sdf.toPandas())
    dn, dc, dl, _dd = frame_fingerprint(con.sql(entrymod.oracle_sql()[qname]).df())
    assert sn == dn, f"{qname}: row count {sn} vs {dn}"
    assert sc == dc, f"{qname}: columns {sc} vs {dc}"
    mism = [i for i, (a, b) in enumerate(zip(sl, dl)) if a != b]
    assert not mism, (
        f"{qname}: {len(mism)} value rows differ; first: "
        f"spark={sl[mism[0]]!r} duckdb={dl[mism[0]]!r}"
    )


def _events_rows(seed: int):
    """Adversarial event streams for RANGE-frame semantics: many
    timestamps land on EXACT 3600 s offsets (the inclusive frame
    edge), plus duplicated (user, ts) peers and sub-second jitter."""
    import datetime as dt

    rng = random.Random(seed)
    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    eid = 0
    for user in range(5):
        t = base
        for _ in range(30):
            step = rng.choice([600, 3600, 3600, 1800, 1, 3599, 3601])
            jitter = rng.choice([0, 0, 0, rng.randint(1, 999_999)])
            t = t + dt.timedelta(seconds=step, microseconds=jitter)
            val = round(rng.uniform(0, 100), 2)
            rows.append((eid, t, user, "e", val)); eid += 1
            if rng.random() < 0.2:  # same-timestamp RANGE peer
                rows.append((eid, t, user, "e", round(rng.uniform(0, 100), 2)))
                eid += 1
    return rows


@pytest.mark.parametrize("seed", [3, 11, 29])
def test_rolling_event_sums_matches_oracle_on_fuzzed_streams(
    spark, tmp_path, seed
):
    _compare_named(
        spark, tmp_path,
        {"events": (
            _events_rows(seed),
            "event_id bigint, ts timestamp_ntz, user_id bigint, "
            "event_type string, value double",
        )},
        "rolling_event_sums",
    )


@pytest.mark.parametrize("seed", [5, 13, 31])
def test_host_pagerank_matches_oracle_on_fuzzed_graphs(
    spark, tmp_path, seed
):
    """Random key sets reshape the derived edge lattice — degrees,
    dangling set, and component structure all vary; the 6-dp rounding
    agreement must hold on every graph, not just the fixed testdata."""
    rng = random.Random(seed)
    rows = [
        (rng.randint(0, 5000), rng.randint(0, 5000))
        for _ in range(rng.randint(50, 400))
    ]
    _compare_named(
        spark, tmp_path,
        {"orders": (rows, "o_orderkey bigint, o_custkey bigint")},
        "host_pagerank",
    )


@pytest.mark.parametrize("seed", [17, 37])
def test_geo_radius_join_matches_oracle_on_fuzzed_keysets(
    spark, tmp_path, seed
):
    """Random custkey subsets move the synthetic lattice points across
    all latitudes (±85° via the modulo) — the grid join must equal the
    cross-join ground truth for any occupancy pattern (the lost-pair
    bug class the round-6 fix closed)."""
    rng = random.Random(seed)
    keys = sorted(rng.sample(range(0, 4000), 300)) + list(range(0, 30))
    rows = [(k,) for k in sorted(set(keys))]
    _compare_named(
        spark, tmp_path,
        {"customer": (rows, "c_custkey bigint")},
        "geo_radius_join",
    )


@pytest.mark.parametrize("seed", [7, 19])
def test_boilerplate_removal_matches_oracle_on_fuzzed_corpora(
    spark, tmp_path, seed
):
    _compare(spark, tmp_path, _corpus(seed), "boilerplate_removal")


@pytest.mark.parametrize("seed", [7, 19, 23])
def test_exact_jaccard_pairs_matches_oracle_on_fuzzed_corpora(
    spark, tmp_path, seed
):
    """Shared spans + duplicated lines give the fuzz corpus real
    high-Jaccard pairs; empty/single-token/unicode docs exercise the
    prefix-length floor (p = n - ceil(t·n) + 1 at n=1)."""
    _compare(spark, tmp_path, _corpus(seed), "exact_jaccard_pairs")


@pytest.mark.parametrize("seed", [41, 43])
def test_heavy_hitter_keys_matches_oracle_on_fuzzed_orders(
    spark, tmp_path, seed
):
    """Random key populations move which residues clear the 0.5%%
    floor; both sides must floor the threshold identically (int()
    vs SQL floor())."""
    rng = random.Random(seed)
    rows = [
        (rng.randint(0, 100_000), rng.randint(1, 30_000))
        for _ in range(rng.randint(2_000, 6_000))
    ]
    _compare_named(
        spark, tmp_path,
        {"orders": (rows, "o_orderkey bigint, o_custkey bigint")},
        "heavy_hitter_keys",
    )


@pytest.mark.parametrize("seed", [7, 19])
def test_cosine_pairs_matches_oracle_on_fuzzed_corpora(
    spark, tmp_path, seed
):
    """Small closed vocab + duplicated lines give structured repeated
    cosines; the 4-dp double-round and the >=0.6 membership cut must
    agree across engines on every corpus."""
    _compare(spark, tmp_path, _corpus(seed), "cosine_pairs")


# ------------------------------------------------------------------
# round 7: event-family + document-family fuzz for the new operators
# ------------------------------------------------------------------

_EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, "
    "event_type string, value double"
)


def _typed_events_rows(seed: int):
    """Adversarial typed event streams for the round-7 analytics
    family: duplicated (user, ts) peers (tiebreak stress), values
    landing on exact cent boundaries (rounding stress), multi-week
    spread (cohort offsets), and per-user type sequences with
    same-timestamp funnel steps (strictly-after stress)."""
    import datetime as dt

    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)  # a Monday
    types = ["click", "view", "error", "purchase", "signup"]
    rows = []
    eid = 0
    for user in range(8):
        t = base + dt.timedelta(days=rng.randint(0, 3))
        for _ in range(40):
            t = t + dt.timedelta(
                hours=rng.choice([0, 1, 6, 24, 24 * 7]),
                seconds=rng.randint(0, 3600),
            )
            # exact 2-dp values, many on .x5 / .00 boundaries
            val = rng.choice([0.05, 1.25, 2.5, 10.0, 99.99, 0.01,
                              round(rng.uniform(0, 100), 2)])
            typ = rng.choice(types)
            rows.append((eid, t, user, typ, val)); eid += 1
            if rng.random() < 0.25:  # same-ts peer, maybe same type
                rows.append((eid, t, user, rng.choice(types), val))
                eid += 1
    return rows


@pytest.mark.parametrize("seed", [2, 17, 41])
@pytest.mark.parametrize("qname", [
    "event_zscores", "event_funnel", "event_transitions",
    "group_value_quantiles", "impute_median", "winsorized_values",
    "value_histogram", "pairwise_corr", "cohort_retention",
    "hll_distinct_counts", "hll_union_rollup", "zorder_keys",
])
def test_round7_event_queries_match_oracles_on_fuzzed_streams(
    spark, tmp_path, qname, seed
):
    _compare_named(
        spark, tmp_path,
        {"events": (_typed_events_rows(seed), _EVENTS_SCHEMA)},
        qname,
    )


@pytest.mark.parametrize("seed", [7, 19, 23])
@pytest.mark.parametrize("qname", [
    "char_entropy", "script_fractions", "ngram_decontaminate",
])
def test_round7_text_queries_match_oracles_on_fuzzed_corpora(
    spark, tmp_path, qname, seed
):
    _compare(spark, tmp_path, _corpus(seed), qname)


def _lineitem_rows(seed: int):
    """Adversarial lineitems for grouping-set/checksum canonicalization:
    quantities on exact .x5 cent boundaries, flag/status values with
    shared prefixes (injectivity stress for the length-prefix row
    encoding), and duplicate full rows (the checksum must count them)."""
    rng = random.Random(seed)
    rows = []
    for i in range(300):
        qty = rng.choice([0.05, 12.25, 49.5, 0.01, round(rng.uniform(0, 50), 2)])
        flag = rng.choice(["A", "AB", "N", ""])
        status = rng.choice(["B", "BF", "F", ""])
        rows.append((i, rng.randint(1, 4), qty, 1.0, 0.0, 0.0, flag, status))
        if rng.random() < 0.1:  # exact duplicate row
            rows.append(rows[-1])
    return rows


_LINEITEM_SCHEMA = (
    "l_orderkey bigint, l_linenumber int, l_quantity double, "
    "l_extendedprice double, l_discount double, l_tax double, "
    "l_returnflag string, l_linestatus string"
)


@pytest.mark.parametrize("seed", [3, 13, 37])
@pytest.mark.parametrize("qname", [
    "rollup_sum_groups", "cube_sum_groups", "table_checksum",
])
def test_round7_lineitem_queries_match_oracles_on_fuzzed_rows(
    spark, tmp_path, qname, seed
):
    _compare_named(
        spark, tmp_path,
        {"lineitem": (_lineitem_rows(seed), _LINEITEM_SCHEMA)},
        qname,
    )


@pytest.mark.parametrize("seed", [2, 17])
def test_salted_enrich_matches_plain_join_on_fuzzed_streams(
    spark, tmp_path, seed
):
    rng = random.Random(seed)
    cust = [(u, rng.choice(["AUTO", "BUILD", ""])) for u in range(0, 6)]
    _compare_named(
        spark, tmp_path,
        {
            "events": (_typed_events_rows(seed), _EVENTS_SCHEMA),
            "customer": (cust, "c_custkey bigint, c_mktsegment string"),
        },
        "salted_enrich",
    )


@pytest.mark.parametrize("seed", [2, 17, 41])
@pytest.mark.parametrize("qname", [
    "mad_outlier_flags", "rank_normalized_values", "ewma_event_values",
])
def test_round9_event_queries_match_oracles_on_fuzzed_streams(
    spark, tmp_path, qname, seed
):
    # the .x5/.00-boundary values stress the cents rounding; same-ts
    # peers stress the (ts, event_id) frame order and RANK tie-sharing
    _compare_named(
        spark, tmp_path,
        {"events": (_typed_events_rows(seed), _EVENTS_SCHEMA)},
        qname,
    )


@pytest.mark.parametrize("seed", [7, 19, 23])
@pytest.mark.parametrize("qname", ["simhash_pairs", "containment_screen"])
def test_round9_doc_queries_match_oracles_on_fuzzed_corpora(
    spark, tmp_path, qname, seed
):
    # the 7-token shared vocabulary makes band buckets and slot-hash
    # buckets HOT (duplicated lines, cross-doc spans, empty/solo/
    # unicode docs) — the adversarial shape for both candidate joins
    _compare(spark, tmp_path, _corpus(seed), qname)


@pytest.mark.parametrize("seed", [7, 19, 23])
@pytest.mark.parametrize("qname", [
    "rle_compression_bound", "neardup_incremental", "minhash_lsh_pairs",
])
def test_round13_doc_queries_match_oracles_on_fuzzed_corpora(
    spark, tmp_path, qname, seed
):
    # empty + single-token docs produce EMPTY shingle sets: this run
    # found the minhash '' signature bucket (Spark concat_ws and DuckDB
    # concat both skip NULLs, so every shingle-less doc shared ONE band
    # bucket — quadratic in empty-doc count at scale). Both sides now
    # emit NULL and the fuzz corpus keeps docs 100/101 as the guard.
    # rle_compression_bound adds the BMP-unicode + empty/NULL band
    # edges over the same corpus.
    _compare(spark, tmp_path, _corpus(seed), qname)


@pytest.mark.parametrize(
    "qname",
    [
        "nfc_canonical_hashes", "rolling_fingerprint", "text_fingerprint",
        "doc_readability", "lang_id", "chunk_documents",
        "normalized_dedup", "dedup_exact", "kn_doc_scores",
    ],
)
def test_round13_text_queries_match_oracles_on_fuzzed_corpus(
    spark, tmp_path, qname
):
    """Round-13 breadth pass: the documents-table queries that had no
    fuzz row yet, over the standard adversarial corpus (duplicate
    lines, cross-doc spans, empty/solo docs, and doc 102's é/日本語 —
    which makes nfc_canonical_hashes a real cross-engine NFC test:
    the injected U+0301 must recompose identically in Python
    unicodedata and DuckDB utf8proc over non-ASCII neighborhoods)."""
    _compare(spark, tmp_path, _corpus(7), qname)


@pytest.mark.parametrize("qname", ["minhash_lsh_pairs", "neardup_incremental"])
def test_round13_null_text_minhash_matches_oracle(spark, tmp_path, qname):
    """NULL text must behave like the other shingle-less docs: NULL
    band signature, never a candidate. Found by the round-13 review —
    DuckDB's len(NULL) is NULL, so the len(s)=0 guard alone fell
    through to concat's '' for NULL text while Spark null-poisoned.
    Doc 103 is the standing guard."""
    _compare(spark, tmp_path, _corpus(7) + [(103, None)], qname)
