"""BPE tokenizer: training on the Sennrich et al. (2016) worked
example, greedy encode, determinism under partitioning."""

from gem_data_wrangle_spark.operators.bpe import (
    END_OF_WORD,
    _encode_word,
    bpe_encode,
    bpe_train,
)

CORPUS = " ".join(
    ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
)


def _corpus_df(spark, n_rows=1):
    return spark.createDataFrame(
        [(i, CORPUS) for i in range(n_rows)], "doc_id bigint, text string"
    )


def test_bpe_train_sennrich_example(spark):
    """Hand-derived merge sequence for the paper's corpus (word freqs
    low:5 lower:2 newest:6 widest:3), with lexicographic tie-breaks:
    (e,s) and (s,t) and (t,</w>) all count 9 -> 'e' sorts first."""
    merges = bpe_train(_corpus_df(spark), "text", num_merges=5)
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", END_OF_WORD),
        ("l", "o"),
        ("lo", "w"),
    ]


def test_bpe_train_deterministic_under_repartition(spark):
    df = _corpus_df(spark, n_rows=8)
    a = bpe_train(df, "text", num_merges=10)
    b = bpe_train(df.repartition(7), "text", num_merges=10)
    assert a == b


def test_bpe_encode_word_greedy():
    merges = [("e", "s"), ("es", "t"), ("est", END_OF_WORD), ("l", "o"), ("lo", "w")]
    ranks = {m: i for i, m in enumerate(merges)}
    # the classic result: an UNSEEN word segments into learned subwords
    assert _encode_word("lowest", ranks) == ["low", "est" + END_OF_WORD]
    # no applicable merges -> characters + end marker
    assert _encode_word("zz", {}) == ["z", "z", END_OF_WORD]


def test_bpe_encode_dataframe(spark):
    merges = bpe_train(_corpus_df(spark), "text", num_merges=5)
    docs = spark.createDataFrame(
        [(1, "lowest newest"), (2, ""), (3, None)],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in
           bpe_encode(docs, "text", merges, "doc_id").collect()}
    assert out[1]["tokens"][:2] == ["low", "est" + END_OF_WORD]
    assert out[1]["n_tokens"] == len(out[1]["tokens"])
    # token concatenation reconstructs the text (markers = word ends)
    joined = "".join(out[1]["tokens"]).replace(END_OF_WORD, " ").strip()
    assert joined == "lowest newest"
    assert out[2]["tokens"] == [] and out[2]["n_tokens"] == 0
    assert out[3]["tokens"] == [] and out[3]["n_tokens"] == 0


def test_bpe_min_pair_count_stops_training(spark):
    df = spark.createDataFrame(
        [(1, "ab cd ef")], "doc_id bigint, text string"
    )
    # every pair occurs once -> below the floor, nothing learned
    assert bpe_train(df, "text", num_merges=10, min_pair_count=2) == []
