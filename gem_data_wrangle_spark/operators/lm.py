"""Bigram language-model scoring with interpolated Kneser-Ney
smoothing — the classic data-selection scorer one rung above the
unigram LM in ``textops.py`` (Kneser & Ney 1995; Chen & Goodman 1999
§2.7). CCNet-style pipelines cut corpora on LM perplexity; a bigram
KN model is the smallest model where SMOOTHING STRUCTURE (continuation
counts, absolute discounting) matters rather than just frequency.

Model (single discount D):

    P(w2|w1) = max(c(w1 w2) − D, 0)/c(w1•)
               + D · N1+(w1 •)/c(w1•) · Pcont(w2)
    Pcont(w2) = N1+(• w2) / |distinct bigram types|

with backoff for unseen contexts: P = Pcont(w2), and an unseen-word
floor 1/(types+1). All counts are EXACT integers from hash
aggregates.

Float discipline (the dsir-lambda precedent, CORRECTNESS-proven):
per-bigram log2 P is computed once per DISTINCT bigram by a fixed
IEEE expression, rounded to 6 dp and scaled to integer micro-units;
per-document scores then SUM EXACT INTEGERS (weighted by the doc's
bigram multiplicity) — no float summation order anywhere — and divide
once at the end.

Plan/scale: tokenization + bigram explode are narrow; the count
tables aggregate with map-side combine; the model is a |bigram types|
frame JOINED back (AQE broadcasts while it fits — at web scale it
hash-joins on w1,w2, still one shuffle); the 1-row type count
broadcasts. No driver-side model state at all — unlike kmeans/bpe,
the model here stays distributed end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_TOKEN_RE = "[a-z0-9]+"


def _doc_bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2, c_doc) per document — exact in-doc multiplicity."""
    toks = F.expr(
        f"regexp_extract_all(lower(`{text_col}`), '{_TOKEN_RE}', 0)"
    )
    pairs = F.expr(
        "transform(sequence(2, size(_toks)), "
        "i -> struct(_toks[i-2] AS w1, _toks[i-1] AS w2))"
    )
    return (
        df.select(F.col(id_col), toks.alias("_toks"))
        .filter(F.size("_toks") >= 2)
        .select(id_col, F.explode(pairs).alias("_p"))
        .select(id_col, "_p.w1", "_p.w2")
        .groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_doc"))
    )


def kn_train(
    corpus: DataFrame,
    text_col: str,
    id_col: str,
    discount: float = 0.75,
) -> tuple[DataFrame, DataFrame, int]:
    """One-pass training bundle: ``(model, cont_model, n_types)``
    sharing a single PERSISTED bigram-count frame — without the pin,
    the type-count action, the model join and the continuation join
    would each re-tokenize and re-aggregate the corpus (three full
    passes). The cache is |distinct bigram types| rows — vocab-scale
    model state, not corpus-scale — and stays for the session like
    the ``surrogate_ids`` dim. ``n_types`` is the one bounded driver
    scalar (the kmeans/bpe model boundary contract)."""
    bg = _doc_bigrams(corpus, text_col, id_col)
    counts = bg.groupBy("w1", "w2").agg(F.sum("c_doc").alias("c12")).persist()
    n_types = counts.count()
    return (
        _model_from_counts(counts, discount),
        _cont_from_counts(counts),
        n_types,
    )


def _model_from_counts(counts: DataFrame, discount: float) -> DataFrame:
    left = counts.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n1p_left")
    )
    right = counts.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_right"))
    types = counts.agg(F.count(F.lit(1)).alias("n_types"))
    d = F.lit(float(discount))
    p = (
        F.greatest(F.col("c12").cast("double") - d, F.lit(0.0))
        / F.col("c1").cast("double")
        + d
        * F.col("n1p_left").cast("double")
        / F.col("c1").cast("double")
        * (
            F.col("n1p_right").cast("double")
            / F.col("n_types").cast("double")
        )
    )
    lp_u = F.round(F.round(F.log2(p), 6) * 1000000.0, 0).cast("long")
    return (
        counts.join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(types))
        .select("w1", "w2", lp_u.alias("lp_u"))
    )


def kn_score_documents(
    docs: DataFrame,
    model: DataFrame,
    cont_model: DataFrame,
    text_col: str,
    id_col: str,
    n_types: int | None = None,
) -> DataFrame:
    """Score documents: mean per-bigram log2 probability under the
    model. ``cont_model`` is :func:`kn_continuation_model`'s output
    (per-w2 continuation log-probs, the unseen-context backoff);
    fully-unseen bigrams take the 1/(types+1) floor, passed via
    ``n_types`` (or read from the cont_model row count upstream).

    Output: ``(id, n_bigrams, logprob_total)`` — the micro-unit
    integer sum divided ONCE by 1e6 and rounded at 6 dp, which is
    exact (a 6-decimal terminating value — no rounding tie exists).
    Deliberately NOT a per-bigram mean: dividing the micro-unit sum
    by a count lands on 7+-decimal terminating values whose HALF
    ties Spark (decimal-repr HALF_UP) and C-library rounding resolve
    differently — derive ``total/n`` downstream where bit-parity no
    longer matters.
    """
    if n_types is None:
        raise ValueError("pass n_types (distinct bigram type count)")
    floor_u = int(
        round(round(__import__("math").log2(1.0 / (n_types + 1)), 6) * 1e6)
    )
    bg = _doc_bigrams(docs, text_col, id_col)
    scored = (
        bg.join(model, ["w1", "w2"], "left")
        .join(cont_model, ["w2"], "left")
        .select(
            id_col,
            "c_doc",
            F.coalesce(
                F.col("lp_u"), F.col("cont_lp_u"), F.lit(floor_u)
            ).alias("_lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("c_doc").cast("long").alias("n_bigrams"),
        F.round(
            F.sum(F.col("c_doc") * F.col("_lp")).cast("double") / 1e6, 6
        ).alias("logprob_total"),
    )


def _cont_from_counts(counts: DataFrame) -> DataFrame:
    right = counts.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_right"))
    types = counts.agg(F.count(F.lit(1)).alias("n_types"))
    lp = F.round(
        F.round(
            F.log2(
                F.col("n1p_right").cast("double")
                / F.col("n_types").cast("double")
            ),
            6,
        )
        * 1000000.0,
        0,
    ).cast("long")
    return right.crossJoin(F.broadcast(types)).select(
        "w2", lp.alias("cont_lp_u")
    )


def _counts(corpus: DataFrame, text_col: str, id_col: str) -> DataFrame:
    bg = _doc_bigrams(corpus, text_col, id_col)
    return bg.groupBy("w1", "w2").agg(F.sum("c_doc").alias("c12"))


def kn_bigram_model(
    corpus: DataFrame,
    text_col: str,
    id_col: str,
    discount: float = 0.75,
) -> DataFrame:
    """Train: one row per distinct corpus bigram ``(w1, w2, lp_u)``
    where ``lp_u`` = round(log2 P_KN(w2|w1), 6)·1e6 as long. For the
    train-and-score round trip prefer :func:`kn_train`, which shares
    ONE persisted count frame across model, continuation model and
    the type-count action."""
    return _model_from_counts(_counts(corpus, text_col, id_col), discount)


def kn_continuation_model(
    corpus: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Per-w2 continuation log-prob ``cont_lp_u`` =
    round(log2(N1+(•w2)/types), 6)·1e6 — the unseen-context backoff
    distribution (what makes KN beat add-k: 'Francisco' is frequent
    but follows only 'San', so its continuation mass is small)."""
    return _cont_from_counts(_counts(corpus, text_col, id_col))
