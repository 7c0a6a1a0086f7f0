"""Readability scoring — Flesch Reading Ease / Flesch-Kincaid grade.

A standard document-quality feature for training-data curation
(alongside the Gopher/C4 heuristics in ``textops.py``): too-low
readability correlates with boilerplate and OCR noise, too-high with
template/listicle text. Flesch 1948 / Kincaid et al. 1975.

Determinism contract: the three inputs are EXACT integers computed by
regex algebra any engine replays —

* words      = count of ``\\S+`` runs,
* sentences  = count of ``[.!?]+`` runs, floored at 1,
* syllables  = count of ``[aeiouy]+`` runs in the lowercased text
  (vowel-group heuristic; runs never span non-letters, so the global
  count equals the per-word sum)

— and each score is ONE fixed chain of IEEE ops on those integers
(two divisions, two multiplies, subtractions), rounded at the end.
No per-row Python, no tokenizer model: pure JVM-side column algebra,
map-only, zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def readability_scores(
    df: DataFrame,
    text_col: str,
    decimals: int = 4,
) -> DataFrame:
    """Append ``n_words``, ``n_sentences``, ``n_syllables``,
    ``flesch_ease`` (206.835 − 1.015·W/S − 84.6·Y/W) and
    ``fk_grade`` (0.39·W/S + 11.8·Y/W − 15.59), NULL when the text
    has no words."""
    words = F.size(F.expr(
        f"regexp_extract_all(`{text_col}`, '[^\\\\s]+', 0)"
    )).cast("long")
    sents = F.greatest(
        F.size(F.expr(f"regexp_extract_all(`{text_col}`, '[.!?]+', 0)")),
        F.lit(1),
    ).cast("long")
    sylls = F.size(F.expr(
        f"regexp_extract_all(lower(`{text_col}`), '[aeiouy]+', 0)"
    )).cast("long")
    out = (
        df.withColumn("n_words", words)
        .withColumn("n_sentences", sents)
        .withColumn("n_syllables", sylls)
    )
    w = F.col("n_words").cast("double")
    s = F.col("n_sentences").cast("double")
    y = F.col("n_syllables").cast("double")
    nonempty = F.col("n_words") > 0
    flesch = F.lit(206.835) - F.lit(1.015) * (w / s) - F.lit(84.6) * (y / w)
    fk = F.lit(0.39) * (w / s) + F.lit(11.8) * (y / w) - F.lit(15.59)
    out = out.withColumn(
        "flesch_ease", F.when(nonempty, F.round(flesch, decimals))
    ).withColumn("fk_grade", F.when(nonempty, F.round(fk, decimals)))
    # EXACT milli-unit scores for hash-parity consumers: 1000·score as
    # one integer floor over the common denominator s·w. The float
    # columns above can land on terminating decimals whose rounding
    # tie Spark (decimal-repr HALF_UP) and C-library rounding resolve
    # differently (the kn-LM lesson); these never can — pure integer
    # algebra, floor realized as trunc-after-positive-shift so Spark's
    # truncating decimal division and an oracle's flooring `//` agree
    # on negative scores too.
    wl = F.col("n_words").cast("decimal(38,0)")
    sl = F.col("n_sentences").cast("decimal(38,0)")
    yl = F.col("n_syllables").cast("decimal(38,0)")
    shift = F.lit(10_000_000_000).cast("decimal(38,0)")
    d = (sl * wl).cast("decimal(38,0)")

    def milli(num):
        a = (num + shift * d).cast("decimal(38,0)")
        return (
            ((a - a % d) / d).cast("decimal(38,0)").cast("long")
            - F.lit(10_000_000_000)
        )

    flesch_num = (
        F.lit(206835) * sl * wl - F.lit(1015) * wl * wl - F.lit(84600) * yl * sl
    ).cast("decimal(38,0)")
    fk_num = (
        F.lit(390) * wl * wl + F.lit(11800) * yl * sl - F.lit(15590) * sl * wl
    ).cast("decimal(38,0)")
    return out.withColumn(
        "flesch_milli", F.when(nonempty, milli(flesch_num))
    ).withColumn("fk_milli", F.when(nonempty, milli(fk_num)))
