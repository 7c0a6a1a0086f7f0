"""Byte-pair-encoding tokenizer: distributed training + encoding.

The token-counting story so far (``textops.token_count`` — whitespace
and BPE-ish regex heuristics) estimates token budgets; this module is
the real thing: learn a merge table from the corpus (Sennrich,
Haddow & Birch 2016, "Neural Machine Translation of Rare Words with
Subword Units") and deterministically encode documents with it, so
``sample_to_token_budget`` / ``pack_documents`` / ``chunk_documents``
can run on true subword counts instead of estimates.

Spark-first split of the algorithm:

* **Training operates on the word-frequency table, not the corpus.**
  Classic BPE never touches running text — it iterates over
  ``{word: count}``. The corpus-sized work (tokenize + count) is one
  distributed ``explode → groupBy`` pass; the merge loop then runs on
  the driver over the **bounded** top-``max_words`` table (the same
  bounded-collect contract as ``kernels.py`` zipWithIndex — the cap is
  an explicit argument, and the frequency tail BPE would learn nothing
  from is exactly what the cap drops; Sennrich's reference
  implementation caps the same way via its vocabulary input).
* **Encoding is embarrassingly parallel.** The merge table broadcasts
  with the closure (a vocab-sized dict); ``mapInPandas`` streams Arrow
  batches and applies the classic greedy lowest-rank merge loop per
  DISTINCT word (memoized per batch — natural-language batches repeat
  most words, so the per-row cost collapses to a dict lookup). No
  shuffle, no driver involvement, scales linearly with the corpus.

100 TB shape: train = one shuffle (partial-combined word count) + a
top-K driver table (MBs); encode = map-only over Arrow batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def _word_counts(df: DataFrame, text_col: str, max_words: int) -> list[tuple[str, int]]:
    """Distributed word-frequency table, capped to the ``max_words``
    most frequent (ties broken lexicographically so training is
    deterministic under any partitioning)."""
    counts = (
        df.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(max_words)
        .collect()
    )
    return [(r["w"], r["c"]) for r in counts]


def bpe_train(
    df: DataFrame,
    text_col: str,
    num_merges: int = 1000,
    max_words: int = 100_000,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn a BPE merge table from the corpus. Returns the ordered
    merge list ``[(left, right), ...]`` — rank = list position, the
    exact artifact :func:`bpe_encode` consumes and the format every
    public BPE vocabulary ships in.

    Determinism: the most-frequent pair each round ties to the
    lexicographically smallest ``(left, right)``, so the same corpus
    always yields the same table regardless of partitioning.
    """
    vocab: dict[tuple[str, ...], int] = {
        tuple(w) + (END_OF_WORD,): c for w, c in _word_counts(df, text_col, max_words)
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, cnt in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (la, rb), _n = best
        merged = la + rb
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, cnt in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == la and sym[i + 1] == rb:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + cnt
        vocab = new_vocab
        merges.append((la, rb))
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Classic greedy BPE: repeatedly merge the lowest-rank adjacent
    pair until none of the remaining pairs is in the table."""
    sym = list(word) + [END_OF_WORD]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    id_col: str,
    tokens_col: str = "tokens",
    count_col: str = "n_tokens",
) -> DataFrame:
    """(id, tokens array<string>, n_tokens) per document — greedy BPE
    with the given merge table. Word→tokens results are memoized per
    Arrow batch (Zipf's law makes the hit rate dominate), so the hot
    path is a dict lookup per word, not a merge loop per occurrence.
    """
    if len({id_col, tokens_col, count_col}) < 3:
        raise ValueError(
            "id_col/tokens_col/count_col must be distinct, got "
            f"({id_col!r}, {tokens_col!r}, {count_col!r})"
        )
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in it:
            ids, toks, lens = [], [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                out: list[str] = []
                for w in (text or "").split():
                    enc = cache.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        cache[w] = enc
                    out.extend(enc)
                ids.append(rid)
                toks.append(out)
                lens.append(len(out))
            yield pd.DataFrame({id_col: ids, tokens_col: toks, count_col: lens})

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, text_col).mapInPandas(
        batches,
        schema=f"{id_col} {id_type}, {tokens_col} array<string>, {count_col} int",
    )
