"""Round-9 batch 3: GIF demux, readability scores, KN bigram LM."""

import math

import pytest


def test_gif_roundtrip_all_params(spark):
    from gem_data_wrangle_spark.operators.gif_codec import build_gif, gif_probe

    rows = []
    for i in range(10):
        if i == 3:
            rows.append((i, b"NOTAGIF"))
        elif i == 6:
            b = build_gif(100, 80, n_frames=4, delay_cs=5, loop_count=2)
            rows.append((i, b[: len(b) // 2]))
        else:
            rows.append(
                (i, build_gif(
                    8 * (i + 2), 4 * (i + 2), n_frames=i % 5 + 1,
                    delay_cs=i + 1,
                    loop_count=(i if i % 2 == 0 else None),
                    gct=bool(i % 3),
                ))
            )
    df = spark.createDataFrame(rows, "id long, media binary")
    got = {r["id"]: r for r in gif_probe(df).collect()}
    assert got[3]["probe_status"] == "not_gif"
    t = got[6]
    assert t["probe_status"] == "truncated"
    assert (t["width"], t["height"]) == (100, 80)  # header survives the cut
    assert t["n_frames"] is None
    for i in range(10):
        if i in (3, 6):
            continue
        r = got[i]
        nf = i % 5 + 1
        assert r["probe_status"] == "ok"
        assert (r["width"], r["height"]) == (8 * (i + 2), 4 * (i + 2))
        assert r["n_frames"] == nf
        assert r["total_delay_cs"] == nf * (i + 1)
        assert r["loop_count"] == (i if i % 2 == 0 else None)
        assert r["has_gct"] == bool(i % 3)
        # one GCE per frame + the NETSCAPE ext when looped
        assert r["n_extensions"] == nf + (1 if i % 2 == 0 else 0)


def test_readability_known_text(spark):
    from gem_data_wrangle_spark.operators.readability import readability_scores

    df = spark.createDataFrame(
        [(1, "The quick brown fox. It jumps!"), (2, ""), (3, "no terminator here")],
        "id long, text string",
    )
    got = {r["id"]: r for r in readability_scores(df, "text").collect()}
    r = got[1]
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (6, 2, 6)
    assert r["flesch_ease"] == round(206.835 - 1.015 * 3.0 - 84.6 * 1.0, 4)
    assert r["fk_grade"] == round(0.39 * 3.0 + 11.8 * 1.0 - 15.59, 4)
    assert got[2]["flesch_ease"] is None  # no words -> NULL scores
    assert got[3]["n_sentences"] == 1     # floored
    # exact milli scores: integer floor of 1000*score, negatives too
    w, s, y = 6, 2, 6
    assert r["flesch_milli"] == math.floor(
        (206835 * s * w - 1015 * w * w - 84600 * y * s) / (s * w)
    )
    assert r["fk_milli"] == math.floor(
        (390 * w * w + 11800 * y * s - 15590 * s * w) / (s * w)
    )
    assert got[2]["flesch_milli"] is None


def test_kn_bigram_model_hand_computed(spark):
    from gem_data_wrangle_spark.operators.lm import (
        kn_bigram_model,
        kn_continuation_model,
        kn_score_documents,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat on the log"),
            (3, "a cat and a dog"),
        ],
        "doc_id long, text string",
    )
    model = kn_bigram_model(corpus, "text", "doc_id")
    cont = kn_continuation_model(corpus, "text", "doc_id")
    n_types = model.count()
    assert n_types == 12
    docs = spark.createDataFrame(
        [(10, "the cat sat"), (11, "zebra quux flux"), (12, "x")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in kn_score_documents(
            docs, model, cont, "text", "doc_id", n_types=n_types
        ).collect()
    }
    # P(cat|the) = (1-.75)/4 + .75*(4/4)*(2/12) = 0.1875
    # P(sat|cat) = (1-.75)/2 + .75*(2/2)*(2/12) = 0.25
    lp = (
        round(round(math.log2(0.1875), 6) * 1e6)
        + round(round(math.log2(0.25), 6) * 1e6)
    )
    assert got[10]["n_bigrams"] == 2
    assert got[10]["logprob_total"] == round(lp / 1e6, 6)
    # fully unseen bigrams take the 1/(types+1) floor
    floor = round(round(math.log2(1 / 13), 6) * 1e6)
    assert got[11]["logprob_total"] == round(2 * floor / 1e6, 6)
    assert 12 not in got  # single-token doc has no bigrams


def test_kn_score_requires_n_types(spark):
    from gem_data_wrangle_spark.operators.lm import (
        kn_bigram_model,
        kn_continuation_model,
        kn_score_documents,
    )

    corpus = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    m = kn_bigram_model(corpus, "text", "doc_id")
    c = kn_continuation_model(corpus, "text", "doc_id")
    with pytest.raises(ValueError, match="n_types"):
        kn_score_documents(corpus, m, c, "text", "doc_id")
