"""Round-12 continuation operators: HITS hub/authority scores,
windowed audio frame features, and VAD segment merging.

Reference scope note: none of these exist in the reference (R scripts,
tabular GEM pipelines) — they are extension-surface operators for the
LLM-corpus use cases (host-graph curation priors; speech-corpus
silence trimming), with exact-integer contracts so the driver oracle
replays them bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pytest

from gem_data_wrangle_spark.operators.graph import hits_scores
from gem_data_wrangle_spark.operators.multimodal import (
    audio_frame_features,
    vad_segments,
)


def _wav(samples, rate=1000, channels=1, bits=16):
    """Minimal RIFF/WAVE PCM container around raw samples."""
    if bits == 16:
        raw = np.asarray(samples, dtype="<i2").tobytes()
    elif bits == 8:
        raw = np.asarray(samples, dtype=np.uint8).tobytes()
    else:
        raise ValueError(bits)
    block = channels * bits // 8
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little") + bits.to_bytes(2, "little")
    )
    data = b"data" + len(raw).to_bytes(4, "little") + raw
    return (
        b"RIFF" + (4 + len(fmt) + len(data)).to_bytes(4, "little")
        + b"WAVE" + fmt + data
    )


# --------------------------------------------------------------------
# HITS
# --------------------------------------------------------------------

def test_hits_worked_example(spark):
    # a→c, b→c, c→d; two unnormalized rounds by hand:
    #   a1 = in-degree: c=2, d=1
    #   h1: a=a1(c)=2, b=2, c=a1(d)=1
    #   a2: c=h1(a)+h1(b)=4, d=h1(c)=1
    #   h2: a=a2(c)=4, b=4, c=a2(d)=1
    e = spark.createDataFrame(
        [("a", "c"), ("b", "c"), ("c", "d")], "s string, d string"
    )
    out = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits_scores(e, "s", "d", iterations=2).collect()
    }
    assert out == {"a": (4, 0), "b": (4, 0), "c": (1, 4), "d": (0, 1)}


def test_hits_one_iteration_authority_is_indegree(spark):
    e = spark.createDataFrame(
        [(1, 3), (2, 3), (2, 4), (3, 4), (4, 1)], "s long, d long"
    )
    out = {
        r["node"]: r["authority"]
        for r in hits_scores(e, "s", "d", iterations=1).collect()
    }
    assert out == {1: 1, 2: 0, 3: 2, 4: 2}


def test_hits_self_loop_and_validation(spark):
    # a self-loop makes the node reinforce itself (documented contract)
    e = spark.createDataFrame([(1, 1)], "s long, d long")
    [r] = hits_scores(e, "s", "d", iterations=2).collect()
    assert (r["node"], r["hub"], r["authority"]) == (1, 1, 1)
    with pytest.raises(ValueError, match="iterations"):
        hits_scores(e, "s", "d", iterations=0)


def test_hits_types_are_long(spark):
    e = spark.createDataFrame([(1, 2)], "s long, d long")
    schema = hits_scores(e, "s", "d").schema
    assert schema["hub"].dataType.simpleString() == "bigint"
    assert schema["authority"].dataType.simpleString() == "bigint"


# --------------------------------------------------------------------
# audio frame features
# --------------------------------------------------------------------

def test_audio_frames_worked_example(spark):
    # rate 1000 Hz, frame_ms=2 → 2 samples/frame; last frame partial.
    # samples [3,-3 | 0,0 | 5,-5 | 7,8 | 9]:
    #   f0: energy 9+9=18, one flip (3→-3)
    #   f1: silence, 0 flips (boundary pair -3→0 belongs to no frame)
    #   f2: 25+25=50, one flip
    #   f3: 49+64=113, 0 flips
    #   f4: 1 sample, 81, 0 flips (no intra-frame pair)
    df = spark.createDataFrame(
        [(1, bytearray(_wav([3, -3, 0, 0, 5, -5, 7, 8, 9])))],
        "id long, media binary",
    )
    rows = [
        tuple(r)
        for r in audio_frame_features(df, frame_ms=2)
        .orderBy("frame_idx")
        .collect()
    ]
    assert rows == [
        (1, "ok", 0, 2, 18, 1),
        (1, "ok", 1, 2, 0, 0),
        (1, "ok", 2, 2, 50, 1),
        (1, "ok", 3, 2, 113, 0),
        (1, "ok", 4, 1, 81, 0),
    ]


def test_audio_frames_quarantines_undecodable(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"not a wav")), (2, None)], "id long, media binary"
    )
    rows = {
        r["id"]: r["decode_status"]
        for r in audio_frame_features(df).collect()
    }
    assert rows[1].startswith("undecodable:")
    assert rows[2] == "undecodable:null"


def test_audio_frames_stereo_channel_sum_is_exact(spark):
    # stereo 16-bit: the Q15 re-quantized mono sample is the exact
    # integer SUM of the channels — energy = (a+b)² per pair
    inter = [100, -300, 7, 7]  # frames of (L,R): (100,-300), (7,7)
    df = spark.createDataFrame(
        [(1, bytearray(_wav(inter, rate=1000, channels=2)))],
        "id long, media binary",
    )
    rows = [
        tuple(r)
        for r in audio_frame_features(df, frame_ms=2)
        .orderBy("frame_idx")
        .collect()
    ]
    # mono = [-200, 14]; one frame of 2 samples: energy 40000+196,
    # one sign flip
    assert rows == [(1, "ok", 0, 2, 40196, 1)]


def test_audio_frames_8bit_pcm_exact(spark):
    # 8-bit unsigned PCM u → (u-128)*256 exactly under Q15
    df = spark.createDataFrame(
        [(1, bytearray(_wav([128, 129, 127], rate=1000, bits=8)))],
        "id long, media binary",
    )
    [r] = audio_frame_features(df, frame_ms=3).collect()
    # samples 0, 256, -256: energy 0 + 65536 + 65536; flip 256→-256
    assert (r["n_samples"], r["energy"], r["zero_crossings"]) == (
        3, 131072, 1,
    )


def test_audio_frames_validates_frame_ms(spark):
    df = spark.createDataFrame([(1, None)], "id long, media binary")
    with pytest.raises(ValueError, match="frame_ms"):
        audio_frame_features(df, frame_ms=0)


def test_audio_frames_empty_data_chunk_yields_no_rows(spark):
    df = spark.createDataFrame(
        [(1, bytearray(_wav([])))], "id long, media binary"
    )
    assert audio_frame_features(df).count() == 0


# --------------------------------------------------------------------
# VAD segments
# --------------------------------------------------------------------

def test_vad_segments_merges_consecutive_speech(spark):
    frames = spark.createDataFrame(
        # id, frame, n, energy: speech at mean-square >= 9
        [
            (1, 0, 2, 18),   # speech
            (1, 1, 2, 0),    # silence
            (1, 2, 2, 50),   # speech ┐ consecutive → one segment
            (1, 3, 2, 113),  # speech │
            (1, 4, 1, 81),   # speech ┘
            (2, 0, 2, 17),   # 17 < 2*9 → silence; id 2 has no segments
        ],
        "id long, frame_idx long, n_samples long, energy long",
    )
    segs = [
        tuple(r)
        for r in vad_segments(frames, 9)
        .orderBy("id", "segment_idx")
        .collect()
    ]
    assert segs == [(1, 1, 0, 0, 1, 18), (1, 2, 2, 4, 3, 244)]


def test_vad_threshold_is_inclusive_integer_compare(spark):
    frames = spark.createDataFrame(
        [(1, 0, 3, 27), (1, 1, 3, 26)],
        "id long, frame_idx long, n_samples long, energy long",
    )
    # 27 >= 9*3 passes; 26 fails — no float division anywhere
    segs = vad_segments(frames, 9).collect()
    assert len(segs) == 1 and segs[0]["start_frame"] == 0
    with pytest.raises(ValueError, match="threshold"):
        vad_segments(frames, -1)


def test_vad_zero_threshold_keeps_everything_as_one_run(spark):
    frames = spark.createDataFrame(
        [(1, 0, 2, 0), (1, 1, 2, 5), (1, 2, 2, 0)],
        "id long, frame_idx long, n_samples long, energy long",
    )
    segs = vad_segments(frames, 0).collect()
    assert len(segs) == 1
    assert (segs[0]["n_frames"], segs[0]["total_energy"]) == (3, 5)


# --------------------------------------------------------------------
# image dHash + packed Hamming pairs
# --------------------------------------------------------------------

def _png(w, h, ch, arr):
    from gem_data_wrangle_spark.operators.multimodal import encode_png

    return bytearray(
        encode_png(w, h, ch, np.asarray(arr, dtype=np.uint8).tobytes())
    )


def test_image_dhash_gradient_extremes_and_quarantines(spark):
    from gem_data_wrangle_spark.operators.multimodal import image_dhash

    desc = np.tile(np.arange(9)[::-1] * 20, (8, 1))  # left always brighter
    asc = np.tile(np.arange(9) * 20, (8, 1))
    df = spark.createDataFrame(
        [
            (1, _png(9, 8, 1, desc)),
            (2, _png(9, 8, 1, asc)),
            (3, _png(4, 4, 1, np.zeros((4, 4)))),
            (4, None),
        ],
        "id long, media binary",
    )
    rows = {r["id"]: tuple(r) for r in image_dhash(df).collect()}
    assert rows[1] == (1, "ok", 9, 8, 4294967295, 4294967295)
    assert rows[2] == (2, "ok", 9, 8, 0, 0)
    assert rows[3][1] == "too_small"
    assert rows[4][1] == "undecodable:null"


def test_image_dhash_invariant_to_constant_brightness_shift(spark):
    # dHash compares adjacent boxes, so a +10 shift (no wraparound)
    # must not move a single bit — the property that makes it a
    # re-encode-robust near-dup signature
    from gem_data_wrangle_spark.operators.multimodal import image_dhash

    rng = np.arange(36 * 32).reshape(32, 36)
    base = (rng * 7) % 200  # headroom for +10
    df = spark.createDataFrame(
        [(1, _png(36, 32, 1, base)), (2, _png(36, 32, 1, base + 10))],
        "id long, media binary",
    )
    rows = {r["id"]: (r["hash_hi"], r["hash_lo"]) for r in image_dhash(df).collect()}
    assert rows[1] == rows[2]


def test_image_dhash_bt601_luminance_weights(spark):
    # left half pure green, right half pure red: 587G > 299R, so every
    # left box is brighter -> all bits 1 in columns crossing the seam
    # ... simplest full check: green-left/red-right 9x8 RGB
    from gem_data_wrangle_spark.operators.multimodal import image_dhash

    img = np.zeros((8, 9, 3), dtype=np.uint8)
    img[:, :5, 1] = 255  # green left
    img[:, 5:, 0] = 255  # red right
    df = spark.createDataFrame([(1, _png(9, 8, 3, img))], "id long, media binary")
    [r] = image_dhash(df).collect()
    # bit c is 1 iff box c brighter than c+1: columns 0-3 equal green
    # (0), column 4 green vs red (1), columns 5-7 equal red (0)
    # -> per row byte 0b00010000 = 16; rows identical
    expect = sum(16 << (i * 8) for i in range(4))
    assert (r["hash_hi"], r["hash_lo"]) == (expect, expect)


def test_packed_hamming_pairs_worked_and_pigeonhole(spark):
    from gem_data_wrangle_spark.operators.dedup import packed_hamming_pairs

    h = spark.createDataFrame(
        [(1, 0, 0b1100), (2, 0, 0b0000), (3, 0b1, 0b1110)],
        "id long, hash_hi long, hash_lo long",
    )
    out = sorted(
        tuple(r)
        for r in packed_hamming_pairs(
            h, "id", ["hash_hi", "hash_lo"], max_distance=2
        ).collect()
    )
    # 1↔2 differ in 2 bits; 1↔3 in 2 (one per half); 2↔3 in 4 (excluded)
    assert out == [(1, 2, 2), (1, 3, 2)]
    # flips concentrated inside ONE band are still found (the verify
    # is exact; the bands only generate candidates)
    h2 = spark.createDataFrame(
        [(1, 0, 0), (2, 0, 0b11)], "id long, hash_hi long, hash_lo long"
    )
    assert [
        tuple(r)
        for r in packed_hamming_pairs(
            h2, "id", ["hash_hi", "hash_lo"], max_distance=2
        ).collect()
    ] == [(1, 2, 2)]


def test_packed_hamming_pairs_validates(spark):
    from gem_data_wrangle_spark.operators.dedup import packed_hamming_pairs

    h = spark.createDataFrame([(1, 0)], "id long, c long")
    with pytest.raises(ValueError, match="chunk column"):
        packed_hamming_pairs(h, "id", [], max_distance=1)
    with pytest.raises(ValueError, match="max_distance"):
        packed_hamming_pairs(h, "id", ["c"], max_distance=-1)
    with pytest.raises(ValueError, match="signature bits"):
        packed_hamming_pairs(h, "id", ["c"], chunk_bits=2, max_distance=2)


def test_packed_hamming_pairs_wide_values_still_pigeonhole(spark):
    # values wider than the declared chunk_bits: the unmasked top band
    # still captures the high bits, so a pair differing ONLY above
    # chunk_bits is banded (and the exact verify counts those bits)
    from gem_data_wrangle_spark.operators.dedup import packed_hamming_pairs

    wide = 1 << 40
    h = spark.createDataFrame(
        [(1, wide), (2, wide | 0b1), (3, 0)], "id long, c long"
    )
    out = sorted(
        tuple(r)
        for r in packed_hamming_pairs(
            h, "id", ["c"], chunk_bits=32, max_distance=2
        ).collect()
    )
    # 1↔2 distance 1 (low bit); 1↔3 and 2↔3 differ in bit 40 (+ bit 0)
    assert out == [(1, 2, 1), (1, 3, 1), (2, 3, 2)]


# --------------------------------------------------------------------
# differential fuzz: operator vs naive recompute on seeded random data
# (the test_differential_fuzz.py discipline for the round-12 families)
# --------------------------------------------------------------------

def test_fuzz_packed_hamming_matches_bruteforce(spark):
    import random

    from gem_data_wrangle_spark.operators.dedup import packed_hamming_pairs

    rng = random.Random(1202)
    sigs = []
    for i in range(40):
        if i % 4 == 0 and sigs:  # plant near-dups: mutate a prior sig
            base_hi, base_lo = sigs[rng.randrange(len(sigs))][1:]
            for _ in range(rng.randrange(3)):
                if rng.random() < 0.5:
                    base_hi ^= 1 << rng.randrange(32)
                else:
                    base_lo ^= 1 << rng.randrange(32)
            sigs.append((i, base_hi, base_lo))
        else:
            sigs.append(
                (i, rng.getrandbits(32), rng.getrandbits(32))
            )
    df = spark.createDataFrame(sigs, "id long, hi long, lo long")
    for d in (1, 3):
        got = sorted(
            tuple(r)
            for r in packed_hamming_pairs(
                df, "id", ["hi", "lo"], max_distance=d
            ).collect()
        )
        want = sorted(
            (a, b, bin(ha ^ hb).count("1") + bin(la ^ lb).count("1"))
            for ai, (a, ha, la) in enumerate(sigs)
            for b, hb, lb in sigs[ai + 1 :]
            if bin(ha ^ hb).count("1") + bin(la ^ lb).count("1") <= d
        )
        assert got == want, f"d={d}: {got} != {want}"


def test_fuzz_audio_frames_match_naive(spark):
    import random

    from gem_data_wrangle_spark.operators.multimodal import (
        audio_frame_features,
    )

    rng = random.Random(77)
    frame_len = 5  # rate 1000 Hz, frame_ms 5
    cases = {}
    rows = []
    for rid, n in enumerate([1, 4, 5, 6, 23, 50]):
        samples = [rng.randrange(-32768, 32768) for _ in range(n)]
        cases[rid] = samples
        rows.append((rid, bytearray(_wav(samples, rate=1000))))
    df = spark.createDataFrame(rows, "id long, media binary")
    got = {
        (r["id"], r["frame_idx"]): (
            r["n_samples"], r["energy"], r["zero_crossings"]
        )
        for r in audio_frame_features(df, frame_ms=5).collect()
    }
    want = {}
    for rid, s in cases.items():
        for f in range((len(s) + frame_len - 1) // frame_len):
            seg = s[f * frame_len : (f + 1) * frame_len]
            zc = sum(
                1
                for a, b in zip(seg, seg[1:])
                if (a < 0) != (b < 0)
            )
            want[(rid, f)] = (
                len(seg), sum(x * x for x in seg), zc
            )
    assert got == want


def test_fuzz_hits_matches_naive_power_iteration(spark):
    import random

    rng = random.Random(9)
    edges = sorted(
        {(rng.randrange(20), rng.randrange(20)) for _ in range(60)}
    )
    df = spark.createDataFrame(edges, "s long, d long")
    for iters in (1, 2, 3):
        got = {
            r["node"]: (r["hub"], r["authority"])
            for r in hits_scores(df, "s", "d", iterations=iters).collect()
        }
        nodes = {u for u, _ in edges} | {v for _, v in edges}
        h = {v: 1 for v in nodes}
        a = {}
        for _ in range(iters):
            a = {v: 0 for v in nodes}
            for u, v in edges:
                a[v] += h[u]
            h = {v: 0 for v in nodes}
            for u, v in edges:
                h[u] += a[v]
        assert got == {v: (h[v], a[v]) for v in nodes}, f"iters={iters}"


def test_fuzz_vad_matches_naive(spark):
    import random

    from gem_data_wrangle_spark.operators.multimodal import vad_segments

    rng = random.Random(31)
    rows = []
    for rid in range(8):
        f = 0
        while f < 12:
            if rng.random() < 0.3:  # gaps in the frame table itself
                f += 1
                continue
            rows.append((rid, f, 4, rng.randrange(0, 100)))
            f += 1
    frames = spark.createDataFrame(
        rows, "id long, frame_idx long, n_samples long, energy long"
    )
    thr = 10  # mean-square -> energy >= 40
    got = sorted(
        tuple(r) for r in vad_segments(frames, thr).collect()
    )
    # naive merge over speech frames, NEW segment when frame gap != 1
    want = []
    by_id = {}
    for rid, f, n, e in rows:
        if e >= thr * n:
            by_id.setdefault(rid, []).append((f, e))
    for rid, fs in by_id.items():
        fs.sort()
        seg = 0
        prev = None
        cur = None
        for f, e in fs:
            if prev is None or f - prev != 1:
                if cur:
                    want.append(cur)
                seg += 1
                cur = [rid, seg, f, f, 0, 0]
            cur[3] = f
            cur[4] += 1
            cur[5] += e
            prev = f
        if cur:
            want.append(cur)
    assert got == sorted(tuple(w) for w in want)
