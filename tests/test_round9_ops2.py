"""Round-9 batch 2: incremental aggregate maintenance, TIFF/EXIF
probe, k-anonymity, golden record."""

import pytest
from pyspark.sql import functions as F


def test_partial_merge_equals_full_recompute(spark):
    from gem_data_wrangle_spark.operators.incremental import (
        finish_aggregates,
        merge_partial_aggregates,
        partial_aggregates,
    )

    rows = [(f"k{i % 5}", i % 100, i) for i in range(1000)]
    df = spark.createDataFrame(rows, "k string, cents long, seq long")
    a = df.filter(F.col("seq") % 2 == 0)
    b = df.filter(F.col("seq") % 2 == 1)
    pa = partial_aggregates(a, ["k"], sum_cols=["cents"], min_cols=["seq"], max_cols=["seq"])
    pb = partial_aggregates(b, ["k"], sum_cols=["cents"], min_cols=["seq"], max_cols=["seq"])
    merged = merge_partial_aggregates([pa, pb], ["k"])
    full = partial_aggregates(df, ["k"], sum_cols=["cents"], min_cols=["seq"], max_cols=["seq"])
    m = {r["k"]: r.asDict() for r in merged.collect()}
    f = {r["k"]: r.asDict() for r in full.collect()}
    assert m == f
    fin = {r["k"]: r["mean_cents"] for r in finish_aggregates(merged, mean_of=["cents"]).collect()}
    for k, r in f.items():
        assert fin[k] == round(r["sum_cents"] / r["n_rows"], 6)


def test_merge_rejects_mismatched_schemas(spark):
    from gem_data_wrangle_spark.operators.incremental import (
        merge_partial_aggregates,
        partial_aggregates,
    )

    df = spark.createDataFrame([("a", 1)], "k string, v long")
    p1 = partial_aggregates(df, ["k"], sum_cols=["v"])
    p2 = partial_aggregates(df, ["k"], min_cols=["v"])
    with pytest.raises(ValueError, match="schemas differ"):
        merge_partial_aggregates([p1, p2], ["k"])


def test_tiff_probe_roundtrip_and_quarantine(spark):
    import pandas as pd

    from gem_data_wrangle_spark.operators.tiff_exif import build_tiff, tiff_probe

    payloads = []
    for i in range(12):
        if i == 4:
            payloads.append((i, b"JUNK"))
        elif i == 7:
            b = build_tiff(100, 50, 1, "M", "C", "2024:01:01 00:00:00", 200)
            payloads.append((i, b[: len(b) // 2]))
        else:
            payloads.append(
                (i, build_tiff(16 * (i + 1), 8 * (i + 1), i % 8 + 1,
                               f"Maker{i}", f"Cam{i}",
                               "2024:01:01 00:00:00", 100 + i,
                               big_endian=bool(i % 2)))
            )
    df = spark.createDataFrame(payloads, "id long, media binary")
    got = {r["id"]: r for r in tiff_probe(df).collect()}
    assert got[4]["probe_status"] == "not_tiff"
    assert got[7]["probe_status"] == "truncated" and got[7]["width"] is None
    for i in range(12):
        if i in (4, 7):
            continue
        r = got[i]
        assert r["probe_status"] == "ok"
        assert (r["width"], r["height"]) == (16 * (i + 1), 8 * (i + 1))
        assert r["byte_order"] == ("MM" if i % 2 else "II")
        assert r["make"] == f"Maker{i}" and r["iso"] == 100 + i


def test_k_anonymity_counts(spark):
    from gem_data_wrangle_spark.operators.quality import k_anonymity

    rows = (
        [("US", 1980)] * 5        # safe group at k=3
        + [("DE", 1990)] * 2      # violating (2 < 3)
        + [("FR", 2000)]          # violating (1 < 3)
    )
    df = spark.createDataFrame(rows, "country string, birth_year int")
    r = k_anonymity(df, ["country", "birth_year"], k=3).collect()[0]
    assert (r["n_rows"], r["n_groups"]) == (8, 3)
    assert (r["n_violating_groups"], r["n_rows_at_risk"]) == (2, 3)
    assert r["at_risk_ppm"] == 3 * 1000000 // 8


def test_golden_record_latest_nonnull_per_field(spark):
    from gem_data_wrangle_spark.operators.quality import golden_record

    rows = [
        # (user, seq, email, phone)
        ("u1", 1, "old@x.com", "111"),
        ("u1", 2, None, "222"),        # newest phone, null email
        ("u1", 3, "new@x.com", None),  # newest email, null phone
        ("u2", 1, None, None),
        ("u2", 2, "only@y.org", None),
    ]
    df = spark.createDataFrame(rows, "user string, seq long, email string, phone string")
    got = {r["user"]: r for r in golden_record(
        df, ["user"], "seq", ["email", "phone"], tiebreak_col="seq"
    ).collect()}
    assert got["u1"]["email"] == "new@x.com"      # field-level survivorship
    assert got["u1"]["phone"] == "222"            # not clobbered by row 3's null
    assert got["u1"]["n_versions"] == 3 and got["u1"]["last_seq"] == 3
    assert got["u2"]["email"] == "only@y.org" and got["u2"]["phone"] is None
