"""Cleaning / filter / conditional operator semantics (SURVEY §2.2-§2.3,
§2.9) including the R-parity subtleties (NA-safe isin, sentinel
handling, imputation variants)."""

from pyspark.sql import functions as F

from gem_data_wrangle_spark.functions import cleaning as C
from gem_data_wrangle_spark.functions.conditional import classify_first_mention


def test_filter_isin_null_safe(spark):
    df = spark.createDataFrame(
        [("operating",), ("retired",), (None,), ("cancelled - inferred 4 y",)],
        "Status string",
    )
    out = C.filter_isin(df, "Status", ["operating", "construction"]).collect()
    assert [r["Status"] for r in out] == ["operating"]  # NULL and inferred variants dropped


def test_replace_value_global_strings_only(spark):
    df = spark.createDataFrame(
        [(">0", 1.5, ">0"), ("x", 2.0, "y")], "a string, n double, b string"
    )
    out = C.replace_value_global(df, ">0", "unknown").collect()
    assert out[0]["a"] == "unknown" and out[0]["b"] == "unknown"
    assert out[0]["n"] == 1.5  # numeric column untouched
    assert out[1]["a"] == "x"


def test_filter_capacity_known(spark):
    df = spark.createDataFrame(
        [("800.0",), ("N/A",), ("unknown",), (None,), ("0",), ("0.0",), ("12",)],
        "cap string",
    )
    out = {r["cap"] for r in C.filter_capacity_known(df, "cap").collect()}
    assert out == {"800.0", "12"}


def test_filter_not_and_null_conjunct(spark):
    # R filter(!(a & b)) drops NA-predicate rows; SQL 3VL matches.
    df = spark.createDataFrame(
        [("announced", "unknown"), ("announced", "2030"),
         ("announced", None), ("operating", None)],
        "status string, start string",
    )
    out = C.filter_not_and(
        df, F.col("status") == "announced", F.col("start") == "unknown"
    ).collect()
    kept = {(r["status"], r["start"]) for r in out}
    assert ("announced", "unknown") not in kept
    assert ("announced", "2030") in kept
    # TRUE AND NULL = NULL → NOT NULL = NULL → dropped (matches R: the
    # reference adds an is.na() disjunct when it wants NULLs *caught*,
    # GEM/GasOilplants_GEM.R:79-80)
    assert ("announced", None) not in kept
    # FALSE AND NULL = FALSE → kept
    assert ("operating", None) in kept


def test_impute_year_variants(spark):
    df = spark.createDataFrame(
        [
            ("announced", None),
            ("announced", "not found"),
            ("operating", None),
            ("operating", "1999"),
            ("retired", None),
        ],
        "Status string, Start string",
    )
    out = C.impute_year(
        df, "Start", "Status",
        future_statuses=["announced", "construction"],
    ).collect()
    got = {(r["Status"], r["Start"]) for r in out}
    assert ("announced", "2030") in got
    assert ("operating", "2024") in got
    assert ("operating", "1999") in got
    assert ("retired", None) in got  # untouched: not future, not operating


def test_classify_first_mention_tiebreak(spark):
    df = spark.createDataFrame(
        [
            ("fossil gas: natural gas",),
            ("fossil liquids: fuel oil",),
            ("fossil liquids: diesel, fossil gas: LNG",),
            ("fossil gas: LNG, fossil liquids: diesel",),
            ("industrial by-product",),
        ],
        "Fuel string",
    )
    out = df.select(
        "Fuel",
        classify_first_mention(
            F.col("Fuel"),
            [("fossil gas", "Gas"), ("fossil liquids", "Oil")],
            default="Not Sure",
        ).alias("cls"),
    ).collect()
    got = {r["Fuel"]: r["cls"] for r in out}
    assert got["fossil gas: natural gas"] == "Gas"
    assert got["fossil liquids: fuel oil"] == "Oil"
    # first mention wins (GEM/GasOilplants_GEM.R:25-39)
    assert got["fossil liquids: diesel, fossil gas: LNG"] == "Oil"
    assert got["fossil gas: LNG, fossil liquids: diesel"] == "Gas"
    assert got["industrial by-product"] == "Not Sure"


def test_add_literals_typed_nulls(spark):
    df = spark.createDataFrame([(1,)], "x int")
    out = C.add_literals(
        df, {"sector": "Power"}, typed_nulls={"workforce_size": "double"}
    )
    row = out.collect()[0]
    assert row["sector"] == "Power" and row["workforce_size"] is None
    assert dict(out.dtypes)["workforce_size"] == "double"
