"""Sources & sinks (SURVEY §2.1)."""

import os

import pytest
from pyspark.sql import functions as F

from gem_data_wrangle_spark.sources import io as IO


def test_csv_roundtrip_with_schema(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", 1.5), ("b;x", None)], "name string, val double"
    )
    path = str(tmp_path / "csv_out")
    IO.sink_csv(df, path, single_file=True)
    back = IO.scan_csv(spark, path, schema="name string, val double")
    rows = {r["name"]: r["val"] for r in back.collect()}
    assert rows == {"a": 1.5, "b;x": None}


def test_csv_delim_and_all_text(spark, tmp_path):
    path = str(tmp_path / "semi.csv")
    with open(path, "w") as f:
        f.write("a;b\n1;2.5\n3;x\n")
    df = IO.scan_csv(spark, path, sep=";")
    assert df.columns == ["a", "b"]
    txt = IO.scan_csv_all_text(spark, path, sep=";")
    # all-text variant (GEM/solarplants_GEM.R:12-14): every column string
    assert all(t == "string" for _, t in txt.dtypes)
    assert {r["b"] for r in txt.collect()} == {"2.5", "x"}


def test_sink_parquet_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [(2024, "a"), (2024, "b"), (2025, "c")], "production_year int, v string"
    )
    path = str(tmp_path / "part_out")
    IO.sink_parquet(df, path, partition_by=["production_year"])
    assert os.path.isdir(os.path.join(path, "production_year=2024"))
    back = spark.read.parquet(path).filter(F.col("production_year") == 2025)
    # partition pruning: only the 2025 directory is scanned
    assert [r["v"] for r in back.collect()] == ["c"]
    scanned = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in scanned and "production_year" in scanned


def test_xlsx_converter_gated(tmp_path):
    # openpyxl absent in this container → NotImplementedError, never a crash
    try:
        import openpyxl  # noqa: F401

        pytest.skip("openpyxl present; gate not exercised")
    except ImportError:
        pass
    with pytest.raises((NotImplementedError, FileNotFoundError, ValueError, ImportError)):
        IO.xlsx_to_parquet(str(tmp_path / "missing.xlsx"), str(tmp_path / "out"))


def test_load_testdata_registers_views(spark, sf_dir):
    tables = IO.load_testdata(spark, sf_dir)
    assert "lineitem" in tables and "region" in tables
    assert spark.sql("SELECT count(*) AS n FROM region").collect()[0]["n"] == 5


def test_sink_parquet_replace_partitions(spark, tmp_path):
    from gem_data_wrangle_spark.sources.io import sink_parquet_replace_partitions

    path = str(tmp_path / "ptable")
    base = spark.createDataFrame(
        [(1, "2024"), (2, "2024"), (3, "2025")], "id bigint, year string"
    )
    sink_parquet_replace_partitions(base, path, ["year"])
    # reload only 2025: 2024 rows must survive, 2025 replaced
    patch = spark.createDataFrame([(99, "2025")], "id bigint, year string")
    sink_parquet_replace_partitions(patch, path, ["year"])
    # partition values come back type-inferred (string '2024' → int)
    got = {(r["id"], str(r["year"])) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "2024"), (2, "2024"), (99, "2025")}
