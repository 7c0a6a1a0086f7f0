from gem_data_wrangle_spark.sources.io import (
    TESTDATA_TABLES,
    load_testdata,
    scan_csv,
    scan_parquet,
    sink_csv,
    sink_parquet,
)

__all__ = [
    "TESTDATA_TABLES",
    "load_testdata",
    "scan_csv",
    "scan_parquet",
    "sink_csv",
    "sink_parquet",
]
