"""Graded-output type contract (VERDICT r8 items 1-2).

The driver canonicalizes both engines through pandas before hashing.
DuckDB's ``.df()`` renders HUGEINT and DECIMAL as float64 while Spark
hands pandas int64/Decimal — so a graded projection whose DECLARED
types diverge in kind will hash-mismatch even when every value is
identical (all five round-8 red rows were exactly this). And
list/struct cells crash the driver canonicalizer outright
(``unhashable type: 'list'`` — pq_encode r7, mean_pool r8).

These tests are STATIC — Spark schemas come from plan analysis and
DuckDB types from ``DESCRIBE <query>``, no job runs — so the sweep
covers every graded-head query in seconds:

* no graded Spark schema contains Decimal/Array/Map/Struct;
* no graded oracle declares HUGEINT, DECIMAL, or a nested type;
* per column (matched by name), the two engines declare the same KIND
  (integer / float / string / bool / timestamp / date) — the exact
  condition under which pandas renders identical canonical strings.
"""

import duckdb
import pytest
from pyspark.sql import types as T

import __spark_entry__ as entrymod
from gem_data_wrangle_spark.sources import TESTDATA_TABLES

_BANNED_SPARK = (T.DecimalType, T.ArrayType, T.MapType, T.StructType)


def _duck_kind(type_str: str) -> str:
    t = type_str.upper()
    if "[" in t or t.startswith(("STRUCT", "MAP", "LIST", "UNION")):
        return "nested"
    if t in ("HUGEINT", "UHUGEINT") or t.startswith("DECIMAL"):
        return "banned-wide"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if t in ("VARCHAR", "TEXT", "STRING", "BLOB"):
        return "str"
    if t == "BOOLEAN":
        return "bool"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t == "DATE":
        return "date"
    return f"other:{t}"


def _spark_kind(dt: T.DataType) -> str:
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, (T.StringType, T.BinaryType)):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.TimestampType):
        return "timestamp"
    if isinstance(dt, (T.DateType,)):
        return "date"
    if isinstance(dt, _BANNED_SPARK):
        return "banned"
    return f"other:{dt.simpleString()}"


@pytest.fixture(scope="module")
def graded(spark, sf_dir):
    """(name, spark schema, oracle declared types) for the graded head."""
    names = list(entrymod.queries().items())[:50]
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")
    out = []
    for name, fn in names:
        schema = fn(spark, sf_dir).schema
        duck_types = None
        if name in oracles:
            desc = con.sql("DESCRIBE " + oracles[name]).fetchall()
            duck_types = {r[0]: r[1] for r in desc}
        out.append((name, schema, duck_types))
    con.close()
    return out


def test_graded_spark_schemas_are_scalar_and_exact(graded):
    bad = {
        name: [f.name + ":" + f.dataType.simpleString()
               for f in schema.fields
               if isinstance(f.dataType, _BANNED_SPARK)]
        for name, schema, _ in graded
    }
    bad = {k: v for k, v in bad.items() if v}
    assert not bad, (
        "graded Spark schemas outside the type contract "
        "(Decimal → pandas Decimal-object vs DuckDB float64; "
        "Array/Map/Struct crash the driver canonicalizer): " + str(bad)
    )


def test_graded_oracle_types_are_scalar_and_exact(graded):
    bad = {}
    for name, _, duck_types in graded:
        if not duck_types:
            continue
        rows = [
            c + ":" + t for c, t in duck_types.items()
            if _duck_kind(t) in ("nested", "banned-wide")
        ]
        if rows:
            bad[name] = rows
    assert not bad, (
        "graded oracles declare HUGEINT/DECIMAL/nested types "
        "(pandas renders them float64/list — hash-mismatch vs Spark): "
        + str(bad)
    )


def test_graded_column_kinds_align_across_engines(graded):
    bad = {}
    for name, schema, duck_types in graded:
        if not duck_types:
            continue
        spark_kinds = {f.name: _spark_kind(f.dataType) for f in schema.fields}
        rows = []
        for col, skind in spark_kinds.items():
            dkind = _duck_kind(duck_types.get(col, "<missing>"))
            if col not in duck_types:
                rows.append(f"{col}: missing from oracle")
            elif skind != dkind and "banned" not in (skind, dkind):
                rows.append(f"{col}: spark={skind} duck={dkind}")
        if rows:
            bad[name] = rows
    assert not bad, (
        "column kind divergence — identical values will still render "
        "different canonical strings at the driver: " + str(bad)
    )
