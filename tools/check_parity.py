"""Local mirror of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` mirror on DuckDB at the given scale factor, then
compares row count, column names, and an order-insensitive value hash.

DRIVER-FAITHFUL canonicalization (VERDICT r8 item 2): the driver pulls
BOTH engines through pandas (``toPandas()`` / ``.df()``) before
hashing, so dtype divergence IS a failure even when the values match —
DuckDB renders HUGEINT/DECIMAL as float64 (``63`` → ``63.0``,
``8474257865030284474`` → ``8.47e+18``) while Spark hands pandas
int64/``decimal.Decimal``. The old gate collapsed int/float and
printed 6 sig figs, which hid exactly that class and shipped five red
rows. This version renders every cell at FULL precision from the
pandas frame (no int/float collapse, ``repr`` for floats) and fails
loudly on list/array cells (the driver canonicalizer crashes on them).

Usage:

    python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from gem_data_wrangle_spark import get_spark  # noqa: E402
from gem_data_wrangle_spark.sources import TESTDATA_TABLES  # noqa: E402


def canon(value) -> str:
    """Full-precision canonical string for one pandas cell.

    No int/float collapse: ``63`` (int64) and ``63.0`` (float64) must
    render differently, because they hash differently at the driver.
    Raises TypeError on list/dict/ndarray cells — those crash the
    driver's canonicalizer, so the local gate must refuse them too.
    """
    if value is None:
        return "NULL"
    if isinstance(value, float):
        if math.isnan(value):
            return "NULL"
        return repr(value)  # shortest round-trip, never .6g
    if isinstance(value, (list, dict, set, tuple)) or type(value).__name__ == "ndarray":
        raise TypeError(
            f"non-scalar cell {type(value).__name__} — arrays/maps/structs "
            "are outside the graded-output type contract"
        )
    import datetime

    if isinstance(value, datetime.datetime):
        return str(value)
    if isinstance(value, datetime.date):
        # a Spark DATE and a DuckDB midnight TIMESTAMP are the same
        # fact; the driver hashes them equal (cohort_retention r8
        # green), so the local mirror must too
        return str(value) + " 00:00:00"
    try:
        import pandas as pd

        if value is pd.NaT:
            return "NULL"
    except Exception:  # noqa: BLE001
        pass
    return str(value)


def frame_fingerprint(pdf) -> tuple[int, list[str], list[str], dict[str, str]]:
    """(n_rows, sorted cols, sorted canonical row-lines, dtypes) from a
    pandas frame — the same shape the driver hashes."""
    cols = sorted(pdf.columns)
    dtypes = {c: str(pdf[c].dtype) for c in pdf.columns}
    sub = pdf[cols]
    lines = []
    for row in sub.itertuples(index=False, name=None):
        lines.append("|".join(canon(v) for v in row))
    lines.sort()
    return len(pdf), cols, lines, dtypes


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]

    spark = get_spark("parity-check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failures.append(name)
            continue
        if name not in oracles:
            print(
                f"rows  {name}: {len(spdf)} rows (no oracle — rows-only)"
                f" [{time.time()-t0:.1f}s]"
            )
            continue
        try:
            dpdf = con.sql(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures.append(name)
            continue
        try:
            sn, sc, sl, sd = frame_fingerprint(spdf)
            dn, dc, dl, dd = frame_fingerprint(dpdf)
        except TypeError as exc:
            print(f"FAIL  {name}: {exc}")
            failures.append(name)
            continue
        if sn != dn:
            print(f"FAIL  {name}: rowcount spark={sn} duck={dn}")
            failures.append(name)
        elif sc != dc:
            print(f"FAIL  {name}: columns spark={sc} duck={dc}")
            failures.append(name)
        elif sl != dl:
            diff = [(a, b) for a, b in zip(sl, dl) if a != b][:3]
            print(
                f"FAIL  {name}: value mismatch "
                f"(spark dtypes {sd} vs duck {dd}), first diffs: {diff}"
            )
            failures.append(name)
        else:
            note = ""
            if sd != dd:
                # same rendering, different dtype — warn (e.g. int32
                # vs int64 is harmless; int64 vs float64 would have
                # produced a value diff already)
                note = f"  [dtypes spark={sd} duck={dd}]"
            print(f"OK    {name}: {sn} rows [{time.time()-t0:.1f}s]{note}")
    print(f"\n{len(failures)} failures / {len(only) if only else len(queries)} checked")
    if failures:
        print("failed:", ", ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
