"""Local mirror of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` mirror on DuckDB at the given scale factor, then
compares row count, column names, and an order-insensitive value hash
(per-row canonical string, rows sorted). Usage:

    python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from gem_data_wrangle_spark import get_spark  # noqa: E402
from gem_data_wrangle_spark.sources import TESTDATA_TABLES  # noqa: E402


def canon(value) -> str:
    if value is None:
        return "NULL"
    if isinstance(value, float):
        if value != value:
            return "NaN"
        if value == int(value) and abs(value) < 1e15:
            return str(int(value))
        return f"{value:.6g}"
    return str(value)


def frame_fingerprint(cols: list[str], rows: list[tuple]) -> tuple[int, list[str], list[str]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    return len(rows), sorted(cols), lines


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
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle — rows-only) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.sql(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures.append(name)
            continue
        sn, sc, sl = frame_fingerprint(scols, srows)
        dn, dc, dl = frame_fingerprint(dcols, drows)
        if sn != dn:
            print(f"FAIL  {name}: rowcount spark={sn} duck={dn}")
            failures.append(name)
        elif sc != dc:
            print(f"FAIL  {name}: columns spark={sc} duck={dc}")
            failures.append(name)
        elif sl != dl:
            diff = [(a, b) for a, b in zip(sl, dl) if a != b][:3]
            print(f"FAIL  {name}: value mismatch, first diffs: {diff}")
            failures.append(name)
        else:
            print(f"OK    {name}: {sn} rows [{time.time()-t0:.1f}s]")
    print(f"\n{len(failures)} failures / {len(only) if only else len(queries)} checked")
    if failures:
        print("failed:", ", ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
