"""Sources & sinks.

Re-expresses the reference's scan/sink surface
(``GEM/Coalplants_GEM.R:10`` read_excel, ``GEM/TotalData_GEM.R:6-13``
read.csv, ``:65`` sep=";" CSV, ``:140`` write.csv) as Spark readers
with explicit schemas. Excel has no scalable Spark source, so xlsx is
an *offline ingest conversion* to Parquet (``xlsx_to_parquet``), after
which everything is columnar, splittable, predicate-pushdown-capable
Parquet — the only sane format at 100 TB.
"""

from __future__ import annotations

import os
from typing import cast

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def scan_parquet(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """Columnar scan; Catalyst pushes filters/projections into it."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def scan_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    sep: str = ",",
    header: bool = True,
) -> DataFrame:
    """CSV scan (``GEM/TotalData_GEM.R:6-13``; ``sep=";"`` at ``:65``).

    Prefer an explicit schema: ``inferSchema`` costs a full extra pass —
    unacceptable at scale, and the reference itself hit inference
    instability (solar forces all-text, ``GEM/solarplants_GEM.R:12-14``).
    """
    reader = spark.read.option("header", str(header).lower()).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def scan_csv_all_text(spark: SparkSession, path: str, sep: str = ",") -> DataFrame:
    """``scan_excel_typed`` analogue: every column read as string, cast
    later (``GEM/solarplants_GEM.R:12-23``)."""
    return (
        spark.read.option("header", "true")
        .option("sep", sep)
        .option("inferSchema", "false")
        .csv(path)
    )


def sink_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    """Partitioned Parquet sink — ``partition_by`` on a low-cardinality
    column (e.g. ``production_year``) gives free partition pruning for
    downstream year-ranged queries at scale."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def sink_csv(df: DataFrame, path: str, mode: str = "overwrite", single_file: bool = False) -> None:
    """``write.csv(row.names=FALSE)`` parity (``GEM/Coalplants_GEM.R:229``).

    ``single_file`` coalesces to one partition for small outputs only —
    never for large data (it serializes the whole write through one
    task).
    """
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", "true").csv(path)


_XLSX_MAIN_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_XLSX_REL_ATTR = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
)


def _xlsx_col_index(cell_ref: str) -> int:
    """'BC12' → 0-based column 54 (the letters part of an A1 reference)."""
    n = 0
    for ch in cell_ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return n - 1


def read_xlsx_sheet(xlsx_path: str, sheet_name: str) -> list[list[str | None]]:
    """Dependency-free xlsx sheet reader (stdlib zipfile + ElementTree —
    an xlsx file is a zip of XML parts). Returns the raw cell grid as
    strings, matching ``read_excel``'s all-text mode: shared strings
    resolved, inline strings joined, numbers kept in their canonical
    lexical form. Driver-side by design — ingest is a one-time offline
    conversion (trackers are ~14k rows), not a distributed path.
    """
    import xml.etree.ElementTree as ET  # noqa: PLC0415
    import zipfile  # noqa: PLC0415

    with zipfile.ZipFile(xlsx_path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rid_to_target = {rel.get("Id"): rel.get("Target") for rel in rels}
        target = None
        for sh in wb.iter(f"{_XLSX_MAIN_NS}sheet"):
            if sh.get("name") == sheet_name:
                target = rid_to_target[sh.get(_XLSX_REL_ATTR)]
                break
        if target is None:
            names = [s.get("name") for s in wb.iter(f"{_XLSX_MAIN_NS}sheet")]
            raise ValueError(f"sheet {sheet_name!r} not in {names}")
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            ss = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in ss:
                shared.append(
                    "".join(t.text or "" for t in si.iter(f"{_XLSX_MAIN_NS}t"))
                )
        sheet_xml = z.read("xl/" + target.removeprefix("/xl/").lstrip("/"))
    root = ET.fromstring(sheet_xml)
    rows: list[list[str | None]] = []
    max_cols = 0
    for row in root.iter(f"{_XLSX_MAIN_NS}row"):
        cells: dict[int, str | None] = {}
        for c in row:
            ref = c.get("r")
            idx = _xlsx_col_index(ref) if ref else len(cells)
            ctype = c.get("t")
            if ctype == "inlineStr":
                val: str | None = "".join(
                    t.text or "" for t in c.iter(f"{_XLSX_MAIN_NS}t")
                )
            else:
                v = c.find(f"{_XLSX_MAIN_NS}v")
                if v is None or v.text is None:
                    val = None
                elif ctype == "s":
                    val = shared[int(v.text)]
                else:
                    val = v.text
            cells[idx] = val
        if cells:
            width = max(cells) + 1
            max_cols = max(max_cols, width)
            rows.append([cells.get(i) for i in range(width)])
    return [r + [None] * (max_cols - len(r)) for r in rows]


def xlsx_to_parquet(xlsx_path: str, out_dir: str, sheets: list[str]) -> list[str]:
    """Offline ingest converter for the reference's xlsx inputs
    (``GEM/Coalplants_GEM.R:10``): first row = header, every cell kept
    as text (``scan_excel_typed`` semantics — the pipeline's
    ``try_cast`` does the typing). One-time, driver-side, small-data by
    definition; downstream processing is all Parquet.
    """
    import pandas as pd  # noqa: PLC0415

    os.makedirs(out_dir, exist_ok=True)
    written = []
    for sheet in sheets:
        grid = read_xlsx_sheet(xlsx_path, sheet)
        header = [h if h is not None else f"col_{i}" for i, h in enumerate(grid[0])]
        # astype("string"): an all-empty column would otherwise be
        # written with an integer/null parquet type, breaking
        # unionByName type alignment with sheets where it has values
        frame = pd.DataFrame(grid[1:], columns=header, dtype=object).astype("string")
        path = os.path.join(out_dir, f"{sheet.replace(' ', '_')}.parquet")
        frame.to_parquet(path, index=False)
        written.append(path)
    return written


def read_ns_timestamp_parquet(spark: SparkSession, path: str, ts_cols: list[str]) -> DataFrame:
    """Read parquet containing TIMESTAMP(NANOS) columns, which Spark 4
    rejects outright: read nanos as long, convert to microsecond
    TimestampType (lossless when the writer had µs precision, matching
    DuckDB's ns→µs truncation)."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ts_cols:
        if dict(df.dtypes).get(c) == "bigint":
            # Integer division: ns epochs exceed double's 53-bit mantissa,
            # so `(col / 1000).cast("long")` (double math) reads ~1.6% of
            # µs-aligned stamps 1µs low. `div` stays in long arithmetic.
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_testdata(spark: SparkSession, sf_dir: str, register_views: bool = True) -> dict[str, DataFrame]:
    """Load the driver's synthetic tables and (optionally) register
    them as temp views so ``spark.sql`` works against the same names
    DuckDB pre-registers."""
    out: dict[str, DataFrame] = {}
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            if name == "events":  # nanosecond timestamps
                df = read_ns_timestamp_parquet(spark, path, ["ts"])
            else:
                df = spark.read.parquet(path)
            out[name] = df
            if register_views:
                df.createOrReplaceTempView(name)
    return out


def scan_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    corrupt_col: str | None = None,
) -> DataFrame:
    """Read JSON-lines (the de-facto interchange format for text
    corpora). An explicit schema skips Spark's inference pass — at
    100 TB, inference is a full extra scan; always pass one in
    production.

    ``corrupt_col``: web-scale corpora always contain malformed lines;
    naming a column here keeps the scan in PERMISSIVE mode and lands
    each unparseable line's raw text there instead of failing the job
    (FAILFAST) or silently dropping it (DROPMALFORMED) — quarantine
    with ``df.filter(col(corrupt_col).isNotNull())``. Spark requires
    the corrupt column declared in the schema, so it is auto-appended
    here — callers pass only their data schema."""
    reader = spark.read
    if corrupt_col is not None:
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", corrupt_col
        )
        if schema is not None:
            if isinstance(schema, str):
                from pyspark.sql.types import (  # noqa: PLC0415
                    _parse_datatype_string,
                )

                schema = cast(StructType, _parse_datatype_string(schema))
            if corrupt_col not in schema.fieldNames():
                from pyspark.sql.types import (  # noqa: PLC0415
                    StringType,
                    StructField,
                )

                schema = StructType(
                    list(schema.fields) + [StructField(corrupt_col, StringType())]
                )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def sink_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """Write JSON-lines, one object per row, partitioned like any
    distributed sink; pass ``compression="gzip"`` for the compressed
    corpus-dump convention (gzip splits per FILE, so set a sensible
    partition count upstream)."""
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def sink_parquet_replace_partitions(
    df: DataFrame, path: str, partition_by: list[str]
) -> None:
    """Incremental load: overwrite ONLY the partitions present in
    ``df`` (dynamic partition overwrite), leaving the rest of the table
    untouched — the idempotent daily-reload pattern for a 100 TB
    partitioned table; a plain ``overwrite`` would truncate everything.
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def sink_parquet_clustered(
    df: DataFrame,
    path: str,
    cluster_by: str,
    num_files: int,
    mode: str = "overwrite",
) -> None:
    """Range-clustered parquet layout: ``repartitionByRange`` (sampled
    range boundaries → one contiguous key range per output file) +
    ``sortWithinPartitions`` (sorted row groups → tight per-row-group
    min/max statistics). Downstream scans filtering on ``cluster_by``
    then skip whole files and row groups via parquet min/max pruning —
    the data-layout half of scan performance that a plain write
    throws away."""
    (
        df.repartitionByRange(num_files, cluster_by)
        .sortWithinPartitions(cluster_by)
        .write.mode(mode)
        .parquet(path)
    )


def scan_parquet_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet table whose files were written under several
    schema versions (``mergeSchema``): the unified schema is the union
    of all file schemas, with NULLs where a file lacks a column — the
    contract a long-lived 100 TB table accretes. Costs a footer scan
    per file; store the merged schema in a catalog once the table is
    large."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_files: int,
    cluster_by: str | None = None,
) -> None:
    """Small-files compaction — the maintenance job every long-lived
    table needs once streaming/incremental writers have fragmented it
    (each tiny file costs a scan task + a footer read; 100k files of
    1 MB is a planner stall). Rewrites to ``target_files`` outputs,
    optionally re-clustering on a key while at it (free locality since
    the data is being rewritten anyway)."""
    df = spark.read.parquet(path)
    if cluster_by is not None:
        df.repartitionByRange(target_files, cluster_by).sortWithinPartitions(
            cluster_by
        ).write.mode("overwrite").parquet(out_path)
    else:
        df.repartition(target_files).write.mode("overwrite").parquet(out_path)


def with_provenance(df: DataFrame, col_name: str = "_source_file") -> DataFrame:
    """Row-level lineage: attach the source file path each row was read
    from (``input_file_name``) — the quarantine/debug handle when a bad
    upstream shard poisons a 100 TB table ("which file did this row
    come from?"). Zero-cost: the value is already in the scan context."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    return df.withColumn(col_name, F.input_file_name())



def scan_orc(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    schema: StructType | None = None,
) -> DataFrame:
    """ORC source (Spark built-in, no extra package): columnar like
    parquet, with the same pushdown properties — predicate filters and
    the ``columns`` projection reach the ORC reader (PushedFilters /
    selected-column pruning in the scan node), so a 2-column read of a
    wide table touches 2 streams. ``schema`` skips footer inference
    (and enforces types) the same way the typed scanners do.
    Interchange format for Hive-ecosystem corpora."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.orc(path)
    return df.select(*columns) if columns else df


def sink_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "zstd",
) -> None:
    """ORC sink with zstd (Spark-bundled) compression; optional
    hive-style partition directories for downstream partition
    pruning, same contract as the parquet writer."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)

def scan_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: StructType | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """XML source via Spark 4's NATIVE xml data source (the spark-xml
    package folded into core by SPARK-44265 — no extra jar): every
    ``row_tag`` element becomes a row, attributes surface as ``_attr``
    columns, nested elements as structs. ``schema`` skips the
    double-pass inference read (recommended for large feeds — XML
    inference reads every byte); ``columns`` prunes post-parse.

    Scale note: XML splits per FILE, not per block — a single 100 GB
    feed parses on one task. Shred big feeds into many files upstream
    (the standard dump layout: sub-GB chunks) so the scan
    parallelizes; everything downstream is ordinary columnar."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.load(path)
    return df.select(*columns) if columns else df


def sink_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """XML sink (native writer, one file per partition wrapped in
    ``root_tag``) — the interchange shape legacy feeds expect back."""
    (
        df.write.mode(mode)
        .format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .save(path)
    )


def scan_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Whole-file binary ingest via Spark's ``binaryFile`` source:
    ``(path, modificationTime, length, content)`` with one row per
    file — the standard on-ramp for raw media (images/audio/video)
    into the multimodal operators, which expect exactly this
    ``content: binary`` column shape. ``glob`` filters by filename
    pattern at LISTING time (pruned before any read); ``max_bytes``
    pushes a length predicate so oversized blobs never transfer —
    both reach the file index, not a post-scan filter. Files are
    indivisible rows: partition parallelism is per-file, and one
    giant file should be chunked upstream."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    return df


def _fwf_lines(
    spark: SparkSession,
    path: str,
    header: bool,
    skip_blank_lines: bool = True,
):
    """Shared read plumbing for the fixed-width scans: one raw line per
    row. header=True routes through the CSV source with an unused
    separator (\\x01 never appears in fixed-width text) so the per-file
    header skip is Spark's own distributed-safe logic; quote="" turns
    quote handling off so a leading '"' byte stays literal (column
    offsets depend on it).

    Blank-line contract: with the default ``skip_blank_lines=True``,
    lines that are empty OR whitespace-only are skipped in both modes
    (the CSV source unconditionally drops them as empty; the text path
    filters to match). This is STRICTER than readr's
    ``skip_empty_rows=TRUE``, which skips only truly empty rows — a
    legitimate record whose every field is blank is all spaces and
    would be dropped here. ``skip_blank_lines=False`` (header=False
    mode only) keeps whitespace-only lines as records, filtering only
    zero-length lines; the CSV header path cannot opt out, so that
    combination raises. Returns ``(frame, value_column)``."""
    if header:
        if not skip_blank_lines:
            raise ValueError(
                "skip_blank_lines=False requires header=False: the CSV "
                "source used for the distributed-safe header skip drops "
                "whitespace-only lines unconditionally. Strip the header "
                "upstream or read with header=False."
            )
        lines = (
            spark.read.option("header", "true")
            .option("sep", "\x01")
            .option("quote", "")
            .option("inferSchema", "false")
            .csv(path)
        )
        return lines, F.col(lines.columns[0])
    lines = spark.read.text(path)
    if skip_blank_lines:
        lines = lines.filter(F.trim("value") != "")
    else:
        lines = lines.filter(F.col("value") != "")
    return lines, F.col("value")


def scan_fwf(
    spark: SparkSession,
    path: str,
    fields: list[tuple[str, int]],
    types: dict[str, str] | None = None,
    header: bool = False,
    empty_as_null: bool = True,
    skip_blank_lines: bool = True,
) -> DataFrame:
    """Fixed-width file scan — the ``readr::read_fwf`` analogue the
    reference ecosystem reads mainframe/agency extracts with.
    ``fields`` is an ordered ``[(name, width), ...]`` list; ``types``
    optionally maps column names to Spark type strings applied via
    ``try_cast`` (ANSI-safe: malformed cells become NULL, never a job
    abort). Values are trimmed; with ``empty_as_null`` all-blank cells
    become NULL (matching the CSV reader's treatment of empties).

    Plan/scale: one line-oriented text scan + a single narrow
    projection of ``substring`` slices — fully JVM-side, splittable by
    line like any text source, no Python in the path. ``header=True``
    drops the first line of EVERY file (per-file headers), implemented
    by reading through the CSV source with an unused separator so the
    distributed-safe header logic is Spark's own, not a row-number
    hack that breaks under partitioned reads. Quote processing is
    disabled on that CSV read (``quote=""``) so a line whose first
    byte happens to be ``"`` is NOT dequoted — fixed-width offsets
    must see the raw bytes.

    Blank lines: by default (``skip_blank_lines=True``) lines that are
    empty OR whitespace-only are skipped in both modes — STRICTER than
    readr's ``skip_empty_rows=TRUE`` (which skips only truly empty
    rows), so a record whose every field is legitimately blank (all
    spaces) is treated as a non-record. Pass
    ``skip_blank_lines=False`` (header=False mode only — the CSV
    header path drops blanks unconditionally and raises on the
    combination) to keep whitespace-only lines as all-NULL rows; only
    zero-length lines are skipped then.
    """
    if not fields:
        raise ValueError("fields must name at least one (name, width)")
    lines, value = _fwf_lines(spark, path, header, skip_blank_lines)
    types = types or {}
    cols = []
    pos = 1
    for name, width in fields:
        if width <= 0:
            raise ValueError(f"width for {name} must be positive")
        c = F.trim(F.substring(value, pos, width))
        if empty_as_null:
            c = F.when(c != "", c)
        if name in types:
            c = c.try_cast(types[name])
        cols.append(c.alias(name))
        pos += width
    return lines.select(*cols)


def scan_fwf_positions(
    spark: SparkSession,
    path: str,
    positions: list[tuple[str, int, int]],
    types: dict[str, str] | None = None,
    header: bool = False,
    empty_as_null: bool = True,
    skip_blank_lines: bool = True,
) -> DataFrame:
    """Fixed-width scan by explicit column POSITIONS — the
    ``readr::fwf_positions`` analogue, for layouts with gaps or
    overlapping reads that contiguous ``(name, width)`` specs can't
    express. ``positions`` is ``[(name, start, end), ...]`` with
    1-based INCLUSIVE bounds (readr's convention); columns may skip
    bytes between them or overlap (re-reading a span under two names
    is allowed and sometimes wanted — e.g. a composite key plus its
    parts). Same trimming / ``empty_as_null`` / ``try_cast`` / header
    / blank-line / ``skip_blank_lines`` semantics as :func:`scan_fwf`
    (including the default's whitespace-only skip being stricter than
    readr's truly-empty-only skip), and the same plan shape: one line
    scan + a narrow ``substring`` projection, fully JVM-side and
    line-splittable at any scale.
    """
    if not positions:
        raise ValueError("positions must name at least one (name, start, end)")
    for name, start, end in positions:
        if start < 1 or end < start:
            raise ValueError(
                f"positions for {name} must satisfy 1 <= start <= end, "
                f"got ({start}, {end})"
            )
    lines, value = _fwf_lines(spark, path, header, skip_blank_lines)
    types = types or {}
    cols = []
    for name, start, end in positions:
        c = F.trim(F.substring(value, start, end - start + 1))
        if empty_as_null:
            c = F.when(c != "", c)
        if name in types:
            c = c.try_cast(types[name])
        cols.append(c.alias(name))
    return lines.select(*cols)
