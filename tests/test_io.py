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


def _write_mini_xlsx(path):
    """Hand-assemble a tiny xlsx (zip of XML parts) — exercises shared
    strings, inline strings, skipped cells, and an all-empty column."""
    import zipfile

    ct = (
        '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        "</Types>"
    )
    wb = (
        '<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="Units" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>'
        "</Relationships>"
    )
    ss = (
        '<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">'
        "<si><t>id</t></si><si><t>name</t></si><si><t>empty</t></si></sst>"
    )
    sheet = (
        '<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>'
        '<row r="2"><c r="A2"><v>1</v></c><c r="B2" t="inlineStr"><is><t>alpha</t></is></c></row>'
        '<row r="3"><c r="A3"><v>2</v></c></row>'  # B3 skipped entirely
        "</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", ct)
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/sharedStrings.xml", ss)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def test_xlsx_ingest_stdlib_reader(spark, tmp_path):
    xlsx = str(tmp_path / "mini.xlsx")
    _write_mini_xlsx(xlsx)
    grid = IO.read_xlsx_sheet(xlsx, "Units")
    assert grid[0] == ["id", "name", "empty"]
    assert grid[1] == ["1", "alpha", None]
    assert grid[2] == ["2", None, None]
    with pytest.raises(ValueError, match="not in"):
        IO.read_xlsx_sheet(xlsx, "NoSuchSheet")

    written = IO.xlsx_to_parquet(xlsx, str(tmp_path / "out"), sheets=["Units"])
    back = spark.read.parquet(written[0])
    # every column string-typed, including the all-empty one
    assert all(t == "string" for _, t in back.dtypes)
    rows = {r["id"]: r for r in back.collect()}
    assert rows["1"]["name"] == "alpha" and rows["2"]["name"] is None


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


def test_jsonl_corrupt_record_quarantine(spark, tmp_path):
    from gem_data_wrangle_spark.sources.io import scan_jsonl

    p = tmp_path / "corpus.jsonl"
    p.write_text('{"doc_id": 1, "text": "ok"}\nnot json at all\n{"doc_id": 2, "text": "fine"}\n')
    df = scan_jsonl(
        spark, str(p),
        schema="doc_id BIGINT, text STRING, _bad STRING",
        corrupt_col="_bad",
    )
    rows = df.collect()
    good = [r for r in rows if r._bad is None]
    bad = [r for r in rows if r._bad is not None]
    assert sorted(r.doc_id for r in good) == [1, 2]
    assert len(bad) == 1 and bad[0]._bad.startswith("not json")


def test_clustered_sink_disjoint_file_ranges(spark, tmp_path):
    """Range clustering must put one contiguous key range per file so
    min/max pruning can skip whole files."""
    import glob as globmod

    from gem_data_wrangle_spark.sources.io import sink_parquet_clustered

    df = spark.range(10_000).selectExpr("id", "id % 977 AS payload")
    path = str(tmp_path / "clustered")
    sink_parquet_clustered(df, path, "id", num_files=4)
    files = sorted(globmod.glob(f"{path}/part-*.parquet"))
    assert len(files) == 4
    ranges = []
    for f in files:
        part = spark.read.parquet(f).agg(
            {"id": "min"}
        ).collect()[0][0], spark.read.parquet(f).agg({"id": "max"}).collect()[0][0]
        ranges.append(part)
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # disjoint, contiguous ranges


def test_scan_parquet_evolving_merges_schemas(spark, tmp_path):
    from gem_data_wrangle_spark.sources.io import scan_parquet_evolving

    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id bigint, v string").write.parquet(path)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id bigint, v string, score double"
    ).write.mode("append").parquet(path)
    df = scan_parquet_evolving(spark, path)
    assert set(df.columns) == {"id", "v", "score"}
    rows = {r.id: r.score for r in df.collect()}
    assert rows == {1: None, 2: 9.5}


def test_compact_parquet_reduces_files(spark, tmp_path):
    import glob as globmod

    from gem_data_wrangle_spark.sources.io import compact_parquet

    frag = str(tmp_path / "fragmented")
    compacted = str(tmp_path / "compacted")
    spark.range(1000).repartition(20).write.parquet(frag)
    assert len(globmod.glob(f"{frag}/part-*.parquet")) == 20
    compact_parquet(spark, frag, compacted, target_files=2)
    assert len(globmod.glob(f"{compacted}/part-*.parquet")) == 2
    assert spark.read.parquet(compacted).count() == 1000


def test_with_provenance_names_source_file(spark, tmp_path):
    from gem_data_wrangle_spark.sources.io import with_provenance

    p = str(tmp_path / "prov")
    spark.range(10).write.parquet(p)
    out = with_provenance(spark.read.parquet(p))
    files = {r["_source_file"] for r in out.collect()}
    assert files and all("prov" in f and f.endswith(".parquet") for f in files)


def test_scan_jsonl_permissive_corrupt_capture(spark, tmp_path):
    from gem_data_wrangle_spark.sources.io import scan_jsonl, sink_jsonl

    p = tmp_path / "corpus.jsonl"
    p.write_text(
        '{"id": 1, "text": "hello"}\n'
        "NOT JSON AT ALL\n"
        '{"id": 2, "text": "world", "extra": true}\n'
        '{"id": 3}\n'
    )
    df = scan_jsonl(spark, str(p), "id bigint, text string",
                    corrupt_col="_corrupt_record")
    rows = df.collect()
    good = {r["id"]: r["text"] for r in rows if r["id"] is not None}
    assert good == {1: "hello", 2: "world", 3: None}
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    # the malformed line survives WITH its raw text (quarantinable),
    # it neither kills the read nor silently vanishes
    assert len(bad) == 1 and bad[0]["_corrupt_record"] == "NOT JSON AT ALL"

    out = tmp_path / "out"
    sink_jsonl(
        df.filter("id is not null").select("id", "text"), str(out),
        compression="gzip",
    )
    assert spark.read.json(str(out)).count() == 3


def test_xml_roundtrip_native_source(spark, tmp_path):
    from gem_data_wrangle_spark.sources.io import scan_xml, sink_xml

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, None)], "id long, name string"
    )
    path = str(tmp_path / "xml_out")
    sink_xml(df, path, row_tag="rec", root_tag="recs")
    back = scan_xml(spark, path, row_tag="rec")
    got = {r["id"]: r["name"] for r in back.collect()}
    assert got == {1: "alpha", 2: "beta", 3: None}
    # column pruning arg
    only = scan_xml(spark, path, row_tag="rec", columns=["id"])
    assert only.columns == ["id"]


def test_scan_binary_files_glob_and_size(spark, tmp_path):
    from gem_data_wrangle_spark.sources.io import scan_binary_files

    (tmp_path / "a.bin").write_bytes(b"\x01" * 10)
    (tmp_path / "b.bin").write_bytes(b"\x02" * 1000)
    (tmp_path / "c.txt").write_bytes(b"skip")
    df = scan_binary_files(spark, str(tmp_path), glob="*.bin", max_bytes=100)
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["length"] == 10 and rows[0]["content"] == b"\x01" * 10
    assert set(df.columns) == {"path", "modificationTime", "length", "content"}


def test_scan_fwf_roundtrip(spark, tmp_path):
    from gem_data_wrangle_spark.sources.io import scan_fwf

    p = tmp_path / "plants.fwf"
    p.write_text(
        "Plant A   DE2024  12.50\n"
        "Plant B   FR      43.10\n"   # blank year -> NULL
        "Plant C   XXabcd   1.00\n"   # malformed year -> try_cast NULL
    )
    out = scan_fwf(
        spark,
        str(p),
        fields=[("name", 10), ("iso2", 2), ("year", 4), ("cap", 7)],
        types={"year": "int", "cap": "double"},
    ).orderBy("name").collect()
    assert [tuple(r) for r in out] == [
        ("Plant A", "DE", 2024, 12.5),
        ("Plant B", "FR", None, 43.1),
        ("Plant C", "XX", None, 1.0),
    ]


def test_scan_fwf_header_skip_is_per_file(spark, tmp_path):
    from gem_data_wrangle_spark.sources.io import scan_fwf

    d = tmp_path / "fwf"
    d.mkdir()
    for i in (1, 2):
        (d / f"part{i}.fwf").write_text(
            "NAME      VAL\n" + f"row{i}      {i * 10:3d}\n"
        )
    out = scan_fwf(
        spark, str(d), fields=[("name", 10), ("val", 3)],
        types={"val": "int"}, header=True,
    ).orderBy("name").collect()
    assert [tuple(r) for r in out] == [("row1", 10), ("row2", 20)]


def test_scan_fwf_validates_fields(spark, tmp_path):
    import pytest as _pytest

    from gem_data_wrangle_spark.sources.io import scan_fwf

    with _pytest.raises(ValueError, match="at least one"):
        scan_fwf(spark, str(tmp_path), fields=[])
    with _pytest.raises(ValueError, match="positive"):
        scan_fwf(spark, str(tmp_path), fields=[("a", 0)])
