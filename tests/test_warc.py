"""Tests for WARC ingestion (ISO 28500) + HTML text extraction."""

from __future__ import annotations

import gzip
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gem_data_wrangle_spark.sources.warc import (  # noqa: E402
    build_warc,
    extract_text_from_html,
    html_to_text,
    parse_warc,
    scan_warc,
)

HTTP_HEAD = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"


def _resp(uri: str, body: bytes, status: bytes = b"200 OK") -> dict:
    return {
        "warc_type": "response",
        "target_uri": uri,
        "content_type": "application/http; msgtype=response",
        "payload": b"HTTP/1.1 " + status + b"\r\nX-H: 1\r\n\r\n" + body,
    }


def test_parse_warc_roundtrip_plain_and_gzip():
    recs = [
        {
            "warc_type": "warcinfo",
            "content_type": "application/warc-fields",
            "payload": b"software: test\r\n",
        },
        _resp("http://a.example/x", b"<html>A</html>"),
        _resp("http://b.example/y", b"not found", status=b"404 Not Found"),
    ]
    blob = build_warc(recs)
    for data in (blob, gzip.compress(blob)):
        out = parse_warc(data, warc_file="f.warc")
        assert len(out) == 3
        assert out[0]["warc_type"] == "warcinfo"
        assert out[0]["http_status"] is None
        assert out[0]["payload"] == b"software: test\r\n"
        assert out[1]["target_uri"] == "http://a.example/x"
        assert out[1]["http_status"] == 200
        assert out[1]["payload"] == b"<html>A</html>"  # HTTP head stripped
        assert out[2]["http_status"] == 404
        assert out[2]["payload"] == b"not found"
        assert all(r["warc_file"] == "f.warc" for r in out)


def test_parse_warc_per_record_gzip_members():
    # the spec's recommended layout: each record its own gzip member
    recs = [_resp(f"http://m.example/{i}", f"body{i}".encode()) for i in range(3)]
    data = b"".join(gzip.compress(build_warc([r])) for r in recs)
    out = parse_warc(data)
    assert [r["payload"] for r in out] == [b"body0", b"body1", b"body2"]


def test_parse_warc_corrupt_raises_valueerror_only():
    blob = build_warc([_resp("http://a/x", b"hello world")])
    for cut in range(1, len(blob), 3):
        try:
            parse_warc(blob[:cut])
        except ValueError:
            pass
    with pytest.raises(ValueError, match="version"):
        parse_warc(b"NOTWARC/1.0\r\n\r\n")
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc(b"WARC/1.0\r\nWARC-Type: response\r\n\r\n")
    with pytest.raises(ValueError, match="gzip"):
        parse_warc(b"\x1f\x8b\x08" + b"\x00" * 20)


def test_html_to_text_extraction_rules():
    html = (
        "<html><head><title>T</title><style>p{color:red}</style></head>"
        "<body><h1>Head  line</h1><p>one &amp; two</p>"
        "<script>var x = 'invisible';</script>"
        "<div>a<br>b</div><ul><li>i1</li><li>i2</li></ul>"
        "<span>inline</span> tail</body></html>"
    )
    out = html_to_text(html)
    assert "invisible" not in out and "color" not in out and "T" not in out
    lines = out.split("\n")
    assert lines[0] == "Head line"          # whitespace collapsed
    assert "one & two" in lines             # entity unescaped
    assert "a" in lines and "b" in lines    # <br> is a break
    assert "i1" in lines and "i2" in lines
    assert lines[-1] == "inline tail"
    # squeeze: no consecutive blanks, no leading/trailing blanks
    assert lines[0] != "" and lines[-1] != ""
    assert all(not (x == "" and y == "") for x, y in zip(lines, lines[1:]))


def test_html_to_text_plain_and_empty():
    assert html_to_text("just text, no tags") == "just text, no tags"
    assert html_to_text("") == ""
    assert html_to_text("<p></p><p></p>") == ""


def test_scan_warc_spark_path(spark, tmp_path):
    for i in range(3):
        recs = [
            _resp(f"http://ex.com/{i}/a", f"<html>{i}a</html>".encode()),
            _resp(f"http://ex.com/{i}/b", f"<html>{i}b</html>".encode()),
        ]
        data = build_warc(recs)
        if i == 2:
            data = gzip.compress(data)
        (tmp_path / f"part-{i}.warc{'.gz' if i == 2 else ''}").write_bytes(data)
    # one corrupt file -> quarantine row, not a crashed job
    (tmp_path / "bad.warc").write_bytes(b"GARBAGE")
    out = scan_warc(spark, str(tmp_path)).collect()
    good = [r for r in out if r["warc_type"] == "response"]
    bad = [r for r in out if r["warc_type"] == "_error"]
    assert len(good) == 6 and len(bad) == 1
    assert {r["target_uri"] for r in good} == {
        f"http://ex.com/{i}/{s}" for i in range(3) for s in "ab"
    }
    assert all(r["http_status"] == 200 for r in good)
    assert bad[0]["warc_file"].endswith("bad.warc")


def test_extract_text_from_html_column(spark):
    df = spark.createDataFrame(
        [
            (1, "<p>hello <b>world</b></p><script>no</script>"),
            (2, None),
            (3, "plain"),
        ],
        "id bigint, html string",
    )
    out = {r["id"]: r["text"] for r in extract_text_from_html(df, "html").collect()}
    assert out[1] == "hello world"
    assert out[2] is None
    assert out[3] == "plain"


def test_warc_to_training_text_pipeline(spark, tmp_path):
    """End-to-end: WARC files -> records -> HTML text -> c4 gate —
    the Common Crawl ingestion recipe in miniature."""
    from pyspark.sql import functions as F

    from gem_data_wrangle_spark.operators.textops import c4_filters

    good = "This sentence is long enough to survive the gate."
    html = f"<html><body><p>{good}</p><p>short.</p></body></html>"
    (tmp_path / "cc.warc").write_bytes(
        build_warc([_resp("http://cc.example/1", html.encode())])
    )
    recs = scan_warc(spark, str(tmp_path)).filter(F.col("http_status") == 200)
    texts = extract_text_from_html(
        recs.select("target_uri", F.col("payload").alias("html")), "html"
    )
    gated = c4_filters(texts, "text", "target_uri")
    r = gated.collect()[0]
    assert r["text_clean"] == good
    assert r["n_kept"] == 1
