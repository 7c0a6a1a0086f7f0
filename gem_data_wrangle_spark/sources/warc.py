"""WARC (Web ARChive, ISO 28500) ingestion + HTML text extraction —
the Common Crawl path into a training-data pipeline.

Everything here is built on public formats only: the WARC/1.0 record
grammar (version line, CRLF-terminated named headers, Content-Length
payload, blank-line terminators), per-record gzip members (the spec's
recommended compression layout, handled with stdlib zlib), the HTTP
response framing inside ``response`` records, and stdlib
``html.parser`` for tag-aware text extraction.

Scale shape: Common Crawl ships ~1 GB WARC files; the unit of
parallelism is the FILE (`spark.read.format("binaryFile")` → one task
per file → ``mapInPandas`` fan-out to records), which is exactly how
production CC pipelines shard the crawl. A 100 TB crawl is ~100k
files → ~100k tasks; per-task memory is bounded by one file. Records
stream out of the Arrow batches as (uri, date, status, payload) rows;
everything downstream (c4_filters, dedup, quality) is ordinary
column algebra.

No reference analogue (the reference repo is structured-data ETL;
this belongs to the sources extension family).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator
from html import unescape
from html.parser import HTMLParser

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "warc_file string, record_id string, warc_type string, "
    "target_uri string, warc_date string, content_type string, "
    "http_status int, payload binary"
)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the WARC layout:
    one member per record) into one plain byte stream."""
    out = []
    view = memoryview(data)
    while len(view) > 0:
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        try:
            out.append(d.decompress(bytes(view)))
        except zlib.error as e:
            raise ValueError(f"corrupt gzip member in WARC: {e}") from e
        out.append(d.flush())
        tail = d.unused_data
        if not tail:
            break
        view = memoryview(tail)
    return b"".join(out)


def parse_warc(data: bytes, warc_file: str = "") -> list[dict]:
    """Parse one WARC file's bytes into record dicts (see
    :data:`WARC_SCHEMA`). Gzip (multi-member) input is detected by
    magic and decompressed first. For ``response`` records carrying an
    ``application/http`` payload, the HTTP status line and headers are
    stripped: ``payload`` is the response BODY and ``http_status`` the
    status code; other records keep their raw payload and a NULL
    status. Malformed framing raises ``ValueError`` (the quarantine
    exception the Arrow callers catch), never Index/KeyError.
    """
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    records: list[dict] = []
    i = 0
    n = len(data)
    try:
        while i < n:
            # skip inter-record blank lines
            while i < n and data[i : i + 2] == b"\r\n":
                i += 2
            if i >= n:
                break
            eol = data.find(b"\r\n", i)
            if eol == -1:
                raise ValueError("truncated WARC version line")
            version = data[i:eol]
            if not version.startswith(b"WARC/"):
                raise ValueError(f"bad WARC version line {version[:20]!r}")
            i = eol + 2
            headers: dict[str, str] = {}
            while True:
                eol = data.find(b"\r\n", i)
                if eol == -1:
                    raise ValueError("truncated WARC header block")
                line = data[i:eol]
                i = eol + 2
                if not line:
                    break
                if b":" not in line:
                    raise ValueError(f"malformed WARC header {line[:40]!r}")
                k, v = line.split(b":", 1)
                headers[k.strip().decode("ascii", "replace").lower()] = (
                    v.strip().decode("utf-8", "replace")
                )
            try:
                length = int(headers["content-length"])
            except (KeyError, ValueError) as e:
                raise ValueError("missing/invalid Content-Length") from e
            if i + length > n:
                raise ValueError("payload overruns file")
            payload = data[i : i + length]
            i += length
            status = None
            ctype = headers.get("content-type", "")
            if payload.startswith(b"HTTP/") and ctype.startswith(
                "application/http"
            ):
                head_end = payload.find(b"\r\n\r\n")
                if head_end != -1:
                    status_line = payload.split(b"\r\n", 1)[0]
                    parts = status_line.split()
                    if len(parts) >= 2 and parts[1].isdigit():
                        status = int(parts[1])
                    payload = payload[head_end + 4 :]
            records.append(
                {
                    "warc_file": warc_file,
                    "record_id": headers.get("warc-record-id"),
                    "warc_type": headers.get("warc-type"),
                    "target_uri": headers.get("warc-target-uri"),
                    "warc_date": headers.get("warc-date"),
                    "content_type": ctype or None,
                    "http_status": status,
                    "payload": payload,
                }
            )
    except (IndexError, UnicodeDecodeError) as e:  # pragma: no cover
        raise ValueError(f"malformed WARC structure: {e}") from e
    return records


def build_warc(records: list[dict]) -> bytes:
    """Assemble WARC/1.0 bytes from record dicts — the test/fixture
    side of :func:`parse_warc` (and a valid minimal writer). Keys:
    ``warc_type``, ``target_uri``, ``payload`` (bytes), optional
    ``record_id``/``warc_date``/``content_type``."""
    out = []
    for idx, r in enumerate(records):
        payload = r["payload"]
        headers = [
            ("WARC-Type", r.get("warc_type", "response")),
            ("WARC-Record-ID", r.get("record_id", f"<urn:uuid:{idx:08d}>")),
            ("WARC-Date", r.get("warc_date", "2026-01-01T00:00:00Z")),
        ]
        if r.get("target_uri"):
            headers.append(("WARC-Target-URI", r["target_uri"]))
        if r.get("content_type"):
            headers.append(("Content-Type", r["content_type"]))
        headers.append(("Content-Length", str(len(payload))))
        head = b"WARC/1.0\r\n" + b"".join(
            f"{k}: {v}\r\n".encode() for k, v in headers
        )
        out.append(head + b"\r\n" + payload + b"\r\n\r\n")
    return b"".join(out)


def scan_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read WARC file(s) into a record DataFrame (:data:`WARC_SCHEMA`).

    ``binaryFile`` source → one task per WARC file (the Common Crawl
    sharding unit) → Arrow-batched ``mapInPandas`` explodes records.
    Unparseable files yield a single quarantine row (NULL fields,
    ``warc_type='_error'``) instead of failing the job — the same
    corrupt-blob contract as the image codecs.
    """
    import pandas as pd  # noqa: PLC0415

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = [
            "warc_file", "record_id", "warc_type", "target_uri",
            "warc_date", "content_type", "http_status", "payload",
        ]
        for pdf in it:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                try:
                    rows.extend(parse_warc(bytes(blob), warc_file=p))
                except ValueError:
                    rows.append(
                        {c: None for c in cols}
                        | {"warc_file": p, "warc_type": "_error"}
                    )
            out = pd.DataFrame(rows, columns=cols)
            out["http_status"] = out["http_status"].astype("Int32")
            yield out

    return files.mapInPandas(batches, schema=WARC_SCHEMA)


class _TextExtractor(HTMLParser):
    """Boilerplate-aware text extraction: drops script/style/template
    subtrees, emits newlines at block boundaries, inlines the rest."""

    _SKIP = {"script", "style", "noscript", "template", "head"}
    _BLOCK = {
        "p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3", "h4",
        "h5", "h6", "tr", "table", "section", "article", "header",
        "footer", "blockquote", "pre",
    }

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in self._SKIP:
            self._skip_depth += 1
        elif tag in self._BLOCK:
            self.parts.append("\n")

    def handle_endtag(self, tag):
        if tag in self._SKIP and self._skip_depth > 0:
            self._skip_depth -= 1
        elif tag in self._BLOCK:
            self.parts.append("\n")

    def handle_data(self, data):
        if self._skip_depth == 0:
            self.parts.append(data)


def html_to_text(html: str) -> str:
    """Extract visible text from HTML: script/style/head subtrees
    dropped, block elements become line breaks, entities unescaped
    (via ``convert_charrefs``), whitespace collapsed per line, blank
    lines squeezed. Pure stdlib; deterministic."""
    p = _TextExtractor()
    try:
        p.feed(html)
        p.close()
    except Exception as e:  # html.parser is forgiving; belt-and-braces
        raise ValueError(f"unparseable HTML: {e}") from e
    raw = "".join(p.parts)
    lines = [" ".join(ln.split()) for ln in raw.split("\n")]
    out: list[str] = []
    for ln in lines:
        if ln:
            out.append(ln)
        elif out and out[-1] != "":
            out.append("")
    while out and out[-1] == "":
        out.pop()
    return "\n".join(out)


def extract_text_from_html(
    df: DataFrame, html_col: str, out_col: str = "text"
) -> DataFrame:
    """``html_to_text`` over a column, Arrow-batched (``mapInPandas``
    keeps the stdlib parser off the row-at-a-time UDF path). Binary
    input is decoded as UTF-8 with replacement. NULL html → NULL
    text; unparseable rows yield NULL (quarantine, never a crashed
    task)."""
    import pandas as pd  # noqa: PLC0415

    cols = df.columns
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} string"

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            texts = []
            for v in pdf[html_col]:
                if v is None:
                    texts.append(None)
                    continue
                s = (
                    bytes(v).decode("utf-8", "replace")
                    if isinstance(v, (bytes, bytearray))
                    else str(v)
                )
                try:
                    texts.append(html_to_text(s))
                except ValueError:
                    texts.append(None)
            out = pdf[cols].copy()
            out[out_col] = texts
            yield out

    return df.mapInPandas(batches, schema=schema)
