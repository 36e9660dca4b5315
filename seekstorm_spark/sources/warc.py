"""WARC (ISO 28500) ingest — Common-Crawl-style crawl archives.

The BASELINE input is "an Iceberg table of Common-Crawl-style web
pages (url, warc_ts, html, text, lang)"; this module is the step
BEFORE that table exists: turning raw ``.warc`` / ``.warc.gz`` crawl
files into exactly that shape, so ``read_warc → extract_text →
IndexBuilder`` is a complete crawl-to-index pipeline.

Scale design: ``spark.read.format("binaryFile")`` yields ONE ROW PER
FILE — a gzipped WARC is a stream of per-record gzip members and is
not splittable, so the file is the natural unit of work. That matches
Common Crawl's layout (segments of ~1 GB ``warc.gz`` files, ~72k
files per monthly crawl): parallelism = number of files, each task
bounded by one file's size. The record parser runs once per file
inside ``mapInPandas`` (Arrow-batched), entirely executor-side.

The reference engine starts from already-extracted documents
(``ingest.rs`` reads JSON/CSV/PDF); WARC is the upstream acquisition
format its users would feed from — beyond-reference surface, same
spirit as ``sources/webtext.py``'s HTML extraction.
"""

from __future__ import annotations

import datetime as dt
import gzip
import hashlib
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_CRLF = b"\r\n"
_WARC_DATE_FMT = "%Y-%m-%dT%H:%M:%SZ"

# output shape of read_warc — the input_hint table minus (text, lang),
# which extract_text / lang_id add downstream
WARC_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("record_type", StringType()),
        StructField("http_status", IntegerType()),
        StructField("content_type", StringType()),
        StructField("html", BinaryType()),
        StructField("warc_file", StringType()),
    ]
)


def build_warc(
    records: Iterable[dict],
    version: str = "1.0",
    gzip_members: bool = False,
) -> bytes:
    """Serialize records into a valid WARC file (deterministic — the
    record id derives from the URL, no RNG/clock), for fixtures and
    round-trip tests. Each record dict: ``url`` (required), ``html``
    (bytes or str), ``date`` (datetime or pre-formatted string,
    default epoch), ``status`` (default 200), ``content_type``
    (default text/html). ``gzip_members=True`` emits one gzip member
    per record — the Common Crawl on-disk layout."""
    out = []
    for rec in records:
        url = rec["url"]
        html = rec.get("html", b"")
        if isinstance(html, str):
            html = html.encode("utf-8")
        date = rec.get("date") or dt.datetime(
            2026, 1, 1, tzinfo=dt.timezone.utc
        )
        if isinstance(date, dt.datetime):
            date = date.strftime(_WARC_DATE_FMT)
        status = int(rec.get("status", 200))
        ctype = rec.get("content_type", "text/html")
        http_head = (
            f"HTTP/1.1 {status} OK\r\n"
            f"Content-Type: {ctype}\r\n"
            f"Content-Length: {len(html)}\r\n\r\n"
        ).encode("ascii")
        payload = http_head + html
        rid = hashlib.sha1(url.encode("utf-8")).hexdigest()
        head = (
            f"WARC/{version}\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {date}\r\n"
            f"WARC-Record-ID: <urn:sha1:{rid}>\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode("ascii")
        member = head + payload + _CRLF + _CRLF
        if gzip_members:
            # mtime=0 keeps the bytes deterministic
            member = gzip.compress(member, mtime=0)
        out.append(member)
    return b"".join(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(_CRLF):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("ascii", "replace").lower()] = (
                v.strip().decode("ascii", "replace")
            )
    return headers


def parse_warc_bytes(
    data: bytes, warc_file: str = ""
) -> Iterator[tuple]:
    """Yield (url, warc_ts, record_type, http_status, content_type,
    body, warc_file) per WARC record. Length-prefixed sequential scan
    (Content-Length is authoritative — bodies may contain anything,
    including 'WARC/1.0'); tolerant of a missing trailing CRLF pair
    and of junk between records (resyncs on the next 'WARC/' magic).
    Gzipped input (single- or multi-member, the Common Crawl layout)
    is detected by magic and decompressed first."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)  # handles concatenated members
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            return
        head_end = data.find(_CRLF + _CRLF, start)
        if head_end < 0:
            return
        headers = _parse_headers(data[start:head_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = start + 5  # malformed header block: resync
            continue
        body_start = head_end + 4
        if body_start + length > n:
            return  # truncated tail record: never yield a cut body
        payload = data[body_start : body_start + length]
        pos = body_start + length
        rtype = headers.get("warc-type", "")
        url = headers.get("warc-target-uri")
        ts = None
        raw_date = headers.get("warc-date")
        if raw_date:
            try:
                ts = dt.datetime.strptime(
                    raw_date, _WARC_DATE_FMT
                ).replace(tzinfo=dt.timezone.utc)
            except ValueError:
                ts = None
        status = None
        ctype = headers.get("content-type")
        body = payload
        if headers.get("content-type", "").startswith("application/http"):
            split = payload.find(_CRLF + _CRLF)
            if split >= 0:
                http_head = payload[:split]
                body = payload[split + 4 :]
                http_headers = _parse_headers(http_head)
                ctype = http_headers.get("content-type", ctype)
                first = http_head.split(_CRLF, 1)[0].split(b" ")
                if len(first) >= 2 and first[1].isdigit():
                    status = int(first[1])
        yield (url, ts, rtype, status, ctype, body, warc_file)


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """Read ``.warc`` / ``.warc.gz`` files → DataFrame(url, warc_ts,
    record_type, http_status, content_type, html, warc_file).

    One task per file (binaryFile rows; gzip members aren't
    splittable), parser executor-side via mapInPandas — no driver
    data. Downstream: ``extract_text(df, "html")`` for the text
    column, then IndexBuilder. ``record_types=None`` keeps every
    record (warcinfo/request/metadata included)."""
    types = tuple(record_types) if record_types else None

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = list(WARC_SCHEMA.fieldNames())
        for pdf in batches:
            rows = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_bytes(bytes(content), fname):
                    if types is None or rec[2] in types:
                        rows.append(rec)
            out = pd.DataFrame(rows, columns=cols)
            # object → typed columns Arrow accepts (None-safe)
            out["warc_ts"] = pd.to_datetime(out["warc_ts"], utc=True)
            out["http_status"] = out["http_status"].astype("Int32")
            yield out

    raw = (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
    )
    return raw.mapInPandas(parse, WARC_SCHEMA)
