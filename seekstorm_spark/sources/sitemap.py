"""XML sitemap acquisition (sitemaps.org protocol).

The third leg of the crawl-acquisition stack next to
:mod:`seekstorm_spark.sources.warc` (fetched content) and
:mod:`seekstorm_spark.functions.robots` (fetch policy): sitemaps
enumerate a host's URLs with optional last-modification times — the
standard seed/refresh signal for a large crawl.

Implements the published protocol (https://www.sitemaps.org/protocol.html):
``<urlset>`` documents with ``<url><loc>``/``<lastmod>`` entries and
``<sitemapindex>`` documents pointing at child sitemaps, plain or
gzipped. Parsing is namespace-agnostic (the spec's namespace URI has
drifted across versions in the wild).

Scale shape mirrors the WARC reader: ``binaryFile`` (one task per
sitemap file — 50k-URL/50MB files per the spec, not splittable when
gzipped) + an Arrow-batched parser; parallelism = file count, which
is the real sitemap layout (one-to-few files per host).
"""

from __future__ import annotations

import gzip
import io
import xml.etree.ElementTree as ET
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
)

SITEMAP_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"

SITEMAP_SCHEMA = StructType(
    [
        StructField("sitemap_file", StringType()),
        StructField("kind", StringType()),  # 'url' | 'sitemap'
        StructField("loc", StringType()),
        StructField("lastmod", StringType()),  # W3C datetime, raw
    ]
)

_GZ_MAGIC = b"\x1f\x8b"

# The protocol caps a sitemap at 50 MB *uncompressed*; crawl bytes are
# untrusted, so enforce a hard ceiling on decompression (a hostile
# member can otherwise expand to gigabytes inside an executor task).
MAX_UNCOMPRESSED = 64 * 1024 * 1024


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_sitemap(data: bytes) -> list[tuple[str, str, str | None]]:
    """Entries of one sitemap document: ``(kind, loc, lastmod)`` with
    kind ``'url'`` (urlset member) or ``'sitemap'`` (index member).
    Gzipped payloads decompress transparently; undecodable documents
    return [] (a crawl drops them, it doesn't die)."""
    if data[:2] == _GZ_MAGIC:
        try:
            # bounded streaming decompress: read one byte past the cap
            # so an over-limit document is detected and dropped rather
            # than ballooning executor memory
            with gzip.GzipFile(fileobj=io.BytesIO(data)) as gz:
                data = gz.read(MAX_UNCOMPRESSED + 1)
        except OSError:
            return []
        if len(data) > MAX_UNCOMPRESSED:
            return []
    # reject DTDs outright: the spec never uses them and expat entity
    # expansion (billion laughs) is the classic XML OOM on old builds
    if b"<!DOCTYPE" in data[:4096] or b"<!ENTITY" in data[:4096]:
        return []
    try:
        root = ET.fromstring(data)
    except ET.ParseError:
        return []
    rootname = _localname(root.tag)
    if rootname not in ("urlset", "sitemapindex"):
        return []
    kind = "url" if rootname == "urlset" else "sitemap"
    out: list[tuple[str, str, str | None]] = []
    for entry in root:
        if _localname(entry.tag) not in ("url", "sitemap"):
            continue
        loc = None
        lastmod = None
        for child in entry:
            name = _localname(child.tag)
            if name == "loc":
                loc = (child.text or "").strip()
            elif name == "lastmod":
                lastmod = (child.text or "").strip() or None
        if loc:
            out.append((kind, loc, lastmod))
    return out


def build_sitemap(
    entries: list[tuple[str, str | None]], index: bool = False,
    compress: bool = False,
) -> bytes:
    """Deterministic serializer (fixtures/tests): ``entries`` =
    [(loc, lastmod-or-None)]; ``index=True`` emits a
    ``<sitemapindex>``. Identical input → identical bytes."""
    root, item = (
        ("sitemapindex", "sitemap") if index else ("urlset", "url")
    )
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>\n',
        f'<{root} xmlns="{SITEMAP_NS}">\n',
    ]
    for loc, lastmod in entries:
        parts.append(f"  <{item}>\n    <loc>{loc}</loc>\n")
        if lastmod is not None:
            parts.append(f"    <lastmod>{lastmod}</lastmod>\n")
        parts.append(f"  </{item}>\n")
    parts.append(f"</{root}>\n")
    raw = "".join(parts).encode("utf-8")
    if compress:
        return gzip.compress(raw, 6, mtime=0)
    return raw


def read_sitemaps(spark: SparkSession, path: str) -> DataFrame:
    """Read sitemap files → DataFrame(sitemap_file, kind, loc,
    lastmod) — one row per ``<url>``/``<sitemap>`` entry, in document
    order. One task per file (binaryFile), Arrow-batched parsing."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = list(SITEMAP_SCHEMA.fieldNames())
        for pdf in batches:
            rows = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                for kind, loc, lastmod in parse_sitemap(bytes(content)):
                    rows.append((fname, kind, loc, lastmod))
            yield pd.DataFrame(rows, columns=cols)

    raw = (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
    )
    return raw.mapInPandas(parse, SITEMAP_SCHEMA)


