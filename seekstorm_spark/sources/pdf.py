"""PDF text ingestion — pure-stdlib parser + deterministic fixture
serializer.

The reference ingests PDF files server-side and indexes the extracted
per-page text (`/root/reference/seekstorm_server/src/api_endpoints.rs`
index-file route; extraction in `ingest.rs:79-545` via a native PDF
library). This container ships no PDF library, so this module
implements the subset that covers machine-generated text PDFs
directly from the published PDF-1.4 object model (ISO 32000 subset):

* real object scan (``N 0 obj … endobj``), trailer ``/Root`` →
  ``/Pages`` → ``/Kids`` traversal, so PAGE ORDER comes from the page
  tree, not byte order (one-level ``/Kids`` trees; nested trees are
  flattened recursively);
* ``/Contents`` streams, raw or ``/FlateDecode`` (stdlib zlib);
  ``/Length`` indirections resolved;
* text operators ``Tj``, ``'``, ``"``, ``TJ`` (kerning arrays
  concatenate), literal strings with the full escape set (``\\(``,
  ``\\)``, ``\\\\``, ``\\n`` …, octal ``\\ddd``, line continuations)
  and hex strings ``<…>``;
* each show-text run is one output line; lines join with ``\\n`` per
  page.

Out of scope (documented, raises/skips cleanly): encrypted PDFs,
non-Flate filters (DCT/LZW/ASCII85), CID/Type0 composite fonts
(bytes are decoded latin-1), object streams (PDF 1.5 ``/ObjStm``).
Scanned/image PDFs yield empty text — the reference's OCR-less
extractor behaves the same.

`read_pdf` is the Spark surface: binaryFile (one task per file — PDFs
aren't splittable) + an Arrow-batched ``mapInPandas`` parser, one
output row per page. `build_pdf` is the deterministic fixture
serializer (valid xref + trailer; byte-stable for a given input) used
by tests and the driver row — the same build-then-reingest strategy
as :mod:`seekstorm_spark.sources.warc`.
"""

from __future__ import annotations

import os
import re
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PDF_SCHEMA = StructType(
    [
        StructField("pdf_file", StringType()),
        StructField("page", IntegerType()),  # 1-based
        StructField("text", StringType()),
    ]
)

# ---------------------------------------------------------------------------
# serializer


def _pdf_escape(line: str) -> bytes:
    out = bytearray()
    for ch in line.encode("latin-1", errors="replace"):
        if ch in (0x28, 0x29, 0x5C):  # ( ) \
            out += b"\\" + bytes([ch])
        elif 32 <= ch <= 126:
            out.append(ch)
        else:
            out += b"\\%03o" % ch
    return bytes(out)


def build_pdf(
    pages: list[str],
    compress: bool = True,
    title: str | None = None,
    creation_date: str | None = None,
) -> bytes:
    """Serialize pages of plain text into a minimal valid PDF-1.4
    (Helvetica, one ``Tj`` per line, correct xref + trailer).
    Deterministic: identical input → identical bytes. ``title`` /
    ``creation_date`` (a raw PDF date string like
    ``D:20240102030405Z``) add an ``/Info`` dictionary; when both are
    None the output is byte-identical to the pre-metadata format."""
    objs: dict[int, bytes] = {}
    n_pages = len(pages)
    font_id = 3 + 2 * n_pages
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    for i, page in enumerate(pages):
        page_id, cont_id = 3 + 2 * i, 4 + 2 * i
        objs[page_id] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font_id} 0 R >> >> "
            f"/Contents {cont_id} 0 R >>"
        ).encode()
        body = bytearray(b"BT /F1 12 Tf 72 720 Td 14 TL\n")
        for j, line in enumerate(page.split("\n")):
            if j:
                body += b"T*\n"
            body += b"(" + _pdf_escape(line) + b") Tj\n"
        body += b"ET"
        data = zlib.compress(bytes(body), 6) if compress else bytes(body)
        filt = b" /Filter /FlateDecode" if compress else b""
        objs[cont_id] = (
            b"<< /Length " + str(len(data)).encode() + filt
            + b" >>\nstream\n" + data + b"\nendstream"
        )
    objs[font_id] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    info_id = None
    if title is not None or creation_date is not None:
        info_id = font_id + 1
        parts = bytearray(b"<<")
        if title is not None:
            parts += b" /Title (" + _pdf_escape(title) + b")"
        if creation_date is not None:
            parts += b" /CreationDate (" + _pdf_escape(creation_date) + b")"
        parts += b" >>"
        objs[info_id] = bytes(parts)
    out = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    n = max(objs) + 1
    out += f"xref\n0 {n}\n".encode() + b"0000000000 65535 f \n"
    for num in range(1, n):
        out += b"%010d 00000 n \n" % offsets[num]
    info_ref = f" /Info {info_id} 0 R" if info_id is not None else ""
    out += (
        f"trailer\n<< /Size {n} /Root 1 0 R{info_ref} >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


# ---------------------------------------------------------------------------
# parser

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n", re.S)
_ESCAPES = {
    0x6E: b"\n", 0x72: b"\r", 0x74: b"\t", 0x62: b"\x08",
    0x66: b"\x0c", 0x28: b"(", 0x29: b")", 0x5C: b"\\",
}


def _ref(body: bytes, key: str) -> int | None:
    m = re.search(
        rb"/" + key.encode() + rb"\s+(\d+)\s+\d+\s+R", body
    )
    return int(m.group(1)) if m else None


def _scan_objects(data: bytes) -> dict[int, bytes]:
    return {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(data)}


def _stream_data(body: bytes, objs: dict[int, bytes]) -> bytes | None:
    m = _STREAM_RE.search(body)
    if not m:
        return None
    start = m.end()
    lm = re.search(rb"/Length\s+(\d+)(?:\s+\d+\s+R)?", body[: m.start()])
    if lm and b"R" in lm.group(0):
        ref_body = objs.get(int(lm.group(1)), b"")
        nm = re.match(rb"\s*(\d+)", ref_body)
        length = int(nm.group(1)) if nm else None
    elif lm:
        length = int(lm.group(1))
    else:
        length = None
    if length is None:
        end = body.find(b"endstream", start)
        raw = body[start:end].rstrip(b"\r\n")
    else:
        raw = body[start : start + length]
    if b"/FlateDecode" in body[: m.start()]:
        try:
            return zlib.decompress(raw)
        except zlib.error:
            return None
    if re.search(rb"/Filter\s*(?:/|\[)", body[: m.start()]):
        return None  # unsupported filter — skip, don't crash
    return raw


def _unescape_literal_bytes(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i]
        if c != 0x5C:  # backslash
            out.append(c)
            i += 1
            continue
        i += 1
        if i >= len(raw):
            break
        c = raw[i]
        if c in _ESCAPES:
            out += _ESCAPES[c]
            i += 1
        elif 0x30 <= c <= 0x37:  # octal \d, \dd, \ddd
            j = i
            while j < len(raw) and j - i < 3 and 0x30 <= raw[j] <= 0x37:
                j += 1
            out.append(int(raw[i:j], 8) & 0xFF)
            i = j
        elif c in (0x0A, 0x0D):  # line continuation
            i += 1
            if c == 0x0D and i < len(raw) and raw[i] == 0x0A:
                i += 1
        else:  # unknown escape: the char stands for itself
            out.append(c)
            i += 1
    return bytes(out)


def _unescape_literal(raw: bytes) -> str:
    return _unescape_literal_bytes(raw).decode("latin-1")


def _pdf_text_string(raw: bytes) -> str:
    """Decode a PDF *text string*: UTF-16BE when it carries the
    ``FE FF`` BOM, else PDFDocEncoding (latin-1 superset is close
    enough for the printable range we emit/ingest)."""
    if raw[:2] == b"\xfe\xff":
        try:
            return raw[2:].decode("utf-16-be")
        except UnicodeDecodeError:
            return raw[2:].decode("latin-1")
    return raw.decode("latin-1")


def _literal_string(data: bytes, at: int) -> tuple[bytes, int]:
    """Raw bytes of the ( … ) literal starting at ``at`` (balanced
    parens per spec), and the index just past the closing paren."""
    depth, i = 0, at
    start = at + 1
    while i < len(data):
        c = data[i]
        if c == 0x5C:
            i += 2
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return data[start:i], i + 1
        i += 1
    return data[start:], len(data)


def extract_content_text(content: bytes) -> str:
    """Text-showing runs of one content stream: each ``Tj``/``'``/
    ``\"`` and each ``TJ`` array is one line; lines join with \\n."""
    lines: list[str] = []
    i, n = 0, len(content)
    pending: list[str] | None = None  # inside a TJ array
    while i < n:
        c = content[i]
        if c == 0x28:  # (literal)
            raw, i = _literal_string(content, i)
            s = _unescape_literal(raw)
            # which operator follows?
            m = re.match(rb"\s*(Tj|'|\")", content[i:])
            if pending is not None:
                pending.append(s)
            elif m:
                lines.append(s)
                i += m.end()
            continue
        if c == 0x3C and i + 1 < n and content[i + 1] != 0x3C:  # <hex>
            end = content.find(b">", i)
            if end == -1:
                break
            hx = re.sub(rb"\s", b"", content[i + 1 : end])
            if len(hx) % 2:
                hx += b"0"
            s = bytes.fromhex(hx.decode("ascii")).decode("latin-1")
            if pending is not None:
                pending.append(s)
            else:
                m = re.match(rb"\s*(Tj|'|\")", content[end + 1 :])
                if m:
                    lines.append(s)
            i = end + 1
            continue
        if c == 0x5B:  # [ … ] TJ
            pending = []
            i += 1
            continue
        if c == 0x5D and pending is not None:  # ]
            m = re.match(rb"\s*TJ", content[i + 1 :])
            if m:
                lines.append("".join(pending))
            pending = None
            i += 1
            continue
        i += 1
    return "\n".join(lines)


def extract_pdf_pages(data: bytes) -> list[str]:
    """Per-page text in PAGE-TREE order. Unsupported documents
    (encrypted, no page tree) return []."""
    objs = _scan_objects(data)
    if not objs:
        return []
    root = None
    tm = re.search(rb"trailer(.*?)(?:startxref|\Z)", data, re.S)
    if tm:
        root = _ref(tm.group(1), "Root")
    if root is None:  # fall back: any object that looks like a catalog
        for num, body in objs.items():
            if b"/Type" in body and b"/Catalog" in body:
                root = num
                break
    if root is None:
        return []
    pages_ref = _ref(objs.get(root, b""), "Pages")
    if pages_ref is None:
        return []

    page_ids: list[int] = []

    def walk(node: int, depth: int = 0) -> None:
        if depth > 32:
            return
        body = objs.get(node, b"")
        if b"/Type" in body and b"/Page" in body and b"/Pages" not in body:
            page_ids.append(node)
            return
        km = re.search(rb"/Kids\s*\[(.*?)\]", body, re.S)
        if not km:
            return
        for rm in re.finditer(rb"(\d+)\s+\d+\s+R", km.group(1)):
            walk(int(rm.group(1)), depth + 1)

    walk(pages_ref)
    out: list[str] = []
    for pid in page_ids:
        texts: list[str] = []
        body = objs.get(pid, b"")
        cm = re.search(rb"/Contents\s*(?:\[(.*?)\]|(\d+)\s+\d+\s+R)", body, re.S)
        refs: list[int] = []
        if cm:
            if cm.group(1) is not None:
                refs = [
                    int(r.group(1))
                    for r in re.finditer(rb"(\d+)\s+\d+\s+R", cm.group(1))
                ]
            else:
                refs = [int(cm.group(2))]
        for ref in refs:
            stream = _stream_data(objs.get(ref, b""), objs)
            if stream:
                texts.append(extract_content_text(stream))
        out.append("\n".join(t for t in texts if t))
    return out


# ---------------------------------------------------------------------------
# metadata (reference index_pdf, ingest.rs:265-395: /Info title +
# creation date with first-line / filename / file-date fallbacks)


def _string_at(body: bytes, at: int, objs: dict[int, bytes]) -> str | None:
    """PDF string value starting at ``at``: literal, hex, or a one-hop
    indirect reference to either."""
    if at >= len(body):
        return None
    c = body[at]
    if c == 0x28:  # (literal)
        raw, _ = _literal_string(body, at)
        return _pdf_text_string(_unescape_literal_bytes(raw))
    if c == 0x3C:  # <hex>
        end = body.find(b">", at)
        if end == -1:
            return None
        hx = re.sub(rb"\s", b"", body[at + 1 : end])
        if len(hx) % 2:
            hx += b"0"
        try:
            return _pdf_text_string(bytes.fromhex(hx.decode("ascii")))
        except ValueError:
            return None
    rm = re.match(rb"(\d+)\s+\d+\s+R", body[at:])
    if rm:
        ref_body = objs.get(int(rm.group(1)), b"").lstrip()
        if ref_body[:1] in (b"(", b"<"):
            return _string_at(ref_body, 0, {})
    return None


def _dict_string(body: bytes, key: str, objs: dict[int, bytes]) -> str | None:
    m = re.search(rb"/" + key.encode() + rb"\s*", body)
    return _string_at(body, m.end(), objs) if m else None


def extract_pdf_info(data: bytes) -> dict[str, str]:
    """``/Info`` dictionary string entries we mirror from the
    reference's metadata tags (``Title``, ``CreationDate``)."""
    objs = _scan_objects(data)
    tm = re.search(rb"trailer(.*?)(?:startxref|\Z)", data, re.S)
    info_ref = _ref(tm.group(1), "Info") if tm else None
    body = objs.get(info_ref, b"") if info_ref is not None else b""
    out: dict[str, str] = {}
    for key in ("Title", "CreationDate"):
        v = _dict_string(body, key, objs)
        if v is not None:
            out[key] = v
    return out


def parse_pdf_date(value: str, fallback: int) -> int:
    """PDF date string → Unix timestamp, mirroring the reference's
    parser (ingest.rs:311-384): ``D:YYYYMMDDHHMMSS`` with optional
    ``Z`` / ``±HH'mm'`` / ``±HHmm`` suffix, then three loose textual
    formats; anything unparseable returns ``fallback``."""
    from datetime import datetime, timezone

    s = value[2:] if value.startswith("D:") else value
    if len(s) > 14 and s[14] in "zZ":
        s = s[:14]
    if len(s) in (14, 19, 20, 21):
        try:
            iso = (
                f"{s[0:4]}-{s[4:6]}-{s[6:8]}T{s[8:10]}:{s[10:12]}:{s[12:14]}"
            )
            if len(s) == 14:
                iso += "+00:00"
            elif s[17] == "'":
                iso += s[14:17] + ":" + s[18:20]
            else:
                iso += s[14:17] + ":" + s[17:19]
            return int(datetime.fromisoformat(iso).timestamp())
        except (ValueError, IndexError):
            return fallback
    norm = re.sub(r"\s+", " ", value.strip())
    for fmt in (
        "%a %b %d %H:%M:%S %Y",
        "%Y/%m/%d %H:%M:%S",
        "%m/%d/%Y %H:%M:%S",
    ):
        try:
            dt = datetime.strptime(norm, fmt).replace(tzinfo=timezone.utc)
            return int(dt.timestamp())
        except ValueError:
            continue
    return fallback


def derive_pdf_title(
    info_title: str | None, text: str, file_path: str
) -> str:
    """Reference title chain (ingest.rs:289-311): /Title metadata, else
    the first line among the first 10 whose trimmed length exceeds 1
    (truncated to 160 chars, then trimmed), else the filename stem
    with underscores removed."""
    if info_title is not None:
        return info_title
    for i, line in enumerate(text.split("\n")[:10], start=1):
        if len(line.strip()) > 1:
            return line[:160].strip()
    stem = os.path.splitext(os.path.basename(file_path))[0]
    return stem.replace("_", "")


def pdf_document(
    data: bytes,
    file_path: str = "",
    file_date: int = 0,
    now: int | None = None,
) -> dict | None:
    """Extract the reference's 4-field PDF document (ingest.rs:389-395:
    title, body, url, date). ``file_date`` is the caller's fallback
    timestamp (the reference uses file ctime / the HTTP ``date``
    header); dates in the future or negative clamp to it. Returns None
    when no text could be extracted (reference: "can't extract text
    from PDF" — scanned/encrypted documents)."""
    import time

    pages = extract_pdf_pages(data)
    text = "".join(p + " \n" for p in pages)
    if not text.strip():
        return None
    info = extract_pdf_info(data)
    title = derive_pdf_title(info.get("Title"), text, file_path)
    ts = (
        parse_pdf_date(info["CreationDate"], file_date)
        if "CreationDate" in info
        else file_date
    )
    if ts > (now if now is not None else int(time.time())) or ts < 0:
        ts = file_date
    return {"title": title, "body": text, "url": file_path, "date": ts}


# ---------------------------------------------------------------------------
# Spark surface


def read_pdf(spark: SparkSession, path: str) -> DataFrame:
    """Read ``*.pdf`` files → DataFrame(pdf_file, page, text) — one
    row per page, page numbers 1-based in page-tree order. One task
    per file (binaryFile; PDFs aren't splittable), parsing
    executor-side via Arrow-batched ``mapInPandas`` — no driver
    data, scales with file count like the WARC reader."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = list(PDF_SCHEMA.fieldNames())
        for pdf in batches:
            rows = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                for pageno, text in enumerate(
                    extract_pdf_pages(bytes(content)), start=1
                ):
                    rows.append((fname, pageno, text))
            out = pd.DataFrame(rows, columns=cols)
            out["page"] = out["page"].astype("int32")
            yield out

    raw = (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
    )
    return raw.mapInPandas(parse, PDF_SCHEMA)


PDF_DOC_SCHEMA = StructType(
    [
        StructField("pdf_file", StringType()),
        StructField("title", StringType()),
        StructField("date", LongType()),
        StructField("text", StringType()),
    ]
)


def read_pdf_docs(
    spark: SparkSession, path: str, default_date: int = 0
) -> DataFrame:
    """Read ``*.pdf`` files into the reference's PDF *document* shape
    (ingest.rs:389-395: one row per FILE with title/body/url/date —
    body = per-page text joined with ``" \\n"``, title/date from the
    /Info dictionary with the first-line / filename / fallback-date
    chain). ``default_date`` plays the file-ctime fallback role
    (deterministic, unlike mtime). Files with no extractable text are
    dropped (reference: "can't extract text from PDF"). Same scale
    shape as :func:`read_pdf`: one task per file, Arrow-batched."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = list(PDF_DOC_SCHEMA.fieldNames())
        for pdf in batches:
            rows = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                doc = pdf_document(
                    bytes(content), fname, file_date=default_date
                )
                if doc is not None:
                    rows.append(
                        (fname, doc["title"], doc["date"], doc["body"])
                    )
            out = pd.DataFrame(rows, columns=cols)
            out["date"] = out["date"].astype("int64")
            yield out

    raw = (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
    )
    return raw.mapInPandas(parse, PDF_DOC_SCHEMA)
