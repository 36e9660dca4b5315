"""PDF ingestion (sources/pdf.py — reference ingest.rs:79-545 PDF
path, rebuilt stdlib-only): serializer→parser round trips, the PDF
string escape set, TJ kerning arrays, hex strings, page-tree
ordering, and the binaryFile + mapInPandas Spark reader."""

from __future__ import annotations

import zlib

from seekstorm_spark.sources.pdf import (
    build_pdf,
    extract_content_text,
    extract_pdf_pages,
    read_pdf,
)


def test_roundtrip_multipage():
    pages = [
        "hello world\nsecond line",
        "page two only",
        "third page\nwith\nthree lines",
    ]
    for compress in (True, False):
        data = build_pdf(pages, compress=compress)
        assert data.startswith(b"%PDF-1.4")
        assert data.rstrip().endswith(b"%%EOF")
        assert extract_pdf_pages(data) == pages


def test_roundtrip_escapes_and_nonascii():
    pages = ["parens (nested (deep)) and \\backslash\\",
             "tab\there | caf\xe9 na\xefve",
             ""]
    assert extract_pdf_pages(build_pdf(pages)) == pages


def test_build_pdf_deterministic():
    pages = ["alpha", "beta\ngamma"]
    assert build_pdf(pages) == build_pdf(pages)


def test_content_text_operators():
    # TJ kerning array concatenates; ' and Tj each produce a line;
    # hex strings decode
    content = (
        b"BT /F1 12 Tf 72 720 Td\n"
        b"[(Hel) -30 (lo) 5 ( wo) (rld)] TJ\n"
        b"(next) Tj\n"
        b"(apo) '\n"
        b"<48695F21> Tj\n"
        b"ET"
    )
    assert extract_content_text(content) == "Hello world\nnext\napo\nHi_!"


def test_foreign_object_order_respects_page_tree():
    """Pages listed in /Kids order even when the content objects sit
    in a different byte order (hand-built, Length-indirect, mixed
    raw/Flate) — the parser must follow the tree, not the file."""
    c1 = b"BT (first page) Tj ET"
    c2raw = zlib.compress(b"BT (second page) Tj ET")
    body = b"%PDF-1.4\n"
    objs = {
        7: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [5 0 R 3 0 R] /Count 2 >>",
        # page 1 of the TREE is object 5, whose content (obj 9) sits
        # LAST in the file; /Length via indirection (obj 8)
        5: b"<< /Type /Page /Parent 2 0 R /Contents 9 0 R >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: b"<< /Length "
        + str(len(c2raw)).encode()
        + b" /Filter /FlateDecode >>\nstream\n"
        + c2raw
        + b"\nendstream",
        8: str(len(c1)).encode(),
        9: b"<< /Length 8 0 R >>\nstream\n" + c1 + b"\nendstream",
    }
    for num, ob in objs.items():
        body += f"{num} 0 obj\n".encode() + ob + b"\nendobj\n"
    body += b"trailer\n<< /Size 10 /Root 7 0 R >>\nstartxref\n0\n%%EOF\n"
    assert extract_pdf_pages(body) == ["first page", "second page"]


def test_garbage_and_unsupported_filters():
    assert extract_pdf_pages(b"not a pdf at all") == []
    assert extract_pdf_pages(b"") == []
    # unsupported filter: page comes back empty, no crash
    bad = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length 4 /Filter /DCTDecode >>\nstream\nABCD\nendstream\nendobj\n"
        b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )
    assert extract_pdf_pages(bad) == [""]


def test_read_pdf_spark(spark, tmp_path):
    """binaryFile → mapInPandas reader: one row per page, 1-based
    page numbers in tree order, across multiple files."""
    (tmp_path / "a.pdf").write_bytes(build_pdf(["a one", "a two"]))
    (tmp_path / "b.pdf").write_bytes(
        build_pdf(["b only\nline2"], compress=False)
    )
    df = read_pdf(spark, str(tmp_path)).orderBy("pdf_file", "page")
    rows = [(r["pdf_file"].rsplit("/", 1)[-1], r["page"], r["text"])
            for r in df.collect()]
    assert rows == [
        ("a.pdf", 1, "a one"),
        ("a.pdf", 2, "a two"),
        ("b.pdf", 1, "b only\nline2"),
    ]


def test_read_pdf_docs_document_shape(spark, tmp_path):
    """read_pdf_docs produces the reference's 4-field PDF document
    (ingest.rs:389-395): body = pages joined with ' \\n', /Info title
    + CreationDate when present, first-line/default fallbacks when
    not; undecodable files are dropped."""
    from seekstorm_spark.sources.pdf import build_pdf, read_pdf_docs

    d = tmp_path / "pdfs"
    d.mkdir()
    (d / "a.pdf").write_bytes(
        build_pdf(["alpha one.", "beta two."], title="The A Title",
                  creation_date="D:20230501120000Z")
    )
    (d / "b.pdf").write_bytes(build_pdf(["First Line Here\nrest", "more"]))
    (d / "c.pdf").write_bytes(b"%PDF-1.4 truncated junk")
    rows = {
        r["pdf_file"].rsplit("/", 1)[-1]: r
        for r in read_pdf_docs(spark, str(d), default_date=777).collect()
    }
    assert set(rows) == {"a.pdf", "b.pdf"}  # c dropped
    a = rows["a.pdf"]
    assert a["title"] == "The A Title"
    assert a["date"] == 1682942400
    assert a["text"] == "alpha one. \nbeta two. \n"
    b = rows["b.pdf"]
    assert b["title"] == "First Line Here"
    assert b["date"] == 777
