"""WARC ingest: build_warc → read_warc round-trips (plain + gzipped
members), the parser survives junk and truncation, and the full
crawl-to-index pipeline (read_warc → extract_text → IndexBuilder →
search) works end-to-end."""

from __future__ import annotations

import datetime as dt
import gzip

import pytest

from seekstorm_spark.sources.warc import (
    build_warc,
    parse_warc_bytes,
    read_warc,
)


def _recs(n: int, prefix: str = "http://ex.com/") -> list[dict]:
    return [
        {
            "url": f"{prefix}{i}",
            "html": f"<html><body><p>doc {i} body &amp; text</p></body></html>",
            "date": dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
            + dt.timedelta(seconds=i),
            "status": 200 if i % 5 else 404,
        }
        for i in range(n)
    ]


def test_parse_roundtrip_plain_and_gzip():
    recs = _recs(7)
    for gz in (False, True):
        data = build_warc(recs, gzip_members=gz)
        got = list(parse_warc_bytes(data, "f"))
        assert len(got) == 7
        for rec, (url, ts, rtype, status, ctype, body, fname) in zip(
            recs, got
        ):
            assert url == rec["url"] and rtype == "response"
            assert ts == rec["date"] and status == rec["status"]
            assert ctype == "text/html" and fname == "f"
            assert body.decode() == rec["html"]


def test_parse_body_containing_warc_magic():
    """Content-Length is authoritative: a body containing the literal
    record magic must not desync the scan."""
    evil = "fake\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\n trap"
    data = build_warc(
        [{"url": "http://a", "html": evil}, {"url": "http://b", "html": "ok"}]
    )
    got = list(parse_warc_bytes(data))
    assert [g[0] for g in got] == ["http://a", "http://b"]
    assert got[0][5].decode() == evil


def test_parse_tolerates_junk_and_truncation():
    recs = _recs(3)
    data = b"JUNK-PREFIX\r\n" + build_warc(recs)
    got = list(parse_warc_bytes(data))
    assert [g[0] for g in got] == [r["url"] for r in recs]
    # truncated final record: earlier records still parse
    cut = list(parse_warc_bytes(data[: len(data) - 40]))
    assert len(cut) == 2
    assert list(parse_warc_bytes(b"")) == []
    assert list(parse_warc_bytes(b"no warc here")) == []


def test_gzip_multi_member_is_common_crawl_layout():
    """gzip_members=True emits one member per record (the CC layout);
    decompressing yields the plain serialization."""
    recs = _recs(4)
    gz = build_warc(recs, gzip_members=True)
    assert gz[:2] == b"\x1f\x8b"
    assert gzip.decompress(gz) == build_warc(recs)


def test_read_warc_spark_roundtrip(spark, tmp_path):
    recs = _recs(40)
    (tmp_path / "a.warc").write_bytes(build_warc(recs[:25]))
    (tmp_path / "b.warc.gz").write_bytes(
        build_warc(recs[25:], gzip_members=True)
    )
    df = read_warc(spark, str(tmp_path))
    rows = {r["url"]: r for r in df.collect()}
    assert len(rows) == 40
    for rec in recs:
        r = rows[rec["url"]]
        assert bytes(r["html"]).decode() == rec["html"]
        assert r["http_status"] == rec["status"]
        assert r["record_type"] == "response"
        assert r["warc_ts"] is not None
    # file lineage column distinguishes sources
    assert {r["warc_file"].rsplit("/", 1)[-1] for r in rows.values()} == {
        "a.warc", "b.warc.gz",
    }


def test_read_warc_type_filter(spark, tmp_path):
    # hand-build a warcinfo record + a response record
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
        b"Content-Type: application/warc-fields\r\n"
        b"Content-Length: 9\r\n\r\nsoftware\n\r\n\r\n"
    )
    data = info + build_warc([{"url": "http://x", "html": "hi"}])
    (tmp_path / "c.warc").write_bytes(data)
    only_resp = read_warc(spark, str(tmp_path)).collect()
    assert [r["url"] for r in only_resp] == ["http://x"]
    everything = read_warc(spark, str(tmp_path), record_types=None).collect()
    assert sorted(r["record_type"] for r in everything) == [
        "response", "warcinfo",
    ]


def test_warc_to_index_pipeline(spark, tmp_path):
    """The full acquisition path: WARC files → read_warc →
    extract_text (byte-identical body text) → IndexBuilder → search
    finds the right page by URL."""
    from pyspark.sql import functions as F

    from seekstorm_spark.index.builder import IndexBuilder, assign_docids
    from seekstorm_spark.query.engine import search
    from seekstorm_spark.sources.webtext import extract_text

    recs = [
        {
            "url": f"http://site/{i}",
            "html": f"<html><head><title>t</title></head>"
            f"<body>page {i} zzneedle{i} common words</body></html>",
        }
        for i in range(30)
    ]
    (tmp_path / "crawl.warc.gz").write_bytes(
        build_warc(recs, gzip_members=True)
    )
    crawl = read_warc(spark, str(tmp_path))
    docs = assign_docids(
        extract_text(crawl, "html", "text"), order_col="url"
    )
    got = {
        r["url"]: r["text"]
        for r in docs.select("url", "text").collect()
    }
    assert got["http://site/7"] == "page 7 zzneedle7 common words"
    store = IndexBuilder(spark, str(tmp_path / "idx"), n_buckets=4).build(
        docs, text_col="text", id_col="docid"
    )
    hits = search(spark, store, "zzneedle7", top_k=5).collect()
    urls = {
        r["url"]
        for r in docs.filter(
            F.col("docid").isin([h["docid"] for h in hits])
        ).collect()
    }
    assert urls == {"http://site/7"}
