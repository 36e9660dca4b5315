"""Sitemap acquisition (sitemaps.org protocol): serializer/parser
round-trip, gzip handling, malformed-input tolerance, and the Spark
binaryFile surface."""

from __future__ import annotations

from seekstorm_spark.sources.sitemap import (
    build_sitemap,
    parse_sitemap,
    read_sitemaps,
)


def test_roundtrip_urlset_and_index():
    sm = build_sitemap(
        [("http://a.test/1", "2024-01-02"), ("http://a.test/2", None)]
    )
    assert parse_sitemap(sm) == [
        ("url", "http://a.test/1", "2024-01-02"),
        ("url", "http://a.test/2", None),
    ]
    idx = build_sitemap(
        [("http://a.test/sm1.xml", "2024-02-03T04:05:06Z")], index=True
    )
    assert parse_sitemap(idx) == [
        ("sitemap", "http://a.test/sm1.xml", "2024-02-03T04:05:06Z")
    ]


def test_gzip_and_determinism():
    gz1 = build_sitemap([("http://a.test/z", None)], compress=True)
    gz2 = build_sitemap([("http://a.test/z", None)], compress=True)
    assert gz1 == gz2  # mtime pinned
    assert parse_sitemap(gz1) == [("url", "http://a.test/z", None)]


def test_malformed_inputs_dropped():
    assert parse_sitemap(b"not xml") == []
    assert parse_sitemap(b"<html><body>x</body></html>") == []
    assert parse_sitemap(b"\x1f\x8btruncated gz") == []
    # entry without <loc> is skipped
    xml = (b'<?xml version="1.0"?><urlset><url><lastmod>2024-01-01'
           b"</lastmod></url><url><loc>http://a.test/ok</loc></url></urlset>")
    assert parse_sitemap(xml) == [("url", "http://a.test/ok", None)]


def test_namespace_agnostic():
    xml = (
        b'<?xml version="1.0"?>'
        b'<urlset xmlns="http://www.google.com/schemas/sitemap/0.84">'
        b"<url><loc>http://a.test/old-ns</loc></url></urlset>"
    )
    assert parse_sitemap(xml) == [("url", "http://a.test/old-ns", None)]


def test_read_sitemaps_spark(spark, tmp_path):
    d = tmp_path / "maps"
    d.mkdir()
    (d / "a.xml").write_bytes(
        build_sitemap([(f"http://h.test/p{i}", f"2024-01-{i+1:02d}")
                       for i in range(5)])
    )
    (d / "b.xml.gz").write_bytes(
        build_sitemap([("http://h.test/gzpage", None)], compress=True)
    )
    (d / "junk.xml").write_bytes(b"<broken")
    rows = read_sitemaps(spark, str(d)).collect()
    locs = sorted(r["loc"] for r in rows)
    assert locs == sorted(
        [f"http://h.test/p{i}" for i in range(5)] + ["http://h.test/gzpage"]
    )
    by_loc = {r["loc"]: r for r in rows}
    assert by_loc["http://h.test/p2"]["lastmod"] == "2024-01-03"
    assert by_loc["http://h.test/gzpage"]["lastmod"] is None
    assert all(r["kind"] == "url" for r in rows)
