"""canonicalize_url / url_host hand-vector tests (JVM-expression path)."""

from __future__ import annotations

from pyspark.sql import functions as F

from seekstorm_spark.functions.urlnorm import canonicalize_url, url_host

VECTORS = [
    # (input, canonical, host)
    (
        "HTTP://Example.COM:80/Path/One?b=2&a=1#frag",
        "http://example.com/Path/One?a=1&b=2",
        "example.com",
    ),
    (
        "https://Example.com:443/",
        "https://example.com/",
        "example.com",
    ),
    (
        "http://example.com:8080?utm_source=feed&z=9",
        "http://example.com:8080/?z=9",
        "example.com",
    ),
    (
        "http://example.com/a?gclid=XyZ&fbclid=1&utm_medium=x",
        "http://example.com/a",
        "example.com",
    ),
    (
        "  http://EXAMPLE.com/CaseKept/Path  ",
        "http://example.com/CaseKept/Path",
        "example.com",
    ),
    (
        "http://example.com/p?dup=1&dup=1&c=3",
        "http://example.com/p?c=3&dup=1&dup=1",
        "example.com",
    ),
    (
        "ftp://Files.example.com:21/pub",
        "ftp://files.example.com:21/pub",
        "files.example.com",
    ),
    # scheme-less: trimmed + fragment-stripped only
    ("/relative/path?utm_source=x#f", "/relative/path?utm_source=x", ""),
    ("example.com/no-scheme", "example.com/no-scheme", ""),
    ("http://example.com", "http://example.com/", "example.com"),
    # utm_ with no '=' is still tracking; ref_src too
    (
        "https://t.co/x?ref_src=twsrc&utm_&k=v",
        "https://t.co/x?k=v",
        "t.co",
    ),
]


def test_canonicalize_vectors(spark):
    df = spark.createDataFrame(
        [(i, v[0]) for i, v in enumerate(VECTORS)], "i long, url string"
    )
    rows = (
        df.select(
            "i",
            canonicalize_url("url").alias("canon"),
            url_host("url").alias("host"),
        )
        .orderBy("i")
        .collect()
    )
    for r, (src, want_canon, want_host) in zip(rows, VECTORS):
        assert r["canon"] == want_canon, src
        assert r["host"] == want_host, src


def test_canonical_idempotent(spark):
    df = spark.createDataFrame(
        [(i, v[0]) for i, v in enumerate(VECTORS)], "i long, url string"
    )
    once = df.select("i", canonicalize_url("url").alias("u"))
    twice = once.select("i", canonicalize_url("u").alias("u2"), "u")
    assert twice.filter(F.col("u") != F.col("u2")).count() == 0


def test_plan_is_jvm_only(spark):
    df = spark.createDataFrame([(1, "http://a.com/")], "i long, url string")
    plan = (
        df.select(canonicalize_url("url"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
