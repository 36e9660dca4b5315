"""XXH64 parity with Spark's xxhash64 (the term-bucket contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seekstorm_spark.hashing import term_bucket, xxh64, xxh64_signed

KNOWN_TERMS = [
    "",
    "a",
    "hello",
    "term00042",
    "fast",
    "ü日本語",
    "x" * 31,
    "x" * 32,
    "x" * 33,
    "x" * 100,
    "don't",
    "c++",
]


def test_xxh64_reference_vectors():
    # spec test vectors (xxhash.com, seed 0)
    assert xxh64(b"", seed=0) == 0xEF46DB3751D8E999
    assert xxh64(b"a", seed=0) == 0xD24EC4F1A98C6E5B


def test_matches_spark_xxhash64(spark):
    df = spark.createDataFrame([(t,) for t in KNOWN_TERMS], "term string").select(
        "term",
        F.xxhash64("term").alias("h"),
        F.pmod(F.xxhash64("term"), F.lit(32)).cast("int").alias("b"),
    )
    for r in df.collect():
        assert xxh64_signed(r["term"].encode()) == r["h"], r["term"]
        assert term_bucket(r["term"], 32) == r["b"], r["term"]
