"""KWIC highlighting: single-term fragments and phrase spans
(reference highlighter.rs:71-382)."""

from __future__ import annotations

from pyspark.sql import functions as F

from seekstorm_spark.functions.highlight import (
    highlight_first,
    highlight_phrase,
)


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col.alias("h")).collect()[0]["h"]


def test_highlight_first_token_aligned(spark):
    col = highlight_first(F.col("text"), "fast", 10)
    assert "<b>fast</b>" in _one(spark, "a fast dog", col)
    # no match inside a longer token
    assert _one(spark, "my breakfast time", col) == ""


def test_highlight_phrase_single_span(spark):
    col = highlight_phrase(F.col("text"), ["fast", "table"], 12)
    out = _one(spark, "x fast table y", col)
    assert "<b>fast table</b>" in out
    # per-term bolding would produce two spans; phrase span is ONE
    assert out.count("<b>") == 1


def test_highlight_phrase_preserves_whitespace(spark):
    col = highlight_phrase(F.col("text"), ["fast", "table"], 20)
    out = _one(spark, "z fast  table q", col)
    assert "<b>fast  table</b>" in out


def test_highlight_phrase_absent_and_nonadjacent(spark):
    col = highlight_phrase(F.col("text"), ["fast", "table"], 10)
    assert _one(spark, "fast dog table", col) == ""
    assert _one(spark, "nothing here", col) == ""
    # token-boundary: "fastx table" must not match
    assert _one(spark, "fastx table", col) == ""


def test_highlight_phrase_empty_terms(spark):
    col = highlight_phrase(F.col("text"), [], 10)
    assert _one(spark, "anything", col) == ""
