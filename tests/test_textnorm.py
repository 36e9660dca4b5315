"""Corpus-level Unicode normalization (functions/textnorm.py): the
Python twin, the Spark UDF, and the DuckDB mirror must produce
byte-identical output."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from seekstorm_spark.functions.textnorm import (
    normalize_sql,
    normalize_text,
    normalize_text_py,
)

CASES = [
    "Café​  du\trag\x07on\r\n\r\n\r\nx ",
    "plain text",
    "a\rb\r\nc",
    "  lead \t trail\t",
    "zero​width­hyphen﻿bom⁠joiner",
    "many\n\n\n\n\nnewlines\n\n\nkept",
    "\x00\x01\x02\x1f\x7f\x9f",
    "",
    "ümlaut ﬁ ligature stays under NFC",
]


def test_python_twin_semantics():
    assert normalize_text_py(CASES[0]) == "Café du ragon\n\nx"
    assert normalize_text_py("a\rb\r\nc") == "a\nb\nc"
    assert normalize_text_py("many\n\n\n\nx") == "many\n\nx"
    assert normalize_text_py("\x00\x01") == ""
    assert normalize_text_py(None) is None
    # NFC does NOT decompose compatibility chars (ﬁ survives)
    assert "ﬁ" in normalize_text_py("a ﬁ b")
    # NFKC does
    assert "fi" in normalize_text_py("a ﬁ b", form="NFKC")


def test_duckdb_mirror_byte_identical():
    con = duckdb.connect()
    sql = normalize_sql("?::VARCHAR")
    for c in CASES:
        py = normalize_text_py(c)
        db = con.execute(f"select {sql}", [c]).fetchone()[0]
        assert py == db, repr(c)


def test_spark_udf_matches_twin(spark):
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(CASES)], "id long, text string"
    )
    rows = (
        df.select("id", normalize_text("text").alias("n"))
        .orderBy("id")
        .collect()
    )
    for i, r in enumerate(rows):
        assert r["n"] == normalize_text_py(CASES[i]), i


def test_bad_form_rejected():
    with pytest.raises(ValueError, match="unknown normalization form"):
        normalize_text(F.lit("x"), form="NFX")
