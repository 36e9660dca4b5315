"""ZH word segmentation: maximum-probability DP under a frequency
dictionary (reference word_segmentation.rs:95-190 algorithm)."""

from __future__ import annotations

from seekstorm_spark.word_segmentation import segment, segment_udf, tokenize_mixed

# toy frequency dictionary (a real deployment ships a full one)
DICT = {
    "中国": 1_000_000,
    "人民": 800_000,
    "中": 50_000,
    "国": 40_000,
    "人": 60_000,
    "民": 10_000,
    "银行": 500_000,
    "中国人": 200_000,
    "北京": 700_000,
}


def test_segment_prefers_dictionary_words():
    assert segment("中国人民银行", DICT) == ["中国", "人民", "银行"]
    # "中国人" vs "中国"+"人": P(中国人) vs P(中国)P(人) — product of two
    # smaller probabilities loses to the single trigram entry
    assert segment("中国人", DICT) == ["中国人"]


def test_segment_unknown_chars_fall_through():
    toks = segment("中国X民", DICT)
    assert "中国" in toks and "".join(toks) == "中国X民"


def test_tokenize_mixed_scripts():
    toks = tokenize_mixed("Visit 北京 and 中国人民银行 today", DICT)
    assert toks == ["visit", "北京", "and", "中国", "人民", "银行", "today"]


def test_segment_udf(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("北京中国银行",), ("hello 中国",)], "t string")
    udf = segment_udf(DICT)
    got = [r[0] for r in df.select(udf(F.col("t"))).collect()]
    assert got == [["北京", "中国", "银行"], ["hello", "中国"]]
