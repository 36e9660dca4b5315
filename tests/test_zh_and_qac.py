"""ZH end-to-end indexing with the bundled frequency dictionary, and
QAC multi-gram suggestions through tokenizer_lite.

Reference: UnicodeAlphanumericZH + word_segmentation.rs (bundled
dictionary asset), tokenizer_lite QAC pipeline (tokenizer.rs:1393-1668).
"""

from __future__ import annotations

from seekstorm_spark.index.builder import IndexBuilder
from seekstorm_spark.query.engine import count_matches, search
from seekstorm_spark.query.spell import build_completion_dictionary, complete
from seekstorm_spark.tokenizer import tokenize_line, tokenize_lite
from seekstorm_spark.zh_dictionary import (
    BUILTIN_ZH_DICTIONARY,
    build_dictionary_from_corpus,
)


def test_zh_tokenizer_segments_real_words():
    toks = tokenize_line("我们在北京学习中文", "unicode_alphanumeric_zh")
    assert "我们" in toks and "北京" in toks and "中文" in toks
    # multi-char word beats char-by-char split
    assert tokenize_line("搜索引擎", "unicode_alphanumeric_zh") == ["搜索引擎"]


def test_zh_mixed_script():
    toks = tokenize_line("Spark是搜索引擎", "unicode_alphanumeric_zh")
    assert toks == ["spark", "是", "搜索引擎"]


def test_zh_index_e2e(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (0, "我们在北京学习中文"),
            (1, "他们使用搜索引擎查询文档"),
            (2, "spark是分布式计算系统"),
            (3, "搜索引擎需要索引和查询"),
        ],
        "doc_id long, text string",
    )
    store = IndexBuilder(
        spark, str(tmp_path / "zh"), n_buckets=4,
        tokenizer="unicode_alphanumeric_zh",
    ).build(docs, text_col="text", id_col="doc_id")
    hits = {r["docid"] for r in search(spark, store, "搜索引擎").collect()}
    assert hits == {1, 3}
    assert count_matches(spark, store, "搜索引擎", "union") == 2
    hits = {r["docid"] for r in search(spark, store, "北京 中文", default_type="intersection").collect()}
    assert hits == {0}
    # phrase across segmented words: adjacency holds in doc 1 only
    hits = {
        r["docid"]
        for r in search(spark, store, '"搜索引擎 查询"', default_type="union").collect()
    }
    assert hits == {1}
    # reversed order is never adjacent
    hits = {
        r["docid"]
        for r in search(spark, store, '"查询 搜索引擎"', default_type="union").collect()
    }
    assert hits == set()


def test_build_dictionary_from_corpus(spark):
    docs = spark.createDataFrame(
        [(0, "北京 中文 学习"), (1, "北京 学习"), (2, "学习 学习")],
        "doc_id long, text string",
    )
    d = build_dictionary_from_corpus(docs, min_count=2)
    assert d["学习"] == 4 and d["北京"] == 2 and "中文" not in d


def test_tokenize_lite_ignores_operators():
    assert tokenize_lite('+fast -dup "table scan"') == [
        "fast", "dup", "table", "scan",
    ]


def test_qac_bigram_completions(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (0, "fast table scan wins"),
            (1, "fast table merge"),
            (2, "fast track record"),
            (3, "slow table scan"),
        ],
        "doc_id long, text string",
    )
    store = IndexBuilder(spark, str(tmp_path / "qac"), n_buckets=4).build(
        docs, text_col="text", id_col="doc_id"
    )
    build_completion_dictionary(spark, store, docs=docs)
    sugg = complete(store, "fast t", k=3)
    assert sugg[0][0] == "fast table" and sugg[0][1] == 2
    assert ("fast track", 1) in sugg
    # unigram completions still work
    assert complete(store, "tab", k=1)[0][0] == "table"
    # multi-gram prefix with the pair order reversed finds nothing
    assert complete(store, "table f", k=1) == []
