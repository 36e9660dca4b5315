"""End-to-end with a stopword list configured: positions must not
advance over removed stopwords (reference tokenizer.rs:584-586), which
changes BM25 doc lengths AND phrase adjacency."""

from __future__ import annotations

import pandas as pd
import pytest

from seekstorm_spark.index.builder import IndexBuilder
from seekstorm_spark.oracle import build_oracle_index, search_oracle
from seekstorm_spark.query.engine import count_matches, search

STOPS = frozenset({"the", "a", "of"})

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "a quick brown cat sleeps",
    "the brown of the quick fox",
    "quick the brown",  # stopword between: 'quick brown' IS adjacent after removal
    "quick dog brown",  # real word between: NOT adjacent
]


@pytest.fixture(scope="module")
def stop_index(spark, tmp_path_factory):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS})
    )
    path = str(tmp_path_factory.mktemp("stopidx") / "idx")
    store = IndexBuilder(spark, path, n_buckets=4, stop_words=STOPS).build(
        docs, text_col="text", id_col="doc_id"
    )
    oracle = build_oracle_index(dict(enumerate(TEXTS)), stop_words=STOPS)
    return store, oracle


def test_stopword_not_indexed(spark, stop_index):
    store, _ = stop_index
    assert count_matches(spark, store, "the", "union") == 0
    # query-side stopword removal: 'the quick' behaves like 'quick'
    assert count_matches(spark, store, "the quick", "intersection") == 5


def test_phrase_across_removed_stopword(spark, stop_index):
    """'quick the brown': after stopword removal quick/brown are at
    adjacent positions → phrase '"quick brown"' matches doc 3 but not
    doc 4 (real token between)."""
    store, oracle = stop_index
    got = {
        r["docid"]
        for r in search(
            spark, store, '"quick brown"', top_k=10, default_type="union"
        ).collect()
    }
    exp, cnt = search_oracle(oracle, '"quick brown"', 10, "union", stop_words=STOPS)
    assert got == {d for d, _ in exp}
    assert 3 in got and 4 not in got and 0 in got and 1 in got
    assert count_matches(spark, store, '"quick brown"', "union") == cnt


def test_scores_match_oracle_with_stopwords(spark, stop_index):
    store, oracle = stop_index
    got = search(
        spark, store, "quick brown", top_k=5, default_type="union"
    ).collect()
    exp, _ = search_oracle(oracle, "quick brown", 5, "union", stop_words=STOPS)
    assert [(r["docid"], pytest.approx(r["score"], abs=1e-6)) for r in got] == [
        (d, pytest.approx(s, abs=1e-6)) for d, s in exp
    ]
