"""Golden micro corpus — port of the reference's own integration test
(`/root/reference/tests/test.rs:76-334`, FIXTURES.md §3).

Four documents, only `body` indexed (the reference schema marks title
and url index_lexical=false, test.rs:26-29), Bm25f + SingleTerm:

    doc0 body "body1"
    doc1 body "body1"
    doc2 body "body2 test"
    doc3 body "body3 test"

Golden assertions from test.rs:
* `+body2 +test` (intersection): 1 result, count_total 1 (test.rs:151-177)
* `test` (union, Count): count_total 2 (test.rs:181-210)
* empty query, 4 results; first docid 3 desc / 0 asc (test.rs:215-334)
* get_document(0).body == "body1"; delete → gone from results
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from seekstorm_spark.index.builder import IndexBuilder
from seekstorm_spark.query.engine import (
    browse,
    count_matches,
    delete_documents,
    search,
)

BODIES = ["body1", "body1", "body2 test", "body3 test"]


@pytest.fixture(scope="module")
def golden(spark, tmp_path_factory):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(4), "body": BODIES})
    )
    path = str(tmp_path_factory.mktemp("golden") / "idx")
    store = IndexBuilder(spark, path, n_buckets=4).build(
        docs, text_col="body", id_col="doc_id"
    )
    return store, docs


def test_indexed_doc_count(golden):
    store, _ = golden
    assert store.n_docs == 4  # test.rs:93


def test_intersection_body2_test(spark, golden):
    store, _ = golden
    rows = search(
        spark, store, "+body2 +test", top_k=10, default_type="union"
    ).collect()
    assert len(rows) == 1  # test.rs:170
    assert rows[0]["docid"] == 2
    assert count_matches(spark, store, "+body2 +test", "union") == 1  # :177


def test_union_test_count(spark, golden):
    store, _ = golden
    assert count_matches(spark, store, "test", "union") == 2  # test.rs:210


def test_empty_query_browse(spark, golden):
    store, _ = golden
    desc = browse(spark, store, top_k=10, descending=True).collect()
    assert len(desc) == 4  # test.rs:249
    assert desc[0]["docid"] == 3  # test.rs:246 (default descending)
    asc = browse(spark, store, top_k=10, descending=False).collect()
    assert asc[0]["docid"] == 0  # test.rs:321


def test_iterator_min_max_prev(spark, golden):
    store, _ = golden
    # min docid (test.rs:110), max docid (test.rs:117), previous (test.rs:124)
    assert browse(spark, store, 1, descending=False).collect()[0]["docid"] == 0
    assert browse(spark, store, 1, descending=True).collect()[0]["docid"] == 3
    assert (
        browse(spark, store, 1, offset=1, descending=True).collect()[0]["docid"] == 2
    )


def test_get_document_roundtrip(spark, golden):
    store, docs = golden
    top = search(spark, store, "+body2 +test", top_k=1, default_type="union")
    fetched = top.join(docs, top.docid == docs.doc_id).select("body").collect()
    assert fetched[0]["body"] == "body2 test"
    assert (
        docs.filter(F.col("doc_id") == 0).select("body").collect()[0]["body"]
        == "body1"
    )


def test_delete_document(spark, golden):
    store, _ = golden
    assert count_matches(spark, store, "body2 test", "intersection") == 1
    delete_documents(spark, store, [2])
    assert count_matches(spark, store, "body2 test", "intersection") == 0
    assert search(
        spark, store, "+body2 +test", top_k=10, default_type="union"
    ).collect() == []
    # unaffected docs still searchable; counts reflect the delete
    assert count_matches(spark, store, "test", "union") == 1  # doc3 only
    live = browse(spark, store, top_k=10, descending=False).collect()
    assert [r["docid"] for r in live] == [0, 1, 3]
