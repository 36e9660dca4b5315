"""Document iterator (reference get_iterator, api_endpoints.rs:
1027-1146 / the IteratorResult contract): anchored, signed-take,
skip-aware sequential access over live docids, with end/begin
detection via short results and short skips. Plus the REST
/iterator endpoint (GET + POST) with include_document from the
columnar doc store."""

from __future__ import annotations

import json
import urllib.request

import pytest
from pyspark.sql import functions as F

from seekstorm_spark.index.builder import IndexBuilder, assign_docids
from seekstorm_spark.query.docstore import write_doc_store
from seekstorm_spark.query.engine import delete_documents, iterate_docids
from seekstorm_spark.sources.webtext import synth_webtext

N = 40


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("iter")
    docs = assign_docids(synth_webtext(spark, N, seed=41), order_col="url")
    st = IndexBuilder(spark, str(base / "idx"), n_buckets=2).build(
        docs, text_col="text", id_col="docid"
    )
    write_doc_store(
        docs, str(base / "idx" / "doc_store"), id_col="docid",
        fields=["url", "lang"], docs_per_bucket=16,
    )
    # docids 5 and 6 deleted → iterator must skip them
    delete_documents(spark, st, [5, 6])
    return st


LIVE = [d for d in range(N) if d not in (5, 6)]


def test_forward_skip_take(spark, store):
    assert iterate_docids(spark, store, skip=0, take=5) == (0, LIVE[:5])
    assert iterate_docids(spark, store, skip=4, take=4) == (4, LIVE[4:8])


def test_backward_from_end(spark, store):
    # take<0, no anchor: skip the LAST s, take the previous |t|,
    # returned ascending
    assert iterate_docids(spark, store, skip=0, take=-3) == (0, LIVE[-3:])
    assert iterate_docids(spark, store, skip=2, take=-3) == (2, LIVE[-5:-2])


def test_anchored_next_and_previous_page(spark, store):
    # reference paging recipe: next page = last docid, skip=1, +page
    page1 = iterate_docids(spark, store, take=6)[1]
    nxt = iterate_docids(
        spark, store, document_id=page1[-1], skip=0, take=6
    )[1]
    assert nxt == LIVE[6:12]
    # previous page: first docid, skip=0, -page
    prev = iterate_docids(
        spark, store, document_id=nxt[0], skip=0, take=-6
    )[1]
    assert prev == page1
    # anchored skip: skip 2 AFTER the anchor
    skipped, got = iterate_docids(
        spark, store, document_id=LIVE[9], skip=2, take=3
    )
    assert (skipped, got) == (2, LIVE[12:15])


def test_end_of_index_detection(spark, store):
    # fewer ids than requested → end reached
    skipped, got = iterate_docids(
        spark, store, document_id=LIVE[-3], skip=0, take=10
    )
    assert got == LIVE[-2:] and len(got) < 10
    # short skip → begin reached on backward iteration
    skipped, got = iterate_docids(
        spark, store, document_id=LIVE[1], skip=5, take=-5
    )
    assert skipped < 5 and got == []
    assert iterate_docids(spark, store, take=0) == (0, [])


def test_include_deleted(spark, store):
    _s, got = iterate_docids(
        spark, store, skip=0, take=10, include_deleted=True
    )
    assert got == list(range(10))  # 5 and 6 reappear


def test_iterator_over_http(spark, store):
    from seekstorm_spark.server import serve_in_thread

    srv, _t = serve_in_thread(spark, {"main": store.path}, port=0)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        with urllib.request.urlopen(
            base + "/indices/main/iterator?skip=1&take=4", timeout=120
        ) as r:
            got = json.loads(r.read())
        assert got == {"skipped": 1, "docids": LIVE[1:5]}
        req = urllib.request.Request(
            base + "/indices/main/iterator",
            data=json.dumps(
                {"take": 3, "include_document": True, "fields": ["url"]}
            ).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            got = json.loads(r.read())
        assert got["docids"] == LIVE[:3]
        assert len(got["documents"]) == 3
        assert all(set(d) == {"url"} and d["url"] for d in got["documents"])
    finally:
        srv.shutdown()
