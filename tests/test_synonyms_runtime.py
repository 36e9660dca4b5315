"""Runtime synonym updates (reference Index::set_synonyms /
add_synonyms / get_synonyms, index.rs:4955-5002): replace or merge
synonym groups on a live index; the change affects ONLY subsequently
indexed documents (the append path expands against meta at tokenize
time), existing postings stay untouched."""

from __future__ import annotations

import json
import urllib.request

import pytest
from pyspark.sql import functions as F

from seekstorm_spark.index.builder import (
    IndexBuilder,
    add_synonyms,
    assign_docids,
    get_synonyms,
    set_synonyms,
)
from seekstorm_spark.query.engine import search
from seekstorm_spark.sources.webtext import synth_webtext
from seekstorm_spark.streaming.incremental import append_batch


def test_set_synonyms_affects_only_new_docs(spark, tmp_path):
    docs = assign_docids(
        synth_webtext(spark, 200, seed=31), order_col="url"
    ).cache()
    half = docs.filter(F.col("docid") < 100)
    rest = docs.filter(F.col("docid") >= 100)
    store = IndexBuilder(spark, str(tmp_path / "idx"), n_buckets=4).build(
        half, text_col="text", id_col="docid"
    )
    assert get_synonyms(store) == []

    groups = [{"terms": ["term00002", "term00003"], "multiway": True}]
    assert set_synonyms(store, groups) == 1
    assert get_synonyms(store) == groups

    append_batch(spark, store, rest, batch_id=1, id_col="docid")

    # docs of the APPENDED half containing term00003 now answer a
    # term00002 query (indexed under the synonym); the PRE-EXISTING
    # half is untouched — only appended docids may appear beyond the
    # docs that literally contain term00002
    lit2 = {
        r["docid"]
        for r in docs.filter(
            F.col("text").rlike(r"\bterm00002\b")
        ).select("docid").collect()
    }
    has3_new = {
        r["docid"]
        for r in rest.filter(
            F.col("text").rlike(r"\bterm00003\b")
        ).select("docid").collect()
    }
    got = {
        r["docid"]
        for r in search(
            spark, store, "term00002", top_k=500, default_type="union"
        ).collect()
    }
    assert got == lit2 | has3_new
    docs.unpersist()


def test_add_synonyms_merges(spark, tmp_path):
    docs = assign_docids(
        synth_webtext(spark, 50, seed=32), order_col="url"
    )
    store = IndexBuilder(
        spark, str(tmp_path / "idx2"), n_buckets=2,
        synonyms=[{"terms": ["term00004", "term00005"], "multiway": True}],
    ).build(docs, text_col="text", id_col="docid")
    n = add_synonyms(
        store, [{"terms": ["term00006", "term00007"], "multiway": False}]
    )
    assert n == 2
    assert [g["terms"] for g in get_synonyms(store)] == [
        ["term00004", "term00005"],
        ["term00006", "term00007"],
    ]
    with pytest.raises(ValueError, match="2 non-empty"):
        set_synonyms(store, [{"terms": ["solo"]}])


def test_synonyms_over_http(spark, tmp_path):
    from seekstorm_spark.server import serve_in_thread

    docs = assign_docids(
        synth_webtext(spark, 60, seed=33), order_col="url"
    )
    store = IndexBuilder(spark, str(tmp_path / "idx3"), n_buckets=2).build(
        docs, text_col="text", id_col="docid"
    )
    srv, _t = serve_in_thread(
        spark, {"main": store.path}, port=0, writable=True
    )
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        def _req(method, path, body=None):
            req = urllib.request.Request(
                base + path,
                data=json.dumps(body).encode() if body is not None else None,
                headers={"Content-Type": "application/json"},
                method=method,
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.loads(r.read())

        assert _req("GET", "/indices/main/synonyms") == {"synonyms": []}
        groups = [{"terms": ["a1", "b1"], "multiway": True}]
        assert _req(
            "POST", "/indices/main/synonyms", {"synonyms": groups}
        ) == {"index": "main", "mode": "set", "groups": 1}
        assert _req("GET", "/indices/main/synonyms")["synonyms"] == groups
        assert _req(
            "POST", "/indices/main/synonyms",
            {"synonyms": [{"terms": ["c1", "d1"]}], "mode": "add"},
        )["groups"] == 2
        # reference PUT = add/merge (http_server.rs:793)
        assert _req(
            "PUT", "/indices/main/synonyms",
            {"synonyms": [{"terms": ["e1", "f1"]}]},
        ) == {"index": "main", "mode": "add", "groups": 3}
        got = _req("GET", "/indices/main/synonyms")["synonyms"]
        assert [g["terms"] for g in got] == [
            ["a1", "b1"], ["c1", "d1"], ["e1", "f1"]
        ]
        # POST (no mode) = set/replace, wiping the merged list
        assert _req(
            "POST", "/indices/main/synonyms",
            {"synonyms": [{"terms": ["z1", "z2"]}]},
        )["groups"] == 1
        assert len(_req("GET", "/indices/main/synonyms")["synonyms"]) == 1
    finally:
        srv.shutdown()
