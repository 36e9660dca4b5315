"""Columnar doc store: bucketed parquet write + driver-side pyarrow
point lookups with a decoded row-group LRU (the reference serves
get_document from per-shard doc stores, doc_store.rs — here the warm
path is a numpy binary search, no Spark job)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seekstorm_spark.index.builder import assign_docids
from seekstorm_spark.query.docstore import DocStore, write_doc_store
from seekstorm_spark.sources.webtext import synth_webtext


@pytest.fixture(scope="module")
def ds(spark, tmp_path_factory):
    docs = assign_docids(synth_webtext(spark, 300, seed=9), order_col="url")
    path = str(tmp_path_factory.mktemp("docstore") / "ds")
    write_doc_store(
        docs, path, id_col="docid", fields=["url", "lang", "text"],
        docs_per_bucket=64,
    )
    rows = {r["docid"]: r for r in docs.collect()}
    return DocStore(path), rows, path


def test_roundtrip_fields(ds):
    store, rows, _path = ds
    for d in (0, 1, 63, 64, 65, 150, 299):
        got = store.get(d)
        assert got is not None, d
        assert got["url"] == rows[d]["url"]
        assert got["lang"] == rows[d]["lang"]
        assert got["text"] == rows[d]["text"]


def test_missing_docid_is_none(ds):
    store, _rows, _path = ds
    assert store.get(10_000_000) is None
    assert store.get_many([5, 10_000_000, 7]) [1] is None


def test_get_many_order_preserved(ds):
    store, rows, _path = ds
    ids = [250, 3, 128, 3]
    got = store.get_many(ids)
    assert [g["docid"] for g in got] == ids
    assert got[1]["url"] == rows[3]["url"] == got[3]["url"]


def test_warm_lookup_uses_columnar_cache(ds):
    store, rows, _path = ds
    first = store.get(100)
    # poison every cached file handle: a warm repeat must not touch IO
    for fpath, (pf, _r) in store._files.items():
        pf.read_row_group = lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("warm lookup re-read a row group")
        )
    again = store.get(100)
    assert again == first == {
        "docid": 100,
        "url": rows[100]["url"],
        "lang": rows[100]["lang"],
        "text": rows[100]["text"],
    }


def test_lru_bound(spark, tmp_path):
    docs = assign_docids(synth_webtext(spark, 200, seed=4), order_col="url")
    path = str(tmp_path / "small")
    write_doc_store(docs, path, id_col="docid", docs_per_bucket=16)
    store = DocStore(path, cache_groups=2)
    for d in (0, 20, 40, 60, 80, 100):
        assert store.get(d) is not None
    assert len(store._groups) <= 2


def test_append_invalidates_bucket_listing(spark, tmp_path):
    docs = assign_docids(synth_webtext(spark, 100, seed=5), order_col="url")
    path = str(tmp_path / "appending")
    write_doc_store(docs, path, id_col="docid", docs_per_bucket=64)
    store = DocStore(path)
    assert store.get(42) is not None
    assert store.get(150) is None  # warm the (empty) listing for bucket 2
    more = (
        synth_webtext(spark, 60, seed=6)
        .withColumn("docid", F.lit(None))
        .drop("docid")
    )
    more = assign_docids(more, order_col="url").withColumn(
        "docid", F.col("docid") + 100
    )
    write_doc_store(
        more, path, id_col="docid", docs_per_bucket=64, mode="append"
    )
    got = store.get(150)  # same reader instance sees the appended file
    assert got is not None and got["docid"] == 150


def test_compact_removes_only_touched_buckets(spark, tmp_path):
    """compact_doc_store rewrites the buckets holding deleted ids,
    leaves the others' files byte-identical, and drops emptied
    buckets entirely."""
    import os

    from seekstorm_spark.query.docstore import compact_doc_store

    docs = assign_docids(synth_webtext(spark, 200, seed=13), order_col="url")
    path = str(tmp_path / "cds")
    write_doc_store(docs, path, id_col="docid", fields=["url"],
                    docs_per_bucket=64)

    def files(bucket):
        d = os.path.join(path, f"dbucket={bucket}")
        if not os.path.exists(d):
            return None
        return sorted(
            (f, os.path.getmtime(os.path.join(d, f)))
            for f in os.listdir(d) if f.endswith(".parquet")
        )

    before_b2 = files(2)
    # delete two ids in bucket 0, and ALL of bucket 3 (192..199)
    victims = [5, 40] + list(range(192, 200))
    n = compact_doc_store(spark, path, victims)
    assert n == 2  # buckets 0 and 3
    store = DocStore(path)
    assert store.get(5) is None and store.get(40) is None
    assert store.get(195) is None
    assert store.get(6)["url"]  # neighbors survive
    assert store.get(100)["url"]  # untouched bucket
    assert files(2) == before_b2  # untouched bucket byte-identical
    assert files(3) is None  # emptied bucket removed
