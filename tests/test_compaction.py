"""Compaction: rewrite postings minus the delete set.

Gate: a compacted index is BIT-IDENTICAL to a fresh build over the
surviving docs with the same docids (reference level rewrite,
commit.rs:203-258) — search results, counts, browse, term stats — and
the deletes directory (the kernel-closure payload) is gone.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from seekstorm_spark.index.builder import IndexBuilder, assign_docids
from seekstorm_spark.index.compaction import compact
from seekstorm_spark.query.engine import (
    browse,
    count_matches,
    delete_documents,
    search,
)
from seekstorm_spark.sources.webtext import synth_webtext

N = 400


@pytest.fixture(scope="module")
def docs(spark):
    d = assign_docids(synth_webtext(spark, N, seed=13), order_col="url").cache()
    yield d
    d.unpersist()


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_compact_equals_fresh_build_over_live_docs(spark, docs, tmp_path):
    store = IndexBuilder(
        spark,
        str(tmp_path / "full"),
        n_buckets=8,
        frequent_terms=["term00000", "term00001"],
    ).build(docs, text_col="text", id_col="docid")
    deleted = [int(i) for i in range(0, N, 7)]
    delete_documents(spark, store, deleted)

    live = docs.filter(~F.col("docid").isin(deleted))
    fresh = IndexBuilder(
        spark,
        str(tmp_path / "fresh"),
        n_buckets=8,
        frequent_terms=["term00000", "term00001"],
    ).build(live, text_col="text", id_col="docid")

    pre = search(
        spark, store, "term00000 term00003", top_k=10, default_type="union"
    ).collect()

    compact(spark, store)
    assert not os.path.exists(store.deletes_path)
    assert store.meta["n_docs"] == fresh.meta["n_docs"]
    assert store.meta["avgdl"] == fresh.meta["avgdl"]

    queries = [
        ("term00000 term00003", "union"),
        ("term00001 term00004", "intersection"),
        ('"term00000 term00001"', "union"),
        ("term00002 -term00009", "union"),
        ("term00042", "union"),
    ]
    for q, dt in queries:
        a = search(spark, store, q, top_k=10, default_type=dt).collect()
        b = search(spark, fresh, q, top_k=10, default_type=dt).collect()
        assert [(r["docid"], r["score"]) for r in a] == [
            (r["docid"], r["score"]) for r in b
        ], q
        assert count_matches(spark, store, q, dt) == count_matches(
            spark, fresh, q, dt
        ), q

    # compaction == delete-filtered semantics on the doc SET: the
    # pre-compaction (filtered) result docids survive compaction
    post = search(
        spark, store, "term00000 term00003", top_k=10, default_type="union"
    ).collect()
    assert {r["docid"] for r in pre} == {r["docid"] for r in post}

    assert _rows(browse(spark, store, top_k=20)) == _rows(
        browse(spark, fresh, top_k=20)
    )

    # term stats collapse to the fresh build's aggregates
    ts_a = {
        r["term"]: r["df"]
        for r in store.term_stats(spark)
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
        .collect()
    }
    ts_b = {
        r["term"]: r["df"]
        for r in fresh.term_stats(spark)
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
        .collect()
    }
    assert ts_a == ts_b


def test_compact_noop_without_deletes(spark, docs, tmp_path):
    store = IndexBuilder(spark, str(tmp_path / "nd"), n_buckets=4).build(
        docs.filter(F.col("docid") < 100), text_col="text", id_col="docid"
    )
    before = search(spark, store, "term00000", top_k=5).collect()
    compact(spark, store)
    after = search(spark, store, "term00000", top_k=5).collect()
    assert [tuple(r) for r in before] == [tuple(r) for r in after]


def test_compact_term_stats_collapses_partials(spark, docs, tmp_path):
    """Append partials collapse to one row per (tbucket, term) with
    identical probe results."""
    from seekstorm_spark.index.compaction import compact_term_stats
    from seekstorm_spark.query.engine import _probe_term_stats
    from seekstorm_spark.streaming.incremental import append_batch

    store = IndexBuilder(spark, str(tmp_path / "ts"), n_buckets=4).build(
        docs.filter(F.col("docid") < 150), text_col="text", id_col="docid"
    )
    append_batch(
        spark, store,
        docs.filter((F.col("docid") >= 150) & (F.col("docid") < 250)),
        batch_id=1, id_col="docid",
    )
    probe_terms = ["term00000", "term00001", "term00042"]
    before = _probe_term_stats(store, probe_terms)
    ts = store.term_stats(spark)
    assert ts.groupBy("tbucket", "term").count().filter("count > 1").count() > 0

    compact_term_stats(spark, store)
    ts2 = store.term_stats(spark)
    assert ts2.groupBy("tbucket", "term").count().filter("count > 1").count() == 0
    assert _probe_term_stats(store, probe_terms) == before
    # searches unchanged
    a = search(spark, store, "term00000 term00001", top_k=5).collect()
    assert len(a) == 5
