"""Frequent-term result cache: driver-served single-term queries
(reference search.rs:3388-3445 cached top-1000, index.rs:1644) —
bit-identical to the kernel path, zero Spark jobs on a hit, and
generation-invalidated by appends until rebuilt."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seekstorm_spark.index.builder import IndexBuilder, assign_docids
from seekstorm_spark.query.engine import search
from seekstorm_spark.query.result_cache import (
    build_result_cache,
    cached_single_term,
)
from seekstorm_spark.sources.webtext import synth_webtext


@pytest.fixture(scope="module")
def cached_store(spark, tmp_path_factory):
    docs = assign_docids(synth_webtext(spark, 400, seed=31), order_col="url")
    path = str(tmp_path_factory.mktemp("rcache") / "idx")
    store = IndexBuilder(
        spark, path, n_buckets=8,
        frequent_terms=["term00000", "term00001"],
    ).build(docs, text_col="text", id_col="docid")
    return store


def _is_local(df) -> bool:
    """Cache hits build from driver-resident rows: the plan is a bare
    local/RDD scan with no parquet read, no exchange, no kernel."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return (
        "LocalTableScan" in plan or "Scan ExistingRDD" in plan
    ) and "parquet" not in plan.lower()


def test_cache_hit_identical_and_local(spark, cached_store):
    store = cached_store
    kernel = search(spark, store, "term00000", top_k=25).collect()
    assert not _is_local(search(spark, store, "term00000", top_k=25))

    keys = build_result_cache(spark, store, k=100)
    assert "term00000" in keys and "term00001" in keys

    hit_df = search(spark, store, "term00000", top_k=25)
    assert _is_local(hit_df)
    hit = hit_df.collect()
    assert [tuple(r) for r in hit] == [tuple(r) for r in kernel]

    # offset slices inside the cached list
    page = search(spark, store, "term00000", top_k=10, offset=5).collect()
    assert [tuple(r) for r in page] == [tuple(r) for r in kernel[5:15]]


def test_cache_ineligible_paths_fall_through(spark, cached_store):
    store = cached_store
    build_result_cache(spark, store, k=50)
    # two-term query: kernel path
    assert not _is_local(search(spark, store, "term00000 term00001"))
    # uncached term: kernel path
    assert not _is_local(search(spark, store, "term00002"))
    # deeper than the cache: kernel path (cache holds k=50 full lists)
    deep = search(spark, store, "term00000", top_k=5000)
    kernel = search(spark, store, "term00000", top_k=5000, prune=False)
    assert {tuple(r) for r in deep.collect()} == {
        tuple(r) for r in kernel.collect()
    }
    # NOT query: kernel path
    assert not _is_local(search(spark, store, "term00000 -term00001"))


def test_cache_invalidated_by_append_then_rebuilt(spark, tmp_path):
    from seekstorm_spark.streaming.incremental import append_batch

    docs = assign_docids(synth_webtext(spark, 300, seed=37), order_col="url")
    path = str(tmp_path / "idx")
    store = IndexBuilder(
        spark, path, n_buckets=8, frequent_terms=["term00000"]
    ).build(docs, text_col="text", id_col="docid")
    build_result_cache(spark, store, k=100)
    assert _is_local(search(spark, store, "term00000", top_k=10))

    more = assign_docids(
        synth_webtext(spark, 60, seed=38), order_col="url"
    ).withColumn("docid", F.col("docid") + 1000)
    store = append_batch(spark, store, more, text_col="text", id_col="docid")

    # generation moved: the stale cache must NOT serve
    post = search(spark, store, "term00000", top_k=10)
    assert not _is_local(post)
    kernel_rows = post.collect()

    # rebuild → serves again, identical to the post-append kernel
    build_result_cache(spark, store, k=100)
    again = search(spark, store, "term00000", top_k=10)
    assert _is_local(again)
    assert [tuple(r) for r in again.collect()] == [
        tuple(r) for r in kernel_rows
    ]
    assert cached_single_term(store, "term00000", 10) is not None


def test_search_many_splices_cached_queries(spark, cached_store):
    """Batched serving: a query answerable from the result cache
    rides as a local-relation branch (its term stays out of the fused
    scan), bit-identical per query to search()."""
    from seekstorm_spark.query.engine import search_many

    store = cached_store
    build_result_cache(spark, store, k=50)
    queries = ["term00000", "term00002 term00003", "term00001"]
    batched = search_many(spark, store, queries, top_k=10).collect()
    for i, q in enumerate(queries):
        single = search(spark, store, q, top_k=10).collect()
        got = sorted(
            ((r["docid"], r["score"]) for r in batched if r["query_id"] == i),
            key=lambda t: (-t[1], t[0]),
        )
        assert got == [(r["docid"], r["score"]) for r in single], q

    # an all-cached batch plans with no index scan at all
    all_cached = search_many(spark, store, ["term00000", "term00001"], top_k=10)
    plan = all_cached._jdf.queryExecution().executedPlan().toString()
    assert "parquet" not in plan.lower()
    # None filter entries still count as unfiltered → cached
    nf = search_many(
        spark, store, ["term00000"], top_k=10, facet_filters=[None],
    )
    assert "parquet" not in (
        nf._jdf.queryExecution().executedPlan().toString().lower()
    )
    # a field filter changes scoring semantics → kernel, not cache
    ff = search_many(
        spark, store, ["term00000"], top_k=10, field_filter=["text"],
    )
    assert "parquet" in (
        ff._jdf.queryExecution().executedPlan().toString().lower()
    )


def test_realtime_commit_rebuilds_cache(spark, tmp_path):
    """A RealtimeIndexer commit moves the index generation; when a
    result cache exists it is rebuilt in the same commit (reference
    rebuilds its result cache per commit) — cached serving resumes
    immediately and reflects the committed docs."""
    from seekstorm_spark.streaming.incremental import RealtimeIndexer

    docs = assign_docids(synth_webtext(spark, 200, seed=43), order_col="url")
    path = str(tmp_path / "idx")
    store = IndexBuilder(
        spark, path, n_buckets=4, frequent_terms=["term00000"]
    ).build(docs, text_col="text", id_col="docid")
    build_result_cache(spark, store, k=50)

    idx = RealtimeIndexer(spark, store, text_col="text", id_col="docid",
                          commit_every=10_000)
    more = assign_docids(
        synth_webtext(spark, 40, seed=44), order_col="url"
    ).withColumn("docid", F.col("docid") + 500)
    idx.add_documents(more)
    store = idx.commit()

    hit_df = search(spark, store, "term00000", top_k=10)
    assert _is_local(hit_df)  # cache valid again right after commit
    # identity vs the kernel: a deeper-than-cache request bypasses the
    # cache, so its top 10 is the kernel's answer over committed docs
    deep = search(spark, store, "term00000", top_k=10_000).collect()
    top = sorted(
        ((r["docid"], r["score"]) for r in deep),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    assert [(r["docid"], r["score"]) for r in hit_df.collect()] == top
