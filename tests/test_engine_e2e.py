"""End-to-end: build index on synthetic webtext, search, compare to the
pure-Python oracle (rank + f32-score identity), verify pruning is
lossless, counts, NOT/phrase semantics, and resume-from-lineage."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from seekstorm_spark.index.builder import IndexBuilder
from seekstorm_spark.index.store import IndexStore
from seekstorm_spark.oracle import build_oracle_index, search_oracle
from seekstorm_spark.query.engine import count_matches, search
from seekstorm_spark.sources.webtext import synth_webtext

N_DOCS = 800

QUERIES = [
    ("term00000 term00001", "union"),
    ("+term00000 +term00001", "union"),  # promoted to intersection
    ("term00002 term00007 term00011", "intersection"),
    ("term00000 -term00001", "union"),
    ('"term00000 term00001"', "union"),  # phrase
    ("term00042", "union"),
    ("zzzmissing term00000", "intersection"),  # missing AND term → empty
    ("term00000 term00000 term00003", "union"),  # duplicate term dedup
]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    docs = synth_webtext(spark, N_DOCS, seed=42).cache()
    path = str(tmp_path_factory.mktemp("idx") / "webtext_index")
    store = IndexBuilder(spark, path, n_buckets=8).build(
        docs, text_col="text", order_col="url"
    )
    # oracle over the same rows, docids assigned identically
    rows = docs.collect()
    docs.unpersist()
    oracle_docs_by_url = {r["url"]: r["text"] for r in rows}
    dm = spark.read.parquet(store.doc_meta_path)
    # reproduce docid mapping from the index build
    raise_if = dm.count()
    assert raise_if == N_DOCS
    return store, oracle_docs_by_url


@pytest.fixture(scope="module")
def oracle_index(spark, built):
    store, docs_by_url = built
    # map url -> docid exactly as the builder assigned them: rebuild via
    # the stored doc_meta joined against a fresh docid assignment
    from seekstorm_spark.index.builder import assign_docids

    docs = synth_webtext(spark, N_DOCS, seed=42)
    with_ids = assign_docids(docs, order_col="url", n_buckets=16)
    id_map = {r["url"]: r["docid"] for r in with_ids.select("url", "docid").collect()}
    oracle_docs = {id_map[u]: t for u, t in docs_by_url.items()}
    return build_oracle_index(oracle_docs)


def test_meta_stats_match_oracle(built, oracle_index):
    store, _ = built
    assert store.n_docs == oracle_index.n_docs
    assert store.avgdl == pytest.approx(oracle_index.avgdl, rel=1e-6)


@pytest.mark.parametrize("query,default_type", QUERIES)
def test_search_matches_oracle(spark, built, oracle_index, query, default_type):
    store, _ = built
    expected, expected_count = search_oracle(
        oracle_index, query, top_k=10, default_type=default_type
    )
    got = search(spark, store, query, top_k=10, default_type=default_type).collect()
    got_pairs = [(r["docid"], r["score"]) for r in got]
    assert [d for d, _ in got_pairs] == [d for d, _ in expected], (
        f"docid mismatch for {query!r}: {got_pairs} vs {expected}"
    )
    for (gd, gs), (ed, es) in zip(got_pairs, expected):
        assert gs == pytest.approx(es, abs=1e-5), (query, gd, gs, es)


@pytest.mark.parametrize("query,default_type", QUERIES)
def test_pruned_equals_unpruned(spark, built, query, default_type):
    store, _ = built
    pruned = search(
        spark, store, query, top_k=10, default_type=default_type, prune=True
    ).collect()
    unpruned = search(
        spark, store, query, top_k=10, default_type=default_type, prune=False
    ).collect()
    assert [(r["docid"], r["score"]) for r in pruned] == [
        (r["docid"], r["score"]) for r in unpruned
    ]


def test_counts(spark, built, oracle_index):
    store, _ = built
    for query, dt_ in [
        ("term00000 term00001", "intersection"),
        ("term00000 term00001", "union"),
        ("term00042", "union"),
        ('"term00000 term00001"', "union"),
        ("term00000 -term00001", "union"),
    ]:
        _, expected_count = search_oracle(oracle_index, query, 10, dt_)
        assert count_matches(spark, store, query, dt_) == expected_count, (query, dt_)


def test_multi_block_index(spark, tmp_path):
    """Docids crossing the 65,536 block boundary land in separate blocks
    and still search correctly (FIXTURES.md: one case must cross it)."""
    import pandas as pd

    n = 300
    texts = ["alpha beta gamma" if i % 3 == 0 else "alpha delta" for i in range(n)]
    # spread docids over two blocks by spoofing ids above 65536
    ids = [i if i % 2 == 0 else 65_536 + i for i in range(n)]
    pdf = pd.DataFrame({"doc_id": ids, "text": texts})
    docs = spark.createDataFrame(pdf)
    store = IndexBuilder(spark, str(tmp_path / "idx2"), n_buckets=4).build(
        docs, text_col="text", id_col="doc_id"
    )
    postings = spark.read.parquet(store.postings_path)
    assert postings.filter(F.col("term") == "alpha").count() == 2  # two blocks
    res = search(spark, store, "alpha beta", top_k=5, default_type="intersection")
    rows = res.collect()
    assert len(rows) == 5
    oracle = build_oracle_index(dict(zip(ids, texts)))
    exp, cnt = search_oracle(oracle, "alpha beta", 5, "intersection")
    assert [(r["docid"], pytest.approx(r["score"], abs=1e-5)) for r in rows] == [
        (d, pytest.approx(s, abs=1e-5)) for d, s in exp
    ]
    assert count_matches(spark, store, "alpha beta", "intersection") == cnt


def test_resume_from_lineage(spark, tmp_path):
    docs = synth_webtext(spark, 200, seed=7)
    path = str(tmp_path / "idx3")
    builder = IndexBuilder(spark, path, n_buckets=8)
    # interrupted build: only half the term buckets committed
    builder.build(docs, text_col="text", order_col="url", only_buckets=[0, 1, 2, 3])
    store_partial = IndexStore.open(path)
    committed = {
        int(r["tbucket"])
        for r in spark.read.parquet(store_partial.lineage_path)
        .select("tbucket")
        .distinct()
        .collect()
    }
    assert committed == {0, 1, 2, 3}
    # resume completes the remaining buckets only
    store = builder.build(docs, text_col="text", order_col="url", resume=True)
    committed = {
        int(r["tbucket"])
        for r in spark.read.parquet(store.lineage_path)
        .select("tbucket")
        .distinct()
        .collect()
    }
    assert committed == set(range(8))
    # index is complete and correct
    res = search(spark, store, "term00000", top_k=5).collect()
    assert len(res) == 5


def test_reader_ddl_matches_written_schema(spark, tmp_path):
    """The explicit reader DDLs in store.py must stay in lockstep with
    the writer schemas in builder.py — compare against inference on a
    real faceted index (name+type per column)."""
    from pyspark.sql import functions as F

    from seekstorm_spark.index.builder import IndexBuilder
    from seekstorm_spark.sources.webtext import synth_webtext

    docs = synth_webtext(spark, 60, seed=8).withColumn(
        "nch", F.length("text").cast("double")
    )
    store = IndexBuilder(
        spark, str(tmp_path / "ddl"), n_buckets=2,
        facet_cols=["lang", "nch"],
    ).build(docs, text_col="text", order_col="url")
    for declared, path in [
        (store.postings(spark), store.postings_path),
        (store.term_stats(spark), store.term_stats_path),
        (store.doc_meta(spark), store.doc_meta_path),
        (store.facet_blocks(spark), store.facets_path),
    ]:
        inferred = spark.read.parquet(path).schema
        got = {f.name: f.dataType.simpleString() for f in declared.schema}
        want = {f.name: f.dataType.simpleString() for f in inferred}
        assert got == want, path


def test_empty_index_lifecycle(spark, tmp_path):
    """A ZERO-doc build is a valid index: open, search, count, browse
    all answer empty — then realtime appends grow it into a live one
    (the create-empty-then-index flow the REST server exposes)."""
    from seekstorm_spark.index.builder import IndexBuilder
    from seekstorm_spark.index.store import IndexStore
    from seekstorm_spark.query.engine import (
        browse,
        count_matches,
        search,
        search_many,
    )
    from seekstorm_spark.streaming.incremental import RealtimeIndexer

    empty = spark.createDataFrame([], "doc_id long, text string")
    store = IndexBuilder(spark, str(tmp_path / "e"), n_buckets=2).build(
        empty, text_col="text", id_col="doc_id"
    )
    assert store.meta["n_docs"] == 0
    reopened = IndexStore.open(store.path)
    assert search(spark, reopened, "anything").collect() == []
    assert count_matches(spark, reopened, "anything") == 0
    assert search_many(spark, reopened, ["a", "b c"]).collect() == []
    assert browse(spark, reopened).collect() == []

    ri = RealtimeIndexer(spark, reopened, text_col="text")
    ri.add_documents(
        spark.createDataFrame(
            [("a", "hello world"), ("b", "hello spark engine")],
            "url string, text string",
        )
    )
    assert {
        r["docid"]
        for r in search(
            spark, reopened, "hello", staged=ri.staged
        ).collect()
    } == {0, 1}
    ri.commit()
    assert count_matches(spark, reopened, "hello") == 2
