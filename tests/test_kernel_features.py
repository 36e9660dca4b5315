"""Round-3 kernel features: spell/QAC query rewrite inside search(),
facet counting during the scan, numeric facet filters, and the geo
radius filter / distance sort over numeric lat/lon facets.

Reference parity targets: SearchRewrite/SearchSuggest
(`search.rs:1200-1411`), facet counts during result collection
(`add_result.rs:487-646`, `search.rs:3598-3764`), Point facet geo
filter + distance comparator (`search.rs:2712-2724`, `min_heap.rs`).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from seekstorm_spark.index.builder import IndexBuilder, assign_docids
from seekstorm_spark.query.engine import (
    facet_counts,
    facet_range_counts,
    search,
)
from seekstorm_spark.query.spell import (
    build_completion_dictionary,
    build_spell_dictionary,
    damerau_levenshtein,
)
from seekstorm_spark.sources.webtext import synth_webtext


@pytest.fixture(scope="module")
def geo_store(spark, tmp_path_factory):
    docs = assign_docids(synth_webtext(spark, 500, seed=5), order_col="url")
    docs = (
        docs.withColumn("lat", (F.col("docid") * 37 % 18000) / 100.0 - 90.0)
        .withColumn("lon", (F.col("docid") * 73 % 36000) / 100.0 - 180.0)
        .withColumn(
            "lang",
            F.element_at(
                F.array(F.lit("de"), F.lit("en"), F.lit("fr")),
                (F.col("docid") % 3 + 1).cast("int"),
            ),
        )
        .withColumn("nlen", F.length("text").cast("long"))
        .cache()
    )
    base = tmp_path_factory.mktemp("geo")
    store = IndexBuilder(
        spark,
        str(base / "idx"),
        n_buckets=8,
        facet_cols=["lang", "nlen", "lat", "lon"],
    ).build(docs, text_col="text", id_col="docid")
    yield store, docs
    docs.unpersist()


def test_damerau_vectors():
    assert damerau_levenshtein("fsat", "fast") == 1  # transposition
    assert damerau_levenshtein("tabel", "table") == 1
    assert damerau_levenshtein("abc", "abc") == 0
    assert damerau_levenshtein("abc", "ca") == 3  # OSA, not full Damerau
    assert damerau_levenshtein("kitten", "sitting") == 3


def test_spell_rewrite_in_search(spark, geo_store):
    store, _docs = geo_store
    build_spell_dictionary(spark, store)
    good = search(
        spark, store, "term00000 term00004", default_type="intersection"
    ).collect()
    bad = search(
        spark,
        store,
        "temr00000 term00004",  # transposed 'rm' -> damerau distance 1
        default_type="intersection",
        rewrite="spell",
    ).collect()
    assert [(r["docid"], r["score"]) for r in bad] == [
        (r["docid"], r["score"]) for r in good
    ]
    # without rewrite, the misspelled AND query returns nothing
    assert (
        search(
            spark, store, "temr00000 term00004", default_type="intersection"
        ).count()
        == 0
    )


def test_suggest_rewrite_in_search(spark, geo_store):
    store, _docs = geo_store
    build_completion_dictionary(spark, store)
    from seekstorm_spark.query.spell import complete

    top = complete(store, "term0000", k=1)[0][0]
    direct = search(spark, store, top, default_type="union").collect()
    sugg = search(
        spark, store, "term0000", default_type="union", rewrite="suggest"
    ).collect()
    assert [(r["docid"], r["score"]) for r in sugg] == [
        (r["docid"], r["score"]) for r in direct
    ]


def test_facet_counts_match_dataframe(spark, geo_store):
    store, docs = geo_store
    got = {
        (r["value"]): r["n"]
        for r in facet_counts(spark, store, "term00000", ["lang"]).collect()
    }
    from seekstorm_spark.query.dataframe_engine import tokens

    matching = (
        tokens(docs, docid_col="docid")
        .filter(F.col("term") == "term00000")
        .select("docid")
        .distinct()
    )
    want = {
        r["lang"]: r["n"]
        for r in docs.join(matching, "docid")
        .groupBy("lang")
        .agg(F.count("*").cast("long").alias("n"))
        .collect()
    }
    assert got == want


def test_facet_range_counts_match_dataframe(spark, geo_store):
    store, docs = geo_store
    bounds = [0.0, 200.0, 400.0, 800.0]
    out = facet_range_counts(
        spark, store, "term00000", {"nlen": bounds}, cumulative=True
    ).collect()
    got = {r["bucket_lo"]: (r["n"], r["n_cumulative"]) for r in out}
    from seekstorm_spark.query.dataframe_engine import tokens

    matching = (
        tokens(docs, docid_col="docid")
        .filter(F.col("term") == "term00000")
        .select("docid")
        .distinct()
    )
    rows = (
        docs.join(matching, "docid")
        .withColumn(
            "bucket_lo",
            F.when(F.col("nlen") >= 800, 800.0)
            .when(F.col("nlen") >= 400, 400.0)
            .when(F.col("nlen") >= 200, 200.0)
            .otherwise(0.0),
        )
        .groupBy("bucket_lo")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("bucket_lo")
        .collect()
    )
    cum = 0
    for r in rows:
        cum += r["n"]
        assert got[r["bucket_lo"]] == (r["n"], cum)


def test_numeric_facet_filter(spark, geo_store):
    store, docs = geo_store
    hits = search(
        spark, store, "term00000", top_k=1000, default_type="union",
        facet_filters={"nlen": (200, 400)},
    ).collect()
    lens = {
        r["docid"]: r["nlen"]
        for r in docs.select("docid", "nlen").collect()
    }
    assert hits
    assert all(200 <= lens[r["docid"]] <= 400 for r in hits)


def test_geo_radius_filter_matches_dataframe(spark, geo_store):
    store, docs = geo_store
    from seekstorm_spark.functions.geo import geo_radius_filter

    hits = search(
        spark, store, "term00000", top_k=1000, default_type="union",
        geo_filter={
            "lat": "lat", "lon": "lon", "at": (48.8566, 2.3522),
            "radius_km": 5000.0,
        },
    ).collect()
    from seekstorm_spark.query.dataframe_engine import tokens

    matching = (
        tokens(docs, docid_col="docid")
        .filter(F.col("term") == "term00000")
        .select("docid")
        .distinct()
    )
    want = {
        r["docid"]
        for r in geo_radius_filter(
            docs.join(matching, "docid"), "lat", "lon", 48.8566, 2.3522, 5000.0
        ).collect()
    }
    assert {r["docid"] for r in hits} == want
    assert want  # non-trivial


def test_geo_distance_sort(spark, geo_store):
    store, _docs = geo_store
    out = search(
        spark, store, "term00000", top_k=10, default_type="union",
        geo_filter={
            "lat": "lat", "lon": "lon", "at": (48.8566, 2.3522),
            "radius_km": 8000.0,
        },
        result_sort=[("geo_dist", "asc")],
    ).collect()
    dists = [r["geo_dist"] for r in out]
    assert dists == sorted(dists) and len(dists) == 10


def test_batched_geo_distance_sort_identical(spark, geo_store):
    """search_many(result_sorts=[('geo_dist', …)]) keeps per-query
    distance top-k INSIDE the fused kernel and must be bit-identical
    (docid, score, AND distance) to the single-query emit-all path —
    for asc, desc, and a mixed batch with score-sorted queries."""
    from seekstorm_spark.query.engine import search_many

    store, _docs = geo_store
    gf = {
        "lat": "lat", "lon": "lon", "at": (48.8566, 2.3522),
        "radius_km": 8000.0,
    }
    queries = ["term00000", "term00001", "term00000 term00002"]
    geo_filters = [gf, gf, None]
    sorts = [[("geo_dist", "asc")], [("geo_dist", "desc")], None]
    batched = search_many(
        spark, store, queries, top_k=10,
        geo_filters=geo_filters, result_sorts=sorts,
    ).collect()
    assert {c for c in batched[0].asDict()} == {
        "query_id", "docid", "score", "geo_dist",
    }
    for i, (q, g, rs) in enumerate(zip(queries, geo_filters, sorts)):
        single = search(
            spark, store, q, top_k=10, default_type="union",
            geo_filter=g, result_sort=rs,
        ).collect()
        got = [r for r in batched if r["query_id"] == i]
        if rs:
            direction = rs[0][1]
            got.sort(
                key=lambda r: (
                    r["geo_dist"] if direction == "asc" else -r["geo_dist"],
                    r["docid"],
                )
            )
            assert [
                (r["docid"], r["score"], r["geo_dist"]) for r in got
            ] == [
                (r["docid"], r["score"], r["geo_dist"]) for r in single
            ], q
        else:
            got.sort(key=lambda r: (-r["score"], r["docid"]))
            assert [(r["docid"], r["score"]) for r in got] == [
                (r["docid"], r["score"]) for r in single
            ], q
            assert all(
                r["geo_dist"] is None or math.isnan(r["geo_dist"])
                for r in got
            )

    # miles unit: same candidates/order, emitted distances rescaled —
    # identical to the single-query miles path
    gf_mi = {
        "lat": "lat", "lon": "lon", "at": (48.8566, 2.3522),
        "radius_mi": 8000.0 / 1.609344,
    }
    batched_mi = search_many(
        spark, store, ["term00000"], top_k=10,
        geo_filters=[gf_mi], result_sorts=[[("geo_dist", "asc")]],
    ).collect()
    single_mi = search(
        spark, store, "term00000", top_k=10, default_type="union",
        geo_filter=dict(gf_mi), result_sort=[("geo_dist", "asc")],
    ).collect()
    got_mi = sorted(batched_mi, key=lambda r: (r["geo_dist"], r["docid"]))
    assert [(r["docid"], r["geo_dist"]) for r in got_mi] == [
        (r["docid"], r["geo_dist"]) for r in single_mi
    ]

    # geo sort without a geo filter is rejected, as in search()
    with pytest.raises(ValueError, match="requires a geo_filter"):
        search_many(
            spark, store, ["term00000"], result_sorts=[[("geo_dist", "asc")]]
        )
    with pytest.raises(ValueError, match="geo_dist"):
        search_many(
            spark, store, ["term00000"], geo_filters=[gf],
            result_sorts=[[("lang", "asc")]],
        )


def test_batched_cached_query_in_dist_sort_batch(spark, geo_store):
    """A cache-served query inside a batch that also carries distance
    sorts still matches search(), and its geo_dist is NaN."""
    from seekstorm_spark.query.engine import search_many
    from seekstorm_spark.query.result_cache import build_result_cache

    store, _docs = geo_store
    build_result_cache(spark, store, terms=["term00005"], k=50)
    gf = {
        "lat": "lat", "lon": "lon", "at": (48.8566, 2.3522),
        "radius_km": 8000.0,
    }
    batched = search_many(
        spark, store, ["term00005", "term00000"], top_k=10,
        geo_filters=[None, gf],
        result_sorts=[None, [("geo_dist", "asc")]],
    ).collect()
    cached_rows = sorted(
        ((r["docid"], r["score"]) for r in batched if r["query_id"] == 0),
        key=lambda t: (-t[1], t[0]),
    )
    single = search(spark, store, "term00005", top_k=10).collect()
    assert cached_rows == [(r["docid"], r["score"]) for r in single]
    assert all(
        r["geo_dist"] is None or math.isnan(r["geo_dist"])
        for r in batched if r["query_id"] == 0
    )
    sorted_rows = [r for r in batched if r["query_id"] == 1]
    assert sorted_rows and all(
        not math.isnan(r["geo_dist"]) for r in sorted_rows
    )


def test_empty_plan_result_sort_schema(spark, geo_store):
    """Round-2 ADVICE low: empty-plan queries with result_sort used to
    return a schema without the sort facet columns."""
    store, _docs = geo_store
    out = search(
        spark, store, "zzznotaterm", default_type="intersection",
        result_sort=[("lang", "asc"), ("score", "desc")],
    )
    assert out.columns == ["docid", "lang", "score"]
    assert out.count() == 0


def test_rewrite_options_reference_knobs(spark, geo_store):
    """The reference QueryRewriting knobs (search.rs:107-160):
    ``correct`` gates rewriting on query-string length,
    ``term_length_threshold`` sets per-term-length edit budgets
    (below the first threshold → no correction; each later threshold
    adds one edit), and the probe is capped at the dictionary's BUILD
    distance (symmetric-delete lookups deeper than the build depth
    are incomplete by construction)."""
    from seekstorm_spark.query.spell import (
        effective_edit_distance,
        spell_correct,
    )

    store, _docs = geo_store
    build_spell_dictionary(spark, store)

    # per-length budget arithmetic (pure)
    assert effective_edit_distance("abc", 2, None) == 2
    assert effective_edit_distance("abc", 2, [4]) == 0
    assert effective_edit_distance("abcd", 2, [4]) == 2
    assert effective_edit_distance("abcdefgh", 2, [2, 8]) == 3
    assert effective_edit_distance("abcdefg", 2, [2, 8]) == 2

    # term_length_threshold suppresses corrections for short terms
    assert spell_correct(store, "temr00000") is not None
    assert (
        spell_correct(store, "temr00000", term_length_threshold=[20])
        is None
    )
    # build-depth cap: asking for distance 5 finds no candidate that
    # distance-2 probing can't (the dictionary was exploded at 2)
    deep = spell_correct(store, "temr00000", max_edits=5)
    base = spell_correct(store, "temr00000")
    assert deep == base

    # correct= min-query-length gate inside search(rewrite="spell")
    good = search(
        spark, store, "temr00000", rewrite="spell",
        rewrite_options={"correct": 2},
    ).collect()
    assert good  # engaged: 9-char query >= 2
    gated = search(
        spark, store, "temr00000", rewrite="spell",
        rewrite_options={"correct": 50},
    ).collect()
    assert gated == []  # too short to engage -> raw misspelling, 0 hits
    # term_length_threshold flows through search() too
    assert (
        search(
            spark, store, "temr00000", rewrite="spell",
            rewrite_options={"term_length_threshold": [20]},
        ).collect()
        == []
    )


def test_geo_range_counts_matches_emitted_distances(spark, geo_store):
    """Distance-bucket counts (reference QueryFacet::Point) tallied
    inside the kernel ≡ bucketing the distances the geo_dist sort
    emits — same haversine, same docs."""
    from seekstorm_spark.query.engine import geo_range_counts, search

    store, _docs = geo_store
    base = (48.8566, 2.3522)
    bounds = [0.0, 2000.0, 6000.0, 12000.0]
    got = {
        (r["bucket_lo"], r["n"])
        for r in geo_range_counts(
            spark, store, "term00000", base, bounds,
            lat="lat", lon="lon",
        ).collect()
    }
    rows = search(
        spark, store, "term00000", top_k=100000, default_type="union",
        geo_filter={"lat": "lat", "lon": "lon", "at": base,
                    "radius_km": 1e9},
        result_sort=[("geo_dist", "asc")],
    ).collect()
    import numpy as np

    d = np.array([r["geo_dist"] for r in rows])
    b = np.asarray(bounds)
    bins = np.searchsorted(b, d[d >= b[0]], side="right") - 1
    want = {
        (bounds[i], int(c))
        for i, c in enumerate(np.bincount(bins, minlength=len(bounds)))
        if c
    }
    assert got == want
    assert sum(n for _b, n in got) == len(rows)

    # cumulative mode = CountWithinRange running sums
    cum = {
        r["bucket_lo"]: r["n_cumulative"]
        for r in geo_range_counts(
            spark, store, "term00000", base, bounds,
            lat="lat", lon="lon", cumulative=True,
        ).collect()
    }
    assert cum[bounds[-1]] == len(rows)

    # miles: bucket bounds rescale, totals are unit-invariant
    mi = {
        r["bucket_lo"]: r["n"]
        for r in geo_range_counts(
            spark, store, "term00000", base,
            [0.0, 2000.0 / 1.609344], lat="lat", lon="lon", unit="mi",
        ).collect()
    }
    assert sum(mi.values()) == len(rows)
    # the mile bound converts to exactly 2000 km, so the first-bucket
    # count (possibly zero/absent) matches the km run's
    assert mi.get(0.0, 0) == dict(got).get(0.0, 0)


def test_facet_counts_prefix_and_length(spark, geo_store):
    """QueryFacet prefix/length options (search.rs:335-369): filter
    returned values by prefix, cap to top-N by count — counts per
    value unchanged vs the unfiltered call."""
    from seekstorm_spark.query.engine import facet_counts

    store, _docs = geo_store
    full = {
        r["value"]: r["n"]
        for r in facet_counts(spark, store, "term00000", ["lang"]).collect()
    }
    assert set(full) == {"de", "en", "fr"}
    pre = {
        r["value"]: r["n"]
        for r in facet_counts(
            spark, store, "term00000", ["lang"], prefix={"lang": "e"}
        ).collect()
    }
    assert pre == {"en": full["en"]}
    top2 = facet_counts(
        spark, store, "term00000", ["lang"], length=2
    ).collect()
    assert len(top2) == 2
    want_top2 = sorted(full.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert {(r["value"], r["n"]) for r in top2} == set(want_top2)


def test_geo_range_counts_many_matches_single(spark, geo_store):
    """Fused N-query geo distance-bucket counts ≡ per-query
    geo_range_counts (one action, shared buffer decode, per-query
    bases/buckets/units)."""
    from seekstorm_spark.query.engine import (
        geo_range_counts,
        geo_range_counts_many,
    )

    store, _docs = geo_store
    reqs = [
        ("term00000", {"base": (48.8566, 2.3522),
                       "ranges": [0.0, 3000.0, 9000.0],
                       "lat": "lat", "lon": "lon"}),
        ("term00000 term00001", {"base": (-10.0, 100.0),
                                 "ranges": [0.0, 5000.0],
                                 "lat": "lat", "lon": "lon",
                                 "unit": "mi"}),
        ("zzz_missing_term", {"base": (0.0, 0.0), "ranges": [0.0],
                              "lat": "lat", "lon": "lon"}),
    ]
    fused = geo_range_counts_many(spark, store, reqs)
    by_q = {}
    for r in fused.collect():
        by_q.setdefault(r["query_id"], set()).add(
            (r["bucket_lo"], r["n"])
        )
    for i, (qstr, spec) in enumerate(reqs):
        single = {
            (r["bucket_lo"], r["n"])
            for r in geo_range_counts(
                spark, store, qstr, spec["base"], spec["ranges"],
                lat=spec["lat"], lon=spec["lon"],
                unit=spec.get("unit", "km"),
            ).collect()
        }
        assert by_q.get(i, set()) == single, i
    assert 2 not in by_q  # missing term -> no rows
