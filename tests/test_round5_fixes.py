"""Round-5 directed fixes (round-4 VERDICT.md + ADVICE.md):

1. frequent-term dictionaries adopted VERBATIM from the reference's
   public assets (13/38 EN words previously differed);
2. robots.txt: rules merged across ALL groups matching at the winning
   specificity (repeated ``User-agent: *`` sections), UA matching
   anchored at product-token boundaries (no mid-token substrings);
3. sitemap parsing: bounded decompression (64 MB cap) + DOCTYPE/ENTITY
   rejection for untrusted crawl bytes;
4. embedder executor cache keyed on max mtime across ALL model files
   (in-place .npy swap without touching the meta file must invalidate);
5. string sort-key block skip gated on a BMP-only dictionary
   (supplementary-plane values could diverge between the dictionary's
   code-point order and a UTF-16 code-unit comparison).
"""

from __future__ import annotations

import gzip
import os
import pathlib

import numpy as np
import pytest
from pyspark.sql import functions as F

REF_DICTS = pathlib.Path("/root/reference/seekstorm/assets/dictionaries")


# ---------------------------------------------------------------------------
# 1. frequent-term dictionary parity


@pytest.mark.skipif(
    not REF_DICTS.exists(), reason="reference checkout not present"
)
def test_frequent_terms_match_reference_assets():
    from seekstorm_spark.dictionaries import FREQUENT_TERMS

    for lang in ("en", "de", "fr", "es"):
        asset = (REF_DICTS / f"frequent_{lang}.txt").read_text(
            encoding="utf-8"
        )
        words = tuple(w for w in asset.split("\n") if w)
        assert FREQUENT_TERMS[lang] == words, f"{lang} diverges from asset"


# ---------------------------------------------------------------------------
# 2. robots group merging + token-boundary UA matching


def test_robots_merges_repeated_star_groups():
    from seekstorm_spark.functions.robots import parse_robots, robots_allowed

    txt = (
        "User-agent: *\nDisallow: /a/\n\n"
        "User-agent: otherbot\nDisallow: /elsewhere/\n\n"
        "User-agent: *\nDisallow: /b/\nAllow: /b/ok\n"
    )
    rules = parse_robots(txt, "mybot")
    # BOTH * groups' rules are present
    assert ("/a/", False) in rules and ("/b/", False) in rules
    assert not robots_allowed("/a/x", rules)
    assert not robots_allowed("/b/x", rules)
    assert robots_allowed("/b/okay", rules)
    assert ("/elsewhere/", False) not in rules


def test_robots_merges_groups_at_winning_specificity():
    from seekstorm_spark.functions.robots import parse_robots

    txt = (
        "User-agent: foobot\nDisallow: /one/\n\n"
        "User-agent: *\nDisallow: /star/\n\n"
        "User-agent: foobot\nDisallow: /two/\n"
    )
    rules = parse_robots(txt, "FooBot/1.2")
    assert ("/one/", False) in rules and ("/two/", False) in rules
    assert ("/star/", False) not in rules


def test_robots_token_boundary_matching():
    from seekstorm_spark.functions.robots import parse_robots

    # mid-token substring must NOT govern the agent
    txt = "User-agent: oo\nDisallow: /x/\n\nUser-agent: *\nDisallow: /y/\n"
    assert parse_robots(txt, "FooBot") == (("/y/", False),)
    # version suffix on the group line is ignored (product token only)
    txt2 = "User-agent: foobot/9.9\nDisallow: /v/\n"
    assert parse_robots(txt2, "FooBot/1.0") == (("/v/", False),)
    # token embedded after a token char ('-') is not a boundary match
    txt3 = "User-agent: bot\nDisallow: /b/\n\nUser-agent: *\nDisallow: /s/\n"
    assert parse_robots(txt3, "my-bot") == (("/s/", False),)
    # ...but after a non-token char it is
    assert parse_robots(txt3, "acme bot/2") == (("/b/", False),)


# ---------------------------------------------------------------------------
# 3. sitemap hardening


def test_sitemap_caps_decompression():
    from seekstorm_spark.sources.sitemap import (
        MAX_UNCOMPRESSED,
        build_sitemap,
        parse_sitemap,
    )

    # a 70 MB body compresses to ~tiny bytes; must be dropped, not
    # expanded past the cap
    bomb = gzip.compress(b"<urlset>" + b" " * (MAX_UNCOMPRESSED + 1024))
    assert parse_sitemap(bomb) == []
    # an ordinary gzipped sitemap still parses
    ok = build_sitemap([("http://h.test/a", None)], compress=True)
    assert parse_sitemap(ok) == [("url", "http://h.test/a", None)]


def test_sitemap_rejects_doctype():
    from seekstorm_spark.sources.sitemap import parse_sitemap

    evil = (
        b'<?xml version="1.0"?>\n'
        b'<!DOCTYPE urlset [<!ENTITY a "bbbb">]>\n'
        b'<urlset><url><loc>http://h.test/&a;</loc></url></urlset>'
    )
    assert parse_sitemap(evil) == []


# ---------------------------------------------------------------------------
# 4. embedder cache invalidation on non-meta file swap


def test_embedder_cache_keys_on_all_model_files(tmp_path):
    from seekstorm_spark.functions.embedder import (
        _load_cached,
        build_static_model,
    )

    path = str(tmp_path / "model")
    build_static_model(path, ["alpha", "beta"], dim=4)
    m1 = _load_cached(path)
    v1 = m1.encode(["alpha"])
    # swap embeddings.npy in place; meta file mtime pinned OLD
    meta = os.path.join(path, "embedder_meta.json")
    old = os.path.getmtime(meta) - 100
    os.utime(meta, (old, old))
    emb = os.path.join(path, "embeddings.npy")
    mat = np.load(emb)
    np.save(emb, mat * 2.0)
    future = os.path.getmtime(emb) + 100
    os.utime(emb, (future, future))
    m2 = _load_cached(path)
    assert m2 is not m1, "cache served a stale model after .npy swap"
    v2 = m2.encode(["alpha"])
    # normalized vectors are scale-invariant; compare raw matrices
    assert not np.array_equal(m1.matrix, m2.matrix)
    assert v1.shape == v2.shape


# ---------------------------------------------------------------------------
# multimodal extract_features → real embedder (round-4 verdict item 8)


def test_extract_features_delegates_to_embedder(spark, tmp_path):
    from seekstorm_spark.functions.embedder import (
        StaticEmbedder,
        build_static_model,
    )
    from seekstorm_spark.functions.multimodal import extract_features

    model = str(tmp_path / "model")
    build_static_model(
        model, ["fast", "join", "query", "merge", "table"], dim=8
    )
    rows = [
        ("u0", b"fast query join"),
        ("u1", b"merge table merge"),
        ("u2", b"\x89PNG\r\n\x1a\n" + b"\x00" * 24),  # image: model slot
    ]
    docs = spark.createDataFrame(rows, "url string, html binary")
    got = {
        r["url"]: r["feature"]
        for r in extract_features(docs, model_path=model).collect()
    }
    m = StaticEmbedder(model)
    want = m.encode(["fast query join", "merge table merge"])
    assert np.allclose(got["u0"], want[0], atol=1e-6)
    assert np.allclose(got["u1"], want[1], atol=1e-6)
    # the PNG payload takes the digest slot — same dim, unit norm,
    # deterministic
    assert len(got["u2"]) == m.dim
    assert abs(float(np.linalg.norm(got["u2"])) - 1.0) < 1e-5
    again = {
        r["url"]: r["feature"]
        for r in extract_features(docs, model_path=model).collect()
    }
    assert again["u2"] == got["u2"]


def test_chunking_embedder_ann_pipeline(spark, tmp_path):
    """Feature vectors flow chunking → static embedder → doc-level ANN
    in one pipeline: the doc sharing the query's words ranks first."""
    from seekstorm_spark.functions.chunking import chunk_docs, embed_chunks
    from seekstorm_spark.functions.chunking import chunked_topk
    from seekstorm_spark.functions.embedder import (
        StaticEmbedder,
        build_static_model,
        model_embed_udf,
    )

    model = str(tmp_path / "model")
    build_static_model(
        model, ["fast", "join", "query", "merge", "table", "scan"], dim=8
    )
    docs = spark.createDataFrame(
        [
            (0, "fast query join. fast join runs."),
            (1, "merge table merge. table scan merge."),
            (2, "scan scan scan. table table."),
        ],
        "docid long, text string",
    )
    chunks = chunk_docs(docs, chunk_size=32)
    vecs = embed_chunks(chunks, embed_udf=model_embed_udf(model))
    q = [float(x) for x in StaticEmbedder(model).encode(["fast query"])[0]]
    top = chunked_topk(vecs, q, k=3).collect()
    assert top[0]["docid"] == 0
    assert top[0]["sim"] > top[-1]["sim"]


# ---------------------------------------------------------------------------
# enable_fallback (reference Index.enable_fallback, search.rs:3555-3559)


@pytest.fixture(scope="module")
def fallback_store(spark, tmp_path_factory):
    from seekstorm_spark.index.builder import IndexBuilder, assign_docids
    from seekstorm_spark.sources.webtext import synth_webtext

    docs = assign_docids(synth_webtext(spark, 256, seed=53), order_col="url")
    path = str(tmp_path_factory.mktemp("fb") / "idx")
    return IndexBuilder(spark, path, n_buckets=4).build(
        docs, text_col="text", id_col="docid"
    )


def _rare_and_pair(spark, store):
    """A term pair present in the corpus whose intersection yields
    fewer than 10 docs (zipfian tail terms co-occur rarely)."""
    from seekstorm_spark.query.engine import search

    for a, b in (("term00150", "term00160"), ("term00120", "term00140")):
        n_and = search(
            spark, store, f"+{a} +{b}", top_k=10, default_type="union"
        ).count()
        n_a = search(spark, store, a, top_k=1, default_type="union").count()
        n_b = search(spark, store, b, top_k=1, default_type="union").count()
        if n_a and n_b and n_and < 10:
            return a, b, n_and
    pytest.skip("no sparse pair in this corpus seed")


def test_fallback_retries_and_as_or(spark, fallback_store):
    from seekstorm_spark.query.engine import search

    a, b, n_and = _rare_and_pair(spark, fallback_store)
    got = search(
        spark, fallback_store, f"+{a} +{b}", top_k=10,
        default_type="union", enable_fallback=True,
    ).collect()
    want = search(
        spark, fallback_store, f"{a} {b}", top_k=10, default_type="union"
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) == 10 > n_and


def test_fallback_noop_when_and_fills(spark, fallback_store):
    from seekstorm_spark.query.engine import search

    # two head terms co-occur plenty: the strict page is returned as-is
    q = "+term00000 +term00001"
    got = search(
        spark, fallback_store, q, top_k=5, default_type="union",
        enable_fallback=True,
    ).collect()
    want = search(
        spark, fallback_store, q, top_k=5, default_type="union"
    ).collect()
    assert len(want) == 5
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_fallback_skips_missing_term_and_phrases(spark, fallback_store):
    from seekstorm_spark.query.engine import search

    # missing required term: the reference breaks its fallback loop
    # (search.rs:3290-3294) — empty result, no retry
    got = search(
        spark, fallback_store, "+term00000 +zzznothere", top_k=10,
        default_type="union", enable_fallback=True,
    ).collect()
    assert got == []
    # phrase queries are not retried either
    ph = search(
        spark, fallback_store, '"term00150 term00160"', top_k=10,
        default_type="union", enable_fallback=True,
    ).collect()
    strict = search(
        spark, fallback_store, '"term00150 term00160"', top_k=10,
        default_type="union",
    ).collect()
    assert [tuple(r) for r in ph] == [tuple(r) for r in strict]


# ---------------------------------------------------------------------------
# 5. string sort-key skip gated on BMP-only dictionaries


def test_dict_bmp_only_flags():
    from seekstorm_spark.query.engine import _dict_bmp_only

    class FakeStore:
        pass

    s = FakeStore()
    assert _dict_bmp_only(s, "ascii", {"ascii": ["a", "zz"]})
    assert _dict_bmp_only(s, "bmp", {"bmp": ["￿", ""]})
    assert not _dict_bmp_only(s, "astral", {"astral": ["a", "x\U0001f984"]})
    assert _dict_bmp_only(s, "empty", {"empty": []})
    # memoized per facet on the store object
    assert s._bmp_only_cache == {
        "ascii": True, "bmp": True, "astral": False, "empty": True,
    }


@pytest.fixture(scope="module")
def astral_store(spark, tmp_path_factory):
    """String facet whose dictionary contains a supplementary-plane
    value — the code-zone skip must NOT engage, and sorted search must
    still match the unpruned path."""
    from seekstorm_spark.index.builder import IndexBuilder, assign_docids
    from seekstorm_spark.sources.webtext import synth_webtext

    docs = assign_docids(synth_webtext(spark, 192, seed=47), order_col="url")
    docs = docs.withColumn(
        "tag",
        F.when(F.col("docid") % 3 == 0, F.lit("\U0001f984 unicorn"))
        .when(F.col("docid") % 3 == 1, F.lit("zebra"))
        .otherwise(F.lit("aardvark")),
    )
    path = str(tmp_path_factory.mktemp("astral") / "idx")
    return IndexBuilder(
        spark, path, n_buckets=4, block_size=64, facet_cols=["tag"]
    ).build(docs, text_col="text", id_col="docid")


def test_astral_string_sort_matches_unpruned(spark, astral_store):
    from seekstorm_spark.query.engine import _dict_bmp_only, search

    store = astral_store
    vals = store.meta["facets"]["tag"]["values"]
    assert any(max(map(ord, v)) > 0xFFFF for v in vals)
    assert not _dict_bmp_only(store, "tag", {"tag": vals})
    for direction in ("asc", "desc"):
        got = search(
            spark, store, "term00000", top_k=15, default_type="union",
            result_sort=[("tag", direction)],
        ).collect()
        want = search(
            spark, store, "term00000", top_k=15, default_type="union",
            result_sort=[("tag", direction)], prune=False,
        ).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_ascii_dictionary_still_engages_skip(spark, astral_store):
    """The gate must not disable the skip for BMP dictionaries — guard
    against an over-broad fix (the skip is the round-4 feature)."""
    from seekstorm_spark.query.engine import _dict_bmp_only

    class FakeStore:
        pass

    assert _dict_bmp_only(FakeStore(), "cat", {"cat": ["cat00", "cat01"]})
