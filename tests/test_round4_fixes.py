"""Round-4 ADVICE fixes: corrupt-image robustness, case-insensitive
driver-side KWIC, doc-store append meta safety, and binary-safe /doc
serialization."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.test_functions import _make_png


def test_corrupt_png_rows_dropped_not_fatal(spark):
    """A payload with a valid PNG magic but a truncated IHDR or a
    corrupt IDAT must be dropped (or handed to Pillow), never fail the
    Spark task (ADVICE r03 #1)."""
    from seekstorm_spark.functions.multimodal import decode_image_pixels

    rng = np.random.RandomState(11)
    good = rng.randint(0, 256, size=(4, 4, 3), dtype=np.uint8)
    good_png = _make_png(good, 2)
    truncated_ihdr = b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR" + b"\x00\x01"
    # valid structure, IDAT bytes are not a zlib stream
    corrupt_idat = bytearray(good_png)
    idat_at = bytes(corrupt_idat).find(b"IDAT")
    corrupt_idat[idat_at + 4 : idat_at + 10] = b"\xff\xff\xff\xff\xff\xff"
    rows = [
        ("good", bytearray(good_png)),
        ("trunc", bytearray(truncated_ihdr)),
        ("badidat", bytearray(bytes(corrupt_idat))),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["url"]: r for r in decode_image_pixels(df).collect()}
    assert "good" in got
    assert np.array_equal(
        np.frombuffer(got["good"]["pixels"], np.uint8).reshape(4, 4, 3), good
    )
    # the corrupt rows either decode via Pillow or are dropped — but
    # the job completed, which is the property under test
    assert set(got) <= {"good", "trunc", "badidat"}


def test_kwic_fragment_py_case_insensitive():
    """Indexing lowercases, stored text keeps case: the driver-side
    KWIC must still locate and bold capitalized occurrences, keeping
    the original-case text in the bold span (ADVICE r03 #2)."""
    from seekstorm_spark.functions.highlight import kwic_fragment_py

    frag = kwic_fragment_py("The Fast brown fox jumps", ["fast"])
    assert frag == "The <b>Fast</b> brown fox jumps"
    # lowercase occurrence still works as before
    assert kwic_fragment_py("a fast dog", ["fast"]) == "a <b>fast</b> dog"
    # multi-term: each present term bolded, case preserved
    frag2 = kwic_fragment_py("Fast TABLE scan", ["fast", "table"])
    assert frag2 == "<b>Fast</b> <b>TABLE</b> scan"
    assert kwic_fragment_py("no match here", ["absent"]) == ""


def test_doc_store_append_meta_preserved(spark, tmp_path):
    """mode='append' must not rewrite the store's fields/bucketing
    contract: defaulted fields inherit the original meta; mismatched
    explicit fields or bucket size raise (ADVICE r03 #3)."""
    from seekstorm_spark.query.docstore import DocStore, write_doc_store

    path = str(tmp_path / "ds")
    base = spark.createDataFrame(
        [(i, f"u{i}", f"text {i}", i * 2) for i in range(20)],
        "docid long, url string, text string, extra long",
    )
    write_doc_store(
        base, path, id_col="docid", fields=["url", "text"], docs_per_bucket=8
    )
    # append WITHOUT fields: must keep ["url", "text"], not pick up
    # every non-id column of the appended frame
    more = spark.createDataFrame(
        [(i, f"u{i}", f"text {i}", i * 2) for i in range(20, 30)],
        "docid long, url string, text string, extra long",
    )
    write_doc_store(
        more, path, id_col="docid", docs_per_bucket=8, mode="append"
    )
    ds = DocStore(path)
    assert ds.fields == ["url", "text"]
    assert ds.get(5)["url"] == "u5"
    assert ds.get(25)["url"] == "u25"

    with pytest.raises(ValueError, match="fields"):
        write_doc_store(
            more, path, id_col="docid", fields=["url"], docs_per_bucket=8,
            mode="append",
        )
    with pytest.raises(ValueError, match="docs_per_bucket"):
        write_doc_store(
            more, path, id_col="docid", docs_per_bucket=16, mode="append"
        )


def test_server_doc_binary_column_base64(spark, tmp_path):
    """A doc store carrying bytes columns must serve /doc as base64,
    not 500 on json.dumps (ADVICE r03 #4)."""
    import base64

    from seekstorm_spark.query.docstore import DocStore, write_doc_store
    from seekstorm_spark.server import IndexService

    path = str(tmp_path / "bds")
    payload = bytes([0, 1, 2, 250, 255])
    df = spark.createDataFrame(
        [(0, "u0", bytearray(payload))], "docid long, url string, blob binary"
    )
    write_doc_store(df, path, id_col="docid", docs_per_bucket=4)
    svc = IndexService.__new__(IndexService)
    svc.doc_stores = {"idx": DocStore(path)}
    got = svc.doc("idx", 0)
    assert got["url"] == "u0"
    assert base64.b64decode(got["blob"]) == payload
    import json

    json.dumps(got)  # must be serializable


def test_builtin_frequent_term_dictionaries(spark, tmp_path):
    """frequent_terms='en' resolves to the built-in stopword-class
    list (the reference's frequent_en dictionary semantics) and feeds
    n-gram indexing exactly like an explicit list."""
    from seekstorm_spark.dictionaries import FREQUENT_TERMS, frequent_terms_for
    from seekstorm_spark.index.builder import IndexBuilder, assign_docids
    from seekstorm_spark.query.engine import search
    from seekstorm_spark.sources.webtext import synth_webtext

    assert "the" in FREQUENT_TERMS["en"] and "und" in FREQUENT_TERMS["de"]
    assert frequent_terms_for(None) is None
    assert frequent_terms_for(["x", "y"]) == ["x", "y"]
    with pytest.raises(ValueError, match="no built-in"):
        frequent_terms_for("xx")

    docs = assign_docids(synth_webtext(spark, 150, seed=47), order_col="url")
    docs = docs.withColumn(
        "text", F.concat(F.lit("the table of "), F.col("text"))
    )
    store = IndexBuilder(
        spark, str(tmp_path / "idx"), n_buckets=4, frequent_terms="en",
    ).build(docs, text_col="text", id_col="docid")
    assert set(store.meta["frequent_terms"]) == set(FREQUENT_TERMS["en"])
    # every doc starts with "the table of": the phrase matches all of
    # them through the built-list-driven index
    got = search(spark, store, '"the table"', top_k=5).collect()
    assert len(got) == 5


def test_hybrid_search_mode(spark):
    """search(mode='hybrid') fuses the indexed lexical kernel with the
    vector top-k by RRF k=0.6 in one call — identical to composing
    search() + cosine_topk + rrf_fuse by hand (reference hybrid
    SearchMode, search.rs:73-96,1962-2035)."""
    from __spark_entry__ import _emb, _wand_store
    from seekstorm_spark.functions.fusion import rrf_fuse
    from seekstorm_spark.functions.simsearch import cosine_topk
    from seekstorm_spark.query.engine import search

    d = "/root/testdata/sf0.001"
    store = _wand_store(spark, d)
    emb = _emb(spark, d).filter(F.col("vec_id") != 0)
    qv = [float(x) for x in
          _emb(spark, d).filter(F.col("vec_id") == 0).first()["embedding"]]

    got = search(
        spark, store, "fast table", top_k=10, default_type="union",
        mode="hybrid", vector=qv, vectors=emb,
    ).collect()
    lex = search(spark, store, "fast table", top_k=10, default_type="union")
    vec = cosine_topk(emb, qv, k=10).withColumnRenamed("vec_id", "docid")
    want = rrf_fuse(lex, vec, id_col="docid", top_k=10).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want] and got

    with pytest.raises(ValueError, match="requires vector"):
        search(spark, store, "fast", mode="hybrid")
    with pytest.raises(ValueError, match="ann_index"):
        search(spark, store, "fast", mode="hybrid", vector=qv)
    with pytest.raises(ValueError, match="not supported"):
        search(spark, store, "fast", mode="hybrid", vector=qv,
               vectors=emb, result_sort=[("lang", "asc")])
    with pytest.raises(ValueError, match="unknown search mode"):
        search(spark, store, "fast", mode="wat")


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_dedup_embedding_lsh_row_matches_allpairs_twin(spark, sf_dir):
    """The dedup_embedding_pairs DRIVER ROW runs the banded-LSH scale
    path; its output must be bit-identical (pairs AND cosines) to the
    exact all-pairs twin over the same planted-near-dup corpus —
    recall 1.0, zero false positives — and its physical plan must
    contain no cartesian stage (VERDICT r03 'What's wrong' #3)."""
    from __spark_entry__ import _emb_with_dups
    from seekstorm_spark.functions.simsearch import (
        cosine_near_dup_lsh,
        cosine_near_dup_pairs,
    )

    aug = _emb_with_dups(spark, sf_dir)
    lsh_df = cosine_near_dup_lsh(
        aug, dim=64, id_col="vec_id", vec_col="embedding",
        threshold=0.9, bands=8, rows_per_band=8,
    )
    plan = lsh_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    lsh = {(r["id_a"], r["id_b"]): round(r["cosine"], 4)
           for r in lsh_df.collect()}
    exact = {(r["id_a"], r["id_b"]): round(r["cosine"], 4)
             for r in cosine_near_dup_pairs(
                 aug, id_col="vec_id", vec_col="embedding", threshold=0.9
             ).collect()}
    assert len(exact) == 500  # exactly the planted (i, i+10000) pairs
    assert all(b - a == 10000 for a, b in exact)
    assert lsh == exact
