"""Multi-vector chunking (reference vector.rs: chunk_size bytes,
sentence boundaries respected) + doc-level max-sim aggregation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from seekstorm_spark.functions.chunking import (
    chunk_docs,
    chunk_sentences,
    chunked_topk,
    embed_chunks,
)


def test_chunk_sentences_boundaries():
    text = "One two three. Four five! Six seven eight? Nine."
    # chunk_size small enough that each sentence is its own chunk
    chunks = chunk_sentences(text, chunk_size=16)
    assert chunks == ["One two three.", "Four five!", "Six seven eight?", "Nine."]
    # larger budget packs adjacent sentences, still boundary-aligned
    packed = chunk_sentences(text, chunk_size=30)
    assert packed[0] == "One two three. Four five!"
    assert all(len(c.encode()) <= 30 or " " not in c for c in packed)
    # reassembly loses only inter-sentence whitespace
    assert " ".join(packed).split() == text.split()
    # an oversized single sentence is NOT split mid-way
    long_sent = "word " * 50 + "end."
    assert chunk_sentences(long_sent, chunk_size=16) == [long_sent.strip()]
    assert chunk_sentences("", 64) == []


def test_chunk_docs_and_embed(spark):
    rows = [
        (0, "Alpha beta. Gamma delta. Epsilon zeta."),
        (1, "Single sentence only."),
        (2, ""),
    ]
    docs = spark.createDataFrame(rows, "docid long, text string")
    chunks = chunk_docs(docs, chunk_size=14).collect()
    by_doc: dict[int, list[str]] = {}
    for r in chunks:
        by_doc.setdefault(r["docid"], []).append(r["chunk_text"])
    assert by_doc[0] == ["Alpha beta.", "Gamma delta.", "Epsilon zeta."]
    assert by_doc[1] == ["Single sentence only."]
    assert 2 not in by_doc  # empty doc → no chunks
    # chunk_id is the position within the doc
    ids = [(r["docid"], r["chunk_id"]) for r in chunks if r["docid"] == 0]
    assert sorted(ids) == [(0, 0), (0, 1), (0, 2)]

    vecs = embed_chunks(chunk_docs(docs, chunk_size=14), dim=8)
    got = vecs.collect()
    assert all(len(r["embedding"]) == 8 for r in got)
    # deterministic: same text → same vector
    again = {
        (r["docid"], r["chunk_id"]): r["embedding"]
        for r in embed_chunks(chunk_docs(docs, chunk_size=14), dim=8).collect()
    }
    for r in got:
        assert again[(r["docid"], r["chunk_id"])] == r["embedding"]


def test_chunked_topk_max_aggregation(spark):
    """A doc's score is the max cosine over its chunk vectors — a doc
    with one excellent chunk beats a doc with uniformly mediocre
    chunks (the reference's doc-level aggregation)."""
    rng = np.random.RandomState(3)
    q = rng.randn(16).astype(np.float32)
    q /= np.linalg.norm(q)

    def unit(v):
        v = np.asarray(v, dtype=np.float32)
        return (v / np.linalg.norm(v)).tolist()

    noise = rng.randn(16).astype(np.float32)
    rows = [
        # doc 0: one chunk almost parallel to q, others orthogonal-ish
        (0, unit(q + 0.05 * rng.randn(16).astype(np.float32))),
        (0, unit(noise)),
        # doc 1: two moderately-similar chunks
        (1, unit(q + 1.0 * rng.randn(16).astype(np.float32))),
        (1, unit(q + 1.0 * rng.randn(16).astype(np.float32))),
        # doc 2: unrelated
        (2, unit(rng.randn(16).astype(np.float32))),
    ]
    chunks = spark.createDataFrame(rows, "docid long, embedding array<float>")
    got = chunked_topk(chunks, [float(x) for x in q], k=3).collect()
    assert got[0]["docid"] == 0
    assert got[0]["sim"] > got[1]["sim"]
    # per-doc max equals the max of that doc's chunk cosines
    from seekstorm_spark.functions.simsearch import cosine_col

    per_chunk = chunks.select(
        "docid", cosine_col(F.col("embedding"), [float(x) for x in q]).alias("c")
    ).collect()
    want0 = round(max(r["c"] for r in per_chunk if r["docid"] == 0), 4)
    assert got[0]["sim"] == pytest.approx(want0, abs=1e-9)
