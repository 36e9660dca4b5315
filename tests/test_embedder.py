"""Model2Vec-style static embedding inference (reference
index.rs:2066-2203 StaticModel load + vector.rs:502-508 encode):
WordPiece segmentation, mean pooling, normalization, the safetensors
reader, and the Spark UDF surface."""

from __future__ import annotations

import json
import os
import struct

import numpy as np
import pytest

from seekstorm_spark.functions.embedder import (
    StaticEmbedder,
    build_static_model,
    embed_texts,
    model_embed_udf,
)


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m2v") / "model")
    build_static_model(
        path,
        ["fast", "join", "query", "merge", "table", "##s", "un", "##fast"],
        dim=6,
    )
    return path


def test_build_is_deterministic(tmp_path, model_dir):
    other = str(tmp_path / "again")
    build_static_model(
        other,
        ["fast", "join", "query", "merge", "table", "##s", "un", "##fast"],
        dim=6,
    )
    a = np.load(os.path.join(model_dir, "embeddings.npy"))
    b = np.load(os.path.join(other, "embeddings.npy"))
    assert (a == b).all()


def test_wordpiece_greedy_longest_match(model_dir):
    m = StaticEmbedder(model_dir)
    assert m.wordpiece("table") == [m.vocab["table"]]
    # continuation pieces carry ## ; greedy longest prefix first
    assert m.wordpiece("tables") == [m.vocab["table"], m.vocab["##s"]]
    assert m.wordpiece("unfast") == [m.vocab["un"], m.vocab["##fast"]]
    # un-segmentable words are skipped whole (model2vec drops unknowns)
    assert m.wordpiece("zzz") is None
    assert m.wordpiece("fastzzz") is None  # prefix matches, tail fails


def test_encode_mean_pool_and_normalize(model_dir):
    m = StaticEmbedder(model_dir)
    v = m.encode(["fast join", "FAST Join", "zzz only unknown", ""])
    assert np.allclose(v[0], v[1])  # lowercasing
    assert np.all(v[2] == 0) and np.all(v[3] == 0)  # zero when no pieces
    ids = [m.vocab["fast"], m.vocab["join"]]
    expect = m.matrix[ids].mean(axis=0)
    expect = expect / np.linalg.norm(expect)
    assert np.allclose(v[0].astype(np.float64), expect, atol=1e-7)
    # occurrences count: "fast fast join" != "fast join"
    v2 = m.encode(["fast fast join"])[0]
    assert not np.allclose(v2, v[0])


def test_unnormalized_model(tmp_path):
    path = str(tmp_path / "raw")
    build_static_model(path, ["fast", "join"], dim=4, normalize=False)
    m = StaticEmbedder(path)
    v = m.encode(["fast join"])[0].astype(np.float64)
    expect = m.matrix.mean(axis=0)
    assert np.allclose(v, expect, atol=1e-7)
    assert abs(np.linalg.norm(v) - 1.0) > 1e-3  # genuinely unnormalized


def test_safetensors_reader(tmp_path, model_dir):
    """model.safetensors (public format) takes precedence over the
    .npy and yields identical encodings."""
    m = StaticEmbedder(model_dir)
    mat = m.matrix.astype(np.float32)
    path = str(tmp_path / "st")
    os.makedirs(path)
    hdr = {
        "embeddings": {
            "dtype": "F32",
            "shape": list(mat.shape),
            "data_offsets": [0, mat.nbytes],
        }
    }
    hb = json.dumps(hdr).encode()
    with open(os.path.join(path, "model.safetensors"), "wb") as f:
        f.write(struct.pack("<Q", len(hb)) + hb + mat.tobytes())
    for name in ("vocab.txt", "embedder_meta.json"):
        with open(os.path.join(model_dir, name)) as src, open(
            os.path.join(path, name), "w"
        ) as dst:
            dst.write(src.read())
    m2 = StaticEmbedder(path)
    texts = ["fast join tables", "unfast merge"]
    assert np.allclose(m2.encode(texts), m.encode(texts))


def test_vocab_matrix_mismatch_rejected(tmp_path, model_dir):
    path = str(tmp_path / "bad")
    os.makedirs(path)
    np.save(os.path.join(path, "embeddings.npy"),
            np.zeros((3, 4), dtype=np.float32))
    with open(os.path.join(path, "vocab.txt"), "w") as f:
        f.write("a\nb\n")
    with open(os.path.join(path, "embedder_meta.json"), "w") as f:
        json.dump({"dim": 4, "normalize": True}, f)
    with pytest.raises(ValueError, match="vocab has 2"):
        StaticEmbedder(path)


def test_spark_udf_matches_local_encode(spark, model_dir):
    """embed_texts (Arrow-batched UDF) ≡ StaticEmbedder.encode on the
    driver — same vectors bit-for-bit (both f32)."""
    texts = [
        "fast join query",
        "tables merge unfast",
        "zzz nothing",
        "fast fast fast join",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id long, text string")
    rows = (
        embed_texts(df, model_dir, text_col="text")
        .orderBy("id")
        .collect()
    )
    local = StaticEmbedder(model_dir).encode(texts)
    for i, r in enumerate(rows):
        assert np.array_equal(
            np.array(r["embedding"], dtype=np.float32), local[i]
        ), i


def test_chunking_integration(spark, model_dir):
    """The model UDF plugs into embed_chunks → chunked_topk: the
    multi-vector pipeline runs with REAL inference end-to-end."""
    from seekstorm_spark.functions.chunking import (
        chunk_docs,
        chunked_topk,
        embed_chunks,
    )

    docs = spark.createDataFrame(
        [
            (0, "fast join query. merge table fast. join join."),
            (1, "tables merge. query merge fast join."),
            (2, "zzz unknownwords only."),
        ],
        "docid long, text string",
    )
    chunks = chunk_docs(docs, chunk_size=24)
    vecs = embed_chunks(chunks, embed_udf=model_embed_udf(model_dir))
    m = StaticEmbedder(model_dir)
    q = [float(x) for x in m.encode(["fast join"])[0]]
    top = chunked_topk(vecs, q, k=5).collect()
    got = {r["docid"]: r["sim"] for r in top}
    assert set(got) <= {0, 1, 2}
    assert 0 in got and 1 in got
    # doc 2 embeds to the zero vector -> NULL cosine; it must not
    # outrank real matches (it either drops or sorts last)
    best = max(got, key=lambda d: (got[d] is not None, got[d]))
    assert best in (0, 1)
