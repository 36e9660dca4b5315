"""Multi-vector document chunking + doc-level similarity aggregation.

Engine analog of the reference's vector chunking
(`/root/reference/seekstorm/src/vector.rs`, `index.rs:2087`): long
documents split at SENTENCE boundaries into chunks of at most
``chunk_size`` bytes, each chunk embedded separately, and query-time
doc scores aggregate over the doc's chunk vectors (max-sim). The
embedding model call itself is out of scope in this environment —
``embed_chunks`` takes any vectorizer UDF and defaults to a
documented deterministic pseudo-embedding so the Spark plumbing
(schema, explode, aggregation) is real and tested.

Scale shape: chunking is a stateless Arrow-batched map (no shuffle);
doc-level aggregation is one groupBy on doc_id — the shuffle key is
the document, never the corpus.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
)

# sentence enders followed by whitespace; keeps the ender with the
# sentence (reference vector.rs splits on the same class)
_SENT_RE = re.compile(r"(?<=[.!?])\s+")


def chunk_sentences(text: str, chunk_size: int = 256) -> list[str]:
    """Split ``text`` into chunks of at most ``chunk_size`` BYTES,
    breaking only at sentence boundaries; a single sentence longer
    than ``chunk_size`` becomes its own (oversized) chunk — sentences
    are never split mid-way (reference vector.rs chunking contract).
    """
    if not text:
        return []
    sentences = _SENT_RE.split(text)
    chunks: list[str] = []
    cur: list[str] = []
    cur_bytes = 0
    for s in sentences:
        b = len(s.encode("utf-8"))
        joined = cur_bytes + (1 if cur else 0) + b
        if cur and joined > chunk_size:
            chunks.append(" ".join(cur))
            cur, cur_bytes = [s], b
        else:
            cur.append(s)
            cur_bytes = joined if cur_bytes else b
    if cur:
        chunks.append(" ".join(cur))
    return chunks


def chunk_docs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "docid",
    chunk_size: int = 256,
) -> DataFrame:
    """DataFrame(docid, chunk_id, chunk_text): sentence-boundary
    chunking as an Arrow-batched map — no shuffle, no Python
    row-at-a-time path."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ArrayType(StringType()))
    def chunks_udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: chunk_sentences(t or "", chunk_size))

    return (
        docs.select(
            F.col(id_col).cast("long").alias("docid"),
            F.posexplode(chunks_udf(F.col(text_col))).alias(
                "chunk_id", "chunk_text"
            ),
        )
        .select("docid", F.col("chunk_id").cast("int"), "chunk_text")
    )


def embed_chunks(
    chunks: DataFrame,
    dim: int = 64,
    text_col: str = "chunk_text",
    embed_udf=None,
) -> DataFrame:
    """Attach an ``embedding array<float>`` per chunk. ``embed_udf``
    is where a real model slots (a pandas UDF text→vector, e.g. a
    sentence-transformer behind mapInPandas); the default is a
    DETERMINISTIC hash-based pseudo-embedding — documented stand-in,
    same contract as ``multimodal.extract_features``."""
    if embed_udf is None:
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import FloatType

        import numpy as np

        @pandas_udf(ArrayType(FloatType()))
        def _pseudo(texts: pd.Series) -> pd.Series:
            import hashlib

            out = []
            for t in texts:
                h = hashlib.sha256((t or "").encode()).digest()
                rng = np.random.RandomState(
                    int.from_bytes(h[:4], "big") & 0x7FFFFFFF
                )
                v = rng.randn(dim).astype(np.float32)
                v /= max(float(np.linalg.norm(v)), 1e-9)
                out.append(v.tolist())
            return pd.Series(out)

        embed_udf = _pseudo
    return chunks.withColumn("embedding", embed_udf(F.col(text_col)))


def chunked_topk(
    chunk_vecs: DataFrame,
    query: list[float],
    k: int = 10,
    doc_col: str = "docid",
    vec_col: str = "embedding",
) -> DataFrame:
    """Doc-level top-k over multi-vector docs: each doc scores as the
    MAX cosine over its chunk vectors (the reference's doc-level
    aggregation at query time, vector.rs / index.rs:2087) →
    DataFrame(docid, sim). All JVM column expressions; one groupBy on
    the doc id."""
    from seekstorm_spark.functions.simsearch import cosine_col

    per_chunk = chunk_vecs.select(
        F.col(doc_col).alias("docid"),
        cosine_col(F.col(vec_col), query).alias("_cos"),
    )
    return (
        per_chunk.groupBy("docid")
        .agg(F.round(F.max("_cos"), 4).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("docid").asc())
        .limit(k)
    )
