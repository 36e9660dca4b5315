"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Designed for 100 TB corpora:

* **exact** — hash-groupBy on a content fingerprint; one shuffle,
  map-side combinable.
* **n-gram Jaccard** — shingle → explode → self-join on shingle →
  per-pair intersection counts (candidate generation is inverted-
  index-style, never an O(N²) cross join); |A∪B| via
  inclusion–exclusion so no second pass over pairs.
* **MinHash+LSH** — k hash functions over shingles (seeded md5,
  engine-agnostic), band → bucket → join candidates within buckets
  only.
* **SimHash** — 64-bit weighted-bit fingerprint; near-dups = equal
  fingerprints (or banded prefixes at scale).

Everything shuffles on content-derived keys (shingle/band/bucket), so
skew follows shingle frequency — cap posting-style with a
``max_docs_per_shingle`` guard (frequent shingles carry no dedup
signal, same reasoning as stopword handling in the index).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from seekstorm_spark.functions.textstats import doc_fingerprint


def exact_dup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of byte-identical (normalized) docs:
    (fingerprint, dup_count, min doc id) for groups with >1 member."""
    return (
        df.select(
            F.col(id_col).alias("docid"),
            doc_fingerprint(F.col(text_col)).alias("fingerprint"),
        )
        .groupBy("fingerprint")
        .agg(
            F.count("*").alias("dup_count"),
            F.min("docid").alias("keeper_docid"),
        )
        .filter(F.col("dup_count") > 1)
    )


def shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct word n-gram shingles per doc via built-in array ops:
    tokens → transform(sequence) → join — no Python in the plan."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    k = F.size(toks) - (n - 1)
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(k - 1, F.lit(-1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return (
        df.select(F.col(id_col).alias("docid"), F.explode(sh).alias("shingle"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.6,
    max_docs_per_shingle: int = 1000,
) -> DataFrame:
    """(docid_a, docid_b, jaccard) for pairs ≥ threshold.

    Candidate pairs come from co-occurring shingles (inverted-index
    join), intersection size from the pair count, union via
    inclusion–exclusion — the same |A∪B| = |A|+|B|−|A∩B| trick the
    reference uses for union counts (`union.rs:1236-1248`)."""
    sh = shingles(df, id_col, text_col, n).cache()
    sizes = sh.groupBy("docid").agg(F.count("*").alias("n_sh"))
    # drop shingles too frequent to be discriminative (skew guard)
    freq_ok = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_docs_per_shingle)
        .select("shingle")
    )
    sh2 = sh.join(freq_ok, "shingle")
    a = sh2.select(F.col("docid").alias("docid_a"), "shingle")
    b = sh2.select(F.col("docid").alias("docid_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("docid_a") < F.col("docid_b"))
        .groupBy("docid_a", "docid_b")
        .agg(F.count("*").alias("n_common"))
    )
    out = (
        inter.join(
            sizes.select(
                F.col("docid").alias("docid_a"), F.col("n_sh").alias("n_a")
            ),
            "docid_a",
        )
        .join(
            sizes.select(
                F.col("docid").alias("docid_b"), F.col("n_sh").alias("n_b")
            ),
            "docid_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("docid_a", "docid_b", "jaccard")
    )
    return out


def _md5_u64(data: bytes) -> int:
    """First 8 md5 bytes, big-endian → uint64. Engine-agnostic: DuckDB's
    ('0x' || substr(md5(x),1,16))::UBIGINT computes the same value."""
    return int.from_bytes(hashlib.md5(data).digest()[:8], "big")


@pandas_udf(ArrayType(LongType()))
def _minhash_udf(texts: pd.Series) -> pd.Series:
    """128-permutation MinHash signature over 3-token shingles."""
    n_hashes = 128

    def sig(t: str) -> list[int]:
        toks = (t or "").lower().split()
        shs = {
            " ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 0))
        } or {t or ""}
        base = np.array(
            [_md5_u64(s.encode()) for s in shs], dtype=np.uint64
        )
        # universal hashing: h_i(x) = (a_i * x + b_i) mod 2^61-1
        rng = np.random.default_rng(1234)
        a = rng.integers(1, 2**31, size=n_hashes, dtype=np.uint64)
        b = rng.integers(0, 2**31, size=n_hashes, dtype=np.uint64)
        m = np.uint64((1 << 61) - 1)
        vals = (base[None, :] * a[:, None] + b[:, None]) % m
        return vals.min(axis=1).astype(np.int64).tolist()

    return texts.map(sig)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 32,
    rows_per_band: int = 4,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH.

    bands × rows_per_band must equal the signature length (128).
    Docs sharing any band bucket become candidates (probability ≈
    1-(1-j^r)^b). Shuffle key = (band, bucket-hash): bounded skew.
    """
    assert bands * rows_per_band == 128
    sigs = df.select(
        F.col(id_col).alias("docid"), _minhash_udf(F.col(text_col)).alias("sig")
    )
    banded = sigs.select(
        "docid",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.hash(
                    F.concat_ws(
                        ",",
                        F.slice(F.col("sig"), i * rows_per_band + 1, rows_per_band),
                    )
                ),
            )
        ).alias("band", "bucket"),
    )
    a = banded.select(F.col("docid").alias("docid_a"), "band", "bucket")
    b = banded.select(F.col("docid").alias("docid_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("docid_a") < F.col("docid_b"))
        .select("docid_a", "docid_b")
        .distinct()
    )


@pandas_udf(LongType())
def simhash_udf(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens (tf-weighted bits)."""

    def sh(t: str) -> int:
        toks = (t or "").lower().split()
        if not toks:
            return 0
        uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
        hashes = np.array([_md5_u64(u.encode()) for u in uniq], dtype=np.uint64)
        bits = (
            (hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)
        ).astype(np.int64)
        weights = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
        out = np.uint64(0)
        for bit in np.flatnonzero(weights > 0):
            out |= np.uint64(1) << np.uint64(bit)
        return int(out.astype(np.int64))  # two's-complement into BIGINT

    return texts.map(sh)


def simhash_dup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact-SimHash collision groups (Hamming-0 near-dups). At scale,
    band the 64 bits into 4×16 prefixes for Hamming ≤3 candidates."""
    return (
        df.select(
            F.col(id_col).alias("docid"),
            simhash_udf(F.col(text_col)).alias("simhash"),
        )
        .groupBy("simhash")
        .agg(F.count("*").alias("dup_count"), F.min("docid").alias("keeper_docid"))
        .filter(F.col("dup_count") > 1)
    )
