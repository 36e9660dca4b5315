"""Similarity search over embedding columns (array<float>).

Engine analog of the reference's vector path
(`/root/reference/seekstorm/src/vector_similarity.rs`), re-expressed
for Spark:

* **brute-force cosine top-k** — the exact baseline: JVM-side
  `zip_with` dot product + `orderBy.limit` (Catalyst/Tungsten
  codegen, no Python in the plan);
* **LSH-bucketed ANN** — random-hyperplane signatures (deterministic
  seeded planes) → candidates share a bucket → exact re-rank inside
  buckets only: the scale path (shuffle on bucket keys instead of a
  cross join), mirroring the reference's IVF nprobe idea
  (`vector_similarity.rs:43-68`) with hyperplane buckets instead of
  k-medoid cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType, LongType

from seekstorm_spark.sqlexpr import double_array, long_array


def cosine_col(vec_col, query: list[float]):
    """cosine(vec, query) as a built-in column expression (float64)."""
    q = [float(x) for x in query]
    acc = 0.0
    for x in q:  # sequential f64 sum — matches SQL list_sum order
        acc += x * x
    qnorm = float(np.sqrt(acc))
    qlit = double_array(q)
    v = F.transform(vec_col, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(v, qlit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    vnorm = F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    # try_divide: a zero-norm vector (e.g. a chunk with no known
    # tokens) yields NULL instead of an ANSI divide-by-zero error;
    # nonzero vectors are bit-identical to plain division
    return F.try_divide(dot, vnorm * F.lit(qnorm))


def cosine_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity; deterministic tie-break on id."""
    return (
        df.select(
            F.col(id_col),
            F.round(cosine_col(F.col(vec_col), query), 4).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def dot_col(vec_col, query: list[float]):
    """dot(vec, query) as a built-in column expression (float64) —
    reference Dot similarity (vector_similarity.rs:15-41)."""
    qlit = double_array(query)
    v = F.transform(vec_col, lambda x: x.cast("double"))
    return F.aggregate(
        F.zip_with(v, qlit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def euclidean_col(vec_col, query: list[float]):
    """Euclidean distance ||vec - query|| as a built-in column
    expression (float64) — reference Euclidean similarity."""
    qlit = double_array(query)
    v = F.transform(vec_col, lambda x: x.cast("double"))
    return F.sqrt(
        F.aggregate(
            F.zip_with(v, qlit, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def dot_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by dot product (highest first)."""
    return (
        df.select(
            F.col(id_col),
            F.round(dot_col(F.col(vec_col), query), 4).alias("dot"),
        )
        .orderBy(F.col("dot").desc(), F.col(id_col).asc())
        .limit(k)
    )


def euclidean_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by Euclidean distance (nearest first)."""
    return (
        df.select(
            F.col(id_col),
            F.round(euclidean_col(F.col(vec_col), query), 4).alias("dist"),
        )
        .orderBy(F.col("dist").asc(), F.col(id_col).asc())
        .limit(k)
    )


def quantize_i8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector symmetric 8-bit scalar quantization — the
    reference's SQ path (vector_similarity.rs 8-bit scalar
    quantization used in its SIFT/GIST benchmarks): code_i =
    round(x_i / scale) with scale = max|x| / 127, stored alongside the
    scale so similarities rescale exactly. Pure column expressions
    (no UDF): 4× smaller vectors, and i8 codes are what a SIMD kernel
    would consume on the executor."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = (
        F.aggregate(
            v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
        )
        / F.lit(127.0)
    )
    return df.select(
        F.col(id_col),
        scale.alias("scale"),
        F.transform(
            v,
            lambda x: F.when(scale != 0.0, F.round(x / scale, 0))
            .otherwise(F.lit(0.0))
            .cast("tinyint"),
        ).alias("codes"),
    )


def quantized_cosine_topk(
    qdf: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Cosine top-k over i8-quantized codes (from :func:`quantize_i8`).
    The per-vector scale cancels in the cosine numerator/denominator,
    so similarity = cos(codes, query) exactly as the reference's SQ
    search rescales (quantization error only from the rounding)."""
    codes_f = F.transform(F.col("codes"), lambda x: x.cast("double"))
    return (
        qdf.select(
            F.col(id_col),
            F.round(cosine_col(codes_f, query), 4).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def quantize_u8_affine(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector AFFINE (asymmetric) 8-bit scalar quantization — the
    reference's affine SQ variant (vector_similarity.rs:1226+): each
    vector stores (zero_point=min, scale=(max−min)/255) and codes
    code_i = round((x_i − min) / scale) ∈ [0, 255]. Unlike symmetric
    SQ the full u8 range is used even for skewed value distributions.
    Pure column expressions; dequantize: x̂_i = zero + code_i·scale."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    vmin = F.array_min(v)
    vmax = F.array_max(v)
    scale = (vmax - vmin) / F.lit(255.0)
    return df.select(
        F.col(id_col),
        vmin.alias("zero"),
        scale.alias("scale"),
        F.transform(
            v,
            lambda x: F.when(scale != 0.0, F.round((x - vmin) / scale, 0))
            .otherwise(F.lit(0.0))
            .cast("smallint"),
        ).alias("codes"),
    )


def affine_cosine_topk(
    qdf: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Cosine top-k over affine-quantized codes: vectors dequantize as
    zero + code·scale (the affine terms do NOT cancel — the zero
    point shifts every component, so similarity runs on the
    reconstruction, as the reference's affine SQ search does)."""
    deq = F.transform(
        F.col("codes"),
        lambda c: F.col("zero") + c.cast("double") * F.col("scale"),
    )
    return (
        qdf.select(
            F.col(id_col),
            F.round(cosine_col(deq, query), 4).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# TurboQuant: sign-scramble + Fast Walsh-Hadamard rotation + i8 SQ
# (reference vector_similarity.rs:1825-2090 `TurboQuant`). The random-
# rotation step spreads each vector's energy evenly across dimensions
# before quantizing, so the per-vector scale (sigma/32) loses far less
# precision on spiky embeddings than plain max/127 SQ. All float math
# here is float64 with a fixed per-element operation order so the
# DuckDB oracle can mirror it op-for-op (butterfly passes are single
# adds/subs per element — no accumulation-order ambiguity).
# ---------------------------------------------------------------------------

TQ_SEED = 42


def tq_sign_mask(dim: int, seed: int = TQ_SEED) -> np.ndarray:
    """Deterministic ±1 scramble mask (reference seed_mask,
    vector_similarity.rs:1846-1849 — theirs is ChaCha8-derived; ours is
    a seeded PCG64 draw: any fixed ±1 mask gives the same guarantees)."""
    rng = np.random.default_rng(seed)
    return np.where(rng.random(dim) < 0.5, 1.0, -1.0).astype(np.float64)


def _tq_next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _tq_quantize_batch(
    mat: np.ndarray, sign: np.ndarray, normalize: bool
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Quantize a (n, d0) float64 batch → (codes i8 (n, dim), scale
    (n,), norm (n,)). Mirrors reference quantize_f32_i8
    (vector_similarity.rs:1926-1956) in float64:
    pad → ×sign → FWHT (÷√dim) → scale = (‖h‖/√dim)/32 → round-half-
    away-from-zero, clamp ±127. Sums run SEQUENTIALLY over dimensions
    (vectorized across rows) so DuckDB list_sum folds identically."""
    n, d0 = mat.shape
    dim = sign.shape[0]
    mat = mat.astype(np.float64, copy=True)
    if normalize:
        # cosine mode: normalize at index time (vector_similarity.rs:17-20)
        acc = np.zeros(n, dtype=np.float64)
        for i in range(d0):
            acc = acc + mat[:, i] * mat[:, i]
        s = np.sqrt(acc)
        s = np.where(s == 0.0, 1.0, s)
        mat = mat / s[:, None]
    a = np.zeros((n, dim), dtype=np.float64)
    a[:, :d0] = mat
    a = a * sign
    h = 1
    while h < dim:
        g = a.reshape(n, dim // (2 * h), 2, h)
        x = g[:, :, 0, :]
        y = g[:, :, 1, :]
        a = np.stack([x + y, x - y], axis=2).reshape(n, dim)
        h *= 2
    a = a / np.sqrt(float(dim))
    acc = np.zeros(n, dtype=np.float64)
    for i in range(dim):
        acc = acc + a[:, i] * a[:, i]
    scale = np.maximum(np.sqrt(acc) / np.sqrt(float(dim)) / 32.0, 1e-8)
    r = a / scale[:, None]
    codes = np.clip(
        np.floor(np.abs(r) + 0.5) * np.sign(r), -127.0, 127.0
    ).astype(np.int8)
    sq = (codes.astype(np.int64) ** 2).sum(axis=1)
    norm = (sq.astype(np.float64) * scale) * scale
    return codes, scale, norm


def turboquant_vectors(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = TQ_SEED,
    normalize: bool = True,
) -> DataFrame:
    """TurboQuant an embedding column → (id, codes array<tinyint>,
    scale, norm). `dim` is the INPUT dimension (padded internally to
    the next power of two, vector_similarity.rs:1835-1841); pass
    normalize=False for Dot/Euclidean similarity (Cosine normalizes at
    index time). Arrow-batched Pandas UDF — the rotation is a dense
    batched numpy FWHT, never per-row Python."""
    from pyspark.sql.types import (
        ByteType,
        DoubleType,
        StructField,
        StructType,
    )

    sign = tq_sign_mask(_tq_next_pow2(dim), seed)
    out_type = StructType(
        [
            StructField("codes", ArrayType(ByteType())),
            StructField("scale", DoubleType()),
            StructField("norm", DoubleType()),
        ]
    )

    @pandas_udf(out_type)
    def tq(vecs: pd.Series) -> pd.DataFrame:
        mat = np.stack(vecs.values).astype(np.float64)
        codes, scale, norm = _tq_quantize_batch(mat, sign, normalize)
        return pd.DataFrame(
            {
                "codes": [c for c in codes],
                "scale": scale,
                "norm": norm,
            }
        )

    # materialize the struct once, then expand — referencing the UDF
    # column three times via getField would evaluate it three times
    return df.select(F.col(id_col), tq(F.col(vec_col)).alias("q")).select(
        id_col, "q.codes", "q.scale", "q.norm"
    )


def turboquant_query(
    query: list[float], seed: int = TQ_SEED, normalize: bool = True
) -> tuple[list[int], float, float]:
    """Quantize the query vector through the IDENTICAL batch kernel
    (1-row batch) so query and index codes are bit-identical twins."""
    mat = np.asarray([query], dtype=np.float64)
    sign = tq_sign_mask(_tq_next_pow2(mat.shape[1]), seed)
    codes, scale, norm = _tq_quantize_batch(mat, sign, normalize)
    return [int(c) for c in codes[0]], float(scale[0]), float(norm[0])


def turboquant_topk(
    tqdf: DataFrame,
    query: list[float],
    k: int = 10,
    similarity: str = "cosine",
    id_col: str = "vec_id",
    seed: int = TQ_SEED,
) -> DataFrame:
    """Top-k over TurboQuant codes. The distance kernel is pure JVM
    integer arithmetic (zip_with + aggregate over tinyint codes — the
    Spark analog of the reference's dot_i8 SIMD kernel,
    vector_similarity.rs:2070-2076) rescaled by the two per-vector
    scales: dot = Σq1·q2 · s1 · s2; euclidean² = n1 + n2 − 2·dot
    (vector_similarity.rs:2058-2068). Cosine = dot over vectors
    normalized at index time."""
    normalize = similarity == "cosine"
    qcodes, qscale, qnorm = turboquant_query(query, seed, normalize)
    qlit = long_array(qcodes)
    idot = F.aggregate(
        F.zip_with(
            F.col("codes"), qlit, lambda a, b: a.cast("long") * b
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    sim = (idot.cast("double") * F.col("scale")) * F.lit(qscale)
    if similarity == "euclidean":
        dist = F.greatest(
            F.col("norm") + F.lit(qnorm) - F.lit(2.0) * sim, F.lit(0.0)
        )
        return (
            tqdf.select(
                F.col(id_col), F.round(dist, 4).alias("dist")
            )
            .orderBy(F.col("dist").asc(), F.col(id_col).asc())
            .limit(k)
        )
    out = "cos_sim" if similarity == "cosine" else "dot"
    return (
        tqdf.select(F.col(id_col), F.round(sim, 4).alias(out))
        .orderBy(F.col(out).desc(), F.col(id_col).asc())
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 1234) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def lsh_signature_udf(dim: int, n_planes: int = 16, seed: int = 1234):
    planes = _hyperplanes(dim, n_planes, seed)

    @pandas_udf(IntegerType())
    def sig(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.values).astype(np.float64)
        bits = (mat @ planes.T) > 0
        out = np.zeros(len(mat), dtype=np.int64)
        for b in range(n_planes):
            out |= bits[:, b].astype(np.int64) << b
        return pd.Series(out.astype(np.int32))

    return sig


def query_signature(query: list[float], n_planes: int, seed: int = 1234) -> int:
    planes = _hyperplanes(len(query), n_planes, seed)
    proj = planes @ np.asarray(query, dtype=np.float64)
    sig = 0
    for b in range(n_planes):
        if proj[b] > 0:
            sig |= 1 << b
    return sig


def probe_signatures(qsig: int, n_planes: int, probe_hamming: int) -> list[int]:
    """All signatures within ``probe_hamming`` bits of ``qsig``."""
    probes = {qsig}
    if probe_hamming >= 1:
        probes |= {qsig ^ (1 << b) for b in range(n_planes)}
    if probe_hamming >= 2:
        probes |= {
            qsig ^ (1 << b1) ^ (1 << b2)
            for b1 in range(n_planes)
            for b2 in range(b1 + 1, n_planes)
        }
    return sorted(probes)


def lsh_ann_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    probe_hamming: int = 1,
    seed: int = 1234,
) -> DataFrame:
    """Approximate top-k over an UN-indexed DataFrame: computes the
    signature of every vector at query time, then re-ranks the probed
    buckets. Correct but full-scan — use :class:`AnnIndex` for the
    scale path where the signature is a write-time partition key and
    the scan prunes to the probed partitions."""
    dim = len(query)
    qsig = query_signature(query, n_planes, seed)
    probes = probe_signatures(qsig, n_planes, probe_hamming)
    sig_udf = lsh_signature_udf(dim, n_planes, seed)
    cand = df.withColumn("_sig", sig_udf(F.col(vec_col))).filter(
        F.col("_sig").isin([int(s) for s in probes])
    )
    return cosine_topk(cand, query, k, id_col, vec_col)


class AnnIndex:
    """Signature-partitioned ANN index (the scale path).

    Build: every vector's random-hyperplane signature becomes a
    write-time PARTITION KEY (``sig=<int>`` parquet dirs) — the Spark
    analog of the reference's IVF cell assignment
    (`vector_similarity.rs:43-68`, `clustering.rs` k-medoid cells;
    hyperplane buckets replace k-medoids so assignment is stateless
    and oracle-reproducible).

    Query: the probed bucket ids (query signature ± ``probe_hamming``
    bits — the nprobe analog) form a partition-pruning filter, so the
    scan reads ONLY the probed ``sig=`` directories — at 100 TB this
    touches probes/2^n_planes of the data instead of all of it —
    followed by an exact cosine re-rank inside the probed buckets.
    """

    def __init__(self, path: str, meta: dict):
        self.path = path
        self.meta = meta

    @classmethod
    def build(
        cls,
        spark,
        df: DataFrame,
        path: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        n_planes: int = 8,
        seed: int = 1234,
        dim: int | None = None,
    ) -> "AnnIndex":
        import json
        import os

        if dim is None:
            dim = len(df.select(vec_col).first()[0])
        sig_udf = lsh_signature_udf(dim, n_planes, seed)
        (
            df.select(
                F.col(id_col).alias("vec_id"),
                F.col(vec_col).alias("embedding"),
                sig_udf(F.col(vec_col)).alias("sig"),
            )
            .repartition("sig")
            .write.mode("overwrite")
            .partitionBy("sig")
            .parquet(os.path.join(path, "vectors"))
        )
        meta = {
            "version": 1,
            "dim": int(dim),
            "n_planes": int(n_planes),
            "seed": int(seed),
        }
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
        return cls(path, meta)

    @classmethod
    def open(cls, path: str) -> "AnnIndex":
        import json
        import os

        with open(os.path.join(path, "meta.json")) as f:
            return cls(path, json.load(f))

    def vectors(self, spark) -> DataFrame:
        import os

        return spark.read.parquet(os.path.join(self.path, "vectors"))

    def search(
        self,
        spark,
        query: list[float],
        k: int = 10,
        probe_hamming: int = 1,
    ) -> DataFrame:
        n_planes = int(self.meta["n_planes"])
        qsig = query_signature(query, n_planes, int(self.meta["seed"]))
        probes = probe_signatures(qsig, n_planes, probe_hamming)
        cand = self.vectors(spark).filter(
            F.col("sig").isin([int(s) for s in probes])
        )
        return cosine_topk(cand, query, k, "vec_id", "embedding")


def _normalize_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def kmedoids_cosine(
    sample: np.ndarray, k: int, n_iter: int = 12
) -> np.ndarray:
    """Deterministic k-medoids over a sample, cosine distance — the
    reference's IVF training step (`clustering.rs` k-medoid cells).

    Init = greedy max-min (farthest-point) from row 0; update = the
    cluster member maximizing total within-cluster cosine (equivalent
    to PAM's min-total-distance under unit norm), argmax ties broken
    by lowest index. No RNG anywhere — medoids are a pure function of
    the sample, so tests and oracles can re-derive them."""
    X = _normalize_rows(np.asarray(sample, dtype=np.float64))
    n = len(X)
    k = min(k, n)
    medoid_idx = [0]
    dmin = 1.0 - X @ X[0]
    for _ in range(1, k):
        nxt = int(np.argmax(dmin))
        medoid_idx.append(nxt)
        dmin = np.minimum(dmin, 1.0 - X @ X[nxt])
    medoids = X[medoid_idx]
    for _ in range(n_iter):
        assign = np.argmax(X @ medoids.T, axis=1)
        new = medoids.copy()
        for c in range(k):
            members = X[assign == c]
            if len(members) == 0:
                continue
            centroid = members.mean(axis=0)
            best = int(np.argmax(members @ centroid))
            new[c] = members[best]
        if np.allclose(new, medoids):
            break
        medoids = new
    return medoids


class IvfIndex:
    """k-medoid IVF index — the reference's actual ANN scheme
    (`vector_similarity.rs:43-68` nprobe search over `clustering.rs`
    k-medoid cells), Spark-first:

    * **train**: a deterministic driver-side sample (first N rows by
      id — vocabulary-sized, not corpus-sized) trains k-medoids under
      cosine distance (:func:`kmedoids_cosine`, no RNG).
    * **assign**: every vector's nearest-medoid cell id becomes a
      write-time PARTITION KEY (``cid=`` parquet dirs) via one
      Arrow-vectorized matmul UDF.
    * **query**: rank cells by medoid similarity driver-side, scan
      ONLY the top ``n_probe`` ``cid=`` partitions, exact cosine
      re-rank inside them — at 100 TB the scan touches
      ~n_probe/n_cells of the data, and skew is bounded by cell
      granularity rather than a hot hash bucket.
    """

    def __init__(self, path: str, meta: dict, medoids: np.ndarray):
        self.path = path
        self.meta = meta
        self.medoids = medoids

    @classmethod
    def build(
        cls,
        spark,
        df: DataFrame,
        path: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        n_cells: int = 16,
        sample_size: int = 2048,
        n_iter: int = 12,
    ) -> "IvfIndex":
        import json
        import os

        sample_rows = (
            df.select(id_col, vec_col)
            .orderBy(F.col(id_col).asc())
            .limit(sample_size)
            .collect()
        )
        sample = np.asarray([list(r[1]) for r in sample_rows], dtype=np.float64)
        medoids = kmedoids_cosine(sample, n_cells, n_iter)
        med = medoids  # closure copy shipped with the task

        @pandas_udf(IntegerType())
        def cell(vecs: pd.Series) -> pd.Series:
            mat = _normalize_rows(np.stack(vecs.values).astype(np.float64))
            return pd.Series(np.argmax(mat @ med.T, axis=1).astype(np.int32))

        (
            df.select(
                F.col(id_col).alias("vec_id"),
                F.col(vec_col).alias("embedding"),
                cell(F.col(vec_col)).alias("cid"),
            )
            .repartition("cid")
            .write.mode("overwrite")
            .partitionBy("cid")
            .parquet(os.path.join(path, "vectors"))
        )
        meta = {
            "version": 1,
            "n_cells": int(len(medoids)),
            "dim": int(medoids.shape[1]),
            "sample_size": int(sample_size),
        }
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
        np.save(os.path.join(path, "medoids.npy"), medoids)
        return cls(path, meta, medoids)

    @classmethod
    def open(cls, path: str) -> "IvfIndex":
        import json
        import os

        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        medoids = np.load(os.path.join(path, "medoids.npy"))
        return cls(path, meta, medoids)

    def vectors(self, spark) -> DataFrame:
        import os

        return spark.read.parquet(os.path.join(self.path, "vectors"))

    def search(
        self, spark, query: list[float], k: int = 10, n_probe: int = 4
    ) -> DataFrame:
        q = np.asarray(query, dtype=np.float64)
        qn = np.linalg.norm(q)
        q = q / qn if qn else q
        sims = self.medoids @ q
        probes = [int(c) for c in np.argsort(-sims)[:n_probe]]
        cand = self.vectors(spark).filter(F.col("cid").isin(probes))
        return cosine_topk(cand, query, k, "vec_id", "embedding")

    def append(
        self,
        spark,
        df: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        """Assign new vectors to the FROZEN cells and append them into
        the ``cid=`` partitions (an IVF list insert — the reference
        adds vectors to existing clusters the same way; no retraining
        per batch). Appended batches count toward ``appended_since_
        train`` in meta so callers can trigger :meth:`refresh` once
        drift accumulates (e.g. appended > 0.5 × trained-over count);
        recall on appended data degrades only as the corpus
        distribution moves away from the trained medoids, never
        because a vector is missing — assignment is exact
        nearest-medoid, so every appended vector is findable at the
        same n_probe guarantees as built ones."""
        import json
        import os

        med = self.medoids

        @pandas_udf(IntegerType())
        def cell(vecs: pd.Series) -> pd.Series:
            mat = _normalize_rows(np.stack(vecs.values).astype(np.float64))
            return pd.Series(np.argmax(mat @ med.T, axis=1).astype(np.int32))

        # persist so the count and the write see the SAME rows (and
        # the plan isn't evaluated twice) even for nondeterministic
        # inputs
        assigned = df.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            cell(F.col(vec_col)).alias("cid"),
        ).persist()
        try:
            n = assigned.count()
            (
                assigned.repartition("cid")
                .write.mode("append")
                .partitionBy("cid")
                .parquet(os.path.join(self.path, "vectors"))
            )
        finally:
            assigned.unpersist()
        self.meta["appended_since_train"] = int(
            self.meta.get("appended_since_train", 0)
        ) + int(n)
        with open(os.path.join(self.path, "meta.json"), "w") as f:
            json.dump(self.meta, f)

    def refresh(self, spark, n_iter: int = 12) -> "IvfIndex":
        """Retrain the medoids from a deterministic UNBIASED sample of
        the CURRENT stored vectors (base + appends) and reassign every
        vector — the IVF re-clustering pass that restores cell balance
        after the corpus distribution drifts. The sample orders by
        xxhash64(vec_id): deterministic (no RNG) yet id-uniform, so
        appended vectors — the drifted data refresh exists to adapt
        to — are sampled proportionally (an orderBy(vec_id) sample
        would contain only the oldest base vectors). One scan + one
        partitioned rewrite; the rmtree+rename swap is NOT crash-
        atomic on a local FS (same caveat as index compaction — a
        table-format deployment would commit a new snapshot instead).
        Resets ``appended_since_train``."""
        import json
        import os
        import shutil

        sample_rows = (
            self.vectors(spark)
            .select("vec_id", "embedding")
            .orderBy(F.xxhash64("vec_id").asc(), F.col("vec_id").asc())
            .limit(int(self.meta.get("sample_size", 2048)))
            .collect()
        )
        sample = np.asarray(
            [list(r[1]) for r in sample_rows], dtype=np.float64
        )
        medoids = kmedoids_cosine(
            sample, int(self.meta["n_cells"]), n_iter
        )
        med = medoids

        @pandas_udf(IntegerType())
        def cell(vecs: pd.Series) -> pd.Series:
            mat = _normalize_rows(np.stack(vecs.values).astype(np.float64))
            return pd.Series(np.argmax(mat @ med.T, axis=1).astype(np.int32))

        vec_dir = os.path.join(self.path, "vectors")
        tmp = vec_dir + ".retrain"
        shutil.rmtree(tmp, ignore_errors=True)
        (
            self.vectors(spark)
            .select(
                "vec_id", "embedding", cell(F.col("embedding")).alias("cid")
            )
            .repartition("cid")
            .write.mode("overwrite")
            .partitionBy("cid")
            .parquet(tmp)
        )
        shutil.rmtree(vec_dir)
        os.rename(tmp, vec_dir)
        self.medoids = medoids
        self.meta["appended_since_train"] = 0
        np.save(os.path.join(self.path, "medoids.npy"), medoids)
        with open(os.path.join(self.path, "meta.json"), "w") as f:
            json.dump(self.meta, f)
        return self


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate pairs (training-data dedup over an
# embedding column): exact all-pairs twin + hyperplane-LSH scale path.
# ---------------------------------------------------------------------------


def _cosine_pair_col(a_col, b_col):
    """Exact float64 cosine between two array<float> columns — JVM
    column expressions only (element order = accumulation order on
    both sides of the oracle)."""
    ad = F.transform(a_col, lambda x: x.cast("double"))
    bd = F.transform(b_col, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y),
        F.lit(0.0),
        lambda s, v: s + v,
    )
    na = F.sqrt(F.aggregate(ad, F.lit(0.0), lambda s, v: s + v * v))
    nb = F.sqrt(F.aggregate(bd, F.lit(0.0), lambda s, v: s + v * v))
    return dot / (na * nb)


def cosine_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """EXACT near-dup pairs (id_a < id_b, cosine ≥ threshold) →
    DataFrame(id_a, id_b, cosine). All-pairs — the verification twin
    and the small-corpus path; at scale use
    :func:`cosine_near_dup_lsh`, whose candidates this filter also
    finishes."""
    a = emb.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va")
    )
    b = emb.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb")
    )
    out = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = _cosine_pair_col(F.col("_va"), F.col("_vb"))
    return (
        out.select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= float(threshold))
    )


def band_signature_udf(
    dim: int, bands: int, rows_per_band: int, seed: int = 1234
):
    """Per-band hyperplane bucket ids (array<long>, one per band) —
    the random-projection analog of MinHash banding: two vectors
    collide in a band iff all its ``rows_per_band`` sign bits agree
    (P ≈ (1 − θ/π)^r per band)."""
    planes = _hyperplanes(dim, bands * rows_per_band, seed)
    weights = (1 << np.arange(rows_per_band, dtype=np.int64))

    @pandas_udf(ArrayType(LongType()))
    def sig(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.values).astype(np.float64)
        bits = (mat @ planes.T) > 0  # (n, bands*r)
        per_band = bits.reshape(len(mat), bands, rows_per_band)
        codes = (per_band * weights[None, None, :]).sum(axis=2)
        return pd.Series([row.tolist() for row in codes.astype(np.int64)])

    return sig


def cosine_near_dup_lsh(
    emb: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    bands: int = 8,
    rows_per_band: int = 4,
    seed: int = 1234,
) -> DataFrame:
    """Near-dup pairs at scale: banded hyperplane-LSH candidates →
    exact cosine verification → DataFrame(id_a, id_b, cosine).

    No all-pairs stage anywhere: vectors explode into ``bands``
    (band, bucket) keys, candidates are the within-bucket joins
    (bounded skew — the shuffle key is the band bucket), then the
    exact float64 cosine keeps only true near-dups. High-threshold
    recall comes from band count: P(candidate) = 1−(1−p^r)^b with
    p = 1−θ/π."""
    sig_udf = band_signature_udf(dim, bands, rows_per_band, seed)
    sigs = emb.select(
        F.col(id_col).alias("docid"),
        sig_udf(F.col(vec_col)).alias("sig"),
    )
    banded = sigs.select(
        "docid", F.posexplode("sig").alias("band", "bucket")
    )
    a = banded.select(F.col("docid").alias("id_a"), "band", "bucket")
    b = banded.select(F.col("docid").alias("id_b"), "band", "bucket")
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    cos = _cosine_pair_col(F.col("_va"), F.col("_vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= float(threshold))
    )
