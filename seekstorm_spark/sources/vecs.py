"""fvecs / ivecs / bvecs vector-file readers (TEXMEX layout).

The public ANN benchmark corpora (SIFT1M/1B, GIST) ship vectors as
``.fvecs``/``.ivecs``/``.bvecs``: each record is a 4-byte
little-endian int32 dimension ``d`` followed by ``d`` components
(float32 / int32 / uint8). The reference ingests these for its vector
index; here they land as a DataFrame ``(path, idx, vec)`` ready for
:mod:`~seekstorm_spark.functions.simsearch`.

Scale shape: corpora ship as MANY shard files; ``binaryFile`` rows
(one per file) fan out across executors and a Pandas kernel parses
each file's bytes vectorized (uniform-dimension fast path = one
``frombuffer`` + reshape, no per-record Python loop). ``idx`` is the
record's position within its file — join with a file-order offset
table (or ``assign_docids``) for global contiguous ids. A single
monolithic file parallelizes poorly by construction (one row); split
it upstream, exactly as HDFS-era tooling does.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_ITEM = {"f": np.dtype("<f4"), "i": np.dtype("<i4"), "b": np.dtype("<u1")}


def _parse_vecs(content: bytes, kind: str) -> list[np.ndarray]:
    """Decode one file's records → list of component arrays."""
    item = _ITEM[kind]
    raw = memoryview(content)
    n_bytes = len(raw)
    if n_bytes == 0:
        return []
    d0 = int(np.frombuffer(raw[:4], "<i4")[0])
    if d0 <= 0:
        raise ValueError(f"corrupt vecs header: d={d0}")
    rec = 4 + d0 * item.itemsize
    if n_bytes % rec == 0:
        # uniform-dimension fast path: one byte-level reshape, one
        # header check, one typed view — no per-record Python loop
        flat = np.frombuffer(raw, np.dtype("<u1")).reshape(-1, rec)
        dims = np.ascontiguousarray(flat[:, :4]).view("<i4").ravel()
        if bool((dims == d0).all()):
            body = np.ascontiguousarray(flat[:, 4:])
            return list(body.view(item).reshape(-1, d0))
    # ragged fallback: walk record headers
    out: list[np.ndarray] = []
    off = 0
    while off < n_bytes:
        d = int(np.frombuffer(raw[off : off + 4], "<i4")[0])
        if d <= 0 or off + 4 + d * item.itemsize > n_bytes:
            raise ValueError(f"corrupt vecs record at byte {off}")
        out.append(
            np.frombuffer(
                raw[off + 4 : off + 4 + d * item.itemsize], item
            )
        )
        off += 4 + d * item.itemsize
    return out


def _read_vecs(spark: SparkSession, path: str, kind: str) -> DataFrame:
    comp_type = FloatType() if kind == "f" else IntegerType()
    schema = StructType(
        [
            StructField("path", StringType()),
            StructField("idx", LongType()),
            StructField("vec", ArrayType(comp_type)),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, r in pdf.iterrows():
                vecs = _parse_vecs(r["content"], kind)
                if kind == "f":
                    pyvecs = [v.astype(np.float32) for v in vecs]
                else:
                    pyvecs = [v.astype(np.int32) for v in vecs]
                yield pd.DataFrame(
                    {
                        "path": [r["path"]] * len(vecs),
                        "idx": pd.Series(
                            np.arange(len(vecs), dtype=np.int64)
                        ),
                        "vec": pd.Series(pyvecs, dtype="object"),
                    }
                )

    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )
    return files.mapInPandas(kernel, schema=schema)


def read_fvecs(spark: SparkSession, path: str) -> DataFrame:
    """``.fvecs`` (float32) → DataFrame(path, idx, vec array<float>)."""
    return _read_vecs(spark, path, "f")


def read_ivecs(spark: SparkSession, path: str) -> DataFrame:
    """``.ivecs`` (int32, e.g. ground-truth neighbor ids) →
    DataFrame(path, idx, vec array<int>)."""
    return _read_vecs(spark, path, "i")


def read_bvecs(spark: SparkSession, path: str) -> DataFrame:
    """``.bvecs`` (uint8, e.g. SIFT1B) → DataFrame(path, idx,
    vec array<int> with 0-255 components)."""
    return _read_vecs(spark, path, "b")


def write_vecs_file(
    vectors: list[np.ndarray] | np.ndarray, path: str, kind: str = "f"
) -> None:
    """Driver-side writer (test/interop helper, not a distributed
    sink): each record = int32 dim + components in the file order
    given."""
    item = _ITEM[kind]
    with open(path, "wb") as f:
        for v in vectors:
            a = np.asarray(v, dtype=item)
            f.write(np.int32(len(a)).tobytes())
            f.write(a.tobytes())
