"""Model2Vec-style static-token embedding inference.

The reference embeds text with model2vec "potion" StaticModels
(`/root/reference/seekstorm/src/index.rs:2066-2203` loads the model,
`vector.rs:502-508` calls ``model.encode(&chunks)``). Model2Vec
inference is public and deliberately simple: tokenize into subword
pieces, gather each piece's STATIC embedding row, mean-pool over the
piece sequence, and (for potion models) L2-normalize so dot product
equals cosine. No transformer runs at inference time — which is why
it fits an Arrow-batched Spark UDF naturally.

This module implements that inference stack without any model
library:

* :class:`StaticEmbedder` — loads a model directory holding a vocab
  (one piece per line, WordPiece ``##`` continuations), an embedding
  matrix (``embeddings.npy``, or ``model.safetensors`` parsed with
  pure numpy — the 8-byte-header + JSON + raw-tensor layout is a
  public format), and ``embedder_meta.json``.
* greedy longest-match WordPiece tokenization (the published
  algorithm) over ``[a-z0-9]+`` word runs of the lowercased text; a
  word whose remainder can't be matched is skipped whole.
* :func:`embed_texts` — the Spark surface: one Arrow-batched pandas
  UDF per executor with the model cached per (path, mtime).
* :func:`build_static_model` — deterministic fixture writer (md5-seeded
  uniform components), the same build-then-exercise strategy as
  ``sources/pdf.build_pdf``; its generation rule is mirrored verbatim
  in the driver row's DuckDB oracle.

Scale shape: the model directory is small (static vectors) and loads
once per executor from shared storage; embedding is a stateless map —
no shuffle, no driver data.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

_WORD_RE = re.compile(r"[a-z0-9]+")

META_NAME = "embedder_meta.json"


# ---------------------------------------------------------------------------
# model directory


def _read_safetensors(path: str) -> dict[str, np.ndarray]:
    """Pure-numpy safetensors reader (public format: u64-LE header
    length, JSON header with dtype/shape/data_offsets, raw buffer)."""
    dtypes = {
        "F32": np.float32,
        "F64": np.float64,
        "F16": np.float16,
        "I8": np.int8,
        "I32": np.int32,
        "I64": np.int64,
    }
    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen))
        buf = f.read()
    out = {}
    for name, spec in header.items():
        if name == "__metadata__":
            continue
        lo, hi = spec["data_offsets"]
        arr = np.frombuffer(buf[lo:hi], dtype=dtypes[spec["dtype"]])
        out[name] = arr.reshape(spec["shape"])
    return out


def build_static_model(
    path: str,
    tokens: list[str],
    dim: int = 8,
    normalize: bool = True,
) -> str:
    """Write a deterministic static-embedding model directory: token
    ``t``'s component ``j`` is ``u*2-1`` with
    ``u = int(md5(f"{t}|{j}")[:8], 16) / 2**32`` — a formula DuckDB
    reproduces exactly (``('0x'||substr(md5(...),1,8))::UBIGINT``),
    so oracles can mirror the whole inference in SQL. Identical input
    → identical bytes."""
    os.makedirs(path, exist_ok=True)
    mat = np.empty((len(tokens), dim), dtype=np.float64)
    for i, t in enumerate(tokens):
        for j in range(dim):
            h = hashlib.md5(f"{t}|{j}".encode()).hexdigest()[:8]
            mat[i, j] = int(h, 16) / 2**32 * 2.0 - 1.0
    np.save(os.path.join(path, "embeddings.npy"), mat.astype(np.float32))
    with open(os.path.join(path, "vocab.txt"), "w") as f:
        f.write("\n".join(tokens) + "\n")
    with open(os.path.join(path, META_NAME), "w") as f:
        json.dump({"dim": dim, "normalize": normalize}, f)
    return path


class StaticEmbedder:
    """Static-token-embedding model (Model2Vec inference semantics):
    ``encode`` = WordPiece tokenize → gather rows → mean-pool →
    optional L2-normalize. Texts with no known pieces embed to the
    zero vector (callers drop or keep them explicitly)."""

    def __init__(self, path: str):
        with open(os.path.join(path, META_NAME)) as f:
            meta = json.load(f)
        self.normalize = bool(meta.get("normalize", True))
        st = os.path.join(path, "model.safetensors")
        if os.path.exists(st):
            tensors = _read_safetensors(st)
            self.matrix = np.asarray(
                tensors["embeddings"], dtype=np.float64
            )
        else:
            self.matrix = np.load(
                os.path.join(path, "embeddings.npy")
            ).astype(np.float64)
        with open(os.path.join(path, "vocab.txt")) as f:
            vocab = [line.rstrip("\n") for line in f if line.rstrip("\n")]
        if len(vocab) != self.matrix.shape[0]:
            raise ValueError(
                f"vocab has {len(vocab)} tokens but the matrix has "
                f"{self.matrix.shape[0]} rows"
            )
        self.vocab = {t: i for i, t in enumerate(vocab)}
        self.dim = int(self.matrix.shape[1])
        # longest piece bounds the greedy scan
        self._max_piece = max((len(t) for t in vocab), default=1)

    def wordpiece(self, word: str) -> list[int] | None:
        """Greedy longest-match WordPiece: first piece plain, later
        pieces carry the ``##`` continuation prefix; None when the
        word can't be fully segmented (it is then skipped whole)."""
        ids: list[int] = []
        pos = 0
        n = len(word)
        while pos < n:
            prefix = "" if pos == 0 else "##"
            end = min(n, pos + self._max_piece)
            while end > pos:
                piece = prefix + word[pos:end]
                idx = self.vocab.get(piece)
                if idx is not None:
                    ids.append(idx)
                    pos = end
                    break
                end -= 1
            else:
                return None
        return ids

    def token_ids(self, text: str) -> list[int]:
        ids: list[int] = []
        for word in _WORD_RE.findall((text or "").lower()):
            piece_ids = self.wordpiece(word)
            if piece_ids is not None:
                ids.extend(piece_ids)
        return ids

    def encode(self, texts: list[str]) -> np.ndarray:
        """float32 [N, dim]; mean over piece OCCURRENCES in sequence
        order (model2vec mean pooling), zero vector when no piece
        matches."""
        out = np.zeros((len(texts), self.dim), dtype=np.float64)
        for i, text in enumerate(texts):
            ids = self.token_ids(text)
            if not ids:
                continue
            v = self.matrix[ids].mean(axis=0)
            if self.normalize:
                norm = float(np.linalg.norm(v))
                if norm > 0:
                    v = v / norm
            out[i] = v
        return out.astype(np.float32)


# ---------------------------------------------------------------------------
# Spark surface

_MODEL_CACHE: dict[tuple[str, float], StaticEmbedder] = {}


def _model_mtime(path: str) -> float:
    """Max mtime across ALL files in the model dir (same pattern as
    engine._dir_mtime): replacing embeddings.npy / vocab.txt /
    model.safetensors in place without touching the meta file must
    still invalidate warm-executor caches."""
    mt = os.path.getmtime(path)
    for name in os.listdir(path):
        try:
            mt = max(mt, os.path.getmtime(os.path.join(path, name)))
        except OSError:
            continue
    return mt


def _load_cached(path: str) -> StaticEmbedder:
    key = (path, _model_mtime(path))
    model = _MODEL_CACHE.get(key)
    if model is None:
        model = StaticEmbedder(path)
        _MODEL_CACHE.clear()  # one model per executor is the norm
        _MODEL_CACHE[key] = model
    return model


def model_embed_udf(model_path: str):
    """A text→vector pandas UDF backed by the static model at
    ``model_path`` — pluggable into ``chunking.embed_chunks``."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ArrayType(FloatType()))
    def _embed(texts: pd.Series) -> pd.Series:
        model = _load_cached(model_path)
        vecs = model.encode(texts.fillna("").tolist())
        return pd.Series(list(map(list, vecs)))

    return _embed


def embed_texts(
    docs: DataFrame,
    model_path: str,
    text_col: str = "text",
    out_col: str = "embedding",
) -> DataFrame:
    """Attach a static-model embedding per row (Arrow-batched; model
    loaded once per executor)."""
    return docs.withColumn(out_col, model_embed_udf(model_path)(F.col(text_col)))
