"""Multimodal (image/audio/video) column plumbing.

Binary payloads are opaque `binary` columns with typed metadata; all
heavy per-item work runs in Arrow-batched `mapInPandas` so it
parallelizes and pipelines like any other stage. The actual codec
calls are STUBBED (no image/audio libraries in this container):
`decode_image_meta` parses only deterministic header bytes, and
`extract_features` emits a deterministic fake embedding — the Spark
plumbing (schemas, batch shapes, partitioning) is real and tested, so
swapping in PIL/librosa later is a one-function change.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

IMAGE_META_SCHEMA = "url string, format string, width int, height int, n_bytes long"
FEATURE_SCHEMA = "url string, feature array<float>"


def _sniff(data: bytes) -> tuple[str, int, int]:
    """Header-only metadata sniff for PNG/JPEG/GIF; others 'unknown'."""
    if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24:
        w = int.from_bytes(data[16:20], "big")
        h = int.from_bytes(data[20:24], "big")
        return "png", w, h
    if data[:2] == b"\xff\xd8":
        return "jpeg", -1, -1  # full scan needs a decoder — stubbed
    if data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
        return (
            "gif",
            int.from_bytes(data[6:8], "little"),
            int.from_bytes(data[8:10], "little"),
        )
    return "unknown", -1, -1


def decode_image_meta(
    df: DataFrame, url_col: str = "url", bin_col: str = "html"
) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, ws, hs, ns = [], [], [], []
            for data in pdf[bin_col].values:
                data = bytes(data or b"")
                fmt, w, h = _sniff(data)
                fmts.append(fmt)
                ws.append(w)
                hs.append(h)
                ns.append(len(data))
            yield pd.DataFrame(
                {
                    "url": pdf[url_col].values,
                    "format": fmts,
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "n_bytes": pd.Series(ns, dtype="int64"),
                }
            )

    return df.select(url_col, bin_col).mapInPandas(run, schema=IMAGE_META_SCHEMA)


def extract_features(
    df: DataFrame, url_col: str = "url", bin_col: str = "html", dim: int = 16
) -> DataFrame:
    """STUB feature extractor: deterministic pseudo-embedding from a
    content digest (real systems put the model call exactly here; the
    batch shape and output schema would not change)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for data in pdf[bin_col].values:
                digest = hashlib.sha256(bytes(data or b"")).digest()
                seed = int.from_bytes(digest[:8], "big") % (2**32)
                rng = np.random.default_rng(seed)
                v = rng.standard_normal(dim).astype(np.float32)
                feats.append((v / np.linalg.norm(v)).tolist())
            yield pd.DataFrame({"url": pdf[url_col].values, "feature": feats})

    return df.select(url_col, bin_col).mapInPandas(run, schema=FEATURE_SCHEMA)


def decode_audio_frames(*args, **kwargs):
    """Audio decode stub — no audio libs in this container."""
    raise NotImplementedError(
        "audio decoding requires an audio codec library; the mapInPandas "
        "plumbing pattern is identical to extract_features()"
    )
