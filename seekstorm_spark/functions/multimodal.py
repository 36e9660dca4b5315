"""Multimodal (image/audio/video) column plumbing.

Binary payloads are opaque `binary` columns with typed metadata; all
heavy per-item work runs in Arrow-batched `mapInPandas` so it
parallelizes and pipelines like any other stage. Formats with PUBLIC
byte layouts are parsed for real without codec libraries: PNG/GIF
headers and JPEG SOF frame dimensions (`decode_image_meta`), and PCM
RIFF/WAVE sample frames (`decode_audio_frames`). Pixel decoding and
compressed-audio codecs need libraries this container lacks —
`extract_features` therefore emits a deterministic content-digest
pseudo-embedding; the Spark plumbing (schemas, batch shapes,
partitioning) is identical to what a real model call would use.
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


def _jpeg_dims(data: bytes) -> tuple[int, int]:
    """Walk JPEG marker segments to the SOF frame header (public
    JPEG/JFIF layout): markers are 0xFF <code> <u16 length>; SOF0-SOF15
    (except DHT 0xC4, JPG 0xC8, DAC 0xCC) carry precision(1) height(2)
    width(2). No pixel decoding needed."""
    i = 2
    n = len(data)
    while i + 3 < n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:  # standalone
            i += 2
            continue
        if i + 4 > n:
            break
        seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 <= n:
                h = int.from_bytes(data[i + 5 : i + 7], "big")
                w = int.from_bytes(data[i + 7 : i + 9], "big")
                return w, h
            break
        i += 2 + seg_len
    return -1, -1


def _sniff(data: bytes) -> tuple[str, int, int]:
    """Header-level metadata for PNG/JPEG/GIF; others 'unknown'."""
    if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24:
        w = int.from_bytes(data[16:20], "big")
        h = int.from_bytes(data[20:24], "big")
        return "png", w, h
    if data[:2] == b"\xff\xd8":
        w, h = _jpeg_dims(data)
        return "jpeg", w, h
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


AUDIO_FRAME_SCHEMA = (
    "url string, sample_rate int, channels int, n_samples long, "
    "frame_idx int, frame array<float>"
)


def _parse_wav(data: bytes) -> tuple[int, int, int, np.ndarray] | None:
    """Parse a PCM RIFF/WAVE payload (public format, no codec lib):
    returns (sample_rate, channels, bits, samples[float32 -1..1]) or
    None for non-WAV/compressed audio."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    i = 12
    fmt = None
    samples = None
    while i + 8 <= len(data):
        cid = data[i : i + 4]
        clen = int.from_bytes(data[i + 4 : i + 8], "little")
        body = data[i + 8 : i + 8 + clen]
        if cid == b"fmt " and len(body) >= 16:
            audio_fmt = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if audio_fmt != 1:  # compressed — needs a codec library
                return None
            fmt = (rate, channels, bits)
        elif cid == b"data":
            samples = body
        i += 8 + clen + (clen & 1)
    if fmt is None or samples is None:
        return None
    rate, channels, bits = fmt
    if bits == 16:
        arr = np.frombuffer(samples, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 8:
        arr = (
            np.frombuffer(samples, dtype=np.uint8).astype(np.float32) - 128.0
        ) / 128.0
    else:
        return None
    return rate, channels, bits, arr


def decode_audio_frames(
    df: DataFrame,
    url_col: str = "url",
    bin_col: str = "audio",
    frame_samples: int = 1024,
    max_frames: int = 16,
) -> DataFrame:
    """PCM WAV payloads → fixed-size sample frames (real parse of the
    public RIFF/WAVE layout — no codec library needed for
    uncompressed audio; compressed codecs yield zero rows and would
    slot a decoder call into `_parse_wav`)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, rates, chans, nsamps, idxs, frames = [], [], [], [], [], []
            for url, data in zip(pdf[url_col].values, pdf[bin_col].values):
                parsed = _parse_wav(bytes(data or b""))
                if parsed is None:
                    continue
                rate, channels, _bits, arr = parsed
                mono = (
                    arr.reshape(-1, channels).mean(axis=1)
                    if channels > 1
                    else arr
                )
                for fi in range(
                    min(max_frames, (len(mono) + frame_samples - 1) // frame_samples)
                ):
                    chunk = mono[fi * frame_samples : (fi + 1) * frame_samples]
                    urls.append(url)
                    rates.append(rate)
                    chans.append(channels)
                    nsamps.append(len(mono))
                    idxs.append(fi)
                    frames.append([float(x) for x in chunk])
            yield pd.DataFrame(
                {
                    "url": urls,
                    "sample_rate": pd.Series(rates, dtype="int32"),
                    "channels": pd.Series(chans, dtype="int32"),
                    "n_samples": pd.Series(nsamps, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    # object dtype: an empty batch must not degrade to
                    # float64, which Arrow can't cast to list<float>
                    "frame": pd.Series(frames, dtype="object"),
                }
            )

    return df.select(url_col, bin_col).mapInPandas(
        run, schema=AUDIO_FRAME_SCHEMA
    )
