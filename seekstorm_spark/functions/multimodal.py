"""Multimodal (image/audio/video) column plumbing.

Binary payloads are opaque `binary` columns with typed metadata; all
heavy per-item work runs in Arrow-batched `mapInPandas` so it
parallelizes and pipelines like any other stage. Formats with PUBLIC
byte layouts are parsed for real without codec libraries: PNG/GIF
headers and JPEG SOF frame dimensions (`decode_image_meta`), PCM
RIFF/WAVE sample frames (`decode_audio_frames`), and full 8-bit PNG
PIXEL decoding via zlib + the public scanline-filter spec
(`decode_image_pixels`, with nearest-neighbor resize). Pillow is an
OPTIONAL import that extends pixel decode to JPEG/WebP/…; compressed
audio codecs would slot into `_parse_wav` the same way.
`extract_features` emits a deterministic content-digest
pseudo-embedding where a model call would go; the Spark plumbing
(schemas, batch shapes, partitioning) is identical either way.
"""

from __future__ import annotations

import hashlib
import struct
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


def _digest_vector(data: bytes, dim: int) -> list[float]:
    """Deterministic pseudo-embedding from a content digest — the
    documented IMAGE/AUDIO MODEL SLOT: no vision/audio encoder ships
    in this container, so non-text payloads get a stable unit vector;
    a real deployment swaps exactly this function for the model call
    (batch shape and output schema unchanged)."""
    digest = hashlib.sha256(data).digest()
    seed = int.from_bytes(digest[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim).astype(np.float32)
    return (v / np.linalg.norm(v)).tolist()


def extract_features(
    df: DataFrame,
    url_col: str = "url",
    bin_col: str = "html",
    dim: int = 16,
    model_path: str | None = None,
) -> DataFrame:
    """Feature extraction over an opaque binary column.

    With ``model_path`` (a :func:`seekstorm_spark.functions.embedder.
    build_static_model` directory), TEXT-BEARING payloads — bytes that
    strictly decode as UTF-8 — run through the REAL Model2Vec-style
    static embedder (executor-cached model, Arrow-batched; reference
    index.rs:2066-2203 StaticModel), and the output dimension is the
    model's. Payloads that do not decode (images, audio) fall back to
    :func:`_digest_vector` in the same dimension — the honest model
    slot for modalities whose encoders aren't in this container.

    Without ``model_path`` every payload takes the digest path at
    ``dim`` (the pre-round-5 stub behavior, kept for tests)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = None
        out_dim = dim
        if model_path is not None:
            from seekstorm_spark.functions.embedder import _load_cached

            model = _load_cached(model_path)
            out_dim = model.dim
        for pdf in batches:
            feats: list[list[float] | None] = [None] * len(pdf)
            texts: list[str] = []
            text_idx: list[int] = []
            for i, data in enumerate(pdf[bin_col].values):
                data = bytes(data or b"")
                text = None
                if model is not None:
                    try:
                        text = data.decode("utf-8")
                    except UnicodeDecodeError:
                        text = None
                if text is not None:
                    texts.append(text)
                    text_idx.append(i)
                else:
                    feats[i] = _digest_vector(data, out_dim)
            if texts:
                vecs = model.encode(texts)
                for i, v in zip(text_idx, vecs):
                    feats[i] = [float(x) for x in v]
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
            # 1 = integer PCM, 3 = IEEE float — both public layouts;
            # anything else is compressed and needs a codec library
            if audio_fmt not in (1, 3):
                return None
            fmt = (rate, channels, bits, audio_fmt)
        elif cid == b"data":
            samples = body
        i += 8 + clen + (clen & 1)
    if fmt is None or samples is None:
        return None
    rate, channels, bits, audio_fmt = fmt
    if audio_fmt == 3:
        if bits == 32:
            arr = np.frombuffer(samples, dtype="<f4")
        elif bits == 64:
            arr = np.frombuffer(samples, dtype="<f8").astype(np.float32)
        else:
            return None
    elif bits == 16:
        arr = np.frombuffer(samples, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 8:
        arr = (
            np.frombuffer(samples, dtype=np.uint8).astype(np.float32) - 128.0
        ) / 128.0
    elif bits == 24:
        # 3-byte little-endian signed: widen to i32 via a zero pad in
        # the LOW byte, then shift-divide (vectorized, no per-sample
        # loop)
        raw3 = np.frombuffer(samples[: len(samples) - len(samples) % 3],
                             dtype=np.uint8).reshape(-1, 3)
        padded = np.zeros((raw3.shape[0], 4), dtype=np.uint8)
        padded[:, 1:] = raw3
        arr = (
            padded.view("<i4").ravel().astype(np.float32)
            / float(1 << 31)
        )
    elif bits == 32:
        arr = (
            np.frombuffer(samples, dtype="<i4").astype(np.float32)
            / float(1 << 31)
        )
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


# ---------------------------------------------------------------------------
# Pixel decoding: pure-zlib PNG decoder (public spec, stdlib only) +
# optional Pillow fast path for every other format.
# ---------------------------------------------------------------------------

try:  # optional dependency — JPEG/WebP/… pixel decode when installed
    from PIL import Image as _PIL_Image  # type: ignore
except ImportError:  # container ships no imaging libs
    _PIL_Image = None

PIXEL_SCHEMA = (
    "url string, width int, height int, channels int, pixels binary"
)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_pixels(data: bytes) -> tuple[int, int, int, np.ndarray] | None:
    """Decode an 8-bit non-interlaced PNG (color types 0/2/3/4/6) to
    (width, height, channels, uint8 HxWxC array) with zlib + the
    public scanline-filter spec — no imaging library. Palette images
    expand through PLTE to RGB. Returns None for formats outside this
    class (16-bit, interlaced, non-PNG); the Pillow path covers those
    when available."""
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    i = 8
    idat = bytearray()
    plte = None
    w = h = bit_depth = color_type = interlace = None
    while i + 8 <= len(data):
        clen = int.from_bytes(data[i : i + 4], "big")
        ctype = data[i + 4 : i + 8]
        body = data[i + 8 : i + 8 + clen]
        if ctype == b"IHDR":
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
            bit_depth = body[8]
            color_type = body[9]
            interlace = body[12]
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        i += 12 + clen
    if w is None or bit_depth != 8 or interlace != 0:
        return None
    n_ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if n_ch is None:
        return None
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    stride = w * n_ch
    if len(raw) != h * (stride + 1):
        return None
    rows = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up — fully vectorized
            cur = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth — sequential in x
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - n_ch] if x >= n_ch else 0
                b = prev[x]
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    c = prev[x - n_ch] if x >= n_ch else 0
                    pred = _paeth(int(a), int(b), int(c))
                cur[x] = (line[x] + pred) & 0xFF
        else:
            return None
        out[y] = cur.astype(np.uint8)
    px = out.reshape(h, w, n_ch)
    if color_type == 3:
        if plte is None:
            return None
        px = plte[px[:, :, 0]]
        n_ch = 3
    return w, h, n_ch, px


def _decode_pixels(data: bytes) -> tuple[int, int, int, np.ndarray] | None:
    # A payload with a valid PNG magic but truncated/corrupt chunks
    # must not fail the whole Spark task — fall through to Pillow (or
    # drop the row) instead.
    try:
        got = _png_pixels(data)
    except (ValueError, IndexError, zlib.error, struct.error, OverflowError):
        got = None
    if got is not None:
        return got
    if _PIL_Image is not None:
        import io

        try:
            img = _PIL_Image.open(io.BytesIO(data))
            arr = np.asarray(img.convert("RGB"), dtype=np.uint8)
            return arr.shape[1], arr.shape[0], 3, arr
        except Exception:
            return None
    return None


def _resize_nearest(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    h, w = px.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return px[ys][:, xs]


def decode_image_pixels(
    df: DataFrame,
    url_col: str = "url",
    bin_col: str = "html",
    resize: tuple[int, int] | None = None,
) -> DataFrame:
    """Binary image column → (url, width, height, channels, pixels)
    with pixels as the raw H×W×C uint8 bytes (post-resize dims when
    ``resize=(w, h)`` — nearest-neighbor, vectorized). PNG decodes via
    the built-in pure-zlib path; every other format needs Pillow
    (optional import) and yields no row without it. width/height are
    the DECODED dimensions; rows for undecodable payloads are dropped
    (count them against :func:`decode_image_meta` to audit)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, ws, hs, cs, pxs = [], [], [], [], []
            for url, data in zip(pdf[url_col].values, pdf[bin_col].values):
                got = _decode_pixels(bytes(data or b""))
                if got is None:
                    continue
                w, h, n_ch, px = got
                if resize is not None:
                    px = _resize_nearest(px, resize[0], resize[1])
                    h, w = px.shape[0], px.shape[1]
                urls.append(url)
                ws.append(w)
                hs.append(h)
                cs.append(n_ch)
                pxs.append(px.tobytes())
            yield pd.DataFrame(
                {
                    "url": urls,
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "channels": pd.Series(cs, dtype="int32"),
                    "pixels": pd.Series(pxs, dtype="object"),
                }
            )

    return df.select(url_col, bin_col).mapInPandas(run, schema=PIXEL_SCHEMA)
