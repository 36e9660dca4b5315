"""Deterministic synthetic Common-Crawl-style corpus.

Generates the BASELINE input_hint table shape —
``(url string, warc_ts timestamp, html binary, text string,
lang string)`` — fully distributed (``spark.range`` → ``mapInPandas``,
no driver-side data) and fully deterministic (counter-based RNG seeded
per docid, so any subset of rows is reproducible independently of
partitioning). Zipf-ish token distribution over a fixed vocabulary
with ~5% casing/punctuation noise to exercise tokenizer parity
(FIXTURES.md §1).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

VOCAB_SIZE = 10_000
_NOISE_TOKENS = ["c++", "c#", "don't", "Mixed-Case", "42", "2026", "e-mail"]
_LANGS = ["de", "fr", "es"]

WEBTEXT_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def _zipf_weights(n: int, s: float = 1.07) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    return w / w.sum()


def synth_webtext(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    min_tokens: int = 20,
    max_tokens: int = 400,
    partitions: int | None = None,
) -> DataFrame:
    parts = partitions or max(spark.sparkContext.defaultParallelism, 4)
    weights = _zipf_weights(VOCAB_SIZE)
    cdf = np.cumsum(weights)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        epoch = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
        for pdf in batches:
            ids = pdf["id"].values
            urls, tss, htmls, texts, langs = [], [], [], [], []
            for i in ids:
                i = int(i)
                rng = np.random.default_rng(seed * 1_000_003 + i)
                n_tok = int(rng.integers(min_tokens, max_tokens + 1))
                # inverse-CDF Zipf sampling over the fixed vocabulary
                picks = np.searchsorted(cdf, rng.random(n_tok))
                toks = [f"term{p:05d}" for p in picks]
                noise_mask = rng.random(n_tok) < 0.05
                for j in np.flatnonzero(noise_mask):
                    r = rng.integers(0, len(_NOISE_TOKENS) + 1)
                    toks[j] = (
                        toks[j].capitalize()
                        if r == len(_NOISE_TOKENS)
                        else _NOISE_TOKENS[int(r)]
                    )
                text = " ".join(toks)
                title = f"doc {i}"
                urls.append(f"https://site{i % 97}.example/p/{i:010d}")
                tss.append(epoch + dt.timedelta(seconds=17 * i))
                htmls.append(
                    f"<html><head><title>{title}</title></head>"
                    f"<body><p>{text}</p></body></html>".encode()
                )
                texts.append(text)
                langs.append(
                    "en" if (i % 20) != 0 else _LANGS[(i // 20) % len(_LANGS)]
                )
            yield pd.DataFrame(
                {
                    "url": urls,
                    "warc_ts": tss,
                    "html": htmls,
                    "text": texts,
                    "lang": langs,
                }
            )

    return (
        spark.range(0, n_docs, numPartitions=parts)
        .mapInPandas(gen, schema=WEBTEXT_SCHEMA)
    )


# ---------------------------------------------------------------------------
# HTML → text extraction (the input-contract invariant: the extracted
# text per url is byte-identical to the corpus ``text`` column).
# ---------------------------------------------------------------------------

import html as _html
import re as _re

_COMMENT_RE = _re.compile(r"(?s)<!--.*?-->")
_SCRIPT_RE = _re.compile(r"(?is)<(script|style)\b.*?</\1\s*>")
_HEAD_RE = _re.compile(r"(?is)<head\b.*?</head\s*>")
_TAG_RE = _re.compile(r"(?s)<[^>]*>")


def html_to_text(raw) -> str:
    """Strip one HTML payload to its body text: comments, script and
    style blocks (with content), and the entire <head> drop; remaining
    tags are removed; entities decode; outer whitespace trims. The
    per-row invariant the pipeline is built on: for the corpus
    generator above, ``html_to_text(html) == text`` BYTE-IDENTICALLY
    (gated by pytest) — the Spark analog of the reference extracting
    its index text from the raw page."""
    if raw is None:
        return ""
    if isinstance(raw, (bytes, bytearray, memoryview)):
        s = bytes(raw).decode("utf-8", "replace")
    else:
        s = str(raw)
    s = _COMMENT_RE.sub("", s)
    s = _SCRIPT_RE.sub("", s)
    s = _HEAD_RE.sub("", s)
    s = _TAG_RE.sub("", s)
    return _html.unescape(s).strip()


def extract_text(
    df: DataFrame, html_col: str = "html", out_col: str = "extracted"
) -> DataFrame:
    """Add ``out_col`` = extracted text of the binary ``html_col`` —
    Arrow-batched (one Python call per batch, not per byte), the
    standard ingest step from a crawl table ``(url, warc_ts, html)``
    to the indexable text column."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def _extract(htmls: pd.Series) -> pd.Series:
        return htmls.map(html_to_text)

    return df.withColumn(out_col, _extract(df[html_col]))
