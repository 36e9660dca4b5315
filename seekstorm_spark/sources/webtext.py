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
