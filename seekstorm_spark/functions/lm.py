"""Corpus bigram language model → per-doc negative log-likelihood.

The CCNet-style quality signal (Wenzek et al. 2020): score every page
by how "typical" its word sequences are under a language model, keep
the low-perplexity head/middle of the distribution. A full KenLM is a
model artifact this sandbox can't ship; a corpus-trained add-one
bigram model is the same *pipeline shape* (train counts → broadcast/
join → score) and is exactly oracle-checkable.

Plan shape, 100-TB notes:

* training = two hash aggregations over exploded bigrams (map-side
  combined); the model IS a DataFrame, so scoring is a join on token
  keys — broadcast when the vocabulary is small, shuffle join (AQE
  skew-handled; stopword bigrams are the hot keys) when not.
* per-doc reduction sorts each doc's float32 log-probs and folds them
  SEQUENTIALLY in float64 (`F.aggregate`), so the sum is order-
  deterministic and the DuckDB oracle (`list_sum` over `list_sort`)
  reproduces it bit-for-bit; ln routes through float64 then casts to
  float32, the same trick the BM25 idf path uses (engine.py).

Reference context: no LM surface in SeekStorm; beyond-reference
training-data op alongside `textstats.py` / `c4.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bigram_rows(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(docid, w1, w2) — one row per bigram occurrence, whitespace
    tokens, lowercased. Docs with < 2 tokens yield nothing."""
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda w: w != "",
    )
    k = F.size(toks) - 1
    idx = F.when(k > 0, F.sequence(F.lit(1), k)).otherwise(
        F.array().cast("array<int>")
    )
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(toks, i).alias("w1"),
            F.element_at(toks, i + 1).alias("w2"),
        ),
    )
    return df.select(
        F.col(id_col).alias("docid"), F.explode(pairs).alias("p")
    ).select("docid", "p.w1", "p.w2")


def bigram_nll(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(docid, n_bigrams, nll): mean −ln p(w2|w1) under the corpus
    add-one bigram model, p = (c(w1,w2)+1) / (c(w1·)+V).

    ``nll`` is rounded to 4 decimals; ``exp(nll)`` is the perplexity.
    Quality filtering keeps docs below a corpus-quantile threshold.
    """
    bg = bigram_rows(df, id_col, text_col)
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda w: w != "",
    )
    vocab = (
        df.select(F.explode(toks).alias("tok"))
        .agg(F.count_distinct("tok").alias("v"))
    )
    nlp = (
        -F.log((F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.col("v")))
    ).cast("float")
    scored = (
        bg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select("docid", nlp.alias("nlp"))
    )
    arr = F.array_sort(F.collect_list("nlp"))
    return (
        scored.groupBy("docid")
        .agg(arr.alias("arr"))
        .select(
            "docid",
            F.size("arr").cast("long").alias("n_bigrams"),
            F.round(
                F.aggregate(
                    "arr",
                    F.lit(0.0),
                    lambda acc, x: acc + x.cast("double"),
                )
                / F.size("arr"),
                4,
            ).alias("nll"),
        )
    )
