"""Text analysis operators for large-scale training-data pipelines.

All hot-path expressions are built-in `pyspark.sql.functions` (JVM,
whole-stage codegen); Python appears only in the shared tokenizer UDF.

* token counting (whitespace + engine tokenizer)
* quality scoring (length / punctuation / stopword ratios)
* document fingerprinting (md5 of the normalized token stream —
  engine-side analog of content-defined fingerprints)
* language ID (marker-token n-gram heuristic, vectorized UDF)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# A tiny stopword-marker table per language for the heuristic
# classifier. At 100 TB you would swap in fastText/CLD3 via the same
# mapInPandas shape; the plumbing (schema, batching) is identical.
_LANG_MARKERS: dict[str, frozenset[str]] = {
    "en": frozenset("the of and to in is that it was for on are with as".split()),
    "de": frozenset("der die das und ist nicht ein eine zu mit von für".split()),
    "fr": frozenset("le la les et est ne pas un une pour dans que".split()),
    "es": frozenset("el la los las y es no un una para en que".split()),
}


def ws_token_count(text: Column) -> Column:
    """Whitespace token count, JVM-side (no UDF)."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


# GPT-2-style pre-tokenizer pattern, simplified to the Java-regex ∩
# RE2 common syntax (the published pattern's \s+(?!\S) lookahead is
# unsupported by RE2, so trailing-space attachment differs slightly
# from tiktoken): contractions | space?-letters | space?-digits |
# space?-punct-run | whitespace-run. Counting these matches tracks
# BPE token counts far better than whitespace splitting (a BPE
# tokenizer splits each of these pieces further, never across them).
BPE_TOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"
)


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: matches of :data:`BPE_TOKEN_PATTERN`
    minus pure-whitespace runs — one JVM ``regexp_extract_all``, no
    UDF. DuckDB twin: ``len(list_filter(regexp_extract_all(text,
    pat), t -> trim(t) <> ''))``."""
    pieces = F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), 0)
    return F.size(F.filter(pieces, lambda t: F.trim(t) != "")).cast("long")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds length / punctuation-ratio / stopword-ratio / mean-token-
    length features plus a composite quality score — all built-ins."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = ws_token_count(t)
    punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    stop_hits = F.size(
        F.filter(
            F.split(F.lower(t), r"\s+"),
            lambda x: x.isin(*sorted(_LANG_MARKERS["en"])),
        )
    )
    return (
        df.withColumn("n_chars_c", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn(
            "punct_ratio",
            F.round(punct / F.greatest(n_chars, F.lit(1)), 6),
        )
        .withColumn(
            "stopword_ratio",
            F.round(stop_hits / F.greatest(n_tokens, F.lit(1)), 6),
        )
        .withColumn(
            "mean_token_len",
            F.round(
                (n_chars - (n_tokens - F.lit(1)))
                / F.greatest(n_tokens, F.lit(1)),
                6,
            ),
        )
    )


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021,
    "Scaling Language Models", Table A1 — adapted to word-count
    fractions). All built-in higher-order functions, zero UDFs, zero
    shuffles: per-document bounded compute, so the operator scales
    with input bytes at any corpus size.

    * ``distinct_word_frac`` — |distinct words| / |words|; low values
      mean heavy word repetition.
    * ``top_word_frac`` — occurrences of the most frequent word /
      |words| (Gopher rejects > 0.2-class thresholds).
    * ``top_bigram_frac`` — same over adjacent word pairs.
    * ``dup_line_frac`` — 1 − |distinct lines| / |lines| (newline-
      separated); 0 for single-line documents.

    The per-doc cost of the top-*-frac terms is O(distinct × n)
    (transform over distinct values, filter count each) — bounded by
    document length, not corpus size, and entirely inside
    whole-stage codegen."""
    t = F.trim(F.col(text_col))
    words = F.filter(F.split(F.lower(t), r"\s+"), lambda x: x != "")
    n_words = F.size(words)
    distinct_words = F.array_distinct(words)
    top_word = F.array_max(
        F.transform(
            distinct_words,
            lambda w: F.size(F.filter(words, lambda x: x == w)),
        )
    )
    # adjacent pairs: words[i] + ' ' + words[i+1], i = 1..n-1 (1-based).
    # sequence(1, n-1) DESCENDS when n < 2, so short docs get an
    # explicit empty pair list.
    bigrams = F.when(
        n_words >= 2,
        F.transform(
            F.sequence(F.lit(1), n_words - 1),
            lambda i: F.concat(
                F.element_at(words, i),
                F.lit(" "),
                F.element_at(words, i + 1),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_bigrams = F.size(bigrams)
    top_bigram = F.array_max(
        F.transform(
            F.array_distinct(bigrams),
            lambda b: F.size(F.filter(bigrams, lambda x: x == b)),
        )
    )
    lines = F.filter(
        F.split(F.col(text_col), r"\n"), lambda x: F.trim(x) != ""
    )
    n_lines = F.size(lines)
    safe = F.greatest(n_words, F.lit(1))
    return (
        df.withColumn(
            "distinct_word_frac",
            F.round(F.size(distinct_words) / safe, 6),
        )
        .withColumn(
            "top_word_frac",
            F.round(F.coalesce(top_word, F.lit(0)) / safe, 6),
        )
        .withColumn(
            "top_bigram_frac",
            F.round(
                F.coalesce(top_bigram, F.lit(0))
                / F.greatest(n_bigrams, F.lit(1)),
                6,
            ),
        )
        .withColumn(
            "dup_line_frac",
            F.when(n_lines == 0, F.lit(0.0)).otherwise(
                F.round(
                    F.lit(1.0) - F.size(F.array_distinct(lines)) / n_lines,
                    6,
                )
            ),
        )
    )


def doc_fingerprint(text: Column) -> Column:
    """Deterministic content fingerprint: md5 over the lowercased,
    whitespace-normalized text. Identical in DuckDB:
    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))."""
    normalized = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    return F.md5(normalized)


@pandas_udf(StringType())
def lang_id_udf(texts: pd.Series) -> pd.Series:
    """Marker-token language heuristic (vectorized; ties → 'und')."""

    def classify(t: str) -> str:
        toks = set((t or "").lower().split())
        best_lang, best = "und", 0
        for lang, markers in _LANG_MARKERS.items():
            hits = len(toks & markers)
            if hits > best:
                best_lang, best = lang, hits
        return best_lang

    return texts.map(classify)


@pandas_udf(StringType())
def json_flatten_values(js: pd.Series) -> pd.Series:
    """Recursively extract STRING leaf values from a JSON document (in
    document order, field names and non-string scalars excluded) and
    join them with single spaces — the indexable text of a nested JSON
    doc (reference object_values_to_string_vec_recursive,
    index.rs:5312-5327)."""
    import json

    def flatten(v, out: list) -> None:
        if isinstance(v, str):
            out.append(v)
        elif isinstance(v, list):
            for x in v:
                flatten(x, out)
        elif isinstance(v, dict):
            for x in v.values():
                flatten(x, out)

    def run(s: str) -> str:
        try:
            v = json.loads(s) if s else None
        except (ValueError, TypeError):
            return ""
        out: list = []
        flatten(v, out)
        return " ".join(out)

    return js.map(run)
