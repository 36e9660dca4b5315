"""Dictionary-based word segmentation for unspaced scripts (Chinese).

Implements the public "fast word segmentation of noisy text" dynamic
program (maximum product of word probabilities under a frequency
dictionary, naive-Bayes independence; W. Garbe's published algorithm —
the reference engine ports the same algorithm for its
UnicodeAlphanumericZH tokenizer, `word_segmentation.rs:95-190`).

The frequency dictionary is a deployment asset (the reference ships a
Chinese dictionary file); this module takes it as a plain
``{word: count}`` mapping, so index pipelines broadcast it into the
tokenize UDF (one `--py-files`/broadcast wiring step documented in
`segment_udf`). Unknown characters are penalized with the standard
``10 / (total * 10^len)`` unknown-word probability so noisy text still
segments instead of failing.
"""

from __future__ import annotations

import math


def segment(
    text: str,
    dictionary: dict[str, int],
    max_word_len: int = 8,
    total: int | None = None,
) -> list[str]:
    """Split ``text`` (no spaces) into the maximum-probability word
    sequence under the frequency dictionary.

    DP over end positions: best[i] = max over last words w ending at i
    of best[i - len(w)] + log P(w); O(n × max_word_len) like the
    reference's triangular-matrix formulation.
    """
    if not text:
        return []
    if total is None:
        total = max(sum(dictionary.values()), 1)
    # the reference's probability model (word_segmentation.rs:80-89):
    # n = 3 × Σcounts; P(word) = count / n; the unknown-word estimate
    # is 10·log10(10 / n / len^10) — drastically harsher than the
    # classic SymSpell 10/(N·10^len), so ANY known decomposition beats
    # an unknown span (round-5 fix: the earlier formula let length-8
    # unknowns outbid several mid-frequency words)
    n = 3.0 * total
    log_n = math.log10(n)

    def log_p(word: str) -> float:
        c = dictionary.get(word)
        if c:
            return math.log10(c) - log_n
        return 10.0 * (1.0 - log_n - 10.0 * math.log10(len(word)))

    n = len(text)
    best = [0.0] + [-math.inf] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_word_len), i):
            cand = best[j] + log_p(text[j:i])
            if cand > best[i]:
                best[i] = cand
                back[i] = j
    out: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        out.append(text[j:i])
        i = j
    out.reverse()
    return out


_CJK_RANGES = (
    (0x4E00, 0x9FFF),   # CJK Unified Ideographs
    (0x3400, 0x4DBF),   # Extension A
    (0xF900, 0xFAFF),   # Compatibility Ideographs
)


def _is_cjk(ch: str) -> bool:
    cp = ord(ch)
    return any(lo <= cp <= hi for lo, hi in _CJK_RANGES)


def tokenize_mixed(
    text: str,
    dictionary: dict[str, int],
    base_tokenizer: str = "unicode_alphanumeric",
    max_word_len: int = 8,
) -> list[str]:
    """UnicodeAlphanumericZH analog (reference tokenizer.rs +
    word_segmentation.rs): CJK runs are dictionary-segmented, the rest
    tokenizes with the base tokenizer; token order is preserved."""
    from seekstorm_spark.tokenizer import tokenize_line

    out: list[str] = []
    buf: list[str] = []
    other: list[str] = []

    def flush_cjk() -> None:
        if buf:
            out.extend(segment("".join(buf), dictionary, max_word_len))
            buf.clear()

    def flush_other() -> None:
        if other:
            out.extend(tokenize_line("".join(other), base_tokenizer))
            other.clear()

    for ch in text or "":
        if _is_cjk(ch):
            flush_other()
            buf.append(ch)
        else:
            flush_cjk()
            other.append(ch)
    flush_cjk()
    flush_other()
    return out


def segment_udf(dictionary: dict[str, int], max_word_len: int = 8):
    """Arrow-vectorized mixed-script tokenizer UDF. The dictionary is
    captured in the closure, so Spark ships it to the Python workers
    with the task (use ``spark.sparkContext.broadcast`` + pass
    ``bc.value`` for dictionaries above a few MB)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    @pandas_udf(ArrayType(StringType()))
    def run(texts):  # annotations omitted: postponed-eval strings of a
        # function-local alias confuse pandas_udf's signature inference
        return texts.map(
            lambda t: tokenize_mixed(t or "", dictionary, max_word_len=max_word_len)
        )

    return run
