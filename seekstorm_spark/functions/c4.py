"""C4-style page/line quality filters (Raffel et al. 2020, §2.2).

The cleaning pass every large-scale webtext training pipeline runs
before tokenization/dedup. Line rules (a line survives iff ALL hold):

* ends in terminal punctuation (``. ! ? "``) after right-trim;
* has at least ``min_words`` space-separated words;
* does not contain the word "javascript" (case-insensitive).

Page rules over the surviving text:

* at least 3 sentences (terminal-punctuation count as the proxy the
  C4 release itself used);
* the raw page contains neither "lorem ipsum" (case-insensitive) nor
  a curly brace ``{`` (code placeholder).

Everything is JVM higher-order/string expressions — no Python in the
plan, one narrow map stage, no shuffle — and every construct has an
exact DuckDB twin (list_filter / regexp / translate), same oracle
policy as `functions/pii.py`.

Reference context: SeekStorm indexes whatever text it is handed
(ingest.rs); corpus-quality filtering is part of this repo's
beyond-reference training-data surface alongside `textstats.py`'s
Gopher-style repetition features.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TERMINAL_PUNCT_RE = '[.!?"]$'


def c4_kept_lines(text: Column | str, min_words: int = 5) -> Column:
    """Array of lines surviving the C4 line rules."""
    c = F.col(text) if isinstance(text, str) else text

    def _keep(line: Column) -> Column:
        words = F.filter(F.split(line, " "), lambda w: w != "")
        return (
            F.rtrim(line).rlike(TERMINAL_PUNCT_RE)
            & (F.size(words) >= min_words)
            & ~F.contains(F.lower(line), F.lit("javascript"))
        )

    return F.filter(F.split(c, "\n"), _keep)


def c4_clean(
    df: DataFrame, text_col: str = "text", min_words: int = 5
) -> DataFrame:
    """Append C4 quality columns: ``c4_text`` (surviving lines,
    newline-joined), ``c4_n_lines``, ``c4_n_sentences`` (terminal-
    punctuation count over surviving text), ``c4_keep`` (page-level
    verdict). Downstream filters on ``c4_keep = 1`` and reads
    ``c4_text``."""
    kept = c4_kept_lines(text_col, min_words)
    kt = F.array_join(kept, "\n")
    n_sent = F.length(kt) - F.length(F.translate(kt, '.!?', ""))
    raw = F.col(text_col)
    keep = (
        (n_sent >= 3)
        & ~F.contains(F.lower(raw), F.lit("lorem ipsum"))
        & ~F.contains(raw, F.lit("{"))
    )
    return (
        df.withColumn("c4_text", kt)
        .withColumn("c4_n_lines", F.size(kept).cast("long"))
        .withColumn("c4_n_sentences", n_sent.cast("long"))
        .withColumn("c4_keep", keep.cast("int"))
    )
