"""KWIC fragment extraction + term highlighting.

Engine analog of the reference highlighter
(`/root/reference/seekstorm/src/highlighter.rs:71-382`): extract a
keyword-in-context fragment around the first query-term occurrence and
wrap occurrences in ``<b>…</b>``. Runs post-top-k (k rows), built-ins
only — `locate`/`substring`/`replace` — so it composes with any result
DataFrame and stays SQL-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def highlight_first(
    text: Column, term: str, width: int = 30
) -> Column:
    """Fragment of ±width chars around the first occurrence of term
    (1-based locate; empty string when absent), with every occurrence
    of the term inside the fragment bolded."""
    pos = F.locate(term, text)
    start = F.greatest(pos - F.lit(width), F.lit(1))
    frag = F.substring(text, start, F.lit(2 * width + len(term)))
    highlighted = F.replace(
        frag, F.lit(term), F.lit(f"<b>{term}</b>")
    )
    return F.when(pos > 0, highlighted).otherwise(F.lit(""))
