"""KWIC fragment extraction + term highlighting.

Engine analog of the reference highlighter
(`/root/reference/seekstorm/src/highlighter.rs:71-382`): extract a
keyword-in-context fragment around the first query-term occurrence and
wrap occurrences in ``<b>…</b>``. Runs post-top-k (k rows), built-ins
only — `locate`/`substring`/`replace` — so it composes with any result
DataFrame and stays SQL-oracle-checkable.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def highlight_first(
    text: Column, term: str, width: int = 30
) -> Column:
    """Fragment of ±width chars around the first *token-aligned*
    occurrence of term (empty string when absent), with every
    token-aligned occurrence inside the fragment bolded.

    Word boundaries (``\\b``) keep "fast" from matching inside
    "breakfast" — the reference highlighter matches whole tokens
    (highlighter.rs:71-382). The first-occurrence position is the
    length of the lazy prefix group, which both Java regex (Spark) and
    RE2 (DuckDB) evaluate identically, so the oracle SQL reproduces
    the exact fragment.
    """
    esc = re.escape(term)
    pat = rf"\b{esc}\b"
    # 1-based position of the first token-aligned match (0 = absent)
    prefix = F.regexp_extract(text, rf"^(.*?){pat}", 1)
    found = text.rlike(pat)
    pos = F.length(prefix) + F.lit(1)
    start = F.greatest(pos - F.lit(width), F.lit(1))
    frag = F.substring(text, start, F.lit(2 * width + len(term)))
    highlighted = F.regexp_replace(frag, pat, f"<b>{term}</b>")
    return F.when(found, highlighted).otherwise(F.lit(""))


def highlight_phrase(
    text: Column, terms: list[str], width: int = 30
) -> Column:
    """KWIC fragment around the first occurrence of the full PHRASE,
    with each whole phrase occurrence inside the fragment wrapped in
    ONE ``<b>…</b>`` span (the reference highlights phrase matches as
    a single span, highlighter.rs:229-322; per-term highlighting
    would bold "fast" and "table" separately even when they match as
    a phrase).

    Adjacent terms may be separated by any run of whitespace
    (``\\s+``); the matched text is re-emitted verbatim via the
    whole-match group, so the original spacing survives inside the
    bold span. Empty string when the phrase is absent.
    """
    if not terms:
        return F.lit("")
    pat = r"\b" + r"\s+".join(re.escape(t) for t in terms) + r"\b"
    prefix = F.regexp_extract(text, rf"^(.*?){pat}", 1)
    found = text.rlike(pat)
    pos = F.length(prefix) + F.lit(1)
    start = F.greatest(pos - F.lit(width), F.lit(1))
    # budget the fragment by the FIRST match's actual length (the \s+
    # runs between terms vary), so the matched span always fits
    m_len = F.length(F.regexp_extract(text, pat, 0))
    frag = F.substring(text, start, F.lit(2 * width) + m_len)
    highlighted = F.regexp_replace(frag, pat, "<b>$0</b>")
    return F.when(found, highlighted).otherwise(F.lit(""))


def kwic_fragment_py(text: str, terms: list[str], width: int = 30) -> str:
    """Pure-Python KWIC twin for DRIVER-side highlighting (the REST
    server's doc-store path — no Spark job): fragment of ±``width``
    chars around the first token-aligned occurrence of the first
    present term, with every present term bolded inside the fragment.
    Same word-boundary semantics as :func:`highlight_first`. Matching
    is case-insensitive (query terms are lowercased by parse_query but
    stored text keeps its original case); the bolded span preserves
    the original-case text via the match group."""
    if not text:
        return ""
    for term in terms:
        m = re.search(rf"\b{re.escape(term)}\b", text, re.IGNORECASE)
        if m is None:
            continue
        start = max(m.start() - width, 0)
        frag = text[start : m.start() + len(term) + width]
        for t in terms:
            frag = re.sub(
                rf"\b({re.escape(t)})\b", r"<b>\1</b>", frag, flags=re.IGNORECASE
            )
        return frag
    return ""
