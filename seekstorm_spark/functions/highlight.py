"""KWIC fragment extraction + term highlighting.

Engine analog of the reference highlighter
(`/root/reference/seekstorm/src/highlighter.rs:71-382`): extract a
keyword-in-context fragment around the first query-term occurrence and
wrap occurrences in ``<b>…</b>``. Runs post-top-k (k rows), built-ins
only — `locate`/`substring`/`replace` — so it composes with any result
DataFrame and stays SQL-oracle-checkable.
"""

from __future__ import annotations

import heapq
import re

import pandas as pd

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


# ---------------------------------------------------------------------------
# Full reference highlighter: sentence fragmentation + proximity-scored
# top-N fragment selection (highlighter.rs:105-382)
# ---------------------------------------------------------------------------

# highlighter.rs:200 SENTENCE_BOUNDARY_CHARS (the '。' duplicate collapses)
_BOUNDARY = frozenset("!?.¿¡。、！？︒")

_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)


class _TermMatcher:
    """Case-insensitive (ASCII-fold) leftmost-longest multi-pattern
    matcher — Python twin of the reference's AhoCorasick configuration
    (highlighter.rs:93-97: ``ascii_case_insensitive`` +
    ``MatchKind::LeftmostLongest``). ``finditer`` is leftmost and the
    alternation lists patterns longest-first, so among patterns
    matching at the same start the longest wins; scanning resumes at
    the match end (non-overlapping), exactly like AC ``find_iter``.
    Pattern id = position in the ORIGINAL terms list — the sequence
    (phrase) scoring contract keys on ``id + 1`` being the next query
    term (highlighter.rs:131,144)."""

    def __init__(self, terms: list[str]):
        self.terms = [t for t in terms if t]
        self._ids: dict[str, int] = {}
        for i, t in enumerate(self.terms):
            self._ids.setdefault(t.translate(_ASCII_LOWER), i)
        alts = sorted(set(self.terms), key=len, reverse=True)
        self._re = (
            re.compile(
                "|".join(re.escape(t) for t in alts),
                re.IGNORECASE | re.ASCII,
            )
            if alts
            else None
        )
        self.max_len = max((len(t) for t in alts), default=0)

    def finditer(self, text: str):
        if self._re is None:
            return
        for m in self._re.finditer(text):
            yield (
                m.start(),
                m.end(),
                self._ids.get(m.group(0).translate(_ASCII_LOWER), 0),
            )


def _score_fragment(
    text: str, matcher: _TermMatcher
) -> tuple[float, int]:
    """Fragment relevance score (highlighter.rs:114-147): +1.0 for a
    term's first occurrence, +0.3 for a repeat, +5.0·run-length when a
    match continues the query-order sequence one character past the
    previous match's end (phrase proximity). Returns (score, end of
    the first match)."""
    score = 0.0
    expected_pattern = -1
    expected_index = -1
    first_end = 0
    seen = [0] * len(matcher.terms)
    seq = 1
    for start, end, pid in matcher.finditer(text):
        if first_end == 0:
            first_end = end
        if pid == expected_pattern and expected_index == start:
            seq += 1
            seen[pid] = 1
            score += seq * 5.0
        elif not seen[pid]:
            seq = 1
            seen[pid] = 1
            score += 1.0
        else:
            seq = 1
            score += 0.3
        expected_pattern = pid + 1
        expected_index = end + 1
    return score, first_end


def _truncate(
    text: str, first_end: int, fragment_size: int
) -> tuple[str, bool, bool]:
    """Window the fragment to ``fragment_size`` keeping the first
    match inside it, cutting at a space (highlighter.rs:149-179):
    first match past the window → keep the TAIL from the first space
    at len−size (whole text if no space); otherwise overlong → keep
    the HEAD up to the first space at size (whole text if none).
    Char-based where the reference is byte-based with char-boundary
    fixups — identical on ASCII."""
    if first_end > fragment_size:
        idx = len(text) - fragment_size
        sp = text.find(" ", idx)
        idx = sp if sp != -1 else 0
        return text[idx:], True, False
    if len(text) > fragment_size:
        sp = text.find(" ", fragment_size)
        idx = sp if sp != -1 else len(text)
        return text[:idx], False, True
    return text, False, False


def _markup(
    text: str, matcher: _TermMatcher, pre_tags: str, post_tags: str
) -> str:
    """Wrap every term match in pre/post tags, preserving the matched
    text verbatim (highlighter.rs:360-382)."""
    out: list[str] = []
    prev = 0
    for start, end, _pid in matcher.finditer(text):
        out.append(text[prev:start])
        out.append(pre_tags)
        out.append(text[start:end])
        out.append(post_tags)
        prev = end
    out.append(text[prev:])
    return "".join(out)


def expand_terms_with_synonyms(
    terms: list[str], synonyms: list[dict] | None
) -> list[str]:
    """Append each term's synonyms to the pattern list, reference
    highlighter() semantics (highlighter.rs:77-91): appended AFTER the
    query terms, so sequence scoring still keys on the original
    order. ``synonyms`` is the meta.json shape
    ``[{"terms": [...], "multiway": bool}]``."""
    if not synonyms:
        return list(terms)
    from seekstorm_spark.index.builder import synonym_map_from_groups

    smap = synonym_map_from_groups(synonyms)
    out = list(terms)
    for t in terms:
        for syn in smap.get(t.translate(_ASCII_LOWER), []):
            if syn not in out:
                out.append(syn)
    return out


def top_fragments(
    text: str,
    terms: list[str],
    fragment_number: int = 1,
    fragment_size: int = 0,
    highlight_markup: bool = True,
    pre_tags: str = "<b>",
    post_tags: str = "</b>",
) -> str:
    """The reference's full KWIC pipeline
    (``top_fragments_from_field``, highlighter.rs:216-358): split the
    field into sentence fragments on ``!?.¿¡。、！？︒``, score each by
    term count / order / phrase proximity, keep the top
    ``fragment_number`` by score but emit them in DOCUMENT order
    joined with ``...`` at gaps, window each to ``fragment_size``
    (0 = unlimited) keeping the first match visible, and finally wrap
    matches in ``pre_tags``/``post_tags`` when ``highlight_markup``.

    ``fragment_number=0`` disables fragmentation: the whole text is
    one fragment (still highlighted). A single one-char pattern takes
    the reference's no-score fast path: first fragments win, no
    markup (highlighter.rs:225-226). Matching is substring-level
    ASCII-case-insensitive leftmost-longest — the reference highlights
    "fast" inside "breakfast" too."""
    if not text:
        return ""
    matcher = _TermMatcher(terms)
    no_score = len(matcher.terms) == 1 and matcher.max_len == 1
    no_frag = fragment_number == 0
    k = 1 if no_frag else fragment_number
    fsize = fragment_size if fragment_size > 0 else (1 << 62)

    fragments: list[tuple[str, bool, bool]] = []
    heap: list[tuple[float, int]] = []  # (score, -index) min-heap

    def _add(section: str) -> None:
        if no_score:
            score, first_end = 1.0, 0
        else:
            score, first_end = _score_fragment(section, matcher)
        frag = _truncate(section, first_end, fsize)
        idx = len(fragments)
        added = False
        if score > 0.0:
            if len(heap) < k:
                heapq.heappush(heap, (score, -idx))
                added = True
            elif score > heap[0][0]:
                heapq.heapreplace(heap, (score, -idx))
                added = True
        if not fragments or added:
            fragments.append(frag)

    last = 0
    if not no_frag:
        for ci, ch in enumerate(text):
            if ch not in _BOUNDARY:
                continue
            if last != ci:
                _add(text[last : ci + 1])
                if no_score and len(heap) == k:
                    last = ci + 1
                    break
            last = ci + 1
    # trailing section only when ≥2 chars remain (highlighter.rs:288)
    if last + 1 < len(text):
        _add(text[last:])

    out = ""
    if fragments:
        if heap:
            # document-order assembly with "..." at gaps
            # (highlighter.rs:318-337)
            prev = 0
            for score, nidx in sorted(heap, key=lambda t: -t[1]):
                i = -nidx
                frag, tl, tr = fragments[i]
                if (out and not out.endswith("...") and i != prev + 1) or (
                    tl and (not out or not out.endswith("..."))
                ):
                    out += "..."
                out += frag
                prev = i
                if tr:
                    out += "..."
        else:
            out = fragments[0][0]

    if highlight_markup and not no_score:
        out = _markup(out, matcher, pre_tags, post_tags)
    return out


def top_fragments_udf(
    terms: list[str],
    fragment_number: int = 1,
    fragment_size: int = 0,
    highlight_markup: bool = True,
    pre_tags: str = "<b>",
    post_tags: str = "</b>",
):
    """Arrow-batched pandas-UDF wrapper over :func:`top_fragments`
    for highlighting a result DataFrame's stored field. Post-top-k
    (k rows per partition), so the per-row Python cost is bounded by
    the page size, never the corpus."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    def _batch(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: top_fragments(
                t or "",
                terms,
                fragment_number=fragment_number,
                fragment_size=fragment_size,
                highlight_markup=highlight_markup,
                pre_tags=pre_tags,
                post_tags=post_tags,
            )
        )

    return pandas_udf(_batch, StringType())


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
