"""Reference-parity tokenizers, pure Python core + Arrow UDF wrappers.

Replicates the reference engine's tokenizer semantics
(`/root/reference/seekstorm/src/tokenizer.rs`):

* ``AsciiAlphabetic`` (tokenizer.rs:320-338): ascii-lowercase, tokens =
  maximal runs of ``a-z``. ("Mainly for benchmark compatibility".)
* ``UnicodeAlphanumeric`` (tokenizer.rs:339-360, the default): full
  Unicode lowercase; a token starts at a word character (``\\w``);
  ``+ - #`` continue an already-started token (mid/end allowed — c++,
  c#); any other char terminates it.
* ``Whitespace`` / ``WhitespaceLowercase`` (tokenizer.rs:401-439).

Doc-mode position semantics (tokenizer.rs:584-894): stopwords are
dropped *without* advancing the position counter; positions are capped
at 65,536 tokens per field (positions are u16) and 65,536 positions
per term (`index.rs:110`); the per-field ``nonunique_terms_count`` is
the final position counter (tokenizer.rs:1389) — this is the BM25 doc
length before quantization.

Query-mode operators (tokenizer.rs:539-570): leading ``+`` forces the
whole query to Intersection; leading ``-`` marks the term NOT; ``"``
spans mark Phrase terms; queries truncate to 100 terms
(`index.rs:121`).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

MAX_QUERY_TERM_NUMBER = 100
MAX_POSITIONS_PER_TERM = 65_536
TOKEN_PER_FIELD_MAX = 65_536

# UnicodeAlphanumeric: token = word char, then word chars and + - #.
def _combining_mark_class() -> str:
    """Character-class snippet for combining marks that the
    reference's tokenizer keeps inside tokens. Rust's
    ``char::is_alphanumeric`` (tokenizer.rs:85) uses the Unicode
    Alphabetic property, which includes Other_Alphabetic marks
    (Devanagari matras, Tamil vowel signs, Hebrew points, Arabic
    harakat) that Python's ``\\w`` excludes — without them every
    Indic/pointed word shatters into per-consonant fragments.
    Viramas (canonical combining class 9, e.g. Devanagari U+094D,
    Tamil pulli U+0BCD) are NOT Alphabetic in Rust either and stay
    token breaks on both sides."""
    import unicodedata

    ranges = []
    start = prev = None
    for cp in range(0x0300, 0x3000):
        ch = chr(cp)
        if unicodedata.category(ch) in ("Mn", "Mc") and unicodedata.combining(ch) != 9:
            if prev is not None and cp == prev + 1:
                prev = cp
            else:
                if start is not None:
                    ranges.append((start, prev))
                start = prev = cp
    if start is not None:
        ranges.append((start, prev))
    return "".join(
        f"\\u{a:04x}-\\u{b:04x}" if a != b else f"\\u{a:04x}"
        for a, b in ranges
    )


_MARKS = _combining_mark_class()
_RE_UNICODE_ALNUM = re.compile(rf"[\w{_MARKS}][\w{_MARKS}+#-]*", re.UNICODE)
# ASCII fast path for the default tokenizer: on an already-lowercased
# ASCII string, Unicode ``\w`` reduces to ``[0-9a-z_]`` and the
# combining-mark class (all >= U+0300) cannot match, so this pattern
# yields the IDENTICAL token stream while the regex engine runs on
# 256-entry bitmap classes instead of per-char Unicode category
# lookups (~1.7x on the scan; guide §4 keep the per-row Python thin).
_RE_ASCII_FAST = re.compile(r"[0-9a-z_][0-9a-z_+#-]*")
# AsciiAlphabetic: runs of a-z after ascii lowercasing.
_RE_ASCII_ALPHA = re.compile(r"[a-z]+")

_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)


def ascii_lowercase(text: str) -> str:
    """Rust ``to_ascii_lowercase``: maps only A-Z, leaves Unicode as-is."""
    return text.translate(_ASCII_LOWER)


# --- character folding (UnicodeAlphanumericFolded) --------------------
# Reference fold_diacritics_accents_ligatures_zalgo_umlaut
# (tokenizer.rs:27-117): lowercase, expand ligatures/roman numerals/
# umlauts, strip diacritics via canonical+compatible decomposition,
# drop zalgo combining marks (categories Mn, Me).

_FOLD_MULTI = {
    "ﬀ": "ff", "ﬃ": "ffi", "ﬄ": "ffl", "ﬁ": "fi", "ﬂ": "fl",
    "ﬆ": "st", "ﬅ": "st",
    "ⅰ": "i", "ⅱ": "ii", "ⅲ": "iii", "ⅳ": "iv", "ⅴ": "v", "ⅵ": "vi",
    "ⅶ": "vii", "ⅷ": "viii", "ⅸ": "ix", "ⅹ": "x", "ⅺ": "xi", "ⅻ": "xii",
    "ⅼ": "l", "ⅽ": "c", "ⅾ": "d", "ⅿ": "m",
    "ä": "ae", "ö": "oe", "ü": "ue", "ß": "ss",
}
_FOLD_SINGLE = {
    "ł": "l", "æ": "a", "œ": "o", "ø": "o", "ð": "d", "þ": "t",
    "đ": "d", "ɖ": "d", "ħ": "h", "ı": "i", "ƿ": "w", "ȝ": "g",
}
_ZALGO_CATEGORIES = ("Mn", "Me")


def fold_text(text: str) -> str:
    """Fold diacritics/accents/ligatures/umlauts/zalgo to basic chars
    (reference tokenizer.rs:27-117 semantics). Lowercases first."""
    import unicodedata

    out: list[str] = []
    for cc in text.lower():
        multi = _FOLD_MULTI.get(cc)
        if multi is not None:
            out.append(multi)
            continue
        single = _FOLD_SINGLE.get(cc)
        if single is not None:
            out.append(single)
            continue
        # canonical decomposition → first char (base letter)
        base = unicodedata.normalize("NFD", cc)[0]
        # compatible decomposition → first alphanumeric, else base
        base2 = next(
            (c for c in unicodedata.normalize("NFKD", base) if c.isalnum()),
            base,
        )
        base2 = _FOLD_SINGLE.get(base2, base2)
        if unicodedata.category(base2) not in _ZALGO_CATEGORIES:
            out.append(base2)
    return "".join(out)


def tokenize_line(
    text: str,
    tokenizer: str = "unicode_alphanumeric",
    stemmer: str | None = None,
) -> list[str]:
    """Raw token stream (the reference's ``non_unique_terms_line``).
    ``stemmer`` (e.g. ``"en"``) stems every token after tokenization,
    index- and query-side alike (reference tokenizer.rs:576-592)."""
    if tokenizer == "unicode_alphanumeric":
        low = text.lower()
        # isascii on the LOWERED text (U+212A Kelvin lowers to ascii
        # 'k'; some non-ascii lowers stay non-ascii) — identical
        # tokens by construction, see _RE_ASCII_FAST
        if low.isascii():
            toks = _RE_ASCII_FAST.findall(low)
        else:
            toks = _RE_UNICODE_ALNUM.findall(low)
    elif tokenizer == "unicode_alphanumeric_folded":
        toks = _RE_UNICODE_ALNUM.findall(fold_text(text))
    elif tokenizer == "unicode_alphanumeric_zh":
        # CJK runs dictionary-segmented (bundled frequency dictionary;
        # reference UnicodeAlphanumericZH + word_segmentation.rs), the
        # rest through the default tokenizer. Custom dictionaries go
        # through word_segmentation.segment_udf instead.
        from seekstorm_spark.word_segmentation import tokenize_mixed
        from seekstorm_spark.zh_dictionary import BUILTIN_ZH_DICTIONARY

        toks = tokenize_mixed(text, BUILTIN_ZH_DICTIONARY)
    elif tokenizer == "ascii_alphabetic":
        toks = _RE_ASCII_ALPHA.findall(ascii_lowercase(text))
    elif tokenizer == "whitespace":
        toks = text.split()
    elif tokenizer == "whitespace_lowercase":
        toks = ascii_lowercase(text).split()
    else:
        raise ValueError(f"unknown tokenizer {tokenizer!r}")
    if stemmer:
        from seekstorm_spark.stemmer import stem

        toks = [stem(t, stemmer) for t in toks]
    return toks


def tokenize_doc(
    text: str,
    tokenizer: str = "unicode_alphanumeric",
    stop_words: frozenset[str] | None = None,
    stemmer: str | None = None,
) -> tuple[dict[str, list[int]], int]:
    """Doc-mode tokenization.

    Returns ``(term -> positions, nonunique_terms_count)`` where the
    count is the number of position-advancing (non-stopword) tokens,
    capped at 65,536 — the BM25 doc length before quantization.
    """
    terms: dict[str, list[int]] = {}
    position = 0
    for tok in tokenize_line(text, tokenizer, stemmer):
        if stop_words and tok in stop_words:
            continue  # stopwords do NOT advance the position counter
        plist = terms.setdefault(tok, [])
        if len(plist) < MAX_POSITIONS_PER_TERM:
            plist.append(position)
        position += 1
        if position >= TOKEN_PER_FIELD_MAX:
            break
    return terms, position


def tokenize_lite(
    text: str, tokenizer: str = "unicode_alphanumeric"
) -> list[str]:
    """Operator-free tokenization for the QAC/spell pipelines
    (reference tokenizer_lite, tokenizer.rs:1393-1668): ``+ - \"`` are
    payload, never operators — a user typing ``+fast ta`` into a
    suggest box is completing the words, not issuing operators."""
    return tokenize_line(text.replace('"', " "), tokenizer)


@dataclass
class QueryTerm:
    term: str
    op: str  # "union" | "intersection" | "not" | "phrase"
    phrase_index: int = -1  # position of the term inside its phrase span


@dataclass
class ParsedQuery:
    terms: list[QueryTerm] = field(default_factory=list)
    query_type: str = "union"  # overall type after operator promotion

    @property
    def positive_terms(self) -> list[QueryTerm]:
        return [t for t in self.terms if t.op != "not"]

    @property
    def not_terms(self) -> list[QueryTerm]:
        return [t for t in self.terms if t.op == "not"]


def parse_query(
    query: str,
    default_type: str = "union",
    tokenizer: str = "unicode_alphanumeric",
    stop_words: frozenset[str] | None = None,
    stemmer: str | None = None,
) -> ParsedQuery:
    """Query-mode tokenization with ``+ - "`` operators.

    Semantics per tokenizer.rs:539-570: a ``+term`` promotes the whole
    query to intersection; ``"…"`` spans mark phrase terms and promote
    the query to phrase; ``-term`` excludes. Duplicate terms are
    deduplicated by the engine (search.rs:3053-3064), not here.
    """
    result = ParsedQuery(query_type=default_type)
    is_phrase = default_type == "phrase"
    phrase_pos = 0
    out: list[QueryTerm] = []
    for chunk in query.split():
        if is_phrase:
            term_type = "phrase"
        elif result.query_type == "phrase":
            # terms outside a closed quote span are required (AND)
            term_type = "intersection"
        else:
            term_type = result.query_type
        if chunk.startswith("+"):
            if result.query_type != "phrase":
                result.query_type = "intersection"
            term_type = "intersection"
            chunk = chunk[1:]
        elif chunk.startswith("-"):
            term_type = "not"
            chunk = chunk[1:]
        if chunk.startswith('"'):
            is_phrase = True
            result.query_type = "phrase"
            term_type = "phrase"
            phrase_pos = 0
            chunk = chunk[1:]
        close_quote = chunk.endswith('"')
        if close_quote:
            result.query_type = "phrase"
            term_type = "phrase"
            chunk = chunk[:-1]
        for tok in tokenize_line(chunk, tokenizer, stemmer):
            if stop_words and tok in stop_words:
                continue
            qt = QueryTerm(term=tok, op=term_type)
            if term_type == "phrase":
                qt.phrase_index = phrase_pos
                phrase_pos += 1
            out.append(qt)
            if len(out) >= MAX_QUERY_TERM_NUMBER:
                break
        if close_quote:
            is_phrase = False
        if len(out) >= MAX_QUERY_TERM_NUMBER:
            break
    result.terms = out
    return result
