"""Built-in frequent-term (stopword-class) dictionaries.

The reference's n-gram indexing and result cache key off a small list
of stopword-class "frequent" terms per language (its default English
list ships as ``assets/dictionaries/frequent_en.txt`` — 38 of the
most common English function words; `index.rs:1644`,
`NGRAM_SEARCH.md`). These lists reproduce the same *class* of terms
from standard public stopword knowledge: the highest-frequency
function words of each language. Pass ``frequent_terms="en"`` (or
"de"/"fr"/"es") to :class:`~seekstorm_spark.index.builder.IndexBuilder`
to use one; an explicit list always wins.
"""

from __future__ import annotations

FREQUENT_TERMS: dict[str, tuple[str, ...]] = {
    "en": (
        "a", "all", "an", "and", "are", "as", "at", "be", "but", "by",
        "for", "from", "had", "has", "have", "he", "her", "his", "i",
        "in", "is", "it", "its", "not", "of", "on", "one", "or",
        "that", "the", "their", "this", "to", "was", "were", "which",
        "will", "with",
    ),
    "de": (
        "aber", "als", "am", "an", "auch", "auf", "aus", "bei", "das",
        "dem", "den", "der", "des", "die", "ein", "eine", "einen",
        "er", "es", "für", "hat", "ich", "im", "in", "ist", "mit",
        "nach", "nicht", "noch", "sich", "sie", "sind", "über", "und",
        "von", "war", "wie", "zu",
    ),
    "fr": (
        "au", "aux", "avec", "ce", "dans", "de", "des", "du", "elle",
        "en", "est", "et", "il", "la", "le", "les", "mais", "ne",
        "par", "pas", "pour", "qui", "que", "se", "son", "sont",
        "sur", "un", "une",
    ),
    "es": (
        "al", "como", "con", "de", "del", "el", "en", "es", "la",
        "las", "lo", "los", "más", "no", "para", "per", "por", "que",
        "se", "su", "un", "una", "y",
    ),
}


def frequent_terms_for(lang_or_terms) -> list[str] | None:
    """Resolve an IndexBuilder ``frequent_terms`` argument: a language
    code looks up the built-in list; an iterable passes through; None
    stays None."""
    if lang_or_terms is None:
        return None
    if isinstance(lang_or_terms, str):
        try:
            return list(FREQUENT_TERMS[lang_or_terms])
        except KeyError:
            raise ValueError(
                f"no built-in frequent-term list for {lang_or_terms!r}; "
                f"available: {sorted(FREQUENT_TERMS)} — or pass an "
                "explicit list"
            ) from None
    return list(lang_or_terms)
