"""Porter stemmer — pure-Python implementation of the public
algorithm (M.F. Porter, "An algorithm for suffix stripping", Program
14(3), 1980; also the Snowball "english/porter" reference).

The reference engine stems index- and query-side terms through
rust-stemmers when a stemmer language is configured
(`/root/reference/seekstorm/src/tokenizer.rs:576-592`,
`index.rs:641-722`). This container has no stemmer package, so English
(the Porter algorithm, which Snowball's English stemmer derives from)
is implemented from the published spec; other Snowball languages are a
documented gap behind the same ``stem(word, lang)`` hook.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences in [C](VC)^m[V]."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        if _is_cons(stem, i):
            if prev_vowel:
                m += 1
            prev_vowel = False
        else:
            prev_vowel = True
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return (
        len(w) >= 2
        and w[-1] == w[-2]
        and _is_cons(w, len(w) - 1)
    )


def _cvc(w: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
    ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
    ("iviti", "ive"), ("biliti", "ble"),
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(w: str) -> str:
    if len(w) <= 2:
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w = w[:-2]
            flag = True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w = w[:-3]
            flag = True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                w = stem
            break
    else:
        if w.endswith("ion") and len(w) > 3 and w[-4] in "st":
            if _measure(w[:-3]) > 1:
                w = w[:-3]

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem

    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


def stem(word: str, lang: str = "en") -> str:
    """Stem ``word``: ``en`` → original Porter (here; the reference's
    StemmerType::Porter), ``en2`` → Porter2 (StemmerType::English),
    ``de``/``fr``/``es``/``sv``/``no``/``da``/``nl``/``pt``/``it``/
    ``ru`` → snowball.py, and ``ro hu fi ga hy ca hi id ne eu lt yi
    sr ar ta el tr`` → snowball_extra.py — every port verified to
    zero mismatches against the compiled Snowball stemmers
    (scripts/snowball_oracle.py), covering 28 of the reference's 38
    rust-stemmers languages behind this same per-index hook
    (index.rs:641-722). The remaining 9 (czech, dutch_porter,
    esperanto, estonian, lovins, persian, polish, sesotho, ukrainian)
    have no obtainable oracle in-container and pass through unchanged
    (documented gap). For a multilingual corpus, route each language
    partition through its own index (the corpus schema's ``lang``
    column is the natural partition key)."""
    if lang == "en":
        return porter_stem(word)
    if lang in ("de", "fr", "es", "sv", "no", "da", "nl", "pt", "it", "ru"):
        from seekstorm_spark import snowball as sb

        return {
            "de": sb.german_stem,
            "fr": sb.french_stem,
            "es": sb.spanish_stem,
            "sv": sb.swedish_stem,
            "no": sb.norwegian_stem,
            "da": sb.danish_stem,
            "nl": sb.dutch_stem,
            "pt": sb.portuguese_stem,
            "it": sb.italian_stem,
            "ru": sb.russian_stem,
        }[lang](word)
    from seekstorm_spark.snowball_extra import EXTRA_CODES

    fn = EXTRA_CODES.get(lang)
    if fn is not None:
        return fn(word)
    return word
