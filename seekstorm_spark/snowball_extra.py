"""Additional Snowball stemmers (round 5+): languages whose spec text
is not available offline but whose GENUINE implementation is — the
compiled Snowball stemmers inside PostgreSQL 15's dict_snowball.so
(public PostgreSQL/Snowball BSD code, the same algorithms
rust-stemmers compiles for the reference, `index.rs:641-722`).

Each port here was developed test-first against that oracle
(scripts/snowball_oracle.py): implemented from the published
algorithm structure, then iterated until ZERO mismatches on curated
word lists plus thousands of seeded random fuzz words per language
(frozen in tests/data/snowball/{lang}.tsv; see
tests/test_snowball_golden.py).

Dispatch: ``EXTRA_STEMMERS[lang] -> callable`` — wired into
``seekstorm_spark.stemmer.stem`` alongside the snowball.py ports.
"""

from __future__ import annotations

from seekstorm_spark.snowball import _r1_r2

# ---------------------------------------------------------------------------
# Romanian
# ---------------------------------------------------------------------------
# NB: postgres' romanian.sbl predates the cedilla→comma reform: its
# suffix tables use ş (U+015F) and ţ (U+0163); comma-form input
# (ș/ț U+0219/U+021B) simply does not match those rules. Mirrored
# exactly (oracle-verified).

_RO_VOWELS = "aăâeiîou"


def _ro_mark(w: str) -> str:
    chars = list(w)
    n = len(chars)
    for i in range(1, n - 1):
        if (
            chars[i] in "iu"
            and chars[i - 1] in _RO_VOWELS
            and chars[i + 1] in _RO_VOWELS
        ):
            chars[i] = chars[i].upper()
    return "".join(chars)


def _ro_rv(w: str) -> int:
    n = len(w)
    if n < 3:
        return n
    if w[1] not in _RO_VOWELS:
        i = 2
        while i < n and w[i] not in _RO_VOWELS:
            i += 1
        return min(i + 1, n)
    if w[0] in _RO_VOWELS and w[1] in _RO_VOWELS:
        i = 2
        while i < n and w[i] in _RO_VOWELS:
            i += 1
        return min(i + 1, n)
    return 3


_RO_STEP0 = {
    "ul": "", "ului": "",
    "aua": "a",
    "ea": "e", "ele": "e", "elor": "e",
    "ii": "i", "iua": "i", "iei": "i", "iile": "i", "iilor": "i",
    "ilor": "i",
    "atei": "at",
    "aţie": "aţi", "aţia": "aţi",
}

_RO_STEP1 = {
    "abilitate": "abil", "abilitati": "abil", "abilităi": "abil",
    "abilităţi": "abil",
    "ibilitate": "ibil",
    "ivitate": "iv", "ivitati": "iv", "ivităi": "iv", "ivităţi": "iv",
    "icitate": "ic", "icitati": "ic", "icităi": "ic", "icităţi": "ic",
    "icator": "ic", "icatori": "ic",
    "iciv": "ic", "iciva": "ic", "icive": "ic", "icivi": "ic",
    "icivă": "ic",
    "ical": "ic", "icala": "ic", "icale": "ic", "icali": "ic",
    "icală": "ic",
    "ativ": "at", "ativa": "at", "ative": "at", "ativi": "at",
    "ativă": "at", "aţiune": "at", "atoare": "at", "ator": "at",
    "atori": "at", "ătoare": "at", "ător": "at", "ători": "at",
    "itiv": "it", "itiva": "it", "itive": "it", "itivi": "it",
    "itivă": "it", "iţiune": "it", "itoare": "it", "itor": "it",
    "itori": "it",
}

_RO_STEP2_DELETE = (
    "at", "ata", "ată", "ati", "ate",
    "ut", "uta", "ută", "uti", "ute",
    "it", "ita", "ită", "iti", "ite",
    "ic", "ica", "ice", "ici", "ică",
    "abil", "abila", "abile", "abili", "abilă",
    "ibil", "ibila", "ibile", "ibili", "ibilă",
    "oasa", "oasă", "oase", "os", "osi", "oşi",
    "ant", "anta", "ante", "anti", "antă",
    "ator", "atori",
    "itate", "itati", "ităi", "ităţi",
    "iv", "iva", "ive", "ivi", "ivă",
)
_RO_STEP2_IUNE = ("iune", "iuni")  # preceded by ţ → replace ţ with t
_RO_STEP2_IST = (
    "ism", "isme", "ist", "ista", "iste", "isti", "istă", "işti",
)

# verb suffixes deleted when preceded (within the RV limit) by a
# non-vowel or by 'u' — table extracted suffix-by-suffix from the
# oracle via three-base classification (scripts/iter_lang.py history)
_RO_VERB_COND = (
    "are", "ară", "arăm", "arăţi", "ase", "asem", "aseră", "aserăm",
    "aserăţi", "aseşi", "aşi", "am", "ai", "au",
    "eai", "eam", "eaţi", "eau", "ează", "ească",
    "ere", "esc", "ez", "eze", "ezi", "eşte", "eşti",
    "iai", "iam", "iau", "iaţi", "ind", "indu",
    "ire", "iră", "irăm", "irăţi",
    "ise", "isem", "iseră", "iserăm", "iserăţi", "iseşi", "işi",
    "ui", "ură", "urăm", "urăţi",
    "use", "usem", "useră", "userăm", "userăţi", "useşi", "uşi",
    "âi", "ând", "ându", "âre", "âră", "ârăm", "ârăţi",
    "âse", "âsem", "âseră", "âserăm", "âserăţi", "âseşi", "âşi",
    "ăsc", "ăşte", "ăşti",
)
# verb suffixes deleted unconditionally (in RV)
_RO_VERB_PLAIN = (
    "aţi", "em", "eţi", "im", "iţi", "âm", "âţi", "ăm",
    "se", "sei", "seşi", "seră", "serăm", "serăţi",
    "sese", "sesem", "seseşi", "seseră", "seserăm", "seserăţi",
)


def romanian_stem(word: str) -> str:
    w = _ro_mark(word.lower())
    rv = _ro_rv(w)
    r1, r2 = _r1_r2(w, _RO_VOWELS)

    def in_rv(pos: int) -> bool:
        return pos >= rv

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # step 0: removal of plurals (longest match, in R1; RV-limited
    # matching like the other Romance steps)
    for suf in sorted(_RO_STEP0, key=len, reverse=True):
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if not in_r1(pos):
            continue
        if suf == "ile" and w[max(0, pos - 2):pos] == "ab":
            continue
        w = w[:pos] + _RO_STEP0[suf]
        break
    else:
        # 'ile' → 'i' unless preceded by 'ab'
        if w.endswith("ile") and in_r1(len(w) - 3) and (
            w[max(0, len(w) - 5):len(w) - 3] != "ab"
        ):
            w = w[: len(w) - 3] + "i"

    # step 1: combining suffixes, repeated
    standard_removed = False
    while True:
        for suf in sorted(_RO_STEP1, key=len, reverse=True):
            if w.endswith(suf) and in_r1(len(w) - len(suf)):
                w = w[: len(w) - len(suf)] + _RO_STEP1[suf]
                standard_removed = True
                break
        else:
            break

    # step 2: standard suffixes in R2
    s2 = sorted(
        set(_RO_STEP2_DELETE) | set(_RO_STEP2_IUNE) | set(_RO_STEP2_IST),
        key=len,
        reverse=True,
    )
    for suf in s2:
        if not w.endswith(suf):
            continue
        # plain backwardmode among: longest match wins; an R2 failure
        # ends the step (no fallback — 'muncitate' keeps 'ate' because
        # the longer 'itate' matched outside R2; oracle-verified)
        pos = len(w) - len(suf)
        if not in_r2(pos):
            break
        if suf in _RO_STEP2_IUNE:
            if pos > 0 and w[pos - 1] == "ţ":
                w = w[: pos - 1] + "t"
                standard_removed = True
            break
        if suf in _RO_STEP2_IST:
            w = w[:pos] + "ist"
            standard_removed = True
            break
        w = w[:pos]
        standard_removed = True
        break

    # step 3: verb suffixes (only if steps 1-2 removed nothing)
    if not standard_removed:
        for suf in sorted(
            set(_RO_VERB_COND) | set(_RO_VERB_PLAIN), key=len, reverse=True
        ):
            if not w.endswith(suf):
                continue
            pos = len(w) - len(suf)
            if not in_rv(pos):
                continue
            if suf in _RO_VERB_PLAIN:
                w = w[:pos]
                break
            if (
                pos > 0
                and in_rv(pos - 1)
                and (w[pos - 1] not in _RO_VOWELS or w[pos - 1] == "u")
            ):
                w = w[:pos]
            break

    # step 4: final vowel — longest match ('ie' before the singles);
    # an RV failure on the matched suffix ends the step without
    # fallback ('ăhcție' keeps its e because 'ie' matched outside RV).
    # After a deletion, an additional preceding UNMARKED 'i' is
    # dropped when it sits STRICTLY inside RV ('zălgia' → 'zălg' but
    # 'copia' → 'copi'; oracle-extracted semantics)
    for suf in ("ie", "a", "e", "i", "ă"):
        if w.endswith(suf):
            if in_rv(len(w) - len(suf)):
                w = w[: len(w) - len(suf)]
                # ... except after 'ă' ('așbegiă' → 'așbegi')
                if suf != "ă" and w.endswith("i") and len(w) - 1 > rv:
                    w = w[:-1]
            break

    return w.lower()


EXTRA_STEMMERS = {
    "romanian": romanian_stem,
}

# ISO-639-1 codes for stemmer.stem() dispatch
EXTRA_CODES = {
    "ro": romanian_stem,
}
