"""Snowball stemmers for German, French, Spanish, Swedish, Norwegian,
Danish, Dutch, Portuguese, Italian and Russian, implemented from the
published algorithm descriptions (M.F. Porter's Snowball project,
snowballstem.org — the same public algorithms rust-stemmers compiles).

The reference engine stems index- and query-side terms through
rust-stemmers for 38 languages when a stemmer is configured
(`/root/reference/seekstorm/src/tokenizer.rs:576-592`,
`index.rs:641-722`). This container has no stemmer package, so the
highest-traffic European languages are implemented from the specs;
``stemmer.stem(word, lang)`` dispatches en→Porter (stemmer.py),
de/fr/es/sv/no/da/nl/pt/it/ru here, and ro/hu/fi/en2 (Porter2) via
snowball_extra.py. Round 5 validated every port against the GENUINE
compiled Snowball stemmers (postgres dict_snowball.so oracle,
scripts/snowball_oracle.py) to zero mismatches on thousands of fuzz
words per language; frozen golden vectors gate them in
tests/test_snowball_golden.py. Remaining languages pass through
unchanged (documented gap behind the same hook).

All three follow the shared Snowball skeleton: compute R1/R2 (and RV
for the Romance languages), then apply ordered longest-match suffix
steps with region conditions.
"""

from __future__ import annotations


def _r1_r2(word: str, vowels: str) -> tuple[int, int]:
    """Standard Snowball R1/R2 start offsets: R1 = after the first
    non-vowel following a vowel; R2 = the same, computed inside R1."""

    def after_vc(start: int) -> int:
        i = start
        n = len(word)
        while i < n and word[i] not in vowels:
            i += 1
        while i < n and word[i] in vowels:
            i += 1
        # word[i] is the first non-vowel after a vowel (or end)
        return min(i + 1, n) if i < n else n

    r1 = after_vc(0)
    r2 = after_vc(r1)
    return r1, r2


# ---------------------------------------------------------------------------
# German
# ---------------------------------------------------------------------------

_DE_VOWELS = "aeiouyäöü"
_DE_S_ENDING = frozenset("bdfghklmnrt")
_DE_ST_ENDING = frozenset("bdfghklmnt")


def german_stem(word: str) -> str:
    w = word.replace("ß", "ss")
    # u and y between vowels are consonants — mark with uppercase
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if (
            chars[i] in "uy"
            and chars[i - 1] in _DE_VOWELS
            and chars[i + 1] in _DE_VOWELS
        ):
            chars[i] = chars[i].upper()
    w = "".join(chars)
    # regions on the MARKED word: uppercase U/Y are consonants exactly
    # because they are not in the lowercase vowel set (oracle-caught
    # round-5 fix: 'neue' → r1=3 → 'neu', not r1=len)
    r1, r2 = _r1_r2(w, _DE_VOWELS)
    r1 = max(r1, 3)  # R1 begins no earlier than position 3

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # step 1 — longest of: em ern er | e en es | s
    for suf in ("ern", "em", "er", "en", "es", "e", "s"):
        if w.endswith(suf):
            pos = len(w) - len(suf)
            if suf in ("ern", "em", "er"):
                if in_r1(pos):
                    w = w[:pos]
            elif suf in ("e", "en", "es"):
                if in_r1(pos):
                    w = w[:pos]
                    if w.endswith("niss"):
                        w = w[:-1]
            else:  # s
                if in_r1(pos) and pos > 0 and w[pos - 1] in _DE_S_ENDING:
                    w = w[:pos]
            break

    # step 2 — longest of: est en er | st
    for suf in ("est", "en", "er", "st"):
        if w.endswith(suf):
            pos = len(w) - len(suf)
            if suf == "st":
                if (
                    in_r1(pos)
                    and pos > 0
                    and w[pos - 1] in _DE_ST_ENDING
                    and pos - 1 >= 3
                ):
                    w = w[:pos]
            else:
                if in_r1(pos):
                    w = w[:pos]
            break

    # step 3 — d-suffixes
    for suf in ("isch", "lich", "heit", "keit", "end", "ung", "ig", "ik"):
        if w.endswith(suf):
            pos = len(w) - len(suf)
            if suf in ("end", "ung"):
                if in_r2(pos):
                    w = w[:pos]
                    if w.endswith("ig") and in_r2(len(w) - 2) and (
                        len(w) < 3 or w[-3] != "e"
                    ):
                        w = w[:-2]
            elif suf in ("ig", "ik", "isch"):
                if in_r2(pos) and (pos == 0 or w[pos - 1] != "e"):
                    w = w[:pos]
            elif suf in ("lich", "heit"):
                if in_r2(pos):
                    w = w[:pos]
                    for pre in ("er", "en"):
                        if w.endswith(pre) and in_r1(len(w) - 2):
                            w = w[:-2]
                            break
            else:  # keit
                if in_r2(pos):
                    w = w[:pos]
                    if w.endswith("lich") and in_r2(len(w) - 4):
                        w = w[:-4]
                    elif w.endswith("ig") and in_r2(len(w) - 2):
                        w = w[:-2]
            break

    w = w.lower()
    return (
        w.replace("ä", "a").replace("ö", "o").replace("ü", "u")
    )


# ---------------------------------------------------------------------------
# Spanish
# ---------------------------------------------------------------------------

_ES_VOWELS = "aeiouáéíóúü"
_ES_ACCENT = str.maketrans("áéíóú", "aeiou")


def _es_rv(w: str) -> int:
    n = len(w)
    if n < 3:
        return n
    if w[1] not in _ES_VOWELS:
        # consonant at position 1: RV after the next vowel
        i = 2
        while i < n and w[i] not in _ES_VOWELS:
            i += 1
        return min(i + 1, n)
    if w[0] in _ES_VOWELS and w[1] in _ES_VOWELS:
        # two vowels: RV after the next consonant
        i = 2
        while i < n and w[i] in _ES_VOWELS:
            i += 1
        return min(i + 1, n)
    # consonant-vowel: RV after the third letter
    return 3


_ES_PRON = (
    "selas", "selos", "sela", "selo", "las", "les", "los", "nos",
    "me", "se", "la", "le", "lo",
)
_ES_PRON_A = ("iéndo", "ándo", "ár", "ér", "ír")
_ES_PRON_B = ("ando", "iendo", "ar", "er", "ir")

_ES_STEP1_DELETE_R2 = (
    "amientos", "imientos", "amiento", "imiento", "anzas", "ismos",
    "ables", "ibles", "istas", "anza", "icos", "icas", "ismo", "able",
    "ible", "ista", "osos", "osas", "ico", "ica", "oso", "osa",
)
_ES_STEP1_ADOR = (
    "aciones", "adoras", "adores", "ancias", "adora", "ación", "antes",
    "ancia", "ador", "ante",
)
_ES_STEP2B = (
    "aríamos", "eríamos", "iríamos", "iéramos", "iésemos", "aríais",
    "aseis", "eríais", "iríais", "ieseis", "asteis", "isteis", "ábamos",
    "áramos", "ásemos", "arían", "arías", "aréis", "erían", "erías",
    "eréis", "irían", "irías", "iréis", "ieran", "iesen", "ieron",
    "iendo", "ieras", "ieses", "abais", "arais", "aseis", "íamos",
    "arán", "arás", "aría", "erán", "erás", "ería", "irán", "irás",
    "iría", "iera", "iese", "aste", "iste", "aban", "aran", "asen",
    "aron", "ando", "abas", "adas", "idas", "aras", "ases", "íais",
    "ados", "idos", "amos", "imos", "ará", "aré", "erá", "eré", "irá",
    "iré", "aba", "ada", "ida", "ara", "ase", "ían", "ado", "ido",
    "ías", "áis", "ía", "ad", "ed", "id", "an", "ió", "ar", "er", "ir",
    "as", "ís",
)
_ES_STEP2B_GU = ("emos", "éis", "en", "es")


def spanish_stem(word: str) -> str:
    w = word
    rv = _es_rv(w)
    r1, r2 = _r1_r2(w, _ES_VOWELS)

    def in_rv(pos: int) -> bool:
        return pos >= rv

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # step 0: attached pronouns
    for pron in _ES_PRON:
        if not w.endswith(pron):
            continue
        stem_end = len(w) - len(pron)
        head = w[:stem_end]
        matched = False
        for pre in _ES_PRON_A:
            if head.endswith(pre) and in_rv(len(head) - len(pre)):
                w = head.translate(_ES_ACCENT)
                matched = True
                break
        if not matched:
            for pre in _ES_PRON_B:
                if head.endswith(pre) and in_rv(len(head) - len(pre)):
                    w = head
                    matched = True
                    break
        if not matched and head.endswith("yendo") and "uyendo" in head[-6:]:
            w = head
            matched = True
        break  # longest pronoun only
    rv = min(rv, len(w))

    before1 = w
    # step 1: standard suffixes (longest match)
    step1_done = False
    all_s1 = sorted(
        set(_ES_STEP1_DELETE_R2)
        | set(_ES_STEP1_ADOR)
        | {
            "logías", "logía", "uciones", "ución", "encias", "encia",
            "amente", "mente", "idades", "idad", "ivas", "ivos", "iva",
            "ivo",
        },
        key=len,
        reverse=True,
    )
    for suf in all_s1:
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if suf in _ES_STEP1_DELETE_R2:
            if in_r2(pos):
                w = w[:pos]
                step1_done = True
        elif suf in _ES_STEP1_ADOR:
            if in_r2(pos):
                w = w[:pos]
                step1_done = True
                if w.endswith("ic") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif suf in ("logía", "logías"):
            if in_r2(pos):
                w = w[:pos] + "log"
                step1_done = True
        elif suf in ("ución", "uciones"):
            if in_r2(pos):
                w = w[:pos] + "u"
                step1_done = True
        elif suf in ("encia", "encias"):
            if in_r2(pos):
                w = w[:pos] + "ente"
                step1_done = True
        elif suf == "amente":
            if in_r1(pos):
                w = w[:pos]
                step1_done = True
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                else:
                    for pre in ("os", "ic", "ad"):
                        if w.endswith(pre) and in_r2(len(w) - 2):
                            w = w[:-2]
                            break
        elif suf == "mente":
            if in_r2(pos):
                w = w[:pos]
                step1_done = True
                for pre in ("ante", "able", "ible"):
                    if w.endswith(pre) and in_r2(len(w) - 4):
                        w = w[:-4]
                        break
        elif suf in ("idad", "idades"):
            if in_r2(pos):
                w = w[:pos]
                step1_done = True
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre) and in_r2(len(w) - len(pre)):
                        w = w[: -len(pre)]
                        break
        elif suf in ("iva", "ivo", "ivas", "ivos"):
            if in_r2(pos):
                w = w[:pos]
                step1_done = True
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
        break
    rv = min(rv, len(w))

    # step 2a: verb suffixes beginning y (only if step 1 removed nothing)
    if not step1_done:
        for suf in (
            "yeron", "yendo", "yamos", "yais", "yan", "yen", "yas",
            "yes", "ya", "ye", "yo", "yó",
        ):
            if w.endswith(suf):
                pos = len(w) - len(suf)
                if in_rv(pos) and pos > 0 and w[pos - 1] == "u":
                    w = w[:pos]
                    step1_done = True  # a removal happened
                break

    # step 2b: other verb suffixes. Runs under `setlimit tomark pV`: a
    # suffix starting before RV is NOT a match — fall back to the next
    # shorter one ('vidas': 'idas' starts before RV, 'as' matches)
    if w == before1:
        for suf in sorted(
            set(_ES_STEP2B) | set(_ES_STEP2B_GU), key=len, reverse=True
        ):
            if not w.endswith(suf):
                continue
            pos = len(w) - len(suf)
            if not in_rv(pos):
                continue
            w = w[:pos]
            if suf in _ES_STEP2B_GU and w.endswith("gu"):
                w = w[:-1]
            break
    rv = min(rv, len(w))

    # step 3: residual suffix (same RV-limited matching)
    for suf in ("os", "a", "o", "á", "í", "ó", "e", "é"):
        if w.endswith(suf):
            pos = len(w) - len(suf)
            if not in_rv(pos):
                continue
            w = w[:pos]
            if suf in ("e", "é") and w.endswith("gu") and in_rv(len(w) - 1):
                w = w[:-1]
            break

    return w.translate(_ES_ACCENT)


# ---------------------------------------------------------------------------
# French
# ---------------------------------------------------------------------------

_FR_VOWELS = "aeiouyâàëéêèïîôûù"


def _fr_mark(word: str) -> str:
    chars = list(word)
    n = len(chars)
    for i, c in enumerate(chars):
        if c in "iu" and 0 < i < n - 1:
            if chars[i - 1] in _FR_VOWELS and chars[i + 1] in _FR_VOWELS:
                chars[i] = c.upper()
        if c == "u" and i > 0 and chars[i - 1] == "q":
            chars[i] = "U"
        if c == "y" and (
            (i > 0 and chars[i - 1] in _FR_VOWELS)
            or (i < n - 1 and chars[i + 1] in _FR_VOWELS)
        ):
            chars[i] = "Y"
    # diaeresis expansion (french.sbl prelude): ë → He, ï → Hi with H
    # a consonant marker — this is what lets step 4's final-e deletion
    # reach 'arûë' (→arûHe, e in RV) while 'arë' (→arHe, RV at end)
    # keeps its ë; the postlude in french_stem restores them
    return "".join(chars).replace("ë", "He").replace("ï", "Hi")


def _fr_rv(w: str) -> int:
    """RV on the MARKED word: I/U/Y consonant marks must count as
    non-vowels here (lowercasing first silently re-vowels them and
    shifts every region — oracle-caught round-5 fix)."""
    n = len(w)
    if n >= 2 and w[0] in _FR_VOWELS and w[1] in _FR_VOWELS:
        return min(3, n)
    if w.lower().startswith(("par", "col", "tap")):
        return min(3, n)
    # after the first vowel not at the beginning
    for i in range(1, n):
        if w[i] in _FR_VOWELS:
            return min(i + 1, n)
    return n


_FR_STEP1_R2_DELETE = (
    "ances", "iqUes", "ismes", "ables", "istes", "ance", "iqUe",
    "isme", "able", "iste", "eux",
)
_FR_STEP1_ATEUR = ("atrices", "ateurs", "ations", "atrice", "ateur", "ation")
_FR_STEP2A = (
    "issaIent", "issantes", "iraIent", "issante", "issants", "issions",
    "irions", "issais", "issait", "issant", "issent", "issiez", "issons",
    "irais", "irait", "irent", "iriez", "irons", "iront", "isses",
    "issez", "îmes", "îtes", "irai", "iras", "irez", "isse", "ies",
    "ira", "ît", "ie", "ir", "is", "it", "i",
)
_FR_STEP2B_RV = (
    "eraIent", "erions", "èrent", "erais", "erait", "eriez", "erons",
    "eront", "erai", "eras", "erez", "ées", "era", "iez", "ée", "és",
    "er", "ez", "é",
)
_FR_STEP2B_E = (
    "assions", "assent", "assiez", "aIent", "antes", "asses", "ants",
    "asse", "âtes", "ante", "ais", "ait", "ant", "âmes", "as", "ât",
    "ai", "a",
)


def french_stem(word: str) -> str:
    # regions AND vowel-adjacency tests run on the MARKED word: the
    # uppercase I/U/Y marks are consonants precisely because they are
    # not members of the lowercase vowel set
    w = _fr_mark(word)
    rv = _fr_rv(w)
    r1, r2 = _r1_r2(w, _FR_VOWELS)

    def in_rv(pos: int) -> bool:
        return pos >= rv

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    changed = False
    did_mandatory_2a = False

    # --- step 1: standard suffixes (longest match over the union) ---
    s1 = sorted(
        set(_FR_STEP1_R2_DELETE)
        | set(_FR_STEP1_ATEUR)
        | {
            "issements", "issement", "logies", "logie", "usions",
            "utions", "usion", "ution", "ences", "ence", "ements",
            "ement", "ités", "ité", "ives", "ifs", "ive", "if", "eaux",
            "aux", "euses", "euse", "amment", "emment", "ments", "ment",
        },
        key=len,
        reverse=True,
    )
    for suf in s1:
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if suf in _FR_STEP1_R2_DELETE:
            if in_r2(pos):
                w = w[:pos]
                changed = True
        elif suf in _FR_STEP1_ATEUR:
            if in_r2(pos):
                w = w[:pos]
                changed = True
                if w.endswith("ic"):
                    if in_r2(len(w) - 2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
        elif suf in ("logie", "logies"):
            if in_r2(pos):
                w = w[:pos] + "log"
                changed = True
        elif suf in ("usion", "ution", "usions", "utions"):
            if in_r2(pos):
                w = w[:pos] + "u"
                changed = True
        elif suf in ("ence", "ences"):
            if in_r2(pos):
                w = w[:pos] + "ent"
                changed = True
        elif suf in ("ement", "ements"):
            if in_rv(pos):
                w = w[:pos]
                changed = True
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                elif w.endswith("eus"):
                    p = len(w) - 3
                    if in_r2(p):
                        w = w[:p]
                    elif in_r1(p):
                        w = w[:p] + "eux"
                elif w.endswith(("abl", "iqU")) and in_r2(len(w) - 3):
                    w = w[:-3]
                elif w.lower().endswith("ièr") and in_rv(len(w) - 3):
                    w = w[:-3] + "i"
        elif suf in ("ité", "ités"):
            if in_r2(pos):
                w = w[:pos]
                changed = True
                if w.endswith("abil"):
                    if in_r2(len(w) - 4):
                        w = w[:-4]
                    else:
                        w = w[:-4] + "abl"
                elif w.endswith("ic"):
                    if in_r2(len(w) - 2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
                elif w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif suf in ("if", "ive", "ifs", "ives"):
            if in_r2(pos):
                w = w[:pos]
                changed = True
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("ic"):
                        if in_r2(len(w) - 2):
                            w = w[:-2]
                        else:
                            w = w[:-2] + "iqU"
        elif suf == "eaux":
            w = w[:pos] + "eau"
            changed = True
        elif suf == "aux":
            if in_r1(pos):
                w = w[:pos] + "al"
                changed = True
        elif suf in ("euse", "euses"):
            if in_r2(pos):
                w = w[:pos]
                changed = True
            elif in_r1(pos):
                w = w[:pos] + "eux"
                changed = True
        elif suf in ("issement", "issements"):
            if in_r1(pos) and pos > 0 and w[pos - 1] not in _FR_VOWELS:
                w = w[:pos]
                changed = True
        elif suf == "amment":
            if in_rv(pos):
                w = w[:pos] + "ant"
                changed = True
                did_mandatory_2a = True
        elif suf == "emment":
            if in_rv(pos):
                w = w[:pos] + "ent"
                changed = True
                did_mandatory_2a = True
        elif suf in ("ment", "ments"):
            if pos > 0 and w[pos - 1] in _FR_VOWELS and in_rv(pos - 1):
                w = w[:pos]
                changed = True
                did_mandatory_2a = True
        break
    rv = min(rv, len(w))

    # --- step 2a: verb suffixes beginning i ---
    # steps 2a/2b run under `setlimit tomark pV`: a suffix extending
    # past RV does not MATCH at all and the among falls back to the
    # next shorter suffix ('viez' → 'ez' matches though 'iez' is
    # longer); only a post-match condition failure ends the step
    step2_changed = False
    if not changed or did_mandatory_2a:
        for suf in _FR_STEP2A:
            if not w.endswith(suf):
                continue
            pos = len(w) - len(suf)
            if not in_rv(pos):
                continue  # outside the RV limit: not a match
            # the preceding char must be a non-vowel in RV, and NOT
            # the H diaeresis marker — 'haï' keeps its i (oracle)
            if (
                pos > 0
                and w[pos - 1] not in _FR_VOWELS
                and w[pos - 1] != "H"
                and in_rv(pos - 1)
            ):
                w = w[:pos]
                step2_changed = True
            break
        # --- step 2b (only if 2a removed nothing) ---
        if not step2_changed:
            for suf in sorted(
                set(_FR_STEP2B_RV) | set(_FR_STEP2B_E) | {"ions"},
                key=len,
                reverse=True,
            ):
                if not w.endswith(suf):
                    continue
                pos = len(w) - len(suf)
                if not in_rv(pos):
                    continue  # outside the RV limit: not a match
                if suf == "ions":
                    if in_r2(pos):
                        w = w[:pos]
                        step2_changed = True
                elif suf in _FR_STEP2B_RV:
                    w = w[:pos]
                    step2_changed = True
                else:
                    w = w[:pos]
                    step2_changed = True
                    if w.endswith("e") and in_rv(len(w) - 1):
                        w = w[:-1]
                break
        rv = min(rv, len(w))

    altered = changed or step2_changed
    if altered:
        # step 3
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # step 4: final s deleted when preceded by Hi (a former ï) or
        # by none of a,i,o,u,è,s — marked-text tests throughout
        if w.endswith("s") and len(w) >= 2 and (
            w.endswith("His") or w[-2] not in "aiouès"
        ):
            w = w[:-1]
        for suf in ("Ière", "ière", "Ier", "ier", "ion", "e"):
            if not w.endswith(suf):
                continue
            pos = len(w) - len(suf)
            if suf == "ion":
                if in_r2(pos) and pos > 0 and w[pos - 1] in "st":
                    w = w[:pos]
            elif suf in ("ier", "ière", "Ier", "Ière"):
                if in_rv(pos):
                    w = w[:pos] + "i"
            else:  # e
                if in_rv(pos):
                    w = w[:pos]
            break

    # step 5: undouble
    for end in ("enn", "onn", "ett", "ell", "eill"):
        if w.lower().endswith(end):
            w = w[:-1]
            break

    # step 6: un-accent (é/è before final non-vowel run → e); marked
    # I/U/Y count as non-vowels here too
    i = len(w) - 1
    seen_nonvowel = False
    while i >= 0:
        if w[i] in _FR_VOWELS:
            break
        seen_nonvowel = True
        i -= 1
    if seen_nonvowel and i >= 0 and w[i] in "éè":
        w = w[:i] + "e" + w[i + 1 :]

    # postlude: restore diaereses (He → ë, Hi → ï), drop orphan H
    # markers whose vowel was stripped, un-mark I/U/Y via lower()
    w = w.replace("He", "ë").replace("Hi", "ï").replace("H", "")
    return w.lower()


# ---------------------------------------------------------------------------
# Scandinavian trio (Swedish / Norwegian / Danish) — the simplest
# Snowball algorithms: R1 (start ≥ 3) + one longest-match suffix step,
# a consonant-pair trim, and a small cleanup step. Implemented from
# the published descriptions at snowballstem.org. Snowball `setlimit
# tomark p1` semantics: a suffix only matches when it lies ENTIRELY
# inside R1.
# ---------------------------------------------------------------------------

_SV_VOWELS = "aeiouyäåö"
_NO_VOWELS = "aeiouyæåø"
_DA_VOWELS = "aeiouyæåø"


def _scand_r1(word: str, vowels: str) -> int:
    r1, _r2 = _r1_r2(word, vowels)
    return max(r1, 3)


def _longest_in_r1(word: str, r1: int, suffixes: tuple[str, ...]) -> str | None:
    best = None
    for suf in suffixes:
        if (
            word.endswith(suf)
            and len(word) - len(suf) >= r1
            and (best is None or len(suf) > len(best))
        ):
            best = suf
    return best


_SV_STEP1 = (
    "a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
    "arne", "are", "aste", "en", "anden", "aren", "heten", "ern", "ar",
    "er", "heter", "or", "as", "arnas", "ernas", "ornas", "es", "ades",
    "andes", "ens", "arens", "hetens", "erns", "at", "andet", "het",
    "ast", "s",
)
_SV_S_ENDING = frozenset("bcdfghjklmnoprtvy")
_SV_PAIRS = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")


def swedish_stem(word: str) -> str:
    w = word.lower()
    r1 = _scand_r1(w, _SV_VOWELS)
    # step 1: longest in-R1 suffix — 's' only after a valid s-ending
    suf = _longest_in_r1(w, r1, _SV_STEP1)
    if suf == "s":
        if len(w) >= 2 and w[-2] in _SV_S_ENDING:
            w = w[:-1]
    elif suf is not None:
        w = w[: len(w) - len(suf)]
    # step 2: trim the final letter of an in-R1 consonant pair
    if len(w) - 2 >= r1 and w.endswith(_SV_PAIRS):
        w = w[:-1]
    # step 3
    suf = _longest_in_r1(w, r1, ("lig", "ig", "els", "löst", "fullt"))
    if suf in ("lig", "ig", "els"):
        w = w[: len(w) - len(suf)]
    elif suf == "löst":
        w = w[:-1]  # löst → lös
    elif suf == "fullt":
        w = w[:-1]  # fullt → full
    return w


_NO_STEP1 = (
    "a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en",
    "heten", "ar", "er", "heter", "as", "es", "edes", "endes", "enes",
    "hetenes", "ens", "hetens", "ers", "ets", "et", "het", "ast", "s",
    "erte", "ert",
)
_NO_S_ENDING = frozenset("bcdfghjlmnoprtvyz")
_NO_STEP3 = (
    "leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov", "elov",
    "slov", "hetslov",
)


def norwegian_stem(word: str) -> str:
    w = word.lower()
    r1 = _scand_r1(w, _NO_VOWELS)
    suf = _longest_in_r1(w, r1, _NO_STEP1)
    if suf == "s":
        # valid s-ending: the set, or k not preceded by a vowel
        prev = w[-2] if len(w) >= 2 else ""
        ok = prev in _NO_S_ENDING or (
            prev == "k" and (len(w) < 3 or w[-3] not in _NO_VOWELS)
        )
        if ok:
            w = w[:-1]
    elif suf in ("erte", "ert"):
        w = w[: len(w) - len(suf)] + "er"
    elif suf is not None:
        w = w[: len(w) - len(suf)]
    if len(w) - 2 >= r1 and w.endswith(("dt", "vt")):
        w = w[:-1]
    suf = _longest_in_r1(w, r1, _NO_STEP3)
    if suf is not None:
        w = w[: len(w) - len(suf)]
    return w


_DA_STEP1 = (
    "hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene",
    "erne", "ere", "en", "heden", "eren", "er", "heder", "erer",
    "heds", "es", "endes", "erendes", "enes", "ernes", "eres", "ens",
    "hedens", "erens", "ers", "ets", "erets", "et", "eret", "s",
)
_DA_S_ENDING = frozenset("abcdfghjklmnoprtvyzå")
_DA_PAIRS = ("gd", "dt", "gt", "kt")


def danish_stem(word: str) -> str:
    w = word.lower()
    r1 = _scand_r1(w, _DA_VOWELS)
    suf = _longest_in_r1(w, r1, _DA_STEP1)
    if suf == "s":
        if len(w) >= 2 and w[-2] in _DA_S_ENDING:
            w = w[:-1]
    elif suf is not None:
        w = w[: len(w) - len(suf)]

    def consonant_pair(v: str) -> str:
        if len(v) - 2 >= r1 and v.endswith(_DA_PAIRS):
            return v[:-1]
        return v

    w = consonant_pair(w)
    # step 3: igst loses its st unconditionally, then the in-R1 among
    if w.endswith("igst"):
        w = w[:-2]
    suf = _longest_in_r1(w, r1, ("ig", "lig", "elig", "els", "løst"))
    if suf == "løst":
        w = w[:-1]
    elif suf is not None:
        w = w[: len(w) - len(suf)]
        w = consonant_pair(w)
    # step 4 (undouble): trim a final double consonant whose LAST
    # letter lies in R1 — the single-char backward match runs under
    # the R1 limit, so only the deleted letter must be in R1 (oracle:
    # 'hedder'→'hed' with r1=3; dict_snowball.so, danish_stem)
    if (
        len(w) >= 2
        and w[-1] == w[-2]
        and w[-1] not in _DA_VOWELS
        and len(w) - 1 >= r1
    ):
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Dutch
# ---------------------------------------------------------------------------

_NL_VOWELS = "aeiouyè"
_NL_ACCENT = str.maketrans("äëïöüáéíóú", "aeiouaeiou")


def _nl_undouble(w: str) -> str:
    if w.endswith(("kk", "dd", "tt")):
        return w[:-1]
    return w


def dutch_stem(word: str) -> str:
    w = word.lower().translate(_NL_ACCENT)
    # initial y, y after a vowel, and i between vowels are consonants
    chars = list(w)
    n = len(chars)
    for i, c in enumerate(chars):
        if c == "y" and (i == 0 or chars[i - 1] in _NL_VOWELS):
            chars[i] = "Y"
        elif (
            c == "i"
            and 0 < i < n - 1
            and chars[i - 1] in _NL_VOWELS
            and chars[i + 1] in _NL_VOWELS
        ):
            chars[i] = "I"
    w = "".join(chars)
    # regions AND vowel tests on the MARKED word (uppercase Y/I are
    # consonants because they are not in the lowercase vowel set) —
    # lowercasing first re-vowels them (oracle-caught round-5 fix:
    # 'soye' → final e after consonant Y is deleted)
    r1, r2 = _r1_r2(w, _NL_VOWELS)
    # dutch.sbl's R1 floor is the literal `$p1 < 3  $p1 = 3` — a BYTE
    # comparison in the Snowball runtime, so a multibyte char ('è')
    # before R1 counts as two ('èrs' drops its s, 'ers' keeps it —
    # oracle-verified; the hop-based Scandinavian floors are per-CHAR)
    offs = [0]
    for ch in w:
        offs.append(offs[-1] + len(ch.encode("utf-8")))
    r1b = max(offs[r1], 3)
    r1 = next(
        (c for c in range(len(offs)) if offs[c] >= r1b), len(w)
    )

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    def valid_s_ending(pos: int) -> bool:
        return pos > 0 and w[pos - 1] not in _NL_VOWELS + "j"

    def valid_en_ending(pos: int) -> bool:
        return (
            pos > 0
            and w[pos - 1] not in _NL_VOWELS
            and w[max(0, pos - 3) : pos] != "gem"
        )

    # step 1 — longest of: heden | en ene | s se
    for suf in ("heden", "ene", "en", "se", "s"):
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if suf == "heden":
            if in_r1(pos):
                w = w[:pos] + "heid"
        elif suf in ("en", "ene"):
            if in_r1(pos) and valid_en_ending(pos):
                w = _nl_undouble(w[:pos])
        else:  # s / se
            if in_r1(pos) and valid_s_ending(pos):
                w = w[:pos]
        break

    # step 2 — delete final e if in R1 and preceded by a non-vowel
    e_removed = False
    if (
        w.endswith("e")
        and in_r1(len(w) - 1)
        and len(w) >= 2
        and w[-2] not in _NL_VOWELS
    ):
        w = _nl_undouble(w[:-1])
        e_removed = True

    # step 3a — heid
    if w.endswith("heid") and in_r2(len(w) - 4) and (
        len(w) < 5 or w[-5] != "c"
    ):
        w = w[:-4]
        if w.endswith("en") and in_r1(len(w) - 2) and valid_en_ending(
            len(w) - 2
        ):
            w = _nl_undouble(w[:-2])

    # step 3b — d-suffixes, longest match
    for suf in ("lijk", "baar", "end", "ing", "bar", "ig"):
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if suf in ("end", "ing"):
            if in_r2(pos):
                w = w[:pos]
                if (
                    w.endswith("ig")
                    and in_r2(len(w) - 2)
                    and (len(w) < 3 or w[-3] != "e")
                ):
                    w = w[:-2]
                else:
                    w = _nl_undouble(w)
        elif suf == "ig":
            if in_r2(pos) and (pos == 0 or w[pos - 1] != "e"):
                w = w[:pos]
        elif suf == "lijk":
            if in_r2(pos):
                w = w[:pos]
                # then repeat step 2
                if (
                    w.endswith("e")
                    and in_r1(len(w) - 1)
                    and len(w) >= 2
                    and w[-2] not in _NL_VOWELS
                ):
                    w = _nl_undouble(w[:-1])
        elif suf == "baar":
            if in_r2(pos):
                w = w[:pos]
        else:  # bar
            if in_r2(pos) and e_removed:
                w = w[:pos]
        break

    # step 4 — undouble vowel: C + aa/ee/oo/uu + non-vowel(≠I) → drop one
    if (
        len(w) >= 4
        and w[-1] not in _NL_VOWELS
        and w[-1] != "I"
        and w[-2] == w[-3]
        and w[-2] in "aeou"
        and w[-4] not in _NL_VOWELS
    ):
        w = w[:-2] + w[-1]

    return w.lower()


# ---------------------------------------------------------------------------
# Portuguese — nasal vowels ã/õ are handled as the spec's a~/o~
# digraphs (vowel + consonant) so the R-regions match the published
# algorithm, and folded back at the end.
# ---------------------------------------------------------------------------

_PT_VOWELS = "aeiouáéíóúâêô"

_PT_STEP1_DELETE_R2 = (
    "amentos", "imentos", "amento", "imento", "adoras", "adores",
    "aço~es", "ismos", "istas", "adora", "aça~o", "antes", "ância",
    "ezas", "icos", "icas", "ismo", "ável", "ível", "ista", "osos",
    "osas", "ador", "ante", "eza", "ico", "ica", "oso", "osa",
)
_PT_STEP2 = (
    "aríamos", "eríamos", "iríamos", "ássemos", "êssemos", "íssemos",
    "aríeis", "eríeis", "iríeis", "ásseis", "ésseis", "ísseis",
    "áramos", "éramos", "íramos", "ávamos", "aremos", "eremos",
    "iremos", "ariam", "eriam", "iriam", "assem", "essem", "issem",
    "ara~o", "era~o", "ira~o", "arias", "erias", "irias", "ardes",
    "erdes", "irdes", "asses", "esses", "isses", "astes", "estes",
    "istes", "áreis", "areis", "éreis", "ereis", "íreis", "ireis",
    "áveis", "íamos", "armos", "ermos", "irmos", "aria", "eria",
    "iria", "asse", "esse", "isse", "aste", "este", "iste", "arei",
    "erei", "irei", "aram", "eram", "iram", "avam", "arem", "erem",
    "irem", "ando", "endo", "indo", "adas", "idas", "arás", "aras",
    "erás", "eras", "irás", "avas", "ares", "eres", "ires", "íeis",
    "ados", "idos", "ámos", "amos", "emos", "imos", "iras", "ada",
    "ida", "ará", "ara", "erá", "era", "irá", "ava", "iam", "ado",
    "ido", "ias", "ais", "eis", "ira", "ia", "ei", "am", "em", "ar",
    "er", "ir", "as", "es", "is", "eu", "iu", "ou",
)


def _pt_rv(w: str) -> int:
    # same region definition as Spanish (shared Romance RV)
    n = len(w)
    if n < 3:
        return n
    if w[1] not in _PT_VOWELS:
        i = 2
        while i < n and w[i] not in _PT_VOWELS:
            i += 1
        return min(i + 1, n)
    if w[0] in _PT_VOWELS and w[1] in _PT_VOWELS:
        i = 2
        while i < n and w[i] in _PT_VOWELS:
            i += 1
        return min(i + 1, n)
    return 3




def portuguese_stem(word: str) -> str:
    w = word.replace("ã", "a~").replace("õ", "o~")
    rv = _pt_rv(w)
    r1, r2 = _r1_r2(w, _PT_VOWELS)

    def in_rv(pos: int) -> bool:
        return pos >= rv

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    altered = False
    before = w

    # step 1: standard suffixes, longest match
    s1 = sorted(
        set(_PT_STEP1_DELETE_R2)
        | {
            "logias", "logia", "uço~es", "uça~o", "ências", "ência",
            "amente", "mente", "idades", "idade", "ivas", "ivos",
            "iva", "ivo", "iras", "ira",
        },
        key=len,
        reverse=True,
    )
    for suf in s1:
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if suf in _PT_STEP1_DELETE_R2:
            if in_r2(pos):
                w = w[:pos]
                altered = True
        elif suf in ("logia", "logias"):
            if in_r2(pos):
                w = w[:pos] + "log"
                altered = True
        elif suf in ("uça~o", "uço~es"):
            if in_r2(pos):
                w = w[:pos] + "u"
                altered = True
        elif suf in ("ência", "ências"):
            if in_r2(pos):
                w = w[:pos] + "ente"
                altered = True
        elif suf == "amente":
            if in_r1(pos):
                w = w[:pos]
                altered = True
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                else:
                    for pre in ("os", "ic", "ad"):
                        if w.endswith(pre) and in_r2(len(w) - 2):
                            w = w[:-2]
                            break
        elif suf == "mente":
            if in_r2(pos):
                w = w[:pos]
                altered = True
                for pre in ("ante", "avel", "ível"):
                    if w.endswith(pre) and in_r2(len(w) - 4):
                        w = w[:-4]
                        break
        elif suf in ("idade", "idades"):
            if in_r2(pos):
                w = w[:pos]
                altered = True
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre) and in_r2(len(w) - len(pre)):
                        w = w[: -len(pre)]
                        break
        elif suf in ("iva", "ivo", "ivas", "ivos"):
            if in_r2(pos):
                w = w[:pos]
                altered = True
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
        else:  # ira / iras → ir when in RV and preceded by e
            if in_rv(pos) and pos > 0 and w[pos - 1] == "e":
                w = w[:pos] + "ir"
                altered = True
        break
    rv = min(rv, len(w))

    # step 2: verb suffixes (only if step 1 changed nothing)
    if w == before:
        for suf in _PT_STEP2:
            if w.endswith(suf):
                pos = len(w) - len(suf)
                if in_rv(pos):
                    w = w[:pos]
                    altered = True
                break
        rv = min(rv, len(w))

    # step 3: delete i preceded by c (only if a previous step altered)
    if altered and w.endswith("i") and in_rv(len(w) - 1) and len(w) >= 2 \
            and w[-2] == "c":
        w = w[:-1]

    # step 4: residual suffix (only if steps 1-2 did nothing)
    if not altered:
        for suf in ("os", "a", "i", "o", "á", "í", "ó"):
            if w.endswith(suf):
                pos = len(w) - len(suf)
                if in_rv(pos):
                    w = w[:pos]
                break
        rv = min(rv, len(w))

    # step 5: final e/é/ê; gu/ci lose their u/i; ç → c
    if w.endswith(("e", "é", "ê")) and in_rv(len(w) - 1):
        w = w[:-1]
        if (
            (w.endswith("gu") or w.endswith("ci"))
            and in_rv(len(w) - 1)
        ):
            w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"

    # final step is ONLY the nasal-marker restore (a~ → ã, o~ → õ);
    # the algorithm never strips acute/circumflex accents — oracle-
    # caught round-5 fix ('cantável' keeps its accent)
    return w.replace("a~", "ã").replace("o~", "õ")


# ---------------------------------------------------------------------------
# Italian
# ---------------------------------------------------------------------------

_IT_VOWELS = "aeiouàèìòù"
_IT_ACUTE = str.maketrans("áéíóú", "àèìòù")

_IT_PRON = (
    "gliela", "gliele", "glieli", "glielo", "gliene", "sene", "mela",
    "mele", "meli", "melo", "mene", "tela", "tele", "teli", "telo",
    "tene", "cela", "cele", "celi", "celo", "cene", "vela", "vele",
    "veli", "velo", "vene", "gli", "ci", "la", "le", "li", "lo", "mi",
    "ne", "si", "ti", "vi",
)
_IT_STEP1_DELETE_R2 = (
    "atrice", "atrici", "abile", "abili", "ibile", "ibili", "mente",
    "anza", "anze", "iche", "ichi", "ismo", "ismi", "ista", "iste",
    "isti", "istà", "istè", "istì", "ante", "anti", "ico", "ici",
    "ica", "ice", "oso", "osi", "osa", "ose",
)
_IT_STEP2 = (
    "erebbero", "irebbero", "assimo", "eranno", "erebbe", "eremmo",
    "ereste", "eresti", "essero", "assero", "iranno", "irebbe", "iremmo",
    "ireste", "iresti", "iscano", "iscono", "issero", "arono",
    "avamo", "avano", "avate", "eremo", "erete", "erono", "evamo",
    "evano", "evate", "iremo", "irete", "irono", "ivamo", "ivano",
    "ivate", "ammo", "ando", "asse", "assi", "emmo", "enda", "ende",
    "endi", "endo", "erai", "erei", "Yamo", "iamo", "immo", "irai",
    "irei", "isca", "isce", "isci", "isco", "ano", "are", "ata",
    "ate", "ati", "ato", "ava", "avi", "avo", "erà", "ere", "erò",
    "ete", "eva", "evi", "evo", "irà", "ire", "irò", "ita", "ite",
    "iti", "ito", "iva", "ivi", "ivo", "ono", "uta", "ute", "uti",
    "uto", "ar", "ir",
)


def _it_rv(w: str) -> int:
    # same region definition as Spanish (shared Romance RV); computed
    # on the MARKED word — uppercase I/U marks are consonants here
    n = len(w)
    if n < 3:
        return n
    if w[1] not in _IT_VOWELS:
        i = 2
        while i < n and w[i] not in _IT_VOWELS:
            i += 1
        return min(i + 1, n)
    if w[0] in _IT_VOWELS and w[1] in _IT_VOWELS:
        i = 2
        while i < n and w[i] in _IT_VOWELS:
            i += 1
        return min(i + 1, n)
    return 3


def italian_stem(word: str) -> str:
    w = word.lower().translate(_IT_ACUTE)
    # i/u between vowels, and u after q, are consonants (upper-cased)
    chars = list(w)
    n = len(chars)
    for i, c in enumerate(chars):
        if c == "u" and i > 0 and chars[i - 1] == "q":
            chars[i] = "U"
        elif (
            c in "iu"
            and 0 < i < n - 1
            and chars[i - 1] in _IT_VOWELS
            and chars[i + 1] in _IT_VOWELS
        ):
            chars[i] = c.upper()
    w = "".join(chars)
    # regions on the MARKED word (uppercase I/U = consonants)
    rv = _it_rv(w)
    r1, r2 = _r1_r2(w, _IT_VOWELS)

    def in_rv(pos: int) -> bool:
        return pos >= rv

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # step 0: attached pronoun after ando/endo (delete) or ar/er/ir
    # (replace with e)
    for pron in _IT_PRON:
        if not w.endswith(pron):
            continue
        head = w[: len(w) - len(pron)]
        if head.endswith(("ando", "endo")) and in_rv(len(head) - 4):
            w = head
        elif head.endswith(("ar", "er", "ir")) and in_rv(len(head) - 2):
            w = head + "e"
        break
    rv = min(rv, len(w))

    before = w
    # step 1: standard suffixes, longest match
    s1 = sorted(
        set(_IT_STEP1_DELETE_R2)
        | {
            "azione", "azioni", "atore", "atori", "logia", "logie",
            "uzione", "uzioni", "usione", "usioni", "enza", "enze",
            "amento", "amenti", "imento", "imenti", "amente", "ità",
            "ivo", "ivi", "iva", "ive",
        },
        key=len,
        reverse=True,
    )
    for suf in s1:
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if suf == "amente":
            if in_r1(pos):
                w = w[:pos]
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                else:
                    for pre in ("os", "ic"):
                        if w.endswith(pre) and in_r2(len(w) - 2):
                            w = w[:-2]
                            break
                    else:
                        if w.endswith("abil") and in_r2(len(w) - 4):
                            w = w[:-4]
        elif suf in _IT_STEP1_DELETE_R2:
            if in_r2(pos):
                w = w[:pos]
        elif suf in ("azione", "azioni", "atore", "atori"):
            if in_r2(pos):
                w = w[:pos]
                if w.endswith("ic") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif suf in ("logia", "logie"):
            if in_r2(pos):
                w = w[:pos] + "log"
        elif suf in ("uzione", "uzioni", "usione", "usioni"):
            if in_r2(pos):
                w = w[:pos] + "u"
        elif suf in ("enza", "enze"):
            if in_r2(pos):
                w = w[:pos] + "ente"
        elif suf in ("amento", "amenti", "imento", "imenti"):
            if in_rv(pos):
                w = w[:pos]
        elif suf == "ità":
            if in_r2(pos):
                w = w[:pos]
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre) and in_r2(len(w) - len(pre)):
                        w = w[: -len(pre)]
                        break
        else:  # ivo ivi iva ive
            if in_r2(pos):
                w = w[:pos]
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("ic") and in_r2(len(w) - 2):
                        w = w[:-2]
        break
    rv = min(rv, len(w))

    # step 2: verb suffixes (only if step 1 removed nothing). Runs
    # under `setlimit tomark pV`: a suffix extending past RV is NOT a
    # match and the among falls back to the next shorter one
    # ('vivano': 'ivano' starts before RV, 'ano' matches — oracle-
    # caught round-5 fix)
    if w == before:
        for suf in sorted(_IT_STEP2, key=len, reverse=True):
            if w.endswith(suf):
                pos = len(w) - len(suf)
                if not in_rv(pos):
                    continue
                w = w[:pos]
                break
        rv = min(rv, len(w))

    # step 3a: final vowel (and a preceding i) in RV
    if w and w[-1] in "aeioàèìò" and in_rv(len(w) - 1):
        w = w[:-1]
        if w.endswith("i") and in_rv(len(w) - 1):
            w = w[:-1]
    # step 3b: ch/gh → c/g in RV
    if w.endswith(("ch", "gh")) and in_rv(len(w) - 2):
        w = w[:-1]

    # accented stems stay accented (città → città) — only the
    # acute→grave fold and the I/U consonant marks normalize
    return w.lower()


# ---------------------------------------------------------------------------
# Russian — suffix classes operate in RV (region after the first
# vowel); the derivational step uses R2. Group-1 suffixes match only
# when preceded by а/я (the а/я itself stays).
# ---------------------------------------------------------------------------

_RU_VOWELS = "аеиоуыэюя"

_RU_PERF_GERUND_1 = ("вшись", "вши", "в")
_RU_PERF_GERUND_2 = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
_RU_ADJECTIVE = (
    "ими", "ыми", "его", "ого", "ему", "ому", "ее", "ие", "ые", "ое",
    "ей", "ий", "ый", "ой", "ем", "им", "ым", "ом", "их", "ых", "ую",
    "юю", "ая", "яя", "ою", "ею",
)
_RU_PARTICIPLE_1 = ("ем", "нн", "вш", "ющ", "щ")
_RU_PARTICIPLE_2 = ("ивш", "ывш", "ующ")
_RU_VERB_1 = (
    "ете", "йте", "ешь", "нно", "ла", "на", "ли", "ем", "ло", "но",
    "ет", "ют", "ны", "ть", "й", "л", "н",
)
_RU_VERB_2 = (
    "ейте", "уйте", "ила", "ыла", "ена", "ите", "или", "ыли", "ило",
    "ыло", "ено", "ует", "уют", "ены", "ить", "ыть", "ишь", "ей",
    "уй", "ил", "ыл", "им", "ым", "ен", "ят", "ит", "ыт", "ую", "ю",
)
_RU_NOUN = (
    "иями", "ями", "ами", "ией", "иям", "ием", "иях", "ев", "ов",
    "ие", "ье", "еи", "ии", "ей", "ой", "ий", "ям", "ем", "ам", "ом",
    "ах", "ях", "ию", "ью", "ия", "ья", "а", "е", "и", "й", "о", "у",
    "ы", "ь", "ю", "я",
)


def russian_stem(word: str) -> str:
    w = word.lower().replace("ё", "е")
    n = len(w)
    rv = n
    for i, c in enumerate(w):
        if c in _RU_VOWELS:
            rv = i + 1
            break
    _r1, r2 = _r1_r2(w, _RU_VOWELS)

    def in_rv(pos: int) -> bool:
        return pos >= rv

    def cut_class(
        word_: str, g1: tuple[str, ...], g2: tuple[str, ...]
    ) -> str | None:
        """Longest in-RV suffix across both groups; group-1 requires a
        preceding а/я (kept). None = no match."""
        best = None
        for suf in g2:
            pos = len(word_) - len(suf)
            if word_.endswith(suf) and in_rv(pos) and (
                best is None or len(suf) > len(best[1])
            ):
                best = (pos, suf)
        for suf in g1:
            pos = len(word_) - len(suf)
            if (
                word_.endswith(suf)
                and in_rv(pos)
                and pos > 0
                and word_[pos - 1] in "ая"
                # the а/я precondition char is part of the backward
                # match under the RV limit — it must be in RV too
                # (oracle: 'дала' keeps 'ла', noun 'а' strips instead)
                and in_rv(pos - 1)
                and (best is None or len(suf) > len(best[1]))
            ):
                best = (pos, suf)
        return word_[: best[0]] if best is not None else None

    def cut_plain(word_: str, sufs: tuple[str, ...]) -> str | None:
        best = None
        for suf in sufs:
            pos = len(word_) - len(suf)
            if word_.endswith(suf) and in_rv(pos) and (
                best is None or len(suf) > len(best[1])
            ):
                best = (pos, suf)
        return word_[: best[0]] if best is not None else None

    # step 1: perfective gerund, else [reflexive] + adjectival/verb/noun
    got = cut_class(w, _RU_PERF_GERUND_1, _RU_PERF_GERUND_2)
    if got is not None:
        w = got
    else:
        for refl in ("ся", "сь"):
            if w.endswith(refl) and in_rv(len(w) - 2):
                w = w[:-2]
                break
        adj = cut_plain(w, _RU_ADJECTIVE)
        if adj is not None:
            w = adj
            part = cut_class(w, _RU_PARTICIPLE_1, _RU_PARTICIPLE_2)
            if part is not None:
                w = part
        else:
            verb = cut_class(w, _RU_VERB_1, _RU_VERB_2)
            if verb is not None:
                w = verb
            else:
                noun = cut_plain(w, _RU_NOUN)
                if noun is not None:
                    w = noun

    # step 2: final и
    if w.endswith("и") and in_rv(len(w) - 1):
        w = w[:-1]

    # step 3: derivational (ост/ость) in R2
    for suf in ("ость", "ост"):
        if w.endswith(suf) and len(w) - len(suf) >= r2:
            w = w[: len(w) - len(suf)]
            break

    # step 4: superlative, undouble нн, final ь
    if w.endswith("нн") and in_rv(len(w) - 1):
        w = w[:-1]
    else:
        sup = cut_plain(w, ("ейше", "ейш"))
        if sup is not None:
            w = sup
            if w.endswith("нн") and in_rv(len(w) - 1):
                w = w[:-1]
        if w.endswith("ь") and in_rv(len(w) - 1):
            w = w[:-1]
    return w
