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


# ---------------------------------------------------------------------------
# Hungarian
# ---------------------------------------------------------------------------

_HU_VOWELS = "aáeéiíoóöőuúüű"
_HU_DIGRAPHS = ("dzs", "cs", "dz", "gy", "ly", "ny", "sz", "ty", "zs")
# doubled consonants (incl. doubled digraphs, written with the first
# letter repeated: ssz = sz+sz etc.)
_HU_DOUBLE = (
    "bb", "cc", "ccs", "dd", "ff", "gg", "ggy", "jj", "kk", "ll",
    "lly", "mm", "nn", "nny", "pp", "rr", "ss", "ssz", "tt", "tty",
    "vv", "zz", "zzs",
)


def _hu_r1(w: str) -> int:
    n = len(w)
    if not w:
        return 0
    if w[0] in _HU_VOWELS:
        # after the first consonant or digraph
        i = 1
        while i < n:
            if w[i] not in _HU_VOWELS:
                for d in _HU_DIGRAPHS:
                    if w.startswith(d, i):
                        return min(i + len(d), n)
                return i + 1
            i += 1
        return n
    # begins with a consonant: after the first vowel
    for i in range(1, n):
        if w[i] in _HU_VOWELS:
            return i + 1
    return n


def _hu_undouble(w: str) -> str:
    for d in sorted(_HU_DOUBLE, key=len, reverse=True):
        if w.endswith(d):
            # remove the FIRST letter of the doubled pair
            return w[: len(w) - len(d)] + d[1:]
    return w


_HU_CASE = (
    "ban", "ben", "ba", "be", "ra", "re", "nak", "nek", "val", "vel",
    "tól", "től", "ról", "ről", "ból", "ből", "hoz", "hez", "höz",
    "nál", "nél", "ig", "at", "et", "ot", "öt", "ért", "képp",
    "képpen", "kor", "ul", "ül", "vá", "vé", "onként", "enként",
    "anként", "ként", "en", "on", "an", "ön", "n", "t",
)
_HU_CASE_SPECIAL = {"én": "e", "án": "a", "ánként": "a"}
_HU_CASE_OTHER = {
    "astul": "", "estül": "", "ástul": "a", "éstül": "e",
    "stul": "", "stül": "",
}
# tables decoded entry-by-entry (with their branch codes) from the
# among structs inside dict_snowball.so, then behavior-verified via
# the live oracle. Notable: owned has NO 'áé' entry ('é' deletes and
# sing_owner's 'á'→a finishes the job), sing_owner DOES carry 'é'→e
# (reachable only when owned's longest match fails its R1 test, e.g.
# 'faké'→'fake'), and the 'tok' owner forms exist only with back
# vowels ('aitok'/'áitok' but 'eitek'/'éitek').
_HU_OWNED = {
    "éi": "", "áéi": "a", "ééi": "e",
    "é": "", "ké": "", "aké": "", "eké": "", "oké": "", "öké": "",
    "áké": "a", "éké": "e", "éé": "e",
}
_HU_SING_OWNER = {
    "a": "", "ja": "", "d": "", "ad": "", "ed": "", "od": "",
    "ád": "a", "éd": "e", "öd": "",
    "e": "", "je": "",
    "nk": "", "unk": "", "ánk": "a", "énk": "e", "ünk": "",
    "uk": "", "juk": "", "ájuk": "a",
    "ük": "", "jük": "", "éjük": "e",
    "m": "", "am": "", "em": "", "om": "", "ám": "a", "ém": "e",
    "o": "", "á": "a", "é": "e",
}
_HU_PLUR_OWNER = {
    "id": "", "aid": "", "jaid": "", "eid": "", "jeid": "",
    "áid": "a", "éid": "e",
    "i": "", "ai": "", "jai": "", "ei": "", "jei": "",
    "ái": "a", "éi": "e",
    "itek": "", "eitek": "", "jeitek": "", "éitek": "e",
    "ik": "", "aik": "", "jaik": "", "eik": "", "jeik": "",
    "áik": "a", "éik": "e",
    "ink": "", "aink": "", "jaink": "", "eink": "", "jeink": "",
    "áink": "a", "éink": "e",
    "aitok": "", "jaitok": "", "áitok": "a",
    "im": "", "aim": "", "jaim": "", "eim": "", "jeim": "",
    "áim": "a", "éim": "e",
}
_HU_PLURAL = {
    "ák": "a", "ék": "e", "ök": "", "ok": "", "ek": "", "ak": "",
    "k": "",
}


def hungarian_stem(word: str) -> str:
    w = word.lower()
    r1 = _hu_r1(w)

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def apply(cur: str, table: dict[str, str]) -> tuple[str, bool]:
        """Plain backwardmode among: commit to the LONGEST matching
        suffix; its R1 failure fails the whole step (no fallback)."""
        for suf in sorted(table, key=len, reverse=True):
            if cur.endswith(suf):
                pos = len(cur) - len(suf)
                if not in_r1(pos):
                    return cur, False
                return cur[:pos] + table[suf], True
        return cur, False

    # instrumental: al/el in R1, preceded by a double consonant →
    # delete + undouble
    for suf in ("al", "el"):
        if w.endswith(suf) and in_r1(len(w) - 2):
            head = w[:-2]
            if any(head.endswith(d) for d in _HU_DOUBLE):
                w = _hu_undouble(head)
            break

    # case endings, then v_ending (final á→a / é→e, in R1)
    w, fired = apply(w, {s: "" for s in _HU_CASE})
    if fired:
        if w.endswith("á") and in_r1(len(w) - 1):
            w = w[:-1] + "a"
        elif w.endswith("é") and in_r1(len(w) - 1):
            w = w[:-1] + "e"

    w, _ = apply(w, _HU_CASE_SPECIAL)
    w, _ = apply(w, _HU_CASE_OTHER)

    # factive á/é in R1 preceded by double consonant → delete+undouble
    for suf in ("á", "é"):
        if w.endswith(suf) and in_r1(len(w) - 1):
            head = w[:-1]
            if any(head.endswith(d) for d in _HU_DOUBLE):
                w = _hu_undouble(head)
            break

    w, _ = apply(w, _HU_OWNED)
    w, _ = apply(w, _HU_SING_OWNER)
    w, _ = apply(w, _HU_PLUR_OWNER)
    w, _ = apply(w, _HU_PLURAL)
    return w


EXTRA_STEMMERS = {
    "romanian": romanian_stem,
    "hungarian": hungarian_stem,
}

# ISO-639-1 codes for stemmer.stem() dispatch
EXTRA_CODES = {
    "ro": romanian_stem,
    "hu": hungarian_stem,
}
