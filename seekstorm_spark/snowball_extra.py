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




# ---------------------------------------------------------------------------
# Finnish
# ---------------------------------------------------------------------------

_FI_V = "aeiouyäö"          # v: full vowel set
_FI_V1 = "aeiouäö"          # restricted vowels (no y)
_FI_LV = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")  # long vowels

_FI_PARTICLES = ("kään", "kaan", "han", "hän", "kin", "ko", "kö",
                 "pa", "pä")
_FI_AN_PRE = ("ta", "ssa", "sta", "lla", "lta", "na")
_FI_AN_PRE_F = ("tä", "ssä", "stä", "llä", "ltä", "nä")
_FI_EN_PRE = ("lle", "ine")
_FI_CASE_PLAIN = (
    "lla", "llä", "na", "nä", "ssa", "ssä", "ta", "tä", "lta", "ltä",
    "sta", "stä", "lle", "ine", "ksi",
)
_FI_HARMONY = {"han": "a", "hen": "e", "hin": "i", "hon": "o",
               "hän": "ä", "hön": "ö"}


def finnish_stem(word: str) -> str:
    w = word.lower()
    r1, r2 = _r1_r2(w, _FI_V)

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # --- step 1: particles etc (R1-limited matching) ---
    s1 = sorted(set(_FI_PARTICLES) | {"sti"}, key=len, reverse=True)
    for suf in s1:
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if not in_r1(pos):
            continue
        if suf == "sti":
            if in_r2(pos):
                w = w[:pos]
            break
        if pos > 0 and (w[pos - 1] in "nt" or w[pos - 1] in _FI_V):
            w = w[:pos]
        break

    # --- step 2: possessives (R1) ---
    for suf in sorted(
        ("si", "ni", "nsa", "nsä", "mme", "nne", "an", "än", "en"),
        key=len, reverse=True,
    ):
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if not in_r1(pos):
            continue
        if suf == "si":
            if not (pos > 0 and w[pos - 1] == "k"):
                w = w[:pos]
        elif suf == "ni":
            w = w[:pos]
            if w.endswith("kse"):
                w = w[:-1] + "i"
        elif suf == "an":
            if any(w[:pos].endswith(p) for p in _FI_AN_PRE):
                w = w[:pos]
        elif suf == "än":
            if any(w[:pos].endswith(p) for p in _FI_AN_PRE_F):
                w = w[:pos]
        elif suf == "en":
            if any(w[:pos].endswith(p) for p in _FI_EN_PRE):
                w = w[:pos]
        else:
            w = w[:pos]
        break

    # --- step 3: cases (R1) ---
    ending_removed = False
    s3 = sorted(
        set(_FI_CASE_PLAIN) | set(_FI_HARMONY) | {
            "seen", "siin", "den", "tten", "tta", "ttä", "a", "ä", "n",
        },
        key=len, reverse=True,
    )
    # among semantics here follow the compiled sub_i fallback chains:
    # a failed CONDITION falls back to the longest proper-suffix entry
    # ('siin' with no Vi before it falls back to 'n'; 'tta' without a
    # preceding 'e' falls back to 'ta') — hence continue, not break
    for suf in s3:
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if not in_r1(pos):
            continue
        if suf in _FI_HARMONY:
            # harmony test lives in the BRANCH (fn=False in the
            # compiled among): failure ends the step, no fallback
            if not (pos > 0 and w[pos - 1] == _FI_HARMONY[suf]):
                break
            w = w[:pos]
            ending_removed = True
        elif suf in ("siin", "den", "tten"):
            # preceded by Vi (restricted vowel + i)
            if not (
                pos >= 2
                and w[pos - 1] == "i"
                and w[pos - 2] in _FI_V1
            ):
                continue
            w = w[:pos]
            ending_removed = True
        elif suf == "seen":
            if not (pos >= 2 and w[pos - 2:pos] in _FI_LV):
                continue
            w = w[:pos]
            ending_removed = True
        elif suf in ("tta", "ttä"):
            if not (pos > 0 and w[pos - 1] == "e"):
                break
            w = w[:pos]
            ending_removed = True
        elif suf in ("a", "ä"):
            # preceded by cv (consonant, then any FULL-set vowel —
            # 'y' counts here: oracle 'elkvya' → 'elkvy')
            if not (
                pos >= 2
                and w[pos - 1] in _FI_V
                and w[pos - 2] not in _FI_V
            ):
                break
            w = w[:pos]
            ending_removed = True
        elif suf == "n":
            w = w[:pos]
            ending_removed = True
            if w.endswith("ie") or w[-2:] in _FI_LV:
                w = w[:-1]
        else:
            w = w[:pos]
            ending_removed = True
        break

    # --- step 4: other endings (R2) ---
    s4 = sorted(
        ("mpi", "mpa", "mpä", "mmi", "mma", "mmä",
         "impi", "impa", "impä", "immi", "imma", "immä",
         "eja", "ejä"),
        key=len, reverse=True,
    )
    for suf in s4:
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if not in_r2(pos):
            continue
        if suf in ("mpi", "mpa", "mpä", "mmi", "mma", "mmä"):
            if not w[:pos].endswith("po"):
                w = w[:pos]
        else:
            w = w[:pos]
        break

    # --- step 5: plurals ---
    if ending_removed:
        if w and w[-1] in "ij" and in_r1(len(w) - 1):
            w = w[:-1]
    else:
        if (
            w.endswith("t")
            and in_r1(len(w) - 1)
            and len(w) >= 2
            and w[-2] in _FI_V
        ):
            w = w[:-1]
            for suf in ("imma", "mma"):
                if w.endswith(suf) and in_r2(len(w) - len(suf)):
                    if suf == "mma" and w[: len(w) - 3].endswith("po"):
                        break
                    w = w[: len(w) - len(suf)]
                    break

    # --- step 6: tidy ---
    # a) R1 ends with a long vowel → remove the last letter
    if len(w) >= 2 and w[-2:] in _FI_LV and in_r1(len(w) - 2):
        w = w[:-1]
    # b) R1 ends with consonant + one of a/ä/e/i → remove last letter
    if (
        len(w) >= 2
        and w[-1] in "aäei"
        and w[-2] not in _FI_V
        and in_r1(len(w) - 2)
    ):
        w = w[:-1]
    # c) R1 ends oj / uj → remove the j
    if len(w) >= 2 and w[-1] == "j" and w[-2] in "ou" and in_r1(len(w) - 2):
        w = w[:-1]
    # d) R1 ends jo → remove the o
    if len(w) >= 2 and w[-1] == "o" and w[-2] == "j" and in_r1(len(w) - 2):
        w = w[:-1]
    # e) word ends double consonant + zero or more vowels → remove the
    # second consonant of the pair (not region-limited)
    i = len(w)
    while i > 0 and w[i - 1] in _FI_V:
        i -= 1
    if i >= 2 and w[i - 1] == w[i - 2] and w[i - 1] not in _FI_V:
        w = w[: i - 1] + w[i:]
    return w


# ---------------------------------------------------------------------------
# English (Porter2 — the reference's StemmerType::English; our
# stemmer.py 'en' remains the original 1980 Porter = StemmerType::Porter)
# ---------------------------------------------------------------------------

_EN_V = "aeiouy"
_EN_DOUBLE = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_EN_LI = "cdeghkmnrt"
_EN_EXCEPTIONS = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EN_EXCEPTIONS_1A = frozenset(
    ("inning", "outing", "canning", "herring", "earring", "proceed",
     "exceed", "succeed")
)
_EN_STEP2 = {
    "ational": "ate", "tional": "tion", "enci": "ence", "anci": "ance",
    "abli": "able", "entli": "ent", "izer": "ize", "ization": "ize",
    "ational_": "", "ation": "ate", "ator": "ate", "alism": "al",
    "aliti": "al", "alli": "al", "fulness": "ful", "ousli": "ous",
    "ousness": "ous", "iveness": "ive", "iviti": "ive",
    "biliti": "ble", "bli": "ble", "fulli": "ful", "lessli": "less",
}
_EN_STEP3 = {
    "ational": "ate", "tional": "tion", "alize": "al", "icate": "ic",
    "iciti": "ic", "ical": "ic", "ful": "", "ness": "",
}
_EN_STEP4 = (
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
    "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic",
)


def _en_is_vowel(w: str, i: int) -> bool:
    return w[i] in "aeiouy"


def _en_short_syllable(w: str, end: int) -> bool:
    """True iff w[:end] ends in a short syllable: (a) non-vowel +
    vowel + non-vowel(not w/x/Y), or (b) vowel + non-vowel at the
    word's start."""
    if end >= 3:
        a, b, c = w[end - 3], w[end - 2], w[end - 1]
        if (
            b in "aeiouy"
            and a not in "aeiouy"
            and c not in "aeiouy"
            and c not in "wxY"
        ):
            return True
    if end == 2 and w[0] in "aeiouy" and w[1] not in "aeiouy":
        return True
    return False


def porter2_stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w
    if w.startswith("'"):
        w = w[1:]
    if w in _EN_EXCEPTIONS:
        return _EN_EXCEPTIONS[w]
    # mark consonant-y
    chars = list(w)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in "aeiouy":
            chars[i] = "Y"
    w = "".join(chars)

    # R1 (special prefixes gener-/commun-/arsen- cap it); R2 is then
    # computed CONTINUING from R1 (english.sbl mark_regions), so the
    # prefix exception shifts both regions ('generous' keeps 'ous')
    r1 = None
    for pre in ("gener", "commun", "arsen"):
        if w.startswith(pre):
            r1 = len(pre)
            break
    if r1 is None:
        r1, _ = _r1_r2(w, _EN_V)

    def _after_vc(start: int) -> int:
        i, nn = start, len(w)
        while i < nn and w[i] not in _EN_V:
            i += 1
        while i < nn and w[i] in _EN_V:
            i += 1
        return min(i + 1, nn) if i < nn else nn

    r2 = _after_vc(r1)

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # step 0
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: len(w) - len(suf)]
            break

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-3] + ("i" if len(w) > 4 else "ie")
    elif w.endswith(("ss", "us")):
        pass
    elif w.endswith("s"):
        if any(c in "aeiouy" for c in w[:-2]):
            w = w[:-1]

    if w in _EN_EXCEPTIONS_1A:
        return w.lower()

    # step 1b
    ed_like = None
    for suf in ("eedly", "ingly", "edly", "eed", "ing", "ed"):
        if w.endswith(suf):
            ed_like = suf
            break
    if ed_like in ("eed", "eedly"):
        if in_r1(len(w) - len(ed_like)):
            w = w[: len(w) - len(ed_like)] + "ee"
    elif ed_like is not None:
        stem_part = w[: len(w) - len(ed_like)]
        if any(c in "aeiouy" for c in stem_part):
            w = stem_part
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif w.endswith(_EN_DOUBLE):
                w = w[:-1]
            elif r1 >= len(w) and _en_short_syllable(w, len(w)):
                w = w + "e"

    # step 1c: y/Y → i after a non-vowel that is not the first letter
    if (
        len(w) > 2
        and w[-1] in "yY"
        and w[-2] not in "aeiouy"
    ):
        w = w[:-1] + "i"

    # step 2 (R1)
    s2 = sorted(
        [k for k in _EN_STEP2 if k != "ational_"] + ["ogi", "li"],
        key=len, reverse=True,
    )
    for suf in s2:
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if not in_r1(pos):
            break
        if suf == "ogi":
            if pos > 0 and w[pos - 1] == "l":
                w = w[:pos] + "og"
        elif suf == "li":
            if pos > 0 and w[pos - 1] in _EN_LI:
                w = w[:pos]
        else:
            w = w[:pos] + _EN_STEP2[suf]
        break

    # step 3 (R1; 'ative' needs R2)
    for suf in sorted(list(_EN_STEP3) + ["ative"], key=len, reverse=True):
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if not in_r1(pos):
            break
        if suf == "ative":
            if in_r2(pos):
                w = w[:pos]
        else:
            w = w[:pos] + _EN_STEP3[suf]
        break

    # step 4 (R2)
    for suf in sorted(_EN_STEP4, key=len, reverse=True):
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if not in_r2(pos):
            break
        if suf == "ion":
            if pos > 0 and w[pos - 1] in "st":
                w = w[:pos]
        else:
            w = w[:pos]
        break

    # step 5
    if w.endswith("e"):
        pos = len(w) - 1
        if in_r2(pos) or (
            in_r1(pos) and not _en_short_syllable(w, pos)
        ):
            w = w[:pos]
    elif w.endswith("l"):
        pos = len(w) - 1
        if in_r2(pos) and pos > 0 and w[pos - 1] == "l":
            w = w[:pos]

    return w.lower()




# ---------------------------------------------------------------------------
# Irish
# ---------------------------------------------------------------------------

_GA_V = "aeiouáéíóú"
# initial mutations (forward prelude): eclipsis/lenition prefixes →
# their radical (decoded from dict_snowball.so; e.g. bhf→f, gc→c)
_GA_INITIAL = {
    "b'": "", "bhf": "f", "bh": "b", "bp": "p", "ch": "c",
    "d'fh": "f", "d'": "", "dh": "d", "dt": "t", "fh": "f",
    "gc": "c", "gh": "g", "h-": "", "m'": "", "mb": "b", "mh": "m",
    "n-": "", "nd": "d", "ng": "g", "ph": "p", "sh": "s", "t-": "",
    "th": "t", "ts": "s",
}
_GA_NOUN = {
    "amh": "", "eamh": "", "abh": "", "eabh": "", "ibh": "",
    "aibh": "", "imh": "", "aimh": "", "íocht": "", "aíocht": "",
    "íochta": "", "aíochta": "",
    "ire": "", "aire": "", "irí": "", "airí": "",
}
_GA_NOUN_R2 = frozenset(("ire", "aire", "irí", "airí"))
_GA_DERIV = {
    "acht": "", "eacht": "", "ach": "", "each": "", "achta": "",
    "eachta": "", "achtúil": "", "eachtúil": "",
    "arcacht": "arc", "arcachta": "arc", "arcachtaí": "arc",
    "gineach": "gin", "gineas": "gin", "ginis": "gin",
    "grafaíoch": "graf", "grafaíocht": "graf", "grafaíochta": "graf",
    "grafaíochtaí": "graf",
    "paite": "paite", "patach": "paite", "patacha": "paite",
    "pataigh": "paite",
    "óideach": "óid", "óideacha": "óid", "óidigh": "óid",
}
_GA_VERB = {
    "imid": "", "aimid": "", "ímid": "", "aímid": "",
    "tear": "", "tar": "",
    "adh": "", "eadh": "", "áil": "", "ain": "",
    "faidh": "", "fidh": "",
}
# per-entry region requirement (fit against the oracle)
_GA_VERB_R1 = frozenset(("imid", "aimid", "ímid", "aímid", "tear", "tar"))


def irish_stem(word: str) -> str:
    w = word.lower()
    for pre in sorted(_GA_INITIAL, key=len, reverse=True):
        if w.startswith(pre) and (
            _GA_INITIAL[pre] or len(w) > len(pre)
        ):
            w = _GA_INITIAL[pre] + w[len(pre):]
            break
    r1, r2 = _r1_r2(w, _GA_V)

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # noun suffixes (delete; -ire family needs R2, the rest R1)
    for suf in sorted(_GA_NOUN, key=len, reverse=True):
        if w.endswith(suf):
            pos = len(w) - len(suf)
            need = in_r2(pos) if suf in _GA_NOUN_R2 else in_r1(pos)
            if need:
                w = w[:pos]
            break

    # derivational (R2; named-stem replacements unconditional?)
    for suf in sorted(_GA_DERIV, key=len, reverse=True):
        if w.endswith(suf):
            pos = len(w) - len(suf)
            rep = _GA_DERIV[suf]
            if rep:
                w = w[:pos] + rep
            elif in_r2(pos):
                w = w[:pos]
            break

    # verb suffixes (R1)
    for suf in sorted(_GA_VERB, key=len, reverse=True):
        if w.endswith(suf):
            pos = len(w) - len(suf)
            if in_r1(pos):
                w = w[:pos]
            break
    return w


# ---------------------------------------------------------------------------
# Armenian (tables decoded from dict_snowball.so; all actions delete)
# ---------------------------------------------------------------------------

_HY_VOWELS = "աեէըիոուօւ"
_HY_CASE = (
    "եր", "ներ", "ց", "ուց", "ից", "երից",
    "ներից", "ցից", "վանից", "ոջից", "վից", "ոց",
    "սա", "վա", "ամբ", "դ", "երդ", "ներդ",
    "ուդ", "անդ", "ությանդ", "վանդ", "ոջդ", "ը",
    "երը", "ները", "անը", "ությանը", "վանը", "ոջը",
    "ի", "երի", "ների", "վի", "երում", "ներում",
    "անում", "ն", "երն", "ներն", "ուն", "ան",
    "ության", "վան", "ին", "երին", "ներին", "ությանն",
    "ոջ", "ությանս", "վանս", "ոջս", "ով", "երով",
    "ներով", "անով", "վով",
)

_HY_VERB = (
    "ար", "ացար", "եցար", "ացրիր", "ացիր", "եցիր",
    "վեցիր", "ալուց", "ելուց", "աց", "եց", "ացրեց",
    "ալու", "ելու", "աք", "ցաք", "ացաք", "ացրիք",
    "ացիք", "եցիք", "վեցիք", "անք", "ցանք", "ացանք",
    "ացրինք", "ացինք", "եցինք", "վեցինք", "ա", "ացա",
    "եցա", "վե", "ացրի", "ացի", "եցի", "վեցի",
    "ալ", "ըալ", "ացնալ", "անալ", "ենալ", "ել",
    "ըել", "նել", "ցնել", "եցնել", "չել", "վել",
    "ացվել", "եցվել", "տել", "ատել", "ոտել", "կոտել",
    "ված", "ում", "վում", "ան", "ցան", "ացան",
    "ացրին", "ացին", "եցին", "վեցին", "ալիս", "ելիս",
    "ավ", "ացավ", "եցավ", "ալով", "ելով",
)

_HY_ADJ = (
    "բար", "րորդ", "երորդ", "ալի", "ակի", "որակ",
    "եղ", "վուն", "արան", "ական", "են", "երեն",
    "եկեն", "որէն", "ին", "գին", "ովին", "լայն",
    "պես", "իվ", "ատ", "ավետ", "կոտ",
)

_HY_NOUN = (
    "գար", "վոր", "ավոր", "անօց", "ոց", "ու",
    "ք", "արք", "չեք", "իք", "ալիք", "անիք",
    "վածք", "ույք", "ունք", "մունք", "ենք", "ոնք",
    "իչք", "որդ", "ույթ", "ցի", "ուհի", "իլ",
    "ուկ", "ակ", "յակ", "անակ", "իկ", "յուն",
    "ություն", "ան", "արան", "պան", "ստան", "եղէն",
    "ածո", "իչ", "ուս", "ուստ",
)


def armenian_stem(word: str) -> str:
    w = word.lower()
    # oracle-fit regions: the CASE among runs in the standard VC-based
    # R2; verb/adjective/noun amongs in a pV region (after the FIRST
    # vowel). All four fall back to shorter entries on region failure.
    _r1_vc, r2_vc = _r1_r2(w, _HY_VOWELS)
    pv = len(w)
    for i, c in enumerate(w):
        if c in _HY_VOWELS:
            pv = i + 1
            break

    def cut(cur: str, table: tuple, bound: int) -> str:
        for suf in sorted(table, key=len, reverse=True):
            if cur.endswith(suf):
                pos = len(cur) - len(suf)
                if pos >= bound:
                    return cur[:pos]
                continue
        return cur

    w = cut(w, _HY_CASE, r2_vc)
    w = cut(w, _HY_VERB, pv)
    w = cut(w, _HY_ADJ, pv)
    w = cut(w, _HY_NOUN, pv)
    return w


# ---------------------------------------------------------------------------
# Catalan (tables decoded from dict_snowball.so; semantics fit
# against the oracle — standard/residual amongs FALL BACK to shorter
# entries on region failure, unlike Romanian's commit-style steps)
# ---------------------------------------------------------------------------

_CA_VOWELS = "aeiouàáèéíòóúüï"
_CA_PRON = (
    'la', '-la', 'sela', 'le', 'me', '-me',
    'se', '-te', 'hi', "'hi", 'li', '-li',
    "'l", "'m", '-m', "'n", '-n', 'ho',
    "'ho", 'lo', 'selo', "'s", 'las', 'selas',
    'les', '-les', "'ls", '-ls', "'ns", '-ns',
    'ens', 'los', 'selos', 'nos', '-nos', 'vos',
    'us', '-us', "'t",
)

_CA_STD = {
    "ica": 4, "lógica": 3, "enca": 1, "ada": 2,
    "ancia": 1, "encia": 1, "ència": 1, "ícia": 1,
    "logia": 3, "inia": 1, "íinia": 1, "eria": 1,
    "ària": 1, "atòria": 1, "alla": 1, "ella": 1,
    "ívola": 1, "ima": 1, "íssima": 1, "quíssima": 5,
    "ana": 1, "ina": 1, "era": 1, "sfera": 1,
    "ora": 1, "dora": 1, "adora": 1, "adura": 1,
    "esa": 1, "osa": 1, "assa": 1, "essa": 1,
    "issa": 1, "eta": 1, "ita": 1, "ota": 1,
    "ista": 1, "ialista": 1, "ionista": 1, "iva": 1,
    "ativa": 1, "nça": 1, "logía": 3, "ic": 4,
    "ístic": 1, "enc": 1, "esc": 1, "ud": 1,
    "atge": 1, "ble": 1, "able": 1, "ible": 1,
    "isme": 1, "ialisme": 1, "ionisme": 1, "ivisme": 1,
    "aire": 1, "icte": 1, "iste": 1, "ici": 1,
    "íci": 1, "logi": 3, "ari": 1, "tori": 1,
    "al": 1, "il": 1, "all": 1, "ell": 1,
    "ívol": 1, "isam": 1, "issem": 1, "ìssem": 1,
    "íssem": 1, "íssim": 1, "quíssim": 5, "amen": 1,
    "ìssin": 1, "ar": 1, "ificar": 1, "egar": 1,
    "ejar": 1, "itar": 1, "itzar": 1, "fer": 1,
    "or": 1, "dor": 1, "dur": 1, "doras": 1,
    "ics": 4, "lógics": 3, "uds": 1, "nces": 1,
    "ades": 2, "ancies": 1, "encies": 1, "ències": 1,
    "ícies": 1, "logies": 3, "inies": 1, "ínies": 1,
    "eries": 1, "àries": 1, "atòries": 1, "bles": 1,
    "ables": 1, "ibles": 1, "imes": 1, "íssimes": 1,
    "quíssimes": 5, "formes": 1, "ismes": 1, "ialismes": 1,
    "ines": 1, "eres": 1, "ores": 1, "dores": 1,
    "idores": 1, "dures": 1, "eses": 1, "oses": 1,
    "asses": 1, "ictes": 1, "ites": 1, "otes": 1,
    "istes": 1, "ialistes": 1, "ionistes": 1, "iques": 4,
    "lógiques": 3, "ives": 1, "atives": 1, "logíes": 3,
    "allengües": 1, "icis": 1, "ícis": 1, "logis": 3,
    "aris": 1, "toris": 1, "ls": 1, "als": 1,
    "ells": 1, "ims": 1, "íssims": 1, "quíssims": 5,
    "ions": 1, "cions": 1, "acions": 2, "esos": 1,
    "osos": 1, "assos": 1, "issos": 1, "ers": 1,
    "ors": 1, "dors": 1, "adors": 1, "idors": 1,
    "ats": 1, "itats": 1, "bilitats": 1, "ivitats": 1,
    "ativitats": 1, "ïtats": 1, "ets": 1, "ants": 1,
    "ents": 1, "ments": 1, "aments": 1, "ots": 1,
    "uts": 1, "ius": 1, "trius": 1, "atius": 1,
    "ès": 1, "és": 1, "ís": 1, "dís": 1,
    "ós": 1, "itat": 1, "bilitat": 1, "ivitat": 1,
    "ativitat": 1, "ïtat": 1, "et": 1, "ant": 1,
    "ent": 1, "ient": 1, "ment": 1, "ament": 1,
    "isament": 1, "ot": 1, "isseu": 1, "ìsseu": 1,
    "ísseu": 1, "triu": 1, "íssiu": 1, "atiu": 1,
    "ó": 1, "ió": 1, "ció": 1, "ació": 1,
}

_CA_VERB = (
    "ada", "ida", "uda", "ïda", "ia", "aria",
    "iria", "ara", "iera", "ira", "adora", "ïra",
    "ava", "ixa", "itza", "ía", "aría", "ería",
    "iría", "ïa", "isc", "ïsc", "ad", "ed",
    "id", "ie", "re", "dre", "ase", "iese",
    "aste", "iste", "ii", "ini", "esqui", "eixi",
    "itzi", "am", "em", "arem", "irem", "àrem",
    "írem", "àssem", "éssem", "iguem", "ïguem", "avem",
    "àvem", "ávem", "irìem", "íem", "aríem", "iríem",
    "assim", "essim", "issim", "àssim", "èssim", "éssim",
    "íssim", "ïm", "an", "aban", "arian", "aran",
    "ieran", "iran", "ían", "arían", "erían", "irían",
    "en", "ien", "arien", "irien", "aren", "eren",
    "iren", "àren", "ïren", "asen", "iesen", "assen",
    "essen", "issen", "éssen", "ïssen", "esquen", "isquen",
    "ïsquen", "aven", "ixen", "eixen", "ïxen", "ïen",
    "in", "inin", "sin", "isin", "assin", "essin",
    "issin", "ïssin", "esquin", "eixin", "aron", "ieron",
    "arán", "erán", "irán", "iïn", "ado", "ido",
    "ando", "iendo", "io", "ixo", "eixo", "ïxo",
    "itzo", "ar", "tzar", "er", "eixer", "ir",
    "ador", "as", "abas", "adas", "idas", "aras",
    "ieras", "ías", "arías", "erías", "irías", "ids",
    "es", "ades", "ides", "udes", "ïdes", "atges",
    "ies", "aries", "iries", "ares", "ires", "adores",
    "ïres", "ases", "ieses", "asses", "esses", "isses",
    "ïsses", "ques", "esques", "ïsques", "aves", "ixes",
    "eixes", "ïxes", "ïes", "abais", "arais", "ierais",
    "íais", "aríais", "eríais", "iríais", "aseis", "ieseis",
    "asteis", "isteis", "inis", "sis", "isis", "assis",
    "essis", "issis", "ïssis", "esquis", "eixis", "itzis",
    "áis", "aréis", "eréis", "iréis", "ams", "ados",
    "idos", "amos", "ábamos", "áramos", "iéramos", "íamos",
    "aríamos", "eríamos", "iríamos", "aremos", "eremos", "iremos",
    "ásemos", "iésemos", "imos", "adors", "ass", "erass",
    "ess", "ats", "its", "ents", "às", "aràs",
    "iràs", "arás", "erás", "irás", "és", "arés",
    "ís", "iïs", "at", "it", "ant", "ent",
    "int", "ut", "ït", "au", "erau", "ieu",
    "ineu", "areu", "ireu", "àreu", "íreu", "asseu",
    "esseu", "eresseu", "àsseu", "ésseu", "igueu", "ïgueu",
    "àveu", "áveu", "itzeu", "ìeu", "irìeu", "íeu",
    "aríeu", "iríeu", "assiu", "issiu", "àssiu", "èssiu",
    "éssiu", "íssiu", "ïu", "ix", "eix", "ïx",
    "itz", "ià", "arà", "irà", "itzà", "ará",
    "erá", "irá", "irè", "aré", "eré", "iré",
    "í", "iï", "ió",
)

# residual endings (delete unless mapped); probe-extracted — entries
# that actually live in the verb among (es/as/au/in/itz) are excluded
_CA_RESID = {
    "a": "", "e": "", "i": "", "o": "", "à": "", "á": "", "é": "",
    "í": "", "ì": "", "ó": "", "s": "", "is": "",
    "os": "", "ès": "", "eu": "", "iu": "",
    "ï": "", "ïn": "", "ïs": "", "iqu": "ic",
    "els": "",
}
_CA_CLEAN = str.maketrans({
    "à": "a", "á": "a", "è": "e", "é": "e", "ì": "i", "í": "i",
    "ï": "i", "ò": "o", "ó": "o", "ú": "u", "ü": "u", "·": ".",
})


def catalan_stem(word: str) -> str:
    w = word.lower()
    r1, r2 = _r1_r2(w, _CA_VOWELS)

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # attached pronouns (R1? fall back on region failure)
    for suf in sorted(_CA_PRON, key=len, reverse=True):
        if w.endswith(suf):
            pos = len(w) - len(suf)
            if not in_r1(pos):
                continue
            w = w[:pos]
            break

    # standard OR verb (catalan.sbl: `do(standard_suffix or
    # verb_suffix)`): each among COMMITS to its longest match — a
    # region failure fails that among (no fallback), letting the
    # `or` try the verb table. Classes: 1/2 delete R1; 3 'log' R2;
    # 4 'ic' R1; 5 'c' R1 (quíssim family).
    changed = False
    for suf in sorted(_CA_STD, key=len, reverse=True):
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        cls = _CA_STD[suf]
        if cls == 3:
            if in_r2(pos):
                w = w[:pos] + "log"
                changed = True
        elif cls == 4:
            if in_r1(pos):
                w = w[:pos] + "ic"
                changed = True
        elif cls == 5:
            if in_r1(pos):
                w = w[:pos] + "c"
                changed = True
        else:
            if in_r1(pos):
                w = w[:pos]
                changed = True
        break

    if not changed:
        for suf in sorted(set(_CA_VERB), key=len, reverse=True):
            if w.endswith(suf):
                pos = len(w) - len(suf)
                if in_r1(pos):
                    w = w[:pos]
                break

    # residual endings (R1; falls back to shorter entries when the
    # longest match sits outside R1 — 'tmméuels' drops only its 's')
    for suf in sorted(_CA_RESID, key=len, reverse=True):
        if w.endswith(suf):
            pos = len(w) - len(suf)
            if not in_r1(pos):
                continue
            w = w[:pos] + _CA_RESID[suf]
            break

    # cleaning: de-accent everywhere
    return w.translate(_CA_CLEAN)


# ---------------------------------------------------------------------------
# Hindi
# ---------------------------------------------------------------------------
# Snowball 'hindi' (A. Ramanathan & D. Rao's lightweight stemmer as
# adopted by Snowball): ONE suffix among (132 entries, decoded from
# dict_snowball.so via scripts/decode_snowball_tables.py), all-delete.
# The stem() routine advances one character before entering backwards
# mode, so the FIRST character is protected: a suffix may never
# consume it, and the consonant precondition fails at that limit
# (oracle: 'सता' -> 'सत', not 'स', even though स IS a consonant).

# consonant grouping (oracle-probed): क..ह, nukta, क़..य़
_HI_CONS = frozenset(
    [chr(c) for c in range(0x0915, 0x093A)]
    + ["़"]
    + [chr(c) for c in range(0x0958, 0x0960)]
)

# suffix try order: longest-first; the among fallback chain ==
# nested-suffix order, so a longest-first scan with condition skip
# reproduces find_among_b exactly. All 132 entries delete.
_HI_TRY = [
    "अताएं", "अताओं", "अनाएं", "अनाओं", "आइयाँ", "आइयां", "आइयों",
    "आऊंगा", "आऊंगी", "आएंगी", "आएंगे", "ाइयाँ", "ाइयां", "ाइयों",
    "ाऊंगा", "ाऊंगी", "ाएंगी", "ाएंगे", "अतीं", "आएगा", "आएगी", "आओगी",
    "आओगे", "आतीं", "इयाँ", "इयां", "इयों", "ऊंगा", "ऊंगी", "एंगी",
    "एंगे", "ताएं", "ताओं", "नाएं", "नाओं", "ाएगा", "ाएगी", "ाओगी",
    "ाओगे", "ातीं", "ियाँ", "ियां", "ियों", "ूंगा", "ूंगी", "ेंगी",
    "ेंगे", "अकर", "अता", "अती", "अते", "अना", "अनी", "अने", "आइए",
    "आईं", "आएं", "आओं", "आकर", "आता", "आती", "आते", "आना", "आने",
    "आया", "उआं", "उएं", "उओं", "एगा", "एगी", "ओगी", "ओगे", "तीं",
    "ाइए", "ाईं", "ाएं", "ाओं", "ाकर", "ाता", "ाती", "ाते", "ाना",
    "ाने", "ाया", "ुआं", "ुएं", "ुओं", "ेगा", "ेगी", "ोगी", "ोगे",
    "आँ", "आं", "आई", "आए", "आओ", "इए", "ईं", "एं", "ओं", "कर", "ता",
    "ती", "ते", "ना", "नी", "ने", "ाँ", "ां", "ाई", "ाए", "ाओ", "िए",
    "ीं", "ें", "ों", "अ", "आ", "इ", "ई", "उ", "ऊ", "ए", "ओ", "ा", "ि",
    "ी", "ु", "ू", "े", "ो", "्",
]
_HI_NEED_CONS = frozenset((
    "कर", "ता", "ताएं", "ताओं", "ती", "तीं", "ते",
    "ना", "नाएं", "नाओं", "नी", "ने",
))


def hindi_stem(word: str) -> str:
    w = word
    for suf in _HI_TRY:
        pos = len(w) - len(suf)
        if pos < 1 or not w.endswith(suf):
            continue
        if suf in _HI_NEED_CONS:
            # condition inspects the char before the suffix; at the
            # protected limit (pos == 1) the grouping test fails and
            # the among falls through to the next nested suffix
            if pos < 2 or w[pos - 1] not in _HI_CONS:
                continue
        return w[:pos]
    return w


# ---------------------------------------------------------------------------
# Indonesian
# ---------------------------------------------------------------------------
# Snowball 'indonesian' (Tala's CS stemmer as adopted by Snowball;
# tables decoded from dict_snowball.so). measure = vowel count; a
# word is only stemmed while measure > 2. Steps: particle,
# possessive pronoun, then first-order prefix / suffix /
# second-order prefix with combination constraints carried in
# `prefix` (oracle-fit below).

_ID_V = frozenset("aeiou")


def _id_measure(w: str) -> int:
    return sum(1 for ch in w if ch in _ID_V)


def indonesian_stem(word: str) -> str:
    w = word
    if _id_measure(w) <= 2:
        return w
    # particles
    for suf in ("kah", "lah", "pun"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break
    if _id_measure(w) <= 2:
        return w
    # possessive pronouns
    for suf in ("nya", "ku", "mu"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break
    if _id_measure(w) <= 2:
        return w

    # prefix classes (oracle-probed constraint matrix):
    #   1 = di/me(m|n|ng|ny)/ter  -> blocks -an
    #   2 = ke/pe(m|n|ng|ny)     -> blocks -kan and -i
    #   3 = ber/be..er           -> blocks -i
    #   4 = per/pe/pelajar       -> blocks -kan
    # remove_suffix is one among with a kan->an fallback chain; -i is
    # additionally protected after 's' ('-si' never loses its i).
    prefix = 0

    def remove_suffix(w: str, prefix: int) -> tuple[str, bool]:
        if w.endswith("kan"):
            if prefix not in (2, 4):
                return w[:-3], True
            if prefix != 1:  # among fallback: kan -> an
                return w[:-2], True
            return w, False
        if w.endswith("an"):
            if prefix != 1:
                return w[:-2], True
            return w, False
        if w.endswith("i"):
            if prefix not in (2, 3) and not w.endswith("si"):
                return w[:-1], True
            return w, False
        return w, False

    # first-order prefix (longest-match among; meny/peny before a
    # vowel restore 's', mem/pem before a vowel restore 'p'; a
    # failed vowel condition falls back to the men/pen entry)
    fo = False
    restored = False  # s/p restoration leaves the cursor at 1, so the
    # second-order prefix among (which would have to match at that
    # cursor) can never fire afterwards
    if w.startswith("meny") and len(w) > 4 and w[4] in _ID_V:
        w, prefix, fo, restored = "s" + w[4:], 1, True, True
    elif w.startswith("peny") and len(w) > 4 and w[4] in _ID_V:
        w, prefix, fo, restored = "s" + w[4:], 2, True, True
    elif w.startswith("meng"):
        w, prefix, fo = w[4:], 1, True
    elif w.startswith("peng"):
        w, prefix, fo = w[4:], 2, True
    elif w.startswith("mem"):
        prefix, fo = 1, True
        if len(w) > 3 and w[3] in _ID_V:
            w = "p" + w[3:]
            restored = True
        else:
            w = w[3:]
    elif w.startswith("pem"):
        prefix, fo = 2, True
        if len(w) > 3 and w[3] in _ID_V:
            w = "p" + w[3:]
            restored = True
        else:
            w = w[3:]
    elif w.startswith("men"):
        w, prefix, fo = w[3:], 1, True
    elif w.startswith("pen"):
        w, prefix, fo = w[3:], 2, True
    elif w.startswith("me"):
        w, prefix, fo = w[2:], 1, True
    elif w.startswith("di"):
        w, prefix, fo = w[2:], 1, True
    elif w.startswith("ter"):
        w, prefix, fo = w[3:], 1, True
    elif w.startswith("ke"):
        w, prefix, fo = w[2:], 2, True

    if fo:
        # suffix, then (only if a suffix came off) second-order prefix
        if _id_measure(w) > 2:
            w, removed = remove_suffix(w, prefix)
            if removed and not restored and _id_measure(w) > 2:
                w, _ = _id_second_order(w)
        return w

    # no first-order prefix: second-order prefix, then suffix
    w2, p2 = _id_second_order(w)
    if p2 is not None:
        w = w2
        prefix = p2
    if _id_measure(w) > 2:
        w, _ = remove_suffix(w, prefix)
    return w


def _id_second_order(w: str) -> tuple[str, int | None]:
    if w.startswith("belajar"):
        return w[3:], 3
    if w.startswith("ber"):
        return w[3:], 3
    if (
        w.startswith("be")
        and len(w) > 4
        and w[2] not in _ID_V
        and w[3:5] == "er"
    ):
        return w[2:], 3
    if w.startswith("pelajar"):
        return w[3:], 4
    if w.startswith("per"):
        return w[3:], 4
    if w.startswith("pe"):
        return w[2:], 4
    return w, None


# ---------------------------------------------------------------------------
# Nepali
# ---------------------------------------------------------------------------
# Snowball 'nepali' (Shrestha & Dhakal's stemmer as adopted by
# Snowball; reference StemmerType::Nepali, seekstorm/src/index.rs
# language table). Tables + conditions decoded from dict_snowball.so
# (nepali_UTF_8_stem disassembly): one category-1 postposition among
# (17 entries; को/का/की/कै/कि delete only when NOT preceded by ए or
# े), then a loop of {conditional nasal/ै drop, category-3 among}:
# ँ/ं drop only after यौ/छौ/नौ/थे, ै only after त्र; the loop runs
# while the category-3 among keeps deleting. ts_lexize parity: a stem
# that comes out EMPTY returns the original word (postgres wrapper
# semantics; 'भयो', 'थेँ', whole-word suffixes stay unchanged).
# Oracle-verified 0 mismatches on 13k fuzz+real words.

_NE_CAT1 = [
    "मार्फत", "द्वारा", "सँगै", "लाइ", "लाई", "सँग", "संग", "पछि", "की",
    "ले", "कै", "मै", "को", "रत", "का", "मा", "कि",
]
_NE_CAT3 = [
    "नेछस्", "नेछन्", "हुन्छ", "हुनेछ", "थिइस्", "इछस्", "दियो", "थ्यौ",
    "िछस्", "इएका", "इएको", "नेकै", "देखि", "थियो", "िछन्", "छिन्", "होस्",
    "नेछु", "ेछन्", "माथि", "थिन्", "िएकी", "िएको", "इन्छ", "छ्यौ", "नेछौ",
    "थिस्", "ेछस्", "इएकी", "िन्छ", "नेका", "नेको", "िएका", "एछन्", "थ्यो",
    "इछन्", "थियौ", "लान्", "देखी", "एछस्", "छेस्", "एका", "ेछौ", "एको",
    "हरु", "िदो", "ेकै", "इस्", "पर्", "ेछु", "इछौ", "एछौ", "छन्", "एकी",
    "िदै", "इदा", "ेकी", "थिए", "ेको", "भयो", "इदो", "इयो", "हरू", "ेका",
    "एछु", "िस्", "इदै", "ियो", "छस्", "नेछ", "एकै", "िछौ", "िदा", "दो",
    "छे", "नु", "थे", "थी", "यो", "ेछ", "दै", "इछ", "ने", "छौ", "यौ", "दा",
    "छु", "िछ", "एछ", "दी", "छ",
]
_NE_COND1 = frozenset(("को", "का", "की", "कै", "कि"))


def nepali_stem(word: str) -> str:
    w = word
    for suf in _NE_CAT1:
        if w.endswith(suf):
            pre = w[: -len(suf)]
            if suf in _NE_COND1 and pre.endswith(("ए", "े")):
                pass  # among action fails: no fallback to shorter
            else:
                w = pre
            break
    while True:
        if w and w[-1] in "ँंै":
            pre = w[:-1]
            if w[-1] in "ँं":
                if pre.endswith(("यौ", "छौ", "नौ", "थे")):
                    w = pre
            elif pre.endswith("त्र"):
                w = pre
        for suf in _NE_CAT3:
            if w.endswith(suf):
                w = w[: -len(suf)]
                break
        else:
            break
    return word if w == "" else w


# ---------------------------------------------------------------------------
# Basque
# ---------------------------------------------------------------------------
# Snowball 'basque' (reference StemmerType::Basque, seekstorm/src/
# index.rs:641-722 table). Tables + control flow decoded from
# dict_snowball.so (basque_UTF_8_stem disassembly): Spanish-shape RV
# + standard R1/R2 over vowels aeiou, then backwards
# ``repeat A1  repeat A2  do A3`` with a SHARED matching cursor
# (a replacement action protects the inserted text from later
# steps). Case actions per the decoded switch tables @0x64f28 /
# @0x64f40: res 1 = RV-gated delete, 2 = R2, 4 (A2) = R1, others =
# literal replacements. Oracle-verified (scripts/snowball_oracle.py).

_EU_VOWELS = "aeiou"

_EU_A1 = (
    ('arabera', 4), ('atseden', 3), ('tzailea', 1), ('aldatu', 1), 
    ('baditu', 5), ('erreza', 1), ('gailua', 1), ('gaitza', 1), 
    ('garria', 2), ('kaitza', 1), ('karria', 1), ('kizuna', 1), 
    ('kundea', 1), ('kuntza', 1), ('tailea', 1), ('taldia', 1), 
    ('tarazi', 1), ('tezina', 1), ('tzaile', 1), ('aldia', 1), 
    ('arazi', 1), ('bidea', 1), ('errez', 1), ('etari', 1), ('ezina', 1), 
    ('gailu', 1), ('gaitz', 1), ('galea', 1), ('garri', 2), ('gunea', 1), 
    ('kaitz', 1), ('karia', 1), ('karri', 1), ('kidea', 1), ('kizun', 1), 
    ('korra', 1), ('kunde', 1), ('kunea', 1), ('pidea', 1), ('rekin', 1), 
    ('taile', 1), ('taldi', 1), ('tezin', 1), ('tzaga', 1), ('tzaka', 1), 
    ('tzake', 1), ('tzeke', 1), ('aldi', 1), ('atze', 1), ('bera', 1), 
    ('bide', 1), ('dako', 1), ('dura', 1), ('etan', 1), ('ezin', 1), 
    ('gaia', 1), ('gale', 1), ('gune', 1), ('gura', 1), ('idea', 1), 
    ('kari', 1), ('kera', 1), ('keta', 1), ('kide', 1), ('kina', 1), 
    ('kuna', 1), ('kune', 1), ('kura', 1), ('lari', 1), ('mena', 1), 
    ('orra', 1), ('pena', 1), ('pera', 1), ('pide', 1), ('rean', 1), 
    ('tari', 1), ('tatu', 1), ('tuna', 1), ('tura', 1), ('tzat', 1), 
    ('tzez', 1), ('ago', 1), ('ari', 1), ('atu', 1), ('ean', 1), 
    ('era', 1), ('eta', 1), ('eza', 1), ('gai', 1), ('ide', 1), 
    ('kan', 1), ('kin', 1), ('kor', 1), ('men', 1), ('pen', 1), 
    ('tio', 1), ('tun', 1), ('tza', 2), ('tze', 1), ('an', 1), ('du', 1), 
    ('ez', 1), ('go', 1), ('ka', 1), ('ki', 1), ('la', 1), ('le', 1), 
    ('or', 1), ('tu', 1), 
)

_EU_A2 = (
    ('minutuko', 6), ('garrena', 1), ('gerrena', 1), ('aurrea', 1), 
    ('garren', 1), ('garria', 2), ('gerren', 1), ('gibela', 1), 
    ('gintza', 1), ('gintzo', 1), ('gintzu', 1), ('handia', 1), 
    ('kaldea', 1), ('kintza', 1), ('kirria', 1), ('koitza', 1), 
    ('kondoa', 1), ('kuntza', 1), ('larria', 1), ('mendia', 1), 
    ('mendua', 1), ('mentua', 1), ('ontzia', 1), ('taldea', 1), 
    ('taldia', 1), ('tariko', 1), ('tasuna', 1), ('tzaina', 1), 
    ('tzalea', 1), ('tzarra', 1), ('urrena', 1), ('zionea', 1), 
    ('aizun', 1), ('aldea', 1), ('aldia', 1), ('antza', 1), ('artea', 1), 
    ('asuna', 1), ('aurka', 10), ('aurre', 1), ('behar', 1), 
    ('bizia', 1), ('burua', 1), ('degia', 1), ('denda', 1), ('duria', 1), 
    ('durua', 1), ('eroza', 1), ('estua', 1), ('etako', 1), ('etara', 1), 
    ('etxea', 1), ('gabea', 1), ('garna', 1), ('garri', 2), ('geldi', 8), 
    ('gibel', 1), ('gilea', 1), ('gunea', 1), ('handi', 1), ('igaro', 9), 
    ('kabea', 1), ('kaila', 1), ('kalde', 1), ('karia', 1), ('keria', 1), 
    ('kirri', 1), ('koitz', 1), ('kondo', 1), ('korra', 1), ('kotea', 1), 
    ('kumea', 1), ('laria', 1), ('larri', 1), ('lekua', 1), ('liara', 1), 
    ('mendi', 1), ('mendu', 1), ('mentu', 1), ('nahia', 1), ('ondoa', 1), 
    ('ontzi', 1), ('ordea', 1), ('ordua', 1), ('ostea', 1), ('skila', 1), 
    ('takoa', 1), ('talde', 1), ('taldi', 1), ('taria', 1), ('tarik', 1), 
    ('taroa', 1), ('tasun', 1), ('tegia', 1), ('teria', 1), ('tiara', 1), 
    ('tokia', 1), ('trako', 5), ('tzain', 1), ('tzale', 1), ('tzara', 1), 
    ('urren', 1), ('zaina', 1), ('zalea', 1), ('zaroa', 1), ('zehar', 7), 
    ('zinoa', 1), ('zione', 1), ('alde', 1), ('aldi', 1), ('anda', 1), 
    ('anga', 1), ('aria', 1), ('aroa', 1), ('arte', 1), ('asia', 1), 
    ('asun', 1), ('bera', 1), ('buru', 2), ('dara', 1), ('degi', 1), 
    ('duna', 1), ('duri', 1), ('duru', 1), ('egia', 1), ('emea', 1), 
    ('enea', 1), ('eria', 1), ('eroa', 1), ('eroz', 1), ('estu', 1), 
    ('etan', 1), ('etxe', 1), ('ezia', 1), ('gabe', 1), ('gaia', 1), 
    ('geia', 1), ('gela', 1), ('gile', 1), ('giro', 1), ('gune', 1), 
    ('joka', 3), ('kabe', 1), ('kada', 1), ('kail', 1), ('kana', 1), 
    ('kari', 1), ('kera', 1), ('keta', 1), ('kide', 1), ('kina', 1), 
    ('koia', 1), ('kote', 1), ('kume', 1), ('lari', 1), ('leku', 1), 
    ('liar', 1), ('mina', 1), ('nahi', 1), ('ngoa', 1), ('ohia', 1), 
    ('ondo', 1), ('orde', 1), ('ordu', 1), ('oroa', 1), ('osoa', 1), 
    ('oste', 1), ('pera', 1), ('tako', 1), ('tara', 1), ('tari', 1), 
    ('taro', 1), ('tatu', 4), ('tegi', 1), ('tiar', 1), ('tila', 1), 
    ('toki', 1), ('tsua', 1), ('ttoa', 1), ('tuko', 1), ('txoa', 1), 
    ('txua', 1), ('tzar', 1), ('tzen', 4), ('tzoa', 1), ('tzua', 1), 
    ('unea', 1), ('zain', 1), ('zale', 1), ('zaro', 1), ('zino', 1), 
    ('zioa', 1), ('zkoa', 1), ('ztoa', 1), ('ada', 1), ('ail', 1), 
    ('ara', 1), ('ari', 1), ('aro', 1), ('asi', 1), ('dar', 1), 
    ('dua', 1), ('dun', 1), ('egi', 1), ('eko', 1), ('eme', 1), 
    ('ena', 1), ('ero', 1), ('eta', 1), ('eza', 1), ('gai', 1), 
    ('gei', 1), ('goi', 1), ('kan', 1), ('ket', 1), ('kia', 1), 
    ('kin', 1), ('koa', 1), ('koi', 1), ('kor', 1), ('min', 1), 
    ('nea', 1), ('ngo', 1), ('noa', 1), ('ohi', 1), ('oia', 1), 
    ('ola', 1), ('ora', 2), ('oro', 1), ('osa', 1), ('oso', 1), 
    ('pea', 1), ('ren', 2), ('ska', 1), ('sko', 1), ('sta', 1), 
    ('tan', 1), ('tar', 1), ('tea', 1), ('ten', 4), ('tia', 1), 
    ('toa', 1), ('tra', 1), ('tsu', 1), ('tto', 1), ('tua', 1), 
    ('txo', 1), ('txu', 1), ('tza', 2), ('tzo', 1), ('tzu', 1), 
    ('una', 1), ('une', 1), ('xka', 1), ('zio', 1), ('zka', 1), 
    ('zko', 1), ('zto', 1), ('zua', 1), ('ñoa', 1), ('ak', 1), ('ar', 1), 
    ('di', 1), ('du', 1), ('ek', 1), ('en', 4), ('ez', 1), ('ga', 1), 
    ('ge', 1), ('go', 1), ('ka', 1), ('ki', 1), ('ko', 1), ('na', 1), 
    ('ne', 1), ('no', 1), ('oi', 1), ('or', 2), ('os', 1), ('pe', 1), 
    ('ra', 1), ('ro', 1), ('sa', 1), ('ta', 1), ('te', 1), ('ti', 1), 
    ('to', 1), ('tu', 1), ('tz', 1), ('za', 1), ('zp', 1), ('zu', 1), 
    ('ñi', 1), ('ño', 1), ('z', 1), 
)

_EU_A3 = (
    ('keria', 1), ('lanik', 1), ('larik', 1), ('dade', 1), ('date', 1), 
    ('tade', 1), ('tate', 1), ('zlea', 2), ('ztik', 1), ('era', 1), 
    ('ero', 1), ('rik', 1), ('gi', 1), ('go', 1), ('ik', 1), ('ki', 1), 
    ('la', 1), ('ro', 1), ('to', 1), 
)



_EU_A1_REPL = {3: "atseden", 4: "arabera", 5: "baditu"}
_EU_A2_REPL = {
    3: "jok", 5: "tra", 6: "minutu", 7: "zehar", 8: "geldi",
    9: "igaro", 10: "aurka",
}


def _eu_rv(w: str) -> int:
    n = len(w)
    if n < 3:
        return n
    if w[1] not in _EU_VOWELS:
        i = 2
        while i < n and w[i] not in _EU_VOWELS:
            i += 1
        return min(i + 1, n)
    if w[0] in _EU_VOWELS and w[1] in _EU_VOWELS:
        i = 2
        while i < n and w[i] in _EU_VOWELS:
            i += 1
        return min(i + 1, n)
    return 3


def _eu_longest(seg: str, table) -> tuple[str, int] | None:
    for suf, res in table:
        if seg.endswith(suf):
            return suf, res
    return None


def basque_stem(word: str) -> str:
    w = word
    pv = _eu_rv(w)
    r1, r2 = _r1_r2(w, _EU_VOWELS)
    end = len(w)
    # repeat A1
    while True:
        hit = _eu_longest(w[:end], _EU_A1)
        if hit is None:
            break
        suf, res = hit
        pos = end - len(suf)
        if res == 1:
            if pos < pv:
                break
            w = w[:pos] + w[end:]
            end = pos
        elif res == 2:
            if pos < r2:
                break
            w = w[:pos] + w[end:]
            end = pos
        else:
            w = w[:pos] + _EU_A1_REPL[res] + w[end:]
            end = pos
    # repeat A2
    while True:
        hit = _eu_longest(w[:end], _EU_A2)
        if hit is None:
            break
        suf, res = hit
        pos = end - len(suf)
        if res in (1, 2, 4):
            bound = pv if res == 1 else (r2 if res == 2 else r1)
            if pos < bound:
                break
            w = w[:pos] + w[end:]
            end = pos
        else:
            w = w[:pos] + _EU_A2_REPL[res] + w[end:]
            end = pos
    # do A3 (once)
    hit = _eu_longest(w[:end], _EU_A3)
    if hit is not None:
        suf, res = hit
        pos = end - len(suf)
        if res == 1:
            if pos >= pv:
                w = w[:pos] + w[end:]
                end = pos
        else:  # res == 2: <- 'z'
            w = w[:pos] + "z" + w[end:]
            end = pos
    return w



# ---------------------------------------------------------------------------
# Lithuanian
# ---------------------------------------------------------------------------
# Snowball 'lithuanian' (reference StemmerType::Lithuanian). Tables +
# flow decoded from dict_snowball.so (lithuanian_UTF_8_stem
# disassembly): R1 computed after an optional skip of a leading 'a'
# when the word is longer than 6 chars; backwards: fix_conflicts
# conversions, one R1-limited step-1 delete, fix_chdz, repeated
# R1-limited step-2 deletes, fix_chdz again, then gd -> g.
# Oracle-verified (scripts/snowball_oracle.py).

_LT_VOWELS = "aeiouy\u0105\u0117\u0119\u012f\u016b\u0173"

_LT_CONFLICTS = (
    ("okat\u0117s", "okat\u0117"), ("ait\u0117s", "ait\u0117"),
    ("uot\u0117s", "uot\u0117"), ("\u0117jime", "\u0117jimas"),
    ("okate", "okat\u0117"), ("asius", "asys"),
    ("avime", "avimas"), ("ojime", "ojimas"),
    ("aite", "ait\u0117"), ("uote", "uot\u0117"),
    ("esiu", "esys"),
)

_LT_STEP1 = (
    'tumeisi', 'tumėmės', 'tumėtės', 'enimis', 'iuosna', 'siuosi', 
    'telėti', 'terėti', 'tumeis', 'tumėme', 'tumėte', 'čiausi', 'enims', 
    'eniui', 'enyje', 'enyse', 'eriai', 'erimi', 'erims', 'eryje', 
    'eryse', 'iamės', 'iatės', 'iauti', 'inėti', 'iomis', 'iosna', 
    'iuose', 'iuosi', 'iuoti', 'kimės', 'siesi', 'simės', 'sitės', 
    'tumei', 'tumėm', 'tumėt', 'uosna', 'ėjosi', 'aisi', 'amės', 'asis', 
    'atės', 'ausi', 'auti', 'eisi', 'enie', 'enio', 'enis', 'eniu', 
    'enti', 'enys', 'eria', 'erie', 'erys', 'iais', 'iame', 'iams', 
    'iasi', 'iate', 'iaus', 'iems', 'iesi', 'imis', 'imės', 'inti', 
    'ioje', 'ioms', 'iose', 'ioti', 'iuje', 'iumi', 'iuos', 'kite', 
    'omis', 'omės', 'osna', 'otės', 'sime', 'site', 'tute', 'tųsi', 
    'uisi', 'umis', 'uose', 'uosi', 'uoti', 'ysis', 'ysna', 'čiau', 
    'ėmis', 'ėmės', 'ėsna', 'ėtės', 'ais', 'ame', 'ams', 'asi', 'ate', 
    'aus', 'ens', 'enį', 'ers', 'erį', 'erų', 'esi', 'iai', 'iam', 'ias', 
    'iat', 'iau', 'iem', 'ies', 'imi', 'ims', 'ion', 'ios', 'isi', 'ite', 
    'iui', 'iun', 'ius', 'iąs', 'oje', 'ome', 'oms', 'ose', 'osi', 'ote', 
    'oti', 'sim', 'sit', 'siu', 'tum', 'tųs', 'uje', 'umi', 'ums', 'uos', 
    'usi', 'yje', 'yse', 'yti', 'ąsi', 'ėje', 'ėjo', 'ėme', 'ėms', 'ėse', 
    'ėsi', 'ėte', 'ėti', 'ųsi', 'ai', 'am', 'an', 'as', 'at', 'au', 'ei', 
    'es', 'ia', 'ie', 'im', 'io', 'is', 'it', 'iu', 'ią', 'ių', 'ki', 
    'oj', 'om', 'on', 'os', 'ot', 'si', 'ti', 'ui', 'un', 'uo', 'us', 
    'ys', 'ąs', 'ėj', 'ėm', 'ėn', 'ės', 'ėt', 'įs', 'ūs', 'a', 'e', 'i', 
    'k', 'o', 's', 'u', 'y', 'ą', 'ė', 'ę', 'į', 'ų', 
)

_LT_STEP2 = (
    'utėait', 'siant', 'uliuk', 'učiuk', 'iais', 'iant', 'iaus', 'iuoj', 
    'iuos', 'iuot', 'ykšt', 'ykšč', 'zgan', 'ain', 'ais', 'ant', 'auj', 
    'aus', 'dam', 'dav', 'esn', 'iaj', 'ias', 'iau', 'iej', 'ies', 'ing', 
    'int', 'ioj', 'iok', 'iop', 'ios', 'iuk', 'iul', 'iąj', 'iąs', 'išk', 
    'iųj', 'jam', 'uoj', 'uos', 'uot', 'ėję', 'aj', 'am', 'oj', 'ok', 
    'op', 'os', 'ot', 'sv', 'yl', 'yt', 'ąj', 'ąs', 'ėj', 'ėl', 'ėt', 
    'ęs', 'šv', 'ųj', 'ę', 
)



def _lt_fix_chdz(w: str) -> str:
    if w.endswith("\u010d"):
        return w[:-1] + "t"
    if w.endswith("d\u017e"):
        return w[:-1]
    return w


def lithuanian_stem(word: str) -> str:
    w = word
    n = len(w)
    # R1 (search starts past a leading 'a' when len > 6)
    p1 = n
    i = 1 if (n > 6 and w[:1] == "a") else 0
    while i < n and w[i] not in _LT_VOWELS:
        i += 1
    if i < n:
        i += 1
        while i < n and w[i] in _LT_VOWELS:
            i += 1
        if i < n:
            p1 = i + 1
    # fix_conflicts (conversions, once)
    for suf, repl in _LT_CONFLICTS:
        if w.endswith(suf):
            w = w[: -len(suf)] + repl
            break
    # step 1: one R1-limited delete
    for suf in _LT_STEP1:
        if w.endswith(suf) and len(w) - len(suf) >= p1:
            w = w[: -len(suf)]
            break
    w = _lt_fix_chdz(w)
    # step 2: repeated R1-limited deletes
    while True:
        for suf in _LT_STEP2:
            if w.endswith(suf) and len(w) - len(suf) >= p1:
                w = w[: -len(suf)]
                break
        else:
            break
    w = _lt_fix_chdz(w)
    if w.endswith("gd"):
        w = w[:-1]
    return w



# ---------------------------------------------------------------------------
# Yiddish
# ---------------------------------------------------------------------------
# Snowball 'yiddish' (reference StemmerType::Yiddish). Tables, switch
# actions and region logic decoded from dict_snowball.so
# (yiddish_UTF_8_stem disassembly). Pipeline: prelude (digraph +
# final-letter normalization, nikud removal), mark_regions (prefix
# handling substitutes ASCII markers GE/TSU so suffix rules can see
# them; p1 = 3-consonant / vowel-run / hop-3 maximum in BYTE space --
# markers are 1-byte chars, so the whole stemmer runs on UTF-8 bytes
# to keep offsets exact), main suffix among (strong-verb ablaut
# restorations), noun/adjective amongs, postlude (drop markers).
# Oracle-verified (scripts/snowball_oracle.py).

_YI_CONS = frozenset("\u05d1\u05d2\u05d3\u05d4\u05d6\u05d7\u05d8\u05da\u05db\u05dc\u05dd\u05de\u05df\u05e0\u05e1\u05e3\u05e4\u05e5\u05e6\u05e7\u05e8\u05e9\u05ea\u05f0")
_YI_VOWEL = frozenset("\u05d0\u05d5\u05d9\u05e2\u05f1\u05f2")
_YI_NIKED = frozenset(
    "\u05b0\u05b1\u05b2\u05b3\u05b4\u05b5\u05b6\u05b7\u05b8"
    "\u05b9\u05bb\u05bc\u05bf\u05c1\u05c2"
)
_YI_FINALS = {"\u05da": "\u05db", "\u05dd": "\u05de",
              "\u05df": "\u05e0", "\u05e3": "\u05e4",
              "\u05e5": "\u05e6"}

_YI_PREFIXES = (
    'פונאנדער', 'אנטקעגנ', 'ארונטער', 'צוזאמענ', 'אונטער', 'אנידער', 
    'אריבער', 'אדורכ', 'איבער', 'אקעגנ', 'פארבײ', 'פארױס', 'צונױפ', 
    'צוריק', 'אהינ', 'אהער', 'אהײמ', 'אפיר', 'אראפ', 'ארומ', 'ארױס', 
    'ארױפ', 'ארײנ', 'אװעק', 'דורכ', 'אומ', 'אנט', 'אױס', 'אױפ', 'אײנ', 
    'דער', 'מיט', 'נאכ', 'פאר', 'אנ', 'אפ', 'בא', 'בײ', 'צו', 'צע', 
)

_YI_MAIN = (
    ('פארלױרנ', 28), ('GEביטנ', 9), ('GEביסנ', 10), ('GEליטנ', 13), 
    ('GEמיטנ', 8), ('GEריסנ', 16), ('גאנגענ', 5), ('טרונקנ', 23), 
    ('צװונגנ', 24), ('שטאנענ', 29), ('שלונגנ', 25), ('בונדנ', 20), 
    ('בראכט', 31), ('זונגנ', 22), ('טענעמ', 4), ('טענער', 4), 
    ('טריבנ', 12), ('יזמענ', 1), ('נומענ', 6), ('ענערס', 1), 
    ('קליבנ', 14), ('שמיסנ', 18), ('שניטנ', 19), ('שריבנ', 7), 
    ('שװיגנ', 17), ('שװױרנ', 30), ('װוטשנ', 21), ('בױגנ', 26), 
    ('הױבנ', 27), ('טענע', 4), ('יסטנ', 1), ('יקײט', 1), ('סטער', 1), 
    ('עטער', 1), ('עלעכ', 1), ('עלענ', 1), ('עלעס', 1), ('ענעמ', 3), 
    ('ענער', 3), ('ריבנ', 15), ('שאפט', 1), ('װיזנ', 11), ('גײנ', 5), 
    ('הײט', 1), ('ונג', 1), ('טנס', 4), ('טער', 4), ('יזמ', 1), 
    ('יסט', 33), ('יעס', 2), ('לעכ', 1), ('סטו', 1), ('סטנ', 1), 
    ('סטע', 1), ('עטנ', 1), ('עטס', 1), ('עטע', 1), ('עלע', 1), 
    ('ענס', 3), ('ענע', 3), ('ערס', 1), ('קײט', 1), ('ות', 32), 
    ('טנ', 4), ('טס', 4), ('טע', 4), ('ימ', 1), ('יע', -1), ('נס', 1), 
    ('סט', 1), ('עט', 1), ('עמ', 1), ('ענ', 1), ('עס', 1), ('ער', 1), 
    ('ט', 1), ('נ', 1), ('ס', 1), ('ע', 1), 
)

_YI_VERBSTEM = (
    ('פארלױר', 24), ('טרונק', 19), ('צװונג', 20), ('שלונג', 21), 
    ('בונד', 16), ('גאנג', 1), ('זונג', 18), ('טריב', 7), ('קליב', 9), 
    ('שטאנ', 25), ('שמיס', 13), ('שניט', 14), ('שריב', 15), ('שװיג', 12), 
    ('שװױר', 26), ('װוטש', 17), ('ביט', 4), ('ביס', 5), ('בױג', 22), 
    ('הױב', 23), ('ליט', 8), ('מיט', 3), ('נומ', 2), ('ריב', 10), 
    ('ריס', 11), ('װיז', 6), 
)

_YI_NOUN = (
    ('יקײט', 1), ('שאפט', 1), ('הײט', 1), ('ונג', 1), ('קײט', 1), 
    ('ל', 2), 
)

_YI_ADJ = (
    ('ענדיק', 1), ('בליק', -1), ('גליק', -1), ('נדיק', 1), ('דיק', 1), 
    ('ניק', 1), ('יג', 1), ('יק', 1), ('יש', 1), 
)



_YI_MAIN_REPL = {
    2: "\u05d9\u05e2", 5: "\u05d2\u05f2", 6: "\u05e0\u05e2\u05de",
    7: "\u05e9\u05e8\u05f2\u05d1", 8: "\u05de\u05f2\u05d3",
    9: "\u05d1\u05f2\u05d8", 10: "\u05d1\u05f2\u05e1",
    11: "\u05f0\u05f2\u05d6", 12: "\u05d8\u05e8\u05f2\u05d1",
    13: "\u05dc\u05f2\u05d8", 14: "\u05e7\u05dc\u05f2\u05d1",
    15: "\u05e8\u05f2\u05d1", 16: "\u05e8\u05f2\u05e1",
    17: "\u05e9\u05f0\u05f2\u05d2", 18: "\u05e9\u05de\u05f2\u05e1",
    19: "\u05e9\u05e0\u05f2\u05d3", 20: "\u05d1\u05d9\u05e0\u05d3",
    21: "\u05f0\u05d9\u05d8\u05e9", 22: "\u05d6\u05d9\u05e0\u05d2",
    23: "\u05d8\u05e8\u05d9\u05e0\u05e7",
    24: "\u05e6\u05f0\u05d9\u05e0\u05d2",
    25: "\u05e9\u05dc\u05d9\u05e0\u05d2", 26: "\u05d1\u05f2\u05d2",
    27: "\u05d4\u05f2\u05d1",
    28: "\u05e4\u05d0\u05e8\u05dc\u05d9\u05e8",
    29: "\u05e9\u05d8\u05f2", 30: "\u05e9\u05f0\u05e2\u05e8",
    31: "\u05d1\u05e8\u05e2\u05e0\u05d2", 32: "\u05d4",
}
_YI_VERB_REPL = {
    1: "\u05d2\u05f2", 2: "\u05e0\u05e2\u05de", 3: "\u05de\u05f2\u05d3",
    4: "\u05d1\u05f2\u05d8", 5: "\u05d1\u05f2\u05e1",
    6: "\u05f0\u05f2\u05d6", 7: "\u05d8\u05e8\u05f2\u05d1",
    8: "\u05dc\u05f2\u05d8", 9: "\u05e7\u05dc\u05f2\u05d1",
    10: "\u05e8\u05f2\u05d1", 11: "\u05e8\u05f2\u05e1",
    12: "\u05e9\u05f0\u05f2\u05d2", 13: "\u05e9\u05de\u05f2\u05e1",
    14: "\u05e9\u05e0\u05f2\u05d3", 15: "\u05e9\u05e8\u05f2\u05d1",
    16: "\u05d1\u05d9\u05e0\u05d3", 17: "\u05f0\u05d9\u05d8\u05e9",
    18: "\u05d6\u05d9\u05e0\u05d2",
    19: "\u05d8\u05e8\u05d9\u05e0\u05e7",
    20: "\u05e6\u05f0\u05d9\u05e0\u05d2",
    21: "\u05e9\u05dc\u05d9\u05e0\u05d2", 22: "\u05d1\u05f2\u05d2",
    23: "\u05d4\u05f2\u05d1",
    24: "\u05e4\u05d0\u05e8\u05dc\u05d9\u05e8",
    25: "\u05e9\u05d8\u05f2", 26: "\u05e9\u05f0\u05e2\u05e8",
}

_YI_MAIN_B = tuple((s.encode("utf-8"), r) for s, r in _YI_MAIN)
_YI_VERB_B = tuple((s.encode("utf-8"), r) for s, r in _YI_VERBSTEM)
_YI_NOUN_B = tuple((s.encode("utf-8"), r) for s, r in _YI_NOUN)
_YI_ADJ_B = tuple((s.encode("utf-8"), r) for s, r in _YI_ADJ)
_YI_PREFIX_B = tuple(
    sorted((s.encode("utf-8") for s in _YI_PREFIXES), key=len, reverse=True)
)
_YI_CLUSTERS_B = tuple(
    s.encode("utf-8") for s in ("\u05d3\u05d6\u05e9", "\u05e9\u05d8\u05e8",
                                "\u05e9\u05d8\u05e9", "\u05e9\u05e4\u05e8")
)
_YI_GE = "\u05d2\u05e2".encode("utf-8")
_YI_TSU = "\u05e6\u05d5".encode("utf-8")
_YI_CUGN = "\u05e6\u05d5\u05d2\u05e0".encode("utf-8")
_YI_CUKT = "\u05e6\u05d5\u05e7\u05d8".encode("utf-8")
_YI_CUKN = "\u05e6\u05d5\u05e7\u05e0".encode("utf-8")
_YI_GEBN = "\u05d2\u05e2\u05d1\u05e0".encode("utf-8")
_YI_LT = "\u05dc\u05d8".encode("utf-8")
_YI_BN = "\u05d1\u05e0".encode("utf-8")
_YI_BRAX = "\u05d1\u05e8\u05d0\u05db".encode("utf-8")
_YI_BRENG = "\u05d1\u05e8\u05e2\u05e0\u05d2".encode("utf-8")
_YI_GIML = "\u05d2".encode("utf-8")
_YI_SHIN = "\u05e9".encode("utf-8")
_YI_YS = "\u05d9\u05e1".encode("utf-8")
_YI_TET = "\u05d8".encode("utf-8")


def _u8len(b: bytes, i: int) -> int:
    x = b[i]
    return 1 if x < 0x80 else (2 if x < 0xE0 else (3 if x < 0xF0 else 4))


def _u8char(b: bytes, i: int) -> str:
    return b[i : i + _u8len(b, i)].decode("utf-8", "replace")


def _u8prevlen(b: bytes, i: int) -> int:
    j = i - 1
    while j > 0 and 0x80 <= b[j] < 0xC0:
        j -= 1
    return i - j


def _yi_suffix(b: bytes, table) -> tuple[bytes, int] | None:
    for suf, res in table:
        if b.endswith(suf):
            return suf, res
    return None


def yiddish_stem(word: str) -> str:
    # prelude: digraph + final-letter normalization (char space)
    w = word
    i = 0
    while i < len(w):
        seg = w[i:]
        two = seg[:2]
        if two in ("\u05d5\u05d5", "\u05d5\u05d9", "\u05d9\u05d9"):
            nxt = seg[2:3]
            blocked = (
                nxt == "\u05bc" if two == "\u05d5\u05d5" else nxt == "\u05b4"
            )
            if not blocked:
                repl = {"\u05d5\u05d5": "\u05f0", "\u05d5\u05d9": "\u05f1",
                        "\u05d9\u05d9": "\u05f2"}[two]
                w = w[:i] + repl + w[i + 2 :]
                continue
        elif seg[0] in _YI_FINALS:
            w = w[:i] + _YI_FINALS[seg[0]] + w[i + 1 :]
            continue
        i += 1
    # drop nikud
    w = "".join(ch for ch in w if ch not in _YI_NIKED)
    b = w.encode("utf-8")
    # mark_regions: GE/TSU markers + prefix handling. A leading
    # gimel-ayin becomes the GE marker, and the separable-prefix
    # among continues from there (both can fire on one word).
    start = 0
    if b.startswith(_YI_GE) and not (
        b[4:].startswith(_YI_LT) or b[4:].startswith(_YI_BN)
    ):
        b = b"GE" + b[4:]
        start = 2
    pe = 0
    for pref in _YI_PREFIX_B:
        if b[start:].startswith(pref):
            pe = start + len(pref)
            break
    base = start
    if pe:
        rest = b[pe:]
        if (
            len(rest) == 8
            and (rest.startswith(_YI_CUGN) or rest.startswith(_YI_CUKT)
                 or rest.startswith(_YI_CUKN))
        ):
            base = pe
        elif rest.startswith(_YI_GEBN):
            base = pe
        elif rest.startswith(_YI_GE):
            b = b[:pe] + b"GE" + b[pe + 4 :]
            base = pe + 2
        elif rest.startswith(_YI_TSU):
            b = b[:pe] + b"TSU" + b[pe + 4 :]
            base = pe + 3
    # p1 (byte offsets)
    n = len(b)
    p1 = n
    hop = base
    ok = True
    for _ in range(3):
        if hop >= n:
            ok = False
            break
        hop += _u8len(b, hop)
    if ok:
        c = base
        for cl in _YI_CLUSTERS_B:
            if b[c:].startswith(cl):
                c += len(cl)
                break
        cc, k = c, 0
        while k < 3 and cc < n and _u8char(b, cc) in _YI_CONS:
            cc += _u8len(b, cc)
            k += 1
        if k == 3:
            p1 = cc
        else:
            i = c
            while i < n and _u8char(b, i) not in _YI_VOWEL:
                i += _u8len(b, i)
            if i < n:
                i += _u8len(b, i)
                while i < n and _u8char(b, i) in _YI_VOWEL:
                    i += _u8len(b, i)
                p1 = max(i, hop)
    # main suffix step
    hit = _yi_suffix(b, _YI_MAIN_B)
    if hit is not None:
        suf, res = hit
        pos = len(b) - len(suf)
        if res == 1:
            if pos >= p1:
                b = b[:pos]
        elif res == 2:
            if pos >= p1:
                b = b[:pos] + _YI_MAIN_REPL[2].encode("utf-8")
        elif res == 3:
            if pos >= p1:
                b = b[:pos]
                vh = _yi_suffix(b, _YI_VERB_B)
                if vh is not None:
                    vs, vr = vh
                    b = b[: len(b) - len(vs)] + _YI_VERB_REPL[vr].encode(
                        "utf-8"
                    )
        elif res == 4:
            if pos >= p1:
                b = b[:pos]
                end = len(b)
            else:
                b = b[:pos] + _YI_TET
                end = pos
            head = b[:end]
            if head.endswith(_YI_BRAX):
                start = end - len(_YI_BRAX)
                if head[:start].endswith(_YI_GE):
                    start -= len(_YI_GE)
                b = b[:start] + _YI_BRENG + b[end:]
        elif res == 33:
            before = b[:pos]
            if before.endswith(_YI_GIML) or before.endswith(_YI_SHIN):
                if p1 <= pos + 4:
                    b = b[:pos] + _YI_YS
            elif pos >= p1:
                b = b[:pos]
        elif res in _YI_MAIN_REPL:
            if res == 32:
                if pos >= p1:
                    b = b[:pos] + _YI_MAIN_REPL[32].encode("utf-8")
            else:
                b = b[:pos] + _YI_MAIN_REPL[res].encode("utf-8")
    # noun suffixes
    hit = _yi_suffix(b, _YI_NOUN_B)
    if hit is not None:
        suf, res = hit
        pos = len(b) - len(suf)
        if res == 1:
            if pos >= p1:
                b = b[:pos]
        elif res == 2 and pos >= p1 and pos > 0:
            plen = _u8prevlen(b, pos)
            if b[pos - plen : pos].decode("utf-8", "replace") in _YI_CONS:
                b = b[:pos]
    # adjective suffixes
    hit = _yi_suffix(b, _YI_ADJ_B)
    if hit is not None:
        suf, res = hit
        pos = len(b) - len(suf)
        if res == 1 and pos >= p1:
            b = b[:pos]
    # postlude: drop markers (backward scan; deletions can cascade)
    i = len(b)
    while i > 0:
        if b[:i].endswith(b"GE"):
            b = b[: i - 2] + b[i:]
            i -= 2
        elif b[:i].endswith(b"TSU"):
            b = b[: i - 3] + b[i:]
            i -= 3
        else:
            i -= _u8prevlen(b, i)
    out = b.decode("utf-8", "replace")
    # ts_lexize parity: an empty stem yields the original word
    return word if out == "" else out



EXTRA_STEMMERS = {
    "romanian": romanian_stem,
    "hungarian": hungarian_stem,
    "finnish": finnish_stem,
    "english": porter2_stem,
    "irish": irish_stem,
    "armenian": armenian_stem,
    "catalan": catalan_stem,
    "hindi": hindi_stem,
    "indonesian": indonesian_stem,
    "nepali": nepali_stem,
    "basque": basque_stem,
    "lithuanian": lithuanian_stem,
    "yiddish": yiddish_stem,
}

# ISO-639-1 codes for stemmer.stem() dispatch
EXTRA_CODES = {
    "ro": romanian_stem,
    "hu": hungarian_stem,
    "fi": finnish_stem,
    # Porter2 = the reference's StemmerType::English; plain "en" stays
    # the original Porter (StemmerType::Porter)
    "en2": porter2_stem,
    "ga": irish_stem,
    "hy": armenian_stem,
    "ca": catalan_stem,
    "hi": hindi_stem,
    "id": indonesian_stem,
    "ne": nepali_stem,
    "eu": basque_stem,
    "lt": lithuanian_stem,
    "yi": yiddish_stem,
}
