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



# ---------------------------------------------------------------------------
# Serbian
# ---------------------------------------------------------------------------
# Snowball 'serbian' (reference StemmerType::Serbian). Tables + switch
# actions decoded from dict_snowball.so (serbian_UTF_8_stem
# disassembly): Cyrillic-to-Latin transliteration, prelude
# (consonant-'ije'-consonant -> 'e', consonant-'je'-consonant -> 'e',
# 'dj' -> U+0111), no_diacritics flag, p1 = after first vowel
# (extended past position 1 via the next consonant, and pulled back
# to just after a syllabic 'r'), then step_1 (replacement among),
# step_2 OR step_3 (p1-gated replacement / deletion amongs); flagged
# rules fire only when the word carries no diacritic letters. All
# offsets are BYTE offsets (diacritics are two UTF-8 bytes).
# Oracle-verified (scripts/snowball_oracle.py).

_SR_CYR = {
    "\u0430": "a", "\u0431": "b", "\u0432": "v", "\u0433": "g",
    "\u0434": "d", "\u0435": "e", "\u0436": "\u017e", "\u0437": "z",
    "\u0438": "i", "\u043a": "k", "\u043b": "l", "\u043c": "m",
    "\u043d": "n", "\u043e": "o", "\u043f": "p", "\u0440": "r",
    "\u0441": "s", "\u0442": "t", "\u0443": "u", "\u0444": "f",
    "\u0445": "h", "\u0446": "c", "\u0447": "\u010d",
    "\u0448": "\u0161", "\u0452": "\u0111", "\u0458": "j",
    "\u0459": "lj", "\u045a": "nj", "\u045b": "\u0107",
    "\u045f": "d\u017e",
}
_SR_SA = frozenset("bcdfghjklmnprstvz\u0107\u010d\u0111\u0161\u017e")
_SR_DIA = frozenset("\u0107\u010d\u0111\u0161\u017e")
_SR_VOWEL = frozenset("aeiou")

_SR_STEP1 = {
    'teticima': ('tetika', False),
    'centara': ('centra', False),
    'kustava': ('kustva', False),
    'tvenici': ('tvenik', False),
    'atcima': ('atka', False),
    'avilan': ('avilni', False),
    'centar': ('centra', False),
    'inzima': ('ing', False),
    'istara': ('istra', False),
    'jacima': ('jak', False),
    'lozima': ('loga', False),
    'metara': ('metra', False),
    'nicima': ('nik', False),
    'nstava': ('nstva', False),
    'pesima': ('peh', False),
    'pletan': ('pletni', False),
    'pravan': ('pravni', False),
    'stavan': ('stavni', False),
    'tetici': ('tetika', False),
    'ticima': ('tik', False),
    'utcima': ('utka', False),
    'voljan': ('voljni', False),
    'zicima': ('zik', False),
    'acaka': ('acka', True),
    'ajaca': ('ajca', False),
    'ajaka': ('ajka', False),
    'alaca': ('alca', False),
    'anaka': ('anki', False),
    'anata': ('anta', False),
    'anjac': ('anjca', False),
    'antan': ('antni', False),
    'ataka': ('atka', False),
    'ačaka': ('ačka', False),
    'bilan': ('bilni', False),
    'bojci': ('bojka', False),
    'cajan': ('cajni', True),
    'dusan': ('dusni', True),
    'dušan': ('dušni', False),
    'ejaca': ('ejca', False),
    'ekata': ('ekta', False),
    'elaca': ('elca', False),
    'esama': ('esma', False),
    'eskan': ('eskna', False),
    'etaka': ('etka', False),
    'gilan': ('gilni', False),
    'istar': ('istra', False),
    'itaka': ('itka', False),
    'izama': ('izma', False),
    'kusan': ('kusni', False),
    'laran': ('larni', False),
    'ljaca': ('ljca', False),
    'metar': ('metra', False),
    'nilan': ('nilni', False),
    'njaca': ('njca', False),
    'ojaca': ('ojca', False),
    'ojaka': ('ojka', False),
    'ojsci': ('ojska', False),
    'olaca': ('olca', False),
    'otaka': ('otka', False),
    'rilan': ('rilni', False),
    'silan': ('silni', False),
    'sivan': ('sivni', False),
    'snici': ('snik', False),
    'tetan': ('tetni', False),
    'tican': ('ticni', True),
    'tilan': ('tilni', False),
    'tivan': ('tivni', False),
    'tičan': ('tični', False),
    'utaka': ('utka', False),
    'vojci': ('vojka', False),
    'čajan': ('čajni', False),
    'čcima': ('čka', False),
    'acak': ('acka', True),
    'ajac': ('ajca', False),
    'alac': ('alca', False),
    'alan': ('alni', False),
    'aoca': ('alca', False),
    'asan': ('asni', True),
    'atak': ('atka', False),
    'atan': ('atni', False),
    'atci': ('atka', False),
    'ačak': ('ačka', False),
    'ašan': ('ašni', False),
    'baci': ('baci', False),
    'daba': ('dba', False),
    'ejac': ('ejca', False),
    'ekat': ('ekta', False),
    'elac': ('elca', False),
    'enat': ('enta', False),
    'eran': ('erni', False),
    'esan': ('esni', False),
    'etak': ('etka', False),
    'inzi': ('ing', False),
    'itak': ('itka', False),
    'itci': ('itka', False),
    'izam': ('izma', False),
    'jaci': ('jak', False),
    'jebe': ('jebi', False),
    'kuse': ('kusi', False),
    'ljac': ('ljca', False),
    'lozi': ('loga', False),
    'maca': ('mca', False),
    'naca': ('nca', False),
    'njac': ('njca', False),
    'ojac': ('ojca', False),
    'olac': ('olca', False),
    'olce': ('olca', False),
    'oscu': ('osti', True),
    'otak': ('otka', False),
    'ozan': ('ozni', False),
    'ošću': ('osti', False),
    'pesi': ('peh', False),
    'raca': ('rca', False),
    'rave': ('ravi', False),
    'saca': ('sca', False),
    'save': ('savi', True),
    'usak': ('uska', True),
    'utak': ('utka', False),
    'utci': ('utka', False),
    'ušak': ('uška', False),
    'vaca': ('vca', False),
    'šaca': ('šca', False),
    'šave': ('šavi', False),
    'mac': ('mca', False),
    'nac': ('nca', False),
    'rac': ('rca', False),
    'sac': ('sca', False),
    'vac': ('vca', False),
    'čci': ('čka', False),
    'šac': ('šca', False),
}

_SR_STEP2 = {
    'astadosmo': ('asta', False),
    'astadoste': ('asta', False),
    'astajasmo': ('astaj', False),
    'astajaste': ('astaj', False),
    'evitijega': ('evit', False),
    'evitijemu': ('evit', False),
    'evitijima': ('evit', False),
    'istadosmo': ('ista', False),
    'istadoste': ('ista', False),
    'istajasmo': ('istaj', False),
    'istajaste': ('istaj', False),
    'ostadosmo': ('osta', False),
    'ostadoste': ('osta', False),
    'ostajasmo': ('ostaj', False),
    'ostajaste': ('ostaj', False),
    'ovitijega': ('ovit', False),
    'ovitijemu': ('ovit', False),
    'ovitijima': ('ovit', False),
    'anjijega': ('anj', False),
    'anjijemu': ('anj', False),
    'anjijima': ('anj', False),
    'astademo': ('asta', False),
    'astadete': ('asta', False),
    'astadose': ('asta', True),
    'astadoše': ('asta', False),
    'astajahu': ('astaj', False),
    'astajala': ('astaj', False),
    'astajale': ('astaj', False),
    'astajali': ('astaj', False),
    'astajalo': ('astaj', False),
    'astajase': ('astaj', True),
    'astajati': ('astaj', False),
    'astajaše': ('astaj', False),
    'astajemo': ('astaj', False),
    'astajete': ('astaj', False),
    'astajuci': ('astaj', True),
    'astajući': ('astaj', False),
    'astanemo': ('asta', False),
    'astanete': ('asta', False),
    'astanila': ('asta', False),
    'astanimo': ('asta', False),
    'astanite': ('asta', False),
    'astijega': ('ast', False),
    'astijemu': ('ast', False),
    'astijima': ('ast', False),
    'cajevima': ('caj', False),
    'enjijega': ('enj', False),
    'enjijemu': ('enj', False),
    'enjijima': ('enj', False),
    'evitijeg': ('evit', False),
    'evitijem': ('evit', False),
    'evitijih': ('evit', False),
    'evitijim': ('evit', False),
    'evitijoj': ('evit', False),
    'ganijama': ('ganij', False),
    'ganijima': ('ganij', False),
    'istademo': ('ista', False),
    'istadete': ('ista', False),
    'istadose': ('ista', True),
    'istadoše': ('ista', False),
    'istajahu': ('istaj', False),
    'istajala': ('istaj', False),
    'istajale': ('istaj', False),
    'istajali': ('istaj', False),
    'istajalo': ('istaj', False),
    'istajase': ('istaj', True),
    'istajati': ('istaj', False),
    'istajaše': ('istaj', False),
    'istajemo': ('istaj', False),
    'istajete': ('istaj', False),
    'istajuci': ('istaj', True),
    'istajući': ('istaj', False),
    'istanemo': ('ista', False),
    'istanete': ('ista', False),
    'istanila': ('ista', False),
    'istanimo': ('ista', False),
    'istanite': ('ista', False),
    'lajevima': ('laj', False),
    'lucujemo': ('luc', True),
    'lucujete': ('luc', True),
    'lucujuci': ('luc', True),
    'lučujemo': ('luč', False),
    'lučujete': ('luč', False),
    'lučujući': ('luč', False),
    'manijama': ('manij', False),
    'manijima': ('manij', False),
    'ostademo': ('osta', False),
    'ostadete': ('osta', False),
    'ostadose': ('osta', True),
    'ostadoše': ('osta', False),
    'ostajahu': ('ostaj', False),
    'ostajala': ('ostaj', False),
    'ostajale': ('ostaj', False),
    'ostajali': ('ostaj', False),
    'ostajalo': ('ostaj', False),
    'ostajase': ('ostaj', True),
    'ostajati': ('ostaj', False),
    'ostajaše': ('ostaj', False),
    'ostajemo': ('ostaj', False),
    'ostajete': ('ostaj', False),
    'ostajuci': ('ostaj', True),
    'ostajući': ('ostaj', False),
    'ostanemo': ('osta', False),
    'ostanete': ('osta', False),
    'ostanila': ('osta', False),
    'ostanimo': ('osta', False),
    'ostanite': ('osta', False),
    'ovitijeg': ('ovit', False),
    'ovitijem': ('ovit', False),
    'ovitijih': ('ovit', False),
    'ovitijim': ('ovit', False),
    'ovitijoj': ('ovit', False),
    'panijama': ('panij', False),
    'panijima': ('panij', False),
    'rajevima': ('raj', False),
    'ranijama': ('ranij', False),
    'ranijima': ('ranij', False),
    'snjijega': ('snj', True),
    'snjijemu': ('snj', True),
    'snjijima': ('snj', True),
    'tanijama': ('tanij', False),
    'tanijima': ('tanij', False),
    'ćajevima': ('ćaj', False),
    'čajevima': ('čaj', False),
    'đajevima': ('đaj', False),
    'šnjijega': ('šnj', False),
    'šnjijemu': ('šnj', False),
    'šnjijima': ('šnj', False),
    'ajevima': ('aj', False),
    'anjijeg': ('anj', False),
    'anjijem': ('anj', False),
    'anjijih': ('anj', False),
    'anjijim': ('anj', False),
    'anjijoj': ('anj', False),
    'astadem': ('asta', False),
    'astades': ('asta', True),
    'astadeš': ('asta', False),
    'astadoh': ('asta', False),
    'astajah': ('astaj', False),
    'astajao': ('astaj', False),
    'astajat': ('astaj', False),
    'astajem': ('astaj', False),
    'astajes': ('astaj', True),
    'astaješ': ('astaj', False),
    'astajmo': ('astaj', False),
    'astajte': ('astaj', False),
    'astanem': ('asta', False),
    'astanes': ('asta', True),
    'astaneš': ('asta', False),
    'astavsi': ('asta', True),
    'astavši': ('asta', False),
    'astijeg': ('ast', False),
    'astijem': ('ast', False),
    'astijih': ('ast', False),
    'astijim': ('ast', False),
    'astijoj': ('ast', False),
    'atijega': ('at', False),
    'atijemu': ('at', False),
    'atijima': ('at', False),
    'avajuci': ('ava', True),
    'avajući': ('ava', False),
    'avijega': ('av', False),
    'avijemu': ('av', False),
    'avijima': ('av', False),
    'elijega': ('el', False),
    'elijemu': ('el', False),
    'elijima': ('el', False),
    'enjijeg': ('enj', False),
    'enjijem': ('enj', False),
    'enjijih': ('enj', False),
    'enjijim': ('enj', False),
    'enjijoj': ('enj', False),
    'evajuci': ('eva', True),
    'evajući': ('eva', False),
    'evijega': ('ev', False),
    'evijemu': ('ev', False),
    'evijima': ('ev', False),
    'evitega': ('evit', False),
    'evitemu': ('evit', False),
    'evitija': ('evit', False),
    'evitije': ('evit', False),
    'evitiji': ('evit', False),
    'evitima': ('evit', False),
    'evitoga': ('evit', False),
    'evitome': ('evit', False),
    'evitomu': ('evit', False),
    'ganijom': ('ganij', False),
    'ijalama': ('ijal', False),
    'ijalima': ('ijal', False),
    'ikatima': ('ikat', False),
    'injasmo': ('inj', False),
    'injaste': ('inj', False),
    'irajuci': ('ir', True),
    'irajući': ('ir', False),
    'irujemo': ('ir', False),
    'irujete': ('ir', False),
    'irujuci': ('ir', True),
    'irujući': ('ir', False),
    'istadem': ('ista', False),
    'istades': ('ista', True),
    'istadeš': ('ista', False),
    'istadoh': ('ista', False),
    'istajah': ('istaj', False),
    'istajao': ('istaj', False),
    'istajat': ('istaj', False),
    'istajem': ('istaj', False),
    'istajes': ('istaj', True),
    'istaješ': ('istaj', False),
    'istajmo': ('istaj', False),
    'istajte': ('istaj', False),
    'istanem': ('ista', False),
    'istanes': ('ista', True),
    'istaneš': ('ista', False),
    'istavsi': ('ista', True),
    'istavši': ('ista', False),
    'ivajuci': ('iva', True),
    'ivajući': ('iva', False),
    'ivijega': ('iv', False),
    'ivijemu': ('iv', False),
    'ivijima': ('iv', False),
    'jetismo': ('jeti', False),
    'jetiste': ('jeti', False),
    'lucismo': ('luc', True),
    'luciste': ('luc', True),
    'lucujem': ('luc', True),
    'lucujes': ('luc', True),
    'lucujmo': ('luc', True),
    'lucujte': ('luc', True),
    'lučismo': ('luč', False),
    'lučiste': ('luč', False),
    'lučujem': ('luč', False),
    'lučuješ': ('luč', False),
    'lučujmo': ('luč', False),
    'lučujte': ('luč', False),
    'manijom': ('manij', False),
    'olovima': ('olov', False),
    'onovima': ('on', False),
    'osijega': ('os', True),
    'osijemu': ('os', True),
    'osijima': ('os', True),
    'ostadem': ('osta', False),
    'ostades': ('osta', True),
    'ostadeš': ('osta', False),
    'ostadoh': ('osta', False),
    'ostajah': ('ostaj', False),
    'ostajao': ('ostaj', False),
    'ostajat': ('ostaj', False),
    'ostajem': ('ostaj', False),
    'ostajes': ('ostaj', True),
    'ostaješ': ('ostaj', False),
    'ostajmo': ('ostaj', False),
    'ostajte': ('ostaj', False),
    'ostanem': ('osta', False),
    'ostanes': ('osta', True),
    'ostaneš': ('osta', False),
    'ostavsi': ('osta', True),
    'ostavši': ('osta', False),
    'ovijega': ('ov', False),
    'ovijemu': ('ov', False),
    'ovijima': ('ov', False),
    'ovitega': ('ovit', False),
    'ovitemu': ('ovit', False),
    'ovitija': ('ovit', False),
    'ovitije': ('ovit', False),
    'ovitiji': ('ovit', False),
    'ovitima': ('ovit', False),
    'ovitoga': ('ovit', False),
    'ovitome': ('ovit', False),
    'ovitomu': ('ovit', False),
    'ozilima': ('ozil', False),
    'ošijega': ('oš', False),
    'ošijemu': ('oš', False),
    'ošijima': ('oš', False),
    'panijom': ('panij', False),
    'ranijom': ('ranij', False),
    'rarijem': ('rari', False),
    'rosismo': ('rosi', True),
    'rosiste': ('rosi', True),
    'rosivsi': ('rosi', True),
    'rošismo': ('roši', False),
    'rošiste': ('roši', False),
    'rošivši': ('roši', False),
    'skijega': ('sk', False),
    'skijemu': ('sk', False),
    'skijima': ('sk', False),
    'snjijeg': ('snj', True),
    'snjijem': ('os', True),
    'snjijih': ('snj', True),
    'snjijim': ('snj', True),
    'snjijoj': ('snj', True),
    'tanijom': ('tanij', False),
    'ugovima': ('ugov', False),
    'urajuci': ('ur', True),
    'urajući': ('ur', False),
    'uvajuci': ('uva', True),
    'uvajući': ('uva', False),
    'škijega': ('šk', False),
    'škijemu': ('šk', False),
    'škijima': ('šk', False),
    'šnjijeg': ('šnj', False),
    'šnjijem': ('šnj', False),
    'šnjijih': ('šnj', False),
    'šnjijim': ('šnj', False),
    'šnjijoj': ('šnj', False),
    'acasmo': ('aca', True),
    'acaste': ('aca', True),
    'acavsi': ('aca', True),
    'acismo': ('ac', True),
    'aciste': ('ac', True),
    'aninom': ('an', False),
    'anjega': ('anj', False),
    'anjemu': ('anj', False),
    'anjija': ('anj', False),
    'anjije': ('anj', False),
    'anjiji': ('anj', False),
    'anjiju': ('anj', False),
    'anjima': ('anj', False),
    'anjoga': ('anj', False),
    'anjome': ('anj', False),
    'anjomu': ('anj', False),
    'astade': ('asta', False),
    'astadu': ('asta', False),
    'astaje': ('astaj', False),
    'astaju': ('astaj', False),
    'astala': ('asta', False),
    'astale': ('asta', False),
    'astali': ('asta', False),
    'astalo': ('asta', False),
    'astane': ('asta', False),
    'astanu': ('asta', False),
    'astati': ('asta', False),
    'astega': ('ast', False),
    'astemo': ('as', False),
    'astemu': ('ast', False),
    'astete': ('as', False),
    'astija': ('ast', False),
    'astije': ('ast', False),
    'astiji': ('ast', False),
    'astima': ('ast', False),
    'astimo': ('as', False),
    'astite': ('as', False),
    'astoga': ('ast', False),
    'astome': ('ast', False),
    'astomu': ('ast', False),
    'astuci': ('as', True),
    'astući': ('as', False),
    'atijeg': ('at', False),
    'atijem': ('at', False),
    'atijih': ('at', False),
    'atijim': ('at', False),
    'avajmo': ('ava', False),
    'avajte': ('ava', False),
    'avasmo': ('ava', False),
    'avaste': ('ava', False),
    'avijeg': ('av', False),
    'avijem': ('av', False),
    'avijih': ('av', False),
    'avijim': ('av', False),
    'avijoj': ('av', False),
    'ačasmo': ('ača', False),
    'ačaste': ('ača', False),
    'ačavši': ('ača', False),
    'ačismo': ('ač', False),
    'ačiste': ('ač', False),
    'basama': ('bas', True),
    'basima': ('bas', True),
    'bašama': ('baš', False),
    'bašima': ('baš', False),
    'bijama': ('bij', False),
    'bijima': ('bij', False),
    'cajama': ('caj', False),
    'cajeva': ('caj', False),
    'cajeve': ('caj', False),
    'cajevi': ('caj', False),
    'cajima': ('caj', False),
    'cijama': ('cij', False),
    'cijima': ('cij', False),
    'cinama': ('cin', True),
    'cinima': ('cin', True),
    'cinoga': ('cin', True),
    'cinome': ('cin', True),
    'cinomu': ('cin', True),
    'dijama': ('dij', False),
    'dijima': ('dij', False),
    'elijeg': ('el', False),
    'elijem': ('el', False),
    'elijih': ('el', False),
    'elijim': ('el', False),
    'elijoj': ('el', False),
    'enjega': ('enj', False),
    'enjemu': ('enj', False),
    'enjija': ('enj', False),
    'enjije': ('enj', False),
    'enjiji': ('enj', False),
    'enjiju': ('enj', False),
    'enjima': ('enj', False),
    'enjoga': ('enj', False),
    'enjome': ('enj', False),
    'enjomu': ('enj', False),
    'estama': ('est', False),
    'estima': ('est', False),
    'etavsi': ('et', True),
    'etavši': ('et', False),
    'evajmo': ('eva', False),
    'evajte': ('eva', False),
    'evasmo': ('eva', False),
    'evaste': ('eva', False),
    'evijeg': ('ev', False),
    'evijem': ('ev', False),
    'evijih': ('ev', False),
    'evijim': ('ev', False),
    'evijoj': ('ev', False),
    'evitem': ('evit', False),
    'evitih': ('evit', False),
    'evitim': ('evit', False),
    'evitog': ('evit', False),
    'evitoj': ('evit', False),
    'evitom': ('evit', False),
    'fijama': ('fij', False),
    'fijima': ('fij', False),
    'ganija': ('ganij', False),
    'ganije': ('ganij', False),
    'ganiji': ('ganij', False),
    'ganiju': ('ganij', False),
    'gasama': ('gas', True),
    'gasima': ('gas', True),
    'gašama': ('gaš', False),
    'gašima': ('gaš', False),
    'gijama': ('gij', False),
    'gijima': ('gij', False),
    'govima': ('g', False),
    'ijalom': ('ijal', False),
    'ikatom': ('ikat', False),
    'injahu': ('inj', False),
    'injala': ('inj', False),
    'injale': ('inj', False),
    'injali': ('inj', False),
    'injalo': ('inj', False),
    'injase': ('inj', True),
    'injati': ('inj', False),
    'injaše': ('inj', False),
    'injemo': ('inj', False),
    'injete': ('inj', False),
    'irasmo': ('ir', False),
    'iraste': ('ir', False),
    'iravsi': ('ir', True),
    'iravši': ('ir', False),
    'irivat': ('ir', False),
    'irujem': ('ir', False),
    'irujes': ('ir', True),
    'iruješ': ('ir', False),
    'irujmo': ('ir', False),
    'irujte': ('ir', False),
    'istade': ('ista', False),
    'istadu': ('ista', False),
    'istaje': ('istaj', False),
    'istaju': ('istaj', False),
    'istala': ('ista', False),
    'istale': ('ista', False),
    'istali': ('ista', False),
    'istalo': ('ista', False),
    'istama': ('ist', False),
    'istane': ('ista', False),
    'istanu': ('ista', False),
    'istati': ('ista', False),
    'istima': ('ist', False),
    'ivajmo': ('iva', False),
    'ivajte': ('iva', False),
    'ivasmo': ('iva', False),
    'ivaste': ('iva', False),
    'ivijeg': ('iv', False),
    'ivijem': ('iv', False),
    'ivijih': ('iv', False),
    'ivijim': ('iv', False),
    'ivijoj': ('iv', False),
    'ištima': ('išt', False),
    'jasama': ('jas', True),
    'jasima': ('jas', True),
    'jašama': ('jaš', False),
    'jašima': ('jaš', False),
    'jetila': ('jeti', False),
    'jetile': ('jeti', False),
    'jetili': ('jeti', False),
    'jetilo': ('jeti', False),
    'jetimo': ('jeti', False),
    'jetise': ('jeti', True),
    'jetite': ('jeti', False),
    'jetiti': ('jeti', False),
    'jetiše': ('jeti', False),
    'kasama': ('kas', True),
    'kasima': ('kas', True),
    'kašama': ('kaš', False),
    'kašima': ('kaš', False),
    'kijega': ('k', False),
    'kijemu': ('k', False),
    'kijima': ('k', False),
    'kstama': ('kst', False),
    'kstima': ('kst', False),
    'lajama': ('laj', False),
    'lajeva': ('laj', False),
    'lajeve': ('laj', False),
    'lajevi': ('laj', False),
    'lajima': ('laj', False),
    'latima': ('lat', False),
    'lemama': ('lem', False),
    'lemima': ('lem', False),
    'lijama': ('lij', False),
    'lijima': ('lij', False),
    'logama': ('log', False),
    'lovima': ('lov', False),
    'lucena': ('luc', True),
    'lucene': ('luc', True),
    'luceni': ('luc', True),
    'luceno': ('luc', True),
    'lucila': ('luc', True),
    'lucile': ('luc', True),
    'lucili': ('luc', True),
    'lucilo': ('luc', True),
    'lucimo': ('luc', True),
    'lucise': ('luc', True),
    'lucite': ('luc', True),
    'luciti': ('luc', True),
    'lucuje': ('luc', True),
    'lucuju': ('luc', True),
    'lučena': ('luč', False),
    'lučene': ('luč', False),
    'lučeni': ('luč', False),
    'lučeno': ('luč', False),
    'lučila': ('luč', False),
    'lučile': ('luč', False),
    'lučili': ('luč', False),
    'lučilo': ('luč', False),
    'lučimo': ('luč', False),
    'lučite': ('luč', False),
    'lučiti': ('luč', False),
    'lučiše': ('luč', False),
    'lučuje': ('luč', False),
    'lučuju': ('luč', False),
    'manija': ('manij', False),
    'manije': ('manij', False),
    'maniji': ('manij', False),
    'maniju': ('manij', False),
    'mijama': ('mij', False),
    'mijima': ('mij', False),
    'movima': ('mov', False),
    'nalama': ('nal', False),
    'nalima': ('nal', False),
    'nasama': ('nas', True),
    'nasima': ('nas', True),
    'našama': ('naš', False),
    'našima': ('naš', False),
    'nijama': ('nij', False),
    'nijega': ('n', False),
    'nijemu': ('n', False),
    'nijima': ('n', False),
    'osijeg': ('os', True),
    'osijem': ('os', True),
    'osijih': ('os', True),
    'osijim': ('os', True),
    'osijoj': ('os', True),
    'ostade': ('osta', False),
    'ostadu': ('osta', False),
    'ostaje': ('ostaj', False),
    'ostaju': ('ostaj', False),
    'ostala': ('osta', False),
    'ostale': ('osta', False),
    'ostali': ('osta', False),
    'ostalo': ('osta', False),
    'ostama': ('ost', False),
    'ostane': ('osta', False),
    'ostanu': ('osta', False),
    'ostati': ('osta', False),
    'ostima': ('ost', False),
    'otijem': ('oti', False),
    'ovasmo': ('ova', False),
    'ovaste': ('ova', False),
    'ovijeg': ('ov', False),
    'ovijem': ('ov', False),
    'ovijih': ('ov', False),
    'ovijim': ('ov', False),
    'ovijoj': ('ov', False),
    'ovitem': ('ovit', False),
    'ovitih': ('ovit', False),
    'ovitim': ('ovit', False),
    'ovitog': ('ovit', False),
    'ovitoj': ('ovit', False),
    'ovitom': ('ovit', False),
    'ozilom': ('ozil', False),
    'ošijeg': ('oš', False),
    'ošijem': ('oš', False),
    'ošijih': ('oš', False),
    'ošijim': ('oš', False),
    'ošijoj': ('oš', False),
    'panija': ('panij', False),
    'panije': ('panij', False),
    'paniji': ('panij', False),
    'paniju': ('panij', False),
    'pijama': ('pij', False),
    'pijima': ('pij', False),
    'rajama': ('raj', False),
    'rajeva': ('raj', False),
    'rajeve': ('raj', False),
    'rajevi': ('raj', False),
    'rajima': ('raj', False),
    'ramama': ('ram', False),
    'ranija': ('ranij', False),
    'ranije': ('ranij', False),
    'raniji': ('ranij', False),
    'raniju': ('ranij', False),
    'rarija': ('rari', False),
    'rariju': ('rari', False),
    'rijama': ('rij', False),
    'rijima': ('rij', False),
    'rosila': ('rosi', True),
    'rosile': ('rosi', True),
    'rosili': ('rosi', True),
    'rosilo': ('rosi', True),
    'rosimo': ('rosi', True),
    'rosise': ('rosi', True),
    'rosite': ('rosi', True),
    'rositi': ('rosi', True),
    'rošila': ('roši', False),
    'rošile': ('roši', False),
    'rošili': ('roši', False),
    'rošilo': ('roši', False),
    'rošimo': ('roši', False),
    'rošite': ('roši', False),
    'rošiti': ('roši', False),
    'rošiše': ('roši', False),
    'sijama': ('sij', False),
    'sijima': ('sij', False),
    'skijeg': ('sk', False),
    'skijem': ('sk', False),
    'skijih': ('sk', False),
    'skijim': ('sk', False),
    'skijoj': ('sk', False),
    'snjega': ('snj', True),
    'snjemu': ('snj', True),
    'snjija': ('snj', True),
    'snjije': ('snj', True),
    'snjiji': ('snj', True),
    'snjiju': ('snj', True),
    'snjima': ('snj', True),
    'snjoga': ('snj', True),
    'snjome': ('snj', True),
    'snjomu': ('snj', True),
    'stvima': ('stv', False),
    'tanija': ('tanij', False),
    'tanije': ('tanij', False),
    'taniji': ('tanij', False),
    'taniju': ('tanij', False),
    'tasama': ('tas', True),
    'tasima': ('tas', True),
    'tašama': ('taš', False),
    'tašima': ('taš', False),
    'tijama': ('tij', False),
    'tijima': ('tij', False),
    'urajmo': ('ur', False),
    'urajte': ('ur', False),
    'urasmo': ('ur', False),
    'uraste': ('ur', False),
    'uvajmo': ('uva', False),
    'uvajte': ('uva', False),
    'uvasmo': ('uva', False),
    'uvaste': ('uva', False),
    'vasama': ('vas', True),
    'vasima': ('vas', True),
    'vašama': ('vaš', False),
    'vašima': ('vaš', False),
    'zijama': ('zij', False),
    'zijima': ('zij', False),
    'ćajama': ('ćaj', False),
    'ćajeva': ('ćaj', False),
    'ćajeve': ('ćaj', False),
    'ćajevi': ('ćaj', False),
    'ćajima': ('ćaj', False),
    'čajama': ('čaj', False),
    'čajeva': ('čaj', False),
    'čajeve': ('čaj', False),
    'čajevi': ('čaj', False),
    'čajima': ('čaj', False),
    'činama': ('čin', False),
    'činima': ('čin', False),
    'činoga': ('čin', False),
    'činome': ('čin', False),
    'činomu': ('čin', False),
    'đajama': ('đaj', False),
    'đajeva': ('đaj', False),
    'đajeve': ('đaj', False),
    'đajevi': ('đaj', False),
    'đajima': ('đaj', False),
    'škijeg': ('šk', False),
    'škijem': ('šk', False),
    'škijih': ('šk', False),
    'škijim': ('šk', False),
    'škijoj': ('šk', False),
    'šnjega': ('šnj', False),
    'šnjemu': ('šnj', False),
    'šnjija': ('šnj', False),
    'šnjije': ('šnj', False),
    'šnjiji': ('šnj', False),
    'šnjiju': ('šnj', False),
    'šnjima': ('šnj', False),
    'šnjoga': ('šnj', False),
    'šnjome': ('šnj', False),
    'šnjomu': ('šnj', False),
    'štvima': ('štv', False),
    'žijama': ('žij', False),
    'žijima': ('žij', False),
    'acahu': ('aca', True),
    'acaju': ('aca', True),
    'acala': ('aca', True),
    'acale': ('aca', True),
    'acali': ('aca', True),
    'acalo': ('aca', True),
    'acamo': ('aca', True),
    'acana': ('aca', True),
    'acane': ('aca', True),
    'acani': ('aca', True),
    'acano': ('aca', True),
    'acase': ('aca', True),
    'acate': ('aca', True),
    'acati': ('aca', True),
    'aceci': ('ac', True),
    'acega': ('ac', True),
    'acemu': ('ac', True),
    'acena': ('ac', True),
    'acene': ('ac', True),
    'aceni': ('ac', True),
    'aceno': ('ac', True),
    'acila': ('ac', True),
    'acile': ('ac', True),
    'acili': ('ac', True),
    'acilo': ('ac', True),
    'acima': ('ac', True),
    'acimo': ('ac', True),
    'acise': ('ac', True),
    'acite': ('ac', True),
    'aciti': ('ac', True),
    'acoga': ('ac', True),
    'acome': ('ac', True),
    'acomu': ('ac', True),
    'ajama': ('aj', False),
    'ajeva': ('aj', False),
    'ajeve': ('aj', False),
    'ajevi': ('aj', False),
    'ajima': ('aj', False),
    'ajuci': ('a', True),
    'ajući': ('a', False),
    'alama': ('a', False),
    'alima': ('a', False),
    'anega': ('an', False),
    'anemu': ('an', False),
    'anima': ('an', False),
    'anina': ('an', False),
    'anine': ('an', False),
    'aninu': ('an', False),
    'anjeg': ('anj', False),
    'anjem': ('anj', False),
    'anjih': ('anj', False),
    'anjim': ('anj', False),
    'anjog': ('anj', False),
    'anjoj': ('anj', False),
    'anjom': ('anj', False),
    'arama': ('ar', False),
    'arima': ('ar', False),
    'astao': ('asta', False),
    'astat': ('asta', False),
    'astem': ('ast', False),
    'astes': ('as', True),
    'asteš': ('as', False),
    'astih': ('ast', False),
    'astim': ('ast', False),
    'astog': ('ast', False),
    'astoj': ('ast', False),
    'astom': ('ast', False),
    'atega': ('at', False),
    'atemu': ('at', False),
    'atija': ('at', False),
    'atije': ('at', False),
    'atiji': ('at', False),
    'atiju': ('at', False),
    'atima': ('at', False),
    'atoga': ('at', False),
    'atome': ('at', False),
    'atomu': ('at', False),
    'avahu': ('ava', False),
    'avaju': ('ava', False),
    'avala': ('ava', False),
    'avale': ('ava', False),
    'avali': ('ava', False),
    'avalo': ('ava', False),
    'avama': ('av', False),
    'avamo': ('ava', False),
    'avana': ('ava', False),
    'avane': ('ava', False),
    'avani': ('ava', False),
    'avano': ('ava', False),
    'avase': ('ava', True),
    'avate': ('ava', False),
    'avati': ('ava', False),
    'avaše': ('ava', False),
    'avega': ('av', False),
    'avemu': ('av', False),
    'avija': ('av', False),
    'avije': ('av', False),
    'aviji': ('av', False),
    'aviju': ('av', False),
    'avima': ('av', False),
    'avoga': ('av', False),
    'avome': ('av', False),
    'avomu': ('av', False),
    'aćega': ('ać', False),
    'aćemu': ('ać', False),
    'aćima': ('ać', False),
    'aćoga': ('ać', False),
    'aćome': ('ać', False),
    'aćomu': ('ać', False),
    'ačahu': ('ača', False),
    'ačaju': ('ača', False),
    'ačala': ('ača', False),
    'ačale': ('ača', False),
    'ačali': ('ača', False),
    'ačalo': ('ača', False),
    'ačamo': ('ača', False),
    'ačana': ('ača', False),
    'ačane': ('ača', False),
    'ačani': ('ača', False),
    'ačano': ('ača', False),
    'ačate': ('ača', False),
    'ačati': ('ača', False),
    'ačaše': ('ača', False),
    'ačena': ('ač', False),
    'ačene': ('ač', False),
    'ačeni': ('ač', False),
    'ačeno': ('ač', False),
    'ačeći': ('ač', False),
    'ačila': ('ač', False),
    'ačile': ('ač', False),
    'ačili': ('ač', False),
    'ačilo': ('ač', False),
    'ačimo': ('ač', False),
    'ačite': ('ač', False),
    'ačiti': ('ač', False),
    'ačiše': ('ač', False),
    'basem': ('bas', True),
    'basom': ('bas', True),
    'bašem': ('baš', False),
    'bašom': ('baš', False),
    'bijom': ('bij', False),
    'cajem': ('caj', False),
    'cijom': ('cij', False),
    'cinih': ('cin', True),
    'cinim': ('cin', True),
    'cinog': ('cin', True),
    'cinoj': ('cin', True),
    'cinom': ('cin', True),
    'dijom': ('dij', False),
    'drama': ('dr', False),
    'drima': ('dr', False),
    'ecega': ('ec', True),
    'ecemu': ('ec', True),
    'ecima': ('ec', True),
    'ecoga': ('ec', True),
    'ecome': ('ec', True),
    'ecomu': ('ec', True),
    'elama': ('e', False),
    'elega': ('el', False),
    'elemu': ('el', False),
    'elija': ('el', False),
    'elije': ('el', False),
    'eliji': ('el', False),
    'eliju': ('el', False),
    'elima': ('el', False),
    'eloga': ('el', False),
    'elome': ('el', False),
    'elomu': ('el', False),
    'enega': ('en', False),
    'enemu': ('en', False),
    'enjeg': ('enj', False),
    'enjem': ('enj', False),
    'enjih': ('enj', False),
    'enjim': ('enj', False),
    'enjog': ('enj', False),
    'enjoj': ('enj', False),
    'enjom': ('enj', False),
    'erama': ('er', False),
    'erima': ('er', False),
    'esama': ('es', True),
    'esima': ('es', False),
    'estom': ('est', False),
    'etama': ('et', False),
    'etemo': ('et', False),
    'etima': ('et', False),
    'etimo': ('et', False),
    'etuci': ('et', True),
    'etući': ('et', False),
    'evahu': ('eva', False),
    'evaju': ('eva', False),
    'evala': ('eva', False),
    'evale': ('eva', False),
    'evali': ('eva', False),
    'evalo': ('eva', False),
    'evama': ('ev', False),
    'evamo': ('eva', False),
    'evana': ('eva', False),
    'evane': ('eva', False),
    'evani': ('eva', False),
    'evano': ('eva', False),
    'evase': ('eva', True),
    'evate': ('eva', False),
    'evati': ('eva', False),
    'evaše': ('eva', False),
    'evega': ('ev', False),
    'evemu': ('ev', False),
    'evija': ('ev', False),
    'evije': ('ev', False),
    'eviji': ('ev', False),
    'eviju': ('ev', False),
    'evima': ('ev', False),
    'evita': ('evit', False),
    'evite': ('evit', False),
    'eviti': ('evit', False),
    'evito': ('evit', False),
    'evitu': ('evit', False),
    'evoga': ('ev', False),
    'evome': ('ev', False),
    'evomu': ('ev', False),
    'ećega': ('eć', False),
    'ećemu': ('eć', False),
    'ećima': ('eć', False),
    'ećoga': ('eć', False),
    'ećome': ('eć', False),
    'ećomu': ('eć', False),
    'ešama': ('eš', False),
    'ešima': ('eš', False),
    'fijom': ('fij', False),
    'gasem': ('gas', True),
    'gasom': ('gas', True),
    'gašem': ('gaš', False),
    'gašom': ('gaš', False),
    'gijom': ('gij', False),
    'ijala': ('ijal', False),
    'ijale': ('ijal', False),
    'ijali': ('ijal', False),
    'ijalo': ('ijal', False),
    'ijalu': ('ijal', False),
    'ijemo': ('i', False),
    'ijete': ('i', False),
    'ikata': ('ikat', False),
    'ikate': ('ikat', False),
    'ikati': ('ikat', False),
    'ikato': ('ikat', False),
    'ikatu': ('ikat', False),
    'ilama': ('i', False),
    'ilima': ('i', False),
    'inama': ('in', False),
    'inima': ('in', False),
    'injah': ('inj', False),
    'injao': ('inj', False),
    'injat': ('inj', False),
    'injem': ('inj', False),
    'injes': ('inj', True),
    'inješ': ('inj', False),
    'irahu': ('ir', False),
    'iraju': ('ir', False),
    'irala': ('ir', False),
    'irale': ('ir', False),
    'irali': ('ir', False),
    'iralo': ('ir', False),
    'iramo': ('ir', False),
    'irase': ('ir', True),
    'irate': ('ir', False),
    'irati': ('ir', False),
    'iraše': ('ir', False),
    'iruje': ('ir', False),
    'iruju': ('ir', False),
    'isama': ('is', True),
    'isima': ('is', False),
    'istao': ('ista', False),
    'istat': ('ista', False),
    'istem': ('ist', True),
    'istom': ('ist', False),
    'ivahu': ('iva', False),
    'ivaju': ('iva', False),
    'ivala': ('iva', False),
    'ivale': ('iva', False),
    'ivali': ('iva', False),
    'ivalo': ('iva', False),
    'ivama': ('iv', False),
    'ivamo': ('iva', False),
    'ivana': ('iva', False),
    'ivane': ('iva', False),
    'ivani': ('iva', False),
    'ivano': ('iva', False),
    'ivase': ('iva', True),
    'ivate': ('iva', False),
    'ivati': ('iva', False),
    'ivaše': ('iva', False),
    'ivega': ('iv', False),
    'ivemu': ('iv', False),
    'ivija': ('iv', False),
    'ivije': ('iv', False),
    'iviji': ('iv', False),
    'iviju': ('iv', False),
    'ivima': ('iv', False),
    'ivoga': ('iv', False),
    'ivome': ('iv', False),
    'ivomu': ('iv', False),
    'išama': ('iš', False),
    'išima': ('iš', False),
    'ištem': ('išt', False),
    'jasem': ('jas', True),
    'jasom': ('jas', True),
    'jašem': ('jaš', False),
    'jašom': ('jaš', False),
    'jetih': ('jeti', False),
    'jetim': ('jeti', False),
    'jetio': ('jeti', False),
    'jetis': ('jeti', True),
    'jetit': ('jeti', False),
    'jetiš': ('jeti', False),
    'kasem': ('kas', True),
    'kasom': ('kas', True),
    'kašem': ('kaš', False),
    'kašom': ('kaš', False),
    'kijeg': ('k', False),
    'kijem': ('k', False),
    'kijih': ('k', False),
    'kijim': ('k', False),
    'kijoj': ('k', False),
    'kstom': ('kst', False),
    'lajem': ('laj', False),
    'latom': ('lat', False),
    'lemom': ('lem', False),
    'lijem': ('li', False),
    'lijom': ('lij', False),
    'logom': ('log', False),
    'lovom': ('lov', False),
    'lucen': ('luc', True),
    'lucih': ('luc', True),
    'lucim': ('luc', True),
    'lucio': ('luc', True),
    'lucis': ('luc', True),
    'lucit': ('luc', True),
    'lucuj': ('luc', True),
    'lučen': ('luč', False),
    'lučih': ('luč', False),
    'lučim': ('luč', False),
    'lučio': ('luč', False),
    'lučit': ('luč', False),
    'lučiš': ('luč', False),
    'lučuj': ('luč', False),
    'mijom': ('mij', False),
    'movom': ('mov', False),
    'nalom': ('nal', False),
    'nasem': ('nas', True),
    'nasom': ('nas', True),
    'našem': ('naš', False),
    'našom': ('naš', False),
    'nijeg': ('n', False),
    'nijem': ('n', False),
    'nijih': ('n', False),
    'nijim': ('n', False),
    'nijoj': ('n', False),
    'nijom': ('nij', False),
    'nismo': ('ni', False),
    'niste': ('ni', False),
    'nivsi': ('ni', True),
    'nivši': ('ni', False),
    'nusmo': ('n', False),
    'nuste': ('n', False),
    'nuvsi': ('n', True),
    'nuvši': ('n', False),
    'olima': ('ol', False),
    'olova': ('olov', False),
    'olove': ('olov', False),
    'olovi': ('olov', False),
    'onima': ('on', False),
    'onova': ('on', False),
    'onove': ('on', False),
    'onovi': ('on', False),
    'orama': ('or', False),
    'orima': ('or', False),
    'osega': ('os', True),
    'osemu': ('os', True),
    'osija': ('os', True),
    'osije': ('os', True),
    'osiji': ('os', True),
    'osiju': ('os', True),
    'osima': ('os', True),
    'osoga': ('os', True),
    'osome': ('os', True),
    'osomu': ('os', True),
    'ostao': ('osta', False),
    'ostat': ('osta', False),
    'ostom': ('ost', False),
    'otija': ('oti', False),
    'otiju': ('oti', False),
    'ovahu': ('ova', False),
    'ovala': ('ova', False),
    'ovale': ('ova', False),
    'ovali': ('ova', False),
    'ovalo': ('ova', False),
    'ovase': ('ova', True),
    'ovati': ('ova', False),
    'ovaše': ('ova', False),
    'ovega': ('ov', False),
    'ovemu': ('ov', False),
    'ovija': ('ov', False),
    'ovije': ('ov', False),
    'oviji': ('ov', False),
    'oviju': ('ov', False),
    'ovima': ('ov', False),
    'ovita': ('ovit', False),
    'ovite': ('ovit', False),
    'oviti': ('ovit', False),
    'ovito': ('ovit', False),
    'ovitu': ('ovit', False),
    'ovoga': ('ov', False),
    'ovome': ('ov', False),
    'ovomu': ('ov', False),
    'ozila': ('ozil', False),
    'ozile': ('ozil', False),
    'ozili': ('ozil', False),
    'ozilu': ('ozil', False),
    'ošega': ('oš', False),
    'ošemu': ('oš', False),
    'ošija': ('oš', False),
    'ošije': ('oš', False),
    'ošiji': ('oš', False),
    'ošiju': ('oš', False),
    'ošima': ('oš', False),
    'ošoga': ('oš', False),
    'ošome': ('oš', False),
    'ošomu': ('oš', False),
    'pijom': ('pij', False),
    'rajem': ('raj', False),
    'ramom': ('ram', False),
    'rario': ('rari', False),
    'rijom': ('rij', False),
    'rosih': ('rosi', True),
    'rosim': ('rosi', True),
    'rosio': ('rosi', True),
    'rosis': ('rosi', True),
    'rosit': ('rosi', True),
    'roših': ('roši', False),
    'rošim': ('roši', False),
    'rošio': ('roši', False),
    'rošit': ('roši', False),
    'rošiš': ('roši', False),
    'sijem': ('si', False),
    'sijom': ('sij', False),
    'skega': ('sk', False),
    'skemu': ('sk', False),
    'skija': ('sk', False),
    'skije': ('sk', False),
    'skiji': ('sk', False),
    'skima': ('sk', False),
    'skoga': ('sk', False),
    'skome': ('sk', False),
    'skomu': ('sk', False),
    'snega': ('sn', True),
    'snemu': ('sn', True),
    'snjeg': ('snj', True),
    'snjem': ('snj', True),
    'snjih': ('snj', True),
    'snjim': ('snj', True),
    'snjog': ('snj', True),
    'snjoj': ('snj', True),
    'snjom': ('snj', True),
    'stvom': ('stv', False),
    'tajmo': ('ta', False),
    'tajte': ('ta', False),
    'tasem': ('tas', True),
    'tasmo': ('ta', False),
    'tasom': ('tas', True),
    'taste': ('ta', False),
    'tavsi': ('ta', True),
    'tavši': ('ta', False),
    'tašem': ('taš', False),
    'tašom': ('taš', False),
    'tijom': ('tij', False),
    'ucega': ('uc', True),
    'ucemu': ('uc', True),
    'ucima': ('uc', True),
    'ucoga': ('uc', True),
    'ucome': ('uc', True),
    'ucomu': ('uc', True),
    'ugama': ('ug', False),
    'ugova': ('ugov', False),
    'ugove': ('ugov', False),
    'ugovi': ('ugov', False),
    'ujemo': ('uj', False),
    'ujete': ('uj', False),
    'ujuci': ('uj', True),
    'ujući': ('uj', False),
    'urahu': ('ur', False),
    'uraju': ('ur', False),
    'urala': ('ur', False),
    'urale': ('ur', False),
    'urali': ('ur', False),
    'uralo': ('ur', False),
    'uramo': ('ur', False),
    'urana': ('ur', False),
    'urane': ('ur', False),
    'urani': ('ur', False),
    'urano': ('ur', False),
    'urase': ('ur', True),
    'urate': ('ur', False),
    'urati': ('ur', False),
    'uraše': ('ur', False),
    'uvahu': ('uva', False),
    'uvaju': ('uva', False),
    'uvala': ('uva', False),
    'uvale': ('uva', False),
    'uvali': ('uva', False),
    'uvalo': ('uva', False),
    'uvamo': ('uva', False),
    'uvana': ('uva', False),
    'uvane': ('uva', False),
    'uvani': ('uva', False),
    'uvano': ('uva', False),
    'uvase': ('uva', True),
    'uvate': ('uva', False),
    'uvati': ('uva', False),
    'uvaše': ('uva', False),
    'ućega': ('uć', False),
    'ućemu': ('uć', False),
    'ućima': ('uć', False),
    'ućoga': ('uć', False),
    'ućome': ('uć', False),
    'ućomu': ('uć', False),
    'vasem': ('vas', True),
    'vasom': ('vas', True),
    'vašem': ('vaš', False),
    'vašom': ('vaš', False),
    'zijom': ('zij', False),
    'ćajem': ('ćaj', False),
    'čajem': ('čaj', False),
    'činih': ('čin', False),
    'činim': ('čin', False),
    'činog': ('čin', False),
    'činoj': ('čin', False),
    'činom': ('čin', False),
    'đajem': ('đaj', False),
    'škega': ('šk', False),
    'škemu': ('šk', False),
    'škija': ('šk', False),
    'škije': ('šk', False),
    'škiji': ('šk', False),
    'škima': ('šk', False),
    'škoga': ('šk', False),
    'škome': ('šk', False),
    'škomu': ('šk', False),
    'šnega': ('šn', False),
    'šnemu': ('šn', False),
    'šnjeg': ('šnj', False),
    'šnjem': ('šnj', False),
    'šnjih': ('šnj', False),
    'šnjim': ('šnj', False),
    'šnjog': ('šnj', False),
    'šnjoj': ('šnj', False),
    'šnjom': ('šnj', False),
    'štvom': ('štv', False),
    'žijom': ('žij', False),
    'acah': ('aca', True),
    'acam': ('aca', True),
    'acan': ('aca', True),
    'acao': ('aca', True),
    'acas': ('aca', True),
    'acat': ('aca', True),
    'aceg': ('ac', True),
    'acem': ('ac', True),
    'acen': ('ac', True),
    'acih': ('ac', True),
    'acim': ('ac', True),
    'acio': ('ac', True),
    'acis': ('ac', True),
    'acit': ('ac', True),
    'acog': ('ac', True),
    'acoj': ('ac', True),
    'acom': ('ac', True),
    'acuh': ('ac', True),
    'ajem': ('a', False),
    'ajmo': ('a', False),
    'ajte': ('a', False),
    'aloj': ('a', False),
    'alom': ('a', False),
    'aneg': ('an', False),
    'anem': ('an', False),
    'anin': ('an', False),
    'anja': ('anj', False),
    'anje': ('anj', False),
    'anji': ('anj', False),
    'anjo': ('anj', False),
    'anju': ('anj', False),
    'anom': ('an', False),
    'arom': ('ar', False),
    'asla': ('as', False),
    'asle': ('as', False),
    'asli': ('as', False),
    'aslo': ('as', False),
    'asmo': ('a', False),
    'asta': ('ast', False),
    'aste': ('ast', False),
    'asti': ('ast', False),
    'asto': ('ast', False),
    'astu': ('ast', False),
    'ateg': ('at', False),
    'atem': ('at', False),
    'atih': ('at', False),
    'atim': ('at', False),
    'atog': ('at', False),
    'atoj': ('at', False),
    'atom': ('at', False),
    'avah': ('ava', False),
    'avaj': ('ava', False),
    'avam': ('ava', False),
    'avan': ('ava', False),
    'avao': ('ava', False),
    'avas': ('ava', True),
    'avat': ('ava', False),
    'avav': ('ava', False),
    'avaš': ('ava', False),
    'aveg': ('av', False),
    'avem': ('av', False),
    'avih': ('av', False),
    'avim': ('av', False),
    'avog': ('av', False),
    'avoj': ('av', False),
    'avom': ('av', False),
    'avsi': ('a', True),
    'avši': ('a', False),
    'aćeg': ('ać', False),
    'aćem': ('ać', False),
    'aćih': ('ać', False),
    'aćim': ('ać', False),
    'aćog': ('ać', False),
    'aćoj': ('ać', False),
    'aćom': ('ać', False),
    'aćuh': ('ać', False),
    'ačah': ('ača', False),
    'ačam': ('ača', False),
    'ačan': ('ača', False),
    'ačao': ('ača', False),
    'ačat': ('ača', False),
    'ačaš': ('ača', False),
    'ačen': ('ač', False),
    'ačih': ('ač', False),
    'ačim': ('ač', False),
    'ačio': ('ač', False),
    'ačit': ('ač', False),
    'ačiš': ('ač', False),
    'basa': ('bas', True),
    'base': ('bas', True),
    'basi': ('bas', True),
    'basu': ('bas', True),
    'baša': ('baš', False),
    'baše': ('baš', False),
    'baši': ('baš', False),
    'bašu': ('baš', False),
    'bija': ('bij', False),
    'bije': ('bij', False),
    'biji': ('bij', False),
    'bijo': ('bij', False),
    'biju': ('bij', False),
    'caja': ('caj', False),
    'caje': ('caj', False),
    'caji': ('caj', False),
    'caju': ('caj', False),
    'cija': ('cij', False),
    'cije': ('cij', False),
    'ciji': ('cij', False),
    'cijo': ('cij', False),
    'ciju': ('cij', False),
    'cina': ('cin', True),
    'cine': ('cin', True),
    'cini': ('cin', True),
    'cino': ('cin', True),
    'cinu': ('cin', True),
    'dija': ('dij', False),
    'dije': ('dij', False),
    'diji': ('dij', False),
    'dijo': ('dij', False),
    'diju': ('dij', False),
    'drom': ('dr', False),
    'eceg': ('ec', True),
    'ecem': ('ec', True),
    'ecih': ('ec', True),
    'ecim': ('ec', True),
    'ecog': ('ec', True),
    'ecoj': ('ec', True),
    'ecom': ('ec', True),
    'ecuh': ('ec', True),
    'eleg': ('el', False),
    'elem': ('el', False),
    'elih': ('el', False),
    'elim': ('el', False),
    'elog': ('el', False),
    'eloj': ('el', False),
    'elom': ('el', False),
    'eneg': ('en', False),
    'enem': ('en', False),
    'enja': ('enj', False),
    'enje': ('enj', False),
    'enji': ('enj', False),
    'enjo': ('enj', False),
    'enju': ('enj', False),
    'erom': ('er', False),
    'esem': ('es', True),
    'esom': ('es', False),
    'esta': ('est', False),
    'este': ('est', False),
    'esti': ('est', False),
    'esto': ('est', False),
    'estu': ('est', False),
    'etem': ('et', False),
    'etes': ('et', True),
    'eteš': ('et', False),
    'etom': ('et', False),
    'evah': ('eva', False),
    'evaj': ('eva', False),
    'evam': ('eva', False),
    'evan': ('eva', False),
    'evao': ('eva', False),
    'evas': ('eva', True),
    'evat': ('eva', False),
    'evav': ('eva', False),
    'evaš': ('eva', False),
    'eveg': ('ev', False),
    'evem': ('ev', False),
    'evih': ('ev', False),
    'evim': ('ev', False),
    'evog': ('ev', False),
    'evoj': ('ev', False),
    'evom': ('ev', False),
    'ećeg': ('eć', False),
    'ećem': ('eć', False),
    'ećih': ('eć', False),
    'ećim': ('eć', False),
    'ećog': ('eć', False),
    'ećoj': ('eć', False),
    'ećom': ('eć', False),
    'ećuh': ('eć', False),
    'ešem': ('eš', False),
    'ešom': ('eš', False),
    'fija': ('fij', False),
    'fije': ('fij', False),
    'fiji': ('fij', False),
    'fijo': ('fij', False),
    'fiju': ('fij', False),
    'gama': ('g', False),
    'gasa': ('gas', True),
    'gase': ('gas', True),
    'gasi': ('gas', True),
    'gasu': ('gas', True),
    'gaša': ('gaš', False),
    'gaše': ('gaš', False),
    'gaši': ('gaš', False),
    'gašu': ('gaš', False),
    'gija': ('gij', False),
    'gije': ('gij', False),
    'giji': ('gij', False),
    'gijo': ('gij', False),
    'giju': ('gij', False),
    'gova': ('g', False),
    'gove': ('g', False),
    'govi': ('g', False),
    'ieci': ('i', True),
    'ieći': ('i', False),
    'ijem': ('i', False),
    'ijes': ('i', True),
    'iješ': ('i', False),
    'ijmo': ('i', False),
    'ijte': ('i', False),
    'ilom': ('i', False),
    'inom': ('in', False),
    'irah': ('ir', False),
    'iral': ('ir', False),
    'iram': ('ir', False),
    'iran': ('ir', False),
    'irao': ('ir', False),
    'iras': ('ir', True),
    'irat': ('ir', False),
    'iraš': ('ir', False),
    'iruj': ('ir', False),
    'isem': ('is', True),
    'ismo': ('i', False),
    'isom': ('is', False),
    'ista': ('ist', False),
    'iste': ('ist', False),
    'isti': ('ist', False),
    'isto': ('ist', False),
    'istu': ('ist', False),
    'ivah': ('iva', False),
    'ivaj': ('iva', False),
    'ivam': ('iva', False),
    'ivan': ('iva', False),
    'ivao': ('iva', False),
    'ivas': ('iva', True),
    'ivat': ('iva', False),
    'ivav': ('iva', False),
    'ivaš': ('iva', False),
    'iveg': ('iv', False),
    'ivem': ('iv', False),
    'ivih': ('iv', False),
    'ivim': ('iv', False),
    'ivog': ('iv', False),
    'ivoj': ('iv', False),
    'ivom': ('iv', False),
    'ivsi': ('i', True),
    'ivši': ('i', False),
    'išem': ('iš', False),
    'išom': ('iš', False),
    'išta': ('išt', False),
    'ište': ('išt', False),
    'ištu': ('išt', False),
    'jasa': ('jas', True),
    'jase': ('jas', True),
    'jasi': ('jas', True),
    'jasu': ('jas', True),
    'jaša': ('jaš', False),
    'jaše': ('jaš', False),
    'jaši': ('jaš', False),
    'jašu': ('jaš', False),
    'kasa': ('kas', True),
    'kase': ('kas', True),
    'kasi': ('kas', True),
    'kasu': ('kas', True),
    'kaša': ('kaš', False),
    'kaše': ('kaš', False),
    'kaši': ('kaš', False),
    'kašu': ('kaš', False),
    'kega': ('k', False),
    'kemu': ('k', False),
    'kija': ('k', False),
    'kije': ('k', False),
    'kiji': ('k', False),
    'kiju': ('k', False),
    'kima': ('k', False),
    'koga': ('k', False),
    'kome': ('k', False),
    'komu': ('k', False),
    'ksta': ('kst', False),
    'kste': ('kst', False),
    'ksti': ('kst', False),
    'ksto': ('kst', False),
    'kstu': ('kst', False),
    'laja': ('laj', False),
    'laje': ('laj', False),
    'laji': ('laj', False),
    'laju': ('laj', False),
    'lata': ('lat', False),
    'late': ('lat', False),
    'lati': ('lat', False),
    'lato': ('lat', False),
    'latu': ('lat', False),
    'lema': ('lem', False),
    'leme': ('lem', False),
    'lemi': ('lem', False),
    'lemo': ('lem', False),
    'lemu': ('lem', False),
    'lija': ('li', False),
    'lije': ('lij', False),
    'liji': ('lij', False),
    'lijo': ('lij', False),
    'liju': ('li', False),
    'loga': ('log', False),
    'loge': ('log', False),
    'logu': ('log', False),
    'lova': ('lov', False),
    'love': ('lov', False),
    'lovi': ('lov', False),
    'lovu': ('lov', False),
    'luce': ('luc', True),
    'luci': ('luc', True),
    'luče': ('luč', False),
    'luči': ('luč', False),
    'mija': ('mij', False),
    'mije': ('mij', False),
    'miji': ('mij', False),
    'mijo': ('mij', False),
    'miju': ('mij', False),
    'mova': ('mov', False),
    'move': ('mov', False),
    'movi': ('mov', False),
    'movu': ('mov', False),
    'nala': ('nal', False),
    'nale': ('nal', False),
    'nali': ('nal', False),
    'nalo': ('nal', False),
    'nalu': ('nal', False),
    'nasa': ('nas', True),
    'nase': ('nas', True),
    'nasi': ('nas', True),
    'nasu': ('nas', True),
    'naša': ('naš', False),
    'naše': ('naš', False),
    'naši': ('naš', False),
    'našu': ('naš', False),
    'nega': ('n', False),
    'nemo': ('n', False),
    'nemu': ('n', False),
    'nete': ('n', False),
    'nija': ('n', False),
    'nije': ('n', False),
    'niji': ('n', False),
    'nijo': ('nij', False),
    'niju': ('n', False),
    'nila': ('ni', False),
    'nile': ('ni', False),
    'nili': ('ni', False),
    'nilo': ('ni', False),
    'nima': ('n', False),
    'nimo': ('n', False),
    'nite': ('n', False),
    'niti': ('ni', False),
    'noga': ('n', False),
    'nome': ('n', False),
    'nomu': ('n', False),
    'nuci': ('n', True),
    'nula': ('n', False),
    'nule': ('n', False),
    'nuli': ('n', False),
    'nulo': ('n', False),
    'nuta': ('n', False),
    'nuti': ('n', False),
    'nuto': ('n', False),
    'nući': ('n', False),
    'olom': ('ol', False),
    'onom': ('on', False),
    'orom': ('or', False),
    'oseg': ('os', True),
    'osem': ('os', True),
    'osih': ('os', True),
    'osim': ('os', True),
    'osog': ('os', True),
    'osoj': ('os', True),
    'osom': ('os', True),
    'osta': ('ost', False),
    'oste': ('ost', False),
    'osti': ('ost', False),
    'osto': ('ost', False),
    'ostu': ('ost', False),
    'otio': ('oti', False),
    'ovah': ('ova', False),
    'ovao': ('ova', False),
    'ovat': ('ova', False),
    'oveg': ('ov', False),
    'ovih': ('ov', False),
    'ovim': ('ov', False),
    'ovog': ('ov', False),
    'ovoj': ('ov', False),
    'ovom': ('ov', False),
    'ošeg': ('oš', False),
    'ošem': ('oš', False),
    'oših': ('oš', False),
    'ošim': ('oš', False),
    'ošog': ('oš', False),
    'ošoj': ('oš', False),
    'ošom': ('oš', False),
    'pija': ('pij', False),
    'pije': ('pij', False),
    'piji': ('pij', False),
    'pijo': ('pij', False),
    'piju': ('pij', False),
    'raja': ('raj', False),
    'raje': ('raj', False),
    'raji': ('raj', False),
    'raju': ('raj', False),
    'rama': ('ram', False),
    'rame': ('ram', False),
    'rami': ('ram', False),
    'ramo': ('ram', False),
    'ramu': ('ram', False),
    'rija': ('rij', False),
    'rije': ('rij', False),
    'riji': ('rij', False),
    'rijo': ('rij', False),
    'riju': ('rij', False),
    'sija': ('si', False),
    'sije': ('sij', False),
    'siji': ('sij', False),
    'sijo': ('sij', False),
    'siju': ('si', False),
    'skem': ('sk', False),
    'skih': ('sk', False),
    'skim': ('sk', False),
    'skog': ('sk', False),
    'skoj': ('sk', False),
    'skom': ('sk', False),
    'sneg': ('sn', True),
    'snem': ('sn', True),
    'snja': ('snj', True),
    'snje': ('snj', True),
    'snji': ('snj', True),
    'snjo': ('snj', True),
    'snju': ('snj', True),
    'stva': ('stv', False),
    'stvo': ('stv', False),
    'stvu': ('stv', False),
    'taju': ('ta', False),
    'tala': ('ta', False),
    'tale': ('ta', False),
    'tali': ('ta', False),
    'talo': ('ta', False),
    'tamo': ('ta', False),
    'tana': ('ta', False),
    'tane': ('ta', False),
    'tani': ('ta', False),
    'tano': ('ta', False),
    'tasa': ('tas', True),
    'tase': ('tas', True),
    'tasi': ('tas', True),
    'tasu': ('tas', True),
    'tate': ('ta', False),
    'tati': ('ta', False),
    'taša': ('taš', False),
    'taše': ('taš', False),
    'taši': ('taš', False),
    'tašu': ('taš', False),
    'tija': ('tij', False),
    'tije': ('tij', False),
    'tiji': ('tij', False),
    'tijo': ('tij', False),
    'tiju': ('tij', False),
    'uceg': ('uc', True),
    'ucem': ('uc', True),
    'ucih': ('uc', True),
    'ucim': ('uc', True),
    'ucog': ('uc', True),
    'ucoj': ('uc', True),
    'ucom': ('uc', True),
    'ucuh': ('uc', True),
    'ugom': ('ug', False),
    'ujem': ('uj', False),
    'ujes': ('uj', True),
    'uješ': ('uj', False),
    'ujmo': ('uj', False),
    'urah': ('ur', False),
    'uraj': ('ur', False),
    'ural': ('ur', False),
    'uram': ('ur', False),
    'uran': ('ur', False),
    'urao': ('ur', False),
    'uras': ('ur', True),
    'urat': ('ur', False),
    'uraš': ('ur', False),
    'uvah': ('uva', False),
    'uvaj': ('uva', False),
    'uvam': ('uva', False),
    'uvan': ('uva', False),
    'uvao': ('uva', False),
    'uvas': ('uva', True),
    'uvat': ('uva', False),
    'uvav': ('uva', False),
    'uvaš': ('uva', False),
    'ućeg': ('uć', False),
    'ućem': ('uć', False),
    'ućih': ('uć', False),
    'ućim': ('uć', False),
    'ućog': ('uć', False),
    'ućoj': ('uć', False),
    'ućom': ('uć', False),
    'ućuh': ('uć', False),
    'vasa': ('vas', True),
    'vase': ('vas', True),
    'vasi': ('vas', True),
    'vasu': ('vas', True),
    'vaša': ('vaš', False),
    'vaše': ('vaš', False),
    'vaši': ('vaš', False),
    'vašu': ('vaš', False),
    'zija': ('zij', False),
    'zije': ('zij', False),
    'ziji': ('zij', False),
    'zijo': ('zij', False),
    'ziju': ('zij', False),
    'ćaja': ('ćaj', False),
    'ćaje': ('ćaj', False),
    'ćaji': ('ćaj', False),
    'ćaju': ('ćaj', False),
    'čaja': ('čaj', False),
    'čaje': ('čaj', False),
    'čaji': ('čaj', False),
    'čaju': ('čaj', False),
    'čina': ('čin', False),
    'čine': ('čin', False),
    'čini': ('čin', False),
    'čino': ('čin', False),
    'činu': ('čin', False),
    'đaja': ('đaj', False),
    'đaje': ('đaj', False),
    'đaji': ('đaj', False),
    'đaju': ('đaj', False),
    'škem': ('šk', False),
    'ških': ('šk', False),
    'škim': ('šk', False),
    'škog': ('šk', False),
    'škoj': ('šk', False),
    'škom': ('šk', False),
    'šneg': ('šn', False),
    'šnem': ('šn', False),
    'šnja': ('šnj', False),
    'šnje': ('šnj', False),
    'šnji': ('šnj', False),
    'šnjo': ('šnj', False),
    'šnju': ('šnj', False),
    'štva': ('štv', False),
    'štvo': ('štv', False),
    'štvu': ('štv', False),
    'žija': ('žij', False),
    'žije': ('žij', False),
    'žiji': ('žij', False),
    'žijo': ('žij', False),
    'žiju': ('žij', False),
    'aca': ('ac', True),
    'ace': ('ac', True),
    'aci': ('ac', True),
    'ahu': ('a', False),
    'aja': ('aj', False),
    'aje': ('a', False),
    'aji': ('aj', False),
    'aju': ('a', False),
    'ala': ('a', False),
    'ale': ('a', False),
    'ali': ('a', False),
    'alo': ('a', False),
    'alu': ('a', False),
    'amo': ('a', False),
    'ana': ('an', False),
    'ane': ('an', False),
    'ani': ('an', False),
    'ano': ('a', False),
    'anu': ('an', False),
    'ara': ('ar', False),
    'are': ('ar', False),
    'ari': ('ar', False),
    'aru': ('ar', False),
    'ase': ('a', True),
    'ata': ('at', False),
    'ate': ('a', False),
    'ati': ('a', False),
    'ato': ('at', False),
    'atu': ('at', False),
    'ava': ('av', False),
    'ave': ('av', False),
    'avi': ('av', False),
    'avo': ('av', False),
    'avu': ('av', False),
    'aća': ('ać', False),
    'aće': ('ać', False),
    'ače': ('ač', False),
    'ači': ('ač', False),
    'aše': ('a', False),
    'dra': ('dr', False),
    'dre': ('dr', False),
    'dri': ('dr', False),
    'dru': ('dr', False),
    'eca': ('ec', True),
    'ece': ('ec', True),
    'ela': ('el', False),
    'ele': ('el', False),
    'eli': ('el', False),
    'elo': ('el', False),
    'elu': ('el', False),
    'emo': ('e', False),
    'era': ('er', False),
    'ere': ('er', False),
    'eri': ('er', False),
    'eru': ('er', False),
    'esa': ('es', False),
    'ese': ('es', False),
    'esi': ('es', True),
    'esu': ('es', False),
    'eta': ('et', False),
    'ete': ('et', False),
    'eti': ('et', False),
    'eto': ('et', False),
    'etu': ('et', False),
    'eva': ('ev', False),
    'eve': ('ev', False),
    'evi': ('ev', False),
    'evo': ('ev', False),
    'evu': ('ev', False),
    'eća': ('eć', False),
    'eće': ('eć', False),
    'eša': ('eš', False),
    'eše': ('eš', False),
    'eši': ('eš', False),
    'ešu': ('eš', False),
    'gom': ('g', False),
    'ije': ('i', False),
    'iju': ('i', False),
    'ila': ('i', False),
    'ile': ('i', False),
    'ili': ('i', False),
    'ilo': ('i', False),
    'ilu': ('i', False),
    'imo': ('i', False),
    'ina': ('in', False),
    'ine': ('in', False),
    'ini': ('in', False),
    'ino': ('in', False),
    'inu': ('in', False),
    'isa': ('is', False),
    'ise': ('is', False),
    'isi': ('is', True),
    'isu': ('is', False),
    'ite': ('i', False),
    'iti': ('i', False),
    'iva': ('iv', False),
    'ive': ('iv', False),
    'ivi': ('iv', False),
    'ivo': ('iv', False),
    'ivu': ('iv', False),
    'iša': ('iš', False),
    'iše': ('iš', False),
    'iši': ('iš', False),
    'išu': ('iš', False),
    'keg': ('k', False),
    'kem': ('k', False),
    'kih': ('k', False),
    'kim': ('k', False),
    'kog': ('k', False),
    'koj': ('k', False),
    'kom': ('k', False),
    'kov': ('k', False),
    'lio': ('li', False),
    'neg': ('n', False),
    'nem': ('n', False),
    'nes': ('n', True),
    'neš': ('n', False),
    'nih': ('n', False),
    'nim': ('n', False),
    'nio': ('ni', False),
    'nis': ('ni', True),
    'niš': ('ni', False),
    'nog': ('n', False),
    'noj': ('n', False),
    'nom': ('n', False),
    'nuo': ('n', False),
    'nut': ('n', False),
    'ola': ('ol', False),
    'ole': ('ol', False),
    'oli': ('ol', False),
    'olu': ('ol', False),
    'ona': ('on', False),
    'one': ('on', False),
    'oni': ('on', False),
    'onu': ('on', False),
    'ora': ('or', False),
    'ore': ('or', False),
    'ori': ('or', False),
    'oru': ('or', False),
    'osa': ('os', True),
    'ose': ('os', True),
    'osi': ('os', True),
    'osu': ('os', True),
    'ova': ('ov', False),
    'ove': ('ov', False),
    'ovi': ('ov', False),
    'ovo': ('ov', False),
    'ovu': ('ov', False),
    'oša': ('oš', False),
    'oše': ('oš', False),
    'oši': ('oš', False),
    'ošu': ('oš', False),
    'sio': ('si', False),
    'ska': ('sk', False),
    'ske': ('sk', False),
    'ski': ('sk', False),
    'sko': ('sk', False),
    'sku': ('sk', False),
    'tah': ('ta', False),
    'taj': ('ta', False),
    'tam': ('ta', False),
    'tan': ('ta', False),
    'tao': ('ta', False),
    'tas': ('ta', True),
    'tat': ('ta', False),
    'taš': ('ta', False),
    'uca': ('uc', True),
    'uce': ('uc', True),
    'uga': ('ug', False),
    'uge': ('ug', False),
    'ugi': ('ug', False),
    'ugo': ('ug', False),
    'ugu': ('ug', False),
    'uje': ('uj', False),
    'uju': ('uj', False),
    'uća': ('uć', False),
    'uće': ('uć', False),
    'ška': ('šk', False),
    'ške': ('šk', False),
    'ški': ('šk', False),
    'ško': ('šk', False),
    'šku': ('šk', False),
    'ah': ('a', False),
    'aj': ('a', False),
    'al': ('a', False),
    'am': ('a', False),
    'an': ('a', False),
    'ao': ('a', False),
    'as': ('a', True),
    'at': ('a', False),
    'aš': ('a', False),
    'el': ('e', False),
    'em': ('e', False),
    'es': ('e', True),
    'eš': ('e', False),
    'ga': ('g', False),
    'ge': ('g', False),
    'gi': ('g', False),
    'go': ('g', False),
    'gu': ('g', False),
    'ih': ('i', False),
    'ij': ('i', False),
    'il': ('i', False),
    'im': ('i', False),
    'io': ('i', False),
    'is': ('i', True),
    'it': ('i', False),
    'iš': ('i', False),
    'ka': ('k', False),
    'ke': ('k', False),
    'ki': ('k', False),
    'ko': ('k', False),
    'ku': ('k', False),
    'na': ('n', False),
    'ne': ('n', False),
    'ni': ('n', False),
    'no': ('n', False),
    'nu': ('n', False),
}

_SR_STEP3 = (
    'anih', 'anim', 'anog', 'anoj', 'enih', 'enim', 'enog', 'enoj', 
    'enom', 'ama', 'ani', 'ano', 'ena', 'eni', 'eno', 'enu', 'ima', 
    'oga', 'ost', 'og', 'om', 'a', 'e', 'i', 'o', 'u', 
)


_SR_STEP1_B = {
    s.encode("utf-8"): (r.encode("utf-8"), f) for s, (r, f) in _SR_STEP1.items()
}
_SR_STEP2_B = {
    s.encode("utf-8"): (r.encode("utf-8"), f) for s, (r, f) in _SR_STEP2.items()
}
_SR_STEP3_B = tuple(s.encode("utf-8") for s in _SR_STEP3)
_SR_MAX1 = max(len(s) for s in _SR_STEP1_B)
_SR_MAX2 = max(len(s) for s in _SR_STEP2_B)


def _sr_longest(b: bytes, table: dict, maxlen: int):
    for n in range(min(maxlen, len(b)), 0, -1):
        hit = table.get(b[-n:])
        if hit is not None:
            return n, hit
    return None


def serbian_stem(word: str) -> str:
    w = "".join(_SR_CYR.get(ch, ch) for ch in word)
    # prelude scans (a replacement is re-examined at the same position)
    for pat, repl in (("ije", "e"), ("je", "e")):
        i = 0
        while i < len(w):
            if (
                w[i] in _SR_SA
                and w[i + 1 : i + 1 + len(pat)] == pat
                and i + 1 + len(pat) < len(w)
                and w[i + 1 + len(pat)] in _SR_SA
            ):
                w = w[: i + 1] + repl + w[i + 1 + len(pat) :]
            else:
                i += 1
    w = w.replace("dj", "\u0111")
    no_dia = not any(ch in _SR_DIA for ch in w)
    b = w.encode("utf-8")
    # p1 (byte offsets)
    n = len(b)
    p1 = n
    i = 0
    while i < n and chr(b[i]) not in _SR_VOWEL:
        i += _u8len(b, i)
    if i < n:
        p1 = i + 1
        if p1 <= 1:
            j = p1
            while j < n and chr(b[j]) in _SR_VOWEL:
                j += 1
            if j < n:
                p1 = j + _u8len(b, j)
    # syllabic-r adjustment: first 'r' in the word
    rp = b.find(b"r")
    if rp == 0:
        j = 1
        while j < n and b[j : j + 1] == b"r":
            j += 1
        if j < n:
            cand = j + _u8len(b, j)
            if p1 - cand > 1:
                p1 = cand
    elif rp > 0:
        if p1 - (rp + 1) > 1:
            p1 = rp + 1
    # step 1 (no region gate)
    hit = _sr_longest(b, _SR_STEP1_B, _SR_MAX1)
    if hit is not None:
        ln, (repl, flagged) = hit
        if not flagged or no_dia:
            b = b[: len(b) - ln] + repl
    # step 2 OR step 3
    done = False
    hit = _sr_longest(b, _SR_STEP2_B, _SR_MAX2)
    if hit is not None:
        ln, (repl, flagged) = hit
        if len(b) - ln >= p1 and (not flagged or no_dia):
            b = b[: len(b) - ln] + repl
            done = True
    if not done:
        for suf in _SR_STEP3_B:
            if b.endswith(suf):
                if len(b) - len(suf) >= p1:
                    b = b[: len(b) - len(suf)]
                break
    return b.decode("utf-8", "replace")



# ---------------------------------------------------------------------------
# Arabic
# ---------------------------------------------------------------------------
# Snowball 'arabic' (reference StemmerType::Arabic; Assem Chelli's
# algorithm). Tables + control flow decoded from dict_snowball.so
# (arabic_UTF_8_stem disassembly): Checks1 sets is_noun/is_verb/
# is_defined from a definite-article prefix; Normalize_pre strips
# tashkeel and maps digits / presentation forms; the suffix phase is
# a verb-alternatives-or-noun-chain-or-alef-maqsura disjunction with
# whole-word char-length gates; the prefix phase runs hamza, waw/feh,
# article and verb-prefix steps at a moving cursor; Normalize_post
# folds final and medial hamza carriers. Oracle-verified
# (scripts/snowball_oracle.py).

_AR_NORM_PRE = {
    'ـ': None,
    'ً': None,
    'ٌ': None,
    'ٍ': None,
    'َ': None,
    'ُ': None,
    'ِ': None,
    'ّ': None,
    'ْ': None,
    '٠': '0',
    '١': '1',
    '٢': '2',
    '٣': '3',
    '٤': '4',
    '٥': '5',
    '٦': '6',
    '٧': '7',
    '٨': '8',
    '٩': '9',
    'ﺀ': 'ء',
    'ﺁ': 'آ',
    'ﺂ': 'آ',
    'ﺃ': 'أ',
    'ﺄ': 'أ',
    'ﺅ': 'ؤ',
    'ﺆ': 'ؤ',
    'ﺇ': 'إ',
    'ﺈ': 'إ',
    'ﺉ': 'ئ',
    'ﺊ': 'ئ',
    'ﺋ': 'ئ',
    'ﺌ': 'ئ',
    'ﺍ': 'ا',
    'ﺎ': 'ا',
    'ﺏ': 'ب',
    'ﺐ': 'ب',
    'ﺑ': 'ب',
    'ﺒ': 'ب',
    'ﺓ': 'ة',
    'ﺔ': 'ة',
    'ﺕ': 'ت',
    'ﺖ': 'ت',
    'ﺗ': 'ت',
    'ﺘ': 'ت',
    'ﺙ': 'ث',
    'ﺚ': 'ث',
    'ﺛ': 'ث',
    'ﺜ': 'ث',
    'ﺝ': 'ج',
    'ﺞ': 'ج',
    'ﺟ': 'ج',
    'ﺠ': 'ج',
    'ﺡ': 'ح',
    'ﺢ': 'ح',
    'ﺣ': 'ح',
    'ﺤ': 'ح',
    'ﺥ': 'خ',
    'ﺦ': 'خ',
    'ﺧ': 'خ',
    'ﺨ': 'خ',
    'ﺩ': 'د',
    'ﺪ': 'د',
    'ﺫ': 'ذ',
    'ﺬ': 'ذ',
    'ﺭ': 'ر',
    'ﺮ': 'ر',
    'ﺯ': 'ز',
    'ﺰ': 'ز',
    'ﺱ': 'س',
    'ﺲ': 'س',
    'ﺳ': 'س',
    'ﺴ': 'س',
    'ﺵ': 'ش',
    'ﺶ': 'ش',
    'ﺷ': 'ش',
    'ﺸ': 'ش',
    'ﺹ': 'ص',
    'ﺺ': 'ص',
    'ﺻ': 'ص',
    'ﺼ': 'ص',
    'ﺽ': 'ض',
    'ﺾ': 'ض',
    'ﺿ': 'ض',
    'ﻀ': 'ض',
    'ﻁ': 'ط',
    'ﻂ': 'ط',
    'ﻃ': 'ط',
    'ﻄ': 'ط',
    'ﻅ': 'ظ',
    'ﻆ': 'ظ',
    'ﻇ': 'ظ',
    'ﻈ': 'ظ',
    'ﻉ': 'ع',
    'ﻊ': 'ع',
    'ﻋ': 'ع',
    'ﻌ': 'ع',
    'ﻍ': 'غ',
    'ﻎ': 'غ',
    'ﻏ': 'غ',
    'ﻐ': 'غ',
    'ﻑ': 'ف',
    'ﻒ': 'ف',
    'ﻓ': 'ف',
    'ﻔ': 'ف',
    'ﻕ': 'ق',
    'ﻖ': 'ق',
    'ﻗ': 'ق',
    'ﻘ': 'ق',
    'ﻙ': 'ك',
    'ﻚ': 'ك',
    'ﻛ': 'ك',
    'ﻜ': 'ك',
    'ﻝ': 'ل',
    'ﻞ': 'ل',
    'ﻟ': 'ل',
    'ﻠ': 'ل',
    'ﻡ': 'م',
    'ﻢ': 'م',
    'ﻣ': 'م',
    'ﻤ': 'م',
    'ﻥ': 'ن',
    'ﻦ': 'ن',
    'ﻧ': 'ن',
    'ﻨ': 'ن',
    'ﻩ': 'ه',
    'ﻪ': 'ه',
    'ﻫ': 'ه',
    'ﻬ': 'ه',
    'ﻭ': 'و',
    'ﻮ': 'و',
    'ﻯ': 'ى',
    'ﻰ': 'ى',
    'ﻱ': 'ي',
    'ﻲ': 'ي',
    'ﻳ': 'ي',
    'ﻴ': 'ي',
    'ﻵ': 'لآ',
    'ﻶ': 'لآ',
    'ﻷ': 'لأ',
    'ﻸ': 'لأ',
    'ﻹ': 'لإ',
    'ﻺ': 'لإ',
    'ﻻ': 'لا',
    'ﻼ': 'لا',
}


# (suffix, min whole-word char length) — longest-first; a longest
# match whose length gate fails ends the step (no shorter fallback)
_AR_SVS1 = (
    ("\u0643\u0645\u0648", 5), ("\u0643\u0645\u0627", 5),
    ("\u0647\u0645\u0627", 5), ("\u0643\u0645", 4),
    ("\u0647\u0645", 4), ("\u0643\u0646", 4), ("\u0647\u0646", 4),
    ("\u0646\u064a", 4), ("\u0646\u0627", 4), ("\u0647\u0627", 4),
    ("\u0643", 3), ("\u0647", 3),
)
_AR_SVS2A = (
    ("\u062a\u0645\u0627", 5), ("\u0648\u0646", 5),
    ("\u064a\u0646", 5), ("\u0627\u0646", 5), ("\u062a\u0646", 4),
    ("\u0646\u0627", 4), ("\u062a\u0627", 4), ("\u0646", 3),
    ("\u064a", 3), ("\u0627", 3), ("\u062a", 3),
)
_AR_SVS2B = (("\u062a\u0645", 4), ("\u0648\u0627", 4))
_AR_SVS2C = (("\u062a\u0645\u0648", 5), ("\u0648", 3))
_AR_SNS1A = (
    ("\u0643\u0645\u0627", 5), ("\u0647\u0645\u0627", 5),
    ("\u0643\u0645", 4), ("\u0647\u0645", 4), ("\u0647\u0646", 4),
    ("\u0646\u0627", 4), ("\u0647\u0627", 4), ("\u0643", 3),
    ("\u0647", 3), ("\u064a", 3),
)
_AR_SNS2A = (("\u0648", 4), ("\u064a", 4), ("\u0627", 4))
_AR_SNS2B = (("\u0627\u062a", 4),)
_AR_SNS2C1 = (("\u062a", 3),)


def _ar_del(w: str, table) -> tuple[str, bool]:
    for suf, ml in table:
        if w.endswith(suf):
            if len(w) > ml:
                return w[: -len(suf)], True
            return w, False
    return w, False


def arabic_stem(word: str) -> str:
    w = word
    is_noun = is_verb = True
    is_defined = False
    # Checks1
    if w.startswith(("\u0628\u0627\u0644", "\u0643\u0627\u0644")):
        if len(w) > 4:
            is_noun, is_verb, is_defined = True, False, True
    elif w.startswith(("\u0627\u0644", "\u0644\u0644")):
        if len(w) > 3:
            is_noun, is_verb, is_defined = True, False, True
    # Normalize_pre (forward scan; a replacement is skipped over)
    i = 0
    while i < len(w):
        for k in (w[i : i + 2], w[i : i + 1]):
            if k and k in _AR_NORM_PRE:
                repl = _AR_NORM_PRE[k]
                if repl is None:
                    w = w[:i] + w[i + len(k) :]
                else:
                    w = w[:i] + repl + w[i + len(k) :]
                    i += len(repl)
                break
        else:
            i += 1
    # ------ suffix phase ------
    done = False
    if is_verb:
        count = 0
        while True:
            w2, ok = _ar_del(w, _AR_SVS1)
            if not ok:
                break
            w = w2
            count += 1
        if count >= 1:
            w2, ok = _ar_del(w, _AR_SVS2A)
            if ok:
                w, done = w2, True
            else:
                w2, ok = _ar_del(w, _AR_SVS2C)
                if ok:
                    w, done = w2, True
                elif len(w) > 0:
                    done = True  # 'next' succeeds
        if not done:
            w2, ok = _ar_del(w, _AR_SVS2B)
            if ok:
                w, done = w2, True
            else:
                w2, ok = _ar_del(w, _AR_SVS2A)
                if ok:
                    w, done = w2, True
    if not done and is_noun:
        # try-chain, then Suffix_Noun_Step3, else alef maqsura
        def chain_2x(wx):
            # Step2a or Step2b or Step2c1 or next (returns w, reached)
            w3, ok3 = _ar_del(wx, _AR_SNS2A)
            if ok3:
                return w3, True
            w3, ok3 = _ar_del(wx, _AR_SNS2B)
            if ok3:
                return w3, True
            w3, ok3 = _ar_del(wx, _AR_SNS2C1)
            if ok3:
                return w3, True
            return wx, len(wx) > 0

        handled = False
        if w.endswith("\u0629") and len(w) > 3:
            w = w[:-1]
            handled = True
        if not handled and not is_defined:
            w2, ok = _ar_del(w, _AR_SNS1A)
            if ok:
                w, handled = w2, True
                w, nxt = chain_2x(w)
                if not nxt:
                    handled = False  # fall through to Step1b alternative
        if not handled:
            if w.endswith("\u0646") and len(w) > 5:
                w = w[:-1]
                handled = True
                w3, ok3 = _ar_del(w, _AR_SNS2A)
                if ok3:
                    w = w3
                else:
                    w3, ok3 = _ar_del(w, _AR_SNS2B)
                    if ok3:
                        w = w3
                    else:
                        w3, ok3 = _ar_del(w, _AR_SNS2C1)
                        if ok3:
                            w = w3
                        else:
                            handled = False
        if not handled and not is_defined:
            w2, ok = _ar_del(w, _AR_SNS2A)
            if ok:
                w, handled = w2, True
        if not handled:
            w2, ok = _ar_del(w, _AR_SNS2B)
            if ok:
                w = w2
        # Suffix_Noun_Step3
        if w.endswith("\u064a") and len(w) > 2:
            w = w[:-1]
            done = True
    if not done:
        # Suffix_All_alef_maqsura
        if w.endswith("\u0649"):
            w = w[:-1] + "\u064a"
    # ------ prefix phase ------
    c = 0
    if len(w) > 3 and w[:2] in (
        "\u0623\u0623", "\u0623\u0624", "\u0623\u0622",
        "\u0623\u0627", "\u0623\u0625",
    ):
        w = {
            "\u0623\u0623": "\u0623", "\u0623\u0624": "\u0623",
            "\u0623\u0622": "\u0622", "\u0623\u0627": "\u0627",
            "\u0623\u0625": "\u0625",
        }[w[:2]] + w[2:]
        c = 1
    if (
        len(w) > 3
        and w[c : c + 1] in ("\u0641", "\u0648")
        and w[c + 1 : c + 2] != "\u0627"
    ):
        w = w[:c] + w[c + 1 :]
    seg = w[c:]
    art = False
    if seg.startswith(("\u0628\u0627\u0644", "\u0643\u0627\u0644")):
        if len(w) > 5:
            w = w[:c] + seg[3:]
            art = True
    elif seg.startswith(("\u0627\u0644", "\u0644\u0644")):
        if len(w) > 4:
            w = w[:c] + seg[2:]
            art = True
    if not art:
        seg = w[c:]
        handled3b = False
        if is_noun:
            if seg.startswith("\u0628\u0628"):
                if len(w) > 3:
                    w = w[:c] + "\u0628" + seg[2:]
                    handled3b = True
            elif seg.startswith("\u0643\u0643"):
                if len(w) > 3:
                    w = w[:c] + "\u0643" + seg[2:]
                    handled3b = True
            elif seg.startswith("\u0628\u0627"):
                handled3b = True  # protected, no change
            elif seg.startswith("\u0628"):
                if len(w) > 3:
                    w = w[:c] + seg[1:]
                    handled3b = True
        if not handled3b and is_verb:
            seg = w[c:]
            if len(w) > 4 and seg[:2] in (
                "\u0633\u064a", "\u0633\u062a", "\u0633\u0646",
                "\u0633\u0623",
            ):
                w = w[:c] + {
                    "\u0633\u064a": "\u064a", "\u0633\u062a": "\u062a",
                    "\u0633\u0646": "\u0646", "\u0633\u0623": "\u0623",
                }[seg[:2]] + seg[2:]
                c += 1
            seg = w[c:]
            if len(w) > 4 and seg[:3] in (
                "\u062a\u0633\u062a", "\u0646\u0633\u062a",
                "\u064a\u0633\u062a",
            ):
                is_verb, is_noun = True, False
                w = w[:c] + "\u0627\u0633\u062a" + seg[3:]
    # ------ Normalize_post ------
    if w[-1:] in ("\u0622", "\u0623", "\u0624", "\u0625", "\u0626"):
        w = w[:-1] + "\u0621"
    out = []
    for ch in w:
        if ch in ("\u0622", "\u0623", "\u0625"):
            out.append("\u0627")
        elif ch == "\u0624":
            out.append("\u0648")
        elif ch == "\u0626":
            out.append("\u064a")
        else:
            out.append(ch)
    res = "".join(out)
    # ts_lexize parity: an empty stem yields the original word
    return word if res == "" else res



# ---------------------------------------------------------------------------
# Tamil
# ---------------------------------------------------------------------------
# Snowball 'tamil' (reference StemmerType::Tamil; Damodharan's
# algorithm). Control flow + every rule string decoded from
# dict_snowball.so (tamil_UTF_8_stem + fix_ending/fix_va helper
# disassembly): question/pronoun prefix removal with va-restoration,
# question suffixes, um, common word endings, vetrumai urupukal
# (case markers; sets the flag that arms fix_ending's \u0ba4\u0bcd\u0ba4\u0bcd
# rule), plural suffixes, command suffixes, then a repeat-while-match
# tense-suffix loop; fix_ending runs between phases (repeated where
# the compiled code loops it). Oracle-verified
# (scripts/snowball_oracle.py).

_TA_STOPS = frozenset("\u0b95\u0b9a\u0b9f\u0ba4\u0baa\u0bb1")
_TA_NASALS = frozenset(
    "\u0b95\u0b99\u0b9a\u0b9e\u0ba4\u0ba8\u0baa\u0bae\u0baf\u0bb5"
)
_TA_VS = frozenset(
    "\u0bc0\u0bc1\u0bc2\u0bc6\u0bc7\u0bc8\u0bbe\u0bbf"
)
_TA_LIQ_NAS = frozenset(
    "\u0baf\u0bb0\u0bb2\u0bb3\u0bb4\u0bb5"
    "\u0b99\u0b9e\u0ba3\u0ba8\u0ba9\u0bae"
)
_TA_IND_V = frozenset(
    "\u0b85\u0b86\u0b87\u0b88\u0b89\u0b8a\u0b8e\u0b8f"
    "\u0b90\u0b92\u0b93\u0b94"
)
_P = "\u0bcd"  # pulli


def _ta_fix_va(w: str) -> str:
    for pat, rep in (
        ("\u0bb5\u0bcb", "\u0b93"), ("\u0bb5\u0bca", "\u0b92"),
        ("\u0bb5\u0bc1", "\u0b89"), ("\u0bb5\u0bc2", "\u0b8a"),
    ):
        if w.startswith(pat):
            return rep + w[2:]
    return w


def _ta_fix_ending(w: str, vu: bool) -> tuple[str, bool]:
    if len(w) <= 3:
        return w, False
    for suf in ("\u0ba8\u0bcd\u0ba4\u0bcd", "\u0ba8\u0bcd\u0ba4",
                "\u0ba8\u0bcd"):
        if w.endswith(suf):
            return w[: -len(suf)], True
    if w.endswith("\u0baf\u0bcd") and len(w) >= 3 and w[-3] in (
        "\u0bc0", "\u0bc8", "\u0bbf"
    ):
        return w[:-2], True
    if w.endswith(("\u0b9f\u0bcd\u0baa\u0bcd",
                   "\u0b9f\u0bcd\u0b95\u0bcd")):
        return w[:-4] + "\u0bb3\u0bcd", True
    if w.endswith("\u0ba9\u0bcd\u0bb1\u0bcd"):
        return w[:-4] + "\u0bb2\u0bcd", True
    if w.endswith("\u0bb1\u0bcd\u0b95\u0bcd"):
        return w[:-4] + "\u0bb2\u0bcd", True
    if w.endswith("\u0b9f\u0bcd\u0b9f\u0bcd"):
        return w[:-4] + "\u0b9f\u0bc1", True
    if vu and w.endswith("\u0ba4\u0bcd\u0ba4\u0bcd") and (
        len(w) < 5 or w[-5] != "\u0bc8"
    ):
        return w[:-4] + "\u0bae\u0bcd", True
    if w.endswith("\u0bc1\u0b95\u0bcd"):
        return w[:-3] + _P, True
    if w.endswith("\u0bc1\u0b95\u0bcd\u0b95\u0bcd"):
        return w[:-5] + _P, True
    if (
        len(w) >= 4
        and w[-1] == _P and w[-2] in _TA_STOPS
        and w[-3] == _P and w[-4] in _TA_STOPS
    ):
        return w[:-4], True
    if len(w) >= 2 and w[-1] == _P and w[-2] in _TA_STOPS:
        return w[:-2], True
    if (
        len(w) >= 3
        and w[-1] == _P and w[-2] in _TA_LIQ_NAS and w[-3] == _P
    ):
        return w[:-3] + _P, True
    for suf in ("\u0bb5\u0bcd", "\u0baf", "\u0bb5"):
        if w.endswith(suf):
            return w[: -len(suf)], True
    if w.endswith("\u0ba9\u0bc1") and (
        len(w) < 3 or w[-3] not in _TA_VS
    ):
        return w[:-2], True
    if w.endswith("\u0b99\u0bcd"):
        if len(w) >= 3 and w[-3] == "\u0bc8":
            return w[:-2], True
        return w[:-2] + "\u0bae\u0bcd", True
    if w.endswith(_P):
        if len(w) >= 2 and (w[-2] in _TA_VS or w[-2] == _P):
            return w[:-1], True
        return w, False
    return w, False


def _ta_fix_endings(w: str, vu: bool) -> str:
    while True:
        w, ch = _ta_fix_ending(w, vu)
        if not ch:
            return w


def tamil_stem(word: str) -> str:
    w = word
    vu = False  # found_vetrumai_urupu
    w, _ = _ta_fix_ending(w, vu)
    if len(w) <= 4:
        return w
    # remove_question_prefixes
    if (
        len(w) >= 3 and w[0] == "\u0b8e"
        and w[1] in _TA_NASALS and w[2] == _P
    ):
        w = w[3:]
        w = _ta_fix_va(w)
    # remove_pronoun_prefixes
    if (
        len(w) >= 3 and w[0] in "\u0b85\u0b87\u0b89"
        and w[1] in _TA_NASALS and w[2] == _P
    ):
        w = w[3:]
        w = _ta_fix_va(w)
    # remove_question_suffixes
    if len(w) > 4:
        if w[-1:] in ("\u0bc7", "\u0bcb", "\u0bbe"):
            w = w[:-1] + _P
        w = _ta_fix_endings(w, vu)
    # remove_um
    if len(w) > 4 and w.endswith("\u0bc1\u0bae\u0bcd"):
        w = w[:-3] + _P
        w, _ = _ta_fix_ending(w, vu)
    # remove_common_word_endings
    if len(w) > 4:
        tagged = False
        for suf in (
            "\u0bc1\u0b9f\u0ba9\u0bcd", "\u0bbf\u0bb2\u0bcd\u0bb2\u0bc8",
            "\u0bbf\u0b9f\u0bae\u0bcd", "\u0bbf\u0ba9\u0bcd\u0bb1\u0bbf",
            "\u0bbe\u0b95\u0bbf", "\u0bbe\u0b95\u0bbf\u0baf",
            "\u0bc6\u0ba9\u0bcd\u0bb1\u0bc1", "\u0bc1\u0bb3\u0bcd\u0bb3",
            "\u0bc1\u0b9f\u0bc8\u0baf", "\u0bc1\u0b9f\u0bc8",
            "\u0bc6\u0ba9\u0bc1\u0bae\u0bcd",
        ):
            if w.endswith(suf):
                w = w[: -len(suf)] + _P
                tagged = True
                break
        if not tagged:
            if w.endswith("\u0bb2\u0bcd\u0bb2") and (
                len(w) < 4 or w[-4] not in _TA_VS
            ):
                w = w[:-3] + _P
                tagged = True
            elif w.endswith("\u0bc6\u0ba9"):
                w = w[:-2] + _P
                tagged = True
            elif w.endswith("\u0bbe\u0b95\u0bbf"):
                w = w[:-3] + _P
                tagged = True
        if tagged:
            w = _ta_fix_endings(w, vu)
        else:
            for suf in (
                "\u0baa\u0b9f\u0bcd\u0b9f\u0bc1",
                "\u0bb5\u0bbf\u0b9f\u0bcd\u0b9f\u0bc1",
                "\u0baa\u0b9f\u0bcd\u0b9f\u0ba4\u0bc1",
                "\u0baa\u0b9f\u0bbf\u0ba4\u0bbe\u0ba9",
                "\u0bc6\u0bb2\u0bcd\u0bb2\u0bbe\u0bae\u0bcd",
                "\u0baa\u0b9f\u0bcd\u0b9f\u0ba3", "\u0baa\u0b9f\u0bc1",
                "\u0bb5\u0bbf\u0b9f\u0bc1", "\u0baa\u0b9f\u0bcd\u0b9f",
                "\u0b95\u0bc1\u0bb0\u0bbf\u0baf", "\u0ba4\u0bbe\u0ba9",
                "\u0baa\u0bb1\u0bcd\u0bb1\u0bbf", "\u0baa\u0b9f\u0bbf",
            ):
                if w.endswith(suf):
                    w = w[: -len(suf)]
                    w = _ta_fix_endings(w, vu)
                    break
    # remove_vetrumai_urupukal
    vu = False
    if len(w) > 4:
        matched = True
        if w.endswith("\u0ba9\u0bc8"):
            w = w[:-2]
        else:
            goto_c = False
            if w.endswith("\u0bbf\u0ba9\u0bc8"):
                if len(w) >= 4 and w[-4] in _TA_STOPS:
                    goto_c = True
                else:
                    w = w[:-3] + _P
            elif w.endswith("\u0bc8"):
                if len(w) >= 2 and w[-2] in _TA_STOPS:
                    goto_c = True
                else:
                    w = w[:-1] + _P
            else:
                goto_c = True
            if goto_c:
                if (
                    w.endswith("\u0bc8")
                    and len(w) >= 3
                    and w[-2] in _TA_STOPS
                    and w[-3] == _P
                ):
                    w = w[:-1] + _P
                else:
                    matched = False
        if not matched:
            for suf in (
                "\u0bca\u0b9f\u0bc1", "\u0bcb\u0b9f\u0bc1",
                "\u0bbf\u0bb2\u0bcd", "\u0bbf\u0bb1\u0bcd",
            ):
                if w.endswith(suf):
                    w = w[: -len(suf)] + _P
                    matched = True
                    break
        if not matched and w.endswith("\u0bbf\u0ba9\u0bcd") and not (
            len(w) >= 4 and w[-4] == "\u0bae"
        ):
            w = w[:-3] + _P
            matched = True
        if not matched:
            for suf, minlen in (
                ("\u0bbf\u0ba9\u0bcd\u0bb1\u0bc1", 0),
                ("\u0bbf\u0bb0\u0bc1\u0ba8\u0bcd\u0ba4\u0bc1", 0),
                ("\u0bb5\u0bbf\u0b9f", 0),
                ("\u0bbf\u0b9f\u0bae\u0bcd", 7),
                ("\u0bbe\u0bb2\u0bcd", 0), ("\u0bc1\u0b9f\u0bc8", 0),
                ("\u0bbe\u0bae\u0bb2\u0bcd", 0),
            ):
                if w.endswith(suf) and len(w) > minlen - 1:
                    if minlen and len(w) <= 6:
                        continue
                    w = w[: -len(suf)] + _P
                    matched = True
                    break
        if not matched and w.endswith("\u0bb2\u0bcd") and (
            len(w) < 3 or w[-3] not in _TA_VS
        ):
            w = w[:-2] + _P
            matched = True
        if not matched and w.endswith("\u0bc1\u0bb3\u0bcd"):
            w = w[:-3] + _P
            matched = True
        deleted = False
        if not matched:
            for suf in (
                "\u0b95\u0ba3\u0bcd", "\u0bae\u0bc1\u0ba9\u0bcd",
                "\u0bae\u0bc7\u0bb2\u0bcd", "\u0bae\u0bc7\u0bb1\u0bcd",
                "\u0b95\u0bc0\u0bb4\u0bcd", "\u0baa\u0bbf\u0ba9\u0bcd",
            ):
                if w.endswith(suf):
                    w = w[: -len(suf)]
                    matched = deleted = True
                    break
        if not matched and w.endswith("\u0ba4\u0bc1") and (
            len(w) < 3 or w[-3] not in _TA_VS
        ):
            w = w[:-2]
            matched = deleted = True
        ee = False
        if not matched and w.endswith("\u0bc0"):
            w = w[:-1] + "\u0bbf"
            matched = ee = True
        if matched:
            vu = True
            if w.endswith("\u0bbf\u0ba9\u0bcd"):
                w = w[:-3] + _P
            w = _ta_fix_endings(w, vu)
    # remove_plural_suffix
    if len(w) > 4:
        if w.endswith("\u0bc1\u0b99\u0bcd\u0b95\u0bb3\u0bcd") and (
            len(w) < 7 or w[-7] not in _TA_STOPS
        ):
            w = w[:-6] + _P
        elif w.endswith("\u0bb1\u0bcd\u0b95\u0bb3\u0bcd"):
            w = w[:-5] + "\u0bb2\u0bcd"
        elif w.endswith("\u0b9f\u0bcd\u0b95\u0bb3\u0bcd"):
            w = w[:-5] + "\u0bb3\u0bcd"
        elif w.endswith("\u0b95\u0bb3\u0bcd"):
            w = w[:-3]
    # remove_command_suffixes
    if len(w) > 4 and w.endswith(("\u0baa\u0bbf", "\u0bb5\u0bbf")):
        w = w[:-2]
    # remove_tense_suffixes
    flag = True
    while flag:
        flag = False
        if len(w) > 4:
            new = _ta_tense_once(w)
            if new is not None:
                w = new
                flag = True
            if True:
                for suf in (
                    "\u0b95\u0bbf\u0ba9\u0bcd\u0bb1\u0bcd",
                    "\u0bbe\u0ba8\u0bbf\u0ba9\u0bcd\u0bb1\u0bcd",
                    "\u0b95\u0bbf\u0bb1\u0bcd",
                    "\u0b95\u0bbf\u0ba9\u0bcd\u0bb1",
                    "\u0bbe\u0ba8\u0bbf\u0ba9\u0bcd\u0bb1",
                    "\u0b95\u0bbf\u0bb1",
                ):
                    if w.endswith(suf):
                        w = w[: -len(suf)]
                        flag = True
                        break
                w = _ta_fix_endings(w, vu)
    # ts_lexize parity: an empty stem yields the original word
    return word if w == "" else w


def _ta_tense_once(w: str):
    """First matching tense-suffix rule; None if none applies."""
    for suf in ("\u0baa\u0b9f\u0bc1",
                "\u0b95\u0bca\u0ba3\u0bcd\u0b9f\u0bbf\u0bb0\u0bcd"):
        if w.endswith(suf):
            return w[: -len(suf)]
    if w.endswith("\u0bae\u0bbe\u0bb0\u0bcd"):
        return w[:-4]
    for suf in ("\u0bae\u0bbf\u0ba9\u0bcd", "\u0ba9\u0ba9\u0bcd",
                "\u0ba9\u0bbe\u0ba9\u0bcd", "\u0ba9\u0bbe\u0bb3\u0bcd",
                "\u0ba9\u0bbe\u0bb0\u0bcd"):
        if w.endswith(suf):
            return w[: -len(suf)]
    if w.endswith("\u0bb5\u0ba9\u0bcd") and (
        len(w) < 4 or w[-4] not in _TA_IND_V
    ):
        return w[:-3]
    for suf in ("\u0ba9\u0bb3\u0bcd", "\u0bb5\u0bb3\u0bcd",
                "\u0ba9\u0bb0\u0bcd", "\u0bb5\u0bb0\u0bcd",
                "\u0ba9", "\u0baa", "\u0b95", "\u0ba4", "\u0baf",
                "\u0baa\u0ba9\u0bcd", "\u0baa\u0bb3\u0bcd",
                "\u0baa\u0bb0\u0bcd"):
        if w.endswith(suf):
            return w[: -len(suf)]
    if w.endswith("\u0ba4\u0bc1") and (
        len(w) < 3 or w[-3] not in _TA_VS
    ):
        return w[:-2]
    for suf in ("\u0bbf\u0bb1\u0bcd\u0bb1\u0bc1",
                "\u0baa\u0bae\u0bcd", "\u0ba9\u0bae\u0bcd",
                "\u0ba4\u0bc1\u0bae\u0bcd", "\u0bb1\u0bc1\u0bae\u0bcd",
                "\u0b95\u0bc1\u0bae\u0bcd",
                "\u0ba9\u0bc6\u0ba9\u0bcd", "\u0ba9\u0bc8",
                "\u0bb5\u0bc8"):
        if w.endswith(suf):
            return w[: -len(suf)]
    if w.endswith("\u0bbe\u0ba9\u0bcd") and (
        len(w) < 4 or w[-4] != "\u0b9a"
    ):
        return w[:-3] + _P
    for suf in ("\u0bbe\u0bb3\u0bcd", "\u0bbe\u0bb0\u0bcd",
                "\u0bc7\u0ba9\u0bcd", "\u0bbe",
                "\u0bbe\u0bae\u0bcd", "\u0bc6\u0bae\u0bcd",
                "\u0bc7\u0bae\u0bcd", "\u0bcb\u0bae\u0bcd",
                "\u0b95\u0bc1\u0bae\u0bcd", "\u0ba4\u0bc1\u0bae\u0bcd",
                "\u0b9f\u0bc1\u0bae\u0bcd", "\u0bb1\u0bc1\u0bae\u0bcd",
                "\u0bbe\u0baf\u0bcd", "\u0ba9\u0bc6\u0ba9\u0bcd",
                "\u0ba9\u0bbf\u0bb0\u0bcd", "\u0bc0\u0bb0\u0bcd",
                "\u0bc0\u0baf\u0bb0\u0bcd"):
        if w.endswith(suf):
            return w[: -len(suf)] + _P
    for suf in ("\u0b95\u0bc1", "\u0ba4\u0bc1"):
        if w.endswith(suf) and len(w) >= 3 and w[-3] == _P:
            return w[:-2]
    return None



# ---------------------------------------------------------------------------
# Greek
# ---------------------------------------------------------------------------
# Snowball 'greek' (reference StemmerType::Greek; Ntais/Saroukos
# algorithm). All 68 among tables + step flow decoded from
# dict_snowball.so (greek_UTF_8_stem disassembly): tolower prelude
# (case folding + final sigma + diacritics), step1 irregular-stem
# rewrites, ~25 suffix steps, each "delete + conditional re-append"
# (the exceptions append when the whole remaining word is in the
# exception list, or when it merely ends with a listed stem — both
# shapes occur and are kept distinct below), vowel-gated verb steps,
# the step-6 mu-alpha rewrite, the test1-gated big ending table, and
# the comparative step. The compiled code's stale-slice quirk for
# bare '\u03b1\u03b3\u03b1\u03bc\u03b5' is reproduced via the
# `sliced` flag. Oracle-verified (scripts/snowball_oracle.py).

_EL_V = frozenset("\u03b1\u03b5\u03b7\u03b9\u03bf\u03c5\u03c9")
_EL_V2 = frozenset("\u03b1\u03b5\u03b7\u03b9\u03bf\u03c9")

_EL_LOWER = {
    'ς': 'σ',
    'Ά': 'α',
    'Έ': 'ε',
    'Ή': 'η',
    'Ί': 'ι',
    'ϊ': 'η',
    'ϋ': 'υ',
    'Ό': 'ο',
    'ό': 'ο',
    'ύ': 'υ',
    'Ύ': 'υ',
    'ώ': 'ω',
    'Ώ': 'ω',
    'ΐ': 'η',
    'Α': 'α',
    'Β': 'β',
    'Γ': 'γ',
    'Δ': 'δ',
    'Ε': 'ε',
    'Ζ': 'ζ',
    'Η': 'η',
    'Θ': 'θ',
    'Ι': 'ι',
    'Κ': 'κ',
    'Λ': 'λ',
    'Μ': 'μ',
    'Ν': 'ν',
    'Ξ': 'ξ',
    'Ο': 'ο',
    'Π': 'π',
    'Ρ': 'ρ',
    'Σ': 'σ',
    'Τ': 'τ',
    'Υ': 'υ',
    'Φ': 'φ',
    'Χ': 'χ',
    'Ψ': 'ψ',
    'Ω': 'ω',
    'Ϊ': 'ι',
    'Ϋ': 'υ',
    'ά': 'α',
    'έ': 'ε',
    'ή': 'η',
    'ί': 'ι',
    'ΰ': 'υ',
}
_EL_STEP1 = (('καθεστωτοσ', 10), ('καθεστωτων', 10), ('γεγονοτοσ', 11), ('γεγονοτων', 11), ('καθεστωτα', 10), ('γεγονοτα', 11), ('καθεστωσ', 10), ('τατογιου', 5), ('τατογιων', 5), ('γεγονοσ', 11), ('κρεατοσ', 6), ('κρεατων', 6), ('ολογιου', 3), ('ολογιων', 3), ('περατοσ', 7), ('περατων', 7), ('σκαγιου', 2), ('σκαγιων', 2), ('τατογια', 5), ('τερατοσ', 8), ('τερατων', 8), ('κρεατα', 6), ('ολογια', 3), ('περατα', 7), ('περατη', 7), ('σκαγια', 2), ('σογιου', 4), ('σογιων', 4), ('τερατα', 8), ('φαγιου', 1), ('φαγιων', 1), ('κρεασ', 6), ('περασ', 7), ('σογια', 4), ('τερασ', 8), ('φαγια', 1), ('φωτοσ', 9), ('φωτων', 9), ('φωτα', 9), ('φωσ', 9))
_EL_S2 = ('ιζουμε', 'ιζουνε', 'ιζαμε', 'ιζανε', 'ιζατε', 'ιζεισ', 'ιζετε', 'ιζουν', 'ιζαν', 'ιζει', 'ιζεσ', 'ιζα', 'ιζε', 'ιζω',)
_EL_S2X = (('πιπερορ', 2), ('συναθρο', 1), ('αναμπα', 1), ('βαθυρι', 2), ('βολβορ', 2), ('γλυκορ', 2), ('γλυκυρ', 2), ('ξαναπα', 1), ('περιπα', 1), ('αμπαρ', 2), ('πολυρ', 2), ('αθρο', 1), ('βαρκ', 2), ('δανε', 1), ('εμπα', 1), ('κορν', 2), ('μαρκ', 2), ('αρρ', 2), ('γκρ', 2), ('επα', 1), ('ιμπ', 2), ('λου', 2), ('μαρ', 2), ('μπρ', 2), ('πα', 1), ('πρ', 2), ('β', 2), ('λ', 2), ('μ', 2), ('π', 2), ('ρ', 2))
_EL_S3 = ('ωθηκαμε', 'ωθηκανε', 'ωθηκατε', 'ωθηκαν', 'ωθηκεσ', 'ωθηκα', 'ωθηκε',)
_EL_S3X = ('αλ', 'βι', 'εν', 'ζω', 'λι', 'υψ', 'σ', 'χ',)
_EL_S4 = ('ισαμε', 'ισανε', 'ισατε', 'ισαν', 'ισεσ', 'ισα', 'ισε',)
_EL_S4X = (('γιγαντοαφ', 2), ('δημοκρατ', 2), ('συναθρο', 1), ('χαρτοπα', 1), ('αναμπα', 1), ('απεκλε', 1), ('αποκλε', 1), ('εξαρχα', 1), ('εσωκλε', 1), ('μετεπε', 1), ('ξαναπα', 1), ('περιπα', 1), ('πουκαμ', 2), ('αθρο', 1), ('δανε', 1), ('εκλε', 1), ('εμπα', 1), ('γκε', 2), ('επα', 1), ('επε', 1), ('εσε', 1), ('κλε', 1), ('κομ', 2), ('λαρ', 2), ('ολο', 2), ('αν', 2), ('αφ', 2), ('γε', 2), ('γκ', 2), ('πε', 1), ('μ', 2), ('π', 2))
_EL_S5 = ('ισουμε', 'ισουνε', 'ισεισ', 'ισετε', 'ισουν', 'ισει', 'ισω',)
_EL_S5X = ('συναθρο', 'χαρτοπα', 'αναμπα', 'απεκλε', 'αποκλε', 'εξαρχα', 'εσωκλε', 'μετεπε', 'ξαναπα', 'περιπα', 'αθρο', 'δανε', 'εκλε', 'εμπα', 'επα', 'επε', 'εσε', 'κλε', 'πε',)
_EL_S6 = ('ιστουσ', 'ιστεσ', 'ιστησ', 'ιστοι', 'ιστοσ', 'ιστου', 'ιστων', 'ιστα', 'ιστε', 'ιστη', 'ιστο',)
_EL_S6X = (('συναθρο', 1), ('εσωκλε', 1), ('δανε', 1), ('ακτ', 2), ('αορ', 2), ('ασε', 1), ('ασχ', 2), ('ατα', 2), ('αχν', 2), ('αχτ', 2), ('γεμ', 2), ('γυρ', 2), ('εμπ', 2), ('ευπ', 2), ('εχθ', 2), ('ηφα', 2), ('καθ', 2), ('κακ', 2), ('κλε', 1), ('κυλ', 2), ('λυγ', 2), ('μακ', 2), ('μεγ', 2), ('πλε', 1), ('ταχ', 2), ('φιλ', 2), ('χωρ', 2), ('απ', 2), ('αρ', 2), ('ηδ', 2), ('κτ', 2), ('σε', 1), ('σκ', 2), ('σχ', 2), ('υψ', 2), ('φα', 2), ('χρ', 2), ('χτ', 2), ('μ', 2), ('π', 2))
_EL_S7 = ('ισμουσ', 'ισμοι', 'ισμοσ', 'ισμου', 'ισμων', 'ισμο',)
_EL_S7R = (('αλεξανδριν', 8), ('αγνωστικ', 1), ('βυζαντιν', 9), ('εκλεκτικ', 5), ('γνωστικ', 3), ('θεατριν', 10), ('σκεπτικ', 6), ('ατομικ', 2), ('εθνικ', 4), ('τοπικ', 7))
_EL_S7X = (('αντιδανε', 2), ('μικροσε', 1), ('αποκλε', 1), ('μετασε', 1), ('εγκλε', 1), ('δανε', 2), ('σε', 1))
_EL_S8 = ('ουδακια', 'αρακια', 'ουδακι', 'αρακι',)
_EL_S9 = ('αρακια', 'αρακι', 'ιτσασ', 'ιτσεσ', 'ιτσων', 'ακια', 'ιτσα', 'ακι',)
_EL_S9X = (('τσεχοσλοβ', 1), ('ηγουμεν', 2), ('κατραπ', 1), ('μακρυν', 2), ('ναγκασ', 1), ('τριπολ', 2), ('αλισφ', 1), ('καπακ', 1), ('μουστ', 1), ('πατερ', 2), ('αμβρ', 1), ('ανθρ', 1), ('βαμβ', 1), ('γιαν', 2), ('καιμ', 1), ('καρδ', 2), ('κλιμ', 1), ('λαβρ', 1), ('λουλ', 1), ('σλοβ', 1), ('σπαν', 1), ('φαρμ', 1), ('βαλ', 2), ('κον', 1), ('κορ', 1), ('μαλ', 1), ('μερ', 1), ('νυφ', 2), ('σοκ', 1), ('τοσ', 2), ('φυλ', 1), ('βρ', 1), ('γλ', 2), ('πλ', 1), ('ρυ', 1), ('σκ', 1), ('σφ', 1), ('τζ', 1), ('β', 2), ('ζ', 2), ('κ', 1), ('π', 2), ('ρ', 1), ('σ', 1), ('φ', 1), ('χ', 1))
_EL_S10 = ('ιδιων', 'ιδια', 'ιδιο',)
_EL_S10X = ('αιφν', 'ολο', 'ψαλ', 'ιρ',)
_EL_S10E = ('παιχν', 'ε',)
_EL_S11 = ('ισκοσ', 'ισκου', 'ισκε', 'ισκο',)
_EL_S11X = ('φραγκ', 'οβελ', 'λυκ', 'μην', 'ιβ', 'δ', 'ρ',)
_EL_S12 = ('αδεσ', 'αδων',)
_EL_S12E = ('γιαγι', 'μπαμπ', 'νταντ', 'πατερ', 'πεθερ', 'θει', 'κυρ', 'μαμ', 'μαν', 'οκ',)
_EL_S13 = ('εδεσ', 'εδων',)
_EL_S13E = ('κρασπ', 'γηπ', 'δαπ', 'εμπ', 'μιλ', 'ιπ', 'οπ', 'υπ',)
_EL_S14 = ('ουδεσ', 'ουδων',)
_EL_S14E = ('καλιακ', 'πεταλ', 'λουλ', 'πλεξ', 'τραγ', 'αρκ', 'βελ', 'λιχ', 'σκ', 'σπ', 'φε', 'φλ', 'φρ', 'χν', 'σ',)
_EL_S15 = ('εων', 'εωσ',)
_EL_S15X = ('γαλ', 'παρ', 'ελ', 'ιδ', 'δ', 'θ', 'ν', 'π',)
_EL_S16 = ('ιου', 'ιων', 'ια',)
_EL_S17 = ('ικου', 'ικων', 'ικα', 'ικο',)
_EL_S17X = ('αμμοχαλ', 'μπαγιατ', 'ποστελν', 'συνομηλ', 'καλλιν', 'πικαντ', 'πλιατσ', 'πρωτοδ', 'αντιδ', 'καταδ', 'συναδ', 'φιλον', 'φυλοδ', 'αμαν', 'ανηθ', 'βρωμ', 'εξωδ', 'καλπ', 'μουλ', 'μπαν', 'μπολ', 'μποσ', 'πετσ', 'πιτσ', 'σερτ', 'τσαμ', 'υποδ', 'γερ', 'ενδ', 'νιτ', 'ξικ', 'φυσ', 'χασ', 'αδ', 'αλ', 'ηθ',)
_EL_5A = ('ηθηκαμε', 'ουσαμε', 'αγαμε', 'ηκαμε', 'ησαμε',)
_EL_5AX = ('αποστ', 'αναπ', 'αποθ', 'αποκ', 'βουβ', 'πικρ', 'ξεθ', 'ουλ', 'πεθ', 'ποτ', 'σιχ', 'χ',)
_EL_5B = ('ιουντανε', 'ηθηκανε', 'ιοντανε', 'ουντανε', 'ιοτανε', 'οντανε', 'ουσανε', 'αγανε', 'ηκανε', 'ησανε', 'οτανε',)
_EL_5BX = ('τρ', 'τσ',)
_EL_5BN = ('καπνοβιομηχ', 'μεγλοβιομηχ', 'μικροβιομηχ', 'χαμηλοδαπ', 'αμερικαν', 'μουσουλμ', 'ξηροκλιβ', 'ολιγοδαμ', 'σαρακατσ', 'φωτοστεφ', 'βαθυγαλ', 'δραδουμ', 'καλπουζ', 'καταγαλ', 'κοιλαρφ', 'πενταρφ', 'πολυδαπ', 'πολυμηχ', 'τσαρλατ', 'ψηλοταβ', 'ατσιγγ', 'βιομηχ', 'βραχυκ', 'καστελ', 'κορμορ', 'λουθηρ', 'μωαμεθ', 'ολογαλ', 'περιτρ', 'πορτολ', 'πουριτ', 'υπερηφ', 'υποκοπ', 'ψυχοπλ', 'αθιγγ', 'ανοργ', 'βετερ', 'βουλκ', 'βραχμ', 'ενοργ', 'λαοπλ', 'μαιντ', 'πελεκ', 'περηφ', 'πολισ', 'σουλτ', 'τσιγγ', 'αδαπ', 'αμηχ', 'ανικ', 'απηγ', 'απιθ', 'βασκ', 'διατ', 'διαφ', 'διπλ', 'ζωντ', 'καστ', 'κλιβ', 'νταβ', 'πλατ', 'στεγ', 'στεφ', 'τραγ', 'τσαγ', 'τσοπ', 'βασ', 'γαλ', 'γερ', 'δεκ', 'θυσ', 'κοπ', 'λιβ', 'λιχ', 'μελ', 'ορφ', 'ουλ', 'ουρ', 'πιθ', 'σιγ', 'ταβ', 'τετ', 'αγ', 'ερ', 'ικ', 'πλ', 'σπ', 'γ', 'θ', 'μ', 'ν', 'π', 'σ', 'φ', 'χ',)
_EL_5C = ('ησετε',)
_EL_5CE = ('υπερθ', 'διαθ', 'συνδ', 'συνθ', 'ωφελ', 'αιν', 'αιρ', 'αρκ', 'βαρ', 'βολ', 'εκθ', 'ενδ', 'ενθ', 'ευθ', 'ευρ', 'καθ', 'νετ', 'πον', 'πυρ', 'ραθ', 'ροθ', 'ρον', 'συν', 'ταθ', 'τιθ', 'φορ', 'χωρ', 'βρ', 'οδ', 'σθ', 'σχ',)
_EL_5CX = ('παρακαλ', 'βαρον', 'αβαρ', 'εναρ', 'θαρρ', 'μπορ', 'σερπ', 'σκελ', 'συρφ', 'αβρ', 'απλ', 'βεν', 'κοπ', 'νιφ', 'ντρ', 'παγ', 'τοκ', 'αδ', 'αθ', 'αν', 'εμ', 'σκ', 'δ', 'θ', 'υ',)
_EL_5D1 = ('οντασ', 'ωντασ',)
_EL_5D2 = ('ιομαστε', 'ομαστε',)
_EL_5E1X = ('αμεταμφ', 'ακαταπ', 'ασυμπ', 'συμπ', 'απ', 'π',)
_EL_5E2X = ('παρακαλ', 'εκτελ', 'νισ', 'προ', 'αλ', 'αρ', 'ζ', 'μ', 'ξ',)
_EL_5F1 = ('ηθηκεσ', 'ηθηκα', 'ηθηκε',)
_EL_5F2 = ('ηκεσ', 'ηκα', 'ηκε',)
_EL_5F2E = ('σκουλ', 'ναρθ', 'σκωλ', 'πιθ', 'οθ', 'σφ',)
_EL_5F2X = ('παρακαταθ', 'προσθ', 'διαθ', 'συνθ', 'θ',)
_EL_5G = ('ουσεσ', 'ουσα', 'ουσε',)
_EL_5GE = ('μαντιλ', 'πανταχ', 'κυματ', 'ποδαρ', 'βλεπ', 'μαλλ', 'πρωτ', 'φρυδ', 'λαχ', 'ληγ', 'φαγ', 'ομ',)
_EL_5GX = ('δευτερευ', 'ενδιαφερ', 'καθαρευ', 'υποτειν', 'δεσποζ', 'λαμπιδ', 'φαρμακ', 'αναρρ', 'εκλιπ', 'μεσαζ', 'ανηκ', 'βρομ', 'αγκ', 'αιθ', 'λεχ', 'μεδ', 'πατ', 'πλε', 'τσα', 'χαδ', 'αμ', 'δε', 'λ', 'μ', 'ρ',)
_EL_5H = ('ησου', 'ησα', 'ησε',)
_EL_5HX = ('δωδεκαν', 'μεγαλον', 'ερημον', 'χερσον', 'επταν', 'ν',)
_EL_5I = ('αγεσ', 'αγα', 'αγε',)
_EL_5IE = (('ναυλοχ', -1), ('σμην', 1), ('χορτ', 1), ('λοχ', 1), ('πελ', 1), ('ψοφ', -1), ('λλ', 1), ('οφ', 1), ('πρ', 1), ('ρπ', 1), ('σφ', 1), ('φρ', 1))
_EL_5IX = ('κροκαλοπ', 'προσωποπ', 'σιδηροπ', 'αιμοστ', 'αμαλλι', 'δερβεν', 'δροσοπ', 'αβαστ', 'ανυστ', 'αρτιπ', 'ασπαρ', 'νομοτ', 'ουλαμ', 'πολυφ', 'προστ', 'αδηφ', 'αειπ', 'αμαλ', 'ανυπ', 'απερ', 'αποτ', 'αχαρ', 'διατ', 'επιτ', 'νεοπ', 'ολοπ', 'ομοτ', 'παμφ', 'συμπ', 'συντ', 'υποτ', 'ασπ', 'ναυ', 'ξεφ', 'ουρ', 'χαρ', 'αφ', 'εν', 'τρ', 'λ', 'μ', 'π', 'ρ', 'τ',)
_EL_5J = ('ηστε',)
_EL_5JX = ('κοινοχρ', 'παλιμψ', 'αειμν', 'δυσχρ', 'ευχρ', 'απλ', 'ασβ', 'αχρ', 'σβ', 'χρ',)
_EL_5K = ('ηθουνε', 'ησουνε', 'ουνε',)
_EL_5KX = ('στραβομουτσ', 'κακομουτσ', 'εξων', 'σπι', 'ν', 'ρ',)
_EL_5L = ('ηθουμε', 'ησουμε', 'ουμε',)
_EL_5LX = ('αλλοσουσ', 'παρασουσ', 'ωριοπλ', 'ασουσ', 'αζ', 'φ', 'χ',)
_EL_S6B = ('ματοσ', 'ματων', 'ματα',)
_EL_S7D = ('ιοντουσαν', 'ιομασταν', 'ιοσασταν', 'ιουμαστε', 'οντουσαν', 'ηθηκατε', 'ιεμαστε', 'ιεσαστε', 'ιομουνα', 'ιοσαστε', 'ιοσουνα', 'ιουνται', 'ιουνταν', 'ομασταν', 'οσασταν', 'ουμαστε', 'ηθειτε', 'ηθηκαν', 'ιομουν', 'ιονταν', 'ιοσουν', 'ομουνα', 'οσαστε', 'οσουνα', 'ουνται', 'ουνταν', 'ουσατε', 'αγατε', 'ηθεισ', 'ηθουν', 'ηκατε', 'ησατε', 'ησουν', 'ιεμαι', 'ιεσαι', 'ιεται', 'ιοταν', 'ιουμα', 'ομουν', 'ονται', 'ονταν', 'οσουν', 'ουμαι', 'ουσαν', 'αγαν', 'αμαι', 'ασαι', 'αται', 'ειτε', 'εσαι', 'εται', 'ηδεσ', 'ηδων', 'ηθει', 'ηκαν', 'ησαν', 'ησει', 'ησεσ', 'ομαι', 'οταν', 'αει', 'εισ', 'ηθω', 'ησω', 'ουν', 'ουσ', 'αν', 'ασ', 'αω', 'ει', 'εσ', 'ησ', 'οι', 'οσ', 'ου', 'υσ', 'ων', 'α', 'ε', 'η', 'ι', 'ο', 'υ', 'ω',)
_EL_COMP = ('εστατ', 'εστερ', 'οτατ', 'οτερ', 'υτατ', 'υτερ', 'ωτατ', 'ωτερ',)


_EL_STEP1_MAP = {
    1: "φα", 2: "σκα", 3: "ολο", 4: "σο", 5: "τατο", 6: "κρε",
    7: "περ", 8: "τερ", 9: "φω", 10: "καθεστ", 11: "γεγον",
}
_EL_S7R_MAP = {
    1: "αγνωστ", 2: "ατομ", 3: "γνωστ", 4: "εθν", 5: "εκλεκτ",
    6: "σκεπτ", 7: "τοπ", 8: "αλεξανδρ", 9: "βυζαντ", 10: "θεατρ",
}


def _el_suf(w, table):
    for item in table:
        s = item[0] if isinstance(item, tuple) else item
        if w.endswith(s):
            return item
    return None


def greek_stem(word: str) -> str:
    w = "".join(_EL_LOWER.get(ch, ch) for ch in word)
    if len(w) < 3:
        return w
    test1 = True
    sliced = False
    # step1: irregular stems
    hit = _el_suf(w, _EL_STEP1)
    if hit is not None:
        s, r = hit
        w = w[: -len(s)] + _EL_STEP1_MAP[r]
        test1 = False
        sliced = True

    def dele(table):
        nonlocal w, sliced
        hit = _el_suf(w, table)
        if hit is None:
            return False
        s = hit[0] if isinstance(hit, tuple) else hit
        w = w[: -len(s)]
        sliced = True
        return True

    # s2
    if dele(_EL_S2):
        test1 = False
        hit = _el_suf(w, _EL_S2X)
        if hit is not None and hit[0] == w:
            w += "ι" if hit[1] == 1 else "ιζ"
    # s3
    if dele(_EL_S3):
        test1 = False
        if w in _EL_S3X_SET:
            w += "ων"
    # s4
    if dele(_EL_S4):
        test1 = False
        if w == "ισα":
            pass  # compiled code's slice here nets no visible change
        else:
            hit = _el_suf(w, _EL_S4X)
            if hit is not None and hit[0] == w:
                w += "ι" if hit[1] == 1 else "ισ"
    # s5
    if dele(_EL_S5):
        test1 = False
        if w in _EL_S5X_SET:
            w += "ι"
    # s6
    if dele(_EL_S6):
        test1 = False
        hit = _el_suf(w, _EL_S6X)
        if hit is not None and hit[0] == w:
            w += "ι" if hit[1] == 1 else "ιστ"
    # s7
    if dele(_EL_S7):
        test1 = False
        hit = _el_suf(w, _EL_S7R)
        if hit is not None:
            w = w[: -len(hit[0])] + _EL_S7R_MAP[hit[1]]
        else:
            hit = _el_suf(w, _EL_S7X)
            if hit is not None and hit[0] == w:
                w += "ισμ" if hit[1] == 1 else "ι"
    # s8
    if dele(_EL_S8):
        test1 = False
        if w in ("σ", "χ"):
            w += "αρακ"
    # s9
    if dele(_EL_S9):
        test1 = False
        hit = _el_suf(w, _EL_S9X)
        if hit is not None and hit[0] == w:
            w += "ακ" if hit[1] == 1 else "ιτσ"
        elif w.endswith("κορ"):
            w += "ιτσ"
    # s10
    if dele(_EL_S10):
        test1 = False
        if w in _EL_S10X_SET or _el_suf(w, _EL_S10E) is not None:
            w += "ιδ"
    # s11
    if dele(_EL_S11):
        test1 = False
        if w in _EL_S11X_SET:
            w += "ισκ"
    # s12 (step2a)
    if dele(_EL_S12):
        if _el_suf(w, _EL_S12E) is None:
            w += "αδ"
    # s13
    if dele(_EL_S13):
        if _el_suf(w, _EL_S13E) is not None:
            w += "εδ"
    # s14
    if dele(_EL_S14):
        if _el_suf(w, _EL_S14E) is not None:
            w += "ουδ"
    # s15
    if dele(_EL_S15):
        test1 = False
        if w in _EL_S15X_SET:
            w += "ε"
    # s16
    if dele(_EL_S16):
        test1 = False
        if w[-1:] in _EL_V:
            w += "ι"
    # s17
    if dele(_EL_S17):
        test1 = False
        if w[-1:] in _EL_V:
            w += "ικ"
        elif w in _EL_S17X_SET:
            w += "ικ"
    # step5a
    if w == "αγαμε":
        w = w + "αγαμ" if sliced else "αγαμ"
        sliced = True
    if dele(_EL_5A):
        test1 = False
    if w.endswith("αμε"):
        w = w[:-3]
        sliced = True
        test1 = False
        if w in _EL_5AX_SET:
            w += "αμ"
    # step5b
    if dele(_EL_5B):
        test1 = False
        if w in _EL_5BX_SET:
            w += "αγαν"
    if w.endswith("ανε"):
        w = w[:-3]
        sliced = True
        test1 = False
        if w[-1:] in _EL_V2:
            w += "αν"
        elif w in _EL_5BN_SET:
            w += "αν"
    # step5c
    if dele(_EL_5C):
        test1 = False
    if w.endswith("ετε"):
        w = w[:-3]
        sliced = True
        test1 = False
        if w[-1:] in _EL_V2:
            w += "ετ"
            if w in _EL_5CX_SET:
                w += "ετ"
        elif _el_suf(w, _EL_5CE) is not None:
            w += "ετ"
        elif w in _EL_5CX_SET:
            w += "ετ"
    # step5d
    if dele(_EL_5D1):
        test1 = False
        if w == "αρχ":
            w += "οντ"
        elif w.endswith("κρε"):
            w += "ωντ"
    if dele(_EL_5D2):
        test1 = False
        if w == "ον":
            w += "ομαστ"
    # step5e
    if w.endswith("ιεστε"):
        w = w[:-5]
        sliced = True
        test1 = False
        if w in _EL_5E1X_SET:
            w += "ιεστ"
    if w.endswith("εστε"):
        w = w[:-4]
        sliced = True
        test1 = False
        if w in _EL_5E2X_SET:
            w += "ιεστ"
    # step5f
    if dele(_EL_5F1):
        test1 = False
    if dele(_EL_5F2):
        test1 = False
        if _el_suf(w, _EL_5F2E) is not None:
            w += "ηκ"
        elif w in _EL_5F2X_SET:
            w += "ηκ"
    # step5g
    if dele(_EL_5G):
        test1 = False
        if _el_suf(w, _EL_5GE) is not None:
            w += "ουσ"
        elif w in _EL_5GX_SET:
            w += "ουσ"
    # step5h
    if dele(_EL_5H):
        test1 = False
        if w in _EL_5HX_SET:
            w += "ησ"
    # step5i
    if dele(_EL_5I):
        test1 = False
        if w.endswith("κολλ"):
            w += "αγ"
        else:
            hit = _el_suf(w, _EL_5IE)
            if hit is not None:
                if hit[1] == 1:
                    w += "αγ"
            elif w in _EL_5IX_SET:
                w += "αγ"
    # step5j
    if dele(_EL_5J):
        test1 = False
        if w in _EL_5JX_SET:
            w += "ηστ"
    # step5k
    if dele(_EL_5K):
        test1 = False
        if w in _EL_5KX_SET:
            w += "ουν"
    # step5l
    if dele(_EL_5L):
        test1 = False
        if w in _EL_5LX_SET:
            w += "ουμ"
    # step6
    hit = _el_suf(w, _EL_S6B)
    if hit is not None:
        w = w[: -len(hit)] + "μα"
        sliced = True
    # step7
    if test1:
        dele(_EL_S7D)
    # comparatives
    dele(_EL_COMP)
    # ts_lexize parity: an empty stem yields the original word
    return word if w == "" else w


_EL_S3X_SET = frozenset(_EL_S3X)
_EL_S5X_SET = frozenset(_EL_S5X)
_EL_S10X_SET = frozenset(_EL_S10X)
_EL_S11X_SET = frozenset(_EL_S11X)
_EL_S15X_SET = frozenset(_EL_S15X)
_EL_S17X_SET = frozenset(_EL_S17X)
_EL_5AX_SET = frozenset(_EL_5AX)
_EL_5BX_SET = frozenset(_EL_5BX)
_EL_5BN_SET = frozenset(_EL_5BN)
_EL_5CX_SET = frozenset(_EL_5CX)
_EL_5E1X_SET = frozenset(_EL_5E1X)
_EL_5E2X_SET = frozenset(_EL_5E2X)
_EL_5F2X_SET = frozenset(_EL_5F2X)
_EL_5GX_SET = frozenset(_EL_5GX)
_EL_5HX_SET = frozenset(_EL_5HX)
_EL_5IX_SET = frozenset(_EL_5IX)
_EL_5JX_SET = frozenset(_EL_5JX)
_EL_5KX_SET = frozenset(_EL_5KX)
_EL_5LX_SET = frozenset(_EL_5LX)



# ---------------------------------------------------------------------------
# Turkish
# ---------------------------------------------------------------------------
# Snowball 'turkish' (reference StemmerType::Turkish; Evren Kapusuz
# Cilden's stemmer). All among tables, vowel-harmony logic, the
# optional-letter machinery (with the compiled code's double-test
# quirk: the no-letter path still requires the second-from-cursor
# char to be in the test group), the nominal-verb or-chain, the noun
# chain with stacked marks deleted in one cut, the recursive
# ki-chain, and the postlude (reserved words ad/soyad, append-U after
# d/g, final devoicing) decoded from dict_snowball.so
# (turkish_UTF_8_stem + 20 static helper disassemblies).
# Oracle-verified (scripts/snowball_oracle.py).

_TR_VOWELS = frozenset("aeiou\u00f6\u00fc\u0131")
_TR_U = frozenset("iu\u00fc\u0131")
_TR_HARMONY = {
    "a": "aou\u0131", "e": "ei\u00f6\u00fc", "\u0131": "a\u0131",
    "i": "ei", "o": "ou", "\u00f6": "\u00f6\u00fc", "u": "ou",
    "\u00fc": "\u00f6\u00fc",
}
_TR_YMUS = ("mi\u015f", "mu\u015f", "m\u0131\u015f", "m\u00fc\u015f")
_TR_YSA = ("sak", "sek", "sam", "sem", "san", "sen", "sa", "se")
_TR_YDU = tuple(
    d + v + k
    for v in ("i", "u", "\u0131", "\u00fc")
    for k in ("k", "m", "n", "")
    for d in ("d", "t")
)
_TR_CASINA = ("cas\u0131na", "cesine")
_TR_DUR = tuple(d + v + "r" for v in ("i", "u", "\u0131", "\u00fc") for d in ("d", "t"))
_TR_NUZ = ("niz", "nuz", "n\u0131z", "n\u00fcz")
_TR_LAR = ("lar", "ler")
_TR_SUNUZ = ("siniz", "sunuz", "s\u0131n\u0131z", "s\u00fcn\u00fcz")
_TR_YUZ = ("iz", "uz", "\u0131z", "\u00fcz")
_TR_SUN = ("sin", "sun", "s\u0131n", "s\u00fcn")
_TR_YUM = ("im", "um", "\u0131m", "\u00fcm")
_TR_NCA = ("ca", "ce")
_TR_YLA = ("la", "le")
_TR_NDAN = ("ndan", "nden")
_TR_DAN = ("dan", "tan", "den", "ten")
_TR_NDA = ("nda", "nde")
_TR_DA = ("da", "ta", "de", "te")
_TR_NA = ("na", "ne")
_TR_YA = ("a", "e")
_TR_NUN = ("in", "un", "\u0131n", "\u00fcn")
_TR_NU = ("ni", "nu", "n\u0131", "n\u00fc")
_TR_LARI = ("leri", "lar\u0131")
_TR_POSS = (
    "miz", "niz", "muz", "nuz", "m\u0131z", "n\u0131z", "m\u00fcz",
    "n\u00fcz", "m", "n",
)


def _tr_harmony(w: str, end: int) -> bool:
    """Compiled semantics: find the last vowel, then goto-scan the
    rest of the word leftward for ANY char in that vowel's
    compatibility set (incompatible vowels are skipped over)."""
    i = end - 1
    while i >= 0 and w[i] not in _TR_VOWELS:
        i -= 1
    if i < 0:
        return False
    s = _TR_HARMONY[w[i]]
    return any(ch in s for ch in w[:i])


def _tr_opt(w: str, c: int, letter: str, group) -> int | None:
    """Optional-letter consumption with the compiled double-test
    quirk: succeed iff w[c-2] is in ``group``; consume the letter
    only when it is present at w[c-1]."""
    if c >= 2 and w[c - 1] == letter:
        return c - 1 if w[c - 2] in group else None
    if c >= 2 and w[c - 2] in group:
        return c
    return None


_TR_SORTED = {}


def _tr_among(w: str, end: int, sufs) -> int | None:
    try:
        ordered = _TR_SORTED[sufs]
    except KeyError:
        ordered = _TR_SORTED[sufs] = tuple(
            sorted(sufs, key=len, reverse=True)
        )
    seg = w[:end]
    for s in ordered:
        if seg.endswith(s):
            return end - len(s)
    return None


def _mk_ymus(w, end):
    if not _tr_harmony(w, end):
        return None
    p = _tr_among(w, end, _TR_YMUS)
    if p is None:
        return None
    return _tr_opt(w, p, "y", _TR_VOWELS)


def _mk_ydu(w, end):
    if not _tr_harmony(w, end):
        return None
    p = _tr_among(w, end, _TR_YDU)
    if p is None:
        return None
    return _tr_opt(w, p, "y", _TR_VOWELS)


def _mk_ysa(w, end):
    p = _tr_among(w, end, _TR_YSA)
    if p is None:
        return None
    return _tr_opt(w, p, "y", _TR_VOWELS)


def _mk_yken(w, end):
    if not w[:end].endswith("ken"):
        return None
    return _tr_opt(w, end - 3, "y", _TR_VOWELS)


def _mk_simple(sufs, harmony=True):
    def mk(w, end):
        if harmony and not _tr_harmony(w, end):
            return None
        return _tr_among(w, end, sufs)
    return mk


_mk_casina = _mk_simple(_TR_CASINA, harmony=False)
_mk_sunuz = _mk_simple(_TR_SUNUZ, harmony=False)
_mk_lari = _mk_simple(_TR_LARI, harmony=False)
_mk_lar = _mk_simple(_TR_LAR)
_mk_dur = _mk_simple(_TR_DUR)
_mk_sun = _mk_simple(_TR_SUN)
_mk_nuz = _mk_simple(_TR_NUZ)
_mk_nu = _mk_simple(_TR_NU)
_mk_na = _mk_simple(_TR_NA)
_mk_da = _mk_simple(_TR_DA)
_mk_nda = _mk_simple(_TR_NDA)
_mk_dan = _mk_simple(_TR_DAN)
_mk_ndan = _mk_simple(_TR_NDAN)


def _mk_yum(w, end):
    if not _tr_harmony(w, end):
        return None
    p = _tr_among(w, end, _TR_YUM)
    if p is None:
        return None
    return _tr_opt(w, p, "y", _TR_VOWELS)


def _mk_yuz(w, end):
    if not _tr_harmony(w, end):
        return None
    p = _tr_among(w, end, _TR_YUZ)
    if p is None:
        return None
    return _tr_opt(w, p, "y", _TR_VOWELS)


def _mk_nca(w, end):
    if not _tr_harmony(w, end):
        return None
    p = _tr_among(w, end, _TR_NCA)
    if p is None:
        return None
    return _tr_opt(w, p, "n", _TR_VOWELS)


def _mk_nun(w, end):
    if not _tr_harmony(w, end):
        return None
    p = _tr_among(w, end, _TR_NUN)
    if p is None:
        return None
    return _tr_opt(w, p, "n", _TR_VOWELS)


def _mk_yla(w, end):
    if not _tr_harmony(w, end):
        return None
    p = _tr_among(w, end, _TR_YLA)
    if p is None:
        return None
    return _tr_opt(w, p, "y", _TR_VOWELS)


def _mk_ya(w, end):
    if not _tr_harmony(w, end):
        return None
    p = _tr_among(w, end, _TR_YA)
    if p is None:
        return None
    return _tr_opt(w, p, "y", _TR_VOWELS)


def _mk_su(w, end):
    if not _tr_harmony(w, end):
        return None
    if end < 1 or w[end - 1] not in _TR_U:
        return None
    return _tr_opt(w, end - 1, "s", _TR_VOWELS)


def _mk_yu(w, end):
    if not _tr_harmony(w, end):
        return None
    if end < 1 or w[end - 1] not in _TR_U:
        return None
    return _tr_opt(w, end - 1, "y", _TR_VOWELS)


def _mk_poss(w, end):
    p = _tr_among(w, end, _TR_POSS)
    if p is None:
        return None
    if p >= 2 and w[p - 1] in _TR_U:
        return p - 1 if w[p - 2] not in _TR_VOWELS else None
    if p >= 2 and w[p - 2] not in _TR_VOWELS:
        return p
    return None


def _tr_ki_try(w, end):
    """eq 'ki' at the current seam, then the chain (which protects
    w[end:]); returns (w, end, fired)."""
    if w[:end].endswith("ki"):
        return _tr_chain(w, end, end - 2)
    return w, end, False


def _tr_chain(w, end, kipos):
    # deletions splice [pos, end) out of w, keeping the tail
    def cut(pos, wx, endx):
        return wx[:pos] + wx[endx:], pos

    p = _mk_da(w, kipos)
    if p is not None:
        w, end = cut(p, w, end)
        p2 = _mk_lar(w, end)
        if p2 is not None:
            w, end = cut(p2, w, end)
            w, end, _ = _tr_ki_try(w, end)
            return w, end, True
        p3 = _mk_poss(w, end)
        if p3 is not None:
            w, end = cut(p3, w, end)
            p4 = _mk_lar(w, end)
            if p4 is not None:
                w, end = cut(p4, w, end)
                w, end, _ = _tr_ki_try(w, end)
            return w, end, True
        return w, end, True
    p = _mk_nun(w, kipos)
    if p is not None:
        w, end = cut(p, w, end)
        p2 = _mk_lari(w, end)
        if p2 is not None:
            w, end = cut(p2, w, end)
            return w, end, True
        p3 = _mk_poss(w, end)
        if p3 is None:
            p3 = _mk_su(w, end)
        if p3 is not None:
            w, end = cut(p3, w, end)
            p4 = _mk_lar(w, end)
            if p4 is not None:
                w, end = cut(p4, w, end)
                w, end, _ = _tr_ki_try(w, end)
            return w, end, True
        w, end, _ = _tr_ki_try(w, end)
        return w, end, True
    p = _mk_nda(w, kipos)
    if p is not None:
        p2 = _mk_lari(w, p)
        if p2 is not None:
            w, end = cut(p2, w, end)
            return w, end, True
        p3 = _mk_su(w, p)
        if p3 is not None:
            w, end = cut(p3, w, end)
            p4 = _mk_lar(w, end)
            if p4 is not None:
                w, end = cut(p4, w, end)
                w, end, _ = _tr_ki_try(w, end)
            return w, end, True
        return _tr_ki_try(w, p)
    return w, end, False


def turkish_stem(word: str) -> str:
    w = word
    if sum(1 for ch in w if ch in _TR_VOWELS) < 2:
        return w
    # ---- stem_nominal_verb_suffixes ----
    cont = True
    done = False
    n = len(w)
    p = _mk_ymus(w, n)
    if p is not None:
        w = w[:p]
        done = True
    if not done:
        p = _mk_ydu(w, n)
        if p is not None:
            w = w[:p]
            done = True
    if not done:
        p = _mk_ysa(w, n)
        if p is not None:
            w = w[:p]
            done = True
    if not done:
        p = _mk_yken(w, n)
        if p is not None:
            w = w[:p]
            done = True
    if not done:
        p = _mk_casina(w, n)
        if p is not None:
            q = _mk_sunuz(w, p)
            if q is None:
                q = _mk_lar(w, p)
            if q is None:
                q = _mk_yum(w, p)
            if q is None:
                q = _mk_sun(w, p)
            if q is None:
                q = _mk_yuz(w, p)
            if q is None:
                q = p
            r = _mk_ymus(w, q)
            if r is not None:
                w = w[:r]
                done = True
    if not done:
        p = _mk_lar(w, n)
        if p is not None:
            w = w[:p]
            cont = False
            q = _mk_dur(w, len(w))
            if q is None:
                q = _mk_ydu(w, len(w))
            if q is None:
                q = _mk_ysa(w, len(w))
            if q is None:
                q = _mk_ymus(w, len(w))
            if q is not None:
                w = w[:q]
            done = True
    if not done:
        p = _mk_nuz(w, n)
        if p is not None:
            q = _mk_ydu(w, p)
            if q is None:
                q = _mk_ysa(w, p)
            if q is not None:
                w = w[:q]
                done = True
    if not done:
        p = _mk_sunuz(w, n)
        if p is None:
            p = _mk_yuz(w, n)
        if p is None:
            p = _mk_sun(w, n)
        if p is None:
            p = _mk_yum(w, n)
        if p is not None:
            w = w[:p]
            done = True
            q = _mk_ymus(w, len(w))
            if q is not None:
                w = w[:q]
    if not done:
        p = _mk_dur(w, n)
        if p is not None:
            w = w[:p]
            q = _mk_sunuz(w, len(w))
            if q is None:
                q = _mk_lar(w, len(w))
            if q is None:
                q = _mk_yum(w, len(w))
            if q is None:
                q = _mk_sun(w, len(w))
            if q is None:
                q = _mk_yuz(w, len(w))
            if q is None:
                q = len(w)
            r = _mk_ymus(w, q)
            if r is not None:
                w = w[:r]
            done = True
    # ---- stem_noun_suffixes (only when continue flag still set) ----
    if cont:
        w = _tr_noun(w)
    # ---- postlude ----
    if w in ("ad", "soyad"):
        return w
    if w.endswith(("d", "g")):
        for i in range(len(w) - 1, -1, -1):
            if w[i] in _TR_VOWELS:
                v = w[i]
                if v in "a\u0131":
                    w += "\u0131"
                elif v in "ei":
                    w += "i"
                elif v in "ou":
                    w += "u"
                else:
                    w += "\u00fc"
                break
    last = w[-1:]
    if last == "b":
        w = w[:-1] + "p"
    elif last == "c":
        w = w[:-1] + "\u00e7"
    elif last == "d":
        w = w[:-1] + "t"
    elif last == "\u011f":
        w = w[:-1] + "k"
    # ts_lexize parity: an empty stem yields the original word
    return word if w == "" else w


def _tr_noun(w: str) -> str:
    n = len(w)

    def kit(wx):
        w2, _, _ = _tr_ki_try(wx, len(wx))
        return w2

    # N1: lAr
    p = _mk_lar(w, n)
    if p is not None:
        return kit(w[:p])
    # N2: ncA
    p = _mk_nca(w, n)
    if p is not None:
        w = w[:p]
        p2 = _mk_lari(w, len(w))
        if p2 is not None:
            return w[:p2]
        p3 = _mk_poss(w, len(w))
        if p3 is not None:
            w = w[:p3]
            p4 = _mk_lar(w, len(w))
            if p4 is not None:
                return kit(w[:p4])
            return w
        p5 = _mk_su(w, len(w))
        if p5 is not None:
            w = w[:p5]
            p6 = _mk_lar(w, len(w))
            if p6 is not None:
                return kit(w[:p6])
            return w
        p7 = _mk_lar(w, len(w))
        if p7 is not None:
            return kit(w[:p7])
        return w
    # N3: (ndA or nA) -- marks only; the single cut spans the stack
    for mk in (_mk_nda, _mk_na):
        p = mk(w, n)
        if p is not None:
            p2 = _mk_lari(w, p)
            if p2 is not None:
                return w[:p2]
            p3 = _mk_su(w, p)
            if p3 is not None:
                w = w[:p3]
                p4 = _mk_lar(w, len(w))
                if p4 is not None:
                    return kit(w[:p4])
                return w
            w2, _, fired = _tr_ki_try(w, p)
            if fired:
                return w2
            break
    # N4: ndAn / nU with (sU or lArI)
    for mk in (_mk_ndan, _mk_nu):
        p = mk(w, n)
        if p is not None:
            p2 = _mk_su(w, p)
            if p2 is not None:
                w = w[:p2]
                p3 = _mk_lar(w, len(w))
                if p3 is not None:
                    return kit(w[:p3])
                return w
            p4 = _mk_lari(w, p)
            if p4 is not None:
                return w[:p4]
            break
    # N6: DAn
    p = _mk_dan(w, n)
    if p is not None:
        w = w[:p]
        p2 = _mk_poss(w, len(w))
        if p2 is not None:
            w = w[:p2]
            p3 = _mk_lar(w, len(w))
            if p3 is not None:
                return kit(w[:p3])
            return w
        p4 = _mk_lar(w, len(w))
        if p4 is not None:
            return kit(w[:p4])
        return kit(w)
    # N7: nUn / ylA
    for mk in (_mk_nun, _mk_yla):
        p = mk(w, n)
        if p is not None:
            w = w[:p]
            p2 = _mk_lar(w, len(w))
            if p2 is not None:
                w = w[:p2]
                w2, _, fired = _tr_ki_try(w, len(w))
                if fired:
                    return w2
            p3 = _mk_poss(w, len(w))
            if p3 is None:
                p3 = _mk_su(w, len(w))
            if p3 is not None:
                w = w[:p3]
                p4 = _mk_lar(w, len(w))
                if p4 is not None:
                    w = w[:p4]
                    w2, _, fired = _tr_ki_try(w, len(w))
                    if fired:
                        return w2
                return w
            return kit(w)
    # N9: lArI alone
    p = _mk_lari(w, n)
    if p is not None:
        return w[:p]
    # ki-chain directly
    w2, _, fired = _tr_ki_try(w, len(w))
    if fired:
        return w2
    # N10: DA / yU / yA with possessive continuation
    for mk in (_mk_da, _mk_yu, _mk_ya):
        p = mk(w, n)
        if p is not None:
            w = w[:p]
            p2 = _mk_poss(w, len(w))
            if p2 is not None:
                w = w[:p2]
                p3 = _mk_lar(w, len(w))
                if p3 is not None:
                    return kit(w[:p3])
                return w
            p4 = _mk_lar(w, len(w))
            if p4 is not None:
                return kit(w[:p4])
            return w
    # N13: possessives / sU at top level
    p = _mk_poss(w, n)
    if p is not None:
        w = w[:p]
        p2 = _mk_lar(w, len(w))
        if p2 is not None:
            return kit(w[:p2])
        return w
    p = _mk_su(w, n)
    if p is not None:
        w = w[:p]
        p2 = _mk_lar(w, len(w))
        if p2 is not None:
            return kit(w[:p2])
        return w
    return w


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
    "serbian": serbian_stem,
    "arabic": arabic_stem,
    "tamil": tamil_stem,
    "greek": greek_stem,
    "turkish": turkish_stem,
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
    "sr": serbian_stem,
    "ar": arabic_stem,
    "ta": tamil_stem,
    "el": greek_stem,
    "tr": turkish_stem,
}
