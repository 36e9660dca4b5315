#!/usr/bin/env python
"""Dev tool: mass-validate seekstorm_spark's Snowball ports against
the genuine compiled Snowball stemmers in postgres' dict_snowball.so
(scripts/snowball_oracle.py must have the cluster running).

Per language it synthesizes a large input set — curated real words
plus bases × the full suffix inventory of the published algorithm (so
every rule path fires, including region-boundary edge cases from
short bases) — and diffs our implementation against the oracle.

    python scripts/validate_snowball.py            # all implemented
    python scripts/validate_snowball.py danish     # one language
    python scripts/validate_snowball.py danish --dump tests/data/snowball

--dump writes the oracle (word, stem) pairs to {dir}/{lang}.tsv for
the pytest suite (which never needs postgres).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from snowball_oracle import stem_words  # noqa: E402

from seekstorm_spark import snowball as sb  # noqa: E402
from seekstorm_spark.stemmer import stem as porter_stem  # noqa: E402


def _suffixes_from_module(prefix: str) -> list[str]:
    """Collect every string inside module-level tuples whose name
    starts with the language prefix (e.g. '_DA_') — the full suffix
    inventory our port knows about."""
    out: set[str] = set()
    for name, val in vars(sb).items():
        if not name.startswith(prefix):
            continue
        if isinstance(val, tuple):
            out.update(v for v in val if isinstance(v, str))
    return sorted(out)


# bases chosen for structural variety: vowel-final, consonant-final,
# double-consonant, special letters, 1-syllable (region edge cases)
CONFIG: dict[str, dict] = {
    "danish": {
        "fn": sb.danish_stem,
        "prefix": "_DA_",
        "bases": [
            "hus", "bil", "kat", "køb", "løb", "spørg", "arbejd",
            "følel", "bak", "hop", "net", "vis", "træ", "ø", "så",
            "barn", "kvind", "dansk", "billig", "hed", "indret",
        ],
        "words": (
            "huse husene kvinderne løbende spørgsmålet forskelligt "
            "arbejdede danskerne følelser hedder undervisning børnene "
            "skulle billigste frygt faldt trygt snakker vinduer "
            "hyggeligst venligst kærlighed betjent"
        ).split(),
    },
    "swedish": {
        "fn": sb.swedish_stem,
        "prefix": "_SV_",
        "bases": [
            "hus", "bil", "katt", "köp", "löp", "fråg", "arbet",
            "känsl", "back", "hopp", "nät", "vis", "trä", "ö",
            "barn", "kvinn", "svensk", "billig", "vack", "full",
        ],
        "words": (
            "husen kvinnorna löpande frågorna olika arbetade "
            "svenskarna känslor heter undervisning barnen billigaste "
            "vackrast fullaste klokhet mänskligheten"
        ).split(),
    },
    "norwegian": {
        "fn": sb.norwegian_stem,
        "prefix": "_NO_",
        "bases": [
            "hus", "bil", "katt", "kjøp", "løp", "spørsmål", "arbeid",
            "følels", "bakk", "hopp", "nett", "vis", "tre", "øy",
            "barn", "kvinn", "norsk", "billig", "hatt", "full",
        ],
        "words": (
            "husene kvinnene løpende spørsmålet forskjellige arbeidet "
            "nordmennene følelser heter undervisning barna billigste "
            "hemmelig vanlig"
        ).split(),
    },
    "dutch": {
        "fn": sb.dutch_stem,
        "prefix": "_NL_",
        "bases": [
            "loop", "huiz", "kind", "mogelijk", "verschil", "werk",
            "schoon", "snel", "boek", "vrouw", "klein", "bak", "pot",
            "lach", "zee", "ei", "vrij", "heerlijk", "gemeen",
        ],
        "words": (
            "lopen gelopen huizen kinderen mogelijkheden verschillende "
            "belangrijke werkte gewerkt schoonheid snelheid boeken "
            "vrouwen kleine gemeenteraadsverkiezingen lichamelijk "
            "koninklijke baarden"
        ).split(),
        "extra_suffixes": [
            "en", "ene", "s", "se", "e", "heden", "heid", "end",
            "end", "ing", "lijk", "baar", "bar", "ig", "etje",
        ],
    },
    "german": {
        "fn": sb.german_stem,
        "prefix": "_DE_",
        "bases": [
            "lauf", "katz", "buch", "haus", "kind", "schön", "arbeit",
            "wissen", "könig", "frei", "lieb", "groß", "müd", "neu",
            "back", "voll", "ein", "spiel",
        ],
        "words": (
            "laufen katzen bücher häuser kindern schönheit aufeinander "
            "kategorie verständnisse möglichkeit wissenschaftliche "
            "arbeiteten könige freiheit liebsten größte müdigkeit "
            "spielerisch aufsteigend"
        ).split(),
        "extra_suffixes": [
            "e", "em", "en", "ern", "er", "es", "s", "est", "st",
            "end", "ung", "ig", "ik", "isch", "lich", "heit", "keit",
            "eit",
        ],
    },
    "english": {
        "fn": lambda w: porter_stem(w, "en"),
        "prefix": "_EN_NONE_",
        "oracle_lang": "porter",  # no porter1 dict in pg — skip oracle
        "bases": [],
        "words": [],
    },
    "french": {
        "fn": sb.french_stem,
        "prefix": "_FR_",
        "bases": [
            "chant", "parl", "nation", "continu", "rapid", "logiciel",
            "heur", "commun", "cheval", "beau", "vi", "jou", "fin",
            "majestu", "pein", "mang",
        ],
        "words": (
            "chevaux nationale rapidement continuellement chanterions "
            "majestueux logiciels parlaient heureusement communication "
            "internationale mangeaient finissaient joueuses peintures "
            "vivement royaux"
        ).split(),
    },
    "spanish": {
        "fn": sb.spanish_stem,
        "prefix": "_ES_",
        "bases": [
            "gat", "corr", "rapid", "comun", "habl", "univers",
            "tecnolog", "cant", "libr", "trabaj", "niñ", "grand",
            "pequeñ", "jug", "com", "viv",
        ],
        "words": (
            "gatos corriendo rápidamente comunicación hablaron "
            "universidades tecnología cantando librerías trabajadores "
            "niñas grandísimo pequeñitos jugándoselo comiéndoselas "
            "vivieron"
        ).split(),
    },
    "portuguese": {
        "fn": sb.portuguese_stem,
        "prefix": "_PT_",
        "bases": [
            "menin", "fal", "rapid", "comunic", "univers", "tecnolog",
            "cant", "livr", "bonit", "trabalh", "grand", "pequen",
            "jog", "com", "viv", "nacion",
        ],
        "words": (
            "meninos falaram rapidamente comunicação universidades "
            "tecnologia cantando livrarias bonitas trabalhadores "
            "nacionais grandões pequeninas jogaríamos comêssemos "
            "viveriam propôs"
        ).split(),
    },
    "italian": {
        "fn": sb.italian_stem,
        "prefix": "_IT_",
        "bases": [
            "ragazz", "bell", "nazion", "rapid", "parl", "comunic",
            "cant", "libr", "abbandon", "pericol", "grand", "piccol",
            "gioc", "mangi", "viv", "universit",
        ],
        "words": (
            "ragazzi bellissima nazionale rapidamente parlavano "
            "comunicazione università cantando librerie abbandonato "
            "pericolosamente grandissimo piccolini giocherebbero "
            "mangiassero vivranno"
        ).split(),
    },
    "russian": {
        "fn": sb.russian_stem,
        "prefix": "_RU_",
        "bases": [
            "книг", "бег", "красив", "работ", "университет", "быстр",
            "говор", "национальн", "писательниц", "возможн", "стол",
            "друж", "син", "велик",
        ],
        "words": (
            "книгами бегущий красивая работали университетах быстро "
            "говорит национальный писательница возможности столами "
            "дружескими синего величайший важнейшими"
        ).split(),
    },
}


def inputs_for(lang: str) -> list[str]:
    cfg = CONFIG[lang]
    sufs = _suffixes_from_module(cfg["prefix"]) + cfg.get(
        "extra_suffixes", []
    )
    words = set(cfg["words"])
    for b in cfg["bases"]:
        words.add(b)
        for s in sufs:
            words.add(b + s)
    return sorted(words)


def validate(lang: str, dump_dir: str | None = None) -> int:
    cfg = CONFIG[lang]
    oracle_lang = cfg.get("oracle_lang", lang)
    words = inputs_for(lang)
    if not words:
        print(f"{lang}: no inputs (oracle '{oracle_lang}' unavailable)")
        return 0
    oracle = stem_words(oracle_lang, words)
    pairs = [(w, o) for w, o in zip(words, oracle) if o is not None]
    fn = cfg["fn"]
    bad = [(w, o, fn(w)) for w, o in pairs if fn(w) != o]
    print(
        f"{lang}: {len(pairs)} words, {len(bad)} mismatches"
        + (f"  e.g. {bad[:8]}" if bad else "")
    )
    if dump_dir and not bad:
        os.makedirs(dump_dir, exist_ok=True)
        out = os.path.join(dump_dir, f"{lang}.tsv")
        with open(out, "w", encoding="utf-8") as f:
            for w, o in pairs:
                f.write(f"{w}\t{o}\n")
        print(f"  -> {out}")
    return len(bad)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    dump_dir = None
    if "--dump" in sys.argv:
        dump_dir = sys.argv[sys.argv.index("--dump") + 1]
        args = [a for a in args if a != dump_dir]
    langs = args or sorted(CONFIG)
    total = 0
    for lang in langs:
        total += validate(lang, dump_dir)
    return 1 if total else 0


if __name__ == "__main__":
    sys.exit(main())
