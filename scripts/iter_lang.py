#!/usr/bin/env python
"""Dev loop for porting a new Snowball language against the postgres
oracle: synthesizes bases × suffix-inventory + seeded fuzz, diffs our
implementation, prints mismatch clusters.

    python scripts/iter_lang.py romanian [--fuzz 4000] [--dump out.tsv]
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from snowball_oracle import stem_words  # noqa: E402

CFG = {
    "irish": {
        "alpha": "abcdefghilmnoprstuáéíóú'-",
        "bases": [
            "scoil", "fuinneog", "carraig", "doras", "bord", "sagart",
            "athair", "oibr", "náisiún", "beann", "ceol", "feirmeoir",
            "pat", "arc", "gin", "graf", "óid", "leabhar", "litir",
        ],
        "words": (
            "bhfuinneog gcarraig ndoras mbord tsagart n-athair "
            "fheirmeoirí d'fhear scoileanna oibrithe imeachtaí "
            "náisiúnta grafaíochta patacha beannachtaí ceolteoirí "
            "múinteoirí imímid ceannaímid díolaimid glantar deirtear "
            "oscailteadh briseadh marcáil"
        ).split(),
    },
    "finnish": {
        "alpha": "adehijklmnoprstuvyäö",
        "bases": [
            "talo", "kirja", "kaupunki", "edeltäjä", "nopea", "suuri",
            "pieni", "vesi", "käsi", "maa", "tie", "yö", "työ", "poika",
            "tyttö", "ystävä", "opettaja", "koulu", "järvi", "joki",
        ],
        "words": (
            "taloissa taloissakin talossa talosta taloon taloihin "
            "kirjoissa kirjasta kirjaan kirjojen kaupungeissa "
            "kaupunkiin edeltäjistään nopeasti suurimmat pienemmät "
            "vesien käsissä maiden teiden öiden poikien tyttöjen "
            "ystävänsä opettajien kouluissa järvillä jokien "
            "sanoittensa sanoittens sanojensa taloineen taloinensa "
            "pojalla pojalta pojaksi isompi isoimmat kaunein "
            "kauneimmat juoksee juoksi juossut syöneet syömme "
            "olemme olette olivat menisimme menisitte"
        ).split(),
    },
    "hungarian": {
        "alpha": "abdeghiklmnoprstvzáéíóöőúüű",
        "bases": [
            "ház", "alma", "könyv", "kert", "autó", "város", "tűz",
            "víz", "barát", "asztal", "ember", "gyerek", "iskola",
            "szép", "gyors", "fa", "kéz", "út", "sör", "ökör",
        ],
        "words": (
            "házakkal házban házakat barátokkal asztalon könyvek "
            "könyveim könyveink házaink fákkal emberekkel gyerekeknek "
            "iskolában szépen gyorsan almát almák kertjében autójával "
            "városokból tűzzel vízzel házé házaké barátoké kezünk "
            "kezetek kezeik útjaink söröket ökröt legnagyobb "
            "legszebbik hatalmasabb állatokként emberiségnek "
            "nemzetközi magyarországon"
        ).split(),
    },
    "romanian": {
        "alpha": "abcdeghilmnoprstuvzăâîşţșț",
        "bases": [
            "copi", "copil", "băiet", "fet", "frumos", "lucr",
            "acţiun", "naţiun", "muncit", "scriit", "universit",
            "bibliotec", "călător", "merg", "cânt", "vorb", "cit",
            "oraş", "ţar", "om", "cas", "mare", "bun", "nou", "veche",
        ],
        "words": (
            "copiilor copilului băieţii fetele frumoasă frumoase "
            "frumosul lucrează lucrătorii acţiunea naţiunile "
            "muncitorilor scriitoarea universităţile bibliotecile "
            "călătoriile mergeam mergeaţi merseseră cântaseră vorbind "
            "citind oraşele ţărilor întotdeauna româneşte mâncaseră "
            "plecaserăm văzusem veniseşi dormiseră lucraţi cântaţi "
            "floarea florile frunzele munţilor codrii pădurea "
            "copilaşul fetiţa băieţelul căsuţa"
        ).split(),
    },
}


def suffixes_from_module(lang: str) -> list[str]:
    import seekstorm_spark.snowball_extra as mod

    pref = {"romanian": "_RO_", "hungarian": "_HU_", "finnish": "_FI_", "irish": "_GA_"}[lang]
    out: set[str] = set()
    for name, val in vars(mod).items():
        if not name.startswith(pref):
            continue
        if isinstance(val, tuple):
            out.update(v for v in val if isinstance(v, str))
        elif isinstance(val, dict):
            out.update(k for k in val if isinstance(k, str))
            out.update(v for v in val.values() if isinstance(v, str) and v)
    return sorted(out)


def main() -> int:
    lang = sys.argv[1]
    fuzz_n = 3000
    if "--fuzz" in sys.argv:
        fuzz_n = int(sys.argv[sys.argv.index("--fuzz") + 1])
    cfg = CFG[lang]
    words = set(cfg["words"])
    for b in cfg["bases"]:
        words.add(b)
        for s in suffixes_from_module(lang):
            words.add(b + s)
    rng = random.Random(99)
    for _ in range(fuzz_n):
        n = rng.randint(2, 14)
        words.add("".join(rng.choice(cfg["alpha"]) for _ in range(n)))
    words = sorted(words)
    oracle = stem_words(lang, words)
    from seekstorm_spark.snowball_extra import EXTRA_STEMMERS

    fn = EXTRA_STEMMERS[lang]
    pairs = [(w, o) for w, o in zip(words, oracle) if o is not None]
    bad = [(w, o, fn(w)) for w, o in pairs if fn(w) != o]
    print(f"{lang}: {len(pairs)} words, {len(bad)} mismatches")
    for row in bad[:30]:
        print("   ", row)
    if "--dump" in sys.argv and not bad:
        out = sys.argv[sys.argv.index("--dump") + 1]
        with open(out, "w", encoding="utf-8") as f:
            for w, o in pairs:
                f.write(f"{w}\t{o}\n")
        print("->", out, len(pairs))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
