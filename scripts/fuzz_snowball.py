#!/usr/bin/env python
"""Generic oracle fuzz loop for a snowball_extra port.

    python scripts/fuzz_snowball.py <oracle_lang> <alphabet> <bases csv> [--fuzz N]
                        [--sufmod PREFIX] [--dump out.tsv] [--nostop]

Suffix inventory is pulled from snowball_extra table tuples whose
names start with PREFIX (e.g. _EU_); every base × suffix plus seeded
random strings are diffed against the postgres oracle.
"""
import os, random, sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from snowball_oracle import stem_words  # noqa: E402
import seekstorm_spark.snowball_extra as mod  # noqa: E402

# Per-language fuzz configs used to validate every snowball_extra
# port to zero mismatches (alphabet + curated bases; suffix
# inventories come from the port's own tables via --sufmod).
CONFIG = {
    "basque": ("abdeghijklmnoprstuxz\u00f1",
               "etxe,mendi,handi,eder,lagun,herri,buru,gizon,eskola,"
               "liburu,euskara,egun,urte,lan,etorri,joan,ikusi,eman", "_EU_"),
    "lithuanian": ("abdegijklmnoprstuvyz\u0119\u0105\u0117\u012f\u016b\u0173\u010d\u0161\u017e",
                   "nam,vaik,mokykl,gra\u017e,didel,\u017emog,darb,keli,miest,"
                   "knyg,laik,moter,\u017eod,ger,nauj,lietuv,kalb,diev", "_LT_"),
    "yiddish": ("\u05d0\u05d1\u05d2\u05d3\u05d4\u05d5\u05d6\u05d7\u05d8\u05d9\u05db\u05da\u05dc\u05de\u05dd\u05e0\u05df\u05e1\u05e2\u05e4\u05e3\u05e6\u05e5\u05e7\u05e8\u05e9\u05ea\u05f0\u05f1\u05f2",
                "\u05e7\u05d9\u05e0\u05d3,\u05e9\u05e8\u05f2\u05d1,\u05d2\u05f2,\u05d6\u05d0\u05d2,"
                "\u05d1\u05d5\u05db,\u05dc\u05e2\u05e8\u05e0,\u05e9\u05e4\u05d9\u05dc,"
                "\u05d2\u05e2\u05d2\u05d0\u05e0\u05d2\u05e2\u05e0,\u05d2\u05e2\u05e9\u05e8\u05d9\u05d1\u05e0", "_YI_"),
    "serbian": ("abcdefghijklmnoprstuvz\u0107\u010d\u0111\u0161\u017e",
                "devojk,u\u010ditelj,radnik,grad,ku\u0107,\u0161kol,dobr,lep,mal,"
                "velik,srpsk,beograd,ruk,glav,vod,zemlj", "_SR_"),
    "arabic": ("\u0627\u0628\u062a\u062c\u062d\u062f\u0631\u0633\u0639\u0643\u0644\u0645\u0646\u0647\u0648\u064a\u0629\u0649\u0623\u0625\u0622\u0621\u0624\u0626",
               "\u0643\u062a\u0628,\u062f\u0631\u0633,\u0639\u0644\u0645,\u0645\u062f\u0631\u0633,"
               "\u0643\u062a\u0627\u0628,\u0645\u0643\u062a\u0628,\u0642\u0644\u0645,\u0634\u0645\u0633,"
               "\u0642\u0645\u0631,\u0628\u064a\u062a", "_AR_"),
    "tamil": ("\u0b95\u0b99\u0b9a\u0b9e\u0b9f\u0ba3\u0ba4\u0ba8\u0baa\u0bae\u0baf\u0bb0\u0bb2\u0bb5\u0bb4\u0bb3\u0bb1\u0ba9\u0bbe\u0bbf\u0bc0\u0bc1\u0bc2\u0bc6\u0bc7\u0bc8\u0bca\u0bcb\u0bcd\u0b85\u0b87\u0b89\u0b8e",
              "\u0baa\u0b9f\u0bbf,\u0bb5\u0bc0\u0b9f\u0bc1,\u0baa\u0bc1\u0ba4\u0bcd\u0ba4\u0b95\u0bae\u0bcd,"
              "\u0b85\u0bb5\u0ba9\u0bcd,\u0bae\u0bb0\u0bae,\u0b95\u0ba4\u0bb5,\u0baa\u0bb4,\u0ba8\u0bbf\u0bb2,"
              "\u0baa\u0bc6\u0bb0\u0bbf\u0baf", "_TA_"),
    "greek": ("\u03b1\u03b2\u03b3\u03b4\u03b5\u03b6\u03b7\u03b8\u03b9\u03ba\u03bb\u03bc\u03bd\u03be\u03bf\u03c0\u03c1\u03c3\u03c4\u03c5\u03c6\u03c7\u03c8\u03c9",
              "\u03b1\u03b3\u03b1\u03c0,\u03bd\u03b5\u03c1,\u03c0\u03bf\u03c4\u03b1\u03bc,\u03c0\u03b1\u03b9\u03b4,"
              "\u03c4\u03c1\u03b1\u03b3\u03bf\u03c5\u03b4,\u03ba\u03b1\u03bb,\u03bc\u03b5\u03b3\u03b1\u03bb,"
              "\u03b1\u03bd\u03b8\u03c1\u03c9\u03c0,\u03b3\u03c5\u03bd\u03b1\u03b9\u03ba,\u03c3\u03c0\u03b9\u03c4", "_EL_"),
    "turkish": ("abc\u00e7defg\u011fh\u0131ijklmno\u00f6prs\u015ftu\u00fcvyz",
                "kitap,ev,g\u00f6z,araba,okul,\u00e7ocuk,anne,baba,g\u00fcn,y\u0131l,"
                "su,i\u015f,el,yol,\u015fehir,\u00fclke,evdeki,onunki", "_TR_"),
}
# greek_stem in pg carries a stopword list; fuzz it via the nostop dict
NOSTOP = {"greek"}

if sys.argv[1] == "--all":
    import subprocess
    fails = []
    for lang, (alpha, bases, pref) in CONFIG.items():
        cmd = [sys.executable, __file__, lang, alpha, bases,
               "--sufmod", pref, "--fuzz", "4000"]
        if lang in NOSTOP:
            cmd.append("--nostop")
        r = subprocess.run(cmd)
        if r.returncode:
            fails.append(lang)
    sys.exit(1 if fails else 0)

lang = sys.argv[1]
alpha = sys.argv[2]
bases = sys.argv[3].split(",") if len(sys.argv) > 3 and not sys.argv[3].startswith("--") else []
fuzz_n = int(sys.argv[sys.argv.index("--fuzz") + 1]) if "--fuzz" in sys.argv else 4000
pref = sys.argv[sys.argv.index("--sufmod") + 1] if "--sufmod" in sys.argv else None
nostop = "--nostop" in sys.argv

sufs = set()
if pref:
    for name, val in vars(mod).items():
        if name.startswith(pref):
            if isinstance(val, tuple):
                for v in val:
                    if isinstance(v, tuple):
                        if isinstance(v[0], str): sufs.add(v[0])
                    elif isinstance(v, str):
                        sufs.add(v)
                    # skip bytes entries
            elif isinstance(val, dict):
                sufs.update(k for k in val if isinstance(k, str))
                sufs.update(v for v in val.values() if isinstance(v, str) and v)

sufs = {s for s in sufs if not any('A' <= c <= 'Z' for c in s)}
words = set(bases)
for b in bases:
    for s in sufs:
        words.add(b + s)
rng = random.Random(int(os.environ.get("FUZZ_SEED", "7")))
for _ in range(fuzz_n):
    n = rng.randint(2, 14)
    words.add("".join(rng.choice(alpha) for _ in range(n)))
# suffix-stacked fuzz: base + suffix + suffix
sufl = sorted(sufs)
if sufl and bases:
    for _ in range(min(fuzz_n, 3000)):
        words.add(rng.choice(bases) + rng.choice(sufl) + rng.choice(sufl))

words = sorted(words)
oracle = stem_words(lang, words, nostop=nostop)
fn = mod.EXTRA_STEMMERS[lang]
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
sys.exit(1 if bad else 0)
