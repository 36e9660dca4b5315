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
