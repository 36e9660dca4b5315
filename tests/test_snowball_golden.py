"""Oracle-extracted golden vectors for every Snowball port.

The (word, stem) pairs in tests/data/snowball/{lang}.tsv were
extracted from the GENUINE compiled Snowball stemmers (PostgreSQL
15's dict_snowball.so via ts_lexize — public PostgreSQL/Snowball BSD
code, the same algorithms rust-stemmers compiles for the reference;
see scripts/snowball_oracle.py + scripts/validate_snowball.py). Each
file mixes curated real words, bases × the full suffix inventory
(every rule path fires), and a seeded random fuzz sample — round 5
validated 5,000 additional fuzz words per language at zero
mismatches before freezing these.

This test must stay green WITHOUT postgres — it consumes the frozen
files only.
"""

from __future__ import annotations

import pathlib

import pytest

DATA = pathlib.Path(__file__).parent / "data" / "snowball"


def _stemmer(lang: str):
    from seekstorm_spark import snowball as sb
    from seekstorm_spark.snowball_extra import EXTRA_STEMMERS

    # EXTRA_STEMMERS wins: "english" there is Porter2 (the oracle's
    # english_stem = StemmerType::English); stemmer.stem(w, "en")
    # stays the original 1980 Porter (StemmerType::Porter)
    fn = EXTRA_STEMMERS.get(lang)
    if fn is None:
        fn = getattr(sb, f"{lang}_stem")
    return fn


LANGS = sorted(p.stem for p in DATA.glob("*.tsv"))


@pytest.mark.parametrize("lang", LANGS)
def test_golden_vectors(lang):
    fn = _stemmer(lang)
    pairs = [
        line.split("\t")
        for line in (DATA / f"{lang}.tsv").read_text(
            encoding="utf-8"
        ).splitlines()
        if line
    ]
    assert len(pairs) >= 500, f"{lang}: vector file suspiciously small"
    bad = [(w, want, fn(w)) for w, want in pairs if fn(w) != want]
    assert not bad, f"{lang}: {len(bad)}/{len(pairs)} diverge, e.g. {bad[:5]}"
