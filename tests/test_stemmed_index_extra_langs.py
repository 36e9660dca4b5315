"""Stemmed-index e2e for every snowball_extra language: build a tiny
index with ``stemmer=<code>`` and check that a query in one
inflection finds a document written in another (index- and
query-side stemming agree).

The inflection pairs are mined from the frozen oracle golden vectors
(tests/data/snowball/<lang>.tsv — extracted from PostgreSQL's
compiled Snowball stemmers, see scripts/snowball_oracle.py): for each
language we pick a stem that at least two distinct alphabetic words
map to, index one word, and query with the other.

Reference: per-index stemmer config over 38 rust-stemmers languages
(seekstorm/src/index.rs:641-722).
"""

from __future__ import annotations

import pathlib
from collections import defaultdict

import pytest

from seekstorm_spark.index.builder import IndexBuilder
from seekstorm_spark.query.engine import search
from seekstorm_spark.tokenizer import tokenize_line

DATA = pathlib.Path(__file__).parent / "data" / "snowball"

# code -> golden-vector file for every snowball_extra language
LANGS = {
    "ro": "romanian", "hu": "hungarian", "fi": "finnish",
    "en2": "english", "ga": "irish", "hy": "armenian",
    "ca": "catalan", "hi": "hindi", "id": "indonesian",
    "ne": "nepali", "eu": "basque", "lt": "lithuanian",
    "yi": "yiddish", "sr": "serbian", "ar": "arabic",
    "ta": "tamil", "el": "greek", "tr": "turkish",
}


def _inflection_pair(fname: str) -> tuple[str, str]:
    """Two distinct alphabetic words sharing a stem, longest stem
    first (deterministic)."""
    by_stem: dict[str, set[str]] = defaultdict(set)
    for line in (DATA / f"{fname}.tsv").read_text(encoding="utf-8").splitlines():
        if not line:
            continue
        word, stem = line.split("\t")
        if word != stem and len(stem) >= 3 and tokenize_line(word) == [word]:
            by_stem[stem].add(word)
    candidates = sorted(
        (stem, tuple(sorted(ws)))
        for stem, ws in by_stem.items()
        if len(ws) >= 2
    )
    if not candidates:
        # fall back to (word, stem) where the stem is idempotent and
        # itself tokenizes whole: both sides map to the same term
        for stem, ws in sorted(by_stem.items(), key=lambda kv: -len(kv[0])):
            word = sorted(ws)[0]
            if tokenize_line(stem) == [stem]:
                return word, stem
        raise AssertionError(f"no usable pair in {fname}.tsv")
    stem, words = max(candidates, key=lambda kv: (len(kv[0]), kv[0]))
    return words[0], words[1]


@pytest.mark.parametrize("code", sorted(LANGS))
def test_stemmed_index_e2e(spark, tmp_path, code):
    from seekstorm_spark.stemmer import stem as _stem

    doc_word, query_word = _inflection_pair(LANGS[code])
    assert _stem(doc_word, code) == _stem(query_word, code)
    docs = spark.createDataFrame(
        [(0, f"xxaaa {doc_word} xxbbb"), (1, "xxaaa xxccc xxbbb")],
        "doc_id long, text string",
    )
    store = IndexBuilder(
        spark, str(tmp_path / code), n_buckets=2, stemmer=code
    ).build(docs, text_col="text", id_col="doc_id")
    hits = {r["docid"] for r in search(spark, store, query_word).collect()}
    assert hits == {0}, (code, doc_word, query_word)
    hits = {r["docid"] for r in search(spark, store, doc_word).collect()}
    assert hits == {0}
