"""Snowball German/French/Spanish stemmers (from the published specs)
+ per-field stopword lists, end-to-end through index build and query.

Reference: per-index stemmer config over 38 rust-stemmers languages
(`index.rs:641-722`) and per-index stopword sets (`index.rs:1238-1256`).
"""

from __future__ import annotations

import pytest

from seekstorm_spark.index.builder import IndexBuilder
from seekstorm_spark.query.engine import search
from seekstorm_spark.snowball import french_stem, german_stem, spanish_stem
from seekstorm_spark.stemmer import stem

DE_VECTORS = {
    "laufen": "lauf",
    "katzen": "katz",
    "bücher": "buch",
    "häuser": "haus",
    "kindern": "kind",
    "schönheit": "schonheit",
    "aufeinander": "aufeinand",
    "kategorie": "kategori",
    "verständnisse": "verstandnis",
    "möglichkeit": "moglich",
}

ES_VECTORS = {
    "gatos": "gat",
    "corriendo": "corr",
    "rápidamente": "rapid",
    "comunicación": "comun",
    "hablaron": "habl",
    "universidades": "univers",
    "tecnología": "tecnolog",
    "cantando": "cant",
    "librerías": "libr",
}

FR_VECTORS = {
    "chevaux": "cheval",
    "nationale": "national",
    "rapidement": "rapid",
    "continuellement": "continuel",
    "chanterions": "chant",
    "majestueux": "majestu",
    "logiciels": "logiciel",
    "parlaient": "parl",
}


@pytest.mark.parametrize("word,want", sorted(DE_VECTORS.items()))
def test_german_vectors(word, want):
    assert german_stem(word) == want


@pytest.mark.parametrize("word,want", sorted(ES_VECTORS.items()))
def test_spanish_vectors(word, want):
    assert spanish_stem(word) == want


@pytest.mark.parametrize("word,want", sorted(FR_VECTORS.items()))
def test_french_vectors(word, want):
    assert french_stem(word) == want


def test_inflection_classes_collapse():
    """Inflected forms of one lemma map to one stem — the property
    retrieval actually needs."""
    for lang, groups in {
        "de": [["laufen", "laufe"], ["katze", "katzen"]],
        "es": [["gato", "gatos", "gata", "gatas"], ["hablar", "hablaron", "hablando"]],
        "fr": [["chanter", "chantez", "chanterions"], ["national", "nationale", "nationales"]],
    }.items():
        for grp in groups:
            stems = {stem(w, lang) for w in grp}
            assert len(stems) == 1, (lang, grp, stems)


def test_dispatch_passthrough():
    assert stem("running", "en") == "run"
    assert stem("katzen", "de") == "katz"
    assert stem("unknown", "xx") == "unknown"


def test_stemmed_index_e2e_de(spark, tmp_path):
    """German index: a query in one inflection finds docs using
    another (index- and query-side stemming agree)."""
    docs = spark.createDataFrame(
        [
            (0, "die katzen laufen schnell"),
            (1, "eine katze läuft"),
            (2, "hunde bellen laut"),
        ],
        "doc_id long, text string",
    )
    store = IndexBuilder(
        spark, str(tmp_path / "de"), n_buckets=4, stemmer="de"
    ).build(docs, text_col="text", id_col="doc_id")
    hits = {r["docid"] for r in search(spark, store, "katze").collect()}
    assert hits == {0, 1}
    hits = {r["docid"] for r in search(spark, store, "katzen").collect()}
    assert hits == {0, 1}


def test_per_field_stopwords(spark, tmp_path):
    """Stopwords apply per FIELD: 'alpha' is stopped in body only, so
    a query for it matches docs that carry it in the title."""
    docs = spark.createDataFrame(
        [
            (0, "alpha story", "alpha beta gamma"),
            (1, "other title", "alpha delta"),
            (2, "plain", "epsilon zeta"),
        ],
        "doc_id long, title string, body string",
    )
    store = IndexBuilder(
        spark,
        str(tmp_path / "pf"),
        n_buckets=4,
        fields=["title", "body"],
        stop_words={"body": frozenset({"alpha"})},
    ).build(docs, id_col="doc_id")
    assert store.meta["stop_words_by_field"] == {"body": ["alpha"]}
    # query-side keeps 'alpha' (it's not a stopword in every field)
    hits = {r["docid"] for r in search(spark, store, "alpha").collect()}
    assert hits == {0}  # body occurrences are not indexed; title's is
    hits = {r["docid"] for r in search(spark, store, "delta").collect()}
    assert hits == {1}


SV_VECTORS = {
    "jackor": "jack",
    "flickorna": "flick",
    "klubben": "klubb",
    "starkast": "stark",
    "vänligt": "vän",
    "hemskheterna": "hemsk",
    "skridskor": "skridsk",
    "stärkaste": "stärk",
}

NO_VECTORS = {
    "bilens": "bil",
    "huset": "hus",
    "bøkene": "bøk",
    "trygghetens": "trygg",
    "opererte": "operer",
    "billigere": "billiger",
}

DA_VECTORS = {
    "bogen": "bog",
    "husene": "hus",
    "venligst": "ven",
    "hallen": "hal",  # undouble: last char of the double pair is in R1
    "forløst": "forløs",
    "hundens": "hund",
    "kagerne": "kag",
}


@pytest.mark.parametrize("word,want", sorted(SV_VECTORS.items()))
def test_swedish_vectors(word, want):
    from seekstorm_spark.snowball import swedish_stem

    assert swedish_stem(word) == want


@pytest.mark.parametrize("word,want", sorted(NO_VECTORS.items()))
def test_norwegian_vectors(word, want):
    from seekstorm_spark.snowball import norwegian_stem

    assert norwegian_stem(word) == want


@pytest.mark.parametrize("word,want", sorted(DA_VECTORS.items()))
def test_danish_vectors(word, want):
    from seekstorm_spark.snowball import danish_stem

    assert danish_stem(word) == want


def test_scandinavian_inflection_classes_collapse():
    for lang, groups in {
        "sv": [["flicka", "flickor", "flickorna"]],
        "no": [["bok", "boken"], ["hus", "huset", "husene"]],
        "da": [["hus", "huset", "husene"], ["kage", "kagen", "kagerne"]],
    }.items():
        for grp in groups:
            stems = {stem(w, lang) for w in grp}
            assert len(stems) == 1, (lang, grp, stems)


def test_stemmed_index_e2e_sv(spark, tmp_path):
    """Swedish index: inflected query finds base-form docs."""
    docs = spark.createDataFrame(
        [
            (0, "flickorna springer snabbt"),
            (1, "en flicka springer"),
            (2, "hundar skäller"),
        ],
        "doc_id long, text string",
    )
    store = IndexBuilder(
        spark, str(tmp_path / "sv"), n_buckets=4, stemmer="sv"
    ).build(docs, text_col="text", id_col="doc_id")
    hits = {r["docid"] for r in search(spark, store, "flicka").collect()}
    assert hits == {0, 1}
    hits = {r["docid"] for r in search(spark, store, "flickorna").collect()}
    assert hits == {0, 1}


# --- round-3 additions: Dutch / Portuguese / Italian ---

from seekstorm_spark.snowball import (  # noqa: E402
    dutch_stem,
    italian_stem,
    portuguese_stem,
)

NL_VECTORS = {
    "lichamelijk": "licham",
    "lichamelijke": "licham",
    "lopen": "lop",
    "katten": "kat",
    "huizen": "huiz",
    "mogelijkheden": "mogelijk",
    "werkelijkheid": "werkelijk",
    "aanbiedingen": "aanbied",
    "maan": "man",
    "brood": "brod",
    "appels": "appel",
}

PT_VECTORS = {
    "gatos": "gat",
    "correndo": "corr",
    "rapidamente": "rapid",
    "comunicação": "comunic",
    "falaram": "fal",
    "universidades": "univers",
    "tecnologia": "tecnolog",
    "cantando": "cant",
    "importância": "import",
    "bondade": "bondad",
    "aprovação": "aprov",
}

IT_VECTORS = {
    "gatti": "gatt",
    "correndo": "corr",
    "rapidamente": "rapid",
    "comunicazione": "comun",
    "parlarono": "parl",
    "università": "univers",
    "cantando": "cant",
    "nazionale": "nazional",
    "abbandonata": "abbandon",
    "mangiandolo": "mang",
    "caratteristici": "caratterist",
}


@pytest.mark.parametrize("word,want", sorted(NL_VECTORS.items()))
def test_dutch_vectors(word, want):
    assert dutch_stem(word) == want


@pytest.mark.parametrize("word,want", sorted(PT_VECTORS.items()))
def test_portuguese_vectors(word, want):
    assert portuguese_stem(word) == want


@pytest.mark.parametrize("word,want", sorted(IT_VECTORS.items()))
def test_italian_vectors(word, want):
    assert italian_stem(word) == want


def test_new_inflection_classes_collapse():
    for lang, groups in {
        "nl": [["kat", "katten"], ["boek", "boeken"]],
        "pt": [["gato", "gatos", "gata", "gatas"],
               ["falar", "falaram", "falando"]],
        "it": [["gatto", "gatti", "gatta", "gatte"],
               ["parlare", "parlarono", "parlando"]],
    }.items():
        for grp in groups:
            stems = {stem(w, lang) for w in grp}
            assert len(stems) == 1, (lang, grp, stems)


def test_stemmed_index_e2e_pt_it_nl(spark, tmp_path):
    """New-language indexes: a query in one inflection finds docs
    using another (index- and query-side stemming agree)."""
    cases = {
        "pt": [(0, "os gatos correm"), (1, "uma gata correndo"),
               (2, "cachorros latem")],
        "it": [(0, "i gatti corrono"), (1, "una gatta correndo"),
               (2, "i cani abbaiano")],
        "nl": [(0, "de katten lopen"), (1, "een kat loopt"),
               (2, "honden blaffen")],
    }
    probes = {"pt": "gato", "it": "gatto", "nl": "katten"}
    for lang, rows in cases.items():
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        store = IndexBuilder(
            spark, str(tmp_path / lang), n_buckets=2, stemmer=lang
        ).build(docs, text_col="text", id_col="doc_id")
        hits = {r["docid"] for r in search(spark, store, probes[lang]).collect()}
        assert hits == {0, 1}, lang


# --- Russian ---

from seekstorm_spark.snowball import russian_stem  # noqa: E402

RU_VECTORS = {
    "книги": "книг",
    "книгами": "книг",
    "красивый": "красив",
    "бегущая": "бегущ",
    "стремится": "стрем",
    "делающий": "дела",
    "понимание": "пониман",
    "быстрее": "быстр",
    "возможность": "возможн",
    "женщинами": "женщин",
    "выражение": "выражен",
    "говорил": "говор",
    "говорить": "говор",
    "новости": "новост",
    "последний": "последн",
}


@pytest.mark.parametrize("word,want", sorted(RU_VECTORS.items()))
def test_russian_vectors(word, want):
    assert russian_stem(word) == want


def test_russian_inflection_classes_collapse():
    for grp in [
        ["книга", "книги", "книгами", "книгу"],
        ["говорил", "говорить", "говорили"],
        ["красивый", "красивая", "красивые"],
    ]:
        stems = {stem(w, "ru") for w in grp}
        assert len(stems) == 1, (grp, stems)


def test_stemmed_index_e2e_ru(spark, tmp_path):
    docs = spark.createDataFrame(
        [(0, "новые книги лежат"), (1, "одна книга на столе"),
         (2, "собаки лают громко")],
        "doc_id long, text string",
    )
    store = IndexBuilder(
        spark, str(tmp_path / "ru"), n_buckets=2, stemmer="ru"
    ).build(docs, text_col="text", id_col="doc_id")
    hits = {r["docid"] for r in search(spark, store, "книги").collect()}
    assert hits == {0, 1}
