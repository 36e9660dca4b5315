"""Tokenizer parity tests (reference tokenizer.rs:320-360 semantics)."""

from __future__ import annotations

from seekstorm_spark.tokenizer import (
    parse_query,
    tokenize_doc,
    tokenize_line,
)


def test_unicode_alphanumeric_basic():
    assert tokenize_line("Hello World") == ["hello", "world"]
    assert tokenize_line("a  b\tc\nd") == ["a", "b", "c", "d"]


def test_plus_hash_minus_continue_token():
    # + - # allowed mid/end of token, not start (tokenizer.rs:350)
    assert tokenize_line("c++ and c# e-mail") == ["c++", "and", "c#", "e-mail"]
    assert tokenize_line("++lead -lead") == ["lead", "lead"]
    assert tokenize_line("a+b") == ["a+b"]


def test_digits_and_underscore_are_word_chars():
    assert tokenize_line("foo_bar 123 a1b2") == ["foo_bar", "123", "a1b2"]


def test_unicode_lowercase_and_word_chars():
    assert tokenize_line("Ärger Straße ÉTÉ") == ["ärger", "straße", "été"]
    # CJK chars are word characters — kept as one run
    assert tokenize_line("日本語 test") == ["日本語", "test"]


def test_apostrophe_splits_default_tokenizer():
    # ' is not a word char nor + - # → splits (non-folded tokenizer)
    assert tokenize_line("don't") == ["don", "t"]


def test_token_at_end_of_string():
    assert tokenize_line("end token") == ["end", "token"]
    assert tokenize_line("trailing+") == ["trailing+"]


def test_ascii_alphabetic():
    assert tokenize_line("Hello42 World", "ascii_alphabetic") == ["hello", "world"]
    assert tokenize_line("c++", "ascii_alphabetic") == ["c"]


def test_whitespace_tokenizers():
    assert tokenize_line("A b+C", "whitespace") == ["A", "b+C"]
    assert tokenize_line("A b+C", "whitespace_lowercase") == ["a", "b+c"]


def test_doc_positions_and_count():
    terms, count = tokenize_doc("a b a c a")
    assert count == 5
    assert terms["a"] == [0, 2, 4]
    assert terms["b"] == [1]
    assert terms["c"] == [3]


def test_stopwords_do_not_advance_positions():
    # tokenizer.rs:584-586: removed stopwords don't bump the counter
    terms, count = tokenize_doc("the quick the fox", stop_words=frozenset({"the"}))
    assert count == 2
    assert terms["quick"] == [0]
    assert terms["fox"] == [1]
    assert "the" not in terms


def test_query_parse_operators():
    pq = parse_query("apple banana")
    assert pq.query_type == "union"
    assert [t.term for t in pq.terms] == ["apple", "banana"]

    pq = parse_query("+apple banana")
    assert pq.query_type == "intersection"

    pq = parse_query("apple -banana")
    assert pq.query_type == "union"
    assert [t.op for t in pq.terms] == ["union", "not"]

    pq = parse_query('"new york" pizza')
    assert pq.query_type == "phrase"
    phrase = [t for t in pq.terms if t.op == "phrase"]
    assert [(t.term, t.phrase_index) for t in phrase] == [("new", 0), ("york", 1)]


def test_query_term_cap():
    q = " ".join(f"t{i}" for i in range(150))
    pq = parse_query(q)
    assert len(pq.terms) == 100  # MAX_QUERY_TERM_NUMBER, index.rs:121


def test_fold_reference_vectors():
    """Hand-checked vectors from the reference fold table
    (tokenizer.rs:27-117): ligatures, umlauts, diacritics, zalgo."""
    from seekstorm_spark.tokenizer import fold_text

    assert fold_text("café") == "cafe"
    assert fold_text("ﬁle") == "file"
    assert fold_text("straße") == "strasse"
    assert fold_text("Über") == "ueber"
    assert fold_text("Mädchen") == "maedchen"
    assert fold_text("œuvre") == "ouvre"
    assert fold_text("ⅶ") == "vii"
    assert fold_text("naïve") == "naive"
    assert fold_text("łódź") == "lodz"
    # zalgo combining marks stripped
    assert fold_text("h̶e̶l̶l̶o̶") == "hello"
    # plain ascii unchanged (lowercased)
    assert fold_text("Hello C++") == "hello c++"


def test_folded_tokenizer_and_stemmer():
    from seekstorm_spark.tokenizer import tokenize_line

    assert tokenize_line("Café au ﬁlet", "unicode_alphanumeric_folded") == [
        "cafe", "au", "filet"
    ]
    assert tokenize_line(
        "running quickly", "unicode_alphanumeric", stemmer="en"
    ) == ["run", "quickli"]
    # non-implemented language passes through
    assert tokenize_line("laufende", "unicode_alphanumeric", stemmer="xx") == [
        "laufende"
    ]


def test_porter_published_vectors():
    from seekstorm_spark.stemmer import porter_stem

    vectors = {
        "caresses": "caress", "ponies": "poni", "agreed": "agre",
        "plastered": "plaster", "motoring": "motor", "hopping": "hop",
        "relational": "relat", "conditional": "condit",
        "vietnamization": "vietnam", "operator": "oper",
        "decisiveness": "decis", "triplicate": "triplic",
        "electriciti": "electr", "adoption": "adopt",
        "replacement": "replac", "argument": "argument", "rate": "rate",
        "controll": "control", "roll": "roll", "running": "run",
    }
    for w, expect in vectors.items():
        assert porter_stem(w) == expect, w
