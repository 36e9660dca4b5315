"""duplicate_spans (exact-substring dedup, Lee et al. 2022 style)."""

from __future__ import annotations

from seekstorm_spark.functions.dedup import duplicate_spans


def _spans(spark, docs, n=3, min_docs=2):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    rows = (
        duplicate_spans(df, n=n, min_docs=min_docs)
        .orderBy("docid", "span_start")
        .collect()
    )
    return [(r["docid"], r["span_start"], r["span_end"]) for r in rows]


def test_shared_passage_merges_overlapping_grams(spark):
    got = _spans(
        spark,
        [
            "alpha beta gamma delta epsilon zeta",
            "x alpha beta gamma delta y",
            "totally unrelated words appear here now",
        ],
    )
    # doc0: dup 3-grams at pos 0 and 1 merge into tokens [0, 3];
    # doc1: the same grams sit at pos 1 and 2 → tokens [1, 4]
    assert got == [(0, 0, 3), (1, 1, 4)]


def test_gap_keeps_spans_separate(spark):
    got = _spans(
        spark,
        [
            "one two three junk1 four five six",
            "one two three junk2 four five six",
        ],
    )
    assert got == [
        (0, 0, 2),
        (0, 4, 6),
        (1, 0, 2),
        (1, 4, 6),
    ]


def test_adjacent_spans_merge(spark):
    # dup grams at pos 0 and pos 3 (end 2 + 1 == start 3): contiguous
    # duplicated text → one span
    got = _spans(
        spark,
        [
            "a b c d e f",
            "a b c x y z",
            "q w e d e f",
        ],
    )
    # doc0: "a b c"@0 (shared with doc1), "d e f"@3 (shared with doc2)
    assert (0, 0, 5) in got


def test_min_docs_threshold_and_short_docs(spark):
    got = _spans(
        spark,
        ["only two", "only two", "something else entirely different"],
        n=3,
    )
    assert got == []  # both docs shorter than n → no grams
    got3 = _spans(
        spark,
        ["p q r s", "p q r t", "p q r u"],
        n=3,
        min_docs=3,
    )
    assert got3 == [(0, 0, 2), (1, 0, 2), (2, 0, 2)]
