"""Full reference highlighter semantics (top_fragments_from_field,
highlighter.rs:105-382): sentence fragmentation, proximity-scored
top-N fragment selection in document order, fragment_size windowing
with "..." markers, custom markup tags, synonym-expanded patterns,
and the no-score fast path. Gated against hand-computed scores that
mirror the reference's arithmetic op-for-op."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seekstorm_spark.functions.highlight import (
    _score_fragment,
    _TermMatcher,
    expand_terms_with_synonyms,
    top_fragments,
    top_fragments_udf,
)

TEXT = (
    "The quick brown fox. A fast table scan beats a slow one. "
    "Nothing relevant here. The table was fast but not a fast table. "
    "End of document story."
)


# -- scoring (highlighter.rs:114-147) ---------------------------------------


def test_score_new_term_repeat_and_sequence():
    m = _TermMatcher(["fast", "table"])
    # fast(+1.0) then table adjacent one-past-end → sequence run 2
    # (+2*5.0)
    assert _score_fragment(" A fast table scan.", m)[0] == pytest.approx(11.0)
    # table(+1.0), fast(+1.0), fast repeat(+0.3), then table resumes
    # the sequence after the adjacent fast (+10.0)
    assert _score_fragment(
        " The table was fast but not a fast table.", m
    )[0] == pytest.approx(12.3)
    # repeats score 0.3 each after the first occurrence
    assert _score_fragment("fast x fast x fast", m)[0] == pytest.approx(1.6)


def test_matcher_is_leftmost_longest_and_case_insensitive():
    m = _TermMatcher(["fast", "fast table"])
    hits = list(m.finditer("a FAST TABLE here"))
    # longest pattern wins at the shared start; match text verbatim
    assert len(hits) == 1
    start, end, pid = hits[0]
    assert (start, end, pid) == (2, 12, 1)


def test_matcher_substring_semantics():
    # the reference AC has no word boundaries: "fast" matches inside
    # "breakfast" (highlighter.rs:93-97)
    assert top_fragments("I ate breakfast today here.", ["fast"]) == (
        "I ate break<b>fast</b> today here."
    )


# -- fragment selection ------------------------------------------------------


def test_top1_picks_best_scored_sentence():
    out = top_fragments(TEXT, ["fast", "table"], fragment_number=1)
    assert out == (
        " The <b>table</b> was <b>fast</b> but not a "
        "<b>fast</b> <b>table</b>."
    )


def test_top2_document_order():
    out = top_fragments(TEXT, ["fast", "table"], fragment_number=2)
    # both selected fragments appear in ORIGINAL document order
    assert out.index("scan beats") < out.index("was <b>fast</b>")


def test_gap_between_selected_fragments_gets_ellipsis():
    text = "aa x bb x aa. aa x. aa x bb."
    out = top_fragments(text, ["aa", "bb"], fragment_number=2)
    # fragments 0 (2.3) and 2 (2.0) selected; pushed fragment 1
    # (displaced from the heap) leaves an index gap → "..."
    assert "..." in out
    assert out.index("...") < out.index(" <b>aa</b> x <b>bb</b>.")


def test_adjacent_selected_fragments_no_ellipsis():
    text = "aa x bb. aa x bb x aa. zz zz zz."
    out = top_fragments(text, ["aa", "bb"], fragment_number=2)
    # zero-score sections are never pushed, so selected fragments
    # with only zero-score text between them count as adjacent
    assert "..." not in out


# -- windowing (highlighter.rs:149-179) --------------------------------------


def test_fragment_size_right_truncation():
    out = top_fragments(TEXT, ["fast"], fragment_number=1, fragment_size=20)
    # best fragment (two "fast") truncated at the first space past 20
    # chars, right-trim marker appended
    assert out == " The table was <b>fast</b> but..."


def test_fragment_size_left_truncation():
    text = "w1 w2 w3 w4 w5 w6 w7 w8 needle here."
    out = top_fragments(text, ["needle"], fragment_number=1, fragment_size=15)
    # first match ends past the window → keep the TAIL, left marker
    assert out.startswith("...")
    assert "<b>needle</b>" in out


def test_fragment_size_zero_means_unlimited():
    out = top_fragments(TEXT, ["fox"], fragment_number=1, fragment_size=0)
    assert out == "The quick brown <b>fox</b>."


# -- modes -------------------------------------------------------------------


def test_fragment_number_zero_whole_text():
    out = top_fragments(TEXT, ["fox"], fragment_number=0)
    assert out == TEXT.replace("fox", "<b>fox</b>")


def test_no_score_fast_path_single_char_term():
    # one single-char pattern → reference no_score_no_highlight:
    # FIRST fragments win (no scoring) and no markup is applied
    assert top_fragments("ab. cd. ef.", ["c"], fragment_number=1) == "ab."


def test_markup_off_and_custom_tags():
    assert top_fragments(TEXT, ["fox"], highlight_markup=False) == (
        "The quick brown fox."
    )
    assert top_fragments(
        TEXT, ["fox"], pre_tags="<em>", post_tags="</em>"
    ) == "The quick brown <em>fox</em>."


def test_absent_terms_fall_back_to_first_fragment_unmarked():
    out = top_fragments(TEXT, ["zebra"], fragment_number=2)
    assert out == "The quick brown fox."


def test_empty_text_and_trailing_single_char_quirk():
    assert top_fragments("", ["x"]) == ""
    # a single trailing char after the last boundary is dropped
    # (highlighter.rs:288: last + 1 < len)
    assert top_fragments("aa bb. z", ["bb"]) == "aa <b>bb</b>."


# -- synonyms (highlighter.rs:77-91) -----------------------------------------


def test_synonym_expansion_appends_targets():
    groups = [{"terms": ["fast", "quick"], "multiway": True}]
    terms = expand_terms_with_synonyms(["fast"], groups)
    assert terms == ["fast", "quick"]
    out = top_fragments(
        "A quick look. A fast scan.", terms, fragment_number=2
    )
    assert "<b>quick</b>" in out and "<b>fast</b>" in out


# -- Spark UDF twin ----------------------------------------------------------


def test_udf_identical_to_python_twin(spark):
    rows = [
        (0, TEXT),
        (1, "I ate breakfast today here."),
        (2, ""),
        (3, "aa x bb x aa. aa x. aa x bb."),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "docid long, text string")
    udf = top_fragments_udf(["fast", "table", "aa", "bb"],
                            fragment_number=2, fragment_size=40)
    got = {
        r["docid"]: r["frag"]
        for r in df.select("docid", udf(F.col("text")).alias("frag")).collect()
    }
    for docid, text in rows:
        want = top_fragments(
            text or "", ["fast", "table", "aa", "bb"],
            fragment_number=2, fragment_size=40,
        )
        assert got[docid] == want, docid
