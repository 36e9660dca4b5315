"""C4 quality-filter hand vectors (Raffel et al. 2020 §2.2 rules)."""

from __future__ import annotations

from seekstorm_spark.functions.c4 import c4_clean

DOC_KEEP = (
    "This line has five good words.\n"
    "short line.\n"
    "no terminal punctuation on this line\n"
    'A quoted line with enough words here."\n'
    "Enable javascript to view this page properly.\n"
    "Another perfectly reasonable sentence ends here!\n"
    "Does this question line survive the filter?"
)

DOC_FEW_SENTENCES = "Only one surviving sentence lives right here.\nrest\n"
DOC_LOREM = (
    "First good sentence with enough words here.\n"
    "Second good sentence with enough words too.\n"
    "Third good sentence with Lorem Ipsum inside it.\n"
)
DOC_BRACE = (
    "First good sentence with enough words here.\n"
    "function f() { return 1; } is code-like text anyway.\n"
    "Second good sentence with enough words too.\n"
    "Third good sentence with enough words also.\n"
)


def _run(spark, docs):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    return {
        r["doc_id"]: r
        for r in c4_clean(df).orderBy("doc_id").collect()
    }


def test_c4_rules(spark):
    got = _run(spark, [DOC_KEEP, DOC_FEW_SENTENCES, DOC_LOREM, DOC_BRACE])

    r = got[0]
    assert r["c4_text"] == (
        "This line has five good words.\n"
        'A quoted line with enough words here."\n'
        "Another perfectly reasonable sentence ends here!\n"
        "Does this question line survive the filter?"
    )
    assert r["c4_n_lines"] == 4
    # '.' + '."' counts 2 + '!' + '?' = 4 terminal marks
    assert r["c4_n_sentences"] == 4
    assert r["c4_keep"] == 1

    assert got[1]["c4_n_lines"] == 1
    assert got[1]["c4_keep"] == 0  # < 3 sentences

    assert got[2]["c4_keep"] == 0  # lorem ipsum (case-insensitive)
    assert got[2]["c4_n_lines"] == 3  # line rules alone keep all three

    assert got[3]["c4_keep"] == 0  # '{' anywhere on the page
    # the brace line passes the LINE rules (ends in '.'), only the
    # page-level brace rule rejects the doc
    assert got[3]["c4_n_lines"] == 4


def test_c4_empty_and_plan(spark):
    got = _run(spark, ["", "   \n  \n"])
    for i in (0, 1):
        assert got[i]["c4_text"] == ""
        assert got[i]["c4_n_lines"] == 0
        assert got[i]["c4_keep"] == 0

    df = spark.createDataFrame([(1, "x.")], "doc_id long, text string")
    plan = (
        c4_clean(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
