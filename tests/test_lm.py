"""bigram_nll vs a pure-Python float32/float64 twin."""

from __future__ import annotations

import math

import numpy as np

from seekstorm_spark.functions.lm import bigram_nll, bigram_rows

DOCS = [
    "the cat sat on the mat",
    "the cat ran",
    "a dog sat on a mat",
    "singleton",  # < 2 tokens → no row
    "the the the the",
]


def _twin(docs):
    bgs = []
    for i, t in enumerate(docs):
        toks = t.lower().split()
        bgs.extend((i, toks[j], toks[j + 1]) for j in range(len(toks) - 1))
    c12: dict = {}
    c1: dict = {}
    vocab = {w for t in docs for w in t.lower().split()}
    for _, w1, w2 in bgs:
        c12[(w1, w2)] = c12.get((w1, w2), 0) + 1
        c1[w1] = c1.get(w1, 0) + 1
    out: dict = {}
    for i in set(b[0] for b in bgs):
        nlps = sorted(
            np.float32(-math.log((c12[(w1, w2)] + 1.0) / (c1[w1] + len(vocab))))
            for d, w1, w2 in bgs
            if d == i
        )
        total = 0.0
        for x in nlps:
            total += float(x)
        out[i] = (len(nlps), round(total / len(nlps), 4))
    return out


def test_bigram_rows_shape(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(DOCS)], "doc_id long, text string"
    )
    rows = bigram_rows(df).collect()
    assert len(rows) == sum(max(len(t.split()) - 1, 0) for t in DOCS)
    assert (3, "singleton", "") not in {(r[0], r[1], r[2]) for r in rows}


def test_bigram_nll_matches_twin(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(DOCS)], "doc_id long, text string"
    )
    got = {
        r["docid"]: (r["n_bigrams"], r["nll"])
        for r in bigram_nll(df).collect()
    }
    assert got == _twin(DOCS)
    assert 3 not in got  # sub-bigram doc drops out
    # repeated-bigram doc scores low nll (high probability)
    assert got[4][1] < got[0][1]
