"""The segment-row build shuffle (emit='segments' + _build_seg) must
produce EXACTLY the posting rows of the pair shuffle (emit='pairs' +
_build) for the same corpus — same bytes, same counts, same block-max
metadata — including multi-segment runs whose boundary docid varint
the reduce re-encodes, n-gram payloads, synonyms, stopwords,
multi-field df unions and non-zero base docids."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


class _FakeSel:
    def select(self, *a):
        return self

    def mapInArrow(self, fn, schema):
        return fn


class _FakeGrouped:
    def __init__(self, sink, tag):
        self.sink, self.tag = sink, tag

    def applyInPandas(self, fn, schema):
        self.sink[self.tag] = fn
        return None


class _FakeDF:
    def __init__(self, sink, cols, tag):
        self.sink, self.columns, self.tag = sink, cols, tag

    def withColumn(self, *a, **k):
        return self

    def groupBy(self, *a):
        return _FakeGrouped(self.sink, self.tag)


def _capture_kernels(block_size):
    """Both reduce kernels, closure-bound to ``block_size`` (needs an
    active SparkContext for the plan expressions in the wrapper)."""
    import seekstorm_spark.index.builder as B

    sink: dict = {}
    B.build_posting_blocks(
        _FakeDF(sink, ["docid", "term", "meta", "grams", "pos_vb"], "v1"),
        n_buckets=8,
        block_size=block_size,
    )
    B.build_posting_blocks(
        _FakeDF(sink, ["term", "seg_first"], "v2"),
        n_buckets=8,
        block_size=block_size,
    )
    return sink["v1"], sink["v2"]


def _make_batches(n_docs, n_batches, vocab, seed, base_docid=0, fields=1):
    rng = np.random.default_rng(seed)
    per = n_docs // n_batches
    out, docid = [], base_docid
    for _ in range(n_batches):
        ids, t1, t2 = [], [], []
        for _ in range(per):
            n = int(rng.integers(5, 60))
            toks = [f"term{int(p):05d}" for p in rng.integers(0, vocab, n)]
            if rng.random() < 0.05:
                toks = []
            if rng.random() < 0.1:
                toks = toks[:3] * 5
            t1.append(" ".join(toks))
            t2.append(" ".join(reversed(toks[:8])))
            ids.append(docid)
            docid += int(rng.integers(1, 3))
        arrays = [pa.array(ids, pa.int64()), pa.array(t1, pa.string())]
        names = ["docid", "text"]
        if fields == 2:
            arrays.append(pa.array(t2, pa.string()))
            names.append("title")
        out.append(pa.RecordBatch.from_arrays(arrays, names=names))
    return out


CONFIGS = {
    # small blocks force runs spanning many segments (boundary splice)
    "smallblocks": (dict(text_col="text"), 128, dict(n_docs=400, n_batches=4, vocab=80, seed=2)),
    "ngrams_all": (
        dict(
            text_col="text",
            frequent_terms=frozenset(f"term{i:05d}" for i in range(12)),
            ngram_patterns=("ff", "fr", "rf", "fff", "rff", "ffr", "frf"),
        ),
        256,
        dict(n_docs=240, n_batches=3, vocab=30, seed=3),
    ),
    "syn_stop": (
        dict(
            text_col="text",
            stop_words=frozenset(["term00003"]),
            synonym_map={"term00005": ["term00001", "zsyn"]},
            frequent_terms=frozenset(f"term{i:05d}" for i in range(8)),
        ),
        256,
        dict(n_docs=240, n_batches=3, vocab=40, seed=4),
    ),
    "multifield": (
        dict(text_col="text", fields=["text", "title"]),
        512,
        dict(n_docs=300, n_batches=3, vocab=60, seed=5, fields=2),
    ),
    "base_offset": (dict(text_col="text"), 1 << 16, dict(n_docs=200, n_batches=2, vocab=60, seed=6, base_docid=65000)),
}


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_segment_shuffle_bit_identical(spark, name):
    import seekstorm_spark.index.builder as B
    from seekstorm_spark.hashing import term_bucket

    tok_kwargs, block_size, mk = CONFIGS[name]
    batches = _make_batches(**mk)
    build_v1, build_v2 = _capture_kernels(block_size)
    fn_pairs = B.tokenize_to_term_rows(_FakeSel(), **tok_kwargs, emit="pairs")
    fn_segs = B.tokenize_to_term_rows(
        _FakeSel(), **tok_kwargs, emit="segments", block_size=block_size
    )
    half = max(1, len(batches) // 2)
    tasks = [batches[:half], batches[half:]]

    pair_tabs: list = []
    seg_tabs: list = []
    for tb in tasks:
        if tb:
            pair_tabs += list(fn_pairs(iter(tb)))
            seg_tabs += list(fn_segs(iter(tb)))
    pt = pa.Table.from_batches(pair_tabs).to_pandas()
    pt["block_id"] = (pt["docid"] // block_size).astype("int64")
    pt["tbucket"] = pt["term"].map(lambda s: term_bucket(s, 8))
    v1 = pd.concat(
        [
            build_v1(
                (int(k[0]), int(k[1])),
                g.drop(columns=["block_id", "tbucket"]).reset_index(drop=True),
            )
            for k, g in pt.groupby(["tbucket", "block_id"], sort=True)
        ],
        ignore_index=True,
    )
    st = pa.Table.from_batches(seg_tabs).to_pandas()
    st["tbucket"] = st["term"].map(lambda s: term_bucket(s, 8))
    v2 = pd.concat(
        [
            build_v2(
                (int(k[0]), int(k[1])),
                g.drop(columns=["tbucket"]).reset_index(drop=True),
            )
            for k, g in st.groupby(["tbucket", "block_id"], sort=True)
        ],
        ignore_index=True,
    )
    for df in (v1, v2):
        df.sort_values(
            ["tbucket", "block_id", "term", "field"],
            inplace=True,
            kind="mergesort",
        )
        df.reset_index(drop=True, inplace=True)
    assert v1.shape == v2.shape
    for col in v1.columns:
        assert v1[col].tolist() == v2[col].tolist(), col
    # splice coverage: at least one run actually joined >1 segment
    if name == "smallblocks":
        assert (st.groupby(["term", "field", "block_id"]).size() > 1).any()


def test_segment_emit_rejects_unsorted_docids():
    import seekstorm_spark.index.builder as B

    fn = B.tokenize_to_term_rows(
        _FakeSel(), text_col="text", emit="segments", block_size=1 << 16
    )
    rb = pa.RecordBatch.from_arrays(
        [
            pa.array([5, 3], pa.int64()),
            pa.array(["a b", "c d"], pa.string()),
        ],
        names=["docid", "text"],
    )
    with pytest.raises(ValueError, match="ascending"):
        list(fn(iter([rb])))
