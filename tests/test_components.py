"""connected_components (large-star/small-star) vs a union-find twin.

Reference context: SeekStorm emits dedup DECISIONS per doc; the pair →
cluster step is the Spark-side analog that turns LSH candidate pairs
into keep-one-per-cluster labels (see dedup.py docstring).
"""

from __future__ import annotations

import random

from seekstorm_spark.functions.dedup import connected_components


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _spark_components(spark, edges):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "docid_a long, docid_b long"
    )
    rows = connected_components(df).collect()
    got = {r["docid"]: r["component"] for r in rows}
    assert len(rows) == len(got), "duplicate docid rows in output"
    return got


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    edges = [
        (rng.randrange(200), rng.randrange(200)) for _ in range(260)
    ]
    edges = [e for e in edges if e[0] != e[1]]
    expect = _union_find(edges)
    got = _spark_components(spark, edges)
    assert got == expect


def test_chain_worst_case(spark):
    # a 60-node path: diameter 59 — plain min-label propagation would
    # need ~59 rounds; star alternation must converge well inside 50
    edges = [(i, i + 1) for i in range(59)]
    got = _spark_components(spark, edges)
    assert got == {i: 0 for i in range(60)}


def test_two_components_and_self_pairs(spark):
    edges = [(5, 3), (3, 9), (20, 21), (21, 21)]
    got = _spark_components(spark, edges)
    assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20}


def test_empty_pairs(spark):
    got = _spark_components(spark, [])
    assert got == {}
