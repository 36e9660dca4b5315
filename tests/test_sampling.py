"""hash_sample / stratified_sample / pack_sequences."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from seekstorm_spark.functions.sampling import (
    SAMPLE_HASH_BITS,
    hash_sample,
    pack_sequences,
    sample_hash,
    stratified_sample,
)


def _py_hash(key, seed=42) -> int:
    hx = hashlib.md5(f"{seed}|{key}".encode()).hexdigest()[:15]
    return int(hx, 16)


def test_sample_hash_matches_python_twin(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    rows = df.select("doc_id", sample_hash("doc_id").alias("h")).collect()
    for r in rows:
        assert r["h"] == _py_hash(r["doc_id"])


def test_hash_sample_deterministic_and_calibrated(spark):
    df = spark.createDataFrame([(i,) for i in range(4000)], "doc_id long")
    kept1 = {r["doc_id"] for r in hash_sample(df, 0.25).collect()}
    kept2 = {r["doc_id"] for r in hash_sample(df, 0.25).collect()}
    assert kept1 == kept2
    assert 0.20 < len(kept1) / 4000 < 0.30
    # monotone: a higher rate keeps a superset
    kept_half = {r["doc_id"] for r in hash_sample(df, 0.5).collect()}
    assert kept1 <= kept_half


def test_stratified_rates(spark):
    rows = [(i, "en" if i % 2 == 0 else "zh") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = stratified_sample(df, {"en": 0.1, "zh": 1.0}).collect()
    en = sum(1 for r in kept if r["lang"] == "en")
    zh = sum(1 for r in kept if r["lang"] == "zh")
    assert zh == 1000  # rate 1.0 keeps every zh row
    assert 50 < en < 150
    # stratum not in rates is dropped
    df2 = spark.createDataFrame([(1, "fr")], "doc_id long, lang string")
    assert stratified_sample(df2, {"en": 1.0}).count() == 0


def test_rate_one_keeps_everything(spark):
    # int(1.0 * 2**60) == 2**60 > every 60-bit hash value
    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    assert hash_sample(df, 1.0).count() == 100
    assert hash_sample(df, 0.0).count() == 0
    assert (1 << SAMPLE_HASH_BITS) == 2**60


def test_pack_sequences(spark):
    rows = [
        # group g: token counts 3, 4, 5 with budget 6
        (0, "g", 3),
        (1, "g", 4),
        (2, "g", 5),
        # group h: one long doc straddling windows
        (3, "h", 14),
        (4, "h", 1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, src string, n long")
    got = {
        r["doc_id"]: (r["pack_id"], r["pack_offset"])
        for r in pack_sequences(
            df, "n", budget=6, group_col="src", order_col="doc_id"
        ).collect()
    }
    assert got == {
        0: (0, 0),  # cum_before 0
        1: (0, 3),  # cum_before 3
        2: (1, 1),  # cum_before 7
        3: (0, 0),
        4: (2, 2),  # cum_before 14
    }


def test_sampling_plan_is_jvm_only(spark):
    df = spark.createDataFrame([(1,)], "doc_id long")
    plan = (
        hash_sample(df, 0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
