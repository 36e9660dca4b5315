"""k-medoid IVF ANN index (reference clustering.rs cells +
vector_similarity.rs nprobe search): recall gate vs exact cosine,
cell-partition pruning, deterministic training."""

from __future__ import annotations

import numpy as np

from seekstorm_spark.functions.simsearch import (
    IvfIndex,
    cosine_topk,
    kmedoids_cosine,
)


def test_kmedoids_deterministic_and_clusters():
    rng = np.random.default_rng(3)
    # three well-separated direction clusters
    centers = np.eye(3)
    pts = np.concatenate(
        [c + 0.05 * rng.standard_normal((50, 3)) for c in centers]
    )
    m1 = kmedoids_cosine(pts, 3)
    m2 = kmedoids_cosine(pts, 3)
    assert np.array_equal(m1, m2)  # no RNG anywhere
    # each medoid aligns with one distinct center
    owners = {int(np.argmax(centers @ m)) for m in m1}
    assert owners == {0, 1, 2}


def test_ivf_recall_and_partition_pruning(spark, tmp_path):
    import io
    from contextlib import redirect_stdout

    rng = np.random.default_rng(11)
    base = rng.standard_normal((500, 64))
    q = rng.standard_normal(64)
    for i in range(15):  # plant near-duplicates of the query
        base[i] = q + 0.05 * rng.standard_normal(64)
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(500)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qv = [float(x) for x in q]

    idx = IvfIndex.build(spark, df, str(tmp_path / "ivf"), n_cells=8)
    exact = {r["vec_id"] for r in cosine_topk(df, qv, k=10).collect()}
    approx_df = idx.search(spark, qv, k=10, n_probe=3)
    approx = {r["vec_id"] for r in approx_df.collect()}
    assert len(exact & approx) / 10 >= 0.9

    buf = io.StringIO()
    with redirect_stdout(buf):
        approx_df.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "cid" in plan

    # reopen round-trips medoids exactly
    idx2 = IvfIndex.open(str(tmp_path / "ivf"))
    assert np.array_equal(idx.medoids, idx2.medoids)
    again = {r["vec_id"] for r in idx2.search(spark, qv, k=10, n_probe=3).collect()}
    assert again == approx


def test_ivf_append_and_refresh(spark, tmp_path):
    """Appends assign to frozen cells (appended vectors findable at
    the same n_probe); refresh retrains medoids over base+appends,
    rewrites partitions, and resets the drift counter."""
    rng = np.random.default_rng(5)
    base = rng.standard_normal((300, 32))
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    idx = IvfIndex.build(
        spark, df, str(tmp_path / "ivf_app"), n_cells=8, sample_size=300
    )

    # append near-duplicates of a fresh query direction
    q = rng.standard_normal(32)
    extra = np.stack([q + 0.05 * rng.standard_normal(32) for _ in range(10)])
    erows = [(1000 + i, [float(x) for x in extra[i]]) for i in range(10)]
    edf = spark.createDataFrame(erows, "vec_id long, embedding array<float>")
    idx.append(spark, edf)
    assert idx.meta["appended_since_train"] == 10
    assert idx.vectors(spark).count() == 310

    got = {r["vec_id"] for r in
           idx.search(spark, [float(x) for x in q], k=10, n_probe=3).collect()}
    # the planted appends dominate the top-k: assignment is exact
    # nearest-medoid, so appended vectors are findable pre-refresh
    assert len(got & set(range(1000, 1010))) >= 8

    # refresh: retrained medoids, same corpus, counter reset
    reopened = IvfIndex.open(str(tmp_path / "ivf_app"))
    assert reopened.meta["appended_since_train"] == 10
    idx.refresh(spark)
    assert idx.meta["appended_since_train"] == 0
    assert idx.vectors(spark).count() == 310
    got2 = {r["vec_id"] for r in
            idx.search(spark, [float(x) for x in q], k=10, n_probe=3).collect()}
    assert len(got2 & set(range(1000, 1010))) >= 8
    # exact top-10 by brute force agrees on the planted set
    allv = spark.createDataFrame(rows + erows,
                                 "vec_id long, embedding array<float>")
    brute = {r["vec_id"] for r in
             cosine_topk(allv, [float(x) for x in q], 10).collect()}
    assert len(got2 & brute) >= 8


def test_embedding_near_dup_lsh_recall(spark):
    """Planted near-duplicates: the banded-hyperplane LSH path finds
    (almost) every exact pair at threshold 0.95, with zero false
    positives after the exact-cosine verification."""
    import numpy as np

    from seekstorm_spark.functions.simsearch import (
        cosine_near_dup_lsh,
        cosine_near_dup_pairs,
    )

    rng = np.random.RandomState(11)
    base = rng.randn(120, 16).astype(np.float32)
    rows = [(i, base[i].tolist()) for i in range(120)]
    # plant 20 near-dups: id 200+i ≈ id i (tiny perturbation)
    for i in range(20):
        v = base[i] + 0.01 * rng.randn(16).astype(np.float32)
        rows.append((200 + i, v.astype(np.float32).tolist()))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    exact = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup_pairs(
            emb, threshold=0.95
        ).collect()
    }
    assert len(exact) >= 20  # the planted pairs are found exactly
    lsh = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup_lsh(
            emb, dim=16, threshold=0.95, bands=8, rows_per_band=4
        ).collect()
    }
    assert lsh <= exact  # exact verification → no false positives
    assert len(lsh & exact) / len(exact) >= 0.9  # recall
