"""TurboQuant (reference vector_similarity.rs:1825-2090): ±1 sign
scramble + FWHT rotation + per-vector i8 SQ. Gates: the Pandas-UDF
quantizer is bit-identical to the driver-side numpy twin; quantized
cosine top-k keeps recall vs exact float search; dot/euclidean
variants rank a vector's own (noisy) twin first; non-power-of-two
dims pad correctly."""

from __future__ import annotations

import numpy as np

from seekstorm_spark.functions.simsearch import (
    _tq_next_pow2,
    _tq_quantize_batch,
    cosine_topk,
    tq_sign_mask,
    turboquant_query,
    turboquant_topk,
    turboquant_vectors,
)


def _vecs(n=300, dim=64, seed=7, plant=10):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, dim))
    q = rng.standard_normal(dim)
    for i in range(plant):  # near-duplicates of the query
        base[i] = q + 0.05 * rng.standard_normal(dim)
    return base, q


def test_fwht_is_orthonormal_rotation():
    # the scramble+FWHT step must preserve L2 norms (it's a rotation):
    # quantization error then comes only from the i8 rounding
    rng = np.random.default_rng(3)
    mat = rng.standard_normal((20, 64))
    sign = tq_sign_mask(64)
    a = mat * sign
    h = 1
    while h < 64:
        g = a.reshape(20, 64 // (2 * h), 2, h)
        x, y = g[:, :, 0, :], g[:, :, 1, :]
        a = np.stack([x + y, x - y], axis=2).reshape(20, 64)
        h *= 2
    a = a / np.sqrt(64.0)
    assert np.allclose(
        np.linalg.norm(a, axis=1), np.linalg.norm(mat, axis=1), rtol=1e-9
    )


def test_udf_bit_identical_to_numpy_twin(spark):
    base, _ = _vecs()
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(len(base))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: (list(r["codes"]), r["scale"], r["norm"])
        for r in turboquant_vectors(df, dim=64).collect()
    }
    # twin: float32 parquet/DataFrame round-trip then the same kernel
    mat32 = base.astype(np.float32).astype(np.float64)
    codes, scale, norm = _tq_quantize_batch(mat32, tq_sign_mask(64), True)
    for i in range(len(base)):
        c, s, n = got[i]
        assert c == [int(x) for x in codes[i]]
        assert s == scale[i] and n == norm[i]


def test_cosine_recall_vs_exact(spark):
    base, q = _vecs()
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(len(base))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qv = [float(x) for x in q]
    exact = {r["vec_id"] for r in cosine_topk(df, qv, k=10).collect()}
    tq = turboquant_vectors(df, dim=64)
    approx = {
        r["vec_id"]
        for r in turboquant_topk(tq, qv, k=10, similarity="cosine").collect()
    }
    assert len(exact & approx) / 10 >= 0.9


def test_dot_and_euclidean_self_match(spark):
    base, q = _vecs(plant=0)
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(len(base))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    probe = [float(x) for x in base[42]]
    tq = turboquant_vectors(df, dim=64, normalize=False)
    top_dot = turboquant_topk(tq, probe, k=5, similarity="dot").collect()
    # euclidean: the vector itself is distance ~0 — must rank first
    top_euc = turboquant_topk(tq, probe, k=5, similarity="euclidean").collect()
    assert top_euc[0]["vec_id"] == 42
    assert top_euc[0]["dist"] < top_euc[1]["dist"]
    assert any(r["vec_id"] == 42 for r in top_dot)
    # schema: euclidean sorts asc on dist, dot desc
    dists = [r["dist"] for r in top_euc]
    assert dists == sorted(dists)


def test_non_power_of_two_dim_pads(spark):
    assert _tq_next_pow2(50) == 64
    rng = np.random.default_rng(5)
    base = rng.standard_normal((100, 50))
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(100)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = turboquant_vectors(df, dim=50).collect()
    assert all(len(r["codes"]) == 64 for r in out)
    qv = [float(x) for x in base[7]]
    qc, qs, qn = turboquant_query(qv)
    assert len(qc) == 64 and qs > 0
    top = turboquant_topk(
        turboquant_vectors(df, dim=50), qv, k=3, similarity="cosine"
    ).collect()
    assert top[0]["vec_id"] == 7  # own vector wins under cosine


def test_zero_vector_is_safe(spark):
    rows = [(0, [0.0] * 64), (1, [1.0] + [0.0] * 63)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in turboquant_vectors(df, dim=64).collect()}
    assert all(c == 0 for c in out[0]["codes"])  # no NaN, all-zero codes
    assert out[1]["scale"] > 0
