"""fvecs/ivecs/bvecs readers (TEXMEX vector-file layout): uniform
fast path, ragged fallback, multi-file fan-out, corruption errors."""

from __future__ import annotations

import numpy as np
import pytest

from seekstorm_spark.sources.vecs import (
    _parse_vecs,
    read_bvecs,
    read_fvecs,
    read_ivecs,
    write_vecs_file,
)


def _rng_vecs(n, d, dtype, seed=0):
    rng = np.random.RandomState(seed)
    if dtype == np.float32:
        return [rng.randn(d).astype(np.float32) for _ in range(n)]
    return [
        rng.randint(0, 200, size=d).astype(dtype) for _ in range(n)
    ]


def test_fvecs_roundtrip(spark, tmp_path):
    vecs = _rng_vecs(50, 8, np.float32)
    p = str(tmp_path / "a.fvecs")
    write_vecs_file(vecs, p, "f")
    rows = read_fvecs(spark, p).orderBy("idx").collect()
    assert len(rows) == 50
    for i, r in enumerate(rows):
        assert r["idx"] == i
        assert np.array_equal(
            np.asarray(r["vec"], dtype=np.float32), vecs[i]
        )


def test_ivecs_and_bvecs_roundtrip(spark, tmp_path):
    ivecs = _rng_vecs(20, 10, np.int32, seed=1)
    bvecs = _rng_vecs(20, 16, np.uint8, seed=2)
    pi, pb = str(tmp_path / "g.ivecs"), str(tmp_path / "g.bvecs")
    write_vecs_file(ivecs, pi, "i")
    write_vecs_file(bvecs, pb, "b")
    got_i = read_ivecs(spark, pi).orderBy("idx").collect()
    got_b = read_bvecs(spark, pb).orderBy("idx").collect()
    for i in range(20):
        assert list(got_i[i]["vec"]) == list(ivecs[i])
        assert list(got_b[i]["vec"]) == list(bvecs[i])


def test_ragged_dims_fallback(spark, tmp_path):
    vecs = [
        np.arange(3, dtype=np.float32),
        np.arange(7, dtype=np.float32) * 0.5,
        np.arange(2, dtype=np.float32) - 1.0,
    ]
    p = str(tmp_path / "ragged.fvecs")
    write_vecs_file(vecs, p, "f")
    rows = read_fvecs(spark, p).orderBy("idx").collect()
    assert [len(r["vec"]) for r in rows] == [3, 7, 2]
    assert np.allclose(rows[1]["vec"], vecs[1])


def test_multi_file_glob(spark, tmp_path):
    a = _rng_vecs(5, 4, np.float32, seed=3)
    b = _rng_vecs(7, 4, np.float32, seed=4)
    write_vecs_file(a, str(tmp_path / "s1.fvecs"), "f")
    write_vecs_file(b, str(tmp_path / "s2.fvecs"), "f")
    out = read_fvecs(spark, str(tmp_path) + "/*.fvecs").collect()
    assert len(out) == 12
    per_file = {}
    for r in out:
        per_file.setdefault(r["path"], []).append(r["idx"])
    assert sorted(len(v) for v in per_file.values()) == [5, 7]
    for idxs in per_file.values():
        assert sorted(idxs) == list(range(len(idxs)))


def test_corrupt_file_raises():
    with pytest.raises(ValueError):
        _parse_vecs(np.int32(-5).tobytes() + b"\x00" * 12, "f")
    with pytest.raises(ValueError):
        # header promises more bytes than the file holds
        _parse_vecs(np.int32(100).tobytes() + b"\x00" * 8, "f")


def test_empty_file(spark, tmp_path):
    p = str(tmp_path / "empty.fvecs")
    open(p, "wb").close()
    assert read_fvecs(spark, p).count() == 0
