"""SmallFloat byte4 quantization golden tests (reference index.rs:4232-4279)."""

from __future__ import annotations

import numpy as np

from seekstorm_spark.quantization import (
    DOCUMENT_LENGTH_COMPRESSION,
    byte4_to_int,
    decode_lengths,
    encode_lengths,
    int_to_byte4,
)


def test_free_values_identity():
    for i in range(24):
        assert int_to_byte4(i) == i
        assert byte4_to_int(i) == i


def test_roundtrip_monotone_floor():
    # decode(encode(x)) <= x, and encode is monotone non-decreasing
    prev_b = -1
    for x in range(0, 70000):
        b = int_to_byte4(x)
        assert b >= prev_b
        prev_b = b
        assert byte4_to_int(b) <= x
    # the decode table round-trips exactly
    for b in range(256):
        assert int_to_byte4(byte4_to_int(b)) == b


def test_table_strictly_increasing():
    t = DOCUMENT_LENGTH_COMPRESSION
    assert len(t) == 256
    assert all(t[i] < t[i + 1] for i in range(255))
    assert t[24] == 24
    assert t[255] == byte4_to_int(255)


def test_vectorized_matches_scalar():
    xs = np.concatenate(
        [np.arange(0, 4096), np.array([65_535, 65_536, 100_000, 10**6, 10**9])]
    )
    enc = encode_lengths(xs)
    assert [int(b) for b in enc] == [int_to_byte4(int(x)) for x in xs]
    dec = decode_lengths(enc)
    assert [int(v) for v in dec] == [byte4_to_int(int_to_byte4(int(x))) for x in xs]
