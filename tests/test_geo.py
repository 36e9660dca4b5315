"""Morton encode/decode + geo distance tests (reference geo_search.rs)."""

from __future__ import annotations

import numpy as np
import pytest

from seekstorm_spark.functions.geo import (
    haversine_km,
    morton_decode,
    morton_encode,
    morton_range_for_radius,
)


def test_morton_roundtrip():
    rng = np.random.default_rng(5)
    lat = rng.uniform(-90, 90, 1000)
    lon = rng.uniform(-180, 180, 1000)
    code = morton_encode(lat, lon)
    la2, lo2 = morton_decode(code)
    # lossy at 10^-7 degrees (the ×10^7 i32 scale)
    assert np.abs(la2 - lat).max() < 1e-6
    assert np.abs(lo2 - lon).max() < 1e-6


def test_morton_locality():
    # nearby points share high bits; distant ones don't
    a = int(morton_encode(np.array([48.8566]), np.array([2.3522]))[0])  # Paris
    b = int(morton_encode(np.array([48.8570]), np.array([2.3530]))[0])  # ~50m away
    c = int(morton_encode(np.array([-33.86]), np.array([151.21]))[0])  # Sydney
    assert (a ^ b).bit_length() < (a ^ c).bit_length()


def test_haversine_known_distance():
    # Paris → London ≈ 344 km
    d = haversine_km(np.array([48.8566]), np.array([2.3522]), 51.5074, -0.1278)
    assert d[0] == pytest.approx(344, abs=5)
    # zero distance
    z = haversine_km(np.array([10.0]), np.array([20.0]), 10.0, 20.0)
    assert z[0] == pytest.approx(0.0, abs=1e-9)


def test_morton_range_covers_radius():
    lat, lon, r = 48.8566, 2.3522, 10.0
    lo, hi = morton_range_for_radius(lat, lon, r)
    # points inside the radius fall inside the Morton range
    rng = np.random.default_rng(9)
    dlat = rng.uniform(-0.05, 0.05, 200)
    dlon = rng.uniform(-0.05, 0.05, 200)
    pts_lat, pts_lon = lat + dlat, lon + dlon
    inside = haversine_km(pts_lat, pts_lon, lat, lon) <= r
    codes = morton_encode(pts_lat, pts_lon)
    assert np.all((codes[inside] >= lo) & (codes[inside] <= hi))
