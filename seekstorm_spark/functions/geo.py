"""Geo helpers: Morton encoding + distance (reference geo_search.rs).

The reference stores a Point as a lossy u64 Morton code — lat/lon
scaled by 10^7 to i32, bit-interleaved (`geo_search.rs:27-88`) — and
filters radius queries by a Morton range before the exact distance
check (`geo_search.rs:128-144`). Spark-side the Morton code is a
computed long column: range predicates on it prune parquet row groups
the same way the reference prunes its facet array.
"""

from __future__ import annotations

import math

import numpy as np

_SCALE = 10_000_000  # ×10^7, reference geo_search.rs:33
EARTH_RADIUS_KM = 6371.0
KM_PER_MILE = 1.609344


def _spread(v: np.ndarray) -> np.ndarray:
    """Interleave 32-bit ints with zeros → 64-bit (Morton component)."""
    x = v.astype(np.uint64)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def _unspread(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64) & np.uint64(0x5555555555555555)
    x = (x | (x >> np.uint64(1))) & np.uint64(0x3333333333333333)
    x = (x | (x >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return x


def morton_encode(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    """(lat, lon) degrees → u64 Morton code (i32 ×10^7 interleave)."""
    la = (np.asarray(lat, dtype=np.float64) * _SCALE).astype(np.int64)
    lo = (np.asarray(lon, dtype=np.float64) * _SCALE).astype(np.int64)
    # bias i32 → u32 so the interleave is order-preserving per axis
    la_u = (la + (1 << 31)).astype(np.uint64)
    lo_u = (lo + (1 << 31)).astype(np.uint64)
    return (_spread(la_u) << np.uint64(1)) | _spread(lo_u)


def morton_decode(code: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    c = np.asarray(code, dtype=np.uint64)
    la = _unspread(c >> np.uint64(1)).astype(np.int64) - (1 << 31)
    lo = _unspread(c).astype(np.int64) - (1 << 31)
    return la.astype(np.float64) / _SCALE, lo.astype(np.float64) / _SCALE


def haversine_km(
    lat1: np.ndarray, lon1: np.ndarray, lat2: float, lon2: float
) -> np.ndarray:
    """Great-circle distance in km (derived DistanceField analog,
    reference geo_search.rs:115-127)."""
    p1 = np.radians(np.asarray(lat1, dtype=np.float64))
    p2 = math.radians(lat2)
    dp = np.radians(np.asarray(lat2 - np.asarray(lat1), dtype=np.float64))
    dl = np.radians(np.asarray(lon2 - np.asarray(lon1), dtype=np.float64))
    a = (
        np.sin(dp / 2) ** 2
        + np.cos(p1) * math.cos(p2) * np.sin(dl / 2) ** 2
    )
    return 2 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(a))


def _window_range(lat_lo: float, lat_hi: float, lon_lo: float, lon_hi: float) -> tuple[int, int]:
    codes = [
        int(morton_encode(np.array([la]), np.array([lo]))[0])
        for la in (lat_lo, lat_hi)
        for lo in (lon_lo, lon_hi)
    ]
    return min(codes), max(codes)


def geo_boxes_for_radius(
    lat: float, lon: float, radius_km: float
) -> list[tuple[float, float, float, float]]:
    """Conservative lat/lon boxes (lat_lo, lat_hi, lon_lo, lon_hi)
    covering the radius.

    The degree constant derives from the SAME sphere the haversine
    uses (π·R/180 ≈ 111.195 km/deg for R = 6371; the older hand
    constant 111.32 km/deg made boxes ~0.11% too SMALL, which would
    let zone-map skipping drop true matches at the radius fringe),
    padded by 0.5% so the box strictly contains the circle.

    Latitude is clamped to ±90; a longitude window crossing the
    antimeridian is SPLIT into two boxes (one per side) so the wrapped
    portion is never silently dropped; a window touching a pole falls
    back to all longitudes at the polar latitudes (every meridian
    converges there).
    """
    km_per_deg = math.pi * EARTH_RADIUS_KM / 180.0
    pad = 1.005
    dlat = pad * radius_km / km_per_deg
    lat_lo = max(lat - dlat, -90.0)
    lat_hi = min(lat + dlat, 90.0)
    touches_pole = (lat - dlat < -90.0) or (lat + dlat > 90.0)
    # widest longitude span inside the window (cos shrinks toward poles)
    min_cos = min(
        math.cos(math.radians(lat_lo)), math.cos(math.radians(lat_hi))
    )
    if touches_pole or min_cos < 1e-9:
        return [(lat_lo, lat_hi, -180.0, 180.0)]
    dlon = pad * radius_km / (km_per_deg * min_cos)
    if dlon >= 180.0:
        return [(lat_lo, lat_hi, -180.0, 180.0)]
    lon_lo, lon_hi = lon - dlon, lon + dlon
    if lon_lo < -180.0:  # wraps west → [lon_lo+360, 180] ∪ [-180, lon_hi]
        return [
            (lat_lo, lat_hi, lon_lo + 360.0, 180.0),
            (lat_lo, lat_hi, -180.0, lon_hi),
        ]
    if lon_hi > 180.0:  # wraps east
        return [
            (lat_lo, lat_hi, lon_lo, 180.0),
            (lat_lo, lat_hi, -180.0, lon_hi - 360.0),
        ]
    return [(lat_lo, lat_hi, lon_lo, lon_hi)]


def morton_ranges_for_radius(
    lat: float, lon: float, radius_km: float
) -> list[tuple[int, int]]:
    """Conservative Morton [lo, hi] ranges covering the radius — the
    coarse pre-filter before the exact distance check
    (geo_search.rs:128-144); the boxes come from
    :func:`geo_boxes_for_radius` (clamped, antimeridian-split)."""
    return [
        _window_range(lat_lo, lat_hi, lon_lo, lon_hi)
        for lat_lo, lat_hi, lon_lo, lon_hi in geo_boxes_for_radius(
            lat, lon, radius_km
        )
    ]


def morton_range_for_radius(
    lat: float, lon: float, radius_km: float
) -> tuple[int, int]:
    """Single conservative [lo, hi] range (the envelope of
    :func:`morton_ranges_for_radius` — prefer that for wrap-aware
    pruning; this envelope is correct but prunes less near ±180)."""
    ranges = morton_ranges_for_radius(lat, lon, radius_km)
    return min(r[0] for r in ranges), max(r[1] for r in ranges)


def haversine_col(lat_col, lon_col, lat2: float, lon2: float):
    """Great-circle distance (km) as a BUILT-IN column expression —
    float64 JVM trig in the same operand order as :func:`haversine_km`
    and the DuckDB oracle, so rounded values compare exactly."""
    from pyspark.sql import functions as F

    p1 = F.radians(lat_col)
    p2 = math.radians(lat2)
    dp = F.radians(F.lit(lat2) - lat_col)
    dl = F.radians(F.lit(lon2) - lon_col)
    a = F.pow(F.sin(dp / 2), 2) + F.cos(p1) * F.lit(math.cos(p2)) * F.pow(
        F.sin(dl / 2), 2
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def geo_radius_filter(
    df,
    lat_col: str,
    lon_col: str,
    lat: float,
    lon: float,
    radius_km: float,
    morton_col: str | None = None,
):
    """Rows within ``radius_km`` of (lat, lon), with the distance as a
    ``dist_km`` column — Morton-range prefilter + exact haversine
    post-filter (reference geo_search.rs:128-144).

    When ``morton_col`` names a STORED Morton column the range
    predicates push down to the scan (at scale the Morton code is a
    write-time column / sort key, so row groups outside the window are
    never read); otherwise the code is computed on the fly and the
    prefilter only cheapens the exact check. The prefilter window is
    conservative (covers the radius, splits across the antimeridian),
    so results equal the pure-haversine oracle."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    if morton_col is None:
        @pandas_udf(LongType())
        def _morton(lat_s, lon_s):
            import pandas as pd

            return pd.Series(
                morton_encode(lat_s.values, lon_s.values).astype(np.int64)
            )

        df = df.withColumn(
            "_mcode", _morton(F.col(lat_col), F.col(lon_col))
        )
        morton_col = "_mcode"
    cond = None
    for lo, hi in morton_ranges_for_radius(lat, lon, radius_km):
        # stored Morton codes are u64 viewed as i64: split ranges that
        # cross the sign boundary so BETWEEN stays correct
        for slo, shi in _signed_ranges(lo, hi):
            c = F.col(morton_col).between(slo, shi)
            cond = c if cond is None else (cond | c)
    pre = df.filter(cond)
    return (
        pre.withColumn(
            "dist_km", haversine_col(F.col(lat_col), F.col(lon_col), lat, lon)
        )
        .filter(F.col("dist_km") <= radius_km)
        .drop("_mcode")
    )


def _signed_ranges(lo: int, hi: int) -> list[tuple[int, int]]:
    """[lo, hi] over u64 → ranges over the i64 (two's-complement)
    view, splitting at the sign boundary 2^63."""
    SPLIT = 1 << 63

    def s(v: int) -> int:
        return v - (1 << 64) if v >= SPLIT else v

    if lo < SPLIT <= hi:
        return [(s(lo), (1 << 63) - 1), (-(1 << 63), s(hi))]
    return [(s(lo), s(hi))]
