"""Planar geometry math: WKB codec + vectorized area/centroid/length.

Replaces the PostGIS scalar surface the reference uses — ST_X/ST_Y
(07_pipeline_point.sh:206-207), ST_Centroid (07_pipeline_polygon.sh:274-275),
ST_Area (07_pipeline_polygon.sh:143), ST_Length
(scripts/verify/verify_import.py:339) — with planar (EPSG:3857-style) math,
matching the reference's Mercator-planar semantics (SURVEY.md §7.3 item 6).

Geometry travels as WKB `binary` columns; math runs as Arrow-batched pandas
UDFs over numpy (never per-row Python). WKB here is the standard OGC
little-endian encoding (public format), written/read with `struct`/numpy.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3

# ---------------------------------------------------------------------------
# WKB codec (little-endian, 2D)
# ---------------------------------------------------------------------------


def point_wkb(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, WKB_POINT, x, y)


def linestring_wkb(coords: np.ndarray) -> bytes:
    head = struct.pack("<BII", 1, WKB_LINESTRING, len(coords))
    return head + np.asarray(coords, dtype="<f8").tobytes()


def polygon_wkb(ring: np.ndarray) -> bytes:
    """Single-ring polygon; ring must be closed (first == last vertex)."""
    ring = np.asarray(ring, dtype="<f8")
    head = struct.pack("<BIII", 1, WKB_POLYGON, 1, len(ring))
    return head + ring.tobytes()


def parse_wkb(buf: bytes) -> tuple[int, np.ndarray]:
    """Return (geom_type, coords[n,2]) for point/linestring/polygon(1 ring)."""
    endian = "<" if buf[0] == 1 else ">"
    (gtype,) = struct.unpack_from(f"{endian}I", buf, 1)
    if gtype == WKB_POINT:
        x, y = struct.unpack_from(f"{endian}dd", buf, 5)
        return gtype, np.array([[x, y]])
    if gtype == WKB_LINESTRING:
        (n,) = struct.unpack_from(f"{endian}I", buf, 5)
        coords = np.frombuffer(buf, dtype=f"{endian}f8", count=2 * n, offset=9)
        return gtype, coords.reshape(n, 2)
    if gtype == WKB_POLYGON:
        (nrings,) = struct.unpack_from(f"{endian}I", buf, 5)
        (n,) = struct.unpack_from(f"{endian}I", buf, 9)  # outer ring only
        coords = np.frombuffer(buf, dtype=f"{endian}f8", count=2 * n, offset=13)
        return gtype, coords.reshape(n, 2)
    raise ValueError(f"unsupported WKB geometry type {gtype}")


# ---------------------------------------------------------------------------
# vectorized kernels
# ---------------------------------------------------------------------------


def shoelace_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


def ring_centroid(ring: np.ndarray) -> tuple[float, float]:
    """Area-weighted polygon centroid (planar, matches ST_Centroid)."""
    x, y = ring[:, 0], ring[:, 1]
    cross = x * np.roll(y, -1) - np.roll(x, -1) * y
    a = cross.sum() / 2.0
    if abs(a) < 1e-12:  # degenerate: fall back to vertex mean
        return float(x[:-1].mean()), float(y[:-1].mean())
    cx = ((x + np.roll(x, -1)) * cross).sum() / (6.0 * a)
    cy = ((y + np.roll(y, -1)) * cross).sum() / (6.0 * a)
    return float(cx), float(cy)


def path_length(coords: np.ndarray) -> float:
    d = np.diff(coords, axis=0)
    return float(np.sqrt((d * d).sum(axis=1)).sum())


# ---------------------------------------------------------------------------
# pandas UDFs (Arrow-batched; the engine's only Python execution surface)
# ---------------------------------------------------------------------------


@F.pandas_udf(DoubleType())
def _area_udf(wkb: pd.Series) -> pd.Series:
    out = np.empty(len(wkb))
    for i, buf in enumerate(wkb):
        gtype, coords = parse_wkb(buf)
        out[i] = shoelace_area(coords) if gtype == WKB_POLYGON else 0.0
    return pd.Series(out)


@F.pandas_udf(DoubleType())
def _centroid_x_udf(wkb: pd.Series) -> pd.Series:
    return pd.Series([_centroid_of(buf)[0] for buf in wkb])


@F.pandas_udf(DoubleType())
def _centroid_y_udf(wkb: pd.Series) -> pd.Series:
    return pd.Series([_centroid_of(buf)[1] for buf in wkb])


def _centroid_of(buf: bytes) -> tuple[float, float]:
    gtype, coords = parse_wkb(buf)
    if gtype == WKB_POINT:
        return float(coords[0, 0]), float(coords[0, 1])
    if gtype == WKB_LINESTRING:
        return float(coords[:, 0].mean()), float(coords[:, 1].mean())
    return ring_centroid(coords)


@F.pandas_udf(DoubleType())
def _length_udf(wkb: pd.Series) -> pd.Series:
    out = np.empty(len(wkb))
    for i, buf in enumerate(wkb):
        gtype, coords = parse_wkb(buf)
        out[i] = path_length(coords) if gtype in (WKB_LINESTRING, WKB_POLYGON) else 0.0
    return pd.Series(out)


def planar_area_col(wkb_col: str | Column) -> Column:
    """ST_Area equivalent (planar m² in the source projection)."""
    return _area_udf(F.col(wkb_col) if isinstance(wkb_col, str) else wkb_col)


def planar_centroid_cols(wkb_col: str | Column) -> tuple[Column, Column]:
    """(ST_X(ST_Centroid(g)), ST_Y(ST_Centroid(g))) equivalents."""
    c = F.col(wkb_col) if isinstance(wkb_col, str) else wkb_col
    return _centroid_x_udf(c), _centroid_y_udf(c)


def planar_length_col(wkb_col: str | Column) -> Column:
    """ST_Length equivalent (planar)."""
    return _length_udf(F.col(wkb_col) if isinstance(wkb_col, str) else wkb_col)


# ---------------------------------------------------------------------------
# Web-Mercator (EPSG:3857) bridge — the reference's storage CRS
# (05_import_data.sh:131 `--proj 3857`). Links the geographic S2 path
# (lat/lng) to the planar hex/Z-order/area math. Spherical formula, JVM
# expressions; numpy twin for UDF kernels; e-notation SQL for oracles.
# ---------------------------------------------------------------------------

WEB_MERCATOR_R = 6378137.0


def mercator_cols(lat: Column, lng: Column) -> tuple[Column, Column]:
    """(lat, lng) degrees -> EPSG:3857 meters, pure JVM expressions."""
    x = F.lit(WEB_MERCATOR_R) * F.radians(lng)
    y = F.lit(WEB_MERCATOR_R) * F.log(F.tan(F.lit(math.pi / 4.0) + F.radians(lat) / F.lit(2.0)))
    return x, y


def inv_mercator_cols(x: Column, y: Column) -> tuple[Column, Column]:
    """EPSG:3857 meters -> (lat, lng) degrees, pure JVM expressions."""
    lng = F.degrees(x / F.lit(WEB_MERCATOR_R))
    lat = F.degrees(
        F.lit(2.0) * F.atan(F.exp(y / F.lit(WEB_MERCATOR_R))) - F.lit(math.pi / 2.0)
    )
    return lat, lng


def mercator_np(lat: "np.ndarray", lng: "np.ndarray") -> tuple["np.ndarray", "np.ndarray"]:
    x = WEB_MERCATOR_R * np.radians(lng)
    y = WEB_MERCATOR_R * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def mercator_sql(lat_sql: str, lng_sql: str) -> tuple[str, str]:
    """SQL mirror (DuckDB) of mercator_cols — same op order and constants."""
    r = f"{WEB_MERCATOR_R!r}e0"
    x = f"({r} * radians({lng_sql}))"
    y = f"({r} * ln(tan({math.pi / 4.0!r}e0 + radians({lat_sql}) / 2.0)))"
    return x, y


# ---------------------------------------------------------------------------
# geometry validity audit (reference verify_import.py:223-231 ST_IsValid)
# ---------------------------------------------------------------------------

# classification precedence (first failing check wins) — the SQL oracle in
# contract.wkb_validity mirrors this exact CASE order
VALIDITY_REASONS = (
    "unparseable",
    "nonfinite_coord",
    "too_few_points",
    "unclosed_ring",
    "zero_area",
    "valid",
)

# collinear rings cancel to ~1e-4 of float noise at UK-grid magnitudes;
# genuine fixture areas are >= 1e5 m² — a 1.0 m² floor is engine-robust
ZERO_AREA_EPS = 1.0


def wkb_validity_reason(buf: bytes) -> str:
    """First failing validity check for one WKB blob (polygon semantics:
    point/linestring blobs only get the parse + finite checks)."""
    try:
        gtype, coords = parse_wkb(bytes(buf))
    except Exception:  # noqa: BLE001 — any malformed byte layout
        return "unparseable"
    if not np.isfinite(coords).all():
        return "nonfinite_coord"
    if gtype != WKB_POLYGON:
        return "valid"
    if len(coords) < 4:
        return "too_few_points"
    if coords[0, 0] != coords[-1, 0] or coords[0, 1] != coords[-1, 1]:
        return "unclosed_ring"
    if shoelace_area(coords[:-1]) < ZERO_AREA_EPS:
        return "zero_area"
    return "valid"


@F.pandas_udf(StringType())
def _validity_udf(wkb: pd.Series) -> pd.Series:
    return pd.Series([wkb_validity_reason(b) for b in wkb])


def wkb_validity_col(wkb_col: "str | Column") -> Column:
    """ST_IsValid-style audit reason per geometry (vectorized Arrow pass)."""
    return _validity_udf(F.col(wkb_col) if isinstance(wkb_col, str) else wkb_col)
