"""Broadcast R-tree point-in-polygon join.

The reference's designed proximity/PIP machinery (SCORING_STRATEGY.md:212-220,
verify_import.py:316 bbox queries) relies on PostGIS GiST. At Spark scale the
polygon side (UK boundary polygons, LSOA tiles) is small and the point side is
huge (10^12 pages), so the right plan is: build an STR-packed R-tree over the
polygons ONCE on the driver, broadcast it, and stream the point side through
`mapInPandas` — zero shuffle of the big side, numpy-vectorized refine, Arrow
batches in and out (no per-row Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType

from osmgraft.geo.geometry import parse_wkb


class STRtree:
    """Sort-Tile-Recursive-packed, two-level R-tree over polygon bboxes.

    Built once on the driver over the (small) polygon side and shipped to
    executors via a broadcast variable. `query_points` is fully vectorized:
    slice-level bbox culls first, then leaf bboxes, so the per-point work is
    proportional to candidates, not to the polygon count.
    """

    def __init__(self, rings: list[np.ndarray]):
        self.rings = rings
        n = len(rings)
        boxes = np.empty((n, 4))
        for i, r in enumerate(rings):
            boxes[i] = (r[:, 0].min(), r[:, 1].min(), r[:, 0].max(), r[:, 1].max())
        cx = (boxes[:, 0] + boxes[:, 2]) / 2
        nslices = max(1, int(np.ceil(np.sqrt(n))))
        order = np.argsort(cx, kind="stable")
        size = int(np.ceil(n / nslices))
        perm = []
        slice_bounds = []
        for s in range(0, n, size):
            sl = order[s : s + size]
            cy = (boxes[sl, 1] + boxes[sl, 3]) / 2
            sl = sl[np.argsort(cy, kind="stable")]
            perm.append(sl)
            b = boxes[sl]
            slice_bounds.append(
                (b[:, 0].min(), b[:, 1].min(), b[:, 2].max(), b[:, 3].max())
            )
        self.perm = np.concatenate(perm) if perm else np.empty(0, np.int64)
        self.boxes = boxes[self.perm] if n else boxes
        self.slice_bounds = np.array(slice_bounds).reshape(-1, 4)
        self.slice_size = size if n else 0

    def query_points(self, x: np.ndarray, y: np.ndarray):
        """Return (point_idx, ring_idx) candidate pairs (bbox hits)."""
        pts_idx: list[np.ndarray] = []
        ring_idx: list[np.ndarray] = []
        for s, (sx0, sy0, sx1, sy1) in enumerate(self.slice_bounds):
            in_slice = (x >= sx0) & (x <= sx1) & (y >= sy0) & (y <= sy1)
            if not in_slice.any():
                continue
            pi = np.nonzero(in_slice)[0]
            lo, hi = s * self.slice_size, min((s + 1) * self.slice_size, len(self.boxes))
            b = self.boxes[lo:hi]
            hits = (
                (x[pi, None] >= b[None, :, 0])
                & (x[pi, None] <= b[None, :, 2])
                & (y[pi, None] >= b[None, :, 1])
                & (y[pi, None] <= b[None, :, 3])
            )
            p, r = np.nonzero(hits)
            pts_idx.append(pi[p])
            ring_idx.append(self.perm[lo + r])
        if not pts_idx:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(pts_idx), np.concatenate(ring_idx)

    def contains(self, x: np.ndarray, y: np.ndarray):
        """(point_idx, ring_idx) pairs where the point is inside the ring
        (bbox cull + vectorized even-odd ray cast)."""
        pi, ri = self.query_points(x, y)
        if len(pi) == 0:
            return pi, ri
        keep = np.zeros(len(pi), dtype=bool)
        for ring_id in np.unique(ri):
            sel = ri == ring_id
            keep[sel] = _ray_cast(self.rings[ring_id], x[pi[sel]], y[pi[sel]])
        return pi[keep], ri[keep]


def _ray_cast(ring: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Even-odd crossing test, vectorized over points for one ring."""
    inside = np.zeros(len(x), dtype=bool)
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    for ex1, ey1, ex2, ey2 in zip(x1, y1, x2, y2):
        if ey1 == ey2:
            continue
        crosses = (ey1 > y) != (ey2 > y)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (ex2 - ex1) * (y - ey1) / (ey2 - ey1) + ex1
        inside ^= crosses & (x < xint)
    return inside


def pip_join(
    points: DataFrame,
    boundaries: DataFrame,
    x: str = "x",
    y: str = "y",
    boundary_id: str = "boundary_id",
    wkb: str = "polygon_wkb",
    how: str = "inner",
) -> DataFrame:
    """Assign each point row the id of the polygon containing it.

    `boundaries` must be small enough to broadcast (the UK-boundary /
    LSOA-tile side). The big `points` side is never shuffled; the tree rides
    a broadcast variable into a `mapInPandas` over Arrow batches.
    `how='left'` keeps unmatched points with NULL boundary_id.
    """
    rows = boundaries.select(boundary_id, wkb).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    rings = [parse_wkb(bytes(r[1]))[1] for r in rows]
    tree = STRtree(rings)
    bc = points.sparkSession.sparkContext.broadcast((tree, ids))

    out_schema = StructType(
        points.schema.fields + [StructField(boundary_id, LongType(), True)]
    )
    left = how == "left"

    def assign(batches):
        tree_l, ids_l = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            px = pdf[x].to_numpy(dtype=np.float64)
            py = pdf[y].to_numpy(dtype=np.float64)
            pi, ri = tree_l.contains(px, py)
            if left:
                assigned = np.full(len(pdf), np.nan)
                # first containing polygon wins on (rare) boundary overlap;
                # deterministic because candidates come back in tree order
                first = pd.Series(ids_l[ri], index=pi)
                first = first[~first.index.duplicated(keep="first")]
                assigned[first.index.to_numpy()] = first.to_numpy()
                res = pdf.copy()
                res[boundary_id] = pd.array(
                    [None if np.isnan(v) else int(v) for v in assigned],
                    dtype="Int64",
                )
                yield res
            else:
                res = pdf.iloc[pi].copy()
                res[boundary_id] = ids_l[ri]
                yield res

    return points.mapInPandas(assign, schema=out_schema)
