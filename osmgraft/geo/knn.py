"""Cell-partitioned kNN / radius joins (reference J4, SCORING_STRATEGY.md:212-220).

The reference's designed proximity bonus is `EXISTS(... ST_DWithin(poly, airport,
10km))`. At Spark scale the equivalent is a **cell equi-join**: the small side
(airports/POIs) is exploded to the k-ring of cells covering the radius, the big
side carries its single cell id, and the join is a plain (broadcastable)
equi-join followed by an exact distance refine — no cross join, no geometry
shuffle, skew bounded by cell size.

Guarantee: with k = ceil(radius / cell_size), every pair within `radius` shares
a (cell, kring-cell) key, so the refine sees all true pairs. Results are exact
for radius queries and for kNN-within-radius (the reference's semantics).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osmgraft.geo.cells import GridSpec, kring_cells_col, with_cell


def dwithin_semi_join(
    big: DataFrame,
    small: DataFrame,
    spec: GridSpec,
    res: int,
    radius: float,
    big_x: str = "x",
    big_y: str = "y",
    small_x: str = "x",
    small_y: str = "y",
) -> DataFrame:
    """Rows of `big` having at least one `small` row within `radius`
    (ST_DWithin EXISTS semantics). True left-semi with the distance
    predicate IN the join condition — round-2 fix: the previous
    inner-join + distinct() silently collapsed legitimately duplicate
    `big` rows (and paid a full-width global distinct shuffle)."""
    expanded = _expand_small(small, spec, res, radius, small_x, small_y)
    keyed = with_cell(big, big_x, big_y, spec, res, out="_cell", keep_ixy=False)
    cond = (keyed["_cell"] == expanded["_kcell"]) & (
        (keyed[big_x] - expanded["_sx"]) ** 2
        + (keyed[big_y] - expanded["_sy"]) ** 2
        <= radius * radius
    )
    return keyed.join(F.broadcast(expanded), cond, "left_semi").drop("_cell")


def knn_join(
    points: DataFrame,
    pois: DataFrame,
    spec: GridSpec,
    res: int,
    k: int,
    radius: float,
    point_key: str,
    poi_key: str,
    point_x: str = "x",
    point_y: str = "y",
    poi_x: str = "x",
    poi_y: str = "y",
) -> DataFrame:
    """k nearest `pois` within `radius` of each point.

    Output: point columns + (poi_key, dist, knn_rank). Ties broken by poi key
    so results are deterministic and oracle-comparable.
    """
    expanded = _expand_small(pois.withColumnRenamed(poi_key, "_poi_key"),
                             spec, res, radius, poi_x, poi_y)
    keyed = with_cell(points, point_x, point_y, spec, res, out="_cell",
                      keep_ixy=False)
    dist = F.sqrt(
        (keyed[point_x] - expanded["_sx"]) ** 2
        + (keyed[point_y] - expanded["_sy"]) ** 2
    )
    joined = (
        keyed.join(F.broadcast(expanded), keyed["_cell"] == expanded["_kcell"])
        .withColumn("dist", dist)
        .where(F.col("dist") <= radius)
    )
    w = Window.partitionBy(point_key).orderBy(F.col("dist").asc(), F.col("_poi_key").asc())
    return (
        joined.withColumn("knn_rank", F.row_number().over(w))
        .where(F.col("knn_rank") <= k)
        .select(
            *[keyed[c] for c in points.columns],
            F.col("_poi_key").alias(poi_key),
            F.col("dist"),
            F.col("knn_rank"),
        )
    )


def _expand_small(
    small: DataFrame, spec: GridSpec, res: int, radius: float, sx: str, sy: str
) -> DataFrame:
    """Explode the small side to its radius-covering k-ring of cells."""
    k = max(
        int(math.ceil(radius / spec.cell_width(res))),
        int(math.ceil(radius / spec.cell_height(res))),
    )
    cells = with_cell(small, sx, sy, spec, res, out="_scell")
    return (
        cells.withColumn(
            "_kcell",
            F.explode(
                kring_cells_col(F.col("_scell_ix"), F.col("_scell_iy"), res, k)
            ),
        )
        .withColumn("_sx", F.col(sx))
        .withColumn("_sy", F.col(sy))
        .drop("_scell", "_scell_ix", "_scell_iy")
    )
