"""Driver-contract entries: trajectory (per-user track) analytics.

The geospatial tier's polyline surface: each user's ordered event points
form a GPS-grade track (the planar coordinates are the shared
deterministic fixture expressions X_EXPR/Y_EXPR — both engines recompute
identical doubles from event_id). Douglas-Peucker simplification is the
generalization step between raster->vector tile extraction and vector
serving; the reference ships database geometries unsimplified
(07_pipeline_polygon.sh exports raw WKB), which does not survive
10^12-point polylines.

Oracle discipline: the DuckDB oracle runs REAL Douglas-Peucker as a
recursive CTE — the per-segment argmax split is an `arg_max` aggregate
over the recursive frontier (lexicographic [c², -seq] == numpy first-max
tiebreak), and the split test compares squared cross products against
eps² * chord² (multiplication only — no sqrt/division ulp). The Spark
side runs the identical arithmetic in a vectorized numpy kernel via
applyInPandas (geo/simplify.py), one shuffle on user_id, Arrow-batched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from osmgraft.contract import X_EXPR, Y_EXPR, q, t
from osmgraft.geo.simplify import simplify_group

_DP_EPS = 150000.0  # planar units; the fixture extent is 700 000 square


def _dp_oracle() -> str:
    cross = "((b.x - a.x) * (a.y - p.y) - (a.x - p.x) * (b.y - a.y))"
    c2 = f"({cross} * {cross})"
    chord2 = ("((b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y))")
    return f"""
    WITH RECURSIVE
      pts0 AS (SELECT user_id, event_id, {X_EXPR} AS x, {Y_EXPR} AS y
               FROM events),
      pts AS (SELECT user_id,
                     CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                             ORDER BY event_id) - 1
                          AS BIGINT) AS seq,
                     x, y
              FROM pts0),
      segs(user_id, lo, hi) AS (
        SELECT user_id, MIN(seq), MAX(seq) FROM pts GROUP BY user_id
        UNION ALL
        SELECT s.user_id, u.lo2, u.hi2
        FROM segs s
        JOIN pts a ON a.user_id = s.user_id AND a.seq = s.lo
        JOIN pts b ON b.user_id = s.user_id AND b.seq = s.hi
        JOIN LATERAL (
          SELECT p.seq AS k, {c2} AS c2v
          FROM pts p
          WHERE p.user_id = s.user_id AND p.seq > s.lo AND p.seq < s.hi
          ORDER BY {c2} DESC, p.seq ASC LIMIT 1
        ) m ON m.c2v > {_DP_EPS}e0 * {_DP_EPS}e0 * {chord2},
        LATERAL (VALUES (s.lo, m.k), (m.k, s.hi)) u(lo2, hi2)
      ),
      kept AS (SELECT DISTINCT user_id, seq FROM (
                 SELECT user_id, lo AS seq FROM segs
                 UNION ALL SELECT user_id, hi FROM segs))
    SELECT k.user_id, k.seq,
           FLOOR(p.x * 10000 + 0.5) / 10000 AS x,
           FLOOR(p.y * 10000 + 0.5) / 10000 AS y
    FROM kept k JOIN pts p ON p.user_id = k.user_id AND p.seq = k.seq
    ORDER BY k.user_id, k.seq
    """


@q("track_simplify", oracle=_dp_oracle())
def track_simplify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Douglas-Peucker simplification of every user's event track
    (eps = 150 000 planar units on the 700 000-unit fixture extent).

    Scale shape: ONE shuffle (hash on user_id) delivers each track to a
    task; the per-group kernel is vectorized numpy over Arrow batches
    (O(n log n) typical, no Python-per-row); track length is bounded per
    user, so no group outgrows an executor. The recursive-CTE oracle
    proves the distributed kernel byte-equal to textbook DP — including
    the first-max tiebreak and the degenerate-chord (c ≡ 0) convention.
    """
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr(X_EXPR).alias("x"),
        F.expr(Y_EXPR).alias("y"),
    )
    seq = (
        F.row_number().over(Window.partitionBy("user_id").orderBy("event_id"))
        - 1
    ).cast("long")
    pts = ev.select("user_id", seq.alias("seq"), "x", "y")
    kept = pts.groupBy("user_id").applyInPandas(
        lambda pdf: simplify_group(pdf, _DP_EPS),
        schema="user_id bigint, seq bigint, x double, y double",
    )
    snap = lambda c: F.floor(F.col(c) * 10000 + 0.5) / 10000  # noqa: E731
    return kept.select(
        "user_id", "seq", snap("x").alias("x"), snap("y").alias("y")
    ).orderBy("user_id", "seq")


_TRACK_STATS_SQL = f"""
    WITH pts0 AS (SELECT user_id, event_id, {X_EXPR} AS x, {Y_EXPR} AS y
                  FROM events),
         hops AS (SELECT user_id, x, y,
                         LAG(x) OVER w AS px, LAG(y) OVER w AS py
                  FROM pts0 WINDOW w AS (PARTITION BY user_id
                                         ORDER BY event_id)),
         ends AS (SELECT user_id,
                         FIRST(x ORDER BY event_id) AS x0,
                         FIRST(y ORDER BY event_id) AS y0,
                         LAST(x ORDER BY event_id) AS x1,
                         LAST(y ORDER BY event_id) AS y1
                  FROM pts0 GROUP BY user_id),
         agg AS (SELECT user_id,
                        CAST(COUNT(*) AS BIGINT) AS n_points,
                        SUM(CASE WHEN px IS NULL THEN 0.0e0
                                 ELSE sqrt((x - px) * (x - px)
                                           + (y - py) * (y - py)) END)
                          AS path_len
                 FROM hops GROUP BY user_id)
    SELECT a.user_id, a.n_points,
           FLOOR(a.path_len * 100 + 0.5) / 100 AS path_len,
           FLOOR(sqrt((e.x1 - e.x0) * (e.x1 - e.x0)
                      + (e.y1 - e.y0) * (e.y1 - e.y0)) * 100 + 0.5) / 100
             AS net_disp,
           CASE WHEN sqrt((e.x1 - e.x0) * (e.x1 - e.x0)
                          + (e.y1 - e.y0) * (e.y1 - e.y0)) = 0.0e0 THEN NULL
                ELSE FLOOR(a.path_len
                           / sqrt((e.x1 - e.x0) * (e.x1 - e.x0)
                                  + (e.y1 - e.y0) * (e.y1 - e.y0))
                           * 10000 + 0.5) / 10000 END AS sinuosity
    FROM agg a JOIN ends e USING (user_id)
    ORDER BY a.user_id
    """


@q("track_stats", oracle=_TRACK_STATS_SQL)
def track_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trajectory characterization: point count, total path
    length (sum of hop lengths), net displacement, and sinuosity
    (path/displacement — the tortuosity measure trajectory-mining uses to
    separate commutes from wandering).

    Scale shape: the LAG window partitions by user_id (partition-local
    sort inside each user's frame — never global); one partial-agg
    shuffle rolls up hops, a second tiny join attaches the endpoint pair.
    Floating parity: hop lengths sum in the SAME order on both engines
    only if addition order is fixed — it is not, so path_len is snapped
    at 1e-2 where the fixture's ~1e6-magnitude sums agree bit-stably
    (double addition reordering error ~1e-9 relative).
    """
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr(X_EXPR).alias("x"),
        F.expr(Y_EXPR).alias("y"),
    )
    w = Window.partitionBy("user_id").orderBy("event_id")
    hops = ev.select(
        "user_id",
        "x",
        "y",
        F.lag("x").over(w).alias("px"),
        F.lag("y").over(w).alias("py"),
    )
    hop_len = F.when(F.col("px").isNull(), F.lit(0.0)).otherwise(
        F.sqrt(
            (F.col("x") - F.col("px")) * (F.col("x") - F.col("px"))
            + (F.col("y") - F.col("py")) * (F.col("y") - F.col("py"))
        )
    )
    agg = hops.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_points"),
        F.sum(hop_len).alias("path_len"),
    )
    ends = ev.groupBy("user_id").agg(
        F.min_by("x", "event_id").alias("x0"),
        F.min_by("y", "event_id").alias("y0"),
        F.max_by("x", "event_id").alias("x1"),
        F.max_by("y", "event_id").alias("y1"),
    )
    disp = F.sqrt(
        (F.col("x1") - F.col("x0")) * (F.col("x1") - F.col("x0"))
        + (F.col("y1") - F.col("y0")) * (F.col("y1") - F.col("y0"))
    )
    return (
        agg.join(ends, "user_id")
        .select(
            "user_id",
            "n_points",
            (F.floor(F.col("path_len") * 100 + 0.5) / 100).alias("path_len"),
            (F.floor(disp * 100 + 0.5) / 100).alias("net_disp"),
            F.when(disp == 0.0, F.lit(None).cast("double"))
            .otherwise(F.floor(F.col("path_len") / disp * 10000 + 0.5) / 10000)
            .alias("sinuosity"),
        )
        .orderBy("user_id")
    )
