"""Driver-contract entries: round-3 session-13 additions.

Spatial-inference completions plus classic model/mining operators the
existing 400-entry registry does not yet cover, each oracle-paired and
built on the shared deterministic fixtures (``contract_cells._DC_PX/_PY``
hotspot point field, the TPC-H-ish relations in TESTDATA.md).

- ``gearys_c``: Geary's C contiguity ratio (Geary 1954) over the cell
  grid — the PAIRWISE-difference twin of ``morans_i_autocorrelation``
  (cross-product form). Moran's I is dominated by global deviations;
  Geary's C weights local squared differences, so the two together are
  the standard global-autocorrelation report (C < 1 <=> I > 0 on the
  same surface). Same exact-integer discipline as Moran's.
- ``quadrat_vmr_test``: quadrat-count index of dispersion — the
  textbook FIRST test on any point field (Fisher's variance-to-mean
  ratio; D = (Q-1)*VMR ~ chi-square under CSR). Complements
  ``ripley_k_function`` (distance-based) and ``nn_distance_profile``
  (neighbour-based) with the count-based member of the point-pattern
  triad.

Reference surface being generalized: the reference's verification
pipeline (scripts/verify/verify_import.py spatial-distribution checks,
analysis_queries.sql density sections) eyeballs per-area feature counts;
these entries turn that into the inferential statistics a 10^12-page
geocoded corpus needs before trusting any per-cell rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from osmgraft.contract import q, t
from osmgraft.contract_cells import _DC_PX, _DC_PY

# ---------------------------------------------------------------------------
# Geary's C contiguity ratio over the cell grid
# ---------------------------------------------------------------------------

_GC_W = 8750  # same 80x80 grid as morans_i_autocorrelation

_GEARY_SQL = f"""
    WITH pts AS (SELECT CAST(FLOOR(({_DC_PX}) / {_GC_W}.0e0) AS BIGINT)
                          AS cx,
                        CAST(FLOOR(({_DC_PY}) / {_GC_W}.0e0) AS BIGINT)
                          AS cy
                 FROM events),
    grid AS (SELECT gx.cx, gy.cy
             FROM UNNEST(range(80)) AS gx(cx),
                  UNNEST(range(80)) AS gy(cy)),
    cells AS (SELECT g.cx, g.cy,
                     CAST(COUNT(p.cx) AS BIGINT) AS n
              FROM grid g LEFT JOIN pts p
                ON p.cx = g.cx AND p.cy = g.cy
              GROUP BY g.cx, g.cy),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nc,
                   CAST(SUM(n) AS BIGINT) AS tn
            FROM cells),
    z AS (SELECT c.cx, c.cy, c.n AS n, c.n * t.nc - t.tn AS zv, t.nc
          FROM cells c CROSS JOIN tot t),
    num AS (SELECT SUM((a.n - b.n) * (a.n - b.n)) AS diff_sum,
                   CAST(COUNT(*) AS BIGINT) AS w_sum
            FROM z a JOIN z b
              ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
             AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
             AND NOT (a.cx = b.cx AND a.cy = b.cy)),
    den AS (SELECT SUM(zv * zv) AS z2, MAX(nc) AS nc FROM z)
    SELECT den.nc AS n_cells, num.w_sum,
           ROUND((den.nc - 1) * 1.0e0 * num.diff_sum * den.nc * den.nc
                 / (2.0e0 * num.w_sum * den.z2), 6) AS gearys_c
    FROM num CROSS JOIN den
    """


@q("gearys_c", oracle=_GEARY_SQL)
def gearys_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geary's contiguity ratio C (Geary 1954) of the cell-count surface
    — 8-neighbour queen contiguity over the full 80x80 grid, empty cells
    included, on the hotspot point mixture.  C = (N-1)·Σw(x_i-x_j)² /
    (2W·Σ(x_i-x̄)²): C << 1 means neighbouring cells carry SIMILAR counts
    (clustering — this fixture), C ≈ 1 spatial randomness, C > 1
    dispersion.  The pairwise-difference twin of
    ``morans_i_autocorrelation``: Moran's cross-product form is dominated
    by global deviations from the mean, Geary's squared-difference form
    by LOCAL contrasts, so reporting both is the standard global-
    autocorrelation audit (and C < 1 iff I > 0 certifies the two agree).

    Exactness: neighbour differences (n_i - n_j) are raw integer counts
    (the mean cancels in a difference, so no scaling is even needed);
    the variance term reuses Moran's scaled-integer deviations
    z'_i = n_i·N - T, whose N² factor is restored explicitly in the
    final ratio — every aggregate is an exact integer sum, ONE float
    division at the end.

    Scale shape: identical to ``morans_i_autocorrelation`` — points
    aggregate once onto the bounded grid; the neighbour sum is a
    grid-bounded self-join (cells × 8), never a point join; at
    production resolution it shards on cell blocks.
    """
    px = _DC_PX.replace("//", " div ")
    py = _DC_PY.replace("//", " div ")
    w = _GC_W
    pts = t(spark, sf_dir, "events").select(
        F.expr(f"CAST(FLOOR(({px}) / {w}.0e0) AS BIGINT)").alias("cx"),
        F.expr(f"CAST(FLOOR(({py}) / {w}.0e0) AS BIGINT)").alias("cy"),
    )
    gx = spark.range(80).select(F.col("id").alias("cx"))
    gy = spark.range(80).select(F.col("id").alias("cy"))
    grid = gx.crossJoin(gy)
    pc = pts.groupBy("cx", "cy").agg(F.count("*").cast("long").alias("pn"))
    cells = grid.join(pc, ["cx", "cy"], "left").select(
        "cx", "cy", F.coalesce("pn", F.lit(0)).cast("long").alias("n")
    )
    tot = cells.agg(
        F.count("*").cast("long").alias("nc"),
        F.sum("n").cast("long").alias("tn"),
    )
    z = cells.crossJoin(F.broadcast(tot)).select(
        "cx",
        "cy",
        "n",
        (F.col("n") * F.col("nc") - F.col("tn")).alias("zv"),
        "nc",
    )
    zb = z.select(
        F.col("cx").alias("bx"),
        F.col("cy").alias("by"),
        F.col("n").alias("bn"),
    )
    num = z.join(
        F.broadcast(zb),
        F.col("bx").between(F.col("cx") - 1, F.col("cx") + 1)
        & F.col("by").between(F.col("cy") - 1, F.col("cy") + 1)
        & ~((F.col("cx") == F.col("bx")) & (F.col("cy") == F.col("by"))),
    ).agg(
        F.sum(
            (F.col("n") - F.col("bn")) * (F.col("n") - F.col("bn"))
        ).alias("diff_sum"),
        F.count("*").cast("long").alias("w_sum"),
    )
    den = z.agg(
        F.sum(F.col("zv") * F.col("zv")).alias("z2"),
        F.max("nc").alias("nc"),
    )
    return num.crossJoin(F.broadcast(den)).select(
        F.col("nc").cast("long").alias("n_cells"),
        "w_sum",
        F.round(
            (F.col("nc") - 1)
            * 1.0
            * F.col("diff_sum")
            * F.col("nc")
            * F.col("nc")
            / (2.0 * F.col("w_sum") * F.col("z2")),
            6,
        ).alias("gearys_c"),
    )


# ---------------------------------------------------------------------------
# quadrat-count variance-to-mean dispersion test
# ---------------------------------------------------------------------------

_QV_W = 70000  # 10x10 quadrats covering the 700 000-unit extent

_QUADRAT_SQL = f"""
    WITH pts AS (SELECT CAST(FLOOR(({_DC_PX}) / {_QV_W}.0e0) AS BIGINT)
                          AS qx,
                        CAST(FLOOR(({_DC_PY}) / {_QV_W}.0e0) AS BIGINT)
                          AS qy
                 FROM events),
    grid AS (SELECT gx.qx, gy.qy
             FROM UNNEST(range(10)) AS gx(qx),
                  UNNEST(range(10)) AS gy(qy)),
    quads AS (SELECT g.qx, g.qy,
                     CAST(COUNT(p.qx) AS BIGINT) AS n
              FROM grid g LEFT JOIN pts p
                ON p.qx = g.qx AND p.qy = g.qy
              GROUP BY g.qx, g.qy),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS nq,
                 CAST(SUM(n) AS BIGINT) AS tn,
                 CAST(SUM(n * n) AS BIGINT) AS sn2,
                 CAST(MAX(n) AS BIGINT) AS max_n
          FROM quads)
    SELECT nq AS n_quadrats, tn AS total_points, max_n,
           ROUND((nq * sn2 - tn * tn) * 1.0e0 / ((nq - 1) * tn), 6)
             AS vmr,
           ROUND((nq * sn2 - tn * tn) * 1.0e0 / (nq * 1.0e0 * tn), 6)
             AS dispersion_index,
           CASE WHEN (nq * sn2 - tn * tn) * 2 > 3 * (nq - 1) * tn
                THEN 'clustered'
                WHEN (nq * sn2 - tn * tn) * 10 < 7 * (nq - 1) * tn
                THEN 'uniform'
                ELSE 'random' END AS verdict
    FROM s
    """


@q("quadrat_vmr_test", oracle=_QUADRAT_SQL)
def quadrat_vmr_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quadrat-count dispersion test: partition the plane into a 10x10
    grid of equal quadrats (empties included), count points per quadrat,
    and report Fisher's variance-to-mean ratio VMR = s²/x̄ plus the index
    of dispersion D = (Q-1)·s²/x̄ (chi-square with Q-1 df under complete
    spatial randomness).  VMR ≈ 1 CSR, >> 1 clustered (this fixture's
    hotspot mixture), << 1 uniform/inhibited.  The count-based member of
    the point-pattern triad — ``ripley_k_function`` (distance-based) and
    ``nn_distance_profile`` (neighbour-based) are the other two — and the
    first statistic any spatial-sampling audit computes.

    Exactness: s²·(Q-1)·Q = Q·Σn² - T² is an exact integer identity, so
    VMR = (Q·Σn² - T²)/((Q-1)·T) and D = (Q·Σn² - T²)/(Q·T) each reduce
    to ONE float division over integer aggregates; the categorical
    verdict compares the same integers cross-multiplied (VMR vs 1.5 and
    0.7) with no float anywhere in the branch.

    Scale shape: one narrow projection, one bounded-grid aggregate, one
    4-long-column final reduce — the same single-pass shape at any
    corpus size; quadrat resolution is a constant.
    """
    px = _DC_PX.replace("//", " div ")
    py = _DC_PY.replace("//", " div ")
    w = _QV_W
    pts = t(spark, sf_dir, "events").select(
        F.expr(f"CAST(FLOOR(({px}) / {w}.0e0) AS BIGINT)").alias("qx"),
        F.expr(f"CAST(FLOOR(({py}) / {w}.0e0) AS BIGINT)").alias("qy"),
    )
    gx = spark.range(10).select(F.col("id").alias("qx"))
    gy = spark.range(10).select(F.col("id").alias("qy"))
    grid = gx.crossJoin(gy)
    pc = pts.groupBy("qx", "qy").agg(F.count("*").cast("long").alias("pn"))
    quads = grid.join(pc, ["qx", "qy"], "left").select(
        F.coalesce("pn", F.lit(0)).cast("long").alias("n")
    )
    s = quads.agg(
        F.count("*").cast("long").alias("nq"),
        F.sum("n").cast("long").alias("tn"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("sn2"),
        F.max("n").cast("long").alias("max_n"),
    )
    disp = F.col("nq") * F.col("sn2") - F.col("tn") * F.col("tn")
    return s.select(
        F.col("nq").alias("n_quadrats"),
        F.col("tn").alias("total_points"),
        "max_n",
        F.round(disp * 1.0 / ((F.col("nq") - 1) * F.col("tn")), 6)
        .alias("vmr"),
        F.round(disp * 1.0 / (F.col("nq") * 1.0 * F.col("tn")), 6)
        .alias("dispersion_index"),
        F.when(disp * 2 > 3 * (F.col("nq") - 1) * F.col("tn"),
               F.lit("clustered"))
        .when(disp * 10 < 7 * (F.col("nq") - 1) * F.col("tn"),
              F.lit("uniform"))
        .otherwise(F.lit("random"))
        .alias("verdict"),
    )
