"""Interval (range) join — points joined to [lo, hi) intervals without a
nested-loop plan.

Spark plans a raw `lo <= v AND v < hi` condition as a broadcast
nested-loop join (fine for a tiny interval side, quadratic otherwise).
This operator makes it an EQUI-join: intervals explode to the fixed-width
buckets they overlap, points carry their single bucket id, and the join
key is the bucket — then the exact range predicate refines in the same
stage. With B buckets per interval the build side grows ×B (intervals are
the small side by assumption) and the probe side never shuffles when the
exploded build side broadcasts (plan-audited).

The same bucketing argument as the spatial k-ring joins: correctness is
exact (every (point, interval) match shares the point's bucket by
construction), only the pruning is approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 25.0,
) -> DataFrame:
    """Inner join: rows of `points` matched to every interval with
    lo <= value < hi. Intervals may overlap (multi-match is preserved)."""
    b_lo = F.floor(F.col(lo_col) / bucket_width).cast("long")
    # hi is exclusive: the last overlapped bucket is floor((hi - ulp)/W);
    # sequence to floor(hi/W) and refine — one extra bucket at worst,
    # never a missed one
    b_hi = F.floor(F.col(hi_col) / bucket_width).cast("long")
    exploded = intervals.withColumn("_b", F.explode(F.sequence(b_lo, b_hi)))
    keyed = points.withColumn(
        "_b", F.floor(F.col(value_col) / bucket_width).cast("long")
    )
    joined = keyed.join(F.broadcast(exploded), "_b")
    return joined.where(
        (F.col(lo_col) <= F.col(value_col)) & (F.col(value_col) < F.col(hi_col))
    ).drop("_b")
