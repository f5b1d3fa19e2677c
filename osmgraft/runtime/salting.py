"""Explicit skew handling: salted aggregation + salted joins.

North-rule requirement (SURVEY.md §7.3 item 8): London-grade hotspots
concentrate ≥30 % of pages in a handful of cells. AQE's skew-join splitting
covers sort-merge joins at runtime; these helpers cover the two cases AQE
does not:

- `salted_aggregate`: high-fanout aggregations (collect_list/set, large
  count-distinct) where one reduce key would receive a straggler partition.
  Two-phase: groupBy(key, salt) partial → groupBy(key) final.
- `salted_join`: shuffled equi-join with a skewed left side — left side gets
  a deterministic-range salt, right side is exploded over all salt values so
  every (key, salt) pair still matches.

Plain count/sum aggregations don't need salting (Spark's partial aggregation
already combines map-side); these are for the shapes where the combine
itself is the bottleneck.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation over (keys + salt) then (keys).

    partial_aggs aggregate raw rows into intermediate columns; final_aggs
    merge the intermediates. Example (collect_set):
        partial = [F.collect_set("v").alias("vs")]
        final   = [F.array_distinct(F.flatten(F.collect_list("vs"))).alias("vs")]
    """
    # salt from ROW CONTENT, never monotonically_increasing_id: a salt that
    # feeds a shuffle key must be deterministic under task retry, or a
    # recomputed map task re-salts rows differently than partitions already
    # fetched (duplicated/lost rows — the classic nondeterministic
    # repartition bug). Identical rows co-bucket, which only matters for
    # pathological identical-row hotspots. (round-2 fix)
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))
    )
    part = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return part.groupBy(*keys).agg(*final_aggs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe shuffled equi-join: left salted, right replicated ×buckets.

    Use when the right side is too big to broadcast AND the left key
    distribution has heavy hitters. Replication factor is `buckets`, so keep
    it small (4–16) and only as large as the worst key's skew requires.

    Only inner/left/semi/anti joins are valid: the right side is
    replicated ×buckets, so right/full-outer would emit every
    non-matching replica as a spurious null-extended row (round-2 fix:
    the `how` parameter is now validated; salt is content-derived for
    retry determinism).
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is unsafe with a replicated right "
            f"side (allowed: {sorted(allowed)})"
        )
    lsalt = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(buckets))
    )
    rrep = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    out = lsalt.join(rrep, [key, "_salt"], how)
    return out.drop("_salt")


def aqe_skew_configs(
    threshold_bytes: str = "256m",
    advisory_bytes: str = "64m",
    factor: int = 5,
) -> dict[str, str]:
    """Recommended AQE skew-join settings for hotspot-cell workloads
    (London-grade dense cells — BASELINE.json north_star). AQE splits a
    skewed shuffle partition into advisory-sized reads at runtime
    (SortMergeJoin(skew=true) + "AQEShuffleRead coalesced and skewed" in
    the final plan — asserted in tests/test_plans.py); salted_aggregate /
    salted_join above remain the explicit fallback where AQE can't reach
    (aggregations, broadcast-ineligible non-equi joins)."""
    return {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": threshold_bytes,
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": str(factor),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": advisory_bytes,
    }
