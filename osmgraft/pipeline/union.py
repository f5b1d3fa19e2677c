"""Priority dedup-union cascade (reference J1/U3).

The reference inserts polygon candidates first, then each lower-priority
source with `WHERE osm_id NOT IN (SELECT osm_id FROM <all higher>)`
(07_run_all_pipelines.sh:167-234, create_final_table.sql:72-116).

Semantics preserved exactly (SURVEY.md §7.3 items 2–3):
- dedup is **id-level**: one osm_id in polygon staging drops *all* point rows
  with that id;
- `NOT IN` ≡ left_anti here because osm_id is never NULL — we assert that, and
  use `left_anti` so Catalyst plans a broadcast/shuffled hash anti-join rather
  than the null-aware BroadcastNestedLoopJoin NOT IN would force.

Scale note: the id-set build side is the (small) candidate output, so each
anti-join broadcasts; the union is a metadata-only `unionByName`.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def priority_dedup_union(staged: dict[str, DataFrame], order: list[str]) -> DataFrame:
    """staged: geom_kind → candidate DataFrame; order: highest priority first."""
    out: list[DataFrame] = []
    prior_ids: DataFrame | None = None
    for kind in order:
        df = staged[kind]
        if prior_ids is None:
            out.append(df)
            prior_ids = df.select("osm_id").distinct()
        else:
            out.append(df.join(F.broadcast(prior_ids), "osm_id", "left_anti"))
            prior_ids = prior_ids.union(df.select("osm_id")).distinct()
    return reduce(lambda a, b: a.unionByName(b), out)


def assert_final_invariants(final: DataFrame) -> dict[str, int]:
    """CHECK-constraint equivalents (07_run_all_pipelines.sh:245-248 and
    test_aerospace_pipeline.sh:174-195). Returns violation counts; raises on
    any violation."""
    checks = {
        "null_name": final.where(F.col("name").isNull()).count(),
        "score_below_40": final.where(F.col("aerospace_score") < 40).count(),
        "bad_tier": final.where(
            ~F.col("tier_classification").isin(
                "tier1_candidate", "tier2_candidate",
                "potential_candidate", "low_probability")
        ).count(),
        "null_coords": final.where(
            F.col("latitude").isNull() | F.col("longitude").isNull()
        ).count(),
        "dup_osm_id": final.groupBy("osm_id").count().where("count > 1").count(),
    }
    bad = {k: v for k, v in checks.items() if v > 0}
    if bad:
        raise AssertionError(f"final-table invariant violations: {bad}")
    return checks
