"""Known-supplier coverage / recall analytics (known_suppliers_check.sql).

The ground-truth side is 18 rows ⇒ always broadcast; the containment-LIKE
condition makes this a BroadcastNestedLoopJoin by construction (reference J2),
which is the correct plan for a tiny build side — the big side streams once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _match_cond(candidates: DataFrame, known: DataFrame):
    """LOWER(c.name) LIKE '%' || LOWER(SPLIT_PART(k.company_name,' ',1)) || '%'
    (known_suppliers_check.sql:54-55)."""
    first_word = F.lower(F.split(known["company_name"], " ").getItem(0))
    return F.lower(candidates["name"]).contains(first_word)


def coverage_report(candidates: DataFrame, known: DataFrame) -> DataFrame:
    """Per-supplier FOUND/MISSING status + best score/tier
    (known_suppliers_check.sql:42-56)."""
    # Broadcast the 18-row `known` side and stream `candidates` (unbounded at
    # scale). Spark 4 plans this as BNLJ BuildLeft + LeftOuter, streaming the
    # big probe side once — same shape as contract.fuzzy_coverage_join.
    j = F.broadcast(known).join(candidates, _match_cond(candidates, known), "left")
    return (
        j.groupBy("company_name", "location", "postcode_prefix", "expected_score")
        .agg(
            F.max("aerospace_score").alias("aerospace_score"),
            # deterministic tiebreak: max_by on score alone is partition-
            # order dependent when two candidates tie on score with
            # different tiers (round-2 fix) — order by (score, tier)
            F.max(
                F.struct(F.col("aerospace_score"), F.col("tier_classification"))
            )["tier_classification"].alias("tier_classification"),
        )
        .withColumn(
            "status",
            F.when(F.col("aerospace_score").isNotNull(), "FOUND").otherwise("MISSING"),
        )
        .orderBy(F.col("expected_score").desc(), "company_name")
    )


def coverage_summary(candidates: DataFrame, known: DataFrame) -> DataFrame:
    """Total / found / coverage %  (known_suppliers_check.sql:62-84)."""
    rep = coverage_report(candidates, known)
    return rep.agg(
        F.count("*").alias("total_known"),
        F.count(F.when(F.col("status") == "FOUND", 1)).alias("found"),
        F.round(
            100.0 * F.count(F.when(F.col("status") == "FOUND", 1)) / F.count("*"), 1
        ).alias("coverage_pct"),
    )


def expected_vs_actual(candidates: DataFrame, known: DataFrame) -> DataFrame:
    """Good / Close / Too-Low / Not-Found verdicts
    (known_suppliers_check.sql:117-131)."""
    rep = coverage_report(candidates, known)
    actual = F.coalesce(F.col("aerospace_score"), F.lit(0))
    return rep.select(
        "company_name",
        "expected_score",
        actual.alias("actual_score"),
        F.when(F.col("aerospace_score").isNull(), "✗ Not Found")
        .when(actual >= F.col("expected_score"), "✓ Good")
        .when(actual >= F.col("expected_score") * 0.7, "~ Close")
        .otherwise("✗ Too Low")
        .alias("score_status"),
    ).orderBy(F.col("expected_score").desc(), "company_name")


def near_matches(
    candidates: DataFrame, known: DataFrame, min_score: int = 100, limit: int = 30
) -> DataFrame:
    """Cross-join near-match scan: same postcode area OR partial name match
    (known_suppliers_check.sql:93-109)."""
    first_word = F.lower(F.split(known["company_name"], " ").getItem(0))
    cond = (
        known["postcode_prefix"].isNotNull()
        & (F.substring(candidates["postcode"], 1, 2) == known["postcode_prefix"])
    ) | F.lower(candidates["name"]).contains(first_word)
    return (
        candidates.crossJoin(F.broadcast(known))
        .where(cond & (candidates["aerospace_score"] >= min_score))
        .select(
            candidates["name"],
            candidates["aerospace_score"],
            candidates["postcode"],
            candidates["city"],
            known["company_name"].alias("near_to"),
        )
        .distinct()
        .orderBy(F.col("aerospace_score").desc(), "name", "near_to")
        .limit(limit)
    )
