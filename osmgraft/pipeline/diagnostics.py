"""Pipeline diagnostics — the reference's diagnose_pipeline.sql re-hosted.

The reference ships a 12-check "why am I getting 0 candidates" script
(diagnose_pipeline.sql:1-288): source counts, keyword presence, stage
cardinality at each view, a simplified manual score crosscheck against the
real scorer, threshold-fallout, tag-map health, regex sanity. Here each
check is one lazy DataFrame; `run_diagnostics` evaluates them in a single
pass where possible and returns a plain dict so callers (or the CLI job)
can json.dump it — the Spark analogue of the reference's psql run.

Checks are numbered to match the reference's DIAGNOSTIC sections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmgraft.rules import reference_rules as R
from osmgraft.rules.compiler import compile_exclusion_filter, compile_score

def _manual_score():
    """diagnose_pipeline.sql:119-142 — deliberately simplified, independent
    of the rules compiler, so a compiler bug can't hide in its own
    crosscheck. (Function, not module constant: Columns need an active
    session.)"""
    return (
        F.when(F.lower(F.coalesce(F.col("name"), F.lit(""))).rlike(
            "(aerospace|aviation|aircraft)"), 100).otherwise(0)
        + F.when(F.lower(F.coalesce(F.col("name"), F.lit(""))).rlike(
            "(engineering|precision|technology)"), 70).otherwise(0)
        + F.when(F.col("landuse") == "industrial", 40).otherwise(0)
        + F.when(F.col("building").isin("industrial", "warehouse", "factory"), 40).otherwise(0)
        + F.when(F.col("industrial").isNotNull(), 40).otherwise(0)
    )

_REGEX_PROBES = ["aerospace", "engineering", "precision"]


def run_diagnostics(features: DataFrame, threshold: int = R.SCORE_THRESHOLD) -> dict:
    """12-section diagnostic over a wide-schema features table."""
    out: dict = {}

    name_lc = F.lower(F.coalesce(F.col("name"), F.lit("")))

    # D1: source counts per geometry kind (diagnose_pipeline.sql:10-22)
    out["source_counts"] = {
        r["geom_kind"]: r["n"]
        for r in features.groupBy("geom_kind").agg(F.count("*").alias("n")).collect()
    }

    # D3 + D12: keyword/regex presence probes (:48-82, :247-276)
    probes = features.agg(
        *[
            F.sum(F.when(name_lc.rlike(p), 1).otherwise(0)).alias(f"rlike_{p}")
            for p in _REGEX_PROBES
        ],
        F.sum(F.when(name_lc.like("%engineering%"), 1).otherwise(0)).alias(
            "like_engineering"
        ),
    ).head()
    out["keyword_probes"] = probes.asDict()
    # POSIX `~` vs Java rlike must agree with LIKE on a plain substring.
    # Explicit raise (not assert): the check must survive `python -O`.
    if (
        out["keyword_probes"]["rlike_engineering"]
        != out["keyword_probes"]["like_engineering"]
    ):
        raise RuntimeError("regex dialect drift: rlike != LIKE on literal substring")
    out["regex_dialect_ok"] = True

    # D4: filtered-stage cardinality per kind (:84-104)
    filtered = {}
    for kind in ("point", "polygon", "line"):
        excl, override = {
            "point": (R.POINT_EXCLUSIONS, R.POINT_OVERRIDE),
            "polygon": (R.POLYGON_EXCLUSIONS, R.POLYGON_OVERRIDE),
            "line": (R.LINE_EXCLUSIONS, R.LINE_OVERRIDE),
        }[kind]
        filtered[kind] = (
            features.where(F.col("geom_kind") == kind)
            .where(compile_exclusion_filter(excl, override))
            .count()
        )
    out["filtered_counts"] = filtered

    # D6: manual simplified score vs the compiled scorer (:119-142;
    # quick_test_polygon.sql crosscheck). The reference's simplified
    # formula probes '(aerospace|aviation|aircraft)' but its real scorer's
    # name branch is '(aerospace|avionics|aero)' — 'aircraft'/'aviation'
    # rows can legitimately score 0 (observed in the reference semantics).
    # The hard invariant covers the shared terms only: any name matching
    # '(aerospace|aero)' MUST get a positive compiled score.
    poly = features.where(F.col("geom_kind") == "polygon")
    scored = poly.withColumn("real", compile_score(R.SCORERS["polygon"])).withColumn(
        "manual", _manual_score()
    )
    out["manual_vs_compiled_disagreements"] = scored.where(
        name_lc.rlike("(aerospace|aero)") & (F.col("real") <= 0)
    ).count()
    out["manual_only_hits"] = scored.where(
        (F.col("manual") >= 100) & (F.col("real") <= 0)
    ).count()  # exploratory, reference-faithful (may be > 0)

    # D9: threshold fallout — scores in (0, threshold) per kind (:183-190)
    fallout = {}
    for kind in R.SCORERS:
        sc = features.where(F.col("geom_kind") == kind).withColumn(
            "s", compile_score(R.SCORERS[kind])
        )
        fallout[kind] = sc.where((F.col("s") > 0) & (F.col("s") < threshold)).count()
    out["threshold_fallout"] = fallout

    # D11: tag map health (:225-242)
    out["tags_nonempty"] = features.where(F.size(F.col("tags")) > 0).count()

    # D13: geometry validity audit (verify_import.py:223-231 ST_IsValid
    # counts; round-3 gap-close) — every WKB blob classified by the
    # vectorized validity kernel (parse / finite / closure / point count /
    # area); reasons beyond 'valid' demand import investigation
    from osmgraft.geo.geometry import wkb_validity_col

    out["geometry_validity"] = {
        r["reason"]: r["n"]
        for r in features.select(wkb_validity_col("way_wkb").alias("reason"))
        .groupBy("reason")
        .agg(F.count("*").alias("n"))
        .collect()
    }

    return out
