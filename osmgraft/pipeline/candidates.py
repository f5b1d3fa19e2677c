"""Per-geometry candidate stage: filter → score → classify → project.

Spark-first re-expression of the reference's four-stage views+staging flow
(07_pipeline_{point,polygon,line,roads}.sh): the two stacked views and the
INSERT…SELECT collapse into one lazy DataFrame plan that Catalyst fuses into
a single scan→filter→project pipeline (view inlining ≡ plan composition,
SURVEY.md §3.1). The score threshold is applied before projection so column
pruning reaches the Parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmgraft.geo.geometry import planar_area_col, planar_centroid_cols
from osmgraft.rules.compiler import (
    compile_confidence,
    compile_exclusion_filter,
    compile_keyword_array,
    compile_score,
    compile_tier,
    tags_text,
)
from osmgraft.rules import reference_rules as R

CANDIDATE_COLUMNS = [
    # FIXTURES.md §6 golden schema (id/created_at excluded: nondeterministic
    # in the reference, SURVEY.md §7.3 item 9)
    "osm_id", "source_table", "name", "operator", "aerospace_score",
    "tier_classification", "confidence_level", "phone", "email", "website",
    "postcode", "street_address", "city", "landuse_type", "building_type",
    "industrial_type", "office_type", "description", "matched_keywords",
    "latitude", "longitude",
]

_EXCLUSIONS = {
    "point": (R.POINT_EXCLUSIONS, R.POINT_OVERRIDE),
    "polygon": (R.POLYGON_EXCLUSIONS, R.POLYGON_OVERRIDE),
    "line": (R.LINE_EXCLUSIONS, R.LINE_OVERRIDE),
}

_SOURCE_TABLE = {
    "point": "planet_osm_point",
    "polygon": "planet_osm_polygon",
    "line": "planet_osm_line",
    "roads": "planet_osm_roads",
}


def candidate_stage(
    features: DataFrame,
    kind: str,
    threshold: int = R.SCORE_THRESHOLD,
) -> DataFrame:
    """features (one geom_kind's rows, or a mixed table) → scored candidates."""
    f = features.where(F.col("geom_kind") == kind)

    # F1–F4: exclusion / inclusion filter
    if kind == "roads":
        keep = compile_exclusion_filter([], R.ROADS_INCLUDE)
    else:
        excl, override = _EXCLUSIONS[kind]
        keep = compile_exclusion_filter(excl, override)
    f = f.where(keep)

    # F5: must-have-identity (+ polygon area gate, 07_pipeline_polygon.sh:143)
    f = f.where(F.expr(R.IDENTITY_PREDICATE[kind]))
    if kind == "polygon":
        f = f.where(planar_area_col("way_wkb") > 50.0)

    # C1–C4 scorer, then threshold BEFORE the wide projection (pushdown)
    f = f.withColumn("aerospace_score", compile_score(R.SCORERS[kind]))
    f = f.where(F.col("aerospace_score") >= threshold)

    # C8 matched keywords: blob = name [ || operator ] || tags_text
    blob_parts = [F.coalesce(F.col("name"), F.lit("")), F.lit(" ")]
    if R.KEYWORD_BLOB_INCLUDES_OPERATOR[kind]:
        blob_parts += [F.coalesce(F.col("operator"), F.lit("")), F.lit(" ")]
    blob = F.lower(F.concat(*blob_parts, tags_text("tags")))

    # lat/lon: ST_X/Y for points, centroid for way geometries
    if kind == "point":
        lat, lon = F.col("y"), F.col("x")
    else:
        cx, cy = planar_centroid_cols("way_wkb")
        lat, lon = cy, cx

    # F6 wide projection with renames + defaults (07_pipeline_point.sh:170-208)
    return f.select(
        F.col("osm_id"),
        F.lit(_SOURCE_TABLE[kind]).alias("source_table"),
        F.coalesce(F.col("name"), F.col("operator"), F.col("tags")["brand"]).alias("name"),
        F.col("operator"),
        F.col("aerospace_score"),
        compile_tier().alias("tier_classification"),
        compile_confidence().alias("confidence_level"),
        F.col("tags")["phone"].alias("phone"),
        F.col("tags")["email"].alias("email"),
        F.col("website"),
        F.col("addr_postcode").alias("postcode"),
        F.col("addr_street").alias("street_address"),
        F.coalesce(F.col("addr_city"), F.col("tags")["addr:town"]).alias("city"),
        F.col("landuse").alias("landuse_type"),
        (F.lit(None).cast("string") if kind == "point" else F.col("building")).alias("building_type"),
        (F.coalesce(F.col("industrial"), F.col("tags")["craft"])
         if kind == "polygon"
         else (F.col("tags")["craft"] if kind == "point" else F.col("industrial"))
         ).alias("industrial_type"),
        (F.lit(None).cast("string") if kind == "roads" else F.col("office")).alias("office_type"),
        F.coalesce(F.col("tags")["description"], F.col("tags")["note"]).alias("description"),
        compile_keyword_array(blob, R.MATCHED_KEYWORDS[kind]).alias("matched_keywords"),
        lat.cast("double").alias("latitude"),
        lon.cast("double").alias("longitude"),
    )
