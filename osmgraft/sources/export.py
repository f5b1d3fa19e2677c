"""Result sinks (reference S5–S8).

- CSV exports of report queries (08_export_results.sh `\\copy … TO csv`)
- JSON verification reports (scripts/verify/verify_import.py:370-447)
- Weekly markdown intel report (generate_weekly_report.sh:42-281)

Arrays are serialized like Postgres's array_to_string export
(08_export_results.sh:53) so downstream consumers see the same shape.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType


def export_csv(df: DataFrame, path: str, single_file: bool = True) -> None:
    """Header CSV; array columns flattened with '; ' (S5). `single_file`
    mirrors the reference's one-file exports — leave False at scale."""
    for f in df.schema.fields:
        if isinstance(f.dataType, ArrayType):
            df = df.withColumn(f.name, F.concat_ws("; ", F.col(f.name)))
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def export_json_report(metrics: dict, path: str) -> None:
    """Driver-side JSON report sink (S7)."""
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    payload = {
        "generated_at": datetime.now(timezone.utc).isoformat(),
        **metrics,
    }
    p.write_text(json.dumps(payload, indent=2, default=str))


def weekly_markdown_report(
    candidates: DataFrame, known: DataFrame | None = None, top_n: int = 15
) -> str:
    """Markdown intel report (S8): headline stats, top candidates, regional
    hotspots — single collect of small aggregates, formatted on the driver."""
    from osmgraft.analytics.dashboards import regional_distribution, tier_summary

    lines = ["# Weekly Aerospace Supplier Intelligence Report", ""]
    tiers = tier_summary(candidates).collect()
    total = sum(r["n"] for r in tiers)
    lines += [f"Total candidates: **{total}**", "", "## Tier breakdown", "",
              "| tier | n | min | max | avg |", "|---|---|---|---|---|"]
    for r in tiers:
        lines.append(
            f"| {r['tier_classification']} | {r['n']} | {r['min_score']} "
            f"| {r['max_score']} | {r['avg_score']} |"
        )
    lines += ["", f"## Top {top_n} candidates", "",
              "| rank | name | score | tier | postcode |", "|---|---|---|---|---|"]
    top = (
        candidates.orderBy(F.col("aerospace_score").desc(), "osm_id")
        .limit(top_n)
        .collect()
    )
    for i, r in enumerate(top, 1):
        lines.append(
            f"| {i} | {r['name']} | {r['aerospace_score']} "
            f"| {r['tier_classification']} | {r['postcode'] or ''} |"
        )
    lines += ["", "## Regional hotspots", "", "| region | n | avg | pct |",
              "|---|---|---|---|"]
    for r in regional_distribution(candidates).limit(10).collect():
        lines.append(
            f"| {r['region']} | {r['n']} | {r['avg_score']} | {r['pct_of_total']} |"
        )
    if known is not None:
        from osmgraft.analytics.coverage import coverage_summary

        s = coverage_summary(candidates, known).head()
        lines += ["", "## Known-supplier coverage", "",
                  f"Found {s['found']}/{s['total_known']} "
                  f"({s['coverage_pct']}%) of the ground-truth suppliers."]
    return "\n".join(lines) + "\n"


def export_geojson_tiles(
    tiles: DataFrame,
    path: str,
    n_vertices: int,
    lat_prefix: str = "vlat",
    lng_prefix: str = "vlng",
    properties: list[str] | None = None,
) -> None:
    """GeoJSON FeatureCollection sink for the vector-tile outputs
    (hex_tile_vectors / s2_tile_vectors): each row's corner columns
    (<lat_prefix>{0..n-1}, <lng_prefix>{0..n-1}) become one closed Polygon
    feature with the remaining columns as properties — the GIS-ready end
    of the raster→vector chain (north-star 'raster-to-vector tile
    aggregation'; reference CSV exports, 08_export_results.sh).

    Feature JSON is built executor-side with to_json (JVM), written as one
    JSON line per feature (a scale-safe 'GeoJSONSeq'); the driver only
    wraps the collection envelope for the single-file form."""
    props = properties or [
        c
        for c in tiles.columns
        if not (c.startswith(lat_prefix) or c.startswith(lng_prefix))
    ]
    ring = F.array(
        *[
            F.array(F.col(f"{lng_prefix}{k}"), F.col(f"{lat_prefix}{k}"))
            for k in range(n_vertices)
        ],
        F.array(F.col(f"{lng_prefix}0"), F.col(f"{lat_prefix}0")),  # close
    )
    feature = F.to_json(
        F.struct(
            F.lit("Feature").alias("type"),
            F.struct(
                F.lit("Polygon").alias("type"),
                F.array(ring).alias("coordinates"),
            ).alias("geometry"),
            F.struct(*[F.col(c).alias(c) for c in props]).alias("properties"),
        )
    )
    lines = [r[0] for r in tiles.select(feature).collect()]
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(
        '{"type": "FeatureCollection", "features": [\n'
        + ",\n".join(lines)
        + "\n]}\n"
    )
