"""Bridge: page-extracted features → the wide OSM-style candidate schema.

The candidate stages (osmgraft.pipeline.candidates) consume the reference's
wide tag schema (~75 declared columns, config/uk_full_retention.style:5-133)
plus `osm_id` and a WKB geometry. Pages extracted from Common-Crawl-style
text (osmgraft.extract.page_extract) carry a narrow schema with the
remaining tags in the `tags` map — exactly the reference's hstore catch-all
(05_import_data.sh:123). This module widens lazily:

- each wide tag column = `element_at(tags, key)` (JVM-side map lookup; the
  Catalyst plan prunes unused ones at the scan);
- `osm_id` = xxhash64(url) — the deterministic surrogate id (SURVEY.md §7.3
  item 9: the reference's SERIAL id is nondeterministic and excluded from
  goldens);
- `way_wkb`: geocoded pages have a point location, no footprint. Points get
  point WKB; pages classified polygon/line get a nominal 20 m square ring /
  segment at the geocode (keeps the per-kind pipelines live — the polygon
  area gate `ST_Area > 50` at 07_pipeline_polygon.sh:143 passes a nominal
  400 m² footprint). Built in one vectorized Arrow UDF (numpy byte
  assembly, no per-row Python parsing).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from osmgraft.geo.geometry import linestring_wkb, point_wkb, polygon_wkb

# wide columns sourced from the tags map when absent from the extract schema
WIDE_TAG_COLS = [
    "amenity", "shop", "tourism", "leisure", "highway", "railway",
    "waterway", "barrier", "building", "industrial", "office", "man_made",
    "military", "aeroway", "craft", "brand", "website", "addr_street",
    "addr_city",
]

_NOMINAL_HALF_M = 10.0  # nominal footprint half-side for non-point pages


@pandas_udf("binary")
def _page_wkb(x: pd.Series, y: pd.Series, kind: pd.Series) -> pd.Series:
    xs = x.to_numpy(dtype=float)
    ys = y.to_numpy(dtype=float)
    ks = kind.to_numpy(dtype=object)
    h = _NOMINAL_HALF_M
    out = []
    for xi, yi, ki in zip(xs, ys, ks):
        if not np.isfinite(xi) or not np.isfinite(yi):
            out.append(None)
        elif ki == "polygon":
            ring = np.array(
                [[xi - h, yi - h], [xi + h, yi - h], [xi + h, yi + h],
                 [xi - h, yi + h], [xi - h, yi - h]]
            )
            out.append(polygon_wkb(ring))
        elif ki in ("line", "roads"):
            out.append(linestring_wkb(np.array([[xi - h, yi], [xi + h, yi]])))
        else:
            out.append(point_wkb(xi, yi))
    return pd.Series(out)


def widen_features(extracted: DataFrame) -> DataFrame:
    """page_extract.extract_features output → candidate-stage input schema."""
    f = extracted
    for c in WIDE_TAG_COLS:
        if c not in f.columns:
            f = f.withColumn(c, F.element_at(F.col("tags"), F.lit(c)))
    f = f.withColumn("osm_id", F.xxhash64(F.col("url")))
    return f.withColumn(
        "way_wkb", _page_wkb(F.col("x"), F.col("y"), F.col("geom_kind"))
    )
