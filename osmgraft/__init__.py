"""osmgraft — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the query and data-processing capabilities of the reference
pipeline (matcapl/uk-osm-data-processor, a PostgreSQL/PostGIS entity-scoring
system — see /root/repo/SURVEY.md) as an idiomatic Spark engine:

- declarative DataFrame plans (Catalyst does pushdown/pruning/codegen),
- a YAML→Column rules compiler for exclusion filters + additive scoring,
- a hierarchical Z-order cell index (H3/S2-style) for spatial partitioning,
- broadcast R-tree point-in-polygon, cell-partitioned kNN,
- skew-aware salting + AQE, checkpoint-resumable staged runs with
  per-partition lineage metrics,
- large-scale text utilities (dedup, quality, language-ID, fingerprints)
  and embedding similarity search.

Everything here derives from public knowledge only (Apache Spark APIs and
the reference repo's observable behavior).
"""

__version__ = "0.1.0"
