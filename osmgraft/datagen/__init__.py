from osmgraft.datagen.fixtures import (
    gen_known_suppliers,
    gen_osm_features,
    gen_pages,
    gen_poi_airports,
    gen_uk_boundaries,
)

__all__ = [
    "gen_known_suppliers",
    "gen_osm_features",
    "gen_pages",
    "gen_poi_airports",
    "gen_uk_boundaries",
]
