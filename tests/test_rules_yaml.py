"""The reference-shaped 10-tier YAML scoring system (scoring.yaml:8-357).

The aerospace asset is validated against an INDEPENDENT row-at-a-time
Python scorer written directly from the YAML dict (not from the parsed
RuleSet), so the loader + compiler pipeline is cross-checked end-to-end:
group-fires-once, condition-mapping OR, condition-list AND, postcode
prefix semantics, '>N' numeric thresholds, and override_if suppression
(scoring.yaml:304-312)."""

from __future__ import annotations

import re

import numpy as np
import pytest
import yaml
from pyspark.sql import functions as F

from osmgraft.datagen import gen_osm_features
from osmgraft.datagen.spark_io import to_spark
from osmgraft.rules.compiler import compile_score, compile_tier
from osmgraft.rules.yamlspec import (
    ColumnMap,
    _read_asset,
    load_aerospace_scoring,
    load_documents_scoring,
)

# ---------------------------------------------------------------------------
# naive reference scorer (independent reimplementation from the YAML dict)
# ---------------------------------------------------------------------------


def _naive_pat(p: str) -> str:
    return p.replace("\\m", "\\b").replace("\\M", "\\b")


def _blob(row) -> str:
    return (
        (row.get("name") or "") + " " + (row.get("operator") or "")
    ).lower()


def _naive_postcode_match(codes, pc) -> bool:
    if pc is None:
        return False
    for c in codes:
        if c[-1].isdigit():
            if re.match(rf"^{c}\b", pc):
                return True
        elif re.match(rf"^{c}[0-9]", pc):
            return True
    return False


def _naive_cond_item(row, key, val) -> bool:
    if key == "name_contains":
        return any(s.lower() in _blob(row) for s in val)
    if key == "website_contains":
        w = (row.get("website") or "").lower()
        return any(s in w for s in val)
    if key == "has_website":
        return row.get("website") is not None
    if key == "has_phone":
        return "phone" in (row.get("tags") or {})
    if key == "has_postcode":
        return row.get("addr_postcode") is not None
    if key == "building_area":
        a = row.get("building_area")
        return a is not None and a > float(str(val).lstrip("> "))
    if key == "building_type":
        v = row.get("building")
        return v is not None and v in (val if isinstance(val, list) else [val])
    if isinstance(val, str) and val.startswith(">"):
        v = row.get(key)
        return v is not None and v > float(val.lstrip("> "))
    v = row.get(key)
    if val == "*" or val == ["*"]:
        return v is not None
    vals = val if isinstance(val, list) else [val]
    return v is not None and v in [str(x) for x in vals]


def _naive_group_fires(row, spec) -> bool:
    fired = False
    if "patterns" in spec:
        fired = fired or any(
            re.search(_naive_pat(p), _blob(row)) for p in spec["patterns"]
        )
    if "keywords" in spec:
        fired = fired or any(k.lower() in _blob(row) for k in spec["keywords"])
    if "postcodes" in spec:
        fired = fired or _naive_postcode_match(
            spec["postcodes"], row.get("addr_postcode")
        )
    if "conditions" in spec:
        conds = spec["conditions"]
        if isinstance(conds, dict):  # mapping → OR
            fired = fired or any(
                _naive_cond_item(row, k, v) for k, v in conds.items()
            )
        else:  # list → AND
            fired = fired or all(
                _naive_cond_item(row, k, v)
                for item in conds
                for k, v in item.items()
            )
    return fired


def naive_score(row, doc) -> int:
    total = 0
    for section, groups in doc.items():
        if section in ("thresholds", "validation"):
            continue
        for spec in groups.values():
            if not _naive_group_fires(row, spec):
                continue
            if "override_if" in spec and any(
                _naive_cond_item(row, k, v)
                for item in spec["override_if"]
                for k, v in item.items()
            ):
                continue
            total += spec["weight"]
    return total


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_assets_load_and_shape():
    aero = load_aerospace_scoring()
    assert len(aero.rules.rules) == 31  # 23 positive groups + 4+4 negatives
    assert aero.tier_bands == (
        (150, "tier1_candidate"),
        (80, "tier2_candidate"),
        (40, "potential_candidate"),
    )
    assert aero.minimum_score == 40
    assert "required_fields" in aero.validation
    docs = load_documents_scoring()
    assert len(docs.rules.rules) == 23
    # override_if parsed onto the negative groups
    ov = [r for r in aero.rules.rules if r.override_if]
    assert {r.label for r in ov} == {
        "strong_negatives.consumer_businesses",
        "strong_negatives.residential",
    }
    assert all(r.weight < 0 for r in ov)


def test_aerospace_scoring_matches_naive_python(spark):
    """Full-asset cross-check: Spark compiled Column vs the independent
    row-at-a-time scorer, over the OSM fixture (800 rows covering every
    tier, noise class, and override path)."""
    pdf = gen_osm_features(800)
    # the fixture duplicates osm_ids across kinds by design — re-key unique
    pdf["osm_id"] = np.arange(1, len(pdf) + 1, dtype=np.int64) * 7919
    # deterministic synthetic building area (points → NULL, polygons → m²),
    # same formula on both sides
    pdf["building_area"] = np.where(
        pdf["geom_kind"] == "polygon", (pdf["osm_id"].abs() % 8000).astype(float), np.nan
    )
    doc = yaml.safe_load(_read_asset("aerospace_scoring.yaml"))
    expected = []
    for _, row in pdf.iterrows():
        r = row.to_dict()
        if isinstance(r.get("building_area"), float) and np.isnan(r["building_area"]):
            r["building_area"] = None
        expected.append(naive_score(r, doc))

    spec = load_aerospace_scoring()
    sdf = (
        to_spark(spark, pdf.drop(columns=["building_area"]), "features")
        .withColumn(
            "building_area",
            F.when(
                F.col("geom_kind") == "polygon",
                (F.abs(F.col("osm_id")) % 8000).cast("double"),
            ),
        )
        .withColumn(
            "name_blob",
            F.lower(
                F.concat(
                    F.coalesce(F.col("name"), F.lit("")),
                    F.lit(" "),
                    F.coalesce(F.col("operator"), F.lit("")),
                )
            ),
        )
    )
    got = (
        sdf.withColumn("score", compile_score(spec.rules))
        .select("osm_id", "score")
        .toPandas()
        .set_index("osm_id")["score"]
    )
    exp = dict(zip(pdf["osm_id"], expected))
    mismatches = [
        (oid, int(got[oid]), exp[oid]) for oid in exp if int(got[oid]) != exp[oid]
    ]
    assert mismatches == [], mismatches[:10]
    # distribution sanity: all three classes present
    tiers = (
        sdf.withColumn("score", compile_score(spec.rules))
        .withColumn("tier", compile_tier("score", spec.tier_bands))
        .groupBy("tier")
        .count()
        .toPandas()
    )
    assert set(tiers["tier"]) >= {"tier1_candidate", "low_probability"}


def test_override_if_suppresses_penalty(spark):
    """scoring.yaml:304-312: a shop named '... Aerospace ...' must NOT get
    the -200 consumer penalty; the same shop without the aerospace name
    must."""
    schema = (
        "name string, shop string, building string, tourism string, "
        "amenity string, leisure string, landuse string, industrial string, "
        "office string, man_made string, website string, addr_postcode string, "
        "building_area double, tags map<string,string>"
    )
    none9 = (None,) * 9
    rows = [
        ("Acme Aerospace Components", "convenience", None) + none9 + (None, {}),
        ("Acme Corner Store", "convenience", None) + none9 + (None, {}),
        ("Sunny Apartments", None, "apartments") + none9 + (None, {}),
        ("Sunny Aviation House", None, "apartments") + none9 + (None, {}),
    ]
    spec = load_aerospace_scoring()
    sdf = spark.createDataFrame(rows, schema).withColumn(
        "name_blob", F.lower(F.coalesce(F.col("name"), F.lit("")))
    )
    got = {
        r["name"]: r["score"]
        for r in sdf.withColumn("score", compile_score(spec.rules)).collect()
    }
    # aerospace-named shop: +100 direct term; -200 consumer penalty is
    # override-suppressed; -100 clearly_wrong still fires because keyword
    # 'spa' substring-matches "aeroSPAce" — the reference's own LIKE-'%kw%'
    # false positive, reproduced faithfully (scoring.yaml:317-326)
    assert got["Acme Aerospace Components"] == 0
    # plain shop: -200 fires (no override, no positive terms)
    assert got["Acme Corner Store"] == -200
    # residential: -150 fires
    assert got["Sunny Apartments"] == -150
    # aviation-named residential: -150 suppressed, +100 aviation term
    assert got["Sunny Aviation House"] == 100


def test_postcode_prefix_semantics(spark):
    """Letter-only area codes must be digit-delimited ('S' matches S1, not
    SO16); digit-terminated districts are boundary-delimited (GU14 matches
    'GU14 6XX', not GU1)."""
    spec = load_aerospace_scoring()
    geo = [r for r in spec.rules.rules if r.label.startswith("geographic_clusters")]
    from osmgraft.rules.compiler import RuleSet

    sdf = spark.createDataFrame(
        [(pc,) for pc in ["S1 2AA", "SO16 7PX", "GU14 6XX", "GU1 3QQ",
                          "BS12 4YY", "NE8 1ZZ"]],
        "addr_postcode string",
    )
    got = (
        sdf.withColumn("geo_score", compile_score(RuleSet("geo", tuple(geo))))
        .toPandas()
        .set_index("addr_postcode")["geo_score"]
    )
    assert got["S1 2AA"] == 20      # 'S' emerging
    assert got["SO16 7PX"] == 30    # 'SO' secondary, 'S' must not also apply
    assert got["GU14 6XX"] == 50    # GU14 primary
    assert got["GU1 3QQ"] == 0      # GU1 is not GU14 and 'GU' is not a code
    assert got["BS12 4YY"] == 50
    assert got["NE8 1ZZ"] == 20


def test_documents_spec_sql_and_spark_agree_on_fixture(spark):
    """Second backend: the documents 10-tier spec scored by DuckDB SQL
    (sqlgen) equals the Spark Column on the shared sf0.001 table — a
    smaller, faster twin of the driver's yaml_scored_documents gate."""
    import duckdb

    from osmgraft.rules.sqlgen import score_sql
    from tests.conftest import SF_CORRECT

    spec = load_documents_scoring()
    sdf = (
        spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .withColumn("score", compile_score(spec.rules))
        .select("doc_id", "score")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_CORRECT}/documents.parquet'"
    )
    ddf = (
        con.sql(f"SELECT doc_id, {score_sql(spec.rules)} AS score FROM documents")
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (sdf["score"].to_numpy() == ddf["score"].to_numpy()).all()
    assert sdf["score"].nunique() > 5  # real spread, not constant


class TestSuspicionTriggers:
    """validation.suspicion_triggers compile to real predicates (round 3 —
    inert metadata through round 2)."""

    def test_documents_triggers_parse(self):
        from osmgraft.rules.yamlspec import load_documents_scoring

        spec = load_documents_scoring()
        names = {t.name for t in spec.triggers}
        assert names == {
            "high_score_but_lowtrust_source",
            "high_score_but_filler_terms",
            "score_above_150_no_english",
            "tier1_but_generic_text",
        }

    def test_reference_boolean_shape_maps_to_builtins(self):
        from osmgraft.rules.yamlspec import load_aerospace_scoring

        spec = load_aerospace_scoring()
        names = [t.name for t in spec.triggers]
        assert names == [
            "score_above_150_no_website",
            "tier1_but_residential_postcode",
            "high_score_but_consumer_amenity",
        ]
        # 'Score >150 + No Contact' semantics (power_user_queries.sql:223-229)
        t0 = spec.triggers[0]
        assert t0.min_score == 150 and t0.matcher is not None

    def test_trigger_toggles_its_flag(self, spark):
        """Flipping one attribute of an otherwise-identical row must flip
        exactly its trigger (both engines' predicates agree)."""
        from osmgraft.rules.yamlspec import (
            load_documents_scoring,
            trigger_predicate,
            trigger_sql,
        )

        spec = load_documents_scoring()
        trig = {t.name: t for t in spec.triggers}["score_above_150_no_english"]
        rows = [
            (1, "spark stream vector merge", "de", "src9", 160),  # fires
            (2, "spark stream vector merge", "en", "src9", 160),  # lang flip
            (3, "spark stream vector merge", "de", "src9", 100),  # score flip
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, score int"
        ).withColumn("tier", F.lit("tier1_candidate"))
        hit = {r.doc_id for r in df.where(trigger_predicate(trig)).collect()}
        assert hit == {1}

        import duckdb

        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
            "source VARCHAR, score INT, tier VARCHAR)"
        )
        for r in rows:
            con.execute("INSERT INTO t VALUES (?, ?, ?, ?, ?, 'tier1_candidate')", list(r))
        got = {r[0] for r in con.sql(f"SELECT doc_id FROM t WHERE {trigger_sql(trig)}").fetchall()}
        assert got == {1}
