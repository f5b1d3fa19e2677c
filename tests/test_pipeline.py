"""Reference-semantic golden tests for the scoring pipeline (SURVEY.md §5):
the pipeline assertion suite (test_aerospace_pipeline.sh), the known-supplier
recall fixture (known_suppliers_check.sql), dedup-cascade semantics
(create_final_table.sql), and the byte-identical extraction invariant."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmgraft.datagen import (
    gen_known_suppliers,
    gen_osm_features,
    gen_pages,
    gen_poi_airports,
    gen_uk_boundaries,
)
from osmgraft.datagen.spark_io import to_spark
from osmgraft.extract import extract_features
from osmgraft.pipeline import candidate_stage, priority_dedup_union
from osmgraft.pipeline.runner import run_reference_pipeline
from osmgraft.pipeline.union import assert_final_invariants
from osmgraft.rules.compiler import compile_score, compile_tier
from osmgraft.rules.reference_rules import PRIORITY_ORDER, SCORERS


@pytest.fixture(scope="module")
def features(spark):
    return to_spark(spark, gen_osm_features(2000), "features").cache()


@pytest.fixture(scope="module")
def final(spark, features, tmp_path_factory):
    d = tmp_path_factory.mktemp("stages")
    return run_reference_pipeline(spark, features, str(d)).cache()


def test_invariants(final):
    # no NULL names; score >= 40; valid tiers; coords present; unique osm_id
    assert_final_invariants(final)
    assert final.count() > 100


def test_tier_bands_consistent(final):
    # tier label must agree with the score bands (07_pipeline_point.sh:176-181)
    bad = final.where(
        ~(
            ((F.col("aerospace_score") >= 150) & (F.col("tier_classification") == "tier1_candidate"))
            | ((F.col("aerospace_score") >= 80) & (F.col("aerospace_score") < 150)
               & (F.col("tier_classification") == "tier2_candidate"))
            | ((F.col("aerospace_score") >= 40) & (F.col("aerospace_score") < 80)
               & (F.col("tier_classification") == "potential_candidate"))
        )
    ).count()
    assert bad == 0


def test_priority_cascade_id_level(spark):
    """If an osm_id exists in a higher-priority source, ALL lower-priority
    rows with that id are dropped (create_final_table.sql:72,89-116)."""
    cols = "osm_id long, source_table string, name string"
    poly = spark.createDataFrame([(1, "planet_osm_polygon", "a")], cols)
    point = spark.createDataFrame(
        [(1, "planet_osm_point", "b"), (1, "planet_osm_point", "c"),
         (2, "planet_osm_point", "d")], cols)
    line = spark.createDataFrame([(2, "planet_osm_line", "e"),
                                  (3, "planet_osm_line", "f")], cols)
    roads = spark.createDataFrame([(3, "planet_osm_roads", "g")], cols)
    out = priority_dedup_union(
        {"polygon": poly, "point": point, "line": line, "roads": roads},
        PRIORITY_ORDER,
    )
    rows = {(r.osm_id, r.name) for r in out.collect()}
    assert rows == {(1, "a"), (2, "d"), (3, "f")}


def test_known_supplier_recall(spark, final):
    """Coverage of the 18-supplier ground truth (known_suppliers_check.sql):
    >75% found (AEROSPACE_SCORING_README.md:182); the two deliberately absent
    suppliers must be missing."""
    ks = to_spark(spark, gen_known_suppliers(), "suppliers")
    first_word = F.lower(F.split(F.col("company_name"), " ").getItem(0))
    joined = ks.join(
        final,
        F.lower(final["name"]).contains(first_word),
        "left",
    )
    cov = (
        joined.groupBy("company_name")
        .agg(F.max(F.col("aerospace_score")).alias("best"))
        .withColumn("found", F.col("best").isNotNull())
    )
    res = {r.company_name: r.found for r in cov.collect()}
    found = sum(res.values())
    assert found / len(res) > 0.75, res
    assert not res["UTC Aerospace Systems"]


def test_scorer_spotcheck(spark):
    """Manual score recomputation (diagnose_pipeline.sql:119-142 style):
    known combinations must produce the exact reference weights."""
    from osmgraft.datagen.spark_io import FEATURES_SCHEMA
    base = {f.name: None for f in FEATURES_SCHEMA.fields}
    rows = [
        # name 'aerospace' (+100), landuse industrial (+40) = 140
        {**base, "osm_id": 1, "geom_kind": "point",
         "name": "Acme Aerospace", "landuse": "industrial", "tags": {}},
        # polygon: tier1 'airbus' fires both tier1 regexes (+100+100) and
        # name 'aero...' prefix? 'airbus' has no 'aero' substring → +200
        {**base, "osm_id": 2, "geom_kind": "polygon",
         "name": "Airbus Works", "tags": {}},
    ]
    df = spark.createDataFrame(
        [tuple(r[f.name] for f in FEATURES_SCHEMA.fields) for r in rows],
        FEATURES_SCHEMA,
    )
    got = {
        r.osm_id: r.s
        for kind in ("point", "polygon")
        for r in df.where(F.col("geom_kind") == kind)
        .select("osm_id", compile_score(SCORERS[kind]).alias("s"))
        .collect()
    }
    assert got[1] == 140
    assert got[2] == 200


def test_extraction_byte_identical(spark):
    pages = to_spark(spark, gen_pages(400), "pages")
    ext = extract_features(pages)
    j = pages.select("url", F.col("text").alias("orig")).join(ext, "url")
    assert j.where("orig != text").count() == 0
    assert j.where("text IS NULL").count() == 0
    # extraction recovers coordinates for every page
    assert ext.where("x IS NULL OR y IS NULL").count() == 0


def test_checkpoint_resume_stable(spark, features, tmp_path):
    d = str(tmp_path / "wd")
    a = run_reference_pipeline(spark, features, d)
    n1 = a.count()
    # second run must reuse manifests and produce identical results
    b = run_reference_pipeline(spark, features, d)
    assert b.count() == n1
    assert a.exceptAll(b).count() == 0


def test_parallelism_invariance(spark, features, tmp_path):
    """Tile assignments / score aggregates must be identical across
    parallelism levels (north rule) — here: repartitioned inputs."""
    f8 = features.repartition(8)
    f32 = features.repartition(32)
    a = candidate_stage(f8, "polygon").select(
        "osm_id", "aerospace_score", "tier_classification")
    b = candidate_stage(f32, "polygon").select(
        "osm_id", "aerospace_score", "tier_classification")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_diagnostics_suite(spark, features):
    """diagnose_pipeline.sql parity: all 12-section checks run and the
    crosschecks hold on the golden fixture."""
    from osmgraft.pipeline.diagnostics import run_diagnostics

    d = run_diagnostics(features)
    assert set(d["source_counts"]) == {"point", "polygon", "line", "roads"}
    assert sum(d["source_counts"].values()) == features.count()
    assert d["keyword_probes"]["rlike_aerospace"] > 0
    # the simplified manual scorer must never strongly disagree with the
    # compiled rules (diagnose_pipeline.sql DIAGNOSTIC 6)
    assert d["manual_vs_compiled_disagreements"] == 0
    assert all(v >= 0 for v in d["threshold_fallout"].values())
    assert d["tags_nonempty"] > 0
    for kind, n in d["filtered_counts"].items():
        assert 0 < n <= d["source_counts"][kind], kind
    # D13 (round 3): every fixture geometry classifies, and the fixture's
    # well-formed WKB must all be valid (any other reason = import defect)
    assert sum(d["geometry_validity"].values()) == features.count()
    assert set(d["geometry_validity"]) == {"valid"}


def test_simhash_banded_pairs_exact_vs_allpairs(spark):
    """Round-2: banded pigeonhole blocking must find EXACTLY the pairs an
    all-pairs popcount scan finds at the same hamming radius (the blocking
    is lossless by pigeonhole), on the shared documents table."""
    from osmgraft.text.dedup import simhash, simhash_neardup_pairs
    from tests.conftest import SF_CORRECT

    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    sigs = simhash(docs).cache()
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_neardup_pairs(sigs, max_hamming=3).collect()
    }
    a = sigs.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"))
    b = sigs.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"))
    brute = (
        a.crossJoin(b)
        .where(F.col("doc_a") < F.col("doc_b"))
        .withColumn("h", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("int"))
        .where(F.col("h") <= 3)
    )
    exp = {(r.doc_a, r.doc_b, r.h) for r in brute.collect()}
    sigs.unpersist()
    assert got == exp
    assert len(exp) > 0  # fixture contains near-dup docs


def test_connected_components_known_graph(spark):
    """Min-label propagation on a graph with known components: a 5-chain
    (diameter 4 — needs multiple rounds), a star, and an isolated edge."""
    from osmgraft.text.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),        # chain → component 1
         (10, 11), (10, 12), (10, 13),          # star → component 10
         (20, 21)],                              # edge → component 20
        "doc_a long, doc_b long",
    )
    got = {
        r.doc_id: r.cluster_id for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10, 13: 10, 20: 20, 21: 20}


def test_quality_scores_empty_text_no_ansi_crash(spark):
    """Review finding: empty text gave DIVIDE_BY_ZERO under Spark 4's
    default ANSI mode; alpha_ratio must be 0 instead."""
    from osmgraft.text.quality import language_id, quality_scores

    docs = spark.createDataFrame(
        [(1, ""), (2, "the quick brown fox")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in quality_scores(docs).collect()}
    assert rows[1].alpha_ratio == 0.0
    assert rows[2].quality_score > 0
    assert {r.doc_id for r in language_id(docs).collect()} == {1, 2}


def test_extract_tolerates_null_text(spark):
    """Review finding: a NULL text row crashed the Arrow extract kernel."""
    import datetime as dt

    from osmgraft.extract import extract_features

    pages = spark.createDataFrame(
        [("https://a", dt.datetime(2024, 1, 1), None, None, "en"),
         ("https://b", dt.datetime(2024, 1, 1), None,
          "Acme Ltd | operator=acme | postcode=BS1 2AA | loc=1000.0,2000.0 | "
          "landuse=industrial | kind=point | building=yes", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    rows = {r.url: r for r in extract_features(pages).collect()}
    assert rows["https://a"].tags == {}
    assert rows["https://b"].name == "Acme Ltd"


def test_connected_components_hashed_ids_no_overflow(spark):
    """Review finding: label-sum convergence overflowed int64 with hashed
    ids near ±2^63 under ANSI mode; the changed-count check must not."""
    from osmgraft.text.dedup import connected_components

    big = 2**63 - 10
    edges = spark.createDataFrame(
        [(big, big - 1), (big - 1, big - 2), (-big, -big + 1)],
        "doc_a long, doc_b long",
    )
    got = {r.doc_id: r.cluster_id for r in connected_components(edges).collect()}
    assert got == {big: big - 2, big - 1: big - 2, big - 2: big - 2,
                   -big: -big, -big + 1: -big}


def test_word_hits_counts_adjacent_occurrences(spark):
    """Review finding: non-overlapping replace undercounted adjacent
    words ('the the' → 1). Space doubling fixes it in both backends."""
    import duckdb

    from osmgraft.text.quality import _word_hits

    docs = spark.createDataFrame(
        [(1, "the the end"), (2, "a a a"), (3, "the cat the")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.h_the, r.h_a)
        for r in docs.select(
            "doc_id",
            _word_hits(F.col("text"), "the").alias("h_the"),
            _word_hits(F.col("text"), "a").alias("h_a"),
        ).collect()
    }
    assert got == {1: (2, 0), 2: (0, 3), 3: (2, 0)}


def test_multi_hits_equals_per_word_sum(spark):
    """The round-3 single-pass alternation counter must equal the summed
    per-word replace counters on adversarial inputs: repeated words,
    ADJACENT DISTINCT stopwords (regex scan must not eat the next match's
    delimiter), words at string ends, prefix-shadowing ('a' vs 'an'),
    empty text."""
    from osmgraft.text.quality import (
        STOPWORDS,
        _hits_in_padded,
        _multi_hits_in_padded,
        _padded,
    )

    docs = spark.createDataFrame(
        [
            (1, "the the the"),
            (2, "a an a an and"),
            (3, "of to in is it for"),
            (4, "the"),
            (5, ""),
            (6, "an anthem is not an an"),
            (7, "for for for it it the a"),
        ],
        "doc_id long, text string",
    )
    per_word = None
    for w in STOPWORDS:
        h = _hits_in_padded(F.col("_pad"), w)
        per_word = h if per_word is None else per_word + h
    base = docs.select("doc_id", _padded(F.col("text")).alias("_pad"))
    rows = base.select(
        "doc_id",
        per_word.alias("naive"),
        _multi_hits_in_padded(F.col("_pad"), STOPWORDS).alias("fused"),
    ).collect()
    for r in rows:
        assert r.naive == r.fused, (r.doc_id, r.naive, r.fused)


def test_dedup_pages_keeps_one_copy_of_recrawled_url(spark):
    """Review finding: an url anti-join dropped ALL copies of a re-crawled
    url; row-level dedup must keep exactly one, and NULL-text rows are
    never duplicates of each other."""
    import datetime as dt

    from osmgraft.text.dedup import dedup_pages_keep_first

    t0 = dt.datetime(2024, 1, 1)
    pages = spark.createDataFrame(
        [("https://u", t0, "same body"),
         ("https://u", t0 + dt.timedelta(days=1), "same body"),  # re-crawl
         ("https://v", t0, "other body"),
         ("https://w1", t0, None),
         ("https://w2", t0, None)],
        "url string, warc_ts timestamp, text string",
    )
    out = dedup_pages_keep_first(pages).collect()
    urls = sorted(r.url for r in out)
    assert urls == ["https://u", "https://v", "https://w1", "https://w2"]
    kept_u = [r for r in out if r.url == "https://u"][0]
    assert kept_u.warc_ts == t0  # deterministic keeper: first by order
