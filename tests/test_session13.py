"""Invariant tests for the session-13 additions (contract_science.py).

Oracle parity for every entry is covered by test_contract_oracle.py;
these tests pin the STATISTICAL invariants the fixtures were built to
exhibit — the properties a parity check alone cannot certify.
"""

from __future__ import annotations

from tests.conftest import SF_CORRECT


class TestSpatialDispersion:
    def test_geary_moran_agree_on_clustering(self, spark):
        """On the hotspot mixture the two global autocorrelation
        statistics must agree: Moran's I > 0 iff Geary's C < 1."""
        from osmgraft.contract_cells import morans_i_autocorrelation
        from osmgraft.contract_science import gearys_c

        i = morans_i_autocorrelation(spark, SF_CORRECT).collect()[0]
        c = gearys_c(spark, SF_CORRECT).collect()[0]
        assert i["morans_i"] > 0
        assert 0 < c["gearys_c"] < 1
        # both ran over the identical grid and weight structure
        assert i["n_cells"] == c["n_cells"] == 6400
        assert i["w_sum"] == c["w_sum"]

    def test_quadrat_vmr_detects_clustering(self, spark):
        from osmgraft.contract_science import quadrat_vmr_test

        r = quadrat_vmr_test(spark, SF_CORRECT).collect()[0]
        assert r["n_quadrats"] == 100
        # hotspot mixture: strongly over-dispersed counts
        assert r["vmr"] > 1.5
        assert r["verdict"] == "clustered"
        # D = (Q-1)/Q * ... consistency between the two ratios
        assert abs(r["dispersion_index"] - r["vmr"] * 99 / 100) < 1e-4
        # every point landed in some quadrat (grid covers the extent)
        ev = spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        assert r["total_points"] == ev.count()


class TestSupervisedLearners:
    def test_naive_bayes_covers_heldout_split(self, spark):
        from osmgraft.contract_science import naive_bayes_lang_confusion

        rows = naive_bayes_lang_confusion(spark, SF_CORRECT).collect()
        docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        n_test = docs.filter("doc_id % 5 = 0").count()
        assert sum(r["n_docs"] for r in rows) == n_test
        langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
        assert {r["pred_lang"] for r in rows} <= langs
        # the majority class must be predicted at better-than-chance
        diag = {r["true_lang"]: r["n_docs"] for r in rows
                if r["true_lang"] == r["pred_lang"]}
        en_total = sum(r["n_docs"] for r in rows if r["true_lang"] == "en")
        assert diag.get("en", 0) > en_total // 2

    def test_decision_stump_beats_no_split(self, spark):
        from osmgraft.contract_science import decision_stump_split

        r = decision_stump_split(spark, SF_CORRECT).collect()[0]
        ev = spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        n = ev.count()
        pos = ev.filter("event_type = 'click'").count()
        assert r["n_left"] + r["n_right"] == n
        # base (no-split) Gini of the root node
        p = pos / n
        base = 2 * p * (1 - p)
        assert r["weighted_gini"] < base
        # stump accuracy at least the majority-vote baseline
        assert r["n_correct"] >= max(pos, n - pos)


class TestTextWebNormalization:
    def test_stemmer_conflates_forms(self, spark):
        from osmgraft.contract_science import suffix_stem_rollup

        rows = suffix_stem_rollup(spark, SF_CORRECT).collect()
        assert len(rows) == 15
        # the stemmer must actually conflate: top stems carry >1 surface form
        assert max(r["n_forms"] for r in rows) >= 3
        # no reported stem still carries a plural/-ing/-ed suffix artifact
        for r in rows:
            assert not r["stem"].endswith(("ies", "sses"))

    def test_url_templates_collapse_paths(self, spark):
        from osmgraft.contract_science import url_template_mining

        rows = url_template_mining(spark, SF_CORRECT).collect()
        tmpl = {r["template"]: r for r in rows}
        # the three parametric shapes + the static page
        assert "/p/{n}/item-{n}" in tmpl
        assert "/c/{n}" in tmpl
        assert "/a/about" in tmpl
        assert "/p/{n}/reviews" in tmpl
        # static template has exactly one instantiation
        assert tmpl["/a/about"]["n_distinct_paths"] == 1
        # parametric templates collapse many paths into one shape
        assert tmpl["/p/{n}/item-{n}"]["n_distinct_paths"] > 10
        # every doc produced exactly one url
        docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet").count()
        assert sum(r["n_urls"] for r in rows) == docs


class TestTimeSeriesModels:
    def test_ar1_forecast_consistency(self, spark):
        from osmgraft.contract_science import ar1_forecast

        rows = ar1_forecast(spark, SF_CORRECT).collect()
        types = {r["event_type"] for r in rows}
        assert types == {"click", "error", "purchase", "signup", "view"}
        for r in rows:
            # stationarity of the fixture: |phi| < 1
            assert abs(r["phi"]) < 1
            # forecast stays within the plausible range of the series
            assert 0 < r["forecast_cents"] < 10 * r["last_cents"] + 10**9

    def test_granger_no_causality_on_independent_series(self, spark):
        from osmgraft.contract_science import granger_lag_ftest

        r = granger_lag_ftest(spark, SF_CORRECT).collect()[0]
        # the fixture's click counts and value totals are independent
        assert r["verdict"] == "not_predictive"
        assert r["f_stat"] >= 0
        assert r["df2"] == r["n_pairs"] - 3


class TestDependenceAndMechanisms:
    def test_kendall_tau_bounds_and_pairs(self, spark):
        from osmgraft.contract_science import kendall_tau_daily

        r = kendall_tau_daily(spark, SF_CORRECT).collect()[0]
        n_days = (
            spark.read.parquet(f"{SF_CORRECT}/events.parquet")
            .selectExpr("CAST(ts AS DATE) d").distinct().count()
        )
        assert r["n_pairs"] == n_days * (n_days - 1) // 2
        assert -1 <= r["tau_b"] <= 1
        assert r["concordant"] + r["discordant"] <= r["n_pairs"]

    def test_second_price_never_exceeds_first(self, spark):
        from osmgraft.contract_science import second_price_auction_revenue

        rows = second_price_auction_revenue(spark, SF_CORRECT).collect()
        assert len(rows) == 5
        for r in rows:
            assert r["second_price_cents"] <= r["first_price_cents"]
            assert 0 < r["revenue_ratio"] <= 1


class TestColocation:
    def test_clq_near_one_on_type_independent_field(self, spark):
        from osmgraft.contract_science import colocation_quotient

        rows = colocation_quotient(spark, SF_CORRECT).collect()
        # all 5x5 type pairs observed on the fixture
        assert len(rows) == 25
        # per-A numerator shares sum to 1 => weighted CLQ mean ~ 1
        clqs = [r["clq"] for r in rows]
        assert all(c > 0 for c in clqs)
        # type placement is independent of location in the fixture:
        # no pair should show a huge attraction/repulsion
        assert 0.3 < min(clqs) and max(clqs) < 3.0


class TestSequentialAndSurvival:
    def test_page_hinkley_stable_on_stationary_series(self, spark):
        from osmgraft.contract_science import page_hinkley_drift

        rows = page_hinkley_drift(spark, SF_CORRECT).collect()
        assert len(rows) == 5
        for r in rows:
            assert r["verdict"] == "stable"
            assert r["ph_stat"] >= 0
            # comfortable margin below the alarm threshold (lambda = mean)
            assert r["ph_stat"] < 0.8 * r["mean_daily"]

    def test_page_hinkley_fires_on_injected_shift(self, spark):
        """Inject a +50% level shift into the second half of one type's
        series by scaling values in the last 15 days; PH must alarm."""
        import pyspark.sql.functions as F
        from osmgraft.contract_science import page_hinkley_drift
        import osmgraft.contract as C

        ev = spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        cut = ev.agg(F.expr("date_add(CAST(MAX(ts) AS DATE), -14)")
                     .alias("c")).collect()[0]["c"]
        shifted = ev.withColumn(
            "value",
            F.when(
                (F.col("event_type") == "view")
                & (F.col("ts").cast("date") >= F.lit(cut)),
                F.col("value") * 3.0,
            ).otherwise(F.col("value")),
        )
        import tempfile, os
        with tempfile.TemporaryDirectory() as d:
            shifted.write.parquet(os.path.join(d, "events.parquet"))
            for name in ["region", "nation", "customer", "supplier",
                         "part", "orders", "lineitem", "documents",
                         "embeddings"]:
                os.symlink(f"{SF_CORRECT}/{name}.parquet",
                           os.path.join(d, f"{name}.parquet"))
            rows = page_hinkley_drift(spark, d).collect()
        v = {r["event_type"]: r["verdict"] for r in rows}
        assert v["view"] == "drift"
        assert v["purchase"] == "stable"

    def test_nelson_aalen_monotone_and_km_consistent(self, spark):
        from osmgraft.contract_science import nelson_aalen_hazard

        rows = nelson_aalen_hazard(spark, SF_CORRECT).collect()
        assert len(rows) > 3
        hz = [r["cum_hazard"] for r in rows]
        assert hz == sorted(hz)  # cumulative hazard nondecreasing
        for r in rows:
            assert r["at_risk"] >= r["d"] > 0
        # risk sets strictly shrink over event times
        ar = [r["at_risk"] for r in rows]
        assert ar == sorted(ar, reverse=True)


class TestBasketsAndInventory:
    def test_apriori_triples_respect_pair_support(self, spark):
        """Monotonicity: every reported triple's member pairs must each
        reach the same support threshold (the Apriori invariant)."""
        import pyspark.sql.functions as F
        from osmgraft.contract_science import (
            apriori_triple_itemsets, _AP_MINSUP,
        )

        rows = apriori_triple_itemsets(spark, SF_CORRECT).collect()
        assert 0 < len(rows) <= 20
        oi = (
            spark.read.parquet(f"{SF_CORRECT}/lineitem.parquet")
            .select(
                F.col("l_orderkey").alias("o"),
                (F.col("l_partkey") % 50).alias("item"),
            )
            .distinct()
        )
        baskets = {}
        for r in oi.collect():
            baskets.setdefault(r["o"], set()).add(r["item"])
        for r in rows[:5]:
            assert r["n_baskets"] >= _AP_MINSUP
            for pair in [(r["i1"], r["i2"]), (r["i1"], r["i3"]),
                         (r["i2"], r["i3"])]:
                n = sum(1 for s in baskets.values()
                        if pair[0] in s and pair[1] in s)
                assert n >= r["n_baskets"] >= _AP_MINSUP

    def test_eoq_sqrt_scaling(self, spark):
        from osmgraft.contract_science import eoq_order_quantity

        rows = eoq_order_quantity(spark, SF_CORRECT).collect()
        assert len(rows) > 3
        for r in rows:
            # the square-root law: EOQ * orders_per_period == demand
            assert abs(r["eoq_units"] * r["orders_per_period"]
                       - r["total_demand"]) / r["total_demand"] < 1e-3
            assert r["eoq_units"] > 0
