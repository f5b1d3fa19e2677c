"""Invariant tests for the session-14 additions (contract_science.py).

Oracle parity is covered by test_contract_oracle.py; these pin the
statistical/structural invariants a parity check alone cannot certify.
"""

from __future__ import annotations

from tests.conftest import SF_CORRECT


class TestKruskalWallis:
    def test_rank_identities_and_signal(self, spark):
        from osmgraft.contract_science import kruskal_wallis_test

        rows = kruskal_wallis_test(spark, SF_CORRECT).collect()
        assert len(rows) == 5
        ev = spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        n = ev.count()
        assert sum(r["n_g"] for r in rows) == n
        # rank-sum identity: weighted mean of the group mean ranks is
        # the overall mean rank (N+1)/2
        wmean = sum(r["mean_rank"] * r["n_g"] for r in rows) / n
        assert abs(wmean - (n + 1) / 2) < 1e-3
        r0 = rows[0]
        assert r0["df"] == 4
        assert r0["h_stat"] >= 0
        # ties are heavy by construction -> the correction INCREASES H
        assert r0["h_corrected"] >= r0["h_stat"]
        # the rank ordering must agree with the groups' value-mean
        # ordering (ranks are order-preserving after the unit binning)
        means = {
            g["event_type"]: g["m"]
            for g in ev.groupBy("event_type")
            .agg({"value": "avg"})
            .withColumnRenamed("avg(value)", "m")
            .collect()
        }
        by_rank = sorted(rows, key=lambda r: r["mean_rank"])
        by_mean = sorted(rows, key=lambda r: means[r["event_type"]])
        assert [r["event_type"] for r in by_rank] == [
            r["event_type"] for r in by_mean
        ]


class TestWilsonRanking:
    def test_lower_bound_is_a_lower_bound(self, spark):
        from osmgraft.contract_science import wilson_score_ranking

        rows = wilson_score_ranking(spark, SF_CORRECT).collect()
        assert len(rows) == 15
        for r in rows:
            assert 0.0 <= r["wilson_lb"] < r["p_hat"] <= 1.0
            assert r["n_ret"] <= r["n_obs"]
        # ordered by the rounded bound desc
        lbs = [r["wilson_lb"] for r in rows]
        assert lbs == sorted(lbs, reverse=True)

    def test_small_sample_is_penalized(self, spark):
        """Two groups with the same rate but different n must rank the
        larger one higher — the whole point of the Wilson sort."""
        from osmgraft.contract_science import _WIL_Z

        z = float(_WIL_Z.rstrip("e0") + "") if False else 1.959964

        def lb(s, n):
            p = s / n
            return (
                p
                + z * z / (2 * n)
                - z * ((p * (1 - p) / n + z * z / (4 * n * n)) ** 0.5)
            ) / (1 + z * z / n)

        assert lb(90, 300) > lb(3, 10)


class TestClosenessCentrality:
    def test_reach_and_bounds(self, spark):
        from osmgraft.contract_science import (
            _CCN_SRC_MOD,
            closeness_centrality,
        )

        rows = closeness_centrality(spark, SF_CORRECT).collect()
        assert rows, "graph must yield at least one BFS root"
        for r in rows:
            assert r["src"] % _CCN_SRC_MOD == 0
            # self at distance 0 always reached
            assert r["n_reached"] >= 1
            assert r["sum_dist"] >= r["n_reached"] - 1
            assert r["closeness"] > 0
            # each reciprocal <= 1 -> harmonic bounded by reach-1
            assert r["harmonic"] <= r["n_reached"] - 1 + 1e-6
            # harmonic >= closeness-consistent floor: sum(1/d) >=
            # (r-1)^2/sum_dist by Cauchy-Schwarz
            floor = (r["n_reached"] - 1) ** 2 / r["sum_dist"]
            assert r["harmonic"] >= floor - 1e-4


class TestPeriodogram:
    def test_spectrum_shape(self, spark):
        from osmgraft.contract_science import periodogram_daily_power

        rows = periodogram_daily_power(spark, SF_CORRECT).collect()
        assert [r["k"] for r in rows] == list(range(1, 11))
        assert all(r["amplitude"] >= 0 for r in rows)
        assert abs(rows[0]["period_days"] - 30.0) < 1e-6
        # amplitudes are bounded by the series' total variation scale:
        # no bin can exceed the mean absolute daily revenue
        ev = spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        mean_daily = (
            ev.selectExpr("CAST(ts AS DATE) AS d", "value")
            .groupBy("d")
            .sum("value")
            .agg({"sum(value)": "avg"})
            .collect()[0][0]
        )
        assert all(r["amplitude"] < mean_daily for r in rows)


class TestLineOfSight:
    def test_visibility_rules(self, spark):
        from osmgraft.contract_science import line_of_sight_profile

        rows = line_of_sight_profile(spark, SF_CORRECT).collect()
        assert len(rows) == 8
        assert {r["ray"] for r in rows} == {
            "E", "NE", "N", "NW", "W", "SW", "S", "SE"
        }
        for r in rows:
            assert r["n_steps"] == 7
            # the first step on every ray has no occluder -> visible
            assert 1 <= r["n_visible"] <= 7
            assert 1 <= r["horizon_step"] <= 7


class TestFriedman:
    def test_rank_sum_identity(self, spark):
        from osmgraft.contract_science import friedman_test

        rows = friedman_test(spark, SF_CORRECT).collect()
        assert len(rows) == 5
        ev = spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        n_b = ev.selectExpr("CAST(ts AS DATE) AS d").distinct().count()
        k = 5
        # within each block ranks 1..k are assigned exactly once
        total = sum(r["rank_sum"] for r in rows)
        assert total == n_b * k * (k + 1) // 2
        assert rows[0]["df"] == 4
        assert rows[0]["q_stat"] >= 0
        for r in rows:
            assert 1.0 <= r["mean_rank"] <= 5.0


class TestMojibakeAudit:
    def test_planted_defects_are_found(self, spark):
        from osmgraft.contract_science import mojibake_audit

        rows = mojibake_audit(spark, SF_CORRECT).collect()
        docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        n_moj = docs.filter("doc_id % 97 = 0 AND text LIKE '%e%'").count()
        n_rep = docs.filter("doc_id % 89 = 0").count()
        assert sum(r["mojibake_docs"] for r in rows) == n_moj
        assert sum(r["replacement_docs"] for r in rows) == n_rep
        assert sum(r["n_docs"] for r in rows) == docs.count()
        for r in rows:
            assert 0.0 <= r["clean_ratio"] <= 1.0
            # occurrence totals imply at least one char per flagged doc
            assert r["mojibake_chars"] >= r["mojibake_docs"]
            assert r["replacement_chars"] >= r["replacement_docs"]


class TestIndexAdvisor:
    def test_advice_classes(self, spark):
        from osmgraft.contract_science import index_advisor

        rows = {r["query_name"]: r for r in
                index_advisor(spark, SF_CORRECT).collect()}
        assert len(rows) == 6
        # the point lookup is selective and hot -> index
        assert rows["user_lookup"]["advice"] == "index"
        assert rows["user_lookup"]["selectivity"] < 0.05
        # date filters route to partitioning regardless of selectivity
        assert rows["daily_digest"]["advice"] == "partition_by_day"
        # a 20%-selectivity hot scan is NOT index-worthy
        assert rows["click_feed"]["advice"] == "full_scan_ok"
        ev = spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        n = ev.count()
        for r in rows.values():
            assert r["weekly_rows_skipped"] == r["weekly_freq"] * (
                n - r["matching_rows"]
            )
