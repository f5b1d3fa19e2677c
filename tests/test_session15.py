"""Invariant tests for the session-15 additions (contract_stats.py).

Oracle parity is covered by test_contract_oracle.py; these pin the
statistical identities against an INDEPENDENT numpy re-computation of
each statistic from the raw parquet — a third engine, so a shared
Spark/DuckDB mistake in the formula cannot hide.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import SF_CORRECT


def _daily_cents() -> pd.Series:
    ev = pd.read_parquet(f"{SF_CORRECT}/events.parquet")
    cents = np.floor(ev["value"].to_numpy() * 100.0).astype(np.int64)
    day = ev["ts"].dt.normalize()
    return pd.Series(cents).groupby(day.to_numpy()).sum().sort_index()


def _ols_resid(y: np.ndarray) -> np.ndarray:
    x = np.arange(len(y), dtype=np.float64)
    b = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    a = y.mean() - b * x.mean()
    return y - a - b * x


class TestDurbinWatson:
    def test_matches_numpy_and_bands(self, spark):
        from osmgraft.contract_stats import durbin_watson_autocorr

        row = durbin_watson_autocorr(spark, SF_CORRECT).collect()[0]
        daily = _daily_cents()
        assert row["n_days"] == len(daily)
        e = _ols_resid(daily.to_numpy(dtype=np.float64))
        dw = np.sum(np.diff(e) ** 2) / np.sum(e**2)
        assert abs(row["dw_micro"] / 1e6 - dw) < 1e-4
        assert 0 <= row["dw_micro"] <= 4_000_000
        want = (
            "positive_autocorr"
            if dw < 1.5
            else "negative_autocorr" if dw > 2.5 else "no_autocorr"
        )
        assert row["verdict"] == want


class TestBreuschPagan:
    def test_matches_numpy(self, spark):
        from osmgraft.contract_stats import breusch_pagan_test

        row = breusch_pagan_test(spark, SF_CORRECT).collect()[0]
        daily = _daily_cents()
        e = _ols_resid(daily.to_numpy(dtype=np.float64))
        # the entry snaps residuals to integer dollars before squaring
        u = np.floor(e / 100.0 + 0.5) ** 2
        x = np.arange(len(e), dtype=np.float64)
        r = np.corrcoef(x, u)[0, 1] ** 2
        bp = len(e) * r
        assert abs(row["bp_micro"] / 1e6 - bp) < 1e-3
        assert row["df"] == 1
        assert row["verdict"] == (
            "heteroskedastic" if bp > 3.841459 else "homoskedastic"
        )


class TestCooksDistance:
    def test_matches_numpy_top5(self, spark):
        from osmgraft.contract_stats import cooks_distance_days

        rows = cooks_distance_days(spark, SF_CORRECT).collect()
        assert len(rows) == 5
        daily = _daily_cents()
        y = daily.to_numpy(dtype=np.float64)
        n = len(y)
        x = np.arange(n, dtype=np.float64)
        e = _ols_resid(y)
        sxx = np.sum((x - x.mean()) ** 2)
        h = 1.0 / n + (x - x.mean()) ** 2 / sxx
        s2 = np.sum(e**2) / (n - 2)
        d = e**2 * h / (2 * s2 * (1 - h) ** 2)
        top = np.argsort(-d)[:5]
        got_days = {r["day"] for r in rows}
        want_days = {daily.index[i].date() for i in top}
        assert got_days == want_days
        for r in rows:
            i = list(daily.index.date).index(r["day"])
            assert abs(r["cooks_micro"] / 1e6 - d[i]) < 1e-4
            assert abs(r["leverage_micro"] / 1e6 - h[i]) < 1e-4
            want = "influential" if d[i] > 4.0 / n else "typical"
            assert r["flag"] == want
        micros = [r["cooks_micro"] for r in rows]
        assert micros == sorted(micros, reverse=True)


class TestJarqueBera:
    def test_matches_numpy_per_type(self, spark):
        from osmgraft.contract_stats import jarque_bera_normality

        rows = jarque_bera_normality(spark, SF_CORRECT).collect()
        assert len(rows) == 5
        ev = pd.read_parquet(f"{SF_CORRECT}/events.parquet")
        ev["v"] = np.floor(ev["value"].to_numpy() * 100.0)
        for r in rows:
            v = ev.loc[ev["event_type"] == r["event_type"], "v"].to_numpy(
                dtype=np.float64
            )
            assert r["n_obs"] == len(v)
            m = v.mean()
            m2 = np.mean((v - m) ** 2)
            g1 = np.mean((v - m) ** 3) / m2**1.5
            g2 = np.mean((v - m) ** 4) / m2**2 - 3.0
            jb = len(v) / 6.0 * (g1**2 + g2**2 / 4.0)
            assert abs(r["skew_micro"] / 1e6 - g1) < 1e-4
            assert abs(r["exkurt_micro"] / 1e6 - g2) < 1e-4
            assert abs(r["jb_milli"] / 1e3 - jb) < 0.05
            assert r["verdict"] == (
                "reject_normality" if jb > 5.991465 else "consistent"
            )
        # the fixture's value field is uniform-ish, not normal: the
        # platykurtic excess kurtosis must reject on every large group
        assert all(r["verdict"] == "reject_normality" for r in rows)


class TestBrownForsythe:
    def test_matches_numpy(self, spark):
        from osmgraft.contract_stats import brown_forsythe_test

        row = brown_forsythe_test(spark, SF_CORRECT).collect()[0]
        ev = pd.read_parquet(f"{SF_CORRECT}/events.parquet")
        v = np.floor(ev["value"].to_numpy() * 100.0)
        g = ev["event_type"].to_numpy()
        groups = [v[g == k] for k in np.unique(g)]
        z = [np.abs(x - np.median(x)) for x in groups]
        k, nn = len(z), sum(len(x) for x in z)
        zbar = np.concatenate(z).mean()
        ssb = sum(len(x) * (x.mean() - zbar) ** 2 for x in z)
        ssw = sum(np.sum((x - x.mean()) ** 2) for x in z)
        f = (ssb / (k - 1)) / (ssw / (nn - k))
        assert row["k_groups"] == k
        assert row["n_total"] == nn
        assert row["df1"] == k - 1
        assert row["df2"] == nn - k
        assert abs(row["f_micro"] / 1e6 - f) < 1e-3
        assert row["verdict"] == (
            "variances_differ" if f > 2.372 else "homogeneous"
        )


class TestHHI:
    def test_matches_pandas_and_bounds(self, spark):
        from osmgraft.contract_stats import hhi_concentration

        rows = hhi_concentration(spark, SF_CORRECT).collect()
        assert len(rows) == 5
        o = pd.read_parquet(f"{SF_CORRECT}/orders.parquet")
        c = pd.read_parquet(f"{SF_CORRECT}/customer.parquet")
        n = pd.read_parquet(f"{SF_CORRECT}/nation.parquet")
        r = pd.read_parquet(f"{SF_CORRECT}/region.parquet")
        o["cents"] = np.floor(o["o_totalprice"].to_numpy() * 100.0)
        m = (
            o.merge(c, left_on="o_custkey", right_on="c_custkey")
            .merge(n, left_on="c_nationkey", right_on="n_nationkey")
            .merge(r, left_on="n_regionkey", right_on="r_regionkey")
        )
        for row in rows:
            sub = m[m["r_name"] == row["region"]]
            rev = sub.groupby("c_nationkey")["cents"].sum()
            share = rev / rev.sum()
            hhi = 10000.0 * np.sum(share.to_numpy() ** 2)
            assert row["n_nations"] == len(rev)
            assert abs(row["hhi_centipoints"] / 100.0 - hhi) < 0.02
            # equal-share lower bound: HHI >= 10000/k
            assert row["hhi_centipoints"] >= 1_000_000 / row["n_nations"]
            assert row["hhi_centipoints"] <= 1_000_000
            want = (
                "unconcentrated"
                if hhi < 1500
                else "moderately_concentrated"
                if hhi < 2500
                else "highly_concentrated"
            )
            assert row["band"] == want
