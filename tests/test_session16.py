"""Invariant tests for the session-16 additions (contract_infer.py).

Oracle parity is covered by tools/parity checks and
test_contract_oracle.py; these pin the statistical identities against an
INDEPENDENT numpy re-computation from the raw parquet — a third engine,
so a shared Spark/DuckDB formula mistake cannot hide.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import SF_CORRECT


def _events() -> pd.DataFrame:
    ev = pd.read_parquet(f"{SF_CORRECT}/events.parquet")
    ev["cents"] = np.floor(ev["value"].to_numpy() * 100.0).astype(np.int64)
    ev["day"] = ev["ts"].dt.normalize()
    return ev


def _daily_cents() -> pd.Series:
    ev = _events()
    return ev.groupby("day")["cents"].sum().sort_index()


class TestMannKendall:
    def test_matches_numpy(self, spark):
        from osmgraft.contract_infer import mann_kendall_trend

        row = mann_kendall_trend(spark, SF_CORRECT).collect()[0]
        y = _daily_cents().to_numpy(dtype=np.int64)
        n = len(y)
        assert row["n_days"] == n
        s = int(np.sign(y[None, :] - y[:, None])[np.triu_indices(n, 1)].sum())
        assert row["s_stat"] == s
        _, counts = np.unique(y, return_counts=True)
        tsum = int(sum(t * (t - 1) * (2 * t + 5) for t in counts if t > 1))
        var18 = n * (n - 1) * (2 * n + 5) - tsum
        assert row["var_s_x18"] == var18
        if s > 0:
            z = (s - 1) / np.sqrt(var18 / 18.0)
        elif s < 0:
            z = (s + 1) / np.sqrt(var18 / 18.0)
        else:
            z = 0.0
        assert abs(row["z_micro"] / 1e6 - z) < 1e-4
        want = (
            ("increasing" if s > 0 else "decreasing")
            if abs(z) > 1.959964
            else "no_trend"
        )
        assert row["verdict"] == want


class TestCrossCorrelationLags:
    def test_matches_numpy(self, spark):
        from osmgraft.contract_infer import cross_correlation_lags

        rows = {
            r["lag"]: r
            for r in cross_correlation_lags(spark, SF_CORRECT).collect()
        }
        ev = _events()
        u = (
            ev[ev.user_id % 2 == 0]
            .groupby("day")["cents"]
            .sum()
            .reindex(sorted(ev["day"].unique()), fill_value=0)
        )
        v = (
            ev[ev.user_id % 2 == 1]
            .groupby("day")["cents"]
            .sum()
            .reindex(sorted(ev["day"].unique()), fill_value=0)
        )
        uu, vv = u.to_numpy(float), v.to_numpy(float)
        best = None
        for lag in range(8):
            # pair u_t with v_{t-lag}
            ua, va = uu[lag:], vv[: len(vv) - lag]
            r = np.corrcoef(ua, va)[0, 1]
            row = rows[lag]
            assert row["n_pairs"] == len(ua)
            assert abs(row["corr_micro"] / 1e6 - r) < 1e-4
            if best is None or abs(row["corr_micro"]) > abs(best):
                best = row["corr_micro"]
        peaks = [r for r in rows.values() if r["is_peak"]]
        assert all(abs(p["corr_micro"]) == abs(best) for p in peaks)
        assert len(peaks) >= 1


class TestTukeyHSD:
    def test_matches_scipy_style_numpy(self, spark):
        from osmgraft.contract_infer import tukey_hsd_pairs

        out = tukey_hsd_pairs(spark, SF_CORRECT).collect()
        assert len(out) == 10  # C(5,2)
        ev = _events()
        groups = {
            k: g["cents"].to_numpy(float)
            for k, g in ev.groupby("event_type")
        }
        keys = sorted(groups)
        nn = sum(len(g) for g in groups.values())
        k = len(keys)
        # per-group within-SS snapped to integer, as the entry does:
        # floor(w/n + 0.5) per group, then the exact integer sum
        sse = sum(
            np.floor(
                (len(g) * (g**2).sum() - g.sum() ** 2) / len(g) + 0.5
            )
            for g in groups.values()
        )
        msw = sse / (nn - k)
        got = {(r["type_a"], r["type_b"]): r for r in out}
        for i in range(k):
            for j in range(i + 1, k):
                a, b = groups[keys[i]], groups[keys[j]]
                diff = a.mean() - b.mean()
                q = abs(diff) / np.sqrt(
                    msw / 2.0 * (1.0 / len(a) + 1.0 / len(b))
                )
                r = got[(keys[i], keys[j])]
                assert abs(r["diff_micro"] / 1e6 - diff) < 1e-3
                assert abs(r["q_micro"] / 1e6 - q) < 1e-3
                assert r["significant"] == bool(q > 3.858)


class TestRidgePath:
    def test_matches_numpy_and_monotone(self, spark):
        from osmgraft.contract_infer import (
            _RIDGE_LAMBDAS,
            ridge_path_daily,
        )

        rows = {r["lambda"]: r for r in ridge_path_daily(spark, SF_CORRECT).collect()}
        y = _daily_cents().to_numpy(dtype=np.float64)
        x = np.arange(len(y), dtype=np.float64)
        n = len(y)
        bnum = n * (x * y).sum() - x.sum() * y.sum()
        bden = n * (x * x).sum() - x.sum() ** 2
        slopes = []
        for lam in _RIDGE_LAMBDAS:
            slope = bnum / (bden + n * lam)
            r = rows[lam]
            assert abs(r["slope_micro"] / 1e6 - slope) < 1e-3
            icpt = (y.sum() - slope * x.sum()) / n
            assert abs(r["intercept_micro"] / 1e6 - icpt) < 1e-2
            shr = (1 - bden / (bden + n * lam)) * 1e4
            assert abs(r["shrinkage_bp"] - shr) < 1.0
            slopes.append(abs(slope))
        # shrinkage: |slope| non-increasing in lambda
        assert all(a >= b - 1e-12 for a, b in zip(slopes, slopes[1:]))


class TestGoodTuring:
    def test_matches_numpy(self, spark):
        from osmgraft.contract_infer import good_turing_smoothing

        rows = {r["r"]: r for r in good_turing_smoothing(spark, SF_CORRECT).collect()}
        assert sorted(rows) == [0, 1, 2, 3, 4, 5]
        docs = pd.read_parquet(f"{SF_CORRECT}/documents.parquet")
        from collections import Counter

        cnt = Counter()
        for text in docs["text"]:
            w = text.split(" ")
            for a, b in zip(w, w[1:]):
                cnt[a + " " + b] += 1
        nr = Counter(cnt.values())
        n_tokens = sum(cnt.values())
        assert rows[0]["n_r"] == n_tokens
        p0 = nr.get(1, 0) / n_tokens
        assert abs(rows[0]["rstar_micro"] / 1e6 - p0) < 1e-5
        for r in range(1, 6):
            assert rows[r]["n_r"] == nr.get(r, 0)
            if nr.get(r, 0):
                rstar = (r + 1) * nr.get(r + 1, 0) / nr[r]
                assert abs(rows[r]["rstar_micro"] / 1e6 - rstar) < 1e-5
            else:
                assert rows[r]["rstar_micro"] == 0

    def test_unseen_mass_positive_on_fixture(self, spark):
        from osmgraft.contract_infer import good_turing_smoothing

        rows = {r["r"]: r for r in good_turing_smoothing(spark, SF_CORRECT).collect()}
        # the bigram corpus has singletons, so GT assigns unseen mass
        assert rows[0]["rstar_micro"] > 0


class TestStdDevEllipse:
    def test_matches_numpy(self, spark):
        from osmgraft.contract_infer import std_dev_ellipse

        out = {r["event_type"]: r for r in std_dev_ellipse(spark, SF_CORRECT).collect()}
        ev = pd.read_parquet(f"{SF_CORRECT}/events.parquet")
        eid = ev["event_id"].to_numpy(np.int64)
        hot = eid % 10 < 3
        px = np.where(
            hot,
            (eid % 787) * 889.45 + 17.3,
            ((eid % 5) * 131071) % 650000 + ((eid // 10) % 100) * 250,
        )
        py = np.where(
            hot,
            (np.floor(eid / 13.0).astype(np.int64) % 787) * 889.45 + 11.7,
            ((eid % 5) * 524287) % 650000 + ((eid // 7) % 100) * 250,
        )
        xi = np.floor(px * 100.0 + 0.5)
        yi = np.floor(py * 100.0 + 0.5)
        df = pd.DataFrame(
            {"t": ev["event_type"].to_numpy(), "x": xi, "y": yi}
        )
        for t, g in df.groupby("t"):
            x, y = g["x"].to_numpy(), g["y"].to_numpy()
            n = len(x)
            r = out[t]
            assert r["n"] == n
            assert abs(r["mean_x_centi"] - np.floor(x.sum() / n + 0.5)) <= 1
            mxx = n * (x * x).sum() - x.sum() ** 2
            myy = n * (y * y).sum() - y.sum() ** 2
            mxy = n * (x * y).sum() - x.sum() * y.sum()
            disc = np.sqrt((mxx - myy) ** 2 + 4 * mxy**2)
            lp, lm = (mxx + myy + disc) / 2, (mxx + myy - disc) / 2
            theta = np.degrees(0.5 * np.arctan2(2 * mxy, mxx - myy))
            assert abs(r["theta_millideg"] / 1e3 - theta) < 1e-2
            smaj = np.sqrt(2 * lp) / n / 100.0
            smin = np.sqrt(2 * lm) / n / 100.0
            assert abs(r["sigma_major_milli"] / 1e3 - smaj) < 0.5
            assert abs(r["sigma_minor_milli"] / 1e3 - smin) < 0.5
            assert r["sigma_major_milli"] >= r["sigma_minor_milli"]
            ecc = np.sqrt(1 - lm / lp)
            assert abs(r["ecc_micro"] / 1e6 - ecc) < 1e-4
