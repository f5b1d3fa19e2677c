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
