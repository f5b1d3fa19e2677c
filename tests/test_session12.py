"""Session-12 operator invariants: sorted-neighborhood linkage, exact
1-D Wasserstein drift, consistent-hash rebalance.

Each test recomputes the operator's semantics through an INDEPENDENT
path (pure Python / pandas) and compares against the distributed query —
the DuckDB oracle pins cross-engine parity; these pin the algorithm.
"""

from __future__ import annotations

import pandas as pd

from osmgraft.contract import QUERIES
from tests.conftest import SF_CORRECT

import osmgraft.contract_mining  # noqa: F401  (registers entries)
from osmgraft.contract_mining import _CH_N, _SNM_W
from osmgraft.contract_select import _PB_FIRST, _PB_LAST


def _names(spark) -> list[str]:
    """Re-synthesise the typo'd-name fixture in pure Python."""
    keys = [
        r.c_custkey
        for r in spark.read.parquet(f"{SF_CORRECT}/customer.parquet")
        .select("c_custkey").collect()
    ]
    out = []
    for k in keys:
        nm = f"{_PB_FIRST[k % 8]} {_PB_LAST[(k // 8) % 8]}"
        if k % 5 == 0:
            nm = nm.replace("e", "a")
        elif k % 7 == 0:
            nm = nm + nm[-1]
        out.append(nm)
    return out


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


# ---------------------------------------------------------------------------
# sorted-neighborhood pairs
# ---------------------------------------------------------------------------


def test_snm_matches_pure_python(spark):
    """Per-lev pair rollup == a sort + sliding-window recompute."""
    distinct = sorted(set(_names(spark)))
    exp: dict[int, list[str]] = {}
    for i, na in enumerate(distinct):
        for j in range(i + 1, min(i + _SNM_W, len(distinct))):
            nb = distinct[j]
            d = _lev(na, nb)
            if d <= 2:
                exp.setdefault(d, []).append(f"{na}|{nb}")
    got = QUERIES["sorted_neighborhood_pairs"](spark, SF_CORRECT).toPandas()
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        pairs = exp[int(r.lev)]
        assert r.n_pairs == len(pairs)
        assert r.example_pair == min(pairs)


def test_snm_catches_doubled_letter_typo(spark):
    """The doubled-final-letter typo class (prefix-preserving) MUST be
    matched by SNM — it's the class phonetic key-equality blocking can
    miss when the doubling changes the consonant skeleton."""
    distinct = sorted(set(_names(spark)))
    doubled = [n for n in distinct if n[-1] == n[-2]]
    assert doubled, "fixture must contain doubled-letter typos"
    got = QUERIES["sorted_neighborhood_pairs"](spark, SF_CORRECT).toPandas()
    # a doubled name sorts immediately after its base -> lev-1 pairs exist
    assert 1 in set(got.lev.astype(int))


# ---------------------------------------------------------------------------
# Wasserstein drift
# ---------------------------------------------------------------------------


def test_wasserstein_matches_pure_python(spark):
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr("event_type", "CAST(FLOOR(value * 100e0) AS BIGINT) vc")
        .toPandas()
    )
    tot = len(ev)
    support = sorted(ev.vc.unique())
    got = QUERIES["wasserstein_value_drift"](spark, SF_CORRECT).toPandas()
    assert sorted(got.event_type) == sorted(ev.event_type.unique())
    for _, r in got.iterrows():
        sub = ev[ev.event_type == r.event_type]
        nt = len(sub)
        assert r.n_events == nt
        tcounts = sub.vc.value_counts().to_dict()
        pcounts = ev.vc.value_counts().to_dict()
        cum_t = cum_p = 0
        w1 = 0
        for v, vnext in zip(support, support[1:]):
            cum_t += tcounts.get(v, 0)
            cum_p += pcounts.get(v, 0)
            f_t = cum_t * 1000000 // nt
            f_p = cum_p * 1000000 // tot
            w1 += abs(f_t - f_p) * (vnext - v)
        assert r.w1_micro_cents == w1
        assert abs(r.w1_value - round(w1 / 1e8, 6)) < 1e-9


def test_wasserstein_zero_for_identical_distribution(spark):
    """W1(pool, pool) == 0: a type whose distribution equals the pool
    would score 0; verified by feeding the pooled counts through the
    same integer-CDF arithmetic."""
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr("CAST(FLOOR(value * 100e0) AS BIGINT) vc")
        .toPandas()
    )
    tot = len(ev)
    support = sorted(ev.vc.unique())
    pcounts = ev.vc.value_counts().to_dict()
    cum = 0
    w1 = 0
    for v, vnext in zip(support, support[1:]):
        cum += pcounts.get(v, 0)
        f = cum * 1000000 // tot
        w1 += abs(f - f) * (vnext - v)
    assert w1 == 0


# ---------------------------------------------------------------------------
# consistent-hash rebalance
# ---------------------------------------------------------------------------


def _rdv_shard(k: int, n: int) -> int:
    ws = [
        ((k * 1103515245 + s * 2654435761 + 12345) % 2147483648) * 16 + s
        for s in range(n)
    ]
    return ws.index(max(ws))


def test_consistent_hash_matches_pure_python(spark):
    keys = sorted(
        r.event_id
        for r in spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .select("event_id").distinct().collect()
    )
    moved_mod = sum(1 for k in keys if k % _CH_N != k % (_CH_N + 1))
    moved_rdv = sum(
        1 for k in keys if _rdv_shard(k, _CH_N) != _rdv_shard(k, _CH_N + 1)
    )
    got = (
        QUERIES["consistent_hash_rebalance"](spark, SF_CORRECT)
        .toPandas().set_index("scheme")
    )
    n = len(keys)
    assert got.loc["mod"].n_keys == n
    assert got.loc["mod"].n_moved == moved_mod
    assert got.loc["mod"].moved_ppm == moved_mod * 1000000 // n
    assert got.loc["rendezvous"].n_moved == moved_rdv
    assert got.loc["rendezvous"].moved_ppm == moved_rdv * 1000000 // n


def test_rendezvous_moves_far_fewer_keys(spark):
    """The operator's raison d'etre: rendezvous churn ~ 1/(N+1), mod
    churn ~ N/(N+1) — rendezvous must move at most a third as many."""
    got = (
        QUERIES["consistent_hash_rebalance"](spark, SF_CORRECT)
        .toPandas().set_index("scheme")
    )
    assert got.loc["rendezvous"].n_moved * 3 < got.loc["mod"].n_moved
    # and rendezvous churn is in the right ballpark (< 2/(N+1))
    assert got.loc["rendezvous"].moved_ppm < 2_000_000 // (_CH_N + 1)
