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


# ---------------------------------------------------------------------------
# seasonal decomposition
# ---------------------------------------------------------------------------


def test_seasonal_decompose_matches_pure_python(spark):
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) d",
            "CAST(FLOOR(value * 100e0) AS BIGINT) cents",
        )
        .toPandas()
    )
    daily = ev.groupby("d").cents.sum().sort_index()
    days = list(daily.index)
    import math

    det: dict[int, list[int]] = {}
    for i in range(3, len(days) - 3):
        s7 = sum(daily.iloc[i - 3 : i + 4])
        trend = s7 // 7
        dow = (days[i] + 4) % 7
        det.setdefault(dow, []).append(int(daily.iloc[i]) - int(trend))
    got = QUERIES["seasonal_decompose_daily"](spark, SF_CORRECT).toPandas()
    assert len(got) == len(det)
    for _, r in got.iterrows():
        vals = det[int(r.dow)]
        assert r.n_days == len(vals)
        snapped = math.floor(sum(vals) / len(vals) * 1e6 + 0.5)
        assert r.seasonal_cents_micro == snapped


def test_seasonal_components_sum_near_zero(spark):
    """Detrended means over a full seasonal cycle must roughly cancel:
    the weighted sum of per-DOW seasonal components is bounded by the
    MA edge effects, far below the raw daily scale."""
    got = QUERIES["seasonal_decompose_daily"](spark, SF_CORRECT).toPandas()
    weighted = (got.seasonal_cents_micro * got.n_days).sum() / 1e6
    daily_scale = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr("CAST(FLOOR(value * 100e0) AS BIGINT) c").toPandas().c.sum()
        / 365
    )
    assert abs(weighted) < daily_scale  # cancellation within one day's mass


# ---------------------------------------------------------------------------
# NMI / purity
# ---------------------------------------------------------------------------


def test_cluster_nmi_purity_matches_pure_python(spark):
    import math

    import numpy as np

    from osmgraft.ann.search import make_projections

    emb = (
        spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet").toPandas()
    )
    proj = make_projections(64, 4, seed=42)
    mat = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    signs = (mat @ proj.T) > 0
    buckets = signs @ (1 << np.arange(4, dtype=np.int64))
    joint: dict[tuple[int, int], int] = {}
    for b, lab in zip(buckets, emb.label):
        joint[(int(b), int(lab))] = joint.get((int(b), int(lab)), 0) + 1
    n = len(emb)
    nx: dict[int, int] = {}
    ny: dict[int, int] = {}
    for (b, lab), c in joint.items():
        nx[b] = nx.get(b, 0) + c
        ny[lab] = ny.get(lab, 0) + c
    mi = sum(
        math.floor(
            (c / n) * math.log(c * n / (nx[b] * ny[lab])) * 1e9 + 0.5
        )
        for (b, lab), c in joint.items()
    )
    hu = sum(
        math.floor(-(v / n) * math.log(v / n) * 1e9 + 0.5)
        for v in nx.values()
    )
    hv = sum(
        math.floor(-(v / n) * math.log(v / n) * 1e9 + 0.5)
        for v in ny.values()
    )
    pur = sum(
        max(c for (b2, _), c in joint.items() if b2 == b) for b in nx
    )
    got = QUERIES["cluster_nmi_purity"](spark, SF_CORRECT).toPandas().iloc[0]
    assert got.n_vecs == n
    assert got.n_buckets == len(nx)
    assert got.n_labels == len(ny)
    assert got.purity_ppm == pur * 1000000 // n
    assert got.mi_nano == mi
    assert abs(got.nmi - round(mi / math.sqrt(hu * hv), 6)) < 1e-9
    # NMI is a [0,1] score; random 4-bit buckets vs labels stay low
    assert 0.0 <= got.nmi <= 1.0


# ---------------------------------------------------------------------------
# interarrival exponential fit
# ---------------------------------------------------------------------------


def test_interarrival_fit_matches_pure_python(spark):
    import math

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "user_id", "event_type", "event_id",
            "CAST(unix_timestamp(ts) AS BIGINT) es",
        )
        .toPandas()
    )
    got = QUERIES["interarrival_exp_fit"](spark, SF_CORRECT).toPandas()
    for _, r in got.iterrows():
        sub = ev[ev.event_type == r.event_type].sort_values(
            ["user_id", "es", "event_id"]
        )
        gaps = []
        for _, g in sub.groupby("user_id"):
            es = list(g.es)
            gaps += [b - a for a, b in zip(es, es[1:])]
        n, s = len(gaps), sum(gaps)
        assert (r.n_gaps, r.sum_gap_s) == (n, s)
        assert r.lambda_nano == n * 1000000000 // s
        # KS via hour bins
        from collections import Counter

        bins = Counter(g // 3600 for g in gaps)
        cum = 0
        ks = 0
        for b in sorted(bins):
            cum += bins[b]
            emp = cum * 1000000 // n
            model = math.floor(
                (1.0 - math.exp(-(n * 3600.0 * (b + 1)) / s)) * 1e6 + 0.5
            )
            ks = max(ks, abs(emp - model))
        assert r.ks_micro == ks


# ---------------------------------------------------------------------------
# bloom FPR audit
# ---------------------------------------------------------------------------


def test_bloom_fpr_matches_pure_python(spark):
    from osmgraft.contract_mining import _BF_HASHES, _BF_K, _BF_M, _BF_P

    ids = [
        r.doc_id
        for r in spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select("doc_id").collect()
    ]

    def pos(k):
        return {((k * a + b) % _BF_P) % _BF_M for a, b in _BF_HASHES}

    members = [k for k in ids if k % 2 == 0]
    probes = [k for k in ids if k % 2 == 1]
    bits = set()
    for k in members:
        bits |= pos(k)
    fp = sum(1 for k in probes if pos(k) <= bits)
    got = QUERIES["bloom_fpr_audit"](spark, SF_CORRECT).toPandas().iloc[0]
    assert got.n_members == len(members)
    assert got.n_probes == len(probes)
    assert got.n_bits_set == len(bits)
    assert got.observed_fpr_ppm == fp * 1000000 // len(probes)
    # observed must sit near the fill-ratio prediction (rho^k), within
    # a generous binomial tolerance at this probe count
    import math

    rho = len(bits) / _BF_M
    theo = math.floor(rho ** _BF_K * 1e6 + 0.5)
    assert got.theoretical_fpr_ppm == theo
    sigma = math.sqrt(theo / 1e6 * (1 - theo / 1e6) / len(probes)) * 1e6
    assert abs(got.observed_fpr_ppm - theo) < 5 * sigma + 2000


# ---------------------------------------------------------------------------
# SLO burn alerts
# ---------------------------------------------------------------------------


def test_slo_burn_matches_pure_python(spark):
    from collections import defaultdict

    from osmgraft.contract_mining import _SLO_FAST, _SLO_PPM, _SLO_SLOW

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "CAST(unix_timestamp(ts) AS BIGINT) div 3600 hr",
            "CASE WHEN event_type = 'error' THEN 1 ELSE 0 END e",
        )
        .toPandas()
    )
    hourly_n = defaultdict(int)
    hourly_e = defaultdict(int)
    for _, r in ev.iterrows():
        hourly_n[r.hr] += 1
        hourly_e[r.hr] += r.e
    long_n = defaultdict(int)
    long_e = defaultdict(int)
    for h in hourly_n:
        long_n[h // 6] += hourly_n[h]
        long_e[h // 6] += hourly_e[h]
    exp = {}
    for h in hourly_n:
        sp = hourly_e[h] * 1000000 // hourly_n[h]
        lp = long_e[h // 6] * 1000000 // long_n[h // 6]
        fast, slow = _SLO_FAST * _SLO_PPM, _SLO_SLOW * _SLO_PPM
        if sp > fast or lp > slow:
            exp[h] = (
                hourly_n[h], sp, lp,
                "page" if (sp > fast and lp > slow) else "ticket",
            )
    got = QUERIES["slo_burn_alerts"](spark, SF_CORRECT).toPandas()
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        n, sp, lp, sev = exp[r.hr]
        assert (r.n_events, r.short_ppm, r.long_ppm, r.severity) == (
            n, sp, lp, sev,
        )


# ---------------------------------------------------------------------------
# Simpson's paradox audit
# ---------------------------------------------------------------------------


def test_simpson_audit_matches_pure_python(spark):
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "(CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INT) + 4) % 7 dow",
            "user_id % 2 grp",
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END conv",
        )
        .toPandas()
    )

    def rate(sub):
        return int(sub.conv.sum()) * 1000000 // len(sub)

    overall_diff = rate(ev[ev.grp == 1]) - rate(ev[ev.grp == 0])
    got = QUERIES["simpson_paradox_audit"](spark, SF_CORRECT).toPandas()
    assert len(got) == 7
    for _, r in got.iterrows():
        s = ev[ev.dow == r.dow]
        rt, rc = rate(s[s.grp == 1]), rate(s[s.grp == 0])
        assert (r.rate_treat_ppm, r.rate_ctrl_ppm) == (rt, rc)
        assert r.diff_ppm == rt - rc
        assert r.overall_diff_ppm == overall_diff
        assert r.sign_reversed == (1 if (rt - rc) * overall_diff < 0 else 0)


# ---------------------------------------------------------------------------
# Haar wavelet energy
# ---------------------------------------------------------------------------


def test_haar_energy_matches_pure_python(spark):
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) d",
            "CAST(FLOOR(value * 100e0) AS BIGINT) cents",
        )
        .toPandas()
    )
    daily = ev.groupby("d").cents.sum().sort_index()
    n = len(daily)
    L = 1
    while L * 2 <= n:
        L *= 2
    a = [int(v) for v in daily.iloc[:L]]
    energies = []
    for _lv in range(4):
        nxt, det = [], []
        for i in range(0, len(a), 2):
            nxt.append(a[i] + a[i + 1])
            det.append(a[i] - a[i + 1])
        energies.append(sum(x * x for x in det))
        a = nxt
    total_scaled = sum(
        e * (1 << (4 - lv)) for lv, e in enumerate(energies, start=1)
    )
    got = QUERIES["haar_wavelet_energy"](spark, SF_CORRECT).toPandas()
    assert list(got.level) == [1, 2, 3, 4]
    for lv, e in enumerate(energies, start=1):
        r = got[got.level == lv].iloc[0]
        assert r.n_coeffs == L // (1 << lv)
        assert r.share_ppm == e * (1 << (4 - lv)) * 1000000 // total_scaled
        assert abs(r.energy - round(e / (1 << lv), 4)) < 1e-6


def test_haar_energy_conserves_total_variance(spark):
    """Parseval sanity: orthonormal detail energies + final approx
    energy == series energy (checked in pure Python on the same
    series the query consumed)."""
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) d",
            "CAST(FLOOR(value * 100e0) AS BIGINT) cents",
        )
        .toPandas()
    )
    daily = ev.groupby("d").cents.sum().sort_index()
    n = len(daily)
    L = 1
    while L * 2 <= n:
        L *= 2
    a = [int(v) for v in daily.iloc[:L]]
    total = sum(x * x for x in a)
    acc = 0
    for lv in range(1, 5):
        nxt, det = [], []
        for i in range(0, len(a), 2):
            nxt.append(a[i] + a[i + 1])
            det.append(a[i] - a[i + 1])
        acc += sum(x * x for x in det) / (1 << lv)
        a = nxt
    acc += sum(x * x for x in a) / (1 << 4)
    assert abs(acc - total) < 1e-6 * total


# ---------------------------------------------------------------------------
# Markov removal-effect attribution
# ---------------------------------------------------------------------------


def test_markov_removal_matches_pure_python(spark):
    from collections import defaultdict

    from osmgraft.contract_mining import _MR_CHANNELS, _MR_ROUNDS

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "user_id", "event_type et", "event_id",
            "CAST(unix_timestamp(ts) AS BIGINT) es",
        )
        .toPandas()
        .sort_values(["user_id", "es", "event_id"])
    )
    trans = defaultdict(int)
    for _, g in ev.groupby("user_id"):
        ets = list(g.et)
        try:
            cut = ets.index("purchase") + 1
        except ValueError:
            cut = None
        seq = ets[:cut] if cut else ets
        mapped = ["conv" if e == "purchase" else e for e in seq]
        trans[("start", mapped[0])] += 1
        for a, b in zip(mapped, mapped[1:]):
            trans[(a, b)] += 1
        if cut is None:
            trans[(mapped[-1], "null")] += 1
    out = defaultdict(int)
    for (s, _), c in trans.items():
        out[s] += c
    p = {(s, d): c * 1000000 // out[s] for (s, d), c in trans.items()}

    def run_chain(pm):
        states = {s for s, _ in pm}
        v = {s: 0 for s in states}
        for _ in range(_MR_ROUNDS):
            nv = {}
            for s in states:
                acc = 0
                for (src, dst), pp in pm.items():
                    if src != s:
                        continue
                    val = (
                        1000000 if dst == "conv"
                        else 0 if dst == "null" else v.get(dst, 0)
                    )
                    acc += pp * val
                nv[s] = acc // 1000000
            v = nv
        return v["start"]

    pb = run_chain(p)
    effects = {}
    removed = {}
    for ch in _MR_CHANNELS:
        pm = defaultdict(int)
        for (s, d), pp in p.items():
            if s == ch:
                continue
            pm[(s, "null" if d == ch else d)] += pp
        pc = run_chain(dict(pm))
        removed[ch] = pc
        effects[ch] = max(pb - pc, 0)
    te = sum(effects.values())
    got = QUERIES["markov_removal_attribution"](spark, SF_CORRECT).toPandas()
    assert len(got) == len(_MR_CHANNELS)
    for _, r in got.iterrows():
        assert r.p_base_micro == pb
        assert r.p_removed_micro == removed[r.channel]
        assert r.removal_effect_micro == effects[r.channel]
        assert r.attribution_ppm == effects[r.channel] * 1000000 // te


def test_markov_removal_effects_are_nonnegative_and_normalized(spark):
    got = QUERIES["markov_removal_attribution"](spark, SF_CORRECT).toPandas()
    assert (got.removal_effect_micro >= 0).all()
    assert (got.p_removed_micro <= got.p_base_micro).all()
    # shares sum to ~1e6 (floor-division slack below one ppm per channel)
    assert 1000000 - len(got) <= got.attribution_ppm.sum() <= 1000000


# ---------------------------------------------------------------------------
# term burstiness
# ---------------------------------------------------------------------------


def test_term_burstiness_matches_pure_python(spark):
    from collections import Counter, defaultdict

    docs = (
        spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select("doc_id", "text").toPandas()
    )
    nd = docs.doc_id.nunique()
    per_term_doc = defaultdict(Counter)
    for _, r in docs.iterrows():
        for w, c in Counter(r.text.split(" ")).items():
            per_term_doc[w][r.doc_id] = c
    rows = []
    for w, cnts in per_term_doc.items():
        df = len(cnts)
        if df < 50:
            continue
        tot = sum(cnts.values())
        s2 = sum(c * c for c in cnts.values())
        fano = (nd * s2 - tot * tot) * 1000000 // (nd * tot)
        rows.append((w, df, tot, fano))
    rows.sort(key=lambda r: (-r[3], r[0]))
    exp = rows[:15]
    got = QUERIES["term_burstiness"](spark, SF_CORRECT).toPandas()
    assert [
        (r.term, r.df, r.total_count, r.fano_micro)
        for _, r in got.iterrows()
    ] == exp
    # the algebraic zero-inclusion identity: Fano recomputed naively
    # over the FULL zero-padded vector agrees for the top term
    w0 = exp[0][0]
    full = [per_term_doc[w0].get(d, 0) for d in docs.doc_id]
    mean = sum(full) / nd
    var = sum((c - mean) ** 2 for c in full) / nd
    assert abs(exp[0][3] / 1e6 - var / mean) < 2e-6 + 1e-9 * abs(var / mean)


# ---------------------------------------------------------------------------
# randomized response
# ---------------------------------------------------------------------------


def test_randomized_response_matches_pure_python(spark):
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "user_id", "CAST(FLOOR(value * 100e0) AS BIGINT) cents"
        ).toPandas()
    )
    truth = {}
    for uid, g in ev.groupby("user_id"):
        truth[uid] = 1 if g.cents.sum() > 4900 * len(g) else 0
    n = len(truth)
    assert 0 < sum(truth.values()) < n  # the bit must be non-degenerate

    def ans(uid):
        c1 = ((uid * 2654435761 + 97) % 2147483647) % 4
        if c1 < 3:
            return truth[uid]
        return ((uid * 1103515245 + 12345) % 2147483647) % 2

    flips = [u for u in truth if ((u * 2654435761 + 97) % 2147483647) % 4 == 3]
    assert flips and len(set(
        ((u * 1103515245 + 12345) % 2147483647) % 2 for u in flips
    )) == 2  # both coin outcomes occur among the liars

    true_ppm = sum(truth.values()) * 1000000 // n
    obs_ppm = sum(ans(u) for u in truth) * 1000000 // n
    est = (obs_ppm - 125000) * 4 // 3
    got = QUERIES["randomized_response_estimate"](spark, SF_CORRECT)
    r = got.toPandas().iloc[0]
    assert (r.n_users, r.true_ppm, r.observed_ppm) == (n, true_ppm, obs_ppm)
    assert r.estimated_ppm == est
    assert r.abs_err_ppm == abs(est - true_ppm)
    import math

    assert r.epsilon_nano == math.floor(math.log(7.0) * 1e9 + 0.5)
    # the mechanism actually perturbed individual responses, and the
    # de-biased estimate lands within 5 sigma of truth
    # (sigma_est <= 4/3 * 1/(2 sqrt n))
    assert any(ans(u) != truth[u] for u in truth)
    sigma_est = 4 / 3 * 0.5 / (n ** 0.5) * 1e6
    assert abs(est - true_ppm) < 5 * sigma_est


# ---------------------------------------------------------------------------
# Gumbel block maxima
# ---------------------------------------------------------------------------


def test_gumbel_fit_matches_pure_python(spark):
    import math

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) d",
            "CAST(FLOOR(value * 100e0) AS BIGINT) cents",
        )
        .toPandas()
    )
    daily = ev.groupby("d").cents.sum()
    weeks = {}
    for d, c in daily.items():
        weeks.setdefault(d // 7, []).append(c)
    mx = [max(v) for v in weeks.values() if len(v) == 7]
    n = len(mx)
    s1, s2 = sum(mx), sum(int(x) * int(x) for x in mx)
    mean = s1 * 1.0 / n
    sd = math.sqrt((s2 * 1.0 - s1 * 1.0 * s1 / n) / (n - 1))
    beta = sd / 1.282549830162
    mu = mean - 0.577215664902 * beta
    got = QUERIES["gumbel_block_maxima"](spark, SF_CORRECT).toPandas()
    assert list(got.return_period_weeks) == [4, 13, 52, 104]
    for _, r in got.iterrows():
        assert r.n_blocks == n
        assert r.mu_cents == math.floor(mu + 0.5)
        assert r.beta_cents == math.floor(beta + 0.5)
        T = r.return_period_weeks
        rl = mu - beta * math.log(-math.log(1.0 - 1.0 / T))
        assert r.return_level_cents == math.floor(rl + 0.5)
    # return levels grow with the return period and exceed the mean max
    rls = list(got.return_level_cents)
    assert rls == sorted(rls) and rls[0] > mean


# ---------------------------------------------------------------------------
# SPRT trajectory
# ---------------------------------------------------------------------------


def test_sprt_matches_pure_python(spark):
    import math

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) d",
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END x",
        )
        .toPandas()
    )
    g = ev.groupby("d").agg(n=("x", "size"), x=("x", "sum")).sort_index()
    l1 = math.floor(math.log(11.0 / 9.0) * 1e9 + 0.5)
    l0 = math.floor(math.log(39.0 / 41.0) * 1e9 - 0.5)
    bound = math.floor(math.log(19.0) * 1e9 + 0.5)
    got = QUERIES["sprt_trajectory"](spark, SF_CORRECT).toPandas()
    assert len(got) == len(g)
    llr = cn = cx = 0
    by_day = {int(r.day): r for _, r in got.iterrows()}
    for d, row in g.iterrows():
        llr += int(row.x) * l1 + int(row.n - row.x) * l0
        cn += int(row.n)
        cx += int(row.x)
        r = by_day[int(d)]
        assert (r.cum_n, r.cum_x, r.llr_nano) == (cn, cx, llr)
        exp_dec = (
            "accept_h1" if llr >= bound
            else "accept_h0" if llr <= -bound else "continue"
        )
        assert r.decision == exp_dec
    # the fixture's ~20% conversion rate must eventually decide
    assert got.iloc[-1].decision in ("accept_h0", "accept_h1")


# ---------------------------------------------------------------------------
# Qini uplift curve
# ---------------------------------------------------------------------------


def test_qini_matches_pure_python(spark):
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "user_id % 2 treat", "(user_id div 2) % 16 seg",
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END conv",
        )
        .toPandas()
    )
    segs = []
    for seg, g in ev.groupby("seg"):
        tr, ct = g[g.treat == 1], g[g.treat == 0]
        up = (
            int(tr.conv.sum()) * 1000000 // len(tr)
            - int(ct.conv.sum()) * 1000000 // len(ct)
        )
        segs.append(
            (seg, up, int(tr.conv.sum()), len(tr), int(ct.conv.sum()), len(ct))
        )
    segs.sort(key=lambda r: (-r[1], r[0]))
    got = QUERIES["qini_uplift_curve"](spark, SF_CORRECT).toPandas()
    assert len(got) == 16
    cx_t = cn_t = cx_c = cn_c = 0
    for rk, (seg, up, xt, nt, xc, nc) in enumerate(segs, start=1):
        cx_t, cn_t, cx_c, cn_c = cx_t + xt, cn_t + nt, cx_c + xc, cn_c + nc
        r = got[got["rank"] == rk].iloc[0]
        assert (r.seg, r.uplift_ppm) == (seg, up)
        assert r.qini_cum == cx_t - cx_c * cn_t // cn_c
    # segments are ranked by decreasing observed uplift
    ups = list(got.uplift_ppm)
    assert ups == sorted(ups, reverse=True)


# ---------------------------------------------------------------------------
# tail dependence
# ---------------------------------------------------------------------------


def test_tail_dependence_matches_pure_python(spark):
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) d",
            "CASE WHEN event_type = 'click' THEN 1 ELSE 0 END cx",
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END cy",
        )
        .toPandas()
    )
    g = ev.groupby("d").agg(x=("cx", "sum"), y=("cy", "sum"))
    n = len(g)
    days = list(g.index)
    rkx = {
        d: i + 1
        for i, (_, _, d) in enumerate(
            sorted((g.loc[d].x, d, d) for d in days)
        )
    }
    rky = {
        d: i + 1
        for i, (_, _, d) in enumerate(
            sorted((g.loc[d].y, d, d) for d in days)
        )
    }
    ux = {d for d in days if rkx[d] * 5 > n * 4}
    uy = {d for d in days if rky[d] * 5 > n * 4}
    lx = {d for d in days if rkx[d] * 5 <= n}
    ly = {d for d in days if rky[d] * 5 <= n}
    got = QUERIES["tail_dependence_daily"](spark, SF_CORRECT).toPandas().iloc[0]
    assert got.n_days == n
    assert got.n_upper == len(uy)
    assert got.n_upper_joint == len(ux & uy)
    assert got.lambda_upper_ppm == len(ux & uy) * 1000000 // len(uy)
    assert got.lambda_lower_ppm == len(lx & ly) * 1000000 // len(ly)
    # coefficients are probabilities
    assert 0 <= got.lambda_upper_ppm <= 1000000
    assert 0 <= got.lambda_lower_ppm <= 1000000


# ---------------------------------------------------------------------------
# Lindley queue waits
# ---------------------------------------------------------------------------


def test_lindley_matches_sequential_recursion(spark):
    """The closed form (prefix sum minus running min) must equal the
    textbook SEQUENTIAL recursion W_{k} = max(0, W_{k-1} + S_{k-1} - A_k)
    replayed in pure Python."""
    svc = {"purchase": 900, "signup": 600, "error": 120, "click": 180,
           "view": 240}
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "user_id", "event_type", "event_id",
            "CAST(unix_timestamp(ts) AS BIGINT) es",
        )
        .toPandas()
        .sort_values(["user_id", "es", "event_id"])
    )
    from collections import defaultdict

    waits = defaultdict(list)
    for _, g in ev.groupby("user_id"):
        rows = list(g.itertuples())
        w = 0
        waits[rows[0].event_type].append(0)
        for prev, cur in zip(rows, rows[1:]):
            a = cur.es - prev.es
            w = max(0, w + svc[prev.event_type] - a)
            waits[cur.event_type].append(w)
    got = QUERIES["queue_wait_lindley"](spark, SF_CORRECT).toPandas()
    assert sorted(got.event_type) == sorted(waits)
    for _, r in got.iterrows():
        ws = waits[r.event_type]
        assert r.n_jobs == len(ws)
        assert r.waiting_ppm == sum(1 for w in ws if w > 0) * 1000000 // len(ws)
        assert r.mean_wait_s == sum(ws) // len(ws)
        assert r.max_wait_s == max(ws)


# ---------------------------------------------------------------------------
# POT / GPD fit
# ---------------------------------------------------------------------------


def test_pot_gpd_matches_pure_python(spark):
    import math

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) d",
            "CAST(FLOOR(value * 100e0) AS BIGINT) cents",
        )
        .toPandas()
    )
    daily = sorted(ev.groupby("d").cents.sum())
    n = len(daily)
    top = [c for r, c in enumerate(sorted(daily), start=1) if r * 5 > n * 4]
    u = min(top)
    y = [c - u for c in daily if c > u]
    k = len(y)
    s1, s2 = sum(y), sum(v * v for v in y)
    m = s1 / k
    v = (s2 - s1 * s1 / k) / (k - 1)
    xi = 0.5 * (m * m / v - 1.0)
    beta = 0.5 * m * (m * m / v + 1.0)
    got = QUERIES["peak_over_threshold_gpd"](spark, SF_CORRECT).toPandas()
    r = got.iloc[0]
    assert (r.n_days, r.n_exceedances, r.threshold_cents) == (n, k, u)
    assert r.xi_micro == math.floor(xi * 1e6 + 0.5)
    assert r.beta_cents == math.floor(beta + 0.5)
    # method-of-moments GPD: the scale must be positive and the shape
    # inside the valid support (xi > -1); with only ~n/5 exceedances the
    # estimator is noisy, so no tighter bound is pinned at this SF
    assert r.beta_cents > 0
    assert r.xi_micro > -1000000


# ---------------------------------------------------------------------------
# regression discontinuity
# ---------------------------------------------------------------------------


def test_rdd_matches_pure_python(spark):
    import math

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "CAST(FLOOR(value * 100e0) AS BIGINT) cents",
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END conv",
        )
        .toPandas()
    )
    cut, bw, binw = 25000, 10000, 500
    sub = ev[(ev.cents >= cut - bw) & (ev.cents <= cut + bw - 1)].copy()
    sub["xc"] = sub.cents - cut

    def fit(side_rows):
        pts = []
        for b, g in side_rows.groupby("bin"):
            xb = b * binw + binw // 2
            yb = int(g.conv.sum()) * 1000000 // len(g)
            pts.append((xb, yb))
        m = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        sxy = sum(x * y for x, y in pts)
        slope = (m * sxy - sx * sy) / (m * sxx - sx * sx)
        icept = (sy - slope * sx) / m
        return slope, icept

    left = sub[sub.xc < 0].copy()
    left["bin"] = (left.xc - (binw - 1)) // binw
    # Python // floors; Spark div truncates toward zero — the operator
    # pre-offsets negatives so both agree; replicate with trunc here
    left["bin"] = ((left.xc - (binw - 1)) / binw).astype(int)
    right = sub[sub.xc >= 0].copy()
    right["bin"] = (right.xc / binw).astype(int)
    sl, il = fit(left)
    sr, ir = fit(right)
    got = QUERIES["regression_discontinuity"](spark, SF_CORRECT).toPandas()
    r = got.iloc[0]
    assert r.limit_right_ppm == math.floor(ir + 0.5)
    assert r.limit_left_ppm == math.floor(il + 0.5)
    assert r.jump_ppm == math.floor(ir - il + 0.5)
    assert r.slope_right_nano == math.floor(sr * 1e6 + 0.5)
    assert r.slope_left_nano == math.floor(sl * 1e6 + 0.5)
    # placebo calibration: the fixture has no true discontinuity at the
    # cutoff — the jump must be small relative to the base rate
    assert abs(r.jump_ppm) < 200000


# ---------------------------------------------------------------------------
# hard-negative mining
# ---------------------------------------------------------------------------


def test_hard_negative_mining_matches_pure_python(spark):
    import math

    import numpy as np

    from osmgraft.ann.search import make_projections

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet").toPandas()
    proj = make_projections(64, 4, seed=42)
    mat = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    buckets = ((mat @ proj.T) > 0) @ (1 << np.arange(4, dtype=np.int64))
    ids = list(emb.vec_id)
    labels = list(emb.label)

    def cos_nano(i, j):
        # replicate the engines' LEFT-TO-RIGHT fold exactly
        d = nx = ny = 0.0
        for a, b in zip(mat[i], mat[j]):
            d += a * b
        for a in mat[i]:
            nx += a * a
        for b in mat[j]:
            ny += b * b
        return math.floor(d / (math.sqrt(nx) * math.sqrt(ny)) * 1e9)

    hard = {}
    for i, aid in enumerate(ids):
        if aid % 7 != 0:
            continue
        best = None
        for j, nid in enumerate(ids):
            if labels[j] == labels[i] or buckets[j] != buckets[i]:
                continue
            c = cos_nano(i, j)
            if best is None or c > best[0] or (c == best[0] and nid < best[1]):
                best = (c, nid)
        if best:
            hard[aid] = best
    from collections import defaultdict

    bands = defaultdict(list)
    for aid, (c, nid) in hard.items():
        bands[c // 100000000].append((c, f"{aid}>{nid}"))
    got = QUERIES["hard_negative_mining"](spark, SF_CORRECT).toPandas()
    assert len(got) == len(bands)
    for _, r in got.iterrows():
        rows = bands[r.cos_band]
        assert r.n_anchors == len(rows)
        assert r.max_cos_nano == max(c for c, _ in rows)
        assert r.example_pair == min(p for _, p in rows)


# ---------------------------------------------------------------------------
# policy replay
# ---------------------------------------------------------------------------


def test_policy_replay_matches_pure_python(spark):
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "(CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INT) + 4) % 7 ctx",
            "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) d",
            "event_id % 4 arm",
            "CASE WHEN value > 100e0 THEN 1 ELSE 0 END r",
        )
        .toPandas()
    )
    cut = ev.d.min() + 15
    train, test = ev[ev.d < cut], ev[ev.d >= cut]
    pol = {}
    for ctx, g in train.groupby("ctx"):
        best = None
        for arm, ga in g.groupby("arm"):
            v = int(ga.r.sum()) * 1000000 // len(ga)
            if best is None or v > best[0] or (v == best[0] and arm < best[1]):
                best = (v, arm)
        pol[ctx] = best[1]
    got = QUERIES["policy_replay_eval"](spark, SF_CORRECT).toPandas()
    assert len(got) == len(pol)
    for _, r in got.iterrows():
        sub = test[test.ctx == r.ctx]
        m = sub[sub.arm == pol[r.ctx]]
        assert r.chosen_arm == pol[r.ctx]
        assert (r.n_logged, r.n_matched) == (len(sub), len(m))
        rv = int(m.r.sum()) * 1000000 // len(m)
        lv = int(sub.r.sum()) * 1000000 // len(sub)
        assert (r.replay_value_ppm, r.logged_value_ppm) == (rv, lv)
        assert r.lift_ppm == rv - lv
    # the logged policy is uniform: matched share ~ 1/4 per context
    share = got.n_matched.sum() / got.n_logged.sum()
    assert 0.15 < share < 0.35


# ---------------------------------------------------------------------------
# training cartography
# ---------------------------------------------------------------------------


def test_training_cartography_matches_pure_python(spark):
    docs = (
        spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select("doc_id", "text", "n_chars").toPandas()
    )
    feats = []
    for _, r in docs.iterrows():
        x1 = int(r.n_chars) // 64
        x2 = (len(r.text) - len(r.text.replace("spark", ""))) // 5
        y = 1 if x2 >= 4 else 0
        feats.append((x1, x2, y))
    n = len(feats)
    denom = n * 2

    def trunc_div(a, b):
        return a // b if a >= 0 else -((-a) // b)

    w1 = w2 = b = 0
    weights = []
    for _ in range(8):
        g1 = g2 = g0 = 0
        for x1, x2, y in feats:
            p = min(1000000, max(0, 500000 + trunc_div(
                w1 * x1 + w2 * x2 + b, 4)))
            e = p - y * 1000000
            g1 += e * x1
            g2 += e * x2
            g0 += e
        w1 -= trunc_div(g1, denom)
        w2 -= trunc_div(g2, denom)
        b -= trunc_div(g0, denom)
        weights.append((w1, w2, b))
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0, 0])
    for x1, x2, y in feats:
        qv = []
        for a1, a2, a0 in weights:
            p = min(1000000, max(0, 500000 + trunc_div(
                a1 * x1 + a2 * x2 + a0, 4)))
            qv.append(p if y == 1 else 1000000 - p)
        s = sum(qv)
        var = sum((8 * q - s) ** 2 for q in qv)
        region = (
            "ambiguous" if var >= 11520000000000
            else "easy" if s >= 8 * 700000 else "hard"
        )
        agg[region][0] += 1
        agg[region][1] += s
        agg[region][2] += var
    got = QUERIES["training_cartography"](spark, SF_CORRECT).toPandas()
    assert len(got) == len(agg)
    for _, r in got.iterrows():
        cnt, s, var = agg[r.region]
        assert r.n_docs == cnt
        assert r.mean_conf_micro == s // (cnt * 8)
        assert r.mean_var_scaled == var // cnt


# ---------------------------------------------------------------------------
# power analysis
# ---------------------------------------------------------------------------


def test_power_analysis_matches_pure_python(spark):
    import math

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "user_id % 2 arm",
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END conv",
        )
        .toPandas()
    )
    n_arm = len(ev[ev.arm == 0])
    p_ppm = int(ev.conv.sum()) * 1000000 // len(ev)
    za, zb = 1.959964, 0.841621
    got = QUERIES["power_analysis_mde"](spark, SF_CORRECT).toPandas()
    assert list(got.mde_ppm) == [10000, 20000, 50000, 100000]
    for _, r in got.iterrows():
        p1 = p_ppm * 1e-6
        p2 = p1 + r.mde_ppm * 1e-6
        pbar = (p1 + p2) / 2
        nreq = math.ceil(
            (za * math.sqrt(2 * pbar * (1 - pbar))
             + zb * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2))) ** 2
            / ((p2 - p1) ** 2)
        )
        assert r.p_base_ppm == p_ppm
        assert r.n_per_arm_available == n_arm
        assert r.n_required == nreq
        assert r.sample_ratio_ppm == n_arm * 1000000 // nreq
    # required n shrinks as MDE grows (quadratically)
    ns = list(got.sort_values("mde_ppm").n_required)
    assert ns == sorted(ns, reverse=True)


# ---------------------------------------------------------------------------
# rebalance plan
# ---------------------------------------------------------------------------


def test_rebalance_plan_matches_pure_python(spark):
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr("user_id % 16 pid").toPandas()
    )
    sizes = ev.pid.value_counts().to_dict()
    total = len(ev)
    got = QUERIES["rebalance_move_plan"](spark, SF_CORRECT).toPandas()
    assert len(got) == len(sizes)
    cum = 0
    moved = sum(
        abs(sum(sizes.get(j, 0) * 16 - total for j in range(p + 1)))
        for p in sorted(sizes)
    ) // 16
    for _, r in got.sort_values("pid").iterrows():
        s = sizes[r.pid] * 16 - total
        cum += s
        assert r.n_rows == sizes[r.pid]
        assert r.surplus_x16 == s
        assert r.transfer_right_x16 == cum
        assert r.total_moved_rows == moved
    # conservation: surpluses sum to zero, final boundary flow is zero
    assert got.surplus_x16.sum() == 0
    assert got.sort_values("pid").iloc[-1].transfer_right_x16 == 0


# ---------------------------------------------------------------------------
# discounted LTV
# ---------------------------------------------------------------------------


def test_ltv_matches_pure_python(spark):
    import math

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "user_id",
            "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) div 7 wk",
            "CAST(FLOOR(value * 100e0) AS BIGINT) cents",
        )
        .toPandas()
    )
    first = ev.groupby("user_id").wk.min().to_dict()
    from collections import defaultdict

    cohort_users = defaultdict(set)
    cents = defaultdict(int)
    for _, r in ev.iterrows():
        cw = first[r.user_id]
        cohort_users[cw].add(r.user_id)
        cents[(cw, r.wk - cw)] += r.cents
    got = QUERIES["ltv_discounted"](spark, SF_CORRECT).toPandas()
    assert len(got) == len(cohort_users)
    for _, r in got.iterrows():
        nu = len(cohort_users[r.cohort_wk])
        hs = [h for (cw, h) in cents if cw == r.cohort_wk]
        ltv = sum(
            math.floor(
                cents[(r.cohort_wk, h)] / nu * (0.99 ** h) + 0.5
            )
            for h in hs
        )
        assert (r.n_users, r.n_horizons) == (nu, len(hs))
        assert r.ltv_cents_per_user == ltv
    # discounting can only reduce value vs the undiscounted ledger
    raw = sum(cents.values()) // sum(len(v) for v in cohort_users.values())
    assert (got.ltv_cents_per_user <= raw + 1).all()


# ---------------------------------------------------------------------------
# metric change decomposition
# ---------------------------------------------------------------------------


def test_metric_decomposition_identity_and_recompute(spark):
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "event_type",
            "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) d",
            "CAST(FLOOR(value * 100e0) AS BIGINT) cents",
        )
        .toPandas()
    )
    mid2 = int(ev.d.min()) + int(ev.d.max()) + 1
    ev["period"] = (ev.d * 2 < mid2).map({True: 1, False: 2})
    tot = ev.period.value_counts().to_dict()
    got = QUERIES["metric_change_decomposition"](spark, SF_CORRECT).toPandas()
    assert len(got) == ev.event_type.nunique()
    total_delta = 0
    exp_delta = 0
    for _, r in got.iterrows():
        sub = ev[ev.event_type == r.event_type]
        s1, s2 = sub[sub.period == 1], sub[sub.period == 2]
        w1 = len(s1) * 1000000 // tot[1]
        w2 = len(s2) * 1000000 // tot[2]
        r1 = int(s1.cents.sum()) // len(s1)
        r2 = int(s2.cents.sum()) // len(s2)
        assert (r.w1_ppm, r.w2_ppm, r.r1_cents, r.r2_cents) == (w1, w2, r1, r2)
        assert r.rate_effect_x1e6 == w1 * (r2 - r1)
        assert r.mix_effect_x1e6 == r1 * (w2 - w1)
        assert r.interaction_x1e6 == (w2 - w1) * (r2 - r1)
        # per-segment additivity identity (exact, not to rounding)
        assert (
            r.rate_effect_x1e6 + r.mix_effect_x1e6 + r.interaction_x1e6
            == w2 * r2 - w1 * r1
        )
        total_delta += w2 * r2 - w1 * r1
        exp_delta += (
            r.rate_effect_x1e6 + r.mix_effect_x1e6 + r.interaction_x1e6
        )
    assert total_delta == exp_delta


# ---------------------------------------------------------------------------
# XmR control chart
# ---------------------------------------------------------------------------


def test_xmr_matches_pure_python(spark):
    import math

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) d",
            "CAST(FLOOR(value * 100e0) AS BIGINT) cents",
        )
        .toPandas()
    )
    daily = ev.groupby("d").cents.sum().sort_index()
    xs = [int(v) for v in daily]
    mrs = [abs(b - a) for a, b in zip(xs, xs[1:])]
    center = sum(xs) / len(xs)
    mrbar = sum(mrs) / len(mrs)
    ucl, lcl = center + 2.66 * mrbar, center - 2.66 * mrbar
    got = QUERIES["xmr_control_chart"](spark, SF_CORRECT).toPandas().iloc[0]
    assert got.n_days == len(xs)
    assert got.center_cents == math.floor(center + 0.5)
    assert got.ucl_cents == math.floor(ucl + 0.5)
    assert got.lcl_cents == math.floor(lcl + 0.5)
    assert got.n_above == sum(1 for x in xs if x > ucl)
    assert got.n_below == sum(1 for x in xs if x < lcl)
    ooc = [d for d, x in zip(daily.index, xs) if x > ucl or x < lcl]
    assert got.first_ooc_day == (min(ooc) if ooc else -1)
    # limits bracket the center symmetrically
    assert got.lcl_cents < got.center_cents < got.ucl_cents


# ---------------------------------------------------------------------------
# mediation
# ---------------------------------------------------------------------------


def test_mediation_matches_pure_python_and_identity(spark):
    import math

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr("user_id", "event_type").toPandas()
    )
    rows = []
    for uid, g in ev.groupby("user_id"):
        rows.append((
            uid % 2,
            int((g.event_type == "click").sum()),
            int((g.event_type == "purchase").sum()),
        ))
    n = len(rows)
    st = sum(t for t, _, _ in rows)
    sm = sum(m for _, m, _ in rows)
    sy = sum(y for _, _, y in rows)
    stm = sum(t * m for t, m, _ in rows)
    sty = sum(t * y for t, _, y in rows)
    smm = sum(m * m for _, m, _ in rows)
    smy = sum(m * y for _, m, y in rows)
    stt = sum(t * t for t, _, _ in rows)
    c_tm = float(n * stm - st * sm)
    c_ty = float(n * sty - st * sy)
    c_my = float(n * smy - sm * sy)
    v_t = float(n * stt - st * st)
    v_m = float(n * smm - sm * sm)
    a = c_tm / v_t
    b = (c_my * v_t - c_tm * c_ty) / (v_m * v_t - c_tm * c_tm)
    c_prime = (c_ty * v_m - c_my * c_tm) / (v_m * v_t - c_tm * c_tm)
    c_total = c_ty / v_t
    got = QUERIES["mediation_effects"](spark, SF_CORRECT).toPandas().iloc[0]
    assert got.n_users == n
    assert got.a_micro == math.floor(a * 1e6 + 0.5)
    assert got.b_micro == math.floor(b * 1e6 + 0.5)
    assert got.direct_micro == math.floor(c_prime * 1e6 + 0.5)
    assert got.indirect_micro == math.floor(a * b * 1e6 + 0.5)
    assert got.total_micro == math.floor(c_total * 1e6 + 0.5)
    # the OLS mediation identity c = c' + a*b (exact in real arithmetic;
    # snapped values may differ by 1 micro of rounding slack per term)
    assert abs(got.total_micro - (got.direct_micro + got.indirect_micro)) <= 2


# ---------------------------------------------------------------------------
# rich club
# ---------------------------------------------------------------------------


def test_rich_club_matches_pure_python(spark):
    ids = [
        r.doc_id
        for r in spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select("doc_id").collect()
    ]
    edges = set()
    for i in ids:
        u = i % 61
        v = ((i // 61) * 2311 + i * 7919 + 13) % 61
        if u != v:
            edges.add((min(u, v), max(u, v)))
    from collections import Counter

    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    got = QUERIES["rich_club_coefficient"](spark, SF_CORRECT).toPandas()
    for _, r in got.iterrows():
        club = {n for n, d in deg.items() if d > r.k}
        ek = sum(1 for a, b in edges if a in club and b in club)
        assert r.n_club_nodes == len(club)
        assert r.n_club_edges == ek
        assert r.phi_ppm == ek * 2 * 1000000 // (len(club) * (len(club) - 1))
    # phi is non-decreasing in k on a hub-dense graph is NOT guaranteed,
    # but phi must always be a valid density
    assert ((got.phi_ppm >= 0) & (got.phi_ppm <= 1000000)).all()


# ---------------------------------------------------------------------------
# k-fold CV OLS
# ---------------------------------------------------------------------------


def test_kfold_cv_matches_pure_python(spark):
    import math

    docs = (
        spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select("doc_id", "text", "n_chars").toPandas()
    )
    pts = [
        (int(r.doc_id) % 5, int(r.n_chars) // 64, len(r.text.split(" ")))
        for _, r in docs.iterrows()
    ]
    got = QUERIES["kfold_cv_ols"](spark, SF_CORRECT).toPandas()
    assert list(got.fold) == [0, 1, 2, 3, 4]
    for _, r in got.iterrows():
        test = [(x, y) for f, x, y in pts if f == r.fold]
        train = [(x, y) for f, x, y in pts if f != r.fold]
        ntr = len(train)
        sx = sum(x for x, _ in train)
        sy = sum(y for _, y in train)
        sxx = sum(x * x for x, _ in train)
        sxy = sum(x * y for x, y in train)
        slope = (ntr * sxy - sx * sy) * 1.0 / (ntr * sxx - sx * sx)
        icept = (sy - slope * sx) / ntr
        tr_mse = sum((y - slope * x - icept) ** 2 for x, y in train) / ntr
        te_mse = sum((y - slope * x - icept) ** 2 for x, y in test) / len(test)
        assert r.n_test == len(test)
        # the engines expand the MSE from power sums; the naive residual
        # form agrees to double noise, far under the centi snap
        assert abs(r.train_mse_centi - math.floor(tr_mse * 100 + 0.5)) <= 1
        assert abs(r.test_mse_centi - math.floor(te_mse * 100 + 0.5)) <= 1
        assert r.gap_centi == r.test_mse_centi - r.train_mse_centi or \
            abs(r.gap_centi - (r.test_mse_centi - r.train_mse_centi)) <= 1


# ---------------------------------------------------------------------------
# subsampling plan
# ---------------------------------------------------------------------------


def test_subsampling_plan_matches_pure_python(spark):
    import math
    from collections import Counter

    docs = (
        spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select("text").toPandas()
    )
    cnt = Counter()
    for txt in docs.text:
        cnt.update(txt.split(" "))
    n = sum(cnt.values())
    rows = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = QUERIES["term_subsampling_plan"](spark, SF_CORRECT).toPandas()
    assert len(got) == 20
    for (term, c), (_, r) in zip(rows, got.iterrows()):
        f_nano = c * 1000000000 // n
        keep = min(
            1000000000,
            math.floor(
                (math.sqrt(1e7 / f_nano) + 1e7 / f_nano) * 1e9 + 0.5
            ),
        )
        assert (r.term, r.n_occurrences, r.f_nano) == (term, c, f_nano)
        assert r.keep_nano == keep
        assert r.expected_kept == c * keep // 1000000000
    # more frequent terms are kept with lower probability
    ks = list(got.keep_nano)
    assert ks == sorted(ks)


# ---------------------------------------------------------------------------
# CUPED
# ---------------------------------------------------------------------------


def test_cuped_matches_pure_python(spark):
    import math

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "user_id",
            "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) d",
            "CAST(FLOOR(value * 100e0) AS BIGINT) cents",
        )
        .toPandas()
    )
    mid2 = int(ev.d.min()) + int(ev.d.max()) + 1
    xs, ys, arms = {}, {}, {}
    for uid, g in ev.groupby("user_id"):
        xs[uid] = int(g[g.d * 2 < mid2].cents.sum())
        ys[uid] = int(g[g.d * 2 >= mid2].cents.sum())
        arms[uid] = uid % 2
    n = len(xs)
    sx = sum(xs.values())
    sy = sum(ys.values())
    sxx = sum(v * v for v in xs.values())
    sxy = sum(xs[u] * ys[u] for u in xs)
    syy = sum(v * v for v in ys.values())
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    var_y = (n * syy - sy * sy) / (n * n)
    var_x = (n * sxx - sx * sx) / (n * n)
    cov = (n * sxy - sx * sy) / (n * n)
    got = QUERIES["cuped_adjustment"](spark, SF_CORRECT).toPandas().iloc[0]
    assert got.n_users == n
    assert got.theta_micro == math.floor(theta * 1e6 + 0.5)
    assert got.var_y_cents2 == math.floor(var_y + 0.5)
    assert got.var_adj_cents2 == math.floor(var_y - cov * cov / var_x + 0.5)
    assert got.var_reduction_ppm == math.floor(
        cov * cov / var_x / var_y * 1e6 + 0.5
    )

    def arm_mean(vals, a):
        sel = [u for u in vals if arms[u] == a]
        return sum(vals[u] for u in sel) / len(sel)

    def arm_adj(a):
        sel = [u for u in xs if arms[u] == a]
        return sum(ys[u] - theta * xs[u] for u in sel) / len(sel)

    assert got.diff_raw_cents == math.floor(
        arm_mean(ys, 1) - arm_mean(ys, 0) + 0.5
    )
    assert got.diff_adj_cents == math.floor(arm_adj(1) - arm_adj(0) + 0.5)
    # CUPED's contract: variance strictly reduced when pre/post correlate
    assert 0 < got.var_reduction_ppm < 1000000
    assert got.var_adj_cents2 < got.var_y_cents2


# ---------------------------------------------------------------------------
# NB overdispersion
# ---------------------------------------------------------------------------


def test_overdispersion_matches_pure_python(spark):
    import math

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "event_type",
            "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) d",
        )
        .toPandas()
    )
    got = QUERIES["overdispersion_nb_fit"](spark, SF_CORRECT).toPandas()
    for _, r in got.iterrows():
        cs = list(
            ev[ev.event_type == r.event_type].groupby("d").size()
        )
        n = len(cs)
        s1, s2 = sum(cs), sum(c * c for c in cs)
        m = s1 / n
        v = (s2 - s1 * s1 / n) / (n - 1)
        assert r.n_days == n
        assert r.mean_centi == math.floor(m * 100 + 0.5)
        assert r.var_centi == math.floor(v * 100 + 0.5)
        assert r.dispersion_micro == math.floor(v / m * 1e6 + 0.5)
        if v > m:
            assert r.nb_r_micro == math.floor(m * m / (v - m) * 1e6 + 0.5)
        else:
            assert r.nb_r_micro == -1


# ---------------------------------------------------------------------------
# permutation entropy
# ---------------------------------------------------------------------------


def _daily_cents(spark):
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) d",
            "CAST(FLOOR(value * 100e0) AS BIGINT) cents",
        )
        .toPandas()
    )
    return ev.groupby("d").cents.sum().sort_index()


def test_permutation_entropy_matches_pure_python(spark):
    import math
    from collections import Counter

    xs = [int(v) for v in _daily_cents(spark)]

    def pattern(a, b, c):
        # rank by (value, offset): a total order
        order = sorted([(a, 0), (b, 1), (c, 2)])
        perm = tuple(i for _, i in order)
        return {
            (0, 1, 2): 0, (0, 2, 1): 1, (1, 0, 2): 2,
            (2, 0, 1): 3, (1, 2, 0): 4, (2, 1, 0): 5,
        }[perm]

    cnt = Counter(
        pattern(xs[i], xs[i + 1], xs[i + 2]) for i in range(len(xs) - 2)
    )
    m = sum(cnt.values())
    h = sum(
        math.floor(-(c / m) * math.log(c / m) * 1e9 + 0.5)
        for c in cnt.values()
    )
    got = (
        QUERIES["permutation_entropy_daily"](spark, SF_CORRECT)
        .toPandas().iloc[0]
    )
    assert got.n_windows == m
    assert got.n_patterns == len(cnt)
    assert got.h_nano == h
    assert got.pe_normalized_micro == math.floor(
        h / math.log(6.0) / 1e9 * 1e6 + 0.5
    )
    assert 0 <= got.pe_normalized_micro <= 1000000


# ---------------------------------------------------------------------------
# BH FDR
# ---------------------------------------------------------------------------


def test_fdr_bh_matches_pure_python(spark):
    import math

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "event_type",
            "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) d",
        )
        .toPandas()
    )
    mid2 = int(ev.d.min()) + int(ev.d.max()) + 1
    ev["period"] = (ev.d * 2 < mid2).map({True: 1, False: 2})
    n1 = len(ev[ev.period == 1])
    n2 = len(ev[ev.period == 2])

    def erf(x):
        t = 1.0 / (1.0 + 0.3275911 * x)
        poly = (
            0.254829592 * t - 0.284496736 * t ** 2 + 1.421413741 * t ** 3
            - 1.453152027 * t ** 4 + 1.061405429 * t ** 5
        )
        return 1.0 - poly * math.exp(-x * x)

    rows = []
    for et, g in ev.groupby("event_type"):
        k1 = len(g[g.period == 1])
        k2 = len(g[g.period == 2])
        pbar = (k1 + k2) / (n1 + n2)
        az = abs(k1 / n1 - k2 / n2) / math.sqrt(
            pbar * (1 - pbar) * (1 / n1 + 1 / n2)
        )
        p = math.floor((1.0 - erf(az / math.sqrt(2.0))) * 1e6 + 0.5)
        rows.append((et, math.floor(az * 1e6 + 0.5), p))
    rows.sort(key=lambda r: (r[2], r[0]))
    m = len(rows)
    kmax = 0
    for i, (_, _, p) in enumerate(rows, start=1):
        if p * m <= i * 50000:
            kmax = i
    got = QUERIES["fdr_bh_audit"](spark, SF_CORRECT).toPandas()
    assert len(got) == m
    for rk, (et, zm, p) in enumerate(rows, start=1):
        r = got[got["rank"] == rk].iloc[0]
        assert (r.event_type, r.z_micro, r.p_micro) == (et, zm, p)
        assert r.bh_cut_micro == rk * 50000 // m
        assert r.rejected == (1 if rk <= kmax else 0)
    # step-up property: rejections form a prefix of the p-value ranking
    rej = list(got.sort_values("rank").rejected)
    assert rej == sorted(rej, reverse=True)


# ---------------------------------------------------------------------------
# runs test
# ---------------------------------------------------------------------------


def test_runs_test_matches_pure_python(spark):
    import math

    daily = _daily_cents(spark)
    xs = [int(v) for v in daily]
    n = len(xs)
    md = sorted(xs)[n // 2] if n % 2 == 1 else sorted(xs)[n // 2]
    # exact replication of the operator's lower-median rule:
    # min value whose ascending rank r satisfies r*2 > n
    md = sorted(xs)[(n // 2)] if n % 2 == 1 else sorted(xs)[n // 2]
    ranked = sorted(xs)
    md = next(v for r, v in enumerate(ranked, start=1) if r * 2 > n)
    signs = [1 if x > md else 0 for x in xs if x != md]
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    n1, n2 = sum(signs), len(signs) - sum(signs)
    exp = 2.0 * n1 * n2 / (n1 + n2) + 1.0
    var = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) ** 2 * (n1 + n2 - 1))
    )
    z = (runs - exp) / math.sqrt(var)
    got = (
        QUERIES["runs_test_randomness"](spark, SF_CORRECT).toPandas().iloc[0]
    )
    assert (got.n_runs, got.n_above, got.n_below) == (runs, n1, n2)
    assert got.expected_runs_x1e4 == math.floor(exp * 1e4 + 0.5)
    snap = math.floor(z * 1e6 + (0.5 if runs >= exp else -0.5))
    assert got.z_micro == snap


# ---------------------------------------------------------------------------
# gap threshold audit
# ---------------------------------------------------------------------------


def test_gap_threshold_matches_pure_python(spark):
    import math
    from collections import Counter

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "user_id", "event_id",
            "CAST(unix_timestamp(ts) AS BIGINT) es",
        )
        .toPandas()
        .sort_values(["user_id", "es", "event_id"])
    )
    bins = Counter()
    for _, g in ev.groupby("user_id"):
        es = list(g.es)
        for a, b in zip(es, es[1:]):
            bins[math.floor(math.log2(b - a + 1.0))] += 1
    top2 = sorted(bins.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    b1, b2 = top2[0][0], top2[1][0]
    lo, hi = min(b1, b2), max(b1, b2)
    between = {b: c for b, c in bins.items() if lo < b < hi}
    vb = min(between.items(), key=lambda kv: (kv[1], kv[0]))[0] \
        if between else None
    got = QUERIES["gap_threshold_audit"](spark, SF_CORRECT).toPandas()
    assert len(got) == len(bins)
    for _, r in got.iterrows():
        assert r.n_gaps == bins[r.bin]
        assert r.lo_s == int(2 ** r.bin - 1)
        assert r.is_mode == (1 if r.bin in (b1, b2) else 0)
        assert r.is_valley == (1 if vb is not None and r.bin == vb else 0)
    assert got.is_mode.sum() == 2
    assert got.is_valley.sum() == (1 if vb is not None else 0)


# ---------------------------------------------------------------------------
# Erlang C
# ---------------------------------------------------------------------------


def test_erlang_c_matches_pure_python(spark):
    import math
    from collections import Counter

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "CAST(unix_timestamp(ts) AS BIGINT) div 3600 % 24 hod",
            "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) d",
        )
        .toPandas()
    )
    cnt = Counter(ev.hod)
    days = ev.groupby("hod").d.nunique().to_dict()
    peak = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    n, nd = cnt[peak], days[peak]
    a = (n / nd / 3600.0) * 240.0
    got = QUERIES["erlang_c_staffing"](spark, SF_CORRECT).toPandas()
    assert list(got.n_servers) == list(range(1, 9))
    for _, r in got.iterrows():
        c = int(r.n_servers)
        assert r.peak_hour == peak
        assert r.n_events == n
        assert r.offered_load_milli == math.floor(a * 1e3 + 0.5)
        if a >= c:
            pw = 1000000
        else:
            s = sum(a ** k / math.factorial(k) for k in range(c))
            top = a ** c / math.factorial(c) * (c / (c - a))
            pw = math.floor(top / (s + top) * 1e6 + 0.5)
        assert r.p_wait_micro == pw
        assert r.meets_sla == (1 if pw < 200000 else 0)
    # adding servers strictly reduces waiting probability
    ps = list(got.p_wait_micro)
    assert all(b <= a for a, b in zip(ps, ps[1:]))


# ---------------------------------------------------------------------------
# empirical variogram
# ---------------------------------------------------------------------------


def test_variogram_matches_bruteforce(spark):
    """The cell-blocked pair join == an all-pairs brute force within
    the max lag (proves the blocking is lossless at the band edge)."""
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "event_id", "CAST(FLOOR(value * 100e0) AS BIGINT) z",
        )
        .toPandas()
    )
    sub = ev[ev.event_id % 11 == 0]

    def px(i):
        if i % 10 < 3:
            return (i % 787) * 889.45 + 17.3
        return ((i % 5) * 131071) % 650000 + ((i // 10) % 100) * 250

    def py(i):
        if i % 10 < 3:
            return (int(i / 13.0) % 787) * 889.45 + 11.7
        return ((i % 5) * 524287) % 650000 + ((i // 7) % 100) * 250

    pts = [(int(r.event_id), px(r.event_id), py(r.event_id), int(r.z))
           for _, r in sub.iterrows()]
    edges = [1000000, 4000000, 16000000, 64000000]
    from collections import defaultdict

    acc = defaultdict(lambda: [0, 0])
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            _, xa, ya, za = pts[i]
            _, xb, yb, zb = pts[j]
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            if d2 >= edges[-1]:
                continue
            band = next(k for k, e in enumerate(edges) if d2 < e)
            acc[band][0] += 1
            acc[band][1] += (za - zb) ** 2
    got = QUERIES["empirical_variogram"](spark, SF_CORRECT).toPandas()
    assert len(got) == len(acc)
    for _, r in got.iterrows():
        n, sq = acc[r.band]
        assert r.n_pairs == n
        assert r.gamma_cents2_centi == sq * 100 // (2 * n)


# ---------------------------------------------------------------------------
# EB shrinkage
# ---------------------------------------------------------------------------


def test_eb_shrinkage_matches_pure_python(spark):
    import math

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "event_id",
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END conv",
        )
        .toPandas()
    )

    def cx(i):
        return int(((i % 787) * 889.45 + 17.3) // 87500)

    def cy(i):
        return int(((int(i / 13.0) % 787) * 889.45 + 11.7) // 87500)

    from collections import defaultdict

    cells = defaultdict(lambda: [0, 0])
    for _, r in ev.iterrows():
        k = (cx(r.event_id), cy(r.event_id))
        cells[k][0] += 1
        cells[k][1] += r.conv
    nt = sum(n for n, _ in cells.values())
    xt = sum(x for _, x in cells.values())
    K = len(cells)
    pbar = xt / nt
    s2 = sum(n * (x / n - pbar) ** 2 for n, x in cells.values()) / nt
    tau2 = max(0.0, s2 - K * pbar * (1 - pbar) / nt)
    got = QUERIES["eb_shrunk_cell_rates"](spark, SF_CORRECT).toPandas()
    assert len(got) == K
    for _, r in got.iterrows():
        n, x = cells[(r.cx, r.cy)]
        sv = pbar * (1 - pbar) / n
        b = sv / (sv + tau2)
        assert r.n == n
        assert r.raw_ppm == x * 1000000 // n
        assert r.shrink_ppm == math.floor(b * 1e6 + 0.5)
        assert r.shrunk_ppm == math.floor(
            (b * pbar + (1 - b) * (x / n)) * 1e6 + 0.5
        )
    # shrinkage moves every cell TOWARD the pool (never past it), and
    # over-dispersed raw rates compress
    pool_ppm = xt * 1000000 // nt
    for _, r in got.iterrows():
        lo, hi = min(r.raw_ppm, pool_ppm), max(r.raw_ppm, pool_ppm)
        assert lo - 1 <= r.shrunk_ppm <= hi + 1


# ---------------------------------------------------------------------------
# join counts
# ---------------------------------------------------------------------------


def test_join_counts_matches_pure_python(spark):
    import math
    from collections import defaultdict

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "event_id",
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END conv",
        )
        .toPandas()
    )
    cells = defaultdict(lambda: [0, 0])
    for _, r in ev.iterrows():
        i = r.event_id
        cx = int(((i % 787) * 889.45 + 17.3) // 43750)
        cy = int(((int(i / 13.0) % 787) * 889.45 + 11.7) // 43750)
        cells[(cx, cy)][0] += 1
        cells[(cx, cy)][1] += r.conv
    nt = sum(n for n, _ in cells.values())
    xt = sum(x for _, x in cells.values())
    p_ppm = xt * 1000000 // nt
    black = {
        k: 1 if x * 1000000 > n * p_ppm else 0
        for k, (n, x) in cells.items()
    }
    bb = ww = bw = j = 0
    for (cx, cy), ba in black.items():
        for nb in ((cx + 1, cy), (cx, cy + 1)):
            if nb not in black:
                continue
            j += 1
            bbv = black[nb]
            if ba and bbv:
                bb += 1
            elif not ba and not bbv:
                ww += 1
            else:
                bw += 1
    k = len(black)
    nbk = sum(black.values())
    p = nbk / k
    exp = {
        "BB": j * p * p, "BW": j * 2 * p * (1 - p),
        "WW": j * (1 - p) * (1 - p),
    }
    n_obs = {"BB": bb, "BW": bw, "WW": ww}
    got = QUERIES["join_count_statistics"](spark, SF_CORRECT).toPandas()
    assert len(got) == 3
    for _, r in got.iterrows():
        assert r.n_obs == n_obs[r.join_type]
        assert r.expected_x100 == math.floor(exp[r.join_type] * 100 + 0.5)
        assert r.share_ppm == n_obs[r.join_type] * 1000000 // j
    assert got.n_obs.sum() == j


# ---------------------------------------------------------------------------
# RQA
# ---------------------------------------------------------------------------


def test_rqa_matches_pure_python(spark):
    daily = _daily_cents(spark)
    xs = [int(v) for v in daily]
    m = len(xs)
    eps = (max(xs) - min(xs)) // 10
    rec = set()
    for i in range(m):
        for jj in range(i + 1, m):
            if abs(xs[i] - xs[jj]) <= eps:
                rec.add((i + 1, jj + 1))
    diag = sum(
        1 for (a, b) in rec
        if (a + 1, b + 1) in rec or (a - 1, b - 1) in rec
    )
    got = (
        QUERIES["recurrence_quantification"](spark, SF_CORRECT)
        .toPandas().iloc[0]
    )
    assert (got.n_days, got.eps_cents, got.n_recurrent) == (m, eps, len(rec))
    assert got.recurrence_ppm == len(rec) * 2 * 1000000 // (m * (m - 1))
    assert got.determinism_ppm == diag * 1000000 // len(rec)


# ---------------------------------------------------------------------------
# position-based attribution
# ---------------------------------------------------------------------------


def test_position_attribution_matches_pure_python(spark):
    from collections import defaultdict

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "user_id", "event_type et", "event_id",
            "CAST(unix_timestamp(ts) AS BIGINT) es",
        )
        .toPandas()
        .sort_values(["user_id", "es", "event_id"])
    )
    credit = defaultdict(int)
    users = defaultdict(set)
    total = 0
    for uid, g in ev.groupby("user_id"):
        ets = list(g.et)
        if "purchase" not in ets:
            continue
        pr = ets.index("purchase")
        journey = ets[:pr]
        L = len(journey)
        for pos, ch in enumerate(journey, start=1):
            if L == 1:
                w = 1000000
            elif L == 2:
                w = 500000
            elif pos == 1 or pos == L:
                w = 400000
            else:
                w = 200000 // (L - 2)
            credit[ch] += w
            users[ch].add(uid)
            total += w
    got = QUERIES["position_based_attribution"](spark, SF_CORRECT).toPandas()
    assert sorted(got.channel) == sorted(credit)
    for _, r in got.iterrows():
        assert r.n_journeys == len(users[r.channel])
        assert r.credit_micro == credit[r.channel]
        assert r.credit_share_ppm == credit[r.channel] * 1000000 // total
    # shares form a full distribution (truncation slack < 1 ppm/channel)
    assert 1000000 - len(got) <= got.credit_share_ppm.sum() <= 1000000


# ---------------------------------------------------------------------------
# secretary rule
# ---------------------------------------------------------------------------


def test_secretary_rule_matches_pure_python(spark):
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "user_id", "CAST(FLOOR(value * 100e0) AS BIGINT) cents",
            "CAST(unix_timestamp(ts) AS BIGINT) es", "event_id",
        )
        .toPandas()
        .sort_values(["user_id", "es", "event_id"])
    )
    succ = forced = users = 0
    base_sum = 0
    for _, g in ev.groupby("user_id"):
        vals = [int(v) for v in g.cents]
        n = len(vals)
        k = n * 37 // 100
        best_skip = max(vals[:k]) if k else -1
        pick = next(
            (i for i in range(k, n) if vals[i] > best_skip), None
        )
        if pick is None:
            pick = n - 1
            forced += 1
        if vals[pick] == max(vals):
            succ += 1
        users += 1
        base_sum += vals.count(max(vals)) * 1000000 // n
    got = (
        QUERIES["secretary_rule_eval"](spark, SF_CORRECT).toPandas().iloc[0]
    )
    assert got.n_users == users
    assert got.n_success == succ
    assert got.success_ppm == succ * 1000000 // users
    assert got.n_forced_last == forced
    assert got.random_baseline_ppm == base_sum // users
    # the rule must beat random selection on these long sequences
    assert got.success_ppm > got.random_baseline_ppm


# ---------------------------------------------------------------------------
# peak concurrency
# ---------------------------------------------------------------------------


def test_peak_concurrency_matches_bruteforce_sweep(spark):
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr("CAST(unix_timestamp(ts) AS BIGINT) s")
        .toPandas()
    )
    bounds = []
    for s in ev.s:
        bounds.append((int(s), 1))
        bounds.append((int(s) + 240, -1))
    bounds.sort(key=lambda b: (b[0], b[1]))  # ends before starts at ties
    run = 0
    per_hour = {}
    for tt, d in bounds:
        run += d
        h = tt // 3600 if d == 1 else (tt - 1) // 3600
        # track the max ACTIVE count; attribute a start's new level to
        # its own hour, an end's level to the hour the interval was
        # still active in
        per_hour[h] = max(per_hour.get(h, 0), run)
    got = QUERIES["peak_concurrency"](spark, SF_CORRECT).toPandas()
    # global invariant: the top hour's peak equals the global sweep max
    global_max = 0
    run = 0
    for tt, d in bounds:
        run += d
        global_max = max(global_max, run)
    assert got.iloc[0].peak_concurrency == global_max
    # every reported hour's peak equals the brute-force per-hour max
    for _, r in got.iterrows():
        assert r.peak_concurrency == per_hour[r.hour]
    # ordering: descending peaks, ties by hour
    pcs = list(got.peak_concurrency)
    assert pcs == sorted(pcs, reverse=True)


# ---------------------------------------------------------------------------
# hub removal robustness
# ---------------------------------------------------------------------------


def test_hub_removal_matches_pure_python(spark):
    from collections import Counter

    ids = [
        r.doc_id
        for r in spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select("doc_id").collect()
    ]
    edges = set()
    for i in ids:
        u = i % 61
        v = ((i // 61) * 2311 + i * 7919 + 13) % 61
        if u != v:
            edges.add((min(u, v), max(u, v)))
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    got = QUERIES["hub_removal_robustness"](spark, SF_CORRECT).toPandas()
    assert list(got.k_removed) == [0, 2, 4]
    prev_share = None
    for _, r in got.iterrows():
        hubs = set(
            n for n, _ in sorted(
                deg.items(), key=lambda kv: (-kv[1], kv[0])
            )[: r.k_removed]
        )
        nodes = [n for n in deg if n not in hubs]
        ek = [(a, b) for a, b in edges if a not in hubs and b not in hubs]
        # union-find
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in ek:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        comps = Counter(find(n) for n in nodes)
        assert r.n_nodes == len(nodes)
        assert r.n_edges == len(ek)
        assert r.n_components == len(comps)
        assert r.largest_cc_ppm == max(comps.values()) * 1000000 // len(nodes)
        prev_share = r.largest_cc_ppm
    # removing hubs cannot grow the giant component's share above k=0's
    assert got.iloc[-1].largest_cc_ppm <= got.iloc[0].largest_cc_ppm + 1


# ---------------------------------------------------------------------------
# W-pattern detection
# ---------------------------------------------------------------------------


def test_w_pattern_matches_pure_python(spark):
    daily = _daily_cents(spark)
    xs = [int(v) for v in daily]
    days = list(daily.index)
    deltas = [
        (days[i + 1], xs[i + 1] - xs[i])
        for i in range(len(xs) - 1)
        if xs[i + 1] != xs[i]
    ]
    runs = []
    for d, dv in deltas:
        s = 1 if dv > 0 else -1
        if runs and runs[-1][0] == s:
            runs[-1][2] = d
            runs[-1][3] += dv
        else:
            runs.append([s, d, d, dv])  # sign, start, end, move
    exp = []
    for i in range(len(runs) - 3):
        s = [runs[i + j][0] for j in range(4)]
        if s == [-1, 1, -1, 1]:
            m = [runs[i + j][3] for j in range(4)]
            exp.append(
                (
                    runs[i][1], runs[i + 3][2],
                    min(-m[0], -m[2]), m[1] + m[3],
                )
            )
    got = QUERIES["w_pattern_detect"](spark, SF_CORRECT).toPandas()
    assert len(got) == len(exp)
    for (sd, ed, drop, rise), (_, r) in zip(exp, got.iterrows()):
        assert (r.start_day, r.end_day) == (sd, ed)
        assert (r.min_drop_cents, r.total_rise_cents) == (drop, rise)
        # pattern semantics: both drops and the rises are positive moves
        assert drop > 0 and rise > 0


# ---------------------------------------------------------------------------
# newsvendor
# ---------------------------------------------------------------------------


def test_newsvendor_matches_pure_python(spark):
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) d",
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END p",
        )
        .toPandas()
    )
    dem = sorted(ev.groupby("d").p.sum())
    n = len(dem)
    q_star = next(
        v for r, v in enumerate(dem, start=1) if r * 400 >= n * 300
    )
    q_mean = sum(dem) // n

    def cost(q):
        return sum(
            max(d - q, 0) * 300 + max(q - d, 0) * 100 for d in dem
        )

    got = (
        QUERIES["newsvendor_stocking"](spark, SF_CORRECT)
        .toPandas().set_index("policy")
    )
    assert got.loc["critical_ratio"].stock == q_star
    assert got.loc["critical_ratio"].total_cost == cost(q_star)
    assert got.loc["mean_stock"].stock == q_mean
    assert got.loc["mean_stock"].total_cost == cost(q_mean)
    # the quantile decision is optimal over ALL integer stocks
    best = min(cost(q) for q in range(min(dem), max(dem) + 1))
    assert got.loc["critical_ratio"].total_cost == best
    assert got.loc["critical_ratio"].total_cost <= \
        got.loc["mean_stock"].total_cost


# ---------------------------------------------------------------------------
# bitemporal as-of
# ---------------------------------------------------------------------------


def test_bitemporal_matches_pure_python(spark):
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .where("event_type = 'purchase'")
        .selectExpr(
            "event_id", "user_id",
            "CAST(unix_timestamp(ts) AS BIGINT) valid_t",
            "CAST(FLOOR(value * 100e0) AS BIGINT) cents",
        )
        .toPandas()
    )
    facts = []
    for _, r in ev.iterrows():
        tx = int(r.valid_t) + (int(r.event_id) % 3) * 3600
        facts.append((int(r.event_id), int(r.user_id), int(r.valid_t),
                      tx, int(r.cents), 0))
        if r.event_id % 7 == 0:
            facts.append((int(r.event_id), int(r.user_id), int(r.valid_t),
                          tx + 7200, int(r.cents) + 500, 1))
    t0 = min(f[2] for f in facts)
    t1 = max(f[3] for f in facts)
    vcut = t0 + (t1 - t0) * 5 // 10
    snaps = {1: t0 + (t1 - t0) * 6 // 10, 2: t1}
    got = QUERIES["bitemporal_asof"](spark, SF_CORRECT).toPandas()
    for snap_id, tx_cut in snaps.items():
        latest = {}
        for fid, uid, vt, tx, c, ic in facts:
            if tx > tx_cut or vt > vcut:
                continue
            cur = latest.get(fid)
            if cur is None or (tx, c) > (cur[0], cur[1]):
                latest[fid] = (tx, c, uid, ic)
        for cohort in (0, 1):
            sel = [v for v in latest.values() if v[2] % 2 == cohort]
            r = got[(got.snap_id == snap_id) & (got.cohort == cohort)].iloc[0]
            assert r.n_facts == len(sel)
            assert r.total_cents == sum(c for _, c, _, _ in sel)
            assert r.n_corrected_seen == sum(ic for _, _, _, ic in sel)
    # later knowledge can only ADD corrections (same valid cut)
    s1 = got[got.snap_id == 1].n_corrected_seen.sum()
    s2 = got[got.snap_id == 2].n_corrected_seen.sum()
    assert s2 >= s1


# ---------------------------------------------------------------------------
# adstock correlation
# ---------------------------------------------------------------------------


def test_adstock_matches_pure_python(spark):
    import math

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) d",
            "CASE WHEN event_type = 'click' THEN 1 ELSE 0 END cx",
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END cy",
        )
        .toPandas()
    )
    g = ev.groupby("d").agg(x=("cx", "sum"), y=("cy", "sum")).sort_index()
    xs = [int(v) for v in g.x]
    ys = [int(v) for v in g.y]
    rows = []
    for t_ in range(7, len(xs)):
        a = sum(xs[t_ - k] * (1 << (7 - k)) for k in range(8))
        rows.append((xs[t_], ys[t_], a))

    def corr(pairs):
        n = len(pairs)
        sx = sum(p[0] for p in pairs)
        sy = sum(p[1] for p in pairs)
        sxx = sum(p[0] ** 2 for p in pairs)
        syy = sum(p[1] ** 2 for p in pairs)
        sxy = sum(p[0] * p[1] for p in pairs)
        return (n * sxy - sx * sy) / math.sqrt(
            float(n * sxx - sx * sx)
        ) / math.sqrt(float(n * syy - sy * sy))

    r_raw = corr([(x, y) for x, y, _ in rows])
    r_ad = corr([(a, y) for _, y, a in rows])
    got = (
        QUERIES["adstock_correlation"](spark, SF_CORRECT).toPandas().iloc[0]
    )
    assert got.n_days == len(rows)
    assert got.r_raw_micro == math.floor(r_raw * 1e6 + 0.5)
    assert got.r_adstock_micro == math.floor(r_ad * 1e6 + 0.5)
    assert -1000000 <= got.r_adstock_micro <= 1000000


# ---------------------------------------------------------------------------
# Hodges-Lehmann
# ---------------------------------------------------------------------------


def test_hodges_lehmann_matches_pure_python(spark):
    daily = _daily_cents(spark)
    xs = [int(v) for v in daily]
    n = len(xs)
    walsh = sorted(
        xs[i] + xs[j] for i in range(n) for j in range(i, n)
    )
    np_ = len(walsh)
    m = next(v for r, v in enumerate(walsh, start=1) if r * 2 > np_)
    med = next(
        v for r, v in enumerate(sorted(xs), start=1) if r * 2 > n
    )
    got = (
        QUERIES["hodges_lehmann_location"](spark, SF_CORRECT)
        .toPandas().iloc[0]
    )
    assert got.n_days == n
    assert got.n_walsh_pairs == np_ == n * (n + 1) // 2
    assert got.hl_x2_cents == m
    assert got.hl_cents == m // 2
    assert got.mean_cents == sum(xs) // n
    assert got.median_cents == med
    # H-L lies between (or at) the extremes of median and mean for
    # mildly skewed data — sanity envelope with slack
    lo = min(got.mean_cents, got.median_cents)
    hi = max(got.mean_cents, got.median_cents)
    spread = max(xs) - min(xs)
    assert lo - spread // 4 <= got.hl_cents <= hi + spread // 4


# ---------------------------------------------------------------------------
# WoE / IV
# ---------------------------------------------------------------------------


def test_woe_iv_matches_pure_python(spark):
    import math
    from collections import defaultdict

    docs = (
        spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select("text", "n_chars").toPandas()
    )
    bins = defaultdict(lambda: [0, 0])
    for _, r in docs.iterrows():
        b = min(int(r.n_chars) // 128, 7)
        hits = (len(r.text) - len(r.text.replace("spark", ""))) // 5
        y = 1 if hits >= 4 else 0
        bins[b][0] += y
        bins[b][1] += 1 - y
    gt = sum(g for g, _ in bins.values())
    bt = sum(b for _, b in bins.values())
    k = len(bins)
    got = QUERIES["woe_information_value"](spark, SF_CORRECT).toPandas()
    assert len(got) == k
    iv_total = 0
    for _, r in got.iterrows():
        g, bd = bins[r.bin]
        pg = (g + 1) / (gt + k)
        pb = (bd + 1) / (bt + k)
        assert (r.n, r.n_good, r.n_bad) == (g + bd, g, bd)
        assert r.woe_nano == math.floor(math.log(pg / pb) * 1e9 + 0.5)
        assert r.iv_term_nano == math.floor(
            (pg - pb) * math.log(pg / pb) * 1e9 + 0.5
        )
        iv_total += r.iv_term_nano
    # IV terms are non-negative up to snapping slack
    assert (got.iv_term_nano >= -1).all()
    assert iv_total >= 0


# ---------------------------------------------------------------------------
# SRM
# ---------------------------------------------------------------------------


def test_srm_matches_pure_python(spark):
    import math

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "(CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INT) + 4) % 7 dow",
            "user_id % 2 arm",
        )
        .toPandas()
    )

    def erf(x):
        t = 1.0 / (1.0 + 0.3275911 * x)
        poly = (
            0.254829592 * t - 0.284496736 * t ** 2 + 1.421413741 * t ** 3
            - 1.453152027 * t ** 4 + 1.061405429 * t ** 5
        )
        return 1.0 - poly * math.exp(-x * x)

    got = QUERIES["srm_check"](spark, SF_CORRECT).toPandas()
    assert len(got) == 8  # 7 dows + overall
    for _, r in got.iterrows():
        sub = ev if r.dow == -1 else ev[ev.dow == r.dow]
        n0 = len(sub[sub.arm == 0])
        n1 = len(sub[sub.arm == 1])
        az = abs(n0 - n1) / math.sqrt(n0 + n1)
        p = 1.0 - erf(az / math.sqrt(2.0))
        assert (r.n0, r.n1) == (n0, n1)
        assert r.chi2_micro == math.floor(az * az * 1e6 + 0.5)
        assert r.p_micro == math.floor(p * 1e6 + 0.5)
        assert r.srm_flag == (1 if p < 1e-3 else 0)
    # the fixture's id-parity split is healthy: the overall row must
    # not trip SRM
    assert got[got.dow == -1].iloc[0].srm_flag == 0


# ---------------------------------------------------------------------------
# ratio metric delta CI
# ---------------------------------------------------------------------------


def test_ratio_delta_ci_matches_pure_python(spark):
    import math

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "user_id", "CAST(FLOOR(value * 100e0) AS BIGINT) cents",
        )
        .toPandas()
    )
    got = QUERIES["ratio_metric_delta_ci"](spark, SF_CORRECT).toPandas()
    for arm in (0, 1):
        rows = [
            (int(g.cents.sum()), len(g))
            for uid, g in ev.groupby("user_id") if uid % 2 == arm
        ]
        n = len(rows)
        sx = sum(x for x, _ in rows)
        sy = sum(y for _, y in rows)
        sxx = sum(x * x for x, _ in rows)
        sxy = sum(x * y for x, y in rows)
        syy = sum(y * y for _, y in rows)
        r_ = sx / sy
        vx = (n * sxx - sx * sx) / (n * n)
        vy = (n * syy - sy * sy) / (n * n)
        cxy = (n * sxy - sx * sy) / (n * n)
        ybar = sy / n
        se = math.sqrt((vx - 2 * r_ * cxy + r_ * r_ * vy) / (ybar ** 2) / n)
        g = got[got.arm == arm].iloc[0]
        assert g.n_users == n
        assert g.ratio_milli == math.floor(r_ * 1e3 + 0.5)
        assert g.se_milli == math.floor(se * 1e3 + 0.5)
        assert g.ci_lo_milli == math.floor((r_ - 1.959964 * se) * 1e3 + 0.5)
        assert g.ci_hi_milli == math.floor((r_ + 1.959964 * se) * 1e3 + 0.5)
        assert g.ci_lo_milli < g.ratio_milli < g.ci_hi_milli


# ---------------------------------------------------------------------------
# deviational ellipse
# ---------------------------------------------------------------------------


def test_deviational_ellipse_matches_pure_python(spark):
    import math

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .where("event_type = 'purchase'")
        .selectExpr("event_id").toPandas()
    )
    xs, ys = [], []
    for i in ev.event_id:
        xs.append((i % 787) * 889.45 + 17.3)
        ys.append((int(i / 13.0) % 787) * 889.45 + 11.7)
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    vx = sum(x * x for x in xs) / n - mx * mx
    vy = sum(y * y for y in ys) / n - my * my
    cxy = sum(x * y for x, y in zip(xs, ys)) / n - mx * my
    disc = math.sqrt(((vx - vy) / 2) ** 2 + cxy * cxy)
    l1, l2 = (vx + vy) / 2 + disc, (vx + vy) / 2 - disc
    theta = 0.5 * math.atan2(2 * cxy, vx - vy)
    got = (
        QUERIES["deviational_ellipse"](spark, SF_CORRECT).toPandas().iloc[0]
    )
    assert got.n_points == n
    # centroid/axes snap half-up; pure-Python float sums can differ in
    # the last ulp from the engines' fold order -> allow 1 unit slack
    assert abs(got.center_x - math.floor(mx + 0.5)) <= 1
    assert abs(got.center_y - math.floor(my + 0.5)) <= 1
    assert abs(got.major_axis - math.floor(math.sqrt(l1) + 0.5)) <= 1
    assert abs(got.minor_axis - math.floor(math.sqrt(l2) + 0.5)) <= 1
    assert abs(got.theta_microrad - math.floor(theta * 1e6 + 0.5)) <= 2
    # eigen invariants: axes ordered, angle within (-pi/2, pi/2]
    assert got.major_axis >= got.minor_axis > 0
    assert abs(got.theta_microrad) <= 1571000


# ---------------------------------------------------------------------------
# LISA quadrants
# ---------------------------------------------------------------------------


def test_lisa_quadrants_matches_pure_python(spark):
    import math
    from collections import defaultdict

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "event_id",
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END conv",
        )
        .toPandas()
    )
    cells = defaultdict(lambda: [0, 0])
    for _, r in ev.iterrows():
        i = r.event_id
        cx = int(((i % 787) * 889.45 + 17.3) // 87500)
        cy = int(((int(i / 13.0) % 787) * 889.45 + 11.7) // 87500)
        cells[(cx, cy)][0] += 1
        cells[(cx, cy)][1] += r.conv
    pbar = sum(x for _, x in cells.values()) / sum(
        n for n, _ in cells.values()
    )
    z = {k: x / n - pbar for k, (n, x) in cells.items()}
    quads = defaultdict(lambda: [0, 0.0])
    for (cx, cy), zv in z.items():
        nbrs = [
            z[k] for k in ((cx + 1, cy), (cx - 1, cy), (cx, cy + 1),
                           (cx, cy - 1)) if k in z
        ]
        wz = sum(nbrs) / len(nbrs)
        q = (
            "HH" if zv >= 0 and wz >= 0
            else "LL" if zv < 0 and wz < 0
            else "HL" if zv >= 0 else "LH"
        )
        quads[q][0] += 1
        quads[q][1] += zv * wz
    got = QUERIES["lisa_quadrants"](spark, SF_CORRECT).toPandas()
    assert len(got) == len(quads)
    total_cells = 0
    for _, r in got.iterrows():
        cnt, s = quads[r.quadrant]
        assert r.n_cells == cnt
        assert abs(r.lisa_sum_nano - math.floor(s * 1e9 + 0.5)) <= 2
        total_cells += r.n_cells
    assert total_cells == len(cells)


# ---------------------------------------------------------------------------
# source ablation
# ---------------------------------------------------------------------------


def test_source_ablation_matches_pure_python(spark):
    from collections import defaultdict

    docs = (
        spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select("source", "text").toPandas()
    )
    agg = defaultdict(lambda: [0, 0])
    for _, r in docs.iterrows():
        hits = (len(r.text) - len(r.text.replace("spark", ""))) // 5
        y = 1 if hits >= 4 else 0
        agg[r.source][0] += 1
        agg[r.source][1] += y
    nt = sum(n for n, _ in agg.values())
    gt = sum(g for _, g in agg.values())
    full = gt * 1000000 // nt
    got = QUERIES["source_ablation_impact"](spark, SF_CORRECT).toPandas()
    assert len(got) == len(agg)
    for _, r in got.iterrows():
        n, g = agg[r.source]
        without = (gt - g) * 1000000 // (nt - n)
        assert r.n_docs == n
        assert r.rate_of_source_ppm == g * 1000000 // n
        assert r.rate_full_ppm == full
        assert r.rate_without_ppm == without
        assert r.impact_ppm == without - full
        # a source richer than the pool must have negative removal
        # impact, and vice versa (strictly, up to floor slack)
        if r.rate_of_source_ppm > full + 1:
            assert r.impact_ppm <= 0
        if r.rate_of_source_ppm < full - 1:
            assert r.impact_ppm >= 0


# ---------------------------------------------------------------------------
# quantile treatment effects
# ---------------------------------------------------------------------------


def test_qte_matches_pure_python(spark):
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "user_id", "CAST(FLOOR(value * 100e0) AS BIGINT) cents",
        )
        .toPandas()
    )
    per_arm = {0: [], 1: []}
    for uid, g in ev.groupby("user_id"):
        per_arm[uid % 2].append((int(g.cents.sum()), uid))
    got = QUERIES["quantile_treatment_effect"](spark, SF_CORRECT).toPandas()
    assert list(got.decile) == list(range(1, 10))
    for arm in (0, 1):
        vals = sorted(per_arm[arm])
        n = len(vals)
        for _, r in got.iterrows():
            d = int(r.decile)
            q = next(
                x for rk, (x, _) in enumerate(vals, start=1)
                if rk * 10 >= d * n
            )
            col = "q_treat_cents" if arm == 1 else "q_ctrl_cents"
            assert r[col] == q
    # deciles are monotone within each arm
    assert list(got.q_treat_cents) == sorted(got.q_treat_cents)
    assert list(got.q_ctrl_cents) == sorted(got.q_ctrl_cents)


# ---------------------------------------------------------------------------
# price elasticity
# ---------------------------------------------------------------------------


def test_price_elasticity_matches_pure_python(spark):
    import math
    from collections import Counter

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .where("event_type = 'purchase'")
        .selectExpr("CAST(FLOOR(value * 100e0) AS BIGINT) cents")
        .toPandas()
    )
    bands = Counter(int(c) // 5000 for c in ev.cents)
    pts = [
        (math.log(b * 5000 + 2500), math.log(q))
        for b, q in bands.items() if q >= 5
    ]
    m = len(pts)
    sx = sum(p for p, _ in pts)
    sy = sum(q for _, q in pts)
    sxx = sum(p * p for p, _ in pts)
    sxy = sum(p * q for p, q in pts)
    syy = sum(q * q for _, q in pts)
    num = m * sxy - sx * sy
    slope = num / (m * sxx - sx * sx)
    r2 = num * num / ((m * sxx - sx * sx) * (m * syy - sy * sy))
    got = QUERIES["price_elasticity"](spark, SF_CORRECT).toPandas().iloc[0]
    assert got.n_bands == m
    snap = math.floor(slope * 1e6 + (0.5 if num >= 0 else -0.5))
    # float fold-order slack of 1 micro on the pure-Python recompute
    assert abs(got.elasticity_micro - snap) <= 1
    assert abs(got.r2_micro - math.floor(r2 * 1e6 + 0.5)) <= 1
    # a uniform-value fixture has demand falling in the top band only
    # through support truncation; the R^2 gate just needs validity
    assert 0 <= got.r2_micro <= 1000000


# ---------------------------------------------------------------------------
# log-rank test
# ---------------------------------------------------------------------------


def test_logrank_matches_pure_python(spark):
    import math
    from collections import defaultdict

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .where("event_type = 'purchase'")
        .selectExpr("user_id", "CAST(ts AS DATE) dt")
        .toPandas()
    )
    wend = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr("MAX(CAST(ts AS DATE)) w").collect()[0].w
    )
    users = {}
    for uid, g in ev.groupby("user_id"):
        t_ = (g.dt.max() - g.dt.min()).days
        cens = 1 if (wend - g.dt.max()).days <= 2 else 0
        users[uid] = (uid % 2, t_, cens)
    byt = defaultdict(lambda: [0, 0, 0, 0])  # leave1, leave0, d1, d0
    for arm, t_, c in users.values():
        e = byt[t_]
        if arm == 1:
            e[0] += 1
            e[2] += 1 - c
        else:
            e[1] += 1
            e[3] += 1 - c
    nt1 = sum(1 for a, _, _ in users.values() if a == 1)
    nt0 = len(users) - nt1
    o1 = 0
    e1 = v = 0.0
    rem1, rem0 = 0, 0
    for t_ in sorted(byt):
        l1, l0, d1, d0 = byt[t_]
        n1 = nt1 - rem1
        n0 = nt0 - rem0
        rem1 += l1
        rem0 += l0
        d = d1 + d0
        n = n1 + n0
        if d > 0 and n > 1:
            o1 += d1
            e1 += d * n1 / n
            v += d * (n1 / n) * (n0 / n) * ((n - d) / (n - 1))
    z = (o1 - e1) / math.sqrt(v)
    got = QUERIES["logrank_test"](spark, SF_CORRECT).toPandas().iloc[0]
    assert (got.n_treat, got.n_ctrl, got.observed_treat) == (nt1, nt0, o1)
    assert got.expected_treat_micro == math.floor(e1 * 1e6 + 0.5)
    assert got.var_micro == math.floor(v * 1e6 + 0.5)
    snap = math.floor(z * 1e6 + (0.5 if o1 >= e1 else -0.5))
    assert got.z_micro == snap
    # id-parity arms are an A/A: the test must NOT reject at 5 sigma
    assert abs(got.z_micro) < 5000000


# ---------------------------------------------------------------------------
# Bradley-Terry
# ---------------------------------------------------------------------------


def test_bradley_terry_matches_pure_python(spark):
    import math
    from collections import defaultdict

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "event_type item",
            "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) d",
        )
        .toPandas()
    )
    daily = ev.groupby(["item", "d"]).size()
    items = sorted(ev.item.unique())
    days = sorted(ev.d.unique())
    w = defaultdict(int)
    n = defaultdict(int)
    for day in days:
        for i in items:
            for j in items:
                if i == j:
                    continue
                ci = daily.get((i, day), 0)
                cj = daily.get((j, day), 0)
                if ci != cj:
                    n[(i, j)] += 1
                    if ci > cj:
                        w[(i, j)] += 1
    wins = {i: sum(w[(i, j)] for j in items if j != i) for i in items}
    pi = {i: 1000000 for i in items}
    for _ in range(8):
        raw = {}
        for i in items:
            dn = sum(
                n[(i, j)] * 1000000.0 / (pi[i] + pi[j])
                for j in items if j != i and n[(i, j)] > 0
            )
            raw[i] = wins[i] * 1000000.0 / dn
        s = sum(raw.values())
        pi = {
            i: math.floor(raw[i] * 5000000 / s + 0.5) for i in items
        }
    got = QUERIES["bradley_terry_strengths"](spark, SF_CORRECT).toPandas()
    assert len(got) == len(items)
    for _, r in got.iterrows():
        # r.item is the pandas Series.item METHOD — index by name
        assert r["wins"] == wins[r["item"]]
        assert abs(r["strength_micro"] - pi[r["item"]]) <= 1
    # strengths normalize to ~5e6 micro and order by the leaderboard
    assert abs(got.strength_micro.sum() - 5000000) <= len(items)
    sm = list(got.strength_micro)
    assert sm == sorted(sm, reverse=True)


# ---------------------------------------------------------------------------
# Dunning LLR
# ---------------------------------------------------------------------------


def test_dunning_llr_matches_pure_python(spark):
    import math
    from collections import Counter

    docs = (
        spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select("text").toPandas()
    )
    pairs = []
    for txt in docs.text:
        ws = txt.split(" ")
        pairs += list(zip(ws, ws[1:]))
    nn = len(pairs)
    c12 = Counter(pairs)
    c1 = Counter(a for a, _ in pairs)
    c2 = Counter(b for _, b in pairs)

    def xlx(k):
        return k * math.log(k) if k > 0 else 0.0

    rows = []
    for (a, b), k11 in c12.items():
        if k11 < 20:
            continue
        k12 = c1[a] - k11
        k21 = c2[b] - k11
        k22 = nn - c1[a] - c2[b] + k11
        llr = 2.0 * (
            xlx(k11) + xlx(k12) + xlx(k21) + xlx(k22) + xlx(nn)
            - xlx(k11 + k12) - xlx(k21 + k22)
            - xlx(k11 + k21) - xlx(k12 + k22)
        )
        rows.append((f"{a} {b}", k11, math.floor(llr * 1e6 + 0.5)))
    rows.sort(key=lambda r: (-r[2], r[0]))
    got = QUERIES["dunning_llr_bigrams"](spark, SF_CORRECT).toPandas()
    assert len(got) == 15
    for (bg, k11, llr), (_, r) in zip(rows[:15], got.iterrows()):
        assert r.bigram == bg
        assert r.n_cooccur == k11
        # xlogx fold-order float slack
        assert abs(r.llr_micro - llr) <= 5
    # G^2 is non-negative up to snapping slack
    assert (got.llr_micro >= -1).all()


# ---------------------------------------------------------------------------
# embedding isotropy
# ---------------------------------------------------------------------------


def test_embedding_isotropy_matches_pure_python(spark):
    import math

    import numpy as np

    emb = (
        spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
        .select("embedding").toPandas()
    )
    mat = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    n, dim = mat.shape
    mu = mat.mean(axis=0)
    mean_sq = float(mu @ mu)
    avg_sq = float((mat * mat).sum() / n)
    got = (
        QUERIES["embedding_isotropy_audit"](spark, SF_CORRECT)
        .toPandas().iloc[0]
    )
    assert (got.n_vecs, got.dim) == (n, dim)
    # numpy's pairwise-summation differs from the engines' fold in the
    # last ulps -> 2-unit slack on the snapped outputs
    assert abs(
        got.anisotropy_ppm - math.floor(mean_sq / avg_sq * 1e6 + 0.5)
    ) <= 2
    assert abs(
        got.rms_norm_x1e4 - math.floor(math.sqrt(avg_sq) * 1e4 + 0.5)
    ) <= 2
    # an isotropic-by-construction fixture should show LOW anisotropy
    assert 0 <= got.anisotropy_ppm < 200000


# ---------------------------------------------------------------------------
# matrix profile
# ---------------------------------------------------------------------------


def test_matrix_profile_matches_pure_python(spark):
    import math

    daily = _daily_cents(spark)
    xs = [int(v) for v in daily]
    wins = [xs[i:i + 4] for i in range(len(xs) - 3)]

    def znorm(w):
        m = sum(w) / 4.0
        sd = math.sqrt(sum(v * v for v in w) / 4.0 - m * m)
        return [(v - m) / sd for v in w]

    zs = [znorm(w) for w in wins]
    prof = {}
    for i in range(len(zs)):
        best = None
        for j in range(len(zs)):
            if abs(i - j) < 2:
                continue
            d2 = sum((a - b) ** 2 for a, b in zip(zs[i], zs[j]))
            if best is None or d2 < best[0] - 1e-12 or (
                abs(d2 - best[0]) <= 1e-12 and j + 1 < best[1]
            ):
                best = (d2, j + 1)
            # replicate exact double compare: track min then min index
        prof[i + 1] = best
    # recompute with exact tie semantics: min d2 then min ib at that d2
    prof = {}
    for i in range(len(zs)):
        d2s = {
            j + 1: sum((a - b) ** 2 for a, b in zip(zs[i], zs[j]))
            for j in range(len(zs)) if abs(i - j) >= 2
        }
        mn = min(d2s.values())
        nn_j = min(j for j, v in d2s.items() if v == mn)
        prof[i + 1] = (mn, nn_j)
    rows = sorted(
        (
            (i, j, math.floor(math.sqrt(d2) * 1e4 + 0.5))
            for i, (d2, j) in prof.items()
        ),
        key=lambda r: (-r[2], r[0]),
    )[:5]
    got = QUERIES["matrix_profile_daily"](spark, SF_CORRECT).toPandas()
    assert len(got) == 5
    for (i, j, d), (_, r) in zip(rows, got.iterrows()):
        assert r.window_idx == i
        # float fold-order slack: distances may differ in last ulp, so
        # the snapped value gets 1 unit and the argmin may tie-swap only
        # when distances are equal to snapping precision
        assert abs(r.nn_dist_x1e4 - d) <= 1
    # the top discord's distance bounds all reported ones
    ds = list(got.nn_dist_x1e4)
    assert ds == sorted(ds, reverse=True)


# ---------------------------------------------------------------------------
# German tank
# ---------------------------------------------------------------------------


def test_serial_number_estimate_matches_pure_python(spark):
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr("event_id").toPandas()
    )
    samp = [i for i in ev.event_id if i % 13 == 0]
    k, m = len(samp), max(samp)
    true_max = int(ev.event_id.max())
    est = m + m // k - 1
    got = (
        QUERIES["serial_number_estimate"](spark, SF_CORRECT)
        .toPandas().iloc[0]
    )
    assert (got.n_sampled, got.sample_max, got.true_max) == (k, m, true_max)
    assert got.estimate_mvue == est
    assert got.rel_err_ppm == abs(est - true_max) * 1000000 // true_max
    # the MVUE with a 1/13 sample should land within ~5/k of the truth
    assert got.rel_err_ppm < 5 * 1000000 // k


# ---------------------------------------------------------------------------
# Hurst R/S
# ---------------------------------------------------------------------------


def test_hurst_rs_matches_pure_python(spark):
    import math

    daily = _daily_cents(spark)
    xs = [int(v) for v in daily]
    stats = []
    for m in (4, 8, 16):
        rss = []
        for b in range(len(xs) // m):
            blk = xs[b * m:(b + 1) * m]
            mean = sum(blk) / m
            cs = 0.0
            ys = []
            for v in blk:
                cs += v
            # demeaned prefix sums
            run = 0.0
            for k, v in enumerate(blk, start=1):
                run += v
                ys.append(run - k * mean)
            r = max(ys) - min(ys)
            s = math.sqrt(sum((v - mean) ** 2 for v in blk) / m)
            if s > 0:
                rss.append(r / s)
        stats.append((m, sum(rss) / len(rss), len(rss)))
    lxy = [(math.log(m), math.log(rs)) for m, rs, _ in stats]
    k = len(lxy)
    sx = sum(x for x, _ in lxy)
    sy = sum(y for _, y in lxy)
    sxx = sum(x * x for x, _ in lxy)
    sxy = sum(x * y for x, y in lxy)
    h = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    got = QUERIES["hurst_rs_exponent"](spark, SF_CORRECT).toPandas()
    assert list(got.block_size) == [4, 8, 16]
    for (m, rs, nb), (_, r) in zip(stats, got.iterrows()):
        assert r.n_blocks == nb
        assert abs(r.rs_x1e4 - math.floor(rs * 1e4 + 0.5)) <= 1
        assert abs(r.hurst_micro - math.floor(h * 1e6 + 0.5)) <= 2
    # H of any real series lives in (0, 1)
    assert 0 < got.iloc[0].hurst_micro < 1000000


# ---------------------------------------------------------------------------
# engagement half-life
# ---------------------------------------------------------------------------


def test_engagement_half_life_matches_pure_python(spark):
    import math
    from collections import Counter

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "user_id",
            "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) d",
        )
        .toPandas()
    )
    first = ev.groupby("user_id").d.min().to_dict()
    wk = Counter((int(r.d) - first[r.user_id]) // 7 for _, r in ev.iterrows())
    pts = [(w, math.log(c)) for w, c in wk.items() if c >= 10]
    m = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    slope = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    got = (
        QUERIES["engagement_half_life"](spark, SF_CORRECT).toPandas().iloc[0]
    )
    assert got.n_weeks == m
    snap = math.floor(slope * 1e6 + (0.5 if slope >= 0 else -0.5))
    assert abs(got.slope_micro - snap) <= 1
    if slope < 0:
        assert abs(
            got.half_life_weeks_x1e4
            - math.floor(-math.log(2) / slope * 1e4 + 0.5)
        ) <= 1
    else:
        assert got.half_life_weeks_x1e4 == -1


# ---------------------------------------------------------------------------
# linear SHAP
# ---------------------------------------------------------------------------


def test_linear_shap_matches_pure_python(spark):
    import math

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr("user_id", "event_type").toPandas()
    )
    rows = []
    for _, g in ev.groupby("user_id"):
        rows.append((
            int((g.event_type == "click").sum()),
            int((g.event_type == "view").sum()),
            int((g.event_type == "purchase").sum()),
        ))
    n = len(rows)
    s1 = sum(a for a, _, _ in rows)
    s2 = sum(b for _, b, _ in rows)
    sy = sum(y for _, _, y in rows)
    s11 = sum(a * a for a, _, _ in rows)
    s12 = sum(a * b for a, b, _ in rows)
    s22 = sum(b * b for _, b, _ in rows)
    s1y = sum(a * y for a, _, y in rows)
    s2y = sum(b * y for _, b, y in rows)
    v1 = float(n * s11 - s1 * s1)
    v2 = float(n * s22 - s2 * s2)
    c12 = float(n * s12 - s1 * s2)
    c1y = float(n * s1y - s1 * sy)
    c2y = float(n * s2y - s2 * sy)
    det = v1 * v2 - c12 * c12
    w1 = (c1y * v2 - c2y * c12) / det
    w2 = (c2y * v1 - c1y * c12) / det
    m1, m2 = s1 / n, s2 / n
    mas1 = sum(abs(w1 * (a - m1)) for a, _, _ in rows) / n
    mas2 = sum(abs(w2 * (b - m2)) for _, b, _ in rows) / n
    got = (
        QUERIES["linear_shap_importance"](spark, SF_CORRECT)
        .toPandas().set_index("feature")
    )
    for name, w, mas in (("clicks", w1, mas1), ("views", w2, mas2)):
        r = got.loc[name]
        assert abs(
            r.weight_micro
            - math.floor(w * 1e6 + (0.5 if w >= 0 else -0.5))
        ) <= 1
        assert abs(r.mean_abs_shap_micro - math.floor(mas * 1e6 + 0.5)) <= 1
        assert abs(
            r.importance_share_ppm
            - math.floor(mas / (mas1 + mas2) * 1e6 + 0.5)
        ) <= 1
    # shares partition the attribution
    assert abs(got.importance_share_ppm.sum() - 1000000) <= 2


# ---------------------------------------------------------------------------
# partial dependence
# ---------------------------------------------------------------------------


def test_pdp_matches_pure_python(spark):
    docs = (
        spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select("text", "n_chars").toPandas()
    )
    feats = []
    for _, r in docs.iterrows():
        x1 = int(r.n_chars) // 64
        x2 = (len(r.text) - len(r.text.replace("spark", ""))) // 5
        feats.append((x1, x2, 1 if x2 >= 4 else 0))
    n = len(feats)
    denom = n * 2

    def trunc_div(a, b):
        return a // b if a >= 0 else -((-a) // b)

    w1 = w2 = b = 0
    for _ in range(8):
        g1 = g2 = g0 = 0
        for x1, x2, y in feats:
            p = min(1000000, max(0, 500000 + trunc_div(
                w1 * x1 + w2 * x2 + b, 4)))
            e = p - y * 1000000
            g1 += e * x1
            g2 += e * x2
            g0 += e
        w1 -= trunc_div(g1, denom)
        w2 -= trunc_div(g2, denom)
        b -= trunc_div(g0, denom)
    got = QUERIES["partial_dependence_profile"](spark, SF_CORRECT).toPandas()
    assert list(got.x1_value) == [0, 2, 4, 6, 8, 10, 12, 14]
    for _, r in got.iterrows():
        ps = [
            min(1000000, max(0, 500000 + trunc_div(
                w1 * int(r.x1_value) + w2 * x2 + b, 4)))
            for _, x2, _ in feats
        ]
        assert r.pdp_micro == sum(ps) // len(ps)
        assert r.ice_min_micro == min(ps)
        assert r.ice_max_micro == max(ps)
    # monotone model in x1 (positive weight) -> monotone PDP
    pd_ = list(got.pdp_micro)
    assert pd_ == sorted(pd_) or pd_ == sorted(pd_, reverse=True)


# ---------------------------------------------------------------------------
# ICC reliability
# ---------------------------------------------------------------------------


def test_icc_matches_pure_python(spark):
    import math

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "user_id", "CAST(FLOOR(value * 100e0) AS BIGINT) v",
        )
        .toPandas()
    )
    groups = {uid: [int(v) for v in g.v] for uid, g in ev.groupby("user_id")}
    ng = len(groups)
    n = sum(len(v) for v in groups.values())
    t_ = sum(sum(v) for v in groups.values())
    tss = sum(x * x for v in groups.values() for x in v)
    sg = sum(sum(v) * 1.0 * sum(v) / len(v) for v in groups.values())
    k2 = sum(len(v) ** 2 for v in groups.values())
    msb = (sg - t_ * 1.0 * t_ / n) / (ng - 1)
    msw = (tss * 1.0 - sg) / (n - ng)
    k0 = (n - k2 * 1.0 / n) / (ng - 1)
    icc = (msb - msw) / (msb + (k0 - 1.0) * msw)
    got = QUERIES["icc_reliability"](spark, SF_CORRECT).toPandas().iloc[0]
    assert (got.n_users, got.n_obs) == (ng, n)
    assert abs(got.msb_centi - math.floor(msb * 100 + 0.5)) <= 1
    assert abs(got.msw_centi - math.floor(msw * 100 + 0.5)) <= 1
    assert abs(got.k0_x1e4 - math.floor(k0 * 1e4 + 0.5)) <= 1
    snap = math.floor(icc * 1e6 + (0.5 if msb >= msw else -0.5))
    assert abs(got.icc_micro - snap) <= 1
    # ICC is bounded: (-1/(k0-1), 1)
    assert got.icc_micro < 1000000


# ---------------------------------------------------------------------------
# frozen threshold staleness
# ---------------------------------------------------------------------------


def test_frozen_threshold_matches_pure_python(spark):
    from collections import defaultdict

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) d",
            "CAST(FLOOR(value * 100e0) AS BIGINT) div 1000 band",
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END y",
        )
        .toPandas()
    )
    d0 = int(ev.d.min())
    ev["wk"] = (ev.d - d0) // 7
    cands = sorted(ev.band.unique())
    w0 = ev[ev.wk == 0]

    def acc(sub, thr):
        return int(((sub.band >= thr) == (sub.y == 1)).sum())

    best = max(
        cands,
        key=lambda thr: (acc(w0, thr) * 1000000 // len(w0), -thr),
    )
    got = QUERIES["frozen_threshold_staleness"](spark, SF_CORRECT).toPandas()
    assert (got.frozen_thr_band == best).all()
    for _, r in got.iterrows():
        sub = ev[ev.wk == r.week]
        assert r.n == len(sub)
        assert r.acc_frozen_ppm == acc(sub, best) * 1000000 // len(sub)
        opt = max(acc(sub, thr) for thr in cands)
        assert r.acc_oracle_ppm == opt * 1000000 // len(sub)
        assert r.regret_ppm == r.acc_oracle_ppm - r.acc_frozen_ppm
        # oracle dominates frozen by construction
        assert r.regret_ppm >= 0
    # week 0 regret is zero: the frozen model IS week 0's optimum
    assert got[got.week == 0].iloc[0].regret_ppm == 0


# ---------------------------------------------------------------------------
# weekly harmonic
# ---------------------------------------------------------------------------


def test_weekly_harmonic_matches_pure_python(spark):
    import math

    daily = _daily_cents(spark)
    from collections import defaultdict

    byd = defaultdict(list)
    for d, c in daily.items():
        byd[(d + 4) % 7].append(int(c))
    cos = [1.0, 0.623489801859, -0.222520933956, -0.900968867902,
           -0.900968867902, -0.222520933956, 0.623489801859]
    sin = [0.0, 0.781831482468, 0.974927912182, 0.433883739118,
           -0.433883739118, -0.974927912182, -0.781831482468]
    m = {k: sum(v) / len(v) for k, v in byd.items()}
    a0 = sum(m.values()) / 7.0
    a1 = sum(m[k] * cos[k] for k in m) * 2.0 / 7.0
    b1 = sum(m[k] * sin[k] for k in m) * 2.0 / 7.0
    amp = math.sqrt(a1 * a1 + b1 * b1)
    ph = math.atan2(b1, a1)
    got = (
        QUERIES["weekly_harmonic_fit"](spark, SF_CORRECT).toPandas().iloc[0]
    )
    assert abs(got.mean_cents - math.floor(a0 + 0.5)) <= 1
    assert abs(got.amplitude_cents - math.floor(amp + 0.5)) <= 1
    assert abs(
        got.phase_microrad
        - math.floor(ph * 1e6 + (0.5 if ph >= 0 else -0.5))
    ) <= 2
    assert abs(
        got.relative_amplitude_ppm
        - math.floor(amp / (a0 * 2.0) * 1e6 + 0.5)
    ) <= 1
    # amplitude can never exceed the mean profile's total range
    rng = max(m.values()) - min(m.values())
    assert got.amplitude_cents <= rng + 1


# ---------------------------------------------------------------------------
# edge triangle support
# ---------------------------------------------------------------------------


def test_edge_triangle_support_matches_pure_python(spark):
    from collections import Counter
    from itertools import combinations

    ids = [
        r.doc_id
        for r in spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select("doc_id").collect()
    ]
    edges = set()
    for i in ids:
        u = i % 61
        v = ((i // 61) * 2311 + i * 7919 + 13) % 61
        if u != v:
            edges.add((min(u, v), max(u, v)))
    sup = Counter()
    nodes = sorted({n for e in edges for n in e})
    eset = edges
    for x, y, z in combinations(nodes, 3):
        if (x, y) in eset and (y, z) in eset and (x, z) in eset:
            sup[(x, y)] += 1
            sup[(y, z)] += 1
            sup[(x, z)] += 1
    hist = Counter(sup.get(e, 0) for e in edges)
    got = QUERIES["edge_triangle_support"](spark, SF_CORRECT).toPandas()
    assert len(got) == len(hist)
    for _, r in got.iterrows():
        assert r.n_edges == hist[r.triangle_support]
        cum = sum(
            c for s, c in hist.items() if s >= r.triangle_support
        )
        assert r.n_edges_in_truss == cum
    # total triangle incidences = 3 x triangle count (cross-checks the
    # triangle_count entry's fixture expectations indirectly)
    assert sum(s * c for s, c in hist.items()) % 3 == 0


# ---------------------------------------------------------------------------
# VaR / ES
# ---------------------------------------------------------------------------


def test_var_es_matches_pure_python(spark):
    daily = _daily_cents(spark)
    xs = sorted(int(v) for v in daily)
    n = len(xs)
    v = next(val for r, val in enumerate(xs, start=1) if r * 20 > n)
    tail = [x for x in xs if x <= v]
    got = QUERIES["value_at_risk_es"](spark, SF_CORRECT).toPandas().iloc[0]
    assert got.n_days == n
    assert got.var5_cents == v
    assert got.n_tail_days == len(tail)
    assert got.es_cents == sum(tail) // len(tail)
    # ES is at most VaR (it averages the days at or below it)
    assert got.es_cents <= got.var5_cents


# ---------------------------------------------------------------------------
# max drawdown
# ---------------------------------------------------------------------------


def test_max_drawdown_matches_pure_python(spark):
    daily = _daily_cents(spark)
    eq = 0
    peak = None
    curve = []
    for d, c in daily.items():
        eq += int(c) - 1600000
        curve.append((d, eq))
    peak = -10**18
    best = None
    peaks = []
    for d, e in curve:
        peak = max(peak, e)
        peaks.append(peak)
        ddn = peak - e
        if best is None or ddn > best[1]:
            best = (d, ddn, peak)
    trough_day, mdd, pk = best
    peak_day = min(
        d for (d, e), p in zip(curve, peaks)
        if e == pk and d <= trough_day
    )
    got = QUERIES["max_drawdown"](spark, SF_CORRECT).toPandas().iloc[0]
    assert got.trough_day == trough_day
    assert got.peak_day == peak_day
    assert got.duration_days == trough_day - peak_day
    assert got.max_drawdown_cents == mdd
    assert got.peak_equity_cents == pk
    # drawdown is nonnegative and peak precedes (or is) the trough
    assert mdd >= 0 and peak_day <= trough_day


# ---------------------------------------------------------------------------
# energy distance
# ---------------------------------------------------------------------------


def test_energy_distance_matches_pure_python(spark):
    import math

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .where(
            "event_type IN ('purchase', 'click') AND event_id % 5 = 0"
        )
        .selectExpr("event_type", "event_id").toPandas()
    )

    def pt(i):
        return (
            (i % 787) * 889.45 + 17.3,
            (int(i / 13.0) % 787) * 889.45 + 11.7,
        )

    xs = [pt(i) for i in ev[ev.event_type == "purchase"].event_id]
    ys = [pt(i) for i in ev[ev.event_type == "click"].event_id]

    def mean_d(a, b):
        return sum(
            math.hypot(p[0] - q[0], p[1] - q[1]) for p in a for q in b
        ) / (len(a) * len(b))

    exy = mean_d(xs, ys)
    exx = mean_d(xs, xs)
    eyy = mean_d(ys, ys)
    ed = 2 * exy - exx - eyy
    got = QUERIES["energy_distance_2d"](spark, SF_CORRECT).toPandas().iloc[0]
    assert (got.n_x, got.n_y) == (len(xs), len(ys))
    assert abs(got.mean_cross_dist - math.floor(exy + 0.5)) <= 1
    assert abs(got.energy_dist_centi - math.floor(ed * 100 + 0.5)) <= 2
    # energy distance is nonnegative (zero iff equal distributions)
    assert got.energy_dist_centi >= -1


# ---------------------------------------------------------------------------
# Welch t-test
# ---------------------------------------------------------------------------


def test_welch_matches_pure_python(spark):
    import math

    daily = _daily_cents(spark)
    wkend = [int(c) for d, c in daily.items() if (d + 4) % 7 in (5, 6)]
    wkday = [int(c) for d, c in daily.items() if (d + 4) % 7 not in (5, 6)]

    def mv(xs):
        n = len(xs)
        m = sum(xs) / n
        v = (sum(x * x for x in xs) - sum(xs) ** 2 / n) / (n - 1)
        return n, m, v

    n1, m1, v1 = mv(wkend)
    n0, m0, v0 = mv(wkday)
    t_ = (m1 - m0) / math.sqrt(v1 / n1 + v0 / n0)
    df = (v1 / n1 + v0 / n0) ** 2 / (
        (v1 / n1) ** 2 / (n1 - 1) + (v0 / n0) ** 2 / (n0 - 1)
    )
    got = (
        QUERIES["welch_ttest_weekend"](spark, SF_CORRECT).toPandas().iloc[0]
    )
    assert (got.n_weekend, got.n_weekday) == (n1, n0)
    sgn = 0.5 if m1 >= m0 else -0.5
    assert abs(got.mean_diff_cents - math.floor((m1 - m0) + sgn)) <= 1
    assert abs(got.t_micro - math.floor(t_ * 1e6 + sgn)) <= 1
    assert abs(got.welch_df_x1e4 - math.floor(df * 1e4 + 0.5)) <= 1
    # Welch df is bounded by min(n-1) and n1+n0-2
    assert min(n1, n0) - 1 <= got.welch_df_x1e4 / 1e4 <= n1 + n0 - 2


# ---------------------------------------------------------------------------
# McNemar
# ---------------------------------------------------------------------------


def test_mcnemar_matches_pure_python(spark):
    import math

    docs = (
        spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select("text", "n_chars").toPandas()
    )
    feats = []
    for _, r in docs.iterrows():
        x1 = int(r.n_chars) // 64
        x2 = (len(r.text) - len(r.text.replace("spark", ""))) // 5
        feats.append((x1, x2, 1 if x2 >= 4 else 0))
    n = len(feats)
    denom = n * 2

    def trunc_div(a, b):
        return a // b if a >= 0 else -((-a) // b)

    w1 = w2 = b_ = 0
    for _ in range(8):
        g1 = g2 = g0 = 0
        for x1, x2, y in feats:
            p = min(1000000, max(0, 500000 + trunc_div(
                w1 * x1 + w2 * x2 + b_, 4)))
            e = p - y * 1000000
            g1 += e * x1
            g2 += e * x2
            g0 += e
        w1 -= trunc_div(g1, denom)
        w2 -= trunc_div(g2, denom)
        b_ -= trunc_div(g0, denom)
    bcnt = ccnt = a_right = b_right = 0
    for x1, x2, y in feats:
        p = min(1000000, max(0, 500000 + trunc_div(
            w1 * x1 + w2 * x2 + b_, 4)))
        a = 1 if p >= 500000 else 0
        bb = 1 if x1 >= 8 else 0
        a_right += a == y
        b_right += bb == y
        if a == y and bb != y:
            bcnt += 1
        if a != y and bb == y:
            ccnt += 1
    chi2 = (abs(bcnt - ccnt) - 1.0) ** 2 / (bcnt + ccnt)
    got = (
        QUERIES["mcnemar_model_compare"](spark, SF_CORRECT)
        .toPandas().iloc[0]
    )
    assert got.n == n
    assert (got.n_a_right, got.n_b_right) == (a_right, b_right)
    assert (got.a_only_right, got.b_only_right) == (bcnt, ccnt)
    assert got.mcnemar_chi2_micro == math.floor(chi2 * 1e6 + 0.5)


# ---------------------------------------------------------------------------
# Cliff's delta
# ---------------------------------------------------------------------------


def test_cliffs_delta_matches_pure_python(spark):
    daily = _daily_cents(spark)
    we = [int(c) for d, c in daily.items() if (d + 4) % 7 in (5, 6)]
    wd = [int(c) for d, c in daily.items() if (d + 4) % 7 not in (5, 6)]
    gt = sum(1 for a in we for b in wd if a > b)
    lt = sum(1 for a in we for b in wd if a < b)
    np_ = len(we) * len(wd)

    def tdiv(a, b):
        return a // b if a >= 0 else -((-a) // b)

    delta = tdiv((gt - lt) * 1000000, np_)
    mag_v = abs(gt - lt) * 1000000 // np_
    mag = (
        "negligible" if mag_v < 147000
        else "small" if mag_v < 330000
        else "medium" if mag_v < 474000 else "large"
    )
    got = (
        QUERIES["cliffs_delta_effect"](spark, SF_CORRECT).toPandas().iloc[0]
    )
    assert (got.n_weekend, got.n_weekday) == (len(we), len(wd))
    assert (got.n_greater, got.n_less) == (gt, lt)
    assert got.delta_micro == delta
    assert got.magnitude == mag
    assert -1000000 <= got.delta_micro <= 1000000


# ---------------------------------------------------------------------------
# Weibull rank fit
# ---------------------------------------------------------------------------


def test_weibull_fit_matches_pure_python(spark):
    import math

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .where("event_type = 'purchase'")
        .selectExpr("user_id", "CAST(ts AS DATE) dt")
        .toPandas()
    )
    lts = sorted(
        (g.dt.max() - g.dt.min()).days + 1
        for _, g in ev.groupby("user_id")
    )
    n = len(lts)
    pts = [
        (math.log(t_), math.log(-math.log(1.0 - (r - 0.3) / (n + 0.4))))
        for r, t_ in enumerate(lts, start=1)
    ]
    m = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    shape = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    icept = (sy - shape * sx) / m
    got = QUERIES["weibull_rank_fit"](spark, SF_CORRECT).toPandas().iloc[0]
    assert got.n_lifetimes == n
    assert abs(got.shape_micro - math.floor(shape * 1e6 + 0.5)) <= 1
    assert abs(
        got.scale_days_x1e4
        - math.floor(math.exp(-icept / shape) * 1e4 + 0.5)
    ) <= 1
    exp_reg = (
        "wear_out" if shape > 1 else
        "infant_mortality" if shape < 1 else "memoryless"
    )
    assert got.hazard_regime == exp_reg
    assert got.shape_micro > 0  # Weibull shape is positive


# ---------------------------------------------------------------------------
# posted price optimizer
# ---------------------------------------------------------------------------


def test_posted_price_matches_pure_python(spark):
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .where("event_type = 'purchase'")
        .selectExpr("CAST(FLOOR(value * 100e0) AS BIGINT) v")
        .toPandas()
    )
    bids = [int(v) for v in ev.v]
    cands = sorted({(v // 1000) * 1000 for v in bids})
    rows = []
    for p in cands:
        q_ = sum(1 for b in bids if b >= p)
        rows.append((p, q_, p * q_))
    rows.sort(key=lambda r: (-r[2], r[0]))
    got = QUERIES["posted_price_optimizer"](spark, SF_CORRECT).toPandas()
    assert len(got) == min(10, len(rows))
    for (p, q_, rev), (_, r) in zip(rows[:10], got.iterrows()):
        assert (r.price_cents, r.n_buyers, r.revenue_cents) == (p, q_, rev)
    assert got.is_optimal.sum() == 1
    assert got.iloc[0].is_optimal == 1
    # the optimum beats both pricing extremes
    assert rows[0][2] >= max(
        cands[0] * len(bids),
        cands[-1] * sum(1 for b in bids if b >= cands[-1]),
    )


# ---------------------------------------------------------------------------
# cache TTL curve
# ---------------------------------------------------------------------------


def test_ttl_curve_matches_pure_python(spark):
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "user_id", "event_id",
            "CAST(unix_timestamp(ts) AS BIGINT) es",
        )
        .toPandas()
        .sort_values(["user_id", "es", "event_id"])
    )
    gaps = []
    for _, g in ev.groupby("user_id"):
        es = list(g.es)
        gaps += [b - a for a, b in zip(es, es[1:])]
    n = len(gaps)
    got = QUERIES["cache_ttl_hit_curve"](spark, SF_CORRECT).toPandas()
    assert list(got.ttl_seconds) == [60, 300, 900, 3600, 14400, 86400]
    prev = -1
    for _, r in got.iterrows():
        hits = sum(1 for g_ in gaps if g_ <= r.ttl_seconds)
        assert r.n_hits == hits
        assert r.hit_ppm == hits * 1000000 // n
        # CDF: hit rate is monotone in TTL
        assert r.hit_ppm >= prev
        prev = r.hit_ppm


# ---------------------------------------------------------------------------
# Qn scale
# ---------------------------------------------------------------------------


def test_qn_matches_pure_python(spark):
    import math

    daily = _daily_cents(spark)
    xs = [int(v) for v in daily]
    diffs = sorted(
        abs(xs[i] - xs[j])
        for i in range(len(xs)) for j in range(i + 1, len(xs))
    )
    np_ = len(diffs)
    qn = next(v for r, v in enumerate(diffs, start=1) if r * 4 > np_)
    got = QUERIES["qn_scale_estimator"](spark, SF_CORRECT).toPandas().iloc[0]
    assert got.n_days == len(xs)
    assert got.n_pairs == np_
    assert got.qn_raw_cents == qn
    assert got.qn_scaled_cents == math.floor(qn * 2.2219 + 0.5)
    # Qn is a scale: positive, and below the full range
    assert 0 < got.qn_raw_cents < max(xs) - min(xs)


# ---------------------------------------------------------------------------
# Chow test
# ---------------------------------------------------------------------------


def test_chow_matches_pure_python(spark):
    import math

    daily = _daily_cents(spark)
    d0 = min(daily.index)
    d1 = max(daily.index)
    mid2 = d0 + d1 + 1
    pts = [(d - d0, int(c), 1 if d * 2 < mid2 else 2)
           for d, c in daily.items()]

    def sse(rows):
        n = len(rows)
        sx = sum(x for x, _ in rows)
        sy = sum(y for _, y in rows)
        sxx = sum(x * x for x, _ in rows)
        sxy = sum(x * y for x, y in rows)
        syy = sum(y * y for _, y in rows)
        return (syy - sy * sy / n) - (sxy - sx * sy / n) ** 2 / (
            sxx - sx * sx / n
        )

    allr = [(x, y) for x, y, _ in pts]
    r1 = [(x, y) for x, y, s in pts if s == 1]
    r2 = [(x, y) for x, y, s in pts if s == 2]
    ep = sse(allr)
    es = sse(r1) + sse(r2)
    n = len(allr)
    f = ((ep - es) / 2.0) / (es / (n - 4))
    got = QUERIES["chow_test_midpoint"](spark, SF_CORRECT).toPandas().iloc[0]
    assert got.n_days == n
    assert abs(got.sse_pooled_x1e4 - math.floor(ep * 1e-4 + 0.5)) <= 1
    assert abs(got.sse_split_x1e4 - math.floor(es * 1e-4 + 0.5)) <= 1
    assert abs(got.chow_f_micro - math.floor(f * 1e6 + 0.5)) <= 1
    # splitting can only reduce SSE; F is nonnegative
    assert es <= ep + 1e-6 and got.chow_f_micro >= 0


# ---------------------------------------------------------------------------
# footrule rank shift
# ---------------------------------------------------------------------------


def test_footrule_matches_pure_python(spark):
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "event_type",
            "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) d",
            "CAST(FLOOR(value * 100e0) AS BIGINT) cents",
        )
        .toPandas()
    )
    mid2 = int(ev.d.min()) + int(ev.d.max()) + 1
    ev["period"] = (ev.d * 2 < mid2).map({True: 1, False: 2})
    ranks = {}
    for p in (1, 2):
        seg = (
            ev[ev.period == p].groupby("event_type").cents.sum()
            .reset_index().sort_values(
                ["cents", "event_type"], ascending=[False, True]
            )
        )
        for r, (_, row) in enumerate(seg.iterrows(), start=1):
            ranks[(row.event_type, p)] = r
    types = sorted(ev.event_type.unique())
    disp = {t_: abs(ranks[(t_, 1)] - ranks[(t_, 2)]) for t_ in types}
    total = sum(disp.values())
    got = QUERIES["footrule_rank_shift"](spark, SF_CORRECT).toPandas()
    assert len(got) == len(types)
    for _, r in got.iterrows():
        assert r.rank_h1 == ranks[(r.event_type, 1)]
        assert r.rank_h2 == ranks[(r.event_type, 2)]
        assert r.displacement == disp[r.event_type]
        assert r.footrule_total == total
    # footrule parity: the total displacement is always even
    assert total % 2 == 0


# ---------------------------------------------------------------------------
# Ljung-Box
# ---------------------------------------------------------------------------


def test_ljung_box_matches_pure_python(spark):
    import math

    daily = _daily_cents(spark)
    xs = [int(v) for v in daily]
    n = len(xs)
    mu = sum(xs) * 1.0 / n
    den = sum((x - mu) ** 2 for x in xs)
    total = 0.0
    for k in range(1, 6):
        num = sum((xs[i] - mu) * (xs[i + k] - mu) for i in range(n - k))
        rk = num / den
        total += rk * rk / (n - k)
    q = n * (n + 2.0) * total
    got = QUERIES["ljung_box_test"](spark, SF_CORRECT).toPandas().iloc[0]
    assert (got.n_days, got.n_lags) == (n, 5)
    assert abs(got.q_micro - math.floor(q * 1e6 + 0.5)) <= 2
    assert got.q_micro >= 0


# ---------------------------------------------------------------------------
# Taylor's law
# ---------------------------------------------------------------------------


def test_taylors_law_matches_pure_python(spark):
    import math

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "event_type",
            "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) d",
        )
        .toPandas()
    )
    pts = []
    moms = {}
    for et, g in ev.groupby("event_type"):
        cs = list(g.groupby("d").size())
        n = len(cs)
        m = sum(cs) / n
        v = (sum(c * c for c in cs) - sum(cs) ** 2 / n) / (n - 1)
        moms[et] = (m, v)
        pts.append((math.log(m), math.log(v)))
    k = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    b = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    got = QUERIES["taylors_law_fit"](spark, SF_CORRECT).toPandas()
    for _, r in got.iterrows():
        m, v = moms[r.event_type]
        assert abs(r.mean_centi - math.floor(m * 100 + 0.5)) <= 1
        assert abs(r.var_centi - math.floor(v * 100 + 0.5)) <= 1
        assert abs(r.taylor_b_micro - math.floor(b * 1e6 + 0.5)) <= 2


# ---------------------------------------------------------------------------
# Pareto 80/20
# ---------------------------------------------------------------------------


def test_pareto_8020_matches_pure_python(spark):
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "user_id", "CAST(FLOOR(value * 100e0) AS BIGINT) cents",
        )
        .toPandas()
    )
    totals = sorted(
        ((int(g.cents.sum()), uid) for uid, g in ev.groupby("user_id")),
        key=lambda t_: (-t_[0], t_[1]),
    )
    s = sum(v for v, _ in totals)
    cum = 0
    k = None
    for r, (v, _) in enumerate(totals, start=1):
        cum += v
        if cum * 5 >= s * 4:
            k = r
            break
    got = QUERIES["pareto_8020_point"](spark, SF_CORRECT).toPandas().iloc[0]
    assert got.n_users == len(totals)
    assert got.total_cents == s
    assert got.top_users_for_80pct == k
    assert got.top_share_ppm == k * 1000000 // len(totals)
    # the cut is genuinely minimal
    assert (cum - totals[k - 1][0]) * 5 < s * 4
