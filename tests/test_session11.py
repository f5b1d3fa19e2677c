"""Session-11 operator invariants: readability bands, window-free
Spearman, public-suffix registered domains, phonetic blocking.

Each test recomputes the operator's semantics through an INDEPENDENT
path (pure Python / pandas) and compares against the distributed query —
the DuckDB oracle pins cross-engine parity; these pin the algorithm.
"""

from __future__ import annotations

import math

import pandas as pd

from osmgraft.contract import QUERIES
from tests.conftest import SF_CORRECT

import osmgraft.contract_select  # noqa: F401  (registers entries)


def _docs(spark) -> pd.DataFrame:
    return (
        spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select("doc_id", "lang", "text", "n_chars")
        .toPandas()
    )


# ---------------------------------------------------------------------------
# readability
# ---------------------------------------------------------------------------


def test_readability_matches_pure_python(spark):
    """Band rollup == a per-doc pure-Python Flesch recompute."""
    import re

    docs = _docs(spark)
    got = QUERIES["readability_bands"](spark, SF_CORRECT).toPandas()
    exp: dict[tuple[str, int], list[float]] = {}
    for _, r in docs.iterrows():
        words = r.text.split(" ")
        w = len(words)
        if w < 1:
            continue
        slen = 8 + int(r.doc_id) % 5
        s = (w + slen - 1) // slen
        sy = len(re.findall(r"[aeiou]+", r.text))
        score = round(206.835 - 1.015 * (w / s) - 84.6 * (sy / w), 4)
        band = math.floor(score / 10.0)
        exp.setdefault((r.lang, band), []).append(score)
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        scores = exp[(r.lang, int(r.band))]
        assert r.n_docs == len(scores)
        assert abs(r.avg_score - sum(scores) / len(scores)) < 1e-3
        assert r.min_score == min(scores)
        assert r.max_score == max(scores)


# ---------------------------------------------------------------------------
# Spearman
# ---------------------------------------------------------------------------


def test_spearman_matches_pandas(spark):
    """Window-free rho == Pearson-of-average-ranks recomputed with
    pandas rank() + numpy (the textbook tie-corrected definition)."""
    import numpy as np

    docs = _docs(spark)
    docs["y"] = docs.text.apply(lambda t: (len(t) - len(t.replace("spark", ""))) // 5)
    got = QUERIES["spearman_corr"](spark, SF_CORRECT).toPandas()
    for _, r in got.iterrows():
        g = docs[docs.lang == r.lang]
        rx = g.n_chars.rank(method="average").to_numpy()
        ry = g.y.rank(method="average").to_numpy()
        ref = np.corrcoef(rx, ry)[0, 1]
        assert r.n_docs == len(g)
        assert abs(r.rho_spearman - ref) < 1e-6, (r.lang, r.rho_spearman, ref)


def test_spearman_plan_windows_run_post_agg_only(spark):
    """No window over the raw documents relation: every window is
    lang-partitioned and sits above a per-value aggregate; no
    SinglePartition exchange anywhere."""
    from tests.test_plans import plan_of

    df = QUERIES["spearman_corr"](spark, SF_CORRECT)
    plan = plan_of(df)
    assert "SinglePartition" not in plan
    assert plan.count("BroadcastHashJoin") == 2
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "lang" in line, line


# ---------------------------------------------------------------------------
# registered domains
# ---------------------------------------------------------------------------

_PSL = dict(osmgraft.contract_select._PSL)
_SUFFIXES = ["co.uk", "com", "org.uk", "github.io", "net", "ac.uk", "io", "gov.uk"]


def test_registered_domain_matches_pure_python(spark):
    docs = _docs(spark)
    exp: dict[str, tuple[str, int, set]] = {}
    for did in docs.doc_id:
        did = int(did)
        host = (
            ("www." if did % 3 == 0 else "")
            + f"site{did % 23}."
            + _SUFFIXES[did % 8]
        )
        labels = host.split(".")
        best = None
        for k in range(1, min(3, len(labels) - 1) + 1):
            tail = ".".join(labels[-k:])
            if tail in _PSL:
                best = k
        assert best is not None
        regdom = ".".join(labels[-(best + 1):])
        suffix = ".".join(labels[-best:])
        n_pages, hosts = exp.get(regdom, (0, set()))[1:] if regdom in exp else (0, set())
        if regdom not in exp:
            exp[regdom] = (suffix, 0, set())
        sfx, np_, hs = exp[regdom]
        hs.add(host)
        exp[regdom] = (sfx, np_ + 1, hs)
    got = QUERIES["registered_domain_rollup"](spark, SF_CORRECT).toPandas()
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        sfx, np_, hs = exp[r.regdom]
        assert r.public_suffix == sfx
        assert r.n_pages == np_
        assert r.n_hosts == len(hs)


def test_registered_domain_longest_match_beats_shorter(spark):
    """Multi-label suffixes actually win over their 1-label tails:
    every co.uk/github.io host resolves to the 2-label suffix."""
    got = QUERIES["registered_domain_rollup"](spark, SF_CORRECT).toPandas()
    assert (got[got.regdom.str.endswith(".co.uk")].public_suffix == "co.uk").all()
    assert (
        got[got.regdom.str.endswith(".github.io")].public_suffix == "github.io"
    ).all()
    assert "uk" not in set(got.public_suffix)  # 1-label 'uk' never wins
    assert {"io", "com", "net"} < set(got.public_suffix)


def test_registered_domain_psl_join_is_broadcast(spark):
    from tests.test_plans import plan_of

    df = QUERIES["registered_domain_rollup"](spark, SF_CORRECT)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "doc_id" in line, line


# ---------------------------------------------------------------------------
# phonetic blocking
# ---------------------------------------------------------------------------


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


def test_phonetic_blocking_matches_pure_python(spark):
    import re

    from osmgraft.contract_select import _PB_FIRST, _PB_LAST

    cust = (
        spark.read.parquet(f"{SF_CORRECT}/customer.parquet")
        .select("c_custkey")
        .toPandas()
    )
    names = set()
    for k in cust.c_custkey:
        k = int(k)
        nm = f"{_PB_FIRST[k % 8]} {_PB_LAST[(k // 8) % 8]}"
        if k % 5 == 0:
            nm = nm.replace("e", "a")
        elif k % 7 == 0:
            nm = nm + nm[-1]
        names.add(nm)
    blocks: dict[str, set] = {}
    for nm in names:
        bkey = nm[0].upper() + re.sub(r"[aeiou ]", "", nm[1:])[:4]
        blocks.setdefault(bkey, set()).add(nm)
    exp = {}
    for bkey, ns in blocks.items():
        pairs = [
            (a, b)
            for a in ns
            for b in ns
            if a < b and _lev(a, b) <= 2
        ]
        exp[bkey] = (len(ns), len(pairs),
                     min((_lev(a, b) for a, b in pairs), default=None))
    got = QUERIES["phonetic_blocking_pairs"](spark, SF_CORRECT).toPandas()
    assert len(got) == len(exp)
    n_pairs_total = 0
    for _, r in got.iterrows():
        n_names, n_pairs, min_lev = exp[r.bkey]
        assert r.n_names == n_names
        assert r.n_match_pairs == n_pairs
        if n_pairs:
            assert r.min_lev == min_lev
        n_pairs_total += n_pairs
    # both typo classes are actually caught by the blocking key
    assert n_pairs_total >= 8


def test_phonetic_join_is_block_keyed(spark):
    from tests.test_plans import plan_of

    df = QUERIES["phonetic_blocking_pairs"](spark, SF_CORRECT)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SinglePartition" not in plan


# ---------------------------------------------------------------------------
# Markov steady state
# ---------------------------------------------------------------------------


def test_markov_matches_pure_python(spark):
    """Integer power iteration == a pure-Python recompute (exact)."""
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    counts: dict[tuple[str, str], int] = {}
    prev_user, prev_type = None, None
    for _, r in ev.iterrows():
        if r.user_id == prev_user:
            counts[(prev_type, r.event_type)] = (
                counts.get((prev_type, r.event_type), 0) + 1
            )
        prev_user, prev_type = r.user_id, r.event_type
    states = sorted({i for i, _ in counts})
    tot = {i: sum(c for (a, _), c in counts.items() if a == i) for i in states}
    p = {
        (i, j): counts.get((i, j), 0) * 1000000 // tot[i]
        for i in states
        for j in states
        if (i, j) in counts
    }
    v = {s: 200000 for s in states}
    hist = []
    for _ in range(12):
        nv = {}
        for j in states:
            acc = sum(v[i] * pm for (i, jj), pm in p.items() if jj == j and i in v)
            nv[j] = acc // 1000000
        hist.append(v)
        v = nv
    got = QUERIES["markov_steady_state"](spark, SF_CORRECT).toPandas()
    for _, r in got.iterrows():
        assert r.p_steady_micro == v[r.state], (r.state, r.p_steady_micro, v[r.state])
        assert r.conv_delta_micro == abs(v[r.state] - hist[-1][r.state])
    # mass is conserved up to floor loss, and iteration has converged
    assert 1000000 - 60 <= got.p_steady_micro.sum() <= 1000000
    assert got.conv_delta_micro.max() <= 5


def test_markov_lag_window_is_user_keyed(spark):
    from tests.test_plans import plan_of

    df = QUERIES["markov_steady_state"](spark, SF_CORRECT)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "user_id" in line, line


# ---------------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------------


def test_dsir_matches_pure_python(spark):
    import math as m

    from osmgraft.contract_select import _DSIR_B, _DSIR_K, _DSIR_P, _DSIR_TARGET

    docs = _docs(spark)

    def bucket(w: str) -> int:
        h = 0
        for ch in w:
            h = (h * 31 + ord(ch)) % _DSIR_P
        return h % _DSIR_B

    raw: dict[int, int] = {}
    tgt: dict[int, int] = {}
    per_doc: dict[int, dict[int, int]] = {}
    lang_of: dict[int, str] = {}
    for _, r in docs.iterrows():
        bs = [bucket(w) for w in r.text.split(" ")]
        lang_of[int(r.doc_id)] = r.lang
        d = per_doc.setdefault(int(r.doc_id), {})
        for b in bs:
            raw[b] = raw.get(b, 0) + 1
            d[b] = d.get(b, 0) + 1
            if r.lang == _DSIR_TARGET:
                tgt[b] = tgt.get(b, 0) + 1
    n_raw, n_tgt = sum(raw.values()), sum(tgt.values())
    lr = {
        b: m.floor(
            (
                m.log((tgt.get(b, 0) + 1.0) / (n_tgt + _DSIR_B))
                - m.log((raw[b] + 1.0) / (n_raw + _DSIR_B))
            )
            * 1.0e6
            + 0.5
        )
        for b in raw
    }
    weights = {
        did: sum(c * lr[b] for b, c in bs.items()) for did, bs in per_doc.items()
    }
    exp = sorted(weights.items(), key=lambda kv: (-kv[1], kv[0]))[:_DSIR_K]
    got = QUERIES["dsir_importance_select"](spark, SF_CORRECT).toPandas()
    assert list(got["rank"]) == list(range(1, _DSIR_K + 1))
    for (did, wt), (_, r) in zip(exp, got.iterrows()):
        assert r.doc_id == did and r.weight_micro == wt
        assert r.lang == lang_of[did]


def test_dsir_topk_is_take_ordered(spark):
    """The selection is a per-partition top-k, never a global sort of
    the scored corpus."""
    from tests.test_plans import plan_of

    df = QUERIES["dsir_importance_select"](spark, SF_CORRECT)
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# k-center coreset
# ---------------------------------------------------------------------------


def test_kcenter_matches_numpy_greedy(spark):
    import numpy as np

    emb = (
        spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
        .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) v")
        .toPandas()
        .sort_values("vec_id")
    )
    ids = emb.vec_id.to_numpy()
    X = np.array(emb.v.tolist())
    chosen = [0]
    radii = [0.0]
    mind = None
    for _ in range(4):
        c = X[ids == chosen[-1]][0]
        d = np.round(((X - c) ** 2).sum(axis=1), 6)
        mind = d if mind is None else np.minimum(mind, d)
        mask = ~np.isin(ids, chosen)
        best = max(zip(mind[mask], -ids[mask]), key=lambda t: (t[0], t[1]))
        chosen.append(int(-best[1]))
        radii.append(float(best[0]))
    got = QUERIES["kcenter_coreset"](spark, SF_CORRECT).toPandas()
    assert list(got.center_id) == chosen
    for a, b in zip(got.radius_d2, radii):
        assert abs(a - b) < 1e-9
    # greedy coverage radius is non-increasing after the seed round
    r = list(got.radius_d2)[1:]
    assert all(x >= y for x, y in zip(r, r[1:]))
    assert got.n_assigned.sum() == len(emb)


def test_kcenter_no_self_join(spark):
    from tests.test_plans import plan_of

    df = QUERIES["kcenter_coreset"](spark, SF_CORRECT)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # everything joins via broadcast


# ---------------------------------------------------------------------------
# t-closeness
# ---------------------------------------------------------------------------


def test_t_closeness_matches_pure_python(spark):
    import json

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "event_type",
            "(CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INTEGER) + 4) % 7"
            " AS dow",
            "CAST(FLOOR(value / 500.0e0) AS BIGINT) AS value_band",
            "props",
        )
        .toPandas()
    )
    ev["sens"] = ev.props.apply(lambda s: int(json.loads(s)["k"]) // 10)
    bins = sorted(ev.sens.unique())
    gl = ev.sens.value_counts().to_dict()
    n, nb = len(ev), len(bins)
    bands: dict[int, list] = {}
    for _, g in ev.groupby(["event_type", "dow", "value_band"]):
        m = len(g)
        gc = g.sens.value_counts().to_dict()
        cum, acc = 0, 0
        for i, s in enumerate(bins):
            cum += gl.get(s, 0) * m - gc.get(s, 0) * n
            if i < nb - 1:
                acc += abs(cum)
        emd_micro = math.floor(acc * 1.0e6 / (n * m * (nb - 1)) + 0.5)
        bands.setdefault(emd_micro // 5000, []).append((m, emd_micro))
    got = QUERIES["t_closeness_audit"](spark, SF_CORRECT).toPandas()
    assert len(got) == len(bands)
    for _, r in got.iterrows():
        rows = bands[int(r.t_band)]
        assert r.n_classes == len(rows)
        assert r.n_rows == sum(m for m, _ in rows)
        assert r.max_emd_micro == max(e for _, e in rows)
        assert r.n_risky_rows == sum(m for m, e in rows if e > 25000)


# ---------------------------------------------------------------------------
# Brier decomposition
# ---------------------------------------------------------------------------


def test_brier_decomposition_identity_and_recompute(spark):
    docs = _docs(spark)
    hits = docs.text.apply(lambda t: (len(t) - len(t.replace("spark", ""))) // 5)
    score = (hits * 1000000) // docs.n_chars
    y = (hits >= 4).astype(int)
    mxs = int(score.max())
    p = (score * 1000000) // (mxs + 1)
    bins = (p // 50000).clip(upper=19)
    n = len(docs)
    brier = float(((p - y * 1000000) ** 2).sum()) / n / 1e12
    rel = res = 0
    o = int(y.sum())
    for k in sorted(bins.unique()):
        mask = bins == k
        nk, sp, ok = int(mask.sum()), int(p[mask].sum()), int(y[mask].sum())
        rel += math.floor((sp - ok * 1e6) ** 2 / nk)
        res += math.floor((ok * 1.0 * n - o * 1.0 * nk) ** 2 * 1e12 / (nk * 1.0 * n * n))
    got = QUERIES["brier_decomposition"](spark, SF_CORRECT).toPandas().iloc[0]
    assert got.n == n
    assert abs(got.brier - round(brier, 6)) < 1e-9
    assert abs(got.reliability - rel / n / 1e12) < 1e-6
    assert abs(got.resolution - res / n / 1e12) < 1e-6
    unc = (o / n) * (1 - o / n)
    assert abs(got.uncertainty - unc) < 1e-6
    # Murphy identity holds up to within-bin prediction variance
    assert abs(got.brier - (got.reliability - got.resolution + got.uncertainty)) < 0.02


# ---------------------------------------------------------------------------
# hard-sigmoid logistic regression
# ---------------------------------------------------------------------------


def test_hard_sigmoid_logreg_matches_pure_python(spark):
    docs = _docs(spark)
    hits = docs.text.apply(lambda t: (len(t) - len(t.replace("spark", ""))) // 5)
    x1 = (docs.n_chars // 64).astype(int)
    x2 = hits.astype(int)
    y = (hits >= 4).astype(int)
    n = len(docs)

    def tdiv(a: int, b: int) -> int:  # truncation toward zero, both engines
        q = abs(a) // b
        return q if a >= 0 else -q

    w1 = w2 = b = 0
    for _ in range(8):
        z = w1 * x1 + w2 * x2 + b
        p = (500000 + z.apply(lambda v: tdiv(v, 4))).clip(0, 1000000)
        e = p - y * 1000000
        g1, g2, g0 = int((e * x1).sum()), int((e * x2).sum()), int(e.sum())
        w1 -= tdiv(g1, n * 2)
        w2 -= tdiv(g2, n * 2)
        b -= tdiv(g0, n * 2)
    z = w1 * x1 + w2 * x2 + b
    p = (500000 + z.apply(lambda v: tdiv(v, 4))).clip(0, 1000000)
    n_correct = int(((p >= 500000) == (y == 1)).sum())
    got = QUERIES["hard_sigmoid_logreg"](spark, SF_CORRECT).toPandas().iloc[0]
    assert (got.w1_micro, got.w2_micro, got.b_micro) == (w1, w2, b)
    assert got.n_correct == n_correct
    # the trained gate beats the majority-class baseline
    assert got.n_correct / got.n > max(y.mean(), 1 - y.mean())


# ---------------------------------------------------------------------------
# octagon hull
# ---------------------------------------------------------------------------


def test_octagon_hull_is_inner_approximation_of_exact_hull(spark):
    """Octagon area == a numpy recompute AND is sandwiched between 0 and
    the exact monotone-chain convex-hull area for every cell."""
    import numpy as np

    from osmgraft.contract import CELL_W, X_EXPR, Y_EXPR

    pts = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            f"CAST(FLOOR(({X_EXPR}) / {CELL_W}e0) AS BIGINT) AS cx",
            f"CAST(FLOOR(({Y_EXPR}) / {CELL_W}e0) AS BIGINT) AS cy",
            f"CAST(FLOOR(({X_EXPR}) * 100.0e0 + 0.5e0) AS BIGINT) AS xm",
            f"CAST(FLOOR(({Y_EXPR}) * 100.0e0 + 0.5e0) AS BIGINT) AS ym",
        )
        .toPandas()
    )

    def hull_area2(ps):  # exact shoelace*2 of the monotone-chain hull
        ps = sorted(set(map(tuple, ps)))
        if len(ps) < 3:
            return 0

        def half(ps):
            h = []
            for pt in ps:
                while len(h) >= 2 and (
                    (h[-1][0] - h[-2][0]) * (pt[1] - h[-2][1])
                    - (h[-1][1] - h[-2][1]) * (pt[0] - h[-2][0])
                ) <= 0:
                    h.pop()
                h.append(pt)
            return h

        lo, up = half(ps), half(ps[::-1])
        hull = lo[:-1] + up[:-1]
        return abs(
            sum(
                hull[i][0] * hull[(i + 1) % len(hull)][1]
                - hull[(i + 1) % len(hull)][0] * hull[i][1]
                for i in range(len(hull))
            )
        )

    got = QUERIES["octagon_hull_area"](spark, SF_CORRECT).toPandas()
    got = got.set_index(["cx", "cy"])
    checked = 0
    for (cx, cy), g in pts.groupby(["cx", "cy"]):
        ps = list(zip(g.xm, g.ym))
        # numpy recompute of the octagon itself
        xs, ys = np.array(g.xm), np.array(g.ym)
        dirs = [xs, xs + ys, ys, ys - xs, -xs, -xs - ys, -ys, xs - ys]
        verts = []
        for f in dirs:
            order = np.lexsort((ys, xs, f))
            verts.append((int(xs[order[-1]]), int(ys[order[-1]])))
        area2 = sum(
            verts[i][0] * verts[(i + 1) % 8][1]
            - verts[(i + 1) % 8][0] * verts[i][1]
            for i in range(8)
        )
        r = got.loc[(cx, cy)]
        assert abs(r.hull_area - math.floor(area2 / 20000.0 * 1e4 + 0.5) / 1e4) < 1e-9
        assert 0 <= area2 <= hull_area2(ps)
        checked += 1
        if checked >= 200:
            break


# ---------------------------------------------------------------------------
# Fellegi-Sunter
# ---------------------------------------------------------------------------


def test_fellegi_sunter_matches_pure_python(spark):
    import re

    from osmgraft.contract_select import _PB_FIRST, _PB_LAST

    cust = (
        spark.read.parquet(f"{SF_CORRECT}/customer.parquet")
        .select("c_custkey")
        .toPandas()
    )
    recs: dict[str, tuple[int, int, int]] = {}
    for k in sorted(int(v) for v in cust.c_custkey):
        nm = f"{_PB_FIRST[k % 8]} {_PB_LAST[(k // 8) % 8]}"
        if k % 5 == 0:
            nm = nm.replace("e", "a")
        elif k % 7 == 0:
            nm = nm + nm[-1]
        if nm not in recs:
            recs[nm] = (k, k % 8, (k // 8) % 8)
    blocks: dict[str, list] = {}
    for nm, (rid, fi, li) in recs.items():
        bkey = nm[0].upper() + re.sub(r"[aeiou ]", "", nm[1:])[:4]
        blocks.setdefault(bkey, []).append((nm, fi, li))
    pairs = []
    for ns in blocks.values():
        for x in ns:
            for yv in ns:
                if x[0] < yv[0]:
                    af = int(x[0].split(" ")[0] == yv[0].split(" ")[0])
                    al = int(x[0].split(" ")[1] == yv[0].split(" ")[1])
                    ale = int(len(x[0]) == len(yv[0]))
                    m = int(x[1] == yv[1] and x[2] == yv[2])
                    pairs.append((af, al, ale, m))
    nm_ = sum(p[3] for p in pairs) + 1
    nu_ = sum(1 - p[3] for p in pairs) + 1
    ms = [sum(p[i] * p[3] for p in pairs) + 1 for i in range(3)]
    us = [sum(p[i] * (1 - p[3]) for p in pairs) + 1 for i in range(3)]

    def w(i, a):
        if a:
            return math.floor(
                math.log((ms[i] / (nm_ + 1)) / (us[i] / (nu_ + 1))) * 1e6 + 0.5
            )
        return math.floor(
            math.log(
                ((nm_ + 1 - ms[i]) / (nm_ + 1)) / ((nu_ + 1 - us[i]) / (nu_ + 1))
            )
            * 1e6
            + 0.5
        )

    exp: dict[tuple, list] = {}
    for af, al, ale, m in pairs:
        exp.setdefault((af, al, ale), []).append(m)
    got = QUERIES["fellegi_sunter_weights"](spark, SF_CORRECT).toPandas()
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        ms_ = exp[(r.a_first, r.a_last, r.a_len)]
        assert r.n_pairs == len(ms_)
        assert r.n_true_matches == sum(ms_)
        expected_w = w(0, r.a_first) + w(1, r.a_last) + w(2, r.a_len)
        assert r.fs_weight_micro == expected_w
    # the model separates: full-agreement pattern outweighs full-disagreement
    full = got[(got.a_first == 1) & (got.a_last == 1) & (got.a_len == 1)]
    none = got[(got.a_first == 0) & (got.a_last == 0)]
    if len(full) and len(none):
        assert full.fs_weight_micro.iloc[0] > none.fs_weight_micro.max()


# ---------------------------------------------------------------------------
# TWAP
# ---------------------------------------------------------------------------


def test_twap_matches_pure_python(spark):
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "user_id",
            "CAST(FLOOR(value * 1.0e6 + 0.5e0) AS BIGINT) AS vm",
            "unix_timestamp(ts) AS es",
            "ts", "event_id",
        )
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    exp_bands: dict[int, list] = {}
    for _, g in ev.groupby("user_id"):
        es = g.es.to_list()
        vm = g.vm.to_list()
        wsum = dtsum = 0
        for i in range(len(es) - 1):
            dt = es[i + 1] - es[i]
            wsum += vm[i] * dt
            dtsum += dt
        if dtsum <= 0:
            continue
        twap = wsum // dtsum if wsum >= 0 else -((-wsum) // dtsum)
        amean = sum(vm) // len(vm)
        diff = twap - amean
        band = abs(diff) // 100000 if diff >= 0 else -(abs(diff) // 100000)
        exp_bands.setdefault(band, []).append((twap, amean))
    got = QUERIES["twap_user_values"](spark, SF_CORRECT).toPandas()
    assert len(got) == len(exp_bands)
    for _, r in got.iterrows():
        rows = exp_bands[int(r.diff_band)]
        assert r.n_users == len(rows)
        assert abs(r.avg_twap - sum(t for t, _ in rows) / len(rows) / 1e6) < 1e-3


def test_twap_window_is_user_keyed(spark):
    from tests.test_plans import plan_of

    df = QUERIES["twap_user_values"](spark, SF_CORRECT)
    plan = plan_of(df)
    assert "SinglePartition" not in plan
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "user_id" in line, line


# ---------------------------------------------------------------------------
# Jensen-Shannon divergence
# ---------------------------------------------------------------------------


def test_js_divergence_matches_pure_python_and_is_bounded(spark):
    docs = _docs(spark)
    src = (
        spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select("source", "text")
        .toPandas()
    )
    corpus: dict[str, int] = {}
    per: dict[str, dict[str, int]] = {}
    for _, r in src.iterrows():
        d = per.setdefault(r.source, {})
        for w in r.text.split(" "):
            corpus[w] = corpus.get(w, 0) + 1
            d[w] = d.get(w, 0) + 1
    n = sum(corpus.values())
    got = QUERIES["js_divergence_sources"](spark, SF_CORRECT).toPandas()
    assert len(got) == len(per)
    for _, r in got.iterrows():
        d = per[r.source]
        nsrc = sum(d.values())
        assert r.n_tokens == nsrc
        s_src = sum(
            cs * math.floor(
                math.log(2.0 * cs * n / (cs * 1.0 * n + corpus[w] * nsrc)) * 1e6
                + 0.5
            )
            for w, cs in d.items()
        )
        s_corp = sum(
            cw * math.floor(
                math.log(2.0 * cw * nsrc / (d.get(w, 0) * 1.0 * n + cw * nsrc))
                * 1e6
                + 0.5
            )
            for w, cw in corpus.items()
        )
        ref = round(0.5 * (s_src / nsrc + s_corp / n) * 1e-6, 6)
        assert abs(r.js_nats - ref) < 1e-9, (r.source, r.js_nats, ref)
        assert 0.0 <= r.js_nats <= math.log(2.0) + 1e-9


# ---------------------------------------------------------------------------
# bitmap day overlap
# ---------------------------------------------------------------------------


def test_bitmap_overlap_matches_set_recompute(spark):
    """Popcount arithmetic == an explicit day-set recompute."""
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "event_type",
            "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) % 60"
            " AS bucket",
        )
        .toPandas()
    )
    sets = {et: set(g.bucket) for et, g in ev.groupby("event_type")}
    got = QUERIES["bitmap_day_overlap"](spark, SF_CORRECT).toPandas()
    types = sorted(sets)
    assert len(got) == len(types) * (len(types) - 1) // 2
    for _, r in got.iterrows():
        a, b = sets[r.type_a], sets[r.type_b]
        assert r.n_shared_days == len(a & b)
        assert r.n_union_days == len(a | b)
        assert abs(r.day_jaccard - len(a & b) / len(a | b)) < 1e-6


def test_bitmap_masks_build_in_one_shuffle(spark):
    from tests.test_plans import plan_of

    df = QUERIES["bitmap_day_overlap"](spark, SF_CORRECT)
    plan = plan_of(df)
    # one exchange per self-join side over the raw relation (the mask
    # relation itself is |types| rows); nothing quadratic over raw rows
    assert plan.count("Exchange hashpartitioning(event_type") <= 2
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# schema evolution
# ---------------------------------------------------------------------------


def test_schema_evolution_matches_pure_python(spark):
    def ctype(cid, v):
        if cid % 4 == 2:
            return "bigint" if v >= 4 else "int"
        if cid % 4 == 3:
            return "double" if v >= 5 else "float"
        return "string"

    def schema(v):
        return {
            cid: ctype(cid, v)
            for cid in range(12)
            if cid % 6 <= v and not (cid == 7 and v >= 6)
        }

    got = QUERIES["schema_evolution_audit"](spark, SF_CORRECT).toPandas()
    assert list(got.version) == list(range(1, 9))
    for _, r in got.iterrows():
        cur, prev = schema(int(r.version)), schema(int(r.version) - 1)
        assert r.n_cols == len(cur)
        assert r.n_added == len(set(cur) - set(prev))
        assert r.n_dropped == len(set(prev) - set(cur))
        assert r.n_widened == sum(
            1 for c in set(cur) & set(prev) if cur[c] != prev[c]
        )
        assert r.is_backward_compatible == (1 if r.n_dropped == 0 else 0)
    # the fixture exercises all three change kinds
    assert got.n_added.sum() > 0 and got.n_dropped.sum() > 0
    assert got.n_widened.sum() > 0


# ---------------------------------------------------------------------------
# IPW ATE
# ---------------------------------------------------------------------------


def test_ipw_matches_pure_python_and_reweights(spark):
    import json

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .select("event_type", "props", "value")
        .toPandas()
    )
    ev["tr"] = ev.props.apply(lambda s: int(int(json.loads(s)["k"]) >= 50))
    ev["ym"] = (ev.value * 1e6 + 0.5).apply(math.floor).astype(int)
    got = QUERIES["ipw_ate_estimate"](spark, SF_CORRECT).toPandas()
    for _, r in got.iterrows():
        g = ev[ev.event_type == r.event_type]
        n, nt = len(g), int(g.tr.sum())
        syt = int((g.tr * g.ym).sum())
        syc = int(((1 - g.tr) * g.ym).sum())
        assert (r.n, r.nt) == (n, nt)
        assert abs(r.propensity - round(nt / n, 6)) < 1e-9
        def tdiv(a, b):
            q = abs(a) // b
            return q if a >= 0 else -q

        strat = tdiv(tdiv(syt * n, nt) - tdiv(syc * n, n - nt), n)
        assert r.strat_ate_micro == strat
        assert r.naive_diff_micro == tdiv(syt, nt) - tdiv(syc, n - nt)
        # HT identity: the IPW stratum effect equals mean(t) - mean(c)
        # up to integer truncation
        approx = syt / nt - syc / (n - nt)
        assert abs(r.strat_ate_micro - approx) <= 2


# ---------------------------------------------------------------------------
# simplified silhouette
# ---------------------------------------------------------------------------


def test_silhouette_matches_numpy(spark):
    import numpy as np

    emb = (
        spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
        .selectExpr(
            "vec_id", "label", "transform(embedding, x -> cast(x as double)) v"
        )
        .toPandas()
    )
    X = np.array(emb.v.tolist())
    labels = sorted(emb.label.unique())
    cents = {}
    for lb in labels:
        cents[lb] = np.floor(X[emb.label == lb].mean(axis=0) * 1e6 + 0.5) / 1e6
    sils = {lb: [] for lb in labels}
    for i in range(len(emb)):
        lb = emb.label.iloc[i]
        d2 = {
            c: round(float(((X[i] - cv) ** 2).sum()), 6)
            for c, cv in cents.items()
        }
        a = math.sqrt(d2[lb])
        b = math.sqrt(min(v for c, v in d2.items() if c != lb))
        sils[lb].append(round((b - a) / max(a, b), 6))
    got = QUERIES["silhouette_simplified"](spark, SF_CORRECT).toPandas()
    assert len(got) == len(labels)
    for _, r in got.iterrows():
        ss = sils[r.label]
        assert r.n_vecs == len(ss)
        assert abs(r.avg_silhouette - sum(ss) / len(ss)) < 1e-3
        assert r.n_misfit == sum(1 for s in ss if s < 0)
        assert -1.0 <= r.avg_silhouette <= 1.0


# ---------------------------------------------------------------------------
# MASE
# ---------------------------------------------------------------------------


def test_mase_matches_pandas(spark):
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d",
            "CAST(FLOOR(value * 1.0e6 + 0.5e0) AS BIGINT) AS vm",
        )
        .toPandas()
    )
    daily = ev.groupby("d").vm.sum().sort_index()
    ae_s = (daily - daily.shift(7)).abs().dropna()
    ae_n = (daily - daily.shift(1)).abs().dropna()
    common = ae_s.index.intersection(ae_n.index)
    ae_s, ae_n = ae_s[common], ae_n[common]
    got = QUERIES["mase_forecast_eval"](spark, SF_CORRECT).toPandas().iloc[0]
    assert got.n_days == len(common)
    assert got.mae_snaive_micro == int(ae_s.sum()) // len(common)
    assert abs(got.mase - round(float(ae_s.sum()) / float(ae_n.sum()), 6)) < 1e-9


# ---------------------------------------------------------------------------
# conversion latency
# ---------------------------------------------------------------------------


def test_conversion_latency_matches_pandas(spark):
    import numpy as np

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "user_id", "event_type", "CAST(unix_timestamp(ts) AS BIGINT) es"
        )
        .toPandas()
    )
    su = ev[ev.event_type == "signup"].groupby("user_id").es.min()
    lats = []
    for uid, t0 in su.items():
        pp = ev[(ev.user_id == uid) & (ev.event_type == "purchase") & (ev.es >= t0)]
        if len(pp):
            lats.append(int(pp.es.min() - t0))
    got = QUERIES["conversion_latency_quantiles"](spark, SF_CORRECT).toPandas().iloc[0]
    assert got.n_signup == len(su)
    assert got.n_converted == len(lats)
    assert abs(got.conversion_rate - round(len(lats) / len(su), 6)) < 1e-9
    for col, q in [("p25_s", 25), ("p50_s", 50), ("p75_s", 75), ("p90_s", 90)]:
        ref = float(np.percentile(lats, q, method="linear"))
        assert abs(got[col] - ref) < 1e-3, (col, got[col], ref)
    assert got.p25_s <= got.p50_s <= got.p75_s <= got.p90_s


# ---------------------------------------------------------------------------
# Knox space-time test
# ---------------------------------------------------------------------------


def test_knox_matches_bruteforce_pairs(spark):
    """Closed-form block counting == an explicit O(n^2) pair count on
    the sf0.001 fixture (small enough to brute-force)."""
    from osmgraft.contract import X_EXPR, Y_EXPR

    pts = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .selectExpr(
            f"CAST(FLOOR(({X_EXPR}) / 8750.0e0) AS BIGINT) AS cx",
            f"CAST(FLOOR(({Y_EXPR}) / 8750.0e0) AS BIGINT) AS cy",
            "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d",
        )
        .toPandas()
    )
    rows = list(zip(pts.cx, pts.cy, pts.d))
    n = len(rows)
    n_st = n_s = n_t = 0
    for i in range(n):
        for j in range(i + 1, n):
            close_s = rows[i][0] == rows[j][0] and rows[i][1] == rows[j][1]
            close_t = abs(rows[i][2] - rows[j][2]) <= 1
            n_s += close_s
            n_t += close_t
            n_st += close_s and close_t
    got = QUERIES["knox_spacetime_test"](spark, "/root/testdata/sf0.001").toPandas().iloc[0]
    assert (got.n_points, got.n_st, got.n_s, got.n_t) == (n, n_st, n_s, n_t)
    exp = n_s * n_t / (n * (n - 1) / 2)
    assert abs(got.knox_ratio - round(n_st / exp, 6)) < 1e-9


def test_knox_hotspots_cluster_in_space_and_time(spark):
    got = QUERIES["knox_spacetime_test"](spark, SF_CORRECT).toPandas().iloc[0]
    assert got.n_st > 0
    assert got.expected_micro > 0


def test_knox_never_materializes_pairs(spark):
    from tests.test_plans import plan_of

    df = QUERIES["knox_spacetime_test"](spark, SF_CORRECT)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    # adjacency joins run on the aggregated relations via hash equi-join
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# Theil decomposition
# ---------------------------------------------------------------------------


def test_theil_decomposition_identity(spark):
    """Sum of per-group contributions == the undecomposed Theil index
    recomputed in pure Python, and within/between reconstruct totals."""
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "event_type", "CAST(FLOOR(value * 1.0e6 + 0.5e0) AS BIGINT) ym",
            "value",
        )
        .toPandas()
    )
    ev = ev[ev.value > 0.0]
    got = QUERIES["theil_decomposition"](spark, SF_CORRECT).toPandas()
    n, s = len(ev), int(ev.ym.sum())
    # pure-python total Theil (unsnapped — compare at 1e-4)
    total_ref = sum(
        (ym / s) * math.log(ym * n / s) for ym in ev.ym
    )
    assert abs(got.total_contribution.sum() - total_ref) < 1e-4
    for _, r in got.iterrows():
        g = ev[ev.event_type == r.event_type]
        ng, sg = len(g), int(g.ym.sum())
        assert r.n_events == ng
        assert abs(r.income_share - sg / s) < 1e-6
        t_g = sum((ym / sg) * math.log(ym * ng / sg) for ym in g.ym)
        assert abs(r.theil_within_group - t_g) < 1e-4
        bt = (sg / s) * math.log((sg * n) / (s * ng))
        assert abs(r.between_term - bt) < 1e-6
        assert abs(
            r.total_contribution - ((sg / s) * t_g + bt)
        ) < 1e-4
    # Theil is non-negative in total
    assert got.total_contribution.sum() >= 0


# ---------------------------------------------------------------------------
# PSI
# ---------------------------------------------------------------------------


def test_psi_matches_pure_python(spark):
    docs = _docs(spark)
    hits = docs.text.apply(lambda t: (len(t) - len(t.replace("spark", ""))) // 5)
    score = (hits * 1000000) // docs.n_chars
    mxs = int(score.max())
    bins = ((score * 10) // (mxs + 1)).clip(upper=9)
    half = docs.doc_id % 2
    got = QUERIES["psi_score_drift"](spark, SF_CORRECT).toPandas()
    total = 0
    terms = {}
    present = sorted(bins.unique())
    nr = int((half == 0).sum()) + len(present)
    nn_ = int((half == 1).sum()) + len(present)
    for k in present:
        c_ref = int(((bins == k) & (half == 0)).sum()) + 1
        c_new = int(((bins == k) & (half == 1)).sum()) + 1
        tp = math.floor(
            (c_new / nn_ - c_ref / nr)
            * math.log((c_new * nr) / (c_ref * nn_))
            * 1e12
            + 0.5
        )
        terms[k] = (c_ref - 1, c_new - 1, tp)
        total += tp
    assert len(got) == len(present)
    for _, r in got.iterrows():
        c_ref, c_new, tp = terms[int(r.bin)]
        assert (r.n_ref, r.n_new) == (c_ref, c_new)
        assert abs(r.psi_term - round(tp * 1e-12, 6)) < 1e-9
        assert abs(r.psi_total - round(total * 1e-12, 6)) < 1e-9
    # PSI is non-negative (it is a symmetrized KL)
    assert (got.psi_total >= 0).all()


# ---------------------------------------------------------------------------
# spatial term lift
# ---------------------------------------------------------------------------


def test_cell_term_lift_matches_pure_python(spark):
    docs = _docs(spark)
    rt: dict[tuple[int, str], int] = {}
    for _, r in docs.iterrows():
        region = (int(r.doc_id) * 2654435761) % 4294967296 % 4
        for w in r.text.split(" "):
            rt[(region, w)] = rt.get((region, w), 0) + 1
    rn: dict[int, int] = {}
    wt: dict[str, int] = {}
    for (g, w), c in rt.items():
        rn[g] = rn.get(g, 0) + c
        wt[w] = wt.get(w, 0) + c
    n = sum(wt.values())
    per_region: dict[int, list] = {}
    for (g, w), c in rt.items():
        if c >= 20:
            lift = (c * n * 1000000) // (rn[g] * wt[w])
            per_region.setdefault(g, []).append((-lift, w, c, lift))
    got = QUERIES["cell_term_lift"](spark, SF_CORRECT).toPandas()
    for g, rows in per_region.items():
        top = sorted(rows)[:5]
        sub = got[got.region == g].sort_values("rnk")
        assert len(sub) == min(5, len(rows))
        for (_, w, c, lift), (_, r) in zip(top, sub.iterrows()):
            assert (r.term, r.n_occurrences, r.lift_micro) == (w, c, lift)


def test_cell_term_lift_rank_window_is_region_keyed(spark):
    from tests.test_plans import plan_of

    df = QUERIES["cell_term_lift"](spark, SF_CORRECT)
    plan = plan_of(df)
    # the only SinglePartition is the benign 1-row corpus-total scalar
    # aggregate (the HITS scalar-build precedent, cf. rfm_segments)
    assert plan.count("SinglePartition") == 1
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "region" in line, line


# ---------------------------------------------------------------------------
# IVM join delta
# ---------------------------------------------------------------------------


def test_ivm_join_delta_is_consistent_and_matches_recompute(spark):
    got = QUERIES["ivm_join_delta"](spark, SF_CORRECT).toPandas()
    # the IVM identity holds for every nation
    assert (got.is_consistent == 1).all()
    assert (
        got.view_before + got.d_orders + got.d_customers + got.d_both
        == got.recomputed_after
    ).all()
    # every delta quadrant actually receives rows on the fixture
    assert got.d_orders.sum() > 0
    assert got.d_customers.sum() > 0
    assert got.d_both.sum() > 0
    # cross-check one nation against a pandas recompute
    o = spark.read.parquet(f"{SF_CORRECT}/orders.parquet").toPandas()
    c = spark.read.parquet(f"{SF_CORRECT}/customer.parquet").toPandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = (j.o_totalprice * 100 + 0.5).apply(math.floor).astype(int)
    nation0 = int(got.nation.iloc[0])
    sub = j[j.c_nationkey == nation0]
    assert got.recomputed_after.iloc[0] == int(sub.cents.sum())


def test_ivm_join_is_broadcast(spark):
    from tests.test_plans import plan_of

    df = QUERIES["ivm_join_delta"](spark, SF_CORRECT)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# point-in-time join
# ---------------------------------------------------------------------------


def test_pit_join_covers_every_fact_exactly_once(spark):
    ev = spark.read.parquet(f"{SF_CORRECT}/events.parquet")
    got = QUERIES["pit_join_orders"](spark, SF_CORRECT).toPandas()
    # validity intervals partition each user's timeline: row-preserving
    assert got.n_events.sum() == ev.count()


def test_pit_join_attr_is_the_version_valid_at_event_day(spark):
    """Pandas recompute of the as-of lookup for every (attr, type) cell."""
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "user_id", "CAST(date_trunc('day', ts) AS DATE) AS day",
            "event_type",
            "CAST(FLOOR(value * 1.0e6 + 0.5e0) AS BIGINT) AS vm",
        )
        .toPandas()
    )
    snap = (
        ev.groupby(["user_id", "day"]).event_type.max().rename("attr").reset_index()
    )
    cells: dict[tuple[str, str], list] = {}
    for uid, g in ev.groupby("user_id"):
        s = snap[snap.user_id == uid].sort_values("day")
        runs = []  # (valid_from, attr)
        cur = None
        for _, r in s.iterrows():
            if cur is None or r.attr != cur:
                runs.append((r.day, r.attr))
                cur = r.attr
        for _, f in g.iterrows():
            attr = None
            for vf, a in runs:
                if f.day >= vf:
                    attr = a
                else:
                    break
            cells.setdefault((attr, f.event_type), []).append(int(f.vm))
    got = QUERIES["pit_join_orders"](spark, SF_CORRECT).toPandas()
    assert len(got) == len(cells)
    for _, r in got.iterrows():
        vs = cells[(r.attr_asof, r.event_type)]
        assert r.n_events == len(vs)
        assert r.value_micro == sum(vs)


# ---------------------------------------------------------------------------
# vocabulary richness
# ---------------------------------------------------------------------------


def test_vocab_richness_matches_pure_python(spark):
    docs = _docs(spark)
    counts: dict[str, int] = {}
    for txt in docs.text:
        ws = txt.split(" ")
        for i in range(len(ws) - 2):
            g = " ".join(ws[i : i + 3])
            counts[g] = counts.get(g, 0) + 1
    v = len(counts)
    n = sum(counts.values())
    n1 = sum(1 for c in counts.values() if c == 1)
    n2 = sum(1 for c in counts.values() if c == 2)
    got = QUERIES["vocab_richness_estimates"](spark, SF_CORRECT).toPandas().iloc[0]
    assert (got.vocab_observed, got.n_tokens, got.n_hapax, got.n_dis) == (
        v, n, n1, n2,
    )
    assert abs(got.gt_unseen_mass - round(n1 / n, 6)) < 1e-9
    assert abs(got.gt_adjusted_r1 - round(2.0 * n2 / n1, 6)) < 1e-9
    assert got.chao1_vocab == v + (n1 * n1 * 1000000) // (2 * n2 * 1000000)
    # richness estimate can only revise the observed vocabulary upward
    assert got.chao1_exact >= v


# ---------------------------------------------------------------------------
# Burrows' Delta
# ---------------------------------------------------------------------------


def test_burrows_delta_matches_pure_python(spark):
    src = (
        spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select("source", "text")
        .toPandas()
    )
    corpus: dict[str, int] = {}
    per: dict[str, dict[str, int]] = {}
    for _, r in src.iterrows():
        d = per.setdefault(r.source, {})
        for w in r.text.split(" "):
            corpus[w] = corpus.get(w, 0) + 1
            d[w] = d.get(w, 0) + 1
    top = [w for w, _ in sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[:30]]
    sources = sorted(per)
    fppm = {
        (s, w): (per[s].get(w, 0) * 1000000) // sum(per[s].values())
        for s in sources
        for w in top
    }
    zs = {}
    for w in top:
        vals = [fppm[(s, w)] for s in sources]
        k = len(vals)
        s1, s2 = sum(vals), sum(x * x for x in vals)
        if s2 * k <= s1 * s1:
            continue  # constant feature drops out
        mean = s1 / k
        std = math.sqrt(s2 / k - mean * mean)
        for s in sources:
            zs[(s, w)] = (fppm[(s, w)] - mean) / std
    feats = sorted({w for (_, w) in zs})
    got = QUERIES["burrows_delta_pairs"](spark, SF_CORRECT).toPandas()
    assert len(got) == len(sources) * (len(sources) - 1) // 2
    for _, r in got.iterrows():
        terms = [
            math.floor(abs(zs[(r.source_a, w)] - zs[(r.source_b, w)]) * 1e6 + 0.5)
            for w in feats
        ]
        assert r.n_features == len(feats)
        assert abs(r.burrows_delta - round(sum(terms) * 1e-6 / len(terms), 6)) < 1e-9
    # Delta is a metric-ish distance: non-negative everywhere
    assert (got.burrows_delta >= 0).all()


# ---------------------------------------------------------------------------
# local clustering coefficient
# ---------------------------------------------------------------------------


def test_lcc_matches_bruteforce(spark):
    docs = _docs(spark)
    edges = set()
    for did in docs.doc_id:
        did = int(did)
        u = did % 61
        v = ((did // 61) * 2311 + did * 7919 + 13) % 61
        if u != v:
            edges.add((min(u, v), max(u, v)))
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    got = QUERIES["local_clustering_coeff"](spark, SF_CORRECT).toPandas()
    assert len(got) == len(adj)
    total_tri = 0
    for _, r in got.iterrows():
        nbrs = adj[int(r.node)]
        d = len(nbrs)
        tri = sum(
            1
            for x in nbrs
            for y in nbrs
            if x < y and (min(x, y), max(x, y)) in edges
        )
        assert r.degree == d
        assert r.n_triangles == tri
        lcc = round(2.0 * tri / (d * (d - 1)), 6) if d >= 2 else 0.0
        assert abs(r.lcc - lcc) < 1e-9
        total_tri += tri
    # corner-credit identity: per-node triangle counts sum to 3x total
    assert total_tri % 3 == 0


def test_lcc_no_cartesian(spark):
    from tests.test_plans import plan_of

    df = QUERIES["local_clustering_coeff"](spark, SF_CORRECT)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# JL projection
# ---------------------------------------------------------------------------


def test_jl_projection_matches_numpy_and_preserves_distance(spark):
    import numpy as np

    emb = (
        spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
        .selectExpr(
            "vec_id", "transform(embedding, x -> cast(x as double)) v"
        )
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    X = np.array(emb.v.tolist())
    d = X.shape[1]
    signs = np.array(
        [
            [
                (((i * 37 + j) * 2654435761) % 2**32 // 65536) % 2 * 2 - 1
                for j in range(16)
            ]
            for i in range(d)
        ],
        dtype=float,
    )
    P = X @ signs
    byid = {int(v): k for k, v in enumerate(emb.vec_id)}
    ratios = []
    for vid in sorted(byid):
        if vid % 11 != 0 or (vid + 17) not in byid:
            continue
        i, j = byid[vid], byid[vid + 17]
        d2f = float(((X[i] - X[j]) ** 2).sum())
        if d2f <= 0:
            continue
        d2p = float(((P[i] - P[j]) ** 2).sum()) / 16.0
        ratios.append(round(d2p / d2f, 6))
    got = QUERIES["jl_projection_audit"](spark, SF_CORRECT).toPandas().iloc[0]
    assert got.n_pairs == len(ratios)
    assert abs(got.mean_ratio - round(sum(ratios) / len(ratios), 4)) < 1e-3
    assert abs(got.min_ratio - min(ratios)) < 1e-9
    assert abs(got.max_ratio - max(ratios)) < 1e-9
    # the JL concentration at k=16: unbiased mean, most pairs within 2x
    assert 0.7 <= got.mean_ratio <= 1.3
    assert got.n_within_2x >= 0.5 * got.n_pairs


# ---------------------------------------------------------------------------
# Shapley attribution
# ---------------------------------------------------------------------------


def test_shapley_matches_pure_python_and_efficiency(spark):
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "user_id", "event_type", "CAST(unix_timestamp(ts) AS BIGINT) es"
        )
        .toPandas()
    )
    channels = ["click", "error", "signup", "view"]
    masks: dict[int, int] = {}
    conv: dict[int, int] = {}
    tconv = (
        ev[ev.event_type == "purchase"].groupby("user_id").es.min().to_dict()
    )
    for uid, g in ev.groupby("user_id"):
        tc = tconv.get(uid)
        pre = g if tc is None else g[g.es < tc]
        if len(pre) == 0:
            continue  # no pre-conversion journey -> not in the v relation
        m = 0
        for i, ch in enumerate(channels):
            if (pre.event_type == ch).any():
                m |= 1 << i
        masks[uid] = m
        conv[uid] = 0 if tc is None else 1
    v: dict[int, int] = {}
    cnt: dict[int, list] = {}
    for uid, m in masks.items():
        c, n = cnt.get(m, (0, 0))
        cnt[m] = (c + conv[uid], n + 1)
    v = {m: (c * 1000000) // n for m, (c, n) in cnt.items()}
    wts = {0: 6, 1: 2, 2: 2, 3: 6}
    exp = {}
    for i, ch in enumerate(channels):
        tot = 0
        for m in range(16):
            if (m >> i) & 1:
                continue
            tot += wts[bin(m).count("1")] * (
                v.get(m | (1 << i), 0) - v.get(m, 0)
            )
        exp[ch] = tot
    got = QUERIES["shapley_attribution"](spark, SF_CORRECT).toPandas()
    assert len(got) == 4
    for _, r in got.iterrows():
        assert r.shapley_x24_micro == exp[r.channel], (r.channel,)
        assert abs(
            r.shapley_value - round(exp[r.channel] / 24.0 * 1e-6, 6)
        ) < 1e-9


# ---------------------------------------------------------------------------
# growth accounting
# ---------------------------------------------------------------------------


def test_growth_accounting_identity_and_recompute(spark):
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "user_id",
            "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) div 7 wk",
        )
        .toPandas()
        .drop_duplicates()
    )
    weeks = {uid: sorted(g.wk) for uid, g in ev.groupby("user_id")}
    got = QUERIES["growth_accounting_weekly"](spark, SF_CORRECT).toPandas()
    # the accounting identity closes for every week
    assert (got.accounting_residual == 0).all()
    for _, r in got.iterrows():
        wk = int(r.wk)
        new = retained = resurrected = 0
        for uid, ws in weeks.items():
            if wk not in ws:
                continue
            if ws[0] == wk:
                new += 1
            elif wk - 1 in ws:
                retained += 1
            else:
                resurrected += 1
        churned = sum(
            1 for ws in weeks.values() if (wk - 1) in ws and wk not in ws
        )
        assert (r.n_new, r.n_retained, r.n_resurrected) == (
            new, retained, resurrected,
        )
        assert r.n_churned_in == churned
        assert r.n_active == new + retained + resurrected
