"""Property tests for the Douglas-Peucker kernel (geo/simplify.py)."""

from __future__ import annotations

import numpy as np
import pytest

from osmgraft.geo.simplify import dp_keep_mask


def _dist_to_chord(ax, ay, bx, by, px, py):
    c = (bx - ax) * (ay - py) - (ax - px) * (by - ay)
    L = np.hypot(bx - ax, by - ay)
    return abs(c) / L if L > 0 else np.hypot(px - ax, py - ay)


def _max_deviation(x, y, keep):
    """Max distance from any dropped point to its covering kept chord."""
    idx = np.flatnonzero(keep)
    worst = 0.0
    for a, b in zip(idx[:-1], idx[1:]):
        for p in range(a + 1, b):
            worst = max(
                worst, _dist_to_chord(x[a], y[a], x[b], y[b], x[p], y[p])
            )
    return worst


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_dp_deviation_bound_and_endpoints(seed):
    rng = np.random.default_rng(seed)
    n = 60
    x = np.cumsum(rng.uniform(0.5, 2.0, n))
    y = rng.normal(0, 1.0, n)
    eps = 0.8
    keep = dp_keep_mask(x, y, eps)
    assert keep[0] and keep[-1]
    # DP guarantee: every dropped point lies within eps of the simplified
    # polyline's covering chord
    assert _max_deviation(x, y, keep) <= eps + 1e-12


def test_dp_straight_line_collapses():
    x = np.arange(10.0)
    y = 2.0 * x + 1.0
    keep = dp_keep_mask(x, y, 1e-9)
    assert keep.sum() == 2  # only endpoints survive


def test_dp_degenerate_chord_convention():
    # coincident endpoints: c == 0 everywhere, never splits by convention
    x = np.array([1.0, 5.0, -3.0, 1.0])
    y = np.array([2.0, 9.0, 4.0, 2.0])
    keep = dp_keep_mask(x, y, 0.1)
    assert list(keep) == [True, False, False, True]


def test_dp_tiny_inputs():
    assert dp_keep_mask(np.array([]), np.array([]), 1.0).tolist() == []
    assert dp_keep_mask(np.array([1.0]), np.array([2.0]), 1.0).tolist() == [True]
    assert dp_keep_mask(
        np.array([1.0, 2.0]), np.array([2.0, 3.0]), 1.0
    ).tolist() == [True, True]


def test_track_crossings_matches_bruteforce(spark):
    """Recompute ALL cross-user segment intersections by brute force with
    exact integer orientation tests and compare the engine's top-20 —
    proves the cell-bucketed candidate join misses nothing (the shared-
    cell guarantee: two crossing segments always share the cell of the
    intersection point) and double-counts nothing."""
    from osmgraft.contract_tracks import track_crossings
    from tests.conftest import SF_CORRECT

    rows = [tuple(r) for r in track_crossings(spark, SF_CORRECT).collect()]
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .select("user_id", "event_id")
        .where("user_id % 4 = 0")
        .collect()
    )
    tracks: dict[int, list] = {}
    for r in sorted(ev, key=lambda r: (r["user_id"], r["event_id"])):
        u, e = r["user_id"], r["event_id"]
        tracks.setdefault(u, []).append(
            ((u * 131) % 600000 + (e * 37) % 100000,
             (u * 197) % 600000 + (e * 59) % 100000)
        )
    segs = [
        (u, a, b)
        for u, pts in tracks.items()
        for a, b in zip(pts, pts[1:])
    ]

    def sgn(v):
        return (v > 0) - (v < 0)

    def crosses(p1, p2, q1, q2):
        d1 = (p2[0] - p1[0]) * (q1[1] - p1[1]) - (q1[0] - p1[0]) * (p2[1] - p1[1])
        d2 = (p2[0] - p1[0]) * (q2[1] - p1[1]) - (q2[0] - p1[0]) * (p2[1] - p1[1])
        d3 = (q2[0] - q1[0]) * (p1[1] - q1[1]) - (p1[0] - q1[0]) * (q2[1] - q1[1])
        d4 = (q2[0] - q1[0]) * (p2[1] - q1[1]) - (p2[0] - q1[0]) * (q2[1] - q1[1])
        return sgn(d1) * sgn(d2) < 0 and sgn(d3) * sgn(d4) < 0

    counts: dict[tuple, int] = {}
    for i in range(len(segs)):
        ua, a1, a2 = segs[i]
        for j in range(i + 1, len(segs)):
            ub, b1, b2 = segs[j]
            if ua == ub:
                continue
            if crosses(a1, a2, b1, b2):
                key = (min(ua, ub), max(ua, ub))
                counts[key] = counts.get(key, 0) + 1
    exp = sorted(
        ((ua, ub, n) for (ua, ub), n in counts.items()),
        key=lambda t: (-t[2], t[0], t[1]),
    )[:20]
    assert rows == exp


def test_map_match_matches_bruteforce(spark):
    """Recompute every point's nearest segment by brute force over ALL 40
    road segments (no radius, no cells) and compare: proves the
    cell-bucketed candidate join is lossless within the match radius —
    the 1-ring dilation at cell == radius really does contain the true
    nearest segment — and that the unmatched bucket is exactly the set of
    points farther than the radius from every segment."""
    import numpy as np

    from osmgraft.contract_tracks import _MM_R, map_match_points
    from tests.conftest import SF_CORRECT

    got = {
        r["seg_id"]: (r["n_points"], r["min_d"], r["max_d"])
        for r in map_match_points(spark, SF_CORRECT).collect()
    }

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .selectExpr(
            "event_id",
            "(event_id % 787) * 889.45e0 + 17.3e0 AS px",
            "(CAST(FLOOR(event_id / 13.0e0) AS BIGINT) % 787) * 889.45e0"
            " + 11.7e0 AS py",
        )
        .collect()
    )
    segs = []
    for k in range(40):
        if k % 2 == 0:
            ax, ay = ((k * 37) % 13) * 30000, (k * 16807) % 650000
            bx, by = ax + 250000, ay
        else:
            ax, ay = (k * 16807) % 650000, ((k * 37) % 13) * 30000
            bx, by = ax, ay + 250000
        segs.append((k, ax, ay, bx, by))

    def d2(px, py, ax, ay, bx, by):
        dot = (px - ax) * (bx - ax) + (py - ay) * (by - ay)
        len2 = (bx - ax) ** 2 + (by - ay) ** 2
        if dot <= 0:
            return (px - ax) ** 2 + (py - ay) ** 2
        if dot >= len2:
            return (px - bx) ** 2 + (py - by) ** 2
        cr = (bx - ax) * (ay - py) - (ax - px) * (by - ay)
        return cr * cr / len2

    from collections import defaultdict

    agg = defaultdict(list)
    for r in ev:
        best = min(
            (d2(r["px"], r["py"], *s[1:]), s[0]) for s in segs
        )
        if best[0] <= float(_MM_R) * float(_MM_R):
            agg[best[1]].append(round(np.sqrt(best[0]), 4))
        else:
            agg[-1].append(-1.0)

    want = {
        k: (len(v), min(v), max(v)) for k, v in agg.items()
    }
    assert got == want


def test_bbox_intersect_pairs_matches_allpairs(spark):
    """Cell-blocked + owner-cell-dedup bbox join == brute-force all-pairs
    at sf0.001, and the plan carries no cartesian/BNLJ."""
    from tests.conftest import SF_SMOKE
    from osmgraft.contract_tracks import bbox_intersect_pairs, _BI_TOPK

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").toPandas()
    ev = ev[ev.user_id % 4 == 0]
    x = (ev.user_id * 131) % 600000 + (ev.event_id * 37) % 100000
    y = (ev.user_id * 197) % 600000 + (ev.event_id * 59) % 100000
    import pandas as pd

    df = pd.DataFrame({"u": ev.user_id, "x": x, "y": y})
    bb = df.groupby("u").agg(minx=("x", "min"), maxx=("x", "max"),
                             miny=("y", "min"), maxy=("y", "max"))
    users = bb.index.to_list()
    exp = []
    for i, ua in enumerate(users):
        for ub in users[i + 1:]:
            A, B = bb.loc[ua], bb.loc[ub]
            if (A.minx <= B.maxx and B.minx <= A.maxx
                    and A.miny <= B.maxy and B.miny <= A.maxy):
                area = ((min(A.maxx, B.maxx) - max(A.minx, B.minx))
                        * (min(A.maxy, B.maxy) - max(A.miny, B.miny)))
                exp.append((min(ua, ub), max(ua, ub), area))
    exp.sort(key=lambda r: (-r[2], r[0], r[1]))
    sdf = bbox_intersect_pairs(spark, SF_SMOKE)
    rows = [(r.user_a, r.user_b, r.overlap_area) for r in sdf.collect()]
    assert rows == exp[:_BI_TOPK]
    plan = sdf._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_kcore_peel_matches_python(spark):
    """Unrolled distributed peel == Python peel to fixpoint; the
    converged flag is true (the fixed unroll reached the fixpoint)."""
    from collections import defaultdict

    from tests.conftest import SF_SMOKE
    from osmgraft.contract_web import kcore_peel, _KC_H, _KC_K

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").toPandas()
    E = set()
    for d in docs.doc_id:
        d = int(d)
        u, v = d, d + 1 + d % 6
        if u != v:
            E.add((min(u, v), max(u, v)))
        if d % 9 < 2:
            u = (d * 13 + (d // _KC_H) * 17) % _KC_H
            v = (d * 31 + (d // _KC_H) * 23 + 7) % _KC_H
            if u != v:
                E.add((min(u, v), max(u, v)))
    while True:
        deg = defaultdict(int)
        for a, b in E:
            deg[a] += 1
            deg[b] += 1
        keep = {n for n, dd in deg.items() if dd >= _KC_K}
        E2 = {(a, b) for a, b in E if a in keep and b in keep}
        if E2 == E:
            break
        E = E2
    nodes = set()
    for a, b in E:
        nodes.update((a, b))
    out = kcore_peel(spark, SF_SMOKE).toPandas().iloc[0]
    assert bool(out.converged)
    assert int(out.core_nodes) == len(nodes)
    assert int(out.core_edges) == len(E)
    assert len(E) > 0  # the planted hub survives: not the degenerate case


def test_cohens_kappa_consistent_with_confusion_matrix(spark):
    """Kappa recomputed from the confusion matrix equals the query's."""
    from tests.conftest import SF_SMOKE
    from osmgraft.contract_text import cohens_kappa, lang_confusion_matrix

    cm = lang_confusion_matrix(spark, SF_SMOKE).toPandas()
    n = cm.n_docs.sum()
    po = cm[cm.declared_lang == cm.pred_lang].n_docs.sum() / n
    rowm = cm.groupby("declared_lang").n_docs.sum()
    colm = cm.groupby("pred_lang").n_docs.sum()
    pe = sum(rowm.get(l, 0) * colm.get(l, 0)
             for l in set(rowm.index) | set(colm.index)) / (n * n)
    out = cohens_kappa(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(out.n_docs) == n
    assert abs(out.po - po) < 1e-6
    assert abs(out.pe - pe) < 1e-6
    assert abs(out.kappa - (po - pe) / (1 - pe)) < 1e-5


def test_hausdorff_pairs_match_bruteforce(spark):
    """Every reported pair's Hausdorff² equals a plain-Python max-min
    recompute over the same capped point sets, the pair list is exactly
    the top-20 of the blocked candidate set, and the plan has no
    cartesian product."""
    from osmgraft.contract_tracks import (
        _HD_CAP,
        _HD_CS,
        track_hausdorff_pairs,
    )
    from tests.conftest import SF_CORRECT

    df = track_hausdorff_pairs(spark, SF_CORRECT)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert rows

    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .where("user_id % 4 = 0")
        .select("user_id", "event_id")
        .collect()
    )
    by_user: dict[int, list[int]] = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r["event_id"])
    tracks = {}
    for u, eids in by_user.items():
        eids.sort()
        tracks[u] = [
            (
                (u * 48271) % 600000 + (e * 37) % 100000,
                (u * 16807) % 600000 + (e * 59) % 100000,
            )
            for e in eids[:_HD_CAP]
        ]

    def h_dir(A, B):
        return max(
            min((ax - bx) ** 2 + (ay - by) ** 2 for bx, by in B)
            for ax, ay in A
        )

    cand = []
    users = sorted(tracks)
    for i, ua in enumerate(users):
        for ub in users[i + 1:]:
            if (
                (ua * 48271) % 600000 // _HD_CS
                == (ub * 48271) % 600000 // _HD_CS
                and (ua * 16807) % 600000 // _HD_CS
                == (ub * 16807) % 600000 // _HD_CS
            ):
                h = max(
                    h_dir(tracks[ua], tracks[ub]),
                    h_dir(tracks[ub], tracks[ua]),
                )
                cand.append((h, ua, ub))
    cand.sort()
    exp = cand[:20]
    got = [(r["hausdorff_sq"], r["user_a"], r["user_b"]) for r in rows]
    assert got == exp
    for r in rows:
        assert r["n_pts_a"] == len(tracks[r["user_a"]])
        assert r["n_pts_b"] == len(tracks[r["user_b"]])


def test_stay_points_and_gyration_match_python_reference(spark):
    """Stay episodes equal a plain-Python run-length scan; rg² equals
    the direct variance formula; both sides of the mobility pair agree
    on the user set."""
    import math

    from osmgraft.contract_tracks import (
        _SP_CS,
        _SP_MIN_PTS,
        radius_of_gyration,
        stay_point_episodes,
    )
    from tests.conftest import SF_CORRECT

    stays = {
        r["user_id"]: r
        for r in stay_point_episodes(spark, SF_CORRECT).collect()
    }
    rg = {
        r["user_id"]: r
        for r in radius_of_gyration(spark, SF_CORRECT).collect()
    }
    ev = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .where("user_id % 4 = 0")
        .select("user_id", "event_id")
        .collect()
    )
    tracks: dict[int, list[int]] = {}
    for e in ev:
        tracks.setdefault(e["user_id"], []).append(e["event_id"])
    assert set(rg) == set(tracks)
    some_multi_stay = False
    for u, eids in tracks.items():
        eids.sort()
        pts = [
            (
                (u * 48271) % 600000 + (e * 37) % 100000,
                (u * 16807) % 600000 + (e * 59) % 100000,
            )
            for e in eids
        ]
        # run-length scan over dwell cells
        runs, cur = [], 0
        prev = None
        for x, y in pts:
            c = (x // _SP_CS, y // _SP_CS)
            if c == prev:
                cur += 1
            else:
                if cur:
                    runs.append(cur)
                cur, prev = 1, c
        runs.append(cur)
        big = [r for r in runs if r >= _SP_MIN_PTS]
        if u in stays:
            s = stays[u]
            assert s["n_stays"] == len(big)
            assert s["longest_stay_pts"] == max(big)
            assert s["pts_in_stays"] == sum(big)
            if len(big) > 1:
                some_multi_stay = True
        else:
            assert not big
        n = len(pts)
        ex = sum(x for x, _ in pts) / n
        ey = sum(y for _, y in pts) / n
        var = (
            sum(x * x for x, _ in pts) / n
            - ex * ex
            + sum(y * y for _, y in pts) / n
            - ey * ey
        ) / 1e6
        assert abs(rg[u]["rg2_km2"] - round(var, 4)) < 1e-6
        assert rg[u]["rg_band"] == math.floor(math.sqrt(var) * 100 + 0.5)
    assert some_multi_stay
