"""Grid-DBSCAN cap tests (round-3 verdict item #5).

``dbscan_point_clusters``'s old shape materialized the point-level
eps-graph (density^2 edges: 7.5M at sf0.1) and ran distributed CC on
it. The round-4 ``grid_dbscan`` rewrite buckets at w = eps/sqrt(2)
(cell diameter == eps), so same-cell pairs collapse to counts, the
core-core component step runs on the extent-bounded cell graph, and no
quadratic relation is ever materialized. These tests pin (a) exactness
against a brute-force reference on mixed fixtures, and (b) the cap: a
fully coincident 50k-point blob — 1.25e9 eps-pairs, infeasible for the
pair-join form — completes as a count.
"""

from __future__ import annotations

import math
import time

import pytest

from osmgraft.contract_cells import grid_dbscan


def _brute_dbscan(pts: list[tuple[int, float, float]], eps: float,
                  min_pts: int) -> list[tuple[int, int, int, int]]:
    """Reference DBSCAN with the query's deterministic tiebreaks."""
    ids = [p[0] for p in pts]
    pos = {p[0]: (p[1], p[2]) for p in pts}
    nbrs: dict[int, list[int]] = {i: [] for i in ids}
    for i in ids:
        for j in ids:
            if i == j:
                continue
            dx = pos[i][0] - pos[j][0]
            dy = pos[i][1] - pos[j][1]
            if dx * dx + dy * dy <= eps * eps:
                nbrs[i].append(j)
    core = {i for i in ids if len(nbrs[i]) + 1 >= min_pts}
    parent = {i: i for i in core}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in core:
        for j in nbrs[i]:
            if j in core:
                a, b = find(i), find(j)
                if a != b:
                    parent[max(a, b)] = min(a, b)
    comp_min: dict[int, int] = {}
    for i in core:
        r = find(i)
        comp_min[r] = min(comp_min.get(r, i), i)
    label = {i: comp_min[find(i)] for i in core}
    border = {}
    for i in ids:
        if i in core:
            continue
        adj = [label[j] for j in nbrs[i] if j in core]
        if adj:
            border[i] = min(adj)
    rows: dict[int, list[int]] = {}
    for i, lab in label.items():
        rows.setdefault(lab, [0, 0])[0] += 1
    for i, lab in border.items():
        rows.setdefault(lab, [0, 0])[1] += 1
    out = [
        (lab, nc, nb, nc + nb) for lab, (nc, nb) in sorted(rows.items())
    ]
    n_noise = len(ids) - len(label) - len(border)
    out.append((-1, 0, 0, n_noise))
    return sorted(out)


def _run(spark, pts, eps, min_pts):
    df = spark.createDataFrame(
        pts, "event_id BIGINT, px DOUBLE, py DOUBLE"
    )
    got = [
        (int(r.cluster_id), int(r.n_core), int(r.n_border), int(r.n_pts))
        for r in grid_dbscan(spark, df, eps, min_pts).collect()
    ]
    return sorted(got)


def test_grid_dbscan_matches_bruteforce_on_mixed_fixture(spark):
    # two blobs (one split across cell boundaries), a border point, and
    # far-away noise; eps chosen so cross-cell edges matter
    eps, min_pts = 10.0, 3
    pts = [
        # blob A: 4 mutually-close points around (0, 0)
        (1, 0.0, 0.0), (2, 4.0, 0.0), (3, 0.0, 4.0), (4, 4.0, 4.0),
        # border of A: within eps of (4,4) only
        (5, 12.0, 4.0),
        # blob B: crosses a w-cell boundary (w = eps/sqrt(2) ~ 7.07)
        (6, 100.0, 100.0), (7, 106.0, 100.0), (8, 103.0, 105.0),
        (9, 109.0, 105.0),
        # chain that must merge through cross-cell core links
        (10, 115.0, 105.0),
        # noise
        (11, 500.0, 500.0), (12, -300.0, 200.0),
    ]
    assert _run(spark, pts, eps, min_pts) == _brute_dbscan(
        pts, eps, min_pts
    )


def test_grid_dbscan_matches_bruteforce_on_random_field(spark):
    import random

    rng = random.Random(42)
    pts = []
    eid = 0
    for cx, cy in ((0.0, 0.0), (60.0, 40.0), (-50.0, 80.0)):
        for _ in range(40):
            eid += 1
            pts.append(
                (eid, cx + rng.uniform(-15, 15), cy + rng.uniform(-15, 15))
            )
    for _ in range(30):  # sparse background
        eid += 1
        pts.append((eid, rng.uniform(-200, 200), rng.uniform(-200, 200)))
    eps, min_pts = 12.0, 4
    assert _run(spark, pts, eps, min_pts) == _brute_dbscan(
        pts, eps, min_pts
    )


def test_grid_dbscan_caps_the_coincident_blob(spark):
    # 50k points in one spot: the eps-graph has 1.25e9 edges — the old
    # pair-join materialization could not survive this; the grid form
    # reduces it to a same-cell count and finishes in seconds
    n = 50_000
    pts_df = spark.range(1, n + 1).selectExpr(
        "id AS event_id",
        "CAST(id % 7 AS DOUBLE) * 1.0e-3 AS px",
        "CAST(id % 11 AS DOUBLE) * 1.0e-3 AS py",
    )
    t0 = time.perf_counter()
    rows = grid_dbscan(spark, pts_df, 25000.0, 4).collect()
    took = time.perf_counter() - t0
    got = sorted(
        (int(r.cluster_id), int(r.n_core), int(r.n_border), int(r.n_pts))
        for r in rows
    )
    assert got == [(-1, 0, 0, 0), (1, n, 0, n)]
    assert took < 120.0, f"coincident blob took {took:.1f}s"


def test_cell_diameter_invariant():
    # the lossless foundation: w = eps/sqrt(2) means any two points in
    # one cell are within eps (diagonal = w*sqrt(2) = eps)
    eps = 25000.0
    w = eps / math.sqrt(2.0)
    assert w * math.sqrt(2.0) == pytest.approx(eps, rel=1e-12)
    # corner cells (+-2,+-2) need dx > w and dy > w -> d2 > 2w^2 = eps^2
    assert 2.0 * w * w >= eps * eps - 1e-6


def test_distributed_cc_fallback_matches_driver_path(spark, monkeypatch):
    """Round-5: above the occupied-core-cell budget the cell graph runs
    the distributed min-contraction CC instead of driver union-find
    (round-4 verdict, What's wrong #4). Forcing the budget to 0 must
    reproduce the driver path's output exactly on both the mixed
    fixture and a random field."""
    import random

    eps, min_pts = 10.0, 3
    rnd = random.Random(7)
    pts = [
        (i, rnd.uniform(0.0, 300.0), rnd.uniform(0.0, 300.0))
        for i in range(1, 241)
    ]
    mixed = [
        (1, 0.0, 0.0), (2, 4.0, 0.0), (3, 0.0, 4.0), (4, 4.0, 4.0),
        (5, 12.0, 4.0),
        (6, 100.0, 100.0), (7, 106.0, 100.0), (8, 103.0, 105.0),
        (9, 109.0, 105.0), (10, 115.0, 105.0),
        (11, 500.0, 500.0), (12, -300.0, 200.0),
    ]
    for fixture in (mixed, pts):
        monkeypatch.delenv("OSMGRAFT_DBSCAN_DRIVER_CC_MAX", raising=False)
        driver_path = _run(spark, fixture, eps, min_pts)
        monkeypatch.setenv("OSMGRAFT_DBSCAN_DRIVER_CC_MAX", "0")
        assert _run(spark, fixture, eps, min_pts) == driver_path
        assert driver_path == _brute_dbscan(fixture, eps, min_pts)


def test_grid_dbscan_extreme_coordinate_bound(spark):
    """Round-5 int32 discipline companion (track kernel uses the same
    bound): coordinates at the modular construction bound (~7e5) stay
    exact through the grid path."""
    eps, min_pts = 10.0, 3
    base = 699990.0
    pts = [
        (1, base, base), (2, base + 4.0, base), (3, base, base + 4.0),
        (4, base + 4.0, base + 4.0), (5, base + 12.0, base + 4.0),
        (6, 0.0, 0.0),
    ]
    assert _run(spark, pts, eps, min_pts) == _brute_dbscan(pts, eps, min_pts)
