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
