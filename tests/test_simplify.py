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
