"""Robust edge intersection: the stable/exact ladder must return a
point within INTERSECTION_ERROR of the true intersection even for
nearly-parallel and exactly-collinear edges (Intersection,
s2/edge_crossings.go:172-205; TestEdgeutilIntersectionError style)."""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np
import pytest

from geo_ray.functions.distance import (INTERSECTION_ERROR,
                                        _intersection_stable,
                                        edge_intersection_robust)
from geo_ray.functions.edges import crossing_sign

RNG = np.random.default_rng(4242)


def _frame(x):
    u = np.cross(x, [0.0, 0.0, 1.0])
    if np.linalg.norm(u) < 1e-6:
        u = np.cross(x, [1.0, 0.0, 0.0])
    u /= np.linalg.norm(u)
    w = np.cross(x, u)
    w /= np.linalg.norm(w)
    return u, w


def _exact_direction(a0, a1, b0, b1):
    """(axb)x(cxd) in exact rationals -> float direction (unit)."""
    def fr(v):
        return (Fraction(v[0]), Fraction(v[1]), Fraction(v[2]))

    def cr(u, v):
        return (u[1] * v[2] - u[2] * v[1], u[2] * v[0] - u[0] * v[2],
                u[0] * v[1] - u[1] * v[0])

    x = cr(cr(fr(a0), fr(a1)), cr(fr(b0), fr(b1)))
    xf = np.array([float(c) for c in x])
    n = np.linalg.norm(xf)
    return xf / n if n > 0 else xf


def _sin_angle(p, q):
    return float(np.linalg.norm(np.cross(p, q)))


@pytest.mark.parametrize("phi", [1e-6, 1e-9, 1e-12, 1e-14, 1e-15])
def test_nearly_parallel_crossings(phi):
    """Edges crossing at angle phi: result within 2*INTERSECTION_ERROR
    (allowing float slack in the test's own comparison) of the exact
    intersection direction."""
    for trial in range(8):
        x = RNG.normal(size=3)
        x /= np.linalg.norm(x)
        u, w = _frame(x)
        L = 1e-3
        a0 = x - L * u
        a1 = x + L * u
        dirb = math.cos(phi) * u + math.sin(phi) * w
        b0 = x - L * dirb
        b1 = x + L * dirb
        for v in (a0, a1, b0, b1):
            v /= np.linalg.norm(v)
        if crossing_sign(tuple(a0), tuple(a1), tuple(b0), tuple(b1)) <= 0:
            continue
        got = edge_intersection_robust(a0, a1, b0, b1)
        assert abs(np.linalg.norm(got) - 1.0) < 1e-14
        true_dir = _exact_direction(a0, a1, b0, b1)
        err = min(_sin_angle(got, true_dir), _sin_angle(got, -true_dir))
        assert err <= 2 * INTERSECTION_ERROR + 1e-16, (phi, trial, err)


def test_stable_path_declines_degenerate():
    """For coincident (collinear) edges the stable path's error bound
    is unbounded — it must hand off to the exact path."""
    def eq(deg):
        r = math.radians(deg)
        return np.array([math.cos(r), math.sin(r), 0.0])

    assert _intersection_stable(eq(0.0), eq(2.0), eq(1.0), eq(3.0)) is None
    # identical edges
    assert _intersection_stable(eq(0.0), eq(2.0), eq(0.0), eq(2.0)) is None


def test_exactly_collinear_edges():
    """Collinear overlapping equator edges: the SoS convention returns
    the lexicographically smallest interior shared endpoint."""
    def eq(deg):
        r = math.radians(deg)
        return np.array([math.cos(r), math.sin(r), 0.0])

    a0, a1 = eq(0.0), eq(2.0)
    b0, b1 = eq(1.0), eq(3.0)
    got = edge_intersection_robust(a0, a1, b0, b1)
    cands = [a1, b0]  # the two interior endpoints
    assert any(np.array_equal(got, c) or np.array_equal(got, -c)
               for c in cands)
    # lexicographically smallest of the two
    want = min((tuple(a1), tuple(b0)))
    assert tuple(got) == want or tuple(-got) == want


def test_well_conditioned_matches_simple_variant():
    from geo_ray.functions.distance import edge_intersection
    for _ in range(20):
        x = RNG.normal(size=3)
        x /= np.linalg.norm(x)
        u, w = _frame(x)
        a0 = (x - 0.01 * u) / np.linalg.norm(x - 0.01 * u)
        a1 = (x + 0.01 * u) / np.linalg.norm(x + 0.01 * u)
        b0 = (x - 0.01 * w) / np.linalg.norm(x - 0.01 * w)
        b1 = (x + 0.01 * w) / np.linalg.norm(x + 0.01 * w)
        p1 = edge_intersection_robust(a0, a1, b0, b1)
        p2 = edge_intersection(a0, a1, b0, b1)
        assert _sin_angle(p1, p2) < 1e-12
