"""Robust-sign conformance against the reference's hardest hardcoded
cases (s2/predicates_test.go:81-260): exact determinant-degeneracy
ladder for Sign, and RobustSign on exactly-collinear / exactly-
proportional points where only symbolic perturbation decides."""

from __future__ import annotations

import numpy as np
import pytest

from geo_ray.functions.predicates import (CLOCKWISE, COUNTER_CLOCKWISE,
                                          INDETERMINATE, robust_sign, sign)

# s2/predicates_test.go:82-117 — (9 coords, want Sign>0)
SIGN_CASES = [
    ((1, 0, 0), (0, 1, 0), (0, 0, 1), True),
    ((0, 1, 0), (0, 0, 1), (1, 0, 0), True),
    ((0, 0, 1), (1, 0, 0), (0, 1, 0), True),
    ((1, 1, 0), (0, 1, 1), (1, 0, 1), True),
    ((-3, -1, 4), (2, -1, -3), (1, -2, 0), True),
    # degenerate ladder cases (det(M)=0, earlier minors zero)
    ((-3, -1, 0), (-2, 1, 0), (1, -2, 0), False),
    ((-6, 3, 3), (-4, 2, -1), (-2, 1, 4), False),
    ((0, -1, -1), (0, 1, -2), (0, 2, 1), False),
    ((-1, 2, 7), (2, 1, -4), (4, 2, -8), False),
    ((-4, -2, 7), (2, 1, -4), (4, 2, -8), False),
    ((0, -5, 7), (0, -4, 8), (0, -2, 4), False),
    ((-5, -2, 7), (0, 0, -2), (0, 0, -1), False),
    ((0, -2, 7), (0, 0, 1), (0, 0, 2), False),
]


@pytest.mark.parametrize("a,b,c,want", SIGN_CASES)
def test_sign_table(a, b, c, want):
    af = tuple(float(v) for v in a)
    bf = tuple(float(v) for v in b)
    cf = tuple(float(v) for v in c)
    assert sign(af, bf, cf) == want
    if want:
        assert not sign(cf, bf, af)  # reversibility


# exactly-collinear tangent points, s2/predicates_test.go:139-146
PO_A = (0.72571927877036835, 0.46058825605889098, 0.51106749730504852)
PO_B = (0.7257192746638208, 0.46058826573818168, 0.51106749441312738)
PO_C = (0.72571927671709457, 0.46058826089853633, 0.51106749585908795)

# exactly-proportional points, :148-163
X1 = (0.99999999999999989, 1.4901161193847655e-08, 0.0)
X2 = (1.0, 1.4901161193847656e-08, 0.0)
_x3 = np.array([1.0, 1.0, 1.0])
_x3 = _x3 / np.linalg.norm(_x3)
X3 = tuple(float(v) for v in _x3)
X4 = tuple(float(v) * 0.99999999999999989 for v in X3)
_y0 = np.array([1.0, 1.0, 0.0])
_y1 = _y0 / np.linalg.norm(_y0)
Y1 = tuple(float(v) for v in _y1)
_y2 = np.asarray(Y1) / np.linalg.norm(np.asarray(Y1))
Y2 = tuple(float(v) for v in _y2)

X = (1.0, 0.0, 0.0)
Y = (0.0, 1.0, 0.0)
Z = (0.0, 0.0, 1.0)

ROBUST_CASES = [
    (X, X, Z, INDETERMINATE),
    (X, Y, Y, INDETERMINATE),
    (Z, X, Z, INDETERMINATE),
    (X, Y, Z, COUNTER_CLOCKWISE),
    (Z, Y, X, CLOCKWISE),
    (PO_A, PO_B, PO_C, CLOCKWISE),
    (X1, X2, tuple(-v for v in X1), COUNTER_CLOCKWISE),
    (X3, X4, tuple(-v for v in X3), CLOCKWISE),
    (Y1, Y2, tuple(-v for v in Y1), COUNTER_CLOCKWISE),
]


@pytest.mark.parametrize("a,b,c,want", ROBUST_CASES)
def test_robust_sign_table(a, b, c, want):
    got = robust_sign(a, b, c)
    assert got == want, (a, b, c, got, want)
    if want != INDETERMINATE:
        # rotation invariance and mirror antisymmetry
        assert robust_sign(b, c, a) == want
        assert robust_sign(c, a, b) == want
        assert robust_sign(c, b, a) == -want
        assert robust_sign(b, a, c) == -want
        assert robust_sign(a, c, b) == -want


def test_reference_point_identities():
    """The constructions of the test points hold exactly in float64
    (same checks as TestPredicatesRobustSignEqualities)."""
    assert tuple(np.subtract(PO_C, PO_A)) == tuple(np.subtract(PO_B, PO_C))
    # x1/x2 are their own normalizations (exactly proportional pairs);
    # x3/x4 and y1/y2 are distinct points on a common line.  (The
    # reference's x4-normalization identity depends on Go's norm
    # evaluation order, so we assert only the distinctness/collinearity
    # the RobustSign cases rely on.)
    for x in (X1, X2):
        n = np.asarray(x) / np.linalg.norm(np.asarray(x))
        assert tuple(float(v) for v in n) == x
    assert X3 != X4
    assert Y1 != Y2
