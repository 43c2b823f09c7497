"""ChordAngle boundary arithmetic: Successor / Predecessor /
Expanded and the inclusive / conservative distance-limit helpers of
the reference's EdgeQuery options.

Semantics match s1/chordangle.go:203-239 (Successor, Predecessor,
Expanded, MaxPointError) and s2/query_options.go:137-188
(DistanceLimit is EXCLUSIVE; the inclusive forms nudge the limit by
one representable value, the conservative forms widen it by the
distance-computation error bound from s2/edge_distances.go:173-210).

A ChordAngle here is a float64 squared chord length in [0, 4], with
the reference's sentinels: negative == -1.0, straight == 4.0,
infinity == +inf.  All functions are numpy-vectorized and accept
scalars.
"""

from __future__ import annotations

import numpy as np

NEGATIVE = -1.0
STRAIGHT = 4.0
RIGHT = 2.0
INF = float("inf")
MAX_LENGTH2 = 4.0

_EPS = float(np.finfo(np.float64).eps) / 2.0   # machineEpsilon64 = 2^-53
_SQRT3 = float(np.sqrt(3.0))


def successor(c2):
    """Smallest representable ChordAngle larger than ``c2`` — converts
    a ``<`` comparison to ``<=`` (s1/chordangle.go:203-211).

    NEGATIVE.successor == 0; STRAIGHT.successor == INF;
    INF.successor == INF."""
    c2 = np.asarray(c2, dtype=np.float64)
    out = np.nextafter(c2, 10.0)
    out = np.where(c2 >= MAX_LENGTH2, INF, out)
    out = np.where(c2 < 0.0, 0.0, out)
    return out if out.ndim else float(out)


def predecessor(c2):
    """Largest representable ChordAngle less than ``c2``
    (s1/chordangle.go:220-228).

    INF.predecessor == STRAIGHT; 0.predecessor == NEGATIVE;
    NEGATIVE.predecessor == NEGATIVE."""
    c2 = np.asarray(c2, dtype=np.float64)
    out = np.nextafter(c2, -10.0)
    out = np.where(c2 > MAX_LENGTH2, STRAIGHT, out)
    out = np.where(c2 <= 0.0, NEGATIVE, out)
    return out if out.ndim else float(out)


def add(a2, b2):
    """Squared-chord of angle(a)+angle(b), clamped to 180 degrees —
    one sqrt, no trig (s1/chordangle.go:251-276).  Scalar form (the
    cap folds are scalar); both operands are valid non-special
    ChordAngles."""
    a2 = float(a2)
    b2 = float(b2)
    if b2 == 0.0:
        return a2
    if a2 + b2 >= MAX_LENGTH2:
        return STRAIGHT
    # a = 2 sin(A), b = 2 sin(B); c = 2 sin(A+B) expands to the
    # sqrt-of-products form below (derivation in the reference).
    x = a2 * (1.0 - 0.25 * b2)
    y = b2 * (1.0 - 0.25 * a2)
    return min(MAX_LENGTH2, x + y + 2.0 * float(np.sqrt(x * y)))


def expanded(c2, e):
    """``c2`` widened by error ``e``, clamped to the valid range;
    special values (negative / infinity) pass through unchanged
    (s1/chordangle.go:154-160)."""
    c2 = np.asarray(c2, dtype=np.float64)
    special = (c2 < 0.0) | np.isinf(c2)
    out = np.clip(c2 + e, 0.0, MAX_LENGTH2)
    out = np.where(special, c2, out)
    return out if out.ndim else float(out)


def max_point_error(c2):
    """Maximum squared-chord error for a ChordAngle built from two
    Normalize()d points (s1/chordangle.go:231-239)."""
    c2 = np.asarray(c2, dtype=np.float64)
    out = 4.5 * _EPS * c2 + 16.0 * _EPS * _EPS
    return out if out.ndim else float(out)


def min_update_interior_distance_max_error(c2):
    """Error bound of the point-to-edge-interior distance
    (s2/edge_distances.go:179-210); zero at or beyond 90 degrees
    where the minimum is always at an endpoint."""
    c2 = np.asarray(c2, dtype=np.float64)
    b = np.minimum(1.0, 0.5 * c2)
    a = np.sqrt(b * (2.0 - b))
    err = ((2.5 + 2.0 * _SQRT3 + 8.5 * a) * a
           + (2.0 + 2.0 * _SQRT3 / 3.0 + 6.5 * (1.0 - b)) * b
           + (23.0 + 16.0 / _SQRT3) * _EPS) * _EPS
    out = np.where(c2 >= RIGHT, 0.0, err)
    return out if out.ndim else float(out)


def min_update_distance_max_error(c2):
    """Max error of UpdateMinDistance (point-to-edge), endpoint or
    interior case (s2/edge_distances.go:173-177)."""
    return np.maximum(min_update_interior_distance_max_error(c2),
                      max_point_error(c2))


# ---------------------------------------------------------------------------
# EdgeQuery distance-limit constructors (s2/query_options.go:137-188).
# The engine's kNN limits are EXCLUSIVE (d2 < limit), matching the
# reference's DistanceLimit; these helpers express the other bounds
# in terms of that one convention.
# ---------------------------------------------------------------------------

def closest_inclusive_limit(c2):
    """Exclusive limit that admits results at distance EXACTLY ``c2``
    for a closest-edge query (query_options.go:152-156)."""
    return successor(c2)


def furthest_inclusive_limit(c2):
    """Limit that admits results at distance exactly ``c2`` for a
    furthest-edge query, where the comparison direction flips
    (query_options.go:158-162)."""
    return predecessor(c2)


def closest_conservative_limit(c2):
    """Exclusive limit guaranteeing every result whose TRUE distance
    is <= ``c2`` survives the float distance computation
    (query_options.go:164-175): widen by the computation's error
    bound.  The bound is strictly positive for any valid ``c2``, so
    the equality case passes the engine's ``<`` comparison."""
    return expanded(c2, min_update_distance_max_error(c2))


def furthest_conservative_limit(c2):
    """Mirror of :func:`closest_conservative_limit` for furthest
    queries (query_options.go:177-188)."""
    return expanded(c2, -min_update_distance_max_error(c2))
