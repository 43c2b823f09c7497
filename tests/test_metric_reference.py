"""Metric conformance ported from s2/metric_test.go: the hardcoded
MaxLevel case, exact boundary/non-boundary level behavior, and
min<=avg<=max consistency."""

from __future__ import annotations

import math

import pytest

from geo_ray.functions import metric as M


def test_hardcoded_max_level():
    """s2/metric_test.go:23: MinWidthMetric.MaxLevel(0.001256) == 9."""
    assert M.MIN_WIDTH.max_level(0.001256) == 9


def test_level_boundaries():
    """s2/metric_test.go:50-83: exact powers of two hit the level
    boundaries; 1.2x/0.8x perturbations round the same way."""
    for level in range(-2, 34):
        width = M.MIN_WIDTH.deriv * 2.0 ** (-level)
        if level >= 33:
            width = 0.0
        expected = max(0, min(30, level))
        assert M.MIN_WIDTH.min_level(width) == expected, level
        assert M.MIN_WIDTH.max_level(width) == expected, level
        assert M.MIN_WIDTH.closest_level(width) == expected, level
        if width > 0:
            assert M.MIN_WIDTH.min_level(1.2 * width) == expected, level
            assert M.MIN_WIDTH.max_level(0.8 * width) == expected, level
            assert M.MIN_WIDTH.closest_level(1.2 * width) == expected, level
            assert M.MIN_WIDTH.closest_level(0.8 * width) == expected, level


def test_metric_orderings():
    """min <= avg <= max for every metric family; area consistency."""
    families = [
        (M.MIN_ANGLE_SPAN, M.AVG_ANGLE_SPAN, M.MAX_ANGLE_SPAN),
        (M.MIN_WIDTH, M.AVG_WIDTH, M.MAX_WIDTH),
        (M.MIN_EDGE, M.AVG_EDGE, M.MAX_EDGE),
        (M.MIN_DIAG, M.AVG_DIAG, M.MAX_DIAG),
        (M.MIN_AREA, M.AVG_AREA, M.MAX_AREA),
    ]
    for lo, avg, hi in families:
        assert lo.deriv <= avg.deriv <= hi.deriv
    assert M.MIN_AREA.deriv >= M.MIN_WIDTH.deriv * M.MIN_EDGE.deriv - 1e-15
    assert M.MAX_AREA.deriv <= M.MAX_WIDTH.deriv * M.MAX_EDGE.deriv + 1e-15


def test_value_halves_per_level():
    for level in range(0, 30):
        assert M.MIN_WIDTH.value(level + 1) == M.MIN_WIDTH.value(level) / 2
        assert M.AVG_AREA.value(level + 1) == M.AVG_AREA.value(level) / 4
