"""Metric-bundle parity with the reference's s2metrics_test.cc
(min<=avg<=max orderings, aspect-ratio bounds, and the full
GetLevelForMaxValue / GetLevelForMinValue / GetClosestLevel boundary
sweep for kMinWidth and kMinArea at every level -2..33)."""

import math

from s2spark.kernels import metrics as m

MAX = m.MAX_LEVEL

BUNDLES_1D = [
    (m.MIN_ANGLE_SPAN, m.MAX_ANGLE_SPAN, m.AVG_ANGLE_SPAN),
    (m.MIN_WIDTH, m.MAX_WIDTH, m.AVG_WIDTH),
    (m.MIN_EDGE, m.MAX_EDGE, m.AVG_EDGE),
    (m.MIN_DIAG, m.MAX_DIAG, m.AVG_DIAG),
]


def test_min_avg_max_ordering():
    # s2metrics_test.cc:50-54,73-78
    for lo, hi, avg in BUNDLES_1D + [(m.MIN_AREA, m.MAX_AREA, m.AVG_AREA)]:
        assert lo.deriv <= avg.deriv <= hi.deriv


def test_aspect_ratios():
    # s2metrics_test.cc:80-85
    assert 1 <= m.MAX_EDGE_ASPECT <= m.MAX_EDGE.deriv / m.MIN_EDGE.deriv
    assert 1 <= m.MAX_DIAG_ASPECT <= m.MAX_DIAG.deriv / m.MIN_DIAG.deriv


def test_provable_bundle_orderings():
    # s2metrics_test.cc:87-95: width <= angle_span, width <= edge,
    # edge <= diag, and the min/max area sandwich.
    width, angle_span, edge, diag = (
        (m.MIN_WIDTH, m.MAX_WIDTH, m.AVG_WIDTH),
        (m.MIN_ANGLE_SPAN, m.MAX_ANGLE_SPAN, m.AVG_ANGLE_SPAN),
        (m.MIN_EDGE, m.MAX_EDGE, m.AVG_EDGE),
        (m.MIN_DIAG, m.MAX_DIAG, m.AVG_DIAG),
    )
    for a, b in [(width, angle_span), (width, edge), (edge, diag)]:
        for x, y in zip(a, b):
            assert x.deriv <= y.deriv
    assert m.MIN_AREA.deriv >= m.MIN_WIDTH.deriv * m.MIN_EDGE.deriv - 1e-15
    assert m.MAX_AREA.deriv <= m.MAX_WIDTH.deriv * m.MAX_EDGE.deriv + 1e-15


def test_zero_and_saturating_levels():
    # s2metrics_test.cc:97-106
    assert m.MIN_WIDTH.get_level_for_max_value(0) == MAX
    assert m.MAX_WIDTH.get_level_for_max_value(0) == MAX
    assert m.MIN_WIDTH.get_level_for_min_value(4) == 0
    assert m.MAX_WIDTH.get_level_for_min_value(4) == 0


def test_level_inversion_sweep():
    # s2metrics_test.cc:115-140: exact threshold values and 1.2x/0.8x
    # perturbations all land on clamp(level, 0, 30).
    for level in range(-2, MAX + 4):
        width = m.MIN_WIDTH.deriv * math.pow(2, -level)
        if level >= MAX + 3:
            width = 0
        expected = max(0, min(MAX, level))
        assert m.MIN_WIDTH.get_level_for_max_value(width) == expected
        assert m.MIN_WIDTH.get_level_for_min_value(width) == expected
        assert m.MIN_WIDTH.get_closest_level(width) == expected
        assert m.MIN_WIDTH.get_level_for_max_value(1.2 * width) == expected
        assert m.MIN_WIDTH.get_level_for_min_value(0.8 * width) == expected
        assert m.MIN_WIDTH.get_closest_level(1.2 * width) == expected
        assert m.MIN_WIDTH.get_closest_level(0.8 * width) == expected

        area = m.MIN_AREA.deriv * math.pow(4, -level)
        if level <= -3:
            area = 0
        assert m.MIN_AREA.get_level_for_max_value(area) == expected
        assert m.MIN_AREA.get_level_for_min_value(area) == expected
        assert m.MIN_AREA.get_closest_level(area) == expected
        assert m.MIN_AREA.get_level_for_max_value(1.2 * area) == expected
        assert m.MIN_AREA.get_level_for_min_value(0.8 * area) == expected
        assert m.MIN_AREA.get_closest_level(1.2 * area) == expected
        assert m.MIN_AREA.get_closest_level(0.8 * area) == expected
