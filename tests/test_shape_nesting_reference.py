"""S2ShapeNestingQuery battery (s2shape_nesting_query_test.cc:53-516).

Pins the reference's RingShape / ArcShape fixtures against
kernels.shapeutil.shape_nesting: shell/hole classification, parent and
hole lists, datum-shell override, shared-vertex rotations, concave-path
invariance, and the parameterized nested-ring partitions."""
import math

import numpy as np
import pytest

from s2spark.kernels.region import latlng_to_point
from s2spark.kernels.shapeutil import shape_nesting


def _ring(center_deg, radius_deg, num=16, reverse=False, offset=0):
    """RingShape (s2shape_nesting_query_test.cc:53-93): CCW ring of
    `num` vertices around center; reverse flips to CW."""
    clat, clng = center_deg
    step = 2 * math.pi / num
    verts = []
    for i in range(num):
        ang = i * step
        lat = clat + abs(radius_deg) * math.sin(ang)
        lng = clng + abs(radius_deg) * math.cos(ang)
        verts.append(latlng_to_point(math.radians(lat), math.radians(lng)))
    if offset:
        k = offset % num
        verts = verts[k:] + verts[:k]
    if reverse:
        verts = verts[::-1]
    return np.asarray(verts, dtype=np.float64)


def _arc(center_deg, radius_deg, thickness, start_deg, end_deg,
         num=32, offset=0, reverse=False):
    """ArcShape (s2shape_nesting_query_test.cc:100-180): an arc band
    with butt-capped ends; CCW unless reversed."""
    clat, clng = center_deg
    r_in, r_out = radius_deg - thickness, radius_deg + thickness
    half = num // 2
    step = (math.radians(end_deg) - math.radians(start_deg)) / (half - 1)
    verts = [None] * num
    for i in range(half):
        ang = math.radians(start_deg) + i * step
        sina, cosa = math.sin(ang), math.cos(ang)
        verts[i] = latlng_to_point(math.radians(clat + r_out * sina),
                                   math.radians(clng + r_out * cosa))
        verts[num - i - 1] = latlng_to_point(
            math.radians(clat + r_in * sina),
            math.radians(clng + r_in * cosa))
    if offset:
        k = offset % num
        verts = verts[k:] + verts[:k]
    if reverse:
        verts = verts[::-1]
    return np.asarray(verts, dtype=np.float64)


def test_one_chain_always_shell():
    rel = shape_nesting([_ring((0, 0), 1.0, num=100)])
    assert rel == [{"parent": -1, "holes": []}]


def test_two_chains_form_pair():
    center = (0.0, 0.0)
    # nested rings, like a donut
    rel = shape_nesting([_ring(center, 1.0, num=100),
                         _ring(center, 0.5, num=100, reverse=True)])
    assert rel[0]["parent"] == -1 and rel[0]["holes"] == [1]
    assert rel[1]["parent"] == 0 and rel[1]["holes"] == []
    # swapping ring order shouldn't change anything
    rel = shape_nesting([_ring(center, 0.5, num=100, reverse=True),
                         _ring(center, 1.0, num=100)])
    assert rel[0]["parent"] == -1 and rel[0]["holes"] == [1]
    assert rel[1]["parent"] == 0 and rel[1]["holes"] == []
    # reversed orientations: hole and shell don't face each other ->
    # two shells
    rel = shape_nesting([_ring(center, 1.0, num=100, reverse=True),
                         _ring(center, 0.5, num=100)])
    for r in rel:
        assert r["parent"] == -1


def test_two_chains_with_shared_vertex():
    # quadrangle + pentagon sharing vertex (0, 0); all rotations
    def P(lat, lng):
        return latlng_to_point(math.radians(lat), math.radians(lng))
    loop1 = [P(0, 0), P(0, -1), P(-1, -1), P(-1, 0)]
    loop2 = [P(0, 0), P(0, 1), P(1, 2), P(2, 1), P(1, 0)]
    for _ in range(len(loop1)):
        l2 = list(loop2)
        for _ in range(len(loop2)):
            rel = shape_nesting([np.asarray(loop1), np.asarray(l2)])
            assert rel[0]["parent"] == -1
            assert rel[1]["parent"] == -1
            l2 = l2[1:] + l2[:1]
        loop1 = loop1[1:] + loop1[:1]


def test_can_set_datum_shell_option():
    center = (0.0, 0.0)
    rel = shape_nesting([_ring(center, 1.0, num=100),
                         _ring(center, 0.5, num=100, reverse=True)],
                        datum_chain=1)
    assert rel[1]["parent"] == -1   # second chain is the shell now
    assert rel[0]["parent"] == 1    # first is its hole


def test_shell_can_have_multiple_holes():
    rel = shape_nesting([
        _ring((0.5, 0.5), 2.0),
        _ring((1.0, 0.5), 0.25, reverse=True),
        _ring((0.0, 0.5), 0.25, reverse=True),
        _ring((0.5, 1.0), 0.25, reverse=True),
        _ring((0.5, 0.0), 0.25, reverse=True)])
    assert rel[0]["parent"] == -1
    assert rel[0]["holes"] == [1, 2, 3, 4]
    for i in range(1, 5):
        assert rel[i]["parent"] == 0
        assert rel[i]["holes"] == []


@pytest.mark.parametrize("offset0", range(0, 32, 5))
def test_exact_path_is_irrelevant(offset0):
    # concave C-shaped arcs; the probe path must not matter
    # (subsampled offsets instead of the reference's full 32x32 sweep)
    center = (0.0, 0.0)
    for offset1 in range(0, 32, 7):
        rel = shape_nesting([
            _arc(center, 0.3, 0.15, -240.0, 60.0, offset=offset0),
            _arc(center, 0.3, 0.05, -230.0, 50.0, offset=offset1,
                 reverse=True),
            _arc(center, 1.0, 0.15, -85.0, 265.0, offset=offset1),
            _arc(center, 1.0, 0.05, -80.0, 260.0, offset=offset1,
                 reverse=True)])
        assert rel[0]["parent"] == -1
        assert rel[1]["parent"] == 0
        assert rel[2]["parent"] == -1
        assert rel[3]["parent"] == 2


@pytest.mark.parametrize("depth,first_chain,shuffle", [
    (31, 0, False), (32, 0, False), (31, 0, True), (32, 0, True),
    (31, 30, True), (32, 31, True), (31, 31 // 13, True),
    (32, 32 // 13, True),
])
def test_nested_chains_partition_correctly(depth, first_chain, shuffle):
    center = (0.0, 0.0)
    rings = [(2.0 / (first_chain + 1), first_chain % 2 == 1)]
    for i in range(depth):
        if i == first_chain:
            continue
        rings.append((2.0 / (i + 1), i % 2 == 1))
    if shuffle:
        rng = np.random.default_rng(20260820 + depth + first_chain)
        tail = rings[1:]
        rings = rings[:1] + [tail[k] for k in
                             rng.permutation(len(tail))]
    chains = [_ring(center, r, num=16, reverse=rev) for r, rev in rings]
    rel = shape_nesting(chains)
    assert len(rel) == depth

    if first_chain == 0 and not shuffle:
        assert rel[0]["parent"] == -1 and rel[0]["holes"] == [1]
        for chain in range(1, depth):
            if chain % 2 == 1:
                assert rel[chain]["parent"] == chain - 1
            else:
                assert rel[chain]["parent"] == -1

    num_shells = num_holes = 0
    for chain in range(depth):
        if rel[chain]["parent"] < 0:
            num_shells += 1
            for child in rel[chain]["holes"]:
                assert rel[child]["parent"] == chain
        else:
            num_holes += 1
            assert chain in rel[rel[chain]["parent"]]["holes"]
    assert num_shells + num_holes == depth
