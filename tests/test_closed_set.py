"""ClosedSetNormalizer / NormalizeClosedSet parity with the
reference's test table
(s2builderutil_closed_set_normalizer_test.cc:161-256) and the
mixed-dimension ComputeUnion MixedGeometry fixture (:258-306).

Fixture language is the reference's index format
'points # polylines # polygon-chains' with '|' separating shapes and
';' separating polygon chains (s2text_format MakeIndex)."""

import numpy as np
import pytest

from s2spark.kernels.layers import (GeometryCollection,
                                    mixed_boolean_layers,
                                    normalize_closed_set)
from s2spark.kernels.loops import parse_vertices


def parse_index(text: str):
    """'pts # lines # chains' -> (points (n,3), [lines], [chains])."""
    parts = text.split("#")
    assert len(parts) == 3
    pts_txt, lines_txt, poly_txt = (p.strip() for p in parts)
    pts = [parse_vertices(t)[0] for t in pts_txt.split("|")
           if t.strip()]
    lines = [parse_vertices(t) for t in lines_txt.split("|")
             if t.strip()]
    chains = [parse_vertices(t) for t in poly_txt.split(";")
              if t.strip()]
    return (np.asarray(pts).reshape(-1, 3) if pts
            else np.empty((0, 3)), lines, chains)


def _pt_keys(pts):
    return sorted(p.tobytes() for p in np.asarray(pts).reshape(-1, 3))


def _edge_multiset(lines):
    """Undirected edge multiset of a polyline set (the reference's
    graph ToString comparison is per-edge)."""
    out = []
    for pl in lines:
        for i in range(len(pl) - 1):
            k0, k1 = pl[i].tobytes(), pl[i + 1].tobytes()
            out.append((k0, k1) if k0 <= k1 else (k1, k0))
    return sorted(out)


def _chain_edges(chains):
    out = []
    for c in chains:
        for i in range(len(c)):
            out.append((c[i].tobytes(),
                        c[(i + 1) % len(c)].tobytes()))
    return sorted(out)


def run_normalize(input_str, expected_str, suppress=True, merge=False):
    pts, lines, chains = parse_index(input_str)
    e_pts, e_lines, e_chains = parse_index(expected_str)
    o_pts, o_lines, o_chains, o_full = normalize_closed_set(
        pts, lines, chains, suppress_lower_dimensions=suppress,
        merge_duplicates=merge)
    assert not o_full
    assert _pt_keys(o_pts) == _pt_keys(e_pts)
    assert _edge_multiset(o_lines) == _edge_multiset(e_lines)
    assert _chain_edges(o_chains) == _chain_edges(e_chains)


# --- the reference NormalizeTest table (KEEP duplicates, as the
# harness's DuplicateEdges::KEEP default) ------------------------------


def test_empty_graphs():
    run_normalize("# #", "# #")


def test_non_degenerate_inputs():
    run_normalize("0:0 # 1:0, 1:1 | 1:2, 1:3 # 2:2, 2:3, 3:2",
                  "0:0 # 1:0, 1:1 | 1:2, 1:3 # 2:2, 2:3, 3:2")


def test_point_shell():
    run_normalize("# # 0:0", "0:0 # #")


def test_point_hole():
    run_normalize("# # 0:0, 0:3, 3:0 | 1:1".replace("|", ";"),
                  "# # 0:0, 0:3, 3:0")


def test_point_polyline():
    run_normalize("# 0:0, 0:0 #", "0:0 # #")


def test_sibling_pair_shell():
    run_normalize("# # 0:0, 1:0", "# 0:0, 1:0 #")


def test_sibling_pair_hole():
    run_normalize("# # 0:0, 0:3, 3:0; 0:0, 1:1",
                  "# # 0:0, 0:3, 3:0")


def test_point_suppressed_by_polygon_vertex():
    run_normalize("0:0 | 0:1 | 1:0 # # 0:0, 0:1, 1:0",
                  "# # 0:0, 0:1, 1:0")
    run_normalize("0:0 | 0:1 | 1:0 # # 0:0, 0:1, 1:0",
                  "0:0 | 0:1 | 1:0 # # 0:0, 0:1, 1:0",
                  suppress=False)


def test_point_suppressed_by_polyline_vertex():
    run_normalize("0:0 | 0:1 # 0:0, 0:1 #", "# 0:0, 0:1 #")
    run_normalize("0:0 | 0:1 # 0:0, 0:1 #",
                  "0:0 | 0:1 # 0:0, 0:1 #", suppress=False)


def test_point_shell_suppressed_by_polyline_edge():
    run_normalize("# 0:0, 1:0 # 0:0; 1:0", "# 0:0, 1:0 #")
    run_normalize("# 0:0, 1:0 # 0:0; 1:0",
                  "0:0 | 1:0 # 0:0, 1:0 #", suppress=False)


def test_polyline_edge_suppressed_by_polygon_edge():
    run_normalize("# 0:0, 0:1 # 0:0, 0:1, 1:0", "# # 0:0, 0:1, 1:0")
    run_normalize("# 0:0, 0:1 # 0:0, 0:1, 1:0",
                  "# 0:0, 0:1 # 0:0, 0:1, 1:0", suppress=False)


def test_polyline_edge_suppressed_by_reverse_polygon_edge():
    run_normalize("# 1:0, 0:0 # 0:0, 0:1, 1:0", "# # 0:0, 0:1, 1:0")
    run_normalize("# 1:0, 0:0 # 0:0, 0:1, 1:0",
                  "# 1:0, 0:0 # 0:0, 0:1, 1:0", suppress=False)


def test_duplicate_edge_merging():
    # DuplicateEdges::KEEP: demoted edges are ADDED, not merged
    run_normalize("0:0 | 0:0 # 0:0, 0:0 | 0:1, 0:2 # 0:0; 0:1, 0:2",
                  "0:0 | 0:0 | 0:0 | 0:0 # 0:1, 0:2 | 0:1, 0:2 #")
    # DuplicateEdges::MERGE collapses them
    run_normalize("0:0 | 0:0 # 0:0, 0:0 | 0:1, 0:2 # 0:0; 0:1, 0:2",
                  "0:0 # 0:1, 0:2 #", merge=True)


# --- full-sphere polygon passthrough ----------------------------------


def test_full_polygon_with_degeneracies():
    # degeneracies inside the full sphere are holes -> discarded
    from s2spark.kernels.builder import FULL
    pts, lines, chains, full = normalize_closed_set(
        None, [], [FULL, parse_vertices("1:1, 2:2"),
                   parse_vertices("3:3")])
    assert full and not chains and not lines and len(pts) == 0


# --- ComputeUnion MixedGeometry (the reference's end-to-end recipe) ---


def collection(text: str) -> GeometryCollection:
    pts, lines, chains = parse_index(text)
    return GeometryCollection(points=pts, lines=lines, region=chains)


MIXED_A = ("0:0 | 10:10 | 20:20 # "
           "0:0, 0:10 | 0:0, 10:0 | 15:15, 16:16 # "
           "0:0, 0:10, 10:10, 10:0; 0:0, 1:1; 2:2; 10:10, 11:11; "
           "12:12")
MIXED_B = ("0:10 | 10:0 | 3:3 | 16:16 # "
           "10:10, 0:10 | 10:10, 10:0 | 5:5, 6:6 # "
           "19:19, 19:21, 21:21, 21:19")
MIXED_UNION = ("12:12 # "
               "15:15, 16:16 | 10:10, 11:11 # "
               "0:0, 0:10, 10:10, 10:0; 19:19, 19:21, 21:21, 21:19")


def test_compute_union_mixed_geometry():
    a, b = collection(MIXED_A), collection(MIXED_B)
    o_pts, o_lines, o_chains, o_full = mixed_boolean_layers(
        a, b, "union", merge_duplicates=True)
    e_pts, e_lines, e_chains = parse_index(MIXED_UNION)
    assert not o_full
    assert _pt_keys(o_pts) == _pt_keys(e_pts)
    assert _edge_multiset(o_lines) == _edge_multiset(e_lines)
    assert _chain_edges(o_chains) == _chain_edges(e_chains)


def test_mixed_intersection():
    # intersection keeps the contained lower-dimension features
    a = collection("30:30 | 5:5 # 4:0, 6:0 # 0:0, 0:10, 10:10, 10:0")
    b = collection("5:5 | 0:0 # # 19:19, 19:21, 21:21, 21:19")
    o_pts, o_lines, o_chains, o_full = mixed_boolean_layers(
        a, b, "intersection")
    assert not o_full and not o_chains and not o_lines
    # 5:5 is in both point sets; 0:0 (b) is a polygon-a vertex ->
    # closed-contained -> kept, then NOT suppressed (no surviving
    # higher-dim geometry); 30:30 is in neither
    assert _pt_keys(o_pts) == _pt_keys(
        np.asarray([parse_vertices("5:5")[0],
                    parse_vertices("0:0")[0]]))


def test_mixed_difference():
    # A − B: polyline parts inside b's polygon are carved away;
    # b's lower-dimension features subtract nothing
    a = collection("-1:-1 | 30:30 # 20:-5, 20:5 # "
                   "0:0, 0:10, 10:10, 10:0")
    b = collection("30:30 # # 19:-1, 19:1, 21:1, 21:-1")
    o_pts, o_lines, o_chains, o_full = mixed_boolean_layers(
        a, b, "difference")
    assert not o_full
    # -1:-1 is not contained in b -> kept; 30:30 is a point of b too
    # -> closed-contained -> dropped (multiset difference)
    assert _pt_keys(o_pts) == _pt_keys(
        np.asarray([parse_vertices("-1:-1")[0]]))
    # the polyline is split: the [19,21]-lat band at lng 0 is
    # removed; both outside stubs survive
    assert len(o_lines) == 2
    assert _chain_edges(o_chains) == _chain_edges(
        [parse_vertices("0:0, 0:10, 10:10, 10:0")])


def test_mixed_symmetric_difference_degenerates():
    # coincident features vanish from both sides of Δ
    a = collection("7:7 | 1:1 # 40:0, 41:0 # ")
    b = collection("7:7 # 40:0, 41:0 | 50:0, 51:0 # ")
    o_pts, o_lines, o_chains, o_full = mixed_boolean_layers(
        a, b, "symmetric_difference")
    assert not o_full and not o_chains
    assert _pt_keys(o_pts) == _pt_keys(
        np.asarray([parse_vertices("1:1")[0]]))
    assert _edge_multiset(o_lines) == _edge_multiset(
        [parse_vertices("50:0, 51:0")])


def test_mixed_union_degenerate_shell_outside():
    # a degenerate sibling pair OUTSIDE both polygons demotes to a
    # polyline; a degenerate point-shell inside the other polygon's
    # interior is absorbed
    a = collection("# # 0:0, 0:10, 10:10, 10:0; 40:40, 41:41; 20:20")
    b = collection("# # 19:19, 19:21, 21:21, 21:19")
    o_pts, o_lines, o_chains, o_full = mixed_boolean_layers(
        a, b, "union")
    assert not o_full and len(o_pts) == 0
    assert _edge_multiset(o_lines) == _edge_multiset(
        [parse_vertices("40:40, 41:41")])
    assert _chain_edges(o_chains) == _chain_edges(
        [parse_vertices("0:0, 0:10, 10:10, 10:0"),
         parse_vertices("19:19, 19:21, 21:21, 21:19")])


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


def test_merge_duplicates_is_per_edge_not_per_walk():
    """ADVICE r4: DuplicateEdges::MERGE operates per undirected edge —
    two distinct walks that share only SOME coincident edges must not
    keep duplicate copies of those edges (whole-walk dedup missed
    this)."""
    from s2spark.kernels.layers import _undirected_edge_key
    pts, lines, chains = parse_index(
        "# 0:0, 0:1, 0:2, 0:3 | 1:1, 0:1, 0:2, 1:2 #")
    _, out_lines, _, _ = normalize_closed_set(
        pts, lines, chains, merge_duplicates=True)
    counts: dict = {}
    for pl in out_lines:
        for i in range(len(pl) - 1):
            k = _undirected_edge_key(pl[i], pl[i + 1])
            counts[k] = counts.get(k, 0) + 1
    assert counts, "no edges survived"
    assert max(counts.values()) == 1, "a duplicate edge survived"
    # total distinct undirected edges: 3 from walk A + 3 from B - 1
    # shared = 5
    assert len(counts) == 5
