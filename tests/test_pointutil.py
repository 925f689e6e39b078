"""Frames / rotation kernel parity (reference s2pointutil.h:40-157,
s2pointutil_test.cc Frames + Rotate tests)."""

import numpy as np
import pytest

from s2spark.kernels import pointutil as pu


def units(n, seed=7):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def test_ortho_properties():
    # axis-aligned + random inputs: unit, orthogonal, antisymmetric
    a = np.vstack([np.eye(3), -np.eye(3), units(200)])
    o = pu.ortho(a)
    assert np.allclose(np.linalg.norm(o, axis=1), 1.0, atol=1e-14)
    assert np.abs(np.einsum("ij,ij->i", a, o)).max() < 1e-14
    assert np.allclose(pu.ortho(-a), -o)


def test_rotate_quarter_turn_and_identity():
    p = np.array([[1.0, 0.0, 0.0]])
    z = np.array([0.0, 0.0, 1.0])
    q = pu.rotate(p, z, np.pi / 2)
    assert np.allclose(q, [[0.0, 1.0, 0.0]], atol=1e-15)
    full = pu.rotate(p, z, 2 * np.pi)
    assert np.allclose(full, p, atol=1e-15)
    # angle from axis is preserved for arbitrary p/axis
    pts = units(100, 1)
    axis = units(1, 2)[0]
    r = pu.rotate(pts, axis, 0.7)
    assert np.allclose(r @ axis, pts @ axis, atol=1e-14)
    assert np.allclose(np.linalg.norm(r, axis=1), 1.0, atol=1e-14)


def test_get_frame_orthonormal_right_handed():
    z = units(300, 3)
    m = pu.get_frame(z)
    # columns: m[:,:,2] == z; orthonormal; right-handed (det +1)
    assert np.allclose(m[:, :, 2], z)
    mtm = np.einsum("nki,nkj->nij", m, m)
    assert np.abs(mtm - np.eye(3)).max() < 1e-13
    assert np.allclose(np.linalg.det(m), 1.0, atol=1e-13)


def test_to_from_frame_roundtrip():
    z = units(100, 4)
    m = pu.get_frame(z)
    p = units(100, 5)
    q = pu.to_frame(m, p)
    back = pu.from_frame(m, q)
    assert np.abs(back - p).max() < 1e-14
    # the frame point itself maps to (0, 0, 1) in its own frame
    assert np.abs(pu.to_frame(m, z) - [0.0, 0.0, 1.0]).max() < 1e-14


def test_approx_equals_threshold():
    a = np.array([[1.0, 0.0, 0.0]])
    b = pu.rotate(a, np.array([0.0, 0.0, 1.0]), 1e-8)
    assert pu.approx_equals(a, b, 2e-8).all()
    assert not pu.approx_equals(a, b, 5e-9).any()


def test_tangent_frame_matches_frozen_fixture_convention():
    """tangent_frame must reproduce ops/pip.synth_loops' inline
    arithmetic BIT-exactly (the DuckDB oracles mirror that op
    order)."""
    z = np.vstack([units(50, 6), [[0.0, 0.0, 1.0], [0.05, 0.0,
                                                    np.sqrt(1 - 0.0025)]]])
    u, v = pu.tangent_frame(z)
    for i in range(len(z)):
        center = z[i]
        ref = (np.array([0.0, 0.0, 1.0]) if abs(center[2]) < 0.9
               else np.array([1.0, 0.0, 0.0]))
        ue = np.cross(center, ref)
        ue /= np.linalg.norm(ue)
        ve = np.cross(center, ue)
        assert (u[i] == ue).all(), i
        assert (v[i] == ve).all(), i


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
