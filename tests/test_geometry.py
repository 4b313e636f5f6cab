"""Tests for camera ops, triangulation, and the minimal geometric solvers
on synthetic scenes with known ground truth (SURVEY.md §4.1)."""

import numpy as np
import jax.numpy as jnp

from rd_vio_tpu.ops import camera, epipolar, homography, pnp, triangulate, wahba
from rd_vio_tpu.ops import lie


def _synthetic_two_view(rng, n=64, planar=False):
    """World points viewed by two cameras; returns everything in f64."""
    if planar:
        pts = np.concatenate(
            [rng.uniform(-1, 1, size=(n, 2)), np.full((n, 1), 4.0)], axis=1
        )
    else:
        pts = np.concatenate(
            [rng.uniform(-1, 1, size=(n, 2)), rng.uniform(3, 8, size=(n, 1))], axis=1
        )
    # camera 1 at origin; camera 2 rotated+translated
    rv = np.array([0.02, -0.05, 0.03])
    R = np.asarray(lie.quat_to_matrix(lie.expmap(jnp.asarray(rv))))
    t = np.array([0.4, -0.1, 0.05])
    x1 = pts
    x2 = pts @ R.T + t  # x2 = R x1 + t
    p1 = x1[:, :2] / x1[:, 2:]
    p2 = x2[:, :2] / x2[:, 2:]
    return pts, R, t, p1, p2


def test_apply_remove_k(rng):
    K = jnp.asarray([[458.0, 0, 367.0], [0, 457.0, 248.0], [0, 0, 1.0]])
    p = jnp.asarray(rng.uniform(-0.5, 0.5, size=(16, 2)))
    pix = camera.apply_k(p, K)
    back = camera.remove_k(pix, K)
    np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-12)


def test_undistort_roundtrip(rng):
    dist = jnp.asarray([-0.28, 0.07, 0.0002, 1.8e-5])
    p = jnp.asarray(rng.uniform(-0.4, 0.4, size=(32, 2)))
    pd = camera.distort_radtan(p, dist)
    pu = camera.undistort(pd, dist, "radtan", iters=20)
    np.testing.assert_allclose(np.asarray(pu), np.asarray(p), atol=1e-9)


def test_dproj_dp_fd(rng):
    x = jnp.asarray(rng.uniform(0.5, 2.0, size=(3,)) + np.array([0, 0, 3.0]))
    J = np.asarray(camera.dproj_dp(x))
    eps = 1e-7
    for k in range(3):
        d = np.zeros(3)
        d[k] = eps
        fd = (
            np.asarray(camera.project(x + jnp.asarray(d)))
            - np.asarray(camera.project(x - jnp.asarray(d)))
        ) / (2 * eps)
        np.testing.assert_allclose(J[:, k], fd, atol=1e-6)


def test_triangulate_two_view(rng):
    pts, R, t, p1, p2 = _synthetic_two_view(rng)
    b1 = camera.bearing_from_normalized(jnp.asarray(p1))
    b2 = camera.bearing_from_normalized(jnp.asarray(p2))
    q1 = jnp.asarray([1.0, 0, 0, 0])
    p1w = jnp.zeros(3)
    q2 = lie.matrix_to_quat(jnp.asarray(R))
    x, ok = triangulate.triangulate_two_view(b1, b2, q1, p1w, q2, jnp.asarray(t))
    assert bool(np.all(np.asarray(ok)))
    np.testing.assert_allclose(np.asarray(x), pts, atol=1e-8)


def test_triangulate_nview_masked(rng):
    pts, R, t, p1, p2 = _synthetic_two_view(rng, n=1)
    # 4 views: 2 valid + 2 garbage (masked out)
    b1 = np.asarray(camera.bearing_from_normalized(jnp.asarray(p1[0])))
    b2 = np.asarray(camera.bearing_from_normalized(jnp.asarray(p2[0])))
    q_id = np.array([1.0, 0, 0, 0])
    q2 = np.asarray(lie.matrix_to_quat(jnp.asarray(R)))
    bearings = np.stack([b1, b2, rng.normal(size=3), rng.normal(size=3)])
    q_cw = np.stack([q_id, q2, q_id, q_id])
    p_cw = np.stack([np.zeros(3), t, rng.normal(size=3), rng.normal(size=3)])
    mask = np.array([1.0, 1.0, 0.0, 0.0])
    x, ok = triangulate.triangulate_homogeneous(
        jnp.asarray(bearings), jnp.asarray(q_cw), jnp.asarray(p_cw), jnp.asarray(mask)
    )
    assert bool(np.asarray(ok))
    np.testing.assert_allclose(np.asarray(x), pts[0], atol=1e-8)


def test_essential_8pt_and_decompose(rng):
    pts, R, t, p1, p2 = _synthetic_two_view(rng)
    E = epipolar.solve_essential_8pt(jnp.asarray(p1), jnp.asarray(p2))
    err = np.asarray(
        epipolar.essential_geometric_error(E, jnp.asarray(p1), jnp.asarray(p2))
    )
    assert err.max() < 1e-12
    R1, R2, T = epipolar.decompose_essential(E)
    # one of the four candidates must match (R, t-direction)
    t_dir = t / np.linalg.norm(t)
    cands = []
    for Rc in [np.asarray(R1), np.asarray(R2)]:
        for s in [1.0, -1.0]:
            cands.append((np.linalg.norm(Rc - R), np.linalg.norm(s * np.asarray(T) - t_dir)))
    best = min(cands, key=lambda ab: ab[0] + ab[1])
    assert best[0] < 1e-6 and best[1] < 1e-6


def test_essential_from_pose_consistency(rng):
    pts, R, t, p1, p2 = _synthetic_two_view(rng)
    E = epipolar.essential_from_pose(jnp.asarray(R), jnp.asarray(t))
    err = np.asarray(
        epipolar.essential_geometric_error(E, jnp.asarray(p1), jnp.asarray(p2))
    )
    assert err.max() < 1e-16


def test_homography_dlt_and_error(rng):
    pts, R, t, p1, p2 = _synthetic_two_view(rng, planar=True)
    H = homography.solve_homography_dlt(jnp.asarray(p1[:4]), jnp.asarray(p2[:4]))
    err = np.asarray(
        homography.homography_geometric_error(H, jnp.asarray(p1), jnp.asarray(p2))
    )
    assert err.max() < 1e-10


def test_homography_decompose_general(rng):
    pts, R, t, p1, p2 = _synthetic_two_view(rng, planar=True)
    H = homography.solve_homography_dlt(jnp.asarray(p1), jnp.asarray(p2))
    R1, R2, T1, T2, n1, n2, pure = homography.decompose_homography(H)
    assert not bool(np.asarray(pure))
    # plane z=4 => n = (0,0,1), d=4; t_true scaled by 1/d in the H decomposition
    errs = []
    for Rc, Tc in [(np.asarray(R1), np.asarray(T1)), (np.asarray(R2), np.asarray(T2))]:
        for s in [1.0, -1.0]:
            errs.append(
                np.linalg.norm(Rc - R)
                + np.linalg.norm(s * Tc / max(np.linalg.norm(Tc), 1e-12) - t / np.linalg.norm(t))
            )
    assert min(errs) < 1e-6


def test_homography_decompose_pure_rotation(rng):
    rv = np.array([0.05, 0.1, -0.03])
    R = np.asarray(lie.quat_to_matrix(lie.expmap(jnp.asarray(rv))))
    H = jnp.asarray(R)
    R1, R2, T1, T2, n1, n2, pure = homography.decompose_homography(H)
    assert bool(np.asarray(pure))
    np.testing.assert_allclose(np.asarray(R1), R, atol=1e-9)
    np.testing.assert_allclose(np.asarray(T1), 0, atol=1e-12)


def test_wahba_rotation(rng):
    rv = np.array([0.3, -0.2, 0.5])
    R = np.asarray(lie.quat_to_matrix(lie.expmap(jnp.asarray(rv))))
    p1 = rng.normal(size=(2, 3))
    p1 /= np.linalg.norm(p1, axis=-1, keepdims=True)
    p2 = p1 @ R.T
    R_est = np.asarray(wahba.solve_rotation(jnp.asarray(p1), jnp.asarray(p2)))
    np.testing.assert_allclose(R_est, R, atol=1e-10)
    ang = np.asarray(
        wahba.rotation_angular_error(jnp.asarray(R_est), jnp.asarray(p1), jnp.asarray(p2))
    )
    assert ang.max() < 1e-7


def test_pnp_dlt_and_refine(rng):
    pts = np.concatenate(
        [rng.uniform(-2, 2, size=(24, 2)), rng.uniform(4, 9, size=(24, 1))], axis=1
    )
    rv = np.array([0.1, -0.2, 0.15])
    R = np.asarray(lie.quat_to_matrix(lie.expmap(jnp.asarray(rv))))
    t = np.array([0.3, -0.5, 0.2])
    x_cam = pts @ R.T + t
    p = x_cam[:, :2] / x_cam[:, 2:]
    R0, t0 = pnp.solve_pnp_dlt(jnp.asarray(pts), jnp.asarray(p))
    np.testing.assert_allclose(np.asarray(R0), R, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t0), t, atol=1e-6)
    # refinement from a perturbed start
    Rp = np.asarray(lie.quat_to_matrix(lie.expmap(jnp.asarray(rv + 0.02))))
    Rr, tr = pnp.refine_pnp(
        jnp.asarray(Rp), jnp.asarray(t + 0.05), jnp.asarray(pts), jnp.asarray(p), iters=10
    )
    np.testing.assert_allclose(np.asarray(Rr), R, atol=1e-8)
    np.testing.assert_allclose(np.asarray(tr), t, atol=1e-8)
    err = np.asarray(
        pnp.pnp_reprojection_error(jnp.asarray(R), jnp.asarray(t), jnp.asarray(pts), jnp.asarray(p))
    )
    assert err.max() < 1e-20
