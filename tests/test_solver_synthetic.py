"""End-to-end solver tests on synthetic networks."""

import numpy as np
import pytest

from bundle_adjustment_tpu import (
    BundleAdjustment,
    EstimationState,
    EstimationType,
    MatrixInversion,
)
from bundle_adjustment_tpu.testing import make_synthetic_scene


def _solve(cameras, scale_bars, mode=MatrixInversion.FULL, damping=0.0,
           direct_groups=(), max_iter=100):
    adj = BundleAdjustment()
    for c in cameras:
        adj.add(c)
    for s in scale_bars:
        adj.add(s)
    for g in direct_groups:
        adj.add(g)
    adj.set_invert_normal_equation(mode)
    adj.set_maximal_number_of_iterations(max_iter)
    if damping:
        adj.set_levenberg_marquardt_damping_value(damping)
    status = adj.estimate_model()
    return adj, status


def test_noise_free_recovery():
    """Perfect observations from a perturbed start must converge back to the
    truth (up to the free-network gauge) with omega ~ 0."""
    cameras, scale_bars, truth = make_synthetic_scene(
        num_points=30, num_images=6, noise=0.0, perturb=0.05, seed=1)
    adj, status = _solve(cameras, scale_bars)
    assert status == EstimationState.ERROR_FREE_ESTIMATION
    assert adj.omega < 1e-10
    # geometry check: distances between estimated points match the truth
    pts_est = np.array([[oc.x.value, oc.y.value, oc.z.value]
                        for oc in truth["coords"]])
    pts_true = truth["points"]
    d_est = np.linalg.norm(pts_est[0] - pts_est[10])
    d_true = np.linalg.norm(pts_true[0] - pts_true[10])
    assert np.isclose(d_est, d_true, rtol=1e-8)


def test_counts_and_dof():
    cameras, scale_bars, truth = make_synthetic_scene(
        num_points=30, num_images=6, seed=2)
    adj, status = _solve(cameras, scale_bars)
    p = adj.problem
    n_img_obs = 2 * p.num_image_obs
    assert adj.get_number_of_observations() == n_img_obs + 1  # + scale bar
    # unknowns: 3*30 points + 3 io + 6 dist + 6*6 eo
    assert adj.get_number_of_unknown_parameters() == 90 + 3 + 6 + 36
    # free network with scale bar: scale fixed -> defect 6
    assert adj.get_number_of_datum_conditions() == 6
    assert adj.get_degree_of_freedom() == (
        adj.get_number_of_observations()
        - adj.get_number_of_unknown_parameters() + 6)


def test_noisy_network_sigma_ratio():
    """With observation noise == a-priori sigma, the a-posteriori variance
    factor must be ~ the a-priori one (global model test)."""
    cameras, scale_bars, _ = make_synthetic_scene(
        num_points=60, num_images=10, noise=5e-4, sigma=5e-4,
        perturb=0.01, seed=3)
    adj, status = _solve(cameras, scale_bars)
    assert status == EstimationState.ERROR_FREE_ESTIMATION
    ratio = adj.get_variance_factor_aposteriori() / adj.get_variance_factor_apriori()
    assert 0.8 < ratio < 1.25


def test_schur_modes_match_full():
    """REDUCED and PRE_ELIMINATION must reproduce the FULL solution and the
    covariance of the retained (point) block."""
    cameras, scale_bars, truth = make_synthetic_scene(
        num_points=25, num_images=5, noise=1e-4, sigma=1e-4,
        perturb=0.01, seed=4)

    results = {}
    for mode in (MatrixInversion.FULL, MatrixInversion.REDUCED,
                 MatrixInversion.PRE_ELIMINATION):
        cams, sbs, tr = make_synthetic_scene(
            num_points=25, num_images=5, noise=1e-4, sigma=1e-4,
            perturb=0.01, seed=4)
        adj, status = _solve(cams, sbs, mode=mode)
        assert status == EstimationState.ERROR_FREE_ESTIMATION
        pts = np.array([[oc.x.value, oc.y.value, oc.z.value]
                        for oc in tr["coords"]])
        results[mode] = (pts, adj.Qxx, adj.problem.reduced_size, adj.omega)

    full_pts, full_Q, nR, full_om = results[MatrixInversion.FULL]
    for mode in (MatrixInversion.REDUCED, MatrixInversion.PRE_ELIMINATION):
        pts, Q, _, om = results[mode]
        assert np.allclose(pts, full_pts, atol=1e-9)
        assert np.isclose(om, full_om, rtol=1e-6)
        # covariance of the retained parameter block (excluding the Lagrange
        # rows 0..d-1, whose cross terms are ~0 + noise) must agree up to the
        # conditioning-level difference between the LU route (bordered
        # inverse) and the Schur route — both are exact in exact arithmetic
        d = 6
        assert np.allclose(Q[d:nR, d:nR], full_Q[d:nR, d:nR],
                           rtol=2e-4, atol=1e-9)


def test_levenberg_marquardt_converges_from_bad_start():
    cameras, scale_bars, _ = make_synthetic_scene(
        num_points=30, num_images=6, noise=1e-4, sigma=1e-4,
        perturb=1.0, seed=5)
    adj, status = _solve(cameras, scale_bars, damping=0.1, max_iter=200)
    assert status == EstimationState.ERROR_FREE_ESTIMATION


def test_simulation_mode():
    """SIMULATION: zero right-hand side -> no update, pure covariance
    propagation (EstimationType.SIMULATION, BundleAdjustment.java:830-831)."""
    cameras, scale_bars, truth = make_synthetic_scene(
        num_points=20, num_images=5, seed=6)
    adj = BundleAdjustment()
    for c in cameras:
        adj.add(c)
    for s in scale_bars:
        adj.add(s)
    adj.set_estimation_type(EstimationType.SIMULATION)
    adj.set_invert_normal_equation(MatrixInversion.FULL)
    status = adj.estimate_model()
    assert status == EstimationState.ERROR_FREE_ESTIMATION
    assert adj.omega == 0.0
    # parameters unchanged
    pts = np.array([[oc.x.value, oc.y.value, oc.z.value]
                    for oc in truth["coords"]])
    assert np.allclose(pts, truth["points"], atol=1e-12)
    # covariance present and positive on the diagonal of point columns
    Q = adj.get_cofactor_matrix()
    p = adj.problem
    cols = p.col_points[p.col_points >= 0]
    assert np.all(np.diag(Q)[cols] > 0)


def test_fixed_parameters_stay_fixed():
    cameras, scale_bars, truth = make_synthetic_scene(
        num_points=20, num_images=5, noise=1e-4, sigma=1e-4,
        perturb=0.01, seed=7)
    cam = cameras[0]
    c_before = cam.io.c.value
    cam.io.c.fixed = True
    adj, status = _solve(cameras, scale_bars)
    assert status == EstimationState.ERROR_FREE_ESTIMATION
    assert cam.io.c.value == c_before
    assert cam.io.c.column == -2  # never assigned


def test_datum_constraint_nullspace():
    """The solution increment must be orthogonal to the datum null space:
    sum of estimated datum-point corrections ~ 0 (free-network property)."""
    cameras, scale_bars, truth = make_synthetic_scene(
        num_points=30, num_images=6, noise=1e-4, sigma=1e-4,
        perturb=0.0, seed=8)
    pts_before = truth["points"].copy()
    adj, status = _solve(cameras, scale_bars)
    pts_after = np.array([[oc.x.value, oc.y.value, oc.z.value]
                          for oc in truth["coords"]])
    # translations: mean correction of datum points ~ 0
    corr = pts_after - pts_before
    assert np.abs(corr.mean(axis=0)).max() < 1e-6
