"""Feature-major engine (parallel/engine.py) parity against the block-layout
RCS path (parallel/rcs.py), plus the Pallas matvec kernel in interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bundle_adjustment_tpu.models.problem import ParamState
from bundle_adjustment_tpu.parallel import engine, rcs


@pytest.fixture(scope="module")
def small_problem():
    import bench as B

    problem, state, spec = B.build_problem(512, 24, 8, jnp.float64, seed=3)
    return problem, state, spec


def test_linearize_matches_rcs(small_problem):
    problem, state, spec = small_problem
    damping = jnp.asarray(1e-3)
    b_ref = rcs.linearize(problem, state, spec, damping)
    p = engine.fm_problem(problem)
    b = engine.linearize(p, state, spec, damping)

    N = problem.obs_point.shape[0]
    for a in range(3):
        np.testing.assert_allclose(b.Jp[a], b_ref.Jp[:, 0, a], rtol=1e-12)
        np.testing.assert_allclose(b.Jp[3 + a], b_ref.Jp[:, 1, a], rtol=1e-12)
        np.testing.assert_allclose(b.PJp[a], b_ref.PJp[:, 0, a], rtol=1e-12)
    for a in range(6):
        np.testing.assert_allclose(b.Jc[a], b_ref.Jc[:, 0, a], rtol=1e-12)
        np.testing.assert_allclose(b.Jc[6 + a], b_ref.Jc[:, 1, a], rtol=1e-12)
    G = b_ref.Jg.shape[2]
    for g in range(G):
        np.testing.assert_allclose(b.Jg[g], b_ref.Jg[:, 0, g], rtol=1e-12)
        np.testing.assert_allclose(b.Jg[G + g], b_ref.Jg[:, 1, g], rtol=1e-12)
        np.testing.assert_allclose(b.PJg[g], b_ref.PJg[:, 0, g], rtol=1e-12)
    np.testing.assert_allclose(b.w[0], b_ref.w[:, 0], rtol=1e-12)
    np.testing.assert_allclose(b.w[1], b_ref.w[:, 1], rtol=1e-12)
    np.testing.assert_allclose(b.omega0, b_ref.omega0, rtol=1e-10)
    np.testing.assert_allclose(
        jnp.stack(b.bp, axis=1), b_ref.bp, rtol=1e-10, atol=1e-12)
    # Hpp_inv rows vs full inverse
    Hfull = b_ref.Hpp_inv
    np.testing.assert_allclose(b.Hpp_inv[0], Hfull[:, 0, 0], rtol=1e-8)
    np.testing.assert_allclose(b.Hpp_inv[1], Hfull[:, 0, 1],
                               rtol=1e-7, atol=1e-12)
    np.testing.assert_allclose(b.Hpp_inv[5], Hfull[:, 2, 2], rtol=1e-8)


def test_prepare_and_matvec_match_rcs(small_problem):
    problem, state, spec = small_problem
    damping = jnp.asarray(1e-3)
    b_ref, rc_ref, rg_ref, M_ref = rcs.prepare(problem, state, spec, damping)
    p = engine.fm_problem(problem)
    b, rc, rg, Minv = engine.prepare(p, state, spec, damping)

    np.testing.assert_allclose(rc, rc_ref, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(rg, rg_ref, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(b.bc, b_ref.bc, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(b.extra_c, b_ref.extra_c, rtol=1e-9)
    np.testing.assert_allclose(Minv.Minv_c, M_ref.Minv_c, rtol=1e-7,
                               atol=1e-10)
    np.testing.assert_allclose(Minv.Minv_g, M_ref.Minv_g, rtol=1e-7,
                               atol=1e-10)

    rng = np.random.default_rng(0)
    xc = jnp.asarray(rng.normal(size=rc.shape))
    xg = jnp.asarray(rng.normal(size=rg.shape))
    oc, og = engine.schur_matvec(p, b, xc, xg)
    oc_ref, og_ref = rcs.schur_matvec(problem, b_ref, xc, xg)
    np.testing.assert_allclose(oc, oc_ref, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(og, og_ref, rtol=1e-9, atol=1e-12)


def test_lm_step_matches_rcs(small_problem):
    problem, state, spec = small_problem
    damping = jnp.asarray(1e-4)
    dxp_r, dxc_r, dxg_r, b_r, it_r = rcs.lm_step(
        problem, state, spec, damping, cg_tol=1e-12, cg_maxiter=500)
    p = engine.fm_problem(problem)
    dxp, dxc, dxg, b, it = engine.lm_step(
        p, state, spec, damping, cg_tol=1e-12, cg_maxiter=500)
    np.testing.assert_allclose(dxp, dxp_r, rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(dxc, dxc_r, rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(dxg, dxg_r, rtol=1e-6, atol=1e-10)
    # omega parity
    om = engine.omega_at(p, b, dxp, dxc, dxg)
    om_r = rcs.omega_at(problem, b_r, dxp_r, dxc_r, dxg_r)
    np.testing.assert_allclose(om, om_r, rtol=1e-8)


def test_coupled_preconditioner(small_problem):
    """The camera-global coupled preconditioner must reach the same solution
    and converge in no more CG iterations than the block one."""
    problem, state, spec = small_problem
    damping = jnp.asarray(1e-4)
    p = engine.fm_problem(problem)
    dxp_b, dxc_b, dxg_b, _, it_b = engine.lm_step(
        p, state, spec, damping, cg_tol=1e-10, cg_maxiter=500,
        couple_global=False)
    dxp_c, dxc_c, dxg_c, _, it_c = engine.lm_step(
        p, state, spec, damping, cg_tol=1e-10, cg_maxiter=500,
        couple_global=True)
    np.testing.assert_allclose(dxp_c, dxp_b, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(dxc_c, dxc_b, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(dxg_c, dxg_b, rtol=1e-5, atol=1e-8)
    assert int(it_c) <= int(it_b)


def test_direct_scg_matches_matvec_recovery(small_problem):
    """prepare(couple_global=True) assembles Scg/Sghat_inv directly in the
    fused reduction; it must match the blocks recovered with G unit-vector
    Schur matvecs (rcs.couple_preconditioner)."""
    problem, state, spec = small_problem
    damping = jnp.asarray(1e-4)
    p = engine.fm_problem(problem)
    b, rc, rg, Minv = engine.prepare(p, state, spec, damping,
                                     couple_global=True)
    base = rcs.Precond(Minv_c=Minv.Minv_c, Minv_g=Minv.Minv_g)
    ref = rcs.couple_preconditioner(
        lambda c, g: engine.schur_matvec(p, b, c, g), base,
        p.num_images, rg.shape[0], rg.dtype)
    np.testing.assert_allclose(Minv.Scg, ref.Scg, rtol=1e-8, atol=1e-11)
    np.testing.assert_allclose(Minv.W, ref.W, rtol=1e-8, atol=1e-11)
    np.testing.assert_allclose(Minv.Sghat_inv, ref.Sghat_inv,
                               rtol=1e-7, atol=1e-10)


def test_view_major_engine_parity(small_problem):
    """The view-major blocked layout (engine.to_view_major) must reproduce
    the point-major engine results exactly (same sums, permuted order)."""
    problem, state, spec = small_problem
    damping = jnp.asarray(1e-4)
    p = engine.fm_problem(problem)
    pv = engine.to_view_major(p, 128)
    assert pv.vm_pb == 128
    dxp, dxc, dxg, b, _ = engine.lm_step(
        p, state, spec, damping, cg_tol=1e-12, cg_maxiter=500)
    dxp_v, dxc_v, dxg_v, b_v, _ = engine.lm_step(
        pv, state, spec, damping, cg_tol=1e-12, cg_maxiter=500)
    np.testing.assert_allclose(dxp_v, dxp, rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(dxc_v, dxc, rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(dxg_v, dxg, rtol=1e-6, atol=1e-10)
    om = engine.omega_at(pv, b_v, dxp_v, dxc_v, dxg_v)
    om_ref = engine.omega_at(p, b, dxp, dxc, dxg)
    np.testing.assert_allclose(om, om_ref, rtol=1e-10)


def _pallas_matvec_case(problem, state, spec, pb=None, h=None, bsteps=1):
    """Shared harness: interpret-mode kernel vs f64 XLA matvec."""
    from bundle_adjustment_tpu.parallel import kernels

    damping = jnp.asarray(1e-3)
    p = engine.fm_problem(problem)
    if pb is None:
        pb = kernels.choose_pb(p.num_points, p.views)
    pv = engine.to_view_major(p, pb)
    b, rc, rg, Minv = engine.prepare(pv, state, spec, damping)
    b32 = jax.tree.map(lambda x: x.astype(jnp.float32)
                       if x.dtype == jnp.float64 else x, b)
    pp = kernels.pack_fm(b32, pv, h=h)

    rng = np.random.default_rng(1)
    xc = jnp.asarray(rng.normal(size=rc.shape), jnp.float32)
    xg = jnp.asarray(rng.normal(size=rg.shape), jnp.float32)

    mv = kernels.make_matvec(
        pp, b32.extra_c.astype(jnp.float32),
        b32.extra_g.astype(jnp.float32), interpret=True, bsteps=bsteps)
    oc, og = mv(xc, xg)

    oc_ref, og_ref = engine.schur_matvec(pv, b, xc.astype(jnp.float64),
                                         xg.astype(jnp.float64))
    scale = float(jnp.max(jnp.abs(oc_ref)))
    np.testing.assert_allclose(oc, oc_ref, rtol=2e-4, atol=2e-4 * scale)
    np.testing.assert_allclose(og, og_ref, rtol=2e-4,
                               atol=2e-4 * float(jnp.max(jnp.abs(og_ref))))


def test_pallas_matvec_interpret(small_problem):
    """Kernel vs XLA engine matvec, interpret mode (no TPU needed)."""
    problem, state, spec = small_problem
    _pallas_matvec_case(problem, state, spec)


def test_pallas_matvec_bsteps():
    """bsteps > 1 (multiple lane sub-blocks per grid step) is exact."""
    import bench as B

    problem, state, spec = B.build_problem(512, 24, 8, jnp.float64, seed=3)
    _pallas_matvec_case(problem, state, spec, pb=128, bsteps=2)


def test_pallas_matvec_two_level_onehot():
    """M > 128 images exercises the factored one-hot (W > 1)."""
    import bench as B

    problem, state, spec = B.build_problem(256, 130, 8, jnp.float64, seed=5)
    _pallas_matvec_case(problem, state, spec, pb=128, h=128)


def test_pad_problem_parity(small_problem):
    """Padding to a 128-multiple must not change the solution and must keep
    dummy-point steps exactly zero."""
    import bench as B
    from bundle_adjustment_tpu.parallel import kernels

    problem, state, spec = B.build_problem(500, 24, 8, jnp.float64, seed=3)
    problem2, state2, P = engine.pad_problem(problem, state)
    assert problem2.num_points == 512 and P == 500
    assert kernels.choose_pb(512, 8) in (128, 256, 512)
    fmp = engine.fm_problem(problem2)
    damping = jnp.asarray(1e-4)
    dxp, dxc, dxg, b, it = engine.lm_step(
        fmp, state2, spec, damping, cg_tol=1e-12, cg_maxiter=500)
    dxp_r, dxc_r, dxg_r, *_ = rcs.lm_step(
        problem, state, spec, damping, cg_tol=1e-12, cg_maxiter=500)
    np.testing.assert_allclose(dxp[:500], dxp_r, rtol=1e-6, atol=1e-10)
    np.testing.assert_array_equal(np.asarray(dxp[500:]), 0.0)
    np.testing.assert_allclose(dxc, dxc_r, rtol=1e-6, atol=1e-10)


@pytest.fixture(scope="module")
def zernike_problem():
    """Zernike-Gradient calibration regime (ExampleDistortionModel.java:72-87)
    on the synthetic network: radial + tangential + affinity + Zernike
    gradient fringes 4 and 12 and a Zernike-X fringe 5."""
    import bench as B
    from bundle_adjustment_tpu.models.distortion import DistortionType as DT

    problem, state, spec = B.build_problem(
        256, 16, 8, jnp.float64, seed=7,
        zernike=((DT.ZERNIKE_GRADIENT, 4), (DT.ZERNIKE_GRADIENT, 12),
                 (DT.ZERNIKE_X, 5)))
    return problem, state, spec


def test_zernike_fm_linearize_matches_rcs(zernike_problem):
    """Feature-major Zernike rows vs the scalar analytic path (itself pinned
    to jacfwd of the forward deltas in test_analytic_jacobian)."""
    problem, state, spec = zernike_problem
    damping = jnp.asarray(1e-3)
    b_ref = rcs.linearize(problem, state, spec, damping)
    p = engine.fm_problem(problem)
    b = engine.linearize(p, state, spec, damping)
    G = b_ref.Jg.shape[2]
    assert G == 3 + spec.num_coefficients
    for g in range(G):
        np.testing.assert_allclose(b.Jg[g], b_ref.Jg[:, 0, g],
                                   rtol=1e-11, atol=1e-14)
        np.testing.assert_allclose(b.Jg[G + g], b_ref.Jg[:, 1, g],
                                   rtol=1e-11, atol=1e-14)
    np.testing.assert_allclose(b.w[0], b_ref.w[:, 0], rtol=1e-12)
    np.testing.assert_allclose(b.w[1], b_ref.w[:, 1], rtol=1e-12)


def test_zernike_lm_step_matches_rcs(zernike_problem):
    problem, state, spec = zernike_problem
    damping = jnp.asarray(1e-4)
    dxp_r, dxc_r, dxg_r, b_r, _ = rcs.lm_step(
        problem, state, spec, damping, cg_tol=1e-12, cg_maxiter=800)
    p = engine.fm_problem(problem)
    dxp, dxc, dxg, b, _ = engine.lm_step(
        p, state, spec, damping, cg_tol=1e-12, cg_maxiter=800)
    np.testing.assert_allclose(dxp, dxp_r, rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(dxc, dxc_r, rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(dxg, dxg_r, rtol=1e-5, atol=1e-9)
    om = engine.omega_at(p, b, dxp, dxc, dxg)
    om_r = rcs.omega_at(problem, b_r, dxp_r, dxc_r, dxg_r)
    np.testing.assert_allclose(om, om_r, rtol=1e-8)


def test_zernike_pallas_matvec_interpret(zernike_problem):
    """The packed kernel is generic in G; check it carries the Zernike
    global rows correctly (interpret mode)."""
    problem, state, spec = zernike_problem
    _pallas_matvec_case(problem, state, spec)


def test_zernike_solver_convergence():
    """End-to-end Zernike-Gradient calibration at scale: mirrors
    ExampleDistortionModel.java:72-87 — the principal distance c and the
    polynomial radial model are held fixed (the m = 0 Zernike gradients span
    exactly the radial-polynomial + scale basis, so leaving both free is a
    rank defect by construction).  The LM driver must converge with Omega at
    the noise level."""
    import bench as B
    from bundle_adjustment_tpu.models.distortion import DistortionType as DT
    from bundle_adjustment_tpu.parallel import solver

    problem, state, spec = B.build_problem(
        256, 16, 8, jnp.float64, seed=7,
        zernike=((DT.ZERNIKE_GRADIENT, 12), (DT.ZERNIKE_GRADIENT, 24),
                 (DT.ZERNIKE_X, 5)))
    fg = np.asarray(problem.free_global).copy()
    fg[2] = 0.0  # c
    for o in (1, 2, 3):
        fg[3 + spec.slot_index(DT.RADIAL_DISTORTION, o)] = 0.0
    problem = problem._replace(free_global=jnp.asarray(fg))

    res = solver.solve(problem, state, spec, damping=1e-2,
                       max_iterations=20, cg_tol=1e-11, cg_maxiter=1000)
    assert res.converged
    assert res.max_abs_dx < 1e-8
    # Omega ~ dof * sigma^2 with sigma = 5e-4 and unit weights (sigma0 = sigma)
    n_rows = 2 * problem.obs_point.shape[0]
    u = int(np.sum(np.asarray(problem.free_point))
            + np.sum(np.asarray(problem.free_eo)) + np.sum(fg))
    expected = (n_rows - u) * (5e-4) ** 2
    assert abs(res.omega / expected - 1.0) < 0.2


def test_cam_gather_kernel_interpret():
    """kernels.make_cam_gather vs plain XLA row gathers (interpret mode),
    both W == 1 and the factored W > 1 path."""
    import bench as B
    from bundle_adjustment_tpu.parallel import kernels

    for M, h in ((24, None), (130, 128)):
        problem, state, spec = B.build_problem(256, M, 8, jnp.float64,
                                               seed=9)
        p = engine.fm_problem(problem)
        pv = engine.to_view_major(p, 128)
        g = kernels.make_cam_gather(pv, h=h, interpret=True)
        rng = np.random.default_rng(3)
        tbl = jnp.asarray(rng.normal(size=(M, 6)), jnp.float32)
        rows = g(tbl)
        ref = tbl[pv.obs_image]  # [N, 6]
        np.testing.assert_allclose(np.asarray(rows[:6]).T, np.asarray(ref),
                                   rtol=0, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(rows[6:]), 0.0)


def test_pallas_matvec_two_pass_operator_error(small_problem):
    """passes=2 one-hot products: operator error within the documented
    2^-16-relative bound (vs the f64 XLA matvec)."""
    from bundle_adjustment_tpu.parallel import kernels

    problem, state, spec = small_problem
    damping = jnp.asarray(1e-3)
    p = engine.fm_problem(problem)
    pv = engine.to_view_major(p, kernels.choose_pb(p.num_points, p.views))
    b, rc, rg, Minv = engine.prepare(pv, state, spec, damping)
    b32 = jax.tree.map(lambda x: x.astype(jnp.float32)
                       if x.dtype == jnp.float64 else x, b)
    pp = kernels.pack_fm(b32, pv)
    rng = np.random.default_rng(2)
    xc = jnp.asarray(rng.normal(size=rc.shape), jnp.float32)
    xg = jnp.asarray(rng.normal(size=rg.shape), jnp.float32)
    mv2 = kernels.make_matvec(pp, b32.extra_c.astype(jnp.float32),
                              b32.extra_g.astype(jnp.float32),
                              interpret=True, passes=2)
    oc, og = mv2(xc, xg)
    oc_ref, og_ref = engine.schur_matvec(pv, b, xc.astype(jnp.float64),
                                         xg.astype(jnp.float64))
    scale = float(jnp.max(jnp.abs(oc_ref)))
    np.testing.assert_allclose(oc, oc_ref, rtol=3e-4, atol=3e-4 * scale)
    np.testing.assert_allclose(og, og_ref, rtol=3e-4,
                               atol=3e-4 * float(jnp.max(jnp.abs(og_ref))))
