"""Mixed-precision refinement (parallel/refine.py): f64-grade convergence
from an f32 LM floor, on CPU."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

import bench as B
from bundle_adjustment_tpu.models.problem import ParamState
from bundle_adjustment_tpu.parallel import engine, hilo, rcs, refine


def test_refinement_reaches_f64_grade():
    prob32, st32, spec = B.build_problem(512, 24, 8, jnp.float32, seed=3)
    fmp32 = engine.fm_problem(prob32)
    prob64 = refine.upcast_problem(prob32)
    fmp64 = engine.fm_problem(prob64)

    # f64 reference solution on the SAME observations
    st = ParamState(*(jnp.asarray(a, jnp.float64) for a in st32))
    for _ in range(14):
        dxp, dxc, dxg, b, it = engine.lm_step(
            fmp64, st, spec, jnp.asarray(1e-8, jnp.float64),
            cg_tol=1e-13, cg_maxiter=2000)
        st, mdx = rcs.apply_step(st, prob64, dxp, dxc, dxg)
    ref = st
    assert float(mdx) < 1e-10

    # phase 1: plain f32 LM to its floor
    s32 = st32
    damp = 1e-2
    for _ in range(12):
        dxp, dxc, dxg, b, it = engine.lm_step(
            fmp32, s32, spec, jnp.asarray(damp, jnp.float32),
            cg_tol=1e-5, cg_maxiter=200)
        alpha = min(0.25 * damp ** -0.05, 0.75) if damp > 0 else 1.0
        s32, mdx = rcs.apply_step(s32, prob32, alpha * dxp, alpha * dxc,
                                  alpha * dxg)
        damp = 0.0 if damp < 1e-9 else damp * 0.2
    floor32 = float(mdx)
    err32 = np.abs(np.asarray(s32.points, np.float64)
                   - np.asarray(ref.points)).max()

    # phase 2: mixed-precision refinement
    r = refine.Refiner(prob32, spec)
    s, history = r.refine(s32, tolerance=1e-7, max_iterations=12)
    full = hilo.to_f64(s)
    err = np.abs(np.asarray(full.points) - np.asarray(ref.points)).max()
    scale = float(np.abs(np.asarray(ref.points)).max())

    # refinement must beat the f32 floor by orders of magnitude
    assert history[-1] <= 1e-7, history
    assert err < 1e-4 * err32
    assert err / scale < 1e-9
    eo_err = np.abs(np.asarray(full.eo) - np.asarray(ref.eo)).max()
    assert eo_err < 1e-6


def _free_network_with_bar(num_points, num_images, views, dtype, seed=7):
    """bench synthetic re-dressed as a free network: every coordinate free,
    7-defect datum (scale fixed by one bar), one scale bar."""
    problem, state, spec = B.build_problem(num_points, num_images, views,
                                           dtype, seed=seed)
    P = problem.num_points
    pts = np.asarray(state.points, np.float64)
    d01 = float(np.linalg.norm(pts[1] - pts[0]))
    problem = problem._replace(
        free_point=jnp.ones((P, 3), dtype),
        datum_mask_d=jnp.ones(P, dtype),
        defect_flags_d=(True, True, True, True, True, True, False),
        sb_a=jnp.asarray([0], jnp.int32), sb_b=jnp.asarray([1], jnp.int32),
        sb_length=jnp.asarray([d01 * (1 + 3e-6)], dtype),
        sb_weight=jnp.asarray([1e6], dtype),
    )
    assert problem.has_extras
    return problem, state, spec


def test_refinement_with_extras_free_network():
    """Mixed-precision refinement on a free-network + scale-bar problem
    (the NotImplementedError case of rounds <= 3): converges to
    max|dx| <= 1e-7 and matches the all-f64 lm_step_full optimum on
    datum-invariant observables (omega, bar length, point distances)."""
    prob32, st32, spec = _free_network_with_bar(384, 16, 8, jnp.float32)
    prob64 = refine.upcast_problem(prob32)
    fmp64 = engine.fm_problem(prob64)

    # all-f64 reference on the same observations
    st = ParamState(*(jnp.asarray(a, jnp.float64) for a in st32))
    for _ in range(16):
        dxp, dxc, dxg, b64, it, ext64 = engine.lm_step_full(
            fmp64, prob64, st, spec, jnp.asarray(1e-8, jnp.float64),
            cg_tol=1e-13, cg_maxiter=3000)
        st, mdx = rcs.apply_step(st, prob64, dxp, dxc, dxg)
    assert float(mdx) < 1e-9
    om_ref = float(engine.omega_at_full(fmp64, prob64, b64, ext64,
                                        jnp.zeros_like(dxp),
                                        jnp.zeros_like(dxc),
                                        jnp.zeros_like(dxg), st))

    # f32 LM phase to its floor
    fmp32 = engine.fm_problem(prob32)
    s32 = st32
    damp = 1e-2
    for _ in range(12):
        dxp, dxc, dxg, b, it, ext = engine.lm_step_full(
            fmp32, prob32, s32, spec, jnp.asarray(damp, jnp.float32),
            cg_tol=1e-5, cg_maxiter=300)
        alpha = min(0.25 * damp ** -0.05, 0.75) if damp > 0 else 1.0
        s32, mdx = rcs.apply_step(s32, prob32, alpha * dxp, alpha * dxc,
                                  alpha * dxg)
        damp = 0.0 if damp < 1e-9 else damp * 0.2

    # mixed-precision refinement with extras
    r = refine.Refiner(prob32, spec)
    s, history = r.refine(s32, tolerance=1e-7, max_iterations=15)
    assert history[-1] <= 1e-7, history

    full = hilo.to_f64(s)
    # omega at the refined state (datum-invariant global optimality check)
    _, _, _, omega0, wsb, _wd = r.gradient64(
        r.fmp64, jax.device_put(full, r._gdev) if r._gdev else full)
    assert abs(float(omega0) - om_ref) / om_ref < 1e-9

    # datum-invariant geometry: inter-point distances match the reference
    pa = np.asarray(full.points, np.float64)
    pr = np.asarray(st.points)
    ia = np.arange(0, 380, 37)
    da = np.linalg.norm(pa[ia] - pa[ia + 3], axis=1)
    dr = np.linalg.norm(pr[ia] - pr[ia + 3], axis=1)
    np.testing.assert_allclose(da, dr, rtol=1e-8)


@pytest.mark.slow
def test_refinement_with_extras_100k():
    """VERDICT round-3 item 3 acceptance: a 100k-point free-network +
    scale-bar problem refined to max|dx| <= 1e-6."""
    prob32, st32, spec = _free_network_with_bar(100_000, 64, 6, jnp.float32)
    fmp32 = engine.fm_problem(prob32)
    s32 = st32
    damp = 1e-2
    for _ in range(10):
        dxp, dxc, dxg, b, it, ext = engine.lm_step_full(
            fmp32, prob32, s32, spec, jnp.asarray(damp, jnp.float32),
            cg_tol=1e-5, cg_maxiter=200)
        alpha = min(0.25 * damp ** -0.05, 0.75) if damp > 0 else 1.0
        s32, mdx = rcs.apply_step(s32, prob32, alpha * dxp, alpha * dxc,
                                  alpha * dxg)
        damp = 0.0 if damp < 1e-9 else damp * 0.2
    r = refine.Refiner(prob32, spec)
    s, history = r.refine(s32, tolerance=1e-6, max_iterations=15)
    assert history[-1] <= 1e-6, history
