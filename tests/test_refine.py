"""Mixed-precision refinement (parallel/refine.py): f64-grade convergence
from an f32 LM floor, on CPU."""

import jax
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
