"""The implicit-Schur RCS solver must agree with the dense bordered solver
on the same problem (fixed-coordinate datum, no constraints)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bundle_adjustment_tpu import BundleAdjustment, EstimationState, MatrixInversion
from bundle_adjustment_tpu.models.layout import assign_columns
from bundle_adjustment_tpu.models.problem import ParamState, compile_problem
from bundle_adjustment_tpu.parallel import rcs
from bundle_adjustment_tpu.testing import make_synthetic_scene


def _fixed_datum_scene(**kw):
    cameras, _, truth = make_synthetic_scene(with_scale_bar=False, **kw)
    coords = truth["coords"]
    # fixed-coordinate datum: hold three points entirely (keeps the free
    # X/Y/Z counts equal so reference-style centroiding stays applicable)
    for oc in coords[:3]:
        for p in oc.params:
            p.fixed = True
    return cameras, truth


def test_rcs_step_matches_dense_step():
    cameras, truth = _fixed_datum_scene(
        num_points=25, num_images=6, noise=1e-4, sigma=1e-4,
        perturb=0.001, seed=11)
    layout = assign_columns(cameras, [], [])
    cs = compile_problem(cameras, [], [], layout)
    bp = cs.problem
    assert bp.defect == 0

    state = ParamState(*(jnp.asarray(a, jnp.float64) for a in cs.state))

    # dense GN step
    from bundle_adjustment_tpu.ops.assembly import make_assembler

    assemble = make_assembler(bp)
    N, n, V = assemble(state, 0.0)
    Np = V[:, None] * np.asarray(N) * V[None, :]
    dx_dense = np.asarray(V) * np.linalg.solve(Np, np.asarray(V * n))

    # rcs GN step
    rp = rcs.rcs_from_problem(bp)
    dxp, dxc, dxg, blocks, it = rcs.lm_step(rp, state, bp.spec, 0.0,
                                            cg_tol=1e-14, cg_maxiter=500)
    # compare through the column maps
    dxp = np.asarray(dxp)
    dxc = np.asarray(dxc)
    dxg = np.asarray(dxg).reshape(bp.num_cameras, -1)
    T = bp.total_size
    dx_rcs = np.zeros(T)
    for arr, cols in ((dxp, bp.col_points), (dxc, bp.col_eo)):
        m = cols >= 0
        dx_rcs[cols[m]] = arr[m]
    gcols = np.concatenate([bp.col_io, bp.col_dist], axis=1)
    m = gcols >= 0
    dx_rcs[gcols[m]] = dxg[m]

    assert np.allclose(dx_rcs, dx_dense, rtol=1e-6, atol=1e-10)
    assert int(it) < 400


def test_rcs_full_convergence():
    """Iterating RCS LM steps converges and matches the dense solution."""
    cameras, truth = _fixed_datum_scene(
        num_points=30, num_images=6, noise=1e-4, sigma=1e-4,
        perturb=0.01, seed=12)
    layout = assign_columns(cameras, [], [])
    cs = compile_problem(cameras, [], [], layout)
    bp = cs.problem
    rp = rcs.rcs_from_problem(bp)
    state = ParamState(*(jnp.asarray(a, jnp.float64) for a in cs.state))

    for _ in range(20):
        dxp, dxc, dxg, blocks, it = rcs.lm_step(rp, state, bp.spec, 0.0,
                                                cg_tol=1e-13, cg_maxiter=500)
        state, max_dx = rcs.apply_step(state, rp, dxp, dxc, dxg)
        if float(max_dx) < 1e-10:
            break
    assert float(max_dx) < 1e-10

    # dense solve of an identical scene
    cams2, truth2 = _fixed_datum_scene(
        num_points=30, num_images=6, noise=1e-4, sigma=1e-4,
        perturb=0.01, seed=12)
    adj = BundleAdjustment()
    adj.add(cams2[0])
    adj.set_invert_normal_equation(MatrixInversion.NONE)
    # centroiding shifts only *free* coordinates (faithful to the reference,
    # centroidCoordinates iterates unknownParameters only) and is therefore
    # inconsistent with a held-fixed-coordinate datum — disable it.
    adj.use_centroided_coordinates = False
    status = adj.estimate_model()
    assert status == EstimationState.ERROR_FREE_ESTIMATION
    pts_dense = np.array([[oc.x.value, oc.y.value, oc.z.value]
                          for oc in truth2["coords"]])
    assert np.allclose(np.asarray(state.points), pts_dense, atol=1e-8)
