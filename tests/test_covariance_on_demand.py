"""Covariance-blocks-on-demand must match the dense bordered inverse."""

import jax.numpy as jnp
import numpy as np

from bundle_adjustment_tpu.models.layout import assign_columns
from bundle_adjustment_tpu.models.problem import ParamState, compile_problem
from bundle_adjustment_tpu.parallel import covariance, rcs
from bundle_adjustment_tpu.testing import make_synthetic_scene


def _setup():
    cameras, _, truth = make_synthetic_scene(
        num_points=25, num_images=6, noise=1e-4, sigma=1e-4,
        perturb=0.0, seed=41, with_scale_bar=False)
    for oc in truth["coords"][:3]:
        for p in oc.params:
            p.fixed = True
    layout = assign_columns(cameras, [], [])
    cs = compile_problem(cameras, [], [], layout)
    bp = cs.problem
    rp = rcs.rcs_from_problem(bp)
    state = ParamState(*(jnp.asarray(a, jnp.float64) for a in cs.state))

    # converge with plain GN
    for _ in range(10):
        dxp, dxc, dxg, blocks, _ = rcs.lm_step(rp, state, bp.spec, 0.0,
                                               cg_tol=1e-13, cg_maxiter=500)
        state, mx = rcs.apply_step(state, rp, dxp, dxc, dxg)
        if float(mx) < 1e-11:
            break

    # dense reference covariance via the full bordered system
    from bundle_adjustment_tpu.ops.assembly import make_assembler

    assemble = make_assembler(bp)
    N, n, V = assemble(state, 0.0)
    Np = np.asarray(V)[:, None] * np.asarray(N) * np.asarray(V)[None, :]
    Q = np.asarray(V)[:, None] * np.linalg.inv(Np) * np.asarray(V)[None, :]
    return bp, rp, state, Q


def test_point_blocks_match_dense():
    bp, rp, state, Q = _setup()
    blocks = rcs.linearize(rp, state, bp.spec, 0.0)
    ids = np.array([3, 7, 20], np.int32)
    Qb = np.asarray(covariance.point_covariance_blocks(
        rp, blocks, ids, tol=1e-12, maxiter=2000))
    for j, pid in enumerate(ids):
        cols = bp.col_points[pid]
        assert (cols >= 0).all()
        dense = Q[np.ix_(cols, cols)]
        assert np.allclose(Qb[j], dense, rtol=1e-5, atol=1e-12), (
            j, Qb[j], dense)


def test_camera_blocks_match_dense():
    bp, rp, state, Q = _setup()
    blocks = rcs.linearize(rp, state, bp.spec, 0.0)
    ids = np.array([0, 4], np.int32)
    Qb = np.asarray(covariance.camera_covariance_blocks(
        rp, blocks, ids, tol=1e-12, maxiter=2000))
    for j, mid in enumerate(ids):
        cols = bp.col_eo[mid]
        assert (cols >= 0).all()
        dense = Q[np.ix_(cols, cols)]
        assert np.allclose(Qb[j], dense, rtol=1e-5, atol=1e-12)
