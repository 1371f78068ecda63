"""Distributed blocked Cholesky (parallel/tp.py): factorization panels
sharded row-wise over the 8-device CPU mesh, checked against jnp.linalg
and against the implicit-Schur PCG on a real reduced system."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from bundle_adjustment_tpu.parallel import rcs, tp


def _mesh():
    return Mesh(np.array(jax.devices()[:8]), (tp.AXIS,))


def test_distributed_cholesky_matches_dense():
    rng = np.random.default_rng(7)
    n = 128
    A = rng.standard_normal((n, n))
    S = jnp.asarray(A @ A.T + n * np.eye(n))
    L = tp.distributed_cholesky(S, _mesh(), block=8)
    Lref = jnp.linalg.cholesky(S)
    np.testing.assert_allclose(np.asarray(L), np.asarray(Lref),
                               rtol=1e-10, atol=1e-10)


def test_distributed_solve_matches_dense():
    rng = np.random.default_rng(8)
    n = 64
    A = rng.standard_normal((n, n))
    S = jnp.asarray(A @ A.T + n * np.eye(n))
    r = jnp.asarray(rng.standard_normal(n))
    mesh = _mesh()
    L = tp.distributed_cholesky(S, mesh, block=4)
    x = tp.distributed_cholesky_solve(L, r, mesh, block=4)
    np.testing.assert_allclose(np.asarray(x),
                               np.asarray(jnp.linalg.solve(S, r)),
                               rtol=1e-9, atol=1e-11)


def test_dimension_checks():
    S = jnp.eye(60)
    with pytest.raises(ValueError, match="multiple"):
        tp.distributed_cholesky(S, _mesh(), block=8)


def test_reduced_direct_solve_matches_pcg():
    """Explicit assembly + TP direct solve == implicit PCG on a synthetic
    bundle-adjustment reduced system (and the step matches the dense
    parity solver's semantics through rcs.lm_step)."""
    import bench as B

    problem, state, spec = B.build_problem(256, 16, 6, jnp.float64, seed=5)
    damping = jnp.asarray(1e-4, jnp.float64)
    b = rcs.linearize(problem, state, spec, damping)
    rc, rg = rcs.reduced_rhs(problem, b)
    Minv = rcs.Precond(Minv_c=rcs.camera_block_preconditioner(problem, b),
                       Minv_g=rcs.global_block_preconditioner(problem, b))
    xc_ref, xg_ref, _ = rcs.pcg(problem, b, rc, rg, Minv,
                                tol=1e-14, maxiter=2000)

    xc, xg = tp.solve_reduced_direct(problem, b, _mesh(), block=8)
    np.testing.assert_allclose(np.asarray(xc), np.asarray(xc_ref),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(xg), np.asarray(xg_ref),
                               rtol=1e-7, atol=1e-9)

    # the explicit matrix itself agrees with the implicit matvec
    S, r = tp.assemble_reduced_system(problem, b)
    M = problem.num_images
    v = np.asarray(jnp.concatenate([xc.reshape(-1), xg]))
    Sv = np.asarray(S) @ v
    mc, mg = rcs.schur_matvec(problem, b, xc, xg)
    np.testing.assert_allclose(Sv[:6 * M],
                               np.asarray(mc).reshape(-1), rtol=1e-8,
                               atol=1e-10)
    np.testing.assert_allclose(Sv[6 * M:], np.asarray(mg), rtol=1e-8,
                               atol=1e-10)


def test_multi_rhs_and_cofactor_columns():
    """Multi-RHS distributed solve == dense; cofactor columns == rows of
    the dense inverse (REDUCED inversion mode semantics at scale)."""
    rng = np.random.default_rng(9)
    n = 64
    A = rng.standard_normal((n, n))
    S = jnp.asarray(A @ A.T + n * np.eye(n))
    R = jnp.asarray(rng.standard_normal((n, 5)))
    mesh = _mesh()
    L = tp.distributed_cholesky(S, mesh, block=4)
    X = tp.distributed_cholesky_solve(L, R, mesh, block=4)
    np.testing.assert_allclose(np.asarray(X),
                               np.asarray(jnp.linalg.solve(S, R)),
                               rtol=1e-9, atol=1e-11)

    cols = [0, 17, 63]
    Q = tp.reduced_cofactor_columns(L, cols, n, mesh, block=4)
    Qref = np.linalg.inv(np.asarray(S))[:, cols]
    np.testing.assert_allclose(np.asarray(Q), Qref, rtol=1e-8, atol=1e-12)


def test_cyclic_vs_fallback_paths():
    """The unrolled block-cyclic kernel and the masked fori_loop fallback
    produce the same factor (natural layout) — exercised by crossing the
    unroll budget."""
    rng = np.random.default_rng(9)
    n = 256
    A = rng.standard_normal((n, n))
    S = jnp.asarray(A @ A.T + n * np.eye(n))
    mesh = _mesh()
    Lref = jnp.linalg.cholesky(S)
    # block=16 -> nb=16 (unrolled cyclic); budget forced to 1 -> fallback
    L_unrolled = tp.distributed_cholesky(S, mesh, block=16)
    old = tp._MAX_UNROLL
    try:
        tp._MAX_UNROLL = 1
        L_fallback = tp.distributed_cholesky(S, mesh, block=16)
    finally:
        tp._MAX_UNROLL = old
    np.testing.assert_allclose(np.asarray(L_unrolled), np.asarray(Lref),
                               rtol=1e-10, atol=1e-9)
    np.testing.assert_allclose(np.asarray(L_fallback), np.asarray(Lref),
                               rtol=1e-10, atol=1e-9)
