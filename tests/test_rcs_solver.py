"""Large-scale LM driver converges and matches the dense solution."""

import jax.numpy as jnp
import numpy as np

from bundle_adjustment_tpu.models.layout import assign_columns
from bundle_adjustment_tpu.models.problem import ParamState, compile_problem
from bundle_adjustment_tpu.parallel import rcs
from bundle_adjustment_tpu.parallel.solver import solve
from bundle_adjustment_tpu.testing import make_synthetic_scene


def test_rcs_solver_converges():
    cameras, _, truth = make_synthetic_scene(
        num_points=30, num_images=6, noise=1e-4, sigma=1e-4,
        perturb=0.02, seed=101, with_scale_bar=False)
    for oc in truth["coords"][:3]:
        for p in oc.params:
            p.fixed = True
    cs = compile_problem(cameras, [], [], assign_columns(cameras, [], []))
    bp = cs.problem
    rp = rcs.rcs_from_problem(bp)
    state = ParamState(*(jnp.asarray(a, jnp.float64) for a in cs.state))

    res = solve(rp, state, bp.spec, damping=0.0, max_iterations=50,
                cg_tol=1e-13, cg_maxiter=500)
    assert res.converged
    assert res.max_abs_dx < 2e-8
    assert res.iterations < 20


def test_rcs_solver_with_damping():
    cameras, _, truth = make_synthetic_scene(
        num_points=30, num_images=6, noise=1e-4, sigma=1e-4,
        perturb=0.5, seed=102, with_scale_bar=False)
    for oc in truth["coords"][:3]:
        for p in oc.params:
            p.fixed = True
    cs = compile_problem(cameras, [], [], assign_columns(cameras, [], []))
    bp = cs.problem
    rp = rcs.rcs_from_problem(bp)
    state = ParamState(*(jnp.asarray(a, jnp.float64) for a in cs.state))

    res = solve(rp, state, bp.spec, damping=0.1, max_iterations=100,
                cg_tol=1e-13, cg_maxiter=500)
    assert res.converged
