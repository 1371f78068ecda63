"""Explicit shard_map SPMD LM step on the 8-device CPU mesh: must match the
single-device RCS step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from bundle_adjustment_tpu.models.layout import assign_columns
from bundle_adjustment_tpu.models.problem import ParamState, compile_problem
from bundle_adjustment_tpu.parallel import rcs, spmd
from bundle_adjustment_tpu.testing import make_synthetic_scene


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs a multi-device mesh")
def test_spmd_step_matches_single_device():
    cameras, _, truth = make_synthetic_scene(
        num_points=24, num_images=6, noise=1e-4, sigma=1e-4,
        perturb=0.005, seed=61, with_scale_bar=False)
    for oc in truth["coords"][:3]:
        for p in oc.params:
            p.fixed = True
    layout = assign_columns(cameras, [], [])
    cs = compile_problem(cameras, [], [], layout)
    bp = cs.problem
    state = ParamState(*(jnp.asarray(a, jnp.float64) for a in cs.state))

    # single-device reference step (GN, tight CG)
    rp = rcs.rcs_from_problem(bp)
    dxp, dxc, dxg, blocks, _ = rcs.lm_step(rp, state, bp.spec, 0.0,
                                           cg_tol=1e-13, cg_maxiter=1000)
    ref_state, ref_dx = rcs.apply_step(state, rp, dxp, dxc, dxg)

    # SPMD step over the full CPU mesh
    mesh = Mesh(np.array(jax.devices()), ("obs",))
    rp2 = rcs.rcs_from_problem(bp, build_tables=False)
    rp2 = spmd.shard_problem(rp2, mesh)
    step = spmd.make_spmd_lm_step(rp2, bp.spec, mesh,
                                  cg_tol=1e-13, cg_maxiter=1000)
    new_state, max_dx, omega0, it = step(state)

    assert np.isclose(float(max_dx), float(ref_dx), rtol=1e-8)
    assert np.allclose(np.asarray(new_state.points),
                       np.asarray(ref_state.points), atol=1e-9)
    assert np.allclose(np.asarray(new_state.eo),
                       np.asarray(ref_state.eo), atol=1e-9)
    assert np.isfinite(float(omega0))
