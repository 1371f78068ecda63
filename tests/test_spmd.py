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


def test_spmd_fm_matches_single_device():
    """Point-sharded feature-major SPMD step == single-device engine step
    (parallel/spmd_fm.py), 8-device CPU mesh."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    import bench as B
    from bundle_adjustment_tpu.parallel import engine, rcs, spmd_fm

    problem, state, spec = B.build_problem(512, 24, 8, jnp.float64, seed=3)
    mesh = Mesh(np.array(jax.devices()[:8]), ("pts",))
    problem, state, _ = spmd_fm.pad_for_mesh(problem, state, mesh)

    step, args0 = spmd_fm.make_spmd_fm_lm_step(
        problem, state, spec, mesh, damping=1e-4,
        cg_tol=1e-12, cg_maxiter=500)
    (pts, io, dist, eo), mdx, om, it = step(*args0)

    fmp = engine.fm_problem(problem)
    dxp, dxc, dxg, b, it1 = engine.lm_step(
        fmp, state, spec, jnp.asarray(1e-4), cg_tol=1e-12, cg_maxiter=500)
    st1, mdx1 = rcs.apply_step(state, problem, dxp, dxc, dxg)

    np.testing.assert_allclose(np.asarray(pts), np.asarray(st1.points),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(eo), np.asarray(st1.eo),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(io), np.asarray(st1.io),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(float(om), float(b.omega0), rtol=1e-10)
    np.testing.assert_allclose(float(mdx), float(mdx1), rtol=1e-7)

    # iterate twice more: the sharded step composes
    p2, i2, d2, e2 = pts, io, dist, eo
    for _ in range(2):
        (p2, i2, d2, e2), mdx2, om2, it2 = step(p2, i2, d2, e2)
    assert np.isfinite(float(mdx2)) and float(om2) < float(om)


def test_spmd_fm_cam_shard_matches_single_device():
    """TP mode: reduced camera system sharded by image rows over the mesh
    (reduce_scatter + all_gather instead of replicated psum) == single-
    device engine step (survey section 2.J TP row)."""
    import bench as B
    from bundle_adjustment_tpu.parallel import engine, rcs, spmd_fm

    problem, state, spec = B.build_problem(512, 24, 8, jnp.float64, seed=3)
    mesh = Mesh(np.array(jax.devices()[:8]), ("pts",))
    problem, state, _ = spmd_fm.pad_for_mesh(problem, state, mesh)

    step, args0 = spmd_fm.make_spmd_fm_lm_step(
        problem, state, spec, mesh, damping=1e-4,
        cg_tol=1e-12, cg_maxiter=500, cam_shard=True)
    (pts, io, dist, eo), mdx, om, it = step(*args0)

    fmp = engine.fm_problem(problem)
    dxp, dxc, dxg, b, it1 = engine.lm_step(
        fmp, state, spec, jnp.asarray(1e-4), cg_tol=1e-12, cg_maxiter=500)
    st1, mdx1 = rcs.apply_step(state, problem, dxp, dxc, dxg)

    np.testing.assert_allclose(np.asarray(pts), np.asarray(st1.points),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(eo), np.asarray(st1.eo),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(io), np.asarray(st1.io),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(float(om), float(b.omega0), rtol=1e-10)
    np.testing.assert_allclose(float(mdx), float(mdx1), rtol=1e-7)

    # the TP step composes: two more iterations contract omega
    p2, i2, d2, e2 = pts, io, dist, eo
    for _ in range(2):
        (p2, i2, d2, e2), mdx2, om2, it2 = step(p2, i2, d2, e2)
    assert np.isfinite(float(mdx2)) and float(om2) < float(om)


def test_spmd_fm_cam_shard_ragged_images():
    """A ragged image count is rejected without padding, and with
    images=True padding (fully-fixed dummy images) the TP step matches the
    unpadded single-device step on the real rows."""
    import bench as B
    from bundle_adjustment_tpu.parallel import engine, rcs, spmd_fm

    problem, state, spec = B.build_problem(512, 23, 8, jnp.float64, seed=3)
    mesh = Mesh(np.array(jax.devices()[:8]), ("pts",))
    p1, s1, _ = spmd_fm.pad_for_mesh(problem, state, mesh)
    with pytest.raises(ValueError, match="cam_shard"):
        spmd_fm.make_spmd_fm_lm_step(p1, s1, spec, mesh, cam_shard=True)

    p2, s2, _ = spmd_fm.pad_for_mesh(problem, state, mesh, images=True)
    assert p2.num_images == 24
    step, args0 = spmd_fm.make_spmd_fm_lm_step(
        p2, s2, spec, mesh, damping=1e-4, cg_tol=1e-12, cg_maxiter=500,
        cam_shard=True)
    (pts, io, dist, eo), mdx, om, it = step(*args0)

    fmp = engine.fm_problem(p1)
    dxp, dxc, dxg, b, _ = engine.lm_step(
        fmp, s1, spec, jnp.asarray(1e-4), cg_tol=1e-12, cg_maxiter=500)
    st1, _ = rcs.apply_step(s1, p1, dxp, dxc, dxg)

    np.testing.assert_allclose(np.asarray(pts), np.asarray(st1.points),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(eo)[:23], np.asarray(st1.eo),
                               rtol=1e-8, atol=1e-10)
    # dummy images take no step
    np.testing.assert_array_equal(np.asarray(eo)[23:],
                                  np.asarray(s2.eo)[23:])
    np.testing.assert_allclose(float(om), float(b.omega0), rtol=1e-10)


def test_run_mesh_suite_smoke():
    """bench.run_mesh_suite (the --mesh N perf mode) executes end-to-end on
    a small virtual mesh and reports the contract fields (VERDICT r4
    item 7: the mode was previously untested)."""
    import bench as B

    out = B.run_mesh_suite(2, 512, 16, 8)
    assert out["mesh_devices"] == 2
    assert out["mesh_platform"] == "cpu"
    for key in ("mesh_lm_it_per_s_fixed_cg8", "mesh_matvec_ms",
                "mesh_matvec_agg_gbps", "mesh_compile_s"):
        assert key in out and np.isfinite(out[key]), key
    assert out["mesh_lm_it_per_s_fixed_cg8"] > 0
    assert out["mesh_matvec_ms"] > 0
