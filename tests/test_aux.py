"""Checkpoint/resume, linalg utilities, tracing, scenario batching."""

import os
import tempfile

import jax.numpy as jnp
import numpy as np

from bundle_adjustment_tpu.models.problem import ParamState
from bundle_adjustment_tpu.ops import linalg
from bundle_adjustment_tpu.solver.checkpoint import LMCheckpoint
from bundle_adjustment_tpu.solver.tracing import PhaseTimer


def test_checkpoint_roundtrip():
    state = ParamState(
        points=jnp.arange(12.0).reshape(4, 3),
        io=jnp.ones((1, 3)), dist=jnp.zeros((1, 5)),
        eo=jnp.full((2, 6), 2.0))
    ck = LMCheckpoint(state=state, iteration=7, adapted_damping=0.25,
                      omega=1.5, max_abs_dx=1e-3,
                      centroid=np.array([1.0, 2.0, 3.0]))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ck.npz")
        ck.save(path)
        back = LMCheckpoint.load(path)
    assert back.iteration == 7
    assert back.adapted_damping == 0.25
    assert back.omega == 1.5
    assert np.allclose(back.state.points, np.asarray(state.points))
    assert np.allclose(back.centroid, [1, 2, 3])


def test_linalg_spd():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(8, 8))
    N = jnp.asarray(A @ A.T + 8 * np.eye(8))
    n = jnp.asarray(rng.normal(size=8))
    x = linalg.solve_spd(N, n)
    assert np.allclose(N @ x, n, atol=1e-10)
    Ninv = linalg.inv_spd(N)
    assert np.allclose(Ninv @ N, np.eye(8), atol=1e-10)


def test_linalg_pinv_cond_eig():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(6, 4))
    Ap = linalg.pinv(jnp.asarray(A))
    assert np.allclose(A @ Ap @ A, A, atol=1e-10)
    S = jnp.asarray(A.T @ A)
    c = float(linalg.cond(S))
    s = np.linalg.svd(np.asarray(S), compute_uv=False)
    assert np.isclose(c, s[0] / s[-1], rtol=1e-10)
    w, v = linalg.eig_selected(S, 1, 2)
    w_np = np.linalg.eigvalsh(np.asarray(S))
    assert np.allclose(np.asarray(w), w_np[:2], rtol=1e-10)
    # eigenvector property
    for k in range(2):
        assert np.allclose(np.asarray(S) @ np.asarray(v[:, k]),
                           float(w[k]) * np.asarray(v[:, k]), atol=1e-8)


def test_phase_timer():
    t = PhaseTimer()
    t.listener("ITERATE", 100, 1)
    t.listener("CONVERGENCE", 1e-8, 1e-3)
    t.listener("ITERATE", 100, 2)
    report = t.report()
    assert "ITERATE" in report and "CONVERGENCE" in report
    assert t.counts["ITERATE"] == 2


def test_scenario_batched_lm():
    """Two identical-shape scenarios converge independently under vmap."""
    from bundle_adjustment_tpu.models.layout import assign_columns
    from bundle_adjustment_tpu.models.problem import compile_problem
    from bundle_adjustment_tpu.parallel import rcs, scenario
    from bundle_adjustment_tpu.testing import make_synthetic_scene

    states, xys, weights = [], [], []
    rp = None
    spec = None
    for seed in (51, 52):
        cameras, _, truth = make_synthetic_scene(
            num_points=15, num_images=4, noise=1e-4, sigma=1e-4,
            perturb=0.01, seed=seed, with_scale_bar=False)
        for oc in truth["coords"][:3]:
            for par in oc.params:
                par.fixed = True
        layout = assign_columns(cameras, [], [])
        cs = compile_problem(cameras, [], [], layout)
        bp = cs.problem
        r = rcs.rcs_from_problem(bp)
        if rp is None:
            rp, spec = r, bp.spec
        states.append(ParamState(*(jnp.asarray(a) for a in cs.state)))
        xys.append(np.asarray(r.obs_xy))
        weights.append(np.asarray(r.obs_weight))

    # identical static shape required
    assert xys[0].shape == xys[1].shape
    batch = scenario.make_batch(
        rp, np.stack(xys), np.stack(weights),
        ParamState(*(jnp.stack([np.asarray(getattr(s, f)) for s in states])
                     for f in ParamState._fields)))

    for _ in range(8):
        new_states, max_dx, om, it = scenario.scenario_lm_step(
            batch, spec, 0.0, cg_tol=1e-12, cg_maxiter=300)
        batch = batch._replace(states=new_states)
    assert np.all(np.asarray(max_dx) < 1e-8)


def test_reader_interrupt_and_lock(tmp_path):
    """Cooperative interrupt stops the line loop; the shared advisory lock is
    released after the read (LockFileReader.java:80,105-107)."""
    from bundle_adjustment_tpu.io.readers import (
        ReadInterrupt, _read_lines, read_object_coordinates_flat)

    f = tmp_path / "pts.txt"
    f.write_text("\n".join(f"P{i} {i} {i} {i}" for i in range(100)))

    # interrupt raised before reading -> nothing imported
    intr = ReadInterrupt()
    intr.interrupt()
    assert read_object_coordinates_flat(f, interrupt=intr) == {}

    # interrupt raised mid-read -> partial import, loop stops
    intr = ReadInterrupt()
    seen = []
    for line in _read_lines(f, "#", intr):
        seen.append(line)
        if len(seen) == 5:
            intr.interrupt()
    assert len(seen) == 5

    # lock is released: an exclusive flock succeeds after the read
    import fcntl
    with open(f) as fh:
        fcntl.flock(fh.fileno(), fcntl.LOCK_EX | fcntl.LOCK_NB)
        fcntl.flock(fh.fileno(), fcntl.LOCK_UN)


def test_rcs_result_status():
    from bundle_adjustment_tpu.parallel.solver import RCSResult
    from bundle_adjustment_tpu.solver.adjustment import EstimationState

    r = RCSResult(state=None, converged=True, iterations=3, omega=1.0,
                  max_abs_dx=0.0)
    assert r.status == EstimationState.ERROR_FREE_ESTIMATION
    r = RCSResult(state=None, converged=False, iterations=3, omega=1.0,
                  max_abs_dx=1.0)
    assert r.status == EstimationState.NO_CONVERGENCE
