"""F14/F15 surface on the scale driver (VERDICT r3 item 7): SIMULATION,
interrupt, state-machine events and writer export run against BOTH solvers
— the dense parity engine and the RCS scale engine
(BundleAdjustment.java:830-831, 1132-1137, 1455-1459)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from bundle_adjustment_tpu.models.layout import assign_columns
from bundle_adjustment_tpu.models.problem import ParamState, compile_problem
from bundle_adjustment_tpu.parallel import rcs, solver
from bundle_adjustment_tpu.solver.adjustment import (
    BundleAdjustment, EstimationState, EstimationType, MatrixInversion)
from bundle_adjustment_tpu.testing import make_synthetic_scene


def _scene(seed=21):
    return make_synthetic_scene(
        num_points=25, num_images=6, noise=1e-4, sigma=1e-4, perturb=0.01,
        seed=seed, with_scale_bar=True)


def _adjust(cls, cameras, bars, **kw):
    adj = cls()
    adj.add(cameras[0] if len(cameras) == 1 else cameras)
    for sb in bars:
        adj.add(sb)
    for k, v in kw.items():
        setattr(adj, k, v)
    return adj


BOTH = [BundleAdjustment, solver.ScaleBundleAdjustment]


@pytest.fixture(scope="module")
def dense_estimate_ref():
    """Dense-solver reference estimate, computed once per module (so the
    scale-vs-dense comparison cases are selectable on their own)."""
    cameras, bars, truth = _scene()
    adj = _adjust(BundleAdjustment, cameras, bars)
    adj.set_invert_normal_equation(MatrixInversion.REDUCED)
    status = adj.estimate_model()
    assert status == EstimationState.ERROR_FREE_ESTIMATION
    return (np.asarray(adj.state.points).copy(), adj.omega,
            adj.get_variance_factor_aposteriori(), np.asarray(adj.Qxx).copy())


@pytest.mark.parametrize("cls", BOTH, ids=["dense", "scale"])
def test_estimate_matches_dense(cls, dense_estimate_ref):
    """Both solver classes produce the same estimate and statistics."""
    cameras, bars, truth = _scene()
    adj = _adjust(cls, cameras, bars)
    adj.set_invert_normal_equation(MatrixInversion.REDUCED)
    status = adj.estimate_model()
    assert status == EstimationState.ERROR_FREE_ESTIMATION
    pts_d, om_d, s2_d, Q_d = dense_estimate_ref
    np.testing.assert_allclose(np.asarray(adj.state.points), pts_d,
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(adj.omega, om_d, rtol=1e-8)
    np.testing.assert_allclose(adj.get_variance_factor_aposteriori(),
                               s2_d, rtol=1e-8)
    # the two iteration paths land on states differing at the CG
    # tolerance, so Qxx (re-linearised there) matches to ~1e-6 relative
    # of its scale, not element-wise machine precision
    np.testing.assert_allclose(np.asarray(adj.Qxx), Q_d, rtol=1e-4,
                               atol=1e-6 * np.abs(Q_d).max())


@pytest.mark.parametrize("cls", BOTH, ids=["dense", "scale"])
def test_simulation_mode(cls):
    """SIMULATION zeroes the rhs: dx = 0, Omega = 0, parameters unchanged,
    Qxx still recovered (network design by variance propagation)."""
    cameras, bars, truth = _scene(seed=22)
    adj = _adjust(cls, cameras, bars)
    adj.set_estimation_type(EstimationType.SIMULATION)
    adj.set_invert_normal_equation(MatrixInversion.REDUCED)
    adj.use_centroided_coordinates = False
    before = {id(oc): (oc.x.value, oc.y.value, oc.z.value)
              for oc in truth["coords"]}
    status = adj.estimate_model()
    assert status == EstimationState.ERROR_FREE_ESTIMATION
    assert adj.omega == 0.0
    # a-posteriori variance falls back to a-priori in SIMULATION
    assert adj.get_variance_factor_aposteriori() == \
        adj.get_variance_factor_apriori()
    for oc in truth["coords"]:
        assert before[id(oc)] == (oc.x.value, oc.y.value, oc.z.value)
    assert adj.Qxx is not None and np.isfinite(adj.Qxx).all()


@pytest.mark.parametrize("cls", BOTH, ids=["dense", "scale"])
def test_interrupt_and_events(cls):
    """interrupt() stops the loop with status INTERRUPT; the listener sees
    the reference event stream (ITERATE -> ... -> INTERRUPT)."""
    cameras, bars, truth = _scene(seed=23)
    adj = _adjust(cls, cameras, bars)
    adj.set_invert_normal_equation(MatrixInversion.NONE)
    events = []

    def listener(name, old, new):
        events.append(name)
        if name == "ITERATE" and new >= 2:
            adj.interrupt()

    adj.add_property_change_listener(listener)
    status = adj.estimate_model()
    assert status == EstimationState.INTERRUPT
    assert "ITERATE" in events and events[-1] == "INTERRUPT"


def _export_info(cls, tmp_path):
    from bundle_adjustment_tpu.io.writers import DefaultResultWriter

    cameras, bars, truth = _scene(seed=24)
    base = os.path.join(tmp_path, f"out_{cls.__name__}")
    adj = _adjust(cls, cameras, bars)
    adj.set_invert_normal_equation(MatrixInversion.REDUCED)
    events = []
    adj.add_property_change_listener(lambda n, o, nw: events.append(n))
    adj.set_adjustment_result_writer(DefaultResultWriter(base))
    status = adj.estimate_model()
    assert status == EstimationState.ERROR_FREE_ESTIMATION
    assert "EXPORT_ADJUSTMENT_RESULTS" in events
    assert os.path.exists(base + ".info") and os.path.exists(base + ".cxx")
    with open(base + ".info") as fh:
        return fh.read()


@pytest.fixture(scope="module")
def dense_info_ref(tmp_path_factory):
    return _export_info(BundleAdjustment, tmp_path_factory.mktemp("dense"))


@pytest.mark.parametrize("cls", BOTH, ids=["dense", "scale"])
def test_writer_export(cls, tmp_path, dense_info_ref):
    """DefaultResultWriter exports identical .info files from both solvers
    (and the scale class fires EXPORT_ADJUSTMENT_RESULTS)."""
    content = _export_info(cls, tmp_path)
    # identical parameter names/indices; values equal to solver precision
    ref = dense_info_ref.splitlines()
    got = content.splitlines()
    assert len(ref) == len(got)
    for rl, gl in zip(ref, got):
        rf, gf = rl.split("\t"), gl.split("\t")
        assert rf[0] == gf[0] and rf[1] == gf[1] and rf[3] == gf[3]
        assert abs(float(rf[2]) - float(gf[2])) < 1e-8


def test_lm_damping_cap_shared_schedule():
    """The runaway-damping cap (lambda <= 1/sqrt(eps), Omega reset to force
    the next step — BundleAdjustment.java:409-414) applies to BOTH drivers:
    they share one schedule function, and replaying a monotonically
    worsening Omega stream through it hits the cap and then accepts."""
    from bundle_adjustment_tpu.constants import SQRT_EPS
    from bundle_adjustment_tpu.solver import adjustment

    # the scale driver must use the dense driver's schedule (not a copy)
    assert solver._lm_gain_update is adjustment.lm_gain_update

    lam, omega = 1e5, 0.0
    history = []
    k = 0
    # every step worsens Omega => rejection cascade; after the cap the
    # Omega reset forces exactly one acceptance, then the cascade resumes
    for k in range(60):
        cur = 1e3 * (k + 1)
        lam, omega, accepted = adjustment.lm_gain_update(lam, omega, cur)
        history.append((lam, omega, accepted))
        assert lam <= 1.0 / SQRT_EPS + 1e-6
    lams = [h[0] for h in history]
    assert max(lams) == 1.0 / SQRT_EPS
    i_cap = lams.index(1.0 / SQRT_EPS)
    # first evaluation accepts (omega_prev == 0 sentinel), then rejections
    assert history[0][2] and not history[1][2]
    # the capped step zeroes Omega ...
    assert history[i_cap][1] == 0.0 and not history[i_cap][2]
    # ... so the NEXT gain test accepts and relaxes lambda x0.2
    assert history[i_cap + 1][2]
    assert history[i_cap + 1][0] == pytest.approx(0.2 / SQRT_EPS)


def test_solve_rejection_keeps_damping_capped():
    """Integration: the array-native scale driver survives a rejection
    cascade without lambda running away past 1/sqrt(eps)."""
    import bench as B
    from bundle_adjustment_tpu.constants import SQRT_EPS

    problem, state, spec = B.build_problem(96, 8, 6, jnp.float64, seed=33)
    # a heavily perturbed start + tiny damping overshoots, driving the
    # gain-test rejection path
    state = state._replace(points=state.points * 1.5 + 3.0)
    lam_events = []
    res = solver.solve(problem, state, spec, damping=1e-8,
                       max_iterations=12, cg_tol=1e-10, cg_maxiter=300,
                       listeners=[lambda n, o, nw: lam_events.append((n, nw))
                                  if n == "LEVENBERG_MARQUARDT_STEP"
                                  else None])
    assert lam_events, "no LM gain events fired"
    assert all(lam <= 1.0 / SQRT_EPS + 1e-6 for _, lam in lam_events)


def test_solve_simulation_events_interrupt():
    """Array-native driver surface: solve(simulation=True) returns a zero
    step with Omega = 0; listeners fire; `interrupted` stops the loop."""
    import bench as B

    problem, state, spec = B.build_problem(128, 8, 6, jnp.float64, seed=31)
    res = solver.solve(problem, state, spec, simulation=True)
    assert res.status == EstimationState.ERROR_FREE_ESTIMATION
    assert res.omega == 0.0 and res.max_abs_dx == 0.0
    np.testing.assert_array_equal(np.asarray(res.state.points),
                                  np.asarray(state.points))

    events = []
    stop = {"now": False}
    res2 = solver.solve(
        problem, state, spec, damping=1e-3, max_iterations=10,
        listeners=[lambda n, o, nw: events.append(n)],
        interrupted=lambda: stop["now"] or stop.update(now=True) or False)
    # first poll returns False and arms the flag; second iteration stops
    assert res2.status == EstimationState.INTERRUPT
    assert res2.iterations == 2
    assert "ITERATE" in events and "LEVENBERG_MARQUARDT_STEP" in events
    assert events[-1] == "INTERRUPT"
