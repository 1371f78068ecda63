"""The fused Pallas assembly (prepare) kernel must match engine.prepare
(interpret mode on CPU, f32)."""

import jax
import jax.numpy as jnp
import numpy as np

from bundle_adjustment_tpu.models.problem import ParamState
from bundle_adjustment_tpu.parallel import engine, kernels, rcs


def _problem(P=128, M=6, V=4, seed=11):
    from bench import build_problem

    problem, state, spec = build_problem(P, M, V, jnp.float32, seed=seed)
    problem, state, _ = engine.pad_problem(problem, state)
    return problem, state, spec


def _fm_vm(problem):
    """View-major FMProblem (the layout the Pallas kernels consume)."""
    fmp = engine.fm_problem(problem)
    return engine.to_view_major(
        fmp, kernels.choose_pb(fmp.num_points, fmp.views))


def test_prepare_pallas_matches_xla():
    problem, state, spec = _problem()
    fmp = _fm_vm(problem)
    lam = jnp.asarray(1e-3, jnp.float32)

    b_ref, rc_ref, rg_ref, Minv_ref = engine.prepare(
        fmp, state, spec, lam, couple_global=True)
    b, rc, rg, Minv, pp = kernels.prepare_pallas(
        fmp, state, spec, lam, couple_global=True, interpret=True)

    np.testing.assert_allclose(np.asarray(rc), np.asarray(rc_ref),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rg), np.asarray(rg_ref),
                               rtol=2e-4, atol=1e-4)
    def close_scaled(a, b, tol):
        a, b = np.asarray(a), np.asarray(b)
        err = np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-30)
        assert err < tol, f"scaled error {err:.3e} > {tol}"

    # inverses of f32 blocks with ~1e4-magnitude entries: compare relative
    # to the block scale with cond(Scc) headroom (per-element rtol is
    # meaningless below f32 eps * |S| * cond; these are preconditioners,
    # CG tolerance governs the solution accuracy)
    close_scaled(Minv.Minv_c, Minv_ref.Minv_c, 5e-4)
    close_scaled(Minv.Sghat_inv, Minv_ref.Sghat_inv, 5e-4)
    np.testing.assert_allclose(np.asarray(b.bc), np.asarray(b_ref.bc),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b.extra_c),
                               np.asarray(b_ref.extra_c),
                               rtol=2e-4, atol=1e-6)

    # the packed rows feed the matvec kernel unchanged (with_pw appends)
    mv_p = kernels.make_matvec(pp, b.extra_c, b.extra_g, interpret=True)
    sc_p, sg_p = mv_p(rc, rg)
    sc_x, sg_x = engine.schur_matvec(fmp, b_ref, rc, rg)
    np.testing.assert_allclose(np.asarray(sc_p), np.asarray(sc_x),
                               rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sg_p), np.asarray(sg_x),
                               rtol=2e-4, atol=1e-3)


def test_prepare_pallas_uncoupled():
    problem, state, spec = _problem(seed=12)
    fmp = _fm_vm(problem)
    lam = jnp.asarray(1e-4, jnp.float32)
    b_ref, rc_ref, rg_ref, Minv_ref = engine.prepare(
        fmp, state, spec, lam, couple_global=False)
    b, rc, rg, Minv, pp = kernels.prepare_pallas(
        fmp, state, spec, lam, couple_global=False, interpret=True)
    np.testing.assert_allclose(np.asarray(rc), np.asarray(rc_ref),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Minv.Minv_g),
                               np.asarray(Minv_ref.Minv_g),
                               rtol=5e-3, atol=1e-5)
    assert Minv.Scg is None


def test_prepare_pallas_full_step_converges():
    """A full LM step built from the Pallas prepare + matvec contracts the
    objective like the XLA step."""
    problem, state, spec = _problem(seed=13)
    fmp = _fm_vm(problem)
    lam = jnp.asarray(1e-4, jnp.float32)

    b, rc, rg, Minv, pp = kernels.prepare_pallas(
        fmp, state, spec, lam, couple_global=True, interpret=True)
    mv = kernels.make_matvec(pp, b.extra_c, b.extra_g, interpret=True)
    xc, xg, it = rcs.pcg(None, None, rc, rg, Minv, tol=1e-8, maxiter=200,
                         matvec=mv)
    dxp = engine.back_substitute_points(fmp, b, xc, xg)

    # functional check (exact dx comparison is ill-posed: the two f32 CG
    # runs stall at slightly different iterates): the Pallas-built step
    # must contract Omega at least as much as the XLA step does, up to a
    # few percent
    om_pal = float(engine.omega_at(fmp, b, jnp.asarray(dxp), xc, xg))
    dxp_r, dxc_r, dxg_r, b_r, _ = engine.lm_step(
        fmp, state, spec, lam, cg_tol=1e-8, cg_maxiter=200)
    om_xla = float(engine.omega_at(fmp, b_r, dxp_r, dxc_r, dxg_r))
    om0 = float(b.omega0)
    assert om_pal < 0.9 * om0
    assert om_pal < om_xla * 1.05


def test_prepare_pallas_two_level_onehot():
    """M > 128 images exercises the factored one-hot (W > 1) in the fused
    assembly kernel."""
    problem, state, spec = _problem(P=128, M=130, V=4, seed=14)
    fmp = _fm_vm(problem)
    lam = jnp.asarray(1e-3, jnp.float32)
    b_ref, rc_ref, rg_ref, Minv_ref = engine.prepare(
        fmp, state, spec, lam, couple_global=True)
    b, rc, rg, Minv, pp = kernels.prepare_pallas(
        fmp, state, spec, lam, couple_global=True, interpret=True)
    assert pp.m_pad // kernels.choose_h(pp.m_pad, 13.0) > 1
    np.testing.assert_allclose(np.asarray(rc), np.asarray(rc_ref),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rg), np.asarray(rg_ref),
                               rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(b.bc), np.asarray(b_ref.bc),
                               rtol=2e-4, atol=1e-5)


def test_prepare_subslice_matches():
    """ps < pb (the VMEM sub-slicing for matvec-optimal big lane blocks)
    accumulates the same reduction as the one-shot block."""
    problem, state, spec = _problem(P=512, M=6, V=4)
    fmp = engine.fm_problem(problem)
    fmv = engine.to_view_major(fmp, 512)
    b = engine.linearize(fmv, state, spec, jnp.asarray(1e-3, jnp.float32))
    pp = kernels.pack_fm(b, fmv, with_pw=True)
    full = kernels.make_prepare_reduction(pp, interpret=True, ps=512)()
    sub = kernels.make_prepare_reduction(pp, interpret=True, ps=128)()
    for a, bb in zip(full, sub):
        a, bb = np.asarray(a), np.asarray(bb)
        scale = max(np.max(np.abs(a)), 1e-30)
        np.testing.assert_allclose(a, bb, rtol=2e-4, atol=1e-5 * scale)
