"""TPU experiment 6: which piece loses the accuracy — prepare_pallas
outputs, the v2 matvec, or the preconditioner?

Ground truth: one LM step computed in f64 on the CPU backend (same
problem, same damping).  Each TPU variant's (dxc, dxg, dxp) is compared
against it.  P is kept at 25k so the CPU f64 reference stays fast.

Run: timeout 1800 python tools/exp_tpu6.py
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")
import bench as B
from bundle_adjustment_tpu.parallel import engine, kernels, rcs

P_, M_, V_ = 24576, 500, 12


def err(dx, ref, name):
    e = max(float(jnp.max(jnp.abs(dx[i].astype(jnp.float64) - ref[i])))
            for i in range(3))
    s = max(float(jnp.max(jnp.abs(ref[i]))) for i in range(3))
    print(f"{name:28s} max|dx - dx64| = {e:.3e}   (|dx| scale {s:.3e})",
          flush=True)
    return e


def main():
    problem32, state32, spec = B.build_problem(P_, M_, V_, jnp.float32)
    problem32, state32, _ = engine.pad_problem(problem32, state32)

    lam = 1e-6
    cpu = jax.devices("cpu")[0]

    # ---- f64 CPU reference step ---------------------------------------
    t0 = time.time()
    with jax.default_device(cpu):
        problem64 = jax.tree.map(
            lambda x: x.astype(jnp.float64)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            problem32)
        state64 = jax.tree.map(lambda x: x.astype(jnp.float64), state32)
        fmp64 = engine.fm_problem(problem64)
        dxp64, dxc64, dxg64, _, it64 = engine.lm_step(
            fmp64, state64, spec, jnp.asarray(lam, jnp.float64),
            cg_tol=1e-13, cg_maxiter=600, couple_global=True)
        ref = (np.asarray(dxp64), np.asarray(dxc64), np.asarray(dxg64))
    print(f"cpu f64 reference: {time.time()-t0:.1f}s, cg_it={int(it64)}",
          flush=True)
    ref = tuple(jnp.asarray(r) for r in ref)

    # ---- TPU variants ---------------------------------------------------
    fmp = engine.fm_problem(problem32)
    fmv = engine.to_view_major(fmp, kernels.choose_pb(fmp.num_points,
                                                      fmp.views))
    lam32 = jnp.asarray(lam, jnp.float32)

    def step_xla(st):
        dxp, dxc, dxg, b, it = engine.lm_step(
            fmv, st, spec, lam32, cg_tol=1e-10, cg_maxiter=200,
            couple_global=True, use_pallas=False, stall_limit=100)
        return dxp, dxc, dxg, it

    def step_pallas(st):
        dxp, dxc, dxg, b, it = engine.lm_step(
            fmv, st, spec, lam32, cg_tol=1e-10, cg_maxiter=200,
            couple_global=True, use_pallas=True, stall_limit=100)
        return dxp, dxc, dxg, it

    # mixed: pallas prepare (rhs+precond) but XLA matvec
    def step_mixed_pp(st):
        b, rc, rg, Minv, pp = kernels.prepare_pallas(
            fmv, st, spec, lam32, couple_global=True)
        xc, xg, it = rcs.pcg(None, None, rc, rg, Minv, tol=1e-10,
                             maxiter=200, stall_limit=100,
                             matvec=lambda c, g: engine.schur_matvec(
                                 fmv, b, c, g))
        dxp = engine.back_substitute_points(fmv, b, xc, xg)
        return dxp, xc, xg, it

    # mixed: XLA prepare but pallas matvec
    def step_mixed_pm(st):
        b, rc, rg, Minv = engine.prepare(fmv, st, spec, lam32,
                                         couple_global=True)
        pp = kernels.pack_fm(b, fmv)
        mv = kernels.make_matvec(pp, b.extra_c, b.extra_g)
        xc, xg, it = rcs.pcg(None, None, rc, rg, Minv, tol=1e-10,
                             maxiter=200, stall_limit=100, matvec=mv)
        dxp = engine.back_substitute_points(fmv, b, xc, xg)
        return dxp, xc, xg, it

    # mixed: pallas prepare for precond only; XLA rhs (rc, rg); XLA matvec
    def step_mixed_rhs(st):
        bx, rcx, rgx, _Mx = engine.prepare(fmv, st, spec, lam32,
                                           couple_global=True)
        b, rc, rg, Minv, pp = kernels.prepare_pallas(
            fmv, st, spec, lam32, couple_global=True)
        mv = kernels.make_matvec(pp, b.extra_c, b.extra_g)
        xc, xg, it = rcs.pcg(None, None, rcx, rgx, Minv, tol=1e-10,
                             maxiter=200, stall_limit=100, matvec=mv)
        dxp = engine.back_substitute_points(fmv, b, xc, xg)
        return dxp, xc, xg, it

    for name, fn in (("xla prep + xla mv", step_xla),
                     ("pallas prep + pallas mv", step_pallas),
                     ("pallas prep + XLA mv", step_mixed_pp),
                     ("xla prep + pallas mv", step_mixed_pm),
                     ("pallas precond, xla rhs+pmv", step_mixed_rhs)):
        f = jax.jit(fn)
        t0 = time.time()
        dxp, dxc, dxg, it = f(state32)
        e = err((dxp, dxc, dxg), ref, name)
        print(f"    cg_it={int(it)}  ({time.time()-t0:.1f}s incl compile)",
              flush=True)


if __name__ == "__main__":
    main()
