"""TPU experiment 5: numeric audit of prepare_pallas + matvec at 100k scale.

The first chip run of prepare_pallas inside the LM loop regressed the f32
convergence floor 10x (8.4e-3 vs 7e-4) and the refinement contraction
(10 its vs 2).  Compare the fused assembly kernel and the v2 matvec
against the XLA engine path on the real bench problem.

Run: timeout 1800 python tools/exp_tpu5.py
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


def rel(a, b, name):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    scale = np.max(np.abs(b)) + 1e-30
    err = np.max(np.abs(a - b)) / scale
    print(f"{name:12s} relmax={err:.3e}  (scale {scale:.3e})", flush=True)
    return err


def main():
    dtype = jnp.float32
    problem, state, spec = B.build_problem(100_000, 500, 12, dtype)
    problem, state, _ = engine.pad_problem(problem, state)
    fmp = engine.fm_problem(problem)
    fmv = engine.to_view_major(fmp, kernels.choose_pb(fmp.num_points,
                                                      fmp.views))
    lam = jnp.asarray(1e-6, dtype)

    t0 = time.time()
    prep_x = jax.jit(lambda st: engine.prepare(fmv, st, spec, lam,
                                               couple_global=True))
    bx, rcx, rgx, Mx = prep_x(state)
    print("xla prepare:", round(time.time() - t0, 1), "s", flush=True)

    t0 = time.time()
    prep_p = jax.jit(lambda st: kernels.prepare_pallas(
        fmv, st, spec, lam, couple_global=True))
    bp, rcp, rgp, Mp, pp = prep_p(state)
    print("pallas prepare:", round(time.time() - t0, 1), "s", flush=True)

    rel(rcp, rcx, "rc")
    rel(rgp, rgx, "rg")
    rel(bp.bc, bx.bc, "bc")
    rel(bp.extra_c, bx.extra_c, "extra_c")
    rel(Mp.Minv_c, Mx.Minv_c, "Minv_c")
    if Mp.Scg is not None:
        rel(Mp.Scg, Mx.Scg, "Scg")
        rel(Mp.Sghat_inv, Mx.Sghat_inv, "Sghat_inv")
        rel(Mp.W, Mx.W, "W")

    # matvec parity on the same blocks (pallas pack vs XLA schur_matvec)
    rng = np.random.default_rng(0)
    xc = jnp.asarray(rng.normal(size=rcx.shape), dtype)
    xg = jnp.asarray(rng.normal(size=rgx.shape), dtype)

    mv_x = jax.jit(lambda c, g: engine.schur_matvec(fmv, bx, c, g))
    ocx, ogx = mv_x(xc, xg)

    def mv_p_f(packed, oi, hp, ec, eg, c, g):
        pp_ = pp._replace(packed=packed, obs_img=oi, hppinv=hp)
        return kernels.make_matvec(pp_, ec, eg)(c, g)
    mv_p = jax.jit(mv_p_f)
    ocp, ogp = mv_p(pp.packed, pp.obs_img, pp.hppinv, bp.extra_c,
                    bp.extra_g, xc, xg)
    rel(ocp, ocx, "matvec oc")
    rel(ogp, ogx, "matvec og")

    # CG convergence with each: residual after 8 and 40 iterations
    for name, (bb, rc_, rg_, M_, mv) in (
            ("xla", (bx, rcx, rgx, Mx, None)),
            ("pallas", (bp, rcp, rgp, Mp,
                        lambda c, g: mv_p(pp.packed, pp.obs_img, pp.hppinv,
                                          bp.extra_c, bp.extra_g, c, g)))):
        for it in (8, 40):
            if mv is None:
                def mv_(c, g, _b=bb):
                    return engine.schur_matvec(fmv, _b, c, g)
            else:
                mv_ = mv
            f = jax.jit(lambda rc__, rg__, _mv=mv_, _M=M_, _it=it: rcs.pcg(
                None, None, rc__, rg__, _M, tol=0.0, maxiter=_it,
                matvec=_mv))
            xc_, xg_, _ = f(rc_, rg_)
            # residual vs the XLA operator (trusted reference)
            oc_, og_ = mv_x(xc_, xg_)
            rnum = np.sqrt(float(jnp.sum((oc_ - rcx) ** 2)
                                 + jnp.sum((og_ - rgx) ** 2)))
            rden = np.sqrt(float(jnp.sum(rcx ** 2) + jnp.sum(rgx ** 2)))
            print(f"CG[{name:6s}] it={it:3d}  relres={rnum/rden:.3e}",
                  flush=True)


if __name__ == "__main__":
    main()
