"""Chip experiment: matvec kernel GB/s with passes=3 (exact) vs passes=2."""
import sys, time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)
    sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tools")
    import bench as B
    import tputime
    from bundle_adjustment_tpu.parallel import bigargs, engine, kernels

    P, M, V = 100_000, 500, 12
    dtype = jnp.float32
    problem, state, spec = B.build_problem(P, M, V, dtype, pad128=True)
    fmp = engine.fm_problem(problem)
    fmv = engine.to_view_major(fmp, kernels.choose_pb(fmp.num_points, fmp.views))
    N = int(fmv.obs_point.shape[0]); G = 3 + spec.num_coefficients
    _, fbytes = B.matvec_cost(N, G, V)

    prep_ = jax.jit(lambda st: engine.prepare(
        fmv, st, spec, jnp.asarray(1e-6, dtype), couple_global=True))
    b, rc, rg, Minv = prep_(state)
    b32 = jax.tree.map(lambda x: x, b)
    pp = kernels.pack_fm(b32, fmv)
    jax.block_until_ready(pp.packed)

    for passes in (3, 2):
        def mvf(packed, obs_img, hppinv, ec, eg, c, g):
            pp_ = pp._replace(packed=packed, obs_img=obs_img, hppinv=hppinv)
            oc, og = kernels.make_matvec(pp_, ec, eg, passes=passes)(c, g)
            # chain 8 in-program
            for _ in range(7):
                oc, og = kernels.make_matvec(pp_, ec, eg, passes=passes)(oc, og)
            return oc, og
        mv_ = jax.jit(mvf)
        args = [pp.packed, pp.obs_img, pp.hppinv, b.extra_c, b.extra_g, rc, rg]
        def call(k):
            return mv_(*args[:5], rc + 1e-9 * k, rg)
        dt = tputime.timeit_slope(call, r1=2, r2=8) / 8
        print(f"passes={passes}: {fbytes/dt/1e9:.1f} GB/s ({dt*1e3:.3f} ms)",
              flush=True)

if __name__ == "__main__":
    main()
