"""Experiment: 1M-point LM program with problem arrays as ARGUMENTS
(bigargs) instead of closure constants — does the relay accept the compile,
does XLA's buffer planning survive, what is the step rate?"""
import sys, time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    sys.path.insert(0, "/root/repo")
    import bench as B
    from bundle_adjustment_tpu.parallel import bigargs, engine, kernels, rcs

    P, M, V = (int(float(sys.argv[1])), int(sys.argv[2]), int(sys.argv[3])) \
        if len(sys.argv) > 3 else (1_000_000, 5000, 12)
    dtype = jnp.float32
    t0 = time.time()
    problem, state0, spec = B.build_problem(P, M, V, dtype, pad128=True)
    fmp = engine.fm_problem(problem)
    fmv = engine.to_view_major(fmp, kernels.choose_pb(fmp.num_points, fmp.views))
    print(f"build {time.time()-t0:.1f}s", file=sys.stderr)

    names, big = bigargs.split_big(fmv)
    print("arg fields:", names,
          "bytes:", sum(sum(getattr(l,'nbytes',0) for l in jax.tree.leaves(v)) for v in big),
          file=sys.stderr)

    def lm_fn(big_, st, lam, cg_tol, cg_maxiter, stall, alpha):
        fv = bigargs.merge(fmv, names, big_)
        dxp, dxc, dxg, b, it = engine.lm_step(
            fv, st, spec, lam, cg_tol=cg_tol, cg_maxiter=cg_maxiter,
            couple_global=True, use_pallas=True, stall_limit=stall)
        st2, mdx = rcs.apply_step(st, problem, alpha * dxp, alpha * dxc,
                                  alpha * dxg)
        return st2, mdx, it

    lm_ = jax.jit(lm_fn)
    t0 = time.time()
    r = lm_(big, state0, jnp.asarray(1e-2, dtype), jnp.asarray(1e-4, dtype),
            jnp.asarray(100, jnp.int32), jnp.asarray(8, jnp.int32),
            jnp.asarray(0.75, dtype))
    print("first step mdx:", float(r[1]), f"compile+run {time.time()-t0:.1f}s",
          file=sys.stderr)
    st = r[0]
    def fixed(st):
        st_, mdx, it = lm_(big, st, jnp.asarray(1e-6, dtype),
                           jnp.asarray(0.0, dtype), jnp.asarray(8, jnp.int32),
                           jnp.asarray(9, jnp.int32), jnp.asarray(1.0, dtype))
        return st_, mdx
    st, m = fixed(st); _ = float(np.asarray(m))
    t0 = time.time()
    for _ in range(2): st, m = fixed(st)
    _ = float(np.asarray(m)); t1 = time.time() - t0
    t0 = time.time()
    for _ in range(10): st, m = fixed(st)
    _ = float(np.asarray(m)); t2 = time.time() - t0
    dt = (t2 - t1) / 8
    print(f"fixed-cg8: {1.0/dt:.3f} it/s ({dt*1e3:.1f} ms/it)", file=sys.stderr)

if __name__ == "__main__":
    main()
