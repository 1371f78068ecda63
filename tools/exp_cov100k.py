"""Round-5: where does the 100k fused covariance spend 10.6 s?

r03 measured 0.235 s (426k blocks/s); r04 1.495 s; r05 bench (panel
corrections restored, scatter fill, one-shot inverse) measures 10.6 s.
Time the three phases as separate programs: linearise+assemble S,
inverse, recovery.

Usage: python tools/exp_cov100k.py [P M V]   (chip)
"""

from __future__ import annotations

import os
import sys
import time


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    P = int(float(argv[0])) if argv else 100_000
    M = int(argv[1]) if len(argv) > 1 else 500
    V = int(argv[2]) if len(argv) > 2 else 12

    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     "/root/repo/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    import bench as B
    from bundle_adjustment_tpu.parallel import bigargs, cov_direct, engine

    dtype = jnp.float32
    problem, state, spec = B.build_problem(P, M, V, dtype, pad128=True)
    fmp = engine.fm_problem(problem)
    G = 3 + spec.num_coefficients
    cb_names, cb_vals = bigargs.split_big(fmp, float_only=True)

    def assemble(cbig, st):
        fp = bigargs.merge(fmp, cb_names, cbig)
        bl = engine.linearize(fp, st, spec, jnp.asarray(0.0, dtype))
        return cov_direct.assemble_reduced_dense(fp, bl)

    def recover(cbig, st, Qred):
        fp = bigargs.merge(fmp, cb_names, cbig)
        bl = engine.linearize(fp, st, spec, jnp.asarray(0.0, dtype))
        return cov_direct.point_covariance_dense(fp, bl, Qred)

    jas = jax.jit(assemble)
    jin = jax.jit(cov_direct.reduced_inverse)
    jre = jax.jit(recover)

    def timed(name, fn, *args):
        t0 = time.time()
        o = fn(*args)
        jax.block_until_ready(o)
        t_first = time.time() - t0
        # chained warm reps (arg-varied via the state perturbation)
        t0 = time.time()
        for k in range(3):
            o = fn(*args)
            jax.block_until_ready(o)
        dt = (time.time() - t0) / 3
        print(f"{name:10s}: first {t_first:6.1f}s  warm {dt:6.3f}s",
              flush=True)
        return o

    S = timed("assemble", jas, cb_vals, state)
    Qred = timed("inverse", jin, S)
    Q = timed("recover", jre, cb_vals, state, Qred)
    print("total warm ~ sum above;", Q.shape, flush=True)


if __name__ == "__main__":
    main()
