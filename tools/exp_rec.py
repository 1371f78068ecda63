"""Round-5: dissect the dense-panel recovery (_pcd_dense_all) at 100k.

The exp_cov100k probe measured the new gather-free dense-panel recovery
at 0.82 s warm — same as the row-gather path it replaced, while theory
says ~0.2 s (28 chunks x one [u, 3u]x[3u, 3c] bf16 dot).  Time the body
in pieces as separate programs:

  rows    linearize + panel rows (shared cost floor)
  fill    rows + the per-view outer-product Dem fill (sum only)
  dot     rows + fill + the big Qem @ D matmul (sum only)
  full    the complete recovery

Usage: python tools/exp_rec.py [P M V]    (chip)
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
    import numpy as np

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

    S = jax.jit(assemble)(cb_vals, state)
    Qred = jax.jit(cov_direct.reduced_inverse)(S)
    jax.block_until_ready(Qred)
    u = Qred.shape[0]
    K = 6 * M
    G2 = u - K
    print(f"u={u} P={fmp.num_points}", flush=True)

    cd = max(64, int(1.1e7 / u))
    cd = cov_direct._choose_chunk(fmp.num_points, min(4096, cd))
    print(f"chunk={cd} nch={fmp.num_points // cd}", flush=True)

    def make(stage):
        def f(cbig, st, Q):
            fp = bigargs.merge(fmp, cb_names, cbig)
            bl = engine.linearize(fp, st, spec, jnp.asarray(0.0, dtype))
            bl = engine.materialize_global_rows(fp, bl)
            hinv_rows = jnp.stack(list(bl.Hpp_inv))
            _, brow2, w_rows = cov_direct.panel_rows(fp, bl)
            if stage == "rows":
                return (jnp.sum(brow2[0]) + jnp.sum(hinv_rows[0])
                        + jnp.sum(w_rows[0]))
            out = cov_direct._pcd_dense_all(
                fp, brow2, w_rows, hinv_rows, Q, G2, cd, stage=stage)
            return jnp.sum(out[:, :1])
        return jax.jit(f)

    def timed(name, fn):
        t0 = time.time()
        o = fn(cb_vals, state, Qred)
        jax.block_until_ready(o)
        t_first = time.time() - t0
        t0 = time.time()
        for k in range(3):
            o = fn(cb_vals, state._replace(
                points=state.points + 1e-12 * k), Qred)
            jax.block_until_ready(o)
        dt = (time.time() - t0) / 3
        print(f"{name:6s}: first {t_first:6.1f}s  warm {dt:6.3f}s",
              flush=True)

    for stage in ("rows", "fill", "dot", "full"):
        timed(stage, make(stage))


if __name__ == "__main__":
    main()
