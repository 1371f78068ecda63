"""Config-5 covariance post-mortem tool (round-5, VERDICT item 1).

The 1M-point covariance phase has died twice on the chip: r03
RESOURCE_EXHAUSTED, r04 `remote_compile HTTP 500: tpu_compile_helper
subprocess exit code 1` right after the refine compile — i.e. in the FIRST
staged-covariance compile (bench full=False skips the matvec phase).  Two
candidate causes:

  (a) serialized-program size through the relay: the staged programs embed
      the int index arrays as constants (bigargs float_only rationale) —
      obs_image alone is 48 MB at N = 12M, and the relay rejects past
      ~400 MB (parallel/bigargs.py:1-13);
  (b) the XLA TPU compiler itself dying on a pathological op (the
      [c, V, V, 6, 6] broadcasted scatter-add of
      cov_direct.assemble_reduced_corrections at K = 30k is the novelty vs
      the 100k configuration).

Modes (run on CPU unless --run):
  --lower [P M V]   trace + lower each staged program and report the
                    serialized HLO proto size (the relay-request proxy)
                    and the embedded-constant volume.
  --run   [P M V]   compile + execute each stage separately with timings
                    (use on the chip; pinpoints the dying stage).
"""

from __future__ import annotations

import os
import sys
import time


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    mode_run = "--run" in sys.argv
    P = int(float(argv[0])) if argv else 1_000_000
    M = int(argv[1]) if len(argv) > 1 else 5_000
    V = int(argv[2]) if len(argv) > 2 else 12

    import jax

    if not mode_run:
        jax.config.update("jax_platforms", "cpu")
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
    t0 = time.time()
    problem, state, spec = B.build_problem(P, M, V, dtype, pad128=True)
    fmp = engine.fm_problem(problem)
    print(f"build: {time.time() - t0:.1f}s  P={fmp.num_points} M={M} "
          f"N={int(fmp.obs_x.shape[0])}", file=sys.stderr, flush=True)

    cb_names, cb_vals = bigargs.split_big(fmp, float_only=True)
    print(f"arg fields: {cb_names}", file=sys.stderr)

    def stage_S0(cbig, st):
        fp = bigargs.merge(fmp, cb_names, cbig)
        bl = engine.linearize(fp, st, spec, jnp.asarray(0.0, dtype))
        return cov_direct.assemble_reduced_base(fp, bl)

    def stage_Sc(cbig, st):
        fp = bigargs.merge(fmp, cb_names, cbig)
        bl = engine.linearize(fp, st, spec, jnp.asarray(0.0, dtype))
        return cov_direct.assemble_reduced_corrections(fp, bl)

    def stage_Q(cbig, st, Qred):
        fp = bigargs.merge(fmp, cb_names, cbig)
        bl = engine.linearize(fp, st, spec, jnp.asarray(0.0, dtype))
        return cov_direct.point_covariance_dense(fp, bl, Qred)

    G = 3 + spec.num_coefficients
    u = 6 * M + G
    Qshape = jax.ShapeDtypeStruct((u, u), dtype)

    stages = [
        ("stage_Sc", jax.jit(stage_Sc), (cb_vals, state)),
        ("stage_S0", jax.jit(stage_S0), (cb_vals, state)),
        ("apply", jax.jit(cov_direct.apply_corrections,
                          donate_argnums=(0, 1)), None),
        ("inverse", jax.jit(cov_direct.reduced_inverse, donate_argnums=0),
         None),
        ("stage_Q", jax.jit(stage_Q, donate_argnums=2),
         (cb_vals, state, Qshape)),
    ]

    if not mode_run:
        for name, fn, args in stages:
            if args is None:
                continue
            t0 = time.time()
            low = fn.lower(*args)
            proto = low.compiler_ir("hlo").as_serialized_hlo_module_proto()
            txt_head = low.as_text()[:0]  # skip text dump (huge)
            print(f"{name}: lowered in {time.time() - t0:.1f}s, "
                  f"HLO proto = {len(proto) / 1e6:.1f} MB", flush=True)
        return

    # --run: drive the bench covariance phase verbatim (stage-by-stage
    # instrumentation + the same dispatch structure the driver runs)
    import numpy as np

    out = {}
    N_obs = int(fmp.obs_x.shape[0])
    res = B._cov_phase(out, {}, fmp, state, spec, dtype, M, G, N_obs,
                       emit=lambda partial: print(
                           "EMIT", {k: v for k, v in partial.items()
                                    if k.startswith("cov")}, flush=True))
    print("RESULT", res, flush=True)


if __name__ == "__main__":
    main()
