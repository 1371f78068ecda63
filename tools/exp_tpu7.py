"""TPU experiment 7: where does the 131 ms LM step go?

Steady state at 100k (cg8, pallas): 7.6 it/s = 131 ms/step, of which the
8 CG matvecs are only ~7 ms.  Hypothesis: the XLA linearize is dominated
by its [N]<-[M] camera gathers (measured 4-12 ms EACH in exp_tpu1).
Times each piece of engine.lm_step(use_pallas=True) as its own program.

Run: timeout 1800 python tools/exp_tpu7.py
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
from tools.tputime import fetch
import bench as B
from bundle_adjustment_tpu.parallel import engine, kernels, rcs


def chain_time(name, f, x0, reps=10):
    """f(x) -> x' (same pytree structure); dependency-chained slope."""
    out = f(x0)
    fetch(out)

    def run(r):
        t0 = time.time()
        x = x0
        for _ in range(r):
            x = f(x)
        fetch(x)
        return time.time() - t0

    r1 = max(1, reps // 5)
    t1 = run(r1)
    t2 = run(reps)
    dt = (t2 - t1) / (reps - r1)
    if dt <= 0:
        dt = t2 / reps
    print(f"{name:28s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    dtype = jnp.float32
    problem, state, spec = B.build_problem(100_000, 500, 12, dtype,
                                           pad128=True)
    fmp = engine.fm_problem(problem)
    fmv = engine.to_view_major(fmp, kernels.choose_pb(fmp.num_points,
                                                      fmp.views))
    lam = jnp.asarray(1e-6, dtype)

    # state-to-state full LM step (the steady-state program)
    def full_step(st):
        dxp, dxc, dxg, b, it = engine.lm_step(
            fmv, st, spec, lam, cg_tol=0.0, cg_maxiter=8,
            couple_global=True, use_pallas=True, stall_limit=9)
        st2, _ = rcs.apply_step(st, problem, dxp, dxc, dxg)
        return st2

    chain_time("full lm_step (cg8)", jax.jit(full_step), state)

    # linearize only (rows materialised via a tiny consumer)
    def lin_only(st):
        b = engine.linearize(fmv, st, spec, lam)
        # consume every row so nothing is DCE'd; tiny outputs
        acc = sum(jnp.sum(r) for r in b.Jp + b.PJp + b.Jc + b.PJc
                  + b.Jg + b.PJg + b.Pw + b.w)
        return st._replace(io=st.io + 1e-30 * acc)

    chain_time("linearize only", jax.jit(lin_only), state)

    # linearize + pack (what prepare_pallas does before the kernel)
    def lin_pack(st):
        b = engine.linearize(fmv, st, spec, lam)
        pp = kernels.pack_fm(b, fmv, with_pw=True)
        return st._replace(io=st.io + 1e-30 * jnp.sum(pp.packed[0]))

    chain_time("linearize + pack", jax.jit(lin_pack), state)

    # linearize + pack + fused assembly kernel
    def lin_prep(st):
        b, rc, rg, Minv, pp = kernels.prepare_pallas(
            fmv, st, spec, lam, couple_global=True)
        return st._replace(io=st.io + 1e-30 * jnp.sum(rc))

    chain_time("prepare_pallas (lin+pack+k)", jax.jit(lin_prep), state)

    # gathers alone: the 12 [N]<-[M] rows linearize builds
    def gathers(st):
        eo = st.eo
        rows = [eo[:, a][fmv.obs_image] for a in range(6)]
        rows += [fmv.free_eo[:, a][fmv.obs_image] for a in range(6)]
        acc = sum(jnp.sum(r) for r in rows)
        return st._replace(io=st.io + 1e-30 * acc)

    chain_time("12 xla cam gathers", jax.jit(gathers), state)

if __name__ == "__main__":
    main()
