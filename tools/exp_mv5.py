"""Round-5 matvec profiling: where did the lean-prefix kernel lose HBM SoL?

r03's fat layout sustained 713 GB/s (87% of 819); the lean-prefix rewrite
cut bytes/it 45% but achieved bandwidth fell to 231-277 GB/s — the kernel
is bound by something other than HBM (VERDICT r4 weak 2).  Variants:

  base       current kernel (passes=3), default pb / H
  p2         passes=2 one-hot products (one third less MXU work)
  bsteps=k   k NB-lane sub-blocks per grid step (grid overhead / k)
  W1         single-level one-hot (H = m_pad, no lo-mask work)
  floor      pure-bandwidth kernel: read the lean rows, one row-sum out
             (the HBM speed-of-light floor for this access pattern)

Usage: python tools/exp_mv5.py [P M V]    (runs on the chip)
"""

from __future__ import annotations

import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sys.path.insert(0, "/root/repo")
    import bench as B
    from bundle_adjustment_tpu.parallel import bigargs, engine, kernels
    from tools import tputime

    dtype = jnp.float32
    problem, state, spec = B.build_problem(P, M, V, dtype, pad128=True)
    fmp = engine.fm_problem(problem)
    pb_env = os.environ.get("EXP_MV_PB")
    pb = int(pb_env) if pb_env else kernels.choose_pb(
        fmp.num_points, fmp.views)
    fmv = engine.to_view_major(fmp, pb)
    G = 3 + spec.num_coefficients
    N = int(fmv.obs_x.shape[0])
    _, fbytes = B.matvec_cost(N, G, V)
    print(f"P={fmv.num_points} pb={pb} N={N} lean bytes/mv "
          f"{fbytes/1e6:.0f} MB", file=sys.stderr, flush=True)

    big_names, big_vals = bigargs.split_big(fmv)

    def mk_packed(big_, st):
        fv = bigargs.merge(fmv, big_names, big_)
        b = engine.linearize(fv, st, spec, jnp.asarray(1e-6, dtype))
        pp = kernels.pack_fm(b, fv, lean_only=True)
        # extra_c is produced by finish_reduction, not linearize; the
        # diagonal-extra term is a negligible [M, 6] op — zeros suffice
        # for kernel timing
        return (pp.packed, pp.obs_img, pp.hppinv,
                jnp.zeros((fmv.num_images, 6), dtype), b.extra_g)

    t0 = time.time()
    packed, obs_img, hppinv, ec, eg = jax.jit(mk_packed)(big_vals, state)
    jax.block_until_ready(packed)
    print(f"pack: {time.time() - t0:.1f}s packed {packed.nbytes/1e6:.0f} MB",
          file=sys.stderr, flush=True)
    # static fields mirror pack_fm(lean_only=True)
    m_pad = max(128, -(-M // 128) * 128)
    F_lean = 21 + 2 * G
    pp = kernels.PackedFM(
        packed=packed, obs_img=obs_img, hppinv=hppinv,
        num_points=fmv.num_points, views=V, num_images=M, m_pad=m_pad,
        g=G, f_pad=((F_lean + 7) // 8) * 8, pb=pb,
        h=kernels.choose_h(m_pad, row_cost=2.0))

    rng = np.random.default_rng(0)
    xc0 = jnp.asarray(rng.normal(0, 1, (M, 6)), dtype)
    xg0 = jnp.asarray(rng.normal(0, 1, (G,)), dtype)

    KCH = 8

    def chain(mv):
        def f(xc, xg):
            c, g = xc, xg
            for _ in range(KCH):
                oc, og = mv(c, g)
                sc = 1.0 / (jnp.sqrt(jnp.sum(oc * oc) + jnp.sum(og * og))
                            + 1e-30)
                c, g = oc * sc, og * sc
            return c, g
        return jax.jit(f)

    only = os.environ.get("EXP_MV_ONLY", "")
    only = set(only.split(",")) if only else None

    def timed(name, mv_fn, bytes_eff=fbytes):
        if only is not None and name not in only:
            return
        try:
            f = chain(mv_fn)
            out = [f(xc0, xg0)]

            def call(k):
                out[0] = f(*out[0])
                return out[0]

            dt = tputime.timeit_slope(call, r1=3, r2=12) / KCH
            print(f"{name:22s}: {dt*1e6:8.1f} us/mv  "
                  f"{bytes_eff/dt/1e9:7.1f} GB/s "
                  f"({bytes_eff/dt/1e9/819:.0%} SoL)", flush=True)
        except Exception as exc:
            print(f"{name:22s}: FAILED {str(exc)[:160]}", flush=True)

    # base + passes variants
    for name, kw in (
        ("base_p3", dict(passes=3)),
        ("p2", dict(passes=2)),
    ):
        timed(name, lambda xc, xg, kw=kw: kernels.make_matvec(
            pp, ec, eg, **kw)(xc, xg))

    # bsteps variants (any divisor of the block count <= 8)
    for bs in (2, 3, 4, 6, 8):
        if (fmv.num_points // pb) % bs:
            continue
        timed(f"bsteps{bs}_p3", lambda xc, xg, bs=bs: kernels.make_matvec(
            pp, ec, eg, bsteps=bs)(xc, xg))
        timed(f"bsteps{bs}_p2", lambda xc, xg, bs=bs: kernels.make_matvec(
            pp, ec, eg, bsteps=bs, passes=2)(xc, xg))

    # single-level one-hot (W = 1): repack with h = m_pad
    m_pad = pp.m_pad
    pp_w1 = pp._replace(h=m_pad)
    onehot_mb = m_pad * pb * V * 2 / 1e6
    if onehot_mb < 8:
        timed("W1", lambda xc, xg: kernels.make_matvec(
            pp_w1, ec, eg)(xc, xg))
        timed("W1_p2", lambda xc, xg: kernels.make_matvec(
            pp_w1, ec, eg, passes=2)(xc, xg))

    # pure-bandwidth floor (kernels.make_read_floor, chained so the relay
    # cannot elide identical executions)
    for bs in (1, 4):
        grid_n = fmv.num_points // pb
        if grid_n % bs:
            continue
        fl = kernels.make_read_floor(pp, bsteps=bs)

        def floor_mv(xc, xg, fl=fl):
            o = fl(xc[:8, :6] @ jnp.ones((6, 128), jnp.float32))
            oc = xc + o[0, 0] * 1e-30
            return oc, xg + o[0, 1] * 1e-30

        timed(f"floor_bs{bs}", floor_mv)


if __name__ == "__main__":
    main()
