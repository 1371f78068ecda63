"""Round-5: which corrections formulation survives at 1M / 5000 images?

exp_cov5 --run pinpointed the config-5 death: stage_Sc (sparse pair-block
corrections, cov_direct.assemble_reduced_corrections) faults the TPU at
the 1M configuration — the [c, V, V, 6, 6] broadcasted scatter-add into
the [30k, 30k] accumulator, dispatched as ONE 601-chunk fori_loop, is the
novelty.  This experiment times ONE chunk per dispatch (watchdog-safe) for
scatter variants, so the fix can be chosen on data:

  A  current 5-D broadcasted .at[I, J].add
  B  flattened 1-D .at[flat].add into the K*K-flattened accumulator

Usage: python tools/exp_corr1m.py [P M V [chunk]]   (runs on the chip)
"""

from __future__ import annotations

import os
import sys
import time


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    P = int(float(argv[0])) if argv else 1_000_000
    M = int(argv[1]) if len(argv) > 1 else 5_000
    V = int(argv[2]) if len(argv) > 2 else 12
    chunk = int(argv[3]) if len(argv) > 3 else None

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
    from tools import tputime

    dtype = jnp.float32
    t0 = time.time()
    problem, state, spec = B.build_problem(P, M, V, dtype, pad128=True)
    fmp = engine.fm_problem(problem)
    P_ = fmp.num_points
    G2 = 3 + spec.num_coefficients
    K = 6 * M
    print(f"build: {time.time() - t0:.1f}s  P={P_} K={K}", file=sys.stderr,
          flush=True)

    cb_names, cb_vals = bigargs.split_big(fmp, float_only=True)

    # one program producing the compact correction operands (row forms)
    def make_rows(cbig, st):
        fp = bigargs.merge(fmp, cb_names, cbig)
        b = engine.linearize(fp, st, spec, jnp.asarray(0.0, dtype))
        hpc2 = cov_direct._hpc_rows2d(b)
        hpg_rows = cov_direct._hpg_rows2d(fp, b)
        W_rows = cov_direct._w_rows2d(b, hpg_rows, G2)
        hinv_rows = jnp.stack(list(b.Hpp_inv))
        return hpc2, W_rows, hinv_rows

    t0 = time.time()
    hpc2, W_rows, hinv_rows = jax.jit(make_rows)(cb_vals, state)
    jax.block_until_ready(hpc2)
    print(f"rows program: {time.time() - t0:.1f}s "
          f"(hpc2 {hpc2.nbytes/1e9:.2f} GB)", file=sys.stderr, flush=True)
    img = jnp.asarray(fmp.obs_image).astype(jnp.int32)

    if chunk is None:
        target = max(64, int(3.0e8 / (V * V * 144)))
        chunk = cov_direct._choose_chunk(P_, min(4096, target))
    nchunks = P_ // chunk
    cV = chunk * V
    print(f"chunk={chunk} nchunks={nchunks}", file=sys.stderr, flush=True)

    import numpy as np

    i6 = jnp.arange(6)

    def chunk_operands(i):
        o0 = i * cV
        hpc_v = jax.lax.dynamic_slice(
            hpc2, (0, o0), (18, cV)).T.reshape(chunk, V, 3, 6)
        im = jax.lax.dynamic_slice(img, (o0,), (cV,)).reshape(chunk, V)
        h = jax.lax.dynamic_slice(
            hinv_rows, tuple(jnp.asarray(x, jnp.int32)
                             for x in (0, i * chunk)), (6, chunk))
        hin = jnp.stack([
            jnp.stack([h[0], h[1], h[2]], axis=1),
            jnp.stack([h[1], h[3], h[4]], axis=1),
            jnp.stack([h[2], h[4], h[5]], axis=1),
        ], axis=1)
        Bv = jnp.einsum("cab,cvbe->cvae", hin, hpc_v,
                        precision=jax.lax.Precision.HIGHEST)
        pair = jnp.einsum("cvae,cwaf->cvwef", hpc_v, Bv,
                          precision=jax.lax.Precision.HIGHEST)
        return pair, im

    def variant_a(Acc, i):
        pair, im = chunk_operands(i)
        I = (6 * im)[:, :, None, None, None] + i6[None, None, None, :, None]
        J = (6 * im)[:, None, :, None, None] + i6[None, None, None, None, :]
        return Acc.at[jnp.broadcast_to(I, pair.shape),
                      jnp.broadcast_to(J, pair.shape)].add(pair)

    def variant_b(Accf, i):
        pair, im = chunk_operands(i)
        I = (6 * im)[:, :, None, None, None] + i6[None, None, None, :, None]
        J = (6 * im)[:, None, :, None, None] + i6[None, None, None, None, :]
        flat = (jnp.broadcast_to(I, pair.shape).astype(jnp.int32)
                * jnp.int32(K)
                + jnp.broadcast_to(J, pair.shape).astype(jnp.int32))
        return Accf.at[flat.reshape(-1)].add(pair.reshape(-1))

    variants = [("A_broadcast2d", variant_a, (K, K)),
                ("B_flat1d", variant_b, (K * K,))]
    if "--only-b" in sys.argv:
        variants = variants[1:]
    for name, fn, shape in variants:
        try:
            jf = jax.jit(fn, donate_argnums=0)
            Acc = jnp.zeros(shape, dtype)
            t0 = time.time()
            Acc = jf(Acc, 0)
            jax.block_until_ready(Acc)
            t_first = time.time() - t0
            calls = {"i": 0}

            def call(k, jf=jf):
                nonlocal Acc
                calls["i"] = (calls["i"] + 1) % nchunks
                Acc = jf(Acc, calls["i"])
                return Acc

            dt = tputime.timeit_slope(call, r1=3, r2=12)
            print(f"{name}: first {t_first:.1f}s, per-chunk "
                  f"{dt*1e3:.1f} ms -> total {dt*nchunks:.1f}s "
                  f"({cV*V*36/dt/1e6:.0f}M el/s)", flush=True)
            del Acc
        except Exception as exc:
            print(f"{name}: FAILED {str(exc)[:200]}", flush=True)


if __name__ == "__main__":
    main()
