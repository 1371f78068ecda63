"""TPU experiment 1: matvec ablations + gather/permute microbenches + cache.

Run on the real chip:  timeout 1800 python tools/exp_tpu1.py
Everything is synthetic random data shaped like BASELINE config 4
(P=100k, M=500, V=12, G=10); we only care about timings.
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from bundle_adjustment_tpu.parallel import kernels

P, V, M, G = 100096, 12, 500, 10
N = P * V
F = 36 + 4 * G
F_PAD = ((F + 7) // 8) * 8


def timeit(name, fn, *args, reps=20):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{name}: {dt*1e6:9.1f} us  (first call {compile_s:.2f}s)",
          flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.normal(0, 1, (F_PAD, N)).astype(np.float32))
    obs_img = jnp.asarray(
        rng.integers(0, M, (1, N)).astype(np.int32))
    hpp = jnp.asarray(rng.normal(0, 1, (8, P)).astype(np.float32))
    pp = kernels.PackedFM(packed=packed, obs_img=obs_img, hppinv=hpp,
                          num_points=P, views=V, num_images=M,
                          m_pad=512, g=G, f_pad=F_PAD)
    extra_c = jnp.ones((M, 6), jnp.float32)
    extra_g = jnp.ones((G,), jnp.float32)
    xc = jnp.asarray(rng.normal(0, 1, (M, 6)).astype(np.float32))
    xg = jnp.asarray(rng.normal(0, 1, (G,)).astype(np.float32))

    fbytes = F * 4 * N
    print(f"payload bytes/matvec: {fbytes/1e6:.0f} MB; "
          f"SoL at 819 GB/s = {fbytes/819e9*1e6:.0f} us", flush=True)

    # --- A: current kernel, pb sweep ---------------------------------------
    # big arrays must be jit ARGUMENTS: the remote-compile relay rejects
    # programs whose serialized constants exceed its body-size limit
    for pb in (128, 256):
        def mv_f(packed, obs_img, hppinv, c, g, _pb=pb):
            pp_ = pp._replace(packed=packed, obs_img=obs_img, hppinv=hppinv)
            return kernels.make_matvec(pp_, extra_c, extra_g, pb=_pb)(c, g)
        mv = jax.jit(mv_f)
        dt = timeit(f"A pallas matvec pb={pb}", mv, packed, obs_img, hpp,
                    xc, xg)
        print(f"    -> {fbytes/dt/1e9:.1f} GB/s eff", flush=True)

    # --- B/C: ablation variants --------------------------------------------
    def make_variant(pb, mode):
        nb = pb * V
        m_pad = 512

        def kern(xcT_ref, xg_ref, packed_ref, img_ref, hpp_ref,
                 outc_ref, outg_ref):
            f32 = jnp.float32
            off = kernels._offsets(G)
            pk = packed_ref[:]
            img = img_ref[:]
            iota_m = jax.lax.broadcasted_iota(jnp.int32, (m_pad, nb), 0)
            if mode in ("bf16", "bf16all"):
                onehot = (iota_m == img).astype(jnp.bfloat16)
                xcT = xcT_ref[:].astype(jnp.bfloat16)
            else:
                onehot = (iota_m == img).astype(f32)
                xcT = xcT_ref[:]
            if mode == "nogather":
                xcr = pk[:8]
            else:
                xcr = jnp.dot(xcT, onehot, preferred_element_type=f32)
            xg_ = xg_ref[:]
            jc, pjc = off["Jc"], off["PJc"]
            jg, pjg = off["Jg"], off["PJg"]
            t0 = jnp.sum(pk[pjc:pjc + 6] * xcr[:6], axis=0, keepdims=True)
            t1 = jnp.sum(pk[pjc + 6:pjc + 12] * xcr[:6], axis=0,
                         keepdims=True)
            xg_row = xg_[0:1, :G]
            t0 = t0 + jnp.dot(xg_row, pk[pjg:pjg + G],
                              preferred_element_type=f32)
            t1 = t1 + jnp.dot(xg_row, pk[pjg + G:pjg + 2 * G],
                              preferred_element_type=f32)
            v32 = jnp.int32(V)
            jp, pjp = off["Jp"], off["PJp"]
            jt = pk[jp:jp + 3] * t0 + pk[jp + 3:jp + 6] * t1
            if mode == "nosel":
                # sublane-free stand-in: block sums via reshape on sublanes
                y = jt[:, :pb]
                zo3 = jnp.concatenate([y, y, y], axis=0)[:3]
                zo = jnp.concatenate([zo3] * V, axis=1)
            else:
                sel_r = jax.lax.div(jax.lax.broadcasted_iota(
                    jnp.int32, (nb, pb), 0), v32)
                sel_q = jax.lax.broadcasted_iota(jnp.int32, (nb, pb), 1)
                Sel = (sel_r == sel_q).astype(f32)
                selT_r = jax.lax.div(jax.lax.broadcasted_iota(
                    jnp.int32, (pb, nb), 1), v32)
                selT_q = jax.lax.broadcasted_iota(jnp.int32, (pb, nb), 0)
                SelT = (selT_r == selT_q).astype(f32)
                y = jnp.dot(jt, Sel, preferred_element_type=f32)
                h = hpp_ref[:]
                z0 = h[0:1] * y[0:1] + h[1:2] * y[1:2] + h[2:3] * y[2:3]
                z1 = h[1:2] * y[0:1] + h[3:4] * y[1:2] + h[4:5] * y[2:3]
                z2 = h[2:3] * y[0:1] + h[4:5] * y[1:2] + h[5:6] * y[2:3]
                z = jnp.concatenate([z0, z1, z2], axis=0)
                zo = jnp.dot(z, SelT, preferred_element_type=f32)
            u0 = jnp.sum(pk[pjp:pjp + 3] * zo, axis=0, keepdims=True)
            u1 = jnp.sum(pk[pjp + 3:pjp + 6] * zo, axis=0, keepdims=True)
            tv0 = t0 - u0
            tv1 = t1 - u1
            qc = pk[jc:jc + 6] * tv0 + pk[jc + 6:jc + 12] * tv1
            qc8 = jnp.concatenate([qc, jnp.zeros((2, nb), f32)], axis=0)
            if mode == "noscatter":
                contrib_c = jnp.zeros((m_pad, 8), f32) + jnp.sum(qc8)
            elif mode in ("bf16", "bf16all"):
                contrib_c = jax.lax.dot_general(
                    onehot, qc8.astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())), preferred_element_type=f32)
            else:
                contrib_c = jax.lax.dot_general(
                    onehot, qc8, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)
            qg = pk[jg:jg + G] * tv0 + pk[jg + G:jg + 2 * G] * tv1
            g_pad8 = outg_ref.shape[0]
            qg = jnp.concatenate([qg, jnp.zeros((g_pad8 - G, nb), f32)],
                                 axis=0)
            contrib_g = jnp.dot(qg, jnp.ones((nb, 8), f32),
                                preferred_element_type=f32)

            @pl.when(pl.program_id(0) == 0)
            def _():
                outc_ref[:] = jnp.zeros_like(outc_ref)
                outg_ref[:] = jnp.zeros_like(outg_ref)

            outc_ref[:] += contrib_c
            outg_ref[:] += contrib_g

        g_pad8 = 16
        g_lane = 128
        call = pl.pallas_call(
            kern,
            grid=(P // pb,),
            in_specs=[
                pl.BlockSpec((8, 512), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, g_lane), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((F_PAD, nb), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nb), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, pb), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((512, 8), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g_pad8, 8), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((512, 8), jnp.float32),
                jax.ShapeDtypeStruct((g_pad8, 8), jnp.float32),
            ],
        )

        def mv(pk, oi, hp_, xc, xg):
            xcT = jnp.zeros((8, 512), jnp.float32).at[:6, :M].set(xc.T)
            xg_pad = jnp.zeros((8, g_lane), jnp.float32).at[0, :G].set(xg)
            oc, og = call(xcT, xg_pad, pk, oi, hp_)
            return oc[:M, :6] + extra_c * xc, og[:G, 0] + extra_g * xg

        return jax.jit(mv)

    for mode in ("base", "bf16", "nogather", "noscatter", "nosel"):
        dt = timeit(f"B variant {mode:10s} pb=128", make_variant(128, mode),
                    packed, obs_img, hpp, xc, xg)
        print(f"    -> {fbytes/dt/1e9:.1f} GB/s eff", flush=True)

    # --- D: XLA gather / permute micro ------------------------------------
    idx = jnp.asarray(rng.integers(0, M, N).astype(np.int32))
    xcol = jnp.asarray(rng.normal(0, 1, (M,)).astype(np.float32))

    g1 = jax.jit(lambda t, i: t[i])
    timeit("D xla gather [N]<-[M] 1 row", g1, xcol, idx)

    xc6 = jnp.asarray(rng.normal(0, 1, (M, 6)).astype(np.float32))
    g2 = jax.jit(lambda t, i: t[i])
    timeit("D xla gather [N,6]<-[M,6]", g2, xc6, idx)

    perm = jnp.asarray(rng.permutation(N).astype(np.int32))
    row = jnp.asarray(rng.normal(0, 1, (N,)).astype(np.float32))
    g3 = jax.jit(lambda t, i: t[i])
    timeit("D xla permute [N]<-[N] 1 row", g3, row, perm)

    rows2 = jnp.asarray(rng.normal(0, 1, (2, N)).astype(np.float32))
    g4 = jax.jit(lambda t, i: t[:, i])
    timeit("D xla permute [2,N] rows", g4, rows2, perm)

    # sort-based permute: out[i] = v[perm[i]]  ==  sort v by inv_perm keys
    inv = jnp.asarray(np.argsort(np.asarray(perm)).astype(np.int32))

    def sort_perm(v, keys):
        _, out = jax.lax.sort_key_val(keys, v)
        return out

    g5 = jax.jit(sort_perm)
    timeit("D sort-permute [N] 1 row", g5, row, inv)

    def sort_perm2(v2, keys):
        out = jax.lax.sort((keys, v2[0], v2[1]), dimension=0, num_keys=1)
        return out[1], out[2]

    g6 = jax.jit(sort_perm2)
    timeit("D sort-permute 2 rows", g6, rows2, inv)

    # segment-sum of [6,6] blocks into M*M (for assemble timing reference)
    seg_ids = jnp.asarray(rng.integers(0, M * M, N).astype(np.int32))
    vals = jnp.asarray(rng.normal(0, 1, (N, 6, 6)).astype(np.float32))
    g7 = jax.jit(lambda v, s: jax.ops.segment_sum(v, s, num_segments=M * M))
    timeit("D segment_sum [N,6,6]->M^2", g7, vals, seg_ids, reps=3)


if __name__ == "__main__":
    main()
