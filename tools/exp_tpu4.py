"""TPU experiment 4: redo exp2/exp3 with relay-proof slope timing
(tools/tputime.py): unique executions + forced fetch + two-rep-count slope.

Run: timeout 1800 python tools/exp_tpu4.py
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")
from tools.tputime import timeit_slope
from tools.exp_tpu2 import make_matvec2, view_major_perm
from bundle_adjustment_tpu.parallel import kernels

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P, V, M, G = 100096, 12, 500, 10
N = P * V
F = 36 + 4 * G
F_PAD = ((F + 7) // 8) * 8
M_PAD = 512


def make_stage(*, pb, stage, H=128):
    nb = pb * V
    grid = (P // pb,)
    W = M_PAD // H
    off = kernels._offsets(G)

    def kern(packed_ref, img_ref, hpp_ref, outc_ref, outg_ref):
        f32 = jnp.float32
        pk = packed_ref[:]
        jc, pjc = off["Jc"], off["PJc"]
        jg, pjg = off["Jg"], off["PJg"]
        jp, pjp = off["Jp"], off["PJp"]

        @pl.when(pl.program_id(0) == 0)
        def _():
            outc_ref[:] = jnp.zeros_like(outc_ref)
            outg_ref[:] = jnp.zeros_like(outg_ref)

        if stage == "dma":
            s = jnp.sum(pk, axis=0, keepdims=True)  # [1, NB]
            s = s + img_ref[:].astype(f32)
            outg_ref[:] += jnp.zeros_like(outg_ref) + jnp.sum(s) \
                + hpp_ref[0, 0]
            outc_ref[:] += jnp.zeros_like(outc_ref) + hpp_ref[0, 0]
            return

        onehot = None
        lo_mask = None
        if stage in ("onehot", "gather", "full"):
            img_i = img_ref[:]
            w32 = jnp.int32(W)
            img_hi = jax.lax.div(img_i, w32)
            img_lo = img_i - img_hi * w32
            iota_h = jax.lax.broadcasted_iota(jnp.int32, (H, nb), 0)
            onehot = (iota_h == img_hi).astype(f32)
            lo_mask = [(img_lo == w).astype(f32) for w in range(W)]

        if stage in ("gather", "full"):
            xcT = jnp.zeros((8 * W, H), f32) + hpp_ref[0, 0]
            T1 = jnp.dot(xcT, onehot, preferred_element_type=f32)
            xcr = sum(T1[w * 8:w * 8 + 8] * lo_mask[w] for w in range(W))
        else:
            xcr = pk[:8]

        t0 = jnp.sum(pk[pjc:pjc + 6] * xcr[:6], axis=0, keepdims=True)
        t1 = jnp.sum(pk[pjc + 6:pjc + 12] * xcr[:6], axis=0, keepdims=True)
        t0 = t0 + hpp_ref[0, 0] * 1e-30  # uniquifier dependency

        if stage in ("pointred", "onehot", "gather", "full"):
            jt = pk[jp:jp + 3] * t0 + pk[jp + 3:jp + 6] * t1
            y = jt[:, 0:pb]
            for v in range(1, V):
                y = y + jt[:, v * pb:(v + 1) * pb]
            h = hpp_ref[:]
            z0 = h[0:1] * y[0:1] + h[1:2] * y[1:2] + h[2:3] * y[2:3]
            z1 = h[1:2] * y[0:1] + h[3:4] * y[1:2] + h[4:5] * y[2:3]
            z2 = h[2:3] * y[0:1] + h[4:5] * y[1:2] + h[5:6] * y[2:3]
            z = jnp.concatenate([z0, z1, z2], axis=0)
            zo = jnp.concatenate([z] * V, axis=1)
            u0 = jnp.sum(pk[pjp:pjp + 3] * zo, axis=0, keepdims=True)
            u1 = jnp.sum(pk[pjp + 3:pjp + 6] * zo, axis=0, keepdims=True)
            tv0, tv1 = t0 - u0, t1 - u1
        else:
            tv0, tv1 = t0, t1

        qc = pk[jc:jc + 6] * tv0 + pk[jc + 6:jc + 12] * tv1
        qg = pk[jg:jg + G] * tv0 + pk[jg + G:jg + 2 * G] * tv1
        qg = jnp.concatenate([qg, jnp.zeros((16 - G, nb), f32)], axis=0)
        outg_ref[:] += jnp.dot(qg, jnp.ones((nb, 8), f32),
                               preferred_element_type=f32)

        if stage == "full":
            qc8 = jnp.concatenate([qc, jnp.zeros((2, nb), f32)], axis=0)
            B = jnp.concatenate([qc8 * lo_mask[w] for w in range(W)], axis=0)
            contrib_c = jax.lax.dot_general(
                B, onehot, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            outc_ref[:] += contrib_c
        else:
            outc_ref[:] += jnp.zeros_like(outc_ref) + jnp.sum(qc)

    w8 = 8 * W
    outc_shape = (w8, H) if stage == "full" else (M_PAD, 8)
    call = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((F_PAD, nb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, pb), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(outc_shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(outc_shape, jnp.float32),
            jax.ShapeDtypeStruct((16, 8), jnp.float32),
        ],
    )
    return call


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    packed_np = rng.normal(0, 1, (F_PAD, N)).astype(np.float32)
    img_np = rng.integers(0, M, N).astype(np.int32)
    packed = jnp.asarray(packed_np)
    obs_img = jnp.asarray(img_np.reshape(1, N))
    hpp0 = jnp.asarray(rng.normal(0, 1, (8, P)).astype(np.float32))
    extra_c = jnp.ones((M, 6), jnp.float32)
    extra_g = jnp.ones((G,), jnp.float32)
    xc0 = jnp.asarray(rng.normal(0, 1, (M, 6)).astype(np.float32))
    xg = jnp.asarray(rng.normal(0, 1, (G,)).astype(np.float32))
    fbytes = F * 4 * N
    print(f"payload {fbytes/1e6:.0f} MB; SoL = {fbytes/819e9*1e6:.0f} us",
          flush=True)

    # sanity: a pure XLA reduce should clock ~819 GB/s
    s = jax.jit(lambda x, i: jnp.sum(x) + i)
    dt = timeit_slope(lambda k: s(packed, float(k)), verbose_name="xla sum")
    print(f"    -> {fbytes/dt/1e9:.1f} GB/s", flush=True)

    # v1 kernel
    pp = kernels.PackedFM(packed=packed, obs_img=obs_img, hppinv=hpp0,
                          num_points=P, views=V, num_images=M,
                          m_pad=512, g=G, f_pad=F_PAD)

    def mv1_f(pk, oi, hp_, c, g):
        pp_ = pp._replace(packed=pk, obs_img=oi, hppinv=hp_)
        return kernels.make_matvec(pp_, extra_c, extra_g, pb=128)(c, g)
    mv1 = jax.jit(mv1_f)
    dt = timeit_slope(
        lambda k: mv1(packed, obs_img, hpp0, xc0 + k * 1e-30, xg),
        verbose_name="v1 pb=128")
    print(f"    -> {fbytes/dt/1e9:.1f} GB/s", flush=True)

    # v2 sweep
    for pb, H in ((128, 128), (256, 128), (256, 256), (256, 64)):
        perm = view_major_perm(P, V, pb)
        pvm = jnp.asarray(packed_np[:, perm])
        ivm = jnp.asarray(img_np[perm].reshape(1, N))

        def mv2_f(pk, oi, hp_, c, g, _pb=pb, _H=H):
            return make_matvec2(pk, oi, hp_, extra_c, extra_g,
                                m_pad=512, pb=_pb, H=_H)(c, g)
        mv2 = jax.jit(mv2_f)
        dt = timeit_slope(
            lambda k: mv2(pvm, ivm, hpp0, xc0 + k * 1e-30, xg),
            verbose_name=f"v2 pb={pb} H={H}")
        print(f"    -> {fbytes/dt/1e9:.1f} GB/s", flush=True)

    # stages at pb=256
    for stage in ("dma", "rowmath", "pointred", "onehot", "gather", "full"):
        call = make_stage(pb=256, stage=stage)
        fn = jax.jit(lambda pk, oi, hp_, _c=call: _c(pk, oi, hp_))
        dt = timeit_slope(
            lambda k: fn(packed, obs_img, hpp0 + k * 1e-30),
            verbose_name=f"stage pb=256 {stage:9s}")
        print(f"    -> {fbytes/dt/1e9:.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
