"""TPU experiment 2: redesigned matvec kernel (two-level one-hot +
view-major point blocks).

Findings from exp_tpu1 (v5e, P=100k/M=500/V=12/G=10; SoL = 446 us):
    base kernel            3157 us   (115 GB/s, 14% SoL)
      - scatter matmul      -764 us
      - Sel/SelT matmuls    -327 us
      - gather matmul       -166 us
      - unexplained        ~1450 us  -> one-hot GENERATION (3 VPU passes
                                        over [m_pad, nb] per block)
    XLA gathers/permutes: 4-13 ms (unusable)

Redesign:
  * factor img = hi * W + lo with H * W = m_pad, H <= 128: the one-hot
    becomes onehot_hi [H, nb] (generation cost /W, VMEM bounded for any M)
    and a W-row lane mask; gather/scatter matmuls contract H instead of
    m_pad with an 8W-row operand (MXU-efficient).
  * view-major lane order inside each point block (lane = v*pb + p):
    the point reduce/broadcast become V static 128-aligned lane slices —
    no Sel/SelT matmuls at all.

Run: timeout 1800 python tools/exp_tpu2.py
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
    return dt, out


def view_major_perm(P, V, pb):
    """Permutation old->new: new packed column order is (block, v, p_local);
    perm[j] = old point-major index for new lane j."""
    nblocks = P // pb
    i = np.arange(nblocks)[:, None, None]
    v = np.arange(V)[None, :, None]
    p = np.arange(pb)[None, None, :]
    return ((i * pb + p) * V + v).reshape(-1)


def make_matvec2(packed_vm, img_vm, hpp, extra_c, extra_g, *,
                 m_pad, pb, H, num_points=P, views=V, g=G, f_pad=F_PAD,
                 M_=M):
    """Two-level one-hot + view-major matvec. packed_vm/img_vm are in the
    view-major lane order (view_major_perm applied)."""
    W = m_pad // H
    nb = pb * views
    grid = (num_points // pb,)
    g_pad8 = ((g + 7) // 8) * 8
    g_lane = max(128, ((g + 127) // 128) * 128)
    w8 = 8 * W

    off = kernels._offsets(g)

    def kern(xcT_ref, xg_ref, packed_ref, img_ref, hpp_ref,
             outc_ref, outg_ref):
        f32 = jnp.float32
        pk = packed_ref[:]          # [F_pad, NB] (view-major lanes)
        img = img_ref[:]            # [1, NB] int32
        w32 = jnp.int32(W)
        img_hi = jax.lax.div(img, w32)           # [1, NB]
        img_lo = img - img_hi * w32

        iota_h = jax.lax.broadcasted_iota(jnp.int32, (H, nb), 0)
        onehot_hi = (iota_h == img_hi).astype(f32)      # [H, NB]
        lo_mask = [(img_lo == w).astype(f32) for w in range(W)]  # W x [1,NB]

        # ---- gather: xcr[a, n] = xc[img[n], a] --------------------------
        xcT = xcT_ref[:]                                # [8W, H]
        T1 = jnp.dot(xcT, onehot_hi, preferred_element_type=f32)  # [8W, NB]
        xcr = sum(T1[w * 8:w * 8 + 8] * lo_mask[w] for w in range(W))

        xg = xg_ref[:]                                  # [8, g_lane]
        jc, pjc = off["Jc"], off["PJc"]
        jg, pjg = off["Jg"], off["PJg"]
        t0 = jnp.sum(pk[pjc:pjc + 6] * xcr[:6], axis=0, keepdims=True)
        t1 = jnp.sum(pk[pjc + 6:pjc + 12] * xcr[:6], axis=0, keepdims=True)
        xg_row = xg[0:1, :g]
        t0 = t0 + jnp.dot(xg_row, pk[pjg:pjg + g], preferred_element_type=f32)
        t1 = t1 + jnp.dot(xg_row, pk[pjg + g:pjg + 2 * g],
                          preferred_element_type=f32)

        # ---- point reduce via static lane slices (view-major) -----------
        jp, pjp = off["Jp"], off["PJp"]
        jt = pk[jp:jp + 3] * t0 + pk[jp + 3:jp + 6] * t1       # [3, NB]
        y = jt[:, 0:pb]
        for v in range(1, views):
            y = y + jt[:, v * pb:(v + 1) * pb]                  # [3, PB]

        h = hpp_ref[:]                                          # [8, PB]
        z0 = h[0:1] * y[0:1] + h[1:2] * y[1:2] + h[2:3] * y[2:3]
        z1 = h[1:2] * y[0:1] + h[3:4] * y[1:2] + h[4:5] * y[2:3]
        z2 = h[2:3] * y[0:1] + h[4:5] * y[1:2] + h[5:6] * y[2:3]
        z = jnp.concatenate([z0, z1, z2], axis=0)               # [3, PB]
        zo = jnp.concatenate([z] * views, axis=1)               # [3, NB]

        u0 = jnp.sum(pk[pjp:pjp + 3] * zo, axis=0, keepdims=True)
        u1 = jnp.sum(pk[pjp + 3:pjp + 6] * zo, axis=0, keepdims=True)
        tv0 = t0 - u0
        tv1 = t1 - u1

        # ---- scatter: per-image sums via the factored one-hot ------------
        qc = pk[jc:jc + 6] * tv0 + pk[jc + 6:jc + 12] * tv1     # [6, NB]
        qc8 = jnp.concatenate([qc, jnp.zeros((2, nb), f32)], axis=0)
        B = jnp.concatenate([qc8 * lo_mask[w] for w in range(W)], axis=0)
        # [8W, H] = B [8W, NB] (x) onehot_hi [H, NB] contracting NB
        contrib_c = jax.lax.dot_general(
            B, onehot_hi, (((1,), (1,)), ((), ())),
            preferred_element_type=f32)

        qg = pk[jg:jg + g] * tv0 + pk[jg + g:jg + 2 * g] * tv1  # [G, NB]
        qg = jnp.concatenate(
            [qg, jnp.zeros((g_pad8 - g, nb), f32)], axis=0)
        contrib_g = jnp.dot(qg, jnp.ones((nb, 8), f32),
                            preferred_element_type=f32)

        @pl.when(pl.program_id(0) == 0)
        def _():
            outc_ref[:] = jnp.zeros_like(outc_ref)
            outg_ref[:] = jnp.zeros_like(outg_ref)

        outc_ref[:] += contrib_c
        outg_ref[:] += contrib_g

    call = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((w8, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, g_lane), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_pad, nb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, pb), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((w8, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g_pad8, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((w8, H), jnp.float32),
            jax.ShapeDtypeStruct((g_pad8, 8), jnp.float32),
        ],
    )

    def matvec(xc, xg):
        xc_pad = jnp.zeros((m_pad, 8), jnp.float32).at[:M_, :6].set(xc)
        xcT = xc_pad.reshape(H, W, 8).transpose(1, 2, 0).reshape(w8, H)
        xg_pad = jnp.zeros((8, g_lane), jnp.float32).at[0, :g].set(xg)
        oc, og = call(xcT, xg_pad, packed_vm, img_vm, hpp)
        oc = oc.reshape(W, 8, H).transpose(2, 0, 1).reshape(m_pad, 8)
        return oc[:M_, :6] + extra_c * xc, og[:g, 0] + extra_g * xg

    return matvec


def make_floor(packed, img, hpp, extra_c, extra_g, *, pb):
    """Payload floor: reads everything, does the row math, but replaces
    gather/scatter/point-reduce with lane-local stand-ins."""
    nb = pb * V
    grid = (P // pb,)
    g_pad8 = 16
    off = kernels._offsets(G)

    def kern(packed_ref, img_ref, hpp_ref, outc_ref, outg_ref):
        f32 = jnp.float32
        pk = packed_ref[:]
        img = img_ref[:].astype(f32)  # touch it
        jc, pjc = off["Jc"], off["PJc"]
        jg, pjg = off["Jg"], off["PJg"]
        jp, pjp = off["Jp"], off["PJp"]
        xcr = pk[:8] + img
        t0 = jnp.sum(pk[pjc:pjc + 6] * xcr[:6], axis=0, keepdims=True)
        t1 = jnp.sum(pk[pjc + 6:pjc + 12] * xcr[:6], axis=0, keepdims=True)
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
        qc = pk[jc:jc + 6] * tv0 + pk[jc + 6:jc + 12] * tv1
        qg = pk[jg:jg + G] * tv0 + pk[jg + G:jg + 2 * G] * tv1
        qg = jnp.concatenate([qg, jnp.zeros((g_pad8 - G, nb), f32)], axis=0)
        contrib_g = jnp.dot(qg, jnp.ones((nb, 8), f32),
                            preferred_element_type=f32)
        contrib_c = jnp.zeros((512, 8), f32) + jnp.sum(qc)

        @pl.when(pl.program_id(0) == 0)
        def _():
            outc_ref[:] = jnp.zeros_like(outc_ref)
            outg_ref[:] = jnp.zeros_like(outg_ref)

        outc_ref[:] += contrib_c
        outg_ref[:] += contrib_g

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

    def mv(xc, xg):
        oc, og = call(packed, img, hpp)
        return oc[:M, :6] + extra_c * xc, og[:G, 0] + extra_g * xg

    return mv


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    packed_np = rng.normal(0, 1, (F_PAD, N)).astype(np.float32)
    img_np = rng.integers(0, M, N).astype(np.int32)
    packed = jnp.asarray(packed_np)
    obs_img = jnp.asarray(img_np.reshape(1, N))
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

    # reference output (v1 kernel)
    def mv1_f(pk, oi, hp_, c, g):
        pp_ = pp._replace(packed=pk, obs_img=oi, hppinv=hp_)
        return kernels.make_matvec(pp_, extra_c, extra_g, pb=128)(c, g)
    dt1, ref = timeit("v1 pb=128", jax.jit(mv1_f), packed, obs_img, hpp,
                      xc, xg)
    print(f"    -> {fbytes/dt1/1e9:.1f} GB/s", flush=True)

    # floor
    dtf, _ = timeit("floor pb=128", jax.jit(
        lambda pk, oi, hp_, c, g: make_floor(pk, oi, hp_, extra_c, extra_g,
                                             pb=128)(c, g)),
        packed, obs_img, hpp, xc, xg)
    print(f"    -> {fbytes/dtf/1e9:.1f} GB/s  <- FLOOR", flush=True)

    # v2 sweep
    for pb, H in ((128, 128), (128, 64), (256, 128), (256, 64), (512, 128)):
        perm = view_major_perm(P, V, pb)
        pvm = jnp.asarray(packed_np[:, perm])
        ivm = jnp.asarray(img_np[perm].reshape(1, N))

        def mv2_f(pk, oi, hp_, c, g, _pb=pb, _H=H):
            return make_matvec2(pk, oi, hp_, extra_c, extra_g,
                                m_pad=512, pb=_pb, H=_H)(c, g)
        dt2, out2 = timeit(f"v2 pb={pb} H={H}", jax.jit(mv2_f),
                           pvm, ivm, hpp, xc, xg)
        errc = float(jnp.max(jnp.abs(out2[0] - ref[0])) /
                     (jnp.max(jnp.abs(ref[0])) + 1e-30))
        errg = float(jnp.max(jnp.abs(out2[1] - ref[1])) /
                     (jnp.max(jnp.abs(ref[1])) + 1e-30))
        print(f"    -> {fbytes/dt2/1e9:.1f} GB/s   "
              f"rel err c={errc:.2e} g={errg:.2e}", flush=True)


if __name__ == "__main__":
    main()
