"""Fused Pallas TPU kernel for the implicit-Schur matvec.

The CG loop of the reduced camera system spends its time in
`rcs.schur_matvec`: a chain of small-minor-dimension einsums, gathers and
segment reductions that XLA executes at a few percent of the chip's vector
throughput (minor dims of 2/3/6 leave the 128-wide lanes mostly idle, and
per-image segment reductions scatter).  This kernel fuses the entire product

    S x = Hxx x - Hxp Hpp^{-1} Hpx x

into one pass over the observations with a point-major grid:

* observations are stored point-major with a uniform view count V, so the
  per-point reduction (y) and broadcast (z) stay inside the block — no
  scatter, no gather;
* the camera gather (xc per observation) and camera scatter (out_c
  accumulation) are one-hot matmuls on the MXU: the one-hot block
  [rows, M_pad] is built in VMEM from an iota comparison;
* all per-row Jacobian blocks are packed into one lane-aligned [rows, 128]
  matrix, read once.

Per grid step (PB points, rows = PB*V):
    onehot = (obs_img[r] == iota_m)                      [rows, M_pad]
    xcr    = onehot @ xc                                 [rows, 8]   (MXU)
    t_i    = sum_a PJc[r,i,a] xcr[r,a] + sum_g PJg[r,i,g] xg[g]
    y      = reshape-sum_v Jp^T t                        [PB, 3]
    z      = Hpp^{-1} y                                  [PB, 3]
    tv     = t - PJp z                                   [rows, 2]
    qc     = Jc^T tv                                     [rows, 8]
    out_c += onehot^T @ qc                               [M_pad, 8] (MXU)
    out_g += sum_r Jg^T tv                               [G_pad]

Limits: M (padded) must fit the one-hot width budget — M_pad <= 1024 covers
the 500-image benchmark config; larger image counts fall back to the XLA
path (or chunk the one-hot, future work).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# packed row layout offsets (lane-aligned slices)
# [ Jp(2x3)=6 | PJp(2x3)=6 | Jc(2x6)=12 | PJc(2x6)=12 | Jg(2xG) | PJg(2xG) ]
LANES = 128


class PackedProblem(NamedTuple):
    packed: jnp.ndarray  # [N, LANES] f32
    obs_img: jnp.ndarray  # [N, 1] int32 (point-major order)
    hppinv: jnp.ndarray  # [P, 16] f32 (3x3 row-packed, rest zero)
    num_points: int
    views: int  # uniform views per point
    num_images: int
    m_pad: int
    g: int  # number of global parameters


def pack_blocks(b, problem, views: int) -> PackedProblem:
    """Pack the per-observation Jacobian blocks of `rcs.Blocks` into the
    kernel layout (host/device one-time cost per linearisation)."""
    N = b.Jp.shape[0]
    G = b.Jg.shape[2]
    cols = 36 + 4 * G
    if cols > LANES:
        raise ValueError(f"packed row needs {cols} > {LANES} lanes")
    parts = [
        b.Jp.reshape(N, 6), b.PJp.reshape(N, 6),
        b.Jc.reshape(N, 12), b.PJc.reshape(N, 12),
        b.Jg.reshape(N, 2 * G), b.PJg.reshape(N, 2 * G),
    ]
    packed = jnp.concatenate(parts + [jnp.zeros((N, LANES - cols), b.Jp.dtype)], axis=1)
    hppinv = jnp.concatenate(
        [b.Hpp_inv.reshape(-1, 9),
         jnp.zeros((b.Hpp_inv.shape[0], 7), b.Hpp_inv.dtype)], axis=1)
    m_pad = max(128, int(np.ceil(problem.num_images / 128)) * 128)
    return PackedProblem(
        packed=packed,
        obs_img=problem.obs_image.reshape(-1, 1).astype(jnp.int32),
        hppinv=hppinv,
        num_points=problem.num_points,
        views=views,
        num_images=problem.num_images,
        m_pad=m_pad,
        g=G,
    )


def _matvec_kernel(xc_ref, xg_ref, packed_ref, img_ref, hpp_ref,
                   outc_ref, outg_ref, *, views: int, g: int, m_pad: int,
                   g_pad: int):
    """Pure-2D formulation (Mosaic supports neither minor-dim reshapes nor
    multi-dim contractions): every small contraction is column arithmetic,
    camera gather/scatter and the point-block reduce/broadcast are one-hot
    matmuls on the MXU."""
    rows = packed_ref.shape[0]
    pb = rows // views
    f32 = jnp.float32

    pk = packed_ref[:]  # [rows, 128]
    # packed columns: Jp(i0:0-2, i1:3-5) PJp(6-11) Jc(12-23) PJc(24-35)
    #                 Jg(36..36+2g) PJg(36+2g..36+4g)

    # one-hot over images (camera gather via MXU)
    img = img_ref[:]  # [rows, 1] int32
    iota_m = jax.lax.broadcasted_iota(jnp.int32, (rows, m_pad), 1)
    onehot = (iota_m == img).astype(f32)  # [rows, m_pad]

    xc = xc_ref[:]  # [m_pad, 8]
    xcr = jnp.dot(onehot, xc, preferred_element_type=f32)[:, :6]  # [rows, 6]
    xg = xg_ref[:]  # [1, g_pad]

    # t_i = sum_a PJc[i,a] xcr[a] + sum_k PJg[i,k] xg[k]
    t0 = jnp.sum(pk[:, 24:30] * xcr, axis=1, keepdims=True)  # [rows, 1]
    t1 = jnp.sum(pk[:, 30:36] * xcr, axis=1, keepdims=True)
    gx = xg[:, :g]  # [1, g]
    t0 = t0 + jnp.sum(pk[:, 36 + 2 * g:36 + 3 * g] * gx, axis=1, keepdims=True)
    t1 = t1 + jnp.sum(pk[:, 36 + 3 * g:36 + 4 * g] * gx, axis=1, keepdims=True)

    # per-point reduction via point one-hot (rows -> pb), then Hpp^{-1}
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (rows, pb), 0) // views
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (rows, pb), 1)
    ppb = (iota_p == iota_c).astype(f32)  # [rows, pb]

    jt = pk[:, 0:3] * t0 + pk[:, 3:6] * t1  # [rows, 3] (Jp^T t)
    y = jnp.dot(ppb.T, jt, preferred_element_type=f32)  # [pb, 3]

    h = hpp_ref[:]  # [pb, 16] row-major 3x3 in cols 0..8
    z0 = jnp.sum(h[:, 0:3] * y, axis=1, keepdims=True)
    z1 = jnp.sum(h[:, 3:6] * y, axis=1, keepdims=True)
    z2 = jnp.sum(h[:, 6:9] * y, axis=1, keepdims=True)
    z = jnp.concatenate([z0, z1, z2], axis=1)  # [pb, 3]
    zr = jnp.dot(ppb, z, preferred_element_type=f32)  # [rows, 3]

    u0 = jnp.sum(pk[:, 6:9] * zr, axis=1, keepdims=True)
    u1 = jnp.sum(pk[:, 9:12] * zr, axis=1, keepdims=True)
    tv0 = t0 - u0
    tv1 = t1 - u1

    qc = pk[:, 12:18] * tv0 + pk[:, 18:24] * tv1  # [rows, 6] (Jc^T tv)
    qc8 = jnp.concatenate([qc, jnp.zeros((rows, 2), f32)], axis=1)
    contrib_c = jnp.dot(onehot.T, qc8, preferred_element_type=f32)  # [m_pad, 8]

    qg = (pk[:, 36:36 + g] * tv0
          + pk[:, 36 + g:36 + 2 * g] * tv1)  # [rows, g] (Jg^T tv)
    qg_sum = jnp.sum(qg, axis=0, keepdims=True)  # [1, g]
    qg_pad = jnp.concatenate(
        [qg_sum, jnp.zeros((1, g_pad - g), f32)], axis=1)

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        outc_ref[:] = jnp.zeros_like(outc_ref)
        outg_ref[:] = jnp.zeros_like(outg_ref)

    outc_ref[:] += contrib_c.astype(outc_ref.dtype)
    outg_ref[:] += qg_pad.astype(outg_ref.dtype)


def make_pallas_matvec(pp: PackedProblem, block_points: int = 128):
    """Returns fn(xc [M,6], xg [G], extra_c [M,6], extra_g [G]) -> (out_c,
    out_g) computing the full S @ x product."""
    P, V, G = pp.num_points, pp.views, pp.g
    m_pad = pp.m_pad
    g_pad = max(128, int(np.ceil(G / 128)) * 128)
    # grid over point blocks
    if P % block_points != 0:
        # shrink to a divisor
        while P % block_points != 0:
            block_points //= 2
        if block_points < 1:
            raise ValueError("num_points must be divisible by a power of two")
    rows_blk = block_points * V
    grid = (P // block_points,)

    kernel = functools.partial(
        _matvec_kernel, views=V, g=G, m_pad=m_pad, g_pad=g_pad)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_pad, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_blk, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_points, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((m_pad, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, 8), jnp.float32),
            jax.ShapeDtypeStruct((1, g_pad), jnp.float32),
        ],
    )

    def matvec(xc, xg, extra_c, extra_g):
        M = xc.shape[0]
        xc_pad = jnp.zeros((m_pad, 8), jnp.float32).at[:M, :6].set(xc)
        xg_pad = jnp.zeros((1, g_pad), jnp.float32).at[0, :G].set(xg)
        out_c, out_g = call(xc_pad, xg_pad, pp.packed, pp.obs_img, pp.hppinv)
        oc = out_c[:M, :6] + extra_c * xc
        og = out_g[0, :G] + extra_g * xg
        return oc, og

    return matvec
