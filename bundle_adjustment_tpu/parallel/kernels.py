"""Feature-major Pallas TPU kernels for the RCS engine.

Layout contract (see parallel/engine.py): every per-observation quantity is
a row of length N with N on the 128-wide lane axis; observations are stored
point-major with a uniform view count V, so a block of NB = V * PB lanes
covers PB whole points and the point reduce/broadcast are 0/1 selection
matmuls on the MXU.  The camera gather/scatter are one-hot matmuls (random
image ids have no block locality).  Per grid step:

    onehot = (img_row == iota_m)                    [M_pad, NB]   (VPU)
    xcr    = xcT @ onehot                           [8, NB]       (MXU)
    t_i    = sum_a PJc[i,a] * xcr[a] + sum_g PJg[i,g] * xg[g]
    y      = (Jp^T t) @ Sel                         [3, PB]       (MXU)
    z      = Hpp^{-1} y                             [3, PB]       (VPU)
    tv     = t - PJp (z @ SelT)                     [2-ish rows]
    out_c += onehot @ (Jc^T tv)^T                   [M_pad, 8]    (MXU)
    out_g += (Jg^T tv) @ ones                       [G_pad8, 8]   (MXU)

Measured context (v5e, 100k pts / 500 img / 12 views): the [N, 2, k] block
layout pays a 12-64x TPU tile-padding tax; this kernel reads the packed
[F, N] rows once at ~1x padding.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class PackedFM(NamedTuple):
    packed: jnp.ndarray   # [F_pad, N] f32 rows (layout below)
    obs_img: jnp.ndarray  # [1, N] int32
    hppinv: jnp.ndarray   # [8, P] f32 (rows 0-5: sym3 inverse 00,01,02,11,12,22)
    num_points: int
    views: int
    num_images: int
    m_pad: int
    g: int                # number of global parameters
    f_pad: int


# packed row offsets: Jp(6) PJp(6) Jc(12) PJc(12) Jg(2G) PJg(2G)
def _offsets(G):
    return dict(Jp=0, PJp=6, Jc=12, PJc=24, Jg=36, PJg=36 + 2 * G,
                F=36 + 4 * G)


def pack_fm(b, p, dtype=jnp.float32) -> PackedFM:
    """Pack engine.FMBlocks rows into the kernel layout (one [F, N] array)."""
    G = len(b.Jg) // 2
    off = _offsets(G)
    rows = list(b.Jp) + list(b.PJp) + list(b.Jc) + list(b.PJc) \
        + list(b.Jg) + list(b.PJg)
    F = off["F"]
    f_pad = ((F + 7) // 8) * 8
    packed = jnp.stack(rows).astype(dtype)
    if f_pad > F:
        packed = jnp.concatenate(
            [packed, jnp.zeros((f_pad - F, packed.shape[1]), dtype)])
    hpp = jnp.stack(list(b.Hpp_inv)).astype(dtype)
    hpp = jnp.concatenate([hpp, jnp.zeros((2, hpp.shape[1]), dtype)])
    m_pad = max(128, -(-p.num_images // 128) * 128)
    return PackedFM(
        packed=packed,
        obs_img=p.obs_image.reshape(1, -1).astype(jnp.int32),
        hppinv=hpp,
        num_points=p.num_points, views=p.views, num_images=p.num_images,
        m_pad=m_pad, g=G, f_pad=f_pad)


def choose_pb(P: int, V: int, target_nb: int = 4096) -> int:
    """Largest PB (multiple of 128, Mosaic lane-block constraint) dividing P
    with V*PB <= target_nb."""
    best = 0
    pb = 128
    while V * pb <= target_nb:
        if P % pb == 0:
            best = pb
        pb += 128
    if best == 0:
        raise ValueError(
            f"no block size for P={P}, V={V}; pad the problem with "
            "engine.pad_problem so that 128 divides P")
    return best


def _matvec_kernel(xcT_ref, xg_ref, packed_ref, img_ref, hpp_ref,
                   outc_ref, outg_ref, *, views, g, m_pad, pb):
    f32 = jnp.float32
    off = _offsets(g)
    nb = views * pb
    pk = packed_ref[:]          # [F_pad, NB]
    img = img_ref[:]            # [1, NB] int32

    iota_m = jax.lax.broadcasted_iota(jnp.int32, (m_pad, nb), 0)
    onehot = (iota_m == img).astype(f32)            # [M_pad, NB]

    xcT = xcT_ref[:]                                # [8, M_pad]
    xcr = jnp.dot(xcT, onehot, preferred_element_type=f32)  # [8, NB]

    xg = xg_ref[:]                                  # [8, G_pad] (row 0 live)

    jc, pjc = off["Jc"], off["PJc"]
    jg, pjg = off["Jg"], off["PJg"]
    t0 = jnp.sum(pk[pjc:pjc + 6] * xcr[:6], axis=0, keepdims=True)
    t1 = jnp.sum(pk[pjc + 6:pjc + 12] * xcr[:6], axis=0, keepdims=True)
    # global contribution: [1, G] @ [G, NB] on the MXU
    xg_row = xg[0:1, :g]                            # [1, G]
    t0 = t0 + jnp.dot(xg_row, pk[pjg:pjg + g], preferred_element_type=f32)
    t1 = t1 + jnp.dot(xg_row, pk[pjg + g:pjg + 2 * g],
                      preferred_element_type=f32)

    # selection matrices for the uniform point-major reduce/broadcast
    # (explicit lax.div with an int32 constant: jnp's `//` promotion can
    # recurse under jax_enable_x64 while tracing the kernel)
    v32 = jnp.int32(views)
    sel_r = jax.lax.div(
        jax.lax.broadcasted_iota(jnp.int32, (nb, pb), 0), v32)
    sel_q = jax.lax.broadcasted_iota(jnp.int32, (nb, pb), 1)
    Sel = (sel_r == sel_q).astype(f32)              # [NB, PB]
    selT_r = jax.lax.div(
        jax.lax.broadcasted_iota(jnp.int32, (pb, nb), 1), v32)
    selT_q = jax.lax.broadcasted_iota(jnp.int32, (pb, nb), 0)
    SelT = (selT_r == selT_q).astype(f32)           # [PB, NB]

    jp, pjp = off["Jp"], off["PJp"]
    jt = pk[jp:jp + 3] * t0 + pk[jp + 3:jp + 6] * t1       # [3, NB]
    y = jnp.dot(jt, Sel, preferred_element_type=f32)       # [3, PB]

    h = hpp_ref[:]                                          # [8, PB]
    z0 = h[0:1] * y[0:1] + h[1:2] * y[1:2] + h[2:3] * y[2:3]
    z1 = h[1:2] * y[0:1] + h[3:4] * y[1:2] + h[4:5] * y[2:3]
    z2 = h[2:3] * y[0:1] + h[4:5] * y[1:2] + h[5:6] * y[2:3]
    z = jnp.concatenate([z0, z1, z2], axis=0)               # [3, PB]
    zo = jnp.dot(z, SelT, preferred_element_type=f32)       # [3, NB]

    u0 = jnp.sum(pk[pjp:pjp + 3] * zo, axis=0, keepdims=True)
    u1 = jnp.sum(pk[pjp + 3:pjp + 6] * zo, axis=0, keepdims=True)
    tv0 = t0 - u0
    tv1 = t1 - u1

    qc = pk[jc:jc + 6] * tv0 + pk[jc + 6:jc + 12] * tv1     # [6, NB]
    qc8 = jnp.concatenate([qc, jnp.zeros((2, nb), f32)], axis=0)
    # [M_pad, 8] = onehot [M_pad, NB] (x) qc8 [8, NB] contracting NB
    contrib_c = jax.lax.dot_general(
        onehot, qc8, (((1,), (1,)), ((), ())),
        preferred_element_type=f32)

    qg = pk[jg:jg + g] * tv0 + pk[jg + g:jg + 2 * g] * tv1  # [G, NB]
    g_pad8 = outg_ref.shape[0]
    qg = jnp.concatenate([qg, jnp.zeros((g_pad8 - g, nb), f32)], axis=0)
    ones = jnp.ones((nb, 8), f32)
    contrib_g = jnp.dot(qg, ones, preferred_element_type=f32)  # [G_pad8, 8]

    @pl.when(pl.program_id(0) == 0)
    def _():
        outc_ref[:] = jnp.zeros_like(outc_ref)
        outg_ref[:] = jnp.zeros_like(outg_ref)

    outc_ref[:] += contrib_c
    outg_ref[:] += contrib_g


def make_matvec(pp: PackedFM, extra_c, extra_g, pb: int | None = None,
                interpret: bool = False):
    """Returns fn(xc [M, 6], xg [G]) -> (S@x)_c [M, 6], (S@x)_g [G]."""
    P, V, G = pp.num_points, pp.views, pp.g
    m_pad = pp.m_pad
    if pb is None:
        pb = choose_pb(P, V)
    nb = pb * V
    grid = (P // pb,)
    g_pad8 = ((G + 7) // 8) * 8
    g_lane = max(128, ((G + 127) // 128) * 128)

    kernel = functools.partial(_matvec_kernel, views=V, g=G, m_pad=m_pad,
                               pb=pb)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, m_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, g_lane), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pp.f_pad, nb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, pb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((m_pad, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_pad8, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, 8), jnp.float32),
            jax.ShapeDtypeStruct((g_pad8, 8), jnp.float32),
        ],
        interpret=interpret,
    )

    def matvec(xc, xg):
        M = xc.shape[0]
        xcT = jnp.zeros((8, m_pad), jnp.float32).at[:6, :M].set(xc.T)
        xg_pad = jnp.zeros((8, g_lane), jnp.float32).at[0, :G].set(xg)
        # Mosaic cannot legalize the i64 grid index maps that
        # jax_enable_x64 produces; the kernel is pure f32/int32 anyway
        with jax.enable_x64(False):
            out_c, out_g = call(xcT, xg_pad, pp.packed, pp.obs_img,
                                pp.hppinv)
        oc = out_c[:M, :6] + extra_c * xc
        og = out_g[:G, 0] + extra_g * xg
        return oc, og

    return matvec
