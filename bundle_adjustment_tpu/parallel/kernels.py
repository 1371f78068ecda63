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


# packed row offsets: Jp(6) PJp(6) Jc(12) PJc(12) Jg(2G) PJg(2G) [Pw(2)]
def _offsets(G, with_pw=False):
    return dict(Jp=0, PJp=6, Jc=12, PJc=24, Jg=36, PJg=36 + 2 * G,
                Pw=36 + 4 * G, F=36 + 4 * G + (2 if with_pw else 0))


def pack_fm(b, p, dtype=jnp.float32, with_pw: bool = False) -> PackedFM:
    """Pack engine.FMBlocks rows into the kernel layout (one [F, N] array).
    ``with_pw`` appends the 2 weighted-misclosure rows (P w) that the fused
    assembly kernel needs; the matvec kernel ignores them."""
    G = len(b.Jg) // 2
    off = _offsets(G, with_pw)
    rows = list(b.Jp) + list(b.PJp) + list(b.Jc) + list(b.PJc) \
        + list(b.Jg) + list(b.PJg)
    if with_pw:
        rows += list(b.Pw)
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


# ---------------------------------------------------------------------------
# fused assembly (prepare) kernel
# ---------------------------------------------------------------------------

def _prepare_kernel(packed_ref, img_ref, hpp_ref,
                    red_ref, rgq_ref, t2_ref, t3_ref, *, views, g, m_pad,
                    pb, f99_pad, t2_pad, t3_pad):
    """Fused per-image reduction of engine.prepare's 39 + 6G feature rows.

    Replaces the XLA path's [N, 39 + 6G] stack + image-order row gather +
    blocked cumsum (3 full-stack HBM round trips) with one pass: the packed
    [F, N] rows are read once per block, the feature products live in VMEM,
    and the per-image accumulation is a one-hot MXU matmul (same trick as
    `_matvec_kernel`).  Also accumulates the global-side pieces: the rhs
    correction sum_n Jg u0 (rgq), T2 = Jg PJg^T and T3 = W Hpg^T for Sgg.
    Row order matches engine.prepare exactly; engine.finish_reduction turns
    the outputs into (rc, rg, Precond)."""
    f32 = jnp.float32
    off = _offsets(g, with_pw=True)
    nb = views * pb
    pk = packed_ref[:]          # [F_pad, NB]
    img = img_ref[:]            # [1, NB] int32
    h = hpp_ref[:]              # [8, PB]

    iota_m = jax.lax.broadcasted_iota(jnp.int32, (m_pad, nb), 0)
    onehot = (iota_m == img).astype(f32)            # [M_pad, NB]

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
    jc, pjc = off["Jc"], off["PJc"]
    jg, pjg = off["Jg"], off["PJg"]
    pw = off["Pw"]
    Pw0, Pw1 = pk[pw:pw + 1], pk[pw + 1:pw + 2]     # [1, NB]

    def hinv_rows(hh, a0, a1, a2):
        return (hh[0:1] * a0 + hh[1:2] * a1 + hh[2:3] * a2,
                hh[1:2] * a0 + hh[3:4] * a1 + hh[4:5] * a2,
                hh[2:3] * a0 + hh[4:5] * a1 + hh[5:6] * a2)

    # bp -> z0 -> u0 (rhs Schur correction chain)
    jt = pk[jp:jp + 3] * Pw0 + pk[jp + 3:jp + 6] * Pw1       # [3, NB]
    bp = jnp.dot(jt, Sel, preferred_element_type=f32)        # [3, PB]
    z = jnp.concatenate(hinv_rows(h, bp[0:1], bp[1:2], bp[2:3]), axis=0)
    zo = jnp.dot(z, SelT, preferred_element_type=f32)        # [3, NB]
    u0 = jnp.sum(pk[pjp:pjp + 3] * zo, axis=0, keepdims=True)
    u1 = jnp.sum(pk[pjp + 3:pjp + 6] * zo, axis=0, keepdims=True)

    # all rows stay 2-D [1, NB] (Mosaic wants >= 2-D lane layouts)
    def row(base, i):
        return pk[base + i:base + i + 1]

    rows = []
    # bc terms (6) / Hcc diagonal (6) / rc corrections (6)
    for a in range(6):
        rows.append(row(jc, a) * Pw0 + row(jc, 6 + a) * Pw1)
    for a in range(6):
        rows.append(row(jc, a) * row(pjc, a)
                    + row(jc, 6 + a) * row(pjc, 6 + a))
    for a in range(6):
        rows.append(row(jc, a) * u0 + row(jc, 6 + a) * u1)

    # Scc upper triangle (21): Hcc - Hcp Hpp^{-1} Hpc per observation
    hp = [[row(jp, a) * row(pjc, e) + row(jp, 3 + a) * row(pjc, 6 + e)
           for e in range(6)] for a in range(3)]
    hio = jnp.dot(h[0:6], SelT, preferred_element_type=f32)  # [6, NB]
    for e in range(6):
        he = hinv_rows(hio, hp[0][e], hp[1][e], hp[2][e])
        for f in range(e, 6):
            jpj = row(jc, e) * row(pjc, f) + row(jc, 6 + e) * row(pjc, 6 + f)
            corr = sum(he[a] * hp[a][f] for a in range(3))
            rows.append(jpj - corr)

    # Hpg per point and W = Hpp^{-1} Hpg (row index a*G+g, as engine.WM)
    hpg_obs = jnp.concatenate(
        [row(jp, a) * row(pjg, gg) + row(jp, 3 + a) * row(pjg, g + gg)
         for a in range(3) for gg in range(g)], axis=0)      # [3G, NB]
    hpg_blk = jnp.dot(hpg_obs, Sel, preferred_element_type=f32)  # [3G, PB]
    Wrows = [hinv_rows(h, hpg_blk[0 * g + gg:0 * g + gg + 1],
                       hpg_blk[1 * g + gg:1 * g + gg + 1],
                       hpg_blk[2 * g + gg:2 * g + gg + 1])
             for gg in range(g)]
    W_blk = jnp.concatenate(
        [Wrows[gg][a] for a in range(3) for gg in range(g)], axis=0)
    Wobs = jnp.dot(W_blk, SelT, preferred_element_type=f32)  # [3G, NB]

    # Scg rows (6G): Hcg - Hcp Hpp^{-1} Hpg per observation
    for e in range(6):
        for gg in range(g):
            hcg = row(jc, e) * row(pjg, gg) + row(jc, 6 + e) * row(pjg, g + gg)
            corr = sum(hp[a][e] * Wobs[a * g + gg:a * g + gg + 1]
                       for a in range(3))
            rows.append(hcg - corr)

    feat = jnp.concatenate(rows, axis=0)                     # [F99, NB]
    if f99_pad > feat.shape[0]:
        feat = jnp.concatenate(
            [feat, jnp.zeros((f99_pad - feat.shape[0], nb), f32)])
    contrib_red = jax.lax.dot_general(
        onehot, feat, (((1,), (1,)), ((), ())), preferred_element_type=f32)

    # global rhs correction rows: sum_n Jg u0
    qg = pk[jg:jg + g] * u0 + pk[jg + g:jg + 2 * g] * u1     # [G, NB]
    g_pad8 = rgq_ref.shape[0]
    qg = jnp.concatenate([qg, jnp.zeros((g_pad8 - g, nb), f32)], axis=0)
    contrib_rgq = jnp.dot(qg, jnp.ones((nb, 8), f32),
                          preferred_element_type=f32)

    # T2 = Jg @ PJg^T over this block's lanes
    A2 = jnp.concatenate(
        [pk[jg:jg + 2 * g], jnp.zeros((t2_pad - 2 * g, nb), f32)])
    B2 = jnp.concatenate(
        [pk[pjg:pjg + 2 * g], jnp.zeros((t2_pad - 2 * g, nb), f32)])
    contrib_t2 = jax.lax.dot_general(
        A2, B2, (((1,), (1,)), ((), ())), preferred_element_type=f32)

    # T3 = W @ Hpg^T over this block's points
    A3 = jnp.concatenate(
        [W_blk, jnp.zeros((t3_pad - 3 * g, pb), f32)])
    B3 = jnp.concatenate(
        [hpg_blk, jnp.zeros((t3_pad - 3 * g, pb), f32)])
    contrib_t3 = jax.lax.dot_general(
        A3, B3, (((1,), (1,)), ((), ())), preferred_element_type=f32)

    @pl.when(pl.program_id(0) == 0)
    def _():
        red_ref[:] = jnp.zeros_like(red_ref)
        rgq_ref[:] = jnp.zeros_like(rgq_ref)
        t2_ref[:] = jnp.zeros_like(t2_ref)
        t3_ref[:] = jnp.zeros_like(t3_ref)

    red_ref[:] += contrib_red
    rgq_ref[:] += contrib_rgq
    t2_ref[:] += contrib_t2
    t3_ref[:] += contrib_t3


def make_prepare_reduction(pp: PackedFM, pb: int | None = None,
                           interpret: bool = False):
    """Returns fn() -> (red [M, 39+6G], rg_corr [G], T2 [2G, 2G],
    T3 [3G, 3G]) computed from the packed rows (pack_fm with_pw=True)."""
    P, V, G = pp.num_points, pp.views, pp.g
    m_pad = pp.m_pad
    if pb is None:
        pb = choose_pb(P, V)
    nb = pb * V
    grid = (P // pb,)
    F99 = 39 + 6 * G
    f99_pad = ((F99 + 7) // 8) * 8
    g_pad8 = ((G + 7) // 8) * 8
    t2_pad = ((2 * G + 7) // 8) * 8
    t3_pad = ((3 * G + 7) // 8) * 8

    kernel = functools.partial(
        _prepare_kernel, views=V, g=G, m_pad=m_pad, pb=pb,
        f99_pad=f99_pad, t2_pad=t2_pad, t3_pad=t3_pad)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((pp.f_pad, nb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, pb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((m_pad, f99_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_pad8, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t2_pad, t2_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t3_pad, t3_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, f99_pad), jnp.float32),
            jax.ShapeDtypeStruct((g_pad8, 8), jnp.float32),
            jax.ShapeDtypeStruct((t2_pad, t2_pad), jnp.float32),
            jax.ShapeDtypeStruct((t3_pad, t3_pad), jnp.float32),
        ],
        interpret=interpret,
    )

    M = pp.num_images

    def run():
        with jax.enable_x64(False):
            red, rgq, T2, T3 = call(pp.packed, pp.obs_img, pp.hppinv)
        return (red[:M, :F99], rgq[:G, 0], T2[:2 * G, :2 * G],
                T3[:3 * G, :3 * G])

    return run


def prepare_pallas(p, state, spec, damping, couple_global: bool = True,
                   pb: int | None = None, interpret: bool = False,
                   state_lo=None):
    """Drop-in replacement for engine.prepare on the TPU f32 path: linearise
    (XLA), pack once, run the fused assembly kernel, finish in XLA.  Returns
    (blocks, rc, rg, Precond, PackedFM) — the PackedFM is reusable by
    `make_matvec`, so the LM step packs exactly once."""
    from . import engine

    b = engine.linearize(p, state, spec, damping, state_lo=state_lo)
    pp = pack_fm(b, p, with_pw=True)
    red, rg_corr, T2, T3 = make_prepare_reduction(pp, pb, interpret)()
    out = engine.finish_reduction(p, b, state, damping, red, rg_corr,
                                  T2, T3, couple_global)
    return (*out, pp)
