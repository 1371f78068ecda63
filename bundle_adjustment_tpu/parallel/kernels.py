"""Feature-major Pallas TPU kernels for the RCS engine.

Layout contract (see parallel/engine.py): every per-observation quantity is
a row of length N with N on the 128-wide lane axis; observations are stored
in the VIEW-MAJOR BLOCKED order (`engine.to_view_major`): a block of
NB = V * PB lanes covers PB whole points with lane = v*PB + p, so the
point reduce/broadcast are V static 128-aligned lane-slice adds/concats —
no selection matmuls.  The camera gather/scatter use a TWO-LEVEL factored
one-hot, img = hi*W + lo with H*W = M_pad:

    onehot_hi = (iota_H == img // W)            [H, NB]     (VPU, cost ∝ H)
    lo_mask_w = (img % W == w)                  W x [1, NB]
    gather:  T1 = xcT_resh @ onehot_hi          [8W, NB]    (MXU)
             xcr = sum_w T1[8w:8w+8] * lo_mask_w
    scatter: out[:, wH:(w+1)H] += (q * lo_mask_w) @ onehot_hi^T   (MXU)

versus the single-level one-hot [M_pad, NB] this cuts the dominant VPU
generation cost by W, bounds VMEM for any image count (the single-level
one-hot is 31 MB at M = 5000 — over the ~16 MB VMEM), and shrinks the
padded matmul work ~4x at M = 500 / ~13x at M = 5000.

Measured context (v5e, 100k pts / 500 img / 12 views, exp_tpu1/2): the
[N, 2, k] block layout pays a 12-64x TPU tile-padding tax; packed rows read
at ~1x.  Single-level one-hot kernel: 3.2 ms (14% of HBM speed-of-light),
of which ~1.45 ms is one-hot generation, ~0.5 ms padded-matmul excess;
this design removes most of both.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# MXU matmul precision: TPU f32 dots default to ONE bf16xbf16 pass, which
# silently rounds BOTH operands to bf16 (~4e-3 relative) — measured as a
# 10x f32-convergence-floor regression.  Value x value products use
# Precision.HIGHEST (6 bf16 passes; Mosaic has no HIGH).  Products against
# the EXACT-in-bf16 one-hot / ones matrices use `_dot_oh`: a manual
# 3-chunk split of the value operand — exact f32 in 3 native bf16 passes.
P_VALUE = jax.lax.Precision.HIGHEST


def _dot_oh(v, oh_bf16, contract_last=False, passes=3):
    """Near-f32 product of f32 ``v`` with an exact-in-bf16 0/1 matrix.

    v [r, K] @ oh [K, nb] (or, with ``contract_last``, v [r, nb] (x)
    oh [H, nb] contracting nb).  The value operand is split into bf16
    chunks; each chunk multiplies the exact one-hot on the native bf16 MXU
    path with f32 accumulation.  ``passes``: 3 (default) is f32-exact
    (residual O(2^-27 |v|)); 2 carries O(2^-16 |v|) relative error — fine
    for the CG OPERATOR (solve accuracy needs ~1e-2 relative; the
    measured-disastrous case was the single-pass 4e-3), NOT for the
    assembly's gradient rows (cancelling reductions — keep 3).

    The chunks ride ONE dot, STACKED along the non-contracted row dim
    (r05: the separate per-chunk dots each pay a full MXU pass at r = 8W
    = 32 rows — 25%% M-tile utilisation; the stacked [passes*r, .] dot
    does the same work in one pass), and the partial products are summed
    after the dot."""
    f32 = jnp.float32
    bf = jnp.bfloat16
    v1 = v.astype(bf)
    r1 = v - v1.astype(f32)
    v2 = r1.astype(bf)
    chunks = [v1, v2]
    if passes >= 3:
        chunks.append((r1 - v2.astype(f32)).astype(bf))
    A = jnp.concatenate(chunks, axis=0)
    if contract_last:
        dn = (((1,), (1,)), ((), ()))
        out = jax.lax.dot_general(A, oh_bf16, dn,
                                  preferred_element_type=f32)
    else:
        out = jnp.dot(A, oh_bf16, preferred_element_type=f32)
    r = v.shape[0]
    tot = out[:r]
    for k in range(1, len(chunks)):
        tot = tot + out[k * r:(k + 1) * r]
    return tot


class PackedFM(NamedTuple):
    packed: jnp.ndarray   # [F_pad, N] f32 rows (layout below), view-major
    obs_img: jnp.ndarray  # [1, N] int32 (view-major order)
    hppinv: jnp.ndarray   # [8, P] f32 (rows 0-5: sym3 inverse 00,01,02,11,12,22)
    num_points: int
    views: int
    num_images: int
    m_pad: int
    g: int                # number of global parameters
    f_pad: int
    pb: int               # view-major point-block size (= engine vm_pb)
    h: int                # hi-level one-hot size (W = m_pad // h)


# packed row layout: a LEAN PREFIX [Jp(6) Jc(12) Jg(2G) wxx wxy wyy]
# holding everything the CG matvec needs (P-weighted products are
# recombined in-kernel via the 2x2 weight rows: t = W2 s, u = W2 r), then
# a TAIL [PJp(6) PJc(12) PJg(2G) (Pw 2)] for the fused assembly kernel.
# The matvec BlockSpec reads only the first f_lean_pad rows of the SAME
# array — 40-45%% less HBM traffic in the bandwidth-bound CG loop, no
# second copy.
def _offsets(G, with_pw=False):
    lean = 21 + 2 * G
    lean_pad = ((lean + 7) // 8) * 8
    return dict(Jp=0, Jc=6, Jg=18, W=18 + 2 * G, F_lean=lean,
                F_lean_pad=lean_pad,
                PJp=lean_pad, PJc=lean_pad + 6, PJg=lean_pad + 18,
                Pw=lean_pad + 18 + 2 * G,
                F=lean_pad + 18 + 2 * G + (2 if with_pw else 0))


def choose_h(m_pad: int, row_cost: float, h_max: int = 512) -> int:
    """Pick the hi-level size H (divisor of m_pad, multiple of 128, <= h_max)
    minimising one-hot generation (∝ H) + per-lo-level masking work
    (∝ row_cost * W): H* ~ sqrt(4 * row_cost * m_pad)."""
    best, best_cost = None, None
    for Hc in (128, 256, 512):
        if Hc > m_pad or Hc > h_max or m_pad % Hc != 0:
            continue
        cost = 2 * Hc / 8 + row_cost * (m_pad // Hc)
        if best_cost is None or cost < best_cost:
            best, best_cost = Hc, cost
    if best is None:
        best = m_pad  # m_pad == 128
    return best


def pack_fm(b, p, dtype=jnp.float32, with_pw: bool = False,
            h: int | None = None, lean_only: bool = False) -> PackedFM:
    """Pack engine.FMBlocks rows into the kernel layout (one [F, N] array).
    ``p`` must be a view-major FMProblem (engine.to_view_major) — the rows
    come out of engine.linearize already in that lane order.  ``with_pw``
    appends the 2 weighted-misclosure rows (P w) that the fused assembly
    kernel needs; ``lean_only`` packs just the matvec prefix (callers that
    never run the assembly kernel skip the PJ tail entirely)."""
    if p.vm_pb is None:
        raise ValueError("pack_fm requires the view-major layout; apply "
                         "engine.to_view_major to the FMProblem first")
    if b.Jg is None:
        raise ValueError(
            "the Pallas kernels take the single-camera packed layout; "
            "multi-camera (compact global rows) runs the XLA engine path "
            "— call lm_step with use_pallas=False")
    G = len(b.Jg) // 2
    off = _offsets(G, with_pw)
    lean_rows = list(b.Jp) + list(b.Jc) + list(b.Jg) \
        + [p.wxx, p.wxy, p.wyy]
    pad_lean = off["F_lean_pad"] - off["F_lean"]
    zero = jnp.zeros_like(lean_rows[0])
    if lean_only:
        rows = lean_rows
        F = off["F_lean"]
    else:
        rows = lean_rows + [zero] * pad_lean \
            + list(b.PJp) + list(b.PJc) + list(b.PJg)
        if with_pw:
            rows += list(b.Pw)
        F = off["F"]
    f_pad = ((F + 7) // 8) * 8
    packed = jnp.stack([r.astype(dtype) for r in rows])
    if f_pad > F:
        packed = jnp.concatenate(
            [packed, jnp.zeros((f_pad - F, packed.shape[1]), dtype)])
    hpp = jnp.stack(list(b.Hpp_inv)).astype(dtype)
    hpp = jnp.concatenate([hpp, jnp.zeros((2, hpp.shape[1]), dtype)])
    m_pad = max(128, -(-p.num_images // 128) * 128)
    if h is None:
        h = choose_h(m_pad, row_cost=2.0)
    return PackedFM(
        packed=packed,
        obs_img=p.obs_image.reshape(1, -1).astype(jnp.int32),
        hppinv=hpp,
        num_points=p.num_points, views=p.views, num_images=p.num_images,
        m_pad=m_pad, g=G, f_pad=f_pad, pb=p.vm_pb, h=h)


def choose_bsteps(P: int, pb: int, target: int = 1) -> int:
    """Largest divisor of the block count P//pb that is <= target —
    sub-blocks per matvec grid step (amortises per-step grid overhead)."""
    nb = P // pb
    best = 1
    for k in range(1, min(target, nb) + 1):
        if nb % k == 0:
            best = k
    return best


def default_bsteps(P: int, pb: int, views: int) -> int:
    """Production bsteps: amortise grid overhead only while the lane
    block is small (r05 exp_mv5: at nb >= 8192 bsteps > 1 costs VMEM
    double-buffering and measures slower — 543 vs 532 us at pb=1024)."""
    return choose_bsteps(P, pb, 2 if pb * views < 8192 else 1)


def choose_pb(P: int, V: int, target_nb: int | None = None,
              num_images: int | None = None) -> int:
    """Largest PB (multiple of 128, Mosaic lane-block constraint) dividing P
    with V*PB <= target_nb.

    ``target_nb=None`` sizes the lane block from the kernel's VMEM budget:
    the matvec's dominant VMEM residents scale as 8W * nb (the [8W, nb]
    f32 one-hot product + its stacked bf16 operand), so nb is capped at
    ~156k / W — bigger blocks measure faster until VMEM double-buffering
    runs out (r05 exp_mv5: 636 -> 532 us/mv going nb 3072 -> 12288 at
    W=4; the M=5000 config has W=40 and must stay at nb ~3k)."""
    if target_nb is None:
        if num_images is None:
            target_nb = 4096
        else:
            m_pad = max(128, -(-num_images // 128) * 128)
            W = m_pad // choose_h(m_pad, row_cost=2.0)
            target_nb = max(2048, min(16384,
                                      int(156250 / W) // 128 * 128))
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


# ---------------------------------------------------------------------------
# in-kernel helpers (two-level one-hot; view-major point slices)
# ---------------------------------------------------------------------------

def _two_level_onehot(img, H, W, nb):
    """Returns (onehot_hi [H, nb] bf16 — 0/1 is exact in bf16, consumed only
    by `_dot_oh` products — and lo_mask: W x [1, nb] f32 for VPU masking)."""
    f32 = jnp.float32
    bf = jnp.bfloat16
    if W == 1:
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (H, nb), 0)
        return (iota_h == img).astype(bf), None
    w32 = jnp.int32(W)
    img_hi = jax.lax.div(img, w32)
    img_lo = img - img_hi * w32
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (H, nb), 0)
    onehot_hi = (iota_h == img_hi).astype(bf)
    lo_mask = [(img_lo == w).astype(f32) for w in range(W)]
    return onehot_hi, lo_mask


def _view_sum(x, views, pb):
    """[k, nb] -> [k, pb]: sum the V static lane slices (view-major)."""
    y = x[:, 0:pb]
    for v in range(1, views):
        y = y + x[:, v * pb:(v + 1) * pb]
    return y


def _view_bcast(z, views):
    """[k, pb] -> [k, nb]: broadcast back over the V lane slices."""
    return jnp.concatenate([z] * views, axis=1)


def _hinv_rows(h, a0, a1, a2):
    """Symmetric-3x3 inverse apply on row triples (h rows 0-5)."""
    return (h[0:1] * a0 + h[1:2] * a1 + h[2:3] * a2,
            h[1:2] * a0 + h[3:4] * a1 + h[4:5] * a2,
            h[2:3] * a0 + h[4:5] * a1 + h[5:6] * a2)


# ---------------------------------------------------------------------------
# camera-row gather kernel
# ---------------------------------------------------------------------------

def _gather_kernel(tT_ref, img_ref, out_ref, *, H, W, nb):
    img = img_ref[:]
    onehot_hi, lo_mask = _two_level_onehot(img, H, W, nb)
    T1 = _dot_oh(tT_ref[:], onehot_hi)  # [8W, NB]
    if W == 1:
        out_ref[:] = T1
    else:
        out_ref[:] = sum(T1[w * 8:w * 8 + 8] * lo_mask[w]
                         for w in range(W))


def make_cam_gather(p, h: int | None = None, interpret: bool = False):
    """Row gather ``out[c, n] = tbl[obs_image[n], c]`` for up to 8 columns,
    as one Pallas pass (two-level one-hot, view-major blocks).

    XLA lowers each [N]<-[M] gather to ~5 ms at N = 1.2M on v5e (measured,
    tools/exp_tpu7.py: the 12 gathers of engine.linearize are 59 ms of the
    131 ms LM step); this kernel streams all 8 rows in ~0.3 ms.  ``p`` is a
    view-major FMProblem; returns fn(tbl [M, c<=8]) -> [8, N] f32 (rows c..
    are zero)."""
    if p.vm_pb is None:
        raise ValueError("make_cam_gather requires the view-major layout")
    P, V, M = p.num_points, p.views, p.num_images
    pb = p.vm_pb
    nb = pb * V
    m_pad = max(128, -(-M // 128) * 128)
    H = choose_h(m_pad, row_cost=2.0) if h is None else h
    W = m_pad // H
    w8 = 8 * W
    grid = (P // pb,)
    obs_img = p.obs_image.reshape(1, -1).astype(jnp.int32)

    kernel = functools.partial(_gather_kernel, H=H, W=W, nb=nb)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((w8, H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, nb), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, P * V), jnp.float32),
        interpret=interpret,
    )

    def gather(tbl):
        c = tbl.shape[1]
        tbl_pad = jnp.zeros((m_pad, 8), jnp.float32).at[:M, :c].set(
            tbl.astype(jnp.float32))
        tT = tbl_pad.reshape(H, W, 8).transpose(1, 2, 0).reshape(w8, H)
        with jax.enable_x64(False):
            return call(tT, obs_img)

    return gather


# ---------------------------------------------------------------------------
# matvec kernel
# ---------------------------------------------------------------------------

def _matvec_block(pk, img, hpp, xcT, xg, *, views, g, pb, H, W, passes,
                  g_pad8):
    """One NB-lane sub-block of the matvec body; returns (contrib_c
    [8W, H], contrib_g [g_pad8, 128]) for this block's lanes."""
    f32 = jnp.float32
    off = _offsets(g)
    nb = views * pb

    onehot_hi, lo_mask = _two_level_onehot(img, H, W, nb)

    T1 = _dot_oh(xcT, onehot_hi, passes=passes)         # [8W, NB]
    if W == 1:
        xcr = T1
    else:
        xcr = sum(T1[w * 8:w * 8 + 8] * lo_mask[w] for w in range(W))

    jp, jc, jg, wo = off["Jp"], off["Jc"], off["Jg"], off["W"]
    wxx, wxy, wyy = pk[wo:wo + 1], pk[wo + 1:wo + 2], pk[wo + 2:wo + 3]

    s0 = jnp.sum(pk[jc:jc + 6] * xcr[:6], axis=0, keepdims=True)
    s1 = jnp.sum(pk[jc + 6:jc + 12] * xcr[:6], axis=0, keepdims=True)
    xg_row = xg[0:1, :g]                                # [1, G]
    s0 = s0 + jnp.dot(xg_row, pk[jg:jg + g], preferred_element_type=f32,
                      precision=P_VALUE)
    s1 = s1 + jnp.dot(xg_row, pk[jg + g:jg + 2 * g],
                      preferred_element_type=f32, precision=P_VALUE)
    t0 = wxx * s0 + wxy * s1
    t1 = wxy * s0 + wyy * s1

    jt = pk[jp:jp + 3] * t0 + pk[jp + 3:jp + 6] * t1        # [3, NB]
    y = _view_sum(jt, views, pb)                            # [3, PB]
    z = jnp.concatenate(_hinv_rows(hpp, y[0:1], y[1:2], y[2:3]),
                        axis=0)                              # [3, PB]
    zo = _view_bcast(z, views)                               # [3, NB]

    r0 = jnp.sum(pk[jp:jp + 3] * zo, axis=0, keepdims=True)
    r1 = jnp.sum(pk[jp + 3:jp + 6] * zo, axis=0, keepdims=True)
    tv0 = t0 - (wxx * r0 + wxy * r1)
    tv1 = t1 - (wxy * r0 + wyy * r1)

    qc = pk[jc:jc + 6] * tv0 + pk[jc + 6:jc + 12] * tv1     # [6, NB]
    qc8 = jnp.concatenate([qc, jnp.zeros((2, nb), f32)], axis=0)
    if W == 1:
        contrib_c = _dot_oh(qc8, onehot_hi, contract_last=True,
                            passes=passes)                       # [8, H]
    else:
        B = jnp.concatenate([qc8 * lo_mask[w] for w in range(W)], axis=0)
        contrib_c = _dot_oh(B, onehot_hi, contract_last=True,
                            passes=passes)                       # [8W, H]

    qg = pk[jg:jg + g] * tv0 + pk[jg + g:jg + 2 * g] * tv1  # [G, NB]
    qg = jnp.concatenate([qg, jnp.zeros((g_pad8 - g, nb), f32)], axis=0)
    # VPU lane-fold (exact f32 adds) instead of a [., nb] x [nb, 8] ones
    # dot: the dot streamed nb lanes through the MXU for a 8/128 output
    # tile — as much MXU time as the whole camera scatter (r05)
    contrib_g = jnp.sum(qg.reshape(g_pad8, nb // 128, 128), axis=1)
    return contrib_c, contrib_g


def _matvec_kernel(xcT_ref, xg_ref, packed_ref, img_ref, hpp_ref,
                   outc_ref, outg_ref, *, views, g, pb, H, W,
                   passes=3, bsteps=1):
    """Matvec over the LEAN PREFIX of the packed layout: P-weighted
    products recombined in-kernel via the 2x2 weight rows
    (t = W2 s, u = W2 r) — 40-45%% fewer row reads than consuming the
    precomputed PJ tail.  ``bsteps``: NB-lane sub-blocks per grid step
    (larger steps amortise the per-step grid/DMA overhead)."""
    nb = views * pb
    xcT = xcT_ref[:]                                    # [8W, H]
    xg = xg_ref[:]                                      # [8, G_lane]
    g_pad8 = outg_ref.shape[0]
    acc_c = acc_g = None
    for k in range(bsteps):
        pk = packed_ref[:, k * nb:(k + 1) * nb]
        img = img_ref[:, k * nb:(k + 1) * nb]
        hpp = hpp_ref[:, k * pb:(k + 1) * pb]
        cc, cg = _matvec_block(pk, img, hpp, xcT, xg, views=views, g=g,
                               pb=pb, H=H, W=W, passes=passes,
                               g_pad8=g_pad8)
        acc_c = cc if acc_c is None else acc_c + cc
        acc_g = cg if acc_g is None else acc_g + cg

    @pl.when(pl.program_id(0) == 0)
    def _():
        outc_ref[:] = jnp.zeros_like(outc_ref)
        outg_ref[:] = jnp.zeros_like(outg_ref)

    outc_ref[:] += acc_c
    outg_ref[:] += acc_g


def make_matvec(pp: PackedFM, extra_c, extra_g, pb: int | None = None,
                interpret: bool = False, passes: int = 3,
                bsteps: int = 1):
    """Returns fn(xc [M, 6], xg [G]) -> (S@x)_c [M, 6], (S@x)_g [G].

    ``passes``: bf16 chunk count of the one-hot products (see `_dot_oh`);
    2 trades ~2^-16 relative operator error for one third less MXU work —
    safe for CG (operator, not a cancelling rhs), and the per-step rhs
    and assembly stay 3-pass exact in `prepare_pallas`.
    ``bsteps``: NB-lane sub-blocks per grid step (must divide the block
    count); larger steps amortise per-grid-step overhead."""
    P, V, G = pp.num_points, pp.views, pp.g
    m_pad, H = pp.m_pad, pp.h
    if pb is not None and pb != pp.pb:
        raise ValueError(f"pb={pb} does not match the packed view-major "
                         f"layout (pb={pp.pb})")
    pb = pp.pb
    W = m_pad // H
    nb = pb * V
    if (P // pb) % bsteps:
        raise ValueError(f"bsteps={bsteps} must divide the block count "
                         f"{P // pb}")
    grid = (P // pb // bsteps,)
    g_pad8 = ((G + 7) // 8) * 8
    g_lane = max(128, ((G + 127) // 128) * 128)
    w8 = 8 * W
    fl_pad = _offsets(G)["F_lean_pad"]  # matvec reads the lean prefix only
    # slice ONCE at closure construction (trace time): inside the CG
    # while_loop the slice is not reliably hoisted and would copy the
    # prefix every matvec, cancelling the bandwidth saving
    packed_lean = pp.packed[:fl_pad]

    kernel = functools.partial(_matvec_kernel, views=V, g=G, pb=pb, H=H,
                               W=W, passes=passes, bsteps=bsteps)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((w8, H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, g_lane), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fl_pad, bsteps * nb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bsteps * nb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, bsteps * pb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((w8, H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_pad8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((w8, H), jnp.float32),
            jax.ShapeDtypeStruct((g_pad8, 128), jnp.float32),
        ],
        interpret=interpret,
    )

    def matvec(xc, xg):
        M = xc.shape[0]
        # xcT_resh[w*8+a, h] = xc_pad[h*W + w, a]
        xc_pad = jnp.zeros((m_pad, 8), jnp.float32).at[:M, :6].set(
            xc.astype(jnp.float32))
        xcT = xc_pad.reshape(H, W, 8).transpose(1, 2, 0).reshape(w8, H)
        xg_pad = jnp.zeros((8, g_lane), jnp.float32).at[0, :G].set(
            xg.astype(jnp.float32))
        # Mosaic cannot legalize the i64 grid index maps that
        # jax_enable_x64 produces; the kernel is pure f32/int32 anyway
        with jax.enable_x64(False):
            out_c, out_g = call(xcT, xg_pad, packed_lean,
                                pp.obs_img, pp.hppinv)
        oc = out_c.reshape(W, 8, H).transpose(2, 0, 1).reshape(m_pad, 8)
        oc = oc[:M, :6].astype(xc.dtype) + extra_c * xc
        og = jnp.sum(out_g[:G, :], axis=1).astype(xg.dtype) + extra_g * xg
        return oc, og

    return matvec


def make_read_floor(pp: PackedFM, bsteps: int = 1):
    """Pure-bandwidth floor kernel: stream the lean packed prefix exactly
    as the matvec's BlockSpec does and fold it into an [8, 128] running
    sum seeded from ``xin`` — the HBM speed-of-light reference for the
    matvec's access pattern.  Measured r05 at 100k/500img: ~818 GB/s =
    100%% of the v5e HBM SoL at the same grid granularity, proving the
    matvec is COMPUTE-bound in-kernel, not DMA/grid-bound.

    ``xin`` exists to CHAIN executions: the axon relay elides identical
    queued executions (a fixed-input floor run measured an impossible
    1428 GB/s); feed each call's output into the next.
    Returns fn(xin [8, 128]) -> [8, 128] f32."""
    G = pp.g
    fl_pad = _offsets(G)["F_lean_pad"]
    nb = pp.pb * pp.views
    grid_n = pp.num_points // pp.pb
    if grid_n % bsteps:
        raise ValueError(f"bsteps={bsteps} must divide {grid_n}")
    packed_lean = pp.packed[:fl_pad]
    bnb = bsteps * nb

    def _floor_kernel(xin_ref, pk_ref, out_ref):
        pk = pk_ref[:]
        s = jnp.sum(pk.reshape(fl_pad, bnb // 128, 128), axis=1)
        contrib = jnp.zeros((8, 128), jnp.float32)
        for r in range(0, fl_pad, 8):
            contrib = contrib + s[r:r + 8]

        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = 1e-30 * xin_ref[:]

        out_ref[:] += contrib

    call = pl.pallas_call(
        _floor_kernel,
        grid=(grid_n // bsteps,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fl_pad, bnb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )

    def run(xin):
        with jax.enable_x64(False):
            return call(xin.astype(jnp.float32), packed_lean)

    return run


# ---------------------------------------------------------------------------
# fused assembly (prepare) kernel
# ---------------------------------------------------------------------------

def _prepare_kernel(packed_ref, img_ref, hpp_ref,
                    red_ref, rgq_ref, t2_ref, t3_ref, *, views, g,
                    pb, H, W, f99_pad, t2_pad, t3_pad, ps):
    """Fused per-image reduction of engine.prepare's 39 + 6G feature rows.

    Replaces the XLA path's [N, 39 + 6G] stack + image-order row gather +
    blocked cumsum (3 full-stack HBM round trips) with one pass: the packed
    [F, N] rows are read once per block, the feature products live in VMEM,
    and the per-image accumulation uses the factored one-hot of
    `_matvec_kernel` (red column m' = w*H + h, unscrambled on the host).
    Also accumulates the global-side pieces: the rhs correction sum_n Jg u0
    (rgq), T2 = Jg PJg^T and T3 = W Hpg^T for Sgg.  Row order matches
    engine.prepare exactly; engine.finish_reduction turns the outputs into
    (rc, rg, Precond).

    ``ps``: point sub-slice per inner step.  This kernel's live temps
    (the ~104 feature rows + the stacked one-hot products) scale with the
    lane count, and the VIEW-MAJOR layout is shared with the matvec,
    whose VMEM-optimal block is pb=1024 (r05 exp_mv5) — 56 MB of scoped
    VMEM here (measured AOT OOM).  Sub-slicing point ranges inside the
    block (lanes v*pb + [s*ps, (s+1)*ps) re-concatenated per view) keeps
    this kernel's temps at ps-scale for any pb."""
    f32 = jnp.float32

    @pl.when(pl.program_id(0) == 0)
    def _():
        red_ref[:] = jnp.zeros_like(red_ref)
        rgq_ref[:] = jnp.zeros_like(rgq_ref)
        t2_ref[:] = jnp.zeros_like(t2_ref)
        t3_ref[:] = jnp.zeros_like(t3_ref)

    for s_i in range(pb // ps):
        if ps == pb:
            pk_s = packed_ref[:]
            img_s = img_ref[:]
            h_s = hpp_ref[:]
        else:
            pk_s = jnp.concatenate(
                [packed_ref[:, v * pb + s_i * ps:v * pb + (s_i + 1) * ps]
                 for v in range(views)], axis=1)
            img_s = jnp.concatenate(
                [img_ref[:, v * pb + s_i * ps:v * pb + (s_i + 1) * ps]
                 for v in range(views)], axis=1)
            h_s = hpp_ref[:, s_i * ps:(s_i + 1) * ps]
        _prepare_sub(pk_s, img_s, h_s, red_ref, rgq_ref, t2_ref, t3_ref,
                     views=views, g=g, pb=ps, H=H, W=W, f99_pad=f99_pad,
                     t2_pad=t2_pad, t3_pad=t3_pad)


def _prepare_sub(pk, img, h, red_ref, rgq_ref, t2_ref, t3_ref, *, views,
                 g, pb, H, W, f99_pad, t2_pad, t3_pad):
    """One ps-point sub-slice of the fused reduction (see
    `_prepare_kernel`); accumulates into the four output refs."""
    f32 = jnp.float32
    off = _offsets(g, with_pw=True)
    nb = views * pb

    onehot_hi, lo_mask = _two_level_onehot(img, H, W, nb)

    jp, pjp = off["Jp"], off["PJp"]
    jc, pjc = off["Jc"], off["PJc"]
    jg, pjg = off["Jg"], off["PJg"]
    pw = off["Pw"]
    Pw0, Pw1 = pk[pw:pw + 1], pk[pw + 1:pw + 2]     # [1, NB]

    # bp -> z0 -> u0 (rhs Schur correction chain)
    jt = pk[jp:jp + 3] * Pw0 + pk[jp + 3:jp + 6] * Pw1       # [3, NB]
    bp = _view_sum(jt, views, pb)                            # [3, PB]
    z = jnp.concatenate(_hinv_rows(h, bp[0:1], bp[1:2], bp[2:3]), axis=0)
    zo = _view_bcast(z, views)                               # [3, NB]
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
    hio = _view_bcast(h[0:6], views)                 # [6, NB]
    for e in range(6):
        he = _hinv_rows(hio, hp[0][e], hp[1][e], hp[2][e])
        for f in range(e, 6):
            jpj = row(jc, e) * row(pjc, f) + row(jc, 6 + e) * row(pjc, 6 + f)
            corr = sum(he[a] * hp[a][f] for a in range(3))
            rows.append(jpj - corr)

    # Hpg per point and W = Hpp^{-1} Hpg (row index a*G+g, as engine.WM)
    hpg_obs = jnp.concatenate(
        [row(jp, a) * row(pjg, gg) + row(jp, 3 + a) * row(pjg, g + gg)
         for a in range(3) for gg in range(g)], axis=0)      # [3G, NB]
    hpg_blk = _view_sum(hpg_obs, views, pb)                  # [3G, PB]
    Wrows = [_hinv_rows(h, hpg_blk[0 * g + gg:0 * g + gg + 1],
                        hpg_blk[1 * g + gg:1 * g + gg + 1],
                        hpg_blk[2 * g + gg:2 * g + gg + 1])
             for gg in range(g)]
    W_blk = jnp.concatenate(
        [Wrows[gg][a] for a in range(3) for gg in range(g)], axis=0)
    Wobs = _view_bcast(W_blk, views)                         # [3G, NB]

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

    # two-level scatter: red[:, w*H:(w+1)*H] += (feat * lo_w) @ onehot_hi^T
    if W == 1:
        red_ref[:] += _dot_oh(feat, onehot_hi, contract_last=True)
    else:
        for w in range(W):
            contrib = _dot_oh(feat * lo_mask[w], onehot_hi,
                              contract_last=True)            # [F99p, H]
            red_ref[:, w * H:(w + 1) * H] += contrib

    # global rhs correction rows: sum_n Jg u0 (VPU lane-fold, exact f32)
    qg = pk[jg:jg + g] * u0 + pk[jg + g:jg + 2 * g] * u1     # [G, NB]
    g_pad8 = rgq_ref.shape[0]
    qg = jnp.concatenate([qg, jnp.zeros((g_pad8 - g, nb), f32)], axis=0)
    rgq_ref[:] += jnp.sum(qg.reshape(g_pad8, nb // 128, 128), axis=1)

    # T2 = Jg @ PJg^T over this block's lanes
    A2 = jnp.concatenate(
        [pk[jg:jg + 2 * g], jnp.zeros((t2_pad - 2 * g, nb), f32)])
    B2 = jnp.concatenate(
        [pk[pjg:pjg + 2 * g], jnp.zeros((t2_pad - 2 * g, nb), f32)])
    t2_ref[:] += jax.lax.dot_general(
        A2, B2, (((1,), (1,)), ((), ())), preferred_element_type=f32,
        precision=P_VALUE)

    # T3 = W @ Hpg^T over this block's points
    A3 = jnp.concatenate(
        [W_blk, jnp.zeros((t3_pad - 3 * g, pb), f32)])
    B3 = jnp.concatenate(
        [hpg_blk, jnp.zeros((t3_pad - 3 * g, pb), f32)])
    t3_ref[:] += jax.lax.dot_general(
        A3, B3, (((1,), (1,)), ((), ())), preferred_element_type=f32,
        precision=P_VALUE)


def make_prepare_reduction(pp: PackedFM, h: int | None = None,
                           interpret: bool = False, ps: int | None = None):
    """Returns fn() -> (red [M, 39+6G], rg_corr [G], T2 [2G, 2G],
    T3 [3G, 3G]) computed from the packed rows (pack_fm with_pw=True).
    ``ps``: point sub-slice per inner kernel step (default min(pb, 256)
    — the reduction's VMEM-live temps scale with ps, not with the
    matvec-optimal pb of the shared view-major layout)."""
    P, V, G = pp.num_points, pp.views, pp.g
    m_pad, pb = pp.m_pad, pp.pb
    if ps is None:
        ps = min(pb, 256)
    if pb % ps:
        raise ValueError(f"ps={ps} must divide pb={pb}")
    # h_max=256: the [H, nb] one-hot shares VMEM with the ~104 feature rows
    # and the [F99, m_pad] resident output
    H = choose_h(m_pad, row_cost=13.0, h_max=256) if h is None else h
    W = m_pad // H
    nb = pb * V
    grid = (P // pb,)
    F99 = 39 + 6 * G
    f99_pad = ((F99 + 7) // 8) * 8
    g_pad8 = ((G + 7) // 8) * 8
    t2_pad = ((2 * G + 7) // 8) * 8
    t3_pad = ((3 * G + 7) // 8) * 8

    kernel = functools.partial(
        _prepare_kernel, views=V, g=G, pb=pb, H=H, W=W,
        f99_pad=f99_pad, t2_pad=t2_pad, t3_pad=t3_pad, ps=ps)
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
            pl.BlockSpec((f99_pad, m_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_pad8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t2_pad, t2_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t3_pad, t3_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((f99_pad, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((g_pad8, 128), jnp.float32),
            jax.ShapeDtypeStruct((t2_pad, t2_pad), jnp.float32),
            jax.ShapeDtypeStruct((t3_pad, t3_pad), jnp.float32),
        ],
        interpret=interpret,
    )

    M = pp.num_images

    def run():
        with jax.enable_x64(False):
            red, rgq, T2, T3 = call(pp.packed, pp.obs_img, pp.hppinv)
        # red columns are m' = w*H + hcol; unscramble to m = hcol*W + w
        red = red.reshape(f99_pad, W, H).transpose(2, 1, 0).reshape(
            m_pad, f99_pad)
        return (red[:M, :F99], jnp.sum(rgq[:G, :], axis=1),
                T2[:2 * G, :2 * G],
                T3[:3 * G, :3 * G])

    return run


def prepare_pallas(p, state, spec, damping, couple_global: bool = True,
                   pb: int | None = None, interpret: bool = False,
                   state_lo=None, cam_gather=None):
    """Drop-in replacement for engine.prepare on the TPU f32 path: linearise
    (XLA), pack once, run the fused assembly kernel, finish in XLA.  Returns
    (blocks, rc, rg, Precond, PackedFM) — the PackedFM is reusable by
    `make_matvec`, so the LM step packs exactly once.  ``p`` must be
    view-major (engine.to_view_major)."""
    from . import engine

    b = engine.linearize(p, state, spec, damping, state_lo=state_lo,
                         cam_gather=cam_gather)
    pp = pack_fm(b, p, with_pw=True)
    red, rg_corr, T2, T3 = make_prepare_reduction(pp, interpret=interpret)()
    out = engine.finish_reduction(p, b, state, damping, red, rg_corr,
                                  T2, T3, couple_global)
    return (*out, pp)
