"""Free-network datum, scale bars and direct observations at scale.

The dense parity solver handles scale-bar rows
(PartialDerivativeFactory.java:210-283), directly observed parameters
(:447-473) and the Helmert inner-constraint rows of the free-network datum
(BundleAdjustment.java:493-635) inside one bordered normal-equation matrix.
At 100k..1M points that matrix cannot exist; this module folds all three
into the point-eliminated reduced camera system (parallel/rcs.py,
parallel/engine.py) *exactly*, without breaking the block-diagonal point
elimination:

* **Scale bars** add rank-1 rows u_s over two points.  With
  Hpp' = Hpp + U^T W U, Woodbury gives

      S' = Hxx - Hxp Hpp'^{-1} Hpx = S_base + Z Cap^{-1} Z^T,
      Z = Hxp (Hpp^{-1} U^T),  Cap = W^{-1} + U Hpp^{-1} U^T,

  i.e. an exact rank-S dense correction to the implicit Schur matvec —
  the per-chip kernels stay block-diagonal.

* **Inner constraints** (rows B over datum-point coordinates, normalised
  exactly as addDatumConditionRows) enter as KKT multipliers; eliminating
  points and then the multipliers yields

      (S' + Y Bb^{-1} Y^T) dx = r' + Y Bb^{-1} r_lam,
      Y = Hxp Hpp'^{-1} B^T,  Bb = B Hpp'^{-1} B^T,

  another exact rank-d (d <= 7) correction.  lambda and the point step are
  recovered afterwards; B dx = 0 holds like in the reference's bordered
  solve.

* **Direct observations** with diagonal weights are added natively into the
  block-diagonal structures by the linearisers (points -> Hpp/bp,
  EO -> extra_c/bc, IO/distortion -> extra_g/bg) before any elimination.

The corrections are computed against three layout-agnostic closures
(`PointOps`), so the block-layout rcs path and the feature-major engine
share this code.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

# TPU f32 matmuls default to a single bf16 MXU pass; the big over-points
# contractions here pin full f32 precision.
_PREC = jax.lax.Precision.HIGHEST


class PointOps(NamedTuple):
    """Layout-agnostic operations on the linearised problem.

    hinv(v [P,3]) -> [P,3]        block-diagonal Hpp^{-1} v
    hinv_at(idx [k]) -> [k,3,3]   gathered Hpp^{-1} blocks
    hxp(v [P,3]) -> (c [M,6], g [G])   Hxp v (cams+globals rows)
    hpx(xc, xg) -> [P,3]          Hpx [xc; xg]
    """

    hinv: Callable
    hinv_at: Callable
    hxp: Callable
    hpx: Callable


class Extras(NamedTuple):
    """Per-linearisation correction data (all device arrays)."""

    bp_full: jnp.ndarray          # [P, 3] rhs incl. scale-bar terms
    rc: jnp.ndarray               # corrected reduced rhs (cams)
    rg: jnp.ndarray               # corrected reduced rhs (globals)
    # scale bars (R = number of bars; None-like zero shapes when absent)
    u_idx: jnp.ndarray | None     # [R, 2] endpoint point ids
    u_val: jnp.ndarray | None     # [R, 2, 3] row values (+-unit vectors)
    v_val: jnp.ndarray | None     # [R, 2, 3] Hpp^{-1}-applied rows
    w_s: jnp.ndarray | None       # [R] weights
    w_sb: jnp.ndarray | None      # [R] misclosures
    Zc: jnp.ndarray | None        # [R, M, 6]
    Zg: jnp.ndarray | None        # [R, G]
    Cap_inv: jnp.ndarray | None   # [R, R]
    # inner constraints (d rows)
    Brows: jnp.ndarray | None     # [d, P, 3]
    Yc: jnp.ndarray | None        # [d, M, 6]
    Yg: jnp.ndarray | None        # [d, G]
    Bb_inv: jnp.ndarray | None    # [d, d]
    r_lam: jnp.ndarray | None     # [d]
    omega0: jnp.ndarray = None    # omega at linearisation incl. extras


def datum_rows_dense(points, datum_mask, defect_flags):
    """Helmert inner-constraint rows as dense [d, P, 3] point-space vectors,
    normalised per row (addDatumConditionRows, BundleAdjustment.java:493-635;
    identical maths to ops/assembly._datum_rows without the column map)."""
    dtype = points.dtype
    m = datum_mask.astype(dtype)
    cnt = jnp.sum(m)
    cx = jnp.sum(points[:, 0] * m) / cnt
    cy = jnp.sum(points[:, 1] * m) / cnt
    cz = jnp.sum(points[:, 2] * m) / cnt
    x = (points[:, 0] - cx) * m
    y = (points[:, 1] - cy) * m
    z = (points[:, 2] - cz) * m
    zero = jnp.zeros_like(x)

    tx, ty, tz, rx, ry, rz, s = defect_flags
    rows = []
    if tx:
        rows.append(jnp.stack([m, zero, zero], axis=1))
    if ty:
        rows.append(jnp.stack([zero, m, zero], axis=1))
    if tz:
        rows.append(jnp.stack([zero, zero, m], axis=1))
    if rx:
        rows.append(jnp.stack([zero, z, -y], axis=1))
    if ry:
        rows.append(jnp.stack([-z, zero, x], axis=1))
    if rz:
        rows.append(jnp.stack([y, -x, zero], axis=1))
    if s:
        rows.append(jnp.stack([x, y, z], axis=1))
    if not rows:
        return None
    B = jnp.stack(rows)  # [d, P, 3]
    norms = jnp.sqrt(jnp.sum(B * B, axis=(1, 2)))
    return B / norms[:, None, None]


def _num_defects(defect_flags) -> int:
    return sum(1 for f in defect_flags if f)


def prepare_extras(problem, state, bp, rc, rg, ops: PointOps, omega0):
    """Build the exact low-rank corrections for the current linearisation.

    ``problem`` needs: sb_a/sb_b/sb_length/sb_weight (or None),
    datum_mask_d/defect_flags_d (or None), free_point.
    ``bp`` is the base reduced-point rhs [P, 3]; ``rc``/``rg`` the base
    reduced rhs; ``omega0`` the base Omega at the linearisation point.
    """
    p = problem
    P = p.num_points
    dtype = bp.dtype

    has_bars = getattr(p, "sb_a", None) is not None and p.sb_a.shape[0] > 0
    flags = getattr(p, "defect_flags_d", None)
    d = _num_defects(flags) if flags is not None else 0

    u_idx = u_val = v_val = w_s = w_sb = Zc = Zg = Cap_inv = None
    Brows = Yc = Yg = Bb_inv = r_lam = None
    bp_full = bp

    if has_bars:
        pa = state.points[p.sb_a]
        pb = state.points[p.sb_b]
        dvec = pb - pa
        dist = jnp.sqrt(jnp.sum(dvec * dvec, axis=1))
        unit = dvec / dist[:, None]
        fa = p.free_point[p.sb_a]
        fb = p.free_point[p.sb_b]
        u_val = jnp.stack([-unit * fa, unit * fb], axis=1)  # [R, 2, 3]
        u_idx = jnp.stack([p.sb_a, p.sb_b], axis=1)         # [R, 2]
        w_s = p.sb_weight.astype(dtype)
        w_sb = (p.sb_length - dist).astype(dtype)

        # rhs contribution U^T W w_sb into bp
        coef = (w_s * w_sb)[:, None]
        delta = jnp.zeros((P, 3), dtype)
        delta = delta.at[p.sb_a].add(u_val[:, 0] * coef)
        delta = delta.at[p.sb_b].add(u_val[:, 1] * coef)
        bp_full = bp + delta

        # V = Hpp^{-1}-applied rows (same sparsity)
        Hinv_a = ops.hinv_at(p.sb_a)
        Hinv_b = ops.hinv_at(p.sb_b)
        v_val = jnp.stack([
            jnp.einsum("rab,rb->ra", Hinv_a, u_val[:, 0]),
            jnp.einsum("rab,rb->ra", Hinv_b, u_val[:, 1]),
        ], axis=1)

        # Cap = W^{-1} + U Hpp^{-1} U^T (rows share points -> [R,2,R,2] match)
        match = (u_idx[:, :, None, None] == u_idx[None, None, :, :])
        dots = jnp.einsum("rlc,qmc->rlqm", u_val, v_val)
        gram = jnp.sum(jnp.where(match, dots, 0.0), axis=(1, 3))
        Cap = jnp.diag(1.0 / w_s) + gram
        Cap_inv = jnp.linalg.inv(Cap)

        # Z = Hxp (Hpp^{-1} U^T): one batched pass over observations
        def scatter_rows(idx, val):
            return jnp.zeros((P, 3), dtype).at[idx].add(val)

        Vrows = jax.vmap(scatter_rows)(u_idx, v_val)       # [R, P, 3]
        Zc, Zg = jax.vmap(ops.hxp)(Vrows)                  # [R, M, 6], [R, G]

        # misclosure omega contribution: w^T P w of the bar rows
        omega0 = omega0 + jnp.sum(w_s * w_sb * w_sb)

    if d > 0:
        Brows = datum_rows_dense(state.points, p.datum_mask_d, flags)
        Vb = jax.vmap(ops.hinv)(Brows)                      # [d, P, 3]
        Ybc, Ybg = jax.vmap(ops.hxp)(Vb)                    # [d, M, 6], [d, G]
        BB = jnp.einsum("kpa,qpa->kq", Brows, Vb,
                        precision=_PREC)                    # B Hpp^{-1} B^T

        if has_bars:
            # Xub[r, k] = U_r Hpp^{-1} B_k^T
            Vb_at_a = Vb[:, p.sb_a, :]                      # [d, R, 3]
            Vb_at_b = Vb[:, p.sb_b, :]
            Xub = (jnp.einsum("rc,krc->rk", u_val[:, 0], Vb_at_a)
                   + jnp.einsum("rc,krc->rk", u_val[:, 1], Vb_at_b))
            CX = Cap_inv @ Xub                              # [R, d]
            Yc = Ybc - jnp.einsum("rk,rmc->kmc", CX, Zc)
            Yg = Ybg - jnp.einsum("rk,rg->kg", CX, Zg)
            Bb = BB - Xub.T @ CX
        else:
            Yc, Yg = Ybc, Ybg
            Bb = BB
        Bb_inv = jnp.linalg.inv(Bb)

    # ---- corrected reduced rhs ----------------------------------------
    if has_bars:
        # r' = r_base(bp_full) + Z Cap^{-1} (U Hpp^{-1} bp_full)
        dz = ops.hinv(bp_full - bp)
        dc, dg = ops.hxp(dz)
        rc = rc - dc
        rg = rg - dg
        z0f = ops.hinv(bp_full)
        hb = (jnp.einsum("rc,rc->r", u_val[:, 0], z0f[p.sb_a])
              + jnp.einsum("rc,rc->r", u_val[:, 1], z0f[p.sb_b]))
        ch = Cap_inv @ hb
        rc = rc + jnp.einsum("rmc,r->mc", Zc, ch)
        rg = rg + jnp.einsum("rg,r->g", Zg, ch)
    else:
        z0f = None

    if d > 0:
        if z0f is None:
            z0f = ops.hinv(bp_full)
        r_lam = jnp.einsum("kpa,pa->k", Brows, z0f, precision=_PREC)
        if has_bars:
            r_lam = r_lam - Xub.T @ (Cap_inv @ hb)
        br = Bb_inv @ r_lam
        rc = rc + jnp.einsum("kmc,k->mc", Yc, br)
        rg = rg + jnp.einsum("kg,k->g", Yg, br)

    return Extras(bp_full=bp_full, rc=rc, rg=rg,
                  u_idx=u_idx, u_val=u_val, v_val=v_val, w_s=w_s, w_sb=w_sb,
                  Zc=Zc, Zg=Zg, Cap_inv=Cap_inv,
                  Brows=Brows, Yc=Yc, Yg=Yg, Bb_inv=Bb_inv, r_lam=r_lam,
                  omega0=omega0)


def wrap_matvec(base_matvec, ext: Extras):
    """S_tot @ x = S_base @ x + Z Cap^{-1} Z^T x + Y Bb^{-1} Y^T x."""
    def matvec(xc, xg):
        oc, og = base_matvec(xc, xg)
        if ext.Zc is not None:
            zt = (jnp.einsum("rmc,mc->r", ext.Zc, xc)
                  + jnp.einsum("rg,g->r", ext.Zg, xg))
            cz = ext.Cap_inv @ zt
            oc = oc + jnp.einsum("rmc,r->mc", ext.Zc, cz)
            og = og + jnp.einsum("rg,r->g", ext.Zg, cz)
        if ext.Yc is not None:
            yt = (jnp.einsum("kmc,mc->k", ext.Yc, xc)
                  + jnp.einsum("kg,g->k", ext.Yg, xg))
            by = ext.Bb_inv @ yt
            oc = oc + jnp.einsum("kmc,k->mc", ext.Yc, by)
            og = og + jnp.einsum("kg,k->g", ext.Yg, by)
        return oc, og

    return matvec


def back_substitute(problem, ext: Extras, ops: PointOps, xc, xg):
    """Recover (dx_p [P,3], lambda [d]) after the reduced solve."""
    p = problem
    lam = None
    y = ext.bp_full - ops.hpx(xc, xg)
    if ext.Yc is not None:
        yt = (jnp.einsum("kmc,mc->k", ext.Yc, xc)
              + jnp.einsum("kg,g->k", ext.Yg, xg))
        lam = ext.Bb_inv @ (ext.r_lam - yt)
        y = y - jnp.einsum("kpa,k->pa", ext.Brows, lam)
    z = ops.hinv(y)
    if ext.Zc is not None:
        q = (jnp.einsum("rc,rc->r", ext.u_val[:, 0], z[p.sb_a])
             + jnp.einsum("rc,rc->r", ext.u_val[:, 1], z[p.sb_b]))
        s = ext.Cap_inv @ q
        z = z.at[p.sb_a].add(-ext.v_val[:, 0] * s[:, None])
        z = z.at[p.sb_b].add(-ext.v_val[:, 1] * s[:, None])
    return z, lam


def omega_extras(problem, ext: Extras, dxp):
    """Scale-bar contribution to Omega(dx) at the linearisation point
    (getOmega semantics: v = w - A dx)."""
    if ext.u_val is None:
        return 0.0
    p = problem
    adx = (jnp.einsum("rc,rc->r", ext.u_val[:, 0], dxp[p.sb_a])
           + jnp.einsum("rc,rc->r", ext.u_val[:, 1], dxp[p.sb_b]))
    v = ext.w_sb - adx
    return jnp.sum(ext.w_s * v * v)
