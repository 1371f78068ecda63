"""Posterior covariance blocks on demand at scale.

At 100k..1M points the full dispersion Qxx is O((3P)^2) dense and cannot be
materialised (survey hard-part 5).  With the point-eliminated factorisation
(parallel/rcs.py), selected blocks are recovered exactly:

    Q_cam       = S^{-1}                       (reduced camera system)
    Qpp[p]      = Hpp^{-1}[p] + C_p^T S^{-1} C_p
    Qpp[p, q]   =              C_p^T S^{-1} C_q        (cross-point block)
    C_p         = Hxp[:, p] Hpp^{-1}[p]   in R^{(6M+G) x 3}

C_p has nonzero camera rows only for images observing p; S^{-1} C_p is
computed matrix-free by batched PCG on the implicit reduced system — no
S materialisation, no Qxx materialisation.  This is the scalable analogue of
the reference's REDUCED-mode covariance recovery
(BundleAdjustment.java:255-298, survey F6/F12).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import rcs


@rcs._hi_prec
def _coupling_columns(problem: rcs.RCSProblem, blocks: rcs.Blocks, point_ids):
    """C[k] = Hxp[:, p_k] Hpp^{-1}[p_k] for the selected points, dense over
    the reduced axis: returns (Cc [k, M, 6, 3], Cg [k, G, 3])."""
    p = problem
    k = point_ids.shape[0]
    M = p.num_images
    G = blocks.Jg.shape[2]

    # per-observation coupling blocks
    Hcp = jnp.einsum("nia,nib->nab", blocks.Jc, blocks.PJp)  # [N, 6, 3]
    Hgp = jnp.einsum("nia,nib->nab", blocks.Jg, blocks.PJp)  # [N, G, 3]

    # select observations of the requested points: mask approach (k small)
    # sel[n, j] = 1 if obs n belongs to point_ids[j]
    sel = (p.obs_point[:, None] == point_ids[None, :]).astype(blocks.Jp.dtype)

    # camera rows: Cc[j, m] = sum_{n: img=m, pt=p_j} Hcp[n]
    contrib = Hcp[:, None, :, :] * sel[:, :, None, None]  # [N, k, 6, 3]
    Cc = rcs._seg_image(p, contrib.reshape(contrib.shape[0], -1))
    Cc = Cc.reshape(M, k, 6, 3).transpose(1, 0, 2, 3)  # [k, M, 6, 3]

    Cg = jnp.einsum("nab,nj->jab", Hgp, sel)  # [k, G, 3]

    Hinv = blocks.Hpp_inv[point_ids]  # [k, 3, 3]
    Cc = jnp.einsum("kmab,kbc->kmac", Cc, Hinv)
    Cg = jnp.einsum("kab,kbc->kac", Cg, Hinv)
    return Cc, Cg


@rcs._hi_prec
def _pcg_multi(problem, blocks, Rc, Rg, Minv, tol=1e-8, maxiter=400):
    """Batched PCG: solve S X = R for R rhs simultaneously.

    Rc [R, M, 6], Rg [R, G]; each rhs runs an independent CG (per-rhs alpha/
    beta) — vectorised with a batched implicit matvec.  ``Minv`` is a
    `rcs.Precond` (camera + global blocks) or a bare [M, 6, 6] array."""

    def matvec(xc, xg):
        return jax.vmap(lambda c, g: rcs.schur_matvec(problem, blocks, c, g))(xc, xg)

    if isinstance(Minv, rcs.Precond) and Minv.Scg is not None:
        def apply_M(rc_, rg_):
            u = jnp.einsum("mab,rmb->rma", Minv.Minv_c, rc_)
            zg = jnp.einsum(
                "gh,rh->rg", Minv.Sghat_inv,
                rg_ - jnp.einsum("mag,rma->rg", Minv.Scg, u))
            zc = u - jnp.einsum("mag,rg->rma", Minv.W, zg)
            return zc, zg
    elif isinstance(Minv, rcs.Precond):
        def apply_M(rc_, rg_):
            return (jnp.einsum("mab,rmb->rma", Minv.Minv_c, rc_),
                    jnp.einsum("gh,rh->rg", Minv.Minv_g, rg_))
    else:
        def apply_M(rc_, rg_):
            return jnp.einsum("mab,rmb->rma", Minv, rc_), rg_

    def dot(ac, ag, bc, bg):  # per-rhs inner products [R]
        return (jnp.sum(ac * bc, axis=(1, 2)) + jnp.sum(ag * bg, axis=1))

    xc = jnp.zeros_like(Rc)
    xg = jnp.zeros_like(Rg)
    rc, rg = Rc, Rg
    zc, zg = apply_M(rc, rg)
    pc, pg = zc, zg
    rz = dot(rc, rg, zc, zg)
    r0 = jnp.sqrt(dot(rc, rg, rc, rg))

    def cond(carry):
        xc, xg, rc, rg, pc, pg, rz, it = carry
        rn = jnp.sqrt(dot(rc, rg, rc, rg))
        return jnp.logical_and(it < maxiter,
                               jnp.any(rn > tol * (1.0 + r0)))

    def body(carry):
        xc, xg, rc, rg, pc, pg, rz, it = carry
        qc, qg = matvec(pc, pg)
        denom = dot(pc, pg, qc, qg)
        alpha = jnp.where(denom != 0, rz / denom, 0.0)
        xc = xc + alpha[:, None, None] * pc
        xg = xg + alpha[:, None] * pg
        rc = rc - alpha[:, None, None] * qc
        rg = rg - alpha[:, None] * qg
        zc, zg = apply_M(rc, rg)
        rz_new = dot(rc, rg, zc, zg)
        beta = jnp.where(rz != 0, rz_new / rz, 0.0)
        pc = zc + beta[:, None, None] * pc
        pg = zg + beta[:, None] * pg
        return xc, xg, rc, rg, pc, pg, rz_new, it + 1

    xc, xg, *_ = jax.lax.while_loop(
        cond, body, (xc, xg, rc, rg, pc, pg, rz, jnp.zeros((), jnp.int32)))
    return xc, xg


@rcs._hi_prec
def point_covariance_blocks(problem: rcs.RCSProblem, blocks: rcs.Blocks,
                            point_ids, tol=1e-8, maxiter=400):
    """Exact 3x3 posterior cofactor blocks of the selected points.

    Returns Q [k, 3, 3] (unscaled cofactor; multiply by the a-posteriori
    variance of unit weight for the dispersion)."""
    point_ids = jnp.asarray(point_ids)
    Minv = rcs.Precond(
        Minv_c=rcs.camera_block_preconditioner(problem, blocks),
        Minv_g=rcs.global_block_preconditioner(problem, blocks))
    Minv = rcs.couple_preconditioner(
        lambda c, g: rcs.schur_matvec(problem, blocks, c, g), Minv,
        problem.num_images, blocks.Jg.shape[2], blocks.Jp.dtype)
    Cc, Cg = _coupling_columns(problem, blocks, point_ids)  # [k,M,6,3],[k,G,3]
    k = Cc.shape[0]

    # 3 rhs per point -> batch axis R = 3k
    Rc = Cc.transpose(0, 3, 1, 2).reshape(3 * k, Cc.shape[1], 6)
    Rg = Cg.transpose(0, 2, 1).reshape(3 * k, Cg.shape[1])
    Xc, Xg = _pcg_multi(problem, blocks, Rc, Rg, Minv, tol=tol, maxiter=maxiter)
    Xc = Xc.reshape(k, 3, -1, 6).transpose(0, 2, 3, 1)  # [k, M, 6, 3]
    Xg = Xg.reshape(k, 3, -1).transpose(0, 2, 1)  # [k, G, 3]

    corr = (jnp.einsum("kmab,kmac->kbc", Cc, Xc)
            + jnp.einsum("kab,kac->kbc", Cg, Xg))
    return blocks.Hpp_inv[point_ids] + corr


@rcs._hi_prec
def point_pair_covariance_blocks(problem: rcs.RCSProblem, blocks: rcs.Blocks,
                                 pairs, tol=1e-8, maxiter=400):
    """Exact 3x3 cross-point posterior cofactor blocks Q[p, q] for the given
    (p, q) index pairs: Q[p, q] = C_p^T S^{-1} C_q (p != q; Hpp is block
    diagonal so there is no direct term) — the off-diagonal dispersion
    structure that is the library's raison d'etre (README.md:11-25), here
    recovered matrix-free at scale.  Returns [k, 3, 3]."""
    pairs = np.asarray(pairs)
    ids_p = jnp.asarray(pairs[:, 0])
    ids_q = jnp.asarray(pairs[:, 1])
    Minv = rcs.Precond(
        Minv_c=rcs.camera_block_preconditioner(problem, blocks),
        Minv_g=rcs.global_block_preconditioner(problem, blocks))
    Minv = rcs.couple_preconditioner(
        lambda c, g: rcs.schur_matvec(problem, blocks, c, g), Minv,
        problem.num_images, blocks.Jg.shape[2], blocks.Jp.dtype)
    Cp_c, Cp_g = _coupling_columns(problem, blocks, ids_p)
    Cq_c, Cq_g = _coupling_columns(problem, blocks, ids_q)
    k = pairs.shape[0]
    Rc = Cq_c.transpose(0, 3, 1, 2).reshape(3 * k, Cq_c.shape[1], 6)
    Rg = Cq_g.transpose(0, 2, 1).reshape(3 * k, Cq_g.shape[1])
    Xc, Xg = _pcg_multi(problem, blocks, Rc, Rg, Minv, tol=tol, maxiter=maxiter)
    Xc = Xc.reshape(k, 3, -1, 6).transpose(0, 2, 3, 1)  # [k, M, 6, 3]
    Xg = Xg.reshape(k, 3, -1).transpose(0, 2, 1)        # [k, G, 3]
    return (jnp.einsum("kmab,kmac->kbc", Cp_c, Xc)
            + jnp.einsum("kab,kac->kbc", Cp_g, Xg))


@rcs._hi_prec
def camera_covariance_blocks(problem: rcs.RCSProblem, blocks: rcs.Blocks,
                             image_ids, tol=1e-8, maxiter=400):
    """Exact 6x6 posterior cofactor blocks of selected images' EO:
    rows of S^{-1} restricted to the image's 6 columns."""
    image_ids = np.asarray(image_ids)
    Minv = rcs.Precond(
        Minv_c=rcs.camera_block_preconditioner(problem, blocks),
        Minv_g=rcs.global_block_preconditioner(problem, blocks))
    Minv = rcs.couple_preconditioner(
        lambda c, g: rcs.schur_matvec(problem, blocks, c, g), Minv,
        problem.num_images, blocks.Jg.shape[2], blocks.Jp.dtype)
    k = image_ids.shape[0]
    M = problem.num_images
    G = blocks.Jg.shape[2]
    dtype = blocks.Jp.dtype

    # unit rhs per (image, component)
    Rc = np.zeros((6 * k, M, 6), np.float64)
    for j, m in enumerate(image_ids):
        for a in range(6):
            Rc[6 * j + a, m, a] = 1.0
    Rc = jnp.asarray(Rc, dtype)
    Rg = jnp.zeros((6 * k, G), dtype)
    Xc, Xg = _pcg_multi(problem, blocks, Rc, Rg, Minv, tol=tol, maxiter=maxiter)
    # gather each image's own 6x6 diagonal block directly ([k, 6, 6]) —
    # never materialise the [k, 6, k, 6] cross product
    ids = jnp.asarray(image_ids)
    return Xc.reshape(k, 6, M, 6)[jnp.arange(k), :, ids, :]
