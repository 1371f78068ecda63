"""Collinearity equations: projection and closed-form partials.

Re-derivation of the reference's CollinearityEquationFactory
(`derivation/PartialDerivativeFactory.java:58-195`).  The production Jacobian
path uses JAX autodiff over :func:`project` (mathematically identical — the
reference's chain rule is exactly forward-mode AD of this model); the closed
forms here are kept as the correctness oracle and as an optional fast path.

All functions are scalar-observation; batch with ``jax.vmap``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .rotation import rotation_wpk


class Projection(NamedTuple):
    xs: jnp.ndarray  # projected image x (before principal point / distortion)
    ys: jnp.ndarray
    N: jnp.ndarray  # collinearity denominator (distance along optical axis)
    kx: jnp.ndarray
    ky: jnp.ndarray
    R: jnp.ndarray  # [3,3] rotation
    dX: jnp.ndarray  # [3] object - camera position


def project(point, eo, io) -> Projection:
    """Project object point into the (undistorted) image plane.

    point: [3] object coordinates (X, Y, Z)
    eo:    [6] exterior orientation (X0, Y0, Z0, omega, phi, kappa)
    io:    [3] interior orientation (x0, y0, c)

    xs = -c * kx / N, ys = -c * ky / N with
    kx = r11 dX + r21 dY + r31 dZ, ky = r12 dX + ..., N = r13 dX + ...
    (PartialDerivativeFactory.java:141-149).
    """
    c = io[2]
    R = rotation_wpk(eo[3], eo[4], eo[5])
    d = point - eo[:3]
    kx = R[0, 0] * d[0] + R[1, 0] * d[1] + R[2, 0] * d[2]
    ky = R[0, 1] * d[0] + R[1, 1] * d[1] + R[2, 1] * d[2]
    N = R[0, 2] * d[0] + R[1, 2] * d[1] + R[2, 2] * d[2]
    xs = -c * kx / N
    ys = -c * ky / N
    return Projection(xs=xs, ys=ys, N=N, kx=kx, ky=ky, R=R, dX=d)


class CollinearityPartials(NamedTuple):
    """All 24 closed-form partials of (xs, ys) w.r.t.
    (X, Y, Z, x0, y0, c, X0, Y0, Z0, omega, phi, kappa) — the analytic oracle
    (PartialDerivativeFactory.java:155-189)."""

    xs: jnp.ndarray  # [12]
    ys: jnp.ndarray  # [12]


def analytic_partials(point, eo, io) -> tuple[Projection, CollinearityPartials]:
    p = project(point, eo, io)
    c = io[2]
    R, d, N = p.R, p.dX, p.N
    co = jnp.cos(eo[3])
    so = jnp.sin(eo[3])
    ck = jnp.cos(eo[5])
    sk = jnp.sin(eo[5])
    del co, so  # appear only through R entries below

    # x-equation
    par_xs_X = -(R[0, 2] * p.xs + c * R[0, 0]) / N
    par_xs_Y = -(R[1, 2] * p.xs + c * R[1, 0]) / N
    par_xs_Z = -(R[2, 2] * p.xs + c * R[2, 0]) / N
    par_xs_x0 = jnp.ones_like(N)
    par_xs_y0 = jnp.zeros_like(N)
    par_xs_c = -p.kx / N
    par_xs_omega = (p.xs * (R[2, 2] * d[1] - R[1, 2] * d[2]) + c * (R[2, 0] * d[1] - R[1, 0] * d[2])) / N
    par_xs_phi = (p.xs * (p.ky * sk - p.kx * ck) + c * N * ck) / N
    par_xs_kappa = p.ys

    # y-equation
    par_ys_X = -(R[0, 2] * p.ys + c * R[0, 1]) / N
    par_ys_Y = -(R[1, 2] * p.ys + c * R[1, 1]) / N
    par_ys_Z = -(R[2, 2] * p.ys + c * R[2, 1]) / N
    par_ys_x0 = jnp.zeros_like(N)
    par_ys_y0 = jnp.ones_like(N)
    par_ys_c = -p.ky / N
    par_ys_omega = (p.ys * (R[2, 2] * d[1] - R[1, 2] * d[2]) + c * (R[2, 1] * d[1] - R[1, 1] * d[2])) / N
    par_ys_phi = (p.ys * (p.ky * sk - p.kx * ck) - c * N * sk) / N
    par_ys_kappa = -p.xs

    xs_row = jnp.stack(
        [par_xs_X, par_xs_Y, par_xs_Z, par_xs_x0, par_xs_y0, par_xs_c,
         -par_xs_X, -par_xs_Y, -par_xs_Z, par_xs_omega, par_xs_phi, par_xs_kappa]
    )
    ys_row = jnp.stack(
        [par_ys_X, par_ys_Y, par_ys_Z, par_ys_x0, par_ys_y0, par_ys_c,
         -par_ys_X, -par_ys_Y, -par_ys_Z, par_ys_omega, par_ys_phi, par_ys_kappa]
    )
    return p, CollinearityPartials(xs=xs_row, ys=ys_row)
