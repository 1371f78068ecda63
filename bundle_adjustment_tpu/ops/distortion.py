"""Forward distortion corrections Delta x, Delta y.

Additive corrections evaluated at the *undistorted* projected point
(xs, ys) and collinearity denominator N, exactly as the reference factories
compute their delta values:

- radial-symmetric:  Dr = sum_i A_i (r^{2i} - r0^{2i}); dx = xs*Dr, dy = ys*Dr
  (`RadiallySymmetricDistortionModelFactory.java:39-91`)
- tangential (Brown/Conrady with higher-order scaling):
  dx = [Bx (r^2 + 2 xs^2) + 2 By xs ys] * (1 + sum_i B_i r^{2i}), sym. in y
  (`TangentialDistortionModelFactory.java:39-134`)
- affinity/shear:    dx = Cx xs + Cy ys; dy = 0
  (`AffinityShearDistortionModelFactory.java:37-82`)
- distance-dependent radial: like radial but / N
  (`RadialDistanceDistortionModelFactory.java:39-162`)
- Zernike X/Y/Gradient (`ZernikeDistortionModelFactory.java:41-228`), with the
  reference's *integer-division* radial exponents (p_j // 2) reproduced
  bit-true (see models/zernike.py docstring).

Because the reference's Jacobian chain rule is exactly forward-mode autodiff
of these expressions, differentiating this module with JAX reproduces the
reference's analytic A-matrix entries.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.distortion import DistortionSpec, DistortionType


def distortion_delta(xs, ys, N, coeffs, spec: DistortionSpec, r0):
    """Total additive correction (dx, dy) for one camera's model stack.

    xs, ys, N : scalars from the projection
    coeffs    : [K] coefficient values (slot order of ``spec``)
    r0        : second zero-crossing radius of the distortion curve
    """
    r2 = xs * xs + ys * ys
    r02 = r0 * r0
    dx = jnp.zeros_like(xs)
    dy = jnp.zeros_like(ys)

    # --- gather per-model coefficient groups (static Python loop over slots)
    tangential_base_x = None
    tangential_base_y = None
    tangential_sum = None

    # Pass 1: tangential base term (Bx, By) and higher-order sum, because the
    # higher-order B_i multiply the base term.
    for i, slot in enumerate(spec.slots):
        if slot.kind == DistortionType.TANGENTIAL_DISTORTION and slot.key == -1:
            bx = coeffs[i]
            by = coeffs[spec.slot_index(DistortionType.TANGENTIAL_DISTORTION, -2)]
            tangential_base_x = bx * (r2 + 2.0 * xs * xs) + by * 2.0 * xs * ys
            tangential_base_y = by * (r2 + 2.0 * ys * ys) + bx * 2.0 * xs * ys
            tangential_sum = jnp.ones_like(xs)

    for i, slot in enumerate(spec.slots):
        k = slot.kind
        if k == DistortionType.AFFINITY_AND_SHEAR:
            if slot.key == 0:  # Cx
                dx = dx + coeffs[i] * xs
            else:  # Cy
                dx = dx + coeffs[i] * ys
        elif k == DistortionType.RADIAL_DISTORTION:
            dri = r2**slot.order - r02**slot.order
            dradi = coeffs[i] * dri
            dx = dx + xs * dradi
            dy = dy + ys * dradi
        elif k == DistortionType.DISTANCE_DISTORTION:
            dri = r2**slot.order - r02**slot.order
            ddisti = coeffs[i] * dri / N
            dx = dx + xs * ddisti
            dy = dy + ys * ddisti
        elif k == DistortionType.TANGENTIAL_DISTORTION and slot.key > 0:
            ti = coeffs[i] * r2**slot.order
            tangential_sum = tangential_sum + ti
        elif k in (DistortionType.ZERNIKE_X, DistortionType.ZERNIKE_Y):
            zdx, zdy = _zernike_xy_delta(xs, ys, r2, r02, coeffs[i], spec.zernike[i], k)
            dx = dx + zdx
            dy = dy + zdy
        elif k == DistortionType.ZERNIKE_GRADIENT:
            zdx, zdy = _zernike_gradient_delta(xs, ys, r2, r02, coeffs[i], spec.zernike[i])
            dx = dx + zdx
            dy = dy + zdy

    if tangential_base_x is not None:
        dx = dx + tangential_base_x * tangential_sum
        dy = dy + tangential_base_y * tangential_sum

    return dx, dy


def _zernike_xy_delta(xs, ys, r2, r02, z, zp, kind):
    """Zernike X or Y model: delta on one image axis only.

    delta = z * sum_j c_j * rn2^{p_j // 2} * G(m phi)
    (ZernikeDistortionModelFactory.java:178-214; note Java integer division
    ``pj/2`` — odd exponents floor)."""
    phi = jnp.arctan2(ys, xs)
    rn2 = r2 / r02
    m = zp.m
    # Signed-m trig exactly as the Java source: sin(m*phi) with m < 0 gives
    # delta = -z*c*sin(m*phi) = +z*c*sin(|m|*phi).
    trig = -jnp.sin(m * phi) if m < 0 else jnp.cos(m * phi)
    delta = jnp.zeros_like(xs)
    for t in zp.terms:
        delta = delta + z * t.coeff * rn2 ** (t.p // 2) * trig
    if kind == DistortionType.ZERNIKE_X:
        return delta, jnp.zeros_like(ys)
    return jnp.zeros_like(xs), delta


def _zernike_gradient_delta(xs, ys, r2, r02, z, zp):
    """Zernike Gradient model: (dx, dy) = z * grad_{xs,ys} potential
    (ZernikeDistortionModelFactory.java:41-135; Java integer division in the
    exponent ``pj/2 - 1`` reproduced)."""
    phi = jnp.arctan2(ys, xs)
    rn2 = r2 / r02
    m = zp.m
    sinm = jnp.sin(m * phi)
    cosm = jnp.cos(m * phi)
    dx = jnp.zeros_like(xs)
    dy = jnp.zeros_like(ys)
    for t in zp.terms:
        const_c = t.coeff / r02 * rn2 ** (t.p // 2 - 1)
        if m < 0:
            cx = -t.p * xs * sinm + m * ys * cosm
            cy = -t.p * ys * sinm - m * xs * cosm
        else:
            cx = t.p * xs * cosm + m * ys * sinm
            cy = t.p * ys * cosm - m * xs * sinm
        dx = dx + z * const_c * cx
        dy = dy + z * const_c * cy
    return dx, dy
