"""Rotation utilities.

The omega-phi-kappa rotation convention follows Luhmann (2023, Eq. 2.30/2.31)
as used by the reference (`.../camera/orientation/ExteriorOrientation.java:52-85`,
`.../derivation/PartialDerivativeFactory.java:124-135`).  Euler extraction for
all twelve axis conventions mirrors `adjustment/MathExtension.java:585-766`.

Everything here is pure JAX and differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp


def rotation_wpk(omega, phi, kappa):
    """Rotation matrix R(omega, phi, kappa), world -> image axes.

    Rows of R are the image-space basis vectors; the collinearity numerators
    are kx = R[:,0] . d, ky = R[:,1] . d, N = R[:,2] . d with d = X - X0
    (PartialDerivativeFactory.java:141-143 uses r11*dX + r21*dY + r31*dZ, i.e.
    columns of the matrix laid out below).
    """
    co, so = jnp.cos(omega), jnp.sin(omega)
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    ck, sk = jnp.cos(kappa), jnp.sin(kappa)

    r11 = cp * ck
    r12 = -cp * sk
    r13 = sp
    r21 = co * sk + so * sp * ck
    r22 = co * ck - so * sp * sk
    r23 = -so * cp
    r31 = so * sk - co * sp * ck
    r32 = so * ck + co * sp * sk
    r33 = co * cp

    return jnp.stack(
        [
            jnp.stack([r11, r12, r13], axis=-1),
            jnp.stack([r21, r22, r23], axis=-1),
            jnp.stack([r31, r32, r33], axis=-1),
        ],
        axis=-2,
    )


def wpk_from_rotation(R):
    """Extract (omega, phi, kappa) from a rotation matrix of the above
    convention: omega = atan2(-r23, r33), phi = asin(r13),
    kappa = atan2(-r12, r11) (cf. dlt/DirectLinearTransformation.java:236-247
    and MathExtension.rotationMatrix3D2EulerAngles XYZ branch)."""
    omega = jnp.arctan2(-R[..., 1, 2], R[..., 2, 2])
    phi = jnp.arcsin(jnp.clip(R[..., 0, 2], -1.0, 1.0))
    kappa = jnp.arctan2(-R[..., 0, 1], R[..., 0, 0])
    return omega, phi, kappa


def cross(a, b):
    """Vector cross product (MathExtension.java:526-534)."""
    return jnp.cross(a, b)


_AXIS_ROTS = {
    "x": lambda a: _rx(a),
    "y": lambda a: _ry(a),
    "z": lambda a: _rz(a),
}


def _rx(a):
    c, s = jnp.cos(a), jnp.sin(a)
    one = jnp.ones_like(a)
    zero = jnp.zeros_like(a)
    return jnp.stack(
        [
            jnp.stack([one, zero, zero], -1),
            jnp.stack([zero, c, s], -1),
            jnp.stack([zero, -s, c], -1),
        ],
        -2,
    )


def _ry(a):
    c, s = jnp.cos(a), jnp.sin(a)
    one = jnp.ones_like(a)
    zero = jnp.zeros_like(a)
    return jnp.stack(
        [
            jnp.stack([c, zero, -s], -1),
            jnp.stack([zero, one, zero], -1),
            jnp.stack([s, zero, c], -1),
        ],
        -2,
    )


def _rz(a):
    c, s = jnp.cos(a), jnp.sin(a)
    one = jnp.ones_like(a)
    zero = jnp.zeros_like(a)
    return jnp.stack(
        [
            jnp.stack([c, s, zero], -1),
            jnp.stack([-s, c, zero], -1),
            jnp.stack([zero, zero, one], -1),
        ],
        -2,
    )


def sequence_rotation(angles, order: str):
    """R = R_k(c) @ R_j(b) @ R_i(a) for order string like "xyz" with
    angles = (a, b, c); supports all 12 conventions of
    MathExtension.rotationMatrix3D2EulerAngles."""
    if len(order) != 3:
        raise ValueError(f"order must have 3 axes, got {order!r}")
    a, b, c = angles
    Ra = _AXIS_ROTS[order[0]](a)
    Rb = _AXIS_ROTS[order[1]](b)
    Rc = _AXIS_ROTS[order[2]](c)
    return Rc @ Rb @ Ra


def euler_from_rotation(R, order: str):
    """Inverse of :func:`sequence_rotation` — Euler angles of a proper rotation
    matrix for any of the 12 conventions (MathExtension.java:585-766).

    Conventions with repeated first/last axis (e.g. "xyx") use the proper-Euler
    branch; the six Tait-Bryan conventions use the asin branch.
    """
    i, j, k = order[0], order[1], order[2]
    ax = {"x": 0, "y": 1, "z": 2}
    # The matrix built by sequence_rotation for Tait-Bryan order i-j-k has
    # R[k_idx? ...]; derive angles generically via known closed forms.
    if i == k:  # proper Euler: i-j-i
        ii, jj = ax[i], ax[j]
        kk = 3 - ii - jj
        sign = 1.0 if (ii, jj) in ((0, 1), (1, 2), (2, 0)) else -1.0
        b = jnp.arccos(jnp.clip(R[..., ii, ii], -1.0, 1.0))
        a = jnp.arctan2(R[..., ii, jj], -sign * R[..., ii, kk])
        c = jnp.arctan2(R[..., jj, ii], sign * R[..., kk, ii])
        return a, b, c
    else:  # Tait-Bryan: i-j-k, all distinct
        ii, jj, kk = ax[i], ax[j], ax[k]
        sign = 1.0 if (ii, jj, kk) in ((0, 1, 2), (1, 2, 0), (2, 0, 1)) else -1.0
        b = jnp.arcsin(jnp.clip(sign * R[..., kk, ii], -1.0, 1.0))
        a = jnp.arctan2(-sign * R[..., kk, jj], R[..., kk, kk])
        c = jnp.arctan2(-sign * R[..., jj, ii], R[..., ii, ii])
        return a, b, c
