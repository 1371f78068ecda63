"""Unit tests for the core math: rotation, collinearity partials, distortion.

The analytic closed forms ported from the reference
(PartialDerivativeFactory.java:58-195) are the oracle for the autodiff
production path — these tests pin them together.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bundle_adjustment_tpu.models.distortion import (
    DistortionSpecBuilder,
    DistortionType,
)
from bundle_adjustment_tpu.models.zernike import ZernikePolynomial
from bundle_adjustment_tpu.ops.collinearity import analytic_partials, project
from bundle_adjustment_tpu.ops.residuals import (
    image_point_jacobian,
    predict_image_point,
)
from bundle_adjustment_tpu.ops.rotation import (
    euler_from_rotation,
    rotation_wpk,
    sequence_rotation,
    wpk_from_rotation,
)


def test_rotation_orthonormal():
    R = rotation_wpk(0.3, -0.5, 1.2)
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-14)
    assert np.isclose(np.linalg.det(R), 1.0, atol=1e-14)


def test_rotation_roundtrip():
    w, p, k = 0.37, -0.21, 2.5
    R = rotation_wpk(w, p, k)
    w2, p2, k2 = wpk_from_rotation(R)
    assert np.allclose([w, p, k], [w2, p2, k2], atol=1e-12)


@pytest.mark.parametrize("order", ["xyz", "zyx", "xzy", "yxz", "yzx", "zxy",
                                   "xyx", "yzy", "zxz", "xzx", "yxy", "zyz"])
def test_euler_sequence_roundtrip(order):
    angles = (0.3, 0.7, -1.1)
    R = sequence_rotation(angles, order)
    a, b, c = euler_from_rotation(R, order)
    R2 = sequence_rotation((a, b, c), order)
    assert np.allclose(R, R2, atol=1e-12)


def _local(point, io, eo, coeffs=()):
    return jnp.asarray(np.concatenate([point, io, eo, list(coeffs)]))


POINT = np.array([12.3, -45.6, 7.8])
IO = np.array([0.02, -0.03, -30.0])
EO = np.array([300.0, -200.0, 250.0, 0.4, -0.3, 1.9])


def test_collinearity_analytic_vs_autodiff():
    """The 24 closed-form partials == forward-mode AD of the forward model."""
    from bundle_adjustment_tpu.models.distortion import DistortionSpec

    spec = DistortionSpec()
    local = _local(POINT, IO, EO)
    J = image_point_jacobian(local, spec, 0.0)  # [2, 12]
    _, partials = analytic_partials(jnp.asarray(POINT), jnp.asarray(EO), jnp.asarray(IO))
    assert np.allclose(J[0], partials.xs, rtol=1e-12, atol=1e-14)
    assert np.allclose(J[1], partials.ys, rtol=1e-12, atol=1e-14)


def test_projection_prediction():
    from bundle_adjustment_tpu.models.distortion import DistortionSpec

    p = project(jnp.asarray(POINT), jnp.asarray(EO), jnp.asarray(IO))
    pred = predict_image_point(_local(POINT, IO, EO), DistortionSpec(), 0.0)
    assert np.isclose(pred[0], IO[0] + p.xs)
    assert np.isclose(pred[1], IO[1] + p.ys)


def _reference_distortion_deltas(xs, ys, N, spec, coeffs, r0):
    """Literal transcription of the reference factories' delta formulas
    (numpy, scalar) as an independent oracle."""
    r2 = xs * xs + ys * ys
    r02 = r0 * r0
    dx = dy = 0.0
    idx = {(s.kind, s.key): i for i, s in enumerate(spec.slots)}
    # affinity (AffinityShearDistortionModelFactory.java:44-48)
    if (DistortionType.AFFINITY_AND_SHEAR, 0) in idx:
        cx = coeffs[idx[(DistortionType.AFFINITY_AND_SHEAR, 0)]]
        cy = coeffs[idx[(DistortionType.AFFINITY_AND_SHEAR, 1)]]
        dx += cx * xs + cy * ys
    # tangential (TangentialDistortionModelFactory.java:56-99)
    if (DistortionType.TANGENTIAL_DISTORTION, -1) in idx:
        bx = coeffs[idx[(DistortionType.TANGENTIAL_DISTORTION, -1)]]
        by = coeffs[idx[(DistortionType.TANGENTIAL_DISTORTION, -2)]]
        base_x = bx * (r2 + 2 * xs * xs) + by * 2 * xs * ys
        base_y = by * (r2 + 2 * ys * ys) + bx * 2 * xs * ys
        s = 1.0
        for i, slot in enumerate(spec.slots):
            if slot.kind == DistortionType.TANGENTIAL_DISTORTION and slot.key > 0:
                s += coeffs[i] * r2 ** slot.order
        dx += base_x * s
        dy += base_y * s
    # radial (RadiallySymmetricDistortionModelFactory.java:57-63)
    for i, slot in enumerate(spec.slots):
        if slot.kind == DistortionType.RADIAL_DISTORTION:
            dri = r2 ** slot.order - r02 ** slot.order
            dx += xs * coeffs[i] * dri
            dy += ys * coeffs[i] * dri
        if slot.kind == DistortionType.DISTANCE_DISTORTION:
            dri = r2 ** slot.order - r02 ** slot.order
            dx += xs * coeffs[i] * dri / N
            dy += ys * coeffs[i] * dri / N
    return dx, dy


def test_distortion_forward_matches_reference_formulas():
    builder = DistortionSpecBuilder()
    builder.add_affinity()
    builder.add_tangential()
    builder.add_tangential_order(1)
    builder.add_radial_order(1)
    builder.add_radial_order(2)
    builder.add_radial_order(3)
    builder.add_distance_order(1)
    spec = builder.build()
    rng = np.random.default_rng(42)
    coeffs = rng.normal(0, 1e-4, spec.num_coefficients)
    r0 = 10.0

    local = _local(POINT, IO, EO, coeffs)
    pred = np.asarray(predict_image_point(local, spec, r0))

    p = project(jnp.asarray(POINT), jnp.asarray(EO), jnp.asarray(IO))
    ddx, ddy = _reference_distortion_deltas(
        float(p.xs), float(p.ys), float(p.N), spec, coeffs, r0)
    assert np.isclose(pred[0], IO[0] + float(p.xs) + ddx, rtol=1e-12)
    assert np.isclose(pred[1], IO[1] + float(p.ys) + ddy, rtol=1e-12)


def test_distortion_jacobian_vs_numeric():
    """Autodiff Jacobian == central finite differences for the full model."""
    builder = DistortionSpecBuilder()
    builder.add_affinity()
    builder.add_tangential()
    builder.add_radial_order(1)
    builder.add_radial_order(2)
    builder.add_distance_order(1)
    builder.add_zernike(DistortionType.ZERNIKE_GRADIENT, 4)
    builder.add_zernike(DistortionType.ZERNIKE_GRADIENT, 12)
    builder.add_zernike(DistortionType.ZERNIKE_X, 5)
    builder.add_zernike(DistortionType.ZERNIKE_Y, 6)
    spec = builder.build()
    rng = np.random.default_rng(7)
    coeffs = rng.normal(0, 1e-4, spec.num_coefficients)
    r0 = 10.0
    local = np.concatenate([POINT, IO, EO, coeffs])

    J = np.asarray(image_point_jacobian(jnp.asarray(local), spec, r0))

    eps = 1e-6
    J_num = np.zeros_like(J)
    for k in range(local.size):
        lp = local.copy()
        lm = local.copy()
        h = eps * max(1.0, abs(local[k]))
        lp[k] += h
        lm[k] -= h
        fp = np.asarray(predict_image_point(jnp.asarray(lp), spec, r0))
        fm = np.asarray(predict_image_point(jnp.asarray(lm), spec, r0))
        J_num[:, k] = (fp - fm) / (2 * h)
    assert np.allclose(J, J_num, rtol=2e-5, atol=1e-9)


def test_zernike_fringe_indexing():
    # Fringe index 4 -> n=2, m=0 (defocus); 12 -> n=4, m=0 (spherical)
    z4 = ZernikePolynomial.from_fringe(4, normalise=False)
    assert (z4.n, z4.m) == (2, 0)
    # R_2^0(r) = 2 r^2 - 1
    assert np.isclose(z4.radial(0.7), 2 * 0.49 - 1)
    z12 = ZernikePolynomial.from_fringe(12, normalise=False)
    assert (z12.n, z12.m) == (4, 0)
    # R_4^0(r) = 6 r^4 - 6 r^2 + 1
    r = 0.53
    assert np.isclose(z12.radial(r), 6 * r**4 - 6 * r**2 + 1)
