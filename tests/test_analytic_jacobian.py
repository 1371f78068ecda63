"""Closed-form Jacobian path == forward-mode AD, for the supported stack."""

import jax.numpy as jnp
import numpy as np

from bundle_adjustment_tpu.models.distortion import (
    DistortionSpecBuilder,
    DistortionType,
)
from bundle_adjustment_tpu.ops.analytic import (
    analytic_image_jacobian_and_residual,
    supports_spec,
)
from bundle_adjustment_tpu.ops.residuals import (
    image_point_jacobian,
    image_point_residual,
)

POINT = np.array([12.3, -45.6, 7.8])
IO = np.array([0.02, -0.03, -30.0])
EO = np.array([300.0, -200.0, 250.0, 0.4, -0.3, 1.9])


def _spec_full():
    b = DistortionSpecBuilder()
    b.add_affinity()
    b.add_tangential()
    b.add_tangential_order(1)
    b.add_tangential_order(2)
    b.add_radial_order(1)
    b.add_radial_order(2)
    b.add_radial_order(3)
    b.add_distance_order(1)
    b.add_distance_order(2)
    return b.build()


def test_analytic_matches_ad():
    spec = _spec_full()
    assert supports_spec(spec)
    rng = np.random.default_rng(17)
    coeffs = rng.normal(0, 1e-4, spec.num_coefficients)
    local = jnp.asarray(np.concatenate([POINT, IO, EO, coeffs]))
    obs = jnp.asarray([3.3, -2.2])
    r0 = 10.0

    J_ad = np.asarray(image_point_jacobian(local, spec, r0))
    w_ad = np.asarray(image_point_residual(local, obs, spec, r0))
    J_an, w_an = analytic_image_jacobian_and_residual(local, obs, spec, r0)

    assert np.allclose(np.asarray(w_an), w_ad, rtol=1e-12, atol=1e-15)
    assert np.allclose(np.asarray(J_an), J_ad, rtol=1e-10, atol=1e-13)


def test_analytic_no_distortion():
    from bundle_adjustment_tpu.models.distortion import DistortionSpec

    spec = DistortionSpec()
    local = jnp.asarray(np.concatenate([POINT, IO, EO]))
    obs = jnp.asarray([1.0, 2.0])
    J_ad = np.asarray(image_point_jacobian(local, spec, 0.0))
    J_an, w_an = analytic_image_jacobian_and_residual(local, obs, spec, 0.0)
    assert np.allclose(np.asarray(J_an), J_ad, rtol=1e-12, atol=1e-14)


def test_analytic_zernike_matches_ad():
    """Zernike X/Y/Gradient closed-form rows == jacfwd of the forward deltas
    (ZernikeDistortionModelFactory.java:41-228)."""
    b = DistortionSpecBuilder()
    b.add_radial_order(1)
    b.add_affinity()
    b.add_tangential()
    b.add_distance_order(1)
    for f in (3, 4, 11, 12):
        b.add_zernike(DistortionType.ZERNIKE_GRADIENT, f)
    b.add_zernike(DistortionType.ZERNIKE_X, 5)
    b.add_zernike(DistortionType.ZERNIKE_Y, 6)
    spec = b.build()
    assert supports_spec(spec)

    rng = np.random.default_rng(23)
    for _ in range(3):
        point = rng.uniform(-100, 100, 3)
        eo = np.concatenate([rng.uniform(200, 400, 3),
                             rng.uniform(-0.3, 0.3, 3)])
        coeffs = rng.normal(0, 1e-4, spec.num_coefficients)
        local = jnp.asarray(np.concatenate([point, IO, eo, coeffs]))
        obs = jnp.asarray([0.1, -0.2])
        r0 = 10.0
        J_ad = np.asarray(image_point_jacobian(local, spec, r0))
        w_ad = np.asarray(image_point_residual(local, obs, spec, r0))
        J_an, w_an = analytic_image_jacobian_and_residual(local, obs, spec, r0)
        assert np.allclose(np.asarray(w_an), w_ad, rtol=1e-12, atol=1e-15)
        assert np.allclose(np.asarray(J_an), J_ad, rtol=1e-9, atol=1e-12)
