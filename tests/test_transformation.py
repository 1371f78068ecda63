"""EO-frame coordinate transformation + covariance propagation (survey G5)."""

import numpy as np

from bundle_adjustment_tpu import BundleAdjustment, MatrixInversion
from bundle_adjustment_tpu.init import transformation
from bundle_adjustment_tpu.ops.rotation import rotation_wpk
from bundle_adjustment_tpu.testing import make_synthetic_scene


def _solved_scene():
    cameras, scale_bars, truth = make_synthetic_scene(
        num_points=20, num_images=5, noise=1e-4, sigma=1e-4,
        perturb=0.0, seed=31)
    adj = BundleAdjustment()
    adj.add(cameras[0])
    for sb in scale_bars:
        adj.add(sb)
    adj.set_invert_normal_equation(MatrixInversion.FULL)
    adj.estimate_model()
    return adj, cameras[0], truth


def test_forward_transform_values():
    adj, camera, truth = _solved_scene()
    imgs = camera.images
    ref, src = imgs[0], imgs[1]
    coords = [oc for oc in truth["coords"][:5]]
    res = transformation.transform(
        coords, {ref: [src]}, adj.get_variance_factor_aposteriori(), adj.Qxx)
    # verify against a manual composition
    eo_s = np.array([p.value for p in src.eo.params])
    eo_t = np.array([p.value for p in ref.eo.params])
    Rs = np.asarray(rotation_wpk(*eo_s[3:]))
    Rt = np.asarray(rotation_wpk(*eo_t[3:]))
    k = 0
    for oc in coords:
        if not any(ic.object_coordinate is oc for ic in src):
            continue
        X = np.array([oc.x.value, oc.y.value, oc.z.value])
        expect = eo_t[:3] + Rt @ (Rs.T @ (X - eo_s[:3]))
        assert np.allclose(res.points[k], expect, atol=1e-12)
        k += 1
    assert k == res.points.shape[0]


def test_identity_transform_covariance():
    """Transforming through the reference image itself is the identity; the
    propagated covariance must equal the point block of sigma^2 * Qxx."""
    adj, camera, truth = _solved_scene()
    ref = camera.images[0]
    coords = [oc for oc in truth["coords"][:4]
              if any(ic.object_coordinate is oc for ic in ref)]
    s2 = adj.get_variance_factor_aposteriori()
    res = transformation.transform(coords, {ref: [ref]}, s2, adj.Qxx)
    # identity: points unchanged
    pts = np.array([[oc.x.value, oc.y.value, oc.z.value] for oc in coords])
    assert np.allclose(res.points, pts, atol=1e-12)
    cols = np.array([[oc.x.column, oc.y.column, oc.z.column]
                     for oc in coords]).reshape(-1)
    expect = s2 * adj.Qxx[np.ix_(cols, cols)]
    assert np.allclose(res.covariance, expect, rtol=1e-8, atol=1e-16)


def test_transform_jacobian_vs_fd():
    from bundle_adjustment_tpu.init.transformation import _transform_one
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    params = np.concatenate([
        rng.normal(0, 100, 3), rng.normal(0, 1, 3),
        rng.normal(0, 100, 3), rng.normal(0, 1, 3),
        rng.normal(0, 50, 3)])
    J = np.asarray(jax.jacfwd(_transform_one)(jnp.asarray(params)))
    eps = 1e-6
    for k in range(15):
        p1, p2 = params.copy(), params.copy()
        h = eps * max(1.0, abs(params[k]))
        p1[k] += h
        p2[k] -= h
        fd = (np.asarray(_transform_one(jnp.asarray(p1)))
              - np.asarray(_transform_one(jnp.asarray(p2)))) / (2 * h)
        assert np.allclose(J[:, k], fd, rtol=1e-4, atol=1e-6)
