"""DLT initialisation tests: recover IO/EO starting values from homologous
points (dlt/DirectLinearTransformation.java oracle behaviour)."""

import numpy as np
import pytest

from bundle_adjustment_tpu.init import dlt
from bundle_adjustment_tpu.testing import make_synthetic_scene


def _scene():
    cameras, _, truth = make_synthetic_scene(
        num_points=40, num_images=4, noise=0.0, with_distortion=False,
        with_scale_bar=False, seed=21)
    coords = {oc.name: oc for oc in truth["coords"]}
    return cameras[0], coords, truth


def test_dlt_recovers_orientation():
    camera, coords, truth = _scene()
    image = camera.images[0]
    res = dlt.adjust(image, coords)
    assert res.converged
    # projection centre within numerical tolerance (exact observations)
    assert np.allclose(res.eo[:3], truth["eo"][0, :3], atol=1e-6)
    # the decomposition always yields positive c with the compensating
    # rotation (expandUnknownParameters); verify by forward projection:
    # predicted image coordinates from the decomposed (IO, EO) must
    # reproduce the observations
    import jax.numpy as jnp

    from bundle_adjustment_tpu.models.distortion import DistortionSpec
    from bundle_adjustment_tpu.ops.residuals import predict_image_point

    spec = DistortionSpec()
    for ic in list(image)[:10]:
        oc = ic.object_coordinate
        local = jnp.asarray(np.concatenate([
            [oc.x.value, oc.y.value, oc.z.value],
            [res.x0, res.y0, res.c], res.eo]))
        pred = np.asarray(predict_image_point(local, spec, 0.0))
        assert np.allclose(pred, [ic.x, ic.y], atol=1e-8)
    # interior orientation: |c| recovered (sign convention: DLT returns the
    # positive distance cx/cy mean; the AICON convention stores c < 0)
    assert np.isclose(abs(res.c), abs(truth["io"][2]), rtol=1e-6)
    assert np.isclose(res.x0, truth["io"][0], atol=1e-6)
    assert np.isclose(res.y0, truth["io"][1], atol=1e-6)


def test_dlt_apply_to_respects_fixed_io():
    camera, coords, truth = _scene()
    image = camera.images[1]
    c_before = camera.io.c.value
    camera.io.c.fixed = True
    res = dlt.adjust(image, coords)
    dlt.apply_to(res, image)
    assert camera.io.c.value == c_before  # fixed -> untouched
    assert np.allclose(image.eo.x0.value, truth["eo"][1, 0], atol=1e-5)
    camera.io.c.fixed = False


def test_dlt_with_restrictions():
    camera, coords, truth = _scene()
    image = camera.images[2]
    # fix the principal point at its known true value
    camera.io.x0.value = truth["io"][0]
    camera.io.y0.value = truth["io"][1]
    res = dlt.adjust(image, coords,
                     dlt.RestrictionType.FIXED_PRINCIPAL_POINT_X,
                     dlt.RestrictionType.FIXED_PRINCIPAL_POINT_Y)
    assert res.converged
    assert np.isclose(res.x0, truth["io"][0], atol=1e-8)
    assert np.isclose(res.y0, truth["io"][1], atol=1e-8)


def test_dlt_insufficient_points():
    camera, coords, truth = _scene()
    image = camera.images[3]
    few = dict(list(coords.items())[:4])
    with pytest.raises(ValueError, match="insufficient"):
        dlt.adjust(image, few)


def test_triangulation():
    camera, coords, truth = _scene()
    results = [dlt.adjust(img, coords) for img in camera.images[:3]]
    # take a point observed in the first three images
    name = None
    for ic in camera.images[0]:
        n = ic.object_coordinate.name
        if all(any(jc.object_coordinate.name == n for jc in img)
               for img in camera.images[:3]):
            name = n
            break
    assert name is not None
    xy = []
    for img in camera.images[:3]:
        for ic in img:
            if ic.object_coordinate.name == name:
                xy.append((ic.x, ic.y))
                break
    X = dlt.triangulate(results, xy)
    oc = coords[name]
    assert np.allclose(X, [oc.x.value, oc.y.value, oc.z.value], atol=1e-6)
