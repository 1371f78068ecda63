"""The three reduction strategies (segment_sum, gather tables, blocked
permutation layout) must produce identical LM steps."""

import jax.numpy as jnp
import numpy as np

from bundle_adjustment_tpu.models.layout import assign_columns
from bundle_adjustment_tpu.models.problem import ParamState, compile_problem
from bundle_adjustment_tpu.parallel import rcs
from bundle_adjustment_tpu.testing import make_synthetic_scene


def test_reduction_strategies_agree():
    cameras, _, truth = make_synthetic_scene(
        num_points=30, num_images=6, noise=1e-4, sigma=1e-4,
        perturb=0.005, seed=91, with_scale_bar=False)
    for oc in truth["coords"][:3]:
        for p in oc.params:
            p.fixed = True
    cs = compile_problem(cameras, [], [], assign_columns(cameras, [], []))
    bp = cs.problem
    state = ParamState(*(jnp.asarray(a, jnp.float64) for a in cs.state))

    base = rcs.rcs_from_problem(bp, build_tables=False)

    variants = {"segment_sum": base}
    variants["tables"] = rcs.rcs_from_problem(bp, build_tables=True)

    perm, bstarts = rcs.build_image_block_layout(
        bp.obs_image, bp.num_images, block=16)
    # NB: block=16 keeps the padded array small for the test
    variants["blocked"] = base._replace(
        img_perm=jnp.asarray(perm), img_block_starts=jnp.asarray(bstarts))

    results = {}
    for name, rp in variants.items():
        with _patched_block(16 if name == "blocked" else None):
            dxp, dxc, dxg, blocks, _ = rcs.lm_step(
                rp, state, bp.spec, 1e-4, cg_tol=1e-13, cg_maxiter=500)
        results[name] = (np.asarray(dxp), np.asarray(dxc), np.asarray(dxg))

    ref = results["segment_sum"]
    for name in ("tables", "blocked"):
        for a, b in zip(results[name], ref):
            assert np.allclose(a, b, rtol=1e-6, atol=1e-10), name


class _patched_block:
    """Temporarily override rcs.IMG_BLOCK (the layout above used block=16)."""

    def __init__(self, block):
        self.block = block

    def __enter__(self):
        self.saved = rcs.IMG_BLOCK
        if self.block is not None:
            rcs.IMG_BLOCK = self.block

    def __exit__(self, *a):
        rcs.IMG_BLOCK = self.saved


def test_uniform_point_layout():
    """point_uniform reshape reductions == segment_sum when observations are
    point-major with equal counts."""
    P, V, M = 40, 6, 8
    rng = np.random.default_rng(3)
    obs_point = np.repeat(np.arange(P, dtype=np.int32), V)
    obs_image = rng.integers(0, M, P * V).astype(np.int32)
    x = jnp.asarray(rng.normal(size=(P * V, 2, 3)))

    base = dict(obs_point=jnp.asarray(obs_point), obs_image=jnp.asarray(obs_image),
                cam_of_image=jnp.zeros(M, jnp.int32), obs_xy=None,
                obs_weight=None, r0=None, num_points=P, num_images=M,
                free_point=None, free_eo=None, free_global=None)
    p_seg = rcs.RCSProblem(**base)
    p_uni = rcs.RCSProblem(**base, point_uniform=V)
    a = np.asarray(rcs._seg_point(p_seg, x))
    b = np.asarray(rcs._seg_point(p_uni, x))
    assert np.allclose(a, b, atol=1e-14)
    z = jnp.asarray(rng.normal(size=(P, 3)))
    assert np.allclose(np.asarray(rcs._expand_point(p_seg, z)),
                       np.asarray(rcs._expand_point(p_uni, z)), atol=0)
