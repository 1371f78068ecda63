"""The fused Pallas Schur-matvec must match the XLA implementation
(interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from bundle_adjustment_tpu.models.problem import ParamState
from bundle_adjustment_tpu.parallel import pallas_matvec, rcs


def _uniform_problem(P=32, M=6, V=4, seed=5):
    """Small synthetic RCS problem with uniform point-major observations."""
    from bench import build_problem

    problem, state, spec = build_problem(P, M, V, jnp.float32, seed=seed)
    return problem, state, spec


def test_pallas_matvec_matches_xla(monkeypatch):
    import sys

    sys.path.insert(0, "/root/repo")
    problem, state, spec = _uniform_problem()
    b = rcs.linearize(problem, state, spec, jnp.float32(1e-3))

    rng = np.random.default_rng(0)
    M = problem.num_images
    G = b.Jg.shape[2]
    xc = jnp.asarray(rng.normal(size=(M, 6)), jnp.float32)
    xg = jnp.asarray(rng.normal(size=G), jnp.float32)

    ref_c, ref_g = rcs.schur_matvec(problem, b, xc, xg)

    pp = pallas_matvec.pack_blocks(b, problem, views=4)

    # interpret mode for CPU execution
    orig_call = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call",
        functools.partial(orig_call, interpret=True))
    mv = pallas_matvec.make_pallas_matvec(pp, block_points=8)
    out_c, out_g = mv(xc, xg, b.extra_c, b.extra_g)

    assert np.allclose(np.asarray(out_c), np.asarray(ref_c),
                       rtol=2e-4, atol=1e-5)
    assert np.allclose(np.asarray(out_g), np.asarray(ref_g),
                       rtol=2e-4, atol=1e-5)
