"""Benchmark: LM iterations/s on the 100k-point / 500-image synthetic
network (BASELINE.json config 4), single chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "lm_iter/s", "vs_baseline": N}

Baseline model (vs_baseline): the reference solver as written is dense —
even its most aggressive mode (PRE_ELIMINATION) eliminates the *cameras* and
factorises the remaining [3P + IO + dist] block with packed LAPACK
(BundleAdjustment.java:255-298, MathExtension.java:338-366).  At P = 1e5 that
is a 3e5 x 3e5 dense LDL^T: ~(3e5)^3/6 = 4.5e15 flops per iteration (plus
360 GB for the packed matrix, i.e. it cannot actually run).  Crediting the
JVM with a very generous 5e10 flop/s sustained, the Java reference would do
at most ~1.1e-5 LM iterations/s at this scale; that figure is the baseline
denominator.  (The bundled example runs in this repo's dense parity path in
~11 s for 3 iterations on CPU — see tests/test_golden_example.py — so small-
scale parity is covered by tests; this benchmark measures the scale regime.)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def build_problem(num_points, num_images, views_per_point, dtype, seed=0,
                  zernike=()):
    """Array-native synthetic network (no Python object graph at this scale).

    ``zernike``: optional (DistortionType, fringe_index) tuples added to the
    distortion spec with small non-zero true coefficients (the Zernike
    calibration regime of ExampleDistortionModel.java:58-187)."""
    import jax
    import jax.numpy as jnp

    from bundle_adjustment_tpu.models.distortion import DistortionSpecBuilder
    from bundle_adjustment_tpu.models.problem import ParamState
    from bundle_adjustment_tpu.ops.residuals import predict_image_point
    from bundle_adjustment_tpu.parallel.rcs import RCSProblem
    from bundle_adjustment_tpu.testing import look_at_wpk

    rng = np.random.default_rng(seed)
    field = 2000.0
    pts = rng.uniform(-field / 2, field / 2, (num_points, 3))
    pts[:, 2] *= 0.2

    io = np.array([[0.02, -0.03, -30.0]])
    builder = DistortionSpecBuilder()
    builder.add_affinity()
    builder.add_tangential()
    builder.add_radial_order(1)
    builder.add_radial_order(2)
    builder.add_radial_order(3)
    for kind, fringe in zernike:
        builder.add_zernike(kind, fringe)
    spec = builder.build()
    K = spec.num_coefficients
    dist = np.zeros((1, K))
    dist[0, spec.slot_index(2, 1)] = -1.1e-4  # A1 (RADIAL_DISTORTION)
    dist[0, spec.slot_index(2, 2)] = 1.5e-7
    for kind, fringe in zernike:
        dist[0, spec.slot_index(kind, fringe)] = 2e-5 * (1 + fringe % 3)

    eo = np.zeros((num_images, 6))
    R = field * 2.0
    for m in range(num_images):
        ang = 2 * np.pi * m / num_images + 0.37 * (m % 5)
        radius = R * (0.7 + 0.12 * (m % 4))
        height = R * (0.5 + 0.2 * (m % 5))
        pos = np.array([radius * np.cos(ang), radius * np.sin(ang), height])
        w, p_, k = look_at_wpk(pos, np.zeros(3))
        eo[m] = [*pos, w, p_, k + (m % 4) * np.pi / 2]

    # visibility: each point sees `views_per_point` random images
    obs_point = np.repeat(np.arange(num_points, dtype=np.int32), views_per_point)
    obs_image = rng.integers(0, num_images,
                             num_points * views_per_point).astype(np.int32)

    # generate exact observations with the forward model (batched on device)
    state64 = ParamState(points=jnp.asarray(pts), io=jnp.asarray(io),
                         dist=jnp.asarray(dist), eo=jnp.asarray(eo))

    from bundle_adjustment_tpu.ops.assembly import gather_local_params

    cam_of_image = jnp.zeros(num_images, jnp.int32)

    @jax.jit
    def gen(state):
        local = gather_local_params(state, jnp.asarray(obs_point),
                                    jnp.asarray(obs_image), cam_of_image)
        return jax.vmap(lambda l: predict_image_point(l, spec, 10.0))(local)

    xy = np.asarray(gen(state64))
    sigma = 5e-4
    xy = xy + rng.normal(0, sigma, xy.shape)

    w2 = np.zeros((xy.shape[0], 2, 2))
    w2[:, 0, 0] = 1.0  # sigma0^2 / sigma^2 with sigma0 = sigma
    w2[:, 1, 1] = 1.0

    free_point = np.ones((num_points, 3))
    free_point[:3] = 0.0  # fixed-coordinate datum
    free_eo = np.ones((num_images, 6))
    free_global = np.ones(3 + K)

    # Blocked image-reduction layout (scatter-free) + uniform point-major
    # reshape reductions — the TPU fast path.
    from bundle_adjustment_tpu.parallel.rcs import build_image_block_layout

    img_perm, img_bstarts = build_image_block_layout(obs_image, num_images)

    problem = RCSProblem(
        img_perm=jnp.asarray(img_perm),
        img_block_starts=jnp.asarray(img_bstarts),
        point_uniform=views_per_point,
        obs_point=jnp.asarray(obs_point), obs_image=jnp.asarray(obs_image),
        cam_of_image=cam_of_image,
        obs_xy=jnp.asarray(xy, dtype), obs_weight=jnp.asarray(w2, dtype),
        r0=jnp.asarray([10.0], dtype),
        num_points=num_points, num_images=num_images,
        free_point=jnp.asarray(free_point, dtype),
        free_eo=jnp.asarray(free_eo, dtype),
        free_global=jnp.asarray(free_global, dtype),
    )
    # perturbed start
    pts0 = pts + rng.normal(0, 0.05, pts.shape) * free_point
    state = ParamState(points=jnp.asarray(pts0, dtype),
                       io=jnp.asarray(io, dtype),
                       dist=jnp.asarray(dist, dtype),
                       eo=jnp.asarray(eo + rng.normal(0, 1e-5, eo.shape), dtype))
    return problem, state, spec


def main():
    import jax
    import jax.numpy as jnp

    from bundle_adjustment_tpu.models.problem import ParamState
    from bundle_adjustment_tpu.parallel import rcs

    num_points = int(float(sys.argv[1])) if len(sys.argv) > 1 else 100_000
    num_images = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    views = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    # path selection: default = feature-major engine with the Pallas matvec;
    # "xla" = engine with the XLA matvec; "legacy"/"legacy-pallas" = the
    # block-layout rcs path (kept for comparison)
    mode = sys.argv[4] if len(sys.argv) > 4 else "engine"
    use_pallas = mode == "pallas"
    dtype = jnp.float32

    print(f"building problem: P={num_points} M={num_images} "
          f"N_obs={num_points * views}", file=sys.stderr)
    problem, state, spec = build_problem(num_points, num_images, views, dtype)

    damping = jnp.asarray(1e-4, dtype)

    if mode == "legacy-pallas":
        from bundle_adjustment_tpu.parallel import pallas_matvec

        @jax.jit
        def lm_iteration(st: ParamState):
            b, rc, rg, Minv = rcs.prepare(problem, st, spec, damping)
            pp = pallas_matvec.pack_blocks(b, problem, views=views)
            mv = pallas_matvec.make_pallas_matvec(pp)
            xc, xg, it = rcs.pcg(
                problem, b, rc, rg, Minv, tol=1e-5, maxiter=50,
                matvec=lambda c, g: mv(c, g, b.extra_c, b.extra_g))
            dxp = rcs.back_substitute_points(problem, b, xc, xg)
            new_state, max_dx = rcs.apply_step(st, problem, dxp, xc, xg)
            return new_state, max_dx, b.omega0, it
    elif mode == "legacy":
        @jax.jit
        def lm_iteration(st: ParamState):
            dxp, dxc, dxg, blocks, it = rcs.lm_step(
                problem, st, spec, damping, cg_tol=1e-5, cg_maxiter=50)
            new_state, max_dx = rcs.apply_step(st, problem, dxp, dxc, dxg)
            return new_state, max_dx, blocks.omega0, it
    else:  # feature-major engine (default); "xla" disables the kernel
        from bundle_adjustment_tpu.parallel import engine

        problem, state, _ = engine.pad_problem(problem, state)
        fmp = engine.fm_problem(problem)

        @jax.jit
        def lm_iteration(st: ParamState):
            dxp, dxc, dxg, blocks, it = engine.lm_step(
                fmp, st, spec, damping, cg_tol=1e-4, cg_maxiter=100,
                use_pallas=(mode != "xla"))
            new_state, max_dx = rcs.apply_step(st, problem, dxp, dxc, dxg)
            return new_state, max_dx, blocks.omega0, it

    t0 = time.time()
    state1, max_dx, om, it = lm_iteration(state)
    jax.block_until_ready(state1)
    compile_and_first = time.time() - t0
    print(f"first iteration (incl. compile): {compile_and_first:.2f}s "
          f"max|dx|={float(max_dx):.2e} omega0={float(om):.3e} cg={int(it)}",
          file=sys.stderr)

    iters = 5
    t0 = time.time()
    st = state1
    for _ in range(iters):
        st, max_dx, om, it = lm_iteration(st)
    jax.block_until_ready(st)
    dt = time.time() - t0
    rate = iters / dt
    print(f"{iters} LM iterations in {dt:.2f}s -> {rate:.3f} it/s "
          f"(last: max|dx|={float(max_dx):.2e} omega0={float(om):.4e} "
          f"cg={int(it)})", file=sys.stderr)

    # baseline: dense Java reference extrapolated to this scale (see module
    # docstring): (3P)^3/6 flops per iteration at a generous 5e10 flop/s.
    u_pts = 3 * num_points
    java_iter_s = 1.0 / ((u_pts**3 / 6) / 5e10)

    print(json.dumps({
        "metric": f"lm_iterations_per_s_{num_points}pts_{num_images}img",
        "value": round(rate, 4),
        "unit": "lm_iter/s",
        "vs_baseline": round(rate / java_iter_s, 1),
    }))


if __name__ == "__main__":
    main()
