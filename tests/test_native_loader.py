"""Native C++ columnar loader: build, parse semantics, parity with the
pure-Python fallback and with the object-graph readers on the bundled
example data."""

import os

import numpy as np
import pytest

EXAMPLE = "/root/reference/JAICOV/example"


def test_native_builds():
    from bundle_adjustment_tpu import native

    assert native.native_available(), "g++ build of loader.cpp failed"


def test_parse_semantics(tmp_path):
    """BOM strip, comment skip, CRLF, optional columns, skip-on-parse-error,
    string interning — the LockFileReader contract
    (LockFileReader.java:69-103)."""
    from bundle_adjustment_tpu.native import parse_table, parse_table_py

    p = tmp_path / "t.txt"
    content = (
        "﻿P1 1.5 -2.5e3 0.25 1\r\n"
        "# comment line\n"
        "   \n"
        "P2 bad 2.0 3.0\n"          # unparsable float -> row dropped
        "P3 4.0 5.0 6.0\n"           # no datum column
        "P1 7.0 8.0 9.0 0\n"         # repeated key -> same id
    )
    p.write_text(content, encoding="utf-8")

    for fn in (parse_table, parse_table_py):
        t = fn(str(p), "sfffs")
        assert t.rows == 3
        ids, names = t.keys[0]
        assert names[ids[0]] == "P1" and names[ids[2]] == "P1"
        assert ids[0] == ids[2]
        assert names[ids[1]] == "P3"
        np.testing.assert_allclose(t.floats[0], [1.5, -2.5e3, 0.25])
        # P3 row: missing datum column -> NaN would only apply to 'f' slots;
        # string slot id is -1
        dat_ids, dat_uniq = t.keys[1]
        assert dat_ids[1] == -1
        assert dat_uniq[dat_ids[0]] == "1"
        np.testing.assert_array_equal(t.ncols, [5, 4, 5])


def test_int_column_rejects_floats(tmp_path):
    from bundle_adjustment_tpu.native import parse_table, parse_table_py

    p = tmp_path / "t.txt"
    p.write_text("1 10.0\n2.5 20.0\n3 30.0\n")
    for fn in (parse_table, parse_table_py):
        t = fn(str(p), "if")
        # row with non-integer first column dropped (Integer.parseInt)
        assert t.rows == 2
        np.testing.assert_allclose(t.floats[:, 0], [1.0, 3.0])


def test_native_matches_python_on_example():
    if not os.path.isdir(EXAMPLE):
        pytest.skip("reference example data not available")
    from bundle_adjustment_tpu.native import parse_table, parse_table_py

    path = os.path.join(EXAMPLE, "example.phc")
    a = parse_table(path, "isfffffffff")
    b = parse_table_py(path, "isfffffffff")
    assert a.rows == b.rows
    np.testing.assert_array_equal(a.ncols, b.ncols)
    np.testing.assert_allclose(a.floats, b.floats, rtol=0, atol=0)
    assert a.keys[0][1] == b.keys[0][1]
    np.testing.assert_array_equal(a.keys[0][0], b.keys[0][0])


def test_columnar_flat_pipeline(tmp_path):
    """Columnar loaders agree with the object-graph flat readers and the
    assembled RCSProblem solves a tiny synthetic network."""
    import jax.numpy as jnp

    from bundle_adjustment_tpu.io import columnar
    from bundle_adjustment_tpu.io.readers import (
        read_image_coordinates_flat,
        read_object_coordinates_flat,
    )
    from bundle_adjustment_tpu.models.scene import Camera
    from bundle_adjustment_tpu.testing import look_at_wpk

    rng = np.random.default_rng(7)
    P, M = 40, 6
    pts = rng.uniform(-5, 5, (P, 3))
    pts[:, 2] *= 0.2
    eo = np.zeros((M, 6))
    for m in range(M):
        ang = 2 * np.pi * m / M
        pos = np.array([30 * np.cos(ang), 30 * np.sin(ang), 25.0])
        w, p_, k = look_at_wpk(pos, np.zeros(3))
        eo[m] = [*pos, w, p_, k]
    io = np.array([0.0, 0.0, -30.0])

    # write flat files
    obc = tmp_path / "pts.txt"
    with open(obc, "w") as f:
        for i, p in enumerate(pts):
            datum = " 1" if i < 4 else ""
            f.write(f"T{i} {p[0]:.9f} {p[1]:.9f} {p[2]:.9f}{datum}\n")
    eor = tmp_path / "eo.txt"
    with open(eor, "w") as f:
        for m in range(M):
            vals = " ".join(f"{v:.9f}" for v in eo[m])
            f.write(f"1 {100 + m} {vals}\n")
    iof = tmp_path / "io.txt"
    iof.write_text("1 0.0 0.0 -30.0\n")

    # exact projections via the forward model
    from bundle_adjustment_tpu.models.distortion import DistortionSpecBuilder
    from bundle_adjustment_tpu.models.problem import ParamState
    from bundle_adjustment_tpu.ops.residuals import predict_image_point
    from bundle_adjustment_tpu.ops.assembly import gather_local_params
    import jax

    spec = DistortionSpecBuilder().build()
    obs_point = np.repeat(np.arange(P, dtype=np.int32), M)
    obs_image = np.tile(np.arange(M, dtype=np.int32), P)
    st = ParamState(points=jnp.asarray(pts), io=jnp.asarray(io[None]),
                    dist=jnp.zeros((1, 0)), eo=jnp.asarray(eo))
    local = gather_local_params(st, jnp.asarray(obs_point),
                                jnp.asarray(obs_image), jnp.zeros(M, jnp.int32))
    xy = np.asarray(jax.vmap(
        lambda l: predict_image_point(l, spec, 0.0))(local))

    phc = tmp_path / "imgcoords.txt"
    with open(phc, "w") as f:
        for (pi, mi, (x, y)) in zip(obs_point, obs_image, xy):
            f.write(f"1 {100 + mi} T{pi} {x:.12f} {y:.12f} 0.001 0.001\n")

    # columnar vs object-graph parity
    arr = columnar.load_object_coordinates(str(obc))
    ref = read_object_coordinates_flat(str(obc))
    assert arr.names == list(ref.keys())
    np.testing.assert_allclose(
        arr.xyz, [[oc.x.value, oc.y.value, oc.z.value] for oc in ref.values()])
    np.testing.assert_array_equal(arr.datum, [oc.datum for oc in ref.values()])

    cam = Camera(1)
    read_image_coordinates_flat(str(phc), cam, ref)
    n_graph = sum(len(img) for img in cam)
    obs = columnar.load_image_coordinates(str(phc))
    assert obs.xy.shape[0] == n_graph == P * M

    # end-to-end: perturb -> solve with the RCS path
    problem, state, spec2 = columnar.build_rcs_problem(
        str(obc), str(phc), str(eor), io_path=str(iof), spec=spec,
        dtype=jnp.float64)
    assert problem.num_points == P and problem.num_images == M
    pert = state.points + jnp.asarray(
        rng.normal(0, 0.01, (P, 3)) * np.asarray(problem.free_point))
    state = state._replace(points=pert)

    from bundle_adjustment_tpu.parallel import rcs

    damping = jnp.asarray(0.0)
    st2 = state
    for _ in range(4):
        dxp, dxc, dxg, blocks, it = rcs.lm_step(
            problem, st2, spec2, damping, cg_tol=1e-12, cg_maxiter=200)
        st2, max_dx = rcs.apply_step(st2, problem, dxp, dxc, dxg)
    np.testing.assert_allclose(np.asarray(st2.points), pts, atol=5e-8)
