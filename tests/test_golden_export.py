"""Dispersion-level golden parity: committed export snapshot of the bundled
example (.info/.cxx/.mat, DefaultResultWriter.java:47-156 /
MatlabResultWriter.java:52-245), CLI smoke coverage, and covariance-on-demand
vs the dense Qxx on the example network itself (not a toy).
"""

import contextlib
import io as _io
import os
import subprocess
import sys

import numpy as np
import pytest

EXAMPLE = "/root/reference/JAICOV/example"
GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.isdir(EXAMPLE), reason="reference example data not available")


@pytest.fixture(scope="module")
def cli_export(report_solution, tmp_path_factory):
    """Writer exports of the shared session golden solve (same adjustment
    the CLI report path produces: REDUCED inversion, default datum
    heuristic) — one solve for the whole suite, not one per file."""
    from bundle_adjustment_tpu.io.writers import (
        DefaultResultWriter,
        MatlabResultWriter,
    )

    adj, _, _ = report_solution
    out = tmp_path_factory.mktemp("export")
    base = str(out / "example")
    DefaultResultWriter(base).export(adj)
    MatlabResultWriter(base).export(adj)
    return adj, base


@pytest.mark.slow
def test_cli_report_stats(tmp_path):
    """End-to-end CLI run (argument parsing + solve + print format) pinning
    the AICON golden statistics (example.htm:36-42).  Slow: a second full
    solve beyond the shared session fixture."""
    import bundle_adjustment_tpu.__main__ as cli

    base = str(tmp_path / "example")
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli.main(["report", os.path.join(EXAMPLE, "example.htm"),
                       "--export", base, "--export-mat", base, "--quiet"])
    assert rc == 0
    stdout = buf.getvalue()
    assert "Number of observations:           19945" in stdout
    assert "Number of unknown parameters:     1147" in stdout
    assert "Number of datum conditions:       6" in stdout
    assert "Degree of freedom:                18804" in stdout
    for line in stdout.splitlines():
        if line.startswith("Variance of unit weight (post):"):
            s2 = float(line.split(":")[1])
    assert abs(np.sqrt(s2) - 0.000405) / 0.000405 < 0.01
    assert os.path.exists(base + ".info") and os.path.exists(base + ".mat")


def test_info_matches_snapshot(cli_export):
    """.info name/axis/value/covariance-index lines vs the committed golden
    snapshot (values to 1e-6 relative, indices exact)."""
    _, base = cli_export
    new = open(base + ".info").read().strip().splitlines()
    ref = open(os.path.join(GOLDEN, "example.info")).read().strip().splitlines()
    assert len(new) == len(ref) > 400
    for ln, lr in zip(new, ref):
        cn, cr = ln.split(), lr.split()
        assert cn[0] == cr[0] and cn[1] == cr[1]  # name, axis
        assert cn[3] == cr[3]  # covariance column index
        vn, vr = float(cn[2]), float(cr[2])
        assert abs(vn - vr) <= 1e-6 * max(1.0, abs(vr))


def test_cxx_matches_snapshot(cli_export):
    """Full off-diagonal covariance rows of the .cxx export vs the committed
    fingerprint — this pins the *populated* dispersion, not just diagonals."""
    _, base = cli_export
    g = np.load(os.path.join(GOLDEN, "example_dispersion.npz"))
    cxx = np.loadtxt(base + ".cxx")
    assert cxx.shape == (g["cxx_diag"].shape[0],) * 2
    scale = np.abs(g["cxx_diag"]).max()
    np.testing.assert_allclose(np.diag(cxx), g["cxx_diag"],
                               rtol=1e-4, atol=1e-7 * scale)
    np.testing.assert_allclose(cxx[g["sel_rows_idx"]], g["cxx_sel_rows"],
                               rtol=1e-4, atol=1e-6 * scale)


def test_mat_matches_snapshot(cli_export):
    """.mat variable names identical to MatlabResultWriter.java:52-245 and
    the gathered unscaled cofactor blocks vs the committed fingerprint."""
    import scipy.io as sio

    _, base = cli_export
    g = np.load(os.path.join(GOLDEN, "example_dispersion.npz"))
    mat = sio.loadmat(base + ".mat")
    for name in ("variance_of_unit_weight_prio", "variance_of_unit_weight_post",
                 "degree_of_freedom", "number_of_observations",
                 "number_of_unknowns", "coordinates", "interior_orientations",
                 "distortion_parameters", "dispersion"):
        assert name in mat, name
    assert abs(float(mat["variance_of_unit_weight_post"].squeeze())
               - float(g["s2_post"])) < 1e-3 * float(g["s2_post"])
    disp = mat["dispersion"]
    assert disp.shape == (g["mat_disp_diag"].shape[0],) * 2
    scale = np.abs(g["mat_disp_diag"]).max()
    np.testing.assert_allclose(np.diag(disp), g["mat_disp_diag"],
                               rtol=1e-4, atol=1e-7 * scale)
    np.testing.assert_allclose(disp[-12:, -12:], g["mat_disp_tail"],
                               rtol=1e-4, atol=1e-6 * np.abs(g["mat_disp_tail"]).max())


def test_cli_unknown_fix_rejected():
    import bundle_adjustment_tpu.__main__ as cli
    from bundle_adjustment_tpu.io.readers import read_ior

    camera = read_ior(os.path.join(EXAMPLE, "example.ior"))
    with pytest.raises(SystemExit):
        cli._apply_fixes(camera, ["Q7"])


@pytest.fixture(scope="module")
def fixed_datum_twin():
    """The example network with a fixed-coordinate datum (both solver paths
    support it) and no scale bar: dense FULL Qxx vs covariance-on-demand."""
    import jax.numpy as jnp

    from bundle_adjustment_tpu.io.readers import AICONReportReader
    from bundle_adjustment_tpu.models.problem import ParamState
    from bundle_adjustment_tpu.parallel import rcs
    from bundle_adjustment_tpu.solver.adjustment import (
        BundleAdjustment,
        EstimationState,
        MatrixInversion,
    )

    reader = AICONReportReader(os.path.join(EXAMPLE, "example.htm")).read()
    camera = next(iter(reader.cameras.values()))
    # fix three short-named datum points (well spread), free everything else
    fixed = 0
    for name, oc in sorted(reader.object_coordinates.items()):
        oc.set_datum(False)
        if len(name) <= 3 and fixed < 3:
            for p in oc.params:
                p.fixed = True
            fixed += 1
    assert fixed == 3

    adj = BundleAdjustment()
    adj.add(camera)
    adj.use_centroided_coordinates = False
    adj.set_invert_normal_equation(MatrixInversion.FULL)
    status = adj.estimate_model()
    assert status == EstimationState.ERROR_FREE_ESTIMATION
    assert adj.get_number_of_datum_conditions() == 0

    bp = adj.problem
    problem = rcs.rcs_from_problem(bp, dtype=jnp.float64)
    state = ParamState(*(jnp.asarray(a, jnp.float64) for a in adj.state))
    blocks = rcs.linearize(problem, state, bp.spec,
                           jnp.asarray(0.0, jnp.float64))
    return adj, bp, problem, blocks


@pytest.mark.slow
def test_covariance_on_demand_matches_dense_on_example(fixed_datum_twin):
    """Matrix-free point/pair/camera covariance blocks == dense Qxx blocks on
    the example network (survey hard-part 5; BundleAdjustment.java:255-298)."""
    from bundle_adjustment_tpu.parallel import covariance

    adj, bp, problem, blocks = fixed_datum_twin
    Q = np.asarray(adj.get_cofactor_matrix())

    free = [i for i in range(bp.num_points)
            if (bp.col_points[i] >= 0).all()]
    ids = np.asarray(free[:: max(1, len(free) // 4)][:4])

    Qb = np.asarray(covariance.point_covariance_blocks(
        problem, blocks, ids, tol=1e-10, maxiter=3000))
    for j, pid in enumerate(ids):
        cols = bp.col_points[pid]
        dense = Q[np.ix_(cols, cols)]
        np.testing.assert_allclose(Qb[j], dense, rtol=2e-5,
                                   atol=1e-8 * np.abs(dense).max())

    # off-diagonal (point-pair) blocks — fully populated dispersion structure
    pairs = np.stack([ids[:2], ids[2:4]], axis=1)
    Qp = np.asarray(covariance.point_pair_covariance_blocks(
        problem, blocks, pairs, tol=1e-10, maxiter=3000))
    for j, (p, q) in enumerate(pairs):
        dense = Q[np.ix_(bp.col_points[p], bp.col_points[q])]
        np.testing.assert_allclose(Qp[j], dense, rtol=5e-4,
                                   atol=1e-7 * np.abs(dense).max())

    # camera EO block
    Qc = np.asarray(covariance.camera_covariance_blocks(
        problem, blocks, np.asarray([5]), tol=1e-10, maxiter=3000))
    cols = bp.col_eo[5]
    dense = Q[np.ix_(cols, cols)]
    np.testing.assert_allclose(Qc[0], dense, rtol=2e-5,
                               atol=1e-8 * np.abs(dense).max())


@pytest.mark.slow
def test_example_distortion_model_runs():
    """Smoke test of the Zernike-Gradient calibration example
    (ExampleDistortionModel.java:58-187) with pinned statistics."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples",
                                      "example_distortion_model.py")],
        capture_output=True, text=True, timeout=500, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Bundle adjustment finished successfully..." in r.stdout
    assert "Number of observations:           19945" in r.stdout
    assert "Number of unknown parameters:     1151" in r.stdout
    assert "Degree of freedom:                18800" in r.stdout
    assert "PRINCIPAL_DISTANCE          =  +28.0000000000 fixed" in r.stdout
