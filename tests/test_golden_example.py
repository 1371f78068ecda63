"""Golden parity test against the bundled JAICOV example network.

The de-facto regression oracle of the reference is the independent AICON 3D
Studio solution embedded in `JAICOV/example/example.htm` (survey section 4):
n=19945, u=1147, b=6, redundancy=18804, sigma0_post=0.000405 (a-priori
0.0005), RMS point sigma ~ 0.00318/0.00368/0.00310.  The reference's own
ExampleReport pipeline reproduces those; so must we.
"""

import os

import numpy as np
import pytest

EXAMPLE = "/root/reference/JAICOV/example"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(EXAMPLE), reason="reference example data not available")

# `report_solution` (the one shared REDUCED golden solve) lives in
# conftest.py at session scope.


def parse_aicon_point_sigmas(path):
    """Per-point sigma_x/y/z from the AICON report's object-point table
    (example.htm "*** Objektpunkte ***", columns
    `Punkt Nr. | x | y | z | sx | sy | sz | Strahlen | Ausreisser`) —
    the independent oracle for the *per-point* posterior dispersion, not
    just the RMS summary row."""
    sigmas = {}
    in_table = False
    for line in open(path, encoding="utf-8", errors="replace"):
        if '<a name="object_points">' in line:
            in_table = True
            continue
        if in_table:
            if "Standardabweichung" in line or line.startswith("<h4"):
                break
            cols = line.split()
            if len(cols) == 9:
                try:
                    name = cols[0]
                    vals = [float(c) for c in cols[1:7]]
                except ValueError:
                    continue
                sigmas[name] = np.array(vals[3:6])
    return sigmas


def test_report_parse_counts(report_solution):
    adj, reader, status = report_solution
    assert len(reader.cameras) == 1
    assert len(reader.images) == 115
    assert len(reader.object_coordinates) == 150
    assert len(reader.scale_bars) == 1


def test_statistics_match_aicon(report_solution):
    """Counts must match the AICON report exactly (example.htm:36-42)."""
    adj, reader, status = report_solution
    from bundle_adjustment_tpu.solver.adjustment import EstimationState

    assert status == EstimationState.ERROR_FREE_ESTIMATION
    assert adj.get_number_of_observations() == 19945
    assert adj.get_number_of_unknown_parameters() == 1147
    assert adj.get_number_of_datum_conditions() == 6
    assert adj.get_degree_of_freedom() == 18804
    # a-priori sigma0 = 0.0005 (minimum observation sigma)
    assert np.isclose(np.sqrt(adj.get_variance_factor_apriori()), 0.0005)


def test_sigma0_posterior_matches_aicon(report_solution):
    """sigma0_post = 0.000405 in the AICON report (example.htm:34); the two
    estimators differ slightly (outlier handling), tolerance 1%."""
    adj, _, _ = report_solution
    sigma0 = np.sqrt(adj.get_variance_factor_aposteriori())
    assert abs(sigma0 - 0.000405) / 0.000405 < 0.01


def test_point_sigma_rms_matches_aicon(report_solution):
    """RMS per-axis point sigmas ~ 0.00318 / 0.00368 / 0.00310
    (example.htm residual tables); tolerance 3%."""
    adj, _, _ = report_solution
    D = adj.get_cofactor_matrix() * adj.get_variance_factor_aposteriori()
    sx, sy, sz = [], [], []
    for oc in adj.get_object_coordinates():
        if all(p.column >= 0 for p in oc.params):
            sx.append(np.sqrt(abs(D[oc.x.column, oc.x.column])))
            sy.append(np.sqrt(abs(D[oc.y.column, oc.y.column])))
            sz.append(np.sqrt(abs(D[oc.z.column, oc.z.column])))

    def rms(a):
        return float(np.sqrt(np.mean(np.square(a))))

    assert abs(rms(sx) - 0.00318) / 0.00318 < 0.03
    assert abs(rms(sy) - 0.00368) / 0.00368 < 0.03
    assert abs(rms(sz) - 0.00310) / 0.00310 < 0.03


def test_point_sigma_per_point_heuristic_datum(report_solution):
    """Element-wise per-point sigmas under the ORIGINAL ExampleReport
    heuristic datum (names <= 3 chars) vs the AICON table.  The datum bases
    differ, shifting sigmas systematically by up to ~8 % (measured); the
    loose 10 % bound still catches gross dispersion errors point-by-point
    on the configuration ExampleReport.java:70-81 actually runs (the tight
    2 % check lives on the all-datum fixture below)."""
    adj, _, _ = report_solution
    ref = parse_aicon_point_sigmas(os.path.join(EXAMPLE, "example.htm"))
    D = adj.get_cofactor_matrix() * adj.get_variance_factor_aposteriori()
    checked = 0
    for oc in adj.get_object_coordinates():
        if oc.name not in ref or not all(p.column >= 0 for p in oc.params):
            continue
        ours = np.sqrt(np.abs([D[p.column, p.column] for p in oc.params]))
        err = np.abs(ours - ref[oc.name])
        tol = 0.10 * ref[oc.name] + 0.000051
        assert (err <= tol).all(), (
            f"point {oc.name}: ours={ours} aicon={ref[oc.name]}")
        checked += 1
    assert checked > 140


def test_point_sigma_per_point_matches_aicon(report_solution_all_datum):
    """Element-wise per-point sigma_x/y/z vs the AICON report's object-point
    table (example.htm ~1605-1760) — an *independent external oracle* for the
    populated posterior dispersion, point by point rather than in RMS.

    Uses the all-points datum solve: AICON's free-network basis spans every
    object point (under the ExampleReport heuristic datum the sigmas shift
    systematically by up to ~8 %; under all-datum every point agrees).

    Tolerance: 2 % relative plus half a printed ULP (the table prints 4
    decimals, so values ~0.002 carry up to 0.000050 pure quantisation)."""
    adj, _, _ = report_solution_all_datum
    ref = parse_aicon_point_sigmas(os.path.join(EXAMPLE, "example.htm"))
    assert len(ref) > 140
    D = adj.get_cofactor_matrix() * adj.get_variance_factor_aposteriori()
    checked = 0
    for oc in adj.get_object_coordinates():
        if oc.name not in ref:
            continue
        if not all(p.column >= 0 for p in oc.params):
            continue
        ours = np.sqrt(np.abs([D[p.column, p.column] for p in oc.params]))
        err = np.abs(ours - ref[oc.name])
        tol = 0.02 * ref[oc.name] + 0.000051
        assert (err <= tol).all(), (
            f"point {oc.name}: ours={ours} aicon={ref[oc.name]}")
        checked += 1
    assert checked > 140


def test_estimated_points_match_aicon_inputs(report_solution):
    """The report's object coordinates are AICON's *estimates*; re-adjusting
    the same observations must reproduce them closely (<< point sigma)."""
    adj, reader, _ = report_solution
    diffs = []
    for oc in adj.get_object_coordinates():
        est = np.array([oc.x.value, oc.y.value, oc.z.value])
        # reader stored AICON's values as the starting values; compare against
        # a fresh parse
        diffs.append(est)
    # re-parse for the AICON input values
    from bundle_adjustment_tpu.io.readers import AICONReportReader

    fresh = AICONReportReader(os.path.join(EXAMPLE, "example.htm")).read()
    max_d = 0.0
    for oc in adj.get_object_coordinates():
        ref = fresh.object_coordinates.get(oc.name)
        if ref is None:
            continue
        d = np.linalg.norm([oc.x.value - ref.x.value,
                            oc.y.value - ref.y.value,
                            oc.z.value - ref.z.value])
        max_d = max(max_d, d)
    # agreement within ~3x the RMS point sigma (different datum handling)
    assert max_d < 0.02


@pytest.mark.slow
def test_flat_file_pipeline():
    """ExampleFlatFiles pipeline: .obc/.scale/.ior/.eor/.phc readers with
    fixed A3/Cx/Cy (ExampleFlatFiles.java:85-94) and a fully populated
    dispersion matrix on the observed datum coordinates."""
    from bundle_adjustment_tpu import (
        BundleAdjustment,
        DirectObservation,
        DirectlyObservedParameterGroup,
    )
    from bundle_adjustment_tpu.models.distortion import DistortionType
    from bundle_adjustment_tpu.io.readers import (
        read_eor,
        read_ior,
        read_obc,
        read_phc,
        read_scale,
    )
    from bundle_adjustment_tpu.solver.adjustment import (
        EstimationState,
        MatrixInversion,
    )

    base = os.path.join(EXAMPLE, "example")
    coords = read_obc(base + ".obc")
    scale_bars = read_scale(base + ".scale", coords)
    camera = read_ior(base + ".ior")
    camera.distortion(DistortionType.RADIAL_DISTORTION).get(3).fixed = True
    camera.distortion(DistortionType.AFFINITY_AND_SHEAR).cx.fixed = True
    camera.distortion(DistortionType.AFFINITY_AND_SHEAR).cy.fixed = True
    read_eor(base + ".eor", camera)
    read_phc(base + ".phc", camera, coords)

    # observed datum coordinates with a fully populated SPD dispersion
    rng = np.random.default_rng(12345)
    observed = []
    for img in camera:
        for ic in img:
            oc = ic.object_coordinate
            if len(oc.name) > 3:
                oc.set_datum(False)
            if oc.datum:
                oc.set_datum(False)
                observed.append(DirectObservation(oc.x, oc.x.value, 1.0, "OBJ_X", oc))
                observed.append(DirectObservation(oc.y, oc.y.value, 1.0, "OBJ_Y", oc))
                observed.append(DirectObservation(oc.z, oc.z.value, 1.0, "OBJ_Z", oc))
    n = len(observed)
    assert n > 0
    U = rng.normal(0, 0.001, (n, n))
    dispersion = U.T @ U
    group = DirectlyObservedParameterGroup(observed, dispersion)

    adj = BundleAdjustment()
    adj.add(camera)
    for sb in scale_bars:
        adj.add(sb)
    adj.add(group)
    adj.set_invert_normal_equation(MatrixInversion.REDUCED)
    status = adj.estimate_model()
    assert status == EstimationState.ERROR_FREE_ESTIMATION
    # all datum defects fixed by the observed coordinates -> d = 0
    assert adj.get_number_of_datum_conditions() == 0
    # the random fully populated dispersion is a demonstration stochastic
    # model (ExampleFlatFiles "!!! just for demonstrations !!!"), so only
    # sanity-check the variance factor, not its value
    ratio = (adj.get_variance_factor_aposteriori()
             / adj.get_variance_factor_apriori())
    assert np.isfinite(ratio) and ratio > 0
