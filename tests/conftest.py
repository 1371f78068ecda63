"""Test configuration: CPU backend, 8 virtual devices, float64.

The environment pre-imports jax (sitecustomize) with JAX_PLATFORMS possibly
pointing at a TPU platform, so we must switch the platform via jax.config —
which works as long as no backend has been initialised yet — and set the
host-device-count XLA flag before first backend use.

Slow tests (full golden solves beyond the shared one, multi-process
communication, subprocess examples) are marked ``@pytest.mark.slow`` and
skipped by default; run the full suite with ``pytest --runslow``.  The one
REDUCED golden solve every golden test needs is a session-scope fixture
(``report_solution``) shared across files.
"""

import os

import pytest

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache: the suite is compile-dominated (10-60 s tests
# are mostly trace+compile); repeat runs skip all of it
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

EXAMPLE = "/root/reference/JAICOV/example"


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests marked slow (full opt-in suite)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running (extra golden solves, multi-process); "
                   "skipped unless --runslow")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow: opt in with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def report_solution():
    """THE shared golden solve: the bundled JAICOV example network from the
    AICON HTML report, ExampleReport datum selection, REDUCED inversion
    (ExampleReport.java:52-160).  Session-scoped so the whole suite pays for
    exactly one full example adjustment."""
    if not os.path.isdir(EXAMPLE):
        pytest.skip("reference example data not available")
    from bundle_adjustment_tpu.io.readers import read_aicon_report
    from bundle_adjustment_tpu.solver.adjustment import MatrixInversion

    adj, reader = read_aicon_report(os.path.join(EXAMPLE, "example.htm"))
    # ExampleReport datum selection: names longer than 3 chars excluded
    # (ExampleReport.java:70-81)
    for cam in reader.cameras.values():
        for img in cam:
            for ic in img:
                if len(ic.object_coordinate.name) > 3:
                    ic.object_coordinate.set_datum(False)
    adj.set_invert_normal_equation(MatrixInversion.REDUCED)
    status = adj.estimate_model()
    return adj, reader, status


@pytest.fixture(scope="session")
def report_solution_all_datum():
    """The same network with EVERY object point in the free-network datum —
    AICON's own datum definition (its report's per-point sigmas only
    reproduce under the all-points inner-constraint basis; the
    ExampleReport heuristic datum shifts them by up to ~8 %)."""
    if not os.path.isdir(EXAMPLE):
        pytest.skip("reference example data not available")
    from bundle_adjustment_tpu.io.readers import read_aicon_report
    from bundle_adjustment_tpu.solver.adjustment import MatrixInversion

    adj, reader = read_aicon_report(os.path.join(EXAMPLE, "example.htm"))
    adj.set_invert_normal_equation(MatrixInversion.REDUCED)
    status = adj.estimate_model()
    return adj, reader, status
