"""Checkpoint + resume through the solver loop: interrupting after k
iterations and resuming must reach the same solution."""

import os
import tempfile

import numpy as np

from bundle_adjustment_tpu import BundleAdjustment, EstimationState, MatrixInversion
from bundle_adjustment_tpu.testing import make_synthetic_scene


def _build(seed=81):
    cameras, scale_bars, truth = make_synthetic_scene(
        num_points=25, num_images=5, noise=1e-4, sigma=1e-4,
        perturb=0.05, seed=seed)
    adj = BundleAdjustment()
    adj.add(cameras[0])
    for sb in scale_bars:
        adj.add(sb)
    adj.set_invert_normal_equation(MatrixInversion.NONE)
    return adj, truth


def test_checkpoint_resume_matches_straight_run():
    with tempfile.TemporaryDirectory() as d:
        ck = os.path.join(d, "lm.npz")

        # straight run
        adj1, truth1 = _build()
        assert adj1.estimate_model() == EstimationState.ERROR_FREE_ESTIMATION
        pts1 = np.array([[oc.x.value, oc.y.value, oc.z.value]
                         for oc in truth1["coords"]])

        # run that checkpoints every iteration and is cut short
        adj2, truth2 = _build()
        adj2.set_checkpointing(ck, every_n_iterations=1)
        adj2.set_maximal_number_of_iterations(3)
        adj2.estimate_model()  # stops early (NO_CONVERGENCE is fine)
        assert os.path.exists(ck)

        # resume from the checkpoint with a fresh adjustment
        adj3, truth3 = _build()
        adj3.resume_from(ck)
        assert adj3.estimate_model() == EstimationState.ERROR_FREE_ESTIMATION
        pts3 = np.array([[oc.x.value, oc.y.value, oc.z.value]
                         for oc in truth3["coords"]])

        assert np.allclose(pts3, pts1, atol=1e-9)
        assert np.isclose(adj3.omega, adj1.omega, rtol=1e-9)
