"""Multi-host (2-process jax.distributed) CPU test: the survey's section
4(d) prescription.  Two controller processes with 4 virtual CPU devices
each form one 8-device global mesh; the SPMD LM step (parallel/spmd.py)
runs across them with psum collectives crossing the process boundary.
Both processes must produce identical replicated results, and those must
match a single-process 8-device run of the same problem."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_spmd_step():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    worker = os.path.join(REPO, "tests", "_multihost_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", coord],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=REPO, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                parts = line.split()
                results[int(parts[1])] = [float(v) for v in parts[2:]]
    assert set(results) == {0, 1}, results
    # both processes see identical replicated outputs
    np.testing.assert_allclose(results[0], results[1], rtol=0, atol=0)
    max_dx, omega0, it, pt00 = results[0]
    assert np.isfinite(max_dx) and np.isfinite(omega0) and it >= 1

    # cross-check against a single-process 8-device run of the same problem
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from __graft_entry__ import _build_problem
    from bundle_adjustment_tpu.parallel import spmd

    rp, state, spec = _build_problem(num_points=12, num_images=4,
                                     pad_multiple=8)
    mesh = Mesh(np.array(jax.devices()[:8]), ("obs",))
    rp_s = spmd.shard_problem(rp, mesh)
    step = spmd.make_spmd_lm_step(rp_s, spec, mesh, cg_tol=1e-10,
                                  cg_maxiter=200)
    new_state, mdx1, om1, it1 = step(state)
    np.testing.assert_allclose(max_dx, float(mdx1), rtol=1e-5)
    np.testing.assert_allclose(omega0, float(om1), rtol=1e-6)
