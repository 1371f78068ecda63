"""Worker process for the 2-process jax.distributed CPU test
(tests/test_multihost.py).  Usage: _multihost_worker.py <pid> <nproc> <coord>.

Every process builds the same deterministic problem, shards the observation
axis over the global (cross-process) mesh, runs one SPMD LM step and prints
its replicated results — the parent asserts both processes agree.
"""

import os
import sys

proc_id = int(sys.argv[1])
nproc = int(sys.argv[2])
coord = sys.argv[3]

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from bundle_adjustment_tpu.parallel import multihost  # noqa: E402

multihost.initialize(coordinator_address=coord, num_processes=nproc,
                     process_id=proc_id)

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 4 * nproc, jax.device_count()
assert multihost.is_coordinator() == (proc_id == 0)

mesh = multihost.global_mesh("obs")

from __graft_entry__ import _build_problem  # noqa: E402
from bundle_adjustment_tpu.parallel import spmd  # noqa: E402

rp, state, spec = _build_problem(num_points=12, num_images=4,
                                 pad_multiple=jax.device_count())


def gshard(a, *axes):
    sh = NamedSharding(mesh, P(*axes))
    a = np.asarray(a)
    return jax.make_array_from_callback(a.shape, sh, lambda idx: a[idx])


# only the observation axis is globally sharded; replicated metadata
# (cam_of_image, r0, free masks) stays host-local — it is embedded as
# compile-time constants, identical on every controller
rp = rp._replace(
    obs_point=gshard(rp.obs_point, "obs"),
    obs_image=gshard(rp.obs_image, "obs"),
    obs_xy=gshard(rp.obs_xy, "obs", None),
    obs_weight=gshard(rp.obs_weight, "obs", None, None),
    point2obs=None, img2obs=None,
)
state = jax.tree.map(gshard, state)

step = spmd.make_spmd_lm_step(rp, spec, mesh, cg_tol=1e-10, cg_maxiter=200)
new_state, max_dx, omega0, it = step(state)
jax.block_until_ready(new_state)

# replicated outputs: every process sees identical values
print(f"RESULT {proc_id} {float(max_dx):.12e} {float(omega0):.12e} "
      f"{int(it)} {float(np.asarray(jax.device_get(new_state.points[0, 0]))):.12e}",
      flush=True)
