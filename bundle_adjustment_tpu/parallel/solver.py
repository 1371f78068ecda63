"""Large-scale LM driver: the reference's damping semantics over the RCS path.

`solver/adjustment.BundleAdjustment` is the dense parity engine; this is its
large-scale counterpart operating on an RCSProblem: the same
Levenberg-Marquardt bookkeeping (multiplicative damping, alpha-scaled steps,
0.2x/5x gain schedule on Omega, step rejection, damping shutoff,
convergence on max|dx| — survey F1/F8) driving the implicit-Schur PCG inner
solver, with optional checkpointing.

Note the convergence criterion at scale: the reference's sqrt(eps_f64)
threshold is unreachable in f32; the default tolerance here is scaled to the
working dtype (sqrt of its machine epsilon).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.problem import ParamState
from . import rcs


@dataclass
class RCSResult:
    state: ParamState
    converged: bool
    iterations: int
    omega: float
    max_abs_dx: float
    history: list = field(default_factory=list)
    # EstimationState-style status taxonomy (EstimationStateType.java:24-60)
    status: "EstimationState" = None

    def __post_init__(self):
        if self.status is None:
            from ..solver.adjustment import EstimationState

            self.status = (EstimationState.ERROR_FREE_ESTIMATION
                           if self.converged
                           else EstimationState.NO_CONVERGENCE)


def solve(problem: rcs.RCSProblem, state: ParamState, spec,
          damping: float = 0.0,
          max_iterations: int = 100,
          tolerance: Optional[float] = None,
          cg_tol: float = 1e-6,
          cg_maxiter: int = 100,
          matvec_factory: Optional[Callable] = None,
          checkpoint_path: Optional[str] = None,
          checkpoint_every: int = 0,
          verbose: bool = False) -> RCSResult:
    """Run the LM loop to convergence on a large-scale problem.

    ``matvec_factory(blocks) -> matvec``: optional per-iteration S@x override
    (e.g. the fused Pallas kernel).
    """
    dtype = state.points.dtype
    if tolerance is None:
        tolerance = float(np.sqrt(np.finfo(np.dtype(dtype.name)).eps))

    adapted = float(damping)
    omega_prev = 0.0
    last_valid_dx = 0.0
    history = []

    @jax.jit
    def step_fn(st, lam):
        return rcs.lm_step_full(problem, st, spec, lam, cg_tol=cg_tol,
                                cg_maxiter=cg_maxiter,
                                matvec_factory=matvec_factory)

    @jax.jit
    def omega_fn(b, ext, dxp, dxc, dxg):
        return rcs.omega_at_full(problem, b, ext, dxp, dxc, dxg)

    @jax.jit
    def apply_fn(st, dxp, dxc, dxg, alpha):
        return rcs.apply_step(st, problem,
                              alpha * dxp, alpha * dxc, alpha * dxg)

    converged = False
    it_done = 0
    max_dx = float("inf")
    for k in range(max_iterations):
        it_done = k + 1
        lam = jnp.asarray(adapted, dtype)
        dxp, dxc, dxg, b, cg_it, ext = step_fn(state, lam)

        rejected = False
        alpha = 1.0
        if adapted > 0:
            alpha = min(0.25 * adapted ** -0.05, 0.75)
            cur = float(omega_fn(b, ext, alpha * dxp, alpha * dxc,
                                 alpha * dxg))
            prev = omega_prev if omega_prev > 0 else float(np.finfo(float).max)
            if prev >= cur:
                adapted *= 0.2
                omega_prev = cur
            else:
                adapted *= 5.0
                omega_prev = cur
                rejected = True
                max_dx = last_valid_dx

        if not rejected:
            state, mdx = apply_fn(state, dxp, dxc, dxg,
                                  jnp.asarray(alpha, dtype))
            max_dx = float(mdx)
            last_valid_dx = max_dx
            if omega_prev == 0.0:
                omega_prev = float(b.omega0)

        history.append({"iter": it_done, "max_dx": max_dx,
                        "damping": adapted, "cg_it": int(cg_it),
                        "omega0": float(b.omega0)})
        if verbose:
            print(f"it={it_done} max|dx|={max_dx:.3e} lam={adapted:.2e} "
                  f"cg={int(cg_it)} omega0={float(b.omega0):.4e}")

        if checkpoint_path and checkpoint_every and it_done % checkpoint_every == 0:
            from ..solver.checkpoint import LMCheckpoint

            LMCheckpoint(state=state, iteration=it_done,
                         adapted_damping=adapted, omega=omega_prev,
                         max_abs_dx=max_dx).save(checkpoint_path)

        if not np.isfinite(max_dx):
            from ..solver.adjustment import EstimationState

            return RCSResult(state=state, converged=False, iterations=it_done,
                             omega=omega_prev, max_abs_dx=max_dx,
                             history=history,
                             status=EstimationState.SINGULAR_MATRIX)
        if max_dx <= tolerance and adapted == 0:
            converged = True
            break
        if adapted <= tolerance or k > max_iterations * 0.5:
            adapted = 0.0

    return RCSResult(state=state, converged=converged, iterations=it_done,
                     omega=omega_prev, max_abs_dx=max_dx, history=history)
