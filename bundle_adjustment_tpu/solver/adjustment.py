"""Bundle adjustment estimation engine.

Re-implementation of the reference solver (`BundleAdjustment.java`, survey
rows F1-F15) on the array-based problem representation:

* Gauss-Newton / Levenberg-Marquardt loop with the reference's exact
  bookkeeping: multiplicative diagonal damping, alpha = min(0.25 *
  lambda^-0.05, 0.75) step scaling, 0.2x / 5x lambda schedule with gain test
  on Omega, step rejection, damping auto-shutoff, sqrt(eps) convergence on the
  preconditioned step (estimateModel/updateModel, :203-462);
* Jacobi preconditioning V = diag(N)^(-1/2) (NormalEquationSystem.java:75-91);
* free-network datum via bordered inner-constraint rows, solved as a
  symmetric indefinite system (the LAPACK dspsv path of
  MathExtension.java:338-366 becomes an LU solve — identical solution);
* MatrixInversion modes NONE / FULL / REDUCED / PRE_ELIMINATION with the
  batched EO Schur complement (ops/schur.py);
* centroid centering of all free coordinates (centroidCoordinates, :115-201);
* a-priori / a-posteriori variance of unit weight (:1090-1101, F11).

The per-iteration compute (assembly -> precondition -> reduce -> solve ->
back-substitute -> de-precondition) is one jit-compiled function; the LM
control flow stays in Python, mirroring the reference state machine and
firing the same estimation-state events.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import DEFAULT_MAX_ITERATIONS, SQRT_EPS
from ..models.layout import assign_columns
from ..models.problem import BundleProblem, CompiledScene, ParamState, compile_problem
from ..models.scene import Camera, DirectlyObservedParameterGroup, ScaleBar
from ..ops.assembly import make_assembler, make_omega_fn
from ..ops.schur import assemble_full_dx, reduce_eo


class MatrixInversion(enum.Enum):
    NONE = "none"
    FULL = "full"
    PRE_ELIMINATION = "pre_elimination"
    REDUCED = "reduced"


class EstimationType(enum.Enum):
    L2NORM = "l2norm"
    SIMULATION = "simulation"


class EstimationState(enum.IntEnum):
    """Mirrors EstimationStateType ids (EstimationStateType.java:24-60)."""

    ERROR_FREE_ESTIMATION = 1
    BUSY = 0
    ITERATE = -1
    CONVERGENCE = -2
    LEVENBERG_MARQUARDT_STEP = -3
    INVERT_NORMAL_EQUATION_MATRIX = -4
    ESTIMATE_STOCHASTIC_PARAMETERS = -5
    INTERRUPT = -6
    SINGULAR_MATRIX = -7
    NO_CONVERGENCE = -8
    OUT_OF_MEMORY = -9
    EXPORT_ADJUSTMENT_RESULTS = -10
    EXPORT_ADJUSTMENT_RESULTS_FAILED = -11


@dataclass
class _Kernels:
    assemble: Callable
    omega: Callable
    solve_intermediate: Callable
    solve_final: Callable


def lm_gain_update(adapted_damping: float, omega_prev: float,
                   omega_cur: float):
    """The reference's gain-ratio damping schedule, shared by the dense and
    the scale (parallel/solver.py) LM drivers.

    prevOmega >= curOmega accepts the step and relaxes lambda x0.2;
    otherwise lambda grows x5 up to the runaway cap 1/sqrt(eps), at which
    point Omega is reset to 0 so the *next* gain test necessarily accepts —
    the escape hatch that forces a step instead of diverging lambda
    (BundleAdjustment.java:403-415).

    Returns (new_damping, new_omega, accepted)."""
    prev = omega_prev if omega_prev > 0 else float(np.finfo(float).max)
    if prev >= omega_cur:
        return adapted_damping * 0.2, omega_cur, True
    adapted_damping *= 5.0
    omega = omega_cur
    if adapted_damping > 1.0 / SQRT_EPS:
        adapted_damping = 1.0 / SQRT_EPS
        omega = 0.0
    return adapted_damping, omega, False


class BundleAdjustment:
    """User-facing solver, API-compatible with the reference class
    (BundleAdjustment.java:652-665, 1123-1199)."""

    def __init__(self) -> None:
        self.cameras: list[Camera] = []
        self.scale_bars: list[ScaleBar] = []
        self.direct_groups: list[DirectlyObservedParameterGroup] = []
        self.estimation_type = EstimationType.L2NORM
        self.invert_normal_equation = MatrixInversion.FULL
        self.max_iterations = DEFAULT_MAX_ITERATIONS
        self.damping_value = 0.0
        self.use_centroided_coordinates = True
        self.apply_aposteriori_variance = True
        self.result_writer = None
        self._listeners: list[Callable[[str, object, object], None]] = []
        self._interrupt = False
        # checkpoint/resume (new capability; survey section 5)
        self.checkpoint_path: Optional[str] = None
        self.checkpoint_every: int = 0
        self._resume_from: Optional[str] = None

        self.compiled: Optional[CompiledScene] = None
        self.state: Optional[ParamState] = None
        self.Qxx: Optional[np.ndarray] = None
        self.omega: float = 0.0
        self.max_abs_dx: float = 0.0
        self.iteration_step: int = 0
        self.status = EstimationState.BUSY
        self.dtype = jnp.float64

    # ------------------------------------------------------------------ API
    def add(self, *items) -> None:
        for item in items:
            if isinstance(item, Camera):
                self.cameras.append(item)
            elif isinstance(item, ScaleBar):
                self.scale_bars.append(item)
            elif isinstance(item, DirectlyObservedParameterGroup):
                self.direct_groups.append(item)
            else:
                raise TypeError(f"cannot add {type(item)!r}")

    def set_estimation_type(self, t: EstimationType) -> None:
        if t not in (EstimationType.L2NORM, EstimationType.SIMULATION):
            raise ValueError(f"unsupported estimation type {t!r}")
        self.estimation_type = t

    def set_invert_normal_equation(self, inv: MatrixInversion) -> None:
        self.invert_normal_equation = inv

    def set_levenberg_marquardt_damping_value(self, lam: float) -> None:
        self.damping_value = abs(lam)

    def set_maximal_number_of_iterations(self, n: int) -> None:
        self.max_iterations = int(n)

    def add_property_change_listener(self, fn) -> None:
        self._listeners.append(fn)

    def interrupt(self) -> None:
        self._interrupt = True

    def set_adjustment_result_writer(self, writer) -> None:
        self.result_writer = writer

    def set_checkpointing(self, path: str, every_n_iterations: int = 10) -> None:
        """Write an LM-state checkpoint every N iterations (atomic .npz)."""
        self.checkpoint_path = path
        self.checkpoint_every = int(every_n_iterations)

    def resume_from(self, path: str) -> None:
        """Resume the next estimate_model() from a saved checkpoint (the
        scene must be identical to the one that produced it)."""
        self._resume_from = path

    def _fire(self, name: str, old, new) -> None:
        for fn in self._listeners:
            fn(name, old, new)

    # ------------------------------------------------------------- numbers
    @property
    def problem(self) -> BundleProblem:
        return self.compiled.problem

    def get_number_of_observations(self) -> int:
        return self.problem.num_observation_rows

    def get_number_of_unknown_parameters(self) -> int:
        return self.problem.num_unknowns

    def get_number_of_datum_conditions(self) -> int:
        return self.problem.defect

    def get_degree_of_freedom(self) -> int:
        return self.problem.dof

    def get_variance_factor_apriori(self) -> float:
        return self.problem.sigma2_apriori

    def get_variance_factor_aposteriori(self) -> float:
        dof = self.get_degree_of_freedom()
        if (dof > 0 and self.omega > 0
                and self.estimation_type != EstimationType.SIMULATION
                and self.apply_aposteriori_variance):
            return abs(self.omega / dof)
        return self.problem.sigma2_apriori

    def get_cofactor_matrix(self) -> Optional[np.ndarray]:
        if self.invert_normal_equation == MatrixInversion.NONE:
            return None
        return self.Qxx

    def get_object_coordinates(self):
        return self.compiled.object_coordinates

    def get_image_residuals(self) -> np.ndarray:
        """Post-fit image-coordinate residuals v = observed - predicted
        [N, 2] at the estimated parameters (diagnostic; the reference only
        exposes Omega, survey F9)."""
        from ..ops.assembly import make_image_block_fn

        blocks_fn = make_image_block_fn(self.problem)
        _, w, _ = blocks_fn(self.state)
        return np.asarray(w)

    # ------------------------------------------------------------- kernels
    def _build_kernels(self) -> _Kernels:
        p = self.problem
        T = p.total_size
        nR = p.reduced_size
        col_eo = jnp.asarray(p.col_eo)
        assemble = make_assembler(p)
        omega = make_omega_fn(p)
        simulation = self.estimation_type == EstimationType.SIMULATION
        mode = self.invert_normal_equation

        def precondition(N, n, V):
            return V[:, None] * N * V[None, :], V * n

        def solve_intermediate(state: ParamState, damping):
            N, n, V = assemble(state, damping)
            if simulation:
                n = jnp.zeros_like(n)
            Np, npre = precondition(N, n, V)
            if mode == MatrixInversion.PRE_ELIMINATION:
                f = reduce_eo(Np, npre, col_eo, nR)
                dx1 = jnp.linalg.solve(f.S, f.nr)
                dx = assemble_full_dx(f, dx1, T)
            else:
                dx = jnp.linalg.solve(Np, npre)
            return V * dx

        def solve_final(state: ParamState, damping):
            N, n, V = assemble(state, damping)
            if simulation:
                n = jnp.zeros_like(n)
            Np, npre = precondition(N, n, V)
            if mode in (MatrixInversion.REDUCED, MatrixInversion.PRE_ELIMINATION):
                f = reduce_eo(Np, npre, col_eo, nR)
                Q1 = jnp.linalg.inv(f.S)
                dx1 = Q1 @ f.nr
                dx = assemble_full_dx(f, dx1, T)
                Q = jnp.zeros((T, T), Q1.dtype).at[:nR, :nR].set(Q1)
            elif mode == MatrixInversion.FULL:
                Q = jnp.linalg.inv(Np)
                dx = Q @ npre
            else:  # NONE
                dx = jnp.linalg.solve(Np, npre)
                Q = jnp.zeros((T, T), dx.dtype)
            Q = V[:, None] * Q * V[None, :]
            return V * dx, Q

        return _Kernels(
            assemble=jax.jit(assemble),
            omega=jax.jit(omega),
            solve_intermediate=jax.jit(solve_intermediate),
            solve_final=jax.jit(solve_final),
        )

    # ------------------------------------------------------- centroid pass
    def _centroid(self, state: ParamState, invert: bool,
                  centroid: Optional[np.ndarray]) -> tuple[ParamState, np.ndarray]:
        """centroidCoordinates (BundleAdjustment.java:115-201): shift all
        *free* object/camera coordinates (and directly observed coordinate
        values) by -/+ centroid of the free coordinates."""
        p = self.problem
        pts = np.asarray(state.points)
        eo = np.asarray(state.eo)
        fp = p.free_points  # [P, 3]
        fe = p.free_eo_pos  # [M, 3]

        if not invert:
            sums = np.zeros(3)
            cnts = np.zeros(3, int)
            for k in range(3):
                sums[k] = pts[:, k][fp[:, k]].sum() + eo[:, k][fe[:, k]].sum()
                cnts[k] = fp[:, k].sum() + fe[:, k].sum()
            if not (cnts[0] == cnts[1] == cnts[2] and cnts[0] > 0):
                raise ValueError(
                    f"unequal numbers of free coordinate components {cnts}")
            centroid = sums / cnts

        sign = 1.0 if invert else -1.0
        shift = sign * centroid
        pts = pts + np.where(fp, shift[None, :], 0.0)
        eo = eo.copy()
        eo[:, :3] += np.where(fe, shift[None, :], 0.0)

        # directly observed coordinate values shift too (:185-200)
        for dg, group in zip(p.direct_groups, self.direct_groups):
            for i, obs in enumerate(group.observations):
                t = obs.param_type
                if t in ("OBJ_X", "CAM_X"):
                    dg.values[i] += shift[0]
                elif t in ("OBJ_Y", "CAM_Y"):
                    dg.values[i] += shift[1]
                elif t in ("OBJ_Z", "CAM_Z"):
                    dg.values[i] += shift[2]

        return ParamState(points=jnp.asarray(pts), io=state.io,
                          dist=state.dist, eo=jnp.asarray(eo)), centroid

    # ------------------------------------------------------------ updating
    def _apply_dx(self, state: ParamState, dx: np.ndarray) -> tuple[ParamState, float]:
        """x <- x + dx via the column maps; returns max|dx| over assigned
        columns (updateUnknownParameters, BundleAdjustment.java:444-462)."""
        p = self.problem
        dxp = np.concatenate([np.asarray(dx), [0.0]])
        T = p.total_size

        def upd(arr, cols):
            c = np.where(cols >= 0, cols, T)
            return np.asarray(arr) + dxp[c]

        new = ParamState(
            points=jnp.asarray(upd(state.points, p.col_points)),
            io=jnp.asarray(upd(state.io, p.col_io)),
            dist=jnp.asarray(upd(state.dist, p.col_dist)),
            eo=jnp.asarray(upd(state.eo, p.col_eo)),
        )
        assigned = np.zeros(T, bool)
        for cols in (p.col_points, p.col_io, p.col_dist, p.col_eo):
            assigned[cols[cols >= 0]] = True
        max_abs = float(np.abs(np.asarray(dx)[assigned]).max()) if assigned.any() else 0.0
        return new, max_abs

    # ----------------------------------------------------------- main loop
    def estimate_model(self) -> EstimationState:
        self.status = EstimationState.BUSY
        self._fire(self.status.name, False, True)

        derive_first_damping = self.damping_value > 0
        adapted_damping = 0.0
        self.max_abs_dx = 0.0
        last_valid_max_abs_dx = 0.0
        self.omega = 0.0

        # prepare: layout + compile
        layout = assign_columns(self.cameras, self.scale_bars, self.direct_groups)
        self.compiled = compile_problem(self.cameras, self.scale_bars,
                                        self.direct_groups, layout)
        state = ParamState(*(jnp.asarray(a, self.dtype)
                             for a in self.compiled.state))

        centroid = None
        resume = None
        if self._resume_from:
            from .checkpoint import LMCheckpoint

            resume = LMCheckpoint.load(self._resume_from)
            self._resume_from = None

        if resume is not None:
            state = ParamState(*(jnp.asarray(a, self.dtype)
                                 for a in resume.state))
            centroid = resume.centroid
        elif self.use_centroided_coordinates:
            state, centroid = self._centroid(state, False, None)

        kernels = self._build_kernels()

        runs = self.max_iterations - 1
        is_estimated = False
        estimate_complete = False
        converged = True
        if self.max_iterations == 0:
            estimate_complete = is_estimated = True

        if resume is not None:
            runs = max(1, self.max_iterations - 1 - resume.iteration)
            adapted_damping = resume.adapted_damping
            self.omega = resume.omega
            last_valid_max_abs_dx = resume.max_abs_dx

        Qxx = None
        while not estimate_complete:
            self.max_abs_dx = 0.0
            self.iteration_step = self.max_iterations - runs
            self.status = EstimationState.ITERATE
            self._fire(self.status.name, self.max_iterations, self.iteration_step)

            if derive_first_damping:
                adapted_damping = self.damping_value
                derive_first_damping = False

            estimate_complete = is_estimated
            try:
                if estimate_complete:
                    if self.invert_normal_equation != MatrixInversion.NONE:
                        self.status = EstimationState.INVERT_NORMAL_EQUATION_MATRIX
                        self._fire(self.status.name, False, True)
                    dx, Qxx = kernels.solve_final(state, adapted_damping)
                    dx = np.asarray(dx)
                    Qxx = np.asarray(Qxx)
                    if self.invert_normal_equation != MatrixInversion.NONE:
                        self.status = EstimationState.ESTIMATE_STOCHASTIC_PARAMETERS
                        self._fire(self.status.name, False, True)
                else:
                    dx = np.asarray(kernels.solve_intermediate(state, adapted_damping))
            except (np.linalg.LinAlgError, FloatingPointError):
                # factorisation failure (jnp.linalg usually signals
                # singularity via NaN instead — caught by the non-finite
                # check below; EstimationStateType.java:36-42)
                self.status = EstimationState.SINGULAR_MATRIX
                self._fire(self.status.name, False, True)
                return self.status
            except Exception as exc:  # XLA runtime errors: map OOM, re-raise bugs
                if "RESOURCE_EXHAUSTED" in str(exc) or isinstance(exc, MemoryError):
                    self.status = EstimationState.OUT_OF_MEMORY
                    self._fire(self.status.name, False, True)
                    return self.status
                raise

            # ---- updateModel (:389-442)
            rejected = False
            if adapted_damping > 0:
                alpha = min(0.25 * adapted_damping ** -0.05, 0.75)
                dx = dx * alpha
                cur_omega = float(kernels.omega(state, jnp.asarray(dx)))
                last_damping = adapted_damping
                adapted_damping, self.omega, lma_converge = lm_gain_update(
                    adapted_damping, self.omega, cur_omega)
                self.status = EstimationState.LEVENBERG_MARQUARDT_STEP
                self._fire(self.status.name, last_damping, adapted_damping)
                if not lma_converge:
                    self.max_abs_dx = last_valid_max_abs_dx
                    rejected = True

            if not rejected:
                if estimate_complete:
                    self.omega = (0.0 if self.estimation_type == EstimationType.SIMULATION
                                  else float(kernels.omega(state, jnp.asarray(dx))))
                state, self.max_abs_dx = self._apply_dx(state, dx)
                last_valid_max_abs_dx = self.max_abs_dx

            if self._interrupt:
                self.status = EstimationState.INTERRUPT
                self._fire(self.status.name, False, True)
                self._interrupt = False
                return self.status

            if not np.isfinite(self.max_abs_dx):
                self.status = EstimationState.SINGULAR_MATRIX
                self._fire(self.status.name, False, True)
                return self.status
            elif self.max_abs_dx <= SQRT_EPS and runs > 0 and adapted_damping == 0:
                is_estimated = True
                self.status = EstimationState.CONVERGENCE
                self._fire(self.status.name, SQRT_EPS, self.max_abs_dx)
            elif runs <= 1:
                if estimate_complete:
                    self.status = EstimationState.NO_CONVERGENCE
                    self._fire(self.status.name, SQRT_EPS, self.max_abs_dx)
                    converged = False
                is_estimated = True
                runs -= 1
            else:
                runs -= 1
                self.status = EstimationState.CONVERGENCE
                self._fire(self.status.name, SQRT_EPS, self.max_abs_dx)

            if (is_estimated or adapted_damping <= SQRT_EPS
                    or runs < self.max_iterations * 0.5 + 1):
                adapted_damping = 0.0

            if (self.checkpoint_path and self.checkpoint_every > 0
                    and self.iteration_step % self.checkpoint_every == 0):
                from .checkpoint import LMCheckpoint

                LMCheckpoint(
                    state=state, iteration=self.iteration_step,
                    adapted_damping=adapted_damping, omega=self.omega,
                    max_abs_dx=self.max_abs_dx, centroid=centroid,
                ).save(self.checkpoint_path)

        if self.use_centroided_coordinates:
            state, _ = self._centroid(state, True, centroid)

        self.state = state
        self.Qxx = Qxx
        self.compiled.write_back(state)

        if self.result_writer is not None:
            try:
                self.status = EstimationState.EXPORT_ADJUSTMENT_RESULTS
                self._fire(self.status.name, None, str(self.result_writer))
                self.result_writer.export(self)
            except Exception:
                self.status = EstimationState.EXPORT_ADJUSTMENT_RESULTS_FAILED
                self._fire(self.status.name, False, True)
                return self.status

        if not converged:
            self.status = EstimationState.NO_CONVERGENCE
            self._fire(self.status.name, SQRT_EPS, self.max_abs_dx)
        else:
            self.status = EstimationState.ERROR_FREE_ESTIMATION
            self._fire(self.status.name, SQRT_EPS, self.max_abs_dx)
        return self.status
