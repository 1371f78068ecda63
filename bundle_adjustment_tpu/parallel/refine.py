"""Mixed-precision refinement: f64 gradient + hi/lo state + f32 solve.

The f32 LM loop floors at max|dx| ~ 1e-3..1e-2 * noise scale because the
gradient g = J^T P w is a massively cancelling reduction: near the optimum
the true gradient is orders of magnitude below the per-term magnitudes, so
f32 rounding noise (amplified through S^{-1}) dominates the step (measured
floor ~8e-4 at the 100k-point bench, matching eps_f32 * term scale *
cond(S) — survey hard-part 1, BundleAdjustment.java:77,332 for the
reference's sqrt(eps_f64) criterion this must approach).

Classic iterative refinement fixes it: evaluate ONLY the gradient in f64
(one elementwise forward+Jacobian pass per outer iteration — XLA's f64
emulation on TPU costs ~90x f32 elementwise, which is a small fraction of
the full LM step), keep the state as an f32 hi+lo pair (parallel/hilo.py),
and run all S/preconditioner/CG machinery in plain f32.  Each outer
iteration then contracts the state error by the *relative* accuracy of the
f32 CG solve (~1e-2 at cg_tol 1e-7), reaching f64-grade max|dx| in a
handful of iterations.

Note the CG stall detector must be relaxed here: the default f32
stall_limit=8 exits at ~20% relative residual, which is exactly the
refinement contraction rate killer (measured: stall 8 -> 100% step error;
stall 100+ at tol 1e-7 -> ~2% step error).

Do NOT "optimise" this to an f64-residual-only scheme (f64 forward, f32
Jacobian + f32 J^T P w reduction): unlike linear-system refinement, the
bundle gradient's cancellation is ACROSS observation terms whose
residuals converge to the measurement noise sigma, not to zero — so both
the Jacobian's f32 rounding and f32 summation noise floor the gradient
at eps32 * sqrt(N) * |J P w|_rms regardless of how accurate w is
(measured: refinement stalls at max|dx| ~2e-5 instead of reaching 1e-7).
The full f64 linearise + f64 reduction below is load-bearing.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.problem import ParamState
from . import engine, hilo, rcs


def upcast_problem(problem: rcs.RCSProblem) -> rcs.RCSProblem:
    """f32 -> f64 copy of the float fields (indices untouched)."""
    def up(x):
        if hasattr(x, "dtype") and x.dtype == jnp.float32:
            return x.astype(jnp.float64)
        return x

    return jax.tree.map(up, problem)


class Refiner:
    """Engine-path (feature-major) mixed-precision refiner.

    Supports the full extras surface of the scale path: scale bars, Helmert
    inner-constraint datum (freenet low-rank corrections, coefficients in
    f32, the cancelling bar misclosure from the f64 pass) and direct
    observations (folded natively by the f64 lineariser; the de camera rhs
    term added in gradient64) — BundleAdjustment.java:493-635,
    PartialDerivativeFactory.java:210-283,447-473.

    Usage:
        r = Refiner(problem32, spec)
        s = hilo.from_f32(state32)          # after the plain f32 LM loop
        s, max_dx, omega0, it = r.step(s)   # repeat until max_dx <= tol

    ``gradient_device="cpu"`` (default) runs the f64 gradient pass on the
    CPU backend: XLA's f64 emulation on TPU inflates the HLO so much that
    the fused refine program took 200+ s to compile at the 100k-point
    scale (and its f64 closure constants defeat the persistent compile
    cache); on CPU the pass compiles in seconds and f64 is native.  Only
    the small (bp, bc, bg) gradient crosses the host boundary per
    iteration.  Pass ``gradient_device=None`` to keep everything on the
    accelerator (single fused program)."""

    def __init__(self, problem32: rcs.RCSProblem, spec,
                 couple_global: bool = True, use_pallas: bool = False,
                 gradient_device: str | None = "cpu",
                 matvec_passes: int = 3):
        if not jax.config.jax_enable_x64:
            raise RuntimeError(
                "mixed-precision refinement needs jax_enable_x64=True for "
                "its f64 gradient pass (f64 would silently truncate)")
        self.problem32 = problem32
        self.has_extras = problem32.has_extras
        self.spec = spec
        self.couple_global = couple_global
        self.use_pallas = use_pallas
        self.matvec_passes = matvec_passes
        self.fmp32 = engine.fm_problem(problem32)
        if use_pallas:
            # the Pallas kernels consume the view-major blocked lane order
            from . import kernels

            self.fmp32 = engine.to_view_major(
                self.fmp32, kernels.choose_pb(
                    self.fmp32.num_points, self.fmp32.views,
                    num_images=self.fmp32.num_images))
        self._gdev = (jax.devices("cpu")[0]
                      if gradient_device == "cpu" else None)
        if self._gdev is not None:
            with jax.default_device(self._gdev):
                p_host = jax.tree.map(
                    lambda x: jax.device_put(x, self._gdev)
                    if hasattr(x, "dtype") else x, problem32)
                p64 = upcast_problem(p_host)
                self.fmp64 = engine.fm_problem(p64)
        else:
            p64 = upcast_problem(problem32)
            self.fmp64 = engine.fm_problem(p64)
        # scale-bar / direct-group geometry for the f64 misclosures (tiny;
        # lives with fmp64)
        has_bars = (getattr(p64, "sb_a", None) is not None
                    and int(p64.sb_a.shape[0]) > 0)
        self._sb64 = ((p64.sb_a, p64.sb_b, p64.sb_length,
                       p64.sb_weight) if has_bars else None)
        has_dpg = (getattr(p64, "dpg_idx", None) is not None
                   and int(p64.dpg_idx.shape[0]) > 0)
        self._dpg64 = ((p64.dpg_idx, p64.dpg_axis, p64.dpg_val)
                       if has_dpg else None)
        self._grad = jax.jit(
            lambda st64: self.gradient64(self.fmp64, st64))
        # big problem arrays travel as jit ARGUMENTS: embedded constants
        # ship inside the serialized program through the remote-compile
        # relay — minutes of compile at 1M and, past ~400 MB, an outright
        # request-size rejection (parallel/bigargs.py)
        from . import bigargs

        # float_only: the step's ops.hxp image reduction gathers with
        # img_perm — argument index arrays explode XLA's gather lowering
        # (see bigargs.split_big)
        self._big_names, self._big_vals = bigargs.split_big(
            self.fmp32, float_only=True)
        self._step = jax.jit(self._step_impl, static_argnames=(
            "cg_tol", "cg_maxiter", "stall_limit"))

    def gradient64(self, fmp64, state64: ParamState):
        """(bp [P,3], bc [M,6], bg [G], omega0, w_sb [R]) in f64 — the only
        f64 pass.  bp/bc/bg are the FULL-space gradient blocks J^T P w incl.
        direct observations (linearize folds dp/dg natively; the de camera
        term is added here); w_sb is the f64 scale-bar misclosure vector
        (empty when the problem has no bars)."""
        b = engine.linearize(fmp64, state64, self.spec,
                             jnp.asarray(0.0, jnp.float64))
        bc = engine._image_sum_stack(
            fmp64,
            [b.Jc[a] * b.Pw[0] + b.Jc[6 + a] * b.Pw[1] for a in range(6)])
        if fmp64.de_w is not None:
            bc = bc + (fmp64.de_w * fmp64.free_eo
                       * (fmp64.de_val - state64.eo))
        omega0 = b.omega0
        wsb = jnp.zeros((0,), jnp.float64)
        if self._sb64 is not None:
            sa, sb, slen, sw = self._sb64
            dvec = state64.points[sb] - state64.points[sa]
            dist = jnp.sqrt(jnp.sum(dvec * dvec, axis=1))
            wsb = slen - dist
            omega0 = omega0 + jnp.sum(sw * wsb * wsb)
        wdpg = jnp.zeros((0,), jnp.float64)
        if self._dpg64 is not None:
            idx, ax, val = self._dpg64
            cur = jnp.take_along_axis(state64.points[idx], ax[:, None],
                                      axis=1)[:, 0]
            wdpg = val - cur
            # omega term added by prepare_extras via dpg_misclosure in the
            # f32 step path; the f64 omega0 here adds it exactly
            cov64 = self.problem32.dpg_cov.astype(jnp.float64)
            omega0 = omega0 + jnp.dot(wdpg, jnp.linalg.solve(cov64, wdpg))
        return jnp.stack(b.bp, axis=1), bc, b.bg, omega0, wsb, wdpg

    def _step_impl(self, big_, s: hilo.HiLoState, damping, bp32, bc32,
                   bg32, wsb32, wdpg32, cg_tol=1e-7, cg_maxiter=400,
                   stall_limit=200):
        from . import bigargs, freenet

        p32 = bigargs.merge(self.fmp32, self._big_names, big_)
        cam_gather = None
        if self.use_pallas:
            from . import kernels

            cam_gather = kernels.make_cam_gather(p32)
            b, _rc, _rg, Minv, pp = kernels.prepare_pallas(
                p32, s.hi, self.spec, damping,
                couple_global=self.couple_global, state_lo=s.lo,
                cam_gather=cam_gather)
        else:
            b, _rc, _rg, Minv = engine.prepare(
                p32, s.hi, self.spec, damping,
                couple_global=self.couple_global, state_lo=s.lo)
        ops = engine.point_ops(p32, b)
        z0 = ops.hinv(bp32)
        dc, dg = ops.hxp(z0)
        rc = bc32 - dc
        rg = bg32 - dg
        b = b._replace(bp=tuple(bp32[:, a] for a in range(3)),
                       bc=bc32, bg=bg32)
        ext = None
        if self.has_extras:
            # exact low-rank extras corrections around the f64 gradient:
            # coefficients (U, B, Cap, Bb) in f32 from the current hi state,
            # the cancelling bar misclosure from the f64 pass (wsb32)
            ext = freenet.prepare_extras(
                self.problem32, s.hi, bp32, rc, rg, ops,
                jnp.asarray(0.0, bp32.dtype), sb_misclosure=wsb32,
                dpg_misclosure=wdpg32)
            rc, rg = ext.rc, ext.rg
        b, ext, rc, rg, Minv = jax.lax.optimization_barrier(
            (b, ext, rc, rg, Minv))
        if self.use_pallas:
            # reuse the rows packed once by prepare_pallas above
            base = kernels.make_matvec(
                pp, b.extra_c, b.extra_g, passes=self.matvec_passes,
                bsteps=kernels.default_bsteps(p32.num_points, pp.pb,
                                              p32.views))
        else:
            def base(c, g):
                return engine.schur_matvec(p32, b, c, g)
        matvec = freenet.wrap_matvec(base, ext) if ext is not None else base
        Mi = (freenet.wrap_precond(rcs.make_apply_M(Minv), ext)
              if ext is not None else Minv)
        xc, xg, it = rcs.pcg(None, None, rc, rg, Mi, tol=cg_tol,
                             maxiter=cg_maxiter, matvec=matvec,
                             stall_limit=stall_limit)
        if ext is not None:
            dxp, _lam = freenet.back_substitute(
                self.problem32, ext, engine.point_ops(p32, b), xc, xg)
        else:
            dxp = engine.back_substitute_points(p32, b, xc, xg,
                                                cam_gather=cam_gather)
        new_s, max_dx = hilo.apply_step(s, dxp, xc, xg)
        return new_s, max_dx, it

    def _gradient(self, s: hilo.HiLoState):
        """f64 gradient on the chosen backend; returns f32 (bp, bc, bg,
        wsb) placed on the default (compute) device + the f64 omega0."""
        if self._gdev is not None:
            # compute device = wherever the f32 problem lives (device_put
            # with device=None would LEAVE the results cpu-committed and
            # the solve program would lower for CPU)
            cdev = next(iter(self.fmp32.obs_x.devices()))
            s_g = jax.device_put(s, self._gdev)
            with jax.default_device(self._gdev):
                bp64, bc64, bg64, omega0, wsb, wdpg = self._grad(
                    hilo.to_f64(s_g))
                f32 = (bp64.astype(jnp.float32), bc64.astype(jnp.float32),
                       bg64.astype(jnp.float32), wsb.astype(jnp.float32),
                       wdpg.astype(jnp.float32))
            return tuple(jax.device_put(x, cdev) for x in f32) + (omega0,)
        bp64, bc64, bg64, omega0, wsb, wdpg = self._grad(hilo.to_f64(s))
        return (bp64.astype(jnp.float32), bc64.astype(jnp.float32),
                bg64.astype(jnp.float32), wsb.astype(jnp.float32),
                wdpg.astype(jnp.float32), omega0)

    def step(self, s: hilo.HiLoState, damping=1e-8,
             cg_tol=1e-7, cg_maxiter=400, stall_limit=200):
        bp32, bc32, bg32, wsb32, wdpg32, omega0 = self._gradient(s)
        new_s, max_dx, it = self._step(
            self._big_vals, s, jnp.asarray(damping, jnp.float32), bp32,
            bc32, bg32, wsb32, wdpg32, cg_tol=cg_tol,
            cg_maxiter=cg_maxiter, stall_limit=stall_limit)
        return new_s, max_dx, omega0, it

    def refine(self, state32: ParamState, tolerance: float = 1e-6,
               max_iterations: int = 12, **kw):
        """Drive refinement until max|dx| <= tolerance.  Returns
        (HiLoState, history list of max|dx|)."""
        s = hilo.from_f32(state32)
        history = []
        for _ in range(max_iterations):
            s, max_dx, omega0, it = self.step(s, **kw)
            history.append(float(max_dx))
            if history[-1] <= tolerance:
                break
        return s, history
