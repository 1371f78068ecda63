"""Two-float (hi + lo) parameter state: f64-grade convergence in f32.

The reference converges to max|dx| <= sqrt(eps_f64) ~ 1.49e-8 in double
precision (BundleAdjustment.java:77,332).  On TPU the working dtype is f32,
whose state quantisation eps*|x| (~2e-4 at km-scale coordinates) makes
updates below that size unrepresentable — the round-1 bench's max|dx| floor
of ~8e-4 was exactly this.  Representing the state as an unevaluated sum
x = hi + lo of two f32 arrays removes the floor:

* updates accumulate error-free via two-sum (Knuth/Moller) into (hi, lo);
* the forward model consumes lo only where |x| is large and differences
  are formed — the projection's X - X0 (ops/fm.project_rows) — giving
  ~2 eps *relative* accuracy of dX regardless of coordinate magnitude;
* Jacobians, reductions and the CG solve stay plain f32 (iterative
  refinement: the step needs full relative accuracy only in the residual).

This is the compensated-accumulation alternative to f64 emulation from the
survey's hard-part 1, chosen because every op stays on the fast f32 VPU/MXU
paths.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..models.problem import ParamState


class HiLoState(NamedTuple):
    hi: ParamState
    lo: ParamState


def _two_sum(a, b):
    """Error-free transform: a + b = s + e exactly (Knuth two-sum)."""
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def from_f64(state64: ParamState, dtype=jnp.float32) -> HiLoState:
    """Split an f64 state into (hi, lo) f32 parts: hi = fl(x), lo = fl(x - hi)."""
    hi = ParamState(*(jnp.asarray(a, dtype) for a in state64))
    lo = ParamState(*(jnp.asarray(jnp.asarray(a, jnp.float64)
                                  - jnp.asarray(h, jnp.float64), dtype)
                      for a, h in zip(state64, hi)))
    return HiLoState(hi=hi, lo=lo)


def from_f32(state: ParamState) -> HiLoState:
    lo = ParamState(*(jnp.zeros_like(a) for a in state))
    return HiLoState(hi=state, lo=lo)


def to_f64(s: HiLoState) -> ParamState:
    return ParamState(*(jnp.asarray(h, jnp.float64) + jnp.asarray(l, jnp.float64)
                        for h, l in zip(s.hi, s.lo)))


def apply_step(s: HiLoState, dxp, dxc, dxg, alpha=1.0) -> tuple:
    """x <- x + alpha dx with error-free (two-sum) accumulation per block.

    Returns (HiLoState, max|dx|) — the rcs.apply_step analogue."""
    C = s.hi.io.shape[0]
    K = s.hi.dist.shape[1]
    g = (alpha * dxg).reshape(C, 3 + K)
    dio, ddist = g[:, :3], g[:, 3:]

    def upd(hi, lo, dx):
        return _two_sum(hi, lo + dx)

    p_hi, p_lo = upd(s.hi.points, s.lo.points, alpha * dxp)
    e_hi, e_lo = upd(s.hi.eo, s.lo.eo, alpha * dxc)
    i_hi, i_lo = upd(s.hi.io, s.lo.io, dio)
    d_hi, d_lo = upd(s.hi.dist, s.lo.dist, ddist)
    new = HiLoState(hi=ParamState(points=p_hi, io=i_hi, dist=d_hi, eo=e_hi),
                    lo=ParamState(points=p_lo, io=i_lo, dist=d_lo, eo=e_lo))
    max_dx = jnp.max(jnp.stack([
        jnp.max(jnp.abs(alpha * dxp)), jnp.max(jnp.abs(alpha * dxc)),
        jnp.max(jnp.abs(alpha * dxg))]))
    return new, max_dx
