"""Robust wall-clock timing through the axon TPU relay.

`jax.block_until_ready` through the relay can acknowledge before the chip
actually executes (observed mid-session: a 30x4096^3 matmul chain "done" in
0.16 ms), and identical queued executions may be elided.  Two rules make
timings trustworthy:

  1. force a host FETCH of a scalar derived from the last output (a
     `float()` round-trip cannot be faked);
  2. make every queued execution UNIQUE (vary a cheap scalar input that
     flows into the output) and measure the SLOPE between two rep counts,
     which cancels the ~25 ms fixed fetch/RPC overhead.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def fetch(out):
    """Force real execution: pull one scalar to the host."""
    leaves = jax.tree_util.tree_leaves(out)
    x = leaves[0]
    return float(jnp.asarray(x).ravel()[0])


def timeit_slope(call, r1=4, r2=24, verbose_name=None):
    """``call(k)`` runs the k-th (unique) execution and returns its output.
    Times r1 and r2 reps, each ended with a fetch; returns the per-rep
    slope (T2 - T1) / (r2 - r1) in seconds."""
    out = call(0)
    fetch(out)  # warm-up + compile

    def run(r, base):
        t0 = time.time()
        out = None
        for k in range(r):
            out = call(base + k)
        fetch(out)
        return time.time() - t0

    t1 = run(r1, 1)
    t2 = run(r2, 1 + r1)
    dt = (t2 - t1) / (r2 - r1)
    if verbose_name:
        print(f"{verbose_name}: {dt*1e6:9.1f} us   "
              f"(T{r1}={t1*1e3:.1f}ms T{r2}={t2*1e3:.1f}ms)", flush=True)
    return dt
