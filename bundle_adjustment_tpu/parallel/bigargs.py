"""Pass large arrays as jit arguments instead of closure constants.

Closing over device arrays embeds them as constants in the lowered program.
Locally that only bloats the executable; through a remote-compile relay
(the axon TPU path) the serialized program body is size-limited, so
hundreds-of-MB constant blocks make compilation fail outright.  These
helpers split a NamedTuple's big fields out so they travel as arguments:

    names, big = split_big(fmp)
    f = jax.jit(lambda big_, x: work(merge(fmp, names, big_), x))
    f(big, x)
"""

from __future__ import annotations

import jax

#: fields whose leaves total more than this many bytes become arguments
THRESHOLD = 1 << 20


def _field_bytes(v) -> int:
    return sum(getattr(l, "nbytes", 0) for l in jax.tree.leaves(v))


def split_big(nt, threshold: int = THRESHOLD, float_only: bool = False):
    """Returns (names, values) of the NamedTuple fields worth passing as
    arguments (tree-aware: fields may be tuples of arrays).

    ``float_only``: keep integer (index) arrays as closure constants —
    XLA's gather lowering materialises argument index arrays as
    [N, 1]-shaped temps tile-padded 128x (measured: 20 x 586 MB HLO temps
    for a 4.6 MB permutation at the 100k covariance program = OOM), while
    the same indices as constants fold cleanly.  Index arrays are ~3x
    smaller than the float payload, so the serialized-program size stays
    within the remote-compile relay's limit."""
    def pick(f):
        v = getattr(nt, f)
        if _field_bytes(v) <= threshold:
            return False
        if float_only:
            import jax.numpy as jnp

            leaves = jax.tree.leaves(v)
            if any(not jnp.issubdtype(l.dtype, jnp.floating)
                   for l in leaves if hasattr(l, "dtype")):
                return False
        return True

    names = tuple(f for f in nt._fields if pick(f))
    return names, tuple(getattr(nt, f) for f in names)


def merge(nt, names, values):
    """Rebuild the NamedTuple with the (possibly traced) big fields."""
    return nt._replace(**dict(zip(names, values)))
