"""NaN/Inf guards and determinism helpers (SURVEY §5.2: the reference's only
related control is cudnn-determinism seeding; the JAX build gets functional
PRNG by construction and adds explicit numeric guards).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def tree_isfinite(tree) -> jax.Array:
    """Scalar bool: every float leaf in the pytree is finite."""
    leaves = [
        jnp.isfinite(l).all()
        for l in jax.tree_util.tree_leaves(tree)
        if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)
    ]
    if not leaves:
        return jnp.asarray(True)
    return jnp.stack([jnp.asarray(x) for x in leaves]).all()


def guard_nans(step_fn: Callable, names=("params",)) -> Callable:
    """Wrap a train step so non-finite outputs raise on the host.

    The wrapped function returns the step outputs unchanged but appends a
    finite-flag; callers use ``check_finite`` on it (host-side) to fail fast
    with a clear error instead of silently training on NaNs.
    """

    def wrapped(*args, **kwargs):
        out = step_fn(*args, **kwargs)
        return out, tree_isfinite(out)

    return wrapped


def check_finite(flag, context: str = "train step") -> None:
    """Host-side assertion on a guard_nans flag."""
    if not bool(flag):
        raise FloatingPointError(
            f"non-finite values detected in {context} outputs — "
            "stop and inspect (lr too high, bad data, or overflow in bf16)."
        )


def checkify_step(step_fn: Callable) -> Callable:
    """jax.experimental.checkify wrapper: surfaces NaN/OOB errors from inside
    jit with locations, at some runtime cost (debugging tool)."""
    from jax.experimental import checkify

    checked = checkify.checkify(
        step_fn, errors=checkify.float_checks | checkify.index_checks)

    def wrapped(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapped
