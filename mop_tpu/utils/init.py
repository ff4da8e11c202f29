"""Jitted parameter initialization.

``model.init`` executes the forward op-by-op; through a tunneled backend
(the axon TPU platform) every eager op pays round-trip dispatch latency, so
initializing a 5M-param ViT takes ~45 s. Wrapping init in ``jax.jit``
collapses it to one compile + one execution: ~5 s measured on the same chip,
a 9x startup win that compounds across multi-model, multi-seed experiment
runs (the ab5 flagship initializes 20 model instances).
"""

from __future__ import annotations

import jax

__all__ = ["jitted_init"]


def jitted_init(model, rngs, *args, **kwargs):
    """``model.init`` under jit. ``train`` (if passed) is static."""
    statics = tuple(k for k in kwargs if k == "train")
    return jax.jit(model.init, static_argnames=statics)(rngs, *args, **kwargs)
