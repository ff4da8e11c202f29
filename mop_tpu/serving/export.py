"""AOT model export: serialized StableHLO artifacts for deployment.

A trained model is exported ONCE — traced, lowered, and serialized with
``jax.export`` — into a self-contained byte artifact that a serving host
replays WITHOUT the model's Python code (no mop_tpu on the box, no flax,
no retracing): only jax and the artifact. This is the TPU-native
equivalent of torchscript/ONNX deployment, which the reference lacks
entirely (its models stop at teacher-forced logits,
``mop/models/gpt_mop.py:181-207``; no export/serving story, SURVEY §0).

Two deployment-grade properties:

- **Polymorphic batch**: the artifact is exported with a symbolic
  leading batch dimension (``jax.export.symbolic_shape``), so ONE
  artifact serves any batch size — the server picks its batching, the
  artifact recompiles per concrete shape on the target, numerics
  unchanged.
- **Cross-platform**: ``platforms=("tpu", "cpu")`` lowers both targets
  into one artifact; params are baked (closed over) or passed live —
  caller's choice.

Usage::

    blob = export_apply(model, params, example_x)      # bytes
    pathlib.Path("vit.mopx").write_bytes(blob)
    # --- serving host: no mop_tpu needed ---
    fn = load_exported(blob)                           # or a path
    logits = fn(params, x)                             # any batch size

``export_fn`` is the general form for arbitrary jitted callables (e.g. a
decode step). Artifacts embed jax's versioned calling convention and are
validated on load by ``jax.export.deserialize``.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jexport

__all__ = ["export_apply", "export_fn", "load_exported", "save_exported"]


def export_fn(fn, *example_args, platforms: Optional[Sequence[str]] = None,
              poly_batch_args: Sequence[int] = (),
              allow_custom_calls: bool = False) -> bytes:
    """Trace + lower + serialize ``fn`` at ``example_args``.

    ``poly_batch_args``: indices of positional args whose LEADING axis
    becomes a symbolic batch dimension ``b`` (every array leaf of that
    arg must carry it). ``platforms`` defaults to the current backend;
    pass ``("tpu", "cpu")`` for a dual-target artifact.
    ``allow_custom_calls``: opt out of the serialization safety check
    that rejects non-portable custom calls (needed only when exporting a
    path that dispatches a Pallas/Mosaic kernel; such artifacts replay
    on matching TPU targets, not portably).
    """
    specs = list(example_args)
    if poly_batch_args:
        shapes = ["b, ..." if i in poly_batch_args else None
                  for i in range(len(example_args))]
        specs = jexport.symbolic_args_specs(example_args, shapes)
    kw = {}
    if platforms is not None:
        kw["platforms"] = tuple(platforms)
    if allow_custom_calls:
        kw["disabled_checks"] = [
            jexport.DisabledSafetyCheck.custom_call_prefix("")]
    exported = jexport.export(jax.jit(fn), **kw)(*specs)
    return bytes(exported.serialize())


def export_apply(model, params, example_x,
                 platforms: Optional[Sequence[str]] = None,
                 poly_batch: bool = True, train: bool = False,
                 allow_custom_calls: bool = False, **apply_kwargs) -> bytes:
    """Export a flax model's inference forward: ``(params, x) -> out``.

    The exported callable takes live params (so the same artifact serves
    fine-tuned/quantized variants with identical structure). With
    ``poly_batch`` the input's leading axis is symbolic — one artifact,
    any serving batch size.
    """
    def fwd(p, x):
        return model.apply(p, x, train=train, **apply_kwargs)

    return export_fn(fwd, params, example_x, platforms=platforms,
                     poly_batch_args=(1,) if poly_batch else (),
                     allow_custom_calls=allow_custom_calls)


def save_exported(path: str, blob: bytes) -> None:
    with open(path, "wb") as f:
        f.write(blob)


def load_exported(blob_or_path):
    """Deserialize an exported artifact into a plain callable.

    Accepts the raw bytes or a filesystem path. The returned callable
    re-enters jax under the hood (``Exported.call``), so it composes
    with jit/vmap/sharding on the serving host.
    """
    if isinstance(blob_or_path, (str, os.PathLike)):
        with open(blob_or_path, "rb") as f:
            blob = f.read()
    else:
        blob = bytes(blob_or_path)
    exported = jexport.deserialize(blob)

    def call(*args):
        return exported.call(*args)

    call.exported = exported  # platforms, in_avals, etc. for inspection
    return call
