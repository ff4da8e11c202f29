"""Port PyTorch-reference state dicts into mop-tpu flax parameter trees.

Enables (a) golden numerics tests that transplant reference weights and
assert output equality, and (b) migrating real checkpoints trained with the
reference (Eran-BA/MoP) into this framework.

Layout conversions:
- Linear  (out, in)        -> kernel (in, out)
- Conv2d  (out, in, kh, kw)-> kernel (kh, kw, in, out)   [NHWC/HWIO]
- Conv1d  (out, in, k)     -> kernel (k, in, out)        [NLC/LIO]
- LayerNorm weight         -> scale
- Embedding weight         -> embedding (tied lm_head.weight is skipped)
"""

from __future__ import annotations

import re
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

try:
    import flax
except ImportError:  # pragma: no cover
    flax = None

# Module-name rewrites from torch reference naming to mop-tpu naming.
_RENAMES = [
    (r"\bkerns\.k\.0\b", "kerns.conv1"),
    (r"\bkerns\.k\.2\b", "kerns.conv2"),
    (r"\bfuse\.fuse\.0\b", "fuse.fuse1"),
    (r"\bfuse\.fuse\.2\b", "fuse.fuse2"),
    (r"\baudio_proj\.", "audio_proj_lin."),
    (r"\bqkv_list\.(\d+)\b", r"qkv_\1"),
    (r"\b(blocks|encoder|decoder|q_lens|k_lens|lens_bank)\.(\d+)\b", r"\1_\2"),
    (r"\bedge_head\.(conv2|row_proj|col_proj)\.(weight|bias)\b",
     lambda m: f"edge_head.{m.group(1)}_{'kernel' if m.group(2) == 'weight' else 'bias'}"),
    (r"\b(wte|wpe|audio_pos|text_pos)\.weight\b", r"\1.embedding"),
    # ViTLocalizer: head MLP Sequential indices and unified-block MLP
    (r"\bhead\.mlp\.0\b", "head.fc1"),
    (r"\bhead\.mlp\.2\b", "head.fc2"),
    (r"\bmlp\.0\b", "mlp_fc1"),
    (r"\bmlp\.2\b", "mlp_fc2"),
]

_SKIP = (re.compile(r"^lm_head\.weight$"), re.compile(r"causal_mask"))


def _rewrite(key: str) -> str:
    for pat, repl in _RENAMES:
        key = re.sub(pat, repl, key)
    return key


def _fit(w: np.ndarray, target_shape, leaf: str) -> np.ndarray:
    """Re-lay-out a torch tensor to the flax leaf's shape.

    Layout is decided by the *leaf kind*, never by shape comparison — a square
    Linear kernel still needs its transpose.
    """
    ts = tuple(target_shape)
    if leaf.endswith("kernel"):
        if w.ndim == 2:
            c = w.T  # torch Linear (out,in) -> (in,out)
        elif w.ndim == 4:
            c = np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO
        elif w.ndim == 3:
            c = np.transpose(w, (2, 1, 0))  # OIL -> LIO
            if c.shape != ts and len(ts) == 2:
                c = w[:, :, 0].T  # Conv1d k=1 realized as a plain matmul kernel
        else:
            c = w
        if c.shape != ts:
            raise ValueError(
                f"kernel layout mismatch: torch {w.shape} -> {c.shape} != {ts}")
        return np.ascontiguousarray(c)
    if w.shape == ts:
        return w
    if w.size == int(np.prod(ts)):
        return w.reshape(ts)
    raise ValueError(f"cannot fit torch shape {w.shape} into flax shape {ts}")


def port_torch_state_dict(torch_sd: Dict[str, np.ndarray], flax_params):
    """Return a copy of ``flax_params`` with every leaf replaced by the
    corresponding reference weight. Raises if any torch key cannot be placed
    or any flax leaf is left unassigned."""
    assert flax is not None, "flax required"
    tree = flax_params["params"] if "params" in flax_params else flax_params
    flat = dict(flax.traverse_util.flatten_dict(tree))
    assigned = set()

    for key, w in torch_sd.items():
        if any(p.search(key) for p in _SKIP):
            continue
        w = np.asarray(w)
        parts = _rewrite(key).split(".")
        candidates = []
        if parts[-1] == "weight":
            base = tuple(parts[:-1])
            candidates = [base + ("kernel",), base + ("scale",),
                          base + ("embedding",), base + ("weight",)]
        else:
            candidates = [tuple(parts)]
        path = next((c for c in candidates if c in flat), None)
        if path is None:
            raise KeyError(
                f"no flax leaf for torch key '{key}' "
                f"(tried {['/'.join(c) for c in candidates]})"
            )
        flat[path] = jnp.asarray(
            _fit(w, flat[path].shape, path[-1]), dtype=flat[path].dtype)
        assigned.add(path)

    missing = set(flat) - assigned
    if missing:
        raise KeyError(
            "flax leaves not covered by torch state dict: "
            + ", ".join("/".join(m) for m in sorted(missing))
        )
    out = flax.traverse_util.unflatten_dict(flat)
    return {"params": out} if "params" in flax_params else out


def load_golden(path: str):
    """Split a tools/gen_golden.py npz into (inputs, weights, outputs) dicts."""
    data = np.load(path)
    ins, ws, outs = {}, {}, {}
    for k in data.files:
        if k.startswith("in__"):
            ins[k[4:]] = data[k]
        elif k.startswith("w__"):
            ws[k[3:]] = data[k]
        elif k.startswith("out__"):
            outs[k[5:]] = data[k]
    return ins, ws, outs
