"""Model-level dispatch measurements for the multihop and quartet kernels.

Times eval forwards with the fused flag off/on (min-of-3 windows, bf16,
host-transfer barrier) and prints one JSON line. These numbers set the
MOP_TPU_FUSED_MULTIHOP / MOP_TPU_FUSED_QUARTET defaults
(benchmarks/quartet_multihop_dispatch.md).

Usage: python tools/bench_dispatch.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _time(fn, args, windows=3, reps=20):
    import jax
    import jax.numpy as jnp

    y = fn(*args)
    float(jnp.sum(y))
    ts = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(reps):
            y = fn(*args)
        float(jnp.sum(y))
        ts.append((time.perf_counter() - t0) / reps * 1e3)
    return min(ts)


def _bf16_params(p):
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, p)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mop_tpu import config as mcfg
    from mop_tpu.models import (TransformerConfig, ViTMultiHop,
                                create_gpt_quartet)
    from mop_tpu.utils import jitted_init

    rng = jax.random.PRNGKey(0)
    results = {}

    # --- ViTMultiHop eval forward ---
    model = ViTMultiHop(dim=224, depth=8, heads=4, n_classes=100, hops=2)
    x = jnp.asarray(np.random.RandomState(0).randn(256, 3, 32, 32),
                    jnp.bfloat16)
    p = _bf16_params(jitted_init(model, rng, jnp.zeros((256, 3, 32, 32))))

    def run_mh(flag):
        mcfg.config.fused_multihop = flag
        return _time(jax.jit(lambda p, x: model.apply(p, x, train=False)),
                     (p, x))

    mh_x, mh_f = run_mh(False), run_mh(True)
    log(f"multihop eval fwd: xla {mh_x:.2f} ms, fused {mh_f:.2f} ms "
        f"({mh_x / mh_f:.2f}x)")
    results["multihop"] = {"xla_ms": round(mh_x, 2), "fused_ms": round(mh_f, 2),
                           "speedup": round(mh_x / mh_f, 2)}

    # --- GPT quartet LM eval forward ---
    cfg = TransformerConfig(n_layer=6, n_head=6, n_embd=384, dropout=0.0,
                            block_size=256)
    lm = create_gpt_quartet(8192, cfg)
    idx = jnp.asarray(np.random.RandomState(0).randint(0, 8192, (64, 256)),
                      jnp.int32)
    lp = _bf16_params(jitted_init(lm, rng, idx))

    def run_q(flag):
        mcfg.config.fused_quartet = flag
        return _time(jax.jit(lambda p, i: lm.apply(p, i)[0]), (lp, idx))

    q_x, q_f = run_q(False), run_q(True)
    log(f"quartet LM fwd: xla {q_x:.2f} ms, fused {q_f:.2f} ms "
        f"({q_x / q_f:.2f}x)")
    results["quartet"] = {"xla_ms": round(q_x, 2), "fused_ms": round(q_f, 2),
                          "speedup": round(q_x / q_f, 2)}

    print(json.dumps(results))


if __name__ == "__main__":
    main()
