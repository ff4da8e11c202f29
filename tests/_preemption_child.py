"""Child process for tests/test_preemption.py: a tiny preemptible
training loop driven entirely through the public mop_tpu API.

argv: ckpt_dir total_steps [sleep_per_step_seconds]
Prints "START k" after resume, "STEP s" per step, and
"DONE param_l2 <v>" on normal completion. A SIGTERM mid-run checkpoints
at the next step boundary and exits with PREEMPTED_EXIT_CODE (75).
"""

import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize preloads axon

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from mop_tpu.models import ViT_Baseline  # noqa: E402
from mop_tpu.training import (  # noqa: E402
    AsyncCheckpointManager,
    PreemptionGuard,
    resume_latest,
)
from mop_tpu.utils import jitted_init  # noqa: E402


def main():
    ckpt_dir, total_steps = sys.argv[1], int(sys.argv[2])
    sleep_per_step = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0

    model = ViT_Baseline(dim=32, depth=1, heads=2, n_classes=4)
    rng = jax.random.PRNGKey(0)
    params = jitted_init(model, {"params": rng, "dropout": rng},
                         jnp.zeros((4, 3, 32, 32)), train=True)
    tx = optax.adamw(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, x, y):
        def lf(p):
            logits = model.apply(p, x, train=False)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        loss, g = jax.value_and_grad(lf)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, loss

    with AsyncCheckpointManager(ckpt_dir, keep=2) as mgr, \
            PreemptionGuard(mgr) as guard:
        start, params, opt = resume_latest(mgr, params, opt)
        print(f"START {start}", flush=True)
        for s in range(start, total_steps):
            rs = np.random.RandomState(s)  # batch is a pure function of s
            x = jnp.asarray(rs.randn(4, 3, 32, 32), jnp.float32)
            y = jnp.asarray(rs.randint(0, 4, (4,)))
            params, opt, loss = step(params, opt, x, y)
            float(loss)  # host barrier: the step really finished
            print(f"STEP {s}", flush=True)
            if sleep_per_step:
                time.sleep(sleep_per_step)
            guard.maybe_checkpoint_and_exit(s + 1, params, opt)
        mgr.save(total_steps, params, opt_state=opt)
        mgr.wait_until_finished()
    l2 = float(jnp.sqrt(sum(
        jnp.vdot(a, a) for a in jax.tree_util.tree_leaves(params)).real))
    print(f"DONE param_l2 {l2:.10e}", flush=True)


if __name__ == "__main__":
    main()
