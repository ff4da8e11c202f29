"""Preemption-safe training: SIGTERM -> step-boundary checkpoint -> exit
75 -> resume bit-exactly.

The reference has no failure handling (SURVEY §5.3); these pin the
mop-tpu guard's contract, including a REAL OS-process kill: a child
training loop is SIGTERM'd mid-run, exits with PREEMPTED_EXIT_CODE after
checkpointing, and a relaunch resumes to final parameters identical to
an uninterrupted run's.
"""

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import os
import signal
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import pytest

from mop_tpu.training import (
    PREEMPTED_EXIT_CODE,
    AsyncCheckpointManager,
    PreemptionGuard,
    resume_latest,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "_preemption_child.py")
SIG = signal.SIGUSR1  # in-process tests use a harmless signal


def test_guard_flag_set_by_signal_and_uninstall_restores():
    prev = signal.getsignal(SIG)
    with PreemptionGuard(signals=(SIG,)) as guard:
        assert not guard.preempted
        os.kill(os.getpid(), SIG)
        deadline = time.time() + 5
        while not guard.preempted:
            assert time.time() < deadline
            time.sleep(0.01)
    assert signal.getsignal(SIG) == prev


def test_guard_chains_previous_handler():
    hits = []
    orig = signal.getsignal(SIG)
    signal.signal(SIG, lambda s, f: hits.append(s))
    try:
        with PreemptionGuard(signals=(SIG,)) as guard:
            os.kill(os.getpid(), SIG)
            deadline = time.time() + 5
            while not (guard.preempted and hits):
                assert time.time() < deadline
                time.sleep(0.01)
        assert hits == [SIG]
    finally:
        signal.signal(SIG, orig)


def test_maybe_checkpoint_and_exit_saves_then_exits(tmp_path):
    params = {"w": jnp.arange(4.0)}
    with AsyncCheckpointManager(str(tmp_path), keep=2) as mgr:
        guard = PreemptionGuard(mgr, signals=(SIG,))
        guard.maybe_checkpoint_and_exit(3, params)  # no signal: no-op
        guard.signal_now()
        with pytest.raises(SystemExit) as e:
            guard.maybe_checkpoint_and_exit(3, params)
        assert e.value.code == PREEMPTED_EXIT_CODE
        assert mgr.latest_step() == 3
        step, restored, _ = resume_latest(mgr, params)
        assert step == 3
        assert jnp.array_equal(restored["w"], params["w"])


def test_resume_latest_empty_dir_is_step_zero(tmp_path):
    params = {"w": jnp.ones(2)}
    with AsyncCheckpointManager(str(tmp_path), keep=1) as mgr:
        step, p, o = resume_latest(mgr, params, None)
    assert step == 0 and p is params and o is None


# ---------------- real-process SIGTERM end-to-end ----------------

TOTAL_STEPS = 8


def _run_child(ckpt_dir, sleep=0.0, sigterm_after_step=None, timeout=420):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [sys.executable, CHILD, str(ckpt_dir), str(TOTAL_STEPS)]
    if sleep:
        cmd.append(str(sleep))
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True, env=env,
                            cwd=REPO)
    lines = []
    if sigterm_after_step is not None:
        for line in proc.stdout:
            lines.append(line.strip())
            if line.strip() == f"STEP {sigterm_after_step}":
                proc.send_signal(signal.SIGTERM)
                break
    out, err = proc.communicate(timeout=timeout)
    lines += out.strip().splitlines()
    return proc.returncode, lines, err


@pytest.fixture(scope="module")
def interrupted_and_resumed(tmp_path_factory):
    ckpt = tmp_path_factory.mktemp("preempt_ckpt")
    rc1, lines1, err1 = _run_child(ckpt, sleep=0.25, sigterm_after_step=2)
    with AsyncCheckpointManager(str(ckpt), keep=2) as mgr:
        step_after_kill = mgr.latest_step()
    rc2, lines2, err2 = _run_child(ckpt)
    return step_after_kill, (rc1, lines1, err1), (rc2, lines2, err2)


def test_sigterm_checkpoints_and_exits_75(interrupted_and_resumed):
    step_after_kill, (rc1, lines1, err1), _ = interrupted_and_resumed
    assert rc1 == PREEMPTED_EXIT_CODE, f"lines={lines1}\nstderr={err1[-2000:]}"
    done = [ln for ln in lines1 if ln.startswith("DONE")]
    assert not done  # it did not run to completion
    assert step_after_kill is not None and 1 <= step_after_kill < TOTAL_STEPS


def test_resume_completes_from_saved_step(interrupted_and_resumed):
    _, (_, lines1, _), (rc2, lines2, err2) = interrupted_and_resumed
    assert rc2 == 0, f"lines={lines2}\nstderr={err2[-2000:]}"
    start2 = int([ln for ln in lines2 if ln.startswith("START")][0].split()[1])
    assert start2 >= 1  # resumed, not restarted
    # the resumed run re-executes no step the first run completed
    steps1 = {ln for ln in lines1 if ln.startswith("STEP")}
    steps2 = {ln for ln in lines2 if ln.startswith("STEP")}
    assert not (steps1 & steps2)
    assert sorted(steps1 | steps2) == [f"STEP {i}" for i in
                                       range(TOTAL_STEPS)]


def test_lockstep_train_preemption_checkpoints_all_models(tmp_path):
    """The experiments engine's lockstep loop (experiments/common.py) is
    preemption-safe when ``ckpt_dir`` is set: SIGTERM mid-run checkpoints
    EVERY model at the step boundary, exits 75, and a ``resume=True``
    relaunch continues from the saved step without repeating any."""
    import numpy as np

    from experiments.common import lockstep_train
    from mop_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()

    class StubRun:
        """Duck-typed ModelRun: records steps and save/load round-trips."""

        def __init__(self, key, kill_at=None):
            self.key = key
            self.kill_at = kill_at
            self.stepped = []
            self.saved = []

        def step(self, xb, yb, step_i):
            self.stepped.append(step_i)
            if self.kill_at is not None and step_i == self.kill_at:
                os.kill(os.getpid(), signal.SIGTERM)

        def sync_loss(self):
            return 0.0

        def evaluate(self, batches):
            return 0.5

        def save(self, path, step_i):
            self.saved.append(step_i)
            with open(path, "w") as f:
                f.write(str(step_i))

        def load(self, path, mesh):
            with open(path) as f:
                return int(f.read())

    def batches():
        while True:
            yield np.zeros((8, 3, 8, 8), np.float32), np.zeros((8,), np.int64)

    runs = {"a": StubRun("a", kill_at=3), "b": StubRun("b")}
    prev = signal.getsignal(signal.SIGTERM)
    with pytest.raises(SystemExit) as e:
        lockstep_train(runs, batches(), lambda: [], steps=8, eval_every=100,
                       mesh=mesh, log=lambda *a: None,
                       ckpt_dir=str(tmp_path))
    assert e.value.code == PREEMPTED_EXIT_CODE
    assert signal.getsignal(signal.SIGTERM) == prev  # guard uninstalled
    assert runs["a"].saved == [3] and runs["b"].saved == [3]
    assert runs["a"].stepped == [1, 2, 3]

    runs2 = {"a": StubRun("a"), "b": StubRun("b")}
    lockstep_train(runs2, batches(), lambda: [], steps=8, eval_every=100,
                   mesh=mesh, log=lambda *a: None,
                   ckpt_dir=str(tmp_path), resume=True)
    assert runs2["a"].stepped == [4, 5, 6, 7, 8]  # no step repeated


def test_interrupted_plus_resume_equals_uninterrupted(
        interrupted_and_resumed, tmp_path):
    """Final parameters after kill+resume are IDENTICAL to one
    uninterrupted run (same deterministic batches, exact restore)."""
    _, _, (rc2, lines2, _) = interrupted_and_resumed
    assert rc2 == 0
    l2_resumed = float(
        [ln for ln in lines2 if ln.startswith("DONE")][0].split()[-1])
    rc, lines, err = _run_child(tmp_path / "solo")
    assert rc == 0, err[-2000:]
    l2_solo = float(
        [ln for ln in lines if ln.startswith("DONE")][0].split()[-1])
    assert l2_resumed == l2_solo


# ---------------- library-level train_model preemption ----------------


def test_train_model_preemption_and_resume(tmp_path):
    """train_model(ckpt_dir=...) is preemption-safe: SIGTERM mid-run
    checkpoints and raises SystemExit(75); resume=True continues from the
    saved step and reaches parameters IDENTICAL to an uninterrupted run
    (constant batch, absolute-step rng folding, absolute-step lr)."""
    import numpy as np

    from mop_tpu.models import ViT_Baseline
    from mop_tpu.training import train_model

    rs = np.random.RandomState(0)
    xb = rs.randn(8, 3, 32, 32).astype(np.float32)
    yb = rs.randint(0, 4, (8,)).astype(np.int64)

    def make_iter(kill_at=None):
        def gen():
            step = 0
            while True:
                if kill_at is not None and step == kill_at:
                    os.kill(os.getpid(), signal.SIGTERM)
                step += 1
                yield xb, yb
        return gen()

    def model():
        return ViT_Baseline(dim=32, depth=1, heads=2, n_classes=4)

    steps, ckpt = 6, str(tmp_path / "ck")
    prev_handler = signal.getsignal(signal.SIGTERM)
    with pytest.raises(SystemExit) as e:
        train_model(model(), make_iter(kill_at=3), lambda: [], steps,
                    verbose=False, augment=False, ckpt_dir=ckpt,
                    ckpt_every=100)
    assert e.value.code == PREEMPTED_EXIT_CODE
    assert signal.getsignal(signal.SIGTERM) == prev_handler  # uninstalled
    with AsyncCheckpointManager(ckpt, keep=2) as mgr:
        saved = mgr.latest_step()
    assert saved is not None and 1 <= saved < steps

    p_resumed, hist = train_model(model(), make_iter(), lambda: [], steps,
                                  verbose=False, augment=False,
                                  ckpt_dir=ckpt, resume=True)
    assert len(hist["train_loss"]) == steps - saved  # no step repeated

    p_solo, _ = train_model(model(), make_iter(), lambda: [], steps,
                            verbose=False, augment=False)
    flat_r = jax.tree_util.tree_leaves(p_resumed)
    flat_s = jax.tree_util.tree_leaves(p_solo)
    assert all(jnp.array_equal(a, b) for a, b in zip(flat_r, flat_s))
