"""Preemption-safe training: signal-deferred checkpoint-and-exit.

TPU VMs are preemptible (spot/maintenance): the platform delivers
SIGTERM with a grace window before the hard kill. The reference has no
failure-handling story at all (SURVEY §5.3 — scripts raise and die, and
its checkpoint helpers have zero callers). :class:`PreemptionGuard`
turns the signal into a *step-boundary* event: the hot loop stays at
full speed (one ``Event.is_set()`` check per step — device steps are
uninterruptible anyway), and on preemption the loop saves a checkpoint
through :class:`~mop_tpu.training.utils.AsyncCheckpointManager` and
exits with a distinctive status so a supervisor (shell retry loop, k8s
``restartPolicy``, a ``--resume`` CLI) relaunches from the latest step.

Usage::

    mgr = AsyncCheckpointManager(ckpt_dir, keep=2)
    with PreemptionGuard(mgr) as guard:
        start, params, opt_state = resume_latest(mgr, params, opt_state)
        for step in range(start, total_steps):
            params, opt_state, loss = train_step(params, opt_state, ...)
            guard.maybe_checkpoint_and_exit(step + 1, params, opt_state)

A killed run exits with :data:`PREEMPTED_EXIT_CODE` (75, EX_TEMPFAIL:
"try again later"); rerunning the same command resumes bit-exactly from
the saved step (pinned by tests/test_preemption.py's interrupted-vs-
uninterrupted trajectory equality).
"""

from __future__ import annotations

import signal
import sys
import threading
from typing import Optional, Sequence, Tuple

import jax

__all__ = ["PreemptionGuard", "resume_latest", "PREEMPTED_EXIT_CODE"]

PREEMPTED_EXIT_CODE = 75  # EX_TEMPFAIL


class PreemptionGuard:
    """Defers a kill signal to the next step boundary, then checkpoints.

    ``manager`` is an :class:`AsyncCheckpointManager` (or anything with
    ``save(step, params, opt_state=..., extra=...)`` +
    ``wait_until_finished()``). ``signals`` defaults to SIGTERM only —
    Ctrl-C stays an immediate KeyboardInterrupt unless SIGINT is added
    explicitly. Previously-installed handlers are chained (called after
    the flag is set) and restored on ``uninstall()``/context exit.
    """

    def __init__(self, manager=None,
                 signals: Sequence[int] = (signal.SIGTERM,),
                 exit_code: int = PREEMPTED_EXIT_CODE):
        self._manager = manager
        self._signals = tuple(signals)
        self._exit_code = exit_code
        self._event = threading.Event()
        self._prev: dict = {}
        self._installed = False

    # ---------------- signal plumbing ----------------

    def _handler(self, signum, frame):
        self._event.set()
        prev = self._prev.get(signum)
        if callable(prev):
            prev(signum, frame)

    def install(self) -> "PreemptionGuard":
        if self._installed:
            return self
        for s in self._signals:
            self._prev[s] = signal.getsignal(s)
            signal.signal(s, self._handler)
        self._installed = True
        return self

    def uninstall(self) -> None:
        if not self._installed:
            return
        for s, prev in self._prev.items():
            signal.signal(s, prev)
        self._prev.clear()
        self._installed = False

    def __enter__(self) -> "PreemptionGuard":
        return self.install()

    def __exit__(self, *exc) -> None:
        self.uninstall()

    # ---------------- loop-facing API ----------------

    @property
    def preempted(self) -> bool:
        return self._event.is_set()

    def signal_now(self) -> None:
        """Set the preemption flag programmatically (cooperative shutdown,
        tests, or an external watchdog thread)."""
        self._event.set()

    def checkpoint_and_exit(self, step: int, params, opt_state=None,
                            extra=None) -> None:
        """Save synchronously (waits for the write to land — the grace
        window is for exactly this) and exit with the preempted status."""
        if self._manager is not None:
            # barrier: don't snapshot buffers still being written on-device
            jax.block_until_ready(params)
            self._manager.save(step, params, opt_state=opt_state,
                               extra=extra)
            self._manager.wait_until_finished()
        sys.exit(self._exit_code)

    def maybe_checkpoint_and_exit(self, step: int, params, opt_state=None,
                                  extra=None) -> None:
        """One branch per step: no-op until a signal has arrived."""
        if self._event.is_set():
            self.checkpoint_and_exit(step, params, opt_state=opt_state,
                                     extra=extra)


def resume_latest(manager, params, opt_state=None,
                  shardings=None) -> Tuple[int, object, Optional[object]]:
    """Resume from ``manager``'s latest checkpoint if one exists.

    Returns ``(start_step, params, opt_state)`` — the passed-in trees
    (freshly initialized) double as the restore templates, so dtypes and
    shardings round-trip. With no checkpoint on disk, returns them
    unchanged at step 0.
    """
    step = manager.latest_step()
    if step is None:
        return 0, params, opt_state
    like = {"params": params}
    if opt_state is not None:
        like["opt_state"] = opt_state
    if shardings is not None:
        restored = manager.restore(step, like=like, shardings=shardings)
    else:
        restored = manager.restore(step, like=like)
    return step, restored["params"], restored.get("opt_state", opt_state)
