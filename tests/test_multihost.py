"""Multi-host (multi-process) training equality.

Spawns TWO real OS processes (4 virtual CPU devices each, jax.distributed
over localhost with gloo collectives) via tools/launch_multihost.py running
examples/multihost_train.py, then runs the identical training single-process
on this test's 8-device mesh and pins:

- both workers report IDENTICAL replicated state (loss/param_l2 agree
  bit-for-bit across processes — the gradient all-reduce really replicated);
- the 2-process trajectory matches the single-process one (same global
  batch, same seeds; tolerance covers gloo-vs-XLA reduction order).

The reference has nothing remotely comparable (single device only,
reference ``experiments/cifar100_ab5_param_budgets.py:43-48``); this is the
scaling seam a real pod run uses, minus the hardware.
"""


from __future__ import annotations

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import importlib.util
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STEPS = 3
GLOBAL_BATCH = 16


def _load_example():
    spec = importlib.util.spec_from_file_location(
        "multihost_train_example",
        os.path.join(REPO, "examples", "multihost_train.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def two_process_records():
    cmd = [
        sys.executable, os.path.join(REPO, "tools", "launch_multihost.py"),
        "--nproc", "2", "--devices-per-process", "4", "--timeout", "420",
        "--",
        sys.executable, os.path.join(REPO, "examples", "multihost_train.py"),
        "--steps", str(STEPS), "--global-batch", str(GLOBAL_BATCH),
    ]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=480,
                         env=env, cwd=REPO)
    assert out.returncode == 0, (
        f"multihost launch failed\nstdout:\n{out.stdout[-4000:]}\n"
        f"stderr:\n{out.stderr[-4000:]}")
    records = []
    for line in out.stdout.splitlines():
        # child stdout lines arrive prefixed "[proc N] "
        brace = line.find("{")
        if brace >= 0 and '"param_l2"' in line:
            records.append(json.loads(line[brace:]))
    assert len(records) == 2, f"expected 2 worker records, got: {out.stdout}"
    return records


def test_two_processes_replicate_identically(two_process_records):
    a, b = sorted(two_process_records, key=lambda r: r["process"])
    assert a["process"] == 0 and b["process"] == 1
    assert a["n_processes"] == b["n_processes"] == 2
    assert a["n_devices"] == b["n_devices"] == 8
    # replicated state: every process holds the same values exactly
    assert a["loss"] == b["loss"]
    assert a["acc"] == b["acc"]
    assert a["param_l2"] == b["param_l2"]


def test_matches_single_process(two_process_records):
    ref = _load_example().run_worker(steps=STEPS,
                                     global_batch_size=GLOBAL_BATCH)
    assert ref["n_processes"] == 1 and ref["n_devices"] == 8
    got = two_process_records[0]
    # same data, same init, same step count; only the cross-process
    # all-reduce order differs (gloo vs single-host XLA)
    assert got["loss"] == pytest.approx(ref["loss"], rel=2e-4, abs=2e-5)
    assert got["param_l2"] == pytest.approx(ref["param_l2"], rel=2e-5)
