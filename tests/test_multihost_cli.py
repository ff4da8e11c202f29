"""Experiment CLIs under a multi-process launch, unchanged.

``make_mesh``/``shard_batch``/``replicate`` are multihost-aware and
``mop_tpu.config`` bootstraps ``jax.distributed`` from the launcher's env
contract at import, so EVERY experiment script runs across processes
without modification. Pinned here: the reference-smoke multi-seed CLI run
on 2 processes x 4 virtual devices produces a byte-identical CSV to the
single-process 8-device run (only process 0 writes artifacts).
"""


from __future__ import annotations

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARGS = ["--tiny", "--synthetic", "--steps", "3", "--seeds", "0",
        "--batch", "16", "--eval_every", "2"]


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def test_multi_seed_cli_multihost_matches_single(tmp_path):
    script = os.path.join(REPO, "experiments", "cifar10_multi_seed.py")
    out_mh = tmp_path / "mh"
    out_sp = tmp_path / "sp"

    mh = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "launch_multihost.py"),
         "--nproc", "2", "--devices-per-process", "4", "--timeout", "600",
         "--", sys.executable, script, *ARGS, "--out", str(out_mh)],
        capture_output=True, text=True, timeout=700, env=_env(), cwd=REPO)
    assert mh.returncode == 0, mh.stdout[-3000:] + mh.stderr[-2000:]

    env = _env()
    env["MOP_TPU_PLATFORM"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=8"])
    sp = subprocess.run(
        [sys.executable, script, *ARGS, "--out", str(out_sp)],
        capture_output=True, text=True, timeout=700, env=env, cwd=REPO)
    assert sp.returncode == 0, sp.stdout[-3000:] + sp.stderr[-2000:]

    csv_mh = (out_mh / "cifar10_acc.csv").read_text()
    csv_sp = (out_sp / "cifar10_acc.csv").read_text()
    assert csv_mh == csv_sp
    assert csv_mh.startswith("seed,baseline,mop,diff")
