#!/usr/bin/env python
"""Local multi-process launcher for multihost jobs.

Spawns N copies of a worker command on this machine, wiring the
``jax.distributed`` bootstrap through the env-var contract consumed by
``mop_tpu.parallel.multihost.init_distributed``:

    MOP_TPU_COORDINATOR    127.0.0.1:<free port>
    MOP_TPU_NUM_PROCESSES  N
    MOP_TPU_PROCESS_ID     0..N-1

Each child also gets ``--xla_force_host_platform_device_count`` via
XLA_FLAGS (``--devices-per-process``) and ``MOP_TPU_PLATFORM=cpu`` by
default, so an 8-chip pod topology is emulated as e.g. 2 processes x 4
virtual CPU devices with gloo collectives over localhost — the same code
path a real multi-host pod runs, minus the hardware. On a real pod you
don't need this script: run one worker per host with the env vars set by
your scheduler.

Usage:
    python tools/launch_multihost.py --nproc 2 --devices-per-process 4 -- \
        python examples/multihost_train.py --steps 3

Exit status is non-zero if any child fails. Child stdout/stderr are
prefixed with the process id and forwarded.
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys
import threading


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def launch(nproc: int, devices_per_process: int, cmd: list,
           platform: str = "cpu", timeout: float = 600.0) -> int:
    """Spawn ``nproc`` copies of ``cmd``; returns the max child exit code."""
    port = _free_port()
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env["MOP_TPU_COORDINATOR"] = f"127.0.0.1:{port}"
        env["MOP_TPU_NUM_PROCESSES"] = str(nproc)
        env["MOP_TPU_PROCESS_ID"] = str(pid)
        if platform:
            env["MOP_TPU_PLATFORM"] = platform
        if devices_per_process:
            # Replace (not just append) any inherited device-count flag —
            # e.g. the pytest conftest exports one for the parent process.
            flags = [f for f in env.get("XLA_FLAGS", "").split()
                     if "xla_force_host_platform_device_count" not in f]
            flags.append("--xla_force_host_platform_device_count="
                         f"{devices_per_process}")
            env["XLA_FLAGS"] = " ".join(flags)
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))

    def _pump(pid, p):
        for line in p.stdout:
            sys.stdout.write(f"[proc {pid}] {line}")
            sys.stdout.flush()

    pumps = [threading.Thread(target=_pump, args=(i, p), daemon=True)
             for i, p in enumerate(procs)]
    for t in pumps:
        t.start()
    codes = []
    try:
        for p in procs:
            codes.append(p.wait(timeout=timeout))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for t in pumps:
        t.join(timeout=5)
    return max(codes) if codes else 1


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--devices-per-process", type=int, default=4)
    ap.add_argument("--platform", default="cpu",
                    help="forwarded as MOP_TPU_PLATFORM ('' = leave unset)")
    ap.add_argument("--timeout", type=float, default=600.0)
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="worker command after '--'")
    args = ap.parse_args(argv)
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no worker command given (append: -- python worker.py ...)")
    return launch(args.nproc, args.devices_per_process, cmd,
                  platform=args.platform, timeout=args.timeout)


if __name__ == "__main__":
    raise SystemExit(main())
