"""Egress-gated real-data smoke run (VERDICT r3 #9).

This environment has zero egress, so the reference's committed real-CIFAR
accuracy story (`/root/reference/README.md:364-377`,
`results/cifar10/cifar100_ab_2025-08-17/`) cannot be reproduced — only
attempted. This hook makes the attempt automatic: probe egress; if the
dataset host is reachable, run the tiny A/B smoke the reference README
uses (200 steps, 1 seed, real CIFAR-10 via ``--download``) and commit its
CSV under ``benchmarks/realdata/``; otherwise record the honest negative
result with a timestamp. ``bench.py`` invokes this every round, so the
day the bench host gains network the numbers appear without anyone
remembering to run it.

Run:  python tools/realdata_smoke.py   (safe offline; ~5 s probe)
"""

from __future__ import annotations

import datetime
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(REPO, "benchmarks", "realdata")
ARTIFACT = os.path.join(OUT_DIR, "SMOKE.md")

# torchvision's CIFAR mirror — the host the --download path actually hits
PROBE_HOST = "www.cs.toronto.edu"
PROBE_TIMEOUT_S = 5


def egress_available() -> bool:
    try:
        with socket.create_connection((PROBE_HOST, 443),
                                      timeout=PROBE_TIMEOUT_S):
            return True
    except OSError:
        return False


def record(lines) -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    with open(ARTIFACT, "w") as f:
        f.write("\n".join(lines) + "\n")


def main() -> int:
    now = datetime.datetime.now(datetime.timezone.utc).isoformat(
        timespec="seconds")
    if not egress_available():
        record([
            "# Real-data smoke: egress unavailable",
            "",
            f"- last probe: {now} — TCP connect to "
            f"`{PROBE_HOST}:443` failed within {PROBE_TIMEOUT_S} s "
            "(zero-egress environment).",
            "- The reference's committed real-CIFAR accuracy numbers "
            "(`/root/reference/README.md:364-377`) therefore remain "
            "unreproduced here; the synthetic-data substitutes are in "
            "`benchmarks/ab_hard/` and `benchmarks/ab5_fullrun/`.",
            "- This probe runs every bench round (`bench.py`); the day "
            "the host gains network, the 200-step 1-seed real-CIFAR A/B "
            "smoke below runs automatically and its CSV lands in this "
            "directory.",
        ])
        print(f"egress unavailable (probe {PROBE_HOST}:443); recorded "
              f"{ARTIFACT}", file=sys.stderr)
        return 0

    os.makedirs(OUT_DIR, exist_ok=True)
    cmd = [sys.executable,
           os.path.join(REPO, "experiments",
                        "cifar100_ab5_param_budgets.py"),
           "--download", "--models", "a", "b", "--targets", "5000000",
           "--steps", "200", "--seeds", "0", "--batch", "128",
           "--out", OUT_DIR]
    print(f"egress OK — running: {' '.join(cmd)}", file=sys.stderr)
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    tail = (r.stdout + r.stderr)[-2000:]
    record([
        "# Real-data smoke: RAN",
        "",
        f"- {now}: egress probe OK; 200-step 1-seed real-CIFAR-10 A/B "
        f"smoke exit code {r.returncode}.",
        "- CSVs in this directory; reference comparison: "
        "`README.md:364-377` (A 0.279 / B 0.332 at the same smoke "
        "scale).",
        "",
        "```", tail, "```",
    ])
    return r.returncode


if __name__ == "__main__":
    sys.exit(main())
