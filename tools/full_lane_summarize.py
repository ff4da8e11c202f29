"""Summarize a tools/run_full_lane.sh sweep into a TIMINGS.md entry.

The doubled -q (pyproject addopts + the runner) suppresses pytest's
count line, so outcomes are recovered from the progress characters
('.', 'F', 'E', 's', 'x', 'X') plus each file's exit code.

Run: python tools/full_lane_summarize.py [/tmp/full_lane]
"""

from __future__ import annotations

import os
import re
import sys

PROG = re.compile(r"^[.FEsxX]+(?:\s+\[\s*\d+%\])?\s*$")


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/full_lane"
    totals = {".": 0, "F": 0, "E": 0, "s": 0, "x": 0, "X": 0}
    files = 0
    bad = []
    wall = 0
    summary = os.path.join(root, "summary.txt")
    rcs = {}
    for line in open(summary):
        if line.startswith("TOTAL"):
            wall = int(line.split()[1].rstrip("s"))
            continue
        parts = line.split()
        name, rc = parts[0], int(parts[1].split("=")[1])
        rcs[name] = (rc, int(parts[2].rstrip("s")))
    for name, (rc, secs) in sorted(rcs.items()):
        path = os.path.join(root, name + ".log")
        counts = {k: 0 for k in totals}
        try:
            for line in open(path):
                if PROG.match(line.strip()) and line.strip(". \n"):
                    pass
                s = line.strip()
                m = re.match(r"^([.FEsxX]+)(\s+\[\s*\d+%\])?$", s)
                if m:
                    for ch in m.group(1):
                        counts[ch] += 1
        except OSError:
            pass
        files += 1
        for k, v in counts.items():
            totals[k] += v
        if rc != 0:
            bad.append((name, rc, secs, dict(counts)))
    n_tests = sum(totals.values())
    print(f"files: {files}  tests: {n_tests}  passed: {totals['.']}  "
          f"failed: {totals['F']}  errors: {totals['E']}  "
          f"skipped: {totals['s']}  xfail/xpass: "
          f"{totals['x']}/{totals['X']}  wall: {wall}s "
          f"({wall/60:.0f} min)")
    if bad:
        print("NON-ZERO rc files:")
        for name, rc, secs, c in bad:
            print(f"  {name}: rc={rc} {secs}s {c}")
    else:
        print("ALL FILES rc=0 — full lane GREEN")
    slow = sorted(rcs.items(), key=lambda kv: -kv[1][1])[:10]
    print("slowest files:")
    for name, (rc, secs) in slow:
        print(f"  {secs:5d}s {name}")


if __name__ == "__main__":
    main()
