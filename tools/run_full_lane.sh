#!/bin/bash
# Full-lane test run, per-file with incremental logging (VERDICT r4 item 7).
# Per-file so a single hang cannot eat the whole budget and every completed
# file is recorded even if the run is cut short. Writes
# /tmp/full_lane/<file>.log + a summary line per file to
# /tmp/full_lane/summary.txt.
set -u
cd /root/repo
OUT=/tmp/full_lane
mkdir -p "$OUT"
: > "$OUT/summary.txt"
START=$(date +%s)
for f in tests/test_*.py; do
  b=$(basename "$f" .py)
  t0=$(date +%s)
  timeout 1500 python -m pytest "$f" -q -m 'slow or not slow' -p no:cacheprovider \
    > "$OUT/$b.log" 2>&1
  rc=$?
  t1=$(date +%s)
  line=$(grep -E "passed|failed|error|no tests ran" "$OUT/$b.log" | tail -1)
  echo "$b rc=$rc $((t1-t0))s ${line:-<no summary>}" >> "$OUT/summary.txt"
done
END=$(date +%s)
echo "TOTAL $((END-START))s" >> "$OUT/summary.txt"
