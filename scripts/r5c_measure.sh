#!/bin/bash
# Round-5 third queue: rerun the per-part attribution with the FIXED
# digest-synced timing (the first parts_scan run used block_until_ready,
# which does not block through the remote tunnel — its numbers were
# inconsistent: the full dispatch timed 0.2 ms against a 157 ms part),
# plus the GSPMD-overhead scaling probe (VERDICT r4 #7) and one more
# headline session for the median-of-N protocol.
set -u
cd /root/repo
OUT=${OUT:-/root/repo/bench_logs/r5}
mkdir -p "$OUT"
status() { echo "$(date +%H:%M:%S) $*" >> "$OUT/status"; }
run() {
  local name=$1 t=$2; shift 2
  status "START $name"
  timeout -s INT -k 120 "$t" "$@" > "$OUT/$name.log" 2>&1
  status "DONE  $name rc=$?"
}
status "r5c waiting for the r5b queue"
while ! grep -q "r5b ALL DONE" "$OUT/status" 2>/dev/null; do sleep 60; done
status "r5c starting"
run parts_scan2   7200 python benches/gkr_parts.py --k 20 --mode scan --reps 5
run scaling_gspmd 4800 python benches/scaling_benchmark.py --gspmd-overhead
run headline5     2400 python bench.py
status "r5c ALL DONE"
