#!/bin/bash
# Round-5 fifth queue: the cumsum scan-core A/B. parts_scan2 measured the
# assoc-core scatter at 214 ms standalone (~2x the whole build); the new
# core replaces the modular tuple-carry associative_scan with native
# per-lane u32 cumsums (exact by the fan-in lane bound). Measures the
# 2^24 flagship through the scanned whole-proof path with the new core,
# the standalone scatter part, and one more headline session.
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
status "r5e waiting for the r5d queue"
while ! grep -q "r5d ALL DONE" "$OUT/status" 2>/dev/null; do sleep 60; done
status "r5e starting"
run gkr24_cs    9000 python benches/gkr_benchmark.py --depth 16 --width-log 20 --fused
run gkr24_cs_bd 7200 python benches/gkr_benchmark.py --depth 16 --width-log 20 --fused --breakdown --skip-verify
run parts_cs    7200 python benches/gkr_parts.py --k 20 --mode scan --reps 5
run headline7   2400 python bench.py
status "r5e ALL DONE"
