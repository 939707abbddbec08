#!/bin/bash
# Round-4 fifth queue (fresh container, cold compile cache): tile sweep for
# the sub-1 ms round goal, flagship 2^24 on the final defaults (scan-mode
# phase builds + fused fold), headline, controls. Ordered by value-per-minute
# given ~1 h of wall clock.
set -u
cd /root/repo
OUT=${OUT:-/tmp/r4em}
mkdir -p "$OUT"
status() { echo "$(date +%H:%M:%S) $*" >> "$OUT/status"; }
run() {  # run <name> <timeout-s> <cmd...>
  local name=$1 t=$2; shift 2
  status "START $name"
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  status "DONE  $name rc=$?"
}
status "queue start"
# round baseline on final defaults (tile 2^13, fused fold)
run round_default 2400 python benches/roofline.py
# the tile sweep (VERDICT r3 #3)
run round_tile14  2400 python benches/roofline.py --tile-log 14
run round_tile15  2400 python benches/roofline.py --tile-log 15
run round_tile12  2400 python benches/roofline.py --tile-log 12
# flagship 2^24 on final defaults, with verify (confirms the 1.64 s win)
run gkr24_scan    5400 python benches/gkr_benchmark.py --depth 16 --width-log 20 --fused
# headline on final defaults
run headline      2400 python bench.py
# breakdown for the phase-cost attack
run gkr24_bd      5400 python benches/gkr_benchmark.py --depth 16 --width-log 20 --fused --breakdown --skip-verify
# fold control (archives the fused-fold A/B on this container)
run round_nofuse  2400 python benches/roofline.py --no-fused-fold
# VPU throughput probes
run mulcost       2400 python benches/roofline.py --mulcost
status "ALL DONE"
