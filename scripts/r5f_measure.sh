#!/bin/bash
# Round-5 sixth queue: flagship after the prelude fixes (circuit-cached
# breakdown attributed 5.97 s of the 15.2 s wall to pre-dispatch host
# work, dominated by per-prover wiring re-upload (~270 MB/proof).

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
status "r5f waiting for the r5d queue"
while ! grep -q "r5e ALL DONE" "$OUT/status" 2>/dev/null; do sleep 60; done
status "r5f starting"
run gkr24_pf    9000 python benches/gkr_benchmark.py --depth 16 --width-log 20 --fused
run gkr24_pf_bd 7200 python benches/gkr_benchmark.py --depth 16 --width-log 20 --fused --breakdown --skip-verify
run headline8   2400 python bench.py
status "r5f ALL DONE"
