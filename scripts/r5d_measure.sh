#!/bin/bash
# Round-5 fourth queue: the scanned whole-proof flagship. The r5b
# breakdown showed synced device totals of 9.2 s against a 12.9-16.7 s
# pipelined wall — per-dispatch tunnel enqueue drag. The layer scan
# (gkr/fused._scan_proof_jit) folds all 32 dispatches into ONE program;
# this measures the 2^24 flagship through it (default config takes the
# scan path automatically for uniform circuits), wall + breakdown +
# verify, plus a headline6 sample.
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
status "r5d waiting for the r5c queue"
while ! grep -q "r5c ALL DONE" "$OUT/status" 2>/dev/null; do sleep 60; done
status "r5d starting"
run gkr24_1d    9000 python benches/gkr_benchmark.py --depth 16 --width-log 20 --fused
run gkr24_1d_bd 7200 python benches/gkr_benchmark.py --depth 16 --width-log 20 --fused --breakdown --skip-verify
run headline6   2400 python bench.py
status "r5d ALL DONE"
