#!/bin/bash
# On-chip runbook: everything that needs the real (tunneled) TPU chip,
# in priority order, each step logged — fire this the moment the tunnel
# is back so even a short availability window captures the evidence.
#
#   bash examples/onchip_runbook.sh [out_dir]
#
# Steps (ROADMAP "Blocked on the axon tunnel"):
#   1. bench.py            — the headline median-of-3-passes FPS artifact
#   2. TPU-lane tests      — the 7 on-chip validation lanes
#   3. measure_ba_schur.py — CG vs dense-Schur timing (ba_schur default)
#
# bench first: it is the round's deliverable and the tunnel has
# hour-scale outages — capture it before anything else can lose the
# window.  Each step is bounded; a hung step cannot eat the window.

set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/onchip}
mkdir -p "$OUT"
stamp() { date -u +%H:%M:%S; }

echo "[$(stamp)] 1/3 bench.py"
SDPL_BENCH_BACKEND_WAIT_S=120 timeout 3600 python bench.py \
    > "$OUT/bench.json" 2> "$OUT/bench.log"
echo "[$(stamp)] bench rc=$? -> $OUT/bench.json"
tail -1 "$OUT/bench.json"

echo "[$(stamp)] 2/3 TPU-lane tests"
SDPL_TEST_PLATFORM=tpu timeout 3600 python -m pytest \
    tests/test_tpu_lane.py -q > "$OUT/tpu_lane.log" 2>&1
echo "[$(stamp)] tpu-lane rc=$?"
tail -2 "$OUT/tpu_lane.log"

echo "[$(stamp)] 3/3 measure_ba_schur.py"
timeout 3600 python examples/measure_ba_schur.py \
    > "$OUT/ba_schur.json" 2> "$OUT/ba_schur.log"
echo "[$(stamp)] ba_schur rc=$? -> $OUT/ba_schur.json"
tail -1 "$OUT/ba_schur.json"

echo "[$(stamp)] 4/4 (optional) LM-budget sweep"
timeout 3600 python examples/tune_chained.py 30 \
    > "$OUT/tune_chained.jsonl" 2> "$OUT/tune_chained.log"
echo "[$(stamp)] tune rc=$? -> $OUT/tune_chained.jsonl"
cat "$OUT/tune_chained.jsonl"

echo "[$(stamp)] runbook done; logs in $OUT"
