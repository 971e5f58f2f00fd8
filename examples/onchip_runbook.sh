#!/bin/bash
# On-chip runbook: everything that needs the real (tunneled) TPU chip,
# in priority order, each step logged — fire this the moment the tunnel
# is back so even a short availability window captures the evidence.
#
#   bash examples/onchip_runbook.sh [out_dir]
#
# Steps:
#   1. bench.py            — the headline median-of-3-passes FPS artifact
#   2. TPU-lane tests      — the 7 on-chip validation lanes (also writes
#                            the TPULANE artifact json)
#   3. measure_ba_schur.py — CG vs dense-Schur timing (ba_schur default)
#   4. bisect_onchip.py    — per-frame RPE dump at the bench config (the
#                            round-5 rotation-drift diagnosis tool)
#
# bench first: it is the round's deliverable and the tunnel has
# hour-scale outages — capture it before anything else can lose the
# window.  Each step is bounded; a hung step cannot eat the window.

set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/onchip}
mkdir -p "$OUT"
stamp() { date -u +%H:%M:%S; }

echo "[$(stamp)] 1/4 bench.py"
SDPL_BENCH_BACKEND_WAIT_S=120 timeout 3600 python bench.py \
    > "$OUT/bench.json" 2> "$OUT/bench.log"
echo "[$(stamp)] bench rc=$? -> $OUT/bench.json"
tail -1 "$OUT/bench.json"

echo "[$(stamp)] 2/4 TPU-lane tests"
SDPL_TEST_PLATFORM=tpu timeout 3600 python -m pytest \
    tests/test_tpu_lane.py -v --tb=line > "$OUT/tpu_lane.log" 2>&1
rc=$?
echo "pytest rc=$rc" >> "$OUT/tpu_lane.log"
python - "$OUT/tpu_lane.log" "$OUT/tpulane.json" << 'EOF'
import json, re, sys
log = open(sys.argv[1]).read()
tests = dict(re.findall(
    r'tests/test_tpu_lane\.py::(\w+)\s+(PASSED|FAILED|SKIPPED|ERROR)', log))
m = re.search(r'pytest rc=(\d+)', log)
json.dump({
    "suite": "tests/test_tpu_lane.py",
    "pytest_rc": int(m.group(1)) if m else None,
    "results": tests,
    "n_passed": sum(1 for v in tests.values() if v == "PASSED"),
    "n_total": len(tests),
}, open(sys.argv[2], "w"), indent=1)
EOF
echo "[$(stamp)] tpu-lane rc=$rc -> $OUT/tpulane.json"
tail -2 "$OUT/tpu_lane.log"

echo "[$(stamp)] 3/4 measure_ba_schur.py"
timeout 3600 python examples/measure_ba_schur.py \
    > "$OUT/ba_schur.json" 2> "$OUT/ba_schur.log"
echo "[$(stamp)] ba_schur rc=$? -> $OUT/ba_schur.json"
tail -1 "$OUT/ba_schur.json"

echo "[$(stamp)] 4/4 bisect_onchip.py (per-frame RPE + LBA phase split)"
SDPL_BA_PERF=1 SDPL_BISECT_FRAMES=53 SDPL_BISECT_LBA=1 timeout 3600 \
    python examples/bisect_onchip.py "$OUT/bisect_tpu.json" \
    > "$OUT/bisect.log" 2>&1
echo "[$(stamp)] bisect rc=$? -> $OUT/bisect_tpu.json"
grep -E "ba-perf" "$OUT/bisect.log" | tail -4

echo "[$(stamp)] runbook done; logs in $OUT"
