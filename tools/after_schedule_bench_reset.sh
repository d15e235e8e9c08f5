#!/bin/bash
# Wait for the round-4 training/eval schedule to release the TPU, then run
# the settle PCG-vs-Cholesky reset bench (tools/bench_reset.py) and bank it.
#
# Hard safety rails: never start with <12 min left before START_CUTOFF, and
# the bench itself is timeout-bounded so the chip is free well before the
# driver's end-of-round bench.py (round ends ~18:42Z).
#
#   bash tools/after_schedule_bench_reset.sh <schedule_pid>
set -uo pipefail
cd "$(dirname "$0")/.."

PID=${1:?usage: after_schedule_bench_reset.sh <schedule_pid>}
START_CUTOFF=1787077560   # 18:26:00Z — latest allowed start
BENCH_TIMEOUT=660         # dead by 18:37 even from the latest start

while kill -0 "$PID" 2>/dev/null; do
    sleep 20
done
echo "=== $(date -u +%H:%M:%S) schedule pid $PID gone ==="

# Belt and braces: NEVER touch the TPU while any train/eval process lives
# (a wrong pid here once raced the feeding run for the chip).
while pgrep -f "train.py|eval_policy.py|diag_eval_feeding.py" >/dev/null 2>&1; do
    if (( $(date +%s) > START_CUTOFF )); then
        echo "train/eval still running past cutoff; aborting reset bench"
        exit 0
    fi
    sleep 20
done

if (( $(date +%s) > START_CUTOFF )); then
    echo "past start cutoff; skipping reset bench (chip must stay free)"
    exit 0
fi

timeout "$BENCH_TIMEOUT" python tools/bench_reset.py \
    --out docs/bench/reset_bench_r4.jsonl 2>&1 | grep -v WARNING
rc=$?
echo "bench_reset rc=$rc"

for i in 1 2 3; do
    git add -A docs/bench 2>/dev/null && \
    git commit -m "round 4: bank settle PCG reset bench (TPU A/B)" \
        >/dev/null 2>&1 && break
    sleep 7
done
echo "=== done $(date -u) ==="
