#!/bin/bash
# Session-4 variant of after_schedule_bench_reset.sh: wait for the session-4
# schedule to release the TPU, then A/B the settle PCG-vs-Cholesky reset
# bench on the bed task only (halves compile cost; bed is where the 33 s
# updates hurt) and bank the numbers.  Chip is guaranteed free by 04:27Z,
# ahead of the 04:30Z deadline the schedule itself honors.
#
#   bash tools/after_s4_bench_reset.sh <schedule_pid>
set -uo pipefail
cd "$(dirname "$0")/.."

PID=${1:?usage: after_s4_bench_reset.sh <schedule_pid>}
START_CUTOFF=1787112720   # 04:12:00Z — latest allowed start
BENCH_TIMEOUT=840         # dead by 04:26 even from the latest start

while kill -0 "$PID" 2>/dev/null; do
    sleep 20
done
echo "=== $(date -u +%H:%M:%S) schedule pid $PID gone ==="

# Belt and braces: NEVER touch the TPU while any train/eval process lives.
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
    --envs BedBathingJaco-v0 \
    --out docs/bench/reset_bench_r4.jsonl 2>&1 | grep -v WARNING
rc=$?
echo "bench_reset rc=$rc"

for i in 1 2 3; do
    git add -A docs/bench 2>/dev/null && \
    git commit -m "round 4: bank settle PCG reset bench (TPU A/B, bed task)" \
        >/dev/null 2>&1 && break
    sleep 7
done
echo "=== done $(date -u) ==="
