#!/bin/bash
# Round-5 tunnel watcher.  Poll the axon TPU tunnel; the moment it answers:
#   1. run bench.py and BANK the JSON (commit docs/bench/BENCH_live_r5.json)
#   2. run tools/bench_all.py per-task table and bank it too
#   3. hand the chip to the round-5 training schedule (which banks each run)
# Probe = create a TPU client + tiny op; safe only while nothing else owns
# the chip (never run this alongside training — it refuses below).
#
# AGT_DEADLINE: export before launching if the round end is known; defaults
# to now + 6h.  The training schedule reserves 45 min of that for evals and
# the chip is freed at the deadline for the driver's end-of-round bench.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p docs/bench

if pgrep -f "train.py|eval_policy.py|diag_eval_feeding.py|bench_reset.py" >/dev/null 2>&1; then
    echo "refusing to start: a train/eval/bench process already owns the chip"
    exit 1
fi

export AGT_DEADLINE=${AGT_DEADLINE:-$(( $(date +%s) + 6 * 3600 ))}
echo "$(date -u +%H:%M:%S) chip deadline: $(date -u -d @"$AGT_DEADLINE" +%H:%M:%S)"

echo "$(date -u +%H:%M:%S) waiting for tunnel..."
while true; do
    timeout 300 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != 'cpu'
print(float(jnp.ones(8).sum()))
" >/dev/null 2>&1 && break
    sleep 120
done
echo "$(date -u +%H:%M:%S) tunnel is up; banking bench evidence first"

timeout 1800 python bench.py 2>/dev/null | tail -1 | tee docs/bench/BENCH_live_r5.json
timeout 3600 python tools/bench_all.py 2>/dev/null | tee docs/bench/bench_all_r5.jsonl

for i in 1 2 3; do
    git add -A docs/bench 2>/dev/null && \
    git commit -m "round 5: bank live TPU bench + per-task throughput table" \
        >/dev/null 2>&1 && break
    sleep 7
done

echo "$(date -u +%H:%M:%S) starting round-5 training schedule"
exec bash tools/run_round5_training.sh
