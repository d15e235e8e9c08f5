#!/bin/bash
# Round-4 tunnel watcher.  Poll the axon TPU tunnel; the moment it answers:
#   1. run bench.py and BANK the JSON (commit docs/bench/BENCH_live_r4.json)
#   2. run tools/bench_all.py per-task table and bank it too
#   3. hand the chip to the round-4 training schedule (which banks each run)
# Probe = create a TPU client + tiny op; safe only while nothing else owns
# the chip (never run this alongside training).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p docs/bench

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

timeout 1800 python bench.py 2>/dev/null | tail -1 | tee docs/bench/BENCH_live_r4.json
timeout 3600 python tools/bench_all.py 2>/dev/null | tee docs/bench/bench_all_r4.jsonl

for i in 1 2 3; do
    git add -A docs/bench 2>/dev/null && \
    git commit -m "round 4: bank live TPU bench + per-task throughput table" \
        >/dev/null 2>&1 && break
    sleep 7
done

echo "$(date -u +%H:%M:%S) starting round-4 training schedule"
exec bash tools/run_round4_training.sh
