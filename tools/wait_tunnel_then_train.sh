#!/bin/bash
# Poll the axon TPU tunnel; when it answers, run one quick bench as a health
# check, then hand the chip to the round-3 training schedule.
# Probe = create a TPU client + tiny op; safe only while nothing else owns
# the chip (never run this alongside training).
cd "$(dirname "$0")/.."
echo "$(date -u +%H:%M:%S) waiting for tunnel..."
while true; do
    timeout 300 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != 'cpu'
print(float(jnp.ones(8).sum()))
" >/dev/null 2>&1 && break
    sleep 120
done
echo "$(date -u +%H:%M:%S) tunnel is up; running bench health check"
timeout 900 python bench.py 2>/dev/null | tail -1 | tee /tmp/bench_health.json
echo "$(date -u +%H:%M:%S) starting round-3 training schedule"
exec bash tools/run_round3_training.sh
