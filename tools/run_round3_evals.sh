#!/bin/bash
# Post-training evals + curve plots for the round-3 runs.
# Serial: each eval owns the TPU. Run ONLY when no training is active.
set -uo pipefail
cd "$(dirname "$0")/.."

ev() {  # ev <env> <ckpt-dir> <episodes> [extra args...]
    local env=$1 ck=$2 ep=${3:-256}; shift 3 || true
    [ -d "$ck" ] || { echo "skip $ck (missing)"; return; }
    echo "=== eval $env $ck $* ==="
    timeout 2400 python tools/eval_policy.py --env "$env" --ckpt-dir "$ck" \
        --episodes "$ep" "$@" 2>&1 | grep -v -E "WARNING|\*\*\*|slow_operation|Compiling"
}

ev FeedingJaco-v0        ckpts/feeding_r3  256
ev BedBathingJaco-v0     ckpts/bed_r3      256
ev ArmManipulationJaco-v0 ckpts/armman_r3  256
ev DrinkingJaco-v0       ckpts/drinking_r3 256
ev DressingJaco-v0       ckpts/dressing_r3 128
ev FeedingJacoHuman-v0   ckpts/coop_feeding_r3 256 --coop

for n in feeding_r3 bed_r3 armman_r3 drinking_r3 dressing_r3 coop_feeding_r3; do
    [ -f "runs/$n/metrics.jsonl" ] || continue
    JAX_PLATFORMS=cpu python tools/plot_training.py "runs/$n/metrics.jsonl" \
        --out "docs/training/${n}_curve.png" 2>/dev/null
    cp "runs/$n/metrics.csv" "docs/training/${n}_metrics.csv" 2>/dev/null || true
done
echo "=== evals done ==="
