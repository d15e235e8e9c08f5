#!/bin/bash
# Post-training evals + curve plots for the round-4 runs.
# Serial: each eval owns the TPU. Run ONLY when no training is active.
# Ordered by evidence value; each result is committed as it lands so a
# round-close mid-script loses one eval, not all of them.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p docs/training

bank() {
    for i in 1 2 3; do
        git add -A docs/training 2>/dev/null && \
        git commit -m "$1" >/dev/null 2>&1 && return 0
        sleep 7
    done
    return 0
}

ev() {  # ev <env> <ckpt-dir> <episodes> [extra args...]
    local env=$1 ck=$2 ep=${3:-256}; shift 3 || true
    [ -d "$ck" ] || { echo "skip $ck (missing)"; return; }
    echo "=== eval $env $ck $* ==="
    timeout 420 python tools/eval_policy.py --env "$env" --ckpt-dir "$ck" \
        --episodes "$ep" "$@" 2>&1 | grep -v -E "WARNING|\*\*\*|slow_operation|Compiling" \
        | tee -a docs/training/evals_r4.txt
    bank "round 4: bank eval $env"
}

ev FeedingJaco-v0         ckpts/feeding_r4      256
ev ScratchItchJaco-v0     ckpts/scratch_r4      256
ev ArmManipulationJaco-v0 ckpts/armman_r4       256
ev DrinkingJaco-v0        ckpts/drinking_r4     256
ev FeedingJacoHuman-v0    ckpts/coop_feeding_r4 256 --coop
ev BedBathingJaco-v0      ckpts/bed_r4          256
ev DressingJaco-v0        ckpts/dressing_r4     128

# reset-condition failure clustering (head pose / bowl / impairment draw)
if [ -d ckpts/feeding_r4 ]; then
    timeout 1200 python tools/diag_eval_feeding.py --ckpt-dir ckpts/feeding_r4 \
        --episodes 256 2>&1 | grep -v -E "WARNING|slow_operation" \
        | tee docs/training/feeding_diag_r4.txt
    bank "round 4: bank feeding failure-cluster diagnosis"
fi

for n in feeding_r4 scratch_r4 bed_r4 armman_r4 drinking_r4 dressing_r4 coop_feeding_r4; do
    [ -f "runs/$n/metrics.jsonl" ] || continue
    JAX_PLATFORMS=cpu python tools/plot_training.py "runs/$n/metrics.jsonl" \
        --out "docs/training/${n}_curve.png" 2>/dev/null
    cp "runs/$n/metrics.csv" "docs/training/${n}_metrics.csv" 2>/dev/null || true
done

for i in 1 2 3; do
    git add -A docs/training runs ckpts 2>/dev/null && \
    git commit -m "round 4: bank deterministic evals + training curves" \
        >/dev/null 2>&1 && break
    sleep 7
done
echo "=== evals done ==="
