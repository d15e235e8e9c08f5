#!/bin/bash
# Post-training deterministic evals + curve plots for round 5.
# Serial: each eval owns the TPU. Run ONLY when no training is active.
# Eval timeout is 900 s — the axon tunnel's first compile of an eval
# program takes >7 min (a 420 s timeout silently ate an eval in round 4).
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
    echo "=== $(date -u +%H:%M:%S) eval $env $ck $* ===" | tee -a docs/training/evals_r5.txt
    timeout 900 stdbuf -oL -eL python tools/eval_policy.py --env "$env" \
        --ckpt-dir "$ck" --episodes "$ep" "$@" 2>&1 \
        | stdbuf -oL grep -v -E "WARNING|\*\*\*|slow_operation|Compiling" \
        | tee -a docs/training/evals_r5.txt
    bank "round 5: bank eval $env"
}

# newest checkpoint dir wins per task
ckdir() { for d in "$@"; do [ -d "$d" ] && { echo "$d"; return; }; done; echo "$1"; }

ev BedBathingJaco-v0      "$(ckdir ckpts/bed_r5 ckpts/bed_r4)"           256
ev DrinkingJaco-v0        "$(ckdir ckpts/drinking_r5 ckpts/drinking_r4)" 256
ev FeedingJaco-v0         "$(ckdir ckpts/feeding_r5 ckpts/feeding_r4)"   256
ev ScratchItchJaco-v0     ckpts/scratch_r4      256
ev DressingJaco-v0        ckpts/dressing_r4     128
ev FeedingJacoHuman-v0    ckpts/coop_feeding_r4 256 --coop
ev ArmManipulationJaco-v0 ckpts/armman_r4       256

for n in feeding_r5 drinking_r5 bed_r5 feeding_r4 scratch_r4 bed_r4 armman_r4 \
         drinking_r4 dressing_r4 coop_feeding_r4; do
    [ -f "runs/$n/metrics.jsonl" ] || continue
    JAX_PLATFORMS=cpu python tools/plot_training.py "runs/$n/metrics.jsonl" \
        --out "docs/training/${n}_curve.png" 2>/dev/null
    cp "runs/$n/metrics.csv" "docs/training/${n}_metrics.csv" 2>/dev/null || true
done
bank "round 5: bank deterministic evals + training curves"
echo "=== round-5 evals done ==="
