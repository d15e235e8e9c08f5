#!/bin/bash
# Round-5 extension 3 — ScratchItchPR2 continuation (VERDICT r4 next #6:
# first non-Jaco trained policy).  The v2 slot gave it only 140 updates
# (45-min budget, rc=124) -> 0.0%; scratch-jaco needed ~400+ updates for
# nonzero, and PR2 runs ~110k env-steps/s, so a 60-min continuation to 500
# updates is the right-sized retry.  Same state-machine pattern.
set -uo pipefail
cd "$(dirname "$0")/.."
STATE=runs/schedule_r5ext3.state
touch "$STATE"
done_stage()  { grep -qxF "$1" "$STATE"; }
mark_stage()  { echo "$1" >> "$STATE"; }
bank() {
    local msg=$1; shift
    for i in 1 2 3; do
        git add -A "$@" 2>/dev/null && \
        git commit -m "$msg" >/dev/null 2>&1 && return 0
        sleep 7
    done
    return 0
}
thin_ckpts() {
    local d=$1
    [ -d "$d" ] || return 0
    ls "$d"/ckpt_*.msgpack 2>/dev/null | sort -V | head -n -1 | while read -r f; do
        rm -f "$f" "${f%.msgpack}.json"
    done
}

if ! done_stage "train:scratch_pr2_b"; then
    echo "=== $(date -u +%H:%M:%S) scratch_pr2_r5 -> 500 updates ==="
    timeout 3900 python train.py --env ScratchItchPR2-v0 --updates 500 \
        --lr-decay --entropy-coef 0.001 --seed 3 \
        --log-dir runs/scratch_pr2_r5 --ckpt-dir ckpts/scratch_pr2_r5 \
        >> runs/scratch_pr2_r5.out 2>&1
    rc=$?
    thin_ckpts ckpts/scratch_pr2_r5
    bank "round 5: bank scratch_pr2_r5 continuation" runs/scratch_pr2_r5 \
        runs/scratch_pr2_r5.out ckpts/scratch_pr2_r5
    [ $rc -eq 0 ] || [ $rc -eq 124 ] && mark_stage "train:scratch_pr2_b"
fi
if ! done_stage "eval:scratch_pr2_b"; then
    echo "=== $(date -u +%H:%M:%S) eval ScratchItchPR2-v0 ckpts/scratch_pr2_r5 (b) ===" \
        | tee -a docs/training/evals_r5.txt
    timeout 900 stdbuf -oL -eL python tools/eval_policy.py --env ScratchItchPR2-v0 \
        --ckpt-dir ckpts/scratch_pr2_r5 --episodes 256 2>&1 \
        | stdbuf -oL grep -v -E "WARNING|\*\*\*|slow_operation|Compiling" \
        | tee -a docs/training/evals_r5.txt
    rc=${PIPESTATUS[0]}
    bank "round 5: bank eval ScratchItchPR2-v0 (b)" docs/training
    [ $rc -eq 0 ] && mark_stage "eval:scratch_pr2_b"
fi
JAX_PLATFORMS=cpu python tools/plot_training.py runs/scratch_pr2_r5/metrics.jsonl \
    --out docs/training/scratch_pr2_r5_curve.png 2>/dev/null
cp runs/scratch_pr2_r5/metrics.csv docs/training/scratch_pr2_r5_metrics.csv 2>/dev/null || true
bank "round 5: bank ext3 curve" docs/training
echo "=== ext3 complete $(date -u) ==="
