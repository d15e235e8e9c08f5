#!/bin/bash
# Round-5 extension 4 — session-3 chip schedule, fired at session start.
# Slot 1: scratch_r4 900 -> 1400 updates (eval was 34.4% @900 and the
#   sampled curve still climbing ~0.39; the judge bar is round-2 parity
#   61.3%, lr horizon re-stretched to 1400).
# Slot 2: scratch_pr2_r5 146 -> 500 updates (VERDICT r4 next #6: first
#   non-Jaco policy; the v2 slot was cut at 146 with sampled success
#   already ~25%, so this is the highest-certainty nonzero eval available).
# Same state-machine pattern as run_round5_schedule_v2.sh: per-stage state
# in runs/schedule_r5ext4.state, eval fires the moment its slot ends,
# safe to kill/relaunch at any time.
set -uo pipefail
cd "$(dirname "$0")/.."
STATE=runs/schedule_r5ext4.state
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

if ! done_stage "train:scratch_r4c"; then
    echo "=== $(date -u +%H:%M:%S) scratch_r4 -> 1400 updates ==="
    timeout 4200 python train.py --env ScratchItchJaco-v0 --updates 1400 \
        --lr-decay --entropy-coef 0.001 --seed 3 \
        --log-dir runs/scratch_r4 --ckpt-dir ckpts/scratch_r4 \
        >> runs/scratch_r4.out 2>&1
    rc=$?
    thin_ckpts ckpts/scratch_r4
    bank "round 5: bank scratch_r4 continuation to 1400" runs/scratch_r4 \
        runs/scratch_r4.out ckpts/scratch_r4
    [ $rc -eq 0 ] || [ $rc -eq 124 ] && mark_stage "train:scratch_r4c"
fi
if ! done_stage "eval:scratch_r4c"; then
    echo "=== $(date -u +%H:%M:%S) eval ScratchItchJaco-v0 ckpts/scratch_r4 (r4c) ===" \
        | tee -a docs/training/evals_r5.txt
    timeout 900 stdbuf -oL -eL python tools/eval_policy.py --env ScratchItchJaco-v0 \
        --ckpt-dir ckpts/scratch_r4 --episodes 256 2>&1 \
        | stdbuf -oL grep -v -E "WARNING|\*\*\*|slow_operation|Compiling" \
        | tee -a docs/training/evals_r5.txt
    rc=${PIPESTATUS[0]}
    bank "round 5: bank eval ScratchItchJaco-v0 (r4c)" docs/training
    [ $rc -eq 0 ] && mark_stage "eval:scratch_r4c"
fi

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

for run in scratch_r4 scratch_pr2_r5; do
    JAX_PLATFORMS=cpu python tools/plot_training.py runs/$run/metrics.jsonl \
        --out docs/training/${run}_curve.png 2>/dev/null
    cp runs/$run/metrics.csv docs/training/${run}_metrics.csv 2>/dev/null || true
done
bank "round 5: bank ext4 curves" docs/training
echo "=== ext4 complete $(date -u) ==="
