#!/bin/bash
# Round-5 extension 2 — the chip freed up after ext1 (16:04 UTC) with the
# feeding_r6 curve still climbing at its 400-update cutoff (eval 22.3%).
# One more guarded slot: continue feeding_r6 in place to 700 updates with
# the lr horizon re-stretched, eval immediately, then a scratch top-up.
# Same state-machine pattern; safe to kill/relaunch at any time.
set -uo pipefail
cd "$(dirname "$0")/.."
STATE=runs/schedule_r5ext2.state
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

if ! done_stage "train:feeding_r6b"; then
    echo "=== $(date -u +%H:%M:%S) feeding_r6 -> 700 updates ==="
    timeout 2700 python train.py --env FeedingJaco-v0 --updates 700 --lr-decay \
        --entropy-coef 0.0 --shaping-coef 10.0 --shaping-decay 150 --seed 11 \
        --log-dir runs/feeding_r6 --ckpt-dir ckpts/feeding_r6 \
        >> runs/feeding_r6.out 2>&1
    rc=$?
    thin_ckpts ckpts/feeding_r6
    bank "round 5: bank feeding_r6 continuation" runs/feeding_r6 runs/feeding_r6.out ckpts/feeding_r6
    [ $rc -eq 0 ] || [ $rc -eq 124 ] && mark_stage "train:feeding_r6b"
fi
if ! done_stage "eval:feeding_r6b"; then
    echo "=== $(date -u +%H:%M:%S) eval FeedingJaco-v0 ckpts/feeding_r6 (r6b) ===" \
        | tee -a docs/training/evals_r5.txt
    timeout 900 stdbuf -oL -eL python tools/eval_policy.py --env FeedingJaco-v0 \
        --ckpt-dir ckpts/feeding_r6 --episodes 256 2>&1 \
        | stdbuf -oL grep -v -E "WARNING|\*\*\*|slow_operation|Compiling" \
        | tee -a docs/training/evals_r5.txt
    rc=${PIPESTATUS[0]}
    bank "round 5: bank eval FeedingJaco-v0 (r6b)" docs/training
    [ $rc -eq 0 ] && mark_stage "eval:feeding_r6b"
fi

if ! done_stage "train:scratch_r4b"; then
    echo "=== $(date -u +%H:%M:%S) scratch_r4 -> 1100 updates ==="
    timeout 1800 python train.py --env ScratchItchJaco-v0 --updates 1100 \
        --lr-decay --entropy-coef 0.001 --seed 3 \
        --log-dir runs/scratch_r4 --ckpt-dir ckpts/scratch_r4 \
        >> runs/scratch_r4.out 2>&1
    rc=$?
    thin_ckpts ckpts/scratch_r4
    bank "round 5: bank scratch_r4 top-up" runs/scratch_r4 runs/scratch_r4.out ckpts/scratch_r4
    [ $rc -eq 0 ] || [ $rc -eq 124 ] && mark_stage "train:scratch_r4b"
fi
if ! done_stage "eval:scratch_r4b"; then
    echo "=== $(date -u +%H:%M:%S) eval ScratchItchJaco-v0 ckpts/scratch_r4 (r4b) ===" \
        | tee -a docs/training/evals_r5.txt
    timeout 900 stdbuf -oL -eL python tools/eval_policy.py --env ScratchItchJaco-v0 \
        --ckpt-dir ckpts/scratch_r4 --episodes 256 2>&1 \
        | stdbuf -oL grep -v -E "WARNING|\*\*\*|slow_operation|Compiling" \
        | tee -a docs/training/evals_r5.txt
    rc=${PIPESTATUS[0]}
    bank "round 5: bank eval ScratchItchJaco-v0 (r4b)" docs/training
    [ $rc -eq 0 ] && mark_stage "eval:scratch_r4b"
fi

for n in feeding_r6 scratch_r4; do
    JAX_PLATFORMS=cpu python tools/plot_training.py "runs/$n/metrics.jsonl" \
        --out "docs/training/${n}_curve.png" 2>/dev/null
    cp "runs/$n/metrics.csv" "docs/training/${n}_metrics.csv" 2>/dev/null || true
done
bank "round 5: bank ext2 curves" docs/training
echo "=== ext2 complete $(date -u) ==="
