#!/bin/bash
# Round-5 extension 6 — opportunistic final block, runs only if chip time
# remains after ext5.  Ordered by certainty of value:
#   1. scratch_r4 1400 -> 1800 (43.0% @1400, sampled curve still ~0.44;
#      chasing the 61.3% round-2 parity bar, lr horizon re-stretched)
#   2. coop feeding top-up with the delivery-shell curriculum (14.1% @r5)
#   3. full bench_all refresh on the incidence-matmul narrowphase build
# Same state-machine pattern; safe to kill/relaunch at any time.
set -uo pipefail
cd "$(dirname "$0")/.."
STATE=runs/schedule_r5ext6.state
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

if ! done_stage "train:scratch_r4d"; then
    echo "=== $(date -u +%H:%M:%S) scratch_r4 -> 1800 updates ==="
    timeout 3300 python train.py --env ScratchItchJaco-v0 --updates 1800 \
        --lr-decay --entropy-coef 0.001 --seed 3 \
        --log-dir runs/scratch_r4 --ckpt-dir ckpts/scratch_r4 \
        >> runs/scratch_r4.out 2>&1
    rc=$?
    thin_ckpts ckpts/scratch_r4
    bank "round 5: bank scratch_r4 continuation to 1800" runs/scratch_r4 \
        runs/scratch_r4.out ckpts/scratch_r4
    [ $rc -eq 0 ] || [ $rc -eq 124 ] && mark_stage "train:scratch_r4d"
fi
if ! done_stage "eval:scratch_r4d"; then
    echo "=== $(date -u +%H:%M:%S) eval ScratchItchJaco-v0 ckpts/scratch_r4 (r4d) ===" \
        | tee -a docs/training/evals_r5.txt
    timeout 900 stdbuf -oL -eL python tools/eval_policy.py --env ScratchItchJaco-v0 \
        --ckpt-dir ckpts/scratch_r4 --episodes 256 2>&1 \
        | stdbuf -oL grep -v -E "WARNING|\*\*\*|slow_operation|Compiling" \
        | tee -a docs/training/evals_r5.txt
    rc=${PIPESTATUS[0]}
    bank "round 5: bank eval ScratchItchJaco-v0 (r4d)" docs/training
    [ $rc -eq 0 ] && mark_stage "eval:scratch_r4d"
fi

if ! done_stage "train:coop_feeding_r6"; then
    echo "=== $(date -u +%H:%M:%S) coop_feeding_r6 (warm from r5, curriculum) ==="
    timeout 2400 python train.py --env FeedingJacoHuman-v0 --coop \
        --updates 400 --lr-decay --entropy-coef 0.0 \
        --shaping-coef 30.0 --shaping-decay 250 --curriculum-decay 250 \
        --seed 23 --init-from ckpts/coop_feeding_r5 \
        --log-dir runs/coop_feeding_r6 --ckpt-dir ckpts/coop_feeding_r6 \
        >> runs/coop_feeding_r6.out 2>&1
    rc=$?
    thin_ckpts ckpts/coop_feeding_r6
    bank "round 5: bank coop_feeding_r6 curriculum run" runs/coop_feeding_r6 \
        runs/coop_feeding_r6.out ckpts/coop_feeding_r6
    [ $rc -eq 0 ] || [ $rc -eq 124 ] && mark_stage "train:coop_feeding_r6"
fi
if ! done_stage "eval:coop_feeding_r6"; then
    echo "=== $(date -u +%H:%M:%S) eval FeedingJacoHuman-v0 ckpts/coop_feeding_r6 --coop ===" \
        | tee -a docs/training/evals_r5.txt
    timeout 900 stdbuf -oL -eL python tools/eval_policy.py --env FeedingJacoHuman-v0 \
        --coop --ckpt-dir ckpts/coop_feeding_r6 --episodes 256 2>&1 \
        | stdbuf -oL grep -v -E "WARNING|\*\*\*|slow_operation|Compiling" \
        | tee -a docs/training/evals_r5.txt
    rc=${PIPESTATUS[0]}
    bank "round 5: bank eval FeedingJacoHuman-v0 (r6)" docs/training
    [ $rc -eq 0 ] && mark_stage "eval:coop_feeding_r6"
fi

if ! done_stage "bench:full_refresh"; then
    echo "=== $(date -u +%H:%M:%S) bench_all full refresh (matmul narrowphase build) ==="
    timeout 2400 python tools/bench_all.py --out docs/bench/bench_all_r5s3.jsonl
    rc=$?
    bank "round 5: bank full bench refresh on matmul-narrowphase build" docs/bench
    [ $rc -eq 0 ] && mark_stage "bench:full_refresh"
fi

for run in scratch_r4 coop_feeding_r6; do
    JAX_PLATFORMS=cpu python tools/plot_training.py runs/$run/metrics.jsonl \
        --out docs/training/${run}_curve.png 2>/dev/null
    cp runs/$run/metrics.csv docs/training/${run}_metrics.csv 2>/dev/null || true
done
bank "round 5: bank ext6 curves" docs/training
echo "=== ext6 complete $(date -u) ==="
