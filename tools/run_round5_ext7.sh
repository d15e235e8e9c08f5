#!/bin/bash
# Round-5 extension 7 — session-4 chip block.  Ordered by the session-3
# handoff (ROUND5_NOTES.md "What's still open"):
#   1. drinking_r7: FIRST run on the fixed 18 cm tilt gate
#      (drinking.py::shaping_potential was widened AFTER drinking_r6
#      trained on the 10 cm gate that never opened at the measured
#      11.5 cm park distance).  Warm from drinking_r6 (approach learned,
#      entropy ~1.17), fresh schedules, fast curriculum re-anneal.
#   2. feeding_r8: the log_std-cap lever (--log-std-max -0.7) — every
#      feeding run plateaus with entropy ~8.8 (sigma ~0.9 on clipped
#      actions); cap sigma ~0.5 so late training refines the mean.
#      Warm from feeding_r6 (23.4% eval).
#   3. opportunistic: scratch 1400 -> 1800 (chasing 61.3% r2 parity),
#      full bench refresh.
# Same state-machine pattern as ext4-6; safe to kill/relaunch at any time.
set -uo pipefail
cd "$(dirname "$0")/.."
STATE=runs/schedule_r5ext7.state
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

# ---- stage 0: drinking on the fixed tilt gate
if ! done_stage "train:drinking_r7"; then
    echo "=== $(date -u +%H:%M:%S) drinking_r7 (fixed 18cm gate, warm from r6) ==="
    timeout 2100 python train.py --env DrinkingJaco-v0 --updates 300 --lr-decay \
        --entropy-coef 0.0 --shaping-coef 30.0 --shaping-decay 250 \
        --curriculum-decay 150 --seed 11 --init-from ckpts/drinking_r6 \
        --log-dir runs/drinking_r7 --ckpt-dir ckpts/drinking_r7 \
        >> runs/drinking_r7.out 2>&1
    rc=$?
    thin_ckpts ckpts/drinking_r7
    bank "round 5: bank drinking_r7 fixed-gate run" runs/drinking_r7 \
        runs/drinking_r7.out ckpts/drinking_r7
    [ $rc -eq 0 ] || [ $rc -eq 124 ] && mark_stage "train:drinking_r7"
fi
if ! done_stage "eval:drinking_r7"; then
    echo "=== $(date -u +%H:%M:%S) eval DrinkingJaco-v0 ckpts/drinking_r7 ===" \
        | tee -a docs/training/evals_r5.txt
    timeout 900 stdbuf -oL -eL python tools/eval_policy.py --env DrinkingJaco-v0 \
        --ckpt-dir ckpts/drinking_r7 --episodes 256 2>&1 \
        | stdbuf -oL grep -v -E "WARNING|\*\*\*|slow_operation|Compiling" \
        | tee -a docs/training/evals_r5.txt
    rc=${PIPESTATUS[0]}
    bank "round 5: bank eval DrinkingJaco-v0 (r7)" docs/training
    [ $rc -eq 0 ] && mark_stage "eval:drinking_r7"
fi

# ---- stage 1: feeding with the log_std cap
if ! done_stage "train:feeding_r8"; then
    echo "=== $(date -u +%H:%M:%S) feeding_r8 (log_std cap -0.7, warm from r6) ==="
    timeout 1800 python train.py --env FeedingJaco-v0 --updates 300 --lr-decay \
        --entropy-coef 0.0 --log-std-max -0.7 --seed 13 \
        --init-from ckpts/feeding_r6 \
        --log-dir runs/feeding_r8 --ckpt-dir ckpts/feeding_r8 \
        >> runs/feeding_r8.out 2>&1
    rc=$?
    thin_ckpts ckpts/feeding_r8
    bank "round 5: bank feeding_r8 log_std-cap run" runs/feeding_r8 \
        runs/feeding_r8.out ckpts/feeding_r8
    [ $rc -eq 0 ] || [ $rc -eq 124 ] && mark_stage "train:feeding_r8"
fi
if ! done_stage "eval:feeding_r8"; then
    echo "=== $(date -u +%H:%M:%S) eval FeedingJaco-v0 ckpts/feeding_r8 ===" \
        | tee -a docs/training/evals_r5.txt
    timeout 900 stdbuf -oL -eL python tools/eval_policy.py --env FeedingJaco-v0 \
        --ckpt-dir ckpts/feeding_r8 --episodes 256 2>&1 \
        | stdbuf -oL grep -v -E "WARNING|\*\*\*|slow_operation|Compiling" \
        | tee -a docs/training/evals_r5.txt
    rc=${PIPESTATUS[0]}
    bank "round 5: bank eval FeedingJaco-v0 (r8)" docs/training
    [ $rc -eq 0 ] && mark_stage "eval:feeding_r8"
fi

# ---- stage 2: opportunistic scratch continuation 1400 -> 1800
if ! done_stage "train:scratch_r4d"; then
    echo "=== $(date -u +%H:%M:%S) scratch_r4 -> 1800 updates ==="
    timeout 3300 python train.py --env ScratchItchJaco-v0 --updates 1800 \
        --lr-decay --entropy-coef 0.001 --seed 3 \
        --log-dir runs/scratch_r4 --ckpt-dir ckpts/scratch_r4 \
        >> runs/scratch_r4.out 2>&1
    rc=$?
    thin_ckpts ckpts/scratch_r4
    bank "round 5: bank scratch_r4 continuation toward 1800" runs/scratch_r4 \
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

# ---- stage 3: full bench refresh on the default (matmul) narrowphase build
if ! done_stage "bench:full_refresh"; then
    echo "=== $(date -u +%H:%M:%S) bench_all full refresh ==="
    timeout 2400 python tools/bench_all.py --out docs/bench/bench_all_r5s4.jsonl
    rc=$?
    bank "round 5: bank full bench refresh (session 4)" docs/bench
    [ $rc -eq 0 ] && mark_stage "bench:full_refresh"
fi

for run in drinking_r7 feeding_r8 scratch_r4; do
    JAX_PLATFORMS=cpu python tools/plot_training.py runs/$run/metrics.jsonl \
        --out docs/training/${run}_curve.png 2>/dev/null
    cp runs/$run/metrics.csv docs/training/${run}_metrics.csv 2>/dev/null || true
done
bank "round 5: bank ext7 curves" docs/training
echo "=== ext7 complete $(date -u) ==="
