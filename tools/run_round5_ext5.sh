#!/bin/bash
# Round-5 extension 5 — capability slots for the two open policy gaps
# (feeding >=50%, drinking >0%) using the new train-time mechanisms:
#   * in_mouth-shell curriculum (envs/{feeding,drinking}.py::curriculum,
#     ppo.py curriculum hook) — annealed back to reference parity
#   * drinking tilt-gated pour shaping (drinking.py::shaping_potential)
#   * incidence-matmul contact narrowphase (physics/batched.py::_mm) —
#     stage 0 banks the silicon A/B before an hour is trained on it.
# Same state-machine pattern; safe to kill/relaunch at any time.
set -uo pipefail
cd "$(dirname "$0")/.."
STATE=runs/schedule_r5ext5.state
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

# ---- stage 0: narrowphase matmul A/B on silicon (fast, evidence-first)
if ! done_stage "bench:narrowphase_mm"; then
    echo "=== $(date -u +%H:%M:%S) contact-path A/B bench (gather/scatter vs one-hot matmul) ==="
    timeout 900 python tools/bench_all.py --tasks drinking/jaco feeding/jaco \
        --out docs/bench/bench_contact_default_r5.jsonl
    rc=$?
    AGT_CONTACT_MM=1 timeout 900 python tools/bench_all.py \
        --tasks drinking/jaco feeding/jaco \
        --out docs/bench/bench_contact_mm_r5.jsonl || true
    bank "round 5: bank contact-path silicon A/B (default vs AGT_CONTACT_MM)" docs/bench
    [ $rc -eq 0 ] && mark_stage "bench:narrowphase_mm"
fi

# ---- stage 1: feeding warm-continue + shell curriculum
if ! done_stage "train:feeding_r7"; then
    echo "=== $(date -u +%H:%M:%S) feeding_r7 (warm from r6, curriculum) ==="
    timeout 3600 python train.py --env FeedingJaco-v0 --updates 650 --lr-decay \
        --entropy-coef 0.0 --shaping-coef 30.0 --shaping-decay 300 \
        --curriculum-decay 300 --seed 17 \
        --init-from ckpts/feeding_r6 \
        --log-dir runs/feeding_r7 --ckpt-dir ckpts/feeding_r7 \
        >> runs/feeding_r7.out 2>&1
    rc=$?
    thin_ckpts ckpts/feeding_r7
    bank "round 5: bank feeding_r7 curriculum run" runs/feeding_r7 \
        runs/feeding_r7.out ckpts/feeding_r7
    [ $rc -eq 0 ] || [ $rc -eq 124 ] && mark_stage "train:feeding_r7"
fi
if ! done_stage "eval:feeding_r7"; then
    echo "=== $(date -u +%H:%M:%S) eval FeedingJaco-v0 ckpts/feeding_r7 ===" \
        | tee -a docs/training/evals_r5.txt
    timeout 900 stdbuf -oL -eL python tools/eval_policy.py --env FeedingJaco-v0 \
        --ckpt-dir ckpts/feeding_r7 --episodes 256 2>&1 \
        | stdbuf -oL grep -v -E "WARNING|\*\*\*|slow_operation|Compiling" \
        | tee -a docs/training/evals_r5.txt
    rc=${PIPESTATUS[0]}
    bank "round 5: bank eval FeedingJaco-v0 (r7)" docs/training
    [ $rc -eq 0 ] && mark_stage "eval:feeding_r7"
fi

# ---- stage 2: drinking with tilt-gated shaping + shell curriculum
if ! done_stage "train:drinking_r6"; then
    echo "=== $(date -u +%H:%M:%S) drinking_r6 (tilt-gated shaping + curriculum) ==="
    timeout 4500 python train.py --env DrinkingJaco-v0 --updates 500 --lr-decay \
        --entropy-coef 0.0 --shaping-coef 30.0 --shaping-decay 300 \
        --curriculum-decay 300 --seed 7 \
        --log-dir runs/drinking_r6 --ckpt-dir ckpts/drinking_r6 \
        >> runs/drinking_r6.out 2>&1
    rc=$?
    thin_ckpts ckpts/drinking_r6
    bank "round 5: bank drinking_r6 curriculum run" runs/drinking_r6 \
        runs/drinking_r6.out ckpts/drinking_r6
    [ $rc -eq 0 ] || [ $rc -eq 124 ] && mark_stage "train:drinking_r6"
fi
if ! done_stage "eval:drinking_r6"; then
    echo "=== $(date -u +%H:%M:%S) eval DrinkingJaco-v0 ckpts/drinking_r6 ===" \
        | tee -a docs/training/evals_r5.txt
    timeout 900 stdbuf -oL -eL python tools/eval_policy.py --env DrinkingJaco-v0 \
        --ckpt-dir ckpts/drinking_r6 --episodes 256 2>&1 \
        | stdbuf -oL grep -v -E "WARNING|\*\*\*|slow_operation|Compiling" \
        | tee -a docs/training/evals_r5.txt
    rc=${PIPESTATUS[0]}
    bank "round 5: bank eval DrinkingJaco-v0 (r6)" docs/training
    [ $rc -eq 0 ] && mark_stage "eval:drinking_r6"
fi

for run in feeding_r7 drinking_r6; do
    JAX_PLATFORMS=cpu python tools/plot_training.py runs/$run/metrics.jsonl \
        --out docs/training/${run}_curve.png 2>/dev/null
    cp runs/$run/metrics.csv docs/training/${run}_metrics.csv 2>/dev/null || true
done
bank "round 5: bank ext5 curves" docs/training
echo "=== ext5 complete $(date -u) ==="
