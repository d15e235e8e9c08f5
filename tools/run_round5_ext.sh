#!/bin/bash
# Round-5 EXTENSION schedule — consumes the chip time left between the v2
# schedule's completion and the round deadline.  Slot design from the v2
# eval evidence (docs/training/evals_r5.txt):
#
#   scratch  — 31.2% eval @ update 750, train success 36.5% and still
#              climbing, 3.5 s/update: cheapest win, continue in place to
#              1100 with the lr horizon re-stretched.
#   feeding  — 3.5%: the r5 curve shows entropy RISING monotonically
#              6.44->9.79 under --entropy-coef 0.003 (runs/feeding_r5) —
#              the entropy bonus dominated the return gradient and kept the
#              policy near-random (std~1.0) while success still crept to
#              5.9%.  Continue from the ckpt with entropy-coef 0 so the
#              policy can sharpen around the success signal it has found.
#   coop     — same entropy pathology (warm-continued with 0.001); give it
#              the same fix with whatever time remains.
#
# Same state-persistence pattern as run_round5_schedule_v2.sh: completed
# stages recorded in runs/schedule_r5ext.state, safe to kill + relaunch.
# Serial — ONE process may own the TPU (axon tunnel).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p docs/training runs ckpts

DEADLINE=${AGT_DEADLINE:?export AGT_DEADLINE=<epoch when the chip must be free>}
STATE=runs/schedule_r5ext.state
V2STATE=runs/schedule_r5.state
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

remaining() { echo $(( DEADLINE - $(date +%s) )); }

# ---- wait for the v2 schedule to release the chip --------------------------
echo "=== $(date -u +%H:%M:%S) waiting for v2 schedule (bench:all) ==="
while ! grep -qxF "bench:all" "$V2STATE" 2>/dev/null; do
    if (( $(remaining) < 600 )); then
        echo "deadline reached while waiting for v2; exiting"; exit 0
    fi
    sleep 30
done
# let v2's final commit land
sleep 60
echo "=== $(date -u +%H:%M:%S) chip free, $(remaining)s to deadline ==="

run_train() {  # run_train <name> <est_minutes> <args...>
    local name=$1 est_min=$2; shift 2
    local stage="train:$name"
    done_stage "$stage" && { echo "=== skip $stage (done) ==="; return; }
    local rem avail
    rem=$(( $(remaining) - 600 ))   # always leave 10 min for the eval
    if (( rem < 480 )); then
        echo "=== $(date -u +%H:%M:%S) skip $name (deadline: ${rem}s left) ==="
        return
    fi
    avail=$(( est_min * 60 < rem ? est_min * 60 : rem ))
    echo "=== $(date -u +%H:%M:%S) training $name (budget ${avail}s) ==="
    timeout "$avail" python train.py "$@" \
        --log-dir "runs/$name" --ckpt-dir "ckpts/$name" \
        >> "runs/${name}.out" 2>&1
    local rc=$?
    echo "=== $(date -u +%H:%M:%S) $name done (rc=$rc) ==="
    thin_ckpts "ckpts/$name"
    bank "round 5: bank training run $name" "runs/$name" "runs/${name}.out" "ckpts/$name"
    if [ $rc -eq 0 ] || [ $rc -eq 124 ]; then mark_stage "$stage"; fi
}

run_eval() {  # run_eval <name> <env> <ckpt-dir> <episodes> [extra...]
    local name=$1 env=$2 ck=$3 ep=$4; shift 4
    local stage="eval:$name"
    done_stage "$stage" && { echo "=== skip $stage (done) ==="; return; }
    [ -d "$ck" ] || { echo "skip eval $name ($ck missing)"; return; }
    if (( $(remaining) < -1800 )); then
        echo "=== skip eval $name (past deadline) ==="; return
    fi
    echo "=== $(date -u +%H:%M:%S) eval $env $ck $* ===" | tee -a docs/training/evals_r5.txt
    timeout 900 stdbuf -oL -eL python tools/eval_policy.py --env "$env" \
        --ckpt-dir "$ck" --episodes "$ep" "$@" 2>&1 \
        | stdbuf -oL grep -v -E "WARNING|\*\*\*|slow_operation|Compiling" \
        | tee -a docs/training/evals_r5.txt
    local rc=${PIPESTATUS[0]}
    bank "round 5: bank eval $env" docs/training
    [ $rc -eq 0 ] && mark_stage "$stage"
}

# 0. Component-ablation timings the verdict asked for (#4 drinking substep
#    attack evidence, #9 dressing lane saturation) — ~18 min total, banks
#    the numbers that BASELINE.md paragraphs are written from.
if ! done_stage "bench:drink_parts"; then
    timeout 900 python tools/bench_step_parts.py --env DrinkingJaco-v0 \
        --steps 20 --out docs/bench/step_parts_r5.jsonl 2>/dev/null
    bank "round 5: bank drinking step component ablation" docs/bench
    mark_stage "bench:drink_parts"
fi
if ! done_stage "bench:dress_parts"; then
    for ne in 2048 4096 8192; do
        timeout 700 python tools/bench_step_parts.py --env DressingJaco-v0 \
            --num-envs $ne --steps 20 --out docs/bench/step_parts_r5.jsonl \
            2>/dev/null
    done
    bank "round 5: bank dressing lane-saturation ablation" docs/bench
    mark_stage "bench:dress_parts"
fi

# 1. Scratch — cheapest win: continue in place, lr re-stretched to 1100.
run_train scratch_r4 25 --env ScratchItchJaco-v0 --updates 1100 --lr-decay \
    --entropy-coef 0.001 --seed 3
run_eval scratch_r4_ext ScratchItchJaco-v0 ckpts/scratch_r4 256

# 2. Feeding — entropy-coef 0 continuation (the r5 pathology fix).
run_train feeding_r6 75 --env FeedingJaco-v0 --updates 400 --lr-decay \
    --entropy-coef 0.0 --shaping-coef 10.0 --shaping-decay 150 --seed 11 \
    --init-from ckpts/feeding_r5
run_eval feeding_r6 FeedingJaco-v0 ckpts/feeding_r6 256

# 3. Co-op feeding — same entropy fix with whatever remains.
run_train coop_feeding_r5 35 --env FeedingJacoHuman-v0 --coop --updates 250 \
    --lr-decay --entropy-coef 0.0 --shaping-coef 10.0 --shaping-decay 100 \
    --seed 11 --init-from ckpts/coop_feeding_r4
run_eval coop_feeding_r5 FeedingJacoHuman-v0 ckpts/coop_feeding_r5 256 --coop

# plots for the new/extended runs
for n in scratch_r4 feeding_r6 coop_feeding_r5; do
    [ -f "runs/$n/metrics.jsonl" ] || continue
    JAX_PLATFORMS=cpu python tools/plot_training.py "runs/$n/metrics.jsonl" \
        --out "docs/training/${n}_curve.png" 2>/dev/null
    cp "runs/$n/metrics.csv" "docs/training/${n}_metrics.csv" 2>/dev/null || true
done
bank "round 5: bank extension training curves" docs/training

echo "=== round-5 extension schedule complete $(date -u) ==="
