#!/bin/bash
# Round-5 training schedule.  Designed from the round-4 evidence:
#
#   * armman  — 60.9% deterministic eval (256 ep) already banked; skip.
#   * scratch — continued to ~update 290 in round 4; warm-continue to 450
#     if its eval landed below the round-2 reference point (61.3%).
#   * bed     — got only 48 updates in round 4 at the PRE-settle-fix cost
#     (33 s/update).  With the PCG settle fix it is ~4-5x cheaper; give it
#     a real budget AND the new tool-to-unwiped-target shaping potential
#     (the true reward saturates on first skin contact — envs/bed_bathing.py
#     shaping_potential docstring).
#   * drinking — flat 0% for 150 updates; true reward never rewards POURING.
#     Retrain with the new water-to-mouth potential (envs/drinking.py).
#   * feeding — coef-30 shaping resumed from an entropy-collapsed ckpt only
#     reached ~4% train success: the hold-food-never-approach local optimum
#     formed before the shaping was strengthened (docs/training/
#     feeding_diag_mid_r4.md).  Round 5: COLD start with coef 30 from update
#     0 so approach is shaped before any local optimum forms, higher
#     entropy floor, longer run.
#   * dressing — 54 updates banked; warm-continue.
#   * coop feeding — warm-continue with the same cold-shaping lesson.
#
# Serial by design — ONE process may own the TPU at a time (axon tunnel).
# Each run auto-resumes from its ckpt dir, so the script is idempotent.
# AGT_DEADLINE (epoch seconds) MUST be exported by the launcher; there is
# deliberately no hardcoded default epoch — round-5 timing is unknown at
# authoring time.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p docs/training runs ckpts

DEADLINE=${AGT_DEADLINE:?export AGT_DEADLINE=<epoch when the chip must be free>}
EVAL_RESERVE=$(( 45 * 60 ))     # keep 45 min for run_round5_evals.sh

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

run() {  # run <name> <est_minutes> <args...>
    local name=$1 est_min=$2; shift 2
    local now remaining avail
    now=$(date +%s)
    remaining=$(( DEADLINE - now - EVAL_RESERVE ))
    if (( remaining < 480 )); then
        echo "=== $(date -u +%H:%M:%S) skip $name (deadline: ${remaining}s left) ==="
        return
    fi
    avail=$(( est_min * 60 < remaining ? est_min * 60 : remaining ))
    echo "=== $(date -u +%H:%M:%S) training $name (budget ${avail}s) ==="
    timeout "$avail" python train.py "$@" \
        --log-dir "runs/$name" --ckpt-dir "ckpts/$name" \
        >> "runs/${name}.out" 2>&1
    echo "=== $(date -u +%H:%M:%S) $name done (rc=$?) ==="
    thin_ckpts "ckpts/$name"
    bank "round 5: bank training run $name" "runs/$name" "runs/${name}.out" "ckpts/$name"
}

# 1. Bed — cheapest big win: settle fix + target shaping + real budget.
#    Phi spans ~0.5 m against a ~+88 return background; coef 30 -> ~15
#    return units of shaped mass, annealed to 0 by update 160.
run bed_r5 55 --env BedBathingJaco-v0 --updates 240 --lr-decay \
    --entropy-coef 0.001 --shaping-coef 30.0 --shaping-decay 160 --seed 3 \
    --init-from ckpts/bed_r4

# 2. Drinking — pour shaping (water-to-mouth), cold restart so the
#    park-the-cup local optimum never forms unshaped.
run drinking_r5 50 --env DrinkingJaco-v0 --updates 200 --lr-decay \
    --entropy-coef 0.002 --shaping-coef 30.0 --shaping-decay 140 --seed 5

# 3. Feeding — cold + strong shaping from update 0 (the round-4 lesson),
#    higher entropy floor to delay collapse.
run feeding_r5 75 --env FeedingJaco-v0 --updates 450 --lr-decay \
    --entropy-coef 0.003 --shaping-coef 30.0 --shaping-decay 300 --seed 7

# 4-6. Warm-continues resume IN PLACE (same ckpt dir, higher --updates):
# auto-resume keeps the optimizer state and the lr-decay/shaping counters
# continuous, unlike --init-from which restarts schedules at update 0.

# 4. Scratch — top up only if round 4 ended short of the 61.3% reference.
run scratch_r4 25 --env ScratchItchJaco-v0 --updates 450 --lr-decay \
    --entropy-coef 0.001 --seed 3

# 5. Dressing — warm-continue on the Pallas cloth path.
run dressing_r4 30 --env DressingJaco-v0 --updates 180 --num-envs 2048 \
    --lr-decay --entropy-coef 0.001 --seed 3

# 6. Co-op feeding — warm-continue (shaping counters continue past their
#    decay horizon, so late training runs on the raw reference reward).
run coop_feeding_r4 35 --env FeedingJacoHuman-v0 --coop --updates 400 \
    --lr-decay --entropy-coef 0.001 --shaping-coef 30.0 --shaping-decay 150 \
    --seed 3

echo "=== all round-5 training done $(date -u) ==="
bash tools/run_round5_evals.sh
