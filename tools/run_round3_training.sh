#!/bin/bash
# Round-3 training schedule: policies for the remaining tasks.
# Serial by design — ONE process may own the TPU at a time (axon tunnel).
# Each run auto-resumes from its ckpt dir, so the script is idempotent.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p docs/training runs ckpts

run() {  # run <name> <args...>
    local name=$1; shift
    echo "=== $(date -u +%H:%M:%S) training $name ==="
    python train.py "$@" \
        --log-dir "runs/$name" --ckpt-dir "ckpts/$name" \
        >> "runs/${name}.out" 2>&1
    echo "=== $(date -u +%H:%M:%S) $name done (rc=$?) ==="
}

# 1. Feeding with annealed tip-potential shaping (round-3 headline).
#    Warm-started from the round-2 policy (25% eval success): shaping
#    targets exactly the failure mode diagnosed in
#    docs/training/feeding_diagnosis_r3.md, and warm start halves the
#    chip-hours vs a fresh run (the tunnel outage ate the slack).
run feeding_r3 --env FeedingJaco-v0 --updates 600 --lr-decay \
    --entropy-coef 0.001 --shaping-coef 3.0 --shaping-decay 400 \
    --init-from ckpts/feeding_r2b --seed 3

# 2. Bed bathing: 50 Hz physics, fastest env — cheap win.
run bed_r3 --env BedBathingJaco-v0 --updates 250 --lr-decay \
    --entropy-coef 0.001 --seed 3

# 3. Arm manipulation: dual-arm 14-dof, also 50 Hz.
run armman_r3 --env ArmManipulationJaco-v0 --updates 250 --lr-decay \
    --entropy-coef 0.001 --seed 3

# 4. Drinking: 250 Hz physics, slower env.
run drinking_r3 --env DrinkingJaco-v0 --updates 400 --lr-decay \
    --entropy-coef 0.001 --seed 3

# 5. Dressing: cloth, slowest env; smaller batch for wall-clock.
run dressing_r3 --env DressingJaco-v0 --updates 200 --num-envs 2048 \
    --lr-decay --entropy-coef 0.001 --seed 3

# Stretch goals (cut harmlessly if the round ends first):
# 6. Co-optimization on feeding (robot+human policies, paper §VIII) with
#    the same annealed tip shaping.
run coop_feeding_r3 --env FeedingJacoHuman-v0 --coop --updates 400 \
    --lr-decay --entropy-coef 0.001 --shaping-coef 3.0 --shaping-decay 280 \
    --seed 3

echo "=== all training done $(date -u) ==="
