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
run feeding_r3 --env FeedingJaco-v0 --updates 1000 --lr-decay \
    --entropy-coef 0.001 --shaping-coef 3.0 --shaping-decay 700 --seed 3

# 2. Bed bathing: 50 Hz physics, fastest env — cheap win.
run bed_r3 --env BedBathingJaco-v0 --updates 300 --lr-decay \
    --entropy-coef 0.001 --seed 3

# 3. Arm manipulation: dual-arm 14-dof, also 50 Hz.
run armman_r3 --env ArmManipulationJaco-v0 --updates 300 --lr-decay \
    --entropy-coef 0.001 --seed 3

# 4. Drinking: 250 Hz physics, slower env.
run drinking_r3 --env DrinkingJaco-v0 --updates 400 --lr-decay \
    --entropy-coef 0.001 --seed 3

# 5. Dressing: cloth, slowest env; smaller batch for wall-clock.
run dressing_r3 --env DressingJaco-v0 --updates 200 --num-envs 2048 \
    --lr-decay --entropy-coef 0.001 --seed 3

echo "=== all training done $(date -u) ==="
