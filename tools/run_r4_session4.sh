#!/bin/bash
# Round-4 session-4 schedule (restarted 02:45Z Aug 19; v1 killed after its
# first eval hit the 420 s timeout — TPU compile of an eval program through
# the axon tunnel takes >7 min, so evals now get 900 s and line-buffered
# pipes so a timeout still banks whatever printed).
#
# The v3 schedule died at the previous session boundary after coop_feeding:
# dressing never trained and run_round4_evals.sh never fired, so none of the
# six banked checkpoints has a deterministic eval.  Evidence-value order:
#
#   1. armman eval (training success ~58% — the round's best number)
#   2. dressing training (the one task with no checkpoint at all)
#   3. scratch continuation 180 -> 290 updates (round-2 hit ~60% train
#      success by update ~300; the curve was still climbing at the kill)
#   4. evals: scratch, feeding, dressing, then the low-signal three
#   5. curve plots (CPU)
#
# Serial by design — ONE process may own the TPU at a time (axon tunnel).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p docs/training runs ckpts

# Free the chip by 04:30Z: covers this ~2h agent session plus margin, so a
# driver round-end bench.py can never collide with a training process.
DEADLINE=${AGT_DEADLINE:-1787113800}

bank() {  # bank <msg> <paths...> — commit artifacts, tolerate lock races
    local msg=$1; shift
    for i in 1 2 3; do
        git add -A "$@" 2>/dev/null && \
        git commit -m "$msg" >/dev/null 2>&1 && return 0
        sleep 7
    done
    return 0
}

thin_ckpts() {  # keep only the newest (json, msgpack) pair in a ckpt dir
    local d=$1
    [ -d "$d" ] || return 0
    ls "$d"/ckpt_*.msgpack 2>/dev/null | sort -V | head -n -1 | while read -r f; do
        rm -f "$f" "${f%.msgpack}.json"
    done
}

left() { echo $(( DEADLINE - $(date +%s) )); }

ev() {  # ev <env> <ckpt-dir> <episodes> [extra args...]
    local env=$1 ck=$2 ep=${3:-256}; shift 3 || true
    [ -d "$ck" ] || { echo "skip $ck (missing)"; return; }
    if (( $(left) < 600 )); then echo "skip eval $env (deadline)"; return; fi
    echo "=== $(date -u +%H:%M:%S) eval $env $ck $* ==="
    timeout 900 stdbuf -oL -eL python tools/eval_policy.py --env "$env" \
        --ckpt-dir "$ck" --episodes "$ep" "$@" 2>&1 \
        | stdbuf -oL grep -v -E "WARNING|\*\*\*|slow_operation|Compiling" \
        | tee -a docs/training/evals_r4.txt
    echo "=== $(date -u +%H:%M:%S) eval $env done (rc=$?) ==="
    bank "round 4: bank eval $env" docs/training
}

run() {  # run <name> <est_minutes> <args...>
    local name=$1 est_min=$2; shift 2
    local now remaining avail
    now=$(date +%s)
    remaining=$(( DEADLINE - now - 900 ))   # keep >=15 min for evals
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
    bank "round 4: bank training run $name" "runs/$name" "runs/${name}.out" "ckpts/$name"
}

# ---- Phase 1: the round's best number ----
ev ArmManipulationJaco-v0 ckpts/armman_r4 256

# ---- Phase 2: dressing — the one task with no checkpoint at all ----
run dressing_r4 22 --env DressingJaco-v0 --updates 90 --num-envs 2048 \
    --lr-decay --entropy-coef 0.001 --seed 3
if ! ls ckpts/dressing_r4/ckpt_*.msgpack >/dev/null 2>&1; then
    echo "=== dressing produced no checkpoint; retrying on the XLA cloth path ==="
    AGT_CLOTH_KERNEL=0 run dressing_r4 18 --env DressingJaco-v0 \
        --updates 60 --num-envs 2048 --lr-decay --entropy-coef 0.001 --seed 3
fi

# ---- Phase 3: scratch continuation (curve still climbing at update 187) ----
run scratch_r4 17 --env ScratchItchJaco-v0 --updates 290 --lr-decay \
    --entropy-coef 0.001 --seed 3

# ---- Phase 4: remaining evals, value order ----
ev ScratchItchJaco-v0     ckpts/scratch_r4      256
ev FeedingJaco-v0         ckpts/feeding_r4      256
ev DressingJaco-v0        ckpts/dressing_r4     128
ev FeedingJacoHuman-v0    ckpts/coop_feeding_r4 256 --coop
ev DrinkingJaco-v0        ckpts/drinking_r4     256
ev BedBathingJaco-v0      ckpts/bed_r4          256

# ---- Phase 5: curve plots (CPU — fine past the chip deadline) ----
for n in feeding_r4 scratch_r4 bed_r4 armman_r4 drinking_r4 dressing_r4 coop_feeding_r4; do
    [ -f "runs/$n/metrics.jsonl" ] || continue
    JAX_PLATFORMS=cpu python tools/plot_training.py "runs/$n/metrics.jsonl" \
        --out "docs/training/${n}_curve.png" 2>/dev/null
    cp "runs/$n/metrics.csv" "docs/training/${n}_metrics.csv" 2>/dev/null || true
done
bank "round 4: bank session-4 evals + training curves" docs/training runs ckpts
echo "=== session-4 schedule done $(date -u) ==="
