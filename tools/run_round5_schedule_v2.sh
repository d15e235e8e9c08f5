#!/bin/bash
# Round-5 schedule v2 — replaces run_round5_training.sh with the three
# structural fixes the round-4 verdict demanded:
#
#   * POSITION PERSISTENCE (VERDICT #7): every completed stage is recorded
#     in runs/schedule_r5.state; a relaunch (session boundary, crash, kill)
#     skips completed stages and resumes the in-flight one (train.py
#     auto-resumes from its ckpt dir, so a half-done slot loses nothing).
#     Kill it mid-run and relaunch: it resumes and the evals still land.
#   * PER-SLOT EVALS (VERDICT #7): each task's deterministic eval fires the
#     moment its training slot ends, instead of one terminal block that a
#     session boundary can eat (round 4 nearly lost all evals to this).
#   * SETTLE A/B FIRST (VERDICT #3): tools/bench_reset.py runs before any
#     training so the bed budget math is measured, not assumed.
#
# Slot design from the round-4 evidence (ROUND4_NOTES.md round-5 handoff):
#   feeding  — COLD, shaping coef 30 from update 0 (coef-3 was invisible;
#              coef-30 resumed at 200 couldn't break entropy collapse),
#              entropy floor 0.003, 600 updates.
#   scratch  — warm-continue ckpts/scratch_r4 (update 210, 11% train
#              success and climbing).  Root cause of the 61.3%->0%
#              "regression" is budget, not drift: round 2 ran 600 updates,
#              round 4 got 216 of a 290-update lr horizon (docs/training/
#              scratch_regression_rca.md).  Re-stretch lr to 750.
#   bed      — 240 updates at the post-settle-fix cost + the new
#              tool-to-unwiped-target shaping.
#   drinking — cold with the new water-to-mouth pour shaping.
#   dressing — warm-continue on the Pallas cloth path.
#   pr2      — ScratchItchPR2 cold: first trained non-Jaco policy, the
#              first end-to-end validation of JLWKI base placement
#              (VERDICT missing #3 / next #6).
#   coop     — warm-continue dual-policy feeding.
#
# Serial by design — ONE process may own the TPU at a time (axon tunnel).
# AGT_DEADLINE (epoch seconds) must be exported by the launcher.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p docs/training docs/bench runs ckpts

DEADLINE=${AGT_DEADLINE:?export AGT_DEADLINE=<epoch when the chip must be free>}
FINAL_RESERVE=$(( 70 * 60 ))    # bench_all + leftover evals at the end
STATE=runs/schedule_r5.state
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

remaining() { echo $(( DEADLINE - $(date +%s) - FINAL_RESERVE )); }

run_train() {  # run_train <name> <est_minutes> <args...>
    local name=$1 est_min=$2; shift 2
    local stage="train:$name"
    done_stage "$stage" && { echo "=== skip $stage (done) ==="; return; }
    local rem avail
    rem=$(remaining)
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
    # rc=0 (finished) or rc=124 with a banked ckpt both count as complete
    # enough to move on; an early crash (rc!=0,!=124) is NOT marked so a
    # relaunch retries it with whatever budget remains.
    if [ $rc -eq 0 ] || [ $rc -eq 124 ]; then mark_stage "$stage"; fi
}

run_eval() {  # run_eval <name> <env> <ckpt-dir> <episodes> [extra...]
    local name=$1 env=$2 ck=$3 ep=$4; shift 4
    local stage="eval:$name"
    done_stage "$stage" && { echo "=== skip $stage (done) ==="; return; }
    [ -d "$ck" ] || { echo "skip eval $name ($ck missing)"; return; }
    if (( $(remaining) < -2700 )); then   # evals may eat into the reserve
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

run_plots() {
    for n in feeding_r5 drinking_r5 bed_r5 scratch_r4 scratch_pr2_r5 \
             dressing_r4 coop_feeding_r4; do
        [ -f "runs/$n/metrics.jsonl" ] || continue
        JAX_PLATFORMS=cpu python tools/plot_training.py "runs/$n/metrics.jsonl" \
            --out "docs/training/${n}_curve.png" 2>/dev/null
        cp "runs/$n/metrics.csv" "docs/training/${n}_metrics.csv" 2>/dev/null || true
    done
    bank "round 5: bank training curves" docs/training
}

# ---- stage 0: bench evidence first (cheap, banks early) --------------------
if ! done_stage "bench:flagship"; then
    timeout 1800 python bench.py 2>/dev/null | tail -1 | tee docs/bench/BENCH_live_r5.json
    bank "round 5: bank live flagship bench" docs/bench
    mark_stage "bench:flagship"
fi

# ---- stage 1: settle PCG-vs-Cholesky A/B (VERDICT #3) ----------------------
if ! done_stage "bench:reset"; then
    timeout 2400 python tools/bench_reset.py \
        --envs BedBathingJaco-v0 ArmManipulationJaco-v0 --batch 4096 \
        --out docs/bench/reset_bench_r5.jsonl 2>/dev/null \
        | tee -a docs/bench/reset_bench_r5.log
    bank "round 5: bank settle PCG-vs-Cholesky reset A/B on silicon" docs/bench
    mark_stage "bench:reset"
fi

# ---- stage 2: training + eval slots ----------------------------------------
# 1. Feeding — the headline (VERDICT next #1): cold, coef-30 from update 0.
run_train feeding_r5 100 --env FeedingJaco-v0 --updates 600 --lr-decay \
    --entropy-coef 0.003 --shaping-coef 30.0 --shaping-decay 300 --seed 7
run_eval feeding_r5 FeedingJaco-v0 ckpts/feeding_r5 256

# 2. Scratch — warm-continue to 750 (root cause: budget, see RCA doc).
run_train scratch_r4 75 --env ScratchItchJaco-v0 --updates 750 --lr-decay \
    --entropy-coef 0.001 --seed 3
run_eval scratch_r4 ScratchItchJaco-v0 ckpts/scratch_r4 256

# 3. Bed — post-settle-fix budget + wipe-target shaping.
run_train bed_r5 60 --env BedBathingJaco-v0 --updates 240 --lr-decay \
    --entropy-coef 0.001 --shaping-coef 30.0 --shaping-decay 160 --seed 3 \
    --init-from ckpts/bed_r4
run_eval bed_r5 BedBathingJaco-v0 ckpts/bed_r5 256

# 4. Drinking — cold with pour shaping.
run_train drinking_r5 55 --env DrinkingJaco-v0 --updates 200 --lr-decay \
    --entropy-coef 0.002 --shaping-coef 30.0 --shaping-decay 140 --seed 5
run_eval drinking_r5 DrinkingJaco-v0 ckpts/drinking_r5 256

# 5. Dressing — warm-continue on the Pallas cloth path.
run_train dressing_r4 35 --env DressingJaco-v0 --updates 240 --num-envs 2048 \
    --lr-decay --entropy-coef 0.001 --seed 3
run_eval dressing_r4 DressingJaco-v0 ckpts/dressing_r4 128

# 6. First non-Jaco policy: ScratchItchPR2 cold (VERDICT next #6).
run_train scratch_pr2_r5 45 --env ScratchItchPR2-v0 --updates 400 --lr-decay \
    --entropy-coef 0.001 --seed 3
run_eval scratch_pr2_r5 ScratchItchPR2-v0 ckpts/scratch_pr2_r5 256

# 7. Co-op feeding — warm-continue.
run_train coop_feeding_r4 45 --env FeedingJacoHuman-v0 --coop --updates 400 \
    --lr-decay --entropy-coef 0.001 --shaping-coef 30.0 --shaping-decay 150 \
    --seed 3
run_eval coop_feeding_r4 FeedingJacoHuman-v0 ckpts/coop_feeding_r4 256 --coop

run_plots

# ---- stage 3: per-task throughput table LAST so it reflects any perf work
# landed during the round (drinking substep attack, VERDICT next #4) --------
if ! done_stage "bench:all"; then
    timeout 3600 python tools/bench_all.py 2>/dev/null \
        | tee docs/bench/bench_all_r5.jsonl
    bank "round 5: bank per-task TPU throughput table" docs/bench
    mark_stage "bench:all"
fi

echo "=== round-5 schedule v2 complete $(date -u) ==="
