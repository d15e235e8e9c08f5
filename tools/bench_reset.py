"""Reset-throughput bench: the settle_human PCG-vs-Cholesky A/B on silicon.

Bed-task training updates were measured at 33-37 s while wheelchair tasks
take 9-15 s at MORE physics substeps (BASELINE.md round-4 table).  The
difference is the reset-time settle loop (200-250 human-only substeps,
envs/base.py settle_human): under vmap, the 40-dof mass-matrix Cholesky
lowers to a serialised small-matrix loop on TPU.  settle_human now uses a
Jacobi-PCG solve + a human-pair static prune; this bench times the full
vmapped reset for both solver paths (AGT_SETTLE_SOLVER trace-time gate)
and prints one JSON line per (env, solver) with resets/s.

    python tools/bench_reset.py --envs BedBathingJaco-v0 ArmManipulationJaco-v0

Each timed call uses fresh PRNG keys (the axon tunnel memoises repeated
identical calls — see .claude/skills/verify).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import assistive_gym_tpu  # noqa: F401

import jax


def bench_env(env_id: str, batch: int, solver: str, reps: int = 3):
    os.environ["AGT_SETTLE_SOLVER"] = solver
    from assistive_gym_tpu.registry import load

    task = load(env_id)
    reset = jax.jit(lambda keys: jax.vmap(task.reset)(keys))
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    state, obs = reset(keys)           # compile + warm
    jax.block_until_ready(obs)
    t0 = time.time()
    for i in range(1, reps + 1):
        keys = jax.random.split(jax.random.PRNGKey(i), batch)
        state, obs = reset(keys)
    jax.block_until_ready(obs)
    dt = (time.time() - t0) / reps
    rec = {
        "env": env_id, "solver": solver, "batch": batch,
        "reset_ms": round(dt * 1000, 1),
        "resets_per_s": round(batch / dt, 1),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", nargs="+",
                    default=["BedBathingJaco-v0", "ArmManipulationJaco-v0"])
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--solvers", nargs="+", default=["cg", "chol"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    def emit(rec):
        if args.out:
            os.makedirs(os.path.dirname(args.out), exist_ok=True)
            with open(args.out, "a") as f:   # incremental: a timeout mid-run
                f.write(json.dumps(rec) + "\n")  # keeps earlier measurements

    for env_id in args.envs:
        for solver in args.solvers:
            try:
                emit(bench_env(env_id, args.batch, solver))
            except Exception as e:  # bank partial results on any fault
                rec = {"env": env_id, "solver": solver, "error": str(e)[:300]}
                print(json.dumps(rec), flush=True)
                emit(rec)


if __name__ == "__main__":
    main()
