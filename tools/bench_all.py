"""Per-task TPU throughput table (BASELINE.md §'measured throughput').

Prints one JSON line per env: {"env": ..., "envs": B, "steps_per_s": N}.
Run ONLY when nothing else owns the TPU (axon allows one client).

    python tools/bench_all.py [--quick]
"""
import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def _guard_device_init(budget_s=240.0):
    """Bound jax.devices(); tunnel-down init blocks ~28 min otherwise."""
    done = threading.Event()

    def watchdog():
        if not done.wait(budget_s):
            print(json.dumps({"error": "tpu_unreachable: device init "
                              "exceeded %ds" % budget_s}), flush=True)
            os._exit(3)

    threading.Thread(target=watchdog, daemon=True).start()
    try:
        jax.devices()
    except Exception as e:
        done.set()
        print(json.dumps({"error": "tpu_unreachable: %r" % str(e)[:200]}),
              flush=True)
        os._exit(3)
    done.set()

# (task, robot, batch, measure_steps); dressing at 2048 lanes (cloth VMEM)
CASES = [
    ("scratch_itch", "jaco", 4096, 30),
    ("bed_bathing", "jaco", 4096, 30),
    ("feeding", "jaco", 4096, 30),
    ("drinking", "jaco", 4096, 20),
    ("dressing", "jaco", 2048, 10),
    ("dressing", "jaco", 4096, 10),   # r4: neighbor-table cloth, HBM-bound
    ("arm_manipulation", "jaco", 4096, 30),
    ("arm_manipulation", "pr2", 4096, 20),  # dual-arm R=47: block_b=512 path
    # non-Jaco coverage (VERDICT r4 missing #3): one row per extra robot on
    # 2-3 tasks each — first throughput evidence for the wheelchair-task
    # JLWKI/position_robot_toc reset path and the Sawyer/Baxter models.
    ("scratch_itch", "pr2", 4096, 20),
    ("feeding", "pr2", 4096, 20),
    ("scratch_itch", "sawyer", 4096, 20),
    ("feeding", "sawyer", 4096, 20),
    ("scratch_itch", "baxter", 4096, 20),
    ("bed_bathing", "baxter", 4096, 20),
]


def bench_one(task_name, robot, batch, steps):
    from assistive_gym_tpu.envs import build_task
    task = build_task(task_name, robot, False)
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    reset = jax.jit(jax.vmap(task.reset))
    step = (jax.jit(task.step_batched, donate_argnums=(0,))
            if hasattr(task, "step_batched")
            else jax.jit(jax.vmap(task.step), donate_argnums=(0,)))
    state, obs = reset(keys)
    actions = jax.random.uniform(jax.random.PRNGKey(1),
                                 (batch, task.spec.action_len),
                                 jnp.float32, -1.0, 1.0)
    state, obs, *_ = step(state, actions)       # compile + warm
    jax.block_until_ready(obs)
    t0 = time.time()
    for _ in range(steps):
        state, obs, rew, done, info = step(state, actions)
    jax.block_until_ready(obs)
    return steps * batch / (time.time() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="halve batch and steps (shorter chip occupancy)")
    ap.add_argument("--tasks", nargs="*", default=None, metavar="TASK/ROBOT",
                    help="subset filter, e.g. --tasks drinking/jaco "
                         "feeding/jaco (default: all)")
    ap.add_argument("--out", default=None,
                    help="also append the JSON lines to this file")
    args = ap.parse_args()
    outf = open(args.out, "a") if args.out else None

    def emit(obj):
        line = json.dumps(obj)
        print(line, flush=True)
        if outf:
            outf.write(line + "\n")
            outf.flush()

    _guard_device_init()
    cases = [c for c in CASES
             if args.tasks is None or f"{c[0]}/{c[1]}" in args.tasks]
    for task_name, robot, batch, steps in cases:
        if args.quick:
            batch, steps = batch // 2, max(steps // 2, 5)
        try:
            sps = bench_one(task_name, robot, batch, steps)
            emit({"env": f"{task_name}/{robot}", "envs": batch,
                  "steps_per_s": round(sps, 1)})
        except Exception as e:  # keep the table going past one bad case
            emit({"env": f"{task_name}/{robot}", "envs": batch,
                  "error": repr(e)[:200]})
            # dressing's Pallas cloth kernel has never run on real silicon:
            # if it faults (VMEM/lowering), re-bench once on the XLA path so
            # the round still records a dressing number
            if (task_name == "dressing"
                    and os.environ.get("AGT_CLOTH_KERNEL") != "0"):
                os.environ["AGT_CLOTH_KERNEL"] = "0"
                try:
                    sps = bench_one(task_name, robot, batch, steps)
                    emit({"env": f"{task_name}/{robot}", "envs": batch,
                          "path": "xla", "steps_per_s": round(sps, 1)})
                except Exception as e2:
                    emit({"env": f"{task_name}/{robot}", "envs": batch,
                          "path": "xla", "error": repr(e2)[:200]})
                finally:
                    del os.environ["AGT_CLOTH_KERNEL"]


if __name__ == "__main__":
    main()
