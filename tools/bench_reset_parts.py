"""Where does the 27 s bed-task batched reset go? (settle vs IK vs rest)

The round-5 settle A/B (docs/bench/reset_bench_r5.jsonl) showed the PCG
solver swap moves bed reset only 1.12x — the round-4 "settle is 85% of
update wall time" model is wrong somewhere.  This ablates the two reset
monsters by MONKEYPATCHING them out before tracing (no package changes):

    full        vmap(reset) as shipped           (known: ~27 s bed @4096)
    no_settle   base.settle_human -> identity
    no_ik       ik.position_robot_toc -> defaults, ik_random_restarts -> q0
    neither     both stubbed

Prints one JSON line per variant; differences attribute the time.

    python tools/bench_reset_parts.py --env BedBathingJaco-v0 --batch 4096
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def time_reset(task, batch, reps):
    reset = jax.jit(lambda keys: jax.vmap(task.reset)(keys))
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    state, obs = reset(keys)            # compile + warm
    jax.block_until_ready(obs)
    t0 = time.time()
    for i in range(1, reps + 1):
        keys = jax.random.split(jax.random.PRNGKey(i), batch)
        state, obs = reset(keys)        # fresh keys: tunnel memoises repeats
    jax.block_until_ready(obs)
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--env", default="BedBathingJaco-v0")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--variants", nargs="+",
                    default=["no_settle", "no_ik", "neither"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from assistive_gym_tpu.registry import load
    from assistive_gym_tpu.envs import base
    from assistive_gym_tpu.ops import ik as ik_mod

    real_settle = base.settle_human
    real_toc = ik_mod.position_robot_toc
    real_rr = ik_mod.ik_random_restarts

    def stub_settle(spec, state, sim_dofs, n_steps, dt, gravity=(0, 0, -1.0)):
        return state.human_q, jnp.zeros_like(state.human_qd)

    def stub_toc(key, robot, arms, start_goals, extra_goals, q_base,
                 base_quat_center, pos_offset, attempts=100, ik_iters=30,
                 random_position=0.0, **kw):
        base_pos = jnp.asarray([pos_offset[0], pos_offset[1], 0.0], jnp.float32)
        base_quat = jnp.asarray([0, 0, 0, 1], jnp.float32)
        return base_pos, base_quat, q_base

    def stub_rr(key, robot, ee, target_pos, target_quat, q0, arm_dofs,
                base_pos, base_quat, lo, hi, **kw):
        class R:  # matches ik_random_restarts result fields used by tasks
            pass
        r = R()
        r.q = q0
        r.pos_err = jnp.zeros((), jnp.float32)
        r.success = jnp.ones((), bool)
        return r

    fout = open(args.out, "a") if args.out else None
    for name in args.variants:
        base.settle_human = stub_settle if "settle" in name or name == "neither" else real_settle
        ik_mod.position_robot_toc = stub_toc if "ik" in name or name == "neither" else real_toc
        ik_mod.ik_random_restarts = stub_rr if "ik" in name or name == "neither" else real_rr
        try:
            task = load(args.env)   # fresh build so the stubs are traced
            dt = time_reset(task, args.batch, args.reps)
            rec = {"env": args.env, "variant": name, "batch": args.batch,
                   "reset_ms": round(dt * 1e3, 1),
                   "resets_per_s": round(args.batch / dt, 1)}
        except Exception as e:
            rec = {"env": args.env, "variant": name, "error": repr(e)[:200]}
        finally:
            base.settle_human = real_settle
            ik_mod.position_robot_toc = real_toc
            ik_mod.ik_random_restarts = real_rr
        print(json.dumps(rec), flush=True)
        if fout:
            fout.write(json.dumps(rec) + "\n")
            fout.flush()
    if fout:
        fout.close()


if __name__ == "__main__":
    main()
