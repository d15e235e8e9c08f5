"""Instrumented FeedingJaco eval: WHY do episodes fail?

For each eval episode (deterministic policy) records:
  - delivered food count (task_success counter, 0..8)
  - spilled count (8 - delivered - alive_at_end)
  - alive-at-end count (food still on/near the spoon, never delivered)
  - min over the episode of ||tip - mouth|| and ||base - mouth||
  - first step at which any food was delivered

Usage:  python tools/diag_eval_feeding.py --ckpt-dir ckpts/feeding_r2b
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import assistive_gym_tpu  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--episodes", type=int, default=256)
    ap.add_argument("--horizon", type=int, default=200)
    ap.add_argument("--seed", type=int, default=123)
    args = ap.parse_args()

    from assistive_gym_tpu.registry import load
    from assistive_gym_tpu.parallel import checkpoint, ppo
    from assistive_gym_tpu.envs import base

    task = load("FeedingJaco-v0")
    spec = task.spec
    net = ppo.ActorCritic(task.spec.action_len, ppo.PPOConfig().hidden)
    ts_template, _ = ppo.init(task, ppo.PPOConfig(num_envs=2, rollout_len=2),
                              jax.random.PRNGKey(0))
    step_i, ts = checkpoint.restore_train_state(args.ckpt_dir, ts_template,
                                                args.step)
    print(f"loaded {args.ckpt_dir} @ update {step_i}")

    env_step = task.step_batched

    def policy(obs):
        nobs = ts.obs_rms.normalize(obs) if ts.obs_rms is not None else obs
        mean, _, _ = jax.vmap(lambda o: net.apply(ts.params, o))(nobs)
        return mean

    def dists(state):
        def one(s):
            fk_h, fk_r = base.scene_fk(spec, s)
            mouth = base.transform_point_on_link(fk_h, 23, s.human["mouth_pos"])
            tip = fk_r.pos[spec.tool_tip_link]
            b = fk_r.pos[spec.tool_base_link]
            return (jnp.linalg.norm(tip - mouth), jnp.linalg.norm(b - mouth))
        return jax.vmap(one)(state)

    @jax.jit
    def rollout(key):
        keys = jax.random.split(key, args.episodes)
        state, obs = jax.vmap(task.reset)(keys)

        def body(carry, t):
            state, obs, mind_tip, mind_base, first_del = carry
            a = policy(obs)
            state, obs, rew, done, info = env_step(state, a)
            dt_, db_ = dists(state)
            mind_tip = jnp.minimum(mind_tip, dt_)
            mind_base = jnp.minimum(mind_base, db_)
            delivered = state.task_success > 0
            first_del = jnp.where((first_del < 0) & delivered, t, first_del)
            return (state, obs, mind_tip, mind_base, first_del), dict(
                reward=rew, success=info["task_success"])

        B = args.episodes
        init = (state, obs, jnp.full(B, 1e9), jnp.full(B, 1e9),
                jnp.full(B, -1, jnp.int32))
        (state, _, mind_tip, mind_base, first_del), traj = jax.lax.scan(
            body, init, jnp.arange(args.horizon))
        return dict(
            delivered=state.task_success,
            alive=state.aux["food_alive"].sum(-1),
            hit=state.aux["food_hit"].sum(-1),
            mind_tip=mind_tip, mind_base=mind_base, first_del=first_del,
            returns=traj["reward"].sum(0), success=traj["success"][-1])

    r = {k: np.asarray(v) for k, v in rollout(jax.random.PRNGKey(args.seed)).items()}
    delivered = r["delivered"].astype(int)
    alive = r["alive"].astype(int)
    spilled = 8 - delivered - alive
    succ = r["success"] > 0.5
    print(f"episodes={args.episodes}  success={succ.mean():.3f}  "
          f"return mean={r['returns'].mean():.1f}")
    print("delivered histogram (0..8):", np.bincount(delivered, minlength=9))
    for name, mask in [("SUCCESS", succ), ("FAIL", ~succ)]:
        if mask.sum() == 0:
            continue
        print(f"--- {name} (n={mask.sum()}) ---")
        print(f"  delivered {delivered[mask].mean():.2f}  "
              f"spilled {spilled[mask].mean():.2f}  "
              f"alive@end {alive[mask].mean():.2f}  hit {r['hit'][mask].mean():.2f}")
        print(f"  min d(tip,mouth)  mean {r['mind_tip'][mask].mean():.3f}  "
              f"p50 {np.median(r['mind_tip'][mask]):.3f}  "
              f"p90 {np.percentile(r['mind_tip'][mask], 90):.3f}")
        print(f"  min d(base,mouth) mean {r['mind_base'][mask].mean():.3f}  "
              f"p50 {np.median(r['mind_base'][mask]):.3f}")
        fd = r["first_del"][mask]
        print(f"  first delivery step: {np.median(fd[fd >= 0]) if (fd >= 0).any() else 'never'}"
              f"  (never in {(fd < 0).mean() * 100:.0f}% of these)")


if __name__ == "__main__":
    main()
