"""Evaluate a trained PPO checkpoint: deterministic (mean-action) episodes.

    JAX_PLATFORMS=cpu python tools/eval_policy.py \
        --env FeedingJaco-v0 --ckpt-dir ckpts/feeding_r2 --episodes 256

Reports mean/std return, task success rate, and mean total force on the
human — the quantities the reference paper reports per policy
(arXiv:1910.04700 §VI; reference repo ships no eval script or weights,
README.md:45-46).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import assistive_gym_tpu  # noqa: F401  (applies JAX_PLATFORMS)
import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--env", default="FeedingJaco-v0")
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--episodes", type=int, default=256)
    ap.add_argument("--horizon", type=int, default=200)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--stochastic", action="store_true",
                    help="sample actions instead of using the mean")
    ap.add_argument("--coop", action="store_true",
                    help="checkpoint is a dual-policy coop run (*Human-v0)")
    args = ap.parse_args()

    from assistive_gym_tpu.registry import load
    from assistive_gym_tpu.parallel import checkpoint, ppo

    task = load(args.env)
    cfg = ppo.PPOConfig(num_envs=args.episodes, rollout_len=args.horizon)

    if args.coop:
        from assistive_gym_tpu.parallel import coop
        (or0, or1), (oh0, oh1), (ar0, ar1), (ah0, ah1) = coop._slices(task)
        net_r = ppo.ActorCritic(ar1 - ar0, cfg.hidden)
        net_h = ppo.ActorCritic(ah1 - ah0, cfg.hidden)
        ts_template, _ = coop.init(task, ppo.PPOConfig(num_envs=2, rollout_len=2),
                                   jax.random.PRNGKey(0))
    else:
        net = ppo.ActorCritic(task.spec.action_len, cfg.hidden)
        ts_template, _ = ppo.init(task, ppo.PPOConfig(num_envs=2, rollout_len=2),
                                  jax.random.PRNGKey(0))
    step_i, ts = checkpoint.restore_train_state(args.ckpt_dir, ts_template,
                                                args.step)
    print(f"loaded {args.ckpt_dir} @ update {step_i}")

    env_step = (task.step_batched if hasattr(task, "step_batched")
                else jax.vmap(task.step))

    def policy(obs, key):
        nobs = ts.obs_rms.normalize(obs) if ts.obs_rms is not None else obs
        if args.coop:
            mr, sr, _ = jax.vmap(lambda o: net_r.apply(
                ts.robot.params, o))(nobs[:, or0:or1])
            mh, sh, _ = jax.vmap(lambda o: net_h.apply(
                ts.human.params, o))(nobs[:, oh0:oh1])
            mean = jnp.concatenate([mr, mh], -1)
            log_std = jnp.concatenate([sr, sh], -1)
        else:
            mean, log_std, _ = jax.vmap(lambda o: net.apply(ts.params, o))(nobs)
        if args.stochastic:
            return mean + jax.random.normal(key, mean.shape) * jnp.exp(log_std)
        return mean

    @jax.jit
    def rollout(key):
        k_env, k_act = jax.random.split(key)
        keys = jax.random.split(k_env, args.episodes)
        state, obs = jax.vmap(task.reset)(keys)

        def body(carry, _):
            state, obs, key = carry
            key, k = jax.random.split(key)
            a = policy(obs, k)
            state, obs, rew, done, info = env_step(state, a)
            return (state, obs, key), dict(
                reward=rew, success=info["task_success"],
                force=info["total_force_on_human"])

        (_, _, _), traj = jax.lax.scan(body, (state, obs, k_act), None,
                                       length=args.horizon)
        return traj

    traj = rollout(jax.random.PRNGKey(args.seed))
    returns = np.asarray(traj["reward"]).sum(0)
    success = np.asarray(traj["success"])[-1]
    force = np.asarray(traj["force"]).mean()
    print(f"episodes={args.episodes} horizon={args.horizon} "
          f"deterministic={not args.stochastic}")
    print(f"return: mean={returns.mean():.2f} std={returns.std():.2f} "
          f"min={returns.min():.2f} max={returns.max():.2f}")
    print(f"task success rate: {success.mean():.3f}")
    print(f"mean total force on human: {force:.2f} N")


if __name__ == "__main__":
    main()
