"""Env viewer CLI — parity with the reference env_viewer.py:1-24.

The reference opens a PyBullet GUI and steps random actions; there is no GUI
server in the TPU stack (SURVEY.md §2.2 N8), so this viewer runs the same
random-action loop through the gym adapter and either prints a live text
summary or dumps the full trajectory (joint states + link frames) to .npz
for offline replay in any visualiser.

    python env_viewer.py --env ScratchItchJaco-v0
    python env_viewer.py --env FeedingPR2-v0 --episodes 2 --dump traj.npz

With --ckpt-dir the viewer rolls out a trained policy (deterministic mean
action) instead of random actions — the reference's "Running Pretrained
Policies" flow (README.md:45-46; its weights/wiki are external, ours live
in ckpts/ with eval tables in docs/training/):

    python env_viewer.py --env FeedingJaco-v0 --ckpt-dir ckpts/feeding_r4
    python env_viewer.py --env FeedingJacoHuman-v0 --ckpt-dir ckpts/coop_feeding_r4 --coop
"""
from __future__ import annotations

import argparse

import numpy as np

from assistive_gym_tpu.registry import ENV_IDS, load
from assistive_gym_tpu.envs.gym_api import GymEnv

parser = argparse.ArgumentParser(description="Assistive Gym TPU viewer")
parser.add_argument("--env", default="ScratchItchJaco-v0", choices=sorted(ENV_IDS),
                    help="Environment to test")
parser.add_argument("--episodes", type=int, default=1)
parser.add_argument("--dump", default=None, help="write trajectory .npz here")
parser.add_argument("--ckpt-dir", default=None,
                    help="roll out a trained policy from this checkpoint dir "
                         "(mean action) instead of random actions")
parser.add_argument("--coop", action="store_true",
                    help="checkpoint is a dual-policy coop run (*Human-v0)")
args = parser.parse_args()

env = GymEnv(load(args.env))


def make_policy(task):
    """Deterministic policy fn obs->action from a training checkpoint."""
    import jax
    import jax.numpy as jnp
    from assistive_gym_tpu.parallel import checkpoint, ppo

    cfg = ppo.PPOConfig(num_envs=2, rollout_len=2)
    if args.coop:
        from assistive_gym_tpu.parallel import coop
        (or0, or1), (oh0, oh1), (ar0, ar1), (ah0, ah1) = coop._slices(task)
        net_r = ppo.ActorCritic(ar1 - ar0, cfg.hidden)
        net_h = ppo.ActorCritic(ah1 - ah0, cfg.hidden)
        ts_template, _ = coop.init(task, cfg, jax.random.PRNGKey(0))
    else:
        net = ppo.ActorCritic(task.spec.action_len, cfg.hidden)
        ts_template, _ = ppo.init(task, cfg, jax.random.PRNGKey(0))
    step_i, ts = checkpoint.restore_train_state(args.ckpt_dir, ts_template)
    print(f"loaded policy {args.ckpt_dir} @ update {step_i}")

    @jax.jit
    def act(obs):
        nobs = ts.obs_rms.normalize(obs) if ts.obs_rms is not None else obs
        if args.coop:
            mr, _, _ = net_r.apply(ts.robot.params, nobs[or0:or1])
            mh, _, _ = net_h.apply(ts.human.params, nobs[oh0:oh1])
            return jnp.concatenate([mr, mh], -1)
        mean, _, _ = net.apply(ts.params, nobs)
        return mean

    return lambda obs: np.asarray(act(jnp.asarray(obs)))


policy = make_policy(env.task) if args.ckpt_dir else None


def world_segments(task, state):
    """World-space capsule segments [G,3]x2 + radii for offline rendering."""
    import jax
    from assistive_gym_tpu.envs import base as eb
    from assistive_gym_tpu.physics import contact as con

    spec = task.spec
    fk_h, fk_r = jax.jit(lambda s: eb.scene_fk(spec, s))(state)
    import jax.numpy as jnp
    wg = con.world_geoms(spec.geoms,
                         jnp.concatenate([fk_h.pos, fk_r.pos], 0),
                         jnp.concatenate([fk_h.quat, fk_r.quat], 0),
                         p0=state.geom_p0, p1=state.geom_p1)
    return (np.asarray(wg.w0), np.asarray(wg.w1),
            np.asarray(state.geom_radius))


traj = {"seg_a": [], "seg_b": [], "reward": []}
radius = None
for ep in range(args.episodes):
    obs = env.reset()
    done = False
    ep_reward, steps = 0.0, 0
    while not done:
        action = policy(obs) if policy is not None else env.action_space.sample()
        obs, reward, done, info = env.step(action)
        ep_reward += reward
        steps += 1
        if args.dump:
            state = env.render()
            a, b, radius = world_segments(env.task, state)
            traj["seg_a"].append(a)
            traj["seg_b"].append(b)
            traj["reward"].append(reward)
        if steps % 50 == 0:
            print(f"  step {steps}: reward={reward:.3f} "
                  f"success={float(info.get('task_success', 0)):.0f} "
                  f"force_on_human={float(info.get('total_force_on_human', 0)):.1f}")
    print(f"episode {ep}: return={ep_reward:.2f} steps={steps}")

if args.dump:
    np.savez(args.dump, seg_a=np.asarray(traj["seg_a"]),
             seg_b=np.asarray(traj["seg_b"]),
             radius=radius, reward=np.asarray(traj["reward"]),
             env=args.env)
    print(f"trajectory written to {args.dump} "
          f"(render with tools/render_traj.py)")
