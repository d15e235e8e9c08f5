"""Random-action rollout — parity with reference examples/random_actions.py:1-10."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from assistive_gym_tpu.registry import load
from assistive_gym_tpu.envs.gym_api import GymEnv

env = GymEnv(load("FeedingJaco-v0"))
observation = env.reset()
done = False
while not done:
    observation, reward, done, info = env.step(env.action_space.sample())
    print("reward:", round(reward, 3), "task success:",
          int(info["task_success"]))
