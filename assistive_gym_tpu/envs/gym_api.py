"""Gym-style single-env adapter over the batched functional core.

API parity with the reference's gym.Env surface (env.py:14-80): reset() ->
obs, step(action) -> (obs, reward, done, info), seed(), render().  Internally
one jitted reset/step pair drives a single-env instance; `done` is raised by
the adapter at max_episode_steps like the reference's gym TimeLimit wrapper
(assistive_gym/__init__.py:7 max_episode_steps=200).

This adapter exists for drop-in compatibility and debugging; production code
should use the batched `load(env_id)` API and vmap/shard_map directly.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


class Box:
    """Minimal gym.spaces.Box stand-in (avoids a hard gym dependency)."""

    def __init__(self, low, high, dtype=np.float32):
        self.low = np.asarray(low, dtype)
        self.high = np.asarray(high, dtype)
        self.shape = self.low.shape
        self.dtype = dtype

    def sample(self, rng=None):
        rng = rng or np.random
        return rng.uniform(self.low, self.high).astype(self.dtype)


class GymEnv:
    def __init__(self, task, seed: int = 1001, max_episode_steps: int = 200):
        self.task = task
        self.spec_ = task.spec
        self.max_episode_steps = max_episode_steps
        n_act = self.spec_.action_len
        n_obs = self.spec_.obs_len
        self.action_space = Box([-1.0] * n_act, [1.0] * n_act)
        self.observation_space = Box([-1.0] * n_obs, [1.0] * n_obs)
        self._reset_fn = jax.jit(task.reset)
        self._step_fn = jax.jit(task.step)
        self._state = None
        self._steps = 0
        self.seed(seed)

    def seed(self, seed=None):
        self._key = jax.random.PRNGKey(1001 if seed is None else seed)
        return [seed]

    def reset(self):
        self._key, k = jax.random.split(self._key)
        self._state, obs = self._reset_fn(k)
        self._steps = 0
        return np.asarray(obs)

    def step(self, action):
        action = jnp.asarray(action, jnp.float32)
        self._state, obs, reward, done, info = self._step_fn(self._state, action)
        self._steps += 1
        done = bool(done) or self._steps >= self.max_episode_steps
        info = {k: np.asarray(v) for k, v in info.items()}
        return np.asarray(obs), float(reward), done, info

    def render(self, mode="human"):
        # No GUI server: trajectories can be dumped for offline replay
        # (SURVEY.md §2.2 N8). Returns the current state for visualisers.
        return self._state

    def close(self):
        pass
