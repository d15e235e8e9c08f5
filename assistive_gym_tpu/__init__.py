"""assistive_gym_tpu: a TPU-native assistive-robotics environment engine.

A from-scratch JAX/XLA re-design of the capability surface of Assistive Gym
v0.100 (reference: gangulylab/assistive-gym): 6 physical human-robot
interaction tasks x 4+1 robots x {robot, robot+human} co-control, backed by a
batched pure-JAX articulated rigid-body simulator instead of per-process
PyBullet servers.

Public API:
    env = assistive_gym_tpu.make('ScratchItchJaco-v0')   # gym-style adapter
    obs = env.reset(); obs, r, done, info = env.step(a)

    # TPU-native batched API (the real interface):
    task = assistive_gym_tpu.load('ScratchItchJaco-v0')
    state, obs = jax.vmap(task.reset)(keys)
    state, obs, rew, done, info = jax.vmap(task.step)(state, actions)
"""
__version__ = "0.1.0"

import os as _os

# Some TPU platform plugins (e.g. the axon tunnel) override the standard
# JAX_PLATFORMS environment variable and grab the device regardless.  A
# "CPU" run that silently lands on the one shared TPU chip corrupts or
# crashes whatever is training there, so re-honor the user's explicit
# choice through jax.config before any backend initializes.
if "JAX_PLATFORMS" in _os.environ:
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

from .registry import ENV_IDS, load, make  # noqa: F401
