"""HumanTesting debug env: sweeps human arm joints under the learned limits.

Functional re-design of reference envs/human_testing.py:9-58 — the reference
runs an infinite GUI loop sweeping joints 4,5,6 and enforcing the realistic
arm-limit classifier (:16-35); here each step() applies one sweep increment
and the rollback, so the env is a finite, jittable probe of the same logic.
No robot, no furniture (create_new_world(furniture_type=None), :43).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..models import human as hm
from ..ops import arm_limits
from ..physics import kinematics as kin

f32 = jnp.float32
SWEEP_DELTAS = np.zeros(10, np.float32)
SWEEP_DELTAS[4], SWEEP_DELTAS[5], SWEEP_DELTAS[6] = 0.01, 0.01, -0.01


@struct.dataclass
class HTState:
    key: jax.Array
    human_q: jax.Array
    prev_valid_right: jax.Array
    lower: jax.Array
    upper: jax.Array
    origin_xyz: jax.Array


class _Spec:
    action_robot_len = 1
    action_human_len = 0
    obs_robot_len = 41
    obs_human_len = 0
    action_len = 1
    obs_len = 41


def build():
    return HumanTestingTask()


class HumanTestingTask:
    """Batched probe env; obs = the full human dof vector."""

    spec = _Spec()

    def __init__(self):
        self.model, _, self.dims_m = hm.build_human("male", 1.0)
        self.model_f, _, self.dims_f = hm.build_human("female", 1.0)

    def reset(self, key: jax.Array) -> Tuple[HTState, jax.Array]:
        key, km = jax.random.split(key)
        is_male = jax.random.bernoulli(km, 0.5)
        dl = self.model.dof_links
        lower = jnp.where(is_male, jnp.asarray(self.model.lower[dl]),
                          jnp.asarray(self.model_f.lower[dl]))
        upper = jnp.where(is_male, jnp.asarray(self.model.upper[dl]),
                          jnp.asarray(self.model_f.upper[dl]))
        ox = jnp.where(is_male, jnp.asarray(self.model.origin_xyz),
                       jnp.asarray(self.model_f.origin_xyz))
        # creation-time limit clamp (human_creation.py:286-299)
        hq = jnp.clip(jnp.zeros(self.model.ndof, f32), lower, upper)
        state = HTState(key=key, human_q=hq,
                        prev_valid_right=jnp.zeros(5, f32),
                        lower=lower, upper=upper, origin_xyz=ox)
        return state, hq

    def step(self, state: HTState, action: jax.Array):
        """One sweep increment over arm joints 0-9 (human_testing.py:22-31)
        + realistic-limit rollback (:34)."""
        hq = state.human_q
        idx = np.arange(10)
        new = hq[idx] + jnp.asarray(SWEEP_DELTAS)
        ok = (new > state.lower[idx]) & (new < state.upper[idx])
        hq = hq.at[idx].set(jnp.where(ok, new, hq[idx]))
        hq, _, pvr = arm_limits.enforce_realistic_limits(
            hq, jnp.zeros_like(hq), state.prev_valid_right, (3, 4, 5, 6), right=True)
        state = state.replace(human_q=hq, prev_valid_right=pvr)
        return state, hq, jnp.zeros((), f32), jnp.zeros((), bool), dict(
            total_force_on_human=jnp.zeros((), f32),
            task_success=jnp.zeros((), f32),
            action_robot_len=jnp.asarray(1), action_human_len=jnp.asarray(0),
            obs_robot_len=jnp.asarray(41), obs_human_len=jnp.asarray(0))
