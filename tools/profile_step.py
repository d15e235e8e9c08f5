"""Per-component timing of the hot step on the current backend.

Times: full step, FK-only, contacts-only, dynamics-substep-only, particles,
at the bench batch size — so optimization is data-driven.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from assistive_gym_tpu.envs import build_task
from assistive_gym_tpu.envs import base as eb
from assistive_gym_tpu.physics import kinematics as kin, dynamics as dyn

B = 4096
N = 20


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(N):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / N
    print(f"{name:34s} {dt * 1e3:8.2f} ms   ({B / dt:,.0f}/s)")
    return out


def main():
    task = build_task("feeding", "jaco", False)
    spec = task.spec
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    state, obs = jax.jit(jax.vmap(task.reset))(keys)
    jax.block_until_ready(obs)
    actions = jnp.zeros((B, spec.action_len), jnp.float32)

    step = jax.jit(jax.vmap(task.step))
    timeit("full step (frame_skip=%d)" % spec.frame_skip, step, state, actions)

    fk_h = jax.jit(jax.vmap(lambda s: kin.fk(spec.human, s.human_q, s.human_base_pos,
                                             s.human_base_quat,
                                             origin_xyz=s.human["origin_xyz"])))
    timeit("fk human (41 links)", fk_h, state)
    fk_r = jax.jit(jax.vmap(lambda s: kin.fk(spec.robot, s.robot_q, s.robot_base_pos,
                                             s.robot_base_quat)))
    timeit("fk robot", fk_r, state)

    def contacts(s):
        fh, fr = eb.scene_fk(spec, s)
        return eb.scene_contacts(spec, s, fh, fr)
    timeit("fk x2 + contacts (%d pairs)" % spec.pairs.npairs,
           jax.jit(jax.vmap(contacts)), state)

    def dyn_r(s):
        fr = kin.fk(spec.robot, s.robot_q, s.robot_base_pos, s.robot_base_quat)
        res = dyn.substep(spec.robot, s.robot_q, s.robot_qd, spec.time_step,
                          jnp.asarray(spec.gravity_robot, jnp.float32),
                          fk_res=fr, sim_dofs=tuple(sorted(set(spec.arm_dofs))))
        return res.q
    timeit("robot dynamics substep (7 dof)", jax.jit(jax.vmap(dyn_r)), state)

    def dyn_h(s):
        fh = kin.fk(spec.human, s.human_q, s.human_base_pos, s.human_base_quat,
                    origin_xyz=s.human["origin_xyz"])
        res = dyn.substep(spec.human, s.human_q, s.human_qd, spec.time_step,
                          jnp.asarray(spec.gravity_human, jnp.float32),
                          fk_res=fh, inertial=eb._human_inertial(s),
                          sim_dofs=spec.human_controllable)
        return res.q
    timeit("human dynamics substep (%d dof)" % len(spec.human_controllable),
           jax.jit(jax.vmap(dyn_h)), state)

    if hasattr(task, "particle_substep") or "food_pos" in state.aux:
        print("aux keys:", list(state.aux.keys()))


if __name__ == "__main__":
    main()
