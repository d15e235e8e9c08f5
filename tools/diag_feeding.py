"""Diagnostic probe for FeedingJaco: scripted DLS servo toward the mouth.

Measures whether food is physically deliverable into the 2 cm mouth sphere
(VERDICT round-1 ask #1): runs a greedy IK policy and reports per-step
spoon/food/mouth distances, spill counts, and accumulated task_success.
"""
import argparse
import math

import jax
import jax.numpy as jnp
import numpy as np

from assistive_gym_tpu.envs import feeding
from assistive_gym_tpu.envs import base
from assistive_gym_tpu.physics import kinematics as kin
from assistive_gym_tpu.ops import math3d as m3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--carry-link", choices=["base", "tip"], default="tip",
                    help="which tool frame the servo drives to the mouth")
    args = ap.parse_args()

    task = feeding.build("jaco", False)
    spec = task.spec
    arm = np.asarray(spec.arm_dofs)

    @jax.jit
    def scripted_action(state):
        fk_h, fk_r = base.scene_fk(spec, state)
        mouth = base.transform_point_on_link(fk_h, 23, state.human["mouth_pos"])
        link = spec.tool_tip_link if args.carry_link == "tip" else spec.tool_base_link
        carry = fk_r.pos[link]
        J = kin.point_jacobian(spec.robot, fk_r, link, carry)[:3][:, arm]
        err = mouth - carry
        # damped least squares on the 3x7 position jacobian
        JJt = J @ J.T + 1e-4 * jnp.eye(3)
        dq = J.T @ jnp.linalg.solve(JJt, err)
        return jnp.clip(dq / 0.05, -1.0, 1.0)

    step = jax.jit(task.step)
    state, obs = jax.jit(task.reset)(jax.random.PRNGKey(args.seed))

    for t in range(args.steps):
        a = scripted_action(state)
        state, obs, reward, done, info = step(state, a)
        if t % 10 == 0 or t == args.steps - 1:
            fk_h, fk_r = base.scene_fk(spec, state)
            mouth = base.transform_point_on_link(fk_h, 23, state.human["mouth_pos"])
            sb = fk_r.pos[spec.tool_base_link]
            tip = fk_r.pos[spec.tool_tip_link]
            pos = state.aux["food_pos"]
            alive = state.aux["food_alive"]
            dm = jnp.linalg.norm(pos - mouth[None], axis=-1)
            dmin = jnp.where(alive, dm, jnp.inf).min()
            print(f"t={t:3d} d(base,mouth)={jnp.linalg.norm(sb-mouth):.3f} "
                  f"d(tip,mouth)={jnp.linalg.norm(tip-mouth):.3f} "
                  f"min_d(food,mouth)={dmin:.3f} alive={int(alive.sum())} "
                  f"success={float(state.task_success):.0f} r={float(reward):.2f}")

    print(f"\nFINAL success={float(state.task_success):.0f}/8 "
          f"info_success={float(info['task_success']):.0f}")


if __name__ == "__main__":
    main()
