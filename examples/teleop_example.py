"""End-effector teleoperation — parity with reference examples/teleop_example.py:1-33.

The reference maps keyboard events to Cartesian end-effector deltas and
drives the arm with IK velocity targets.  Here the same loop runs through
the batched DLS-IK solver (ops/ik.py): each command nudges the tool-tip
target and one IK solve produces the joint-space action.

Interactive:  python examples/teleop_example.py        (w/s a/d q/e keys, x quits)
Scripted:     echo "wwwaassdd x" | python examples/teleop_example.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from assistive_gym_tpu.registry import load
from assistive_gym_tpu.envs.gym_api import GymEnv
from assistive_gym_tpu.ops import ik
from assistive_gym_tpu.physics import kinematics as kin

KEYS = {"w": (0.01, 0, 0), "s": (-0.01, 0, 0),
        "a": (0, 0.01, 0), "d": (0, -0.01, 0),
        "q": (0, 0, 0.01), "e": (0, 0, -0.01)}

env = GymEnv(load("ScratchItchJaco-v0"))
env.reset()
task = env.task
spec = task.spec
arm = np.asarray(spec.arm_dofs)

print("teleop: w/s=+-x a/d=+-y q/e=+-z, x=quit")
commands = iter("".join(sys.stdin.read().split())) if not sys.stdin.isatty() else None

state = env._state
done = False
while not done:
    key = next(commands, "x") if commands is not None else input("> ")[:1]
    if key == "x":
        break
    delta = KEYS.get(key)
    if delta is None:
        continue
    fk_r = kin.fk(spec.robot, state.robot_q, state.robot_base_pos,
                  state.robot_base_quat)
    target = fk_r.pos[spec.tool_tip_link] + jnp.asarray(delta, jnp.float32)
    lo, hi = spec.robot.dof_limits()
    res = ik.dls_ik(spec.robot, spec.tool_tip_link, target, None,
                    state.robot_q, spec.arm_dofs,
                    state.robot_base_pos, state.robot_base_quat,
                    jnp.asarray(lo)[arm], jnp.asarray(hi)[arm], iters=10)
    # joint-space action = desired dq, rescaled to the [-1,1]*0.05 convention
    dq = (res.q - state.robot_q)[arm]
    action = np.zeros(spec.action_len, np.float32)
    action[: len(arm)] = np.clip(np.asarray(dq) / 0.05, -1, 1)
    obs, reward, done, info = env.step(action)
    state = env._state
    print(f"reward={reward:.3f} tip_err={float(res.pos_err):.4f}")
