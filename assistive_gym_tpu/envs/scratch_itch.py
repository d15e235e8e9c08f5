"""ScratchItch task: 7-DoF tool-to-itch scratching on a seated human.

Functional re-design of reference envs/scratch_itch.py:8-168.  Reward, obs
layout (30 robot / +34 human), contact-force semantics, target sampling on
the arm capsule and reset randomisation follow the reference line-for-line;
the mechanics run in the batched JAX engine (envs/base.py).
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as cfgmod
from ..models import furniture as furn_mod
from ..models import human as hm
from ..models import robots as robots_mod
from ..ops import geometry as geo
from ..ops import ik as ik_mod
from ..ops import math3d as m3
from ..physics import contact as con
from ..physics import kinematics as kin
from . import base
from .base import EnvState, SceneSpec, f32

CONTROLLABLE = tuple(range(10))   # right arm joints (scratch_itch.py:103)
JOINTS_POSITIONS = ((3, 30.0), (6, -90.0), (16, -90.0), (28, -90.0),
                    (31, 80.0), (35, -90.0), (38, 80.0))  # scratch_itch.py:102


def build(robot_name: str, human_control: bool) -> "ScratchItchTask":
    task = "scratch_itch"
    cfg = cfgmod.TASK_CONFIGS[task]
    robot, tool_base, tool_tip, info = base.compose_robot_with_tool(task, robot_name, left=True)
    human_model, human_geoms, _ = hm.build_human("male", 1.0)
    Lh = human_model.nlinks

    # ---- scene geometry: human + robot-arm capsules + tool ----
    geoms = list(human_geoms)                       # links already human-local
    n_human_geoms = len(geoms)
    rg = robots_mod.robot_capsules(robot, info.collision_links, info.capsule_radius)
    tg = robots_mod.tool_geoms(task, tool_base)
    for g in rg + tg:
        g = dict(g)
        g["link"] = g["link"] + Lh                  # global link ids
        geoms.append(g)

    n_rg = len(rg)
    tool_geom_ids = list(range(n_human_geoms + n_rg, len(geoms)))
    robot_geom_ids = list(range(n_human_geoms, n_human_geoms + n_rg))
    human_geom_ids = list(range(n_human_geoms))

    # wheelchair rigid collision (VERDICT #3; world_creation.py:35-43)
    furn = furn_mod.wheelchair_geoms()
    furn_ids = list(range(len(geoms), len(geoms) + len(furn)))
    geoms += furn
    gs = con.GeomSet.build(geoms)

    GROUP_TOOL_HUMAN, GROUP_ROBOT_HUMAN, G_SCENE, G_SELF = 0, 1, 2, 3
    pairs = []
    at_target_mask = []
    for tgi_local, tgi in enumerate(tool_geom_ids):
        for hgi in human_geom_ids:
            pairs.append(dict(a=tgi, b=hgi, kind=0, group=GROUP_TOOL_HUMAN,
                              friction=0.5))
            # reference counts target force on tool links 0,1 = cylinder+tip
            # (scratch_itch.py:55); our tool geoms: 0 handle, 1 cyl, 2 tip
            at_target_mask.append(tgi_local in (1, 2))
    for rgi in robot_geom_ids:
        for hgi in human_geom_ids:
            pairs.append(dict(a=rgi, b=hgi, kind=0, group=GROUP_ROBOT_HUMAN,
                              friction=0.5))
            at_target_mask.append(False)
    q0 = np.asarray(base.default_robot_q(robot, info, task, robot_name))
    if robot_name == "jaco":
        jb = dict(base_pos=(-0.35, -0.27, 0.36),
                  base_quat=tuple(np.asarray(m3.quat_from_euler(
                      jnp.asarray([0, 0, -math.pi / 2], f32))).tolist()))
        pairs += base.furniture_pairs(
            geoms, tool_geom_ids + robot_geom_ids, furn_ids, G_SCENE,
            robot=robot, default_q=q0, n_human_links=Lh, **jb)
    else:
        pairs += base.furniture_pairs(
            geoms, tool_geom_ids + robot_geom_ids, furn_ids, G_SCENE)
    pairs += robots_mod.self_collision_pairs(
        robot, rg, robot_geom_ids, q0, G_SELF)
    self_check = robots_mod.make_self_check(robot, rg, q0)
    at_target_mask += [False] * (len(pairs) - len(at_target_mask))
    pt = con.PairTable.build(pairs, ngroups=4)
    at_target_mask = pt.reindex(at_target_mask)   # table is kind-sorted
    pt = con.tuned_pairs(gs, pt, np.concatenate([human_model.mass, robot.mass]), 0.02)

    robot_active = np.zeros(robot.ndof, bool)
    arm_dofs = tuple(int(robot.dof_index[l]) for l in info.arm_left)
    robot_active[list(arm_dofs)] = True

    spec = SceneSpec(
        task=task, robot_name=robot_name, human_control=human_control, cfg=cfg,
        frame_skip=5, time_step=0.02,                      # scratch_itch.py:10
        action_robot_len=7, action_human_len=10 if human_control else 0,
        obs_robot_len=30, obs_human_len=34 if human_control else 0,
        robot=robot, human=human_model, info=info,
        arm_dofs=arm_dofs, robot_active=robot_active,
        human_controllable=CONTROLLABLE,
        geoms=gs, pairs=pt,
        groups={"tool_human": GROUP_TOOL_HUMAN, "robot_human": GROUP_ROBOT_HUMAN,
                "scene": G_SCENE, "self": G_SELF},
        extras={"self_check": self_check},
        n_human_links=Lh,
        gravity_robot=(0.0, 0.0, 0.0),                      # scratch_itch.py:139-140
        gravity_human=(0.0, 0.0, -1.0),
        human_gains=0.05, human_forces=1.0,                 # scratch_itch.py:13
        tool_base_link=tool_base, tool_tip_link=tool_tip,
        human_params_mf=(base.static_human_params("male"),
                         base.static_human_params("female")),
    )
    return ScratchItchTask(spec, np.asarray(at_target_mask))


class ScratchItchTask:
    def __init__(self, spec: SceneSpec, at_target_mask: np.ndarray):
        self.spec = spec
        self.at_target_mask = at_target_mask

    # ------------------------------------------------------------- reset
    def reset(self, key: jax.Array) -> Tuple[EnvState, jax.Array]:
        spec = self.spec
        info = spec.info
        (key, k_h, k_target_pos, k_limb, k_theta, k_ik) = jax.random.split(key, 6)
        hp = base.sample_human(k_h, spec, impairment="random")

        nh = spec.human.ndof
        hq = base.set_human_joint_angles(spec, jnp.zeros(nh, f32), JOINTS_POSITIONS)
        hq = jnp.clip(hq, hp["lower"], hp["upper"])

        human_base_pos = jnp.asarray([0.0, 0.03, 0.0], f32).at[2].set(hp["base_height"])
        human_base_quat = jnp.asarray([0, 0, 0, 1], f32)

        # reactive PD holding the initial pose (scratch_itch.py:104:
        # human_reactive_force=1, gain=0.01 when robot-only control)
        hc = np.asarray(CONTROLLABLE)
        human_active = jnp.zeros(nh, bool).at[hc].set(True)
        kp0 = 0.0 if spec.human_control else 0.01
        f0 = 0.0 if spec.human_control else 1.0 * hp["strength"]
        h_kp = jnp.zeros(nh, f32).at[hc].set(kp0)
        h_force = jnp.zeros(nh, f32).at[hc].set(f0)

        # human link frames for robot base optimisation
        fk_h = kin.fk(spec.human, hq, human_base_pos, human_base_quat,
                      origin_xyz=hp["origin_xyz"])
        shoulder, elbow, wrist = fk_h.pos[5], fk_h.pos[7], fk_h.pos[9]

        rq = jnp.zeros(spec.robot.ndof, f32)
        for idx_list, defaults in ((info.arm_left, info.default_left),
                                   (info.arm_right, info.default_right)):
            for l, v in zip(idx_list, defaults or ()):
                rq = rq.at[int(spec.robot.dof_index[l])].set(v)
        # gripper open (scratch_itch.py:119,125,134), held frozen
        gopen = robots_mod.GRIPPER_OPEN[(spec.task, spec.robot_name)]
        for gl, sgn in zip(info.gripper_left, info.gripper_sign):
            rq = rq.at[int(spec.robot.dof_index[gl])].set(gopen * sgn)

        arm = np.asarray(spec.arm_dofs)
        rl = jnp.asarray(spec.robot.dof_limits()[0])[arm]
        ru = jnp.asarray(spec.robot.dof_limits()[1])[arm]
        ee = info.ee_left

        if spec.robot_name == "jaco":
            # wheelchair-mounted (scratch_itch.py:99-100)
            robot_base_pos = jnp.asarray([-0.35, -0.27, 0.36], f32)
            robot_base_quat = m3.quat_from_euler(jnp.asarray([0, 0, -math.pi / 2], f32))
            target_pos_ik = (jnp.asarray([-0.5, 0.0, 0.8], f32)
                             + jax.random.uniform(k_target_pos, (3,), f32, -0.05, 0.05))
            target_quat_ik = m3.quat_from_euler(jnp.asarray([0, math.pi / 2, 0], f32))
            res = ik_mod.ik_random_restarts(
                k_ik, spec.robot, ee, target_pos_ik, target_quat_ik, rq,
                spec.arm_dofs, robot_base_pos, robot_base_quat, rl, ru,
                restarts=40, iters=40, pos_threshold=0.03,   # scratch_itch.py:124 (40 restarts)
                collision_penalty=(
                    None if spec.extras.get("self_check") is None else
                    lambda q: spec.extras["self_check"](
                        q, robot_base_pos, robot_base_quat)))
            rq = res.q
        else:
            target_pos_ik = (jnp.asarray([-0.55, 0.0, 0.8], f32)
                             + jax.random.uniform(k_target_pos, (3,), f32, -0.05, 0.05))
            if spec.robot_name == "pr2":
                t_eul, off = (0.0, 0.0, 0.0), (0.1, 0.0, 0.0)
            elif spec.robot_name == "baxter":
                t_eul, off = (0.0, math.pi / 2, 0.0), (0.0, 0.0, 0.975)
            else:
                t_eul, off = (0.0, math.pi / 2, 0.0), (-0.1, 0.0, 0.975)
            tq = m3.quat_from_euler(jnp.asarray(t_eul, f32))
            bp, bq, rq = ik_mod.position_robot_toc(
                k_ik, spec.robot,
                arms=[(ee, spec.arm_dofs, rl, ru)],
                start_goals=[[(target_pos_ik, tq)]],
                extra_goals=[[(shoulder, None), (elbow, None), (wrist, None)]],
                q_base=rq, base_quat_center=0.0, pos_offset=off,
                attempts=100, ik_iters=30)
            robot_base_pos, robot_base_quat = bp, bq

        # scratch target on upper arm or forearm (scratch_itch.py:147-155)
        limb_is_upper = jax.random.bernoulli(k_limb, 0.5)
        ua_l, ua_r, fa_l, fa_r, _ = hp["arm_dims"]
        length = jnp.where(limb_is_upper, ua_l, fa_l)
        radius = jnp.where(limb_is_upper, ua_r, fa_r)
        target_on_arm = geo.point_on_capsule(
            k_theta, jnp.zeros(3, f32), jnp.asarray([0.0, 0.0, -1.0], f32) * length,
            radius)
        limb = jnp.where(limb_is_upper, 5, 7)

        state = EnvState(
            key=key, t=jnp.zeros((), jnp.int32),
            robot_q=rq, robot_qd=jnp.zeros_like(rq),
            human_q=hq, human_qd=jnp.zeros(nh, f32),
            robot_base_pos=robot_base_pos, robot_base_quat=robot_base_quat,
            human_base_pos=human_base_pos, human_base_quat=human_base_quat,
            human_active=human_active, human_motor_kp=h_kp, human_motor_force=h_force,
            target_human_joint_positions=hq,
            human=hp,
            geom_p0=jnp.zeros((1,)), geom_p1=jnp.zeros((1,)), geom_radius=jnp.zeros((1,)),
            prev_valid_right=jnp.concatenate([hq[np.asarray([3, 4, 5, 6])],
                                              jnp.zeros(1, f32)]),
            prev_valid_left=jnp.concatenate([hq[np.asarray([13, 14, 15, 16])],
                                             jnp.zeros(1, f32)]),
            task_success=jnp.zeros((), f32),
            aux=dict(limb=limb, target_on_arm=target_on_arm,
                     prev_target_contact_pos=jnp.zeros(3, f32),
                     target_pos=jnp.zeros(3, f32)),
        )
        p0, p1, rad = base.scene_geom_state(spec, hp)
        state = state.replace(geom_p0=p0, geom_p1=p1, geom_radius=rad)

        fk_h, fk_r = base.scene_fk(spec, state)
        state = state.replace(aux=dict(state.aux, target_pos=self._target_pos(fk_h, state)))
        obs = self._get_obs(state, fk_h, fk_r, None, None,
                            jnp.zeros((), f32), jnp.zeros(2, f32))
        return state, obs

    def _target_pos(self, fk_h, state):
        limb = state.aux["limb"]
        pos = fk_h.pos[limb]
        quat = fk_h.quat[limb]
        return pos + m3.quat_rotate(quat, state.aux["target_on_arm"])

    # ------------------------------------------------------------- step
    def step(self, state: EnvState, action: jax.Array):
        state, contacts, (fk_h, fk_r), (vel_h, vel_r) = base.take_step(
            self.spec, state, action)
        return self._finish(state, action, contacts, fk_h, fk_r, vel_h, vel_r)

    def step_batched(self, states: EnvState, actions: jax.Array):
        """Batched step: fused Pallas dynamics (base.take_step_batched) +
        vmapped reward/obs logic.  Semantically equals jax.vmap(self.step)."""
        states, contacts, (fk_h, fk_r), (vel_h, vel_r) = base.take_step_batched(
            self.spec, states, actions)
        return jax.vmap(self._finish)(states, actions, contacts, fk_h, fk_r,
                                      vel_h, vel_r)

    def _finish(self, state, action, contacts, fk_h, fk_r, vel_h, vel_r):
        spec = self.spec
        cfg = spec.cfg

        target_pos = self._target_pos(fk_h, state)   # update_targets (:163-167)

        # force readbacks (scratch_itch.py:44-62)
        tool_human = contacts.group_fn[spec.groups["tool_human"]]
        robot_human = contacts.group_fn[spec.groups["robot_human"]]
        tool_force = tool_human
        near = jnp.linalg.norm(contacts.point - target_pos[None], axis=-1) < 0.025
        at_mask = jnp.asarray(self.at_target_mask) & near & (contacts.fn > 0)
        tool_force_at_target = jnp.sum(jnp.where(at_mask, contacts.fn, 0.0))
        has_target_contact = jnp.any(at_mask)
        best = jnp.argmax(jnp.where(at_mask, contacts.fn, -1.0))
        target_contact_pos = contacts.point[best]
        total_force_on_human = tool_human + robot_human

        tip = spec.tool_tip_link - spec.robot.nlinks  # negative index trick
        eev = jnp.linalg.norm(vel_r.v[spec.tool_tip_link])

        preferences = base.human_preferences(
            spec, end_effector_velocity=eev,
            total_force_on_human=total_force_on_human,
            tool_force_at_target=tool_force_at_target)

        tool_pos = fk_r.pos[spec.tool_tip_link]
        reward_distance = -jnp.linalg.norm(target_pos - tool_pos)
        reward_action = -jnp.sum(jnp.square(jnp.clip(action, -1, 1)))
        moved = jnp.linalg.norm(target_contact_pos - state.aux["prev_target_contact_pos"]) > 0.01
        scratched = has_target_contact & moved & (tool_force_at_target < 10.0)
        reward_force_scratch = jnp.where(scratched, tool_force_at_target, 0.0)
        new_prev = jnp.where(scratched, target_contact_pos,
                             state.aux["prev_target_contact_pos"])
        task_success = state.task_success + scratched.astype(f32)

        reward = (cfg.distance_weight * reward_distance
                  + cfg.action_weight * reward_action
                  + cfg.tool_force_weight * tool_force_at_target
                  + cfg.scratch_reward_weight * reward_force_scratch
                  + preferences)

        state = state.replace(
            task_success=task_success,
            aux=dict(state.aux, prev_target_contact_pos=new_prev,
                     target_pos=target_pos))

        obs = self._get_obs(state, fk_h, fk_r, vel_h, vel_r,
                            tool_force,
                            jnp.stack([total_force_on_human, tool_force_at_target]))
        info = dict(
            total_force_on_human=total_force_on_human,
            task_success=(task_success >= cfg.task_success_threshold).astype(f32),
            action_robot_len=jnp.asarray(spec.action_robot_len),
            action_human_len=jnp.asarray(spec.action_human_len),
            obs_robot_len=jnp.asarray(spec.obs_robot_len),
            obs_human_len=jnp.asarray(spec.obs_human_len),
        )
        done = jnp.zeros((), bool)
        return state, obs, reward, done, info

    # ------------------------------------------------------------- obs
    def _get_obs(self, state, fk_h, fk_r, vel_h, vel_r, tool_force, forces_human):
        """Obs layout parity: scratch_itch.py:64-88."""
        spec = self.spec
        torso = fk_r.pos[spec.info.torso]
        tool_pos = fk_r.pos[spec.tool_tip_link]
        tool_orient = fk_r.quat[spec.tool_tip_link]
        target_pos = state.aux["target_pos"]
        arm = np.asarray(spec.arm_dofs)
        qarm = state.robot_q[arm]
        shoulder, elbow, wrist = fk_h.pos[5], fk_h.pos[7], fk_h.pos[9]
        robot_obs = jnp.concatenate([
            tool_pos - torso, tool_orient, tool_pos - target_pos,
            target_pos - torso, qarm,
            shoulder - torso, elbow - torso, wrist - torso,
            jnp.atleast_1d(tool_force)])
        if not spec.human_control:
            return robot_obs
        hpos = state.human_base_pos
        hc = np.asarray(spec.human_controllable)
        human_obs = jnp.concatenate([
            tool_pos - hpos, tool_orient, tool_pos - target_pos,
            target_pos - hpos, state.human_q[hc],
            shoulder - hpos, elbow - hpos, wrist - hpos, forces_human])
        return jnp.concatenate([robot_obs, human_obs])
