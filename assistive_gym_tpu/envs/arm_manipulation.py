"""ArmManipulation task: dual-arm repositioning of a fallen arm in bed.

Functional re-design of reference envs/arm_manipulation.py:8-210.  The robot
(14-DoF action: both arms; single-arm robots command the same arm twice,
matching robot_both_arm_joint_indices = left+right) scoops the human's right
arm back onto the torso; rewards are hand->hips and elbow->waist distances
(:29-37), tool pressure penalties feed the preference score via contact
counts (env.py:229-237).

The scooper tools are links of the *_arm_manipulation URDF variants
(world_creation.py:161,200,227,255), present in the compiled robot specs.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as cfgmod
from ..models import human as hm
from ..models import robots as robots_mod
from ..ops import ik as ik_mod
from ..ops import math3d as m3
from ..physics import contact as con
from ..physics import kinematics as kin
from . import base
from .base import EnvState, SceneSpec, f32

BED_TOP = 0.72
CONTROLLABLE = tuple(range(10))

# tool (scooper) link per robot: (left, right) (arm_manipulation.py:16-24)
TOOL_LINKS = {
    "pr2": (78, 55), "sawyer": (24, 24), "baxter": (54, 31),
    "jaco": (9, 9), "kinova_gen3": (7, 7),
}


def build(robot_name: str, human_control: bool) -> "ArmManipulationTask":
    task = "arm_manipulation"
    cfg = cfgmod.TASK_CONFIGS[task]
    info = robots_mod.ROBOT_INFO[robot_name]
    robot = robots_mod.load_robot(robot_name, arm_manipulation=True)
    human_model, human_geoms, _ = hm.build_human("male", 1.0)
    Lh = human_model.nlinks
    tool_left, tool_right = TOOL_LINKS[robot_name]

    geoms = list(human_geoms)
    n_human_geoms = len(geoms)
    geoms.append(dict(link=-1, gtype=con.GEOM_PLANE, p0=(0, 0, BED_TOP),
                      p1=(0, 0, 1.0)))
    bed_geom = len(geoms) - 1
    rg = robots_mod.robot_capsules(robot, info.collision_links, info.capsule_radius)
    # scooper tools: capsule along the tool link
    tg = [dict(link=tool_left, gtype=0, radius=0.04, p0=(0, 0, 0), p1=(0, 0, -0.25))]
    if tool_right != tool_left:
        tg.append(dict(link=tool_right, gtype=0, radius=0.04,
                       p0=(0, 0, 0), p1=(0, 0, -0.25)))
    for g in rg + tg:
        g = dict(g)
        g["link"] = g["link"] + Lh
        geoms.append(g)
    gs = con.GeomSet.build(geoms)

    n_rg = len(rg)
    robot_geom_ids = list(range(bed_geom + 1, bed_geom + 1 + n_rg))
    tool_geom_ids = list(range(bed_geom + 1 + n_rg, len(geoms)))
    human_geom_ids = list(range(n_human_geoms))

    G_TL, G_TR, G_ROBOT, G_BED, G_SELF = 0, 1, 2, 3, 4
    pairs = []
    for k, tgi in enumerate(tool_geom_ids):
        grp = G_TL if k == 0 else G_TR
        for hgi in human_geom_ids:
            pairs.append(dict(a=tgi, b=hgi, kind=0, group=grp, friction=0.8))
    for rgi in robot_geom_ids:
        for hgi in human_geom_ids:
            pairs.append(dict(a=rgi, b=hgi, kind=0, group=G_ROBOT))
    for hgi in human_geom_ids:
        pairs.append(dict(a=hgi, b=bed_geom, kind=2, group=G_BED,
                          friction=0.5))
    q0 = np.asarray(base.default_robot_q(robot, info, task, robot_name))
    pairs += robots_mod.self_collision_pairs(
        robot, rg, robot_geom_ids, q0, G_SELF)
    pt = con.PairTable.build(pairs, ngroups=5)
    pt = con.tuned_pairs(gs, pt, np.concatenate([human_model.mass, robot.mass]), 0.02)

    # both-arm dof list (duplicated for single-arm robots, env.py:97)
    both_links = tuple(info.arm_left) + tuple(info.arm_right)
    arm_dofs = tuple(int(robot.dof_index[l]) for l in both_links)
    robot_active = np.zeros(robot.ndof, bool)
    robot_active[list(set(arm_dofs))] = True

    spec = SceneSpec(
        task=task, robot_name=robot_name, human_control=human_control, cfg=cfg,
        frame_skip=5, time_step=0.02,                   # arm_manipulation.py:10
        action_robot_len=14, action_human_len=10 if human_control else 0,
        obs_robot_len=45, obs_human_len=42 if human_control else 0,
        robot=robot, human=human_model, info=info,
        arm_dofs=arm_dofs, robot_active=robot_active,
        human_controllable=CONTROLLABLE,
        geoms=gs, pairs=pt,
        groups={"tool_left": G_TL, "tool_right": G_TR, "robot": G_ROBOT,
                "bed": G_BED, "self": G_SELF},
        n_human_links=Lh,
        gravity_robot=(0.0, 0.0, 0.0),                  # arm_manipulation.py:203-204
        gravity_human=(0.0, 0.0, -9.81),
        human_gains=0.05, human_forces=2.0,             # arm_manipulation.py:13
        tool_base_link=tool_left + Lh * 0,              # robot-local link id
        tool_tip_link=tool_right,
        human_params_mf=(base.static_human_params("male"),
                         base.static_human_params("female")),
    )
    return ArmManipulationTask(spec, tool_left, tool_right)


class ArmManipulationTask:
    def __init__(self, spec: SceneSpec, tool_left: int, tool_right: int):
        self.spec = spec
        self.tool_left = tool_left
        self.tool_right = tool_right

    # ------------------------------------------------------------- reset
    def reset(self, key: jax.Array) -> Tuple[EnvState, jax.Array]:
        spec = self.spec
        info = spec.info
        key, k_h, k_pert, k_tr, k_tl, k_ik = jax.random.split(key, 6)
        hp = base.sample_human(k_h, spec, impairment="no_tremor")  # :103

        nh = spec.human.ndof
        human_base_quat = m3.quat_from_euler(jnp.asarray([-math.pi / 2, 0, 0], f32))
        human_base_pos = jnp.asarray([-0.25, 0.2, BED_TOP + 0.127 + 0.03], f32)

        hq = jnp.zeros(nh, f32).at[3].set(math.radians(30))        # :117
        hq = hq + jax.random.uniform(k_pert, (nh,), f32, -0.1, 0.1)
        hq = jnp.clip(hq, hp["lower"], hp["upper"])

        state = EnvState(
            key=key, t=jnp.zeros((), jnp.int32),
            robot_q=base.init_robot_q(spec), robot_qd=jnp.zeros(spec.robot.ndof, f32),
            human_q=hq, human_qd=jnp.zeros(nh, f32),
            robot_base_pos=jnp.asarray([-2.0, -2.0, 0.0], f32),
            robot_base_quat=jnp.asarray([0, 0, 0, 1], f32),
            human_base_pos=human_base_pos, human_base_quat=human_base_quat,
            human_active=jnp.zeros(nh, bool),
            human_motor_kp=jnp.zeros(nh, f32),
            human_motor_force=jnp.zeros(nh, f32),
            target_human_joint_positions=hq,
            human=hp,
            geom_p0=jnp.zeros((1,)), geom_p1=jnp.zeros((1,)), geom_radius=jnp.zeros((1,)),
            prev_valid_right=jnp.concatenate([hq[np.asarray([3, 4, 5, 6])],
                                              jnp.zeros(1, f32)]),
            prev_valid_left=jnp.concatenate([hq[np.asarray([13, 14, 15, 16])],
                                             jnp.zeros(1, f32)]),
            task_success=jnp.zeros((), f32),
            aux=dict(),
        )
        p0, p1, rad = base.scene_geom_state(spec, hp)
        state = state.replace(geom_p0=p0, geom_p1=p1, geom_radius=rad)

        # settle whole body, then drop the right arm off the torso and settle
        # again (arm_manipulation.py:116-147: (3,60),(4,-60),(6,0) then 100
        # substeps with only the arm free)
        hq, _ = base.settle_human(spec, state, sim_dofs=tuple(range(nh)),
                                  n_steps=150, dt=0.01)
        hq = base.set_human_joint_angles(spec, hq, ((3, 60.0), (4, -60.0), (6, 0.0)))
        hq = jnp.clip(hq, hp["lower"], hp["upper"])
        state = state.replace(human_q=hq, human_qd=jnp.zeros(nh, f32))
        hq, _ = base.settle_human(spec, state, sim_dofs=tuple(CONTROLLABLE),
                                  n_steps=100, dt=0.02, gravity=(0, 0, -1.0))
        state = state.replace(human_q=hq, human_qd=jnp.zeros(nh, f32))

        # arm dofs stay free (no static freeze for [0..9]: :138-144)
        hc = np.asarray(CONTROLLABLE)
        human_active = jnp.zeros(nh, bool).at[hc].set(True)
        state = state.replace(human_active=human_active,
                              target_human_joint_positions=hq)

        fk_h = kin.fk(spec.human, hq, human_base_pos, human_base_quat,
                      origin_xyz=hp["origin_xyz"])
        elbow, wrist = fk_h.pos[7], fk_h.pos[9]
        waist, hips = fk_h.pos[24], fk_h.pos[27]

        rq = base.init_robot_q(spec)
        rl_all, ru_all = spec.robot.dof_limits()
        target_r = (jnp.asarray([-0.9, -0.3, 0.8], f32)
                    + jax.random.uniform(k_tr, (3,), f32, -0.05, 0.05))
        target_l = (jnp.asarray([-0.9, 0.7, 0.8], f32)
                    + jax.random.uniform(k_tl, (3,), f32, -0.05, 0.05))

        left_dofs = tuple(int(spec.robot.dof_index[l]) for l in info.arm_left)
        right_dofs = tuple(int(spec.robot.dof_index[l]) for l in info.arm_right)
        ld, rd = np.asarray(left_dofs), np.asarray(right_dofs)
        rl_l, ru_l = jnp.asarray(rl_all)[ld], jnp.asarray(ru_all)[ld]
        rl_r, ru_r = jnp.asarray(rl_all)[rd], jnp.asarray(ru_all)[rd]

        if spec.robot_name == "pr2":
            tq = m3.quat_from_euler(jnp.zeros(3, f32))
            bp, bq, rq = ik_mod.position_robot_toc(
                k_ik, spec.robot,
                arms=[(info.ee_right, right_dofs, rl_r, ru_r),
                      (info.ee_left, left_dofs, rl_l, ru_l)],
                start_goals=[[(target_r, tq)], [(target_l, tq)]],
                extra_goals=[[(wrist, None), (hips, None)],
                             [(elbow, None), (waist, None)]],
                q_base=rq, base_quat_center=0.0, pos_offset=(-0.3, 0.7, 0.0),
                attempts=100, ik_iters=30)
            robot_base_pos, robot_base_quat = bp, bq
        elif spec.robot_name == "baxter":
            tq = m3.quat_from_euler(jnp.asarray([0, -math.pi / 2, math.pi], f32))
            bp, bq, rq = ik_mod.position_robot_toc(
                k_ik, spec.robot,
                arms=[(info.ee_right, right_dofs, rl_r, ru_r),
                      (info.ee_left, left_dofs, rl_l, ru_l)],
                start_goals=[[(target_r, tq)], [(target_l, tq)]],
                extra_goals=[[(wrist, None), (hips, None)],
                             [(elbow, None), (waist, None)]],
                q_base=rq, base_quat_center=0.0, pos_offset=(-0.3, 0.6, 0.975),
                attempts=100, ik_iters=30)
            robot_base_pos, robot_base_quat = bp, bq
        elif spec.robot_name in ("jaco", "kinova_gen3"):
            target_l2 = (jnp.asarray([-0.9, 0.4, 1.0], f32)
                         + jax.random.uniform(k_tl, (3,), f32, -0.05, 0.05))
            tq = m3.quat_from_euler(jnp.asarray([0, math.pi / 2, 0], f32))
            bp, bq, rq = ik_mod.position_robot_toc(
                k_ik, spec.robot,
                arms=[(info.ee_left, left_dofs, rl_l, ru_l)],
                start_goals=[[(target_l2, tq)]],
                extra_goals=[[(wrist, None), (hips, None), (elbow, None), (waist, None)]],
                q_base=rq, base_quat_center=0.0, pos_offset=(-0.05, 1.15, 0.6),
                attempts=100, ik_iters=30, random_position=0.1)
            robot_base_pos, robot_base_quat = bp, bq
        else:  # sawyer
            tq = m3.quat_from_euler(jnp.asarray([0, -math.pi / 2, math.pi], f32))
            bp, bq, rq = ik_mod.position_robot_toc(
                k_ik, spec.robot,
                arms=[(info.ee_left, left_dofs, rl_l, ru_l)],
                start_goals=[[(target_l, tq)]],
                extra_goals=[[(wrist, None), (hips, None), (elbow, None), (waist, None)]],
                q_base=rq, base_quat_center=0.0, pos_offset=(-0.3, 0.6, 0.975),
                attempts=100, ik_iters=30)
            robot_base_pos, robot_base_quat = bp, bq

        state = state.replace(robot_q=rq, robot_base_pos=robot_base_pos,
                              robot_base_quat=robot_base_quat)
        fk_h2, fk_r2 = base.scene_fk(spec, state)
        obs = self._get_obs(state, fk_h2, fk_r2, jnp.zeros(2, f32), jnp.zeros(3, f32))
        return state, obs

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

        tl_f = contacts.group_fn[spec.groups["tool_left"]]
        tr_f = contacts.group_fn[spec.groups["tool_right"]]
        robot_f = contacts.group_fn[spec.groups["robot"]]
        total_force_on_human = tl_f + tr_f + robot_f

        # pressure = force / #close contacts (env.py:229-237)
        grp = jnp.asarray(spec.pairs.group)
        near = contacts.dist < 0.01
        nl = jnp.sum((grp == spec.groups["tool_left"]) & near)
        nr = jnp.sum((grp == spec.groups["tool_right"]) & near)
        p_l = jnp.where(nl > 0, tl_f / jnp.maximum(nl, 1), 0.0)
        p_r = jnp.where(nr > 0, tr_f / jnp.maximum(nr, 1), 0.0)

        eev = (jnp.linalg.norm(vel_r.v[self.tool_left])
               + jnp.linalg.norm(vel_r.v[self.tool_right]))
        preferences = base.human_preferences(
            spec, end_effector_velocity=eev,
            arm_manipulation_tool_pressures=p_l + p_r,
            arm_manipulation_forces=(total_force_on_human, tl_f + tr_f))

        tool_l_pos = fk_r.pos[self.tool_left]
        tool_r_pos = fk_r.pos[self.tool_right]
        elbow, hand = fk_h.pos[7], fk_h.pos[9]
        waist, hips = fk_h.pos[24], fk_h.pos[27]
        r_dist_l = -jnp.linalg.norm(tool_l_pos - elbow)
        r_dist_r = -jnp.linalg.norm(tool_r_pos - hand)
        r_dist_h = -(jnp.linalg.norm(elbow - waist) + jnp.linalg.norm(hand - hips))
        r_action = -jnp.sum(jnp.square(jnp.clip(action, -1, 1)))

        if spec.robot_name in ("sawyer", "jaco", "kinova_gen3"):
            reward = (cfg.distance_human_weight * r_dist_h
                      + 2 * cfg.distance_end_effector_weight * r_dist_l
                      + cfg.action_weight * r_action + preferences)
        else:
            reward = (cfg.distance_human_weight * r_dist_h
                      + cfg.distance_end_effector_weight * r_dist_l
                      + cfg.distance_end_effector_weight * r_dist_r
                      + cfg.action_weight * r_action + preferences)

        # success tracks best human-arm placement (arm_manipulation.py:39-40)
        task_success = jnp.where(
            jnp.logical_or(state.task_success == 0.0, r_dist_h > state.task_success),
            r_dist_h, state.task_success)
        state = state.replace(task_success=task_success)

        obs = self._get_obs(state, fk_h, fk_r, jnp.stack([tl_f, tr_f]),
                            jnp.stack([total_force_on_human, tl_f, tr_f]))
        info = dict(
            total_force_on_human=total_force_on_human,
            task_success=(task_success >= cfg.task_success_threshold).astype(f32),
            action_robot_len=jnp.asarray(spec.action_robot_len),
            action_human_len=jnp.asarray(spec.action_human_len),
            obs_robot_len=jnp.asarray(spec.obs_robot_len),
            obs_human_len=jnp.asarray(spec.obs_human_len),
        )
        return state, obs, reward, jnp.zeros((), bool), info

    # ------------------------------------------------------------- obs
    def _get_obs(self, state, fk_h, fk_r, forces, forces_human):
        """Obs layout parity: arm_manipulation.py:72-98 (45 robot / +42 human)."""
        spec = self.spec
        torso = fk_r.pos[spec.info.torso]
        tl_pos, tl_q = fk_r.pos[self.tool_left], fk_r.quat[self.tool_left]
        tr_pos, tr_q = fk_r.pos[self.tool_right], fk_r.quat[self.tool_right]
        arm = np.asarray(spec.arm_dofs)
        shoulder, elbow, wrist = fk_h.pos[5], fk_h.pos[7], fk_h.pos[9]
        waist, hips = fk_h.pos[24], fk_h.pos[27]
        robot_obs = jnp.concatenate([
            tl_pos - torso, tl_q, tr_pos - torso, tr_q, state.robot_q[arm],
            shoulder - torso, elbow - torso, wrist - torso,
            waist - torso, hips - torso, forces])
        if not spec.human_control:
            return robot_obs
        hpos = state.human_base_pos
        hc = np.asarray(spec.human_controllable)
        human_obs = jnp.concatenate([
            tl_pos - hpos, tl_q, tr_pos - hpos, tr_q, state.human_q[hc],
            shoulder - hpos, elbow - hpos, wrist - hpos,
            waist - hpos, hips - hpos, forces_human])
        return jnp.concatenate([robot_obs, human_obs])
