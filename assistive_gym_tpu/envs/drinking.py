"""Drinking task: cup + 64 water particles to the mouth.

Functional re-design of reference envs/drinking.py:8-233.  Control at 10 Hz
with 250 Hz physics (fs=25, dt=0.004, drinking.py:10); water is a fixed
[64,3] particle array held by an analytic open-cylinder cup container
(points_in_cylinder semantics, drinking.py:71 + util.py:93-96); rewards
+10 water in mouth / -1 spill / -1 hit person follow drinking.py:52-93.
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
from ..physics import particles as part
from . import base
from .base import EnvState, SceneSpec, f32
from .feeding import _human_segments

CONTROLLABLE = (20, 21, 22, 23)          # head joints (drinking.py:130)
N_WATER = 64                             # 4*4*4 (drinking.py:193)
WATER_RADIUS = 0.005
CUP_R = 0.05                             # containment radius (drinking.py:71)
TOP_OFF = (0.0, 0.0, -0.055)             # cup_top_center_offset (drinking.py:172)
BOTTOM_OFF = (0.0, 0.0, 0.07)            # cup_bottom_center_offset (:173)


def build(robot_name: str, human_control: bool) -> "DrinkingTask":
    task = "drinking"
    cfg = cfgmod.TASK_CONFIGS[task]
    robot, tool_base, tool_tip, info = base.compose_robot_with_tool(task, robot_name, left=False)
    human_model, human_geoms, _ = hm.build_human("male", 1.0)
    Lh = human_model.nlinks

    geoms = list(human_geoms)
    n_human_geoms = len(geoms)
    rg = robots_mod.robot_capsules(robot, info.collision_links, info.capsule_radius)
    tg = robots_mod.tool_geoms(task, tool_base)
    for g in rg + tg:
        g = dict(g)
        g["link"] = g["link"] + Lh
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
    for tgi in tool_geom_ids:
        for hgi in human_geom_ids:
            pairs.append(dict(a=tgi, b=hgi, kind=0, group=GROUP_TOOL_HUMAN))
    for rgi in robot_geom_ids:
        for hgi in human_geom_ids:
            pairs.append(dict(a=rgi, b=hgi, kind=0, group=GROUP_ROBOT_HUMAN))
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
    pt = con.PairTable.build(pairs, ngroups=4)
    pt = con.tuned_pairs(gs, pt, np.concatenate([human_model.mass, robot.mass]), 0.004)

    robot_active = np.zeros(robot.ndof, bool)
    arm_dofs = tuple(int(robot.dof_index[l]) for l in info.arm_right)
    robot_active[list(arm_dofs)] = True

    spec = SceneSpec(
        task=task, robot_name=robot_name, human_control=human_control, cfg=cfg,
        frame_skip=25, time_step=0.004,                     # drinking.py:10
        action_robot_len=7, action_human_len=4 if human_control else 0,
        obs_robot_len=25, obs_human_len=23 if human_control else 0,
        robot=robot, human=human_model, info=info,
        arm_dofs=arm_dofs, robot_active=robot_active,
        human_controllable=CONTROLLABLE,
        geoms=gs, pairs=pt,
        groups={"tool_human": GROUP_TOOL_HUMAN, "robot_human": GROUP_ROBOT_HUMAN,
                "scene": G_SCENE, "self": G_SELF},
        extras={"self_check": self_check},
        n_human_links=Lh,
        gravity_robot=(0.0, 0.0, 0.0),                      # drinking.py:177-179
        gravity_human=(0.0, 0.0, 0.0),
        human_gains=0.0005, human_forces=1.0,               # drinking.py:13
        tool_base_link=tool_base, tool_tip_link=tool_tip,
        human_params_mf=(base.static_human_params("male"),
                         base.static_human_params("female")),
        substep_hook=_water_substep,
        # batch-last hook: see feeding.py — required once seg-box furniture
        # pairs exist (the vmapped capsule_box path is pathologically slow)
        substep_hook_batched=_water_substep_b,
    )
    return DrinkingTask(spec)


def _cup_centers(spec, fk_r):
    """(top_center, bottom_center) of the containment cylinder, world.

    Cup frame = tool_tip link (drinking.py:25: cup base * ([0,0.06,0],
    euler(pi/2,0,0)), built into the weld in compose_robot_with_tool)."""
    cpos, cquat = fk_r.pos[spec.tool_tip_link], fk_r.quat[spec.tool_tip_link]
    top = cpos + m3.quat_rotate(cquat, jnp.asarray(TOP_OFF, f32))
    bottom = cpos + m3.quat_rotate(cquat, jnp.asarray(BOTTOM_OFF, f32))
    return top, bottom


def _water_substep(spec, state, aux, fk_h, fk_r, dt):
    p = part.Particles(aux["water_pos"], aux["water_vel"], aux["water_alive"])
    p = part.integrate(p, dt, (0.0, 0.0, -9.81))            # drinking.py:177
    top, bottom = _cup_centers(spec, fk_r)
    p = part.collide_cup_cylinder(p, WATER_RADIUS, top, bottom, CUP_R - 0.008)
    a, b, r = _human_segments(spec, state, fk_h)
    p = part.collide_segments(p, WATER_RADIUS, a, b, r)
    p = part.separate(p, WATER_RADIUS)
    return dict(aux, water_pos=p.pos, water_vel=p.vel)


def _water_substep_b(spec, states, aux, hpos, hquat, rpos, rquat,
                     p0_bl, p1_bl, rad_bl, contacts, dt):
    """Batch-last water hook (physics/batched.py layouts)."""
    from ..physics import batched as pb
    T = lambda x: jnp.transpose(x, (1, 2, 0))
    p = part.ParticlesB(T(aux["water_pos"]), T(aux["water_vel"]),
                        aux["water_alive"].T)
    p = part.integrate_b(p, dt, (0.0, 0.0, -9.81))
    tip = spec.tool_tip_link
    cpos = rpos[tip]
    cq = [rquat[tip, c] for c in range(4)]
    off_t = [jnp.full_like(cpos[0], v) for v in TOP_OFF]
    off_b = [jnp.full_like(cpos[0], v) for v in BOTTOM_OFF]
    top = jnp.stack([cpos[i] + r for i, r in
                     enumerate(pb.quat_rotate_b(cq, off_t))], 0)
    bottom = jnp.stack([cpos[i] + r for i, r in
                        enumerate(pb.quat_rotate_b(cq, off_b))], 0)
    p = part.collide_cup_cylinder_b(p, WATER_RADIUS, top, bottom, CUP_R - 0.008)
    nhg = spec.human_params_mf[0]["geom_p0"].shape[0]
    seg_a, seg_b = contacts.w0[:nhg], contacts.w1[:nhg]
    p = part.collide_segments_b(p, WATER_RADIUS, seg_a, seg_b, rad_bl[:nhg])
    p = part.separate_b(p, WATER_RADIUS)
    Tb = lambda x: jnp.transpose(x, (2, 0, 1))
    return dict(aux, water_pos=Tb(p.pos), water_vel=Tb(p.vel))


class DrinkingTask:
    def __init__(self, spec: SceneSpec):
        self.spec = spec

    # ------------------------------------------------------------- reset
    def reset(self, key: jax.Array) -> Tuple[EnvState, jax.Array]:
        spec = self.spec
        info = spec.info
        key, k_h, k_head, k_tpos, k_ik = jax.random.split(key, 5)
        hp = base.sample_human(k_h, spec, impairment="random")

        nh = spec.human.ndof
        hq = base.set_human_joint_angles(
            spec, jnp.zeros(nh, f32),
            ((6, -90.0), (16, -90.0), (28, -90.0), (31, 80.0),
             (35, -90.0), (38, 80.0)))                           # drinking.py:128
        head = jax.random.uniform(k_head, (3,), f32,
                                  math.radians(-30), math.radians(30))
        hq = hq.at[np.asarray([21, 22, 23])].set(head)           # drinking.py:129
        hq = jnp.clip(hq, hp["lower"], hp["upper"])

        human_base_pos = jnp.asarray([0.0, 0.03, 0.0], f32).at[2].set(hp["base_height"])
        human_base_quat = jnp.asarray([0, 0, 0, 1], f32)

        hc = np.asarray(CONTROLLABLE)
        movable = jnp.logical_or(spec.human_control,
                                 hp["impairment"] == base.IMP_TREMOR)
        human_active = jnp.zeros(nh, bool).at[hc].set(movable)

        fk_h = kin.fk(spec.human, hq, human_base_pos, human_base_quat,
                      origin_xyz=hp["origin_xyz"])
        mouth = base.transform_point_on_link(fk_h, 23, hp["mouth_pos"])

        rq = base.init_robot_q(spec)
        arm = np.asarray(spec.arm_dofs)
        rl = jnp.asarray(spec.robot.dof_limits()[0])[arm]
        ru = jnp.asarray(spec.robot.dof_limits()[1])[arm]
        ee = info.ee_right

        target_pos_ik = (jnp.asarray([-0.2, -0.5, 1.0], f32)
                         + jax.random.uniform(k_tpos, (3,), f32, -0.05, 0.05))

        if spec.robot_name == "jaco":
            robot_base_pos = jnp.asarray([-0.35, -0.27, 0.36], f32)
            robot_base_quat = m3.quat_from_euler(jnp.asarray([0, 0, -math.pi / 2], f32))
            tq = m3.quat_from_euler(jnp.asarray([0, math.pi / 2, 0], f32))
            res = ik_mod.ik_random_restarts(
                k_ik, spec.robot, ee, target_pos_ik, tq, rq, spec.arm_dofs,
                robot_base_pos, robot_base_quat, rl, ru,
                restarts=40, iters=40, pos_threshold=0.01,   # drinking.py:160 (40 restarts, thr 0.01)
                collision_penalty=(
                    None if spec.extras.get("self_check") is None else
                    lambda q: spec.extras["self_check"](
                        q, robot_base_pos, robot_base_quat)))
            rq = res.q
        else:
            if spec.robot_name == "pr2":
                t_eul, off = (0.0, 0.0, 0.0), (0.2, 0.2, 0.0)
            elif spec.robot_name == "baxter":
                t_eul, off = (0.0, -math.pi / 2, math.pi), (0.0, 0.2, 0.975)
            else:
                t_eul, off = (0.0, -math.pi / 2, math.pi), (-0.1, 0.2, 0.975)
            tq = m3.quat_from_euler(jnp.asarray(t_eul, f32))
            bp, bq, rq = ik_mod.position_robot_toc(
                k_ik, spec.robot,
                arms=[(ee, spec.arm_dofs, rl, ru)],
                start_goals=[[(target_pos_ik, tq), (mouth, None)]],
                extra_goals=[[(mouth, tq)]],
                q_base=rq, base_quat_center=0.0, pos_offset=off,
                attempts=100, ik_iters=30)
            robot_base_pos, robot_base_quat = bp, bq

        state = EnvState(
            key=key, t=jnp.zeros((), jnp.int32),
            robot_q=rq, robot_qd=jnp.zeros_like(rq),
            human_q=hq, human_qd=jnp.zeros(nh, f32),
            robot_base_pos=robot_base_pos, robot_base_quat=robot_base_quat,
            human_base_pos=human_base_pos, human_base_quat=human_base_quat,
            human_active=human_active,
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
            aux=dict(
                target_pos=mouth,
                water_pos=jnp.zeros((N_WATER, 3), f32),
                water_vel=jnp.zeros((N_WATER, 3), f32),
                water_alive=jnp.ones(N_WATER, bool),
                # train-time curriculum state; 0.03 = reference parity
                # (drinking.py:74 in_mouth shell).  eval/step never change it;
                # only PPO's curriculum hook (ppo.py) widens it during training.
                mouth_r=jnp.asarray(0.03, f32),
                # cup pose cache for the shaping potential (written by
                # _finish each control step; seeded from reset FK below)
                cup_top=jnp.zeros(3, f32),
                tilt_err=jnp.zeros((), f32),
            ),
        )
        p0, p1, rad = base.scene_geom_state(spec, hp)
        state = state.replace(geom_p0=p0, geom_p1=p1, geom_radius=rad)

        # spawn water above the cup interior and settle (drinking.py:185-210)
        fk_h2, fk_r2 = base.scene_fk(spec, state)
        top, bottom = _cup_centers(spec, fk_r2)
        axis_up = (top - bottom)
        axis_up = axis_up / jnp.maximum(jnp.linalg.norm(axis_up), 1e-9)
        grid = []
        for i in range(4):
            for j in range(4):
                for k in range(4):
                    grid.append([i * 0.011 - 0.017, j * 0.011 - 0.017, k * 0.011])
        water_pos = (bottom[None] + axis_up[None] * 0.02
                     + jnp.asarray(grid, f32))
        aux = dict(state.aux, water_pos=water_pos)

        def settle(i, aux):
            return _water_substep(spec, state, aux, fk_h2, fk_r2, 0.004)
        aux = jax.lax.fori_loop(0, 150, settle, aux)
        cup_euler0 = m3.quat_to_euler(fk_r2.quat[spec.tool_tip_link])
        sign0 = math.pi / 2 if spec.robot_name == "jaco" else -math.pi / 2
        aux = dict(aux, cup_top=top,
                   tilt_err=jnp.abs(cup_euler0[0] + sign0))
        state = state.replace(aux=aux)

        obs = self._get_obs(state, fk_h2, fk_r2, jnp.zeros(1, f32), jnp.zeros(2, f32))
        return state, obs

    # ------------------------------------------------------------- step
    def step(self, state: EnvState, action: jax.Array):
        state, contacts, (fk_h, fk_r), (vel_h, vel_r) = base.take_step(
            self.spec, state, action)
        return self._finish(state, action, contacts, fk_h, fk_r, vel_h, vel_r)

    def shaping_potential(self, state: EnvState) -> jax.Array:
        """Training-time shaping potential: tilt-gated pour shaping.

        The TRUE reward (reference drinking.py:26-27,70-74) shapes cup-top
        distance and penalizes tilt away from upright, but gives no gradient
        toward POURING — water only scores once a particle escapes within
        the mouth shell, so gradient ascent learns *not* to tilt and parks
        the cup (docs/training/drinking_diagnosis_r5.md §2-3).  The round-5
        water-to-mouth potential was collinear with the cup-distance term
        while water sat in the cup (ibid §3); this version pays for the
        missing ACTION directly:

          phi = -0.3 * mean ||alive water - mouth||          (post-escape pull)
                + 0.5 * gate(d_cup_mouth) * min(tilt_err, 2.2)/2.2

        where gate = sigmoid((0.10 - d)/0.02): tilt is rewarded only once
        the cup is within ~10 cm of the mouth, so far-field behaviour keeps
        the true reward's upright optimum.  Cup pose comes from the
        aux cache written by _finish (no extra FK).  Used only via
        PPOConfig.shaping_coef (annealed, potential-based, Ng et al. 1999) —
        the env reward itself is untouched.
        """
        aux = state.aux
        pos, alive = aux["water_pos"], aux["water_alive"]
        d_w = jnp.linalg.norm(pos - aux["target_pos"][None], axis=-1)
        water_pull = -(jnp.sum(jnp.where(alive, d_w, 0.0))
                       / jnp.maximum(jnp.sum(alive), 1))
        d_cup = jnp.linalg.norm(aux["cup_top"] - aux["target_pos"])
        # gate center 18 cm: the distance-reward optimum physically parks
        # the cup-top at ~11.5 cm from the mouth point (face collision —
        # measured on the converged drinking_r5 policy, session-3 probe in
        # ROUND5_NOTES.md), so a 10 cm gate left the tilt term at ~0.3 gain
        # exactly where the policy sits.  18 cm/0.04 puts the park distance
        # deep inside the gate (~0.84) while still zeroing far-field tilt.
        gate = jax.nn.sigmoid((0.18 - d_cup) / 0.04)
        tilt = jnp.minimum(aux["tilt_err"], 2.2) / 2.2
        return 0.3 * water_pull + 0.5 * gate * tilt

    def curriculum(self, state: EnvState, c: jax.Array) -> EnvState:
        """Train-time curriculum: widen the in_mouth capture shell.

        c=1 -> 10 cm shell, c=0 -> the 3 cm reference-parity shell
        (drinking.py:74).  At the parity radius a particle falling past the
        mouth spends ~30 ms inside the shell between 10 Hz reward checks
        (~12% capture from a perfect release — diagnosis §4b), so early
        training never sees a positive water event; the wide shell breaks
        the -1-per-spill cliff, then anneals the policy onto the metering
        behaviour the true task demands.  Called only by PPO between reset
        and rollout (ppo.py curriculum hook); eval uses reset's 0.03.
        """
        r = 0.03 + 0.07 * jnp.clip(c, 0.0, 1.0)
        return state.replace(aux=dict(
            state.aux, mouth_r=jnp.full_like(state.aux["mouth_r"], r)))

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

        target_pos = base.transform_point_on_link(fk_h, 23, state.human["mouth_pos"])

        cup_force_on_human = contacts.group_fn[spec.groups["tool_human"]]
        robot_force_on_human = contacts.group_fn[spec.groups["robot_human"]]
        total_force_on_human = cup_force_on_human + robot_force_on_human

        # --- water rewards (drinking.py:52-93) ---
        aux = state.aux
        pos, vel, alive = aux["water_pos"], aux["water_vel"], aux["water_alive"]
        top, bottom = _cup_centers(spec, fk_r)
        in_cup = geo.points_in_cylinder(top[None], bottom[None], CUP_R, pos)
        escaped = alive & ~in_cup
        d_mouth = jnp.linalg.norm(pos - target_pos[None], axis=-1)
        # aux["mouth_r"] is 0.03 (reference drinking.py:74 parity) except
        # during curriculum training, where PPO widens it (see curriculum())
        in_mouth = escaped & (d_mouth < aux["mouth_r"])
        spilled = escaped & ~in_mouth & (pos[:, 2] < 0.5)
        a_seg, b_seg, r_seg = _human_segments(spec, state, fk_h)
        hit_h = part.touches_segments(
            part.Particles(pos, vel, escaped & ~in_mouth & ~spilled),
            WATER_RADIUS, a_seg, b_seg, r_seg)
        water_reward = 10.0 * in_mouth.sum() - 1.0 * spilled.sum()
        water_hit_reward = -1.0 * hit_h.sum()
        mouth_vel_sum = jnp.sum(jnp.where(in_mouth,
                                          jnp.linalg.norm(vel, axis=-1), 0.0))
        task_success = state.task_success + in_mouth.sum()
        alive = alive & ~in_mouth & ~spilled & ~hit_h

        eev = jnp.linalg.norm(vel_r.v[spec.tool_base_link])
        preferences = base.human_preferences(
            spec, end_effector_velocity=eev,
            total_force_on_human=robot_force_on_human,
            tool_force_at_target=cup_force_on_human,
            food_hit_human_reward=water_hit_reward,
            food_mouth_velocities_sum=mouth_vel_sum)

        # distance: top of cup to mouth (drinking.py:26-27)
        cpos, cquat = fk_r.pos[spec.tool_tip_link], fk_r.quat[spec.tool_tip_link]
        cup_top = cpos + m3.quat_rotate(cquat, jnp.asarray(TOP_OFF, f32))
        reward_distance = -jnp.linalg.norm(target_pos - cup_top)
        reward_action = -jnp.sum(jnp.square(jnp.clip(action, -1, 1)))
        # tilt reward (drinking.py:29-31)
        cup_euler = m3.quat_to_euler(cquat)
        sign = math.pi / 2 if spec.robot_name == "jaco" else -math.pi / 2
        reward_tilt = -jnp.abs(cup_euler[0] + sign)

        reward = (cfg.distance_weight * reward_distance
                  + cfg.action_weight * reward_action
                  + cfg.cup_tilt_weight * reward_tilt
                  + cfg.drinking_reward_weight * water_reward
                  + preferences)

        state = state.replace(
            task_success=task_success,
            aux=dict(aux, water_alive=alive, target_pos=target_pos,
                     cup_top=cup_top, tilt_err=-reward_tilt))

        obs = self._get_obs(state, fk_h, fk_r,
                            jnp.atleast_1d(cup_force_on_human),
                            jnp.stack([robot_force_on_human, cup_force_on_human]))
        info = dict(
            total_force_on_human=total_force_on_human,
            task_success=(task_success >= N_WATER * cfg.task_success_threshold).astype(f32),
            action_robot_len=jnp.asarray(spec.action_robot_len),
            action_human_len=jnp.asarray(spec.action_human_len),
            obs_robot_len=jnp.asarray(spec.obs_robot_len),
            obs_human_len=jnp.asarray(spec.obs_human_len),
        )
        return state, obs, reward, jnp.zeros((), bool), info

    # ------------------------------------------------------------- obs
    def _get_obs(self, state, fk_h, fk_r, forces, forces_human):
        """Obs layout parity: drinking.py:95-114 (25 robot / +23 human)."""
        spec = self.spec
        torso = fk_r.pos[spec.info.torso]
        tool_pos = fk_r.pos[spec.tool_base_link]
        tool_orient = fk_r.quat[spec.tool_base_link]
        target_pos = state.aux["target_pos"]
        arm = np.asarray(spec.arm_dofs)
        head_pos, head_orient = fk_h.pos[23], fk_h.quat[23]
        robot_obs = jnp.concatenate([
            tool_pos - torso, tool_orient, tool_pos - target_pos,
            state.robot_q[arm], head_pos - torso, head_orient, forces])
        if not spec.human_control:
            return robot_obs
        hpos = state.human_base_pos
        hc = np.asarray(spec.human_controllable)
        human_obs = jnp.concatenate([
            tool_pos - hpos, tool_orient, tool_pos - target_pos,
            state.human_q[hc], head_pos - hpos, head_orient, forces_human])
        return jnp.concatenate([robot_obs, human_obs])
