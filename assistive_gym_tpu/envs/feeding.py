"""Feeding task: spoon + 8 food particles to the mouth.

Functional re-design of reference envs/feeding.py:8-209.  Control at 10 Hz
with 100 Hz physics (fs=10, dt=0.01, feeding.py:10); food particles are a
fixed [8,3] array with alive masks (physics/particles.py); rewards +20 food
in mouth / -5 spill / -1 hit person follow feeding.py:49-78.

Geometry notes: the table is table_tall.urdf's top box (1.5x1x0.05 at local
z=0.7, base at [0.35,-0.9,0], feeding.py:124); spill-on-table/bowl tests are
spatial (the reference uses contact queries against those static bodies).
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
from ..ops import ik as ik_mod
from ..ops import math3d as m3
from ..physics import contact as con
from ..physics import particles as part
from . import base
from .base import EnvState, SceneSpec, f32
from ..physics import kinematics as kin

CONTROLLABLE = (20, 21, 22, 23)      # head joints (feeding.py:115)
N_FOOD = 8                           # 2*2*2 (feeding.py:184)
FOOD_RADIUS = 0.005
TABLE_TOP_CENTER = (0.35, -0.9, 0.7)
TABLE_TOP_HALF = (0.75, 0.5, 0.025)


def build(robot_name: str, human_control: bool) -> "FeedingTask":
    task = "feeding"
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

    # furniture rigid collision (VERDICT #3): wheelchair boxes + tall table
    # + bowl (feeding.py:124-131, world_creation.py:35-43); the bowl geom's
    # centre is overridden per-env at reset (randomized bowl position)
    furn = (furn_mod.wheelchair_geoms() + furn_mod.table_tall_geoms()
            + furn_mod.bowl_geoms())
    furn_ids = list(range(len(geoms), len(geoms) + len(furn)))
    geoms += furn
    bowl_gid = furn_ids[-1]
    gs = con.GeomSet.build(geoms)

    GROUP_TOOL_HUMAN, GROUP_ROBOT_HUMAN, G_SCENE, G_SELF = 0, 1, 2, 3
    pairs = []
    for tgi in tool_geom_ids:
        for hgi in human_geom_ids:
            pairs.append(dict(a=tgi, b=hgi, kind=0, group=GROUP_TOOL_HUMAN))
    for rgi in robot_geom_ids:
        for hgi in human_geom_ids:
            pairs.append(dict(a=rgi, b=hgi, kind=0, group=GROUP_ROBOT_HUMAN))
    # tool/arm vs furniture, prefiltered by reset-pose clearance for the
    # wheelchair-mounted jaco (fixed base; other robots' base varies per env)
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
    pt = con.tuned_pairs(gs, pt, np.concatenate([human_model.mass, robot.mass]), 0.01)

    robot_active = np.zeros(robot.ndof, bool)
    arm_dofs = tuple(int(robot.dof_index[l]) for l in info.arm_right)
    robot_active[list(arm_dofs)] = True

    spec = SceneSpec(
        task=task, robot_name=robot_name, human_control=human_control, cfg=cfg,
        frame_skip=10, time_step=0.01,                      # feeding.py:10
        action_robot_len=7, action_human_len=4 if human_control else 0,
        obs_robot_len=25, obs_human_len=23 if human_control else 0,
        robot=robot, human=human_model, info=info,
        arm_dofs=arm_dofs, robot_active=robot_active,
        human_controllable=CONTROLLABLE,
        geoms=gs, pairs=pt,
        groups={"tool_human": GROUP_TOOL_HUMAN, "robot_human": GROUP_ROBOT_HUMAN,
                "scene": G_SCENE, "self": G_SELF},
        extras={"bowl_gid": bowl_gid, "self_check": self_check},
        n_human_links=Lh,
        gravity_robot=(0.0, 0.0, 0.0),                      # feeding.py:171-173
        gravity_human=(0.0, 0.0, 0.0),
        human_gains=0.0005, human_forces=1.0,               # feeding.py:13
        tool_base_link=tool_base, tool_tip_link=tool_tip,
        human_params_mf=(base.static_human_params("male"),
                         base.static_human_params("female")),
        substep_hook=_food_substep,
        # batch-last hook: mandatory since furniture seg-box pairs landed —
        # the hybrid loop's vmapped capsule_box narrowphase compiles to
        # (1,128)-tiled [B,P,3] layouts and costs ~560 ms/step (17x); the
        # batch-last path keeps [P,B] tiles dense (round-2 trace analysis)
        substep_hook_batched=_food_substep_b,
    )
    return FeedingTask(spec)


def _human_segments(spec, state, fk_h):
    """World segments of all human geoms (for particle collision)."""
    nhg = spec.human_params_mf[0]["geom_p0"].shape[0]
    wg = con.world_geoms(spec.geoms, fk_h.pos, fk_h.quat,
                         p0=state.geom_p0, p1=state.geom_p1)
    return wg.w0[:nhg], wg.w1[:nhg], state.geom_radius[:nhg]


def _food_substep(spec, state, aux, fk_h, fk_r, dt):
    """Per-physics-substep particle update (one-way coupled)."""
    p = part.Particles(aux["food_pos"], aux["food_vel"], aux["food_alive"])
    p = part.integrate(p, dt, (0.0, 0.0, -9.81))            # feeding.py:171
    # spoon scoop container at the tool tip; the scoop's opening direction is
    # captured at reset (spoon is level then) as a body-fixed local axis
    scoop_center = fk_r.pos[spec.tool_tip_link]
    up = m3.quat_rotate(fk_r.quat[spec.tool_tip_link], aux["scoop_up_local"])
    p = part.collide_spoon_scoop(p, FOOD_RADIUS, scoop_center, up)
    # human body
    a, b, r = _human_segments(spec, state, fk_h)
    p = part.collide_segments(p, FOOD_RADIUS, a, b, r)
    # table top
    p = part.collide_box_top(p, FOOD_RADIUS,
                             jnp.asarray(TABLE_TOP_CENTER, f32),
                             jnp.asarray(TABLE_TOP_HALF, f32))
    p = part.separate(p, FOOD_RADIUS)
    return dict(aux, food_pos=p.pos, food_vel=p.vel)


def _food_substep_b(spec, states, aux, hpos, hquat, rpos, rquat,
                    p0_bl, p1_bl, rad_bl, contacts, dt):
    """Batch-last food hook for the zero-transpose loop (physics/batched.py
    layouts); same physics as _food_substep."""
    from ..physics import batched as pb
    T = lambda x: jnp.transpose(x, (1, 2, 0))             # [B,N,3]->[N,3,B]
    p = part.ParticlesB(T(aux["food_pos"]), T(aux["food_vel"]),
                        aux["food_alive"].T)
    p = part.integrate_b(p, dt, (0.0, 0.0, -9.81))
    tip = spec.tool_tip_link
    center = rpos[tip]                                    # [3,B]
    tipq = [rquat[tip, c] for c in range(4)]
    upl = aux["scoop_up_local"].T                         # [3,B]
    up = jnp.stack(pb.quat_rotate_b(tipq, [upl[0], upl[1], upl[2]]), 0)
    p = part.collide_spoon_scoop_b(p, FOOD_RADIUS, center, up)
    nhg = spec.human_params_mf[0]["geom_p0"].shape[0]
    seg_a, seg_b = contacts.w0[:nhg], contacts.w1[:nhg]
    p = part.collide_segments_b(p, FOOD_RADIUS, seg_a, seg_b, rad_bl[:nhg])
    p = part.collide_box_top_b(p, FOOD_RADIUS, TABLE_TOP_CENTER, TABLE_TOP_HALF)
    p = part.separate_b(p, FOOD_RADIUS)
    Tb = lambda x: jnp.transpose(x, (2, 0, 1))            # back to [B,N,3]
    return dict(aux, food_pos=Tb(p.pos), food_vel=Tb(p.vel))


class FeedingTask:
    def __init__(self, spec: SceneSpec):
        self.spec = spec

    # ------------------------------------------------------------- reset
    def reset(self, key: jax.Array) -> Tuple[EnvState, jax.Array]:
        spec = self.spec
        info = spec.info
        key, k_h, k_head, k_bowl, k_tpos, k_ik = jax.random.split(key, 6)
        hp = base.sample_human(k_h, spec, impairment="random")

        nh = spec.human.ndof
        hq = base.set_human_joint_angles(
            spec, jnp.zeros(nh, f32),
            ((6, -90.0), (16, -90.0), (28, -90.0), (31, 80.0),
             (35, -90.0), (38, 80.0)))                           # feeding.py:113
        head = jax.random.uniform(k_head, (3,), f32,
                                  math.radians(-30), math.radians(30))
        hq = hq.at[np.asarray([21, 22, 23])].set(head)           # feeding.py:114
        hq = jnp.clip(hq, hp["lower"], hp["upper"])

        human_base_pos = jnp.asarray([0.0, 0.03, 0.0], f32).at[2].set(hp["base_height"])
        human_base_quat = jnp.asarray([0, 0, 0, 1], f32)

        # head dofs move only under co-control or tremor (feeding.py:116)
        hc = np.asarray(CONTROLLABLE)
        movable = jnp.logical_or(spec.human_control,
                                 hp["impairment"] == base.IMP_TREMOR)
        human_active = jnp.zeros(nh, bool).at[hc].set(movable)
        h_kp = jnp.zeros(nh, f32)
        h_force = jnp.zeros(nh, f32)

        fk_h = kin.fk(spec.human, hq, human_base_pos, human_base_quat,
                      origin_xyz=hp["origin_xyz"])
        mouth = base.transform_point_on_link(fk_h, 23, hp["mouth_pos"])

        rq = base.init_robot_q(spec)
        arm = np.asarray(spec.arm_dofs)
        rl = jnp.asarray(spec.robot.dof_limits()[0])[arm]
        ru = jnp.asarray(spec.robot.dof_limits()[1])[arm]
        ee = info.ee_right

        bowl_xy = jax.random.uniform(k_bowl, (2,), f32, -0.05, 0.05)
        bowl_pos = jnp.asarray([-0.15, -0.55, 0.75], f32).at[:2].add(bowl_xy)
        target_pos_ik = (bowl_pos + jnp.asarray([0.0, -0.1, 0.4], f32)
                         + jax.random.uniform(k_tpos, (3,), f32, -0.05, 0.05))

        if spec.robot_name == "jaco":
            robot_base_pos = jnp.asarray([-0.35, -0.27, 0.36], f32)
            robot_base_quat = m3.quat_from_euler(jnp.asarray([0, 0, -math.pi / 2], f32))
            tq = m3.quat_from_euler(jnp.asarray([math.pi / 2, 0, math.pi / 2], f32))
            res = ik_mod.ik_random_restarts(
                k_ik, spec.robot, ee, target_pos_ik, tq, rq, spec.arm_dofs,
                robot_base_pos, robot_base_quat, rl, ru,
                restarts=40, iters=40, pos_threshold=0.01,   # feeding.py:157 (40 restarts, thr 0.01)
                collision_penalty=(
                    None if spec.extras.get("self_check") is None else
                    lambda q: spec.extras["self_check"](
                        q, robot_base_pos, robot_base_quat)))
            rq = res.q
        else:
            if spec.robot_name == "pr2":
                t_eul, off = (math.pi / 2, 0.0, 0.0), (0.1, 0.2, 0.0)
            elif spec.robot_name == "baxter":
                t_eul, off = (math.pi / 2, 0.0, math.pi / 2), (0.0, 0.2, 0.975)
            else:
                t_eul, off = (math.pi / 2, 0.0, math.pi / 2), (-0.1, 0.2, 0.975)
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
            human_active=human_active, human_motor_kp=h_kp, human_motor_force=h_force,
            target_human_joint_positions=hq,
            human=hp,
            geom_p0=jnp.zeros((1,)), geom_p1=jnp.zeros((1,)), geom_radius=jnp.zeros((1,)),
            prev_valid_right=jnp.concatenate([hq[np.asarray([3, 4, 5, 6])],
                                              jnp.zeros(1, f32)]),
            prev_valid_left=jnp.concatenate([hq[np.asarray([13, 14, 15, 16])],
                                             jnp.zeros(1, f32)]),
            task_success=jnp.zeros((), f32),
            aux=dict(
                target_pos=mouth, bowl_pos=bowl_pos,
                food_pos=jnp.zeros((N_FOOD, 3), f32),
                food_vel=jnp.zeros((N_FOOD, 3), f32),
                food_alive=jnp.ones(N_FOOD, bool),
                food_hit=jnp.zeros(N_FOOD, bool),
                scoop_up_local=jnp.asarray([0.0, 0.0, 1.0], f32),
                # train-time curriculum state; 0.02 = reference parity
                # (feeding.py:58 in_mouth shell); only PPO's curriculum hook
                # widens it during training (see curriculum())
                mouth_r=jnp.asarray(0.02, f32),
            ),
        )
        p0, p1, rad = base.scene_geom_state(spec, hp)
        # bowl collision box follows the per-env randomized bowl position
        bowl_center = bowl_pos + jnp.asarray([0.0, 0.0, 0.03], f32)
        p0 = p0.at[spec.extras["bowl_gid"]].set(bowl_center)
        state = state.replace(geom_p0=p0, geom_p1=p1, geom_radius=rad)

        # spawn food above the scoop and let it settle into it
        # (feeding.py:177-200: 2x2x2 grid above the spoon, 100 substeps)
        fk_h2, fk_r2 = base.scene_fk(spec, state)
        scoop = fk_r2.pos[spec.tool_tip_link]
        # body-fixed opening direction: world +z at reset, expressed locally
        scoop_up_local = m3.quat_rotate_inv(fk_r2.quat[spec.tool_tip_link],
                                            jnp.asarray([0.0, 0.0, 1.0], f32))
        grid = []
        for i in range(2):
            for j in range(2):
                for k in range(2):
                    grid.append([i * 2 * FOOD_RADIUS - 0.005,
                                 j * 2 * FOOD_RADIUS - 0.005,
                                 k * 2 * FOOD_RADIUS + 0.008])
        food_pos = scoop[None] + jnp.asarray(grid, f32)
        aux = dict(state.aux, food_pos=food_pos, scoop_up_local=scoop_up_local)

        def settle(i, aux):
            return _food_substep(spec, state, aux, fk_h2, fk_r2, 0.01)
        aux = jax.lax.fori_loop(0, 100, settle, aux)
        state = state.replace(aux=dict(
            aux,
            target_pos=base.transform_point_on_link(fk_h2, 23, hp["mouth_pos"]),
            tip_pos=fk_r2.pos[spec.tool_tip_link]))

        obs = self._get_obs(state, fk_h2, fk_r2, jnp.zeros(1, f32), jnp.zeros(2, f32))
        return state, obs

    # ------------------------------------------------------------- step
    def step(self, state: EnvState, action: jax.Array):
        state, contacts, (fk_h, fk_r), (vel_h, vel_r) = base.take_step(
            self.spec, state, action)
        return self._finish(state, action, contacts, fk_h, fk_r, vel_h, vel_r)

    def shaping_potential(self, state: EnvState) -> jax.Array:
        """Training-time shaping potential Phi(s) = -||spoon TIP - mouth||.

        The TRUE reward (reference feeding.py:26-28) shapes distance to the
        spoon BASE frame; food sits in the scoop at the TIP, ~5 cm away, so
        delivery needs tip precision that base shaping does not reward.
        Used only via PPOConfig.shaping_coef (annealed, potential-based) —
        the env reward itself is untouched.
        """
        return -jnp.linalg.norm(state.aux["tip_pos"] - state.aux["target_pos"])

    def curriculum(self, state: EnvState, c: jax.Array) -> EnvState:
        """Train-time curriculum: widen the in_mouth delivery shell.

        c=1 -> 6 cm shell, c=0 -> the 2 cm reference-parity shell
        (feeding.py:58).  The round-3 diagnosis
        (docs/training/feeding_diagnosis_r3.md) measured all-or-nothing
        bimodality over reset conditions: failed episodes close to ~9 cm
        and collect ZERO food-reward gradient, so the policy never learns
        the hard quarter of the reset distribution.  The wide early shell
        pays partial deliveries on near-miss episodes, then anneals back to
        the parity radius.  Called only by PPO between reset and rollout
        (ppo.py curriculum hook); eval uses reset's 0.02.
        """
        r = 0.02 + 0.04 * jnp.clip(c, 0.0, 1.0)
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

        spoon_force_on_human = contacts.group_fn[spec.groups["tool_human"]]
        robot_force_on_human = contacts.group_fn[spec.groups["robot_human"]]
        total_force_on_human = spoon_force_on_human + robot_force_on_human

        # --- food rewards (feeding.py:49-78) ---
        aux = state.aux
        pos, vel, alive, hit = (aux["food_pos"], aux["food_vel"],
                                aux["food_alive"], aux["food_hit"])
        d_mouth = jnp.linalg.norm(pos - target_pos[None], axis=-1)
        # aux["mouth_r"] is 0.02 (reference feeding.py:58 parity) except
        # during curriculum training, where PPO widens it (see curriculum())
        in_mouth = alive & (d_mouth < aux["mouth_r"])
        on_table = alive & ~in_mouth & (
            (pos[:, 2] < 0.5)
            | ((jnp.abs(pos[:, 0] - TABLE_TOP_CENTER[0]) < TABLE_TOP_HALF[0])
               & (jnp.abs(pos[:, 1] - TABLE_TOP_CENTER[1]) < TABLE_TOP_HALF[1])
               & (pos[:, 2] < TABLE_TOP_CENTER[2] + TABLE_TOP_HALF[2] + 0.012))
            | ((jnp.linalg.norm(pos[:, :2] - aux["bowl_pos"][None, :2], axis=-1) < 0.09)
               & (pos[:, 2] < 0.80)))
        a_seg, b_seg, r_seg = _human_segments(spec, state, fk_h)
        touch_h = part.touches_segments(
            part.Particles(pos, vel, alive & ~in_mouth & ~on_table),
            FOOD_RADIUS, a_seg, b_seg, r_seg)
        new_hit = touch_h & ~hit
        food_reward = 20.0 * in_mouth.sum() - 5.0 * on_table.sum()
        food_hit_reward = -1.0 * new_hit.sum()
        mouth_vel_sum = jnp.sum(jnp.where(in_mouth,
                                          jnp.linalg.norm(vel, axis=-1), 0.0))
        task_success = state.task_success + in_mouth.sum()
        alive = alive & ~in_mouth & ~on_table
        hit = hit | new_hit

        eev = jnp.linalg.norm(vel_r.v[spec.tool_base_link])
        preferences = base.human_preferences(
            spec, end_effector_velocity=eev,
            total_force_on_human=robot_force_on_human,
            tool_force_at_target=spoon_force_on_human,
            food_hit_human_reward=food_hit_reward,
            food_mouth_velocities_sum=mouth_vel_sum)

        spoon_pos = fk_r.pos[spec.tool_base_link]
        reward_distance = -jnp.linalg.norm(target_pos - spoon_pos)
        reward_action = -jnp.sum(jnp.square(jnp.clip(action, -1, 1)))
        reward = (cfg.distance_weight * reward_distance
                  + cfg.action_weight * reward_action
                  + cfg.food_reward_weight * (food_reward + 0.0)
                  + preferences)

        state = state.replace(
            task_success=task_success,
            aux=dict(aux, food_alive=alive, food_hit=hit, target_pos=target_pos,
                     tip_pos=fk_r.pos[spec.tool_tip_link]))

        obs = self._get_obs(state, fk_h, fk_r,
                            jnp.atleast_1d(spoon_force_on_human),
                            jnp.stack([robot_force_on_human, spoon_force_on_human]))
        info = dict(
            total_force_on_human=total_force_on_human,
            task_success=(task_success >= N_FOOD * cfg.task_success_threshold).astype(f32),
            action_robot_len=jnp.asarray(spec.action_robot_len),
            action_human_len=jnp.asarray(spec.action_human_len),
            obs_robot_len=jnp.asarray(spec.obs_robot_len),
            obs_human_len=jnp.asarray(spec.obs_human_len),
        )
        return state, obs, reward, jnp.zeros((), bool), info

    # ------------------------------------------------------------- obs
    def _get_obs(self, state, fk_h, fk_r, forces, forces_human):
        """Obs layout parity: feeding.py:80-99 (25 robot / +23 human)."""
        spec = self.spec
        torso = fk_r.pos[spec.info.torso]
        spoon_pos = fk_r.pos[spec.tool_base_link]
        spoon_orient = fk_r.quat[spec.tool_base_link]
        target_pos = state.aux["target_pos"]
        arm = np.asarray(spec.arm_dofs)
        head_pos, head_orient = fk_h.pos[23], fk_h.quat[23]
        robot_obs = jnp.concatenate([
            spoon_pos - torso, spoon_orient, spoon_pos - target_pos,
            state.robot_q[arm], head_pos - torso, head_orient, forces])
        if not spec.human_control:
            return robot_obs
        hpos = state.human_base_pos
        hc = np.asarray(spec.human_controllable)
        human_obs = jnp.concatenate([
            spoon_pos - hpos, spoon_orient, spoon_pos - target_pos,
            state.human_q[hc], head_pos - hpos, head_orient, forces_human])
        return jnp.concatenate([robot_obs, human_obs])
