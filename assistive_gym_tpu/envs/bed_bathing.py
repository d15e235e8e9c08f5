"""BedBathing task: wiping capsule-surface targets on the arm of a person in bed.

Functional re-design of reference envs/bed_bathing.py:8-246.  The human
settles onto the bed at reset under gravity (settle_human; the reference's
100-substep drop, bed_bathing.py:126-141 — here with the torso placed at
mattress height and joints relaxing, a documented simplification of the
free-base drop), then freezes.  Wiping targets are capsule-surface grids on
the upper arm and forearm (util.py:120-153) as fixed-size padded arrays with
per-gender valid masks; a wipe = wiper-pad contact within 0.025 m of a
target (bed_bathing.py:62-84).

Bed collision: the mattress sleeping surface of bed_single_reduced.obj
(scale 1.1, base [-0.1,0,0], world_creation.py:44-49) is a half-space at
z = 0.72 (measured from the mesh; SURVEY.md §2.2 N2 mesh re-approximation).
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
from ..ops import geometry as geo
from ..ops import ik as ik_mod
from ..ops import math3d as m3
from ..physics import contact as con
from ..physics import kinematics as kin
from . import base
from .base import EnvState, SceneSpec, f32

BED_TOP = 0.72
CONTROLLABLE = tuple(range(10))

# fixed-size wipe-target buffers (male counts are the larger)
def _targets(gender):
    d = hm.dims(gender)
    up = geo.capsule_points_static((0, 0, 0), (0, 0, -d.upperarm_l),
                                   d.upperarm_r, 0.03)
    fo = geo.capsule_points_static((0, 0, 0), (0, 0, -d.forearm_l),
                                   d.forearm_r, 0.03)
    return up, fo


_UP_M, _FO_M = _targets("male")
_UP_F, _FO_F = _targets("female")
N_UP, N_FO = len(_UP_M), len(_FO_M)


def _pad(a, n):
    out = np.zeros((n, 3), np.float32)
    out[: len(a)] = a
    mask = np.zeros(n, bool)
    mask[: len(a)] = True
    return out, mask


_UP_F_PAD, _UP_F_MASK = _pad(_UP_F, N_UP)
_FO_F_PAD, _FO_F_MASK = _pad(_FO_F, N_FO)


def build(robot_name: str, human_control: bool) -> "BedBathingTask":
    task = "bed_bathing"
    cfg = cfgmod.TASK_CONFIGS[task]
    robot, tool_base, tool_tip, info = base.compose_robot_with_tool(task, robot_name, left=True)
    human_model, human_geoms, _ = hm.build_human("male", 1.0)
    Lh = human_model.nlinks

    geoms = list(human_geoms)
    n_human_geoms = len(geoms)
    # bed sleeping surface (world half-space)
    geoms.append(dict(link=-1, gtype=con.GEOM_PLANE, p0=(0, 0, BED_TOP),
                      p1=(0, 0, 1.0)))
    bed_geom = len(geoms) - 1
    rg = robots_mod.robot_capsules(robot, info.collision_links, info.capsule_radius)
    tg = robots_mod.tool_geoms(task, tool_base)
    for g in rg + tg:
        g = dict(g)
        g["link"] = g["link"] + Lh
        geoms.append(g)
    gs = con.GeomSet.build(geoms)

    n_rg = len(rg)
    robot_geom_ids = list(range(bed_geom + 1, bed_geom + 1 + n_rg))
    tool_geom_ids = list(range(bed_geom + 1 + n_rg, len(geoms)))
    human_geom_ids = list(range(n_human_geoms))

    GROUP_TOOL_HUMAN, GROUP_ROBOT_HUMAN, GROUP_BED, G_SELF = 0, 1, 2, 3
    pairs = []
    pad_pair_mask = []   # pairs whose geom-a is the wiper pad (tool link 1)
    for tgi_local, tgi in enumerate(tool_geom_ids):
        for hgi in human_geom_ids:
            pairs.append(dict(a=tgi, b=hgi, kind=0, group=GROUP_TOOL_HUMAN,
                              friction=0.3))
            pad_pair_mask.append(tgi_local == 1)
    for rgi in robot_geom_ids:
        for hgi in human_geom_ids:
            pairs.append(dict(a=rgi, b=hgi, kind=0, group=GROUP_ROBOT_HUMAN))
            pad_pair_mask.append(False)
    for hgi in human_geom_ids:
        # stiffness/damping come from tuned_pairs (stability-derived;
        # PARITY.md notes the deviation from the 4000/60 reference-era values)
        pairs.append(dict(a=hgi, b=bed_geom, kind=2, group=GROUP_BED,
                          friction=1.0))           # bed friction=5 then 0.3
        pad_pair_mask.append(False)
    q0 = np.asarray(base.default_robot_q(robot, info, task, robot_name))
    self_pairs = robots_mod.self_collision_pairs(
        robot, rg, robot_geom_ids, q0, G_SELF)
    pairs += self_pairs
    pad_pair_mask += [False] * len(self_pairs)
    pt = con.PairTable.build(pairs, ngroups=4)
    pad_pair_mask = pt.reindex(pad_pair_mask)     # table is kind-sorted
    pt = con.tuned_pairs(gs, pt, np.concatenate([human_model.mass, robot.mass]), 0.02)

    robot_active = np.zeros(robot.ndof, bool)
    arm_dofs = tuple(int(robot.dof_index[l]) for l in info.arm_left)
    robot_active[list(arm_dofs)] = True

    spec = SceneSpec(
        task=task, robot_name=robot_name, human_control=human_control, cfg=cfg,
        frame_skip=5, time_step=0.02,                       # bed_bathing.py:10
        action_robot_len=7, action_human_len=10 if human_control else 0,
        obs_robot_len=24, obs_human_len=28 if human_control else 0,
        robot=robot, human=human_model, info=info,
        arm_dofs=arm_dofs, robot_active=robot_active,
        human_controllable=CONTROLLABLE,
        geoms=gs, pairs=pt,
        groups={"tool_human": GROUP_TOOL_HUMAN, "robot_human": GROUP_ROBOT_HUMAN,
                "bed": GROUP_BED, "self": G_SELF},
        n_human_links=Lh,
        gravity_robot=(0.0, 0.0, 0.0),                      # bed_bathing.py:156-157
        gravity_human=(0.0, 0.0, -1.0),
        human_gains=0.05, human_forces=1.0,                 # bed_bathing.py:13
        tool_base_link=tool_base, tool_tip_link=tool_tip,
        human_params_mf=(base.static_human_params("male"),
                         base.static_human_params("female")),
    )
    return BedBathingTask(spec, np.asarray(pad_pair_mask))


class BedBathingTask:
    def __init__(self, spec: SceneSpec, pad_pair_mask: np.ndarray):
        self.spec = spec
        self.pad_pair_mask = pad_pair_mask

    # ------------------------------------------------------------- reset
    def reset(self, key: jax.Array) -> Tuple[EnvState, jax.Array]:
        spec = self.spec
        info = spec.info
        key, k_h, k_pert, k_tpos, k_ik = jax.random.split(key, 5)
        hp = base.sample_human(k_h, spec, impairment="random")

        nh = spec.human.ndof
        # lying on back along +y (bed_bathing.py:130: base euler(-pi/2,0,0))
        human_base_quat = m3.quat_from_euler(jnp.asarray([-math.pi / 2, 0, 0], f32))
        chest_r = 0.127
        human_base_pos = jnp.asarray([-0.15, 0.2, BED_TOP + chest_r + 0.03], f32)

        hq = jnp.zeros(nh, f32).at[3].set(math.radians(30))      # :127
        hq = hq + jax.random.uniform(k_pert, (nh,), f32, -0.1, 0.1)  # :135-137
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

        # settle onto the bed (100 substeps, g=-1: bed_bathing.py:132-141)
        hq, _ = base.settle_human(spec, state, sim_dofs=tuple(range(nh)),
                                  n_steps=200, dt=0.01)
        state = state.replace(human_q=hq, human_qd=jnp.zeros(nh, f32))

        # freeze joints; arm compliant only under co-control (:143-153)
        hc = np.asarray(CONTROLLABLE)
        if spec.human_control:
            human_active = jnp.zeros(nh, bool).at[hc].set(True)
        else:
            human_active = jnp.zeros(nh, bool)
        state = state.replace(human_active=human_active,
                              target_human_joint_positions=hq)

        fk_h = kin.fk(spec.human, hq, human_base_pos, human_base_quat,
                      origin_xyz=hp["origin_xyz"])
        shoulder, elbow, wrist = fk_h.pos[5], fk_h.pos[7], fk_h.pos[9]

        rq = base.init_robot_q(spec)
        arm = np.asarray(spec.arm_dofs)
        rl = jnp.asarray(spec.robot.dof_limits()[0])[arm]
        ru = jnp.asarray(spec.robot.dof_limits()[1])[arm]
        ee = info.ee_left
        target_pos_ik = (jnp.asarray([-0.6, 0.2, 1.0], f32)
                         + jax.random.uniform(k_tpos, (3,), f32, -0.05, 0.05))

        if spec.robot_name == "pr2":
            t_eul, off, rpos = (0.0, 0.0, 0.0), (-0.1, 0.0, 0.0), 0.5
        elif spec.robot_name == "jaco":
            t_eul, off, rpos = (0.0, math.pi / 2, 0.0), (-0.05, 1.05, 0.6), 0.1
        elif spec.robot_name == "baxter":
            t_eul, off, rpos = (0.0, math.pi / 2, 0.0), (-0.2, 0.0, 0.975), 0.5
        else:
            t_eul, off, rpos = (0.0, math.pi / 2, 0.0), (-0.2, 0.0, 0.975), 0.5
        tq = m3.quat_from_euler(jnp.asarray(t_eul, f32))
        bp, bq, rq = ik_mod.position_robot_toc(
            k_ik, spec.robot,
            arms=[(ee, spec.arm_dofs, rl, ru)],
            start_goals=[[(target_pos_ik, tq)]],
            extra_goals=[[(shoulder, None), (elbow, None), (wrist, None)]],
            q_base=rq, base_quat_center=0.0, pos_offset=off,
            attempts=100, ik_iters=30, random_position=rpos)
        state = state.replace(robot_q=rq, robot_base_pos=bp, robot_base_quat=bq)

        # wipe targets: per-gender local grids, padded + masked
        is_male = hp["gender_male"]
        up_local = jnp.where(is_male, jnp.asarray(_UP_M), jnp.asarray(_UP_F_PAD))
        fo_local = jnp.where(is_male, jnp.asarray(_FO_M), jnp.asarray(_FO_F_PAD))
        up_valid = jnp.where(is_male, jnp.ones(N_UP, bool), jnp.asarray(_UP_F_MASK))
        fo_valid = jnp.where(is_male, jnp.ones(N_FO, bool), jnp.asarray(_FO_F_MASK))
        total = up_valid.sum() + fo_valid.sum()
        state = state.replace(aux=dict(
            up_local=up_local, fo_local=fo_local,
            up_alive=up_valid, fo_alive=fo_valid,
            total_targets=total.astype(f32)))

        fk_h2, fk_r2 = base.scene_fk(spec, state)
        state = state.replace(aux=dict(
            state.aux,
            min_target_dist=self._min_target_dist(
                fk_h2, fk_r2, up_local, fo_local, up_valid, fo_valid)))
        obs = self._get_obs(state, fk_h2, fk_r2, jnp.zeros(1, f32), jnp.zeros(2, f32))
        return state, obs

    def _min_target_dist(self, fk_h, fk_r, up_local, fo_local,
                         up_alive, fo_alive):
        """Tool-tip distance to the nearest ALIVE wipe target (0 when all
        targets are wiped, so the shaping potential stays bounded)."""
        spec = self.spec
        up_w = base.transform_points_on_link(fk_h, 5, up_local)
        fo_w = base.transform_points_on_link(fk_h, 7, fo_local)
        tool = fk_r.pos[spec.tool_tip_link]
        inf = jnp.asarray(jnp.inf, f32)
        d = jnp.minimum(
            jnp.min(jnp.where(up_alive,
                              jnp.linalg.norm(up_w - tool[None], axis=-1), inf)),
            jnp.min(jnp.where(fo_alive,
                              jnp.linalg.norm(fo_w - tool[None], axis=-1), inf)))
        return jnp.where(jnp.isfinite(d), d, 0.0)

    def shaping_potential(self, state: EnvState) -> jax.Array:
        """Training-time shaping potential: -(tool dist to nearest un-wiped
        target).

        The TRUE reward (reference bed_bathing.py:22) shapes the tool toward
        the CLOSEST point anywhere on the human, so it saturates on first
        skin contact and gives no gradient for traversing the arm to reach
        the remaining wipe targets — wiping only scores on the sparse
        new-contact event.  Used only via PPOConfig.shaping_coef (annealed,
        potential-based, Ng et al. 1999) — the env reward itself is
        untouched.  The value is precomputed in reset/_finish where the
        target world positions already exist.
        """
        return -state.aux["min_target_dist"]

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

        tool_on_human = contacts.group_fn[spec.groups["tool_human"]]
        robot_on_human = contacts.group_fn[spec.groups["robot_human"]]
        total_force_on_human = tool_on_human + robot_on_human
        # tool_force = all tool contacts (bed_bathing.py:42-44)
        tool_force = tool_on_human

        # pad contacts within 0.025 of targets wipe them (:62-84)
        pad = jnp.asarray(self.pad_pair_mask) & (contacts.fn > 0)
        pad_force_on_human = jnp.sum(jnp.where(pad, contacts.fn, 0.0))
        aux = state.aux
        up_world = base.transform_points_on_link(fk_h, 5, aux["up_local"])
        fo_world = base.transform_points_on_link(fk_h, 7, aux["fo_local"])

        def wiped(targets_world, alive):
            # [P_pad contacts] x [T targets]
            d = jnp.linalg.norm(contacts.point[:, None, :] - targets_world[None], axis=-1)
            hit = jnp.any(pad[:, None] & (d < 0.025), axis=0) & alive
            return hit

        up_hit = wiped(up_world, aux["up_alive"])
        fo_hit = wiped(fo_world, aux["fo_alive"])
        new_contact_points = (up_hit.sum() + fo_hit.sum()).astype(f32)
        task_success = state.task_success + new_contact_points

        eev = jnp.linalg.norm(vel_r.v[spec.tool_tip_link])
        preferences = base.human_preferences(
            spec, end_effector_velocity=eev,
            total_force_on_human=total_force_on_human,
            tool_force_at_target=pad_force_on_human)

        # distance: min closest distance tool<->human (bed_bathing.py:22)
        tool_pairs = jnp.asarray(spec.pairs.group) == spec.groups["tool_human"]
        reward_distance = -jnp.min(jnp.where(tool_pairs, contacts.dist, jnp.inf))
        reward_action = -jnp.sum(jnp.square(jnp.clip(action, -1, 1)))
        reward = (cfg.distance_weight * reward_distance
                  + cfg.action_weight * reward_action
                  + cfg.wiping_reward_weight * new_contact_points
                  + preferences)

        up_alive2 = aux["up_alive"] & ~up_hit
        fo_alive2 = aux["fo_alive"] & ~fo_hit
        state = state.replace(
            task_success=task_success,
            aux=dict(aux, up_alive=up_alive2, fo_alive=fo_alive2,
                     min_target_dist=self._min_target_dist(
                         fk_h, fk_r, aux["up_local"], aux["fo_local"],
                         up_alive2, fo_alive2)))

        obs = self._get_obs(state, fk_h, fk_r, jnp.atleast_1d(tool_force),
                            jnp.stack([total_force_on_human, pad_force_on_human]))
        info = dict(
            total_force_on_human=total_force_on_human,
            task_success=(task_success >= state.aux["total_targets"]
                          * cfg.task_success_threshold).astype(f32),
            action_robot_len=jnp.asarray(spec.action_robot_len),
            action_human_len=jnp.asarray(spec.action_human_len),
            obs_robot_len=jnp.asarray(spec.obs_robot_len),
            obs_human_len=jnp.asarray(spec.obs_human_len),
        )
        return state, obs, reward, jnp.zeros((), bool), info

    # ------------------------------------------------------------- obs
    def _get_obs(self, state, fk_h, fk_r, forces, forces_human):
        """Obs layout parity: bed_bathing.py:88-112 (24 robot / +28 human)."""
        spec = self.spec
        torso = fk_r.pos[spec.info.torso]
        tool_pos = fk_r.pos[spec.tool_tip_link]
        tool_orient = fk_r.quat[spec.tool_tip_link]
        arm = np.asarray(spec.arm_dofs)
        shoulder, elbow, wrist = fk_h.pos[5], fk_h.pos[7], fk_h.pos[9]
        robot_obs = jnp.concatenate([
            tool_pos - torso, tool_orient, state.robot_q[arm],
            shoulder - torso, elbow - torso, wrist - torso, forces])
        if not spec.human_control:
            return robot_obs
        hpos = state.human_base_pos
        hc = np.asarray(spec.human_controllable)
        human_obs = jnp.concatenate([
            tool_pos - hpos, tool_orient, state.human_q[hc],
            shoulder - hpos, elbow - hpos, wrist - hpos, forces_human])
        return jnp.concatenate([robot_obs, human_obs])
