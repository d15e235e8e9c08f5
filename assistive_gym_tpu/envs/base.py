"""Core batched env engine: scene composition + the take_step control loop.

TPU-native re-design of AssistiveEnv (reference env.py:14-416).  Everything
the reference does with a mutable PyBullet world — motor array calls,
stepSimulation loops, contact readbacks, joint-limit enforcement — collapses
into one pure function per task:

    step: (EnvState, action) -> (EnvState, obs, reward, done, info)

vmapped over the env batch and scanned over frame_skip substeps.  All shapes
are static; per-env variation (gender dims, impairments) flows through
dynamic state fields (see EnvState.human).

Control-loop parity with env.py:85-142 (take_step):
  action clipped to [-1,1], scaled by 0.05, integrated frame_skip times onto
  joint targets with limit masking, tremor wobble on the human target, then
  frame_skip physics substeps under PD position servos with force caps,
  with learned + hard human joint-limit enforcement per substep.
"""
from __future__ import annotations

import dataclasses
import math
import os
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .. import config as cfgmod
from ..models import human as human_mod
from ..models import robots as robots_mod
from ..ops import arm_limits
from ..ops import math3d as m3
from ..physics import contact as con
from ..physics import dynamics as dyn
from ..physics import kinematics as kin
from ..physics import model as pm

# impairment codes (world_creation.py:59-65)
IMP_NONE, IMP_LIMITS, IMP_WEAKNESS, IMP_TREMOR = 0, 1, 2, 3

f32 = jnp.float32


@struct.dataclass
class EnvState:
    key: jax.Array
    t: jax.Array                      # control-step counter (env.py:91)
    robot_q: jax.Array
    robot_qd: jax.Array
    human_q: jax.Array
    human_qd: jax.Array
    robot_base_pos: jax.Array
    robot_base_quat: jax.Array
    human_base_pos: jax.Array
    human_base_quat: jax.Array
    human_active: jax.Array           # bool[nh]: moving (non-static-trick) dofs
    human_motor_kp: jax.Array         # f32[nh]
    human_motor_force: jax.Array      # f32[nh]
    target_human_joint_positions: jax.Array  # f32[nh]
    human: Dict[str, jax.Array]       # dynamic human params (see sample_human)
    geom_p0: jax.Array                # f32[G,3] full-scene dynamic geometry
    geom_p1: jax.Array
    geom_radius: jax.Array
    prev_valid_right: jax.Array       # f32[4] last valid right-arm pose
    prev_valid_left: jax.Array
    task_success: jax.Array
    aux: Dict[str, jax.Array]         # task-specific


@dataclasses.dataclass(frozen=True)
class SceneSpec:
    """Static per-(task, robot) configuration; baked into the jit."""
    task: str
    robot_name: str
    human_control: bool
    cfg: cfgmod.TaskConfig
    frame_skip: int
    time_step: float
    action_robot_len: int
    action_human_len: int
    obs_robot_len: int
    obs_human_len: int
    robot: pm.ArticulatedModel        # tool welded in
    human: pm.ArticulatedModel        # topology; arrays = male (overridden)
    info: robots_mod.RobotInfo
    arm_dofs: Tuple[int, ...]         # robot dof indices of the commanded arm(s)
    robot_active: np.ndarray          # bool[nr]
    human_controllable: Tuple[int, ...]
    geoms: con.GeomSet
    pairs: con.PairTable
    groups: Dict[str, int]
    n_human_links: int
    gravity_robot: Tuple[float, float, float]
    gravity_human: Tuple[float, float, float]
    human_gains: float                # take_step human_gains arg per task
    human_forces: float
    tool_base_link: int = -1
    tool_tip_link: int = -1
    human_params_mf: Any = None       # (male, female) static param dicts
    substep_hook: Optional[Callable] = None  # (spec,state_aux,fk_h,fk_r,dt)->aux
    # batch-last hook for the zero-transpose loop (take_step_batched):
    # (spec, states, aux, hpos, hquat, rpos, rquat, p0, p1, rad, contacts,
    #  dt) -> aux, with link arrays [L,3/4,B], geoms [G,3,B]/[G,B], and the
    # substep's ContactB (its w0/w1 world segments are reusable)
    substep_hook_batched: Optional[Callable] = None
    # task-specific static metadata (e.g. per-env-positioned geom indices)
    extras: Any = None

    @property
    def action_len(self):
        return self.action_robot_len + self.action_human_len

    @property
    def obs_len(self):
        return self.obs_robot_len + self.obs_human_len


# -------------------------------------------------------------- human sampling

_SCALED_DOFS = 24  # arm + head dofs get limit_scale; waist/legs don't
                   # (human_creation.py:184-221 vs :234-263)


def static_human_params(gender: str, cloth: bool = False):
    """Host-side per-gender arrays used to build dynamic state at reset."""
    model, geoms, dims = human_mod.build_human(gender, 1.0, cloth=cloth)
    dl = model.dof_links
    return dict(
        origin_xyz=model.origin_xyz,
        com=model.com,
        mass=model.mass,
        inertia_diag=model.inertia_diag,
        lower=model.lower[dl],
        upper=model.upper[dl],
        geom_p0=np.array([g.get("p0", (0, 0, 0)) for g in geoms], np.float32),
        geom_p1=np.array([g.get("p1", g.get("p0", (0, 0, 0))) for g in geoms], np.float32),
        geom_radius=np.array([g.get("radius", 0.0) for g in geoms], np.float32),
        base_height=dims.base_height,
        mouth_pos=np.asarray(dims.mouth_pos, np.float32),
        arm_dims=np.asarray([dims.upperarm_l, dims.upperarm_r,
                             dims.forearm_l, dims.forearm_r,
                             dims.hand_r], np.float32),
    )


def sample_human(key: jax.Array, spec: SceneSpec, impairment: str = "random"):
    """Gender + impairment sampling (world_creation.py:56-65) as a pure fn.

    Returns dict of dynamic human params for EnvState.human.
    """
    km, ki, kl, ks, kt = jax.random.split(key, 5)
    male, female = spec.human_params_mf
    is_male = jax.random.bernoulli(km, 0.5)

    if impairment == "random":
        imp = jax.random.randint(ki, (), 0, 4)
    elif impairment == "no_tremor":
        imp = jax.random.randint(ki, (), 0, 3)
    elif impairment == "none":
        imp = jnp.zeros((), jnp.int32)
    else:
        raise ValueError(impairment)

    limit_scale = jnp.where(imp == IMP_LIMITS,
                            jax.random.uniform(kl, (), f32, 0.5, 1.0), 1.0)
    strength = jnp.where(imp == IMP_WEAKNESS,
                         jax.random.uniform(ks, (), f32, 0.25, 1.0), 1.0)
    ncj = len(spec.human_controllable)
    tremor_mag = math.radians(20.0) if ncj == 4 else math.radians(10.0)
    tremors_c = jax.random.uniform(kt, (max(ncj, 1),), f32, -tremor_mag, tremor_mag)
    nh = spec.human.ndof
    tremors = jnp.zeros(nh, f32)
    if ncj:
        tremors = tremors.at[np.asarray(spec.human_controllable)].set(
            jnp.where(imp == IMP_TREMOR, tremors_c, 0.0))

    sel = lambda k: jnp.where(is_male, jnp.asarray(male[k]), jnp.asarray(female[k]))
    scale_mask = np.arange(nh) < _SCALED_DOFS
    lower = sel("lower") * jnp.where(scale_mask, limit_scale, 1.0)
    upper = sel("upper") * jnp.where(scale_mask, limit_scale, 1.0)
    return dict(
        gender_male=is_male,
        impairment=imp,
        limit_scale=limit_scale,
        strength=strength,
        tremors=tremors,
        origin_xyz=sel("origin_xyz"),
        com=sel("com"),
        mass=sel("mass"),
        inertia_diag=sel("inertia_diag"),
        lower=lower,
        upper=upper,
        base_height=jnp.where(is_male, male["base_height"], female["base_height"]),
        mouth_pos=sel("mouth_pos"),
        arm_dims=sel("arm_dims"),
    )


def scene_geom_state(spec: SceneSpec, human_params) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Full-scene dynamic geometry arrays: human slice per gender, rest static."""
    nhg = spec.human_params_mf[0]["geom_p0"].shape[0]
    male, female = spec.human_params_mf
    is_male = human_params["gender_male"]
    hsel = lambda k: jnp.where(is_male, jnp.asarray(male[k]), jnp.asarray(female[k]))
    p0 = jnp.asarray(spec.geoms.p0).at[:nhg].set(hsel("geom_p0"))
    p1 = jnp.asarray(spec.geoms.p1).at[:nhg].set(hsel("geom_p1"))
    radius = jnp.asarray(spec.geoms.radius).at[:nhg].set(hsel("geom_radius"))
    return p0, p1, radius


# -------------------------------------------------------------- physics engine


def scene_fk(spec: SceneSpec, state: EnvState):
    fk_h = kin.fk(spec.human, state.human_q, state.human_base_pos,
                  state.human_base_quat, origin_xyz=state.human["origin_xyz"])
    fk_r = kin.fk(spec.robot, state.robot_q, state.robot_base_pos,
                  state.robot_base_quat)
    return fk_h, fk_r


def scene_contacts(spec: SceneSpec, state: EnvState, fk_h, fk_r,
                   vel_h=None, vel_r=None) -> con.ContactResult:
    link_pos = jnp.concatenate([fk_h.pos, fk_r.pos], 0)
    link_quat = jnp.concatenate([fk_h.quat, fk_r.quat], 0)
    if vel_h is not None:
        link_v = jnp.concatenate([vel_h.v, vel_r.v], 0)
        link_w = jnp.concatenate([vel_h.w, vel_r.w], 0)
    else:
        link_v = link_w = None
    return con.evaluate(spec.geoms, spec.pairs, link_pos, link_quat,
                        link_v, link_w,
                        p0=state.geom_p0, p1=state.geom_p1,
                        radius=state.geom_radius)


def _human_inertial(state: EnvState):
    return dict(mass=state.human["mass"], com=state.human["com"],
                inertia_diag=state.human["inertia_diag"])


def _prepare_targets(spec: SceneSpec, state: EnvState, action: jax.Array):
    """Pre-scan control-loop setup (env.py:85-129): clip + integrate the
    action onto joint targets with limit masking, tremor wobble, motor-array
    setup.  Shared by the per-env and batched take_step variants."""
    cfg = spec.cfg
    nr, nh = spec.robot.ndof, spec.human.ndof
    arm = np.asarray(spec.arm_dofs, np.int32)
    na = spec.action_robot_len

    action = jnp.clip(action, -1.0, 1.0) * 0.05
    action_robot = action[:na]
    t_new = state.t + 1

    # --- integrate robot joint targets with limit masking (env.py:115-118) ---
    rl, ru = spec.robot.dof_limits()
    rl, ru = jnp.asarray(rl)[arm], jnp.asarray(ru)[arm]
    limited = ru >= rl
    q_arm = state.robot_q[arm]
    a = action_robot
    for _ in range(spec.frame_skip):
        viol = limited & ((q_arm + a < rl) | (q_arm + a > ru))
        a = jnp.where(viol, 0.0, a)
        q_arm = q_arm + a
    robot_target = state.robot_q.at[arm].set(q_arm)

    # --- human targets: tremor wobble + co-control action (env.py:119-125) ---
    # The reference drives human motors from take_step only when the human is
    # co-controlled or has tremor (env.py:99,128-129); otherwise the reactive
    # PD installed at reset keeps holding the initial pose
    # (world_creation.py:152-157).
    hc = np.asarray(spec.human_controllable, np.int32) if spec.human_controllable else None
    thjp = state.target_human_joint_positions
    human_target = thjp
    is_tremor = state.human["impairment"] == IMP_TREMOR
    if hc is not None:
        if spec.human_control:
            a_h = action[na:na + len(spec.human_controllable)]
        else:
            a_h = jnp.zeros(len(spec.human_controllable), f32)
        hl = state.human["lower"][hc]
        hu = state.human["upper"][hc]
        q_h = state.human_q[hc]
        thjp_c = thjp[hc]
        tremor_sign = jnp.where(t_new % 2 == 0, 1.0, -1.0)
        for _ in range(spec.frame_skip):
            viol = (q_h + a_h < hl) | (q_h + a_h > hu)
            a_h = jnp.where(viol, 0.0, a_h)
            # tremor: servo target wobbles around the integrated centre
            wob = thjp_c + state.human["tremors"][hc] * tremor_sign
            q_h = jnp.where(is_tremor, wob, q_h) + a_h
            thjp_c = thjp_c + jnp.where(is_tremor, a_h, 0.0)
        apply = jnp.logical_or(is_tremor, spec.human_control)
        human_target = thjp.at[hc].set(jnp.where(apply, q_h, thjp[hc]))
        thjp = thjp.at[hc].set(jnp.where(is_tremor, thjp_c, thjp[hc]))

    # --- motor setups (env.py:127-129) ---
    r_kp = jnp.full(nr, cfg.robot_gains, f32)
    r_force = jnp.full(nr, cfg.robot_forces, f32)
    h_kp = state.human_motor_kp
    h_force = state.human_motor_force
    if hc is not None:
        apply = jnp.logical_or(is_tremor, spec.human_control)
        h_kp = h_kp.at[hc].set(jnp.where(apply, spec.human_gains, h_kp[hc]))
        h_force = h_force.at[hc].set(
            jnp.where(apply, spec.human_forces * state.human["strength"], h_force[hc]))
    return dict(t_new=t_new, robot_target=robot_target,
                human_target=human_target, thjp=thjp,
                r_kp=r_kp, r_force=r_force, h_kp=h_kp, h_force=h_force)


def take_step(spec: SceneSpec, state: EnvState, action: jax.Array,
              ) -> Tuple[EnvState, con.ContactResult, Any, Any]:
    """The env.py:85-142 control loop: returns (state', contacts, fk_h, fk_r).

    Contacts/FK are evaluated at the final post-step configuration, matching
    the reference's pattern of reading getContactPoints/getLinkState after
    the substep loop.
    """
    dt = spec.time_step
    pre = _prepare_targets(spec, state, action)
    t_new = pre["t_new"]
    robot_target = pre["robot_target"]
    human_target = pre["human_target"]
    thjp = pre["thjp"]
    r_kp, r_force = pre["r_kp"], pre["r_force"]
    h_kp, h_force = pre["h_kp"], pre["h_force"]
    r_active = jnp.asarray(spec.robot_active)
    h_active = state.human_active

    # --- frame_skip physics substeps (env.py:133-137) ---
    # Static FK caching: only descendants of the simulated dofs move during
    # the substep loop (fixed bases, frozen non-sim dofs) — one full FK up
    # front, then per-substep FK recomputes just those chains
    # (kin.fk_partial; e.g. 4 of 41 human links for Feeding).
    r_sim = tuple(sorted(set(spec.arm_dofs)))
    h_sim = spec.human_controllable
    r_moving = kin.moving_links(spec.robot, r_sim) if r_sim else np.zeros(0, np.int32)
    h_moving = kin.moving_links(spec.human, h_sim) if h_sim else np.zeros(0, np.int32)
    fk_r_cache = kin.fk(spec.robot, state.robot_q, state.robot_base_pos,
                        state.robot_base_quat)
    fk_h_cache = kin.fk(spec.human, state.human_q, state.human_base_pos,
                        state.human_base_quat, origin_xyz=state.human["origin_xyz"])

    def substep(carry, _):
        rq, rqd, hq, hqd, pvr, pvl, aux = carry
        fk_r = kin.fk_partial(spec.robot, rq, state.robot_base_pos,
                              state.robot_base_quat, fk_r_cache, r_moving)
        fk_h = kin.fk_partial(spec.human, hq, state.human_base_pos,
                              state.human_base_quat, fk_h_cache, h_moving,
                              origin_xyz=state.human["origin_xyz"])
        vel_r = kin.link_velocities(spec.robot, fk_r, rqd, dofs=r_sim)
        vel_h = kin.link_velocities(spec.human, fk_h, hqd, dofs=h_sim)
        c = con.evaluate(spec.geoms, spec.pairs,
                         jnp.concatenate([fk_h.pos, fk_r.pos], 0),
                         jnp.concatenate([fk_h.quat, fk_r.quat], 0),
                         jnp.concatenate([vel_h.v, vel_r.v], 0),
                         jnp.concatenate([vel_h.w, vel_r.w], 0),
                         p0=state.geom_p0, p1=state.geom_p1,
                         radius=state.geom_radius)
        Lh = spec.n_human_links
        tau_r = kin.link_wrenches_to_joint_torques(
            spec.robot, fk_r, c.link_force[Lh:], c.link_torque[Lh:], dofs=r_sim)
        tau_h = kin.link_wrenches_to_joint_torques(
            spec.human, fk_h, c.link_force[:Lh], c.link_torque[:Lh], dofs=h_sim)

        res_r = dyn.substep(
            spec.robot, rq, rqd, dt, jnp.asarray(spec.gravity_robot, f32),
            tau_ext=tau_r, active=r_active,
            motor_target=robot_target, motor_kp=r_kp, motor_force=r_force,
            limit_lower=jnp.asarray(spec.robot.dof_limits()[0]),
            limit_upper=jnp.asarray(spec.robot.dof_limits()[1]),
            # dedupe: 'both'-arm tasks duplicate dofs for single-arm robots
            # (env.py:97 robot_both_arm_joint_indices); duplicates would make
            # the reduced mass matrix singular
            fk_res=fk_r, sim_dofs=tuple(sorted(set(spec.arm_dofs))))
        res_h = dyn.substep(
            spec.human, hq, hqd, dt, jnp.asarray(spec.gravity_human, f32),
            tau_ext=tau_h, active=h_active,
            motor_target=human_target, motor_kp=h_kp, motor_force=h_force,
            limit_lower=state.human["lower"], limit_upper=state.human["upper"],
            fk_res=fk_h, inertial=_human_inertial(state),
            sim_dofs=spec.human_controllable)
        hq2, hqd2 = res_h.q, res_h.qd
        # learned pose-dependent limits (env.py:135-136): enforced when the
        # human arm is actively controlled
        if spec.human_control and spec.human_controllable:
            if 3 in spec.human_controllable:
                hq2, hqd2, pvr = arm_limits.enforce_realistic_limits(
                    hq2, hqd2, pvr, (3, 4, 5, 6), right=True)
            if 13 in spec.human_controllable:
                hq2, hqd2, pvl = arm_limits.enforce_realistic_limits(
                    hq2, hqd2, pvl, (13, 14, 15, 16), right=False)
        if spec.substep_hook is not None:
            aux = spec.substep_hook(spec, state, aux, fk_h, fk_r, dt)
        return (res_r.q, res_r.qd, hq2, hqd2, pvr, pvl, aux), None

    carry0 = (state.robot_q, state.robot_qd, state.human_q, state.human_qd,
              state.prev_valid_right, state.prev_valid_left, state.aux)
    (rq, rqd, hq, hqd, pvr, pvl, aux), _ = jax.lax.scan(
        substep, carry0, None, length=spec.frame_skip)

    state = state.replace(
        t=t_new, robot_q=rq, robot_qd=rqd, human_q=hq, human_qd=hqd,
        prev_valid_right=pvr, prev_valid_left=pvl,
        target_human_joint_positions=thjp, aux=aux)

    # final-configuration readbacks for rewards/obs
    fk_h, fk_r = scene_fk(spec, state)
    vel_h = kin.link_velocities(spec.human, fk_h, hqd)
    vel_r = kin.link_velocities(spec.robot, fk_r, rqd)
    contacts = scene_contacts(spec, state, fk_h, fk_r, vel_h, vel_r)
    return state, contacts, (fk_h, fk_r), (vel_h, vel_r)


def take_step_batched(spec: SceneSpec, states: EnvState, actions: jax.Array):
    """Batched take_step: the dynamics substep runs as one fused Pallas TPU
    kernel with the env batch on the LANE axis (ops/pallas_dynamics.py),
    eliminating the [B, links, 6, 6]-style padded intermediates that dominate
    the vmapped path.  FK for contacts, the contact pipeline, and task hooks
    stay vmapped XLA (they fuse well).  On non-TPU backends this falls back
    to vmap(take_step) — bit-identical semantics, no interpret-mode cost.

    states/actions have a leading env axis; returns the same structure as
    vmap(take_step)."""
    if jax.default_backend() != "tpu":
        return jax.vmap(lambda s, a: take_step(spec, s, a))(states, actions)

    from ..ops import pallas_dynamics as pdyn

    dt = spec.time_step
    B = actions.shape[0]
    pre = jax.vmap(lambda s, a: _prepare_targets(spec, s, a))(states, actions)

    r_sim = tuple(sorted(set(spec.arm_dofs)))
    h_sim = spec.human_controllable
    sdr = np.asarray(r_sim, np.int32)
    r_moving = kin.moving_links(spec.robot, r_sim) if r_sim else np.zeros(0, np.int32)
    h_moving = kin.moving_links(spec.human, h_sim) if h_sim else np.zeros(0, np.int32)

    fk_r_cache = jax.vmap(lambda s: kin.fk(spec.robot, s.robot_q,
                                           s.robot_base_pos, s.robot_base_quat))(states)
    fk_h_cache = jax.vmap(lambda s: kin.fk(spec.human, s.human_q,
                                           s.human_base_pos, s.human_base_quat,
                                           origin_xyz=s.human["origin_xyz"]))(states)

    def anchor_arrays(fk_cache, base_pos, base_quat, st):
        ps, qs = [], []
        for a in st.anchors:
            ps.append((base_pos if a < 0 else fk_cache.pos[:, a]).T)
            qs.append((base_quat if a < 0 else fk_cache.quat[:, a]).T)
        return jnp.concatenate(ps, 0), jnp.concatenate(qs, 0)

    # ---- hoisted batch-last kernel inputs (constant across substeps) ----
    str_r = pdyn.get_structure(spec.robot, r_sim)
    anc_r = anchor_arrays(fk_r_cache, states.robot_base_pos,
                          states.robot_base_quat, str_r)
    nsr = len(sdr)
    tgt_r = pre["robot_target"][:, sdr].T
    kp_r = pre["r_kp"][:, sdr].T
    cap_r = pre["r_force"][:, sdr].T
    ones_r = jnp.ones((nsr, B), f32)
    act_r = jnp.broadcast_to(
        jnp.asarray(spec.robot_active, f32)[sdr][:, None], (nsr, B))
    rl, ru = spec.robot.dof_limits()
    lo_r = jnp.broadcast_to(jnp.asarray(rl)[sdr][:, None], (nsr, B))
    hi_r = jnp.broadcast_to(jnp.asarray(ru)[sdr][:, None], (nsr, B))

    if h_sim:
        sdh = np.asarray(h_sim, np.int32)
        nsh = len(sdh)
        str_h = pdyn.get_structure(spec.human, h_sim)
        anc_h = anchor_arrays(fk_h_cache, states.human_base_pos,
                              states.human_base_quat, str_h)
        tgt_h = pre["human_target"][:, sdh].T
        kp_h = pre["h_kp"][:, sdh].T
        cap_h = pre["h_force"][:, sdh].T
        ones_h = jnp.ones((nsh, B), f32)
        act_h = states.human_active[:, sdh].T.astype(f32)
        lo_h = states.human["lower"][:, sdh].T
        hi_h = states.human["upper"][:, sdh].T
        hrel = str_h.rel
        T3 = lambda x: jnp.transpose(x[:, hrel], (1, 2, 0)).reshape(len(hrel) * 3, B)
        ox_h = T3(states.human["origin_xyz"])
        mass_h = states.human["mass"][:, hrel].T
        com_h = T3(states.human["com"])
        idiag_h = T3(states.human["inertia_diag"])

    Lh = spec.n_human_links

    r_rel = str_r.rel
    Rr = len(r_rel)

    def _unmarshal(bl, rel, ncomp):
        """[ncomp*R, B] batch-last kernel FK -> [B, R, ncomp] batch-first."""
        return jnp.transpose(bl.reshape(len(rel), ncomp, B), (2, 0, 1))

    # ---- batch-last loop (no substep hook): zero-transpose pipeline ----
    # FK kernels scatter into [L,3,B] link arrays; contacts/velocities/
    # wrench run batch-last (physics/batched.py); the wrench output is the
    # dynamics kernel's tau input directly.
    from ..physics import batched as pb

    fkh_bl = (jnp.transpose(fk_h_cache.pos, (1, 2, 0)),
              jnp.transpose(fk_h_cache.quat, (1, 2, 0)))
    fkr_bl = (jnp.transpose(fk_r_cache.pos, (1, 2, 0)),
              jnp.transpose(fk_r_cache.quat, (1, 2, 0)))
    p0_bl = jnp.transpose(states.geom_p0, (1, 2, 0))
    p1_bl = jnp.transpose(states.geom_p1, (1, 2, 0))
    rad_bl = states.geom_radius.T

    def substep_bl(carry, _):
        q_r, qd_r, q_h, qd_h, pvr, pvl, aux = carry
        pos_r_bl, quat_r_bl = pdyn.fk_batched(spec.robot, r_sim,
                                              anc_r[0], anc_r[1], q_r)
        rpos = fkr_bl[0].at[r_rel].set(pos_r_bl.reshape(Rr, 3, B))
        rquat = fkr_bl[1].at[r_rel].set(quat_r_bl.reshape(Rr, 4, B))
        if h_sim:
            pos_h_bl, quat_h_bl = pdyn.fk_batched(spec.human, h_sim,
                                                  anc_h[0], anc_h[1], q_h,
                                                  origin_xyz=ox_h)
            hpos = fkh_bl[0].at[hrel].set(pos_h_bl.reshape(len(hrel), 3, B))
            hquat = fkh_bl[1].at[hrel].set(quat_h_bl.reshape(len(hrel), 4, B))
        else:
            hpos, hquat = fkh_bl

        rv, rw = pb.link_velocities_b(spec.robot, r_sim, rpos, rquat, qd_r)
        if h_sim:
            hv, hw = pb.link_velocities_b(spec.human, h_sim, hpos, hquat, qd_h)
        else:
            hv = hw = jnp.zeros_like(hpos)
        c = pb.evaluate_batched(
            spec.geoms, spec.pairs,
            jnp.concatenate([hpos, rpos], 0), jnp.concatenate([hquat, rquat], 0),
            jnp.concatenate([hv, rv], 0), jnp.concatenate([hw, rw], 0),
            p0_bl, p1_bl, rad_bl)
        Lh_ = spec.n_human_links
        tau_r = pb.wrench_to_tau_b(spec.robot, r_sim, rpos, rquat,
                                   c.link_force[Lh_:], c.link_torque[Lh_:])
        q_r2, qd_r2 = pdyn.substep_batched(
            spec.robot, r_sim, dt, spec.gravity_robot,
            anc_r[0], anc_r[1], q_r, qd_r, tau_r,
            tgt_r, kp_r, ones_r, cap_r, act_r, lo_r, hi_r,
            pos_rel=pos_r_bl, quat_rel=quat_r_bl)
        if h_sim:
            tau_h = pb.wrench_to_tau_b(spec.human, h_sim, hpos, hquat,
                                       c.link_force[:Lh_], c.link_torque[:Lh_])
            q_h2, qd_h2 = pdyn.substep_batched(
                spec.human, h_sim, dt, spec.gravity_human,
                anc_h[0], anc_h[1], q_h, qd_h, tau_h,
                tgt_h, kp_h, ones_h, cap_h, act_h, lo_h, hi_h,
                mass=mass_h, com=com_h, idiag=idiag_h,
                pos_rel=pos_h_bl, quat_rel=quat_h_bl)
        else:
            q_h2, qd_h2 = q_h, qd_h
        if spec.human_control and h_sim:
            hq2_full = states.human_q.at[:, sdh].set(q_h2.T)
            hqd2_full = jnp.zeros_like(states.human_qd).at[:, sdh].set(qd_h2.T)
            if 3 in h_sim:
                hq2_full, hqd2_full, pvr = jax.vmap(
                    lambda q, qd, pv: arm_limits.enforce_realistic_limits(
                        q, qd, pv, (3, 4, 5, 6), right=True))(hq2_full, hqd2_full, pvr)
            if 13 in h_sim:
                hq2_full, hqd2_full, pvl = jax.vmap(
                    lambda q, qd, pv: arm_limits.enforce_realistic_limits(
                        q, qd, pv, (13, 14, 15, 16), right=False))(hq2_full, hqd2_full, pvl)
            q_h2 = hq2_full[:, sdh].T
            qd_h2 = hqd2_full[:, sdh].T
        if spec.substep_hook_batched is not None:
            aux = spec.substep_hook_batched(spec, states, aux, hpos, hquat,
                                            rpos, rquat, p0_bl, p1_bl, rad_bl,
                                            c, dt)
        return (q_r2, qd_r2, q_h2, qd_h2, pvr, pvl, aux), None

    def substep(carry, _):
        q_r, qd_r, q_h, qd_h, pvr, pvl, aux = carry
        rqd_full = jnp.zeros_like(states.robot_qd).at[:, sdr].set(qd_r.T)
        hqd_full = (jnp.zeros_like(states.human_qd).at[:, sdh].set(qd_h.T)
                    if h_sim else jnp.zeros_like(states.human_qd))

        # FK of the moving chains in the kernel's batch-last layout; the
        # same poses feed both the contact pipeline (scattered into the
        # batch-first caches) and the dynamics kernel (directly).
        pos_r_bl, quat_r_bl = pdyn.fk_batched(spec.robot, r_sim,
                                              anc_r[0], anc_r[1], q_r)
        fk_r = kin.FK(
            fk_r_cache.pos.at[:, r_rel].set(_unmarshal(pos_r_bl, r_rel, 3)),
            fk_r_cache.quat.at[:, r_rel].set(_unmarshal(quat_r_bl, r_rel, 4)))
        if h_sim:
            pos_h_bl, quat_h_bl = pdyn.fk_batched(spec.human, h_sim,
                                                  anc_h[0], anc_h[1], q_h,
                                                  origin_xyz=ox_h)
            fk_h = kin.FK(
                fk_h_cache.pos.at[:, hrel].set(_unmarshal(pos_h_bl, hrel, 3)),
                fk_h_cache.quat.at[:, hrel].set(_unmarshal(quat_h_bl, hrel, 4)))
        else:
            fk_h = fk_h_cache

        vel_r = jax.vmap(lambda f_p, f_q, qd: kin.link_velocities(
            spec.robot, kin.FK(f_p, f_q), qd, dofs=r_sim))(fk_r.pos, fk_r.quat, rqd_full)
        vel_h = jax.vmap(lambda f_p, f_q, qd: kin.link_velocities(
            spec.human, kin.FK(f_p, f_q), qd, dofs=h_sim))(fk_h.pos, fk_h.quat, hqd_full)

        c = jax.vmap(lambda hp, hq_, rp, rq_, hv, hw, rv, rw, p0, p1, rad:
                     con.evaluate(spec.geoms, spec.pairs,
                                  jnp.concatenate([hp, rp], 0),
                                  jnp.concatenate([hq_, rq_], 0),
                                  jnp.concatenate([hv, rv], 0),
                                  jnp.concatenate([hw, rw], 0),
                                  p0=p0, p1=p1, radius=rad))(
            fk_h.pos, fk_h.quat, fk_r.pos, fk_r.quat,
            vel_h.v, vel_h.w, vel_r.v, vel_r.w,
            states.geom_p0, states.geom_p1, states.geom_radius)

        tau_r = jax.vmap(lambda f_p, f_q, lf, lt: kin.link_wrenches_to_joint_torques(
            spec.robot, kin.FK(f_p, f_q), lf, lt, dofs=r_sim))(
                fk_r.pos, fk_r.quat, c.link_force[:, Lh:], c.link_torque[:, Lh:])
        q_r2, qd_r2 = pdyn.substep_batched(
            spec.robot, r_sim, dt, spec.gravity_robot,
            anc_r[0], anc_r[1], q_r, qd_r, tau_r[:, sdr].T,
            tgt_r, kp_r, ones_r, cap_r, act_r, lo_r, hi_r,
            pos_rel=pos_r_bl, quat_rel=quat_r_bl)

        if h_sim:
            tau_h = jax.vmap(lambda f_p, f_q, lf, lt: kin.link_wrenches_to_joint_torques(
                spec.human, kin.FK(f_p, f_q), lf, lt, dofs=h_sim))(
                    fk_h.pos, fk_h.quat, c.link_force[:, :Lh], c.link_torque[:, :Lh])
            q_h2, qd_h2 = pdyn.substep_batched(
                spec.human, h_sim, dt, spec.gravity_human,
                anc_h[0], anc_h[1], q_h, qd_h, tau_h[:, sdh].T,
                tgt_h, kp_h, ones_h, cap_h, act_h, lo_h, hi_h,
                mass=mass_h, com=com_h, idiag=idiag_h,
                pos_rel=pos_h_bl, quat_rel=quat_h_bl)
        else:
            q_h2, qd_h2 = q_h, qd_h

        # learned pose-dependent limits (env.py:135-136)
        if spec.human_control and h_sim:
            hq2_full = states.human_q.at[:, sdh].set(q_h2.T)
            hqd2_full = jnp.zeros_like(states.human_qd).at[:, sdh].set(qd_h2.T)
            if 3 in h_sim:
                hq2_full, hqd2_full, pvr = jax.vmap(
                    lambda q, qd, pv: arm_limits.enforce_realistic_limits(
                        q, qd, pv, (3, 4, 5, 6), right=True))(hq2_full, hqd2_full, pvr)
            if 13 in h_sim:
                hq2_full, hqd2_full, pvl = jax.vmap(
                    lambda q, qd, pv: arm_limits.enforce_realistic_limits(
                        q, qd, pv, (13, 14, 15, 16), right=False))(hq2_full, hqd2_full, pvl)
            q_h2 = hq2_full[:, sdh].T
            qd_h2 = hqd2_full[:, sdh].T

        if spec.substep_hook is not None:
            aux = jax.vmap(lambda s, a, fhp, fhq, frp, frq: spec.substep_hook(
                spec, s, a, kin.FK(fhp, fhq), kin.FK(frp, frq), dt))(
                    states, aux, fk_h.pos, fk_h.quat, fk_r.pos, fk_r.quat)
        return (q_r2, qd_r2, q_h2, qd_h2, pvr, pvl, aux), None

    q_r0 = states.robot_q[:, sdr].T
    qd_r0 = states.robot_qd[:, sdr].T
    if h_sim:
        q_h0 = states.human_q[:, np.asarray(h_sim)].T
        qd_h0 = states.human_qd[:, np.asarray(h_sim)].T
    else:
        q_h0 = jnp.zeros((0, B), f32)
        qd_h0 = jnp.zeros((0, B), f32)
    carry0 = (q_r0, qd_r0, q_h0, qd_h0,
              states.prev_valid_right, states.prev_valid_left, states.aux)
    use_bl = (spec.substep_hook is None
              or spec.substep_hook_batched is not None)
    body = substep_bl if use_bl else substep
    (q_r, qd_r, q_h, qd_h, pvr, pvl, aux), _ = jax.lax.scan(
        body, carry0, None, length=spec.frame_skip)

    rq = states.robot_q.at[:, sdr].set(q_r.T)
    rqd = jnp.zeros_like(states.robot_qd).at[:, sdr].set(qd_r.T)
    if h_sim:
        hq = states.human_q.at[:, np.asarray(h_sim)].set(q_h.T)
        hqd = jnp.zeros_like(states.human_qd).at[:, np.asarray(h_sim)].set(qd_h.T)
    else:
        hq, hqd = states.human_q, jnp.zeros_like(states.human_qd)

    states = states.replace(
        t=pre["t_new"], robot_q=rq, robot_qd=rqd, human_q=hq, human_qd=hqd,
        prev_valid_right=pvr, prev_valid_left=pvl,
        target_human_joint_positions=pre["thjp"], aux=aux)

    # final-configuration readbacks (kernel FK + reduced velocities; qd is
    # exactly zero outside the sim dofs after the substep loop)
    pos_r_bl, quat_r_bl = pdyn.fk_batched(spec.robot, r_sim,
                                          anc_r[0], anc_r[1], q_r)
    fk_r = kin.FK(
        fk_r_cache.pos.at[:, r_rel].set(_unmarshal(pos_r_bl, r_rel, 3)),
        fk_r_cache.quat.at[:, r_rel].set(_unmarshal(quat_r_bl, r_rel, 4)))
    if h_sim:
        pos_h_bl, quat_h_bl = pdyn.fk_batched(spec.human, h_sim,
                                              anc_h[0], anc_h[1], q_h,
                                              origin_xyz=ox_h)
        fk_h = kin.FK(
            fk_h_cache.pos.at[:, hrel].set(_unmarshal(pos_h_bl, hrel, 3)),
            fk_h_cache.quat.at[:, hrel].set(_unmarshal(quat_h_bl, hrel, 4)))
    else:
        fk_h = fk_h_cache
    vel_h = jax.vmap(lambda f_p, f_q, qd: kin.link_velocities(
        spec.human, kin.FK(f_p, f_q), qd, dofs=h_sim))(fk_h.pos, fk_h.quat, hqd)
    vel_r = jax.vmap(lambda f_p, f_q, qd: kin.link_velocities(
        spec.robot, kin.FK(f_p, f_q), qd, dofs=r_sim))(fk_r.pos, fk_r.quat, rqd)
    contacts = jax.vmap(lambda s, fhp, fhq, frp, frq, vh, vr, wh, wr:
                        con.evaluate(spec.geoms, spec.pairs,
                                     jnp.concatenate([fhp, frp], 0),
                                     jnp.concatenate([fhq, frq], 0),
                                     jnp.concatenate([vh, vr], 0),
                                     jnp.concatenate([wh, wr], 0),
                                     p0=s.geom_p0, p1=s.geom_p1,
                                     radius=s.geom_radius))(
        states, fk_h.pos, fk_h.quat, fk_r.pos, fk_r.quat,
        vel_h.v, vel_r.v, vel_h.w, vel_r.w)
    return states, contacts, (fk_h, fk_r), (vel_h, vel_r)


# ------------------------------------------------------------ preference reward


def human_preferences(
    spec: SceneSpec,
    end_effector_velocity=0.0,
    total_force_on_human=0.0,
    tool_force_at_target=0.0,
    food_hit_human_reward=0.0,
    food_mouth_velocities_sum=0.0,
    dressing_force_sum=0.0,
    arm_manipulation_tool_pressures=0.0,
    arm_manipulation_forces=None,
):
    """Unified human-preference reward (env.py:203-239), batched scalars."""
    C = cfgmod.PREFERENCES
    reward_velocity = -end_effector_velocity
    reward_high_target_forces = jnp.where(
        tool_force_at_target < 10.0, 0.0, -tool_force_at_target)
    if spec.task in ("scooping", "feeding", "drinking"):
        reward_force_nontarget = -total_force_on_human
    elif spec.task == "arm_manipulation" and arm_manipulation_forces is not None:
        total, tool_sum = arm_manipulation_forces
        reward_force_nontarget = -(total - tool_sum)
    else:
        reward_force_nontarget = -(total_force_on_human - tool_force_at_target)
    reward_food_hit = food_hit_human_reward
    reward_food_vel = -food_mouth_velocities_sum
    reward_dressing = -dressing_force_sum
    reward_pressures = -arm_manipulation_tool_pressures
    return (C.velocity_weight * reward_velocity
            + C.force_nontarget_weight * reward_force_nontarget
            + C.high_forces_weight * reward_high_target_forces
            + C.food_hit_weight * reward_food_hit
            + C.food_velocities_weight * reward_food_vel
            + C.dressing_force_weight * reward_dressing
            + C.high_pressures_weight * reward_pressures)


# ------------------------------------------------------------ scene assembly


def compose_robot_with_tool(task: str, robot_name: str, left: bool = True):
    """Weld the task tool onto the robot's gripper (world_creation.py:308-346
    init_tool semantics, but as a kinematic-tree extension).

    Returns (model, tool_base_link, tool_tip_link, info)."""
    info = robots_mod.ROBOT_INFO[robot_name]
    model = robots_mod.load_robot(robot_name, arm_manipulation=(task == "arm_manipulation"))
    attach = robots_mod.TOOL_ATTACH.get((task, robot_name))
    if attach is None:
        return model, -1, -1, info
    pos, euler = attach
    quat = np.asarray(m3.quat_from_euler(jnp.asarray(euler, jnp.float32)))
    ee = info.ee_left if left else info.ee_right
    # tool masses from tool URDFs / reference createMultiBody calls
    tool_mass = {"scratch_itch": 0.11, "bed_bathing": 3.0, "feeding": 0.01,
                 "drinking": 0.01, "arm_manipulation": 0.0}[task]
    model = pm.attach_fixed(model, ee, "tool_base", pos, quat, mass=tool_mass,
                            inertia_diag=(1e-4, 1e-4, 1e-4))
    tool_base = model.nlinks - 1
    tip_off = {"scratch_itch": (0.075, 0.0, 0.0),   # tool_scratch.urdf tip
               "bed_bathing": (0.0, 0.0, -0.0425),  # wiper pad centre
               "feeding": (0.0, -0.05, -0.01),      # spoon bowl centre
               "drinking": (0.0, 0.06, 0.0),        # cup body frame offset
               "arm_manipulation": (0.0, 0.0, 0.0)}[task]
    tip_quat = (0.0, 0.0, 0.0, 1.0)
    if task == "drinking":
        # cup frame: multiplyTransforms(cup, [0,0.06,0], euler(pi/2,0,0))
        # (drinking.py:25)
        tip_quat = tuple(np.asarray(m3.quat_from_euler(
            jnp.asarray((math.pi / 2, 0.0, 0.0), jnp.float32))).tolist())
    model = pm.attach_fixed(model, tool_base, "tool_tip", tip_off, tip_quat)
    return model, tool_base, model.nlinks - 1, info


def link_reach_bound(robot, link: int) -> float:
    """Upper bound on ||link origin - base origin|| over ALL joint
    configurations: rotations preserve each joint-origin offset's norm, so
    the triangle inequality gives sum ||origin_xyz|| along the base->link
    chain; prismatic joints add their max travel.  Dominance over FK is
    property-tested in tests/test_tasks.py."""
    from ..physics import model as pmod
    r = 0.0
    while link >= 0:
        r += float(np.linalg.norm(robot.origin_xyz[link]))
        if robot.joint_type[link] == pmod.JOINT_PRISMATIC:
            r += float(max(abs(robot.lower[link]), abs(robot.upper[link])))
        link = int(robot.parent[link])
    return r


def furniture_pairs(geoms, cand_ids, furn_ids, group, *, robot=None,
                    base_pos=None, base_quat=None, default_q=None,
                    n_human_links=0, clearance=0.005):
    """Pair table rows between candidate (tool/robot-arm) capsules and the
    world-static furniture boxes (models/furniture.py; VERDICT round-1
    missing #3 — the reference loads furniture as rigid collision bodies,
    world_creation.py:35-53, feeding.py:124-131).

    When the robot base pose is static for the task (e.g. the
    wheelchair-mounted Jaco), pairs whose capsule already overlaps a
    furniture box at the reset configuration are dropped: the coarse
    capsule fit would otherwise inject permanent phantom forces that the
    reference's tighter convex meshes do not produce.

    Additionally (fixed-base case only), pairs the link can NEVER reach
    are dropped via a conservative chain-length bound: over every joint
    configuration, ||link_point - base|| <= sum of joint-origin offsets
    along the base->link chain (+ prismatic travel) + the capsule's local
    endpoint norm + radius.  A furniture box whose distance from the base
    exceeds that bound cannot contact the capsule in any pose, so the
    pair row is statically pruned from the narrowphase table."""
    import jax.numpy as jnp
    from ..physics import kinematics as kin

    keep_fn = None
    if robot is not None and base_pos is not None:
        def never_reaches(g, fg):
            l = g["link"] - n_human_links
            ends = [np.asarray(g.get("p0", (0, 0, 0)), np.float64),
                    np.asarray(g.get("p1", g.get("p0", (0, 0, 0))), np.float64)]
            reach = (link_reach_bound(robot, l)
                     + max(np.linalg.norm(e) for e in ends)
                     + g.get("radius", 0.0))
            c = np.asarray(fg["p0"], np.float64)
            h = np.asarray(fg["half"], np.float64)
            d = np.maximum(np.abs(np.asarray(base_pos, np.float64) - c) - h, 0.0)
            return np.sqrt((d ** 2).sum()) > reach + 0.02
        fk = kin.fk(robot, jnp.asarray(default_q, jnp.float32),
                    jnp.asarray(base_pos, jnp.float32),
                    jnp.asarray(base_quat, jnp.float32))
        pos, quat = np.asarray(fk.pos), np.asarray(fk.quat)

        def world_seg(g):
            l = g["link"] - n_human_links
            R = np.asarray(m3.quat_to_mat(jnp.asarray(quat[l])))
            w0 = pos[l] + R @ np.asarray(g.get("p0", (0, 0, 0)), np.float64)
            w1 = pos[l] + R @ np.asarray(
                g.get("p1", g.get("p0", (0, 0, 0))), np.float64)
            return w0, w1

        def seg_box_clear(g, fg):
            w0, w1 = world_seg(g)
            ts = np.linspace(0, 1, 17)
            p = w0[None] + ts[:, None] * (w1 - w0)[None]
            c = np.asarray(fg["p0"], np.float64)
            h = np.asarray(fg["half"], np.float64)
            d = np.maximum(np.abs(p - c[None]) - h[None], 0.0)
            return np.sqrt((d ** 2).sum(-1)).min() - g.get("radius", 0.0)

        keep_fn = lambda g, fg: (seg_box_clear(g, fg) > clearance
                                 and not never_reaches(g, fg))

    pairs = []
    for ci in cand_ids:
        for fi in furn_ids:
            if keep_fn is not None and not keep_fn(geoms[ci], geoms[fi]):
                continue
            pairs.append(dict(a=ci, b=fi, kind=1, group=group))
    return pairs


def transform_point_on_link(fk_res, link, local_pos):
    """p.multiplyTransforms(link_pos, link_orient, local, identity) parity."""
    return fk_res.pos[link] + m3.quat_rotate(fk_res.quat[link], local_pos)


def default_robot_q(robot, info, task: str, robot_name: str) -> jax.Array:
    """reset_robot_joints (env.py:241-255) + gripper open position, as the
    starting dof vector; gripper and non-arm dofs stay frozen there."""
    rq = jnp.zeros(robot.ndof, f32)
    for idx_list, defaults in ((info.arm_left, info.default_left),
                               (info.arm_right, info.default_right)):
        for l, v in zip(idx_list, defaults or ()):
            rq = rq.at[int(robot.dof_index[l])].set(v)
    gopen = robots_mod.GRIPPER_OPEN.get((task, robot_name))
    if gopen is not None:
        for side in (info.gripper_left, info.gripper_right):
            for gl, sgn in zip(side, info.gripper_sign):
                rq = rq.at[int(robot.dof_index[gl])].set(gopen * sgn)
    return rq


def init_robot_q(spec: SceneSpec) -> jax.Array:
    return default_robot_q(spec.robot, spec.info, spec.task, spec.robot_name)


def settle_human(spec: SceneSpec, state: EnvState, sim_dofs, n_steps: int,
                 dt: float, gravity=(0.0, 0.0, -1.0)):
    """Let the human settle under gravity against the scene (bed tasks).

    Re-creates the reference's reset-time settle loops
    (bed_bathing.py:126-141, arm_manipulation.py:116-147): run n_steps
    physics substeps with the given human dofs free (no motors), scene
    contacts active, robot frozen.  Returns (human_q, human_qd).

    This is the reset-time hot loop (200-250 substeps per bed-task reset),
    so it diverges from take_step's exact pipeline in two TPU-motivated,
    carefully-bounded ways: (1) the pair table is statically cut to rows
    touching a human link — bitwise identical human torques, since penalty
    pairs are independent and only human-link wrenches are read back; (2)
    the mass-matrix solve uses Jacobi-PCG instead of batched Cholesky
    (dynamics._pcg_solve — ~1e-6 relative difference, pinned by test),
    because vmapped small Cholesky serialises on TPU (measured ~130 ms per
    [4096,40,40] factor+solve: the whole settle cost 26-32 s of every
    bed/armman train update before this, ~85% of update wall time).
    """
    lower, upper = state.human["lower"], state.human["upper"]
    Lh = spec.n_human_links
    # AGT_SETTLE_SOLVER=chol restores the exact round-3 settle (used by
    # tools/bench_reset.py to measure the PCG win on silicon)
    solver = os.environ.get("AGT_SETTLE_SOLVER", "cg")
    if solver == "chol":
        pairs_h = spec.pairs
    else:
        # static prune: drop (robot x furniture/self) rows — dead work here
        pairs_h = spec.pairs.involving_links(spec.geoms, 0, Lh)
    # the robot is frozen throughout: its FK is loop-invariant
    fk_r = kin.fk(spec.robot, state.robot_q, state.robot_base_pos,
                  state.robot_base_quat)
    zeros_r = jnp.zeros_like(fk_r.pos)
    inertial = _human_inertial(state)

    def body(carry, _):
        hq, hqd = carry
        fk_h = kin.fk(spec.human, hq, state.human_base_pos, state.human_base_quat,
                      origin_xyz=state.human["origin_xyz"])
        vel_h = kin.link_velocities(spec.human, fk_h, hqd)
        c = con.evaluate(spec.geoms, pairs_h,
                         jnp.concatenate([fk_h.pos, fk_r.pos], 0),
                         jnp.concatenate([fk_h.quat, fk_r.quat], 0),
                         jnp.concatenate([vel_h.v, zeros_r], 0),
                         jnp.concatenate([vel_h.w, zeros_r], 0),
                         p0=state.geom_p0, p1=state.geom_p1,
                         radius=state.geom_radius)
        tau_h = kin.link_wrenches_to_joint_torques(
            spec.human, fk_h, c.link_force[:Lh], c.link_torque[:Lh])
        res = dyn.substep(
            spec.human, hq, hqd, dt, jnp.asarray(gravity, f32),
            tau_ext=tau_h, limit_lower=lower, limit_upper=upper,
            fk_res=fk_h, inertial=inertial, sim_dofs=sim_dofs,
            solver=solver)
        return (res.q, res.qd), None

    (hq, hqd), _ = jax.lax.scan(body, (state.human_q, state.human_qd),
                                None, length=n_steps)
    return hq, hqd


def transform_points_on_link(fk_res, link, local_points):
    """Batch of local points -> world, on one link (multiplyTransforms loop
    in update_targets, bed_bathing.py:232-245)."""
    return fk_res.pos[link][None] + m3.quat_rotate(fk_res.quat[link][None],
                                                   local_points)


def set_human_joint_angles(spec: SceneSpec, hq, pairs_deg):
    """Set human joint angles by PYBULLET JOINT (=link) index, converting to
    dof index (the fixed waist link 24 shifts dofs for links >= 25)."""
    di = spec.human.dof_index
    for link, deg in pairs_deg:
        hq = hq.at[int(di[link])].set(math.radians(deg))
    return hq
