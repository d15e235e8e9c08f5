"""Batched forward kinematics, link velocities, Jacobians, wrench mapping.

TPU-native replacement for PyBullet's getLinkState / calculateJacobian
(reference call sites: assistive_gym/envs/scratch_itch.py:65-88,
env.py:331-335, util.py:29,50).  One FK pass yields all link frames; the
loop over links is unrolled at trace time (topology is static), so XLA fuses
the whole chain into one fused kernel per batch.  `vmap` supplies the env
batch axis.

Frames: link frame = child frame of the link's joint (URDF convention).  The
human model is built with inertial frames at the link origin
(human_creation.py:179-180), so link frame origin == PyBullet's
linkWorldPosition for the human; compiled robot specs carry explicit coms.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import math3d as m3
from .model import ArticulatedModel, JOINT_PRISMATIC, JOINT_REVOLUTE


class FK(NamedTuple):
    pos: jnp.ndarray    # f32[L,3] link frame origin, world
    quat: jnp.ndarray   # f32[L,4] link frame orientation, world (xyzw)


def fk(model: ArticulatedModel, q: jnp.ndarray,
       base_pos: jnp.ndarray, base_quat: jnp.ndarray) -> FK:
    """World pose of every link. q: f32[ndof]."""
    dof_index = model.dof_index
    pos_list, quat_list = [], []
    for i in range(model.nlinks):
        p = model.parent[i]
        pp, pq = (base_pos, base_quat) if p < 0 else (pos_list[p], quat_list[p])
        jp = pp + m3.quat_rotate(pq, jnp.asarray(model.origin_xyz[i]))
        jq = m3.quat_mul(pq, jnp.asarray(model.origin_quat[i]))
        d = int(dof_index[i])
        if d >= 0:
            axis = jnp.asarray(model.axis[i])
            if model.joint_type[i] == JOINT_REVOLUTE:
                jq = m3.quat_mul(jq, m3.quat_from_axis_angle(axis, q[d]))
            elif model.joint_type[i] == JOINT_PRISMATIC:
                jp = jp + m3.quat_rotate(jq, axis * q[d])
        pos_list.append(jp)
        quat_list.append(jq)
    return FK(jnp.stack(pos_list), jnp.stack(quat_list))


class LinkVel(NamedTuple):
    v: jnp.ndarray      # f32[L,3] linear velocity of link frame origin, world
    w: jnp.ndarray      # f32[L,3] angular velocity, world


def link_velocities(model: ArticulatedModel, fk_res: FK, qd: jnp.ndarray,
                    base_v: Optional[jnp.ndarray] = None,
                    base_w: Optional[jnp.ndarray] = None) -> LinkVel:
    """Propagate joint rates down the tree. qd: f32[ndof]."""
    zeros = jnp.zeros(3, dtype=fk_res.pos.dtype)
    bv = zeros if base_v is None else base_v
    bw = zeros if base_w is None else base_w
    dof_index = model.dof_index
    v_list, w_list = [], []
    for i in range(model.nlinks):
        p = model.parent[i]
        if p < 0:
            pv, pw, pp = bv, bw, jnp.zeros(3, dtype=fk_res.pos.dtype)
        else:
            pv, pw, pp = v_list[p], w_list[p], fk_res.pos[p]
        r = fk_res.pos[i] - pp
        v = pv + jnp.cross(pw, r)
        w = pw
        d = int(dof_index[i])
        if d >= 0:
            axis_w = m3.quat_rotate(fk_res.quat[i], jnp.asarray(model.axis[i]))
            if model.joint_type[i] == JOINT_REVOLUTE:
                w = w + axis_w * qd[d]
            else:  # prismatic
                v = v + axis_w * qd[d]
        v_list.append(v)
        w_list.append(w)
    return LinkVel(jnp.stack(v_list), jnp.stack(w_list))


def world_axes(model: ArticulatedModel, fk_res: FK) -> jnp.ndarray:
    """f32[ndof,3]: world-frame joint axis per dof."""
    dl = model.dof_links
    axes = []
    for i in dl:
        axes.append(m3.quat_rotate(fk_res.quat[i], jnp.asarray(model.axis[i])))
    return jnp.stack(axes)


def point_jacobian(model: ArticulatedModel, fk_res: FK,
                   link: int, point_world: jnp.ndarray) -> jnp.ndarray:
    """Geometric Jacobian f32[6,ndof] of a world point rigidly attached to
    `link`: rows 0-2 linear, 3-5 angular (PyBullet calculateJacobian parity,
    reference env.py:332-335)."""
    # ancestors of `link` (static python set — topology is static)
    anc = set()
    i = link
    while i >= 0:
        anc.add(i)
        i = int(model.parent[i])
    dl = model.dof_links
    cols = []
    for d, li in enumerate(dl):
        li = int(li)
        if li not in anc:
            cols.append(jnp.zeros(6, dtype=fk_res.pos.dtype))
            continue
        axis_w = m3.quat_rotate(fk_res.quat[li], jnp.asarray(model.axis[li]))
        if model.joint_type[li] == JOINT_REVOLUTE:
            lin = jnp.cross(axis_w, point_world - fk_res.pos[li])
            ang = axis_w
        else:
            lin = axis_w
            ang = jnp.zeros(3, dtype=axis_w.dtype)
        cols.append(jnp.concatenate([lin, ang]))
    return jnp.stack(cols, axis=1)


def link_wrenches_to_joint_torques(
    model: ArticulatedModel, fk_res: FK,
    force: jnp.ndarray, torque: jnp.ndarray,
) -> jnp.ndarray:
    """Map per-link world wrenches (force f32[L,3] applied at link origin,
    torque f32[L,3]) to generalised joint torques f32[ndof].

    Backward accumulation over the tree: each link's accumulated wrench is
    projected onto its joint axis then shifted to the parent.  This replaces
    Bullet's internal external-force plumbing and is how contact forces reach
    the arm dynamics.
    """
    L = model.nlinks
    dof_index = model.dof_index
    acc_f = [force[i] for i in range(L)]
    acc_t = [torque[i] for i in range(L)]
    tau = [jnp.zeros(()) for _ in range(model.ndof)]
    for i in range(L - 1, -1, -1):
        d = int(dof_index[i])
        if d >= 0:
            axis_w = m3.quat_rotate(fk_res.quat[i], jnp.asarray(model.axis[i]))
            if model.joint_type[i] == JOINT_REVOLUTE:
                tau[d] = jnp.dot(axis_w, acc_t[i])
            else:
                tau[d] = jnp.dot(axis_w, acc_f[i])
        p = int(model.parent[i])
        if p >= 0:
            r = fk_res.pos[i] - fk_res.pos[p]
            acc_f[p] = acc_f[p] + acc_f[i]
            acc_t[p] = acc_t[p] + acc_t[i] + jnp.cross(r, acc_f[i])
    return jnp.stack(tau)
