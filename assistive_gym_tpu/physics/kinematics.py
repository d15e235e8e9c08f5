"""Batched forward kinematics, link velocities, Jacobians, wrench mapping.

TPU-native replacement for PyBullet's getLinkState / calculateJacobian
(reference call sites: assistive_gym/envs/scratch_itch.py:65-88,
env.py:331-335, util.py:29,50).

Design for the XLA compilation model: tree recursions are NOT unrolled into
deep dependent op-chains (XLA's CPU backend compiles those superlinearly and
TPU fusion gains nothing from them).  Instead:

  * FK — inherently a product of transforms along each chain — runs as one
    lax.scan over links in topological order with dynamic parent gathers:
    O(1) compile cost in link count, and under vmap each scan step is a
    wide batched op.
  * Everything else exploits the world-origin spatial formulation: motion
    subspaces simply ADD along kinematic chains, so link velocities,
    Jacobians and wrench->torque maps are dense matmuls against STATIC
    ancestor/subtree 0/1 masks — exactly the shape the MXU wants.

Frames: link frame = child frame of the link's joint (URDF convention).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import math3d as m3
from .model import ArticulatedModel, JOINT_PRISMATIC, JOINT_REVOLUTE


class FK(NamedTuple):
    pos: jnp.ndarray    # f32[L,3] link frame origin, world
    quat: jnp.ndarray   # f32[L,4] link frame orientation, world (xyzw)


def _masks(model: ArticulatedModel):
    """Static incidence masks (host, cached on the model via id)."""
    key = "_mask_cache"
    cache = getattr(model, key, None)
    if cache is not None:
        return cache
    L = model.nlinks
    dl = model.dof_links
    n = model.ndof
    anc = np.zeros((L, L), np.float32)       # anc[i,k]=1 if k is ancestor-or-self of i
    for i in range(L):
        k = i
        while k >= 0:
            anc[i, k] = 1.0
            k = int(model.parent[k])
    anc_dof = anc[:, dl]                     # [L, ndof]
    subtree_dof = anc[:, dl].T               # [ndof, L]: link i in subtree of dof d
    dof_anc_dof = anc[dl][:, dl]             # [ndof, ndof]: [j,k]=1 if k anc-or-self j
    # NUMPY arrays only — jnp constants may not cross jit traces, and
    # numpy-dependent callers (_rel_links, moving_links) need host values
    cache = (anc_dof, subtree_dof, dof_anc_dof)
    object.__setattr__(model, key, cache)
    return cache


def moving_links(model: ArticulatedModel, dofs) -> np.ndarray:
    """Static link subset whose world pose depends on the dofs in `dofs`:
    descendants-or-self of those dofs' links, in topological order.  With a
    fixed base, every other link's pose is constant while only `dofs` move —
    the basis for caching static FK across substeps (e.g. Feeding simulates
    4 head dofs: 4 of the human's 41 links move)."""
    key = "_moving_links_cache"
    cache = getattr(model, key, None)
    if cache is None:
        cache = {}
        object.__setattr__(model, key, cache)
    tkey = tuple(int(d) for d in np.asarray(dofs).tolist())
    if tkey not in cache:
        if not hasattr(model, "_mask_cache"):
            _masks(model)
        subtree_dof_np = np.asarray(getattr(model, "_mask_cache")[1])
        sub = subtree_dof_np[np.asarray(tkey, np.int32)]
        cache[tkey] = np.nonzero(sub.sum(0) > 0)[0].astype(np.int32)
    return cache[tkey]


def fk(model: ArticulatedModel, q: jnp.ndarray,
       base_pos: jnp.ndarray, base_quat: jnp.ndarray,
       origin_xyz: Optional[jnp.ndarray] = None) -> FK:
    """World pose of every link via one scan over links. q: f32[ndof].

    `origin_xyz` optionally overrides the model's static joint offsets with a
    traced per-env array (gender-dependent human dimensions are sampled per
    reset in the reference, world_creation.py:56-57, so they must be dynamic
    under vmap)."""
    f32 = q.dtype
    L = model.nlinks
    ox = jnp.asarray(model.origin_xyz, f32) if origin_xyz is None else origin_xyz
    oq = jnp.asarray(model.origin_quat, f32)
    axis = jnp.asarray(model.axis, f32)
    parent = jnp.asarray(model.parent + 1, jnp.int32)       # shift: 0 = base
    is_rev = jnp.asarray(model.joint_type == JOINT_REVOLUTE)
    is_pri = jnp.asarray(model.joint_type == JOINT_PRISMATIC)
    dof_index = jnp.asarray(np.maximum(model.dof_index, 0), jnp.int32)
    has_dof = jnp.asarray(model.dof_index >= 0)

    pos_buf = jnp.zeros((L + 1, 3), f32).at[0].set(base_pos)
    quat_buf = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0], f32), (L + 1, 1))
    quat_buf = quat_buf.at[0].set(base_quat)

    def body(carry, i):
        pos_buf, quat_buf = carry
        p = parent[i]
        pp = pos_buf[p]
        pq = quat_buf[p]
        jp = pp + m3.quat_rotate(pq, ox[i])
        jq = m3.quat_mul(pq, oq[i])
        qi = jnp.where(has_dof[i], q[dof_index[i]], 0.0)
        rot = m3.quat_from_axis_angle(axis[i], jnp.where(is_rev[i], qi, 0.0))
        jq = m3.quat_mul(jq, rot)
        jp = jp + jnp.where(is_pri[i], qi, 0.0) * m3.quat_rotate(jq, axis[i])
        return (pos_buf.at[i + 1].set(jp), quat_buf.at[i + 1].set(jq)), None

    # unroll=8: fuses 8 links per kernel launch — long enough to amortise
    # dispatch, short enough to avoid XLA's superlinear deep-chain compile
    (pos_buf, quat_buf), _ = jax.lax.scan(
        body, (pos_buf, quat_buf), jnp.arange(L, dtype=jnp.int32), unroll=8)
    return FK(pos_buf[1:], quat_buf[1:])


def fk_partial(model: ArticulatedModel, q: jnp.ndarray,
               base_pos: jnp.ndarray, base_quat: jnp.ndarray,
               cache: FK, links: np.ndarray,
               origin_xyz: Optional[jnp.ndarray] = None) -> FK:
    """FK recomputing only the static subset `links` (topologically ordered,
    see moving_links); every other link keeps its pose from `cache`.

    Exact when `cache` was computed with the same base pose and the same
    values of all dofs NOT on the chains of `links` — the situation inside
    take_step's substep loop, where only the simulated dofs change (the
    reference's mass=0 freeze, world_creation.py:140-144)."""
    f32 = q.dtype
    L = model.nlinks
    links = np.asarray(links, np.int32)
    if len(links) >= L:  # nothing static to reuse
        return fk(model, q, base_pos, base_quat, origin_xyz=origin_xyz)
    ox = jnp.asarray(model.origin_xyz, f32) if origin_xyz is None else origin_xyz
    oq = jnp.asarray(model.origin_quat, f32)
    axis = jnp.asarray(model.axis, f32)
    parent = jnp.asarray(model.parent + 1, jnp.int32)
    is_rev = jnp.asarray(model.joint_type == JOINT_REVOLUTE)
    is_pri = jnp.asarray(model.joint_type == JOINT_PRISMATIC)
    dof_index = jnp.asarray(np.maximum(model.dof_index, 0), jnp.int32)
    has_dof = jnp.asarray(model.dof_index >= 0)

    pos_buf = jnp.concatenate([base_pos[None], cache.pos], 0)
    quat_buf = jnp.concatenate([base_quat[None], cache.quat], 0)

    def body(carry, i):
        pos_buf, quat_buf = carry
        p = parent[i]
        pp = pos_buf[p]
        pq = quat_buf[p]
        jp = pp + m3.quat_rotate(pq, ox[i])
        jq = m3.quat_mul(pq, oq[i])
        qi = jnp.where(has_dof[i], q[dof_index[i]], 0.0)
        rot = m3.quat_from_axis_angle(axis[i], jnp.where(is_rev[i], qi, 0.0))
        jq = m3.quat_mul(jq, rot)
        jp = jp + jnp.where(is_pri[i], qi, 0.0) * m3.quat_rotate(jq, axis[i])
        return (pos_buf.at[i + 1].set(jp), quat_buf.at[i + 1].set(jq)), None

    (pos_buf, quat_buf), _ = jax.lax.scan(
        body, (pos_buf, quat_buf), jnp.asarray(links, jnp.int32), unroll=8)
    return FK(pos_buf[1:], quat_buf[1:])


def motion_subspace(model: ArticulatedModel, fk_res: FK, dofs=None) -> jnp.ndarray:
    """f32[ndof,6]: world-origin motion subspace per dof: [omega; v_O].

    revolute axis a through point p: S = [a; p x a]; prismatic: S = [0; a].
    Fully parallel over dofs (no chain dependence).  `dofs`: optional static
    dof-index subset — tasks simulate only the dofs that can move (the
    reference freezes everything else via the mass=0 trick), shrinking every
    downstream matrix.
    """
    dl = np.asarray(model.dof_links)
    if dofs is not None:
        dl = dl[np.asarray(dofs)]
    a = m3.quat_rotate(fk_res.quat[dl], jnp.asarray(model.axis[dl]))
    p = fk_res.pos[dl]
    rev = jnp.asarray((model.joint_type[dl] == JOINT_REVOLUTE))[:, None]
    w = jnp.where(rev, a, 0.0)
    v = jnp.where(rev, jnp.cross(p, a), a)
    return jnp.concatenate([w, v], -1)


class LinkVel(NamedTuple):
    v: jnp.ndarray      # f32[L,3] linear velocity of link frame origin, world
    w: jnp.ndarray      # f32[L,3] angular velocity, world
    spatial: jnp.ndarray  # f32[L,6] world-origin spatial velocity [omega; v_O]


def link_velocities(model: ArticulatedModel, fk_res: FK, qd: jnp.ndarray,
                    base_v: Optional[jnp.ndarray] = None,
                    base_w: Optional[jnp.ndarray] = None,
                    base_pos: Optional[jnp.ndarray] = None,
                    dofs=None) -> LinkVel:
    """v_spatial[i] = sum_{dofs k on the chain to i} S_k qd_k: one matmul.

    `dofs`: optional static subset of dofs with (possibly) nonzero qd — the
    contraction shrinks to those columns; qd is still indexed full-length."""
    anc_dof, _, _ = _masks(model)
    if dofs is not None:
        d = np.asarray(dofs, np.int32)
        S = motion_subspace(model, fk_res, d)          # [k,6]
        v_sp = jnp.asarray(anc_dof[:, d]) @ (S * qd[d][:, None])    # [L,6]
    else:
        S = motion_subspace(model, fk_res)             # [n,6]
        v_sp = jnp.asarray(anc_dof) @ (S * qd[:, None])             # [L,6]
    if base_v is not None or base_w is not None:
        f32 = fk_res.pos.dtype
        bv = jnp.zeros(3, f32) if base_v is None else base_v
        bw = jnp.zeros(3, f32) if base_w is None else base_w
        bp = jnp.zeros(3, f32) if base_pos is None else base_pos
        # spatial velocity of the base body expressed at the world origin
        base_sp = jnp.concatenate([bw, bv - jnp.cross(bw, bp)])
        v_sp = v_sp + base_sp[None, :]
    w = v_sp[:, :3]
    v = v_sp[:, 3:] + jnp.cross(w, fk_res.pos)
    return LinkVel(v, w, v_sp)


def point_jacobian(model: ArticulatedModel, fk_res: FK,
                   link: int, point_world: jnp.ndarray) -> jnp.ndarray:
    """Geometric Jacobian f32[6,ndof] of a world point rigidly attached to
    `link`: rows 0-2 linear, 3-5 angular (PyBullet calculateJacobian parity,
    reference env.py:332-335)."""
    anc_dof, _, _ = _masks(model)
    S = motion_subspace(model, fk_res)                 # [n,6]
    mask = anc_dof[link]                               # [n]
    Sm = S * mask[:, None]
    ang = Sm[:, :3]                                    # [n,3]
    lin = Sm[:, 3:] + jnp.cross(ang, point_world[None, :])
    return jnp.concatenate([lin.T, ang.T], 0)


def link_wrenches_to_joint_torques(
    model: ArticulatedModel, fk_res: FK,
    force: jnp.ndarray, torque: jnp.ndarray,
    dofs=None,
) -> jnp.ndarray:
    """Map per-link world wrenches (force f32[L,3] applied at the link origin,
    torque f32[L,3]) to generalised joint torques f32[ndof]:
    tau = S . (subtree-sum of origin-shifted spatial forces) — two matmuls.
    This is how contact forces reach the arm dynamics.

    `dofs`: optional static subset — only those rows are computed (the rest
    of the returned full-length vector is zero), matching substep's sim_dofs
    reduction."""
    _, subtree_dof, _ = _masks(model)
    n_O = torque + jnp.cross(fk_res.pos, force)        # shift torque to origin
    f_sp = jnp.concatenate([n_O, force], -1)           # [L,6]
    if dofs is not None:
        d = np.asarray(dofs, np.int32)
        S = motion_subspace(model, fk_res, d)          # [k,6]
        acc = jnp.asarray(subtree_dof[d]) @ f_sp                    # [k,6]
        return jnp.zeros(model.ndof, f_sp.dtype).at[d].set(jnp.sum(S * acc, -1))
    S = motion_subspace(model, fk_res)                 # [n,6]
    acc = jnp.asarray(subtree_dof) @ f_sp                           # [n,6]
    return jnp.sum(S * acc, -1)
