"""Pallas TPU kernel: fused articulated-dynamics substep.

The hot op of the whole framework (SURVEY.md §2.2 N1): per physics substep,
per body, the engine solves

    (M(q) + D dt) qdd = tau_ext - bias(q, qd) - D qd
    qd' = qd + dt qdd  (+ PD motor impulses, force-capped)
    q'  = q + dt qd'   (+ hard joint-limit projection)

The XLA formulation (physics/dynamics.py) spends its time materialising
[B, R, 6, 6]-shaped intermediates whose trailing dims pad to the TPU's
(8, 128) tiles — a 20-30x memory blowup.  This kernel instead puts the env
batch on the LANE axis: every quantity is a [B_blk] vector registerised in
VMEM, and the entire tree algebra (composite inertias, RNEA sweeps, the
n x n Cholesky solve) unrolls at trace time over the STATIC kinematic
structure into pure element-wise VPU ops.  One HBM read of the inputs, one
write of (q', qd') — nothing else touches memory.

Mathematical form: spatial inertia about the world origin is carried as its
10 structured components (m, h = m c, I_O sym 3x3) instead of a dense 6x6 —
composites are componentwise sums down the tree, and the inertia action on a
motion vector [w; v] is

    I_sp [w; v] = [I_O w + h x v;  m v - h x w]

which matches the dense blocks [[I_O, hx],[hx^T, m 1]] used by
physics/dynamics.py:_spatial_inertia_origin (same Plücker [omega; v_O]
coordinates).

The kernel is generated per (model, sim_dofs, flags) and cached; CPU tests
run it in interpreter mode (pl.pallas_call(..., interpret=True)).
"""
from __future__ import annotations

import functools
import hashlib
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..physics.model import (ArticulatedModel, JOINT_PRISMATIC,
                             JOINT_REVOLUTE)

f32 = jnp.float32


# --------------------------------------------------------------- small algebra
# All helpers operate on "vec3"/"quat" = python lists of [B_blk] arrays (or
# python floats for static values); everything stays element-wise on lanes.

def _cross(a, b):
    return [a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0]]


def _add3(a, b):
    return [a[0] + b[0], a[1] + b[1], a[2] + b[2]]


def _sub3(a, b):
    return [a[0] - b[0], a[1] - b[1], a[2] - b[2]]


def _scale3(s, a):
    return [s * a[0], s * a[1], s * a[2]]


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _quat_rotate(q, v):
    """Rotate vec3 v (components [B] or float) by quat q=[x,y,z,w] of [B]s."""
    qv = q[:3]
    t = _scale3(2.0, _cross(qv, v))
    return _add3(v, _add3(_scale3(q[3], t), _cross(qv, t)))


def _quat_to_mat(q):
    """3x3 rotation entries (list of lists) from quat components."""
    x, y, z, w = q
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return [[1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)],
            [2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)],
            [2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)]]


def _static_quat_to_mat(q):
    x, y, z, w = (float(v) for v in q)
    return np.array([[1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                     [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                     [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])


_SYM = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))


def _sym_apply(I6, v):
    """Apply symmetric 3x3 (6 packed comps, order _SYM) to vec3."""
    a, b, c, d, e, g = I6
    return [a * v[0] + b * v[1] + c * v[2],
            b * v[0] + d * v[1] + e * v[2],
            c * v[0] + e * v[1] + g * v[2]]


# ----------------------------------------------------------------- the factory

class _Structure:
    """Static per-(model, sim_dofs) tree structure for kernel generation."""

    def __init__(self, model: ArticulatedModel, sim_dofs):
        from ..physics.kinematics import _masks
        sd = np.asarray(sim_dofs, np.int32)
        anc_dof, subtree_dof, dof_anc = _masks(model)
        rel = np.nonzero(np.asarray(subtree_dof)[sd].sum(0) > 0)[0].astype(np.int32)
        self.sd = sd
        self.rel = rel
        self.ns = len(sd)
        self.R = len(rel)
        rel_pos = {int(l): i for i, l in enumerate(rel)}
        dl_full = np.asarray(model.dof_links)
        # per rel link: parent slot in rel (-1 root), sim-dof slot (-1 none)
        self.parent_slot = []
        self.dof_slot = []
        dof_of_link = {int(dl_full[d]): k for k, d in enumerate(sd)}
        for l in rel:
            p = int(model.parent[l])
            self.parent_slot.append(rel_pos.get(p, -1))
            self.dof_slot.append(dof_of_link.get(int(l), -1))
        # per sim dof: rel slot of its link, static axis, joint type, damping
        self.dof_link_slot = [rel_pos[int(dl_full[d])] for d in sd]
        self.axis = [tuple(float(v) for v in model.axis[dl_full[d]]) for d in sd]
        self.jtype = [int(model.joint_type[dl_full[d]]) for d in sd]
        self.damping = [float(model.damping[dl_full[d]]) for d in sd]
        # dof-ancestry mask among sim dofs (k anc-or-self of j)
        self.danc = np.asarray(dof_anc)[np.ix_(sd, sd)] > 0
        # static inertia params per rel link
        self.mass_s = [float(model.mass[l]) for l in rel]
        self.com_s = [tuple(float(v) for v in model.com[l]) for l in rel]
        self.idiag_s = [tuple(float(v) for v in model.inertia_diag[l]) for l in rel]
        self.Rp = [_static_quat_to_mat(model.inertia_quat[l]) for l in rel]
        # ---- in-kernel FK structure ----
        # anchors: distinct STATIC parents of subtree-root rel links; their
        # world poses are kernel inputs (constant across the substep loop)
        anchors = []
        self.anchor_slot = []          # per rel link: anchor index or -1
        for i, l in enumerate(rel):
            if self.parent_slot[i] < 0:
                p = int(model.parent[l])
                if p not in anchors:
                    anchors.append(p)
                self.anchor_slot.append(anchors.index(p))
            else:
                self.anchor_slot.append(-1)
        self.anchors = anchors         # link ids; -1 possible (base itself)
        self.A = len(anchors)
        # per rel link FK params: joint origin + axis in child frame
        self.fk_origin_xyz = [tuple(float(v) for v in model.origin_xyz[l]) for l in rel]
        self.fk_origin_quat = [tuple(float(v) for v in model.origin_quat[l]) for l in rel]
        self.fk_axis = [tuple(float(v) for v in model.axis[l]) for l in rel]
        self.fk_jtype = [int(model.joint_type[l]) for l in rel]
        self.fk_dof_slot = list(self.dof_slot)   # same mapping


def _quat_mul(q1, q2):
    """Hamilton product, xyzw component lists (floats or [B] arrays)."""
    x1, y1, z1, w1 = q1
    x2, y2, z2, w2 = q2
    return [w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2]


def _fk_unrolled(st: _Structure, q, anc_pos_a, anc_quat_a, ox_a):
    """Unrolled FK over the moving subtrees (shared by both kernels).
    Returns (pos, quat): lists of component lists per rel link."""
    R = st.R
    pos = [None] * R
    quat = [None] * R
    for l in range(R):
        ps = st.parent_slot[l]
        if ps >= 0:
            pp, pq = pos[ps], quat[ps]
        else:
            a = st.anchor_slot[l]
            pp = [anc_pos_a[3 * a + c] for c in range(3)]
            pq = [anc_quat_a[4 * a + c] for c in range(4)]
        if ox_a is not None:
            ox = [ox_a[3 * l + c] for c in range(3)]
        else:
            ox = list(st.fk_origin_xyz[l])
        jp = _add3(pp, _quat_rotate(pq, ox))
        jq = _quat_mul(pq, list(st.fk_origin_quat[l]))
        k = st.fk_dof_slot[l]
        if k >= 0 and st.fk_jtype[l] == JOINT_REVOLUTE:
            half = 0.5 * q[k]
            s, c = jnp.sin(half), jnp.cos(half)
            ax = st.fk_axis[l]
            jq = _quat_mul(jq, [ax[0] * s, ax[1] * s, ax[2] * s, c])
        elif k >= 0 and st.fk_jtype[l] == JOINT_PRISMATIC:
            jp = _add3(jp, _scale3(q[k], _quat_rotate(jq, list(st.fk_axis[l]))))
        pos[l], quat[l] = jp, jq
    return pos, quat


def _build_fk_kernel(st: _Structure, dynamic_origin: bool, n_in: int):
    """FK-only kernel: (anc_pos [3A,B], anc_quat [4A,B], q [ns,B],
    [origin_xyz [3R,B]]) -> (pos [3R,B], quat [4R,B])."""
    ns, R = st.ns, st.R

    def kernel(*refs):
        ins = refs[:n_in]
        pos_ref, quat_ref = refs[n_in], refs[n_in + 1]
        anc_pos_a, anc_quat_a, q_a = ins[0][:], ins[1][:], ins[2][:]
        ox_a = ins[3][:] if dynamic_origin else None
        q = [q_a[i] for i in range(ns)]
        pos, quat = _fk_unrolled(st, q, anc_pos_a, anc_quat_a, ox_a)
        pos_ref[:] = jnp.stack([pos[l][c] for l in range(R) for c in range(3)], 0)
        quat_ref[:] = jnp.stack([quat[l][c] for l in range(R) for c in range(4)], 0)

    return kernel


def _build_kernel(st: _Structure, dt: float, gravity, dynamic_inertial: bool,
                  dynamic_origin: bool, n_in: int, fk_inside: bool = True):
    """Generate the kernel body. Ref layout (all [rows, B_blk] f32):
      0 anc_pos  [3A, B]  world poses of the static parents of the moving
      1 anc_quat [4A, B]  subtrees (constant across the whole substep loop)
                          — OR, when fk_inside=False, precomputed rel-link
                          poses pos [3R,B] / quat [4R,B] from the FK kernel
      2 q      [ns, B]
      3 qd     [ns, B]
      4 tau    [ns, B]
      5 target [ns, B]
      6 kp     [ns, B]
      7 kd     [ns, B]
      8 cap    [ns, B]   force cap * motor-on mask
      9 act    [ns, B]   1.0 = dof simulated & free, 0.0 = frozen
     10 lo     [ns, B]
     11 hi     [ns, B]
     [+ origin_xyz [3R, B]] when dynamic_origin and fk_inside
     [+ mass [R,B], com [3R,B], idiag [3R,B]] when dynamic_inertial
     outputs: q' [ns,B], qd' [ns,B]
    """
    ns, R = st.ns, st.R
    gx, gy, gz = (float(v) for v in gravity)

    def kernel(*refs):
        ins = refs[:n_in]
        qout_ref, qdout_ref = refs[n_in], refs[n_in + 1]
        (in0_ref, in1_ref, q_ref, qd_ref, tau_ref, tgt_ref, kp_ref,
         kd_ref, cap_ref, act_ref, lo_ref, hi_ref) = ins[:12]
        nxt = 12
        if dynamic_origin and fk_inside:
            ox_a = ins[nxt][:]
            nxt += 1
        else:
            ox_a = None
        if dynamic_inertial:
            mass_a, com_a, idiag_a = ins[nxt][:], ins[nxt + 1][:], ins[nxt + 2][:]
        in0_a, in1_a = in0_ref[:], in1_ref[:]
        q_a, qd_a = q_ref[:], qd_ref[:]
        tau_a, tgt_a = tau_ref[:], tgt_ref[:]
        kp_a, kd_a, cap_a, act_a = kp_ref[:], kd_ref[:], cap_ref[:], act_ref[:]
        lo_a, hi_a = lo_ref[:], hi_ref[:]

        q = [q_a[i] for i in range(ns)]
        qd = [qd_a[i] for i in range(ns)]

        if fk_inside:
            pos, quat = _fk_unrolled(st, q, in0_a, in1_a, ox_a)
        else:
            pos = [[in0_a[3 * l + c] for c in range(3)] for l in range(R)]
            quat = [[in1_a[4 * l + c] for c in range(4)] for l in range(R)]

        # ---- per rel link: structured spatial inertia about the origin ----
        m_l, h_l, I_l = [], [], []
        for l in range(R):
            if dynamic_inertial:
                m = mass_a[l]
                com = [com_a[3 * l + c] for c in range(3)]
                idiag = [idiag_a[3 * l + c] for c in range(3)]
            else:
                m = st.mass_s[l]
                com = list(st.com_s[l])
                idiag = list(st.idiag_s[l])
            Rl = _quat_to_mat(quat[l])
            Rp = st.Rp[l]
            # Rw = Rl @ Rp (Rp static; drop negligible static terms)
            Rw = [[sum(Rl[a][b] * Rp[b, c] for b in range(3)
                       if abs(Rp[b, c]) > 1e-12) for c in range(3)]
                  for a in range(3)]
            # rotated com offset -> world com
            cw = _add3(pos[l], _quat_rotate(quat[l], com))
            # I about com, world axes: sum_k idiag_k Rw[:,k] Rw[:,k]^T
            Icm = [sum(idiag[k] * Rw[i][k] * Rw[j][k] for k in range(3))
                   for (i, j) in _SYM]
            # shift to origin: I_O = Icm + m ((c.c) 1 - c c^T)
            cc = _dot3(cw, cw)
            IO = [Icm[s] + m * ((cc if i == j else 0.0) - cw[i] * cw[j])
                  for s, (i, j) in enumerate(_SYM)]
            m_l.append(m)
            h_l.append(_scale3(m, cw))
            I_l.append(IO)

        # ---- motion subspaces (world) per sim dof ----
        S_w, S_v = [], []
        for k in range(ns):
            ls = st.dof_link_slot[k]
            a_w = _quat_rotate(quat[ls], list(st.axis[k]))
            if st.jtype[k] == JOINT_REVOLUTE:
                S_w.append(a_w)
                S_v.append(_cross(pos[ls], a_w))
            else:                      # prismatic: S = [0; a]
                S_w.append([jnp.zeros_like(a_w[0])] * 3)
                S_v.append(a_w)

        # ---- CRBA: composite inertias by reverse accumulation ----
        mc = list(m_l)
        hc = [list(h) for h in h_l]
        Ic = [list(I) for I in I_l]
        for l in range(R - 1, -1, -1):
            p = st.parent_slot[l]
            if p >= 0:
                mc[p] = mc[p] + mc[l]
                hc[p] = _add3(hc[p], hc[l])
                Ic[p] = [Ic[p][s] + Ic[l][s] for s in range(6)]

        # F_j = I_comp(dof_link(j)) S_j ; M[k,j] = S_k . F_j
        M = [[None] * ns for _ in range(ns)]
        for j in range(ns):
            ls = st.dof_link_slot[j]
            Ft = _add3(_sym_apply(Ic[ls], S_w[j]), _cross(hc[ls], S_v[j]))
            Fb = _sub3(_scale3(mc[ls], S_v[j]), _cross(hc[ls], S_w[j]))
            for k in range(ns):
                # M symmetric; fill k<=j from ancestry (k anc-or-self of j)
                if st.danc[j][k] or st.danc[k][j] or k == j:
                    M[k][j] = _dot3(S_w[k], Ft) + _dot3(S_v[k], Fb)
        for k in range(ns):
            for j in range(ns):
                if M[k][j] is None:
                    M[k][j] = jnp.zeros_like(q[0])
        # symmetrise exactly like dynamics.crba: keep the (k anc of j) upper,
        # mirror it
        for k in range(ns):
            for j in range(ns):
                if not st.danc[j][k]:          # k not anc-or-self of j
                    M[k][j] = M[j][k]

        # ---- RNEA bias: forward velocity/acceleration sweep ----
        v_w = [None] * R
        v_v = [None] * R
        a_w = [None] * R
        a_v = [None] * R
        zero = jnp.zeros_like(q[0])
        for l in range(R):
            p = st.parent_slot[l]
            pw = v_w[p] if p >= 0 else [zero] * 3
            pv = v_v[p] if p >= 0 else [zero] * 3
            paw = a_w[p] if p >= 0 else [zero] * 3
            # base fictitious acceleration a0 = [0; -g] (dynamics.rnea_bias)
            pav = a_v[p] if p >= 0 else [zero - gx, zero - gy, zero - gz]
            k = st.dof_slot[l]
            if k >= 0:
                Sqd_w = _scale3(qd[k], S_w[k])
                Sqd_v = _scale3(qd[k], S_v[k])
                v_w[l] = _add3(pw, Sqd_w)
                v_v[l] = _add3(pv, Sqd_v)
                # coriolis: parent spatial vel x S qd  (motion cross)
                cw_ = _cross(pw, Sqd_w)
                cv_ = _add3(_cross(pw, Sqd_v), _cross(pv, Sqd_w))
                a_w[l] = _add3(paw, cw_)
                a_v[l] = _add3(pav, cv_)
            else:
                v_w[l], v_v[l] = pw, pv
                a_w[l], a_v[l] = paw, pav

        # net force per link: f = I a + v x* (I v)
        f_t = [None] * R
        f_b = [None] * R
        for l in range(R):
            pt = _add3(_sym_apply(I_l[l], v_w[l]), _cross(h_l[l], v_v[l]))
            pb = _sub3(_scale3(m_l[l], v_v[l]), _cross(h_l[l], v_w[l]))
            it = _add3(_sym_apply(I_l[l], a_w[l]), _cross(h_l[l], a_v[l]))
            ib = _sub3(_scale3(m_l[l], a_v[l]), _cross(h_l[l], a_w[l]))
            f_t[l] = _add3(it, _add3(_cross(v_w[l], pt), _cross(v_v[l], pb)))
            f_b[l] = _add3(ib, _cross(v_w[l], pb))
        # reverse composite force sum; bias[k] = S_k . f_comp(dof_link k)
        for l in range(R - 1, -1, -1):
            p = st.parent_slot[l]
            if p >= 0:
                f_t[p] = _add3(f_t[p], f_t[l])
                f_b[p] = _add3(f_b[p], f_b[l])
        bias = [(_dot3(S_w[k], f_t[st.dof_link_slot[k]])
                 + _dot3(S_v[k], f_b[st.dof_link_slot[k]])) for k in range(ns)]

        # ---- assemble and solve (M_act + damping dt) qdd = rhs ----
        act = [act_a[i] for i in range(ns)]
        A = [[None] * ns for _ in range(ns)]
        for k in range(ns):
            for j in range(ns):
                A[k][j] = M[k][j] * (act[k] * act[j])
            A[k][k] = (A[k][k] + (1.0 - act[k])
                       + st.damping[k] * dt * act[k] + 1e-8)
        rhs = [(tau_a[k] - bias[k] - st.damping[k] * qd[k]) * act[k]
               for k in range(ns)]

        # unrolled Cholesky A = L L^T, then forward/back substitution
        L = [[None] * ns for _ in range(ns)]
        for j in range(ns):
            s = A[j][j]
            for t in range(j):
                s = s - L[j][t] * L[j][t]
            Ljj = jnp.sqrt(jnp.maximum(s, 1e-12))
            L[j][j] = Ljj
            inv = 1.0 / Ljj
            for i in range(j + 1, ns):
                s = A[i][j]
                for t in range(j):
                    s = s - L[i][t] * L[j][t]
                L[i][j] = s * inv
        y = [None] * ns
        for i in range(ns):
            s = rhs[i]
            for t in range(i):
                s = s - L[i][t] * y[t]
            y[i] = s / L[i][i]
        qdd = [None] * ns
        for i in range(ns - 1, -1, -1):
            s = y[i]
            for t in range(i + 1, ns):
                s = s - L[t][i] * qdd[t]
            qdd[i] = s / L[i][i]

        # ---- integrate + PD motor impulses + hard limits ----
        q_new, qd_new = [], []
        for k in range(ns):
            qd1 = qd[k] + dt * qdd[k] * act[k]
            m_app = A[k][k]
            v_err = kp_a[k] * (tgt_a[k] - q[k]) / dt - kd_a[k] * qd1
            lam = jnp.clip(m_app * v_err, -cap_a[k] * dt, cap_a[k] * dt)
            qd1 = qd1 + act[k] * lam / m_app
            # velocity clamp (matches dynamics.substep stability guard)
            qd1 = jnp.clip(qd1, -12.0, 12.0)
            q1 = q[k] + dt * qd1 * act[k]
            limited = hi_a[k] >= lo_a[k]
            q_cl = jnp.clip(q1, lo_a[k], hi_a[k])
            hit = limited & (q_cl != q1)
            q1 = jnp.where(limited, q_cl, q1)
            qd1 = jnp.where(hit, 0.0, qd1)
            q_new.append(q1)
            qd_new.append(qd1 * act[k])

        qout_ref[:] = jnp.stack(q_new, 0)
        qdout_ref[:] = jnp.stack(qd_new, 0)

    return kernel


def _pallas_apply(kernel, rows, out_rows, block_b, interpret):
    """Wrap a row-major batch-last kernel in a padded, grid-blocked call."""

    def apply(*args):
        B = args[2].shape[-1]
        nb = -(-B // block_b)
        Bp = nb * block_b
        if Bp != B:
            args = tuple(jnp.pad(a, ((0, 0), (0, Bp - B))) for a in args)
        in_specs = [pl.BlockSpec((r, block_b), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
                    for r in rows]
        out_specs = [pl.BlockSpec((r, block_b), lambda i: (0, i),
                                  memory_space=pltpu.VMEM) for r in out_rows]
        outs = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=[jax.ShapeDtypeStruct((r, Bp), f32) for r in out_rows],
            interpret=interpret,
        )(*args)
        return tuple(o[:, :B] for o in outs)

    return jax.jit(apply)


@functools.lru_cache(maxsize=None)
def _get_substep(model_key, sim_dofs, dt, gravity, dynamic_inertial,
                 dynamic_origin, block_b, interpret, fk_inside=True):
    st = _structure_cached(model_key, sim_dofs)
    ns, R, A = st.ns, st.R, st.A
    n_in = (12 + (1 if (dynamic_origin and fk_inside) else 0)
            + (3 if dynamic_inertial else 0))
    kernel = _build_kernel(st, dt, gravity, dynamic_inertial, dynamic_origin,
                           n_in, fk_inside=fk_inside)

    rows = ([3 * A, 4 * A] if fk_inside else [3 * R, 4 * R]) + [ns] * 10
    if dynamic_origin and fk_inside:
        rows += [3 * R]
    if dynamic_inertial:
        rows += [R, 3 * R, 3 * R]
    return _pallas_apply(kernel, rows, [ns, ns], block_b, interpret), st


@functools.lru_cache(maxsize=None)
def _get_fk(model_key, sim_dofs, dynamic_origin, block_b, interpret):
    st = _structure_cached(model_key, sim_dofs)
    ns, R, A = st.ns, st.R, st.A
    n_in = 3 + (1 if dynamic_origin else 0)
    kernel = _build_fk_kernel(st, dynamic_origin, n_in)
    rows = [3 * A, 4 * A, ns] + ([3 * R] if dynamic_origin else [])
    return _pallas_apply(kernel, rows, [3 * R, 4 * R], block_b, interpret), st


def _auto_block(R: int) -> int:
    """Largest lane-block that keeps the unrolled kernel's live values inside
    the ~16 MB VMEM budget (measured ~450 B/lane per rel link; the PR2
    dual-arm system, R=47, OOMs at 1024 lanes but fits at 512)."""
    for blk in (1024, 512, 256, 128):
        if 450 * R * blk <= 12 * 1024 * 1024:
            return blk
    return 128


def fk_batched(model, sim_dofs, anc_pos, anc_quat, q_sd, origin_xyz=None,
               block_b: Optional[int] = None, interpret: Optional[bool] = None):
    """Batched FK over the moving subtrees: returns (pos [3R,B], quat [4R,B])
    in rel-link row-major layout (l*3+c / l*4+c)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block_b is None:
        block_b = _auto_block(get_structure(model, sim_dofs).R)
    fn, st = _get_fk(_model_key(model), tuple(int(d) for d in sim_dofs),
                     origin_xyz is not None, block_b, bool(interpret))
    args = [anc_pos, anc_quat, q_sd] + ([origin_xyz] if origin_xyz is not None else [])
    return fn(*args)


_MODEL_REGISTRY = {}


def _model_key(model: ArticulatedModel) -> str:
    """Content fingerprint of the static model arrays, so rebuilt-but-
    identical ArticulatedModel instances (every task build() creates fresh
    ones) share cached structures and compiled kernels instead of leaking
    one registry entry + kernel set per instance (ADVICE.md round-1 #4)."""
    cached = getattr(model, "_pallas_key", None)
    if cached is not None:
        return cached
    h = hashlib.sha1()
    h.update(model.name.encode())
    for arr in (model.parent, model.joint_type, model.origin_xyz,
                model.origin_quat, model.axis, model.lower, model.upper,
                model.damping, model.mass, model.com, model.inertia_diag,
                model.inertia_quat):
        h.update(np.ascontiguousarray(arr).tobytes())
    key = f"{model.name}:{model.nlinks}:{h.hexdigest()[:16]}"
    _MODEL_REGISTRY[key] = model
    object.__setattr__(model, "_pallas_key", key)   # frozen dataclass
    return key


@functools.lru_cache(maxsize=None)
def _structure_cached(model_key, sim_dofs) -> "_Structure":
    return _Structure(_MODEL_REGISTRY[model_key], sim_dofs)


def get_structure(model: ArticulatedModel, sim_dofs) -> _Structure:
    """Static structure (rel links, anchors) for marshalling by callers."""
    return _structure_cached(_model_key(model), tuple(int(d) for d in sim_dofs))


def substep_batched(
    model: ArticulatedModel,
    sim_dofs: Tuple[int, ...],
    dt: float,
    gravity: Tuple[float, float, float],
    # dynamic inputs, env-batch LAST ([rows, B]); see _build_kernel layout
    anc_pos: jnp.ndarray, anc_quat: jnp.ndarray,
    q_sd: jnp.ndarray, qd_sd: jnp.ndarray,
    tau: jnp.ndarray, target: jnp.ndarray,
    kp: jnp.ndarray, kd: jnp.ndarray, cap: jnp.ndarray, act: jnp.ndarray,
    lo: jnp.ndarray, hi: jnp.ndarray,
    origin_xyz: Optional[jnp.ndarray] = None,
    mass: Optional[jnp.ndarray] = None,
    com: Optional[jnp.ndarray] = None,
    idiag: Optional[jnp.ndarray] = None,
    pos_rel: Optional[jnp.ndarray] = None,
    quat_rel: Optional[jnp.ndarray] = None,
    block_b: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched fused dynamics substep (FK + CRBA + RNEA + solve + PD +
    limits) for the sim-dof subsystem.

    anc_pos/anc_quat: world poses of the moving subtrees' static parents
    ([3A,B]/[4A,B], see get_structure().anchors; anchor id -1 = body base),
    constant across a control step.  Alternatively pass pos_rel/quat_rel
    ([3R,B]/[4R,B] from fk_batched) to skip the in-kernel FK — the layout
    used when the same poses also feed the contact pipeline.  Returns
    (q', qd') of shape [ns, B].  Semantics match physics/dynamics.substep
    on the same reduced system.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dyn_inertial = mass is not None
    dyn_origin = origin_xyz is not None
    fk_inside = pos_rel is None
    if block_b is None:
        st0 = get_structure(model, sim_dofs)
        block_b = _auto_block(st0.R)
    fn, st = _get_substep(_model_key(model), tuple(int(d) for d in sim_dofs),
                          float(dt), tuple(float(g) for g in gravity),
                          dyn_inertial, dyn_origin, block_b, bool(interpret),
                          fk_inside=fk_inside)
    in0, in1 = (anc_pos, anc_quat) if fk_inside else (pos_rel, quat_rel)
    args = [in0, in1, q_sd, qd_sd, tau, target, kp, kd, cap, act, lo, hi]
    if dyn_origin and fk_inside:
        args.append(origin_xyz)
    if dyn_inertial:
        args += [mass, com, idiag]
    return fn(*args)


def rel_links(model: ArticulatedModel, sim_dofs) -> np.ndarray:
    from ..physics.dynamics import _rel_links
    return _rel_links(model, np.asarray(sim_dofs))
