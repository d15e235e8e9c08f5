"""Batch-last (env-on-lanes) contact + velocity + wrench pipeline.

The substep loop's XLA portion originally ran per-env under vmap, where
every [B, P, 3]-shaped intermediate pads its trailing dims to the TPU's
(8, 128) tiles — a 30-40x memory blowup at the materialization points the
fusion can't absorb.  Here every quantity is laid out [rows..., B]: the
pair axis sits on sublanes, the env batch on lanes, so tiles are dense.
The layouts dovetail with ops/pallas_dynamics.py: the FK kernel's
[3R, B]/[4R, B] outputs scatter straight into the [L, 3, B] link-pose
arrays, and the wrench output [ns, B] is exactly the dynamics kernel's tau
input — the whole loop runs without a single transpose.

Supports all three pair kinds: seg-seg, seg-plane, and seg-box (the box
side restricted to world-static axis-aligned furniture,
models/furniture.py).  Semantics match contact.evaluate /
kinematics.link_velocities / link_wrenches_to_joint_torques.
"""
from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..physics import contact as con
from ..physics.kinematics import _masks

_EPS = 1e-9


def _c3(x):
    """[N, 3, B] -> list of 3 [N, B] components."""
    return [x[:, 0], x[:, 1], x[:, 2]]


def _s3(c):
    return jnp.stack(c, 1)          # -> [N, 3, B]


def _cross(a, b):
    return [a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0]]


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _add(a, b):
    return [a[0] + b[0], a[1] + b[1], a[2] + b[2]]


def _sub(a, b):
    return [a[0] - b[0], a[1] - b[1], a[2] - b[2]]


def _scale(s, a):
    return [s * a[0], s * a[1], s * a[2]]


def _quat_rotate(q, v):
    """q: list of 4 [N,B]; v: list of 3 ([N,B] or broadcastable)."""
    qv = q[:3]
    t = _scale(2.0, _cross(qv, v))
    return _add(v, _add(_scale(q[3], t), _cross(qv, t)))


def _onehot(idx, n):
    """Static one-hot selection matrix [len(idx), n] (f32)."""
    idx = np.asarray(idx, np.int64)
    m = np.zeros((len(idx), n), np.float32)
    m[np.arange(len(idx)), idx] = 1.0
    return jnp.asarray(m)


# Route the pair-table gathers/scatter-adds over the MXU as static one-hot
# matmuls instead of TPU gather/scatter ops.  Matched A/B on a quiet host
# (ext5 stage 0, docs/bench/bench_contact_{default,mm}_r5.jsonl):
#   feeding  171,850 -> 241,668 env-steps/s (+41%)
#   drinking  83,101 -> 113,459 env-steps/s (+37%)
# — the serialized scatter/gather rows were the narrowphase bottleneck the
# round-5 ablation measured at 67-69% of the drinking step.  Equivalence vs
# the gather/scatter path is pinned by test_evaluate_batched_matches (both
# paths).  AGT_CONTACT_MM=0 restores the native gather/scatter lowering.
# (A first reading that suggested a PR2 regression was confounded twice
# over: host contention, and the same slowdown reproduced on BOTH paths.)
_CONTACT_MM = os.environ.get("AGT_CONTACT_MM", "1") == "1"


def _mm(M, x):
    """Exact f32 selection/accumulation matmul: [R, N] @ [N, B] -> [R, B].

    HIGHEST precision keeps selection exact (1.0 * x with the bf16x-pass
    f32 emulation reconstructs x bit-for-bit; accumulation is f32)."""
    return jax.lax.dot(M, x, precision=jax.lax.Precision.HIGHEST)


def _mm3(M, comps):
    """_mm applied to a list of [N, B] components."""
    return [_mm(M, c) for c in comps]


class ContactB(NamedTuple):
    fn: jnp.ndarray           # [P, B]
    dist: jnp.ndarray         # [P, B]
    point: jnp.ndarray        # [P, 3, B]
    link_force: jnp.ndarray   # [L, 3, B]
    link_torque: jnp.ndarray  # [L, 3, B]
    group_fn: jnp.ndarray     # [ngroups, B]
    w0: jnp.ndarray           # [G, 3, B] world geom segments (reused by hooks)
    w1: jnp.ndarray


def evaluate_batched(
    gs: con.GeomSet,
    pt: con.PairTable,
    link_pos: jnp.ndarray,    # [L, 3, B]
    link_quat: jnp.ndarray,   # [L, 4, B]
    link_v: Optional[jnp.ndarray],   # [L, 3, B] linear velocity or None
    link_w: Optional[jnp.ndarray],   # [L, 3, B] angular velocity or None
    p0: jnp.ndarray,          # [G, 3, B] local geometry (per-env human dims)
    p1: jnp.ndarray,
    radius: jnp.ndarray,      # [G, B]
) -> ContactB:
    kinds = set(np.unique(pt.kind).tolist())
    assert kinds <= {0, 1, 2}, f"unsupported pair kinds {kinds}"
    if 1 in kinds:
        # batch-last seg-box is specialized to world-static axis-aligned
        # boxes (furniture: models/furniture.py); link-attached/rotated
        # boxes would need the oriented ternary of ops/collision.capsule_box
        box_b = pt.b[pt.kind == 1]
        assert (gs.link[box_b] < 0).all(), "kind-1 box side must be world-static"
        assert np.allclose(gs.quat[box_b], [0, 0, 0, 1]), \
            "kind-1 boxes must be axis-aligned"
    L = link_pos.shape[0]
    B = link_pos.shape[-1]
    f32 = link_pos.dtype

    # ---- world geoms ----
    gl = np.maximum(gs.link, 0)
    is_world = (gs.link < 0)
    if _CONTACT_MM:
        Mgl = _onehot(gl, L)
        lp = _mm3(Mgl, _c3(link_pos))
        lq = [_mm(Mgl, link_quat[:, c]) for c in range(4)]
    else:
        lp = _c3(link_pos[gl])
        lq = [link_quat[gl][:, c] for c in range(4)]
    if is_world.any():
        wmask = jnp.asarray(is_world, f32)[:, None]
        lp = [c * (1.0 - wmask) for c in lp]
        ident = jnp.asarray(is_world, f32)[:, None]
        lq = [q * (1.0 - ident) for q in lq[:3]] + [lq[3] * (1.0 - ident) + ident]
    w0 = _add(lp, _quat_rotate(lq, _c3(p0)))
    p1w = _add(lp, _quat_rotate(lq, _c3(p1)))
    n_w = _quat_rotate(lq, _c3(p1))              # plane normal: rotation only
    is_plane = (gs.gtype == con.GEOM_PLANE)
    if is_plane.any():
        pm = jnp.asarray(is_plane, f32)[:, None]
        w1 = [pm * n + (1.0 - pm) * p for n, p in zip(n_w, p1w)]
    else:
        w1 = p1w

    # ---- pair gathers ----
    ia, ib = pt.a, pt.b
    if _CONTACT_MM:
        G = len(gs.link)
        Ma, Mb = _onehot(ia, G), _onehot(ib, G)
        a0, a1, ra = _mm3(Ma, w0), _mm3(Ma, w1), _mm(Ma, radius)
        b0, b1, rb = _mm3(Mb, w0), _mm3(Mb, w1), _mm(Mb, radius)
    else:
        a0 = [c[ia] for c in w0]
        a1 = [c[ia] for c in w1]
        ra = radius[ia]
        b0 = [c[ib] for c in w0]
        b1 = [c[ib] for c in w1]
        rb = radius[ib]

    # ---- narrow phase: one contiguous pair slice per kind ----
    # the table is kind-sorted (contact.PairTable.build), so each
    # narrowphase runs only on its own rows and results concatenate —
    # computing every kind over the full table and mask-merging measured
    # ~3.5x slower (round-2 trace finding)
    def _seg_seg(A0, A1, RA, B0, B1, RB):
        d1 = _sub(A1, A0)
        d2 = _sub(B1, B0)
        r = _sub(A0, B0)
        A = _dot(d1, d1)
        e = _dot(d2, d2)
        f = _dot(d2, r)
        c_ = _dot(d1, r)
        b_ = _dot(d1, d2)
        denom = A * e - b_ * b_
        s = jnp.where(denom > _EPS,
                      jnp.clip((b_ * f - c_ * e) / jnp.maximum(denom, _EPS),
                               0.0, 1.0), 0.0)
        t = (b_ * s + f) / jnp.maximum(e, _EPS)
        t_cl = jnp.clip(t, 0.0, 1.0)
        s = jnp.where(t != t_cl,
                      jnp.clip((t_cl * b_ - c_) / jnp.maximum(A, _EPS),
                               0.0, 1.0), s)
        s = jnp.where(A <= _EPS, 0.0, s)
        t_cl = jnp.where(e <= _EPS, 0.0,
                         jnp.clip((b_ * s + f) / jnp.maximum(e, _EPS), 0.0, 1.0))
        pa = _add(A0, _scale(s, d1))
        pb = _add(B0, _scale(t_cl, d2))
        d = _sub(pa, pb)
        dn = jnp.sqrt(jnp.maximum(_dot(d, d), _EPS * _EPS))
        normal = [d[0] / dn, d[1] / dn, jnp.where(dn > _EPS, d[2] / dn, 1.0)]
        dist = dn - (RA + RB)
        off = RB + 0.5 * dist
        return dist, normal, _add(pb, _scale(off, normal))

    def _seg_plane(A0, A1, RA, B0, B1):
        # capsule vs half-space: B0 = plane point, B1 = unit normal
        plane_off = _dot(B0, B1)
        da0 = _dot(A0, B1) - plane_off
        da1 = _dot(A1, B1) - plane_off
        dmin = jnp.minimum(da0, da1)
        tp = jnp.where(da0 <= da1, 0.0, 1.0)
        pp = _add(A0, _scale(tp, _sub(A1, A0)))
        pr = _dot(pp, B1) - plane_off
        return dmin - RA, B1, _sub(pp, _scale(pr, B1))

    def _seg_aabb(A0, A1, RA, B0, HALF):
        # capsule vs world-static AABB: exact closest segment point (see
        # ops/collision.seg_box_t — the outside-distance half-derivative is
        # monotone piecewise-linear with breakpoints at the six slab-plane
        # crossings; bracket + one interpolation is exact), then point-AABB
        # gives dist/normal incl. the inside (negative) case
        seg = _sub(A1, A0)
        rel = _sub(A0, B0)                       # p(t) - centre = rel + t*seg

        def phi(t):
            u = [rc + t * sc for rc, sc in zip(rel, seg)]
            u = [uc - jnp.clip(uc, -hc, hc) for uc, hc in zip(u, HALF)]
            return _dot(seg, u)

        zeros = jnp.zeros_like(RA)
        cands = [zeros, zeros + 1.0]
        for c in range(3):
            live = jnp.abs(seg[c]) > _EPS
            safe = jnp.where(live, seg[c], 1.0)
            for sgn in (-1.0, 1.0):
                tc = (sgn * HALF[c] - rel[c]) / safe
                cands.append(jnp.clip(jnp.where(live, tc, 0.0), 0.0, 1.0))
        lo, hi = zeros, zeros + 1.0
        for t in cands:
            g = phi(t)
            lo = jnp.maximum(lo, jnp.where(g <= 0.0, t, 0.0))
            hi = jnp.minimum(hi, jnp.where(g >= 0.0, t, 1.0))
        glo, ghi = phi(lo), phi(hi)
        span = ghi - glo
        tb_ = lo - glo * (hi - lo) / jnp.where(span > _EPS, span, 1.0)
        tb_ = jnp.clip(tb_, jnp.minimum(lo, hi), jnp.maximum(lo, hi))
        tb_ = jnp.where(span > _EPS, tb_, lo)
        tb_ = jnp.where(lo <= hi, tb_, 0.5 * (lo + hi))
        p = _add(A0, _scale(tb_, seg))
        dax = [jnp.abs(pc - cc) - hc for pc, cc, hc in zip(p, B0, HALF)]
        sgn = [jnp.sign(pc - cc) for pc, cc in zip(p, B0)]
        qout = [jnp.maximum(c, 0.0) for c in dax]
        d_out = jnp.sqrt(jnp.maximum(_dot(qout, qout), _EPS * _EPS))
        d_in = jnp.maximum(jnp.maximum(dax[0], dax[1]), dax[2])
        outside = d_in > 0.0
        ax_in = [(dax[c] >= d_in - 1e-9).astype(d_out.dtype) for c in range(3)]
        ax_norm = jnp.maximum(ax_in[0] + ax_in[1] + ax_in[2], 1.0)
        n_out = [q * sg / d_out for q, sg in zip(qout, sgn)]
        n_in = [a_ / ax_norm * sg for a_, sg in zip(ax_in, sgn)]
        n_box = [jnp.where(outside, no, ni) for no, ni in zip(n_out, n_in)]
        dist = jnp.where(outside, d_out, d_in) - RA
        surf = [jnp.clip(pc, cc - hc, cc + hc)
                for pc, cc, hc in zip(p, B0, HALF)]
        return dist, n_box, _add(surf, _scale(0.5 * dist, n_box))

    parts = []
    for k, sl in pt.kind_slices():
        A0 = [c[sl] for c in a0]
        A1 = [c[sl] for c in a1]
        RA = ra[sl]
        B0 = [c[sl] for c in b0]
        if k == 0:
            parts.append(_seg_seg(A0, A1, RA, B0, [c[sl] for c in b1], rb[sl]))
        elif k == 2:
            parts.append(_seg_plane(A0, A1, RA, B0, [c[sl] for c in b1]))
        elif k == 1:
            HALF = [jnp.asarray(gs.half[pt.b[sl]][:, c], np.float32)[:, None]
                    for c in range(3)]
            parts.append(_seg_aabb(A0, A1, RA, B0, HALF))
        else:
            raise AssertionError(f"unknown pair kind {k}")
    if len(parts) == 1:
        dist, normal, point = parts[0]
    else:
        dist = jnp.concatenate([p[0] for p in parts], 0)
        bcast = lambda c, d: jnp.broadcast_to(c, d.shape)
        normal = [jnp.concatenate([bcast(p[1][c], p[0]) for p in parts], 0)
                  for c in range(3)]
        point = [jnp.concatenate([bcast(p[2][c], p[0]) for p in parts], 0)
                 for c in range(3)]

    # ---- contact velocities + penalty force (contact_force parity) ----
    la = np.maximum(gs.link[pt.a], 0)
    lb = np.maximum(gs.link[pt.b], 0)
    aw = jnp.asarray(gs.link[pt.a] < 0, f32)[:, None]   # [P,1] vs [P,B]
    bw = jnp.asarray(gs.link[pt.b] < 0, f32)[:, None]
    if _CONTACT_MM:
        Mla, Mlb = _onehot(la, L), _onehot(lb, L)
        sel_a = lambda x3: _mm3(Mla, _c3(x3))
        sel_b = lambda x3: _mm3(Mlb, _c3(x3))
    else:
        sel_a = lambda x3: _c3(x3[la])
        sel_b = lambda x3: _c3(x3[lb])

    def vel_at(sel, wmask, pts):
        if link_v is None:
            return [jnp.zeros_like(pts[0])] * 3
        v = sel(link_v)
        w = sel(link_w)
        arm = _sub(pts, sel(link_pos))
        vv = _add(v, _cross(w, arm))
        return [c * (1.0 - wmask) for c in vv]

    rel_vel = _sub(vel_at(sel_a, aw, point), vel_at(sel_b, bw, point))

    stiff = jnp.asarray(pt.stiffness)[:, None]
    damp = jnp.asarray(pt.damping)[:, None]
    fric = jnp.asarray(pt.friction)[:, None]
    depth = jnp.minimum(jnp.maximum(-dist, 0.0), 0.02)
    in_contact = (depth > 0.0).astype(f32)
    v_n = _dot(rel_vel, normal)
    fn = jnp.minimum(jnp.maximum(stiff * depth - damp * v_n, 0.0) * in_contact,
                     500.0)
    v_t = _sub(rel_vel, _scale(v_n, normal))
    v_t_norm = jnp.sqrt(jnp.maximum(_dot(v_t, v_t), 1e-8))
    f_t_mag = jnp.where(v_t_norm > 1e-4, fric * fn, 0.0)
    inv_vt = 1.0 / jnp.maximum(v_t_norm, 1e-4)
    force = _add(_scale(fn, normal),
                 _scale(-f_t_mag * inv_vt * in_contact, v_t))

    # ---- per-link wrench accumulation ----
    fa = [c * (1.0 - aw) for c in force]
    fb = [-c * (1.0 - bw) for c in force]
    ta = _cross(_sub(point, sel_a(link_pos)), fa)
    tb = _cross(_sub(point, sel_b(link_pos)), fb)
    if _CONTACT_MM:
        MlaT, MlbT = Mla.T, Mlb.T                   # [L, P] scatter-add
        lf = _s3(_add(_mm3(MlaT, fa), _mm3(MlbT, fb)))
        lt = _s3(_add(_mm3(MlaT, ta), _mm3(MlbT, tb)))
        group_fn = _mm(_onehot(pt.group, pt.ngroups).T, fn)
    else:
        lf = (jnp.zeros((L, 3, B), f32).at[la].add(_s3(fa)).at[lb].add(_s3(fb)))
        lt = (jnp.zeros((L, 3, B), f32).at[la].add(_s3(ta)).at[lb].add(_s3(tb)))
        group_fn = jnp.zeros((pt.ngroups, B), f32).at[pt.group].add(fn)
    return ContactB(fn, dist, _s3(point), lf, lt, group_fn,
                    _s3(w0), _s3(w1))


# ------------------------------------------------- velocities + wrench mapping


def motion_subspace_b(model, sim_dofs, link_pos, link_quat):
    """Batch-last world motion subspaces for the sim dofs.

    Returns (S_w [k,3,B], S_v [k,3,B]) from FULL [L,3/4,B] link poses."""
    from .model import JOINT_REVOLUTE
    sd = np.asarray(sim_dofs, np.int32)
    dl = np.asarray(model.dof_links)[sd]
    q = [link_quat[dl][:, c] for c in range(4)]
    ax = np.asarray(model.axis[dl], np.float32)
    a = _quat_rotate(q, [jnp.asarray(ax[:, c])[:, None] for c in range(3)])
    p = _c3(link_pos[dl])
    rev = jnp.asarray(model.joint_type[dl] == JOINT_REVOLUTE,
                      link_pos.dtype)[:, None]
    S_w = [rev * c for c in a]
    S_v = [rev * c1 + (1.0 - rev) * c2 for c1, c2 in zip(_cross(p, a), a)]
    return S_w, S_v


def link_velocities_b(model, sim_dofs, link_pos, link_quat, qd_sd):
    """Batch-last link velocities: (v [L,3,B], w [L,3,B]).
    qd outside the sim dofs is assumed zero (the substep-loop invariant)."""
    sd = np.asarray(sim_dofs, np.int32)
    anc_dof, _, _ = _masks(model)
    mask = jnp.asarray(anc_dof[:, sd])            # [L, k]
    S_w, S_v = motion_subspace_b(model, sim_dofs, link_pos, link_quat)
    k, B = qd_sd.shape
    S6 = jnp.stack(S_w + S_v, 1)                  # [k, 6, B]
    Sqd = (S6 * qd_sd[:, None, :]).reshape(k, 6 * B)
    with jax.default_matmul_precision("float32"):
        v_sp = (mask @ Sqd).reshape(-1, 6, B)     # [L, 6, B]
    w = v_sp[:, :3]
    v = v_sp[:, 3:] + _s3(_cross(_c3(w), _c3(link_pos)))
    return v, w


def wrench_to_tau_b(model, sim_dofs, link_pos, link_quat,
                    link_force, link_torque):
    """Batch-last wrench -> sim-dof torques: [k, B] (the dynamics kernel's
    tau input layout).  Only the sim dofs' subtree links contribute."""
    from ..physics.dynamics import _rel_links
    sd = np.asarray(sim_dofs, np.int32)
    rel = _rel_links(model, sd)
    _, subtree_dof, _ = _masks(model)
    sub = jnp.asarray(subtree_dof[np.ix_(sd, rel)])   # [k, R]
    f = _c3(link_force[rel])
    n_O = _add(_c3(link_torque[rel]),
               _cross(_c3(link_pos[rel]), f))
    f6 = jnp.stack(n_O + f, 1)                        # [R, 6, B]
    R_, _, B = f6.shape
    with jax.default_matmul_precision("float32"):
        acc = (sub @ f6.reshape(R_, 6 * B)).reshape(-1, 6, B)   # [k, 6, B]
    S_w, S_v = motion_subspace_b(model, sim_dofs, link_pos, link_quat)
    S6 = jnp.stack(S_w + S_v, 1)                      # [k, 6, B]
    return jnp.sum(S6 * acc, axis=1)                  # [k, B]


def world_segments_b(gs: con.GeomSet, link_pos, link_quat, p0, p1, n: int):
    """World segments of the first n geoms, batch-last: ([n,3,B], [n,3,B]).
    Used by the particle hooks for the human capsule set (those geoms are
    always link-attached, never world-static)."""
    gl = np.maximum(gs.link[:n], 0)
    lp = _c3(link_pos[gl])
    lq = [link_quat[gl][:, c] for c in range(4)]
    w0 = _add(lp, _quat_rotate(lq, _c3(p0[:n])))
    w1 = _add(lp, _quat_rotate(lq, _c3(p1[:n])))
    return _s3(w0), _s3(w1)


def quat_rotate_b(quat_comps, vec_comps):
    """Public componentwise quaternion rotation for batch-last hook code."""
    return _quat_rotate(quat_comps, vec_comps)
