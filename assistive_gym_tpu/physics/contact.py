"""Scene-level contact pipeline: static pair tables -> penalty forces.

TPU-native equivalent of Bullet's broadphase + contact solver + the
reference's force readbacks.  Topology is fixed per task, so the broadphase
is a precomputed pair table (SURVEY.md §2.2 N2) — including the reference's
collision-filter surgery (human limb self-collision groups,
human_creation.py:267-284; robot/tool filters, world_creation.py:202-212,
331-344) which here simply means those pairs never enter the table.

Force readback parity: the reference sums contact normal forces c[9] between
body pairs (e.g. scratch_itch.py:49-61).  Every pair carries a `group` id and
`evaluate` returns per-group normal-force sums, so task rewards read the same
quantities as batched arrays.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops import collision as col
from ..ops import math3d as m3

GEOM_SEG = 0    # sphere (p0==p1) or capsule, radius
GEOM_BOX = 1    # oriented box, half-extents
GEOM_PLANE = 2  # half-space: normal = p1 (unit, local), offset = radius


@dataclasses.dataclass(frozen=True)
class GeomSet:
    """Static SoA collision geometry. `link` indexes a concatenated link-pose
    array covering every body in the scene; link -1 = world-static geom."""
    link: np.ndarray      # i32[G]
    gtype: np.ndarray     # i32[G]
    p0: np.ndarray        # f32[G,3] local
    p1: np.ndarray        # f32[G,3] local
    radius: np.ndarray    # f32[G]
    half: np.ndarray      # f32[G,3]
    quat: np.ndarray      # f32[G,4]

    @staticmethod
    def build(geoms) -> "GeomSet":
        """geoms: list of dicts with keys link,gtype,p0,p1,radius,half,quat."""
        G = len(geoms)
        gs = GeomSet(
            link=np.array([g["link"] for g in geoms], np.int32),
            gtype=np.array([g["gtype"] for g in geoms], np.int32),
            p0=np.array([g.get("p0", (0, 0, 0)) for g in geoms], np.float32),
            p1=np.array([g.get("p1", g.get("p0", (0, 0, 0))) for g in geoms], np.float32),
            radius=np.array([g.get("radius", 0.0) for g in geoms], np.float32),
            half=np.array([g.get("half", (0, 0, 0)) for g in geoms], np.float32),
            quat=np.array([g.get("quat", (0, 0, 0, 1)) for g in geoms], np.float32),
        )
        assert gs.p0.shape == (G, 3)
        return gs


@dataclasses.dataclass(frozen=True)
class PairTable:
    """Static contact pair list (the precomputed broadphase).

    Rows are stored SORTED BY KIND so each narrowphase kind runs on a
    contiguous pair slice — computing every kind over the full table and
    masking the merge costs ~3.5x on TPU (round-2 trace finding).  `perm`
    is the applied permutation: external per-pair metadata built in
    insertion order must be reindexed with it (mask[perm])."""
    a: np.ndarray          # i32[P] geom index (segment side for mixed pairs)
    b: np.ndarray          # i32[P] geom index
    kind: np.ndarray       # i32[P] 0 seg-seg, 1 seg-box, 2 seg-plane
    stiffness: np.ndarray  # f32[P]
    damping: np.ndarray    # f32[P]
    friction: np.ndarray   # f32[P]
    group: np.ndarray      # i32[P]
    ngroups: int
    perm: np.ndarray = None   # i32[P] insertion-order -> stored-order map

    @staticmethod
    def build(pairs, ngroups: int) -> "PairTable":
        """pairs: list of dicts a,b,kind,stiffness,damping,friction,group."""
        kind = np.array([p["kind"] for p in pairs], np.int32)
        perm = np.argsort(kind, kind="stable").astype(np.int32)
        arr = lambda key, default, dt: np.array(
            [pairs[i].get(key, default) for i in perm], dt)
        return PairTable(
            a=np.array([pairs[i]["a"] for i in perm], np.int32),
            b=np.array([pairs[i]["b"] for i in perm], np.int32),
            kind=kind[perm],
            stiffness=arr("stiffness", 3000.0, np.float32),
            damping=arr("damping", 30.0, np.float32),
            friction=arr("friction", 0.5, np.float32),
            group=arr("group", 0, np.int32),
            ngroups=ngroups,
            perm=perm,
        )

    def reindex(self, per_pair_values):
        """Reorder insertion-order per-pair metadata to the stored order."""
        return np.asarray(per_pair_values)[self.perm]

    def involving_links(self, gs: "GeomSet", link_lo: int, link_hi: int
                        ) -> "PairTable":
        """Static subtable of rows where either geom sits on a link in
        [link_lo, link_hi).  Penalty-contact pairs are independent, so
        dropping rows that touch no such link leaves the kept links'
        accumulated forces/torques bitwise identical — used by the
        reset-time human settle, which reads back only human-link torques
        (the robot is frozen, so its pair forces are dead work there)."""
        la, lb = gs.link[self.a], gs.link[self.b]
        keep = (((la >= link_lo) & (la < link_hi)) |
                ((lb >= link_lo) & (lb < link_hi)))
        return dataclasses.replace(
            self, a=self.a[keep], b=self.b[keep], kind=self.kind[keep],
            stiffness=self.stiffness[keep], damping=self.damping[keep],
            friction=self.friction[keep], group=self.group[keep], perm=None)

    def kind_slices(self):
        """[(kind, slice)] of the contiguous per-kind row ranges."""
        out = []
        for k in sorted(set(self.kind.tolist())):
            lo = int(np.searchsorted(self.kind, k, "left"))
            hi = int(np.searchsorted(self.kind, k, "right"))
            out.append((int(k), slice(lo, hi)))
        return out

    @property
    def npairs(self) -> int:
        return len(self.a)


def tuned_pairs(gs: GeomSet, pt: PairTable, link_mass: np.ndarray, dt: float,
                alpha: float = 0.25, zeta: float = 1.0) -> PairTable:
    """Stability-tuned penalty parameters per pair (MuJoCo solref-style).

    An explicit penalty spring k is stable under semi-implicit Euler only if
    its eigenfrequency fits the substep: k < alpha * m_eff / dt^2.  The
    original fixed k=3000 detonates for light links (a 0.1 kg tool at
    dt=0.02 has a 2.5x unstable spring — observed as runaway joint
    velocities in ~0.1% of envs).  Per-pair k is derived from the two
    links' masses (world side = infinite), with near-critical damping
    bounded by its own stability limit d < m_eff/dt.

    Equilibrium force readbacks are unchanged (spring force still balances
    the applied load); only the penetration depth at equilibrium shifts,
    bounded by the 2 cm cap in ops/collision.py.
    """
    import dataclasses

    def side_mass(idx):
        l = gs.link[idx]
        m = np.where(l < 0, np.inf, link_mass[np.maximum(l, 0)])
        return np.maximum(m, 5e-2)   # floor: welded 0-mass frames -> 50 g

    ma, mb = side_mass(pt.a), side_mass(pt.b)
    with np.errstate(divide="ignore"):   # both sides static -> inf/inf
        m_eff = 1.0 / (1.0 / ma + 1.0 / mb)
    m_eff = np.where(np.isfinite(m_eff), m_eff, np.maximum(ma, mb))
    m_eff = np.minimum(m_eff, 50.0)
    k = np.clip(alpha * m_eff / dt ** 2, 50.0, 10000.0).astype(np.float32)
    d = np.minimum(2.0 * zeta * np.sqrt(k * m_eff),
                   0.5 * m_eff / dt).astype(np.float32)
    return dataclasses.replace(pt, stiffness=k, damping=d)


class WorldGeoms(NamedTuple):
    w0: jnp.ndarray     # f32[G,3] segment start / box centre / plane point
    w1: jnp.ndarray     # f32[G,3] segment end / plane normal (world)
    quat: jnp.ndarray   # f32[G,4] box orientation (world)


def world_geoms(gs: GeomSet, link_pos: jnp.ndarray, link_quat: jnp.ndarray,
                p0=None, p1=None) -> WorldGeoms:
    """Transform all geoms to world given concatenated link poses.
    p0/p1 optionally override local geometry (per-env gender dims)."""
    gp0 = jnp.asarray(gs.p0) if p0 is None else p0
    gp1 = jnp.asarray(gs.p1) if p1 is None else p1
    idx = jnp.asarray(np.maximum(gs.link, 0))
    lp = link_pos[idx]
    lq = link_quat[idx]
    is_world = jnp.asarray(gs.link < 0)[:, None]
    lp = jnp.where(is_world, 0.0, lp)
    lq = jnp.where(is_world, jnp.asarray([0.0, 0.0, 0.0, 1.0], link_quat.dtype), lq)
    w0 = lp + m3.quat_rotate(lq, gp0)
    is_plane = jnp.asarray(gs.gtype == GEOM_PLANE)[:, None]
    p1w = lp + m3.quat_rotate(lq, gp1)
    n_w = m3.quat_rotate(lq, gp1)       # plane normal rotates only
    w1 = jnp.where(is_plane, n_w, p1w)
    quat = m3.quat_mul(lq, jnp.asarray(gs.quat))
    return WorldGeoms(w0, w1, quat)


class ContactResult(NamedTuple):
    fn: jnp.ndarray          # f32[P] normal force magnitude per pair
    dist: jnp.ndarray        # f32[P] signed distance per pair
    point: jnp.ndarray       # f32[P,3] contact point (world)
    force_a: jnp.ndarray     # f32[P,3] force applied to geom-a body at point
    link_force: jnp.ndarray  # f32[Ltot,3] accumulated per concatenated link
    link_torque: jnp.ndarray # f32[Ltot,3] torque about link origin
    group_fn: jnp.ndarray    # f32[ngroups] sum of normal forces per group


def evaluate(
    gs: GeomSet,
    pt: PairTable,
    link_pos: jnp.ndarray,
    link_quat: jnp.ndarray,
    link_v: Optional[jnp.ndarray] = None,
    link_w: Optional[jnp.ndarray] = None,
    p0=None, p1=None, radius=None,
) -> ContactResult:
    """Evaluate all contact pairs; one fused pass, no data-dependent shapes."""
    nlinks = link_pos.shape[0]
    wg = world_geoms(gs, link_pos, link_quat, p0=p0, p1=p1)
    if link_v is None:
        link_v = jnp.zeros_like(link_pos)
    if link_w is None:
        link_w = jnp.zeros_like(link_pos)

    grad = jnp.asarray(gs.radius) if radius is None else radius
    ia, ib = jnp.asarray(pt.a), jnp.asarray(pt.b)
    a0, a1 = wg.w0[ia], wg.w1[ia]
    ra = grad[ia]
    b0, b1 = wg.w0[ib], wg.w1[ib]
    rb = grad[ib]
    bq = wg.quat[ib]
    bh = jnp.asarray(gs.half)[ib]

    # one contiguous pair slice per kind (the table is kind-sorted): each
    # narrowphase runs only on its own rows — computing every kind over the
    # full table and select-merging measured ~3.5x slower on TPU
    parts = []
    for k, sl in pt.kind_slices():
        if k == 0:
            parts.append(col.capsule_capsule(a0[sl], a1[sl], ra[sl],
                                             b0[sl], b1[sl], rb[sl]))
        elif k == 1:
            parts.append(col.capsule_box(a0[sl], a1[sl], ra[sl],
                                         b0[sl], bq[sl], bh[sl]))
        elif k == 2:
            plane_off = jnp.sum(b0[sl] * b1[sl], -1)
            parts.append(col.capsule_plane(a0[sl], a1[sl], ra[sl],
                                           b1[sl], plane_off))
        else:
            raise AssertionError(f"unknown pair kind {k}")
    if len(parts) == 1:
        dist, normal, point = parts[0]
    else:
        dist = jnp.concatenate([p[0] for p in parts], 0)
        normal = jnp.concatenate(
            [jnp.broadcast_to(p[1], p[0].shape + (3,)) for p in parts], 0)
        point = jnp.concatenate(
            [jnp.broadcast_to(p[2], p[0].shape + (3,)) for p in parts], 0)

    la = jnp.asarray(np.maximum(pt_link(gs, pt.a), 0))
    lb = jnp.asarray(np.maximum(pt_link(gs, pt.b), 0))
    a_world = jnp.asarray(pt_link(gs, pt.a) < 0)
    b_world = jnp.asarray(pt_link(gs, pt.b) < 0)

    def vel_at(l_idx, is_world, pts):
        v = link_v[l_idx] + jnp.cross(link_w[l_idx], pts - link_pos[l_idx])
        return jnp.where(is_world[:, None], 0.0, v)

    rel_vel = vel_at(la, a_world, point) - vel_at(lb, b_world, point)
    force, fn = col.contact_force(
        dist, normal, rel_vel,
        jnp.asarray(pt.stiffness), jnp.asarray(pt.damping), jnp.asarray(pt.friction),
    )

    # accumulate wrenches per link (world-static sides contribute nothing)
    fa = jnp.where(a_world[:, None], 0.0, force)
    fb = jnp.where(b_world[:, None], 0.0, -force)
    lf = jnp.zeros((nlinks, 3), link_pos.dtype)
    lt = jnp.zeros((nlinks, 3), link_pos.dtype)
    ta = jnp.cross(point - link_pos[la], fa)
    tb = jnp.cross(point - link_pos[lb], fb)
    lf = lf.at[la].add(fa).at[lb].add(fb)
    lt = lt.at[la].add(ta).at[lb].add(tb)

    group_fn = jnp.zeros(pt.ngroups, link_pos.dtype).at[jnp.asarray(pt.group)].add(fn)
    return ContactResult(fn, dist, point, force, lf, lt, group_fn)


def pt_link(gs: GeomSet, idx: np.ndarray) -> np.ndarray:
    return gs.link[idx]
