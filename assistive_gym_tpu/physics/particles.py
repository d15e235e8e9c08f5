"""Fixed-size particle dynamics: food spheres / water 'fluid proxy'.

TPU-native replacement for the reference's per-particle rigid bodies
(feeding.py:177-193 food spheres, drinking.py:185-203 water): a [N,3]
position/velocity array with an alive mask — body deletion
(feeding.py:66,77) becomes masking, so shapes stay static.

Particles are 1-gram spheres (food_mass=0.001, feeding.py:183); their
reaction forces on tool/human are negligible and are not fed back
(one-way coupling; the reference's Bullet solver technically two-way couples
but at 0.001 kg the effect on a >=1 kg arm is ~0).

Collision responses are velocity-level projections (inelastic, Coulomb-free
tangential damping), stable at the tasks' physics rates (100 Hz feeding,
250 Hz drinking).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..ops import math3d as m3


class Particles(NamedTuple):
    pos: jnp.ndarray     # f32[N,3]
    vel: jnp.ndarray     # f32[N,3]
    alive: jnp.ndarray   # bool[N]


def integrate(p: Particles, dt: float, gravity) -> Particles:
    vel = p.vel + jnp.asarray(gravity, p.vel.dtype) * dt
    pos = p.pos + vel * dt * p.alive[:, None]
    return Particles(pos, vel, p.alive)


def _project(p: Particles, depth, normal, restitution=0.0, friction=0.3):
    """Push particles out along `normal` where depth>0; kill inward velocity."""
    hit = (depth > 0.0) & p.alive
    pos = p.pos + jnp.where(hit[:, None], depth[:, None] * normal, 0.0)
    v_n = jnp.sum(p.vel * normal, -1)
    v_t = p.vel - v_n[:, None] * normal
    v_new = v_t * (1.0 - friction) - restitution * jnp.minimum(v_n, 0.0)[:, None] * normal
    vel = jnp.where(hit[:, None], v_new, p.vel)
    return Particles(pos, vel, p.alive)


def collide_segments(p: Particles, radius: float, seg_a, seg_b, seg_r) -> Particles:
    """Particles vs capsule/sphere set (human body, spoon). seg_*: [G,...]."""
    # closest point on each segment to each particle: [N,G]
    ab = seg_b - seg_a                                        # [G,3]
    ap = p.pos[:, None, :] - seg_a[None, :, :]                # [N,G,3]
    t = jnp.sum(ap * ab[None], -1) / jnp.maximum(jnp.sum(ab * ab, -1), 1e-9)[None]
    t = jnp.clip(t, 0.0, 1.0)
    closest = seg_a[None] + t[..., None] * ab[None]           # [N,G,3]
    d = p.pos[:, None, :] - closest
    dist = jnp.linalg.norm(d, axis=-1)                        # [N,G]
    depth = (seg_r[None] + radius) - dist
    # deepest contact via first-max mask + reduce: argmax/take_along_axis
    # compile to slow TPU gathers; mask-select fuses into the depth field
    depth_g = depth.max(1)
    mask = depth >= depth_g[:, None]
    first = mask & (jnp.cumsum(mask.astype(jnp.int32), 1) == 1)
    w = first.astype(d.dtype)
    n = (d * w[:, :, None]).sum(1)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    return _project(p, depth_g, n)


def touches_segments(p: Particles, radius: float, seg_a, seg_b, seg_r):
    """bool[N]: particle intersects any segment (contact readback)."""
    ab = seg_b - seg_a
    ap = p.pos[:, None, :] - seg_a[None, :, :]
    t = jnp.clip(jnp.sum(ap * ab[None], -1)
                 / jnp.maximum(jnp.sum(ab * ab, -1), 1e-9)[None], 0.0, 1.0)
    closest = seg_a[None] + t[..., None] * ab[None]
    dist = jnp.linalg.norm(p.pos[:, None, :] - closest, axis=-1)
    return jnp.any(dist < seg_r[None] + radius, axis=1) & p.alive


def collide_box_top(p: Particles, radius: float, center, half) -> Particles:
    """Axis-aligned box acting as a surface (table top): project up only."""
    inside_xy = (jnp.abs(p.pos[:, 0] - center[0]) < half[0] + radius) & \
                (jnp.abs(p.pos[:, 1] - center[1]) < half[1] + radius)
    top = center[2] + half[2]
    depth = (top + radius) - p.pos[:, 2]
    below = p.pos[:, 2] > center[2]  # only when approaching from above
    depth = jnp.where(inside_xy & below, depth, -1.0)
    n = jnp.zeros_like(p.pos).at[:, 2].set(1.0)
    return _project(p, depth, n)


def collide_cup_cylinder(p: Particles, radius: float,
                         top_center, bottom_center, R: float) -> Particles:
    """Open-top cylindrical container (the drinking cup, drinking.py:71:
    points_in_cylinder radius 0.05 between the cup's top/bottom centres).

    Walls and bottom are solid from the inside; the top is open, so tilting
    the cup past horizontal lets particles escape over the rim.
    """
    axis = bottom_center - top_center
    h = jnp.linalg.norm(axis)
    a = axis / jnp.maximum(h, 1e-9)
    d = p.pos - top_center[None]
    s = d @ a                                        # axial coord from top
    radial = d - s[:, None] * a[None]
    r_norm = jnp.linalg.norm(radial, axis=-1)
    r_dir = radial / jnp.maximum(r_norm, 1e-9)[:, None]

    inside_axial = (s > 0.0) & (s < h)
    # wall: push inward when inside the cylinder shell
    wall_depth = jnp.where(inside_axial & (r_norm < R + radius),
                           r_norm - (R - radius), -1.0)
    p = _project(p, jnp.maximum(wall_depth, -1.0), -r_dir)
    # bottom cap: push back up (toward the top) when passing the bottom
    d2 = p.pos - top_center[None]
    s2 = d2 @ a
    r2 = jnp.linalg.norm(d2 - s2[:, None] * a[None], axis=-1)
    bottom_depth = jnp.where((r2 < R) & (s2 > h - radius) & (s2 < h + 3 * radius),
                             s2 - (h - radius), -1.0)
    p = _project(p, bottom_depth, -a[None].repeat(p.pos.shape[0], 0))
    return p


def collide_spoon_scoop(p: Particles, radius: float,
                        center, up, R: float = 0.022) -> Particles:
    """Spherical-cup approximation of the spoon bowl (spoon_vhacd.obj at
    scale 0.08, feeding.py:154-167): particles inside the sphere are kept
    unless they exit through the upper opening (dot(dir, up) high)."""
    d = p.pos - center[None]
    dist = jnp.linalg.norm(d, axis=-1)
    n = d / jnp.maximum(dist, 1e-9)[:, None]
    openness = n @ up                                # +1 = straight up
    solid = openness < 0.45                          # walls/bottom of the cup
    # container: push back inward once a particle reaches the inner surface
    depth = jnp.where(solid & (dist < R + radius) & (dist > R - radius),
                      dist - (R - radius), -1.0)
    return _project(p, depth, -n)


def separate(p: Particles, radius: float, stiffness: float = 0.5) -> Particles:
    """Position-based particle-particle separation (one relaxation pass).

    The reference's particles are rigid spheres resolved by Bullet; one
    projection pass per substep keeps the clump volumetric (water fills the
    cup instead of collapsing to a point) at O(N^2) vector cost — N<=64.
    """
    d = p.pos[:, None, :] - p.pos[None, :, :]            # [N,N,3]
    dist = jnp.linalg.norm(d + jnp.eye(p.pos.shape[0])[..., None], axis=-1)
    overlap = jnp.maximum(2.0 * radius - dist, 0.0)
    n = d / jnp.maximum(dist, 1e-9)[..., None]
    both = (p.alive[:, None] & p.alive[None, :] &
            ~jnp.eye(p.pos.shape[0], dtype=bool))
    push = jnp.sum(jnp.where(both[..., None], 0.5 * stiffness * overlap[..., None] * n, 0.0), axis=1)
    return Particles(p.pos + push * p.alive[:, None], p.vel, p.alive)


# ----------------------------------------------------------- batch-last (lanes)
# Variants with the env batch on the LANE axis ([N,3,B] / [N,B]), matching
# the batch-last substep loop (physics/batched.py).  Pairwise terms are
# computed per component as [N,G,B] arrays — dense (G,B) tiles, no padding.

class ParticlesB(NamedTuple):
    pos: jnp.ndarray     # f32[N,3,B]
    vel: jnp.ndarray     # f32[N,3,B]
    alive: jnp.ndarray   # bool[N,B]


def _pc(x):
    return [x[:, 0], x[:, 1], x[:, 2]]


def _ps(c, axis=1):
    return jnp.stack(c, axis)


def integrate_b(p: ParticlesB, dt: float, gravity) -> ParticlesB:
    g = gravity
    vel = p.vel + jnp.asarray([[g[0]], [g[1]], [g[2]]], p.vel.dtype)[None] * dt
    pos = p.pos + vel * dt * p.alive[:, None, :]
    return ParticlesB(pos, vel, p.alive)


def _project_b(p: ParticlesB, depth, normal, restitution=0.0, friction=0.3):
    """depth [N,B], normal [N,3,B]."""
    hit = ((depth > 0.0) & p.alive)[:, None, :]
    pos = p.pos + jnp.where(hit, depth[:, None, :] * normal, 0.0)
    v_n = jnp.sum(p.vel * normal, 1)
    v_t = p.vel - v_n[:, None, :] * normal
    v_new = (v_t * (1.0 - friction)
             - restitution * jnp.minimum(v_n, 0.0)[:, None, :] * normal)
    vel = jnp.where(hit, v_new, p.vel)
    return ParticlesB(pos, vel, p.alive)


def _closest_depth_b(pos, radius, seg_a, seg_b, seg_r):
    """Deepest-contact (depth [N,B], normal [N,3,B]) vs segment set
    (seg_* [G,3,B] / [G,B]).

    Streams over the G segments keeping only [N,B]-sized live values (the
    one-shot [N,G,B] form materializes ~10 pairwise tensors; at drinking's
    N=64, B=4096 that is ~100s of MB per substep).  Deepest contact wins,
    first segment wins ties — identical to the previous first-max select."""
    px, py, pz = _pc(pos)
    best = None
    for gi in range(seg_a.shape[0]):
        ax, ay, az = seg_a[gi, 0], seg_a[gi, 1], seg_a[gi, 2]      # [B]
        abx = seg_b[gi, 0] - ax
        aby = seg_b[gi, 1] - ay
        abz = seg_b[gi, 2] - az
        apx, apy, apz = px - ax[None], py - ay[None], pz - az[None]
        ab2 = abx * abx + aby * aby + abz * abz
        t = (apx * abx[None] + apy * aby[None] + apz * abz[None]) \
            / jnp.maximum(ab2, 1e-9)[None]
        t = jnp.clip(t, 0.0, 1.0)                                  # [N,B]
        dx = apx - t * abx[None]
        dy = apy - t * aby[None]
        dz = apz - t * abz[None]
        dist = jnp.sqrt(jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-18))
        depth = (seg_r[gi][None] + radius) - dist                  # [N,B]
        cur = (depth, dist, dx, dy, dz)
        if best is None:
            best = cur
        else:
            better = depth > best[0]
            best = tuple(jnp.where(better, c, b) for c, b in zip(cur, best))
    depth_g, dist, dx, dy, dz = best
    inv = 1.0 / jnp.maximum(dist, 1e-9)
    normal = jnp.stack([dx * inv, dy * inv, dz * inv], 1)
    return depth_g, normal


def collide_segments_b(p: ParticlesB, radius, seg_a, seg_b, seg_r) -> ParticlesB:
    depth, normal = _closest_depth_b(p.pos, radius, seg_a, seg_b, seg_r)
    return _project_b(p, depth, normal)


def touches_segments_b(pos, alive, radius, seg_a, seg_b, seg_r):
    depth, _ = _closest_depth_b(pos, radius, seg_a, seg_b, seg_r)
    return (depth > 0.0) & alive


def collide_box_top_b(p: ParticlesB, radius: float, center, half) -> ParticlesB:
    px, py, pz = _pc(p.pos)
    inside_xy = ((jnp.abs(px - center[0]) < half[0] + radius)
                 & (jnp.abs(py - center[1]) < half[1] + radius))
    top = center[2] + half[2]
    depth = jnp.where(inside_xy & (pz > center[2]), (top + radius) - pz, -1.0)
    n = jnp.zeros_like(p.pos).at[:, 2].set(1.0)
    return _project_b(p, depth, n)


def collide_cup_cylinder_b(p: ParticlesB, radius: float,
                           top, bottom, R: float) -> ParticlesB:
    """top/bottom: [3,B] cup axis endpoints."""
    axis = [b - t for t, b in zip(top, bottom)]
    h = jnp.sqrt(jnp.maximum(sum(a * a for a in axis), 1e-18))
    a = [c / h for c in axis]                           # [B] comps
    d = [p.pos[:, i] - top[i][None] for i in range(3)]  # [N,B] comps
    s = sum(di * ai[None] for di, ai in zip(d, a))
    radial = [di - s * ai[None] for di, ai in zip(d, a)]
    r_norm = jnp.sqrt(jnp.maximum(sum(c * c for c in radial), 1e-18))
    r_dir = jnp.stack([c / r_norm for c in radial], 1)  # [N,3,B]
    inside_axial = (s > 0.0) & (s < h[None])
    wall_depth = jnp.where(inside_axial & (r_norm < R + radius),
                           r_norm - (R - radius), -1.0)
    p = _project_b(p, wall_depth, -r_dir)
    d2 = [p.pos[:, i] - top[i][None] for i in range(3)]
    s2 = sum(di * ai[None] for di, ai in zip(d2, a))
    rad2 = [di - s2 * ai[None] for di, ai in zip(d2, a)]
    r2 = jnp.sqrt(jnp.maximum(sum(c * c for c in rad2), 1e-18))
    bottom_depth = jnp.where((r2 < R) & (s2 > h[None] - radius)
                             & (s2 < h[None] + 3 * radius),
                             s2 - (h[None] - radius), -1.0)
    an = jnp.broadcast_to(jnp.stack(a, 0)[None], p.pos.shape)
    return _project_b(p, bottom_depth, -an)


def collide_spoon_scoop_b(p: ParticlesB, radius: float,
                          center, up, R: float = 0.022) -> ParticlesB:
    """center/up: [3,B]."""
    d = [p.pos[:, i] - center[i][None] for i in range(3)]
    dist = jnp.sqrt(jnp.maximum(sum(c * c for c in d), 1e-18))
    n = [c / dist for c in d]
    openness = sum(ni * ui[None] for ni, ui in zip(n, up))
    solid = openness < 0.45
    depth = jnp.where(solid & (dist < R + radius) & (dist > R - radius),
                      dist - (R - radius), -1.0)
    return _project_b(p, depth, -jnp.stack(n, 1))


def separate_b(p: ParticlesB, radius: float, stiffness: float = 0.5) -> ParticlesB:
    N = p.pos.shape[0]
    comps = _pc(p.pos)
    d = [c[:, None] - c[None] for c in comps]           # [N,N,B]
    eye = jnp.eye(N, dtype=p.pos.dtype)[..., None]
    dist = jnp.sqrt(sum(c * c for c in d) + eye)
    overlap = jnp.maximum(2.0 * radius - dist, 0.0)
    both = (p.alive[:, None] & p.alive[None] & ~jnp.eye(N, dtype=bool)[..., None])
    w = jnp.where(both, 0.5 * stiffness * overlap / jnp.maximum(dist, 1e-9), 0.0)
    push = [jnp.sum(w * c, axis=1) for c in d]          # [N,B]
    pos = p.pos + jnp.stack(push, 1) * p.alive[:, None, :]
    return ParticlesB(pos, p.vel, p.alive)
