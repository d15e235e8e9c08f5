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
    g = jnp.argmax(depth, axis=1)                             # deepest contact
    depth_g = jnp.take_along_axis(depth, g[:, None], 1)[:, 0]
    n = jnp.take_along_axis(d, g[:, None, None], 1)[:, 0]
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
