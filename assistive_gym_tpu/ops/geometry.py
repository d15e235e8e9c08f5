"""Task geometry utilities: batched JAX ports of the reference's Util class.

Semantics parity with assistive_gym/envs/util.py:93-238: capsule surface
sampling (scratch targets), capsule surface grids (wiping targets), cylinder
containment (water-in-cup), line/triangle intersection and the sleeve-on-arm
classifier (dressing reward).
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import math3d as m3


def points_in_cylinder(pt1, pt2, r, q):
    """Boolean: is q inside the (infinite-cap) cylinder from pt1 to pt2
    (util.py:93-96)."""
    vec = pt2 - pt1
    const = r * jnp.linalg.norm(vec, axis=-1)
    c1 = jnp.sum((q - pt1) * vec, -1) >= 0
    c2 = jnp.sum((q - pt2) * vec, -1) <= 0
    c3 = jnp.linalg.norm(jnp.cross(q - pt1, vec), axis=-1) <= const
    return c1 & c2 & c3


def point_on_capsule(key, p1, p2, radius, theta_range=(0.0, 2.0 * math.pi)):
    """Random point on a capsule's lateral surface (util.py:98-118)."""
    k1, k2 = jax.random.split(key)
    axis = p2 - p1
    length = jnp.linalg.norm(axis, axis=-1)
    t = jax.random.uniform(k1, minval=radius, maxval=length)
    axis_n = axis / jnp.maximum(length, 1e-9)
    ortho = m3.normalize(m3.orthogonal_vector(axis_n))
    normal = jnp.cross(axis_n, ortho)
    theta = jax.random.uniform(k2, minval=theta_range[0], maxval=theta_range[1])
    return p1 + t * axis_n + radius * jnp.cos(theta) * ortho + radius * jnp.sin(theta) * normal


def capsule_points_static(p1: np.ndarray, p2: np.ndarray, radius: float,
                          distance_between_points: float = 0.05) -> np.ndarray:
    """Surface grid around a capsule (util.py:120-153) — host-side/static:
    the reference calls this with fixed per-gender dims, so point counts are
    static per env config.  Returns f32[N,3] in the link-local frame."""
    p1, p2 = np.asarray(p1, np.float64), np.asarray(p2, np.float64)
    axis = p2 - p1
    axis_n = axis / np.linalg.norm(axis)
    mloc = np.argmax(np.abs(axis_n))
    y = np.zeros(3)
    y[(mloc + 1) % 3] = 1
    ortho = np.cross(axis_n, y)
    ortho /= np.linalg.norm(ortho)
    normal = np.cross(axis_n, ortho)
    sections = int(np.linalg.norm(p2 - p1) / distance_between_points)
    pts = []
    for i in range(sections):
        section_pos = (p2 - p1) / (sections + 1) * (i + 1)
        circumference = 2 * np.pi * radius
        theta_dist = distance_between_points / radius
        for j in range(int(circumference / distance_between_points)):
            theta = theta_dist * j
            pts.append(p1 + section_pos + radius * np.cos(theta) * ortho
                       + radius * np.sin(theta) * normal)
    return np.asarray(pts, np.float32)


def line_intersects_triangle(p0, p1, p2, q0, q1):
    """Segment q0-q1 vs triangle p0p1p2 (util.py:165-172 signed-volume test)."""
    sv = lambda a, b, c, d: jnp.sum(jnp.cross(b - a, c - a) * (d - a), -1) / 6.0
    s1 = jnp.sign(sv(q0, p0, p1, p2))
    s2 = jnp.sign(sv(q1, p0, p1, p2))
    t1 = jnp.sign(sv(q0, q1, p0, p1))
    t2 = jnp.sign(sv(q0, q1, p1, p2))
    t3 = jnp.sign(sv(q0, q1, p2, p0))
    return (s1 != s2) & (t1 == t2) & (t2 == t3)


def sleeve_on_arm_reward(triangle1_points, triangle2_points,
                         shoulder_pos, elbow_pos, wrist_pos,
                         hand_radius, elbow_radius, shoulder_radius):
    """Geometric sleeve-progress classifier (util.py:174-238), pure JAX.

    triangle*_points: f32[3,3] tracked cloth vertices; returns the same tuple
    of scalars/bools the reference returns.
    """
    f32 = triangle1_points.dtype
    we = wrist_pos - elbow_pos
    we_n = we / jnp.maximum(jnp.linalg.norm(we), 1e-9)
    hand_end = wrist_pos + we_n * (hand_radius * 2)
    elbow_end = elbow_pos - we_n * elbow_radius
    se = shoulder_pos - elbow_pos
    se_n = se / jnp.maximum(jnp.linalg.norm(se), 1e-9)
    shoulder_end = shoulder_pos + se_n * shoulder_radius

    all_points = jnp.concatenate([triangle1_points, triangle2_points], 0)

    def above_below(normal_from, normal_to, origin):
        n = m3.normalize(normal_to - normal_from)
        tangent = m3.normalize(jnp.cross(jnp.asarray([1.0, 1.0, 0.0], f32), n))
        binormal = m3.normalize(jnp.cross(tangent, n))
        tp = (all_points - origin) @ tangent
        bp = (all_points - origin) @ binormal
        return (jnp.any(tp > 0) & jnp.any(tp < 0)
                & jnp.any(bp > 0) & jnp.any(bp < 0))

    pab_forearm = above_below(elbow_end, hand_end, elbow_end)
    pab_upperarm = above_below(shoulder_end, elbow_end, shoulder_end)

    def tri_hit(tri, a, b):
        return line_intersects_triangle(tri[0], tri[1], tri[2], a, b)

    fore_1 = tri_hit(triangle1_points, hand_end, elbow_end)
    fore_2 = tri_hit(triangle2_points, hand_end, elbow_end)
    up_1 = tri_hit(triangle1_points, elbow_end, shoulder_end)
    up_2 = tri_hit(triangle2_points, elbow_end, shoulder_end)

    center = jnp.mean(all_points, 0)
    d_shoulder = jnp.linalg.norm(shoulder_end - center)
    d_elbow = jnp.linalg.norm(elbow_end - center)
    d_hand = jnp.linalg.norm(hand_end - center)
    along_forearm = jnp.linalg.norm(center - hand_end)
    along_upperarm = jnp.linalg.norm(center - elbow_pos)

    forearm_in = pab_forearm & (fore_1 | fore_2)
    upperarm_in = pab_upperarm & (up_1 | up_2)
    forearm_length = jnp.linalg.norm(hand_end - elbow_end)
    upperarm_length = jnp.linalg.norm(elbow_pos - shoulder_pos)
    return (forearm_in, upperarm_in, along_forearm, along_upperarm,
            d_hand, d_elbow, d_shoulder, forearm_length, upperarm_length)
