"""Exactness of the closed-form segment-vs-box closest-point solve.

The seg-box narrowphase (ops/collision.seg_box_t, and its componentwise
twin inside physics/batched._seg_aabb) replaced a fixed-depth ternary
search; these tests pin it against dense brute-force sampling along the
segment, including degenerate (zero-length) segments, slab-parallel
segments, and through-the-box chords.
"""
import numpy as np
import jax.numpy as jnp

from assistive_gym_tpu.ops import collision as col
from assistive_gym_tpu.ops import math3d as m3


def _rand_quat(rng, n):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def _brute_outside_dist(a0, a1, box_pos, box_quat, half, samples=4001):
    """min over dense t of the point->box OUTSIDE distance (0 if inside)."""
    t = np.linspace(0.0, 1.0, samples, dtype=np.float32)
    p = a0[:, None] + t[None, :, None] * (a1 - a0)[:, None]   # [N,S,3]
    pl = np.asarray(m3.quat_rotate_inv(
        jnp.asarray(box_quat)[:, None], jnp.asarray(p - box_pos[:, None])))
    q = np.maximum(np.abs(pl) - half[:, None], 0.0)
    return np.sqrt((q * q).sum(-1)).min(1)


def test_capsule_box_matches_bruteforce():
    rng = np.random.default_rng(0)
    N = 256
    a0 = rng.uniform(-1.5, 1.5, (N, 3)).astype(np.float32)
    a1 = a0 + rng.uniform(-1.0, 1.0, (N, 3)).astype(np.float32)
    box_pos = rng.uniform(-0.3, 0.3, (N, 3)).astype(np.float32)
    box_quat = _rand_quat(rng, N)
    half = rng.uniform(0.05, 0.6, (N, 3)).astype(np.float32)
    r = np.zeros(N, np.float32)          # raw segment distance (radius off)

    dist, _, _ = col.capsule_box(jnp.asarray(a0), jnp.asarray(a1),
                                 jnp.asarray(r), jnp.asarray(box_pos),
                                 jnp.asarray(box_quat), jnp.asarray(half))
    dist = np.asarray(dist)
    ref = _brute_outside_dist(a0, a1, box_pos, box_quat, half)

    outside = ref > 1e-3
    # exact solve: must match the dense scan to sampling resolution
    np.testing.assert_allclose(dist[outside], ref[outside],
                               rtol=1e-4, atol=5e-5)
    # penetrating cases must be reported as penetrating
    assert (dist[~outside] <= 1e-3).all()


def test_capsule_box_degenerate_and_axis_parallel():
    # zero-length segment == sphere; axis-parallel segments hit the
    # "breakpoint at infinity" guards
    a0 = np.array([[0.7, 0.0, 0.0], [0.7, -1.0, 0.05], [0.0, 0.0, 2.0]],
                  np.float32)
    a1 = np.array([[0.7, 0.0, 0.0], [0.7, 1.0, 0.05], [0.0, 0.0, 0.25]],
                  np.float32)
    box_pos = np.zeros((3, 3), np.float32)
    box_quat = np.tile(np.array([0, 0, 0, 1], np.float32), (3, 1))
    half = np.tile(np.array([0.5, 0.5, 0.2], np.float32), (3, 1))
    r = np.zeros(3, np.float32)
    dist, _, _ = col.capsule_box(jnp.asarray(a0), jnp.asarray(a1),
                                 jnp.asarray(r), jnp.asarray(box_pos),
                                 jnp.asarray(box_quat), jnp.asarray(half))
    np.testing.assert_allclose(np.asarray(dist), [0.2, 0.2, 0.05], atol=1e-6)


def test_capsule_box_through_chord_reports_penetration():
    # a segment passing clean through the box: distance must be negative
    # and the witness point inside the box
    a0 = jnp.asarray([[-2.0, 0.0, 0.0]], jnp.float32)
    a1 = jnp.asarray([[2.0, 0.0, 0.0]], jnp.float32)
    box_pos = jnp.zeros((1, 3), jnp.float32)
    box_quat = jnp.asarray([[0, 0, 0, 1]], jnp.float32)
    half = jnp.asarray([[0.5, 0.4, 0.3]], jnp.float32)
    dist, _, point = col.capsule_box(a0, a1, jnp.zeros(1, jnp.float32),
                                     box_pos, box_quat, half)
    assert float(dist[0]) < -0.25
    assert (np.abs(np.asarray(point[0])) <= np.asarray(half[0]) + 1e-5).all()
