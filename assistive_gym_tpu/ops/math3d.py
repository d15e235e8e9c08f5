"""3D math primitives: quaternions (xyzw), rotations, rigid transforms.

Conventions match the reference engine's PyBullet API so observations are
directly comparable (quaternion layout xyzw; Euler angles roll-pitch-yaw
composed as Rz(yaw) @ Ry(pitch) @ Rx(roll), i.e. Bullet's setEulerZYX —
see reference usage in assistive_gym/envs/env.py:303 and task files).

All functions are pure jnp, fp32, and broadcast over leading batch axes.
"""
from __future__ import annotations

import jax.numpy as jnp

# ---------------------------------------------------------------- quaternions


def quat_identity() -> jnp.ndarray:
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=jnp.float32)


def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 ⊗ q2, xyzw layout. Rotation: R(q1 ⊗ q2) = R(q1) R(q2)."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    n = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    return q / jnp.maximum(n, eps)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector v by quaternion q (xyzw): R(q) v."""
    u = q[..., :3]
    w = q[..., 3:4]
    # v' = v + 2 w (u × v) + 2 (u × (u × v))
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return quat_rotate(quat_conj(q), v)


def quat_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """axis must be unit length; angle broadcastable."""
    angle = jnp.asarray(angle)
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [axis * s[..., None], jnp.cos(half)[..., None]], axis=-1
    )


def quat_from_euler(euler: jnp.ndarray) -> jnp.ndarray:
    """Bullet getQuaternionFromEuler parity: R = Rz(yaw) Ry(pitch) Rx(roll)."""
    r, p, y = euler[..., 0], euler[..., 1], euler[..., 2]
    cr, sr = jnp.cos(r * 0.5), jnp.sin(r * 0.5)
    cp, sp = jnp.cos(p * 0.5), jnp.sin(p * 0.5)
    cy, sy = jnp.cos(y * 0.5), jnp.sin(y * 0.5)
    return jnp.stack(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ],
        axis=-1,
    )


def quat_to_euler(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse of quat_from_euler (Bullet getEulerFromQuaternion parity)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    # roll (x)
    sinr = 2.0 * (w * x + y * z)
    cosr = 1.0 - 2.0 * (x * x + y * y)
    roll = jnp.arctan2(sinr, cosr)
    # pitch (y)
    sinp = jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)
    # yaw (z)
    siny = 2.0 * (w * z + x * y)
    cosy = 1.0 - 2.0 * (y * y + z * z)
    yaw = jnp.arctan2(siny, cosy)
    return jnp.stack([roll, pitch, yaw], axis=-1)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix from xyzw quaternion."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def quat_integrate(q: jnp.ndarray, omega: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate unit quaternion by world-frame angular velocity omega for dt."""
    dq = quat_mul(
        jnp.concatenate([omega * dt * 0.5, jnp.zeros_like(omega[..., :1])], -1), q
    )
    return quat_normalize(q + dq)


# ------------------------------------------------------------ rigid transforms


def transform_mul(p1, q1, p2, q2):
    """Compose rigid transforms: PyBullet multiplyTransforms parity."""
    return p1 + quat_rotate(q1, p2), quat_mul(q1, q2)


def transform_inv(p, q):
    qi = quat_conj(q)
    return -quat_rotate(qi, p), qi


def transform_point(p, q, v):
    return p + quat_rotate(q, v)


# ------------------------------------------------------------------- misc


def normalize(v: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def orthogonal_vector(v: jnp.ndarray) -> jnp.ndarray:
    """A vector orthogonal to v (reference semantics: util.py:155-163)."""
    m = jnp.argmax(jnp.abs(v), axis=-1)
    y = jnp.zeros_like(v)
    idx = (m + 1) % v.shape[-1]
    y = y.at[..., :].set(0.0)
    one = jnp.ones(v.shape[:-1], dtype=v.dtype)
    y = y.at[..., 0].set(jnp.where(idx == 0, one, 0.0))
    y = y.at[..., 1].set(jnp.where(idx == 1, one, 0.0))
    y = y.at[..., 2].set(jnp.where(idx == 2, one, 0.0))
    return jnp.cross(v, y)
