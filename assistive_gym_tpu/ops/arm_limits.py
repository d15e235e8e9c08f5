"""Pose-dependent human arm-limit classifier: the reference's Keras MLP as JAX.

The reference loads realistic_arm_limits_model.h5 with the TF runtime and
calls predict_classes once per physics substep per arm (env.py:63,144-177) —
its single biggest per-step Python/native overhead.  Here the 4->64->64->64->1
(tanh x3, sigmoid) network is three tiny matmuls, jitted and vmapped across
the env batch, evaluated in the same fused program as the physics.

Weights are ported once by tools/compile_assets.py into arm_limits.npz.
Input transform parity: env.py:148-153 (right arm) and env.py:164-169 (left).
"""
from __future__ import annotations

import functools
import os

import jax.numpy as jnp
import numpy as np

_ASSETS = os.path.join(os.path.dirname(__file__), "..", "models", "assets")
TWO_PI = 2.0 * np.pi


@functools.lru_cache(maxsize=1)
def _weights_np():
    z = np.load(os.path.join(_ASSETS, "arm_limits.npz"))
    # cache numpy only: caching jnp constants across jit traces leaks tracers
    return {k: np.asarray(v) for k, v in z.items()}


def _weights():
    return {k: jnp.asarray(v) for k, v in _weights_np().items()}


def valid_prob(x: jnp.ndarray) -> jnp.ndarray:
    """Sigmoid probability that arm pose(s) x f32[...,4] are physically valid."""
    w = _weights()
    h = jnp.tanh(x @ w["w1"] + w["b1"])
    h = jnp.tanh(h @ w["w2"] + w["b2"])
    h = jnp.tanh(h @ w["w3"] + w["b3"])
    return jnp.squeeze(jnp.asarray(h @ w["w4"] + w["b4"]), -1)


def is_valid(x: jnp.ndarray) -> jnp.ndarray:
    """predict_classes parity: sigmoid(logit) > 0.5 <=> logit > 0."""
    return valid_prob(x) > 0.0


def right_arm_features(tz, tx, ty, qe):
    """Joint angles (joints 3,4,5,6) -> Matlab-data feature transform
    (env.py:150-153)."""
    return jnp.stack([
        jnp.mod(-tz + TWO_PI, TWO_PI),
        jnp.mod(tx + TWO_PI, TWO_PI),
        -ty,
        jnp.mod(-qe + TWO_PI, TWO_PI),
    ], -1)


def left_arm_features(tz, tx, ty, qe):
    """Joint angles (joints 13,14,15,16) -> feature transform (env.py:166-169)."""
    return jnp.stack([
        jnp.mod(tz + TWO_PI, TWO_PI),
        jnp.mod(tx + TWO_PI, TWO_PI),
        ty,
        jnp.mod(-qe + TWO_PI, TWO_PI),
    ], -1)


def enforce_realistic_limits(q, qd, prev_valid, arm_joints, right: bool):
    """Rollback-to-last-valid-pose semantics (env.py:154-177) as a where-select.

    q, qd: full human dof vectors; prev_valid: f32[5] = [4 tracked joint
    angles, seen_flag].  The reference initialises the previous valid pose to
    None and only rolls back once a valid pose has been recorded
    (env.py:64,158); the 5th element encodes that flag.  arm_joints: static
    tuple of 4 dof indices (3,4,5,6) or (13,14,15,16).
    Returns (q', qd', prev_valid')."""
    j = np.asarray(arm_joints, np.int32)
    angles = q[j]
    feats = (right_arm_features if right else left_arm_features)(
        angles[0], angles[1], angles[2], angles[3])
    ok = is_valid(feats)
    seen = prev_valid[4] > 0.5
    rollback = (~ok) & seen
    q_new = jnp.where(rollback, q.at[j].set(prev_valid[:4]), q)
    qd_new = jnp.where(rollback, qd.at[j].set(0.0), qd)
    prev_angles = jnp.where(ok, angles, prev_valid[:4])
    flag = jnp.maximum(prev_valid[4], ok.astype(q.dtype))
    prev_new = jnp.concatenate([prev_angles, flag[None]])
    return q_new, qd_new, prev_new
