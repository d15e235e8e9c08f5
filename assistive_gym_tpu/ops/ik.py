"""Batched damped-least-squares inverse kinematics.

TPU-native replacement for p.calculateInverseKinematics + the reference's
random-restart wrappers (util.py:13-91): instead of a Python loop of 40
sequential IK calls (util.py:17), all restarts solve in parallel under vmap
and the best solution is selected with argmin — one jitted program, no host
round-trips (SURVEY.md §2.2 N4).

The solver iterates q <- q + J^T (J J^T + lambda I)^-1 e over a masked dof
subset with joint-limit clamping each step, seeded by uniform-random rest
poses exactly like the reference randomises restPoses (util.py:82).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..physics import kinematics as kin
from ..physics.model import ArticulatedModel
from . import math3d as m3


def quat_orientation_error(q: jnp.ndarray, q_target: jnp.ndarray) -> jnp.ndarray:
    """Rotation-vector error taking q to q_target (world frame), f32[3]."""
    dq = m3.quat_mul(q_target, m3.quat_conj(q))
    dq = jnp.where(dq[..., 3:4] < 0, -dq, dq)
    return 2.0 * dq[..., :3]


def _chol_unrolled(A: jnp.ndarray):
    """Cholesky factor of a tiny static-size SPD matrix (m<=6), unrolled to
    elementwise ops on the batch axes; returns L as a list-of-lists.

    jax.scipy.linalg.solve(assume_a="pos") / jnp.linalg.det on [*,6,6]
    under the reset vmaps (4096 envs x 40-100 restarts) lower to batched
    LAPACK-style routines that serialise on TPU — the same pathology round
    4 measured for the vmapped [4096,40,40] settle solve (~130 ms/factor).
    Unrolled, the m=6 factor is ~60 mul/div of pure VPU work per lane.
    Same math as the library Cholesky (fp32), with a 1e-12 pivot floor.

    NOT wired into dls_ik/jlwki_score: the last-ulp rounding differences
    shift which restart/base candidate wins the reset argmax (measured:
    the FeedingJaco PRNGKey(0) reset flips to a spoon pose that spills the
    food — tests/test_tasks.py::test_feeding_food_stays_in_scoop).  Every
    banked policy was trained against the library-solve reset
    distribution, so the reset arithmetic is behaviourally pinned.  These
    kernels are the measured-correct drop-ins (tests/test_math3d.py) for a
    future round that retrains from scratch."""
    m = A.shape[-1]
    L = [[None] * m for _ in range(m)]
    for j in range(m):
        s = A[..., j, j]
        for t in range(j):
            s = s - L[j][t] * L[j][t]
        Ljj = jnp.sqrt(jnp.maximum(s, 1e-12))
        L[j][j] = Ljj
        inv = 1.0 / Ljj
        for i in range(j + 1, m):
            s = A[..., i, j]
            for t in range(j):
                s = s - L[i][t] * L[j][t]
            L[i][j] = s * inv
    return L


def _solve_spd_unrolled(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b for tiny SPD A via the unrolled Cholesky (see
    _chol_unrolled).  A = J J^T + lambda^2 I is SPD by construction."""
    m = A.shape[-1]
    L = _chol_unrolled(A)
    y = [None] * m
    for i in range(m):
        s = b[..., i]
        for t in range(i):
            s = s - L[i][t] * y[t]
        y[i] = s / L[i][i]
    x = [None] * m
    for i in range(m - 1, -1, -1):
        s = y[i]
        for t in range(i + 1, m):
            s = s - L[t][i] * x[t]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def _det_spd_unrolled(A: jnp.ndarray) -> jnp.ndarray:
    """det of a tiny SPD matrix = prod(diag(L))^2 (see _chol_unrolled).
    Replaces jnp.linalg.det's batched LU in the JLWKI hot loop; for
    singular PSD inputs the 1e-12 pivot floor yields det ~ 0, matching the
    reference's max(det, 0) clamp (env.py:339-342)."""
    L = _chol_unrolled(A)
    d = L[0][0]
    for j in range(1, A.shape[-1]):
        d = d * L[j][j]
    return d * d


class IKResult(NamedTuple):
    q: jnp.ndarray          # full dof vector with solved arm values
    pos_err: jnp.ndarray    # final end-effector position error (norm)
    orient_err: jnp.ndarray # final orientation error (norm, 0 if untargeted)
    success: jnp.ndarray    # bool


def dls_ik(
    model: ArticulatedModel,
    ee_link: int,
    target_pos: jnp.ndarray,
    target_quat: Optional[jnp.ndarray],
    q_init: jnp.ndarray,
    arm_dofs: Sequence[int],
    base_pos: jnp.ndarray,
    base_quat: jnp.ndarray,
    lower: jnp.ndarray,
    upper: jnp.ndarray,
    iters: int = 40,
    damping: float = 0.05,
    pos_threshold: float = 0.03,
    origin_xyz: Optional[jnp.ndarray] = None,
) -> IKResult:
    """Solve for the dofs in `arm_dofs` (static index list); others frozen.

    lower/upper: limits for arm dofs only (pybullet (0,-1) = unlimited,
    mapped to +-2*pi following the reference, util.py:69-73).
    """
    arm = np.asarray(arm_dofs, np.int32)
    unlimited = upper < lower
    lo = jnp.where(unlimited, -2 * jnp.pi, lower)
    hi = jnp.where(unlimited, 2 * jnp.pi, upper)

    def err(q):
        fkr = kin.fk(model, q, base_pos, base_quat, origin_xyz=origin_xyz)
        e_pos = target_pos - fkr.pos[ee_link]
        if target_quat is not None:
            e_rot = quat_orientation_error(fkr.quat[ee_link], target_quat)
            return jnp.concatenate([e_pos, e_rot]), fkr
        return e_pos, fkr

    def body(q, _):
        e, fkr = err(q)
        J_full = kin.point_jacobian(model, fkr, ee_link, fkr.pos[ee_link])
        J = J_full[: e.shape[0], arm]                       # [m, n_arm]
        JJt = J @ J.T + (damping ** 2) * jnp.eye(e.shape[0], dtype=q.dtype)
        dq_arm = J.T @ jax.scipy.linalg.solve(JJt, e, assume_a="pos")
        dq_arm = jnp.clip(dq_arm, -0.5, 0.5)
        q_arm = jnp.clip(q[arm] + dq_arm, lo, hi)
        return q.at[arm].set(q_arm), None

    with jax.default_matmul_precision("float32"):
        q_final, _ = jax.lax.scan(body, q_init, None, length=iters)
    e, fkr = err(q_final)
    pos_err = jnp.linalg.norm(target_pos - fkr.pos[ee_link])
    if target_quat is not None:
        o_err = jnp.linalg.norm(quat_orientation_error(fkr.quat[ee_link], target_quat))
    else:
        o_err = jnp.zeros((), q_final.dtype)
    ok = (pos_err < pos_threshold) & (o_err < (0.25 if target_quat is not None else jnp.inf))
    return IKResult(q_final, pos_err, o_err, ok)


def ik_random_restarts(
    key: jax.Array,
    model: ArticulatedModel,
    ee_link: int,
    target_pos: jnp.ndarray,
    target_quat: Optional[jnp.ndarray],
    q_base: jnp.ndarray,
    arm_dofs: Sequence[int],
    base_pos: jnp.ndarray,
    base_quat: jnp.ndarray,
    lower: jnp.ndarray,
    upper: jnp.ndarray,
    restarts: int = 40,
    iters: int = 40,
    pos_threshold: float = 0.03,
    origin_xyz=None,
    collision_penalty=None,
) -> IKResult:
    """All restarts in parallel (vmap), best-by-position-error selection —
    semantics of util.ik_random_restarts (util.py:13-36) without the serial
    loop.

    collision_penalty: optional fn(q) -> penetration depth (m).  Solutions
    in (self-)collision are deprioritized exactly like the reference's
    retry-on-self-contact loop (util.py:22-25): a colliding restart only
    wins when every restart collides."""
    arm = np.asarray(arm_dofs, np.int32)
    unlimited = upper < lower
    lo = jnp.where(unlimited, -2 * jnp.pi, lower)
    hi = jnp.where(unlimited, 2 * jnp.pi, upper)
    seeds = jax.random.uniform(key, (restarts, len(arm_dofs)), minval=lo, maxval=hi,
                               dtype=q_base.dtype)
    q_inits = jnp.tile(q_base[None], (restarts, 1)).at[:, arm].set(seeds)

    res = jax.vmap(
        lambda qi: dls_ik(model, ee_link, target_pos, target_quat, qi, arm_dofs,
                          base_pos, base_quat, lower, upper, iters=iters,
                          pos_threshold=pos_threshold, origin_xyz=origin_xyz)
    )(q_inits)
    # prefer successful solutions, then smallest position error
    score = res.pos_err + jnp.where(res.success, 0.0, 1e3)
    if collision_penalty is not None:
        pen = jax.vmap(collision_penalty)(res.q)
        score = score + jnp.where(pen > 1e-3, 1e2, 0.0)
    best = jnp.argmin(score)
    return IKResult(res.q[best], res.pos_err[best], res.orient_err[best],
                    res.success[best])


# ------------------------------------------------------------------ JLWKI

def joint_limited_weighting(q, lower, upper, phi=0.5, lam=0.05):
    """Diagonal joint-limit proximity weights (env.py:257-268)."""
    qr = 0.5 * (upper - lower)
    w = 1.0 - jnp.power(phi, (qr - jnp.abs(qr - q + lower)) / (lam * qr) + 1.0)
    return jnp.maximum(w, 0.001)


def jlwki_score(J, q, lower, upper):
    """Joint-limited-weighted kinematic isotropy (env.py:339-342):
    det(J W J^T)^(1/6) / (trace(J W J^T)/6)."""
    w = joint_limited_weighting(q, lower, upper)
    A = (J * w[None, :]) @ J.T
    det = jnp.maximum(jnp.linalg.det(A), 0.0)
    a = 6.0
    return jnp.power(det, 1.0 / a) / (jnp.trace(A) / a)


def position_robot_toc(
    key: jax.Array,
    model: ArticulatedModel,
    arms,                      # list of (ee_link, arm_dofs, lower, upper)
    start_goals,               # per arm: list of (pos, quat|None) start targets
    extra_goals,               # per arm: list of (pos, quat|None) extra targets
    q_base: jnp.ndarray,       # default dof vector (reset_robot_joints pose)
    base_quat_center,          # euler z centre
    pos_offset,
    attempts: int = 50,
    ik_iters: int = 40,
    right_side: bool = True,
    random_rotation: float = 30.0,
    random_position: float = 0.5,
    base_euler_orient=(0.0, 0.0, 0.0),
):
    """Task-centric base-pose optimisation (env.py:280-376) as one batched
    program: `attempts` random base candidates are scored in parallel under
    vmap instead of the reference's sequential 100-iteration Python loop.

    Candidate scoring follows the reference: every start goal must reach IK
    success (else the candidate is invalid), each reached goal adds its best
    JLWKI manipulability; best candidate = most goals reached, ties broken by
    manipulability (env.py:359-367).

    Returns (base_pos, base_quat, q_start) for the best candidate.
    """
    f32 = q_base.dtype
    k_pos, k_rot, k_ik = jax.random.split(key, 3)
    lo_x = -random_position if right_side else 0.0
    hi_x = 0.0 if right_side else random_position
    xs = jax.random.uniform(k_pos, (attempts,), f32, lo_x, hi_x)
    ys = jax.random.uniform(k_pos, (attempts,), f32, -random_position, random_position)
    yaw = jnp.deg2rad(jax.random.uniform(k_rot, (attempts,), f32,
                                         -random_rotation, random_rotation))
    base_pos_c = (jnp.asarray([-0.85, -0.4, 0.0], f32) + jnp.asarray(pos_offset, f32)
                  + jnp.stack([xs, ys, jnp.zeros_like(xs)], -1))
    eul = jnp.asarray(base_euler_orient, f32)
    base_quat_c = m3.quat_from_euler(
        jnp.stack([jnp.full_like(yaw, eul[0]), jnp.full_like(yaw, eul[1]),
                   eul[2] + yaw], -1))

    ik_keys = jax.random.split(k_ik, attempts)

    def eval_candidate(bp, bq, kk):
        num_reached = jnp.zeros((), f32)
        manip = jnp.zeros((), f32)
        start_ok = jnp.ones((), bool)
        q_starts = []
        gk = jax.random.split(kk, sum(len(sg) + len(eg) for sg, eg in zip(start_goals, extra_goals)) + 1)
        gi = 0
        for ai, (ee, dofs, lo, hi) in enumerate(arms):
            q_start_arm = q_base
            for j, (gpos, gquat) in enumerate(list(start_goals[ai]) + list(extra_goals[ai])):
                res = dls_ik(model, ee, jnp.asarray(gpos, f32),
                             None if gquat is None else jnp.asarray(gquat, f32),
                             q_base, dofs, bp, bq, lo, hi, iters=ik_iters)
                gi += 1
                fkr = kin.fk(model, res.q, bp, bq)
                J = kin.point_jacobian(model, fkr, ee, fkr.pos[ee])[:, np.asarray(dofs)]
                score = jlwki_score(J, res.q[np.asarray(dofs)], lo, hi)
                num_reached = num_reached + res.success.astype(f32)
                manip = manip + jnp.where(res.success, score, 0.0)
                if j < len(start_goals[ai]):
                    start_ok = start_ok & res.success
                    if j == 0:
                        q_start_arm = res.q
            q_starts.append(q_start_arm)
        total = jnp.where(start_ok, num_reached * 1e4 + manip, -1.0)
        return total, tuple(q_starts)

    with jax.default_matmul_precision("float32"):
        totals, q_starts = jax.vmap(eval_candidate)(base_pos_c, base_quat_c, ik_keys)
    best = jnp.argmax(totals)
    q_best = q_base
    for ai, (ee, dofs, lo, hi) in enumerate(arms):
        d = np.asarray(dofs)
        q_best = q_best.at[d].set(q_starts[ai][best][d])
    return base_pos_c[best], base_quat_c[best], q_best
