"""Featherstone articulated rigid-body dynamics: CRBA + RNEA, fp32, batched.

TPU-native replacement for Bullet's C++ multibody solver behind
p.stepSimulation (reference hot loop: assistive_gym/envs/env.py:133-134).

Formulated in world-origin spatial coordinates (Plücker coordinates about a
fixed origin), where chain recursions collapse into dense matmuls against
STATIC ancestor/subtree masks (see kinematics._masks):

  CRBA:  Ic_comp[d] = subtree_mask @ I_O         (composite inertias)
         M[k,j]     = S_k . (Ic_comp[j] S_j)     masked by dof-ancestry
  RNEA:  v          = anc_mask @ (S qd)
         a          = a_base + anc_mask @ (v_parent x S qd)
         tau        = S . (subtree_mask @ (I_O a + v x* I_O v))

No sequential chains — ideal for both the MXU and XLA's CPU backend (which
compiles long dependent op-chains superlinearly).

Spatial vector layout: motion m = [omega; v_O], force f = [n_O; f].

Joint PD position control reproduces Bullet's POSITION_CONTROL servo
(reference env.py:127-129, setJointMotorControlArray with positionGains and
force caps): a velocity-level motor impulse lambda = m_app * (kp*dq/dt - kd*qd)
clamped to +-maxForce*dt, where m_app is the joint's apparent inertia from
the articulated mass matrix.

The reference's mass=0 "static link" trick (world_creation.py:140-144) maps
to the `active` dof mask: frozen dofs hold position exactly.

All matmuls are small and must be exact fp32 even on TPU (MXU defaults to
bf16 inputs), so public entry points run under
jax.default_matmul_precision('float32') — negligible cost at these shapes,
and it keeps rollouts bit-reproducible across platforms.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import math3d as m3
from .kinematics import FK, _masks, fk, motion_subspace
from .model import ArticulatedModel, JOINT_PRISMATIC, JOINT_REVOLUTE


def _f32_matmuls(fn):
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)
    return wrapped


def _skew(v):
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], -1),
        jnp.stack([z, zero, -x], -1),
        jnp.stack([-y, x, zero], -1),
    ], -2)


def _rel_links(model: ArticulatedModel, dofs) -> np.ndarray:
    """Static link subset that can contribute to reduced dynamics over `dofs`:
    the union of those dofs' subtrees.  Links outside it have zero velocity
    (their dofs are frozen) and project to zero torque on `dofs`, so all
    link-level work (spatial inertias, RNEA sweeps) shrinks to this set —
    e.g. Feeding simulates 4 head dofs of the 41-link human, so only the
    head's ~4 links enter the O(L) sweeps instead of all 41."""
    key = "_rel_links_cache"
    cache = getattr(model, key, None)
    if cache is None:
        cache = {}
        object.__setattr__(model, key, cache)
    tkey = tuple(int(d) for d in np.asarray(dofs).tolist())
    if tkey not in cache:
        _, subtree_dof, _ = _masks(model)
        sub = np.asarray(subtree_dof)[np.asarray(tkey, np.int32)]
        cache[tkey] = np.nonzero(sub.sum(0) > 0)[0].astype(np.int32)
    return cache[tkey]


def _spatial_inertia_origin(model: ArticulatedModel, fk_res: FK,
                            mass=None, com=None, inertia_diag=None,
                            links=None) -> jnp.ndarray:
    """f32[L,6,6] spatial inertia of each link about the world origin.
    mass/com/inertia_diag optionally override the static model (per-env
    gender-dependent bodies).  `links`: optional static subset."""
    mass = jnp.asarray(model.mass) if mass is None else mass
    com = jnp.asarray(model.com) if com is None else com
    inertia_diag = jnp.asarray(model.inertia_diag) if inertia_diag is None else inertia_diag
    pos, quat = fk_res.pos, fk_res.quat
    inertia_quat = jnp.asarray(model.inertia_quat)
    if links is not None:
        mass, com, inertia_diag = mass[links], com[links], inertia_diag[links]
        pos, quat, inertia_quat = pos[links], quat[links], inertia_quat[links]
    Rl = m3.quat_to_mat(quat)                             # [L,3,3]
    Rp = m3.quat_to_mat(inertia_quat)                     # [L,3,3]
    R = Rl @ Rp
    Ic = R @ (inertia_diag[:, :, None] * jnp.swapaxes(R, -1, -2))
    c = pos + m3.quat_rotate(quat, com)                   # world com
    m = mass[:, None, None]
    cx = _skew(c)
    top_left = Ic + m * (cx @ jnp.swapaxes(cx, -1, -2))
    top_right = m * cx
    bot_left = m * jnp.swapaxes(cx, -1, -2)
    bot_right = m * jnp.broadcast_to(jnp.eye(3, dtype=cx.dtype), cx.shape)
    return jnp.concatenate([
        jnp.concatenate([top_left, top_right], -1),
        jnp.concatenate([bot_left, bot_right], -1),
    ], -2)


def _cross_motion(m1, m2):
    w1, v1 = m1[..., :3], m1[..., 3:]
    w2, v2 = m2[..., :3], m2[..., 3:]
    return jnp.concatenate([jnp.cross(w1, w2), jnp.cross(w1, v2) + jnp.cross(v1, w2)], -1)


def _cross_force(m, f):
    w, v = m[..., :3], m[..., 3:]
    n, fl = f[..., :3], f[..., 3:]
    return jnp.concatenate([jnp.cross(w, n) + jnp.cross(v, fl), jnp.cross(w, fl)], -1)


@_f32_matmuls
def crba(model: ArticulatedModel, fk_res: FK, inertial=None, dofs=None) -> jnp.ndarray:
    """Composite-rigid-body mass matrix f32[n,n] (Featherstone CRBA).
    `inertial`: optional dict(mass=, com=, inertia_diag=) per-env override.
    `dofs`: static dof subset -> reduced mass matrix over those dofs only."""
    inertial = inertial or {}
    S = motion_subspace(model, fk_res, dofs)                   # [n,6]
    _, subtree_dof, dof_anc = _masks(model)
    nlinks = model.nlinks
    rel = None
    if dofs is not None:
        d = np.asarray(dofs)
        rel = _rel_links(model, d)
        subtree_dof = subtree_dof[np.ix_(d, rel)]
        dof_anc = dof_anc[np.ix_(d, d)]
        nlinks = len(rel)
    I_O = _spatial_inertia_origin(model, fk_res, links=rel, **inertial)
    # composite inertia of each dof's subtree: one [n,R]x[R,36] matmul
    Ic = (jnp.asarray(subtree_dof) @ I_O.reshape(nlinks, 36)).reshape(-1, 6, 6)
    F = jnp.einsum("jab,jb->ja", Ic, S)                        # [n,6]
    M_full = S @ F.T                                           # [n,n]: M_full[k,j] = S_k . F_j
    upper = M_full * jnp.asarray(dof_anc.T)                                 # keep k anc-or-self of j
    M = upper + upper.T - jnp.diag(jnp.diagonal(upper))
    return M


@_f32_matmuls
def rnea_bias(model: ArticulatedModel, fk_res: FK, qd: jnp.ndarray,
              gravity: jnp.ndarray, inertial=None, dofs=None) -> jnp.ndarray:
    """Bias torques C(q,qd) + g(q): RNEA with qdd = 0, f32[n].
    `qd` is indexed by the (possibly reduced) dof list `dofs`.

    Gravity enters as the standard fictitious base acceleration -g.
    Per-body gravity (the reference's p.setGravity(..., body=...) trick,
    e.g. feeding.py:171-173) is supported since each articulated system is
    its own model.
    """
    inertial = inertial or {}
    S = motion_subspace(model, fk_res, dofs)                   # [n,6]
    anc_dof, subtree_dof, _ = _masks(model)
    dl = np.asarray(model.dof_links)
    rel = None
    if dofs is not None:
        d = np.asarray(dofs)
        rel = _rel_links(model, d)
        # dof link positions within the reduced link list
        dl = np.searchsorted(rel, dl[d])
        anc_dof = anc_dof[np.ix_(rel, d)]
        subtree_dof = subtree_dof[np.ix_(d, rel)]
    I_O = _spatial_inertia_origin(model, fk_res, links=rel, **inertial)
    f32d = fk_res.pos.dtype

    Sqd = S * qd[:, None]                                      # [n,6]
    v = jnp.asarray(anc_dof) @ Sqd                                          # [R,6] link spatial vel
    v_parent_of_dof = v[dl] - Sqd                              # parent link vel per dof
    coriolis = _cross_motion(v_parent_of_dof, Sqd)             # [n,6]
    a_base = jnp.concatenate([jnp.zeros(3, f32d), -gravity])
    a = jnp.asarray(anc_dof) @ coriolis + a_base[None, :]                   # [L,6]

    Iv = jnp.einsum("lab,lb->la", I_O, v)
    f = jnp.einsum("lab,lb->la", I_O, a) + _cross_force(v, Iv)  # [L,6]
    acc = jnp.asarray(subtree_dof) @ f                                       # [n,6]
    return jnp.sum(S * acc, -1)


def _pcg_solve(A, b, iters: int):
    """Jacobi-preconditioned conjugate gradients for one SPD system.

    TPU-motivated alternative to cho_factor/cho_solve: under vmap, batched
    Cholesky of small (n<=40) matrices lowers to a sequential loop of tiny
    dynamic-slice updates (~130 ms per [4096,40,40] batch on v5e), while CG
    is `iters` batched matvecs — pure MXU work.  With iters=n CG is exact in
    exact arithmetic; in fp32 with the Jacobi preconditioner the residual on
    these mass matrices lands at ~1e-6 relative (pinned in
    tests/test_dynamics.py::test_substep_cg_matches_cholesky).  Used on the
    reset-time settle path only — take_step keeps the Cholesky solve so
    rollout goldens stay bitwise stable.
    """
    dinv = 1.0 / jnp.diagonal(A)
    x = dinv * b
    r = b - A @ x
    z = dinv * r
    p = z
    rz = r @ z

    def body(carry, _):
        x, r, p, rz = carry
        Ap = A @ p
        alpha = rz / jnp.maximum(p @ Ap, 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        z = dinv * r
        rz_new = r @ z
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return (x, r, p, rz_new), None

    (x, _, _, _), _ = jax.lax.scan(body, (x, r, p, rz), None, length=iters)
    return x


class StepResult(NamedTuple):
    q: jnp.ndarray
    qd: jnp.ndarray


@_f32_matmuls
def substep(
    model: ArticulatedModel,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    dt: float,
    gravity,
    tau_ext: Optional[jnp.ndarray] = None,   # contact torques, f32[ndof]
    active: Optional[jnp.ndarray] = None,    # bool[ndof] moving dofs
    motor_target: Optional[jnp.ndarray] = None,  # f32[ndof]
    motor_kp: Optional[jnp.ndarray] = None,
    motor_kd: Optional[jnp.ndarray] = None,
    motor_force: Optional[jnp.ndarray] = None,   # torque cap per dof
    motor_on: Optional[jnp.ndarray] = None,      # bool[ndof]
    limit_lower: Optional[jnp.ndarray] = None,
    limit_upper: Optional[jnp.ndarray] = None,
    fk_res: Optional[FK] = None,
    base_pos: Optional[jnp.ndarray] = None,
    base_quat: Optional[jnp.ndarray] = None,
    inertial=None,
    sim_dofs=None,
    solver: str = "chol",   # "chol" (exact, rollout path) | "cg" (settle path)
) -> StepResult:
    """One semi-implicit Euler physics substep of a fixed-base tree.

    Order mirrors Bullet's pipeline: forward dynamics (gravity + external
    contact torques + joint damping), motor impulses (position servo with
    force caps), integrate, hard joint-limit projection
    (reference: env.py:133-137,179-201).
    """
    f32 = q.dtype
    if fk_res is None:
        bp = jnp.zeros(3, f32) if base_pos is None else base_pos
        bq = jnp.array([0, 0, 0, 1], f32) if base_quat is None else base_quat
        fk_res = fk(model, q, bp, bq)
    gravity = jnp.asarray(gravity, f32)

    # static reduction: only the task's movable dof subset is simulated
    # (the reference's mass=0 freeze, world_creation.py:140-144)
    if sim_dofs is not None:
        sd = np.asarray(sim_dofs, np.int32)
        if len(sd) == 0:
            return StepResult(q, jnp.zeros_like(qd))
    else:
        sd = np.arange(model.ndof, dtype=np.int32)
    n = len(sd)

    def sub(x):
        return None if x is None else x[sd]

    tau = jnp.zeros(n, f32) if tau_ext is None else sub(tau_ext)
    act = jnp.ones(n, bool) if active is None else sub(active)
    qs, qds = q[sd], qd[sd]

    M = crba(model, fk_res, inertial, dofs=sd)
    bias = rnea_bias(model, fk_res, qds * act, gravity, inertial, dofs=sd)
    damping = jnp.asarray(model.damping[model.dof_links[sd]], f32)

    # Freeze masked dofs by identity rows/cols (exact hold, like mass=0 links).
    actf = act.astype(f32)
    mask = actf[:, None] * actf[None, :]
    M_act = M * mask + jnp.diag(1.0 - actf)
    # implicit joint damping for stability
    M_imp = M_act + jnp.diag(damping * actf) * dt
    rhs = (tau - bias - damping * qds) * actf
    M_reg = M_imp + 1e-8 * jnp.eye(n, dtype=f32)
    if solver == "cg":
        qdd = _pcg_solve(M_reg, rhs, iters=n)
    else:
        Mchol = jax.scipy.linalg.cho_factor(M_reg)
        qdd = jax.scipy.linalg.cho_solve(Mchol, rhs)
    qd1 = qds + dt * qdd * actf

    # --- position-servo motor impulses (Bullet POSITION_CONTROL parity) ---
    if motor_target is not None:
        # apparent inertia ~ diag(M): only affects where the force cap binds
        # (unclamped impulses reach v_err exactly regardless of m_app)
        m_app = jnp.maximum(jnp.diagonal(M_imp), 1e-8)
        kp = jnp.zeros(n, f32) if motor_kp is None else sub(motor_kp)
        kd = jnp.ones(n, f32) if motor_kd is None else sub(motor_kd)
        cap = jnp.full(n, jnp.inf, f32) if motor_force is None else sub(motor_force)
        on = jnp.ones(n, bool) if motor_on is None else sub(motor_on)
        v_err = kp * (sub(motor_target) - qs) / dt - kd * qd1
        lam = jnp.clip(m_app * v_err, -cap * dt, cap * dt)
        qd1 = qd1 + jnp.where(on & act, lam / m_app, 0.0)

    # velocity clamp: keeps rare contact-energized envs inside the
    # integrator's validity regime (0.24 rad/substep at dt=0.02).  Healthy
    # envs command <~1 rad/s (the reference's Bullet arms likewise), so the
    # clamp is unobservable except as a stability guard.
    qd1 = jnp.clip(qd1, -12.0, 12.0)
    q1 = qs + dt * qd1 * actf

    # --- hard joint-limit projection (env.py:179-201 semantics) ---
    if limit_lower is not None:
        ll, lu = sub(limit_lower), sub(limit_upper)
        limited = lu >= ll                     # pybullet (0,-1) = unlimited
        q_cl = jnp.clip(q1, ll, lu)
        hit = limited & (q_cl != q1)
        q1 = jnp.where(limited, q_cl, q1)
        qd1 = jnp.where(hit, 0.0, qd1)

    q_full = q.at[sd].set(q1)
    qd_full = jnp.zeros_like(qd).at[sd].set(qd1 * actf)
    return StepResult(q_full, qd_full)
