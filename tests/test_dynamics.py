import numpy as np
import jax
import jax.numpy as jnp

from assistive_gym_tpu.physics import dynamics, kinematics, model as pm


def _pendulum(length=0.5, mass=1.0, axis=(0.0, 1.0, 0.0)):
    """Single revolute link: joint at origin, point mass at (0,0,-length)."""
    return pm.ArticulatedModel(
        name="pendulum",
        link_names=("bob",),
        parent=np.array([-1], np.int32),
        joint_type=np.array([pm.JOINT_REVOLUTE], np.int32),
        origin_xyz=np.zeros((1, 3), np.float32),
        origin_quat=np.array([[0, 0, 0, 1]], np.float32),
        axis=np.array([axis], np.float32),
        lower=np.array([0.0], np.float32),
        upper=np.array([-1.0], np.float32),
        damping=np.zeros(1, np.float32),
        mass=np.array([mass], np.float32),
        com=np.array([[0, 0, -length]], np.float32),
        inertia_diag=np.zeros((1, 3), np.float32),
        inertia_quat=np.array([[0, 0, 0, 1]], np.float32),
    )


def test_crba_pendulum_inertia():
    l, m = 0.7, 2.3
    mdl = _pendulum(l, m)
    fk = kinematics.fk(mdl, jnp.zeros(1), jnp.zeros(3), jnp.array([0, 0, 0, 1.0]))
    M = dynamics.crba(mdl, fk)
    np.testing.assert_allclose(float(M[0, 0]), m * l * l, rtol=1e-5)


def test_rnea_gravity_torque():
    l, m, g = 0.5, 1.0, 9.81
    mdl = _pendulum(l, m)
    for q0 in [0.3, -1.2, 2.0]:
        fk = kinematics.fk(mdl, jnp.array([q0]), jnp.zeros(3), jnp.array([0, 0, 0, 1.0]))
        bias = dynamics.rnea_bias(mdl, fk, jnp.zeros(1), jnp.array([0, 0, -g]))
        # qdd = -bias/M must equal -(g/l) sin(q)
        M = dynamics.crba(mdl, fk)
        qdd = float(-bias[0] / M[0, 0])
        np.testing.assert_allclose(qdd, -(g / l) * np.sin(q0), rtol=1e-4, atol=1e-5)


def test_pendulum_energy_conservation():
    l, m, g = 0.5, 1.0, 9.81
    mdl = _pendulum(l, m)
    dt = 1e-3
    q, qd = jnp.array([1.0]), jnp.zeros(1)

    def step(carry, _):
        q, qd = carry
        res = dynamics.substep(mdl, q, qd, dt, jnp.array([0, 0, -g]))
        return (res.q, res.qd), None

    step_j = jax.jit(lambda c: jax.lax.scan(step, c, None, length=2000)[0])
    qf, qdf = step_j((q, qd))

    def energy(q, qd):
        h = -l * np.cos(float(q[0]))
        return m * g * h + 0.5 * m * (l * float(qd[0])) ** 2

    e0, e1 = energy(q, qd), energy(qf, qdf)
    assert abs(e1 - e0) < 0.02 * abs(e0) + 2e-3, (e0, e1)


def test_frozen_dof_holds():
    mdl = _pendulum()
    res = dynamics.substep(
        mdl, jnp.array([0.4]), jnp.array([1.0]), 0.01, jnp.array([0, 0, -9.81]),
        active=jnp.array([False]),
    )
    np.testing.assert_allclose(float(res.q[0]), 0.4)
    np.testing.assert_allclose(float(res.qd[0]), 0.0)


def test_motor_tracks_target_and_respects_cap():
    mdl = _pendulum(0.5, 1.0)
    dt = 0.01
    target = jnp.array([0.3])

    def roll(force_cap, n):
        q, qd = jnp.zeros(1), jnp.zeros(1)
        for _ in range(n):
            r = dynamics.substep(
                mdl, q, qd, dt, jnp.zeros(3),
                motor_target=target, motor_kp=jnp.array([0.3]),
                motor_force=jnp.array([force_cap]),
            )
            q, qd = r.q, r.qd
        return float(q[0])

    # generous cap: converges to target
    assert abs(roll(50.0, 300) - 0.3) < 1e-3
    # tiny cap: barely moves in the same time
    assert roll(0.001, 50) < 0.05


def test_joint_limit_projection():
    mdl = _pendulum()
    mdl = type(mdl)(**{**mdl.__dict__})
    res = dynamics.substep(
        mdl, jnp.array([0.0]), jnp.array([10.0]), 0.01, jnp.zeros(3),
        limit_lower=jnp.array([-0.05]), limit_upper=jnp.array([0.05]),
    )
    assert float(res.q[0]) <= 0.05 + 1e-7
    np.testing.assert_allclose(float(res.qd[0]), 0.0)


def test_two_link_mass_matrix_symmetry_psd():
    # two-link chain with offsets and mixed axes
    mdl = pm.ArticulatedModel(
        name="two",
        link_names=("a", "b"),
        parent=np.array([-1, 0], np.int32),
        joint_type=np.array([pm.JOINT_REVOLUTE, pm.JOINT_REVOLUTE], np.int32),
        origin_xyz=np.array([[0, 0, 0], [0, 0, -0.4]], np.float32),
        origin_quat=np.array([[0, 0, 0, 1]] * 2, np.float32),
        axis=np.array([[0, 1, 0], [1, 0, 0]], np.float32),
        lower=np.zeros(2, np.float32),
        upper=-np.ones(2, np.float32),
        damping=np.zeros(2, np.float32),
        mass=np.array([1.0, 0.5], np.float32),
        com=np.array([[0, 0, -0.2], [0, 0, -0.15]], np.float32),
        inertia_diag=np.full((2, 3), 1e-3, np.float32),
        inertia_quat=np.array([[0, 0, 0, 1]] * 2, np.float32),
    )
    rng = np.random.default_rng(3)
    for _ in range(5):
        q = jnp.asarray(rng.uniform(-2, 2, 2).astype(np.float32))
        fk = kinematics.fk(mdl, q, jnp.zeros(3), jnp.array([0, 0, 0, 1.0]))
        M = np.asarray(dynamics.crba(mdl, fk))
        np.testing.assert_allclose(M, M.T, atol=1e-5)
        assert np.all(np.linalg.eigvalsh(M) > 0)


def test_wrench_to_torque_matches_jacobian():
    mdl = _pendulum(0.5, 1.0)
    q = jnp.array([0.7])
    fk = kinematics.fk(mdl, q, jnp.zeros(3), jnp.array([0, 0, 0, 1.0]))
    f = jnp.array([[1.0, 2.0, 3.0]])
    point = fk.pos[0]  # force applied at link origin
    tau = kinematics.link_wrenches_to_joint_torques(mdl, fk, f, jnp.zeros((1, 3)))
    J = kinematics.point_jacobian(mdl, fk, 0, point)
    tau_ref = J[:3].T @ f[0]
    np.testing.assert_allclose(np.asarray(tau), np.asarray(tau_ref), atol=1e-5)
