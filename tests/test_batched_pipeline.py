"""Batch-last contact/velocity/wrench pipeline vs the per-env reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from assistive_gym_tpu.envs import build_task
from assistive_gym_tpu.physics import batched as pb
from assistive_gym_tpu.physics import contact as con
from assistive_gym_tpu.physics import kinematics as kin

B = 4


@pytest.fixture(scope="module")
def scene():
    task = build_task("scratch_itch", "jaco", False)
    spec = task.spec
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    state, _ = jax.jit(jax.vmap(task.reset))(keys)
    fk_h = jax.vmap(lambda s: kin.fk(spec.human, s.human_q, s.human_base_pos,
                                     s.human_base_quat,
                                     origin_xyz=s.human["origin_xyz"]))(state)
    fk_r = jax.vmap(lambda s: kin.fk(spec.robot, s.robot_q, s.robot_base_pos,
                                     s.robot_base_quat))(state)
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    rqd = jnp.zeros_like(state.robot_qd).at[:, np.asarray(spec.arm_dofs)].set(
        jax.random.normal(k1, (B, len(spec.arm_dofs))) * 0.3)
    hqd = jnp.zeros_like(state.human_qd).at[:, np.asarray(spec.human_controllable)].set(
        jax.random.normal(k2, (B, len(spec.human_controllable))) * 0.2)
    return task, spec, state, fk_h, fk_r, rqd, hqd


def _bl(x):   # [B, N, c] -> [N, c, B]
    return jnp.transpose(x, (1, 2, 0))


def test_evaluate_batched_matches(scene):
    task, spec, state, fk_h, fk_r, rqd, hqd = scene
    r_sim = tuple(sorted(set(spec.arm_dofs)))
    h_sim = spec.human_controllable

    vel_h = jax.vmap(lambda p, q, qd: kin.link_velocities(
        spec.human, kin.FK(p, q), qd, dofs=h_sim))(fk_h.pos, fk_h.quat, hqd)
    vel_r = jax.vmap(lambda p, q, qd: kin.link_velocities(
        spec.robot, kin.FK(p, q), qd, dofs=r_sim))(fk_r.pos, fk_r.quat, rqd)

    ref = jax.vmap(lambda hp, hq, rp, rq, hv, hw, rv, rw, p0, p1, rad:
                   con.evaluate(spec.geoms, spec.pairs,
                                jnp.concatenate([hp, rp], 0),
                                jnp.concatenate([hq, rq], 0),
                                jnp.concatenate([hv, rv], 0),
                                jnp.concatenate([hw, rw], 0),
                                p0=p0, p1=p1, radius=rad))(
        fk_h.pos, fk_h.quat, fk_r.pos, fk_r.quat,
        vel_h.v, vel_h.w, vel_r.v, vel_r.w,
        state.geom_p0, state.geom_p1, state.geom_radius)

    link_pos = _bl(jnp.concatenate([fk_h.pos, fk_r.pos], 1))
    link_quat = _bl(jnp.concatenate([fk_h.quat, fk_r.quat], 1))
    link_v = _bl(jnp.concatenate([vel_h.v, vel_r.v], 1))
    link_w = _bl(jnp.concatenate([vel_h.w, vel_r.w], 1))
    out = pb.evaluate_batched(
        spec.geoms, spec.pairs, link_pos, link_quat, link_v, link_w,
        _bl(state.geom_p0), _bl(state.geom_p1), state.geom_radius.T)

    np.testing.assert_allclose(np.asarray(out.fn.T), np.asarray(ref.fn),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jnp.transpose(out.link_force, (2, 0, 1))),
                               np.asarray(ref.link_force), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jnp.transpose(out.link_torque, (2, 0, 1))),
                               np.asarray(ref.link_torque), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.group_fn.T), np.asarray(ref.group_fn),
                               rtol=1e-4, atol=1e-4)


def test_velocities_and_wrench_batched_match(scene):
    task, spec, state, fk_h, fk_r, rqd, hqd = scene
    r_sim = tuple(sorted(set(spec.arm_dofs)))
    sdr = np.asarray(r_sim)

    vel_ref = jax.vmap(lambda p, q, qd: kin.link_velocities(
        spec.robot, kin.FK(p, q), qd, dofs=r_sim))(fk_r.pos, fk_r.quat, rqd)
    v_b, w_b = pb.link_velocities_b(spec.robot, r_sim, _bl(fk_r.pos),
                                    _bl(fk_r.quat), rqd[:, sdr].T)
    np.testing.assert_allclose(np.asarray(jnp.transpose(v_b, (2, 0, 1))),
                               np.asarray(vel_ref.v), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.transpose(w_b, (2, 0, 1))),
                               np.asarray(vel_ref.w), rtol=1e-4, atol=1e-5)

    key = jax.random.PRNGKey(9)
    Lr = spec.robot.nlinks
    lf = jax.random.normal(key, (B, Lr, 3))
    lt = jax.random.normal(jax.random.fold_in(key, 1), (B, Lr, 3))
    tau_ref = jax.vmap(lambda p, q, f, t: kin.link_wrenches_to_joint_torques(
        spec.robot, kin.FK(p, q), f, t, dofs=r_sim))(fk_r.pos, fk_r.quat, lf, lt)
    tau_b = pb.wrench_to_tau_b(spec.robot, r_sim, _bl(fk_r.pos), _bl(fk_r.quat),
                               _bl(lf), _bl(lt))
    np.testing.assert_allclose(np.asarray(tau_b.T), np.asarray(tau_ref[:, sdr]),
                               rtol=1e-4, atol=1e-4)
