"""Reset-time settle fast path: PCG solve + human-pair pruning.

settle_human (envs/base.py) is the bed-task reset hot loop (200-250
substeps; reference bed_bathing.py:126-141, arm_manipulation.py:116-147).
It diverges from take_step's exact pipeline in two bounded ways, each
pinned here:

1. dynamics.substep(solver="cg"): Jacobi-preconditioned CG instead of the
   batched-Cholesky solve (which serialises on TPU under vmap).  Pinned
   against the Cholesky path on the real 40-dof human mass matrix.
2. PairTable.involving_links: statically drops (robot x furniture/self)
   rows.  Penalty pairs are independent, so human-link wrenches must come
   out bitwise identical.
"""
import jax
import jax.numpy as jnp
import numpy as np

from assistive_gym_tpu.registry import load
from assistive_gym_tpu.envs import base as eb
from assistive_gym_tpu.physics import contact as con
from assistive_gym_tpu.physics import dynamics as dyn
from assistive_gym_tpu.physics import kinematics as kin

f32 = jnp.float32


def _bed():
    task = load("BedBathingJaco-v0")
    state, _ = jax.jit(task.reset)(jax.random.PRNGKey(7))
    return task, state


def test_substep_cg_matches_cholesky():
    """CG vs Cholesky on the full 40-dof human system, contact torques on."""
    task, state = _bed()
    spec = task.spec
    nh = spec.human.ndof
    fk_h = kin.fk(spec.human, state.human_q, state.human_base_pos,
                  state.human_base_quat, origin_xyz=state.human["origin_xyz"])
    rng = np.random.default_rng(0)
    tau = jnp.asarray(rng.normal(0, 2.0, nh).astype(np.float32))
    kwargs = dict(
        tau_ext=tau, limit_lower=state.human["lower"],
        limit_upper=state.human["upper"], fk_res=fk_h,
        inertial=eb._human_inertial(state), sim_dofs=tuple(range(nh)),
    )
    qd0 = jnp.asarray(rng.normal(0, 0.3, nh).astype(np.float32))
    a = dyn.substep(spec.human, state.human_q, qd0, 0.01,
                    jnp.array([0, 0, -1.0], f32), solver="chol", **kwargs)
    b = dyn.substep(spec.human, state.human_q, qd0, 0.01,
                    jnp.array([0, 0, -1.0], f32), solver="cg", **kwargs)
    np.testing.assert_allclose(np.asarray(a.qd), np.asarray(b.qd),
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(a.q), np.asarray(b.q),
                               rtol=0, atol=5e-6)


def test_human_pair_prune_bitwise():
    """Dropping robot-only pairs leaves human-link wrenches bitwise equal."""
    task, state = _bed()
    spec = task.spec
    Lh = spec.n_human_links
    pairs_h = spec.pairs.involving_links(spec.geoms, 0, Lh)
    assert pairs_h.npairs < spec.pairs.npairs  # actually prunes something

    fk_h = kin.fk(spec.human, state.human_q, state.human_base_pos,
                  state.human_base_quat, origin_xyz=state.human["origin_xyz"])
    fk_r = kin.fk(spec.robot, state.robot_q, state.robot_base_pos,
                  state.robot_base_quat)
    pos = jnp.concatenate([fk_h.pos, fk_r.pos], 0)
    quat = jnp.concatenate([fk_h.quat, fk_r.quat], 0)
    vel_h = kin.link_velocities(spec.human, fk_h, state.human_qd)
    zr = jnp.zeros_like(fk_r.pos)
    v = jnp.concatenate([vel_h.v, zr], 0)
    w = jnp.concatenate([vel_h.w, zr], 0)

    def forces(pt):
        c = con.evaluate(spec.geoms, pt, pos, quat, v, w,
                         p0=state.geom_p0, p1=state.geom_p1,
                         radius=state.geom_radius)
        return np.asarray(c.link_force[:Lh]), np.asarray(c.link_torque[:Lh])

    ff, ft = forces(spec.pairs)
    pf, ptq = forces(pairs_h)
    np.testing.assert_array_equal(ff, pf)
    np.testing.assert_array_equal(ft, ptq)


def test_settle_human_sane():
    """Settle keeps the human finite, inside limits, and near the bed."""
    task, state = _bed()
    spec = task.spec
    nh = spec.human.ndof
    hq, hqd = jax.jit(lambda s: eb.settle_human(
        spec, s, sim_dofs=tuple(range(nh)), n_steps=50, dt=0.01))(state)
    hq, hqd = np.asarray(hq), np.asarray(hqd)
    assert np.all(np.isfinite(hq)) and np.all(np.isfinite(hqd))
    lo, hi = np.asarray(state.human["lower"]), np.asarray(state.human["upper"])
    limited = hi >= lo
    assert np.all(hq[limited] >= lo[limited] - 1e-5)
    assert np.all(hq[limited] <= hi[limited] + 1e-5)
