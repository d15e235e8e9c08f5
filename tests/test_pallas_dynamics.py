"""Fused Pallas dynamics kernel vs the reference XLA substep.

Kernel math is exercised on a small synthetic 4-dof chain so the
interpret-mode (CPU) compile stays fast and the system is well-conditioned —
tolerances are tight (the full-size robot/human kernels run the same
generated code; they are exercised end-to-end on TPU by bench.py and the
per-task smoke, where fp32 summation-order noise against condition(M)~2e3
is the only divergence).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from assistive_gym_tpu.physics import dynamics as dyn
from assistive_gym_tpu.physics import kinematics as kin
from assistive_gym_tpu.physics.model import ArticulatedModel, JOINT_FIXED, JOINT_REVOLUTE
from assistive_gym_tpu.ops import pallas_dynamics as pd

B = 8
DT = 0.01


@pytest.fixture(scope="module")
def chain():
    """4 moving links + 1 fixed tip, varied axes/origins/inertia rotations."""
    L = 5
    rng = np.random.RandomState(0)
    axes = np.asarray([[0, 0, 1], [0, 1, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                      np.float32)
    oq = rng.uniform(-0.2, 0.2, (L, 4)).astype(np.float32)
    oq[:, 3] = 1.0
    oq /= np.linalg.norm(oq, axis=1, keepdims=True)
    iq = rng.uniform(-0.2, 0.2, (L, 4)).astype(np.float32)
    iq[:, 3] = 1.0
    iq /= np.linalg.norm(iq, axis=1, keepdims=True)
    return ArticulatedModel(
        name="chain4", link_names=tuple(f"l{i}" for i in range(L)),
        parent=np.arange(-1, L - 1, dtype=np.int32),
        joint_type=np.asarray([JOINT_REVOLUTE] * 4 + [JOINT_FIXED], np.int32),
        origin_xyz=rng.uniform(-0.3, 0.3, (L, 3)).astype(np.float32),
        origin_quat=oq,
        axis=axes,
        lower=np.asarray([-1.5] * 4 + [0.0], np.float32),
        upper=np.asarray([1.5] * 4 + [-1.0], np.float32),
        damping=np.asarray([0.1, 0.05, 0.1, 0.0, 0.0], np.float32),
        mass=np.asarray([1.0, 0.8, 0.5, 0.4, 0.2], np.float32),
        com=rng.uniform(-0.1, 0.1, (L, 3)).astype(np.float32),
        inertia_diag=rng.uniform(0.01, 0.05, (L, 3)).astype(np.float32),
        inertia_quat=iq,
    )


def _inputs(chain, key):
    sd = (0, 1, 2, 3)
    ks = jax.random.split(key, 6)
    q = jax.random.uniform(ks[0], (B, 4), jnp.float32, -1.0, 1.0)
    qd = jax.random.normal(ks[1], (B, 4)) * 0.5
    tau = jax.random.normal(ks[2], (B, 4)) * 0.3
    tgt = q + jax.random.normal(ks[3], (B, 4)) * 0.05
    kp = jnp.full((B, 4), 0.05)
    cap = jnp.full((B, 4), 5.0)
    act = jnp.ones((B, 4), bool).at[:, 3].set(
        jax.random.bernoulli(ks[4], 0.5, (B,)))
    return sd, q, qd, tau, tgt, kp, cap, act


def _reference(chain, sd, q, qd, tau, tgt, kp, cap, act, gravity, inertial=None):
    lo, hi = chain.dof_limits()

    def one(q, qd, tau, tgt, kp, cap, act, inr):
        fkr = kin.fk(chain, q, jnp.zeros(3), jnp.asarray([0.0, 0, 0, 1]))
        r = dyn.substep(chain, q, qd, DT, jnp.asarray(gravity, jnp.float32),
                        tau_ext=tau, active=act, motor_target=tgt,
                        motor_kp=kp, motor_force=cap,
                        limit_lower=jnp.asarray(lo), limit_upper=jnp.asarray(hi),
                        fk_res=fkr, sim_dofs=sd, inertial=inr)
        return r.q, r.qd

    if inertial is None:
        return jax.jit(jax.vmap(lambda *a: one(*a, None)))(
            q, qd, tau, tgt, kp, cap, act)
    return jax.jit(jax.vmap(one))(q, qd, tau, tgt, kp, cap, act, inertial)


def _kernel(chain, sd, q, qd, tau, tgt, kp, cap, act, gravity,
            origin_xyz=None, inertial=None):
    st = pd.get_structure(chain, sd)
    lo, hi = chain.dof_limits()
    ns = len(sd)
    bp = jnp.zeros((B, 3))
    bq = jnp.tile(jnp.asarray([0.0, 0, 0, 1]), (B, 1))
    assert st.anchors == [-1]
    anc_pos, anc_quat = bp.T, bq.T
    kw = {}
    if origin_xyz is not None:
        kw["origin_xyz"] = jnp.transpose(origin_xyz[:, st.rel], (1, 2, 0)
                                         ).reshape(len(st.rel) * 3, B)
    if inertial is not None:
        T3 = lambda x: jnp.transpose(x[:, st.rel], (1, 2, 0)).reshape(len(st.rel) * 3, B)
        kw.update(mass=inertial["mass"][:, st.rel].T,
                  com=T3(inertial["com"]),
                  idiag=T3(inertial["inertia_diag"]))
    qk, qdk = pd.substep_batched(
        chain, sd, DT, gravity, anc_pos, anc_quat,
        q.T, qd.T, tau.T, tgt.T, kp.T, jnp.ones((ns, B)), cap.T,
        act.T.astype(jnp.float32),
        jnp.broadcast_to(jnp.asarray(lo)[:, None], (ns, B)),
        jnp.broadcast_to(jnp.asarray(hi)[:, None], (ns, B)),
        block_b=8, interpret=True, **kw)
    return qk.T, qdk.T


def test_kernel_static_inertial(chain):
    sd, q, qd, tau, tgt, kp, cap, act = _inputs(chain, jax.random.PRNGKey(1))
    gravity = (0.0, 0.0, -9.81)
    q_ref, qd_ref = _reference(chain, sd, q, qd, tau, tgt, kp, cap, act, gravity)
    q_k, qd_k = _kernel(chain, sd, q, qd, tau, tgt, kp, cap, act, gravity)
    np.testing.assert_allclose(np.asarray(q_k), np.asarray(q_ref), atol=5e-5)
    np.testing.assert_allclose(np.asarray(qd_k), np.asarray(qd_ref), atol=2e-3)


def test_kernel_dynamic_inertial_and_origin(chain):
    """Per-env mass/com/inertia + per-env origin offsets (the human path)."""
    sd, q, qd, tau, tgt, kp, cap, act = _inputs(chain, jax.random.PRNGKey(2))
    gravity = (0.0, 0.0, -1.0)
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    L = chain.nlinks
    inertial = dict(
        mass=jnp.asarray(chain.mass)[None] * jax.random.uniform(ks[0], (B, L), jnp.float32, 0.8, 1.2),
        com=jnp.asarray(chain.com)[None] + jax.random.normal(ks[1], (B, L, 3)) * 0.01,
        inertia_diag=jnp.asarray(chain.inertia_diag)[None]
        * jax.random.uniform(ks[2], (B, L, 3), jnp.float32, 0.8, 1.2),
    )
    origin = (jnp.asarray(chain.origin_xyz)[None]
              + jax.random.normal(ks[3], (B, L, 3)) * 0.01)

    lo, hi = chain.dof_limits()

    def one(q, qd, tau, tgt, kp, cap, act, inr, ox):
        fkr = kin.fk(chain, q, jnp.zeros(3), jnp.asarray([0.0, 0, 0, 1]),
                     origin_xyz=ox)
        r = dyn.substep(chain, q, qd, DT, jnp.asarray(gravity, jnp.float32),
                        tau_ext=tau, active=act, motor_target=tgt,
                        motor_kp=kp, motor_force=cap,
                        limit_lower=jnp.asarray(lo), limit_upper=jnp.asarray(hi),
                        fk_res=fkr, sim_dofs=sd, inertial=inr)
        return r.q, r.qd

    q_ref, qd_ref = jax.jit(jax.vmap(one))(q, qd, tau, tgt, kp, cap, act,
                                           inertial, origin)
    q_k, qd_k = _kernel(chain, sd, q, qd, tau, tgt, kp, cap, act, gravity,
                        origin_xyz=origin, inertial=inertial)
    np.testing.assert_allclose(np.asarray(q_k), np.asarray(q_ref), atol=5e-5)
    np.testing.assert_allclose(np.asarray(qd_k), np.asarray(qd_ref), atol=5e-3)


def test_kernel_limit_projection(chain):
    """Joint-limit clamp + velocity zeroing fire identically."""
    sd = (0, 1, 2, 3)
    q = jnp.tile(jnp.asarray([1.49, -1.49, 0.0, 1.0]), (B, 1))
    qd = jnp.tile(jnp.asarray([5.0, -5.0, 0.0, 0.0]), (B, 1))
    z = jnp.zeros((B, 4))
    kp = z
    cap = jnp.full((B, 4), 1e3)
    act = jnp.ones((B, 4), bool)
    gravity = (0.0, 0.0, 0.0)
    q_ref, qd_ref = _reference(chain, sd, q, qd, z, q, kp, cap, act, gravity)
    q_k, qd_k = _kernel(chain, sd, q, qd, z, q, kp, cap, act, gravity)
    lo, hi = chain.dof_limits()
    assert np.all(np.asarray(q_k) <= np.asarray(hi)[None] + 1e-6)
    np.testing.assert_allclose(np.asarray(q_k), np.asarray(q_ref), atol=5e-5)
    np.testing.assert_allclose(np.asarray(qd_k), np.asarray(qd_ref), atol=2e-3)


def test_auto_block_vmem_budget():
    """_auto_block keeps the kernel's measured ~450 B/lane/rel-link live set
    inside the 12 MB VMEM budget for every deployed system size, including
    the PR2 dual-arm worst case (R=47, which OOMed at 1024 lanes on v5e)."""
    from assistive_gym_tpu.ops.pallas_dynamics import _auto_block
    for R in (10, 17, 26, 47, 60):
        blk = _auto_block(R)
        assert blk in (1024, 512, 256, 128)
        assert 450 * R * blk <= 12 * 1024 * 1024 or blk == 128
    assert _auto_block(47) <= 512          # the known PR2 OOM case
    assert _auto_block(17) == 1024         # jaco-class stays full-width
