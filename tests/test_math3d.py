import numpy as np
import jax.numpy as jnp

from assistive_gym_tpu.ops import math3d as m3


def test_quat_euler_roundtrip():
    rng = np.random.default_rng(0)
    e = rng.uniform(-1.2, 1.2, size=(64, 3)).astype(np.float32)
    q = m3.quat_from_euler(jnp.asarray(e))
    e2 = m3.quat_to_euler(q)
    np.testing.assert_allclose(np.asarray(e2), e, atol=1e-5)


def test_quat_rotate_matches_matrix():
    rng = np.random.default_rng(1)
    q = m3.quat_normalize(jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32)))
    v = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
    r1 = m3.quat_rotate(q, v)
    r2 = jnp.einsum("bij,bj->bi", m3.quat_to_mat(q), v)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)


def test_quat_mul_composition():
    rng = np.random.default_rng(2)
    q1 = m3.quat_normalize(jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32)))
    q2 = m3.quat_normalize(jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32)))
    v = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    a = m3.quat_rotate(m3.quat_mul(q1, q2), v)
    b = m3.quat_rotate(q1, m3.quat_rotate(q2, v))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_euler_zyx_convention():
    # yaw of pi/2 about z maps +x to +y (Bullet setEulerZYX parity)
    q = m3.quat_from_euler(jnp.array([0.0, 0.0, np.pi / 2]))
    v = m3.quat_rotate(q, jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(v), [0.0, 1.0, 0.0], atol=1e-6)
    # composed: roll pi/2 then yaw pi/2: R = Rz Rx, +y -> Rx: +z -> Rz: +z
    q = m3.quat_from_euler(jnp.array([np.pi / 2, 0.0, np.pi / 2]))
    v = m3.quat_rotate(q, jnp.array([0.0, 1.0, 0.0]))
    np.testing.assert_allclose(np.asarray(v), [0.0, 0.0, 1.0], atol=1e-6)


def test_transform_mul_parity():
    # multiplyTransforms semantics: world = parent ∘ local
    p1 = jnp.array([1.0, 2.0, 3.0])
    q1 = m3.quat_from_euler(jnp.array([0.0, 0.0, np.pi / 2]))
    p2 = jnp.array([1.0, 0.0, 0.0])
    q2 = m3.quat_identity()
    p, q = m3.transform_mul(p1, q1, p2, q2)
    np.testing.assert_allclose(np.asarray(p), [1.0, 3.0, 3.0], atol=1e-6)


def test_solve_spd_unrolled_matches_numpy():
    """IK's unrolled tiny-Cholesky solve (ops/ik.py) == library solve.
    The unrolled form exists because batched [*,6,6] LAPACK-style solves
    serialise on TPU (round-4 settle lesson applied to the DLS loop)."""
    import numpy as np
    import jax.numpy as jnp
    from assistive_gym_tpu.ops.ik import _solve_spd_unrolled

    rng = np.random.default_rng(0)
    for m in (3, 6):
        J = rng.normal(size=(512, m, 9)).astype(np.float32)
        A = J @ np.swapaxes(J, -1, -2) + 0.0025 * np.eye(m, dtype=np.float32)
        b = rng.normal(size=(512, m)).astype(np.float32)
        x = np.asarray(_solve_spd_unrolled(jnp.asarray(A), jnp.asarray(b)))
        ref = np.linalg.solve(A, b[..., None])[..., 0]
        np.testing.assert_allclose(x, ref, rtol=2e-3, atol=1e-4)


def test_det_spd_unrolled_matches_numpy():
    """JLWKI's unrolled tiny-Cholesky det (ops/ik.py) == float64 det within
    fp32 noise, and clamps near-singular PSD inputs to ~0 — matching the
    reference's max(det, 0) use (env.py:339-342).  Tolerances calibrated
    against the previous batched-LU fp32 det: 0.40% healthy / 2.8e-3
    singular-noise there, 0.82% / 5.8e-3 here — both fine for a
    tie-breaking isotropy heuristic."""
    from assistive_gym_tpu.ops.ik import _det_spd_unrolled

    rng = np.random.default_rng(2)
    # healthy: J J^T with J [*,6,9] is comfortably SPD
    J = rng.normal(size=(512, 6, 9)).astype(np.float32)
    A = J @ np.swapaxes(J, -1, -2)
    d = np.asarray(_det_spd_unrolled(jnp.asarray(A)))
    ref = np.linalg.det(A.astype(np.float64))
    np.testing.assert_allclose(d, ref, rtol=2e-2)
    # near-singular: rank-3 outer products -> det must collapse toward 0
    # (relative to the healthy-scale dets above)
    Js = rng.normal(size=(512, 6, 3)).astype(np.float32)
    As = Js @ np.swapaxes(Js, -1, -2)
    ds = np.asarray(_det_spd_unrolled(jnp.asarray(As)))
    scale = np.abs(np.linalg.det(
        (Js @ np.swapaxes(Js, -1, -2) + np.eye(6, dtype=np.float32)).astype(np.float64)))
    assert np.all(np.abs(ds) < 2e-2 * scale)
