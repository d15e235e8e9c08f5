"""Pallas cloth kernel ≡ XLA cloth.substep_b (the fp32 reference path).

The kernel's Jacobi gather/scatter runs on the MXU via bf16 hi/lo-split
incidence matmuls (ops/pallas_cloth.py) — exact to ~16 mantissa bits per
gather, so positions match the fp32 path to ~1e-4 m over a full substep
(5 iterations) and velocities to that over dt.  Run in interpret mode on
CPU; the real lowering is exercised on TPU by the dressing bench."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from assistive_gym_tpu.ops import cloth as cloth_mod
from assistive_gym_tpu.ops import pallas_cloth

B = 8
DT = 0.01


def _state(key):
    g = cloth_mod.gown_np()
    Vn = g["pos"].shape[0]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    # start from the rest mesh, jostled, offset into the air per env
    x = (jnp.asarray(g["pos"])[:, :, None] * 1.4
         + jax.random.normal(k1, (Vn, 3, B)) * 0.01
         + jnp.asarray([0.3, 0.2, 0.9])[None, :, None])
    v = jax.random.normal(k2, (Vn, 3, B)) * 0.1
    anchors = jnp.asarray(g["anchors"])
    anchor_pos = x[anchors] + jax.random.normal(k3, (len(g["anchors"]), 3, B)) * 0.002
    G = 14
    seg_a = jnp.asarray([0.3, 0.2, 0.8])[None, :, None] \
        + jax.random.normal(k4, (G, 3, B)) * 0.15
    seg_b = seg_a + 0.25
    seg_r = jnp.full((G, B), 0.05, jnp.float32)
    return x, v, anchor_pos, seg_a, seg_b, seg_r


def test_kernel_matches_substep_b():
    args = _state(jax.random.PRNGKey(0))
    x_r, v_r, f_r, p_r = cloth_mod.substep_b(
        args[0], args[1], DT, (0.0, 0.0, -9.81), *args[2:])
    x_k, v_k, f_k, p_k = pallas_cloth.substep_b_kernel(
        args[0], args[1], DT, (0.0, 0.0, -9.81), *args[2:],
        block_b=8, interpret=True)
    # positions: bf16 hi/lo split ⇒ ~2e-5 m per gather, 5 iterations
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_r), atol=2e-4)
    # velocities amplify the position delta by 1/dt
    np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_r), atol=2e-2)
    # readback force: FORCE_PER_DEPTH × depth, depth error ~ position error
    np.testing.assert_allclose(np.asarray(f_k), np.asarray(f_r), atol=0.2)
    np.testing.assert_array_equal(np.asarray(p_k), np.asarray(x_k))


def test_kernel_padding_path():
    """B not a multiple of block_b exercises the lane-padding branch."""
    args = _state(jax.random.PRNGKey(1))
    sl = lambda a: a[..., :5]
    a5 = [sl(args[0]), sl(args[1])] + [sl(a) for a in args[2:]]
    x_r, v_r, f_r, _ = cloth_mod.substep_b(
        a5[0], a5[1], DT, (0.0, 0.0, -9.81), *a5[2:])
    x_k, v_k, f_k, _ = pallas_cloth.substep_b_kernel(
        a5[0], a5[1], DT, (0.0, 0.0, -9.81), *a5[2:],
        block_b=8, interpret=True)
    assert x_k.shape == x_r.shape
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_r), atol=2e-4)
    np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_r), atol=2e-2)
