"""Batch-last particle collision vs the per-env reference implementation."""
import jax
import jax.numpy as jnp
import numpy as np

from assistive_gym_tpu.physics import particles as part

B, N, G = 5, 16, 7


def _rand_scene(key):
    ks = jax.random.split(key, 6)
    pos = jax.random.normal(ks[0], (B, N, 3)) * 0.3
    vel = jax.random.normal(ks[1], (B, N, 3)) * 0.1
    alive = jax.random.uniform(ks[2], (B, N)) > 0.2
    seg_a = jax.random.normal(ks[3], (B, G, 3)) * 0.3
    seg_b = seg_a + jax.random.normal(ks[4], (B, G, 3)) * 0.2
    seg_r = jax.random.uniform(ks[5], (B, G), minval=0.02, maxval=0.15)
    return pos, vel, alive, seg_a, seg_b, seg_r


def test_collide_segments_b_matches_per_env():
    """Streamed [N,B] narrowphase == vmapped [N,G] per-env narrowphase."""
    pos, vel, alive, seg_a, seg_b, seg_r = _rand_scene(jax.random.PRNGKey(0))
    radius = 0.03

    ref = jax.vmap(lambda p, v, al, a, b, r: part.collide_segments(
        part.Particles(p, v, al), radius, a, b, r))(
            pos, vel, alive, seg_a, seg_b, seg_r)

    T = lambda x: jnp.transpose(x, (1, 2, 0))           # [B,N,3] -> [N,3,B]
    pb = part.ParticlesB(T(pos), T(vel), alive.T)
    got = part.collide_segments_b(pb, radius, T(seg_a), T(seg_b), seg_r.T)

    np.testing.assert_allclose(np.asarray(jnp.transpose(got.pos, (2, 0, 1))),
                               np.asarray(ref.pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.transpose(got.vel, (2, 0, 1))),
                               np.asarray(ref.vel), atol=1e-5)


def test_touches_segments_b_matches_per_env():
    pos, vel, alive, seg_a, seg_b, seg_r = _rand_scene(jax.random.PRNGKey(1))
    radius = 0.03
    ref = jax.vmap(lambda p, v, al, a, b, r: part.touches_segments(
        part.Particles(p, v, al), radius, a, b, r))(
            pos, vel, alive, seg_a, seg_b, seg_r)
    T = lambda x: jnp.transpose(x, (1, 2, 0))
    got = part.touches_segments_b(T(pos), alive.T, radius,
                                  T(seg_a), T(seg_b), seg_r.T)
    np.testing.assert_array_equal(np.asarray(got.T), np.asarray(ref))
