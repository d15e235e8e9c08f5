"""Generate the committed engine-behavior goldens (tests/goldens/).

Run on CPU so the committed trajectories are platform-canonical:

    JAX_PLATFORMS=cpu python tools/make_goldens.py

Regenerate ONLY when a physics-semantics change is deliberate, and record
the reason in PARITY_PHYSICS.md (the goldens exist to catch silent drift).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

# the axon TPU plugin overrides the JAX_PLATFORMS env var; goldens are
# canonically CPU, so force the platform through jax.config (as conftest does)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from assistive_gym_tpu.physics import dynamics

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def main():
    from tests.test_physics_parity import _pendulum_chain

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    l1, l2, m1, m2 = 0.5, 0.3, 1.0, 0.7
    mdl = _pendulum_chain([l1, l2], [m1, m2])
    dt, steps = 5e-4, 1000
    q0 = np.array([0.4, -0.2], np.float32)

    def substep(carry, _):
        q, qd = carry
        res = dynamics.substep(mdl, q, qd, dt, jnp.array([0, 0, -9.81]))
        return (res.q, res.qd), res.q

    run = jax.jit(lambda c: jax.lax.scan(substep, c, None, length=steps)[1])
    traj = np.asarray(run((jnp.asarray(q0), jnp.zeros(2, jnp.float32))))
    out = os.path.join(GOLDEN_DIR, "engine_double_pendulum.npz")
    np.savez(out, q0=q0, dt=dt, steps=steps, traj=traj)
    print(f"wrote {out}: traj {traj.shape}, final q = {traj[-1]}")


if __name__ == "__main__":
    main()
