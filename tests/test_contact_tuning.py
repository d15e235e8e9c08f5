"""Stability-tuned contact parameters (contact.tuned_pairs)."""
import numpy as np

from assistive_gym_tpu.envs import build_task
from assistive_gym_tpu.physics import contact as con


def test_tuned_pairs_respect_stability_bound():
    """Every pair's spring satisfies the explicit-integration bound
    k <= alpha * m_eff / dt^2 and its damping d <= m_eff / dt — the
    invariants that prevented the runaway-velocity NaNs."""
    for tname, dt in [("scratch_itch", 0.02), ("feeding", 0.01),
                      ("drinking", 0.004)]:
        task = build_task(tname, "jaco", False)
        spec = task.spec
        gs, pt = spec.geoms, spec.pairs
        link_mass = np.concatenate([spec.human.mass, spec.robot.mass])

        def side_mass(idx):
            l = gs.link[idx]
            m = np.where(l < 0, np.inf, link_mass[np.maximum(l, 0)])
            return np.maximum(m, 5e-2)

        ma, mb = side_mass(pt.a), side_mass(pt.b)
        with np.errstate(divide="ignore"):
            m_eff = 1.0 / (1.0 / ma + 1.0 / mb)
        m_eff = np.where(np.isfinite(m_eff), m_eff, np.maximum(ma, mb))
        m_eff = np.minimum(m_eff, 50.0)
        # k bound (alpha=0.25, with the 50.0 floor exempted where the bound
        # itself is below the floor)
        bound = 0.25 * m_eff / dt ** 2
        assert np.all(pt.stiffness <= np.maximum(bound, 50.0) + 1e-3), tname
        assert np.all(pt.damping <= 0.5 * m_eff / dt + 1e-3), tname
        assert np.all(pt.stiffness > 0) and np.all(pt.damping >= 0), tname


def test_tuned_pairs_static_side_uses_dynamic_mass():
    """World/static geoms count as infinite mass: m_eff = the dynamic side."""
    task = build_task("bed_bathing", "jaco", False)
    pt = task.spec.pairs
    gs = task.spec.geoms
    plane_pairs = np.nonzero(pt.kind == 2)[0]
    assert len(plane_pairs) > 0
    # plane-side link is world (-1); stiffness finite and positive
    assert np.all(np.isfinite(pt.stiffness[plane_pairs]))
    assert np.all(pt.stiffness[plane_pairs] >= 50.0)
