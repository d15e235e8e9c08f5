"""Native C++ URDF compiler must agree with the Python reference impl."""
import os

import numpy as np
import pytest

from assistive_gym_tpu.models import urdf

REF = "/root/reference/assistive_gym/envs/assets"


@pytest.mark.skipif(urdf._native_lib() is None, reason="liburdfc.so not built")
@pytest.mark.parametrize("rel", [
    "jaco/j2s7s300_gym.urdf",
    "sawyer/sawyer.urdf",
    "PR2/pr2_no_torso_lift_tall.urdf",
    "baxter/baxter_custom.urdf",
    "kinova_gen3/GEN3_URDF_V12.urdf",
])
def test_native_matches_python(rel):
    path = os.path.join(REF, rel)
    if not os.path.exists(path):
        pytest.skip("reference assets not mounted")
    py = urdf.parse_urdf(path)
    nat = urdf.parse_urdf_native(path)
    assert nat is not None
    assert nat["link_names"] == py["link_names"]
    assert nat["joint_names"] == py["joint_names"]
    assert nat["parent"] == py["parent"]
    assert nat["joint_type"] == py["joint_type"]
    for key in ["origin_xyz", "origin_quat", "axis", "lower", "upper",
                "damping", "mass", "com", "inertia_diag"]:
        np.testing.assert_allclose(np.asarray(nat[key], np.float64),
                                   np.asarray(py[key], np.float64),
                                   atol=1e-9, err_msg=key)
    # inertia principal axes may differ by sign/permutation for degenerate
    # eigenvalues; check the reconstructed inertia tensor instead
    def tensor(diag, quat):
        diag = np.asarray(diag); quat = np.asarray(quat)
        x, y, z, w = quat.T
        R = np.stack([
            np.stack([1-2*(y*y+z*z), 2*(x*y-w*z), 2*(x*z+w*y)], -1),
            np.stack([2*(x*y+w*z), 1-2*(x*x+z*z), 2*(y*z-w*x)], -1),
            np.stack([2*(x*z-w*y), 2*(y*z+w*x), 1-2*(x*x+y*y)], -1),
        ], -2)
        return np.einsum("lab,lb,lcb->lac", R, diag, R)
    np.testing.assert_allclose(tensor(nat["inertia_diag"], nat["inertia_quat"]),
                               tensor(py["inertia_diag"], py["inertia_quat"]),
                               atol=1e-8)
