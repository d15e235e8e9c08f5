"""Compile third-party robot descriptions + the arm-limits MLP into package data.

Extracts *data* (kinematic parameters of public robots, NN weights) from the
reference mount into this repo's own formats.  Run once at build time:

    python tools/compile_assets.py [--reference /root/reference]

Outputs (assistive_gym_tpu/models/assets/):
    <robot>.json      flat kinematic-tree spec (models/urdf.py format)
    arm_limits.npz    4->64->64->64->1 MLP weights (tanh x3 + sigmoid), ported
                      from realistic_arm_limits_model.h5 (reference env.py:63)
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from assistive_gym_tpu.models import urdf

ROBOT_URDFS = {
    # name -> (relative path under reference assets, notes)
    "jaco": "jaco/j2s7s300_gym.urdf",
    "jaco_arm_manipulation": "jaco/j2s7s300_gym_arm_manipulation.urdf",
    "pr2": "PR2/pr2_no_torso_lift_tall.urdf",
    "pr2_arm_manipulation": "PR2/pr2_no_torso_lift_tall_arm_manipulation.urdf",
    "sawyer": "sawyer/sawyer.urdf",
    "sawyer_arm_manipulation": "sawyer/sawyer_arm_manipulation.urdf",
    "baxter": "baxter/baxter_custom.urdf",
    "baxter_arm_manipulation": "baxter/baxter_custom_arm_manipulation.urdf",
    "kinova_gen3": "kinova_gen3/GEN3_URDF_V12.urdf",
    "wheelchair": "wheelchair/wheelchair.urdf",
    "wheelchair_jaco": "wheelchair/wheelchair_jaco.urdf",
    "table": "table/table.urdf",
    "table_tall": "table/table_tall.urdf",
    "tool_scratch": "scratcher/tool_scratch.urdf",
    "wiper": "bed_bathing/wiper.urdf",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    args = ap.parse_args()
    assets_in = os.path.join(args.reference, "assistive_gym", "envs", "assets")
    out_dir = os.path.join(
        os.path.dirname(__file__), "..", "assistive_gym_tpu", "models", "assets"
    )
    os.makedirs(out_dir, exist_ok=True)

    for name, rel in ROBOT_URDFS.items():
        path = os.path.join(assets_in, rel)
        if not os.path.exists(path):
            print(f"skip {name}: {path} missing")
            continue
        spec = urdf.parse_urdf(path)
        spec["name"] = name
        urdf.save_spec(spec, os.path.join(out_dir, f"{name}.json"))
        ndof = sum(1 for t in spec["joint_type"] if t != 0)
        print(f"{name}: {len(spec['link_names'])} links, {ndof} dofs")

    # Arm-limits classifier weights (Sequential of 4 Dense layers).
    import h5py

    h5 = os.path.join(assets_in, "realistic_arm_limits_model.h5")
    if os.path.exists(h5):
        with h5py.File(h5, "r") as f:
            w = {}
            for i in range(1, 5):
                g = f[f"model_weights/dense_{i}/dense_{i}"]
                w[f"w{i}"] = np.array(g["kernel:0"], dtype=np.float32)
                w[f"b{i}"] = np.array(g["bias:0"], dtype=np.float32)
        np.savez(os.path.join(out_dir, "arm_limits.npz"), **w)
        print("arm_limits.npz written")


if __name__ == "__main__":
    main()
