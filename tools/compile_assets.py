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


def compile_cloth(reference="/root/reference"):
    """hospitalgown_reduced.obj -> clustered mass-spring cloth (cloth_gown.npz).

    Extracts vertex/edge data from the reference gown mesh (dressing.py:170:
    scale 1.4, mass 0.23, anchors + tracked sleeve triangles) and coarsens it
    by voxel clustering to a TPU-friendly vertex count while preserving the
    anchor vertices and the two tracked sleeve-opening triangles.
    """
    import numpy as np

    path = os.path.join(reference, "assistive_gym/envs/assets/clothing/hospitalgown_reduced.obj")
    vs, fs = [], []
    for line in open(path):
        if line.startswith("v "):
            vs.append([float(x) for x in line.split()[1:4]])
        elif line.startswith("f "):
            idx = [int(t.split("/")[0]) - 1 for t in line.split()[1:]]
            for k in range(1, len(idx) - 1):
                fs.append([idx[0], idx[k], idx[k + 1]])
    v = np.asarray(vs, np.float64)
    f = np.asarray(fs, np.int64)

    voxel = 0.035
    keys = np.floor(v / voxel).astype(np.int64)
    _, cluster_of, counts = np.unique(keys, axis=0, return_inverse=True,
                                      return_counts=True)
    nC = counts.shape[0]
    pos = np.zeros((nC, 3))
    np.add.at(pos, cluster_of, v)
    pos /= counts[:, None]

    cf = cluster_of[f]
    edges = set()
    for a, b, c in cf:
        for i, j in ((a, b), (b, c), (c, a)):
            if i != j:
                edges.add((min(i, j), max(i, j)))
    edges = np.asarray(sorted(edges), np.int32)
    rest = np.linalg.norm(pos[edges[:, 0]] - pos[edges[:, 1]], axis=-1)

    anchors = [2087, 3879, 3681, 3682, 2086, 2041, 987, 2042, 2088, 1647, 2332]
    tri1 = [621, 37, 1008]
    tri2 = [130, 3908, 2358]
    a_c = sorted(set(int(cluster_of[i]) for i in anchors))
    t1_c = [int(cluster_of[i]) for i in tri1]
    t2_c = [int(cluster_of[i]) for i in tri2]

    mass = np.full(nC, 0.23 / nC, np.float32)   # total mass 0.23 (dressing.py:170)
    out = os.path.join(os.path.dirname(__file__), "..",
                       "assistive_gym_tpu", "models", "assets", "cloth_gown.npz")
    np.savez(out, pos=pos.astype(np.float32), edges=edges,
             rest=rest.astype(np.float32), mass=mass,
             anchors=np.asarray(a_c, np.int32),
             tri1=np.asarray(t1_c, np.int32), tri2=np.asarray(t2_c, np.int32))
    print(f"cloth_gown.npz: {nC} verts, {len(edges)} edges, "
          f"{len(a_c)} anchor clusters")
