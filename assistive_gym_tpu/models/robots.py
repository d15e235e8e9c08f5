"""Robot models: compiled URDF specs + per-robot metadata + capsule collision.

Metadata (arm joint indices, end-effector/torso links, gripper joints, tool
attach transforms) is data extracted from the reference's hardcoded tables:
world_creation.py:159-306 (init_pr2/sawyer/baxter/jaco/kinova_gen3,
set_gripper_open_position, init_tool) and the per-task reset code.  Index
parity with PyBullet's joint numbering is verified by tests.

Collision: robot links are approximated by capsules spanning joint-to-joint
segments with per-robot radii — the TPU-native re-approximation of the
reference's VHACD mesh collision (SURVEY.md §2.2 N2).  Only arm, gripper and
tool links participate in contact (matching where the reference's rewards
actually read forces).
"""
from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..physics import model as pm
from . import urdf

ASSETS = os.path.join(os.path.dirname(__file__), "assets")


@dataclasses.dataclass(frozen=True)
class RobotInfo:
    name: str
    spec_name: str
    arm_left: Tuple[int, ...]
    arm_right: Tuple[int, ...]
    ee_left: int
    ee_right: int
    torso: int                      # obs torso link (scratch_itch.py:65)
    gripper_left: Tuple[int, ...]
    gripper_right: Tuple[int, ...]
    gripper_sign: Tuple[float, ...]  # position multipliers (world_creation.py:287-299)
    capsule_radius: float
    collision_links: Tuple[int, ...]  # links that get contact capsules
    default_left: Tuple[float, ...] = ()
    default_right: Tuple[float, ...] = ()
    dressing_ee: int = -1            # dressing uses a different ee link (dressing.py:19)


ROBOT_INFO: Dict[str, RobotInfo] = {
    "jaco": RobotInfo(
        name="jaco", spec_name="jaco",
        arm_left=(1, 2, 3, 4, 5, 6, 7), arm_right=(1, 2, 3, 4, 5, 6, 7),
        ee_left=8, ee_right=8, torso=0,
        gripper_left=(9, 11, 13), gripper_right=(9, 11, 13),
        gripper_sign=(1.0, 1.0, 1.0),
        capsule_radius=0.045,
        collision_links=(1, 2, 3, 4, 5, 6, 7, 8, 9, 11, 13),
        dressing_ee=8,
    ),
    "kinova_gen3": RobotInfo(
        name="kinova_gen3", spec_name="kinova_gen3",
        arm_left=(0, 1, 2, 3, 4, 5, 6), arm_right=(0, 1, 2, 3, 4, 5, 6),
        ee_left=7, ee_right=7, torso=0,
        gripper_left=(), gripper_right=(), gripper_sign=(),
        capsule_radius=0.045,
        collision_links=(0, 1, 2, 3, 4, 5, 6, 7),
        dressing_ee=7,
    ),
    "sawyer": RobotInfo(
        name="sawyer", spec_name="sawyer",
        arm_left=(3, 8, 9, 10, 11, 13, 16), arm_right=(3, 8, 9, 10, 11, 13, 16),
        ee_left=18, ee_right=18, torso=0,
        gripper_left=(20, 22), gripper_right=(20, 22), gripper_sign=(1.0, -1.0),
        capsule_radius=0.055,
        collision_links=(3, 8, 9, 10, 11, 13, 16, 18, 20, 22),
        dressing_ee=19,
    ),
    "baxter": RobotInfo(
        name="baxter", spec_name="baxter",
        arm_left=(34, 35, 36, 37, 38, 40, 41), arm_right=(12, 13, 14, 15, 16, 18, 19),
        ee_left=47, ee_right=25, torso=0,
        gripper_left=(49, 51), gripper_right=(27, 29), gripper_sign=(1.0, -1.0),
        capsule_radius=0.06,
        collision_links=(12, 13, 14, 15, 16, 18, 19, 25, 27, 29,
                         34, 35, 36, 37, 38, 40, 41, 47, 49, 51),
        default_left=(0.75, 1, 0.5, 0.5, 1, -0.5, 0),
        default_right=(-0.75, 1, -0.5, 0.5, -1, -0.5, 0),
        dressing_ee=48,
    ),
    "pr2": RobotInfo(
        name="pr2", spec_name="pr2",
        arm_left=(64, 65, 66, 68, 69, 71, 72), arm_right=(42, 43, 44, 46, 47, 49, 50),
        ee_left=76, ee_right=54, torso=15,
        gripper_left=(79, 80, 81, 82), gripper_right=(57, 58, 59, 60),
        gripper_sign=(1.0, 1.0, 1.0, 1.0),
        capsule_radius=0.065,
        collision_links=(42, 43, 44, 46, 47, 49, 50, 54, 57, 58, 59, 60,
                         64, 65, 66, 68, 69, 71, 72, 76, 79, 80, 81, 82),
        default_left=(1.75, 1.25, 1.5, -0.5, 1, 0, 1),
        default_right=(-1.75, 1.25, -1.5, -0.5, -1, 0, -1),
        dressing_ee=76,
    ),
}

# Tool attach transforms per (task, robot): (pos_offset, euler_offset, left?)
# from the per-task reset code (scratch_itch.py:118-135, bed_bathing.py:174-200,
# feeding.py:150-167, drinking.py:153-170).
TOOL_ATTACH = {
    ("scratch_itch", "pr2"): ((0, 0, 0), (0, 0, 0)),
    ("scratch_itch", "jaco"): ((0, 0, 0.02), (0, -math.pi / 2, 0)),
    ("scratch_itch", "sawyer"): ((0, 0.125, 0), (0, 0, math.pi / 2)),
    ("scratch_itch", "baxter"): ((0, 0.125, 0), (0, 0, math.pi / 2)),
    ("bed_bathing", "pr2"): ((0, 0, 0), (0, 0, 0)),
    ("bed_bathing", "jaco"): ((-0.01, 0, 0.03), (0, -math.pi / 2, 0)),
    ("bed_bathing", "sawyer"): ((0, 0.1175, 0), (math.pi / 2, 0, math.pi / 2)),
    ("bed_bathing", "baxter"): ((0, 0.1175, 0), (math.pi / 2, 0, math.pi / 2)),
    ("feeding", "pr2"): ((0, -0.03, -0.11), (-0.2, 0, 0)),
    ("feeding", "jaco"): ((0.1, -0.0225, 0.03), (-0.1, -math.pi / 2, 0)),
    ("feeding", "sawyer"): ((-0.1, 0.12, -0.02), (math.pi / 2 - 0.1, 0, math.pi / 2)),
    ("feeding", "baxter"): ((-0.1, 0.12, -0.02), (math.pi / 2 - 0.1, 0, math.pi / 2)),
    ("drinking", "pr2"): ((-0.01, 0, -0.05), (math.pi / 2, 0, 0)),
    ("drinking", "jaco"): ((0.05, -0.005, 0), (0, 0, math.pi / 2)),
    ("drinking", "sawyer"): ((0.05, 0.125, 0), (0, 0, math.pi / 2)),
    ("drinking", "baxter"): ((0.05, 0.125, 0), (0, 0, math.pi / 2)),
}

# Gripper open positions per (task, robot) (set_gripper_open_position calls).
GRIPPER_OPEN = {
    ("scratch_itch", "pr2"): 0.25, ("scratch_itch", "jaco"): 1.0,
    ("scratch_itch", "sawyer"): 0.015, ("scratch_itch", "baxter"): 0.015,
    ("bed_bathing", "pr2"): 0.2, ("bed_bathing", "jaco"): 1.1,
    ("bed_bathing", "sawyer"): 0.0125, ("bed_bathing", "baxter"): 0.0125,
    ("feeding", "pr2"): 0.03, ("feeding", "jaco"): 1.33,
    ("feeding", "sawyer"): 0.0, ("feeding", "baxter"): 0.0,
    ("drinking", "pr2"): 0.45, ("drinking", "jaco"): 0.63,
    ("drinking", "sawyer"): 0.025, ("drinking", "baxter"): 0.025,
    ("dressing", "jaco"): 1.33,
    ("arm_manipulation", "pr2"): 0.15, ("arm_manipulation", "jaco"): 1.05,
    ("arm_manipulation", "sawyer"): 0.01, ("arm_manipulation", "baxter"): 0.01,
}


@functools.lru_cache(maxsize=None)
def load_robot(name: str, arm_manipulation: bool = False) -> pm.ArticulatedModel:
    info = ROBOT_INFO[name]
    spec_name = info.spec_name + ("_arm_manipulation" if arm_manipulation and name != "kinova_gen3" else "")
    spec = urdf.load_spec(os.path.join(ASSETS, f"{spec_name}.json"))
    return pm.from_spec(spec)


@functools.lru_cache(maxsize=None)
def load_spec_model(spec_name: str) -> pm.ArticulatedModel:
    return pm.from_spec(urdf.load_spec(os.path.join(ASSETS, f"{spec_name}.json")))


def robot_capsules(model: pm.ArticulatedModel, links: Sequence[int],
                   radius: float) -> List[dict]:
    """Auto-fit capsule collision per link: one segment from the link origin
    to each child-joint origin (plus a sphere when the link is a leaf)."""
    geoms: List[dict] = []
    links = set(int(l) for l in links)
    children: Dict[int, List[int]] = {}
    for i in range(model.nlinks):
        children.setdefault(int(model.parent[i]), []).append(i)
    for li in sorted(links):
        kids = children.get(li, [])
        placed = False
        for k in kids:
            seg = np.asarray(model.origin_xyz[k])
            if np.linalg.norm(seg) > 0.02:
                geoms.append(dict(link=li, gtype=0, radius=radius,
                                  p0=(0.0, 0.0, 0.0), p1=tuple(seg.tolist())))
                placed = True
        if not placed:
            geoms.append(dict(link=li, gtype=0, radius=radius,
                              p0=(0.0, 0.0, 0.0), p1=(0.0, 0.0, 0.0)))
    return geoms


def _self_capsule_index_pairs(model: pm.ArticulatedModel, rg: List[dict],
                              default_q) -> List[tuple]:
    """Indices (i, j) into `rg` of the robot self-collision capsule pairs:
    links at tree distance >= 2 whose capsules are separated by > 2 cm at
    the task's reset configuration (the static analog of Bullet's
    "no initial contact" behavior under URDF_USE_SELF_COLLISION)."""
    import jax.numpy as jnp
    from ..physics import kinematics as kin
    from ..ops import math3d as m3

    fk = kin.fk(model, jnp.asarray(default_q, jnp.float32),
                jnp.zeros(3, jnp.float32),
                jnp.asarray([0, 0, 0, 1], jnp.float32))
    pos, quat = np.asarray(fk.pos), np.asarray(fk.quat)

    def chain(l):
        out = []
        while l >= 0:
            out.append(l)
            l = int(model.parent[l])
        return out

    def tree_dist(i, j):
        ci, cj = chain(i), chain(j)
        si = {l: d for d, l in enumerate(ci)}
        for d, l in enumerate(cj):
            if l in si:
                return d + si[l]
        return len(ci) + len(cj)

    def world_seg(g):
        l = g["link"]
        R = np.asarray(m3.quat_to_mat(jnp.asarray(quat[l])))
        w0 = pos[l] + R @ np.asarray(g.get("p0", (0, 0, 0)), np.float64)
        w1 = pos[l] + R @ np.asarray(g.get("p1", g.get("p0", (0, 0, 0))),
                                     np.float64)
        return w0, w1

    def seg_dist(p0, p1, q0, q1):
        ts = np.linspace(0, 1, 17)
        pa = p0[None] + ts[:, None] * (p1 - p0)[None]
        pb = q0[None] + ts[:, None] * (q1 - q0)[None]
        return np.linalg.norm(pa[:, None] - pb[None], axis=-1).min()

    out = []
    for ii in range(len(rg)):
        for jj in range(ii + 1, len(rg)):
            li, lj = rg[ii]["link"], rg[jj]["link"]
            if li == lj or tree_dist(li, lj) < 2:
                continue
            (a0, a1), (b0, b1) = world_seg(rg[ii]), world_seg(rg[jj])
            clearance = seg_dist(a0, a1, b0, b1) - (rg[ii]["radius"]
                                                   + rg[jj]["radius"])
            if clearance > 0.02:
                out.append((ii, jj))
    return out


def self_collision_pairs(model: pm.ArticulatedModel, rg: List[dict],
                         geom_ids: Sequence[int], default_q,
                         group: int) -> List[dict]:
    """Robot self-collision pair table (URDF_USE_SELF_COLLISION parity,
    reference world_creation.py:161,205,231,260)."""
    return [dict(a=geom_ids[ii], b=geom_ids[jj], kind=0, group=group)
            for ii, jj in _self_capsule_index_pairs(model, rg, default_q)]


def make_self_check(model: pm.ArticulatedModel, rg: List[dict], default_q):
    """Jittable fn(q, base_pos, base_quat) -> max self-penetration depth (m)
    over the robot's self-collision capsule pairs.  Used by the IK restart
    selection to reject self-colliding reset solutions — the reference
    retries IK when the arm is in self-contact (util.py:22-25, 44-47)."""
    import jax.numpy as jnp
    from ..physics import kinematics as kin
    from ..ops import math3d as m3
    from ..ops import collision as col

    idx = _self_capsule_index_pairs(model, rg, default_q)
    if not idx:
        return None
    ii = np.array([i for i, _ in idx], np.int32)
    jj = np.array([j for _, j in idx], np.int32)
    links = np.array([g["link"] for g in rg], np.int32)
    p0 = np.array([g.get("p0", (0, 0, 0)) for g in rg], np.float32)
    p1 = np.array([g.get("p1", g.get("p0", (0, 0, 0))) for g in rg], np.float32)
    rad = np.array([g.get("radius", 0.0) for g in rg], np.float32)

    def fn(q, base_pos, base_quat):
        fk = kin.fk(model, q, base_pos, base_quat)
        lp, lq = fk.pos[links], fk.quat[links]
        w0 = lp + m3.quat_rotate(lq, jnp.asarray(p0))
        w1 = lp + m3.quat_rotate(lq, jnp.asarray(p1))
        d, _, _ = col.capsule_capsule(w0[ii], w1[ii], jnp.asarray(rad)[ii],
                                      w0[jj], w1[jj], jnp.asarray(rad)[jj])
        return jnp.maximum(-d, 0.0).max()

    return fn


# ---------------------------------------------------------------- tool geoms

def tool_geoms(task: str, tool_base_link: int) -> List[dict]:
    """Collision geometry of the task tool, in the tool base frame.

    Link indexing note: tool links are welded onto the robot tree, so `link`
    here is the index of the tool base link within the composed robot model;
    geoms at local tool links (e.g. scratcher tool_tip) are expressed
    relative to the tool base since all tool joints are fixed.

    Shapes from the tool URDFs (scratcher/tool_scratch.urdf,
    bed_bathing/wiper.urdf) and capsule/box approximations of the OBJ meshes
    (dinnerware spoon/cup, arm_manipulation scooper).
    """
    t = tool_base_link
    if task == "scratch_itch":
        return [
            # handle box ~ sphere; tool cylinder x=[0.025,0.075]; tip sphere at 0.075
            dict(link=t, gtype=0, radius=0.025, p0=(0, 0, 0)),
            dict(link=t, gtype=0, radius=0.01, p0=(0.025, 0, 0), p1=(0.075, 0, 0)),
            dict(link=t, gtype=0, radius=0.01, p0=(0.075, 0, 0)),
        ]
    if task == "bed_bathing":
        return [
            dict(link=t, gtype=1, half=(0.02, 0.02, 0.03), p0=(0, 0, -0.01)),
            # wiping pad (contact link 1 'cloth', wiper.urdf)
            dict(link=t, gtype=1, half=(0.05, 0.025, 0.0075), p0=(0, 0, -0.0425)),
        ]
    if task == "feeding":
        # spoon_reduced at scale 0.08: bowl of the spoon approximated by a
        # sphere; handle by a thin capsule
        return [
            dict(link=t, gtype=0, radius=0.02, p0=(0, -0.05, -0.01)),
            dict(link=t, gtype=0, radius=0.01, p0=(0, -0.03, 0), p1=(0, 0.08, 0)),
        ]
    if task == "drinking":
        # plastic cup at scale 0.045: body capsule (container handled
        # analytically in the drinking env)
        return [
            dict(link=t, gtype=0, radius=0.05, p0=(0, 0.0, 0.0), p1=(0, 0.11, 0.0)),
        ]
    if task == "arm_manipulation":
        return [dict(link=t, gtype=0, radius=0.04, p0=(0, 0, 0), p1=(0, 0, -0.25))]
    return []
