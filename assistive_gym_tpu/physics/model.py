"""Static articulated-body model: fixed topology as host numpy arrays.

The model is the TPU-native replacement for PyBullet's in-engine multibody
representation (reference: Bullet C++ via p.createMultiBody /
p.loadURDF — assistive_gym/envs/human_creation.py:265,
world_creation.py:161-274).  Topology is static per (task, robot); arrays are
baked into the jitted program as constants, so XLA sees fully static shapes.

Joint state `q`, `qd` covers only the moving dofs (revolute/prismatic links);
fixed joints contribute no dofs.  Frozen links (the reference's mass=0 trick,
world_creation.py:140-144) are handled by a per-dof `frozen` mask at
simulation time, not by editing the model.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

JOINT_FIXED = 0
JOINT_REVOLUTE = 1
JOINT_PRISMATIC = 2

# Geometry type codes for collision shapes (ops/collision.py).
GEOM_SPHERE = 0
GEOM_CAPSULE = 1   # segment from `pos` to `pos + axis`, radius `radius`
GEOM_BOX = 2       # half-extents in `size`
GEOM_PLANE = 3     # normal `axis`, offset `radius` (n.x = r)


@dataclasses.dataclass(frozen=True)
class Geom:
    """One collision primitive attached to a link (or the world, link=-2)."""
    link: int                      # link index; -1 = base, -2 = world/static
    gtype: int
    radius: float = 0.0
    pos: Tuple[float, float, float] = (0.0, 0.0, 0.0)   # in link frame
    axis: Tuple[float, float, float] = (0.0, 0.0, 1.0)  # capsule axis*length / plane normal / box quat handled via `quat`
    size: Tuple[float, float, float] = (0.0, 0.0, 0.0)  # box half extents
    quat: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 1.0)


@dataclasses.dataclass(frozen=True)
class ArticulatedModel:
    """Flat link tree. All arrays are numpy (host, static)."""
    name: str
    link_names: Tuple[str, ...]
    parent: np.ndarray        # i32[L]
    joint_type: np.ndarray    # i32[L]
    origin_xyz: np.ndarray    # f32[L,3]  parent link frame -> joint frame
    origin_quat: np.ndarray   # f32[L,4]
    axis: np.ndarray          # f32[L,3]  joint axis in child link frame
    lower: np.ndarray         # f32[L]    (pybullet convention: 0,-1 = continuous)
    upper: np.ndarray
    damping: np.ndarray       # f32[L]
    mass: np.ndarray          # f32[L]
    com: np.ndarray           # f32[L,3]
    inertia_diag: np.ndarray  # f32[L,3]  principal moments (about com)
    inertia_quat: np.ndarray  # f32[L,4]  principal-axes rotation in link frame

    @property
    def nlinks(self) -> int:
        return len(self.parent)

    @property
    def dof_links(self) -> np.ndarray:
        """Link indices carrying a dof, in link order (pybullet motor-joint order)."""
        return np.where(self.joint_type != JOINT_FIXED)[0]

    @property
    def ndof(self) -> int:
        return int((self.joint_type != JOINT_FIXED).sum())

    @property
    def dof_index(self) -> np.ndarray:
        """i32[L]: dof index for each link, -1 for fixed joints."""
        out = -np.ones(self.nlinks, dtype=np.int32)
        out[self.dof_links] = np.arange(self.ndof, dtype=np.int32)
        return out

    def dof_limits(self) -> Tuple[np.ndarray, np.ndarray]:
        """Per-dof (lower, upper) with the reference's continuous-joint
        convention preserved: (0,-1) means unlimited
        (reference: world_creation.py:109-111)."""
        dl = self.dof_links
        return self.lower[dl], self.upper[dl]

    def link_index(self, name: str) -> int:
        return self.link_names.index(name)


def from_spec(spec: Dict) -> ArticulatedModel:
    """Build a model from a compiled URDF spec (models/urdf.py)."""
    f32 = lambda k: np.asarray(spec[k], dtype=np.float32)
    return ArticulatedModel(
        name=spec["name"],
        link_names=tuple(spec["link_names"]),
        parent=np.asarray(spec["parent"], dtype=np.int32),
        joint_type=np.asarray(spec["joint_type"], dtype=np.int32),
        origin_xyz=f32("origin_xyz"),
        origin_quat=f32("origin_quat"),
        axis=f32("axis"),
        lower=f32("lower"),
        upper=f32("upper"),
        damping=f32("damping"),
        mass=f32("mass"),
        com=f32("com"),
        inertia_diag=f32("inertia_diag"),
        inertia_quat=f32("inertia_quat"),
    )


def attach_fixed(
    model: ArticulatedModel,
    parent_link: int,
    name: str,
    offset_xyz,
    offset_quat,
    mass: float = 0.0,
    com=(0.0, 0.0, 0.0),
    inertia_diag=(0.0, 0.0, 0.0),
) -> ArticulatedModel:
    """Weld an extra body (e.g. the task tool) onto a link as a fixed child.

    TPU-native replacement for the reference's runtime fixed constraint
    holding the tool in the gripper (world_creation.py:337-345,
    maxForce=500): composing the tool into the kinematic tree makes the weld
    exact and lets tool contact forces flow into arm joints through the same
    dynamics pass (SURVEY.md §2.2 N3).
    """
    app = lambda a, v: np.concatenate([a, np.asarray([v], dtype=a.dtype)], axis=0)
    return dataclasses.replace(
        model,
        link_names=model.link_names + (name,),
        parent=app(model.parent, parent_link),
        joint_type=app(model.joint_type, JOINT_FIXED),
        origin_xyz=np.concatenate([model.origin_xyz, np.asarray([offset_xyz], np.float32)]),
        origin_quat=np.concatenate([model.origin_quat, np.asarray([offset_quat], np.float32)]),
        axis=np.concatenate([model.axis, np.asarray([[0.0, 0.0, 1.0]], np.float32)]),
        lower=app(model.lower, 0.0),
        upper=app(model.upper, -1.0),
        damping=app(model.damping, 0.0),
        mass=app(model.mass, mass),
        com=np.concatenate([model.com, np.asarray([com], np.float32)]),
        inertia_diag=np.concatenate([model.inertia_diag, np.asarray([inertia_diag], np.float32)]),
        inertia_quat=np.concatenate([model.inertia_quat, np.asarray([[0, 0, 0, 1]], np.float32)]),
    )
