"""URDF -> flat kinematic-tree compiler (ahead-of-jit; host side).

The reference delegates URDF parsing to Bullet's C++ importer
(reference: assistive_gym/envs/world_creation.py:161,205,231,260,274 via
p.loadURDF).  Here robot models are compiled offline into plain dicts of
arrays ("specs") that the JAX engine consumes as static data — robots become
data, not code (SURVEY.md §2.2 N6).

Link/joint indexing parity: PyBullet assigns joint index j to the j-th joint
in a depth-first traversal from the root link, visiting each link's child
joints in file order; link index j is the child link of joint j and the base
link is -1.  We reproduce that ordering so the reference's hardcoded index
tables (e.g. jaco arm joints [1..7], end effector 8) remain valid.

A C++ implementation of this compiler (native/urdf_compiler.cc) is used when
built; this pure-Python version is the reference implementation and fallback.
"""
from __future__ import annotations

import json
import math
import os
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional

import numpy as np

JOINT_FIXED = 0
JOINT_REVOLUTE = 1
JOINT_PRISMATIC = 2

_TYPE_MAP = {
    "fixed": JOINT_FIXED,
    "revolute": JOINT_REVOLUTE,
    "continuous": JOINT_REVOLUTE,
    "prismatic": JOINT_PRISMATIC,
}

# Joints PyBullet reports with (lower=0, upper=-1), treated by the reference
# IK as +-2*pi (reference: assistive_gym/envs/util.py:69-73).
CONTINUOUS_LOWER = 0.0
CONTINUOUS_UPPER = -1.0


def _floats(s: Optional[str], n: int, default: float = 0.0) -> List[float]:
    if not s:
        return [default] * n
    vals = [float(x) for x in s.split()]
    assert len(vals) == n, s
    return vals


def _rpy_to_quat(rpy):
    """xyzw quaternion from URDF rpy (matches Bullet setEulerZYX)."""
    r, p, y = rpy
    cr, sr = math.cos(r / 2), math.sin(r / 2)
    cp, sp = math.cos(p / 2), math.sin(p / 2)
    cy, sy = math.cos(y / 2), math.sin(y / 2)
    return [
        sr * cp * cy - cr * sp * sy,
        cr * sp * cy + sr * cp * sy,
        cr * cp * sy - sr * sp * cy,
        cr * cp * cy + sr * sp * sy,
    ]


def _native_lib():
    """ctypes handle to the C++ compiler (native/urdf_compiler.cc), or None."""
    import ctypes
    lib_path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                            "native", "liburdfc.so")
    if not os.path.exists(lib_path):
        return None
    try:
        lib = ctypes.CDLL(lib_path)
        lib.urdfc_compile.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.urdfc_compile.restype = ctypes.c_int
        return lib
    except OSError:
        return None


def parse_urdf_native(path: str) -> Optional[Dict]:
    """Compile via the native library; None if unavailable."""
    import json as _json
    import tempfile

    lib = _native_lib()
    if lib is None:
        return None
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tmp:
        out = tmp.name
    try:
        rc = lib.urdfc_compile(path.encode(), out.encode())
        if rc != 0:
            return None
        with open(out) as f:
            return _json.load(f)
    finally:
        os.unlink(out)


def parse_urdf(path: str, prefer_native: bool = False) -> Dict:
    """Parse a URDF file into a flat spec dict (see module docstring)."""
    if prefer_native:
        spec = parse_urdf_native(path)
        if spec is not None:
            return spec
    tree = ET.parse(path)
    robot = tree.getroot()
    name = robot.get("name", os.path.basename(path))

    links = {}      # name -> element
    joints = []     # (element,) in file order
    for el in robot:
        if el.tag == "link":
            links[el.get("name")] = el
        elif el.tag == "joint":
            joints.append(el)

    children: Dict[str, List[ET.Element]] = {}
    child_names = set()
    for j in joints:
        parent = j.find("parent").get("link")
        child_names.add(j.find("child").get("link"))
        children.setdefault(parent, []).append(j)

    roots = [n for n in links if n not in child_names]
    assert len(roots) == 1, f"{name}: expected single root, got {roots}"
    root = roots[0]

    spec = {
        "name": name,
        "root_link": root,
        "link_names": [],
        "joint_names": [],
        "parent": [],
        "joint_type": [],
        "origin_xyz": [],
        "origin_quat": [],
        "axis": [],
        "lower": [],
        "upper": [],
        "damping": [],
        "friction": [],
        "max_force": [],
        "max_velocity": [],
        "mass": [],
        "com": [],
        "inertia_diag": [],
        "inertia_quat": [],
    }
    spec["base_inertial"] = _inertial(links[root])

    index_of = {root: -1}

    def visit(link_name: str):
        for j in children.get(link_name, []):
            child = j.find("child").get("link")
            jtype = _TYPE_MAP[j.get("type")]
            origin = j.find("origin")
            xyz = _floats(origin.get("xyz") if origin is not None else None, 3)
            rpy = _floats(origin.get("rpy") if origin is not None else None, 3)
            axis_el = j.find("axis")
            axis = _floats(axis_el.get("xyz") if axis_el is not None else "1 0 0", 3)
            n = np.linalg.norm(axis)
            axis = (np.array(axis) / n).tolist() if n > 0 else [1.0, 0.0, 0.0]
            limit = j.find("limit")
            if j.get("type") == "continuous" or limit is None:
                lower, upper = CONTINUOUS_LOWER, CONTINUOUS_UPPER
                effort, velocity = 0.0, 0.0
            else:
                lower = float(limit.get("lower", 0.0))
                upper = float(limit.get("upper", 0.0))
                effort = float(limit.get("effort", 0.0))
                velocity = float(limit.get("velocity", 0.0))
            if jtype == JOINT_FIXED:
                lower, upper = 0.0, -1.0
            dyn = j.find("dynamics")
            damping = float(dyn.get("damping", 0.0)) if dyn is not None else 0.0
            friction = float(dyn.get("friction", 0.0)) if dyn is not None else 0.0

            inertial = _inertial(links[child])

            idx = len(spec["link_names"])
            index_of[child] = idx
            spec["link_names"].append(child)
            spec["joint_names"].append(j.get("name"))
            spec["parent"].append(index_of[link_name])
            spec["joint_type"].append(jtype)
            spec["origin_xyz"].append(xyz)
            spec["origin_quat"].append(_rpy_to_quat(rpy))
            spec["axis"].append(axis)
            spec["lower"].append(lower)
            spec["upper"].append(upper)
            spec["damping"].append(damping)
            spec["friction"].append(friction)
            spec["max_force"].append(effort)
            spec["max_velocity"].append(velocity)
            spec["mass"].append(inertial["mass"])
            spec["com"].append(inertial["com"])
            spec["inertia_diag"].append(inertial["inertia_diag"])
            spec["inertia_quat"].append(inertial["inertia_quat"])
            visit(child)

    visit(root)
    return spec


def _inertial(link_el: ET.Element) -> Dict:
    inertial = link_el.find("inertial")
    if inertial is None:
        return {
            "mass": 0.0,
            "com": [0.0, 0.0, 0.0],
            "inertia_diag": [0.0, 0.0, 0.0],
            "inertia_quat": [0.0, 0.0, 0.0, 1.0],
        }
    mass = float(inertial.find("mass").get("value"))
    origin = inertial.find("origin")
    com = _floats(origin.get("xyz") if origin is not None else None, 3)
    rpy = _floats(origin.get("rpy") if origin is not None else None, 3)
    inertia = inertial.find("inertia")
    if inertia is None:
        diag = [0.0, 0.0, 0.0]
        quat = _rpy_to_quat(rpy)
    else:
        ixx = float(inertia.get("ixx", 0.0))
        iyy = float(inertia.get("iyy", 0.0))
        izz = float(inertia.get("izz", 0.0))
        ixy = float(inertia.get("ixy", 0.0))
        ixz = float(inertia.get("ixz", 0.0))
        iyz = float(inertia.get("iyz", 0.0))
        I = np.array([[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]])
        # Diagonalise: principal axes absorbed into the inertia orientation.
        w, V = np.linalg.eigh(I)
        if np.linalg.det(V) < 0:
            V[:, 0] = -V[:, 0]
        R_rpy = _quat_to_mat(_rpy_to_quat(rpy))
        R = R_rpy @ V
        diag = np.maximum(w, 0.0).tolist()
        quat = _mat_to_quat(R)
    return {"mass": mass, "com": com, "inertia_diag": diag, "inertia_quat": quat}


def _quat_to_mat(q):
    x, y, z, w = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def _mat_to_quat(R):
    t = np.trace(R)
    if t > 0:
        s = math.sqrt(t + 1.0) * 2
        return [(R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s,
                (R[1, 0] - R[0, 1]) / s, 0.25 * s]
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = math.sqrt(max(R[i, i] - R[j, j] - R[k, k] + 1.0, 1e-12)) * 2
    q = [0.0, 0.0, 0.0, 0.0]
    q[i] = 0.25 * s
    q[3] = (R[k, j] - R[j, k]) / s
    q[j] = (R[j, i] + R[i, j]) / s
    q[k] = (R[k, i] + R[i, k]) / s
    return q


def save_spec(spec: Dict, path: str) -> None:
    with open(path, "w") as f:
        json.dump(spec, f)


def load_spec(path: str) -> Dict:
    with open(path) as f:
        return json.load(f)
