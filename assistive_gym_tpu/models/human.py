"""Procedural 40-dof human model: capsule/sphere bodies, anthropometric dims.

Re-derivation of the reference's HumanCreation (human_creation.py:58-301)
as static arrays.  Link indexing follows PyBullet's DFS re-ordering of
createMultiBody, i.e. the joint legend at human_creation.py:5-46:

    joints 0-2   right clavicle x,y,z      links: 2  right_shoulder
    joints 3-5   right shoulder socket     links: 5  right_upperarm
    joint  6     right elbow x                    7  right_forearm
    joint  7     right forearm roll z             9  right_hand
    joints 8-9   right wrist x,y
    joints 10-19 left arm (mirror)               12/15/17/19 left side
    joint  20    neck x                           20 neck
    joints 21-23 head x,y,z                       23 head
    joint  24    waist (FIXED)                    24 waist
    joints 25-27 waist x,y,z                      27 hips
    joints 28-34 right leg                        30/31/34 thigh/shin/foot
    joints 35-41 left leg                         37/38/41

Anthropometric dimensions, per-link mass fractions and joint limits are data
extracted from the reference (human_creation.py:72-158,174-263); the builder,
dynamics representation and collision set are new.  The head mesh is
approximated by a sphere (SURVEY.md §2.2 N2 mesh re-approximation); the mouth
frame offset used by feeding/drinking targets is exact
(feeding.py:139, [0,-0.11,0.03] male / [0,-0.1,0.03] female).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Tuple

import numpy as np

from ..physics.model import ArticulatedModel, JOINT_FIXED, JOINT_REVOLUTE

D2R = math.pi / 180.0

# Link indices (parity with reference task code)
RIGHT_SHOULDER, RIGHT_UPPERARM, RIGHT_FOREARM, RIGHT_HAND = 2, 5, 7, 9
LEFT_SHOULDER, LEFT_UPPERARM, LEFT_FOREARM, LEFT_HAND = 12, 15, 17, 19
NECK, HEAD, WAIST, HIPS = 20, 23, 24, 27
RIGHT_THIGH, RIGHT_SHIN, RIGHT_FOOT = 30, 31, 34
LEFT_THIGH, LEFT_SHIN, LEFT_FOOT = 37, 38, 41

RIGHT_ARM_JOINTS = list(range(0, 10))
LEFT_ARM_JOINTS = list(range(10, 20))
HEAD_JOINTS = [20, 21, 22, 23]


@dataclasses.dataclass(frozen=True)
class HumanDims:
    """Gender-specific dimensions (reference human_creation.py:72-158 and
    config.ini [human_male]/[human_female])."""
    mass: float
    chest_r: float; chest_l: float; chest_z: float
    shoulders_r: float; shoulders_l: float; shoulders_xoff: float
    shoulders_p: float
    neck_r: float; neck_l: float; neck_zoff: float; neck_p: float
    head_p: float
    upperarm_r: float; upperarm_l: float
    forearm_r: float; forearm_l: float
    hand_r: float
    upperarm_xoff: float
    waist_r: float; waist_l: float; waist_p: float
    hips_r: float; hips_l: float; hips_zoff: float; hips_p: float
    thigh_r: float; thigh_l: float; thigh_xoff: float
    shin_r: float; shin_l: float
    foot_r: float; foot_l: float; foot_yoff: float; foot_zoff: float
    head_sphere_r: float; head_sphere_off: Tuple[float, float, float]
    mouth_pos: Tuple[float, float, float]
    base_height: float  # wheelchair-task base z (scratch_itch.py:105)


def dims(gender: str, mass: float = None, rs: float = 1.0, hs: float = 1.0) -> HumanDims:
    if gender == "male":
        m = 78.4 if mass is None else mass
        return HumanDims(
            mass=m,
            chest_r=0.127 * rs, chest_l=0.056, chest_z=1.2455 * hs,
            shoulders_r=0.106 * rs, shoulders_l=0.253 / 8,
            shoulders_xoff=0.253 / 2.5 - 0.253 / 16,
            shoulders_p=0.1415 / 2 * hs,
            neck_r=0.06 * rs, neck_l=0.124 * hs,
            neck_zoff=(0.2565 - 0.1415 - 0.025) * hs, neck_p=0.1515 * hs,
            head_p=(0.399 - 0.1415 - 0.1205) * hs,
            upperarm_r=0.043 * rs, upperarm_l=0.279 * hs,
            forearm_r=0.033 * rs, forearm_l=0.257 * hs,
            hand_r=0.043 * rs,
            upperarm_xoff=0.106 * rs + 0.073,
            waist_r=0.1205 * rs, waist_l=0.049, waist_p=0.156 * hs,
            hips_r=0.1335 * rs, hips_l=0.094, hips_zoff=0.08125 * hs,
            hips_p=0.08125 * hs,
            thigh_r=0.08 * rs, thigh_l=0.424 * hs, thigh_xoff=0.08 * rs + 0.009,
            shin_r=0.05 * rs, shin_l=0.403 * hs,
            foot_r=0.05 * rs, foot_l=0.215 * hs, foot_yoff=-0.1, foot_zoff=-0.025 * rs,
            head_sphere_r=0.10, head_sphere_off=(0.0, 0.0, 0.09),
            mouth_pos=(0.0, -0.11, 0.03),
            base_height=0.89,
        )
    else:
        m = 62.5 if mass is None else mass
        return HumanDims(
            mass=m,
            chest_r=0.127 * rs, chest_l=0.01, chest_z=1.148 * hs,
            shoulders_r=0.092 * rs, shoulders_l=0.225 / 8,
            shoulders_xoff=0.225 / 2.5 - 0.225 / 16,
            shoulders_p=0.132 / 2 * hs,
            neck_r=0.05 * rs, neck_l=0.121 * hs,
            neck_zoff=(0.2565 - 0.1415 - 0.025) * hs, neck_p=0.132 * hs,
            head_p=0.12 * hs,
            upperarm_r=0.0355 * rs, upperarm_l=0.264 * hs,
            forearm_r=0.027 * rs, forearm_l=0.234 * hs,
            hand_r=0.0355 * rs,
            upperarm_xoff=0.092 * rs + 0.067,
            waist_r=0.11 * rs, waist_l=0.009, waist_p=0.15 * hs,
            hips_r=0.127 * rs, hips_l=0.117, hips_zoff=0.15 / 2 * hs,
            hips_p=0.15 / 2 * hs,
            thigh_r=0.0775 * rs, thigh_l=0.391 * hs, thigh_xoff=0.0775 * rs + 0.0145,
            shin_r=0.045 * rs, shin_l=0.367 * hs,
            foot_r=0.045 * rs, foot_l=0.195 * hs, foot_yoff=-0.09, foot_zoff=-0.0225 * rs,
            head_sphere_r=0.095, head_sphere_off=(0.0, 0.0, 0.08),
            mouth_pos=(0.0, -0.1, 0.03),
            base_height=0.86,
        )


def _capsule_inertia(m, r, l):
    """Solid capsule principal inertia about com, axis z (Bullet computes the
    same from shape when no inertia is given)."""
    if m <= 0:
        return (0.0, 0.0, 0.0)
    # cylinder + two hemispheres, standard closed form
    vc = math.pi * r * r * l
    vs = 4.0 / 3.0 * math.pi * r ** 3
    mc = m * vc / (vc + vs) if (vc + vs) > 0 else 0.0
    ms = m - mc
    iz = 0.5 * mc * r * r + 0.4 * ms * r * r
    ix = mc * (l * l / 12.0 + r * r / 4.0) + ms * (0.4 * r * r + 0.5 * l * l / 2.0 * 0 + (l / 2.0) ** 2 + 3.0 / 8.0 * r * l)
    return (ix, ix, iz)


def _sphere_inertia(m, r):
    i = 0.4 * m * r * r
    return (i, i, i)


def build_human(gender: str, limit_scale: float = 1.0, cloth: bool = False,
                mass: float = None, rs: float = 1.0, hs: float = 1.0):
    """Returns (ArticulatedModel, geom dicts with local link ids, HumanDims).

    `limit_scale` implements the 'limits' impairment
    (world_creation.py:64, human_creation.py:58 limit_scale argument): arm and
    head joint limits shrink; waist/leg limits are not scaled
    (human_creation.py:234-235,248-249 use unscaled arrays).
    """
    d = dims(gender, mass, rs, hs)
    m = d.mass
    ls = limit_scale

    links: List[dict] = []

    def add(name, parent, xyz, axis, lo, hi, mass_frac=0.0, jtype=JOINT_REVOLUTE,
            inertia=(0.0, 0.0, 0.0)):
        links.append(dict(name=name, parent=parent, xyz=xyz, axis=axis,
                          lo=lo, hi=hi, mass=mass_frac * m, jtype=jtype,
                          inertia=inertia))
        return len(links) - 1

    deg = lambda a: a * D2R
    cap_i = _capsule_inertia
    sph_i = _sphere_inertia

    # --- right clavicle + arm (joints 0-9) ----------------------------------
    sp = [0.0, 0.0, d.shoulders_p]
    add("right_clav_x", -1, sp, (1, 0, 0), deg(-10) * ls, deg(10) * ls)
    add("right_clav_y", 0, sp, (0, 1, 0), deg(-10) * ls, deg(30) * ls)
    add("right_shoulder", 1, (0, 0, 0), (0, 0, 1), deg(-35) * ls, deg(35) * ls,
        0.05, inertia=cap_i(0.05 * m, d.shoulders_r, d.shoulders_l))
    up = [-d.upperarm_xoff, 0.0, 0.0]
    add("right_socket_y", 2, up, (0, 1, 0), deg(5) * ls, deg(198) * ls)
    add("right_socket_x", 3, (0, 0, 0), (1, 0, 0), deg(-188) * ls, deg(61) * ls)
    add("right_upperarm", 4, (0, 0, 0), (0, 0, 1), deg(-90) * ls, deg(90) * ls,
        0.033, inertia=cap_i(0.033 * m, d.upperarm_r, d.upperarm_l))
    add("right_elbow", 5, (0, 0, -d.upperarm_l), (1, 0, 0), deg(-128) * ls, 0.0)
    add("right_forearm", 6, (0, 0, 0), (0, 0, 1), deg(-90) * ls, deg(90) * ls,
        0.019, inertia=cap_i(0.019 * m, d.forearm_r, d.forearm_l))
    # wrist sits at forearm_radius + forearm_length below the elbow frame
    # (human_creation.py:106,152: hand_p = [0,0,-(forearm_r*rs + forearm_l*hs)])
    hp = [0.0, 0.0, -(d.forearm_r + d.forearm_l)]
    add("right_wrist_x", 7, hp, (1, 0, 0), deg(-81) * ls, deg(90) * ls)
    add("right_hand", 8, (0, 0, 0), (0, 1, 0), deg(-27) * ls, deg(47) * ls,
        0.0065, inertia=sph_i(0.0065 * m, d.hand_r))

    # --- left clavicle + arm (joints 10-19) ---------------------------------
    add("left_clav_x", -1, sp, (1, 0, 0), deg(-10) * ls, deg(10) * ls)
    add("left_clav_y", 10, sp, (0, 1, 0), deg(-30) * ls, deg(10) * ls)
    add("left_shoulder", 11, (0, 0, 0), (0, 0, 1), deg(-35) * ls, deg(35) * ls,
        0.05, inertia=cap_i(0.05 * m, d.shoulders_r, d.shoulders_l))
    lup = [d.upperarm_xoff, 0.0, 0.0]
    add("left_socket_y", 12, lup, (0, 1, 0), deg(-198) * ls, deg(-5) * ls)
    add("left_socket_x", 13, (0, 0, 0), (1, 0, 0), deg(-188) * ls, deg(61) * ls)
    add("left_upperarm", 14, (0, 0, 0), (0, 0, 1), deg(-90) * ls, deg(90) * ls,
        0.033, inertia=cap_i(0.033 * m, d.upperarm_r, d.upperarm_l))
    add("left_elbow", 15, (0, 0, -d.upperarm_l), (1, 0, 0), deg(-128) * ls, 0.0)
    add("left_forearm", 16, (0, 0, 0), (0, 0, 1), deg(-90) * ls, deg(90) * ls,
        0.019, inertia=cap_i(0.019 * m, d.forearm_r, d.forearm_l))
    add("left_wrist_x", 17, hp, (1, 0, 0), deg(-81) * ls, deg(90) * ls)
    add("left_hand", 18, (0, 0, 0), (0, 1, 0), deg(-47) * ls, deg(27) * ls,
        0.0065, inertia=sph_i(0.0065 * m, d.hand_r))

    # --- neck + head (joints 20-23) ------------------------------------------
    add("neck", -1, [0, 0, d.neck_p], (1, 0, 0), deg(-10) * ls, deg(20) * ls,
        0.01, inertia=cap_i(0.01 * m, d.neck_r, d.neck_l))
    add("head_x", 20, [0, 0, d.head_p], (1, 0, 0), deg(-50) * ls, deg(50) * ls)
    add("head_y", 21, (0, 0, 0), (0, 1, 0), deg(-34) * ls, deg(34) * ls)
    add("head", 22, (0, 0, 0), (0, 0, 1), deg(-70) * ls, deg(70) * ls,
        0.07, inertia=sph_i(0.07 * m, d.head_sphere_r))

    # --- waist + hips (joints 24-27; 24 fixed, limits unscaled) --------------
    add("waist", -1, [0, 0, -d.waist_p], (0, 0, 1), 0.0, -1.0, 0.0,
        jtype=JOINT_FIXED, inertia=cap_i(0.0, d.waist_r, d.waist_l))
    add("hips_x", 24, [0, 0, -d.hips_p], (1, 0, 0), deg(-75), deg(30))
    add("hips_y", 25, (0, 0, 0), (0, 1, 0), deg(-30), deg(30), 0.13)
    add("hips", 26, (0, 0, 0), (0, 0, 1), deg(-30), deg(30), 0.14,
        inertia=cap_i(0.14 * m, d.hips_r, d.hips_l))

    # --- legs (joints 28-41, limits unscaled) --------------------------------
    def leg(side, hips_link, sign, lo_z, hi_z, lo_ay, hi_ay, lo_az, hi_az):
        tp = [sign * d.thigh_xoff, 0.0, -d.hips_zoff]
        i0 = add(f"{side}_hip_x", hips_link, tp, (1, 0, 0), deg(-127), deg(30))
        i1 = add(f"{side}_hip_y", i0, (0, 0, 0), (0, 1, 0), deg(lo_z), deg(hi_z))
        i2 = add(f"{side}_thigh", i1, (0, 0, 0), (0, 0, 1), deg(-45 if side == 'right' else -40), deg(40 if side == 'right' else 45),
                 0.105, inertia=cap_i(0.105 * m, d.thigh_r, d.thigh_l))
        i3 = add(f"{side}_shin", i2, (0, 0, -d.thigh_l), (1, 0, 0), 0.0, deg(130),
                 0.0475, inertia=cap_i(0.0475 * m, d.shin_r, d.shin_l))
        i4 = add(f"{side}_ankle_x", i3, (0, 0, -d.shin_l - (0.025 if gender == 'male' else 0.0225)),
                 (1, 0, 0), deg(-35), deg(38))
        i5 = add(f"{side}_ankle_y", i4, (0, 0, 0), (0, 1, 0), deg(lo_ay), deg(hi_ay))
        i6 = add(f"{side}_foot", i5, (0, 0, 0), (0, 0, 1), deg(lo_az), deg(hi_az),
                 0.014, inertia=cap_i(0.014 * m, d.foot_r, d.foot_l))
        return i2, i3, i6

    leg("right", 27, -1, -40, 45, -23, 24, -43, 35)
    leg("left", 27, +1, -45, 40, -24, 23, -35, 43)

    L = len(links)
    model = ArticulatedModel(
        name=f"human_{gender}",
        link_names=tuple(l["name"] for l in links),
        parent=np.array([l["parent"] for l in links], np.int32),
        joint_type=np.array([l["jtype"] for l in links], np.int32),
        origin_xyz=np.array([l["xyz"] for l in links], np.float32),
        origin_quat=np.tile(np.array([[0, 0, 0, 1]], np.float32), (L, 1)),
        axis=np.array([l["axis"] for l in links], np.float32),
        lower=np.array([l["lo"] for l in links], np.float32),
        upper=np.array([l["hi"] for l in links], np.float32),
        damping=np.full(L, 0.5, np.float32),  # flesh/joint friction proxy
        mass=np.array([l["mass"] for l in links], np.float32),
        com=np.array(_coms(links, d, gender), np.float32),
        inertia_diag=np.array([l["inertia"] for l in links], np.float32),
        inertia_quat=np.tile(np.array([[0, 0, 0, 1]], np.float32), (L, 1)),
    )

    geoms = _human_geoms(d, gender, cloth)
    return model, geoms, d


def _coms(links, d: HumanDims, gender: str):
    """Com per link = centre of its capsule (offset from link frame)."""
    out = []
    for l in links:
        n = l["name"]
        if "upperarm" in n and n.endswith("upperarm"):
            out.append([0, 0, -d.upperarm_l / 2])
        elif n.endswith("forearm"):
            out.append([0, 0, -d.forearm_l / 2])
        elif n.endswith("hand"):
            out.append([0, 0, -d.hand_r])
        elif n.endswith("thigh"):
            out.append([0, 0, -d.thigh_l / 2])
        elif n.endswith("shin"):
            out.append([0, 0, -d.shin_l / 2])
        elif n.endswith("foot"):
            out.append([0, d.foot_yoff / 2, d.foot_zoff])
        elif n == "head":
            out.append(list(d.head_sphere_off))
        elif n == "neck":
            out.append([0, 0, d.neck_zoff])
        elif n == "hips":
            out.append([0, 0, -d.hips_zoff])
        else:
            out.append([0, 0, 0])
    return out


def _human_geoms(d: HumanDims, gender: str, cloth: bool) -> List[dict]:
    """Collision geoms (local link frames). gtype 0 = segment (see contact.py)."""
    def cap_z(link, r, length, off=(0, 0, 0), axis=(0, 0, 1)):
        a = np.asarray(axis, np.float32)
        o = np.asarray(off, np.float32)
        return dict(link=link, gtype=0, radius=r,
                    p0=tuple(o - a * length / 2), p1=tuple(o + a * length / 2))

    def sphere(link, r, off=(0, 0, 0)):
        return dict(link=link, gtype=0, radius=r, p0=tuple(off), p1=tuple(off))

    g = [
        cap_z(-1, d.chest_r, d.chest_l, axis=(1, 0, 0)),                        # chest (base)
        cap_z(RIGHT_SHOULDER, d.shoulders_r, d.shoulders_l,
              off=(-d.shoulders_xoff, 0, 0), axis=(1, 0, 0)),
        cap_z(LEFT_SHOULDER, d.shoulders_r, d.shoulders_l,
              off=(d.shoulders_xoff, 0, 0), axis=(1, 0, 0)),
        cap_z(NECK, d.neck_r, d.neck_l, off=(0, 0, d.neck_zoff)),
        sphere(HEAD, d.head_sphere_r, d.head_sphere_off),
        cap_z(RIGHT_UPPERARM, d.upperarm_r, d.upperarm_l, off=(0, 0, -d.upperarm_l / 2)),
        cap_z(RIGHT_FOREARM, d.forearm_r, d.forearm_l, off=(0, 0, -d.forearm_l / 2)),
        sphere(RIGHT_HAND, d.hand_r, (0, 0, -d.hand_r)),
        cap_z(LEFT_UPPERARM, d.upperarm_r, d.upperarm_l, off=(0, 0, -d.upperarm_l / 2)),
        cap_z(LEFT_FOREARM, d.forearm_r, d.forearm_l, off=(0, 0, -d.forearm_l / 2)),
        sphere(LEFT_HAND, d.hand_r, (0, 0, -d.hand_r)),
        cap_z(WAIST, d.waist_r, d.waist_l, axis=(1, 0, 0)),
        cap_z(HIPS, d.hips_r, d.hips_l, off=(0, 0, -d.hips_zoff), axis=(1, 0, 0)),
        cap_z(RIGHT_THIGH, d.thigh_r, d.thigh_l, off=(0, 0, -d.thigh_l / 2)),
        cap_z(RIGHT_SHIN, d.shin_r, d.shin_l, off=(0, 0, -d.shin_l / 2)),
        cap_z(RIGHT_FOOT, d.foot_r, d.foot_l, off=(0, d.foot_yoff, d.foot_zoff), axis=(0, 1, 0)),
        cap_z(LEFT_THIGH, d.thigh_r, d.thigh_l, off=(0, 0, -d.thigh_l / 2)),
        cap_z(LEFT_SHIN, d.shin_r, d.shin_l, off=(0, 0, -d.shin_l / 2)),
        cap_z(LEFT_FOOT, d.foot_r, d.foot_l, off=(0, d.foot_yoff, d.foot_zoff), axis=(0, 1, 0)),
    ]
    if cloth:
        # joint-sphere fill-ins for cloth collision (human_creation.py:86-91)
        g += [
            sphere(13, d.upperarm_r), sphere(16, d.upperarm_r), sphere(18, d.forearm_r),
            sphere(3, d.upperarm_r), sphere(6, d.upperarm_r), sphere(8, d.forearm_r),
        ]
    return g
