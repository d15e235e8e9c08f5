"""Position-based-dynamics cloth: the dressing task's hospital gown.

TPU-native replacement for the reference's custom Bullet soft-body fork
(Zackory/bullet3: p.loadCloth / clothParams / getSoftBodyData,
dressing.py:24,170-171).  The gown is a clustered mass-spring mesh
(models/assets/cloth_gown.npz, compiled by tools/compile_assets.compile_cloth)
simulated with XPBD-style distance-constraint projection:

  predict -> Jacobi edge projection (iters ~ piterations=5, dressing.py:171)
  -> anchor pinning (bodyAnchorId semantics: anchored vertices translate
  rigidly with the gripper attachment, which never rotates,
  dressing.py:19-20,206) -> capsule/floor collision -> velocity update.

Everything is fixed-shape [V,3]/[E,2] array math under vmap: scatter-adds
for the Jacobi accumulation, one [V,G] distance matrix for human collision.

Contact readback parity: getSoftBodyData returns per-contact positions and
forces which the reference filters (z < 1.1, |f| < 20) and sums
(dressing.py:34-43,64).  Here per-vertex contact force is estimated from the
collision projection depth (penalty equivalent), same filters applied.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_ASSETS = os.path.join(os.path.dirname(__file__), "..", "models", "assets")

# readback force scale: depth -> newtons, calibrated so sustained cloth-on-arm
# contact reads a few newtons like the reference's kCHR=1.0 contacts
FORCE_PER_DEPTH = 400.0


@functools.lru_cache(maxsize=1)
def gown_np():
    z = np.load(os.path.join(_ASSETS, "cloth_gown.npz"))
    return {k: np.asarray(z[k]) for k in z.files}


@functools.lru_cache(maxsize=1)
def _incidence_np():
    """Static per-vertex incident-edge gather table (eidx [V,D], sign [V,D]).

    TPU scatters serialize; the Jacobi accumulation instead gathers each
    vertex's ≤D incident edge corrections (pad index E selects an appended
    zero row).  Gathers of contiguous [3,B] rows stay on the fast path."""
    g = gown_np()
    E = g["edges"]
    V = g["pos"].shape[0]
    deg = np.zeros(V, np.int64)
    np.add.at(deg, E[:, 0], 1)
    np.add.at(deg, E[:, 1], 1)
    D = int(deg.max())
    eidx = np.full((V, D), E.shape[0], np.int32)
    sign = np.zeros((V, D), np.float32)
    fill = np.zeros(V, np.int64)
    for ei, (a, b) in enumerate(E):
        eidx[a, fill[a]] = ei; sign[a, fill[a]] = 1.0; fill[a] += 1
        eidx[b, fill[b]] = ei; sign[b, fill[b]] = -1.0; fill[b] += 1
    return eidx, sign


@functools.lru_cache(maxsize=1)
def _neighbor_np():
    """Static per-vertex neighbor table (nbr [V,D], rest [V,D], mask [V,D]).

    The batched Jacobi pass is reformulated per-vertex: each vertex pulls
    its ≤D neighbors' positions with ONE gather per slot and computes its
    own half-correction locally — no [E,3,B] corr tensor is ever
    materialized and no per-iteration anchor scatter is needed (anchored
    vertices just mask their dx).  Cuts the iteration's HBM traffic ~3x vs
    the edge-form (gather e0/e1 + corr_pad + 11 incidence gathers)."""
    g = gown_np()
    E = g["edges"]
    rest_e = g["rest"]
    V = g["pos"].shape[0]
    deg = np.zeros(V, np.int64)
    np.add.at(deg, E[:, 0], 1)
    np.add.at(deg, E[:, 1], 1)
    D = int(deg.max())
    nbr = np.full((V, D), 0, np.int32)
    rest = np.zeros((V, D), np.float32)
    mask = np.zeros((V, D), np.float32)
    fill = np.zeros(V, np.int64)
    for ei, (a, b) in enumerate(E):
        nbr[a, fill[a]] = b; rest[a, fill[a]] = rest_e[ei]
        mask[a, fill[a]] = 1.0; fill[a] += 1
        nbr[b, fill[b]] = a; rest[b, fill[b]] = rest_e[ei]
        mask[b, fill[b]] = 1.0; fill[b] += 1
    return nbr, rest, mask, np.maximum(deg.astype(np.float32), 1.0)


def _jacobi_dx(corr):
    """Per-vertex summed edge corrections via the static gather table.
    corr: [E,3] or [E,3,B]; returns [V,3(,B)] = Σ_incident ±0.5·corr."""
    eidx, sign = _incidence_np()
    corr_pad = jnp.concatenate(
        [corr, jnp.zeros((1,) + corr.shape[1:], corr.dtype)], 0)
    extra = (None,) * (corr.ndim - 1)
    dx = None
    for d in range(eidx.shape[1]):
        c = jnp.asarray(sign[:, d])[(slice(None),) + extra] * corr_pad[eidx[:, d]]
        dx = c if dx is None else dx + c
    return 0.5 * dx


class ClothState(NamedTuple):
    x: jnp.ndarray   # f32[V,3]
    v: jnp.ndarray   # f32[V,3]


def initial_state(world_pos, world_yaw_quat, scale: float = 1.4) -> ClothState:
    """Place the gown: loadCloth(scale=1.4, position, orientation=euler(0,0,pi))
    (dressing.py:170)."""
    from . import math3d as m3

    g = gown_np()
    x = jnp.asarray(g["pos"]) * scale
    x = m3.quat_rotate(world_yaw_quat[None], x) + world_pos[None]
    return ClothState(x, jnp.zeros_like(x))


def substep(
    state: ClothState,
    dt: float,
    gravity,
    anchor_pos: jnp.ndarray,      # f32[A,3] target positions of anchor verts
    seg_a: jnp.ndarray,           # human capsules [G,3]
    seg_b: jnp.ndarray,
    seg_r: jnp.ndarray,
    iters: int = 5,
    damping: float = 0.999,       # kDP=0.001 (dressing.py:171)
    stiffness: float = 0.3,
    cloth_thickness: float = 0.012,
) -> Tuple[ClothState, jnp.ndarray, jnp.ndarray]:
    """One PBD substep. Returns (state, contact_force_mag[V], contact_pos[V,3])."""
    g = gown_np()
    e0 = jnp.asarray(g["edges"][:, 0])
    e1 = jnp.asarray(g["edges"][:, 1])
    rest = jnp.asarray(g["rest"]) * 1.4
    anchors = jnp.asarray(g["anchors"])
    V = state.x.shape[0]
    # Jacobi denominators (static vertex degrees)
    deg = np.zeros(V, np.float32)
    np.add.at(deg, g["edges"][:, 0], 1.0)
    np.add.at(deg, g["edges"][:, 1], 1.0)
    degj = jnp.asarray(np.maximum(deg, 1.0))

    x_prev = state.x
    v = state.v * damping + jnp.asarray(gravity, state.x.dtype) * dt
    x = state.x + v * dt
    x = x.at[anchors].set(anchor_pos)

    for _ in range(iters):
        d = x[e0] - x[e1]
        L = jnp.linalg.norm(d, axis=-1)
        n = d / jnp.maximum(L, 1e-9)[:, None]
        corr = (stiffness * (rest - L))[:, None] * n      # applied half/half
        x = x + _jacobi_dx(corr) / degj[:, None]
        x = x.at[anchors].set(anchor_pos)

    # collision with human capsules: one [V,G] pass, deepest contact wins
    ab = seg_b - seg_a
    ap = x[:, None, :] - seg_a[None]
    t = jnp.clip(jnp.sum(ap * ab[None], -1)
                 / jnp.maximum(jnp.sum(ab * ab, -1), 1e-9)[None], 0.0, 1.0)
    closest = seg_a[None] + t[..., None] * ab[None]
    dvec = x[:, None, :] - closest
    dist = jnp.linalg.norm(dvec, axis=-1)
    depth = (seg_r[None] + cloth_thickness) - dist        # [V,G]
    dmax = depth.max(1)
    depth_g = jnp.maximum(dmax, 0.0)
    mask = depth >= dmax[:, None]
    w = (mask & (jnp.cumsum(mask.astype(jnp.int32), 1) == 1)).astype(x.dtype)
    nrm = (dvec * w[:, :, None]).sum(1)
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-9)
    x = x + depth_g[:, None] * nrm
    # floor
    x = x.at[:, 2].set(jnp.maximum(x[:, 2], 0.01))

    v = (x - x_prev) / dt
    contact_force = depth_g * FORCE_PER_DEPTH
    contact_pos = x
    return ClothState(x, v), contact_force, contact_pos


def substep_b(
    x: jnp.ndarray,               # f32[V,3,B] vertex positions (batch-last)
    v: jnp.ndarray,               # f32[V,3,B]
    dt: float,
    gravity,
    anchor_pos: jnp.ndarray,      # f32[A,3,B]
    seg_a: jnp.ndarray,           # human capsules [G,3,B] (batch-last)
    seg_b: jnp.ndarray,
    seg_r: jnp.ndarray,           # [G,B]
    iters: int = 5,
    damping: float = 0.999,
    stiffness: float = 0.3,
    cloth_thickness: float = 0.012,
):
    """Batch-last PBD substep: same math as `substep`, every array
    [rows, ..., B] so the env batch rides the TPU lane axis (the vmapped
    form pads the [B,V,G] collision tensor's trailing dims onto (8,128)
    tiles — a ~6x memory blowup this layout avoids).

    The Jacobi pass uses the per-vertex neighbor table (_neighbor_np): one
    [V,3,B]-row gather per degree slot, dx masked to zero on anchored
    vertices in place of the per-iteration anchor re-scatter — bit-level
    the same fixed point, ~3x less HBM traffic per iteration.  Returns
    (x', v', contact_force [V,B], contact_pos [V,3,B])."""
    g = gown_np()
    anchors = jnp.asarray(g["anchors"])
    V = x.shape[0]
    nbr_t, rest_t, mask_t, deg_t = _neighbor_np()
    rest_t = jnp.asarray(rest_t * 1.4)                       # loadCloth scale
    free = np.ones(V, np.float32)
    free[np.asarray(g["anchors"])] = 0.0                     # anchored: dx=0
    scale = jnp.asarray(free[:, None] * 0.5 / deg_t[:, None])[:, None]  # [V,1,1]

    grav = jnp.asarray(gravity, x.dtype)[None, :, None]      # [1,3,1]
    x_prev = x
    v = v * damping + grav * dt
    x = x + v * dt
    x = x.at[anchors].set(anchor_pos)     # once per substep; dx-mask keeps it

    for _ in range(iters):
        acc = jnp.zeros_like(x)
        for d in range(nbr_t.shape[1]):
            xn = x[jnp.asarray(nbr_t[:, d])]                 # [V,3,B]
            dvec = x - xn
            L2 = jnp.maximum(jnp.sum(dvec * dvec, 1), 1e-18)  # [V,B]
            r = jax.lax.rsqrt(L2)            # one rsqrt replaces sqrt + 2 divs
            coef = jnp.asarray(mask_t[:, d])[:, None] * stiffness \
                * (rest_t[:, d][:, None] * r - 1.0)          # (rest-L)/L
            acc = acc + coef[:, None] * dvec
        x = x + scale * acc

    # collision with human capsules: stream over the G capsules keeping only
    # [V,B]/[V,3,B] live values (the one-shot [V,G,3,B] form materializes
    # ~100s of MB of intermediates at B=4096); deepest contact wins, first
    # capsule wins ties — identical to the [V,G,B] argmax-free selection
    G = seg_a.shape[0]
    best_depth = None
    best_dvec = None
    for gi in range(G):
        a_g, b_g = seg_a[gi], seg_b[gi]                      # [3,B]
        ab_g = b_g - a_g
        ap_g = x - a_g[None]                                 # [V,3,B]
        t = jnp.clip(jnp.sum(ap_g * ab_g[None], 1)
                     / jnp.maximum(jnp.sum(ab_g * ab_g, 0), 1e-9)[None],
                     0.0, 1.0)                               # [V,B]
        dvec = ap_g - t[:, None] * ab_g[None]                # [V,3,B]
        dist = jnp.sqrt(jnp.maximum(jnp.sum(dvec * dvec, 1), 1e-18))
        depth = (seg_r[gi][None] + cloth_thickness) - dist   # [V,B]
        if best_depth is None:
            best_depth, best_dvec = depth, dvec
        else:
            better = depth > best_depth
            best_dvec = jnp.where(better[:, None], dvec, best_dvec)
            best_depth = jnp.maximum(depth, best_depth)
    depth_g = jnp.maximum(best_depth, 0.0)
    nrm = best_dvec * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(best_dvec * best_dvec, 1), 1e-18))[:, None]
    x = x + depth_g[:, None] * nrm
    # floor
    x = x.at[:, 2].set(jnp.maximum(x[:, 2], 0.01))

    v = (x - x_prev) / dt
    return x, v, depth_g * FORCE_PER_DEPTH, x
