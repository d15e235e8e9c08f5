"""Fused Pallas TPU kernel for the dressing gown's PBD substep.

Replaces ops/cloth.substep_b's hot core on TPU (same math, same fixed
point): `iters` Jacobi distance projections + capsule/floor collision run
in one VMEM-resident kernel.  The XLA form streams ~175 MB of HBM per
Jacobi iteration at B=2048 (11 neighbor gathers over [V,3,B]); here the
cloth positions stay in VMEM across all iterations and the gather/scatter
pair runs on the MXU as incidence-matrix matmuls:

    d_e   = A  @ x      A  [E,V] = +1 at e0, -1 at e1   (edge vectors)
    corr  = f(d_e)      elementwise VPU (stiffness * (rest/L - 1) * d)
    dx_v  = A^T @ corr  scatter-add back to vertices

A is +-1/0 so it is EXACT in bf16; x is split hi/lo into two bf16 planes
(hi = bf16(x), lo = bf16(x - hi)) so each gather matmul reconstructs ~16
mantissa bits (~2e-5 m absolute on metre-scale positions — measured
against the fp32 XLA path in tests/test_pallas_cloth.py).  corr is
~millimetres, so a single bf16 plane suffices on the way back.

The cheap streaming parts (velocity integration, anchor pinning, final
velocity update) stay in XLA where they fuse for free — keeping them out
of the kernel removes the v array and one output from VMEM.  VMEM budget
at block_b=128 (v5e ~16 MB/core): x in/out double-buffered ~3.4 MB,
A/A^T bf16 unblocked ~4 MB, fp32 edge intermediates ~2.4 MB, live vertex
planes + collision scratch ~3 MB.

Reference behavior being accelerated: the soft-body fork's
btSoftBody::predictMotion + PSolve_Links + RContacts loop driven from
dressing.py:170-171 (piterations=5) — see ops/cloth.py for the parity
story.  Layouts follow ops/pallas_dynamics.py: every batched array is
row-major [rows, B] with the env batch on TPU lanes, grid-blocked over B.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cloth import FORCE_PER_DEPTH, gown_np

f32 = jnp.float32
bf16 = jnp.bfloat16


@functools.lru_cache(maxsize=1)
def _matrices_np():
    """Static incidence matrices + per-vertex scale / per-edge rest tables."""
    g = gown_np()
    E = g["edges"]
    V = g["pos"].shape[0]
    ne = E.shape[0]
    A = np.zeros((ne, V), np.float32)
    A[np.arange(ne), E[:, 0]] = 1.0
    A[np.arange(ne), E[:, 1]] = -1.0
    deg = np.zeros(V, np.float32)
    np.add.at(deg, E[:, 0], 1.0)
    np.add.at(deg, E[:, 1], 1.0)
    free = np.ones(V, np.float32)
    free[np.asarray(g["anchors"])] = 0.0      # anchored vertices: dx = 0
    scale = (free * 0.5 / np.maximum(deg, 1.0))[:, None]       # [V,1]
    rest = (g["rest"] * 1.4)[:, None]         # loadCloth scale=1.4  [E,1]
    return (A.astype(bf16), A.T.copy().astype(bf16),
            rest.astype(np.float32), scale.astype(np.float32))


def _build_kernel(V, E, G, iters, stiffness, thickness):
    def kernel(x_ref, sa_ref, sb_ref, sr_ref,
               am_ref, at_ref, rest_ref, scale_ref, xo_ref, f_ref):
        X = [x_ref[c * V:(c + 1) * V] for c in range(3)]        # fp32 [V,blk]
        am = am_ref[:]
        at = at_ref[:]
        rest = rest_ref[:]                    # [E,1]
        scale = scale_ref[:]                  # [V,1]
        for _ in range(iters):
            D = []
            for c in range(3):
                hi = X[c].astype(bf16)
                lo = (X[c] - hi.astype(f32)).astype(bf16)
                D.append(jnp.dot(am, hi, preferred_element_type=f32)
                         + jnp.dot(am, lo, preferred_element_type=f32))
            L2 = jnp.maximum(D[0] * D[0] + D[1] * D[1] + D[2] * D[2], 1e-18)
            coef = stiffness * (rest * jax.lax.rsqrt(L2) - 1.0)  # (rest-L)/L
            for c in range(3):
                corr = (coef * D[c]).astype(bf16)
                X[c] = X[c] + scale * jnp.dot(
                    at, corr, preferred_element_type=f32)

        # capsule collision: stream over G capsules, deepest contact wins,
        # first capsule wins ties (same selection as cloth.substep_b)
        best_d = None
        best_v = None
        for gi in range(G):
            a = [sa_ref[c * G + gi:c * G + gi + 1] for c in range(3)]
            ab = [sb_ref[c * G + gi:c * G + gi + 1] - a[c] for c in range(3)]
            ab2 = jnp.maximum(ab[0] * ab[0] + ab[1] * ab[1] + ab[2] * ab[2],
                              1e-9)                              # [1,blk]
            ap = [X[c] - a[c] for c in range(3)]                 # [V,blk]
            t = jnp.clip((ap[0] * ab[0] + ap[1] * ab[1] + ap[2] * ab[2])
                         / ab2, 0.0, 1.0)
            dv = [ap[c] - t * ab[c] for c in range(3)]
            dist = jnp.sqrt(jnp.maximum(
                dv[0] * dv[0] + dv[1] * dv[1] + dv[2] * dv[2], 1e-18))
            depth = (sr_ref[gi:gi + 1] + thickness) - dist       # [V,blk]
            if best_d is None:
                best_d, best_v = depth, dv
            else:
                better = depth > best_d
                best_v = [jnp.where(better, dv[c], best_v[c]) for c in range(3)]
                best_d = jnp.maximum(depth, best_d)
        depth_g = jnp.maximum(best_d, 0.0)
        rb = jax.lax.rsqrt(jnp.maximum(
            best_v[0] ** 2 + best_v[1] ** 2 + best_v[2] ** 2, 1e-18))
        X = [X[c] + depth_g * best_v[c] * rb for c in range(3)]
        X[2] = jnp.maximum(X[2], 0.01)                           # floor

        for c in range(3):
            xo_ref[c * V:(c + 1) * V] = X[c]
        f_ref[:] = depth_g * FORCE_PER_DEPTH

    return kernel


@functools.lru_cache(maxsize=8)
def _get_call(V, E, G, iters, stiffness, thickness, block_b, interpret):
    kernel = _build_kernel(V, E, G, iters, stiffness, thickness)

    def call(x2, sa2, sb2, sr2, am, at, rest, scale):
        B = x2.shape[1]
        nb = B // block_b
        blk = lambda r: pl.BlockSpec((r, block_b), lambda i: (0, i))
        # constants ride along unblocked (whole-array VMEM residents, not
        # part of the grid pipeline => no double-buffering of the ~2 MB
        # bf16 incidence matrices)
        cst = pl.BlockSpec(memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[blk(3 * V), blk(3 * G), blk(3 * G), blk(G),
                      cst, cst, cst, cst],
            out_specs=[blk(3 * V), blk(V)],
            out_shape=[jax.ShapeDtypeStruct((3 * V, B), f32),
                       jax.ShapeDtypeStruct((V, B), f32)],
            interpret=interpret,
        )(x2, sa2, sb2, sr2, am, at, rest, scale)

    return call


def substep_b_kernel(
    x: jnp.ndarray,               # f32[V,3,B] (batch-last, as cloth.substep_b)
    v: jnp.ndarray,               # f32[V,3,B]
    dt: float,
    gravity,
    anchor_pos: jnp.ndarray,      # f32[A,3,B]
    seg_a: jnp.ndarray,           # f32[G,3,B]
    seg_b: jnp.ndarray,
    seg_r: jnp.ndarray,           # f32[G,B]
    iters: int = 5,
    damping: float = 0.999,
    stiffness: float = 0.3,
    cloth_thickness: float = 0.012,
    block_b: int = 128,
    interpret=None,
):
    """Drop-in kernel replacement for cloth.substep_b (same signature +
    block/interpret knobs).  Returns (x', v', force [V,B], contact_pos).

    Integration, anchor pinning, and the velocity update run in XLA (they
    fuse into single streaming passes); the Jacobi + collision core runs
    in the fused kernel."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    A_bf, AT_bf, rest_np, scale_np = _matrices_np()
    V, _, B = x.shape
    G = seg_a.shape[0]
    E = A_bf.shape[0]
    g = gown_np()
    anchors = jnp.asarray(g["anchors"])

    # --- integrate + pin anchors (XLA, same ops as cloth.substep_b) ---
    grav = jnp.asarray(gravity, x.dtype)[None, :, None]
    x_prev = x
    v = v * damping + grav * dt
    x_pred = x + v * dt
    x_pred = x_pred.at[anchors].set(anchor_pos)

    to2d = lambda a: jnp.transpose(a, (1, 0, 2)).reshape(3 * a.shape[0], B)
    pad = (-B) % block_b
    args = [to2d(x_pred), to2d(seg_a), to2d(seg_b), seg_r.astype(f32)]
    if pad:
        args = [jnp.pad(a, ((0, 0), (0, pad))) for a in args]

    call = _get_call(V, E, G, int(iters), float(stiffness),
                     float(cloth_thickness), block_b, bool(interpret))
    x2, force = call(*args, jnp.asarray(A_bf), jnp.asarray(AT_bf),
                     jnp.asarray(rest_np), jnp.asarray(scale_np))
    if pad:
        x2, force = x2[:, :B], force[:, :B]
    xo = jnp.transpose(x2.reshape(3, V, B), (1, 0, 2))
    return xo, (xo - x_prev) / dt, force, xo
