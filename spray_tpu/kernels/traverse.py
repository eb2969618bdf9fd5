"""Pallas packet BVH traversal + MXU cluster intersection (SURVEY.md §7.3 #1 —
the speed-of-light kernel the whole design leans on).

Design (TPU-first, cf. kernels/cluster_bvh.py):
  - One grid program owns a PACKET of 1024 rays.
  - The packet traverses a shallow 8-wide BVH with ONE shared stack in SMEM —
    scalar control flow, zero per-lane divergence state.  A node's 8 child
    boxes are slab-tested against all 1024 rays on the VPU (scalars broadcast
    from the node arrays); a child is entered if ANY ray hits it, with the
    per-ray [tmin, min(tmax, best_t)) window doing the front-to-back culling.
  - Leaves are 128-tri CLUSTERS intersected on the MXU: two (1024,4)@(4,384)
    matmuls (precomputed Woop transforms) + elementwise decode produce all
    131072 ray-tri tests of the packet x cluster pair; a lane-reduction
    min-selects the nearest hit per ray.
  - Nearest-hit kernel returns (t, u, v, code) with code = cluster*128 + lane;
    global tri ids are resolved by a cheap XLA gather outside.  The any-hit
    (occlusion) kernel early-exits once every lane is occluded.

Per-domain cluster sets are sized to fit VMEM (<= ~250K tris / domain), which
the domain decomposition guarantees by construction; larger domains belong to
the residency layer anyway (SURVEY §7.1).

Runs compiled on TPU; interpret mode elsewhere (tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import Hits
from . import common
from .cluster_bvh import CLUSTER, ClusterBVH, build_cluster_bvh

PACKET = 512  # rays per grid program (sized so per-packet VMEM temps fit)
MAX_STACK = 192
F32 = jnp.float32
NEG_INF = np.float32(-np.inf)
INF = np.float32(np.inf)


def _slab_vs_packet(bounds_ref, nid, c, ox, oy, oz, idx, idy, idz, tlo, thi):
    """Scalar child box vs (1024,1) ray columns.  Returns (hit_mask, any)."""
    lox = bounds_ref[nid, c]
    loy = bounds_ref[nid, 8 + c]
    loz = bounds_ref[nid, 16 + c]
    hix = bounds_ref[nid, 24 + c]
    hiy = bounds_ref[nid, 32 + c]
    hiz = bounds_ref[nid, 40 + c]
    t0x = (lox - ox) * idx
    t1x = (hix - ox) * idx
    t0y = (loy - oy) * idy
    t1y = (hiy - oy) * idy
    t0z = (loz - oz) * idz
    t1z = (hiz - oz) * idz
    tmin_ = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.maximum(jnp.minimum(t0z, t1z), tlo),
    )
    tmax_ = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.minimum(jnp.maximum(t0z, t1z), thi),
    )
    hit = tmin_ <= tmax_
    return hit, jnp.any(hit)


def _cluster_intersect(w_ref, cid, o_aug, d_aug, tlo, thi, occl):
    """MXU cluster test.  Returns (t_all, u_all, v_all, ok) each (1024, C)."""
    wmat = w_ref[cid]  # (4, 3C)
    op = jnp.dot(o_aug, wmat, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    dp = jnp.dot(d_aug, wmat, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    c = CLUSTER
    ou, ov, ow = op[:, 0:c], op[:, c : 2 * c], op[:, 2 * c : 3 * c]
    du, dv, dw = dp[:, 0:c], dp[:, c : 2 * c], dp[:, 2 * c : 3 * c]
    dw_ok = jnp.abs(dw) > F32(1e-20)
    t = -ow / jnp.where(dw_ok, dw, F32(1.0))
    u = ou + t * du
    v = ov + t * dv
    if occl:
        tgate = (t > tlo) & (t < thi)
    else:
        tgate = (t >= tlo) & (t < thi)
    ok = (
        dw_ok & tgate
        & (u >= F32(0)) & (v >= F32(0)) & (u + v <= F32(1))
    )
    return t, u, v, ok


def _nearest_kernel(bounds_ref, meta_ref, w_ref, rays_ref,
                    out_t, out_code, out_u, out_v, stack_ref):
    r = rays_ref[0]  # (PACKET, 16)
    o_aug = r[:, 0:4]
    d_aug = r[:, 4:8]
    ox, oy, oz = r[:, 0:1], r[:, 1:2], r[:, 2:3]
    dx, dy, dz = r[:, 4:5], r[:, 5:6], r[:, 6:7]
    tmin = r[:, 8:9]
    tmax = r[:, 9:10]
    eps = F32(1e-12)
    idx = F32(1.0) / jnp.where(jnp.abs(dx) > eps, dx, eps)
    idy = F32(1.0) / jnp.where(jnp.abs(dy) > eps, dy, eps)
    idz = F32(1.0) / jnp.where(jnp.abs(dz) > eps, dz, eps)

    # Stack entries are ENCODED: e >= 0 -> internal node id; e < 0 -> leaf
    # cluster id = -(e + 1).  (meta leaf value -(cid+2) maps to entry via +1.)
    # One pop per iteration with a single two-way cond keeps Mosaic happy:
    # carrying per-child bool vectors through unrolled scf.ifs miscompiles.
    stack_ref[0] = jnp.int32(0)

    def cond(carry):
        sp = carry[0]
        return sp > 0

    def body(carry):
        sp, best_t, best_code, best_u, best_v = carry
        sp = sp - 1
        e = stack_ref[sp]

        def internal_case(ops):
            sp, best_t, best_code, best_u, best_v = ops
            nid = e
            window_hi = jnp.minimum(tmax, best_t)
            for c in range(8):
                kind = meta_ref[nid, c]
                _, anyhit = _slab_vs_packet(
                    bounds_ref, nid, c, ox, oy, oz, idx, idy, idz,
                    tmin, window_hi,
                )
                push = anyhit & (kind != -1)
                entry = jnp.where(kind >= 0, kind, kind + 1)
                @pl.when(push)
                def _():
                    stack_ref[sp] = entry
                sp = sp + push.astype(jnp.int32)
            return (sp, best_t, best_code, best_u, best_v)

        def leaf_case(ops):
            sp, best_t, best_code, best_u, best_v = ops
            cid = -(e + 1)
            t, u, v, ok = _cluster_intersect(
                w_ref, cid, o_aug, d_aug, tmin,
                jnp.minimum(tmax, best_t), occl=False
            )
            tm = jnp.where(ok, t, INF)
            trow = jnp.min(tm, axis=1, keepdims=True)  # (PACKET, 1)
            improved = trow < best_t
            lane = jax.lax.broadcasted_iota(jnp.int32, tm.shape, 1)
            jsel = jnp.min(
                jnp.where(tm == trow, lane, jnp.int32(CLUSTER)),
                axis=1, keepdims=True,
            )
            onehot = lane == jsel
            usel = jnp.sum(jnp.where(onehot, u, F32(0)), axis=1, keepdims=True)
            vsel = jnp.sum(jnp.where(onehot, v, F32(0)), axis=1, keepdims=True)
            code = cid * CLUSTER + jsel
            return (
                sp,
                jnp.where(improved, trow, best_t),
                jnp.where(improved, code, best_code),
                jnp.where(improved, usel, best_u),
                jnp.where(improved, vsel, best_v),
            )

        return jax.lax.cond(
            e >= 0, internal_case, leaf_case,
            (sp, best_t, best_code, best_u, best_v),
        )

    init = (
        jnp.int32(1),
        tmax,
        jnp.full((PACKET, 1), -1, jnp.int32),
        jnp.zeros((PACKET, 1), F32),
        jnp.zeros((PACKET, 1), F32),
    )
    _, best_t, best_code, best_u, best_v = jax.lax.while_loop(cond, body, init)
    sub = PACKET // common.LANES
    out_t[0] = best_t.reshape(sub, common.LANES)
    out_code[0] = best_code.reshape(sub, common.LANES)
    out_u[0] = best_u.reshape(sub, common.LANES)
    out_v[0] = best_v.reshape(sub, common.LANES)


def _anyhit_kernel(bounds_ref, meta_ref, w_ref, rays_ref, out_occ, stack_ref):
    r = rays_ref[0]
    o_aug = r[:, 0:4]
    d_aug = r[:, 4:8]
    ox, oy, oz = r[:, 0:1], r[:, 1:2], r[:, 2:3]
    dx, dy, dz = r[:, 4:5], r[:, 5:6], r[:, 6:7]
    tmin = r[:, 8:9]
    tmax = r[:, 9:10]
    eps = F32(1e-12)
    idx = F32(1.0) / jnp.where(jnp.abs(dx) > eps, dx, eps)
    idy = F32(1.0) / jnp.where(jnp.abs(dy) > eps, dy, eps)
    idz = F32(1.0) / jnp.where(jnp.abs(dz) > eps, dz, eps)

    stack_ref[0] = jnp.int32(0)

    def cond(carry):
        sp, occ = carry
        return (sp > 0) & (jnp.min(occ) == 0)

    def body(carry):
        sp, occ = carry  # occ: (PACKET, 1) int32 (bool carries miscompile)
        sp = sp - 1
        e = stack_ref[sp]

        def internal_case(ops):
            sp, occ = ops
            nid = e
            window_hi = jnp.where(occ != 0, F32(0.0), tmax)
            for c in range(8):
                kind = meta_ref[nid, c]
                _, anyhit = _slab_vs_packet(
                    bounds_ref, nid, c, ox, oy, oz, idx, idy, idz,
                    tmin, window_hi,
                )
                push = anyhit & (kind != -1)
                entry = jnp.where(kind >= 0, kind, kind + 1)
                @pl.when(push)
                def _():
                    stack_ref[sp] = entry
                sp = sp + push.astype(jnp.int32)
            return (sp, occ)

        def leaf_case(ops):
            sp, occ = ops
            cid = -(e + 1)
            _, _, _, ok = _cluster_intersect(
                w_ref, cid, o_aug, d_aug, tmin,
                jnp.where(occ != 0, F32(0.0), tmax), occl=True
            )
            return (sp, occ | jnp.any(ok, axis=1, keepdims=True).astype(jnp.int32))

        return jax.lax.cond(e >= 0, internal_case, leaf_case, (sp, occ))

    init = (jnp.int32(1), jnp.zeros((PACKET, 1), jnp.int32))
    _, occ = jax.lax.while_loop(cond, body, init)
    out_occ[0] = occ.reshape(PACKET // common.LANES, common.LANES)


def _rays_to_aug(o, d, tmin, tmax):
    """(N,...) rays -> (P, PACKET, 16) aug blocks + original count."""
    n = o.shape[0]
    npad = common.round_up(max(n, PACKET), PACKET)
    o = common.pad_to(o, npad)
    d = common.pad_to(d, npad, value=1.0)
    tmin = common.pad_to(tmin, npad, value=1.0)
    tmax = common.pad_to(tmax, npad, value=0.0)  # empty window: never hits
    ones = jnp.ones((npad, 1), F32)
    zeros = jnp.zeros((npad, 6), F32)
    aug = jnp.concatenate(
        [o, ones, d, jnp.zeros((npad, 1), F32), tmin[:, None], tmax[:, None],
         zeros],
        axis=1,
    )
    return aug.reshape(npad // PACKET, PACKET, 16), n


@functools.partial(jax.jit, static_argnames=("nn", "nc", "interpret"))
def _nearest_call(bounds, meta, w, rays_aug, nn, nc, interpret):
    p = rays_aug.shape[0]
    share = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    ray_spec = pl.BlockSpec(
        (1, PACKET, 16), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    sub = PACKET // common.LANES
    out_spec = pl.BlockSpec(
        (1, sub, common.LANES), lambda i: (i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    oshape = jax.ShapeDtypeStruct((p, sub, common.LANES), jnp.float32)
    oishape = jax.ShapeDtypeStruct((p, sub, common.LANES), jnp.int32)
    return pl.pallas_call(
        _nearest_kernel,
        grid=(p,),
        in_specs=[
            share(bounds.shape), share(meta.shape), share(w.shape), ray_spec,
        ],
        out_specs=[out_spec] * 4,
        out_shape=[oshape, oishape, oshape, oshape],
        scratch_shapes=[pltpu.SMEM((MAX_STACK,), jnp.int32)],
        interpret=interpret,
    )(bounds, meta, w, rays_aug)


@functools.partial(jax.jit, static_argnames=("nn", "nc", "interpret"))
def _anyhit_call(bounds, meta, w, rays_aug, nn, nc, interpret):
    p = rays_aug.shape[0]
    share = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    ray_spec = pl.BlockSpec(
        (1, PACKET, 16), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    sub = PACKET // common.LANES
    out_spec = pl.BlockSpec(
        (1, sub, common.LANES), lambda i: (i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        _anyhit_kernel,
        grid=(p,),
        in_specs=[
            share(bounds.shape), share(meta.shape), share(w.shape), ray_spec,
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(
            (p, sub, common.LANES), jnp.int32
        ),
        scratch_shapes=[pltpu.SMEM((MAX_STACK,), jnp.int32)],
        interpret=interpret,
    )(bounds, meta, w, rays_aug)


class ClusterBVHIntersector:
    """Drop-in intersector over the Pallas packet kernels (one domain)."""

    def __init__(self, scene=None, cbvh: ClusterBVH = None, interpret=None):
        if cbvh is None:
            cbvh = build_cluster_bvh(
                np.asarray(scene.vertices), np.asarray(scene.faces)
            )
        self.host = cbvh
        self.bounds = jnp.asarray(cbvh.bounds)
        self.meta = jnp.asarray(cbvh.meta)
        self.w = jnp.asarray(cbvh.w)
        self.tri_ids = jnp.asarray(cbvh.tri_ids.reshape(-1))
        self.nn = cbvh.num_nodes
        self.nc = cbvh.num_clusters
        self.interpret = common.use_interpret() if interpret is None else interpret

    def intersect(self, o, d, tmin, tmax):
        rays_aug, n = _rays_to_aug(o, d, tmin, tmax)
        t, code, u, v = _nearest_call(
            self.bounds, self.meta, self.w, rays_aug,
            self.nn, self.nc, self.interpret,
        )
        flat = lambda x: common.tiles_to_flat(x, n)
        t, code, u, v = flat(t), flat(code), flat(u), flat(v)
        prim = jnp.where(code >= 0, self.tri_ids[jnp.maximum(code, 0)], -1)
        valid = prim >= 0
        return Hits(
            t=jnp.where(valid, t, tmax), prim=prim.astype(jnp.int32),
            u=u, v=v, valid=valid,
        )

    def occluded(self, o, d, tmax):
        tmin = jnp.zeros_like(tmax)
        rays_aug, n = _rays_to_aug(o, d, tmin, tmax)
        occ = _anyhit_call(
            self.bounds, self.meta, self.w, rays_aug,
            self.nn, self.nc, self.interpret,
        )
        return common.tiles_to_flat(occ, n) != 0
