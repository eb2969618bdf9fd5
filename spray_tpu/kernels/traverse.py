"""Pallas packet BVH traversal + MXU cluster intersection (SURVEY.md §7.3 #1 —
the speed-of-light kernel the whole design leans on).

Design (TPU-first, cf. kernels/cluster_bvh.py):
  - One grid program owns a PACKET of 512 rays, laid out with RAYS ON THE LANE
    DIMENSION: every per-ray quantity is a (1, 512) row (4 lane-tiles), so a
    slab test step costs 4 VPU instructions — NOT 64, as a (512, 1) column
    layout would (TPU pads the lane dim to 128; columns waste 128x).
  - The packet traverses a shallow 8-wide BVH with ONE shared stack in SMEM —
    scalar control flow, zero per-lane divergence state.  Stack entries are
    pushed far-to-near with their packet-min entry distance; a popped entry
    farther than the packet-max best-t is skipped (packet-ordered traversal).
  - Leaves are 128-tri CLUSTERS intersected on the MXU:
        O' = W^T o_aug : dot_general((4,3C),(4,512)) -> (3C,512)
    tris on sublanes, rays on lanes; elementwise decode on (C,512) blocks and
    a sublane min-reduction select the nearest hit per ray.  131072 ray-tri
    tests per (packet, cluster) pair for ~2.4 MFLOP of MXU work, no gathers.
  - Nearest-hit kernel returns (t, u, v, code) with code = cluster*128 + row;
    global tri ids resolve via one XLA gather outside.  The any-hit kernel
    early-exits once every lane is occluded.

Per-domain cluster sets are sized to fit VMEM (<= ~250K tris / domain), which
the domain decomposition guarantees by construction (SURVEY §7.1).

Runs compiled on TPU; interpret mode elsewhere (tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.pytree import register_intersector_pytree
from ..core.types import Hits
from . import common
from .cluster_bvh import CLUSTER, ClusterBVH, build_cluster_bvh

PACKET = 512  # rays per grid program
MAX_STACK = 192
F32 = jnp.float32
NEG_INF = np.float32(-np.inf)
INF = np.float32(np.inf)


def _slab_all_children(bounds_ref, nid, ox, oy, oz, idx, idy, idz, tlo, thi):
    """All 8 child boxes vs the packet in one broadcast: (8,1) x (1,P) ->
    (8,P) — one vectorized slab test instead of 8 scalar-extracted ones.

    Returns ONE scalar bitmask (bit c = any ray hits child c): a single
    vector->scalar extraction per node instead of eight.
    """
    b = bounds_ref[0, nid]  # (8, 6)
    lox, loy, loz = b[:, 0:1], b[:, 1:2], b[:, 2:3]
    hix, hiy, hiz = b[:, 3:4], b[:, 4:5], b[:, 5:6]
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
    hit = tmin_ <= tmax_  # (8, P)
    anyv = jnp.max(hit.astype(jnp.int32), axis=1, keepdims=True)  # (8, 1)
    weights = (jnp.int32(1) << jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0))
    return jnp.sum(anyv * weights)  # () bitmask


def _cluster_intersect(w_ref, cid, od8, tlo, thi, occl):
    """MXU cluster test, rays-on-lanes.  Returns (t, u, v, ok) each (C, 512).

    od8: (4, 2*PACKET) = [o_aug | d_aug] — ONE fused matmul halves the MXU
    dispatch latency (small-K matmuls are latency-bound).  HIGHEST precision:
    Mosaic supports only DEFAULT (1-pass bf16, too lossy for geometry —
    verified 1.3% wrong-hit rate) and HIGHEST (full f32).
    """
    wmat = w_ref[0, cid]
    dn = (((0,), (0,)), ((), ()))  # contract the 4-dim of both
    odp = jax.lax.dot_general(
        wmat, od8, dn, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (3C, 2*PACKET)
    op = odp[:, 0:PACKET]
    dp = odp[:, PACKET : 2 * PACKET]
    c = CLUSTER
    ou, ov, ow = op[0:c], op[c : 2 * c], op[2 * c : 3 * c]
    du, dv, dw = dp[0:c], dp[c : 2 * c], dp[2 * c : 3 * c]
    dw_ok = jnp.abs(dw) > F32(1e-20)
    t = -ow / jnp.where(dw_ok, dw, F32(1.0))
    u = ou + t * du
    v = ov + t * dv
    if occl:
        tgate = (t > tlo) & (t < thi)
    else:
        tgate = (t >= tlo) & (t < thi)
    ok = dw_ok & tgate & (u >= F32(0)) & (v >= F32(0)) & (u + v <= F32(1))
    return t, u, v, ok


def _ray_rows(rays_ref):
    r = rays_ref[0]  # (6, 2*PACKET): rows [ox|dx],[oy|dy],[oz|dz],[1|0],
    #                                      [tmin|.],[tmax|.]
    od8 = r[0:4]  # (4, 2*PACKET) fused [o_aug | d_aug] for the leaf matmul
    p = PACKET
    ox, oy, oz = r[0:1, 0:p], r[1:2, 0:p], r[2:3, 0:p]
    dx, dy, dz = r[0:1, p:], r[1:2, p:], r[2:3, p:]
    tmin = r[4:5, 0:p]
    tmax = r[5:6, 0:p]
    eps = F32(1e-12)
    idx = F32(1.0) / jnp.where(jnp.abs(dx) > eps, dx, eps)
    idy = F32(1.0) / jnp.where(jnp.abs(dy) > eps, dy, eps)
    idz = F32(1.0) / jnp.where(jnp.abs(dz) > eps, dz, eps)
    return od8, ox, oy, oz, idx, idy, idz, tmin, tmax


def _nearest_kernel(dom_ref, bounds_ref, meta_ref, w_ref, rays_ref,
                    out_t, out_code, out_u, out_v, stack_ref):
    # dom_ref: (NB,) scalar-prefetch bucket->domain map. It drives the
    # BlockSpec index maps (which domain's BVH is DMA'd for this program);
    # the body itself only needs it to skip dead buckets (dom < 0).
    od8, ox, oy, oz, idx, idy, idz, tmin, tmax = _ray_rows(rays_ref)

    # Stack entries are ENCODED: e >= 0 -> internal node id; e < 0 -> leaf
    # cluster id = -(e + 1).  One pop per iteration, single two-way cond
    # (unrolled per-child conds with bool carries miscompile in Mosaic).
    stack_ref[0] = jnp.int32(0)

    def cond(carry):
        return carry[0] > 0

    def body(carry):
        sp, best_t, best_code, best_u, best_v = carry
        sp = sp - 1
        e = stack_ref[sp]

        def internal_case(ops):
            sp, best_t, best_code, best_u, best_v = ops
            nid = e
            window_hi = jnp.minimum(tmax, best_t)
            mask = _slab_all_children(
                bounds_ref, nid, ox, oy, oz, idx, idy, idz, tmin, window_hi
            )
            for c in range(8):
                kind = meta_ref[0, nid, c]
                push = (((mask >> c) & 1) > 0) & (kind != -1)
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
                w_ref, cid, od8, tmin, jnp.minimum(tmax, best_t), occl=False
            )
            tm = jnp.where(ok, t, INF)
            trow = jnp.min(tm, axis=0, keepdims=True)  # (1, PACKET)
            improved = trow < best_t
            row = jax.lax.broadcasted_iota(jnp.int32, tm.shape, 0)
            jsel = jnp.min(
                jnp.where(tm == trow, row, jnp.int32(CLUSTER)),
                axis=0, keepdims=True,
            )
            onehot = row == jsel
            usel = jnp.sum(jnp.where(onehot, u, F32(0)), axis=0, keepdims=True)
            vsel = jnp.sum(jnp.where(onehot, v, F32(0)), axis=0, keepdims=True)
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
        jnp.full((1, PACKET), -1, jnp.int32),
        jnp.zeros((1, PACKET), F32),
        jnp.zeros((1, PACKET), F32),
    )
    _, best_t, best_code, best_u, best_v = jax.lax.while_loop(cond, body, init)
    out_t[0] = best_t
    out_code[0] = best_code
    out_u[0] = best_u
    out_v[0] = best_v


def _anyhit_kernel(dom_ref, bounds_ref, meta_ref, w_ref, rays_ref, out_occ,
                   stack_ref):
    od8, ox, oy, oz, idx, idy, idz, tmin, tmax = _ray_rows(rays_ref)

    stack_ref[0] = jnp.int32(0)

    def cond(carry):
        sp, occ = carry
        return (sp > 0) & (jnp.min(occ) == 0)

    def body(carry):
        sp, occ = carry  # occ: (1, PACKET) int32
        sp = sp - 1
        e = stack_ref[sp]

        def internal_case(ops):
            sp, occ = ops
            nid = e
            window_hi = jnp.where(occ != 0, F32(0.0), tmax)
            mask = _slab_all_children(
                bounds_ref, nid, ox, oy, oz, idx, idy, idz, tmin, window_hi
            )
            for c in range(8):
                kind = meta_ref[0, nid, c]
                push = (((mask >> c) & 1) > 0) & (kind != -1)
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
                w_ref, cid, od8, tmin,
                jnp.where(occ != 0, F32(0.0), tmax), occl=True
            )
            return (
                sp, occ | jnp.any(ok, axis=0, keepdims=True).astype(jnp.int32)
            )

        return jax.lax.cond(e >= 0, internal_case, leaf_case, (sp, occ))

    init = (jnp.int32(1), jnp.zeros((1, PACKET), jnp.int32))
    _, occ = jax.lax.while_loop(cond, body, init)
    out_occ[0] = occ


def _rays_to_aug(o, d, tmin, tmax):
    """(N,...) rays -> (P, 6, 2*PACKET) blocks + count.

    Rows: [ox|dx], [oy|dy], [oz|dz], [1|0], [tmin|0], [tmax|0] — the first
    four rows ARE the fused (4, 2*PACKET) matmul operand; the traversal reads
    per-ray quantities as PACKET-aligned lane slices.  Rays on lanes
    throughout (see module docstring).
    """
    n = o.shape[0]
    npad = common.round_up(max(n, PACKET), PACKET)
    o = common.pad_to(o, npad)
    d = common.pad_to(d, npad, value=1.0)
    tmin = common.pad_to(tmin, npad, value=1.0)
    tmax = common.pad_to(tmax, npad, value=0.0)  # empty window: never hits
    p_ = npad // PACKET
    ob = o.reshape(p_, PACKET, 3).transpose(0, 2, 1)  # (P, 3, PACKET)
    db = d.reshape(p_, PACKET, 3).transpose(0, 2, 1)
    tminb = tmin.reshape(p_, 1, PACKET)
    tmaxb = tmax.reshape(p_, 1, PACKET)
    ones = jnp.ones((p_, 1, PACKET), F32)
    zeros = jnp.zeros((p_, 1, PACKET), F32)
    left = jnp.concatenate([ob, ones, tminb, tmaxb], axis=1)  # (P, 6, PACKET)
    right = jnp.concatenate([db, zeros, zeros, zeros], axis=1)
    aug = jnp.concatenate([left, right], axis=2)  # (P, 6, 2*PACKET)
    return aug, n


def _flat(x, n):
    return x.reshape(-1)[:n]


def _domain_specs(bounds, meta, w):
    """BlockSpecs that DMA ONE domain's BVH per grid step, selected by the
    scalar-prefetched bucket->domain map (MoE-router style).  Consecutive
    buckets with the same domain re-use the resident block (no re-DMA), so a
    domain is uploaded once per contiguous run."""
    dsel = lambda b, dom_ref: jnp.maximum(dom_ref[b], 0)  # -1 = dead bucket
    return [
        pl.BlockSpec(
            (1,) + bounds.shape[1:],
            lambda b, dref: (dsel(b, dref), 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1,) + meta.shape[1:],
            lambda b, dref: (dsel(b, dref), 0, 0),
            memory_space=pltpu.SMEM,  # meta: scalar reads
        ),
        pl.BlockSpec(
            (1,) + w.shape[1:],
            lambda b, dref: (dsel(b, dref), 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 6, 2 * PACKET), lambda b, dref: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _nearest_call(bucket_dom, bounds, meta, w, rays_aug, interpret):
    """bounds (D,Nn,8,6), meta (D,Nn,8), w (D,Nc,4,3C), bucket_dom (P,) i32:
    packet i traverses domain bucket_dom[i] (D=1 single-domain: zeros)."""
    p = rays_aug.shape[0]
    out_spec = pl.BlockSpec(
        (1, 1, PACKET), lambda b, dref: (b, 0, 0), memory_space=pltpu.VMEM
    )
    oshape = jax.ShapeDtypeStruct((p, 1, PACKET), jnp.float32)
    oishape = jax.ShapeDtypeStruct((p, 1, PACKET), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(p,),
        in_specs=_domain_specs(bounds, meta, w),
        out_specs=[out_spec] * 4,
        scratch_shapes=[pltpu.SMEM((MAX_STACK,), jnp.int32)],
    )
    return pl.pallas_call(
        _nearest_kernel,
        grid_spec=grid_spec,
        out_shape=[oshape, oishape, oshape, oshape],
        interpret=interpret,
    )(bucket_dom, bounds, meta, w, rays_aug)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _anyhit_call(bucket_dom, bounds, meta, w, rays_aug, interpret):
    p = rays_aug.shape[0]
    out_spec = pl.BlockSpec(
        (1, 1, PACKET), lambda b, dref: (b, 0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(p,),
        in_specs=_domain_specs(bounds, meta, w),
        out_specs=out_spec,
        scratch_shapes=[pltpu.SMEM((MAX_STACK,), jnp.int32)],
    )
    return pl.pallas_call(
        _anyhit_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((p, 1, PACKET), jnp.int32),
        interpret=interpret,
    )(bucket_dom, bounds, meta, w, rays_aug)


@register_intersector_pytree(
    leaves=("bounds", "meta", "w", "tri_ids"),
    aux=("nn", "nc", "interpret"),
    drop=("host",),
)
class ClusterBVHIntersector:
    """Drop-in intersector over the Pallas packet kernels (one domain).

    Registered as a pytree: pass it THROUGH jit boundaries as an argument —
    closing over it turns the BVH into per-execution-streamed HLO constants
    (see core/pytree.py)."""

    def __init__(self, scene=None, cbvh: ClusterBVH = None, interpret=None):
        if cbvh is None:
            cbvh = build_cluster_bvh(
                np.asarray(scene.vertices), np.asarray(scene.faces)
            )
        self.host = cbvh
        self.bounds = jnp.asarray(cbvh.bounds)[None]
        self.meta = jnp.asarray(cbvh.meta)[None]
        self.w = jnp.asarray(cbvh.w)[None]
        self.tri_ids = jnp.asarray(cbvh.tri_ids.reshape(-1))
        self.nn = cbvh.num_nodes
        self.nc = cbvh.num_clusters
        self.interpret = common.use_interpret() if interpret is None else interpret

    def intersect(self, o, d, tmin, tmax):
        rays_aug, n = _rays_to_aug(o, d, tmin, tmax)
        bucket_dom = jnp.zeros(rays_aug.shape[0], jnp.int32)
        t, code, u, v = _nearest_call(
            bucket_dom, self.bounds, self.meta, self.w, rays_aug,
            self.interpret,
        )
        t, code, u, v = _flat(t, n), _flat(code, n), _flat(u, n), _flat(v, n)
        prim = jnp.where(code >= 0, self.tri_ids[jnp.maximum(code, 0)], -1)
        valid = prim >= 0
        return Hits(
            t=jnp.where(valid, t, tmax), prim=prim.astype(jnp.int32),
            u=u, v=v, valid=valid,
        )

    def occluded(self, o, d, tmax):
        tmin = jnp.zeros_like(tmax)
        rays_aug, n = _rays_to_aug(o, d, tmin, tmax)
        bucket_dom = jnp.zeros(rays_aug.shape[0], jnp.int32)
        occ = _anyhit_call(
            bucket_dom, self.bounds, self.meta, self.w, rays_aug,
            self.interpret,
        )
        return _flat(occ, n) != 0
