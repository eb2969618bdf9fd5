"""Pallas packet BVH traversal + MXU cluster intersection (SURVEY.md §7.3 #1 —
the speed-of-light kernel the whole design leans on).

Design (TPU-first, cf. kernels/cluster_bvh.py):
  - One grid program owns a PACKET of 512 rays, laid out with RAYS ON THE LANE
    DIMENSION: every per-ray quantity is a (1, 512) row (4 lane-tiles), so a
    slab test step costs 4 VPU instructions — NOT 64, as a (512, 1) column
    layout would (TPU pads the lane dim to 128; columns waste 128x).
  - The packet traverses a shallow 8-wide BVH with ONE shared BITMASK stack in
    SMEM: an entry is (node_id << 8) | pending-children byte.  Each iteration
    peels ONE child (count-trailing-zeros via a 256-entry SMEM table) — the
    scalar work per node is one slab test + one push, instead of eight
    sequential masked pushes.  Scalar-unit latency is the traversal's serial
    bottleneck, so entries are touched O(children hit), not O(8).
  - Leaves are 128-tri CLUSTERS intersected on the MXU:
        O' = W^T o_aug : dot_general((4,3C),(4,512)) -> (3C,512)
    tris on sublanes, rays on lanes; elementwise decode on (C,512) blocks and
    a sublane min-reduction select the nearest hit per ray.  The kernel
    returns ONLY (t, code); barycentrics are recomputed OUTSIDE against the
    committed triangle (one Möller–Trumbore on the winner — also exactly what
    the differentiable path does, SURVEY.md §3.5), saving the one-hot u/v
    selection ops on every leaf visit.
  - The any-hit kernel early-exits once every lane is occluded.

Scalar-prefetch domain routing: a bucket->domain map (MoE-router style) picks
WHICH domain's BVH pages are DMA'd for each ray packet, so one kernel serves
the single-domain, dense-speculative and routed multi-domain paths
(SURVEY.md §2 R6: speculative trace against resident domains).

Runs compiled on TPU; interpret mode elsewhere (tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import geom
from ..core.pytree import register_intersector_pytree
from ..core.types import Hits
from . import common
from .cluster_bvh import CLUSTER, ClusterBVH, build_cluster_bvh

PACKET = 512  # default rays per grid program (lane dim; multiple of 128).
# Narrower packets trade fixed per-visit cost for less union-frustum waste on
# incoherent (bounce/NEE) wavefronts — the kernels below derive the width from
# the ray-block shape, so any multiple of 128 works per call site.
MAX_STACK = 192
F32 = jnp.float32
NEG_INF = np.float32(-np.inf)
INF = np.float32(np.inf)


def _slab_all_children(bounds_ref, nid, valid_byte, ox, oy, oz, idx, idy,
                       idz, tlo, thi):
    """All 8 child boxes vs the packet in one broadcast: (8,1) x (1,P) ->
    (8,P), then an ORDERED push word in ONE vector->scalar extraction.

    Children are ranked by packet entry distance (min over hit lanes) so the
    traversal visits them front-to-back: the nearest leaf collapses best-t
    early and the per-lane best-t window then prunes the far siblings at
    their own slab tests (the in-kernel analog of the reference's
    front-to-back domain walk, SURVEY.md §3.3).  Returns a packed word
        (count << 24) | perm     perm = child indices, 3 bits each,
                                 visit order from the LSB
    count==0 means no child hit.  One jnp.sum -> scalar sync per node, the
    same cost as the old unordered bitmask.
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
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    # child validity (padded domains have ZERO bounds that rays can hit)
    vbit = (jax.lax.shift_right_logical(valid_byte, iota8) & 1) != 0
    entry = jnp.min(jnp.where(hit, tmin_, INF), axis=1, keepdims=True)
    live = vbit & jnp.isfinite(entry)  # (8, 1)
    # rank among live children by (entry, index); dead entries are +inf and
    # never precede live ones
    e_masked = jnp.where(live, entry, INF)
    e_row = e_masked.reshape(1, 8)
    i_row = iota8.reshape(1, 8)
    precedes = (e_row < e_masked) | ((e_row == e_masked) & (i_row < iota8))
    # int32 mask arithmetic: a bool select here lowers to an i8->i1 trunc
    # Mosaic rejects ('Unsupported target bitwidth for truncation')
    rank = jnp.sum(
        precedes.astype(jnp.int32) * live.reshape(1, 8).astype(jnp.int32),
        axis=1, keepdims=True,
    )  # (8, 1)
    word = jnp.where(
        live,
        jax.lax.shift_left(iota8, 3 * rank) + jnp.int32(1 << 24),
        0,
    )
    return jnp.sum(word)  # () = (count << 24) | perm


def _bf16_exact(x):
    """Round x toward zero to a bf16-EXACT f32 value (mantissa masked to 8
    bits).  Pure int bit ops: Mosaic rejects f32->bf16 truncf on 4-sublane
    tiles ('Unsupported target bitwidth for truncation'), and we don't need
    the dtype — only values the MXU's implicit DEFAULT-precision bf16
    conversion preserves losslessly."""
    i = jax.lax.bitcast_convert_type(x, jnp.int32)
    return jax.lax.bitcast_convert_type(
        i & jnp.int32(-65536), jnp.float32  # 0xFFFF0000
    )


def _split3(x):
    """3-way bf16-exact split: x ≈ h + m + l captures ~24 mantissa bits.
    All three parts are f32 arrays whose values fit bf16 exactly."""
    h = _bf16_exact(x)
    r = x - h
    m = _bf16_exact(r)
    l = _bf16_exact(r - m)
    return h, m, l


def _stack_w32(w):
    """(4, 3C) f32 -> (32, 3C) f32 (bf16-exact values): split-term K-stack."""
    h, m, l = _split3(w)
    return jnp.concatenate([h, h, m, h, l, m, m, l], axis=0)


@jax.jit
def stack_w_pages(w):
    """Pre-stacked bf16 cluster pages: (..., 4, 3C) f32 -> (..., 32, 3C) bf16.

    r5 (VERDICT r4 next#1): the r4 leaf-visit ladder showed the per-visit
    `_stack_w32` split assembly dominating even the matmul-only floor (358 of
    490 ns/visit @256 lanes) — the K=32 operand was rebuilt from the compact
    (4, 3C) f32 page on EVERY leaf visit.  Storing the K-stack itself, as
    actual bf16 (every split term is bf16-exact, so the f32->bf16 conversion
    is lossless), makes the per-visit operand prep ZERO vector ops: the
    kernel feeds the page straight to the MXU.  Cost: 4x the page bytes
    (64 B vs 16 B per matrix column) in HBM/VMEM only — host pages stay
    compact f32 and are stacked ON DEVICE once per build/slot-load, so
    host->HBM streaming traffic (the OOC bottleneck) is unchanged.
    """
    h, m, l = _split3(w)
    out = jnp.concatenate([h, h, m, h, l, m, m, l], axis=-2)
    return out.astype(jnp.bfloat16)


def _stack_od32(od):
    """(4, N) f32 -> (32, N) f32, paired with _stack_w32's term order."""
    h, m, l = _split3(od)
    return jnp.concatenate([h, m, h, l, h, m, l, m], axis=0)


INF_KEY = np.int32(0x7F800000)  # +inf bitpattern: beats every finite key


def _cluster_intersect(w_ref, cid, od32, tlo, thi, occl, row=None):
    """MXU cluster test, rays-on-lanes.  Returns the raw ok mask (occlusion)
    or, for nearest, a PACKED KEY (C, P) int32:

        key = (t_bits & ~127) | tri_row        (INF_KEY on miss)

    For t >= 0 the f32 bitpattern is order-preserving as int32, so ONE
    sublane min-reduce yields the nearest t AND its row — the r3 decode's
    second eq/select/min argmin pass is gone (r4; ~15% of the leaf visit).
    t is quantized UP to 128 ulp (~1.5e-5 relative) when reconstructed;
    exact hit attributes are recomputed outside against the committed
    triangle (attrs_for_prims), so only tie-breaks within 128 ulp can pick
    a different — equally valid — prim.

    od32: (32, 2*PACKET) f32 (bf16-exact) = K-STACKED split of
    [o_aug | d_aug].  The f32
    Woop product W^T OD needs more than bf16 (1-pass DEFAULT: measured 1.3%
    wrong hits) but HIGHEST costs 6 sequential MXU passes, each materializing
    the (3C, 2P) f32 intermediate — measured 3.4us/cluster, the single
    hottest cost in the whole tracer.  Instead both operands are 3-way bf16
    split (h+m+l ≈ 24 mantissa bits) and the 8 significant cross terms
    (hh,hm,mh,hl,lh,mm,ml,lm) are laid out ALONG K: one K=32 DEFAULT pass
    (whose implicit f32->bf16 operand conversion is LOSSLESS on these
    values) with f32 accumulate = one intermediate write.  Measured
    984ns/cluster; error vs HIGHEST is ~1e-7 relative to OPERAND scale
    (the dropped ll cross term makes the result-relative bound
    data-dependent under cancellation, up to ~4e-6 element-wise), which
    keeps hit decisions at f32-eps fidelity — profiling/r3_split_mm.py
    and the on-TPU parity gate (zero mismatches).
    """
    packet = od32.shape[1] // 2
    if w_ref.shape[2] == 32:
        # pre-stacked bf16 page (stack_w_pages): zero per-visit operand prep
        wmat = w_ref[0, cid]
    else:
        wmat = _stack_w32(w_ref[0, cid])
    c = wmat.shape[1] // 3
    dn = (((0,), (0,)), ((), ()))  # contract the K-dim of both
    odp = jax.lax.dot_general(
        wmat, od32, dn, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )  # (3C, 2*packet)
    op = odp[:, 0:packet]
    dp = odp[:, packet : 2 * packet]
    ou, ov, ow = op[0:c], op[c : 2 * c], op[2 * c : 3 * c]
    du, dv, dw = dp[0:c], dp[c : 2 * c], dp[2 * c : 3 * c]
    dw_ok = jnp.abs(dw) > F32(1e-20)
    dws = jnp.where(dw_ok, dw, F32(1.0))
    # t = -ow/dw via approx reciprocal + ONE Newton step (~1-2 ulp): the f32
    # divide lowers to a longer Newton chain; measured -19%/visit (r4,
    # profiling/r4_leaf_variants.py keyed_recip).  The ~ulp-level t error is
    # far inside the keyed decode's own 128-ulp quantization and the
    # outside-the-kernel exact attribute recompute; the on-TPU parity gate
    # stays at zero mismatches.
    r0 = pl.reciprocal(dws, approx=True)
    t = -ow * (r0 * (F32(2.0) - dws * r0))
    u = ou + t * du
    v = ov + t * dv
    if occl:
        tgate = (t > tlo) & (t < thi)
    else:
        tgate = (t >= tlo) & (t < thi)
    ok = dw_ok & tgate & (u >= F32(0)) & (v >= F32(0)) & (u + v <= F32(1))
    if occl:
        return ok
    # -0.0 would bitcast to INT_MIN and shadow every real hit; tgate admits
    # t == -0.0 (>= 0 is true), so normalize before packing
    tb = jax.lax.bitcast_convert_type(jnp.maximum(t, F32(0.0)), jnp.int32)
    key = (tb & jnp.int32(-128)) | row
    return jnp.where(ok, key, INF_KEY)


def _ray_rows(rays_ref):
    r = rays_ref[0]  # (6, 2*packet): rows [ox|dx],[oy|dy],[oz|dz],[1|0],
    #                                      [tmin|.],[tmax|.]
    # K-stacked bf16 split of [o_aug | d_aug], built ONCE per packet program
    # and reused by every leaf visit (see _cluster_intersect)
    od8 = _stack_od32(r[0:4])  # (32, 2*packet) f32 (bf16-exact values)
    p = r.shape[1] // 2
    ox, oy, oz = r[0:1, 0:p], r[1:2, 0:p], r[2:3, 0:p]
    dx, dy, dz = r[0:1, p:], r[1:2, p:], r[2:3, p:]
    tmin = r[4:5, 0:p]
    tmax = r[5:6, 0:p]
    eps = F32(1e-12)
    idx = F32(1.0) / jnp.where(jnp.abs(dx) > eps, dx, eps)
    idy = F32(1.0) / jnp.where(jnp.abs(dy) > eps, dy, eps)
    idz = F32(1.0) / jnp.where(jnp.abs(dz) > eps, dz, eps)
    return od8, ox, oy, oz, idx, idy, idz, tmin, tmax


def _pop_child(nid_ref, pc_ref, sp):
    """Peel the NEAREST pending child off the top ordered-stack entry.

    Entries are (nid, (count << 24) | perm) pairs; perm holds the child
    indices 3 bits each in front-to-back visit order from the LSB.
    Returns (sp', nid, c): sp' already reflects whether the entry emptied.
    """
    pc = pc_ref[sp - 1]
    nid = nid_ref[sp - 1]
    c = pc & 7
    cnt = jax.lax.shift_right_logical(pc, 24)
    rest = jax.lax.shift_right_logical(pc & jnp.int32(0x00FFFFFF), 3)
    pc_ref[sp - 1] = rest | jax.lax.shift_left(cnt - 1, 24)
    sp = sp - (cnt == 1).astype(jnp.int32)
    return sp, nid, c


def _nearest_kernel(dom_ref, perm_ref, bounds_ref, meta_ref, valid_ref,
                    w_ref, rays_ref, out_t, out_code, nid_ref, pc_ref):
    # dom_ref: (NB,) scalar-prefetch GRID-ORDER domain map driving the
    # BlockSpec index maps (which domain's BVH is DMA'd for this program);
    # perm_ref: grid step -> packet index (see _domain_specs).  A NEGATIVE
    # entry marks the whole packet DEAD: the r4 frame split showed incoherent
    # wavefronts (81K live of 1M lanes) burning >1s per call on the 21-round
    # x thousands-of-dead-packets grid-step prologue (ray unpacking, split
    # stacking, root slab) — dead programs now skip everything.
    # meta_ref: (1, 1, Nn*8) flat; valid_ref: (1, 1, Nn) — see _domain_specs.
    packet = rays_ref.shape[2] // 2
    live = dom_ref[pl.program_id(0)] >= 0

    @pl.when(jnp.logical_not(live))
    def _():
        out_t[0] = jnp.zeros((1, packet), jnp.float32)
        out_code[0] = jnp.full((1, packet), -1, jnp.int32)

    @pl.when(live)
    def _():
        _nearest_body(bounds_ref, meta_ref, valid_ref, w_ref, rays_ref,
                      out_t, out_code, nid_ref, pc_ref)


def _nearest_body(bounds_ref, meta_ref, valid_ref, w_ref, rays_ref, out_t,
                  out_code, nid_ref, pc_ref):
    od8, ox, oy, oz, idx, idy, idz, tmin, tmax = _ray_rows(rays_ref)
    if w_ref.shape[2] == 32:  # pre-stacked bf16 pages: bf16 ray operand too
        od8 = od8.astype(jnp.bfloat16)  # lossless: values are bf16-exact
    packet = rays_ref.shape[2] // 2
    c_sz = w_ref.shape[3] // 3  # tris per cluster (from the page shape)
    row = jax.lax.broadcasted_iota(jnp.int32, (c_sz, packet), 0)

    w0 = _slab_all_children(
        bounds_ref, 0, valid_ref[0, 0, 0], ox, oy, oz, idx, idy, idz,
        tmin, tmax,
    )
    nid_ref[0] = 0
    pc_ref[0] = w0
    sp0 = (w0 != 0).astype(jnp.int32)

    def cond(carry):
        return carry[0] > 0

    def body(carry):
        sp, best_t, best_code = carry
        sp, nid, c = _pop_child(nid_ref, pc_ref, sp)
        kind = meta_ref[0, 0, nid * 8 + c]

        def internal_case(ops):
            sp, best_t, best_code = ops
            window_hi = jnp.minimum(tmax, best_t)
            w = _slab_all_children(
                bounds_ref, kind, valid_ref[0, 0, kind], ox, oy, oz,
                idx, idy, idz, tmin, window_hi,
            )
            @pl.when(w != 0)
            def _():
                nid_ref[sp] = kind
                pc_ref[sp] = w
            return (sp + (w != 0).astype(jnp.int32), best_t, best_code)

        def leaf_case(ops):
            sp, best_t, best_code = ops
            cid = -(kind + 2)
            key = _cluster_intersect(
                w_ref, cid, od8, tmin, jnp.minimum(tmax, best_t),
                occl=False, row=row,
            )
            kmin = jnp.min(key, axis=0, keepdims=True)  # (1, packet)
            # t reconstructed ROUNDED UP (t_up >= t_true): windows can only
            # widen, never over-cull; on miss (INF_KEY) this is NaN, and
            # NaN < best_t is false, so `improved` stays off
            t_up = jax.lax.bitcast_convert_type(
                (kmin & jnp.int32(-128)) + jnp.int32(128), jnp.float32
            )
            improved = t_up < best_t
            code = cid * c_sz + (kmin & 127)
            return (
                sp,
                jnp.where(improved, t_up, best_t),
                jnp.where(improved, code, best_code),
            )

        return jax.lax.cond(
            kind >= 0, internal_case, leaf_case, (sp, best_t, best_code)
        )

    init = (
        sp0,
        tmax,
        jnp.full((1, packet), -1, jnp.int32),
    )
    _, best_t, best_code = jax.lax.while_loop(cond, body, init)
    out_t[0] = best_t
    out_code[0] = best_code


def _nearest_fused_kernel(dom_ref, perm_ref, bounds_ref, meta_ref,
                          valid_ref, w_ref, rays_ref, out_t, out_code,
                          nid_ref, pc_ref, bt_ref, bc_ref, init_ref):
    """ALL routed rounds in ONE pallas call (r5 experiment, routed="fused").

    Grid = R*P steps, rounds-major; the best-(t, code) carry lives in VMEM
    SCRATCH spanning every packet (bt_ref/bc_ref, (P,1,packet)), so the 20
    extra dispatches and the per-round whole-wavefront window rebakes of
    the scan form disappear.  perm_ref holds each round's domain-sorted
    packet order (dead tail collapsed per round); out blocks are indexed by
    packet, so a packet's LAST live round writes its final value.  The
    code carried is GLOBAL: dom * (Nc*C) + local.  init_ref (SMEM, (P,))
    marks first touch — an untouched packet's first live round seeds the
    carry from the ray block's own tmax row.
    """
    packet = rays_ref.shape[2] // 2
    g = pl.program_id(0)
    q = perm_ref[g]
    dom = dom_ref[g]
    live = dom >= 0
    p_total = bt_ref.shape[0]

    @pl.when(g == 0)
    def _():
        # scratch is uninitialized memory: clear the first-touch flags once
        def body(i, _):
            init_ref[i] = 0
            return 0
        jax.lax.fori_loop(0, p_total, body, 0)

    @pl.when(jnp.logical_not(live))
    def _():
        # the representative dead packet: emit its current carry (it may
        # have been live in an earlier round), or the never-hit default
        inited = init_ref[q] != 0

        def emit_carry():
            out_t[0] = bt_ref[q]
            out_code[0] = bc_ref[q]

        def emit_default():
            out_t[0] = jnp.zeros((1, packet), jnp.float32)
            out_code[0] = jnp.full((1, packet), -1, jnp.int32)

        jax.lax.cond(inited, emit_carry, emit_default)

    @pl.when(live)
    def _():
        od8, ox, oy, oz, idx, idy, idz, tmin, tmax0 = _ray_rows(rays_ref)
        if w_ref.shape[2] == 32:
            od8 = od8.astype(jnp.bfloat16)
        c_sz = w_ref.shape[3] // 3
        nc_c = w_ref.shape[1] * c_sz  # codes per domain (global code stride)
        row = jax.lax.broadcasted_iota(jnp.int32, (c_sz, packet), 0)
        first = init_ref[q] == 0
        bt0 = jnp.where(first, tmax0, bt_ref[q])
        bc0 = jnp.where(
            first, jnp.full((1, packet), -1, jnp.int32), bc_ref[q]
        )

        w0 = _slab_all_children(
            bounds_ref, 0, valid_ref[0, 0, 0], ox, oy, oz, idx, idy, idz,
            tmin, bt0,
        )
        nid_ref[0] = 0
        pc_ref[0] = w0
        sp0 = (w0 != 0).astype(jnp.int32)

        def cond(carry):
            return carry[0] > 0

        def body(carry):
            sp, best_t, best_code = carry
            sp, nid, c = _pop_child(nid_ref, pc_ref, sp)
            kind = meta_ref[0, 0, nid * 8 + c]

            def internal_case(ops):
                sp, best_t, best_code = ops
                w = _slab_all_children(
                    bounds_ref, kind, valid_ref[0, 0, kind], ox, oy, oz,
                    idx, idy, idz, tmin, best_t,
                )
                @pl.when(w != 0)
                def _():
                    nid_ref[sp] = kind
                    pc_ref[sp] = w
                return (sp + (w != 0).astype(jnp.int32), best_t, best_code)

            def leaf_case(ops):
                sp, best_t, best_code = ops
                cid = -(kind + 2)
                key = _cluster_intersect(
                    w_ref, cid, od8, tmin, best_t, occl=False, row=row,
                )
                kmin = jnp.min(key, axis=0, keepdims=True)
                t_up = jax.lax.bitcast_convert_type(
                    (kmin & jnp.int32(-128)) + jnp.int32(128), jnp.float32
                )
                improved = t_up < best_t
                code = cid * c_sz + (kmin & 127)
                return (
                    sp,
                    jnp.where(improved, t_up, best_t),
                    jnp.where(improved, code, best_code),
                )

            return jax.lax.cond(
                kind >= 0, internal_case, leaf_case, (sp, best_t, best_code)
            )

        init = (sp0, bt0, jnp.full((1, packet), -1, jnp.int32))
        _, bt, local_code = jax.lax.while_loop(cond, body, init)
        merged_code = jnp.where(
            local_code >= 0, dom * nc_c + local_code, bc0
        )
        bt_ref[q] = bt
        bc_ref[q] = merged_code
        init_ref[q] = 1
        out_t[0] = bt
        out_code[0] = merged_code


@functools.partial(jax.jit, static_argnames=("interpret",))
def _nearest_fused_call(dom_all, perm_all, bounds, meta, w, rays_aug,
                        interpret):
    """dom_all/perm_all: (R*P,) rounds-major schedule; returns the FINAL
    (t, code_global) per packet, each (P, 1, packet)."""
    p = rays_aug.shape[0]
    packet = rays_aug.shape[2] // 2
    valid = _valid_bytes(meta)
    meta_flat = meta.reshape(meta.shape[0], 1, -1)
    out_spec = pl.BlockSpec(
        (1, 1, packet), lambda b, dref, pref: (pref[b], 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(dom_all.shape[0],),
        in_specs=_domain_specs(bounds, meta_flat, valid.shape[2], w, packet),
        out_specs=[out_spec] * 2,
        scratch_shapes=_stack_scratch() + [
            pltpu.VMEM((p, 1, packet), jnp.float32),
            pltpu.VMEM((p, 1, packet), jnp.int32),
            pltpu.SMEM((p,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        _nearest_fused_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((p, 1, packet), jnp.float32),
                   jax.ShapeDtypeStruct((p, 1, packet), jnp.int32)],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(dom_all, perm_all, bounds, meta_flat, valid, w, rays_aug)


def _anyhit_fused_kernel(dom_ref, perm_ref, bounds_ref, meta_ref,
                         valid_ref, w_ref, rays_ref, out_occ,
                         nid_ref, pc_ref, oc_ref, init_ref):
    """Fused any-hit: all rounds in one pallas call, occlusion carried in
    VMEM scratch (see _nearest_fused_kernel).  Already-occluded lanes get
    zero windows, so later rounds' visits for them root out instantly."""
    packet = rays_ref.shape[2] // 2
    g = pl.program_id(0)
    q = perm_ref[g]
    dom = dom_ref[g]
    live = dom >= 0
    p_total = oc_ref.shape[0]

    @pl.when(g == 0)
    def _():
        def body(i, _):
            init_ref[i] = 0
            return 0
        jax.lax.fori_loop(0, p_total, body, 0)

    @pl.when(jnp.logical_not(live))
    def _():
        inited = init_ref[q] != 0

        def emit_carry():
            out_occ[0] = oc_ref[q]

        def emit_default():
            out_occ[0] = jnp.zeros((1, packet), jnp.int32)

        jax.lax.cond(inited, emit_carry, emit_default)

    @pl.when(live)
    def _():
        od8, ox, oy, oz, idx, idy, idz, tmin, tmax0 = _ray_rows(rays_ref)
        if w_ref.shape[2] == 32:
            od8 = od8.astype(jnp.bfloat16)
        first = init_ref[q] == 0
        occ0 = jnp.where(
            first, jnp.zeros((1, packet), jnp.int32), oc_ref[q]
        )
        win = jnp.where(occ0 != 0, F32(0.0), tmax0)

        w0 = _slab_all_children(
            bounds_ref, 0, valid_ref[0, 0, 0], ox, oy, oz, idx, idy, idz,
            tmin, win,
        )
        nid_ref[0] = 0
        pc_ref[0] = w0
        sp0 = (w0 != 0).astype(jnp.int32)

        def cond(carry):
            return carry[0] > 0

        def body(carry):
            sp, occ = carry
            sp, nid, c = _pop_child(nid_ref, pc_ref, sp)
            kind = meta_ref[0, 0, nid * 8 + c]

            def internal_case(ops):
                sp, occ = ops
                window_hi = jnp.where(occ != 0, F32(0.0), tmax0)
                w = _slab_all_children(
                    bounds_ref, kind, valid_ref[0, 0, kind], ox, oy, oz,
                    idx, idy, idz, tmin, window_hi,
                )
                @pl.when(w != 0)
                def _():
                    nid_ref[sp] = kind
                    pc_ref[sp] = w
                return (sp + (w != 0).astype(jnp.int32), occ)

            def leaf_case(ops):
                sp, occ = ops
                cid = -(kind + 2)
                ok = _cluster_intersect(
                    w_ref, cid, od8, tmin,
                    jnp.where(occ != 0, F32(0.0), tmax0), occl=True
                )
                return (
                    sp,
                    occ | jnp.any(ok, axis=0, keepdims=True).astype(jnp.int32),
                )

            return jax.lax.cond(kind >= 0, internal_case, leaf_case,
                                (sp, occ))

        _, occ = jax.lax.while_loop(cond, body, (sp0, occ0))
        oc_ref[q] = occ
        init_ref[q] = 1
        out_occ[0] = occ


@functools.partial(jax.jit, static_argnames=("interpret",))
def _anyhit_fused_call(dom_all, perm_all, bounds, meta, w, rays_aug,
                       interpret):
    p = rays_aug.shape[0]
    packet = rays_aug.shape[2] // 2
    valid = _valid_bytes(meta)
    meta_flat = meta.reshape(meta.shape[0], 1, -1)
    out_spec = pl.BlockSpec(
        (1, 1, packet), lambda b, dref, pref: (pref[b], 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(dom_all.shape[0],),
        in_specs=_domain_specs(bounds, meta_flat, valid.shape[2], w, packet),
        out_specs=out_spec,
        scratch_shapes=_stack_scratch() + [
            pltpu.VMEM((p, 1, packet), jnp.int32),
            pltpu.SMEM((p,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        _anyhit_fused_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((p, 1, packet), jnp.int32),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(dom_all, perm_all, bounds, meta_flat, valid, w, rays_aug)


def _anyhit_kernel(dom_ref, perm_ref, bounds_ref, meta_ref, valid_ref,
                   w_ref, rays_ref, out_occ, nid_ref, pc_ref):
    packet = rays_ref.shape[2] // 2
    live = dom_ref[pl.program_id(0)] >= 0

    @pl.when(jnp.logical_not(live))
    def _():
        out_occ[0] = jnp.zeros((1, packet), jnp.int32)

    @pl.when(live)
    def _():
        _anyhit_body(bounds_ref, meta_ref, valid_ref, w_ref, rays_ref,
                     out_occ, nid_ref, pc_ref)


def _anyhit_body(bounds_ref, meta_ref, valid_ref, w_ref, rays_ref, out_occ,
                 nid_ref, pc_ref):
    od8, ox, oy, oz, idx, idy, idz, tmin, tmax = _ray_rows(rays_ref)
    if w_ref.shape[2] == 32:  # pre-stacked bf16 pages (see _nearest_body)
        od8 = od8.astype(jnp.bfloat16)
    packet = rays_ref.shape[2] // 2

    w0 = _slab_all_children(
        bounds_ref, 0, valid_ref[0, 0, 0], ox, oy, oz, idx, idy, idz,
        tmin, tmax,
    )
    nid_ref[0] = 0
    pc_ref[0] = w0
    sp0 = (w0 != 0).astype(jnp.int32)

    def cond(carry):
        # No all-lanes-occluded early exit: that check was a vector->scalar
        # sync EVERY iteration (r4), while occluded lanes already get zero
        # windows so a fully-occluded packet's stack drains in a few
        # no-child pops.  The early exit only saved work in the rare
        # all-occluded case and cost sync latency on every visit.
        sp, occ = carry
        return sp > 0

    def body(carry):
        sp, occ = carry  # occ: (1, PACKET) int32
        sp, nid, c = _pop_child(nid_ref, pc_ref, sp)
        kind = meta_ref[0, 0, nid * 8 + c]

        def internal_case(ops):
            sp, occ = ops
            window_hi = jnp.where(occ != 0, F32(0.0), tmax)
            w = _slab_all_children(
                bounds_ref, kind, valid_ref[0, 0, kind], ox, oy, oz,
                idx, idy, idz, tmin, window_hi,
            )
            @pl.when(w != 0)
            def _():
                nid_ref[sp] = kind
                pc_ref[sp] = w
            return (sp + (w != 0).astype(jnp.int32), occ)

        def leaf_case(ops):
            sp, occ = ops
            cid = -(kind + 2)
            ok = _cluster_intersect(
                w_ref, cid, od8, tmin,
                jnp.where(occ != 0, F32(0.0), tmax), occl=True
            )
            return (
                sp, occ | jnp.any(ok, axis=0, keepdims=True).astype(jnp.int32)
            )

        return jax.lax.cond(kind >= 0, internal_case, leaf_case, (sp, occ))

    init = (sp0, jnp.zeros((1, packet), jnp.int32))
    _, occ = jax.lax.while_loop(cond, body, init)
    out_occ[0] = occ


def live_buckets(win_pk, dom=None):
    """(P, packet) windows -> (P,) bucket map with -1 for packets no lane
    of which has a live window (dead programs skip the whole kernel body —
    see _nearest_kernel).  With `dom`, live packets keep their domain id
    (and dom < 0 also marks dead).  THE single source of the dead-packet
    sentinel convention."""
    any_live = jnp.any(win_pk > 0, axis=1)
    if dom is None:
        return jnp.where(any_live, 0, -1).astype(jnp.int32)
    return jnp.where(any_live & (dom >= 0), jnp.maximum(dom, 0), -1)


def live_buckets_from_aug(aug):
    """Bucket map from packed ray blocks (row 5 = windows)."""
    pk = aug.shape[2] // 2
    return live_buckets(aug[:, 5, 0:pk])


def _rays_to_aug(o, d, tmin, tmax, packet=PACKET):
    """(N,...) rays -> (P, 6, 2*packet) blocks + count.

    Rows: [ox|dx], [oy|dy], [oz|dz], [1|0], [tmin|0], [tmax|0] — the first
    four rows ARE the fused (4, 2*PACKET) matmul operand; the traversal reads
    per-ray quantities as PACKET-aligned lane slices.  Rays on lanes
    throughout (see module docstring).
    """
    n = o.shape[0]
    npad = common.round_up(max(n, packet), packet)
    o = common.pad_to(o, npad)
    d = common.pad_to(d, npad, value=1.0)
    tmin = common.pad_to(tmin, npad, value=1.0)
    tmax = common.pad_to(tmax, npad, value=0.0)  # empty window: never hits
    p_ = npad // packet
    ob = o.reshape(p_, packet, 3).transpose(0, 2, 1)  # (P, 3, packet)
    db = d.reshape(p_, packet, 3).transpose(0, 2, 1)
    tminb = tmin.reshape(p_, 1, packet)
    tmaxb = tmax.reshape(p_, 1, packet)
    ones = jnp.ones((p_, 1, packet), F32)
    zeros = jnp.zeros((p_, 1, packet), F32)
    left = jnp.concatenate([ob, ones, tminb, tmaxb], axis=1)  # (P, 6, PACKET)
    right = jnp.concatenate([db, zeros, zeros, zeros], axis=1)
    aug = jnp.concatenate([left, right], axis=2)  # (P, 6, 2*PACKET)
    return aug, n


def _flat(x, n):
    return x.reshape(-1)[:n]


def _valid_bytes(meta):
    """(D, Nn) per-node pending-children bytes: bit c set iff child c exists.

    Kept FLAT (no trailing unit dim): SMEM windows are tile-padded to
    (8, 128) on their last two dims, so a (Nn, 1) window would burn 128x its
    size — the 1 MiB SMEM OOM that killed bench compiles at 21 domains."""
    bits = (meta != -1).astype(jnp.int32)
    weights = (1 << jnp.arange(8, dtype=jnp.int32)).reshape(1, 1, 8)
    return jnp.sum(bits * weights, axis=-1)[:, None, :]  # (D, 1, Nn)


def _domain_specs(bounds, meta, valid_cols, w, packet=PACKET):
    """BlockSpecs that DMA ONE domain's BVH per grid step, selected by the
    scalar-prefetched bucket->domain map (MoE-router style).  Consecutive
    buckets with the same domain re-use the resident block (no re-DMA), so a
    domain is uploaded once per contiguous run.

    Two scalar-prefetch refs (r5): dom_ref maps GRID STEP -> domain;
    perm_ref maps GRID STEP -> packet index — the ray block and the output
    blocks are indexed THROUGH perm_ref, so the grid can visit packets in
    domain-sorted order (maximal page-DMA contiguity, the thing that made
    4x-bigger pre-stacked bf16 pages lose at frame level) with ZERO
    wavefront gathers/scatters: results land at their natural packet
    positions via the output index map.
    """
    # dead entries: -1 selects page 0 (legacy); -d-2 selects page d+1... no:
    # value -1-d selects page d, so callers can park dead steps on the LAST
    # live domain's page (no page switch at the dead tail).  max(v, -1-v)
    # is v for v >= 0 and d for v == -1-d.
    dsel = lambda b, dom_ref: jnp.maximum(dom_ref[b], -1 - dom_ref[b])
    return [
        pl.BlockSpec(
            (1,) + bounds.shape[1:],
            lambda b, dref, pref: (dsel(b, dref), 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        # meta/valid are FLAT (D, 1, Nn*8) / (D, 1, Nn): SMEM windows are
        # tile-padded to (8, 128) on their last two dims, so the natural
        # (1, Nn, 8) layout costs 568 KB/buffer (SMEM is 1 MiB total) vs
        # ~150 KB flattened.  The middle unit dim satisfies Mosaic's
        # "last two block dims equal array dims or divisible" rule.
        pl.BlockSpec(
            (1, 1, meta.shape[2]),
            lambda b, dref, pref: (dsel(b, dref), 0, 0),
            memory_space=pltpu.SMEM,  # meta: scalar reads
        ),
        pl.BlockSpec(
            (1, 1, valid_cols),
            lambda b, dref, pref: (dsel(b, dref), 0, 0),
            memory_space=pltpu.SMEM,  # valid bytes: scalar reads
        ),
        pl.BlockSpec(
            (1,) + w.shape[1:],
            lambda b, dref, pref: (dsel(b, dref), 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 6, 2 * packet), lambda b, dref, pref: (pref[b], 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]


def _stack_scratch():
    """Ordered traversal stack: (nid, packed perm|count) SMEM word pairs."""
    return [
        pltpu.SMEM((MAX_STACK,), jnp.int32),
        pltpu.SMEM((MAX_STACK,), jnp.int32),
    ]


# Pre-stacked bf16 pages (r5) double-buffer at ~24 MB per domain at the
# default 131K-tri domain size — over Mosaic's 48 MB default scoped-VMEM
# limit (measured OOM by 382 KB at bench scale).  v5e has 128 MB VMEM;
# 100 MB leaves headroom for rays/outputs/scratch.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _nearest_call_perm(bucket_dom, packet_perm, bounds, meta, w, rays_aug,
                       interpret):
    """bounds (D,Nn,8,6), meta (D,Nn,8), w (D,Nc,32,3C) bf16 pre-stacked
    (or (D,Nc,4,3C) f32 compact), rays_aug (P,6,2*packet).

    bucket_dom (P,) i32 is in GRID order: grid step b traverses domain
    bucket_dom[b] over packet packet_perm[b] (a bijection over packets).
    Outputs land at NATURAL packet positions via the output index map, so a
    caller that sorts grid steps by domain (page-DMA contiguity) needs no
    wavefront gathers and no inverse permute.  Returns (t, code) each
    (P, 1, packet); code = cluster*CLUSTER + row."""
    p = rays_aug.shape[0]
    packet = rays_aug.shape[2] // 2
    valid = _valid_bytes(meta)
    meta_flat = meta.reshape(meta.shape[0], 1, -1)
    out_spec = pl.BlockSpec(
        (1, 1, packet), lambda b, dref, pref: (pref[b], 0, 0),
        memory_space=pltpu.VMEM,
    )
    oshape = jax.ShapeDtypeStruct((p, 1, packet), jnp.float32)
    oishape = jax.ShapeDtypeStruct((p, 1, packet), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(p,),
        in_specs=_domain_specs(bounds, meta_flat, valid.shape[2], w, packet),
        out_specs=[out_spec] * 2,
        scratch_shapes=_stack_scratch(),
    )
    return pl.pallas_call(
        _nearest_kernel,
        grid_spec=grid_spec,
        out_shape=[oshape, oishape],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(bucket_dom, packet_perm, bounds, meta_flat, valid, w, rays_aug)


def _iota_p(p):
    return jnp.arange(p, dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _nearest_call(bucket_dom, bounds, meta, w, rays_aug, interpret):
    """Identity-permutation form (grid order == packet order)."""
    return _nearest_call_perm(
        bucket_dom, _iota_p(rays_aug.shape[0]), bounds, meta, w, rays_aug,
        interpret,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _anyhit_call_perm(bucket_dom, packet_perm, bounds, meta, w, rays_aug,
                      interpret):
    p = rays_aug.shape[0]
    packet = rays_aug.shape[2] // 2
    valid = _valid_bytes(meta)
    meta_flat = meta.reshape(meta.shape[0], 1, -1)
    out_spec = pl.BlockSpec(
        (1, 1, packet), lambda b, dref, pref: (pref[b], 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(p,),
        in_specs=_domain_specs(bounds, meta_flat, valid.shape[2], w, packet),
        out_specs=out_spec,
        scratch_shapes=_stack_scratch(),
    )
    return pl.pallas_call(
        _anyhit_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((p, 1, packet), jnp.int32),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(bucket_dom, packet_perm, bounds, meta_flat, valid, w, rays_aug)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _anyhit_call(bucket_dom, bounds, meta, w, rays_aug, interpret):
    return _anyhit_call_perm(
        bucket_dom, _iota_p(rays_aug.shape[0]), bounds, meta, w, rays_aug,
        interpret,
    )


def tri_soa_from_scene(scene):
    """(v0, e1, e2) jnp arrays in ORIGINAL face order, for hit-attribute
    recompute (the kernels return only (t, prim); barycentrics come from one
    Möller–Trumbore against the committed triangle)."""
    verts = np.asarray(scene.vertices, np.float32)
    faces = np.asarray(scene.faces, np.int64)
    tv = verts[faces.reshape(-1)].reshape(-1, 3, 3)
    return (
        jnp.asarray(tv[:, 0]),
        jnp.asarray(tv[:, 1] - tv[:, 0]),
        jnp.asarray(tv[:, 2] - tv[:, 0]),
    )


def attrs_for_prims(v0, e1, e2, prim, o, d, t_kernel, tmax):
    """Recompute (t, u, v) for committed prim ids (outside the kernel).

    Same formula as the brute oracle, so parity with it is exact; t falls
    back to the kernel's value where the analytic recompute disagrees on
    validity (grazing hits at f32 precision).
    """
    safe = jnp.maximum(prim, 0)
    t, u, v, ok = geom.moller_trumbore(
        o, d, v0[safe], e1[safe], e2[safe], jnp
    )
    valid = prim >= 0
    t = jnp.where(valid & ok, t, jnp.where(valid, t_kernel, tmax))
    return t, jnp.where(valid, u, 0.0), jnp.where(valid, v, 0.0), valid


@register_intersector_pytree(
    leaves=("bounds", "meta", "w", "tri_ids", "v0", "e1", "e2"),
    aux=("nn", "nc", "interpret"),
    drop=("host",),
)
class ClusterBVHIntersector:
    """Drop-in intersector over the Pallas packet kernels (one domain).

    Registered as a pytree: pass it THROUGH jit boundaries as an argument —
    closing over it turns the BVH into per-execution-streamed HLO constants
    (see core/pytree.py)."""

    def __init__(self, scene, cbvh: ClusterBVH = None, interpret=None):
        if cbvh is None:
            cbvh = build_cluster_bvh(
                np.asarray(scene.vertices), np.asarray(scene.faces)
            )
        self.host = cbvh
        self.bounds = jnp.asarray(cbvh.bounds)[None]
        self.meta = jnp.asarray(cbvh.meta)[None]
        # pre-stacked bf16 pages (r5): zero per-visit operand prep in-kernel
        self.w = stack_w_pages(jnp.asarray(cbvh.w))[None]
        self.tri_ids = jnp.asarray(cbvh.tri_ids.reshape(-1))
        self.v0, self.e1, self.e2 = tri_soa_from_scene(scene)
        self.nn = cbvh.num_nodes
        self.nc = cbvh.num_clusters
        self.interpret = common.use_interpret() if interpret is None else interpret

    def intersect(self, o, d, tmin, tmax):
        rays_aug, n = _rays_to_aug(o, d, tmin, tmax)
        bucket_dom = live_buckets_from_aug(rays_aug)
        t, code = _nearest_call(
            bucket_dom, self.bounds, self.meta, self.w, rays_aug,
            self.interpret,
        )
        t, code = _flat(t, n), _flat(code, n)
        prim = jnp.where(code >= 0, self.tri_ids[jnp.maximum(code, 0)], -1)
        t, u, v, valid = attrs_for_prims(
            self.v0, self.e1, self.e2, prim, o, d, t, tmax
        )
        return Hits(
            t=jnp.where(valid, t, tmax), prim=prim.astype(jnp.int32),
            u=u, v=v, valid=valid,
        )

    def occluded(self, o, d, tmax):
        tmin = jnp.zeros_like(tmax)
        rays_aug, n = _rays_to_aug(o, d, tmin, tmax)
        bucket_dom = live_buckets_from_aug(rays_aug)
        occ = _anyhit_call(
            bucket_dom, self.bounds, self.meta, self.w, rays_aug,
            self.interpret,
        )
        return _flat(occ, n) != 0
