"""Multi-domain intersector over the Pallas cluster kernels.

Bridges the speculative domain architecture (SURVEY.md §2 R6/R7) to the fast
kernels: each domain owns a VMEM-sized ClusterBVH (identical padded shapes);
the wavefront is traced against domains by a lax.scan over the stacked domain
arrays, carrying the running best hit — the dense-batched form of speculative
trace + masked min-commit on one chip.  One scan = ONE Mosaic kernel
instantiation no matter how many domains (compile time is domain-count
independent); the carried best-t is re-baked into the ray windows each step so
later domains root-out early (vectorized front-to-back culling).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.pytree import register_intersector_pytree
from ..core.types import Hits
from ..domains.partition import median_split_assign
from .cluster_bvh import CLUSTER, ClusterBVH, build_cluster_bvh
from . import common
from .traverse import (
    _anyhit_call, _anyhit_call_perm, _nearest_call, _nearest_call_perm,
    _anyhit_fused_call, _nearest_fused_call, _rays_to_aug, _flat,
    attrs_for_prims, live_buckets, stack_w_pages, tri_soa_from_scene,
)

MAX_DOMAIN_TRIS = 1 << 17  # ~131K tris ≈ 6.3 MB of cluster transforms


def _packet_domain_order(aug, dom_aabb):
    """Per-packet front-to-back domain order (SURVEY.md §7.1 'domain-cursor').

    aug: (P, 6, 2*PACKET) ray blocks; dom_aabb: (D, 6) domain boxes.
    Returns (order, entry_sorted): order (P, D) int32 domain ids sorted by the
    packet's min entry distance, -1 where no ray in the packet overlaps the
    domain.  Computed as a scan over D (D is small) so the (D, P, PACKET)
    slab intermediate never materializes.
    """
    pk = aug.shape[2] // 2
    o = aug[:, 0:3, 0:pk]  # (P, 3, packet)
    d = aug[:, 0:3, pk:]
    tmin = aug[:, 4, 0:pk]  # (P, packet)
    tmax = aug[:, 5, 0:pk]
    eps = jnp.float32(1e-12)
    inv = jnp.float32(1.0) / jnp.where(jnp.abs(d) > eps, d, eps)

    def entry_of(_, box):
        lo = box[0:3].reshape(1, 3, 1)
        hi = box[3:6].reshape(1, 3, 1)
        t0 = (lo - o) * inv
        t1 = (hi - o) * inv
        tn = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=1), tmin)
        tf = jnp.minimum(jnp.min(jnp.maximum(t0, t1), axis=1), tmax)
        hit = tn <= tf  # (P, PACKET)
        ent = jnp.min(jnp.where(hit, tn, jnp.inf), axis=1)  # (P,)
        return None, ent

    _, entry = jax.lax.scan(entry_of, None, dom_aabb)  # (D, P)
    entry = entry.T  # (P, D)
    order = jnp.argsort(entry, axis=1).astype(jnp.int32)
    entry_sorted = jnp.take_along_axis(entry, order, axis=1)
    order = jnp.where(jnp.isfinite(entry_sorted), order, -1)
    return order, entry_sorted


def _radix_perm(key, nbits):
    """Stable permutation sorting `key` (non-negative, < 2^nbits) via LSD
    radix passes of 3 bits — each pass is a cumsum-based stable 8-bucket
    partition, NO sort network (XLA argsort costs ~25 ms at 262K keys /
    ~120 ms at 1M on this chip; 5 cumsum passes measure ~4x cheaper).
    Returns (perm, inv): x[perm] is key-sorted; result[inv] restores input
    order."""
    n = key.shape[0]
    perm = jnp.arange(n, dtype=jnp.int32)
    buckets = jnp.arange(8, dtype=jnp.int32)[None]
    for shift in range(0, nbits, 3):
        digit = (jax.lax.shift_right_logical(key[perm], shift)) & 7
        onehot = digit[:, None] == buckets  # (n, 8)
        counts = jnp.sum(onehot, axis=0, dtype=jnp.int32)
        base = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1]]
        )
        pos = base[digit] + jnp.take_along_axis(
            jnp.cumsum(onehot.astype(jnp.int32), axis=0) - 1,
            digit[:, None], axis=1,
        )[:, 0]
        perm = jnp.zeros(n, jnp.int32).at[pos].set(perm)
    inv = jnp.zeros(n, jnp.int32).at[perm].set(
        jnp.arange(n, dtype=jnp.int32)
    )
    return perm, inv


def _bucket_perm(key, nbuckets):
    """Stable permutation grouping `key` (ints in [0, nbuckets)) — ONE
    cumsum partition, used for the per-round PACKET grouping in the grid
    router (P ~ 4K packets, <= D+1 buckets).  An argsort here, inside the
    round scan, interacted with the wavefront-level sort to inflate the
    whole-frame XLA compile from ~26s to ~107s (r5_compile_iso)."""
    n = key.shape[0]
    onehot = key[:, None] == jnp.arange(nbuckets, dtype=key.dtype)[None]
    counts = jnp.sum(onehot, axis=0, dtype=jnp.int32)
    base = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1]]
    )
    pos = base[key] + jnp.take_along_axis(
        jnp.cumsum(onehot.astype(jnp.int32), axis=0) - 1, key[:, None],
        axis=1,
    )[:, 0]
    return jnp.zeros(n, jnp.int32).at[pos].set(
        jnp.arange(n, dtype=jnp.int32)
    )


MORTON_BITS = 4  # per axis -> 12-bit spatial key (r5_sweep2: fwd frame
#                  2.936s vs 3.024s @9 bits at p256; p128/p512 both lose)


def _morton_origin(o, lo, hi, bits=None):
    """Per-ray Morton code of the origin quantized over the scene box."""
    if bits is None:
        bits = MORTON_BITS  # read at trace time so sweeps can retune
    scale = jnp.float32(1 << bits) / jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip(
        ((o - lo) * scale).astype(jnp.int32), 0, (1 << bits) - 1
    )

    def spread(v):  # 3-bit spread: abc -> a__b__c
        v = (v | (v << 8)) & jnp.int32(0x0300F00F)
        v = (v | (v << 4)) & jnp.int32(0x030C30C3)
        v = (v | (v << 2)) & jnp.int32(0x09249249)
        return v

    return (
        spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    )


def _live_partition(win, d=None, o=None, world_lo=None, world_hi=None):
    """Stable partition for packet formation: live rays grouped by
    (direction octant, origin-Morton cell), dead lanes last.

    Three packet pathologies, one permutation: (1) bounce/NEE wavefronts
    are mostly dead lanes (measured 94% for shadow rays, 70% at bounce 2 on
    the bench scene) that ride along in live packets — compacted, the dead
    tail forms packets that root out at the grid-step floor.  (2) live
    bounce rays mix all 8 direction octants per packet, so every visit pays
    the union frustum — octant grouping turns the per-packet hemisphere
    into a cone.  (3, r5) bounce/shadow ORIGINS are scattered across the
    scene (camera-tile order means nothing after a bounce): grouping by a
    9-bit origin-Morton cell makes each packet's near-field descent shared
    — measured -13%/-39% on the bench intersect b1/b2 stages and -33% on
    occluded b1 (profiling/r5_repack.py), results permutation-exact.
    Stability preserves tile order inside each bucket.  All passes are
    cumsum partitions (_radix_perm), never sorts.  For camera wavefronts
    (identical origins) the Morton key is constant and this degrades
    exactly to the r4 octant partition.  Returns (perm, inv): trace
    o[perm] etc, then result[inv] restores input order.
    """
    live = win > 0
    n = win.shape[0]
    if d is None:
        key = jnp.where(live, 0, 1)
        return _radix_perm(key, 1)
    octant = (
        (d[:, 0] > 0).astype(jnp.int32)
        | ((d[:, 1] > 0).astype(jnp.int32) << 1)
        | ((d[:, 2] > 0).astype(jnp.int32) << 2)
    )
    if o is None or world_lo is None:
        key = jnp.where(live, octant, 8)
        return _radix_perm(key, 4)
    shift = 3 * MORTON_BITS
    m = _morton_origin(o, world_lo, world_hi)
    key = jnp.where(live, (octant << shift) | m,
                    jnp.int32(1 << (shift + 3)))
    # One stable RAY-LEVEL argsort (~140 ms at 1M lanes).  Beats 5-pass
    # cumsum radix at this key width (248 vs 379 ms — the radix scatters
    # dominate); the r3 "never argsort" rule was about per-SMALL-key
    # partitions in per-frame inner loops, where the cumsum form still
    # wins (above).  MEASURED AND REJECTED (r5): sorting one min-key per
    # 8-lane group (1/8 the sort length) — post-bounce samples of the same
    # pixel diverge, so group packing collapses packet coherence
    # (intersect_b2 0.98 -> 2.00s, occluded_b1 0.24 -> 0.72s).
    perm = jnp.argsort(key, stable=True).astype(jnp.int32)
    inv = jnp.zeros(key.shape[0], jnp.int32).at[perm].set(
        jnp.arange(key.shape[0], dtype=jnp.int32)
    )
    return perm, inv


def _pad0(a, n):
    if a.shape[0] >= n:
        return a
    pad = np.zeros((n - a.shape[0],) + a.shape[1:], a.dtype)
    return np.concatenate([a, pad])


def _pad_const(a, n, v):
    if a.shape[0] >= n:
        return a
    pad = np.full((n - a.shape[0],) + a.shape[1:], v, a.dtype)
    return np.concatenate([a, pad])


def split_for_vmem(scene, max_tris=MAX_DOMAIN_TRIS):
    """Choose a domain count so each domain's cluster set fits VMEM."""
    ntri = int(np.asarray(scene.faces).shape[0])
    return max(1, -(-ntri // max_tris))


def build_cluster_domains(scene, n_domains=None, cluster=None):
    """Partition the scene and build one ClusterBVH per domain, stacked to
    IDENTICAL padded shapes (host numpy).  Shared by the all-resident
    multi-domain intersector and the OOC residency slots (SURVEY §2 R10) —
    the same per-domain pages stream host->HBM or sit stacked in HBM.

    Returns dict: bounds (D,Nn,8,6), meta (D,Nn,8), w (D,Nc,4,3C),
    tri_ids (D,Nc*C) GLOBAL ids, aabb (D,6).
    """
    from .cluster_bvh import CLUSTER  # noqa: PLC0415

    verts = np.asarray(scene.vertices, np.float32)
    faces = np.asarray(scene.faces, np.int64)
    if cluster is None:
        cluster = CLUSTER
    if n_domains is None:
        n_domains = split_for_vmem(scene)
    tv = verts[faces.reshape(-1)].reshape(-1, 3, 3)
    centers = tv.mean(1)
    if n_domains == 1:
        assign = np.zeros(len(centers), np.int32)
    else:
        assign = median_split_assign(centers, n_domains)
    cbvhs = []
    aabbs = []
    for d in range(n_domains):
        ids = np.nonzero(assign == d)[0]
        if len(ids) == 0:
            # zero-cluster placeholder page (ADVICE r4): the requested domain
            # count is always honored, so mesh-rounded in-situ setups never
            # crash on small/degenerate scenes.  The page can never hit (one
            # root with zero valid children, all-zero transforms -> dw_ok
            # false) and its AABB is a far point box rays essentially never
            # enter (and root out instantly if they do).
            far = np.float32(2e30)
            cbvhs.append(ClusterBVH(
                bounds=np.concatenate([
                    np.full((1, 8, 3), np.inf, np.float32),
                    np.full((1, 8, 3), -np.inf, np.float32),
                ], axis=2),
                meta=np.full((1, 8), -1, np.int32),
                w=np.zeros((1, 4, 3 * cluster), np.float32),
                tri_ids=np.full((1, cluster), -1, np.int32),
                world_lo=np.full(3, far, np.float32),
                world_hi=np.full(3, far, np.float32),
            ))
            aabbs.append(np.full(6, far, np.float32))
            continue
        cbvh = build_cluster_bvh(verts, faces[ids], cluster=cluster)
        local = cbvh.tri_ids
        cbvh.tri_ids = np.where(
            local >= 0, ids[np.clip(local, 0, None)], -1
        ).astype(np.int32)
        cbvhs.append(cbvh)
        dv = verts[faces[ids].reshape(-1)]
        aabbs.append(np.concatenate([dv.min(0), dv.max(0)]))
    nn_max = max(c.bounds.shape[0] for c in cbvhs)
    nc_max = max(c.w.shape[0] for c in cbvhs)
    return {
        "aabb": np.stack(aabbs).astype(np.float32),
        "bounds": np.stack([_pad0(c.bounds, nn_max) for c in cbvhs]),
        "meta": np.stack([_pad_const(c.meta, nn_max, -1) for c in cbvhs]),
        "w": np.stack([_pad0(c.w, nc_max) for c in cbvhs]),
        "tri_ids": np.stack(
            [_pad_const(c.tri_ids, nc_max, -1).reshape(-1) for c in cbvhs]
        ),
    }


@functools.partial(jax.jit, static_argnames=("interpret",))
def _scan_nearest(bounds, meta, w, tri_ids, aug, n_static, tmax, interpret):
    """Scan domains; carry best (t, prim, u, v).  aug: (P, 6, 2*packet)."""
    p = aug.shape[0]
    pk = aug.shape[2] // 2
    npad = p * pk

    def pad_n(x, fill):
        return jnp.concatenate(
            [x, jnp.full(npad - x.shape[0], fill, x.dtype)]
        ) if x.shape[0] < npad else x

    best_t0 = pad_n(tmax, 0.0)

    def body(carry, dom):
        best_t, best_prim = carry
        win_pk = best_t.reshape(p, pk)
        a = aug.at[:, 5, 0:pk].set(win_pk)
        t, code = _nearest_call(
            live_buckets(win_pk), dom["bounds"][None], dom["meta"][None],
            dom["w"][None], a, interpret,
        )
        t, code = t.reshape(-1), code.reshape(-1)
        prim = jnp.where(code >= 0, dom["tri_ids"][jnp.maximum(code, 0)], -1)
        upd = (prim >= 0) & (t < best_t)
        return (
            jnp.where(upd, t, best_t),
            jnp.where(upd, prim, best_prim),
        ), None

    init = (
        best_t0,
        jnp.full(npad, -1, jnp.int32),
    )
    (bt, bp), _ = jax.lax.scan(
        body, init,
        {"bounds": bounds, "meta": meta, "w": w, "tri_ids": tri_ids},
    )
    return bt, bp


def _round_perms(order, n_domains):
    """Per-round packet permutations: round r visits order[:, r]; packets are
    sorted by domain id (stable) so the scalar-prefetch BlockSpecs DMA each
    domain's BVH once per contiguous run; dead packets (-1) sort last."""
    key = jnp.where(order >= 0, order, n_domains).T  # (D, P)
    perms = jnp.argsort(key, axis=1).astype(jnp.int32)  # (D, P)
    invs = jnp.argsort(perms, axis=1).astype(jnp.int32)
    bdoms = jnp.take_along_axis(order.T, perms, axis=1)  # (D, P) permuted
    return perms, invs, bdoms


@functools.partial(jax.jit, static_argnames=("interpret",))
def _routed_nearest(bounds, meta, w, tri_ids, dom_aabb, aug, tmax, interpret):
    """Front-to-back routed traversal: D rounds; in round r each packet
    traverses the r-th nearest domain it overlaps (or nothing).  The carried
    best-t is baked into the ray windows, so a domain whose entry distance
    exceeds the packet's best hits roots out at its first slab test — the
    vectorized form of the reference's 'all closer domains processed' commit
    cull (SURVEY.md §3.3)."""
    p = aug.shape[0]
    pk = aug.shape[2] // 2
    npad = p * pk
    order, _ = _packet_domain_order(aug, dom_aabb)
    perms, invs, bdoms = _round_perms(order, bounds.shape[0])

    def pad_n(x, fill):
        return jnp.concatenate(
            [x, jnp.full(npad - x.shape[0], fill, x.dtype)]
        ) if x.shape[0] < npad else x

    def body(carry, rin):
        best_t, best_prim = carry
        perm, inv, bdom = rin
        a = aug[perm]
        bt = best_t.reshape(p, pk)[perm]
        live = (bdom >= 0)[:, None]
        win_pk = jnp.where(live, bt, jnp.float32(0.0))
        a = a.at[:, 5, 0:pk].set(win_pk)
        t, code = _nearest_call(
            live_buckets(win_pk, bdom), bounds, meta, w, a, interpret
        )
        dom_ray = jnp.repeat(jnp.maximum(bdom, 0), pk)
        t, code = t.reshape(-1), code.reshape(-1)
        prim = jnp.where(
            code >= 0, tri_ids[dom_ray, jnp.maximum(code, 0)], -1
        )

        def unp(x):
            return x.reshape(p, pk)[inv].reshape(-1)

        t, prim = unp(t), unp(prim)
        upd = (prim >= 0) & (t < best_t)
        return (
            jnp.where(upd, t, best_t),
            jnp.where(upd, prim, best_prim),
        ), None

    init = (
        pad_n(tmax, 0.0),
        jnp.full(npad, -1, jnp.int32),
    )
    (bt, bp), _ = jax.lax.scan(body, init, (perms, invs, bdoms))
    return bt, bp


@functools.partial(jax.jit, static_argnames=("interpret",))
def _routed_anyhit(bounds, meta, w, dom_aabb, aug, interpret):
    p = aug.shape[0]
    pk = aug.shape[2] // 2
    npad = p * pk
    order, _ = _packet_domain_order(aug, dom_aabb)
    perms, invs, bdoms = _round_perms(order, bounds.shape[0])

    def body(occ, rin):
        perm, inv, bdom = rin
        a = aug[perm]
        occ_p = occ.reshape(p, pk)[perm]
        live = (bdom >= 0)[:, None] & (occ_p == 0)
        win_pk = jnp.where(live, a[:, 5, 0:pk], jnp.float32(0.0))
        a = a.at[:, 5, 0:pk].set(win_pk)
        o = _anyhit_call(
            live_buckets(win_pk, bdom), bounds, meta, w, a, interpret
        )
        o = o.reshape(p, pk)[inv].reshape(-1)
        return occ | o, None

    occ, _ = jax.lax.scan(
        body, jnp.zeros(npad, jnp.int32), (perms, invs, bdoms)
    )
    return occ



@functools.partial(jax.jit, static_argnames=("interpret",))
def _routed_nearest_global(bounds, meta, w, tri_ids, dom_aabb, aug, tmax,
                           interpret):
    """Routed traversal with ONE global packet permutation (r4): packets are
    sorted once by their first-visited domain and stay in that order for all
    D rounds; best-t/prim are carried in sorted space and un-permuted once
    at the end.  Later rounds' domain runs are only partially contiguous
    (more page DMA switches than the per-round sort), but the 21 per-round
    whole-wavefront gathers/scatters — the dominant XLA compile cost and
    real HBM glue of `_routed_nearest` — disappear."""
    p = aug.shape[0]
    pk = aug.shape[2] // 2
    npad = p * pk
    order, _ = _packet_domain_order(aug, dom_aabb)
    d_count = bounds.shape[0]
    key0 = jnp.where(order[:, 0] >= 0, order[:, 0], d_count)
    perm = jnp.argsort(key0, stable=True).astype(jnp.int32)
    inv = jnp.argsort(perm).astype(jnp.int32)
    aug_s = aug[perm]
    order_s = order[perm]

    def pad_n(x, fill):
        return jnp.concatenate(
            [x, jnp.full(npad - x.shape[0], fill, x.dtype)]
        ) if x.shape[0] < npad else x

    bt0 = pad_n(tmax, 0.0).reshape(p, pk)[perm]
    bp0 = jnp.full((p, pk), -1, jnp.int32)

    def body(carry, r):
        bt, bp = carry
        bdom = order_s[:, r]
        live = (bdom >= 0)[:, None]
        win_pk = jnp.where(live, bt, jnp.float32(0.0))
        a = aug_s.at[:, 5, 0:pk].set(win_pk)
        t, code = _nearest_call(
            live_buckets(win_pk, bdom), bounds, meta, w, a, interpret
        )
        t = t.reshape(p, pk)
        code = code.reshape(p, pk)
        dom_b = jnp.maximum(bdom, 0)[:, None]
        prim = jnp.where(
            code >= 0,
            tri_ids[jnp.broadcast_to(dom_b, code.shape),
                    jnp.maximum(code, 0)],
            -1,
        )
        upd = (prim >= 0) & (t < bt)
        return (
            jnp.where(upd, t, bt), jnp.where(upd, prim, bp)
        ), None

    (bt, bp), _ = jax.lax.scan(
        body, (bt0, bp0), jnp.arange(order.shape[1], dtype=jnp.int32)
    )
    return bt[inv].reshape(-1), bp[inv].reshape(-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _routed_anyhit_global(bounds, meta, w, dom_aabb, aug, interpret):
    p = aug.shape[0]
    pk = aug.shape[2] // 2
    order, _ = _packet_domain_order(aug, dom_aabb)
    d_count = bounds.shape[0]
    key0 = jnp.where(order[:, 0] >= 0, order[:, 0], d_count)
    perm = jnp.argsort(key0, stable=True).astype(jnp.int32)
    inv = jnp.argsort(perm).astype(jnp.int32)
    aug_s = aug[perm]
    order_s = order[perm]
    win0 = aug_s[:, 5, 0:pk]

    def body(occ, r):
        bdom = order_s[:, r]
        live = (bdom >= 0)[:, None] & (occ == 0)
        win_pk = jnp.where(live, win0, jnp.float32(0.0))
        a = aug_s.at[:, 5, 0:pk].set(win_pk)
        o = _anyhit_call(
            live_buckets(win_pk, bdom), bounds, meta, w, a, interpret
        )
        return occ | o.reshape(p, pk), None

    occ, _ = jax.lax.scan(
        body, jnp.zeros((p, pk), jnp.int32),
        jnp.arange(order.shape[1], dtype=jnp.int32),
    )
    return occ[inv].reshape(-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _routed_nearest_grid(bounds, meta, w, tri_ids, dom_aabb, aug, tmax,
                         interpret):
    """Routed traversal with PER-ROUND domain-sorted GRID order (r5): the
    scalar-prefetched packet permutation of `_nearest_call_perm` makes the
    kernel's grid visit packets sorted by this round's domain, so every
    domain's (now 4x bigger pre-stacked bf16) page is DMA'd at most once per
    round — with ZERO wavefront gathers: rays stay in natural (tile) order
    in HBM, outputs land at natural positions via the output index map.
    Replaces both r3's per-round data sorts (whole-wavefront gathers: the
    dominant XLA glue+compile cost) and r4's one global data sort (which
    left later rounds' domain runs fragmented — measured 15% frame loss
    once pages grew 4x).  The per-round sort is over P ~ 4K PACKET ids, not
    rays: trivial."""
    p = aug.shape[0]
    pk = aug.shape[2] // 2
    npad = p * pk
    order, _ = _packet_domain_order(aug, dom_aabb)  # (P, D), natural order
    d_count = bounds.shape[0]

    def pad_n(x, fill):
        return jnp.concatenate(
            [x, jnp.full(npad - x.shape[0], fill, x.dtype)]
        ) if x.shape[0] < npad else x

    bt0 = pad_n(tmax, 0.0).reshape(p, pk)
    bp0 = jnp.full((p, pk), -1, jnp.int32)

    def body(carry, r):
        bt, bp = carry
        bdom = order[:, r]  # (P,) natural packet order
        live = (bdom >= 0)[:, None]
        win_pk = jnp.where(live, bt, jnp.float32(0.0))
        a = aug.at[:, 5, 0:pk].set(win_pk)
        bucket_nat = live_buckets(win_pk, bdom)  # (P,), -1 = dead
        key = jnp.where(bucket_nat >= 0, bucket_nat, d_count)
        perm = _bucket_perm(key, d_count + 1)
        # Collapse the dead tail onto ONE representative step (r5 census:
        # on camera/shadow rounds 94% of grid steps were dead — the body
        # skip left their ray-in and two out-block DMAs running).  All
        # dead steps index the same packet and the same page (the last
        # live domain's, via the -1-d encoding), so Pallas's
        # revisiting-block rule drops every per-step DMA; the other dead
        # packets' output blocks are never written and their garbage is
        # masked by `live` below.
        n_live = jnp.sum((bucket_nat >= 0).astype(jnp.int32))
        steps = jnp.arange(p, dtype=jnp.int32)
        rep = perm[jnp.minimum(n_live, p - 1)]
        perm = jnp.where(steps < n_live, perm, rep)
        dmax = jnp.max(jnp.where(bucket_nat >= 0, bucket_nat, 0))
        bucket = jnp.where(
            steps < n_live, bucket_nat[perm], -1 - dmax
        )
        t, code = _nearest_call_perm(
            bucket, perm, bounds, meta, w, a, interpret
        )
        t = t.reshape(p, pk)
        code = jnp.clip(code.reshape(p, pk), -1, tri_ids.shape[1] - 1)
        dom_b = jnp.maximum(bdom, 0)[:, None]
        prim = jnp.where(
            code >= 0,
            tri_ids[jnp.broadcast_to(dom_b, code.shape),
                    jnp.maximum(code, 0)],
            -1,
        )
        # mask by PACKET liveness (bucket_nat, not bdom: a domain-overlapped
        # packet with no live lanes is also a dead step now) — dead steps'
        # unwritten output blocks hold garbage
        upd = (prim >= 0) & (t < bt) & (bucket_nat >= 0)[:, None]
        return (
            jnp.where(upd, t, bt), jnp.where(upd, prim, bp)
        ), None

    (bt, bp), _ = jax.lax.scan(
        body, (bt0, bp0), jnp.arange(order.shape[1], dtype=jnp.int32)
    )
    return bt.reshape(-1), bp.reshape(-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _routed_nearest_fused(bounds, meta, w, tri_ids, dom_aabb, aug, tmax,
                          interpret):
    """Routed traversal with ALL rounds in ONE pallas call (r5,
    routed="fused"): the best-(t, global-code) carry lives in kernel VMEM
    scratch, so the per-round dispatches, window rebakes and min-combines
    of the grid form disappear.  The full rounds-major schedule
    (domain-sorted with collapsed dead tails, exactly the grid form's) is
    computed up front and scalar-prefetched."""
    p = aug.shape[0]
    pk = aug.shape[2] // 2
    order, _ = _packet_domain_order(aug, dom_aabb)  # (P, R)
    d_count = bounds.shape[0]
    pkt_live = jnp.any(aug[:, 5, 0:pk] > 0, axis=1)  # (P,) static
    bdom = order.T  # (R, P)
    bucket_nat = jnp.where(
        pkt_live[None] & (bdom >= 0), jnp.maximum(bdom, 0), -1
    )
    key = jnp.where(bucket_nat >= 0, bucket_nat, d_count)
    perm = jax.vmap(lambda k: _bucket_perm(k, d_count + 1))(key)  # (R, P)
    n_live = jnp.sum((bucket_nat >= 0).astype(jnp.int32), axis=1)  # (R,)
    steps = jnp.arange(p, dtype=jnp.int32)[None]
    rep = jnp.take_along_axis(
        perm, jnp.minimum(n_live, p - 1)[:, None], axis=1
    )
    live_step = steps < n_live[:, None]
    perm = jnp.where(live_step, perm, rep)
    bucket_g = jnp.take_along_axis(bucket_nat, perm, axis=1)
    dmax = jnp.max(jnp.where(bucket_nat >= 0, bucket_nat, 0), axis=1)
    dom_all = jnp.where(live_step, bucket_g, -1 - dmax[:, None]).reshape(-1)
    t, code = _nearest_fused_call(
        dom_all, perm.reshape(-1), bounds, meta, w, aug, interpret
    )
    ever = jnp.any(bucket_nat >= 0, axis=0)[:, None]  # (P, 1)
    t = jnp.where(ever, t[:, 0], jnp.float32(0.0))
    code = jnp.where(ever, code[:, 0], -1)
    flat_ids = tri_ids.reshape(-1)
    code = jnp.clip(code, -1, flat_ids.shape[0] - 1)
    prim = jnp.where(code >= 0, flat_ids[jnp.maximum(code, 0)], -1)
    npad = p * pk

    def pad_n(x, fill):
        return jnp.concatenate(
            [x, jnp.full(npad - x.shape[0], fill, x.dtype)]
        ) if x.shape[0] < npad else x

    bt0 = pad_n(tmax, 0.0).reshape(p, pk)
    # lanes with no commit keep their original window value (the carry's
    # no-hit value), matching the grid form's contract
    upd = prim >= 0
    bt = jnp.where(upd, t, bt0)
    return bt.reshape(-1), prim.reshape(-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _routed_anyhit_fused(bounds, meta, w, dom_aabb, aug, interpret):
    """Fused any-hit: all rounds in one pallas call, occlusion carried in
    kernel scratch.  Same schedule construction as _routed_nearest_fused
    (the occlusion evolution lives in-kernel: later rounds' visits for
    already-occluded lanes carry zero windows and root out instantly)."""
    p = aug.shape[0]
    pk = aug.shape[2] // 2
    order, _ = _packet_domain_order(aug, dom_aabb)
    d_count = bounds.shape[0]
    pkt_live = jnp.any(aug[:, 5, 0:pk] > 0, axis=1)
    bdom = order.T  # (R, P)
    bucket_nat = jnp.where(
        pkt_live[None] & (bdom >= 0), jnp.maximum(bdom, 0), -1
    )
    key = jnp.where(bucket_nat >= 0, bucket_nat, d_count)
    perm = jax.vmap(lambda k: _bucket_perm(k, d_count + 1))(key)
    n_live = jnp.sum((bucket_nat >= 0).astype(jnp.int32), axis=1)
    steps = jnp.arange(p, dtype=jnp.int32)[None]
    rep = jnp.take_along_axis(
        perm, jnp.minimum(n_live, p - 1)[:, None], axis=1
    )
    live_step = steps < n_live[:, None]
    perm = jnp.where(live_step, perm, rep)
    bucket_g = jnp.take_along_axis(bucket_nat, perm, axis=1)
    dmax = jnp.max(jnp.where(bucket_nat >= 0, bucket_nat, 0), axis=1)
    dom_all = jnp.where(live_step, bucket_g, -1 - dmax[:, None]).reshape(-1)
    occ = _anyhit_fused_call(
        dom_all, perm.reshape(-1), bounds, meta, w, aug, interpret
    )
    ever = jnp.any(bucket_nat >= 0, axis=0)[:, None]
    return jnp.where(ever, occ[:, 0], 0).reshape(-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _routed_anyhit_grid(bounds, meta, w, dom_aabb, aug, interpret):
    p = aug.shape[0]
    pk = aug.shape[2] // 2
    order, _ = _packet_domain_order(aug, dom_aabb)
    d_count = bounds.shape[0]
    win0 = aug[:, 5, 0:pk]

    def body(occ, r):
        bdom = order[:, r]
        live = (bdom >= 0)[:, None] & (occ == 0)
        win_pk = jnp.where(live, win0, jnp.float32(0.0))
        a = aug.at[:, 5, 0:pk].set(win_pk)
        bucket_nat = live_buckets(win_pk, bdom)
        key = jnp.where(bucket_nat >= 0, bucket_nat, d_count)
        perm = _bucket_perm(key, d_count + 1)
        # dead-tail collapse: see _routed_nearest_grid
        n_live = jnp.sum((bucket_nat >= 0).astype(jnp.int32))
        steps = jnp.arange(p, dtype=jnp.int32)
        rep = perm[jnp.minimum(n_live, p - 1)]
        perm = jnp.where(steps < n_live, perm, rep)
        dmax = jnp.max(jnp.where(bucket_nat >= 0, bucket_nat, 0))
        bucket = jnp.where(
            steps < n_live, bucket_nat[perm], -1 - dmax
        )
        o = _anyhit_call_perm(
            bucket, perm, bounds, meta, w, a, interpret
        )
        live_pkt = (bucket_nat >= 0)[:, None]
        return occ | jnp.where(live_pkt, o.reshape(p, pk), 0), None

    occ, _ = jax.lax.scan(
        body, jnp.zeros((p, pk), jnp.int32),
        jnp.arange(order.shape[1], dtype=jnp.int32),
    )
    return occ.reshape(-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _scan_anyhit(bounds, meta, w, aug, interpret):
    p = aug.shape[0]
    pk = aug.shape[2] // 2
    npad = p * pk

    def body(occ, dom):
        win_pk = jnp.where(
            occ != 0, jnp.float32(0.0),
            aug[:, 5, 0:pk].reshape(-1),
        ).reshape(p, pk)
        a = aug.at[:, 5, 0:pk].set(win_pk)
        o = _anyhit_call(
            live_buckets(win_pk), dom["bounds"][None], dom["meta"][None],
            dom["w"][None], a, interpret,
        )
        return occ | o.reshape(-1), None

    occ, _ = jax.lax.scan(
        body, jnp.zeros(npad, jnp.int32),
        {"bounds": bounds, "meta": meta, "w": w},
    )
    return occ


@register_intersector_pytree(
    leaves=("bounds", "meta", "w", "tri_ids", "dom_aabb", "v0", "e1", "e2",
            "world_lo", "world_hi"),
    aux=("n_domains", "interpret", "routed", "packet"),
)
class MultiDomainClusterIntersector:
    """Drop-in intersector: D per-domain Pallas cluster BVHs, min-combined.

    routed="fused" (default, r5): ALL domain rounds in ONE pallas call —
    the per-packet best-(t, global-code) carry lives in kernel VMEM
    scratch, the rounds-major domain-sorted schedule is scalar-prefetched,
    and a packet's last live round writes its final output block.  Kills
    the per-round dispatches, window rebakes and min-combines of the grid
    form: fwd bench frame 2.91 -> 2.21s, byte-identical (r5).
    routed="grid": per-round pallas calls in domain-sorted GRID order via
    the scalar-prefetched packet permutation — every round's page DMAs are
    maximally contiguous AND there are zero wavefront gathers (the rays
    never move; the kernel's index maps do the sort).  Kept as the
    cross-check for the fused carry (and the any-hit form fused reuses).
    routed="global" (r4): one packet DATA sort by first-visited domain;
    later rounds' domain runs fragment (measured 15% frame loss with the
    4x bf16 pre-stacked pages).
    routed=True: per-round domain-sorted packet DATA (whole-wavefront
    gathers each round; the r3 form — ~90s extra XLA compile).
    routed=False: plain scan of every domain over every packet (the
    dense-speculation form; kept as the correctness cross-check).
    """

    def __init__(self, scene, n_domains=None, interpret=None,
                 routed="fused", packet=256, cluster=None):
        # default 256 lanes: measured fastest on the bench frame (r4 packet
        # sweep: 1.46s vs 1.62s @512 vs 1.54s @128, byte-identical images) —
        # narrower packets waste less union-frustum decode on incoherent
        # bounce/NEE wavefronts, at 2x the fixed per-visit costs
        self.routed = routed
        self.packet = packet
        st = build_cluster_domains(scene, n_domains, cluster=cluster)
        self.dom_aabb = jnp.asarray(st["aabb"])
        self.world_lo = jnp.asarray(st["aabb"][:, 0:3].min(0))
        self.world_hi = jnp.asarray(st["aabb"][:, 3:6].max(0))
        self.n_domains = st["bounds"].shape[0]
        self.bounds = jnp.asarray(st["bounds"])
        self.meta = jnp.asarray(st["meta"])
        # pre-stacked bf16 pages (r5, kernels.traverse.stack_w_pages): the
        # compact f32 host pages are stacked ON DEVICE once at init
        self.w = stack_w_pages(jnp.asarray(st["w"]))
        self.tri_ids = jnp.asarray(st["tri_ids"])
        self.v0, self.e1, self.e2 = tri_soa_from_scene(scene)
        self.interpret = (
            common.use_interpret() if interpret is None else interpret
        )

    def intersect(self, o, d, tmin, tmax):
        n = o.shape[0]
        perm, inv = _live_partition(tmax, d, o, self.world_lo, self.world_hi)
        o_, d_, tmin_, tmax_ = o[perm], d[perm], tmin[perm], tmax[perm]
        aug, _ = _rays_to_aug(o_, d_, tmin_, tmax_, self.packet)
        if self.routed == "fused":
            bt, bp = _routed_nearest_fused(
                self.bounds, self.meta, self.w, self.tri_ids,
                self.dom_aabb, aug, tmax_, self.interpret,
            )
        elif self.routed == "grid":
            bt, bp = _routed_nearest_grid(
                self.bounds, self.meta, self.w, self.tri_ids,
                self.dom_aabb, aug, tmax_, self.interpret,
            )
        elif self.routed == "global":
            bt, bp = _routed_nearest_global(
                self.bounds, self.meta, self.w, self.tri_ids,
                self.dom_aabb, aug, tmax_, self.interpret,
            )
        elif self.routed:
            bt, bp = _routed_nearest(
                self.bounds, self.meta, self.w, self.tri_ids,
                self.dom_aabb, aug, tmax_, self.interpret,
            )
        else:
            bt, bp = _scan_nearest(
                self.bounds, self.meta, self.w, self.tri_ids, aug, n,
                tmax_, self.interpret,
            )
        bt, bp = bt[:n][inv], bp[:n][inv]
        t, u, v, valid = attrs_for_prims(
            self.v0, self.e1, self.e2, bp, o, d, bt, tmax
        )
        return Hits(
            t=jnp.where(valid, t, tmax), prim=bp.astype(jnp.int32),
            u=u, v=v, valid=valid,
        )

    def occluded(self, o, d, tmax):
        n = o.shape[0]
        tmin = jnp.zeros_like(tmax)
        perm, inv = _live_partition(tmax, d, o, self.world_lo, self.world_hi)
        aug, _ = _rays_to_aug(o[perm], d[perm], tmin, tmax[perm], self.packet)
        if self.routed in ("grid", "fused"):
            # fused mode keeps the per-round GRID any-hit: the grid form
            # drops fully-occluded packets from later rounds' schedules
            # (they become collapsed dead steps), which the in-kernel
            # occlusion carry cannot — measured occluded_b0 0.21 vs 0.42s
            # (r5; _routed_anyhit_fused kept as an option/cross-check)
            occ = _routed_anyhit_grid(
                self.bounds, self.meta, self.w, self.dom_aabb, aug,
                self.interpret,
            )
        elif self.routed == "global":
            occ = _routed_anyhit_global(
                self.bounds, self.meta, self.w, self.dom_aabb, aug,
                self.interpret,
            )
        elif self.routed:
            occ = _routed_anyhit(
                self.bounds, self.meta, self.w, self.dom_aabb, aug,
                self.interpret,
            )
        else:
            occ = _scan_anyhit(
                self.bounds, self.meta, self.w, aug, self.interpret
            )
        return occ[:n][inv] != 0
