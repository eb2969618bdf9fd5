"""Binned cull+visit tracer — the single-chip fast path (SURVEY.md §7.3 #1).

This is the speculative-scheduling idea of the reference (SURVEY.md §3.1-3.3)
re-derived at *supernode* granularity and mapped onto the TPU's execution
model:

  reference concept              here
  --------------------------     ----------------------------------------
  spatial domain                 supernode = 8 Morton-adjacent clusters
                                 (8 x 128 tris), AABB known globally
  per-domain ray queue           `processed` (packets x supernodes) mask +
                                 conservative packet-frustum entry bounds
  epoch schedule (top queues)    per-packet K nearest unprocessed
                                 supernodes (front-to-back band)
  speculative trace              flat visit list (packet, supernode) run by
                                 ONE Pallas kernel whose grid steps pipeline
                                 (no per-node stack/cond serialization)
  commit / reconcile             masked min over visits; a packet retires
                                 when no unprocessed supernode's entry can
                                 beat any live ray's best-t
  domain cursor                  per-ray `t_front`: space below it is fully
                                 processed, so the live window is
                                 [t_front, best_t] (SURVEY.md §3.3)

Why this shape: a TPU core is ONE instruction stream — per-packet stack
traversal (kernels/traverse.py) serializes at ~2 us per node visit (scalar
stack ops + while/cond dependences).  Grid steps with scalar-prefetched
block indices, by contrast, software-pipeline (~0.25 us/step measured), so
the only real cost per visit is the vector intersection itself.

Cost model measured on TPU v5e-lite (512-ray packet):
  - grid step floor             ~0.25 us
  - vector->scalar gate         ~1.3 us  (ONE per visit: the cluster bitmask)
  - Moller-Trumbore, 128 tris   ~1.4 us  (VPU f32; only for gated-on clusters)
  - K=4 small-K MXU matmul      ~1.7 us/cluster at HIGHEST — rejected: the
    Woop-transform path wastes the MXU (contraction dim 4 = 3% utilization)
The kernel therefore does per-cluster-gated VPU Moller-Trumbore with the
SAME formula as the numpy oracle (core/geom.moller_trumbore) — backend
parity of the hit tests is structural, and best-t accumulates in VMEM
scratch across a packet's visits (read-modify-write of output blocks per
step would serialize the DMA pipeline).
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
from .cluster_bvh import CLUSTER, build_clusters
from .traverse import attrs_for_prims, tri_soa_from_scene

BP = 128  # rays per visit packet.  Smaller than traverse.PACKET (512): an
# incoherent visit's Moller-Trumbore cost is C*BP lanes regardless of how
# many rays want the cluster, so narrower packets waste 4x less on bounce
# wavefronts; the extra grid steps ride the ~0.25us step floor.


def _rays_to_aug(o, d, tmin, tmax):
    """(N,...) rays -> (P, 6, 2*BP) blocks + count (cf. traverse layout)."""
    n = o.shape[0]
    npad = common.round_up(max(n, BP), BP)
    o = common.pad_to(o, npad)
    d = common.pad_to(d, npad, value=1.0)
    tmin = common.pad_to(tmin, npad, value=1.0)
    tmax = common.pad_to(tmax, npad, value=0.0)  # empty window: never hits
    p_ = npad // BP
    ob = o.reshape(p_, BP, 3).transpose(0, 2, 1)
    db = d.reshape(p_, BP, 3).transpose(0, 2, 1)
    left = jnp.concatenate(
        [ob, jnp.ones((p_, 1, BP), jnp.float32),
         tmin.reshape(p_, 1, BP), tmax.reshape(p_, 1, BP)], axis=1)
    right = jnp.concatenate(
        [db, jnp.zeros((p_, 3, BP), jnp.float32)], axis=1)
    return jnp.concatenate([left, right], axis=2), n

GROUP = 8  # clusters per supernode
F32 = jnp.float32
INF = np.float32(np.inf)
NEG_INF = np.float32(-np.inf)
MT_EPS = np.float32(1e-7)  # == core.geom.EPS: oracle-parity of the hit test


# ---------------------------------------------------------------------------
# Host build
# ---------------------------------------------------------------------------


class BinnedScene:
    """HBM-resident cluster pool grouped into supernodes.

    tri9   (S+1, 9, GROUP*C) f32 : per-supernode triangle SoA rows
                                   [v0x v0y v0z e1x e1y e1z e2x e2y e2z],
                                   cluster-major columns.  Row S is the null
                                   supernode (degenerate tris, never hit).
    cbox   (S+1, GROUP, 6)   f32 : per-cluster AABBs (slab layout).
    sbox   (S, 6)            f32 : supernode AABBs (for the XLA cull).
    tri_ids ((S+1)*GROUP*C,) i32 : global tri ids, -1 padding.
    """

    def __init__(self, vertices, faces):
        vertices = np.asarray(vertices, np.float32)
        faces = np.asarray(faces, np.int64)
        _, ids, clo, chi = build_clusters(vertices, faces)
        nc = ids.shape[0]
        s = -(-nc // GROUP)
        ncp = s * GROUP
        c = CLUSTER

        def pad(a, fill):
            if a.shape[0] == ncp:
                return a
            return np.concatenate(
                [a, np.full((ncp - a.shape[0],) + a.shape[1:], fill, a.dtype)]
            )

        ids = pad(ids, -1)
        clo = pad(clo, np.inf)
        chi = pad(chi, -np.inf)

        # triangle SoA in cluster order (padding tris: v0=e1=e2=0 -> det==0)
        flat = ids.reshape(-1)
        ok = flat >= 0
        safe = np.where(ok, flat, 0)
        tv = vertices[faces[safe].reshape(-1)].reshape(-1, 3, 3)
        v0 = np.where(ok[:, None], tv[:, 0], 0.0)
        e1 = np.where(ok[:, None], tv[:, 1] - tv[:, 0], 0.0)
        e2 = np.where(ok[:, None], tv[:, 2] - tv[:, 0], 0.0)
        soa = np.concatenate([v0, e1, e2], axis=1).astype(np.float32)  # (T,9)
        tri9 = soa.reshape(s, GROUP * c, 9).transpose(0, 2, 1)  # (S,9,G*C)
        tri9 = np.concatenate(
            [tri9, np.zeros((1,) + tri9.shape[1:], np.float32)]
        )

        cbox = np.concatenate([clo, chi], axis=1).reshape(s, GROUP, 6)
        null_box = np.zeros((1, GROUP, 6), np.float32)
        null_box[:, :, 0:3] = np.inf
        null_box[:, :, 3:6] = -np.inf
        cbox = np.concatenate([cbox, null_box])

        slo = clo.reshape(s, GROUP, 3).min(1)
        shi = chi.reshape(s, GROUP, 3).max(1)
        self.num_supernodes = s
        self.tri9 = jnp.asarray(np.ascontiguousarray(tri9))
        self.cbox = jnp.asarray(cbox)
        self.sbox = jnp.asarray(
            np.concatenate([slo, shi], axis=1).astype(np.float32)
        )
        finite = np.isfinite(clo[:, 0])
        self.world_lo = jnp.asarray(clo[finite].min(0))
        self.world_hi = jnp.asarray(chi[finite].max(0))
        ids_p = np.concatenate([ids, np.full((GROUP, c), -1, np.int32)])
        self.tri_ids = jnp.asarray(ids_p.reshape(-1))


# ---------------------------------------------------------------------------
# Cull phase (pure XLA): conservative packet-frustum vs supernode AABBs
# ---------------------------------------------------------------------------


def packet_intervals(aug):
    """Per-packet conservative ray bounds over LIVE rays.

    aug: (P, 6, 2*BP).  A ray is live iff its window is non-empty
    (tmax > tmin); dead/padding rays are excluded from the hull so retired
    rays never widen the frustum.
    Returns dict of (P, 3) olo/ohi/dlo/dhi and (P,) tlo.
    """
    o = aug[:, 0:3, 0:BP]  # (P, 3, BP)
    d = aug[:, 0:3, BP:]
    tmin = aug[:, 4:5, 0:BP]  # (P, 1, BP)
    tmax = aug[:, 5:6, 0:BP]
    live = tmax > tmin  # (P, 1, BP)
    big = F32(3e38)
    olo = jnp.min(jnp.where(live, o, big), axis=2)
    ohi = jnp.max(jnp.where(live, o, -big), axis=2)
    dlo = jnp.min(jnp.where(live, d, big), axis=2)
    dhi = jnp.max(jnp.where(live, d, -big), axis=2)
    tlo = jnp.min(jnp.where(live[:, 0], tmin[:, 0], big), axis=1)
    any_live = jnp.any(live[:, 0], axis=1)
    return {
        "olo": olo, "ohi": ohi, "dlo": dlo, "dhi": dhi, "tlo": tlo,
        "any_live": any_live,
    }


def _axis_interval(blo, bhi, olo, ohi, dlo, dhi):
    """Conservative per-axis [entry_lb, exit_ub] of box slab vs ray bundle.

    blo/bhi: (S,) box planes; o/d bounds: (P, 1).  Returns (P, S) pair.
    Mixed-sign direction intervals contribute (-inf, +inf) (no constraint),
    which is conservative: the cull may only ever overestimate overlap.
    """
    pos = dlo > 0
    neg = dhi < 0
    # positive branch
    rlo_p = F32(1.0) / jnp.where(pos, dlo, F32(1.0))
    rhi_p = F32(1.0) / jnp.where(pos, dhi, F32(1.0))
    nlo_p = blo - ohi  # (P, S)
    nhi_p = bhi - olo
    ent_p = jnp.minimum(nlo_p * rlo_p, nlo_p * rhi_p)
    ext_p = jnp.maximum(nhi_p * rlo_p, nhi_p * rhi_p)
    # negative branch (march from bhi side with |d|)
    rlo_n = F32(1.0) / jnp.where(neg, -dhi, F32(1.0))
    rhi_n = F32(1.0) / jnp.where(neg, -dlo, F32(1.0))
    nlo_n = olo - bhi
    nhi_n = ohi - blo
    ent_n = jnp.minimum(nlo_n * rlo_n, nlo_n * rhi_n)
    ext_n = jnp.maximum(nhi_n * rlo_n, nhi_n * rhi_n)
    ent = jnp.where(pos, ent_p, jnp.where(neg, ent_n, -INF))
    ext = jnp.where(pos, ext_p, jnp.where(neg, ext_n, INF))
    return ent, ext


def supernode_entries(ivals, sbox):
    """Conservative (P, S) entry lower-bounds; +inf where provably disjoint.

    Any ray in the packet that could intersect the supernode within its
    window yields entry <= that ray's true entry t (conservative ordering).
    """
    ents = []
    exts = []
    for a in range(3):
        ent, ext = _axis_interval(
            sbox[None, :, a], sbox[None, :, 3 + a],
            ivals["olo"][:, a:a + 1], ivals["ohi"][:, a:a + 1],
            ivals["dlo"][:, a:a + 1], ivals["dhi"][:, a:a + 1],
        )
        ents.append(ent)
        exts.append(ext)
    entry = jnp.maximum(
        jnp.maximum(ents[0], ents[1]),
        jnp.maximum(ents[2], ivals["tlo"][:, None]),
    )
    exit_ = jnp.minimum(jnp.minimum(exts[0], exts[1]), exts[2])
    hit = (entry <= exit_) & ivals["any_live"][:, None]
    return jnp.where(hit, entry, INF)


# ---------------------------------------------------------------------------
# Visit kernels (Pallas): gated VPU Moller-Trumbore, scratch accumulators
# ---------------------------------------------------------------------------


def _visit_rows(rays_ref):
    r = rays_ref[0]  # (6, 2*BP)
    p = BP
    o3 = (r[0:1, 0:p], r[1:2, 0:p], r[2:3, 0:p])
    d3 = (r[0:1, p:], r[1:2, p:], r[2:3, p:])
    tmin = r[4:5, 0:p]
    tmax = r[5:6, 0:p]
    eps = F32(1e-12)
    inv = tuple(
        F32(1.0) / jnp.where(jnp.abs(c) > eps, c, eps) for c in d3
    )
    return o3, d3, inv, tmin, tmax


def _mt_cluster(tri_ref, k, o3, d3):
    """Moller-Trumbore of cluster k's C tris vs the packet — SAME formula as
    core.geom.moller_trumbore (f32, EPS 1e-7): oracle parity is structural.

    Returns (t (C,BP) with +inf misses before windowing, u-v unused).
    """
    c = CLUSTER
    s = k * c
    t9 = tri_ref[0]  # (9, GROUP*C)

    def col(r):
        return t9[r, s:s + c].reshape(c, 1)

    v0x, v0y, v0z = col(0), col(1), col(2)
    e1x, e1y, e1z = col(3), col(4), col(5)
    e2x, e2y, e2z = col(6), col(7), col(8)
    ox, oy, oz = o3
    dx, dy, dz = d3
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    ok = jnp.abs(det) > MT_EPS
    inv_det = F32(1.0) / jnp.where(ok, det, F32(1.0))
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    ok = ok & (u >= F32(0)) & (v >= F32(0)) & (u + v <= F32(1))
    return jnp.where(ok, t, INF)


def _nearest_kernel(pkt_ref, sn_ref, mask_ref, first_ref, last_ref,
                    rays_ref, tri_ref, in_t_ref, in_code_ref,
                    out_t_ref, out_code_ref, acc_t, acc_code):
    v = pl.program_id(0)
    c = CLUSTER

    @pl.when(first_ref[v] != 0)
    def _():
        acc_t[...] = in_t_ref[0]
        acc_code[...] = in_code_ref[0]

    mask = mask_ref[v]  # XLA-precomputed cluster bitmask: SMEM scalar read

    @pl.when(mask != 0)
    def _():
        o3, d3, _, tmin, _ = _visit_rows(rays_ref)
        sn = sn_ref[v]
        row = jax.lax.broadcasted_iota(jnp.int32, (c, BP), 0)
        for k in range(GROUP):
            @pl.when((mask & (1 << k)) != 0)
            def _(k=k):
                tm = _mt_cluster(tri_ref, k, o3, d3)
                cur = acc_t[...]
                tm = jnp.where((tm >= tmin) & (tm < cur), tm, INF)
                trow = jnp.min(tm, axis=0, keepdims=True)  # (1, BP)
                improved = trow < cur
                jsel = jnp.min(
                    jnp.where(tm == trow, row, jnp.int32(c)),
                    axis=0, keepdims=True,
                )
                code = (sn * GROUP + k) * c + jsel
                acc_t[...] = jnp.where(improved, trow, cur)
                acc_code[...] = jnp.where(improved, code, acc_code[...])

    @pl.when(last_ref[v] != 0)
    def _():
        out_t_ref[0] = acc_t[...]
        out_code_ref[0] = acc_code[...]


def _anyhit_kernel(pkt_ref, sn_ref, mask_ref, first_ref, last_ref,
                   rays_ref, tri_ref, in_occ_ref,
                   out_occ_ref, acc_occ):
    v = pl.program_id(0)

    @pl.when(first_ref[v] != 0)
    def _():
        acc_occ[...] = in_occ_ref[0]

    mask = mask_ref[v]

    @pl.when(mask != 0)
    def _():
        o3, d3, _, tmin, tmax = _visit_rows(rays_ref)
        for k in range(GROUP):
            @pl.when((mask & (1 << k)) != 0)
            def _(k=k):
                tm = _mt_cluster(tri_ref, k, o3, d3)
                occ = acc_occ[...]
                win = jnp.where(occ != 0, F32(0.0), tmax)
                hit = (tm > tmin) & (tm < win)
                acc_occ[...] = occ | jnp.any(
                    hit, axis=0, keepdims=True
                ).astype(jnp.int32)

    @pl.when(last_ref[v] != 0)
    def _():
        out_occ_ref[0] = acc_occ[...]


def _visit_specs(tri9):
    ray_spec = pl.BlockSpec(
        (1, 6, 2 * BP), lambda v, pr, sr, mr, fr, lr: (pr[v], 0, 0),
        memory_space=pltpu.VMEM,
    )
    tri_spec = pl.BlockSpec(
        (1,) + tri9.shape[1:], lambda v, pr, sr, mr, fr, lr: (sr[v], 0, 0),
        memory_space=pltpu.VMEM,
    )
    pkt_spec = pl.BlockSpec(
        (1, 1, BP), lambda v, pr, sr, mr, fr, lr: (pr[v], 0, 0),
        memory_space=pltpu.VMEM,
    )
    return ray_spec, tri_spec, pkt_spec


@functools.partial(jax.jit, static_argnames=("interpret",))
def _nearest_visits(pkt_of, sn_of, cmask, first, last, rays_aug, tri9,
                    best_t, best_code, interpret):
    """Run one band of visits; returns updated (best_t, best_code) blocks."""
    p = rays_aug.shape[0]
    nv = pkt_of.shape[0]
    ray_spec, tri_spec, pkt_spec = _visit_specs(tri9)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nv,),
        in_specs=[ray_spec, tri_spec, pkt_spec, pkt_spec],
        out_specs=[pkt_spec, pkt_spec],
        scratch_shapes=[
            pltpu.VMEM((1, BP), jnp.float32),
            pltpu.VMEM((1, BP), jnp.int32),
        ],
    )
    return pl.pallas_call(
        _nearest_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((p, 1, BP), jnp.float32),
            jax.ShapeDtypeStruct((p, 1, BP), jnp.int32),
        ],
        interpret=interpret,
    )(pkt_of, sn_of, cmask, first, last, rays_aug, tri9, best_t, best_code)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _anyhit_visits(pkt_of, sn_of, cmask, first, last, rays_aug, tri9, occ,
                   interpret):
    p = rays_aug.shape[0]
    nv = pkt_of.shape[0]
    ray_spec, tri_spec, pkt_spec = _visit_specs(tri9)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nv,),
        in_specs=[ray_spec, tri_spec, pkt_spec],
        out_specs=pkt_spec,
        scratch_shapes=[pltpu.VMEM((1, BP), jnp.int32)],
    )
    return pl.pallas_call(
        _anyhit_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((p, 1, BP), jnp.int32),
        interpret=interpret,
    )(pkt_of, sn_of, cmask, first, last, rays_aug, tri9, occ)


# ---------------------------------------------------------------------------
# Chase loop: band selection + visits until the commit invariant holds
# ---------------------------------------------------------------------------


def cluster_masks(ivals, cbox, sn, upper):
    """Conservative per-visit cluster bitmasks, computed VECTORIZED in XLA.

    The kernel's per-visit gate is then a free SMEM scalar read instead of a
    ~1.3 us vector->scalar reduction.  sn (P, K) selected supernodes; returns
    (P, K) int32 bitmasks (bit g = packet frustum overlaps cluster g).
    """
    boxes = cbox[sn]  # (P, K, GROUP, 6)
    ents = []
    exts = []
    for a in range(3):
        ent, ext = _axis_interval(
            boxes[..., a].reshape(sn.shape[0], -1),
            boxes[..., 3 + a].reshape(sn.shape[0], -1),
            ivals["olo"][:, a:a + 1], ivals["ohi"][:, a:a + 1],
            ivals["dlo"][:, a:a + 1], ivals["dhi"][:, a:a + 1],
        )
        ents.append(ent)
        exts.append(ext)
    entry = jnp.maximum(
        jnp.maximum(ents[0], ents[1]),
        jnp.maximum(ents[2], ivals["tlo"][:, None]),
    )
    exit_ = jnp.minimum(jnp.minimum(exts[0], exts[1]), exts[2])
    hit = (entry <= exit_) & (entry < upper[:, None])
    hit = hit & ivals["any_live"][:, None]
    bits = hit.reshape(sn.shape[0], sn.shape[1], GROUP).astype(jnp.int32)
    weights = (1 << jnp.arange(GROUP, dtype=jnp.int32)).reshape(1, 1, GROUP)
    return jnp.sum(bits * weights, axis=-1)  # (P, K)


def _sorted_order(entry, k):
    """Front-to-back supernode order per packet, padded so every K-slice is
    in range.  Sorted ONCE per trace pass; bands are then just slices."""
    p, s = entry.shape
    order = jnp.argsort(entry, axis=1).astype(jnp.int32)
    ent_sorted = jnp.take_along_axis(entry, order, axis=1)
    pad = (-s) % k + k
    order = jnp.pad(order, ((0, 0), (0, pad)), constant_values=0)
    ent_sorted = jnp.pad(
        ent_sorted, ((0, 0), (0, pad)), constant_values=INF
    )
    return order, ent_sorted


def _visit_flags(p, k):
    pkt_of = jnp.repeat(jnp.arange(p, dtype=jnp.int32), k)
    first = jnp.tile(
        (jnp.arange(k, dtype=jnp.int32) == 0).astype(jnp.int32), p
    )
    last = jnp.tile(
        (jnp.arange(k, dtype=jnp.int32) == k - 1).astype(jnp.int32), p
    )
    return pkt_of, first, last


def _phase_sizes(p, k, s):
    """Cascade of (packets, band width) pairs: the grid shrinks 4x per phase
    as rays retire, so tail rounds (one stubborn packet marching the whole
    scene) run on tiny grids instead of flooding P*K null steps per round."""
    sizes = []
    cur = p
    kk = k
    while True:
        sizes.append((cur, min(kk, max(s, 1))))
        if cur == 1:
            break
        cur = max(cur // 4, 1)
        kk = min(kk * 2, 32)
    return tuple(sizes)


def _phase_nearest(tri9, cbox, sbox, state, p_sub, k, cap_next, last_phase,
                   interpret):
    """Chase rounds over the first p_sub packets until the commit invariant
    holds there, or until few enough rays remain for the next (smaller)
    phase.  Returns the state with best/ t_front updated."""
    o, d, t_front, best_t, best_code, idx = state
    s = sbox.shape[0]
    s_null = tri9.shape[0] - 1
    nsub = p_sub * BP
    aug, _ = _rays_to_aug(
        o[:nsub], d[:nsub], t_front[:nsub], best_t[:nsub]
    )
    ivals = packet_intervals(aug)
    entry = supernode_entries(ivals, sbox)  # (p_sub, S)
    order, ent_sorted = _sorted_order(entry, k)
    pkt_of, first, last = _visit_flags(p_sub, k)
    bt = best_t[:nsub].reshape(p_sub, 1, BP)
    bc = best_code[:nsub].reshape(p_sub, 1, BP)
    tf = t_front[:nsub].reshape(p_sub, 1, BP)

    def nxt_of(r):
        v = jax.lax.dynamic_slice_in_dim(
            ent_sorted, jnp.minimum(r * k, s - 1), 1, axis=1
        )[:, 0]
        return jnp.where(r * k < s, v, INF)

    def upper_of(bt):
        return jnp.max(bt[:, 0], axis=1)  # (p_sub,)

    def live_of(bt, r):
        nxt = nxt_of(r)
        # per-ray: done once no unprocessed supernode can beat its best
        ray_live = (bt > jnp.maximum(nxt[:, None, None], tf)).sum()
        work = jnp.any(nxt < upper_of(bt))
        keep = last_phase | (ray_live > cap_next)
        return work & keep

    def cond(carry):
        return carry[3]

    def body(carry):
        bt, bc, r, _ = carry
        sn = jax.lax.dynamic_slice_in_dim(order, r * k, k, axis=1)
        ent = jax.lax.dynamic_slice_in_dim(ent_sorted, r * k, k, axis=1)
        upper = upper_of(bt)
        valid = ent < upper[:, None]
        snv = jnp.where(valid, sn, s_null)
        cmask = jnp.where(
            valid, cluster_masks(ivals, cbox, snv, upper), 0
        ).reshape(-1)
        bt, bc = _nearest_visits(
            pkt_of, snv.reshape(-1), cmask, first, last, aug, tri9,
            bt, bc, interpret,
        )
        r = r + 1
        return bt, bc, r, live_of(bt, r)

    r0 = jnp.int32(0)
    bt, bc, r, _ = jax.lax.while_loop(
        cond, body, (bt, bc, r0, live_of(bt, r0))
    )
    # advance every ray's processed-front to the min unprocessed entry
    nxt = nxt_of(r)
    tf_new = jnp.maximum(tf, nxt[:, None, None]).reshape(-1)
    t_front = t_front.at[:nsub].set(tf_new)
    best_t = best_t.at[:nsub].set(bt.reshape(-1))
    best_code = best_code.at[:nsub].set(bc.reshape(-1))
    return (o, d, t_front, best_t, best_code, idx)


def _phase_anyhit(tri9, cbox, sbox, state, p_sub, k, cap_next, last_phase,
                  interpret):
    o, d, t_front, tmax_eff, occ_flat, idx = state
    s = sbox.shape[0]
    s_null = tri9.shape[0] - 1
    nsub = p_sub * BP
    # occluded rays carry an empty window so they leave the frustum hull
    win = jnp.where(occ_flat[:nsub] != 0, F32(0.0), tmax_eff[:nsub])
    aug, _ = _rays_to_aug(o[:nsub], d[:nsub], t_front[:nsub], win)
    ivals = packet_intervals(aug)
    entry = supernode_entries(ivals, sbox)
    order, ent_sorted = _sorted_order(entry, k)
    pkt_of, first, last = _visit_flags(p_sub, k)
    occ = occ_flat[:nsub].reshape(p_sub, 1, BP)
    winb = win.reshape(p_sub, 1, BP)
    tfb = t_front[:nsub].reshape(p_sub, 1, BP)

    def nxt_of(r):
        v = jax.lax.dynamic_slice_in_dim(
            ent_sorted, jnp.minimum(r * k, s - 1), 1, axis=1
        )[:, 0]
        return jnp.where(r * k < s, v, INF)

    def upper_of(occ):
        w = jnp.where(occ[:, 0] != 0, F32(0.0), winb[:, 0])
        return jnp.max(w, axis=1)

    def live_of(occ, r):
        nxt = nxt_of(r)
        w = jnp.where(occ != 0, F32(0.0), winb)
        ray_live = (w > jnp.maximum(nxt[:, None, None], tfb)).sum()
        work = jnp.any(nxt < upper_of(occ))
        keep = last_phase | (ray_live > cap_next)
        return work & keep

    def cond(carry):
        return carry[2]

    def body(carry):
        occ, r, _ = carry
        sn = jax.lax.dynamic_slice_in_dim(order, r * k, k, axis=1)
        ent = jax.lax.dynamic_slice_in_dim(ent_sorted, r * k, k, axis=1)
        upper = upper_of(occ)
        valid = ent < upper[:, None]
        snv = jnp.where(valid, sn, s_null)
        cmask = jnp.where(
            valid, cluster_masks(ivals, cbox, snv, upper), 0
        ).reshape(-1)
        occ = _anyhit_visits(
            pkt_of, snv.reshape(-1), cmask, first, last, aug, tri9, occ,
            interpret,
        )
        r = r + 1
        return occ, r, live_of(occ, r)

    r0 = jnp.int32(0)
    occ, r, _ = jax.lax.while_loop(cond, body, (occ, r0, live_of(occ, r0)))
    nxt = nxt_of(r)
    tf_new = jnp.maximum(tfb, nxt[:, None, None]).reshape(-1)
    t_front = t_front.at[:nsub].set(tf_new)
    occ_flat = occ_flat.at[:nsub].set(occ.reshape(-1))
    return (o, d, t_front, tmax_eff, occ_flat, idx)


def _compact(state, done):
    """Stable-partition rays: live first.  Keeps the coherence order of the
    live set (the initial Morton/octant sort) intact."""
    perm = jnp.argsort(done, stable=True)
    return tuple(a[perm] for a in state)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _binned_nearest(scene_arrays, o, d, tmin, tmax_eff, k, interpret):
    """Flat in, flat out (input ray order); len(o) % BP == 0."""
    tri9, cbox, sbox = scene_arrays
    npad = o.shape[0]
    p = npad // BP
    best_t = tmax_eff
    best_code = jnp.full(npad, -1, jnp.int32)
    idx = jnp.arange(npad, dtype=jnp.int32)
    state = (o, d, tmin, best_t, best_code, idx)
    sizes = _phase_sizes(p, k, sbox.shape[0])
    for i, (p_sub, kk) in enumerate(sizes):
        last_phase = i == len(sizes) - 1
        cap_next = 0 if last_phase else sizes[i + 1][0] * BP
        state = _phase_nearest(
            tri9, cbox, sbox, state, p_sub, kk, cap_next, last_phase,
            interpret,
        )
        if not last_phase:
            _, _, t_front, best_t, _, _ = state
            done = (best_t <= t_front).astype(jnp.int32)
            state = _compact(state, done)
    _, _, _, best_t, best_code, idx = state
    bt = jnp.zeros(npad, jnp.float32).at[idx].set(best_t)
    bc = jnp.zeros(npad, jnp.int32).at[idx].set(best_code)
    return bt, bc


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _binned_anyhit(scene_arrays, o, d, tmin, tmax_eff, k, interpret):
    tri9, cbox, sbox = scene_arrays
    npad = o.shape[0]
    p = npad // BP
    occ = jnp.zeros(npad, jnp.int32)
    idx = jnp.arange(npad, dtype=jnp.int32)
    state = (o, d, tmin, tmax_eff, occ, idx)
    sizes = _phase_sizes(p, k, sbox.shape[0])
    for i, (p_sub, kk) in enumerate(sizes):
        last_phase = i == len(sizes) - 1
        cap_next = 0 if last_phase else sizes[i + 1][0] * BP
        state = _phase_anyhit(
            tri9, cbox, sbox, state, p_sub, kk, cap_next, last_phase,
            interpret,
        )
        if not last_phase:
            _, _, t_front, tmx, occ_f, _ = state
            live = (occ_f == 0) & (tmx > t_front)
            state = _compact(state, (~live).astype(jnp.int32))
    _, _, _, _, occ, idx = state
    return jnp.zeros(npad, jnp.int32).at[idx].set(occ)


# ---------------------------------------------------------------------------
# Wavefront coherence sort
# ---------------------------------------------------------------------------


def _spread3(v):
    """Spread 10 bits to every 3rd bit (int32, vectorized jnp)."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x30000FF
    v = (v | (v << 8)) & 0x300F00F
    v = (v | (v << 4)) & 0x30C30C3
    v = (v | (v << 2)) & 0x9249249
    return v


def sort_key(o, d, tmin, tmax, world_lo, world_hi):
    """Coherence key: Morton code of the origin (scene-normalized) with the
    direction octant in the low bits; dead rays sort last.

    The reference gets ray coherence for free from its recursive CPU
    traversal; wavefront tracing must re-create it — scrambled secondary
    rays make packet frustums cover the whole scene and the chase loop
    degenerate (SURVEY.md §7.3 #1 ray-locality).
    """
    # Key (30 bits): octant (3) | origin morton (27).  Group count must stay
    # comparable to the packet count — finer direction bins fragment rays
    # into tiny groups, packets then span many groups with mixed direction
    # signs, and the conservative frustum degenerates to the whole scene
    # (measured: 128-bin cube-map keys made candidates WORSE, p50 245->2561).
    ext = jnp.maximum(world_hi - world_lo, F32(1e-12))
    q = jnp.clip(
        ((o - world_lo) / ext * F32(511.0)).astype(jnp.int32), 0, 511
    )
    morton = (
        _spread3(q[:, 0]) | (_spread3(q[:, 1]) << 1)
        | (_spread3(q[:, 2]) << 2)
    )
    octant = (
        (d[:, 0] < 0).astype(jnp.int32)
        | ((d[:, 1] < 0).astype(jnp.int32) << 1)
        | ((d[:, 2] < 0).astype(jnp.int32) << 2)
    )
    key = (octant << 27) | morton
    dead = tmax <= tmin
    return jnp.where(dead, jnp.int32(2**31 - 1), key)


# ---------------------------------------------------------------------------
# Intersector
# ---------------------------------------------------------------------------


@register_intersector_pytree(
    leaves=("tri9", "cbox", "sbox", "tri_ids", "world_lo", "world_hi",
            "v0", "e1", "e2"),
    aux=("k", "sort", "interpret"),
)
class BinnedIntersector:
    """Scene-global binned cull+visit tracer (single-chip fast path).

    k: supernode band width per chase round (static; correctness does not
    depend on it — the while_loop chases until the commit invariant holds).
    sort: re-pack the wavefront by (origin Morton, direction octant) before
    tracing — results are identical (counter RNG keys on pixel id), only
    packet coherence changes.
    """

    def __init__(self, scene, k=4, sort=True, interpret=None):
        b = BinnedScene(np.asarray(scene.vertices), np.asarray(scene.faces))
        self.tri9 = b.tri9
        self.cbox = b.cbox
        self.sbox = b.sbox
        self.tri_ids = b.tri_ids
        self.world_lo = b.world_lo
        self.world_hi = b.world_hi
        self.v0, self.e1, self.e2 = tri_soa_from_scene(scene)
        self.k = min(k, b.num_supernodes)
        self.sort = sort
        self.interpret = (
            common.use_interpret() if interpret is None else interpret
        )

    def _perm(self, o, d, tmin, tmax):
        if not self.sort:
            return None
        key = sort_key(o, d, tmin, tmax, self.world_lo, self.world_hi)
        return jnp.argsort(key, stable=True)

    def _clamp_exit(self, o, d, tmin, tmax):
        """Clamp each ray's window to its world-AABB exit: geometry cannot
        lie beyond the scene hull, so escaping rays retire the moment their
        processed front passes the hull (huge for bounce-ray tails)."""
        eps = F32(1e-12)
        inv = F32(1.0) / jnp.where(jnp.abs(d) > eps, d, eps)
        t0 = (self.world_lo[None] - o) * inv
        t1 = (self.world_hi[None] - o) * inv
        t_exit = jnp.min(jnp.maximum(t0, t1), axis=1)
        t_enter = jnp.max(jnp.minimum(t0, t1), axis=1)
        # relative + absolute slack: never clip a true boundary hit
        lim = t_exit * F32(1.0 + 1e-4) + F32(1e-4)
        hit_box = (t_enter <= t_exit) & (t_exit > 0)
        return jnp.minimum(tmax, jnp.where(hit_box, lim, F32(0.0)))

    def _pad_flat(self, o, d, tmin, tmax):
        n = o.shape[0]
        npad = common.round_up(max(n, BP), BP)
        o = common.pad_to(o, npad)
        d = common.pad_to(d, npad, value=1.0)
        tmin = common.pad_to(tmin, npad, value=1.0)
        tmax = common.pad_to(tmax, npad, value=0.0)  # empty: never hits
        return o, d, tmin, tmax

    def _run_nearest(self, o_, d_, tmin_, tmax_):
        return _binned_nearest(
            (self.tri9, self.cbox, self.sbox), o_, d_, tmin_, tmax_,
            self.k, self.interpret,
        )

    def _run_anyhit(self, o_, d_, tmin_, tmax_):
        return _binned_anyhit(
            (self.tri9, self.cbox, self.sbox), o_, d_, tmin_, tmax_,
            self.k, self.interpret,
        )

    def intersect(self, o, d, tmin, tmax):
        n = o.shape[0]
        tmax_eff = self._clamp_exit(o, d, tmin, tmax)
        o_, d_, tmin_, tmax_ = self._pad_flat(o, d, tmin, tmax_eff)
        perm = self._perm(o_, d_, tmin_, tmax_)
        if perm is not None:
            o_, d_, tmin_, tmax_ = o_[perm], d_[perm], tmin_[perm], tmax_[perm]
        bt, bc = self._run_nearest(o_, d_, tmin_, tmax_)
        if perm is not None:
            bt = jnp.zeros_like(bt).at[perm].set(bt)
            bc = jnp.zeros_like(bc).at[perm].set(bc)
        bt, bc = bt[:n], bc[:n]
        prim = jnp.where(bc >= 0, self.tri_ids[jnp.maximum(bc, 0)], -1)
        t, u, v, valid = attrs_for_prims(
            self.v0, self.e1, self.e2, prim, o, d, bt, tmax
        )
        return Hits(
            t=jnp.where(valid, t, tmax), prim=prim.astype(jnp.int32),
            u=u, v=v, valid=valid,
        )

    def occluded(self, o, d, tmax):
        n = o.shape[0]
        tmin = jnp.zeros_like(tmax)
        tmax_eff = self._clamp_exit(o, d, tmin, tmax)
        o_, d_, tmin_, tmax_ = self._pad_flat(o, d, tmin, tmax_eff)
        perm = self._perm(o_, d_, tmin_, tmax_)
        if perm is not None:
            o_, d_, tmin_, tmax_ = o_[perm], d_[perm], tmin_[perm], tmax_[perm]
        occ = self._run_anyhit(o_, d_, tmin_, tmax_)
        if perm is not None:
            occ = jnp.zeros_like(occ).at[perm].set(occ)
        return occ[:n] != 0
