"""Sorted visit-sweep tracer — round-3 single-chip fast path.

Supersedes the binned cascade (kernels/binned.py) for full path-traced frames.
Same measured foundations (visit kernel with pipelined grid steps, XLA cull,
coherence sort), different orchestration, fixing the two r2 regressions
(VERDICT r2: 3.1x slower e2e than the routed path, 207s compile):

  binned cascade (r2)                     sweep (r3)
  -------------------------------------   --------------------------------
  7 python-unrolled phases, each with     ONE pallas instantiation per
  its own pallas instantiation, its own   kernel type; ONE argsort per
  (P,S) entry argsort and packet          trace call; a lax.while_loop
  compaction argsort                      runs visit CHUNKS until done
  uniform (P_sub, K) visit bands — a      per-packet CURSOR into its own
  stubborn packet forces whole-grid       front-to-back supernode list;
  rounds                                  chunks pack exactly the live
                                          visits (searchsorted assembly,
                                          no scatter, no re-sort)
  per-phase re-derived intervals          intervals + entries + order
                                          computed once per call

Visit economics (measured, kernels/binned.py header): a visit costs
~0.25us step floor + ~1.4us per frustum-gated cluster of 128 tris; the
sweep's job is purely to MINIMIZE VISITS: (1) rays sorted by (origin
Morton | direction octant) so 128-ray packets have tight frustums,
(2) first iteration visits only the band0 nearest supernodes per packet
(best-t then collapses), (3) re-cull between chunks with the tightened
per-packet upper bound, (4) windows clamped to the world-AABB exit so
escaping rays retire immediately.

Commit-invariant safety (SURVEY.md §3.3): a supernode is skipped forever
only when its conservative packet-entry >= the packet's max best-t at
skip time; entries only lower-bound per-ray entries and best-t never
increases, so a skipped supernode can never beat any ray's committed hit.

Reference behavior covered: R3/R4 (accel + front-to-back domain walk),
R6/R7 (speculative batched trace + min-commit) at supernode granularity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.pytree import register_intersector_pytree
from . import common
from .binned import (
    BP,
    BinnedIntersector,
    INF,
    F32,
    _anyhit_visits,
    _nearest_visits,
    _rays_to_aug,
    cluster_masks,
    packet_intervals,
    supernode_entries,
)


def _chunk_assemble(counts, cursor, order, ent_sorted, v_cap, s_null):
    """Pack the next <= v_cap live visits into flat arrays, packet-major.

    counts: (P,) visits each packet still owes (already upper-culled);
    cursor: (P,) columns of `order` consumed so far.  Returns
    (pkt, sn, ent, first, last, taken) where taken (P,) is how many visits
    of each packet this chunk contains.  No scatter: slot -> packet is a
    searchsorted over the cumsum, slot -> column is cursor + local rank.
    """
    p = counts.shape[0]
    cum = jnp.cumsum(counts)  # (P,)
    total = cum[-1]
    slots = jnp.arange(v_cap, dtype=jnp.int32)
    valid = slots < jnp.minimum(total, v_cap)
    # clamp into the last valid slot so the padded tail extends the final
    # packet's run with null visits (no spurious scratch init/flush)
    slot_c = jnp.minimum(slots, jnp.maximum(total - 1, 0))
    pkt = jnp.searchsorted(cum, slot_c, side="right").astype(jnp.int32)
    pkt = jnp.minimum(pkt, p - 1)
    base = cum[pkt] - counts[pkt]  # global slot where this packet's run starts
    col = cursor[pkt] + (slot_c - base)
    col = jnp.clip(col, 0, order.shape[1] - 1)
    sn = jnp.where(valid, order[pkt, col], s_null)
    ent = jnp.where(valid, ent_sorted[pkt, col], INF)
    prev = jnp.concatenate([pkt[:1] - 1, pkt[:-1]])
    nxt = jnp.concatenate([pkt[1:], pkt[-1:] + 1])
    first = (pkt != prev).astype(jnp.int32)
    last = (pkt != nxt).astype(jnp.int32)
    taken = jnp.clip(jnp.minimum(cum, v_cap) - (cum - counts), 0, counts)
    return pkt, sn, ent, first, last, taken


def _visit_masks(ivals, cbox, pkt, sn, upper):
    """Per-visit cluster bitmasks: rows of `cluster_masks` must align with the
    frustum intervals, so gather the visit's packet intervals first."""
    ivals_v = {k: v[pkt] for k, v in ivals.items()}
    return cluster_masks(ivals_v, cbox, sn[:, None], upper[pkt])[:, 0]


def _avail_counts(ent_sorted, cursor, upper):
    """(P,) visits with entry below the packet's upper bound, cursor-adjusted.

    ent_sorted rows are ascending, so the count of useful columns is a
    vectorized compare+sum; columns already consumed never recount.
    """
    below = jnp.sum(ent_sorted < upper[:, None], axis=1).astype(jnp.int32)
    return jnp.maximum(below - cursor, 0)


@functools.partial(jax.jit, static_argnames=("band0", "v_cap", "interpret"))
def _sweep_nearest(scene_arrays, o, d, tmin, tmax_eff, band0, v_cap,
                   interpret):
    """Flat in, flat out (input ray order); len(o) % BP == 0."""
    tri9, cbox, sbox = scene_arrays
    npad = o.shape[0]
    p = npad // BP
    s_null = tri9.shape[0] - 1
    aug, _ = _rays_to_aug(o, d, tmin, tmax_eff)
    ivals = packet_intervals(aug)
    entry = supernode_entries(ivals, sbox)  # (P, S)
    order = jnp.argsort(entry, axis=1).astype(jnp.int32)
    ent_sorted = jnp.take_along_axis(entry, order, axis=1)

    bt = tmax_eff.reshape(p, 1, BP)
    bc = jnp.full((p, 1, BP), -1, jnp.int32)
    cursor = jnp.zeros(p, jnp.int32)

    def upper_of(bt):
        return jnp.max(bt[:, 0], axis=1)  # (P,)

    def run_chunk(bt, bc, cursor, counts):
        pkt, sn, ent, first, last, taken = _chunk_assemble(
            counts, cursor, order, ent_sorted, v_cap, s_null
        )
        live = sn != s_null
        cmask = jnp.where(
            live, _visit_masks(ivals, cbox, pkt, sn, upper_of(bt)), 0
        )
        bt2, bc2 = _nearest_visits(
            pkt, sn, cmask, first, last, aug, tri9, bt, bc, interpret
        )
        visited = (taken > 0)[:, None, None]
        bt = jnp.where(visited, bt2, bt)
        bc = jnp.where(visited, bc2, bc)
        return bt, bc, cursor + taken

    # iteration 0: nearest band only — cheap best-t collapse before the
    # re-culled main sweep
    counts0 = jnp.minimum(_avail_counts(ent_sorted, cursor, upper_of(bt)),
                          band0)
    bt, bc, cursor = run_chunk(bt, bc, cursor, counts0)

    def cond(carry):
        bt, bc, cursor, counts = carry
        return jnp.sum(counts) > 0

    def body(carry):
        bt, bc, cursor, counts = carry
        bt, bc, cursor = run_chunk(bt, bc, cursor, counts)
        counts = _avail_counts(ent_sorted, cursor, upper_of(bt))
        return bt, bc, cursor, counts

    counts = _avail_counts(ent_sorted, cursor, upper_of(bt))
    bt, bc, _, _ = jax.lax.while_loop(cond, body, (bt, bc, cursor, counts))
    return bt.reshape(-1), bc.reshape(-1)


@functools.partial(jax.jit, static_argnames=("band0", "v_cap", "interpret"))
def _sweep_anyhit(scene_arrays, o, d, tmin, tmax_eff, band0, v_cap,
                  interpret):
    tri9, cbox, sbox = scene_arrays
    npad = o.shape[0]
    p = npad // BP
    s_null = tri9.shape[0] - 1
    aug, _ = _rays_to_aug(o, d, tmin, tmax_eff)
    ivals = packet_intervals(aug)
    entry = supernode_entries(ivals, sbox)
    order = jnp.argsort(entry, axis=1).astype(jnp.int32)
    ent_sorted = jnp.take_along_axis(entry, order, axis=1)

    occ = jnp.zeros((p, 1, BP), jnp.int32)
    win = tmax_eff.reshape(p, 1, BP)
    cursor = jnp.zeros(p, jnp.int32)

    def upper_of(occ):
        return jnp.max(jnp.where(occ[:, 0] != 0, F32(0.0), win[:, 0]), axis=1)

    def run_chunk(occ, cursor, counts):
        pkt, sn, ent, first, last, taken = _chunk_assemble(
            counts, cursor, order, ent_sorted, v_cap, s_null
        )
        live = sn != s_null
        cmask = jnp.where(
            live, _visit_masks(ivals, cbox, pkt, sn, upper_of(occ)), 0
        )
        occ2 = _anyhit_visits(
            pkt, sn, cmask, first, last, aug, tri9, occ, interpret
        )
        occ = jnp.where((taken > 0)[:, None, None], occ2, occ)
        return occ, cursor + taken

    counts0 = jnp.minimum(_avail_counts(ent_sorted, cursor, upper_of(occ)),
                          band0)
    occ, cursor = run_chunk(occ, cursor, counts0)

    def cond(carry):
        occ, cursor, counts = carry
        return jnp.sum(counts) > 0

    def body(carry):
        occ, cursor, counts = carry
        occ, cursor = run_chunk(occ, cursor, counts)
        counts = _avail_counts(ent_sorted, cursor, upper_of(occ))
        return occ, cursor, counts

    counts = _avail_counts(ent_sorted, cursor, upper_of(occ))
    occ, _, _ = jax.lax.while_loop(cond, body, (occ, cursor, counts))
    return occ.reshape(-1)


@register_intersector_pytree(
    leaves=("tri9", "cbox", "sbox", "tri_ids", "world_lo", "world_hi",
            "v0", "e1", "e2"),
    aux=("band0", "v_cap_per_pkt", "sort", "interpret"),
)
class SweepIntersector(BinnedIntersector):
    """Drop-in intersector over the sorted visit sweep.

    band0: supernodes visited per packet in the collapse iteration.
    v_cap_per_pkt: chunk capacity as a multiple of the packet count.
    Inherits the window clamp / pad / coherence-sort plumbing from
    BinnedIntersector; only the trace core differs.
    """

    def __init__(self, scene, band0=8, v_cap_per_pkt=8, sort=True,
                 interpret=None):
        super().__init__(scene, sort=sort, interpret=interpret)
        self.band0 = band0
        self.v_cap_per_pkt = v_cap_per_pkt

    def _run_nearest(self, o_, d_, tmin_, tmax_):
        p = o_.shape[0] // BP
        v_cap = int(min(self.v_cap_per_pkt * p, 1 << 16))
        return _sweep_nearest(
            (self.tri9, self.cbox, self.sbox), o_, d_, tmin_, tmax_,
            self.band0, v_cap, self.interpret,
        )

    def _run_anyhit(self, o_, d_, tmin_, tmax_):
        p = o_.shape[0] // BP
        v_cap = int(min(self.v_cap_per_pkt * p, 1 << 16))
        return _sweep_anyhit(
            (self.tri9, self.cbox, self.sbox), o_, d_, tmin_, tmax_,
            self.band0, v_cap, self.interpret,
        )
