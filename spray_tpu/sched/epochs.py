"""Epoch-based speculative ray scheduler (SURVEY.md §2 R5–R8, §3.1–3.3).

The reference's frame loop: per epoch, gather per-domain ray-queue counts,
compute a domain schedule, load scheduled domains (OOC), speculatively trace,
then commit hits whose every closer domain has been processed.  TPU redesign:

  - 'Queues' are not materialized: the wavefront is fixed-shape SoA and a ray's
    membership in queue[d] is the derived mask
        needed(i, d) = overlaps(i, d) & ~processed(i, d) & entry_t(i, d) < best_t(i)
    (a ray leaves every queue automatically once a committed-closer hit moots
    the domain — the vectorized form of the reference's queue bookkeeping).
  - Per-epoch 'allgather of queue counts' = a column-sum of `needed` (and a
    psum across chips in the distributed version).
  - The schedule = top-K domains by queue count (K = resident slots).
  - SPECULATIVE trace: every scheduled domain traces ALL rays that need it.
    BASELINE (non-speculative, the reference's baseline_* apps, R17): a ray may
    only be traced in its single NEAREST unprocessed domain this epoch —
    strict front-to-back, more epochs, same image (tested).
  - COMMIT is implicit in the state: a ray is done when `needed` is empty;
    its best (t, prim) then provably satisfies the commit invariant
    (no unprocessed domain with entry_t < best_t) — property-tested.

The epoch loop is host-driven (like the reference's main loop, which does disk
I/O between epochs): jitted steps + a tiny host scheduler reading one (D,)
count vector per epoch.  `ResidencyManager` supplies device-resident slots.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..bvh.traverse import DeviceBVH
from ..core.types import Hits
from ..residency.manager import ResidencyManager
from ..sched.multidomain import DeviceDomainSet, domain_entries, trace_domain
from ..core.types import pytree_dataclass


@pytree_dataclass
class EpochState:
    """Wavefront trace state carried across epochs (all fixed-shape)."""

    o: Any
    d: Any
    tmin: Any
    best_t: Any  # (N,) current nearest (== original tmax while no hit)
    best_prim: Any  # (N,) global tri id or -1
    best_u: Any
    best_v: Any
    found: Any  # (N,) bool
    entry_t: Any  # (N, D) domain entry distance (+inf no overlap)
    processed: Any  # (N, D) bool
    occ_mode: Any  # () bool: any-hit semantics (occlusion rays)


@dataclasses.dataclass
class EpochStats:
    """Reference-style work stats (SURVEY §2 R19): per-run counters."""

    epochs: int = 0
    rays_traced: int = 0  # ray-domain trace activations
    rays_speculated: int = 0  # activations beyond the nearest-domain minimum
    committed: int = 0
    domain_loads: int = 0
    cache_hits: int = 0
    prefetches: int = 0  # lookahead uploads overlapped with tracing

    @property
    def speculation_efficiency(self):
        """committed / traced — THE metric of the core idea (SURVEY §5)."""
        return self.committed / max(self.rays_traced, 1)


def init_state(dset: DeviceDomainSet, o, d, tmin, tmax, occ_mode=False):
    n = o.shape[0]
    entry = domain_entries(dset, o, d, tmin, tmax)
    return EpochState(
        o=o, d=d, tmin=tmin,
        best_t=tmax,
        best_prim=jnp.full(n, -1, jnp.int32),
        best_u=jnp.zeros(n, jnp.float32),
        best_v=jnp.zeros(n, jnp.float32),
        found=jnp.zeros(n, bool),
        entry_t=entry,
        processed=jnp.zeros(entry.shape, bool),
        occ_mode=jnp.asarray(occ_mode),
    )


def needed_mask(state: EpochState):
    """(N, D) ray-needs-domain mask == implicit queue membership."""
    live = jnp.where(state.occ_mode, ~state.found, jnp.ones_like(state.found))
    return (
        jnp.isfinite(state.entry_t)
        & ~state.processed
        & (state.entry_t < state.best_t[:, None])
        & live[:, None]
    )


@jax.jit
def second_queue_counts(state: EpochState):
    """(D,) counts of each ray's SECOND-nearest unprocessed needed domain —
    the entry-order prefetch predictor (VERDICT r3 next#9 / r4 next#6):
    once a ray's nearest queue domain is traced this epoch, its
    second-nearest is where it goes next unless it commits first, so these
    counts ARE the predicted next-epoch queues."""
    need = needed_mask(state)
    masked = jnp.where(need, state.entry_t, jnp.inf)
    nearest = jnp.argmin(masked, axis=1)
    d_ = state.entry_t.shape[1]
    masked2 = masked.at[
        jnp.arange(masked.shape[0]), nearest
    ].set(jnp.inf)
    second = jnp.argmin(masked2, axis=1)
    has2 = jnp.isfinite(jnp.min(masked2, axis=1))
    return (
        jnp.zeros(d_, jnp.int32).at[second].add(has2.astype(jnp.int32))
    )


def queue_counts(state: EpochState):
    """(D,) per-domain queue sizes — the reference's allgathered counts.

    Like the reference, each ray is QUEUED for exactly one domain: its nearest
    unprocessed overlapped domain (front-to-back order).  Speculation traces
    rays in *additional* resident domains beyond their queue assignment, but
    scheduling is driven by these single-membership counts — this also
    guarantees every scheduled domain makes progress in baseline mode.
    """
    need = needed_mask(state)
    masked_entry = jnp.where(need, state.entry_t, jnp.inf)
    nearest = jnp.argmin(masked_entry, axis=1)
    has = jnp.isfinite(jnp.min(masked_entry, axis=1))
    d_ = state.entry_t.shape[1]
    return (
        jnp.zeros(d_, jnp.int32)
        .at[nearest]
        .add(jnp.where(has, 1, 0).astype(jnp.int32))
    )


@functools.partial(jax.jit, static_argnames=("speculate", "leaf_size"))
def epoch_step(state: EpochState, slots, slot_ids, speculate, leaf_size):
    """Trace one epoch over the resident slots.

    slots: tuple of per-slot array dicts; slot_ids: (K,) int32 domain ids
    (-1 = empty slot).  Returns (state, traced_count, speculated_count).
    """
    need = needed_mask(state)
    # nearest unprocessed domain per ray (for the non-speculative baseline
    # and for speculation accounting)
    masked_entry = jnp.where(need, state.entry_t, jnp.inf)
    nearest_dom = jnp.argmin(masked_entry, axis=1)
    has_need = jnp.isfinite(jnp.min(masked_entry, axis=1))

    traced = jnp.int32(0)
    speculated = jnp.int32(0)
    for k, slot in enumerate(slots):
        d_id = slot_ids[k]
        valid_slot = d_id >= 0
        active = need[:, d_id] & valid_slot
        if not speculate:
            active = active & (nearest_dom == d_id) & has_need
        is_spec = active & ~((nearest_dom == d_id) & has_need)
        traced = traced + jnp.sum(active, dtype=jnp.int32)
        speculated = speculated + jnp.sum(is_spec, dtype=jnp.int32)

        dbvh = DeviceBVH(
            child_lo=slot["child_lo"], child_hi=slot["child_hi"],
            child_node=slot["child_node"], child_count=slot["child_count"],
            v0=slot["v0"], e1=slot["e1"], e2=slot["e2"],
            orig_id=slot["orig_id"], leaf_size=leaf_size,
        )
        window = jnp.where(active, state.best_t, jnp.float32(0.0))
        t, p, u, v, f = trace_domain(
            dbvh, state.o, state.d, state.tmin, window
        )
        upd = f & (t < state.best_t) & active
        state = dataclasses.replace(
            state,
            best_t=jnp.where(upd, t, state.best_t),
            best_prim=jnp.where(upd, p, state.best_prim),
            best_u=jnp.where(upd, u, state.best_u),
            best_v=jnp.where(upd, v, state.best_v),
            found=state.found | (f & active),
            processed=state.processed.at[:, d_id].set(
                state.processed[:, d_id] | active
            ),
        )
    return state, traced, speculated


@functools.partial(jax.jit, static_argnames=("speculate", "interpret"))
def epoch_step_cluster(state: EpochState, slots, speculate, interpret):
    """Trace one epoch over the resident slots USING THE PALLAS CLUSTER
    KERNELS (r3: the jnp vmapped-traversal epoch body compile-exploded and
    crashed the TPU worker at bench scale; the slot pages are now the same
    cluster-BVH format the fast single-chip path traces).

    slots: dict of stacked (K, ...) device arrays {bounds, meta, w, tri_ids,
    id}; id -1 marks a padded slot.  lax.scan over slots — ONE Mosaic
    instantiation regardless of K, identical to the dense-speculation scan
    (SURVEY §7.1).  Occlusion rays reuse the nearest kernel with found-lane
    zero windows (the original epoch_step's behavior).
    Returns (state, traced, speculated).
    """
    from ..kernels.traverse import (
        PACKET, _nearest_call, _rays_to_aug, live_buckets,
    )

    need = needed_mask(state)
    masked_entry = jnp.where(need, state.entry_t, jnp.inf)
    nearest_dom = jnp.argmin(masked_entry, axis=1)
    has_need = jnp.isfinite(jnp.min(masked_entry, axis=1))
    n = state.o.shape[0]
    aug, _ = _rays_to_aug(state.o, state.d, state.tmin, state.best_t)
    p = aug.shape[0]
    npad = p * PACKET

    def pad(x, fill):
        if n >= npad:
            return x
        return jnp.concatenate([x, jnp.full(npad - n, fill, x.dtype)])

    def body(carry, slot):
        best_t, best_prim, found, processed, traced, spec = carry
        d_id = slot["id"]
        col = jnp.maximum(d_id, 0)
        active = need[:, col] & (d_id >= 0)
        if not speculate:
            active = active & (nearest_dom == d_id) & has_need
        is_spec = active & ~((nearest_dom == d_id) & has_need)
        traced = traced + jnp.sum(active, dtype=jnp.int32)
        spec = spec + jnp.sum(is_spec, dtype=jnp.int32)

        live = active & ~(state.occ_mode & found)
        win = jnp.where(live, best_t, jnp.float32(0.0))
        win_pk = pad(win, 0.0).reshape(p, PACKET)
        a = aug.at[:, 5, 0:PACKET].set(win_pk)
        bucket = live_buckets(win_pk)
        t, code = _nearest_call(
            bucket, slot["bounds"][None],
            slot["meta"][None], slot["w"][None], a, interpret,
        )
        t = t.reshape(-1)[:n]
        code = code.reshape(-1)[:n]
        prim = jnp.where(
            code >= 0, slot["tri_ids"][jnp.maximum(code, 0)], -1
        )
        f = (prim >= 0) & active
        upd = f & (t < best_t)
        return (
            jnp.where(upd, t, best_t),
            jnp.where(upd, prim, best_prim),
            found | f,
            processed.at[:, col].set(processed[:, col] | active),
            traced, spec,
        ), None

    init = (
        state.best_t, state.best_prim, state.found, state.processed,
        jnp.int32(0), jnp.int32(0),
    )
    (bt, bp, found, processed, traced, spec), _ = jax.lax.scan(
        body, init, slots
    )
    state = dataclasses.replace(
        state, best_t=bt, best_prim=bp, found=found, processed=processed
    )
    return state, traced, spec


@functools.partial(
    jax.jit,
    static_argnames=(
        "speculate", "interpret", "max_epochs", "any_hit", "spec_bound"
    ),
)
def epoch_batch_cluster(state: EpochState, slots, speculate, interpret,
                        max_epochs, any_hit=False, spec_bound=None):
    """Run epochs ON DEVICE (lax.while_loop) until no ray needs a RESIDENT
    domain — the r4 answer to VERDICT r3 weak#1: the host-driven loop synced
    queue counts to host, re-stacked the slot pytrees and re-padded the whole
    wavefront EVERY epoch; this jits the whole batch, so the host only
    touches the loop between residency changes (config 3, all-resident: the
    entire frame's epochs are ONE device call).

    slots: dict of stacked (K, ...) device arrays {bounds, meta, w, tri_ids,
    id}; id -1 marks a padded slot.  Returns (state, epochs, traced,
    speculated) — same activation accounting as epoch_step_cluster.

    any_hit=True (occlusion wavefronts) runs the dedicated any-hit kernel —
    its all-lanes-occluded early exit and skipped nearest bookkeeping were
    unused by the OOC cluster backend until r4 (VERDICT r3 weak#2/next#7).
    """
    from ..kernels.traverse import (
        _anyhit_call, _nearest_call, _rays_to_aug, live_buckets,
    )

    slot_ids = slots["id"]  # (K,)
    d_total = state.entry_t.shape[1]
    # (D,) resident-column mask
    resident = jnp.any(
        slot_ids[None, :] == jnp.arange(d_total, dtype=jnp.int32)[:, None],
        axis=1,
    ) & jnp.any(slot_ids[None, :] >= 0, axis=1)
    n = state.o.shape[0]
    # pad/augment the wavefront ONCE per batch (row 5 = the per-slot window
    # is rewritten inside the slot scan)
    aug0, _ = _rays_to_aug(state.o, state.d, state.tmin, state.best_t)
    p = aug0.shape[0]
    pk = aug0.shape[2] // 2
    npad = p * pk

    def pad(x, fill):
        if n >= npad:
            return x
        return jnp.concatenate([x, jnp.full(npad - n, fill, x.dtype)])

    def derive(best_t, found, processed):
        live = jnp.where(
            state.occ_mode, ~found, jnp.ones_like(found)
        )
        need = (
            jnp.isfinite(state.entry_t)
            & ~processed
            & (state.entry_t < best_t[:, None])
            & live[:, None]
        )
        if spec_bound is not None and speculate:
            # BOUNDED speculation (r5, VERDICT r4 next#5): each epoch traces
            # only a ray's spec_bound nearest needed domains.  Unbounded
            # speculation traced FAR domains before closer ones had
            # committed (slot scan order != per-ray front-to-back), so the
            # far activations ran with loose best-t windows — measured 33%
            # extra activations that made config-3 speculative LOSE to
            # strict baseline on wall clock.  The bound keeps the epoch
            # count low (the claim's proxy for sync rounds) while the far
            # waste disappears.  The nearest needed domain is always inside
            # the bound, so progress is unchanged.
            ent = jnp.where(need, state.entry_t, jnp.inf)
            k = min(spec_bound, ent.shape[1]) - 1
            thr = jnp.sort(ent, axis=1)[:, k]
            need = need & (state.entry_t <= thr[:, None])
        masked = jnp.where(need, state.entry_t, jnp.inf)
        nearest_dom = jnp.argmin(masked, axis=1)
        has_need = jnp.isfinite(jnp.min(masked, axis=1))
        return need, nearest_dom, has_need

    def more_work(best_t, found, processed):
        need, nearest_dom, has_need = derive(best_t, found, processed)
        if speculate:
            return jnp.any(need & resident[None, :])
        return jnp.any(has_need & resident[nearest_dom])

    def cond(carry):
        best_t, _, found, processed, epochs, _, _ = carry
        return (epochs < jnp.int32(max_epochs)) & more_work(
            best_t, found, processed
        )

    def epoch_body(carry):
        best_t0, best_prim0, found0, processed0, epochs, traced0, spec0 = carry
        need, nearest_dom, has_need = derive(best_t0, found0, processed0)

        def slot_body(carry, slot):
            best_t, best_prim, found, processed, traced, spec = carry
            d_id = slot["id"]
            col = jnp.maximum(d_id, 0)
            active = need[:, col] & (d_id >= 0)
            if not speculate:
                active = active & (nearest_dom == d_id) & has_need
            is_spec = active & ~((nearest_dom == d_id) & has_need)
            traced = traced + jnp.sum(active, dtype=jnp.int32)
            spec = spec + jnp.sum(is_spec, dtype=jnp.int32)

            live = active & ~(state.occ_mode & found)
            win = jnp.where(live, best_t, jnp.float32(0.0))
            win_pk = pad(win, 0.0).reshape(p, pk)
            a = aug0.at[:, 5, 0:pk].set(win_pk)
            bucket = live_buckets(win_pk)
            if any_hit:
                occ = _anyhit_call(
                    bucket, slot["bounds"][None],
                    slot["meta"][None], slot["w"][None], a, interpret,
                )
                f = (occ.reshape(-1)[:n] != 0) & active
                return (
                    best_t, best_prim, found | f,
                    processed.at[:, col].set(processed[:, col] | active),
                    traced, spec,
                ), None
            t, code = _nearest_call(
                bucket, slot["bounds"][None],
                slot["meta"][None], slot["w"][None], a, interpret,
            )
            t = t.reshape(-1)[:n]
            code = code.reshape(-1)[:n]
            prim = jnp.where(
                code >= 0, slot["tri_ids"][jnp.maximum(code, 0)], -1
            )
            f = (prim >= 0) & active
            upd = f & (t < best_t)
            return (
                jnp.where(upd, t, best_t),
                jnp.where(upd, prim, best_prim),
                found | f,
                processed.at[:, col].set(processed[:, col] | active),
                traced, spec,
            ), None

        (bt, bp, fnd, prc, traced, spec), _ = jax.lax.scan(
            slot_body,
            (best_t0, best_prim0, found0, processed0, traced0, spec0),
            slots,
        )
        return (bt, bp, fnd, prc, epochs + 1, traced, spec)

    init = (
        state.best_t, state.best_prim, state.found, state.processed,
        jnp.int32(0), jnp.int32(0), jnp.int32(0),
    )
    bt, bp, fnd, prc, epochs, traced, spec = jax.lax.while_loop(
        cond, epoch_body, init
    )
    state = dataclasses.replace(
        state, best_t=bt, best_prim=bp, found=fnd, processed=prc
    )
    # `remaining` disambiguates epochs == max_epochs: a trace that finishes
    # on exactly the last allowed epoch is success, not non-convergence
    # (ADVICE r4) — callers raise only when work is actually left.
    remaining = more_work(bt, fnd, prc)
    return state, epochs, traced, spec, remaining


def schedule_top_k(counts, k):
    """Host scheduler: the K largest nonempty queues (reference's
    biggest-queue-first policy, SURVEY §2 R8)."""
    order = np.argsort(-counts, kind="stable")
    ids = [int(d) for d in order[:k] if counts[d] > 0]
    return ids


class OOCIntersector:
    """Out-of-core multi-domain intersector (BASELINE.md config 4).

    Same interface as every other intersector; internally runs the epoch loop
    with at most `num_slots` domains resident at a time.  `host_driven`:
    epoch scheduling + residency I/O run on host between jitted steps, so this
    intersector must be used from eager wavefront loops, not inside jit.
    """

    host_driven = True

    def __init__(self, scene=None, n_domains=64, num_slots=8, dset=None,
                 leaf_size=16, branching=8, speculate=True, max_epochs=256,
                 lookahead=True, backend="auto", interpret=None,
                 device_batched=None):
        if backend == "auto":
            backend = "cluster" if (
                dset is None and jax.default_backend() == "tpu"
            ) else "jnp"
        self.backend = backend
        # r4: run epochs as device-side while_loop batches between residency
        # changes (epoch_batch_cluster) instead of one host round-trip per
        # epoch.  Cluster backend only; device_batched=False keeps the
        # host-driven per-epoch loop (used by tests as the semantics oracle).
        if device_batched is None:
            device_batched = backend == "cluster"
        self.device_batched = device_batched and backend == "cluster"
        # speculate: False = strict front-to-back; True = unbounded
        # speculation; int k >= 1 = BOUNDED speculation over each ray's k
        # nearest needed domains per epoch (r5 — see epoch_batch_cluster)
        self.spec_bound = (
            speculate if isinstance(speculate, int)
            and not isinstance(speculate, bool) else None
        )
        self.speculate = bool(speculate)
        self.max_epochs = max_epochs
        if backend == "cluster":
            from ..kernels import common  # noqa: PLC0415
            from ..kernels.multidomain import build_cluster_domains  # noqa: PLC0415
            from ..kernels.traverse import tri_soa_from_scene  # noqa: PLC0415

            st = build_cluster_domains(scene, n_domains)
            self._cluster_host = st
            aabb = st["aabb"]
            # light AABB-only view for domain_entries/init_state
            self.dset = DeviceDomainSet(
                aabb_lo=jnp.asarray(aabb[:, 0:3]),
                aabb_hi=jnp.asarray(aabb[:, 3:6]),
                child_lo=None, child_hi=None, child_node=None,
                child_count=None, v0=None, e1=None, e2=None, orig_id=None,
                leaf_size=leaf_size,
            )
            self.host_dset = None
            self.leaf_size = leaf_size
            self.v0, self.e1, self.e2 = tri_soa_from_scene(scene)
            self.interpret = (
                common.use_interpret() if interpret is None else interpret
            )

            def provider(d):
                return {
                    "bounds": st["bounds"][d], "meta": st["meta"][d],
                    "w": st["w"][d], "tri_ids": st["tri_ids"][d],
                }

            self._domain_provider = provider
        else:
            if dset is None:
                from ..domains.partition import partition_scene  # noqa: PLC0415

                dset = partition_scene(
                    scene, n_domains, leaf_size=leaf_size, branching=branching
                )
            self.host_dset = dset
            self.dset = DeviceDomainSet.from_host(dset)
            self.leaf_size = dset.leaf_size
            self._domain_provider = None
        # Prefetch lookahead (SURVEY §7.1 'Residency'): PREDICTED next-epoch
        # domains upload while the jitted trace runs (device_put is async).
        # Prefetches land in `reserve` EXTRA transfer buffers beyond the K
        # trace slots — round 3 first shipped this by carving the reserve out
        # of the schedule width (6 of 8 slots schedulable), which REGRESSED
        # config-4 (71 epochs vs 39, 4.7s vs 2.6s, BENCH_extra r3-pre): the
        # epoch count is set by schedule width, so the reserve must be
        # additive HBM, not subtractive schedule.  Prefetched domains also
        # join the speculative trace for free once they rotate into slots.
        self.lookahead = lookahead and num_slots >= 2
        # Bandwidth-adaptive prefetch gate (VERDICT r4 next#6): prefetch
        # only pays when a page upload finishes well inside a device batch.
        # On this axon-tunneled host, host->HBM measures ~3 MB/s and
        # prefetch made OOC 2.1x SLOWER (BENCH_extra r4); on a real
        # PCIe/DMA host it's GB/s and overlap wins.  One timed 1 MB
        # device_put at init decides — below 50 MB/s (≈0.13 s per 6.3 MB
        # page) lookahead turns itself off.
        self.host_to_hbm_mbps = None
        if self.lookahead:
            import time as _time  # noqa: PLC0415

            probe = np.zeros(1 << 18, np.float32)  # 1 MB
            t0 = _time.time()
            buf = jax.device_put(probe)
            np.asarray(jnp.ravel(buf)[:1] + 0)  # fence the transfer
            dt = max(_time.time() - t0, 1e-6)
            self.host_to_hbm_mbps = probe.nbytes / dt / 1e6
            if self.host_to_hbm_mbps < 50.0:
                self.lookahead = False
        self.sched_width = num_slots
        reserve = max(1, num_slots // 4) if self.lookahead else 0
        self.reserve = reserve
        # Keep only AABBs + metadata resident; geometry goes through slots.
        # Cluster backend: compact f32 'w' pages stream host->HBM and are
        # expanded to pre-stacked bf16 kernel operands on device (r5).
        post_load = None
        if backend == "cluster":
            from ..kernels.traverse import stack_w_pages  # noqa: PLC0415

            def post_load(page):
                return {**page, "w": stack_w_pages(page["w"])}

        self.residency = ResidencyManager(
            self.host_dset, num_slots + reserve,
            domain_provider=self._domain_provider, post_load=post_load,
        )
        self.stats = EpochStats()
        # structured per-epoch log (SURVEY §5 observability): one dict per
        # epoch with queue sizes, schedule, residency and work counters —
        # the reference's per-rank stdout stats, queryable instead
        self.epoch_log = []
        # r4 all-resident fast path: every domain fits the slots, so the
        # whole trace is ONE device batch with ZERO per-epoch host syncs —
        # slots stack once here, and _run_epochs skips the schedule loop
        # (the warm batched loop was tunnel-RTT-bound: 0.06s counts readback
        # + 0.03s restack + 0.06s batch per call, measured r4)
        d_actual = int(self.dset.aabb_lo.shape[0])
        self._n_domains_actual = d_actual
        self.all_resident = (
            self.device_batched and d_actual <= self.sched_width
        )
        if self.all_resident:
            ids = list(range(d_actual))
            slots = list(self.residency.acquire(ids))
            slot_ids = jnp.asarray(
                ids + [-1] * (self.sched_width - len(ids)), jnp.int32
            )
            slots = tuple(slots) + tuple(
                slots[0] for _ in range(self.sched_width - len(slots))
            )
            self._stacked_all = {
                key: jnp.stack([sl[key] for sl in slots])
                for key in ("bounds", "meta", "w", "tri_ids")
            }
            self._stacked_all["id"] = slot_ids

    def _run_epochs_all_resident(self, state, any_hit):
        """All domains resident: the entire trace is one device batch."""
        state, epochs, traced, spec, remaining = epoch_batch_cluster(
            state, self._stacked_all, self.speculate, self.interpret,
            self.max_epochs, any_hit=any_hit, spec_bound=self.spec_bound,
        )
        # ONE device->host readback for all four counters (each sync costs
        # ~50ms under the axon tunnel — the cost this fast path exists to
        # avoid)
        epochs, traced, spec, remaining = (
            int(x) for x in np.asarray(
                jnp.stack([epochs, traced, spec,
                           remaining.astype(jnp.int32)])
            )
        )
        if remaining:
            raise RuntimeError("epoch loop failed to converge (max_epochs)")
        self.stats.epochs += epochs
        self.stats.rays_traced += traced
        self.stats.rays_speculated += spec
        self.epoch_log.append({
            "epoch": self.stats.epochs,
            "scheduled": list(range(self._n_domains_actual)),
            "batch_epochs": epochs,
            "traced": traced,
            "speculated": spec,
            "loads": self.residency.loads,
            "hits": self.residency.hits,
            "prefetches": self.residency.prefetches,
        })
        self.stats.domain_loads = self.residency.loads
        self.stats.cache_hits = self.residency.hits
        self.stats.prefetches = self.residency.prefetches
        return state

    def _run_epochs_batched(self, state, any_hit=False):
        """Device-batched epoch loop: ONE host round-trip per residency
        change (VERDICT r3 next#5).  Per batch: read queue counts (single
        readback), schedule + upload the top-K domains, prefetch the
        predicted NEXT batch into the reserve buffers (overlaps the device
        batch), then run epochs on device until no resident domain has work.
        Config-3 class (all domains resident): the whole trace is one call.
        """
        k = self.sched_width
        for _ in range(self.max_epochs):
            if self.lookahead:
                # ONE readback for both current queues and the entry-order
                # prediction (each host sync costs ~50ms under the tunnel)
                both = np.asarray(jnp.stack(
                    [queue_counts(state), second_queue_counts(state)]
                ))
                counts, counts_next = both[0], both[1]
            else:
                counts = np.asarray(queue_counts(state))
                counts_next = None
            if counts.sum() == 0:
                break
            sched = schedule_top_k(counts, k)
            slots = list(self.residency.acquire(sched))
            ids = list(sched)
            if self.speculate:
                for d in self.residency.resident_ids:
                    if len(ids) >= k:
                        break
                    if d not in ids and counts[d] > 0:
                        ids.append(int(d))
                        slots.append(self.residency.peek(d))
            slot_ids = jnp.asarray(
                ids + [-1] * (k - len(ids)), dtype=jnp.int32
            )
            slots = tuple(slots) + tuple(
                slots[0] for _ in range(k - len(slots))
            )
            if self.lookahead:
                # predict the NEXT batch from each ray's SECOND-nearest
                # needed domain (entry-order predictor) — where rays go
                # once this batch traces their nearest — falling back to
                # current-queue order; uploads overlap the device batch
                order = np.argsort(-counts_next, kind="stable")
                nxt = [int(d) for d in order
                       if counts_next[d] > 0 and int(d) not in ids]
                nxt += [int(d) for d in np.argsort(-counts, kind="stable")
                        if counts[d] > 0 and int(d) not in ids
                        and int(d) not in nxt]
                self.residency.prefetch(nxt[:self.reserve], pinned=sched)
            stacked = {
                key: jnp.stack([s[key] for s in slots])
                for key in ("bounds", "meta", "w", "tri_ids")
            }
            stacked["id"] = slot_ids
            state, epochs, traced, spec, _rem = epoch_batch_cluster(
                state, stacked, self.speculate, self.interpret,
                self.max_epochs, any_hit=any_hit, spec_bound=self.spec_bound,
            )
            epochs, traced, spec = (
                int(x) for x in np.asarray(jnp.stack([epochs, traced, spec]))
            )
            if epochs == 0:
                raise RuntimeError(
                    "batched epoch loop made no progress (scheduled domains "
                    "had no resident work)"
                )
            self.stats.epochs += epochs
            self.stats.rays_traced += traced
            self.stats.rays_speculated += spec
            self.epoch_log.append({
                "epoch": self.stats.epochs,
                "queued": int(counts.sum()),
                "scheduled": sched,
                "resident_extra": len(ids) - len(sched),
                "batch_epochs": epochs,
                "traced": traced,
                "speculated": spec,
                "loads": self.residency.loads,
                "hits": self.residency.hits,
                "prefetches": self.residency.prefetches,
            })
        else:
            raise RuntimeError("epoch loop failed to converge (max_epochs)")
        self.stats.domain_loads = self.residency.loads
        self.stats.cache_hits = self.residency.hits
        self.stats.prefetches = self.residency.prefetches
        return state

    def _run_epochs(self, state, any_hit=False):
        if self.all_resident:
            return self._run_epochs_all_resident(state, any_hit)
        if self.device_batched:
            return self._run_epochs_batched(state, any_hit)
        k = self.sched_width
        k_sched = k
        for _ in range(self.max_epochs):
            counts = np.asarray(queue_counts(state))
            sched = schedule_top_k(counts, k_sched)
            if not sched:
                break
            slots = list(self.residency.acquire(sched))
            ids = list(sched)
            if self.speculate:
                # free speculative work: every resident domain traces its
                # queued rays this epoch, scheduled or not (SURVEY §3.2)
                for d in self.residency.resident_ids:
                    if len(ids) >= k:
                        break
                    if d not in ids and counts[d] > 0:
                        ids.append(int(d))
                        slots.append(self.residency.peek(d))
            slot_ids = jnp.asarray(
                ids + [-1] * (k - len(ids)), dtype=jnp.int32
            )
            # pad slots tuple to K with repeats of slot 0 (masked by id -1)
            slots = tuple(slots) + tuple(
                slots[0] for _ in range(k - len(slots))
            )
            if self.lookahead:
                # predict epoch k+1 = next-biggest not-yet-resident queues;
                # start their uploads now so they overlap this epoch's trace
                order = np.argsort(-counts, kind="stable")
                nxt = [int(d) for d in order
                       if counts[d] > 0 and int(d) not in ids]
                self.residency.prefetch(nxt[:self.reserve], pinned=sched)
            if self.backend == "cluster":
                stacked = {
                    key: jnp.stack([s[key] for s in slots])
                    for key in ("bounds", "meta", "w", "tri_ids")
                }
                stacked["id"] = slot_ids
                state, traced, spec = epoch_step_cluster(
                    state, stacked, self.speculate, self.interpret
                )
            else:
                state, traced, spec = epoch_step(
                    state, slots, slot_ids, self.speculate, self.leaf_size
                )
            self.stats.epochs += 1
            self.stats.rays_traced += int(traced)
            self.stats.rays_speculated += int(spec)
            self.epoch_log.append({
                "epoch": self.stats.epochs,
                "queued": int(counts.sum()),
                "scheduled": sched,
                "resident_extra": len(ids) - len(sched),
                "traced": int(traced),
                "speculated": int(spec),
                "loads": self.residency.loads,
                "hits": self.residency.hits,
                "prefetches": self.residency.prefetches,
            })
        else:
            raise RuntimeError("epoch loop failed to converge (max_epochs)")
        self.stats.domain_loads = self.residency.loads
        self.stats.cache_hits = self.residency.hits
        self.stats.prefetches = self.residency.prefetches
        return state

    def _wavefront_perm(self, o, d, tmax):
        """Origin-Morton packet permutation for the epoch wavefront (r5):
        the same (octant, origin-cell) grouping the single-chip fast path
        uses — bounce/NEE wavefronts arrive in camera-tile order that means
        nothing after a bounce.  Results are permutation-exact."""
        if not hasattr(self, "_partition_j"):
            from ..kernels.multidomain import _live_partition  # noqa: PLC0415

            # one jit wrapper per intersector: this runs in the EAGER
            # host-driven loop, where per-op dispatch over the tunnel
            # would otherwise dominate the partition
            self._partition_j = jax.jit(_live_partition)
        lo, hi = self.dset.aabb_lo, self.dset.aabb_hi
        return self._partition_j(
            tmax, d, o, jnp.min(lo, axis=0), jnp.max(hi, axis=0)
        )

    def intersect(self, o, d, tmin, tmax):
        perm, inv = self._wavefront_perm(o, d, tmax)
        o_, d_ = o[perm], d[perm]
        state = init_state(
            self.dset, o_, d_, tmin[perm], tmax[perm], occ_mode=False
        )
        state = self._run_epochs(state)
        self.stats.committed += int(jnp.sum(state.found))
        best_prim = state.best_prim[inv]
        best_t = state.best_t[inv]
        found = state.found[inv]
        if self.backend == "cluster":
            # kernels return (t, prim) only; recompute (t, u, v) against the
            # committed triangle exactly as the fast path does
            from ..kernels.traverse import attrs_for_prims  # noqa: PLC0415

            t, u, v, valid = attrs_for_prims(
                self.v0, self.e1, self.e2, best_prim, o, d, best_t, tmax,
            )
            return Hits(
                t=jnp.where(valid, t, tmax),
                prim=best_prim.astype(jnp.int32), u=u, v=v, valid=valid,
            )
        return Hits(
            t=jnp.where(found, best_t, tmax),
            prim=best_prim, u=state.best_u[inv], v=state.best_v[inv],
            valid=found,
        )

    def occluded(self, o, d, tmax):
        tmin = jnp.zeros_like(tmax)
        perm, inv = self._wavefront_perm(o, d, tmax)
        state = init_state(
            self.dset, o[perm], d[perm], tmin, tmax[perm], occ_mode=True
        )
        state = self._run_epochs(state, any_hit=True)
        return state.found[inv]
