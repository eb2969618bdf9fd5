"""Domain residency manager (SURVEY.md §2 R10 equivalent).

The reference's out-of-core mode streams domains disk → RAM into a bounded
LRU cache, building BVHs on load.  TPU redesign (§7.1 'Residency = fixed
domain slots'): all domains live pre-built in HOST DRAM (numpy, the 'disk'
tier); the device holds K fixed-shape resident slots in HBM.  `acquire`
device_puts missing domains into slots with LRU eviction; cache hits are free
(the device buffer is reused, no copy).  Because every domain is padded to the
same shape (partition.DomainSet), slot contents swap with zero recompiles.

Loads are async (device_put returns immediately); the first kernel that
consumes a slot blocks on its transfer, which overlaps upload with the
preceding epoch's compute — the analog of the reference's load/trace overlap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..domains.partition import DomainSet


class ResidencyManager:
    def __init__(self, dset: DomainSet, num_slots, device=None,
                 domain_provider=None, post_load=None):
        """dset: stacked host DomainSet (jnp-BVH page layout), OR pass
        domain_provider(d) -> dict of host arrays for any other per-domain
        page format (e.g. the Pallas cluster-BVH pages) — residency is page-
        format agnostic: it streams whatever dict the provider returns.

        post_load(device_dict) -> device_dict runs ON DEVICE after each
        upload (r5: the cluster backend expands compact f32 'w' pages into
        pre-stacked bf16 kernel operands here, so host->HBM streaming moves
        the compact 1x bytes and HBM holds the 4x kernel form)."""
        self.host = dset
        self.num_slots = int(num_slots)
        self.device = device or jax.devices()[0]
        self._provider = domain_provider
        self._post_load = post_load
        self._resident = {}  # domain_id -> device pytree (dict of arrays)
        self._lru = []  # domain ids, least-recent first
        self.loads = 0  # stats: domain uploads (reference's 'domains loaded')
        self.hits = 0
        self.prefetches = 0  # uploads issued ahead of schedule (overlapped)

    def _host_domain(self, d):
        if self._provider is not None:
            return self._provider(d)
        h = self.host
        return {
            "child_lo": h.child_lo[d], "child_hi": h.child_hi[d],
            "child_node": h.child_node[d], "child_count": h.child_count[d],
            "v0": h.v0[d], "e1": h.e1[d], "e2": h.e2[d],
            "orig_id": h.orig_id[d],
        }

    def acquire(self, domain_ids):
        """Make `domain_ids` resident (len <= num_slots).  Returns list of
        device pytrees in the same order."""
        ids = list(domain_ids)
        if len(ids) > self.num_slots:
            raise ValueError(
                f"requested {len(ids)} domains > {self.num_slots} slots"
            )
        out = []
        for d in ids:
            d = int(d)
            if d in self._resident:
                self.hits += 1
                self._lru.remove(d)
            else:
                while len(self._resident) >= self.num_slots:
                    # evict least-recently-used domain not in this request
                    for cand in self._lru:
                        if cand not in ids:
                            break
                    else:
                        raise RuntimeError("all slots pinned by request")
                    self._lru.remove(cand)
                    del self._resident[cand]
                page = jax.device_put(self._host_domain(d), self.device)
                if self._post_load is not None:
                    page = self._post_load(page)
                self._resident[d] = page
                self.loads += 1
            self._lru.append(d)
            out.append(self._resident[d])
        return out

    def prefetch(self, domain_ids, pinned=()):
        """Opportunistically upload `domain_ids` into free/evictable slots
        WITHOUT evicting anything in `pinned` (the currently-scheduled set).

        device_put is async: uploads issued here overlap the CURRENT epoch's
        jitted trace, so next epoch's `acquire` finds them resident (the
        reference's load/trace overlap, SURVEY.md §7.1 'Residency' —
        double-buffered against the trace of the current epoch).  Returns how
        many uploads were started.
        """
        pinned = set(int(p) for p in pinned)
        started = 0
        for d in domain_ids:
            d = int(d)
            if d in self._resident:
                continue
            if len(self._resident) >= self.num_slots:
                evictable = [c for c in self._lru if c not in pinned]
                if not evictable:
                    break  # every slot pinned: no room to prefetch
                self._lru.remove(evictable[0])
                del self._resident[evictable[0]]
            page = jax.device_put(self._host_domain(d), self.device)
            if self._post_load is not None:
                page = self._post_load(page)
            self._resident[d] = page
            self._lru.insert(0, d)  # least-recent: evictable if mispredicted
            self.loads += 1
            self.prefetches += 1
            started += 1
        return started

    def peek(self, domain_id):
        """Device pytree of an already-resident domain (no upload, no LRU
        touch) — used to hand unscheduled-but-resident domains to the
        speculative trace for free extra work."""
        return self._resident[int(domain_id)]

    @property
    def resident_ids(self):
        return set(self._resident)
