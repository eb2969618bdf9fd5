"""Distributed speculative epoch scheduler (SURVEY.md §2 R8/R9, §2c, §3.1/3.4;
BASELINE.md config 5).

The reference's MPI layer — allgather queue counts, schedule broadcast,
point-to-point ray packets, image reduce — becomes JAX collectives inside one
shard_map over a device mesh:

  - IN-SITU ownership (SURVEY §3.4): the stacked domain arrays are sharded
    over the mesh axis — device p permanently owns domains [p*Dl, (p+1)*Dl).
    No residency traffic; rays move to data, never data to rays.
  - Each epoch, every ray's nearest unprocessed overlapped domain names an
    OWNER device; up to BUCKET rays per (src, dst) pair are packed into a
    fixed-shape buffer and exchanged with ONE `all_to_all` (the MoE-router
    shape of the reference's MPI_Alltoall; SURVEY §2b).  Overflow rays simply
    stay queued for a later epoch — the commit invariant is untouched.
  - The owner traces arrivals against ALL its resident domains with the ray's
    best-t window: that is SPECULATION — work for domains the ray may never
    reach — and it is what collapses the epoch count; because every owner
    domain is then provably moot-or-processed for that ray, the home device
    marks the owner's whole domain range processed on return (no mask
    exchange needed).
  - Results return by the inverse `all_to_all`; per-epoch liveness is one
    `psum` (the reference's allgathered queue counts).
  - The epoch loop is a lax.while_loop with collectives in the body — fully
    jitted, no host round-trips (unlike the host-driven OOC loop, which
    exists for the residency-tiered single-chip case).

The local trace reuses the same stacked per-domain BVH scan as the single-chip
path (sched.multidomain), so CPU-mesh tests exercise the identical collective
code the TPU runs (SURVEY §4).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import geom
from ..core.types import Hits, pytree_dataclass
from ..domains.partition import partition_scene
from ..sched.multidomain import DeviceDomainSet, trace_domain
from ..bvh.traverse import DeviceBVH


def _local_trace(local_dset_arrays, leaf_size, o, d, tmin, window, any_hit):
    """Trace rays against this device's resident domains (scan, best-t carry).

    local_dset_arrays: dict of (Dl, ...) stacked per-domain arrays.
    Returns (t, prim, u, v, found) or found-only for any_hit.
    """
    n = o.shape[0]

    def body(carry, dom_arrays):
        bt, bp, bu, bv, found = carry
        dbvh = DeviceBVH(
            child_lo=dom_arrays["child_lo"], child_hi=dom_arrays["child_hi"],
            child_node=dom_arrays["child_node"],
            child_count=dom_arrays["child_count"],
            v0=dom_arrays["v0"], e1=dom_arrays["e1"], e2=dom_arrays["e2"],
            orig_id=dom_arrays["orig_id"], leaf_size=leaf_size,
        )
        win = jnp.where(found & jnp.bool_(any_hit), jnp.float32(0.0), bt)
        t, p, u, v, f = trace_domain(dbvh, o, d, tmin, win, any_hit=any_hit)
        upd = f & (t < bt) if not any_hit else f
        return (
            jnp.where(upd, t, bt) if not any_hit else bt,
            jnp.where(upd, p, bp),
            jnp.where(upd, u, bu),
            jnp.where(upd, v, bv),
            found | f,
        ), None

    init = (
        window, jnp.full(n, -1, jnp.int32),
        jnp.zeros(n, jnp.float32), jnp.zeros(n, jnp.float32),
        jnp.zeros(n, bool),
    )
    (bt, bp, bu, bv, found), _ = jax.lax.scan(body, init, local_dset_arrays)
    return bt, bp, bu, bv, found


class CollectiveEpochIntersector:
    """Intersector whose intersect/occluded are COLLECTIVE over a mesh axis.

    Must be called from code already running inside shard_map over `axis`;
    rays are the local shard, domain geometry is the local (sharded) block of
    the stacked domain arrays.
    """

    # _stat_log appends traced values: intersect/occluded must stay in the
    # same trace scope as drain_stats(), so the integrator may not move the
    # bounce loop into a lax.scan body around this intersector.
    unrolled_only = True

    def __init__(self, local_domains, aabb_lo, aabb_hi, owner_of_domain,
                 axis, n_devices, bucket, leaf_size, max_epochs=64):
        self.local_domains = local_domains  # dict of (Dl, ...) local arrays
        self.aabb_lo = aabb_lo  # (D, 3) replicated
        self.aabb_hi = aabb_hi
        self.owner = owner_of_domain  # (D,) int32 replicated
        self.axis = axis
        self.n_devices = n_devices
        self.bucket = bucket
        self.leaf_size = leaf_size
        self.max_epochs = max_epochs
        # traced per-call (epochs, rays_exchanged) pairs — the dist analog of
        # sched.epochs.EpochStats (SURVEY §2 R19); drained by the renderer
        # into its returned stats vector
        self._stat_log = []

    def reset_stats(self):
        """Drop any logged stat pairs.  Call at the START of a trace scope
        (before the first intersect/occluded) so a drain can never sum
        tracers leaked from a previous, dead trace (ADVICE r3)."""
        self._stat_log = []

    def drain_stats(self):
        """Sum and clear the traced stat pairs logged by intersect/occluded
        calls in the CURRENT trace scope.  Returns (epochs, exchanged).
        Pair with reset_stats() at scope entry."""
        if not self._stat_log:
            z = jnp.int32(0)
            return z, z
        es = sum(e for e, _ in self._stat_log)
        xs = sum(x for _, x in self._stat_log)
        self._stat_log = []
        return es, xs

    # -- helpers ---------------------------------------------------------
    def _entries(self, o, d, tmin, tmax):
        inv_d = jnp.float32(1.0) / jnp.where(
            jnp.abs(d) > 1e-12, d, jnp.float32(1e-12)
        )
        ro_inv = o * inv_d
        t_entry, hit = geom.ray_aabb(
            ro_inv[:, None, :], inv_d[:, None, :],
            self.aabb_lo[None], self.aabb_hi[None],
            tmin[:, None], tmax[:, None], jnp,
        )
        return jnp.where(hit, t_entry, jnp.inf)

    def _epoch_loop(self, o, d, tmin, tmax, any_hit):
        ndev = self.n_devices
        b = self.bucket
        m = o.shape[0]
        entry = self._entries(o, d, tmin, tmax)  # (M, D)
        dcount = entry.shape[1]

        def needed(state):
            best_t, found, processed = state["best_t"], state["found"], state["processed"]
            live = ~(found & jnp.bool_(any_hit))
            return (
                jnp.isfinite(entry) & ~processed
                & (entry < best_t[:, None]) & live[:, None]
            )

        def cond(state):
            return (state["epoch"] < self.max_epochs) & (state["global_need"] > 0)

        def body(state):
            need = needed(state)
            masked = jnp.where(need, entry, jnp.inf)
            nearest_dom = jnp.argmin(masked, axis=1)
            has = jnp.isfinite(jnp.min(masked, axis=1))
            dest = jnp.where(has, self.owner[nearest_dom], ndev)  # ndev = none

            # pack <= b rays per destination (fixed-shape router).  One
            # stable sort by destination + searchsorted ranks: O(m log m)
            # HLO regardless of ndev (VERDICT r2 weak#4 replaced an unrolled
            # O(ndev^2) python loop here).
            perm = jnp.argsort(dest).astype(jnp.int32)  # stable
            dest_s = dest[perm]
            start = jnp.searchsorted(
                dest_s, jnp.arange(ndev, dtype=dest_s.dtype)
            ).astype(jnp.int32)
            rank = jnp.arange(m, dtype=jnp.int32) - start[
                jnp.minimum(dest_s, ndev - 1)
            ]
            sel = (dest_s < ndev) & (rank < b)
            slot = jnp.where(sel, dest_s * b + rank, ndev * b)
            # invalid slots point OUT OF RANGE: their merge writes are
            # dropped (mode='drop'), so duplicate-index write races with
            # legitimately-updated rays cannot occur
            send_flat = jnp.full(ndev * b, m, jnp.int32).at[slot].set(
                perm, mode="drop"
            )
            valid = (send_flat < m).reshape(ndev, b)
            send_idx = send_flat.reshape(ndev, b)

            flat_idx = jnp.minimum(send_flat, m - 1)  # safe gather
            ro = o[flat_idx].reshape(ndev, b, 3)
            rd = d[flat_idx].reshape(ndev, b, 3)
            rtmin = tmin[flat_idx].reshape(ndev, b)
            rwin = jnp.where(
                valid, state["best_t"][flat_idx].reshape(ndev, b), 0.0
            )

            # exchange rays to owners
            a2a = lambda x: jax.lax.all_to_all(
                x, self.axis, split_axis=0, concat_axis=0, tiled=True
            )
            ro_r, rd_r, rtmin_r, rwin_r = a2a(ro), a2a(rd), a2a(rtmin), a2a(rwin)

            # speculative local trace of all arrivals
            t, p_, u, v, f = _local_trace(
                self.local_domains, self.leaf_size,
                ro_r.reshape(-1, 3), rd_r.reshape(-1, 3),
                rtmin_r.reshape(-1), rwin_r.reshape(-1), any_hit,
            )
            # return results to senders
            rt = a2a(t.reshape(ndev, b))
            rp = a2a(p_.reshape(ndev, b))
            ru = a2a(u.reshape(ndev, b))
            rv = a2a(v.reshape(ndev, b))
            rf = a2a(f.reshape(ndev, b))

            # merge into home state: ONE flat scatter per field (send slots
            # reference distinct rays, so no duplicate-index races)
            best_t, best_prim = state["best_t"], state["best_prim"]
            best_u, best_v = state["best_u"], state["best_v"]
            found, processed = state["found"], state["processed"]
            idx = send_flat  # (ndev*b,); invalid -> m (dropped)
            gidx = jnp.minimum(idx, m - 1)
            vmask = valid.reshape(-1)
            tt, pp = rt.reshape(-1), rp.reshape(-1)
            hit = rf.reshape(-1) & vmask
            upd = hit & (tt < best_t[gidx])
            best_t = best_t.at[idx].set(
                jnp.where(upd, tt, best_t[gidx]), mode="drop"
            )
            best_prim = best_prim.at[idx].set(
                jnp.where(upd, pp, best_prim[gidx]), mode="drop"
            )
            best_u = best_u.at[idx].set(
                jnp.where(upd, ru.reshape(-1), best_u[gidx]), mode="drop"
            )
            best_v = best_v.at[idx].set(
                jnp.where(upd, rv.reshape(-1), best_v[gidx]), mode="drop"
            )
            found = found.at[idx].set(found[gidx] | hit, mode="drop")
            # slot s went to owner s // b: that owner's whole domain range
            # is now moot-or-processed for the ray in that slot
            pid = jnp.arange(ndev * b, dtype=jnp.int32) // b
            owner_doms = self.owner[None, :] == pid[:, None]  # (ndev*b, D)
            processed = processed.at[idx].set(
                processed[gidx] | (vmask[:, None] & owner_doms),
                mode="drop",
            )

            state = dict(
                state, best_t=best_t, best_prim=best_prim, best_u=best_u,
                best_v=best_v, found=found, processed=processed,
            )
            local_need = jnp.sum(
                jnp.any(needed(state), axis=1), dtype=jnp.int32
            )
            state["global_need"] = jax.lax.psum(local_need, self.axis)
            state["epoch"] = state["epoch"] + 1
            state["exchanged"] = state["exchanged"] + jax.lax.psum(
                jnp.sum(vmask, dtype=jnp.int32), self.axis
            )
            return state

        state = {
            "best_t": tmax,
            "best_prim": jnp.full(m, -1, jnp.int32),
            "best_u": jnp.zeros(m, jnp.float32),
            "best_v": jnp.zeros(m, jnp.float32),
            "found": jnp.zeros(m, bool),
            "processed": jnp.zeros((m, dcount), bool),
            "epoch": jnp.int32(0),
            "global_need": jnp.int32(1),
            "exchanged": jnp.int32(0),
        }
        # prime the liveness counter
        state["global_need"] = jax.lax.psum(
            jnp.sum(jnp.any(needed(state), axis=1), dtype=jnp.int32), self.axis
        )
        final = jax.lax.while_loop(cond, body, state)
        self._stat_log.append((final["epoch"], final["exchanged"]))
        return final

    # -- intersector interface (collective!) -----------------------------
    def intersect(self, o, d, tmin, tmax):
        s = self._epoch_loop(o, d, tmin, tmax, any_hit=False)
        return Hits(
            t=jnp.where(s["found"], s["best_t"], tmax),
            prim=s["best_prim"], u=s["best_u"], v=s["best_v"],
            valid=s["found"],
        )

    def occluded(self, o, d, tmax):
        tmin = jnp.zeros_like(tmax)
        s = self._epoch_loop(o, d, tmin, tmax, any_hit=True)
        return s["found"]


def make_insitu_renderer(scene, camera, cfg, mesh, axis="dev", n_domains=None,
                         bucket=4096, leaf_size=8, max_epochs=64):
    """Fully-distributed renderer: pixels sharded, domains sharded (in-situ),
    epochs exchange rays over the mesh.  Returns jit'd render() -> (H,W,3).
    """
    from ..integrators import wavefront  # noqa: PLC0415
    from ..kernels.common import tile_swizzle_order  # noqa: PLC0415

    ndev = mesh.shape[axis]
    if n_domains is None:
        n_domains = max(ndev, 8)
    n_domains = -(-n_domains // ndev) * ndev  # multiple of ndev
    dset = partition_scene(scene, n_domains, leaf_size=leaf_size)
    owner = np.arange(n_domains, dtype=np.int32) // (n_domains // ndev)

    stacked = {
        "child_lo": dset.child_lo, "child_hi": dset.child_hi,
        "child_node": dset.child_node, "child_count": dset.child_count,
        "v0": dset.v0, "e1": dset.e1, "e2": dset.e2, "orig_id": dset.orig_id,
    }
    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def put(host, sharding):
        """Multiprocess-safe placement: every process materializes only its
        addressable shards of the global array (the scene is built
        identically on all processes, the reference's in-situ 'data produced
        in place', SURVEY §3.4).  Equivalent to device_put single-process."""
        host = np.asarray(host)
        return jax.make_array_from_callback(
            host.shape, sharding, lambda idx: host[idx]
        )

    stacked = {k: put(v, shard) for k, v in stacked.items()}
    aabb_lo = put(dset.aabb_lo, repl)
    aabb_hi = put(dset.aabb_hi, repl)
    owner_dev = put(owner, repl)

    npix = camera.width * camera.height
    order = tile_swizzle_order(camera.width, camera.height)
    pad = (-npix) % ndev
    order_padded = np.concatenate([order, np.zeros(pad, np.uint32)])
    pixel_ids = put(order_padded, shard)
    scene_arrays = jax.tree.map(
        lambda a: put(a, repl), wavefront.make_scene_arrays(scene, jnp)
    )

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(
            {k: P(axis) for k in stacked}, P(), P(), P(), P(axis),
            jax.tree.map(lambda _: P(), scene_arrays),
        ),
        out_specs=(P(axis), P()),  # image sharded; stats replicated (psum'd)
        check_vma=False,
    )
    def run(local_domains, lo, hi, own, pix, arrays):
        inter = CollectiveEpochIntersector(
            local_domains, lo, hi, own, axis, ndev, bucket, leaf_size,
            max_epochs,
        )

        def body(acc, s):
            inter.reset_stats()
            rad, nrays = wavefront.sample_wavefront(
                arrays, camera, cfg, inter, jnp, s, pix, with_stats=True
            )
            epochs, exchanged = inter.drain_stats()
            stats = jnp.stack([
                jax.lax.psum(nrays, axis),
                epochs.astype(jnp.float32),  # while-count: equal on all devs
                exchanged.astype(jnp.float32),
            ])
            return acc + rad, stats

        acc, stats = jax.lax.scan(
            body, jnp.zeros((pix.shape[0], 3), jnp.float32),
            jnp.arange(cfg.spp, dtype=jnp.uint32),
        )
        return acc / jnp.float32(cfg.spp), jnp.sum(stats, axis=0)

    def _store_stats(stats):
        s = np.asarray(stats)
        render.last_stats = {
            "trace_activations": int(s[0]),
            "epochs": int(s[1]),
            "rays_exchanged": int(s[2]),
        }

    def render():
        acc, stats = run(stacked, aabb_lo, aabb_hi, owner_dev, pixel_ids,
                         scene_arrays)
        img = np.zeros((npix + pad, 3), np.float32)
        img[np.asarray(order_padded)] = np.asarray(acc)
        _store_stats(stats)
        return img[:npix].reshape(camera.height, camera.width, 3)

    def render_local():
        """Multiprocess variant: returns (pixel_ids, radiance) covering only
        THIS process's addressable shards — each jax.distributed process
        reconstructs (and can verify) its own slice of the frame."""
        acc, stats = run(stacked, aabb_lo, aabb_hi, owner_dev, pixel_ids,
                         scene_arrays)
        pids, vals = [], []
        for s in acc.addressable_shards:
            pids.append(order_padded[s.index[0]])
            vals.append(np.asarray(s.data))
        _store_stats(stats)
        return np.concatenate(pids), np.concatenate(vals)

    render.last_stats = None  # set after each call (R19 dist counters)
    render.local = render_local
    return render
