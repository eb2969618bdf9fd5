"""Single-chip multi-domain tracing: the all-resident speculative path
(SURVEY.md §2 R4/R6/R7 equivalents, BASELINE.md config 3).

TPU redesign of the reference's per-ray deferred-commit machinery (§7.1
'Speculation = dense batched trace + masked min-reduce commit'): with every
domain resident on the chip, tracing a wavefront against all overlapped
domains and min-reducing IS speculation with a trivially-correct commit — the
'all closer domains processed' condition holds by construction once the scan
finishes.  The scan carries best-t, so later domains are culled by the
traversal's [tmin, best_t) window (the vectorized analog of the reference's
front-to-back early-out).

The epoch-based queue/residency scheduler for the out-of-core and distributed
cases builds on the same `trace_domains` primitive (spray_tpu.sched.epochs).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..bvh.traverse import DeviceBVH, _traverse_one
from ..core.pytree import register_intersector_pytree
from ..core import geom
from ..core.types import Hits
from ..domains.partition import DomainSet


@dataclasses.dataclass(frozen=True)
class DeviceDomainSet:
    """DomainSet moved to device; all fields stacked (D, ...) jnp arrays."""

    aabb_lo: jnp.ndarray
    aabb_hi: jnp.ndarray
    child_lo: jnp.ndarray
    child_hi: jnp.ndarray
    child_node: jnp.ndarray
    child_count: jnp.ndarray
    v0: jnp.ndarray
    e1: jnp.ndarray
    e2: jnp.ndarray
    orig_id: jnp.ndarray
    leaf_size: int

    @classmethod
    def from_host(cls, ds: DomainSet):
        return cls(
            aabb_lo=jnp.asarray(ds.aabb_lo), aabb_hi=jnp.asarray(ds.aabb_hi),
            child_lo=jnp.asarray(ds.child_lo), child_hi=jnp.asarray(ds.child_hi),
            child_node=jnp.asarray(ds.child_node),
            child_count=jnp.asarray(ds.child_count),
            v0=jnp.asarray(ds.v0), e1=jnp.asarray(ds.e1), e2=jnp.asarray(ds.e2),
            orig_id=jnp.asarray(ds.orig_id), leaf_size=ds.leaf_size,
        )

    @property
    def num_domains(self):
        return self.aabb_lo.shape[0]

    def domain_bvh(self, arrays):
        """Assemble a DeviceBVH view from per-domain slices."""
        return DeviceBVH(
            child_lo=arrays["child_lo"], child_hi=arrays["child_hi"],
            child_node=arrays["child_node"], child_count=arrays["child_count"],
            v0=arrays["v0"], e1=arrays["e1"], e2=arrays["e2"],
            orig_id=arrays["orig_id"], leaf_size=self.leaf_size,
        )

    def stacked(self):
        return {
            "child_lo": self.child_lo, "child_hi": self.child_hi,
            "child_node": self.child_node, "child_count": self.child_count,
            "v0": self.v0, "e1": self.e1, "e2": self.e2,
            "orig_id": self.orig_id,
        }


jax.tree_util.register_pytree_node(
    DeviceDomainSet,
    lambda s: (
        (s.aabb_lo, s.aabb_hi, s.child_lo, s.child_hi, s.child_node,
         s.child_count, s.v0, s.e1, s.e2, s.orig_id),
        s.leaf_size,
    ),
    lambda aux, ch: DeviceDomainSet(*ch, leaf_size=aux),
)


def domain_entries(dset, o, d, tmin, tmax):
    """(N, D) entry-t of each ray into each domain AABB (+inf if no overlap).

    This is the reference's top-level 'domains_along(ray)' (SURVEY §2 R4) in
    dense masked form: entry order = ascending entry_t.
    """
    inv_d = jnp.float32(1.0) / jnp.where(
        jnp.abs(d) > 1e-12, d, jnp.float32(1e-12)
    )
    ro_inv = o * inv_d
    t_entry, hit = geom.ray_aabb(
        ro_inv[:, None, :], inv_d[:, None, :],
        dset.aabb_lo[None], dset.aabb_hi[None],
        tmin[:, None], tmax[:, None], jnp,
    )
    return jnp.where(hit, t_entry, geom.INF)


def trace_domain(dbvh, o, d, tmin, tmax, any_hit=False):
    """Vmapped masked traversal of one domain for a wavefront.

    tmax acts as the cull window (pass current best-t); rays whose window is
    empty exit at the root test.
    """
    f = jax.vmap(
        lambda o_, d_, a, b: _traverse_one(dbvh, o_, d_, a, b, any_hit)
    )
    return f(o, d, tmin, tmax)


@register_intersector_pytree(leaves=("dset",), drop=("host_dset",))
class MultiDomainIntersector:
    """Drop-in intersector over a DeviceDomainSet (all domains resident).

    lax.scan over domains; carry = running nearest hit.  Equivalent to the
    single-BVH intersector on the merged scene (tested), which is exactly the
    reference's speculative==baseline oracle condition (SURVEY §4).
    """

    def __init__(self, scene=None, n_domains=8, dset: DomainSet = None,
                 leaf_size=16, branching=8):
        if dset is None:
            from ..domains.partition import partition_scene  # noqa: PLC0415

            dset = partition_scene(
                scene, n_domains, leaf_size=leaf_size, branching=branching
            )
        self.host_dset = dset
        self.dset = DeviceDomainSet.from_host(dset)

    def intersect(self, o, d, tmin, tmax):
        dset = self.dset
        n = o.shape[0]

        def body(carry, dom_arrays):
            bt, bp, bu, bv, found = carry
            dbvh = dset.domain_bvh(dom_arrays)
            t, p, u, v, f = trace_domain(dbvh, o, d, tmin, bt)
            upd = f & (t < bt)
            return (
                jnp.where(upd, t, bt),
                jnp.where(upd, p, bp),
                jnp.where(upd, u, bu),
                jnp.where(upd, v, bv),
                found | f,
            ), None

        init = (
            tmax, jnp.full(n, -1, jnp.int32),
            jnp.zeros(n, jnp.float32), jnp.zeros(n, jnp.float32),
            jnp.zeros(n, bool),
        )
        (bt, bp, bu, bv, found), _ = jax.lax.scan(body, init, dset.stacked())
        return Hits(
            t=jnp.where(found, bt, tmax), prim=bp, u=bu, v=bv, valid=found
        )

    def occluded(self, o, d, tmax):
        dset = self.dset
        n = o.shape[0]
        tmin = jnp.zeros(n, jnp.float32)

        def body(occ, dom_arrays):
            dbvh = dset.domain_bvh(dom_arrays)
            # occluded rays get an empty window (tmax=0) -> root-out instantly
            win = jnp.where(occ, jnp.float32(0.0), tmax)
            _, _, _, _, f = trace_domain(dbvh, o, d, tmin, win, any_hit=True)
            return occ | f, None

        occ, _ = jax.lax.scan(body, jnp.zeros(n, bool), dset.stacked())
        return occ
