"""Multi-domain intersector over the Pallas cluster kernels.

Bridges the speculative domain architecture (SURVEY.md §2 R6/R7) to the fast
kernels: each domain owns a VMEM-sized ClusterBVH; a wavefront is traced
against domains sequentially with the running best-t as the cull window —
the dense-batched form of speculative trace + masked min-commit on a single
chip.  Domain order is front-to-back on average (sorted by distance from the
wavefront's origin centroid) so best-t tightens early and later domains
root-out cheaply.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import Hits
from ..domains.partition import median_split_assign
from .cluster_bvh import build_cluster_bvh
from .traverse import ClusterBVHIntersector

MAX_DOMAIN_TRIS = 1 << 17  # ~131K tris ≈ 6.3 MB of cluster transforms


def split_for_vmem(scene, max_tris=MAX_DOMAIN_TRIS):
    """Choose a domain count so each domain's cluster set fits VMEM."""
    ntri = int(np.asarray(scene.faces).shape[0])
    return max(1, -(-ntri // max_tris))


class MultiDomainClusterIntersector:
    """Drop-in intersector: D per-domain Pallas cluster BVHs, min-combined."""

    def __init__(self, scene, n_domains=None, interpret=None):
        verts = np.asarray(scene.vertices, np.float32)
        faces = np.asarray(scene.faces, np.int64)
        if n_domains is None:
            n_domains = split_for_vmem(scene)
        self.n_domains = n_domains
        if n_domains == 1:
            self.domains = [ClusterBVHIntersector(scene, interpret=interpret)]
            self.tri_maps = [None]
            self.centers = np.zeros((1, 3), np.float32)
            return
        tv = verts[faces.reshape(-1)].reshape(-1, 3, 3)
        centers = tv.mean(1)
        assign = median_split_assign(centers, n_domains)
        self.domains = []
        self.tri_maps = []
        self.centers = np.zeros((n_domains, 3), np.float32)
        for d in range(n_domains):
            ids = np.nonzero(assign == d)[0]
            if len(ids) == 0:
                self.domains.append(None)
                self.tri_maps.append(None)
                continue
            cbvh = build_cluster_bvh(verts, faces[ids])
            # remap cluster-local tri ids -> global tri ids
            local = cbvh.tri_ids
            cbvh.tri_ids = np.where(
                local >= 0, ids[np.clip(local, 0, None)], -1
            ).astype(np.int32)

            class _S:  # minimal scene shim (ClusterBVHIntersector needs cbvh)
                pass

            inter = ClusterBVHIntersector(cbvh=cbvh, interpret=interpret)
            self.domains.append(inter)
            self.tri_maps.append(ids)
            self.centers[d] = centers[ids].mean(0)

    def intersect(self, o, d, tmin, tmax):
        n = o.shape[0]
        best = Hits(
            t=tmax, prim=jnp.full(n, -1, jnp.int32),
            u=jnp.zeros(n, jnp.float32), v=jnp.zeros(n, jnp.float32),
            valid=jnp.zeros(n, bool),
        )
        for dom in self._ordered():
            h = dom.intersect(o, d, tmin, best.t)  # best-t window culls
            upd = h.valid & (h.t < best.t)
            best = Hits(
                t=jnp.where(upd, h.t, best.t),
                prim=jnp.where(upd, h.prim, best.prim),
                u=jnp.where(upd, h.u, best.u),
                v=jnp.where(upd, h.v, best.v),
                valid=best.valid | h.valid,
            )
        return best

    def occluded(self, o, d, tmax):
        n = o.shape[0]
        occ = jnp.zeros(n, bool)
        for dom in self._ordered():
            win = jnp.where(occ, jnp.float32(0.0), tmax)
            occ = occ | dom.occluded(o, d, win)
        return occ

    def _ordered(self):
        return [d for d in self.domains if d is not None]
