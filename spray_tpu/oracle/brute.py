"""Brute-force O(rays x tris) intersector — the correctness oracle's geometry
backend (SURVEY.md §4: 'CPU reference path tracer ... is the oracle').

Works under numpy (the oracle proper) AND under jax.numpy (a slow-but-exact
device intersector used to validate BVH/Pallas intersectors independently of
the integrator).  Nearest-hit ties break to the LOWEST triangle index via
argmin-first-occurrence, which numpy and XLA both guarantee.
"""

from __future__ import annotations

import numpy as np

from ..core import geom
from ..core.pytree import register_intersector_pytree
from ..core.types import Hits


@register_intersector_pytree(leaves=("v0", "e1", "e2"), aux=("xp",))
class BruteIntersector:
    """Intersects against one triangle soup; precomputes v0/e1/e2."""

    def __init__(self, scene, xp):
        self.xp = xp
        tv = scene.vertices[scene.faces.reshape(-1)].reshape(-1, 3, 3)
        self.v0 = xp.asarray(tv[:, 0])
        self.e1 = xp.asarray(tv[:, 1] - tv[:, 0])
        self.e2 = xp.asarray(tv[:, 2] - tv[:, 0])

    def intersect(self, o, d, tmin, tmax):
        """Nearest hit.  o, d: (N, 3); tmin/tmax: (N,).  Returns Hits."""
        xp = self.xp
        # (N, T) pairwise test
        t, u, v, ok = geom.moller_trumbore(
            o[:, None, :], d[:, None, :],
            self.v0[None], self.e1[None], self.e2[None], xp,
        )
        inside = ok & (t >= tmin[:, None]) & (t <= tmax[:, None])
        t = xp.where(inside, t, geom.INF)
        prim = xp.argmin(t, axis=1)  # first occurrence on ties
        n = t.shape[0]
        rows = xp.arange(n)
        tbest = t[rows, prim]
        valid = xp.isfinite(tbest)
        return Hits(
            t=xp.where(valid, tbest, tmax),
            prim=xp.where(valid, prim.astype(xp.int32), xp.int32(-1)),
            u=u[rows, prim],
            v=v[rows, prim],
            valid=valid,
        )

    def occluded(self, o, d, tmax):
        """Any-hit within (eps, tmax).  Returns (N,) bool."""
        xp = self.xp
        t, _, _, ok = geom.moller_trumbore(
            o[:, None, :], d[:, None, :],
            self.v0[None], self.e1[None], self.e2[None], xp,
        )
        inside = ok & (t > xp.float32(0.0)) & (t < tmax[:, None])
        return xp.any(inside, axis=1)
