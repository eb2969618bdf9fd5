"""Pallas brute-force ray x tri intersection (nearest-hit + any-hit).

Role: (a) plumbing proof for the kernel layer, (b) the *leaf primitive* the BVH
packet kernels reuse, (c) the fast path for small domains where a BVH would be
overhead.  One program instance owns an (8, 128) ray tile in VMEM registers and
streams every triangle through the VPU as broadcast scalars (triangle SoA lives
in SMEM): per (tile, tri) iteration is ~50 elementwise ops on 1024 ray lanes
with zero gathers/scatters — exactly the lock-step shape the VPU wants.

Equivalent of the reference's Embree rtcIntersect wrappers (SURVEY.md §2 R3),
redesigned per §7.1 rather than ported.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.pytree import register_intersector_pytree
from ..core.types import Hits
from . import common

NEG = jnp.float32(-1.0)
F32 = jnp.float32


def _mt_scalar_tri(tri, i, ox, oy, oz, dx, dy, dz):
    """Möller–Trumbore of a ray tile vs one tri (scalars from SMEM ref).

    tri ref layout: (T, 9) = [v0 | e1 | e2].  Returns (t, u, v, ok_geom)."""
    v0x, v0y, v0z = tri[i, 0], tri[i, 1], tri[i, 2]
    e1x, e1y, e1z = tri[i, 3], tri[i, 4], tri[i, 5]
    e2x, e2y, e2z = tri[i, 6], tri[i, 7], tri[i, 8]
    # pvec = d x e2
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    ok = jnp.abs(det) > F32(1e-7)
    inv = F32(1.0) / jnp.where(ok, det, F32(1.0))
    tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv
    # qvec = tvec x e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv
    t = (e2x * qx + e2y * qy + e2z * qz) * inv
    ok = ok & (u >= F32(0)) & (v >= F32(0)) & (u + v <= F32(1))
    return t, u, v, ok


def _nearest_kernel(num_tris, tri_ref, ids_ref, ox, oy, oz, dx, dy, dz,
                    tmn, tmx, out_t, out_prim, out_u, out_v):
    oxv, oyv, ozv = ox[:], oy[:], oz[:]
    dxv, dyv, dzv = dx[:], dy[:], dz[:]
    tmin = tmn[:]
    tmax = tmx[:]

    def body(i, carry):
        bt, bp, bu, bv = carry
        t, u, v, ok = _mt_scalar_tri(tri_ref, i, oxv, oyv, ozv, dxv, dyv, dzv)
        ok = ok & (t >= tmin) & (t < bt) & (ids_ref[i] >= 0)
        return (
            jnp.where(ok, t, bt),
            jnp.where(ok, jnp.full_like(bp, ids_ref[i]), bp),
            jnp.where(ok, u, bu),
            jnp.where(ok, v, bv),
        )

    init = (tmax, jnp.full(tmax.shape, -1, jnp.int32),
            jnp.zeros(tmax.shape, F32), jnp.zeros(tmax.shape, F32))
    bt, bp, bu, bv = jax.lax.fori_loop(0, num_tris, body, init)
    out_t[:] = bt
    out_prim[:] = bp
    out_u[:] = bu
    out_v[:] = bv


def _anyhit_kernel(num_tris, tri_ref, ids_ref, ox, oy, oz, dx, dy, dz,
                   tmn, tmx, out_occ):
    oxv, oyv, ozv = ox[:], oy[:], oz[:]
    dxv, dyv, dzv = dx[:], dy[:], dz[:]
    tmin = tmn[:]
    tmax = tmx[:]

    def body(i, occ):
        t, u, v, ok = _mt_scalar_tri(tri_ref, i, oxv, oyv, ozv, dxv, dyv, dzv)
        ok = ok & (t > tmin) & (t < tmax) & (ids_ref[i] >= 0)
        return occ | ok.astype(jnp.int32)

    occ = jax.lax.fori_loop(0, num_tris, body,
                            jnp.zeros(tmax.shape, jnp.int32))
    out_occ[:] = occ


def _tri_soa(v0, e1, e2):
    """(T, 9) f32 tri SoA for SMEM residency."""
    return jnp.concatenate([v0, e1, e2], axis=1).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _brute_nearest(tri9, ids, o, d, tmin, tmax, interpret=False):
    tiles, n = common.rays_to_tiles(o, d, tmin, tmax)
    r = tiles["ox"].shape[0]
    num_tris = tri9.shape[0]
    ray_spec = pl.BlockSpec(
        (1, common.SUBLANES, common.LANES), lambda i: (i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((r, common.SUBLANES, common.LANES), jnp.float32)
    out_ishape = jax.ShapeDtypeStruct((r, common.SUBLANES, common.LANES), jnp.int32)
    kernel = functools.partial(_nearest_kernel, num_tris)
    bt, bp, bu, bv = pl.pallas_call(
        kernel,
        grid=(r,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tri9
            pl.BlockSpec(memory_space=pltpu.SMEM),  # ids
        ] + [ray_spec] * 8,
        out_specs=[ray_spec] * 4,
        out_shape=[out_shape, out_ishape, out_shape, out_shape],
        interpret=interpret,
    )(
        tri9, ids,
        tiles["ox"], tiles["oy"], tiles["oz"],
        tiles["dx"], tiles["dy"], tiles["dz"],
        tiles["tmin"], tiles["tmax"],
    )
    get = lambda x: common.tiles_to_flat(x, n)
    return get(bt), get(bp), get(bu), get(bv)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _brute_anyhit(tri9, ids, o, d, tmin, tmax, interpret=False):
    tiles, n = common.rays_to_tiles(o, d, tmin, tmax)
    r = tiles["ox"].shape[0]
    num_tris = tri9.shape[0]
    ray_spec = pl.BlockSpec(
        (1, common.SUBLANES, common.LANES), lambda i: (i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    occ = pl.pallas_call(
        functools.partial(_anyhit_kernel, num_tris),
        grid=(r,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + [ray_spec] * 8,
        out_specs=pl.BlockSpec(
            (1, common.SUBLANES, common.LANES), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (r, common.SUBLANES, common.LANES), jnp.int32
        ),
        interpret=interpret,
    )(
        tri9, ids,
        tiles["ox"], tiles["oy"], tiles["oz"],
        tiles["dx"], tiles["dy"], tiles["dz"],
        tiles["tmin"], tiles["tmax"],
    )
    return common.tiles_to_flat(occ, n) != 0


@register_intersector_pytree(leaves=("tri9", "ids"), aux=("interpret",))
class PallasBruteIntersector:
    """Drop-in intersector backed by the Pallas brute kernels."""

    def __init__(self, scene, interpret=None):
        import numpy as np  # noqa: PLC0415

        tv = np.asarray(scene.vertices)[
            np.asarray(scene.faces).reshape(-1)
        ].reshape(-1, 3, 3).astype(np.float32)
        v0 = jnp.asarray(tv[:, 0])
        e1 = jnp.asarray(tv[:, 1] - tv[:, 0])
        e2 = jnp.asarray(tv[:, 2] - tv[:, 0])
        self.tri9 = _tri_soa(v0, e1, e2)
        self.ids = jnp.arange(self.tri9.shape[0], dtype=jnp.int32)
        self.interpret = common.use_interpret() if interpret is None else interpret

    def intersect(self, o, d, tmin, tmax):
        t, prim, u, v = _brute_nearest(
            self.tri9, self.ids, o, d, tmin, tmax, interpret=self.interpret
        )
        valid = prim >= 0
        return Hits(t=jnp.where(valid, t, tmax), prim=prim, u=u, v=v, valid=valid)

    def occluded(self, o, d, tmax):
        tmin = jnp.zeros_like(tmax)
        return _brute_anyhit(
            self.tri9, self.ids, o, d, tmin, tmax, interpret=self.interpret
        )
