"""Geometry + sampling math, written ONCE, generic over numpy / jax.numpy.

Every formula the CPU oracle and the TPU renderer share lives here so the two
paths cannot drift: shading, sampling, camera ray generation and the
Möller–Trumbore intersection test are the *same code* evaluated by different
array modules.  (SURVEY.md §4: the reference validates its speculative renderer
against a baseline renderer running identical sampling — we extend that idea to
cross-backend validation.)

Conventions: float32 everywhere; vectors are trailing-(3,) arrays; all functions
broadcast over leading dims.
"""

from __future__ import annotations

import numpy as np

EPS = np.float32(1e-7)
INF = np.float32(np.inf)
TWO_PI = np.float32(2.0 * np.pi)


def dot(a, b, xp):
    return xp.sum(a * b, axis=-1)


def cross(a, b, xp):
    # Written out component-wise: identical op order under numpy and XLA.
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return xp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1
    )


def normalize(v, xp):
    return v * xp.float32(1.0) / xp.sqrt(xp.sum(v * v, axis=-1, keepdims=True))


def make_onb(n, xp):
    """Branchless orthonormal basis around unit normal n (Duff et al. 2017)."""
    nz = n[..., 2]
    sign = xp.where(nz >= 0, xp.float32(1.0), xp.float32(-1.0))
    a = xp.float32(-1.0) / (sign + nz)
    b = n[..., 0] * n[..., 1] * a
    t = xp.stack(
        [
            xp.float32(1.0) + sign * n[..., 0] * n[..., 0] * a,
            sign * b,
            -sign * n[..., 0],
        ],
        axis=-1,
    )
    bt = xp.stack([b, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return t, bt


def cosine_hemisphere(u1, u2, xp):
    """Cosine-weighted direction in local (tangent) frame from two uniforms."""
    r = xp.sqrt(u1)
    phi = TWO_PI * u2
    x = r * xp.cos(phi)
    y = r * xp.sin(phi)
    z = xp.sqrt(xp.maximum(xp.float32(0.0), xp.float32(1.0) - u1))
    return xp.stack([x, y, z], axis=-1)


def local_to_world(local_dir, n, xp):
    t, bt = make_onb(n, xp)
    return (
        local_dir[..., 0:1] * t
        + local_dir[..., 1:2] * bt
        + local_dir[..., 2:3] * n
    )


def camera_rays(camera, pixel_ids, jx, jy, xp):
    """Primary ray origins/dirs for flat pixel ids with sub-pixel jitter (jx, jy).

    pixel id p maps to (px, py) = (p % W, p // W); py counts from the TOP row
    (image convention), while dv points up — flipped here.
    """
    w = camera.width
    px = (pixel_ids % xp.uint32(w)).astype(xp.float32) + jx
    py = (pixel_ids // xp.uint32(w)).astype(xp.float32) + jy
    py = xp.float32(camera.height) - py  # image row 0 = top
    target = (
        camera.lower_left
        + px[..., None] * camera.du
        + py[..., None] * camera.dv
    )
    d = normalize(target - camera.eye, xp)
    o = xp.broadcast_to(camera.eye, d.shape).astype(xp.float32)
    return o, d


def moller_trumbore(ro, rd, v0, e1, e2, xp):
    """Möller–Trumbore ray/triangle test.  Broadcasts over any leading dims.

    ro, rd: (..., 3) ray origin/dir;  v0: (..., 3) triangle base vertex;
    e1 = v1 - v0, e2 = v2 - v0.
    Returns (t, u, v, hit_mask); t is +inf where the test misses (the caller
    applies its own [tmin, tmax] window).
    """
    pvec = cross(rd, e2, xp)
    det = dot(e1, pvec, xp)
    # Two-sided test; reject near-parallel.
    ok = xp.abs(det) > EPS
    inv_det = xp.float32(1.0) / xp.where(ok, det, xp.float32(1.0))
    tvec = ro - v0
    u = dot(tvec, pvec, xp) * inv_det
    qvec = cross(tvec, e1, xp)
    v = dot(rd, qvec, xp) * inv_det
    t = dot(e2, qvec, xp) * inv_det
    ok = (
        ok
        & (u >= xp.float32(0.0))
        & (v >= xp.float32(0.0))
        & (u + v <= xp.float32(1.0))
    )
    t = xp.where(ok, t, INF)
    return t, u, v, ok


def ray_aabb(ro_inv_o, inv_d, lo, hi, tmin, tmax, xp):
    """Slab test.  ro_inv_o = ro * inv_d (precomputed); returns (t_entry, hit).

    lo/hi: (..., 3) box corners.  Robust to inf*0 via min/max ordering.
    """
    t0 = lo * inv_d - ro_inv_o
    t1 = hi * inv_d - ro_inv_o
    tlo = xp.minimum(t0, t1)
    thi = xp.maximum(t0, t1)
    t_entry = xp.maximum(xp.max(tlo, axis=-1), tmin)
    t_exit = xp.minimum(xp.min(thi, axis=-1), tmax)
    return t_entry, t_entry <= t_exit


def face_normals(verts, faces, xp):
    """(F, 3) geometric unit normals."""
    tv = verts[faces.reshape(-1)].reshape(faces.shape[0], 3, 3)
    if xp is not np:
        # XLA barrier on the big vertex gather: fusing it with consumers
        # while its transpose (backward scatter-add) shares the module sends
        # TPU compile superlinear (see integrators.wavefront.pgather)
        import jax  # noqa: PLC0415

        tv = jax.lax.optimization_barrier(tv)
    n = cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0], xp)
    return normalize(n, xp)
