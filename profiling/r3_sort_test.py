"""Round-3: does coherence-sorting incoherent wavefronts fix the 10^4x cliff?

r3_frame_split measured (2.6M-tri wisp, 512^2):
  nearest_b0 (camera, coherent):   2239 Mrays/s
  nearest_b1 (bounce, unsorted):   0.20 Mrays/s   <- 10^4x cliff
  shadow_b0  (NEE, unsorted):      0.07 Mrays/s

Hypothesis: 512-ray packets share one traversal stack; incoherent packets
visit the union of nodes.  Sorting rays by (origin-morton, direction-octant)
before packetization should tighten packet frustums and recover most of the
coherent-path throughput.  Measures multidomain unsorted/sorted(2 key orders)
+ sweep, plus the sort overhead itself, on REAL bounce-1 and shadow-0 rays.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    from spray_tpu.core import geom, rng
    from spray_tpu.core.camera import make_camera
    from spray_tpu.integrators import wavefront
    from spray_tpu.io.scenes import wisp_cloud
    from spray_tpu.kernels.common import tile_swizzle_order
    from spray_tpu.kernels.multidomain import MultiDomainClusterIntersector

    size = 512
    scene = wisp_cloud(n_blobs=8, tris_per_blob=131072, seed=3)
    camera = make_camera(
        eye=(14.0, 10.0, 18.0), lookat=(0, 0, 0), up=(0, 1, 0),
        fov_y_deg=45, width=size, height=size,
    )
    print(f"scene: {scene.num_faces} tris", flush=True)
    isect = MultiDomainClusterIntersector(scene)

    arrays = wavefront.make_scene_arrays(scene, jnp)
    pixel_ids = jnp.asarray(tile_swizzle_order(camera.width, camera.height))
    n = pixel_ids.shape[0]
    jx = rng.uniform(0, pixel_ids, 0, rng.dim_id(0, rng.PIXEL_JITTER, 0), jnp)
    jy = rng.uniform(0, pixel_ids, 0, rng.dim_id(0, rng.PIXEL_JITTER, 1), jnp)
    o, d = geom.camera_rays(camera, pixel_ids, jx, jy, jnp)
    tmin = jnp.zeros(n, jnp.float32)
    tmax = jnp.full(n, geom.INF, jnp.float32)

    nearest_j = jax.jit(lambda s, o, d, tmin, win: s.intersect(o, d, tmin, win))
    nearest = lambda o, d, tmin, win: nearest_j(isect, o, d, tmin, win)

    # camera bounce -> bounce-1 ray set
    win = tmax
    dt0, hits = timeit(nearest, o, d, tmin, win)
    print(f"b0 unsorted: {dt0*1e3:8.1f} ms", flush=True)
    hit = hits.valid
    eps = arrays["offset_eps"]
    p, nrm = wavefront._shade_prep(o, d, hits, arrays["normals"], jnp, eps)
    u1, u2 = rng.uniform2(0, pixel_ids, 0, 0, rng.BSDF, jnp)
    local = geom.cosine_hemisphere(u1, u2, jnp)
    new_d = geom.local_to_world(local, nrm, jnp)
    o1 = jnp.where(hit[..., None], p, o)
    d1 = jnp.where(hit[..., None], new_d, d)
    win1 = jnp.where(hit, tmax, jnp.float32(0.0))

    # shadow-0 ray set (to the scene lights)
    lights = arrays["lights"]
    u_pick = rng.uniform(0, pixel_ids, 0, rng.dim_id(0, rng.LIGHT, 0), jnp)
    lu1 = rng.uniform(0, pixel_ids, 0, rng.dim_id(0, rng.LIGHT, 1), jnp)
    lu2 = rng.uniform(0, pixel_ids, 0, rng.dim_id(0, rng.LIGHT, 2), jnp)
    y, ny, le, pw = wavefront._sample_light_point(lights, u_pick, lu1, lu2, jnp)
    wi_raw = y - p
    d2m = geom.dot(wi_raw, wi_raw, jnp)
    dist = jnp.sqrt(jnp.maximum(d2m, 1e-12))
    wi = wi_raw / dist[..., None]
    front = hit & (geom.dot(nrm, wi, jnp) > 0) & (-geom.dot(ny, wi, jnp) > 0)
    swin = jnp.where(front, dist * jnp.float32(1 - 1e-3), jnp.float32(0.0))

    wl = jnp.asarray(np.asarray(scene.vertices).min(0))
    wh = jnp.asarray(np.asarray(scene.vertices).max(0))

    def sort_key(o, d, win, octant_major):
        ext = jnp.maximum(wh - wl, 1e-9)
        q = jnp.clip(((o - wl) / ext * 255.0), 0, 255).astype(jnp.int32)

        def spread(v):
            v = (v | (v << 16)) & 0x030000FF
            v = (v | (v << 8)) & 0x0300F00F
            v = (v | (v << 4)) & 0x030C30C3
            v = (v | (v << 2)) & 0x09249249
            return v

        mort = (
            spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
        )
        octa = (
            (d[:, 0] > 0).astype(jnp.int32)
            | ((d[:, 1] > 0).astype(jnp.int32) << 1)
            | ((d[:, 2] > 0).astype(jnp.int32) << 2)
        )
        if octant_major:
            key = (octa << 24) | mort
        else:
            key = (mort << 3) | octa
        # dead rays (win==0) last, so live packets stay dense
        return jnp.where(win > 0, key, jnp.int32(2**30))

    def sorted_nearest(o, d, tmin, win, octant_major):
        key = sort_key(o, d, win, octant_major)
        perm = jnp.argsort(key)
        hits = nearest_j(isect, o[perm], d[perm], tmin[perm], win[perm])
        inv = jnp.argsort(perm)
        return jax.tree.map(lambda a: a[inv], hits)

    sorted_j = jax.jit(sorted_nearest, static_argnames=("octant_major",))

    nact1 = int(jnp.sum(win1 > 0))
    dt, h_ref = timeit(nearest, o1, d1, tmin, win1)
    print(f"b1 unsorted: {dt*1e3:8.1f} ms  {nact1} act  "
          f"{nact1/dt/1e6:8.2f} Mrays/s", flush=True)
    for om in (False, True):
        dt, h_s = timeit(
            lambda o, d, t, w: sorted_j(o, d, t, w, octant_major=om),
            o1, d1, tmin, win1,
        )
        same = bool(jnp.all(h_s.prim == h_ref.prim))
        print(f"b1 sorted(octant_major={om}): {dt*1e3:8.1f} ms  "
              f"{nact1/dt/1e6:8.2f} Mrays/s  parity={same}", flush=True)

    # sort cost alone
    key = sort_key(o1, d1, win1, False)
    argsort_j = jax.jit(lambda k: jnp.argsort(k))
    dt, _ = timeit(argsort_j, key)
    print(f"argsort 262K: {dt*1e3:.1f} ms", flush=True)

    # shadow rays
    anyhit_j = jax.jit(lambda s, o, d, win: s.occluded(o, d, win))
    nact_s = int(jnp.sum(swin > 0))
    dt, occ_ref = timeit(lambda o, d, w: anyhit_j(isect, o, d, w), p, wi, swin)
    print(f"shadow0 unsorted: {dt*1e3:8.1f} ms  {nact_s} act  "
          f"{nact_s/dt/1e6:8.2f} Mrays/s", flush=True)

    def sorted_anyhit(o, d, win, octant_major):
        key = sort_key(o, d, win, octant_major)
        perm = jnp.argsort(key)
        occ = anyhit_j(isect, o[perm], d[perm], win[perm])
        inv = jnp.argsort(perm)
        return occ[inv]

    sortedany_j = jax.jit(sorted_anyhit, static_argnames=("octant_major",))
    for om in (False, True):
        dt, occ_s = timeit(
            lambda o, d, w: sortedany_j(o, d, w, octant_major=om), p, wi, swin
        )
        same = bool(jnp.all(occ_s == occ_ref))
        print(f"shadow0 sorted(octant_major={om}): {dt*1e3:8.1f} ms  "
              f"{nact_s/dt/1e6:8.2f} Mrays/s  parity={same}", flush=True)


if __name__ == "__main__":
    main()
