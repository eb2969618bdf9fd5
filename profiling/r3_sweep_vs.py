"""Sweep vs routed-multidomain on camera / bounce / shadow ray populations.

All timings force materialization through a host scalar (the plain
block_until_ready numbers were suspect for repeated identical inputs).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit_host(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        leaves = jax.tree.leaves(out)
        _ = float(jnp.sum(leaves[0].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    from spray_tpu.core import geom, rng
    from spray_tpu.core.camera import make_camera
    from spray_tpu.integrators import wavefront
    from spray_tpu.io.scenes import wisp_cloud
    from spray_tpu.kernels.common import tile_swizzle_order
    from spray_tpu.kernels.multidomain import MultiDomainClusterIntersector
    from spray_tpu.kernels.sweep import SweepIntersector

    size = 512
    scene = wisp_cloud(n_blobs=8, tris_per_blob=131072, seed=3)
    camera = make_camera(
        eye=(14.0, 10.0, 18.0), lookat=(0, 0, 0), up=(0, 1, 0),
        fov_y_deg=45, width=size, height=size,
    )
    print(f"scene: {scene.num_faces} tris", flush=True)
    t0 = time.time()
    md = MultiDomainClusterIntersector(scene)
    print(f"md build {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    sw = SweepIntersector(scene)
    print(f"sweep build {time.time()-t0:.0f}s", flush=True)

    arrays = wavefront.make_scene_arrays(scene, jnp)
    pixel_ids = jnp.asarray(tile_swizzle_order(camera.width, camera.height))
    n = pixel_ids.shape[0]
    jx = rng.uniform(0, pixel_ids, 0, rng.dim_id(0, rng.PIXEL_JITTER, 0), jnp)
    jy = rng.uniform(0, pixel_ids, 0, rng.dim_id(0, rng.PIXEL_JITTER, 1), jnp)
    o, d = geom.camera_rays(camera, pixel_ids, jx, jy, jnp)
    tmin = jnp.zeros(n, jnp.float32)
    tmax = jnp.full(n, geom.INF, jnp.float32)

    nearest_j = jax.jit(lambda s, o, d, tmin, win: s.intersect(o, d, tmin, win))
    anyhit_j = jax.jit(lambda s, o, d, win: s.occluded(o, d, win))

    hits = nearest_j(md, o, d, tmin, tmax)
    jax.block_until_ready(hits)
    hit = hits.valid
    eps = arrays["offset_eps"]
    p, nrm = wavefront._shade_prep(o, d, hits, arrays["normals"], jnp, eps)
    u1, u2 = rng.uniform2(0, pixel_ids, 0, 0, rng.BSDF, jnp)
    local = geom.cosine_hemisphere(u1, u2, jnp)
    new_d = geom.local_to_world(local, nrm, jnp)
    o1 = jnp.where(hit[..., None], p, o)
    d1 = jnp.where(hit[..., None], new_d, d)
    win1 = jnp.where(hit, tmax, jnp.float32(0.0))

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

    pops = {
        "camera": (o, d, tmin, tmax, int(n)),
        "bounce1": (o1, d1, tmin, win1, int(jnp.sum(win1 > 0))),
    }
    ref = {}
    for name, (oo, dd, tt, ww, act) in pops.items():
        for iname, isect in (("md", md), ("sweep", sw)):
            try:
                dt, h = timeit_host(
                    lambda a, b, c, e: nearest_j(isect, a, b, c, e),
                    oo, dd, tt, ww,
                )
            except Exception as ex:
                print(f"{name} {iname}: FAILED {type(ex).__name__}: {ex}",
                      flush=True)
                continue
            if name in ref:
                par = bool(jnp.all(h.prim == ref[name].prim))
            else:
                ref[name] = h
                par = True
            print(f"{name:8s} {iname:6s}: {dt*1e3:8.1f} ms "
                  f"{act/dt/1e6:9.2f} Mrays/s  parity={par}", flush=True)

    act = int(jnp.sum(swin > 0))
    refo = None
    for iname, isect in (("md", md), ("sweep", sw)):
        dt, occ = timeit_host(
            lambda a, b, c: anyhit_j(isect, a, b, c), p, wi, swin
        )
        par = True if refo is None else bool(jnp.all(occ == refo))
        refo = occ if refo is None else refo
        print(f"shadow0  {iname:6s}: {dt*1e3:8.1f} ms "
              f"{act/dt/1e6:9.2f} Mrays/s  parity={par}", flush=True)


if __name__ == "__main__":
    main()
