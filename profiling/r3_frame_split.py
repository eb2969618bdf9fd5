"""Round-3 profile: where does the bench frame actually go? (VERDICT r2 #2)

Measures, on the REAL bench scene (wisp cloud, 2.6M tris) at bench scale
(512^2, spp used = 1 sample's worth of rays), the per-stage cost of the
routed MultiDomainClusterIntersector:

  - camera-ray nearest        (coherent)
  - bounce-1 nearest          (cosine-sampled, incoherent)
  - bounce-2 nearest          (more incoherent)
  - NEE shadow any-hit x2     (point-to-light, semi-coherent)
  - full jitted sample (fwd)  and fwd+bwd step for the whole-frame picture

Run ON TPU:  python profiling/r3_frame_split.py [--size 512]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=3):
    """block_until_ready is NOT a reliable fence under the axon tunnel
    (returns early on re-dispatch of an identical program); a device->host
    readback of one output leaf is."""
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        _ = float(jnp.sum(leaf.astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--blobs", type=int, default=8)
    ap.add_argument("--tris-per-blob", type=int, default=131072)
    args = ap.parse_args()

    from spray_tpu.core import geom, rng
    from spray_tpu.core.camera import make_camera
    from spray_tpu.core.config import RenderConfig
    from spray_tpu.integrators import wavefront
    from spray_tpu.io.scenes import wisp_cloud
    from spray_tpu.kernels.common import tile_swizzle_order
    from spray_tpu.kernels.multidomain import MultiDomainClusterIntersector

    scene = wisp_cloud(n_blobs=args.blobs, tris_per_blob=args.tris_per_blob, seed=3)
    camera = make_camera(
        eye=(14.0, 10.0, 18.0), lookat=(0, 0, 0), up=(0, 1, 0),
        fov_y_deg=45, width=args.size, height=args.size,
    )
    cfg = RenderConfig(spp=1, bounces=2, integrator="pt", seed=0)
    print(f"scene: {scene.num_faces} tris; image {args.size}^2")

    t0 = time.time()
    isect = MultiDomainClusterIntersector(scene)
    print(f"build: {time.time()-t0:.1f}s, {isect.n_domains} domains")

    arrays = wavefront.make_scene_arrays(scene, jnp)
    pixel_ids = jnp.asarray(tile_swizzle_order(camera.width, camera.height))
    n = pixel_ids.shape[0]

    # --- reproduce the wavefront stages eagerly, capturing ray sets ---
    jx = rng.uniform(0, pixel_ids, 0, rng.dim_id(0, rng.PIXEL_JITTER, 0), jnp)
    jy = rng.uniform(0, pixel_ids, 0, rng.dim_id(0, rng.PIXEL_JITTER, 1), jnp)
    o, d = geom.camera_rays(camera, pixel_ids, jx, jy, jnp)
    tmin = jnp.zeros(n, jnp.float32)
    tmax = jnp.full(n, geom.INF, jnp.float32)

    # isect passed THROUGH jit as a pytree argument (closing over it bakes the
    # BVH in as HLO constants — the core/pytree.py anti-pattern)
    nearest_j = jax.jit(lambda s, o, d, tmin, win: s.intersect(o, d, tmin, win))
    anyhit_j = jax.jit(lambda s, o, d, win: s.occluded(o, d, win))
    nearest = lambda o, d, tmin, win: nearest_j(isect, o, d, tmin, win)
    anyhit = lambda o, d, win: anyhit_j(isect, o, d, win)

    stages = {}
    alive = jnp.ones(n, bool)
    eps = arrays["offset_eps"]
    lights = arrays["lights"]
    total = 0.0
    for bounce in range(3):
        win = jnp.where(alive, tmax, jnp.float32(0.0))
        dt, hits = timeit(nearest, o, d, tmin, win)
        nact = int(jnp.sum(win > 0))
        stages[f"nearest_b{bounce}"] = (dt, nact)
        total += dt
        hit = alive & hits.valid
        p, nrm = wavefront._shade_prep(o, d, hits, arrays["normals"], jnp, eps)
        if bounce == 2:
            break
        # NEE shadow
        u_pick = rng.uniform(0, pixel_ids, 0, rng.dim_id(bounce, rng.LIGHT, 0), jnp)
        lu1 = rng.uniform(0, pixel_ids, 0, rng.dim_id(bounce, rng.LIGHT, 1), jnp)
        lu2 = rng.uniform(0, pixel_ids, 0, rng.dim_id(bounce, rng.LIGHT, 2), jnp)
        y, ny, le, pw = wavefront._sample_light_point(lights, u_pick, lu1, lu2, jnp)
        wi_raw = y - p
        d2 = geom.dot(wi_raw, wi_raw, jnp)
        dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
        wi = wi_raw / dist[..., None]
        front = hit & (geom.dot(nrm, wi, jnp) > 0) & (-geom.dot(ny, wi, jnp) > 0)
        swin = jnp.where(front, dist * jnp.float32(1 - 1e-3), jnp.float32(0.0))
        dt, occ = timeit(anyhit, p, wi, swin)
        stages[f"shadow_b{bounce}"] = (dt, int(jnp.sum(front)))
        total += dt
        # bounce
        u1, u2 = rng.uniform2(0, pixel_ids, 0, bounce, rng.BSDF, jnp)
        local = geom.cosine_hemisphere(u1, u2, jnp)
        new_d = geom.local_to_world(local, nrm, jnp)
        alive = hit
        o = jnp.where(hit[..., None], p, o)
        d = jnp.where(hit[..., None], new_d, d)

    print("\nper-stage (one spp-1 sample, jitted kernels, min of 3):")
    for k, (dt, nact) in stages.items():
        mrps = nact / dt / 1e6 if dt > 0 else 0
        print(f"  {k:14s} {dt*1e3:9.1f} ms  {nact:9d} act  {mrps:8.2f} Mrays/s")
    print(f"  sum intersects {total*1e3:9.1f} ms")

    # --- whole jitted sample fwd for comparison (includes shading) ---
    from spray_tpu.integrators.device import make_render_fn, device_scene_arrays
    fn = make_render_fn(scene, camera, cfg, isect, with_stats=True)
    arr = device_scene_arrays(scene)
    t0 = time.time()
    img, nrays = fn(arr)
    jax.block_until_ready(img)
    print(f"\nfull fwd sample: compile+run {time.time()-t0:.1f}s")
    dt, (img, nrays) = timeit(fn, arr)
    print(f"full fwd sample: {dt*1e3:.1f} ms, {int(nrays)} activations "
          f"-> {int(nrays)/dt/1e6:.2f} Mrays/s (shading+intersect)")


if __name__ == "__main__":
    main()
