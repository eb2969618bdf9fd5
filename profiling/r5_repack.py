"""Round-5: does spatial (origin-Morton) repacking of incoherent bounce/NEE
wavefronts cut the intersect stage time?  (VERDICT r4 next#2: bounce packets
average 623 leaf visits vs camera 82 — the 7.6x factor.)

Materializes the REAL bounce-1 / bounce-2 / shadow wavefronts of the bench
frame (the r4_frame_split stage machinery), then times the SAME intersector
on the wavefront pre-permuted by origin-Morton code at several bit depths
(argsort here; if it wins, production gets a radix cumsum partition).  The
intersector's internal stable octant partition then makes packets
single-octant AND origin-coherent.  Results are checked equal under the
inverse permutation (per-ray kernels: permutation-exact).
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def fenced(fn, *args, iters=2):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    ts = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        ts.append(time.time() - t0)
    return min(ts), out


def morton_key(o, lo, hi, bits):
    q = jnp.clip(
        ((o - lo) / (hi - lo) * (1 << bits)).astype(jnp.int32), 0,
        (1 << bits) - 1,
    )

    def spread(v):
        v = v.astype(jnp.uint32)
        v = (v | (v << 16)) & jnp.uint32(0x030000FF)
        v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
        v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x09249249)
        return v

    return (
        spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    ).astype(jnp.int32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--tris-per-blob", type=int, default=131072)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from spray_tpu.core import geom, rng
    from spray_tpu.core.camera import make_camera
    from spray_tpu.core.config import RenderConfig
    from spray_tpu.integrators import wavefront
    from spray_tpu.io.scenes import wisp_cloud
    from spray_tpu.kernels.common import tile_swizzle_order
    from spray_tpu.kernels.multidomain import MultiDomainClusterIntersector

    scene = wisp_cloud(n_blobs=8, tris_per_blob=args.tris_per_blob, seed=3)
    camera = make_camera(
        eye=(14.0, 10.0, 18.0), lookat=(0, 0, 0), up=(0, 1, 0),
        fov_y_deg=45, width=args.size, height=args.size,
    )
    cfg = RenderConfig(spp=args.spp, bounces=2, integrator="pt", seed=0)
    isect = MultiDomainClusterIntersector(scene)
    v = np.asarray(scene.vertices)
    slo = jnp.asarray(v.min(0))
    shi = jnp.asarray(v.max(0))

    npix = camera.width * camera.height
    pixel_ids = jnp.asarray(tile_swizzle_order(camera.width, camera.height))
    pix = jnp.repeat(pixel_ids, cfg.spp)
    smp = jnp.tile(jnp.arange(cfg.spp, dtype=jnp.uint32), npix)
    arrays = wavefront.make_scene_arrays(scene, jnp)
    n = pix.shape[0]
    tmin = jnp.zeros(n, jnp.float32)
    tmax = jnp.full(n, geom.INF, jnp.float32)

    isect_j = jax.jit(lambda i, o, d, lo, hi: i.intersect(o, d, lo, hi))
    occl_j = jax.jit(lambda i, o, d, w: i.occluded(o, d, w))

    @jax.jit
    def shade(arrays_, o, d, hits_t, hits_prim, hits_valid, alive,
              throughput, bounce):
        from spray_tpu.core.types import Hits
        hits = Hits(t=hits_t, prim=hits_prim, u=jnp.zeros_like(hits_t),
                    v=jnp.zeros_like(hits_t), valid=hits_valid)
        hit = alive & hits.valid
        p, nrm = wavefront._shade_prep(
            o, d, hits, arrays_["normals"], jnp, arrays_["offset_eps"]
        )
        lights = arrays_["lights"]
        u_pick = rng.uniform(cfg.seed, pix, smp,
                             rng.dim_id(bounce, rng.LIGHT, 0), jnp)
        lu1 = rng.uniform(cfg.seed, pix, smp,
                          rng.dim_id(bounce, rng.LIGHT, 1), jnp)
        lu2 = rng.uniform(cfg.seed, pix, smp,
                          rng.dim_id(bounce, rng.LIGHT, 2), jnp)
        y, ny, le, pick_w = wavefront._sample_light_point(
            lights, u_pick, lu1, lu2, jnp)
        wi_raw = y - p
        d2 = geom.dot(wi_raw, wi_raw, jnp)
        dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
        wi = wi_raw / dist[..., None]
        cos_s = geom.dot(nrm, wi, jnp)
        cos_l = -geom.dot(ny, wi, jnp)
        front = hit & (cos_s > 0) & (cos_l > 0)
        swin = jnp.where(front, dist * jnp.float32(1 - 1e-3),
                         jnp.float32(0.0))
        u1, u2 = rng.uniform2(cfg.seed, pix, smp, bounce, rng.BSDF, jnp)
        local = geom.cosine_hemisphere(u1, u2, jnp)
        new_d = geom.local_to_world(local, nrm, jnp)
        thr = throughput * jnp.where(
            hit[..., None], arrays_["albedo"][hits.prim], 1)
        alive2 = hit & (jnp.max(thr, axis=-1) > 0)
        o2 = jnp.where(hit[..., None], p, o)
        d2_ = jnp.where(hit[..., None], new_d, d)
        return o2, d2_, thr, alive2, p, wi, swin

    @jax.jit
    def perm_for(o, win, bits):
        key = jnp.where(win > 0, morton_key(o, slo, shi, bits), 1 << 30)
        return jnp.argsort(key, stable=True).astype(jnp.int32)

    def time_variants(tag, o, d, lo, win, occluded=False):
        res = {}
        call = occl_j if occluded else isect_j
        a = (isect, o, d, win) if occluded else (isect, o, d, lo, win)
        dt, base = fenced(call, *a)
        res["as_is"] = round(dt, 3)
        base_t = np.asarray(base.t if not occluded else base)
        for bits in (2, 3, 4):
            pm = perm_for(o, win, bits)
            dt_sort, pm = fenced(lambda o_, w_: perm_for(o_, w_, bits), o, win)
            if occluded:
                ap_ = (isect, o[pm], d[pm], win[pm])
            else:
                ap_ = (isect, o[pm], d[pm], lo[pm], win[pm])
            dt, out = fenced(call, *ap_)
            ot = np.asarray(out.t if not occluded else out)
            inv = np.argsort(np.asarray(pm), kind="stable")
            same = bool(np.array_equal(ot[inv], base_t))
            res[f"morton{3*bits}"] = {
                "s": round(dt, 3), "sort_s": round(dt_sort, 3),
                "equal": same,
            }
        print(json.dumps({tag: res}), flush=True)
        return res

    jx = rng.uniform(cfg.seed, pix, smp, rng.dim_id(0, rng.PIXEL_JITTER, 0),
                     jnp)
    jy = rng.uniform(cfg.seed, pix, smp, rng.dim_id(0, rng.PIXEL_JITTER, 1),
                     jnp)
    o, d = geom.camera_rays(camera, pix, jx, jy, jnp)
    throughput = jnp.ones((n, 3), jnp.float32)
    alive = jnp.ones(n, bool)
    out = {}
    for bounce in range(cfg.bounces + 1):
        win = jnp.where(alive, tmax, jnp.float32(0.0))
        if bounce > 0:
            out[f"intersect_b{bounce}"] = time_variants(
                f"intersect_b{bounce}", o, d, tmin, win)
        hits = isect_j(isect, o, d, tmin, win)
        if bounce == cfg.bounces:
            break
        o, d, throughput, alive, p, wi, swin = shade(
            arrays, o, d, hits.t, hits.prim, hits.valid, alive, throughput,
            bounce)
        out[f"occluded_b{bounce}"] = time_variants(
            f"occluded_b{bounce}", p, wi, None, swin, occluded=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
