"""Round-4: reproducible frame split (VERDICT r3 next#10; SURVEY §5 row 1).

Two artifacts from one run:

1. A `jax.profiler` trace of the full fwd+bwd bench step, written to
   profiling/traces/<timestamp>/ (open with TensorBoard / xprof).
2. A HOST-FENCED stage split printed as one JSON line: the frame's
   intersect/occluded work re-executed per wavefront class (camera, each
   bounce, each shadow generation) as separately-jitted stages on the REAL
   intermediate wavefronts (materialized between stages), plus fwd-only and
   fwd+bwd whole-frame times, so
       backward  = fwd_bwd - fwd
       shade+glue = fwd - sum(stage intersects)
   Every timing forces a device->host readback (block_until_ready is not a
   fence under the axon tunnel).

Usage: python profiling/r4_frame_split.py [--size 512] [--spp 4] [--no-trace]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--bounces", type=int, default=2)
    ap.add_argument("--tris-per-blob", type=int, default=131072)
    ap.add_argument("--no-trace", action="store_true")
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
    from spray_tpu.render import make_pipeline

    scene = wisp_cloud(n_blobs=8, tris_per_blob=args.tris_per_blob, seed=3)
    camera = make_camera(
        eye=(14.0, 10.0, 18.0), lookat=(0, 0, 0), up=(0, 1, 0),
        fov_y_deg=45, width=args.size, height=args.size,
    )
    cfg = RenderConfig(spp=args.spp, bounces=args.bounces, integrator="pt",
                       seed=0)
    isect = MultiDomainClusterIntersector(scene)
    out = {}

    # -- whole-frame fwd and fwd+bwd ------------------------------------
    pipe_f = make_pipeline(scene, camera, cfg, backward=False,
                           intersector=isect)
    out["fwd_s"], _ = fenced(lambda: pipe_f.run_fenced())
    pipe_b = make_pipeline(scene, camera, cfg, backward=True,
                          intersector=isect)
    out["fwd_bwd_s"], _ = fenced(lambda: pipe_b.run_fenced())
    out["backward_s"] = round(out["fwd_bwd_s"] - out["fwd_s"], 3)

    # -- optional jax.profiler trace of the fwd+bwd step -----------------
    if not args.no_trace:
        tdir = Path(__file__).parent / "traces" / time.strftime("%Y%m%d-%H%M%S")
        tdir.mkdir(parents=True, exist_ok=True)
        try:
            with jax.profiler.trace(str(tdir)):
                pipe_b.run_fenced()
            out["trace_dir"] = str(tdir)
        except Exception as e:  # tunnel backends may not support profiling
            out["trace_dir"] = f"unavailable: {e}"[:120]

    # -- per-wavefront-class intersect/occluded stages -------------------
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

    jx = rng.uniform(cfg.seed, pix, smp, rng.dim_id(0, rng.PIXEL_JITTER, 0),
                     jnp)
    jy = rng.uniform(cfg.seed, pix, smp, rng.dim_id(0, rng.PIXEL_JITTER, 1),
                     jnp)
    o, d = geom.camera_rays(camera, pix, jx, jy, jnp)
    throughput = jnp.ones((n, 3), jnp.float32)
    alive = jnp.ones(n, bool)
    stages = {}
    for bounce in range(cfg.bounces + 1):
        win = jnp.where(alive, tmax, jnp.float32(0.0))
        dt, hits = fenced(isect_j, isect, o, d, tmin, win)
        stages[f"intersect_b{bounce}"] = {
            "s": round(dt, 3),
            "live": int(jnp.sum(alive)),
        }
        if bounce == cfg.bounces:
            break
        o, d, throughput, alive, p, wi, swin = jax.jit(
            shade, static_argnames=()
        )(arrays, o, d, hits.t, hits.prim, hits.valid, alive, throughput,
          bounce)
        dt, _ = fenced(occl_j, isect, p, wi, swin)
        stages[f"occluded_b{bounce}"] = {
            "s": round(dt, 3),
            "live": int(jnp.sum(swin > 0)),
        }
    out["stages"] = stages
    out["stage_intersect_total_s"] = round(
        sum(v["s"] for v in stages.values()), 3)
    out["shade_glue_s"] = round(
        out["fwd_s"] - out["stage_intersect_total_s"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
