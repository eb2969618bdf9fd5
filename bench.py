"""Benchmark harness: prints ONE JSON line with the headline metric.

Metric (BASELINE.md): forward+backward throughput in Grays/s/chip on a
1M-triangle multi-domain scene; north-star target 2.0 Grays/s/chip.
vs_baseline = achieved / 2.0.

Scales down gracefully (CPU / small machines) via --tris / --size flags, but
the defaults match the BASELINE.json config-3 class (1M-tri wisp cloud).
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import numpy as np

TARGET_GRAYS = 2.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--bounces", type=int, default=2)
    ap.add_argument("--blobs", type=int, default=8)
    ap.add_argument("--tris-per-blob", type=int, default=131072)
    ap.add_argument("--backward", action="store_true", default=True)
    ap.add_argument("--no-backward", dest="backward", action="store_false")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from spray_tpu.core.camera import make_camera
    from spray_tpu.core.config import RenderConfig
    from spray_tpu.io.scenes import wisp_cloud
    from spray_tpu.render import make_pipeline

    scene = wisp_cloud(
        n_blobs=args.blobs, tris_per_blob=args.tris_per_blob, seed=3
    )
    ntris = int(scene.num_faces)
    camera = make_camera(
        eye=(14.0, 10.0, 18.0), lookat=(0, 0, 0), up=(0, 1, 0),
        fov_y_deg=45, width=args.size, height=args.size,
    )
    cfg = RenderConfig(
        spp=args.spp, bounces=args.bounces, integrator="pt", seed=0
    )
    pipe = make_pipeline(scene, camera, cfg, backward=args.backward)

    # warmup/compile
    t0 = time.time()
    out = pipe.run()
    compile_s = time.time() - t0

    times = []
    for _ in range(args.iters):
        t0 = time.time()
        out = pipe.run()
        times.append(time.time() - t0)
    dt = min(times)
    # ACTUAL trace activations (lanes with a live window per intersect /
    # occluded call), counted inside the integrator — not a static upper
    # bound (round 1 counted NEE shadow rays in a lightless scene: inflated).
    rays = int(pipe.rays_traced(out))
    grays = rays / dt / 1e9
    print(
        json.dumps(
            {
                "metric": "grays_per_sec_fwd_bwd" if args.backward else "grays_per_sec_fwd",
                "value": round(grays, 6),
                "unit": "Grays/s/chip",
                "vs_baseline": round(grays / TARGET_GRAYS, 6),
                "detail": {
                    "tris": ntris,
                    "size": args.size,
                    "spp": args.spp,
                    "bounces": args.bounces,
                    "rays_per_frame": rays,
                    "frame_s": round(dt, 4),
                    "compile_s": round(compile_s, 1),
                    "backend": jax.default_backend(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
