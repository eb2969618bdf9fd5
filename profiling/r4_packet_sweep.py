"""Round-4: packet-width sweep on the bench scene (TPU).

DESIGN.md r3 named 'narrower packets for low-occupancy wavefronts' as a
binding-constraint lever: a 512-lane packet pays the union frustum of all its
rays at every visit, so incoherent bounce/NEE wavefronts drag ~734 shared
leaf visits/packet vs 160 for camera rays.  A narrower packet does less
decode work per visit (the (C, P) elementwise pass scales with P) at the cost
of more visits (less sharing) and more fixed per-visit overhead.  This sweeps
PACKET in {512, 256, 128} over the full fwd frame and prints per-width
host-fenced frame times.

Usage: python profiling/r4_packet_sweep.py [--tris-per-blob N] [--size S]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris-per-blob", type=int, default=131072)
    ap.add_argument("--blobs", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--spp", type=int, default=1)
    ap.add_argument("--bounces", type=int, default=2)
    ap.add_argument("--widths", type=str, default="512,256,128")
    args = ap.parse_args()

    from spray_tpu.core.camera import make_camera
    from spray_tpu.core.config import RenderConfig
    from spray_tpu.integrators.device import device_scene_arrays, make_render_fn
    from spray_tpu.io.scenes import wisp_cloud
    from spray_tpu.kernels.multidomain import MultiDomainClusterIntersector

    cache = Path(__file__).parent.parent / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    scene = wisp_cloud(n_blobs=args.blobs, tris_per_blob=args.tris_per_blob,
                       seed=3)
    camera = make_camera(
        eye=(14.0, 10.0, 18.0), lookat=(0, 0, 0), up=(0, 1, 0),
        fov_y_deg=45, width=args.size, height=args.size,
    )
    cfg = RenderConfig(spp=args.spp, bounces=args.bounces, integrator="pt",
                       seed=0)
    arrays = device_scene_arrays(scene)

    out = {}
    ref_img = None
    for width in (int(w) for w in args.widths.split(",")):
        isect = MultiDomainClusterIntersector(scene, packet=width)
        fn = make_render_fn(scene, camera, cfg, isect, with_stats=True)
        t0 = time.time()
        img, nrays = fn(arrays)
        s = float(jnp.sum(img))  # host fence (block_until_ready unreliable)
        compile_s = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            img, nrays = fn(arrays)
            float(jnp.sum(img))
            times.append(time.time() - t0)
        a = np.asarray(img)
        if ref_img is None:
            ref_img = a
            maxdiff = 0.0
        else:
            maxdiff = float(np.abs(a - ref_img).max())
        out[width] = {
            "frame_s": round(min(times), 4),
            "compile_s": round(compile_s, 1),
            "rays": int(nrays),
            "mrays_s": round(int(nrays) / min(times) / 1e6, 3),
            "max_img_diff_vs_512": maxdiff,
        }
        print(json.dumps({str(width): out[width]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
