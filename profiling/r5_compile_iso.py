"""Round-5: isolate the cold-compile cost of the r5 frame-path features.

r4 cold fwd+bwd ~101s; after morton repack + grid routing the truly-cold
compile measured 139.8s (r5_bwd_compile base).  Variants compile the
FWD-ONLY pipeline (the backward adds its own ~constant) with a fresh tmp
cache each:

  grid_morton   — production r5 (routed="grid", morton partition)
  global_morton — routed="global"
  grid_octant   — routed="grid", octant-only partition (morton disabled)

Usage: python profiling/r5_compile_iso.py [variant ...]
"""

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import numpy as np


def main():
    variants = sys.argv[1:] or ["grid_morton", "global_morton", "grid_octant"]
    from spray_tpu.core.camera import make_camera
    from spray_tpu.core.config import RenderConfig
    from spray_tpu.io.scenes import wisp_cloud
    from spray_tpu.kernels import multidomain as md
    from spray_tpu.kernels.multidomain import MultiDomainClusterIntersector
    from spray_tpu.render import make_pipeline

    scene = wisp_cloud(n_blobs=8, tris_per_blob=131072, seed=3)
    camera = make_camera(
        eye=(14.0, 10.0, 18.0), lookat=(0, 0, 0), up=(0, 1, 0),
        fov_y_deg=45, width=512, height=512,
    )
    cfg = RenderConfig(spp=4, bounces=2, integrator="pt", seed=0)
    out = {}
    for variant in variants:
        routed = "global" if variant.startswith("global") else "grid"
        isect = MultiDomainClusterIntersector(scene, routed=routed)
        if variant.endswith("octant"):
            isect.world_lo = None  # _live_partition falls back to octant
            isect.world_hi = None
        cache = tempfile.mkdtemp(prefix=f"jaxcache_{variant}_")
        jax.config.update("jax_compilation_cache_dir", cache)
        pipe = make_pipeline(scene, camera, cfg, backward=False,
                             intersector=isect)
        # fwd pipeline wraps the jit in a lambda: time the first call
        # (compile + arg upload; the upload is constant across variants)
        t0 = time.time()
        pipe.run_fenced()
        compile_s = time.time() - t0
        best = 1e30
        for _ in range(2):
            t0 = time.time()
            pipe.run_fenced()
            best = min(best, time.time() - t0)
        out[variant] = {"compile_s": round(compile_s, 1),
                        "frame_s": round(best, 3)}
        print(json.dumps({variant: out[variant]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
