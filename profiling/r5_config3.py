"""Round-5: config-3 speculative-vs-baseline wall-clock (VERDICT r4 next#5).

Measures the all-resident epoch scheduler at the BENCH_extra config-3 scale
for speculate in (False, True, 2, 3): frame_s (host-fenced), warm_s (first
call; compile + upload), epochs, activations.  Baseline is run FIRST so the
shared Mosaic kernel compiles land on it — r4's 107s-vs-6s warm gap is
hypothesized to be compile-ORDER (speculative ran first and paid the shared
compiles), which this ordering should flip.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from spray_tpu.core.camera import make_camera
from spray_tpu.core.config import RenderConfig
from spray_tpu.integrators.device import render_device
from spray_tpu.io.scenes import wisp_cloud
from spray_tpu.sched.epochs import OOCIntersector


def main():
    size = 128
    scene = wisp_cloud(n_blobs=8, tris_per_blob=131072 // 8, seed=3)
    camera = make_camera(
        eye=(14.0, 10.0, 18.0), lookat=(0, 0, 0), up=(0, 1, 0),
        fov_y_deg=45, width=size, height=size,
    )
    cfg = RenderConfig(spp=1, bounces=2, integrator="pt", seed=0)
    out = {}
    ref = None
    for speculate in (False, True, 2, 3):
        isect = OOCIntersector(
            scene, n_domains=8, num_slots=8, speculate=speculate,
            lookahead=False,
        )
        t0 = time.time()
        img = render_device(scene, camera, cfg, intersector=isect)
        warm = time.time() - t0
        isect.stats = type(isect.stats)()
        best = 1e30
        for _ in range(3):
            t0 = time.time()
            img = render_device(scene, camera, cfg, intersector=isect)
            best = min(best, time.time() - t0)
        s = isect.stats
        if ref is None:
            ref = np.asarray(img)
        out[str(speculate)] = {
            "frame_s": round(best, 3), "warm_s": round(warm, 2),
            "epochs": s.epochs // 3, "activations": s.rays_traced // 3,
            "speculated": s.rays_speculated // 3,
            "image_equal": bool(np.array_equal(ref, np.asarray(img))),
        }
        print(json.dumps({str(speculate): out[str(speculate)]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
