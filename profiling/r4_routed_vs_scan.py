"""Round-4: routed front-to-back rounds vs the dense domain scan, post
dead-program skip.

The routed path buys per-packet front-to-back domain ordering at the price
of D argsort/permute/gather rounds over the whole wavefront.  With dead
packet programs now skipped inside the kernel (and best-t windows culling
irrelevant (packet, domain) pairs at the root slab for ~0.5us), the dense
scan's extra pairs may cost less than the routed glue.  Head-to-head on the
bench frame.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from spray_tpu.core.camera import make_camera
from spray_tpu.core.config import RenderConfig
from spray_tpu.integrators.device import device_scene_arrays, make_render_fn
from spray_tpu.io.scenes import wisp_cloud
from spray_tpu.kernels.multidomain import MultiDomainClusterIntersector


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    scene = wisp_cloud(n_blobs=8, tris_per_blob=131072, seed=3)
    camera = make_camera(
        eye=(14.0, 10.0, 18.0), lookat=(0, 0, 0), up=(0, 1, 0),
        fov_y_deg=45, width=size, height=size,
    )
    cfg = RenderConfig(spp=1, bounces=2, integrator="pt", seed=0)
    arrays = device_scene_arrays(scene)
    out = {}
    ref = None
    for routed in (True, "global", False):
        isect = MultiDomainClusterIntersector(scene, routed=routed)
        fn = make_render_fn(scene, camera, cfg, isect, with_stats=True)
        t0 = time.time()
        img, nrays = fn(arrays)
        float(jnp.sum(img))
        compile_s = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time()
            img, nrays = fn(arrays)
            float(jnp.sum(img))
            ts.append(time.time() - t0)
        a = np.asarray(img)
        key = {True: "routed", "global": "global", False: "scan"}[routed]
        if ref is None:
            ref = a
            d = 0.0
        else:
            d = float(np.abs(a - ref).max())
        out[key] = {"frame_s": round(min(ts), 3),
                    "compile_s": round(compile_s, 1),
                    "max_img_diff": d}
        print(json.dumps({key: out[key]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
