"""Round-5: re-sweep packet width and morton bits on the bench frame.

The r4 packet sweep picked 256 lanes when visits cost ~0.86us and packets
were octant-grouped only; with pre-stacked pages + origin-Morton packing
the optimum may have moved.  Forward frame 512^2 spp4 (the bench wavefront)
per (packet, morton_bits) combo; bits=0 disables the spatial key.
"""

import itertools
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
from spray_tpu.integrators.device import make_render_fn, device_scene_arrays
from spray_tpu.io.scenes import wisp_cloud
from spray_tpu.kernels import multidomain as md
from spray_tpu.kernels.multidomain import MultiDomainClusterIntersector


def main():
    scene = wisp_cloud(n_blobs=8, tris_per_blob=131072, seed=3)
    camera = make_camera(
        eye=(14.0, 10.0, 18.0), lookat=(0, 0, 0), up=(0, 1, 0),
        fov_y_deg=45, width=512, height=512,
    )
    cfg = RenderConfig(spp=4, bounces=2, integrator="pt", seed=0)
    arrays = device_scene_arrays(scene)
    out = {}
    ref = None
    for packet, bits in itertools.product((256, 128, 512), (3, 4)):
        md.MORTON_BITS = bits
        isect = MultiDomainClusterIntersector(scene, packet=packet)
        fn = make_render_fn(scene, camera, cfg, intersector=isect,
                            with_stats=True)
        img, _ = fn(arrays)
        s = float(jnp.sum(img))
        best = 1e30
        for _ in range(3):
            t0 = time.time()
            img, _ = fn(arrays)
            s = float(jnp.sum(img))
            best = min(best, time.time() - t0)
        if ref is None:
            ref = np.asarray(img)
        key = f"p{packet}_m{3*bits}"
        out[key] = {"frame_s": round(best, 3),
                    "img_equal": bool(np.array_equal(ref, np.asarray(img)))}
        print(json.dumps({key: out[key]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
