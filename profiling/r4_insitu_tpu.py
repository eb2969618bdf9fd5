"""Round-4: the collective in-situ renderer ON THE REAL TPU CHIP (mesh of 1).

VERDICT r3 next#4's closing criterion: with the distributed local trace now
running the compiled Pallas cluster kernels, a single-chip mesh-of-1 run of
the collective path must land within 2x of the non-collective fast path on
the same scene — i.e. the collective machinery (router, bucketing,
all_to_all (trivial at 1 device), epoch while_loop) must not strand the
kernel throughput.

Prints one JSON line {"insitu_s":..., "direct_s":..., "ratio":...}.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from spray_tpu.core.camera import make_camera
from spray_tpu.core.config import RenderConfig
from spray_tpu.dist.epochs import make_insitu_renderer
from spray_tpu.integrators.device import render_device
from spray_tpu.io.scenes import wisp_cloud
from spray_tpu.kernels.multidomain import MultiDomainClusterIntersector


def main():
    scene = wisp_cloud(n_blobs=8, tris_per_blob=16384, seed=3)
    camera = make_camera(
        eye=(14.0, 10.0, 18.0), lookat=(0, 0, 0), up=(0, 1, 0),
        fov_y_deg=45, width=128, height=128,
    )
    cfg = RenderConfig(spp=1, bounces=2, integrator="pt", seed=0)

    mesh = Mesh(np.array(jax.devices()[:1]), ("dev",))
    render = make_insitu_renderer(
        scene, camera, cfg, mesh, n_domains=8, bucket=1 << 14,
        backend="cluster",
    )
    img = render()  # compile + warm
    t0 = time.time()
    img = render()
    insitu_s = time.time() - t0

    from spray_tpu.integrators.device import (
        device_scene_arrays, make_render_fn,
    )

    isect = MultiDomainClusterIntersector(scene, n_domains=8)
    arrays = device_scene_arrays(scene)
    fn = make_render_fn(scene, camera, cfg, isect)  # build ONCE (jit cache)
    ref = np.asarray(fn(arrays))  # warm
    t0 = time.time()
    ref = np.asarray(fn(arrays))
    direct_s = time.time() - t0

    diff = float(np.abs(np.asarray(img) - np.asarray(ref)).max())
    print(json.dumps({
        "insitu_s": round(insitu_s, 3),
        "direct_s": round(direct_s, 3),
        "ratio": round(insitu_s / direct_s, 2),
        "max_img_diff": diff,
        "epochs": render.last_stats["epochs"],
        "exchanged": render.last_stats["rays_exchanged"],
    }))


if __name__ == "__main__":
    main()
