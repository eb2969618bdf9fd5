"""Round-4: where do the 300+ cold-compile seconds go?

Times AOT .lower().compile() for each layer of the bench pipeline separately
(fresh process per measurement would be ideal; a single process is fine since
XLA compiles each distinct program once):

  1. one _nearest_call          (the Mosaic traversal kernel alone)
  2. one _anyhit_call
  3. _routed_nearest            (kernel + 21-round scan + sorts)
  4. fwd frame                  (full integrator, no grad)
  5. fwd+bwd step               (the benched program)

Run with an EMPTY compile cache to measure true cold costs.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def clock(name, f):
    t0 = time.time()
    out = f()
    dt = time.time() - t0
    print(f"{name:28s} {dt:8.1f}s", flush=True)
    return out


def main():
    from spray_tpu.core.camera import make_camera
    from spray_tpu.core.config import RenderConfig
    from spray_tpu.integrators.device import device_scene_arrays, make_render_fn
    from spray_tpu.io.scenes import wisp_cloud
    from spray_tpu.kernels.multidomain import (
        MultiDomainClusterIntersector, _routed_nearest,
    )
    from spray_tpu.kernels.traverse import (
        _anyhit_call, _nearest_call, _rays_to_aug,
    )
    from spray_tpu.render import make_pipeline

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    scene = wisp_cloud(n_blobs=8, tris_per_blob=131072, seed=3)
    camera = make_camera(
        eye=(14.0, 10.0, 18.0), lookat=(0, 0, 0), up=(0, 1, 0),
        fov_y_deg=45, width=size, height=size,
    )
    cfg = RenderConfig(spp=4, bounces=2, integrator="pt", seed=0)
    isect = MultiDomainClusterIntersector(scene)
    print(f"domains={isect.n_domains} packets/frame="
          f"{size * size * cfg.spp // 512}", flush=True)

    n = size * size
    o = jnp.zeros((n, 3), jnp.float32)
    d = jnp.ones((n, 3), jnp.float32)
    tmin = jnp.zeros(n, jnp.float32)
    tmax = jnp.full(n, 1e30, jnp.float32)
    aug, _ = _rays_to_aug(o, d, tmin, tmax)
    bdom = jnp.zeros(aug.shape[0], jnp.int32)

    clock("nearest kernel", lambda: jax.jit(
        _nearest_call, static_argnames=("interpret",)
    ).lower(bdom, isect.bounds, isect.meta, isect.w, aug, False).compile())
    clock("anyhit kernel", lambda: jax.jit(
        _anyhit_call, static_argnames=("interpret",)
    ).lower(bdom, isect.bounds, isect.meta, isect.w, aug, False).compile())
    clock("routed_nearest (21 rounds)", lambda: jax.jit(
        _routed_nearest, static_argnames=("interpret",)
    ).lower(isect.bounds, isect.meta, isect.w, isect.tri_ids, isect.dom_aabb,
            aug, tmax, False).compile())

    arrays = device_scene_arrays(scene)
    fwd = make_render_fn(scene, camera, cfg, isect, with_stats=True)
    clock("fwd frame", lambda: jax.jit(
        lambda a: fwd(a)
    ).lower(arrays).compile())

    pipe = make_pipeline(scene, camera, cfg, backward=True, intersector=isect)
    clock("fwd+bwd step", lambda: pipe._fn.lower(*pipe._args).compile())


if __name__ == "__main__":
    main()
