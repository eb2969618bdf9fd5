"""Is the 0.1ms camera-nearest measurement real, or an async artifact of the
axon tunnel?  Force materialization via a host scalar pulled from the result.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from spray_tpu.core import geom, rng
from spray_tpu.core.camera import make_camera
from spray_tpu.io.scenes import wisp_cloud
from spray_tpu.kernels.common import tile_swizzle_order
from spray_tpu.kernels.multidomain import MultiDomainClusterIntersector

size = 512
scene = wisp_cloud(n_blobs=8, tris_per_blob=131072, seed=3)
camera = make_camera(
    eye=(14.0, 10.0, 18.0), lookat=(0, 0, 0), up=(0, 1, 0),
    fov_y_deg=45, width=size, height=size,
)
isect = MultiDomainClusterIntersector(scene)
pixel_ids = jnp.asarray(tile_swizzle_order(camera.width, camera.height))
n = pixel_ids.shape[0]
jx = rng.uniform(0, pixel_ids, 0, rng.dim_id(0, rng.PIXEL_JITTER, 0), jnp)
jy = rng.uniform(0, pixel_ids, 0, rng.dim_id(0, rng.PIXEL_JITTER, 1), jnp)
o, d = geom.camera_rays(camera, pixel_ids, jx, jy, jnp)
tmin = jnp.zeros(n, jnp.float32)
tmax = jnp.full(n, geom.INF, jnp.float32)

nearest_j = jax.jit(lambda s, o, d, tmin, win: s.intersect(o, d, tmin, win))

# warmup
h = nearest_j(isect, o, d, tmin, tmax)
jax.block_until_ready(h)

for mode in ("block", "hostsum"):
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        h = nearest_j(isect, o, d, tmin, tmax)
        if mode == "block":
            jax.block_until_ready(h)
        else:
            _ = float(jnp.sum(h.t)) + float(jnp.sum(h.prim))
        ts.append(time.perf_counter() - t0)
    print(f"b0 {mode}: min {min(ts)*1e3:.1f} ms  all "
          f"{[round(t*1e3,1) for t in ts]}", flush=True)

# vary the input every call (defeat any caching): jitter seed via sample idx
for s_idx in range(3):
    jx = rng.uniform(0, pixel_ids, s_idx + 1, rng.dim_id(0, rng.PIXEL_JITTER, 0), jnp)
    jy = rng.uniform(0, pixel_ids, s_idx + 1, rng.dim_id(0, rng.PIXEL_JITTER, 1), jnp)
    o2, d2 = geom.camera_rays(camera, pixel_ids, jx, jy, jnp)
    t0 = time.perf_counter()
    h = nearest_j(isect, o2, d2, tmin, tmax)
    _ = float(jnp.sum(h.t))
    print(f"b0 fresh-input hostsum: {(time.perf_counter()-t0)*1e3:.1f} ms",
          flush=True)
