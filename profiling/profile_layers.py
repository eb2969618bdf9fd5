"""Layer-by-layer perf breakdown (dev tool, not shipped API)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent))
import numpy as np
import jax
import jax.numpy as jnp

from spray_tpu.core.camera import make_camera
from spray_tpu.core.geom import camera_rays
from spray_tpu.core.config import RenderConfig
from spray_tpu.io.scenes import wisp_cloud
from spray_tpu.kernels.traverse import ClusterBVHIntersector
from spray_tpu.kernels.multidomain import MultiDomainClusterIntersector
from spray_tpu.render import make_pipeline

SIZE = 512
scene = wisp_cloud(n_blobs=8, tris_per_blob=131072, seed=3)
print("tris:", scene.num_faces, flush=True)
camera = make_camera(eye=(14.0, 10.0, 18.0), lookat=(0, 0, 0), up=(0, 1, 0),
                     fov_y_deg=45, width=SIZE, height=SIZE)

# primary rays
ids = jnp.arange(SIZE * SIZE, dtype=jnp.uint32)
try:
    z = jnp.zeros(SIZE * SIZE)
    o, d = camera_rays(camera, ids, z, z, jnp)
except Exception as e:
    print("camera_rays sig issue:", e)
    raise
tmin = jnp.zeros(SIZE * SIZE)
tmax = jnp.full(SIZE * SIZE, 1e30)
n = SIZE * SIZE

def timeit(name, f, iters=3):
    out = f(); jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.time(); out = f(); jax.block_until_ready(out)
        ts.append(time.time() - t0)
    dt = min(ts)
    print(f"{name}: {dt*1e3:.1f} ms  -> {n/dt/1e6:.1f} Mrays/s", flush=True)
    return dt

# 1) single-domain kernel on a 131K-tri blob
small = wisp_cloud(n_blobs=1, tris_per_blob=131072, seed=3)
isect1 = ClusterBVHIntersector(small)
f1 = jax.jit(lambda o, d, tmin, tmax, i: i.intersect(o, d, tmin, tmax))
timeit("single-domain nearest (131K tris)", lambda: f1(o, d, tmin, tmax, isect1))

# 2) multidomain routed on full scene
mi = MultiDomainClusterIntersector(scene)
print("n_domains:", mi.n_domains, flush=True)
f2 = jax.jit(lambda o, d, tmin, tmax, i: i.intersect(o, d, tmin, tmax))
timeit("multidomain routed nearest (2.6M tris)", lambda: f2(o, d, tmin, tmax, mi))

mi2 = MultiDomainClusterIntersector(scene, routed=False)
f3 = jax.jit(lambda o, d, tmin, tmax, i: i.intersect(o, d, tmin, tmax))
timeit("multidomain scan nearest (2.6M tris)", lambda: f3(o, d, tmin, tmax, mi2))

# 3) forward-only pipeline
cfg = RenderConfig(spp=4, bounces=2, integrator="pt", seed=0)
t0 = time.time()
pipe = make_pipeline(scene, camera, cfg, backward=False)
pipe.run()
print("fwd compile:", round(time.time() - t0, 1), "s", flush=True)
ts = []
for _ in range(3):
    t0 = time.time(); pipe.run(); ts.append(time.time() - t0)
rays = SIZE * SIZE * 4 * (3 + 2)
print(f"forward-only frame: {min(ts)*1e3:.1f} ms -> {rays/min(ts)/1e9:.4f} Grays/s", flush=True)
