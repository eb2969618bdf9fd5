"""Isolate: what makes in-pipeline intersect slow for coherent rays (dev tool)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent))
import numpy as np
import jax
import jax.numpy as jnp

from spray_tpu.core.camera import make_camera
from spray_tpu.core.geom import camera_rays
from spray_tpu.io.scenes import wisp_cloud
from spray_tpu.kernels.multidomain import MultiDomainClusterIntersector
from spray_tpu.core import rng

SIZE = 512
scene = wisp_cloud(n_blobs=8, tris_per_blob=131072, seed=3)
camera = make_camera(eye=(14.0, 10.0, 18.0), lookat=(0, 0, 0), up=(0, 1, 0),
                     fov_y_deg=45, width=SIZE, height=SIZE)
mi = MultiDomainClusterIntersector(scene)
npix = SIZE * SIZE
ids = jnp.arange(npix, dtype=jnp.uint32)
z = jnp.zeros(npix)
o0, d0 = camera_rays(camera, ids, z, z, jnp)
jx = rng.uniform(0, ids, 0, rng.dim_id(0, rng.PIXEL_JITTER, 0), jnp)
jy = rng.uniform(0, ids, 0, rng.dim_id(0, rng.PIXEL_JITTER, 1), jnp)
oj, dj = camera_rays(camera, ids, jx, jy, jnp)
tmin = jnp.zeros(npix)

f = jax.jit(lambda o, d, a, b, i: i.intersect(o, d, a, b))

def bench(name, *args):
    t0 = time.time(); out = f(*args); jax.block_until_ready(out)
    c = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time(); out = f(*args); jax.block_until_ready(out)
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts)*1e3:.2f} ms (compile {c:.1f}s)", flush=True)

bench("coherent tmax=1e30", o0, d0, tmin, jnp.full(npix, 1e30), mi)
bench("coherent tmax=inf ", o0, d0, tmin, jnp.full(npix, np.inf), mi)
bench("jittered tmax=inf ", oj, dj, tmin, jnp.full(npix, np.inf), mi)
