"""Bisect where frame time goes (dev tool)."""
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
from spray_tpu.kernels.multidomain import MultiDomainClusterIntersector
from spray_tpu.integrators import wavefront, device

SIZE = 512
scene = wisp_cloud(n_blobs=8, tris_per_blob=131072, seed=3)
camera = make_camera(eye=(14.0, 10.0, 18.0), lookat=(0, 0, 0), up=(0, 1, 0),
                     fov_y_deg=45, width=SIZE, height=SIZE)
mi = MultiDomainClusterIntersector(scene)
arrays = device.device_scene_arrays(scene)
npix = SIZE * SIZE
pixel_ids = jnp.arange(npix, dtype=jnp.uint32)

def bench(name, f, *args):
    t0 = time.time(); out = f(*args); jax.block_until_ready(out)
    c = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time(); out = f(*args); jax.block_until_ready(out)
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts)*1e3:.1f} ms (compile {c:.1f}s)", flush=True)

# one sample, bounces=0, no nee: 1 intersect + shade
for bounces, nee, tag in [(0, False, "b0"), (2, False, "b2"), (2, True, "b2+nee")]:
    cfg = RenderConfig(spp=1, bounces=bounces, integrator="pt", seed=0, nee=nee)
    @jax.jit
    def one(arrays, isect, s):
        return wavefront.sample_wavefront(arrays, camera, cfg, isect, jnp, s, pixel_ids)
    bench(f"sample_wavefront {tag}", one, arrays, mi, jnp.uint32(0))

# raw intersect with incoherent rays (simulating bounce)
key = jax.random.PRNGKey(0)
o = jax.random.uniform(key, (npix, 3), minval=-5, maxval=5)
d = jax.random.normal(jax.random.PRNGKey(1), (npix, 3))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
tmin = jnp.zeros(npix); tmax = jnp.full(npix, np.inf)
f = jax.jit(lambda o, d, a, b, i: i.intersect(o, d, a, b))
bench("incoherent intersect (inf tmax)", f, o, d, tmin, tmax, mi)
f2 = jax.jit(lambda o, d, a, b, i: i.occluded(o, d, b))
bench("incoherent occluded", f2, o, d, tmin, jnp.full(npix, 1.0), mi)
